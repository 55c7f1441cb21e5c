package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII / contact-info scrubbing for training corpora — the cleaning
  * stage between ingest and tokenization. Pure single-scan
  * `regexp_replace` chains (codegen'd, no UDF, no shuffle — the ideal
  * 100 TB shape: scrubbing rides the same scan as everything else).
  *
  * Patterns are deliberately conservative Java-regex subsets: a
  * data-pipeline scrubber's contract is "remove the obvious spans and
  * COUNT what it removed" (so downstream can filter documents whose PII
  * density suggests scraping a people-directory), not full PII NER —
  * that is a model's job, out of scope for a zero-egress engine
  * (SURVEY.md §2.9's embedding-generation exclusion, same reasoning).
  *
  * Order matters: emails before phones (an e-mail local part can
  * contain digit runs a loose phone pattern would shred mid-token),
  * URLs before emails would double-mask `http://a@b.c` credentials —
  * the chain is applied URL → email → phone → IPv4, each on the
  * previous stage's output, so a span is masked exactly once.
  */
object Scrub {

  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val UrlRe = "https?://[^\\s]+"
  // 7+ digit runs with optional separators, an optional +CC and
  // parenthesized area code; anchored on word boundaries so ids in
  // longer alphanumeric tokens survive
  val PhoneRe = "\\+?\\d{1,3}[ .-]?\\(?\\d{2,4}\\)?([ .-]?\\d{2,4}){2,3}"
  val Ipv4Re = "\\b(\\d{1,3}\\.){3}\\d{1,3}\\b"

  private def countRe(c: Column, re: String): Column =
    regexp_count(c, lit(re)).cast("long")

  /** Masked text plus per-category removal counts (each counted on the
    * PREVIOUS stage's output — the same text the replace saw, so count
    * and mask can never disagree). Masks keep the category visible
    * (`<EMAIL>` etc.) so token statistics downstream can still see that
    * something was there — the convention C4-style cleaners use.
    */
  def scrub(df: DataFrame, textCol: String): DataFrame = {
    val t0 = col(textCol)
    val afterUrl = regexp_replace(t0, UrlRe, "<URL>")
    val afterEmail = regexp_replace(afterUrl, EmailRe, "<EMAIL>")
    val afterPhone = regexp_replace(afterEmail, PhoneRe, "<PHONE>")
    val clean = regexp_replace(afterPhone, Ipv4Re, "<IP>")
    df.withColumn("n_urls", countRe(t0, UrlRe))
      .withColumn("n_emails", countRe(afterUrl, EmailRe))
      .withColumn("n_phones", countRe(afterEmail, PhoneRe))
      .withColumn("n_ips", countRe(afterPhone, Ipv4Re))
      .withColumn("scrubbed", clean)
  }

  /** Documents whose PII density crosses a threshold — the filter list
    * a pipeline quarantines (directory pages, leaked dumps).
    */
  def flagged(df: DataFrame, textCol: String, maxHits: Int): DataFrame =
    scrub(df, textCol)
      .withColumn("n_pii",
        col("n_urls") + col("n_emails") + col("n_phones") + col("n_ips"))
      .filter(col("n_pii") > maxHits)
}
