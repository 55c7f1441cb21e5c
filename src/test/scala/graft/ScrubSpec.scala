package graft

import graft.pipeline.Scrub

/** PII scrubbing: masks land on the right spans, counts agree with the
  * masks, clean text is untouched, and the chain order prevents
  * double-masking (URL credentials containing an @).
  */
class ScrubSpec extends SparkSpec {

  import org.apache.spark.sql.functions._

  private def one(text: String) = {
    import spark.implicits._
    Scrub.scrub(Seq((1L, text)).toDF("id", "text"), "text")
      .select("scrubbed", "n_urls", "n_emails", "n_phones", "n_ips")
      .head
  }

  test("emails, urls, phones, ips are each masked and counted") {
    val r = one("mail bob.smith+x@example.org or visit https://ex.org/a?b=1 " +
      "call +1 (415) 555-0199 host 10.0.0.1 done")
    assert(r.getString(0) ==
      "mail <EMAIL> or visit <URL> call <PHONE> host <IP> done")
    assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)) == ((1L, 1L, 1L, 1L)))
  }

  test("clean text passes through unchanged with zero counts") {
    val r = one("the quick brown fox 42 times")
    assert(r.getString(0) == "the quick brown fox 42 times")
    assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)) == ((0L, 0L, 0L, 0L)))
  }

  test("an email inside a URL masks once, as a URL") {
    val r = one("see http://user@host.example.com/path now")
    assert(r.getString(0) == "see <URL> now")
    assert(r.getLong(1) == 1L && r.getLong(2) == 0L, "no double mask")
  }

  test("flagged quarantines only high-density rows, single scan, no shuffle") {
    import spark.implicits._
    val df = Seq(
      (1L, "a@b.co c@d.co e@f.co 10.1.1.1"),
      (2L, "plain text")).toDF("doc_id", "text")
    val got = Scrub.flagged(df, "text", maxHits = 2)
    assert(got.select("doc_id").as[Long].collect().toSeq == Seq(1L))
    val plan = got.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"scrubbing must not shuffle: $plan")
  }
}
