package graft.pipeline

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Tokenization policies for the text family.
  *
  * Every text_* ORACLE key tokenizes by single-space split — correct on
  * the space-separated testdata (including its `zh` documents, which the
  * generator emits space-delimited) and hash-certified as such against
  * DuckDB's `string_split(text, ' ')`. That is a CONTRACT with the
  * oracle corpus, not a claim about language: real multilingual text has
  * tabs/NBSP/newlines, punctuation glued to words, and CJK scripts with
  * NO delimiter at all — a whitespace split hands a whole Chinese
  * sentence to the pipeline as one "word", silently breaking n-gram
  * dedup, BM25, language ID and token counting (SURVEY §2.9 records the
  * limitation).
  *
  * [[unicode]] is the codepoint-class alternative for such corpora:
  *  - runs of non-CJK letters/digits form one token (accents kept —
  *    "café" is one word; case folded),
  *  - every Han / Hiragana / Katakana / Hangul codepoint is its OWN
  *    token — the dictionary-free CJK default (what Lucene's CJK
  *    analyzers do): unigram tokens make n-gram statistics and Jaccard
  *    shingles well-defined without a segmenter model,
  *  - everything else (punctuation, symbols, all whitespace) separates.
  * So "Hello, 世界!" → [hello, 世, 界]. Known trade: intra-word
  * apostrophes split ("don't" → [don, t]) — acceptable for statistics,
  * documented here rather than special-cased.
  *
  * The implementation is ONE `regexp_extract_all` over a codegen'd Java
  * regex — scan-shaped, no shuffle, no UDF; at 100 TB tokenization cost
  * is the regex engine per row, exactly like the whitespace split.
  */
object Tokenize {

  /** The oracle-pinned policy: distinct non-empty single-space tokens
    * (mirrors Dedup.tokensOf / the DuckDB twins — change all together).
    */
  def whitespaceTokens(text: Column): Column =
    filter(array_distinct(split(text, " ")), t => t =!= "")

  private val cjk =
    "\\p{IsHan}\\p{IsHiragana}\\p{IsKatakana}\\p{IsHangul}"

  /** Codepoint-class segmentation (see object doc): CJK codepoints
    * tokenize alone; other letter/digit runs tokenize as words; case
    * folded. Returns the token SEQUENCE (duplicates kept — callers
    * needing the type set wrap in array_distinct like the whitespace
    * path does).
    */
  def unicodeTokens(text: Column): Column =
    regexp_extract_all(lower(text),
      lit(s"[$cjk]|[[\\p{L}\\p{N}]&&[^$cjk]]+"), lit(0))
}
