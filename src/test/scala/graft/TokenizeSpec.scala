package graft

import org.apache.spark.sql.functions._
import graft.pipeline.Tokenize

/** Pins the codepoint-class tokenizer on mixed CJK/Latin strings — the
  * honest multilingual alternative SURVEY §2.9 documents next to the
  * oracle corpus's whitespace contract.
  */
class TokenizeSpec extends SparkSpec {

  private def toks(s: String): Seq[String] = {
    import spark.implicits._
    Seq(s).toDF("text")
      .select(Tokenize.unicodeTokens(col("text")).as("t"))
      .head().getSeq[String](0)
  }

  test("CJK codepoints tokenize alone; Latin runs tokenize as words") {
    assert(toks("Hello, 世界!") == Seq("hello", "世", "界"))
    assert(toks("東京taxi 2024") == Seq("東", "京", "taxi", "2024"))
    // no delimiter anywhere in the CJK run — the whitespace split would
    // return this whole sentence as ONE token
    assert(toks("我喜欢数据") == Seq("我", "喜", "欢", "数", "据"))
  }

  test("kana and hangul are CJK-classed; accents stay inside words") {
    assert(toks("カタカナとひらがな") ==
      Seq("カ", "タ", "カ", "ナ", "と", "ひ", "ら", "が", "な"))
    assert(toks("한국어 text") == Seq("한", "국", "어", "text"))
    assert(toks("Café crème") == Seq("café", "crème"))
    assert(toks("Привет мир") == Seq("привет", "мир"))
  }

  test("punctuation, symbols and all whitespace separate; case folds") {
    assert(toks("don't stop-me now") == Seq("don", "t", "stop", "me", "now"))
    assert(toks("A\tB\nC D") == Seq("a", "b", "c", "d"))
    assert(toks("!!! ... ???") == Seq.empty)
    assert(toks("") == Seq.empty)
  }

  test("whitespaceTokens keeps the oracle contract: single-space split, distinct, non-empty") {
    import spark.implicits._
    val got = Seq("a b  a\tb").toDF("text")
      .select(Tokenize.whitespaceTokens(col("text")).as("t"))
      .head().getSeq[String](0)
    // double space yields an empty token (filtered); tab is NOT a
    // delimiter under the pinned contract — "a\tb" stays one token
    assert(got == Seq("a", "b", "a\tb"))
  }
}
