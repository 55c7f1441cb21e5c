package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{CoreQueries, TextAnalysisQueries}

/** The roundtrip keys' /tmp paths are content-addressed (a hash of the
  * slice + dialect spec) but the oracle SQL is static text, so the hash
  * appears there as a literal. These tests pin the two sides together:
  * whoever changes a slice spec gets a red test until the SQL literal
  * is updated too — which is the entire point of content-addressing
  * (two graft versions with different slices can never share a path).
  */
class RoundtripPathSpec extends AnyFunSuite {

  private def sqlPath(key: String, reader: String,
                      oracle: Map[String, String] = CoreQueries.oracle): String = {
    val sql = oracle(key)
    val re = (reader + "\\('([^']+)/\\*\\.[a-z]+'").r
    re.findFirstMatchIn(sql)
      .getOrElse(fail(s"$key oracle SQL has no $reader path literal"))
      .group(1)
  }

  test("scan_csv_roundtrip: Scala path and oracle SQL literal agree") {
    assert(sqlPath("scan_csv_roundtrip", "read_csv")
      == CoreQueries.csvRoundtripPath)
  }

  test("scan_json_roundtrip: Scala path and oracle SQL literal agree") {
    assert(sqlPath("scan_json_roundtrip", "read_json")
      == CoreQueries.jsonRoundtripPath)
  }

  test("text_unicode_tokens: Scala path and oracle SQL literal agree") {
    assert(sqlPath("text_unicode_tokens", "read_parquet",
      TextAnalysisQueries.oracle) == TextAnalysisQueries.unicodeSlicePath)
  }

  test("the lanes can never collide on one path") {
    val paths = Seq(CoreQueries.csvRoundtripPath,
      CoreQueries.jsonRoundtripPath, TextAnalysisQueries.unicodeSlicePath)
    assert(paths.distinct.size == paths.size)
  }
}
