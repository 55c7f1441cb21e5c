package graft

import org.apache.spark.sql.functions._
import graft.operators.TextAnalysisQueries

/** r16: the bounded-memory streaming twin of bigramLogprobCore must be
  * BIT-identical — the running-frame window sum adds the per-bigram
  * terms in exactly the order of the collect form's sorted array fold
  * ((w1, w2) unique per doc; 0.0-init left fold; same binary string
  * order), so any drift is an ordering bug, not float noise.
  */
class BigramLogprobStreamSpec extends SparkSpec {
  import spark.implicits._

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.orderBy("doc_id").collect().map(_.toSeq).toSeq

  test("stream twin is bit-identical to the collect form on the fixture corpus") {
    val docs = Tables.documents(spark, sf)
    val collect = rows(TextAnalysisQueries.bigramLogprobCore(docs))
    val stream = rows(TextAnalysisQueries.bigramLogprobStreamCore(docs))
    assert(collect.nonEmpty)
    assert(stream == collect)
  }

  test("stream twin is bit-identical on long documents with repeated bigrams") {
    // repeated bigrams (c > 1), a shared hot prefix word, and a doc
    // with a single bigram exercise the pn/cnt windows and the
    // last-row-per-doc selection
    val docs = Seq(
      (1L, ("the cat " * 500) + "sat on the mat on the mat"),
      (2L, (0 until 2000).map(i => s"w${(i * i) % 97}").mkString(" ")),
      (3L, "only two"),
      (4L, "the cat")
    ).toDF("doc_id", "text")
    val collect = rows(TextAnalysisQueries.bigramLogprobCore(docs))
    val stream = rows(TextAnalysisQueries.bigramLogprobStreamCore(docs))
    assert(collect.size == 4)
    assert(stream == collect)
  }
}
