package graft

import org.apache.spark.sql.functions._
import graft.functions.MinHashAgg
import graft.pipeline.Dedup

class MinHashAggSpec extends SparkSpec {

  private val K = 16

  test("sketch aggregate equals the array-expression signature bit-for-bit") {
    val docs = Tables.documents(spark, sf)
    val byAgg = docs
      .select(col("doc_id"), explode(array_distinct(split(col("text"), "\\s+"))).as("tok"))
      .filter(col("tok") =!= "")
      .groupBy("doc_id")
      .agg(MinHashAgg.minhashSig(col("tok"), K).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val byExpr = docs
      .select(col("doc_id"), Dedup.minhashSignature(col("text"), K).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(byAgg.keySet == byExpr.keySet)
    byAgg.foreach { case (id, sig) =>
      assert(sig == byExpr(id), s"doc $id: $sig vs ${byExpr(id)}")
    }
  }

  test("partial/merge path: signatures are partition-count invariant") {
    val toks = Tables.documents(spark, sf)
      .select(col("doc_id"), explode(array_distinct(split(col("text"), "\\s+"))).as("tok"))
      .filter(col("tok") =!= "")
    def sig(parts: Int) = toks.repartition(parts)
      .groupBy("doc_id").agg(MinHashAgg.minhashSig(col("tok"), K).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(sig(1) == sig(13), "merge must be order/partitioning independent")
  }

  test("identical texts share signatures; the plan aggregates partially") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.1")
    val sigs = docs
      .select(col("doc_id"), col("text"),
        explode(array_distinct(split(col("text"), "\\s+"))).as("tok"))
      .filter(col("tok") =!= "")
      .groupBy(col("doc_id"), col("text"))
      .agg(MinHashAgg.minhashSig(col("tok"), K).as("sig"))
    val byText = sigs.groupBy("text")
      .agg(countDistinct(col("sig").cast("string")).as("n"))
    assert(byText.filter(col("n") > 1).count() == 0)
    val plan = sigs.queryExecution.executedPlan.toString()
    assert(plan.contains("partial_minhash_sig"),
      s"sketch must combine map-side: ${plan.take(600)}")
  }
}
