package graft

import org.apache.spark.sql.functions._
import graft.pipeline.{IvfIndex, Similarity}

class IvfIndexSpec extends SparkSpec {

  private lazy val emb = Tables.embeddings(spark, sf)
  private lazy val model = IvfIndex.build(emb, k = 8)
  private lazy val assigned = IvfIndex.assign(emb, model).cache()

  test("every vector lands in exactly one of k cells") {
    assert(assigned.count() == emb.count())
    val cells = assigned.select("ivf_cell").distinct().count()
    assert(cells > 1 && cells <= 8)
  }

  test("probing all cells reproduces the exact brute-force top-10") {
    val probeVec = emb.filter(col("vec_id") === 0)
      .head().getSeq[Float](emb.columns.indexOf("embedding")).toArray
    val ivf = IvfIndex.topK(assigned, model, probeVec, 10, nprobe = 8)
      .collect().map(_.getLong(0))
    val brute = Similarity.bruteTopK(emb, emb.filter(col("vec_id") === 0), 10)
      .collect().map(_.getLong(0))
    assert(ivf.sameElements(brute), "nprobe = k must equal exact search")
  }

  test("nprobe=2 returns the probe itself and real cosines, scanning a subset") {
    val probeVec = emb.filter(col("vec_id") === 0)
      .head().getSeq[Float](emb.columns.indexOf("embedding")).toArray
    val out = IvfIndex.topK(assigned, model, probeVec, 10, nprobe = 2).collect()
    assert(out.nonEmpty)
    assert(out.head.getLong(0) == 0L, "probe's own cell is always scanned")
    val scanned = out.map(_.getInt(2)).toSet
    assert(scanned.size <= 2, "must only touch nprobe cells")
  }
}
