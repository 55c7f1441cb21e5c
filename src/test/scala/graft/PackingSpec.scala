package graft

import org.apache.spark.sql.functions._
import graft.pipeline.Packing

/** Sequence packing: the exact greedy fold's invariants, and the
  * chunked scale path's certified relationship to it (bins never cross
  * chunks; bounded waste; identical when a chunk covers the group).
  */
class PackingSpec extends SparkSpec {

  private val budget = 100L

  private def mkDocs(sizes: Seq[(String, Long, Long)]) = {
    import spark.implicits._
    sizes.toDF("source", "doc_id", "n_tokens")
  }

  /** Driver-side reference fold, independent of the library code. */
  private def refPack(sizes: Seq[(String, Long, Long)]): Map[(String, Long), Long] =
    sizes.groupBy(_._1).flatMap { case (src, ds) =>
      var bin = 0L; var fill = 0L
      ds.sortBy(_._2).map { case (_, id, n) =>
        if (fill > 0 && fill + n > budget) { bin += 1; fill = 0L }
        fill += n
        (src, id) -> bin
      }
    }

  private def randomSizes(seed: Int): Seq[(String, Long, Long)] = {
    val rnd = new scala.util.Random(seed)
    (0 until 200).map(i =>
      (s"src${i % 3}", i.toLong,
        // mix of tiny, mid, and oversized (> budget) docs
        rnd.nextInt(4) match {
          case 0 => rnd.nextInt(10).toLong
          case 3 => budget + rnd.nextInt(50).toLong
          case _ => 20L + rnd.nextInt(60)
        }))
  }

  test("packGreedy matches the reference fold, bins respect the budget") {
    val sizes = randomSizes(1)
    val got = Packing.packGreedy(mkDocs(sizes), budget).collect()
    assert(got.length == sizes.length)
    val ref = refPack(sizes)
    got.foreach(p => assert(p.bin_id == ref((p.source, p.doc_id)),
      s"(${p.source},${p.doc_id}) bin ${p.bin_id} != ref ${ref((p.source, p.doc_id))}"))
    // a bin over budget must be a single oversized doc
    got.groupBy(p => (p.source, p.bin_id)).foreach { case (k, ds) =>
      val total = ds.map(_.n_tokens).sum
      assert(total <= budget || ds.length == 1, s"bin $k overfull with ${ds.length} docs")
    }
  }

  test("packChunked: bins never cross chunks, waste is bounded, ids are dense per source") {
    val sizes = randomSizes(2)
    val chunkSize = 37L
    val exact = Packing.packGreedy(mkDocs(sizes), budget).collect()
    val chunked = Packing.packChunked(mkDocs(sizes), budget, chunkSize).collect()
    assert(chunked.length == sizes.length)
    // same budget invariant
    chunked.groupBy(p => (p.source, p.bin_id)).foreach { case (k, ds) =>
      assert(ds.map(_.n_tokens).sum <= budget || ds.length == 1, s"bin $k overfull")
      // never crosses a chunk boundary
      assert(ds.map(p => p.doc_id / chunkSize).distinct.length == 1,
        s"bin $k spans chunks: ${ds.map(_.doc_id).toSeq}")
    }
    // bounded waste: chunking can only ADD bins, at most one per chunk
    sizes.groupBy(_._1).foreach { case (src, ds) =>
      val nExact = exact.filter(_.source == src).map(_.bin_id).max + 1
      val nChunked = chunked.filter(_.source == src).map(_.bin_id).max + 1
      val nChunks = ds.map(_._2 / chunkSize).distinct.length
      assert(nChunked >= nExact && nChunked <= nExact + nChunks,
        s"$src: $nChunked bins vs exact $nExact (+$nChunks chunks max)")
      // global ids are dense 0..n-1 per source
      val ids = chunked.filter(_.source == src).map(_.bin_id).distinct.sorted
      assert(ids.sameElements(0L until nChunked), s"$src ids not dense: ${ids.toSeq}")
    }
  }

  test("packChunked equals packGreedy when one chunk covers each group") {
    val sizes = randomSizes(3)
    val exact = Packing.packGreedy(mkDocs(sizes), budget).collect()
      .map(p => (p.source, p.doc_id) -> p.bin_id).toMap
    val one = Packing.packChunked(mkDocs(sizes), budget, 1000000L).collect()
    one.foreach(p => assert(p.bin_id == exact((p.source, p.doc_id))))
  }

  test("text_pack key: every doc assigned once, fills ordered by doc_id") {
    val rows = SparkEntry.queries("text_pack")(spark, sf).collect()
    assert(rows.length == Tables.documents(spark, sf).count())
    val bySrc = rows.groupBy(_.getString(0))
    bySrc.foreach { case (_, ds) =>
      val bins = ds.sortBy(_.getLong(1)).map(_.getLong(3))
      // bin ids are non-decreasing in doc order and start at 0
      assert(bins.head == 0L)
      assert(bins.zip(bins.tail).forall { case (a, b) => b == a || b == a + 1 })
    }
  }
}
