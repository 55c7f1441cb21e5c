package graft

import graft.pipeline.Multimodal
import graft.pipeline.Multimodal.MediaRecord

/** Perceptual image dedup: the aHash collides exactly on re-encodes and
  * integer-factor rescales of the same picture, separates distinct
  * pictures, and the grouped dedup finds planted duplicate clusters
  * with deterministic survivors.
  */
class ImageDedupSpec extends SparkSpec {

  private def rgb(seed: Long, n: Int): Array[Byte] = {
    val b = new Array[Byte](n)
    var s = seed
    for (i <- b.indices) {
      s = s * 6364136223846793005L + 1442695040888963407L
      b(i) = (s >>> 56).toByte
    }
    b
  }

  test("aHash is exactly invariant under integer-factor NN upscale and BMP re-encode") {
    import spark.implicits._
    for (seed <- 1 to 6) {
      val (w, h) = (16 + seed, 12 + seed % 3)
      val px = rgb(seed * 1000L, w * h * 3)
      val ppm = Multimodal.Ppm.encode(w, h, px)
      val bmp = Multimodal.Bmp.encode(w, h, px)
      assert(Multimodal.aHash64(ppm) == Multimodal.aHash64(bmp),
        s"seed $seed: PPM and BMP encodes of the same raster must collide")
      // 3× NN upscale through the engine's own resize operator
      val up = Multimodal.resizeImages(
        Seq(MediaRecord(1L, "image", ppm)).toDS(), w * 3, h * 3).collect().head
      assert(Multimodal.aHash64(up.payload) == Multimodal.aHash64(ppm),
        s"seed $seed: 3x NN upscale must preserve the hash (nested-floor identity)")
    }
  }

  test("aHash is invariant under uniform brightness shift (no clipping)") {
    val (w, h) = (20, 15)
    // pixels in [64, 191] so a +32 shift cannot clip
    val px = rgb(7L, w * h * 3).map(b => ((b & 0x7f) + 64).toByte)
    val brighter = px.map(b => ((b & 0xff) + 32).toByte)
    assert(Multimodal.aHash64(Multimodal.Ppm.encode(w, h, px)) ==
      Multimodal.aHash64(Multimodal.Ppm.encode(w, h, brighter)),
      "a uniform shift moves pixels and mean together — no bit flips")
  }

  test("distinct random images get distinct hashes; dedup finds planted clusters") {
    import spark.implicits._
    val originals = (0L until 30L).map { i =>
      val (w, h) = (14 + (i % 5).toInt, 10 + (i % 3).toInt)
      MediaRecord(i, "image", Multimodal.Ppm.encode(w, h, rgb(i * 77L + 13L, w * h * 3)))
    }
    val hashes = originals.map(m => Multimodal.aHash64(m.payload))
    assert(hashes.distinct.length == hashes.length,
      "30 random pictures must not collide")
    // plant dup clusters: BMP re-encodes of images 3 and 7
    val dups = Seq(3L, 7L).flatMap { i =>
      val src = originals(i.toInt)
      val (w, h, _, px) = (14 + (i % 5).toInt, 10 + (i % 3).toInt, 0,
        rgb(i * 77L + 13L, (14 + (i % 5).toInt) * (10 + (i % 3).toInt) * 3))
      Seq(MediaRecord(100L + i, "image", Multimodal.Bmp.encode(w, h, px)))
    }
    val audio = Seq(MediaRecord(999L, "audio", Array[Byte](1, 2, 3)))
    val got = Multimodal.dedupImages((originals ++ dups ++ audio).toDS())
      .orderBy("survivor_id").collect()
    assert(got.length == 2, s"exactly the two planted clusters: ${got.mkString(";")}")
    assert(got(0).getLong(1) == 3L && got(0).getLong(2) == 2L &&
      got(0).getSeq[Long](3) == Seq(3L, 103L))
    assert(got(1).getLong(1) == 7L && got(1).getLong(2) == 2L &&
      got(1).getSeq[Long](3) == Seq(7L, 107L))
  }

  test("flat images of different brightness do NOT merge; same brightness does") {
    import spark.implicits._
    def flat(id: Long, v: Byte) =
      MediaRecord(id, "image", Multimodal.Ppm.encode(8, 8, Array.fill(8 * 8 * 3)(v)))
    // zero-contrast grid ⇒ no pixel strictly above the mean ⇒ aHash 0
    // for ALL of them — the round-9 advice finding: hash-only grouping
    // merged solid black with solid white under one wrong survivor
    val black = flat(0L, 0); val gray = flat(1L, 100); val white = flat(2L, -1) // -1 = 0xff
    assert(Multimodal.aHash64(black.payload) == 0L &&
      Multimodal.aHash64(white.payload) == 0L)
    val gray2 = flat(3L, 100) // same brightness: a TRUE duplicate
    val got = Multimodal.dedupImages(Seq(black, gray, white, gray2).toDS())
      .orderBy("survivor_id").collect()
    assert(got.length == 1, s"only the equal-brightness pair merges: ${got.mkString(";")}")
    assert(got(0).getLong(1) == 1L && got(0).getLong(2) == 2L &&
      got(0).getSeq[Long](3) == Seq(1L, 3L))
  }
}
