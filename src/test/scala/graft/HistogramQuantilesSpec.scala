package graft

import org.apache.spark.sql.functions._
import graft.pipeline.HistogramQuantiles

/** Property certification of the shared order-statistic read beyond the
  * oracle corpus: for RANDOM per-key integer multisets (expressed as
  * histograms) and every dyadic quantile k/den it offers, orderStats +
  * interp must equal a brute Scala replay of `quantile_cont` —
  * bit-exact, including the even/odd bracketing and the exact dyadic
  * interpolation the three oracle keys (agg_mad,
  * agg_quartiles_scalable, evt_dwell_median) rely on.
  */
class HistogramQuantilesSpec extends SparkSpec {

  /** Brute quantile_cont(k/den) over the expanded sorted multiset,
    * computed with exact integer position arithmetic.
    */
  private def brute(xs: Seq[Long], k: Int, den: Int): Double = {
    val s = xs.sorted
    val n = s.size
    val pos = (n - 1).toLong * k
    val lo = (pos / den).toInt
    val rem = pos % den
    if (rem == 0) s(lo).toDouble
    else s(lo) + rem.toDouble / den * (s(lo + 1) - s(lo))
  }

  test("interp replays quantile_cont bit-for-bit on random histograms") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    (1 to 5).foreach { trial =>
      // per key: a multiset of small integer values with heavy ties
      // (ties stress the cumulative bracketing) and odd/even sizes
      val data = (0 until 6).flatMap { key =>
        val n = rnd.nextInt(40) + 1
        (0 until n).map(_ => (s"k$key", rnd.nextInt(12).toLong - 3))
      }
      val expected = data.groupBy(_._1).map { case (k2, vs) =>
        k2 -> vs.map(_._2)
      }
      val hist = data.toDF("key", "v")
        .groupBy(col("key"), col("v")).agg(count(lit(1)).as("cnt"))
      for (den <- Seq(2, 4, 8)) {
        val ks = 1 until den
        val stats = HistogramQuantiles.orderStats(hist, "key", "v", den, ks)
        val got = stats.select(col("key") +: ks.map(k2 =>
            HistogramQuantiles.interp(k2, den, s"q$k2")): _*)
          .collect().map(r => r.getString(0) ->
            ks.map(i => r.getDouble(ks.indexOf(i) + 1))).toMap
        expected.foreach { case (key, xs) =>
          ks.foreach { k2 =>
            val want = brute(xs, k2, den)
            val have = got(key)(k2 - 1)
            assert(java.lang.Double.doubleToLongBits(have) ==
                java.lang.Double.doubleToLongBits(want),
              s"trial $trial key $key q=$k2/$den: got $have want $want (n=${xs.size})")
          }
        }
      }
    }
  }

  test("lowerQuantiles matches the brute weighted lower quantile") {
    import spark.implicits._
    val rnd = new scala.util.Random(41)
    (1 to 5).foreach { trial =>
      // per key: (value, weight) pairs with ties on the value axis
      val data = (0 until 5).flatMap { key =>
        val n = rnd.nextInt(30) + 1
        (0 until n).map(_ =>
          (s"k$key", rnd.nextInt(10).toLong - 2, rnd.nextInt(7).toLong + 1))
      }
      val hist = data.toDF("key", "v", "w")
        .groupBy(col("key"), col("v")).agg(sum(col("w")).as("cnt"))
      for (den <- Seq(2, 4)) {
        val ks = 1 until den
        val got = HistogramQuantiles.lowerQuantiles(hist, "key", "v", den, ks)
          .collect().map(r => r.getString(0) ->
            (r.getLong(1), ks.map(i => r.getLong(i + 1)))).toMap
        data.groupBy(_._1).foreach { case (key, rows) =>
          val tot = rows.map(_._3).sum
          val bins = rows.groupBy(_._2).view.mapValues(_.map(_._3).sum)
            .toSeq.sortBy(_._1)
          val (gotN, gotQs) = got(key)
          assert(gotN == tot, s"trial $trial key $key total weight")
          ks.foreach { k =>
            // brute: smallest v whose cumulative weight reaches k/den
            val want = bins.scanLeft(("", 0L)) { case ((_, c), (v, w)) =>
              (v.toString, c + w)
            }.drop(1).find(_._2 * den >= tot * k).get._1.toLong
            assert(gotQs(k - 1) == want,
              s"trial $trial key $key wq$k/$den: got ${gotQs(k - 1)} want $want")
          }
        }
      }
    }
  }

  test("extra aggregates ride the same group-by") {
    import spark.implicits._
    val hist = Seq(("a", 1L, 3L), ("a", 5L, 1L), ("b", 2L, 2L))
      .toDF("key", "v", "cnt")
    val out = HistogramQuantiles.orderStats(hist, "key", "v", 2, Seq(1),
        extra = Seq(max(col("v")).as("vmax")))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(4))).toMap
    assert(out("a") == ((4L, 5L)), s"n=4, max=5 for a: $out")
    assert(out("b") == ((2L, 2L)), s"n=2, max=2 for b: $out")
  }
}
