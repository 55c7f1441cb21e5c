package graft

import org.apache.spark.sql.functions._
import graft.functions.HeavyHittersAgg

/** Misra–Gries sketch: the spec asserts the sketch's GUARANTEE, not
  * exact counts (output legitimately depends on partition merge order):
  * est ≤ true, true − est ≤ n/(k+1), and every item above the n/(k+1)
  * frequency bar is present — per group, under map-side partials.
  */
class HeavyHittersSpec extends SparkSpec {

  test("every true heavy hitter survives with under-estimate within n/(k+1)") {
    import spark.implicits._
    val k = 8
    // two groups, zipf-ish: item i appears ~N/i times, plus noise tail
    val rows = for {
      g <- Seq("a", "b")
      i <- 1 to 12
      _ <- 1 to (600 / i)
    } yield (g, s"item_$i")
    val noise = (1 to 2000).map(j => ((if (j % 2 == 0) "a" else "b"), s"noise_$j"))
    val df = spark.sparkContext.parallelize(
      scala.util.Random.shuffle(rows ++ noise), 8).toDF("g", "tok")

    val sketch = udaf(new HeavyHittersAgg(k))
    val got = df.groupBy("g").agg(sketch(col("tok")).as("hh"))
      .as[(String, Map[String, Long])].collect().toMap

    val truth = (rows ++ noise).groupBy(identity).view.mapValues(_.size.toLong)
      .toMap.groupBy(_._1._1)
      .map { case (g, m) => g -> m.map { case ((_, t), n) => t -> n } }

    Seq("a", "b").foreach { g =>
      val n = truth(g).values.sum
      val bar = n / (k + 1)
      val est = got(g)
      est.foreach { case (item, e) =>
        val t = truth(g)(item)
        assert(e <= t, s"$g/$item over-estimated: $e > $t")
        assert(t - e <= bar, s"$g/$item error ${t - e} exceeds n/(k+1) = $bar")
      }
      truth(g).filter(_._2 > bar).keys.foreach { hot =>
        assert(est.contains(hot), s"true heavy hitter $g/$hot missing from sketch")
      }
      assert(est.size <= k, s"$g sketch exceeded $k counters: ${est.size}")
    }
  }
}
