package graft

import org.apache.spark.sql.functions._
import graft.marine.Derived

/** Polar performance targets: bilinear interpolation over the (TWS,
  * |TWA|) grid — exact at grid points, arithmetic means at midpoints,
  * edge-clamped outside the grid, sign-blind in TWA.
  */
class PolarSpec extends SparkSpec {

  private val polar = Derived.defaultPolar

  private def target(tws: Double, twa: Double): Double = {
    import spark.implicits._
    Seq((tws, twa)).toDF("tws", "twa")
      .select(Derived.polarTarget(col("tws"), col("twa")).as("t"))
      .head().getDouble(0)
  }

  test("grid points return exactly the table target") {
    for (i <- polar.twsLevels.indices; j <- polar.twaLevels.indices) {
      val got = target(polar.twsLevels(i), polar.twaLevels(j))
      assert(math.abs(got - polar.targets(i)(j)) < 1e-12,
        s"(${polar.twsLevels(i)}, ${polar.twaLevels(j)}): $got != ${polar.targets(i)(j)}")
    }
  }

  test("axis midpoints interpolate to arithmetic means; interior points bilinear") {
    // midpoint along TWA at a grid TWS row
    val mTwa = target(10.0, (52.0 + 60.0) / 2)
    assert(math.abs(mTwa - (5.9 + 6.2) / 2) < 1e-12, s"twa midpoint $mTwa")
    // midpoint along TWS at a grid TWA column
    val mTws = target((10.0 + 12.0) / 2, 90.0)
    assert(math.abs(mTws - (6.7 + 7.0) / 2) < 1e-12, s"tws midpoint $mTws")
    // center of a cell = mean of its four corners
    val c = target(11.0, 56.0)
    assert(math.abs(c - (5.9 + 6.2 + 6.2 + 6.5) / 4) < 1e-12, s"cell center $c")
  }

  test("inputs outside the grid clamp to the edge; TWA sign is ignored") {
    assert(math.abs(target(4.0, 40.0) - 3.9) < 1e-12, "below wind range clamps")
    assert(math.abs(target(30.0, 120.0) - 8.6) < 1e-12, "above wind range clamps")
    assert(math.abs(target(10.0, 20.0) - 5.2) < 1e-12, "pinching clamps to 40deg col")
    assert(math.abs(target(10.0, 178.0) - 5.3) < 1e-12, "dead run clamps to 165deg col")
    assert(target(9.0, -75.0) == target(9.0, 75.0), "port tack mirrors starboard")
  }

  test("polarFromDataFrame round-trips the default polar and refuses holes") {
    import spark.implicits._
    val long = for {
      (t, i) <- polar.twsLevels.zipWithIndex
      (a, j) <- polar.twaLevels.zipWithIndex
    } yield (t, a, polar.targets(i)(j))
    val loaded = Derived.polarFromDataFrame(long.toDF("tws", "twa", "target_bs"))
    assert(loaded == polar, "long-form round trip must reproduce the grid")
    val holed = long.filterNot { case (t, a, _) => t == 10.0 && a == 90.0 }
    val e = intercept[IllegalArgumentException] {
      Derived.polarFromDataFrame(holed.toDF("tws", "twa", "target_bs"))
    }
    assert(e.getMessage.contains("incomplete"), e.getMessage)
  }

  test("per-race performance rollup reads exactly the planted polar ratios") {
    import spark.implicits._
    // race 1: five samples dead on polar at grid points; race 2: half speed
    val onPolar = Seq((10.0, 60.0, 6.2), (12.0, 75.0, 6.8), (8.0, 90.0, 6.2),
      (16.0, 110.0, 7.9), (6.0, 135.0, 5.0))
    val samples =
      onPolar.zipWithIndex.map { case ((tws, twa, bs), i) =>
        (1L, i.toLong * 10, tws, twa, bs) } ++
      onPolar.zipWithIndex.map { case ((tws, twa, bs), i) =>
        (2L, i.toLong * 10, tws, twa, bs / 2) }
    val df = samples.toDF("race_id", "ts", "tws", "twa", "sog")
    val got = graft.marine.Races.performance(df)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(got(1L) == ((5L, 100.0, 100.0, 100.0)), s"on-polar race: ${got(1L)}")
    assert(got(2L) == ((5L, 50.0, 50.0, 0.0)), s"half-speed race: ${got(2L)}")
  }

  test("polarPerformance is boatspeed over the interpolated target") {
    import spark.implicits._
    val r = Seq((6.2, 10.0, 60.0)).toDF("bs", "tws", "twa")
      .select(Derived.polarPerformance(col("bs"), col("tws"), col("twa")).as("perf"))
      .head().getDouble(0)
    assert(math.abs(r - 6.2 / 6.2) < 1e-12, s"perf $r")
  }
}
