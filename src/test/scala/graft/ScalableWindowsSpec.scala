package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.pipeline.ScalableWindows

/** Result-identity of the scale-safe window twins (SURVEY.md §7.7) with
  * the naive low-cardinality-partition windows they replace — exact
  * equality, across chunk/bucket sizes including degenerate ones (chunks
  * smaller than the lookback, sparse chunks, buckets at the band width).
  */
class ScalableWindowsSpec extends SparkSpec {

  private def assertSame(a: DataFrame, b: DataFrame, keys: Seq[String]): Unit = {
    val ka = a.orderBy(keys.map(col): _*).collect().toSeq
    val kb = b.orderBy(keys.map(col): _*).collect().toSeq
    assert(ka.size === kb.size)
    ka.zip(kb).foreach { case (ra, rb) => assert(ra === rb) }
  }

  private lazy val cents = Tables.events(spark, sf)
    .select(col("event_type"), col("event_id"),
      round(col("value") * 100).cast("long").as("v_c"))

  private def naiveMedian: DataFrame = {
    val w = Window.partitionBy("event_type").orderBy("event_id")
      .rowsBetween(-4, Window.currentRow)
    cents.withColumn("med_c", percentile(col("v_c"), lit(0.5)).over(w))
  }

  test("trailingRows median twin is row-identical to the naive window") {
    val twin = ScalableWindows.trailingRows(
      cents, Seq("event_type"), Seq("event_id"),
      col("event_id") / 200, lookback = 4)(w =>
      Seq(percentile(col("v_c"), lit(0.5)).over(w).as("med_c")))
    assertSame(twin, naiveMedian, Seq("event_type", "event_id"))
  }

  test("trailingRows is exact even when chunks are smaller than the lookback") {
    // chunk size 3 < lookback 4: every frame crosses a boundary, and the
    // head/tail boundary set must chain across multiple chunks
    val twin = ScalableWindows.trailingRows(
      cents, Seq("event_type"), Seq("event_id"),
      col("event_id") / 3, lookback = 4)(w =>
      Seq(percentile(col("v_c"), lit(0.5)).over(w).as("med_c")))
    assertSame(twin, naiveMedian, Seq("event_type", "event_id"))
  }

  test("trailingRows is exact with sparse, non-consecutive chunk ids") {
    // chunk ids with large gaps (…, 17k, 17(k+1), …) — still monotone in
    // the order axis, as the contract requires, but never consecutive:
    // the boundary stitch must not assume chunk+1 exists
    val twin = ScalableWindows.trailingRows(
      cents, Seq("event_type"), Seq("event_id"),
      (col("event_id") / 100).cast("long") * 17, lookback = 4)(w =>
      Seq(percentile(col("v_c"), lit(0.5)).over(w).as("med_c")))
    assertSame(twin, naiveMedian, Seq("event_type", "event_id"))
  }

  private def naiveRange(base: DataFrame, band: Long): DataFrame = {
    val w = Window.partitionBy("event_type").orderBy("v_c")
      .rangeBetween(-band, Window.currentRow)
    base.select(col("event_id"), col("event_type"), col("v_c"),
      sum("v_c").over(w).as("band_sum_c"),
      count(lit(1)).over(w).as("band_n"))
  }

  test("trailingRangeSumCount matches the naive RANGE window at bucket = band") {
    val twin = ScalableWindows.trailingRangeSumCount(
      cents.select("event_id", "event_type", "v_c"),
      Seq("event_type"), "v_c", band = 1000L, bucketWidth = 1000L,
      "band_sum_c", "band_n")
    assertSame(twin, naiveRange(cents, 1000L), Seq("event_id"))
  }

  test("sub-band buckets (more parallelism) stay exact") {
    for (w <- Seq(250L, 100L, 7L)) {
      val twin = ScalableWindows.trailingRangeSumCount(
        cents.select("event_id", "event_type", "v_c"),
        Seq("event_type"), "v_c", band = 1000L, bucketWidth = w,
        "band_sum_c", "band_n")
      assertSame(twin, naiveRange(cents, 1000L), Seq("event_id"))
    }
  }

  test("range decomposition is exact over negative and tie-heavy values") {
    import spark.implicits._
    // values straddle zero (floor-division sign behavior) and repeat
    // heavily (RANGE tie semantics: equal values share one frame)
    val rows = (0 until 400).map { i =>
      ("t" + (i % 2), i.toLong, ((i * 37) % 23 - 11).toLong * 5)
    }
    val df = rows.toDF("event_type", "event_id", "v_c")
      .select("event_id", "event_type", "v_c")
    val twin = ScalableWindows.trailingRangeSumCount(
      df, Seq("event_type"), "v_c", band = 20L, bucketWidth = 10L,
      "band_sum_c", "band_n")
    assertSame(twin, naiveRange(df, 20L), Seq("event_type", "event_id"))
  }

  test("property: random multisets, bands, and bucket widths stay exact") {
    import spark.implicits._
    val rnd = new scala.util.Random(17)
    (1 to 3).foreach { trial =>
      val n = rnd.nextInt(300) + 100
      val rows = (0 until n).map { i =>
        ("t" + rnd.nextInt(3), i.toLong, (rnd.nextInt(200) - 100).toLong)
      }
      val df = rows.toDF("event_type", "event_id", "v_c")
        .select("event_id", "event_type", "v_c")
      val band = rnd.nextInt(50) + 1L
      val bucket = rnd.nextInt(band.toInt) + 1L
      val twin = ScalableWindows.trailingRangeSumCount(
        df, Seq("event_type"), "v_c", band = band, bucketWidth = bucket,
        "band_sum_c", "band_n")
      assertSame(twin, naiveRange(df, band), Seq("event_type", "event_id"))
    }
  }

  test("an extreme outlier value cannot blow up the bucket axis") {
    import spark.implicits._
    // one value at 10^15 with bucketWidth 10 would have forced a 10^14-
    // element sequence under densification; the occupied-buckets-only
    // cumulative plus as-of resolution must stay exact and tiny instead
    val rows = (0 until 100).map(i => ("t", i.toLong, ((i * 13) % 40).toLong)) :+
      (("t", 100L, 1000000000000000L))
    val df = rows.toDF("event_type", "event_id", "v_c")
      .select("event_id", "event_type", "v_c")
    val twin = ScalableWindows.trailingRangeSumCount(
      df, Seq("event_type"), "v_c", band = 20L, bucketWidth = 10L,
      "band_sum_c", "band_n")
    assertSame(twin, naiveRange(df, 20L), Seq("event_type", "event_id"))
  }

  test("oracle keys: the two scalable twins equal their naive keys' answers") {
    val med = SparkEntry.queries("win_rolling_median_scalable")(spark, sf)
    assertSame(med, naiveMedian.orderBy("event_type", "event_id"),
      Seq("event_type", "event_id"))
    val rng = SparkEntry.queries("win_range_frame_scalable")(spark, sf)
    assertSame(rng, naiveRange(cents, 1000L), Seq("event_id"))
  }
}
