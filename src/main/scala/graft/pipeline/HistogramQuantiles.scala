package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact DYADIC quantiles read off a frequency histogram — the one shared
  * implementation behind `agg_mad`, `agg_quartiles_scalable` and
  * `evt_dwell_median` (each previously inlined its own copy of this
  * order-statistic read; one subtle implementation beats three drifting
  * ones).
  *
  * The contract: given a per-key value histogram (`key`, `v`, `cnt`) whose
  * values are integer-valued (cents, whole seconds, ...), the interpolated
  * quantile at q = k/den with den a power of two is EXACT in doubles —
  * the 1-based interpolation position h = (n−1)·k/den has integer part
  * `((n−1)·k) DIV den` and dyadic fractional part `rem/den`, so
  * `v_lo + (rem/den)·(v_hi − v_lo)` replays DuckDB's `quantile_cont`
  * bit-for-bit (every intermediate is a dyadic rational well inside
  * double precision). A non-dyadic q like 0.1 would round h itself and is
  * deliberately not offered.
  *
  * Scale shape: every window here runs over the HISTOGRAM (distinct
  * values per key — bounded by the value range, not the corpus row
  * count), never raw rows; the caller builds the histogram with one
  * partial-aggregating corpus scan. This is the scalable posture next to
  * buffering `percentile`, which holds every raw value of a group in one
  * executor buffer.
  */
object HistogramQuantiles {

  /** Per `key`: total count `n`, and for each numerator k in `ks` the two
    * order statistics `lo$k` / `hi$k` (values at 1-based positions
    * `((n−1)·k) DIV den + 1` and that +1 when `((n−1)·k) % den > 0` — the
    * bracketing pair `interp` interpolates between; for the median
    * (k/den = 1/2) they are the classic (n−1) DIV 2 + 1 and
    * n DIV 2 + 1 middle pair). `extra` aggregates (e.g. `max(col(v))`)
    * ride along on the same group-by so callers never need a second pass
    * over the histogram.
    */
  def orderStats(hist: DataFrame, key: String, v: String, den: Int,
      ks: Seq[Int], extra: Seq[Column] = Nil): DataFrame = {
    def at(p: Column) =
      min(when(col("cum") - col("cnt") < p && p <= col("cum"), col(v)))
    val aggs = ks.flatMap { k =>
      val lo = expr(s"((n - 1) * $k) DIV $den + 1")
      val rem = expr(s"((n - 1) * $k) % $den")
      Seq(at(lo).as(s"lo$k"),
        at(lo + when(rem > 0, 1).otherwise(0)).as(s"hi$k"))
    }
    binned(hist, key, v).groupBy(col(key))
      .agg(max(col("n")).as("n"), (aggs ++ extra): _*)
  }

  /** Per `key`: total weight `n`, and for each numerator k in `ks` the
    * LOWER weighted quantile `wq$k` — the smallest value whose cumulative
    * weight reaches k/den of the total (`den·cum ≥ k·n`, a pure integer
    * decision, no interpolation, so it is engine-exact by construction).
    * The histogram's `cnt` column IS the weight (a weighted multiset and
    * a frequency histogram are the same object); with unit counts and
    * den = 2 this is the classic lower median. Same scale shape as
    * [[orderStats]]: every window runs over histogram bins.
    */
  def lowerQuantiles(hist: DataFrame, key: String, v: String, den: Int,
      ks: Seq[Int], extra: Seq[Column] = Nil): DataFrame = {
    val aggs = ks.map { k =>
      min(when(col("cum") * den >= col("n") * k, col(v))).as(s"wq$k")
    }
    binned(hist, key, v).groupBy(col(key))
      .agg(max(col("n")).as("n"), (aggs ++ extra): _*)
  }

  /** The shared cumulative read: per (key, v) bin, the running weight
    * `cum` (≤ v) and the key total `n` — incremental frames over
    * histogram bins only, never raw rows.
    */
  private def binned(hist: DataFrame, key: String, v: String): DataFrame = {
    val byKey = Window.partitionBy(key)
    val cumW = byKey.orderBy(col(v))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    hist
      .withColumn("cum", sum(col("cnt")).over(cumW))
      .withColumn("n", sum(col("cnt")).over(byKey))
  }

  /** The interpolated quantile at k/den from [[orderStats]]' output
    * columns (`n`, `lo$k`, `hi$k`), aliased `out`. Exactly
    * `quantile_cont(k/den)` on integer-valued inputs (dyadic-exact; see
    * object doc).
    */
  def interp(k: Int, den: Int, out: String): Column = {
    val rem = expr(s"((n - 1) * $k) % $den")
    (col(s"lo$k") + rem / den.toDouble * (col(s"hi$k") - col(s"lo$k"))).as(out)
  }
}
