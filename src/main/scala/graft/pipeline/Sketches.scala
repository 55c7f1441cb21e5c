package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sketch-based scale twins of exact aggregates (SURVEY.md §2.4/§7.7).
  * Excluded from the DuckDB oracle by design: a sketch can never
  * hash-match another engine's sketch; the exact twins (agg_distinct
  * etc.) carry the correctness check.
  */
object Sketches {

  /** HyperLogLog++ distinct count — constant memory per group vs the
    * expand+2-phase exact countDistinct. rsd 0.01 ≈ 1.5 KB per group.
    */
  def approxDistinct(df: DataFrame, keyCols: Seq[String], valueCol: String,
                     rsd: Double = 0.01): DataFrame =
    df.groupBy(keyCols.map(col): _*)
      .agg(approx_count_distinct(col(valueCol), rsd).as(s"approx_n_$valueCol"))

  /** t-digest style quantiles without a global sort. */
  def approxQuantiles(df: DataFrame, keyCol: String, valueCol: String,
                      probs: Seq[Double]): DataFrame =
    df.groupBy(col(keyCol))
      .agg(percentile_approx(col(valueCol),
        array(probs.map(lit): _*), lit(10000)).as("quantiles"))

  /** Global frequent-items sketch (freqItems is whole-dataset by
    * design; group first and call per slice for a keyed variant).
    */
  def topFrequent(df: DataFrame, valueCol: String): DataFrame =
    df.stat.freqItems(Array(valueCol), 0.01)
}
