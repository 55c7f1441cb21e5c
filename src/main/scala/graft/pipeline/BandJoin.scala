package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scalable band (range) join — the 100 TB twin of `join_theta_range`.
  *
  * A raw non-equi condition like `abs(l.ts - r.ts) <= band` gives
  * Catalyst nothing to hash on, so it plans a broadcast-nested-loop /
  * cartesian join: O(|L|·|R|) comparisons, which is fine on a bounded
  * slice and fatal at scale. Binning both sides into band-width buckets
  * turns it into an equi-join: a row can only match rows in its own or
  * an adjacent bucket, so the left probes (bucket-1, bucket, bucket+1)
  * — constant 3× replication — and the exact predicate filters the
  * bucket-local candidates. The plan becomes a shuffled hash /
  * sort-merge join that partitions on (keys, bucket) and scales
  * linearly with data and executors.
  */
object BandJoin {

  /** Backquote a column name for safe embedding in SQL text (names with
    * dots, spaces, or embedded backquotes parse literally).
    */
  private def q(name: String): String = "`" + name.replace("`", "``") + "`"

  /** Inner-join `left` and `right` on equal `keys` and
    * `|left.lTs − right.rTs| <= band` (inclusive).
    *
    * @param band  band half-width in the ts columns' own unit
    * @return all left + right columns (right's renamed with an `r_`
    *         prefix when colliding; the prefix grows with leading
    *         underscores until it is fresh in BOTH schemas, so a left
    *         `r_x` alongside a right `x` cannot produce duplicates)
    */
  def absBand(left: DataFrame, right: DataFrame, keys: Seq[String],
              lTs: String, rTs: String, band: Long): DataFrame = {
    require(band > 0, "band must be positive")
    require(!(left.columns ++ right.columns).exists(
        c => c == "__bucket" || c == "__band_base"),
      "column names __bucket/__band_base are reserved by BandJoin")
    val collisions = right.columns.toSet.intersect(left.columns.toSet) -- keys
    val taken = left.columns.toSet ++ right.columns.toSet
    val prefix = Iterator.iterate("r_")("_" + _)
      .find(p => collisions.forall(c => !taken.contains(p + c))).get
    val r0 = collisions.foldLeft(right)((df, c) => df.withColumnRenamed(c, prefix + c))
    val rTsName = if (collisions.contains(rTs)) prefix + rTs else rTs

    // exact overflow-free floor division — `floor(col / band)` would
    // divide as doubles, and ns-scale longs (~1.7e18) exceed double's
    // 2^53 exact range, so boundary rows could land one bucket off and
    // silently drop in-band pairs. `(x - pmod(x, band)) DIV band` is
    // exact but the subtraction wraps (non-ANSI) or throws (ANSI) for x
    // within band of Long.MinValue; `x DIV band` with a truncation fixup
    // never overflows for band > 0 (and for band = 1 the fixup branch is
    // dead: x % 1 = 0). Matches graft.plans.BandJoinRewrite.
    def bucketOf(c: String): Column =
      expr(s"(${q(c)} DIV ${band}L) + (CASE WHEN ${q(c)} % ${band}L < 0 THEN -1L ELSE 0L END)")
    val rBinned = r0.withColumn("__bucket", bucketOf(rTsName))
    // each left row probes its own and both adjacent buckets; any match
    // within ±band lives in one of the three. At the representable
    // extremes (band = 1 with ts = Long.Min/MaxValue) the out-of-range
    // neighbor bucket is omitted — no long can bucket beyond it, and
    // CASE branches evaluate lazily so the skipped ±1 cannot overflow
    // even under ANSI. explode_outer (not explode): the array is never
    // null/empty, and outer dodges InferFiltersFromGenerate duplicating
    // the array build into a non-codegen Filter.
    val base = col("__band_base")
    val lBinned = left
      .withColumn("__band_base", bucketOf(lTs))
      .withColumn("__bucket", explode_outer(
        when(base === Long.MaxValue, array(base - 1, base))
          .when(base === Long.MinValue, array(base, base + 1))
          .otherwise(array(base - 1, base, base + 1))))
      .drop("__band_base")

    lBinned
      .join(rBinned, keys :+ "__bucket")
      .filter(abs(col(q(lTs)) - col(q(rTsName))) <= band)
      .drop("__bucket")
  }
}
