package graft.pipeline

import org.apache.spark.sql.DataFrame
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

  /** Inner-join `left` and `right` on equal `keys` and
    * `|left.lTs − right.rTs| <= band` (inclusive).
    *
    * @param band  band half-width in the ts columns' own unit
    * @return all left + right columns (right's renamed with `r_` prefix
    *         when colliding)
    */
  def absBand(left: DataFrame, right: DataFrame, keys: Seq[String],
              lTs: String, rTs: String, band: Long): DataFrame = {
    require(band > 0, "band must be positive")
    val collisions = right.columns.toSet.intersect(left.columns.toSet) -- keys
    val r0 = collisions.foldLeft(right)((df, c) => df.withColumnRenamed(c, s"r_$c"))
    val rTsName = if (collisions.contains(rTs)) s"r_$rTs" else rTs

    // exact integer floor division — `floor(col / band)` would divide as
    // doubles, and ns-scale longs (~1.7e18) exceed double's 2^53 exact
    // range, so boundary rows could land one bucket off and silently
    // drop in-band pairs. (x - pmod(x, band)) DIV band is sign-correct
    // and exact, matching graft.plans.BandJoinRewrite.
    def bucketOf(c: String) =
      expr(s"($c - pmod($c, ${band}L)) DIV ${band}L")
    val rBinned = r0.withColumn("__bucket", bucketOf(rTsName))
    // each left row probes its own and both adjacent buckets; any match
    // within ±band lives in one of the three
    val lBinned = left
      .withColumn("__probe", explode_outer(array(lit(-1L), lit(0L), lit(1L))))
      .withColumn("__bucket", bucketOf(lTs) + col("__probe"))
      .drop("__probe")

    lBinned
      .join(rBinned, keys :+ "__bucket")
      .filter(abs(col(lTs) - col(rTsName)) <= band)
      .drop("__bucket")
  }
}
