package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic, content-addressed sampling — the 100 TB substitute for
  * `df.sample()` when building training corpora and eval sets.
  *
  * `df.sample()` draws per-partition from a seeded RNG, so membership
  * changes with partitioning, cluster size, and input order — useless for
  * a reproducible train/val/test protocol. Hashing a stable key instead
  * gives a sample that is (a) reproducible across runs, engines, and
  * cluster layouts, (b) stable under data growth — appending new rows
  * never flips membership of old rows, so incremental pipeline runs stay
  * consistent — and (c) free at scale: a scan-level codegen'd filter, no
  * shuffle, no state. md5 is used (not xxhash/murmur) because its bytes
  * are identical in every engine, making the sample itself portable.
  */
object Sampling {

  /** 16-bit uniform hash of a key: the first 4 hex chars of md5 as a
    * long in [0, 65536). Uniform across keys; any key type (cast to
    * string first for cross-engine stability).
    */
  def hash16(key: Column): Column =
    conv(substring(md5(key.cast("string")), 1, 4), 16, 10).cast("long")

  /** Deterministic Bernoulli sample: keeps rows whose hash16 falls below
    * `fraction` of the 16-bit space (granularity 1/65536).
    */
  def bernoulli(df: DataFrame, key: Column, fraction: Double): DataFrame = {
    require(fraction >= 0 && fraction <= 1, "fraction must be in [0,1]")
    df.filter(hash16(key) < math.round(fraction * 65536).toInt)
  }

  /** Deterministic stratified sample: the k smallest rows per stratum in
    * (hash, tiebreak) order. Hash-ordering makes the pick uniform within
    * the stratum; the unique tiebreak makes it total. One Exchange on the
    * stratum key; the window is the rank≤k top-k shape (partial per-
    * partition top-k at scale, not a global sort).
    */
  def stratified(df: DataFrame, stratum: Column, key: Column, tieBreak: Column,
                 k: Int): DataFrame = {
    val w = Window.partitionBy(stratum).orderBy(md5(key.cast("string")), tieBreak)
    df.withColumn("__sample_rn", row_number().over(w))
      .filter(col("__sample_rn") <= k)
      .drop("__sample_rn")
  }

  /** Deterministic WEIGHTED Bernoulli sample: row i is kept with
    * probability `weight_i / weightCap` (weights above the cap are kept
    * always) — the quality-weighted corpus subsetting step of a training
    * pipeline, with all of [[bernoulli]]'s purity properties. Membership
    * compares `hash16 · weightCap < weight · 65536` in EXACT integer
    * arithmetic (both sides < 2³¹·cap), so the sample is bit-reproducible
    * in any engine — no float threshold to drift.
    *
    * @param weight    integer column (e.g. n_chars, a quality score)
    * @param weightCap weight at/above which a row is always kept
    */
  def weighted(df: DataFrame, key: Column, weight: Column, weightCap: Long): DataFrame = {
    require(weightCap > 0, "weightCap must be positive")
    df.filter(hash16(key) * lit(weightCap) < weight.cast("long") * lit(65536L))
  }

  /** Deterministic TEMPERATURE-reweighted stratum mixing (T = 2): the
    * multilingual corpus-balancing step — sample so each stratum's share
    * moves from proportional (∝ n_s) toward uniform, keeping low-resource
    * strata at a higher rate. Stratum weight w_s = ⌊√n_s⌋ (n^(1/T));
    * expected take from stratum s is `target·N · w_s/Σw`, so row
    * membership is `hash16·Σw·n_s < M·w_s·65536` with M = round(target·N)
    * — ALL integer cross-multiplication (the weighted-Bernoulli trick,
    * lifted to data-derived per-stratum rates). ⌊√n⌋ is engine-exact:
    * IEEE sqrt is correctly rounded, so on an integer-valued double it
    * cannot straddle the floor boundary. The products are done in
    * decimal(38,0) — at 10¹² rows a BIGINT would overflow
    * (65535·N·n_s ≈ 10²⁸) but 38 digits hold to ~10¹⁶ rows. Acceptance
    * self-caps at 1: h < 65536 always, so when M·w_s ≥ Σw·n_s every row
    * passes. Two tiny broadcast joins (strata counts + one totals row)
    * on top of a scan-level filter — nothing shuffles the corpus.
    */
  def temperature(df: DataFrame, stratum: Column, key: Column,
                  targetFraction: Double): DataFrame = {
    require(targetFraction > 0 && targetFraction <= 1,
      "targetFraction must be in (0,1]")
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val counts = df.groupBy(stratum.as("__stratum"))
      .agg(count(lit(1)).as("__n"))
      .withColumn("__w", floor(sqrt(col("__n"))).cast("long"))
    val tot = counts.agg(sum(col("__n")).as("__ntot"), sum(col("__w")).as("__sw"))
    df.join(broadcast(counts), stratum === col("__stratum"))
      .crossJoin(broadcast(tot))
      .filter(dec(hash16(key)) * col("__sw") * col("__n") <
        dec(round(col("__ntot") * lit(targetFraction))) * col("__w") * lit(65536L))
      .drop("__stratum", "__n", "__w", "__ntot", "__sw")
  }

  /** Deterministic EPOCH UPSAMPLING: replicate each row of stratum s
    * e_s = min(cap, n_max / n_s) times — fractional epochs resolved per
    * row by hash membership — the domain-rebalancing replication step of
    * training-mix construction (every source upsampled toward the
    * largest source's row count, capped so rare strata never explode).
    * Where temperature() DOWN-samples toward a flat mix, this
    * UP-samples: both postures exist in real pipelines.
    *
    * Integer-exact: with E = min(cap·n_s, n_max), a row's replica count
    * is (E div n_s) + [hash16·n_s < (E mod n_s)·65536] — pure integer
    * cross-multiplies (hash16 < 2¹⁶, n_s ≤ 10¹² keeps every product
    * far under 2⁶³), so replica counts replay bit-for-bit in any
    * engine, and per-stratum expected row count is exactly E (each
    * stratum lands within 1/65536 of its fractional epoch).
    *
    * Plan: one tiny per-stratum count agg broadcast back, a 1-row max
    * broadcast, then a scan-level `sequence` explode — the corpus
    * itself never shuffles; output grows by exactly Σ_s e_s·n_s rows.
    * Emits the input row plus (n_replicas, replica = 1..n_replicas).
    */
  def epochs(df: DataFrame, stratum: Column, key: Column, cap: Long): DataFrame = {
    require(cap >= 1, "cap must be at least 1")
    val counts = df.groupBy(stratum.as("__stratum"))
      .agg(count(lit(1)).as("__n"))
    val nmax = counts.agg(max(col("__n")).as("__nmax"))
    df.join(broadcast(counts), stratum === col("__stratum"))
      .crossJoin(broadcast(nmax))
      .withColumn("__e", least(lit(cap) * col("__n"), col("__nmax")))
      .withColumn("n_replicas",
        expr("__e DIV __n") +
          when(hash16(key) * col("__n") < (col("__e") % col("__n")) * 65536L, 1L)
            .otherwise(0L))
      .withColumn("replica", explode(expr("sequence(1L, n_replicas)")))
      .drop("__stratum", "__n", "__nmax", "__e")
  }

  /** Deterministic train/val/test assignment by hash16 range. Fractions
    * are cumulative cut points in [0,1], e.g. (0.8, 0.9) → 80/10/10.
    * Membership is a pure function of the key: re-running over a grown
    * corpus never moves an old row between splits.
    */
  def split(key: Column, trainUpTo: Double, valUpTo: Double): Column = {
    require(trainUpTo >= 0 && trainUpTo <= valUpTo && valUpTo <= 1,
      "need 0 <= trainUpTo <= valUpTo <= 1")
    val h = hash16(key)
    when(h < math.round(trainUpTo * 65536).toInt, "train")
      .when(h < math.round(valUpTo * 65536).toInt, "val")
      .otherwise("test")
  }
}
