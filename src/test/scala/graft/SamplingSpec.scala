package graft

import org.apache.spark.sql.functions._
import graft.pipeline.Sampling

/** Deterministic sampling: the properties that make it the 100 TB
  * substitute for df.sample() — membership is a pure function of the key
  * (stable under growth, repartitioning, and re-runs), strata are exact,
  * and splits partition the corpus.
  */
class SamplingSpec extends SparkSpec {

  private def docs = Tables.documents(spark, sf)

  test("bernoulli membership is a pure function of the key (growth/partition stable)") {
    def ids(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_id").collect().map(_.getLong(0)).toSet
    val full = ids(Sampling.bernoulli(docs, col("doc_id"), 0.2))
    // sampling a SLICE of the corpus, repartitioned differently, must
    // select exactly the slice of the full sample — df.sample() fails
    // both of these
    val slice = ids(Sampling.bernoulli(
      docs.filter(col("doc_id") < 200).repartition(7), col("doc_id"), 0.2))
    assert(slice == full.filter(_ < 200),
      "membership must not depend on corpus extent or partitioning")
    // uniformity sanity: 20% ± wide tolerance on 500 docs
    val n = docs.count()
    assert(full.size > n * 0.1 && full.size < n * 0.3,
      s"~20% expected, got ${full.size}/$n")
    assert(ids(Sampling.bernoulli(docs, col("doc_id"), 0.0)).isEmpty)
    assert(ids(Sampling.bernoulli(docs, col("doc_id"), 1.0)).size == n)
  }

  test("stratified returns exactly k per stratum and ignores partitioning") {
    val k = 7
    val sizes = Sampling.stratified(docs, col("lang"), col("doc_id"), col("doc_id"), k)
      .groupBy("lang").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sizes.nonEmpty && sizes.values.forall(_ == k), s"per-stratum sizes: $sizes")
    val a = Sampling.stratified(docs.repartition(13), col("lang"), col("doc_id"),
        col("doc_id"), k)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val b = Sampling.stratified(docs, col("lang"), col("doc_id"), col("doc_id"), k)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a == b, "stratified pick must not depend on partitioning")
  }

  test("weighted keeps high-weight rows surely and membership stays key-pure") {
    val kept = Sampling.weighted(docs, col("doc_id"), col("n_chars"), 2000L)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // rows at/above the cap are always kept
    val heavy = docs.filter(col("n_chars") >= 2000)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(heavy.subsetOf(kept), "weight >= cap must guarantee survival")
    // partition/extent purity, as for bernoulli
    val slice = Sampling.weighted(
        docs.filter(col("doc_id") < 200).repartition(5),
        col("doc_id"), col("n_chars"), 2000L)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(slice == kept.filter(_ < 200))
    // the keep rate tracks the mean weight/cap ratio (loose band)
    val ratio = docs.agg(avg(least(col("n_chars") / 2000.0, lit(1.0))))
      .head.getDouble(0)
    val rate = kept.size.toDouble / docs.count()
    assert(math.abs(rate - ratio) < 0.1,
      s"keep rate $rate should track mean weight ratio $ratio")
  }

  test("temperature mixing flattens: low-resource strata keep a higher rate") {
    val kept = Sampling.temperature(docs, col("lang"), col("doc_id"), 0.5)
    // per-lang acceptance rates: en (the head) must be kept at a strictly
    // lower rate than the rarest lang — the point of T=2 flattening
    val rates = kept.groupBy("lang").count()
      .join(docs.groupBy("lang").agg(count(lit(1)).as("n")), "lang")
      .select(col("lang"), (col("count") / col("n")).as("rate"), col("n"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2))).toMap
    val (headLang, _) = rates.maxBy(_._2._2)
    val (tailLang, _) = rates.minBy(_._2._2)
    assert(rates(headLang)._1 < rates(tailLang)._1,
      s"head $headLang must be downweighted vs tail $tailLang: $rates")
    // overall mass lands near the target (loose band: per-stratum
    // rounding + hash granularity)
    val rate = kept.count().toDouble / docs.count()
    assert(rate > 0.35 && rate < 0.65, s"target 0.5, got $rate")
    // membership stays key-pure under repartitioning (the df.sample()
    // failure mode); extent-purity does NOT hold here by design — the
    // rates themselves derive from the corpus counts
    val a = kept.select("doc_id").collect().map(_.getLong(0)).toSet
    val b = Sampling.temperature(docs.repartition(11), col("lang"), col("doc_id"), 0.5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a == b, "membership must not depend on partitioning")
  }

  test("token-budget selection equals the naive global-window form") {
    import org.apache.spark.sql.expressions.Window
    val got = operators.SamplingQueries.tokenBudgetCore(docs)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    val total = docs.agg(sum(col("n_chars"))).head.getLong(0)
    val naive = docs
      .withColumn("cum", sum(col("n_chars")).over(
        Window.orderBy(desc("n_chars"), col("doc_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .filter(col("cum") * 5 <= lit(total) * 2)
      .select(col("doc_id"), col("cum"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == naive,
      s"bucketed prefix sum must match the naive window: ${got.size} vs ${naive.size} rows")
    assert(got.nonEmpty, "the 40% budget must select a non-empty prefix")
  }

  test("split assigns every row exactly one bucket with ~80/10/10 mass") {
    val counts = docs.withColumn("split", Sampling.split(col("doc_id"), 0.8, 0.9))
      .groupBy("split").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = docs.count().toDouble
    assert(counts.keySet == Set("train", "val", "test"), s"buckets: $counts")
    assert(counts.values.sum == n.toLong, "assignment must be total and disjoint")
    assert(counts("train") / n > 0.7 && counts("train") / n < 0.9, s"train mass: $counts")
    // reproducibility: the same key always lands in the same split
    val again = docs.withColumn("split", Sampling.split(col("doc_id"), 0.8, 0.9))
      .groupBy("split").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(again == counts)
  }
}
