package graft

import org.apache.spark.sql.functions._

/** AQE skew-join handling (SURVEY.md §4 / §7.7): with a hot key on the
  * probe side, adaptive execution must split the oversized shuffle
  * partition at runtime — the built-in answer to data skew, next to the
  * manual salting twin (graft.pipeline.Skew.saltedJoin).
  */
class SkewJoinSpec extends SparkSpec {

  test("AQE splits a skewed join partition at runtime") {
    // isolated session: skew thresholds tuned down to fire at test scale
    val s = spark.newSession()
    s.conf.set("spark.sql.adaptive.enabled", "true")
    s.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1")
    s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16KB")
    s.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB")
    s.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s.conf.set("spark.sql.shuffle.partitions", "4")
    import s.implicits._

    // 200k rows on one hot key vs a uniform dimension: partition for
    // key 1 dwarfs the others
    val fact = s.range(200000).select(
      when(col("id") % 10 === 0, col("id") % 50).otherwise(lit(1L)).as("k"),
      col("id").as("payload"))
    val dim = s.range(50).select(col("id").as("k"), (col("id") * 2).as("attr"))

    val joined = fact.join(dim, "k")
    // collect() (not count()) so THIS QueryExecution runs and its
    // adaptive plan finalizes — count() would execute a separate plan
    assert(joined.collect().length == 200000)
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("skew=true"),
      s"AQE must mark the hot partition as skewed and split it: ${plan.take(800)}")
  }
}
