package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.sources.Sources

/** Pins parquet schema-drift behavior — the ingest surface a 100 TB
  * pipeline hits the day a producer adds a column mid-table. Three
  * contracts (see Sources.readParquetEvolving):
  *  1. merged read: the added column surfaces table-wide, NULL for
  *     pre-drift files;
  *  2. the PLAIN read's footer-lottery is real (the drifted column's
  *     presence depends on which file wins inference) — documented as
  *     the trap, not relied upon;
  *  3. an incompatible type change fails loudly at read time rather
  *     than corrupting values.
  */
class SchemaEvolutionSpec extends SparkSpec {

  test("a column added mid-table reads as NULL for pre-drift files under the merged read") {
    import spark.implicits._
    val dir = Files.createTempDirectory("evolve").toString + "/t"
    (0L until 10L).map(i => (i, s"v$i")).toDF("k", "v")
      .coalesce(1).write.parquet(dir)
    (10L until 20L).map(i => (i, s"v$i", i * 100.0)).toDF("k", "v", "score")
      .coalesce(1).write.mode("append").parquet(dir)

    val merged = Sources.readParquetEvolving(spark, dir)
    assert(merged.columns.toSet == Set("k", "v", "score"),
      s"merged schema must union the footers: ${merged.columns.toSeq}")
    assert(merged.filter(col("k") < 10 && col("score").isNull).count() == 10,
      "pre-drift rows read the added column as NULL")
    assert(merged.filter(col("k") >= 10 && col("score") === col("k") * 100.0).count() == 10,
      "post-drift rows keep their values")

    // the plain read picks ONE footer — whichever wins, it reads
    // without error but may silently DROP the drifted column; pin that
    // the hazard is schema-level, not a crash
    val plain = spark.read.parquet(dir)
    assert(plain.columns.toSet.subsetOf(Set("k", "v", "score")) &&
      plain.columns.toSet.contains("k"),
      s"plain read resolves to one footer's schema: ${plain.columns.toSeq}")
  }

  test("an incompatible type change across files fails loudly, never corrupts") {
    import spark.implicits._
    val dir = Files.createTempDirectory("evolve2").toString + "/t"
    Seq((1L, "a")).toDF("k", "v").coalesce(1).write.parquet(dir)
    Seq(("not-a-number", "b")).toDF("k", "v")
      .coalesce(1).write.mode("append").parquet(dir)
    val e = intercept[Exception] {
      Sources.readParquetEvolving(spark, dir).collect()
    }
    val msg = Option(e.getMessage).getOrElse("") + Option(e.getCause)
      .flatMap(c => Option(c.getMessage)).getOrElse("")
    assert(msg.toLowerCase.contains("merge") || msg.toLowerCase.contains("schema") ||
      msg.toLowerCase.contains("parquet"),
      s"type conflict must surface as a schema error: ${msg.take(300)}")
  }
}
