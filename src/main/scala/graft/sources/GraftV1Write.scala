package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, SupportsTruncate,
  V1Write, Write, WriteBuilder}
import org.apache.spark.sql.sources.InsertableRelation

/** SQL DML's append half, through the commit protocol: catalog-loaded
  * snapshot tables advertise `V1_BATCH_WRITE` (+ `TRUNCATE`), so
  * `INSERT INTO graft.ns.t SELECT ...` plans as Spark's V1 write
  * fallback — which hands over the WHOLE DataFrame, letting the write
  * BE [[SnapshotTable.append]] (or [[SnapshotTable.commit]] for
  * `INSERT OVERWRITE`) with every protocol guarantee intact:
  * claim-serialized concurrent writers, atomic manifest publication,
  * ledger headers carried forward. Spark's own store-assignment
  * validation runs above (ANSI: an unsafe cast into a table column
  * refuses at analysis), and the V1 seam means no per-task writer
  * commits to re-implement.
  *
  * Deliberately NOT advertised by path-based `format("graft-snapshot")`
  * tables: `df.write.save(root)` keeps its four spec-pinned SaveMode
  * semantics through [[GraftSnapshotSource.createRelation]]; the
  * catalog door opts in via an internal property.
  */
private[sources] class GraftV1WriteBuilder(root: String,
    info: LogicalWriteInfo, overwrite: Boolean = false)
    extends WriteBuilder with SupportsTruncate {

  /** INSERT OVERWRITE arrives as OverwriteByExpression(true) →
    * truncate(): the whole-snapshot replace.
    */
  override def truncate(): WriteBuilder =
    new GraftV1WriteBuilder(root, info, overwrite = true)

  override def build(): Write = new V1Write {
    override def toInsertableRelation: InsertableRelation =
      new InsertableRelation {
        override def insert(data: DataFrame, overwriteFlag: Boolean): Unit = {
          val spark = data.sparkSession
          if (overwrite || overwriteFlag)
            SnapshotTable.commit(spark, root, data)
          else
            SnapshotTable.append(spark, root, data)
        }
      }
  }
}
