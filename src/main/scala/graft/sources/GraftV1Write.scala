package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.connector.catalog.SupportsDelete
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, SupportsTruncate,
  V1Write, Write, WriteBuilder}
import org.apache.spark.sql.sources.{EqualNullSafe, EqualTo, Filter,
  GreaterThan, GreaterThanOrEqual, In, InsertableRelation, IsNotNull,
  LessThan, LessThanOrEqual}
import org.apache.spark.sql.types.{ByteType, DataType, IntegerType, LongType,
  ShortType, StructField, StructType}

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
          // carry the table's stat columns forward: a SQL-written file
          // without envelopes is invisible to file pruning, and an
          // INSERT OVERWRITE with statsCols = Nil would drop them
          // TABLE-wide — silently disabling readPruned / the DSv2
          // pruning this connector advertises
          val stats = SnapshotTable.carriedStatsCols(spark, root, data.schema)
          if (overwrite || overwriteFlag)
            SnapshotTable.commit(spark, root, data, statsCols = stats)
          else
            SnapshotTable.append(spark, root, data, statsCols = stats)
        }
      }
  }
}

/** SQL `DELETE FROM graft.ns.t WHERE ...` mapped onto the format's OWN
  * delete shapes — mixed into the catalog-loaded tables:
  *
  *  - a conjunction of equalities / IN-lists over distinct columns →
  *    [[SnapshotTable.deleteWhere]]: ONE equality-delete key file
  *    (the cross product of the IN lists, capped), commit cost = key
  *    bytes, resolved merge-on-read — the scattered-key shape;
  *  - a range conjunction over ONE integral column →
  *    [[SnapshotTable.deleteRange]]: whole in-envelope files drop
  *    from the manifest metadata-only, boundary files rewrite with
  *    the complement — the retention shape;
  *  - anything else (LIKE, OR, expressions, a provably-everything
  *    TRUE) → `canDeleteWhere` = false and Spark refuses at analysis,
  *    pointing at the condition; the Scala API expresses the rest.
  *
  * Both paths keep SQL DELETE null semantics: a NULL in the predicate
  * column never matches, so null rows survive — deleteWhere's keys
  * only match via null-safe equality against NON-null key values
  * here (equality literals are non-null by construction), and
  * deleteRange's boundary rewrite explicitly retains null range
  * values.
  */
private[sources] trait GraftSqlDelete extends SupportsDelete {
  /** The table root (provided by the mixing table). */
  protected def deleteRoot: String
  /** The committed schema (for key typing). */
  protected def deleteSchema: StructType
  /** SQL DML is a catalog-door surface, like INSERT. */
  protected def dmlEnabled: Boolean

  /** IN-list cross products beyond this many key rows refuse toward
    * the Scala API (a generated mega-IN should ship as a keys FRAME,
    * not a SQL literal).
    */
  private val MaxKeyRows = 100000

  /** The table root, exposed when SQL DML is enabled — the hook the
    * MERGE INTO rewrite ([[GraftSqlMergeRule]]) resolves its target
    * through, shared by all three table veneers (delete-free, MoR,
    * past-ceiling marker) because they all mix in this trait.
    */
  private[sources] final def sqlDmlRoot: Option[String] =
    if (dmlEnabled) Some(deleteRoot) else None

  /** The root unconditionally — for IDENTITY checks (is this relation
    * the same physical table?), which must see path-door loads too:
    * a MERGE source reading the target through the path door is just
    * as much a self-merge as one reading it through the catalog.
    */
  private[sources] final def sqlTableRoot: String = deleteRoot

  private sealed trait Translated
  private case class Keys(cols: Seq[String], rows: Seq[Seq[Any]])
      extends Translated
  private case class Range(col: String, lo: Long, hi: Long) extends Translated

  private def fieldOf(c: String): Option[StructField] =
    deleteSchema.fields.find(_.name.equalsIgnoreCase(c))

  // the integral/widening rules are GraftPrune's — ONE definition of
  // "plain integrals order the same as their cast-to-long envelope"
  private def integral(dt: DataType): Boolean = GraftPrune.integral(dt)
  private def asLong(v: Any): Option[Long] = GraftPrune.asLong(v)

  private def translate(filters: Array[Filter]): Option[Translated] = {
    // IsNotNull conjuncts are redundant next to the null-rejecting
    // shapes below — droppable when their column is otherwise
    // constrained, untranslatable alone
    val (notNulls, rest) = filters.partition(_.isInstanceOf[IsNotNull])
    val nnCols = notNulls.collect { case IsNotNull(c) => c.toLowerCase }
    if (rest.isEmpty) return None // DELETE with no usable predicate
    // shape 1: equalities / IN-lists on distinct columns
    val eqs = rest.map {
      case EqualTo(c, v) if v != null => Some(c -> Seq(v))
      case EqualNullSafe(c, v) => Some(c -> Seq(v)) // null key matches null rows
      case In(c, vs) if vs.nonEmpty && vs.forall(_ != null) =>
        Some(c -> vs.toSeq)
      case _ => None
    }
    if (eqs.forall(_.isDefined)) {
      val byCol = eqs.flatten.toSeq
      val cols = byCol.map(_._1)
      // SATURATING cross-product size: a plain Long product of several
      // large IN lists can wrap negative and slip under the cap — after
      // which the driver would materialize the full cross product the
      // cap exists to refuse. Stop multiplying at the first crossing;
      // every factor is >= 1 (empty IN lists never reach here), so the
      // running product is monotone and the early exit is sound.
      val crossSize = byCol.foldLeft(1L) { case (acc, (_, vs)) =>
        if (acc > MaxKeyRows) acc else acc * vs.size
      }
      if (cols.map(_.toLowerCase).distinct.size == cols.size &&
          cols.forall(c => fieldOf(c).isDefined) &&
          nnCols.forall(c => cols.exists(_.toLowerCase == c)) &&
          crossSize <= MaxKeyRows) {
        val rows = byCol.foldLeft(Seq(Seq.empty[Any])) { case (acc, (_, vs)) =>
          for { r <- acc; v <- vs } yield r :+ v
        }
        return Some(Keys(cols, rows))
      }
      // duplicate columns, unknown columns, or an oversized cross
      // product fall through — the range shape cannot match equality
      // conjuncts, so the net is a refusal toward the Scala API
    }
    // shape 2: a range conjunction on ONE integral column
    val ranges = rest.map {
      case GreaterThan(c, v) => asLong(v).flatMap(x =>
        if (x == Long.MaxValue) None else Some((c, x + 1, Long.MaxValue)))
      case GreaterThanOrEqual(c, v) => asLong(v).map(x => (c, x, Long.MaxValue))
      case LessThan(c, v) => asLong(v).flatMap(x =>
        if (x == Long.MinValue) None else Some((c, Long.MinValue, x - 1)))
      case LessThanOrEqual(c, v) => asLong(v).map(x => (c, Long.MinValue, x))
      case _ => None
    }
    if (ranges.forall(_.isDefined)) {
      val rs = ranges.flatten
      val cols = rs.map(_._1.toLowerCase).distinct
      if (cols.size == 1 && nnCols.forall(_ == cols.head) &&
          fieldOf(cols.head).exists(f => integral(f.dataType))) {
        val lo = rs.map(_._2).max
        val hi = rs.map(_._3).min
        return Some(Range(rs.head._1, lo, hi))
      }
    }
    None
  }

  override def canDeleteWhere(filters: Array[Filter]): Boolean =
    dmlEnabled && translate(filters).isDefined

  /** `TRUNCATE TABLE` would commit an EMPTY snapshot, which the format
    * refuses by design — and the default (returning false) makes
    * TruncateTableExec a SILENT no-op, which is worse than a refusal.
    */
  override def truncateTable(): Boolean =
    throw new UnsupportedOperationException(
      s"$deleteRoot: TRUNCATE would commit an empty snapshot, which " +
        "the format refuses — INSERT OVERWRITE replaces the contents; " +
        "DROP TABLE removes the table")

  override def deleteWhere(filters: Array[Filter]): Unit = {
    val spark = SparkSession.active
    // TRUNCATE TABLE arrives here directly (TruncatableTable's default
    // bypasses canDeleteWhere) as an unconditional delete — which
    // would commit an EMPTY snapshot, something the format refuses by
    // design. Name the real doors.
    if (filters.isEmpty ||
        filters.exists(_.isInstanceOf[org.apache.spark.sql.sources.AlwaysTrue]))
      throw new UnsupportedOperationException(
        s"$deleteRoot: unconditional DELETE/TRUNCATE would commit an " +
          "empty snapshot, which the format refuses — INSERT OVERWRITE " +
          "replaces the contents; DROP TABLE removes the table")
    translate(filters).getOrElse(throw new UnsupportedOperationException(
      s"$deleteRoot: unsupported DELETE condition — use " +
        "SnapshotTable.deleteWhere/deleteRange")) match {
      case Keys(cols, rows) =>
        val schema = StructType(cols.map(c =>
          fieldOf(c).get.copy(name = c, nullable = true)))
        val coerced = rows.map { r =>
          Row.fromSeq(r.zip(schema.fields).map { case (v, f) =>
            coerce(v, f.dataType)
          })
        }
        import scala.jdk.CollectionConverters._
        SnapshotTable.deleteWhere(spark, deleteRoot,
          spark.createDataFrame(coerced.asJava, schema))
      case Range(col, lo, hi) =>
        // an empty intersection is a provably-empty delete: no commit.
        // The boundary rewrite re-commits files — carry EVERY existing
        // stat column, not just the range column, or the rewrite
        // silently narrows the table's envelope coverage
        if (lo <= hi) {
          val stats = SnapshotTable.statsColsOf(spark, deleteRoot)
            .filterNot(_.equalsIgnoreCase(col)) :+ col
          SnapshotTable.deleteRange(spark, deleteRoot, col, lo, hi, stats)
        }
    }
  }

  /** V1 Filter literals arrive as plain JVM values whose width may not
    * match the table column (an INT literal against a BIGINT column);
    * align them so the keys frame carries the table's own types.
    */
  private def coerce(v: Any, dt: DataType): Any = (v, dt) match {
    case (null, _) => null
    case (n: java.lang.Number, LongType) => n.longValue()
    case (n: java.lang.Number, IntegerType) => n.intValue()
    case (n: java.lang.Number, ShortType) => n.shortValue()
    case (n: java.lang.Number, ByteType) => n.byteValue()
    case (other, _) => other
  }
}
