package graft.sources

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.types.{ByteType, DataType, IntegerType, LongType,
  ShortType, TimestampType}

/** Manifest-envelope FILE pruning for the DataSourceV2 read doors —
  * the [[SnapshotTable.readPruned]] logic applied to PUSHED filters, so
  * a SQL `WHERE ts > X` on a statsCols table skips whole files from
  * the manifest before any footer is opened. At 100 TB the win of a
  * stats envelope is never OPENING the file; parquet row-group
  * skipping only saves the data pages after the footer read already
  * cost a round trip per file.
  *
  * Soundness: a file is dropped only when some CONJUNCT of the pushed
  * predicate provably matches no row in it. Pushed filters are the
  * conjuncts of the Filter above the scan, each extracted range is
  * null-rejecting on its column (a NULL never satisfies `=`, `<`,
  * `BETWEEN`, or `IN`), and envelopes cover the file's non-null values
  * — so "envelope disjoint from the conjunct's allowed interval"
  * means no row, null or not, survives the full predicate. Spark
  * re-evaluates the residual filter above the scan regardless, so
  * pruning only ever removes provably-dead I/O, never changes rows.
  * Everything unrecognized (other types, ORs, casts, functions) simply
  * extracts nothing and prunes nothing.
  */
private[sources] object GraftPrune {

  /** Is this an attribute type whose committed envelope (the
    * cast-to-long [min,max] the manifest records) ORDERS THE SAME as
    * the column itself? Plain integrals only — mirroring the commit
    * side's footerResolvable rule. Shared with the SQL DELETE
    * translation (GraftSqlDelete), which rides the same rule.
    */
  def integral(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }

  /** Envelope-PRUNABLE attribute types: the integrals above, plus
    * timestamps — whose committed envelope is the aggregate path's
    * `cast(ts as long)` = epoch-SECONDS (floorDiv of the internal
    * micros by 1e6, Spark's timestamp→long cast). Pruning only needs
    * the envelope map to be MONOTONE in the column, which floor
    * division is; SQL DELETE's range translation needs exact
    * equivalence and so stays on [[integral]]. DateType is absent
    * because the commit side cannot write date envelopes at all
    * (date→long is not a valid Spark cast — the aggregate fails
    * loudly at commit, so there is nothing to prune against).
    */
  def prunable(dt: DataType): Boolean =
    integral(dt) || dt == TimestampType

  private val MicrosPerSec = 1000000L

  /** Map a bound from the column's raw literal domain (the value
    * itself for integrals; internal MICROS for timestamps) into the
    * committed envelope domain. Monotone nondecreasing, so applying
    * it to both endpoints of a raw interval yields a sound envelope
    * interval: x ∈ [lo, hi] ⟹ env(x) ∈ [env(lo), env(hi)].
    */
  private def envOf(dt: DataType, v: Long): Long = dt match {
    case TimestampType => Math.floorDiv(v, MicrosPerSec)
    case _ => v
  }

  /** A plain integral JVM value widened to Long (the shared literal
    * rule of envelope pruning and SQL DELETE translation); None for
    * anything else.
    */
  def asLong(v: Any): Option[Long] = v match {
    case b: Byte => Some(b.toLong)
    case s: Short => Some(s.toLong)
    case i: Int => Some(i.toLong)
    case j: Long => Some(j)
    case _ => None
  }

  private def litLong(l: Literal): Option[Long] = asLong(l.value)

  /** The allowed [lo, hi] interval each recognized null-rejecting
    * conjunct confines its column to, lowercase column name. `And`
    * splits; anything else unrecognized contributes nothing.
    */
  def ranges(filters: Seq[Expression]): Seq[(String, Long, Long)] =
    filters.flatMap(rangesOf)

  private def rangesOf(e: Expression): Seq[(String, Long, Long)] = e match {
    case And(l, r) => rangesOf(l) ++ rangesOf(r)
    case EqualTo(a: Attribute, l: Literal) => eq(a, l)
    case EqualTo(l: Literal, a: Attribute) => eq(a, l)
    // <=> with a NON-null literal is = on non-null values and false on
    // null ones — null-rejecting, same interval as =
    case EqualNullSafe(a: Attribute, l: Literal) if l.value != null => eq(a, l)
    case EqualNullSafe(l: Literal, a: Attribute) if l.value != null => eq(a, l)
    case GreaterThan(a: Attribute, l: Literal) => above(a, l, open = true)
    case GreaterThanOrEqual(a: Attribute, l: Literal) => above(a, l, open = false)
    case LessThan(a: Attribute, l: Literal) => below(a, l, open = true)
    case LessThanOrEqual(a: Attribute, l: Literal) => below(a, l, open = false)
    // mirrored literal-first forms flip the comparison
    case GreaterThan(l: Literal, a: Attribute) => below(a, l, open = true)
    case GreaterThanOrEqual(l: Literal, a: Attribute) => below(a, l, open = false)
    case LessThan(l: Literal, a: Attribute) => above(a, l, open = true)
    case LessThanOrEqual(l: Literal, a: Attribute) => above(a, l, open = false)
    // IN is a disjunction of equalities: its hull [min, max] is a
    // SUPERSET of the allowed set — conservative, still sound
    case In(a: Attribute, ls) if prunable(a.dataType) &&
        ls.nonEmpty && ls.forall(_.isInstanceOf[Literal]) =>
      val vs = ls.map(l => litLong(l.asInstanceOf[Literal]))
      if (vs.exists(_.isEmpty)) Nil
      else Seq((a.name.toLowerCase,
        envOf(a.dataType, vs.flatten.min), envOf(a.dataType, vs.flatten.max)))
    case InSet(a: Attribute, hset) if prunable(a.dataType) && hset.nonEmpty =>
      val vs = hset.toSeq.map(asLong)
      if (vs.exists(_.isEmpty)) Nil
      else Seq((a.name.toLowerCase,
        envOf(a.dataType, vs.flatten.min), envOf(a.dataType, vs.flatten.max)))
    case _ => Nil
  }

  private def eq(a: Attribute, l: Literal): Seq[(String, Long, Long)] =
    if (!prunable(a.dataType)) Nil
    else litLong(l).map(v =>
      (a.name.toLowerCase, envOf(a.dataType, v), envOf(a.dataType, v))).toSeq

  // open bounds close by ±1 in the RAW domain (micros for timestamps:
  // ts > L means micros ≥ L+1), THEN map into the envelope domain —
  // which is exactly the conservative rounding the envelope needs
  // (floor for the lower bound of `>`, since floorDiv(L+1, 1e6) is the
  // smallest envelope value any satisfying row can have)
  private def above(a: Attribute, l: Literal,
                    open: Boolean): Seq[(String, Long, Long)] =
    if (!prunable(a.dataType)) Nil
    else litLong(l).flatMap { v =>
      if (open && v == Long.MaxValue) None // col > MAX: nothing to bound
      else Some((a.name.toLowerCase,
        envOf(a.dataType, if (open) v + 1 else v), Long.MaxValue))
    }.toSeq

  private def below(a: Attribute, l: Literal,
                    open: Boolean): Seq[(String, Long, Long)] =
    if (!prunable(a.dataType)) Nil
    else litLong(l).flatMap { v =>
      if (open && v == Long.MinValue) None
      else Some((a.name.toLowerCase, Long.MinValue,
        envOf(a.dataType, if (open) v - 1 else v)))
    }.toSeq

  /** Does a file with these committed stats possibly hold a surviving
    * row? False only when some conjunct's interval is provably
    * disjoint from the file's envelope. A file without an envelope for
    * a conjunct's column is conservatively kept.
    */
  def keep(stats: Map[String, (Long, Long)],
           rs: Seq[(String, Long, Long)]): Boolean =
    rs.forall { case (c, lo, hi) =>
      // exact-key hit first (stats keys are committed column names,
      // typically already lowercase), then a case-insensitive sweep of
      // the handful of entries — no per-file map copy on a path that
      // runs once per file per scan build / micro-batch
      stats.get(c)
        .orElse(stats.collectFirst {
          case (k, v) if k.equalsIgnoreCase(c) => v
        })
        .forall { case (flo, fhi) => flo <= hi && fhi >= lo }
    }

  /** The surviving file paths (same order), given per-path stats. */
  def prune(files: Seq[String],
            stats: Map[String, Map[String, (Long, Long)]],
            rs: Seq[(String, Long, Long)]): Seq[String] =
    if (rs.isEmpty) files
    else files.filter(f => keep(stats.getOrElse(f, Map.empty), rs))
}
