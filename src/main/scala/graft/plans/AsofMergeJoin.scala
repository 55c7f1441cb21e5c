package graft.plans

import org.apache.spark.sql.{DataFrame, GraftColumnShim, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.functions.col
import org.apache.spark.rdd.RDD

/** Native as-of join — the full extension ladder step (c): a custom
  * `LogicalPlan` node, a `SparkStrategy`, and a physical operator
  * (SURVEY.md §4). Unlike the composed form (`graft.operators.AsofJoin`:
  * union + window), this plans as ONE hash Exchange + sort per side and
  * a single streaming merge per partition: the union never materializes
  * both inputs into one sorted run, the right payload is never carried
  * through a window buffer, and memory is O(1) per partition beyond the
  * sorters. Semantics: each left row picks up the latest right row with
  * `right.ts <= left.ts` within the same key (inclusive, right-before-
  * left on ties — DuckDB ASOF JOIN semantics), left-outer. NULL join
  * keys never match (SQL equi-join semantics): the strategy filters
  * null-key right rows below the merge, and a null-key left row can
  * equal no carried key (keys in the carry are all non-null), so it
  * emits unmatched.
  */
case class AsofJoinNode(
    left: LogicalPlan, right: LogicalPlan,
    leftKeys: Seq[Attribute], rightKeys: Seq[Attribute],
    leftTs: Attribute, rightTs: Attribute,
    rightTieBreak: Seq[Attribute],
    forward: Boolean = false) extends BinaryNode {
  require(leftKeys.nonEmpty && leftKeys.length == rightKeys.length)
  // mismatched types would hash-partition the two sides incompatibly and
  // misread UnsafeRow fields — silent wrong results; fail loudly instead
  require(leftKeys.zip(rightKeys).forall { case (l, r) => l.dataType == r.dataType },
    s"as-of key types must match: ${leftKeys.map(_.dataType)} vs ${rightKeys.map(_.dataType)}")
  require(leftTs.dataType == rightTs.dataType,
    s"as-of ts types must match: ${leftTs.dataType} vs ${rightTs.dataType}")
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsofJoinNode =
    copy(left = newLeft, right = newRight)
}

object AsofJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsofJoinNode(l, r, lk, rk, lts, rts, tb, fwd) =>
      // NULL keys never match (SQL equi-join semantics): a null-key right
      // row could only ever be absorbed by the interpreted key ordering
      // treating null == null — cut it below the Exchange instead. The
      // null-key LEFT rows stay (left-outer: they emit with null payload;
      // the merge can never equate their key with a non-null carry).
      val rNN = Filter(rk.map(IsNotNull).reduce[Expression](And), r)
      AsofMergeJoinExec(planLater(l), planLater(rNN), lk, rk, lts, rts, tb, fwd) :: Nil
    case _ => Nil
  }
}

/** Physical merge: requires both children hash-clustered on the keys and
  * sorted by (keys, ts[, tieBreak]) — EnsureRequirements inserts the
  * Exchange/Sort pair per side — then zips partitions and merges with
  * two cursors. Right rows behind the current left key are discarded
  * (sorted inputs: they can never match again); the newest in-horizon
  * right row is kept as the carry (copied — Tungsten rows are reused).
  */
case class AsofMergeJoinExec(
    left: SparkPlan, right: SparkPlan,
    leftKeys: Seq[Attribute], rightKeys: Seq[Attribute],
    leftTs: Attribute, rightTs: Attribute,
    rightTieBreak: Seq[Attribute],
    forward: Boolean = false) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  private def asc(e: Expression) = SortOrder(e, Ascending, NullsFirst, Seq.empty)

  // forward walks time backward: keys stay ascending (the merge compares
  // them naturally), but ts and tieBreak flip so the LAST absorbed right
  // row is the earliest-at-or-after / min-tieBreak one — the exact
  // mirror of backward's latest-at-or-before / max-tieBreak
  private def tsOrd(e: Expression) =
    SortOrder(e, if (forward) Descending else Ascending, NullsFirst, Seq.empty)

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    leftKeys.map(asc) :+ tsOrd(leftTs),
    (rightKeys.map(asc) :+ tsOrd(rightTs)) ++ rightTieBreak.map(tsOrd))

  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsofMergeJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val lKeyExprs = leftKeys
    val rKeyExprs = rightKeys
    val lTsA = leftTs
    val rTsA = rightTs
    val keyTypes = leftKeys.map(_.dataType)
    val tsType = leftTs.dataType
    val rWidth = rOut.size
    val fwd = forward

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(lKeyExprs, lOut)
      val rKeyProj = UnsafeProjection.create(rKeyExprs, rOut)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(keyTypes)
      val nullRight = new GenericInternalRow(rWidth)
      val joined = new JoinedRow

      // ts accessors: primitive ordinal reads for long/int-backed types
      // (the per-row boxing of the interpreted Ordering path measured
      // ~6× slower on a 1M-row merge); interpreted eval as the fallback
      val lTsOrdinal = lOut.indexWhere(_.exprId == lTsA.exprId)
      val rTsOrdinal = rOut.indexWhere(_.exprId == rTsA.exprId)
      abstract class TsCmp {
        /** latch the left row's ts once per left row; true if it's null */
        def setLeft(l: InternalRow): Boolean
        def rNull(r: InternalRow): Boolean
        /** right.ts in the match horizon of the latched left ts —
          * `<=` backward, `>=` forward — both known non-null */
        def rLeL(r: InternalRow): Boolean
      }
      import org.apache.spark.sql.types._
      val tsCmp: TsCmp = tsType match {
        case LongType | TimestampType | TimestampNTZType => new TsCmp {
          private var lv = 0L
          def setLeft(l: InternalRow) = {
            val n = l.isNullAt(lTsOrdinal)
            if (!n) lv = l.getLong(lTsOrdinal)
            n
          }
          def rNull(r: InternalRow) = r.isNullAt(rTsOrdinal)
          def rLeL(r: InternalRow) =
            if (fwd) r.getLong(rTsOrdinal) >= lv else r.getLong(rTsOrdinal) <= lv
        }
        case IntegerType | DateType => new TsCmp {
          private var lv = 0
          def setLeft(l: InternalRow) = {
            val n = l.isNullAt(lTsOrdinal)
            if (!n) lv = l.getInt(lTsOrdinal)
            n
          }
          def rNull(r: InternalRow) = r.isNullAt(rTsOrdinal)
          def rLeL(r: InternalRow) =
            if (fwd) r.getInt(rTsOrdinal) >= lv else r.getInt(rTsOrdinal) <= lv
        }
        case _ => new TsCmp {
          private val lEval = BindReferences.bindReference(lTsA: Expression, lOut)
          private val rEval = BindReferences.bindReference(rTsA: Expression, rOut)
          private val ord =
            TypeUtils.getInterpretedOrdering(tsType).asInstanceOf[Ordering[Any]]
          private var lv: Any = _
          def setLeft(l: InternalRow) = { lv = lEval.eval(l); lv == null }
          def rNull(r: InternalRow) = rEval.eval(r) == null
          def rLeL(r: InternalRow) = {
            val c = ord.compare(rEval.eval(r), lv)
            if (fwd) c >= 0 else c <= 0
          }
        }
      }

      new Iterator[InternalRow] {
        private var rHead: InternalRow = _          // lookahead (not yet consumed)
        private var carried: InternalRow = _        // copied newest in-horizon right row
        private var carriedKey: UnsafeRow = _       // copied key of the carry

        override def hasNext: Boolean = lIter.hasNext

        override def next(): InternalRow = {
          val lRow = lIter.next()
          val lKey = lKeyProj(lRow)
          val lTsNull = tsCmp.setLeft(lRow)
          var absorbed = false
          // advance the right cursor: discard keys behind us, absorb
          // in-horizon rows of our key into the carry, stop at the first
          // row beyond (key, ts)
          var advancing = true
          while (advancing) {
            if (rHead == null && rIter.hasNext) rHead = rIter.next()
            if (rHead == null) advancing = false
            else {
              val cmp = keyOrd.compare(rKeyProj(rHead), lKey)
              if (cmp < 0) rHead = null // dead key: left only moves forward
              else if (cmp > 0) advancing = false
              else {
                if (tsCmp.rNull(rHead)) rHead = null // null ts matches nothing
                else if (!lTsNull && tsCmp.rLeL(rHead)) {
                  carried = rHead.copy() // Tungsten rows are reused — copy
                  absorbed = true
                  rHead = null
                } else advancing = false // right is ahead of this left row
              }
            }
          }
          // key copy hoisted out of the absorb loop: lKey is constant for
          // this left row, one copy covers every absorbed right row
          if (absorbed) carriedKey = lKey.copy()
          val matched = !lTsNull && carried != null &&
            keyOrd.compare(carriedKey, lKey) == 0
          joined(lRow, if (matched) carried else nullRight)
        }
      }
    }
  }
}

/** Public API over the native operator. */
object AsofMergeJoin {

  /** Register the strategy once per session (idempotent). */
  def ensureStrategy(spark: SparkSession): Unit =
    if (!spark.experimental.extraStrategies.contains(AsofJoinStrategy))
      spark.experimental.extraStrategies =
        AsofJoinStrategy +: spark.experimental.extraStrategies

  /** Backward as-of join with the same surface as
    * `graft.operators.AsofJoin.backward`: left columns + `asof_ts` +
    * `asof_<payload>` columns (null when no right row precedes).
    * Right-side columns are re-aliased (fresh expression ids), so
    * self-joins work.
    */
  def backward(left: DataFrame, right: DataFrame, key: Seq[String],
               leftTs: String, rightTs: String,
               tieBreak: Seq[String] = Nil): DataFrame =
    build(left, right, key, leftTs, rightTs, tieBreak, fwd = false)

  /** Forward twin: EARLIEST right row with `right.ts >= left.ts`
    * (inclusive; min tieBreak on ties) — the merge runs over the
    * time-reversed per-key ordering, same one-Exchange-per-side plan.
    */
  def forward(left: DataFrame, right: DataFrame, key: Seq[String],
              leftTs: String, rightTs: String,
              tieBreak: Seq[String] = Nil): DataFrame =
    build(left, right, key, leftTs, rightTs, tieBreak, fwd = true)

  /** Tolerance bound (pandas merge_asof `tolerance`) over the native
    * operator's output. The native merge emits the same
    * `asof_ts`/`asof_*` column shape as the composed operator, so the
    * bound is the same overflow-clamped post-projection —
    * [[graft.operators.AsofJoin.within]] — and costs one codegen'd
    * projection, no extra shuffle. (Pushing the bound inside the merge
    * would not change the plan shape: the carry is already O(1).)
    */
  def within(joined: DataFrame, leftTs: String, tolerance: Long): DataFrame =
    graft.operators.AsofJoin.within(joined, leftTs, tolerance)

  def within(joined: DataFrame, leftTs: String, tolerance: Long,
             asofCols: Seq[String]): DataFrame =
    graft.operators.AsofJoin.within(joined, leftTs, tolerance, asofCols)

  private def build(left: DataFrame, right: DataFrame, key: Seq[String],
                    leftTs: String, rightTs: String,
                    tieBreak: Seq[String], fwd: Boolean): DataFrame = {
    val spark = left.sparkSession
    ensureStrategy(spark)
    val rPayload = right.columns.filterNot(c => key.contains(c) || c == rightTs)
    // tieBreak columns ride under their own aliases (as in the composed
    // operator) so tie-breaking on a key or the ts column also works
    val rSel = right.select(
      key.zipWithIndex.map { case (c, i) => col(c).as(s"__rk$i") } ++
        Seq(col(rightTs).as("asof_ts")) ++
        rPayload.map(c => col(c).as(s"asof_$c")) ++
        tieBreak.zipWithIndex.map { case (c, i) => col(c).as(s"__tb$i") }: _*)

    val lPlan = GraftColumnShim.analyzed(left)
    val rPlan = GraftColumnShim.analyzed(rSel)
    // case-insensitive like Spark's default column resolution
    def attr(plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
             name: String): Attribute =
      plan.output.find(_.name.equalsIgnoreCase(name)).getOrElse(
        throw new IllegalArgumentException(s"column $name not found"))

    val node = AsofJoinNode(
      lPlan, rPlan,
      key.map(attr(lPlan, _)),
      key.indices.map(i => attr(rPlan, s"__rk$i")),
      attr(lPlan, leftTs), attr(rPlan, "asof_ts"),
      tieBreak.indices.map(i => attr(rPlan, s"__tb$i")), forward = fwd)
    GraftColumnShim.ofRows(spark, node)
      .drop(key.indices.map(i => s"__rk$i") ++
        tieBreak.indices.map(i => s"__tb$i"): _*)
  }
}
