package graft.sources

import org.apache.spark.sql.{Column, DataFrame, GraftColumnShim, Row,
  SparkSession}
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{And, Attribute,
  AttributeReference, Cast, EqualTo, Expression, ExprId}
import org.apache.spark.sql.catalyst.plans.logical.{Assignment, DeleteAction,
  InsertAction, LogicalPlan, MergeAction, MergeIntoTable, UpdateAction,
  UpdateTable}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.functions._

/** SQL `MERGE INTO` over catalog-loaded snapshot tables, translated at
  * post-hoc resolution (the [[GraftMorFallbackRule]] pattern: replace
  * the plan before Spark's row-level-operation machinery refuses it)
  * into ONE equi-joined frame committed through the claim protocol:
  *
  * {{{
  * MERGE INTO graft.ns.t t USING updates s ON t.k = s.k
  * WHEN MATCHED AND s.del THEN DELETE
  * WHEN MATCHED THEN UPDATE SET tag = s.tag
  * WHEN NOT MATCHED THEN INSERT *
  * WHEN NOT MATCHED BY SOURCE THEN UPDATE SET tag = 'stale'
  * }}}
  *
  * Semantics are SQL MERGE's, in full: clauses evaluate IN ORDER and
  * the first applicable one wins; matched rows with no applicable
  * clause keep their target values; unmatched source rows with no
  * applicable insert are dropped; target-only rows flow through the
  * NOT MATCHED BY SOURCE clauses (default: kept). Partial `UPDATE SET`
  * keeps unassigned columns from the target row; unassigned INSERT
  * columns become NULL. NULL merge keys never match (plain equality),
  * so a null-keyed source row is an insert candidate and a null-keyed
  * target row flows to NOT MATCHED BY SOURCE — SQL join semantics.
  *
  * Scale shape: the merge condition must be a CONJUNCTION OF
  * EQUALITIES between a target column and a source-side expression —
  * exactly the shape that plans as a shuffled (or broadcast) hash
  * full-outer join, the plan [[SnapshotTable.merge]] produces. A
  * non-equi condition refuses loudly instead of degrading to a
  * nested-loop join over the whole table: residual predicates belong
  * in the WHEN clause conditions, which this translation evaluates on
  * the joined rows at no extra cost. Source cardinality is enforced
  * the way [[Layout.merged]] enforces it — at most ONE source row per
  * merge-key value, asserted map-side on the SOURCE alone (stricter
  * than SQL's matched-only cardinality rule, but loud and cheap: no
  * window over the joined frame, no second pass). The commit is a
  * whole-snapshot replace against the version read (`expectedBase` —
  * a rival commit refuses and the merge recomputes on retry); stat
  * columns carry forward like every SQL write here. For change sets
  * scoped to few files prefer [[SnapshotTable.mergeScoped]], which
  * carries untouched manifest lines instead of rewriting.
  *
  * Refusals (all loud, naming the Scala doors): non-equi merge
  * conditions, schema evolution (`WITH SCHEMA EVOLUTION` — evolution
  * here is commit-time, via append), nested-field assignment keys,
  * and a source that reads the target table itself (the commit would
  * replace the snapshot its own source is still reading).
  */
private[sources] class GraftSqlMergeRule(session: SparkSession)
    extends Rule[LogicalPlan] {

  private def graftTarget(p: LogicalPlan)
      : Option[(DataSourceV2Relation, Option[String])] = p.collectFirst {
    case r: DataSourceV2Relation if r.table.isInstanceOf[GraftSqlDelete] =>
      (r, r.table.asInstanceOf[GraftSqlDelete].sqlDmlRoot)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan match {
    case m: MergeIntoTable if m.resolved =>
      graftTarget(m.targetTable) match {
        case Some((r, Some(root))) => translate(m, r, root)
        case Some((_, None)) => throw new UnsupportedOperationException(
          "MERGE INTO a path-loaded snapshot table: SQL DML is the " +
            "catalog door's surface — load the table through a " +
            "GraftCatalog identifier, or use SnapshotTable.merge")
        case None => plan // not ours
      }
    // SQL UPDATE: the same translation family, simpler shape — no
    // join, just the target read projected through the assignments
    // under the condition, replace-committed against the version read
    case u: UpdateTable if u.resolved =>
      graftTarget(u.table) match {
        case Some((r, Some(root))) =>
          u.assignments.foreach { as =>
            if (!as.key.isInstanceOf[Attribute])
              throw new UnsupportedOperationException(
                s"$root: UPDATE of a nested field (${as.key.sql}) is not " +
                  "supported — update the whole top-level column")
          }
          GraftUpdateCommand(root, r.output, u.assignments, u.condition)
        case Some((_, None)) => throw new UnsupportedOperationException(
          "UPDATE of a path-loaded snapshot table: SQL DML is the " +
            "catalog door's surface — load the table through a " +
            "GraftCatalog identifier")
        case None => plan
      }
    case other => other
  }

  private def translate(m: MergeIntoTable, rel: DataSourceV2Relation,
                        root: String): LogicalPlan = {
    if (m.schemaEvolutionEnabled) throw new UnsupportedOperationException(
      s"$root: MERGE WITH SCHEMA EVOLUTION is not supported — schema " +
        "evolution here is commit-time (append a batch with the evolved " +
        "schema), then MERGE")
    // a source that scans the target table would read the very snapshot
    // the commit replaces — the Scala merge takes the changes as a
    // self-contained frame for exactly this reason. Identity check by
    // QUALIFIED root regardless of door (a path-door load of the same
    // table, possibly spelled with a file: scheme or doubled slashes,
    // is just as much a self-read); this rule registers BEFORE the MoR
    // fallback rule, so a past-ceiling source is still a relation here
    def qualified(p: String): String = {
      val hp = new org.apache.hadoop.fs.Path(p)
      hp.getFileSystem(session.sparkContext.hadoopConfiguration)
        .makeQualified(hp).toString
    }
    val qRoot = qualified(root)
    val selfRead = m.sourceTable.collectFirst {
      case r: DataSourceV2Relation
          if r.table.isInstanceOf[GraftSqlDelete] &&
            qualified(
              r.table.asInstanceOf[GraftSqlDelete].sqlTableRoot) == qRoot => r
    }
    if (selfRead.isDefined) throw new UnsupportedOperationException(
      s"$root: the MERGE source reads the target table itself — " +
        "materialize the change set first (CTAS a staging table), or " +
        "use SnapshotTable.merge with a precomputed changes frame")
    (m.matchedActions ++ m.notMatchedActions ++ m.notMatchedBySourceActions)
      .foreach(checkAction(root, _))
    // refuse non-equi conditions HERE, at analysis, with the condition
    // named — not at execution
    GraftSqlMergeExec.equiSourceKeys(root, m.mergeCondition,
      rel.output.map(_.exprId).toSet,
      m.sourceTable.outputSet.map(_.exprId).toSet)
    GraftMergeCommand(root, rel.output, m.sourceTable, m.mergeCondition,
      m.matchedActions, m.notMatchedActions, m.notMatchedBySourceActions)
  }

  private def checkAction(root: String, a: MergeAction): Unit = a match {
    case UpdateAction(_, assigns, _) => assigns.foreach { as =>
      if (!as.key.isInstanceOf[Attribute])
        throw new UnsupportedOperationException(
          s"$root: MERGE assignment to a nested field (${as.key.sql}) is " +
            "not supported — update the whole top-level column, or use " +
            "SnapshotTable.merge with a precomputed changes frame")
    }
    case _ => () // inserts are analyzer-aligned; deletes carry no assigns
  }
}

/** The translated MERGE: everything happens inside `run`, so the read,
  * the join, and the conditional commit all evaluate per EXECUTION — a
  * retried commit recomputes against the fresh base, like the Scala
  * merge.
  */
private[sources] case class GraftMergeCommand(
    root: String, targetOutput: Seq[Attribute], source: LogicalPlan,
    mergeCondition: Expression, matchedActions: Seq[MergeAction],
    notMatchedActions: Seq[MergeAction],
    notMatchedBySourceActions: Seq[MergeAction]) extends LeafRunnableCommand {

  override def innerChildren: Seq[LogicalPlan] = Seq(source)

  override def run(spark: SparkSession): Seq[Row] = {
    SnapshotTable.mergeSql(spark, root, targetOutput, source, mergeCondition,
      matchedActions, notMatchedActions, notMatchedBySourceActions)
    Seq.empty
  }
}

/** SQL `UPDATE t SET ... [WHERE ...]`, the no-join member of the
  * family: the target read projected through the assignments where
  * the condition holds (SQL semantics: a NULL condition does not
  * update), replace-committed against the version read. Rows never
  * move between evaluation and commit — the projection IS the update.
  * Commits with op "update"; the change feed refuses such versions
  * (an in-place rewrite has no insert+retraction expression without
  * pre-images), exactly as it refuses merge/replace.
  */
private[sources] case class GraftUpdateCommand(
    root: String, targetOutput: Seq[Attribute],
    assignments: Seq[Assignment], condition: Option[Expression])
    extends LeafRunnableCommand {

  override def run(spark: SparkSession): Seq[Row] = {
    SnapshotTable.updateSql(spark, root, targetOutput, assignments, condition)
    Seq.empty
  }
}

/** Frame construction for [[GraftMergeCommand]] — the commit/retry
  * plumbing lives on [[SnapshotTable.mergeSql]] so every mutation
  * shares one implementation of retryingCommit + statsCols
  * carry-forward.
  */
private[sources] object GraftSqlMergeExec {

  private val TAlias = "__graft_merge_t"
  private val SAlias = "__graft_merge_s"
  private val TPresent = "__graft_t_present"
  private val SPresent = "__graft_s_present"

  /** Decompose the merge condition into the SOURCE-side expressions of
    * its equality conjuncts (the cardinality-guard keys), refusing
    * loudly when any conjunct is not `targetColumn = sourceExpression`
    * (casts allowed on either side).
    */
  def equiSourceKeys(root: String, cond: Expression, tIds: Set[ExprId],
                     sIds: Set[ExprId]): Seq[Expression] = {
    def refsOnly(e: Expression, ids: Set[ExprId]): Boolean =
      e.references.forall(a => ids.contains(a.exprId)) &&
        e.references.nonEmpty
    def strip(e: Expression): Expression = e match {
      case c: Cast => strip(c.child)
      case other => other
    }
    def conjuncts(e: Expression): Seq[Expression] = e match {
      case And(l, r) => conjuncts(l) ++ conjuncts(r)
      case other => Seq(other)
    }
    conjuncts(cond).map {
      case EqualTo(l, r) if strip(l).isInstanceOf[AttributeReference] &&
          refsOnly(l, tIds) && refsOnly(r, sIds) => r
      case EqualTo(l, r) if strip(r).isInstanceOf[AttributeReference] &&
          refsOnly(r, tIds) && refsOnly(l, sIds) => l
      case other => throw new UnsupportedOperationException(
        s"$root: MERGE condition conjunct `${other.sql}` is not " +
          "`target.column = <source expression>` — only equi conditions " +
          "plan as a scalable hash join here. Put residual predicates in " +
          "the WHEN clause conditions, or use SnapshotTable.merge")
    }
  }

  /** Build the merged frame for one base version. `target` is the
    * Scala door's delete-aware read at that version.
    */
  def mergedFrame(root: String, target: DataFrame, source: DataFrame,
                  targetOutput: Seq[Attribute], sourceOutput: Seq[Attribute],
                  mergeCondition: Expression,
                  matchedActions: Seq[MergeAction],
                  notMatchedActions: Seq[MergeAction],
                  notMatchedBySourceActions: Seq[MergeAction]): DataFrame = {
    val cols = target.columns.toSeq
    val tIds: Map[ExprId, String] =
      targetOutput.map(a => a.exprId -> a.name).toMap
    val sIds: Map[ExprId, String] =
      sourceOutput.map(a => a.exprId -> a.name).toMap

    // a merge-plan expression rebound over the aliased join: target
    // attrs resolve through the target alias, source attrs through the
    // source alias — by EXPR ID, so duplicate names across the two
    // sides cannot cross-capture
    def toCol(e: Expression): Column = GraftColumnShim.column(e.transform {
      case a: AttributeReference if tIds.contains(a.exprId) =>
        UnresolvedAttribute(Seq(TAlias, tIds(a.exprId)))
      case a: AttributeReference if sIds.contains(a.exprId) =>
        UnresolvedAttribute(Seq(SAlias, sIds(a.exprId)))
    })

    // source cardinality, asserted on the SOURCE alone before the join
    // (Layout.merged's one-change-row-per-key discipline): the guard
    // column doubles as the presence flag so it can never be pruned
    // out. The window keys are the condition's source-side expressions
    // used VERBATIM — they carry resolved source attribute references,
    // which bind over the un-aliased source frame by expr id.
    val guardKeys = equiSourceKeys(root, mergeCondition,
      tIds.keySet, sIds.keySet)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(guardKeys.map(GraftColumnShim.column): _*)
    val t = target.withColumn(TPresent, lit(true)).alias(TAlias)
    // NULL-keyed source rows are exempt from the guard: they can never
    // match a target row (plain equality), so several of them are
    // legitimately several independent inserts — only non-null key
    // duplicates can double-apply to one target row. (Without the
    // exemption the window's null partition would lump them together
    // and refuse a legal merge.)
    val someKeyNull = guardKeys
      .map(k => GraftColumnShim.column(k).isNull)
      .reduce(_ || _)
    val s = source
      .withColumn(SPresent, coalesce(
        assert_true(someKeyNull || count(lit(1)).over(w) === 1L,
          lit(s"$root MERGE: more than one source row per merge-key " +
            "value — deduplicate the source on the merge keys")),
        lit(true)))
      .alias(SAlias)
    val joined = t.join(s, toCol(mergeCondition), "full_outer")
    val matched = col(s"$TAlias.$TPresent").isNotNull &&
      col(SPresent).isNotNull
    val sourceOnly = col(s"$TAlias.$TPresent").isNull
    def tCol(c: String): Column = col(s"$TAlias.`$c`")

    // one clause cascade = (keep?, per-column values): clauses evaluate
    // in order, first applicable wins; fold RIGHT so the FIRST clause
    // lands outermost in the CASE
    def cascade(actions: Seq[MergeAction], defaultKeep: Column,
                defaultVal: String => Column)
        : (Column, Map[String, Column]) = {
      val keep = actions.foldRight(defaultKeep) { (a, rest) =>
        val cond = condOf(a).map(toCol).getOrElse(lit(true))
        a match {
          case _: DeleteAction => when(cond, lit(false)).otherwise(rest)
          case _ => when(cond, lit(true)).otherwise(rest)
        }
      }
      val values = cols.map { c =>
        c -> actions.foldRight(defaultVal(c)) { (a, rest) =>
          val cond = condOf(a).map(toCol).getOrElse(lit(true))
          when(cond, valueOf(a, c, defaultVal, toCol)).otherwise(rest)
        }
      }.toMap
      (keep, values)
    }

    val (keepM, valM) = cascade(matchedActions, lit(true), tCol)
    val (keepI, valI) = cascade(notMatchedActions, lit(false),
      c => lit(null).cast(target.schema(c).dataType))
    val (keepT, valT) = cascade(notMatchedBySourceActions, lit(true), tCol)

    joined
      .filter(when(matched, keepM).when(sourceOnly, keepI).otherwise(keepT))
      .select(cols.map { c =>
        when(matched, valM(c)).when(sourceOnly, valI(c)).otherwise(valT(c))
          .cast(target.schema(c).dataType).as(c)
      }: _*)
  }

  /** The UPDATE projection: assignments applied where the condition
    * holds (NULL does not update — `when`'s own semantics), everything
    * else passed through. One frame, no join.
    */
  def updatedFrame(target: DataFrame, targetOutput: Seq[Attribute],
                   assignments: Seq[Assignment],
                   condition: Option[Expression]): DataFrame = {
    val tIds: Map[ExprId, String] =
      targetOutput.map(a => a.exprId -> a.name).toMap
    def toCol(e: Expression): Column = GraftColumnShim.column(e.transform {
      case a: AttributeReference if tIds.contains(a.exprId) =>
        UnresolvedAttribute(Seq(tIds(a.exprId)))
    })
    val condCol = condition.map(toCol).getOrElse(lit(true))
    target.select(target.columns.toSeq.map { c =>
      assignments.collectFirst {
        case Assignment(k: Attribute, v) if k.name.equalsIgnoreCase(c) =>
          when(condCol, toCol(v)).otherwise(col(s"`$c`"))
            .cast(target.schema(c).dataType).as(c)
      }.getOrElse(col(s"`$c`"))
    }: _*)
  }

  private def condOf(a: MergeAction): Option[Expression] = a match {
    case UpdateAction(c, _, _) => c
    case DeleteAction(c) => c
    case InsertAction(c, _) => c
    case other => throw new UnsupportedOperationException(
      s"unsupported MERGE action: $other")
  }

  /** The value clause `a` assigns to target column `c`, falling back
    * to the category default for unassigned columns.
    */
  private def valueOf(a: MergeAction, c: String,
                      defaultVal: String => Column,
                      toCol: Expression => Column): Column = a match {
    case UpdateAction(_, assigns, _) =>
      assigns.collectFirst {
        case Assignment(k: Attribute, v) if k.name.equalsIgnoreCase(c) =>
          toCol(v)
      }.getOrElse(defaultVal(c))
    case InsertAction(_, assigns) =>
      assigns.collectFirst {
        case Assignment(k: Attribute, v) if k.name.equalsIgnoreCase(c) =>
          toCol(v)
      }.getOrElse(defaultVal(c))
    case _: DeleteAction => defaultVal(c) // dropped by keep=false anyway
    case other => throw new UnsupportedOperationException(
      s"unsupported MERGE action: $other")
  }
}
