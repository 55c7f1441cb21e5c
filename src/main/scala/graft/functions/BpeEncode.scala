package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnShim
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** BPE merge application as a native expression — the tokenizer-apply
  * hot path. The declarative twin (`pipeline/Bpe.tokenizeWord`, a chain
  * of `aggregate` folds) defines the reference semantics but Spark
  * evaluates higher-order lambdas INTERPRETED, per element, per merge —
  * measured ~50 s over a 10M-token corpus at 8 merges. This expression
  * runs the same sequential greedy passes as one compiled loop (merge
  * table attached via `addReferenceObj`, the RegExpReplace pattern), and
  * BpeSpec pins bit-equality with the fold chain.
  *
  * Semantics, pinned deliberately: ONE greedy left-to-right pass PER
  * MERGE, in learned order — exactly how training rewrote the vocab, so
  * in-vocab words tokenize to their training-time form. (A rank-loop
  * applier — re-scan for the lowest-rank applicable merge until none —
  * can differ on OOV words where a later merge creates an earlier
  * merge's left symbol; the training-consistent sequential semantics is
  * the one our trainer certifies.)
  */
case class BpeEncode(child: Expression, merges: Seq[(String, String)])
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got $t")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "bpe_encode"

  @transient private lazy val mergeA: Array[String] = merges.map(_._1).toArray
  @transient private lazy val mergeB: Array[String] = merges.map(_._2).toArray
  @transient private lazy val mergeAB: Array[String] =
    merges.map { case (a, b) => a + b }.toArray

  /** Called from both interpreted eval and generated code. */
  def encode(w: UTF8String): GenericArrayData = {
    val s = w.toString
    var syms = new java.util.ArrayList[String](s.length)
    var i = 0
    while (i < s.length) {
      // chars, not code points: the corpus contract is single-space
      // ASCII words (FIXTURES.md), matching split(w, '') in the twin
      syms.add(String.valueOf(s.charAt(i)))
      i += 1
    }
    var m = 0
    while (m < mergeA.length) {
      val a = mergeA(m); val b = mergeB(m); val ab = mergeAB(m)
      if (syms.size >= 2) {
        val out = new java.util.ArrayList[String](syms.size)
        var j = 0
        while (j < syms.size) {
          if (j + 1 < syms.size && syms.get(j) == a && syms.get(j + 1) == b) {
            out.add(ab); j += 2
          } else {
            out.add(syms.get(j)); j += 1
          }
        }
        syms = out
      }
      m += 1
    }
    val arr = new Array[Any](syms.size)
    i = 0
    while (i < syms.size) { arr(i) = UTF8String.fromString(syms.get(i)); i += 1 }
    new GenericArrayData(arr)
  }

  override def nullSafeEval(w: Any): Any = encode(w.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpe", this, classOf[BpeEncode].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.encode($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeEncode =
    copy(child = newChild)
}

object BpeEncode {
  def apply(word: Column, merges: Seq[(String, String)]): Column =
    GraftColumnShim.column(
      BpeEncode(GraftColumnShim.expression(word), merges))
}
