package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnShim
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.{Expression, XxHash64Function}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** MinHash signature as a custom `TypedImperativeAggregate` (SURVEY.md §4
  * — the sketch-aggregate extension point): one row per token in, one
  * k-element signature per group out, in a single aggregation pass.
  *
  * The buffer is a plain Array[Long] of current minima; update hashes
  * the token once per seed with xxhash64 (seed-chained exactly like the
  * `xxhash64(token, lit(seed))` expression, so the array-expression
  * builder graft.pipeline.Dedup.minhashSignature produces identical
  * signatures); merge is elementwise min — associative and commutative,
  * so Spark runs it map-side partial like any built-in aggregate.
  * Serialization is the raw 8k bytes.
  */
case class MinHashAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string token column, got ${child.dataType}")

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(k)(Long.MaxValue)

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      // xxhash64(token, lit(seed)) chains children in order:
      // hash(seed, hash(token, 42)) — replicate exactly so signatures
      // match the array-expression builder bit-for-bit, and hash the
      // string only once per token
      val tokenHash = XxHash64Function.hash(v.asInstanceOf[UTF8String], StringType, 42L)
      var s = 0
      while (s < k) {
        // the seed literal is an Int, so it hashes via the int path
        val h = XxHash64Function.hash(s, IntegerType, tokenHash)
        if (h < buffer(s)) buffer(s) = h
        s += 1
      }
    }
    buffer
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < k) { if (b(i) < a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def eval(buffer: Array[Long]): Any = new GenericArrayData(buffer)

  override def serialize(buffer: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(k * 8)
    buffer.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(k)(bb.getLong)
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "minhash_sig"

  override def withNewMutableAggBufferOffset(newOffset: Int): MinHashAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinHashAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): MinHashAgg =
    copy(child = newChildren.head)
}

object MinHashAgg {
  /** Column-API entry: `df.groupBy("doc_id").agg(minhashSig(col("token"), 16))`. */
  def minhashSig(token: Column, k: Int): Column =
    GraftColumnShim.column(
      MinHashAgg(GraftColumnShim.expression(token), k).toAggregateExpression())
}
