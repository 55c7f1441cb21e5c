package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Misra–Gries heavy-hitters sketch as a typed `Aggregator` — the
  * frequency member of the sketch family (HLL distinct, t-digest
  * quantiles in graft.pipeline.Sketches): top tokens per group in
  * FIXED memory, the 100 TB alternative to an unbounded
  * (group, token) count aggregate when only the heavy tail matters.
  *
  * Buffer = at most k counters. Point update: increment if tracked,
  * insert if room, else this is the classic "decrement all" step taken
  * lazily at shrink. Partial merge: sum counters, then shrink — subtract
  * the (k+1)-th largest count from everything and drop non-positives.
  * Both are associative/commutative up to the sketch's guarantee, so
  * map-side partials combine like any built-in aggregate.
  *
  * Guarantee (the spec asserts THIS, not exact counts — Misra–Gries
  * output depends on merge order, so exact values are legitimately
  * partition-dependent): for every item, est ≤ true, and
  * true − est ≤ n/(k+1) where n = group size; hence every item with
  * true frequency > n/(k+1) is present in the sketch.
  */
class HeavyHittersAgg(k: Int)
    extends Aggregator[String, Map[String, Long], Map[String, Long]] {
  require(k >= 1, "k must be >= 1")

  override def zero: Map[String, Long] = Map.empty

  private def shrink(m: Map[String, Long]): Map[String, Long] =
    if (m.size <= k) m
    else {
      val d = m.values.toSeq.sortBy(-_).apply(k) // (k+1)-th largest
      m.collect { case (key, c) if c > d => key -> (c - d) }
    }

  override def reduce(b: Map[String, Long], a: String): Map[String, Long] =
    if (a == null) b
    else shrink(b.updatedWith(a) { case prev => Some(prev.getOrElse(0L) + 1L) })

  override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] =
    if (a.isEmpty) b
    else if (b.isEmpty) a
    else shrink(b.foldLeft(a) { case (acc, (key, c)) =>
      acc.updatedWith(key) { case prev => Some(prev.getOrElse(0L) + c) }
    })

  override def finish(reduction: Map[String, Long]): Map[String, Long] = reduction

  override def bufferEncoder: Encoder[Map[String, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()

  override def outputEncoder: Encoder[Map[String, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
}
