package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupStateTimeout, GroupState}

/** One user event on the ingest stream (the digest needs no event-time
  * semantics — it is a running total, so no watermark/timestamp here).
  */
case class UserEvent(user_id: Long, event_type: String)

/** Per-user running state: event-type → count. */
case class DigestState(counts: Map[String, Long])

/** A user's digest as of the latest micro-batch that touched them. */
case class UserDigest(user_id: Long, digest: String)

/** Streaming twin of the `nested_event_digest` batch key (SURVEY.md
  * §2.7): a continuously-maintained per-user event digest — the export
  * row a live dashboard or feature store reads. Running totals are
  * order-insensitive (counts commute), so unlike the event-time twins
  * this needs no watermark: state is one small map per user (bounded by
  * event-type cardinality, the same bound as the batch digest), updated
  * per micro-batch with `mapGroupsWithState` in Update mode, emitting
  * the user's refreshed digest row.
  *
  * The emitted JSON is byte-identical to the batch key's
  * `to_json(array_sort(collect_list(struct(event_type, cnt))))` — the
  * spec certifies that across randomized batch splits. That holds
  * because event types are unique per user after counting (the sort key
  * is the type alone) and the corpus's types are plain identifiers;
  * a type containing JSON-special characters would need the same
  * escaping `to_json` applies (documented limit, asserted nowhere
  * cheaper than the spec's equality check).
  */
object DigestStream {

  /** Render counts exactly like the batch `to_json(array_sort(...))`. */
  private[graft] def digestJson(counts: Map[String, Long]): String =
    counts.toSeq.sortBy(_._1)
      .map { case (t, n) => s"""{"event_type":"$t","cnt":$n}""" }
      .mkString("[", ",", "]")

  /** The running digest stream: each micro-batch emits one refreshed
    * [[UserDigest]] per touched user (Update-mode semantics — a sink
    * upserts on user_id).
    */
  def digests(events: Dataset[UserEvent]): Dataset[UserDigest] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .mapGroupsWithState[DigestState, UserDigest](GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[UserEvent], state: GroupState[DigestState]) =>
          val st = state.getOption.getOrElse(DigestState(Map.empty))
          val counts = rows.foldLeft(st.counts) { (m, e) =>
            m.updated(e.event_type, m.getOrElse(e.event_type, 0L) + 1L)
          }
          state.update(DigestState(counts))
          UserDigest(uid, digestJson(counts))
      }
  }
}
