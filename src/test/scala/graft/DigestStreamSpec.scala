package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.{DigestStream, UserDigest, UserEvent}

/** The streaming digest must converge, for every user, to EXACTLY the
  * batch `nested_event_digest` JSON over the same events — byte-equal,
  * whatever the batch splits — and each intermediate emission must be
  * the correct digest of the events delivered so far.
  */
class DigestStreamSpec extends SparkSpec {

  private def corpus(n: Int): Seq[UserEvent] = {
    val rnd = new scala.util.Random(19)
    val types = Seq("view", "click", "purchase", "signup", "error")
    (0 until n).map(_ => UserEvent(rnd.nextInt(12).toLong, types(rnd.nextInt(types.size))))
  }

  /** Run the stream over the given batches; return per-batch emissions. */
  private def run(batches: Seq[Seq[UserEvent]], name: String): Seq[(Long, Seq[UserDigest])] = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val buf = scala.collection.mutable.ArrayBuffer[(Long, Seq[UserDigest])]()
    val input = MemoryStream[UserEvent]
    val q = DigestStream.digests(input.toDS())
      .writeStream.outputMode("update")
      .foreachBatch { (b: org.apache.spark.sql.Dataset[UserDigest], id: Long) =>
        buf.synchronized { buf += ((id, b.collect().toSeq)) }; ()
      }
      .start()
    batches.foreach { b => input.addData(b); q.processAllAvailable() }
    q.stop()
    buf.toSeq
  }

  private def batchDigests(events: Seq[UserEvent]): Map[Long, String] = {
    import spark.implicits._
    operators.FunctionQueries.nestedDigestCore(
        events.toDF("user_id", "event_type"))
      .select("user_id", "digest").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
  }

  test("final stream digests are byte-equal to the batch key across randomized splits") {
    val events = corpus(400)
    val expected = batchDigests(events)
    val rnd = new scala.util.Random(5)
    (1 to 3).foreach { trial =>
      val batches = {
        var rest = rnd.shuffle(events); val bs = Seq.newBuilder[Seq[UserEvent]]
        while (rest.nonEmpty) {
          val n = math.min(rnd.nextInt(120) + 40, rest.size)
          bs += rest.take(n); rest = rest.drop(n)
        }
        bs.result()
      }
      val emissions = run(batches, s"digest_$trial")
      val finalPerUser = emissions.sortBy(_._1).flatMap(_._2)
        .groupBy(_.user_id).map { case (u, ds) => u -> ds.last.digest }
      assert(finalPerUser == expected, s"trial $trial diverged from the batch digest")
    }
  }

  test("each intermediate emission is the exact digest of the events delivered so far") {
    val events = corpus(120)
    val batches = events.grouped(40).toSeq
    val emissions = run(batches, "digest_intermediate").sortBy(_._1)
    var delivered = Seq.empty[UserEvent]
    batches.zip(emissions).foreach { case (b, (_, out)) =>
      delivered ++= b
      val expect = batchDigests(delivered)
      // every touched user must be emitted with its up-to-date digest
      b.map(_.user_id).distinct.foreach { u =>
        val got = out.find(_.user_id == u).map(_.digest)
        assert(got.contains(expect(u)),
          s"user $u after this batch: got $got, want ${expect(u)}")
      }
    }
  }
}
