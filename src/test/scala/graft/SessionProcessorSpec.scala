package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.{SessionProcessor, StreamEvent}

class SessionProcessorSpec extends SparkSpec {

  test("transformWithState keeps typed per-user state across batches") {
    // the new state API requires the RocksDB provider
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      import spark.implicits._
      implicit val sqlCtx = spark.sqlContext
      val input = MemoryStream[StreamEvent]
      val q = SessionProcessor.runningUserTotals(input.toDS())
        .writeStream.format("memory").queryName("tws_running")
        .outputMode("append").start()
      input.addData(StreamEvent(1, Timestamp.valueOf("2024-01-01 10:00:00"), 5, "click", 10.0))
      q.processAllAvailable()
      input.addData(StreamEvent(2, Timestamp.valueOf("2024-01-01 10:01:00"), 5, "click", 7.5))
      q.processAllAvailable()
      q.stop()
      val rows = spark.table("tws_running").orderBy("n_events").collect()
      assert(rows.length == 2)
      assert(rows.last.getLong(1) == 2 && rows.last.getDouble(2) == 17.5,
        s"state must survive between batches: ${rows.mkString(";")}")
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }
}
