package org.apache.spark.sql

/** V1 streaming `Source.getBatch` must return a frame whose plan is
  * flagged `isStreaming` (MicroBatchExecution asserts it). The flagging
  * constructor — `internalCreateDataFrame(rdd, schema, isStreaming)` —
  * is `private[sql]`, so the one-line bridge lives in this package,
  * exactly as Spark's own file stream source uses it. No behavior, no
  * state: compile the batch plan to its InternalRow RDD, re-wrap it
  * streaming-flagged.
  */
object GraftStreamShim {
  def asStreaming(df: DataFrame): DataFrame = {
    val cs = df.sparkSession.asInstanceOf[classic.SparkSession]
    cs.internalCreateDataFrame(
      df.queryExecution.toRdd, df.schema, isStreaming = true)
  }
}
