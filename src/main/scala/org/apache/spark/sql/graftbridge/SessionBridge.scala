package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bridge to `private[sql]` session plumbing (same pattern as
  * [[ColumnBridge]] — no Spark internals modified).
  *
  * `withIsolatedConf` evaluates `body` against a CLONE of the session
  * (shared SparkContext + shared state, copied session conf) with the
  * given conf overrides applied to the clone only. This is how an
  * operator can need a write-path conf (e.g. the snapshot layer's
  * TIMESTAMP_MICROS parquet output, which INT96 would strip of footer
  * stats) without mutating the caller's session — concurrent queries on
  * the original session never observe the override.
  */
object SessionBridge {

  /** Rebind a frame's logical plan to another session of the same
    * SparkContext.
    */
  def rebind(df: DataFrame, target: SparkSession): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      target.asInstanceOf[org.apache.spark.sql.classic.SparkSession],
      df.queryExecution.logical)

  /** A clone of `spark` (shared context, copied session state) with the
    * given conf overrides applied to the clone only.
    */
  def cloneWithConf(spark: SparkSession, confs: Map[String, String]): SparkSession = {
    val cloned = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession].cloneSession()
    confs.foreach { case (k, v) => cloned.conf.set(k, v) }
    cloned
  }

  def withIsolatedConf[A](df: DataFrame, confs: Map[String, String])
      (body: DataFrame => A): A =
    body(rebind(df, cloneWithConf(df.sparkSession, confs)))

  /** The frame a v1 `Sink.addBatch` receives is bound to the stream's
    * incremental execution — handing it to ordinary batch writers would
    * re-plan it (wrongly, and `.write` refuses streaming plans). Re-wrap
    * the micro-batch's ALREADY-PLANNED rows as a plain batch frame: one
    * pass over the incremental execution's RDD, no second planning.
    * (The same move Spark's own ForeachBatchSink/console sink make.)
    */
  def rebatch(data: DataFrame): DataFrame = {
    val spark = data.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val rdd = data.queryExecution.toRdd.map(_.copy())
    spark.internalCreateDataFrame(rdd, data.schema, isStreaming = false)
  }
}
