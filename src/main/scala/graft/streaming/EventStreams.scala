package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Structured Streaming tier over the `events` fixture (SURVEY.md §2.6:
  * streaming ingest extension). Batch and stream share the same
  * expressions — the batch forms (q24/q25) are oracle-checked, and
  * StreamingSpec pins stream-equals-batch parity, so the streaming
  * semantics inherit the oracle.
  *
  * Everything is executor-side incremental state: watermarks bound state
  * size (late data beyond the watermark is dropped), so these run
  * indefinitely at any input rate — no driver accumulation.
  */
object EventStreams {

  /** events physical schema when ts is TIMESTAMP(NANOS) stored as int64
    * (the pre-r8 fixture layout; read as long and restored to µs
    * timestamps like Tables.load).
    */
  val rawSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** events physical schema when ts is a plain timestamp (µs). */
  val tsSchema: StructType = StructType(
    rawSchema.map(f => if (f.name == "ts") f.copy(dataType = TimestampType) else f))

  /** Streaming read of an events parquet path (file or glob), adaptive to
    * the fixture's ts encoding: a probe batch read of whatever files
    * exist NOW decides whether ts is TIMESTAMP(NANOS)-as-long (legacy
    * layout — convert ns→µs) or a plain timestamp column. One driver-side
    * footer read at stream setup; files arriving later must match, the
    * standard streaming-schema contract.
    */
  def readEvents(spark: SparkSession, path: String,
      layout: Option[String] = None): DataFrame = {
    val nanosLayout = layout match {
      case Some("nanos") => true
      case Some("micros") => false
      case Some(other) => throw new IllegalArgumentException(
        s"unknown events ts layout '$other' — expected 'nanos' or 'micros'")
      case None => scala.util.Try(spark.read.parquet(path).schema) match {
        case scala.util.Success(s) =>
          s.find(_.name == "ts").map(_.dataType == LongType).getOrElse(
            throw new IllegalArgumentException(
              s"events at $path have no 'ts' column — not an events table"))
        case scala.util.Failure(_) =>
          // an empty glob is NOT evidence of the micros layout: guessing
          // here would read late-arriving legacy TIMESTAMP(NANOS) files
          // under the wrong schema (silent µs corruption). Fail fast and
          // let the caller declare the layout it will produce.
          throw new IllegalArgumentException(
            s"no events parquet exists at $path yet, so the ts layout " +
              "cannot be probed — pass layout=Some(\"nanos\"|\"micros\")")
      }
    }
    if (nanosLayout)
      spark.readStream.schema(rawSchema).parquet(path)
        // integer div — see Tables.load for why `/ 1000` would corrupt µs
        .withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else
      spark.readStream.schema(tsSchema).parquet(path)
  }

  /** Tumbling 1-hour counts with a 2-hour watermark (q24's stream form). */
  def hourlyCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n_events"), col("sum_value"))

  /** Sliding 1-hour/15-minute windows. */
  def slidingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour", "15 minutes").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("w.start").as("window_start"), col("event_type"), col("n_events"))

  /** 30-minute-gap sessions per user (q25's stream form) via the native
    * session_window state store.
    */
  def sessionCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))
      .select(col("w.start").as("session_start"), col("user_id"),
        col("n_events"), col("sum_value"))

  /** Stateful exactly-once dedup on event_id within the watermark horizon
    * — the streaming form of the reference's skip-if-exists idempotence
    * (TransTablePartition.java:126-131).
    */
  def dedupEvents(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      // dedup on event_id ALONE (a retry may re-emit the same id with a
      // fresh timestamp); per-key state expires with the watermark, first
      // occurrence is emitted immediately
      .dropDuplicatesWithinWatermark("event_id")

  /** Per-user running totals via `flatMapGroupsWithState` — the fully
    * custom-state surface (SURVEY §2.6 streaming row). Emits an updated
    * (user_id, n_events, sum_value) row whenever a user's batch arrives;
    * state is one small tuple per user, expired after 1h of processing-time
    * inactivity so it stays bounded on unbounded key spaces.
    */
  final case class UserTotals(user_id: Long, n_events: Long, sum_value: Double)

  def runningUserTotals(events: DataFrame,
      timeout: GroupStateTimeout = GroupStateTimeout.ProcessingTimeTimeout)
      (implicit spark: SparkSession): Dataset[UserTotals] = {
    import spark.implicits._
    val withTimeout = timeout != GroupStateTimeout.NoTimeout
    events.select(col("user_id").as[Long], col("value").as[Double])
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, timeout)(
        (userId: Long, rows: Iterator[(Long, Double)], state: GroupState[UserTotals]) => {
          if (state.hasTimedOut) {
            val last = state.get
            state.remove()
            Iterator.single(last)
          } else {
            val prev = state.getOption.getOrElse(UserTotals(userId, 0L, 0.0))
            var n = prev.n_events; var s = prev.sum_value
            rows.foreach { case (_, v) => n += 1; s += v }
            val next = UserTotals(userId, n, s)
            state.update(next)
            // NOTE: the timeout keeps per-user state bounded in production;
            // it also schedules periodic timeout-evaluation batches, which
            // makes processAllAvailable never settle — tests use NoTimeout.
            if (withTimeout) state.setTimeoutDuration("1 hour")
            Iterator.single(next)
          }
        })
  }

  /** Watermarked STREAM-STREAM inner join: pair each left event with the
    * same user's right events landing within [0, maxDelay] after it —
    * the click→conversion attribution shape. Both sides carry watermarks
    * and the join condition bounds event time on both sides, so Spark can
    * evict buffered state once the watermark passes the join window:
    * state stays bounded at any input rate (without the time bound a
    * stream-stream join must buffer both sides forever).
    */
  def correlated(left: DataFrame, right: DataFrame,
      maxDelay: String = "30 minutes", watermark: String = "2 hours",
      distinctIds: Boolean = true): DataFrame = {
    val l = left.select(col("event_id").as("l_id"), col("user_id"),
        col("ts").as("l_ts"), col("event_type").as("l_type"))
      .withWatermark("l_ts", watermark)
    val r = right.select(col("event_id").as("r_id"), col("user_id").as("r_user"),
        col("ts").as("r_ts"), col("event_type").as("r_type"))
      .withWatermark("r_ts", watermark)
    // `distinctIds` guards a TRUE self-join (same stream both sides)
    // against pairing an event with itself; callers joining disjoint
    // slices (view→purchase) can drop the comparison from the hot path
    val idGuard = if (distinctIds) col("l_id") =!= col("r_id") else lit(true)
    l.join(r,
        col("user_id") === col("r_user") &&
          idGuard &&
          col("r_ts") >= col("l_ts") &&
          col("r_ts") <= col("l_ts") + expr(s"INTERVAL $maxDelay"))
      .drop("r_user")
  }

  /** Stream-static join: enrich the event stream with a static dimension
    * (e.g. a user profile table). The static side is re-planned per
    * micro-batch by Spark, so a broadcast-sized dimension costs one
    * broadcast per batch and no state.
    */
  def enriched(events: DataFrame, dim: DataFrame, key: String = "user_id"): DataFrame =
    events.join(broadcast(dim), Seq(key), "left")

  /** High-value alerting via foreachBatch — the SendEmail role
    * (SendEmail.java:23-49) as a streaming hook; batches arrive already
    * filtered, the alerter only sees aggregates.
    */
  def alertHighValue(events: DataFrame, threshold: Double,
      alerter: graft.operators.Alerter): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    events.filter(col("value") > threshold)
      .writeStream.foreachBatch { (batch: DataFrame, id: Long) =>
        val n = batch.count()
        if (n > 0) alerter.alert("events.high_value", s"batch $id: $n events above $threshold")
        (): Unit
      }
}
