package graft

import org.apache.spark.sql.SparkSession

/** Session factory for the engine.
  *
  * Replaces the reference's hand-built per-cluster `FileSystem` clients
  * (TransTablePartition.java:82-99, KeyConstant.java:21-27) with a single
  * `SparkSession` whose Hadoop conf can address any cluster by fully
  * qualified URI. Tuned for correctness-vs-oracle (UTC session TZ) and for
  * scale (AQE on, dynamic partition overwrite, snappy parquet — the
  * reference's codec choice at HDFSMerge.java:196-197 becomes a config).
  */
object SparkEnv {

  /** Defaults applied to any builder — used by Bench/Verify mains and specs. */
  def configure(b: SparkSession.Builder): SparkSession.Builder = b
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
    .config("spark.sql.adaptive.skewJoin.enabled", "true")
    .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
    // partition dir values like par_key=19960301 must stay strings, not
    // get inferred back as ints, for manifests to line up across sides
    .config("spark.sql.sources.partitionColumnTypeInference.enabled", "false")
    .config("spark.sql.parquet.compression.codec", "snappy")
    .config("spark.sql.autoBroadcastJoinThreshold", (64L * 1024 * 1024).toString)
    .config("spark.sql.ui.explainMode", "formatted")
    // events.parquet stores ts as TIMESTAMP(NANOS) which Spark has no native
    // type for; read as long ns-since-epoch, converted in Tables.load.
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    // fixture timestamps are naive micros (isAdjustedToUTC=false); read them
    // as session-TZ TIMESTAMP (the session pins UTC) — matching the DuckDB
    // oracle, which treats the same bytes as plain TIMESTAMP — instead of
    // inferring TIMESTAMP_NTZ, which unix_micros/window-range arithmetic
    // rejects
    .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    // storage-partitioned planning for key-clustered snapshot tables: the
    // DSv2 scan reports key-grouped partitioning and co-clustered
    // joins/aggregations skip their shuffles; pushPartValues lets one
    // side's missing partitions pad instead of falling back to a shuffle
    .config("spark.sql.sources.v2.bucketing.enabled", "true")
    .config("spark.sql.sources.v2.bucketing.pushPartValues.enabled", "true")
    .config("spark.ui.enabled", "false")

  /** Local session sized for the harness (local[32], 32 shuffle partitions).
    * On a real cluster the same configure() applies; master/shuffle come from
    * spark-submit.
    */
  def session(appName: String = "graft", cores: Int = 32): SparkSession = {
    val s = configure(
      SparkSession.builder()
        .master(s"local[$cores]")
        .appName(appName)
        .withExtensions(new GraftExtensions)
        .config("spark.sql.shuffle.partitions", cores.toString)
    ).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    registerFunctions(s)
    s
  }

  /** Idempotently register native functions on an already-built session
    * (covers getOrCreate reuse where extensions didn't apply).
    */
  def registerFunctions(s: SparkSession): Unit = {
    val (id, info, builder) = GraftExtensions.vectorDot
    s.sessionState.functionRegistry.registerFunction(id, info, builder)
  }
}
