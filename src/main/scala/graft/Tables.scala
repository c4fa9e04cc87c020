package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Fixture-table loader (TESTDATA.md layout: `<dir>/<name>.parquet`).
  *
  * The reference located tables by Hive warehouse path concatenation
  * (`root/db/table`, TransTablePartition.java:116-118); here a table is any
  * parquet path — Spark's file source does partition discovery, schema
  * inference and predicate/column pushdown for free.
  */
object Tables {
  val star = Seq("region", "nation", "customer", "supplier", "part", "orders", "lineitem")
  val all: Seq[String] = star ++ Seq("events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    // TIMESTAMP(NANOS) columns arrive as long via nanosAsLong (SparkEnv);
    // restore TimestampType at microsecond precision. Integer `div`, NOT
    // `/`: Divide promotes to double, and epoch-nanos (~1.7e18) exceed the
    // 53-bit mantissa — the rounding puts ~half of all timestamps 1µs low.
    if (name == "events" && df.schema("ts").dataType == LongType)
      df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else df
  }

  /** Register every warehouse table under `dir` as a temp view, so plain
    * ANSI SQL runs directly: `registerAll(spark, dir); spark.sql("...")`.
    * The paste-SQL entry point beside the DataFrame DSL (SqlParitySpec
    * pins that both produce identical answers).
    */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
