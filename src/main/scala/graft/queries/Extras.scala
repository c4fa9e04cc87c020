package graft.queries

import graft.{QueryDef, Tables}
import graft.operators.SkewJoin
import graft.streaming.EventStreams
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths, StandardCopyOption}

/** Coverage extras: exact percentiles, explicit GROUPING SETS via the SQL
  * surface, the streaming pipeline run under the batch oracle, and the
  * salted skew join proven result-identical to the plain join.
  */
object Extras {

  private def t(s: SparkSession, dir: String, n: String): DataFrame = Tables.load(s, dir, n)

  val entries: Seq[QueryDef] = Seq(

    // exact interpolated percentiles (same definition as quantile_cont)
    QueryDef.checked(
      "q44_percentiles",
      """SELECT l_returnflag,
        |  quantile_cont(l_extendedprice, 0.5) AS p50,
        |  quantile_cont(l_extendedprice, 0.9) AS p90
        |FROM lineitem GROUP BY l_returnflag""".stripMargin) { (s, dir) =>
      t(s, dir, "lineitem").groupBy(col("l_returnflag"))
        .agg(
          expr("percentile(l_extendedprice, 0.5)").as("p50"),
          expr("percentile(l_extendedprice, 0.9)").as("p90"))
    },

    // explicit GROUPING SETS through the SQL API (rollup/cube are q11/q12)
    QueryDef.checked(
      "q45_grouping_sets",
      """SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sum_qty
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())""".stripMargin) { (s, dir) =>
      t(s, dir, "lineitem").createOrReplaceTempView("lineitem_gs")
      s.sql(
        """SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sum_qty
          |FROM lineitem_gs
          |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())""".stripMargin)
    },

    // the streaming hourly pipeline, run to completion on a file-source
    // stream and checked against the same oracle as batch q24 — puts the
    // streaming tier itself under the correctness gate.
    QueryDef.checked(
      "q46_stream_hourly",
      """SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS window_start,
        |  event_type, count(*) AS n_events, sum(value) AS sum_value
        |FROM events GROUP BY 1, 2""".stripMargin) { (s, dir) =>
      val staged = Files.createTempDirectory("graft-q46")
      Files.copy(Paths.get(s"$dir/events.parquet"), staged.resolve("events.parquet"),
        StandardCopyOption.REPLACE_EXISTING)
      val q = EventStreams.hourlyCounts(EventStreams.readEvents(s, staged.toString))
        .writeStream.outputMode("complete").format("memory").queryName("q46_out").start()
      q.processAllAvailable(); q.stop()
      s.table("q46_out")
    },

    // streaming EXACT corpus dedup under the batch oracle: the q32 shape
    // as a continuous operator (crawler-drop ingest dedups against all
    // prior state, never re-scanning the corpus). The stream emits only
    // content-determined columns (hash + length), so the output is
    // deterministic regardless of which duplicate arrives first and the
    // oracle replays it as a plain DISTINCT.
    QueryDef.checked(
      "q120_stream_dedup",
      """SELECT DISTINCT md5(text) AS content_hash,
        |  CAST(length(text) AS BIGINT) AS n_chars
        |FROM documents WHERE text IS NOT NULL""".stripMargin) { (s, dir) =>
      import graft.streaming.DocStreams
      val staged = Files.createTempDirectory("graft-q120")
      Files.copy(Paths.get(s"$dir/documents.parquet"), staged.resolve("documents.parquet"),
        StandardCopyOption.REPLACE_EXISTING)
      val schema = s.read.parquet(staged.toString).schema
      val q = DocStreams.contentDedup(DocStreams.readDocuments(s, staged.toString, schema))
        .writeStream.outputMode("append").format("memory").queryName("q120_out").start()
      q.processAllAvailable(); q.stop()
      s.table("q120_out")
    },

    // salted skew join == plain join, checked against the plain-SQL oracle
    QueryDef.checked(
      "q47_salted_join",
      """SELECT o_orderpriority, count(*) AS n_items,
        |  sum(l_extendedprice * (1 - l_discount)) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority""".stripMargin) { (s, dir) =>
      val li = t(s, dir, "lineitem")
      val o = t(s, dir, "orders").withColumnRenamed("o_orderkey", "l_orderkey")
      // salt from key + one narrow discriminator: a hot orderkey's rows
      // differ in l_linenumber, so they still spread across reducers, but
      // the per-row hash is 2 narrow columns instead of all 16
      SkewJoin.saltedJoin(li, o, "l_orderkey", salt = 8, saltCols = Seq("l_linenumber"))
        .groupBy(col("o_orderpriority"))
        .agg(
          count(lit(1)).as("n_items"),
          sum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"))
    }
  )
}
