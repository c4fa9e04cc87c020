package graft.queries

import graft.{QueryDef, Tables}
import graft.operators.{AsOfJoin, Migrate, RangeJoin}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Second extras batch: partition-pruned reads on engine-written layouts,
  * the JSON→map surface, and IDF term statistics (the tf-idf building
  * block as a pure aggregation, oracle-checkable cross-engine).
  */
object Extras2 {

  private def t(s: SparkSession, dir: String, n: String): DataFrame = Tables.load(s, dir, n)

  private def scratch(owner: String, kind: String, dir: String): String =
    graft.Scratch.dir(owner, kind, dir)

  val entries: Seq[QueryDef] = Seq(

    // read back an engine-written Hive-layout table with a partition-value
    // predicate — Catalyst prunes to 7 of 30 partition dirs (see Plans);
    // the oracle recomputes from the raw source rows.
    QueryDef.checked(
      "q48_partition_pruned",
      """SELECT strftime(l_shipdate, '%Y%m%d') AS par_key,
        |  count(*) AS n_rows, sum(l_extendedprice) AS sum_price
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-03-10 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1996-03-17 00:00:00'
        |GROUP BY 1""".stripMargin) { (s, dir) =>
      val dest = scratch("q48_partition_pruned", "pruned", dir)
      Migrate.migrateRange(s, s"$dir/lineitem.parquet", dest,
        dateCol = "l_shipdate", start = "1996-03-01", end = "1996-03-31")
      s.read.parquet(dest)
        .filter(col("par_key") >= "19960310" && col("par_key") < "19960317")
        .groupBy(col("par_key").cast("string").as("par_key"))
        .agg(count(lit(1)).as("n_rows"), sum(col("l_extendedprice")).as("sum_price"))
    },

    // JSON → map surface: parse props, explode the key set
    QueryDef.checked(
      "q49_json_map_keys",
      """SELECT k, count(*) AS n
        |FROM (SELECT unnest(json_keys(props)) AS k FROM events)
        |GROUP BY k""".stripMargin) { (s, dir) =>
      // json_object_keys reads just the key tokens — no full map<k,v>
      // materialization per row like from_json + map_keys would do
      t(s, dir, "events")
        .select(explode(expr("json_object_keys(props)")).as("k"))
        .groupBy(col("k")).agg(count(lit(1)).as("n"))
    },

    // document frequency + IDF per term — the tf-idf weight table as one
    // distinct + two aggregations (no ml pipeline needed at this shape)
    QueryDef.checked(
      "q50_term_idf",
      """WITH dw AS (SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS term
        |  FROM documents),
        |n AS (SELECT count(DISTINCT doc_id) AS total FROM dw)
        |SELECT term, count(*) AS df,
        |  ln((SELECT total FROM n) / count(*)) AS idf
        |FROM dw GROUP BY term""".stripMargin) { (s, dir) =>
      val dw = t(s, dir, "documents")
        .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
        .distinct()
      val total = dw.select(countDistinct(col("doc_id")).as("total"))
      dw.groupBy(col("term")).agg(count(lit(1)).as("df"))
        .crossJoin(total)
        .select(col("term"), col("df"),
          log(col("total") / col("df")).as("idf"))
    },

    // full-outer join with per-side aggregates (completes the join
    // inventory: inner/left/semi/anti/full/cross are all oracle-checked)
    QueryDef.checked(
      "q52_full_outer",
      """WITH c AS (SELECT c_nationkey AS nk, count(*) AS n_cust FROM customer GROUP BY 1),
        |s AS (SELECT s_nationkey AS nk, count(*) AS n_supp FROM supplier GROUP BY 1)
        |SELECT coalesce(c.nk, s.nk) AS nationkey,
        |  coalesce(n_cust, 0) AS n_cust, coalesce(n_supp, 0) AS n_supp
        |FROM c FULL OUTER JOIN s ON c.nk = s.nk""".stripMargin) { (s, dir) =>
      val c = t(s, dir, "customer").groupBy(col("c_nationkey").as("nk"))
        .agg(count(lit(1)).as("n_cust"))
      val su = t(s, dir, "supplier").groupBy(col("s_nationkey").as("snk"))
        .agg(count(lit(1)).as("n_supp"))
      c.join(su, col("nk") === col("snk"), "full_outer")
        .select(coalesce(col("nk"), col("snk")).as("nationkey"),
          coalesce(col("n_cust"), lit(0L)).as("n_cust"),
          coalesce(col("n_supp"), lit(0L)).as("n_supp"))
    },

    // pivot (wide conditional aggregation)
    QueryDef.checked(
      "q53_pivot",
      """SELECT l_returnflag,
        |  sum(CASE WHEN l_linestatus = 'F' THEN l_quantity END) AS qty_f,
        |  sum(CASE WHEN l_linestatus = 'O' THEN l_quantity END) AS qty_o
        |FROM lineitem GROUP BY 1""".stripMargin) { (s, dir) =>
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .pivot("l_linestatus", Seq("F", "O"))
        .agg(sum(col("l_quantity")))
        .withColumnRenamed("F", "qty_f")
        .withColumnRenamed("O", "qty_o")
    },

    // as-of (point-in-time) join: enrich every event with the customer's
    // most recent order as of the event time. Spark has no built-in as-of
    // join; AsOfJoin is the union+window sort-merge shape (one shuffle, no
    // per-key cross product). Oracle: DuckDB's native ASOF JOIN. Output
    // carries the matched DATE, not an order id — equal-date ties would
    // otherwise make the matched row engine-dependent.
    QueryDef.checked(
      "q57_asof_join",
      """SELECT e.event_id, strftime(o.o_orderdate, '%Y%m%d') AS last_order_day,
        |  date_diff('day', o.o_orderdate, e.ts) AS days_since
        |FROM events e ASOF JOIN orders o
        |  ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate""".stripMargin) { (s, dir) =>
      AsOfJoin.asofJoin(
        t(s, dir, "events"), t(s, dir, "orders"),
        leftKey = "user_id", rightKey = "o_custkey",
        leftTime = "ts", rightTime = "o_orderdate",
        payloadCols = Seq("o_orderdate"))
        .select(col("event_id"),
          date_format(col("asof_o_orderdate"), "yyyyMMdd").as("last_order_day"),
          datediff(col("ts"), col("asof_o_orderdate")).cast("long").as("days_since"))
    },

    // range (point-in-interval) join: per event, the same user's activity
    // inside the following hour (self-range-join — the funnel/attribution
    // shape). RangeJoin buckets the intervals so the plan is a hash
    // equi-join on (key, bucket) + exact filter — a raw range condition
    // would plan as a per-key nested loop. The anchor event matches its
    // own window (b.ts >= a.ts), so every event returns with n_follow >= 1.
    QueryDef.checked(
      "q58_range_join",
      """SELECT a.event_id, count(*) AS n_follow
        |FROM events a JOIN events b
        |  ON b.user_id = a.user_id
        |  AND b.ts >= a.ts AND b.ts < a.ts + INTERVAL 1 HOUR
        |GROUP BY 1""".stripMargin) { (s, dir) =>
      val points = t(s, dir, "events")
        .select(col("user_id").as("p_user"), col("ts").as("p_ts"))
      val intervals = t(s, dir, "events")
        .select(col("event_id"), col("user_id"), col("ts").as("w_start"))
        .withColumn("w_end", col("w_start") + expr("INTERVAL 1 HOUR"))
      RangeJoin.pointInInterval(points, intervals,
        pointKey = "p_user", intervalKey = "user_id",
        pointCol = "p_ts", startCol = "w_start", endCol = "w_end",
        bucketSeconds = 3600L)
        .groupBy(col("event_id"))
        .agg(count(lit(1)).as("n_follow"))
    },

    // interval-OVERLAP join (both sides intervals, not point-in-interval):
    // each event opens a 30-minute window; count, per event, how many
    // OTHER windows of the same user intersect it. The operator dedups
    // multi-bucket pairs by keeping only the bucket holding
    // greatest(start_a, start_b), so a raw quadratic overlap predicate
    // becomes one hash equi-join on (user, bucket) + exact filter.
    QueryDef.checked(
      "q110_interval_overlap",
      """SELECT a.event_id, count(*) AS n_overlap
        |FROM events a JOIN events b
        |  ON a.user_id = b.user_id AND a.event_id <> b.event_id
        |  AND a.ts < b.ts + INTERVAL 30 MINUTE
        |  AND b.ts < a.ts + INTERVAL 30 MINUTE
        |GROUP BY 1""".stripMargin) { (s, dir) =>
      def side(p: String): DataFrame = t(s, dir, "events")
        .select(col("event_id").as(s"${p}_id"), col("user_id").as(s"${p}_user"),
          col("ts").as(s"${p}_start"),
          (col("ts") + expr("INTERVAL 30 MINUTE")).as(s"${p}_end"))
      RangeJoin.intervalOverlap(side("a"), side("b"),
        leftKey = "a_user", rightKey = "b_user",
        lStart = "a_start", lEnd = "a_end", rStart = "b_start", rEnd = "b_end",
        bucketSeconds = 1800L)
        .filter(col("a_id") =!= col("b_id"))
        .groupBy(col("a_id"))
        .agg(count(lit(1)).as("n_overlap"))
        .select(col("a_id").as("event_id"), col("n_overlap"))
    }
  )
}
