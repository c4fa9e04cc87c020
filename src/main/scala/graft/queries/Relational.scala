package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Core relational tier (SURVEY.md §2.6, core table): the row-level
  * generalization of the reference's file-metadata operations —
  * manifest equi/anti joins (CommonUtils.java:107-121), count checks
  * (CommonUtils.java:102-106), per-day grouping (HDFSMerge.java:86-89),
  * TreeSet ordering/dedup (CommonUtils.java:151-163) — expressed as
  * declarative DataFrame plans so Catalyst does pushdown/pruning/broadcast.
  *
  * Every query has a DuckDB oracle; column names and integer widths are
  * aligned on both sides (the driver sorts columns by name and hashes
  * values, so `count(*)` is BIGINT on both, row_number cast to long, etc).
  */
object Relational {

  private def t(s: SparkSession, dir: String, n: String): DataFrame = Tables.load(s, dir, n)

  val entries: Seq[QueryDef] = Seq(

    // ---- aggregation: partial+final hash agg, the count-check generalization
    QueryDef.checked(
      "q01_pricing_summary",
      """SELECT l_returnflag, l_linestatus,
        |  sum(l_quantity) AS sum_qty,
        |  sum(l_extendedprice) AS sum_base_price,
        |  sum(l_extendedprice * (1 - l_discount)) AS sum_disc_price,
        |  sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)) AS sum_charge,
        |  avg(l_quantity) AS avg_qty,
        |  avg(l_extendedprice) AS avg_price,
        |  avg(l_discount) AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin) { (s, dir) =>
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") <= lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity")).as("sum_qty"),
          sum(col("l_extendedprice")).as("sum_base_price"),
          sum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("sum_disc_price"),
          sum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax"))).as("sum_charge"),
          avg(col("l_quantity")).as("avg_qty"),
          avg(col("l_extendedprice")).as("avg_price"),
          avg(col("l_discount")).as("avg_disc"),
          count(lit(1)).as("count_order"))
    },

    // ---- projection + filter: pushed to the parquet scan by Catalyst
    QueryDef.checked(
      "q02_filter_project",
      """SELECT l_orderkey, l_partkey, l_linenumber,
        |  l_extendedprice * (1 - l_discount) AS net_price
        |FROM lineitem
        |WHERE l_discount > 0.05 AND l_quantity < 25""".stripMargin) { (s, dir) =>
      t(s, dir, "lineitem")
        .filter(col("l_discount") > 0.05 && col("l_quantity") < 25)
        .select(
          col("l_orderkey"), col("l_partkey"), col("l_linenumber"),
          (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("net_price"))
    },

    // ---- 3-way equi-join + agg (manifest-compare generalization)
    QueryDef.checked(
      "q03_segment_revenue",
      """SELECT c_mktsegment, count(*) AS n_items,
        |  sum(l_extendedprice * (1 - l_discount)) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment""".stripMargin) { (s, dir) =>
      val l = t(s, dir, "lineitem")
      val o = t(s, dir, "orders")
      val c = t(s, dir, "customer")
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(
          count(lit(1)).as("n_items"),
          sum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"))
    },

    // ---- left-semi join: the EXISTS form of the dest-partition check
    QueryDef.checked(
      "q04_semi_join",
      """SELECT o_orderpriority, count(*) AS order_count
        |FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey AND l_quantity > 45)
        |GROUP BY o_orderpriority""".stripMargin) { (s, dir) =>
      val o = t(s, dir, "orders")
      val l = t(s, dir, "lineitem").filter(col("l_quantity") > 45)
      o.join(l, o("o_orderkey") === l("l_orderkey"), "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("order_count"))
    },

    // ---- left-anti join: the missing-file check (CommonUtils.java:116-120)
    QueryDef.checked(
      "q05_anti_join",
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
        |                  AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')""".stripMargin) { (s, dir) =>
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("2000-01-01 00:00:00").cast("timestamp"))
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
    },

    // ---- outer join + agg with null handling
    QueryDef.checked(
      "q06_outer_join_agg",
      """SELECT c_custkey, count(o_orderkey) AS n_orders,
        |  coalesce(sum(o_totalprice), 0.0) AS total_spent
        |FROM customer LEFT JOIN orders ON o_custkey = c_custkey
        |GROUP BY c_custkey""".stripMargin) { (s, dir) =>
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders")
      c.join(o, c("c_custkey") === o("o_custkey"), "left")
        .groupBy(c("c_custkey").as("c_custkey"))
        .agg(count(o("o_orderkey")).as("n_orders"), sum(o("o_totalprice")).as("ts0"))
        .select(col("c_custkey"), col("n_orders"),
          coalesce(col("ts0"), lit(0.0)).as("total_spent"))
    },

    // ---- window: per-group top-k (per-day file ranking generalization)
    QueryDef.checked(
      "q07_window_topk",
      """SELECT * FROM (
        |  SELECT l_suppkey, l_orderkey, l_linenumber, l_extendedprice,
        |    row_number() OVER (PARTITION BY l_suppkey
        |      ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS rn
        |  FROM lineitem) WHERE rn <= 3""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy(col("l_suppkey"))
        .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
      t(s, dir, "lineitem")
        .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
        .withColumn("rn", row_number().over(w).cast("long"))
        .filter(col("rn") <= 3)
    },

    // ---- window: running sum + lag
    QueryDef.checked(
      "q08_window_running",
      """SELECT o_custkey, o_orderkey,
        |  sum(o_totalprice) OVER (PARTITION BY o_custkey
        |    ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running_total,
        |  lag(o_totalprice) OVER (PARTITION BY o_custkey
        |    ORDER BY o_orderdate, o_orderkey) AS prev_price,
        |  lead(o_totalprice) OVER (PARTITION BY o_custkey
        |    ORDER BY o_orderdate, o_orderkey) AS next_price,
        |  rank() OVER (PARTITION BY o_custkey
        |    ORDER BY o_totalprice DESC, o_orderkey) AS price_rank
        |FROM orders""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"), col("o_orderkey"))
      val wp = Window.partitionBy(col("o_custkey")).orderBy(col("o_totalprice").desc, col("o_orderkey"))
      t(s, dir, "orders").select(
        col("o_custkey"), col("o_orderkey"),
        sum(col("o_totalprice")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .as("running_total"),
        lag(col("o_totalprice"), 1).over(w).as("prev_price"),
        lead(col("o_totalprice"), 1).over(w).as("next_price"),
        rank().over(wp).cast("long").as("price_rank"))
    },

    // ---- global sort + limit (TreeSet ordering generalization)
    QueryDef.checked(
      "q09_top_orders",
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin) { (s, dir) =>
      t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_totalprice"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(10)
    },

    // ---- distinct (TreeSet dedup, CommonUtils.java:152)
    QueryDef.checked(
      "q10_distinct_pairs",
      "SELECT DISTINCT c_nationkey, c_mktsegment FROM customer") { (s, dir) =>
      t(s, dir, "customer").select(col("c_nationkey"), col("c_mktsegment")).distinct()
    },

    // ---- grouping sets: rollup
    QueryDef.checked(
      "q11_rollup_qty",
      """SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sum_qty,
        |  count(*) AS n
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)""".stripMargin) { (s, dir) =>
      t(s, dir, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n"))
    },

    // ---- grouping sets: cube
    QueryDef.checked(
      "q12_cube_count",
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n,
        |  sum(o_totalprice) AS total
        |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)""".stripMargin) { (s, dir) =>
      t(s, dir, "orders")
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), sum(col("o_totalprice")).as("total"))
    },

    // ---- set ops: intersect / except / union
    QueryDef.checked(
      "q13_intersect_custkeys",
      """SELECT c_custkey AS custkey FROM customer
        |INTERSECT SELECT o_custkey FROM orders""".stripMargin) { (s, dir) =>
      t(s, dir, "customer").select(col("c_custkey").as("custkey"))
        .intersect(t(s, dir, "orders").select(col("o_custkey").as("custkey")))
    },
    QueryDef.checked(
      "q14_except_custkeys",
      """SELECT c_custkey AS custkey FROM customer
        |EXCEPT SELECT o_custkey FROM orders WHERE o_totalprice > 400000""".stripMargin) { (s, dir) =>
      t(s, dir, "customer").select(col("c_custkey").as("custkey"))
        .except(t(s, dir, "orders").filter(col("o_totalprice") > 400000)
          .select(col("o_custkey").as("custkey")))
    },
    QueryDef.checked(
      "q15_union_nationkeys",
      """SELECT c_nationkey AS nationkey FROM customer
        |UNION SELECT s_nationkey FROM supplier""".stripMargin) { (s, dir) =>
      t(s, dir, "customer").select(col("c_nationkey").as("nationkey"))
        .union(t(s, dir, "supplier").select(col("s_nationkey").as("nationkey")))
        .distinct()
    },

    // ---- date scalar functions (CommonUtils.java:151-183 date math)
    QueryDef.checked(
      "q16_date_functions",
      """SELECT o_orderkey,
        |  year(o_orderdate) AS yr,
        |  month(o_orderdate) AS mo,
        |  quarter(o_orderdate) AS qtr,
        |  isodow(o_orderdate) AS iso_dow,
        |  strftime(o_orderdate, '%Y%m%d') AS day_key,
        |  datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS days_since,
        |  strftime(o_orderdate + INTERVAL 1 MONTH, '%Y-%m') AS next_month
        |FROM orders""".stripMargin) { (s, dir) =>
      t(s, dir, "orders").select(
        col("o_orderkey"),
        year(col("o_orderdate")).cast("long").as("yr"),
        month(col("o_orderdate")).cast("long").as("mo"),
        quarter(col("o_orderdate")).cast("long").as("qtr"),
        (weekday(col("o_orderdate")) + 1).cast("long").as("iso_dow"),
        date_format(col("o_orderdate"), "yyyyMMdd").as("day_key"),
        datediff(col("o_orderdate").cast("date"), lit("1995-01-01").cast("date"))
          .cast("long").as("days_since"),
        date_format(add_months(col("o_orderdate"), 1), "yyyy-MM").as("next_month"))
    },

    // ---- string scalar functions (filename contains, HDFSMerge.java:166)
    QueryDef.checked(
      "q17_string_functions",
      """SELECT p_partkey,
        |  upper(p_brand) AS brand_u,
        |  substring(p_name, 1, 12) AS name_pfx,
        |  CAST(length(p_name) AS BIGINT) AS name_len,
        |  contains(p_name, 'an') AS has_an,
        |  regexp_extract(p_type, '^(\w+)', 1) AS type_head,
        |  concat_ws('#', p_brand, p_type) AS brand_type,
        |  replace(p_brand, '#', '_') AS brand_clean
        |FROM part""".stripMargin) { (s, dir) =>
      t(s, dir, "part").select(
        col("p_partkey"),
        upper(col("p_brand")).as("brand_u"),
        substring(col("p_name"), 1, 12).as("name_pfx"),
        length(col("p_name")).cast("long").as("name_len"),
        col("p_name").contains("an").as("has_an"),
        regexp_extract(col("p_type"), "^(\\w+)", 1).as("type_head"),
        // concat_ws on BOTH sides: plain concat disagrees across engines on
        // NULL args (DuckDB skips them, Spark nulls the result)
        concat_ws("#", col("p_brand"), col("p_type")).as("brand_type"),
        regexp_replace(col("p_brand"), "#", "_").as("brand_clean"))
    },

    // ---- JSON map access (events.props, SURVEY §1.3)
    QueryDef.checked(
      "q18_json_events",
      """SELECT event_type,
        |  count(*) AS n,
        |  sum(TRY_CAST(json_extract_string(props, '$.k') AS DOUBLE)) AS sum_k,
        |  avg(TRY_CAST(json_extract_string(props, '$.k') AS DOUBLE)) AS avg_k
        |FROM events GROUP BY event_type""".stripMargin) { (s, dir) =>
      // try_cast to double on BOTH sides: a hard CAST diverges on malformed
      // values (DuckDB errors / rounds decimal strings, ANSI Spark throws)
      val k = get_json_object(col("props"), "$.k").try_cast("double")
      t(s, dir, "events")
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sum(k).as("sum_k"), avg(k).as("avg_k"))
    },

    // ---- conditional aggregation
    QueryDef.checked(
      "q19_conditional_agg",
      """SELECT l_returnflag,
        |  CAST(sum(CASE WHEN l_quantity > 25 THEN 1 ELSE 0 END) AS BIGINT) AS n_big,
        |  CAST(sum(CASE WHEN l_quantity <= 25 THEN 1 ELSE 0 END) AS BIGINT) AS n_small,
        |  sum(CASE WHEN l_discount > 0.05 THEN l_extendedprice ELSE 0.0 END) AS disc_price
        |FROM lineitem GROUP BY l_returnflag""".stripMargin) { (s, dir) =>
      t(s, dir, "lineitem").groupBy(col("l_returnflag")).agg(
        sum(when(col("l_quantity") > 25, 1L).otherwise(0L)).as("n_big"),
        sum(when(col("l_quantity") <= 25, 1L).otherwise(0L)).as("n_small"),
        sum(when(col("l_discount") > 0.05, col("l_extendedprice")).otherwise(0.0)).as("disc_price"))
    },

    // ---- having (post-aggregation filter)
    QueryDef.checked(
      "q20_having_frequent",
      """SELECT o_custkey, count(*) AS n_orders FROM orders
        |GROUP BY o_custkey HAVING count(*) > 5""".stripMargin) { (s, dir) =>
      t(s, dir, "orders").groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n_orders"))
        .filter(col("n_orders") > 5)
    },

    // ---- windowed average comparison (decorrelated subquery shape)
    QueryDef.checked(
      "q21_above_brand_avg",
      """SELECT p_partkey, p_brand, p_retailprice, brand_avg FROM (
        |  SELECT p_partkey, p_brand, p_retailprice,
        |    avg(p_retailprice) OVER (PARTITION BY p_brand) AS brand_avg
        |  FROM part) WHERE p_retailprice > brand_avg""".stripMargin) { (s, dir) =>
      t(s, dir, "part")
        .select(col("p_partkey"), col("p_brand"), col("p_retailprice"))
        .withColumn("brand_avg",
          avg(col("p_retailprice")).over(Window.partitionBy(col("p_brand"))))
        .filter(col("p_retailprice") > col("brand_avg"))
    },

    // ---- correlated SCALAR subquery (the TPC-H Q17 shape). The oracle
    // keeps the correlated form; the engine runs the decorrelation
    // Catalyst itself would produce — a per-key aggregate joined back —
    // pinning that the rewrite preserves semantics. Small-quantity
    // outliers: items below 35% of their part's average quantity.
    QueryDef.checked(
      "q91_correlated_scalar",
      """SELECT l.l_partkey, count(*) AS n_below, sum(l.l_extendedprice) AS below_revenue
        |FROM lineitem l
        |WHERE l.l_quantity < (
        |  SELECT 0.35 * avg(l2.l_quantity) FROM lineitem l2
        |  WHERE l2.l_partkey = l.l_partkey)
        |GROUP BY l.l_partkey""".stripMargin) { (s, dir) =>
      val li = t(s, dir, "lineitem")
      val partAvg = li.groupBy(col("l_partkey"))
        .agg((lit(0.35) * avg(col("l_quantity"))).as("threshold"))
      li.join(partAvg, Seq("l_partkey"))
        .filter(col("l_quantity") < col("threshold"))
        .groupBy(col("l_partkey"))
        .agg(count(lit(1)).as("n_below"), sum(col("l_extendedprice")).as("below_revenue"))
    },

    // ---- correlated EXISTS with a non-key predicate (the TPC-H Q4
    // shape): orders having at least one line shipped more than 90 days
    // after the order date, counted by priority. The engine form is a
    // left-semi join whose condition carries the correlation.
    QueryDef.checked(
      "q92_exists_late_ship",
      """SELECT o_orderpriority, count(*) AS n_orders FROM orders o
        |WHERE EXISTS (
        |  SELECT 1 FROM lineitem l
        |  WHERE l.l_orderkey = o.o_orderkey
        |    AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY)
        |GROUP BY o_orderpriority""".stripMargin) { (s, dir) =>
      val o = t(s, dir, "orders")
      val li = t(s, dir, "lineitem").select(col("l_orderkey"), col("l_shipdate"))
      o.join(li,
          col("l_orderkey") === col("o_orderkey") &&
            col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 90 DAYS"),
          "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_orders"))
    },

    // ---- time-interval RANGE window frame: each event's one-hour
    // trailing sum/count within its user — the frame is bounded by TIME,
    // not row position (Spark: rangeBetween over unix microseconds;
    // DuckDB: RANGE with an INTERVAL bound — same inclusive semantics).
    QueryDef.checked(
      "q93_trailing_hour_window",
      """SELECT event_id, user_id,
        |  sum(value) OVER w AS hour_sum,
        |  CAST(count(*) OVER w AS BIGINT) AS hour_n
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts
        |  RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy(col("user_id")).orderBy(unix_micros(col("ts")))
        .rangeBetween(-3600L * 1000 * 1000, 0)
      t(s, dir, "events").select(col("event_id"), col("user_id"),
        sum(col("value")).over(w).as("hour_sum"),
        count(lit(1)).over(w).as("hour_n"))
    },

    // ---- gap filling over a generated calendar (the reference's date-
    // range enumeration, CommonUtils.java:151-163, applied as an
    // operator): every (day, event_type) cell of the observed range,
    // zero-filled where no events landed — sequence() + cross + left
    // join, never a per-day driver loop.
    QueryDef.checked(
      "q94_calendar_gap_fill",
      """WITH b AS (SELECT CAST(min(ts) AS DATE) AS lo, CAST(max(ts) AS DATE) AS hi
        |           FROM events),
        |d AS (SELECT CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE) AS day
        |      FROM b),
        |ty AS (SELECT DISTINCT event_type FROM events),
        |c AS (SELECT CAST(ts AS DATE) AS day, event_type, count(*) AS n
        |      FROM events GROUP BY 1, 2)
        |SELECT d.day, ty.event_type,
        |  CAST(COALESCE(c.n, 0) AS BIGINT) AS n_events, c.n IS NULL AS filled
        |FROM d CROSS JOIN ty LEFT JOIN c ON c.day = d.day AND c.event_type = ty.event_type""".stripMargin) { (s, dir) =>
      val ev = t(s, dir, "events")
      val days = ev.agg(to_date(min(col("ts"))).as("lo"), to_date(max(col("ts"))).as("hi"))
        .select(explode(sequence(col("lo"), col("hi"), expr("INTERVAL 1 DAY"))).as("day"))
      val types = ev.select(col("event_type")).distinct()
      val counts = ev.groupBy(to_date(col("ts")).as("day"), col("event_type"))
        .agg(count(lit(1)).as("n"))
      days.crossJoin(types)
        .join(counts, Seq("day", "event_type"), "left")
        .select(col("day"), col("event_type"),
          coalesce(col("n"), lit(0L)).as("n_events"), col("n").isNull.as("filled"))
    },

    // ---- distribution window functions (completes the window-function
    // inventory beyond rank/row_number/lag/lead): quartile bucketing,
    // relative rank, cumulative distribution, and an absolute-frame
    // nth_value — ties broken by key so every function is deterministic.
    QueryDef.checked(
      "q98_window_distribution",
      """SELECT c_custkey, c_nationkey,
        |  ntile(4) OVER w AS quartile,
        |  round(percent_rank() OVER w, 9) AS pct_rank,
        |  round(cume_dist() OVER w, 9) AS cume,
        |  nth_value(c_custkey, 2) OVER (PARTITION BY c_nationkey
        |    ORDER BY c_acctbal, c_custkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |    AS second_poorest
        |FROM customer
        |WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey)""".stripMargin) {
      (s, dir) =>
        val w = Window.partitionBy(col("c_nationkey"))
          .orderBy(col("c_acctbal"), col("c_custkey"))
        val full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        t(s, dir, "customer").select(
          col("c_custkey"), col("c_nationkey"),
          ntile(4).over(w).cast("long").as("quartile"),
          round(percent_rank().over(w), 9).as("pct_rank"),
          round(cume_dist().over(w), 9).as("cume"),
          nth_value(col("c_custkey"), 2).over(full).as("second_poorest"))
    },

    // ---- unpivot (melt): the wide→long reshape dual of q53's pivot.
    // Spark's native unpivot; the oracle is the portable UNION ALL form.
    QueryDef.checked(
      "q99_unpivot",
      """WITH wide AS (
        |  SELECT l_returnflag, sum(l_quantity) AS sum_qty,
        |         sum(l_extendedprice) AS sum_price, sum(l_discount) AS sum_disc
        |  FROM lineitem GROUP BY 1)
        |SELECT l_returnflag, 'sum_qty' AS measure, sum_qty AS value FROM wide
        |UNION ALL SELECT l_returnflag, 'sum_price', sum_price FROM wide
        |UNION ALL SELECT l_returnflag, 'sum_disc', sum_disc FROM wide""".stripMargin) {
      (s, dir) =>
        t(s, dir, "lineitem")
          .groupBy(col("l_returnflag"))
          .agg(sum(col("l_quantity")).as("sum_qty"),
            sum(col("l_extendedprice")).as("sum_price"),
            sum(col("l_discount")).as("sum_disc"))
          .unpivot(Array(col("l_returnflag")),
            Array(col("sum_qty"), col("sum_price"), col("sum_disc")),
            "measure", "value")
    }
  )
}
