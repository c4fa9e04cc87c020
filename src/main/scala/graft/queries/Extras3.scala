package graft.queries

import graft.{QueryDef, Tables}
import graft.operators._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-6 tier: runtime-filter joins (Bloom-pruned semi/anti) and
  * further curation/profile operators. Every query here is either
  * DuckDB-oracle-checked or rows-only with a pinning spec, same
  * discipline as the earlier tiers.
  */
object Extras3 {

  private def t(s: SparkSession, dir: String, n: String): DataFrame = Tables.load(s, dir, n)

  val entries: Seq[QueryDef] = Seq(

    // Bloom-pruned SEMI join: revenue restricted to high-value orders.
    // The bloom summary of the (selective) build side filters lineitem at
    // the scan, before its shuffle; the exact semi join removes the false
    // positives, so the oracle (the plain IN form) must hash-match — that
    // equality IS the correctness claim of the runtime-filter pattern.
    QueryDef.checked(
      "q126_bloom_semi",
      """SELECT l_returnflag, count(*) AS n_items,
        |  sum(l_extendedprice * (1 - l_discount)) AS revenue
        |FROM lineitem
        |WHERE l_orderkey IN
        |  (SELECT o_orderkey FROM orders WHERE o_totalprice > 150000)
        |GROUP BY l_returnflag""".stripMargin) { (s, dir) =>
      val big = t(s, dir, "orders").filter(col("o_totalprice") > 150000)
      BloomPrune.semiJoin(t(s, dir, "lineitem"), big,
          probeKey = "l_orderkey", buildKey = "o_orderkey",
          expectedKeys = 1 << 20)
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n_items"),
          sum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"))
    },

    // Bloom-pruned ANTI join: lineitems whose order is NOT urgent.
    // Bloom-negative rows are definite non-members (no false negatives)
    // and bypass the join entirely; only the bloom-positive minority
    // reaches the exact anti join. Build keys are non-null, so the
    // NOT IN oracle is equivalent.
    QueryDef.checked(
      "q127_bloom_anti",
      """SELECT l_linestatus, count(*) AS n_items,
        |  CAST(sum(l_linenumber) AS BIGINT) AS sum_lines
        |FROM lineitem
        |WHERE l_orderkey NOT IN
        |  (SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT')
        |GROUP BY l_linestatus""".stripMargin) { (s, dir) =>
      val urgent = t(s, dir, "orders").filter(col("o_orderpriority") === "1-URGENT")
      BloomPrune.antiJoin(t(s, dir, "lineitem"), urgent,
          probeKey = "l_orderkey", buildKey = "o_orderkey",
          expectedKeys = 1 << 20)
        .groupBy(col("l_linestatus"))
        .agg(count(lit(1)).as("n_items"),
          sum(col("l_linenumber")).cast("long").as("sum_lines"))
    },

    // Versioned snapshots end-to-end: publish v1 (orders before 1996),
    // append-publish the remainder as v2, roll back to v1 as v3, then read
    // every version THROUGH the manifest layer. The oracle recomputes each
    // version's expected contents from the source table, so a hash match
    // proves time travel returns exactly the published bytes — including
    // that v2 shares (not re-copies) v1's files and that rollback is a
    // pure manifest operation. File-level mechanics (sharing, vacuum,
    // crash debris) are pinned by SnapshotsSpec.
    QueryDef.checked(
      "q128_snapshot_travel",
      """SELECT 1 AS version, count(*) AS n_rows,
        |  CAST(sum(o_orderkey) AS BIGINT) AS sum_key
        |FROM orders WHERE o_orderdate < TIMESTAMP '1996-01-01 00:00:00'
        |UNION ALL
        |SELECT 2, count(*), CAST(sum(o_orderkey) AS BIGINT) FROM orders
        |UNION ALL
        |SELECT 3, count(*), CAST(sum(o_orderkey) AS BIGINT)
        |FROM orders WHERE o_orderdate < TIMESTAMP '1996-01-01 00:00:00'""".stripMargin) { (s, dir) =>
      val root = graft.Scratch.dir("q128_snapshot_travel", "snapshots", dir)
      val fs = new org.apache.hadoop.fs.Path(root)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(root), true) // idempotent rerun
      val orders = t(s, dir, "orders")
      Snapshots.publish(s, root, orders.filter(col("o_orderdate") < lit("1996-01-01")))
      Snapshots.publish(s, root, orders.filter(col("o_orderdate") >= lit("1996-01-01")),
        append = true)
      Snapshots.rollback(s, root, toVersion = 1)
      Seq(1, 2, 3).map { v =>
        Snapshots.read(s, root, Some(v))
          .agg(count(lit(1)).as("n_rows"),
            sum(col("o_orderkey")).cast("long").as("sum_key"))
          .select(lit(v).as("version"), col("n_rows"), col("sum_key"))
      }.reduce(_.unionByName(_))
    },

    // Incremental snapshot consumption: publish v1, append-publish v2,
    // then process ONLY the rows v2 added (readAdded scans just the delta
    // files — O(new data), never O(table)). The oracle recomputes the
    // delta from the source table, so a hash match proves the file-level
    // delta equals the row-level delta — the immutability property the
    // whole incremental pattern rests on.
    QueryDef.checked(
      "q129_snapshot_incremental",
      """SELECT o_orderpriority, count(*) AS n_orders,
        |  CAST(sum(o_orderkey) AS BIGINT) AS sum_key
        |FROM orders WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |GROUP BY 1""".stripMargin) { (s, dir) =>
      val root = graft.Scratch.dir("q129_snapshot_incremental", "snap_incr", dir)
      val fs = new org.apache.hadoop.fs.Path(root)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(root), true) // idempotent rerun
      val orders = t(s, dir, "orders")
      Snapshots.publish(s, root, orders.filter(col("o_orderdate") < lit("1996-01-01")))
      Snapshots.publish(s, root, orders.filter(col("o_orderdate") >= lit("1996-01-01")),
        append = true)
      Snapshots.readAdded(s, root, from = 1, to = 2)
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_orders"),
          sum(col("o_orderkey")).cast("long").as("sum_key"))
    },

    // One-pass data-quality expectation report over lineitem: six checks
    // (null, uniqueness, two ranges, a value set, a predicate) in a
    // single scan + single aggregate. The fixture's (l_orderkey,
    // l_linenumber) is deliberately NOT unique, so the report carries a
    // real failure — proving the report reports rather than asserts.
    QueryDef.checked(
      "q130_expectations",
      """SELECT 'not_null:l_returnflag' AS check_name,
        |  CAST(sum(CASE WHEN l_returnflag IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS violations,
        |  sum(CASE WHEN l_returnflag IS NULL THEN 1 ELSE 0 END) = 0 AS passed
        |FROM lineitem
        |UNION ALL
        |SELECT 'unique:l_orderkey,l_linenumber',
        |  CAST(count(*) - count(DISTINCT (l_orderkey, l_linenumber)) AS BIGINT),
        |  count(*) - count(DISTINCT (l_orderkey, l_linenumber)) = 0
        |FROM lineitem
        |UNION ALL
        |SELECT 'in_range:l_discount',
        |  CAST(sum(CASE WHEN l_discount IS NULL OR l_discount < 0.0 OR l_discount > 0.1
        |           THEN 1 ELSE 0 END) AS BIGINT),
        |  sum(CASE WHEN l_discount IS NULL OR l_discount < 0.0 OR l_discount > 0.1
        |      THEN 1 ELSE 0 END) = 0
        |FROM lineitem
        |UNION ALL
        |SELECT 'in_range:l_quantity',
        |  CAST(sum(CASE WHEN l_quantity IS NULL OR l_quantity < 1 OR l_quantity > 50
        |           THEN 1 ELSE 0 END) AS BIGINT),
        |  sum(CASE WHEN l_quantity IS NULL OR l_quantity < 1 OR l_quantity > 50
        |      THEN 1 ELSE 0 END) = 0
        |FROM lineitem
        |UNION ALL
        |SELECT 'in_set:l_returnflag',
        |  CAST(sum(CASE WHEN l_returnflag IN ('A','N','R') THEN 0 ELSE 1 END) AS BIGINT),
        |  sum(CASE WHEN l_returnflag IN ('A','N','R') THEN 0 ELSE 1 END) = 0
        |FROM lineitem
        |UNION ALL
        |SELECT 'satisfies:positive_price',
        |  CAST(sum(CASE WHEN l_extendedprice > 0 THEN 0 ELSE 1 END) AS BIGINT),
        |  sum(CASE WHEN l_extendedprice > 0 THEN 0 ELSE 1 END) = 0
        |FROM lineitem""".stripMargin) { (s, dir) =>
      import Expectations._
      report(t(s, dir, "lineitem"), Seq(
        NotNull("l_returnflag"),
        Unique(Seq("l_orderkey", "l_linenumber")),
        InRange("l_discount", lit(0.0), lit(0.1)),
        InRange("l_quantity", lit(1), lit(50)),
        InSet("l_returnflag", Seq("A", "N", "R")),
        Satisfies("positive_price", col("l_extendedprice") > 0)))
    },

    // Streaming sessionization under the batch oracle: the native
    // session_window state store run to completion over a file-source
    // stream, checked against the gaps-and-islands SQL. session_window
    // merges strictly-overlapping [ts, ts+gap) intervals, so an event at
    // EXACTLY prev+gap starts a new session — the oracle's `>=` (batch
    // q25 pins the windowed form with `>`; the fixture has no exact-gap
    // pair, so both conventions are exercised for real).
    QueryDef.checked(
      "q131_stream_sessions",
      """WITH g AS (
        |  SELECT user_id, event_id, value, ts,
        |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        |  FROM events),
        |s AS (
        |  SELECT user_id, value, ts,
        |    sum(CASE WHEN prev_ts IS NULL OR ts - prev_ts >= INTERVAL 30 MINUTE
        |             THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM g)
        |SELECT CAST(min(ts) AS TIMESTAMP) AS session_start, user_id,
        |  count(*) AS n_events, sum(value) AS sum_value
        |FROM s GROUP BY user_id, sid""".stripMargin) { (s, dir) =>
      import graft.streaming.EventStreams
      // glob read of the source dir — no driver-side staging copy; the
      // file-stream source takes the glob's parent as basePath
      val q = EventStreams.sessionCounts(
          EventStreams.readEvents(s, s"$dir/events*.parquet"))
        .writeStream.outputMode("complete").format("memory")
        .queryName("q131_out").start()
      q.processAllAvailable(); q.stop()
      s.table("q131_out")
    },

    // Certified exact heavy hitters: Misra-Gries candidate pass (bounded
    // per-partition summaries, no full-key-space shuffle) + exact
    // re-count over the candidate set only. The oracle is the plain
    // full group-by top-k — a hash match proves the two-pass sketch path
    // loses nothing.
    QueryDef.checked(
      "q132_heavy_hitters",
      """WITH toks AS (
        |  SELECT unnest(regexp_split_to_array(lower(text), '[^a-z]+')) AS token
        |  FROM documents WHERE text IS NOT NULL),
        |t AS (SELECT token, count(*) AS cnt FROM toks WHERE token <> '' GROUP BY 1)
        |SELECT token, CAST(cnt AS BIGINT) AS cnt FROM t
        |ORDER BY cnt DESC, token LIMIT 20""".stripMargin) { (s, dir) =>
      val toks = t(s, dir, "documents")
        .filter(col("text").isNotNull)
        .select(explode(split(lower(col("text")), "[^a-z]+")).as("token"))
        .filter(col("token") =!= "")
      HeavyHitters.topK(s, toks, "token", k = 20, m = 512)
    }
  )
}
