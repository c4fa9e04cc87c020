package graft.queries

import graft.{QueryDef, Tables}
import graft.operators.Snapshots
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-16 continuation of the routed-dashboard tier: EXACT rollup
  * COUNT(DISTINCT) via the companion table (the one aggregate shape
  * routing still declined exactly, though the answer was already
  * stored), time-unit group specs on JOIN MVs (the star daily
  * dashboard), and range implication for residual routing (the
  * time-windowed drill-down over a barred view).
  *
  * The scale claim, per shape: a coarser-grouped `count(DISTINCT user)`
  * re-reads O(companion rows of the matched groups) — never the 100 TB
  * base — because the `_dv` companion already stores one row per
  * (group, value); `GROUP BY days(o_orderdate), c_mktsegment` over
  * fact ⋈ dim maintains delta-sized (the day unit is a function of the
  * joined row) and routes to |days × segments| view rows; and
  * `day >= K' AND seg = 'X'` over a view barred at `day >= K` (K' ≥ K)
  * routes as one Filter over the view instead of re-scanning the base.
  */
object Extras12 {

  private def t(s: SparkSession, dir: String, n: String): DataFrame = Tables.load(s, dir, n)

  private def freshRoot(s: SparkSession, owner: String, name: String, dir: String): String = {
    val root = graft.Scratch.dir(owner, name, dir)
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(root), true) // idempotent rerun
    root
  }

  val entries: Seq[QueryDef] = Seq(

    // EXACT ROLLUP COUNT(DISTINCT) ROUTING under the oracle hash: the
    // view maintains count(DISTINCT val) per (seg, m5) through a
    // retraction-bearing mutation (relabels move values wholesale,
    // deletes retract them); the BY-SEG rollup and the GLOBAL distinct
    // count — the shapes stored nd structurally cannot serve — route to
    // count(DISTINCT __vd) over view ⋈ companion, exact values, both
    // pinned as published snapshots BEFORE the second mutation; the
    // same rollup over the then-stale view must BYPASS and report the
    // post-mutation truth. All three states' values ride one oracle, so
    // a companion digest that failed to dedup values across groups (or
    // a stale-leak) flips values, not just flags.
    QueryDef.checked(
      "q213_mv_rollup_distinct_routing",
      """WITH base AS (
        |  SELECT o_orderkey AS k, o_orderpriority AS seg,
        |         CAST(o_orderkey % 5 AS BIGINT) AS m5,
        |         CAST(floor(o_orderkey / 3) AS BIGINT) AS val,
        |         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        |  FROM orders),
        |s1 AS (
        |  SELECT k,
        |    CASE WHEN k % 13 = 0 THEN '5-LOW' ELSE seg END AS seg,
        |    m5, val,
        |    CASE WHEN k % 10 = 0 THEN cents + 7 ELSE cents END AS cents
        |  FROM base WHERE k % 37 <> 0),
        |s2 AS (SELECT * FROM s1 WHERE k % 5 <> 1)
        |SELECT state, seg, nd_val, sum_cents,
        |  CAST(1 AS BOOLEAN) AS routed_bys, CAST(1 AS BOOLEAN) AS routed_all,
        |  CAST(1 AS BOOLEAN) AS bypassed_stale
        |FROM (
        |  SELECT 'bys' AS state, seg,
        |    CAST(count(DISTINCT val) AS BIGINT) AS nd_val,
        |    CAST(sum(cents) AS BIGINT) AS sum_cents
        |  FROM s1 GROUP BY 2
        |  UNION ALL
        |  SELECT 'all', '*', CAST(count(DISTINCT val) AS BIGINT),
        |    CAST(sum(cents) AS BIGINT)
        |  FROM s1
        |  UNION ALL
        |  SELECT 'stale', seg, CAST(count(DISTINCT val) AS BIGINT),
        |    CAST(sum(cents) AS BIGINT)
        |  FROM s2 GROUP BY 2)""".stripMargin) { (s, dir) =>
      import graft.operators.Mv
      val root = freshRoot(s, "q213_mv_rollup_distinct_routing", "nddvroute", dir)
      val baseRoot = s"$root/base"; val mvRoot = s"$root/mv"
      val base = t(s, dir, "orders").select(
        col("o_orderkey").as("k"), col("o_orderpriority").as("seg"),
        (col("o_orderkey") % 5).cast("long").as("m5"),
        floor(col("o_orderkey") / 3).cast("long").as("val"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
      Snapshots.publish(s, baseRoot, base)
      Mv.create(s, mvRoot, baseRoot, Seq("k"), Seq("seg", "m5"),
        sumCols = Seq("cents"), mvBuckets = 8, distinctCols = Seq("val"))
      val upd = base
        .filter((col("k") % 13 === 0 || col("k") % 10 === 0) && col("k") % 37 =!= 0)
        .withColumn("seg", when(col("k") % 13 === 0, lit("5-LOW")).otherwise(col("seg")))
        .withColumn("cents", when(col("k") % 10 === 0, col("cents") + 7L).otherwise(col("cents")))
        .withColumn("__del", lit(false))
      val del = base.filter(col("k") % 37 === 0).withColumn("__del", lit(true))
      Snapshots.mergeByKey(s, baseRoot, upd.unionByName(del),
        keyCols = Seq("k"), tombstoneCol = Some("__del"))
      Mv.refresh(s, mvRoot)
      Mv.register(s, mvRoot)
      try {
        def live = s.read.format("graft-snapshot").option("root", baseRoot).load()
        val bys = live.groupBy("seg").agg(
          countDistinct(col("val")).as("nd_val"), sum("cents").as("sum_cents"))
        val all = live.agg(
          countDistinct(col("val")).as("nd_val"), sum("cents").as("sum_cents"))
        def planOf(df: DataFrame): String =
          df.queryExecution.optimizedPlan.toString
        def routed(df: DataFrame): Boolean =
          planOf(df).contains(s"graft-snapshot($mvRoot)") &&
            planOf(df).contains(s"graft-snapshot($mvRoot/_dv/val)") &&
            !planOf(df).contains(s"graft-snapshot($baseRoot)")
        val (rb, ra) = (routed(bys), routed(all))
        // pin the routed states as published snapshots BEFORE the base
        // mutates again (exact values — the pin guards against the
        // mutation, not the rewrite)
        Snapshots.publish(s, s"$root/pin",
          bys.withColumn("state", lit("bys"))
            .unionByName(all.withColumn("seg", lit("*"))
              .withColumn("state", lit("all"))))
        val pinned = Snapshots.read(s, s"$root/pin")
        val liveNow = live.persist()
        Snapshots.mergeByKey(s, baseRoot,
          liveNow.filter(col("k") % 5 === 1).withColumn("__del", lit(true)),
          keyCols = Seq("k"), tombstoneCol = Some("__del"))
        liveNow.unpersist()
        val stale = live.groupBy("seg").agg(
          countDistinct(col("val")).as("nd_val"), sum("cents").as("sum_cents"))
        val bypassed = !planOf(stale).contains(s"graft-snapshot($mvRoot)")
        pinned.unionByName(stale.withColumn("state", lit("stale")))
          .withColumn("routed_bys", lit(rb))
          .withColumn("routed_all", lit(ra))
          .withColumn("bypassed_stale", lit(bypassed))
          .select(col("state"), col("seg"), col("nd_val"), col("sum_cents"),
            col("routed_bys"), col("routed_all"), col("bypassed_stale"))
      } finally Mv.unregister(s, mvRoot)
    },

    // TIME-UNIT GROUPS ON A JOIN MV under the oracle hash: the star
    // daily dashboard — `GROUP BY days(odate), seg` over fact ⋈ dim —
    // as a maintained view: created with a `days(odate)` group spec,
    // refreshed incrementally from the FACT feed (a mutation that moves
    // rows across days, updates in place, deletes) and then from the
    // DIM feed (a relabel moving whole groups), routed at exact
    // grouping AND at the by-seg rollup while fresh (both pinned before
    // the next mutation), bypassed with the new truth after an
    // unrefreshed third mutation. DuckDB replays the same epoch-day
    // arithmetic relationally.
    QueryDef.checked(
      "q214_mv_join_time_grouping",
      """WITH f0 AS (
        |  SELECT o_orderkey AS k, o_custkey AS ck, o_orderdate AS odate,
        |         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        |  FROM orders),
        |f1 AS (
        |  SELECT k, ck,
        |    CASE WHEN k % 11 = 0 THEN odate + INTERVAL 40 DAY ELSE odate END AS odate,
        |    CASE WHEN k % 10 = 0 THEN cents + 7 ELSE cents END AS cents
        |  FROM f0 WHERE k % 37 <> 0),
        |d1 AS (
        |  SELECT c_custkey AS ck2,
        |    CASE WHEN c_custkey % 7 = 0 THEN 'RESEG' ELSE c_mktsegment END AS seg
        |  FROM customer),
        |j1 AS (SELECT seg, CAST(date_diff('day', DATE '1970-01-01', odate) AS INTEGER) AS d,
        |       cents FROM f1 JOIN d1 ON ck = ck2),
        |f2 AS (SELECT * FROM f1 WHERE k % 5 <> 1),
        |j2 AS (SELECT seg, CAST(date_diff('day', DATE '1970-01-01', odate) AS INTEGER) AS d,
        |       cents FROM f2 JOIN d1 ON ck = ck2)
        |SELECT state, seg, d, n_rows, sum_cents,
        |  CAST(1 AS BOOLEAN) AS routed_exact, CAST(1 AS BOOLEAN) AS routed_rollup,
        |  CAST(1 AS BOOLEAN) AS bypassed_stale
        |FROM (
        |  SELECT 'fresh' AS state, seg, d, count(*) AS n_rows,
        |    CAST(sum(cents) AS BIGINT) AS sum_cents
        |  FROM j1 GROUP BY 2, 3
        |  UNION ALL
        |  SELECT 'byseg', seg, -1, count(*), CAST(sum(cents) AS BIGINT)
        |  FROM j1 GROUP BY 2
        |  UNION ALL
        |  SELECT 'stale', seg, d, count(*), CAST(sum(cents) AS BIGINT)
        |  FROM j2 GROUP BY 2, 3)""".stripMargin) { (s, dir) =>
      import graft.operators.Mv
      val root = freshRoot(s, "q214_mv_join_time_grouping", "jtgroute", dir)
      val factRoot = s"$root/fact"; val dimRoot = s"$root/dim"; val mvRoot = s"$root/mv"
      val fact = t(s, dir, "orders").select(
        col("o_orderkey").as("k"), col("o_custkey").as("ck"),
        col("o_orderdate").as("odate"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
      val dim = t(s, dir, "customer").select(
        col("c_custkey").as("ck2"), col("c_mktsegment").as("seg"))
      Snapshots.publish(s, factRoot, fact, clusterBy = Some("bucket(8, ck)"))
      Snapshots.publish(s, dimRoot, dim, clusterBy = Some("bucket(8, ck2)"))
      Mv.createJoin(s, mvRoot, factRoot, Seq("k"), "ck", dimRoot, Seq("ck2"), "ck2",
        Seq("seg", "days(odate)"), Seq("cents"), mvBuckets = 8)
      // FACT feed: cross-day moves + in-place updates + deletes
      val upd = fact
        .filter((col("k") % 11 === 0 || col("k") % 10 === 0) && col("k") % 37 =!= 0)
        .withColumn("odate",
          when(col("k") % 11 === 0, date_add(col("odate"), 40)).otherwise(col("odate")))
        .withColumn("cents",
          when(col("k") % 10 === 0, col("cents") + 7L).otherwise(col("cents")))
        .withColumn("__del", lit(false))
      val del = fact.filter(col("k") % 37 === 0).withColumn("__del", lit(true))
      Snapshots.mergeByKey(s, factRoot, upd.unionByName(del),
        keyCols = Seq("k"), tombstoneCol = Some("__del"))
      Mv.refreshJoin(s, mvRoot)
      // DIM feed: a relabel moves whole (seg, day) groups
      Snapshots.mergeByKey(s, dimRoot,
        dim.filter(col("ck2") % 7 === 0).withColumn("seg", lit("RESEG"))
          .withColumn("__del", lit(false)),
        keyCols = Seq("ck2"), tombstoneCol = Some("__del"))
      Mv.refreshJoin(s, mvRoot)
      Mv.register(s, mvRoot)
      try {
        def liveF = s.read.format("graft-snapshot").option("root", factRoot).load()
        def liveD = s.read.format("graft-snapshot").option("root", dimRoot).load()
        def joined = liveF.join(liveD, col("ck") === col("ck2"))
        val exactQ = joined
          .groupBy(col("seg"), Mv.timeGroup("days", "odate").as("d"))
          .agg(count(lit(1)).as("n_rows"), sum("cents").as("sum_cents"))
        val rollQ = joined.groupBy("seg")
          .agg(count(lit(1)).as("n_rows"), sum("cents").as("sum_cents"))
        def planOf(df: DataFrame): String =
          df.queryExecution.optimizedPlan.toString
        def routed(df: DataFrame): Boolean =
          planOf(df).contains(s"graft-snapshot($mvRoot)") &&
            !planOf(df).contains(s"graft-snapshot($factRoot)")
        val (re, rr) = (routed(exactQ), routed(rollQ))
        Snapshots.publish(s, s"$root/pin",
          exactQ.withColumn("state", lit("fresh"))
            .unionByName(rollQ.withColumn("d", lit(-1))
              .withColumn("state", lit("byseg"))))
        val pinned = Snapshots.read(s, s"$root/pin")
        val liveNow = liveF.persist()
        Snapshots.mergeByKey(s, factRoot,
          liveNow.filter(col("k") % 5 === 1).withColumn("__del", lit(true)),
          keyCols = Seq("k"), tombstoneCol = Some("__del"))
        liveNow.unpersist()
        val stale = joined
          .groupBy(col("seg"), Mv.timeGroup("days", "odate").as("d"))
          .agg(count(lit(1)).as("n_rows"), sum("cents").as("sum_cents"))
        val bypassed = !planOf(stale).contains(s"graft-snapshot($mvRoot)")
        pinned.unionByName(stale.withColumn("state", lit("stale")))
          .withColumn("routed_exact", lit(re))
          .withColumn("routed_rollup", lit(rr))
          .withColumn("bypassed_stale", lit(bypassed))
          .select(col("state"), col("seg"), col("d"), col("n_rows"),
            col("sum_cents"), col("routed_exact"), col("routed_rollup"),
            col("bypassed_stale"))
      } finally Mv.unregister(s, mvRoot)
    },

    // RANGE-IMPLICATION RESIDUAL ROUTING under the oracle hash: the
    // view aggregates σ(dy >= 9000)(orders) by (day, seg); the
    // time-windowed drill-downs — a TIGHTER bound alone ('tight',
    // rollup grouping), the tighter bound AND a group-column conjunct
    // ('win', still rollup grouping) — route as a Filter over the view (the
    // implying bound rides as residual); a LOOSER bound ('loose') wants
    // rows the view's bar already dropped and must bypass to the base.
    // All three states' values ride one oracle, so a mis-scoped
    // implication (boundary rows through or dropped) flips values.
    QueryDef.checked(
      "q215_mv_range_residual_routing",
      """WITH base AS (
        |  SELECT o_orderkey AS k,
        |         CAST(date_diff('day', DATE '1970-01-01', o_orderdate) AS BIGINT) AS dy,
        |         o_orderpriority AS seg,
        |         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        |  FROM orders),
        |s1 AS (
        |  SELECT k, dy, seg,
        |    CASE WHEN k % 10 = 0 THEN cents + 7 ELSE cents END AS cents
        |  FROM base WHERE k % 37 <> 0)
        |SELECT state, seg, n_rows, sum_cents,
        |  CAST(1 AS BOOLEAN) AS routed_tight, CAST(1 AS BOOLEAN) AS routed_win,
        |  CAST(1 AS BOOLEAN) AS bypassed_loose
        |FROM (
        |  SELECT 'tight' AS state, seg, count(*) AS n_rows,
        |    CAST(sum(cents) AS BIGINT) AS sum_cents
        |  FROM s1 WHERE dy >= 10000 GROUP BY 2
        |  UNION ALL
        |  SELECT 'win', seg, count(*), CAST(sum(cents) AS BIGINT)
        |  FROM s1 WHERE dy > 10200 AND seg = '1-URGENT' GROUP BY 2
        |  UNION ALL
        |  SELECT 'loose', seg, count(*), CAST(sum(cents) AS BIGINT)
        |  FROM s1 WHERE dy >= 8500 GROUP BY 2)""".stripMargin) { (s, dir) =>
      import graft.operators.Mv
      val root = freshRoot(s, "q215_mv_range_residual_routing", "rangeroute", dir)
      val baseRoot = s"$root/base"; val mvRoot = s"$root/mv"
      val base = t(s, dir, "orders").select(
        col("o_orderkey").as("k"),
        datediff(col("o_orderdate"), lit(java.sql.Date.valueOf("1970-01-01")))
          .cast("long").as("dy"),
        col("o_orderpriority").as("seg"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
      Snapshots.publish(s, baseRoot, base)
      Mv.create(s, mvRoot, baseRoot, Seq("k"), Seq("dy", "seg"),
        sumCols = Seq("cents"), mvBuckets = 8, where = Some("dy >= 9000"))
      val upd = base.filter(col("k") % 10 === 0 && col("k") % 37 =!= 0)
        .withColumn("cents", col("cents") + 7L).withColumn("__del", lit(false))
      val del = base.filter(col("k") % 37 === 0).withColumn("__del", lit(true))
      Snapshots.mergeByKey(s, baseRoot, upd.unionByName(del),
        keyCols = Seq("k"), tombstoneCol = Some("__del"))
      Mv.refresh(s, mvRoot)
      Mv.register(s, mvRoot)
      try {
        def live = s.read.format("graft-snapshot").option("root", baseRoot).load()
        def agg(src: DataFrame) = src.groupBy("seg")
          .agg(count(lit(1)).as("n_rows"), sum("cents").as("sum_cents"))
        val tight = agg(live.where("dy >= 10000"))
        val win = agg(live.where("dy > 10200 AND seg = '1-URGENT'"))
        val loose = agg(live.where("dy >= 8500"))
        def planOf(df: DataFrame): String =
          df.queryExecution.optimizedPlan.toString
        def routed(df: DataFrame): Boolean =
          planOf(df).contains(s"graft-snapshot($mvRoot)") &&
            !planOf(df).contains(s"graft-snapshot($baseRoot)")
        val (rt, rw) = (routed(tight), routed(win))
        val bl = !planOf(loose).contains(s"graft-snapshot($mvRoot)")
        tight.withColumn("state", lit("tight"))
          .unionByName(win.withColumn("state", lit("win")))
          .unionByName(loose.withColumn("state", lit("loose")))
          .withColumn("routed_tight", lit(rt))
          .withColumn("routed_win", lit(rw))
          .withColumn("bypassed_loose", lit(bl))
          .select(col("state"), col("seg"), col("n_rows"), col("sum_cents"),
            col("routed_tight"), col("routed_win"), col("bypassed_loose"))
      } finally Mv.unregister(s, mvRoot)
    },

    // KLL QUANTILE COMPANIONS under the oracle hash: the view maintains
    // a KLL sketch of `cents` per (seg, m5) — inserts merge exactly, a
    // seg relabel retracts values (the recount tier rebuilds touched
    // sketches) — and default-accuracy approx_percentile routes to
    // get-quantile over the stored sketch (exact grouping) or over a
    // sketch MERGE (the by-seg rollup): the p50 dashboard shape. The
    // routed query's SUM rides the oracle exactly; the estimates are
    // pinned in-row against the exact p40–p60 band (k=200 is ~1.65%
    // rank error — the band is 6× that). The EXACT percentile at the
    // same grouping must BYPASS (flag) and its values ride the oracle.
    QueryDef.checked(
      "q216_mv_quantile_routing",
      """WITH base AS (
        |  SELECT o_orderkey AS k, o_orderpriority AS seg,
        |         CAST(o_orderkey % 5 AS BIGINT) AS m5,
        |         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        |  FROM orders),
        |s1 AS (
        |  SELECT k,
        |    CASE WHEN k % 13 = 0 THEN '5-LOW' ELSE seg END AS seg,
        |    m5,
        |    CASE WHEN k % 10 = 0 THEN cents + 7 ELSE cents END AS cents
        |  FROM base WHERE k % 37 <> 0)
        |SELECT seg, p50, sum_cents,
        |  CAST(1 AS BOOLEAN) AS routed_roll, CAST(1 AS BOOLEAN) AS routed_exactg,
        |  CAST(1 AS BOOLEAN) AS routed_arr,
        |  CAST(1 AS BOOLEAN) AS bypassed_exact, CAST(1 AS BOOLEAN) AS est_ok,
        |  CAST(1 AS BOOLEAN) AS arr_ok
        |FROM (
        |  SELECT seg, quantile_cont(cents, 0.5) AS p50,
        |    CAST(sum(cents) AS BIGINT) AS sum_cents
        |  FROM s1 GROUP BY 1)""".stripMargin) { (s, dir) =>
      import graft.operators.Mv
      val root = freshRoot(s, "q216_mv_quantile_routing", "kllroute", dir)
      val baseRoot = s"$root/base"; val mvRoot = s"$root/mv"
      val base = t(s, dir, "orders").select(
        col("o_orderkey").as("k"), col("o_orderpriority").as("seg"),
        (col("o_orderkey") % 5).cast("long").as("m5"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
      Snapshots.publish(s, baseRoot, base)
      Mv.create(s, mvRoot, baseRoot, Seq("k"), Seq("seg", "m5"),
        sumCols = Seq("cents"), mvBuckets = 8, approxQuantileCols = Seq("cents"))
      val upd = base
        .filter((col("k") % 13 === 0 || col("k") % 10 === 0) && col("k") % 37 =!= 0)
        .withColumn("seg", when(col("k") % 13 === 0, lit("5-LOW")).otherwise(col("seg")))
        .withColumn("cents", when(col("k") % 10 === 0, col("cents") + 7L).otherwise(col("cents")))
        .withColumn("__del", lit(false))
      val del = base.filter(col("k") % 37 === 0).withColumn("__del", lit(true))
      Snapshots.mergeByKey(s, baseRoot, upd.unionByName(del),
        keyCols = Seq("k"), tombstoneCol = Some("__del"))
      Mv.refresh(s, mvRoot)
      Mv.register(s, mvRoot)
      try {
        def live = s.read.format("graft-snapshot").option("root", baseRoot).load()
        val estRoll = live.groupBy("seg").agg(
          expr("approx_percentile(cents, 0.5D)").as("p50_est"),
          sum("cents").as("sum_cents"))
        val estExactG = live.groupBy("seg", "m5").agg(
          expr("approx_percentile(cents, 0.5D)").as("p50_est"))
        // the latency-dashboard ARRAY call: one sketch read answers all
        // three percentiles (routed through the same merge at rollup
        // grouping)
        val estArr = live.groupBy("seg").agg(
          expr("approx_percentile(cents, array(0.25D, 0.5D, 0.9D))").as("parr"))
        val exact = live.groupBy("seg").agg(
          expr("percentile(cents, 0.5D)").as("p50"),
          sum("cents").as("sum_cents"))
        def planOf(df: DataFrame): String =
          df.queryExecution.optimizedPlan.toString
        def routed(df: DataFrame): Boolean =
          planOf(df).contains(s"graft-snapshot($mvRoot)") &&
            !planOf(df).contains(s"graft-snapshot($baseRoot)")
        val (rr, rx, ra) = (routed(estRoll), routed(estExactG), routed(estArr))
        val bx = !planOf(exact).contains(s"graft-snapshot($mvRoot)")
        // pin the ROUTED estimates while the registration is live — the
        // estimator swap is value-visible, and the returned frame
        // materializes after unregister (the q212 discipline)
        Snapshots.publish(s, s"$root/pin", estRoll)
        Snapshots.publish(s, s"$root/pinx", estExactG)
        Snapshots.publish(s, s"$root/pina", estArr)
        // in-row estimate check: the pinned KLL median must sit inside
        // the exact p40–p60 band at BOTH groupings (collapsed to one
        // driver-side boolean for the exact-grouping side)
        val bandRoll = live.groupBy("seg").agg(
          expr("percentile(cents, 0.40D)").as("p40"),
          expr("percentile(cents, 0.60D)").as("p60"))
        val bandX = live.groupBy("seg", "m5").agg(
          expr("percentile(cents, 0.40D)").as("p40"),
          expr("percentile(cents, 0.60D)").as("p60"))
        val okX = Snapshots.read(s, s"$root/pinx").join(bandX, Seq("seg", "m5"))
          .agg(min(col("p50_est") >= col("p40") && col("p50_est") <= col("p60")))
          .collect().head.getBoolean(0)
        // the array call's middle element rides the same p40–p60 band,
        // and the three elements must be monotone (one sketch, three
        // ranks — an element-order mixup would invert them)
        val okA = Snapshots.read(s, s"$root/pina").join(bandRoll, Seq("seg"))
          .agg(min(element_at(col("parr"), 2) >= col("p40") &&
            element_at(col("parr"), 2) <= col("p60") &&
            element_at(col("parr"), 1) <= element_at(col("parr"), 2) &&
            element_at(col("parr"), 2) <= element_at(col("parr"), 3)))
          .collect().head.getBoolean(0)
        Snapshots.read(s, s"$root/pin").join(exact.select(col("seg"),
            col("p50")), Seq("seg"))
          .join(bandRoll, Seq("seg"))
          .withColumn("est_ok",
            col("p50_est") >= col("p40") && col("p50_est") <= col("p60") && lit(okX))
          .withColumn("routed_roll", lit(rr))
          .withColumn("routed_exactg", lit(rx))
          .withColumn("routed_arr", lit(ra))
          .withColumn("bypassed_exact", lit(bx))
          .withColumn("arr_ok", lit(okA))
          .select(col("seg"), col("p50"), col("sum_cents"),
            col("routed_roll"), col("routed_exactg"), col("routed_arr"),
            col("bypassed_exact"), col("est_ok"), col("arr_ok"))
      } finally Mv.unregister(s, mvRoot)
    })
}
