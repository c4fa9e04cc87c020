package graft.queries

import graft.{QueryDef, Tables}
import graft.operators.Snapshots
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-15 continuation: predicate-IMPLICATION routing (the dashboard
  * drill-down — a query strictly narrower than a filtered view's bar
  * routes with a residual Filter over the view), time-unit MV grouping,
  * and HLL-sketch companions for approximate rollup distinct counts.
  *
  * The scale claim: a drill-down on a routed dashboard is the single
  * most common aggregate shape a warehouse serves — without residual
  * routing every one of them re-scans a 100 TB base; with it, the plan
  * reads |groups| pre-aggregated view rows through one extra Filter.
  */
object Extras11 {

  private def t(s: SparkSession, dir: String, n: String): DataFrame = Tables.load(s, dir, n)

  private def freshRoot(s: SparkSession, owner: String, name: String, dir: String): String = {
    val root = graft.Scratch.dir(owner, name, dir)
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(root), true) // idempotent rerun
    root
  }

  val entries: Seq[QueryDef] = Seq(

    // PREDICATE-IMPLICATION ROUTING under the oracle hash: the view
    // aggregates σ(cents >= 15000000)(orders) by (seg, m5); three query
    // shapes run against the FRESH registered view —
    //   'drill':  the view's bar AND seg = '1-URGENT' at exact grouping
    //             → Filter(residual) over the view (routed: the view in,
    //             the base out of the optimized plan);
    //   'rolldrill': the view's bar AND m5 = 2, grouped by seg alone →
    //             the residual composes with the ROLLUP re-aggregation
    //             (m5 is a view group column NOT in the query grouping);
    //   'weak':   seg = '1-URGENT' WITHOUT the view's bar — the query is
    //             WEAKER than the view's filter, so it must BYPASS and
    //             scan the base (flag pins it), reporting the unfiltered
    //             truth.
    // All three shapes' values ride one oracle, so a mis-scoped residual
    // (wrong rows through the view) or a weak-query leak (bar rows
    // only) flips values, not just flags.
    QueryDef.checked(
      "q210_mv_residual_routing",
      """WITH base AS (
        |  SELECT o_orderkey AS k, o_orderpriority AS seg,
        |         CAST(o_orderkey % 5 AS BIGINT) AS m5,
        |         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        |  FROM orders),
        |s1 AS (
        |  SELECT k, seg, m5,
        |    CASE WHEN k % 10 = 0 THEN cents + 7 ELSE cents END AS cents
        |  FROM base WHERE k % 37 <> 0)
        |SELECT state, seg, m5, n_rows, sum_cents, min_cents,
        |  CAST(1 AS BOOLEAN) AS routed_drill,
        |  CAST(1 AS BOOLEAN) AS routed_rolldrill,
        |  CAST(1 AS BOOLEAN) AS bypassed_weak
        |FROM (
        |  SELECT 'drill' AS state, seg, m5, count(*) AS n_rows,
        |    CAST(sum(cents) AS BIGINT) AS sum_cents,
        |    CAST(min(cents) AS BIGINT) AS min_cents
        |  FROM s1 WHERE cents >= 15000000 AND seg = '1-URGENT' GROUP BY 2, 3
        |  UNION ALL
        |  SELECT 'rolldrill', seg, CAST(-1 AS BIGINT), count(*),
        |    CAST(sum(cents) AS BIGINT), CAST(min(cents) AS BIGINT)
        |  FROM s1 WHERE cents >= 15000000 AND m5 = 2 GROUP BY 2
        |  UNION ALL
        |  SELECT 'weak', seg, m5, count(*),
        |    CAST(sum(cents) AS BIGINT), CAST(min(cents) AS BIGINT)
        |  FROM s1 WHERE seg = '1-URGENT' GROUP BY 2, 3)""".stripMargin) { (s, dir) =>
      import graft.operators.Mv
      val root = freshRoot(s, "q210_mv_residual_routing", "resroute", dir)
      val baseRoot = s"$root/base"; val mvRoot = s"$root/mv"
      val pred = "cents >= 15000000"
      val base = t(s, dir, "orders").select(
        col("o_orderkey").as("k"), col("o_orderpriority").as("seg"),
        (col("o_orderkey") % 5).cast("long").as("m5"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
      Snapshots.publish(s, baseRoot, base)
      Mv.create(s, mvRoot, baseRoot, Seq("k"), Seq("seg", "m5"),
        sumCols = Seq("cents"), mvBuckets = 8, minMaxCols = Seq("cents"),
        where = Some(pred))
      val upd = base.filter(col("k") % 10 === 0 && col("k") % 37 =!= 0)
        .withColumn("cents", col("cents") + 7L).withColumn("__del", lit(false))
      val del = base.filter(col("k") % 37 === 0).withColumn("__del", lit(true))
      Snapshots.mergeByKey(s, baseRoot, upd.unionByName(del),
        keyCols = Seq("k"), tombstoneCol = Some("__del"))
      Mv.refresh(s, mvRoot)
      Mv.register(s, mvRoot)
      try {
        def live = s.read.format("graft-snapshot").option("root", baseRoot).load()
        val drill = live.where(s"$pred AND seg = '1-URGENT'")
          .groupBy("seg", "m5").agg(count(lit(1)).as("n_rows"),
            sum("cents").as("sum_cents"), min("cents").as("min_cents"))
        val rolldrill = live.where(s"$pred AND m5 = 2")
          .groupBy("seg").agg(count(lit(1)).as("n_rows"),
            sum("cents").as("sum_cents"), min("cents").as("min_cents"))
        val weak = live.where("seg = '1-URGENT'")
          .groupBy("seg", "m5").agg(count(lit(1)).as("n_rows"),
            sum("cents").as("sum_cents"), min("cents").as("min_cents"))
        def planOf(df: DataFrame): String =
          df.queryExecution.optimizedPlan.toString
        def routed(df: DataFrame): Boolean =
          planOf(df).contains(s"graft-snapshot($mvRoot)") &&
            !planOf(df).contains(s"graft-snapshot($baseRoot)")
        val (rd, rr) = (routed(drill), routed(rolldrill))
        val bw = !planOf(weak).contains(s"graft-snapshot($mvRoot)")
        drill.withColumn("state", lit("drill"))
          .unionByName(rolldrill.withColumn("m5", lit(-1L))
            .withColumn("state", lit("rolldrill")))
          .unionByName(weak.withColumn("state", lit("weak")))
          .withColumn("routed_drill", lit(rd))
          .withColumn("routed_rolldrill", lit(rr))
          .withColumn("bypassed_weak", lit(bw))
          .select(col("state"), col("seg"), col("m5"), col("n_rows"),
            col("sum_cents"), col("min_cents"), col("routed_drill"),
            col("routed_rolldrill"), col("bypassed_weak"))
      } finally Mv.unregister(s, mvRoot)
    },

    // TIME-UNIT MV GROUPING under the oracle hash: the view groups by
    // days(odate) — the engine's epoch-day transform, stored as the
    // derived `days_odate` column — and maintains through a mutation
    // that MOVES rows across days (k≡0 mod 11 shifts +40 days: the
    // unit travels with the row through the CDF as a group move),
    // updates in place, and deletes. The canonical daily-rollup query —
    // grouping the BASE scan by Mv.timeGroup("days","odate"), which the
    // optimizer pulls out as a _groupingexpression Project — routes to
    // the view while fresh ('fresh' state, flag pins the view in / the
    // base out of the plan) and bypasses with the new truth after an
    // unrefreshed second mutation ('stale'). Both states' values ride
    // one oracle (DuckDB computes the same epoch-day arithmetic).
    QueryDef.checked(
      "q211_mv_time_grouping",
      """WITH base AS (
        |  SELECT o_orderkey AS k, o_orderdate AS odate,
        |         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        |  FROM orders),
        |s1 AS (
        |  SELECT k,
        |    CASE WHEN k % 11 = 0 THEN odate + INTERVAL 40 DAY ELSE odate END AS odate,
        |    CASE WHEN k % 10 = 0 THEN cents + 7 ELSE cents END AS cents
        |  FROM base WHERE k % 37 <> 0),
        |s2 AS (SELECT k, odate, cents FROM s1 WHERE k % 5 <> 1)
        |SELECT state, d, n_rows, sum_cents,
        |  CAST(1 AS BOOLEAN) AS routed, CAST(1 AS BOOLEAN) AS bypassed
        |FROM (
        |  SELECT 'fresh' AS state,
        |    CAST(date_diff('day', DATE '1970-01-01', odate) AS INTEGER) AS d,
        |    count(*) AS n_rows, CAST(sum(cents) AS BIGINT) AS sum_cents
        |  FROM s1 GROUP BY 2
        |  UNION ALL
        |  SELECT 'stale',
        |    CAST(date_diff('day', DATE '1970-01-01', odate) AS INTEGER),
        |    count(*), CAST(sum(cents) AS BIGINT)
        |  FROM s2 GROUP BY 2)""".stripMargin) { (s, dir) =>
      import graft.operators.Mv
      val root = freshRoot(s, "q211_mv_time_grouping", "tgroute", dir)
      val baseRoot = s"$root/base"; val mvRoot = s"$root/mv"
      val base = t(s, dir, "orders").select(
        col("o_orderkey").as("k"), col("o_orderdate").as("odate"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
      Snapshots.publish(s, baseRoot, base)
      Mv.create(s, mvRoot, baseRoot, Seq("k"), Seq("days(odate)"),
        sumCols = Seq("cents"), mvBuckets = 8)
      val upd = base
        .filter((col("k") % 11 === 0 || col("k") % 10 === 0) && col("k") % 37 =!= 0)
        .withColumn("odate",
          when(col("k") % 11 === 0, date_add(col("odate"), 40)).otherwise(col("odate")))
        .withColumn("cents",
          when(col("k") % 10 === 0, col("cents") + 7L).otherwise(col("cents")))
        .withColumn("__del", lit(false))
      val del = base.filter(col("k") % 37 === 0).withColumn("__del", lit(true))
      Snapshots.mergeByKey(s, baseRoot, upd.unionByName(del),
        keyCols = Seq("k"), tombstoneCol = Some("__del"))
      Mv.refresh(s, mvRoot)
      Mv.register(s, mvRoot)
      try {
        def live = s.read.format("graft-snapshot").option("root", baseRoot).load()
        def agg(src: DataFrame) = src
          .groupBy(Mv.timeGroup("days", "odate").as("d"))
          .agg(count(lit(1)).as("n_rows"), sum("cents").as("sum_cents"))
        val fresh = agg(live)
        val freshPlan = fresh.queryExecution.optimizedPlan.toString
        val routed = freshPlan.contains(s"graft-snapshot($mvRoot)") &&
          !freshPlan.contains(s"graft-snapshot($baseRoot)")
        // pin the routed answer BEFORE the base mutates again (published
        // snapshot — deterministic, unlike a best-effort cache pin)
        Snapshots.publish(s, s"$root/pin", fresh.withColumn("state", lit("fresh")))
        val freshRows = Snapshots.read(s, s"$root/pin")
        val liveNow = live.persist()
        Snapshots.mergeByKey(s, baseRoot,
          liveNow.filter(col("k") % 5 === 1).withColumn("__del", lit(true)),
          keyCols = Seq("k"), tombstoneCol = Some("__del"))
        liveNow.unpersist()
        val stale = agg(live)
        val bypassed = !stale.queryExecution.optimizedPlan.toString
          .contains(s"graft-snapshot($mvRoot)")
        freshRows.unionByName(stale.withColumn("state", lit("stale")))
          .withColumn("routed", lit(routed))
          .withColumn("bypassed", lit(bypassed))
          .select(col("state"), col("d"), col("n_rows"), col("sum_cents"),
            col("routed"), col("bypassed"))
      } finally Mv.unregister(s, mvRoot)
    },

    // APPROXIMATE ROLLUP DISTINCTS under the oracle hash: the view
    // maintains a DataSketches HLL sketch of `val` per (seg, m5) —
    // inserts union exactly (registers only grow), a seg relabel moves
    // values wholesale (retraction → the recount tier rebuilds the
    // touched groups' sketches) — and the BY-SEG rollup query's
    // approx_count_distinct routes to hll_union_agg + estimate over
    // |groups| view rows, the shape exact nd structurally cannot serve
    // (distinct values are not summable across groups). The routed
    // query's SUM rides the oracle exactly; the estimate is pinned
    // in-row against the exact distinct count (within 5% + 1 — lgK=12
    // is ~1.6% rse, and the sketch is deterministic for a fixed value
    // set, so the flag is stable). count(DISTINCT) at the same rollup
    // must BYPASS (bypassed_exact pins it) and its exact values ride
    // the oracle too.
    QueryDef.checked(
      "q212_mv_approx_distinct",
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
        |  FROM base WHERE k % 37 <> 0)
        |SELECT seg, CAST(count(DISTINCT val) AS BIGINT) AS nd_exact,
        |  CAST(sum(cents) AS BIGINT) AS sum_cents,
        |  CAST(1 AS BOOLEAN) AS routed,
        |  CAST(1 AS BOOLEAN) AS bypassed_exact,
        |  CAST(1 AS BOOLEAN) AS est_ok
        |FROM s1 GROUP BY 1""".stripMargin) { (s, dir) =>
      import graft.operators.Mv
      val root = freshRoot(s, "q212_mv_approx_distinct", "axroute", dir)
      val baseRoot = s"$root/base"; val mvRoot = s"$root/mv"
      val base = t(s, dir, "orders").select(
        col("o_orderkey").as("k"), col("o_orderpriority").as("seg"),
        (col("o_orderkey") % 5).cast("long").as("m5"),
        floor(col("o_orderkey") / 3).cast("long").as("val"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
      Snapshots.publish(s, baseRoot, base)
      Mv.create(s, mvRoot, baseRoot, Seq("k"), Seq("seg", "m5"),
        sumCols = Seq("cents"), mvBuckets = 8, approxDistinctCols = Seq("val"))
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
        val estQ = live.groupBy("seg").agg(
          approx_count_distinct(col("val")).as("nd_est"),
          sum("cents").as("sum_cents"))
        val exactQ = live.groupBy("seg").agg(
          countDistinct(col("val")).as("nd_exact"))
        def planOf(df: DataFrame): String =
          df.queryExecution.optimizedPlan.toString
        val routed = planOf(estQ).contains(s"graft-snapshot($mvRoot)") &&
          !planOf(estQ).contains(s"graft-snapshot($baseRoot)")
        val bypassedExact = !planOf(exactQ).contains(s"graft-snapshot($mvRoot)")
        // pin the ROUTED evaluation while the registration is live: the
        // returned frame materializes after this function's unregister,
        // and unlike every exact rewrite the estimator swap is visible
        // in the values — an unrouted late evaluation would report
        // HLL++'s estimate under a routed=true flag
        Snapshots.publish(s, s"$root/pin", estQ)
        Snapshots.read(s, s"$root/pin").join(exactQ, Seq("seg"))
          .withColumn("est_ok",
            abs(col("nd_est") - col("nd_exact")) <=
              greatest(lit(1L), (col("nd_exact") * 0.05).cast("long")))
          .withColumn("routed", lit(routed))
          .withColumn("bypassed_exact", lit(bypassedExact))
          .select(col("seg"), col("nd_exact"), col("sum_cents"),
            col("routed"), col("bypassed_exact"), col("est_ok"))
      } finally Mv.unregister(s, mvRoot)
    })
}
