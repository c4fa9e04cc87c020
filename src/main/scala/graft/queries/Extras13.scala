package graft.queries

import graft.{QueryDef, Tables}
import graft.operators.Snapshots
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-17 continuation of the routed-dashboard tier: GROUPING-SETS
  * routing (the `GROUP BY ROLLUP(seg, days(ts))` BI dashboard routes
  * through the view under the analyzer's own Aggregate-over-Expand
  * shape, grouping-id semantics intact), and point/IN-list implication
  * for residual routing (the point-day drill-down `days(ts) = N` — and
  * its IN-list sibling — over a range-barred view).
  *
  * The scale claim, per shape: a rollup dashboard over a registered
  * view reads |view rows| × |grouping sets| instead of |base| ×
  * |grouping sets| — the Expand replicates a |groups|-row scan, never
  * the 100 TB base — and the point-day drill-down reads the one day's
  * view rows behind a Filter instead of re-scanning the base under the
  * bar.
  */
object Extras13 {

  private def t(s: SparkSession, dir: String, n: String): DataFrame = Tables.load(s, dir, n)

  private def freshRoot(s: SparkSession, owner: String, name: String, dir: String): String = {
    val root = graft.Scratch.dir(owner, name, dir)
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(root), true) // idempotent rerun
    root
  }

  val entries: Seq[QueryDef] = Seq(

    // GROUPING-SETS ROUTING under the oracle hash: the star BI dashboard
    // — `GROUP BY ROLLUP(seg, days(odate))` with grouping_id — over a
    // maintained `(seg, days(odate))` view routes as Aggregate-over-
    // Expand with the VIEW's rows replicating underneath (count→
    // sum(n_rows), sum→sum(sum_cents) per grouping set); the same
    // dashboard carrying an extra non-view grouping column must BYPASS,
    // and after an unrefreshed mutation the rollup must BYPASS with the
    // new truth. Fresh values are pinned as published snapshots before
    // the second mutation; all three states ride one oracle, so a
    // mis-stitched grouping set (NULL markers confused with real
    // groups, a gid mask off by a bit, a set answered from stale rows)
    // flips values, not just flags. DuckDB replays the rollup with
    // GROUPING() over the same epoch-day arithmetic.
    QueryDef.checked(
      "q217_mv_groupingsets_routing",
      """WITH base AS (
        |  SELECT o_orderkey AS k, o_orderpriority AS seg, o_orderdate AS odate,
        |         CAST(o_orderkey % 3 AS BIGINT) AS m3,
        |         CAST(floor(o_orderkey / 3) AS BIGINT) AS val,
        |         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        |  FROM orders),
        |s1 AS (
        |  SELECT k,
        |    CASE WHEN k % 13 = 0 THEN '5-LOW' ELSE seg END AS seg,
        |    CASE WHEN k % 11 = 0 THEN odate + INTERVAL 40 DAY ELSE odate END AS odate,
        |    m3, val,
        |    CASE WHEN k % 10 = 0 THEN cents + 7 ELSE cents END AS cents
        |  FROM base WHERE k % 37 <> 0),
        |s2 AS (SELECT * FROM s1 WHERE k % 5 <> 1),
        |r1 AS (
        |  SELECT seg, CAST(date_diff('day', DATE '1970-01-01', odate) AS INTEGER) AS d,
        |         CAST(GROUPING(seg,
        |           CAST(date_diff('day', DATE '1970-01-01', odate) AS INTEGER)) AS BIGINT) AS gid,
        |         count(*) AS n_rows, CAST(sum(cents) AS BIGINT) AS sum_cents,
        |         CAST(count(DISTINCT val) AS BIGINT) AS nd_val
        |  FROM s1
        |  GROUP BY ROLLUP(seg, CAST(date_diff('day', DATE '1970-01-01', odate) AS INTEGER))),
        |r2 AS (
        |  SELECT seg, CAST(date_diff('day', DATE '1970-01-01', odate) AS INTEGER) AS d,
        |         CAST(GROUPING(seg,
        |           CAST(date_diff('day', DATE '1970-01-01', odate) AS INTEGER)) AS BIGINT) AS gid,
        |         count(*) AS n_rows, CAST(sum(cents) AS BIGINT) AS sum_cents,
        |         CAST(count(DISTINCT val) AS BIGINT) AS nd_val
        |  FROM s2
        |  GROUP BY ROLLUP(seg, CAST(date_diff('day', DATE '1970-01-01', odate) AS INTEGER)))
        |SELECT state, seg, d, gid, n_rows, sum_cents, nd_val,
        |  CAST(1 AS BOOLEAN) AS routed_rollup, CAST(1 AS BOOLEAN) AS bypassed_mixed,
        |  CAST(1 AS BOOLEAN) AS bypassed_stale
        |FROM (
        |  SELECT 'fresh' AS state, * FROM r1
        |  UNION ALL
        |  SELECT 'stale', * FROM r2)""".stripMargin) { (s, dir) =>
      import graft.operators.Mv
      val root = freshRoot(s, "q217_mv_groupingsets_routing", "gsroute", dir)
      val baseRoot = s"$root/base"; val mvRoot = s"$root/mv"
      val base = t(s, dir, "orders").select(
        col("o_orderkey").as("k"), col("o_orderpriority").as("seg"),
        col("o_orderdate").as("odate"),
        (col("o_orderkey") % 3).cast("long").as("m3"),
        floor(col("o_orderkey") / 3).cast("long").as("val"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
      Snapshots.publish(s, baseRoot, base)
      Mv.create(s, mvRoot, baseRoot, Seq("k"), Seq("seg", "days(odate)"),
        sumCols = Seq("cents"), mvBuckets = 8, distinctCols = Seq("val"))
      // CoW mutation: relabels, cross-day moves, in-place updates, deletes
      val upd = base
        .filter((col("k") % 13 === 0 || col("k") % 11 === 0 || col("k") % 10 === 0) &&
          col("k") % 37 =!= 0)
        .withColumn("seg", when(col("k") % 13 === 0, lit("5-LOW")).otherwise(col("seg")))
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
        def rollQ(src: DataFrame) = src
          .rollup(col("seg"), Mv.timeGroup("days", "odate").as("d"))
          .agg(grouping_id().as("gid"), count(lit(1)).as("n_rows"),
            sum("cents").as("sum_cents"),
            countDistinct(col("val")).as("nd_val"))
        val fresh = rollQ(live)
        // an extra NON-VIEW grouping column makes one set unroutable —
        // the whole Expand must keep the base plan (never half-routed)
        val mixed = live.rollup(col("seg"), Mv.timeGroup("days", "odate"), col("m3"))
          .agg(count(lit(1)).as("n_rows"))
        def planOf(df: DataFrame): String =
          df.queryExecution.optimizedPlan.toString
        def routed(df: DataFrame): Boolean =
          planOf(df).contains(s"graft-snapshot($mvRoot)") &&
            planOf(df).contains(s"graft-snapshot($mvRoot/_dv/val)") &&
            !planOf(df).contains(s"graft-snapshot($baseRoot)")
        val rr = routed(fresh)
        val bm = !planOf(mixed).contains(s"graft-snapshot($mvRoot)")
        Snapshots.publish(s, s"$root/pin", fresh.withColumn("state", lit("fresh")))
        val pinned = Snapshots.read(s, s"$root/pin")
        val liveNow = live.persist()
        Snapshots.mergeByKey(s, baseRoot,
          liveNow.filter(col("k") % 5 === 1).withColumn("__del", lit(true)),
          keyCols = Seq("k"), tombstoneCol = Some("__del"))
        liveNow.unpersist()
        val stale = rollQ(live)
        val bs = !planOf(stale).contains(s"graft-snapshot($mvRoot)")
        pinned.unionByName(stale.withColumn("state", lit("stale")))
          .withColumn("routed_rollup", lit(rr))
          .withColumn("bypassed_mixed", lit(bm))
          .withColumn("bypassed_stale", lit(bs))
          .select(col("state"), col("seg"), col("d"), col("gid"),
            col("n_rows"), col("sum_cents"), col("nd_val"),
            col("routed_rollup"), col("bypassed_mixed"),
            col("bypassed_stale"))
      } finally Mv.unregister(s, mvRoot)
    },

    // POINT / IN-LIST IMPLICATION ROUTING under the oracle hash: the
    // view aggregates σ(dy >= 9000)(orders) by (dy, seg); the point-day
    // drill-down `dy = 10000` and the day-list `dy IN (10100, 10200)
    // AND seg = '1-URGENT'` both satisfy the bar pointwise and route as
    // a Filter over the view (the implying conjunct rides as residual);
    // a list with one element BELOW the bar (`dy IN (8999, 10000)`)
    // wants rows the view already dropped and must bypass to the base.
    // All three states' values ride one oracle, so a boundary element
    // slipped through (or a point answered from barred-away rows)
    // flips values.
    QueryDef.checked(
      "q218_mv_point_residual_routing",
      """WITH base AS (
        |  SELECT o_orderkey AS k,
        |         CAST(date_diff('day', DATE '1970-01-01', o_orderdate) AS BIGINT) AS dy,
        |         o_orderpriority AS seg,
        |         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        |  FROM orders),
        |s1 AS (
        |  SELECT k, dy, seg,
        |    CASE WHEN k % 10 = 0 THEN cents + 7 ELSE cents END AS cents
        |  FROM base WHERE k % 37 <> 0),
        |-- the probe days derive from the data (so every scale factor
        |-- has rows): the first populated day at-or-past the bar+1000
        |-- and two more past it; the below-bar element is a FIXED day
        |-- under the bar (it needs no rows — implication is about the
        |-- element vs the bar, not the data)
        |pts AS (SELECT (SELECT min(dy) FROM s1 WHERE dy >= 10000) AS d1,
        |               (SELECT min(dy) FROM s1 WHERE dy >= 10050) AS d2,
        |               (SELECT min(dy) FROM s1 WHERE dy >= 10100) AS d3)
        |SELECT state, seg, n_rows, sum_cents,
        |  CAST(1 AS BOOLEAN) AS routed_pt, CAST(1 AS BOOLEAN) AS routed_inl,
        |  CAST(1 AS BOOLEAN) AS bypassed_cross
        |FROM (
        |  SELECT 'pt' AS state, seg, count(*) AS n_rows,
        |    CAST(sum(cents) AS BIGINT) AS sum_cents
        |  FROM s1 WHERE dy = (SELECT d1 FROM pts) GROUP BY 2
        |  UNION ALL
        |  SELECT 'inl', seg, count(*), CAST(sum(cents) AS BIGINT)
        |  FROM s1 WHERE dy IN ((SELECT d2 FROM pts), (SELECT d3 FROM pts))
        |    AND seg = '1-URGENT' GROUP BY 2
        |  UNION ALL
        |  SELECT 'cross', seg, count(*), CAST(sum(cents) AS BIGINT)
        |  FROM s1 WHERE dy IN (8000, (SELECT d1 FROM pts))
        |  GROUP BY 2)""".stripMargin) { (s, dir) =>
      import graft.operators.Mv
      val root = freshRoot(s, "q218_mv_point_residual_routing", "ptroute", dir)
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
        // the same data-derived probe days as the oracle's `pts` —
        // collected up front so the drill-downs carry plain LITERALS
        // (the shape the implication matcher answers)
        def firstDayAtLeast(lo: Long): Long = live.filter(col("dy") >= lo)
          .agg(min("dy")).head().getLong(0)
        val d1 = firstDayAtLeast(10000L)
        val d2 = firstDayAtLeast(10050L)
        val d3 = firstDayAtLeast(10100L)
        val pt = agg(live.where(s"dy = $d1"))
        val inl = agg(live.where(s"dy IN ($d2, $d3) AND seg = '1-URGENT'"))
        val cross = agg(live.where(s"dy IN (8000, $d1)"))
        def planOf(df: DataFrame): String =
          df.queryExecution.optimizedPlan.toString
        def routed(df: DataFrame): Boolean =
          planOf(df).contains(s"graft-snapshot($mvRoot)") &&
            !planOf(df).contains(s"graft-snapshot($baseRoot)")
        val (rp, ri) = (routed(pt), routed(inl))
        val bc = !planOf(cross).contains(s"graft-snapshot($mvRoot)")
        pt.withColumn("state", lit("pt"))
          .unionByName(inl.withColumn("state", lit("inl")))
          .unionByName(cross.withColumn("state", lit("cross")))
          .withColumn("routed_pt", lit(rp))
          .withColumn("routed_inl", lit(ri))
          .withColumn("bypassed_cross", lit(bc))
          .select(col("state"), col("seg"), col("n_rows"), col("sum_cents"),
            col("routed_pt"), col("routed_inl"), col("bypassed_cross"))
      } finally Mv.unregister(s, mvRoot)
    },

    // STAR ROLLUP ROUTING under the oracle hash: the BI dashboard over a
    // star schema — `GROUP BY ROLLUP(seg, days(odate))` with grouping_id
    // over fact ⋈ dim — answered by a join view grouped on both: the
    // Aggregate-over-Expand rewrite matches the join under the Expand
    // (the same shape extraction as plain star routing), the view's
    // |seg × day| rows replicate per grouping set, and a 100 TB
    // fact-dim shuffle-join-rollup becomes a handful of view reads.
    // Maintained through a fact mutation (cross-day moves, updates,
    // deletes) and a dim relabel; fresh values pinned before a third
    // unrefreshed mutation whose rollup must BYPASS with the new truth.
    QueryDef.checked(
      "q219_mv_star_rollup_routing",
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
        |       cents FROM f2 JOIN d1 ON ck = ck2),
        |r1 AS (
        |  SELECT seg, d, CAST(GROUPING(seg, d) AS BIGINT) AS gid,
        |         count(*) AS n_rows, CAST(sum(cents) AS BIGINT) AS sum_cents
        |  FROM j1 GROUP BY ROLLUP(seg, d)),
        |r2 AS (
        |  SELECT seg, d, CAST(GROUPING(seg, d) AS BIGINT) AS gid,
        |         count(*) AS n_rows, CAST(sum(cents) AS BIGINT) AS sum_cents
        |  FROM j2 GROUP BY ROLLUP(seg, d))
        |SELECT state, seg, d, gid, n_rows, sum_cents,
        |  CAST(1 AS BOOLEAN) AS routed_rollup, CAST(1 AS BOOLEAN) AS bypassed_stale
        |FROM (
        |  SELECT 'fresh' AS state, * FROM r1
        |  UNION ALL
        |  SELECT 'stale', * FROM r2)""".stripMargin) { (s, dir) =>
      import graft.operators.Mv
      val root = freshRoot(s, "q219_mv_star_rollup_routing", "srroute", dir)
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
      Snapshots.mergeByKey(s, dimRoot,
        dim.filter(col("ck2") % 7 === 0).withColumn("seg", lit("RESEG"))
          .withColumn("__del", lit(false)),
        keyCols = Seq("ck2"), tombstoneCol = Some("__del"))
      Mv.refreshJoin(s, mvRoot)
      Mv.register(s, mvRoot)
      try {
        def liveF = s.read.format("graft-snapshot").option("root", factRoot).load()
        def liveD = s.read.format("graft-snapshot").option("root", dimRoot).load()
        def rollQ = liveF.join(liveD, col("ck") === col("ck2"))
          .rollup(col("seg"), Mv.timeGroup("days", "odate").as("d"))
          .agg(grouping_id().as("gid"), count(lit(1)).as("n_rows"),
            sum("cents").as("sum_cents"))
        val fresh = rollQ
        def planOf(df: DataFrame): String =
          df.queryExecution.optimizedPlan.toString
        val rr = planOf(fresh).contains(s"graft-snapshot($mvRoot)") &&
          !planOf(fresh).contains(s"graft-snapshot($factRoot)")
        Snapshots.publish(s, s"$root/pin", fresh.withColumn("state", lit("fresh")))
        val pinned = Snapshots.read(s, s"$root/pin")
        val liveNow = liveF.persist()
        Snapshots.mergeByKey(s, factRoot,
          liveNow.filter(col("k") % 5 === 1).withColumn("__del", lit(true)),
          keyCols = Seq("k"), tombstoneCol = Some("__del"))
        liveNow.unpersist()
        val stale = rollQ
        val bs = !planOf(stale).contains(s"graft-snapshot($mvRoot)")
        pinned.unionByName(stale.withColumn("state", lit("stale")))
          .withColumn("routed_rollup", lit(rr))
          .withColumn("bypassed_stale", lit(bs))
          .select(col("state"), col("seg"), col("d"), col("gid"),
            col("n_rows"), col("sum_cents"), col("routed_rollup"),
            col("bypassed_stale"))
      } finally Mv.unregister(s, mvRoot)
    })
}
