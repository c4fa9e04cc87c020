package graft.queries

import graft.{QueryDef, Tables}
import graft.operators.Snapshots
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-14 continuation: the MV tier's COUNT(DISTINCT) companions and
  * filtered (σ-pushed) views under the full relational-replay oracle.
  *
  * The scale claim these queries evidence: COUNT(DISTINCT) on a
  * maintained view is ALWAYS incremental — the per-column companion
  * table (one row per (group, value) with its live row count, its own
  * bucket-clustered snapshot table under the MV root) absorbs inserts
  * AND retractions exactly, so a refresh stays O(changes + touched
  * groups' companion buckets) where min/max must fall back to a
  * declared recount. Filtered views maintain σ(base) by filtering the
  * change feed row-wise (σ commutes with the signed algebra), so a
  * boundary-crossing UPDATE nets to a view insert/delete without any
  * special casing.
  */
object Extras10 {

  private def t(s: SparkSession, dir: String, n: String): DataFrame = Tables.load(s, dir, n)

  private def freshRoot(s: SparkSession, owner: String, name: String, dir: String): String = {
    val root = graft.Scratch.dir(owner, name, dir)
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(root), true) // idempotent rerun
    root
  }

  val entries: Seq[QueryDef] = Seq(

    // MV COUNT(DISTINCT) under the oracle hash: a per-priority view over
    // orders maintains nd_val = COUNT(DISTINCT floor(k/10)) through one
    // mixed mutation — group moves (k≡0 mod 13 relabels to '5-LOW':
    // whole values change groups), in-place updates (k≡0 mod 10: cents
    // move, the value does not — a companion no-op transition), deletes
    // (k≡0 mod 37: ~1/10 of (group,value) pairs are singletons, so real
    // values VANISH and nd must drop), and fresh inserts under new
    // values. The refresh applies the per-value signed delta to the
    // companion table and rereads nothing but touched-group buckets —
    // no recount tier exists for distinct counts, and a stale nd flips
    // the oracle hash. Flags: the refresh ran incrementally and a
    // replayed refresh is a noop.
    QueryDef.checked(
      "q203_mv_distinct",
      """WITH base AS (
        |  SELECT o_orderkey AS k, o_orderpriority AS seg,
        |         CAST(floor(o_orderkey / 10) AS BIGINT) AS val,
        |         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        |  FROM orders),
        |fin AS (
        |  SELECT k,
        |    CASE WHEN k % 13 = 0 THEN '5-LOW' ELSE seg END AS seg,
        |    val,
        |    CASE WHEN k % 10 = 0 THEN cents + 7 ELSE cents END AS cents
        |  FROM base WHERE k % 37 <> 0
        |  UNION ALL
        |  SELECT k + 10 * (SELECT max(o_orderkey) FROM orders), '3-MEDIUM',
        |    val + 1000000, cents + 13 FROM base WHERE k % 11 = 0)
        |SELECT seg, count(*) AS n_rows,
        |  CAST(sum(cents) AS BIGINT) AS sum_cents,
        |  CAST(count(cents) AS BIGINT) AS nn_cents,
        |  CAST(count(DISTINCT val) AS BIGINT) AS nd_val,
        |  CAST(1 AS BOOLEAN) AS incremental,
        |  CAST(1 AS BOOLEAN) AS replay_noop
        |FROM fin GROUP BY 1""".stripMargin) { (s, dir) =>
      import graft.operators.Mv
      val root = freshRoot(s, "q203_mv_distinct", "ndmv", dir)
      val base = t(s, dir, "orders").select(
        col("o_orderkey").as("k"), col("o_orderpriority").as("seg"),
        floor(col("o_orderkey") / 10).cast("long").as("val"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
      Snapshots.publish(s, s"$root/base", base)
      Mv.create(s, s"$root/mv", s"$root/base", Seq("k"), Seq("seg"),
        sumCols = Seq("cents"), mvBuckets = 8, distinctCols = Seq("val"))
      val maxK = base.agg(max("k")).head.getLong(0)
      // one mixed merge: group moves + in-place updates (not deleted),
      // singleton-killing deletes, fresh inserts under disjoint keys and
      // brand-new values (offset derived from max(k) — SF-stable)
      val updates = base
        .filter((col("k") % 13 === 0 || col("k") % 10 === 0) && col("k") % 37 =!= 0)
        .withColumn("seg", when(col("k") % 13 === 0, lit("5-LOW")).otherwise(col("seg")))
        .withColumn("cents", when(col("k") % 10 === 0, col("cents") + 7).otherwise(col("cents")))
        .withColumn("__del", lit(false))
      val deletes = base.filter(col("k") % 37 === 0).withColumn("__del", lit(true))
      val inserts = base.filter(col("k") % 11 === 0)
        .select((col("k") + lit(10L) * lit(maxK)).as("k"), lit("3-MEDIUM").as("seg"),
          (col("val") + 1000000L).as("val"), (col("cents") + 13L).as("cents"))
        .withColumn("__del", lit(false))
      Snapshots.mergeByKey(s, s"$root/base",
        updates.unionByName(deletes).unionByName(inserts),
        keyCols = Seq("k"), tombstoneCol = Some("__del"))
      val r = Mv.refresh(s, s"$root/mv")
      val incremental = r.mode == "incremental"
      val replayNoop = Mv.refresh(s, s"$root/mv").mode == "noop"
      Mv.read(s, s"$root/mv")
        .select(col("seg"), col("n_rows"), col("sum_cents"), col("nn_cents"),
          col("nd_val"))
        .withColumn("incremental", lit(incremental))
        .withColumn("replay_noop", lit(replayNoop))
    },

    // FILTERED MV under the oracle hash: the view aggregates
    // σ(cents >= 15000000)(orders) per priority with maintained min/max,
    // and the mutation drives rows ACROSS the predicate boundary in both
    // directions — k≡0 (mod 7) jumps +2e7 cents (below-bar rows become
    // view INSERTS, in-bar rows are retract+insert updates), k≡0 (mod 5)
    // collapses to cents % 15000000 (always below the bar: in-bar rows
    // become view DELETES), k≡0 (mod 37) deletes outright. Retractions
    // of in-filter minima force the min/max recount, which must run over
    // the FILTERED relation (an unfiltered recount would resurrect
    // out-of-bar extremes) and FILE-prunes to the retracted groups'
    // `__cluster=` dirs on the seg-clustered base. Flags: incremental,
    // the recount ran and pruned, replay noop.
    QueryDef.checked(
      "q204_mv_filtered",
      """WITH base AS (
        |  SELECT o_orderkey AS k, o_orderpriority AS seg,
        |         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        |  FROM orders),
        |fin AS (
        |  SELECT k, seg,
        |    CASE WHEN k % 7 = 0 THEN cents + 20000000
        |         WHEN k % 5 = 0 THEN cents % 15000000
        |         ELSE cents END AS cents
        |  FROM base WHERE k % 37 <> 0)
        |SELECT seg, count(*) AS n_rows,
        |  CAST(sum(cents) AS BIGINT) AS sum_cents,
        |  CAST(count(cents) AS BIGINT) AS nn_cents,
        |  CAST(min(cents) AS BIGINT) AS min_cents,
        |  CAST(max(cents) AS BIGINT) AS max_cents,
        |  CAST(1 AS BOOLEAN) AS incremental,
        |  CAST(1 AS BOOLEAN) AS recounted,
        |  CAST(1 AS BOOLEAN) AS recount_pruned,
        |  CAST(1 AS BOOLEAN) AS replay_noop
        |FROM fin WHERE cents >= 15000000 GROUP BY 1""".stripMargin) { (s, dir) =>
      import graft.operators.Mv
      val root = freshRoot(s, "q204_mv_filtered", "fmv", dir)
      val base = t(s, dir, "orders").select(
        col("o_orderkey").as("k"), col("o_orderpriority").as("seg"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
      Snapshots.publish(s, s"$root/base", base, clusterBy = Some("seg"))
      Mv.create(s, s"$root/mv", s"$root/base", Seq("k"), Seq("seg"),
        sumCols = Seq("cents"), mvBuckets = 8, minMaxCols = Seq("cents"),
        where = Some("cents >= 15000000"))
      val updates = base
        .filter((col("k") % 7 === 0 || col("k") % 5 === 0) && col("k") % 37 =!= 0)
        .withColumn("cents",
          when(col("k") % 7 === 0, col("cents") + 20000000L)
            .otherwise(col("cents") % 15000000L))
        .withColumn("__del", lit(false))
      val deletes = base.filter(col("k") % 37 === 0).withColumn("__del", lit(true))
      Snapshots.mergeByKey(s, s"$root/base", updates.unionByName(deletes),
        keyCols = Seq("k"), tombstoneCol = Some("__del"))
      val r = Mv.refresh(s, s"$root/mv")
      val incremental = r.mode == "incremental"
      val recounted = r.recountGroups > 0
      val recountPruned = r.recountPruned
      val replayNoop = Mv.refresh(s, s"$root/mv").mode == "noop"
      Mv.read(s, s"$root/mv")
        .select(col("seg"), col("n_rows"), col("sum_cents"), col("nn_cents"),
          col("min_cents"), col("max_cents"))
        .withColumn("incremental", lit(incremental))
        .withColumn("recounted", lit(recounted))
        .withColumn("recount_pruned", lit(recountPruned))
        .withColumn("replay_noop", lit(replayNoop))
    },

    // JOIN-MV COUNT(DISTINCT) under the oracle hash: the co-bucketed
    // orders⋈customer star maintains nd_val = COUNT(DISTINCT floor(k/10))
    // per market segment through BOTH sides' change feeds — fact updates
    // (cents move, values do not), fact deletes (singleton values vanish
    // from their segment), and a dim relabel (c_custkey≡0 mod 11 moves
    // to segment 'MOVED': those customers' values change groups
    // WHOLESALE through the bilinear delta). The companion consumes the
    // same signed view delta the count/sum algebra applies, so one
    // refresh settles both sides; probes stay bucket-pruned (the
    // co-clustered star). Flags: incremental, both probes pruned,
    // replay noop.
    QueryDef.checked(
      "q205_mv_join_distinct",
      """WITH fact AS (
        |  SELECT o_orderkey AS k, o_custkey AS ck,
        |         CAST(floor(o_orderkey / 10) AS BIGINT) AS val,
        |         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        |  FROM orders),
        |ffin AS (
        |  SELECT k, ck, val,
        |    CASE WHEN k % 10 = 0 THEN cents + 7 ELSE cents END AS cents
        |  FROM fact WHERE k % 37 <> 0),
        |dfin AS (
        |  SELECT c_custkey,
        |    CASE WHEN c_custkey % 11 = 0 THEN 'MOVED' ELSE c_mktsegment END AS seg
        |  FROM customer)
        |SELECT seg, count(*) AS n_rows,
        |  CAST(sum(cents) AS BIGINT) AS sum_cents,
        |  CAST(count(cents) AS BIGINT) AS nn_cents,
        |  CAST(count(DISTINCT val) AS BIGINT) AS nd_val,
        |  CAST(1 AS BOOLEAN) AS incremental,
        |  CAST(1 AS BOOLEAN) AS probes_pruned,
        |  CAST(1 AS BOOLEAN) AS replay_noop
        |FROM ffin JOIN dfin ON ffin.ck = dfin.c_custkey
        |GROUP BY 1""".stripMargin) { (s, dir) =>
      import graft.operators.Mv
      val root = freshRoot(s, "q205_mv_join_distinct", "ndjmv", dir)
      val fact = t(s, dir, "orders").select(
        col("o_orderkey").as("k"), col("o_custkey").as("ck"),
        floor(col("o_orderkey") / 10).cast("long").as("val"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
      val dim = t(s, dir, "customer").select(
        col("c_custkey"), col("c_mktsegment").as("seg"))
      Snapshots.publish(s, s"$root/fact", fact, clusterBy = Some("bucket(8, ck)"))
      Snapshots.publish(s, s"$root/dim", dim, clusterBy = Some("bucket(8, c_custkey)"))
      Mv.createJoin(s, s"$root/mv", s"$root/fact", Seq("k"), "ck",
        s"$root/dim", Seq("c_custkey"), "c_custkey",
        Seq("seg"), Seq("cents"), mvBuckets = 8, distinctCols = Seq("val"))
      val fUpdates = fact
        .filter(col("k") % 10 === 0 && col("k") % 37 =!= 0)
        .withColumn("cents", col("cents") + 7L).withColumn("__del", lit(false))
      val fDeletes = fact.filter(col("k") % 37 === 0).withColumn("__del", lit(true))
      Snapshots.mergeByKey(s, s"$root/fact", fUpdates.unionByName(fDeletes),
        keyCols = Seq("k"), tombstoneCol = Some("__del"))
      Snapshots.mergeByKey(s, s"$root/dim",
        dim.filter(col("c_custkey") % 11 === 0)
          .withColumn("seg", lit("MOVED")).withColumn("__del", lit(false)),
        keyCols = Seq("c_custkey"), tombstoneCol = Some("__del"))
      val r = Mv.refreshJoin(s, s"$root/mv")
      val incremental = r.mode == "incremental"
      val probesPruned = r.probePrunedLeft && r.probePrunedRight
      val replayNoop = Mv.refreshJoin(s, s"$root/mv").mode == "noop"
      Mv.read(s, s"$root/mv")
        .select(col("seg"), col("n_rows"), col("sum_cents"), col("nn_cents"),
          col("nd_val"))
        .withColumn("incremental", lit(incremental))
        .withColumn("probes_pruned", lit(probesPruned))
        .withColumn("replay_noop", lit(replayNoop))
    },

    // TRANSPARENT MV ROUTING under the oracle hash: the same grouped
    // aggregate runs twice over the BASE's DSv2 scan — once with the
    // registered view FRESH (the optimizer rewrites the plan to read
    // the view: 'routed' pins `graft-snapshot(<mv>)` in the optimized
    // plan and the base scan GONE), once after a second mutation with
    // NO refresh ('bypassed' pins the view absent from the plan — a
    // stale view must never answer). BOTH states' values ride the
    // output rows under the oracle, so a routed-but-wrong or
    // staleness-leaked answer flips the hash, not just a flag. The
    // fresh aggregate exercises every routable shape at once: count(*),
    // sum, count(col), min/max, and count(DISTINCT) → the companion-
    // maintained nd column.
    QueryDef.checked(
      "q206_mv_routing",
      """WITH base AS (
        |  SELECT o_orderkey AS k, o_orderpriority AS seg,
        |         CAST(floor(o_orderkey / 10) AS BIGINT) AS val,
        |         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        |  FROM orders),
        |s1 AS (
        |  SELECT k, seg, val,
        |    CASE WHEN k % 10 = 0 THEN cents + 7 ELSE cents END AS cents
        |  FROM base WHERE k % 37 <> 0),
        |s2 AS (
        |  SELECT k, seg, val,
        |    CASE WHEN k % 3 = 0 THEN cents + 11 ELSE cents END AS cents
        |  FROM s1 WHERE k % 5 <> 1)
        |SELECT state, seg, n_rows, sum_cents, nn_cents, min_cents,
        |  max_cents, nd_val,
        |  CAST(1 AS BOOLEAN) AS routed, CAST(1 AS BOOLEAN) AS bypassed
        |FROM (
        |  SELECT 'fresh' AS state, seg, count(*) AS n_rows,
        |    CAST(sum(cents) AS BIGINT) AS sum_cents,
        |    CAST(count(cents) AS BIGINT) AS nn_cents,
        |    CAST(min(cents) AS BIGINT) AS min_cents,
        |    CAST(max(cents) AS BIGINT) AS max_cents,
        |    CAST(count(DISTINCT val) AS BIGINT) AS nd_val
        |  FROM s1 GROUP BY 1, 2
        |  UNION ALL
        |  SELECT 'stale' AS state, seg, count(*),
        |    CAST(sum(cents) AS BIGINT), CAST(count(cents) AS BIGINT),
        |    CAST(min(cents) AS BIGINT), CAST(max(cents) AS BIGINT),
        |    CAST(count(DISTINCT val) AS BIGINT)
        |  FROM s2 GROUP BY 1, 2)""".stripMargin) { (s, dir) =>
      import graft.operators.Mv
      val root = freshRoot(s, "q206_mv_routing", "route", dir)
      val baseRoot = s"$root/base"; val mvRoot = s"$root/mv"
      val base = t(s, dir, "orders").select(
        col("o_orderkey").as("k"), col("o_orderpriority").as("seg"),
        floor(col("o_orderkey") / 10).cast("long").as("val"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
      Snapshots.publish(s, baseRoot, base)
      Mv.create(s, mvRoot, baseRoot, Seq("k"), Seq("seg"),
        sumCols = Seq("cents"), mvBuckets = 8, minMaxCols = Seq("cents"),
        distinctCols = Seq("val"))
      def mutate(updPred: Column, updCents: Column, delPred: Column): Unit = {
        val upd = base.filter(updPred && !delPred)
          .withColumn("cents", updCents).withColumn("__del", lit(false))
        val del = base.filter(delPred).withColumn("__del", lit(true))
        Snapshots.mergeByKey(s, baseRoot, upd.unionByName(del),
          keyCols = Seq("k"), tombstoneCol = Some("__del"))
      }
      // the merge deltas compose against the LIVE table, so the second
      // mutation's update reads post-first-state cents — rebuild each
      // from the live read to keep the SQL mirror exact
      def live = s.read.format("graft-snapshot").option("root", baseRoot).load()
      def agg(src: org.apache.spark.sql.DataFrame) = src.groupBy("seg").agg(
        count(lit(1)).as("n_rows"), sum("cents").as("sum_cents"),
        count(col("cents")).as("nn_cents"), min("cents").as("min_cents"),
        max("cents").as("max_cents"), countDistinct(col("val")).as("nd_val"))
      mutate(col("k") % 10 === 0, col("cents") + 7L, col("k") % 37 === 0)
      Mv.refresh(s, mvRoot)
      Mv.register(s, mvRoot)
      try {
        val fresh = agg(live)
        val freshPlan = fresh.queryExecution.optimizedPlan.toString
        val routed = freshPlan.contains(s"graft-snapshot($mvRoot)") &&
          !freshPlan.contains(s"graft-snapshot($baseRoot)")
        // pin the routed answer BEFORE the base mutates — as a published
        // snapshot (deterministic; a Spark cache pin is best-effort and a
        // cache miss would silently re-read the mutated base)
        Snapshots.publish(s, s"$root/pin",
          fresh.withColumn("state", lit("fresh")))
        val freshRows = Snapshots.read(s, s"$root/pin")
        // second mutation, NO refresh: the view is stale and must bypass
        val liveNow = live.persist()
        val upd2 = liveNow.filter(col("k") % 3 === 0 && col("k") % 5 =!= 1)
          .withColumn("cents", col("cents") + 11L).withColumn("__del", lit(false))
        val del2 = liveNow.filter(col("k") % 5 === 1).withColumn("__del", lit(true))
        Snapshots.mergeByKey(s, baseRoot, upd2.unionByName(del2),
          keyCols = Seq("k"), tombstoneCol = Some("__del"))
        liveNow.unpersist()
        val stale = agg(live)
        val bypassed = !stale.queryExecution.optimizedPlan.toString
          .contains(s"graft-snapshot($mvRoot)")
        freshRows.unionByName(stale.withColumn("state", lit("stale")))
          .withColumn("routed", lit(routed))
          .withColumn("bypassed", lit(bypassed))
          .select(col("state"), col("seg"), col("n_rows"), col("sum_cents"),
            col("nn_cents"), col("min_cents"), col("max_cents"), col("nd_val"),
            col("routed"), col("bypassed"))
      } finally Mv.unregister(s, mvRoot)
    },

    // ROLLUP + FILTERED-VIEW ROUTING under the oracle hash: the view
    // aggregates σ(cents >= 15000000)(orders) by (seg, m5) — a FINER
    // grouping than either query — and both a by-seg aggregate and the
    // GLOBAL aggregate over the filtered base scan rewrite to a
    // compensating re-aggregation OVER the view (count→sum(n_rows),
    // sum→sum(sum), min/max→min/max, avg→Σsum/Σnn — |groups| view rows
    // read, never the base), because the query predicate SEMANTICALLY
    // matches the view's where (parse → analyze → fold → semanticEquals;
    // textual equality is not required). Both states' values ride the
    // oracle; 'routed_rollup'/'routed_global' pin the view in (and the
    // base out of) each optimized plan.
    QueryDef.checked(
      "q207_mv_rollup_routing",
      """WITH base AS (
        |  SELECT o_orderkey AS k, o_orderpriority AS seg,
        |         CAST(o_orderkey % 5 AS BIGINT) AS m5,
        |         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        |  FROM orders),
        |s1 AS (
        |  SELECT k, seg, m5,
        |    CASE WHEN k % 10 = 0 THEN cents + 7 ELSE cents END AS cents
        |  FROM base WHERE k % 37 <> 0),
        |f AS (SELECT * FROM s1 WHERE cents >= 15000000)
        |SELECT 'by_seg' AS state, seg, count(*) AS n_rows,
        |  CAST(sum(cents) AS BIGINT) AS sum_cents,
        |  CAST(count(cents) AS BIGINT) AS nn_cents,
        |  CAST(min(cents) AS BIGINT) AS min_cents,
        |  CAST(max(cents) AS BIGINT) AS max_cents,
        |  CAST(sum(cents) AS DOUBLE) / count(cents) AS avg_cents,
        |  CAST(1 AS BOOLEAN) AS routed_rollup,
        |  CAST(1 AS BOOLEAN) AS routed_global
        |FROM f GROUP BY 1, 2
        |UNION ALL
        |SELECT 'global', '_all', count(*),
        |  CAST(sum(cents) AS BIGINT), CAST(count(cents) AS BIGINT),
        |  CAST(min(cents) AS BIGINT), CAST(max(cents) AS BIGINT),
        |  CAST(sum(cents) AS DOUBLE) / count(cents),
        |  CAST(1 AS BOOLEAN), CAST(1 AS BOOLEAN)
        |FROM f""".stripMargin) { (s, dir) =>
      import graft.operators.Mv
      val root = freshRoot(s, "q207_mv_rollup_routing", "rollup", dir)
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
        val bySeg = live.where(pred).groupBy("seg").agg(
          count(lit(1)).as("n_rows"), sum("cents").as("sum_cents"),
          count(col("cents")).as("nn_cents"), min("cents").as("min_cents"),
          max("cents").as("max_cents"), avg(col("cents")).as("avg_cents"))
        val global = live.where(pred).agg(
          count(lit(1)).as("n_rows"), sum("cents").as("sum_cents"),
          count(col("cents")).as("nn_cents"), min("cents").as("min_cents"),
          max("cents").as("max_cents"), avg(col("cents")).as("avg_cents"))
        def routedPlan(df: org.apache.spark.sql.DataFrame): Boolean = {
          val p = df.queryExecution.optimizedPlan.toString
          p.contains(s"graft-snapshot($mvRoot)") &&
            !p.contains(s"graft-snapshot($baseRoot)")
        }
        val (rr, rg) = (routedPlan(bySeg), routedPlan(global))
        bySeg.withColumn("state", lit("by_seg"))
          .unionByName(global.withColumn("seg", lit("_all"))
            .withColumn("state", lit("global")))
          .withColumn("routed_rollup", lit(rr))
          .withColumn("routed_global", lit(rg))
          .select(col("state"), col("seg"), col("n_rows"), col("sum_cents"),
            col("nn_cents"), col("min_cents"), col("max_cents"),
            col("avg_cents"), col("routed_rollup"), col("routed_global"))
      } finally Mv.unregister(s, mvRoot)
    },

    // JOIN-MV ROUTING under the oracle hash: the star-schema dashboard
    // query — an aggregate over fact ⋈ dim — rewrites to the join MV
    // while the view's watermark PAIR equals both heads ('fresh' state,
    // 'routed' pins the view in and BOTH base scans out of the plan),
    // and bypasses with the new truth after the dim relabels with no
    // refresh ('stale' state, 'bypassed' pins the view absent). Both
    // states' values — count, sum, and the derived double avg — ride
    // the oracle, so a stale answer or a mis-derived avg flips values,
    // not just flags.
    QueryDef.checked(
      "q208_mv_join_routing",
      """WITH fact AS (
        |  SELECT o_orderkey AS k, o_custkey AS ck,
        |         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        |  FROM orders),
        |f1 AS (
        |  SELECT k, ck,
        |    CASE WHEN k % 10 = 0 THEN cents + 7 ELSE cents END AS cents
        |  FROM fact WHERE k % 37 <> 0),
        |dim0 AS (SELECT c_custkey, c_mktsegment AS seg FROM customer),
        |dim1 AS (
        |  SELECT c_custkey,
        |    CASE WHEN c_custkey % 11 = 0 THEN 'MOVED' ELSE seg END AS seg
        |  FROM dim0)
        |SELECT 'fresh' AS state, seg, count(*) AS n_rows,
        |  CAST(sum(cents) AS BIGINT) AS sum_cents,
        |  CAST(sum(cents) AS DOUBLE) / count(cents) AS avg_cents,
        |  CAST(1 AS BOOLEAN) AS routed, CAST(1 AS BOOLEAN) AS bypassed
        |FROM f1 JOIN dim0 ON ck = c_custkey GROUP BY 1, 2
        |UNION ALL
        |SELECT 'stale', seg, count(*), CAST(sum(cents) AS BIGINT),
        |  CAST(sum(cents) AS DOUBLE) / count(cents),
        |  CAST(1 AS BOOLEAN), CAST(1 AS BOOLEAN)
        |FROM f1 JOIN dim1 ON ck = c_custkey GROUP BY 1, 2""".stripMargin) { (s, dir) =>
      import graft.operators.Mv
      val root = freshRoot(s, "q208_mv_join_routing", "jroute", dir)
      val factRoot = s"$root/fact"; val dimRoot = s"$root/dim"
      val mvRoot = s"$root/mv"
      val fact = t(s, dir, "orders").select(
        col("o_orderkey").as("k"), col("o_custkey").as("ck"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
      val dim = t(s, dir, "customer").select(
        col("c_custkey"), col("c_mktsegment").as("seg"))
      Snapshots.publish(s, factRoot, fact, clusterBy = Some("bucket(8, ck)"))
      Snapshots.publish(s, dimRoot, dim, clusterBy = Some("bucket(8, c_custkey)"))
      Mv.createJoin(s, mvRoot, factRoot, Seq("k"), "ck",
        dimRoot, Seq("c_custkey"), "c_custkey",
        Seq("seg"), Seq("cents"), mvBuckets = 8)
      val upd = fact.filter(col("k") % 10 === 0 && col("k") % 37 =!= 0)
        .withColumn("cents", col("cents") + 7L).withColumn("__del", lit(false))
      val del = fact.filter(col("k") % 37 === 0).withColumn("__del", lit(true))
      Snapshots.mergeByKey(s, factRoot, upd.unionByName(del),
        keyCols = Seq("k"), tombstoneCol = Some("__del"))
      Mv.refreshJoin(s, mvRoot)
      Mv.register(s, mvRoot)
      try {
        def star = s.read.format("graft-snapshot").option("root", factRoot).load()
          .join(s.read.format("graft-snapshot").option("root", dimRoot).load(),
            col("ck") === col("c_custkey"))
        def agg(src: org.apache.spark.sql.DataFrame) = src.groupBy("seg").agg(
          count(lit(1)).as("n_rows"), sum("cents").as("sum_cents"),
          avg(col("cents")).as("avg_cents"))
        val fresh = agg(star)
        val freshPlan = fresh.queryExecution.optimizedPlan.toString
        val routed = freshPlan.contains(s"graft-snapshot($mvRoot)") &&
          !freshPlan.contains(s"graft-snapshot($factRoot)") &&
          !freshPlan.contains(s"graft-snapshot($dimRoot)")
        // pin the routed answer BEFORE the dim mutates (published
        // snapshot — deterministic, unlike a best-effort cache pin)
        Snapshots.publish(s, s"$root/pin",
          fresh.withColumn("state", lit("fresh")))
        val freshRows = Snapshots.read(s, s"$root/pin")
        Snapshots.mergeByKey(s, dimRoot,
          dim.filter(col("c_custkey") % 11 === 0)
            .withColumn("seg", lit("MOVED")).withColumn("__del", lit(false)),
          keyCols = Seq("c_custkey"), tombstoneCol = Some("__del"))
        val stale = agg(star)
        val bypassed = !stale.queryExecution.optimizedPlan.toString
          .contains(s"graft-snapshot($mvRoot)")
        freshRows.unionByName(stale.withColumn("state", lit("stale")))
          .withColumn("routed", lit(routed))
          .withColumn("bypassed", lit(bypassed))
          .select(col("state"), col("seg"), col("n_rows"), col("sum_cents"),
            col("avg_cents"), col("routed"), col("bypassed"))
      } finally Mv.unregister(s, mvRoot)
    },

    // TRILINEAR ROUTING under the oracle hash: the dim-fact-dim star —
    // customer ⋈ orders ⋈ nation (the fact's nation FK derives as
    // k % 25, covering every nationkey) — answers from the trilinear MV
    // in three shapes: 'fresh' = the exact (seg, n_name) grouping as a
    // plain Project of the view; 'rollup' = the by-nation grouping as a
    // re-aggregation over |groups| view rows; 'stale' = after the
    // customer dim relabels with NO refresh, the watermark TRIPLE is
    // stale and the query keeps its original 3-way join plan with the
    // new truth. All three states' values ride one oracle; the flags
    // pin the view in (and all three base scans out of) the routed
    // plans.
    QueryDef.checked(
      "q209_mv_join3_routing",
      """WITH mid0 AS (
        |  SELECT o_orderkey AS k, o_custkey AS ck,
        |         CAST(o_orderkey % 25 AS BIGINT) AS nk,
        |         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        |  FROM orders),
        |m1 AS (
        |  SELECT k, ck, nk,
        |    CASE WHEN k % 10 = 0 THEN cents + 7 ELSE cents END AS cents
        |  FROM mid0 WHERE k % 37 <> 0),
        |l0 AS (SELECT c_custkey, c_mktsegment AS seg FROM customer),
        |l1 AS (
        |  SELECT c_custkey,
        |    CASE WHEN c_custkey % 11 = 0 THEN 'MOVED' ELSE seg END AS seg
        |  FROM l0),
        |r0 AS (SELECT n_nationkey, n_name FROM nation),
        |j0 AS (SELECT seg, n_name, cents FROM l0
        |       JOIN m1 ON c_custkey = ck JOIN r0 ON nk = n_nationkey),
        |j1 AS (SELECT seg, n_name, cents FROM l1
        |       JOIN m1 ON c_custkey = ck JOIN r0 ON nk = n_nationkey)
        |SELECT state, seg, n_name, n_rows, sum_cents,
        |  CAST(1 AS BOOLEAN) AS routed, CAST(1 AS BOOLEAN) AS routed_rollup,
        |  CAST(1 AS BOOLEAN) AS bypassed
        |FROM (
        |  SELECT 'fresh' AS state, seg, n_name, count(*) AS n_rows,
        |    CAST(sum(cents) AS BIGINT) AS sum_cents
        |  FROM j0 GROUP BY 1, 2, 3
        |  UNION ALL
        |  SELECT 'rollup', '_all', n_name, count(*), CAST(sum(cents) AS BIGINT)
        |  FROM j0 GROUP BY 1, 2, 3
        |  UNION ALL
        |  SELECT 'stale', seg, n_name, count(*), CAST(sum(cents) AS BIGINT)
        |  FROM j1 GROUP BY 1, 2, 3)""".stripMargin) { (s, dir) =>
      import graft.operators.Mv
      val root = freshRoot(s, "q209_mv_join3_routing", "j3route", dir)
      val (lRoot, mRoot, rRoot, mvRoot) =
        (s"$root/ldim", s"$root/fact", s"$root/rdim", s"$root/mv")
      val ldim = t(s, dir, "customer").select(
        col("c_custkey"), col("c_mktsegment").as("seg"))
      val fact = t(s, dir, "orders").select(
        col("o_orderkey").as("k"), col("o_custkey").as("ck"),
        (col("o_orderkey") % 25).cast("long").as("nk"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
      val rdim = t(s, dir, "nation").select(col("n_nationkey"), col("n_name"))
      Snapshots.publish(s, lRoot, ldim, clusterBy = Some("bucket(8, c_custkey)"))
      Snapshots.publish(s, mRoot, fact, clusterBy = Some("bucket(8, ck)"))
      Snapshots.publish(s, rRoot, rdim, clusterBy = Some("n_nationkey"))
      Mv.createJoin3(s, mvRoot, lRoot, Seq("c_custkey"), "c_custkey",
        mRoot, Seq("k"), "ck", "nk", rRoot, Seq("n_nationkey"), "n_nationkey",
        Seq("seg", "n_name"), Seq("cents"), mvBuckets = 8)
      val upd = fact.filter(col("k") % 10 === 0 && col("k") % 37 =!= 0)
        .withColumn("cents", col("cents") + 7L).withColumn("__del", lit(false))
      val del = fact.filter(col("k") % 37 === 0).withColumn("__del", lit(true))
      Snapshots.mergeByKey(s, mRoot, upd.unionByName(del),
        keyCols = Seq("k"), tombstoneCol = Some("__del"))
      Mv.refreshJoin3(s, mvRoot)
      Mv.register(s, mvRoot)
      try {
        def rd(r: String) = s.read.format("graft-snapshot").option("root", r).load()
        def star = rd(lRoot).join(rd(mRoot), col("c_custkey") === col("ck"))
          .join(rd(rRoot), col("nk") === col("n_nationkey"))
        def planRouted(df: org.apache.spark.sql.DataFrame): Boolean = {
          val p = df.queryExecution.optimizedPlan.toString
          p.contains(s"graft-snapshot($mvRoot)") &&
            Seq(lRoot, mRoot, rRoot).forall(b => !p.contains(s"graft-snapshot($b)"))
        }
        val fresh = star.groupBy("seg", "n_name").agg(
          count(lit(1)).as("n_rows"), sum("cents").as("sum_cents"))
        val rollup = star.groupBy("n_name").agg(
          count(lit(1)).as("n_rows"), sum("cents").as("sum_cents"))
        val (routed, routedRollup) = (planRouted(fresh), planRouted(rollup))
        // pin the routed answers BEFORE the dim mutates (published
        // snapshot — deterministic, unlike a best-effort cache pin)
        Snapshots.publish(s, s"$root/pin",
          fresh.withColumn("state", lit("fresh"))
            .unionByName(rollup.withColumn("seg", lit("_all"))
              .withColumn("state", lit("rollup"))))
        val pinned = Snapshots.read(s, s"$root/pin")
        Snapshots.mergeByKey(s, lRoot,
          ldim.filter(col("c_custkey") % 11 === 0)
            .withColumn("seg", lit("MOVED")).withColumn("__del", lit(false)),
          keyCols = Seq("c_custkey"), tombstoneCol = Some("__del"))
        val stale = star.groupBy("seg", "n_name").agg(
          count(lit(1)).as("n_rows"), sum("cents").as("sum_cents"))
        val bypassed = !stale.queryExecution.optimizedPlan.toString
          .contains(s"graft-snapshot($mvRoot)")
        pinned.unionByName(stale.withColumn("state", lit("stale")))
          .withColumn("routed", lit(routed))
          .withColumn("routed_rollup", lit(routedRollup))
          .withColumn("bypassed", lit(bypassed))
          .select(col("state"), col("seg"), col("n_name"), col("n_rows"),
            col("sum_cents"), col("routed"), col("routed_rollup"),
            col("bypassed"))
      } finally Mv.unregister(s, mvRoot)
    })
}
