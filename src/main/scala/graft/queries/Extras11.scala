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
    })
}
