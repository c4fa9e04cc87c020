package graft

import graft.operators.{Mv, Snapshots}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins transparent MV routing ([[graft.sources.MvRoute]]): a matching
  * grouped aggregate over the BASE scan rewrites to the registered
  * view's scan WHEN FRESH, with identical results (values, NULL
  * semantics, types); staleness, shape mismatches, time travel, and
  * unregistered views all keep the original plan — routing is never a
  * correctness trade.
  */
class MvRouteSpec extends AnyFunSuite {
  import SparkTestEnv._

  private lazy val wh: String = {
    val p = java.nio.file.Files.createTempDirectory("graft-mvroute")
    p.toFile.deleteOnExit()
    p.toString
  }

  /** (k PK, g group, v nullable measure, c distinct-counted). */
  private def base(rows: Seq[(Long, String, java.lang.Long, Long)]): DataFrame = {
    import spark.implicits._
    rows.toDF("k", "g", "v", "c")
  }

  private def dsv2(root: String): DataFrame =
    spark.read.format("graft-snapshot").option("root", root).load()

  private def planOf(df: DataFrame): String =
    df.queryExecution.optimizedPlan.toString

  private def rows(df: DataFrame): Set[Seq[Any]] =
    df.collect().map(_.toSeq).toSet

  test("a fresh registered view answers the matching aggregate with identical results") {
    val b = s"$wh/rb1"; val m = s"$wh/rm1"
    Snapshots.publish(spark, b, base(Seq(
      (1L, "a", 10L, 5L), (2L, "a", null.asInstanceOf[java.lang.Long], 7L),
      (3L, "b", 30L, 5L), (4L, null, 40L, 5L))))
    Mv.create(spark, m, b, Seq("k"), Seq("g"), Seq("v"), mvBuckets = 4,
      minMaxCols = Seq("v"), distinctCols = Seq("c"))
    def q = dsv2(b).groupBy("g").agg(
      count(lit(1)).as("n"), sum("v").as("s"), count(col("v")).as("nnv"),
      avg(col("v")).as("av"), min("v").as("mn"), max("v").as("mx"),
      countDistinct(col("c")).as("ndc"))
    val unrouted = rows(q)
    assert(!planOf(q).contains(s"graft-snapshot($m)"),
      "must not route before registration")
    Mv.register(spark, m)
    try {
      assert(planOf(q).contains(s"graft-snapshot($m)"),
        s"fresh registered view must answer the aggregate:\n${planOf(q)}")
      assert(!planOf(q).contains(s"graft-snapshot($b)"),
        "the routed plan must not scan the base")
      assert(rows(q) === unrouted)
      // SQL path routes identically (the temp view expands to the scan)
      dsv2(b).createOrReplaceTempView("route_t")
      val viaSql = spark.sql(
        "SELECT g, count(*) AS n, sum(v) AS s FROM route_t GROUP BY g")
      assert(planOf(viaSql).contains(s"graft-snapshot($m)"), planOf(viaSql))
    } finally Mv.unregister(spark, m)
  }

  test("a stale view bypasses; refresh re-enables the route") {
    import spark.implicits._
    val b = s"$wh/rb2"; val m = s"$wh/rm2"
    Snapshots.publish(spark, b, base(Seq((1L, "a", 10L, 1L), (2L, "b", 20L, 2L))))
    Mv.create(spark, m, b, Seq("k"), Seq("g"), Seq("v"), mvBuckets = 4)
    Mv.register(spark, m)
    try {
      def q = dsv2(b).groupBy("g").agg(sum("v").as("s"))
      assert(planOf(q).contains(s"graft-snapshot($m)"))
      // mutate the base WITHOUT refreshing: the view is stale — the
      // query must keep its original plan and report the NEW truth
      Snapshots.mergeByKey(spark, b,
        Seq((1L, "a", 99L, 1L)).toDF("k", "g", "v", "c")
          .withColumn("__del", lit(false)),
        Seq("k"), tombstoneCol = Some("__del"))
      assert(!planOf(q).contains(s"graft-snapshot($m)"),
        "a stale view must never answer")
      assert(rows(q).contains(Seq("a", 99L)))
      Mv.refresh(spark, m)
      assert(planOf(q).contains(s"graft-snapshot($m)"),
        "refresh must re-enable the route")
      assert(rows(q).contains(Seq("a", 99L)))
    } finally Mv.unregister(spark, m)
  }

  test("shape mismatches and time travel bypass the route") {
    val b = s"$wh/rb3"; val m = s"$wh/rm3"
    Snapshots.publish(spark, b, base(Seq((1L, "a", 10L, 1L), (2L, "b", 20L, 2L))))
    Mv.create(spark, m, b, Seq("k"), Seq("g"), Seq("v"), mvBuckets = 4)
    Mv.register(spark, m)
    try {
      val mv = s"graft-snapshot($m)"
      // grouping mismatch (extra column)
      assert(!planOf(dsv2(b).groupBy("g", "k").agg(sum("v"))).contains(mv))
      // grouping by an expression
      assert(!planOf(dsv2(b).groupBy(upper(col("g"))).agg(sum("v"))).contains(mv))
      // unmaintained aggregate (c is not a sum column)
      assert(!planOf(dsv2(b).groupBy("g").agg(sum("c"))).contains(mv))
      // unmaintained min/max and distinct
      assert(!planOf(dsv2(b).groupBy("g").agg(min("v"))).contains(mv))
      assert(!planOf(dsv2(b).groupBy("g").agg(countDistinct(col("c")))).contains(mv))
      // a filter on a non-view-carried column (v is a SUM column — the
      // view stores sum_v, not v, so the residual cannot re-apply)
      assert(!planOf(dsv2(b).where(col("v") > 0).groupBy("g").agg(sum("v")))
        .contains(mv))
      // time travel pins a version — never route
      assert(!planOf(spark.read.format("graft-snapshot").option("root", b)
        .option("version", "1").load().groupBy("g").agg(sum("v"))).contains(mv))
      // the maintained shape itself still routes (the controls above are
      // mismatch-driven, not registry-driven)
      assert(planOf(dsv2(b).groupBy("g").agg(sum("v"), count(lit(1)))).contains(mv))
    } finally Mv.unregister(spark, m)
  }

  test("rollup routing: a coarser grouping re-aggregates the view, not the base") {
    import spark.implicits._
    val b = s"$wh/rb5"; val m = s"$wh/rm5"
    // two group columns (g, h) on the view; queries by g alone and the
    // GLOBAL aggregate both roll up from |groups| view rows
    Snapshots.publish(spark, b,
      Seq[(Long, String, String, java.lang.Long, Long)](
        (1L, "a", "x", 10L, 1L), (2L, "a", "y", 20L, 2L),
        (3L, "b", "x", 30L, 3L), (4L, "a", "y", 40L, 1L),
        (5L, "b", "y", null, 2L))
        .toDF("k", "g", "h", "v", "c"))
    Mv.create(spark, m, b, Seq("k"), Seq("g", "h"), Seq("v"), mvBuckets = 4,
      minMaxCols = Seq("v"), distinctCols = Seq("c"))
    val mv = s"graft-snapshot($m)"
    def byG = dsv2(b).groupBy("g").agg(
      count(lit(1)).as("n"), sum("v").as("s"), count(col("v")).as("nnv"),
      avg(col("v")).as("av"), min("v").as("mn"), max("v").as("mx"))
    def global = dsv2(b).agg(count(lit(1)).as("n"), sum("v").as("s"))
    val (wantG, wantAll) = (rows(byG), rows(global))
    Mv.register(spark, m)
    try {
      assert(planOf(byG).contains(mv), planOf(byG))
      assert(!planOf(byG).contains(s"graft-snapshot($b)"))
      assert(rows(byG) === wantG)
      assert(planOf(global).contains(mv), planOf(global))
      assert(rows(global) === wantAll)
      // count(DISTINCT) at SUBSET grouping is not summable from the
      // view's rows — it routes via the COMPANION instead:
      // count(DISTINCT __vd) over view ⋈ _dv/c, never the base
      def ndRoll = dsv2(b).groupBy("g").agg(countDistinct(col("c")).as("nd"),
        count(lit(1)).as("n"), sum("v").as("s"))
      assert(planOf(ndRoll).contains(mv), planOf(ndRoll))
      assert(planOf(ndRoll).contains(s"graft-snapshot($m/_dv/c)"), planOf(ndRoll))
      assert(!planOf(ndRoll).contains(s"graft-snapshot($b)"), planOf(ndRoll))
      assert(rows(ndRoll) === Set(Seq("a", 2L, 3L, 70L), Seq("b", 2L, 2L, 30L)))
      // the GLOBAL distinct rollup routes the same way
      def ndAll = dsv2(b).agg(countDistinct(col("c")).as("nd"))
      assert(planOf(ndAll).contains(s"graft-snapshot($m/_dv/c)"), planOf(ndAll))
      assert(!planOf(ndAll).contains(s"graft-snapshot($b)"))
      assert(rows(ndAll) === Set(Seq(3L)))
      // ...and exact grouping keeps reading the stored nd column — no
      // companion scan in the plan
      def ndExact = dsv2(b).groupBy("g", "h").agg(countDistinct(col("c")).as("nd"))
      assert(planOf(ndExact).contains(mv), planOf(ndExact))
      assert(!planOf(ndExact).contains("_dv/"), planOf(ndExact))
      // a non-group column in the rollup grouping bypasses
      assert(!planOf(dsv2(b).groupBy("c").agg(sum("v"))).contains(mv))
    } finally Mv.unregister(spark, m)
  }

  test("rollup count(DISTINCT) without a companion bypasses; all-NULL groups report 0") {
    import spark.implicits._
    val b = s"$wh/rnd1"; val m = s"$wh/rnd2"
    // v is summed but NOT distinct-maintained — no companion exists, so
    // the rollup distinct must keep its original plan
    Snapshots.publish(spark, b, base(Seq(
      (1L, "a", 10L, 1L), (2L, "a", 20L, 2L), (3L, "b", 30L, 3L))))
    Mv.create(spark, m, b, Seq("k"), Seq("g"), Seq("v"), mvBuckets = 4)
    Mv.register(spark, m)
    try {
      assert(!planOf(dsv2(b).agg(countDistinct(col("v")))).contains(
        s"graft-snapshot($m)"))
    } finally Mv.unregister(spark, m)
    // an all-NULL-valued group has view rows but NO companion rows: the
    // LeftOuter + Coalesce must report 0, exactly count(DISTINCT)'s
    // NULL semantics — and a group with values reports beside it
    val b2 = s"$wh/rnd3"; val m2 = s"$wh/rnd4"
    Snapshots.publish(spark, b2,
      Seq[(Long, String, String, java.lang.Long)](
        (1L, "a", "x", null), (2L, "a", "y", null), (3L, "b", "x", 7L))
        .toDF("k", "g", "h", "c"))
    Mv.create(spark, m2, b2, Seq("k"), Seq("g", "h"), Nil, mvBuckets = 4,
      distinctCols = Seq("c"))
    Mv.register(spark, m2)
    try {
      def q = dsv2(b2).groupBy("g").agg(countDistinct(col("c")).as("nd"))
      assert(planOf(q).contains(s"graft-snapshot($m2/_dv/c)"), planOf(q))
      assert(rows(q) === Set(Seq("a", 0L), Seq("b", 1L)))
    } finally Mv.unregister(spark, m2)
  }

  test("rollup count(DISTINCT) via the companion dedups values ACROSS groups") {
    import spark.implicits._
    val b = s"$wh/rnd5"; val m = s"$wh/rnd6"
    // the same value appears under BOTH h-groups of g='a': a per-group
    // digest (the companion's merge key) would count it twice — only
    // the value digest dedups it to 1
    Snapshots.publish(spark, b,
      Seq[(Long, String, String, Long)](
        (1L, "a", "x", 42L), (2L, "a", "y", 42L), (3L, "a", "y", 43L),
        (4L, "b", "x", 42L))
        .toDF("k", "g", "h", "c"))
    Mv.create(spark, m, b, Seq("k"), Seq("g", "h"), Nil, mvBuckets = 4,
      distinctCols = Seq("c"))
    Mv.register(spark, m)
    try {
      def q = dsv2(b).groupBy("g").agg(countDistinct(col("c")).as("nd"))
      assert(planOf(q).contains(s"graft-snapshot($m/_dv/c)"), planOf(q))
      assert(rows(q) === Set(Seq("a", 2L), Seq("b", 1L)))
      // ...and stays exact through a refresh that retracts a value
      Snapshots.mergeByKey(spark, b,
        Seq((2L, "a", "y", 42L, true), (5L, "b", "y", 44L, false))
          .toDF("k", "g", "h", "c", "__del"),
        Seq("k"), tombstoneCol = Some("__del"))
      Mv.refresh(spark, m)
      assert(planOf(q).contains(s"graft-snapshot($m/_dv/c)"), planOf(q))
      assert(rows(q) === Set(Seq("a", 2L), Seq("b", 2L)))
    } finally Mv.unregister(spark, m)
  }

  test("grouping-sets routing: ROLLUP/CUBE re-aggregate the view under the Expand, gid semantics intact") {
    import spark.implicits._
    val b = s"$wh/gs1"; val m = s"$wh/gs2"
    // a REAL NULL group value (g = null on k=5) forces the rewrite to
    // keep the NULL-marker-vs-data-NULL distinction: only the grouping
    // id separates the rolled-up row from the null-group row
    val df = Seq[(java.lang.Long, String, java.lang.Long, java.lang.Long)](
      (1L, "a", 10L, 1L), (2L, "a", 20L, 1L), (3L, "a", null, 2L),
      (4L, "b", 40L, 2L), (5L, null, 50L, 1L))
      .toDF("k", "g", "v", "c")
    Snapshots.publish(spark, b, df)
    Mv.create(spark, m, b, Seq("k"), Seq("g", "c"), Seq("v"), mvBuckets = 4,
      minMaxCols = Seq("v"), approxDistinctCols = Seq("v"))
    val mv = s"graft-snapshot($m)"
    Mv.register(spark, m)
    try {
      def roll = dsv2(b).rollup("g", "c").agg(count(lit(1)).as("n"),
        sum("v").as("s"), avg("v").as("a"), min("v").as("mn"),
        max("v").as("mx"), grouping_id().as("gid"))
      assert(planOf(roll).contains(mv), planOf(roll))
      assert(!planOf(roll).contains(s"graft-snapshot($b)"))
      // value-identical to the same rollup over the raw frame — every
      // compensation arm (count/sum/avg/min/max) plus the gid column
      assert(rows(roll) === rows(df.rollup("g", "c").agg(
        count(lit(1)).as("n"), sum("v").as("s"), avg("v").as("a"),
        min("v").as("mn"), max("v").as("mx"), grouping_id().as("gid"))))
      // CUBE and grouping() projections route the same way (grouping()
      // only reads the gid slot the rewrite preserves)
      def cub = dsv2(b).cube("g", "c").agg(count(lit(1)).as("n"),
        grouping(col("g")).as("gg"))
      assert(planOf(cub).contains(mv), planOf(cub))
      assert(rows(cub) === rows(df.cube("g", "c").agg(count(lit(1)).as("n"),
        grouping(col("g")).as("gg"))))
      // the approx-distinct sketch UNIONS per grouping set (conf-gated
      // estimator swap, exact at this size)
      def apx = dsv2(b).rollup("g").agg(approx_count_distinct("v").as("nd"))
      assert(planOf(apx).contains(mv), planOf(apx))
      assert(rows(apx) ===
        rows(df.rollup("g").agg(approx_count_distinct("v").as("nd"))))
      // a predicate routes with the rollup when the residual admits
      def filt = dsv2(b).where("g = 'a'").rollup("g", "c").agg(sum("v").as("s"))
      assert(planOf(filt).contains(mv), planOf(filt))
      assert(rows(filt) ===
        rows(df.where("g = 'a'").rollup("g", "c").agg(sum("v").as("s"))))
      // a non-view grouping column declines the WHOLE rewrite — never a
      // half-routed Expand
      assert(!planOf(dsv2(b).rollup("g", "k").agg(count(lit(1)))).contains(mv))
      // count(DISTINCT) under grouping sets declines on THIS view — it
      // maintains no distinct companion for v (the companion-backed
      // route is pinned in its own test below)
      assert(!planOf(dsv2(b).rollup("g").agg(countDistinct(col("v"))))
        .contains(mv))
      // SQL GROUPING SETS — including a DUPLICATE set, whose
      // disambiguation column is one more all-literal slot the rewrite
      // copies verbatim — lowers to the same Expand and routes
      dsv2(b).createOrReplaceTempView("gs_t")
      def gsq = spark.sql(
        "SELECT g, count(1) AS n, sum(v) AS s FROM gs_t " +
          "GROUP BY GROUPING SETS ((g), (g), ())")
      assert(planOf(gsq).contains(mv), planOf(gsq))
      assert(rows(gsq) === {
        df.createOrReplaceTempView("gs_raw")
        rows(spark.sql("SELECT g, count(1) AS n, sum(v) AS s FROM gs_raw " +
          "GROUP BY GROUPING SETS ((g), (g), ())"))
      })
      // staleness bypasses the grouping-sets shape like every other
      Snapshots.mergeByKey(spark, b,
        Seq((1L, "a", 99L, 1L)).toDF("k", "g", "v", "c")
          .withColumn("__del", lit(false)),
        Seq("k"), tombstoneCol = Some("__del"))
      assert(!planOf(roll).contains(mv), planOf(roll))
    } finally Mv.unregister(spark, m)
  }

  test("grouping-sets count(DISTINCT) routes through per-set companion rewrites") {
    import spark.implicits._
    val b = s"$wh/gd1"; val m = s"$wh/gd2"
    // duplicate v within a group, the same v across groups (the
    // cross-group dedup), an all-NULL-v group (distinct 0), a real NULL
    // group value — every distinct edge in one frame
    val df = Seq[(java.lang.Long, String, java.lang.Long, java.lang.Long)](
      (1L, "a", 10L, 1L), (2L, "a", 10L, 1L), (3L, "a", null, 2L),
      (4L, "b", 10L, 2L), (5L, "b", 20L, 2L), (6L, null, 30L, 1L),
      (7L, "c", null, 1L), (8L, "c", null, 1L))
      .toDF("k", "g", "v", "c")
    Snapshots.publish(spark, b, df)
    Mv.create(spark, m, b, Seq("k"), Seq("g", "c"), Seq("v"), mvBuckets = 4,
      distinctCols = Seq("v"))
    val mv = s"graft-snapshot($m)"
    Mv.register(spark, m)
    try {
      // ROLLUP with count(DISTINCT) beside plain aggregates: each
      // grouping set becomes its own build() — stored nd at the exact
      // set, the _dv companion join at coarser ones — stitched by Union
      def roll = dsv2(b).rollup("g", "c").agg(
        countDistinct(col("v")).as("nd"), count(lit(1)).as("n"),
        sum("v").as("s"), grouping_id().as("gid"))
      assert(planOf(roll).contains(mv), planOf(roll))
      assert(planOf(roll).contains(s"graft-snapshot($m/_dv/v)"), planOf(roll))
      assert(!planOf(roll).contains(s"graft-snapshot($b)"))
      assert(rows(roll) === rows(df.rollup("g", "c").agg(
        countDistinct(col("v")).as("nd"), count(lit(1)).as("n"),
        sum("v").as("s"), grouping_id().as("gid"))))
      // CUBE too, with a grouping() projection riding the per-set
      // literal substitution
      def cub = dsv2(b).cube("g", "c").agg(countDistinct(col("v")).as("nd"),
        grouping(col("g")).as("gg"))
      assert(planOf(cub).contains(mv), planOf(cub))
      assert(rows(cub) === rows(df.cube("g", "c").agg(
        countDistinct(col("v")).as("nd"), grouping(col("g")).as("gg"))))
      // a group-column drill-down composes with the union shape (the
      // residual re-applies inside every per-set build)
      def fr = dsv2(b).where("c = 1").rollup("g")
        .agg(countDistinct(col("v")).as("nd"))
      assert(planOf(fr).contains(mv), planOf(fr))
      assert(rows(fr) === rows(df.where("c = 1").rollup("g")
        .agg(countDistinct(col("v")).as("nd"))))
      // staleness bypasses the union shape like every other
      Snapshots.mergeByKey(spark, b,
        Seq((1L, "a", 99L, 1L)).toDF("k", "g", "v", "c")
          .withColumn("__del", lit(false)),
        Seq("k"), tombstoneCol = Some("__del"))
      assert(!planOf(roll).contains(mv), planOf(roll))
      assert(rows(roll) === rows(df.filter(col("k") =!= 1L)
        .union(Seq((1L, "a", java.lang.Long.valueOf(99L), 1L))
          .toDF("k", "g", "v", "c"))
        .rollup("g", "c").agg(
          countDistinct(col("v")).as("nd"), count(lit(1)).as("n"),
          sum("v").as("s"), grouping_id().as("gid"))))
    } finally Mv.unregister(spark, m)
  }

  test("grouping-sets routing over STAR views: the join and trilinear rollup dashboards route") {
    import spark.implicits._
    // 2-table star — the canonical ROLLUP(seg, m) dashboard over
    // fact ⋈ dim answered by a join view grouped on both
    val f = s"$wh/gsjf"; val dm = s"$wh/gsjd"; val m = s"$wh/gsjm"
    Snapshots.publish(spark, f,
      Seq((1L, 10L, 1L, 100L), (2L, 10L, 2L, 200L), (3L, 11L, 1L, 300L))
        .toDF("k", "ck", "m", "cents"), clusterBy = Some("bucket(4, ck)"))
    Snapshots.publish(spark, dm, Seq((10L, "a"), (11L, "b")).toDF("ck2", "seg"),
      clusterBy = Some("bucket(4, ck2)"))
    Mv.createJoin(spark, m, f, Seq("k"), "ck", dm, Seq("ck2"), "ck2",
      Seq("seg", "m"), Seq("cents"), mvBuckets = 4)
    val mv = s"graft-snapshot($m)"
    def joined = dsv2(f).join(dsv2(dm), col("ck") === col("ck2"))
    def roll = joined.rollup(col("seg"), col("m")).agg(count(lit(1)).as("n"),
      sum("cents").as("s"), grouping_id().as("gid"))
    val want = rows(roll)
    Mv.register(spark, m)
    try {
      assert(planOf(roll).contains(mv), planOf(roll))
      assert(!planOf(roll).contains(s"graft-snapshot($f)"),
        "the routed rollup must not scan the fact")
      assert(rows(roll) === want)
      // a stale pair bypasses the grouping-sets shape too
      Snapshots.mergeByKey(spark, dm,
        Seq((11L, "c", false)).toDF("ck2", "seg", "__del"),
        Seq("ck2"), tombstoneCol = Some("__del"))
      assert(!planOf(roll).contains(mv), planOf(roll))
      Mv.refreshJoin(spark, m)
      assert(planOf(roll).contains(mv))
    } finally Mv.unregister(spark, m)
    // trilinear star — CUBE over dim ⋈ fact ⋈ dim
    val l3 = s"$wh/gs3l"; val f3 = s"$wh/gs3f"; val r3 = s"$wh/gs3r"
    val m3 = s"$wh/gs3m"
    Snapshots.publish(spark, l3, Seq((10L, "a"), (11L, "b")).toDF("ck2", "seg"),
      clusterBy = Some("bucket(4, ck2)"))
    Snapshots.publish(spark, f3,
      Seq((1L, 10L, 1L, 100L), (2L, 10L, 2L, 200L), (3L, 11L, 1L, 300L))
        .toDF("k", "ck", "prio", "cents"), clusterBy = Some("bucket(4, ck)"))
    Snapshots.publish(spark, r3, Seq((1L, "hi"), (2L, "lo")).toDF("pr", "plabel"),
      clusterBy = Some("pr"))
    Mv.createJoin3(spark, m3, l3, Seq("ck2"), "ck2",
      f3, Seq("k"), "ck", "prio", r3, Seq("pr"), "pr",
      Seq("seg", "plabel"), Seq("cents"), mvBuckets = 4)
    def cub = dsv2(l3).join(dsv2(f3), col("ck2") === col("ck"))
      .join(dsv2(r3), col("prio") === col("pr"))
      .cube(col("seg"), col("plabel"))
      .agg(count(lit(1)).as("n"), sum("cents").as("s"))
    val want3 = rows(cub)
    Mv.register(spark, m3)
    try {
      assert(planOf(cub).contains(s"graft-snapshot($m3)"), planOf(cub))
      assert(!planOf(cub).contains(s"graft-snapshot($f3)"))
      assert(rows(cub) === want3)
    } finally Mv.unregister(spark, m3)
  }

  test("a non-deterministic residual conjunct declines the route") {
    val b = s"$wh/rdet1"; val m = s"$wh/rdet2"
    Snapshots.publish(spark, b, base(Seq(
      (1L, "a", 10L, 1L), (2L, "b", 20L, 2L))))
    Mv.create(spark, m, b, Seq("k"), Seq("g"), Seq("v"), mvBuckets = 4)
    Mv.register(spark, m)
    try {
      // rand() references no columns, so the reference check alone is
      // vacuously satisfied — but the predicate evaluates once per base
      // ROW unrouted and once per view GROUP routed; it must bypass.
      // (0.5, not a tautological bound — the optimizer knows rand's
      // range and folds `rand < 2` away entirely)
      def q = dsv2(b).where(rand(7) < 0.5).groupBy("g").agg(sum("v").as("s"))
      assert(!planOf(q).contains(s"graft-snapshot($m)"), planOf(q))
      // the deterministic control still routes
      assert(planOf(dsv2(b).where("g = 'a'").groupBy("g").agg(sum("v").as("s")))
        .contains(s"graft-snapshot($m)"))
      // a subquery-bearing predicate declines too: predicate subqueries
      // are unrewritten in this optimizer batch, and a correlated one
      // cannot re-bind its OuterReferences to the view — conservative
      // bypass for the whole class
      import spark.implicits._
      dsv2(b).createOrReplaceTempView("rdet_t")
      Seq((1L, "a")).toDF("kk", "gg").createOrReplaceTempView("rdet_u")
      val qs = spark.sql(
        "SELECT g, sum(v) AS s FROM rdet_t WHERE g IN (SELECT gg FROM rdet_u) GROUP BY g")
      assert(!planOf(qs).contains(s"graft-snapshot($m)"), planOf(qs))
      assert(rows(qs) === Set(Seq("a", 10L)))
    } finally Mv.unregister(spark, m)
  }

  test("range implication: a tighter literal bound routes with the bound as residual") {
    import spark.implicits._
    val b = s"$wh/rri1"; val m = s"$wh/rri2"; val m2 = s"$wh/rri3"
    Snapshots.publish(spark, b,
      Seq[(Long, Long, String, Long)](
        (1L, 50L, "a", 10L), (2L, 100L, "a", 20L), (3L, 150L, "a", 30L),
        (4L, 200L, "b", 40L))
        .toDF("k", "d", "g", "v"))
    Mv.create(spark, m, b, Seq("k"), Seq("d", "g"), Seq("v"), mvBuckets = 4,
      where = Some("d >= 100"))
    val mv = s"graft-snapshot($m)"
    Mv.register(spark, m)
    try {
      // query bound tighter than the view's bar on the same group
      // column: `d >= 150` implies `d >= 100`, rides as residual
      def tight = dsv2(b).where("d >= 150").groupBy("g").agg(sum("v").as("s"))
      assert(planOf(tight).contains(mv), planOf(tight))
      assert(!planOf(tight).contains(s"graft-snapshot($b)"))
      assert(rows(tight) === Set(Seq("a", 30L), Seq("b", 40L)))
      // a STRICT tighter bound implies the non-strict bar too
      def strict = dsv2(b).where("d > 100").groupBy("g").agg(sum("v").as("s"))
      assert(planOf(strict).contains(mv), planOf(strict))
      assert(rows(strict) === Set(Seq("a", 30L), Seq("b", 40L)))
      // ...and composes with a group-column drill-down conjunct
      def drill = dsv2(b).where("d >= 150 AND g = 'a'")
        .groupBy("g").agg(sum("v").as("s"))
      assert(planOf(drill).contains(mv), planOf(drill))
      assert(rows(drill) === Set(Seq("a", 30L)))
      // a LOOSER bound wants rows the view dropped — bypass
      def loose = dsv2(b).where("d >= 50").groupBy("g").agg(sum("v").as("s"))
      assert(!planOf(loose).contains(mv), planOf(loose))
      assert(rows(loose) === Set(Seq("a", 60L), Seq("b", 40L)))
      // a bound on a DIFFERENT column never implies
      assert(!planOf(dsv2(b).where("v >= 100").groupBy("g").agg(sum("v")))
        .contains(mv))
      // a non-literal bound never implies
      assert(!planOf(dsv2(b).where(col("d") >= col("k") + 100)
        .groupBy("g").agg(sum("v"))).contains(mv))
      // EQUALITY implication: the point-day drill-down `d = 150`
      // satisfies the bar and routes with the point as residual
      def pt = dsv2(b).where("d = 150").groupBy("g").agg(sum("v").as("s"))
      assert(planOf(pt).contains(mv), planOf(pt))
      assert(rows(pt) === Set(Seq("a", 30L)))
      // the boundary point satisfies a NON-STRICT bar
      def ptb = dsv2(b).where("d = 100").groupBy("g").agg(sum("v").as("s"))
      assert(planOf(ptb).contains(mv), planOf(ptb))
      assert(rows(ptb) === Set(Seq("a", 20L)))
      // a below-bar point declines
      assert(!planOf(dsv2(b).where("d = 50").groupBy("g").agg(sum("v")))
        .contains(mv))
      // IN-list: every element at-or-above the bar routes...
      def inl = dsv2(b).where("d IN (150, 200)").groupBy("g")
        .agg(sum("v").as("s"))
      assert(planOf(inl).contains(mv), planOf(inl))
      assert(rows(inl) === Set(Seq("a", 30L), Seq("b", 40L)))
      // ...one below-bar element declines the whole list
      assert(!planOf(dsv2(b).where("d IN (50, 150)").groupBy("g")
        .agg(sum("v"))).contains(mv))
      // a list long enough for the optimizer's InSet conversion still
      // implies element-wise
      def ins = dsv2(b).where(
        "d IN (110,115,120,125,130,135,140,145,150,155,160)")
        .groupBy("g").agg(sum("v").as("s"))
      assert(planOf(ins).contains(mv), planOf(ins))
      assert(rows(ins) === Set(Seq("a", 30L)))
    } finally Mv.unregister(spark, m)
    // the UPPER-bound shapes: view barred at `d <= 150`
    Mv.create(spark, m2, b, Seq("k"), Seq("d", "g"), Seq("v"), mvBuckets = 4,
      where = Some("d <= 150"))
    Mv.register(spark, m2)
    try {
      def lt = dsv2(b).where("d < 120").groupBy("g").agg(sum("v").as("s"))
      assert(planOf(lt).contains(s"graft-snapshot($m2)"), planOf(lt))
      assert(rows(lt) === Set(Seq("a", 30L)))
      // `d <= 150` does NOT imply a view barred `d < 150` — but here the
      // view's bar is non-strict, so the equal bound matches verbatim
      // and the LOOSER `d <= 200` still bypasses
      assert(!planOf(dsv2(b).where("d <= 200").groupBy("g").agg(sum("v")))
        .contains(s"graft-snapshot($m2)"))
    } finally Mv.unregister(spark, m2)
    // a STRICT bar: the boundary point does NOT satisfy `d > 100`
    val m3 = s"$wh/rri4"
    Mv.create(spark, m3, b, Seq("k"), Seq("d", "g"), Seq("v"), mvBuckets = 4,
      where = Some("d > 100"))
    Mv.register(spark, m3)
    try {
      assert(!planOf(dsv2(b).where("d = 100").groupBy("g").agg(sum("v")))
        .contains(s"graft-snapshot($m3)"))
      def pt3 = dsv2(b).where("d = 150").groupBy("g").agg(sum("v").as("s"))
      assert(planOf(pt3).contains(s"graft-snapshot($m3)"), planOf(pt3))
      assert(rows(pt3) === Set(Seq("a", 30L)))
    } finally Mv.unregister(spark, m3)
  }

  test("join-MV time-unit grouping: the star daily rollup routes to a days(ts) view") {
    import spark.implicits._
    val f = s"$wh/rjt_f"; val dm = s"$wh/rjt_d"; val m = s"$wh/rjt_m"
    Snapshots.publish(spark, f,
      Seq((1L, 10L, "2024-03-01 01:00:00", 100L), (2L, 10L, "2024-03-02 05:00:00", 200L),
        (3L, 11L, "2024-03-01 09:00:00", 300L))
        .toDF("k", "ck", "ts", "cents").withColumn("ts", to_timestamp(col("ts"))),
      clusterBy = Some("bucket(4, ck)"))
    Snapshots.publish(spark, dm, Seq((10L, "a"), (11L, "b")).toDF("ck2", "seg"),
      clusterBy = Some("bucket(4, ck2)"))
    Mv.createJoin(spark, m, f, Seq("k"), "ck", dm, Seq("ck2"), "ck2",
      Seq("seg", "days(ts)"), Seq("cents"), mvBuckets = 4)
    val mv = s"graft-snapshot($m)"
    Mv.register(spark, m)
    try {
      // exact grouping: (seg, the engine's days transform over the
      // FACT's time column) — the pulled-out grouping Project sits
      // above the join; the matcher resolves through it
      def q = dsv2(f).join(dsv2(dm), col("ck") === col("ck2"))
        .groupBy(col("seg"), Mv.timeGroup("days", "ts").as("d"))
        .agg(count(lit(1)).as("n"), sum("cents").as("s"))
      assert(planOf(q).contains(mv), planOf(q))
      assert(!planOf(q).contains(s"graft-snapshot($f)"), planOf(q))
      assert(rows(q) === Set(Seq("a", 19783, 1L, 100L), Seq("a", 19784, 1L, 200L),
        Seq("b", 19783, 1L, 300L)))
      // rollup to the day alone, and to the dim column alone
      def byDay = dsv2(f).join(dsv2(dm), col("ck") === col("ck2"))
        .groupBy(Mv.timeGroup("days", "ts").as("d")).agg(sum("cents").as("s"))
      assert(planOf(byDay).contains(mv), planOf(byDay))
      assert(rows(byDay) === Set(Seq(19783, 400L), Seq(19784, 200L)))
      assert(planOf(dsv2(f).join(dsv2(dm), col("ck") === col("ck2"))
        .groupBy("seg").agg(sum("cents").as("s"))).contains(mv))
      // the time-windowed drill-down: a residual over the UNIT routes
      def drill = dsv2(f).join(dsv2(dm), col("ck") === col("ck2"))
        .where(Mv.timeGroup("days", "ts") >= lit(19784))
        .groupBy(col("seg"), Mv.timeGroup("days", "ts").as("d"))
        .agg(sum("cents").as("s"))
      assert(planOf(drill).contains(mv), planOf(drill))
      assert(rows(drill) === Set(Seq("a", 19784, 200L)))
      // a RAW time predicate bypasses (ts is not constant within a day)
      assert(!planOf(dsv2(f).join(dsv2(dm), col("ck") === col("ck2"))
        .where(col("ts") >= lit("2024-03-02 00:00:00"))
        .groupBy(Mv.timeGroup("days", "ts")).agg(sum("cents").as("s")))
        .contains(mv))
      // maintenance from the FACT feed moves a row ACROSS days; the
      // stale pair bypasses, the refreshed view routes the new truth
      Snapshots.mergeByKey(spark, f,
        Seq((2L, 10L, "2024-03-03 02:00:00", 250L)).toDF("k", "ck", "ts", "cents")
          .withColumn("ts", to_timestamp(col("ts")))
          .withColumn("__del", lit(false)),
        Seq("k"), tombstoneCol = Some("__del"))
      assert(!planOf(q).contains(mv), "a stale pair must never answer")
      Mv.refreshJoin(spark, m)
      assert(planOf(q).contains(mv), planOf(q))
      assert(rows(q) === Set(Seq("a", 19783, 1L, 100L), Seq("a", 19785, 1L, 250L),
        Seq("b", 19783, 1L, 300L)))
      // ...and from the DIM feed (a relabel moves whole groups)
      Snapshots.mergeByKey(spark, dm,
        Seq((11L, "c", false)).toDF("ck2", "seg", "__del"),
        Seq("ck2"), tombstoneCol = Some("__del"))
      Mv.refreshJoin(spark, m)
      assert(rows(q).contains(Seq("c", 19783, 1L, 300L)))
    } finally Mv.unregister(spark, m)
  }

  test("frozen directory mtimes: publish still flips plan-time freshness") {
    import spark.implicits._
    spark.sparkContext.hadoopConfiguration.set("fs.graftfroz.impl",
      classOf[graft.sources.FrozenMtimeFileSystem].getName)
    def flipTest(tag: String, frozenAt: Long): Unit = {
      graft.sources.FrozenMtimeFileSystem.mtime = frozenAt
      val b = s"graftfroz://$wh/fz_b_$tag"; val m = s"graftfroz://$wh/fz_m_$tag"
      Snapshots.publish(spark, b, base(Seq((1L, "a", 10L, 1L), (2L, "b", 20L, 2L))))
      Mv.create(spark, m, b, Seq("k"), Seq("g"), Seq("v"), mvBuckets = 4)
      Mv.register(spark, m)
      try {
        def q = dsv2(b).groupBy("g").agg(sum("v").as("s"))
        // plan twice so any cacheable stamp IS cached before the publish
        assert(planOf(q).contains(s"graft-snapshot($m)"))
        assert(planOf(q).contains(s"graft-snapshot($m)"))
        Snapshots.mergeByKey(spark, b,
          Seq((1L, "a", 99L, 1L)).toDF("k", "g", "v", "c")
            .withColumn("__del", lit(false)),
          Seq("k"), tombstoneCol = Some("__del"))
        // the dir stamp did NOT move — a stamp-keyed cache would serve
        // the pre-publish listing and keep routing to the stale view
        assert(!planOf(q).contains(s"graft-snapshot($m)"),
          s"[$tag] a publish under constant dir mtimes must still flip freshness")
        assert(rows(q).contains(Seq("a", 99L)))
      } finally Mv.unregister(spark, m)
    }
    // mtime 0: the "store keeps no dir stamps" shape — never cached
    flipTest("zero", 0L)
    // a constant NONZERO old stamp: cacheable, so only the publish-side
    // invalidation can flip same-driver freshness
    flipTest("const", 1000000L)
    // SECOND-DRIVER staleness under the harshest store: dirs frozen AND
    // the `_epoch` object's mtime frozen — only the epoch's
    // length-growth channel can flip a foreign driver's stamp. Driver B
    // (which cached pre-publish and never saw the in-process
    // invalidation) is simulated by re-inserting the captured cache
    // entries after the publish.
    graft.sources.FrozenMtimeFileSystem.mtime = 1000000L
    graft.sources.FrozenMtimeFileSystem.freezeEpochFile = true
    try {
      val b = s"graftfroz://$wh/fz_b_2d"; val m = s"graftfroz://$wh/fz_m_2d"
      Snapshots.publish(spark, b, base(Seq((1L, "a", 10L, 1L), (2L, "b", 20L, 2L))))
      Mv.create(spark, m, b, Seq("k"), Seq("g"), Seq("v"), mvBuckets = 4)
      Mv.register(spark, m)
      try {
        def q = dsv2(b).groupBy("g").agg(sum("v").as("s"))
        assert(planOf(q).contains(s"graft-snapshot($m)"))
        val prePublish = new java.util.HashMap(Snapshots.versionsCacheForTest)
        Snapshots.mergeByKey(spark, b,
          Seq((1L, "a", 99L, 1L)).toDF("k", "g", "v", "c")
            .withColumn("__del", lit(false)),
          Seq("k"), tombstoneCol = Some("__del"))
        Snapshots.versionsCacheForTest.clear()
        Snapshots.versionsCacheForTest.putAll(prePublish)
        assert(!planOf(q).contains(s"graft-snapshot($m)"),
          "a second driver's cached stamp must flip on the epoch's length growth")
        assert(rows(q).contains(Seq("a", 99L)))
      } finally Mv.unregister(spark, m)
    } finally graft.sources.FrozenMtimeFileSystem.freezeEpochFile = false
  }

  test("filtered-view routing: a semantically equal predicate answers, others bypass") {
    import spark.implicits._
    val b = s"$wh/rb6"; val m = s"$wh/rm6"
    Snapshots.publish(spark, b, base(Seq(
      (1L, "a", 10L, 1L), (2L, "a", 200L, 2L), (3L, "b", 300L, 3L),
      (4L, "b", 5L, 4L))))
    Mv.create(spark, m, b, Seq("k"), Seq("g"), Seq("v"), mvBuckets = 4,
      where = Some("v >= 100"))
    val mv = s"graft-snapshot($m)"
    def q(pred: String) = dsv2(b).where(pred).groupBy("g").agg(sum("v").as("s"))
    val want = rows(q("v >= 100"))
    Mv.register(spark, m)
    try {
      assert(planOf(q("v >= 100")).contains(mv), planOf(q("v >= 100")))
      assert(rows(q("v >= 100")) === want)
      // the same predicate written differently still matches semantically
      assert(planOf(q("100 <= v")).contains(mv), planOf(q("100 <= v")))
      assert(rows(q("100 <= v")) === want)
      // a different predicate bypasses; so does the unfiltered scan
      assert(!planOf(q("v >= 101")).contains(mv))
      assert(!planOf(dsv2(b).groupBy("g").agg(sum("v"))).contains(mv))
      // rollup composes with the filter match (global over the view)
      val g = dsv2(b).where("v >= 100").agg(sum("v").as("s"))
      assert(planOf(g).contains(mv), planOf(g))
      assert(rows(g) === Set(Seq(500L)))
    } finally Mv.unregister(spark, m)
  }

  test("implication routing: a residual on a group column filters OVER the view") {
    import spark.implicits._
    val b = s"$wh/rb7"; val m = s"$wh/rm7"
    Snapshots.publish(spark, b,
      Seq[(Long, String, String, java.lang.Long)](
        (1L, "a", "x", 10L), (2L, "a", "y", 200L), (3L, "b", "x", 300L),
        (4L, "b", "y", 5L), (5L, "a", "x", 400L))
        .toDF("k", "g", "h", "v"))
    Mv.create(spark, m, b, Seq("k"), Seq("g", "h"), Seq("v"), mvBuckets = 4,
      where = Some("v >= 100"))
    val mv = s"graft-snapshot($m)"
    Mv.register(spark, m)
    try {
      // the drill-down: query = the view's bar AND a group-column
      // conjunct → Filter(g='a') over the view, values exact
      def drill = dsv2(b).where("v >= 100 AND g = 'a'")
        .groupBy("g", "h").agg(sum("v").as("s"), count(lit(1)).as("n"))
      assert(planOf(drill).contains(mv), planOf(drill))
      assert(!planOf(drill).contains(s"graft-snapshot($b)"))
      assert(rows(drill) === Set(Seq("a", "y", 200L, 1L), Seq("a", "x", 400L, 1L)))
      // residual composes with ROLLUP: filter by h (a view group column
      // NOT in the query's grouping), group by g — |groups| view rows
      def roll = dsv2(b).where("v >= 100 AND h = 'x'")
        .groupBy("g").agg(sum("v").as("s"))
      assert(planOf(roll).contains(mv), planOf(roll))
      assert(rows(roll) === Set(Seq("a", 400L), Seq("b", 300L)))
      // the query WEAKER than the view's bar must still bypass (the
      // view already dropped rows the query wants)
      def weak = dsv2(b).where("g = 'a'").groupBy("g", "h").agg(sum("v").as("s"))
      assert(!planOf(weak).contains(mv), planOf(weak))
      assert(rows(weak).contains(Seq("a", "x", 410L)))
      // a residual on a NON-view column bypasses (k is neither grouped
      // nor stored)
      assert(!planOf(dsv2(b).where("v >= 100 AND k > 1")
        .groupBy("g", "h").agg(sum("v").as("s"))).contains(mv))
    } finally Mv.unregister(spark, m)
  }

  test("implication routing over an UNFILTERED view: group-column predicates route") {
    val b = s"$wh/rb8"; val m = s"$wh/rm8"
    Snapshots.publish(spark, b, base(Seq(
      (1L, "a", 10L, 1L), (2L, "a", 20L, 2L), (3L, "b", 30L, 3L),
      (4L, null, 40L, 4L))))
    Mv.create(spark, m, b, Seq("k"), Seq("g"), Seq("v"), mvBuckets = 4)
    val mv = s"graft-snapshot($m)"
    Mv.register(spark, m)
    try {
      // an unfiltered view answers a group-column-filtered query with a
      // residual Filter — including the inference-injected IsNotNull(g)
      // the optimizer adds below the aggregate
      def q = dsv2(b).where("g = 'a'").groupBy("g").agg(sum("v").as("s"))
      assert(planOf(q).contains(mv), planOf(q))
      assert(!planOf(q).contains(s"graft-snapshot($b)"))
      assert(rows(q) === Set(Seq("a", 30L)))
      // IN-list predicates route too (null-intolerant residual)
      def qin = dsv2(b).where("g IN ('a','b')").groupBy("g").agg(sum("v").as("s"))
      assert(planOf(qin).contains(mv), planOf(qin))
      assert(rows(qin) === Set(Seq("a", 30L), Seq("b", 30L)))
      // a measure-column predicate still bypasses
      assert(!planOf(dsv2(b).where("v > 15").groupBy("g").agg(sum("v").as("s")))
        .contains(mv))
    } finally Mv.unregister(spark, m)
  }

  test("join-MV routing: the star aggregate reads the view; a stale pair bypasses") {
    import spark.implicits._
    val f = s"$wh/rjf"; val dm = s"$wh/rjd"; val m = s"$wh/rjm"
    Snapshots.publish(spark, f,
      Seq((1L, 10L, 100L), (2L, 10L, 200L), (3L, 11L, 300L))
        .toDF("k", "ck", "cents"), clusterBy = Some("bucket(4, ck)"))
    Snapshots.publish(spark, dm, Seq((10L, "a"), (11L, "b")).toDF("ck2", "seg"),
      clusterBy = Some("bucket(4, ck2)"))
    Mv.createJoin(spark, m, f, Seq("k"), "ck", dm, Seq("ck2"), "ck2",
      Seq("seg"), Seq("cents"), mvBuckets = 4)
    val mv = s"graft-snapshot($m)"
    def q = dsv2(f).join(dsv2(dm), col("ck") === col("ck2"))
      .groupBy("seg").agg(count(lit(1)).as("n"), sum("cents").as("s"))
    val want = rows(q)
    Mv.register(spark, m)
    try {
      assert(planOf(q).contains(mv), planOf(q))
      assert(!planOf(q).contains(s"graft-snapshot($f)"),
        "the routed plan must not scan the fact")
      assert(rows(q) === want)
      // the GLOBAL rollup over the join routes too
      def g = dsv2(f).join(dsv2(dm), col("ck") === col("ck2"))
        .agg(sum("cents").as("s"))
      assert(planOf(g).contains(mv), planOf(g))
      assert(rows(g) === Set(Seq(600L)))
      // swapped sides still match (roots and keys compare as sets)
      def qs = dsv2(dm).join(dsv2(f), col("ck2") === col("ck"))
        .groupBy("seg").agg(sum("cents").as("s"))
      assert(planOf(qs).contains(mv), planOf(qs))
      // one side mutates: the watermark PAIR is stale → bypass with the
      // new truth; refreshJoin re-enables
      Snapshots.mergeByKey(spark, dm,
        Seq((11L, "c", false)).toDF("ck2", "seg", "__del"),
        Seq("ck2"), tombstoneCol = Some("__del"))
      assert(!planOf(q).contains(mv), "a stale pair must never answer")
      assert(rows(q).contains(Seq("c", 1L, 300L)))
      Mv.refreshJoin(spark, m)
      assert(planOf(q).contains(mv))
      assert(rows(q).contains(Seq("c", 1L, 300L)))
      // a different join key bypasses
      def bad = dsv2(f).join(dsv2(dm), col("k") === col("ck2"))
        .groupBy("seg").agg(sum("cents").as("s"))
      assert(!planOf(bad).contains(mv))
    } finally Mv.unregister(spark, m)
  }

  test("filtered join-MV routing: a pushed single-sided conjunct recombines and matches") {
    import spark.implicits._
    val f = s"$wh/rjf2"; val dm = s"$wh/rjd2"; val m = s"$wh/rjm2"
    Snapshots.publish(spark, f,
      Seq((1L, 10L, 100L), (2L, 10L, 200L), (3L, 11L, 300L))
        .toDF("k", "ck", "cents"), clusterBy = Some("bucket(4, ck)"))
    Snapshots.publish(spark, dm, Seq((10L, "a"), (11L, "b")).toDF("ck2", "seg"),
      clusterBy = Some("bucket(4, ck2)"))
    Mv.createJoin(spark, m, f, Seq("k"), "ck", dm, Seq("ck2"), "ck2",
      Seq("seg"), Seq("cents"), mvBuckets = 4, where = Some("cents >= 150"))
    val mv = s"graft-snapshot($m)"
    def q(pred: String) = dsv2(f).join(dsv2(dm), col("ck") === col("ck2"))
      .where(pred).groupBy("seg").agg(sum("cents").as("s"))
    val want = rows(q("cents >= 150"))
    Mv.register(spark, m)
    try {
      // the optimizer pushes the fact-only predicate BELOW the join —
      // the matcher recombines it and the view answers
      assert(planOf(q("cents >= 150")).contains(mv), planOf(q("cents >= 150")))
      assert(rows(q("cents >= 150")) === want)
      // a different predicate, and the unfiltered join, both bypass
      assert(!planOf(q("cents >= 151")).contains(mv))
      assert(!planOf(dsv2(f).join(dsv2(dm), col("ck") === col("ck2"))
        .groupBy("seg").agg(sum("cents").as("s"))).contains(mv))
      // the JOIN drill-down: the view's bar AND a group-column residual
      // routes as Filter(seg='b') over the join view
      def qd = dsv2(f).join(dsv2(dm), col("ck") === col("ck2"))
        .where("cents >= 150 AND seg = 'b'")
        .groupBy("seg").agg(sum("cents").as("s"))
      assert(planOf(qd).contains(mv), planOf(qd))
      assert(!planOf(qd).contains(s"graft-snapshot($f)"))
      assert(rows(qd) === Set(Seq("b", 300L)))
      // a drill-down on a FACT (non-group) column still bypasses
      assert(!planOf(dsv2(f).join(dsv2(dm), col("ck") === col("ck2"))
        .where("cents >= 150 AND k > 1")
        .groupBy("seg").agg(sum("cents").as("s"))).contains(mv))
    } finally Mv.unregister(spark, m)
  }

  test("trilinear routing: the dim-fact-dim star routes fresh, any tree shape; stale triple bypasses") {
    import spark.implicits._
    val l = s"$wh/r3l"; val f = s"$wh/r3f"; val r3 = s"$wh/r3r"; val m = s"$wh/r3m"
    Snapshots.publish(spark, l, Seq((10L, "a"), (11L, "b")).toDF("ck2", "seg"),
      clusterBy = Some("bucket(4, ck2)"))
    Snapshots.publish(spark, f,
      Seq((1L, 10L, 1L, 100L), (2L, 10L, 2L, 200L), (3L, 11L, 1L, 300L))
        .toDF("k", "ck", "prio", "cents"), clusterBy = Some("bucket(4, ck)"))
    Snapshots.publish(spark, r3, Seq((1L, "hi"), (2L, "lo")).toDF("pr", "plabel"),
      clusterBy = Some("pr"))
    Mv.createJoin3(spark, m, l, Seq("ck2"), "ck2",
      f, Seq("k"), "ck", "prio", r3, Seq("pr"), "pr",
      Seq("seg", "plabel"), Seq("cents"), mvBuckets = 4)
    val mv = s"graft-snapshot($m)"
    def q = dsv2(l).join(dsv2(f), col("ck2") === col("ck"))
      .join(dsv2(r3), col("prio") === col("pr"))
      .groupBy("seg", "plabel").agg(count(lit(1)).as("n"), sum("cents").as("s"))
    val want = rows(q)
    Mv.register(spark, m)
    try {
      assert(planOf(q).contains(mv), planOf(q))
      assert(!planOf(q).contains(s"graft-snapshot($f)"))
      assert(rows(q) === want)
      // a DIFFERENT association/side order still matches (sets compare)
      def q2 = dsv2(r3).join(dsv2(f).join(dsv2(l), col("ck") === col("ck2")),
        col("pr") === col("prio"))
        .groupBy("seg", "plabel").agg(sum("cents").as("s"))
      assert(planOf(q2).contains(mv), planOf(q2))
      // rollup to one dim routes as a re-aggregation
      def qr = dsv2(l).join(dsv2(f), col("ck2") === col("ck"))
        .join(dsv2(r3), col("prio") === col("pr"))
        .groupBy("seg").agg(sum("cents").as("s"))
      assert(planOf(qr).contains(mv), planOf(qr))
      assert(rows(qr) === Set(Seq("a", 300L), Seq("b", 300L)))
      // any base mutating makes the TRIPLE stale → bypass; refresh re-routes
      Snapshots.mergeByKey(spark, r3,
        Seq((2L, "mid", false)).toDF("pr", "plabel", "__del"),
        Seq("pr"), tombstoneCol = Some("__del"))
      assert(!planOf(q).contains(mv), "a stale triple must never answer")
      assert(rows(q).contains(Seq("a", "mid", 1L, 200L)))
      Mv.refreshJoin3(spark, m)
      assert(planOf(q).contains(mv))
      assert(rows(q).contains(Seq("a", "mid", 1L, 200L)))
    } finally Mv.unregister(spark, m)
  }

  test("filtered trilinear routing: the predicate recombines across both join levels") {
    import spark.implicits._
    val l = s"$wh/r3fl"; val f = s"$wh/r3ff"; val r3 = s"$wh/r3fr"; val m = s"$wh/r3fm"
    Snapshots.publish(spark, l, Seq((10L, "a"), (11L, "b")).toDF("ck2", "seg"),
      clusterBy = Some("bucket(4, ck2)"))
    Snapshots.publish(spark, f,
      Seq((1L, 10L, 1L, 100L), (2L, 10L, 2L, 200L), (3L, 11L, 1L, 300L))
        .toDF("k", "ck", "prio", "cents"), clusterBy = Some("bucket(4, ck)"))
    Snapshots.publish(spark, r3, Seq((1L, "hi"), (2L, "lo")).toDF("pr", "plabel"),
      clusterBy = Some("pr"))
    Mv.createJoin3(spark, m, l, Seq("ck2"), "ck2",
      f, Seq("k"), "ck", "prio", r3, Seq("pr"), "pr",
      Seq("seg", "plabel"), Seq("cents"), mvBuckets = 4,
      where = Some("cents >= 150"))
    val mv = s"graft-snapshot($m)"
    def q(pred: String) = dsv2(l).join(dsv2(f), col("ck2") === col("ck"))
      .join(dsv2(r3), col("prio") === col("pr"))
      .where(pred).groupBy("seg", "plabel").agg(sum("cents").as("s"))
    val want = rows(q("cents >= 150"))
    Mv.register(spark, m)
    try {
      // the fact-only conjunct is pushed two levels down — the matcher
      // recombines it and the filtered view answers
      assert(planOf(q("cents >= 150")).contains(mv), planOf(q("cents >= 150")))
      assert(rows(q("cents >= 150")) === want)
      assert(want === Set(Seq("a", "lo", 200L), Seq("b", "hi", 300L)))
      // a different predicate, and the unfiltered star, both bypass
      assert(!planOf(q("cents >= 151")).contains(mv))
      assert(!planOf(dsv2(l).join(dsv2(f), col("ck2") === col("ck"))
        .join(dsv2(r3), col("prio") === col("pr"))
        .groupBy("seg", "plabel").agg(sum("cents").as("s"))).contains(mv))
    } finally Mv.unregister(spark, m)
  }

  test("approx_count_distinct routes to the HLL companion — rollup included; exact nd never does") {
    import spark.implicits._
    val b = s"$wh/rax1"; val m = s"$wh/rax2"
    Snapshots.publish(spark, b,
      Seq[(Long, String, String, Long)](
        (1L, "a", "x", 10L), (2L, "a", "x", 20L), (3L, "a", "y", 20L),
        (4L, "b", "x", 30L), (5L, "b", "y", 30L))
        .toDF("k", "g", "h", "v"))
    Mv.create(spark, m, b, Seq("k"), Seq("g", "h"), Nil, mvBuckets = 4,
      approxDistinctCols = Seq("v"))
    val mv = s"graft-snapshot($m)"
    Mv.register(spark, m)
    try {
      // exact grouping: the stored sketch estimates directly
      def qx = dsv2(b).groupBy("g", "h")
        .agg(approx_count_distinct("v").as("nd"))
      assert(planOf(qx).contains(mv), planOf(qx))
      // tiny cardinalities sit in the sketch's exact (coupon) regime,
      // so the routed values equal the unrouted HLL++ ones outright
      assert(rows(qx) === Set(Seq("a", "x", 2L), Seq("a", "y", 1L),
        Seq("b", "x", 1L), Seq("b", "y", 1L)))
      // ROLLUP grouping: sketches UNION across rolled-away groups —
      // exactly what exact nd structurally cannot do
      def qr = dsv2(b).groupBy("g").agg(approx_count_distinct("v").as("nd"))
      assert(planOf(qr).contains(mv), planOf(qr))
      assert(rows(qr) === Set(Seq("a", 2L), Seq("b", 1L)))
      // count(DISTINCT) must never map to the sketch — no nd is
      // maintained here, so both groupings bypass
      assert(!planOf(dsv2(b).groupBy("g", "h").agg(countDistinct(col("v"))))
        .contains(mv))
      assert(!planOf(dsv2(b).groupBy("g").agg(countDistinct(col("v"))))
        .contains(mv))
      // an explicit non-default precision keeps its own estimator
      assert(!planOf(dsv2(b).groupBy("g")
        .agg(approx_count_distinct(col("v"), 0.01))).contains(mv))
    } finally Mv.unregister(spark, m)
  }

  test("approx_percentile routes to the KLL sketch; the conf gate pins plan-invariance") {
    import spark.implicits._
    val b = s"$wh/rkq1"; val m = s"$wh/rkq2"
    Snapshots.publish(spark, b,
      Seq[(Long, String, String, Long)](
        (1L, "a", "x", 10L), (2L, "a", "x", 20L), (3L, "a", "y", 30L),
        (4L, "b", "x", 40L), (5L, "b", "y", 50L), (6L, "b", "y", 60L))
        .toDF("k", "g", "h", "v"))
    Mv.create(spark, m, b, Seq("k"), Seq("g", "h"), Nil, mvBuckets = 4,
      approxDistinctCols = Seq("v"), approxQuantileCols = Seq("v"))
    val mv = s"graft-snapshot($m)"
    Mv.register(spark, m)
    try {
      // exact grouping: the stored sketch answers directly — and at
      // these sizes BOTH estimators sit in their exact regime, so the
      // routed values equal the unrouted ones outright
      def qx = dsv2(b).groupBy("g", "h")
        .agg(expr("approx_percentile(v, 0.5D)").as("p50"))
      assert(planOf(qx).contains(mv), planOf(qx))
      assert(rows(qx) === Set(Seq("a", "x", 10L), Seq("a", "y", 30L),
        Seq("b", "x", 40L), Seq("b", "y", 50L)))
      // rollup: sketches MERGE across rolled-away groups
      def qr = dsv2(b).groupBy("g")
        .agg(expr("approx_percentile(v, 0.5D)").as("p50"))
      assert(planOf(qr).contains(mv), planOf(qr))
      assert(rows(qr) === Set(Seq("a", 20L), Seq("b", 50L)))
      // the ARRAY-percentage form routes too — one sketch, one
      // get-quantile per element, type-exact array out (exact regime at
      // this size, so the values pin outright)
      def qa = dsv2(b).groupBy("g")
        .agg(expr("approx_percentile(v, array(0.5D, 0.9D))").as("ps"))
      assert(planOf(qa).contains(mv), planOf(qa))
      assert(rows(qa) === Set(Seq("a", Seq(20L, 30L)), Seq("b", Seq(50L, 60L))))
      // an explicit non-default accuracy keeps its own estimator —
      // scalar or array — and so does the EXACT percentile
      assert(!planOf(dsv2(b).groupBy("g")
        .agg(expr("approx_percentile(v, 0.5D, 500)"))).contains(mv))
      assert(!planOf(dsv2(b).groupBy("g")
        .agg(expr("approx_percentile(v, array(0.5D, 0.9D), 500)"))).contains(mv))
      assert(!planOf(dsv2(b).groupBy("g")
        .agg(expr("percentile(v, 0.5D)"))).contains(mv))
      // the conf gate turns OFF both estimator-swap arms (quantile AND
      // approx-distinct) without touching exact rewrites
      spark.conf.set("spark.graft.mv.routeApprox", "false")
      try {
        assert(!planOf(qr).contains(mv), planOf(qr))
        assert(!planOf(dsv2(b).groupBy("g")
          .agg(approx_count_distinct("v").as("nd"))).contains(mv))
        assert(planOf(dsv2(b).groupBy("g", "h").agg(count(lit(1)).as("n")))
          .contains(mv), "exact rewrites must survive the gate")
      } finally spark.conf.set("spark.graft.mv.routeApprox", "true")
      assert(planOf(qr).contains(mv))
    } finally Mv.unregister(spark, m)
  }

  test("routed approx_percentile over an all-NULL group returns NULL, never throws") {
    import spark.implicits._
    val b = s"$wh/kn1"; val m = s"$wh/kn2"
    // group b's quantile column is entirely NULL: the view stores
    // non-null EMPTY sketch bytes for it, and an unguarded get-quantile
    // would THROW where the unrouted approx_percentile returns NULL
    Snapshots.publish(spark, b,
      Seq[(Long, String, java.lang.Long, Long)](
        (1L, "a", 10L, 1L), (2L, "a", 20L, 1L), (3L, "b", null, 2L),
        (4L, "b", null, 2L))
        .toDF("k", "g", "v", "c"))
    Mv.create(spark, m, b, Seq("k"), Seq("g", "c"), Nil, mvBuckets = 4,
      approxQuantileCols = Seq("v"))
    val mv = s"graft-snapshot($m)"
    Mv.register(spark, m)
    try {
      // exact grouping reads the stored (empty) sketch directly
      def qx = dsv2(b).groupBy("g", "c")
        .agg(expr("approx_percentile(v, 0.5D)").as("p"))
      assert(planOf(qx).contains(mv), planOf(qx))
      assert(rows(qx) === Set(Seq("a", 1L, 10L), Seq("b", 2L, null)))
      // the rollup MERGE of b's empty sketches is still empty
      def qr = dsv2(b).groupBy("g")
        .agg(expr("approx_percentile(v, 0.5D)").as("p"))
      assert(planOf(qr).contains(mv), planOf(qr))
      assert(rows(qr) === Set(Seq("a", 10L), Seq("b", null)))
      // the array form rides the same guard: NULL array, not a throw
      def qa = dsv2(b).groupBy("g")
        .agg(expr("approx_percentile(v, array(0.25D, 0.75D))").as("ps"))
      assert(planOf(qa).contains(mv), planOf(qa))
      assert(rows(qa) === Set(Seq("a", Seq(10L, 20L)), Seq("b", null)))
    } finally Mv.unregister(spark, m)
  }

  test("time-unit grouping routes: a days(ts) view answers the engine-form daily rollup") {
    import spark.implicits._
    val b = s"$wh/rtg1"; val m = s"$wh/rtg2"
    Snapshots.publish(spark, b,
      Seq((1L, "2024-03-01 01:00:00", "a", 10L), (2L, "2024-03-01 05:00:00", "b", 20L),
        (3L, "2024-03-02 03:00:00", "a", 30L), (4L, "2024-03-03 09:00:00", "a", 40L))
        .toDF("k", "ts", "g", "v").withColumn("ts", to_timestamp(col("ts"))))
    Mv.create(spark, m, b, Seq("k"), Seq("g", "days(ts)"), Seq("v"), mvBuckets = 4)
    val mv = s"graft-snapshot($m)"
    Mv.register(spark, m)
    try {
      // exact grouping: (g, the engine's own days transform) — the
      // optimizer pulls the expression into a _groupingexpression
      // Project; the matcher resolves it back and the view answers
      def q = dsv2(b).groupBy(col("g"), Mv.timeGroup("days", "ts").as("d"))
        .agg(count(lit(1)).as("n"), sum("v").as("s"))
      val want = rows(q)
      assert(planOf(q).contains(mv), planOf(q))
      assert(!planOf(q).contains(s"graft-snapshot($b)"))
      assert(rows(q) === want)
      assert(want.contains(Seq("a", 19783, 1L, 10L))) // 2024-03-01 = epoch day 19783
      // rollup to the DAY alone — a transform group in the grouping,
      // the other rolled away
      def byDay = dsv2(b).groupBy(Mv.timeGroup("days", "ts").as("d"))
        .agg(sum("v").as("s"))
      assert(planOf(byDay).contains(mv), planOf(byDay))
      assert(rows(byDay) === Set(Seq(19783, 30L), Seq(19784, 30L), Seq(19785, 40L)))
      // rollup to the plain column alone routes too
      assert(planOf(dsv2(b).groupBy("g").agg(sum("v").as("s"))).contains(mv))
      // residual over the UNIT: the time-windowed daily drill-down
      // routes as Filter(days_ts >= N) over the view — the transform
      // subexpression substitutes to the stored unit column
      def drill = dsv2(b).where(Mv.timeGroup("days", "ts") >= lit(19784))
        .groupBy(col("g"), Mv.timeGroup("days", "ts").as("d"))
        .agg(sum("v").as("s"))
      assert(planOf(drill).contains(mv), planOf(drill))
      assert(!planOf(drill).contains(s"graft-snapshot($b)"))
      assert(rows(drill) === Set(Seq("a", 19784, 30L), Seq("a", 19785, 40L)))
      // a predicate on the RAW time column must bypass — ts is not
      // constant within a day group, only its unit is
      assert(!planOf(dsv2(b).where(col("ts") >= lit("2024-03-02 00:00:00"))
        .groupBy(Mv.timeGroup("days", "ts")).agg(sum("v").as("s"))).contains(mv))
      // a DIFFERENT day form (date_trunc) is not the engine transform —
      // it must bypass, not mis-route
      assert(!planOf(dsv2(b).groupBy(date_trunc("day", col("ts")))
        .agg(sum("v").as("s"))).contains(mv))
      // grouping by the RAW timestamp bypasses (finer than the view)
      assert(!planOf(dsv2(b).groupBy("ts").agg(sum("v").as("s"))).contains(mv))
      // staleness still bypasses
      Snapshots.mergeByKey(spark, b,
        Seq((1L, "2024-03-01 01:00:00", "a", 99L)).toDF("k", "ts", "g", "v")
          .withColumn("ts", to_timestamp(col("ts")))
          .withColumn("__del", lit(false)),
        Seq("k"), tombstoneCol = Some("__del"))
      assert(!planOf(q).contains(mv))
      Mv.refresh(spark, m)
      assert(planOf(q).contains(mv))
      assert(rows(q).contains(Seq("a", 19783, 1L, 99L)))
    } finally Mv.unregister(spark, m)
  }

  test("plan-time freshness is stamp-cached: routing lists NO mv-root dirs in steady state") {
    import spark.implicits._
    import graft.sources.CountingFileSystem
    spark.sparkContext.hadoopConfiguration.set("fs.graftcount.impl",
      classOf[CountingFileSystem].getName)
    val b = s"graftcount://$wh/svb"; val m = s"graftcount://$wh/svm"
    val b2 = s"graftcount://$wh/svb2"; val m2 = s"graftcount://$wh/svm2"
    Snapshots.publish(spark, b, base(Seq((1L, "a", 10L, 1L), (2L, "b", 20L, 2L))))
    Mv.create(spark, m, b, Seq("k"), Seq("g"), Seq("v"), mvBuckets = 4)
    // a SECOND registered route over a foreign base: its freshness probe
    // must not re-list either root on every compile
    Snapshots.publish(spark, b2, base(Seq((3L, "c", 30L, 3L))))
    Mv.create(spark, m2, b2, Seq("k"), Seq("g"), Seq("v"), mvBuckets = 4)
    Mv.register(spark, m)
    Mv.register(spark, m2)
    try {
      val f = new org.apache.hadoop.fs.Path(b).getFileSystem(
        spark.sparkContext.hadoopConfiguration)
      def q = dsv2(b).groupBy("g").agg(sum("v").as("s"))
      def planOfQ = planOf(q)
      assert(planOfQ.contains(s"graft-snapshot($m)"), planOfQ)
      // age the _snapshots dirs past the cache's recent window (the
      // anti-collision guard serves young dirs fresh-read), then warm
      Seq(b, m, b2, m2).foreach(r => f.setTimes(
        new org.apache.hadoop.fs.Path(s"$r/_snapshots"),
        System.currentTimeMillis() - 60000, -1))
      assert(planOfQ.contains(s"graft-snapshot($m)"))
      CountingFileSystem.reset()
      // steady-state compile: freshness answers from the dir-stamp cache
      // (one getFileStatus per root). The FOREIGN route's probes — the
      // per-registered-route cost the cache exists to bound — must list
      // NOTHING; the matching route's view and the query's base still
      // list through their scans' own planning, which is per-TABLE (the
      // plan reads them), not per-route.
      assert(planOfQ.contains(s"graft-snapshot($m)"),
        "cached freshness must still route")
      Seq(m2, b2).foreach { r =>
        val dir = r.stripPrefix("graftcount://")
        assert(CountingFileSystem.count("list", s"$dir/_snapshots") === 0,
          s"steady-state planning must not re-list the foreign route $r")
      }
      // a publish BUMPS the dir stamp: the cache sees the new head and
      // freshness correctly BYPASSES the now-stale view
      Snapshots.mergeByKey(spark, b,
        Seq((1L, "a", 99L, 1L)).toDF("k", "g", "v", "c")
          .withColumn("__del", lit(false)),
        Seq("k"), tombstoneCol = Some("__del"))
      assert(!planOfQ.contains(s"graft-snapshot($m)"),
        "a stale view must never answer from a cached listing")
    } finally { Mv.unregister(spark, m); Mv.unregister(spark, m2) }
  }

  test("routing over an EMPTY base: the global rollup pins count=0 and estimate=0, never NULL") {
    import spark.implicits._
    val b = s"$wh/reb1"; val m = s"$wh/rem1"
    Snapshots.publish(spark, b,
      Seq.empty[(Long, String, java.lang.Long, Long)].toDF("k", "g", "v", "c"))
    Mv.create(spark, m, b, Seq("k"), Seq("g"), Seq("v"), mvBuckets = 4,
      approxDistinctCols = Seq("c"))
    val mv = s"graft-snapshot($m)"
    Mv.register(spark, m)
    try {
      // the global aggregate re-aggregates ZERO view rows: count must be
      // 0 (Coalesce-pinned — a bare SUM over nothing is NULL), the sum
      // NULL, and the sketch estimate 0 (same pin) — exactly what the
      // unrouted aggregate over the empty base reports
      def g = dsv2(b).agg(count(lit(1)).as("n"), sum("v").as("s"),
        approx_count_distinct(col("c")).as("nd"))
      assert(planOf(g).contains(mv), planOf(g))
      assert(rows(g) === Set(Seq(0L, null, 0L)))
      // the exact-grouping rewrite is a PROJECT over the view — no
      // aggregation at all survives in the optimized plan
      def e = dsv2(b).groupBy("g").agg(sum("v").as("s"))
      assert(planOf(e).contains(mv), planOf(e))
      assert(!planOf(e).contains("Aggregate"), planOf(e))
      assert(rows(e) === Set.empty)
    } finally Mv.unregister(spark, m)
  }

  test("routed NULL semantics are exact: all-NULL sums, NULL groups, derived avg") {
    val b = s"$wh/rb4"; val m = s"$wh/rm4"
    Snapshots.publish(spark, b, base(Seq(
      (1L, "a", null.asInstanceOf[java.lang.Long], 1L),
      (2L, "a", null.asInstanceOf[java.lang.Long], 2L),
      (3L, null, 30L, 3L))))
    Mv.create(spark, m, b, Seq("k"), Seq("g"), Seq("v"), mvBuckets = 4)
    def q = dsv2(b).groupBy("g").agg(
      count(lit(1)).as("n"), sum("v").as("s"), avg(col("v")).as("av"))
    val unrouted = rows(q)
    Mv.register(spark, m)
    try {
      assert(planOf(q).contains(s"graft-snapshot($m)"))
      assert(rows(q) === unrouted)
      // group "a" sums NULL over two rows; its avg is NULL, not NaN
      assert(rows(q).contains(Seq("a", 2L, null, null)))
    } finally Mv.unregister(spark, m)
  }
}
