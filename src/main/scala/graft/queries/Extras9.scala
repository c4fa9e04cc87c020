package graft.queries

import graft.{QueryDef, Tables}
import graft.operators.Snapshots
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-11 continuation: TIME-TRANSFORM clustered layouts — `days(ts)` /
  * `months(date)` snapshot tables whose scan reports key-grouped
  * partitioning over the temporal transform (the Iceberg partition-
  * transform shape), so time-keyed joins plan exchange-free and file
  * counts stay bounded by the calendar, not the instant cardinality.
  */
object Extras9 {

  private def t(s: SparkSession, dir: String, n: String): DataFrame = Tables.load(s, dir, n)

  private def freshRoot(s: SparkSession, owner: String, name: String, dir: String): String = {
    val root = graft.Scratch.dir(owner, name, dir)
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(root), true) // idempotent rerun
    root
  }

  val entries: Seq[QueryDef] = Seq(

    // TIME-TRANSFORM CLUSTERING under the oracle hash: two event feeds
    // publish as `days(ts)` tables — one file set per CALENDAR DAY
    // (bounded by the retention window at any event cardinality, where
    // identity clustering on a microsecond timestamp would write one
    // file per instant). The scan PROVES day-purity from footer-stat
    // envelopes (the transform is monotonic: days(min)==days(max) closes
    // the file) and reports key-grouped partitioning over the DAYS
    // transform, resolved through the catalog's `days` V2 function — the
    // exact-timestamp join plans with ZERO exchanges (equal instants ⇒
    // equal days, the temporal-transform SPJ shape). `bounded_groups`
    // pins one file set per day; `day_pruned` pins that a one-week
    // ts-range read plans only that band's files through the same
    // footer stats. Rows come FROM the time-clustered plan; the oracle
    // replays the join relationally.
    QueryDef.checked(
      "q191_time_cluster_join",
      """WITH l AS (SELECT ts, event_id, value FROM events),
        |r AS (SELECT ts, user_id, event_type FROM events)
        |SELECT r.event_type, count(*) AS n,
        |  CAST(sum(l.event_id) AS BIGINT) AS id_sig,
        |  CAST(sum(CAST(round(l.value * 100) AS BIGINT)
        |    * (1 + r.user_id % 7)) AS BIGINT) AS cross_sig,
        |  CAST(1 AS BOOLEAN) AS exchange_free,
        |  CAST(1 AS BOOLEAN) AS bounded_groups,
        |  CAST(1 AS BOOLEAN) AS day_pruned
        |FROM l JOIN r ON l.ts = r.ts
        |GROUP BY 1""".stripMargin) { (s, dir) =>
      val wh = freshRoot(s, "q191_time_cluster_join", "days_wh", dir)
      val ev = t(s, dir, "events")
      Snapshots.publish(s, s"$wh/impressions",
        ev.select("ts", "event_id", "value"), clusterBy = Some("days(ts)"))
      Snapshots.publish(s, s"$wh/actions",
        ev.select("ts", "user_id", "event_type"), clusterBy = Some("days(ts)"))
      val distinctDays = ev.select(to_date(col("ts"))).distinct().count()
      val boundedGroups =
        Snapshots.files(s, s"$wh/impressions", 1).size <= distinctDays &&
          Snapshots.files(s, s"$wh/actions", 1).size <= distinctDays
      // day-range pruning: a one-week filter must plan ONLY that band's
      // files — footer envelopes on ts, same proof the grouping uses
      val lastWeek = s.read.format("graft-snapshot")
        .option("root", s"$wh/impressions").load()
        .filter(col("ts") >= lit("2024-01-24").cast("timestamp"))
      val dayPruned = {
        val planned = graft.PlanOps.plannedScanFiles(lastWeek)
        planned >= 1 && planned < Snapshots.files(s, s"$wh/impressions", 1).size
      }
      // evidence plan on an ISOLATED session: the temporal-transform SPJ
      // resolves the `days` V2 function through the catalog, and the
      // broadcast escape is closed so the join must co-locate or shuffle
      val s2 = s.newSession()
      s2.conf.set("spark.sql.catalog.q191cat",
        classOf[graft.sources.SnapshotCatalog].getName)
      s2.conf.set("spark.sql.catalog.q191cat.warehouse", wh)
      s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = s2.table("q191cat.impressions")
        .join(s2.table("q191cat.actions").hint("merge"), "ts")
      joined.count() // finalize the (possibly adaptive) plan
      val exchangeFree = graft.PlanOps.shuffleCount(joined) == 0
      joined.groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          sum("event_id").cast("long").as("id_sig"),
          sum(round(col("value") * 100).cast("long")
            * (lit(1) + col("user_id") % 7)).cast("long").as("cross_sig"))
        .withColumn("exchange_free", lit(exchangeFree))
        .withColumn("bounded_groups", lit(boundedGroups))
        .withColumn("day_pruned", lit(dayPruned))
    },

    // MONTHS layout + ONE-SIDE SHUFFLE-INTO under the oracle hash:
    // orders publishes as `months(o_orderdate)` (81 calendar-month file
    // sets where days() would write ~2400) and a PLAIN delta joins it on
    // the raw date — under `v2.bucketing.shuffle.enabled` only the DELTA
    // shuffles, INTO the fact's month groups, by Catalyst EVALUATING the
    // catalog's `months` V2 function on the plain side. The oracle hash
    // row-pins the hash agreement: if the function's month math diverged
    // from the write path's routing by even one row, that row would land
    // in the wrong group and vanish from (or duplicate in) the join.
    QueryDef.checked(
      "q192_month_shuffle_into",
      """WITH f AS (SELECT o_orderkey, o_orderdate, o_totalprice FROM orders),
        |d AS (SELECT o_orderdate, o_orderkey AS d_key FROM orders
        |      WHERE o_orderkey % 100 = 0)
        |SELECT CAST(date_trunc('month', f.o_orderdate) AS TIMESTAMP) AS month,
        |  count(*) AS n,
        |  CAST(sum(f.o_orderkey) AS BIGINT) AS key_sig,
        |  CAST(sum(CAST(round(f.o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents,
        |  CAST(1 AS BOOLEAN) AS one_exchange,
        |  CAST(1 AS BOOLEAN) AS into_key_groups,
        |  CAST(1 AS BOOLEAN) AS month_bounded
        |FROM f JOIN d ON f.o_orderdate = d.o_orderdate
        |GROUP BY 1""".stripMargin) { (s, dir) =>
      val wh = freshRoot(s, "q192_month_shuffle_into", "months_wh", dir)
      val orders = t(s, dir, "orders")
        .select("o_orderkey", "o_orderdate", "o_totalprice")
      Snapshots.publish(s, s"$wh/fact", orders,
        clusterBy = Some("months(o_orderdate)"))
      val months = orders
        .select(date_trunc("month", col("o_orderdate"))).distinct().count()
      val monthBounded = Snapshots.files(s, s"$wh/fact", 1).size <= months
      val s2 = s.newSession()
      s2.conf.set("spark.sql.catalog.q192cat",
        classOf[graft.sources.SnapshotCatalog].getName)
      s2.conf.set("spark.sql.catalog.q192cat.warehouse", wh)
      s2.conf.set("spark.sql.sources.v2.bucketing.shuffle.enabled", "true")
      s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val plain2 = Tables.load(s2, dir, "orders")
        .filter(col("o_orderkey") % 100 === 0)
        .select(col("o_orderdate"), col("o_orderkey").as("d_key"))
      val joined = s2.table("q192cat.fact")
        .join(plain2.hint("merge"), "o_orderdate")
      joined.count() // finalize the (possibly adaptive) plan
      val oneExchange = graft.PlanOps.shuffleCount(joined) == 1
      val intoKeyGroups = joined.queryExecution.executedPlan.toString
        .contains("keygroupedpartitioning")
      joined.groupBy(date_trunc("month", col("o_orderdate")).as("month"))
        .agg(count(lit(1)).as("n"),
          sum("o_orderkey").cast("long").as("key_sig"),
          sum(round(col("o_totalprice") * 100).cast("long")).as("cents"))
        .withColumn("one_exchange", lit(oneExchange))
        .withColumn("into_key_groups", lit(intoKeyGroups))
        .withColumn("month_bounded", lit(monthBounded))
    },

    // SKEWED-WRITE FAN-OUT under the oracle hash: the hot-day feed (the
    // first calendar day replicated 60×, padded incompressible) publishes
    // as `days(ts)` under a small AQE advisory partition size — the
    // write path's REBALANCE routing splits the hot day across SEVERAL
    // write tasks (`hot_fans_out`: >1 file in its `__cluster=` dir, the
    // write-side mirror of q179's read fan-out) while staying map-chunk
    // bounded (`fan_bounded`), and the layout proof SURVIVES the
    // multi-file group: the scan still proves day-purity per file and
    // reports key-grouped partitioning, so the days-transform join plans
    // with zero exchanges (`exchange_free`) and a one-day read plans a
    // strict file subset (`day_pruned`). Rows come FROM the fanned-out
    // table; the oracle replays replication + join + aggregation
    // relationally — a row misrouted across a day dir would flip the hash.
    QueryDef.checked(
      "q193_skewed_write_fanout",
      """WITH f AS (
        |  SELECT ts, event_id, value,
        |    unnest(generate_series(1, CASE WHEN CAST(ts AS DATE) =
        |      (SELECT min(CAST(ts AS DATE)) FROM events) THEN 60 ELSE 1 END)) AS r
        |  FROM events),
        |d AS (SELECT DISTINCT ts FROM events)
        |SELECT CAST(f.ts AS DATE) AS day, count(*) AS n,
        |  CAST(sum(f.event_id * f.r) AS BIGINT) AS id_sig,
        |  CAST(sum(CAST(round(f.value * 100) AS BIGINT) * f.r) AS BIGINT) AS cents,
        |  CAST(1 AS BOOLEAN) AS hot_fans_out,
        |  CAST(1 AS BOOLEAN) AS fan_bounded,
        |  CAST(1 AS BOOLEAN) AS exchange_free,
        |  CAST(1 AS BOOLEAN) AS day_pruned
        |FROM f JOIN d ON f.ts = d.ts
        |GROUP BY 1""".stripMargin) { (s, dir) =>
      val wh = freshRoot(s, "q193_skewed_write_fanout", "skew_wh", dir)
      val s2 = s.newSession()
      // small advisory so the skew split triggers at fixture scale; the
      // production default (64 MB) is the real per-task write target
      s2.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "65536")
      val ev = Tables.load(s2, dir, "events").select("ts", "event_id", "value")
      val hot = ev.agg(min(to_date(col("ts")))).head().getDate(0)
      val feed = ev
        .withColumn("r", explode(expr(
          s"sequence(1, CASE WHEN to_date(ts) = DATE '$hot' THEN 60 ELSE 1 END)")))
        // 16 upstream tasks (the map-chunk unit AQE splits by — a real
        // feed always has many), then an incompressible pad so shuffle
        // bytes, which lz4-compress, actually exceed the advisory
        .repartition(16)
        .withColumn("pad", expr("concat_ws('', transform(sequence(1, 8), " +
          "x -> md5(concat(cast(event_id as string), cast(r as string), " +
          "cast(x as string)))))"))
      Snapshots.publish(s2, s"$wh/feed", feed, clusterBy = Some("days(ts)"))
      Snapshots.publish(s2, s"$wh/dim",
        ev.select("ts").distinct(), clusterBy = Some("days(ts)"))
      val hotDir = hot.toLocalDate.toEpochDay.toString
      val byDir = Snapshots.files(s2, s"$wh/feed", 1)
        .groupBy(fl => "__cluster=([^/]+)/".r.findFirstMatchIn(fl).map(_.group(1)).getOrElse(""))
      val hotFansOut = byDir.getOrElse(hotDir, Nil).size > 1
      val fanBounded = byDir.values.forall(_.size <= 16)
      val oneDay = s2.read.format("graft-snapshot").option("root", s"$wh/feed").load()
        .filter(to_date(col("ts")) === lit("2024-01-20").cast("date"))
      val dayPruned = {
        val planned = graft.PlanOps.plannedScanFiles(oneDay)
        planned >= 1 && planned < Snapshots.files(s2, s"$wh/feed", 1).size
      }
      val s3 = s.newSession()
      s3.conf.set("spark.sql.catalog.q193cat",
        classOf[graft.sources.SnapshotCatalog].getName)
      s3.conf.set("spark.sql.catalog.q193cat.warehouse", wh)
      s3.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = s3.table("q193cat.feed").drop("pad")
        .join(s3.table("q193cat.dim").hint("merge"), "ts")
      joined.count() // finalize the (possibly adaptive) plan
      val exchangeFree = graft.PlanOps.shuffleCount(joined) == 0
      joined.groupBy(to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("n"),
          sum(col("event_id") * col("r")).cast("long").as("id_sig"),
          sum(round(col("value") * 100).cast("long") * col("r")).cast("long").as("cents"))
        .withColumn("hot_fans_out", lit(hotFansOut))
        .withColumn("fan_bounded", lit(fanBounded))
        .withColumn("exchange_free", lit(exchangeFree))
        .withColumn("day_pruned", lit(dayPruned))
    },

    // SORTED-WITHIN-BUCKET under the oracle hash (the Hive/Iceberg
    // bucketed-sorted SMB shape): orders and customer publish as
    // `bucket(16, custkey)` tables SORTED by the raw key within each
    // bucket — bounded file counts at ANY key cardinality (where q182's
    // identity-sorted join needs one file set per value), with each
    // bucket's files envelope-disjoint on the key, so the scan claims
    // per-partition ordering and the 10k-key merge join plans with ZERO
    // exchanges AND ZERO sorts. Both tables land in TWO key-range
    // appends (`multi_file`: some bucket holds ≥2 files), proving the
    // inter-file envelope proof — not single-file luck — carries the
    // claim. Rows come FROM the sorted-bucket plan; the oracle replays
    // the join relationally.
    QueryDef.checked(
      "q194_sorted_bucket_smb",
      """SELECT c.c_mktsegment, count(*) AS n,
        |  CAST(sum(o.o_orderkey) AS BIGINT) AS key_sig,
        |  CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents,
        |  CAST(1 AS BOOLEAN) AS exchange_free,
        |  CAST(1 AS BOOLEAN) AS sort_free,
        |  CAST(1 AS BOOLEAN) AS bounded_files,
        |  CAST(1 AS BOOLEAN) AS multi_file
        |FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        |GROUP BY 1""".stripMargin) { (s, dir) =>
      val wh = freshRoot(s, "q194_sorted_bucket_smb", "smbkt_wh", dir)
      val orders = t(s, dir, "orders").select("o_orderkey", "o_custkey", "o_totalprice")
      val cust = t(s, dir, "customer").select("c_custkey", "c_mktsegment")
      val cut = cust.agg(max("c_custkey")).head().getLong(0) / 2
      // two appends split on the SORT key: every bucket gets two files
      // with disjoint key envelopes — the multi-file proof case
      Snapshots.publish(s, s"$wh/fact", orders.filter(col("o_custkey") <= cut),
        clusterBy = Some("bucket(16, o_custkey)"), sortBy = Some("o_custkey"))
      Snapshots.publish(s, s"$wh/fact", orders.filter(col("o_custkey") > cut),
        append = true, clusterBy = Some("bucket(16, o_custkey)"),
        sortBy = Some("o_custkey"))
      Snapshots.publish(s, s"$wh/dim", cust.filter(col("c_custkey") <= cut),
        clusterBy = Some("bucket(16, c_custkey)"), sortBy = Some("c_custkey"))
      Snapshots.publish(s, s"$wh/dim", cust.filter(col("c_custkey") > cut),
        append = true, clusterBy = Some("bucket(16, c_custkey)"),
        sortBy = Some("c_custkey"))
      def headFiles(r: String) =
        Snapshots.files(s, r, Snapshots.versions(s, r).last)
      val boundedFiles =
        headFiles(s"$wh/fact").size <= 32 && headFiles(s"$wh/dim").size <= 32
      def buckets(fs: Seq[String]) = fs.groupBy(fl =>
        "__cluster=([^/]+)/".r.findFirstMatchIn(fl).map(_.group(1)).getOrElse(""))
      val multiFile = buckets(headFiles(s"$wh/fact")).values.exists(_.size >= 2)
      val s2 = s.newSession()
      s2.conf.set("spark.sql.catalog.q194cat",
        classOf[graft.sources.SnapshotCatalog].getName)
      s2.conf.set("spark.sql.catalog.q194cat.warehouse", wh)
      s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = s2.table("q194cat.fact")
        .join(s2.table("q194cat.dim").hint("merge"),
          col("o_custkey") === col("c_custkey"))
      joined.count() // finalize the (possibly adaptive) plan
      // evidence on the bare join: the mktsegment regroup above it owns
      // one legitimate exchange+sort (it clusters on a different key)
      val exchangeFree = graft.PlanOps.shuffleCount(joined) == 0
      val sortFree = graft.PlanOps.sortCount(joined) == 0
      joined.groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n"),
          sum("o_orderkey").cast("long").as("key_sig"),
          sum(round(col("o_totalprice") * 100).cast("long")).as("cents"))
        .withColumn("exchange_free", lit(exchangeFree))
        .withColumn("sort_free", lit(sortFree))
        .withColumn("bounded_files", lit(boundedFiles))
        .withColumn("multi_file", lit(multiFile))
    },

    // JOIN MV with incremental refresh under the oracle hash: the q185
    // co-bucketed star (orders bucket(8, o_custkey) ⋈ customer
    // bucket(8, c_custkey)) maintained as a materialized count/sum/avg
    // per market segment. BOTH bases mutate (a fact CoW merge bumps +
    // deletes rows; a dim merge moves customers to a new segment), then
    // ONE Mv.refreshJoin applies the bilinear join-delta identity
    // (ΔL⋈R' + L'⋈ΔR − ΔL⋈ΔR, signed rows) at touched-bucket
    // granularity. The oracle replays the whole mutation history
    // relationally — the hash certifies incremental-apply ≡ recompute,
    // including the derived avg (sum/nn at read, never stored). Flags:
    // the refresh really ran incrementally, BOTH watermarks advanced,
    // and a replayed refresh is a no-op.
    QueryDef.checked(
      "q195_join_mv_refresh",
      """WITH fact AS (
        |  SELECT o_orderkey AS k, o_custkey,
        |    CASE WHEN o_orderkey % 10 = 0 AND o_orderkey % 37 <> 0
        |         THEN CAST(round(o_totalprice * 100) AS BIGINT) + 7
        |         ELSE CAST(round(o_totalprice * 100) AS BIGINT) END AS cents
        |  FROM orders WHERE o_orderkey % 37 <> 0),
        |dim AS (
        |  SELECT c_custkey,
        |    CASE WHEN c_custkey % 10 = 3 THEN 'MOVED' ELSE c_mktsegment END AS seg
        |  FROM customer)
        |SELECT d.seg, count(*) AS n_rows,
        |  CAST(sum(f.cents) AS BIGINT) AS sum_cents,
        |  CAST(count(f.cents) AS BIGINT) AS nn_cents,
        |  CAST(sum(f.cents) AS DOUBLE) / CAST(count(f.cents) AS DOUBLE) AS avg_cents,
        |  CAST(1 AS BOOLEAN) AS incremental,
        |  CAST(1 AS BOOLEAN) AS both_sides,
        |  CAST(1 AS BOOLEAN) AS replay_noop
        |FROM fact f JOIN dim d ON f.o_custkey = d.c_custkey
        |GROUP BY 1""".stripMargin) { (s, dir) =>
      import graft.operators.Mv
      val root = freshRoot(s, "q195_join_mv_refresh", "joinmv", dir)
      val fact = t(s, dir, "orders").select(
        col("o_orderkey").as("k"), col("o_custkey"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
      val dim = t(s, dir, "customer").select("c_custkey", "c_mktsegment")
      Snapshots.publish(s, s"$root/fact", fact, clusterBy = Some("bucket(8, o_custkey)"))
      Snapshots.publish(s, s"$root/dim", dim, clusterBy = Some("bucket(8, c_custkey)"))
      Mv.createJoin(s, s"$root/mv",
        s"$root/fact", Seq("k"), "o_custkey",
        s"$root/dim", Seq("c_custkey"), "c_custkey",
        groupCols = Seq("c_mktsegment"), sumCols = Seq("cents"), mvBuckets = 8)
      // fact side: +7 cents on keys ≡0 (mod 10) that survive, delete ≡0 (mod 37)
      Snapshots.mergeByKey(s, s"$root/fact",
        fact.filter(col("k") % 10 === 0 && col("k") % 37 =!= 0)
          .withColumn("cents", col("cents") + 7).withColumn("__del", lit(false))
          .unionByName(fact.filter(col("k") % 37 === 0).withColumn("__del", lit(true))),
        keyCols = Seq("k"), tombstoneCol = Some("__del"))
      // dim side: customers ≡3 (mod 10) move to a NEW segment
      Snapshots.mergeByKey(s, s"$root/dim",
        dim.filter(col("c_custkey") % 10 === 3)
          .withColumn("c_mktsegment", lit("MOVED")).withColumn("__del", lit(false)),
        keyCols = Seq("c_custkey"), tombstoneCol = Some("__del"))
      val r = Mv.refreshJoin(s, s"$root/mv")
      val incremental = r.mode == "incremental"
      val bothSides = r.fromLeft < r.toLeft && r.fromRight < r.toRight
      val replayNoop = Mv.refreshJoin(s, s"$root/mv").mode == "noop"
      Mv.read(s, s"$root/mv", deriveAvg = true)
        .select(col("c_mktsegment").as("seg"), col("n_rows"),
          col("sum_cents"), col("nn_cents"), col("avg_cents"))
        .withColumn("incremental", lit(incremental))
        .withColumn("both_sides", lit(bothSides))
        .withColumn("replay_noop", lit(replayNoop))
    },

    // JOIN MV over a TIME-TRANSFORM co-clustered star under the oracle
    // hash: the q191 event-feed shape (two `days(·)`-clustered bases
    // joined on the time key) hosts a materialized count/sum per group.
    // BOTH bases mutate (a fact CoW merge bumps + deletes rows; the dim
    // moves every third calendar day's group label), then ONE
    // Mv.refreshJoin applies the bilinear join-delta identity with
    // probes pruned to COLLIDING CALENDAR UNITS — the days-transform
    // twin of q195's bucket pruning (`probes_pruned` pins that both
    // sides' probes actually pruned; MvSpec pins the O(touched days)
    // file bound). The oracle replays the whole mutation history
    // relationally — the hash certifies incremental-apply ≡ recompute.
    QueryDef.checked(
      "q199_time_join_mv",
      """WITH fact AS (
        |  SELECT event_id AS k, ts,
        |    CASE WHEN event_id % 10 = 0 AND event_id % 37 <> 0
        |         THEN CAST(round(value * 100) AS BIGINT) + 7
        |         ELSE CAST(round(value * 100) AS BIGINT) END AS cents
        |  FROM events WHERE event_id % 37 <> 0),
        |dim AS (
        |  SELECT ts AS rts,
        |    CASE WHEN (CAST(ts AS DATE) - DATE '1970-01-01') % 3 = 0 THEN 'MOVED'
        |         ELSE CAST((CAST(ts AS DATE) - DATE '1970-01-01') % 5 AS VARCHAR)
        |    END AS grp
        |  FROM (SELECT DISTINCT ts FROM events))
        |SELECT d.grp, count(*) AS n_rows,
        |  CAST(sum(f.cents) AS BIGINT) AS sum_cents,
        |  CAST(count(f.cents) AS BIGINT) AS nn_cents,
        |  CAST(1 AS BOOLEAN) AS incremental,
        |  CAST(1 AS BOOLEAN) AS both_sides,
        |  CAST(1 AS BOOLEAN) AS probes_pruned,
        |  CAST(1 AS BOOLEAN) AS replay_noop
        |FROM fact f JOIN dim d ON f.ts = d.rts
        |GROUP BY 1""".stripMargin) { (s, dir) =>
      import graft.operators.Mv
      val root = freshRoot(s, "q199_time_join_mv", "timemv", dir)
      def epochDay(c: org.apache.spark.sql.Column) =
        datediff(c.cast("date"), lit("1970-01-01").cast("date"))
      val ev = t(s, dir, "events")
      val fact = ev.select(col("event_id").as("k"), col("ts"),
        round(col("value") * 100).cast("long").as("cents"))
      val dim = ev.select(col("ts").as("rts")).distinct()
        .withColumn("grp", (epochDay(col("rts")) % 5).cast("string"))
      Snapshots.publish(s, s"$root/fact", fact, clusterBy = Some("days(ts)"))
      Snapshots.publish(s, s"$root/dim", dim, clusterBy = Some("days(rts)"))
      Mv.createJoin(s, s"$root/mv",
        s"$root/fact", Seq("k"), "ts",
        s"$root/dim", Seq("rts"), "rts",
        groupCols = Seq("grp"), sumCols = Seq("cents"), mvBuckets = 8)
      // fact side: +7 cents on keys ≡0 (mod 10) that survive, delete ≡0 (mod 37)
      Snapshots.mergeByKey(s, s"$root/fact",
        fact.filter(col("k") % 10 === 0 && col("k") % 37 =!= 0)
          .withColumn("cents", col("cents") + 7).withColumn("__del", lit(false))
          .unionByName(fact.filter(col("k") % 37 === 0).withColumn("__del", lit(true))),
        keyCols = Seq("k"), tombstoneCol = Some("__del"))
      // dim side: every third calendar day's group moves to MOVED
      Snapshots.mergeByKey(s, s"$root/dim",
        dim.filter(epochDay(col("rts")) % 3 === 0)
          .withColumn("grp", lit("MOVED")).withColumn("__del", lit(false)),
        keyCols = Seq("rts"), tombstoneCol = Some("__del"))
      val r = Mv.refreshJoin(s, s"$root/mv")
      val incremental = r.mode == "incremental"
      val bothSides = r.fromLeft < r.toLeft && r.fromRight < r.toRight
      val probesPruned = r.probePrunedLeft && r.probePrunedRight
      val replayNoop = Mv.refreshJoin(s, s"$root/mv").mode == "noop"
      Mv.read(s, s"$root/mv")
        .select(col("grp"), col("n_rows"), col("sum_cents"), col("nn_cents"))
        .withColumn("incremental", lit(incremental))
        .withColumn("both_sides", lit(bothSides))
        .withColumn("probes_pruned", lit(probesPruned))
        .withColumn("replay_noop", lit(replayNoop))
    },

    // MV MIN/MAX under the oracle hash: a per-priority count/sum/min/max
    // view over a SEG-CLUSTERED base maintained through a mixed mutation
    // (updates + deletes hit the '1-URGENT'..'4-*' groups — retractions,
    // so those groups' min/max RECOUNT from the base, FILE-pruned to
    // exactly their `__cluster=` dirs and row-pruned within them — while
    // '5-LOW' receives only fresh inserts and combines ALGEBRAICALLY,
    // never touching the base). The deletes remove rows that include
    // group minima and the updates rewrite values upward, so a stale
    // algebraic envelope would flip the hash; the oracle replays the
    // whole mutation history relationally. The insert key offset derives
    // from max(o_orderkey) on BOTH sides, so the "fresh inserts" stay
    // genuinely disjoint from live keys at any scale factor. Flags:
    // refresh ran incrementally, the retracted groups paid a FILE-PRUNED
    // recount (the report's recountGroups/recountPruned), replay is a
    // noop.
    QueryDef.checked(
      "q200_mv_minmax",
      """WITH base AS (
        |  SELECT o_orderkey AS k, o_orderpriority AS seg,
        |         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        |  FROM orders),
        |fin AS (
        |  SELECT k, seg,
        |    CASE WHEN k % 10 = 0 AND seg <> '5-LOW' THEN cents + 7
        |         ELSE cents END AS cents
        |  FROM base WHERE NOT (k % 37 = 0 AND seg = '1-URGENT')
        |  UNION ALL
        |  SELECT k + 10 * (SELECT max(o_orderkey) FROM orders), '5-LOW',
        |    cents + 13 FROM base WHERE k % 11 = 0)
        |SELECT seg, count(*) AS n_rows,
        |  CAST(sum(cents) AS BIGINT) AS sum_cents,
        |  CAST(count(cents) AS BIGINT) AS nn_cents,
        |  CAST(min(cents) AS BIGINT) AS min_cents,
        |  CAST(max(cents) AS BIGINT) AS max_cents,
        |  CAST(1 AS BOOLEAN) AS incremental,
        |  CAST(1 AS BOOLEAN) AS recounted,
        |  CAST(1 AS BOOLEAN) AS recount_pruned,
        |  CAST(1 AS BOOLEAN) AS replay_noop
        |FROM fin GROUP BY 1""".stripMargin) { (s, dir) =>
      import graft.operators.Mv
      val root = freshRoot(s, "q200_mv_minmax", "mmv", dir)
      val base = t(s, dir, "orders").select(
        col("o_orderkey").as("k"), col("o_orderpriority").as("seg"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
      Snapshots.publish(s, s"$root/base", base, clusterBy = Some("seg"))
      Mv.create(s, s"$root/mv", s"$root/base", Seq("k"), Seq("seg"),
        sumCols = Seq("cents"), mvBuckets = 8, minMaxCols = Seq("cents"))
      // one mixed merge: +7 cents on k≡0 (mod 10) survivors (update =
      // retraction), delete urgent k≡0 (mod 37), and insert a fresh
      // '5-LOW' row per k≡0 (mod 11) under a key range derived from the
      // live maximum — disjoint at any SF (a fixed offset would collide
      // with real orderkeys at SF ≥ 2 and silently upsert instead)
      val maxK = base.agg(max("k")).head.getLong(0)
      val updates = base
        .filter(col("k") % 10 === 0 && col("seg") =!= "5-LOW" &&
          !(col("k") % 37 === 0 && col("seg") === "1-URGENT"))
        .withColumn("cents", col("cents") + 7).withColumn("__del", lit(false))
      val deletes = base
        .filter(col("k") % 37 === 0 && col("seg") === "1-URGENT")
        .withColumn("__del", lit(true))
      val inserts = base.filter(col("k") % 11 === 0)
        .select((col("k") + lit(10L * maxK)).as("k"), lit("5-LOW").as("seg"),
          (col("cents") + 13L).as("cents"))
        .withColumn("__del", lit(false))
      Snapshots.mergeByKey(s, s"$root/base",
        updates.unionByName(deletes).unionByName(inserts),
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

    // JOIN-MV MIN/MAX under the oracle hash: the q195 co-bucketed star
    // maintained with min/max over the fact measure, through the same
    // both-bases mutation (fact +7/delete; dim segment moves). The dim
    // moves RETRACT rows from the old segments and INSERT them into a
    // brand-new 'MOVED' group, so one refresh exercises both the
    // per-retracted-group recount (old segments — the DIM restricts to
    // the retracted groups first, then the FACT probes only the
    // survivors' colliding buckets; `recounted`/`recount_pruned` pin
    // that the bounded path ran) and the algebraic insert-only combine
    // (MOVED). A stale envelope anywhere flips the hash.
    QueryDef.checked(
      "q201_join_mv_minmax",
      """WITH fact AS (
        |  SELECT o_orderkey AS k, o_custkey,
        |    CASE WHEN o_orderkey % 10 = 0 AND o_orderkey % 37 <> 0
        |         THEN CAST(round(o_totalprice * 100) AS BIGINT) + 7
        |         ELSE CAST(round(o_totalprice * 100) AS BIGINT) END AS cents
        |  FROM orders WHERE o_orderkey % 37 <> 0),
        |dim AS (
        |  SELECT c_custkey,
        |    CASE WHEN c_custkey % 10 = 3 THEN 'MOVED' ELSE c_mktsegment END AS seg
        |  FROM customer)
        |SELECT d.seg, count(*) AS n_rows,
        |  CAST(sum(f.cents) AS BIGINT) AS sum_cents,
        |  CAST(min(f.cents) AS BIGINT) AS min_cents,
        |  CAST(max(f.cents) AS BIGINT) AS max_cents,
        |  CAST(1 AS BOOLEAN) AS incremental,
        |  CAST(1 AS BOOLEAN) AS both_sides,
        |  CAST(1 AS BOOLEAN) AS recounted,
        |  CAST(1 AS BOOLEAN) AS recount_pruned,
        |  CAST(1 AS BOOLEAN) AS replay_noop
        |FROM fact f JOIN dim d ON f.o_custkey = d.c_custkey
        |GROUP BY 1""".stripMargin) { (s, dir) =>
      import graft.operators.Mv
      val root = freshRoot(s, "q201_join_mv_minmax", "joinmm", dir)
      val fact = t(s, dir, "orders").select(
        col("o_orderkey").as("k"), col("o_custkey"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
      val dim = t(s, dir, "customer").select("c_custkey", "c_mktsegment")
      Snapshots.publish(s, s"$root/fact", fact, clusterBy = Some("bucket(8, o_custkey)"))
      Snapshots.publish(s, s"$root/dim", dim, clusterBy = Some("bucket(8, c_custkey)"))
      Mv.createJoin(s, s"$root/mv",
        s"$root/fact", Seq("k"), "o_custkey",
        s"$root/dim", Seq("c_custkey"), "c_custkey",
        groupCols = Seq("c_mktsegment"), sumCols = Seq("cents"),
        mvBuckets = 8, minMaxCols = Seq("cents"))
      Snapshots.mergeByKey(s, s"$root/fact",
        fact.filter(col("k") % 10 === 0 && col("k") % 37 =!= 0)
          .withColumn("cents", col("cents") + 7).withColumn("__del", lit(false))
          .unionByName(fact.filter(col("k") % 37 === 0).withColumn("__del", lit(true))),
        keyCols = Seq("k"), tombstoneCol = Some("__del"))
      Snapshots.mergeByKey(s, s"$root/dim",
        dim.filter(col("c_custkey") % 10 === 3)
          .withColumn("c_mktsegment", lit("MOVED")).withColumn("__del", lit(false)),
        keyCols = Seq("c_custkey"), tombstoneCol = Some("__del"))
      val r = Mv.refreshJoin(s, s"$root/mv")
      val incremental = r.mode == "incremental"
      val bothSides = r.fromLeft < r.toLeft && r.fromRight < r.toRight
      val recounted = r.recountGroups > 0
      val recountPruned = r.recountPruned
      val replayNoop = Mv.refreshJoin(s, s"$root/mv").mode == "noop"
      Mv.read(s, s"$root/mv")
        .select(col("c_mktsegment").as("seg"), col("n_rows"),
          col("sum_cents"), col("min_cents"), col("max_cents"))
        .withColumn("incremental", lit(incremental))
        .withColumn("both_sides", lit(bothSides))
        .withColumn("recounted", lit(recounted))
        .withColumn("recount_pruned", lit(recountPruned))
        .withColumn("replay_noop", lit(replayNoop))
    },

    // TRILINEAR JOIN MV under the oracle hash: the 3-table reporting star
    // (customer dim ⋈ orders fact ⋈ priority dim) maintained as a
    // materialized count/sum per (segment, priority label). ALL THREE
    // bases mutate (fact +7/delete; customers move segments; one priority
    // relabels), then ONE Mv.refreshJoin3 applies the inclusion-exclusion
    // expansion of the join-delta identity (7 terms, each delta-sized on
    // at least one side) with full-side probes routed through each base's
    // OWN cluster header — bucket dirs for customer/orders, identity
    // split dirs for the priority dim. The fact probe under the priority
    // delta is structurally unpruned (a table clusters on one key) and
    // the report says so — `dims_pruned` pins the two dim probes that CAN
    // prune did. The oracle replays the whole mutation history
    // relationally; the hash certifies incremental-apply ≡ recompute.
    QueryDef.checked(
      "q202_trilinear_mv",
      """WITH fact AS (
        |  SELECT o_orderkey AS k, o_custkey, o_orderpriority AS prio,
        |    CASE WHEN o_orderkey % 10 = 0 AND o_orderkey % 37 <> 0
        |         THEN CAST(round(o_totalprice * 100) AS BIGINT) + 7
        |         ELSE CAST(round(o_totalprice * 100) AS BIGINT) END AS cents
        |  FROM orders WHERE o_orderkey % 37 <> 0),
        |d1 AS (
        |  SELECT c_custkey,
        |    CASE WHEN c_custkey % 10 = 3 THEN 'MOVED' ELSE c_mktsegment END AS seg
        |  FROM customer),
        |d2 AS (
        |  SELECT prio0 AS pr,
        |    CASE WHEN prio0 = '3-MEDIUM' THEN 'MED*' ELSE 'P_' || prio0 END AS plabel
        |  FROM (SELECT DISTINCT o_orderpriority AS prio0 FROM orders))
        |SELECT d1.seg, d2.plabel, count(*) AS n_rows,
        |  CAST(sum(f.cents) AS BIGINT) AS sum_cents,
        |  CAST(count(f.cents) AS BIGINT) AS nn_cents,
        |  CAST(1 AS BOOLEAN) AS incremental,
        |  CAST(1 AS BOOLEAN) AS all_sides,
        |  CAST(1 AS BOOLEAN) AS dims_pruned,
        |  CAST(1 AS BOOLEAN) AS replay_noop
        |FROM fact f JOIN d1 ON f.o_custkey = d1.c_custkey
        |  JOIN d2 ON f.prio = d2.pr
        |GROUP BY 1, 2""".stripMargin) { (s, dir) =>
      import graft.operators.Mv
      val root = freshRoot(s, "q202_trilinear_mv", "tri", dir)
      val fact = t(s, dir, "orders").select(
        col("o_orderkey").as("k"), col("o_custkey"),
        col("o_orderpriority").as("prio"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
      val d1 = t(s, dir, "customer").select(
        col("c_custkey"), col("c_mktsegment").as("seg"))
      val d2 = fact.select(col("prio").as("pr")).distinct()
        .withColumn("plabel", concat(lit("P_"), col("pr")))
      Snapshots.publish(s, s"$root/d1", d1, clusterBy = Some("bucket(8, c_custkey)"))
      Snapshots.publish(s, s"$root/fact", fact, clusterBy = Some("bucket(8, o_custkey)"))
      Snapshots.publish(s, s"$root/d2", d2, clusterBy = Some("pr"))
      Mv.createJoin3(s, s"$root/mv",
        s"$root/d1", Seq("c_custkey"), "c_custkey",
        s"$root/fact", Seq("k"), "o_custkey", "prio",
        s"$root/d2", Seq("pr"), "pr",
        groupCols = Seq("seg", "plabel"), sumCols = Seq("cents"), mvBuckets = 8)
      // fact: +7 cents on keys ≡0 (mod 10) that survive, delete ≡0 (mod 37)
      Snapshots.mergeByKey(s, s"$root/fact",
        fact.filter(col("k") % 10 === 0 && col("k") % 37 =!= 0)
          .withColumn("cents", col("cents") + 7).withColumn("__del", lit(false))
          .unionByName(fact.filter(col("k") % 37 === 0).withColumn("__del", lit(true))),
        keyCols = Seq("k"), tombstoneCol = Some("__del"))
      // left dim: customers ≡3 (mod 10) move to a NEW segment
      Snapshots.mergeByKey(s, s"$root/d1",
        d1.filter(col("c_custkey") % 10 === 3)
          .withColumn("seg", lit("MOVED")).withColumn("__del", lit(false)),
        keyCols = Seq("c_custkey"), tombstoneCol = Some("__del"))
      // right dim: one priority relabels
      Snapshots.mergeByKey(s, s"$root/d2",
        d2.filter(col("pr") === "3-MEDIUM")
          .withColumn("plabel", lit("MED*")).withColumn("__del", lit(false)),
        keyCols = Seq("pr"), tombstoneCol = Some("__del"))
      val r = Mv.refreshJoin3(s, s"$root/mv")
      val incremental = r.mode == "incremental"
      val allSides = r.fromLeft < r.toLeft && r.fromMid < r.toMid &&
        r.fromRight < r.toRight
      val dimsPruned = r.probePrunedLeft && r.probePrunedRight
      val replayNoop = Mv.refreshJoin3(s, s"$root/mv").mode == "noop"
      Mv.read(s, s"$root/mv")
        .select(col("seg"), col("plabel"), col("n_rows"),
          col("sum_cents"), col("nn_cents"))
        .withColumn("incremental", lit(incremental))
        .withColumn("all_sides", lit(allSides))
        .withColumn("dims_pruned", lit(dimsPruned))
        .withColumn("replay_noop", lit(replayNoop))
    },

    // NAMED VERSION TAGS under the oracle hash: v1 is tagged 'baseline'
    // after two more versions land, expire(keepLast=1) then drops the
    // UNtagged middle version but keeps the pin (`survives_expire` +
    // `expired_refuses` — reading the dropped version errors), the tag
    // resolves through both the DSv2 option and SQL `VERSION AS OF
    // 'baseline'` (`sql_as_of`), and untag releases the pin so the next
    // expire drops v1 (`untag_releases`). Rows come FROM the tag read —
    // the oracle recomputes v1's slice relationally, so a tag resolving
    // to the wrong version flips the hash.
    QueryDef.checked(
      "q197_version_tags",
      """SELECT o_orderpriority, count(*) AS n,
        |  CAST(sum(o_orderkey) AS BIGINT) AS key_sig,
        |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents,
        |  CAST(1 AS BOOLEAN) AS survives_expire,
        |  CAST(1 AS BOOLEAN) AS expired_refuses,
        |  CAST(1 AS BOOLEAN) AS sql_as_of,
        |  CAST(1 AS BOOLEAN) AS untag_releases
        |FROM orders WHERE o_orderkey % 3 = 0
        |GROUP BY 1""".stripMargin) { (s, dir) =>
      val wh = freshRoot(s, "q197_version_tags", "tags_wh", dir)
      val orders = t(s, dir, "orders")
        .select("o_orderkey", "o_orderpriority", "o_totalprice")
      Snapshots.publish(s, s"$wh/t", orders.filter(col("o_orderkey") % 3 === 0))
      Snapshots.publish(s, s"$wh/t", orders.filter(col("o_orderkey") % 3 === 1),
        append = true)
      Snapshots.publish(s, s"$wh/t", orders.filter(col("o_orderkey") % 3 === 2),
        append = true)
      Snapshots.tag(s, s"$wh/t", "baseline", Some(1))
      val dropped = Snapshots.expire(s, s"$wh/t", keepLast = 1)
      val survivesExpire = dropped == Seq(2) &&
        Snapshots.versions(s, s"$wh/t") == Seq(1, 3)
      val expiredRefuses = scala.util.Try(
        Snapshots.read(s, s"$wh/t", Some(2)).count()).isFailure
      val s2 = s.newSession()
      s2.conf.set("spark.sql.catalog.q197cat",
        classOf[graft.sources.SnapshotCatalog].getName)
      s2.conf.set("spark.sql.catalog.q197cat.warehouse", wh)
      val tagged = s2.read.format("graft-snapshot").option("root", s"$wh/t")
        .option("version", "baseline").load()
      val sqlAsOf = s2.sql("SELECT count(*) FROM q197cat.t VERSION AS OF 'baseline'")
        .head.getLong(0) == tagged.count()
      val out = tagged.groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"),
          sum("o_orderkey").cast("long").as("key_sig"),
          sum(round(col("o_totalprice") * 100).cast("long")).as("cents"))
        .collect() // materialize BEFORE untag releases the version
      val untagReleases = Snapshots.untag(s, s"$wh/t", "baseline") && {
        Snapshots.expire(s, s"$wh/t", keepLast = 1) == Seq(1) &&
          Snapshots.versions(s, s"$wh/t") == Seq(3)
      }
      import s.implicits._
      s.createDataFrame(java.util.Arrays.asList(out: _*),
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("o_orderpriority",
              org.apache.spark.sql.types.StringType),
            org.apache.spark.sql.types.StructField("n",
              org.apache.spark.sql.types.LongType),
            org.apache.spark.sql.types.StructField("key_sig",
              org.apache.spark.sql.types.LongType),
            org.apache.spark.sql.types.StructField("cents",
              org.apache.spark.sql.types.LongType))))
        .withColumn("survives_expire", lit(survivesExpire))
        .withColumn("expired_refuses", lit(expiredRefuses))
        .withColumn("sql_as_of", lit(sqlAsOf))
        .withColumn("untag_releases", lit(untagReleases))
    }
  )
}
