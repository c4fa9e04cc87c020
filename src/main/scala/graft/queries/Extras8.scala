package graft.queries

import graft.{QueryDef, Tables}
import graft.operators.Snapshots
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-11 tier: merge-on-read delete vectors served through plain SQL
  * reads, decimal precision widening across the int64→binary physical
  * seam, and the hot-key de-skew fan-out under the oracle hash.
  */
object Extras8 {

  private def t(s: SparkSession, dir: String, n: String): DataFrame = Tables.load(s, dir, n)

  private def freshRoot(s: SparkSession, owner: String, name: String, dir: String): String = {
    val root = graft.Scratch.dir(owner, name, dir)
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(root), true) // idempotent rerun
    root
  }

  val entries: Seq[QueryDef] = Seq(

    // DV-AWARE DSv2 BATCH READ: a table with outstanding merge-on-read
    // delete vectors reads through PLAIN SQL (`format("graft-snapshot")`)
    // — the scan anti-probes the dv key sets inside the readers instead
    // of refusing, with sequence scoping (a key re-inserted AFTER its
    // delete stays visible) and the metadata shortcuts stood down. The
    // oracle replays delete + re-insert relationally; `dv_outstanding`
    // pins that the read really exercised the merge-on-read path (the
    // dvs were NOT materialized first).
    QueryDef.checked(
      "q177_dsv2_dv_read",
      """WITH base AS (
        |  SELECT o_orderkey, o_orderpriority, o_totalprice
        |  FROM orders WHERE o_orderkey % 3 = 0),
        |mk AS (SELECT min(o_orderkey) AS k FROM base WHERE o_orderkey % 5 = 0),
        |survivors AS (
        |  SELECT * FROM base WHERE o_orderkey % 5 <> 0
        |  UNION ALL
        |  SELECT k, 'REINSERTED', 123.0 FROM mk)
        |SELECT o_orderpriority, count(*) AS n,
        |  CAST(sum(o_orderkey) AS BIGINT) AS key_sig,
        |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents,
        |  CAST(1 AS BOOLEAN) AS dv_outstanding
        |FROM survivors GROUP BY 1""".stripMargin) { (s, dir) =>
      val root = freshRoot(s, "q177_dsv2_dv_read", "dv_read", dir)
      val base = t(s, dir, "orders")
        .select("o_orderkey", "o_orderpriority", "o_totalprice")
        .filter(col("o_orderkey") % 3 === 0)
      Snapshots.publish(s, root, base)
      val doomed = base.filter(col("o_orderkey") % 5 === 0).select("o_orderkey")
      Snapshots.deleteByKey(s, root, doomed)
      val back = doomed.agg(min("o_orderkey")).head().getLong(0)
      import s.implicits._
      Snapshots.publish(s, root,
        Seq((back, "REINSERTED", 123.0))
          .toDF("o_orderkey", "o_orderpriority", "o_totalprice"),
        append = true)
      val dvLive =
        Snapshots.hasDeleteVectors(s, root, Snapshots.versions(s, root).last)
      s.read.format("graft-snapshot").option("root", root).load()
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"),
          sum("o_orderkey").cast("long").as("key_sig"),
          sum(round(col("o_totalprice") * 100).cast("long")).as("cents"))
        .withColumn("dv_outstanding", lit(dvLive))
    },

    // DECIMAL PRECISION WIDENING end-to-end across the PHYSICAL seam:
    // generation 1 lands DECIMAL(12,2) (int64-backed parquet), the SQL
    // ALTER widens to DECIMAL(22,2) metadata-only (the evolved manifest
    // lists exactly v1's files), generation 2 lands native DECIMAL(22,2)
    // (binary-backed) files, and ONE scan serves both generations — the
    // reader promotes the int64 bytes at read. Same-scale precision
    // growth is the ONLY accepted decimal change: precision narrowing
    // and scale changes both refuse (flags), and VERSION AS OF serves v1
    // under its pre-widening schema. The oracle recomputes the merged
    // table relationally in cents (exact on both engines).
    QueryDef.checked(
      "q178_widen_decimal",
      """SELECT
        |  (SELECT count(*) FROM orders) AS n_total,
        |  (SELECT CAST(sum(o_orderkey) AS BIGINT) FROM orders) AS key_sig,
        |  (SELECT CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |     FROM orders) AS cents,
        |  CAST(1 AS BOOLEAN) AS metadata_only,
        |  CAST(1 AS BOOLEAN) AS narrowing_refused,
        |  CAST(1 AS BOOLEAN) AS scale_change_refused,
        |  CAST(1 AS BOOLEAN) AS old_schema_kept""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.types.DecimalType
      val wh = freshRoot(s, "q178_widen_decimal", "widen_dec_wh", dir)
      s.conf.set("spark.sql.catalog.q178cat",
        classOf[graft.sources.SnapshotCatalog].getName)
      s.conf.set("spark.sql.catalog.q178cat.warehouse", wh)
      // exact-cents decimal: round(price*100) is integer-valued in the
      // fixture, so the decimal column is exactly the double's cents on
      // both engines (no double→decimal rounding-mode seam)
      val ord = t(s, dir, "orders").select(col("o_orderkey"),
        (round(col("o_totalprice") * 100) / 100).cast("decimal(12,2)").as("o_totalprice"))
      Snapshots.publish(s, s"$wh/t", ord.filter(col("o_orderkey") % 2 === 0))
      s.sql("ALTER TABLE q178cat.t ALTER COLUMN o_totalprice TYPE DECIMAL(22,2)")
      val metadataOnly =
        Snapshots.files(s, s"$wh/t", 2) == Snapshots.files(s, s"$wh/t", 1)
      ord.filter(col("o_orderkey") % 2 === 1)
        .withColumn("o_totalprice", col("o_totalprice").cast("decimal(22,2)"))
        .createOrReplaceTempView("q178_delta")
      s.sql("INSERT INTO q178cat.t SELECT * FROM q178_delta")
      def refused(ddl: String): Boolean =
        (try { s.sql(ddl); false } catch { case _: Exception => true }) &&
          s.table("q178cat.t").schema("o_totalprice").dataType == DecimalType(22, 2)
      val narrowingRefused =
        refused("ALTER TABLE q178cat.t ALTER COLUMN o_totalprice TYPE DECIMAL(12,2)")
      val scaleChangeRefused =
        refused("ALTER TABLE q178cat.t ALTER COLUMN o_totalprice TYPE DECIMAL(24,3)")
      val oldKept = s.sql("SELECT * FROM q178cat.t VERSION AS OF 1")
        .schema("o_totalprice").dataType == DecimalType(12, 2)
      s.sql("""SELECT count(*) AS n_total,
        |  CAST(sum(o_orderkey) AS BIGINT) AS key_sig,
        |  CAST(sum(CAST(o_totalprice * 100 AS BIGINT)) AS BIGINT) AS cents
        |FROM q178cat.t""".stripMargin)
        .withColumn("metadata_only", lit(metadataOnly))
        .withColumn("narrowing_refused", lit(narrowingRefused))
        .withColumn("scale_change_refused", lit(scaleChangeRefused))
        .withColumn("old_schema_kept", lit(oldKept))
    },

    // HOT-KEY DE-SKEW under the oracle hash (the q172 discipline for the
    // round-10 fan-out spec): a key-clustered fact with one hot key
    // spread over several files joins a co-clustered dim under
    // `partiallyClusteredDistribution` — the join stays EXCHANGE-FREE
    // (`exchange_free`) while the hot key's splits run as MORE TASKS
    // than there are keys (`hot_fans_out`), i.e. the de-skew fan-out,
    // not one-task-per-key serialization. Rows replay relationally.
    QueryDef.checked(
      "q179_spj_hot_key_fanout",
      """WITH f AS (SELECT o_orderkey AS id,
        |    CASE WHEN o_orderkey % 5 < 3 THEN 'hot'
        |         ELSE 'c' || CAST(o_orderkey % 5 AS VARCHAR) END AS k,
        |    o_totalprice AS x FROM orders),
        |d AS (SELECT DISTINCT k,
        |        CASE WHEN k = 'hot' THEN 2.0 ELSE 3.0 END AS w FROM f)
        |SELECT f.k, count(*) AS n, CAST(sum(f.id) AS BIGINT) AS key_sig,
        |  CAST(sum(CAST(round(f.x * w * 100) AS BIGINT)) AS BIGINT) AS cents,
        |  CAST(1 AS BOOLEAN) AS hot_fans_out,
        |  CAST(1 AS BOOLEAN) AS exchange_free
        |FROM f JOIN d ON f.k = d.k GROUP BY f.k""".stripMargin) { (s, dir) =>
      val factRoot = freshRoot(s, "q179_spj_hot_key_fanout", "skew_fact", dir)
      val dimRoot = freshRoot(s, "q179_spj_hot_key_fanout", "skew_dim", dir)
      val f = t(s, dir, "orders").select(col("o_orderkey").as("id"),
        when(col("o_orderkey") % 5 < 3, lit("hot"))
          .otherwise(concat(lit("c"), (col("o_orderkey") % 5).cast("string"))).as("k"),
        col("o_totalprice").as("x"))
      // the hot key accumulates one file per clustered append → a
      // multi-file key whose splits CAN fan out
      Snapshots.publish(s, factRoot, f.filter(col("id") % 4 === 0),
        clusterBy = Some("k"))
      (1 to 3).foreach { i =>
        Snapshots.publish(s, factRoot, f.filter(col("id") % 4 === i),
          append = true, clusterBy = Some("k"))
      }
      val d = f.select(col("k")).distinct()
        .withColumn("w", when(col("k") === "hot", lit(2.0)).otherwise(lit(3.0)))
      Snapshots.publish(s, dimRoot, d, clusterBy = Some("k"))
      val nKeys = d.count()
      // evidence plans on an ISOLATED session (the q172 discipline):
      // tiny split sizing so the hot key's 4 files pack into >1 split
      val s2 = org.apache.spark.sql.graftbridge.SessionBridge.cloneWithConf(s, Map(
        "spark.sql.sources.v2.bucketing.partiallyClusteredDistribution.enabled" -> "true",
        "spark.sql.files.maxPartitionBytes" -> "8192",
        "spark.sql.files.openCostInBytes" -> "4096",
        "spark.sql.autoBroadcastJoinThreshold" -> "-1"))
      def read2(root: String) =
        s2.read.format("graft-snapshot").option("root", root).load()
      val join2 = read2(factRoot).join(read2(dimRoot).hint("merge"), "k")
      join2.count() // finalize the plan
      val exchangeFree = graft.PlanOps.shuffleCount(join2) == 0
      val hotFansOut = join2.rdd.getNumPartitions > nKeys
      val fact = s.read.format("graft-snapshot").option("root", factRoot).load()
      val dim = s.read.format("graft-snapshot").option("root", dimRoot).load()
      fact.join(dim, "k").groupBy("k")
        .agg(count(lit(1)).as("n"), sum("id").cast("long").as("key_sig"),
          sum(round(col("x") * col("w") * 100).cast("long")).as("cents"))
        .withColumn("hot_fans_out", lit(hotFansOut))
        .withColumn("exchange_free", lit(exchangeFree))
    },

    // DV CLEAN-FILE SPLIT under the oracle hash: on a range-sorted
    // table whose deleted keys all come from the lowest range, the
    // merge-on-read scan must prove MOST files clean from manifest
    // footer stats (`clean_majority` — they bypass the per-row probe
    // and the forced key-column read entirely) while still filtering
    // the dirty files' rows exactly. The oracle replays the delete
    // relationally; `dv_outstanding` pins that the dvs were live.
    QueryDef.checked(
      "q180_dv_clean_split",
      """WITH base AS (
        |  SELECT o_orderkey, o_orderpriority, o_totalprice FROM orders),
        |cut AS (SELECT min(o_orderkey) + 150 AS c FROM base),
        |survivors AS (
        |  SELECT b.* FROM base b, cut
        |  WHERE NOT (b.o_orderkey < cut.c AND b.o_orderkey % 7 = 0))
        |SELECT o_orderpriority, count(*) AS n,
        |  CAST(sum(o_orderkey) AS BIGINT) AS key_sig,
        |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents,
        |  CAST(1 AS BOOLEAN) AS dv_outstanding,
        |  CAST(1 AS BOOLEAN) AS clean_majority
        |FROM survivors GROUP BY 1""".stripMargin) { (s, dir) =>
      val root = freshRoot(s, "q180_dv_clean_split", "dv_clean", dir)
      val base = t(s, dir, "orders")
        .select("o_orderkey", "o_orderpriority", "o_totalprice")
      // range-sorted layout: each file carries a tight o_orderkey
      // envelope, so only the low range's files can contain the keys
      Snapshots.publish(s, root,
        base.repartitionByRange(8, col("o_orderkey"))
          .sortWithinPartitions("o_orderkey"))
      val cut = base.agg(min("o_orderkey")).head().getLong(0) + 150
      Snapshots.deleteByKey(s, root,
        base.filter(col("o_orderkey") < cut && col("o_orderkey") % 7 === 0)
          .select("o_orderkey"))
      val dvLive =
        Snapshots.hasDeleteVectors(s, root, Snapshots.versions(s, root).last)
      val df = s.read.format("graft-snapshot").option("root", root).load()
      df.count() // finalize the plan: the scan instance carries the split
      val scan = (df.queryExecution.executedPlan match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          a.executedPlan
        case p => p
      }).collect {
        case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec
            if b.scan.isInstanceOf[graft.sources.SnapshotScan] =>
          b.scan.asInstanceOf[graft.sources.SnapshotScan]
      }.headOption
      val cleanMajority = scan.exists(sc =>
        sc.dvCleanFileCount * 2 > sc.plannedFileCount && sc.dvCleanFileCount > 0)
      df.groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"),
          sum("o_orderkey").cast("long").as("key_sig"),
          sum(round(col("o_totalprice") * 100).cast("long")).as("cents"))
        .withColumn("dv_outstanding", lit(dvLive))
        .withColumn("clean_majority", lit(cleanMajority))
    },

    // SORTED CLUSTERED LAYOUT under the oracle hash: two sorted appends
    // with disjoint key ranges leave every priority group holding
    // multiple internally-ordered files (`#sort=` header), the scan
    // proves the inter-file order from footer envelopes and plans one
    // envelope-ordered partition per group, and the window PARTITION BY
    // key ORDER BY sortCol runs with ZERO exchange and ZERO sort
    // (`exchange_free` / `sort_free` pinned on the executed plan) — at
    // 100 TB the window costs a plain scan, no corpus-wide shuffle-sort.
    // Rows (row_number + running cents) replay relationally.
    QueryDef.checked(
      "q181_sorted_layout",
      """WITH w AS (
        |  SELECT o_orderpriority, o_orderkey,
        |    row_number() OVER
        |      (PARTITION BY o_orderpriority ORDER BY o_orderkey) AS rn,
        |    sum(CAST(round(o_totalprice * 100) AS BIGINT)) OVER
        |      (PARTITION BY o_orderpriority ORDER BY o_orderkey
        |       ROWS UNBOUNDED PRECEDING) AS run_cents
        |  FROM orders)
        |SELECT o_orderpriority, CAST(rn AS BIGINT) AS rn, o_orderkey,
        |  CAST(run_cents AS BIGINT) AS run_cents,
        |  CAST(1 AS BOOLEAN) AS exchange_free,
        |  CAST(1 AS BOOLEAN) AS sort_free
        |FROM w WHERE rn <= 5""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val root = freshRoot(s, "q181_sorted_layout", "sorted_tbl", dir)
      val base = t(s, dir, "orders")
        .select("o_orderkey", "o_orderpriority", "o_totalprice")
      val cut = base.agg(max("o_orderkey")).head().getLong(0) / 2
      Snapshots.publish(s, root, base.filter(col("o_orderkey") <= cut),
        clusterBy = Some("o_orderpriority"), sortBy = Some("o_orderkey"))
      Snapshots.publish(s, root, base.filter(col("o_orderkey") > cut),
        append = true, clusterBy = Some("o_orderpriority"), sortBy = Some("o_orderkey"))
      val w = Window.partitionBy("o_orderpriority").orderBy("o_orderkey")
      val q = s.read.format("graft-snapshot").option("root", root).load()
        .withColumn("rn", row_number().over(w).cast("long"))
        .withColumn("run_cents", sum(round(col("o_totalprice") * 100).cast("long"))
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .filter(col("rn") <= 5)
        .select("o_orderpriority", "rn", "o_orderkey", "run_cents")
      q.count() // finalize the (possibly adaptive) plan
      q.withColumn("exchange_free", lit(graft.PlanOps.shuffleCount(q) == 0))
        .withColumn("sort_free", lit(graft.PlanOps.sortCount(q) == 0))
    },

    // SORTED-BUCKET JOIN (the Hive-SMB shape, storage-partitioned): two
    // tables clustered by the same key and sorted by the same column
    // join on the FULL `(key, sortCol)` prefix with ZERO exchange and
    // ZERO sort on either side — key-grouped co-partitioning on the key
    // already co-locates every match, and the proved file order supplies
    // both SMJ sort requirements. Needs
    // `requireAllClusterKeysForCoPartition=false` (join keys are a
    // superset of the partition keys), set on an isolated session; rows
    // COME FROM the sorted plan, so the oracle hash certifies the
    // zero-exchange zero-sort join end-to-end.
    QueryDef.checked(
      "q182_sorted_bucket_join",
      """WITH l AS (SELECT o_orderkey, o_orderpriority, o_totalprice FROM orders),
        |r AS (SELECT o_orderkey, o_orderpriority, o_custkey FROM orders)
        |SELECT l.o_orderpriority, count(*) AS n,
        |  CAST(sum(l.o_orderkey) AS BIGINT) AS key_sig,
        |  CAST(sum(CAST(round(l.o_totalprice * 100) AS BIGINT)
        |    * (1 + r.o_custkey % 7)) AS BIGINT) AS cross_sig,
        |  CAST(1 AS BOOLEAN) AS exchange_free,
        |  CAST(1 AS BOOLEAN) AS sort_free
        |FROM l JOIN r ON l.o_orderpriority = r.o_orderpriority
        |  AND l.o_orderkey = r.o_orderkey
        |GROUP BY 1""".stripMargin) { (s, dir) =>
      val leftRoot = freshRoot(s, "q182_sorted_bucket_join", "smb_left", dir)
      val rightRoot = freshRoot(s, "q182_sorted_bucket_join", "smb_right", dir)
      val orders = t(s, dir, "orders")
      Snapshots.publish(s, leftRoot,
        orders.select("o_orderkey", "o_orderpriority", "o_totalprice"),
        clusterBy = Some("o_orderpriority"), sortBy = Some("o_orderkey"))
      Snapshots.publish(s, rightRoot,
        orders.select("o_orderkey", "o_orderpriority", "o_custkey"),
        clusterBy = Some("o_orderpriority"), sortBy = Some("o_orderkey"))
      // isolated session: the relaxed co-partition rule must not leak
      // into concurrently-planning queries on the shared session
      val s2 = s.newSession()
      s2.conf.set("spark.sql.requireAllClusterKeysForCoPartition", "false")
      s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      def read2(root: String) =
        s2.read.format("graft-snapshot").option("root", root).load()
      val q = read2(leftRoot)
        .join(read2(rightRoot), Seq("o_orderpriority", "o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"),
          sum("o_orderkey").cast("long").as("key_sig"),
          sum(round(col("o_totalprice") * 100).cast("long")
            * (lit(1) + col("o_custkey") % 7)).cast("long").as("cross_sig"))
      q.count() // finalize the (possibly adaptive) plan
      q.withColumn("exchange_free", lit(graft.PlanOps.shuffleCount(q) == 0))
        .withColumn("sort_free", lit(graft.PlanOps.sortCount(q) == 0))
    },

    // HASH-BUCKET CLUSTERING under the oracle hash: orders and customer
    // publish as `bucket(16, custkey)` tables — one file set per BUCKET
    // (pmod(murmur3, 16)), not per raw value, so the layout holds at ANY
    // key cardinality where identity clustering would write one file per
    // key. The scan reports key-grouped partitioning over the bucket
    // TRANSFORM (resolved through the catalog's `bucket` V2 function)
    // and the 10k-key fact⋈dim join plans with ZERO exchanges
    // (`exchange_free`), both tables bounded to ≤16 files
    // (`bounded_files`). Rows come FROM the bucketed plan; the oracle
    // replays the join relationally.
    QueryDef.checked(
      "q183_bucket_cluster_join",
      """SELECT c.c_mktsegment, count(*) AS n,
        |  CAST(sum(o.o_orderkey) AS BIGINT) AS key_sig,
        |  CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents,
        |  CAST(1 AS BOOLEAN) AS exchange_free,
        |  CAST(1 AS BOOLEAN) AS bounded_files
        |FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        |GROUP BY 1""".stripMargin) { (s, dir) =>
      val wh = freshRoot(s, "q183_bucket_cluster_join", "bucket_wh", dir)
      Snapshots.publish(s, s"$wh/fact",
        t(s, dir, "orders").select("o_orderkey", "o_custkey", "o_totalprice"),
        clusterBy = Some("bucket(16, o_custkey)"))
      Snapshots.publish(s, s"$wh/dim",
        t(s, dir, "customer").select("c_custkey", "c_mktsegment"),
        clusterBy = Some("bucket(16, c_custkey)"))
      val boundedFiles =
        Snapshots.files(s, s"$wh/fact", 1).size <= 16 &&
          Snapshots.files(s, s"$wh/dim", 1).size <= 16
      // isolated session: the bucket SPJ needs the catalog (the V2
      // `bucket` function resolves through it) and no broadcast escape;
      // rows come from this plan, so the oracle hash certifies it
      val s2 = s.newSession()
      s2.conf.set("spark.sql.catalog.q183cat",
        classOf[graft.sources.SnapshotCatalog].getName)
      s2.conf.set("spark.sql.catalog.q183cat.warehouse", wh)
      s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = s2.table("q183cat.fact")
        .join(s2.table("q183cat.dim").hint("merge"),
          col("o_custkey") === col("c_custkey"))
      joined.count() // finalize the (possibly adaptive) plan
      // evidence on the bare join: the mktsegment regroup above it owns
      // one legitimate exchange (it clusters on a different key)
      val exchangeFree = graft.PlanOps.shuffleCount(joined) == 0
      joined.groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n"),
          sum("o_orderkey").cast("long").as("key_sig"),
          sum(round(col("o_totalprice") * 100).cast("long")).as("cents"))
        .withColumn("exchange_free", lit(exchangeFree))
        .withColumn("bounded_files", lit(boundedFiles))
    },

    // MANAGED MATERIALIZED VIEW, incrementally refreshed: the grouped
    // count/sum lives as its own bucket-clustered snapshot table
    // (Mv.create records the base version as the manifest batch id —
    // the refresh watermark needs no side state); a CoW MERGE plus an
    // append then land on the base, and ONE Mv.refresh applies their
    // row-level change feed to the touched groups only, with groups
    // whose count hits zero tombstoned away. The oracle recomputes the
    // aggregate from a full relational replay of the mutations, so the
    // hash certifies incremental-apply ≡ recompute; flags pin that the
    // refresh really ran incrementally (not the full fallback), that a
    // replayed refresh is a no-op (exactly-once), and that the merge
    // shared pre-refresh files by name (CoW, not a view rewrite).
    QueryDef.checked(
      "q184_mv_refresh",
      """WITH base AS (
        |  SELECT o_orderkey AS k, CAST(o_orderkey % 1000 AS VARCHAR) AS g,
        |         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        |  FROM orders),
        |survivors AS (SELECT * FROM base WHERE k % 1000 < 995),
        |mutated AS (
        |  SELECT k,
        |    CASE WHEN k % 1000 IN (10, 11) THEN '9-MOVED' ELSE g END AS g,
        |    CASE WHEN k % 1000 < 10 THEN cents + 11 ELSE cents END AS cents
        |  FROM survivors
        |  UNION ALL
        |  SELECT k + 100000000, 'Z-NEW', cents % 1000 FROM base WHERE k % 13 = 0)
        |SELECT g, CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(sum(cents) AS BIGINT) AS sum_cents,
        |  CAST(1 AS BOOLEAN) AS refreshed_incrementally,
        |  CAST(1 AS BOOLEAN) AS replay_noop,
        |  CAST(1 AS BOOLEAN) AS files_shared,
        |  CAST(1 AS BOOLEAN) AS files_replaced
        |FROM mutated GROUP BY 1""".stripMargin) { (s, dir) =>
      import graft.operators.Mv
      val root = freshRoot(s, "q184_mv_refresh", "mv", dir)
      // ~1000 groups so the mutations below touch a small fraction of
      // them — the file-sharing evidence needs genuinely untouched
      // buckets at every fixture scale (dense keys: k % 1000 covers the
      // whole group range even at sf0.001)
      val base = t(s, dir, "orders").select(
        col("o_orderkey").as("k"),
        (col("o_orderkey") % 1000).cast("string").as("g"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
      Snapshots.publish(s, s"$root/base", base)
      Mv.create(s, s"$root/mv", s"$root/base",
        baseKeyCols = Seq("k"), groupCols = Seq("g"), sumCols = Seq("cents"),
        mvBuckets = 8)
      val beforeFiles = Snapshots.files(s, s"$root/mv", 1).toSet
      // one CoW MERGE carrying all three row classes: in-group update
      // (groups 0-9 bump cents), group move (groups 10/11 drain into
      // '9-MOVED' — vanished groups), tombstone delete (995-999 vanish)
      Snapshots.mergeByKey(s, s"$root/base",
        base.filter(col("k") % 1000 < 10)
          .withColumn("cents", col("cents") + 11)
          .unionByName(base.filter(col("k") % 1000 === 10 || col("k") % 1000 === 11)
            .withColumn("g", lit("9-MOVED")))
          .withColumn("dead", lit(false))
          .unionByName(base.filter(col("k") % 1000 >= 995).withColumn("dead", lit(true))),
        Seq("k"), tombstoneCol = Some("dead"))
      // plain append: a brand-new group arrives
      Snapshots.publish(s, s"$root/base",
        base.filter(col("k") % 13 === 0)
          .withColumn("k", col("k") + 100000000L)
          .withColumn("g", lit("Z-NEW"))
          .withColumn("cents", col("cents") % 1000),
        append = true)
      val r1 = Mv.refresh(s, s"$root/mv")
      val r2 = Mv.refresh(s, s"$root/mv")
      val afterFiles = Snapshots.files(s, s"$root/mv",
        Snapshots.versions(s, s"$root/mv").last).toSet
      Mv.read(s, s"$root/mv")
        .select(col("g"), col("n_rows"), col("sum_cents"))
        .withColumn("refreshed_incrementally", lit(r1.mode == "incremental"))
        .withColumn("replay_noop", lit(r2.mode == "noop"))
        .withColumn("files_shared", lit((beforeFiles & afterFiles).nonEmpty))
        .withColumn("files_replaced", lit((beforeFiles -- afterFiles).nonEmpty))
    },

    // THREE-WAY co-bucketed SPJ — the 100 TB star-join shape: two fact
    // tables and a dim, all hash-bucket-clustered on the customer key
    // with the same bucket count, join pairwise with ZERO exchanges —
    // the first join's output keeps its key-grouped partitioning, so
    // the second join co-locates against it too (only the final
    // mktsegment regroup, a different key, legitimately shuffles). The
    // oracle recomputes the whole star relationally under the hash;
    // `exchange_free` pins the plan.
    QueryDef.checked(
      "q185_three_way_bucket_join",
      """WITH f AS (SELECT o_custkey AS k, o_orderkey, o_totalprice FROM orders),
        |u AS (SELECT o_custkey AS k, count(*) AS urgent_cnt FROM orders
        |      WHERE o_orderpriority = '1-URGENT' GROUP BY 1),
        |c AS (SELECT c_custkey AS k, c_mktsegment FROM customer)
        |SELECT c.c_mktsegment, count(*) AS n,
        |  CAST(sum(f.o_orderkey) AS BIGINT) AS key_sig,
        |  CAST(sum(u.urgent_cnt) AS BIGINT) AS urgent_sig,
        |  CAST(sum(CAST(round(f.o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents,
        |  CAST(1 AS BOOLEAN) AS exchange_free
        |FROM f JOIN c ON f.k = c.k JOIN u ON f.k = u.k
        |GROUP BY 1""".stripMargin) { (s, dir) =>
      val wh = freshRoot(s, "q185_three_way_bucket_join", "star_wh", dir)
      Snapshots.publish(s, s"$wh/fact",
        t(s, dir, "orders").select(col("o_custkey").as("k"),
          col("o_orderkey"), col("o_totalprice")),
        clusterBy = Some("bucket(16, k)"))
      Snapshots.publish(s, s"$wh/urgent",
        t(s, dir, "orders").filter(col("o_orderpriority") === "1-URGENT")
          .groupBy(col("o_custkey").as("k"))
          .agg(count(lit(1)).as("urgent_cnt")),
        clusterBy = Some("bucket(16, k)"))
      Snapshots.publish(s, s"$wh/dim",
        t(s, dir, "customer").select(col("c_custkey").as("k"), col("c_mktsegment")),
        clusterBy = Some("bucket(16, k)"))
      // isolated session: bucket SPJ resolves the V2 `bucket` function
      // through the catalog; broadcast off so the evidence is the layout
      val s2 = s.newSession()
      s2.conf.set("spark.sql.catalog.q185cat",
        classOf[graft.sources.SnapshotCatalog].getName)
      s2.conf.set("spark.sql.catalog.q185cat.warehouse", wh)
      s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val star = s2.table("q185cat.fact")
        .join(s2.table("q185cat.dim").hint("merge"), "k")
        .join(s2.table("q185cat.urgent").hint("merge"), "k")
      star.count() // finalize the (possibly adaptive) plan
      val exchangeFree = graft.PlanOps.shuffleCount(star) == 0
      star.groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n"),
          sum("o_orderkey").cast("long").as("key_sig"),
          sum("urgent_cnt").cast("long").as("urgent_sig"),
          sum(round(col("o_totalprice") * 100).cast("long")).as("cents"))
        .withColumn("exchange_free", lit(exchangeFree))
    },

    // WRITE–AUDIT–PUBLISH: a corrupted candidate batch stages
    // INVISIBLY (readers and history see nothing), fails its
    // Expectations gate, and aborts with its files reclaimed and the
    // table bit-intact; the clean batch then stages, passes the same
    // gate, and promotes by ONE atomic manifest rename. The oracle is
    // the full relational result — the hash certifies that exactly the
    // audited rows landed and none of the rejected ones; flags pin
    // each WAP step.
    QueryDef.checked(
      "q186_write_audit_publish",
      """SELECT o_orderpriority, count(*) AS n,
        |  CAST(sum(o_orderkey) AS BIGINT) AS key_sig,
        |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents,
        |  CAST(1 AS BOOLEAN) AS staged_invisible,
        |  CAST(1 AS BOOLEAN) AS audit_rejected,
        |  CAST(1 AS BOOLEAN) AS abort_clean,
        |  CAST(1 AS BOOLEAN) AS promoted_visible
        |FROM orders GROUP BY 1""".stripMargin) { (s, dir) =>
      import graft.operators.Expectations
      val root = freshRoot(s, "q186_write_audit_publish", "wap", dir)
      val ord = t(s, dir, "orders")
        .select("o_orderkey", "o_orderpriority", "o_totalprice")
      val evens = ord.filter(col("o_orderkey") % 2 === 0)
      val odds = ord.filter(col("o_orderkey") % 2 === 1)
      Snapshots.publish(s, root, evens)
      val baseCount = Snapshots.read(s, root).count()
      val checks = Seq(
        Expectations.NotNull("o_orderpriority"),
        Expectations.Satisfies("price_positive", col("o_totalprice") > 0))
      // candidate 1: a corrupted batch — audit must reject it
      val badToken = Snapshots.publishStaged(s, root,
        odds.withColumn("o_totalprice",
          when(col("o_orderkey") % 5 === 0, -col("o_totalprice"))
            .otherwise(col("o_totalprice"))), append = true)
      val stagedInvisible = Snapshots.read(s, root).count() == baseCount &&
        Snapshots.versions(s, root) == Seq(1)
      val auditRejected =
        try { Expectations.gate(Snapshots.readStaged(s, root, badToken), checks); false }
        catch { case _: IllegalStateException => true }
      Snapshots.abort(s, root, badToken)
      val abortClean = Snapshots.versions(s, root) == Seq(1) &&
        Snapshots.listStaged(s, root).isEmpty &&
        Snapshots.read(s, root).count() == baseCount
      // candidate 2: the clean batch — audit passes, promote lands it
      val okToken = Snapshots.publishStaged(s, root, odds, append = true)
      Expectations.gate(Snapshots.readStaged(s, root, okToken), checks)
      val v = Snapshots.promote(s, root, okToken)
      val promotedVisible = Snapshots.versions(s, root) == Seq(1, v)
      Snapshots.read(s, root)
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"),
          sum("o_orderkey").cast("long").as("key_sig"),
          sum(round(col("o_totalprice") * 100).cast("long")).as("cents"))
        .withColumn("staged_invisible", lit(stagedInvisible))
        .withColumn("audit_rejected", lit(auditRejected))
        .withColumn("abort_clean", lit(abortClean))
        .withColumn("promoted_visible", lit(promotedVisible))
    },

    // SQL METADATA TABLES: `t.files` / `t.history` answer the ops
    // questions (how many files, how big, what landed when) from
    // manifest lines alone — the flags prove the metadata is EXACT
    // against the data it describes: per-file `#rows=` lines sum to the
    // real row count, every file carries a byte length, the clustered
    // layout's split dirs surface, and history classifies the
    // load + append operation sequence. The oracle recomputes the real
    // aggregate the metadata must agree with.
    QueryDef.checked(
      "q187_metadata_tables",
      """WITH t AS (
        |  SELECT o_orderkey, o_orderpriority, o_totalprice FROM orders
        |  WHERE o_orderkey % 2 = 0
        |  UNION ALL
        |  SELECT o_orderkey, o_orderpriority, o_totalprice FROM orders
        |  WHERE o_orderkey % 2 = 1 AND o_orderkey % 3 = 0)
        |SELECT o_orderpriority, count(*) AS n,
        |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents,
        |  CAST(1 AS BOOLEAN) AS meta_rows_exact,
        |  CAST(1 AS BOOLEAN) AS meta_bytes_complete,
        |  CAST(1 AS BOOLEAN) AS cluster_dirs_surfaced,
        |  CAST(1 AS BOOLEAN) AS history_classified
        |FROM t GROUP BY 1""".stripMargin) { (s, dir) =>
      val wh = freshRoot(s, "q187_metadata_tables", "meta_wh", dir)
      val ord = t(s, dir, "orders")
        .select("o_orderkey", "o_orderpriority", "o_totalprice")
      Snapshots.publish(s, s"$wh/t",
        ord.filter(col("o_orderkey") % 2 === 0),
        clusterBy = Some("o_orderpriority"))
      Snapshots.publish(s, s"$wh/t",
        ord.filter(col("o_orderkey") % 2 === 1 && col("o_orderkey") % 3 === 0),
        append = true)
      val s2 = s.newSession()
      s2.conf.set("spark.sql.catalog.q187cat",
        classOf[graft.sources.SnapshotCatalog].getName)
      s2.conf.set("spark.sql.catalog.q187cat.warehouse", wh)
      val meta = s2.sql(
        """SELECT sum(rows) AS r, count(*) AS f,
          |  sum(CASE WHEN bytes IS NULL THEN 1 ELSE 0 END) AS unsized,
          |  count(DISTINCT cluster_dir) AS dirs
          |FROM q187cat.t.files""".stripMargin).head()
      val table = s2.table("q187cat.t")
      val realCount = table.count()
      val metaRowsExact = !meta.isNullAt(0) && meta.getLong(0) == realCount
      val metaBytesComplete = meta.getLong(2) == 0L
      // v1 wrote one dir per priority; the append's files are dirless
      val clusterDirs = meta.getLong(3) == 5L
      val hist = s2.sql(
        "SELECT operation FROM q187cat.t.history ORDER BY version").collect()
        .map(_.getString(0)).toSeq
      val historyClassified = hist.length == 2 && hist.last == "append"
      table.groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"),
          sum(round(col("o_totalprice") * 100).cast("long")).as("cents"))
        .withColumn("meta_rows_exact", lit(metaRowsExact))
        .withColumn("meta_bytes_complete", lit(metaBytesComplete))
        .withColumn("cluster_dirs_surfaced", lit(clusterDirs))
        .withColumn("history_classified", lit(historyClassified))
    },

    // DEEP CLONE / EXPORT: one version's files copy executor-parallel
    // to a fresh root whose v1 carries every manifest attestation the
    // identical bytes justify — the oracle hash certifies the cloned
    // rows, and the flags pin that stats (exact metadata row count at
    // the destination with zero file opens), byte inventories, and the
    // SPJ-ready cluster layout all carried, with a fresh single-version
    // history fully independent of the source lifecycle.
    QueryDef.checked(
      "q188_snapshot_clone",
      """SELECT o_orderpriority, count(*) AS n,
        |  CAST(sum(o_orderkey) AS BIGINT) AS key_sig,
        |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents,
        |  CAST(1 AS BOOLEAN) AS stats_carried,
        |  CAST(1 AS BOOLEAN) AS bytes_carried,
        |  CAST(1 AS BOOLEAN) AS layout_carried,
        |  CAST(1 AS BOOLEAN) AS history_fresh,
        |  CAST(1 AS BOOLEAN) AS survives_source_vacuum
        |FROM orders WHERE o_orderkey % 2 = 0 GROUP BY 1""".stripMargin) { (s, dir) =>
      val root = freshRoot(s, "q188_snapshot_clone", "clone", dir)
      val src = s"$root/src"; val dst = s"$root/dst"
      val evens = t(s, dir, "orders")
        .select("o_orderkey", "o_orderpriority", "o_totalprice")
        .filter(col("o_orderkey") % 2 === 0)
      Snapshots.publish(s, src, evens, clusterBy = Some("o_orderpriority"))
      Snapshots.publish(s, src, evens.limit(0), append = false) // v2 head moves
      Snapshots.cloneTo(s, src, dst, Some(1))
      val realCount = Snapshots.read(s, dst).count()
      val statsCarried = Snapshots.countRows(s, dst).contains(realCount)
      val bytesCarried =
        Snapshots.byteCountsOf(s, dst, 1) == Snapshots.byteCountsOf(s, src, 1)
      val layoutCarried = Snapshots.clusterOf(s, dst, 1).contains("o_orderpriority")
      val historyFresh = Snapshots.versions(s, dst) == Seq(1)
      // the exported version outlives the source's entire lifecycle
      Snapshots.expire(s, src, keepLast = 1)
      Snapshots.vacuum(s, src, graceMs = 0L)
      val survives = Snapshots.read(s, dst).count() == realCount
      Snapshots.read(s, dst)
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"),
          sum("o_orderkey").cast("long").as("key_sig"),
          sum(round(col("o_totalprice") * 100).cast("long")).as("cents"))
        .withColumn("stats_carried", lit(statsCarried))
        .withColumn("bytes_carried", lit(bytesCarried))
        .withColumn("layout_carried", lit(layoutCarried))
        .withColumn("history_fresh", lit(historyFresh))
        .withColumn("survives_source_vacuum", lit(survives))
    },

    // ROW-LEVEL QUARANTINE (dead-letter) split: a corrupted feed —
    // injected NULL groups, negative prices, duplicated keys — splits
    // into a clean side that passes EVERY expectation and a quarantine
    // side where each row names its FIRST failing check (declaration
    // order; both copies of a duplicated key quarantine, which is what
    // makes the survivor side actually unique). The oracle replays the
    // whole classification — injection, first-failing CASE, the
    // duplicate window — relationally, so the hash certifies that not
    // one row was silently dropped or mis-attributed.
    QueryDef.checked(
      "q189_quarantine_split",
      """WITH inj AS (
        |  SELECT o_orderkey AS k,
        |    CASE WHEN o_orderkey % 17 = 0 THEN NULL ELSE o_orderpriority END AS pri,
        |    CASE WHEN o_orderkey % 19 = 0 THEN -o_totalprice ELSE o_totalprice END AS price
        |  FROM orders
        |  UNION ALL
        |  SELECT o_orderkey,
        |    CASE WHEN o_orderkey % 17 = 0 THEN NULL ELSE o_orderpriority END,
        |    CASE WHEN o_orderkey % 19 = 0 THEN -o_totalprice ELSE o_totalprice END
        |  FROM orders WHERE o_orderkey % 23 = 0),
        |cls AS (
        |  SELECT pri, price, CASE
        |    WHEN pri IS NULL THEN 'not_null:pri'
        |    WHEN NOT (price > 0) THEN 'satisfies:price_positive'
        |    WHEN count(*) OVER (PARTITION BY k) > 1 THEN 'unique:k'
        |    END AS violation
        |  FROM inj)
        |SELECT grp, CAST(n AS BIGINT) AS n, CAST(cents AS BIGINT) AS cents,
        |  CAST(1 AS BOOLEAN) AS partition_exact,
        |  CAST(1 AS BOOLEAN) AS survivors_pass_all
        |FROM (
        |  SELECT pri AS grp, count(*) AS n,
        |    sum(CAST(round(price * 100) AS BIGINT)) AS cents
        |  FROM cls WHERE violation IS NULL GROUP BY 1
        |  UNION ALL
        |  SELECT violation, count(*), 0 FROM cls
        |  WHERE violation IS NOT NULL GROUP BY 1) u""".stripMargin) { (s, dir) =>
      import graft.operators.Expectations
      val inj0 = t(s, dir, "orders").select(
        col("o_orderkey").as("k"),
        when(col("o_orderkey") % 17 === 0, lit(null).cast("string"))
          .otherwise(col("o_orderpriority")).as("pri"),
        when(col("o_orderkey") % 19 === 0, -col("o_totalprice"))
          .otherwise(col("o_totalprice")).as("price"))
      val inj = inj0.unionAll(inj0.filter(col("k") % 23 === 0))
      val checks = Seq(
        Expectations.NotNull("pri"),
        Expectations.Satisfies("price_positive", col("price") > 0),
        Expectations.Unique(Seq("k")))
      val (good, bad) = Expectations.split(inj, checks)
      val partitionExact = good.count() + bad.count() == inj.count()
      val survivorsPass =
        Expectations.report(good, checks).filter(!col("passed")).isEmpty
      good.groupBy(col("pri").as("grp"))
        .agg(count(lit(1)).as("n"),
          sum(round(col("price") * 100).cast("long")).as("cents"))
        .unionByName(bad.groupBy(col("violation").as("grp"))
          .agg(count(lit(1)).as("n"), lit(0L).as("cents")))
        .withColumn("partition_exact", lit(partitionExact))
        .withColumn("survivors_pass_all", lit(survivorsPass))
    },

    // INCREMENTAL REPLICATION: a replica tracks the source head across
    // an append and a CoW delete with each sync copying ONLY the files
    // the replica doesn't already reference (immutable files make
    // relative paths content-stable, so manifest presence IS a byte
    // identity proof). The oracle recomputes the final source state;
    // flags pin that the append sync moved exactly the delta, a
    // no-change sync commits nothing, and the replica answers exact
    // counts from its own manifest with zero file opens.
    QueryDef.checked(
      "q190_replication_sync",
      """WITH survivors AS (
        |  SELECT o_orderkey, o_orderpriority, o_totalprice FROM orders
        |  WHERE o_orderkey >= (SELECT min(o_orderkey) + 10 FROM orders))
        |SELECT o_orderpriority, count(*) AS n,
        |  CAST(sum(o_orderkey) AS BIGINT) AS key_sig,
        |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents,
        |  CAST(1 AS BOOLEAN) AS delta_only,
        |  CAST(1 AS BOOLEAN) AS nochange_noop,
        |  CAST(1 AS BOOLEAN) AS meta_exact
        |FROM survivors GROUP BY 1""".stripMargin) { (s, dir) =>
      val root = freshRoot(s, "q190_replication_sync", "repl", dir)
      val src = s"$root/src"; val dst = s"$root/dst"
      val ord = t(s, dir, "orders")
        .select("o_orderkey", "o_orderpriority", "o_totalprice")
      Snapshots.publish(s, src, ord.filter(col("o_orderkey") % 2 === 0))
      Snapshots.syncTo(s, src, dst) // bootstrap = clone
      Snapshots.publish(s, src, ord.filter(col("o_orderkey") % 2 === 1),
        append = true)
      val delta = (Snapshots.files(s, src, 2).toSet --
        Snapshots.files(s, src, 1).toSet).size.toLong
      val (nf2, _) = Snapshots.syncTo(s, src, dst)
      val deltaOnly = nf2 == delta && delta > 0
      val noChange = Snapshots.syncTo(s, src, dst) == ((0L, 0L)) &&
        Snapshots.versions(s, dst) == Seq(1, 2)
      val lo = ord.agg(min("o_orderkey")).head.getLong(0)
      Snapshots.deleteWhere(s, src, col("o_orderkey") < lo + 10)
      Snapshots.syncTo(s, src, dst)
      val metaExact =
        Snapshots.countRows(s, dst).contains(Snapshots.read(s, src).count())
      Snapshots.read(s, dst)
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"),
          sum("o_orderkey").cast("long").as("key_sig"),
          sum(round(col("o_totalprice") * 100).cast("long")).as("cents"))
        .withColumn("delta_only", lit(deltaOnly))
        .withColumn("nochange_noop", lit(noChange))
        .withColumn("meta_exact", lit(metaExact))
    }
  )
}
