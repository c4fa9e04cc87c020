package graft.queries

import graft.{QueryDef, Tables}
import graft.operators.{Compact, Migrate, Reconcile}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** End-to-end operator queries: each runs a real migrate/compact/reconcile
  * against a scratch directory, reads the *destination* back, and returns a
  * manifest that the DuckDB oracle recomputes from the *source* — so a hash
  * match proves the operator moved/rewrote data losslessly (the row-level
  * form of the reference's post-copy check, CommonUtils.java:99-124).
  */
object Ops {

  private def scratch(owner: String, kind: String, dir: String): String =
    graft.Scratch.dir(owner, kind, dir)

  val entries: Seq[QueryDef] = Seq(

    // TransTablePartition end-to-end: migrate one month of lineitem by day,
    // manifest the DESTINATION; oracle manifests the SOURCE.
    QueryDef.checked(
      "q26_migrate_roundtrip",
      """SELECT strftime(l_shipdate, '%Y%m%d') AS par_key,
        |  count(*) AS n_rows, sum(l_quantity) AS sum_qty,
        |  sum(l_extendedprice) AS sum_price
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-03-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
        |GROUP BY 1""".stripMargin) { (s, dir) =>
      val dest = scratch("q26_migrate_roundtrip", "migrate", dir)
      Migrate.migrateRange(s, s"$dir/lineitem.parquet", dest,
        dateCol = "l_shipdate", start = "1996-03-01", end = "1996-03-31")
      s.read.parquet(dest)
        .groupBy(col("par_key").cast("string").as("par_key"))
        .agg(
          count(lit(1)).as("n_rows"),
          sum(col("l_quantity")).as("sum_qty"),
          sum(col("l_extendedprice")).as("sum_price"))
    },

    // HDFSMerge end-to-end: compact one year of orders into day partitions,
    // manifest the DESTINATION; oracle manifests the SOURCE month-by-month.
    QueryDef.checked(
      "q27_compact_roundtrip",
      """SELECT strftime(o_orderdate, '%Y%m') AS par_key,
        |  count(*) AS n_rows, sum(o_totalprice) AS sum_price
        |FROM orders GROUP BY 1""".stripMargin) { (s, dir) =>
      val dest = scratch("q27_compact_roundtrip", "compact", dir)
      Compact.rewritePartitioned(s, s"$dir/orders.parquet", dest,
        partKeyCol = "o_orderdate", pattern = "yyyyMM")
      s.read.parquet(dest)
        .groupBy(col("par_key").cast("string").as("par_key"))
        .agg(count(lit(1)).as("n_rows"), sum(col("o_totalprice")).as("sum_price"))
    },

    // checkFile end-to-end: reconcile source month vs the q26 destination;
    // every partition must come back "ok".
    QueryDef.checked(
      "q28_reconcile_clean",
      """SELECT strftime(l_shipdate, '%Y%m%d') AS par_key, 'ok' AS status
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-03-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
        |GROUP BY 1""".stripMargin) { (s, dir) =>
      val dest = scratch("q28_reconcile_clean", "reconcile", dir)
      Migrate.migrateRange(s, s"$dir/lineitem.parquet", dest,
        dateCol = "l_shipdate", start = "1996-03-01", end = "1996-03-31")
      val srcCols = Tables.load(s, dir, "lineitem").columns
      val src = Tables.load(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-03-01 00:00:00").cast("timestamp") &&
          col("l_shipdate") < lit("1996-04-01 00:00:00").cast("timestamp"))
      // manifest over identical column sets/orders on both sides (reading a
      // partitionBy layout appends par_key; select restores source order)
      val dst = s.read.parquet(dest).select(srcCols.map(col).toIndexedSeq: _*)
      val sm = Reconcile.manifest(src, date_format(col("l_shipdate"), "yyyyMMdd"))
      val dm = Reconcile.manifest(dst, date_format(col("l_shipdate"), "yyyyMMdd"))
      Reconcile.diff(sm, dm).select(col("par_key"), col("status"))
    },

    // Two-level layout end-to-end (the reference's -sp true,
    // HDFSMerge.java:64,90-112): migrate one month of lineitem into a
    // par_key=yyyyMMdd/par_sub=<returnflag>/ layout, compact that layout
    // preserving both levels, then reconcile source vs the COMPACTED
    // destination at (day, flag) grain — output is the destination's
    // per-leaf row count with its reconcile status, which the oracle
    // recomputes from the source (every status must be 'ok').
    QueryDef.checked(
      "q56_two_level_roundtrip",
      """SELECT strftime(l_shipdate, '%Y%m%d') AS par_key,
        |  l_returnflag AS par_sub, count(*) AS n_rows, 'ok' AS status
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-03-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
        |GROUP BY 1, 2""".stripMargin) { (s, dir) =>
      val sub = Migrate.SubPart("l_returnflag", pattern = None, name = "par_sub")
      val migrated = scratch("q56_two_level_roundtrip", "twolevel_m", dir)
      val compacted = scratch("q56_two_level_roundtrip", "twolevel_c", dir)
      Migrate.migrateRange(s, s"$dir/lineitem.parquet", migrated,
        dateCol = "l_shipdate", start = "1996-03-01", end = "1996-03-31",
        subPart = Some(sub))
      Compact.rewritePartitioned(s, migrated, compacted,
        partKeyCol = "l_shipdate", subPart = Some(sub))
      val srcCols = Tables.load(s, dir, "lineitem").columns
      val src = Tables.load(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-03-01 00:00:00").cast("timestamp") &&
          col("l_shipdate") < lit("1996-04-01 00:00:00").cast("timestamp"))
      val dst = s.read.parquet(compacted).select(srcCols.map(col).toIndexedSeq: _*)
      val key = concat_ws("/", date_format(col("l_shipdate"), "yyyyMMdd"), col("l_returnflag"))
      Reconcile.diff(Reconcile.manifest(src, key), Reconcile.manifest(dst, key))
        .select(
          substring_index(col("par_key"), "/", 1).as("par_key"),
          substring_index(col("par_key"), "/", -1).as("par_sub"),
          col("dst_rows").as("n_rows"),
          col("status"))
    },

    // the WAREHOUSE convention end-to-end (KeyConstant.java:26 as catalog
    // metadata): register the source as a db.table, migrate BY NAME, and
    // read the result back through the registered, partition-discovered
    // destination table — a hash match proves the whole catalog path
    // (location resolution → migrate → register → SHOW PARTITIONS-backed
    // read) moved the data losslessly.
    QueryDef.checked(
      "q63_catalog_roundtrip",
      """SELECT strftime(o_orderdate, '%Y%m') AS par_key,
        |  count(*) AS n_rows, sum(o_totalprice) AS sum_price
        |FROM orders GROUP BY 1""".stripMargin) { (s, dir) =>
      val safe = dir.replaceAll("[^a-z0-9]", "_")
      val root = scratch("q63_catalog_roundtrip", "catalog", dir)
      s.sql(s"CREATE DATABASE IF NOT EXISTS gcat_src_$safe LOCATION '$root/src.db'")
      s.sql(s"CREATE DATABASE IF NOT EXISTS gcat_dst_$safe LOCATION '$root/dst.db'")
      graft.operators.Catalog.register(s, s"gcat_src_$safe", "orders",
        s"$dir/orders.parquet")
      graft.operators.Catalog.migrateAllTable(s,
        s"gcat_src_$safe.orders", s"gcat_dst_$safe.orders",
        dateCol = "o_orderdate", pattern = "yyyyMM")
      s.table(s"gcat_dst_$safe.orders")
        .groupBy(col("par_key").cast("string").as("par_key"))
        .agg(count(lit(1)).as("n_rows"), sum(col("o_totalprice")).as("sum_price"))
    },

    // statistics triage end-to-end: lay events out by day, then read per-day
    // row counts AND value min/max from parquet FOOTERS ONLY (no data page
    // touched); the oracle recomputes the same numbers from the data — a
    // hash match proves footer statistics are the exact SQL min/max, i.e.
    // the metadata tier is trustworthy for value-range drift triage.
    QueryDef.checked(
      "q67_stats_triage",
      """SELECT strftime(ts, '%Y%m%d') AS par_key, count(*) AS n_rows,
        |  min(value) AS value_min, max(value) AS value_max,
        |  count(*) - count(value) AS value_nulls
        |FROM events GROUP BY 1""".stripMargin) { (s, dir) =>
      val dest = scratch("q67_stats_triage", "stats", dir)
      Tables.load(s, dir, "events")
        .withColumn("par_key", date_format(col("ts"), "yyyyMMdd"))
        .write.partitionBy("par_key").mode("overwrite").parquet(dest)
      Reconcile.statsManifest(s, dest, Seq("value"))
        .select(col("par_key"), col("n_rows"), col("value_min"), col("value_max"),
          col("value_nulls"))
    },

    // clustered compaction end-to-end: rewrite events by day with
    // clusterBy(user_id) — the data-skipping layout — and manifest the
    // DESTINATION; the oracle manifests the source. A hash match proves
    // clustering is purely physical (row multiset intact); the row-group
    // tightness itself is pinned structurally in OperatorsSpec.
    QueryDef.checked(
      "q76_clustered_compact",
      """SELECT strftime(ts, '%Y%m%d') AS par_key, count(*) AS n_rows,
        |  CAST(sum(user_id) AS BIGINT) AS sum_user, CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
        |FROM events GROUP BY 1""".stripMargin) { (s, dir) =>
      val src = scratch("q76_clustered_compact", "cluster_src", dir)
      val dest = scratch("q76_clustered_compact", "cluster_dst", dir)
      Tables.load(s, dir, "events").write.mode("overwrite").parquet(src)
      Compact.rewritePartitioned(s, src, dest, partKeyCol = "ts",
        clusterBy = Seq("user_id"))
      s.read.parquet(dest)
        .groupBy(col("par_key").cast("string").as("par_key"))
        .agg(count(lit(1)).as("n_rows"), sum(col("user_id")).as("sum_user"),
          countDistinct(col("user_id")).as("n_users"))
    },

    // Z-ORDER compaction roundtrip: rewrite lineitem range-partitioned on
    // the Morton curve of (l_partkey, l_suppkey) — per-file min/max tight
    // in BOTH dimensions (skipping layout pinned in OperatorsSpec); the
    // oracle proves the curve rewrite preserved the data exactly.
    QueryDef.checked(
      "q101_zorder_roundtrip",
      """SELECT strftime(l_shipdate, '%Y') AS par_key, count(*) AS n_rows,
        |  sum(l_quantity) AS sum_qty, CAST(sum(l_partkey * 31 + l_suppkey) AS BIGINT) AS key_sig
        |FROM lineitem GROUP BY 1""".stripMargin) { (s, dir) =>
      val dest = scratch("q101_zorder_roundtrip", "zorder", dir)
      Compact.rewritePartitioned(s, s"$dir/lineitem.parquet", dest,
        partKeyCol = "l_shipdate", pattern = "yyyy",
        zorderBy = Seq("l_partkey", "l_suppkey"))
      s.read.parquet(dest)
        .groupBy(col("par_key").cast("string").as("par_key"))
        .agg(count(lit(1)).as("n_rows"), sum(col("l_quantity")).as("sum_qty"),
          sum(col("l_partkey") * 31 + col("l_suppkey")).as("key_sig"))
    },

    // partition-granular MERGE (upsert + delete): build a partitioned
    // orders warehouse, apply a delta derived deterministically from
    // orders itself (price bump on %11 keys, inserts above the key
    // space on %17, tombstones on %13), and aggregate the merged table
    // per month. Only delta-touched partitions are read or rewritten
    // (per-partition rename swap; OperatorsSpec pins untouched-partition
    // preservation and emptied-partition removal); the oracle replays
    // the MERGE relationally over the same delta derivation.
    QueryDef.checked(
      "q121_merge_upsert",
      """WITH upd AS (
        |  SELECT o_orderkey, o_custkey, o_orderstatus,
        |         o_totalprice + 1000.0 AS o_totalprice, o_orderdate, o_orderpriority
        |  FROM orders WHERE o_orderkey % 11 = 0 AND o_orderkey % 13 <> 0
        |), ins AS (
        |  SELECT o_orderkey + 10000000 AS o_orderkey, o_custkey, o_orderstatus,
        |         1.0 AS o_totalprice, o_orderdate, o_orderpriority
        |  FROM orders WHERE o_orderkey % 17 = 0
        |), surv AS (
        |  SELECT o.* FROM orders o
        |  WHERE o.o_orderkey % 11 <> 0 AND o.o_orderkey % 13 <> 0
        |    AND NOT EXISTS (SELECT 1 FROM ins i WHERE i.o_orderkey = o.o_orderkey)
        |), merged AS (
        |  SELECT * FROM surv UNION ALL SELECT * FROM upd UNION ALL SELECT * FROM ins
        |)
        |SELECT strftime(o_orderdate, '%Y%m') AS par_key, count(*) AS n_rows,
        |  CAST(sum(o_orderkey) AS BIGINT) AS key_sig,
        |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS sum_cents
        |FROM merged GROUP BY 1""".stripMargin) { (s, dir) =>
      // sum_cents, not sum(double): every price is cent-exact (base data,
      // +1000 bumps, 1.0 inserts), and at sf0.1 the double sum lands on a
      // rounding-granularity boundary (…809.45) where engine-vs-oracle
      // summation-order ulps flip the last compared digit
      import graft.operators.Upsert
      val dest = scratch("q121_merge_upsert", "merge", dir)
      val withKey = Tables.load(s, dir, "orders")
        .withColumn("par_key", date_format(col("o_orderdate"), "yyyyMM"))
      // shuffle by key before partitionBy: without it every input split
      // writes a sliver into every month (32×80 files for the fixture)
      withKey.repartition(col("par_key"))
        .write.partitionBy("par_key").mode("overwrite").parquet(dest)
      val upd = withKey
        .filter(col("o_orderkey") % 11 === 0 && col("o_orderkey") % 13 =!= 0)
        .withColumn("o_totalprice", col("o_totalprice") + 1000.0)
        .withColumn("deleted", lit(false))
      val ins = withKey.filter(col("o_orderkey") % 17 === 0)
        .withColumn("o_orderkey", col("o_orderkey") + 10000000L)
        .withColumn("o_totalprice", lit(1.0))
        .withColumn("deleted", lit(false))
      val del = withKey.filter(col("o_orderkey") % 13 === 0)
        .withColumn("deleted", lit(true))
      Upsert.mergeByKey(s, dest, upd.unionByName(ins).unionByName(del),
        keyCols = Seq("o_orderkey"), partNames = Seq("par_key"),
        tombstoneCol = Some("deleted"))
      s.read.parquet(dest)
        .groupBy(col("par_key").cast("string").as("par_key"))
        .agg(count(lit(1)).as("n_rows"), sum(col("o_orderkey")).as("key_sig"),
          sum(round(col("o_totalprice") * 100).cast("long")).as("sum_cents"))
    },

    // ROW-level CDC diff between two table versions (the row analogue of
    // q28's partition-manifest reconcile): old = orders minus keys
    // divisible by 13; new = orders minus keys divisible by 7, with
    // totalprice bumped on keys divisible by 11 — so the diff contains
    // all three change kinds, derived identically in both engines.
    QueryDef.checked(
      "q103_cdc_diff",
      """WITH old AS (SELECT o_orderkey, o_orderstatus, o_totalprice
        |             FROM orders WHERE o_orderkey % 13 <> 0),
        |new AS (SELECT o_orderkey, o_orderstatus,
        |          CASE WHEN o_orderkey % 11 = 0
        |               THEN round(o_totalprice * 1.1, 2)
        |               ELSE o_totalprice END AS o_totalprice
        |        FROM orders WHERE o_orderkey % 7 <> 0)
        |SELECT coalesce(old.o_orderkey, new.o_orderkey) AS o_orderkey,
        |  CASE WHEN old.o_orderkey IS NULL THEN 'insert'
        |       WHEN new.o_orderkey IS NULL THEN 'delete'
        |       WHEN old.o_orderstatus <> new.o_orderstatus
        |         OR old.o_totalprice <> new.o_totalprice THEN 'update'
        |       END AS change
        |FROM old FULL OUTER JOIN new USING (o_orderkey)
        |WHERE NOT (old.o_orderkey IS NOT NULL AND new.o_orderkey IS NOT NULL
        |           AND old.o_orderstatus = new.o_orderstatus
        |           AND old.o_totalprice = new.o_totalprice)""".stripMargin) { (s, dir) =>
      val orders = Tables.load(s, dir, "orders")
      val oldV = orders.filter(col("o_orderkey") % 13 =!= 0)
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
      val newV = orders.filter(col("o_orderkey") % 7 =!= 0)
        .select(col("o_orderkey"), col("o_orderstatus"),
          when(col("o_orderkey") % 11 === 0, round(col("o_totalprice") * 1.1, 2))
            .otherwise(col("o_totalprice")).as("o_totalprice"))
      Reconcile.cdcDiff(oldV, newV, keys = Seq("o_orderkey"),
        compareCols = Seq("o_orderstatus", "o_totalprice"))
    },

    // mergeByKey KEY-LOCALITY enforcement as oracle evidence (the SURVEY
    // row was spec-only through round 9): a key-banded warehouse
    // (par_key = floor(key/2048), so partition derives from the key and
    // footer envelopes are tight) takes an in-band update — the locality
    // check must clear EVERY untouched partition at parquet-footer cost
    // (candidateParts = 0, the `env_cleared_all` flag) — and then a
    // second merge that routes an existing high-band key into band 0
    // must refuse LOUDLY before any write (`moved_refused`), leaving the
    // table bit-identical (`dest_intact` re-aggregates and compares).
    // The oracle replays the one applied update; the three flags ride
    // under its hash.
    QueryDef.checked(
      "q168_upsert_locality",
      """WITH w AS (SELECT CAST(ceil((max(o_orderkey) + 1) / 8.0) AS BIGINT)
        |             AS bw FROM orders)
        |SELECT CAST(floor(o_orderkey / bw) AS BIGINT) AS band,
        |  count(*) AS n_rows,
        |  CAST(sum(o_orderkey) AS BIGINT) AS key_sig,
        |  CAST(sum(CAST(round((o_totalprice +
        |    CASE WHEN o_orderkey % 7 = 0 AND o_orderkey < bw
        |         THEN 500.0 ELSE 0.0 END) * 100) AS BIGINT)) AS BIGINT)
        |    AS sum_cents,
        |  CAST(1 AS BOOLEAN) AS env_cleared_all,
        |  CAST(1 AS BOOLEAN) AS moved_refused,
        |  CAST(1 AS BOOLEAN) AS dest_intact
        |FROM orders, w GROUP BY 1""".stripMargin) { (s, dir) =>
      import graft.operators.Upsert
      val dest = scratch("q168_upsert_locality", "uloc", dir)
      val orders0 = Tables.load(s, dir, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
      // band width derived from the key range (8 bands at every sf) so
      // the partition is a function of the key — the layout whose footer
      // envelopes are tight and disjoint
      val bw = math.ceil((orders0.agg(max("o_orderkey")).head.getLong(0) + 1) / 8.0).toLong
      val withBand = orders0
        .withColumn("par_key", floor(col("o_orderkey") / bw).cast("string"))
      withBand.repartition(col("par_key"))
        .write.partitionBy("par_key").mode("overwrite").parquet(dest)
      // in-band update: keys %7 inside band 0 only
      val upd = withBand
        .filter(col("o_orderkey") % 7 === 0 && col("o_orderkey") < bw)
        .withColumn("o_totalprice", col("o_totalprice") + 500.0)
      var rep: Upsert.LocalityReport = null
      Upsert.mergeByKey(s, dest, upd,
        keyCols = Seq("o_orderkey"), partNames = Seq("par_key"),
        onLocality = r => rep = r)
      val envClearedAll = rep != null &&
        rep.untouchedParts > 0 && rep.candidateParts == 0
      val before = s.read.parquet(dest)
        .agg(count(lit(1)), sum(col("o_orderkey"))).head()
      // moved key: the table's max key lives in the top band; a delta
      // routing it to band 0 must refuse before writing anything
      val movedDelta = withBand.orderBy(col("o_orderkey").desc).limit(1)
        .withColumn("par_key", lit("0"))
      val movedRefused =
        try { Upsert.mergeByKey(s, dest, movedDelta,
          keyCols = Seq("o_orderkey"), partNames = Seq("par_key")); false }
        catch { case e: IllegalStateException => e.getMessage.contains("moved key") }
      val after = s.read.parquet(dest)
        .agg(count(lit(1)), sum(col("o_orderkey"))).head()
      val destIntact = before == after
      s.read.parquet(dest)
        .groupBy(col("par_key").cast("long").as("band"))
        .agg(count(lit(1)).as("n_rows"),
          sum(col("o_orderkey")).as("key_sig"),
          sum(round(col("o_totalprice") * 100).cast("long")).as("sum_cents"))
        .select(col("band"), col("n_rows"), col("key_sig"), col("sum_cents"),
          lit(envClearedAll).as("env_cleared_all"),
          lit(movedRefused).as("moved_refused"),
          lit(destIntact).as("dest_intact"))
    }
  )
}
