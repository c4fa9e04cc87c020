package graft.queries

import graft.{QueryDef, Tables}
import graft.operators.Snapshots
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._

/** Round-8 tier: the DataSource-V2 front door to the snapshot layer
  * (`graft.sources.SnapshotSource`) — the same manifests, stats and
  * exactly-once semantics, reached through `spark.read.format(...)` /
  * `spark.readStream.format(...)` so Catalyst plans the scan and pushes
  * filters/projections into it, instead of the table API choosing files
  * imperatively.
  */
object Extras6 {

  private def t(s: SparkSession, dir: String, n: String): DataFrame = Tables.load(s, dir, n)

  private def freshRoot(s: SparkSession, owner: String, name: String, dir: String): String = {
    val root = graft.Scratch.dir(owner, name, dir)
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(root), true) // idempotent rerun
    root
  }

  val entries: Seq[QueryDef] = Seq(

    // DSv2 batch read with filter pushdown INTO the manifest stats: the
    // user writes a plain `.filter` on a `format("graft-snapshot")`
    // frame; the scan plans over only the files whose footer min/max
    // admit the range — no readBetween call, Catalyst's own pushed
    // filters drive the skipping. The in-row `pruned` flag counts the
    // PLANNED scan files (from the executed plan's BatchScanExec, not
    // the manifest API), so the oracle hash proves both exact results
    // and that the scan physically dropped files. At 100 TB this is the
    // difference between "the user must know the skipping API" and
    // "every ad-hoc range query skips".
    QueryDef.checked(
      "q147_dsv2_read",
      """SELECT count(*) AS n_rows,
        |  CAST(sum(l_quantity) AS BIGINT) AS sum_qty,
        |  CAST(min(l_orderkey) AS BIGINT) AS min_key,
        |  CAST(1 AS BOOLEAN) AS pruned
        |FROM lineitem
        |WHERE l_shipdate BETWEEN TIMESTAMP '1995-06-01 00:00:00'
        |                     AND TIMESTAMP '1995-08-31 23:59:59'""".stripMargin) { (s, dir) =>
      val root = freshRoot(s, "q147_dsv2_read", "dsv2_read", dir)
      val li = t(s, dir, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_shipdate", "l_quantity")
      Snapshots.publish(s, root, li.repartitionByRange(16, col("l_shipdate")))
      val totalFiles = Snapshots.files(s, root, Snapshots.versions(s, root).last).size
      val filtered = s.read.format("graft-snapshot").option("root", root).load()
        .filter(col("l_shipdate").between(
          lit("1995-06-01 00:00:00").cast("timestamp"),
          lit("1995-08-31 23:59:59").cast("timestamp")))
      val planned = filtered.queryExecution.executedPlan.collect {
        case b: BatchScanExec => b.inputPartitions.collect {
          case fp: org.apache.spark.sql.execution.datasources.FilePartition =>
            fp.files.length
        }.sum
      }.sum
      filtered.agg(count(lit(1)).as("n_rows"),
        sum(col("l_quantity")).cast("long").as("sum_qty"),
        min(col("l_orderkey")).cast("long").as("min_key"))
        .select(col("n_rows"), col("sum_qty"), col("min_key"),
          lit(planned < totalFiles).as("pruned"))
    },

    // DSv2 micro-batch stream: manifest versions ARE the offsets, each
    // trigger delivers exactly the files the new versions appended —
    // O(new data) per trigger, deterministic replay from the
    // checkpointed version. Two appends flow through one query into a
    // memory sink; the oracle recomputes the union from the source
    // table, so the hash proves nothing was lost, duplicated, or
    // reordered into the wrong version. This is the reference's
    // poll-and-copy loop (`TransTablePartition.java:115-140`) as a
    // continuous exactly-once source instead of a cron rescan.
    QueryDef.checked(
      "q148_dsv2_stream",
      """SELECT o_orderpriority, count(*) AS n,
        |  CAST(min(o_orderkey) AS BIGINT) AS min_key,
        |  CAST(max(o_orderkey) AS BIGINT) AS max_key
        |FROM orders GROUP BY o_orderpriority""".stripMargin) { (s, dir) =>
      val root = freshRoot(s, "q148_dsv2_stream", "dsv2_stream", dir)
      val orders = t(s, dir, "orders")
        .select("o_orderkey", "o_orderpriority")
      Snapshots.publish(s, root, orders.filter(col("o_orderkey") % 2 === 0))
      val ck = graft.Scratch.ephemeralCheckpoint("q148_dsv2_stream")
      val q = s.readStream.format("graft-snapshot").option("root", root).load()
        .writeStream.format("memory").queryName("q148_out")
        .option("checkpointLocation", ck).start()
      try {
        q.processAllAvailable()
        Snapshots.publish(s, root, orders.filter(col("o_orderkey") % 2 === 1),
          append = true)
        q.processAllAvailable()
      } finally q.stop()
      s.table("q148_out")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"),
          min(col("o_orderkey")).cast("long").as("min_key"),
          max(col("o_orderkey")).cast("long").as("max_key"))
    },

    // METADATA-ONLY aggregate pushdown through plain SQL: an unfiltered
    // count/min/max over the DSv2 source compiles to a pre-computed
    // single-row scan answered from the manifest's footer stats — zero
    // data files opened, zero scan tasks (q142's metadata path, now
    // reached by Catalyst's SupportsPushDownAggregates instead of a
    // bespoke API). The in-row `metadata_only` flag inspects the
    // EXECUTED plan's scan description, so the oracle hash proves both
    // exact values and that no file scan was planned. At 100 TB:
    // `SELECT count(*), min(ts), max(ts)` in one manifest read.
    QueryDef.checked(
      "q149_dsv2_stats_agg",
      """SELECT count(*) AS n_rows,
        |  CAST(min(l_orderkey) AS BIGINT) AS min_key,
        |  CAST(max(l_orderkey) AS BIGINT) AS max_key,
        |  min(l_shipdate) AS min_ship, max(l_shipdate) AS max_ship,
        |  CAST(1 AS BOOLEAN) AS metadata_only
        |FROM lineitem""".stripMargin) { (s, dir) =>
      val root = freshRoot(s, "q149_dsv2_stats_agg", "dsv2_statsagg", dir)
      val li = t(s, dir, "lineitem").select("l_orderkey", "l_shipdate")
      Snapshots.publish(s, root, li.repartition(8))
      val agg = s.read.format("graft-snapshot").option("root", root).load()
        .agg(count(lit(1)).as("n_rows"),
          min(col("l_orderkey")).cast("long").as("min_key"),
          max(col("l_orderkey")).cast("long").as("max_key"),
          min(col("l_shipdate")).as("min_ship"),
          max(col("l_shipdate")).as("max_ship"))
      // PlanOps requires ≥1 scan and descends AQE wrappers, so a
      // regressed pushdown fails the flag instead of vacuously passing
      val metadataOnly = graft.PlanOps.metadataOnly(agg)
      agg.select(col("n_rows"), col("min_key"), col("max_key"),
        col("min_ship"), col("max_ship"), lit(metadataOnly).as("metadata_only"))
    },

    // RUNTIME (dynamic) file pruning: a broadcast join against a
    // filtered dimension hands the build side's join keys back to the
    // DSv2 scan as IN predicates at EXECUTION time, and the re-planned
    // fact scan drops every file whose stats exclude them — no user
    // hint, no explicit readBetween. The probe run's physically-planned
    // file count rides in the `pruned` flag, so the oracle hash proves
    // both exact join results and that the fact scan really shrank.
    // The 100 TB star-schema shape: a dimension filtered to one band
    // prunes the fact table to that band's files.
    QueryDef.checked(
      "q150_dsv2_runtime_prune",
      """SELECT count(*) AS n_rows,
        |  CAST(sum(l_quantity) AS BIGINT) AS sum_qty,
        |  CAST(1 AS BOOLEAN) AS pruned
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE o_orderkey <= (SELECT min(l_orderkey) + 20 FROM lineitem)"""
        .stripMargin) { (s, dir) =>
      val root = freshRoot(s, "q150_dsv2_runtime_prune", "dsv2_dpp", dir)
      val li = t(s, dir, "lineitem").select("l_orderkey", "l_quantity")
      Snapshots.publish(s, root,
        li.repartitionByRange(16, col("l_orderkey")).sortWithinPartitions("l_orderkey"))
      val bound = li.agg(min(col("l_orderkey"))).head.getLong(0) + 20
      val fact = s.read.format("graft-snapshot").option("root", root).load()
      val dim = t(s, dir, "orders").filter(col("o_orderkey") <= lit(bound))
        .select("o_orderkey")
      val joined = fact.join(broadcast(dim), col("l_orderkey") === col("o_orderkey"))
      val totalFiles = Snapshots.files(s, root, Snapshots.versions(s, root).last).size
      joined.count() // probe run: lets the runtime filter re-plan the scan
      val planned = {
        val plan = joined.queryExecution.executedPlan match {
          case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
            a.executedPlan
          case p => p
        }
        plan.collect {
          case b: BatchScanExec if b.scan.isInstanceOf[graft.sources.SnapshotScan] =>
            b.scan.asInstanceOf[graft.sources.SnapshotScan].plannedFileCount
        }.headOption.getOrElse(-1)
      }
      joined.agg(count(lit(1)).as("n_rows"),
        sum(col("l_quantity")).cast("long").as("sum_qty"))
        .select(col("n_rows"), col("sum_qty"),
          lit(planned >= 0 && planned < totalFiles).as("pruned"))
    },

    // SQL catalog over snapshot tables: zero API calls — a TableCatalog
    // (`sources/SnapshotCatalog`) resolves `graftsql.<table>` straight
    // from plain SQL, with `VERSION AS OF` pinning a manifest version
    // through the same resolution as option("version"). v1 publishes the
    // even-key half, v2 appends the rest; the query reads VERSION AS OF
    // 1, and the oracle recomputes the even-key aggregate from the
    // source — the hash match proves SQL time travel returns exactly
    // the v1 rows. Catalog reads inherit the whole DSv2 pushdown stack.
    QueryDef.checked(
      "q151_sql_catalog",
      """SELECT l_returnflag, count(*) AS n,
        |  CAST(sum(l_quantity) AS BIGINT) AS sum_qty
        |FROM lineitem WHERE l_orderkey % 2 = 0
        |GROUP BY l_returnflag""".stripMargin) { (s, dir) =>
      val wh = freshRoot(s, "q151_sql_catalog", "sql_warehouse", dir)
      s.conf.set("spark.sql.catalog.graftsql",
        classOf[graft.sources.SnapshotCatalog].getName)
      s.conf.set("spark.sql.catalog.graftsql.warehouse", wh)
      val li = t(s, dir, "lineitem").select("l_orderkey", "l_returnflag", "l_quantity")
      Snapshots.publish(s, s"$wh/li", li.filter(col("l_orderkey") % 2 === 0))
      Snapshots.publish(s, s"$wh/li", li.filter(col("l_orderkey") % 2 === 1),
        append = true)
      s.sql("""SELECT l_returnflag, count(*) AS n,
        |  CAST(sum(l_quantity) AS BIGINT) AS sum_qty
        |FROM graftsql.li VERSION AS OF 1
        |GROUP BY l_returnflag""".stripMargin)
    },

    // CHANGE-DATA-FEED streaming through the DSv2 source: v1 publishes
    // the even-key half, v2 MERGEs updates (%10=0 → 'UPDATED'),
    // tombstone deletes (%10=4) and odd inserts (%10=1 → 'NEW'); the
    // stream (`readChangeFeed` + `keyColumns`) delivers every version's
    // ROW-LEVEL diff — initial snapshot as inserts at v1, then
    // insert/update/delete rows at v2 — where the append-only source
    // would refuse the rewrite. The oracle recomputes the classification
    // relationally from the source table, so the hash proves the diff
    // algebra row-for-row, including commit-version attribution. This is
    // the retraction feed an incremental consumer (IVM, downstream sync)
    // needs at 100 TB: O(changed rows) per version, never O(table).
    QueryDef.checked(
      "q152_dsv2_cdf",
      """WITH v1 AS (SELECT o_orderkey AS k, o_orderpriority AS p
        |            FROM orders WHERE o_orderkey % 2 = 0)
        |SELECT * FROM (
        |  SELECT 'insert' AS change, k AS o_orderkey, p AS o_orderpriority,
        |         CAST(1 AS INT) AS _commit_version FROM v1
        |  UNION ALL
        |  SELECT 'update', k, 'UPDATED', CAST(2 AS INT) FROM v1 WHERE k % 10 = 0
        |  UNION ALL
        |  SELECT 'delete', k, p, CAST(2 AS INT) FROM v1 WHERE k % 10 = 4
        |  UNION ALL
        |  SELECT 'insert', o_orderkey, 'NEW', CAST(2 AS INT) FROM orders
        |  WHERE o_orderkey % 2 = 1 AND o_orderkey % 10 = 1
        |)""".stripMargin) { (s, dir) =>
      val root = freshRoot(s, "q152_dsv2_cdf", "dsv2_cdf", dir)
      val base = t(s, dir, "orders").filter(col("o_orderkey") % 2 === 0)
        .select("o_orderkey", "o_orderpriority")
      Snapshots.publish(s, root, base)
      val upd = base.filter(col("o_orderkey") % 10 === 0)
        .withColumn("o_orderpriority", lit("UPDATED")).withColumn("del", lit(false))
      val del = base.filter(col("o_orderkey") % 10 === 4).withColumn("del", lit(true))
      val ins = t(s, dir, "orders")
        .filter(col("o_orderkey") % 2 === 1 && col("o_orderkey") % 10 === 1)
        .select(col("o_orderkey"), lit("NEW").as("o_orderpriority"))
        .withColumn("del", lit(false))
      Snapshots.mergeByKey(s, root, upd.unionByName(del).unionByName(ins),
        Seq("o_orderkey"), Some("del"))
      val ck = graft.Scratch.ephemeralCheckpoint("q152_dsv2_cdf")
      val q = s.readStream.format("graft-snapshot").option("root", root)
        .option("readChangeFeed", true).option("keyColumns", "o_orderkey").load()
        .writeStream.format("memory").queryName("q152_out")
        .option("checkpointLocation", ck).start()
      try q.processAllAvailable() finally q.stop()
      s.table("q152_out")
        .select("change", "o_orderkey", "o_orderpriority", "_commit_version")
    },

    // LIMIT pushdown into the manifest: an unfiltered `LIMIT n` plans
    // only the file-list prefix whose exact `#rows=` counts cover n —
    // the other files are never scheduled. The in-row `limit_pruned`
    // flag counts the physically planned files; `rows_valid` proves the
    // prefix rows are genuine table rows (every limited row exists in
    // the source). At 100 TB this is "peek at a table" costing one or
    // two file scans instead of a full sweep.
    QueryDef.checked(
      "q153_dsv2_limit",
      """SELECT CAST(5000 AS BIGINT) AS n_rows,
        |  CAST(1 AS BOOLEAN) AS limit_pruned,
        |  CAST(1 AS BOOLEAN) AS rows_valid""".stripMargin) { (s, dir) =>
      val root = freshRoot(s, "q153_dsv2_limit", "dsv2_limit", dir)
      val li = t(s, dir, "lineitem").select("l_orderkey", "l_linenumber", "l_quantity")
      Snapshots.publish(s, root, li.repartition(16))
      val totalFiles = Snapshots.files(s, root, Snapshots.versions(s, root).last).size
      val limited = s.read.format("graft-snapshot").option("root", root).load()
        .limit(5000)
      val planned = limited.queryExecution.executedPlan.collect {
        case b: BatchScanExec => b.inputPartitions.collect {
          case fp: org.apache.spark.sql.execution.datasources.FilePartition =>
            fp.files.length
        }.sum
      }.sum
      // pin ONE evaluation: limit is free to pick any n rows, so validity
      // is judged on the collected set, not a re-execution
      val got = limited.collect()
      val gotDf = s.createDataFrame(
        java.util.Arrays.asList(got: _*), limited.schema)
      val invalid = gotDf.exceptAll(li).count()
      s.range(1).select(
        lit(got.length.toLong).as("n_rows"),
        lit(planned > 0 && planned < totalFiles).as("limit_pruned"),
        lit(invalid == 0L).as("rows_valid"))
    },

    // SQL INSERT INTO / INSERT OVERWRITE on a catalog snapshot table:
    // plain `INSERT ... SELECT` appends a version through the V1 write
    // bridge, `INSERT OVERWRITE` replaces content as a NEW version (the
    // old one stays time-travelable). The oracle recomputes both the
    // post-overwrite aggregate AND the pre-overwrite content read back
    // via VERSION AS OF, with a history flag pinning the version chain —
    // proving SQL writes are versioned publishes, not file mutation.
    // Runs in an isolated session: INSERT OVERWRITE needs static
    // overwrite mode, which must not leak into concurrent queries.
    QueryDef.checked(
      "q154_sql_insert",
      """SELECT
        |  (SELECT count(*) FROM lineitem WHERE l_orderkey % 2 = 1) AS n_after,
        |  (SELECT CAST(sum(l_quantity) AS BIGINT) FROM lineitem
        |     WHERE l_orderkey % 2 = 1) AS sum_after,
        |  (SELECT count(*) FROM lineitem WHERE l_orderkey % 2 = 0) AS n_inserted,
        |  (SELECT CAST(sum(l_quantity) AS BIGINT) FROM lineitem
        |     WHERE l_orderkey % 2 = 0) AS sum_inserted,
        |  CAST(1 AS BOOLEAN) AS history_intact""".stripMargin) { (s0, dir) =>
      val wh = freshRoot(s0, "q154_sql_insert", "sql_insert_wh", dir)
      val s = s0.newSession()
      s.conf.set("spark.sql.catalog.q154cat",
        classOf[graft.sources.SnapshotCatalog].getName)
      s.conf.set("spark.sql.catalog.q154cat.warehouse", wh)
      // snapshot tables carry no hive partitions: the V1 write bridge
      // serves the static overwrite plan (session-isolated — the engine
      // default stays dynamic for the partitioned Migrate paths)
      s.conf.set("spark.sql.sources.partitionOverwriteMode", "static")
      t(s, dir, "lineitem").select("l_orderkey", "l_quantity")
        .createOrReplaceTempView("q154_li")
      s.sql("CREATE TABLE q154cat.t (l_orderkey BIGINT, l_quantity DOUBLE) " +
        "USING `graft-snapshot`")
      s.sql("INSERT INTO q154cat.t " +
        "SELECT l_orderkey, l_quantity FROM q154_li WHERE l_orderkey % 2 = 0")
      s.sql("INSERT OVERWRITE q154cat.t " +
        "SELECT l_orderkey, l_quantity FROM q154_li WHERE l_orderkey % 2 = 1")
      // CREATE=v1 (empty), INSERT INTO=v2, INSERT OVERWRITE=v3
      val history = Snapshots.versions(s, s"$wh/t") == Seq(1, 2, 3)
      s.sql("""SELECT
        |  (SELECT count(*) FROM q154cat.t) AS n_after,
        |  (SELECT CAST(sum(l_quantity) AS BIGINT) FROM q154cat.t) AS sum_after,
        |  (SELECT count(*) FROM q154cat.t VERSION AS OF 2) AS n_inserted,
        |  (SELECT CAST(sum(l_quantity) AS BIGINT)
        |     FROM q154cat.t VERSION AS OF 2) AS sum_inserted""".stripMargin)
        .withColumn("history_intact", lit(history))
    },

    // Stats-driven auto-broadcast: the DSv2 scan reports manifest-exact
    // row/byte statistics, so a small (or well-pruned) snapshot side of
    // a join broadcasts WITHOUT a hint — a stats-less DSv2 relation
    // defaults to "assume huge" and would sort-merge. The flag reads the
    // STATIC physical plan (chosen from reported stats before any
    // runtime adaptation), so the oracle hash proves join results and
    // that planning, not AQE's runtime sizes, picked the broadcast.
    QueryDef.checked(
      "q155_dsv2_broadcast",
      """SELECT count(*) AS n_rows,
        |  CAST(sum(l_quantity) AS BIGINT) AS sum_qty,
        |  CAST(count(DISTINCT o_orderkey) AS BIGINT) AS n_orders,
        |  CAST(1 AS BOOLEAN) AS auto_broadcast
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE o_orderkey % 97 = 0""".stripMargin) { (s, dir) =>
      val root = freshRoot(s, "q155_dsv2_broadcast", "dsv2_bcast", dir)
      val dim = t(s, dir, "orders").filter(col("o_orderkey") % 97 === 0)
        .select("o_orderkey")
      Snapshots.publish(s, root, dim)
      val joined = t(s, dir, "lineitem").select("l_orderkey", "l_quantity")
        .join(s.read.format("graft-snapshot").option("root", root).load(),
          col("l_orderkey") === col("o_orderkey"))
      val autoBroadcast =
        joined.queryExecution.sparkPlan.toString.contains("BroadcastHashJoin")
      joined.agg(count(lit(1)).as("n_rows"),
        sum(col("l_quantity")).cast("long").as("sum_qty"),
        countDistinct(col("o_orderkey")).cast("long").as("n_orders"))
        .select(col("n_rows"), col("sum_qty"), col("n_orders"),
          lit(autoBroadcast).as("auto_broadcast"))
    },

    // SQL DELETE FROM on a catalog snapshot table: the predicate pushes
    // through SupportsDelete into the stats-pruned copy-on-write
    // Snapshots.deleteWhere — on a range-clustered table the narrow band
    // rewrites ONE file while every other file survives by identity
    // (`rewrite_targeted`), the deleted band is gone from the head, and
    // VERSION AS OF still reads the pre-delete rows (`history` columns).
    // The oracle replays the delete relationally, so the hash proves SQL
    // DELETE is a versioned CoW publish, not file mutation. At 100 TB a
    // retention delete rewrites the expiring band's files only.
    QueryDef.checked(
      "q156_sql_delete",
      """WITH bound AS (SELECT min(l_orderkey) + 20 AS b FROM lineitem)
        |SELECT
        |  (SELECT count(*) FROM lineitem, bound WHERE l_orderkey > b) AS n_after,
        |  (SELECT CAST(sum(l_quantity) AS BIGINT) FROM lineitem, bound
        |     WHERE l_orderkey > b) AS sum_after,
        |  (SELECT count(*) FROM lineitem) AS n_before,
        |  CAST(1 AS BOOLEAN) AS history_intact,
        |  CAST(1 AS BOOLEAN) AS rewrite_targeted""".stripMargin) { (s, dir) =>
      val wh = freshRoot(s, "q156_sql_delete", "sql_delete_wh", dir)
      s.conf.set("spark.sql.catalog.q156cat",
        classOf[graft.sources.SnapshotCatalog].getName)
      s.conf.set("spark.sql.catalog.q156cat.warehouse", wh)
      val li = t(s, dir, "lineitem").select("l_orderkey", "l_quantity")
      Snapshots.publish(s, s"$wh/t",
        li.repartitionByRange(16, col("l_orderkey")).sortWithinPartitions("l_orderkey"))
      val bound = li.agg(min(col("l_orderkey"))).head.getLong(0) + 20
      val before = Snapshots.files(s, s"$wh/t", 1).toSet
      s.sql(s"DELETE FROM q156cat.t WHERE l_orderkey <= $bound")
      val after = Snapshots.files(s, s"$wh/t", 2).toSet
      // CoW surgical rewrite: most files survive BY IDENTITY, some are
      // replaced — never a full rewrite, never zero change
      val targeted = (before intersect after).nonEmpty &&
        (before -- after).nonEmpty && (before -- after).size < before.size
      val history = Snapshots.versions(s, s"$wh/t") == Seq(1, 2)
      s.sql("""SELECT
        |  (SELECT count(*) FROM q156cat.t) AS n_after,
        |  (SELECT CAST(sum(l_quantity) AS BIGINT) FROM q156cat.t) AS sum_after,
        |  (SELECT count(*) FROM q156cat.t VERSION AS OF 1) AS n_before""".stripMargin)
        .withColumn("history_intact", lit(history))
        .withColumn("rewrite_targeted", lit(targeted))
    },

    // SQL ALTER TABLE schema evolution as a METADATA-ONLY publish:
    // ADD COLUMNS commits the next version re-listing the same files
    // under the widened schema — no data moves, existing rows read the
    // new column null-filled, and a later INSERT fills it. VERSION AS OF
    // keeps serving the old version UNDER ITS OWN SCHEMA (the column
    // simply does not exist there — `old_schema_clean`). The oracle
    // recomputes the null/filled split relationally, proving evolution
    // semantics row-for-row. The 100 TB property: widening a petabyte
    // table is one manifest write.
    QueryDef.checked(
      "q157_sql_alter",
      """SELECT
        |  (SELECT count(*) FROM lineitem) AS n_total,
        |  (SELECT count(*) FROM lineitem WHERE l_orderkey % 2 = 1) AS n_bonus,
        |  (SELECT CAST(sum(l_quantity * 2) AS BIGINT)
        |     FROM lineitem WHERE l_orderkey % 2 = 1) AS sum_bonus,
        |  CAST(1 AS BOOLEAN) AS metadata_only,
        |  CAST(1 AS BOOLEAN) AS old_schema_clean""".stripMargin) { (s, dir) =>
      val wh = freshRoot(s, "q157_sql_alter", "sql_alter_wh", dir)
      s.conf.set("spark.sql.catalog.q157cat",
        classOf[graft.sources.SnapshotCatalog].getName)
      s.conf.set("spark.sql.catalog.q157cat.warehouse", wh)
      val li = t(s, dir, "lineitem").select("l_orderkey", "l_quantity")
      Snapshots.publish(s, s"$wh/t", li.filter(col("l_orderkey") % 2 === 0))
      s.sql("ALTER TABLE q157cat.t ADD COLUMNS (l_bonus DOUBLE)")
      // metadata-only: v2 lists exactly v1's files (no data moved)
      val metadataOnly = Snapshots.files(s, s"$wh/t", 2) == Snapshots.files(s, s"$wh/t", 1)
      li.filter(col("l_orderkey") % 2 === 1)
        .withColumn("l_bonus", col("l_quantity") * 2)
        .createOrReplaceTempView("q157_delta")
      s.sql("INSERT INTO q157cat.t SELECT * FROM q157_delta")
      val oldClean = !s.sql("SELECT * FROM q157cat.t VERSION AS OF 1")
        .columns.contains("l_bonus")
      s.sql("""SELECT count(*) AS n_total, count(l_bonus) AS n_bonus,
        |  CAST(sum(l_bonus) AS BIGINT) AS sum_bonus
        |FROM q157cat.t""".stripMargin)
        .withColumn("metadata_only", lit(metadataOnly))
        .withColumn("old_schema_clean", lit(oldClean))
    },

    // STREAMING WRITE into a snapshot table: writeStream.format
    // ("graft-snapshot") publishes one version per micro-batch with the
    // manifest-recorded batch id as the exactly-once transaction — a
    // snapshot-to-snapshot pipe (DSv2 stream source → snapshot sink)
    // where a restart from the same checkpoint republishes NOTHING
    // (`exactly_once`: the version chain is unchanged after a no-new-data
    // restart, and re-delivered batches are skipped by id). With
    // maxVersionsPerTrigger=1 each source version flows through as its
    // own sink version (`versioned`). The oracle recomputes the union
    // from the source table: the hash proves end-to-end exactly-once.
    QueryDef.checked(
      "q158_stream_sink",
      """SELECT o_orderpriority, count(*) AS n,
        |  CAST(min(o_orderkey) AS BIGINT) AS min_key,
        |  CAST(max(o_orderkey) AS BIGINT) AS max_key,
        |  CAST(1 AS BOOLEAN) AS exactly_once,
        |  CAST(1 AS BOOLEAN) AS versioned
        |FROM orders GROUP BY o_orderpriority""".stripMargin) { (s, dir) =>
      val src = freshRoot(s, "q158_stream_sink", "stream_sink_src", dir)
      val dst = freshRoot(s, "q158_stream_sink", "stream_sink_dst", dir)
      val orders = t(s, dir, "orders").select("o_orderkey", "o_orderpriority")
      Snapshots.publish(s, src, orders.filter(col("o_orderkey") % 2 === 0))
      Snapshots.publish(s, src, orders.filter(col("o_orderkey") % 2 === 1),
        append = true)
      val ck = graft.Scratch.ephemeralCheckpoint("q158_stream_sink")
      def run(): Unit = {
        val q = s.readStream.format("graft-snapshot").option("root", src)
          .option("maxVersionsPerTrigger", "1").load()
          .writeStream.format("graft-snapshot").option("root", dst)
          .option("checkpointLocation", ck)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
        require(q.awaitTermination(300000), "AvailableNow drain timed out")
      }
      run()
      val versioned = Snapshots.versions(s, dst).size == 2
      val vAfterFirst = Snapshots.versions(s, dst)
      run() // restart, no new source data: must republish NOTHING
      val exactlyOnce = Snapshots.versions(s, dst) == vAfterFirst
      Snapshots.read(s, dst)
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"),
          min(col("o_orderkey")).cast("long").as("min_key"),
          max(col("o_orderkey")).cast("long").as("max_key"))
        .withColumn("exactly_once", lit(exactlyOnce))
        .withColumn("versioned", lit(versioned))
    },

    // SQL MERGE INTO on a snapshot table: the full three-clause MERGE
    // (matched-and-condition DELETE, matched UPDATE, not-matched INSERT)
    // through Spark's group-based row-level operation — the op's scan
    // reads affected files whole (runtime group filtering prunes to
    // files that may hold a matching key), executors land the
    // replacement rows, and commit publishes head − scanned + written
    // as ONE new version. The oracle replays the MERGE relationally
    // (updates applied, deleted keys gone, inserts present) and
    // `history_intact` pins that the merge is a single versioned
    // publish over the time-travelable v1 — SQL upsert with lakehouse
    // semantics, the canonical 100 TB warehouse mutation.
    QueryDef.checked(
      "q159_sql_merge",
      """WITH t1 AS (
        |  SELECT o_orderkey,
        |    CASE WHEN o_orderkey % 10 = 0 THEN 'UPDATED'
        |         ELSE o_orderpriority END AS o_orderpriority
        |  FROM orders WHERE o_orderkey % 2 = 0 AND o_orderkey % 10 <> 4
        |  UNION ALL
        |  SELECT o_orderkey, 'NEW' FROM orders
        |  WHERE o_orderkey % 2 = 1 AND o_orderkey % 10 = 1
        |)
        |SELECT o_orderpriority, count(*) AS n,
        |  CAST(min(o_orderkey) AS BIGINT) AS min_key,
        |  CAST(max(o_orderkey) AS BIGINT) AS max_key,
        |  CAST(1 AS BOOLEAN) AS history_intact
        |FROM t1 GROUP BY o_orderpriority""".stripMargin) { (s, dir) =>
      val wh = freshRoot(s, "q159_sql_merge", "sql_merge_wh", dir)
      s.conf.set("spark.sql.catalog.q159cat",
        classOf[graft.sources.SnapshotCatalog].getName)
      s.conf.set("spark.sql.catalog.q159cat.warehouse", wh)
      val orders = t(s, dir, "orders").select("o_orderkey", "o_orderpriority")
      Snapshots.publish(s, s"$wh/t", orders.filter(col("o_orderkey") % 2 === 0))
      orders.filter(col("o_orderkey") % 10 === 0 && col("o_orderkey") % 2 === 0)
        .withColumn("o_orderpriority", lit("UPDATED")).withColumn("del", lit(false))
        .unionByName(orders
          .filter(col("o_orderkey") % 10 === 4 && col("o_orderkey") % 2 === 0)
          .withColumn("del", lit(true)))
        .unionByName(orders
          .filter(col("o_orderkey") % 2 === 1 && col("o_orderkey") % 10 === 1)
          .select(col("o_orderkey"), lit("NEW").as("o_orderpriority"))
          .withColumn("del", lit(false)))
        .createOrReplaceTempView("q159_src")
      s.sql("""MERGE INTO q159cat.t t USING q159_src s
        |ON t.o_orderkey = s.o_orderkey
        |WHEN MATCHED AND s.del THEN DELETE
        |WHEN MATCHED THEN UPDATE SET t.o_orderpriority = s.o_orderpriority
        |WHEN NOT MATCHED AND NOT s.del THEN
        |  INSERT (o_orderkey, o_orderpriority) VALUES (s.o_orderkey, s.o_orderpriority)
        |""".stripMargin)
      val history = Snapshots.versions(s, s"$wh/t") == Seq(1, 2)
      s.sql("""SELECT o_orderpriority, count(*) AS n,
        |  CAST(min(o_orderkey) AS BIGINT) AS min_key,
        |  CAST(max(o_orderkey) AS BIGINT) AS max_key
        |FROM q159cat.t GROUP BY o_orderpriority""".stripMargin)
        .withColumn("history_intact", lit(history))
    },

    // Metadata columns through the DSv2 source: `SELECT _file, _version`
    // serves each row's data file and the scan's resolved manifest
    // version as per-file constant columns (the parquet factory's
    // partition-values mechanism — no per-row cost, task packing
    // intact). Evidence under the oracle: grouping by _file reproduces
    // the manifest's exact `#rows=` counts (`counts_match`), a _file
    // point filter physically plans ONE file (`point_pruned` — the
    // lineage-debugging "read just this file" shape), and _version
    // reports the head. At 100 TB this is row-level lineage for free.
    QueryDef.checked(
      "q160_metadata_columns",
      """SELECT CAST(6 AS BIGINT) AS n_files,
        |  (SELECT count(*) FROM orders) AS n_rows,
        |  CAST(2 AS INT) AS version_head,
        |  CAST(1 AS BOOLEAN) AS counts_match,
        |  CAST(1 AS BOOLEAN) AS point_pruned""".stripMargin) { (s, dir) =>
      val root = freshRoot(s, "q160_metadata_columns", "dsv2_meta", dir)
      val orders = t(s, dir, "orders").select("o_orderkey", "o_orderpriority")
      Snapshots.publish(s, root,
        orders.filter(col("o_orderkey") % 2 === 0).repartition(4))
      Snapshots.publish(s, root,
        orders.filter(col("o_orderkey") % 2 === 1).repartition(2), append = true)
      val src = s.read.format("graft-snapshot").option("root", root).load()
      val perFile = src.groupBy("_file").count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val manifest = Snapshots.rowCountsOf(s, root, 2)
        .map { case (r, n) => s"$root/$r" -> n }
      val one = manifest.keys.min
      val narrow = src.filter(col("_file") === one)
      val planned = narrow.queryExecution.executedPlan.collect {
        case b: BatchScanExec => b.inputPartitions.collect {
          case fp: org.apache.spark.sql.execution.datasources.FilePartition =>
            fp.files.length
        }.sum
      }.sum
      src.agg(
        countDistinct(col("_file")).as("n_files"),
        count(lit(1)).as("n_rows"),
        max(col("_version")).as("version_head"))
        .withColumn("counts_match", lit(perFile == manifest))
        .withColumn("point_pruned",
          lit(planned == 1 && narrow.count() == manifest(one)))
    }
  )
}
