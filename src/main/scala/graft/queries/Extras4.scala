package graft.queries

import graft.{QueryDef, Tables}
import graft.operators._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-7 tier: snapshot schema evolution, snapshot-preserving MERGE,
  * and the stream-stream join — each under the DuckDB oracle.
  */
object Extras4 {

  private def t(s: SparkSession, dir: String, n: String): DataFrame = Tables.load(s, dir, n)

  private def freshRoot(s: SparkSession, owner: String, name: String, dir: String): String = {
    val root = graft.Scratch.dir(owner, name, dir)
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(root), true) // idempotent rerun
    root
  }

  val entries: Seq[QueryDef] = Seq(

    // Snapshot schema evolution end-to-end: v1 publishes two columns,
    // v2 append-publishes the 1996+ slice with a NEW computed column
    // (o_year). The oracle recomputes every read from the source table,
    // so a hash match proves: (a) v2 reads under the union schema with
    // the pre-evolution files null-filled, (b) a v1-only manifest keeps
    // v1's schema — no phantom column, and (c) the incremental delta
    // carries the evolved column fully populated (it reads under v2's
    // schema, never a sampled old footer). This is the first schema
    // change a real user hits after adopting snapshots — the case the
    // reference's whole-tree copies (TransWholeTablePartition.java:95-120)
    // were immune to by construction and the manifest layer must not
    // regress.
    QueryDef.checked(
      "q133_snapshot_evolution",
      """SELECT 'v1' AS part, count(*) AS n_rows,
        |  CAST(sum(o_orderkey) AS BIGINT) AS sum_key,
        |  CAST(NULL AS BIGINT) AS n_year_null, CAST(NULL AS BIGINT) AS sum_year
        |FROM orders WHERE o_orderdate < TIMESTAMP '1996-01-01 00:00:00'
        |UNION ALL
        |SELECT 'v2', count(*), CAST(sum(o_orderkey) AS BIGINT),
        |  CAST(sum(CASE WHEN o_orderdate < TIMESTAMP '1996-01-01 00:00:00'
        |           THEN 1 ELSE 0 END) AS BIGINT),
        |  CAST(sum(CASE WHEN o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |           THEN year(o_orderdate) END) AS BIGINT)
        |FROM orders
        |UNION ALL
        |SELECT 'delta', count(*), CAST(sum(o_orderkey) AS BIGINT),
        |  CAST(0 AS BIGINT), CAST(sum(year(o_orderdate)) AS BIGINT)
        |FROM orders WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'""".stripMargin) { (s, dir) =>
      val root = freshRoot(s, "q133_snapshot_evolution", "snap_evolve", dir)
      val orders = t(s, dir, "orders")
      Snapshots.publish(s, root,
        orders.filter(col("o_orderdate") < lit("1996-01-01"))
          .select(col("o_orderkey"), col("o_custkey")))
      Snapshots.publish(s, root,
        orders.filter(col("o_orderdate") >= lit("1996-01-01"))
          .select(col("o_orderkey"), col("o_custkey"),
            year(col("o_orderdate")).as("o_year")),
        append = true)
      def profile(df: DataFrame, part: String): DataFrame = {
        val hasYear = df.columns.contains("o_year")
        df.agg(
          count(lit(1)).as("n_rows"),
          sum(col("o_orderkey")).cast("long").as("sum_key"),
          (if (hasYear) sum(when(col("o_year").isNull, 1).otherwise(0)).cast("long")
           else lit(null).cast("long")).as("n_year_null"),
          (if (hasYear) sum(col("o_year")).cast("long")
           else lit(null).cast("long")).as("sum_year"))
          .select(lit(part).as("part"), col("n_rows"), col("sum_key"),
            col("n_year_null"), col("sum_year"))
      }
      profile(Snapshots.read(s, root, Some(1)), "v1")
        .unionByName(profile(Snapshots.read(s, root, Some(2)), "v2"))
        .unionByName(profile(Snapshots.readAdded(s, root, 1, 2), "delta"))
    },

    // Snapshot-preserving MERGE + time travel: publish orders as v1,
    // merge a delta (updates, deletes, inserts — keyed off o_orderkey
    // mod 97 so it's deterministic and SQL-expressible), then aggregate
    // BOTH versions through the manifest layer. The oracle recomputes v1
    // from the untouched source — so the v1 row passing AFTER the merge
    // is the proof that copy-on-write MERGE left history intact (the
    // corruption path an in-place swap would open, which Upsert now
    // refuses under snapshot roots). The v2 row proves full MERGE
    // semantics: update wins whole-row, tombstones remove, inserts land.
    QueryDef.checked(
      "q134_snapshot_merge",
      """SELECT 1 AS version, count(*) AS n_rows,
        |  CAST(sum(o_orderkey) AS BIGINT) AS sum_key,
        |  CAST(0 AS BIGINT) AS n_special
        |FROM orders
        |UNION ALL
        |SELECT 2,
        |  count(*) FILTER (WHERE o_orderkey % 97 <> 1)
        |    + count(*) FILTER (WHERE o_orderkey % 97 = 2),
        |  CAST(coalesce(sum(o_orderkey) FILTER (WHERE o_orderkey % 97 <> 1), 0)
        |    + coalesce(sum(o_orderkey + 100000000) FILTER (WHERE o_orderkey % 97 = 2), 0)
        |    AS BIGINT),
        |  CAST(count(*) FILTER (WHERE o_orderkey % 97 = 0)
        |    + count(*) FILTER (WHERE o_orderkey % 97 = 2) AS BIGINT)
        |FROM orders""".stripMargin) { (s, dir) =>
      val root = freshRoot(s, "q134_snapshot_merge", "snap_merge", dir)
      val orders = t(s, dir, "orders")
      Snapshots.publish(s, root, orders)
      val kmod = col("o_orderkey") % 97
      val upd = orders.filter(kmod === 0)
        .withColumn("o_orderpriority", lit("9-MERGED"))
        .withColumn("__del", lit(false))
      val del = orders.filter(kmod === 1).withColumn("__del", lit(true))
      val ins = orders.filter(kmod === 2)
        .withColumn("o_orderkey", col("o_orderkey") + 100000000L)
        .withColumn("o_orderpriority", lit("9-INSERTED"))
        .withColumn("__del", lit(false))
      Snapshots.mergeByKey(s, root, upd.unionByName(del).unionByName(ins),
        keyCols = Seq("o_orderkey"), tombstoneCol = Some("__del"))
      Seq(1, 2).map { v =>
        Snapshots.read(s, root, Some(v))
          .agg(count(lit(1)).as("n_rows"),
            sum(col("o_orderkey")).cast("long").as("sum_key"),
            sum(when(col("o_orderpriority").startsWith("9-"), 1).otherwise(0))
              .cast("long").as("n_special"))
          .select(lit(v).as("version"), col("n_rows"), col("sum_key"), col("n_special"))
      }.reduce(_.unionByName(_))
    },

    // Row-level change data feed derived from the file-level manifests:
    // replay q134's merge, then ask "what changed between v1 and v2" —
    // scanning ONLY the files the merge touched. The oracle recomputes
    // the three change classes from the source delta definition, so a
    // hash match proves: inserts/updates/deletes classify exactly, and
    // the merge's REWRITTEN survivor rows cancel out (file-level churn
    // is not row-level change — the property that makes a CDC consumer
    // downstream of compaction/merge see only real mutations).
    QueryDef.checked(
      "q136_snapshot_changes",
      """SELECT 'delete' AS change, count(*) AS n_rows,
        |  CAST(sum(o_orderkey) AS BIGINT) AS sum_key
        |FROM orders WHERE o_orderkey % 97 = 1
        |UNION ALL
        |SELECT 'insert', count(*), CAST(sum(o_orderkey + 100000000) AS BIGINT)
        |FROM orders WHERE o_orderkey % 97 = 2
        |UNION ALL
        |SELECT 'update', count(*), CAST(sum(o_orderkey) AS BIGINT)
        |FROM orders WHERE o_orderkey % 97 = 0""".stripMargin) { (s, dir) =>
      val root = freshRoot(s, "q136_snapshot_changes", "snap_cdc", dir)
      val orders = t(s, dir, "orders")
      Snapshots.publish(s, root, orders)
      val kmod = col("o_orderkey") % 97
      val delta = orders.filter(kmod === 0)
        .withColumn("o_orderpriority", lit("9-MERGED")).withColumn("__del", lit(false))
        .unionByName(orders.filter(kmod === 1).withColumn("__del", lit(true)))
        .unionByName(orders.filter(kmod === 2)
          .withColumn("o_orderkey", col("o_orderkey") + 100000000L)
          .withColumn("o_orderpriority", lit("9-INSERTED"))
          .withColumn("__del", lit(false)))
      Snapshots.mergeByKey(s, root, delta, Seq("o_orderkey"), Some("__del"))
      Snapshots.changes(s, root, from = 1, to = 2, keyCols = Seq("o_orderkey"))
        .groupBy(col("change"))
        .agg(count(lit(1)).as("n_rows"),
          sum(col("o_orderkey")).cast("long").as("sum_key"))
    },

    // Compaction under snapshots: publish a many-file version, compact
    // it (rewrite-then-publish — HDFSMerge's merge-then-delete,
    // HDFSMerge.java:144-148, with the delete deferred behind history),
    // then read BOTH versions and emit the row-level CDC between them.
    // The oracle recomputes both reads from the source and pins the CDC
    // at zero rows: time travel to the pre-compaction version still
    // works, and a compaction is row-level silent — the two invariants
    // that make compaction safe to run behind consumers.
    QueryDef.checked(
      "q137_snapshot_compact",
      """SELECT 'pre' AS part, count(*) AS n_rows,
        |  CAST(sum(l_orderkey * l_linenumber) AS BIGINT) AS checksum
        |FROM lineitem WHERE l_shipdate < TIMESTAMP '1994-01-01 00:00:00'
        |UNION ALL
        |SELECT 'post', count(*), CAST(sum(l_orderkey * l_linenumber) AS BIGINT)
        |FROM lineitem WHERE l_shipdate < TIMESTAMP '1994-01-01 00:00:00'
        |UNION ALL
        |SELECT 'cdc_rows', 0, CAST(0 AS BIGINT)""".stripMargin) { (s, dir) =>
      val root = freshRoot(s, "q137_snapshot_compact", "snap_compact", dir)
      val slice = t(s, dir, "lineitem")
        .filter(col("l_shipdate") < lit("1994-01-01"))
      Snapshots.publish(s, root, slice.repartition(16))
      Snapshots.compact(s, root, targetBytes = 512L << 20)
      def profile(part: String, v: Int): DataFrame =
        Snapshots.read(s, root, Some(v))
          .agg(count(lit(1)).as("n_rows"),
            sum(col("l_orderkey") * col("l_linenumber")).cast("long").as("checksum"))
          .select(lit(part).as("part"), col("n_rows"), col("checksum"))
      // key on the FULL row: the fixture's (l_orderkey, l_linenumber) is
      // deliberately non-unique (q130), and for a pure-rewrite CDC the
      // identity of interest is the row itself
      val cdc = Snapshots.changes(s, root, 1, 2,
          keyCols = slice.columns.toSeq)
        .agg(count(lit(1)).as("n_rows"))
        .select(lit("cdc_rows").as("part"), col("n_rows"),
          lit(0L).as("checksum"))
      profile("pre", 1).unionByName(profile("post", 2)).unionByName(cdc)
    },

    // Watermarked STREAM-STREAM join under the batch oracle: view →
    // purchase attribution within 1 hour per user, run to completion
    // over the file source and checked against the batch interval-join
    // SQL — the last Structured Streaming surface without a CORRECTNESS
    // entry (tumbling/sliding/session/dedup/foreachBatch all have one).
    // Both sides carry watermarks and the join condition bounds event
    // time, so buffered state evicts as the watermark advances
    // (StreamingSpec pins the eviction); completeness at run end is what
    // the oracle hash proves.
    QueryDef.checked(
      "q135_stream_attribution",
      """SELECT v.user_id AS user_id, v.event_id AS view_id,
        |  p.event_id AS purchase_id
        |FROM events v JOIN events p
        |  ON v.user_id = p.user_id
        | AND p.ts >= v.ts AND p.ts <= v.ts + INTERVAL 1 HOUR
        |WHERE v.event_type = 'view' AND p.event_type = 'purchase'""".stripMargin) { (s, dir) =>
      import graft.streaming.EventStreams
      // stream-stream join state partitioning scales with STATE VOLUME,
      // not driver cores: every shuffle partition costs 4 state stores ×
      // per-batch commit, so defaulting to local[32]'s 32 partitions pays
      // 128 store commits per batch for ~40k buffered rows. Pin a small
      // count on a cloned session (callers' sessions untouched); a real
      // deployment sizes this by expected in-flight state.
      val sess = org.apache.spark.sql.graftbridge.SessionBridge.cloneWithConf(s,
        Map("spark.sql.shuffle.partitions" ->
          math.min(8, s.conf.get("spark.sql.shuffle.partitions").toInt).toString))
      // glob form: the file-stream source requires a directory or glob
      // basePath — a bare file path is rejected (matches only events.parquet)
      val events = EventStreams.readEvents(sess, s"$dir/events*.parquet")
      val joined = EventStreams.correlated(
        events.filter(col("event_type") === "view"),
        events.filter(col("event_type") === "purchase"),
        maxDelay = "1 hour",
        distinctIds = false) // views and purchases are disjoint id sets
      val ck = graft.Scratch.ephemeralCheckpoint("q135_stream_attribution")
      val q = joined
        .select(col("user_id"), col("l_id").as("view_id"), col("r_id").as("purchase_id"))
        .writeStream.outputMode("append").format("memory")
        .option("checkpointLocation", ck)
        .queryName("q135_out").start()
      try { q.processAllAvailable(); q.stop() }
      finally org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(ck))
      sess.table("q135_out")
    },

    // Manifest-level FILE SKIPPING: publish lineitem range-clustered on
    // l_shipdate (so each parquet file covers a narrow shipdate band),
    // then answer a 3-month range query through readBetween — the scan
    // plans over ONLY the files whose footer min/max intersect the range.
    // The oracle recomputes from the full source table, so the hash match
    // proves pruning is lossless; the in-row `pruned` flag (computed from
    // the actual kept-vs-all file counts) self-evidences that skipping
    // really happened — a 16-file range-clustered year span can never
    // need every file for a 3-month window. At 100 TB this is the
    // difference between scanning a day and scanning seven years.
    QueryDef.checked(
      "q138_snapshot_skipping",
      // cents, not sum(double): the June–August extendedprice sum lands
      // within one summation-order ulp of a .05 rounding boundary at
      // sf0.01, so the raw double sum hash-flips run-to-run
      """SELECT count(*) AS n_rows,
        |  CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT) AS qty_cents,
        |  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
        |    AS price_cents,
        |  CAST(1 AS BOOLEAN) AS pruned
        |FROM lineitem
        |WHERE l_shipdate BETWEEN TIMESTAMP '1995-06-01 00:00:00'
        |                     AND TIMESTAMP '1995-08-31 23:59:59'""".stripMargin) { (s, dir) =>
      val root = freshRoot(s, "q138_snapshot_skipping", "snap_skip", dir)
      val (lo, hi) = ("1995-06-01 00:00:00", "1995-08-31 23:59:59")
      val li = t(s, dir, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_shipdate", "l_quantity", "l_extendedprice")
      Snapshots.publish(s, root, li.repartitionByRange(16, col("l_shipdate")))
      val v = Snapshots.versions(s, root).last
      val all = Snapshots.files(s, root, v)
      val kept = Snapshots.filesBetween(s, root, v, "l_shipdate", lo, hi)
      Snapshots.readBetween(s, root, "l_shipdate", lo, hi)
        .agg(count(lit(1)).as("n_rows"),
          sum(round(col("l_quantity") * 100).cast("long")).as("qty_cents"),
          sum(round(col("l_extendedprice") * 100).cast("long")).as("price_cents"))
        .select(col("n_rows"), col("qty_cents"), col("price_cents"),
          lit(kept.size < all.size).as("pruned"))
    },

    // Incremental materialized-view maintenance over the change feed:
    // build the grouped count/sum view at v1, MERGE the q134 delta into
    // the base table, then refresh the view by applying ONLY the CDF
    // (preimage retractions + postimage/insert applications) — O(changes)
    // instead of O(table). The oracle recomputes the view from the fully
    // merged final state, so the hash match proves the delta algebra
    // lands bit-identically where a full rescan would.
    QueryDef.checked(
      "q139_incremental_view",
      """WITH final AS (
        |  SELECT CASE WHEN o_orderkey % 97 = 0 THEN '9-MERGED'
        |              ELSE o_orderpriority END AS o_orderpriority,
        |         o_orderkey
        |  FROM orders WHERE o_orderkey % 97 <> 1
        |  UNION ALL
        |  SELECT '9-INSERTED', o_orderkey + 100000000
        |  FROM orders WHERE o_orderkey % 97 = 2
        |)
        |SELECT o_orderpriority, count(*) AS n_rows,
        |  CAST(sum(o_orderkey) AS BIGINT) AS sum_o_orderkey
        |FROM final GROUP BY o_orderpriority""".stripMargin) { (s, dir) =>
      val root = freshRoot(s, "q139_incremental_view", "snap_ivm", dir)
      val orders = t(s, dir, "orders")
      Snapshots.publish(s, root, orders)
      val mv1 = IncrementalView.countSum(
        Snapshots.read(s, root, Some(1)), Seq("o_orderpriority"), Seq("o_orderkey"))
      val kmod = col("o_orderkey") % 97
      val delta = orders.filter(kmod === 0)
        .withColumn("o_orderpriority", lit("9-MERGED")).withColumn("__del", lit(false))
        .unionByName(orders.filter(kmod === 1).withColumn("__del", lit(true)))
        .unionByName(orders.filter(kmod === 2)
          .withColumn("o_orderkey", col("o_orderkey") + 100000000L)
          .withColumn("o_orderpriority", lit("9-INSERTED"))
          .withColumn("__del", lit(false)))
      Snapshots.mergeByKey(s, root, delta, Seq("o_orderkey"), Some("__del"))
      val cdf = Snapshots.changes(s, root, 1, 2, Seq("o_orderkey"), preImages = true)
      IncrementalView.applyCountSum(mv1, cdf, Seq("o_orderpriority"), Seq("o_orderkey"))
        .select(col("o_orderpriority"), col("n_rows"),
          col("sum_o_orderkey").cast("long").as("sum_o_orderkey"))
    },

    // EXACTLY-ONCE streaming ingest into the snapshot layer: the purchase
    // stream lands via foreachBatch → publishStreamBatch, which records
    // the micro-batch id in the manifest it atomically commits — a
    // replayed batch after restart is skipped, so the sink is
    // exactly-once (SnapshotsSpec pins the replay). The oracle recomputes
    // the hourly rollup from the source table, so the hash match proves
    // the versioned ingest lost and duplicated nothing.
    QueryDef.checked(
      "q140_stream_snapshot_ingest",
      """SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour_start,
        |  count(*) AS n_purchases, sum(value) AS sum_value
        |FROM events WHERE event_type = 'purchase'
        |GROUP BY 1""".stripMargin) { (s, dir) =>
      import graft.streaming.EventStreams
      val root = freshRoot(s, "q140_stream_snapshot_ingest", "snap_ingest", dir)
      val purchases = EventStreams.readEvents(s, s"$dir/events*.parquet")
        .filter(col("event_type") === "purchase")
        .select("event_id", "ts", "user_id", "value")
      val q = purchases.writeStream
        .foreachBatch { (batch: DataFrame, id: Long) =>
          Snapshots.publishStreamBatch(batch.sparkSession, root, batch, id)
          (): Unit
        }
        .start()
      q.processAllAvailable(); q.stop()
      Snapshots.read(s, root)
        .groupBy(date_trunc("hour", col("ts")).as("hour_start"))
        .agg(count(lit(1)).as("n_purchases"), sum(col("value")).as("sum_value"))
    },

    // Z-ORDER + multi-dimensional file skipping: rewrite the events table
    // on the (user_id, ts) Morton curve via snapshot-native compaction,
    // then answer a 2-D selection (a user band within a 3-day window)
    // through readWhere — the conjunction prunes files in BOTH dimensions
    // at once, which a plain sort can only do for its leading column. The
    // oracle recomputes from the source, proving the curve rewrite +
    // pruning lost nothing; the in-row `pruned` flag (actual kept-vs-all
    // counts) self-evidences that skipping happened. History stays
    // intact: v1's unclustered files remain readable (SnapshotsSpec).
    QueryDef.checked(
      "q141_zorder_skipping",
      """SELECT count(*) AS n_rows, sum(value) AS sum_value,
        |  CAST(1 AS BOOLEAN) AS pruned
        |FROM events
        |WHERE user_id BETWEEN 3 AND 7
        |  AND ts BETWEEN TIMESTAMP '2024-01-10 00:00:00'
        |             AND TIMESTAMP '2024-01-12 23:59:59'""".stripMargin) { (s, dir) =>
      val root = freshRoot(s, "q141_zorder_skipping", "snap_zskip", dir)
      val events = t(s, dir, "events").select("event_id", "ts", "user_id", "value")
      Snapshots.publish(s, root, events.repartition(8))
      Snapshots.compact(s, root, zorderBy = Seq("user_id", "ts"), minFiles = 16)
      val v = Snapshots.versions(s, root).last
      val ranges = Map[String, (Any, Any)](
        "user_id" -> (3L, 7L),
        "ts" -> ("2024-01-10 00:00:00", "2024-01-12 23:59:59"))
      val kept = Snapshots.filesWhere(s, root, v, ranges)
      val all = Snapshots.files(s, root, v)
      Snapshots.readWhere(s, root, ranges)
        .agg(count(lit(1)).as("n_rows"), sum(col("value")).as("sum_value"))
        .select(col("n_rows"), col("sum_value"),
          lit(kept.size < all.size).as("pruned"))
    },

    // METADATA-ONLY aggregates: count(*) / min / max answered from the
    // manifest's per-file footer stats without opening a single data
    // file — the plan under the result is a LocalRelation, not a scan.
    // Works because footer min/max are exact bounds and row counts are
    // exact, so their fold IS the aggregate; any file lacking stats
    // makes the API return None (fall back to a scan) rather than guess.
    // The oracle recomputes by scanning, so the hash match proves the
    // metadata path exact across long, timestamp and string columns.
    // At 100 TB: `SELECT count(*), min(ts), max(ts)` in one manifest
    // read — the difference between milliseconds and a cluster-hour.
    QueryDef.checked(
      "q142_stats_only_agg",
      """SELECT count(*) AS n_rows,
        |  CAST(min(l_orderkey) AS BIGINT) AS min_key,
        |  CAST(max(l_orderkey) AS BIGINT) AS max_key,
        |  min(l_shipdate) AS min_ship, max(l_shipdate) AS max_ship,
        |  min(l_returnflag) AS min_flag, max(l_returnflag) AS max_flag
        |FROM lineitem""".stripMargin) { (s, dir) =>
      val root = freshRoot(s, "q142_stats_only_agg", "snap_statsagg", dir)
      val li = t(s, dir, "lineitem").select("l_orderkey", "l_shipdate", "l_returnflag")
      Snapshots.publish(s, root, li.repartition(8))
      def need[A](o: Option[A], what: String): A =
        o.getOrElse(sys.error(s"metadata aggregate unavailable for $what — stats missing"))
      val n = need(Snapshots.countRows(s, root), "count")
      val key = need(Snapshots.columnStats(s, root, "l_orderkey"), "l_orderkey")
      val ship = need(Snapshots.columnStats(s, root, "l_shipdate"), "l_shipdate")
      val flag = need(Snapshots.columnStats(s, root, "l_returnflag"), "l_returnflag")
      import s.implicits._
      Seq((n, key.min.asInstanceOf[Long], key.max.asInstanceOf[Long],
        ship.min.asInstanceOf[java.sql.Timestamp], ship.max.asInstanceOf[java.sql.Timestamp],
        flag.min.asInstanceOf[String], flag.max.asInstanceOf[String]))
        .toDF("n_rows", "min_key", "max_key", "min_ship", "max_ship",
          "min_flag", "max_flag")
    },

    // BLOOM-FILTER point lookup: publish orders UNCLUSTERED (hash layout,
    // so every file spans the whole key range and min/max stats prune
    // NOTHING) with parquet bloom filters on the key; a 3-needle IN
    // lookup through readPoint then plans over only the files whose
    // blooms might hold a needle. The oracle recomputes the lookup by
    // scanning, proving losslessness; the in-row `pruned` flag
    // self-evidences that the bloom — not the ranges — did the work.
    // The 100 TB shape: "fetch these 50 document ids" costs k footer
    // probes + a few file scans instead of a full-table scan.
    QueryDef.checked(
      "q143_bloom_pointlookup",
      """SELECT o_orderkey, CAST(o_custkey AS BIGINT) AS o_custkey,
        |  o_orderpriority, CAST(1 AS BOOLEAN) AS pruned
        |FROM orders WHERE o_orderkey IN (10, 500, 1000)""".stripMargin) { (s, dir) =>
      val root = freshRoot(s, "q143_bloom_pointlookup", "snap_bloom", dir)
      val orders = t(s, dir, "orders").select("o_orderkey", "o_custkey", "o_orderpriority")
      Snapshots.publish(s, root, orders.repartition(16), bloomOn = Seq("o_orderkey"))
      val needles: Seq[Any] = Seq(10L, 500L, 1000L)
      val v = Snapshots.versions(s, root).last
      val kept = Snapshots.pointFiles(s, root, v, "o_orderkey", needles)
      val all = Snapshots.files(s, root, v)
      Snapshots.readPoint(s, root, "o_orderkey", needles)
        .select(col("o_orderkey"), col("o_custkey").cast("long").as("o_custkey"),
          col("o_orderpriority"), lit(kept.size < all.size).as("pruned"))
    }
  )
}
