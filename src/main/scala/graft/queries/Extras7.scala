package graft.queries

import graft.{QueryDef, Tables}
import graft.operators.Snapshots
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._

/** Round-9 tier: key-clustered snapshot tables — storage-partitioned
  * joins (zero-shuffle co-clustered planning), metadata-only GROUP BY
  * aggregates over file-constant columns, and SQL CALL maintenance
  * procedures. The layout-for-shuffle trade at 100 TB: cluster once on
  * the routing key, then every join/aggregation on it skips its
  * exchange and every per-key rollup answers from the manifest.
  */
object Extras7 {

  private def t(s: SparkSession, dir: String, n: String): DataFrame = Tables.load(s, dir, n)

  private def freshRoot(s: SparkSession, owner: String, name: String, dir: String): String = {
    val root = graft.Scratch.dir(owner, name, dir)
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(root), true) // idempotent rerun
    root
  }

  private def shuffleCount(df: DataFrame): Int = graft.PlanOps.shuffleCount(df)

  val entries: Seq[QueryDef] = Seq(

    // STORAGE-PARTITIONED JOIN: both sides published key-clustered on
    // the join column (one file set per value, #cluster= manifest
    // header), so the DSv2 scans report key-grouped partitioning and the
    // merge join — AND the aggregation above it, also keyed on the
    // cluster column — plan with ZERO shuffle exchanges. The in-row
    // `shuffle_free` flag counts exchanges in the executed plan, so the
    // oracle hash proves both exact join results and the absent
    // shuffles. At 100 TB this is the difference between re-shuffling
    // both fact tables on every join and a map-side join forever after
    // one layout decision.
    QueryDef.checked(
      "q161_spj_join",
      """SELECT o.o_orderpriority,
        |  count(*) AS n,
        |  CAST(min(o.o_orderkey) AS BIGINT) AS min_key,
        |  CAST(max(d.prio_n) AS BIGINT) AS prio_n,
        |  CAST(1 AS BOOLEAN) AS shuffle_free
        |FROM orders o
        |JOIN (SELECT o_orderpriority, count(*) AS prio_n,
        |        CAST(min(o_orderkey) AS BIGINT) AS prio_min
        |      FROM orders GROUP BY o_orderpriority) d
        |  ON o.o_orderpriority = d.o_orderpriority
        |GROUP BY o.o_orderpriority""".stripMargin) { (s, dir) =>
      val factRoot = freshRoot(s, "q161_spj_join", "spj_fact", dir)
      val dimRoot = freshRoot(s, "q161_spj_join", "spj_dim", dir)
      val orders = t(s, dir, "orders").select("o_orderkey", "o_orderpriority")
      Snapshots.publish(s, factRoot, orders, clusterBy = Some("o_orderpriority"))
      Snapshots.publish(s, dimRoot,
        orders.groupBy("o_orderpriority")
          .agg(count(lit(1)).as("prio_n"),
            min("o_orderkey").cast("long").as("prio_min")),
        clusterBy = Some("o_orderpriority"))
      def read(root: String) =
        s.read.format("graft-snapshot").option("root", root).load()
      // the merge hint keeps the tiny dim side out of a broadcast join,
      // so the plan exercises the co-partitioned (SPJ) path
      val joined = read(factRoot).join(read(dimRoot).hint("merge"), "o_orderpriority")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"),
          min("o_orderkey").cast("long").as("min_key"),
          max("prio_n").cast("long").as("prio_n"))
      val free = shuffleCount(joined) == 0
      joined.select(col("o_orderpriority"), col("n"), col("min_key"),
        col("prio_n"), lit(free).as("shuffle_free"))
    },

    // METADATA-ONLY GROUP BY: over a key-clustered table every file is
    // single-valued for the cluster column, so `GROUP BY` it with
    // count(*)/count(c)/min/max compiles to pre-computed rows folded
    // from manifest stats — zero files opened, zero scan tasks (the
    // grouped extension of q149). count(maybe_price) — a column null on
    // two-thirds of the rows — proves the null algebra: rows minus
    // per-file null counts, exact. The per-key rollup a 100 TB
    // routing-keyed table answers in one manifest read.
    QueryDef.checked(
      "q162_grouped_stats_agg",
      """SELECT o_orderpriority, count(*) AS n,
        |  count(CASE WHEN o_orderkey % 3 = 0 THEN o_totalprice END) AS n_maybe,
        |  CAST(min(o_orderkey) AS BIGINT) AS min_key,
        |  CAST(max(o_orderkey) AS BIGINT) AS max_key,
        |  CAST(1 AS BOOLEAN) AS metadata_only
        |FROM orders GROUP BY o_orderpriority""".stripMargin) { (s, dir) =>
      val root = freshRoot(s, "q162_grouped_stats_agg", "grouped_statsagg", dir)
      val orders = t(s, dir, "orders")
        .select("o_orderkey", "o_orderpriority", "o_totalprice")
        .withColumn("maybe_price",
          when(col("o_orderkey") % 3 === 0, col("o_totalprice")))
        .drop("o_totalprice")
      Snapshots.publish(s, root, orders, clusterBy = Some("o_orderpriority"))
      val agg = s.read.format("graft-snapshot").option("root", root).load()
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"), count("maybe_price").as("n_maybe"),
          min("o_orderkey").cast("long").as("min_key"),
          max("o_orderkey").cast("long").as("max_key"))
      // a regressed pushdown must FAIL the flag (PlanOps requires scans
      // to exist and descends AQE wrappers), not vacuously pass it
      val metadataOnly = graft.PlanOps.metadataOnly(agg)
      agg.select(col("o_orderpriority"), col("n"), col("n_maybe"),
        col("min_key"), col("max_key"), lit(metadataOnly).as("metadata_only"))
    },

    // SQL CALL maintenance: publish v1 (odd-key half), overwrite with v2
    // (everything), then `CALL sys.rollback(t, 1)` — the table head is
    // the v1 rows again, via a forward-rolling v3. The history
    // procedure's operation classification (v2 and v3 both replace the
    // whole file set: `rewrite`) and the rollback's returned version
    // ride in the row, so the oracle hash proves the SQL surface drove
    // the full lifecycle. This is the reference's manual re-run/cleanup
    // loop as three SQL statements.
    QueryDef.checked(
      "q163_sql_procedures",
      """SELECT count(*) AS n,
        |  CAST(sum(o_orderkey) AS BIGINT) AS key_sum,
        |  CAST(3 AS INT) AS rollback_version,
        |  'append,rewrite,rewrite' AS ops
        |FROM orders WHERE o_orderkey % 2 = 1""".stripMargin) { (s, dir) =>
      val wh = freshRoot(s, "q163_sql_procedures", "proc_warehouse", dir)
      s.conf.set("spark.sql.catalog.graftproc",
        classOf[graft.sources.SnapshotCatalog].getName)
      s.conf.set("spark.sql.catalog.graftproc.warehouse", wh)
      val orders = t(s, dir, "orders").select("o_orderkey", "o_orderpriority")
      Snapshots.publish(s, s"$wh/ptab", orders.filter(col("o_orderkey") % 2 === 1))
      Snapshots.publish(s, s"$wh/ptab", orders)
      val v = s.sql("CALL graftproc.sys.rollback('ptab', 1)").head.getInt(0)
      val ops = s.sql("CALL graftproc.sys.history('ptab')").collect()
        .sortBy(_.getInt(0)).map(_.getString(3)).mkString(",")
      s.sql("SELECT * FROM graftproc.ptab")
        .agg(count(lit(1)).as("n"), sum("o_orderkey").cast("long").as("key_sum"))
        .select(col("n"), col("key_sum"), lit(v).as("rollback_version"),
          lit(ops).as("ops"))
    },

    // CLUSTERED LAYOUT SURVIVES SQL DML: a key-clustered table takes a
    // broad SQL UPDATE through the row-level-operation rewrite (the
    // write requests a clustered distribution and rolls files per key,
    // so replacements stay single-valued), and the follow-up aggregation
    // on the cluster key STILL plans with zero shuffles. Both the
    // surviving `#cluster=` header and the absent exchanges ride as
    // in-row flags under the oracle hash, beside the updated values —
    // the "layout is an invariant, not a one-shot" guarantee a 100 TB
    // routing-keyed table needs to keep its join plan through upserts.
    QueryDef.checked(
      "q164_clustered_dml",
      """SELECT o_orderpriority,
        |  count(*) AS n,
        |  CAST(sum(CASE WHEN o_orderkey % 3 = 0
        |                THEN o_orderkey + 1000000 ELSE o_orderkey END)
        |    AS BIGINT) AS key_sum,
        |  CAST(1 AS BOOLEAN) AS still_clustered,
        |  CAST(1 AS BOOLEAN) AS shuffle_free
        |FROM orders GROUP BY o_orderpriority""".stripMargin) { (s, dir) =>
      val wh = freshRoot(s, "q164_clustered_dml", "clusdml_warehouse", dir)
      s.conf.set("spark.sql.catalog.graftclus",
        classOf[graft.sources.SnapshotCatalog].getName)
      s.conf.set("spark.sql.catalog.graftclus.warehouse", wh)
      val orders = t(s, dir, "orders").select("o_orderkey", "o_orderpriority")
      Snapshots.publish(s, s"$wh/cdml", orders,
        clusterBy = Some("o_orderpriority"))
      s.sql("UPDATE graftclus.cdml SET o_orderkey = o_orderkey + 1000000 " +
        "WHERE o_orderkey % 3 = 0")
      val head = Snapshots.versions(s, s"$wh/cdml").last
      val stillClustered = Snapshots.clusterOf(s, s"$wh/cdml", head)
        .contains("o_orderpriority")
      val agg = s.read.format("graft-snapshot").option("root", s"$wh/cdml").load()
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"), sum("o_orderkey").cast("long").as("key_sum"))
      val free = shuffleCount(agg) == 0
      agg.select(col("o_orderpriority"), col("n"), col("key_sum"),
        lit(stillClustered).as("still_clustered"), lit(free).as("shuffle_free"))
    },

    // STATS-BOUNDED TOP-N PUSHDOWN: `ORDER BY ts DESC LIMIT n` over a
    // range-clustered snapshot plans only the files whose bounds can
    // hold a top-n row — order files by best case, take the shortest
    // prefix whose exact non-null row counts cover n, keep files
    // at-or-before its worst bound (Spark's own TopN still runs above,
    // so pruning only must never drop a candidate). The planned-file
    // count rides in the `pruned` flag under the oracle hash beside the
    // exact top rows — "newest 100 rows of a 100 TB time-clustered
    // table" as one band's files, from a plain ORDER BY ... LIMIT.
    QueryDef.checked(
      "q165_topn_pushdown",
      """SELECT CAST(sum(o_orderkey) AS BIGINT) AS key_sum,
        |  CAST(max(o_orderkey) AS BIGINT) AS max_key,
        |  CAST(min(o_orderkey) AS BIGINT) AS min_key,
        |  CAST(1 AS BOOLEAN) AS pruned
        |FROM (SELECT o_orderkey FROM orders
        |      ORDER BY o_orderkey DESC LIMIT 25)""".stripMargin) { (s, dir) =>
      val root = freshRoot(s, "q165_topn_pushdown", "topn_root", dir)
      val orders = t(s, dir, "orders").select("o_orderkey", "o_totalprice")
      Snapshots.publish(s, root,
        orders.repartitionByRange(16, col("o_orderkey"))
          .sortWithinPartitions("o_orderkey"))
      val totalFiles = Snapshots.files(s, root, 1).size
      val top = s.read.format("graft-snapshot").option("root", root).load()
        .orderBy(col("o_orderkey").desc).limit(25)
      // AQE-descending walk: the TakeOrderedAndProject plan has no
      // exchange today, but any future exchange would wrap the scan in
      // an AdaptiveSparkPlanExec leaf and a plain collect would read 0
      val planned = graft.PlanOps.plannedScanFiles(top)
      top.agg(sum("o_orderkey").cast("long").as("key_sum"),
        max("o_orderkey").cast("long").as("max_key"),
        min("o_orderkey").cast("long").as("min_key"))
        .select(col("key_sum"), col("max_key"), col("min_key"),
          lit(planned > 0 && planned < totalFiles).as("pruned"))
    },

    // HYBRID RETRIEVAL: reciprocal-rank fusion of a lexical BM25 top-20
    // and a dense exact-cosine top-20 over the same id domain — the
    // standard uncalibrated combiner (RRF) behind retrieval-augmented
    // dataset construction. Both input lists are already oracle-pinned
    // shapes (q79's rounded-before-rank BM25, q36's cosine ranks), and
    // the fused scores round before ranking with id tie-breaks, so the
    // WHOLE fusion replays exactly in DuckDB. Every join side is
    // top-k-bounded: the fusion costs the same at 100 TB as at sf0.001.
    QueryDef.checked(
      "q166_hybrid_retrieval",
      s"""WITH w AS (SELECT doc_id,
         |    unnest(regexp_split_to_array(trim(text), '${graft.queries.DuckSql.ws}+')) AS tok
         |  FROM documents),
         |dl AS (SELECT doc_id, count(*) AS dl FROM w GROUP BY doc_id),
         |g AS (SELECT CAST(count(*) AS DOUBLE) AS n, avg(dl) AS avgdl FROM dl),
         |q AS (SELECT unnest(['spark', 'merge', 'vector']) AS term),
         |tf AS (SELECT doc_id, tok AS term, count(*) AS tf FROM w
         |       JOIN q ON w.tok = q.term GROUP BY 1, 2),
         |df AS (SELECT term, count(DISTINCT doc_id) AS df FROM tf GROUP BY term),
         |sc AS (SELECT tf.doc_id,
         |    sum(ln((g.n - df.df + 0.5) / (df.df + 0.5) + 1.0)
         |        * tf.tf * 2.2 / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / g.avgdl))) AS s
         |  FROM tf JOIN df USING (term) JOIN dl USING (doc_id), g GROUP BY tf.doc_id),
         |sparse AS (SELECT doc_id, rank FROM
         |    (SELECT doc_id, row_number() OVER (ORDER BY round(s, 6) DESC, doc_id)
         |       AS rank FROM sc)
         |  WHERE rank <= 20),
         |dense AS (SELECT neighbor_id AS doc_id, rank FROM
         |    (SELECT c.vec_id AS neighbor_id,
         |       row_number() OVER (ORDER BY
         |         list_cosine_similarity(q0.embedding, c.embedding) DESC, c.vec_id)
         |         AS rank
         |     FROM embeddings q0, embeddings c
         |     WHERE q0.vec_id = 0 AND c.vec_id != 0)
         |  WHERE rank <= 20),
         |f AS (SELECT COALESCE(sparse.doc_id, dense.doc_id) AS doc_id,
         |    round(COALESCE(1.0 / (60 + sparse.rank), 0)
         |        + COALESCE(1.0 / (60 + dense.rank), 0), 6) AS rrf
         |  FROM sparse FULL OUTER JOIN dense USING (doc_id))
         |SELECT doc_id, rrf, fused_rank FROM
         |  (SELECT doc_id, rrf,
         |     row_number() OVER (ORDER BY rrf DESC, doc_id) AS fused_rank FROM f)
         |WHERE fused_rank <= 10""".stripMargin) { (s, dir) =>
      val docs = t(s, dir, "documents")
      val emb = t(s, dir, "embeddings")
      val sparse = graft.operators.Bm25
        .topDocs(docs, terms = Seq("spark", "merge", "vector"), topK = 20)
        .select(col("doc_id"), col("rank"))
      val dense = graft.operators.Similarity
        .bruteForceTopK(emb, emb.filter(col("vec_id") === 0), k = 20)
        .select(col("neighbor_id").as("doc_id"), col("rn").cast("long").as("rank"))
      graft.operators.Retrieval.rrfFuse(Seq(sparse, dense), topK = 10)
    },

    // COMPOSITE-KEY STORAGE-PARTITIONED JOIN: both sides clustered on
    // the (status, priority) tuple — one file set per value pair — and
    // the join ON both columns plus the re-aggregation above it plan
    // with ZERO shuffles (q161's guarantee extended to the composite
    // routing keys real tables use, e.g. tenant+day). The exchange
    // count rides under the oracle hash.
    QueryDef.checked(
      "q167_composite_spj",
      """SELECT o.o_orderstatus, o.o_orderpriority,
        |  count(*) AS n,
        |  CAST(min(o.o_orderkey) AS BIGINT) AS min_key,
        |  CAST(max(d.cell_n) AS BIGINT) AS cell_n,
        |  CAST(1 AS BOOLEAN) AS shuffle_free
        |FROM orders o
        |JOIN (SELECT o_orderstatus, o_orderpriority, count(*) AS cell_n
        |      FROM orders GROUP BY 1, 2) d
        |  ON o.o_orderstatus = d.o_orderstatus
        | AND o.o_orderpriority = d.o_orderpriority
        |GROUP BY o.o_orderstatus, o.o_orderpriority""".stripMargin) { (s, dir) =>
      val factRoot = freshRoot(s, "q167_composite_spj", "cspj_fact", dir)
      val dimRoot = freshRoot(s, "q167_composite_spj", "cspj_dim", dir)
      val spec = "o_orderstatus,o_orderpriority"
      val orders = t(s, dir, "orders")
        .select("o_orderkey", "o_orderstatus", "o_orderpriority")
      Snapshots.publish(s, factRoot, orders, clusterBy = Some(spec))
      Snapshots.publish(s, dimRoot,
        orders.groupBy("o_orderstatus", "o_orderpriority")
          .agg(count(lit(1)).as("cell_n")),
        clusterBy = Some(spec))
      def read(root: String) =
        s.read.format("graft-snapshot").option("root", root).load()
      val joined = read(factRoot)
        .join(read(dimRoot).hint("merge"), Seq("o_orderstatus", "o_orderpriority"))
        .groupBy("o_orderstatus", "o_orderpriority")
        .agg(count(lit(1)).as("n"),
          min("o_orderkey").cast("long").as("min_key"),
          max("cell_n").cast("long").as("cell_n"))
      val free = shuffleCount(joined) == 0
      joined.select(col("o_orderstatus"), col("o_orderpriority"), col("n"),
        col("min_key"), col("cell_n"), lit(free).as("shuffle_free"))
    },

    // MANIFEST PARSE CACHE as oracle evidence (the SURVEY row was
    // spec-only through round 9): committed manifests are immutable, so
    // the planner caches each under its (path, length, mtime) stamp.
    // The claim — "a warm-cache planning pass costs ONE getFileStatus
    // validation and ZERO manifest reads" — is about filesystem
    // round-trips, so the table lives under the call-recording
    // `graftcount://` scheme ([[graft.sources.CountingFileSystem]]):
    // after one warming read, a FRESH scan is planned end-to-end
    // (pushdown, statistics, file packing) with the recorder on, and the
    // flags ride under the oracle hash: `cache_no_reopen` (zero opens of
    // any `_snapshots/` manifest), `cache_validated` (>= 1 stamp
    // getFileStatus — the cache is validating, not blindly trusting) and
    // `files_planned` (the pass really planned the scan's files). At
    // 100 TB this is the difference between O(files) driver manifest
    // re-reads per planning touch and one metadata round-trip.
    QueryDef.checked(
      "q169_manifest_cache",
      """SELECT o_orderpriority, count(*) AS n_rows,
        |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |    AS sum_cents,
        |  CAST(1 AS BOOLEAN) AS cache_no_reopen,
        |  CAST(1 AS BOOLEAN) AS cache_validated,
        |  CAST(1 AS BOOLEAN) AS files_planned
        |FROM orders GROUP BY 1""".stripMargin) { (s, dir) =>
      import graft.sources.CountingFileSystem
      s.sparkContext.hadoopConfiguration.set("fs.graftcount.impl",
        classOf[CountingFileSystem].getName)
      val localRoot = freshRoot(s, "q169_manifest_cache", "mcache_root", dir)
      val root = s"graftcount://$localRoot"
      Snapshots.publish(s, root,
        t(s, dir, "orders").select("o_orderkey", "o_orderpriority", "o_totalprice")
          .repartition(4))
      // age the manifest past the cache's recency window (a just-written
      // manifest is deliberately served fresh-read — see Snapshots'
      // delete-and-recreate stamp guard), then warm the cache with one read
      val fs = new org.apache.hadoop.fs.Path(root)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      val manifest = new org.apache.hadoop.fs.Path(s"$root/_snapshots/v1")
      fs.setTimes(manifest, System.currentTimeMillis() - 60000L, -1L)
      def read() = s.read.format("graft-snapshot").option("root", root).load()
      graft.PlanOps.plannedScanFiles(read()) // warming pass populates the cache
      // measured window: a FRESH read planned end-to-end
      CountingFileSystem.reset()
      val df = read().filter(col("o_totalprice") > 0)
      val planned = graft.PlanOps.plannedScanFiles(df)
      val reopens = CountingFileSystem.count("open", "_snapshots/")
      val validations = CountingFileSystem.count("status", "_snapshots/v1")
      df.groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n_rows"),
          sum(round(col("o_totalprice") * 100).cast("long")).as("sum_cents"))
        .select(col("o_orderpriority"), col("n_rows"), col("sum_cents"),
          lit(reopens == 0).as("cache_no_reopen"),
          lit(validations >= 1).as("cache_validated"),
          lit(planned > 0).as("files_planned"))
    },

    // TYPE-WIDENING ALTER TABLE (int→long, float→double) as a
    // METADATA-ONLY evolution: the table starts with INT keys and FLOAT
    // measures, `ALTER COLUMN ... TYPE` widens both in one manifest
    // write (`metadata_only`: the evolved versions list exactly v1's
    // files), a post-widening INSERT lands BIGINT/DOUBLE physical files,
    // and ONE scan serves both generations — the vectorized reader
    // promotes the old int32/float bytes at read, footer-stats pruning
    // and metadata aggregates carry over because stats tags are
    // type-FAMILY scoped. Narrowing refuses (`narrowing_refused`), and
    // VERSION AS OF still serves v1 under its own pre-widening schema
    // (`old_schema_kept`). The oracle recomputes the merged table
    // relationally; at 100 TB this is "widen a petabyte table without
    // rewriting a byte".
    QueryDef.checked(
      "q170_widen_alter",
      """SELECT
        |  (SELECT count(*) FROM lineitem) AS n_total,
        |  (SELECT CAST(sum(l_orderkey) AS BIGINT) FROM lineitem) AS key_sig,
        |  (SELECT CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT)
        |     FROM lineitem) AS qty_sum,
        |  (SELECT count(*) FROM lineitem WHERE l_orderkey % 2 = 0) AS n_even,
        |  CAST(1 AS BOOLEAN) AS metadata_only,
        |  CAST(1 AS BOOLEAN) AS narrowing_refused,
        |  CAST(1 AS BOOLEAN) AS old_schema_kept""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.types.{IntegerType, FloatType}
      val wh = freshRoot(s, "q170_widen_alter", "widen_wh", dir)
      s.conf.set("spark.sql.catalog.q170cat",
        classOf[graft.sources.SnapshotCatalog].getName)
      s.conf.set("spark.sql.catalog.q170cat.warehouse", wh)
      val li = t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
      // generation 1: INT32 keys, FLOAT measures (both exactly-valued:
      // keys < 2^31, quantities integral 1..50)
      Snapshots.publish(s, s"$wh/t",
        li.filter(col("l_orderkey") % 2 === 0)
          .withColumn("l_orderkey", col("l_orderkey").cast("int"))
          .withColumn("l_quantity", col("l_quantity").cast("float")))
      s.sql("ALTER TABLE q170cat.t ALTER COLUMN l_orderkey TYPE BIGINT")
      s.sql("ALTER TABLE q170cat.t ALTER COLUMN l_quantity TYPE DOUBLE")
      val metadataOnly =
        Snapshots.files(s, s"$wh/t", 3) == Snapshots.files(s, s"$wh/t", 1)
      // generation 2: native BIGINT/DOUBLE physical files
      li.filter(col("l_orderkey") % 2 === 1).createOrReplaceTempView("q170_delta")
      s.sql("INSERT INTO q170cat.t SELECT * FROM q170_delta")
      // Spark's own analyzer refuses the non-up-castable change before
      // the catalog's widens() check even runs (two lines of defense);
      // the evidence is refusal + an unchanged schema, not message text
      val narrowingRefused =
        (try { s.sql("ALTER TABLE q170cat.t ALTER COLUMN l_orderkey TYPE INT"); false }
         catch { case _: Exception => true }) &&
          s.table("q170cat.t").schema("l_orderkey").dataType ==
            org.apache.spark.sql.types.LongType
      val oldKept = {
        val v1 = s.sql("SELECT * FROM q170cat.t VERSION AS OF 1").schema
        v1("l_orderkey").dataType == IntegerType && v1("l_quantity").dataType == FloatType
      }
      s.sql("""SELECT count(*) AS n_total,
        |  CAST(sum(l_orderkey) AS BIGINT) AS key_sig,
        |  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty_sum,
        |  count(CASE WHEN l_orderkey % 2 = 0 THEN 1 END) AS n_even
        |FROM q170cat.t""".stripMargin)
        .withColumn("metadata_only", lit(metadataOnly))
        .withColumn("narrowing_refused", lit(narrowingRefused))
        .withColumn("old_schema_kept", lit(oldKept))
    },

    // STREAMING UPSERT into a snapshot table (the CDC-ingest shape):
    // `writeStream` in Update mode with a `keyColumns` option lands each
    // micro-batch as a copy-on-write MERGE — first batch bootstraps the
    // table, every later batch rewrites only key-overlapping files, and
    // the manifest batch id makes replays no-ops. A keyed change stream
    // (inserts → upserts → tombstone deletes, one source version per
    // trigger) must replay to EXACTLY the equivalent batch MERGE — the
    // oracle computes that final state relationally, and the flags pin
    // restart exactly-once (`exactly_once`: re-running the drained
    // stream publishes nothing), per-batch versioning (`merged_versions`)
    // and checkpoint resume across new source data (`resumed`).
    QueryDef.checked(
      "q171_stream_upsert",
      """WITH base AS (SELECT o_orderkey AS k, o_totalprice AS p FROM orders),
        |final AS (
        |  SELECT k, CASE WHEN k % 5 = 0 THEN p + 1000.0 ELSE p END AS p
        |  FROM base WHERE (k % 3 = 0 OR k % 5 = 0) AND k % 15 <> 0
        |)
        |SELECT count(*) AS n_rows, CAST(sum(k) AS BIGINT) AS key_sig,
        |  CAST(sum(CAST(round(p * 100) AS BIGINT)) AS BIGINT) AS sum_cents,
        |  CAST(1 AS BOOLEAN) AS exactly_once,
        |  CAST(1 AS BOOLEAN) AS merged_versions,
        |  CAST(1 AS BOOLEAN) AS resumed
        |FROM final""".stripMargin) { (s, dir) =>
      val src = freshRoot(s, "q171_stream_upsert", "upsert_src", dir)
      val dst = freshRoot(s, "q171_stream_upsert", "upsert_dst", dir)
      val orders = t(s, dir, "orders")
        .select(col("o_orderkey").as("k"), col("o_totalprice").as("p"))
      // the change stream, one snapshot version per batch:
      // v1 inserts, v2 upserts (price bump, some keys new), v3 deletes
      Snapshots.publish(s, src, orders.filter(col("k") % 3 === 0)
        .withColumn("deleted", lit(false)))
      Snapshots.publish(s, src, orders.filter(col("k") % 5 === 0)
        .withColumn("p", col("p") + 1000.0).withColumn("deleted", lit(false)),
        append = true)
      val ck = graft.Scratch.ephemeralCheckpoint("q171_stream_upsert")
      def run(): Unit = {
        val q = s.readStream.format("graft-snapshot").option("root", src)
          .option("maxVersionsPerTrigger", "1").load()
          .writeStream.format("graft-snapshot").option("root", dst)
          .outputMode("update")
          .option("keyColumns", "k").option("tombstoneColumn", "deleted")
          .option("checkpointLocation", ck)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
        require(q.awaitTermination(300000), "AvailableNow drain timed out")
      }
      run()
      val mergedVersions = Snapshots.versions(s, dst).size == 2
      val vAfterFirst = Snapshots.versions(s, dst)
      run() // restart, no new source data: must merge NOTHING twice
      val exactlyOnce = Snapshots.versions(s, dst) == vAfterFirst
      // new source data after the restart: the tombstone batch
      Snapshots.publish(s, src, orders.filter(col("k") % 15 === 0)
        .withColumn("deleted", lit(true)), append = true)
      run()
      val resumed = Snapshots.versions(s, dst).size == 3
      Snapshots.read(s, dst)
        .agg(count(lit(1)).as("n_rows"),
          sum(col("k")).as("key_sig"),
          sum(round(col("p") * 100).cast("long")).as("sum_cents"))
        .withColumn("exactly_once", lit(exactlyOnce))
        .withColumn("merged_versions", lit(mergedVersions))
        .withColumn("resumed", lit(resumed))
    },

    // ONE-SIDE storage-partitioned shuffle: a key-clustered fact joined
    // with a PLAIN (unclustered) frame — under
    // `spark.sql.sources.v2.bucketing.shuffle.enabled` only the plain
    // side shuffles, INTO the fact's key-grouped layout
    // (`Exchange keygroupedpartitioning`), and the clustered side scans
    // in place. The asymmetric everyday join at 100 TB: clustered fact ⋈
    // fresh delta without ever re-shuffling the fact. In-row flags pin
    // exactly ONE exchange and that it targets the key-grouped layout;
    // the oracle replays the join + aggregate relationally.
    QueryDef.checked(
      "q172_spj_one_side_shuffle",
      """SELECT o.o_orderpriority, count(*) AS n,
        |  CAST(sum(o.o_orderkey) AS BIGINT) AS key_sig,
        |  CAST(1 AS BOOLEAN) AS one_exchange,
        |  CAST(1 AS BOOLEAN) AS into_key_groups
        |FROM orders o JOIN orders d ON o.o_orderpriority = d.o_orderpriority
        |  AND d.o_orderkey % 1000 = 0
        |GROUP BY 1""".stripMargin) { (s, dir) =>
      val factRoot = freshRoot(s, "q172_spj_one_side_shuffle", "oneshuf_fact", dir)
      val orders = t(s, dir, "orders").select("o_orderkey", "o_orderpriority")
      Snapshots.publish(s, factRoot, orders, clusterBy = Some("o_orderpriority"))
      val plain = orders.filter(col("o_orderkey") % 1000 === 0)
        .select(col("o_orderpriority"), col("o_orderkey").as("d_key"))
      // evidence plans on an ISOLATED session: Verify runs queries
      // concurrently on the shared session, so toggling session confs
      // there could flip another query's pinned plan flag mid-planning
      val s2 = s.newSession()
      s2.conf.set("spark.sql.sources.v2.bucketing.shuffle.enabled", "true")
      s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // no broadcast escape
      val fact2 = s2.read.format("graft-snapshot").option("root", factRoot).load()
      val plain2 = graft.Tables.load(s2, dir, "orders")
        .filter(col("o_orderkey") % 1000 === 0)
        .select(col("o_orderpriority"), col("o_orderkey").as("d_key"))
      val joined = fact2.join(plain2.hint("merge"), "o_orderpriority")
      joined.count() // finalize the (possibly adaptive) plan
      val oneExchange = graft.PlanOps.shuffleCount(joined) == 1
      val intoKeyGroups = joined.queryExecution.executedPlan.toString
        .contains("keygroupedpartitioning")
      val fact = s.read.format("graft-snapshot").option("root", factRoot).load()
      fact.join(plain, Seq("o_orderpriority"))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"), sum("o_orderkey").as("key_sig"))
        .select(col("o_orderpriority"), col("n"), col("key_sig"),
          lit(oneExchange).as("one_exchange"),
          lit(intoKeyGroups).as("into_key_groups"))
    }
  )
}
