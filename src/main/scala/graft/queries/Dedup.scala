package graft.queries

import graft.{QueryDef, Tables}
import graft.functions.TextFunctions
import graft.operators.{MinHashDedup, SimHashDedup, SpanDedup}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deduplication tier over `documents` (SURVEY.md §2.6 extension table):
  * exact (hash group), word-set jaccard (blocked inverted index), MinHash
  * LSH (verified candidates — oracle-checkable because the fixture's
  * near-dup pairs separate cleanly from the background at j = 0.5), and
  * SimHash (rows-only; the oracle cannot reproduce xxhash64).
  */
object Dedup {

  private def t(s: SparkSession, dir: String, n: String): DataFrame = Tables.load(s, dir, n)

  /** One materialized pair graph per CORPUS VERSION: q33 emits the pairs,
    * q51 reads components of the SAME graph, q55 drops non-keepers from
    * the SAME graph — without sharing, each of the three recomputes the
    * whole explode→index→join→verify pipeline from the raw corpus (3× the
    * most expensive relation in the engine). The graph lives as a
    * [[graft.operators.DedupPipeline]] scratch artifact (pairs +
    * components parquet, fingerprint-stamped), so it survives the session
    * and is shared across JVMs — the cluster-scale shape, where the graph
    * is a scratch table written once per corpus version. Consumers pay
    * one fingerprint scan of `documents`; a corpus rewritten in place
    * rebuilds instead of reusing a stale graph.
    */
  private def scratch(dir: String, threshold: Double): String =
    s"${sys.props("java.io.tmpdir")}/graft-scratch/dedup_" +
      s"${dir.replaceAll("[^a-zA-Z0-9.]", "_")}_$threshold"

  private def jaccardPairs(s: SparkSession, dir: String,
      threshold: Double = 0.8): DataFrame =
    graft.operators.DedupPipeline.pairs(s, t(s, dir, "documents"),
      scratch(dir, threshold), threshold)

  private def dupComponents(s: SparkSession, dir: String,
      threshold: Double = 0.8): DataFrame =
    graft.operators.DedupPipeline.components(s, t(s, dir, "documents"),
      scratch(dir, threshold), threshold)

  /** Shared oracle-SQL fragments — the jaccard-pair and reachability CTEs
    * appear in three oracles (q33, q51, q55); single source so the
    * threshold/blocking can never drift between them.
    */
  private val pairsCteSql =
    """dw AS (SELECT DISTINCT doc_id, lang, source,
      |    unnest(string_split(text, ' ')) AS w FROM documents),
      |sz AS (SELECT doc_id, count(*) AS n FROM dw GROUP BY 1),
      |p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
      |  FROM dw a JOIN dw b ON a.w = b.w AND a.lang = b.lang
      |    AND a.source = b.source AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2)""".stripMargin

  /** The dense diagonal-run span SQL, shared by q97 (subset) and q119
    * (full corpus vs the winnow-prefiltered engine path) — single source
    * so k/minLen can never drift between the exhaustive and scale forms.
    */
  private def denseSpanSql(docFilter: String): String =
    s"""WITH g AS (
       |  SELECT doc_id, text,
       |         unnest(generate_series(1, greatest(length(text)-15, 1))) AS pos
       |  FROM documents $docFilter
       |), grams AS (
       |  SELECT doc_id, pos, substr(text, pos, 16) AS gram FROM g
       |  WHERE length(substr(text, pos, 16)) = 16
       |), m AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.pos AS pa, b.pos AS pb,
       |         a.pos - b.pos AS diag
       |  FROM grams a JOIN grams b ON a.gram = b.gram AND a.doc_id < b.doc_id
       |), runs AS (
       |  SELECT doc_a, doc_b, diag, pa, pb,
       |         pa - row_number() OVER (PARTITION BY doc_a, doc_b, diag
       |                                 ORDER BY pa) AS island
       |  FROM m
       |)
       |SELECT doc_a, doc_b, diag, min(pa) AS a_start, min(pb) AS b_start,
       |       max(pa) - min(pa) + 16 AS span_chars
       |FROM runs GROUP BY doc_a, doc_b, diag, island
       |HAVING max(pa) - min(pa) + 16 >= 40""".stripMargin

  private def pairsSelectSql(cols: String) =
    s"""SELECT $cols
       |FROM p JOIN sz sa ON sa.doc_id = doc_a JOIN sz sb ON sb.doc_id = doc_b
       |WHERE CAST(inter AS DOUBLE) / (sa.n + sb.n - inter) >= 0.8""".stripMargin

  /** The exact shingle-jaccard pair SQL shared by q34 (batch) and q176
    * (streaming accumulation) — one source so the shingling/threshold
    * can never drift between the two forms.
    */
  private def minhashOracleSql(docFilter: String = ""): String =
    s"""WITH docs AS (SELECT doc_id, string_split(text, ' ') AS toks
      |          FROM documents $docFilter),
      |sh AS (
      |  SELECT DISTINCT doc_id, unnest(CASE WHEN len(toks) >= 3
      |    THEN list_transform(range(1, len(toks) - 1),
      |                        i -> array_to_string(toks[i:i+2], ' '))
      |    ELSE [array_to_string(toks, ' ')] END) AS shingle
      |  FROM docs),
      |sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
      |pairs AS (
      |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
      |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2)
      |SELECT doc_a, doc_b,
      |  CAST(inter AS DOUBLE) / (sa.n + sb.n - inter) AS jac
      |FROM pairs JOIN sz sa ON sa.doc_id = doc_a
      |           JOIN sz sb ON sb.doc_id = doc_b
      |WHERE CAST(inter AS DOUBLE) / (sa.n + sb.n - inter) >= 0.5""".stripMargin

  /** The exact fixed-point pagerank oracle (q117): the pair graph's
    * symmetrized edges, then `iters` CHAINED CTEs — one join+groupBy per
    * round, no recursion (the iteration count is fixed, so recursive-CTE
    * aggregation limits never apply). Integer-only arithmetic (`//` is
    * DuckDB floor division ≡ truncation on positives ≡ Spark's `div`),
    * mirror of [[graft.operators.PageRank.runExact]] step for step:
    * r0 = S // n, r' = (3S//20)//n + (17·Σ(r//deg))//20.
    */
  private def pagerankSql(iters: Int): String = {
    val S = "1000000000000"
    val tele = s"(3 * $S // 20) // (SELECT n FROM nn)"
    val steps = (1 to iters).map { i =>
      s"""r$i AS (SELECT e.b AS id,
         |  $tele + (17 * sum(r.rank // e.deg)) // 20 AS rank
         |  FROM e JOIN r${i - 1} r ON e.a = r.id GROUP BY e.b)""".stripMargin
    }.mkString(",\n")
    s"""WITH $pairsCteSql,
       |pairs AS (
       |  ${pairsSelectSql("doc_a, doc_b")}),
       |edges AS (SELECT doc_a AS a, doc_b AS b FROM pairs
       |          UNION SELECT doc_b, doc_a FROM pairs),
       |deg AS (SELECT a, count(*) AS deg FROM edges GROUP BY a),
       |e AS (SELECT edges.a, edges.b, deg.deg FROM edges JOIN deg USING (a)),
       |nn AS (SELECT count(*) AS n FROM deg),
       |r0 AS (SELECT a AS id, $S // (SELECT n FROM nn) AS rank FROM deg),
       |$steps
       |SELECT id AS doc_id, CAST(rank AS BIGINT) AS rank_e12 FROM r$iters""".stripMargin
  }

  private val reachCteSql =
    s"""pairs AS (
       |  WITH $pairsCteSql
       |  ${pairsSelectSql("doc_a, doc_b")}),
       |edges AS (SELECT doc_a AS a, doc_b AS b FROM pairs
       |          UNION SELECT doc_b, doc_a FROM pairs),
       |nodes AS (SELECT DISTINCT a AS node FROM edges),
       |reach(node, r) AS (
       |  SELECT node, node FROM nodes
       |  UNION
       |  SELECT e.a, reach.r FROM edges e JOIN reach ON e.b = reach.node)""".stripMargin

  val entries: Seq[QueryDef] = Seq(

    // exact dedup: identical text → one keeper (first doc_id), copy count
    QueryDef.checked(
      "q32_dedup_exact",
      """SELECT md5(text) AS text_hash, CAST(min(doc_id) AS BIGINT) AS keep_id,
        |  count(*) AS n_copies
        |FROM documents GROUP BY 1""".stripMargin) { (s, dir) =>
      t(s, dir, "documents")
        .groupBy(md5(col("text")).as("text_hash"))
        .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
    },

    // NEAR-EXACT dedup on a canonical form (the Dolma/C4 "fuzzy exact"
    // pass): lowercase, strip common punctuation, collapse whitespace —
    // catches re-encodes and copy-paste variants that byte-exact q32
    // misses at hash-groupBy cost, the tier between exact and MinHash.
    // The canonicalization is literal character classes only — whitespace
    // is '[ \t\n\r\f]+', NOT '\s+', because Java's \s includes vertical
    // tab \x0B while RE2's does not, so a '\s+' document containing \x0B
    // would canonicalize differently per engine — so the whole decision
    // replays in DuckDB exactly; `extra_copies` counts what
    // canonicalization caught beyond the byte-exact pass.
    QueryDef.checked(
      "q175_canonical_dedup",
      """WITH c AS (
        |  SELECT doc_id, md5(text) AS bh,
        |    md5(regexp_replace(regexp_replace(lower(trim(text)),
        |          '[.,!?;:''"()]', '', 'g'), '[ \t\n\r\f]+', ' ', 'g')) AS ch
        |  FROM documents)
        |SELECT ch AS canon_hash, CAST(min(doc_id) AS BIGINT) AS keep_id,
        |  count(*) AS n_copies,
        |  CAST(count(*) - count(DISTINCT bh) AS BIGINT) AS extra_copies
        |FROM c GROUP BY 1""".stripMargin) { (s, dir) =>
      t(s, dir, "documents")
        .select(col("doc_id"), md5(col("text")).as("bh"),
          md5(regexp_replace(regexp_replace(lower(trim(col("text"))),
            "[.,!?;:'\"()]", ""), "[ \\t\\n\\r\\f]+", " ")).as("ch"))
        .groupBy(col("ch").as("canon_hash"))
        .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"),
          (count(lit(1)) - countDistinct(col("bh"))).as("extra_copies"))
    },

    // word-SET jaccard pairs, blocked by (lang, source) — the inverted-
    // index join shape that scales with true collisions, not |docs|².
    QueryDef.checked(
      "q33_jaccard_pairs",
      s"""WITH $pairsCteSql
         |${pairsSelectSql(
        "doc_a, doc_b, CAST(inter AS DOUBLE) / (sa.n + sb.n - inter) AS jac")}""".stripMargin) { (s, dir) =>
      jaccardPairs(s, dir)
    },

    // INCREMENTAL dedup — the daily-ingest shape: only pairs involving a
    // "fresh" doc (id above a watermark at 80% of the corpus) are
    // computed/verified; the old×old pair graph is never recomputed. The
    // oracle is the FULL pair join restricted to fresh-involving pairs,
    // so a hash match proves the incremental path returns exactly the
    // full recompute's subset (df counts from the union corpus keep the
    // prefix-filter recall guarantee exact).
    QueryDef.checked(
      "q75_incremental_dedup",
      s"""WITH cut AS (SELECT CAST(floor(max(doc_id) * 4.0 / 5) AS BIGINT) AS s
         |            FROM documents),
         |$pairsCteSql
         |${pairsSelectSql(
        "doc_a, doc_b, CAST(inter AS DOUBLE) / (sa.n + sb.n - inter) AS jac")}
         |  AND (doc_a >= (SELECT s FROM cut) OR doc_b >= (SELECT s FROM cut))""".stripMargin) {
      (s, dir) =>
        val docs = t(s, dir, "documents")
        val cut = docs.agg(max("doc_id")).head().getLong(0) * 4 / 5
        graft.operators.DedupPipeline.incrementalPairs(docs, col("doc_id") >= cut, 0.8)
    },

    // MinHash-LSH near-dup with exact verification — matches the exact
    // shingle-jaccard oracle because band recall at j≥0.5 is ~0.9999
    // (64 hashes, 32 bands × 2 rows) and the fixture has no pairs in
    // (0.3, 0.5) to sit on the boundary.
    QueryDef.checked("q34_minhash_pairs", minhashOracleSql()) { (s, dir) =>
      MinHashDedup.verifiedPairs(t(s, dir, "documents"), "doc_id", "text")
    },

    // STREAMING incremental near-dup — the continuous-ingest form of q34:
    // documents arrive as three snapshot versions, each micro-batch
    // compares only against the accumulated per-doc state (signatures +
    // shingle sets — old docs never re-tokenized) and appends the pairs
    // it completes, exactly-once via manifest batch ids. The oracle is
    // q34's FULL-corpus SQL verbatim: a hash match proves the streamed
    // accumulation equals the batch recompute — no pair lost across
    // batch boundaries, none found twice.
    // Corpus SUBSET (doc_id % 2 = 0), the q97 discipline: the streaming
    // machinery (3 drains, 6 snapshot publishes, per-batch state joins)
    // carries enough fixed cost that the full corpus would double the
    // suite's slowest line for no extra evidence — the equality claim is
    // batch-boundary coverage, which the subset proves identically.
    QueryDef.checked("q176_stream_neardup",
      minhashOracleSql("WHERE doc_id % 2 = 0")) { (s, dir) =>
      import graft.streaming.DocStreams
      val fs = new org.apache.hadoop.fs.Path("/")
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      def root(n: String) = {
        val r = graft.Scratch.dir("q176_stream_neardup", n, dir)
        fs.delete(new org.apache.hadoop.fs.Path(r), true) // idempotent rerun
        r
      }
      val (src, seenRoot, pairsRoot) = (root("src"), root("seen"), root("pairs"))
      // the derived band-state sibling is part of the same atomic state
      // set — a stale one would put every batch on the catch-up path
      fs.delete(new org.apache.hadoop.fs.Path(
        DocStreams.bandRootOf(seenRoot)), true)
      val docs = t(s, dir, "documents").select("doc_id", "text")
        .filter(col("doc_id") % 2 === 0)
      // two ingest batches: one cross-batch boundary is the whole claim
      // (a pair's members in different batches must still be found)
      graft.operators.Snapshots.publish(s, src, docs.filter(col("doc_id") % 4 === 0))
      graft.operators.Snapshots.publish(s, src, docs.filter(col("doc_id") % 4 === 2),
        append = true)
      val ck = graft.Scratch.ephemeralCheckpoint("q176_stream_neardup")
      // buckets sized to the SUBSET, not the operator's 100 TB default:
      // each clustered state publish writes one file set per bucket, so
      // 64 buckets on a few thousand docs is pure small-file overhead
      // (the bucket count is a per-deployment knob by design)
      val q = s.readStream.format("graft-snapshot").option("root", src)
        .option("maxVersionsPerTrigger", "1").load()
        .writeStream.foreachBatch(
          DocStreams.incrementalNearDup(seenRoot, pairsRoot, buckets = 8) _)
        .option("checkpointLocation", ck)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      require(q.awaitTermination(300000), "AvailableNow drain timed out")
      graft.operators.Snapshots.read(s, pairsRoot)
        .select(col("doc_a"), col("doc_b"), col("jac"))
    },

    // KEYED-UPDATE streaming near-dup under the oracle hash: a second
    // source version RE-DELIVERS half the corpus's ids with new texts
    // (group moves), and DocStreams.upsertNearDup retracts each updated
    // doc's superseded band rows and stale pairs while inserting the new
    // ones — the accumulated pair state after the drain EQUALS the batch
    // recompute over the FINAL texts. The corpus is constructed (one
    // identical text per group, tokens carrying the group id), so the
    // expected pair set is exactly the within-final-group pairs with
    // jac = 1.0 — fully replayable relationally; a stale pair surviving
    // (or a new pair missed) flips the hash.
    QueryDef.checked("q196_stream_neardup_upsert",
      """WITH ids AS (SELECT doc_id FROM documents
        |             WHERE doc_id % 3 = 0 AND doc_id < 1200),
        |fin AS (SELECT doc_id,
        |  CASE WHEN doc_id % 6 = 0 THEN doc_id % 20 + 100
        |       ELSE doc_id % 20 END AS g
        |  FROM ids)
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |  CAST(1.0 AS DOUBLE) AS jac
        |FROM fin a JOIN fin b ON a.g = b.g AND a.doc_id < b.doc_id""".stripMargin
    ) { (s, dir) =>
      import graft.streaming.DocStreams
      val fs = new org.apache.hadoop.fs.Path("/")
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      def root(n: String) = {
        val r = graft.Scratch.dir("q196_stream_neardup_upsert", n, dir)
        fs.delete(new org.apache.hadoop.fs.Path(r), true) // idempotent rerun
        r
      }
      val (src, seenRoot, pairsRoot) =
        (root("ups_src"), root("ups_seen"), root("ups_pairs"))
      fs.delete(new org.apache.hadoop.fs.Path(
        DocStreams.bandRootOf(seenRoot)), true)
      val ids = t(s, dir, "documents").select("doc_id")
        .filter(col("doc_id") % 3 === 0 && col("doc_id") < 1200)
      // one identical 12-token text per group; tokens embed the group id
      // so distinct groups share no shingles
      val v1 = ids.withColumn("__g", col("doc_id") % 20)
        .select(col("doc_id"), expr(
          "concat_ws(' ', transform(sequence(1, 12), x -> concat('w', __g, 'x', x)))")
          .as("text"))
      val v2 = ids.filter(col("doc_id") % 6 === 0)
        .withColumn("__g", col("doc_id") % 20 + 100)
        .select(col("doc_id"), expr(
          "concat_ws(' ', transform(sequence(1, 12), x -> concat('w', __g, 'x', x)))")
          .as("text"))
      graft.operators.Snapshots.publish(s, src, v1)
      graft.operators.Snapshots.publish(s, src, v2, append = true)
      val ck = graft.Scratch.ephemeralCheckpoint("q196_stream_neardup_upsert")
      val q = s.readStream.format("graft-snapshot").option("root", src)
        .option("maxVersionsPerTrigger", "1").load()
        .writeStream.foreachBatch(
          DocStreams.upsertNearDup(seenRoot, pairsRoot, buckets = 8) _)
        .option("checkpointLocation", ck)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      require(q.awaitTermination(300000), "AvailableNow drain timed out")
      graft.operators.Snapshots.read(s, pairsRoot)
        .select(col("doc_a"), col("doc_b"), col("jac"))
    },

    // TAKEDOWN streaming near-dup under the oracle hash: an insert
    // version ingests the corpus, a DELETE version (tombstone rows, the
    // GDPR shape) takes ~1/7 of the ids down, and
    // DocStreams.upsertNearDup's tombstone path retracts each removed
    // doc's seen row, band rows, and every pair it anchored — the
    // accumulated pair state after the drain EQUALS the batch recompute
    // over the SURVIVING texts (the delete criterion cuts across the
    // group structure, so groups shrink partially — retraction has to
    // remove individual members' pairs, not whole cliques). The corpus
    // is constructed like q196's (one identical text per group), so the
    // oracle replays survivors relationally; a stale pair surviving the
    // takedown (or a surviving pair lost) flips the hash. Evidence
    // flags: the seen state holds exactly the surviving ids, and a
    // re-delivered delete batch publishes nothing.
    QueryDef.checked("q198_stream_neardup_delete",
      """WITH ids AS (SELECT doc_id FROM documents
        |             WHERE doc_id % 3 = 1 AND doc_id < 1200),
        |surv AS (SELECT doc_id, doc_id % 20 AS g FROM ids
        |         WHERE doc_id % 7 <> 3)
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |  CAST(1.0 AS DOUBLE) AS jac,
        |  CAST(1 AS BOOLEAN) AS seen_retracted,
        |  CAST(1 AS BOOLEAN) AS replay_noop
        |FROM surv a JOIN surv b ON a.g = b.g AND a.doc_id < b.doc_id""".stripMargin
    ) { (s, dir) =>
      import graft.streaming.DocStreams
      val fs = new org.apache.hadoop.fs.Path("/")
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      def root(n: String) = {
        val r = graft.Scratch.dir("q198_stream_neardup_delete", n, dir)
        fs.delete(new org.apache.hadoop.fs.Path(r), true) // idempotent rerun
        r
      }
      val (src, seenRoot, pairsRoot) =
        (root("del_src"), root("del_seen"), root("del_pairs"))
      fs.delete(new org.apache.hadoop.fs.Path(
        DocStreams.bandRootOf(seenRoot)), true)
      val ids = t(s, dir, "documents").select("doc_id")
        .filter(col("doc_id") % 3 === 1 && col("doc_id") < 1200)
      val v1 = ids.withColumn("__g", col("doc_id") % 20)
        .select(col("doc_id"), expr(
          "concat_ws(' ', transform(sequence(1, 12), x -> concat('w', __g, 'x', x)))")
          .as("text"))
        .withColumn("__del", lit(false))
      val v2 = ids.filter(col("doc_id") % 7 === 3)
        .select(col("doc_id"), lit(null).cast("string").as("text"),
          lit(true).as("__del"))
      graft.operators.Snapshots.publish(s, src, v1)
      graft.operators.Snapshots.publish(s, src, v2, append = true)
      val ck = graft.Scratch.ephemeralCheckpoint("q198_stream_neardup_delete")
      val q = s.readStream.format("graft-snapshot").option("root", src)
        .option("maxVersionsPerTrigger", "1").load()
        .writeStream.foreachBatch(
          DocStreams.upsertNearDup(seenRoot, pairsRoot, buckets = 8,
            tombstoneCol = Some("__del")) _)
        .option("checkpointLocation", ck)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      require(q.awaitTermination(300000), "AvailableNow drain timed out")
      // evidence: seen holds exactly the surviving ids (deleted docs'
      // rows retracted, nothing else lost)
      val surv = ids.filter(col("doc_id") % 7 =!= 3)
      val seenIds = graft.operators.Snapshots.read(s, seenRoot).select("doc_id")
      val seenRetracted = seenIds.except(surv).isEmpty && surv.except(seenIds).isEmpty
      // evidence: a crash-redelivered delete batch publishes NOTHING
      def vset = (graft.operators.Snapshots.versions(s, seenRoot),
        graft.operators.Snapshots.versions(s, pairsRoot),
        graft.operators.Snapshots.versions(s, DocStreams.bandRootOf(seenRoot)))
      val before = vset
      DocStreams.upsertNearDup(seenRoot, pairsRoot, buckets = 8,
        tombstoneCol = Some("__del"))(v2, 1L)
      val replayNoop = vset == before
      graft.operators.Snapshots.read(s, pairsRoot)
        .select(col("doc_a"), col("doc_b"), col("jac"))
        .withColumn("seen_retracted", lit(seenRetracted))
        .withColumn("replay_noop", lit(replayNoop))
    },

    // SimHash near-dup (rows-only: xxhash64 has no DuckDB equivalent;
    // cross-checked against MinHash in DedupSpec instead). The expensive
    // half — the tokenize → 64-bit-sum fingerprint scan — reads the
    // per-corpus-version (doc_id, simhash) artifact (the q33 pair-graph
    // discipline), so repeated invocations re-band 8-byte rows instead of
    // re-scanning the corpus.
    QueryDef.rowsOnly("q35_simhash_pairs") { (s, dir) =>
      val fps = SimHashDedup.fingerprints(s, t(s, dir, "documents"),
        s"${sys.props("java.io.tmpdir")}/graft-scratch/simhash_" +
          dir.replaceAll("[^a-zA-Z0-9.]", "_"))
      SimHashDedup.pairsFromFingerprints(fps)
    },

    // connected components over the q33 dup-pair graph: cluster-level
    // dedup (keeper = min doc_id per component). Oracle: transitive
    // closure via recursive CTE.
    QueryDef.checked(
      "q51_dedup_components",
      s"""WITH RECURSIVE $reachCteSql
         |SELECT node AS doc_id, CAST(min(r) AS BIGINT) AS component,
         |  count(DISTINCT r) AS comp_size
         |FROM reach GROUP BY node""".stripMargin) { (s, dir) =>
      dupComponents(s, dir)
    },

    // the dedup pipeline end-to-end: drop every non-keeper (component
    // member that isn't the min id), return the surviving corpus profile.
    QueryDef.checked(
      "q55_dedup_corpus",
      s"""WITH RECURSIVE $reachCteSql,
         |drops AS (SELECT node AS doc_id FROM reach GROUP BY node
         |          HAVING min(r) <> node)
         |SELECT lang, count(*) AS n_kept, CAST(sum(n_chars) AS BIGINT) AS kept_chars
         |FROM documents WHERE doc_id NOT IN (SELECT doc_id FROM drops)
         |GROUP BY lang""".stripMargin) { (s, dir) =>
      val comp = dupComponents(s, dir)
      val drops = comp.filter(col("component") =!= col("doc_id")).select(col("doc_id"))
      t(s, dir, "documents")
        .join(drops, Seq("doc_id"), "left_anti")
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_kept"), sum(col("n_chars")).as("kept_chars"))
    },

    // representative SELECTION POLICY over the same dup graph: instead of
    // q55's keep-min-id, keep the highest-QUALITY member of each duplicate
    // cluster (ties by doc_id — duplicates often share a quality score).
    // Reads the materialized component artifact; one bounded window over
    // cluster members. The oracle recomputes components via the recursive
    // CTE and replays the argmax, pinning the policy cross-engine.
    QueryDef.checked(
      "q95_dedup_keep_best",
      s"""WITH RECURSIVE $reachCteSql,
         |comp AS (SELECT node AS doc_id, min(r) AS component,
         |         count(DISTINCT r) AS comp_size FROM reach GROUP BY node),
         |q AS (SELECT doc_id, round(${DuckSql.quality}, 6) AS quality FROM documents),
         |j AS (SELECT comp.component, comp.comp_size, comp.doc_id, q.quality
         |      FROM comp JOIN q USING (doc_id)),
         |r AS (SELECT component, comp_size, doc_id, quality,
         |      row_number() OVER (PARTITION BY component
         |        ORDER BY quality DESC, doc_id) AS rn FROM j)
         |SELECT CAST(component AS BIGINT) AS component, doc_id AS keep_id,
         |  CAST(comp_size AS BIGINT) AS n_members, quality AS best_quality
         |FROM r WHERE rn = 1""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val comp = dupComponents(s, dir)
      val q = t(s, dir, "documents").select(col("doc_id"),
        round(TextFunctions.qualityScore(col("text")), 6).as("quality"))
      comp.join(q, Seq("doc_id"))
        .withColumn("rn", row_number().over(Window.partitionBy(col("component"))
          .orderBy(col("quality").desc, col("doc_id"))))
        .filter(col("rn") === 1)
        .select(col("component"), col("doc_id").as("keep_id"),
          col("comp_size").as("n_members"), col("quality").as("best_quality"))
    },

    // exact duplicated-SPAN detection (the ExactSubstr shape, Lee et al.
    // 2022): maximal verbatim runs of ≥40 chars shared between distinct
    // docs, found as consecutive matching 16-grams on one diagonal. The
    // oracle replays the dense gram join + island grouping verbatim —
    // exactness (not similarity) is what's being checked. The dense
    // self-join is the VERIFY tier, not the scale tier (its gram join
    // grows quadratically in boilerplate hot keys), so this query pins it
    // on a corpus SUBSET (doc_id % 3 = 0); q119 runs the scale path over
    // the FULL corpus against the same dense SQL.
    QueryDef.checked(
      "q97_dup_spans",
      denseSpanSql("WHERE doc_id % 3 = 0")) { (s, dir) =>
      SpanDedup.spans(t(s, dir, "documents").filter(col("doc_id") % 3 === 0),
        k = 16, minLen = 40)
    },

    // the 100 TB span-dedup path (winnow prefilter → restricted verify):
    // winnowed fingerprints (gram k=24, window w=17, one O(n) native
    // pass — functions/Winnow.scala) give candidate pairs, and the
    // diagonal-run verify runs only among those pairs
    // (SpanDedup.spansAmong, pair-keyed joins). The winnowing guarantee —
    // any shared run of ≥ w+k−1 = 40 chars shares a fingerprint — makes
    // the candidate set lossless for spans ≥ 40, so with minLen = 40 the
    // output EQUALS the dense self-join and the oracle is the dense SQL
    // itself: a hash match here proves the scale path drops nothing.
    // k=24 (not the q61 default of 8) because selectivity is the whole
    // game: on this template-heavy fixture 8-char grams yield 1.8k
    // distinct fps over 72k rows and a 16.9M-row pre-distinct pair
    // blowup; 24-char grams yield 138k distinct fps and 4.2k candidate
    // pairs. Cost is fingerprint density (2/(w+1) of positions) for
    // candidates plus candidate-pair grams for the verify, never the
    // corpus-wide gram self-join.
    QueryDef.checked(
      "q119_dup_spans_scaled",
      denseSpanSql("")) { (s, dir) =>
      import graft.functions.WinnowFingerprints
      val docs = t(s, dir, "documents")
      val fps = docs.select(col("doc_id"),
        explode(WinnowFingerprints.of(coalesce(col("text"), lit("")), k = 24, w = 17)).as("fp"))
      val pairs = fps.toDF("doc_a", "fp")
        .join(fps.toDF("doc_b", "fp2"),
          col("fp") === col("fp2") && col("doc_a") < col("doc_b"))
        .select("doc_a", "doc_b").distinct()
      SpanDedup.spansAmong(docs, pairs, k = 16, minLen = 40)
    },

    // edit-distance VERIFICATION of the near-dup pair graph: word-set
    // jaccard ignores ordering, so a pair can be set-identical yet
    // sequence-divergent — levenshtein over the (output-sized) pair list
    // quantifies that. Reads the materialized artifact; cost is per PAIR,
    // never per doc². Both engines implement classic unit-cost
    // levenshtein, so the oracle hash-matches the distances themselves.
    QueryDef.checked(
      "q100_edit_verified_pairs",
      s"""WITH $pairsCteSql,
         |pairs AS (
         |  ${pairsSelectSql("doc_a, doc_b")})
         |SELECT doc_a, doc_b,
         |  CAST(levenshtein(da.text, db.text) AS BIGINT) AS edit_dist,
         |  round(1.0 - levenshtein(da.text, db.text)
         |        / greatest(length(da.text), length(db.text)), 9) AS edit_sim
         |FROM pairs JOIN documents da ON da.doc_id = doc_a
         |           JOIN documents db ON db.doc_id = doc_b""".stripMargin) { (s, dir) =>
      val docs = t(s, dir, "documents")
      jaccardPairs(s, dir).select("doc_a", "doc_b")
        // the pair artifact is a handful of small files → a handful of
        // input splits; after the two BROADCAST joins the per-pair
        // levenshtein (O(len²) each) would run on those few tasks and
        // serialize the whole quadratic payload. One cheap shuffle of the
        // (doc_a, doc_b) ids spreads it across every core.
        .repartition(s.sparkContext.defaultParallelism)
        .join(docs.select(col("doc_id").as("doc_a"), col("text").as("ta")), Seq("doc_a"))
        .join(docs.select(col("doc_id").as("doc_b"), col("text").as("tb")), Seq("doc_b"))
        .select(col("doc_a"), col("doc_b"),
          // Myers bit-parallel levenshtein (functions/EditDistance.scala):
          // value-identical to the built-in (EditDistanceSpec fuzz) at
          // ~60× fewer word ops — this query was the suite's most
          // expensive step under the built-in DP (13.8 s -> see BENCH)
          graft.functions.EditDistance.of(col("ta"), col("tb")).cast("long").as("edit_dist"),
          round(lit(1.0) - graft.functions.EditDistance.of(col("ta"), col("tb")).cast("double") /
            greatest(length(col("ta")), length(col("tb"))).cast("double"), 9)
            .as("edit_sim"))
    },

    // SPLIT-LEAKAGE audit: near-duplicate pairs that straddle a
    // train/val/test boundary leak evaluation content into training —
    // the QA gate every split pipeline needs before shipping. Reads the
    // materialized pair-graph artifact and the deterministic md5 split
    // assignment (the q69 discipline), so the oracle replays BOTH the
    // pair derivation and every split decision; output is the cross-
    // split pair census a release would have to drive to zero (by
    // re-splitting on dedup COMPONENT instead of doc).
    QueryDef.checked(
      "q124_split_leakage",
      s"""WITH $pairsCteSql,
         |pairs AS (
         |  ${pairsSelectSql("doc_a, doc_b")}),
         |sp AS (SELECT doc_id,
         |  CASE WHEN substring(md5(CAST(doc_id AS VARCHAR) || 'split'), 1, 8)
         |         < 'cccccccc' THEN 'train'
         |       WHEN substring(md5(CAST(doc_id AS VARCHAR) || 'split'), 1, 8)
         |         < 'e6666666' THEN 'val'
         |       ELSE 'test' END AS split
         |  FROM documents)
         |SELECT sa.split AS split_a, sb.split AS split_b,
         |  count(*) AS n_leaked_pairs
         |FROM pairs JOIN sp sa ON sa.doc_id = doc_a
         |           JOIN sp sb ON sb.doc_id = doc_b
         |WHERE sa.split <> sb.split
         |GROUP BY 1, 2""".stripMargin) { (s, dir) =>
      val sp = graft.operators.Sampling.assignSplit(
        t(s, dir, "documents").select("doc_id"), col("doc_id"),
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      jaccardPairs(s, dir).select("doc_a", "doc_b")
        .join(sp.toDF("doc_a", "split_a"), Seq("doc_a"))
        .join(sp.toDF("doc_b", "split_b"), Seq("doc_b"))
        .filter(col("split_a") =!= col("split_b"))
        .groupBy(col("split_a"), col("split_b"))
        .agg(count(lit(1)).as("n_leaked_pairs"))
    },

    // the FIX for q124: split on the dedup COMPONENT, not the document —
    // every member of a duplicate cluster lands in the same split BY
    // CONSTRUCTION (the split key is the cluster's min-id label;
    // singletons key on their own id), so cross-split leakage is
    // structurally zero (spec-asserted against the pair graph). The
    // oracle recomputes components via the recursive CTE and replays the
    // same md5 split decisions on the component key.
    QueryDef.checked(
      "q125_component_split",
      s"""WITH RECURSIVE $reachCteSql,
         |comp AS (SELECT node AS doc_id, min(r) AS component FROM reach GROUP BY node),
         |k AS (SELECT d.doc_id, coalesce(comp.component, d.doc_id) AS gid
         |      FROM documents d LEFT JOIN comp ON comp.doc_id = d.doc_id),
         |sp AS (SELECT doc_id, gid,
         |  CASE WHEN substring(md5(CAST(gid AS VARCHAR) || 'split'), 1, 8)
         |         < 'cccccccc' THEN 'train'
         |       WHEN substring(md5(CAST(gid AS VARCHAR) || 'split'), 1, 8)
         |         < 'e6666666' THEN 'val'
         |       ELSE 'test' END AS split
         |  FROM k)
         |SELECT split, count(*) AS n_docs,
         |  CAST(count(DISTINCT gid) AS BIGINT) AS n_groups
         |FROM sp GROUP BY 1""".stripMargin) { (s, dir) =>
      val comp = dupComponents(s, dir).select(col("doc_id"), col("component"))
      val keyed = t(s, dir, "documents").select("doc_id")
        .join(comp, Seq("doc_id"), "left")
        .withColumn("gid", coalesce(col("component"), col("doc_id")))
      graft.operators.Sampling
        .assignSplit(keyed, col("gid"), Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
        .groupBy(col("split"))
        .agg(count(lit(1)).as("n_docs"), countDistinct(col("gid")).as("n_groups"))
    },

    // centrality over the dup-pair graph (PageRank): which member of each
    // duplicate cluster is the HUB the others orbit — the
    // popularity-weighted counterpart to q95's quality argmax. Reads the
    // same materialized pair-graph artifact as q33/q51/q55; ten rounds of
    // join+aggregate. Runs the EXACT fixed-point form (BIGINT ranks,
    // truncating division, damping as 17/20 — PageRank.runExact), so a
    // fixed-iteration replay agrees bit-exactly and the oracle HASHES the
    // ranks themselves: ten chained CTEs, one join+groupBy each, no
    // recursion needed because the iteration count is fixed. No float
    // leaves the engine (the q36/q173 decision-output discipline taken to
    // its limit — the score IS an integer); DedupSimilaritySpec pins the
    // fixed-point ranks against the float form at 1e-6.
    QueryDef.checked("q117_dup_pagerank", pagerankSql(10)) { (s, dir) =>
      graft.operators.PageRank.runExact(
        jaccardPairs(s, dir).select("doc_a", "doc_b"))
    },

    // SOFT dedup (dedup-aware loss weighting): instead of dropping
    // duplicates outright (q55) or arg-maxing a keeper (q95), keep every
    // member but down-weight it by 1/cluster_size — each duplicate
    // CLUSTER contributes one document's worth of training mass, the
    // repetition-damping alternative when provenance diversity matters.
    // Reads the same materialized component artifact; weights are
    // integer parts-per-billion (round(1e9/size)) so the per-language
    // effective-dataset-size sums are exact cross-engine. The oracle
    // recomputes components via the recursive CTE and replays every
    // weight.
    QueryDef.checked(
      "q174_soft_dedup_weights",
      s"""WITH RECURSIVE $reachCteSql,
         |comp AS (SELECT node AS doc_id, count(DISTINCT r) AS comp_size
         |         FROM reach GROUP BY node),
         |w AS (SELECT d.doc_id, d.lang,
         |        coalesce(comp.comp_size, 1) AS sz
         |      FROM documents d LEFT JOIN comp ON comp.doc_id = d.doc_id)
         |SELECT lang, count(*) AS n_docs,
         |  CAST(sum(CASE WHEN sz > 1 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_downweighted,
         |  CAST(sum(CAST(round(1e9 / sz) AS BIGINT)) AS BIGINT) AS weight_ppb
         |FROM w GROUP BY lang""".stripMargin) { (s, dir) =>
      val comp = dupComponents(s, dir).select(col("doc_id"), col("comp_size"))
      t(s, dir, "documents").select("doc_id", "lang")
        .join(comp, Seq("doc_id"), "left")
        .withColumn("sz", coalesce(col("comp_size"), lit(1L)))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("sz") > 1, 1L).otherwise(0L)).as("n_downweighted"),
          sum(round(lit(1e9) / col("sz")).cast("long")).as("weight_ppb"))
    }
  )
}
