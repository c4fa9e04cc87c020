package graft.queries

import graft.{QueryDef, Tables}
import graft.functions.TextFunctions
import graft.operators.{DedupComponents, MinHashDedup, SimHashDedup}
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

  /** One materialized pair graph per (session, dir, threshold): q33 emits
    * the pairs, q51 runs components over the SAME graph, q55 drops
    * non-keepers from the SAME graph — without this, each of the three
    * recomputes the whole explode→index→join→verify pipeline from the raw
    * corpus (3× the most expensive relation in the engine). The cached
    * frame is `localCheckpoint`ed, so reuse costs a block read, not a
    * recompute; [[graft.SessionCache]] scopes entries to the live
    * application (test suites cycle sessions). At cluster scale the same
    * role is played by writing the pair graph to a scratch table once per
    * corpus version.
    */
  private val pairsCache = new graft.SessionCache[DataFrame]

  private def jaccardPairs(s: SparkSession, dir: String,
      threshold: Double = 0.8): DataFrame =
    pairsCache.getOrCompute(s, s"$dir|$threshold")(computeJaccardPairs(s, dir, threshold))

  /** (lang, source)-blocked word-set jaccard pairs ≥ `threshold` — shared
    * by q33 (pair output) and q51/q55 (component input).
    *
    * Candidate generation uses PREFIX FILTERING (the AllPairs/PPJoin
    * principle, Bayardo et al. WWW'07): order each doc's tokens rarest-
    * first by block document frequency; if jac(x, y) ≥ t, the first
    * |x| - ⌈t·|x|⌉ + 1 tokens of x and of y must share at least one token,
    * so indexing ONLY that prefix (~20% of tokens at t = 0.8, and the
    * rarest 20% at that) keeps full recall GUARANTEED while removing
    * high-df tokens from the inverted index entirely — a raw token index
    * explodes |block|²-style on stopword-frequency tokens at corpus scale.
    * Verification computes exact jaccard from the full token sets, so the
    * output is identical to the naive all-token join.
    *
    * Plan shape: the token relation `dw` (explode + distinct — the
    * dominant cost) is materialized ONCE via `localCheckpoint` and feeds
    * every downstream subtree; the doc-size count rides the same
    * window pass as the prefix rank (no separate groupBy+join); the
    * prefix self-join and the two verification joins then reuse their
    * identical child exchanges. Without the checkpoint the four subtrees
    * shuffle `dw` on four different keys and Catalyst recomputes the
    * explode+distinct for each.
    */
  private def computeJaccardPairs(s: SparkSession, dir: String,
      threshold: Double): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dw = t(s, dir, "documents")
      .select(col("doc_id"), col("lang"), col("source"),
        explode(split(col("text"), " ")).as("w"))
      .distinct()
      .localCheckpoint()
    val tokDf = dw.groupBy("lang", "source", "w").agg(count(lit(1)).as("df"))
    // rarest-first global order within each block; (df, w) is a total,
    // deterministic order shared by all docs of the block. The doc size n
    // shares the same doc_id partitioning (one shuffle, one sort).
    val wdoc = Window.partitionBy("doc_id")
    val ranked = dw.join(tokDf, Seq("lang", "source", "w"))
      .withColumn("rank", row_number().over(wdoc.orderBy(col("df"), col("w"))))
      .withColumn("n", count(lit(1)).over(wdoc))
    // the 1e-9 guard keeps fp noise (0.8*5 = 4.000…001 → ceil 5) from
    // rounding ⌈t·n⌉ UP at exact-integer boundaries — that would shorten
    // the prefix and silently break the recall guarantee; erring the other
    // way only lengthens the prefix by one token
    val prefix = ranked
      .filter(col("rank") <= col("n") - ceil(lit(threshold) * col("n") - lit(1e-9)) + 1)
      .select("doc_id", "lang", "source", "w")
    val cands = prefix.as("a").join(prefix.as("b"),
        col("a.w") === col("b.w") && col("a.lang") === col("b.lang") &&
          col("a.source") === col("b.source") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    // exact verification over full token sets (sets are distinct by
    // construction, so array_intersect size IS the intersection count)
    val toks = dw.groupBy("doc_id").agg(collect_set(col("w")).as("toks"))
    cands
      .join(toks.select(col("doc_id").as("doc_a"), col("toks").as("ta")), Seq("doc_a"))
      .join(toks.select(col("doc_id").as("doc_b"), col("toks").as("tb")), Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        size(array_intersect(col("ta"), col("tb"))).cast("long").as("inter"),
        size(col("ta")).cast("long").as("na"), size(col("tb")).cast("long").as("nb"))
      .select(col("doc_a"), col("doc_b"),
        (col("inter").cast("double") / (col("na") + col("nb") - col("inter"))).as("jac"))
      .filter(col("jac") >= threshold)
      .localCheckpoint()
  }

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

  private def pairsSelectSql(cols: String) =
    s"""SELECT $cols
       |FROM p JOIN sz sa ON sa.doc_id = doc_a JOIN sz sb ON sb.doc_id = doc_b
       |WHERE CAST(inter AS DOUBLE) / (sa.n + sb.n - inter) >= 0.8""".stripMargin

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

    // word-SET jaccard pairs, blocked by (lang, source) — the inverted-
    // index join shape that scales with true collisions, not |docs|².
    QueryDef.checked(
      "q33_jaccard_pairs",
      s"""WITH $pairsCteSql
         |${pairsSelectSql(
        "doc_a, doc_b, CAST(inter AS DOUBLE) / (sa.n + sb.n - inter) AS jac")}""".stripMargin) { (s, dir) =>
      jaccardPairs(s, dir)
    },

    // MinHash-LSH near-dup with exact verification — matches the exact
    // shingle-jaccard oracle because band recall at j≥0.5 is ~0.9999
    // (64 hashes, 32 bands × 2 rows) and the fixture has no pairs in
    // (0.3, 0.5) to sit on the boundary.
    QueryDef.checked(
      "q34_minhash_pairs",
      """WITH docs AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
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
        |WHERE CAST(inter AS DOUBLE) / (sa.n + sb.n - inter) >= 0.5""".stripMargin) { (s, dir) =>
      MinHashDedup.verifiedPairs(t(s, dir, "documents"), "doc_id", "text")
    },

    // SimHash near-dup (rows-only: xxhash64 has no DuckDB equivalent;
    // cross-checked against MinHash in DedupSpec instead).
    QueryDef.rowsOnly("q35_simhash_pairs") { (s, dir) =>
      SimHashDedup.pairs(t(s, dir, "documents"), "doc_id", "text")
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
      DedupComponents.components(jaccardPairs(s, dir))
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
      val comp = DedupComponents.components(jaccardPairs(s, dir))
      val drops = comp.filter(col("component") =!= col("doc_id")).select(col("doc_id"))
      t(s, dir, "documents")
        .join(drops, Seq("doc_id"), "left_anti")
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_kept"), sum(col("n_chars")).as("kept_chars"))
    }
  )
}
