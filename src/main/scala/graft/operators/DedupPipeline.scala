package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The corpus-dedup pipeline as a MATERIALIZED artifact: the verified
  * jaccard pair graph and its connected components, written ONCE per
  * corpus version to a scratch directory and read by every consumer
  * (pair listing, cluster dedup, corpus filtering — q33/q51/q55 and
  * users alike).
  *
  * Why an artifact and not a cache: the pair graph is the most expensive
  * relation in the engine (explode → inverted index → verify), and its
  * three consumers would otherwise recompute it per query — a session
  * memo fixes one JVM, but at cluster scale the graph must survive the
  * session and be shared across jobs. The artifact carries a corpus
  * FINGERPRINT (count + XOR of row hashes, written LAST as the commit
  * marker), so a corpus rewritten in place rebuilds instead of reusing a
  * stale graph, and a materialize that crashed mid-write is rebuilt, not
  * trusted.
  *
  * Layout under `scratchDir`:
  *   pairs/        (doc_a, doc_b, jac)  — verified pairs ≥ threshold
  *   components/   (doc_id, component, comp_size)
  *   _fingerprint  "count,xorOfRowHashes,threshold"
  */
object DedupPipeline {

  /** (lang, source)-blocked word-set jaccard pairs ≥ `threshold` — the
    * pure pipeline (no materialization).
    *
    * Candidate generation uses PREFIX FILTERING (the AllPairs/PPJoin
    * principle, Bayardo et al. WWW'07): order each doc's tokens rarest-
    * first by block document frequency; if jac(x, y) ≥ t, the first
    * |x| - ⌈t·|x|⌉ + 1 tokens of x and of y must share at least one
    * token, so indexing ONLY that prefix (~20% of tokens at t = 0.8, and
    * the rarest 20% at that) keeps full recall GUARANTEED while removing
    * high-df tokens from the inverted index entirely — a raw token index
    * explodes |block|²-style on stopword-frequency tokens at corpus
    * scale. Verification computes exact jaccard from the full token sets,
    * so the output is identical to the naive all-token join.
    *
    * Plan shape: the token relation `dw` (explode + distinct — the
    * dominant cost) is materialized ONCE via `localCheckpoint` and feeds
    * every downstream subtree; the doc-size count rides the same window
    * pass as the prefix rank (no separate groupBy+join); the prefix
    * self-join and the two verification joins then reuse their identical
    * child exchanges. Without the checkpoint the four subtrees shuffle
    * `dw` on four different keys and Catalyst recomputes the
    * explode+distinct for each.
    */
  def jaccardPairs(docs: DataFrame, threshold: Double,
      idCol: String = "doc_id", textCol: String = "text",
      blockCols: Seq[String] = Seq("lang", "source")): DataFrame = {
    val (dw, prefix) = tokensAndPrefix(docs, threshold, idCol, textCol, blockCols, None)
    val candConds = ((col("a.w") === col("b.w")) +:
      blockCols.map(c => col(s"a.$c") === col(s"b.$c"))) :+
      (col("a.doc_id") < col("b.doc_id"))
    val cands = prefix.as("a").join(prefix.as("b"), candConds.reduce(_ && _))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    verifyPairs(cands, dw, threshold)
  }

  /** Incremental form: verified pairs INVOLVING at least one row matching
    * `isFresh` (a predicate over `docs`' columns, e.g. an ingest-date or
    * id-watermark test) — the daily-ingest shape. The prefix index join
    * puts the WHOLE corpus on one side but only fresh prefixes on the
    * other, so candidate volume is |all|×|fresh| per token bucket instead
    * of |all|², and the already-verified old×old pair graph is never
    * recomputed (union the result with the existing artifact downstream).
    * Token document frequencies come from the full (old ∪ fresh) corpus —
    * one linear pass, which exact prefix filtering needs anyway — so
    * output pairs are EXACTLY the full recompute's fresh-involving subset.
    */
  def incrementalPairs(docs: DataFrame, isFresh: Column, threshold: Double,
      idCol: String = "doc_id", textCol: String = "text",
      blockCols: Seq[String] = Seq("lang", "source")): DataFrame = {
    val (dw, prefix) =
      tokensAndPrefix(docs, threshold, idCol, textCol, blockCols, Some(isFresh))
    val candConds = ((col("a.w") === col("b.w")) +:
      blockCols.map(c => col(s"a.$c") === col(s"b.$c"))) :+
      (col("a.doc_id") =!= col("b.doc_id"))
    val cands = prefix.as("a")
      .join(prefix.filter(col("__fresh")).as("b"), candConds.reduce(_ && _))
      .select(least(col("a.doc_id"), col("b.doc_id")).as("doc_a"),
        greatest(col("a.doc_id"), col("b.doc_id")).as("doc_b"))
      .distinct()
    verifyPairs(cands, dw, threshold)
  }

  /** Shared front of the pipeline: the distinct token relation `dw`
    * (localCheckpointed — four downstream subtrees) and the prefix-
    * filtered index, optionally carrying a `__fresh` flag evaluated
    * against the ORIGINAL doc row.
    */
  private def tokensAndPrefix(docs: DataFrame, threshold: Double,
      idCol: String, textCol: String, blockCols: Seq[String],
      fresh: Option[Column]): (DataFrame, DataFrame) = {
    import org.apache.spark.sql.expressions.Window
    val bc = blockCols.map(col)
    val freshCols = fresh.map(_.as("__fresh")).toSeq
    val dw = docs
      .select((col(idCol).as("doc_id") +: bc) ++ freshCols :+
        explode(split(col(textCol), " ")).as("w"): _*)
      .distinct()
      .localCheckpoint()
    val tokDf = dw.groupBy(blockCols.map(col) :+ col("w"): _*).agg(count(lit(1)).as("df"))
    // rarest-first global order within each block; (df, w) is a total,
    // deterministic order shared by all docs of the block. The doc size n
    // shares the same doc_id partitioning (one shuffle, one sort).
    val wdoc = Window.partitionBy("doc_id")
    val ranked = dw.join(tokDf, blockCols :+ "w")
      .withColumn("rank", row_number().over(wdoc.orderBy(col("df"), col("w"))))
      .withColumn("n", count(lit(1)).over(wdoc))
    // the 1e-9 guard keeps fp noise (0.8*5 = 4.000…001 → ceil 5) from
    // rounding ⌈t·n⌉ UP at exact-integer boundaries — that would shorten
    // the prefix and silently break the recall guarantee; erring the other
    // way only lengthens the prefix by one token
    val prefix = ranked
      .filter(col("rank") <= col("n") - ceil(lit(threshold) * col("n") - lit(1e-9)) + 1)
      .select((col("doc_id") +: bc) ++ fresh.map(_ => col("__fresh")).toSeq :+ col("w"): _*)
    (dw, prefix)
  }

  /** Exact verification over full token sets (sets are distinct by
    * construction, so array_intersect size IS the intersection count).
    */
  private def verifyPairs(cands: DataFrame, dw: DataFrame,
      threshold: Double): DataFrame = {
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
  }

  /** Corpus identity: (row count, XOR of xxhash64(id, text)) — one
    * column-pruned pass, order-independent, ANSI-overflow-free.
    */
  private def fingerprint(docs: DataFrame, idCol: String, textCol: String): (Long, Long) = {
    val r = docs.agg(count(lit(1)), bit_xor(xxhash64(col(idCol), col(textCol)))).head()
    (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
  }

  private def fpStamp(fp: (Long, Long), threshold: Double) = s"${fp._1},${fp._2},$threshold"

  /** Build pairs + components under `scratchDir` unless an artifact for
    * this exact corpus version (and threshold) is already there. Returns
    * true when it (re)built. Components are derived FROM the written
    * pairs, so both artifacts share one lineage; the fingerprint is
    * written last as the commit marker.
    *
    * `version`: the artifact stamp. `None` (default) derives it from
    * corpus CONTENT — right for un-versioned corpora, but the hash reads
    * every text byte, i.e. one full corpus scan per staleness check. A
    * 100 TB pipeline versions its corpora explicitly (snapshot/partition
    * ids); passing `Some(id)` stamps with that id and costs ZERO scans —
    * the caller owns the promise that a given id never changes content.
    */
  // concurrent consumers (q33/q51/q55 run 4-way parallel under Verify)
  // must not both decide to build and overwrite the same artifact
  // mid-read — one JVM-level lock per scratch dir serializes them; the
  // first builder wins, the rest see its fingerprint and read
  private val buildLocks = new java.util.concurrent.ConcurrentHashMap[String, Object]()

  def materialize(spark: SparkSession, docs: DataFrame, scratchDir: String,
      threshold: Double = 0.8,
      idCol: String = "doc_id", textCol: String = "text",
      version: Option[String] = None): Boolean =
    buildLocks.computeIfAbsent(scratchDir, _ => new Object).synchronized {
      materializeLocked(spark, docs, scratchDir, threshold, idCol, textCol, version)
    }

  private def materializeLocked(spark: SparkSession, docs: DataFrame, scratchDir: String,
      threshold: Double,
      idCol: String, textCol: String, version: Option[String]): Boolean = {
    val root = new Path(scratchDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val fpFile = new Path(root, "_fingerprint")
    val stamp = version.map(v => s"v:$v,$threshold")
      .getOrElse(fpStamp(fingerprint(docs, idCol, textCol), threshold))
    val current =
      if (!fs.exists(fpFile)) None
      else {
        val in = fs.open(fpFile)
        try Some(scala.io.Source.fromInputStream(in, "UTF-8").mkString) finally in.close()
      }
    if (current.contains(stamp)) false
    else {
      if (fs.exists(fpFile)) fs.delete(fpFile, false) // invalidate before rewrite
      jaccardPairs(docs, threshold, idCol, textCol)
        .write.mode("overwrite").parquet(s"$scratchDir/pairs")
      DedupComponents.components(spark.read.parquet(s"$scratchDir/pairs"))
        .write.mode("overwrite").parquet(s"$scratchDir/components")
      val out = fs.create(fpFile, true)
      try out.write(stamp.getBytes("UTF-8")) finally out.close()
      true
    }
  }

  /** The verified pair graph for this corpus version (materializing if
    * needed): (doc_a, doc_b, jac).
    */
  def pairs(spark: SparkSession, docs: DataFrame, scratchDir: String,
      threshold: Double = 0.8,
      idCol: String = "doc_id", textCol: String = "text",
      version: Option[String] = None): DataFrame = {
    materialize(spark, docs, scratchDir, threshold, idCol, textCol, version)
    spark.read.parquet(s"$scratchDir/pairs")
  }

  /** Connected components of the pair graph for this corpus version
    * (materializing if needed): (doc_id, component, comp_size).
    */
  def components(spark: SparkSession, docs: DataFrame, scratchDir: String,
      threshold: Double = 0.8,
      idCol: String = "doc_id", textCol: String = "text",
      version: Option[String] = None): DataFrame = {
    materialize(spark, docs, scratchDir, threshold, idCol, textCol, version)
    spark.read.parquet(s"$scratchDir/components")
  }
}
