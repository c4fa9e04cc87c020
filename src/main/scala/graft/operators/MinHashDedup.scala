package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** MinHash + LSH near-duplicate detection over text — the scale path for
  * fuzzy dedup (SURVEY.md §2.6 extension tier; technique per the public
  * MinHash/LSH literature, PAPERS.md).
  *
  * Pipeline (all distributed, no driver data path):
  *   shingle → 64 minhashes (one groupBy) → band keys → self-join on
  *   (band, key) for candidates → exact-jaccard verification of candidates.
  *
  * Default 64 hashes in 32 bands × 2 rows: P(candidate | j) = 1-(1-j²)³²,
  * ≈ 0.9999 at j = 0.5 — effectively full recall at the 0.5 threshold —
  * while keeping the candidate join tiny (band join cost scales with true
  * collisions, not |docs|²). At 100 TB this is the only shape that works:
  * the all-pairs exact join is quadratic; this is linear + output-sized.
  */
object MinHashDedup {

  final case class Params(
      numHashes: Int = 64,
      bands: Int = 32,
      shingleSize: Int = 3,
      threshold: Double = 0.5) {
    require(numHashes % bands == 0, "bands must divide numHashes")
  }

  /** Distinct word n-gram shingles per document: (doc_id, shingle).
    * Documents shorter than `n` tokens contribute their whole text.
    */
  def shingles(docs: DataFrame, idCol: String, textCol: String, n: Int): DataFrame =
    docs.select(col(idCol).as("doc_id"), split(col(textCol), " ").as("toks"))
      .select(col("doc_id"), explode(
        when(size(col("toks")) >= n,
          expr(s"transform(sequence(0, size(toks) - $n), i -> concat_ws(' ', slice(toks, i + 1, $n)))"))
          .otherwise(array(concat_ws(" ", col("toks"))))).as("shingle"))
      .distinct()

  /** MinHash signature per doc: element i = min over shingles of
    * xxhash64(shingle, i). One shuffle (the groupBy).
    */
  def signatures(sh: DataFrame, numHashes: Int): DataFrame = {
    val mins = (0 until numHashes).map(i => min(xxhash64(col("shingle"), lit(i))))
    sh.groupBy("doc_id").agg(array(mins: _*).as("sig"))
  }

  /** Candidate pairs: docs sharing any LSH band key. */
  def candidatePairs(sigs: DataFrame, numHashes: Int, bands: Int): DataFrame = {
    val rows = numHashes / bands
    val b = sigs.select(col("doc_id"), posexplode(expr(
        s"transform(sequence(0, $bands - 1), b -> xxhash64(slice(sig, b * $rows + 1, $rows)))")))
      .toDF("doc_id", "band", "bh")
    b.as("l").join(b.as("r"),
        col("l.band") === col("r.band") && col("l.bh") === col("r.bh") &&
          col("l.doc_id") < col("r.doc_id"))
      .select(col("l.doc_id").as("doc_a"), col("r.doc_id").as("doc_b"))
      .distinct()
  }

  /** End to end: candidates verified by exact shingle jaccard ≥ threshold.
    * Output: (doc_a, doc_b, jac).
    */
  def verifiedPairs(docs: DataFrame, idCol: String, textCol: String,
      p: Params = Params()): DataFrame = {
    // NOTE: the shingle relation feeds four branches; do NOT .cache() it —
    // measured 3× slower at sf0.1. Catalyst's ReuseExchange already
    // deduplicates the identical shuffle subtrees, and explicit caching
    // forces an eager materialization barrier that blocks AQE.
    val sh = shingles(docs, idCol, textCol, p.shingleSize)
    val cand = candidatePairs(signatures(sh, p.numHashes), p.numHashes, p.bands)
    val sz = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val inter = cand
      .join(sh.as("sa"), col("doc_a") === col("sa.doc_id"))
      .join(sh.as("sb"), col("doc_b") === col("sb.doc_id") &&
        col("sa.shingle") === col("sb.shingle"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("inter"))
    inter
      .join(sz.as("za"), col("doc_a") === col("za.doc_id"))
      .join(sz.as("zb"), col("doc_b") === col("zb.doc_id"))
      .select(col("doc_a"), col("doc_b"),
        (col("inter").cast("double") /
          (col("za.n") + col("zb.n") - col("inter"))).as("jac"))
      .filter(col("jac") >= p.threshold)
  }

  /** Per-doc dedup STATE row `(doc_id, sig, shset)`: minhash signature +
    * distinct shingle set — what an accumulating corpus table stores so
    * incremental passes ([[pairsAmongPrepared]]) never re-tokenize old
    * documents. Shingle sets are exact verification state; a deployment
    * that can tolerate signature-estimated jaccard can drop `shset` for
    * ~8 bytes × numHashes per doc.
    */
  def prepared(docs: DataFrame, idCol: String, textCol: String,
      p: Params = Params()): DataFrame = {
    val sh = shingles(docs, idCol, textCol, p.shingleSize)
    signatures(sh, p.numHashes)
      .join(sh.groupBy("doc_id").agg(collect_set(col("shingle")).as("shset")), "doc_id")
  }

  /** Verified pairs INVOLVING at least one `fresh` doc, over [[prepared]]
    * state rows: LSH band keys of ALL docs equi-join band keys of FRESH
    * docs only (candidate volume |all|×|fresh| per colliding bucket,
    * never |all|²), then exact jaccard from the STORED shingle sets. The
    * incremental form of [[verifiedPairs]]: old×old pairs are never
    * recomputed, old docs are never re-tokenized — the daily-ingest /
    * streaming-batch shape. `fresh` must be a subset of `all` (same
    * state rows).
    */
  /** LSH band rows `(doc_id, band, bh)` over [[prepared]]/[[signatures]]
    * state rows: one row per (doc, band), `bh` = xxhash64 of the band's
    * signature slice — the equi-join key material of every banded probe.
    * Narrow (projection + posexplode, no shuffle); an ACCUMULATING state
    * table stores these rows once per doc so incremental probes never
    * recompute them ([[graft.streaming.DocStreams.incrementalNearDup]]
    * keeps them key-clustered on a digest bucket for the
    * storage-partitioned probe).
    */
  def bandRows(state: DataFrame, p: Params = Params()): DataFrame = {
    val rows = p.numHashes / p.bands
    state.select(col("doc_id"), posexplode(expr(
        s"transform(sequence(0, ${p.bands} - 1), b -> xxhash64(slice(sig, b * $rows + 1, $rows)))")))
      .toDF("doc_id", "band", "bh")
  }

  def pairsAmongPrepared(all: DataFrame, fresh: DataFrame,
      p: Params = Params()): DataFrame = {
    def bandRows(df: DataFrame) = MinHashDedup.bandRows(df, p)
    val cands = bandRows(all).as("l").join(bandRows(fresh).as("r"),
        col("l.band") === col("r.band") && col("l.bh") === col("r.bh") &&
          col("l.doc_id") =!= col("r.doc_id"))
      .select(least(col("l.doc_id"), col("r.doc_id")).as("doc_a"),
        greatest(col("l.doc_id"), col("r.doc_id")).as("doc_b"))
      .distinct()
    cands
      .join(all.select(col("doc_id").as("doc_a"), col("shset").as("sa")), Seq("doc_a"))
      .join(all.select(col("doc_id").as("doc_b"), col("shset").as("sb")), Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        (size(array_intersect(col("sa"), col("sb"))).cast("double") /
          size(array_union(col("sa"), col("sb"))).cast("double")).as("jac"))
      .filter(col("jac") >= p.threshold)
  }
}
