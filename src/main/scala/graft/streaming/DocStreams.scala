package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Structured Streaming over the `documents` corpus: continuous-ingest
  * forms of the batch curation tier, for pipelines where documents land
  * incrementally (a crawler drop directory) rather than as corpus
  * snapshots. Batch and stream share expressions, so the batch oracles
  * pin the semantics (q120 runs the stream form itself under the DuckDB
  * oracle, the q46 pattern).
  */
object DocStreams {

  /** Streaming read of a documents parquet path. The schema comes from a
    * one-footer driver read of an existing file (streaming file sources
    * need an explicit schema).
    */
  def readDocuments(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.readStream.schema(schema).parquet(path)

  /** Streaming EXACT corpus dedup by content hash: the first-arriving
    * copy of each distinct text survives, every later copy — same batch
    * or any later micro-batch — is dropped by the state store. This is
    * the batch q32 exact-dedup as a continuous operator: a crawler feed
    * dedups against everything already ingested without re-scanning the
    * corpus, because the seen-hash set IS the streaming state (checkpoint
    * it and the guarantee survives restarts).
    *
    * Emits only content-determined columns (hash + length): every member
    * of a duplicate group agrees on them, so the output is deterministic
    * regardless of arrival order — which batch form an external oracle
    * can replay exactly (`SELECT DISTINCT md5(text), length(text)`).
    * Callers that want a full surviving row join the hash back to the
    * corpus and pick a representative by policy (the q95 selection
    * layer); the hash, not the row choice, is the dedup decision.
    *
    * State is one (hash, no-value) entry per DISTINCT document — bounded
    * by corpus cardinality, not stream length. For unbounded horizons use
    * `withWatermark` upstream + `dropDuplicatesWithinWatermark` (the
    * [[EventStreams.dedupEvents]] shape) to expire state.
    */
  def contentDedup(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs
      .filter(col(textCol).isNotNull)
      .select(md5(col(textCol)).as("content_hash"),
        length(col(textCol)).cast("long").as("n_chars"))
      .dropDuplicates("content_hash")

  /** Streaming incremental NEAR-dup dedup — the continuous-ingest form of
    * the MinHash pipeline: each micro-batch is compared against
    * everything already ingested (and itself) and every verified pair it
    * completes is appended; the accumulated pair set after the stream
    * drains EQUALS the batch recompute over the full corpus (each pair
    * is found exactly once, when its later member arrives — q176 pins
    * that equality under the q34 oracle).
    *
    * State is two snapshot tables: `seenRoot` accumulates per-doc
    * [[graft.operators.MinHashDedup.prepared]] rows (signature + shingle
    * set — old docs are never re-tokenized), `pairsRoot` accumulates the
    * verified pairs. Both publishes carry the micro-batch id, so a
    * restart that re-delivers the in-flight batch appends NOTHING twice;
    * the already-seen anti-join makes the computation itself
    * replay-idempotent regardless of which of the two publishes a crash
    * interleaved. Per-batch cost: |batch| tokenization + an LSH band
    * equi-join of all×fresh — at 100 TB, cluster `seenRoot` on a band
    * digest so the probe joins storage-partitioned instead of shuffling
    * the corpus state per batch.
    *
    * Use as the `foreachBatch` body:
    * {{{
    * stream.writeStream.foreachBatch(
    *   DocStreams.incrementalNearDup(seenRoot, pairsRoot) _).start()
    * }}}
    */
  def incrementalNearDup(seenRoot: String, pairsRoot: String,
      p: graft.operators.MinHashDedup.Params = graft.operators.MinHashDedup.Params(),
      idCol: String = "doc_id", textCol: String = "text")(
      batch: DataFrame, batchId: Long): Unit = {
    import graft.operators.{MinHashDedup, Snapshots}
    val b = org.apache.spark.sql.graftbridge.SessionBridge.rebatch(batch)
    val spark = b.sparkSession
    val prep = MinHashDedup.prepared(b, idCol, textCol, p)
    // drop any batch doc already in seen (a crash after the seen publish
    // re-delivers the batch; without this the union would double its rows
    // and every verification join would emit duplicate pairs)
    val seen =
      if (Snapshots.versions(spark, seenRoot).isEmpty) prep.limit(0)
      else Snapshots.read(spark, seenRoot).join(prep, Seq("doc_id"), "left_anti")
    val all = seen.unionByName(prep)
    val pairs = MinHashDedup.pairsAmongPrepared(all, prep, p)
      .select(col("doc_a"), col("doc_b"), col("jac"))
    // pairs FIRST: replay after a crash between the two publishes skips
    // the committed pairs version and lets seen catch up
    Snapshots.publishStreamBatch(spark, pairsRoot, pairs, batchId)
    Snapshots.publishStreamBatch(spark, seenRoot, prep, batchId)
  }
}
