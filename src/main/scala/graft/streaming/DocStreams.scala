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
}
