package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.functions.{size => arraySize}

/** Overlapping-window document chunking — the long-document splitting
  * stage of a training/RAG pipeline (a doc longer than the context
  * window becomes sliding chunks of `size` tokens every `stride`
  * tokens, consecutive chunks sharing `size − stride` tokens of
  * context). The complement of [[Packing]]: packing concatenates SHORT
  * docs up to the window, chunking splits LONG docs down to it.
  *
  * One explode per document — windows are generated from a token-count
  * `sequence`, so cost is linear in emitted chunks, there is no shuffle
  * at all (fully map-side), and the whole derivation (whitespace
  * tokens, start positions, window slices) mirrors exactly in ANSI SQL
  * (q123 hash-matches the chunk text itself via md5).
  *
  * Reference analogue: `HDFSMerge`'s size-targeted file re-chunking
  * (HDFSMerge.java:174-189) lifted to token granularity.
  */
object Chunker {

  /** (idCol, chunk_idx, n_tokens, chunk_text): sliding windows of
    * `size` tokens every `stride` over the whitespace tokens of
    * `textCol`. The final window may be shorter (the tail) but is never
    * redundant — starts stop at `n − size + stride`, so a window whose
    * predecessor already reached the last token is not emitted. A
    * document of ≤ `size` tokens yields exactly one chunk; docs with no
    * tokens (NULL/empty/whitespace-only) yield none. `chunk_idx` is
    * 0-based in token order.
    */
  def slidingChunks(docs: DataFrame, size: Int, stride: Int,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(size >= 1, s"chunk size must be >= 1, got $size")
    require(stride >= 1 && stride <= size,
      s"stride must be in [1, size]: overlapping forward windows, got $stride/$size")
    val words = split(trim(col(textCol)), TextFunctions.WS + "+")
    docs
      .filter(length(trim(col(textCol))) > 0)
      .select(col(idCol), words.as("ws"))
      // window starts: 1, 1+stride, … up to n − size + stride (clamped
      // to [1, n]) — the last start whose window adds tokens the
      // previous one didn't already cover
      .select(col(idCol), col("ws"),
        posexplode(sequence(lit(1),
          greatest(least(arraySize(col("ws")),
            arraySize(col("ws")) - size + stride), lit(1)),
          lit(stride))))
      .select(col(idCol), col("pos").cast("long").as("chunk_idx"),
        slice(col("ws"), col("col"), lit(size)).as("chunk"))
      .select(col(idCol), col("chunk_idx"),
        arraySize(col("chunk")).cast("long").as("n_tokens"),
        array_join(col("chunk"), " ").as("chunk_text"))
  }
}
