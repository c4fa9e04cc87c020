package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import scala.collection.mutable

/** Exact heavy hitters at scale: a Misra–Gries candidate pass followed by
  * a candidate-restricted exact re-count, with a certificate that the
  * result IS the exact top-k (the frequent-tokens / hot-keys profile a
  * corpus pipeline runs before vocabulary or skew decisions).
  *
  * Why not plain `groupBy(token).count().orderBy(...).limit(k)`? At
  * 100 TB the token column has billions of distinct values — the full
  * group-by shuffles the entire key space to build counts that are then
  * thrown away. Here:
  *
  *   1. each partition streams once through a bounded Misra–Gries summary
  *      (m counters, O(1) amortized per row — decrement-alls are paid for
  *      by prior increments), emitting ONE row: (≤ m candidate tokens,
  *      rows seen, summary-overflowed flag). Driver cost is
  *      numPartitions rows — never the key space;
  *   2. the candidates are broadcast back and counted EXACTLY in one
  *      filtered aggregate — the shuffle carries only candidate keys;
  *   3. the MG guarantee — any x with freq(x) > n/(m+1) survives in at
  *      least one partition's summary (averaging: some partition has
  *      freq_p(x) > n_p/(m+1)) — yields a certificate: if the k-th
  *      candidate's exact count exceeds n/(m+1), no non-candidate can
  *      outrank it, so the top-k of the candidates is the global top-k.
  *      If NO partition ever evicted, the candidates are simply all
  *      distinct tokens and the answer is exact unconditionally.
  *
  * The operator REFUSES to return an uncertified answer (raise m or the
  * guarantee is vacuous) — a silent best-effort top-k is how skew
  * decisions go wrong. The candidate pass carries counts as data rows
  * (not accumulators), so task retries can't distort the certificate.
  *
  * CONTRACT: the input must be DETERMINISTIC across the two passes —
  * the candidate pass and the exact re-count each scan `tokens` once,
  * and the certificate relates pass-1's n/candidates to pass-2's
  * counts. A nondeterministic source (sampling without a fixed seed,
  * rand-derived columns, a table mutating mid-job) can yield a
  * certificate that claims exactness for counts it never saw —
  * `.cache()` the projection first if the source can't promise this.
  */
object HeavyHitters {

  /** Per-partition Misra–Gries: (surviving keys, rows seen, evicted?). */
  private def mgPartition(it: Iterator[String], m: Int): (Vector[String], Long, Boolean) = {
    val counts = mutable.HashMap.empty[String, Long]
    var n = 0L
    var evicted = false
    it.foreach { tok =>
      n += 1
      counts.get(tok) match {
        case Some(c) => counts.update(tok, c + 1)
        case None if counts.size < m => counts.update(tok, 1L)
        case None =>
          // decrement-all; amortized against the increments that filled it
          evicted = true
          val dead = mutable.ArrayBuffer.empty[String]
          counts.keysIterator.foreach { k =>
            val c = counts(k) - 1
            if (c == 0) dead += k else counts.update(k, c)
          }
          dead.foreach(counts.remove)
      }
    }
    (counts.keysIterator.toVector, n, evicted)
  }

  /** Exact global top-k of `tokenCol` (ties broken by token ascending),
    * certified via Misra–Gries with `m` counters per partition. Returns
    * (tokenCol, cnt). Throws if the certificate fails — raise `m`
    * (candidate volume is ≤ m × partitions; m=4096 across 1000 executors
    * is still a few-MB broadcast).
    */
  def topK(spark: SparkSession, tokens: DataFrame, tokenCol: String,
      k: Int, m: Int): DataFrame = {
    import spark.implicits._
    require(k >= 1 && m > k, s"need m > k (got m=$m, k=$k)")
    val toks = tokens.select(col(tokenCol).cast("string")).filter(col(tokenCol).isNotNull)
    val perPart = toks.as[String]
      .mapPartitions(it => Iterator.single(mgPartition(it, m)))
      .collect() // one row per partition, each ≤ m tokens — driver-bounded
    val total = perPart.map(_._2).sum
    val anyEvicted = perPart.exists(_._3)
    val candidates = perPart.flatMap(_._1).distinct.sorted
    if (candidates.isEmpty)
      return spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        new org.apache.spark.sql.types.StructType().add(tokenCol, "string").add("cnt", "long"))
    val exact = recount(spark, toks, tokenCol, candidates)
      .orderBy(desc("cnt"), asc(tokenCol))
      .limit(k)
      .collect()
    val floor = total.toDouble / (m + 1)
    val kth = exact.lastOption.map(_.getLong(1)).getOrElse(0L)
    val certified =
      !anyEvicted || // no summary overflowed: candidates == all distinct tokens
        (exact.length == k && kth > floor)
    if (!certified)
      throw new IllegalStateException(
        s"heavy-hitter certificate failed: k-th count $kth <= n/(m+1) = $floor " +
          s"(n=$total, m=$m, candidates=${candidates.length}) — a non-candidate " +
          "could outrank it; raise m")
    spark.createDataFrame(
      spark.sparkContext.parallelize(exact.toIndexedSeq, 1),
      new org.apache.spark.sql.types.StructType()
        .add(tokenCol, "string").add("cnt", "long"))
  }

  /** Exact counts restricted to the candidate set, as a BROADCAST
    * left-semi join — never an `isInCollection` literal list. Candidates
    * are bounded by m × numPartitions; at the design point (m=4096 over
    * a 100 TB scan's ~1e5 tasks) that is millions of entries — as an
    * In/InSet the list would be rebuilt into every task's plan binary,
    * a cost that grows with CLUSTER WIDTH; as a broadcast hash relation
    * it ships once per executor. The group-by after the semi join still
    * shuffles only candidate keys.
    */
  private[graft] def recount(spark: SparkSession, toks: DataFrame,
      tokenCol: String, candidates: Seq[String]): DataFrame = {
    import spark.implicits._
    val candDf = candidates.toDF(tokenCol)
    toks.join(broadcast(candDf), Seq(tokenCol), "left_semi")
      .groupBy(col(tokenCol)).agg(count(lit(1)).as("cnt"))
  }
}
