package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** SimHash near-duplicate detection: 64-bit locality-sensitive fingerprint
  * per document (Charikar's scheme — similar token distributions give
  * fingerprints at small Hamming distance), then banded bucketing for
  * candidate pairs. Complementary to MinHash: SimHash weighs token
  * *frequencies*, MinHash compares shingle *sets*.
  */
object SimHashDedup {

  /** 64-bit simhash per doc from whitespace tokens, weighted by count. */
  def simhash(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tok = docs
      .select(col(idCol).as("doc_id"), explode(split(col(textCol), " ")).as("w"))
      .groupBy("doc_id", "w").agg(count(lit(1)).as("cnt"))
      .withColumn("h", xxhash64(col("w")))
    val bitSums = (0 until 64).map { i =>
      sum(when(shiftrightunsigned(col("h"), i).bitwiseAND(1) === 1, col("cnt"))
        .otherwise(-col("cnt"))).as(s"b$i")
    }
    val agg = tok.groupBy("doc_id").agg(bitSums.head, bitSums.tail: _*)
    val sim = (0 until 64)
      .map(i => when(col(s"b$i") > 0, lit(1L << i)).otherwise(lit(0L)))
      .reduce((a, b) => a.bitwiseOR(b))
    agg.select(col("doc_id"), sim.as("simhash"))
  }

  private val Blocks = 8
  private val BlockWidth = 8
  private val blockPairs: Seq[(Int, Int)] =
    for { i <- 0 until Blocks; j <- i + 1 until Blocks } yield (i, j)

  /** Candidate pairs from block-combination bucketing (the design of
    * Manku et al., WWW'07, "Detecting Near-Duplicates for Web Crawling"):
    * the 64-bit fingerprint splits into 8 blocks of 8 bits, and every
    * PAIR of blocks forms one 16-bit key — C(8,2) = 28 tables.
    *
    * Recall guarantee (block-level pigeonhole): d differing bits touch at
    * most d blocks, so a pair within Hamming distance 6 leaves ≥ 2 blocks
    * intact — and every 2-block combination IS a table, so candidate
    * recall is GUARANTEED for maxDist ≤ 6. Exact `bit_count(xor)`
    * verification runs on every candidate regardless.
    *
    * Scale: 16-bit keys give 65536 bucket values per table, so collision
    * volume is driven by true near-duplicates, not by a bucket-count
    * floor. (Naive contiguous 8×8-bit banding has only 256 buckets per
    * band — a 3% random-collision floor that is quadratic in corpus size
    * and dies around 10⁶ docs; 4×16 contiguous banding fixes the floor
    * but can only guarantee recall to d = 3.)
    */
  def candidates(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val s = simhash(docs, idCol, textCol)
    def block(i: Int) =
      shiftrightunsigned(col("simhash"), i * BlockWidth).bitwiseAND(lit(0xFFL))
    val keys = blockPairs.map { case (i, j) => block(i) * lit(256L) + block(j) }
    val b = s.select(col("doc_id"), col("simhash"), posexplode(array(keys: _*)))
      .toDF("doc_id", "simhash", "band", "key")
    b.as("l").join(b.as("r"),
        col("l.band") === col("r.band") && col("l.key") === col("r.key") &&
          col("l.doc_id") < col("r.doc_id"))
      .select(col("l.doc_id").as("doc_a"), col("r.doc_id").as("doc_b"),
        bit_count(col("l.simhash").bitwiseXOR(col("r.simhash"))).as("hamming"))
      .distinct()
  }

  /** Pairs within `maxDist` Hamming distance: block-combination candidates
    * + exact `bit_count(xor)` verification. Recall is total (not merely
    * probable) for maxDist ≤ 6 — see [[candidates]].
    */
  def pairs(docs: DataFrame, idCol: String, textCol: String,
      maxDist: Int = 6): DataFrame = {
    require(maxDist <= Blocks - 2,
      s"recall is only guaranteed for maxDist <= ${Blocks - 2} (got $maxDist)")
    candidates(docs, idCol, textCol)
      .filter(col("hamming") <= maxDist)
  }
}
