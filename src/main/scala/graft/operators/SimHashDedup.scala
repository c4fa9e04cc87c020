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

  /** Pairs within `maxDist` Hamming distance via banded bucketing.
    * Pigeonhole: d differing bits touch at most d bands, so any pair with
    * d < `bands` shares at least one intact band — full candidate recall
    * is GUARANTEED for maxDist ≤ bands-1 (verification is exact
    * `bit_count(xor)` regardless). Default 8×8-bit bands: recall
    * guaranteed to d=7, random-pair collision ≈ 8/256 = 3%.
    */
  def pairs(docs: DataFrame, idCol: String, textCol: String,
      maxDist: Int = 7, bands: Int = 8): DataFrame = {
    require(64 % bands == 0, "bands must divide 64")
    require(maxDist < bands,
      s"recall is only guaranteed for maxDist < bands (got $maxDist ≥ $bands)")
    val width = 64 / bands
    val mask = (1L << width) - 1
    val s = simhash(docs, idCol, textCol)
    val b = s.select(col("doc_id"), col("simhash"), posexplode(expr(
        s"transform(sequence(0, ${bands - 1}), b -> shiftrightunsigned(simhash, b * $width) & $mask)")))
      .toDF("doc_id", "simhash", "band", "key")
    b.as("l").join(b.as("r"),
        col("l.band") === col("r.band") && col("l.key") === col("r.key") &&
          col("l.doc_id") < col("r.doc_id"))
      .select(col("l.doc_id").as("doc_a"), col("r.doc_id").as("doc_b"),
        bit_count(col("l.simhash").bitwiseXOR(col("r.simhash"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxDist)
  }
}
