package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) clustering key for multi-column data skipping.
  *
  * A lexicographic sort ([[Compact.rewritePartitioned]]'s `clusterBy`)
  * gives tight per-file min/max ranges on the LEADING column only — a
  * predicate on the second column still scans every file. Interleaving
  * the bit patterns of per-column bucket ranks makes file/row-group
  * ranges tight in EVERY clustered dimension at once (each file covers a
  * small rectangle of the key space), which is what lets a 100 TB scan
  * with predicates on either of two uncorrelated columns skip most of
  * the layout from footer statistics alone.
  *
  * Bucketing is by QUANTILE rank, not equal-width ranges: boundaries
  * come from one `approxQuantile` pass (driver-held, cols × 2^bits
  * doubles — bounded), so skewed columns still spread across all 2^bits
  * codes. The rank lookup and the bit interleave are pure column
  * expressions over literal boundary arrays — no join, no UDF; the
  * per-row cost is paid once, inside the compaction rewrite that was
  * scanning the data anyway.
  */
object ZOrder {

  /** Per-column quantile boundaries for `2^bits` buckets, in one pass.
    * Columns must be castable to double (numeric/date/timestamp via
    * explicit cast upstream).
    */
  def boundaries(df: DataFrame, cols: Seq[String], bits: Int,
      relErr: Double = 0.001): Map[String, Array[Double]] = {
    require(bits >= 1 && bits <= 16, s"bits must be in [1,16], got $bits")
    val probs = (1 until (1 << bits)).map(_.toDouble / (1 << bits)).toArray
    val casted = df.select(cols.map(c => col(c).cast("double").as(c)): _*)
    cols.zip(casted.stat.approxQuantile(cols.toArray, probs, relErr))
      .map { case (c, b) => c -> b }.toMap
  }

  /** Bucket rank of `c` against sorted `bnds`: the count of boundaries
    * ≤ value, in [0, 2^bits − 1]. NULLs rank 0 (lowest bucket).
    *
    * Codegen'd O(log n) binary search ([[graft.functions.BucketRank]]) —
    * the `size(filter(typedLit(bnds), _ <= x))` form walks every boundary
    * through an INTERPRETED lambda per row and broke whole-stage codegen;
    * evaluated twice per row inside a compaction rewrite (partitioner
    * sampling + write sort) it dominated the whole rewrite.
    */
  def bucket(c: Column, bnds: Array[Double]): Column =
    coalesce(graft.functions.BucketRank.rank(c, bnds), lit(0))

  /** Morton interleave of `bits`-wide bucket ranks: bit i of column j
    * lands at position `i * m + (m − 1 − j)` — column 0 owns the most
    * significant bit of each group, so all columns contribute equally to
    * the curve's locality.
    */
  def interleave(buckets: Seq[Column], bits: Int): Column = {
    val m = buckets.size
    val terms = for {
      i <- 0 until bits
      (b, j) <- buckets.zipWithIndex
    } yield shiftleft(shiftright(b, i).bitwiseAND(lit(1)), i * m + (m - 1 - j))
    terms.reduce(_ + _).cast("long")
  }

  /** The z-value expression for `cols` of `df`: one `approxQuantile`
    * driver pass for boundaries, then a pure column expression usable in
    * `repartitionByRange` / `sortWithinPartitions`.
    */
  def curve(df: DataFrame, cols: Seq[String], bits: Int = 8): Column = {
    val bnds = boundaries(df, cols, bits)
    interleave(cols.map(c => bucket(col(c), bnds(c))), bits)
  }
}
