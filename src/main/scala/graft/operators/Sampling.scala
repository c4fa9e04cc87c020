package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic content-keyed sampling and split assignment — the
  * subsampling tier of a training-data pipeline (quick-look corpora,
  * train/val/test splits, per-stratum downsampling).
  *
  * Why not `df.sample()`: Spark's Bernoulli sample is seeded per
  * PARTITION — the kept set changes whenever partitioning, file layout,
  * or parallelism changes, so two runs over the same corpus can sample
  * different rows. Here admission is a pure function of the row's KEY:
  * a row is kept iff the first 8 hex chars of `md5(key)` fall below the
  * fraction's threshold. Stable across cluster sizes, repartitioning and
  * engine versions; embarrassingly parallel (a codegen'd hash + string
  * compare per row, no shuffle); and exactly mirrorable in ANSI SQL
  * (fixed-width lowercase-hex strings compare lexicographically ==
  * numerically, so the oracle needs no 64-bit integer-parsing quirks).
  */
object Sampling {

  /** 8-hex-char admission key in [0, 16^8), uniform over keys: the md5
    * prefix of `key` (cast to string) + `salt`. Distinct salts give
    * independent admissions (e.g. sampling vs split assignment).
    */
  def hashKey(key: Column, salt: String = ""): Column =
    substring(md5(concat(key.cast("string"), lit(salt))), 1, 8)

  /** Lowercase-hex admission threshold for a fraction: 8-hex rows are
    * admitted iff `hashKey < hexThreshold(f)`. f ≥ 1 maps to "g" (above
    * every hex string — admit all); f ≤ 0 to "00000000" (admit none).
    */
  private[graft] def hexThreshold(f: Double): String =
    if (f >= 1.0) "g"
    else f"${math.max(0L, (f * 4294967296d).toLong)}%08x"

  /** Keep ~`fraction` of rows, chosen deterministically by `key`. */
  def sample(df: DataFrame, key: Column, fraction: Double,
      salt: String = ""): DataFrame =
    df.filter(hashKey(key, salt) < lit(hexThreshold(fraction)))

  /** Per-stratum rates: keep ~`fractions(stratum)` of each stratum
    * (`default` elsewhere). One codegen'd case chain — no join, no
    * shuffle, rates as fixed hex literals.
    */
  def stratifiedSample(df: DataFrame, stratum: Column, key: Column,
      fractions: Map[String, Double], default: Double,
      salt: String = ""): DataFrame = {
    val threshold = fractions.toSeq.sortBy(_._1)
      .foldLeft(lit(hexThreshold(default))) { case (acc, (s, f)) =>
        when(stratum === s, lit(hexThreshold(f))).otherwise(acc)
      }
    df.filter(hashKey(key, salt) < threshold)
  }

  /** Deterministic split assignment: adds `outCol` with the first name
    * whose cumulative weight bound exceeds the row's hash — e.g.
    * `Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)`. Splits are
    * disjoint and exhaustive by construction (the last split takes the
    * remainder, so weights should sum to ~1). Salted independently of
    * [[sample]] so subsampling then splitting stays unbiased.
    */
  def assignSplit(df: DataFrame, key: Column,
      weights: Seq[(String, Double)], outCol: String = "split",
      salt: String = "split"): DataFrame = {
    require(weights.nonEmpty, "assignSplit needs at least one split")
    val h = hashKey(key, salt)
    val cum = weights.init.scanLeft(0.0) { case (acc, (_, w)) => acc + w }.tail
    val expr = weights.init.zip(cum).foldRight(lit(weights.last._1): Column) {
      case (((name, _), bound), acc) =>
        when(h < lit(hexThreshold(bound)), lit(name)).otherwise(acc)
    }
    // a NULL key must be a NULL split, not a silent member of the LAST
    // split (every `when` on a null hash falls through to the tail —
    // that would bias "test" with all the key-less rows)
    df.withColumn(outCol, when(key.isNull, lit(null).cast("string")).otherwise(expr))
  }

  /** Weighted Bernoulli admission: keep each row with probability `prob`
    * (a per-row Column in [0, 1], e.g. `length / maxLength` for
    * length-proportional corpus downsampling), decided deterministically
    * by the row's key. The uniform draw is the first 13 hex chars of
    * `md5(key + salt)` read as a 52-bit integer; the acceptance bound is
    * `floor(prob * 2^52)` — both sides of the comparison are integers and
    * the only floating-point step is one IEEE multiply+floor, so the
    * decision replays bit-identically in any engine (no transcendental
    * ranking, unlike an Efraimidis–Spirakis top-k, whose pow/log ulps
    * differ across libm implementations). 52 bits keeps the bound inside
    * double's exact-integer range. Same layout/cluster-size stability
    * argument as [[sample]]; no shuffle, pure codegen'd filter.
    */
  def weightedSample(df: DataFrame, key: Column, prob: Column,
      salt: String = "wsample"): DataFrame = {
    val u = conv(substring(md5(concat(key.cast("string"), lit(salt))), 1, 13), 16, 10)
      .cast("long")
    val bound = floor(least(greatest(prob, lit(0.0)), lit(1.0)) *
      lit(4503599627370496.0)).cast("long") // 2^52
    df.filter(u < bound)
  }
}
