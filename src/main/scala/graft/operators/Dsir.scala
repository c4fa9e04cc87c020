package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Data Selection via Importance Resampling (Xie et al., NeurIPS 2023) —
  * the distribution-matching selection tier of a training-data pipeline:
  * score every raw document by how much more likely its hashed n-gram
  * features are under a TARGET corpus (curated, in-domain) than under the
  * raw corpus itself, then keep the top of the ranking (or sample
  * proportionally to the weight).
  *
  * Features are word bigrams hashed into a fixed bucket space. The bucket
  * id is the first `hexChars` hex chars of `md5(gram)` — a pure function
  * of the gram, uniform over buckets, and exactly mirrorable in ANSI SQL
  * (the [[Sampling]] discipline: fixed-width lowercase hex needs no
  * 64-bit integer parsing on either engine). Both bucket distributions
  * get add-one smoothing, so buckets unseen in the target contribute a
  * finite penalty instead of −∞.
  *
  * Shapes at 100 TB: one explode + lead window per corpus (linear in
  * tokens, the [[Vocabulary.bigramSurprisal]] plan), per-doc bucket
  * counts materialized ONCE and reduced map-side; the bucket tables are
  * BOUNDED by the bucket space (16^hexChars rows max), so the per-gram
  * log-ratio join broadcasts. No driver state beyond 1-row totals.
  */
object Dsir {

  /** (idCol, bucket, cd) — per-document hashed-bigram bucket counts.
    * Bucket = first `hexChars` chars of md5(w1 || ' ' || w2).
    */
  def docBuckets(docs: DataFrame, hexChars: Int = 3,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val w = docs.select(col(idCol),
        posexplode(split(trim(col(textCol)), TextFunctions.WS + "+")))
      .toDF(idCol, "pos", "w1")
    w.withColumn("w2", lead(col("w1"), 1).over(
        Window.partitionBy(idCol).orderBy("pos")))
      .filter(col("w2").isNotNull)
      .select(col(idCol),
        substring(md5(concat_ws(" ", col("w1"), col("w2"))), 1, hexChars).as("bucket"))
      .groupBy(idCol, "bucket").agg(count(lit(1)).as("cd"))
  }

  /** Per-document importance weights of `raw` against `target`:
    * (idCol, n_grams, avg_log_ratio) where avg_log_ratio is the mean over
    * the doc's bigrams of ln p̂_target(bucket) − ln p̂_raw(bucket), both
    * add-one-smoothed over the `16^hexChars` bucket space, rounded to
    * `scale` decimals (the transcendental-oracle discipline — see q74).
    * Positive ⇒ the doc looks more like the target than like the raw
    * corpus. Documents with fewer than 2 tokens are absent.
    */
  def importanceWeights(raw: DataFrame, target: DataFrame,
      hexChars: Int = 3, scale: Int = 6,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val buckets = math.pow(16, hexChars).toLong
    val rawPd = docBuckets(raw, hexChars, idCol, textCol).localCheckpoint()
    val rawB = rawPd.groupBy("bucket").agg(sum("cd").as("cr"))
    val tgtB = docBuckets(target, hexChars, idCol, textCol)
      .groupBy("bucket").agg(sum("cd").as("ct"))
    val totals = rawB.agg(sum("cr").as("nr"))
      .crossJoin(tgtB.agg(sum("ct").as("nt")))
    // smoothed per-bucket log ratio; buckets absent from the target (or,
    // after an outer join, from the raw side of the table) count 0 there
    val ratio = rawB.join(tgtB, Seq("bucket"), "full_outer")
      .crossJoin(broadcast(totals))
      .select(col("bucket"),
        (log((coalesce(col("ct"), lit(0L)) + 1).cast("double") /
            (coalesce(col("nt"), lit(0L)) + buckets)) -
          log((coalesce(col("cr"), lit(0L)) + 1).cast("double") /
            (coalesce(col("nr"), lit(0L)) + buckets))).as("lr"))
    rawPd.join(broadcast(ratio), Seq("bucket"))
      .groupBy(idCol)
      .agg(sum("cd").as("n_grams"),
        round(sum(col("cd") * col("lr")) / sum(col("cd")), scale).as("avg_log_ratio"))
  }
}
