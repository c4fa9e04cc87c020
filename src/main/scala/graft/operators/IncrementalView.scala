package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental maintenance of grouped count/sum materialized views from a
  * row-level change feed ([[Snapshots.changes]] with `preImages = true`).
  *
  * The scale story: a 100 TB base table's MERGE touches O(delta) rows; a
  * downstream aggregate that re-scans the table per refresh pays O(table)
  * every time. count/sum (and any other abelian-group aggregate) admit
  * exact delta maintenance — retract preimages/deletes, apply
  * postimages/inserts — so the refresh costs O(changes): this is the
  * standard view-maintenance algebra (ΔV = γ(+ΔR) ⊖ γ(−ΔR)) on top of our
  * CDF. min/max are deliberately NOT offered: they are not invertible
  * under deletes (a retracted minimum forces a rescan), and a silent
  * wrong answer is worse than an honest recompute.
  */
object IncrementalView {

  /** The grouped count/sum view this module maintains: one row per group,
    * `n_rows` plus `sum_<c>` and `nn_<c>` (non-null value count) for each
    * of `sumCols`. The `nn_<c>` companion is what lets the incremental
    * apply distinguish "sums to 0" from "no non-null values" — SQL's
    * `sum` over an all-NULL group is NULL, and the maintained view must
    * reproduce that bit-identically.
    */
  def countSum(df: DataFrame, groupCols: Seq[String], sumCols: Seq[String]): DataFrame = {
    require(groupCols.nonEmpty, "countSum needs group columns")
    df.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n_rows"),
        sumCols.flatMap(c => Seq(sum(col(c)).as(s"sum_$c"),
          count(col(c)).as(s"nn_$c"))): _*)
  }

  /** Apply a CDF (from [[Snapshots.changes]] with `preImages = true`) to a
    * materialized [[countSum]] view — O(changes), never O(base table).
    * Inserts/postimages add, deletes/preimages retract; groups whose
    * count reaches zero disappear (exactly like the recomputed view).
    * Null-keyed groups are handled (the join is null-safe).
    */
  def applyCountSum(mv: DataFrame, cdf: DataFrame,
      groupCols: Seq[String], sumCols: Seq[String]): DataFrame = {
    require(groupCols.nonEmpty, "applyCountSum needs group columns")
    val sign = when(col("change").isin("insert", "update_postimage"), lit(1L))
      .when(col("change").isin("delete", "update_preimage"), lit(-1L))
    val delta = cdf
      .withColumn("__sign", sign)
      .where(col("__sign").isNotNull)
      .groupBy(groupCols.map(col): _*)
      .agg(sum(col("__sign")).as("__dn"),
        sumCols.flatMap(c => Seq(
          // sum over nulls contributes nothing — same as the grouped sum
          sum(col("__sign") * col(c)).as(s"__ds_$c"),
          // sign-summed non-null count, so retracting the last non-null
          // value drives nn to 0 and the applied sum back to NULL
          sum(when(col(c).isNotNull, col("__sign")).otherwise(lit(0L)))
            .as(s"__dnn_$c"))): _*)
    // a feed without preimages cannot be applied soundly: an 'update' row
    // alone would double-count. Fail loudly instead of absorbing it.
    val hasPlainUpdate = cdf.where(col("change") === "update").limit(1).count() > 0
    require(!hasPlainUpdate,
      "applyCountSum needs a preimage CDF (Snapshots.changes(..., preImages = true)); " +
        "got 'update' rows without their retractions")
    val m = mv.alias("m")
    val d = delta.alias("d")
    val joinCond = groupCols.map(c => m(c) <=> d(c)).reduce(_ && _)
    m.join(d, joinCond, "full_outer")
      .select(
        groupCols.map(c => coalesce(m(c), d(c)).as(c)) ++
          Seq((coalesce(m("n_rows"), lit(0L)) + coalesce(d("__dn"), lit(0L))).as("n_rows")) ++
          sumCols.flatMap { c =>
            val nn = coalesce(m(s"nn_$c"), lit(0L)) + coalesce(d(s"__dnn_$c"), lit(0L))
            Seq(
              // an all-NULL group sums to NULL, not 0 — exactly what the
              // recompute would report (coalesce alone would say 0)
              when(nn > 0,
                coalesce(m(s"sum_$c"), lit(0L)) + coalesce(d(s"__ds_$c"), lit(0L)))
                .as(s"sum_$c"),
              nn.as(s"nn_$c"))
          }: _*)
      .where(col("n_rows") > 0)
  }
}
