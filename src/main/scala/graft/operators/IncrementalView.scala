package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, DoubleType, FloatType, LongType}

/** Incremental maintenance of grouped count/sum materialized views from a
  * row-level change feed ([[Snapshots.changes]] with `preImages = true`).
  *
  * The scale story: a 100 TB base table's MERGE touches O(delta) rows; a
  * downstream aggregate that re-scans the table per refresh pays O(table)
  * every time. count/sum (and any other abelian-group aggregate) admit
  * exact delta maintenance — retract preimages/deletes, apply
  * postimages/inserts — so the refresh costs O(changes): this is the
  * standard view-maintenance algebra (ΔV = γ(+ΔR) ⊖ γ(−ΔR)) on top of our
  * CDF. min/max are not invertible under deletes (a retracted minimum
  * forces a rescan), so they maintain HYBRID: exact algebraic combine
  * on insert-only groups, a DECLARED per-group recount under any
  * retraction ([[applyCountSum]]'s `__mm_stale` flag names the groups
  * owing one) — never a silent wrong answer.
  */
object IncrementalView {

  /** The grouped count/sum view this module maintains: one row per group,
    * `n_rows` plus `sum_<c>` and `nn_<c>` (non-null value count) for each
    * of `sumCols`. The `nn_<c>` companion is what lets the incremental
    * apply distinguish "sums to 0" from "no non-null values" — SQL's
    * `sum` over an all-NULL group is NULL, and the maintained view must
    * reproduce that bit-identically. `minMaxCols` adds `min_<c>`/
    * `max_<c>` — exact SELECTIONS (not accumulations), so float columns
    * are fine here even though sums refuse them. `distinctCols` adds
    * `nd_<c>` = COUNT(DISTINCT c) per group (NULLs ignored, like SQL's)
    * — the stored half of the two-level maintenance [[graft.operators.Mv]]
    * runs through its per-value companion tables; this aggregate itself
    * is only the initial/full compute.
    */
  /** The DataSketches HLL log-config-K every maintained sketch uses —
    * one shared constant, because [[org.apache.spark.sql.functions.hll_union]]
    * refuses to merge sketches of different precision.
    */
  val HllLgK = 12

  /** The KLL sketch-build aggregate for a quantile column, dispatched by
    * the column's own numeric type (the DataSketches KLL family is
    * per-type; the matching get-quantile returns that type, so routing
    * stays type-exact). Default k (200, ~1.65% rank error) everywhere —
    * one shared config, merges never mix parameters.
    */
  private[graft] def kllAgg(dt: DataType, c: Column): Column = dt match {
    case DoubleType => kll_sketch_agg_double(c)
    case FloatType => kll_sketch_agg_float(c)
    case LongType => kll_sketch_agg_bigint(c)
    case other => throw new IllegalArgumentException(
      s"approx-quantile columns must be double/float/bigint, got ${other.sql}")
  }

  /** The matching scalar two-sketch merge (insert-only combine). */
  private[graft] def kllMerge(dt: DataType, a: Column, b: Column): Column = dt match {
    case DoubleType => kll_sketch_merge_double(a, b)
    case FloatType => kll_sketch_merge_float(a, b)
    case LongType => kll_sketch_merge_bigint(a, b)
    case other => throw new IllegalArgumentException(
      s"approx-quantile columns must be double/float/bigint, got ${other.sql}")
  }

  def countSum(df: DataFrame, groupCols: Seq[String], sumCols: Seq[String],
      minMaxCols: Seq[String] = Nil, distinctCols: Seq[String] = Nil,
      approxCols: Seq[String] = Nil, quantileCols: Seq[String] = Nil): DataFrame = {
    require(groupCols.nonEmpty, "countSum needs group columns")
    df.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n_rows"),
        sumCols.flatMap(c => Seq(sum(col(c)).as(s"sum_$c"),
          count(col(c)).as(s"nn_$c"))) ++
        minMaxCols.flatMap(c => Seq(min(col(c)).as(s"min_$c"),
          max(col(c)).as(s"max_$c"))) ++
        distinctCols.map(c => countDistinct(col(c)).as(s"nd_$c")) ++
        approxCols.map(c => hll_sketch_agg(col(c), HllLgK).as(s"hll_$c")) ++
        quantileCols.map(c =>
          kllAgg(df.schema(c).dataType, col(c)).as(s"kll_$c")): _*)
  }

  /** Apply a CDF (from [[Snapshots.changes]] with `preImages = true`) to a
    * materialized [[countSum]] view — O(changes), never O(base table).
    * Inserts/postimages add, deletes/preimages retract; groups whose
    * count reaches zero disappear (exactly like the recomputed view).
    * Null-keyed groups are handled (the join is null-safe).
    *
    * With `minMaxCols`, min/max combine algebraically where that is
    * EXACT — `least(stored, min(inserts))` holds as long as nothing
    * retracted — and every group the feed retracts FROM is flagged in
    * an extra `__mm_stale` boolean column with its min/max left at the
    * (possibly stale) algebraic value: a retracted minimum is not
    * invertible, so the CALLER must recount flagged groups from the
    * viewed relation ([[graft.operators.Mv.refresh]] does) or refuse.
    * `approxCols` (the `hll_<c>` DataSketches companions) share exactly
    * that discipline — a register only grows, so inserts UNION exactly
    * and any retraction rides the same flag — and so do `quantileCols`
    * (the `kll_<c>` KLL sketches: a stream sketch only absorbs, so
    * inserts MERGE exactly and retraction flags the group). The flag
    * column only exists when `minMaxCols ++ approxCols ++ quantileCols`
    * is non-empty.
    */
  def applyCountSum(mv: DataFrame, cdf: DataFrame,
      groupCols: Seq[String], sumCols: Seq[String],
      minMaxCols: Seq[String] = Nil, carryCols: Seq[String] = Nil,
      approxCols: Seq[String] = Nil, quantileCols: Seq[String] = Nil,
      trustPreimages: Boolean = false): DataFrame = {
    require(groupCols.nonEmpty, "applyCountSum needs group columns")
    // approx sketches share min/max's hybrid discipline: an HLL register
    // only grows (insert = union, exact), so any retraction from a group
    // flags it stale for the caller's recount — same __mm_stale channel
    val hybridCols = minMaxCols ++ approxCols ++ quantileCols
    val kllTypes: Map[String, DataType] =
      quantileCols.map(c => c -> cdf.schema(c).dataType).toMap
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
            .as(s"__dnn_$c"))) ++
        minMaxCols.flatMap(c => Seq(
          min(when(col("__sign") === 1L, col(c))).as(s"__imin_$c"),
          max(when(col("__sign") === 1L, col(c))).as(s"__imax_$c"))) ++
        approxCols.map(c =>
          hll_sketch_agg(when(col("__sign") === 1L, col(c)), HllLgK)
            .as(s"__ihll_$c")) ++
        quantileCols.map(c =>
          kllAgg(kllTypes(c), when(col("__sign") === 1L, col(c)))
            .as(s"__ikll_$c")) ++
        (if (hybridCols.isEmpty) Nil
         else Seq(max(col("__sign") === -1L).as("__ret"))): _*)
    // a feed without preimages cannot be applied soundly: an 'update' row
    // alone would double-count. Fail loudly instead of absorbing it.
    // `trustPreimages` skips the probe job for a caller whose cdf comes
    // STRAIGHT from Snapshots.changes(preImages = true), which emits only
    // update_preimage/update_postimage by construction — the check would
    // cost one full pass over the feed per refresh to re-prove it.
    val hasPlainUpdate = !trustPreimages &&
      cdf.where(col("change") === "update").limit(1).count() > 0
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
          } ++
          minMaxCols.flatMap { c =>
            // least/greatest SKIP nulls: an absent stored row (new
            // group) or an insert-free delta side falls through to the
            // other operand; all-null stays null
            Seq(least(m(s"min_$c"), d(s"__imin_$c")).as(s"min_$c"),
              greatest(m(s"max_$c"), d(s"__imax_$c")).as(s"max_$c"))
          } ++
          approxCols.map { c =>
            // registers only grow: stored ∪ insert-sketch is EXACT for
            // an insert-only group; either side absent falls through
            when(m(s"hll_$c").isNull, d(s"__ihll_$c"))
              .when(d(s"__ihll_$c").isNull, m(s"hll_$c"))
              .otherwise(hll_union(m(s"hll_$c"), d(s"__ihll_$c")))
              .as(s"hll_$c")
          } ++
          quantileCols.map { c =>
            // stream sketches only absorb: stored ⊎ insert-sketch is the
            // sketch of the unioned stream for an insert-only group
            when(m(s"kll_$c").isNull, d(s"__ikll_$c"))
              .when(d(s"__ikll_$c").isNull, m(s"kll_$c"))
              .otherwise(kllMerge(kllTypes(c), m(s"kll_$c"), d(s"__ikll_$c")))
              .as(s"kll_$c")
          } ++
          (if (hybridCols.isEmpty) Nil
           else Seq(coalesce(d("__ret"), lit(false)).as("__mm_stale"))) ++
          // columns the algebra does not maintain, carried verbatim from
          // the stored MV side (NULL for groups the delta created) — the
          // caller overlays their fresh values (Mv's distinct-count
          // companions do), this join just keeps them in the frame
          carryCols.map(c => m(c).as(c)): _*)
      .where(col("n_rows") > 0)
  }
}
