package graft.operators

import graft.functions.BloomMightContain
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bloom-filter runtime pruning for semi/anti joins — the "ship a
  * summary of the small side to the big side's scan" pattern that turns
  * a 100 TB shuffle problem into a scan-local filter problem.
  *
  * The reference's existence checks join a full destination manifest
  * against a full source manifest (`CommonUtils.java:107-121` — both
  * sides enumerated, compared in driver memory). At warehouse scale the
  * probe side is the 100 TB fact table, and the dominant cost of a plain
  * semi/anti join is shuffling EVERY fact row to its join partition just
  * to discard most of them. This operator:
  *
  *   1. aggregates the build side's keys into a Bloom filter
  *      (`DataFrameStatFunctions.bloomFilter` — a distributed
  *      treeAggregate; the driver holds only the final bitmap,
  *      ~1.2 MB per million keys at 1% fpp);
  *   2. applies [[BloomMightContain]] to the probe side at the SCAN
  *      (codegen'd, inside whole-stage codegen, evaluated before the
  *      exchange), eliminating ~(1−fpp) of non-matching rows pre-shuffle;
  *   3. finishes with the EXACT join on the survivors, so false
  *      positives are removed and results are bit-identical to the
  *      unpruned plan — which is what the DuckDB oracle on q126/q127
  *      proves.
  *
  * For anti joins the filter splits the probe: bloom-negative rows are
  * DEFINITE non-members (a Bloom filter has no false negatives) and
  * bypass the join entirely; only bloom-positive rows — build-set size
  * + fpp·|probe|, not |probe| — reach the exact anti join. NULL probe
  * keys never equi-match, so they short-circuit with the negatives.
  *
  * vs broadcast: a broadcast hash join ships ~16-24 bytes per key plus
  * hash-table overhead and must fit the whole key set in every
  * executor's memory; the bloom bitmap is ~9.6 BITS per key at 1% fpp —
  * 50M build keys ≈ 60 MB bitmap vs a multi-GB broadcast table — and
  * rides the once-per-stage task binary. Spark's own runtime filters
  * (`spark.sql.optimizer.runtime.bloomFilter.*`) apply the same idea
  * but only when the optimizer's selectivity heuristics fire; this
  * operator makes the plan explicit and deterministic.
  */
object BloomPrune {

  /** `probe LEFT SEMI JOIN build ON probe(probeKey) = build(buildKey)`,
    * with the probe side bloom-pruned before the exact join.
    */
  def semiJoin(
      probe: DataFrame,
      build: DataFrame,
      probeKey: String,
      buildKey: String,
      expectedKeys: Long,
      fpp: Double = 0.01): DataFrame = {
    val bf = build.stat.bloomFilter(buildKey, expectedKeys, fpp)
    val might = coalesce(BloomMightContain(col(probeKey), bf), lit(false))
    // alias the build key so same-named probe/build keys (the common
    // case) don't both resolve against the join output (AMBIGUOUS_REFERENCE)
    val bk = "__graft_bloom_build_key"
    probe.filter(might)
      .join(build.select(col(buildKey).as(bk)),
        col(probeKey) === col(bk), "left_semi")
  }

  /** `probe LEFT ANTI JOIN build ON probe(probeKey) = build(buildKey)`:
    * bloom-negative rows (definite non-members, including NULL keys)
    * bypass the join; only bloom-positive rows reach the exact anti join.
    */
  def antiJoin(
      probe: DataFrame,
      build: DataFrame,
      probeKey: String,
      buildKey: String,
      expectedKeys: Long,
      fpp: Double = 0.01): DataFrame = {
    val bf = build.stat.bloomFilter(buildKey, expectedKeys, fpp)
    val might = coalesce(BloomMightContain(col(probeKey), bf), lit(false))
    val definiteOut = probe.filter(!might)
    val bk = "__graft_bloom_build_key"
    val suspects = probe.filter(might)
      .join(build.select(col(buildKey).as(bk)),
        col(probeKey) === col(bk), "left_anti")
    definiteOut.unionByName(suspects)
  }

  /** The pruning condition alone (for callers composing their own plan),
    * NULL-coalesced to false.
    */
  def condition(build: DataFrame, buildKey: String, probeCol: Column,
      expectedKeys: Long, fpp: Double = 0.01): Column =
    coalesce(
      BloomMightContain(probeCol, build.stat.bloomFilter(buildKey, expectedKeys, fpp)),
      lit(false))
}
