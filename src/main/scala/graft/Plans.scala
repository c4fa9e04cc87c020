package graft

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Plan-shape audit: dumps `explain("formatted")` for representative
  * queries so scan pushdown, join strategies, and codegen spans can be
  * reviewed (and regressions spotted by diffing the output).
  * Usage: runMain graft.Plans <sfDir> <outFile>
  */
object Plans {
  /** The audited set — also walked by PlanAuditSpec, which asserts no
    * UNDECLARED cartesian/nested-loop join appears in any of these
    * plans (the structural "no accidental O(n²)" guarantee).
    */
  val interesting: Seq[String] = Seq(
      "q01_pricing_summary", // agg pushdown + partial agg
      "q02_filter_project",  // PushedFilters into parquet scan
      "q03_segment_revenue", // join strategy selection
      "q06_outer_join_agg",  // outer join + agg
      "q07_window_topk",     // window exec
      "q33_jaccard_pairs",   // explode + self-join + agg chain
      "q36_ann_topk",        // broadcast + native VectorDot codegen
      "q37_cosine_neardup",  // pair join with native dot
      "q38_ann_lsh",         // single-scan banded signature + posexplode
      "q47_salted_join",     // salted skew join shape
      "q48_partition_pruned", // partition pruning on engine-written layout
      "q57_asof_join",       // union + single key shuffle + running last
      "q58_range_join",      // interval->bucket explode + hash equi-join
      "q62_ann_quantized",   // int8 arrays through the broadcast (declared NLJ baseline)
      "q65_quality_profile", // all checks in ONE aggregation pass
      "q66_token_budget_mix", // one window pass per mix cell
      "q68_ann_pq",          // DECLARED broadcast-NLJ over COMPRESSED codes (the ADC
                             // scan — 8× fewer bytes than the q36 baseline's floats);
                             // the re-rank stage is bounded equi-joins
      "q69_stratified_sample", // pure codegen'd filter, no shuffle before the agg
      "q70_repetition_filter", // explode + lead window + two-level agg
      "q77_decontaminate",   // gram explode + equi-join vs broadcast eval-gram set
      "q78_line_dedup",      // posexplode + line-count join + in-array reassembly
      "q79_bm25",            // one wide agg (no postings join) + distributed TopK
      "q80_pack_chunks",     // distributed scan: bucketed window, no global order
      "q81_filter_decisions", // all per-row signals one pass + ngram agg join
      "q82_vocab_encode",    // bounded-vocab broadcast join + in-array reassembly
      "q85_bigram_surprisal", // lead window + two gram counts + equi-joins
      "q86_dsir_weights",    // bounded bucket table broadcast to the gram join
      "q88_semantic_dedup",  // cell-blocked pair search: equi-join on cid, no cartesian
      "q90_shard_manifest",  // rank via distributed scan (no global window)
      "q91_correlated_scalar", // decorrelated per-key aggregate join
      "q93_trailing_hour_window", // time-RANGE frame inside one window exec
      "q94_calendar_gap_fill", // sequence-generated calendar; declared tiny crossJoin
      "q97_dup_spans",       // dense gram self-join (equi, AQE skew) + island window
      "q100_edit_verified_pairs", // per-PAIR levenshtein over the artifact graph
      "q102_scd2_intervals", // two window passes over ONE key shuffle
      "q103_cdc_diff",       // single full-outer key join, struct-packed compare
      "q107_funnel",         // stage aggregates co-partitioned on user_id
      "q109_distribution_drift", // conditional agg; window only over 20 bucket rows
      "q110_interval_overlap", // both-sides bucket explode + hash equi-join
      "q111_weighted_sample", // integer-exact admission: codegen'd filter, no shuffle
      "q112_sketch_reagg",   // partial-agg HLL sketches, union re-agg
      "q114_source_overlap", // gram scan -> k sketch rows -> k² cross
      "q116_sequence_pattern", // one user shuffle; in-array sort per history
      "q117_dup_pagerank",   // iterative join+agg over checkpointed edges
      "q118_forward_fill",   // single window pass, LOCF frame
      "q119_dup_spans_scaled", // winnow fp equi-join -> pair-keyed verify joins
      "q121_merge_upsert",   // pruned read + survivors anti-join, partition swap
      "q122_quality_model",  // explode -> broadcast weight join -> agg
      "q126_bloom_semi",     // bloom probe INSIDE the scan stage, pre-shuffle
      "q127_bloom_anti",     // bloom-negative bypass + exact anti on suspects
      // snapshot tier (the returned frame's plan; the publish/merge side
      // effects run first — audited for shape, not timed here)
      "q128_snapshot_travel", // manifest-listed scan, no directory listing
      "q129_snapshot_incremental", // O(new files) delta scan
      "q133_snapshot_evolution", // evolved-schema union read
      "q134_snapshot_merge", // CoW MERGE result: pruned probe + anti-join
      "q136_snapshot_changes", // CDF: added/removed file scans, key diff
      "q137_snapshot_compact", // post-compaction scan over merged files
      "q138_snapshot_skipping", // stats-pruned range read (in-row `pruned` pin)
      "q139_incremental_view", // O(changes) view apply: full-outer on group keys
      "q141_zorder_skipping", // 2-D z-order pruning (in-row `pruned` pin)
      "q142_stats_only_agg", // metadata-only: LocalRelation, no scan at all
      "q143_bloom_pointlookup", // footer-bloom pruned IN lookup
      "q144_snapshot_delete", // CoW DELETE: touched-file probe + rewrite
      "q145_snapshot_update", // CoW UPDATE: assignments over touched files
      "q146_mor_delete",     // merge-on-read: seq-scoped dv anti-join
      "q147_dsv2_read",      // DSv2 scan: pushed filters prune manifest files
      "q149_dsv2_stats_agg", // DSv2 agg pushdown: metadata-only single-row scan
      "q150_dsv2_runtime_prune", // DSv2 runtime filter: DPP re-plans the fact scan
      "q151_sql_catalog",    // SQL VERSION AS OF through the TableCatalog
      "q161_spj_join",       // storage-partitioned join: zero exchanges, zero sorts
      "q162_grouped_stats_agg", // grouped metadata-only aggregate: rows, no scan
      "q164_clustered_dml",  // layout survives SQL UPDATE: still shuffle-free
      "q165_topn_pushdown",  // ORDER BY DESC LIMIT plans one band's files
      "q167_composite_spj",  // two-column cluster key: zero-shuffle join
      "q168_upsert_locality", // envelope-pruned merge + banded aggregate
      "q170_widen_alter",    // one scan over pre- and post-widening files
      "q171_stream_upsert")  // post-upsert-stream scan of the merged table

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val out = args.lift(1).getOrElse("/tmp/plans.txt")
    val spark = SparkEnv.session("graft-plans", 8)
    val sb = new StringBuilder
    interesting.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      sb.append(s"\n===== $name =====\n")
      sb.append(df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    Files.writeString(Paths.get(out), sb.toString)
    println(s"plans written to $out")
    spark.stop()
  }
}
