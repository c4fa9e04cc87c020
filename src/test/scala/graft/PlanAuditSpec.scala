package graft

import org.scalatest.funsuite.AnyFunSuite

/** Structural scale audit: walk every plan in [[Plans.interesting]] and
  * assert that no UNDECLARED cartesian product or broadcast nested-loop
  * join appears — the "no accidental O(n²)" guarantee, enforced on every
  * `sbt test` instead of by a human diffing the plan dump. A query that
  * legitimately needs a full cross (an exact brute-force baseline, or a
  * 1-row-aggregate broadcast) must DECLARE itself below, so a future
  * edit that silently degrades an equi-join into a nested loop fails the
  * suite.
  */
class PlanAuditSpec extends AnyFunSuite {
  import SparkTestEnv._

  /** Queries whose plans carry a DECLARED nested-loop/cartesian:
    *  - q36/q62: exact brute-force top-k baselines (query set broadcast,
    *    corpus streamed — the correctness baseline, not the scale path)
    *  - q68: the ADC scan over 8×-compressed PQ codes (declared full
    *    scan; the re-rank stage is bounded equi-joins)
    *  - q94: a calendar frame crossed with a 1-row aggregate
    *  - q109: per-bin CDF normalized by 1-row total aggregates
    *  - q79: the corpus-stats 1-row aggregate broadcast into scoring
    *    (`Bm25.scala:62`)
    *  - q86: the two 1-row distribution totals (`Dsir.scala:64,68`)
    *  - q114: k kilobyte-sized per-source sketch rows crossed k²
    *    (`Decontaminate.scala:68` — the design: sketch crosses instead
    *    of gram self-joins)
    */
  private val declared = Map(
    "q36_ann_topk" -> 1,
    "q62_ann_quantized" -> 1,
    "q68_ann_pq" -> 1,
    "q79_bm25" -> 1,
    "q86_dsir_weights" -> 2,
    "q94_calendar_gap_fill" -> 2,
    "q109_distribution_drift" -> 3,
    "q114_source_overlap" -> 1)

  test("no undeclared cartesian/nested-loop join in any audited plan") {
    val bad = Seq.newBuilder[String]
    // snapshot-tier builders delete/re-publish deterministic scratch
    // roots, so walking them must not overlap QueriesSpec's walk
    SparkTestEnv.queryWalkLock.synchronized {
      Plans.interesting.foreach { name =>
        val df = SparkEntry.queries(name)(spark, sf)
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.SimpleMode)
        val n = "CartesianProduct|BroadcastNestedLoopJoin".r.findAllIn(plan).size
        val allowed = declared.getOrElse(name, 0)
        if (n > allowed)
          bad += s"$name: $n nested-loop/cartesian nodes (declared $allowed)"
      }
    }
    val violations = bad.result()
    assert(violations.isEmpty, violations.mkString("\n"))
  }
}
