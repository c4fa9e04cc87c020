package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan

/** Physical-plan inspection shared by evidence queries and specs. All
  * walks DESCEND into adaptive query stages: under AQE the interesting
  * nodes live in `QueryStageExec.plan` / `AdaptiveSparkPlanExec
  * .executedPlan`, which are FIELDS of leaf wrappers — a plain
  * `plan.collect` over children silently sees none of them, turning a
  * pinned invariant into a vacuous pass.
  */
object PlanOps {

  private def walk[A](p: SparkPlan)(pf: PartialFunction[SparkPlan, A]): Seq[A] = {
    val self = pf.lift(p).toSeq
    val kids = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        Seq(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => Seq(q.plan)
      case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec => Seq(r.child)
      case other => other.children
    }
    self ++ kids.flatMap(walk(_)(pf))
  }

  /** Shuffle exchanges anywhere in the (possibly adaptive) plan. */
  def shuffleCount(df: DataFrame): Int =
    walk(df.queryExecution.executedPlan) {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => e
    }.size

  /** Local sorts anywhere in the (possibly adaptive) plan. */
  def sortCount(df: DataFrame): Int =
    walk(df.queryExecution.executedPlan) {
      case s: org.apache.spark.sql.execution.SortExec => s
    }.size

  /** Files planned across every DSv2 scan in the (possibly adaptive)
    * plan — the evidence counter for file-pruning flags. A plain
    * `executedPlan.collect` works only while the plan happens to avoid
    * AQE wrapping (e.g. TakeOrderedAndProject with no exchange); any
    * exchange-introducing change would silently yield 0 and flip a
    * pinned pruning flag, so evidence queries must use this walk.
    */
  def plannedScanFiles(df: DataFrame): Int =
    walk(df.queryExecution.executedPlan) {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
        b.inputPartitions.collect {
          case fp: org.apache.spark.sql.execution.datasources.FilePartition =>
            fp.files.length
        }.sum
    }.sum

  /** True iff the plan contains at least one DSv2 scan and EVERY one of
    * them is a metadata-answered (`METADATA-ONLY`) scan. False on a plan
    * with no scans at all — a regressed pushdown must fail the flag, not
    * vacuously pass it.
    */
  def metadataOnly(df: DataFrame): Boolean = {
    val scans = walk(df.queryExecution.executedPlan) {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }
    scans.nonEmpty && scans.forall(_.scan.description().contains("METADATA-ONLY"))
  }
}
