package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus mixing under budgets — the "assemble a training mix" step of a
  * data pipeline: per source/language/domain cell, admit documents in a
  * deterministic order until a token (or byte, or document) budget is
  * reached.
  *
  * Both forms are one window pass: shuffle by the group columns, sort by
  * the order column inside each group — the same plan shape as any
  * per-key top-k, so they scale with the corpus and never collect. The
  * order column makes the mix REPRODUCIBLE (same corpus version + same
  * budgets → byte-identical mix), which is what makes training runs
  * comparable.
  */
object CorpusMix {

  /** Keep each group's prefix (in `orderCol` order) whose RUNNING sum of
    * `weight` stays ≤ `budget` — token-budget admission. A first row
    * already over budget is dropped (no partial documents).
    */
  def takeUntilBudget(df: DataFrame, groupCols: Seq[Column], orderCol: Column,
      weight: Column, budget: Long): DataFrame = {
    val w = Window.partitionBy(groupCols: _*).orderBy(orderCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("__cum", sum(weight).over(w))
      .filter(col("__cum") <= budget)
      .drop("__cum")
  }

  /** Keep each group's first `n` rows in `orderCol` order — document-count
    * quotas (the "30% code / 50% web" mix expressed as absolute counts).
    */
  def takeQuota(df: DataFrame, groupCols: Seq[Column], orderCol: Column,
      n: Long): DataFrame = {
    val w = Window.partitionBy(groupCols: _*).orderBy(orderCol)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= n)
      .drop("__rn")
  }
}
