package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join: for every left row, the single latest right
  * row with `right.time <= left.time` on an equal key — the canonical
  * event-enrichment operator (each event sees the dimension state that was
  * current when it happened).
  *
  * Spark has no built-in as-of join, and the naive forms both die at
  * scale: a range-condition join degenerates to a per-key cross product,
  * and "join then pick max time" materializes every (event, older-row)
  * pair before discarding all but one. This implementation is the
  * sort-merge shape instead: UNION the two inputs, shuffle ONCE on the
  * key, sort each partition by (time, side), and carry the most recent
  * right payload forward with a running `last(_, ignoreNulls)` window.
  * Cost is one shuffle + one sort — identical to a regular sort-merge
  * join of the same inputs — and output is exactly one row per left row.
  * A right row at exactly the left row's time IS visible (>= semantics):
  * right rows sort before left rows at equal timestamps.
  *
  * Hot keys concentrate one partition's sort, like any sort-merge join;
  * AQE skew handling applies because the shuffle is an ordinary hash
  * repartition on the key.
  */
object AsOfJoin {

  /** @param payloadCols right-side columns to attach (as `asof_<name>`)
    * @param joinType "inner" (drop left rows with no earlier right row —
    *                 DuckDB/pandas ASOF default) or "left" (keep, nulls)
    */
  def asofJoin(left: DataFrame, right: DataFrame, leftKey: String,
      rightKey: String, leftTime: String, rightTime: String,
      payloadCols: Seq[String], joinType: String = "inner",
      prefix: String = "asof_"): DataFrame = {
    require(joinType == "inner" || joinType == "left",
      s"asofJoin supports inner|left, not $joinType")

    val payload = struct(payloadCols.map(col): _*)
    val payloadType = right.select(payload).schema.head.dataType
    val rowStruct = struct(left.columns.map(col).toIndexedSeq: _*)
    val rowType = left.select(rowStruct).schema.head.dataType

    val l = left.select(
      col(leftKey).as("__k"), col(leftTime).cast("timestamp").as("__t"),
      lit(1).as("__side"),
      lit(null).cast(payloadType).as("__payload"),
      rowStruct.as("__row"))
    val r = right.select(
      col(rightKey).as("__k"), col(rightTime).cast("timestamp").as("__t"),
      lit(0).as("__side"),
      payload.as("__payload"),
      lit(null).cast(rowType).as("__row"))

    // running latest-right-payload per key; right rows win ties at equal
    // time because __side orders them first
    val w = Window.partitionBy("__k").orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = l.unionByName(r)
      .withColumn("__m", last(col("__payload"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)

    val kept = if (joinType == "inner") matched.filter(col("__m").isNotNull) else matched
    val out = payloadCols.map(c => col(s"__m.$c").as(s"$prefix$c"))
    kept.select(col("__row.*") +: out: _*)
  }
}
