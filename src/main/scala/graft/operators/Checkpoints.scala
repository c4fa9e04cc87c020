package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD

/** Storage hygiene for iterative plans built on `localCheckpoint()`.
  *
  * `Dataset.unpersist()` is a NO-OP for checkpointed datasets: the
  * checkpoint persists its data at the RDD level, which the SQL
  * CacheManager (the thing `Dataset.unpersist` talks to) never sees.
  * Iterative operators that checkpoint every round therefore leak one
  * full copy of their state per iteration unless the superseded RDD is
  * unpersisted directly — at 100 TB that is ten live copies of the rank
  * table instead of two, and on a warm shared JVM the accumulated blocks
  * evict everything else (the q117 warm-run regression).
  */
object Checkpoints {

  /** Free the block-manager storage behind a `localCheckpoint()`ed
    * DataFrame by unpersisting the underlying checkpoint RDD(s). Safe to
    * call only once no downstream plan will read `df` again — the
    * lineage is truncated, so the blocks are NOT recomputable.
    */
  def release(df: DataFrame): Unit =
    df.queryExecution.analyzed.foreach {
      case l: LogicalRDD => l.rdd.unpersist(blocking = false)
      case _             => ()
    }
}
