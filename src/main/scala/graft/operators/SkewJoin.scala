package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join for extreme key skew — the manual fallback when AQE's
  * skew-join splitting (enabled engine-wide in SparkEnv) isn't enough,
  * e.g. one key holding >10% of a 100 TB fact table.
  *
  * The build side replicates each row `salt` times with salt ids 0..n-1;
  * the probe side tags each row with a deterministic salt from a hash of
  * its other columns — so each hot key's rows spread over `salt` reducers
  * instead of one. Join key becomes (key, salt). Result rows are identical
  * to the unsalted join (each probe row meets exactly one build replica).
  */
object SkewJoin {

  /** left ⋈ right on `key`, left treated as the (large, skewed) probe side,
    * right as the (smaller) build side that gets replicated `salt` times.
    */
  private val soundJoinTypes =
    Set("inner", "left", "left_outer", "leftouter", "left_semi", "leftsemi", "left_anti", "leftanti")

  /** @param saltCols probe-side columns hashed (together with `key`) into
    *                  the salt. The salt only needs to be deterministic and
    *                  roughly uniform WITHIN a hot key, so one narrow
    *                  discriminator column (a line number, a sub-id) is
    *                  enough — hashing every probe column costs a wide
    *                  struct hash per row for no extra correctness. Empty
    *                  (the default) falls back to hashing all columns.
    */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String, salt: Int,
      joinType: String = "inner", saltCols: Seq[String] = Nil): DataFrame = {
    require(salt > 0)
    // right/full outer are unsound under salting: an unmatched build-side
    // row was replicated `salt` times and every replica would survive the
    // outer join, multiplying it `salt`-fold vs the plain join.
    require(soundJoinTypes.contains(joinType.toLowerCase),
      s"saltedJoin supports $soundJoinTypes, not $joinType")
    val saltedRight = right
      .withColumn("__salt", explode(sequence(lit(0), lit(salt - 1))))
    val hashed = if (saltCols.nonEmpty) key +: saltCols else left.columns.toSeq
    val saltedLeft = left
      // deterministic pseudo-random salt per probe row
      .withColumn("__salt", pmod(xxhash64(hashed.map(col).toIndexedSeq: _*), lit(salt)).cast("int"))
    saltedLeft.join(saltedRight, Seq(key, "__salt"), joinType).drop("__salt")
  }
}
