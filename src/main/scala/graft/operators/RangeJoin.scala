package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Range (point-in-interval) join at scale. Spark plans a raw range
  * condition — `p.ts >= i.start AND p.ts < i.end` — as a nested-loop join
  * (a per-key cross product when an equi-key exists, a full cartesian
  * product when not). This operator makes the join an EQUI-join instead:
  * every interval explodes into the fixed-width time buckets it overlaps,
  * each point maps to exactly one bucket, candidates come from a hash
  * join on (key, bucket), and the exact range predicate filters the
  * candidates. Cost scales with |points| + Σ interval_width/bucket — not
  * |points| × |intervals| — and each qualifying (point, interval) pair
  * appears exactly once because a point lives in exactly one bucket.
  *
  * `bucketSeconds` trades replication for candidate precision: pick it
  * near the typical interval width so each interval lands in a handful of
  * buckets.
  */
object RangeJoin {

  /** Inner-join `points` to `intervals` on equal `keyCol`s and
    * `start <= point < end`. Column names must not collide across inputs
    * (rename before calling); output carries both sides' columns.
    */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
      pointKey: String, intervalKey: String,
      pointCol: String, startCol: String, endCol: String,
      bucketSeconds: Long = 7L * 24 * 3600): DataFrame = {
    require(bucketSeconds > 0)
    // buckets at the timestamp's NATIVE (microsecond) precision — integer
    // math throughout. unix_timestamp would truncate to whole seconds,
    // silently dropping matches near bucket edges for sub-second data
    // (e.g. end 11:00:00.5 exclusive never generates the 11:00:00 bucket
    // that a point at 11:00:00.2 hashes to).
    val bucketMicros = bucketSeconds * 1000000L
    // to_timestamp keeps the historical call surface: date/string point or
    // interval columns coerce to timestamps (as they did under
    // unix_timestamp) instead of failing unix_micros analysis; on a
    // TimestampType input it is a no-op.
    def ts(c: Column): Column = to_timestamp(c)
    def bucket(c: Column): Column = floor(unix_micros(ts(c)) / bucketMicros)

    val p = points.withColumn("__b", bucket(col(pointCol)))
    val i = intervals
      // empty/inverted intervals produce no buckets; with end > start the
      // last bucket (of end − 1 µs, end being exclusive) is always ≥ the
      // first, so sequence() can never descend
      .filter(ts(col(endCol)) > ts(col(startCol)))
      .withColumn("__b", explode(sequence(
        bucket(col(startCol)),
        floor((unix_micros(ts(col(endCol))) - 1) / bucketMicros))))

    p.join(i, p("__b") === i("__b") && col(pointKey) === col(intervalKey))
      .filter(col(pointCol) >= col(startCol) && col(pointCol) < col(endCol))
      .drop("__b")
  }

  /** Interval-OVERLAP join: both sides are half-open intervals, matched
    * when they share an equal key and any instant
    * (`lStart < rEnd && rStart < lEnd`). Both sides explode to their
    * covering buckets and candidates come from the same (key, bucket)
    * hash join as [[pointInInterval]]. A pair overlapping several buckets
    * would match once per shared bucket, so the join keeps only the
    * bucket containing `greatest(lStart, rStart)` — the first instant of
    * the overlap, which lies inside BOTH intervals (starts are inclusive
    * and `max(start) < min(end)`), so exactly one shared bucket survives
    * per qualifying pair. Cost stays Σ width/bucket per side, never
    * |left| × |right|.
    */
  def intervalOverlap(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      lStart: String, lEnd: String, rStart: String, rEnd: String,
      bucketSeconds: Long = 7L * 24 * 3600): DataFrame = {
    require(bucketSeconds > 0)
    val bucketMicros = bucketSeconds * 1000000L
    def ts(c: Column): Column = to_timestamp(c)
    def bucket(c: Column): Column = floor(unix_micros(ts(c)) / bucketMicros)
    def explodeBuckets(df: DataFrame, s: String, e: String): DataFrame = df
      .filter(ts(col(e)) > ts(col(s)))
      .withColumn("__b", explode(sequence(
        bucket(col(s)),
        floor((unix_micros(ts(col(e))) - 1) / bucketMicros))))

    val l = explodeBuckets(left, lStart, lEnd)
    val r = explodeBuckets(right, rStart, rEnd)
    l.join(r, l("__b") === r("__b") && col(leftKey) === col(rightKey))
      .filter(col(lStart) < col(rEnd) && col(rStart) < col(lEnd))
      .filter(l("__b") === bucket(greatest(ts(col(lStart)), ts(col(rStart)))))
      .drop("__b")
  }
}
