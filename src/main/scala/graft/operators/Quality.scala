package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Observation}
import org.apache.spark.sql.functions._

/** In-flight data-quality checks: row-level predicates whose VIOLATION
  * counts ride an existing job as `observe` metrics — zero extra scans,
  * the generalization of the reference's check-after-every-partition
  * posture (README.md:43) from "files arrived" to "rows are sane".
  *
  * Checks never block the data path (the reference alerted and moved on,
  * TransTablePartition.java:126-131; failing a 100 TB write because 12
  * rows have a null is the wrong default) — violations are counted
  * in-flight and reported/alerted after the action. Callers wanting
  * hard-fail semantics can throw on the returned counts.
  */
object Quality {

  /** A named row-level expectation: `violated` marks a BAD row. */
  final case class Check(name: String, violated: Column)

  object Check {
    def notNull(col: Column, name: String): Check = Check(name, col.isNull)
    def inRange(c: Column, lo: Any, hi: Any, name: String): Check =
      Check(name, c.isNull || c < lit(lo) || c > lit(hi))
    def matches(c: Column, regex: String, name: String): Check =
      Check(name, c.isNull || !c.rlike(regex))
  }

  /** Violation-count metrics for `checks`, as observe aggregates to
    * attach to an existing Observation (shared with whatever else the
    * job observes — one metrics node, one pass).
    */
  private[operators] def metrics(checks: Seq[Check]): Seq[Column] =
    checks.map(c => count(when(c.violated, 1)).as(s"qc_${c.name}"))

  /** Violation counts per check from a completed Observation (zero for
    * checks that registered no metric — an empty write observes nothing).
    */
  private[operators] def violations(obs: Observation,
      checks: Seq[Check]): Map[String, Long] =
    checks.map(c => c.name ->
      obs.get.get(s"qc_${c.name}").fold(0L)(_.asInstanceOf[Long])).toMap

  /** Standalone form: run `action` on the observed frame, return the
    * violation counts, alerting one message per violated check.
    */
  def checked(df: DataFrame, checks: Seq[Check],
      alerter: Alerter = Alerter.Log)(action: DataFrame => Unit): Map[String, Long] = {
    require(checks.nonEmpty, "at least one check")
    val obs = new Observation()
    val ms = metrics(checks)
    action(df.observe(obs, ms.head, ms.tail: _*))
    report(violations(obs, checks), alerter)
  }

  /** Standalone profile as DATA: one row per check — (check_name,
    * violations, n_rows). One aggregation pass over the frame; use
    * [[checked]] / the Migrate `checks` param instead when a job is
    * already scanning the data (this form pays its own scan).
    */
  def profile(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "at least one check")
    val wide = df.agg(count(lit(1)).as("n_rows"),
      checks.map(c => count(when(c.violated, 1)).as(s"qc_${c.name}")): _*)
    // unpivot the single wide row to (check_name, violations, n_rows)
    val stacked = checks.map(c =>
      struct(lit(c.name).as("check_name"), col(s"qc_${c.name}").as("violations")))
    wide.select(explode(array(stacked: _*)).as("c"), col("n_rows"))
      .select(col("c.check_name"), col("c.violations"), col("n_rows"))
  }

  /** Streaming form: attach checks as a NAMED observe node — violation
    * counts surface per micro-batch in `StreamingQueryProgress
    * .observedMetrics` (read them with [[fromProgress]]), so a long-lived
    * ingest job reports data health continuously with zero extra state
    * and zero extra scans.
    */
  def observedStream(df: DataFrame, checks: Seq[Check],
      name: String = "quality"): DataFrame = {
    require(checks.nonEmpty, "at least one check")
    df.observe(name, count(lit(1)).as("rows"), metrics(checks): _*)
  }

  /** Violation counts from one micro-batch's progress, or None if the
    * batch carried no observation (e.g. an empty trigger).
    */
  def fromProgress(p: org.apache.spark.sql.streaming.StreamingQueryProgress,
      checks: Seq[Check], name: String = "quality"): Option[Map[String, Long]] =
    Option(p.observedMetrics.get(name)).map { row =>
      checks.map(c => c.name -> row.getAs[Long](s"qc_${c.name}")).toMap
    }

  private[operators] def report(counts: Map[String, Long],
      alerter: Alerter): Map[String, Long] = {
    counts.toSeq.sortBy(_._1).foreach { case (name, n) =>
      if (n > 0) alerter.alert("quality.violation", s"check '$name': $n violating row(s)")
    }
    counts
  }
}
