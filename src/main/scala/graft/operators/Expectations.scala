package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality expectations evaluated in ONE pass over the
  * table — the pre-flight gate a training pipeline runs before it trusts
  * a corpus drop (the reference's post-copy verification generalized
  * from "same file names/sizes" — `CommonUtils.java:99-124` — to
  * semantic row-level constraints).
  *
  * Design for 100 TB: every non-uniqueness check folds into a single
  * aggregate over one scan (conditional sums — map-side partial, no
  * extra shuffle beyond the final 1-row reduce); uniqueness checks add
  * their distinct-count to the SAME aggregate (Spark plans the
  * count-distinct expansion alongside the plain sums). The report is
  * assembled by exploding the 1-row aggregate — no driver collect, so
  * the report composes into larger plans (e.g. gate-then-write).
  */
object Expectations {

  /** One named constraint: `violations` counts rows failing it. */
  sealed trait Check { def name: String }

  /** Rows where `column` IS NULL violate. */
  final case class NotNull(column: String) extends Check {
    val name = s"not_null:$column"
  }

  /** Row count minus distinct count of the key tuple (0 = key is unique).
    * Key columns must be non-null (use [[NotNull]] alongside).
    */
  final case class Unique(columns: Seq[String]) extends Check {
    val name = s"unique:${columns.mkString(",")}"
  }

  /** Rows outside [lo, hi] (inclusive) or NULL violate. */
  final case class InRange(column: String, lo: Column, hi: Column) extends Check {
    val name = s"in_range:$column"
  }

  /** Rows whose value is not one of `values` (or NULL) violate. */
  final case class InSet(column: String, values: Seq[String]) extends Check {
    val name = s"in_set:$column"
  }

  /** Rows where `predicate` is not TRUE violate (NULL counts as a
    * violation — an unknown is not a pass).
    */
  final case class Satisfies(label: String, predicate: Column) extends Check {
    val name = s"satisfies:$label"
  }

  private def violationExpr(c: Check): Column = c match {
    case NotNull(col0) =>
      sum(when(col(col0).isNull, 1L).otherwise(0L))
    case Unique(cols) =>
      count(lit(1)) - countDistinct(struct(cols.map(col): _*))
    case InRange(col0, lo, hi) =>
      sum(when(col(col0).isNull || col(col0) < lo || col(col0) > hi, 1L).otherwise(0L))
    case InSet(col0, values) =>
      sum(when(col(col0).isin(values.map(v => v: Any): _*), 0L).otherwise(1L))
    case Satisfies(_, pred) =>
      sum(when(pred, 0L).otherwise(1L))
  }

  /** Evaluate `checks` over `df` in one aggregate pass. Returns one row
    * per check: (check_name, violations, passed).
    */
  def report(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "at least one check required")
    require(checks.map(_.name).distinct.size == checks.size,
      s"duplicate check names: ${checks.map(_.name)}")
    val aggs = checks.map(c => violationExpr(c).cast("long").as(c.name))
    val one = df.agg(aggs.head, aggs.tail: _*)
    // explode the 1-row aggregate into the report shape — stays a plan,
    // no driver hop; backticks guard punctuation in check names
    val rows = checks.map { c =>
      struct(lit(c.name).as("check_name"),
        coalesce(col(s"`${c.name}`"), lit(0L)).as("violations"),
        (coalesce(col(s"`${c.name}`"), lit(0L)) === 0L).as("passed"))
    }
    one.select(explode(array(rows: _*)).as("r")).select("r.*")
  }

  /** Per-ROW violation predicate for a check. [[Unique]] marks EVERY
    * row of a duplicated key tuple (one window shuffle on the key —
    * dropping all copies is what makes the surviving side actually
    * unique; keeping "the first" would be a silent arbitrary choice).
    */
  private def rowViolation(c: Check): Column = c match {
    case NotNull(col0) => col(col0).isNull
    case Unique(cols) =>
      count(lit(1)).over(org.apache.spark.sql.expressions.Window
        .partitionBy(cols.map(col): _*)) > 1
    case InRange(col0, lo, hi) =>
      col(col0).isNull || col(col0) < lo || col(col0) > hi
    case InSet(col0, values) =>
      !coalesce(col(col0).isin(values.map(v => v: Any): _*), lit(false))
    case Satisfies(_, pred) => !coalesce(pred, lit(false))
  }

  /** Row-level QUARANTINE split — the dead-letter idiom: `(good, bad)`
    * where `bad` carries a `violation` column naming the FIRST failing
    * check in declaration order (the [[FilterPipeline]] first-failing-
    * gate discipline; a row violating several checks is counted once,
    * so per-violation tallies over `bad` can differ from [[report]]'s
    * independent per-check counts). good ∪ bad ≡ the input, and
    * [[report]] over `good` passes every check by construction —
    * publish `good`, land `bad` in a quarantine table with its reasons,
    * and nothing is silently dropped. One pass; plus one window shuffle
    * per [[Unique]] check.
    */
  def split(df: DataFrame, checks: Seq[Check]): (DataFrame, DataFrame) = {
    require(checks.nonEmpty, "at least one check required")
    require(checks.map(_.name).distinct.size == checks.size,
      s"duplicate check names: ${checks.map(_.name)}")
    require(!df.columns.contains("violation"),
      "input already has a 'violation' column")
    val firstBad = checks.foldRight(lit(null).cast("string")) { (c, acc) =>
      when(rowViolation(c), lit(c.name)).otherwise(acc)
    }
    val flagged = df.withColumn("violation", firstBad)
    (flagged.filter(col("violation").isNull).drop("violation"),
      flagged.filter(col("violation").isNotNull))
  }

  /** Gate form: returns `df` untouched if every check passes, else
    * throws with the failing report rows — the "refuse to publish a bad
    * corpus drop" composition. The report aggregate is a separate
    * (cheap, 1-row) action; `df` itself is not cached or re-planned.
    */
  def gate(df: DataFrame, checks: Seq[Check]): DataFrame = {
    val bad = report(df, checks).filter(!col("passed")).collect()
    if (bad.nonEmpty) {
      val detail = bad.map(r => s"${r.getString(0)} (${r.getLong(1)} violations)")
      throw new IllegalStateException(
        s"expectation gate failed: ${detail.mkString("; ")}")
    }
    df
  }
}
