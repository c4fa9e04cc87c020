package graft

import graft.operators.Expectations
import graft.operators.Expectations._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the expectation operator's semantics the q130 oracle can't
  * isolate: NULL handling per check kind, the gate's pass/throw
  * behavior, and the one-aggregate plan shape.
  */
class ExpectationsSpec extends AnyFunSuite {
  import SparkTestEnv._

  private def df = {
    import spark.implicits._
    Seq(
      (1L, Some("a"), Some(5.0)),
      (2L, Some("b"), Some(-1.0)),
      (2L, None, Some(15.0)),
      (3L, Some("z"), None)
    ).toDF("id", "tag", "score")
  }

  test("per-check NULL and violation semantics match the contract") {
    val rep = Expectations.report(df, Seq(
      NotNull("tag"),                       // 1 null
      Unique(Seq("id")),                    // id=2 twice -> 1 violation
      InRange("score", lit(0.0), lit(10.0)), // -1 out, 15 out, NULL counts -> 3
      InSet("tag", Seq("a", "b")),          // "z" out, NULL out -> 2
      Satisfies("score_present_pos", col("score") > 0) // -1 fails, NULL fails -> 2
    )).collect().map(r => r.getString(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(rep("not_null:tag") == ((1L, false)))
    assert(rep("unique:id") == ((1L, false)))
    assert(rep("in_range:score") == ((3L, false)))
    assert(rep("in_set:tag") == ((2L, false)))
    assert(rep("satisfies:score_present_pos") == ((2L, false)))
  }

  test("empty input: zero violations, everything passes") {
    val rep = Expectations.report(df.limit(0), Seq(
      NotNull("tag"), Unique(Seq("id")),
      InRange("score", lit(0.0), lit(10.0))))
      .collect()
    assert(rep.length == 3)
    assert(rep.forall(r => r.getLong(1) == 0L && r.getBoolean(2)))
  }

  test("gate passes clean data through and throws on violations, naming them") {
    val clean = df.filter(col("tag").isNotNull && col("id") =!= 2L)
    assert(Expectations.gate(clean, Seq(NotNull("tag"), Unique(Seq("id"))))
      .count() == clean.count())
    val ex = intercept[IllegalStateException](
      Expectations.gate(df, Seq(NotNull("tag"), Unique(Seq("id")))))
    assert(ex.getMessage.contains("not_null:tag"))
    assert(ex.getMessage.contains("unique:id"))
  }

  test("duplicate check names are rejected") {
    intercept[IllegalArgumentException](
      Expectations.report(df, Seq(NotNull("tag"), NotNull("tag"))))
  }

  test("split quarantines exactly the violating rows, first failing check named") {
    val checks = Seq(
      NotNull("tag"),
      Unique(Seq("id")),
      InRange("score", lit(0.0), lit(10.0)))
    val (good, bad) = Expectations.split(df, checks)
    // exact partition, nothing dropped
    assert(good.count() + bad.count() === df.count())
    // the surviving side passes EVERY check
    assert(Expectations.report(good, checks).filter(!col("passed")).count() === 0)
    // first-failing attribution: id=2/None row violates not_null AND
    // unique — not_null (declared first) wins; its id=2 twin is only a
    // unique violation... but quarantining one copy de-duplicates the
    // survivor side, so BOTH copies must be in `bad`
    val reasons = bad.select("id", "violation").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toSet
    assert(reasons === Set(
      2L -> "not_null:tag",          // null tag (beats unique)
      2L -> "unique:id",             // the non-null twin: dup key
      3L -> "in_range:score"))       // NULL score violates the range
    // id=1 (clean) survived; id=2 rows are gone from good entirely
    assert(good.select("id").collect().map(_.getLong(0)).toSet === Set(1L))
    // a row violating Satisfies-NULL quarantines (unknown is not a pass)
    val (g2, b2) = Expectations.split(df,
      Seq(Satisfies("pos_score", col("score") > 0)))
    assert(b2.filter(col("id") === 3L).count() === 1)
    assert(g2.count() === 2) // 5.0 and... -1 fails, NULL fails, 15 passes
  }

  test("report is one scan: a single Aggregate over the source") {
    val plan = Expectations.report(df, Seq(
      NotNull("tag"), InRange("score", lit(0.0), lit(10.0)),
      Satisfies("pos", col("score") > 0)))
      .queryExecution.optimizedPlan
    val aggs = plan.collect {
      case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a
    }
    assert(aggs.size == 1, s"expected one Aggregate, got:\n$plan")
  }
}
