package graft

import graft.operators.HeavyHitters
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins HeavyHitters beyond the q132 oracle (whose fixture vocabulary is
  * smaller than m, so its Misra–Gries pass never evicts): a skewed
  * corpus with vocabulary ≫ m must still return the EXACT top-k, and an
  * m too small for the distribution must refuse rather than return a
  * best-effort answer.
  */
class HeavyHittersSpec extends AnyFunSuite {
  import SparkTestEnv._

  /** Zipf-ish skew over a wide key space: head tokens h0..h{heads-1}
    * with count (heads - i) * scale, plus `tailN` singletons.
    */
  private def skewed(heads: Int, scale: Int, tailN: Int) = {
    import spark.implicits._
    val head = (0 until heads).flatMap(i => Seq.fill((heads - i) * scale)(f"h$i%03d"))
    val tail = (0 until tailN).map(i => s"tail_$i")
    (head ++ tail).toDF("token").repartition(8) // spread across partitions
  }

  test("exact top-k with eviction: vocabulary far exceeds m") {
    val df = skewed(heads = 30, scale = 20, tailN = 5000) // vocab 5030, m 64
    val got = HeavyHitters.topK(spark, df, "token", k = 10, m = 64)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val want = (0 until 10).map(i => (f"h$i%03d", (30L - i) * 20))
    assert(got.toSeq == want, "must equal the exact top-10, in (cnt desc, token) order")
  }

  test("certificate refuses when m cannot separate head from tail") {
    // near-uniform: every token appears twice; no k-th count can clear n/(m+1)
    import spark.implicits._
    val df = (0 until 2000).flatMap(i => Seq(s"t$i", s"t$i")).toDF("token").repartition(8)
    val ex = intercept[IllegalStateException](
      HeavyHitters.topK(spark, df, "token", k = 5, m = 16))
    assert(ex.getMessage.contains("raise m"))
  }

  test("no-eviction path certifies unconditionally, even below k results") {
    import spark.implicits._
    // 3 distinct tokens, k=10: fewer results than k is fine when nothing evicted
    val df = Seq("a", "a", "a", "b", "b", "c").toDF("token")
    val got = HeavyHitters.topK(spark, df, "token", k = 10, m = 64)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(got.toSeq == Seq(("a", 3L), ("b", 2L), ("c", 1L)))
  }

  test("empty and all-null input yields an empty, well-typed result") {
    import spark.implicits._
    val empty = Seq.empty[String].toDF("token")
    assert(HeavyHitters.topK(spark, empty, "token", k = 3, m = 8).isEmpty)
    val nulls = Seq[Option[String]](None, None).toDF("token")
    val r = HeavyHitters.topK(spark, nulls, "token", k = 3, m = 8)
    assert(r.isEmpty && r.columns.sameElements(Array("token", "cnt")))
  }

  test("recount plan is a broadcast semi join, never an In/InSet literal list") {
    import spark.implicits._
    val toks = Seq("a", "a", "b", "c").toDF("token")
    val cands = (0 until 600).map(i => s"c$i") :+ "a" // large enough that no In-set shortcut fires
    val plan = HeavyHitters.recount(spark, toks, "token", cands)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      s"expected a broadcast join in:\n$plan")
    assert(!plan.contains("InSet") && !plan.contains(" IN ("),
      s"candidate list must not appear as a literal In/InSet:\n$plan")
    // and the counts are right
    val got = HeavyHitters.recount(spark, toks, "token", cands).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(got == Map("a" -> 2L))
  }

  test("ties at the k-th position break by token ascending on both paths") {
    import spark.implicits._
    val df = Seq("z", "z", "y", "y", "x", "x", "w").toDF("token")
    val got = HeavyHitters.topK(spark, df, "token", k = 2, m = 32)
      .collect().map(_.getString(0))
    assert(got.toSeq == Seq("x", "y"), "x and y tie at 2; ascending token wins")
  }
}
