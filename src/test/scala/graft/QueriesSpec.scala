package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

object SparkTestEnv {
  lazy val spark: SparkSession = SparkEnv.session("graft-test", cores = 4)
  val sf = "/root/testdata/sf0.001"

  /** Suites that WALK the full query registry (QueriesSpec,
    * PlanAuditSpec) serialize on this: snapshot-tier builders delete and
    * re-publish their deterministic scratch roots, so two concurrent
    * walks of the SAME query race each other's files (sbt runs suites in
    * parallel). Suites touching only read-only or build-locked-artifact
    * queries need no lock.
    */
  val queryWalkLock = new Object
}

/** Smoke + invariant tests for every registered query at sf0.001.
  * Numeric oracle equivalence is checked by scripts/selfcheck.py (DuckDB);
  * these specs pin structural invariants that survive refactors.
  */
class QueriesSpec extends AnyFunSuite {
  import SparkTestEnv._

  test("all queries run and are non-empty at sf0.001") {
    SparkTestEnv.queryWalkLock.synchronized {
      SparkEntry.allQueries.foreach { q =>
        val df = q.run(spark, sf)
        val n = df.count()
        assert(n > 0, s"${q.name} returned 0 rows")
      }
    }
  }

  test("every oracle-checked query has matching column names (lowercase, sorted)") {
    SparkTestEnv.queryWalkLock.synchronized {
      SparkEntry.allQueries.filter(_.oracle.isDefined).foreach { q =>
        val cols = q.run(spark, sf).columns.toSeq
        assert(cols.map(_.toLowerCase).distinct.size == cols.size,
          s"${q.name} has duplicate/ambiguous column names: $cols")
      }
    }
  }

  test("q01 aggregates are consistent: avg*count ~ sum") {
    val r = SparkEntry.queries("q01_pricing_summary")(spark, sf).collect()
    r.foreach { row =>
      val sumQty = row.getAs[Double]("sum_qty")
      val avgQty = row.getAs[Double]("avg_qty")
      val n = row.getAs[Long]("count_order")
      assert(math.abs(sumQty - avgQty * n) < 1e-6 * math.abs(sumQty))
    }
  }

  test("q07 window topk: at most 3 rows per supplier, rn in 1..3") {
    val df = SparkEntry.queries("q07_window_topk")(spark, sf)
    val bad = df.groupBy("l_suppkey").count().filter("count > 3").count()
    assert(bad == 0)
    assert(df.filter("rn < 1 OR rn > 3").count() == 0)
  }

  test("q13/q14 partition customer keys") {
    val inter = SparkEntry.queries("q13_intersect_custkeys")(spark, sf).count()
    val cust = Tables.load(spark, sf, "customer").count()
    assert(inter <= cust)
  }

  test("q25 sessionize: session counts sum to event count") {
    val total = SparkEntry.queries("q25_sessionize")(spark, sf)
      .agg(org.apache.spark.sql.functions.sum("n_events")).collect()(0).getLong(0)
    assert(total == Tables.load(spark, sf, "events").count())
  }
}
