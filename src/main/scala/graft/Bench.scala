package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every `SparkEntry.queries` entry `k` times against
  * `SPARK_GRAFT_SF_DIR` and emits ONE JSON line.
  *
  * Robustness contract (a bench artifact that can lie is worse than none):
  *   - a query that THROWS is recorded in `"failures"` with its error —
  *     never as a fast success — and the process exits non-zero;
  *   - each query's recorded time is the MIN of `k` runs (default 3,
  *     `SPARK_GRAFT_BENCH_K`): min is the standard noise-floor estimator —
  *     a single run can absorb a GC/JIT spike and distort a whole round
  *     (an earlier artifact recorded 13.2 s for a query that measures
  *     1.18 s fresh);
  *   - `"queries_runs"` keeps every raw timing so variance stays visible.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val k = sys.env.getOrElse("SPARK_GRAFT_BENCH_K", "3").toInt
    val spark = SparkEnv.configure(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // materialize to the noop sink: every column is computed and serialized
    // (under .count() Catalyst prunes unused projections, so pure projection
    // queries would go partially unmeasured)
    def materialize(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    // warm-up: JVM/codegen/parquet-footer costs land here, not on the first
    // timed query (measured ~3.5s on a cold session)
    spark.range(1000000).selectExpr("sum(id)").collect()
    SparkEntry.queries.headOption.foreach { case (_, fn) =>
      try materialize(fn(spark, sfDir)) catch { case _: Throwable => () }
    }
    def esc(s: String): String =
      s.replace("\\", "\\\\").replace("\"", "\\\"").replace("\n", " ").take(300)
    // SPARK_GRAFT_ONLY=q101_x,q102_y restricts the run (single-query
    // iteration); the recorded artifact notes the filter via "sf" + names
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").map(_.trim).toSet)
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .map { case (name, fn) =>
      val outcomes = (1 to k).map { _ =>
        val t0 = System.nanoTime()
        try { materialize(fn(spark, sfDir)); Right((System.nanoTime() - t0) / 1e9) }
        catch { case e: Throwable => Left(s"${e.getClass.getSimpleName}: ${e.getMessage}") }
      }
      (name, outcomes.collect { case Right(t) => t }, outcomes.collectFirst { case Left(m) => m })
    }
    val failures = results.collect { case (name, _, Some(err)) =>
      s"""{"query":"$name","error":"${esc(err)}"}"""
    }
    val ok = results.filter(_._3.isEmpty)
    val qs = ok.map { case (n, ts, _) => s"\"$n\":${ts.min}" }.mkString("{", ",", "}")
    val runs = ok.map { case (n, ts, _) => s"\"$n\":[${ts.mkString(",")}]" }
      .mkString("{", ",", "}")
    val total = ok.map(_._2.min).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","k":$k,""" +
      s""""queries":$qs,"queries_runs":$runs,""" +
      s""""failures":[${failures.mkString(",")}],"sf":"$sfDir"}""")
    spark.stop()
    if (failures.nonEmpty) sys.exit(1)
  }
}
