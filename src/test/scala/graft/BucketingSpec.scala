package graft

import graft.operators.Bucketing
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Proves the bucketed layout actually removes the join shuffle: the
  * executed plan of a bucketed-⋈-bucketed join must contain no shuffle
  * exchange, and results must equal the plain join.
  */
class BucketingSpec extends AnyFunSuite {
  import SparkTestEnv._

  test("bucketed join plans without a shuffle and matches the plain join") {
    val li = Tables.load(spark, sf, "lineitem")
    val o = Tables.load(spark, sf, "orders").withColumnRenamed("o_orderkey", "l_orderkey")
    Bucketing.writeBucketed(li, "b_lineitem", "l_orderkey", 8)
    Bucketing.writeBucketed(o, "b_orders", "l_orderkey", 8)

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val j = Bucketing.bucketedJoin(spark, "b_lineitem", "b_orders", "l_orderkey")
        .agg(count(lit(1)).as("n"), sum(col("o_totalprice")).as("s"))
      val result = j.collect()(0)
      val plan = j.queryExecution.executedPlan.toString
      assert(!plan.contains("ShuffleExchange") && !plan.contains("Exchange hashpartitioning"),
        s"bucketed join should not shuffle:\n$plan")

      val plain = li.join(o, Seq("l_orderkey"))
        .agg(count(lit(1)).as("n"), sum(col("o_totalprice")).as("s")).collect()(0)
      assert(result.getLong(0) == plain.getLong(0))
      assert(math.abs(result.getDouble(1) - plain.getDouble(1)) <
        1e-9 * math.abs(plain.getDouble(1))) // double sums differ only by fold order
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
      spark.sql("DROP TABLE IF EXISTS b_orders")
    }
  }
}
