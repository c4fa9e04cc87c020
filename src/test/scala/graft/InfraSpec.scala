package graft

import graft.operators.{FileManifest, SkewJoin}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class InfraSpec extends AnyFunSuite {
  import SparkTestEnv._

  test("file manifest lists fixture files and self-diff is clean") {
    val m = FileManifest.list(spark, sf)
    assert(m.count() == 10) // one parquet per fixture table
    assert(m.filter(col("length") <= 0).count() == 0)
    val d = FileManifest.diff(m, m)
    assert(d.filter(col("status") =!= "ok").count() == 0)
  }

  test("file manifest diff flags a length mismatch and a missing file") {
    val m = FileManifest.list(spark, sf)
    val tampered = m.withColumn("length",
      when(col("name") === "orders.parquet", col("length") + 1).otherwise(col("length")))
      .filter(col("name") =!= "nation.parquet")
    val d = FileManifest.diff(m, tampered)
    assert(d.filter(col("status") === "length_mismatch").count() == 1)
    assert(d.filter(col("status") === "missing_in_dest").count() == 1)
  }

  test("salted join returns exactly the plain join's rows") {
    val li = Tables.load(spark, sf, "lineitem")
    val o = Tables.load(spark, sf, "orders").withColumnRenamed("o_orderkey", "l_orderkey")
    val plain = li.join(o, Seq("l_orderkey")).agg(
      count(lit(1)), sum(xxhash64(col("l_orderkey"), col("o_totalprice")).cast("decimal(38,0)"))).collect()(0)
    val salted = SkewJoin.saltedJoin(li, o, "l_orderkey", salt = 8).agg(
      count(lit(1)), sum(xxhash64(col("l_orderkey"), col("o_totalprice")).cast("decimal(38,0)"))).collect()(0)
    assert(plain == salted)
  }

  test("vector_dot is callable from SQL") {
    SparkEnv.registerFunctions(spark)
    val r = spark.sql(
      "SELECT vector_dot(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)), array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS d")
      .collect()(0).getDouble(0)
    assert(r == 11.0)
  }

  test("salted left join preserves unmatched probe rows") {
    val li = Tables.load(spark, sf, "lineitem").limit(100)
    val none = Tables.load(spark, sf, "orders")
      .filter(col("o_orderkey") < 0).withColumnRenamed("o_orderkey", "l_orderkey")
    val j = SkewJoin.saltedJoin(li, none, "l_orderkey", salt = 4, joinType = "left")
    assert(j.count() == 100)
  }
}
