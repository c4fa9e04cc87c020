package graft

import graft.operators.{FileManifest, FileMigrate, SkewJoin}
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

  test("opaque file migration copies any format byte-for-byte, preserving the tree") {
    val root = java.nio.file.Files.createTempDirectory("graft-files")
    val src = root.resolve("src")
    // non-parquet payload in a nested Hive-ish layout, with duplicate
    // basenames across dirs (the case a name-only manifest would conflate)
    // and a hidden file that must NOT be copied
    java.nio.file.Files.createDirectories(src.resolve("dt=20170101"))
    java.nio.file.Files.createDirectories(src.resolve("dt=20170102"))
    java.nio.file.Files.write(src.resolve("dt=20170101/part-00000.csv"), "a,b\n1,2\n".getBytes)
    java.nio.file.Files.write(src.resolve("dt=20170102/part-00000.csv"), "a,b\n3,4\n5,6\n".getBytes)
    java.nio.file.Files.write(src.resolve("dt=20170102/blob.bin"), Array.tabulate(1000)(_.toByte))
    // URI-reserved characters in a data filename (binaryFile's path column
    // is a decoded Path string — URI re-parsing would throw on the space)
    java.nio.file.Files.write(src.resolve("dt=20170102/with space.csv"), "x\n".getBytes)
    java.nio.file.Files.write(src.resolve("_SUCCESS"), Array.emptyByteArray)
    val dst = root.resolve("dst").toString

    val r = FileMigrate.copyTree(spark, src.toString, dst)
    assert(r.filesCopied == 4)
    assert(r.bytesCopied == 8 + 12 + 1000 + 2)
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(dst, "dt=20170102/with space.csv")))
    assert(FileMigrate.verified(spark, src.toString, dst))
    // byte-for-byte on the binary payload
    val got = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(dst, "dt=20170102/blob.bin"))
    assert(got.toSeq == Array.tabulate(1000)(_.toByte).toSeq)
    // hidden file stayed behind
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(dst, "_SUCCESS")))
    // a truncated destination file must flip verification
    java.nio.file.Files.write(java.nio.file.Paths.get(dst, "dt=20170102/blob.bin"),
      Array.tabulate(999)(_.toByte))
    assert(!FileMigrate.verified(spark, src.toString, dst))
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
