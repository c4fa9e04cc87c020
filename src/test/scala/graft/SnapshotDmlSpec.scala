package graft

import graft.operators.Snapshots
import graft.sources.SnapshotCatalog

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins SQL row-level DML on snapshot tables (the group-based
  * copy-on-write path): UPDATE, MERGE INTO, and the rewrite-path DELETE
  * for predicates the metadata path cannot translate. Every operation
  * must be a versioned publish (time travel intact), replace files
  * surgically where runtime group filtering applies, and never lose
  * rows that share a file with modified rows — the whole-group
  * guarantee the scan's no-pushdown contract exists for.
  */
class SnapshotDmlSpec extends AnyFunSuite {
  import SparkTestEnv._

  private lazy val warehouse: String = {
    val p = java.nio.file.Files.createTempDirectory("graft-dml-wh")
    p.toFile.deleteOnExit()
    spark.conf.set("spark.sql.catalog.dmlcat", classOf[SnapshotCatalog].getName)
    spark.conf.set("spark.sql.catalog.dmlcat.warehouse", p.toString)
    p.toString
  }

  private def orders = Tables.load(spark, sf, "orders")

  test("SQL UPDATE rewrites only affected groups; history and neighbors intact") {
    Snapshots.publish(spark, s"$warehouse/u1",
      orders.select("o_orderkey", "o_orderpriority", "o_totalprice")
        .repartitionByRange(8, col("o_orderkey")).sortWithinPartitions("o_orderkey"))
    val lo = orders.agg(min("o_orderkey")).head.getLong(0)
    val before = Snapshots.files(spark, s"$warehouse/u1", 1).toSet
    spark.sql(s"""UPDATE dmlcat.u1
      SET o_orderpriority = 'RUSH', o_totalprice = o_totalprice * 2
      WHERE o_orderkey <= ${lo + 5}""")
    // content: updated band transformed (expressions see OLD values),
    // everything else untouched
    val got = spark.table("dmlcat.u1")
    val expected = orders.select("o_orderkey", "o_orderpriority", "o_totalprice")
      .withColumn("o_orderpriority",
        when(col("o_orderkey") <= lo + 5, "RUSH").otherwise(col("o_orderpriority")))
      .withColumn("o_totalprice",
        when(col("o_orderkey") <= lo + 5, col("o_totalprice") * 2)
          .otherwise(col("o_totalprice")))
    assert(got.exceptAll(expected).isEmpty && expected.exceptAll(got).isEmpty,
      "UPDATE semantics: assignments evaluate against the old row")
    // versioned: v1 still serves the pre-update rows
    assert(spark.sql(s"SELECT count(*) FROM dmlcat.u1 VERSION AS OF 1 " +
      s"WHERE o_orderpriority = 'RUSH' AND o_orderkey <= ${lo + 5}")
      .head.getLong(0) ==
      orders.filter(col("o_orderkey") <= lo + 5 &&
        col("o_orderpriority") === "RUSH").count())
    // surgical: runtime group filtering keeps the other bands by identity
    val after = Snapshots.files(spark, s"$warehouse/u1", 2).toSet
    assert((before intersect after).size >= 6 && (before -- after).nonEmpty,
      s"narrow UPDATE must rewrite only its band: kept ${(before intersect after).size} of ${before.size}")
  }

  test("SQL MERGE INTO: matched update, matched delete, not-matched insert") {
    import spark.implicits._
    Snapshots.publish(spark, s"$warehouse/m1",
      Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0), (4L, "d", 40.0))
        .toDF("id", "tag", "amt"))
    Seq((2L, "B", 200.0, false), (3L, "C", 0.0, true), (9L, "z", 90.0, false))
      .toDF("id", "tag", "amt", "del").createOrReplaceTempView("m1_src")
    spark.sql("""MERGE INTO dmlcat.m1 t USING m1_src s ON t.id = s.id
      WHEN MATCHED AND s.del THEN DELETE
      WHEN MATCHED THEN UPDATE SET t.tag = s.tag, t.amt = s.amt
      WHEN NOT MATCHED AND NOT s.del THEN INSERT (id, tag, amt) VALUES (s.id, s.tag, s.amt)""")
    assert(spark.table("dmlcat.m1").as[(Long, String, Double)].collect().toSet ==
      Set((1L, "a", 10.0), (2L, "B", 200.0), (4L, "d", 40.0), (9L, "z", 90.0)))
    // the MERGE is one new version; the pre-merge state travels
    assert(Snapshots.versions(spark, s"$warehouse/m1") == Seq(1, 2))
    assert(spark.sql("SELECT count(*) FROM dmlcat.m1 VERSION AS OF 1")
      .head.getLong(0) == 4)
  }

  test("rewrite-path DELETE handles predicates the metadata path cannot") {
    import spark.implicits._
    Snapshots.publish(spark, s"$warehouse/cd",
      Seq((1L, "low"), (2L, "medium"), (3L, "hi"), (4L, "urgent"))
        .toDF("id", "p"))
    // length(p) translates to no source filter: the metadata delete
    // refuses and the group-based rewrite takes over
    spark.sql("DELETE FROM dmlcat.cd WHERE length(p) > 3")
    assert(spark.table("dmlcat.cd").as[(Long, String)].collect().toSet ==
      Set((1L, "low"), (3L, "hi")))
    assert(spark.sql("SELECT count(*) FROM dmlcat.cd VERSION AS OF 1")
      .head.getLong(0) == 4)
  }

  test("whole-group integrity: non-matching rows sharing a file survive the rewrite") {
    import spark.implicits._
    // ONE file holding matching and non-matching rows: the scan must
    // return every row of the file (no row-group/stats elimination on
    // the keep-predicate), or survivors vanish with the replaced file
    Snapshots.publish(spark, s"$warehouse/wg",
      (1L to 1000L).map(i => (i, if (i % 2 == 0) "even" else "odd"))
        .toDF("id", "tag").coalesce(1))
    spark.sql("UPDATE dmlcat.wg SET tag = 'EVEN' WHERE id % 2 = 0")
    val got = spark.table("dmlcat.wg").as[(Long, String)].collect()
    assert(got.length == 1000, s"rewrite lost rows: ${got.length} of 1000")
    assert(got.count(_._2 == "EVEN") == 500 && got.count(_._2 == "odd") == 500)
    // and a DELETE that empties an entire file removes it outright
    spark.sql("DELETE FROM dmlcat.wg WHERE id <= 1000 AND id % 1 = 0")
    assert(spark.table("dmlcat.wg").count() == 0)
    assert(spark.sql("SELECT count(*) FROM dmlcat.wg VERSION AS OF 2")
      .head.getLong(0) == 1000)
  }
}
