package graft

import graft.operators.{Expectations, Snapshots}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins write–audit–publish on snapshot tables: a staged commit is
  * invisible to every read surface, audits through the normal frame
  * APIs, promotes by one atomic rename (files shared with the base BY
  * NAME), aborts reclaiming exactly its own files, refuses stale
  * promotion after the table moves, and holds its files live against
  * vacuum for as long as the audit takes.
  */
class WapSpec extends AnyFunSuite {
  import SparkTestEnv._

  private lazy val wh: String = {
    val p = java.nio.file.Files.createTempDirectory("graft-wap")
    p.toFile.deleteOnExit()
    p.toString
  }

  private def orders = Tables.load(spark, sf, "orders")
    .select("o_orderkey", "o_orderpriority", "o_totalprice")

  test("staged commits are invisible; promote is one rename that shares base files") {
    val r = s"$wh/t1"
    Snapshots.publish(spark, r, orders.filter(col("o_orderkey") % 2 === 0))
    val baseCount = Snapshots.read(spark, r).count()
    val baseFiles = Snapshots.files(spark, r, 1).toSet
    val token = Snapshots.publishStaged(spark, r,
      orders.filter(col("o_orderkey") % 2 === 1), append = true)
    // invisible everywhere: version list, reads, history length
    assert(Snapshots.versions(spark, r) === Seq(1))
    assert(Snapshots.read(spark, r).count() === baseCount)
    assert(Snapshots.listStaged(spark, r) === Seq(token))
    // the audit surface sees the WHOLE candidate (base ++ staged rows)
    assert(Snapshots.readStaged(spark, r, token).count() === orders.count())
    val v = Snapshots.promote(spark, r, token)
    assert(v === 2 && Snapshots.versions(spark, r) === Seq(1, 2))
    assert(Snapshots.read(spark, r).count() === orders.count())
    // append promotion shares every base file by name — zero rewrite
    assert(baseFiles.subsetOf(Snapshots.files(spark, r, 2).toSet))
    assert(Snapshots.listStaged(spark, r).isEmpty)
    // time travel untouched
    assert(Snapshots.read(spark, r, Some(1)).count() === baseCount)
  }

  test("audit-gate failure aborts: own files reclaimed, base files and table intact") {
    val r = s"$wh/t2"
    Snapshots.publish(spark, r, orders)
    val bad = orders.limit(50).withColumn("o_totalprice", lit(-1.0))
    val token = Snapshots.publishStaged(spark, r, bad, append = true)
    intercept[IllegalStateException] {
      Expectations.gate(Snapshots.readStaged(spark, r, token),
        Seq(Expectations.Satisfies("price_positive", col("o_totalprice") > 0)))
    }
    // reclaim count = the stage's own files (base files are untouched)
    assert(Snapshots.abort(spark, r, token) > 0)
    assert(Snapshots.listStaged(spark, r).isEmpty)
    assert(Snapshots.versions(spark, r) === Seq(1))
    assert(Snapshots.read(spark, r).count() === orders.count())
    intercept[IllegalArgumentException](Snapshots.readStaged(spark, r, token))
  }

  test("promote refuses when the table advanced past the staged base") {
    val r = s"$wh/t3"
    Snapshots.publish(spark, r, orders.limit(100))
    val token = Snapshots.publishStaged(spark, r, orders.limit(10), append = true)
    Snapshots.publish(spark, r, orders.limit(20), append = true) // table moves
    val e = intercept[IllegalArgumentException](Snapshots.promote(spark, r, token))
    assert(e.getMessage.contains("stale"))
    // the stage is still abortable; the intervening publish is unharmed
    Snapshots.abort(spark, r, token)
    assert(Snapshots.versions(spark, r) === Seq(1, 2))
    assert(Snapshots.read(spark, r).count() === 120)
  }

  test("vacuum never reclaims a pending stage's files; abort + vacuum does") {
    val r = s"$wh/t4"
    Snapshots.publish(spark, r, orders.limit(100))
    val token = Snapshots.publishStaged(spark, r, orders.limit(10), append = true)
    Snapshots.vacuum(spark, r, graceMs = 0L)
    // still auditable after an aggressive sweep
    assert(Snapshots.readStaged(spark, r, token).count() === 110)
    assert(Snapshots.promote(spark, r, token) === 2)
    assert(Snapshots.read(spark, r).count() === 110)
  }

  test("replacement stages promote with their layout; dv-carrying bases refuse append stages") {
    val r = s"$wh/t5"
    Snapshots.publish(spark, r, orders)
    val token = Snapshots.publishStaged(spark, r,
      orders.filter(col("o_orderkey") % 3 === 0),
      clusterBy = Some("o_orderpriority"))
    val v = Snapshots.promote(spark, r, token)
    assert(Snapshots.clusterOf(spark, r, v).contains("o_orderpriority"))
    // merge-on-read delete → outstanding dvs → append stage refuses loudly
    import spark.implicits._
    Snapshots.deleteByKey(spark, r,
      orders.filter(col("o_orderkey") % 3 === 0).limit(5).select("o_orderkey"))
    val e = intercept[IllegalArgumentException](
      Snapshots.publishStaged(spark, r, orders.limit(5), append = true))
    assert(e.getMessage.contains("delete vectors"))
    // a replacement stage is still fine (it carries no base state)
    val t2 = Snapshots.publishStaged(spark, r, orders.limit(7))
    assert(Snapshots.promote(spark, r, t2) === Snapshots.versions(spark, r).last)
    assert(Snapshots.read(spark, r).count() === 7)
  }
}
