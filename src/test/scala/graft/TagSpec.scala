package graft

import graft.operators.Snapshots
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Named version TAGS: immutable pointers at committed versions that
  * (a) resolve anywhere a version number does — `option("version",
  * "name")`, SQL `VERSION AS OF 'name'` — and (b) pin RETENTION:
  * `expire` never drops a tagged version's manifest, so `vacuum` keeps
  * its files referenced; `untag` is the explicit release. The
  * reproducibility pin for "the exact table run X trained on".
  */
class TagSpec extends AnyFunSuite {
  import SparkTestEnv._
  import spark.implicits._

  private def freshRoot(tag: String): String = {
    val p = java.nio.file.Files.createTempDirectory(s"graft-tag-$tag")
    p.toFile.deleteOnExit()
    p.toString
  }

  private def slice(m: Int) = (0 until 300).filter(_ % 3 == m)
    .map(i => (i.toLong, s"v$i")).toDF("k", "s")

  test("tag resolves through the DSv2 option, SQL AS OF, and Snapshots.read") {
    val root = freshRoot("resolve")
    Snapshots.publish(spark, root, slice(0))
    Snapshots.publish(spark, root, slice(1), append = true)
    assert(Snapshots.tag(spark, root, "baseline", Some(1)) === 1)
    val viaOpt = spark.read.format("graft-snapshot").option("root", root)
      .option("version", "baseline").load()
    assert(viaOpt.count() === 100)
    assert(viaOpt.agg(sum("k")).head.getLong(0) ===
      Snapshots.read(spark, root, Some(1)).agg(sum("k")).head.getLong(0))
    spark.conf.set("spark.sql.catalog.tcat",
      classOf[graft.sources.SnapshotCatalog].getName)
    spark.conf.set("spark.sql.catalog.tcat.warehouse",
      new java.io.File(root).getParent)
    try {
      val t = new java.io.File(root).getName
      assert(spark.sql(s"SELECT count(*) FROM tcat.`$t` VERSION AS OF 'baseline'")
        .head.getLong(0) === 100)
      assert(spark.sql(s"SELECT count(*) FROM tcat.`$t` VERSION AS OF 2")
        .head.getLong(0) === 200)
    } finally {
      spark.conf.unset("spark.sql.catalog.tcat")
      spark.conf.unset("spark.sql.catalog.tcat.warehouse")
    }
  }

  test("a tagged version survives expire and vacuum; untag releases it") {
    val root = freshRoot("retain")
    Snapshots.publish(spark, root, slice(0))
    // a CoW rewrite makes v1's ORIGINAL file solely v1's — the case
    // where expire+vacuum would actually reclaim bytes without the pin
    // (appends share files, so expiring an append-history manifest
    // orphans nothing)
    Snapshots.deleteWhere(spark, root, col("k") >= 150)
    Snapshots.publish(spark, root, slice(1), append = true)
    Snapshots.tag(spark, root, "pinned", Some(1))
    val dropped = Snapshots.expire(spark, root, keepLast = 1)
    assert(dropped === Seq(2), s"expire must skip the tagged v1, got $dropped")
    assert(Snapshots.versions(spark, root) === Seq(1, 3))
    // vacuum keeps the tagged version's files referenced (zero grace:
    // nothing live may be swept)
    Snapshots.vacuum(spark, root, graceMs = 0L)
    assert(Snapshots.read(spark, root, Some(1)).count() === 100)
    assert(spark.read.format("graft-snapshot").option("root", root)
      .option("version", "pinned").load().count() === 100)
    // untag releases the pin: the next expire drops it, vacuum reclaims
    // the rewritten-away original
    assert(Snapshots.untag(spark, root, "pinned"))
    assert(Snapshots.expire(spark, root, keepLast = 1) === Seq(1))
    assert(Snapshots.versions(spark, root) === Seq(3))
    val swept = Snapshots.vacuum(spark, root, graceMs = 0L)
    assert(swept > 0, "untagged-then-expired rewritten files must reclaim")
    assert(Snapshots.read(spark, root).count() === 150)
    intercept[Exception](Snapshots.read(spark, root, Some(1)).count())
  }

  test("refusal matrix: duplicate, bad names, missing version, unknown resolve") {
    val root = freshRoot("refuse")
    Snapshots.publish(spark, root, slice(0))
    Snapshots.tag(spark, root, "a")
    intercept[IllegalArgumentException](Snapshots.tag(spark, root, "a"))
    Seq("x/y", "..", "7", "_hidden", "", "a b").foreach { bad =>
      intercept[IllegalArgumentException](Snapshots.tag(spark, root, bad))
    }
    intercept[IllegalArgumentException](Snapshots.tag(spark, root, "b", Some(9)))
    val e = intercept[IllegalArgumentException](
      spark.read.format("graft-snapshot").option("root", root)
        .option("version", "nope").load().count())
    assert(e.getMessage.contains("neither a version number nor a tag"))
    assert(Snapshots.tags(spark, root) === Seq("a" -> 1))
    assert(!Snapshots.untag(spark, root, "never-existed"))
  }

  test("CALL sys.tag / untag / tags round-trip from SQL") {
    val root = freshRoot("proc")
    val wh = new java.io.File(root).getParent
    val t = new java.io.File(root).getName
    Snapshots.publish(spark, root, slice(0))
    Snapshots.publish(spark, root, slice(1), append = true)
    spark.conf.set("spark.sql.catalog.tproc",
      classOf[graft.sources.SnapshotCatalog].getName)
    spark.conf.set("spark.sql.catalog.tproc.warehouse", wh)
    try {
      assert(spark.sql(s"CALL tproc.sys.tag('$t', 'rel1', 1)").head.getInt(0) === 1)
      // -1 pins the head
      assert(spark.sql(s"CALL tproc.sys.tag('$t', 'head', -1)").head.getInt(0) === 2)
      val listed = spark.sql(s"CALL tproc.sys.tags('$t')").collect()
        .map(r => r.getString(0) -> r.getInt(1)).toSeq
      assert(listed === Seq("head" -> 2, "rel1" -> 1))
      assert(spark.sql(s"SELECT count(*) FROM tproc.`$t` VERSION AS OF 'rel1'")
        .head.getLong(0) === 100)
      assert(spark.sql(s"CALL tproc.sys.untag('$t', 'rel1')").head.getBoolean(0))
      assert(spark.sql(s"CALL tproc.sys.tags('$t')").count() === 1)
    } finally {
      spark.conf.unset("spark.sql.catalog.tproc")
      spark.conf.unset("spark.sql.catalog.tproc.warehouse")
    }
  }
}
