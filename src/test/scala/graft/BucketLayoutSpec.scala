package graft

import graft.operators.Snapshots

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** HASH-BUCKET clustering (`clusterBy = "bucket(n, col)"`): the
  * high-cardinality answer to identity clustering — one file set per
  * BUCKET (`pmod(hash(col), n)`, Spark's Murmur3 seed 42) instead of one
  * per raw value, the scan reports key-grouped partitioning over the
  * bucket TRANSFORM (resolved through [[graft.sources.SnapshotCatalog]]'s
  * `bucket` V2 function), and joins/aggregations on the raw key plan
  * exchange-free at any key cardinality. The one-side form shuffles a
  * plain frame INTO the bucketed layout by evaluating the same function —
  * so hash agreement between the write path and the function is
  * row-equality-pinned here, not assumed.
  */
class BucketLayoutSpec extends AnyFunSuite {
  import SparkTestEnv._
  import spark.implicits._

  private def freshWh(tag: String): String = {
    val p = java.nio.file.Files.createTempDirectory(s"graft-bucket-$tag")
    p.toFile.deleteOnExit()
    p.toString
  }

  private def withCatalog[A](name: String, wh: String)(body: => A): A = {
    spark.conf.set(s"spark.sql.catalog.$name",
      classOf[graft.sources.SnapshotCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$name.warehouse", wh)
    try body finally {
      spark.conf.unset(s"spark.sql.catalog.$name")
      spark.conf.unset(s"spark.sql.catalog.$name.warehouse")
    }
  }

  private def planCounts(df: DataFrame): (Int, Int) = {
    df.collect()
    (PlanOps.shuffleCount(df), PlanOps.sortCount(df))
  }

  private def noBroadcast[A](body: => A): A = {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try body finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  /** 5000 distinct long keys — far past anything identity clustering
    * could write one file set per value for.
    */
  private def fact: DataFrame =
    (1 to 20000).map(i => (i.toLong % 5000, i, i * 1.5)).toDF("k", "s", "x")
  private def dim: DataFrame =
    (1 to 5000).map(i => (i.toLong, s"dim$i")).toDF("kd", "name")

  test("bucketed publish: bounded file count, roundtrip, validation") {
    val wh = freshWh("pub")
    Snapshots.publish(spark, s"$wh/t", fact, clusterBy = Some("bucket(8, k)"))
    assert(Snapshots.clusterOf(spark, s"$wh/t", 1).contains("bucket(8,k)"))
    val files = Snapshots.files(spark, s"$wh/t", 1)
    assert(files.nonEmpty && files.size <= 8,
      s"${files.size} files for 8 buckets — bucketing must bound the file count")
    assert(files.forall(_.matches(".*__cluster=\\d+/[^/]+$")))
    val got = spark.read.format("graft-snapshot").option("root", s"$wh/t").load()
    assert(got.count() == 20000)
    assert(got.agg(sum("s")).head().getLong(0) == (1 to 20000).map(_.toLong).sum)
    // validation: bucket count range, unhashable types, sortBy composition
    intercept[IllegalArgumentException] {
      Snapshots.publish(spark, s"$wh/bad1", fact, clusterBy = Some("bucket(1, k)"))
    }
    intercept[IllegalArgumentException] {
      Snapshots.publish(spark, s"$wh/bad2", fact, clusterBy = Some("bucket(8, x)"))
    }
    // sortBy now COMPOSES with bucket clustering (the bucketed-sorted
    // SMB layout — SortedLayoutSpec owns the behavior pins); a bogus
    // sort column still refuses
    Snapshots.publish(spark, s"$wh/bad3", fact,
      clusterBy = Some("bucket(8, k)"), sortBy = Some("s"))
    assert(Snapshots.sortOf(spark, s"$wh/bad3", 1).contains("s"))
    intercept[IllegalArgumentException] {
      Snapshots.publish(spark, s"$wh/bad3b", fact,
        clusterBy = Some("bucket(8, k)"), sortBy = Some("nope"))
    }
    // an append under a DIFFERENT bucket count cannot hold one layout
    intercept[IllegalArgumentException] {
      Snapshots.publish(spark, s"$wh/t", fact, append = true,
        clusterBy = Some("bucket(16, k)"))
    }
  }

  test("two-sided bucket SPJ on a 5000-key join: zero shuffles, rows equal") {
    val wh = freshWh("spj")
    Snapshots.publish(spark, s"$wh/fact", fact, clusterBy = Some("bucket(8,k)"))
    Snapshots.publish(spark, s"$wh/dim", dim, clusterBy = Some("bucket(8,kd)"))
    withCatalog("bspj", wh) {
      noBroadcast {
        // join keys are DIFFERENTLY NAMED columns — compatibility is
        // positional (each side's transform sits at join-key position 0)
        val j = spark.table("bspj.fact")
          .join(spark.table("bspj.dim"), col("k") === col("kd"))
        val (sh, _) = planCounts(j)
        assert(sh == 0, s"expected a shuffle-free bucket SPJ, got $sh:\n" +
          j.queryExecution.executedPlan)
        val got = j.groupBy("k").count().orderBy("k").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSeq
        val expect = fact.join(dim, col("k") === col("kd")).groupBy("k").count()
          .orderBy("k").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
        assert(got == expect)
      }
    }
  }

  test("aggregation on the raw key over the bucket layout: zero shuffles") {
    val wh = freshWh("agg")
    Snapshots.publish(spark, s"$wh/t", fact, clusterBy = Some("bucket(8,k)"))
    withCatalog("bagg", wh) {
      val agg = spark.table("bagg.t").groupBy("k")
        .agg(count(lit(1)).as("n"), sum("s").as("t"))
      val (sh, _) = planCounts(agg)
      assert(sh == 0,
        s"same-key rows share a bucket, the agg must not shuffle ($sh):\n" +
          agg.queryExecution.executedPlan)
      val got = agg.orderBy("k").collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      val expect = fact.groupBy("k").agg(count(lit(1)).as("n"), sum("s").as("t"))
        .orderBy("k").collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      assert(got == expect)
    }
  }

  test("one-side shuffle INTO the bucket layout: hash agreement row-pinned") {
    val wh = freshWh("oneside")
    Snapshots.publish(spark, s"$wh/fact", fact, clusterBy = Some("bucket(8,k)"))
    // string keys too — each type exercises its own Murmur3 code path
    val sFact = (1 to 8000).map(i => ("key" + (i % 2000), i)).toDF("k", "v")
    Snapshots.publish(spark, s"$wh/sfact", sFact, clusterBy = Some("bucket(4,k)"))
    withCatalog("bone", wh) {
      noBroadcast {
        val prev = spark.conf.getOption("spark.sql.sources.v2.bucketing.shuffle.enabled")
        spark.conf.set("spark.sql.sources.v2.bucketing.shuffle.enabled", "true")
        try {
          val plain = (1 to 5000).map(i => (i.toLong, s"d$i")).toDF("k", "name")
          val j = spark.table("bone.fact").join(plain.hint("merge"), "k")
          j.collect()
          assert(PlanOps.shuffleCount(j) == 1,
            s"exactly the plain side must shuffle:\n${j.queryExecution.executedPlan}")
          assert(j.queryExecution.executedPlan.toString.contains("keygroupedpartitioning"),
            "the exchange must target the bucket layout, not a plain hash")
          // a write-path/function hash MISMATCH would silently drop the
          // misrouted keys' matches — group equality is the real check
          val got = j.groupBy("k").count().orderBy("k").collect()
            .map(r => (r.getLong(0), r.getLong(1))).toSeq
          val expect = fact.join(plain, "k").groupBy("k").count().orderBy("k")
            .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
          assert(got == expect)
          val sPlain = (1 to 2000).map(i => ("key" + i, i * 10)).toDF("k", "w")
          val js = spark.table("bone.sfact").join(sPlain.hint("merge"), "k")
          js.collect()
          val sGot = js.groupBy("k").count().orderBy("k").collect()
            .map(r => (r.getString(0), r.getLong(1))).toSeq
          val sExpect = sFact.join(sPlain, "k").groupBy("k").count().orderBy("k")
            .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
          assert(sGot == sExpect)
        } finally prev match {
          case Some(v) => spark.conf.set("spark.sql.sources.v2.bucketing.shuffle.enabled", v)
          case None => spark.conf.unset("spark.sql.sources.v2.bucketing.shuffle.enabled")
        }
      }
    }
  }

  test("DML keeps the bucket layout: INSERT and mergeByKey re-bucket, compact restores") {
    val wh = freshWh("dml")
    Snapshots.publish(spark, s"$wh/t", fact, clusterBy = Some("bucket(8,k)"))
    withCatalog("bdml", wh) {
      spark.sql("INSERT INTO bdml.t SELECT k, s + 100000 AS s, x FROM bdml.t")
      assert(Snapshots.clusterOf(spark, s"$wh/t",
        Snapshots.versions(spark, s"$wh/t").last).contains("bucket(8,k)"),
        "INSERT INTO a bucketed table must keep the layout")
      // CoW merge rewrites touched buckets through the bucketed write
      Snapshots.mergeByKey(spark, s"$wh/t",
        Seq((1L, 1, 999.0)).toDF("k", "s", "x"), keyCols = Seq("k", "s"))
      val vm = Snapshots.versions(spark, s"$wh/t").last
      assert(Snapshots.clusterOf(spark, s"$wh/t", vm).contains("bucket(8,k)"),
        "mergeByKey must keep the bucket layout")
      assert(Snapshots.files(spark, s"$wh/t", vm)
        .forall(_.matches(".*__cluster=\\d+/[^/]+$")),
        "every listed file must still carry its bucket-dir attestation")
      // and the layout still plans exchange-free after both mutations
      noBroadcast {
        val agg = spark.table("bdml.t").groupBy("k").agg(count(lit(1)).as("n"))
        val (sh, _) = planCounts(agg)
        assert(sh == 0, s"post-DML bucket agg must stay exchange-free ($sh)")
        assert(agg.agg(sum("n")).head().getLong(0) == 40000)
      }
      // compact folds the per-mutation file fan-out back to one file per
      // bucket, layout intact
      Snapshots.compact(spark, s"$wh/t")
      val vc = Snapshots.versions(spark, s"$wh/t").last
      assert(Snapshots.clusterOf(spark, s"$wh/t", vc).contains("bucket(8,k)"))
      assert(Snapshots.files(spark, s"$wh/t", vc).size <= 8)
    }
  }

  test("the catalog's SQL bucket function validates its count: 0/negative refuse with the contract") {
    val wh = freshWh("bktfn")
    Snapshots.publish(spark, s"$wh/t", fact, clusterBy = Some("bucket(8,k)"))
    withCatalog("bfn", wh) {
      // user-callable surface: a raw / by zero (n=0) or silent nonsense
      // ids (n<0) must instead be the publish path's range error
      Seq(0, -3, 1).foreach { n =>
        val e = intercept[Exception](
          spark.sql(s"SELECT bfn.system.bucket($n, k) FROM bfn.t").collect())
        assert(e.getMessage.contains("out of range [2, 65536]"),
          s"bucket($n, k) must refuse with the contract: ${e.getMessage}")
      }
      val ok = spark.sql("SELECT DISTINCT bfn.system.bucket(8, k) AS b FROM bfn.t")
        .collect().map(_.getInt(0))
      assert(ok.forall(b => b >= 0 && b < 8))
    }
  }

  test("bucket-count rescale via CALL sys.cluster: n->m re-layout keeps SPJ") {
    val wh = freshWh("rescale")
    Snapshots.publish(spark, s"$wh/f", fact, clusterBy = Some("bucket(4,k)"))
    Snapshots.publish(spark, s"$wh/d", dim, clusterBy = Some("bucket(16,kd)"))
    withCatalog("brs", wh) {
      // mismatched bucket counts: the SQL rescale brings the fact to 16
      val v = spark.sql("CALL brs.sys.cluster('f', 'bucket(16, k)')")
        .head.getInt(0)
      assert(Snapshots.clusterOf(spark, s"$wh/f", v).contains("bucket(16,k)"))
      assert(Snapshots.files(spark, s"$wh/f", v).size <= 16)
      noBroadcast {
        val j = spark.table("brs.f")
          .join(spark.table("brs.d"), col("k") === col("kd"))
        val (sh, _) = planCounts(j)
        assert(sh == 0, s"rescaled bucket SPJ should be shuffle-free, got $sh")
        assert(j.count() === fact.join(dim, col("k") === col("kd")).count())
      }
      // pre-rescale history still travels
      assert(Snapshots.read(spark, s"$wh/f", Some(1)).count() === fact.count())
    }
  }

  test("null bucket keys survive scans and never fabricate join matches") {
    val wh = freshWh("nulls")
    val withNulls = fact.withColumn("k",
      when(col("s") % 100 === 0, lit(null)).otherwise(col("k")))
    Snapshots.publish(spark, s"$wh/t", withNulls, clusterBy = Some("bucket(8,k)"))
    withCatalog("bnull", wh) {
      assert(spark.table("bnull.t").count() == 20000,
        "null-keyed rows route to the seed bucket, they are not dropped")
      noBroadcast {
        val d = dim
        Snapshots.publish(spark, s"$wh/d", d, clusterBy = Some("bucket(8,kd)"))
        val j = spark.table("bnull.t").join(spark.table("bnull.d"),
          col("k") === col("kd"))
        val got = j.count()
        val expect = withNulls.join(d, col("k") === col("kd")).count()
        assert(got == expect)
      }
    }
  }
}
