package graft

import graft.operators.Snapshots

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The clustered-publish WRITE path de-skewed: `writeData` routes rows
  * with a REBALANCE on the split-dir column instead of a strict
  * repartition, so under AQE a hot cluster group (one hot calendar day,
  * one hot tenant) whose shuffle bytes exceed
  * `spark.sql.adaptive.advisoryPartitionSizeInBytes` splits across
  * SEVERAL write tasks — several files in the SAME `__cluster=` dir —
  * while cold groups coalesce whole and still land one file each. The
  * read side has handled multi-file groups since q179
  * (partiallyClusteredDistribution); this suite pins the write side:
  * fan-out happens, stays byte-bounded, never leaks rows across dirs,
  * and every layout proof (identity footer re-proof, time-transform
  * monotonic proof, bucket header carry) survives it. Sorted layouts
  * keep the strict one-task-per-group routing — splitting a group at
  * map-chunk boundaries would interleave its sort ranges across files
  * and void the inter-file envelope proof.
  */
class WriteSkewSpec extends AnyFunSuite {
  import SparkTestEnv._
  import spark.implicits._

  private def freshWh(tag: String): String = {
    val p = java.nio.file.Files.createTempDirectory(s"graft-skew-$tag")
    p.toFile.deleteOnExit()
    p.toString
  }

  /** Run `body` with a tiny AQE advisory partition size so the skew
    * split triggers at fixture scale (64 MB default would never split).
    */
  private def withAdvisory[A](bytes: String)(body: => A): A = {
    val k = "spark.sql.adaptive.advisoryPartitionSizeInBytes"
    val prev = spark.conf.getOption(k)
    spark.conf.set(k, bytes)
    try body finally {
      prev match { case Some(v) => spark.conf.set(k, v); case None => spark.conf.unset(k) }
    }
  }

  /** One HOT day (day 1: `hot` rows with a padding payload) + 4 cold
    * days (20 rows each). repartition(8) gives the publish shuffle
    * several map tasks — the unit AQE splits a skewed reduce partition
    * by. (A single-mapper shuffle cannot split: the slice unit is the
    * per-mapper chunk. Real 100 TB feeds always have many upstream
    * tasks; the repartition stands in for them.)
    */
  private def skewedDays(hot: Int): DataFrame =
    ((0 until hot).map(i => (s"2024-03-01 10:${10 + i % 49}:07.0", i.toLong)) ++
      (0 until 80).map(i => (s"2024-03-0${2 + i % 4} 11:${10 + i % 49}:07.0", (100000 + i).toLong)))
      .toDF("s", "id")
      .select(col("s").cast("timestamp").as("ts"), col("id"),
        // incompressible payload: shuffle blocks compress with lz4, so a
        // repeated-char pad would deflate below any advisory size and
        // never trigger the split this suite is pinning
        expr("concat_ws('', transform(sequence(1, 8), " +
          "x -> md5(concat(cast(id as string), cast(x as string)))))").as("pad"))
      .repartition(8)

  private def dirOf(rel: String): String =
    "__cluster=([^/]+)/".r.findFirstMatchIn(rel).map(_.group(1)).getOrElse(
      fail(s"file $rel is not under a cluster split dir"))

  test("days(ts): hot day splits across tasks, cold days stay single-file, proofs intact") {
    val wh = freshWh("days")
    val df = skewedDays(hot = 4000)
    withAdvisory("65536") {
      Snapshots.publish(spark, s"$wh/t", df, clusterBy = Some("days(ts)"))
    }
    assert(Snapshots.clusterOf(spark, s"$wh/t", 1).contains("days(ts)"))
    val byDir = Snapshots.files(spark, s"$wh/t", 1).groupBy(dirOf)
    val hotDir = java.time.LocalDate.parse("2024-03-01").toEpochDay.toString
    val hotFiles = byDir.getOrElse(hotDir, fail("hot day dir missing")).size
    assert(hotFiles > 1, s"hot day should fan out across >1 write task, got $hotFiles file(s)")
    // bounded: the split targets the advisory size, so the file count is
    // ~ceil(group shuffle bytes / advisory) capped by the map-chunk slice
    // unit — never one-per-row
    assert(hotFiles <= 16, s"fan-out must stay map-chunk-bounded, got $hotFiles files")
    // AQE splits the skewed REDUCE PARTITION, so a cold dir co-hashed
    // with the hot one rides its slices (a few small extra files,
    // compact() restores); cold dirs in OTHER partitions must stay
    // exactly one file — compute co-hashing with Spark's own hash, the
    // same murmur3 the rebalance's hashpartitioning applies
    val p = spark.conf.get("spark.sql.shuffle.partitions").toInt
    def partOf(d: String): Int =
      Seq(d).toDF("x").select(pmod(hash(col("x")), lit(p))).head().getInt(0)
    val hotPart = partOf(hotDir)
    byDir.filterNot(_._1 == hotDir).foreach { case (d, fs) =>
      if (partOf(d) != hotPart)
        assert(fs.size == 1, s"cold day $d (partition ${partOf(d)} != hot $hotPart) " +
          s"should coalesce to one file, got ${fs.size}")
      else assert(fs.size <= 16, s"co-hashed cold day $d must stay slice-bounded")
    }
    // no row leaked across dirs: the time layout's monotonic footer proof
    // re-derives every file's day — read back equals the input exactly
    val got = spark.read.format("graft-snapshot").option("root", s"$wh/t").load()
    assert(got.count() == 4080)
    assert(got.agg(sum("id")).head().getLong(0) ==
      df.agg(sum("id")).head().getLong(0))
    // day-pruning still works over the multi-file hot group
    val oneDay = spark.read.format("graft-snapshot").option("root", s"$wh/t").load()
      .filter(col("ts") >= lit("2024-03-02").cast("timestamp") &&
        col("ts") < lit("2024-03-03").cast("timestamp"))
    assert(oneDay.count() == 20)
    assert(PlanOps.plannedScanFiles(oneDay) == 1,
      "a cold-day read must plan only that day's single file")
  }

  test("identity cluster: hot key fans out, header carries, SPJ join stays exchange-free") {
    val wh = freshWh("id")
    val df = skewedDays(hot = 4000)
      .withColumn("tenant", when(col("id") < 100000L, lit("acme")).otherwise(
        concat(lit("t"), (col("id") % 4).cast("string"))))
    withAdvisory("65536") {
      Snapshots.publish(spark, s"$wh/a", df, clusterBy = Some("tenant"))
      Snapshots.publish(spark, s"$wh/b",
        df.groupBy("tenant").agg(count(lit(1)).as("n")), clusterBy = Some("tenant"))
    }
    assert(Snapshots.clusterOf(spark, s"$wh/a", 1).contains("tenant"))
    val byDir = Snapshots.files(spark, s"$wh/a", 1).groupBy(dirOf)
    assert(byDir.values.exists(_.size > 1), "the hot tenant should fan out across >1 file")
    assert(byDir.values.forall(_.size <= 8), "fan-out must stay map-chunk-bounded")
    // the multi-file hot group still proves single-valued per FILE, so
    // the co-clustered join plans exchange-free (hot-key fan-out on the
    // read side is q179's partiallyClusteredDistribution, off here — the
    // proof under test is the write side not voiding the layout)
    val prevB = spark.conf.getOption("spark.sql.sources.v2.bucketing.enabled")
    val prevT = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val a = spark.read.format("graft-snapshot").option("root", s"$wh/a").load()
      val b = spark.read.format("graft-snapshot").option("root", s"$wh/b").load()
      val j = a.join(b.hint("merge"), "tenant")
      assert(j.count() == 4080)
      assert(PlanOps.shuffleCount(j) == 0,
        "co-clustered join over the fanned-out layout must stay exchange-free")
    } finally {
      prevB match {
        case Some(v) => spark.conf.set("spark.sql.sources.v2.bucketing.enabled", v)
        case None => spark.conf.unset("spark.sql.sources.v2.bucketing.enabled")
      }
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevT)
    }
  }

  test("bucket layout: hot bucket fans out and the header (write-path attestation) carries") {
    val wh = freshWh("bkt")
    val df = skewedDays(hot = 4000)
      .withColumn("k", when(col("id") < 100000L, lit(7L)).otherwise(col("id")))
    withAdvisory("65536") {
      Snapshots.publish(spark, s"$wh/t", df, clusterBy = Some("bucket(4,k)"))
    }
    assert(Snapshots.clusterOf(spark, s"$wh/t", 1).contains("bucket(4,k)"))
    val byDir = Snapshots.files(spark, s"$wh/t", 1).groupBy(dirOf)
    assert(byDir.values.exists(_.size > 1), "the hot bucket should fan out across >1 file")
    val got = spark.read.format("graft-snapshot").option("root", s"$wh/t").load()
    assert(got.count() == 4080)
  }

  test("sorted layout keeps strict routing: one file per group even under a tiny advisory") {
    val wh = freshWh("sorted")
    val df = skewedDays(hot = 4000)
      .withColumn("g", when(col("id") < 100000L, lit("hot")).otherwise(lit("cold")))
    withAdvisory("65536") {
      Snapshots.publish(spark, s"$wh/t", df,
        clusterBy = Some("g"), sortBy = Some("id"))
    }
    val byDir = Snapshots.files(spark, s"$wh/t", 1).groupBy(dirOf)
    byDir.foreach { case (d, fs) =>
      assert(fs.size == 1,
        s"sorted group $d must stay one strict task (envelope proof), got ${fs.size} files")
    }
    assert(Snapshots.sortOf(spark, s"$wh/t", 1).contains("id"))
  }

  test("SQL UPDATE CoW rewrite inherits the fan-out: a hot key rewrites across tasks") {
    // the row-level write path (SupportsRowLevelOperations) reads
    // affected files WHOLE, so its split granularity is the stored
    // layout's file count — the publish-side fan-out is what keeps a
    // hot group's REWRITE parallel too. Publish under a small advisory
    // (hot group lands as several files), UPDATE it, and the
    // replacement generation must stay multi-file with the header
    // carried by the per-file footer re-proof.
    val wh = freshWh("dml")
    val df = skewedDays(hot = 4000)
      .withColumn("g", when(col("id") < 100000L, lit("hot")).otherwise(
        concat(lit("c"), (col("id") % 4).cast("string"))))
    spark.conf.set("spark.sql.catalog.wskew",
      classOf[graft.sources.SnapshotCatalog].getName)
    spark.conf.set("spark.sql.catalog.wskew.warehouse", wh)
    try withAdvisory("65536") {
      Snapshots.publish(spark, s"$wh/t", df, clusterBy = Some("g"))
      // identity split dirs are md5 digests of the key tuple, not raw values
      val hotDigest = spark.range(1)
        .select(md5(to_json(struct(lit("hot").as("g"))))).head.getString(0)
      val hotBefore = Snapshots.files(spark, s"$wh/t", 1)
        .count(_.contains(s"__cluster=$hotDigest"))
      assert(hotBefore > 1, s"publish fan-out is the premise, got $hotBefore")
      spark.sql("UPDATE wskew.t SET id = id + 1 WHERE id >= 0")
      val v = Snapshots.versions(spark, s"$wh/t").last
      val after = Snapshots.files(spark, s"$wh/t", v)
      // replacement files are flat (executor writes, no partitionBy) —
      // 4 cold single-key files plus the hot key's slices
      assert(after.size > 5,
        s"hot key must rewrite across >1 task (got ${after.size} files total)")
      assert(Snapshots.clusterOf(spark, s"$wh/t", v).contains("g"),
        "the footer re-proof must carry the header over the fanned-out rewrite")
      val got = spark.table("wskew.t")
      assert(got.count() == 4080)
      assert(got.filter(col("g") === "hot").count() == 4000)
    } finally {
      spark.conf.unset("spark.sql.catalog.wskew")
      spark.conf.unset("spark.sql.catalog.wskew.warehouse")
    }
  }

  test("default advisory (64 MB): small-scale publishes still land one file per group") {
    val wh = freshWh("default")
    Snapshots.publish(spark, s"$wh/t", skewedDays(hot = 400), clusterBy = Some("days(ts)"))
    val byDir = Snapshots.files(spark, s"$wh/t", 1).groupBy(dirOf)
    byDir.foreach { case (d, fs) =>
      assert(fs.size == 1, s"group $d split below the advisory size: ${fs.size} files")
    }
  }
}
