package graft

import graft.operators.Snapshots

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** SORTED clustered snapshot layout (`Snapshots.publish(clusterBy,
  * sortBy)`): every data file is written internally ascending by the
  * sort columns (manifest `#sort=` header attests it), the DSv2 scan
  * completes the proof inter-file from footer-stat envelopes and plans
  * ONE envelope-ordered partition per key group, and reports output
  * ordering `(clusterKeys..., sortCols...)` — so a window PARTITION BY
  * key ORDER BY sortCol or a sort-merge join on the full prefix runs
  * with ZERO exchange and ZERO sort, the full sorted-bucket shape.
  * Every claim is pinned on the EXECUTED plan with row equality against
  * the ordinary shuffled+sorted recompute; every degrade path (an
  * overlapping append, hot-key fan-out planning, a plain append) must
  * keep answers right while the claim quietly narrows.
  */
class SortedLayoutSpec extends AnyFunSuite {
  import SparkTestEnv._
  import spark.implicits._

  private def freshRoot(tag: String): String = {
    val p = java.nio.file.Files.createTempDirectory(s"graft-sorted-$tag")
    p.toFile.deleteOnExit()
    p.toString
  }

  private def readSource(root: String): DataFrame =
    spark.read.format("graft-snapshot").option("root", root).load()

  private def planCounts(df: DataFrame): (Int, Int) = {
    df.collect()
    (PlanOps.shuffleCount(df), PlanOps.sortCount(df))
  }

  private def withConf[A](pairs: (String, String)*)(body: => A): A = {
    val prev = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  /** 7 keys × unique ascending s per key; x is a payload. */
  private def frame(lo: Int, hi: Int): DataFrame =
    (lo to hi).map(i => (i % 7, i, i * 1.5)).toDF("k", "s", "x")

  test("sortBy validation: needs clusterBy, real non-cluster columns, provable types") {
    val root = freshRoot("val")
    val df = frame(1, 100)
    intercept[IllegalArgumentException] {
      Snapshots.publish(spark, root, df, sortBy = Some("s"))
    }
    intercept[IllegalArgumentException] {
      Snapshots.publish(spark, root, df, clusterBy = Some("k"), sortBy = Some("k"))
    }
    intercept[IllegalArgumentException] {
      Snapshots.publish(spark, root, df, clusterBy = Some("k"), sortBy = Some("nope"))
    }
    intercept[IllegalArgumentException] {
      Snapshots.publish(spark, root, df.withColumn("arr", array(col("s"))),
        clusterBy = Some("k"), sortBy = Some("arr"))
    }
    assert(Snapshots.versions(spark, root).isEmpty, "a refused publish must not commit")
  }

  test("header lifecycle: recorded, append-carried, plain-append-dropped, mismatch-refused") {
    val root = freshRoot("hdr")
    Snapshots.publish(spark, root, frame(1, 500), clusterBy = Some("k"), sortBy = Some("s"))
    assert(Snapshots.sortOf(spark, root, 1).contains("s"))
    // sorted append onto the same spec carries
    Snapshots.publish(spark, root, frame(501, 900), append = true,
      clusterBy = Some("k"), sortBy = Some("s"))
    assert(Snapshots.sortOf(spark, root, 2).contains("s"))
    // a DIFFERENT sort spec refuses (the base's files aren't ordered by it)
    intercept[IllegalArgumentException] {
      Snapshots.publish(spark, root, frame(901, 1000), append = true,
        clusterBy = Some("k"), sortBy = Some("x"))
    }
    // a plain (unsorted) append silently drops the attestation
    Snapshots.publish(spark, root, frame(901, 1000), append = true,
      clusterBy = Some("k"))
    assert(Snapshots.sortOf(spark, root, 3).isEmpty)
    // and sorted-append onto the now-unsorted base refuses
    intercept[IllegalArgumentException] {
      Snapshots.publish(spark, root, frame(1001, 1100), append = true,
        clusterBy = Some("k"), sortBy = Some("s"))
    }
  }

  test("window over (key, sortCol): zero exchange, zero sort, rows equal the recompute") {
    val root = freshRoot("win")
    // two sorted appends -> every key group holds MULTIPLE files with
    // disjoint s-envelopes; the scan must plan each group as one
    // envelope-ordered partition or Spark drops the ordering claim
    Snapshots.publish(spark, root, frame(1, 2000), clusterBy = Some("k"), sortBy = Some("s"))
    Snapshots.publish(spark, root, frame(2001, 4000), append = true,
      clusterBy = Some("k"), sortBy = Some("s"))
    assert(Snapshots.files(spark, root, 2).size > 7, "expected >1 file per key group")
    val w = Window.partitionBy("k").orderBy("s")
    val q = readSource(root).withColumn("rn", row_number().over(w))
    val (sh, so) = planCounts(q)
    assert(sh == 0 && so == 0,
      s"expected exchange-free AND sort-free window, got $sh shuffles / $so sorts:\n" +
        q.queryExecution.executedPlan)
    val got = q.select("k", "s", "rn").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getInt(2))).sortBy(t => (t._1, t._2)).toSeq
    val expect = frame(1, 4000).withColumn("rn", row_number().over(w))
      .select("k", "s", "rn").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getInt(2))).sortBy(t => (t._1, t._2)).toSeq
    assert(got == expect)
  }

  test("sorted-bucket join on (key, sortCol): zero exchange, zero sort, rows equal") {
    val rootA = freshRoot("smbA")
    val rootB = freshRoot("smbB")
    Snapshots.publish(spark, rootA, frame(1, 2000), clusterBy = Some("k"), sortBy = Some("s"))
    Snapshots.publish(spark, rootB, frame(1, 2000).withColumnRenamed("x", "y"),
      clusterBy = Some("k"), sortBy = Some("s"))
    withConf(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      // join keys (k,s) are a SUPERSET of the partition keys (k):
      // key-grouped co-partitioning on k alone still co-locates every
      // (k,s) match, but Spark's default demands ALL join keys be
      // partition keys — relax it to get the classic sorted-bucket join
      "spark.sql.requireAllClusterKeysForCoPartition" -> "false") {
      val j = readSource(rootA).join(readSource(rootB), Seq("k", "s"))
      val (sh, so) = planCounts(j)
      assert(sh == 0 && so == 0,
        s"expected the exchange-free sort-free SMB join, got $sh shuffles / $so sorts:\n" +
          j.queryExecution.executedPlan)
      val got = j.orderBy("k", "s").collect().map(_.toSeq).toSeq
      val expect = frame(1, 2000)
        .join(frame(1, 2000).withColumnRenamed("x", "y"), Seq("k", "s"))
        .orderBy("k", "s").collect().map(_.toSeq).toSeq
      assert(got == expect)
    }
  }

  test("overlapping append keeps the header but the scan degrades to key-only ordering") {
    val root = freshRoot("ovl")
    Snapshots.publish(spark, root, frame(1, 2000), clusterBy = Some("k"), sortBy = Some("s"))
    // same s-range again: per-group envelopes overlap, the inter-file
    // proof fails, ordering claim narrows to the constant key — the sort
    // REAPPEARS and the answer stays right
    Snapshots.publish(spark, root, frame(1, 1500).withColumn("s", col("s") + lit(1000)),
      append = true, clusterBy = Some("k"), sortBy = Some("s"))
    assert(Snapshots.sortOf(spark, root, 2).contains("s"))
    val w = Window.partitionBy("k").orderBy("s")
    val q = readSource(root).withColumn("rn", row_number().over(w))
    val (sh, so) = planCounts(q)
    assert(sh == 0, s"cluster grouping must survive the failed sort proof: $sh shuffles")
    assert(so >= 1, "an unprovable order must re-sort — a free-rider claim here " +
      "would return wrongly-ordered window frames")
    assert(q.count() == 3500)
  }

  test("hot-key fan-out planning wins over sortedness when explicitly enabled") {
    val root = freshRoot("fan")
    Snapshots.publish(spark, root, frame(1, 2000), clusterBy = Some("k"), sortBy = Some("s"))
    Snapshots.publish(spark, root, frame(2001, 4000), append = true,
      clusterBy = Some("k"), sortBy = Some("s"))
    val w = Window.partitionBy("k").orderBy("s")
    withConf(
      "spark.sql.sources.v2.bucketing.partiallyClusteredDistribution.enabled" -> "true") {
      val q = readSource(root).withColumn("rn", row_number().over(w))
      val (sh, so) = planCounts(q)
      // split planning retained (still exchange-free for the window's
      // clustering), ordering claim honestly dropped
      assert(sh == 0 && so >= 1,
        s"fan-out mode must keep splits and re-sort, got $sh shuffles / $so sorts")
      assert(q.count() == 4000)
    }
  }

  test("schema evolution and rollback carry the attestation with the files") {
    val root = freshRoot("maint")
    Snapshots.publish(spark, root, frame(1, 2000), clusterBy = Some("k"), sortBy = Some("s"))
    // evolution is file-preserving: the header carries
    val s0 = readSource(root).schema
    Snapshots.evolveSchema(spark, root,
      org.apache.spark.sql.types.StructType(s0.fields :+
        org.apache.spark.sql.types.StructField("note",
          org.apache.spark.sql.types.StringType, nullable = true)))
    assert(Snapshots.sortOf(spark, root, 2).contains("s"),
      "a file-preserving evolution must keep the sorted-layout header")
    // an unsorted append drops it; rollback to the sorted version
    // restores the attestation together with the files it attests
    Snapshots.publish(spark, root, frame(2001, 2200).withColumn("note", lit("x")),
      append = true, clusterBy = Some("k"))
    assert(Snapshots.sortOf(spark, root, 3).isEmpty)
    val vr = Snapshots.rollback(spark, root, 2)
    assert(Snapshots.sortOf(spark, root, vr).contains("s"))
    val w = Window.partitionBy("k").orderBy("s")
    val q = readSource(root).withColumn("rn", row_number().over(w))
    val (sh, so) = planCounts(q)
    assert(sh == 0 && so == 0, s"rolled-back sorted version must plan sort-free " +
      s"($sh shuffles / $so sorts)")
  }

  test("compaction RESTORES sort-free planning after an overlapping append") {
    val root = freshRoot("comp")
    Snapshots.publish(spark, root, frame(1, 2000), clusterBy = Some("k"), sortBy = Some("s"))
    // overlapping envelopes: the scan's order proof fails, sort reappears
    Snapshots.publish(spark, root, frame(1, 1500).withColumn("s", col("s") + lit(700)),
      append = true, clusterBy = Some("k"), sortBy = Some("s"))
    val w = Window.partitionBy("k").orderBy("s")
    val degraded = readSource(root).withColumn("rn", row_number().over(w))
    assert(planCounts(degraded)._2 >= 1, "overlap must degrade before the compact")
    // compact rewrites each group to ONE internally-ordered file through
    // the sorted publish: attestation kept, proof trivial again
    Snapshots.compact(spark, root)
    val vc = Snapshots.versions(spark, root).last
    assert(Snapshots.sortOf(spark, root, vc).contains("s"),
      "compaction of a sorted table must re-sort and keep the attestation")
    val q = readSource(root).withColumn("rn", row_number().over(w))
    val (sh, so) = planCounts(q)
    assert(sh == 0 && so == 0,
      s"post-compact window must be exchange-free and sort-free ($sh/$so):\n" +
        q.queryExecution.executedPlan)
    assert(q.count() == 3500)
  }

  test("SQL INSERT INTO and CoW MERGE keep the sorted layout") {
    val wh = freshRoot("dml")
    val root = s"$wh/t"
    Snapshots.publish(spark, root, frame(1, 2000), clusterBy = Some("k"), sortBy = Some("s"))
    // SQL INSERT writes through the sorted publish: header carried
    withConf(
      "spark.sql.catalog.sortdml" -> classOf[graft.sources.SnapshotCatalog].getName,
      "spark.sql.catalog.sortdml.warehouse" -> wh) {
      spark.sql("INSERT INTO sortdml.t SELECT k, s + 10000 AS s, x FROM sortdml.t")
      val v2 = Snapshots.versions(spark, root).last
      assert(Snapshots.sortOf(spark, root, v2).contains("s"),
        "INSERT INTO a sorted table must keep the attestation")
    }
    // the inserted range is disjoint (s+10000): still fully proved
    val w = Window.partitionBy("k").orderBy("s")
    val q = readSource(root).withColumn("rn", row_number().over(w))
    val (sh, so) = planCounts(q)
    assert(sh == 0 && so == 0, s"post-INSERT window must stay sort-free ($sh/$so)")
    // CoW mergeByKey rewrites touched files internally ordered: header
    // carried, untouched groups keep their proof
    Snapshots.mergeByKey(spark, root,
      frame(1, 50).withColumn("x", col("x") * 2), keyCols = Seq("k", "s"))
    val vm = Snapshots.versions(spark, root).last
    assert(Snapshots.sortOf(spark, root, vm).contains("s"),
      "mergeByKey into a sorted table must keep the attestation")
    // the merge's replacement file re-spans [1..2000] per group — still
    // disjoint from the insert's [10001..12000] file, so the proof holds
    val after = readSource(root).withColumn("rn", row_number().over(w))
    val (sh2, so2) = planCounts(after)
    assert(sh2 == 0 && so2 == 0, s"post-merge window must stay sort-free ($sh2/$so2)")
    assert(after.count() == 4000)
    // updated rows really carry the merge
    assert(readSource(root).filter(col("s") === 37).select("x").head().getDouble(0)
      == 37 * 1.5 * 2)
  }

  test("streaming ingest declares and keeps a sorted layout (sortColumns option)") {
    val src = freshRoot("ssrc")
    val dst = freshRoot("sdst")
    val ck = java.nio.file.Files.createTempDirectory("graft-sortck").toString
    Snapshots.publish(spark, src, frame(1, 2000))
    def drain(): Unit = {
      val q = spark.readStream.format("graft-snapshot").option("root", src).load()
        .writeStream.format("graft-snapshot").option("root", dst)
        .partitionBy("k").option("sortColumns", "s")
        .option("checkpointLocation", ck)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      try q.awaitTermination(300000) finally q.stop()
    }
    drain()
    assert(Snapshots.sortOf(spark, dst, Snapshots.versions(spark, dst).last)
      .contains("s"), "a fresh streamed root must take the declared sort layout")
    // a later disjoint increment appends sorted through the carried header
    Snapshots.publish(spark, src, frame(2001, 4000), append = true)
    drain()
    assert(Snapshots.versions(spark, dst).size >= 2)
    assert(Snapshots.sortOf(spark, dst, Snapshots.versions(spark, dst).last)
      .contains("s"), "continuous ingest must keep the attestation")
    val w = Window.partitionBy("k").orderBy("s")
    val q = readSource(dst).withColumn("rn", row_number().over(w))
    val (sh, so) = planCounts(q)
    assert(sh == 0 && so == 0,
      s"stream-ingested sorted table must window sort-free ($sh/$so)")
    assert(q.count() == 4000)
  }

  /** Sorted-WITHIN-BUCKET (the Hive/Iceberg bucketed-sorted SMB shape):
    * sortBy composes with bucket clustering, the raw key is a legal —
    * and the canonical — sort column, and the scan claims per-partition
    * ordering by the sort columns alone (the bucket key is not
    * constant), giving zero-exchange zero-sort merge joins at unbounded
    * key cardinality. Degrades exactly like the identity form: an
    * overlapping append brings the sort back (rows stay right), compact
    * restores the claim.
    */
  test("sorted-within-bucket: SMB join zero-exchange zero-sort; overlap degrades; compact restores") {
    val wh = freshRoot("bktsmb")
    def pub(root: String, lo: Int, hi: Int, append: Boolean): Unit =
      Snapshots.publish(spark, root, frame(lo, hi)
          .withColumnRenamed("s", "key").withColumnRenamed("k", "g"),
        append = append, clusterBy = Some("bucket(4, key)"), sortBy = Some("key"))
    // two key-range appends: every bucket holds 2 envelope-disjoint files
    pub(s"$wh/l", 1, 500, append = false); pub(s"$wh/l", 501, 1000, append = true)
    pub(s"$wh/r", 1, 500, append = false); pub(s"$wh/r", 501, 1000, append = true)
    assert(Snapshots.sortOf(spark, s"$wh/l", 2).contains("key"))
    spark.conf.set("spark.sql.catalog.sbkt",
      classOf[graft.sources.SnapshotCatalog].getName)
    spark.conf.set("spark.sql.catalog.sbkt.warehouse", wh)
    try withConf("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val j = spark.table("sbkt.l").select(col("key"), col("x").as("xl"))
        .join(spark.table("sbkt.r").select(col("key"), col("x").as("xr"))
          .hint("merge"), "key")
      val (sh, so) = planCounts(j)
      assert(sh == 0, s"sorted-bucket SMB join must be exchange-free, got $sh")
      assert(so == 0, s"sorted-bucket SMB join must be sort-free, got $so")
      assert(j.count() == 1000)
      // an OVERLAPPING append (same key range again) keeps answers right
      // but the inter-file envelope proof fails for every bucket: the
      // claim degrades, the join re-sorts, nothing breaks
      pub(s"$wh/l", 1, 500, append = true)
      val j2 = spark.table("sbkt.l").select(col("key"), col("x").as("xl"))
        .join(spark.table("sbkt.r").select(col("key"), col("x").as("xr"))
          .hint("merge"), "key")
      val (_, so2) = planCounts(j2)
      assert(so2 > 0, "overlapping envelopes must degrade the ordering claim")
      assert(j2.count() == 1500)
      // compact folds each bucket back to one sorted file: claim restored
      Snapshots.compact(spark, s"$wh/l")
      val j3 = spark.table("sbkt.l").select(col("key"), col("x").as("xl"))
        .join(spark.table("sbkt.r").select(col("key"), col("x").as("xr"))
          .hint("merge"), "key")
      val (sh3, so3) = planCounts(j3)
      assert(sh3 == 0 && so3 == 0,
        s"compact must restore sort-free SMB planning, got ($sh3, $so3)")
      assert(j3.count() == 1500)
    } finally {
      spark.conf.unset("spark.sql.catalog.sbkt")
      spark.conf.unset("spark.sql.catalog.sbkt.warehouse")
    }
  }

  test("sortBy composes with bucket but still refuses time transforms") {
    val root = freshRoot("bktval")
    val df = frame(1, 100)
      .withColumn("ts", expr("timestamp_micros(cast(s * 1000000 as long))"))
    val e = intercept[IllegalArgumentException] {
      Snapshots.publish(spark, root, df, clusterBy = Some("days(ts)"),
        sortBy = Some("s"))
    }
    assert(e.getMessage.contains("time-transform"))
    assert(Snapshots.versions(spark, root).isEmpty)
  }
}
