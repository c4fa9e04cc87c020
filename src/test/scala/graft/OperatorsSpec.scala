package graft

import graft.operators._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Behavioral specs for the migration/compaction/verification operators —
  * the properties the reference enforced operationally (skip-if-exists,
  * post-copy verification, merge preserves content).
  */
class OperatorsSpec extends AnyFunSuite {
  import SparkTestEnv._

  private def tmp(): String = Files.createTempDirectory("graft-spec").toString

  test("mergeByKey touches only delta partitions; emptied partitions are removed") {
    val dest = tmp() + "/dest"
    val orders = Tables.load(spark, sf, "orders")
      .withColumn("par_key", date_format(col("o_orderdate"), "yyyyMM"))
    orders.write.partitionBy("par_key").mode("overwrite").parquet(dest)
    val months = orders.select("par_key").distinct()
      .orderBy("par_key").collect().map(_.getString(0))
    assert(months.length >= 3, "fixture needs >= 3 months")
    val (mUpd, mDel, mQuiet) = (months(0), months(1), months(2))
    def leafStatus(m: String): Seq[(String, Long, Long)] = {
      val fs = new org.apache.hadoop.fs.Path(dest)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.listStatus(new org.apache.hadoop.fs.Path(s"$dest/par_key=$m"))
        .map(st => (st.getPath.toString, st.getLen, st.getModificationTime)).toSeq.sortBy(_._1)
    }
    val quietBefore = leafStatus(mQuiet)
    val updKeys = orders.filter(col("par_key") === mUpd)
      .select("o_orderkey").limit(3).collect().map(_.getLong(0)).toSet
    // delta: bump 3 keys in mUpd, tombstone EVERY row of mDel
    val upd = orders.filter(col("o_orderkey").isin(updKeys.toSeq: _*))
      .withColumn("o_totalprice", lit(42.0)).withColumn("deleted", lit(false))
    val del = orders.filter(col("par_key") === mDel).withColumn("deleted", lit(true))
    val st = Upsert.mergeByKey(spark, dest, upd.unionByName(del),
      keyCols = Seq("o_orderkey"), partNames = Seq("par_key"),
      tombstoneCol = Some("deleted"))
    assert(st.partsTouched == 2 && st.partsRemoved == 1, s"stats: $st")
    // untouched partition: byte-identical file list (names, lengths, mtimes)
    assert(leafStatus(mQuiet) == quietBefore, "quiet partition was rewritten")
    val after = spark.read.parquet(dest)
      .withColumn("par_key", col("par_key").cast("string"))
    // tombstoned month is GONE (dir removed, rows absent)
    assert(after.filter(col("par_key") === mDel).count() == 0)
    assert(!new java.io.File(s"$dest/par_key=$mDel").exists(), "emptied dir not removed")
    // updates applied in place; everything else in mUpd preserved
    val bumped = after.filter(col("o_orderkey").isin(updKeys.toSeq: _*))
    assert(bumped.count() == updKeys.size &&
      bumped.collect().forall(_.getAs[Double]("o_totalprice") == 42.0))
    assert(after.filter(col("par_key") === mUpd).count() ==
      orders.filter(col("par_key") === mUpd).count())
    // bootstrap: merging into a missing path is a plain load
    val fresh = tmp() + "/fresh"
    val st2 = Upsert.mergeByKey(spark, fresh, upd,
      Seq("o_orderkey"), Seq("par_key"), Some("deleted"))
    assert(st2.rowsWritten == updKeys.size &&
      spark.read.parquet(fresh).count() == updKeys.size)
  }

  test("mergeByKey refuses an ambiguous delta (update + tombstone for one key)") {
    val dest = tmp() + "/dest"
    val orders = Tables.load(spark, sf, "orders").limit(50)
      .withColumn("par_key", date_format(col("o_orderdate"), "yyyyMM"))
    orders.write.partitionBy("par_key").mode("overwrite").parquet(dest)
    val one = orders.orderBy("o_orderkey").limit(1)
    val ambiguous = one.withColumn("deleted", lit(false))
      .unionByName(one.withColumn("deleted", lit(true)))
    val e = intercept[IllegalArgumentException] {
      Upsert.mergeByKey(spark, dest, ambiguous,
        Seq("o_orderkey"), Seq("par_key"), Some("deleted"))
    }
    assert(e.getMessage.contains("multiple rows"))
    assert(spark.read.parquet(dest).count() == 50, "failed merge must not mutate dest")
  }

  test("mergeByKey enforces key locality: a key moved to an untouched partition fails loudly") {
    val dest = tmp() + "/dest"
    val orders = Tables.load(spark, sf, "orders").limit(200)
      .withColumn("par_key", date_format(col("o_orderdate"), "yyyyMM"))
    orders.write.partitionBy("par_key").mode("overwrite").parquet(dest)
    val months = orders.select("par_key").distinct()
      .orderBy("par_key").collect().map(_.getString(0))
    assert(months.length >= 3, "fixture needs >= 3 months")
    val (mA, mB) = (months(0), months(1))
    val victim = orders.filter(col("par_key") === mA).limit(1)
    val victimKey = victim.head.getAs[Long]("o_orderkey")
    // the delta routes mA's key to mB and never touches mA: merging would
    // strand the mA copy, so the pre-flight check must refuse
    val moved = victim.withColumn("par_key", lit(mB)).withColumn("deleted", lit(false))
    val e = intercept[IllegalStateException] {
      Upsert.mergeByKey(spark, dest, moved,
        Seq("o_orderkey"), Seq("par_key"), Some("deleted"))
    }
    assert(e.getMessage.contains("moved key") && e.getMessage.contains(s"par_key=$mA"),
      s"error must carry the evidence: ${e.getMessage}")
    assert(spark.read.parquet(dest).count() == 200, "failed merge must not mutate dest")
    // the same key routed to its OWN partition passes the probe (envelopes
    // of sibling months overlap on o_orderkey, so this exercises the
    // row-level clearing path, not just the metadata prune)
    val inPlace = victim.withColumn("o_totalprice", lit(1.0))
      .withColumn("deleted", lit(false))
    Upsert.mergeByKey(spark, dest, inPlace,
      Seq("o_orderkey"), Seq("par_key"), Some("deleted"))
    // a move BETWEEN two partitions the delta touches routes correctly:
    // both are rewritten and the survivors anti-join drops the old copy
    val touchBoth = moved.unionByName(
      orders.filter(col("par_key") === mA && col("o_orderkey") =!= victimKey)
        .limit(1).withColumn("deleted", lit(false)))
    Upsert.mergeByKey(spark, dest, touchBoth,
      Seq("o_orderkey"), Seq("par_key"), Some("deleted"))
    val afterMove = spark.read.parquet(dest)
      .filter(col("o_orderkey") === victimKey)
      .select(col("par_key").cast("string")).collect().map(_.getString(0))
    assert(afterMove.toSeq == Seq(mB), s"moved key must exist once, in $mB: ${afterMove.toSeq}")
    // verifyKeyLocality=false documents the hazard the check exists for:
    // the same move back to mA now silently strands the mB copy
    val movedBack = spark.read.parquet(dest).filter(col("o_orderkey") === victimKey)
      .withColumn("par_key", lit(mA)).withColumn("deleted", lit(false))
    Upsert.mergeByKey(spark, dest, movedBack,
      Seq("o_orderkey"), Seq("par_key"), Some("deleted"), verifyKeyLocality = false)
    assert(spark.read.parquet(dest).filter(col("o_orderkey") === victimKey).count() == 2,
      "with the check disabled the old copy is stranded — the documented hazard")
  }

  test("bloom-pruned semi/anti joins equal the exact joins, incl. NULL probe keys") {
    import spark.implicits._
    // probe with NULL keys and keys absent from the build side; string keys
    // exercise the UTF-8 probe path
    val probe = Seq[(java.lang.Long, String)](
      (1L, "a"), (2L, "b"), (3L, "c"), (null, "nullkey"), (100L, "x"), (2L, "b2"))
      .toDF("k", "tag")
    val build = Seq(1L, 2L, 7L).toDF("bk")
    val semi = BloomPrune.semiJoin(probe, build, "k", "bk", expectedKeys = 100)
    val anti = BloomPrune.antiJoin(probe, build, "k", "bk", expectedKeys = 100)
    val semiExact = probe.join(build, col("k") === col("bk"), "left_semi")
    val antiExact = probe.join(build, col("k") === col("bk"), "left_anti")
    assert(semi.collect().map(_.toString).sorted.toSeq ==
      semiExact.collect().map(_.toString).sorted.toSeq)
    assert(anti.collect().map(_.toString).sorted.toSeq ==
      antiExact.collect().map(_.toString).sorted.toSeq)
    // NULL key must survive the anti (never equi-matches) and miss the semi
    assert(anti.filter(col("tag") === "nullkey").count() == 1)
    assert(semi.filter(col("tag") === "nullkey").count() == 0)
    // string-key path: build a filter over strings and probe it
    val sBuild = Seq("a", "b").toDF("sk")
    val sSemi = BloomPrune.semiJoin(probe.filter(col("tag").isNotNull), sBuild,
      "tag", "sk", expectedKeys = 100)
    assert(sSemi.select("tag").as[String].collect().sorted.toSeq == Seq("a", "b"))
    // a 1-bit-tight filter still yields exact results (false positives are
    // removed by the exact join) — fpp close to 1 forces collisions
    val tight = BloomPrune.semiJoin(probe, build, "k", "bk",
      expectedKeys = 2, fpp = 0.5)
    assert(tight.collect().map(_.toString).sorted.toSeq ==
      semiExact.collect().map(_.toString).sorted.toSeq)
    // SAME-NAMED keys on both sides (the common join shape) must not hit
    // AMBIGUOUS_REFERENCE — the operator aliases the build key internally
    val sameName = Seq(1L, 2L, 7L).toDF("k")
    assert(BloomPrune.semiJoin(probe, sameName, "k", "k", expectedKeys = 100)
      .select("tag").as[String].collect().sorted.toSeq == Seq("a", "b", "b2"))
    assert(BloomPrune.antiJoin(probe, sameName, "k", "k", expectedKeys = 100)
      .select("tag").as[String].collect().sorted.toSeq == Seq("c", "nullkey", "x"))
  }

  test("CLI upsert verb merges a delta end-to-end (derived partition key)") {
    val base = tmp()
    val srcDB = s"$base/db"; new java.io.File(s"$srcDB").mkdirs()
    // table lives at db/orders (partitioned layout, the CLI's path mode)
    val orders = Tables.load(spark, sf, "orders").limit(200)
      .withColumn("par_key", date_format(col("o_orderdate"), "yyyyMM"))
    orders.write.partitionBy("par_key").mode("overwrite").parquet(s"$srcDB/orders")
    // delta WITHOUT par_key: one update + one tombstone; the CLI derives
    // the partition key from -dateCol/-pp
    val rows = orders.orderBy("o_orderkey").limit(2).drop("par_key").collect()
    val delta = spark.createDataFrame(
        spark.sparkContext.parallelize(rows.toIndexedSeq), orders.drop("par_key").schema)
      .withColumn("deleted", col("o_orderkey") === rows(1).getLong(0))
      .withColumn("o_totalprice",
        when(col("o_orderkey") === rows(0).getLong(0), 999.0).otherwise(col("o_totalprice")))
    delta.write.mode("overwrite").parquet(s"$base/delta")
    graft.cli.Main.run("upsert", Map(
        "srcDB" -> srcDB, "table" -> "orders", "delta" -> s"$base/delta",
        "keys" -> "o_orderkey", "tombstone" -> "deleted",
        "dateCol" -> "o_orderdate", "pp" -> "yyyyMM"),
      spark, new Alerter.Collecting)
    val after = spark.read.parquet(s"$srcDB/orders")
    assert(after.filter(col("o_orderkey") === rows(0).getLong(0))
      .head.getAs[Double]("o_totalprice") == 999.0)
    assert(after.filter(col("o_orderkey") === rows(1).getLong(0)).count() == 0)
    assert(after.count() == 199)
  }

  test("migrateRange is idempotent: second run leaves an identical manifest") {
    val dest = tmp() + "/dest"
    val src = s"$sf/lineitem.parquet"
    Migrate.migrateRange(spark, src, dest, "l_shipdate", "1996-03-01", "1996-03-31")
    val m1 = spark.read.parquet(dest).groupBy("par_key")
      .agg(count(lit(1)).as("n"), sum("l_quantity").as("s")).collect().toSet
    Migrate.migrateRange(spark, src, dest, "l_shipdate", "1996-03-01", "1996-03-31")
    val m2 = spark.read.parquet(dest).groupBy("par_key")
      .agg(count(lit(1)).as("n"), sum("l_quantity").as("s")).collect().toSet
    assert(m1 == m2 && m1.nonEmpty)
  }

  test("migrateRange skipExisting skips overlapping partitions and alerts") {
    val dest = tmp() + "/dest"
    val src = s"$sf/lineitem.parquet"
    Migrate.migrateRange(spark, src, dest, "l_shipdate", "1996-03-01", "1996-03-10")
    val alerts = new Alerter.Collecting
    val r = Migrate.migrateRange(spark, src, dest, "l_shipdate", "1996-03-05", "1996-03-15",
      skipExisting = true, alerter = alerts)
    assert(r.partitionsSkipped > 0)
    assert(alerts.all.nonEmpty && alerts.all.forall(_._1 == "migrate.skip"))
    // days 05..10 written once only — row counts still match source exactly
    val got = spark.read.parquet(dest).count()
    val want = spark.read.parquet(src)
      .filter(col("l_shipdate") >= lit("1996-03-01").cast("timestamp") &&
        col("l_shipdate") < lit("1996-03-16").cast("timestamp")).count()
    assert(got == want)
  }

  test("reconcile detects a dropped row and a mutated value") {
    val src = Tables.load(spark, sf, "orders")
    val key = date_format(col("o_orderdate"), "yyyyMM")
    val clean = Reconcile.diff(Reconcile.manifest(src, key), Reconcile.manifest(src, key))
    assert(clean.filter(col("status") =!= "ok").count() == 0)

    val dropped = src.orderBy("o_orderkey").limit(1)
    val dstMissing = src.exceptAll(dropped)
    val d1 = Reconcile.diff(Reconcile.manifest(src, key), Reconcile.manifest(dstMissing, key))
    assert(d1.filter(col("status") === "count_mismatch").count() == 1)

    val mutated = src.withColumn("o_totalprice",
      when(col("o_orderkey") === 1, col("o_totalprice") + 1).otherwise(col("o_totalprice")))
    val d2 = Reconcile.diff(Reconcile.manifest(src, key), Reconcile.manifest(mutated, key))
    assert(d2.filter(col("status") === "checksum_mismatch").count() == 1)
  }

  test("compact rewrite preserves the row multiset and reduces file count") {
    val frag = tmp() + "/frag"
    val dest = tmp() + "/compacted"
    // fragment: write orders as many small files
    Tables.load(spark, sf, "orders").repartition(40).write.parquet(frag)
    val stats = Compact.rewrite(spark, frag, dest)
    assert(stats.filesBefore == 40)
    assert(stats.filesAfter < stats.filesBefore)
    val a = spark.read.parquet(frag).agg(count(lit(1)), sum("o_totalprice")).collect()(0)
    val b = spark.read.parquet(dest).agg(count(lit(1)), sum("o_totalprice")).collect()(0)
    assert(a.getLong(0) == b.getLong(0))
    assert(math.abs(a.getDouble(1) - b.getDouble(1)) < 1e-6)
  }

  test("compact split path preserves NULL-partition rows (null-safe join)") {
    val frag = tmp() + "/frag"
    val dest = tmp() + "/dest"
    spark.range(5000).select(
        when(col("id") % 10 === 0, lit(null))
          .otherwise(lit("1996-01-15 00:00:00")).cast("timestamp").as("d"),
        col("id").as("v"))
      .write.parquet(frag)
    // tiny target forces the salted/split path; a plain inner equi-join on
    // the partition key would silently drop the 500 NULL-key rows
    Compact.rewritePartitioned(spark, frag, dest,
      partKeyCol = "d", pattern = "yyyy", targetBytes = 1024)
    val back = spark.read.parquet(dest)
    assert(back.count() == 5000)
    assert(back.filter(col("par_key").isNull).count() == 500)
  }

  test("skipExisting skips NULL-key partitions on re-run (null-safe join)") {
    val frag = tmp() + "/src"
    val dest = tmp() + "/dest"
    spark.range(100).select(
        when(col("id") % 2 === 0, lit(null))
          .otherwise(lit("1996-01-15 00:00:00")).cast("timestamp").as("d"),
        col("id").as("v"))
      .write.parquet(frag)
    Migrate.migrateAll(spark, frag, dest, "d", pattern = "yyyy")
    // the NULL partition landed as __HIVE_DEFAULT_PARTITION__; the re-run
    // must skip it like any other existing partition — a plain equi-join
    // never matches null and would re-migrate it on every run
    val alerts = new Alerter.Collecting
    val r = Migrate.migrateAll(spark, frag, dest, "d", pattern = "yyyy",
      skipExisting = true, alerter = alerts)
    assert(r.partitionsWritten == 0 && r.partitionsSkipped == 2)
    assert(alerts.all.exists(_._2.contains("__HIVE_DEFAULT_PARTITION__")))
  }

  test("re-compacting an already-compact destination rewrites nothing") {
    val frag = tmp() + "/frag"
    val dest = tmp() + "/dest"
    Tables.load(spark, sf, "orders").repartition(8).write.parquet(frag)
    val s1 = Compact.rewritePartitioned(spark, frag, dest, "o_orderdate", pattern = "yyyy")
    assert(s1.leavesSkipped == 0)
    def leafFiles(): Map[String, Set[(String, Long)]] =
      new java.io.File(dest).listFiles().filter(_.getName.startsWith("par_key="))
        .map(d => d.getName -> d.listFiles()
          .filter(f => !f.getName.startsWith("_") && !f.getName.startsWith("."))
          .map(f => (f.getName, f.lastModified())).toSet).toMap
    val before = leafFiles()
    assert(before.nonEmpty)
    // second run: every leaf is already ≤ ⌈bytes/target⌉ files → per-leaf
    // no-op (the reference's skip-.snappy semantics) — same file names,
    // counts, AND mtimes afterwards
    val s2 = Compact.rewritePartitioned(spark, frag, dest, "o_orderdate", pattern = "yyyy")
    assert(s2.leavesSkipped == before.size.toLong)
    assert(leafFiles() == before)
    // skipCompacted = false forces the full rewrite (source changed in place)
    val s3 = Compact.rewritePartitioned(spark, frag, dest, "o_orderdate", pattern = "yyyy",
      skipCompacted = false)
    assert(s3.leavesSkipped == 0)
    assert(leafFiles().keySet == before.keySet)
  }

  test("compact skips only the compact leaves; fragmented ones are rewritten") {
    val frag = tmp() + "/frag"
    val dest = tmp() + "/dest"
    val orders = Tables.load(spark, sf, "orders")
    orders.write.parquet(frag)
    Compact.rewritePartitioned(spark, frag, dest, "o_orderdate", pattern = "yyyy")
    // fragment ONE destination leaf in place (many tiny files)
    val leaf = new java.io.File(dest).listFiles()
      .filter(_.getName.startsWith("par_key=")).minBy(_.getName)
    val year = leaf.getName.stripPrefix("par_key=")
    // localCheckpoint materializes the rows BEFORE the overwrite deletes
    // the files being read
    spark.read.parquet(leaf.getPath).localCheckpoint().repartition(7)
      .write.mode("overwrite").parquet(leaf.getPath)
    val s = Compact.rewritePartitioned(spark, frag, dest, "o_orderdate", pattern = "yyyy")
    assert(s.leavesSkipped > 0 && s.leavesSkipped == before(dest).size - 1)
    // the fragmented leaf is compact again and content survived intact
    assert(new java.io.File(leaf.getPath).listFiles()
      .count(f => f.getName.endsWith(".parquet")) == 1)
    val want = orders.filter(date_format(col("o_orderdate"), "yyyy") === year).count()
    assert(spark.read.parquet(leaf.getPath).count() == want)
  }

  private def before(dest: String): Seq[String] =
    new java.io.File(dest).listFiles().toSeq
      .filter(_.getName.startsWith("par_key=")).map(_.getName)

  test("skip + split together: a rewritten leaf is not over-split by the skip ratio") {
    val frag = tmp() + "/frag"
    val dest = tmp() + "/dest"
    val orders = Tables.load(spark, sf, "orders")
    orders.write.parquet(frag)
    // small target so the salt path engages alongside the skip path
    val target = 4L * 1024
    Compact.rewritePartitioned(spark, frag, dest, "o_orderdate", pattern = "yyyy",
      targetBytes = target)
    val leaf = new java.io.File(dest).listFiles()
      .filter(_.getName.startsWith("par_key=")).minBy(_.getName)
    def leafDataFiles() = leaf.listFiles()
      .filter(f => !f.getName.startsWith("_") && !f.getName.startsWith("."))
    val leafBytes = leafDataFiles().map(_.length()).sum
    // fragment ONE leaf so only it is rewritten; the others are skipped —
    // bytes/row must stay a FULL-source estimate, or the lone rewritten
    // leaf splits by the skip ratio into a pile of small files
    spark.read.parquet(leaf.getPath).localCheckpoint().repartition(24)
      .write.mode("overwrite").parquet(leaf.getPath)
    val s = Compact.rewritePartitioned(spark, frag, dest, "o_orderdate", pattern = "yyyy",
      targetBytes = target)
    assert(s.leavesSkipped > 0)
    val want = math.max(1L, math.ceil(leafBytes.toDouble / target).toLong)
    val got = leafDataFiles().length.toLong
    assert(got <= want + 1, s"leaf over-split: $got files for ~$leafBytes bytes (target $target)")
    assert(got > 1, s"oversized leaf must still split: $got file(s)")
  }

  test("footer manifest: metadata-only triage agrees with data, catches truncation") {
    val dest = tmp() + "/dest"
    val dest2 = tmp() + "/dest2"
    val src = s"$sf/lineitem.parquet"
    Migrate.migrateRange(spark, src, dest, "l_shipdate", "1996-03-01", "1996-03-10")
    Migrate.migrateRange(spark, src, dest2, "l_shipdate", "1996-03-01", "1996-03-10")
    // footer row counts equal the data's actual per-partition counts —
    // without reading a single data page
    val fm = Reconcile.footerManifest(spark, dest).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    val actual = spark.read.parquet(dest).groupBy("par_key").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(fm == actual && fm.nonEmpty)
    // identical trees triage clean through the standard diff
    assert(Reconcile.isClean(
      Reconcile.footerManifest(spark, dest), Reconcile.footerManifest(spark, dest2)))
    // truncation (a lost data file) is caught at metadata cost
    val leaf = new java.io.File(dest2).listFiles().filter(_.getName.startsWith("par_key=")).head
    val part = leaf.listFiles().filter(_.getName.endsWith(".parquet")).head
    assert(part.delete())
    val bad = Reconcile.diff(
        Reconcile.footerManifest(spark, dest), Reconcile.footerManifest(spark, dest2))
      .filter(col("status") =!= "ok").collect()
    assert(bad.length == 1)
    assert(bad.head.getAs[String]("par_key") == leaf.getName.stripPrefix("par_key="))
  }

  test("stats manifest: footer min/max equal SQL min/max, flag value drift, nulls safe") {
    val dest = tmp() + "/dest"
    spark.range(1000).select(
        lit("1996-01-15 00:00:00").cast("timestamp").as("d"),
        // one all-null partition column exercise comes via par 1997 below
        (col("id").cast("double") * 1.5 - 100).as("value"),
        col("id").as("k"))
      .withColumn("par_key", date_format(col("d"), "yyyy"))
      .write.partitionBy("par_key").mode("overwrite").parquet(dest)
    // a second partition whose value column is entirely NULL
    spark.range(10).select(
        lit(null).cast("double").as("value"), col("id").as("k"),
        lit("1997").as("par_key"))
      .write.partitionBy("par_key").mode("append").parquet(dest)
    val sm = Reconcile.statsManifest(spark, dest, Seq("value", "k")).collect()
      .map(r => r.getAs[String]("par_key") -> r).toMap
    val expected = spark.read.parquet(dest).groupBy("par_key")
      .agg(count(lit(1)), min("value"), max("value"), min("k"), max("k"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(sm.keySet == Set("1996", "1997"))
    for (p <- sm.keySet) {
      assert(sm(p).getAs[Long]("n_rows") == expected(p).getLong(1))
      assert(Option(sm(p).getAs[java.lang.Double]("value_min")).map(_.toDouble) ==
        Option(expected(p).getAs[java.lang.Double](2)).map(_.toDouble))
      assert(Option(sm(p).getAs[java.lang.Double]("value_max")).map(_.toDouble) ==
        Option(expected(p).getAs[java.lang.Double](3)).map(_.toDouble))
      assert(sm(p).getAs[Double]("k_min") == expected(p).getLong(4).toDouble)
      assert(sm(p).getAs[Double]("k_max") == expected(p).getLong(5).toDouble)
    }
    // footer null counts are exact: the all-null partition reports all its
    // rows, the mixed one zero — count(*) - count(col) at metadata cost
    assert(sm("1997").getAs[Long]("value_nulls") == 10L)
    assert(sm("1996").getAs[Long]("value_nulls") == 0L)
    // value drift: rewrite the 1996 leaf with one shifted extreme — the
    // triage sees the excursion at footer cost
    spark.read.parquet(dest).filter(col("par_key") === "1996")
      .withColumn("value", when(col("k") === 0, lit(1e9)).otherwise(col("value")))
      .write.partitionBy("par_key").mode("overwrite")
      .option("partitionOverwriteMode", "dynamic").parquet(dest)
    val drifted = Reconcile.statsManifest(spark, dest, Seq("value")).collect()
      .map(r => r.getAs[String]("par_key") -> r.getAs[java.lang.Double]("value_max")).toMap
    assert(drifted("1996") == 1e9)
  }

  test("clusterBy compaction: files internally sorted, row-group ranges tight") {
    val frag = tmp() + "/src"
    val dest = tmp() + "/dest"
    val destU = tmp() + "/dest-unclustered"
    // one hot day, 200k rows in hash-random key order — big enough that a
    // 64 KB row-group target yields MANY groups per file
    spark.range(200000).select(
        lit("1996-01-15 00:00:00").cast("timestamp").as("d"),
        pmod(xxhash64(col("id")), lit(100000)).as("k"),
        concat(lit("payload-"), col("id")).as("v"))
      .repartition(4).write.mode("overwrite").parquet(frag)
    // small row groups so files hold SEVERAL groups and skipping is visible
    val hc = spark.sparkContext.hadoopConfiguration
    val oldBlock = hc.get("parquet.block.size")
    hc.setInt("parquet.block.size", 64 * 1024)
    try {
      Compact.rewritePartitioned(spark, frag, dest, "d", "yyyy",
        clusterBy = Seq("k"))
      Compact.rewritePartitioned(spark, frag, destU, "d", "yyyy")
    } finally {
      if (oldBlock == null) hc.unset("parquet.block.size") else hc.set("parquet.block.size", oldBlock)
    }
    // rows unchanged (clustering is layout-only)
    assert(spark.read.parquet(dest).count() == spark.read.parquet(destU).count())
    // every clustered file is internally sorted by the cluster column
    val sortedness = spark.read.parquet(dest)
      .select(col("_metadata.file_path").as("f"), col("k"),
        col("_metadata.row_index").as("ri"))
      .collect().groupBy(_.getString(0))
    sortedness.values.foreach { rows =>
      val keys = rows.sortBy(_.getLong(2)).map(_.getLong(1)).toSeq
      assert(keys == keys.sorted, "clustered file must be ordered by k")
    }
    // row-group min/max spans: tight & disjoint when clustered, wide when not
    def spans(dir: String): Seq[(Long, Long)] = {
      val files = new java.io.File(dir).listFiles()
        .filter(_.isDirectory).flatMap(_.listFiles())
        .filter(_.getName.endsWith(".parquet"))
      files.toSeq.flatMap { f =>
        val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
          new org.apache.hadoop.fs.Path(f.getAbsolutePath), hc)
        val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
        try {
          scala.jdk.CollectionConverters.ListHasAsScala(r.getFooter.getBlocks).asScala
            .toSeq.map { b =>
              val st = scala.jdk.CollectionConverters.ListHasAsScala(b.getColumns).asScala
                .find(_.getPath.toDotString == "k").get.getStatistics
              (st.genericGetMin.toString.toLong, st.genericGetMax.toString.toLong)
            }
        } finally r.close()
      }
    }
    val cSpans = spans(dest)
    val uSpans = spans(destU)
    // need multiple groups for the claim to mean anything
    assert(cSpans.size > 2 && uSpans.size > 2, s"groups: ${cSpans.size}/${uSpans.size}")
    def avgSpan(s: Seq[(Long, Long)]) = s.map(p => p._2 - p._1).sum.toDouble / s.size
    assert(avgSpan(cSpans) < avgSpan(uSpans) / 4,
      s"clustered avg span ${avgSpan(cSpans)} vs unclustered ${avgSpan(uSpans)}")
  }

  test("quality checks ride the migrate job: exact violation counts, alerts, no blocking") {
    val frag = tmp() + "/src"
    val dest = tmp() + "/dest"
    // 1000 rows, 100 null values, 50 out-of-range
    spark.range(1000).select(
        lit("1996-01-15 00:00:00").cast("timestamp").as("d"),
        when(col("id") % 10 === 0, lit(null)).otherwise(col("id")).as("v"),
        when(col("id") < 50, lit(-5.0)).otherwise(lit(1.0)).as("score"))
      .write.parquet(frag)
    val alerts = new Alerter.Collecting
    val r = Migrate.migrateAll(spark, frag, dest, "d", pattern = "yyyy",
      alerter = alerts,
      checks = Seq(
        Quality.Check.notNull(col("v"), "v_not_null"),
        Quality.Check.inRange(col("score"), 0.0, 10.0, "score_range")))
    // violations counted in-flight (same observe as rows/partitions — no
    // second scan), data still lands in full (alert, don't block)
    assert(r.violations == Map("v_not_null" -> 100L, "score_range" -> 50L))
    assert(r.rowsWritten == 1000 && spark.read.parquet(dest).count() == 1000)
    val msgs = alerts.all.filter(_._1 == "quality.violation").map(_._2)
    assert(msgs.exists(m => m.contains("v_not_null") && m.contains("100")))
    assert(msgs.exists(m => m.contains("score_range") && m.contains("50")))
    // clean data → zero counts, zero alerts
    val quiet = new Alerter.Collecting
    val r2 = Migrate.migrateAll(spark, frag, dest, "d", pattern = "yyyy",
      alerter = quiet, checks = Seq(Quality.Check.notNull(col("d"), "d_not_null")))
    assert(r2.violations == Map("d_not_null" -> 0L) && quiet.all.isEmpty)
  }

  test("in-place compaction: staged swap, multiset preserved, no tmp/bak residue") {
    val dir = tmp() + "/table"
    val orders = Tables.load(spark, sf, "orders")
    orders.repartition(20).write.parquet(dir)
    val before = orders.agg(count(lit(1)), sum("o_totalprice")).collect()(0)
    val st = Compact.rewriteInPlacePartitioned(spark, dir, "o_orderdate", pattern = "yyyy")
    assert(st.filesBefore == 20 && st.filesAfter < st.filesBefore)
    // same directory now holds the partitioned, compacted layout
    val back = spark.read.parquet(dir)
    assert(back.columns.contains("par_key"))
    val after = back.agg(count(lit(1)), sum("o_totalprice")).collect()(0)
    assert(before.getLong(0) == after.getLong(0))
    assert(math.abs(before.getDouble(1) - after.getDouble(1)) < 1e-6)
    val parent = new java.io.File(dir).getParentFile
    assert(!parent.listFiles().exists(f => f.getName.endsWith(".graft-compact-tmp") ||
      f.getName.endsWith(".graft-compact-bak")), "staging residue left behind")
    // a leftover .bak (crashed mid-swap) must refuse, not destroy
    val bak = new java.io.File(dir + ".graft-compact-bak")
    assert(bak.mkdir())
    intercept[IllegalArgumentException] {
      Compact.rewriteInPlacePartitioned(spark, dir, "o_orderdate", pattern = "yyyy")
    }
    assert(bak.delete())
  }

  test("two-level (-sp) migrate + compact: physical layout, clean reconcile") {
    val migrated = tmp() + "/m"
    val compacted = tmp() + "/c"
    val src = s"$sf/lineitem.parquet"
    val sub = Migrate.SubPart("l_returnflag", pattern = None, name = "par_sub")
    val r = Migrate.migrateRange(spark, src, migrated, "l_shipdate",
      "1996-03-01", "1996-03-31", subPart = Some(sub))
    assert(r.partitionsWritten > 0)
    // the physical tree is par_key=<day>/par_sub=<flag>/ — the reference's
    // part1/part2 layout (HDFSMerge.java:90-112)
    val days = new java.io.File(migrated).listFiles().filter(_.getName.startsWith("par_key="))
    assert(days.nonEmpty)
    assert(days.forall(_.listFiles().exists(_.getName.startsWith("par_sub="))))

    Compact.rewritePartitioned(spark, migrated, compacted, "l_shipdate", subPart = Some(sub))
    // one data file per (day, flag) leaf after compaction
    val leaves = new java.io.File(compacted).listFiles().filter(_.getName.startsWith("par_key="))
      .flatMap(_.listFiles().filter(_.getName.startsWith("par_sub=")))
    assert(leaves.nonEmpty)
    assert(leaves.forall(_.listFiles().count(f =>
      !f.getName.startsWith("_") && !f.getName.startsWith(".")) == 1))

    // reconcile source vs compacted at composite (day, flag) grain
    val srcDf = spark.read.parquet(src)
      .filter(col("l_shipdate") >= lit("1996-03-01").cast("timestamp") &&
        col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
    val dst = spark.read.parquet(compacted)
      .select(srcDf.columns.map(col).toIndexedSeq: _*)
    val key = concat_ws("/", date_format(col("l_shipdate"), "yyyyMMdd"), col("l_returnflag"))
    assert(Reconcile.isClean(
      Reconcile.manifest(srcDf, key), Reconcile.manifest(dst, key)))
  }

  test("webhook alerter POSTs JSON to a local endpoint; failure never throws") {
    val received = new java.util.concurrent.LinkedBlockingQueue[String]()
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/hook", { ex =>
      received.add(new String(ex.getRequestBody.readAllBytes(), "UTF-8"))
      ex.sendResponseHeaders(200, -1)
      ex.close()
    })
    server.start()
    try {
      val hook = new Alerter.Webhook(s"http://127.0.0.1:${server.getAddress.getPort}/hook")
      hook.alert("migrate.skip", "partition \"par_key=20170101\" exists\nline2")
      val body = received.poll(5, java.util.concurrent.TimeUnit.SECONDS)
      assert(body != null)
      assert(body.contains("\"subject\":\"migrate.skip\""))
      assert(body.contains("\\\"par_key=20170101\\\"") && body.contains("\\nline2"))
    } finally server.stop(0)
    // unreachable endpoint: logs, does not throw (alerts must never abort a job)
    new Alerter.Webhook("http://127.0.0.1:1/hook").alert("s", "m")
  }

  test("smtp alerter speaks RFC 5321 against a local server; env selects transports") {
    val srv = new java.net.ServerSocket(0, 1, java.net.InetAddress.getByName("127.0.0.1"))
    val got = new java.util.concurrent.LinkedBlockingQueue[String]()
    val t = new Thread(() => {
      val s = srv.accept()
      val in = new java.io.BufferedReader(new java.io.InputStreamReader(s.getInputStream))
      val out = new java.io.PrintWriter(s.getOutputStream, true)
      def reply(l: String): Unit = { out.print(l + "\r\n"); out.flush() }
      reply("220 local test ready")
      var line = in.readLine()
      val sb = new StringBuilder
      var inData = false
      while (line != null) {
        sb.append(line).append('\n')
        if (inData && line == ".") { reply("250 queued"); inData = false }
        else if (!inData) line.takeWhile(_ != ' ') match {
          case "HELO" | "MAIL" | "RCPT" => reply("250 ok")
          case "DATA" => reply("354 go"); inData = true
          case "QUIT" => reply("221 bye"); got.add(sb.toString); line = null
          case _ => reply("500 ?")
        }
        if (line != null) line = in.readLine()
      }
      s.close()
    })
    t.setDaemon(true)
    t.start()
    try {
      val smtp = new Alerter.Smtp("127.0.0.1", srv.getLocalPort, "graft@x", Seq("ops@x"))
      smtp.alert("migrate.verify", "count_mismatch on 20170101\n.leading dot line")
      val transcript = got.poll(5, java.util.concurrent.TimeUnit.SECONDS)
      assert(transcript != null)
      assert(transcript.contains("MAIL FROM:<graft@x>"))
      assert(transcript.contains("RCPT TO:<ops@x>"))
      assert(transcript.contains("Subject: migrate.verify"))
      assert(transcript.contains("..leading dot line")) // dot-stuffed
    } finally srv.close()
    // env wiring picks the right transport, defaulting to Log
    assert(Alerter.fromEnv(Map.empty) eq Alerter.Log)
    assert(Alerter.fromEnv(Map("GRAFT_ALERT_WEBHOOK" -> "http://x/")).isInstanceOf[Alerter.Webhook])
    assert(Alerter.fromEnv(Map("GRAFT_SMTP_HOST" -> "relay", "GRAFT_SMTP_TO" -> "a@x,b@x"))
      .isInstanceOf[Alerter.Smtp])
    // unreachable relay: logs, does not throw
    new Alerter.Smtp("127.0.0.1", 1, "a@x", Seq("b@x")).alert("s", "m")
  }

  test("as-of join picks the latest right row at-or-before each left time") {
    import spark.implicits._
    val left = Seq((1L, 10L, "e1"), (1L, 5L, "e2"), (2L, 10L, "e3"), (3L, 10L, "e4"))
      .toDF("k", "t", "name")
      .withColumn("t", col("t").cast("timestamp"))
    val right = Seq((1L, 5L, "a"), (1L, 8L, "b"), (1L, 12L, "c"), (2L, 11L, "d"))
      .toDF("k", "rt", "v")
      .withColumn("rt", col("rt").cast("timestamp"))

    val inner = AsOfJoin.asofJoin(left, right, "k", "k", "t", "rt", Seq("v"))
      .select("name", "asof_v").collect().map(r => (r.getString(0), r.getString(1))).toSet
    // e1: latest of {a@5, b@8} <= 10 is b; e2: a@5 == 5 (inclusive);
    // e3: only right row is at 11 > 10 -> dropped; e4: no right key -> dropped
    assert(inner == Set(("e1", "b"), ("e2", "a")))

    val leftJoin = AsOfJoin.asofJoin(left, right, "k", "k", "t", "rt", Seq("v"),
      joinType = "left")
      .select("name", "asof_v").collect().map(r => (r.getString(0), Option(r.getString(1)))).toSet
    assert(leftJoin == Set(("e1", Some("b")), ("e2", Some("a")), ("e3", None), ("e4", None)))
  }

  test("range join: inclusive start, exclusive end, bucket-crossing intervals, equi-join plan") {
    import spark.implicits._
    // epoch-second timestamps; bucket width 10s so interval i2 crosses a
    // bucket boundary and must explode into two buckets
    val points = Seq((1L, 10L, "p10"), (1L, 15L, "p15"), (1L, 20L, "p20"),
      (2L, 15L, "q15"), (1L, 9L, "p9"))
      .toDF("pk", "pt", "pname").withColumn("pt", col("pt").cast("timestamp"))
    val intervals = Seq((1L, 10L, 20L, "i1"), (1L, 15L, 25L, "i2"),
      (2L, 0L, 10L, "i3"), (1L, 30L, 30L, "i_empty"))
      .toDF("ik", "s", "e", "iname")
      .withColumn("s", col("s").cast("timestamp"))
      .withColumn("e", col("e").cast("timestamp"))

    val joined = graft.operators.RangeJoin.pointInInterval(
      points, intervals, "pk", "ik", "pt", "s", "e", bucketSeconds = 10L)
    val got = joined.select("pname", "iname").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    // p10 in i1 (start inclusive); p15 in i1 and i2; p20 NOT in i1 (end
    // exclusive) but in i2; q15 not in i3 (wrong time) and not in i1/i2
    // (wrong key); p9 in nothing; i_empty matches nothing
    assert(got == Set(("p10", "i1"), ("p15", "i1"), ("p15", "i2"), ("p20", "i2")))
    // each qualifying pair appears exactly once (points live in one bucket)
    assert(joined.count() == 4)
    // the scale property: candidates come from a hash equi-join, never a
    // nested loop / cartesian product
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), "plan contains CartesianProduct")
    assert(!plan.contains("BroadcastNestedLoopJoin"), "plan contains BroadcastNestedLoopJoin")
  }

  test("range join honors sub-second boundaries (native-precision buckets)") {
    import spark.implicits._
    // interval [10.8s, 11.5s) and point 11.2s: second-truncated buckets
    // would cap the interval at bucket(10) and silently drop the match
    val points = Seq((1L, 11200000L, "p11.2"), (1L, 11500000L, "p11.5"), (1L, 10799999L, "pA"))
      .toDF("pk", "us", "pname")
      .withColumn("pt", timestamp_micros(col("us"))).drop("us")
    val intervals = Seq((1L, 10800000L, 11500000L, "i1"))
      .toDF("ik", "su", "eu", "iname")
      .withColumn("s", timestamp_micros(col("su")))
      .withColumn("e", timestamp_micros(col("eu"))).drop("su", "eu")
    val got = graft.operators.RangeJoin.pointInInterval(
        points, intervals, "pk", "ik", "pt", "s", "e", bucketSeconds = 1L)
      .select("pname").collect().map(_.getString(0)).toSet
    // p11.2 qualifies; p11.5 == end (exclusive) does not; pA is 1µs early
    assert(got == Set("p11.2"))
  }

  test("interval-overlap join: exactly-once across buckets, half-open edges, equi-join plan") {
    import spark.implicits._
    def side(p: String, rows: Seq[(Long, Long, Long, String)]) =
      rows.toDF("k", "su", "eu", "name")
        .select(col("k").as(s"${p}_k"), timestamp_micros(col("su")).as(s"${p}_s"),
          timestamp_micros(col("eu")).as(s"${p}_e"), col("name").as(s"${p}_name"))
    val M = 1000000L
    // left interval [0s, 10s) spans 10 one-second buckets; right [2s, 9s)
    // shares 7 of them — without the bucket-of-overlap-start dedup this
    // pair would emit 7 times
    val l = side("a", Seq(
      (1L, 0L, 10L * M, "wide"),
      (1L, 20L * M, 21L * M, "late"),
      (2L, 0L, 5L * M, "otherkey")))
    val r = side("b", Seq(
      (1L, 2L * M, 9L * M, "inside"),
      (1L, 10L * M, 12L * M, "touches_end"), // b.start == a.end: half-open, no overlap
      (1L, 19L * M, 20500000L, "hits_late")))
    val joined = graft.operators.RangeJoin.intervalOverlap(
      l, r, "a_k", "b_k", "a_s", "a_e", "b_s", "b_e", bucketSeconds = 1L)
    val got = joined.select("a_name", "b_name").collect()
      .map(x => (x.getString(0), x.getString(1)))
    // wide×inside exactly ONCE despite 7 shared buckets; touches_end
    // excluded (end exclusive); otherkey never matches key 1
    assert(got.sorted.toSeq == Seq(("late", "hits_late"), ("wide", "inside")),
      s"got ${got.toSeq}")
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), "plan contains CartesianProduct")
    assert(!plan.contains("BroadcastNestedLoopJoin"), "plan contains BroadcastNestedLoopJoin")
  }

  test("migrate carries an EVOLVED source schema: union columns, null-filled history") {
    // a live table grows a column mid-history (the classic hive
    // schema-evolution case the reference's whole-table copies hit):
    // early files lack `channel`, late files have it. mergeSchema on the
    // source read makes the migration land the UNION schema with nulls
    // for pre-evolution rows — no rewrite of old files, no reader fork.
    val base = tmp(); val src = s"$base/src"; val dest = s"$base/dest"
    val ev = Tables.load(spark, sf, "events")
    ev.filter(col("event_id") % 2 === 0)
      .select("event_id", "ts", "user_id", "value")
      .coalesce(1).write.mode("append").parquet(src)
    ev.filter(col("event_id") % 2 === 1)
      .select(col("event_id"), col("ts"), col("user_id"), col("value"),
        col("event_type").as("channel"))
      .coalesce(1).write.mode("append").parquet(src)
    Migrate.migrateAll(spark, src, dest, "ts",
      srcOptions = Map("mergeSchema" -> "true"))
    val out = spark.read.parquet(dest)
    assert(out.columns.contains("channel"), s"evolved column lost: ${out.columns.toSeq}")
    assert(out.count() == ev.count())
    // pre-evolution rows surface as NULL channel; post-evolution keep values
    assert(out.filter(col("event_id") % 2 === 0).filter(col("channel").isNotNull).count() == 0)
    assert(out.filter(col("event_id") % 2 === 1).filter(col("channel").isNull).count() == 0)
  }

  test("skipExisting with zero-padded sub-partitions skips everything on re-run") {
    val dest = tmp() + "/dest"
    // stage events with a real TimestampType ts (the raw fixture stores
    // TIMESTAMP(NANOS) as long)
    val src = tmp() + "/events_src"
    Tables.load(spark, sf, "events").write.parquet(src)
    // par_sub=HH writes zero-padded hour dirs (00..09) that partition-
    // column type inference would read back as integers ("0" != "00")
    val sub = Migrate.SubPart("ts", pattern = Some("HH"))
    val r1 = Migrate.migrateRange(spark, src, dest, "ts",
      "2024-01-01", "2024-01-03", subPart = Some(sub))
    assert(r1.partitionsWritten > 0)
    val hourDirs = new java.io.File(dest).listFiles().filter(_.getName.startsWith("par_key="))
      .flatMap(_.listFiles().map(_.getName)).filter(_.startsWith("par_sub=")).toSet
    assert(hourDirs.exists(d => d.stripPrefix("par_sub=").startsWith("0")),
      s"fixture produced no zero-padded hours: $hourDirs")
    val alerts = new Alerter.Collecting
    val r2 = Migrate.migrateRange(spark, src, dest, "ts",
      "2024-01-01", "2024-01-03", subPart = Some(sub),
      skipExisting = true, alerter = alerts)
    assert(r2.partitionsWritten == 0,
      s"re-run rewrote ${r2.partitionsWritten} partitions (zero-pad mismatch?)")
    assert(r2.partitionsSkipped == r1.partitionsWritten)
  }

  test("migrate reads non-parquet structured sources (csv) into parquet partitions") {
    val csvSrc = tmp() + "/csv"
    val dest = tmp() + "/dest"
    val month = spark.read.parquet(s"$sf/lineitem.parquet")
      .filter(col("l_shipdate") >= lit("1996-03-01").cast("timestamp") &&
        col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
    month.select(col("l_orderkey"), col("l_quantity"),
        date_format(col("l_shipdate"), "yyyy-MM-dd HH:mm:ss").as("l_shipdate"))
      .write.option("header", "true").csv(csvSrc)
    val r = Migrate.migrateRange(spark, csvSrc, dest, "l_shipdate",
      "1996-03-01", "1996-03-31",
      srcFormat = "csv",
      srcOptions = Map("header" -> "true", "inferSchema" -> "true"))
    assert(r.rowsWritten == month.count())
    val back = spark.read.parquet(dest)
    assert(back.count() == month.count())
    assert(back.schema("par_key").dataType.typeName == "string" ||
      back.select(col("par_key").cast("string")).distinct().count() == 31)
  }

  test("skipExisting re-migrates a DATALESS partition directory") {
    val dest = tmp() + "/dest"
    val src = s"$sf/lineitem.parquet"
    Migrate.migrateRange(spark, src, dest, "l_shipdate", "1996-03-01", "1996-03-05")
    // simulate a crashed previous run: the value directory exists but
    // holds no data files — it must NOT count as migrated
    val victim = new java.io.File(dest).listFiles()
      .filter(_.getName.startsWith("par_key=")).head
    victim.listFiles().foreach(_.delete())
    val r = Migrate.migrateRange(spark, src, dest, "l_shipdate",
      "1996-03-01", "1996-03-05", skipExisting = true)
    assert(r.partitionsWritten == 1, s"expected exactly the dataless partition rewritten, got $r")
    assert(victim.listFiles().exists(_.getName.endsWith(".parquet")),
      "dataless partition was not re-migrated")
  }

  test("smtp header values are CRLF-sanitized (no header injection)") {
    val srv = new java.net.ServerSocket(0, 1, java.net.InetAddress.getByName("127.0.0.1"))
    val got = new java.util.concurrent.LinkedBlockingQueue[String]()
    val t = new Thread(() => {
      val s = srv.accept()
      val in = new java.io.BufferedReader(new java.io.InputStreamReader(s.getInputStream))
      val out = new java.io.PrintWriter(s.getOutputStream, true)
      def reply(l: String): Unit = { out.print(l + "\r\n"); out.flush() }
      reply("220 local test ready")
      var line = in.readLine()
      val sb = new StringBuilder
      var inData = false
      while (line != null) {
        sb.append(line).append('\n')
        if (inData && line == ".") { reply("250 queued"); inData = false }
        else if (!inData) line.takeWhile(_ != ' ') match {
          case "HELO" | "MAIL" | "RCPT" => reply("250 ok")
          case "DATA" => reply("354 go"); inData = true
          case "QUIT" => reply("221 bye"); got.add(sb.toString); line = null
          case _ => reply("500 ?")
        }
        if (line != null) line = in.readLine()
      }
      s.close()
    })
    t.setDaemon(true)
    t.start()
    try {
      val smtp = new Alerter.Smtp("127.0.0.1", srv.getLocalPort, "graft@x", Seq("ops@x"))
      // a subject derived from hostile path/exception text must not be able
      // to inject headers or terminate DATA early
      smtp.alert("bad\r\nX-Injected: 1", "body\r\n.\r\nsmuggled")
      val transcript = got.poll(5, java.util.concurrent.TimeUnit.SECONDS)
      assert(transcript != null)
      assert(transcript.contains("Subject: bad X-Injected: 1"))
      assert(!transcript.linesIterator.exists(_.startsWith("X-Injected")))
      // the body's bare "." line arrived dot-stuffed, not as end-of-DATA
      assert(transcript.contains("\n..\n"))
      assert(transcript.contains("smuggled"))
    } finally srv.close()
  }

  test("partition enumeration matches the reference's dedup semantics") {
    val monthly = Partitions.enumerate(spark, "2017-11-01", "2018-01-15", "yyyyMM")
      .orderBy("partition_value").collect().map(_.getString(0)).toSeq
    assert(monthly == Seq("201711", "201712", "201801"))
    val daily = Partitions.enumerate(spark, "2017-11-01", "2017-11-30", "yyyyMMdd").count()
    assert(daily == 30)
    val dm = Partitions.dayMap(spark, "2017-12-30", "2018-01-02", "yyyyMM")
    assert(dm.count() == 4)
    assert(dm.filter(col("partition_value") === "201801").count() == 2)
  }

  test("BucketRank equals the interpreted filter+size form on random data") {
    import spark.implicits._
    import graft.functions.BucketRank
    val rnd = new scala.util.Random(7)
    // duplicate boundaries included: upper bound must count ALL dups ≤ x
    val bnds = (Seq.fill(40)(rnd.nextDouble() * 100) ++ Seq(25.0, 25.0, 25.0))
      .sorted.toArray
    val vals = Seq.tabulate(500)(i => i.toDouble / 5) ++
      bnds.toSeq ++ Seq(25.0, -1.0, 1000.0) // exact boundary hits + extremes
    val df = vals.map(Tuple1(_)).toDF("x")
    val got = df.select(BucketRank.rank(col("x"), bnds).as("r"))
      .collect().map(_.getInt(0)).toSeq
    val ref = df.select(
      size(filter(typedLit(bnds), b => b <= col("x"))).as("r"))
      .collect().map(_.getInt(0)).toSeq
    assert(got == ref, "binary search diverged from the reference HOF form")
    // NULL in → NULL out (callers coalesce to the lowest bucket)
    val withNull = Seq(Some(1.0), None).toDF("x")
      .select(BucketRank.rank(col("x"), bnds)).collect()
    assert(!withNull(0).isNullAt(0) && withNull(1).isNullAt(0))
  }

  test("zorder compaction: multiset preserved; per-file ranges tight on BOTH columns") {
    val src = s"$sf/lineitem.parquet"
    val zDest = tmp() + "/zorder"
    val cDest = tmp() + "/cluster"
    // small target -> several files PER LEAF, so per-file range stats are
    // meaningful (one file per leaf would trivially span the leaf domain)
    Compact.rewritePartitioned(spark, src, zDest, partKeyCol = "l_shipdate",
      pattern = "yyyy", targetBytes = 4 * 1024,
      zorderBy = Seq("l_partkey", "l_suppkey"))
    Compact.rewritePartitioned(spark, src, cDest, partKeyCol = "l_shipdate",
      pattern = "yyyy", targetBytes = 4 * 1024,
      clusterBy = Seq("l_partkey"))

    // multiset preservation (the CommonUtils.checkFile analogue)
    def sig(p: String) = spark.read.parquet(p)
      .agg(count(lit(1)), sum("l_quantity"), sum(pmod(xxhash64(col("l_orderkey"),
        col("l_linenumber"), col("l_partkey")), lit(1000000007L))).as("h")).collect().head
    assert(sig(zDest) == sig(src))

    // average per-file normalized range width for a column: 1.0 = every
    // file spans the whole domain (no skipping), small = tight files
    def avgWidth(p: String, c: String): Double = {
      val g = spark.read.parquet(p)
        .groupBy(col("_metadata.file_path"))
        .agg(min(col(c)).as("lo"), max(col(c)).as("hi"))
      val dom = spark.read.parquet(src)
        .agg(min(col(c)).cast("double"), max(col(c)).cast("double")).collect().head
      val (dLo, dHi) = (dom.getDouble(0), dom.getDouble(1))
      val rows = g.collect()
      rows.map(r => (r.getAs[Long]("hi") - r.getAs[Long]("lo")).toDouble / (dHi - dLo))
        .sum / rows.length
    }
    val zW1 = avgWidth(zDest, "l_partkey"); val zW2 = avgWidth(zDest, "l_suppkey")
    val cW1 = avgWidth(cDest, "l_partkey"); val cW2 = avgWidth(cDest, "l_suppkey")
    info(f"zorder widths: l_partkey=$zW1%.3f l_suppkey=$zW2%.3f; " +
      f"salted clusterBy: l_partkey=$cW1%.3f l_suppkey=$cW2%.3f")
    // the hash-salted layout (clusterBy at the same file count) deals each
    // file a random sample of its leaf: near-global min/max on BOTH
    // columns — within-file row groups are sorted, but footer-level
    // skipping is impossible
    assert(cW1 > 0.8 && cW2 > 0.8, s"salted layout should be near-global: $cW1, $cW2")
    // zorder: range-partitioned on the curve, so files are tight
    // rectangles — materially tighter than the salted layout in BOTH
    // dimensions at the same file count
    assert(zW1 < 0.75 && zW2 < 0.75, s"zorder widths too wide: $zW1, $zW2")
    assert(zW1 < cW1 - 0.15 && zW2 < cW2 - 0.15,
      s"zorder must beat the salted layout on both columns: $zW1/$cW1, $zW2/$cW2")
  }
}
