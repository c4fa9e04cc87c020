package graft

import graft.operators.Snapshots

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** TIME-TRANSFORM clustering (`clusterBy = "days(ts)"` / `months` /
  * `years` / `hours`): one file set per CALENDAR UNIT of a date/timestamp
  * column — the dominant 100 TB layout for event data, bounded by the
  * retention window where identity clustering on an instant-cardinality
  * column is impossible. The scan PROVES unit-purity from footer-stat
  * envelopes (the transform is monotonic, so unit(min) == unit(max)
  * closes the file) and reports key-grouped partitioning over the
  * temporal TRANSFORM, resolved through [[graft.sources.SnapshotCatalog]]'s
  * `days`/`months`/`years`/`hours` V2 functions — the Iceberg
  * partition-transform SPJ shape. Three implementations of the unit math
  * must agree row-for-row: the write path's routing Column, the stats
  * proof's JVM math, and the V2 function Catalyst evaluates to shuffle a
  * plain side INTO the layout; this suite pins all three against each
  * other and against row equality.
  */
class TimeLayoutSpec extends AnyFunSuite {
  import SparkTestEnv._
  import spark.implicits._

  private def freshWh(tag: String): String = {
    val p = java.nio.file.Files.createTempDirectory(s"graft-time-$tag")
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

  private def noBroadcast[A](body: => A): A = {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try body finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  /** 4 calendar days × 50 instants each, exact micros shared across
    * derived feeds so a ts equi-join has matches.
    */
  private def events: DataFrame =
    (0 until 200).map { i =>
      val day = i % 4
      val ts = java.sql.Timestamp.valueOf(s"2024-03-0${day + 1} 0${i % 10}:1${i % 6}:07.00${i % 10}")
      (ts, i.toLong, i * 1.5)
    }.toDF("ts", "id", "v")

  test("days publish: header, one file set per day, roundtrip, null key dir") {
    val wh = freshWh("pub")
    val withNull = events.unionByName(
      Seq((null.asInstanceOf[java.sql.Timestamp], 999L, 0.0)).toDF("ts", "id", "v"))
    Snapshots.publish(spark, s"$wh/t", withNull, clusterBy = Some("days(ts)"))
    assert(Snapshots.clusterOf(spark, s"$wh/t", 1).contains("days(ts)"))
    val files = Snapshots.files(spark, s"$wh/t", 1)
    // 4 days + the null-instant group
    val dirs = files.flatMap("__cluster=([^/]+)/".r.findFirstMatchIn(_).map(_.group(1))).toSet
    assert(dirs.size == 5, s"expected 4 day dirs + null dir, got $dirs")
    assert(dirs.contains("null"), "null instants must route to their own group")
    // epoch-day dir names match the transform of the day
    assert(dirs.contains(java.time.LocalDate.parse("2024-03-01").toEpochDay.toString))
    val got = spark.read.format("graft-snapshot").option("root", s"$wh/t").load()
    assert(got.count() == 201)
    assert(got.filter(col("ts").isNull).count() == 1)
    assert(got.agg(sum("id")).head().getLong(0) == (0 until 200).map(_.toLong).sum + 999L)
  }

  test("validation: column type, hours-on-date, sortBy composition, append spec match") {
    val wh = freshWh("val")
    val dated = events.withColumn("d", to_date(col("ts")))
    intercept[IllegalArgumentException] { // not a date/timestamp
      Snapshots.publish(spark, s"$wh/bad1", events, clusterBy = Some("days(id)"))
    }
    intercept[IllegalArgumentException] { // a date has no hour
      Snapshots.publish(spark, s"$wh/bad2", dated, clusterBy = Some("hours(d)"))
    }
    intercept[IllegalArgumentException] { // unknown column
      Snapshots.publish(spark, s"$wh/bad3", events, clusterBy = Some("days(nope)"))
    }
    intercept[IllegalArgumentException] { // constant-key ordering claim would be false
      Snapshots.publish(spark, s"$wh/bad4", events,
        clusterBy = Some("days(ts)"), sortBy = Some("id"))
    }
    Snapshots.publish(spark, s"$wh/t", events, clusterBy = Some("days(ts)"))
    intercept[IllegalArgumentException] { // appending a DIFFERENT unit is a different layout
      Snapshots.publish(spark, s"$wh/t", events, append = true,
        clusterBy = Some("months(ts)"))
    }
    // same-unit append keeps the header (each publish's files are unit-pure)
    Snapshots.publish(spark, s"$wh/t", events, append = true,
      clusterBy = Some("days(ts)"))
    assert(Snapshots.clusterOf(spark, s"$wh/t", 2).contains("days(ts)"))
    // a date column clusters by days too (identity on epoch days)
    Snapshots.publish(spark, s"$wh/d", dated.select("d", "id"),
      clusterBy = Some("days(d)"))
    assert(Snapshots.files(spark, s"$wh/d", 1)
      .flatMap("__cluster=([^/]+)/".r.findFirstMatchIn(_).map(_.group(1))).toSet.size == 4)
  }

  test("unit math: routing Column, stats-proof JVM math, and V2 function agree") {
    // instants crossing every seam: pre-1970 (floorDiv vs truncation),
    // midnight boundaries, month/year boundaries, leap day, sub-second
    val instants = Seq(
      "1969-12-31 23:59:59.999999", "1970-01-01 00:00:00.0",
      "1969-01-01 05:30:00.0", "1971-12-31 23:00:00.000001",
      "2024-02-29 12:00:00.5", "2024-03-01 00:00:00.0",
      "2023-12-31 23:59:59.999999", "1999-07-15 23:59:00.0")
      .map(java.sql.Timestamp.valueOf)
    val df = instants.map(t => Tuple1(t)).toDF("ts")
    for (unit <- Seq("years", "months", "days", "hours")) {
      // 1. the write path's routing Column (calendar functions, UTC session)
      val routed = df.select(Snapshots.timeTransformCol(unit, col("ts")))
        .collect().map(_.getInt(0)).toSeq
      // 2. the stats proof's JVM math over decoded values
      val decoded = instants.map(Snapshots.timeOfDecoded(unit, _))
      assert(routed == decoded,
        s"$unit: routing Column ${routed} != stats math ${decoded}")
      // 3. the V2 function over Catalyst-internal micros
      val f = new graft.sources.GraftTimeFunction(unit)
        .bind(org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("ts",
            org.apache.spark.sql.types.TimestampType))))
        .asInstanceOf[org.apache.spark.sql.connector.catalog.functions.ScalarFunction[Integer]]
      val viaFn = instants.map { t =>
        val micros = Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L
        f.produceResult(new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
          Array[Any](micros))).intValue()
      }
      assert(viaFn == decoded, s"$unit: V2 function ${viaFn} != stats math ${decoded}")
    }
    // spot-pin absolute values (Iceberg/Spark transform epochs)
    assert(Snapshots.timeOfDecoded("days",
      java.sql.Timestamp.valueOf("1969-12-31 23:59:59.999999")) == -1)
    assert(Snapshots.timeOfDecoded("days",
      java.sql.Timestamp.valueOf("1970-01-01 00:00:00.0")) == 0)
    assert(Snapshots.timeOfDecoded("months",
      java.sql.Timestamp.valueOf("1971-02-01 00:00:00.0")) == 13)
    assert(Snapshots.timeOfDecoded("years",
      java.sql.Timestamp.valueOf("1969-01-01 05:30:00.0")) == -1)
    assert(Snapshots.timeOfDecoded("hours",
      java.sql.Timestamp.valueOf("1970-01-01 01:00:00.0")) == 1)
  }

  test("two-sided days SPJ on an exact-timestamp join: zero shuffles, rows equal") {
    val wh = freshWh("spj")
    Snapshots.publish(spark, s"$wh/l", events.select("ts", "id"),
      clusterBy = Some("days(ts)"))
    Snapshots.publish(spark, s"$wh/r", events.select(col("ts"), col("v")),
      clusterBy = Some("days(ts)"))
    withCatalog("tspj", wh) {
      noBroadcast {
        val j = spark.table("tspj.l").join(spark.table("tspj.r"), "ts")
        j.collect()
        assert(PlanOps.shuffleCount(j) == 0,
          s"temporal-transform SPJ must be exchange-free:\n" +
            j.queryExecution.executedPlan)
        val got = j.groupBy("ts").count().orderBy("ts").collect()
          .map(r => (r.getTimestamp(0), r.getLong(1))).toSeq
        val expect = events.select("ts", "id")
          .join(events.select(col("ts"), col("v")), "ts")
          .groupBy("ts").count().orderBy("ts").collect()
          .map(r => (r.getTimestamp(0), r.getLong(1))).toSeq
        assert(got == expect)
      }
    }
  }

  test("one-side shuffle INTO a months layout: function/routing agreement row-pinned") {
    val wh = freshWh("oneside")
    // dates straddling month boundaries — a one-unit disagreement between
    // the V2 function and the write routing would misplace exactly these
    val fact = (0 until 120).map { i =>
      val ts = java.sql.Timestamp.valueOf(
        f"2023-${i % 12 + 1}%02d-${if (i % 3 == 0) 1 else 28}%02d 23:59:59.0")
      (ts, i.toLong)
    }.toDF("ts", "id")
    Snapshots.publish(spark, s"$wh/fact", fact, clusterBy = Some("months(ts)"))
    assert(Snapshots.files(spark, s"$wh/fact", 1)
      .flatMap("__cluster=([^/]+)/".r.findFirstMatchIn(_).map(_.group(1))).toSet.size == 12)
    withCatalog("tone", wh) {
      noBroadcast {
        val prev = spark.conf.getOption("spark.sql.sources.v2.bucketing.shuffle.enabled")
        spark.conf.set("spark.sql.sources.v2.bucketing.shuffle.enabled", "true")
        try {
          val plain = fact.select(col("ts"), (col("id") * 10).as("w"))
          val j = spark.table("tone.fact").join(plain.hint("merge"), "ts")
          j.collect()
          assert(PlanOps.shuffleCount(j) == 1,
            s"exactly the plain side must shuffle:\n${j.queryExecution.executedPlan}")
          assert(j.queryExecution.executedPlan.toString
            .contains("keygroupedpartitioning"),
            "the exchange must target the month groups, not a plain hash")
          val got = j.groupBy("ts").count().orderBy("ts").collect()
            .map(r => (r.getTimestamp(0), r.getLong(1))).toSeq
          val expect = fact.join(plain, "ts").groupBy("ts").count().orderBy("ts")
            .collect().map(r => (r.getTimestamp(0), r.getLong(1))).toSeq
          assert(got == expect)
        } finally prev match {
          case Some(v) => spark.conf.set("spark.sql.sources.v2.bucketing.shuffle.enabled", v)
          case None => spark.conf.unset("spark.sql.sources.v2.bucketing.shuffle.enabled")
        }
      }
    }
  }

  test("mutations: mergeByKey re-clusters, narrow SQL UPDATE re-proves, compact restores") {
    val wh = freshWh("dml")
    Snapshots.publish(spark, s"$wh/t", events, clusterBy = Some("days(ts)"))
    // CoW MERGE writes replacements through the clustered path
    Snapshots.mergeByKey(spark, s"$wh/t",
      Seq((java.sql.Timestamp.valueOf("2024-03-02 09:00:00.0"), 1000L, 7.5))
        .toDF("ts", "id", "v"),
      keyCols = Seq("id"))
    val vm = Snapshots.versions(spark, s"$wh/t").last
    assert(Snapshots.clusterOf(spark, s"$wh/t", vm).contains("days(ts)"),
      "mergeByKey must keep the days layout")
    withCatalog("tdml", wh) {
      // a narrow UPDATE touches one day's files; the executor-written
      // replacements inherit day-purity, so the commit's footer-stats
      // proof re-attests the layout even though the row-level write path
      // never requested a clustered distribution
      spark.sql("UPDATE tdml.t SET v = v + 1 WHERE id = 3")
      val vu = Snapshots.versions(spark, s"$wh/t").last
      assert(Snapshots.clusterOf(spark, s"$wh/t", vu).contains("days(ts)"),
        "a day-pure rewrite must re-prove the time layout from stats")
      // INSERT keeps the layout through the write path's routing
      spark.sql(
        "INSERT INTO tdml.t VALUES (TIMESTAMP '2024-03-09 01:02:03', 2000, 1.0)")
      val vi = Snapshots.versions(spark, s"$wh/t").last
      assert(Snapshots.clusterOf(spark, s"$wh/t", vi).contains("days(ts)"))
      noBroadcast {
        val agg = spark.table("tdml.t").groupBy(col("ts")).agg(sum("v"))
        agg.collect()
        assert(PlanOps.shuffleCount(agg) == 0,
          "post-DML days table must still plan key-grouped")
      }
    }
    // compact folds the mutation fan-out back to one file set per day
    Snapshots.compact(spark, s"$wh/t")
    val vc = Snapshots.versions(spark, s"$wh/t").last
    assert(Snapshots.clusterOf(spark, s"$wh/t", vc).contains("days(ts)"))
    val dirs = Snapshots.files(spark, s"$wh/t", vc)
      .flatMap("__cluster=([^/]+)/".r.findFirstMatchIn(_).map(_.group(1))).toSet
    assert(dirs.size == 5, s"4 original days + the inserted day, got $dirs")
  }

  test("SQL: CREATE TABLE PARTITIONED BY (days(ts)) declares the layout") {
    val wh = freshWh("sql")
    withCatalog("tsql", wh) {
      spark.sql("CREATE TABLE tsql.ev (ts TIMESTAMP, id BIGINT) PARTITIONED BY (days(ts))")
      assert(Snapshots.clusterOf(spark, s"$wh/ev", 1).contains("days(ts)"))
      spark.sql("INSERT INTO tsql.ev VALUES (TIMESTAMP '2024-05-01 10:00:00', 1), " +
        "(TIMESTAMP '2024-05-02 10:00:00', 2)")
      val v = Snapshots.versions(spark, s"$wh/ev").last
      assert(Snapshots.clusterOf(spark, s"$wh/ev", v).contains("days(ts)"))
      assert(Snapshots.files(spark, s"$wh/ev", v)
        .flatMap("__cluster=([^/]+)/".r.findFirstMatchIn(_).map(_.group(1)))
        .toSet.size == 2)
      // bucket transforms still route through CALL sys.cluster
      intercept[UnsupportedOperationException] {
        spark.sql("CREATE TABLE tsql.bad (k BIGINT) PARTITIONED BY (bucket(8, k))")
      }
    }
  }

  test("hours layout groups per hour; day-range reads prune through footer stats") {
    val wh = freshWh("hours")
    val hourly = (0 until 48).map { i =>
      (java.sql.Timestamp.valueOf(f"2024-03-01 ${i % 24}%02d:30:00.0"), i.toLong)
    }.toDF("ts", "id")
    Snapshots.publish(spark, s"$wh/h", hourly, clusterBy = Some("hours(ts)"))
    assert(Snapshots.files(spark, s"$wh/h", 1)
      .flatMap("__cluster=([^/]+)/".r.findFirstMatchIn(_).map(_.group(1))).toSet.size == 24)
    // pruning: a 4-day table read with a 1-day filter plans 1 day's files
    Snapshots.publish(spark, s"$wh/t", events, clusterBy = Some("days(ts)"))
    val filtered = spark.read.format("graft-snapshot").option("root", s"$wh/t").load()
      .filter(col("ts") >= lit("2024-03-04").cast("timestamp"))
    val planned = PlanOps.plannedScanFiles(filtered)
    val perDay = Snapshots.files(spark, s"$wh/t", 1).size / 4
    assert(planned <= perDay && planned >= 1,
      s"a one-day filter must plan ~one day's files, planned $planned of " +
        s"${Snapshots.files(spark, s"$wh/t", 1).size}")
  }
}
