package graft

import graft.operators.Snapshots
import graft.sources.SnapshotCatalog

import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the SQL catalog over snapshot tables: plain SQL resolution,
  * VERSION/TIMESTAMP AS OF time travel, the pushdown stack reached from
  * SQL (metadata-only count(*)), and CREATE/DROP/RENAME management.
  */
class SnapshotCatalogSpec extends AnyFunSuite {
  import SparkTestEnv._

  private lazy val warehouse: String = {
    val p = java.nio.file.Files.createTempDirectory("graft-catalog-wh")
    p.toFile.deleteOnExit()
    spark.conf.set("spark.sql.catalog.snapcat", classOf[SnapshotCatalog].getName)
    spark.conf.set("spark.sql.catalog.snapcat.warehouse", p.toString)
    p.toString
  }

  private def orders = Tables.load(spark, sf, "orders")

  test("SQL resolves snapshot tables; VERSION/TIMESTAMP AS OF time-travel") {
    val early = orders.filter(col("o_orderkey") % 2 === 0)
    Snapshots.publish(spark, s"$warehouse/t1", early)
    Thread.sleep(30)
    val between = System.currentTimeMillis()
    Thread.sleep(30)
    Snapshots.publish(spark, s"$warehouse/t1", orders)
    assert(spark.sql("SELECT count(*) FROM snapcat.t1").head.getLong(0) ==
      orders.count())
    assert(spark.sql("SELECT count(*) FROM snapcat.t1 VERSION AS OF 1")
      .head.getLong(0) == early.count())
    val ts = new java.sql.Timestamp(between).toString
    assert(spark.sql(
      s"SELECT count(*) FROM snapcat.t1 TIMESTAMP AS OF '$ts'")
      .head.getLong(0) == early.count())
    // a table that appears later resolves without re-registering
    Snapshots.publish(spark, s"$warehouse/t2", orders.limit(10))
    assert(spark.sql("SELECT count(*) FROM snapcat.t2").head.getLong(0) == 10)
  }

  test("the pushdown stack works from SQL: metadata-only count, stats skipping") {
    Snapshots.publish(spark, s"$warehouse/t3",
      orders.repartitionByRange(8, col("o_orderkey"))
        .sortWithinPartitions("o_orderkey"))
    val cnt = spark.sql("SELECT count(*) FROM snapcat.t3")
    assert(cnt.queryExecution.executedPlan.toString.contains("METADATA-ONLY"),
      "SQL count(*) must compile to the stats-answered scan")
    assert(cnt.head.getLong(0) == orders.count())
    val lo = orders.agg(min("o_orderkey")).head.getLong(0)
    val narrow = spark.sql(s"SELECT * FROM snapcat.t3 WHERE o_orderkey = $lo")
    val planned = narrow.queryExecution.executedPlan.collect {
      case b: BatchScanExec => b.inputPartitions.collect {
        case fp: org.apache.spark.sql.execution.datasources.FilePartition =>
          fp.files.length
      }.sum
    }.sum
    assert(planned < 8, s"stats pruning must reach SQL reads, planned $planned")
    assert(narrow.count() == orders.filter(col("o_orderkey") === lit(lo)).count())
  }

  test("INSERT INTO appends a version; INSERT OVERWRITE replaces; history intact") {
    spark.sql("CREATE TABLE snapcat.w (id BIGINT, name STRING) USING `graft-snapshot`")
    spark.sql("INSERT INTO snapcat.w VALUES (1, 'a'), (2, 'b')")
    assert(spark.sql("SELECT count(*) FROM snapcat.w").head.getLong(0) == 2)
    spark.sql("INSERT INTO snapcat.w VALUES (3, 'c')")
    assert(spark.sql("SELECT sum(id) FROM snapcat.w").head.getLong(0) == 6)
    assert(Snapshots.versions(spark, s"$warehouse/w") == Seq(1, 2, 3))
    // snapshot tables carry no hive partitions, so dynamic vs static
    // overwrite is the same operation — the V1 write bridge serves the
    // static plan (the engine session defaults to dynamic for the
    // partitioned Migrate paths)
    val prevMode = spark.conf.get("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "static")
    try spark.sql("INSERT OVERWRITE snapcat.w VALUES (CAST(9 AS BIGINT), 'z')")
    finally spark.conf.set("spark.sql.sources.partitionOverwriteMode", prevMode)
    assert(spark.sql("SELECT count(*) FROM snapcat.w").head.getLong(0) == 1)
    // overwrite is a new VERSION, not destruction: v3 still reads back
    assert(spark.sql("SELECT count(*) FROM snapcat.w VERSION AS OF 3")
      .head.getLong(0) == 3)
  }

  test("SQL DELETE FROM is a stats-pruned CoW publish; NULL-predicate rows survive") {
    import spark.implicits._
    Snapshots.publish(spark, s"$warehouse/d1",
      Seq[(java.lang.Long, String)]((1L, "a"), (2L, "b"), (3L, "c"), (null, "n"))
        .toDF("id", "name"))
    spark.sql("DELETE FROM snapcat.d1 WHERE id >= 2")
    // SQL tri-valued logic: the NULL-id row does not match `id >= 2`
    assert(spark.sql("SELECT name FROM snapcat.d1 ORDER BY name").collect()
      .map(_.getString(0)).toSeq == Seq("a", "n"))
    // versioned, not destructive
    assert(spark.sql("SELECT count(*) FROM snapcat.d1 VERSION AS OF 1")
      .head.getLong(0) == 4)
    // surgical: a range-clustered delete rewrites only the matching band
    Snapshots.publish(spark, s"$warehouse/d2",
      orders.select("o_orderkey", "o_orderpriority")
        .repartitionByRange(8, col("o_orderkey")).sortWithinPartitions("o_orderkey"))
    val lo = orders.agg(min("o_orderkey")).head.getLong(0)
    val before = Snapshots.files(spark, s"$warehouse/d2", 1).toSet
    spark.sql(s"DELETE FROM snapcat.d2 WHERE o_orderkey <= ${lo + 5}")
    val after = Snapshots.files(spark, s"$warehouse/d2", 2).toSet
    assert((before -- after).size <= 2 && (before intersect after).size >= 6,
      s"narrow delete must rewrite only the matching band: kept ${(before intersect after).size} of ${before.size}")
    // a predicate with no exact source-filter form falls through the
    // metadata path to the group-based rewrite (SnapshotDmlSpec pins the
    // mechanics) — never a silent partial delete, never a refusal
    spark.sql("DELETE FROM snapcat.d2 WHERE length(o_orderpriority) = 5")
    val expect = orders.filter(col("o_orderkey") > lit(lo + 5) &&
      length(col("o_orderpriority")) =!= 5).count()
    assert(spark.sql("SELECT count(*) FROM snapcat.d2").head.getLong(0) == expect,
      "the rewrite-path DELETE must apply the untranslatable predicate exactly")
  }

  test("SQL TRUNCATE TABLE publishes an empty version; history intact") {
    import spark.implicits._
    Snapshots.publish(spark, s"$warehouse/tr",
      Seq((1L, "a"), (2L, "b")).toDF("id", "name"))
    spark.sql("TRUNCATE TABLE snapcat.tr")
    assert(spark.sql("SELECT count(*) FROM snapcat.tr").head.getLong(0) == 0)
    assert(spark.sql("SELECT count(*) FROM snapcat.tr VERSION AS OF 1")
      .head.getLong(0) == 2, "pre-truncate data must stay time-travelable")
    // the schema survives the empty version: an append still works
    Snapshots.publish(spark, s"$warehouse/tr",
      Seq((9L, "z")).toDF("id", "name"), append = true)
    assert(spark.sql("SELECT sum(id) FROM snapcat.tr").head.getLong(0) == 9L)
  }

  test("ALTER TABLE ADD/DROP COLUMNS is metadata-only; renames/type changes refuse") {
    import spark.implicits._
    Snapshots.publish(spark, s"$warehouse/ev",
      Seq((1L, "a"), (2L, "b")).toDF("id", "name"))
    val filesBefore = Snapshots.files(spark, s"$warehouse/ev", 1)
    spark.sql("ALTER TABLE snapcat.ev ADD COLUMNS (score DOUBLE)")
    // metadata-only: the new version lists the same files
    assert(Snapshots.files(spark, s"$warehouse/ev", 2) == filesBefore)
    // existing rows read the new column null-filled
    assert(spark.sql("SELECT count(score) FROM snapcat.ev").head.getLong(0) == 0)
    assert(spark.sql("SELECT count(*) FROM snapcat.ev").head.getLong(0) == 2)
    // an insert fills it; old version still serves its own schema
    spark.sql("INSERT INTO snapcat.ev VALUES (CAST(3 AS BIGINT), 'c', CAST(1.5 AS DOUBLE))")
    assert(spark.sql("SELECT sum(score) FROM snapcat.ev").head.getDouble(0) == 1.5)
    assert(!spark.sql("SELECT * FROM snapcat.ev VERSION AS OF 1")
      .columns.contains("score"))
    // DROP COLUMN narrows the projection, data files untouched
    spark.sql("ALTER TABLE snapcat.ev DROP COLUMN score")
    assert(!spark.table("snapcat.ev").columns.contains("score"))
    assert(spark.sql("SELECT count(*) FROM snapcat.ev").head.getLong(0) == 3)
    // refusals: by-name parquet projection makes these data-orphaning
    val r1 = intercept[Exception] {
      spark.sql("ALTER TABLE snapcat.ev RENAME COLUMN name TO label") }
    assert(r1.getMessage.contains("by-name"), r1.getMessage)
    val r2 = intercept[Exception] {
      spark.sql("ALTER TABLE snapcat.ev ALTER COLUMN id TYPE INT") }
    assert(r2 != null) // parse/analysis either way: never applied
    assert(spark.table("snapcat.ev").schema("id").dataType ==
      org.apache.spark.sql.types.LongType)
    // a non-nullable ADD refuses: existing rows have no value
    val r3 = intercept[Exception] {
      spark.sql("ALTER TABLE snapcat.ev ADD COLUMNS (must STRING NOT NULL)") }
    assert(r3.getMessage.contains("nullable"), r3.getMessage)
  }

  test("ALTER COLUMN TYPE widening is metadata-only; one scan reads both generations") {
    import spark.implicits._
    import org.apache.spark.sql.types._
    Snapshots.publish(spark, s"$warehouse/widen",
      Seq((1, 1.5f), (2, 2.5f)).toDF("id", "score"))
    val filesBefore = Snapshots.files(spark, s"$warehouse/widen", 1)
    spark.sql("ALTER TABLE snapcat.widen ALTER COLUMN id TYPE BIGINT")
    spark.sql("ALTER TABLE snapcat.widen ALTER COLUMN score TYPE DOUBLE")
    // metadata-only: same files, new schema
    assert(Snapshots.files(spark, s"$warehouse/widen", 3) == filesBefore)
    assert(spark.table("snapcat.widen").schema("id").dataType == LongType)
    assert(spark.table("snapcat.widen").schema("score").dataType == DoubleType)
    // pre-widening int32/float bytes read promoted; post-widening rows
    // write the new physical type — ONE scan serves both generations
    spark.sql("INSERT INTO snapcat.widen VALUES " +
      "(CAST(4294967296 AS BIGINT), CAST(0.5 AS DOUBLE))")
    val rows = spark.sql("SELECT id, score FROM snapcat.widen ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(rows.toSeq == Seq((1L, 1.5), (2L, 2.5), (4294967296L, 0.5)))
    // stats pruning still works across generations (family-scoped tags)
    assert(spark.sql(
      "SELECT count(*) FROM snapcat.widen WHERE id > 3000000000").head.getLong(0) == 1)
    // metadata-only aggregates fold the widened column correctly
    val agg = spark.sql("SELECT count(*), min(id), max(id) FROM snapcat.widen")
    assert(agg.head() == org.apache.spark.sql.Row(3L, 1L, 4294967296L))
    // old versions still serve their own (pre-widening) schema
    assert(spark.sql("SELECT * FROM snapcat.widen VERSION AS OF 1")
      .schema("id").dataType == IntegerType)
    // narrowing and cross-family changes refuse
    intercept[Exception] {
      spark.sql("ALTER TABLE snapcat.widen ALTER COLUMN id TYPE INT") }
    intercept[Exception] {
      spark.sql("ALTER TABLE snapcat.widen ALTER COLUMN id TYPE DOUBLE") }
    assert(spark.table("snapcat.widen").schema("id").dataType == LongType)
    // decimal precision growth (same scale) is a lossless widening too —
    // the reader promotes across the int64-backed → binary-backed
    // physical change; scale changes refuse (values would rescale)
    Snapshots.publish(spark, s"$warehouse/widendec",
      Seq("12.34", "56.78").toDF("d").select(col("d").cast("decimal(10,2)")))
    spark.sql("ALTER TABLE snapcat.widendec ALTER COLUMN d TYPE DECIMAL(25,2)")
    spark.sql("INSERT INTO snapcat.widendec VALUES (CAST(12345678901234567890.12 AS DECIMAL(25,2)))")
    assert(spark.sql("SELECT CAST(sum(d) AS STRING) FROM snapcat.widendec")
      .head.getString(0) == "12345678901234567959.24")
    intercept[Exception] {
      spark.sql("ALTER TABLE snapcat.widendec ALTER COLUMN d TYPE DECIMAL(30,5)") }
  }

  test("CREATE/DROP/RENAME manage snapshot roots; SHOW TABLES lists them") {
    spark.sql("CREATE TABLE snapcat.managed (id BIGINT, name STRING) USING `graft-snapshot`")
    assert(spark.sql("SELECT count(*) FROM snapcat.managed").head.getLong(0) == 0)
    // the declared schema is recorded: append through the table API
    import spark.implicits._
    Snapshots.publish(spark, s"$warehouse/managed",
      Seq((1L, "a"), (2L, "b")).toDF("id", "name"), append = true)
    assert(spark.sql("SELECT sum(id) FROM snapcat.managed").head.getLong(0) == 3L)
    val names = spark.sql("SHOW TABLES IN snapcat").collect()
      .map(_.getString(1)).toSet
    assert(names.contains("managed") && names.contains("t1"))
    // the RENAME TO target resolves inside the table's catalog
    spark.sql("ALTER TABLE snapcat.managed RENAME TO managed2")
    assert(spark.sql("SELECT count(*) FROM snapcat.managed2").head.getLong(0) == 2)
    spark.sql("DROP TABLE snapcat.managed2")
    intercept[Exception] { spark.sql("SELECT * FROM snapcat.managed2").collect() }
  }

  test("CALL procedures: rollback, history, expire, vacuum from plain SQL") {
    val early = orders.filter(col("o_orderkey") % 2 === 0)
    Snapshots.publish(spark, s"$warehouse/p1", early)
    Snapshots.publish(spark, s"$warehouse/p1", orders)
    assert(spark.sql("SELECT count(*) FROM snapcat.p1").head.getLong(0) ==
      orders.count())
    // rollback rolls FORWARD to a v3 re-listing v1's files
    val v = spark.sql("CALL snapcat.sys.rollback('p1', 1)").head.getInt(0)
    assert(v == 3)
    assert(spark.sql("SELECT count(*) FROM snapcat.p1").head.getLong(0) ==
      early.count())
    // history: one row per version, operations classified
    val hist = spark.sql("CALL snapcat.sys.history('p1')").collect()
    assert(hist.length == 3)
    assert(hist.map(_.getInt(0)).toSeq == Seq(1, 2, 3))
    assert(hist.map(r => r.getLong(2)).toSeq ==
      Seq(early.count(), orders.count(), early.count()))
    // expire + vacuum: keep only the head, reclaim v2's orphaned bytes
    val dropped = spark.sql("CALL snapcat.sys.expire('p1', 1)").collect()
      .map(_.getInt(0)).toSeq
    assert(dropped == Seq(1, 2))
    val deleted = spark.sql("CALL snapcat.sys.vacuum('p1', 0)").head.getLong(0)
    assert(deleted > 0, "vacuum must reclaim the expired versions' files")
    assert(spark.sql("SELECT count(*) FROM snapcat.p1").head.getLong(0) ==
      early.count())
  }

  test("CALL compact and cluster reshape the table from SQL") {
    Snapshots.publish(spark, s"$warehouse/p2", orders.repartition(9))
    assert(Snapshots.files(spark, s"$warehouse/p2", 1).size == 9)
    val v2 = spark.sql("CALL snapcat.sys.compact('p2', 1073741824)").head.getInt(0)
    assert(v2 == 2)
    assert(Snapshots.files(spark, s"$warehouse/p2", 2).size == 1)
    // cluster: one CALL makes the table a storage-partitioned-join side
    val v3 = spark.sql("CALL snapcat.sys.cluster('p2', 'o_orderpriority')")
      .head.getInt(0)
    assert(Snapshots.clusterOf(spark, s"$warehouse/p2", v3)
      .contains("o_orderpriority"))
    val agg = spark.sql(
      "SELECT o_orderpriority, count(*) AS n FROM snapcat.p2 GROUP BY 1")
    assert(agg.collect().map(_.getLong(1)).sum == orders.count())
    // zorder: multi-dimensional rewrite via CALL; history still travels
    val v4 = spark.sql(
      "CALL snapcat.sys.zorder('p2', 'o_orderkey,o_custkey', 1048576)")
      .head.getInt(0)
    assert(v4 == 4)
    assert(spark.sql("SELECT count(*) FROM snapcat.p2").head.getLong(0) ==
      orders.count())
    assert(spark.sql("SELECT count(*) FROM snapcat.p2 VERSION AS OF 1")
      .head.getLong(0) == orders.count())
    // an unknown procedure fails resolution (Spark wraps the catalog's
    // message, which names the available procedures, as the cause)
    val e = intercept[Exception] {
      spark.sql("CALL snapcat.sys.nope('p2')").collect()
    }
    val messages = Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .map(_.getMessage).mkString("; ")
    assert(messages.contains("FAILED_TO_LOAD_ROUTINE") || messages.contains("rollback"),
      s"got: $messages")
  }

  test("identifier segments cannot escape the warehouse (CALL args and quoted idents)") {
    Snapshots.publish(spark, s"$warehouse/esc1", orders.limit(5))
    // a sibling OUTSIDE the warehouse that a traversal could address
    val outside = new java.io.File(new java.io.File(warehouse).getParentFile, "esc-outside")
    Snapshots.publish(spark, outside.toString, orders.limit(5))
    // raw procedure argument: dots become path segments, so '..' or '/'
    // inside one must refuse BEFORE any path is built or mutated
    for (bad <- Seq("../esc-outside", "a/b", "..", "a..b.")) {
      val e = intercept[Exception] {
        spark.sql(s"CALL snapcat.sys.history('$bad')").collect()
      }
      val msgs = Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
        .map(m => Option(m.getMessage).getOrElse("")).mkString("; ")
      assert(msgs.contains("invalid") || msgs.contains("no snapshot table"),
        s"'$bad' must refuse as invalid, got: $msgs")
      // and specifically never resolve the outside table
      assert(!msgs.contains("esc-outside") || msgs.contains("invalid"))
    }
    // quoted identifiers take the same rule on the read path
    val e2 = intercept[Exception] {
      spark.sql("SELECT * FROM snapcat.`../esc-outside`").collect()
    }
    val msgs2 = Iterator.iterate(e2: Throwable)(_.getCause).takeWhile(_ != null)
      .map(m => Option(m.getMessage).getOrElse("")).mkString("; ")
    assert(msgs2.contains("invalid") || msgs2.toLowerCase.contains("table or view not found")
      || msgs2.contains("TABLE_OR_VIEW_NOT_FOUND"), s"got: $msgs2")
    // a well-formed name still works
    assert(spark.sql("SELECT count(*) FROM snapcat.esc1").head.getLong(0) == 5)
  }

  test("CALL create_mv / refresh_mv: a materialized view maintained from plain SQL") {
    // cents, not the raw double: Mv.create refuses float/double sum
    // columns (incremental refresh would drift by ulps per cycle)
    Snapshots.publish(spark, s"$warehouse/mvbase",
      orders.select(col("o_orderkey"), col("o_orderpriority"),
        round(col("o_totalprice") * 100).cast("long").as("cents")))
    val v = spark.sql(
      "CALL snapcat.sys.create_mv('agg1', 'mvbase', 'o_orderkey', 'o_orderpriority', 'cents', 8)")
      .head.getInt(0)
    assert(v == 1)
    // the view IS a catalog table: SELECT works, groups match the base
    val viaSql = spark.sql(
      "SELECT o_orderpriority, n_rows FROM snapcat.agg1").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val expected = orders.groupBy("o_orderpriority").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(viaSql === expected)
    // mutate the base THROUGH SQL, refresh THROUGH SQL
    spark.sql("DELETE FROM snapcat.mvbase WHERE o_orderkey % 2 = 0")
    val rep = spark.sql("CALL snapcat.sys.refresh_mv('agg1')").head
    assert(rep.getString(0) === "incremental")
    assert(rep.getLong(3) > 0) // groups_touched
    val after = spark.sql(
      "SELECT o_orderpriority, n_rows FROM snapcat.agg1").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val expectedAfter = orders.filter(col("o_orderkey") % 2 =!= 0)
      .groupBy("o_orderpriority").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(after === expectedAfter)
    // current → noop
    assert(spark.sql("CALL snapcat.sys.refresh_mv('agg1')")
      .head.getString(0) === "noop")
  }

  test("CALL create_join_mv / refresh_mv: a join MV maintained from plain SQL") {
    Snapshots.publish(spark, s"$warehouse/jmvfact",
      orders.select(col("o_orderkey").as("k"), col("o_custkey"),
        round(col("o_totalprice") * 100).cast("long").as("cents")),
      clusterBy = Some("bucket(8, o_custkey)"))
    Snapshots.publish(spark, s"$warehouse/jmvdim",
      Tables.load(spark, sf, "customer").select("c_custkey", "c_mktsegment"),
      clusterBy = Some("bucket(8, c_custkey)"))
    val v = spark.sql(
      "CALL snapcat.sys.create_join_mv('segagg', 'jmvfact', 'k', 'o_custkey', " +
        "'jmvdim', 'c_custkey', 'c_custkey', 'c_mktsegment', 'cents', 8)")
      .head.getInt(0)
    assert(v == 1)
    val viaSql = spark.sql(
      "SELECT c_mktsegment, n_rows FROM snapcat.segagg").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val expected = spark.table("snapcat.jmvfact")
      .join(spark.table("snapcat.jmvdim"), col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(viaSql === expected)
    // mutate the FACT side through SQL, refresh through the SAME proc
    // that serves single-base MVs (kind dispatch)
    spark.sql("DELETE FROM snapcat.jmvfact WHERE k % 2 = 0")
    val rep = spark.sql("CALL snapcat.sys.refresh_mv('segagg')").head
    assert(rep.getString(0) === "incremental")
    val after = spark.sql(
      "SELECT c_mktsegment, n_rows FROM snapcat.segagg").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val expectedAfter = spark.table("snapcat.jmvfact")
      .join(spark.table("snapcat.jmvdim"), col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(after === expectedAfter)
    assert(spark.sql("CALL snapcat.sys.refresh_mv('segagg')")
      .head.getString(0) === "noop")
  }

  test("CALL create_mv with min_max_columns: hybrid min/max maintained from plain SQL") {
    Snapshots.publish(spark, s"$warehouse/mmbase",
      orders.select(col("o_orderkey"), col("o_orderpriority"),
        round(col("o_totalprice") * 100).cast("long").as("cents")),
      clusterBy = Some("o_orderpriority"))
    val v = spark.sql(
      "CALL snapcat.sys.create_mv('mmagg', 'mmbase', 'o_orderkey', " +
        "'o_orderpriority', 'cents', 8, min_max_columns => 'cents')")
      .head.getInt(0)
    assert(v == 1)
    def expected = spark.table("snapcat.mmbase").groupBy("o_orderpriority")
      .agg(min("cents").as("min_cents"), max("cents").as("max_cents"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    def got = spark.sql(
      "SELECT o_orderpriority, min_cents, max_cents FROM snapcat.mmagg")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got === expected)
    // a RETRACTION through SQL: the refresh recounts (and the report
    // rides the CALL result — groups recounted, file-pruned on the
    // group-clustered base)
    spark.sql("DELETE FROM snapcat.mmbase WHERE o_orderkey % 3 = 0")
    val rep = spark.sql("CALL snapcat.sys.refresh_mv('mmagg')").head
    assert(rep.getString(0) === "incremental")
    assert(rep.getLong(5) > 0L, s"recount_groups must surface: $rep")
    assert(rep.getBoolean(6), s"recount_pruned must surface: $rep")
    assert(got === expected)
  }

  test("CALL create_mv with distinct_columns and where_clause from plain SQL") {
    Snapshots.publish(spark, s"$warehouse/ndbase",
      orders.select(col("o_orderkey"), col("o_orderpriority"), col("o_custkey"),
        round(col("o_totalprice") * 100).cast("long").as("cents")))
    val v = spark.sql(
      "CALL snapcat.sys.create_mv('ndagg', 'ndbase', 'o_orderkey', " +
        "'o_orderpriority', 'cents', 8, distinct_columns => 'o_custkey', " +
        "where_clause => 'cents >= 10000')")
      .head.getInt(0)
    assert(v == 1)
    def expected = spark.table("snapcat.ndbase").where("cents >= 10000")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"), countDistinct(col("o_custkey")).as("nd"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    def got = spark.sql(
      "SELECT o_orderpriority, n_rows, nd_o_custkey FROM snapcat.ndagg")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got === expected)
    // retractions through SQL: whole clerks vanish from some groups, so
    // the companion-maintained nd must DROP (no recount tier involved)
    spark.sql("DELETE FROM snapcat.ndbase WHERE o_orderkey % 2 = 0")
    assert(spark.sql("CALL snapcat.sys.refresh_mv('ndagg')")
      .head.getString(0) === "incremental")
    assert(got === expected)
    assert(spark.sql("CALL snapcat.sys.refresh_mv('ndagg')")
      .head.getString(0) === "noop")
  }

  test("CALL create_mv with a days() group and approx_distinct_columns from plain SQL") {
    Snapshots.publish(spark, s"$warehouse/tgbase",
      orders.select(col("o_orderkey"), col("o_orderdate"), col("o_custkey"),
        round(col("o_totalprice") * 100).cast("long").as("cents")))
    val v = spark.sql(
      "CALL snapcat.sys.create_mv('tgagg', 'tgbase', 'o_orderkey', " +
        "'days(o_orderdate)', 'cents', 8, " +
        "approx_distinct_columns => 'o_custkey')")
      .head.getInt(0)
    assert(v === 1)
    def expected = spark.table("snapcat.tgbase")
      .groupBy(graft.operators.Mv.timeGroup("days", "o_orderdate").as("d"))
      .agg(count(lit(1)).as("n"), countDistinct(col("o_custkey")).as("nd"))
      .collect().map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // per-day customer cardinalities sit in the sketch's exact regime,
    // so the estimate must EQUAL the true distinct count here
    def got = spark.sql(
      "SELECT days_o_orderdate, n_rows, " +
        "hll_sketch_estimate(hll_o_custkey) AS nd FROM snapcat.tgagg")
      .collect().map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got === expected)
    // retraction through SQL: deleted orders thin the days; the sketch
    // recount tier rebuilds the touched days' sketches
    spark.sql("DELETE FROM snapcat.tgbase WHERE o_orderkey % 2 = 0")
    assert(spark.sql("CALL snapcat.sys.refresh_mv('tgagg')")
      .head.getString(0) === "incremental")
    assert(got === expected)
  }

  test("CALL register_route routes a SQL aggregate to the fresh view; retention procs sweep companions") {
    Snapshots.publish(spark, s"$warehouse/rtbase",
      orders.select(col("o_orderkey"), col("o_orderpriority"), col("o_custkey"),
        round(col("o_totalprice") * 100).cast("long").as("cents")))
    spark.sql(
      "CALL snapcat.sys.create_mv('rtagg', 'rtbase', 'o_orderkey', " +
        "'o_orderpriority', 'cents', 8, distinct_columns => 'o_custkey')")
    val routes = spark.sql("CALL snapcat.sys.register_route('rtagg')")
      .head.getString(0)
    assert(routes.contains("rtagg"), routes)
    try {
      val q = spark.sql("SELECT o_orderpriority, count(*) AS n, " +
        "sum(cents) AS s, count(DISTINCT o_custkey) AS nd " +
        "FROM snapcat.rtbase GROUP BY o_orderpriority")
      assert(q.queryExecution.optimizedPlan.toString.contains("rtagg"),
        q.queryExecution.optimizedPlan.toString)
      val expected = spark.table("snapcat.rtbase").groupBy("o_orderpriority")
        .agg(count(lit(1)), sum("cents"), countDistinct(col("o_custkey")))
        .collect().map(_.toSeq).toSet
      assert(q.collect().map(_.toSeq).toSet === expected)
      // retention: refresh cycles grow the view AND companion; the
      // whole-view verbs retire both
      spark.sql("DELETE FROM snapcat.rtbase WHERE o_orderkey % 2 = 0")
      spark.sql("CALL snapcat.sys.refresh_mv('rtagg')")
      val dropped = spark.sql("CALL snapcat.sys.expire_mv('rtagg', 1)").count()
      assert(dropped === 2L) // one old version each: view + companion
      assert(spark.sql("CALL snapcat.sys.vacuum_mv('rtagg', 0)").head.getLong(0) >= 0L)
      // the view still reads and the registry clears on unregister
      assert(spark.sql("SELECT count(*) FROM snapcat.rtagg").head.getLong(0) > 0L)
    } finally {
      val after = spark.sql("CALL snapcat.sys.unregister_route('rtagg')")
        .head.getString(0)
      assert(!after.contains("rtagg"), after)
    }
  }

  test("CALL create_join_mv over a days(ts) time-star from plain SQL") {
    val ev = Tables.load(spark, sf, "events")
    Snapshots.publish(spark, s"$warehouse/tsfact",
      ev.select(col("event_id").as("k"), col("ts"),
        round(col("value") * 100).cast("long").as("cents")),
      clusterBy = Some("days(ts)"))
    Snapshots.publish(spark, s"$warehouse/tsdim",
      ev.select(col("ts").as("rts")).distinct()
        .withColumn("grp", (dayofmonth(col("rts")) % 3).cast("string")),
      clusterBy = Some("days(rts)"))
    val v = spark.sql(
      "CALL snapcat.sys.create_join_mv('tsagg', 'tsfact', 'k', 'ts', " +
        "'tsdim', 'rts', 'rts', 'grp', 'cents', 8, " +
        "min_max_columns => 'cents')").head.getInt(0)
    assert(v == 1)
    def expected = spark.table("snapcat.tsfact")
      .join(spark.table("snapcat.tsdim"), col("ts") === col("rts"))
      .groupBy("grp").agg(count(lit(1)).as("n"), min("cents"), max("cents"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    def got = spark.sql(
      "SELECT grp, n_rows, min_cents, max_cents FROM snapcat.tsagg")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got === expected)
    // mutate the fact through SQL, refresh through the same procedure
    spark.sql("DELETE FROM snapcat.tsfact WHERE k % 2 = 0")
    val rep = spark.sql("CALL snapcat.sys.refresh_mv('tsagg')").head
    assert(rep.getString(0) === "incremental")
    assert(got === expected)
  }

  test("CALL create_join3_mv / refresh_mv: the trilinear star from plain SQL") {
    Snapshots.publish(spark, s"$warehouse/t3fact",
      orders.select(col("o_orderkey").as("k"), col("o_custkey"),
        col("o_orderpriority").as("prio"),
        round(col("o_totalprice") * 100).cast("long").as("cents")),
      clusterBy = Some("bucket(8, o_custkey)"))
    Snapshots.publish(spark, s"$warehouse/t3dim1",
      Tables.load(spark, sf, "customer").select(
        col("c_custkey"), col("c_mktsegment").as("seg")),
      clusterBy = Some("bucket(8, c_custkey)"))
    Snapshots.publish(spark, s"$warehouse/t3dim2",
      orders.select(col("o_orderpriority").as("pr")).distinct()
        .withColumn("plabel", concat(lit("P_"), col("pr"))),
      clusterBy = Some("pr"))
    val v = spark.sql(
      "CALL snapcat.sys.create_join3_mv('t3agg', 't3dim1', 'c_custkey', " +
        "'c_custkey', 't3fact', 'k', 'o_custkey', 'prio', " +
        "'t3dim2', 'pr', 'pr', 'seg,plabel', 'cents', 8)").head.getInt(0)
    assert(v == 1)
    def expected = spark.table("snapcat.t3dim1")
      .join(spark.table("snapcat.t3fact"), col("c_custkey") === col("o_custkey"))
      .join(spark.table("snapcat.t3dim2"), col("prio") === col("pr"))
      .groupBy("seg", "plabel").count()
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    def got = spark.sql("SELECT seg, plabel, n_rows FROM snapcat.t3agg")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got === expected)
    // mutate fact AND a dim through SQL, one refresh through the SAME proc
    spark.sql("DELETE FROM snapcat.t3fact WHERE k % 2 = 0")
    spark.sql("UPDATE snapcat.t3dim2 SET plabel = 'MED*' WHERE pr = '3-MEDIUM'")
    val rep = spark.sql("CALL snapcat.sys.refresh_mv('t3agg')").head
    assert(rep.getString(0) === "incremental")
    assert(got === expected)
    assert(spark.sql("CALL snapcat.sys.refresh_mv('t3agg')")
      .head.getString(0) === "noop")
  }

  test("CALL rebucket_neardup migrates the state set from plain SQL") {
    import spark.implicits._
    import graft.streaming.DocStreams
    val (seen, pairs) = (s"$warehouse/ndseen", s"$warehouse/ndpairs")
    val tA = "alpha beta gamma delta epsilon zeta"
    DocStreams.upsertNearDup(seen, pairs, buckets = 4)(
      Seq((1L, tA), (2L, tA)).toDF("doc_id", "text"), 0L)
    val v = spark.sql(
      "CALL snapcat.sys.rebucket_neardup('ndseen', 'ndpairs', 16)")
      .head.getInt(0)
    assert(v > 1, "rebucket must publish a rewrite version")
    // old count refuses, new count pairs against the migrated state
    val e = intercept[IllegalArgumentException](
      DocStreams.upsertNearDup(seen, pairs, buckets = 4)(
        Seq((3L, tA)).toDF("doc_id", "text"), 1L))
    assert(e.getMessage.contains("buckets=16"), e.getMessage)
    DocStreams.upsertNearDup(seen, pairs, buckets = 16)(
      Seq((3L, tA)).toDF("doc_id", "text"), 1L)
    val got = Snapshots.read(spark, pairs).select("doc_a", "doc_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((1L, 2L), (1L, 3L), (2L, 3L)))
  }

  test("metadata tables: t.files / t.history / t.staged from plain SQL") {
    Snapshots.publish(spark, s"$warehouse/meta1",
      orders.repartition(3), clusterBy = Some("o_orderpriority"))
    Snapshots.publish(spark, s"$warehouse/meta1", orders.limit(10), append = true)
    // files: one row per manifest-listed file, bytes+rows from the
    // manifest, cluster split dir surfaced
    val files = spark.sql("SELECT * FROM snapcat.meta1.files").collect()
    assert(files.length === Snapshots.files(spark, s"$warehouse/meta1", 2).size)
    assert(files.forall(r => !r.isNullAt(1) && r.getLong(1) > 0)) // bytes
    assert(files.map(r => if (r.isNullAt(2)) 0L else r.getLong(2)).sum ===
      orders.count() + 10)
    assert(files.exists(!_.isNullAt(3))) // v1's cluster dirs
    // history: one row per version, operations classified
    val hist = spark.sql(
      "SELECT version, operation FROM snapcat.meta1.history ORDER BY version")
      .collect()
    assert(hist.map(_.getInt(0)).toSeq === Seq(1, 2))
    assert(hist.last.getString(1) === "append")
    // staged: pending WAP candidates visible, gone after promote
    val token = Snapshots.publishStaged(spark, s"$warehouse/meta1",
      orders.limit(5), append = true)
    val staged = spark.sql("SELECT * FROM snapcat.meta1.staged").collect()
    assert(staged.length === 1 && staged.head.getString(0) === token &&
      staged.head.getInt(1) === 2)
    Snapshots.promote(spark, s"$warehouse/meta1", token)
    assert(spark.sql("SELECT * FROM snapcat.meta1.staged").collect().isEmpty)
    // a REAL table always shadows the metadata suffix
    Snapshots.publish(spark, s"$warehouse/meta2", orders.limit(3))
    Snapshots.publish(spark, s"$warehouse/meta2/files", orders.limit(7))
    assert(spark.sql("SELECT count(*) FROM snapcat.meta2.files")
      .head.getLong(0) === 7)
  }
}
