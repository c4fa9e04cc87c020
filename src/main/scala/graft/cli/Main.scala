package graft.cli

import graft.SparkEnv
import graft.operators.{Alerter, Catalog, Compact, FileMigrate, Migrate, Reconcile, Upsert}
import org.apache.spark.sql.functions._

/** CLI with the reference's entry-point surface (README.md:15-21), so a
  * user of the reference can switch by changing the class name:
  *
  *   trans-partition   ≡ TransTablePartition   (date-range migration)
  *   trans-whole-table ≡ TransWholeTablePartition (full-table migration)
  *   merge             ≡ HDFSMerge             (small-file compaction)
  *
  * Option names match the reference (`TransTablePartition.java:46-55`):
  * -srcDB/-distDB (here: directories containing <table>.parquet or
  * <table>/), -table, -pn (partition dir name), -pp (partition pattern),
  * -s/-e (yyyy-MM-dd range), -email (alert target — logged; SMTP transport
  * is pluggable and env-configured, never hard-coded credentials like
  * SendEmail.java:35), plus -dateCol: the row-level engine derives the
  * partition value from data, not from directory names.
  *
  * Differences by design: one distributed job instead of a sequential
  * driver loop; no local staging hop; verification is a row-level
  * count+checksum reconcile instead of file name/length compare.
  */
object Main {

  private def parseFlags(args: Array[String]): Map[String, String] =
    args.sliding(2, 2).collect { case Array(k, v) if k.startsWith("-") =>
      k.dropWhile(_ == '-') -> v
    }.toMap

  private def req(m: Map[String, String], k: String): String =
    m.getOrElse(k, { System.err.println(s"缺少参数 $k (missing argument)"); sys.exit(2) })

  private def tablePath(db: String, table: String): String = {
    val f = new java.io.File(s"$db/$table.parquet")
    if (f.exists()) f.getPath else s"$db/$table"
  }

  def main(args: Array[String]): Unit = {
    if (args.isEmpty) {
      System.err.println(
        """usage: graft.cli.Main <trans-partition|trans-whole-table|merge|trans-files|trans-stream|upsert> [options]
          |  common: -srcDB <dir> -table <name> -dateCol <col> -pn <name> -pp <pattern>
          |          [-catalog true]  -srcDB/-distDB are DATABASE names in the
          |            session catalog: source location resolves via the
          |            catalog, the destination registers as an external
          |            partitioned table (partitions discovered) under the
          |            destination database's directory
          |          [-format parquet|csv|json|orc]  structured source format
          |          [-sp true] [-spCol <col>] [-spp <pattern>] [-pn2 <name>]
          |            second partition level (reference -sp): value is
          |            date_format(spCol|dateCol, spp) or the raw spCol when
          |            -spp is 'raw'; dirs become pn=/pn2=/
          |  trans-partition:   -distDB <dir> -s <yyyy-MM-dd> -e <yyyy-MM-dd> [-email a@b] [-skipExisting true]
          |  trans-whole-table: -distDB <dir> [-email a@b] [-skipExisting true]
          |  merge:             [-distDB <dir>] [-target <bytes>] [-cluster c1,c2]  (no
          |                     -distDB: compact IN PLACE, staged tmp + swap
          |                     — the reference HDFSMerge shape)
          |  trans-files:       -distDB <dir>   (opaque byte copy of any
          |                     format, preserving relative paths; verified
          |                     by name+length manifest diff; path-only)
          |  trans-stream:      -distDB <dir> -ckpt <dir>  (incremental
          |                     migration: checkpointed file-source stream,
          |                     drains new files and stops — run from cron;
          |                     exactly-once per source file; path-only)
          |  upsert:            -delta <dir> -keys k1,k2 [-tombstone <boolCol>]
          |                     (partition-granular MERGE of the delta into
          |                     srcDB/table: touched partitions only; the
          |                     delta derives -pn from -dateCol/-pp when
          |                     missing; tombstoned keys delete)""".stripMargin)
      sys.exit(2)
    }
    val spark = SparkEnv.session("graft-cli")
    // env-configured transport (webhook/SMTP), log sink by default
    try run(args.head, parseFlags(args.tail), spark, Alerter.fromEnv())
    finally spark.stop()
  }

  /** Command dispatch, separated from session lifecycle so specs can
    * drive the full CLI surface in-process against the shared session.
    */
  private[graft] def run(cmd: String, m: Map[String, String],
      spark: org.apache.spark.sql.SparkSession, alerter: Alerter): Unit = {
    val table = req(m, "table")
    // -catalog true: src/dist are database NAMES; locations resolve
    // through the session catalog (the reference's warehouse convention,
    // KeyConstant.java:26, as metadata instead of string concatenation)
    val catalogMode = m.get("catalog").exists(_.toBoolean)
    val src =
      if (catalogMode) Catalog.location(spark, s"${req(m, "srcDB")}.$table")
      else tablePath(req(m, "srcDB"), table)
    // lazy: merge without -distDB compacts IN PLACE (the reference's
    // HDFSMerge shape) and must not demand a destination
    lazy val dst =
      if (catalogMode) Catalog.tableLocation(spark, req(m, "distDB"), table)
      else s"${req(m, "distDB")}/$table"

    // trans-files is format-agnostic: no dateCol / partition semantics
    if (cmd == "trans-files") {
      val r = FileMigrate.copyTree(spark, src, dst)
      println(s"copied files=${r.filesCopied} bytes=${r.bytesCopied}")
      if (FileMigrate.verified(spark, src, dst)) println("verify: OK")
      else alerter.alert("trans-files.verify", s"manifest mismatch between $src and $dst")
      return
    }

    // trans-stream: the cron-driven incremental re-run as a checkpointed
    // drain-and-stop streaming job (exactly-once per source file)
    if (cmd == "trans-stream") {
      val q = Migrate.streamIncremental(spark, src, dst, req(m, "dateCol"),
        req(m, "ckpt"), m.getOrElse("pp", "yyyyMMdd"), m.getOrElse("pn", "par_key"))
      q.awaitTermination()
      println(s"stream drained to $dst")
      return
    }

    val pn = m.getOrElse("pn", "par_key")
    val pp = m.getOrElse("pp", "yyyyMMdd")
    val dateCol = req(m, "dateCol")
    val skip = m.get("skipExisting").exists(_.toBoolean)
    // -format csv|json|orc|parquet: structured non-parquet sources land as
    // parquet partitions (csv/json get the standard header/inference opts)
    val srcFormat = m.getOrElse("format", "parquet")
    val srcOptions: Map[String, String] = srcFormat match {
      case "csv" => Map("header" -> "true", "inferSchema" -> "true")
      case _ => Map.empty
    }
    // reference -sp true: second partition level. Derived from -spCol (or
    // dateCol) through -spp, or taken raw when -spp is 'raw'.
    val subPart: Option[Migrate.SubPart] =
      if (!m.get("sp").exists(_.toBoolean)) None
      else {
        val spp = m.getOrElse("spp", "HH")
        Some(Migrate.SubPart(
          srcCol = m.getOrElse("spCol", dateCol),
          pattern = if (spp == "raw") None else Some(spp),
          name = m.getOrElse("pn2", "par_sub")))
      }

    // catalog mode: after a successful write, the destination becomes (or
    // refreshes) a registered external partitioned table
    def registerDest(): Unit = if (catalogMode)
      Catalog.register(spark, req(m, "distDB"), table, dst,
        pn +: subPart.map(_.name).toSeq)

    cmd match {
      // -target bounds the bytes a destination leaf funnels through one
      // writer (oversized leaves split — same flag as merge)
      case "trans-partition" =>
        val (start, end) = (req(m, "s"), req(m, "e"))
        val r = Migrate.migrateRange(spark, src, dst, dateCol,
          start, end, pp, skip, alerter, pn, subPart, srcFormat, srcOptions,
          m.get("target").map(_.toLong).getOrElse(128L * 1024 * 1024))
        println(s"migrated partitions=${r.partitionsWritten} skipped=${r.partitionsSkipped} rows=${r.rowsWritten}")
        registerDest()
        verify(spark, src, dst, dateCol, pp, alerter, Some((start, end)), subPart,
          srcFormat, srcOptions)
      case "trans-whole-table" =>
        val r = Migrate.migrateAll(spark, src, dst, dateCol, pp, skip, alerter, pn,
          subPart, srcFormat, srcOptions,
          m.get("target").map(_.toLong).getOrElse(128L * 1024 * 1024))
        println(s"migrated partitions=${r.partitionsWritten} skipped=${r.partitionsSkipped} rows=${r.rowsWritten}")
        registerDest()
        verify(spark, src, dst, dateCol, pp, alerter, None, subPart, srcFormat, srcOptions)
      // upsert: partition-granular MERGE of a keyed delta into the table
      // at srcDB/table — only delta-touched partitions are read or
      // rewritten; -tombstone <boolCol> rows delete (an emptied
      // partition's directory is removed). The delta derives the
      // partition key from -dateCol/-pp when it doesn't carry it.
      case "upsert" =>
        val keys = req(m, "keys").split(',').map(_.trim).filter(_.nonEmpty).toSeq
        val raw = Migrate.read(spark, req(m, "delta"), srcFormat, srcOptions)
        val withPn =
          if (raw.columns.contains(pn)) raw
          else raw.withColumn(pn, date_format(col(dateCol), pp))
        val delta = subPart match {
          case Some(sp) if !withPn.columns.contains(sp.name) =>
            withPn.withColumn(sp.name, sp.value)
          case _ => withPn
        }
        val st = Upsert.mergeByKey(spark, src, delta, keys,
          pn +: subPart.map(_.name).toSeq, m.get("tombstone"))
        println(s"merged partitions=${st.partsTouched} removed=${st.partsRemoved} rows=${st.rowsWritten}")
      case "merge" =>
        val target = m.get("target").map(_.toLong).getOrElse(128L * 1024 * 1024)
        // -cluster a,b: sort inside each writer task so row-group stats
        // become tight ranges (data skipping); paid once, while rewriting
        val clusterBy = m.get("cluster").toSeq.flatMap(_.split(',')).filter(_.nonEmpty)
        // no -distDB → in place, like the reference's HDFSMerge
        val inPlace = !catalogMode && !m.contains("distDB")
        val st =
          if (inPlace) Compact.rewriteInPlacePartitioned(spark, src, dateCol, pp,
            target, pn, subPart, srcFormat, srcOptions)
          else Compact.rewritePartitioned(spark, src, dst, dateCol, pp,
            target, pn, subPart, srcFormat, srcOptions, clusterBy = clusterBy)
        println(s"compacted files ${st.filesBefore} -> ${st.filesAfter} (${st.bytesBefore} bytes)")
        if (!inPlace) registerDest()
      case other =>
        System.err.println(s"unknown command: $other"); sys.exit(2)
    }
  }

  /** Post-copy verification — the reference ran checkFile after every
    * partition (README.md:43); we reconcile the whole range in one job.
    */
  private def verify(spark: org.apache.spark.sql.SparkSession, src: String,
      dst: String, dateCol: String, pp: String, alerter: Alerter,
      range: Option[(String, String)],
      subPart: Option[Migrate.SubPart] = None,
      srcFormat: String = "parquet",
      srcOptions: Map[String, String] = Map.empty): Unit = {
    // The expected set is the SOURCE restricted to the migrated range (the
    // reference checked each migrated partition, README.md:43) — bounding
    // by destination keys instead would make a partition that never arrived
    // look "ok" (missing_in_dest must stay reachable).
    val sAll = Migrate.read(spark, src, srcFormat, srcOptions)
    val s = range match {
      case Some((start, end)) => sAll.filter(
        col(dateCol) >= to_timestamp(lit(start)) &&
          col(dateCol) < to_timestamp(date_add(to_date(lit(end)), 1)))
      case None => sAll
    }
    val cols = sAll.columns.map(col).toIndexedSeq
    val d = spark.read.parquet(dst).select(cols: _*)
    // two-level layouts reconcile at (key, sub) grain: the composite key
    // keeps a misplaced sub-partition (right day, wrong hour) detectable
    val key = subPart match {
      case Some(sp) => concat_ws("/", date_format(col(dateCol), pp), sp.value)
      case None => date_format(col(dateCol), pp)
    }
    val srcManifest = Reconcile.manifest(s, key)
    val dstManifest = Reconcile.manifest(d, key)
    val bad = Reconcile.diff(srcManifest, dstManifest)
      .filter(col("status") =!= "ok")
      .collect()
    if (bad.isEmpty) println("verify: OK")
    else bad.foreach(r => alerter.alert("migrate.verify",
      s"partition ${r.getAs[String]("par_key")}: ${r.getAs[String]("status")}"))
  }
}
