package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Post-copy verification — the row-level generalization of
  * `CommonUtils.checkFile` (CommonUtils.java:99-124), which compared file
  * counts, names and lengths between source and destination trees and
  * emailed on mismatch.
  *
  * Here a *manifest* is a per-partition (row count, order-independent
  * checksum) pair; reconciliation is a full-outer join of two manifests
  * (the reference's name→length map compare, CommonUtils.java:107-121).
  * `sum(xxhash64(struct(*)))` is commutative, so the checksum is stable
  * under any row order / partitioning — safe at 100 TB where row order is
  * never deterministic.
  */
object Reconcile {

  /** Per-partition manifest of `df`: n_rows + content checksum. `partKey`
    * must be deterministic per row (e.g. `date_format(col("dt"),"yyyyMMdd")`).
    */
  def manifest(df: DataFrame, partKey: Column): DataFrame = {
    val dataCols = df.columns.map(col).toIndexedSeq
    df.groupBy(partKey.as("par_key"))
      .agg(
        count(lit(1)).as("n_rows"),
        // decimal(38,0) sum: order-independent and overflow-proof (ANSI mode
        // would throw on long overflow after ~2 rows of extreme hashes)
        sum(xxhash64(dataCols: _*).cast("decimal(38,0)")).as("checksum"))
  }

  /** Full-outer manifest compare. Status per partition:
    * ok | missing_in_dest | missing_in_src | count_mismatch | checksum_mismatch
    * — the row-level analogues of the reference's "缺少文件"/length-mismatch
    * alerts (CommonUtils.java:102-121).
    */
  def diff(src: DataFrame, dst: DataFrame): DataFrame = {
    val s = src.select(col("par_key"), col("n_rows").as("src_rows"), col("checksum").as("src_sum"))
    val d = dst.select(col("par_key"), col("n_rows").as("dst_rows"), col("checksum").as("dst_sum"))
    s.join(d, Seq("par_key"), "full_outer")
      .withColumn("status",
        when(col("dst_rows").isNull, lit("missing_in_dest"))
          .when(col("src_rows").isNull, lit("missing_in_src"))
          .when(col("src_rows") =!= col("dst_rows"), lit("count_mismatch"))
          .when(col("src_sum") =!= col("dst_sum"), lit("checksum_mismatch"))
          .otherwise(lit("ok")))
  }

  /** True iff every partition reconciles clean. Aggregates to one row —
    * driver-safe at any scale.
    */
  def isClean(src: DataFrame, dst: DataFrame): Boolean =
    diff(src, dst).filter(col("status") =!= "ok").isEmpty

  /** ROW-level change-data-capture diff between two versions of a keyed
    * table: one row per inserted / deleted / updated key, unchanged rows
    * dropped. Where [[diff]] answers "which PARTITIONS drifted" at
    * manifest cost, this answers "which ROWS, and how" — the snapshot
    * diff a downstream incremental consumer (or an audit) replays.
    *
    * One key-shuffle full-outer join; the value columns travel as single
    * structs so the change classification is one null/inequality test
    * per row regardless of column count. Keys must be non-null and
    * unique per side (primary-key semantics — the same contract the
    * reference's filename-keyed manifest compare assumed,
    * CommonUtils.java:107-121).
    */
  def cdcDiff(oldDf: DataFrame, newDf: DataFrame, keys: Seq[String],
      compareCols: Seq[String]): DataFrame = {
    val o = oldDf.select((keys.map(col) :+
      struct(compareCols.map(col): _*).as("__old")): _*)
    val n = newDf.select((keys.map(col) :+
      struct(compareCols.map(col): _*).as("__new")): _*)
    o.join(n, keys, "full_outer")
      .withColumn("change",
        when(col("__old").isNull, lit("insert"))
          .when(col("__new").isNull, lit("delete"))
          .when(col("__old") =!= col("__new"), lit("update")))
      .filter(col("change").isNotNull)
      .select((keys.map(col) :+ col("change")): _*)
  }

  /** METADATA-ONLY manifest: per partition directory, (file count, row
    * count from parquet FOOTERS). No data page is ever read — footers are
    * a few KB at the file tail — so this is the cheap triage tier for
    * 100 TB verifications: it catches bulk loss (missing partitions,
    * truncated files, lost writes) at metadata cost; the full [[manifest]]
    * checksum remains the content-level acceptance check. Footer reads
    * are distributed (one task batch per file group), not driver-side.
    *
    * Output matches [[diff]]'s input shape with `checksum` = footer row
    * count, so `diff(footerManifest(a), footerManifest(b))` works
    * unchanged (a count mismatch surfaces as both count and checksum).
    */
  def footerManifest(spark: org.apache.spark.sql.SparkSession, root: String,
      partNames: Seq[String] = Seq("par_key")): DataFrame = {
    import spark.implicits._
    val perFile = footerScan(spark, root, partNames, Seq.empty)
      .map { case (key, rows, _, _, _) => (key, rows) }.toDF("par_key", "rows")
    perFile.groupBy("par_key")
      .agg(count(lit(1)).as("n_files"), sum("rows").as("n_rows"))
      .select(col("par_key"), col("n_files"), col("n_rows"),
        col("n_rows").cast("decimal(38,0)").as("checksum"))
  }

  /** STATISTICS manifest: per partition directory, (file count, footer row
    * count, per-column min/max) from parquet footer column statistics —
    * still metadata-only, extending the [[footerManifest]] triage from
    * bulk loss to VALUE-RANGE drift (a corrupted/shifted column surfaces
    * as a min/max excursion without scanning a single data page; footer
    * min/max over the written values is exactly SQL `min`/`max`, so the
    * result is oracle-comparable). `statCols` must be numeric or
    * timestamp columns (footer stats for those are exact, never
    * truncated; binary/string stats can be truncated by writers and are
    * rejected). Output: par_key, n_files, n_rows, then `<col>_min`,
    * `<col>_max` doubles (null when every value in the partition is null)
    * and `<col>_nulls` (the footer null count — exactly SQL
    * `count(*) - count(col)`) per requested column.
    */
  def statsManifest(spark: org.apache.spark.sql.SparkSession, root: String,
      statCols: Seq[String], partNames: Seq[String] = Seq("par_key")): DataFrame = {
    import spark.implicits._
    val perFile = footerScan(spark, root, partNames, statCols)
      .toDF("par_key", "rows", "mins", "maxs", "nulls")
    val statAggs = statCols.zipWithIndex.flatMap { case (c, i) =>
      Seq(min(element_at(col("mins"), i + 1)).as(s"${c}_min"),
        max(element_at(col("maxs"), i + 1)).as(s"${c}_max"),
        sum(element_at(col("nulls"), i + 1)).as(s"${c}_nulls"))
    }
    perFile.groupBy("par_key")
      .agg(count(lit(1)).as("n_files"),
        (sum(col("rows")).as("n_rows") +: statAggs): _*)
  }

  /** Distributed footer read under `root`: one (par_key, rows, mins,
    * maxs, nulls) tuple per data file, with per-column min/max/null-count
    * for `statCols` pulled from the column-chunk statistics (reduced
    * across row groups; min/max are None when the file holds no non-null
    * value for the column, nulls is None when any chunk lacks the count).
    */
  private def footerScan(spark: org.apache.spark.sql.SparkSession, root: String,
      partNames: Seq[String], statCols: Seq[String])
      : org.apache.spark.sql.Dataset[(String, Long, Seq[Option[Double]], Seq[Option[Double]], Seq[Option[Long]])] = {
    import spark.implicits._
    val rootPath = new org.apache.hadoop.fs.Path(root)
    val fs = rootPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val rootUri = fs.makeQualified(rootPath).toString
    val files = scala.collection.mutable.ArrayBuffer.empty[String]
    // a missing root is an empty manifest (diff then reports every source
    // partition missing_in_dest), not a listing crash
    if (fs.exists(rootPath)) {
      val it = fs.listFiles(rootPath, true)
      while (it.hasNext) {
        val f = it.next()
        val n = f.getPath.getName
        if (!n.startsWith("_") && !n.startsWith(".")) files += f.getPath.toString
      }
    }
    val confBc = spark.sparkContext.broadcast(
      new org.apache.spark.util.SerializableConfiguration(
        spark.sparkContext.hadoopConfiguration))
    spark.createDataset(files.toSeq)
      .repartition(math.max(1, math.min(files.size, spark.sparkContext.defaultParallelism)))
      .mapPartitions { paths =>
        val conf = confBc.value.value
        paths.map { p =>
          val in = org.apache.parquet.hadoop.util.HadoopInputFile
            .fromPath(new org.apache.hadoop.fs.Path(p), conf)
          val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
          val (rows, mins, maxs, nulls) = try {
            val blocks = scala.jdk.CollectionConverters.ListHasAsScala(
              r.getFooter.getBlocks).asScala.toSeq
            val perCol = statCols.map { c =>
              val chunkStats = blocks.flatMap { b =>
                scala.jdk.CollectionConverters.ListHasAsScala(b.getColumns).asScala
                  .find(_.getPath.toDotString == c)
                  .map(_.getStatistics)
              }
              require(chunkStats.nonEmpty || blocks.isEmpty,
                s"column $c not found in parquet footer of $p")
              val present = chunkStats.filter(s => s != null && s.hasNonNullValue)
              def num(v: Any): Double = v match {
                case i: java.lang.Integer => i.toDouble
                case l: java.lang.Long => l.toDouble
                case f: java.lang.Float => f.toDouble
                case d: java.lang.Double => d
                case o => throw new IllegalArgumentException(
                  s"statsManifest supports numeric/timestamp columns; " +
                    s"$c has ${o.getClass.getSimpleName} statistics")
              }
              val nulls =
                if (chunkStats.exists(s => s == null || !s.isNumNullsSet)) None
                else Some(chunkStats.map(_.getNumNulls).sum)
              if (present.isEmpty) (None, None, nulls)
              else (Some(present.map(s => num(s.genericGetMin)).min),
                Some(present.map(s => num(s.genericGetMax)).max), nulls)
            }
            (r.getRecordCount, perCol.map(_._1), perCol.map(_._2), perCol.map(_._3))
          } finally r.close()
          // partition key from the name=value dirs between root and file
          val rel = p.stripPrefix(rootUri).stripPrefix("/")
          val key = rel.split('/').dropRight(1)
            .filter(seg => partNames.exists(n => seg.startsWith(n + "=")))
            .map(seg => org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
              .unescapePathName(seg.substring(seg.indexOf('=') + 1)))
            .mkString("/")
          (key, rows, mins, maxs, nulls)
        }
      }
  }
}
