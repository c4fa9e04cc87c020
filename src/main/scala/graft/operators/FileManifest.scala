package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** File-level manifests as DataFrames — the recursive `listFile`
  * (CommonUtils.java:134-140) and its name+length compare
  * (CommonUtils.java:99-124), kept for the cases where file-granular
  * verification is genuinely wanted (e.g. binary assets). Uses Spark's
  * `binaryFile` source restricted to metadata columns, so listing runs as
  * a distributed scan, not a driver loop.
  */
object FileManifest {

  /** (name, length) per data file under `path` (recursive). */
  def list(spark: SparkSession, path: String): DataFrame =
    spark.read.format("binaryFile")
      .option("recursiveFileLookup", "true")
      .load(path)
      .select(
        regexp_extract(col("path"), "([^/]+)$", 1).as("name"),
        col("length"))
      .filter(!col("name").startsWith("_") && !col("name").startsWith("."))

  /** (relative path, length) per data file under `path` — for tree-shaped
    * manifests where duplicate basenames across partition dirs (every
    * `part-00000`) must not collide. The relative path lands in the same
    * `name` column, so [[diff]] applies unchanged.
    */
  def listTree(spark: SparkSession, path: String): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(path)
    val root = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .makeQualified(p).toString
    spark.read.format("binaryFile")
      .option("recursiveFileLookup", "true")
      .load(path)
      .select(
        // strip "<qualified root>/" — substring is 1-based
        substring(col("path"), root.length + 2, Int.MaxValue).as("name"),
        col("length"))
      .filter {
        val base = regexp_extract(col("name"), "([^/]+)$", 1)
        !base.startsWith("_") && !base.startsWith(".")
      }
  }

  /** Full-outer name→length compare of two trees; the row-level statuses
    * mirror the reference's count/missing/length alerts.
    */
  def diff(src: DataFrame, dst: DataFrame): DataFrame =
    src.select(col("name"), col("length").as("src_len"))
      .join(dst.select(col("name"), col("length").as("dst_len")), Seq("name"), "full_outer")
      .withColumn("status",
        when(col("dst_len").isNull, lit("missing_in_dest"))
          .when(col("src_len").isNull, lit("missing_in_src"))
          .when(col("src_len") =!= col("dst_len"), lit("length_mismatch"))
          .otherwise(lit("ok")))
}
