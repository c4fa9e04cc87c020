package graft.operators

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.io.api.Binary
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
import org.apache.spark.sql.SparkSession
import org.apache.spark.util.SerializableConfiguration

import scala.jdk.CollectionConverters._

/** Point-lookup file skipping via PARQUET BLOOM FILTERS — the complement
  * to [[SnapshotStats]]' min/max ranges: an unclustered high-cardinality
  * key gives every file a near-global [min,max] (ranges prune nothing),
  * but a per-file bloom filter answers "could key K be in this file?"
  * from footer metadata alone. Publish with
  * `Snapshots.publish(..., bloomOn = Seq("doc_id"))` and a needle lookup
  * over 100 TB opens k bloom footers instead of scanning the table.
  *
  * The filters are parquet's own (written by the standard
  * `parquet.bloom.filter.enabled#col` writer knob, read back through
  * `ParquetFileReader.getBloomFilterDataReader`) — no side index to keep
  * consistent: the filter lives and dies with its file, shares its
  * immutability, and travels through manifests untouched. Absence is
  * safe by construction: a file (or row group) without a filter for the
  * column is KEPT.
  */
object SnapshotBloom {

  /** The subset of `relFiles` that MIGHT contain at least one of `values`
    * in `column`, per their bloom filters. Files without a filter are
    * kept. Footer+bloom reads only — distributed when the candidate list
    * is large, driver-side for a handful.
    */
  def filesMightContain(spark: SparkSession, root: String, relFiles: Seq[String],
      column: String, values: Seq[Any]): Seq[String] =
    filesMightContainReport(spark, root, relFiles, column, values)._1

  /** [[filesMightContain]] plus a STRUCTURAL-BOUND report: the second
    * half is true only when EVERY candidate file carried a bloom filter
    * for `column` on EVERY row group and every probe value coerced into
    * its hash domain — then the surviving set is a real per-file bound
    * (each kept file bloom-matched some probe value), not an advisory
    * one weakened by filter-less files that were kept unexamined. The
    * caller surfaces the distinction ([[Mv]]'s probe-degradation
    * reports).
    */
  def filesMightContainReport(spark: SparkSession, root: String,
      relFiles: Seq[String], column: String, values: Seq[Any])
      : (Seq[String], Boolean) = {
    require(values.nonEmpty, "filesMightContain needs at least one probe value")
    if (relFiles.isEmpty) return (Nil, true)
    val hconf = spark.sparkContext.hadoopConfiguration
    val qualified = new Path(root).getFileSystem(hconf).makeQualified(new Path(root)).toString
    val verdicts: Seq[(String, Boolean, Boolean)] =
      if (relFiles.size <= 16)
        relFiles.map(rel => (rel, mightContain(qualified, rel, column, values, hconf)))
          .map { case (rel, (keep, structural)) => (rel, keep, structural) }
      else {
        val conf = new SerializableConfiguration(hconf)
        val vals = values // serialize the local list, not the method arg ref
        val slices = math.min(64, math.max(1, relFiles.size / 16))
        spark.sparkContext.parallelize(relFiles, slices)
          .map { rel =>
            val (keep, structural) = mightContain(qualified, rel, column, vals, conf.value)
            (rel, keep, structural)
          }
          .collect().toSeq.sortBy(_._1)
      }
    (verdicts.collect { case (rel, true, _) => rel },
      verdicts.forall(_._3))
  }

  /** One file's verdict: (keep, structural). keep = false only when
    * EVERY row group has a bloom filter for `column` and NONE of them
    * might contain ANY probe value; structural = every row group had a
    * filter and every probe value coerced (the file's verdict rests on
    * blooms alone, no benefit-of-the-doubt keeps).
    */
  private def mightContain(qualifiedRoot: String, rel: String, column: String,
      values: Seq[Any], conf: Configuration): (Boolean, Boolean) = {
    val reader = ParquetFileReader.open(
      HadoopInputFile.fromPath(new Path(s"$qualifiedRoot/$rel"), conf))
    try {
      var keep = false
      var structural = true
      reader.getFooter.getBlocks.asScala.foreach { block =>
        block.getColumns.asScala.find(_.getPath.toDotString == column) match {
          case None => keep = true; structural = false // pre-evolution file
          case Some(cc) =>
            val bloom = reader.getBloomFilterDataReader(block).readBloomFilter(cc)
            if (bloom == null) { keep = true; structural = false }
            else {
              val pt = cc.getPrimitiveType.getPrimitiveTypeName
              values.foreach { v =>
                coerce(pt, v) match {
                  case Some(cv) => if (bloom.findHash(bloom.hash(cv))) keep = true
                  case None => keep = true; structural = false // un-coercible
                }
              }
            }
        }
      }
      (keep, structural)
    } finally reader.close()
  }

  /** Whether ONE file carries a bloom filter for `column` on any row
    * group — the cheap (single footer read) gate a caller uses to decide
    * if a full [[filesMightContainReport]] sweep over a homogeneous
    * version is worth scheduling at all.
    */
  def hasBloom(spark: SparkSession, root: String, relFile: String,
      column: String): Boolean = {
    val hconf = spark.sparkContext.hadoopConfiguration
    val qualified = new Path(root).getFileSystem(hconf).makeQualified(new Path(root)).toString
    val reader = ParquetFileReader.open(
      HadoopInputFile.fromPath(new Path(s"$qualified/$relFile"), hconf))
    try reader.getFooter.getBlocks.asScala.exists { block =>
      block.getColumns.asScala.find(_.getPath.toDotString == column)
        .exists(cc => reader.getBloomFilterDataReader(block).readBloomFilter(cc) != null)
    } finally reader.close()
  }

  /** Probe value → the column's physical-type representation (the hash
    * domain parquet populated the filter from). None = cannot coerce.
    */
  private def coerce(pt: PrimitiveTypeName, v: Any): Option[AnyRef] = (pt, v) match {
    case (PrimitiveTypeName.INT64, n: Number) => Some(java.lang.Long.valueOf(n.longValue()))
    case (PrimitiveTypeName.INT32, n: Number) => Some(java.lang.Integer.valueOf(n.intValue()))
    case (PrimitiveTypeName.DOUBLE, n: Number) => Some(java.lang.Double.valueOf(n.doubleValue()))
    case (PrimitiveTypeName.FLOAT, n: Number) => Some(java.lang.Float.valueOf(n.floatValue()))
    case (PrimitiveTypeName.BINARY, s: String) => Some(Binary.fromString(s))
    case _ => None
  }
}
