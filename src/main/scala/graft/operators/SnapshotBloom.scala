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
      column: String, values: Seq[Any]): Seq[String] = {
    require(values.nonEmpty, "filesMightContain needs at least one probe value")
    if (relFiles.isEmpty) return Nil
    val hconf = spark.sparkContext.hadoopConfiguration
    val qualified = new Path(root).getFileSystem(hconf).makeQualified(new Path(root)).toString
    if (relFiles.size <= 16)
      relFiles.filter(rel => mightContain(qualified, rel, column, values, hconf))
    else {
      val conf = new SerializableConfiguration(hconf)
      val vals = values // serialize the local list, not the method arg ref
      val slices = math.min(64, math.max(1, relFiles.size / 16))
      spark.sparkContext.parallelize(relFiles, slices)
        .filter(rel => mightContain(qualified, rel, column, vals, conf.value))
        .collect().toSeq.sorted
    }
  }

  /** One file's verdict: false only when EVERY row group has a bloom
    * filter for `column` and NONE of them might contain ANY probe value.
    */
  private def mightContain(qualifiedRoot: String, rel: String, column: String,
      values: Seq[Any], conf: Configuration): Boolean = {
    val reader = ParquetFileReader.open(
      HadoopInputFile.fromPath(new Path(s"$qualifiedRoot/$rel"), conf))
    try {
      reader.getFooter.getBlocks.asScala.exists { block =>
        block.getColumns.asScala.find(_.getPath.toDotString == column) match {
          case None => true // column absent (pre-evolution file): keep
          case Some(cc) =>
            val bloom = reader.getBloomFilterDataReader(block).readBloomFilter(cc)
            if (bloom == null) true // no filter written: keep
            else {
              val pt = cc.getPrimitiveType.getPrimitiveTypeName
              values.exists { v =>
                coerce(pt, v) match {
                  case Some(cv) => bloom.findHash(bloom.hash(cv))
                  case None => true // un-coercible probe: keep (advisory)
                }
              }
            }
        }
      }
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
