package org.apache.spark.sql.graftbridge

import org.apache.hadoop.fs.Path
import org.apache.spark.paths.SparkPath
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReaderFactory}
import org.apache.spark.sql.execution.datasources.{FilePartition, PartitionedFile}
import org.apache.spark.sql.execution.datasources.parquet.ParquetOptions
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetPartitionReaderFactory
import org.apache.spark.sql.types.StructType
import org.apache.spark.util.SerializableConfiguration

/** Bridge into Spark's DataSource-V2 parquet read machinery for custom
  * connectors (the snapshot streaming source): a file-list-driven scan
  * gets the SAME vectorized/codegen parquet readers as `spark.read
  * .parquet`, instead of a hand-rolled row reader. Lives in the
  * `org.apache.spark.sql` namespace because the factory and its
  * file-partition helpers are `private[sql]` — this is the supported
  * extension seam for connectors built on the file-source engine.
  */
object ParquetReadBridge {

  /** A serializable reader factory decoding the given `schema` from
    * parquet files. Files missing a column (snapshot schema evolution)
    * null-fill it, exactly like `spark.read.schema(s).parquet`.
    */
  def readerFactory(spark: SparkSession, schema: StructType): PartitionReaderFactory = {
    val bc = spark.sparkContext.broadcast(
      new SerializableConfiguration(spark.sessionState.newHadoopConf()))
    ParquetPartitionReaderFactory(
      spark.sessionState.conf, bc,
      dataSchema = schema, readDataSchema = schema,
      partitionSchema = new StructType(),
      filters = Array.empty, aggregation = None,
      options = new ParquetOptions(Map.empty[String, String], spark.sessionState.conf))
  }

  /** Bin-pack absolute file paths into scan partitions using Spark's own
    * sizing (`maxPartitionBytes` / `openCostInBytes`), so a thousand
    * small snapshot files coalesce and a handful of large ones spread —
    * the same task shape the built-in parquet source would plan.
    */
  def filePartitions(spark: SparkSession, paths: Seq[String]): Array[InputPartition] = {
    if (paths.isEmpty) return Array.empty
    val hconf = spark.sessionState.newHadoopConf()
    val pfs = paths.map { p =>
      val hp = new Path(p)
      val st = hp.getFileSystem(hconf).getFileStatus(hp)
      PartitionedFile(InternalRow.empty, SparkPath.fromPath(st.getPath), 0L,
        st.getLen, Array.empty, st.getModificationTime, st.getLen, Map.empty)
    }
    val maxSplit = FilePartition.maxSplitBytes(spark, () => pfs.map(_.length).sum)
    FilePartition.getFilePartitions(spark, pfs, maxSplit).toArray
  }
}
