package graft.operators

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Format-agnostic file-tree migration — the reference's actual payload
  * path. The reference copied opaque byte files of any format (text/ORC/
  * csv Hive data) through a 4 KB driver-side loop (HDFSMerge.java:199-211);
  * here the manifest is listed distributed (`binaryFile` metadata, no
  * content read) and each file is copied by an EXECUTOR with a bounded
  * 64 KB stream buffer — no whole-file materialization, no driver data
  * path, and per-file parallelism across the cluster. Verification is the
  * literal `CommonUtils.checkFile` name+length compare
  * ([[FileManifest.diff]]).
  */
object FileMigrate {

  final case class Result(filesCopied: Long, bytesCopied: Long)

  /** Copy every data file under `srcPath` to `destPath`, preserving
    * relative paths (so Hive-style `k1=/k2=/` trees survive byte-for-byte).
    * Hidden files (`_SUCCESS`, dotfiles) are skipped like the reference's
    * merge skipped non-data files (HDFSMerge.java:166).
    */
  def copyTree(spark: SparkSession, srcPath: String, destPath: String): Result = {
    import spark.implicits._
    val hconf = spark.sparkContext.hadoopConfiguration
    val srcRoot = {
      val p = new Path(srcPath)
      p.getFileSystem(hconf).makeQualified(p).toString
    }
    // Configuration is not serializable — ship its properties and rebuild
    // per task (fs.defaultFS etc. must reach executors on a real cluster)
    val confProps = {
      val it = hconf.iterator()
      val b = Seq.newBuilder[(String, String)]
      while (it.hasNext) { val e = it.next(); b += e.getKey -> e.getValue }
      spark.sparkContext.broadcast(b.result())
    }
    val dest = destPath

    // distributed listing: binaryFile restricted to metadata columns never
    // reads file contents (the scan is planned on (path, length) only)
    val files = spark.read.format("binaryFile")
      .option("recursiveFileLookup", "true")
      .load(srcPath)
      .select("path", "length")
      .as[(String, Long)]
      .filter { pl: (String, Long) =>
        val name = pl._1.substring(pl._1.lastIndexOf('/') + 1)
        !name.startsWith("_") && !name.startsWith(".")
      }

    val counts = files.repartition(spark.sparkContext.defaultParallelism)
      .mapPartitions { it =>
        val conf = new Configuration(false)
        confProps.value.foreach { case (k, v) => conf.set(k, v) }
        var nFiles = 0L
        var nBytes = 0L
        it.foreach { case (uri, len) =>
          // binaryFile's `path` is Hadoop Path.toString output (decoded,
          // not URI-encoded) — new URI(...) would throw on a filename with
          // a space; Path(String) does its own tolerant parsing
          val src = new Path(uri)
          val qualified = src.getFileSystem(conf).makeQualified(src).toString
          require(qualified.startsWith(srcRoot),
            s"listed file $qualified escapes source root $srcRoot")
          val rel = qualified.stripPrefix(srcRoot).stripPrefix("/")
          val dst = new Path(dest, rel)
          val in = src.getFileSystem(conf).open(src)
          val out = dst.getFileSystem(conf).create(dst, true)
          // closes both streams, 64 KB bounded buffer
          org.apache.hadoop.io.IOUtils.copyBytes(in, out, 64 * 1024, true)
          nFiles += 1
          nBytes += len
        }
        Iterator((nFiles, nBytes))
      }.collect() // bounded: one (count, bytes) row per task
    Result(counts.map(_._1).sum, counts.map(_._2).sum)
  }

  /** Copy an explicit RELATIVE file list from `srcRoot` to `destRoot`,
    * preserving each relative path — the version-pinned sibling of
    * [[copyTree]] (a snapshot clone copies exactly one manifest's files,
    * not the whole multi-version data tree). Same executor-parallel
    * bounded-buffer copy loop; missing sources fail the job loudly.
    */
  def copyList(spark: SparkSession, srcRoot: String, destRoot: String,
      rel: Seq[String]): Result = {
    import spark.implicits._
    val hconf = spark.sparkContext.hadoopConfiguration
    val confProps = {
      val it = hconf.iterator()
      val b = Seq.newBuilder[(String, String)]
      while (it.hasNext) { val e = it.next(); b += e.getKey -> e.getValue }
      spark.sparkContext.broadcast(b.result())
    }
    val (src, dst) = (srcRoot, destRoot)
    val counts = rel.toDS()
      .repartition(math.max(1, math.min(rel.size,
        spark.sparkContext.defaultParallelism)))
      .mapPartitions { it =>
        val conf = new Configuration(false)
        confProps.value.foreach { case (k, v) => conf.set(k, v) }
        var nFiles = 0L
        var nBytes = 0L
        it.foreach { r =>
          val from = new Path(s"$src/$r")
          val to = new Path(s"$dst/$r")
          val fs = from.getFileSystem(conf)
          val len = fs.getFileStatus(from).getLen
          val in = fs.open(from)
          val out = to.getFileSystem(conf).create(to, true)
          org.apache.hadoop.io.IOUtils.copyBytes(in, out, 64 * 1024, true)
          nFiles += 1
          nBytes += len
        }
        Iterator((nFiles, nBytes))
      }.collect() // bounded: one (count, bytes) row per task
    Result(counts.map(_._1).sum, counts.map(_._2).sum)
  }

  /** True iff src and dest trees carry identical (relative path, length)
    * manifests — the reference's post-copy checkFile pass.
    */
  def verified(spark: SparkSession, srcPath: String, destPath: String): Boolean = {
    import org.apache.spark.sql.functions.col
    FileManifest.diff(
      FileManifest.listTree(spark, srcPath),
      FileManifest.listTree(spark, destPath))
      .filter(col("status") =!= "ok").isEmpty
  }
}
