package graft

import graft.operators.{Compact, Partitions, Reconcile}
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties, Test}
import org.scalacheck.Prop.propBoolean
import java.nio.file.Files
import java.time.LocalDate
import java.time.format.DateTimeFormatter

/** Property-based invariants (SURVEY.md §5.2): partition enumeration
  * agrees with day-by-day Java time math for arbitrary ranges/patterns,
  * and compaction preserves the row multiset for arbitrary fragmentation.
  * (Raw ScalaCheck Properties — runs under sbt's test interface.)
  */
object PropertySpec extends Properties("graft") {
  import SparkTestEnv._

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(15)

  private val day0 = LocalDate.of(2016, 1, 1)
  private val genStart = Gen.choose(0L, 3000L).map(day0.plusDays)
  private val genLen = Gen.choose(0L, 120L)
  private val genPattern = Gen.oneOf("yyyyMMdd", "yyyyMM", "yyyy", "yyyy-MM-dd")

  property("partition enumeration == JVM day-loop") =
    Prop.forAll(genStart, genLen, genPattern) {
      (start: LocalDate, len: Long, pattern: String) =>
        val end = start.plusDays(len)
        val fmt = DateTimeFormatter.ofPattern(pattern)
        val expected = (0L to len).map(d => start.plusDays(d).format(fmt)).toSet
        val got = Partitions.enumerate(spark, start.toString, end.toString, pattern)
          .collect().map(_.getString(0)).toSet
        got == expected
    }

  private lazy val ordersSrc = Tables.load(spark, sf, "orders")
  private lazy val ordersManifest =
    Reconcile.manifest(ordersSrc, date_format(col("o_orderdate"), "yyyyMM"))

  property("compaction preserves the row multiset") =
    Prop.forAll(Gen.choose(2, 50)) { (nFrag: Int) =>
      val frag = Files.createTempDirectory("graft-prop").toString
      val dest = frag + "-out"
      ordersSrc.repartition(nFrag).write.mode("overwrite").parquet(frag)
      Compact.rewrite(spark, frag, dest, targetBytes = 64 * 1024)
      val dst = spark.read.parquet(dest)
        .select(ordersSrc.columns.map(col).toIndexedSeq: _*)
      Reconcile.diff(ordersManifest,
          Reconcile.manifest(dst, date_format(col("o_orderdate"), "yyyyMM")))
        .filter(col("status") =!= "ok").count() == 0
    }

  private def leafFileCounts(dest: String, partName: String): Seq[Int] = {
    val root = new java.io.File(dest)
    root.listFiles().toSeq
      .filter(f => f.isDirectory && f.getName.startsWith(partName + "="))
      .map(_.listFiles().count(_.getName.endsWith(".parquet")))
  }

  // a partition whose bytes exceed targetBytes must NOT funnel through a
  // single reducer into one file (the 100 TB hot-day scale-killer): the
  // in-leaf salt splits it into multiple files while the layout and the
  // row multiset stay intact
  property("oversized partitions split into >1 file, multiset preserved") = Prop.secure {
    val frag = Files.createTempDirectory("graft-prop-split").toString
    val dest = frag + "-out"
    ordersSrc.write.mode("overwrite").parquet(frag)
    // year-grain leaves with a 2 KB target: every leaf is oversized
    Compact.rewritePartitioned(spark, frag, dest,
      partKeyCol = "o_orderdate", pattern = "yyyy", targetBytes = 2 * 1024)
    val counts = leafFileCounts(dest, "par_key")
    val dst = spark.read.parquet(dest)
      .select(ordersSrc.columns.map(col).toIndexedSeq: _*)
    val clean = Reconcile.diff(ordersManifest,
        Reconcile.manifest(dst, date_format(col("o_orderdate"), "yyyyMM")))
      .filter(col("status") =!= "ok").count() == 0
    (counts.nonEmpty && counts.forall(_ > 1) :| s"leaf file counts: $counts") && clean
  }

  // a leaf of IDENTICAL rows must still split: the salt hashes source
  // position (_metadata), not data columns — a data-column hash would send
  // every duplicate to one reducer, which is exactly the dedup-tier corpus
  property("oversized leaf of duplicate rows still splits") = Prop.secure {
    import org.apache.spark.sql.functions.lit
    val frag = Files.createTempDirectory("graft-prop-dup").toString
    val dest = frag + "-out"
    spark.range(20000)
      .select(
        lit("1996-01-15 00:00:00").cast("timestamp").as("d"),
        lit("identical-payload-row").as("v"))
      .repartition(4).write.mode("overwrite").parquet(frag)
    // duplicates RLE-compress hard — a 1 KB target keeps the (tiny)
    // fixture above the fast-path threshold so the salt path engages
    Compact.rewritePartitioned(spark, frag, dest,
      partKeyCol = "d", pattern = "yyyy", targetBytes = 1024)
    val counts = leafFileCounts(dest, "par_key")
    val rows = spark.read.parquet(dest).count()
    (counts.nonEmpty && counts.forall(_ > 1) :| s"leaf file counts: $counts") &&
      ((rows == 20000L) :| s"row count: $rows")
  }

  // …and right-sized partitions keep the reference's one-file-per-leaf
  property("right-sized partitions still produce exactly one file each") = Prop.secure {
    val frag = Files.createTempDirectory("graft-prop-one").toString
    val dest = frag + "-out"
    ordersSrc.write.mode("overwrite").parquet(frag)
    Compact.rewritePartitioned(spark, frag, dest,
      partKeyCol = "o_orderdate", pattern = "yyyy")
    val counts = leafFileCounts(dest, "par_key")
    (counts.nonEmpty && counts.forall(_ == 1)) :| s"leaf file counts: $counts"
  }
}
