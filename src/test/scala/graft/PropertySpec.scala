package graft

import graft.operators.{Compact, Partitions, Reconcile}
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties, Test}
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
}
