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

  // per-leaf sizing is EXACT (file bytes apportioned by row share), not a
  // global bytes/row estimate: a leaf of atypically wide rows in its own
  // files must split even though the corpus-wide average says it fits —
  // here the wide leaf holds ~0.5% of the rows but ~90% of the bytes, so
  // the global estimate would leave it as one multi-target file
  property("a wide-row leaf splits where the global bytes/row average says it fits") =
    Prop.secure {
      val frag = Files.createTempDirectory("graft-prop-wide").toString
      val dest = frag + "-out"
      // 1996 leaf: 150 rows × ~8 KB of non-compressible hex (256 chained md5s)
      val wideCols = (0 until 256).map(j => md5(concat(col("id"), lit(j))))
      spark.range(150)
        .select(lit("1996-06-01 00:00:00").cast("timestamp").as("d"),
          concat_ws("", wideCols: _*).as("v"))
        .repartition(2).write.mode("overwrite").parquet(frag)
      // 1997 leaf: 30k narrow rows, separate (append) files
      spark.range(30000)
        .select(lit("1997-06-01 00:00:00").cast("timestamp").as("d"),
          concat(lit("n"), col("id")).cast("string").as("v"))
        .repartition(2).write.mode("append").parquet(frag)
      Compact.rewritePartitioned(spark, frag, dest,
        partKeyCol = "d", pattern = "yyyy", targetBytes = 256 * 1024)
      val byLeaf = new java.io.File(dest).listFiles().toSeq
        .filter(f => f.isDirectory && f.getName.startsWith("par_key="))
        .map(f => f.getName -> f.listFiles().count(_.getName.endsWith(".parquet")))
        .toMap
      val rows = spark.read.parquet(dest).count()
      ((byLeaf("par_key=1996") > 1) :| s"wide leaf files: $byLeaf") &&
        ((byLeaf("par_key=1997") >= 1) :| s"narrow leaf files: $byLeaf") &&
        ((rows == 30150L) :| s"rows: $rows")
    }

  // Migrate's write path has the same hot-day hazard as Compact: a day
  // whose bytes exceed targetBytes must fan out over multiple writer
  // tasks/files (shared [[Compact.leafSalted]] salt), with the Hive
  // layout and the row multiset intact
  property("migrate splits an oversized day into >1 file, multiset preserved") = Prop.secure {
    val frag = Files.createTempDirectory("graft-prop-mig-split").toString
    val dest = frag + "-out"
    ordersSrc.write.mode("overwrite").parquet(frag)
    graft.operators.Migrate.migrateAll(spark, frag, dest,
      dateCol = "o_orderdate", pattern = "yyyy", targetBytes = 2 * 1024)
    val counts = leafFileCounts(dest, "par_key")
    val dst = spark.read.parquet(dest)
      .select(ordersSrc.columns.map(col).toIndexedSeq: _*)
    val clean = Reconcile.diff(ordersManifest,
        Reconcile.manifest(dst, date_format(col("o_orderdate"), "yyyyMM")))
      .filter(col("status") =!= "ok").count() == 0
    (counts.nonEmpty && counts.forall(_ > 1) :| s"leaf file counts: $counts") && clean
  }

  // ---- randomized cross-checks of the newer operators against
  //      straightforward driver-side / brute-force models ----

  private def unionFind(n: Int, edges: Seq[(Int, Int)]): Map[Int, Int] = {
    val parent = Array.tabulate(n)(identity)
    def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); r }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b)); if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    (0 until n).map(i => i -> find(find(i))).toMap
  }

  private val genEdges = for {
    n <- Gen.choose(2, 40)
    m <- Gen.choose(1, 60)
    es <- Gen.listOfN(m, Gen.zip(Gen.choose(0, n - 1), Gen.choose(0, n - 1)))
  } yield (n, es.filter(e => e._1 != e._2))

  property("connected components == driver union-find on random graphs") =
    Prop.forAll(genEdges) { case (n, edges) =>
      edges.isEmpty || {
        import spark.implicits._
        val pairs = edges.map { case (a, b) =>
          (math.min(a, b).toLong, math.max(a, b).toLong)
        }.distinct.toDF("doc_a", "doc_b")
        val got = graft.operators.DedupComponents.components(pairs)
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        val uf = unionFind(n, edges)
        val touched = edges.flatMap(e => Seq(e._1, e._2)).distinct
        touched.forall(i => got(i.toLong) == uf(i).toLong)
      }
    }

  private val genRangeCase = for {
    nPts <- Gen.choose(1, 40)
    nIvs <- Gen.choose(1, 15)
    pts <- Gen.listOfN(nPts, Gen.zip(Gen.choose(0L, 2L), Gen.choose(0L, 2000000L)))
    ivs <- Gen.listOfN(nIvs, Gen.zip(Gen.choose(0L, 2L), Gen.choose(0L, 2000000L), Gen.choose(0L, 900000L)))
  } yield (pts, ivs)

  property("range join == brute-force filter on random sub-second data") =
    Prop.forAll(genRangeCase) { case (pts, ivs) =>
      import spark.implicits._
      import org.apache.spark.sql.functions.{col, timestamp_micros}
      val p = pts.zipWithIndex.map { case ((k, us), i) => (i.toLong, k, us) }
        .toDF("pid", "pk", "pus").withColumn("pt", timestamp_micros(col("pus")))
      val iv = ivs.zipWithIndex.map { case ((k, s, w), i) => (i.toLong, k, s, s + w) }
        .toDF("iid", "ik", "sus", "eus")
        .withColumn("s", timestamp_micros(col("sus")))
        .withColumn("e", timestamp_micros(col("eus")))
      val got = graft.operators.RangeJoin.pointInInterval(
          p, iv, "pk", "ik", "pt", "s", "e", bucketSeconds = 1L)
        .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val want = (for {
        ((pk, pus), pi) <- pts.zipWithIndex
        ((ik, s, w), ii) <- ivs.zipWithIndex
        if pk == ik && pus >= s && pus < s + w
      } yield (pi.toLong, ii.toLong)).toSet
      (got == want) :| s"got ${got.size} pairs, want ${want.size}"
    }

  private val genAsof = for {
    nl <- Gen.choose(1, 30)
    nr <- Gen.choose(0, 20)
    ls <- Gen.listOfN(nl, Gen.zip(Gen.choose(0L, 2L), Gen.choose(0L, 1000L)))
    rs <- Gen.listOfN(nr, Gen.zip(Gen.choose(0L, 2L), Gen.choose(0L, 1000L)))
  } yield (ls, rs.distinct) // distinct (key, rt): keeps the model unambiguous

  property("as-of join == brute-force latest-at-or-before") =
    Prop.forAll(genAsof) { case (ls, rs) =>
      import spark.implicits._
      import org.apache.spark.sql.functions.col
      val l = ls.zipWithIndex.map { case ((k, t), i) => (i.toLong, k, t) }
        .toDF("lid", "k", "ts")
        .withColumn("t", col("ts").cast("timestamp")).drop("ts")
      val r = rs.map { case (k, rt) => (k, rt, s"v${k}_$rt") }
        .toDF("k", "rts", "v")
        .withColumn("rt", col("rts").cast("timestamp")).drop("rts")
      val got = graft.operators.AsOfJoin
        .asofJoin(l, r, "k", "k", "t", "rt", Seq("v"), joinType = "left")
        .select("lid", "asof_v").collect()
        .map(x => x.getLong(0) -> Option(x.getString(1))).toMap
      val want = ls.zipWithIndex.map { case ((k, t), i) =>
        val best = rs.filter(e => e._1 == k && e._2 <= t).sortBy(_._2).lastOption
        i.toLong -> best.map(e => s"v${e._1}_${e._2}")
      }.toMap
      (got == want) :| s"mismatch: got $got want $want"
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

  // chunk packing invariants for arbitrary token-count sequences: offsets
  // are the exact exclusive prefix sums in id order (under the DISTRIBUTED
  // scan), spans tile the token stream, and chunk ids never go backwards
  property("chunk spans tile the packed token stream for arbitrary corpora") =
    Prop.forAll(Gen.choose(1, 200), Gen.choose(1, 64)) { (n: Int, ctx: Int) =>
      import spark.implicits._
      val rnd = new scala.util.Random(n * 31 + ctx)
      val toks = (0 until n).map(i => (i.toLong, 1L + rnd.nextInt(3 * ctx)))
      val out = graft.operators.Packing.chunkSpans(
          toks.toDF("doc_id", "toks").repartition(5), ctx,
          orderCol = col("doc_id"), tokensCol = col("toks"), buckets = 4)
        .select("doc_id", "offset", "first_chunk", "last_chunk", "n_chunks")
        .collect().sortBy(_.getLong(0))
      val offsets = toks.scanLeft(0L)(_ + _._2).dropRight(1)
      val offsetsOk = out.map(_.getLong(1)).toSeq == offsets
      val spansOk = out.zip(toks).forall { case (r, (_, t)) =>
        val (off, first, last, nc) = (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
        first == off / ctx && last == (off + t - 1) / ctx && nc == last - first + 1
      }
      val total = toks.map(_._2).sum
      val lastChunkOk = out.last.getLong(3) == (total - 1) / ctx
      (offsetsOk :| "offsets are exact exclusive prefix sums") &&
        (spansOk :| "per-doc spans derive from offset and length") &&
        (lastChunkOk :| "final doc ends in the last chunk of the stream")
    }

  // WinnowFingerprints (the O(n) rolling-hash + deque form) against a
  // naive O(n·w·k) reimplementation built from its own single-gram hash:
  // pins the Karp–Rabin roll (h(j) from h(j−1)) and the monotonic deque
  // against direct hashing + per-window scan, over small alphabets where
  // repeats and ties are dense. No Spark involved — pure JVM.
  private val genSmallText = for {
    n <- Gen.choose(0, 120)
    cs <- Gen.listOfN(n, Gen.oneOf('a', 'b', 'c'))
  } yield cs.mkString

  property("winnow fingerprints == naive window-min over direct gram hashes") =
    Prop.forAll(genSmallText, Gen.choose(1, 6), Gen.choose(1, 9)) {
      (s: String, k: Int, w: Int) =>
        import graft.functions.WinnowFingerprints.fingerprints
        val n = s.length
        val nG = math.max(n - k + 1, 1)
        // hash of gram i via the expression itself with a 1-gram window
        val gh = (0 until nG).map(i =>
          fingerprints(s.substring(i, math.min(i + k, n)), k, 1)(0))
        val nW = math.max(nG - w + 1, 1)
        val expect = (0 until nW).map(j => gh.slice(j, math.min(j + w, nG)).min).distinct
        fingerprints(s, k, w).toSeq == expect
    }

  // the md5 (oracle-mirrored) winnow variant against its own naive
  // replay: grams hashed directly (md5 hex prefix), per-window min by
  // string compare, first-seen distinct — pins the deque + code-point
  // bookkeeping against the trivially-correct form
  property("md5 winnow == naive window-min over direct md5 gram hashes") =
    Prop.forAll(genSmallText, Gen.choose(1, 6), Gen.choose(1, 9)) {
      (s: String, k: Int, w: Int) =>
        import graft.functions.Md5WinnowFingerprints.fingerprints
        def md5hex8(g: String): String = java.security.MessageDigest.getInstance("MD5")
          .digest(g.getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString
        val n = s.length
        val nG = math.max(n - k + 1, 1)
        val gh = (0 until nG).map(i => md5hex8(s.substring(i, math.min(i + k, n))))
        val nW = math.max(nG - w + 1, 1)
        val expect = (0 until nW).map(j => gh.slice(j, math.min(j + w, nG)).min).distinct
        fingerprints(s, k, w).toSeq == expect
    }

  // the winnowing GUARANTEE q119 rests on: two strings sharing a run of
  // w+k−1 characters share at least one fingerprint, wherever the run
  // sits in either string
  property("winnow guarantee: a shared w+k-1 run always shares a fingerprint") =
    Prop.forAll(genSmallText, genSmallText, Gen.choose(1, 6), Gen.choose(1, 9)) {
      (pre: String, suf: String, k: Int, w: Int) =>
        import graft.functions.WinnowFingerprints.fingerprints
        val rnd = new scala.util.Random(pre.length * 31 + suf.length * 7 + k * 3 + w)
        val shared = Array.fill(w + k - 1)("abc".charAt(rnd.nextInt(3))).mkString
        val a = pre + shared + suf
        val b = suf + shared + pre
        fingerprints(a, k, w).toSet.intersect(fingerprints(b, k, w).toSet).nonEmpty
    }
}
