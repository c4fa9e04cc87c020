package graft

import graft.operators.{Bm25, Decontaminate, LineDedup, Packing}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Hand-computed pins for the curation tier (q77-q80): decontamination,
  * line-level dedup, BM25, and sequence packing. The DuckDB oracle proves
  * engine parity on the fixture; these pin the SEMANTICS on inputs where
  * the right answer is known by hand.
  */
class CurationSpec extends AnyFunSuite {
  import SparkTestEnv._

  private lazy val sqlc = spark
  import sqlc.implicits._

  test("decontaminate: flags the doc sharing an 8-gram with eval, skips short docs") {
    val eval = Seq((100L, "a b c d e f g h")).toDF("doc_id", "text")
    val train = Seq(
      (1L, "prefix a b c d e f g h suffix"), // contains the eval 8-gram
      (2L, "q r s t u v w x y z"), // disjoint
      (3L, "too short")) // < 8 words: no gram evidence
      .toDF("doc_id", "text")
    val out = Decontaminate.overlap(train, eval, n = 8, threshold = 0.05)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getBoolean(4)))).toMap
    assert(out.keySet == Set(1L, 2L))
    // doc 1: 10 words -> 3 distinct 8-grams, 1 overlapping
    assert(out(1L) == ((3L, 1L, true)))
    assert(out(2L) == ((3L, 0L, false)))
  }

  test("decontaminate: grams are distinct per doc and count len-n+1") {
    val d = Seq((1L, "a b a b a b")).toDF("doc_id", "text")
    val g = Decontaminate.grams(d, n = 2).collect().map(_.getString(1)).sorted
    assert(g.toSeq == Seq("a b", "b a")) // 5 positional grams, 2 distinct
  }

  test("line dedup: removes cross-doc lines, keeps within-doc repeats, preserves order") {
    val docs = Seq(
      (1L, "unique one\nshared\nunique two"),
      (2L, "shared\nonly d2"),
      (3L, "shared"),
      (4L, "dup\ndup\nx"))
      .toDF("doc_id", "text")
    val out = LineDedup.clean(docs, minDocs = 2).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(out(1L) == ((3L, 1L, "unique one\nunique two")))
    assert(out(2L) == ((2L, 1L, "only d2")))
    assert(out(3L) == ((1L, 1L, ""))) // all boilerplate -> empty doc survives as row
    // "dup" repeats only WITHIN doc 4: distinct-doc count is 1, so it stays
    assert(out(4L) == ((3L, 0L, "dup\ndup\nx")))
  }

  test("bm25: matches the closed-form score on a two-doc corpus") {
    val docs = Seq((1L, "x x y y"), (2L, "z z")).toDF("doc_id", "text")
    val out = Bm25.topDocs(docs, terms = Seq("x"), topK = 10).collect()
    assert(out.length == 1) // doc 2 matches no term
    val (k1, b) = (1.2, 0.75)
    val n = 2.0; val df = 1.0; val tf = 2.0; val dl = 4.0; val avgdl = 3.0
    val idf = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
    val expected = BigDecimal(idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out.head.getLong(0) == 1L)
    assert(out.head.getDouble(1) == expected)
    assert(out.head.getLong(2) == 1L)
  }

  test("packing: hand-computed chunk spans at ctx=5") {
    val d = Seq((1L, 3L), (2L, 4L), (3L, 2L)).toDF("doc_id", "toks")
    val out = Packing.chunkSpans(d, ctxLen = 5, orderCol = col("doc_id"),
        tokensCol = col("toks"), buckets = 2)
      .select("doc_id", "offset", "first_chunk", "last_chunk", "n_chunks")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(out(1L) == ((0L, 0L, 0L, 1L)))
    assert(out(2L) == ((3L, 0L, 1L, 2L))) // tokens 3..6 straddle the ctx boundary
    assert(out(3L) == ((7L, 1L, 1L, 1L)))
  }

  test("packing: distributed scan equals the single-reducer window on random data") {
    val rnd = new scala.util.Random(7)
    val rows = (0 until 500).map(i => (rnd.nextInt(1000000).toLong * 1000 + i, rnd.nextInt(900).toLong))
    val df = rows.toDF("id", "v").repartition(13)
    val got = Packing.exclusivePrefixSum(df, col("id"), col("v"), buckets = 8)
      .select("id", "offset").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = rows.sortBy(_._1).scanLeft((0L, 0L)) { case ((_, acc), (id, v)) => (id, acc + v) }
      .sliding(2).map { case Seq((_, acc), (id, _)) => id -> acc }.toMap
    assert(got == want)
  }

  test("filter pipeline: each gate fires on its hand-built doc, in cascade order") {
    import graft.operators.FilterPipeline
    val uniques = (1 to 30).map(i => s"w$i")
    val sw = Seq("the", "and", "of", "to", "in", "is", "a")
    val docs = Seq(
      (1L, "tiny doc"), // 2 tokens
      (2L, ("the " * 5001).trim), // gate ORDER: too_long beats repetitive_words
      (3L, (1 to 25).map(i => s"zz$i").mkString(" ")), // no stopwords at all
      (4L, "the " * 15 + "cat " * 15), // en but 30 tokens, 2 distinct
      (5L, "a b " + (1 to 18).map(i => s"x$i").mkString(" ") + " a b a b"), // dominant bigram
      (6L, "the " + (1 to 20).map(i => s"qq$i").mkString(" ")), // sparse signal: low quality
      (7L, uniques.zip(Iterator.continually(sw).flatten.take(30).toSeq)
        .map { case (u, s) => s"$s $u" }.mkString(" "))) // clean English-like
      .toDF("doc_id", "text")
    val out = FilterPipeline.decide(docs).collect()
      .map(r => r.getLong(0) -> r.getString(r.fieldIndex("reason"))).toMap
    assert(out == Map(1L -> "too_short", 2L -> "too_long", 3L -> "no_lang",
      4L -> "repetitive_words", 5L -> "repetitive_ngrams",
      6L -> "low_quality", 7L -> "kept"))
  }

  test("vocab encode: ids in position order, OOV as zero, bounded vocab broadcast") {
    import graft.operators.Vocabulary
    val docs = Seq((1L, "b a b"), (2L, "a z")).toDF("doc_id", "text")
    // counts: a=2, b=2, z=1 -> tie order (cnt desc, tok asc): a=1, b=2, z=3
    val vocab = Vocabulary.build(docs, size = 2) // keeps a, b only
    val out = Vocabulary.encode(docs, vocab).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(4)))).toMap
    assert(out(1L) == ((3L, 0L, "2 1 2")))
    assert(out(2L) == ((2L, 1L, "1 0"))) // z fell outside the vocab
  }

  test("packing: string order key with numeric bucket proxy equals the sorted fold") {
    val rnd = new scala.util.Random(11)
    val rows = (0 until 300).map(i => (i.toLong, rnd.nextInt(500).toLong))
    val df = rows.toDF("id", "v").repartition(7)
      .withColumn("skey", md5(col("id").cast("string")))
    val got = Packing.exclusivePrefixSum(df, col("skey"), col("v"), buckets = 8,
        bucketOn = Some(conv(substring(col("skey"), 1, 8), 16, 10).cast("long")))
      .select("id", "offset").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val md = java.security.MessageDigest.getInstance("MD5")
    def m5(s: String) = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val want = rows.map { case (id, v) => (m5(id.toString), id, v) }.sortBy(_._1)
      .scanLeft(("", 0L, 0L)) { case ((_, _, acc), (k, id, v)) => (k, id, acc + v) }
      .sliding(2).map { case Seq((_, _, acc), (_, id, _)) => id -> acc }.toMap
    assert(got == want)
  }

  test("bigram surprisal: matches hand-computed conditional probabilities") {
    import graft.operators.Vocabulary
    val docs = Seq((1L, "a b a c"), (2L, "a b")).toDF("doc_id", "text")
    // corpus bigrams: (a,b)x2, (b,a)x1, (a,c)x1 ; prefix counts: a=3, b=1
    val out = Vocabulary.bigramSurprisal(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val d1 = (math.log(3.0 / 2) + 0.0 + math.log(3.0)) / 3 // -ln(2/3), -ln(1/1), -ln(1/3)
    assert(out(1L) == ((3L, r6(d1))))
    assert(out(2L) == ((1L, r6(math.log(3.0 / 2)))))
  }

  test("packing: empty input yields empty output, single bucket tolerated") {
    val empty = Seq.empty[(Long, Long)].toDF("id", "v")
    assert(Packing.exclusivePrefixSum(empty, col("id"), col("v")).count() == 0)
    val one = Seq((5L, 9L)).toDF("id", "v")
    val r = Packing.exclusivePrefixSum(one, col("id"), col("v"), buckets = 1).collect()
    assert(r.head.getLong(2) == 0L)
  }

  private def r6(x: Double) =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("dsir: matches hand-computed smoothed log ratios on disjoint grams") {
    import graft.operators.Dsir
    // one bigram per doc; buckets must differ for the hand math to hold
    val md = java.security.MessageDigest.getInstance("MD5")
    def bucket(g: String) =
      md.digest(g.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(3)
    assert(bucket("a b") != bucket("c d"))
    val raw = Seq((1L, "a b"), (2L, "c d")).toDF("doc_id", "text")
    val target = Seq((10L, "a b")).toDF("doc_id", "text")
    val out = Dsir.importanceWeights(raw, target).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    // cr(ab)=1 cr(cd)=1 nr=2; ct(ab)=1 nt=1; B=4096
    val lrAb = math.log(2.0 / 4097) - math.log(2.0 / 4098)
    val lrCd = math.log(1.0 / 4097) - math.log(2.0 / 4098)
    assert(out(1L) == ((1L, r6(lrAb))))
    assert(out(2L) == ((1L, r6(lrCd))))
    // the target-matching doc scores strictly higher
    assert(out(1L)._2 > out(2L)._2)
  }

  test("dsir: target == raw makes every weight exactly zero") {
    import graft.operators.Dsir
    val docs = Seq((1L, "a b c"), (2L, "x y"), (3L, "a b")).toDF("doc_id", "text")
    val out = Dsir.importanceWeights(docs, docs).collect()
    assert(out.nonEmpty && out.forall(_.getDouble(2) == 0.0))
  }

  test("gopher: each gate fires in order on a hand-built doc") {
    import graft.operators.Gopher
    val docs = Seq(
      (1L, "the wonderful engine compiles quickly and that people have fun with spark today"),
      (2L, "aa bb cc"), // mean word len 2 -> word_len
      (3L, "12345 67890 11111 22222 33333"), // no letters -> non_alpha
      (4L, "the tags ## and markers have with that stuff here"), // 2 '#'/10 words
      (5L, "-firstly the wonderful items appear\n-secondly and others have arrived\n-thirdly with that excellent outcome"),
      (6L, "the first line continues onward with many interesting words tonight...\nand the second line also carries plenty of thoughtful content forward"),
      (7L, "giraffe elephant zebra rhino hippo monkey")) // no stopwords
      .toDF("doc_id", "text")
    val out = Gopher.decide(docs).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getAs[String]("reason") == "kept" && out(1L).getAs[Boolean]("kept"))
    assert(out(1L).getAs[Long]("n_words") == 13L)
    assert(out(1L).getAs[Double]("mean_word_len") == r6(67.0 / 13))
    assert(out(1L).getAs[Long]("stopword_hits") == 5L) // the and that have with
    assert(out(2L).getAs[String]("reason") == "word_len")
    assert(out(3L).getAs[String]("reason") == "non_alpha")
    assert(out(4L).getAs[String]("reason") == "symbols")
    assert(out(4L).getAs[Double]("symbol_word_ratio") == 0.2)
    assert(out(5L).getAs[String]("reason") == "bullets")
    assert(out(5L).getAs[Double]("bullet_line_frac") == 1.0)
    assert(out(6L).getAs[String]("reason") == "ellipses")
    assert(out(6L).getAs[Double]("ellipsis_line_frac") == 0.5)
    assert(out(7L).getAs[String]("reason") == "few_stopwords")
    assert(!out(7L).getAs[Boolean]("kept"))
  }

  test("gopher: '...' canonicalizes to one ellipsis and unicode '…' counts too") {
    import graft.operators.Gopher
    val docs = Seq((1L, "a... b… c")).toDF("doc_id", "text")
    val s = Gopher.signals(docs).collect().head
    // 2 ellipses over 3 words
    assert(s.getAs[Double]("symbol_word_ratio") == r6(2.0 / 3))
  }

  test("bpe: hand-computed merges on the Sennrich-style corpus, ties by pair order") {
    import graft.operators.Bpe
    val text = (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")).mkString(" ")
    val docs = Seq((1L, text)).toDF("doc_id", "text")
    val merges = Bpe.train(docs, numMerges = 5)
    // round 1: (e,s) and (s,t) both weigh 9 -> pair-ascending tie-break
    assert(merges.map(m => (m.left, m.right, m.count)) == Seq(
      ("e", "s", 9L), ("es", "t", 9L), ("l", "o", 7L), ("lo", "w", 7L), ("e", "w", 6L)))
    // application: a word unseen in training segments under the merges
    assert(Bpe.applyMerges("lowest", merges) == Seq("low", "est"))
    assert(Bpe.applyMerges("newest", merges) == Seq("n", "ew", "est"))
    // the DataFrame surface carries rank and the merged symbol
    val df = Bpe.trainDf(spark, docs, numMerges = 2).collect()
    assert(df.map(r => (r.getLong(0), r.getString(3))).toSeq == Seq((1L, "es"), (2L, "est")))
  }

  test("bpe: merge loop stops when no pairs remain; histogram cap binds") {
    import graft.operators.Bpe
    val docs = Seq((1L, "a b c a b a")).toDF("doc_id", "text")
    // single-char words only -> zero mergeable pairs
    assert(Bpe.train(docs, numMerges = 10).isEmpty)
    val hist = Bpe.wordHistogram(docs, maxWords = 2).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(hist == Seq(("a", 3L), ("b", 2L))) // count desc, word asc
    // empty corpus trains an empty merge table, not a crash
    val none = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(Bpe.train(none, numMerges = 3).isEmpty)
  }

  test("dsir and gopher survive empty corpora") {
    val none = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(graft.operators.Dsir.importanceWeights(none, none).count() == 0)
    assert(graft.operators.Gopher.decide(none).count() == 0)
  }

  test("shards: exact sizes, disjoint sorted ranges on disk, empty no-op") {
    import graft.operators.Shards
    val docs = Tables.load(spark, SparkTestEnv.sf, "documents").select("doc_id", "text")
    val total = docs.count()
    val dir = java.nio.file.Files.createTempDirectory("graft-shards").toString + "/out"
    val n = Shards.write(docs, dir, col("doc_id"), shardSize = 150)
    assert(n == (total + 149) / 150)
    // partition-type inference is off engine-wide (the par_sub=00 fix), so
    // the shard directory value reads back as string
    val back = spark.read.parquet(dir).withColumn("shard", col("shard").cast("long"))
    assert(back.count() == total)
    assert(back.select("doc_id").except(docs.select("doc_id")).count() == 0)
    // exact sizes: every shard full except the last; key ranges disjoint
    val m = back.groupBy("shard")
      .agg(count(lit(1)).as("n"), min("doc_id").as("lo"), max("doc_id").as("hi"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    assert(m.map(_._1).toSeq == (0L until n))
    assert(m.init.forall(_._2 == 150L) && m.last._2 == total - 150 * (n - 1))
    m.sliding(2).foreach { case Array(a, b) => assert(a._4 < b._3); case _ => }
    // rows are sorted WITHIN each physical file
    val files = back.select(col("_metadata.file_path")).distinct()
      .collect().map(_.getString(0))
    files.foreach { f =>
      val ids = spark.read.parquet(f).select("doc_id").collect().map(_.getLong(0))
      assert(ids.sameElements(ids.sorted), s"unsorted shard file $f")
    }
    // empty input: zero shards, nothing written
    val none = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(Shards.write(none, dir + "-none", col("doc_id"), 10) == 0)
  }

  test("jsonl shards: lossless roundtrip, line framing survives embedded newlines") {
    import graft.operators.Shards
    val docs = Tables.load(spark, SparkTestEnv.sf, "documents")
      .select("doc_id", "text", "lang")
      // force the failure mode the escaping exists for
      .withColumn("text", concat(col("text"), lit("\nline2\t\"quoted\"")))
    val total = docs.count()
    val dir = java.nio.file.Files.createTempDirectory("graft-jsonl").toString + "/out"
    val n = Shards.writeJsonl(docs, dir, col("doc_id"), shardSize = 150)
    assert(n == (total + 149) / 150)
    // every line parses back; content is byte-identical after the roundtrip
    val back = spark.read.schema("doc_id LONG, text STRING, lang STRING").json(dir)
    assert(back.count() == total, "a raw newline broke JSONL line framing")
    assert(back.select("doc_id", "text", "lang")
      .except(docs.select("doc_id", "text", "lang")).count() == 0)
    assert(docs.select("doc_id", "text", "lang")
      .except(back.select("doc_id", "text", "lang")).count() == 0)
    // shard dirs exist with exact sizes (same rank sharding as write)
    val sizes = spark.read.text(dir).count()
    assert(sizes == total)
    // NULL cells must appear as explicit JSON nulls, not dropped keys —
    // key-presence-sensitive consumers would otherwise see a ragged schema
    val withNull = docs.limit(3).withColumn("lang", lit(null).cast("string"))
    val nullDir = java.nio.file.Files.createTempDirectory("graft-jsonl-null").toString + "/out"
    Shards.writeJsonl(withNull, nullDir, col("doc_id"), shardSize = 150)
    val lines = spark.read.text(nullDir).collect().map(_.getString(0))
    assert(lines.nonEmpty && lines.forall(_.contains("\"lang\":null")),
      s"null field dropped from JSONL object: ${lines.headOption.getOrElse("")}")
  }

  test("chunker: window starts, tail non-redundancy, boundary sizes") {
    import spark.implicits._
    import graft.operators.Chunker
    def words(n: Int) = (1 to n).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      1L -> words(4),   // == size: exactly one chunk
      2L -> words(5),   // size+1: two chunks, second is the 3-token tail
      3L -> words(10),  // starts 1,4,7: last window [7..10]
      4L -> "",         // no tokens: absent
      5L -> "  ",       // whitespace-only: absent
      6L -> null.asInstanceOf[String]).toDF("doc_id", "text")
    val got = Chunker.slidingChunks(docs, size = 4, stride = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .sortBy(t => (t._1, t._2))
    val expect = Seq(
      (1L, 0L, 4L, "w1 w2 w3 w4"),
      (2L, 0L, 4L, "w1 w2 w3 w4"), (2L, 1L, 2L, "w4 w5"),
      (3L, 0L, 4L, "w1 w2 w3 w4"), (3L, 1L, 4L, "w4 w5 w6 w7"),
      (3L, 2L, 4L, "w7 w8 w9 w10"))
    assert(got.toSeq == expect, s"got ${got.toSeq}")
  }

  test("native md5 winnow is bit-identical to the HOF composition over the corpus") {
    import graft.functions.{Md5WinnowFingerprints, TextFunctions}
    val docs = Tables.load(spark, SparkTestEnv.sf, "documents")
      .withColumn("t", coalesce(col("text"), lit("")))
    val hof = docs
      .withColumn("kg", TextFunctions.kgramHashes("t", k = 8))
      .select(col("doc_id"), TextFunctions.winnow("kg", w = 4).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    val nat = docs
      .select(col("doc_id"), Md5WinnowFingerprints.of(col("t"), 8, 4).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(nat == hof, "native md5 winnow diverged from the HOF form")
  }

  test("quality model: linear hashed-BoW scoring, OOV default, empty docs absent") {
    import spark.implicits._
    import graft.operators.QualityModel
    def bkt(w: String): String = java.security.MessageDigest.getInstance("MD5")
      .digest(w.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(3)
    assume(bkt("aa") != bkt("bb"), "3-hex bucket collision in fixture words")
    val docs = Seq((1L, "aa bb aa"), (2L, "zz"), (3L, "   "),
      (4L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val wts = Seq((bkt("aa"), 1.0), (bkt("bb"), -0.5)).toDF("bucket", "weight")
    val got = QualityModel.score(docs, wts, defaultWeight = -1.0)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    // doc 1: (1.0 - 0.5 + 1.0) / 3; doc 2: pure OOV -> default; 3/4 absent
    assert(got == Map(1L -> ((3L, 0.5)), 2L -> ((1L, -1.0))), s"got $got")
  }

  test("source-overlap sketch matrix tracks exact gram-set Jaccard per pair") {
    import graft.operators.Decontaminate
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    // exact per-source trigram sets (small fixture — driver-side is fine)
    val exact = Decontaminate.grams(docs, 3, idCol = "source")
      .collect().map(r => (r.getString(0), r.getString(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val est = SparkEntry.queries("q114_source_overlap")(spark, sf).collect()
    assert(est.nonEmpty)
    val sources = exact.keySet.toSeq.sorted
    assert(est.length == sources.size * (sources.size - 1) / 2,
      s"expected all unordered pairs, got ${est.length}")
    est.foreach { r =>
      val (a, b) = (r.getString(0), r.getString(1))
      val (sa, sb) = (exact(a), exact(b))
      val exactJ = (sa & sb).size.toDouble / math.max((sa | sb).size, 1)
      val estJ = r.getAs[Double]("est_jaccard")
      // theta sketches stay in exact mode below 4096 retained hashes and
      // ~2.5% rsd above; the fixture sits near the boundary — 0.05
      // absolute headroom on a [0,1] quantity
      assert(math.abs(estJ - exactJ) <= 0.05, s"$a×$b: est $estJ vs exact $exactJ")
    }
  }

  test("RRF fusion: hand-computed scores, one-list-only docs, tie order") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // list A ranks 1,2,3 = docs 10,20,30; list B ranks 1,2 = docs 20,40
    val a = Seq((10L, 1L), (20L, 2L), (30L, 3L)).toDF("doc_id", "rank")
    val b = Seq((20L, 1L), (40L, 2L)).toDF("doc_id", "rank")
    val fused = graft.operators.Retrieval.rrfFuse(Seq(a, b), k = 60, topK = 10)
      .orderBy(col("fused_rank")).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    def rr(r: Long) = 1.0 / (60 + r)
    def round6(x: Double) = math.round(x * 1e6) / 1e6
    // doc 20 appears in both lists and must dominate
    val expect = Seq(
      20L -> round6(rr(2) + rr(1)),
      10L -> round6(rr(1)),
      40L -> round6(rr(2)),
      30L -> round6(rr(3)))
    assert(fused.map(x => (x._1, x._2)).toSeq == expect,
      s"got ${fused.toSeq}")
    assert(fused.map(_._3).toSeq == Seq(1L, 2L, 3L, 4L))
    // equal contributions tie-break by ascending id: two docs with the
    // same single-list rank
    val c = Seq((7L, 1L)).toDF("doc_id", "rank")
    val d = Seq((3L, 1L)).toDF("doc_id", "rank")
    val tied = graft.operators.Retrieval.rrfFuse(Seq(c, d), topK = 5)
      .orderBy(col("fused_rank")).collect().map(_.getLong(0)).toSeq
    assert(tied == Seq(3L, 7L))
  }
}
