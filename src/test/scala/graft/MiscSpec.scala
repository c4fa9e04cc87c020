package graft

import graft.multimodal.Multimodal
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MiscSpec extends AnyFunSuite {
  import SparkTestEnv._

  test("approx_count_distinct within its declared 2% rsd of exact") {
    val exact = SparkEntry.queries("q39_count_distinct")(spark, sf)
      .select("l_returnflag", "n_parts").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val approx = SparkEntry.queries("q40_approx_distinct")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    approx.foreach { case (k, a) =>
      val e = exact(k)
      assert(math.abs(a - e).toDouble / e < 0.1, s"$k: approx $a vs exact $e")
    }
  }

  test("approx percentile within sketch error of exact") {
    val approx = SparkEntry.queries("q40_approx_distinct")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    val exact = SparkEntry.queries("q44_percentiles")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    approx.foreach { case (k, a) =>
      assert(math.abs(a - exact(k)) / exact(k) < 0.02, s"$k: approx p50 $a vs ${exact(k)}")
    }
  }

  test("multimodal decode roundtrips the synthesized corpus") {
    implicit val sp: SparkSession = spark
    val docs = Tables.load(spark, sf, "documents")
    val decoded = Multimodal.decode(Multimodal.synthesize(docs)).cache()
    assert(decoded.count() == docs.count())
    // formats partition the corpus by doc_id % 3
    val byFmt = decoded.groupBy("format").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byFmt.keySet == Set("img", "audio", "video"))
    // PNG: real javax.imageio decode recovers the encoded dimensions
    val png = decoded.filter(col("format") === "img")
      .select("doc_id", "width", "height", "n_frames").collect()
    assert(png.nonEmpty)
    png.foreach { r =>
      val id = r.getLong(0)
      assert(r.getInt(1) == (8 + id * 31 % 64).toInt, s"png width for doc $id")
      assert(r.getInt(2) == (8 + id * 17 % 64).toInt, s"png height for doc $id")
      assert(r.getInt(3) == 1)
    }
    // WAV: RIFF parse recovers the encoded PCM sample count
    val wav = decoded.filter(col("format") === "audio")
      .select("doc_id", "n_frames").collect()
    assert(wav.nonEmpty)
    wav.foreach { r =>
      assert(r.getInt(1) == (800 + r.getLong(0) * 13 % 1600).toInt,
        s"wav frames for doc ${r.getLong(0)}")
    }
    // AVI: real container parse recovers the encoded geometry
    val vid = decoded.filter(col("format") === "video")
      .select("doc_id", "width", "height", "n_frames").collect()
    assert(vid.nonEmpty)
    vid.foreach { r =>
      val id = r.getLong(0)
      assert(r.getInt(1) == (16 + id * 31 % 48).toInt, s"video width for doc $id")
      assert(r.getInt(2) == (16 + id * 17 % 48).toInt, s"video height for doc $id")
      assert(r.getInt(3) == (1 + id % 24).toInt, s"video frames for doc $id")
    }
  }

  test("MJPEG-in-AVI roundtrip: idx1-indexed frames decode to the encoded colors") {
    import graft.multimodal.Avi
    val (id, w, h, n) = (101L, 33, 21, 13)
    val bytes = Avi.encode(id, w, h, n)
    assert(Avi.isAvi(bytes))
    assert(Avi.meta(bytes) == Avi.Meta(w, h, n))
    val idx = Avi.frameIndex(bytes)
    assert(idx.length == n)
    idx.zipWithIndex.foreach { case (ref, i) =>
      val img = Avi.readFrame(bytes, ref)
      assert(img.getWidth == w && img.getHeight == h)
      // JPEG is lossy but a solid fill survives within a small tolerance
      val want = Avi.frameColor(id, i)
      val got = img.getRGB(w / 2, h / 2) & 0xFFFFFF
      def ch(c: Int, s: Int) = (c >> s) & 0xFF
      Seq(16, 8, 0).foreach { s =>
        assert(math.abs(ch(got, s) - ch(want, s)) <= 24,
          s"frame $i channel>>$s: got ${ch(got, s)}, want ${ch(want, s)}")
      }
    }
    // frame sampling over the synthesized corpus: one row per sampled
    // frame, hashes deterministic across two runs (decode is stable)
    implicit val sp: SparkSession = spark
    val media = Multimodal.synthesize(
      Tables.load(spark, sf, "documents").limit(60))
    val s1 = Multimodal.frameSample(media).collect().map(f => (f.doc_id, f.frame_idx, f.frame_hash)).toSet
    val s2 = Multimodal.frameSample(media).collect().map(f => (f.doc_id, f.frame_idx, f.frame_hash)).toSet
    assert(s1.nonEmpty && s1 == s2)
  }

  test("winnowing guarantee: docs sharing a w+k-1 char run share a fingerprint") {
    import spark.implicits._
    import graft.functions.TextFunctions.{kgramHashes, winnow}
    val (k, w) = (8, 4)
    val shared = "the quick brown fox jumps over" // 30 chars >= w+k-1 = 11
    val docs = Seq(
      (1L, s"AAAA $shared BBBB interpolated junk text one"),
      (2L, s"completely different prefix $shared different suffix"),
      (3L, "no overlap with the others at all, entirely distinct content"))
      .toDF("doc_id", "text")
    val fps = docs.withColumn("kg", kgramHashes("text", k))
      .select(col("doc_id"), explode(winnow("kg", w)).as("fp"))
    val byDoc = fps.collect().groupBy(_.getLong(0)).view
      .mapValues(_.map(_.getString(1)).toSet).toMap
    assert((byDoc(1L) intersect byDoc(2L)).nonEmpty,
      "docs sharing a 30-char run must share a winnowed fingerprint")
    assert((byDoc(1L) intersect byDoc(3L)).isEmpty,
      "unrelated docs should not collide on 8-char gram fingerprints here")
    // the engine-only xxhash64 fast path upholds the same guarantee (the
    // selection differs — different hash order — but any shared w+k-1 run
    // still yields a shared fingerprint, and density stays ~2/(w+1))
    import graft.functions.TextFunctions.kgramHashesFast
    val fast = docs.withColumn("kg", kgramHashesFast("text", k))
      .select(col("doc_id"), explode(winnow("kg", w)).as("fp"))
    val fastByDoc = fast.collect().groupBy(_.getLong(0)).view
      .mapValues(_.map(_.getLong(1)).toSet).toMap
    assert((fastByDoc(1L) intersect fastByDoc(2L)).nonEmpty)
    assert((fastByDoc(1L) intersect fastByDoc(3L)).isEmpty)
    val docsBig = Tables.load(spark, sf, "documents")
    val md5N = docsBig.withColumn("kg", kgramHashes("text", k))
      .select(explode(winnow("kg", w))).count()
    val fastN = docsBig.withColumn("kg", kgramHashesFast("text", k))
      .select(explode(winnow("kg", w))).count()
    // same expected density 2/(w+1): totals within 5% of each other
    assert(math.abs(md5N - fastN).toDouble / md5N < 0.05, s"density drift: $md5N vs $fastN")
  }

  test("corpus mix: running-sum budget and quota prefixes match a driver model") {
    import spark.implicits._
    import graft.operators.CorpusMix
    val df = Seq(
      ("a", 1L, 3L), ("a", 2L, 4L), ("a", 3L, 5L), // cum 3,7,12 → keep 1,2 at budget 8
      ("b", 1L, 10L), ("b", 2L, 1L),               // first row over budget → keep none
      ("c", 1L, 8L)                                 // exactly at budget → kept
    ).toDF("g", "ord", "w")
    val kept = CorpusMix.takeUntilBudget(df, Seq(col("g")), col("ord"), col("w"), 8L)
      .select("g", "ord").collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(kept == Set(("a", 1L), ("a", 2L), ("c", 1L)))
    val quota = CorpusMix.takeQuota(df, Seq(col("g")), col("ord"), 1L)
      .select("g", "ord").collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(quota == Set(("a", 1L), ("b", 1L), ("c", 1L)))
  }

  test("multimodal features come from DECODED content: fixed dim, real invariants") {
    implicit val sp: SparkSession = spark
    val feats = Multimodal.features(
      Multimodal.synthesize(Tables.load(spark, sf, "documents")), dim = 16)
    assert(feats.filter(size(col("embedding")) =!= 16).count() == 0)
    assert(feats.count() == 500)
    // image (doc_id%3==0) and video (%3==2) features are L1-normalized
    // LUMINANCE histograms of real decoded pixels: bins sum to 1
    val sums = feats.filter(col("doc_id") % 3 =!= 1)
      .select(aggregate(col("embedding"), lit(0.0f), (a, x) => a + x))
      .collect().map(_.getFloat(0))
    assert(sums.nonEmpty && sums.forall(s => math.abs(s - 1.0) < 1e-3),
      s"histograms must sum to 1, got ${sums.take(3).mkString(",")}")
    // audio features are an RMS envelope of the PCM samples: in [0, 1],
    // and a real signal is not silent
    val audio = feats.filter(col("doc_id") % 3 === 1)
      .select(col("embedding")).collect().map(_.getSeq[Float](0))
    assert(audio.nonEmpty && audio.forall(v => v.forall(x => x >= 0f && x <= 1f)))
    assert(audio.forall(_.exists(_ > 0f)), "PCM RMS of a synthesized tone must be non-zero")
    // determinism: re-extracting yields identical vectors
    val again = Multimodal.features(
      Multimodal.synthesize(Tables.load(spark, sf, "documents")), dim = 16)
    assert(feats.exceptAll(again).count() == 0)
  }

  test("PII redaction: typed masks, ordering, and counts on hand-built cases") {
    import spark.implicits._
    import graft.functions.TextFunctions.{piiCount, redactPii}
    val cases = Seq(
      ("mail bob.smith+x@corp.example.org now", "mail [EMAIL] now", 1L),
      ("host 192.168.0.1 and 10.0.3.250 up", "host [IP] and [IP] up", 2L),
      ("call +4915123456789 today", "call [PHONE] today", 1L),
      // an IP-shaped domain has no alphabetic TLD → not an email; the IP
      // inside still redacts (local part is not PII by itself)
      ("root@10.0.3.1 logged in", "root@[IP] logged in", 1L),
      // non-international digits are NOT a phone; short runs untouched
      ("order 123456789 qty 42", "order 123456789 qty 42", 0L),
      ("a@b.co +1234567 1.2.3.4", "[EMAIL] [PHONE] [IP]", 3L))
      .toDF("t", "want", "n")
    val got = cases.select(redactPii(col("t")).as("got"), col("want"),
      piiCount(col("t")).as("cnt"), col("n")).collect()
    got.foreach { r =>
      assert(r.getString(0) == r.getString(1), s"redaction mismatch: ${r.getString(0)}")
      assert(r.getLong(2) == r.getLong(3), s"count mismatch for ${r.getString(1)}")
    }
  }

  test("vocabulary tie order and unigram surprisal match hand math") {
    import spark.implicits._
    import graft.operators.Vocabulary
    val docs = Seq((1L, "b a a"), (2L, "c b a")).toDF("doc_id", "text")
    // counts: a=3, b=2, c=1 → ids by (cnt desc, tok asc)
    val v = Vocabulary.build(docs).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(v == Seq((1L, "a", 3L), (2L, "b", 2L), (3L, "c", 1L)))
    // vocab larger than `size` truncates deterministically
    assert(Vocabulary.build(docs, size = 2).collect().map(_.getString(1)).toSeq
      == Seq("a", "b"))
    val sup = Vocabulary.surprisal(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val exp2 = r6((-math.log(1.0 / 6) - math.log(2.0 / 6) - math.log(3.0 / 6)) / 3)
    assert(sup(2L) == ((3L, exp2)))
    val exp1 = r6((-math.log(2.0 / 6) - 2 * math.log(3.0 / 6)) / 3)
    assert(sup(1L) == ((3L, exp1)))
  }

  test("repetition profile matches hand-computed values") {
    import spark.implicits._
    import graft.operators.Repetition
    val docs = Seq(
      (1L, "a b c d"),  // all distinct; 3 distinct bigrams → top 1/3
      (2L, "x x x x"),  // dup 3/4; bigram "x x" ×3 of 3 → top 1.0
      (3L, "one"),      // too short for bigrams → 0.0
      (4L, "p q p q p") // 5 words 2 distinct → dup 0.6; "p q"×2 of 4 → 0.5
    ).toDF("doc_id", "text")
    val got = Repetition.profile(docs).collect()
      .map(r => r.getLong(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    assert(got(1L) == ((0.0, 1.0 / 3)))
    assert(got(2L) == ((0.75, 1.0)))
    assert(got(3L) == ((0.0, 0.0)))
    assert(got(4L) == ((1 - 2.0 / 5, 0.5)))
    // trigram path: "a b a b a b" → trigrams "a b a"×2, "b a b"×2 → top 0.5
    val tri = Repetition.profile(Seq((9L, "a b a b a b")).toDF("doc_id", "text"), n = 3)
      .head()
    assert(tri.getDouble(2) == 0.5)
  }

  test("media feature artifact: equals direct computation, reused, rebuilt on change") {
    import graft.multimodal.MediaFeatures
    implicit val sp: SparkSession = spark
    val base = java.nio.file.Files.createTempDirectory("graft-media-art").toString
    val scratch = s"$base/feat"
    val docs = Tables.load(spark, sf, "documents").limit(60)
    val media = Multimodal.synthesize(docs)
    val direct = Multimodal.features(media, dim = 16)
    val art = MediaFeatures.features(spark, media, scratch, dim = 16)
    assert(art.exceptAll(direct).count() == 0 && direct.exceptAll(art).count() == 0)
    // second call reads the artifact: the part file survives untouched
    val part = new java.io.File(s"$scratch/features").listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    assert(!MediaFeatures.materialize(spark, media, scratch, dim = 16))
    assert(part.exists())
    // content change (one more doc) → fingerprint mismatch → rebuild
    val media2 = Multimodal.synthesize(Tables.load(spark, sf, "documents").limit(61))
    assert(MediaFeatures.materialize(spark, media2, scratch, dim = 16))
    assert(spark.read.parquet(s"$scratch/features").count() == 61)
    // explicit version: same id reuses, new id rebuilds
    val vScratch = s"$base/feat-v"
    assert(MediaFeatures.materialize(spark, media, vScratch, dim = 16, version = Some("v1")))
    assert(!MediaFeatures.materialize(spark, media2, vScratch, dim = 16, version = Some("v1")))
    assert(MediaFeatures.materialize(spark, media2, vScratch, dim = 16, version = Some("v2")))
  }

  test("hash sampling: partition-stable, rate-accurate, splits disjoint+exhaustive") {
    import graft.operators.Sampling
    val docs = Tables.load(spark, sf, "documents")
    val n = docs.count()
    def kept(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_id").collect().map(_.getLong(0)).toSet
    // the kept set is a pure function of the key: repartitioning (the
    // thing that breaks df.sample determinism) must not change it
    val s1 = kept(Sampling.sample(docs, col("doc_id"), 0.3))
    val s2 = kept(Sampling.sample(docs.repartition(7), col("doc_id"), 0.3))
    assert(s1 == s2 && s1.nonEmpty)
    // rate accuracy: md5 is uniform; 3σ tolerance at the fixture size
    val tol = 3 * math.sqrt(0.3 * 0.7 / n)
    assert(math.abs(s1.size.toDouble / n - 0.3) < tol,
      s"rate ${s1.size.toDouble / n} vs 0.3 ± $tol")
    // fraction edges: 0 keeps nothing, 1 keeps everything
    assert(Sampling.sample(docs, col("doc_id"), 0.0).isEmpty)
    assert(Sampling.sample(docs, col("doc_id"), 1.0).count() == n)
    // splits: every row gets exactly one label, weights land near 80/10/10
    val split = Sampling.assignSplit(docs, col("doc_id"),
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    val counts = split.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.values.sum == n && counts.keySet == Set("train", "val", "test"))
    assert(math.abs(counts("train").toDouble / n - 0.8) < 3 * math.sqrt(0.8 * 0.2 / n))
    // sampling and splitting are independently salted: the kept 30% split
    // ~80/10/10 too (a shared hash would put every kept row in one split)
    val sub = Sampling.assignSplit(Sampling.sample(docs, col("doc_id"), 0.3),
      col("doc_id"), Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .groupBy("split").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val frac = sub("train").toDouble / sub.values.sum
    assert(math.abs(frac - 0.8) < 3 * math.sqrt(0.8 * 0.2 / sub.values.sum),
      s"subsampled train fraction: $frac")
    // NULL keys: never sampled (no hash, no admission) and a NULL split —
    // not a silent member of the last split
    import spark.implicits._
    val withNull = Seq(Some(1L), Some(2L), None).toDF("doc_id")
    assert(Sampling.sample(withNull, col("doc_id"), 1.0).count() == 2)
    val nullSplit = Sampling.assignSplit(withNull, col("doc_id"),
      Seq("train" -> 0.5, "test" -> 0.5)).collect()
      .map(r => Option(r.get(0)).map(_.toString) -> r.getString(1)).toMap
    assert(nullSplit(None) == null && nullSplit(Some("1")) != null)
    // stratified rates really differ per stratum
    val strat = Sampling.stratifiedSample(docs, col("lang"), col("doc_id"),
      Map("en" -> 0.5), default = 0.1)
    val byLang = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val keptLang = strat.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val enRate = keptLang("en").toDouble / byLang("en")
    assert(math.abs(enRate - 0.5) < 3 * math.sqrt(0.5 * 0.5 / byLang("en")), s"en rate $enRate")
    val restKept = keptLang.filterNot(_._1 == "en").values.sum.toDouble
    val restAll = byLang.filterNot(_._1 == "en").values.sum.toDouble
    assert(math.abs(restKept / restAll - 0.1) < 3 * math.sqrt(0.1 * 0.9 / restAll),
      s"non-en rate ${restKept / restAll}")
  }

  test("weighted sampling: rate tracks mean prob, monotone in weight, layout-stable") {
    import graft.operators.Sampling
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val n = docs.count().toDouble
    // acceptance rate ≈ E[min(n_chars/4000, 1)] within 3σ of the
    // per-row-independent Bernoulli bound
    val p = col("n_chars") / 4000.0
    val expRate = docs.select(avg(least(p, lit(1.0)))).head.getDouble(0)
    val kept = Sampling.weightedSample(docs, col("doc_id"), p)
    val rate = kept.count() / n
    assert(math.abs(rate - expRate) < 3 * math.sqrt(expRate * (1 - expRate) / n),
      s"weighted rate $rate vs expected $expRate")
    // degenerate probs: 0 keeps nothing, ≥1 keeps everything
    assert(Sampling.weightedSample(docs, col("doc_id"), lit(0.0)).count() == 0)
    assert(Sampling.weightedSample(docs, col("doc_id"), lit(1.0)).count() == n)
    // monotone per row: the same key's uniform draw is fixed, so doubling
    // every prob can only ADD rows (kept(p) ⊆ kept(2p))
    val keptIds = kept.select("doc_id").collect().map(_.getLong(0)).toSet
    val kept2 = Sampling.weightedSample(docs, col("doc_id"), p * 2)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(keptIds.subsetOf(kept2), "weighted admission not monotone in prob")
    // decision is a pure function of the key — repartitioning the input
    // must not change the kept set (the df.sample failure mode)
    val keptRepart = Sampling.weightedSample(docs.repartition(7), col("doc_id"), p)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(keptRepart == keptIds, "weighted sample changed under repartition")
  }

  test("sketch re-aggregation and set algebra track exact distinct counts") {
    val events = spark.read.parquet(s"$sf/events.parquet")
    // q112: per-type union-of-daily-HLL-sketches vs exact countDistinct.
    // HLL at the default lgConfigK=12 has ~1.6% rsd; the fixture's
    // cardinalities are far below 2^12 so the estimate runs in sparse
    // mode — allow 5% to keep the bound scale-independent.
    val est = SparkEntry.queries("q112_sketch_reagg")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getAs[Long]("est_users")).toMap
    val exact = events.groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, e) =>
      assert(math.abs(est(k) - e).toDouble / e <= 0.05, s"$k: est ${est(k)} vs exact $e")
    }
    // q113: theta intersection/difference vs exact set ops over user sets
    val users = (t: String) => events.filter(col("event_type") === t)
      .select("user_id").collect().map(_.getLong(0)).toSet
    val v = users("view"); val b = users("purchase")
    val row = SparkEntry.queries("q113_sketch_set_ops")(spark, sf).head
    val estBoth = row.getAs[Long]("est_view_and_buy").toDouble
    val estOnly = row.getAs[Long]("est_view_only").toDouble
    assert(math.abs(estBoth - (v & b).size) / math.max((v & b).size, 1) <= 0.05,
      s"view∩purchase: est $estBoth vs exact ${(v & b).size}")
    assert(math.abs(estOnly - (v -- b).size) / math.max((v -- b).size, 1) <= 0.05,
      s"view∖purchase: est $estOnly vs exact ${(v -- b).size}")
  }

  test("merged KLL quantiles land within ±5 rank points of exact percentiles") {
    val events = spark.read.parquet(s"$sf/events.parquet")
    val row = SparkEntry.queries("q115_kll_reagg")(spark, sf).head
    // KLL's guarantee is on RANK error (~1.65% at the default k=200), so
    // bracket each merged VALUE between the exact values ±5 rank points
    // away instead of comparing values directly
    Seq(0.5 -> "p50", 0.95 -> "p95", 0.99 -> "p99").foreach { case (q, name) =>
      val got = row.getAs[Double](name)
      val lohi = events.agg(
        expr(s"percentile(value, ${math.max(q - 0.05, 0.0)})"),
        expr(s"percentile(value, ${math.min(q + 0.05, 1.0)})")).head
      val (lo, hi) = (lohi.getDouble(0), lohi.getDouble(1))
      assert(got >= lo && got <= hi, s"$name=$got outside exact-rank bracket [$lo, $hi]")
    }
  }
}
