package graft

import graft.operators.{MinHashDedup, SimHashDedup, Similarity}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Cross-validation of the approximate dedup/similarity operators against
  * their exact counterparts at sf0.001 (deterministic: fixed seeds, fixed
  * fixtures — the assertions pin exact recall values, not flaky bounds).
  */
class DedupSimilaritySpec extends AnyFunSuite {
  import SparkTestEnv._

  lazy val docs = Tables.load(spark, sf, "documents").cache()
  lazy val emb = Tables.load(spark, sf, "embeddings").cache()

  test("minhash-LSH finds every exact shingle-jaccard>=0.5 pair (full recall here)") {
    val got = MinHashDedup.verifiedPairs(docs, "doc_id", "text")
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // exact brute force over shingle sets
    val sh = MinHashDedup.shingles(docs, "doc_id", "text", 3)
    val sz = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val exact = sh.as("a").join(sh.as("b"),
        col("a.shingle") === col("b.shingle") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("inter"))
      .join(sz.as("za"), col("doc_a") === col("za.doc_id"))
      .join(sz.as("zb"), col("doc_b") === col("zb.doc_id"))
      .filter(col("inter").cast("double") / (col("za.n") + col("zb.n") - col("inter")) >= 0.5)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty)
    assert(got == exact, s"LSH missed ${exact -- got}, extra ${got -- exact}")
  }

  test("simhash block-combination banding finds EVERY pair within hamming 6") {
    val banded = SimHashDedup.pairs(docs, "doc_id", "text", maxDist = 6)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // exact all-pairs hamming over the fingerprints — the recall guarantee
    // (d <= 6 leaves >= 2 intact blocks, every block pair is a table) says
    // banded output must EQUAL this, not approximate it
    val s = SimHashDedup.simhash(docs, "doc_id", "text")
    val exact = s.as("a").join(s.as("b"), col("a.doc_id") < col("b.doc_id"))
      .filter(bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))) <= 6)
      .select(col("a.doc_id"), col("b.doc_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty)
    assert(banded == exact, s"missed ${exact -- banded}, extra ${banded -- exact}")
  }

  test("simhash wider-key designs keep the recall guarantee at their d") {
    // r = 8 - maxDist blocks per key: maxDist=5 → C(8,3)=56 tables of
    // 24-bit keys (floor 56·n²/2²⁵ — the 10⁷–10⁸-doc design point),
    // maxDist=3 → C(8,5)=56 tables of 40-bit keys (the web-scale point).
    // Recall at each d is TOTAL: banded output must EQUAL brute force.
    assert(SimHashDedup.blockCombos(3).size == 56)
    assert(SimHashDedup.blockCombos(5).size == 56)
    val s = SimHashDedup.simhash(docs, "doc_id", "text").cache()
    for (d <- Seq(5, 3)) {
      val banded = SimHashDedup.pairsFromFingerprints(s, maxDist = d)
        .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val exact = s.as("a").join(s.as("b"), col("a.doc_id") < col("b.doc_id"))
        .filter(bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))) <= d)
        .select(col("a.doc_id"), col("b.doc_id"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(exact.nonEmpty, s"fixture has no pairs at hamming <= $d")
      assert(banded == exact,
        s"d=$d: missed ${exact -- banded}, extra ${banded -- exact}")
    }
    s.unpersist()
  }

  test("simhash fingerprint artifact: reused, rebuilt on corpus change, radius-independent") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft-simhash-art").toString
    val docsPath = s"$base/docs"
    val scratch = s"$base/scratch"
    Seq((0L, "aaa bbb ccc ddd eee"), (1L, "aaa bbb ccc ddd eee"),
        (2L, "zzz yyy xxx www vvv"))
      .toDF("doc_id", "text").write.parquet(docsPath)
    def pairsVia(maxDist: Int) = SimHashDedup.pairsFromFingerprints(
      SimHashDedup.fingerprints(spark, spark.read.parquet(docsPath), scratch), maxDist)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairsVia(6) == Set((0L, 1L)))
    def versionDirs = new java.io.File(scratch).listFiles()
      .filter(d => d.isDirectory && d.getName.startsWith("simhash-")).sortBy(_.getName)
    val firstDir = versionDirs.head
    val part = firstDir.listFiles().filter(_.getName.endsWith(".parquet")).head
    // artifact equals the inline computation; a sibling session and a
    // DIFFERENT radius both reuse it (the stamp is radius-independent —
    // re-banding 8-byte rows never re-pays the corpus scan)
    assert(pairsVia(5) == Set((0L, 1L)) && part.exists(),
      "radius change must re-band the artifact, not rebuild it")
    val s2 = spark.newSession()
    val viaS2 = SimHashDedup.pairsFromFingerprints(
      SimHashDedup.fingerprints(s2, s2.read.parquet(docsPath), scratch))
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(viaS2 == Set((0L, 1L)) && part.exists())
    // corpus rewritten in place → stamp mismatch → rebuild, not stale reuse
    // — into a FRESH stamp-derived subdir: the old version's files stay
    // untouched, so a DataFrame returned before the rewrite keeps
    // scanning its own bytes (the rebuild re-points, never clobbers)
    Seq((3L, "qqq rrr sss ttt uuu"), (4L, "qqq rrr sss ttt uuu"))
      .toDF("doc_id", "text").write.mode("append").parquet(docsPath)
    assert(pairsVia(6) == Set((0L, 1L), (3L, 4L)))
    assert(versionDirs.length == 2 && part.exists(),
      "a corpus rebuild must land in a new version dir and leave the old files intact")
    // explicit version: same id reuses even over a changed frame, new id rebuilds
    val vScratch = s"$base/vscratch"
    def fpsOf(p: String, v: String) = SimHashDedup.fingerprints(
      spark, spark.read.parquet(p), vScratch, version = Some(v))
      .collect().map(_.getLong(0)).toSet
    val small = s"$base/docs-small"
    Seq((9L, "one two")).toDF("doc_id", "text").write.parquet(small)
    assert(fpsOf(docsPath, "snap-1") == Set(0L, 1L, 2L, 3L, 4L))
    assert(fpsOf(small, "snap-1") == Set(0L, 1L, 2L, 3L, 4L), "same version must reuse")
    assert(fpsOf(small, "snap-2") == Set(9L), "new version must rebuild")
  }

  test("simhash puts near-dup pairs at small hamming distance") {
    val sim = SimHashDedup.pairs(docs, "doc_id", "text")
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val minhash = MinHashDedup.verifiedPairs(docs, "doc_id", "text")
      .filter(col("jac") >= 0.9)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(minhash.nonEmpty)
    // one fixture pair (jac 0.9) sits at hamming 7 — outside the operator's
    // d<=6 radius by design — so pinned recall here is 26/27 ≈ 0.96
    val recall = (minhash & sim).size.toDouble / minhash.size
    assert(recall >= 0.9, s"simhash recall of jac>=0.9 pairs: $recall")
  }

  test("bucketed embedding near-dup matches exact all-pairs, with no cartesian join in the plan") {
    val exact = Similarity.neardupPairs(emb, threshold = 0.46)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val bucketed = Similarity.neardupPairsBucketed(emb, threshold = 0.46)
    val got = bucketed.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty)
    assert(got == exact, s"bucketed missed ${exact -- got}, extra ${got -- exact}")
    // the scale property itself: candidates come from an equi-join on
    // (band, key) — the plan must not contain any all-pairs join node
    val plan = bucketed.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), "plan contains CartesianProduct")
    assert(!plan.contains("BroadcastNestedLoopJoin"), "plan contains BroadcastNestedLoopJoin")
  }

  test("ANN queries emit a self-evidencing recall column at or above the spec floors") {
    // the artifact-level form of the floors pinned operator-by-operator
    // below: each rows-only ANN query carries per-query recall vs the
    // exact top-5, so the emitted rows themselves evidence accuracy
    val floors = Seq(
      "q38_ann_lsh" -> 0.8, "q54_ann_ivf" -> 0.3, "q62_ann_quantized" -> 0.85,
      "q68_ann_pq" -> 0.9, "q72_ann_ivfpq" -> 0.5, "q84_ann_opq" -> 0.85)
    floors.foreach { case (q, floor) =>
      val df = SparkEntry.queries(q)(spark, sf)
      assert(df.columns.contains("recall"), s"$q must emit a recall column")
      val mean = df.agg(avg(col("recall"))).head().getDouble(0)
      assert(mean >= floor, s"$q mean emitted recall $mean below floor $floor")
    }
  }

  test("LSH ANN recall vs brute force top-5") {
    val queries = emb.filter(col("vec_id") < 100)
    val exact = Similarity.bruteForceTopK(emb, queries, 5)
      .select("vec_id", "neighbor_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // fixture vectors are near-random (top-5 cosine ~0.4 → ~65° angles), so
    // per-table bit-agreement is only ~0.63 — widen the net: 4 bits × 8
    // tables gives theoretical recall ~0.75 here. High-similarity regimes
    // (the operator's real target) keep the tighter defaults.
    val approx = Similarity.lshTopK(emb, queries, 5, nbits = 4, ntables = 8)
      .select("vec_id", "neighbor_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.5, s"LSH ANN recall: $recall")
  }

  test("multi-probe LSH: recall up at ≤2× candidates; probes substitute for tables") {
    val queries = emb.filter(col("vec_id") < 100)
    val exact = Similarity.bruteForceTopK(emb, queries, 5)
      .select("vec_id", "neighbor_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def recallAt(p: Int, nb: Int, nt: Int): Double = {
      val a = Similarity.lshTopK(emb, queries, 5, nbits = nb, ntables = nt, probes = p)
        .select("vec_id", "neighbor_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      (exact & a).size.toDouble / exact.size
    }
    // q38's operating point (4×8 at the weak-similarity fixture regime):
    // single-probe measures 0.668, one extra probe lifts it to 0.868 at a
    // structurally-bounded ≤2× candidate volume (≤ probes buckets per
    // (query, table); the corpus index is untouched)
    val r1 = recallAt(1, 4, 8)
    val r2 = recallAt(2, 4, 8)
    info(s"4x8 recall: probes=1 $r1, probes=2 $r2")
    assert(r2 >= 0.8, s"multi-probe recall floor: $r2")
    assert(r2 >= r1 + 0.1, s"probe lift: $r1 -> $r2")
    // probes substitute for TABLES: half the corpus index (4 tables) with
    // 3 probes beats the full 8-table index single-probe — the memory/
    // recall lever multi-probe exists for (measures 0.778 vs 0.668)
    val rHalf = recallAt(3, 4, 4)
    info(s"4x4 probes=3 recall: $rHalf")
    assert(rHalf >= r1, s"4 tables × 3 probes ($rHalf) must reach 8 tables × 1 ($r1)")
    // the PROBING SEQUENCE (2-bit flips of the weakest bits, ordered by
    // summed margin) pushes a HALF-size index to near-exhaustive recall:
    // measured 0.908 / 0.99 / 1.0 at probes 5 / 8 / 11 — the corpus index
    // never grows, only the bounded query fan-out does
    val deep = Seq(5, 8, 11).map(p => recallAt(p, 4, 4))
    info(s"4x4 deep probing (pairs beyond singles): ${Seq(5, 8, 11).zip(deep)}")
    assert(deep(1) >= 0.95, s"probes=8 recall: ${deep(1)}")
    assert(deep(2) >= 0.98, s"probes=11 recall: ${deep(2)}")
    assert(deep == deep.sorted, s"recall must not regress with more probes: $deep")
  }

  test("connected components: known graph resolves to min-id labels") {
    import spark.implicits._
    // components: {1,2,3,7}, {4,5}, {9,10}
    val pairs = Seq((1L,2L),(2L,3L),(3L,7L),(4L,5L),(9L,10L)).toDF("doc_a","doc_b")
    val got = graft.operators.DedupComponents.components(pairs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val want = Set((1L,1L,4L),(2L,1L,4L),(3L,1L,4L),(7L,1L,4L),
      (4L,4L,2L),(5L,4L,2L),(9L,9L,2L),(10L,9L,2L))
    assert(got == want)
  }

  test("connected components: a 300-link chain converges in O(log n) rounds") {
    import spark.implicits._
    // a transitive near-dup CHAIN (the pathological diameter case common
    // in web corpora): plain one-hop min propagation needs 300 rounds and
    // trips maxIters=20; pointer jumping must finish well inside it
    val chain = (0L until 300L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val got = graft.operators.DedupComponents.components(chain)
    assert(got.count() == 301)
    assert(got.filter(org.apache.spark.sql.functions.col("component") =!= 0L).count() == 0,
      "every chain node must resolve to component 0")
  }

  test("IVF ANN recall vs brute force top-5") {
    val queries = emb.filter(col("vec_id") < 100)
    val exact = Similarity.bruteForceTopK(emb, queries, 5)
      .select("vec_id", "neighbor_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val trained = graft.operators.IvfAnn.train(emb, k = 16, iters = 2)
    // the model is a persisted artifact: save/load must be lossless
    val path = java.nio.file.Files.createTempDirectory("graft-ivf").toString + "/model"
    graft.operators.IvfAnn.save(spark, trained, path)
    val model = graft.operators.IvfAnn.load(spark, path)
    assert(model.centroids.toSeq == trained.centroids.toSeq)
    val approx = graft.operators.IvfAnn.topK(emb, queries, model, k = 5, nprobe = 4)
      .select("vec_id", "neighbor_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & approx).size.toDouble / exact.size
    info(s"IVF recall at nprobe=4/16: $recall")
    assert(recall >= 0.3, s"IVF ANN recall: $recall")
    // full probe must be exhaustive -> exact
    val full = graft.operators.IvfAnn.topK(emb, queries, model, k = 5, nprobe = 16)
      .select("vec_id", "neighbor_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(full == exact, "nprobe=k must reduce to brute force")
  }

  test("SemDeDup: k=1 equals exact all-pairs; clustered pairs are a verified subset") {
    import graft.operators.{IvfAnn, SemDedup}
    val exact = Similarity.neardupPairs(emb, threshold = 0.46)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty)
    // degeneracy: one cluster = no blocking = the exact operator
    val k1 = IvfAnn.train(emb, k = 1, iters = 1)
    val allInOne = SemDedup.pairs(emb, k1, threshold = 0.46)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(allInOne == exact, s"k=1 missed ${exact -- allInOne}, extra ${allInOne -- exact}")
    // clustered: every reported pair is a true pair (cosine is verified
    // in-cell, so clustering can only LOSE cross-cell pairs, never invent)
    val k16 = IvfAnn.train(emb, k = 16, iters = 2)
    val clustered = SemDedup.pairs(emb, k16, threshold = 0.46)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(clustered.subsetOf(exact), s"invented pairs: ${clustered -- exact}")
    info(s"SemDeDup in-cell recall at k=16: ${clustered.size}/${exact.size}")
    // decisions are consistent with pairs: dropped = the distinct higher ids
    val d = SemDedup.decisions(emb, k16, threshold = 0.46)
    val dropped = d.filter(!col("kept")).collect().map(_.getLong(0)).toSet
    assert(dropped == clustered.map(_._2))
    assert(d.count() == emb.count())
  }

  test("IVF large-k (broadcast-join) centroid paths equal the expression paths") {
    import graft.functions.VectorFunctions.asDouble
    // at k beyond ~64 the k-literal expression tree is not viable (codegen
    // size); the join form must produce IDENTICAL assignments and probes —
    // forced here via exprK = 0 at a small k so both paths are comparable
    val m = graft.operators.IvfAnn.train(emb, k = 8, iters = 1)
    val df = emb.select(col("vec_id").as("id"), asDouble(col("embedding")).as("v"))
    def assigns(exprK: Int) = graft.operators.IvfAnn
      .withNearestCid(spark, df, m, "id", "v", exprK)
      .select("id", "cid").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(assigns(64) == assigns(0))
    def probes(exprK: Int) = graft.operators.IvfAnn
      .withProbeCids(spark, df.limit(50), m, 3, "id", "v", exprK)
      .select("id", "cid").collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(probes(64) == probes(0))
  }

  test("PQ ANN: ADC recall, exact re-rank lift, artifact roundtrip + staleness") {
    import graft.operators.PqAnn
    val queries = emb.filter(col("vec_id") < 100)
    val exact = Similarity.bruteForceTopK(emb, queries, 5)
      .select("vec_id", "neighbor_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val base = java.nio.file.Files.createTempDirectory("graft-pq").toString
    val path = s"$base/model"
    val (mo, enc) = PqAnn.buildOrLoad(spark, emb, path, m = 16, k = 32, iters = 4)
    // compactness is structural: 16 smallint codes + a double norm per row
    val row = enc.head()
    assert(row.getSeq[Short](row.fieldIndex("codes")).length == 16)
    // raw ADC recall on the near-random fixture (measured 0.48; floor with margin)
    def ids(df: org.apache.spark.sql.DataFrame) =
      df.select("vec_id", "neighbor_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val raw = ids(PqAnn.topK(enc, queries, mo, 5))
    val rawRecall = (exact & raw).size.toDouble / exact.size
    info(s"PQ raw ADC recall@5 (m=16,k=32): $rawRecall")
    assert(rawRecall >= 0.35, s"raw ADC recall: $rawRecall")
    // ADC shortlist + exact re-rank: the full-precision table is touched
    // only for k*refine rows per query (measured 0.976; floor with margin)
    val refined = ids(PqAnn.topKRefined(enc, emb, queries, mo, k = 5, refine = 10))
    val refRecall = (exact & refined).size.toDouble / exact.size
    info(s"PQ refined recall@5 (refine=10): $refRecall")
    assert(refRecall >= 0.9, s"refined recall: $refRecall")
    assert(refRecall >= rawRecall, "re-ranking must not lose recall")
    // artifact: a second buildOrLoad call LOADS (the codes part file
    // survives untouched) and the loaded model scores identically
    val part = new java.io.File(s"$path/codes").listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    val (mo2, enc2) = PqAnn.buildOrLoad(spark, emb, path, m = 16, k = 32, iters = 4)
    assert(part.exists())
    assert(mo2.codebooks.toSeq == mo.codebooks.toSeq)
    assert(ids(PqAnn.topK(enc2, queries, mo2, 5)) == raw)
    // staleness: corpus rewritten in place under the same path → rebuild
    val docsPath = s"$base/corpus"
    emb.limit(50).write.parquet(docsPath)
    val small = spark.read.parquet(docsPath)
    val p2 = s"$base/model2"
    PqAnn.buildOrLoad(spark, small, p2, m = 16, k = 8, iters = 1)
    val n1 = spark.read.parquet(s"$p2/codes").count()
    emb.limit(80).write.mode("overwrite").parquet(docsPath)
    PqAnn.buildOrLoad(spark, spark.read.parquet(docsPath), p2, m = 16, k = 8, iters = 1)
    val n2 = spark.read.parquet(s"$p2/codes").count()
    assert(n1 == 50 && n2 == 80, s"stale artifact not rebuilt: $n1 -> $n2")
    // SQL surface: pq_adc is registered and agrees with the operator
    import spark.implicits._
    val sqlScore = Seq((Seq(0.toShort, 1.toShort), Seq(1.0, 2.0, 3.0, 4.0)))
      .toDF("codes", "lut")
      .selectExpr("pq_adc(codes, lut, 2) AS s").head().getDouble(0)
    assert(sqlScore == 1.0 + 4.0)
  }

  test("incremental dedup = the fresh-involving subset of the full pair graph") {
    import graft.operators.DedupPipeline
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val full = pairs(DedupPipeline.jaccardPairs(docs, 0.8))
    val cut = docs.agg(max("doc_id")).head().getLong(0) * 4 / 5
    val inc = pairs(DedupPipeline.incrementalPairs(docs, col("doc_id") >= cut, 0.8))
    val want = full.filter { case (a, b) => a >= cut || b >= cut }
    assert(inc == want, s"missing ${want -- inc}, extra ${inc -- want}")
    // the point of the incremental path: old×old pairs exist and are NOT
    // recomputed (the subset is proper on this fixture)
    assert(want.nonEmpty && want != full)
    assert(inc.forall { case (a, b) => a < b })
  }

  test("IVFxPQ: coarse recall bound, full probe equals flat PQ, artifact reuse") {
    import graft.operators.{IvfAnn, IvfPq, PqAnn}
    val queries = emb.filter(col("vec_id") < 100)
    val exact = Similarity.bruteForceTopK(emb, queries, 5)
      .select("vec_id", "neighbor_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def ids(df: org.apache.spark.sql.DataFrame) =
      df.select("vec_id", "neighbor_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val base = java.nio.file.Files.createTempDirectory("graft-ivfpq").toString
    val (mo, enc) = IvfPq.buildOrLoad(spark, emb, s"$base/model")
    // composition costs ≈ nothing beyond the coarse level: at nprobe=4 the
    // re-rank recovers the PQ loss, so recall tracks IVF-only (measured
    // 0.598 vs 0.600) — floor with margin, and never > the probed ceiling
    val got4 = ids(IvfPq.topK(enc, emb, queries, mo, k = 5, nprobe = 4))
    val r4 = (exact & got4).size.toDouble / exact.size
    val ivfOnly = ids(IvfAnn.topK(emb, queries, mo.ivf, k = 5, nprobe = 4))
    val rIvf = (exact & ivfOnly).size.toDouble / exact.size
    info(s"IVFxPQ nprobe=4 recall: $r4 (IVF-only: $rIvf)")
    assert(r4 >= 0.5, s"IVFxPQ recall: $r4")
    assert(r4 >= rIvf - 0.05, "fine level must not cost recall after re-rank")
    // recall grows with nprobe; probing EVERY cell degenerates to flat
    // PQ+re-rank EXACTLY (same ADC scores, same tie order)
    val got16 = ids(IvfPq.topK(enc, emb, queries, mo, k = 5, nprobe = mo.ivf.k))
    val flat = ids(PqAnn.topKRefined(
      spark.read.parquet(s"$base/model/codes").select("vec_id", "codes", "vnorm"),
      emb, queries, mo.pq, k = 5, refine = 10))
    assert(got16 == flat, "full-probe IVFxPQ must equal flat PQ+re-rank")
    val r8 = (exact & ids(IvfPq.topK(enc, emb, queries, mo, k = 5, nprobe = 8))).size
      .toDouble / exact.size
    assert(r4 <= r8 && r8 <= (exact & got16).size.toDouble / exact.size + 1e-9,
      s"recall must grow with nprobe: $r4, $r8")
    // artifact: second call loads (codes part untouched), scores identical
    val part = new java.io.File(s"$base/model/codes").listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    val (mo2, enc2) = IvfPq.buildOrLoad(spark, emb, s"$base/model")
    assert(part.exists())
    assert(mo2.ivf.centroids.toSeq == mo.ivf.centroids.toSeq &&
      mo2.pq.codebooks.toSeq == mo.pq.codebooks.toSeq)
    assert(ids(IvfPq.topK(enc2, emb, queries, mo2, k = 5, nprobe = 4)) == got4)
  }

  test("DedupPipeline artifact: reused across sessions, rebuilt on corpus change") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft-dedup-art").toString
    val docsPath = s"$base/docs"
    val scratch = s"$base/scratch"
    Seq(
      (0L, "en", "web", "aaa bbb ccc ddd eee"),
      (1L, "en", "web", "aaa bbb ccc ddd eee"), // dup of 0
      (2L, "en", "web", "zzz yyy xxx www vvv"))
      .toDF("doc_id", "lang", "source", "text").write.parquet(docsPath)
    val p1 = graft.operators.DedupPipeline
      .pairs(spark, spark.read.parquet(docsPath), scratch)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(p1 == Set((0L, 1L)))
    val part = new java.io.File(s"$scratch/pairs").listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    // a sibling session (the session-restart case) READS the artifact —
    // the original part file survives, proving no rebuild happened
    val s2 = spark.newSession()
    val p2 = graft.operators.DedupPipeline
      .pairs(s2, s2.read.parquet(docsPath), scratch)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(p2 == p1 && part.exists())
    // components come from the SAME materialized graph
    val comp = graft.operators.DedupPipeline
      .components(spark, spark.read.parquet(docsPath), scratch)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comp == Map(0L -> 0L, 1L -> 0L) && part.exists())
    // corpus rewritten in place (two docs appended) → fingerprint mismatch
    // → the graph is REBUILT, not reused stale
    Seq((3L, "en", "web", "qqq rrr sss ttt uuu"),
        (4L, "en", "web", "qqq rrr sss ttt uuu"))
      .toDF("doc_id", "lang", "source", "text")
      .write.mode("append").parquet(docsPath)
    val p3 = graft.operators.DedupPipeline
      .pairs(spark, spark.read.parquet(docsPath), scratch)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(p3 == Set((0L, 1L), (3L, 4L)))
  }

  test("explicit corpus versions pin artifacts with zero content scans") {
    import spark.implicits._
    // a 100 TB pipeline versions corpora explicitly: the stamp is the id,
    // not a content hash — same id reuses (even if the frame differs;
    // the caller owns that promise), new id rebuilds
    val base = java.nio.file.Files.createTempDirectory("graft-ver").toString
    def d(rows: Seq[(Long, String)]) =
      rows.map { case (id, t) => (id, "en", "web", t) }
        .toDF("doc_id", "lang", "source", "text")
    val docs1 = d(Seq((0L, "x y z a b"), (1L, "x y z a b")))
    val docs2 = d(Seq((5L, "p q r s t"), (6L, "p q r s t")))
    def pairsOf(docs: org.apache.spark.sql.DataFrame, v: String) =
      graft.operators.DedupPipeline.pairs(spark, docs, s"$base/scratch", version = Some(v))
        .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairsOf(docs1, "snap-1") == Set((0L, 1L)))
    assert(pairsOf(docs2, "snap-1") == Set((0L, 1L)), "same version must reuse")
    assert(pairsOf(docs2, "snap-2") == Set((5L, 6L)), "new version must rebuild")
    // IVF: same scheme
    def corpus(shift: Double) = (0L until 40L).map(i =>
      (i, (0 until 8).map(x => (math.sin(i * 7 + x) + shift).toFloat))).toDF("vec_id", "embedding")
    val mp = s"$base/model"
    val m1 = graft.operators.IvfAnn.trainOrLoad(spark, corpus(0.0), mp, k = 4, iters = 1,
      version = Some("v1"))
    val m2 = graft.operators.IvfAnn.trainOrLoad(spark, corpus(9.0), mp, k = 4, iters = 1,
      version = Some("v1"))
    assert(m2.centroids.map(_._2).toSeq == m1.centroids.map(_._2).toSeq,
      "same version must load, content ignored")
    val m3 = graft.operators.IvfAnn.trainOrLoad(spark, corpus(9.0), mp, k = 4, iters = 1,
      version = Some("v2"))
    assert(m3.centroids.map(_._2).toSeq != m1.centroids.map(_._2).toSeq,
      "new version must retrain")
  }

  test("IVF trainOrLoad retrains when the corpus changes in place, loads when it doesn't") {
    import spark.implicits._
    // the model path stays FIXED while the corpus under it changes — the
    // artifact must be keyed on corpus content, not path
    def corpus(shift: Double) = (0L until 60L).map(i =>
      (i, (0 until 8).map(d => (math.sin(i * 13 + d) + shift).toFloat))).toDF("vec_id", "embedding")
    val path = java.nio.file.Files.createTempDirectory("graft-ivf-fp").toString + "/model"
    val m1 = graft.operators.IvfAnn.trainOrLoad(spark, corpus(0.0), path, k = 4, iters = 2)
    val m2 = graft.operators.IvfAnn.trainOrLoad(spark, corpus(5.0), path, k = 4, iters = 2)
    assert(m1.centroids.map(_._2).toSeq != m2.centroids.map(_._2).toSeq,
      "rewritten corpus must retrain, not reuse stale centroids")
    // unchanged corpus → the persisted artifact is loaded, not rewritten:
    // the original part file (rewrites generate fresh UUID names) survives
    val part = new java.io.File(path).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    val m3 = graft.operators.IvfAnn.trainOrLoad(spark, corpus(5.0), path, k = 4, iters = 2)
    assert(m3.centroids.toSeq == m2.centroids.toSeq)
    assert(part.exists(), "unchanged corpus must load the artifact, not retrain")
  }

  test("int8-quantized topk: high recall vs full precision, bounded roundtrip error") {
    import graft.functions.VectorFunctions.{dequantize8, q8Scale, quantize8}
    val queries = emb.filter(col("vec_id") < 100)
    val exact = Similarity.bruteForceTopK(emb, queries, 5)
      .select("vec_id", "neighbor_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val quant = Similarity.bruteForceTopKQuantized(emb, queries, 5)
      .select("vec_id", "neighbor_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & quant).size.toDouble / exact.size
    info(s"quantized top-5 recall: $recall")
    assert(recall >= 0.85, s"int8 recall too low: $recall")
    // symmetric max-abs scheme: per-element roundtrip error ≤ scale/2
    val bad = emb
      .withColumn("s", q8Scale(col("embedding")))
      .withColumn("rq", dequantize8(quantize8(col("embedding"), col("s")), col("s")))
      .withColumn("maxerr", array_max(org.apache.spark.sql.functions.zip_with(
        col("embedding"), col("rq"), (a, b) => abs(a - b))))
      .filter(col("maxerr") > col("s") * 0.5 * 1.001 + 1e-6)
      .count()
    assert(bad == 0, s"$bad vectors exceed the scale/2 dequantization bound")
  }

  test("brute-force topk is self-consistent: rank1 neighbor has max cosine") {
    val top = Similarity.bruteForceTopK(emb, emb.filter(col("vec_id") < 10), 5)
    val r = top.groupBy("vec_id").agg(
      max(when(col("rn") === 1, col("cos"))).as("c1"),
      max(col("cos")).as("cmax")).collect()
    r.foreach(row => assert(row.getDouble(1) == row.getDouble(2)))
  }

  test("MatVec: literal-matrix product matches hand math, null on dim mismatch") {
    val sqlc = spark
    import sqlc.implicits._
    val m = Array(Array(1.0, 0.0), Array(0.0, 1.0), Array(1.0, 1.0))
    val df = Seq((1L, Seq(1.0, 2.0)), (2L, Seq(9.0, 9.0, 9.0))).toDF("id", "v")
      .withColumn("r", graft.functions.MatVec(col("v"), m))
    val rows = df.collect().map(r => r.getLong(0) ->
      (if (r.isNullAt(2)) null else r.getSeq[Double](2))).toMap
    assert(rows(1L) == Seq(1.0, 2.0, 3.0))
    assert(rows(2L) == null) // 3-dim vector into a 2-dim matrix
  }

  test("OPQ: learned rotation beats axis-aligned PQ on anisotropic data; R orthogonal") {
    import graft.operators.{OpqAnn, PqAnn}
    val sqlc = spark
    import sqlc.implicits._
    // anisotropic corpus: a decaying spectrum MIXED across PQ block
    // boundaries by a fixed rotation (x = mix · diag(scales) · g) — the
    // regime where axis-aligned blocks quantize worst and OPQ exists
    val rnd = new scala.util.Random(3)
    val d = 16
    def orthonormalize(a: Array[Array[Double]]): Array[Array[Double]] = {
      val q = a.map(_.clone())
      for (i <- q.indices) {
        for (j <- 0 until i) {
          val dot = (0 until d).map(t => q(i)(t) * q(j)(t)).sum
          (0 until d).foreach(t => q(i)(t) -= dot * q(j)(t))
        }
        val n = math.sqrt((0 until d).map(t => q(i)(t) * q(i)(t)).sum)
        (0 until d).foreach(t => q(i)(t) /= n)
      }
      q
    }
    val mix = orthonormalize(Array.fill(d, d)(rnd.nextGaussian()))
    val scales = Array.tabulate(d)(i => math.pow(10.0, -2.0 * i / d))
    val vecs = (0L until 300L).map { i =>
      val g = Array.fill(d)(rnd.nextGaussian() * 1.0).zip(scales).map { case (v, s) => v * s }
      (i, mix.map(row => row.zip(g).map { case (a, b) => a * b }.sum).toSeq)
    }
    val corpus = vecs.toDF("vec_id", "embedding").cache()
    val queries = corpus.filter(col("vec_id") < 60)
    def ids(df: org.apache.spark.sql.DataFrame) =
      df.select("vec_id", "neighbor_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = ids(Similarity.bruteForceTopK(corpus, queries, 5))

    val pq = PqAnn.train(corpus, m = 4, k = 16, iters = 6)
    val pqRecall = (exact & ids(PqAnn.topK(PqAnn.encode(corpus, pq), queries, pq, 5)))
      .size.toDouble / exact.size
    val opq = OpqAnn.train(corpus, m = 4, k = 16, lloydIters = 6, opqIters = 6,
      sampleSize = 300)
    val opqRecall = (exact & ids(OpqAnn.topK(OpqAnn.encode(corpus, opq), queries, opq, 5)))
      .size.toDouble / exact.size
    info(s"raw ADC recall@5 — PQ: $pqRecall, OPQ: $opqRecall")
    assert(opqRecall > pqRecall, s"OPQ ($opqRecall) must beat PQ ($pqRecall) here")

    // R stays orthogonal (the Procrustes solve returns U·Vt exactly)
    val r = opq.rotation
    for (i <- 0 until d; j <- 0 until d) {
      val dot = (0 until d).map(t => r(t)(i) * r(t)(j)).sum
      assert(math.abs(dot - (if (i == j) 1.0 else 0.0)) < 1e-9, s"RtR[$i][$j] = $dot")
    }

    // refined search recovers near-exact results from ORIGINAL vectors
    val refined = (exact & ids(OpqAnn.topKRefined(
      OpqAnn.encode(corpus, opq), corpus, queries, opq, k = 5, refine = 10)))
      .size.toDouble / exact.size
    info(s"OPQ refined recall@5: $refined")
    assert(refined >= 0.9 && refined >= opqRecall)
  }

  // ---- SpanDedup: exact duplicated-span detection ----

  // Boundary characters around each planted span are chosen distinct so
  // the maximal run is exactly the planted string — fencepost-exact.
  private val sharedA = "the quick brown fox jumps over the lazy dog 01234" // 49 chars
  private val sharedB = "GRAND CENTRAL TERMINAL HOLDS FORTY-FOUR PLATFORMS" // 49 chars

  test("SpanDedup finds a planted span with exact positions and length") {
    import spark.implicits._
    val docA = "a1" + sharedA + "q1"
    val docB = "b234567" + sharedA + "w2"
    val df = Seq((1L, docA), (2L, docB), (3L, "tiny")).toDF("doc_id", "text")
    val got = graft.operators.SpanDedup.spans(df, k = 16, minLen = 40).collect()
    assert(got.length == 1)
    val r = got.head
    assert(r.getAs[Long]("doc_a") == 1L && r.getAs[Long]("doc_b") == 2L)
    assert(r.getAs[Long]("a_start") == docA.indexOf(sharedA) + 1)
    assert(r.getAs[Long]("b_start") == docB.indexOf(sharedA) + 1)
    assert(r.getAs[Long]("span_chars") == sharedA.length)
  }

  test("SpanDedup reports one row per maximal run: two passages, two diagonals") {
    import spark.implicits._
    val docC = "c1" + sharedA + "x1x2x3" + sharedB + "y1"
    val docD = "d123456789" + sharedB + "z1z2" + sharedA + "v1"
    val df = Seq((1L, docC), (2L, docD)).toDF("doc_id", "text")
    val got = graft.operators.SpanDedup.spans(df, k = 16, minLen = 40)
      .collect().map(r => (r.getAs[Long]("a_start"), r.getAs[Long]("b_start"),
        r.getAs[Long]("span_chars"))).toSet
    assert(got == Set(
      (docC.indexOf(sharedA) + 1L, docD.indexOf(sharedA) + 1L, sharedA.length.toLong),
      (docC.indexOf(sharedB) + 1L, docD.indexOf(sharedB) + 1L, sharedB.length.toLong)))
  }

  test("SpanDedup minLen gates; spansAmong equals spans restricted to candidate pairs") {
    import spark.implicits._
    val short = sharedA.take(30)
    val df = Seq(
      (1L, "e1" + short + "q9"), (2L, "f234" + short + "w8"), // 30-char span only
      (3L, "g1" + sharedA + "r7"), (4L, "h23" + sharedA + "t6")).toDF("doc_id", "text")
    val all = graft.operators.SpanDedup.spans(df, k = 16, minLen = 40).collect()
    assert(all.map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet ==
      Set((3L, 4L)), "30-char span must be filtered at minLen=40")

    val pairs = Seq((3L, 4L)).toDF("doc_a", "doc_b")
    val among = graft.operators.SpanDedup.spansAmong(df, pairs, k = 16, minLen = 16)
      .collect().map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"),
        r.getAs[Long]("span_chars"))).toSet
    assert(among == Set((3L, 4L, sharedA.length.toLong)),
      "spansAmong must exclude the (1,2) pair not in the candidate set")
  }

  test("component-keyed splits leak ZERO near-dup pairs across split boundaries") {
    val docs = Tables.load(spark, SparkTestEnv.sf, "documents")
    val scratch = java.nio.file.Files.createTempDirectory("graft-leak").toString
    val pairs = graft.operators.DedupPipeline.pairs(spark, docs, scratch, 0.8)
      .select("doc_a", "doc_b")
    assert(pairs.count() > 0, "fixture has no near-dup pairs to leak")
    val comp = graft.operators.DedupPipeline.components(spark, docs, scratch, 0.8)
      .select("doc_id", "component")
    val keyed = docs.select("doc_id").join(comp, Seq("doc_id"), "left")
      .withColumn("gid", coalesce(col("component"), col("doc_id")))
    val sp = graft.operators.Sampling.assignSplit(keyed, col("gid"),
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .select(col("doc_id"), col("split"))
    def leaked(assign: org.apache.spark.sql.DataFrame): Long =
      pairs.join(assign.toDF("doc_a", "split_a"), Seq("doc_a"))
        .join(assign.toDF("doc_b", "split_b"), Seq("doc_b"))
        .filter(col("split_a") =!= col("split_b")).count()
    assert(leaked(sp) == 0, "component-keyed split leaked a near-dup pair")
    // and the doc-keyed baseline DOES leak on this fixture — the audit
    // (q124) is measuring something real
    val byDoc = graft.operators.Sampling.assignSplit(docs.select("doc_id"),
      col("doc_id"), Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .select(col("doc_id"), col("split"))
    assert(leaked(byDoc) > 0, "doc-keyed split unexpectedly leak-free")
  }

  test("pagerank: star hub dominates, mass conserved, matches driver replay to 1e-9") {
    import spark.implicits._
    import graft.operators.PageRank
    // star + a detached triangle: hub 1 must outrank its leaves, the
    // symmetric triangle splits its mass evenly
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L),
      (10L, 11L), (11L, 12L), (10L, 12L)).toDF("doc_a", "doc_b")
    val got = PageRank.run(edges, iterations = 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(math.abs(got.values.sum - 1.0) < 1e-9, s"rank mass ${got.values.sum}")
    assert(got(1L) > got(2L) * 2, s"hub ${got(1L)} vs leaf ${got(2L)}")
    assert(Seq(2L, 3L, 4L, 5L).map(got).distinct.size == 1, "leaves must tie")
    assert(Seq(10L, 11L, 12L).map(got).distinct.size == 1, "triangle must tie")
    // exact driver replay of the same fixed-iteration update rule
    val sym = Seq((1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L), (10L, 11L), (11L, 12L), (10L, 12L))
      .flatMap { case (a, b) => Seq(a -> b, b -> a) }
    val deg = sym.groupBy(_._1).view.mapValues(_.size.toDouble).toMap
    val n = deg.size
    var r = deg.keys.map(_ -> 1.0 / n).toMap
    for (_ <- 1 to 10)
      r = deg.keys.map { v =>
        val in = sym.filter(_._2 == v).map(_._1)
        v -> (0.15 / n + 0.85 * in.map(u => r(u) / deg(u)).sum)
      }.toMap
    r.foreach { case (v, exp) =>
      assert(math.abs(got(v) - exp) < 1e-9, s"node $v: ${got(v)} vs replay $exp")
    }
    // the EXACT fixed-point form (q117's oracle-hashable output) tracks
    // the float form to truncation error (≤ iterations/scale relative ≈
    // 1e-11 here) and never exceeds it (truncation only loses mass)
    val exact = PageRank.runExact(edges, iterations = 10)
      .collect().map(row => row.getLong(0) -> row.getLong(1)).toMap
    assert(exact.keySet === got.keySet)
    exact.foreach { case (v, e12) =>
      val asDouble = e12.toDouble / 1e12
      assert(asDouble <= got(v) + 1e-12 && got(v) - asDouble < 1e-6,
        s"node $v: fixed-point $asDouble vs float ${got(v)}")
    }
  }

  test("pagerank/components: superseded per-round checkpoints are released") {
    import spark.implicits._
    // checkpoint blocks persist at the RDD level, so Dataset.unpersist is
    // a no-op on them; without explicit release every round's copy stays
    // resident for the life of the JVM (the q117 warm-run regression).
    // Delta-count the context's persistent RDDs: only the FINAL state of
    // each run may remain.
    val sc = spark.sparkContext
    val edges = (0L until 200L).map(i => (i, (i + 1) % 200L)).toDF("doc_a", "doc_b")
    val before = sc.getPersistentRDDs.keySet
    val ranks = graft.operators.PageRank.run(edges, iterations = 10)
    assert(ranks.count() == 200)
    val afterRank = sc.getPersistentRDDs.keySet
    assert((afterRank -- before).size <= 1,
      s"PageRank retained ${(afterRank -- before).size} checkpointed tables " +
        "(expected only the final ranks); superseded rounds are leaking")
    val comp = graft.operators.DedupComponents.components(edges)
    assert(comp.count() == 200)
    val afterComp = sc.getPersistentRDDs.keySet
    assert((afterComp -- afterRank).size <= 1,
      s"DedupComponents retained ${(afterComp -- afterRank).size} checkpointed " +
        "tables (expected only the final labels); superseded rounds are leaking")
  }
}
