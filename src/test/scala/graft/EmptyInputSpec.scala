package graft

import graft.operators.{DedupComponents, Migrate, MinHashDedup, Reconcile, Similarity}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Empty-input robustness: operators must return empty results, not crash,
  * when a filter/range matches nothing — the "no partitions in range" path
  * the reference guarded with per-partition exists checks.
  */
class EmptyInputSpec extends AnyFunSuite {
  import SparkTestEnv._
  import spark.implicits._

  test("migrate of an empty date range writes nothing and reports zeros") {
    val dest = Files.createTempDirectory("graft-empty").toString + "/dest"
    val r = Migrate.migrateRange(spark, s"$sf/lineitem.parquet", dest,
      "l_shipdate", "2030-01-01", "2030-01-31")
    assert(r.partitionsWritten == 0 && r.rowsWritten == 0)
  }

  test("reconcile of two empty frames is clean") {
    val e = Tables.load(spark, sf, "orders").filter(lit(false))
    val key = date_format(col("o_orderdate"), "yyyyMM")
    assert(Reconcile.isClean(Reconcile.manifest(e, key), Reconcile.manifest(e, key)))
  }

  test("components of an empty pair set is empty") {
    val empty = Seq.empty[(Long, Long)].toDF("doc_a", "doc_b")
    assert(DedupComponents.components(empty).count() == 0)
  }

  test("minhash over an empty corpus is empty") {
    val docs = Tables.load(spark, sf, "documents").filter(lit(false))
    assert(MinHashDedup.verifiedPairs(docs, "doc_id", "text").count() == 0)
  }

  test("topk with an empty query set is empty") {
    val emb = Tables.load(spark, sf, "embeddings")
    assert(Similarity.bruteForceTopK(emb, emb.filter(lit(false)), 5).count() == 0)
  }

  test("LSH paths over an EMPTY CORPUS return empty, like the exact paths") {
    val none = Tables.load(spark, sf, "embeddings").filter(lit(false))
    // the dim probe must not throw NoSuchElementException on head() of nothing
    assert(Similarity.neardupPairsBucketed(none, threshold = 0.5).count() == 0)
    val lsh = Similarity.lshTopK(none, none, k = 5)
    assert(lsh.count() == 0)
    assert(lsh.columns.toSeq == Seq("vec_id", "neighbor_id", "cos", "rn"))
  }

  test("multi-probe LSH with an empty QUERY set (non-empty corpus) is empty") {
    val emb = Tables.load(spark, sf, "embeddings")
    assert(Similarity.lshTopK(emb, emb.filter(lit(false)), k = 5, probes = 3).count() == 0)
  }

  test("dedup pipeline over an empty corpus materializes empty artifacts") {
    val docs = Tables.load(spark, sf, "documents").filter(lit(false))
    val scratch = Files.createTempDirectory("graft-empty-dedup").toString + "/scratch"
    val pairs = graft.operators.DedupPipeline.pairs(spark, docs, scratch)
    assert(pairs.count() == 0)
    assert(pairs.columns.toSeq == Seq("doc_a", "doc_b", "jac"))
    assert(graft.operators.DedupPipeline.components(spark, docs, scratch).count() == 0)
  }

  test("footer/stats manifests of a missing root are empty, and diff flags the loss") {
    val gone = Files.createTempDirectory("graft-empty-fm").toString + "/never-written"
    assert(graft.operators.Reconcile.footerManifest(spark, gone).count() == 0)
    assert(graft.operators.Reconcile.statsManifest(spark, gone, Seq("v")).count() == 0)
    // a real source vs the missing dest: every partition missing_in_dest
    val src = graft.operators.Reconcile.manifest(
      Tables.load(spark, sf, "region"), lit("all"))
    val bad = graft.operators.Reconcile
      .diff(src, graft.operators.Reconcile.footerManifest(spark, gone))
      .collect()
    assert(bad.nonEmpty && bad.forall(_.getAs[String]("status") == "missing_in_dest"))
  }

  test("repetition profile and sampling over an empty corpus are empty") {
    val docs = Tables.load(spark, sf, "documents").filter(lit(false))
    val prof = graft.operators.Repetition.profile(docs)
    assert(prof.count() == 0)
    assert(prof.columns.toSeq == Seq("doc_id", "dup_word_frac", "top_ngram_frac"))
    assert(graft.operators.Sampling.sample(docs, col("doc_id"), 0.5).count() == 0)
    assert(graft.operators.Sampling.assignSplit(docs, col("doc_id"),
      Seq("a" -> 0.5, "b" -> 0.5)).count() == 0)
  }

  test("PQ: empty queries are empty; training on an empty corpus fails loudly") {
    val emb = Tables.load(spark, sf, "embeddings")
    val none = emb.filter(lit(false))
    val mo = graft.operators.PqAnn.train(emb.limit(64), m = 16, k = 4, iters = 1)
    val enc = graft.operators.PqAnn.encode(emb.limit(64), mo)
    assert(graft.operators.PqAnn.topK(enc, none, mo, 5).count() == 0)
    assert(graft.operators.PqAnn.topKRefined(enc, emb.limit(64), none, mo, 5).count() == 0)
    val e = intercept[IllegalArgumentException] {
      graft.operators.PqAnn.train(none, m = 16, k = 4, iters = 1)
    }
    assert(e.getMessage.contains("empty corpus"))
    // a corpus SMALLER than k caps the codebook at the row count — Model.k
    // must be the real centroid count or every ADC score nulls out
    val tiny = emb.limit(3)
    val small = graft.operators.PqAnn.train(tiny, m = 16, k = 8, iters = 1)
    assert(small.k == 3)
    val encTiny = graft.operators.PqAnn.encode(tiny, small)
    val scored = graft.operators.PqAnn.topK(encTiny, tiny, small, k = 2)
    assert(scored.count() > 0 && scored.filter(col("cos").isNull).count() == 0)
  }

  test("curation tier handles empty corpora") {
    val docs = Tables.load(spark, sf, "documents")
    val none = docs.filter(lit(false))
    assert(graft.operators.Decontaminate.overlap(none, docs).count() == 0)
    // empty EVAL side: nothing is contaminated, but the profile survives
    val clean = graft.operators.Decontaminate.overlap(docs.limit(5), none)
    assert(clean.count() == 5 && clean.filter(col("contaminated")).count() == 0)
    assert(graft.operators.LineDedup.clean(none).count() == 0)
    assert(graft.operators.Bm25.topDocs(none, Seq("spark")).count() == 0)
    assert(graft.operators.FilterPipeline.decide(none).count() == 0)
    val vocab = graft.operators.Vocabulary.build(none)
    assert(vocab.count() == 0)
    // encoding under an EMPTY vocabulary: every token is OOV, nothing crashes
    val enc = graft.operators.Vocabulary.encode(docs.limit(3), vocab)
    assert(enc.count() == 3 && enc.filter(col("oov_rate") =!= 1.0).count() == 0)
  }

  test("round-5 operators handle empty inputs") {
    import spark.implicits._
    val docs = Tables.load(spark, sf, "documents")
    val none = docs.filter(lit(false))
    // spansAmong with no candidate pairs: empty, no job explosion
    val noPairs = Seq.empty[(Long, Long)].toDF("doc_a", "doc_b")
    assert(graft.operators.SpanDedup.spansAmong(docs.limit(10), noPairs).count() == 0)
    // quality model: empty corpus and empty model both behave
    val wts = Seq(("abc", 1.0)).toDF("bucket", "weight")
    assert(graft.operators.QualityModel.score(none, wts).count() == 0)
    val noWts = Seq.empty[(String, Double)].toDF("bucket", "weight")
    val oov = graft.operators.QualityModel.score(docs.limit(3), noWts, defaultWeight = -1.0)
    assert(oov.count() == 3 && oov.filter(col("score") =!= -1.0).count() == 0)
    // merge with an empty delta: untouched destination, zero stats
    val dest = java.nio.file.Files.createTempDirectory("graft-empty-merge") + "/d"
    val orders = Tables.load(spark, sf, "orders").limit(20)
      .withColumn("par_key", date_format(col("o_orderdate"), "yyyyMM"))
    orders.write.partitionBy("par_key").mode("overwrite").parquet(dest)
    val emptyDelta = orders.filter(lit(false)).withColumn("deleted", lit(false))
    val st = graft.operators.Upsert.mergeByKey(spark, dest, emptyDelta,
      Seq("o_orderkey"), Seq("par_key"), Some("deleted"))
    assert(st == graft.operators.Upsert.Stats(0L, 0L, 0L))
    assert(spark.read.parquet(dest).count() == 20)
    // winnow expressions on empty / sub-gram strings
    assert(graft.functions.WinnowFingerprints.fingerprints("", 8, 4).length == 1)
    assert(graft.functions.Md5WinnowFingerprints.fingerprints("ab", 8, 4).length == 1)
  }
}
