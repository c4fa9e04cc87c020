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
    assert(decoded.filter(col("format") === "video" && col("n_frames") < 1).count() == 0)
  }

  test("multimodal feature extraction yields fixed-dim vectors") {
    implicit val sp: SparkSession = spark
    val feats = Multimodal.features(
      Multimodal.synthesize(Tables.load(spark, sf, "documents")), dim = 16)
    assert(feats.filter(size(col("embedding")) =!= 16).count() == 0)
    assert(feats.count() == 500)
  }
}
