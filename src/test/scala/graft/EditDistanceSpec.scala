package graft

import graft.functions.{EditDistance, MyersEdit}
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/** Parity of the Myers bit-parallel edit distance with Spark's built-in
  * `levenshtein` — the q100 substitution is only sound if the two are
  * value-identical on every input shape: empty strings, block
  * boundaries (64/65, 128/129 code points), small alphabets (dense
  * match structure stresses the carry chain), and astral-plane code
  * points (Spark counts a surrogate PAIR as one edit).
  */
class EditDistanceSpec extends AnyFunSuite {
  import SparkTestEnv._

  private def reference(a: String, b: String): Int =
    UTF8String.fromString(a).levenshteinDistance(UTF8String.fromString(b))

  private def myers(a: String, b: String): Int =
    MyersEdit.distance(UTF8String.fromString(a), UTF8String.fromString(b))

  test("hand cases: empties, identity, classic examples") {
    assert(myers("", "") == 0)
    assert(myers("", "abc") == 3)
    assert(myers("abc", "") == 3)
    assert(myers("kitten", "sitting") == 3)
    assert(myers("flaw", "lawn") == 2)
    assert(myers("intention", "execution") == 5)
    assert(myers("same", "same") == 0)
  }

  test("fuzz parity vs built-in across lengths spanning block boundaries") {
    val rnd = new Random(42)
    val alphabets = Seq("ab", "abcde", "abcdefghijklmnopqrstuvwxyz0123456789 ")
    val lengths = Seq(0, 1, 2, 63, 64, 65, 100, 127, 128, 129, 200, 320)
    for (alpha <- alphabets; _ <- 1 to 40) {
      val la = lengths(rnd.nextInt(lengths.size))
      val lb = lengths(rnd.nextInt(lengths.size))
      val a = Seq.fill(la)(alpha(rnd.nextInt(alpha.length))).mkString
      val b = Seq.fill(lb)(alpha(rnd.nextInt(alpha.length))).mkString
      assert(myers(a, b) == reference(a, b),
        s"mismatch on a='$a' b='$b'")
    }
  }

  test("near-duplicate shapes: long shared runs with point edits") {
    val rnd = new Random(7)
    val base = Seq.fill(300)(('a' + rnd.nextInt(4)).toChar).mkString
    for (_ <- 1 to 30) {
      val edits = 1 + rnd.nextInt(10)
      val sb = new StringBuilder(base)
      for (_ <- 1 to edits) {
        val pos = rnd.nextInt(sb.length)
        rnd.nextInt(3) match {
          case 0 => sb.setCharAt(pos, ('a' + rnd.nextInt(4)).toChar)
          case 1 => sb.deleteCharAt(pos)
          case 2 => sb.insert(pos, ('a' + rnd.nextInt(4)).toChar)
        }
      }
      val b = sb.toString
      assert(myers(base, b) == reference(base, b))
    }
  }

  test("unicode: astral code points count as single edits, parity holds") {
    val cases = Seq(
      ("café", "cafe"),
      ("😀abc", "abc"),                  // emoji prefix = 1 edit
      ("a😀b😁c", "abc"),
      ("日本語のテキスト", "日本語テキスト"),
      ("😀" * 70, "😁" * 70))  // wide blocks, non-ascii Peq path
    for ((a, b) <- cases)
      assert(myers(a, b) == reference(a, b), s"mismatch on '$a' vs '$b'")
  }

  test("column expression matches built-in levenshtein on the fixture corpus") {
    val docs = Tables.load(spark, sf, "documents").select(col("doc_id"), col("text"))
    val pairs = docs.select(col("doc_id").as("da"), col("text").as("ta"))
      .crossJoin(docs.select(col("doc_id").as("db"), col("text").as("tb")))
      .filter(col("da") % 17 === 3 && col("db") % 19 === 5) // bounded sample
    val diff = pairs.select(
        levenshtein(col("ta"), col("tb")).as("ref"),
        EditDistance.of(col("ta"), col("tb")).as("got"))
      .filter(col("ref") =!= col("got"))
      .count()
    assert(diff == 0)
  }
}
