package graft

import graft.operators.SnapshotStats
import graft.operators.SnapshotStats.ColStats
import graft.sources.SnapshotScan

import org.apache.spark.sql.sources._
import org.scalacheck.{Gen, Prop, Properties, Test}
import org.scalacheck.Prop.propBoolean

import java.nio.charset.StandardCharsets
import java.util.Base64

/** The pruning guarantee, property-tested: for ARBITRARY file contents
  * and ARBITRARY pushed-filter trees, a file that contains at least one
  * row satisfying the filter is ALWAYS admitted by the stats translation
  * ([[SnapshotScan.admits]]) — i.e. manifest pruning can only drop files
  * the filter provably cannot match, never a genuine hit. This is the
  * lossless side of the contract; selectivity (dropping misses) is
  * best-effort by design and not asserted.
  */
object PruningPropertySpec extends Properties("snapshot-pruning") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(300)

  // ---- model: a "file" is a bag of rows over one long column + one
  // string column, with stats built exactly the way the footer encoder
  // renders them (long domain: decimal strings; string domain: base64
  // of UTF-8 bytes, byte-lexicographic order)

  private val genLongRow = Gen.chooseNum(-50L, 50L)
  private val genStrRow = Gen.oneOf("a", "ab", "b", "ba", "zz", "", "é", "0")
  private def b64(s: String): String =
    Base64.getEncoder.encodeToString(s.getBytes(StandardCharsets.UTF_8))

  private case class FileModel(longs: Seq[Long], strs: Seq[String], nulls: Int) {
    def stats: Map[String, ColStats] = {
      val l =
        if (longs.isEmpty) ColStats("allnull", nulls.toLong, "", "")
        else ColStats("long", nulls.toLong, longs.min.toString, longs.max.toString)
      val byBytes = strs.sortWith((a, b) =>
        byteLt(a.getBytes(StandardCharsets.UTF_8), b.getBytes(StandardCharsets.UTF_8)))
      val s =
        if (strs.isEmpty) ColStats("allnull", nulls.toLong, "", "")
        else ColStats("string", nulls.toLong, b64(byBytes.head), b64(byBytes.last))
      Map("ln" -> l, "st" -> s)
    }
  }

  private def byteLt(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < a.length && i < b.length) {
      val c = java.lang.Integer.compare(a(i) & 0xff, b(i) & 0xff)
      if (c != 0) return c < 0
      i += 1
    }
    a.length < b.length
  }

  private val genFile: Gen[FileModel] = for {
    ls <- Gen.listOfN(6, genLongRow)
    ss <- Gen.listOfN(6, genStrRow)
    keepL <- Gen.chooseNum(0, 6)
    keepS <- Gen.chooseNum(0, 6)
    nulls <- Gen.chooseNum(0, 3)
  } yield FileModel(ls.take(keepL), ss.take(keepS), nulls)

  // ---- filter generator over the two columns, with nested AND/OR

  private val genLongLeaf: Gen[Filter] = for {
    v <- genLongRow
    f <- Gen.oneOf[Filter](EqualTo("ln", v), GreaterThan("ln", v),
      GreaterThanOrEqual("ln", v), LessThan("ln", v), LessThanOrEqual("ln", v),
      In("ln", Array[Any](v, v + 3, v - 7)), IsNull("ln"), IsNotNull("ln"),
      EqualNullSafe("ln", v))
  } yield f

  private val genStrLeaf: Gen[Filter] = for {
    v <- genStrRow
    f <- Gen.oneOf[Filter](EqualTo("st", v), GreaterThan("st", v),
      LessThanOrEqual("st", v), In("st", Array[Any](v, v + "x")),
      IsNull("st"), IsNotNull("st"))
  } yield f

  private def genFilter(depth: Int): Gen[Filter] =
    if (depth <= 0) Gen.oneOf(genLongLeaf, genStrLeaf)
    else Gen.frequency(
      3 -> genLongLeaf, 3 -> genStrLeaf,
      1 -> (for { l <- genFilter(depth - 1); r <- genFilter(depth - 1) } yield And(l, r)),
      1 -> (for { l <- genFilter(depth - 1); r <- genFilter(depth - 1) } yield Or(l, r)))

  // ---- row-level truth: does ANY row of the file satisfy the filter?
  // NULL rows participate with SQL three-valued semantics (a NULL value
  // satisfies only IsNull / EqualNullSafe(null)).

  private def rowSat(f: Filter, ln: Option[Long], st: Option[String]): Boolean = f match {
    case EqualTo("ln", v) => ln.contains(v.asInstanceOf[Long])
    case EqualNullSafe("ln", v) => ln.contains(v.asInstanceOf[Long])
    case GreaterThan("ln", v) => ln.exists(_ > v.asInstanceOf[Long])
    case GreaterThanOrEqual("ln", v) => ln.exists(_ >= v.asInstanceOf[Long])
    case LessThan("ln", v) => ln.exists(_ < v.asInstanceOf[Long])
    case LessThanOrEqual("ln", v) => ln.exists(_ <= v.asInstanceOf[Long])
    case In("ln", vs) => ln.exists(x => vs.contains(x))
    case IsNull("ln") => ln.isEmpty
    case IsNotNull("ln") => ln.nonEmpty
    case EqualTo("st", v) => st.contains(v.asInstanceOf[String])
    case GreaterThan("st", v) => st.exists(x => byteLt(
      v.asInstanceOf[String].getBytes(StandardCharsets.UTF_8),
      x.getBytes(StandardCharsets.UTF_8)))
    case LessThanOrEqual("st", v) => st.exists(x => !byteLt(
      v.asInstanceOf[String].getBytes(StandardCharsets.UTF_8),
      x.getBytes(StandardCharsets.UTF_8)))
    case In("st", vs) => st.exists(x => vs.contains(x))
    case IsNull("st") => st.isEmpty
    case IsNotNull("st") => st.nonEmpty
    case And(l, r) => rowSat(l, ln, st) && rowSat(r, ln, st)
    case Or(l, r) => rowSat(l, ln, st) || rowSat(r, ln, st)
    case other => sys.error(s"unmodeled filter: $other")
  }

  private def anyRowSat(fm: FileModel, f: Filter): Boolean = {
    // the two columns are independent bags in this model; a "row" is any
    // (long?, string?) combination present in the file, including NULL
    // slots when the file records nulls
    val lnVals: Seq[Option[Long]] =
      fm.longs.map(Some(_)) ++ (if (fm.nulls > 0 || fm.longs.isEmpty) Seq(None) else Nil)
    val stVals: Seq[Option[String]] =
      fm.strs.map(Some(_)) ++ (if (fm.nulls > 0 || fm.strs.isEmpty) Seq(None) else Nil)
    lnVals.exists(l => stVals.exists(s => rowSat(f, l, s)))
  }

  property("a file containing a matching row is NEVER pruned") =
    Prop.forAll(genFile, genFilter(2)) { (fm: FileModel, f: Filter) =>
      !anyRowSat(fm, f) || SnapshotScan.admits(fm.stats, f)
    }

  property("one-sided long bounds agree with direct comparison") =
    Prop.forAll(genLongRow, genLongRow, genLongRow) { (a: Long, b: Long, v: Long) =>
      val cs = ColStats("long", 0, math.min(a, b).toString, math.max(a, b).toString)
      (SnapshotStats.admitsAtLeast(cs, v) == (math.max(a, b) >= v)) &&
        (SnapshotStats.admitsAtMost(cs, v) == (math.min(a, b) <= v))
    }
}
