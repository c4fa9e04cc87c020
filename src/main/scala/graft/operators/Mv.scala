package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Managed MATERIALIZED VIEWS over snapshot tables: a grouped
  * count/sum aggregate stored as its own snapshot table and kept
  * current by applying the base table's row-level change feed —
  * refresh cost is O(changes + touched groups), never O(base table).
  *
  * The composition (nothing here is new machinery):
  *   - the view algebra is [[IncrementalView]] (ΔV = γ(+ΔR) ⊖ γ(−ΔR),
  *     with the `nn_<c>` companions that keep all-NULL-group sums NULL);
  *   - the change feed is [[Snapshots.changes]] with preimages;
  *   - the write is [[Snapshots.mergeStreamBatch]] with the BASE VERSION
  *     as the batch id — the manifest-native exactly-once contract, so
  *     the refresh watermark needs no side-channel state: it IS the last
  *     committed batch id, recovery-free across crashes, and a replayed
  *     refresh at the same base version merges nothing twice.
  *
  * The merge key is `__gk`, an md5 digest of the group tuple's JSON —
  * the same null-safe composite-key discipline as the clustered layout's
  * split dirs (`Snapshots` routes cluster groups by md5(to_json(...)));
  * raw group columns would break on NULL groups (equi-join upsert would
  * duplicate them) and multi-column merges. The MV table is
  * bucket-clustered on `__gk` (`mvBuckets`), so a refresh's CoW merge
  * probes only the delta's hash buckets ([[Snapshots.mergeByKey]]'s
  * bucket-layout pruning) — on a billion-group MV (per-user aggregates
  * over 100 TB) the probe reads O(touched buckets) files, not the MV.
  *
  * Sums maintain exactly only over exact types (integral, decimal):
  * float/double sums accumulate add/retract in a different order than a
  * recompute and drift by ulps. Sum cents, not dollars (the repo-wide
  * oracle discipline).
  *
  * min/max are deliberately not offered — see [[IncrementalView]]'s
  * header (not invertible under deletes; an honest recompute beats a
  * silent wrong answer).
  *
  * Single-writer per MV root (the snapshot layer's standing contract);
  * the base table may evolve freely between refreshes — the CDF aligns
  * removed-file rows up to the newer schema.
  */
object Mv {

  /** The stored view definition (`<mvRoot>/_mv/def`, written once at
    * [[create]], immutable): base table root, the base's unique row key
    * (the CDF classification key), the group-by columns, and the summed
    * columns.
    */
  final case class Definition(baseRoot: String, baseKeyCols: Seq[String],
      groupCols: Seq[String], sumCols: Seq[String])

  /** One refresh's outcome: `mode` ∈ noop | incremental | full,
    * the base-version watermark it moved from/to, the distinct groups
    * the change feed touched (0 for noop; the full MV group count for
    * full), and the MV version published (None for noop).
    */
  final case class Refresh(mode: String, fromVersion: Int, toVersion: Int,
      groupsTouched: Long, mvVersion: Option[Int])

  private val GkCol = "__gk"
  private val TombCol = "__mv_del"

  private def defPath(root: String) = new Path(root, "_mv/def")

  private def gk(groupCols: Seq[String]): Column =
    md5(to_json(struct(groupCols.map(col): _*)))

  private def fs(spark: SparkSession, root: String) =
    new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def writeDef(spark: SparkSession, root: String, d: Definition): Unit = {
    d.productIterator.foreach {
      case s: String => require(!s.contains("\n"), "definition fields cannot hold newlines")
      case cols: Seq[_] => cols.foreach(c => require(
        !c.toString.exists(ch => ch == ',' || ch == '\n'),
        s"column name '$c' cannot hold ',' or newline"))
    }
    val f = fs(spark, root)
    val p = defPath(root)
    require(!f.exists(p), s"$root is already a materialized view (found ${p}); " +
      "drop the root to redefine")
    val text = Seq(
      s"base=${d.baseRoot}",
      s"keys=${d.baseKeyCols.mkString(",")}",
      s"groups=${d.groupCols.mkString(",")}",
      s"sums=${d.sumCols.mkString(",")}").mkString("\n")
    // staged write + atomic rename: a crashed create leaves no def, so
    // the root never looks like a half-defined MV
    val tmp = new Path(root, s"_mv/.def.${java.util.UUID.randomUUID().toString.take(8)}")
    val out = f.create(tmp, false)
    try out.write(text.getBytes("UTF-8")) finally out.close()
    require(f.rename(tmp, p), s"could not commit MV definition at $p")
  }

  /** The stored [[Definition]] of an MV root; fails loudly when the root
    * was never [[create]]d as one.
    */
  def definition(spark: SparkSession, mvRoot: String): Definition = {
    val f = fs(spark, mvRoot)
    val p = defPath(mvRoot)
    require(f.exists(p), s"$mvRoot is not a materialized view (no ${p}) — Mv.create it")
    val in = f.open(p)
    val text = try {
      val buf = new java.io.ByteArrayOutputStream()
      org.apache.hadoop.io.IOUtils.copyBytes(in, buf, 8192, false)
      buf.toString("UTF-8")
    } finally in.close()
    val kv = text.linesIterator.map { l =>
      val i = l.indexOf('=')
      require(i > 0, s"malformed MV definition line: $l")
      l.take(i) -> l.drop(i + 1)
    }.toMap
    def cols(k: String): Seq[String] =
      kv(k).split(",", -1).toSeq.filter(_.nonEmpty)
    Definition(kv("base"), cols("keys"), cols("groups"), cols("sums"))
  }

  /** Create the MV: compute the grouped count/sum over the base's CURRENT
    * version and publish it as a fresh snapshot table at `mvRoot`, with
    * that base version recorded as the batch id (the refresh watermark).
    * `mvBuckets` bucket-clusters the MV on the group digest so refresh
    * merges probe only touched buckets. Returns the MV version (1).
    */
  def create(spark: SparkSession, mvRoot: String, baseRoot: String,
      baseKeyCols: Seq[String], groupCols: Seq[String], sumCols: Seq[String],
      mvBuckets: Int = 64): Int = {
    require(groupCols.nonEmpty, "an MV needs group columns")
    require(baseKeyCols.nonEmpty, "an MV needs the base table's unique row key " +
      "(CDF classification; see Snapshots.changes)")
    require(groupCols.intersect(Seq(GkCol, TombCol)).isEmpty &&
      sumCols.intersect(Seq(GkCol, TombCol)).isEmpty,
      s"'$GkCol'/'$TombCol' are reserved MV columns")
    val baseVs = Snapshots.versions(spark, baseRoot)
    // EXACT sum types only: the incremental algebra retract/applies per
    // refresh, and float/double sums would drift by ulps on every cycle —
    // silently, cumulatively, away from what a recompute (or the declared
    // full fallback) reports. The bucket layout excludes floats for the
    // same reason (±0.0 key ambiguity); refusal over silent drift.
    locally {
      import org.apache.spark.sql.types.{DoubleType, FloatType}
      val baseSchema = Snapshots.read(spark, baseRoot).schema
      val drifty = sumCols.filter(c => baseSchema.fields.find(_.name == c)
        .exists(f => f.dataType == FloatType || f.dataType == DoubleType))
      require(drifty.isEmpty,
        s"MV sum columns must be exact types (integral/decimal): ${drifty.mkString(", ")} " +
          "are float/double, whose incremental refresh drifts by ulps per cycle — " +
          "sum a scaled integral column (e.g. cents) instead")
    }
    require(baseVs.nonEmpty, s"base $baseRoot has no published snapshot versions")
    val w = baseVs.last
    // a crashed create (def committed, first publish never happened)
    // leaves a def with zero versions — recoverable, not a conflict
    if (fs(spark, mvRoot).exists(defPath(mvRoot)) &&
        Snapshots.versions(spark, mvRoot).isEmpty)
      fs(spark, mvRoot).delete(defPath(mvRoot), false)
    writeDef(spark, mvRoot, Definition(baseRoot, baseKeyCols, groupCols, sumCols))
    val mv0 = IncrementalView.countSum(
      Snapshots.read(spark, baseRoot, Some(w)), groupCols, sumCols)
      .withColumn(GkCol, gk(groupCols))
    Snapshots.publishStreamBatch(spark, mvRoot, mv0, batchId = w,
      append = false, clusterBy = Some(s"bucket($mvBuckets,$GkCol)"))
      .getOrElse(sys.error(s"fresh MV root $mvRoot already carries batch ids"))
  }

  /** The MV's rows (group columns + `n_rows` + `sum_<c>`/`nn_<c>`), the
    * internal merge digest dropped.
    */
  def read(spark: SparkSession, mvRoot: String): DataFrame =
    Snapshots.read(spark, mvRoot).drop(GkCol)

  /** Bring the MV up to the base table's current version.
    *
    *   - already current → `noop`, nothing published;
    *   - watermark and head both dv-free and the watermark version still
    *     retained → `incremental`: ONE change feed over the base's
    *     changed files classifies every row-level change; the view delta
    *     applies to the touched groups only; groups whose count reaches
    *     zero tombstone away; the merge commits with the new base version
    *     as the batch id (replays merge nothing);
    *   - watermark expired, or merge-on-read delete vectors outstanding
    *     at either end (the CDF reads files raw) → declared `full`
    *     recompute: a replacement MV version through the dv-aware read,
    *     same batch-id contract.
    *
    * Cost: incremental = O(changed base files) to classify +
    * O(touched groups) to apply + a CoW merge probing only the touched
    * `__gk` buckets; full = one base scan (the honest fallback, recorded
    * in the report — never silent).
    */
  def refresh(spark: SparkSession, mvRoot: String): Refresh = {
    val d = definition(spark, mvRoot)
    val w = Snapshots.lastBatchId(spark, mvRoot).getOrElse(
      sys.error(s"$mvRoot carries no refresh watermark (batch id) — " +
        "was it published outside Mv.create?")).toInt
    val baseVs = Snapshots.versions(spark, d.baseRoot)
    require(baseVs.nonEmpty, s"base ${d.baseRoot} has no versions")
    val cur = baseVs.last
    // the definition must still be satisfiable: schema evolution may
    // have dropped a grouped/summed/key column — refuse with the
    // contract, not a raw unresolved-column error mid-plan
    Snapshots.schemaOf(spark, d.baseRoot, cur).foreach { sch =>
      val have = sch.fieldNames.toSet
      val missing = (d.baseKeyCols ++ d.groupCols ++ d.sumCols).filterNot(have)
      require(missing.isEmpty,
        s"MV definition references column(s) ${missing.mkString(", ")} that " +
          s"base ${d.baseRoot} v$cur no longer carries — drop and redefine the MV")
    }
    if (cur <= w) return Refresh("noop", w, w, 0L, None)

    val canDiff = baseVs.contains(w) &&
      !Snapshots.hasDeleteVectors(spark, d.baseRoot, w) &&
      !Snapshots.hasDeleteVectors(spark, d.baseRoot, cur)
    if (!canDiff) {
      val mv = IncrementalView.countSum(
        Snapshots.read(spark, d.baseRoot, Some(cur)), d.groupCols, d.sumCols)
        .withColumn(GkCol, gk(d.groupCols))
      val buckets = mvBucketsOf(spark, mvRoot)
      val v = Snapshots.publishStreamBatch(spark, mvRoot, mv, batchId = cur,
        append = false, clusterBy = buckets.map(n => s"bucket($n,$GkCol)"))
      // group count from the published manifest's `#rows=` lines — the
      // aggregate already ran once for the publish, don't run it twice
      val groups = v.flatMap(ver =>
        Snapshots.countRows(spark, mvRoot, Some(ver))).getOrElse(0L)
      return Refresh("full", w, cur, groups, v)
    }

    val cdf = Snapshots.changes(spark, d.baseRoot, w, cur, d.baseKeyCols,
      preImages = true).persist()
    try {
      // every group the feed touches, once — both the apply target and
      // the tombstone candidate set
      val touched = cdf.select(
        (gk(d.groupCols).as(GkCol) +: d.groupCols.map(col)): _*).distinct().persist()
      try refreshIncremental(spark, mvRoot, d, cdf, touched, w, cur)
      finally touched.unpersist()
    } finally cdf.unpersist()
  }

  private def refreshIncremental(spark: SparkSession, mvRoot: String,
      d: Definition, cdf: DataFrame, touched: DataFrame,
      w: Int, cur: Int): Refresh = {
    val nTouched = touched.count()
    if (nTouched == 0) {
      // pure rewrite (compaction) under the base: move the watermark
      // with a no-op merge so the next refresh diffs from `cur`
      val v = Snapshots.mergeStreamBatch(spark, mvRoot,
        Snapshots.read(spark, mvRoot).limit(0).withColumn(TombCol, lit(false)),
        batchId = cur, keyCols = Seq(GkCol), tombstoneCol = Some(TombCol))
      return Refresh("incremental", w, cur, 0L, v)
    }
    // current MV rows at TOUCHED-BUCKET granularity: only files in the
    // touched groups' hash buckets can hold their rows (the same
    // routing agreement the merge's probe prune rests on), so the apply
    // side opens O(touched buckets) files, not the MV. No row-level
    // semi-join against `touched` here — it would embed the CDF's
    // attributes inside the apply join's left branch (an ambiguous
    // self-join); a bucketful's unchanged groups simply re-upsert their
    // identical rows into the files the merge rewrites anyway
    val mvV = Snapshots.versions(spark, mvRoot).last
    val mvFiles = Snapshots.files(spark, mvRoot, mvV)
    val inBuckets = Snapshots.clusterOf(spark, mvRoot, mvV)
      .flatMap(Snapshots.bucketSpec) match {
      case Some((n, c)) if c == GkCol =>
        val hit = touched
          .select(pmod(hash(col(GkCol)), lit(n)).cast("string").as("__b"))
          .distinct().collect().map(_.getString(0)).toSet
        val dirRe = "__cluster=([^/]+)/".r
        mvFiles.filter(f => dirRe.findFirstMatchIn(f).forall(m => hit(m.group(1))))
      case _ => mvFiles
    }
    val mvInBuckets = Snapshots.readFiles(spark, mvRoot, inBuckets,
      Snapshots.schemaOf(spark, mvRoot, mvV), s"mv v$mvV touched buckets")
      .drop(GkCol)
    val applied = IncrementalView.applyCountSum(mvInBuckets, cdf,
      d.groupCols, d.sumCols)
      .withColumn(GkCol, gk(d.groupCols))
    // groups the feed touched that no longer exist (count hit zero) —
    // EXCEPT, not an anti-join: both sides descend from the CDF, and a
    // set op carries no ambiguous column references
    val gone = touched.select(GkCol).except(applied.select(GkCol))
    val batch = applied.withColumn(TombCol, lit(false))
      .unionByName(gone.withColumn(TombCol, lit(true)), allowMissingColumns = true)
    val v = Snapshots.mergeStreamBatch(spark, mvRoot, batch, batchId = cur,
      keyCols = Seq(GkCol), tombstoneCol = Some(TombCol))
    Refresh("incremental", w, cur, nTouched, v)
  }

  /** The MV's bucket count from its live cluster header (None when the
    * layout was dropped — a full refresh then re-clusters with nothing).
    */
  private def mvBucketsOf(spark: SparkSession, mvRoot: String): Option[Int] = {
    val vs = Snapshots.versions(spark, mvRoot)
    vs.lastOption.flatMap(v => Snapshots.clusterOf(spark, mvRoot, v))
      .flatMap(Snapshots.bucketSpec(_).map(_._1))
  }
}
