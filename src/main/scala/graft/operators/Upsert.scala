package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

/** Partition-granular MERGE (upsert + delete) into a partitioned parquet
  * table — the warehouse mutation the reference could only express by
  * re-copying whole partitions (skip-if-exists, then overwrite), as one
  * Spark job that reads and rewrites ONLY the partitions the delta
  * touches, never the full table.
  *
  * Per-key semantics (classic MERGE):
  *   - WHEN MATCHED AND tombstone  THEN DELETE
  *   - WHEN MATCHED                THEN UPDATE (the delta row wins whole)
  *   - WHEN NOT MATCHED, no tombstone THEN INSERT
  *
  * Mechanics: the delta's distinct partition values (bounded — the
  * reference's own driver granularity, `CommonUtils.java:151-163`) prune
  * a static read of the destination; survivors (existing rows whose key
  * is absent from the delta) union the delta's non-tombstone rows; the
  * result stages to `<dest>.graft-upsert-tmp` and each touched partition
  * directory swaps in via rename (live → `.graft-upsert-bak` → delete),
  * the [[Compact.rewriteInPlacePartitioned]] discipline. A partition
  * whose last row was tombstoned is REMOVED (dynamic overwrite alone
  * cannot do that — it never touches a partition with no output rows).
  * Untouched partitions are never read, written, or renamed.
  *
  * CONTRACTS (documented, enforced where cheap):
  *   - a key's partition value is immutable: the delta carries the same
  *     partition value the key already has (true whenever the partition
  *     derives from an immutable attribute, e.g. the order date). A key
  *     whose partition "moved" into an UNTOUCHED partition would strand
  *     its old copy, because untouched partitions are by design never
  *     opened — so this contract is ENFORCED: per-partition key
  *     envelopes from parquet footers (metadata-only) prove most
  *     untouched partitions cannot hold a delta key; the few candidates
  *     the envelopes cannot clear are probed with a column-pruned
  *     key+partition read, and an actual moved key fails loudly before
  *     anything is written. (A key moving BETWEEN partitions the delta
  *     touches routes correctly — both partitions are rewritten and the
  *     global survivors anti-join drops the old copy.) Set
  *     `verifyKeyLocality = false` to skip the check when the partition
  *     column is derived from the key by construction;
  *   - key columns are non-null (standard MERGE precondition);
  *   - partition values must render path-stably via toString (the
  *     warehouse convention everywhere in this repo: string date keys).
  *
  * Crash safety: a crash before any rename leaves the destination
  * untouched (stage dir is discardable); a crash mid-swap leaves that
  * partition's original under `.graft-upsert-bak` — recovery is a
  * rename back, never data loss, and a later run refuses to start while
  * a bak exists.
  */
object Upsert {

  final case class Stats(partsTouched: Long, partsRemoved: Long, rowsWritten: Long)

  /** What the key-locality check COST, as evidence: of `untouchedParts`
    * partitions the merge never opens, `envelopeCleared` were proven
    * key-free at parquet-footer (metadata) cost and only
    * `candidateParts` needed a column-pruned row probe. A key-clustered
    * layout reports candidateParts = 0 — the contract check is
    * metadata-only at 100 TB.
    */
  final case class LocalityReport(untouchedParts: Long, envelopeCleared: Long,
      candidateParts: Long)

  def mergeByKey(
      spark: SparkSession,
      destPath: String,
      delta: DataFrame,
      keyCols: Seq[String],
      partNames: Seq[String],
      tombstoneCol: Option[String] = None,
      verifyKeyLocality: Boolean = true,
      onLocality: LocalityReport => Unit = _ => ()): Stats = {
    require(keyCols.nonEmpty, "mergeByKey needs at least one key column")
    require(partNames.nonEmpty, "mergeByKey is partition-granular: pass partNames")
    val fs = new Path(destPath).getFileSystem(spark.sparkContext.hadoopConfiguration)
    // a snapshot table's manifests reference the CURRENT files by path;
    // swapping partition directories in place would leave every existing
    // manifest pointing at swapped-away bytes — time travel silently
    // broken. The snapshot-preserving MERGE is Snapshots.mergeByKey.
    require(!fs.exists(new Path(destPath, "_snapshots")),
      s"$destPath is a versioned snapshot table (contains _snapshots) — " +
        "in-place partition swap would corrupt time travel; use " +
        "Snapshots.mergeByKey, which publishes the merge as a new version")

    // ONE materialization of the delta: the dup-key gate, the touched-
    // partition collect, the moved-key verification, the anti-join and
    // the rewrite union all read it — without a persist each action
    // re-runs the delta's full lineage (same discipline as
    // [[Snapshots.mergeByKey]]). MEMORY_AND_DISK spills instead of
    // OOMing; a caller-persisted delta is left alone.
    val ownPersist = delta.storageLevel ==
      org.apache.spark.storage.StorageLevel.NONE
    val deltaP = if (ownPersist)
      delta.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    else delta
    try {
    mergeByKeyImpl(spark, destPath, deltaP, keyCols, partNames, tombstoneCol,
      verifyKeyLocality, onLocality, fs)
    } finally if (ownPersist) deltaP.unpersist(blocking = false)
  }

  private def mergeByKeyImpl(
      spark: SparkSession,
      destPath: String,
      delta: DataFrame,
      keyCols: Seq[String],
      partNames: Seq[String],
      tombstoneCol: Option[String],
      verifyKeyLocality: Boolean,
      onLocality: LocalityReport => Unit,
      fs: org.apache.hadoop.fs.FileSystem): Stats = {
    // MERGE precondition: at most one delta row per key. An update row and
    // a tombstone row for the same key would otherwise resolve silently to
    // "update wins" (survivors drop the key; unionByName keeps every
    // non-tombstone delta row, duplicating keys with 2+ update rows) —
    // the classic ambiguous-source MERGE error, so fail loudly instead.
    val dupKey = delta.groupBy(keyCols.map(col): _*).count()
      .filter(col("count") > 1).limit(1).collect()
    require(dupKey.isEmpty,
      s"delta carries multiple rows for key (${keyCols.mkString(",")}) = " +
        s"(${dupKey.headOption.fold("")(r => keyCols.indices.map(i => String.valueOf(r.get(i))).mkString(","))}) — " +
        "MERGE source keys must be unique (dedupe or pre-resolve the delta)")

    val upserts = tombstoneCol.fold(delta)(tc =>
      delta.filter(!coalesce(col(tc), lit(false))).drop(tc))
    val dataCols = upserts.columns.toSeq

    // bootstrap: merging into a not-yet-existing table is a plain load
    if (!fs.exists(new Path(destPath))) {
      val obs = new org.apache.spark.sql.Observation()
      // rebalance, not strict repartition — same de-skew reasoning as the
      // staged write below
      upserts.observe(obs, count(lit(1)).as("rows"))
        .hint("rebalance", partNames.map(col): _*)
        .write.partitionBy(partNames: _*).mode("overwrite").parquet(destPath)
      return Stats(0L, 0L, obs.get("rows").asInstanceOf[Long])
    }

    // touched partition values — bounded: one row per partition
    val touched: Array[Row] = delta.select(partNames.map(col): _*).distinct().collect()
    if (touched.isEmpty) return Stats(0L, 0L, 0L)
    val pruneCond = touched.map(r => partNames.zipWithIndex.map { case (p, i) =>
      col(p) <=> lit(r.get(i)) }.reduce(_ && _)).reduce(_ || _)
    // align partition-column types to the delta's (the partitioned read
    // infers e.g. INT for yyyyMM string keys; the union must agree)
    val aligned = partNames.foldLeft(spark.read.parquet(destPath))((df, p) =>
      df.withColumn(p, col(p).cast(delta.schema(p).dataType)))
    if (verifyKeyLocality)
      failOnMovedKeys(spark, destPath, delta, keyCols, partNames, touched, aligned,
        onLocality)

    val existing = aligned.filter(pruneCond).select(dataCols.map(col): _*)
    val survivors = existing.join(
      delta.select(keyCols.map(col): _*).distinct(), keyCols, "left_anti")
    val merged = survivors.unionByName(upserts.select(dataCols.map(col): _*))

    // stage, then swap each touched partition directory
    val tmp = destPath + ".graft-upsert-tmp"
    fs.delete(new Path(tmp), true)
    val obs = new org.apache.spark.sql.Observation()
    // REBALANCE, not a strict repartition(partCols): the strict form
    // funnels every row of one partition value through ONE task — a hot
    // partition of a 100 TB table becomes an unbounded single-task fetch
    // plus a serial encode. Under AQE the rebalance hash-partitions on
    // the same columns, then splits oversized groups at map-chunk
    // boundaries (several files in one partition dir — a normal
    // partitioned-parquet shape) and coalesces cold ones whole.
    merged.observe(obs, count(lit(1)).as("rows"))
      .hint("rebalance", partNames.map(col): _*)
      .write.partitionBy(partNames: _*).mode("overwrite").parquet(tmp)
    val rows = obs.get("rows").asInstanceOf[Long]

    def leaf(root: String, r: Row): Path = new Path(root + "/" +
      partNames.zipWithIndex.map { case (p, i) =>
        p + "=" + Option(r.get(i)).map(_.toString).getOrElse("__HIVE_DEFAULT_PARTITION__")
      }.mkString("/"))
    touched.foreach { r =>
      val bak = new Path(leaf(destPath, r).toString + ".graft-upsert-bak")
      require(!fs.exists(bak),
        s"$bak exists — a previous merge crashed mid-swap; restore or delete it first")
    }
    var removed = 0L
    touched.foreach { r =>
      val live = leaf(destPath, r)
      val staged = leaf(tmp, r)
      val bak = new Path(live.toString + ".graft-upsert-bak")
      val hadOld = fs.exists(live)
      if (hadOld && !fs.rename(live, bak))
        throw new java.io.IOException(s"rename $live -> $bak failed")
      if (fs.exists(staged)) {
        fs.mkdirs(live.getParent)
        if (!fs.rename(staged, live)) {
          if (hadOld) fs.rename(bak, live) // roll this partition back
          throw new java.io.IOException(s"rename $staged -> $live failed; original restored")
        }
      } else if (hadOld) removed += 1 // every row tombstoned: partition gone
      // a stale bak permanently blocks every future merge touching this
      // partition (the pre-flight require refuses to start), so a failed
      // delete must surface HERE, on the merge that caused it
      if (fs.exists(bak) && !fs.delete(bak, true))
        throw new java.io.IOException(
          s"swap for $live succeeded but deleting $bak failed — remove it " +
            "manually or every future merge touching this partition will refuse to start")
    }
    val tmpPath = new Path(tmp)
    if (fs.exists(tmpPath) && !fs.delete(tmpPath, true))
      throw new java.io.IOException(s"merge succeeded but deleting stage dir $tmp failed")
    Stats(touched.length.toLong, removed, rows)
  }

  private val NullDir = "__HIVE_DEFAULT_PARTITION__"

  /** Enforce the partition-immutability contract: fail loudly (BEFORE any
    * write) if a delta key already lives in a partition the delta does
    * not touch — the merge would strand that copy. Metadata-first:
    *
    *   1. per-untouched-partition envelopes `[min,max]` of each numeric
    *      key column from parquet FOOTERS only (one distributed
    *      footer-read job, no data pages);
    *   2. one pass over the delta joins keys against the (bounded,
    *      broadcast) envelope table — partitions whose envelopes cannot
    *      hold any delta key are cleared at metadata cost;
    *   3. only the candidate partitions the envelopes cannot clear get a
    *      row-level probe: a column-pruned key+partition read semi-joined
    *      with the delta, any key found under a different partition value
    *      throws with the evidence.
    *
    * A key-clustered layout (key correlates with the partition — the
    * 100 TB shape this operator targets) proves immobility in step 2; a
    * fully uncorrelated or non-numeric-keyed table degrades to the honest
    * minimum, a key-column scan of the candidate partitions. Key columns
    * that ARE partition columns check by equality with the directory
    * value (data files do not store them).
    */
  private def failOnMovedKeys(
      spark: SparkSession,
      destPath: String,
      delta: DataFrame,
      keyCols: Seq[String],
      partNames: Seq[String],
      touched: Array[Row],
      aligned: DataFrame,
      onLocality: LocalityReport => Unit): Unit = {
    import org.apache.spark.sql.types._

    val touchedSet: Set[Seq[String]] = touched.map(r =>
      partNames.indices.map(i => Option(r.get(i)).map(_.toString).orNull)).toSet

    // data key columns with footer-usable numeric stats; everything else
    // stays "unknown" (probed, never silently cleared)
    val dataKeyCols = keyCols.filterNot(partNames.contains)
    val numericOk: Seq[Boolean] = dataKeyCols.map(k => delta.schema(k).dataType match {
      case ByteType | ShortType | IntegerType | LongType | FloatType | DoubleType => true
      case _ => false
    })

    val envRows: Seq[Row] =
      untouchedEnvelopes(spark, destPath, dataKeyCols, numericOk, partNames, touchedSet)
    if (envRows.isEmpty) { // every existing partition is being rewritten
      onLocality(LocalityReport(0L, 0L, 0L))
      return
    }

    val envSchema = StructType(
      partNames.indices.map(j => StructField(s"__env_p$j", StringType, nullable = true)) ++
        dataKeyCols.indices.flatMap(i => Seq(
          StructField(s"__env_min$i", DoubleType, nullable = true),
          StructField(s"__env_max$i", DoubleType, nullable = true),
          StructField(s"__env_unk$i", BooleanType, nullable = false))))
    val envDf = spark.createDataFrame(
      scala.jdk.CollectionConverters.SeqHasAsJava(envRows).asJava, envSchema)

    val contained = {
      val dataConds = dataKeyCols.zipWithIndex.map { case (k, i) =>
        col(s"__env_unk$i") ||
          (col(s"__env_min$i").isNotNull &&
            col(k).cast("double") >= col(s"__env_min$i") &&
            col(k).cast("double") <= col(s"__env_max$i"))
      }
      val partKeyConds = keyCols.filter(partNames.contains).map { k =>
        col(k).cast("string") <=> col(s"__env_p${partNames.indexOf(k)}")
      }
      (dataConds ++ partKeyConds).reduceOption(_ && _).getOrElse(lit(true))
    }
    // envelope rows are untouched partitions only, so any containment hit
    // is by construction a foreign partition — no same-partition exclusion
    val candidates: Array[Row] = delta
      .select((keyCols ++ partNames).distinct.map(col): _*)
      .join(broadcast(envDf), contained, "inner")
      .select(partNames.indices.map(j => col(s"__env_p$j")): _*)
      .distinct().collect()
    onLocality(LocalityReport(envRows.size.toLong,
      (envRows.size - candidates.length).toLong, candidates.length.toLong))
    if (candidates.isEmpty) return // proven at footer cost: no key moved

    // row-level probe of ONLY the candidate partitions
    val candCond = candidates.map(r => partNames.zipWithIndex.map { case (p, j) =>
      col(p).cast("string") <=> lit(r.getString(j)) }.reduce(_ && _)).reduce(_ || _)
    val foreign = aligned.filter(candCond)
      .select(keyCols.map(col) ++
        partNames.map(p => col(p).cast("string").as(s"__dest_$p")): _*)
    val deltaKeyed = delta.select(keyCols.map(col) ++
      partNames.map(p => col(p).cast("string").as(s"__delta_$p")): _*)
    val hit = foreign.join(deltaKeyed, keyCols.toSeq, "inner")
      .filter(partNames.map(p =>
        !(col(s"__dest_$p") <=> col(s"__delta_$p"))).reduce(_ || _))
      .limit(1).collect()
    hit.headOption.foreach { r =>
      val key = keyCols.map(k => s"$k=${r.get(r.fieldIndex(k))}").mkString(", ")
      val from = partNames.map(p => s"$p=${r.get(r.fieldIndex(s"__dest_$p"))}").mkString("/")
      val to = partNames.map(p => s"$p=${r.get(r.fieldIndex(s"__delta_$p"))}").mkString("/")
      throw new IllegalStateException(
        s"moved key: delta routes ($key) to partition $to but it already " +
          s"lives in untouched partition $from of $destPath — merging would " +
          "strand the old copy. Rewrite the delta with the key's existing " +
          "partition value (or tombstone it there first); pass " +
          "verifyKeyLocality = false only if the partition is derived from " +
          "the key by construction")
    }
  }

  /** Per-partition key envelopes for every partition NOT in `touchedSet`,
    * from parquet footers only. One Row per untouched partition:
    * `(partVals..., (min, max, unknown) per data key col)`. `unknown`
    * means the footer cannot bound the column (non-numeric key, stats
    * missing) — the caller must probe, never clear. A column absent from
    * a file's footer (pre-evolution schema) holds only nulls there and
    * bounds nothing.
    */
  private def untouchedEnvelopes(
      spark: SparkSession,
      destPath: String,
      dataKeyCols: Seq[String],
      numericOk: Seq[Boolean],
      partNames: Seq[String],
      touchedSet: Set[Seq[String]]): Seq[Row] = {
    val rootPath = new Path(destPath)
    val fs = rootPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val rootUri = fs.makeQualified(rootPath).toString
    val files = scala.collection.mutable.ArrayBuffer.empty[(String, Seq[String])]
    val it = fs.listFiles(rootPath, true)
    while (it.hasNext) {
      val f = it.next()
      val rel = f.getPath.toString.stripPrefix(rootUri).stripPrefix("/")
      val segs = rel.split('/')
      val hidden = segs.exists(s => s.startsWith("_") || s.startsWith("."))
      if (!hidden) {
        val partVals: Seq[String] = segs.dropRight(1)
          .filter(seg => partNames.exists(n => seg.startsWith(n + "=")))
          .map { seg =>
            val v = org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
              .unescapePathName(seg.substring(seg.indexOf('=') + 1))
            if (v == NullDir) null else v
          }.toSeq
        if (partVals.size == partNames.size && !touchedSet.contains(partVals))
          files += ((f.getPath.toString, partVals))
      }
    }
    if (files.isEmpty) return Nil

    // all-unknown envelopes need no footer job — partition identity alone
    if (dataKeyCols.isEmpty || numericOk.forall(!_)) {
      return files.map(_._2).distinct.map { pv =>
        Row.fromSeq(pv ++ dataKeyCols.flatMap(_ => Seq(null, null, true)))
      }.toSeq
    }

    import spark.implicits._
    val confBc = spark.sparkContext.broadcast(
      new org.apache.spark.util.SerializableConfiguration(
        spark.sparkContext.hadoopConfiguration))
    val cols = dataKeyCols
    val numOk = numericOk
    val perFile = spark.createDataset(files.toSeq.map { case (p, pv) => (p, pv) })
      .repartition(math.max(1,
        math.min(files.size, spark.sparkContext.defaultParallelism)))
      .map { case (p, pv) =>
        val conf = confBc.value.value
        val in = org.apache.parquet.hadoop.util.HadoopInputFile
          .fromPath(new Path(p), conf)
        val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
        try {
          val blocks = scala.jdk.CollectionConverters.ListHasAsScala(
            r.getFooter.getBlocks).asScala.toSeq
          val rows = r.getRecordCount
          val perCol: Seq[(Option[Double], Option[Double], Boolean)] =
            cols.zipWithIndex.map { case (c, i) =>
              if (!numOk(i)) (None, None, true)
              else {
                val chunks = blocks.flatMap(b =>
                  scala.jdk.CollectionConverters.ListHasAsScala(b.getColumns).asScala
                    .find(_.getPath.toDotString == c).map(_.getStatistics))
                def num(v: Any): Option[Double] = v match {
                  case x: java.lang.Integer => Some(x.toDouble)
                  case x: java.lang.Long => Some(x.toDouble)
                  case x: java.lang.Float => Some(x.toDouble)
                  case x: java.lang.Double => Some(x.doubleValue())
                  case _ => None
                }
                val present = chunks.filter(s => s != null && s.hasNonNullValue)
                if (chunks.isEmpty) (None, None, false) // column absent: all null
                else if (present.isEmpty)
                  // stats missing vs genuinely all-null is indistinguishable
                  // here: unknown unless the file is empty
                  (None, None, rows > 0)
                else {
                  val mins = present.map(s => num(s.genericGetMin))
                  val maxs = present.map(s => num(s.genericGetMax))
                  if (mins.exists(_.isEmpty) || maxs.exists(_.isEmpty))
                    (None, None, true) // non-numeric physical stats
                  else (Some(mins.flatten.min), Some(maxs.flatten.max), false)
                }
              }
            }
          (pv, perCol)
        } finally r.close()
      }
    perFile.collect().toSeq
      .groupBy(_._1)
      .map { case (pv, fileRows) =>
        def both(o1: Option[Double], o2: Option[Double],
            f: (Double, Double) => Double): Option[Double] = (o1, o2) match {
          case (Some(x), Some(y)) => Some(f(x, y))
          case _ => o1.orElse(o2)
        }
        val folded = fileRows.map(_._2).reduce { (a, b) =>
          a.zip(b).map { case ((m1, x1, u1), (m2, x2, u2)) =>
            (both(m1, m2, math.min), both(x1, x2, math.max), u1 || u2)
          }
        }
        Row.fromSeq(pv ++ folded.flatMap { case (m, x, u) =>
          Seq(m.orNull, x.orNull, u) })
      }.toSeq
  }
}
