package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every `SparkEntry.queries` entry against
  * `SPARK_GRAFT_SF_DIR` and emits ONE JSON line.
  *
  * Robustness contract (a bench artifact that can lie is worse than none):
  *   - a query that THROWS is recorded in `"failures"` with its error —
  *     never as a fast success — and the process exits non-zero;
  *   - each query's recorded time is the MIN of `k` runs (default 3,
  *     `SPARK_GRAFT_BENCH_K`): min is the standard noise-floor estimator —
  *     a single run can absorb a GC/JIT spike and distort a whole round
  *     (an earlier artifact recorded 13.2 s for a query that measures
  *     1.18 s fresh);
  *   - `"queries_runs"` keeps every raw timing so variance stays visible;
  *   - before the timed runs, ONE artifact-COLD pass runs from a wiped
  *     scratch/model root and is recorded as `"queries_cold"` /
  *     `"total_cold"`: several queries reuse materialized per-corpus
  *     artifacts (dedup pair graph, ANN centroids/codebooks, media
  *     features), so warm min-of-k alone would hide the build cost a
  *     fresh production run pays;
  *   - `SPARK_GRAFT_ONLY` must name real queries: unknown or empty names
  *     fail loudly (a typo would otherwise produce an empty artifact with
  *     rc 0), and any filtered artifact carries `"filtered":true`;
  *   - the HEADLINE `value`/`total_cold` are per-query min-of-runs FOLDS
  *     across this CODE STATE's stamped full runs (git HEAD + dirty-diff
  *     digest stamped into every detail file; only byte-identical code
  *     folds together, so a stale pre-change run can never mask a
  *     regression), with this run's raw sums as `*_thisrun`;
  *   - stdout gets a COMPACT line (short query keys, 2-decimal seconds,
  *     slowest-first, hard 1700-byte budget with an explicit
  *     `queries_omitted` count) because the recording harness keeps only
  *     the last 2000 bytes of output; the full-fidelity artifact (full
  *     names, per-run timings, cold pass) is written to
  *     `BENCH_DETAIL.json` and its path carried in the compact line.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val k = sys.env.getOrElse("SPARK_GRAFT_BENCH_K", "3").toInt
    val spark = SparkEnv.configure(SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(new GraftExtensions) // MV routing + SQL functions
      .config("spark.sql.shuffle.partitions", cpus))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // materialize to the noop sink: every column is computed and serialized
    // (under .count() Catalyst prunes unused projections, so pure projection
    // queries would go partially unmeasured)
    def materialize(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    // per-run hygiene: measure the QUERY, not the residue of everything
    // that ran before it — cached tables and retained checkpoint blocks
    // (each query builds its state fresh; cross-query reuse is all
    // on-disk artifacts, so dropping block-manager state is safe)
    def hygiene(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    }
    def loadAvg(): Double =
      java.lang.management.ManagementFactory.getOperatingSystemMXBean.getSystemLoadAverage
    // the sandbox's VISIBLE cpu quota fluctuates between runs (observed
    // 4/8/32 across one round) — stamping it is what lets a reader tell
    // weather from plan change without re-litigating every delta
    def cgroupQuota(): String = try {
      val v2 = java.nio.file.Paths.get("/sys/fs/cgroup/cpu.max")
      val v1q = java.nio.file.Paths.get("/sys/fs/cgroup/cpu/cpu.cfs_quota_us")
      if (java.nio.file.Files.exists(v2)) {
        val parts = new String(java.nio.file.Files.readAllBytes(v2)).trim.split("\\s+")
        if (parts(0) == "max") "max"
        else f"${parts(0).toDouble / parts(1).toDouble}%.2f"
      } else if (java.nio.file.Files.exists(v1q)) {
        val q = new String(java.nio.file.Files.readAllBytes(v1q)).trim.toLong
        val p = new String(java.nio.file.Files.readAllBytes(
          java.nio.file.Paths.get("/sys/fs/cgroup/cpu/cpu.cfs_period_us"))).trim.toLong
        if (q < 0) "max" else f"${q.toDouble / p}%.2f"
      } else "unknown"
    } catch { case _: Throwable => "unknown" }
    // warm-up: JVM/codegen/parquet-footer costs land here, not on the first
    // timed query (measured ~3.5s on a cold session)
    spark.range(1000000).selectExpr("sum(id)").collect()
    SparkEntry.queries.headOption.foreach { case (_, fn) =>
      try materialize(fn(spark, sfDir)) catch { case _: Throwable => () }
    }
    def esc(s: String): String =
      s.replace("\\", "\\\\").replace("\"", "\\\"").replace("\n", " ").take(300)
    // Query filter, from CLI args and/or SPARK_GRAFT_ONLY=q101_x,q102_y
    // (single-query iteration) — both validated against the real query
    // names, because a silently-ignored typo (or, as round 10 proved,
    // silently-ignored ARGS) yields an artifact indistinguishable from a
    // full run except by reading the recorded names. Args and env merge
    // (union) when both are given.
    def parseNames(what: String, v: Seq[String]): Set[String] = {
      val names = v.flatMap(_.split(",")).map(_.trim).filter(_.nonEmpty).toSet
      require(names.nonEmpty,
        s"$what is set but names no queries (empty after trimming)")
      val unknown = names.diff(SparkEntry.queries.keySet)
      require(unknown.isEmpty,
        s"$what names unknown queries: ${unknown.toSeq.sorted.mkString(",")}")
      names
    }
    val only: Option[Set[String]] = {
      val fromArgs =
        if (args.isEmpty) None else Some(parseNames("args", args.toSeq))
      val fromEnv = sys.env.get("SPARK_GRAFT_ONLY")
        .map(v => parseNames("SPARK_GRAFT_ONLY", Seq(v)))
      (fromArgs, fromEnv) match {
        case (Some(a), Some(e)) => Some(a ++ e)
        case (a, e)             => a.orElse(e)
      }
    }
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }

    // artifact-cold pass: wipe the per-corpus artifact roots (NOT the
    // per-query scratch under graft-ops — that is plain query output) so
    // the first toucher of each artifact pays its build, exactly like a
    // fresh production run; later timed runs then measure the warm shape
    val tmp = sys.props("java.io.tmpdir")
    Seq(s"$tmp/graft-scratch", s"$tmp/graft-models").foreach { root =>
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
    }
    val loadStart = loadAvg()
    val quotaStart = cgroupQuota()
    val cold = selected.map { case (name, fn) =>
      hygiene()
      val t0 = System.nanoTime()
      try { materialize(fn(spark, sfDir)); name -> Right((System.nanoTime() - t0) / 1e9) }
      catch { case e: Throwable =>
        name -> Left(s"${e.getClass.getSimpleName}: ${e.getMessage}") }
    }

    // the write-heavy migrate/compact roundtrips are the noisiest lines
    // round-over-round (real FS writes); give min-of-k more samples there
    val heavyK = Set("q56_two_level_roundtrip", "q101_zorder_roundtrip")
    val results = selected.map { case (name, fn) =>
      val kq = if (heavyK(name)) math.max(k, 5) else k
      def run(): Either[String, Double] = {
        hygiene()
        val t0 = System.nanoTime()
        try { materialize(fn(spark, sfDir)); Right((System.nanoTime() - t0) / 1e9) }
        catch { case e: Throwable => Left(s"${e.getClass.getSimpleName}: ${e.getMessage}") }
      }
      var outcomes = (1 to kq).map(_ => run())
      // variance guard: a >2x max/min spread means at least one run
      // absorbed interference (GC, a co-tenant process, a first-touch JIT)
      // — min-of-k is then one unlucky draw away from recording the noise;
      // take up to 3 extra samples until the spread settles, so
      // round-over-round deltas compare plan costs, not machine weather.
      // The spread is evaluated over the TRAILING kq runs only — an early
      // outlier ages out of the window, so the guard can actually
      // converge instead of always burning all 3 extras once any spike
      // lands. All raw runs stay visible in queries_runs.
      var extra = 0
      def spreadOver2(ts: Seq[Double]) = ts.nonEmpty && ts.max > 2 * ts.min
      def trailing = outcomes.takeRight(kq).collect { case Right(t) => t }
      while (extra < 3 && outcomes.forall(_.isRight) && spreadOver2(trailing)) {
        outcomes = outcomes :+ run()
        extra += 1
      }
      (name, outcomes.collect { case Right(t) => t }, outcomes.collectFirst { case Left(m) => m })
    }
    val loadEnd = loadAvg()
    val failurePairs = (results.collect { case (name, _, Some(err)) => name -> err } ++
        cold.collect { case (name, Left(err)) => name -> err }).distinct
    val failures = failurePairs
      .map { case (name, err) => s"""{"query":"$name","error":"${esc(err)}"}""" }
    // a query that failed in EITHER pass is excluded from BOTH totals, so
    // total and total_cold always cover the same query set (its cold slot
    // records an explicit null) — otherwise a cold-only failure leaves its
    // warm timings looking authoritative while total_cold silently sums
    // fewer queries than total
    val failedNames = failurePairs.map(_._1).toSet
    val ok = results.filter { case (n, _, err) => err.isEmpty && !failedNames(n) }
    val qs = ok.map { case (n, ts, _) => s"\"$n\":${ts.min}" }.mkString("{", ",", "}")
    val runs = ok.map { case (n, ts, _) => s"\"$n\":[${ts.mkString(",")}]" }
      .mkString("{", ",", "}")
    val qsCold = cold.map {
      case (n, Right(t)) if !failedNames(n) => s"\"$n\":$t"
      case (n, _)                           => s"\"$n\":null"
    }.mkString("{", ",", "}")
    val total = ok.map(_._2.min).sum
    val totalCold = cold.collect { case (n, Right(t)) if !failedNames(n) => t }.sum

    // CODE identity stamp: the min-of-runs fold must never reach across a
    // code change — "same query set" is NOT "same code" (a commit can
    // change engine internals without touching query names, and folding a
    // pre-change run's faster minima would mask the regression). The id
    // digests the TREE OBJECTS of the bench-relevant paths — src/main,
    // build.sbt, project/ — NOT the commit sha: test-only and doc-only
    // commits leave those trees byte-identical, so a round-close commit
    // that touched a spec or STATUS.md still folds with the last run at
    // the same engine code (the r14 headline lost its fold exactly this
    // way: the digest spanned src/test). A dirty working tree appends a
    // digest of the same paths' diff. Only byte-identical CODE states
    // fold together; "unknown" (no git) never folds with anything.
    val codeId: String = try {
      def run(cmd: String*): (Int, String) = {
        val p = new ProcessBuilder(cmd: _*).redirectErrorStream(true).start()
        val out = new String(p.getInputStream.readAllBytes(), "UTF-8").trim
        (p.waitFor(), out)
      }
      // scripts/ is deliberately OUTSIDE the identity: everything there
      // is post-processing of bench artifacts (selfcheck, doc-count
      // regeneration, detail formatting) that runs after the JVM exits —
      // nothing on the timed path reads it
      val codePaths = Seq("src/main", "build.sbt", "project")
      val treeIds = codePaths.map(p => run("git", "rev-parse", s"HEAD:$p"))
      if (treeIds.exists { case (rc, out) => rc != 0 || !out.matches("[0-9a-f]{40}") })
        "unknown"
      else {
        val md5 = (s: String) => java.security.MessageDigest.getInstance("MD5")
          .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
        val treeId = "t" + md5(treeIds.map(_._2).mkString("\n")).take(16)
        val (rc2, st) = run(Seq("git", "status", "--porcelain", "-uall", "--") ++ codePaths: _*)
        if (rc2 != 0) "unknown"
        else if (st.isEmpty) treeId
        else {
          val (_, diff) = run(Seq("git", "diff", "HEAD", "--") ++ codePaths: _*)
          // `git diff HEAD` omits UNTRACKED content — two different
          // uncommitted bodies of the same new file would otherwise fold
          // together on pathname alone. Hash each untracked file's bytes
          // into the dirty digest (-uall above lists files, not dirs).
          val untracked = st.linesIterator.filter(_.startsWith("??"))
            .map(_.drop(3).trim).toSeq.sorted.map { p =>
              val (rcH, h) = run("git", "hash-object", "--", p)
              s"$p:${if (rcH == 0) h else "unhashable"}"
            }.mkString("\n")
          treeId + "+" + md5(st + "\n" + diff + "\n" + untracked).take(12)
        }
      }
    } catch { case _: Throwable => "unknown" }

    // MIN-OF-RUNS round summary — the HEADLINE `value`: the box's weather
    // band is bimodal (±12-15% across same-code runs, cpu quota
    // fluctuating), so an artifact headlining whichever run happened LAST
    // keeps re-litigating weather as regression. Fold per-query MIN (warm
    // and cold separately) across this code state's stamped full runs,
    // this run included. A prior file is eligible only when it covers the
    // SAME sf, is unfiltered, carries EVERY current query, and was
    // produced by the SAME code id — never across any code change, even
    // one that left the query set intact.
    val curWarm = ok.map { case (n, ts, _) => n -> ts.min }.toMap
    val curCold = cold.collect { case (n, Right(t)) if !failedNames(n) => n -> t }.toMap
    val (foldWarmMap, foldColdMap, minRunsFiles) = try {
      val om = new com.fasterxml.jackson.databind.ObjectMapper()
      var warm = curWarm
      var coldM = curCold
      var used = 0
      val it = java.nio.file.Files.list(java.nio.file.Paths.get(".")).iterator()
      while (it.hasNext) {
        val p = it.next()
        if (p.getFileName.toString.matches("BENCH_DETAIL_\\d{8}-\\d{6}\\.json")) {
          try {
            val node = om.readTree(p.toFile)
            val qnode = node.path("queries")
            if (node.path("sf").asText() == sfDir &&
                !node.path("filtered").asBoolean(true) &&
                codeId != "unknown" &&
                node.path("code").asText("") == codeId &&
                curWarm.keysIterator.forall(qnode.has)) {
              used += 1
              warm = warm.map { case (n, v) => n -> math.min(v, qnode.get(n).asDouble) }
              val cnode = node.path("queries_cold")
              coldM = coldM.map { case (n, v) =>
                val c = cnode.path(n)
                n -> (if (c.isNumber) math.min(v, c.asDouble) else v)
              }
            }
          } catch { case _: Throwable => () }
        }
      }
      (warm, coldM, used)
    } catch { case _: Throwable => (curWarm, curCold, 0) }
    val foldWarm = foldWarmMap.values.sum
    val foldCold = foldColdMap.values.sum

    // Full-fidelity artifact → sidecar file. The harness that records the
    // bench keeps only the LAST 2000 bytes of stdout: with 125+ queries the
    // one-line JSON is ~10 KB, so rounds 4 and 5 were recorded with
    // "parsed": null — the detailed numbers existed only in a truncated
    // tail. Detail goes to BENCH_DETAIL.json; stdout gets a compact line
    // guaranteed to fit the tail window. The detail's value/total_cold are
    // THIS run's raw sums (the fold's inputs live here); the headline
    // stdout line carries the fold.
    // environment stamp: comparisons across rounds are only meaningful
    // when the machine was similarly loaded — loadavg ~cpus means the
    // bench shared the box and its numbers carry that noise
    val env = s""""env":{"cpus":"$cpus","load_start":$loadStart,""" +
      s""""load_end":$loadEnd,"jvm_procs":${Runtime.getRuntime.availableProcessors},""" +
      s""""cgroup_cpu_quota_start":"$quotaStart","cgroup_cpu_quota_end":"${cgroupQuota()}"}"""
    // queries = THIS run's minima (a fold input); queries_fold = the
    // min-of-runs fold beside it, labeled — a reader diffing artifacts
    // per-query must see fold against fold, not whichever run was noisiest
    val qsFold = foldWarmMap.toSeq.sortBy(_._1)
      .map { case (n, t) => s"\"$n\":$t" }.mkString("{", ",", "}")
    val detail = s"""{"metric":"total","value":$total,"unit":"sec","k":$k,""" +
      s""""total_cold":$totalCold,"filtered":${only.nonEmpty},"code":"$codeId",$env,""" +
      s""""queries":$qs,"queries_fold":$qsFold,"queries_runs":$runs,"queries_cold":$qsCold,""" +
      s""""failures":[${failures.mkString(",")}],"sf":"$sfDir"}"""
    // per-run STAMPED detail file (plus a latest-pointer copy at the
    // legacy name): round 10's verification bench clobbered the driver's
    // round artifact because both wrote the same BENCH_DETAIL.json — a
    // unique path per run makes that impossible, and the compact stdout
    // line carries the stamped path so the right detail is always findable
    val stamp = java.time.format.DateTimeFormatter.ofPattern("yyyyMMdd-HHmmss")
      .withZone(java.time.ZoneOffset.UTC).format(java.time.Instant.now())
    val detailPath =
      java.nio.file.Paths.get(s"BENCH_DETAIL_$stamp.json").toAbsolutePath
    java.nio.file.Files.write(detailPath, (detail + "\n").getBytes("UTF-8"))
    java.nio.file.Files.write(java.nio.file.Paths.get("BENCH_DETAIL.json"),
      (detail + "\n").getBytes("UTF-8"))

    // Compact stdout line: qNNN keys (unique by construction — names are
    // qN_*), 2-decimal seconds, slowest-first, and a hard byte budget with
    // an explicit omitted-count so truncation is visible, never silent.
    def short(n: String): String = "^q\\d+".r.findFirstIn(n).getOrElse(n)
    def r2(t: Double): String = f"$t%.2f"
    // the stdout per-query map carries the FOLD (same semantics as the
    // headline `value`), so per-query artifact diffs compare fold to
    // fold; this-run values live in the detail file's `queries`
    val entriesCompact = foldWarmMap.toSeq.map { case (n, t) => short(n) -> t }
      .sortBy(-_._2).map { case (n, t) => s"\"$n\":${r2(t)}" }
    val budget = 1700 // tail window 2000 minus sbt's trailing lines
    // headline `value`/`total_cold` are the min-of-runs FOLDS (reproducible
    // across same-code runs without a reader consulting the detail files);
    // the single-run sums ride along as *_thisrun for weather visibility.
    // The metric NAME says so — "total_minruns", not "total" — because
    // pre-r13 artifacts' `value` was a single-run sum and a cross-round
    // reader must see the semantic break, not silently compare the two;
    // the code id rides along so any quoted fold names what it folds over.
    // jvm_procs/master stamp what the JVM ACTUALLY got vs what the env
    // asked for: the sandbox's visible cpu quota fluctuates, so a low-core
    // comparison run can only be interpreted against the real processor
    // count — a ≈1 scaling ratio with equal jvm_procs on both runs is
    // cgroup weather, not a serial plan (additions-only to the line; the
    // SPARK_GRAFT_CPUS/SF_DIR contract and line shape are untouched)
    val head = s"""{"metric":"total_minruns","value":${r2(foldWarm)},"unit":"sec","k":$k,""" +
      s""""total_cold":${r2(foldCold)},"filtered":${only.nonEmpty},""" +
      s""""value_thisrun":${r2(total)},"total_cold_thisrun":${r2(totalCold)},""" +
      s""""minruns_files":$minRunsFiles,"code":"$codeId",""" +
      s""""load":${r2(loadStart)},"cgroup_cpu_quota":"$quotaStart",""" +
      s""""jvm_procs":${Runtime.getRuntime.availableProcessors},""" +
      s""""master":"local[$cpus]",""" +
      s""""detail":"$detailPath","failures":[${failures.mkString(",")}],""" +
      s""""sf":"$sfDir","queries":"""
    val fixedOverhead = head.length + 60 // closing brace + omitted marker slack
    var used = 0
    val kept = entriesCompact.takeWhile { e =>
      used += e.length + 1; used + fixedOverhead < budget
    }
    val omitted = entriesCompact.size - kept.size
    println(head + kept.mkString("{", ",", "}") +
      s""","queries_omitted":$omitted}""")
    spark.stop()
    if (failures.nonEmpty) sys.exit(1)
  }
}
