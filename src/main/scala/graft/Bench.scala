package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: times every registry query at
  * `SPARK_GRAFT_SF_DIR` and emits ONE JSON line.
  *
  * Measurement rules:
  *   - Each query is executed through a `noop`-format write, not `count()`:
  *     a count lets Catalyst prune every projection the count doesn't need,
  *     which would time map-only pipelines (text scoring, enrichment) as
  *     bare scans. The noop sink materializes every output column, so the
  *     timing covers the full expression pipeline, while writing nothing.
  *   - A small untimed warmup absorbs one-time JVM/codegen infrastructure
  *     startup so it isn't billed to whichever query runs first.
  *   - Each query runs TWICE and the reported figure is the MIN of the two
  *     (both are emitted: `queries` = min, `queries_first` = first run).
  *     Round 3 proved single-shot timing untrustworthy on a shared box: the
  *     driver recorded q26 at 56.7 s while its strict superset q48 ran in
  *     21.1 s — first-compile of stages the warmup didn't cover plus an
  *     ambient co-resident spike, all billed to one query. The min of two
  *     runs bounds one-time costs and one-off spikes; a real regression
  *     shows up in both runs.
  *   - The two attempts are INTERLEAVED as full-suite passes (pass A over
  *     all queries, then pass B; per-query min across passes), not run
  *     back-to-back. Round 4 showed why: a sustained multi-minute ambient
  *     window (the driver's co-resident DuckDB differential) landed on BOTH
  *     back-to-back attempts of the alphabetically-consecutive q42–q47
  *     stretch and survived the min, manufacturing a fake 2-5× regression
  *     on paths with zero code change. With suite-wide passes the same
  *     wall-clock window covers DIFFERENT queries in pass A vs pass B, so
  *     the min sheds it.
  *   - A fixed tiny canary query is re-timed every few queries and its
  *     timings are emitted (`canary`); a flat canary certifies quiet
  *     conditions, a spiky one makes an ambient-load window visible in the
  *     artifact instead of deniable.
  *   - The JSON line goes to stdout AND to a file (`SPARK_GRAFT_BENCH_OUT`,
  *     default `BENCH_OUT.json` in the working directory) — sbt wraps
  *     stdout in `[info]` noise that broke the driver's parse in round 1.
  */
object Bench {

  private[graft] def medianOf(xs: Seq[Double]): Double = {
    val w = xs.sorted
    if (w.isEmpty) -1.0 else w(w.size / 2)
  }

  /** Extract the host-drift reference (the canary median) from a committed
    * BENCH artifact's text; -1 when absent, unparseable, or timed at a
    * different SF (the canary's quiet floor scales with SF, so a
    * cross-SF median is not a host-speed reference). Extracted so
    * `BenchDriftParseSpec` can pin these regexes to the exact renderFull
    * format — a silent format drift here would disable the drift flag
    * with no visible failure (r15 advice).
    */
  private[graft] def parseDriftReference(txt: String, sfDir: String): Double = {
    val sameSf = """"sf":"([^"]*)"""".r.findFirstMatchIn(txt)
      .exists(_.group(1) == sfDir)
    if (!sameSf) -1.0
    else """"canary_median":([0-9.]+)""".r.findFirstMatchIn(txt)
      .map(_.group(1).toDouble).filter(_ > 0)
      .orElse { // pre-field artifacts: derive from the stored series
        """"canary":\[([^\]]*)\]""".r.findFirstMatchIn(txt)
          .map(_.group(1).split(',').drop(1).toSeq
            .flatMap(_.trim.toDoubleOption))
          .filter(_.nonEmpty).map(medianOf)
      }.getOrElse(-1.0)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // A SPARK_GRAFT_BENCH_ONLY-filtered iteration run must NOT overwrite the
    // full-registry artifact: BENCH_OUT.json is the round's git-tracked
    // citable evidence, and a partial map committed over it would claim a
    // one-query "total" with nothing marking the filter (review finding).
    val outFile = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT",
      if (sys.env.contains("SPARK_GRAFT_BENCH_ONLY")) "BENCH_PARTIAL.json"
      else "BENCH_OUT.json")
    val spark = GraftSession.builder("graft-bench", shufflePartitions = cpus.toInt)
      .master(s"local[$cpus]")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Warmup (untimed): exercise codegen, shuffle machinery and the parquet
    // reader once so JVM infrastructure startup isn't attributed to the
    // first measured query. The two-document MinHash pass compiles the
    // engine's single heaviest codegen shape (the 64-min-aggregate
    // signature bank, ~2-3 s of janino) — one-time JIT/codegen cost, not
    // per-query work, so it belongs in the warmup, not in whichever dedup
    // query happens to run first.
    spark.range(1000000).selectExpr("sum(id * 2) AS s").collect()
    spark.read.parquet(s"$sfDir/region.parquet")
      .groupBy("r_name").count().write.format("noop").mode("overwrite").save()
    locally {
      import spark.implicits._
      // Warm the FULL MinHash candidate pipeline shape — signature bank,
      // band explode, bucket self-join, pair distinct, signature re-join and
      // the agreement filter — on a corpus big enough (60 docs, 3 clusters
      // of near-identical text) that every stage actually executes and
      // compiles, including the shapes AQE picks on non-trivial row counts.
      // Round 3's 2-row warmup compiled the 64-min-agg signature shape but
      // left the band-join/distinct/agreement stages to first-compile inside
      // whichever dedup query ran first in the timed window.
      val warmDocs = (0 until 60).map { i =>
        val base = s"tok${i % 3}a tok${i % 3}b tok${i % 3}c tok${i % 3}d tok${i % 3}e tok${i % 3}f"
        (i.toLong, if (i < 3) base else s"$base x$i")
      }.toDF("doc_id", "text")
      val warmPairs = functions.Dedup.minhashCandidates(warmDocs, minEstJaccard = 0.5)
      warmPairs.write.format("noop").mode("overwrite").save()
      // ... and the connected-components loop on top of it (q48/q51/q53's
      // iterative stages: symmetrize, star contraction, full-outer diff).
      functions.Dedup.duplicateClustersLogN(warmPairs)
        .write.format("noop").mode("overwrite").save()
    }
    // Pre-build the write-once index fixtures untimed (round-8 advice: the
    // 83.6 s band-index build was billed to q78's first pass). Stamped, so
    // this is a fingerprint probe when the fixtures are already current.
    SparkEntry.prebuildFixtures(spark, sfDir)

    def runOnce(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).write.format("noop").mode("overwrite").save()
            (System.nanoTime() - t0) / 1e9 }
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
        // A failed query must not masquerade as a benchmarked one: record
        // the -1 sentinel (and list it below) instead of elapsed-until-throw.
        -1.0
      }
    }
    // Local-iteration filter: SPARK_GRAFT_BENCH_ONLY=q26,q78 times just the
    // named prefixes (full-registry artifact runs leave it unset).
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSeq)
    val named = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.exists(n.startsWith)) }
    // Fixed canary: a 4M-row scan+agg of a real parquet table, ~0.1 s when
    // the box is quiet. Timed every `canaryEvery` queries in both passes so
    // an ambient-load window shows up as a spike in the emitted series.
    val canaryTimes = scala.collection.mutable.ArrayBuffer[Double]()
    // canary_at[i] labels canary[i] with the pass and query index it ran
    // BEFORE ("A:12" = pass A, right before query 12) so a spike is
    // mechanically attributable to the queries timed inside its window —
    // round 6's dirty driver run could flag itself but not localize which
    // query timings the ambient window covered.
    val canaryAt = scala.collection.mutable.ArrayBuffer[String]()
    def canary(at: String): Unit = {
      val t0 = System.nanoTime()
      spark.read.parquet(s"$sfDir/orders.parquet")
        .selectExpr("sum(o_totalprice) AS s", "count(DISTINCT o_orderstatus) AS c")
        .write.format("noop").mode("overwrite").save()
      canaryTimes += (System.nanoTime() - t0) / 1e9
      canaryAt += at
    }
    val canaryEvery = 6
    def runPass(pass: String): Seq[(String, Double)] = named.zipWithIndex.map { case ((name, fn), i) =>
      if (i % canaryEvery == 0) canary(s"$pass:$i")
      val t = runOnce(name, fn)
      // queries that persist() intermediates (the MinHash signature table,
      // q53's dedup prefix) would otherwise leave cached copies behind —
      // drop leftovers so cache pressure doesn't skew whatever times next
      spark.catalog.clearCache()
      (name, t)
    }
    canary("prime") // prime the canary's own codegen so its first timed run is comparable
    canaryTimes.clear()
    canaryAt.clear()
    val passA = runPass("A")
    val passB = runPass("B")
    val firstByName = passA.toMap
    // Contention-resilient third pass (round-9 verdict #4): when a query's
    // two passes disagree >2x, an ambient-load window likely landed on one
    // of them — and if it landed on parts of BOTH (the r8/r9 driver runs),
    // the min is still inflated. Re-run those queries once more and take
    // the min of three. Guards: only queries whose CURRENT min exceeds
    // 0.3 s (sub-0.3 s disagreement is scheduler jitter, not contention),
    // capped at 12 reruns from the slowest down (bounds added wall time),
    // each reported with its own canary sample so the artifact shows the
    // conditions the rerun ran under.
    val disagree = passA.zip(passB).collect {
      case ((name, t1), (_, t2))
        if t1 >= 0 && t2 >= 0 &&
          math.max(t1, t2) > 2 * math.min(t1, t2) &&
          math.min(t1, t2) > 0.3 => (name, math.min(t1, t2))
      // a query that failed in exactly ONE pass still has a real
      // measurement in the other — retry it once instead of discarding
      // the timing and reporting -1 (review finding: transient one-pass
      // failures were excluded from the rerun machinery by the
      // both-valid guard above)
      case ((name, t1), (_, t2))
        if (t1 >= 0) != (t2 >= 0) => (name, math.max(t1, t2))
    }.sortBy(-_._2).take(12).map(_._1)
    val thirdPass = disagree.zipWithIndex.map { case (name, i) =>
      canary(s"R:$i")
      val t = runOnce(name, SparkEntry.queries(name))
      spark.catalog.clearCache()
      (name, t)
    }.toMap
    val results = passA.zip(passB).map { case ((name, t1), (_, t2)) =>
      // min of whatever measurements are VALID across the (up to) three
      // runs: a one-pass transient keeps its real timing (visible as -1 in
      // queries_first and in the reruns map); only a query with no valid
      // measurement anywhere reports -1 / failed
      val valid = Seq(t1, t2, thirdPass.getOrElse(name, -1.0)).filter(_ >= 0)
      val best = if (valid.isEmpty) -1.0 else valid.min
      (name, best, firstByName(name))
    }
    // millisecond precision: sub-ms digits are noise, and the emitted line
    // must stay short — the driver's log-tail window has truncated
    // full-precision JSON mid-line before (round-3 postmortem).
    // Locale.ROOT: the default-locale interpolator would emit comma
    // decimals (invalid JSON) on a comma-decimal JVM.
    def fmt(v: Double): String =
      if (v < 0 || !v.isFinite) "-1" // -1 also encodes "ceiling disabled"
      else String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    // every interpolated string goes through Jsons.q — the hand-rolled
    // bare interpolation produced an invalid artifact for any path/name
    // with a quote/backslash/control char, the exact driver-side
    // silent-zero failure Verify's escaper exists to prevent (review
    // finding; the escaper is now shared)
    val qs = results.map { case (k, v, _) => Jsons.q(k) + ":" + fmt(v) }
      .mkString("{", ",", "}")
    val qsFirst = results.map { case (k, _, t1) => Jsons.q(k) + ":" + fmt(t1) }
      .mkString("{", ",", "}")
    val failed = results.collect { case (k, v, _) if v < 0 => Jsons.q(k) }
      .mkString("[", ",", "]")
    val total = results.map(_._2).filter(_ >= 0).sum
    val canaryJson = canaryTimes.map(fmt).mkString("[", ",", "]")
    // mechanical noise verdict so the driver can discount a dirty run
    // without eyeballing the series: the canary is a fixed ~0.1-0.3 s
    // scan+agg, so MULTIPLE samples spiking >3x the warm minimum mean a
    // SUSTAINED ambient-load window overlapped the run — the condition
    // that can defeat interleaved min-of-2 (the r4 artifact). A single
    // blip is left to the min-of-2 to shed (the full series is emitted
    // either way, so one-off spikes stay visible). The first sample is
    // excluded: it can still carry infrastructure-warmup stragglers.
    val warmCanary = canaryTimes.drop(1)
    // Two independent noise conditions, either certifies the run dirty:
    //   - SPIKES: >= 2 warm samples over 3x the warm minimum — a sustained
    //     ambient window INSIDE the run (one blip is shed by min-of-2);
    //   - ELEVATED FLOOR: the warm MINIMUM itself exceeds the quiet-box
    //     envelope — load spanning the ENTIRE run inflates every sample
    //     uniformly, so the relative-spike test sees a flat (clean-looking)
    //     series while every query timing is still corrupted (round-6
    //     advice). The canary is a fixed ~4M-row scan+agg that runs
    //     0.1-0.3 s on this box when quiet at sf0.1 (and faster at smaller
    //     SFs, so one absolute ceiling is safe across SFs); the threshold
    //     is emitted alongside the verdict and env-overridable for a
    //     different box.
    // The 0.75 s default ceiling is this box's quiet envelope AT THE
    // DRIVER'S SFs (≤ 0.1) — at larger SFs the canary's quiet floor
    // legitimately exceeds it and every genuinely-quiet run would
    // self-certify dirty (review finding). Without an explicit override at
    // a non-default SF, the absolute-ceiling tests are disabled (emitted
    // as canary_quiet_max = -1) rather than wrong.
    val defaultSf = Seq("sf0.1", "sf0.01", "sf0.001").exists(sfDir.stripSuffix("/").endsWith)
    val quietMax = sys.env.get("SPARK_GRAFT_CANARY_QUIET_MAX").map(_.toDouble)
      .getOrElse(if (defaultSf) 0.75 else Double.PositiveInfinity)
    // A spike must ALSO clear the quiet-box ceiling: on a genuinely quiet
    // run the warm minimum can be so low (~0.13 s) that 3x of it sits
    // INSIDE the quiet envelope, and ordinary GC/page-cache wobble
    // (0.4-0.5 s samples) would self-certify the run dirty — a sample the
    // quiet box permits cannot be evidence of contention (r10: a flat
    // 0.13-0.53 s series flagged noisy). Real ambient windows clear 0.75
    // easily (the r9 driver spike was 1.96 s).
    val canarySpiky =
      warmCanary.nonEmpty &&
        warmCanary.count(s => s > warmCanary.min * 3 && s > quietMax) >= 2
    val canaryElevated = warmCanary.nonEmpty && warmCanary.min > quietMax
    val canaryNoisy = canarySpiky || canaryElevated
    // ---- host-drift telemetry (round-14 verdict #5): the absolute quiet
    // ceiling cannot see a UNIFORM host slowdown — a +30% shift inflates
    // every sample and every query timing while the relative-spike test
    // reads flat, and round 14 burned a day-scale ambiguity proving a 22%
    // total drift was the box. The canary runs UNCHANGED code every
    // round, so its median ratio against the last committed artifact's
    // median is a pure host-speed signal: emit it and flag |drift| >15%
    // so round-over-round totals are auto-normalizable. Telemetry only —
    // no behavior change to the noise gate above.
    val canaryMedian = medianOf(warmCanary.toSeq)
    // the committed reference is always BENCH_OUT.json (the git-tracked
    // artifact), read BEFORE this run overwrites it; a partial
    // (BENCH_ONLY) run compares against the same reference. Parsing is
    // pinned to renderFull's format by BenchDriftParseSpec.
    val prevCanaryMedian: Double = try {
      val ref = Paths.get("BENCH_OUT.json")
      if (!Files.exists(ref)) -1.0
      else parseDriftReference(Files.readString(ref), sfDir)
    } catch { case _: Exception => -1.0 }
    val canaryVsCommitted =
      if (canaryMedian > 0 && prevCanaryMedian > 0) canaryMedian / prevCanaryMedian
      else -1.0
    val hostDrift = canaryVsCommitted > 0 &&
      (canaryVsCommitted > 1.15 || canaryVsCommitted < 1.0 / 1.15)
    val canaryAtJson = canaryAt.map(a => Jsons.q(a.toString)).mkString("[", ",", "]")
    val rerunMap = disagree.map { n =>
      Jsons.q(n) + ":" + fmt(thirdPass.getOrElse(n, -1.0))
    }.mkString("{", ",", "}")
    // Full artifact: every pass, all 80 queries, canary series + labels.
    // Written to BENCH_OUT.json (git-tracked, the citable evidence) and
    // printed as the bare stdout line (round-1 contract, for any consumer
    // capturing full stdout).
    def renderFull: String =
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries_first":$qsFirst,"canary":$canaryJson,"canary_at":$canaryAtJson,"canary_noisy":$canaryNoisy,"canary_elevated":$canaryElevated,"canary_quiet_max":${fmt(quietMax)},"canary_median":${fmt(canaryMedian)},"canary_prev_median":${fmt(prevCanaryMedian)},"canary_vs_committed":${fmt(canaryVsCommitted)},"host_drift":$hostDrift,"reruns":$rerunMap,"failed":$failed,"queries":$qs,"sf":${Jsons.q(sfDir)}}"""
    // Compact tail line (round-9 verdict #3): the driver archives only the
    // LAST 2000 chars of stdout, and three rounds of full-map lines never
    // fit — BENCH_r07..r09 all have parsed:null with a tail decapitated
    // mid-key. This line carries total, failure list, noise verdict, the
    // TOP-10 slowest mins (the graded heavy queries) and the artifact path
    // in well under 1500 chars, and is printed LAST so the tail window
    // always contains it whole. The full 80-query map lives in the
    // artifact file it points to.
    def renderCompact: String = {
      val top10 = results.filter(_._2 >= 0).sortBy(-_._2).take(10)
        .map { case (k, v, _) => Jsons.q(k) + ":" + fmt(v) }
        .mkString("{", ",", "}")
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","failed":$failed,"canary_noisy":$canaryNoisy,"canary_elevated":$canaryElevated,"canary_vs_committed":${fmt(canaryVsCommitted)},"host_drift":$hostDrift,"rerun_count":${disagree.size},"queries":$top10,"artifact":${Jsons.q(outFile)},"sf":${Jsons.q(sfDir)}}"""
    }
    Files.writeString(Paths.get(outFile), renderFull + "\n")
    // Durability sidecar (r16 verdict #6): the full per-query record lives
    // only in the mutable artifact above, and the r16 round lost a full
    // breakdown to a single-file overwrite. Append every run's full render
    // to a timestamped file under target/bench_history/ (untracked),
    // keeping the newest 20 so the directory stays bounded. Best-effort:
    // a failure here must never fail the bench.
    try {
      val hist = Paths.get("target", "bench_history")
      Files.createDirectories(hist)
      Files.writeString(
        hist.resolve(s"bench_${System.currentTimeMillis}.json"), renderFull + "\n")
      val old = Files.list(hist)
      try {
        import scala.jdk.CollectionConverters._
        old.iterator().asScala.toSeq
          .filter(_.getFileName.toString.startsWith("bench_"))
          .sortBy(_.getFileName.toString)
          .dropRight(20)
          .foreach(Files.deleteIfExists(_))
      } finally old.close()
    } catch { case e: Exception =>
      System.err.println(s"[bench] history append failed: ${e.getMessage}")
    }
    println(renderFull)
    println("GRAFT_BENCH " + renderCompact)
    spark.stop()
    // The BARE compact object as the very last stdout line (round-10
    // verdict #4): the driver's tail parser kept reporting parsed:null even
    // once the prefixed GRAFT_BENCH line fit its 2000-char window — print
    // the unprefixed JSON after spark.stop() so no shutdown logging or
    // prefix can sit between it and sbt's epilogue.
    println(renderCompact)
  }
}
