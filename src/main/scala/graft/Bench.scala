package graft

import java.util.concurrent.atomic.AtomicBoolean
import scala.collection.concurrent.TrieMap
import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: every SparkEntry query against
  * $SPARK_GRAFT_SF_DIR, one JSON line of per-query seconds.
  *
  * Hardening history: r01's JSON was eaten by sbt's `[info]` prefix
  * (fixed: raw stdout via run/outputStrategy); r02 was killed by the
  * driver's external timeout (rc=124) and produced NOTHING. This box
  * also carries intermittent external load (PERF.md: identical
  * back-to-back full runs measured 672.8 s vs 46.1 s, loadavg 2.7 vs 0).
  * Defenses, in order of importance:
  *
  *  1. A HARD internal deadline (budget + 90 s): a daemon thread emits
  *     the partial-results JSON and `Runtime.halt`s the JVM. halt (not
  *     exit) skips Spark's shutdown hooks, so no log torrent can push
  *     our line out of the driver's captured tail — the r02 failure
  *     shape. We always finish before any plausible external timeout.
  *  2. Cost-ordered execution: the ~45 sub-second relational queries
  *     run first, the text family next, the LSH/ANN/dedup tail last —
  *     if a loaded window eats the budget, the artifact still carries
  *     timings for everything cheap.
  *  3. A measurement budget (SPARK_GRAFT_BENCH_BUDGET_SEC, default
  *     420 s): once exceeded, remaining queries get a tight 10 s
  *     watchdog slice — sub-second queries still record a number, hangs
  *     cost 10 s, and the hard deadline bounds the sum.
  *  4. A per-query watchdog cancels the Spark jobs of any query that
  *     exceeds its slice (a hang costs one slice, not the artifact).
  *  5. MIN-OF-2 FOR EVERY QUERY plus improvement passes: pass 2
  *     mandatorily re-times the full set (the host carries multi-minute
  *     external load spikes — identical back-to-back full runs measured
  *     672.8 s vs 46.1 s — and r5 proved a spike on a 1–5 s query was
  *     previously recorded as-is), then remaining budget re-runs every
  *     failed or still-unsettled >1 s query up to 3 more times. The
  *     JSON reports BOTH the pass-1 time (`first`) and the min
  *     (`queries`), so cold/loaded costs stay legible (ADVICE r02).
  *  6. LOAD-AWARE CLEAN-WINDOW POLICY (r8, widened r10): every timed
  *     run records the EXTERNAL cpu-cores competing during it
  *     (/proc/stat busy jiffies minus this JVM's own cpu — raw loadavg
  *     can't tell our 32-thread bench from external tenants) AND the
  *     io/memory stall share (PSI some-stall + machine iowait — the r8
  *     cpu-only test was blind to a disk-thrashing D-state co-tenant
  *     and certified ten 2.9–11.3× inflated numbers `ext=0.00`). A
  *     >1 s min recorded under a dirty window on EITHER axis is never
  *     trusted: it stays retry-eligible, the retry loop waits out busy
  *     windows in bounded 15 s slices, and if no quiet run ever lands
  *     the artifact is stamped `loaded:true` with per-query
  *     `ext_load_at_min` + `io_stall_at_min` for adjudication.
  *  7. The JVM shutdown hook still emits on an external SIGTERM that
  *     lands before our deadline.
  *
  * Start/end loadavg + per-pass load notes ride along for forensics.
  */
object Bench {
  private val emitted = new AtomicBoolean(false)
  private val minTimes = TrieMap.empty[String, Double]
  private val firstTimes = TrieMap.empty[String, Double]
  private val failures = TrieMap.empty[String, Boolean]
  private val errors = TrieMap.empty[String, String]
  // External CPU-cores busy (other processes) during the run that set
  // each query's current min — the adjudication signal for "is this
  // number load-contaminated?". Raw loadavg can't distinguish our own
  // 32-thread bench from external tenants (r4's CLEAN run showed
  // load_end 4.76 from our own work); busy-jiffies-minus-our-own can.
  private val extAtMin = TrieMap.empty[String, Double]
  private val ioAtMin = TrieMap.empty[String, Double]
  // elapsed wall second at which each query's current min was recorded
  // (r20): with canary_series this makes cross-round normalization
  // MECHANICAL — divide a query's ratio by the canary ratio at the
  // series point nearest its min — instead of narrating "the window
  // was dirty around then"
  private val minAtSec = TrieMap.empty[String, Double]
  // per-query tag→cached-bytes snapshot taken just before each release
  // (r11 verdict task 8): cache-pressure regressions (a budget gate
  // mis-sized, a new operator persisting corpus-shaped state) surface
  // in BENCH_DETAIL per query instead of only in probe post-mortems
  private val cacheBytesAtRun = TrieMap.empty[String, String]
  // per-query dispatch-form tags (r19, r18 verdict item 4): which
  // physical form each cardinality-gated operator picked while the
  // query was built/run — a silent dispatch flip (an HLL estimate
  // drifting across the vocabulary cap, new driver data) becomes an
  // artifact diff instead of an unexplained timing move
  private val dispatchAtRun = TrieMap.empty[String, String]

  /** One query's op→forms dispatch tags as a JSON object fragment (ops
    * and forms are code-authored identifiers — no escaping needed;
    * BenchPolicySpec pins the shape and the expected forms). */
  private[graft] def dispatchJson(forms: Seq[(String, String)]): String =
    forms.groupBy(_._1).toSeq.sortBy(_._1).map { case (op, fs) =>
      "\"" + op + "\":\"" + fs.map(_._2).distinct.sorted.mkString(",") + "\""
    }.mkString("{", ",", "}")

  /** One query's non-zero tag→bytes snapshot as a JSON object fragment
    * (tags are code-authored dotted identifiers — no escaping needed;
    * BenchPolicySpec pins the shape so BENCH_DETAIL stays parseable). */
  private[graft] def tagBytesJson(bytes: Seq[(String, Long)]): String =
    bytes.map { case (t, b) => "\"" + t + "\":" + b }.mkString("{", ",", "}")
  private val loadPasses = scala.collection.mutable.ArrayBuffer.empty[String]

  /** The timing path, named once (ADVICE r17): `emit` derives the
    * artifact's `forced` claim from this constant and records the
    * method itself as `force_method`, and `force()` dispatches on it —
    * so a future regression back to count()-style probing cannot keep
    * asserting `forced:true` without also lying here, one line away
    * from the dispatch it would have to change. "toRdd" = execute the
    * query's OWN physical plan at the InternalRow level (no logical
    * rewrite, nothing collected). */
  private[graft] val ForceMethod = "toRdd"
  private[graft] def forcedClaim: Boolean = ForceMethod == "toRdd"

  /** Runs whose external competition exceeds this many cores (of 32)
    * are treated as load-contaminated: they can't settle a query, and
    * >1 s mins recorded under them get clean-window retries. Loaded
    * rounds measured ~6 external cores; clean ones ~0. */
  val ExtQuiet = 2.0

  /** IO/memory stall share of a window above which the run is dirty.
    * The r8 adjudicator counted only external *CPU*, so a co-tenant
    * thrashing disk (D-state, load1≈7, cpu≈0) read as "quiet" and
    * BENCH_r08 stamped `loaded:false` over ten 2.9–11.3×-inflated
    * numbers, each certified ext=0.00 (r8 verdict). PSI some-stall and
    * machine iowait are the signals that DO see that tenant. */
  val IoQuiet = 0.05

  /** One load snapshot. busy = machine busy jiffies with idle+iowait
    * excluded; iowait = machine iowait jiffies; psiIo/psiMem = PSI
    * `some total=` stall micros from /proc/pressure/{io,memory}; proc =
    * this JVM's cpu ns; wall ns. Unreadable sources are -1 and degrade
    * to "quiet" (never spuriously dirty on an exotic kernel).
    * /proc/pressure/cpu is deliberately NOT used: our own 32-thread
    * bench keeps some-cpu pressure high, so it cannot separate self
    * from tenant the way busy-minus-own-cpu and io-stall can. */
  final case class LoadSnap(busy: Long, iowait: Long, psiIo: Long,
                            psiMem: Long, proc: Long, wall: Long)

  private def psiSomeTotal(path: String): Long =
    try scala.io.Source.fromFile(path).getLines()
      .find(_.startsWith("some")).get.split("total=")(1).trim.toLong
    catch { case _: Throwable => -1L }

  private def cpuSnap(): LoadSnap = {
    val (busy, iow) =
      try {
        val parts = scala.io.Source.fromFile("/proc/stat").getLines().next()
          .trim.split("\\s+").drop(1).map(_.toLong)
        // user+nice+system+irq+softirq+steal; idle(3)+iowait(4) excluded
        (parts.indices.collect { case i if i != 3 && i != 4 => parts(i) }.sum,
          if (parts.length > 4) parts(4) else -1L)
      } catch { case _: Throwable => (-1L, -1L) }
    val proc =
      try java.lang.management.ManagementFactory.getOperatingSystemMXBean
        .asInstanceOf[com.sun.management.OperatingSystemMXBean].getProcessCpuTime
      catch { case _: Throwable => -1L }
    LoadSnap(busy, iow, psiSomeTotal("/proc/pressure/io"),
      psiSomeTotal("/proc/pressure/memory"), proc, System.nanoTime())
  }

  /** External cores busy between two snapshots: (machine busy CPU −
    * our own CPU) / wall. Pure; USER_HZ=100. Unmeasurable ⇒ 0. */
  def externalCores(a: LoadSnap, b: LoadSnap): Double = {
    if (a.busy < 0 || b.busy < 0 || a.proc < 0 || b.proc < 0) return 0.0
    val wallSec = (b.wall - a.wall) / 1e9
    if (wallSec <= 0.01) return 0.0
    val busySec = (b.busy - a.busy) / 100.0
    val procSec = (b.proc - a.proc) / 1e9
    math.max(0.0, (busySec - procSec) / wallSec)
  }

  /** IO-contention share of a window: the max of (a) the PSI some-stall
    * fraction for io and memory — wall-clock share in which ≥1 task sat
    * in D-state / reclaim, which is exactly what a disk-thrashing
    * co-tenant produces — and (b) machine iowait cores normalized by
    * cpu count. Pure; unmeasurable sources contribute 0. Cannot
    * attribute stall to self vs tenant, but after the warmup pass our
    * tables are page-cached, so sustained stall during a timed run is
    * external by construction. */
  def ioStallFraction(a: LoadSnap, b: LoadSnap, cpus: Int): Double = {
    val wallSec = (b.wall - a.wall) / 1e9
    if (wallSec <= 0.01) return 0.0
    val psi = Seq((a.psiIo, b.psiIo), (a.psiMem, b.psiMem)).map { case (x, y) =>
      if (x < 0 || y < 0) 0.0 else math.max(0.0, (y - x) / 1e6 / wallSec)
    }.max
    val iow =
      if (a.iowait < 0 || b.iowait < 0) 0.0
      else math.max(0.0, (b.iowait - a.iowait) / 100.0 / wallSec / math.max(1, cpus))
    math.max(psi, iow)
  }

  /** A run is load-clean only when BOTH axes are quiet: external cpu
    * competition and io/memory stall. */
  def quietRun(extCores: Double, ioStall: Double): Boolean =
    extCores <= ExtQuiet && ioStall <= IoQuiet

  /** Pure settle decision (ADVICE r7, Bench.scala:239): a query's cost
    * is only "real, not load" when the re-run AGREES with the current
    * min within ±10% BOTH ways and the re-run itself was externally
    * quiet on BOTH axes (cpu since r8; io/memory stall since r10 — two
    * agreeing runs inside the same IO-dirty window previously settled
    * each other). The old `dt >= prev*0.9` accepted a WORSE pass-2
    * time — a spike spanning both passes got excluded from retries, the
    * exact failure mode of the r6/r7 artifacts. */
  def settledAfterRun(dt: Double, prevMin: Double, extCores: Double,
                      ioStall: Double = 0.0): Boolean =
    dt >= prevMin * 0.9 && dt <= prevMin * 1.1 && quietRun(extCores, ioStall)
  // `partial` in the JSON means pass 1 did NOT cover every query — a
  // deadline that fires during the optional improvement passes still
  // yields a complete artifact and must not be labeled partial.
  @volatile private var pass1Done = false
  // HOST-SPEED CANARY (r15 verdict item 8): min-of-3 of a FIXED
  // synthetic CPU job (range+hash agg — no library code, no IO, plan
  // identical across rounds), run at window start. The judge divides
  // round totals by the canary ratio to separate code movement from
  // shared-host speed shifts without recomputing per-query tables.
  @volatile private var canarySec = -1.0
  @volatile private var sfDirSeen = ""
  @volatile private var loadStart = -1.0
  // DRIFT SERIES (r20, r19 verdict item 3): one single-shot canary
  // point every ~10 timed queries, (elapsed wall sec, canary sec).
  // The r19 adjudication problem was structural: three same-binary
  // runs climbed 106.6 → 116.4 → 124.9 s with ONE start-of-run canary
  // each, so a co-tenant ramp INSIDE a run was invisible and a
  // per-query cross-round ratio (q109's 1.59×) could not be separated
  // from host drift by artifact alone. With the series, a cross-round
  // comparison normalizes each query by the canary point nearest its
  // run time instead of one number for the whole window.
  private val canarySeries = scala.collection.mutable.ArrayBuffer.empty[(Double, Double)]
  // Cancellations that happened ONLY under a dirty window (external cpu
  // or io stall over the quiet bounds, or the canary reading ≥
  // DirtyCanaryRatio × the window's best) — r21, r20 verdict item 1:
  // BENCH_r20 stamped three `failed` entries (q41/q55/q94) for queries
  // that run in 1.8–4.7 s clean, because every slice the storm window
  // offered was effectively 10–15 s ÷ a ~70× stall. `failed` stays the
  // honest "no number landed" list (driver contract unchanged); the new
  // `failed_dirty` sublist marks which of those failures never had a
  // clean-window cancellation, so a false-failure storm artifact is
  // adjudicable from the artifact alone. Each cancellation records
  // (elapsed, extCores, ioStall); dirtiness is judged at EMIT time
  // against the series point NEAREST each cancellation — judging at
  // cancellation time against the LAST point misses storm onsets (a
  // run this round cancelled four queries in the ~30 s between a
  // 0.52 s point and the 18.6 s spike that sampled the same storm).
  private val cancelEvents =
    TrieMap.empty[String, List[(Double, Double, Double)]]

  /** Host-slowness ratio from the drift series: latest canary second
    * over the window's best (the min is the cleanest estimate this
    * window produced). 1.0 until two points exist; never below 1. */
  private def hostSlowness: Double = canarySeries.synchronized {
    if (canarySeries.isEmpty) 1.0
    else {
      val vals = canarySeries.map(_._2)
      math.max(1.0, vals.last / math.max(1e-9, vals.min))
    }
  }

  // core count the session actually ran with — emit() and the absolute
  // slowness gate need it for the clean-canary ceiling (r22)
  @volatile private var ncpuSeen = 32

  /** Like [[hostSlowness]] but ABSOLUTE: the best divides by the
    * ceiling-clamped series min, so a storm spanning every point still
    * reads slow. Used for storm DETECTION (pass-1 deferral, pass-2
    * skips), never for slice stretching. */
  private def hostSlownessAbs: Double = canarySeries.synchronized {
    if (canarySeries.isEmpty) 1.0
    else {
      val vals = canarySeries.map(_._2)
      math.max(1.0, vals.last / clampedBest(vals.min, ncpuSeen))
    }
  }

  /** Slowness of the series point nearest wall-second t — the emit-time
    * adjudication signal for cancellations. Unmeasurable ⇒ MaxValue:
    * fewer than two points (the lone anchor may itself be inflated), or
    * no point within [[CanaryFreshSec]] of t — micro-storms fit between
    * samples (observed live: a q58 cancellation in a 78 s gap whose
    * both neighbours read clean), so a stale point cannot certify a
    * cancellation clean. */
  val CanaryFreshSec = 30.0
  private def slownessNear(t: Double): Double = canarySeries.synchronized {
    if (canarySeries.size < 2) Double.MaxValue
    else {
      val (pt, near) = canarySeries.minBy { case (p, _) => math.abs(p - t) }
      if (math.abs(pt - t) > CanaryFreshSec) Double.MaxValue
      else {
        // ceiling-clamped best (r22, ADVICE r21 low): a storm spanning
        // the whole series previously made every point "clean relative
        // to itself" and laundered storm cancellations into real-looking
        // engine failures
        val best = clampedBest(canarySeries.map(_._2).min, ncpuSeen)
        math.max(1.0, near / best)
      }
    }
  }

  /** A >1 s min recorded in a window whose NEAREST fresh canary point
    * reads dirty (r22, run-4 forensics: a silent throttle burst — 39 s
    * canary at t=251 — inflated q106–q108 5–8× while ext/io, blind to
    * the throttle class, certified them quiet). Unmeasurable windows
    * (no fresh point) are NOT flagged here: over-flagging every query
    * in a sparse segment would churn retries, and the post-slow-query
    * probe keeps the series dense exactly where runs are long. */
  private def canaryDirtyAtMin(name: String): Boolean = {
    val sn = slownessNear(minAtSec.getOrElse(name, -1.0))
    sn >= DirtyCanaryRatio && sn != Double.MaxValue
  }

  /** Watchdog slices scale with the CURRENT host slowness, clamped to
    * [1, MaxSliceScale] (r21, r20 verdict item 1b): a 15 s slice is an
    * honest hang bound on a quiet host and a guaranteed false `failed`
    * under a 10× co-tenant stall. Pure — BenchPolicySpec pins the
    * clamp and the dirty-failure bookkeeping around it. */
  val MaxSliceScale = 8.0
  val DirtyCanaryRatio = 1.5
  /** A timed run above this many seconds triggers a forced canary point
    * right after it (r22): long runs are exactly where the fixed-tick
    * series goes sparse, and where a silent storm hides. */
  val SlowQueryCanarySec = 4.0
  def scaledSlice(baseSec: Double, slowness: Double): Double =
    baseSec * math.min(MaxSliceScale, math.max(1.0, slowness))

  /** Upper bound on a CLEAN canary second at a given core count (r22,
    * ADVICE r21 low): the fixed probe reads ~0.42 s clean at 32 cores
    * and ~0.75 s at 8 (r20/r21 artifacts). A storm spanning the WHOLE
    * window inflates every series point together, so series-relative
    * slowness reads ~1.0 exactly when the window is dirtiest — and a
    * storm cancellation was judged clean (the r20 false-failure shape).
    * Clamping the series best to this generous ceiling (≈3.5× clean)
    * lets a uniformly-slow window still read as slow. Pure;
    * BenchPolicySpec pins it. */
  def cleanCanaryCeiling(cpus: Int): Double = if (cpus >= 16) 1.5 else 3.0

  /** The `best` estimate slowness ratios divide by: the window's own
    * series minimum, clamped to the clean ceiling so a whole-window
    * storm cannot certify itself clean. Pure; spec-pinned. */
  def clampedBest(seriesMin: Double, cpus: Int): Double =
    math.max(1e-9, math.min(seriesMin, cleanCanaryCeiling(cpus)))

  /** Expected-cost tier by name: 0 = sub-second relational, 1 = text
    * scans, 2 = dedup/ANN/LSH pipeline tail. Unknown names sort by tier
    * 0 (new relational ops are cheap until proven otherwise). */
  private def tier(name: String): Int = {
    val heavy = Set("q40_exact_dedup", "q41_minhash_lsh", "q42_simhash_edges",
      "q43_ngram_jaccard", "q44_embedding_dedup", "q45_knn_brute",
      "q46_knn_lsh", "q55_cosine_pairs", "q56_knn_ivf", "q58_dup_clusters",
      "q79_simhash_clusters", "q82_dedup_keepers", "q88_source_overlap_incremental",
      "q89_containment_pairs", "q92_containment_incremental", "q95_source_jaccard")
    val text = Set("q47_langid", "q48_quality", "q49_token_count",
      "q50_fingerprint", "q51_multimodal_meta", "q52_multimodal_decode",
      "q62_tfidf", "q66_repetition", "q67_chunk_dedup", "q70_heavy_hitters",
      "q71_redact", "q72_frame_sample", "q73_curation_funnel",
      "q74_winnow", "q75_unigram_logprob", "q76_contamination",
      "q91_quality_gate", "q93_ngram_novelty", "q94_strip_dup_spans")
    if (heavy(name)) 2 else if (text(name)) 1 else 0
  }

  private def load1: Double =
    try scala.io.Source.fromFile("/proc/loadavg").mkString.split(" ")(0).toDouble
    catch { case _: Throwable => -1.0 }

  private def emit(partial: Boolean): Unit = {
    if (!emitted.compareAndSet(false, true)) return
    val names = minTimes.keySet ++ failures.keySet
    def m(map: TrieMap[String, Double]) = names.toSeq.sorted.map { k =>
      "\"" + k + "\":" + (if (failures.getOrElse(k, false)) -1.0 else map.getOrElse(k, -1.0))
    }.mkString("{", ",", "}")
    val failed = failures.keysIterator.toSeq.sorted.map("\"" + _ + "\"").mkString("[", ",", "]")
    def esc(s: String) = s.replace("\\", "\\\\").replace("\"", "\\\"")
      .replaceAll("[\\n\\r\\t]", " ").take(160)
    val errs = errors.toSeq.sortBy(_._1)
      .map { case (k, v) => "\"" + k + "\":\"" + esc(v) + "\"" }.mkString("{", ",", "}")
    val total = names.toSeq.collect { case k if !failures.getOrElse(k, false) => minTimes.getOrElse(k, 0.0) }.sum
    // Per-query external load at the run that produced the min — only
    // for the >0.5 s tier (sub-second numbers don't need adjudication).
    val adjNames = names.toSeq.sorted
      .filter(k => minTimes.getOrElse(k, 0.0) > 0.5 && !failures.getOrElse(k, false))
    val extm = adjNames
      .map(k => f""""$k":${extAtMin.getOrElse(k, -1.0)}%.2f""").mkString("{", ",", "}")
    val iom = adjNames
      .map(k => f""""$k":${ioAtMin.getOrElse(k, -1.0)}%.2f""").mkString("{", ",", "}")
    val minAt = adjNames
      .map(k => f""""$k":${minAtSec.getOrElse(k, -1.0)}%.0f""").mkString("{", ",", "}")
    // loaded = some successful >1 s min was recorded under external
    // competition (cpu OR io/memory stall), OR — r22 — in a window
    // whose nearest fresh canary point read dirty (the throttle storm
    // class the ext/io axes cannot see), and never re-achieved in a
    // quiet window: its number is an upper bound, not a clean
    // measurement.
    def dirtyMin(k: String): Boolean =
      !quietRun(extAtMin.getOrElse(k, 0.0), ioAtMin.getOrElse(k, 0.0)) ||
        canaryDirtyAtMin(k)
    val loaded = names.exists(k => !failures.getOrElse(k, false) &&
      minTimes.getOrElse(k, 0.0) > 1.0 && dirtyMin(k))
    val passes = loadPasses.map("\"" + _ + "\"").mkString("[", ",", "]")
    // Block-manager hygiene audit (r10 verdict task 4): every timed run
    // released the cache registry and cleared the session cache, so a
    // non-empty cache manager or leftover tracked tag HERE is a leak —
    // an operator persisted outside the registry contract.
    val leftoverTags = graft.core.CacheRegistry.trackedTags
    // emit can run from the watchdog/shutdown thread, where the
    // thread-local active session is unset — fall back to the default
    val cacheLeak = SparkSession.getActiveSession
      .orElse(SparkSession.getDefaultSession)
      .exists(s => !s.sharedState.cacheManager.isEmpty) || leftoverTags.nonEmpty
    val cacheBytes = cacheBytesAtRun.toSeq.sortBy(_._1)
      .map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val dispatch = dispatchAtRun.toSeq.sortBy(_._1)
      .map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    // r18 (r17 verdict item 7): a bench run that hit CacheRegistry's
    // fail-open PlanKey path (re-track guard disabled, possible double
    // persists) must be visible in the artifact, not only in stdout —
    // 0 in a clean run, like leftover_cache_tags.
    val planKeyFails = graft.core.CacheRegistry.planKeyFailures
    // ADVICE r20 (low): emit can run from the shutdown-hook/deadline
    // threads concurrently with an append — synchronize the read like
    // every writer, so a torn ArrayBuffer read cannot throw here and
    // lose the whole artifact line
    val cseries = canarySeries.synchronized { canarySeries.toSeq }
      .map { case (t, s) => f"[$t%.0f,$s%.3f]" }.mkString("[", ",", "]")
    // failures whose every cancellation happened under a dirty window
    // (r21): adjudicable as "unmeasured in a storm", not an engine hang.
    // A cancellation is clean only when its own window was quiet on the
    // ext/io axes AND the series point nearest its wall-second reads
    // under the dirty ratio (emit-time, so storm onsets sampled by a
    // LATER point still count as dirty).
    def hadCleanCancel(name: String): Boolean =
      cancelEvents.getOrElse(name, Nil).exists { case (t, ext, io) =>
        quietRun(ext, io) && slownessNear(t) < DirtyCanaryRatio
      }
    val failedDirty = failures.keysIterator.toSeq.sorted
      .filterNot(hadCleanCancel)
      .map("\"" + _ + "\"").mkString("[", ",", "]")
    val full =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":${m(minTimes)},"first":${m(firstTimes)},"failed":$failed,"failed_dirty":$failedDirty,"errors":$errs,"partial":$partial,"loaded":$loaded,"ext_load_at_min":$extm,"io_stall_at_min":$iom,"load_passes":$passes,"load_start":$loadStart,"load_end":$load1,"canary_sec":$canarySec,"canary_series":$cseries,"min_at":$minAt,"forced":$forcedClaim,"force_method":"$ForceMethod","cache_leak":$cacheLeak,"leftover_cache_tags":${leftoverTags.map("\"" + _ + "\"").mkString("[", ",", "]")},"cache_bytes":$cacheBytes,"dispatch":$dispatch,"plan_key_failures":$planKeyFails,"sf":"$sfDirSeen"}"""
    // The driver captures only the LAST ~2000 chars of output and
    // parses the JSON it finds there — the full artifact above is
    // 6-10 KB, so BENCH_r08/r09 both landed `parsed: null` and were
    // adjudicated from a truncated tail. Ship the full record to a
    // repo file (snapshotted by the round commit, readable by the
    // judge) and print a COMPACT line that fits the tail whole:
    // qNN short keys, 2-3 significant decimals, dirty-at-min list
    // instead of the per-query load maps.
    try {
      val w = new java.io.PrintWriter("BENCH_DETAIL.json")
      try w.println(full) finally w.close()
    } catch { case _: Throwable => () }
    def shortKey(k: String): String = k.split("_")(0)
    val qShort = names.toSeq.sorted.map { k =>
      val v = if (failures.getOrElse(k, false)) -1.0 else minTimes.getOrElse(k, -1.0)
      f""""${shortKey(k)}":$v%.2f"""
    }.mkString("{", ",", "}")
    val failedShort = failures.keysIterator.toSeq.sorted
      .map(k => "\"" + shortKey(k) + "\"").mkString("[", ",", "]")
    val dirty = names.toSeq.sorted.filter(k => !failures.getOrElse(k, false) &&
        minTimes.getOrElse(k, 0.0) > 1.0 && dirtyMin(k))
      .map(k => "\"" + shortKey(k) + "\"").mkString("[", ",", "]")
    // raw stdout, single line: sbt [info] prefixes and log4j noise both
    // broke driver-side parsing before; System.out directly is safest
    System.out.println(
      f"""{"metric":"total","value":$total%.2f,"unit":"sec","queries":$qShort,"failed":$failedShort,"partial":$partial,"loaded":$loaded,"dirty_at_min":$dirty,"load_start":$loadStart%.2f,"load_end":$load1%.2f,"canary_sec":$canarySec%.2f,"forced":$forcedClaim,"cache_leak":$cacheLeak,"plan_key_failures":$planKeyFails,"sf":"$sfDirSeen","detail":"BENCH_DETAIL.json"}""")
    System.out.flush()
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sfDirSeen = sfDir
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val budgetSec = sys.env.getOrElse("SPARK_GRAFT_BENCH_BUDGET_SEC", "420").toDouble
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      // A 60+-query session accumulates listener/status-store state that
      // taxes every subsequent tiny job (late-session queries measured
      // ~5× their standalone cost); keep the retained windows small.
      .config("spark.sql.ui.retainedExecutions", "10")
      .config("spark.ui.retainedJobs", "100")
      .config("spark.ui.retainedStages", "200")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // External SIGTERM before our own deadline: still emit what finished.
    Runtime.getRuntime.addShutdownHook(new Thread(() => emit(partial = !pass1Done)))
    loadStart = load1
    val t0wall = System.nanoTime()
    def elapsed: Double = (System.nanoTime() - t0wall) / 1e9
    // The unconditional upper bound on this JVM's lifetime. halt skips
    // all other shutdown hooks — the JSON line is the LAST output.
    val deadline = new Thread(() => {
      try {
        Thread.sleep(((budgetSec + 90) * 1000).toLong)
        emit(partial = !pass1Done)
        Runtime.getRuntime.halt(0)
      } catch { case _: InterruptedException => () }
    })
    deadline.setDaemon(true)
    deadline.start()

    // Runs fn under a watchdog: if the work individually blows its
    // slice, cancel its Spark jobs and mark it failed rather than
    // letting one hang consume the whole round's bench.
    def withWatchdog[A](group: String, sliceSec: Double)(work: => A): (Double, Boolean) = {
      spark.sparkContext.setJobGroup(group, group, interruptOnCancel = true)
      val watchdog = new Thread(() => {
        try {
          Thread.sleep((sliceSec * 1000).toLong)
          spark.sparkContext.cancelJobGroup(group)
        } catch { case _: InterruptedException => () }
      })
      watchdog.setDaemon(true)
      val t0 = System.nanoTime()
      watchdog.start()
      val ok = try { work; true } catch {
        case e: Throwable =>
          // attribute the failure: a watchdog cancellation reads as a
          // JOB_CANCELLED SparkException; anything else is a real bug
          val dt = (System.nanoTime() - t0) / 1e9
          errors(group.stripPrefix("bench-")) =
            f"${e.getClass.getSimpleName}@$dt%.1fs/slice=$sliceSec%.0fs: ${Option(e.getMessage).getOrElse("")}"
          false
      }
      watchdog.interrupt()
      spark.sparkContext.clearJobGroup()
      ((System.nanoTime() - t0) / 1e9, ok)
    }

    // Warm JVM/codegen/session paths AND the OS page cache for every
    // table the queries read — a steady-state engine doesn't pay cold
    // disk on one arbitrary mid-run query, so neither should the bench.
    // Capped: under external load the full-column touch of the document/
    // embedding tables can itself eat minutes.
    spark.range(1000).selectExpr("sum(id)").collect()
    // events.ts is TIMESTAMP(NANOS); without this it fails to load at all
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    withWatchdog("bench-warmup", sliceSec = 75.0) {
      Tables.names.foreach { t =>
        try {
          val df = spark.read.parquet(s"$sfDir/$t.parquet")
          // touch every column so the bytes (incl. binary payloads) are
          // actually read, not just footers
          df.selectExpr(df.columns.toIndexedSeq.map(c => s"max(length(cast(`$c` as string)))"): _*).collect()
        } catch { case _: Throwable => () }
      }
    }

    val ncpu = try cpus.toInt catch { case _: Throwable => 32 }
    ncpuSeen = ncpu

    // host-speed canary: 3 runs, keep the min (see canarySec above)
    withWatchdog("bench-canary", sliceSec = 60.0) {
      canarySec = (0 until 3).map { _ =>
        val t0 = System.nanoTime()
        // decimal accumulator: summing raw 64-bit hashes overflows ANSI
        // long addition almost immediately (same fix as the probes)
        spark.range(50000000L)
          .selectExpr("sum(cast(xxhash64(id) as decimal(38,0)))").collect()
        (System.nanoTime() - t0) / 1e9
      }.min
    }
    // series anchor at window start (the min-of-3 — the cleanest
    // host-speed estimate this window will produce)
    if (canarySec > 0) canarySeries.synchronized {
      canarySeries += ((elapsed, canarySec))
    }

    // FORCE the query's OWN physical plan (r16 verdict item 1): the old
    // `count()` probe let Catalyst prune everything that cannot change
    // cardinality — 25 of 107 queries (including the newest chunked-
    // prefix family, q101–q103/q106/q107) were timed at the parquet
    // scan floor, so a regression in exactly that machinery was
    // invisible to the headline number (ProbeAudit said so honestly;
    // the bench didn't). Executing `queryExecution.toRdd` iterates the
    // planned physical tree at the InternalRow level with NO logical
    // rewrite at all: projections, global sorts, map-only transforms
    // and UnsafeRow field writes all run, and nothing is collected to
    // the driver. This is the honest "time to produce every output
    // row" — strictly more work than count() on the pruned set, so
    // r17 per-query numbers re-baseline (old→new deltas in PERF.md).
    def force(df: org.apache.spark.sql.DataFrame): Unit = ForceMethod match {
      case "toRdd" => df.queryExecution.toRdd.foreach(_ => ())
      case other => throw new IllegalStateException(
        s"unknown ForceMethod '$other' — update force() AND the artifact flag together")
    }

    // The fixed host-speed probe, one shot (the startup canary keeps
    // min-of-3; series points want the INSTANTANEOUS host speed, spikes
    // included — that's the drift being recorded). ~0.4 s clean; the
    // job-group watchdog bounds a stalled host; failures record nothing.
    val canaryTick = new java.util.concurrent.atomic.AtomicLong
    // `force = true` skips the every-10-queries throttle: pass/retry
    // boundaries always get a point (r21, r20 verdict item 1a — the r20
    // storm hit the retry passes, past the last series point at 255 s,
    // so the per-query min_at values there had no canary to normalize
    // against). The elapsed gate loosens to the budget itself: the
    // deadline is budget + 90 s and the probe is slice-bounded.
    def canaryPoint(force: Boolean): Unit =
      if ((force || canaryTick.incrementAndGet() % 10 == 0) && elapsed < budgetSec) {
        val t0 = System.nanoTime()
        val (_, ok) = withWatchdog("bench-canaryseg", sliceSec = 45.0) {
          spark.range(50000000L)
            .selectExpr("sum(cast(xxhash64(id) as decimal(38,0)))").collect()
        }
        if (ok) canarySeries.synchronized {
          canarySeries += ((elapsed, (System.nanoTime() - t0) / 1e9))
          // a storm-cancelled startup canary (canary_sec -1) repairs
          // itself from the series min once a probe lands
          if (canarySec <= 0) canarySec = canarySeries.map(_._2).min
        } else errors.remove("canaryseg") // a cancelled probe is not a query failure
      }
    def maybeCanaryPoint(): Unit = canaryPoint(force = false)

    // Freshness-aware storm gate (r22, r21 verdict item 2): the decision
    // to DEFER or fail-fast a query needs the host's state NOW, not the
    // state ten queries ago — when the latest series point is stale
    // (> CanaryFreshSec old), land a fresh probe first. A window in
    // which no probe can land (probe cancelled, or past budget) is
    // unmeasurable and treated as stormy: running into it can only
    // record numbers emit() itself will adjudicate dirty.
    def slownessFreshOrMax(): Double = {
      def fresh = canarySeries.synchronized {
        canarySeries.nonEmpty && (elapsed - canarySeries.last._1) <= CanaryFreshSec
      }
      if (!fresh) canaryPoint(force = true)
      if (!fresh) Double.MaxValue else hostSlownessAbs
    }

    // (seconds, ok, external cpu cores, io stall fraction during the run)
    // maxSliceSec caps the stretched slice: the last-chance pass bounds
    // it by the pre-deadline headroom (ADVICE r21 low — a 240 s
    // stretched slice past the hard deadline made the deadline-thread
    // emit the normal exit path), and post-deferral storm runs pass the
    // base slice so a still-stormy window fails fast instead of
    // stretching 8x per query.
    def timeOne(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame,
                sliceSec: Double,
                maxSliceSec: Double = Double.MaxValue): (Double, Boolean, Double, Double) = {
      val snap0 = cpuSnap()
      graft.core.Dispatch.drain() // clear notes from the previous query
      // slice scaled by the live host-slowness ratio (r21): a fixed
      // slice under a co-tenant stall cancels queries that pass clean —
      // the r20 false-failure shape. The hard deadline still bounds the JVM.
      val (dt, ok) = withWatchdog(s"bench-$name",
        math.min(scaledSlice(sliceSec, hostSlowness), maxSliceSec))(force(fn(spark, sfDir)))
      val forms = graft.core.Dispatch.drain()
      if (forms.nonEmpty) dispatchAtRun(name) = dispatchJson(forms)
      val snap1 = cpuSnap()
      // snapshot per-tag cached bytes BEFORE the release (cheap:
      // block-manager metadata only, no jobs); only non-zero entries
      // are recorded, so the map stays tiny for the cache-free majority
      try {
        val bytes = graft.core.CacheRegistry.trackedBytes(spark).filter(_._2 > 0)
        if (bytes.nonEmpty) cacheBytesAtRun(name) = tagBytesJson(bytes)
      } catch { case _: Throwable => () }
      // queries may persist() intermediates; drop them so one query's
      // cache never bleeds into the next one's memory budget (the
      // registry release clears graft's tracked handles; clearCache
      // sweeps anything persisted outside it)
      graft.core.CacheRegistry.releaseAll()
      spark.catalog.clearCache()
      // Post-slow-query probe (r22, run-4 forensics): a silent throttle
      // burst inflated three pass-1 queries 5-8x inside a 76 s series
      // gap — the every-10-queries tick samples too sparsely exactly
      // when queries run long. A forced point after any slow run (a)
      // stamps the window so emit/normalize can adjudicate the min and
      // (b) re-arms the pass-1 deferral for the NEXT queries mid-storm.
      // Clean runs pay this only on the genuinely-heavy tail (~0.4 s
      // per probe, a handful of queries).
      canaryPoint(force = dt > SlowQueryCanarySec)
      val ext = externalCores(snap0, snap1)
      val io = ioStallFraction(snap0, snap1, ncpu)
      // record every cancellation with its window coordinates; emit()
      // adjudicates dirtiness against the NEAREST series point (r21,
      // r20 verdict item 1 — see cancelEvents)
      if (!ok)
        cancelEvents.updateWith(name)(old => Some((elapsed, ext, io) :: old.getOrElse(Nil)))
      (dt, ok, ext, io)
    }

    // Record a successful timing: min-tracking + per-min external load
    // + the fixed settle rule. Returns true if this run improved the min.
    def record(name: String, dt: Double, ext: Double, io: Double,
               settled: TrieMap[String, Boolean]): Unit = {
      failures.remove(name)
      errors.remove(name)
      val prev = minTimes.getOrElse(name, Double.MaxValue)
      if (dt < prev) {
        minTimes(name) = dt; extAtMin(name) = ext; ioAtMin(name) = io
        minAtSec(name) = elapsed
      }
      else if (dt <= prev * 1.1 && quietRun(ext, io)) {
        // a quiet run CONFIRMING the min within 10% upgrades its
        // provenance: the number is real even if first recorded loaded
        extAtMin(name) = math.min(extAtMin.getOrElse(name, ext), ext)
        ioAtMin(name) = math.min(ioAtMin.getOrElse(name, io), io)
      }
      if (settledAfterRun(dt, prev, ext, io)) settled(name) = true
    }

    val all = SparkEntry.queries.toSeq.sortBy { case (n, _) => (tier(n), n) }
    def notePass(tag: String): Unit =
      loadPasses += f"$tag@${elapsed}%.0fs load1=$load1%.2f"
    // Startup storm-wait (r22, second refinement of r21 verdict item 2):
    // run 2 of this round showed the deferral arriving too late — a
    // startup storm ate t=0→298 s in the table warmup, a cancelled
    // startup canary and 16 storm-stretched JIT-warm slices, so pass 1
    // began with a quarter of the budget left. Sleep out a detected
    // storm BEFORE the optional warm pass (bounded to the first 30% of
    // budget) instead of burning slices into it.
    while (slownessFreshOrMax() >= DirtyCanaryRatio && elapsed < budgetSec * 0.3) {
      notePass(f"startup-storm-wait")
      Thread.sleep(10000)
    }
    // Pin the heavy tail's JIT: the LSH/ANN kernels are compiled JVM
    // loops whose FIRST execution carries interpreter + C2 compilation
    // cost — observed as pure run-to-run variance on identical binaries
    // (q41 4.9 s vs 8.7 s across rounds). One untimed pass over the
    // heavy tier (skipped when the budget is tight, and under a
    // still-active storm — the pass-2 min-of-2 covers cold-JIT noise,
    // while 16 storm-stretched warm slices cost ~200 s of budget) means
    // every timed run below is warm, so the emitted numbers are
    // steady-state throughput, reproducible across rounds.
    if (budgetSec - elapsed > 150 && slownessFreshOrMax() < DirtyCanaryRatio) {
      all.filter { case (n, _) => tier(n) == 2 }.foreach { case (name, fn) =>
        withWatchdog(s"bench-warm-$name", sliceSec = 30.0)(force(fn(spark, sfDir)))
        graft.core.CacheRegistry.releaseAll()
        spark.catalog.clearCache()
      }
    } else if (budgetSec - elapsed > 150) notePass("warmpass-skipped-storm")

    // Pass 1: one timing for everything, cost-ordered.
    notePass("pass1")
    // pre-tier-0 series point (r22, r21 verdict item 2): warmup + the
    // JIT warm pass run before the first timed query, so without this
    // the series' first point could land minutes in (run 11's series
    // began at t=164 s — exactly past the segment the q100–q112
    // residual needed adjudicated)
    canaryPoint(force = true)
    // Storm-aware deferral (r22, r21 verdict item 2): running a query
    // into a DETECTED storm burns budget recording a number emit() will
    // itself adjudicate dirty — the r21 driver run spent its whole
    // budget on 38 storm-inflated queries and left 81 unmeasured. While
    // the budget comfortably allows it (first half), a query that would
    // start under slowness ≥ DirtyCanaryRatio is pushed to the back of
    // the pass instead; when a full sweep has deferred (everything
    // pending is storm-blocked) the pass sleeps a slice so the storm
    // can pass rather than busy-looping. Past the deferral horizon the
    // pass runs regardless — but UNstretched (maxSliceSec = the base
    // slice), so a still-stormy window fails fast into adjudicable
    // `failed_dirty` entries instead of stretching 8x per query.
    val deferHorizon = budgetSec * 0.55
    val pending = scala.collection.mutable.Queue(all: _*)
    var deferStreak = 0
    while (pending.nonEmpty) {
      val q = pending.dequeue()
      val (name, fn) = q
      val remainingBudget = budgetSec - elapsed
      // Per-query slice: an even share of what's left, floored so normal
      // queries (sub-second unloaded) never trip it, capped at 120 s.
      // Over budget: a tight 10 s slice — cheap queries still record,
      // hangs cost 10 s each, and the hard deadline bounds the total.
      val slice =
        if (remainingBudget <= 0) 10.0
        else math.max(15.0, math.min(120.0, remainingBudget / math.max(1, pending.size + 1)))
      val slowNow = slownessFreshOrMax()
      if (slowNow >= DirtyCanaryRatio && elapsed < deferHorizon) {
        pending.enqueue(q)
        deferStreak += 1
        if (deferStreak >= pending.size) {
          loadPasses += f"storm-wait@${elapsed}%.0fs slow=${math.min(slowNow, 999.0)}%.1f"
          Thread.sleep(10000)
          deferStreak = 0
        }
      } else {
        deferStreak = 0
        val cap = if (slowNow >= DirtyCanaryRatio) slice else Double.MaxValue
        val (dt, ok, ext, io) = timeOne(name, fn, slice, cap)
        // record ONLY successful runs (ADVICE r21 medium: a cancelled
        // pass-1 run previously wrote its elapsed-at-cancel into
        // minTimes, and a later slower-but-successful retry could leave
        // that phantom as the reported min — a time at which the query
        // never completed)
        if (ok) {
          firstTimes(name) = dt
          minTimes(name) = dt
          extAtMin(name) = ext
          ioAtMin(name) = io
          minAtSec(name) = elapsed
        } else failures(name) = true
      }
    }
    pass1Done = true
    val settled = TrieMap.empty[String, Boolean]
    // Pass 2 — MANDATORY min-of-2 over EVERY query (r5 verdict: the
    // retry policy only covered the >2 s tier, so a load spike landing
    // on a 1–5 s query was recorded as-is with no second chance; six
    // mid-tier queries carried 3.6–8.3× load artifacts on unchanged
    // code). A clean full pass is ~45 s against a 420 s budget, so one
    // extra sweep is cheap insurance: every emitted number is a
    // best-of-two minimum, and a query whose two runs genuinely agree
    // (±10% both ways, externally quiet) is marked settled.
    // start gate 0.75 (was 0.7, r22): run 4's warm pass + a mid-pass-1
    // storm pushed pass-1's end to 0.88×budget and NOTHING re-timed the
    // three storm-inflated mins; the per-query 0.85 gate below already
    // bounds a late pass-2, so starting later is strictly more coverage
    if (elapsed < budgetSec * 0.75) {
      notePass("pass2")
      canaryPoint(force = true) // pass-boundary series point (r21)
      all.zipWithIndex.foreach { case ((name, fn), idx) =>
        // storm skip (r22): a pass-2 re-timing under a detected storm
        // can neither beat nor settle the min — it only burns budget.
        // The cheap check first; only when it reads dirty pay a fresh
        // probe to confirm (and to keep the series advancing while the
        // pass skips). Skipped queries stay unsettled, so the retry
        // loop picks them up in a quieter window.
        val stormy = hostSlownessAbs >= DirtyCanaryRatio &&
          slownessFreshOrMax() >= DirtyCanaryRatio
        if (elapsed < budgetSec * 0.85 && !stormy) {
          val slice = math.max(15.0, math.min(120.0,
            (budgetSec - elapsed) / math.max(1, all.size - idx)))
          val (dt, ok, ext, io) = timeOne(name, fn, slice)
          if (ok) record(name, dt, ext, io, settled)
        }
      }
    }
    // Improvement + clean-window passes (r6/r7 verdict task 1): re-run
    // failed, still-unsettled, and LOAD-CONTAMINATED >1 s queries while
    // budget remains. A query whose min was recorded with > ExtQuiet
    // external cores competing is never trusted: it stays a retry
    // target until a quiet-window run lands (which either confirms or
    // beats it), or budget runs out — in which case emit() stamps the
    // artifact `loaded:true`. When the box is externally busy RIGHT
    // NOW, sleeping is worth more than measuring: wait in 15 s slices
    // (budget-bounded) for the tenant spike to pass instead of burning
    // retries into known-dirty windows.
    var pass = 0
    var improving = true
    while (improving && pass < 6 && elapsed < budgetSec * 0.8) {
      val targets = all.filter { case (n, _) =>
        failures.getOrElse(n, false) ||
          (minTimes.getOrElse(n, 0.0) > 1.0 &&
            (!settled.getOrElse(n, false) ||
              !quietRun(extAtMin.getOrElse(n, 0.0), ioAtMin.getOrElse(n, 0.0)) ||
              // r22: a canary-dirty min (throttle storm the ext/io axes
              // can't see) stays retry-eligible like any loaded min
              canaryDirtyAtMin(n))) }
      improving = targets.nonEmpty
      if (improving) {
        // Probe current external load (both axes) over a short idle
        // window; wait out a busy box (max ~3 slices per pass, never
        // past 0.85).
        var probes = 0
        def probe(): (Double, Double) = {
          val s = cpuSnap(); Thread.sleep(1500); val e = cpuSnap()
          (externalCores(s, e), ioStallFraction(s, e, ncpu))
        }
        var (extNow, ioNow) = probe()
        while (!quietRun(extNow, ioNow) && probes < 3 && elapsed < budgetSec * 0.85) {
          loadPasses += f"wait@${elapsed}%.0fs ext=$extNow%.1f io=$ioNow%.2f"
          Thread.sleep(15000)
          val p = probe(); extNow = p._1; ioNow = p._2
          probes += 1
        }
        notePass(f"retry$pass ext=$extNow%.1f io=$ioNow%.2f")
        // retry-region series coverage (r21, r20 verdict item 1a): the
        // r20 storm hit exactly here, past the last pass-1 series point,
        // leaving the storm-hit min_at values with no canary to
        // normalize against
        canaryPoint(force = true)
        targets.foreach { case (name, fn) =>
          if (elapsed < budgetSec * 0.95) {
            // retries may have most of the budget to themselves — allow a
            // longer slice than pass 1 so a load-inflated heavy query can
            // still land a number (hard deadline still bounds the JVM)
            val slice = math.max(15.0, math.min(180.0, budgetSec - elapsed))
            val (dt, ok, ext, io) = timeOne(name, fn, slice)
            if (ok) record(name, dt, ext, io, settled)
          }
        }
      }
      pass += 1
    }
    // LAST-CHANCE failures-only pass (r21): when a startup storm eats
    // the whole budget in pass 1, the retry loop's elapsed gates never
    // admit the failures — r20's three false `failed` stamps and this
    // round's q58 all died exactly there, with ~90 s of pre-deadline
    // headroom unused (hard deadline = budget + 90 s). One bounded
    // retry per failure inside that headroom turns a storm-window
    // cancellation into a number whenever the storm has passed.
    val lastChance = all.filter { case (n, _) => failures.getOrElse(n, false) }
    lastChance.foreach { case (name, fn) =>
      if (elapsed < budgetSec + 40) {
        // slice capped at the pre-deadline headroom (ADVICE r21 low): a
        // 30 s base slice stretched 8x reached 240 s — past the hard
        // deadline — so the deadline thread halted mid-query and the
        // deadline-thread emit became the normal exit path
        val cap = math.max(5.0, budgetSec + 80 - elapsed)
        val (dt, ok, ext, io) = timeOne(name, fn, sliceSec = 30.0, maxSliceSec = cap)
        if (ok) record(name, dt, ext, io, settled)
      }
    }
    emit(partial = false)
    spark.stop()
  }
}
