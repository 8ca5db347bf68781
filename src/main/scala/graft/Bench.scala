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
  *  6. The JVM shutdown hook still emits on an external SIGTERM that
  *     lands before our deadline.
  *
  * Start/end loadavg ride along for forensics.
  */
object Bench {
  private val emitted = new AtomicBoolean(false)
  private val minTimes = TrieMap.empty[String, Double]
  private val firstTimes = TrieMap.empty[String, Double]
  private val failures = TrieMap.empty[String, Boolean]
  private val errors = TrieMap.empty[String, String]
  // `partial` in the JSON means pass 1 did NOT cover every query — a
  // deadline that fires during the optional improvement passes still
  // yields a complete artifact and must not be labeled partial.
  @volatile private var pass1Done = false
  @volatile private var sfDirSeen = ""
  @volatile private var loadStart = -1.0

  /** Expected-cost tier by name: 0 = sub-second relational, 1 = text
    * scans, 2 = dedup/ANN/LSH pipeline tail. Unknown names sort by tier
    * 0 (new relational ops are cheap until proven otherwise). */
  private def tier(name: String): Int = {
    val heavy = Set("q40_exact_dedup", "q41_minhash_lsh", "q42_simhash",
      "q43_ngram_jaccard", "q44_embedding_dedup", "q45_knn_brute",
      "q46_knn_lsh", "q55_cosine_pairs", "q56_knn_ivf", "q58_dup_clusters")
    val text = Set("q47_langid", "q48_quality", "q49_token_count",
      "q50_fingerprint", "q51_multimodal_meta", "q52_multimodal_decode",
      "q62_tfidf", "q66_repetition", "q67_chunk_dedup", "q70_heavy_hitters",
      "q71_redact", "q72_frame_sample", "q73_curation_funnel",
      "q74_winnow", "q75_unigram_logprob", "q76_contamination")
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
    // raw stdout, single line: sbt [info] prefixes and log4j noise both
    // broke driver-side parsing before; System.out directly is safest
    System.out.println(
      s"""{"metric":"total","value":$total,"unit":"sec","queries":${m(minTimes)},"first":${m(firstTimes)},"failed":$failed,"errors":$errs,"partial":$partial,"load_start":$loadStart,"load_end":$load1,"sf":"$sfDirSeen"}""")
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

    def timeOne(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame,
                sliceSec: Double): (Double, Boolean) = {
      val r = withWatchdog(s"bench-$name", sliceSec)(fn(spark, sfDir).count())
      // queries may persist() intermediates; drop them so one query's
      // cache never bleeds into the next one's memory budget
      spark.catalog.clearCache()
      r
    }

    val all = SparkEntry.queries.toSeq.sortBy { case (n, _) => (tier(n), n) }
    // Pin the heavy tail's JIT: the LSH/ANN kernels are compiled JVM
    // loops whose FIRST execution carries interpreter + C2 compilation
    // cost — observed as pure run-to-run variance on identical binaries
    // (q41 4.9 s vs 8.7 s across rounds). One untimed pass over the
    // heavy tier (skipped when the budget is tight) means every timed
    // run below is warm, so the emitted numbers are steady-state
    // throughput, reproducible across rounds.
    if (budgetSec - elapsed > 150) {
      all.filter { case (n, _) => tier(n) == 2 }.foreach { case (name, fn) =>
        withWatchdog(s"bench-warm-$name", sliceSec = 30.0)(fn(spark, sfDir).count())
        spark.catalog.clearCache()
      }
    }
    // Pass 1: one timing for everything, cost-ordered.
    all.zipWithIndex.foreach { case ((name, fn), idx) =>
      val remainingQueries = all.size - idx
      val remainingBudget = budgetSec - elapsed
      // Per-query slice: an even share of what's left, floored so normal
      // queries (sub-second unloaded) never trip it, capped at 120 s.
      // Over budget: a tight 10 s slice — cheap queries still record,
      // hangs cost 10 s each, and the hard deadline bounds the total.
      val slice =
        if (remainingBudget <= 0) 10.0
        else math.max(15.0, math.min(120.0, remainingBudget / math.max(1, remainingQueries)))
      val (dt, ok) = timeOne(name, fn, slice)
      firstTimes(name) = dt
      minTimes(name) = dt
      if (!ok) failures(name) = true
    }
    pass1Done = true
    val settled = TrieMap.empty[String, Boolean]
    // Pass 2 — MANDATORY min-of-2 over EVERY query (r5 verdict: the
    // retry policy only covered the >2 s tier, so a load spike landing
    // on a 1–5 s query was recorded as-is with no second chance; six
    // mid-tier queries carried 3.6–8.3× load artifacts on unchanged
    // code). A clean full pass is ~45 s against a 420 s budget, so one
    // extra sweep is cheap insurance: every emitted number is now a
    // best-of-two minimum, and a query whose two runs agree within 10%
    // is marked settled (its cost is real, not load).
    if (elapsed < budgetSec * 0.7) {
      all.zipWithIndex.foreach { case ((name, fn), idx) =>
        if (elapsed < budgetSec * 0.85) {
          val slice = math.max(15.0, math.min(120.0,
            (budgetSec - elapsed) / math.max(1, all.size - idx)))
          val (dt, ok) = timeOne(name, fn, slice)
          if (ok) {
            failures.remove(name)
            errors.remove(name)
            val prev = minTimes.getOrElse(name, Double.MaxValue)
            if (dt < prev) minTimes(name) = dt
            if (dt >= prev * 0.9) settled(name) = true
          }
        }
      }
    }
    // Improvement passes: re-run failed and still-unsettled >1 s
    // queries while budget remains — a load spike spanning both full
    // passes is healed by any later clean window; a watchdog kill gets
    // another chance. A retry that doesn't beat the current min by ≥10%
    // marks the query settled — no further retries, so a clean run
    // does two full passes + one confirmation retry per slow query
    // instead of burning the whole budget re-measuring stable numbers.
    var pass = 0
    var improving = true
    while (improving && pass < 3 && elapsed < budgetSec * 0.8) {
      val targets = all.filter { case (n, _) =>
        failures.getOrElse(n, false) ||
          (minTimes.getOrElse(n, 0.0) > 1.0 && !settled.getOrElse(n, false)) }
      improving = targets.nonEmpty
      targets.foreach { case (name, fn) =>
        if (elapsed < budgetSec * 0.95) {
          // retries may have most of the budget to themselves — allow a
          // longer slice than pass 1 so a load-inflated heavy query can
          // still land a number (hard deadline still bounds the JVM)
          val slice = math.max(15.0, math.min(180.0, budgetSec - elapsed))
          val (dt, ok) = timeOne(name, fn, slice)
          if (ok) {
            failures.remove(name)
            errors.remove(name)
            val prev = minTimes.getOrElse(name, Double.MaxValue)
            if (dt < prev) minTimes(name) = dt
            if (dt >= prev * 0.9) settled(name) = true
          }
        }
      }
      pass += 1
    }
    emit(partial = false)
    spark.stop()
  }
}
