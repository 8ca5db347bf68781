package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the bench's load-adjudication policy (r6/r7 verdict task 1):
  * the settle rule must never accept a load spike as "real cost", and
  * the external-load estimator must ignore our own JVM's cpu.
  */
class BenchPolicySpec extends AnyFunSuite {

  test("the artifact's forced claim derives from the single ForceMethod constant") {
    // ADVICE r17: "forced":true was a hardcoded literal in both JSON
    // emits — a regression back to count()-probing would have kept
    // asserting it. Now emit reads forcedClaim and force() dispatches
    // on ForceMethod, so this pin breaks the moment either moves.
    assert(Bench.ForceMethod == "toRdd")
    assert(Bench.forcedClaim)
  }

  test("settle requires genuine two-sided agreement") {
    // agreeing pair, quiet box: settled
    assert(Bench.settledAfterRun(dt = 1.00, prevMin = 1.05, extCores = 0.1))
    assert(Bench.settledAfterRun(dt = 1.05, prevMin = 1.00, extCores = 0.0))
  }

  test("a WORSE re-run never settles (the r6/r7 double-spike shape)") {
    // pass-1 spiked to 5.28s, pass-2 spiked to 6.0s: old rule settled
    // this (dt >= prev*0.9) and excluded it from retries forever
    assert(!Bench.settledAfterRun(dt = 6.0, prevMin = 5.28, extCores = 0.0))
    // just above the 10% agreement band
    assert(!Bench.settledAfterRun(dt = 1.12, prevMin = 1.0, extCores = 0.0))
  }

  test("a big improvement does not settle — keep retrying downward") {
    assert(!Bench.settledAfterRun(dt = 0.5, prevMin = 5.0, extCores = 0.0))
  }

  test("an externally-loaded run never settles, even when agreeing") {
    assert(!Bench.settledAfterRun(dt = 1.0, prevMin = 1.0, extCores = 6.4))
  }

  private def snap(busy: Long = 0L, iowait: Long = 0L, psiIo: Long = 0L,
                   psiMem: Long = 0L, proc: Long = 0L, wall: Long = 0L) =
    Bench.LoadSnap(busy, iowait, psiIo, psiMem, proc, wall)

  test("externalCores subtracts our own cpu from machine busy time") {
    // 10 s wall; machine burned 8000 jiffies = 80 cpu-sec; we burned
    // 60 cpu-sec ourselves => 2.0 external cores
    val a = snap(busy = 100000L)
    val b = snap(busy = 108000L, proc = 60_000_000_000L, wall = 10_000_000_000L)
    assert(math.abs(Bench.externalCores(a, b) - 2.0) < 1e-9)
  }

  test("externalCores is 0 on unmeasurable snapshots and never negative") {
    assert(Bench.externalCores(snap(busy = -1L),
      snap(busy = 100L, proc = 1L, wall = 1_000_000_000L)) == 0.0)
    // we measured more cpu than the machine reports busy (USER_HZ
    // rounding): clamp to 0, not negative
    val a = snap(busy = 1000L)
    val b = snap(busy = 1010L, proc = 5_000_000_000L, wall = 1_000_000_000L)
    assert(Bench.externalCores(a, b) == 0.0)
  }

  // --- r10: the IO blind spot (r8 verdict). A D-state co-tenant shows
  // ~0 external cpu but high PSI io stall / machine iowait; the quiet
  // test must flag it dirty and the settle rule must refuse it.

  test("ioStallFraction sees PSI io stall that external cpu misses") {
    // 10 s wall; PSI io some-stall advanced 4 s => 40% stall
    val a = snap()
    val b = snap(psiIo = 4_000_000L, wall = 10_000_000_000L)
    assert(math.abs(Bench.ioStallFraction(a, b, cpus = 32) - 0.4) < 1e-9)
    // same window carries zero external cpu: the r8 test called it clean
    assert(Bench.externalCores(a, b) == 0.0)
    assert(!Bench.quietRun(Bench.externalCores(a, b), Bench.ioStallFraction(a, b, 32)))
  }

  test("ioStallFraction falls back to normalized machine iowait") {
    // PSI unreadable (-1); 10 s wall, 3200 iowait jiffies = 32 core-sec
    // over 32 cpus => 10% of machine capacity waiting on IO
    val a = snap(psiIo = -1L, psiMem = -1L)
    val b = snap(iowait = 3200L, psiIo = -1L, psiMem = -1L, wall = 10_000_000_000L)
    assert(math.abs(Bench.ioStallFraction(a, b, cpus = 32) - 0.1) < 1e-9)
  }

  test("ioStallFraction is 0 on unmeasurable snapshots") {
    val a = snap(iowait = -1L, psiIo = -1L, psiMem = -1L)
    val b = snap(iowait = -1L, psiIo = -1L, psiMem = -1L, wall = 10_000_000_000L)
    assert(Bench.ioStallFraction(a, b, cpus = 32) == 0.0)
  }

  test("agreeing runs inside the same IO-dirty window never settle") {
    // the r8 failure shape: two passes agree at 10.4 s, ext=0.0, but
    // the box is IO-thrashed — must stay retry-eligible
    assert(!Bench.settledAfterRun(dt = 10.4, prevMin = 10.4, extCores = 0.0, ioStall = 0.4))
    // and a genuinely quiet agreeing pair still settles
    assert(Bench.settledAfterRun(dt = 10.4, prevMin = 10.4, extCores = 0.0, ioStall = 0.01))
  }

  test("per-query cache-bytes snapshots serialize as parseable JSON (r11 verdict 8)") {
    // the cache_bytes field rides BENCH_DETAIL.json; a malformed
    // fragment would break the judge's parse of the whole record
    assert(Bench.tagBytesJson(Nil) == "{}")
    val j = Bench.tagBytesJson(Seq("cosinePairsComplete.sims" -> 6522576L,
      "simhashClusters.words" -> 96176L))
    assert(j == """{"cosinePairsComplete.sims":6522576,"simhashClusters.words":96176}""")
  }

  test("CacheRegistry rejects tags that would corrupt the unescaped JSON") {
    // tagBytesJson embeds tags verbatim; the registry is where the
    // JSON-safety invariant lives (r12 verdict task 6). The hostile tag
    // must fail FAST at track() — before anything is persisted.
    val spark = TestSpark.spark
    val df = spark.range(1).toDF("x")
    val e = intercept[IllegalArgumentException] {
      graft.core.CacheRegistry.track("""bad"tag""", df)
    }
    assert(e.getMessage.contains("JSON-safe"))
    intercept[IllegalArgumentException] {
      graft.core.CacheRegistry.track("bad\\tag", df)
    }
    // rejected tags were never recorded nor persisted
    assert(!graft.core.CacheRegistry.trackedTags.exists(_.startsWith("bad")))
    assert(df.storageLevel == org.apache.spark.storage.StorageLevel.NONE)
    // the dotted identifiers every production tag uses still pass
    val ok = graft.core.CacheRegistry.track("spec.ok_tag-1", df)
    assert(graft.core.CacheRegistry.trackedTags.contains("spec.ok_tag-1"))
    ok.unpersist()
  }

  test("CacheRegistry PlanKey failure is counted and logged, never a wrong hit (r16 verdict)") {
    // A throwing PlanKey used to disable the re-track guard SILENTLY —
    // every such track persisted a fresh copy with no signal. It must
    // stay fail-open (a weaker schema-level key could hand a DIFFERENT
    // frame to the caller — a correctness bug) but be observable.
    val spark = TestSpark.spark
    import graft.core.CacheRegistry
    CacheRegistry.releaseAll()
    val df = spark.range(4).toDF("x")
    val before = CacheRegistry.planKeyFailures
    CacheRegistry.failPlanKeysForTest = true
    try {
      val a = CacheRegistry.track("spec.pkfail", df)
      val b = CacheRegistry.track("spec.pkfail", df)
      assert(CacheRegistry.planKeyFailures == before + 2,
        "each failed key computation must be counted")
      // fail-open: two entries under the tag (the memory cost is the
      // documented tradeoff; a fabricated hit would be worse)
      assert(CacheRegistry.trackedTags.count(_ == "spec.pkfail") == 2)
      assert(a.storageLevel != org.apache.spark.storage.StorageLevel.NONE)
      assert(b.storageLevel != org.apache.spark.storage.StorageLevel.NONE)
    } finally {
      CacheRegistry.failPlanKeysForTest = false
      CacheRegistry.releaseAll()
    }
    // with keys working again, the re-track guard still dedups
    val c = CacheRegistry.track("spec.pkok", df)
    val d = CacheRegistry.track("spec.pkok", df)
    assert(CacheRegistry.trackedTags.count(_ == "spec.pkok") == 1)
    assert(c eq d)
    CacheRegistry.releaseAll()
  }

  test("the three vocabulary caps are ONE shared constant (r18 verdict item 5)") {
    assert(graft.core.Prefix.VocabCap == 4096)
    assert(graft.core.Analytics.ByValueMaxDistinct == graft.core.Prefix.VocabCap)
    assert(graft.core.TadaGrouped.MedianVocabCap == graft.core.Prefix.VocabCap)
  }

  test("dispatch tags serialize as parseable JSON (r19, r18 verdict item 4)") {
    assert(Bench.dispatchJson(Nil) == "{}")
    assert(Bench.dispatchJson(Seq(
      ("rankDense", "chunked"), ("rankDense", "chunked"), ("median", "byValue"))) ==
      """{"median":"byValue","rankDense":"chunked"}""")
  }

  test("registered scale queries keep their dispatch forms across all three SFs (r19; matrix r20)") {
    // a silent dispatch flip (an HLL estimate drifting across the
    // vocabulary cap, new driver data) would change plan shape invisibly
    // between rounds — pin the form each headline scale query takes AT
    // EACH SF (r20, r19 verdict item 4: the designed gate matrix —
    // q114 window at sf0.001, banded at sf0.01/sf0.1 — was previously
    // verified by hand from bench runs). Plans are built (not executed);
    // dispatch decisions happen at construction, so the only jobs this
    // runs are the memoized bounds jobs.
    val spark = TestSpark.spark
    // the cardinality gates compare against spark.sql.shuffle.partitions
    // — the matrix pins the PRODUCTION sessions (Bench/Verify run at 32),
    // not the 4-partition test session (where the few-keys gate "4 keys
    // < partitions" would read 4 < 4 = false and flip q117–q119)
    val oldK = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    def formsOf(dir: String, name: String): Map[String, String] = {
      graft.core.Dispatch.drain()
      graft.queries.Registry.all.find(_.name == name).get.build(spark, dir)
      graft.core.Dispatch.drain().groupBy(_._1).map { case (op, fs) =>
        op -> fs.map(_._2).distinct.sorted.mkString(",") }
    }
    val sfs = Seq("sf0.001", "sf0.01", "sf0.1").map(s => s"/root/testdata/$s")
      .filter(d => new java.io.File(s"$d/lineitem.parquet").exists())
    assume(sfs.nonEmpty, "no testdata present")
    try for (dir <- sfs) {
      val sfTag = dir.split("/").last
      def check(name: String, op: String, want: String => Boolean, label: String): Unit = {
        val got = formsOf(dir, name).get(op)
        assert(got.exists(want), s"$name@$sfTag: $op form ${got.getOrElse("(none)")}, wanted $label")
      }
      check("q110_rank_dense_chunked", "rankDense", _ == "chunked", "chunked")
      // ~1.5k distinct at sf0.001 (under the 4096 vocabulary) → byValue;
      // ~15k/150k at sf0.01/sf0.1 → chunked: the designed transition
      if (sfTag == "sf0.001")
        check("q111_percentile_chunked", "percentile",
          f => f == "byValue" || f == "chunked", "byValue|chunked")
      else check("q111_percentile_chunked", "percentile", _ == "chunked", "chunked")
      check("q112_grouped_median_by_value", "median", _ == "byValue", "byValue")
      check("q113_rolling_duration_frame", "rollingDuration", _ == "chunked", "chunked")
      check("q115_rank_skewed_axis", "rankDense", _ == "chunked", "chunked")
      check("q116_rolling_duration_grouped_chunked", "rollingDuration",
        _.contains("keyedChunked"), "keyedChunked")
      // q114's designed gate: ~4.6k groups at sf0.001 sits under the
      // 32768 window bound → window; sf0.01+ crosses it → banded
      check("q114_sorted_group_near_unique_key", "rankRep",
        f => if (sfTag == "sf0.001") f == "window" else f == "banded",
        if (sfTag == "sf0.001") "window" else "banded")
      // the whole-frame prefix family notes its form as of r20 — pin the
      // two r19 incident shapes: q101 (NTZ sort key, the silent-fallback
      // hole) and q109 (string-enum key, the lowCardChunk path) must
      // stay chunked at every SF
      check("q101_cumsum_frame", "cumSum", _ == "chunked", "chunked")
      check("q109_shift_string_enum_key", "shift", _ == "chunked", "chunked")
      // r20 composed grouped rows-frame forms (q117–q119): 4 key values
      // (3 statuses + a punched-null stripe) at every SF sit far under
      // the partition count → the few-keys gate must compose at all SFs
      check("q117_shift_grouped_few_keys", "shift", _ == "keyedChunked", "keyedChunked")
      check("q118_cumsum_grouped_few_keys", "cumSum", _ == "keyedChunked", "keyedChunked")
      check("q119_rollingn_grouped_few_keys", "rollingN", _ == "keyedChunked", "keyedChunked")
      // align's few-keys escape (r20): both the 25-nation q21 and the
      // punched-null q120 sit under 32 partitions → aggJoin at all SFs
      check("q21_align_window", "align", _ == "aggJoin", "aggJoin")
      check("q120_align_grouped_null_key", "align", _ == "aggJoin", "aggJoin")
    } finally spark.conf.set("spark.sql.shuffle.partitions", oldK)
  }

  test("watchdog slices scale with host slowness, clamped (r21, r20 verdict item 1b)") {
    // quiet host: the base slice unchanged — a 15 s slice is an honest
    // hang bound when the canary is at its window best
    assert(Bench.scaledSlice(15.0, 1.0) == 15.0)
    // sub-1 ratios never SHRINK a slice (a faster-than-anchor probe is
    // measurement noise, not headroom)
    assert(Bench.scaledSlice(15.0, 0.5) == 15.0)
    // a 3x co-tenant stall stretches the slice 3x — the r20 storm shape
    // where 1.8-4.7 s queries were cancelled at 10-15 s slices under a
    // ~70x stall
    assert(Bench.scaledSlice(15.0, 3.0) == 45.0)
    // ...but never past the clamp: the hard deadline must stay reachable
    assert(Bench.scaledSlice(15.0, 100.0) == 15.0 * Bench.MaxSliceScale)
    assert(Bench.MaxSliceScale >= 4.0,
      "the clamp must at least cover the storm ratios r20 documented")
    assert(Bench.DirtyCanaryRatio > 1.0 && Bench.DirtyCanaryRatio <= 2.0,
      "dirty-canary threshold should flag real stalls without flagging noise")
    // a stale canary cannot certify a cancellation clean: micro-storms
    // fit between samples (the q58 78 s-gap shape), so the freshness
    // bound must be tight enough to matter and loose enough to ever fire
    assert(Bench.CanaryFreshSec >= 10.0 && Bench.CanaryFreshSec <= 60.0)
  }

  test("a whole-window storm cannot certify itself clean (r22, ADVICE r21 low)") {
    // clean window: the series min IS the best — the clamp is inactive
    assert(Bench.clampedBest(0.43, 32) == 0.43)
    assert(Bench.clampedBest(0.75, 8) == 0.75)
    // storm spanning every point: best clamps to the per-cpus ceiling,
    // so a 28 s canary reads ~18x slow instead of 1.0x
    assert(Bench.clampedBest(28.0, 32) == Bench.cleanCanaryCeiling(32))
    assert(28.0 / Bench.clampedBest(28.0, 32) > Bench.DirtyCanaryRatio)
    // the ceiling is generous vs the measured clean values (0.42 at 32
    // cores, 0.75 at 8): a merely-warm host must never read stormy
    assert(Bench.cleanCanaryCeiling(32) >= 3 * 0.42)
    assert(Bench.cleanCanaryCeiling(8) >= 3 * 0.75)
  }

  test("scratch directories (containment wave spill) are deleted at releaseAll (r16 ADVICE)") {
    val spark = TestSpark.spark
    import graft.core.CacheRegistry
    val dir = java.nio.file.Files.createTempDirectory("graft-scratch-spec").toFile
    val sub = new java.io.File(dir, "wave-0.parquet")
    spark.range(8).write.mode("overwrite").parquet(sub.toString)
    assert(sub.exists())
    CacheRegistry.trackScratch(spark, dir.toString)
    CacheRegistry.releaseAll()
    assert(!dir.exists(),
      "releaseAll must delete registered scratch dirs (one leaked " +
        "answer-sized parquet per containment call otherwise)")
    // idempotent: a second release with nothing registered is a no-op
    CacheRegistry.releaseAll()
  }
}
