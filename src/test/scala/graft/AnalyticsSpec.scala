package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.{functions => F}

import graft.core._

/** Edge-rule tests for §2.6 analytics: the operators where the naive
  * Spark builtin would be silently wrong (SURVEY §7.4 watch list). */
class AnalyticsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def frame(df: org.apache.spark.sql.DataFrame) = TadaFrame.ingest(df)

  test("rank is DENSE, ascending, nulls => null (not a rank)") {
    val f = frame(Seq[java.lang.Double](3.0, 1.0, null, 1.0, 2.0).toDF("v"))
    val got = Analytics.rankDense(f, "v", "r").records().tail.map(_(1))
    assert(got == Seq("3", "1", "(null)", "1", "2"))
    // the BY-VALUE plan (distinct-vocabulary window + join-back) is
    // row-for-row identical, including the null-in => null-out rule.
    // Positional comparison is sound even though a join output's physical
    // order is unspecified: records() re-applies frame order through the
    // unique __ord tiebreak, so it is deterministic under any join strategy
    // (the row-order contract note on rankDenseByValue).
    val gotBv = Analytics.rankDenseByValue(f, "v", "r").records().tail.map(_(1))
    assert(gotBv == got)
  }

  test("by-value forms: NaN and ±0.0 values match the window forms") {
    // The join-back relies on Spark's join-equality semantics for doubles:
    // NaN = NaN is TRUE and 0.0 = -0.0 is TRUE (grouping/join key
    // normalization), matching how the ordered window treats them (NaN
    // sorts above every double; ±0.0 tie). Pin that reliance explicitly
    // (r12 verdict task 5).
    val df = Seq[java.lang.Double](
      1.0, Double.NaN, 0.0, -0.0, null, Double.NaN, 2.0, -1.5).toDF("v")
    val f = frame(df)
    assert(Analytics.rankDenseByValue(f, "v", "r").records() ==
      Analytics.rankDenseWindow(f, "v", "r").records())
    assert(Analytics.percentileByValue(f, "v", "p").records() ==
      Analytics.percentileWindow(f, "v", "p").records())
    // chunked value-axis forms (r18): NaN pins to the top value chunk
    // and ties inside it exactly as the window form ties NaNs
    assert(Analytics.rankDenseChunked(f, "v", "r")(fail("no fallback")).records() ==
      Analytics.rankDenseWindow(f, "v", "r").records())
    assert(Analytics.percentileChunked(f, "v", "p")(fail("no fallback")).records() ==
      Analytics.percentileWindow(f, "v", "p").records())
    // NaN ranks above every real value; both NaNs share one dense rank
    // (vocabulary: -1.5, 0.0, 1.0, 2.0, NaN -> NaN = rank 5)
    val ranks = Analytics.rankDenseByValue(f, "v", "r").records().tail.map(_(1))
    assert(ranks(1) == ranks(5) && ranks(1) == "5")
  }

  test("by-value rank/percentile equal the window forms on ties/nulls/partitions") {
    // adversarial fixture: two partitions, ties, a null, an all-null
    // partition, a single-row partition, and a NULL PARTITION KEY (a
    // legitimate group the window form ranks within — the r13 DuckDB
    // fuzz caught the by-value join-back dropping it under plain ===)
    val df = Seq[(String, java.lang.Double)](
      ("a", 3.0), ("a", 1.0), ("a", null), ("a", 1.0), ("a", 2.0), ("a", 2.0),
      ("b", 5.0), ("b", 5.0), ("b", 7.0),
      ("c", null), ("c", null),
      ("d", 9.0),
      (null, 4.0), (null, 4.0), (null, 6.0), (null, null)).toDF("g", "v")
    val f = frame(df)
    def vals(t: TadaFrame, out: String) =
      t.df.select(F.col("g"), F.col("v"), F.col(out)).collect()
        .map(r => (Option(r.get(0)).map(_.toString).getOrElse(""),
          Option(r.get(1)), Option(r.get(2))))
        .toSeq.sortBy(x => (x._1, x._2.map(_.toString).getOrElse("")))
    val wantR = vals(Analytics.rankDenseWindow(f, "v", "r", Seq("g")), "r")
    val wantP = vals(Analytics.percentileWindow(f, "v", "p", Seq("g")), "p")
    assert(vals(Analytics.rankDenseByValue(f, "v", "r", Seq("g")), "r") == wantR)
    assert(vals(Analytics.percentileByValue(f, "v", "p", Seq("g")), "p") == wantP)
    // the chunked value-axis forms (r18) on the same adversarial fixture
    // — partitioned (null partition key included) and whole-frame
    assert(vals(Analytics.rankDenseChunked(f, "v", "r", Seq("g"))(fail("nf")), "r") == wantR)
    assert(vals(Analytics.percentileChunked(f, "v", "p", Seq("g"))(fail("nf")), "p") == wantP)
    // and with no partitioning (the whole-frame contract)
    val wantR0 = vals(Analytics.rankDenseWindow(f, "v", "r"), "r")
    val wantP0 = vals(Analytics.percentileWindow(f, "v", "p"), "p")
    assert(vals(Analytics.rankDenseByValue(f, "v", "r"), "r") == wantR0)
    assert(vals(Analytics.percentileByValue(f, "v", "p"), "p") == wantP0)
    assert(vals(Analytics.rankDenseChunked(f, "v", "r")(fail("nf")), "r") == wantR0)
    assert(vals(Analytics.percentileChunked(f, "v", "p")(fail("nf")), "p") == wantP0)
    // the dispatcher routes somewhere value-identical on this fixture too
    assert(vals(Analytics.rankDense(f, "v", "r", Seq("g")), "r") == wantR)
    assert(vals(Analytics.percentile(f, "v", "p", Seq("g")), "p") == wantP)
    // spot-pin the doubles are the exact integer ratios (bit-identical
    // to the window form, not approximately equal)
    val p = Analytics.percentileByValue(f, "v", "p", Seq("g")).df
      .filter(F.col("g") === "a" && F.col("v") === 2.0)
      .select("p").head().getDouble(0)
    assert(p == 2.0 / 5.0) // two non-null values strictly below, of 5
  }

  test("chunked rank/percentile: string values route through the binary-prefix image") {
    // shared-prefix strings (the c_name shape) — the image is NON-
    // injective collapse-prone only past 6 window bytes; colliding
    // values share a chunk and the within-chunk window ranks the real
    // value, so equality must hold regardless. Includes ties + null.
    val df = Seq[(String, String)](
      ("x", "doc-0000017"), ("x", "doc-0000003"), ("x", null),
      ("x", "doc-0000003"), ("y", "doc-0000099"), ("y", "doc-0000001"),
      ("y", "doc-00000010"), (null, "doc-0000042")).toDF("g", "s")
    val f = frame(df)
    def vals(t: TadaFrame, out: String) =
      t.df.select(F.col("g"), F.col("s"), F.col(out)).collect()
        .map(r => (Option(r.get(0)).map(_.toString).getOrElse(""),
          Option(r.get(1)).map(_.toString).getOrElse(""),
          Option(r.get(2)).map(_.toString).getOrElse("")))
        .toSeq.sorted
    assert(vals(Analytics.rankDenseChunked(f, "s", "r", Seq("g"))(fail("nf")), "r") ==
      vals(Analytics.rankDenseWindow(f, "s", "r", Seq("g")), "r"))
    assert(vals(Analytics.percentileChunked(f, "s", "p")(fail("nf")), "p") ==
      vals(Analytics.percentileWindow(f, "s", "p"), "p"))
    // dispatcher (r18): the raw-cardinality gate sends this ≤4096-distinct
    // string vocabulary to the BY-VALUE plan — which joins on the raw
    // string, so colliding images are irrelevant — and must equal the
    // window oracle (no injectivity precondition remains)
    val viaDispatch = Analytics.rankDense(f, "s", "r", Seq("g"))
    assert(viaDispatch.df.queryExecution.analyzed.toString.contains("__rdv_"),
      "string dispatcher did not pick the by-value plan under the raw-cardinality gate")
    assert(vals(viaDispatch, "r") ==
      vals(Analytics.rankDenseWindow(f, "s", "r", Seq("g")), "r"))
  }

  test("rank/percentile dispatcher: near-unique values take the chunked plan") {
    // 6000 distinct doubles > the 4096 by-value cap — the dispatcher
    // must pick the chunked form (observable: the plan carries the
    // chunk-offset join, not a corpus-sized distinct window), and the
    // values must equal the window oracle.
    val df = (0 until 6000).map(i => ((i * 37 % 6000) + 0.25, i % 3)).toDF("v", "g")
    val f = frame(df)
    val got = Analytics.rankDense(f, "v", "r")
    assert(got.df.queryExecution.analyzed.toString.contains("__rkc_off"),
      "dispatcher did not route a near-unique column to the chunked plan")
    // plan quality: the chunked form must never put a single-partition
    // window over the DATA — only over aggregate output (the tiny
    // per-chunk counts frame), the GroupOrderSpec/PrefixSpec contract
    def assertNoGlobalDataWindow(df: org.apache.spark.sql.DataFrame): Unit = {
      import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Window => LWindow}
      val bad = df.queryExecution.optimizedPlan.collect {
        case w: LWindow if w.partitionSpec.isEmpty &&
          w.collectFirst { case a: Aggregate => a }.isEmpty => w
      }
      assert(bad.isEmpty, s"single-partition window over full data:\n${bad.mkString("\n")}")
    }
    assertNoGlobalDataWindow(got.df)
    val want = Analytics.rankDenseWindow(f, "v", "r")
    def vals(t: TadaFrame) = t.df.select(F.col("v"), F.col("r")).collect()
      .map(r => (r.getDouble(0), r.getInt(1))).toSeq.sorted
    assert(vals(got) == vals(want))
    val gotP = Analytics.percentile(f, "v", "p")
    assert(gotP.df.queryExecution.analyzed.toString.contains("__pcc_off"))
    assertNoGlobalDataWindow(gotP.df)
    def valsP(t: TadaFrame) = t.df.select(F.col("v"), F.col("p")).collect()
      .map(r => (r.getDouble(0), r.getDouble(1))).toSeq.sorted
    assert(valsP(gotP) == valsP(Analytics.percentileWindow(f, "v", "p")))
  }

  test("percentile is EXCLUSIVE (strictly-below fraction), ties share min rank") {
    // values 1,1,2,4 -> pct(1)=0, pct(2)=0.5, pct(4)=0.75 — NOT percent_rank
    val f = frame(Seq(1.0, 1.0, 2.0, 4.0).toDF("v"))
    val got = Analytics.percentile(f, "v", "p").records().tail.map(_(1))
    assert(got == Seq("0", "0", "0.5", "0.75"))
  }

  test("bin edges are left-EXclusive right-INclusive; andLess/andMore open bins") {
    val f = frame(Seq(0.0, 1.0, 5.0, 5.5, 11.0).toDF("v"))
    val got = Analytics.bin(f, "v", Seq(0.0, 5.0, 10.0), "b",
      andLess = true, andMore = true).records().tail.map(_(1))
    // 0 -> <=0 (left edge NOT included in first bin); 5 included in 0-5
    assert(got == Seq("<=0", "0-5", "0-5", "5-10", ">10"))
  }

  test("percentileBin edges are left-INclusive right-EXclusive (opposite of bin)") {
    val f = frame(Seq(1.0, 2.0, 3.0, 4.0).toDF("v"))
    val got = Analytics.percentileBin(f, "v", Seq(0.0, 0.5, 1.0), "b")
      .records().tail.map(_(1))
    // pcts are 0, .25, .5, .75 -> first two in [0,.5), last two in [.5,1)
    assert(got == Seq("0-0.5", "0-0.5", "0.5-1", "0.5-1"))
  }

  test("cumSum: nulls contribute 0, result never null") {
    val f = frame(Seq[java.lang.Double](1.0, null, 2.0).toDF("v"))
    val got = Analytics.cumSum(f, "v", "cs").records().tail.map(_(1))
    assert(got == Seq("1", "1", "3"))
  }

  test("rollingN: incomplete tail windows reduce to null") {
    val f = frame(Seq(1.0, 2.0, 3.0).toDF("v"))
    val got = Rolling.rollingN(f, 2, "v", c => F.sum(c), "s").records().tail.map(_(1))
    assert(got == Seq("3", "5", "(null)"))
  }

  test("rollingDuration window is [t, t+d): right edge excluded") {
    val ts = Seq(0L, 500000L, 1000000L).map(us => new java.sql.Timestamp(us / 1000))
    val f = frame(ts.zip(Seq(1.0, 10.0, 100.0)).toDF("ts", "v"))
    // 1-second window from t=0 must include t=0 and t=0.5s but NOT t=1.0s
    val got = Rolling.rollingDuration(f, "ts", 1000000L, "v", c => F.sum(c), "s")
      .records().tail.map(_(2))
    assert(got == Seq("11", "110", "100"))
  }

  test("resample by week honors week start; duration floors to bucket") {
    // 2024-01-10 is a Wednesday; Monday-start week = 2024-01-08
    val f = frame(Seq(java.sql.Timestamp.valueOf("2024-01-10 13:45:00")).toDF("ts"))
    val wk = Analytics.resample(f, "ts", "week", "w").records().tail.head(1)
    assert(wk == "2024-01-08T00:00:00Z")
    val dur = Analytics.resampleDuration(f, "ts", 15L * 60 * 1000000, "d")
      .records().tail.head(1)
    assert(dur == "2024-01-10T13:45:00Z")
  }

  test("resample week accepts all seven start days (internal.go:2432-2438)") {
    // 2024-01-10 is a Wednesday. For each start day, the bucket is the
    // most recent such day at or before it (a start ON the day itself
    // buckets to that day, not a week earlier).
    val expected = Seq(
      "MONDAY" -> "2024-01-08", "TUESDAY" -> "2024-01-09",
      "WEDNESDAY" -> "2024-01-10", "THURSDAY" -> "2024-01-04",
      "FRIDAY" -> "2024-01-05", "SATURDAY" -> "2024-01-06",
      "SUNDAY" -> "2024-01-07")
    val f = frame(Seq(java.sql.Timestamp.valueOf("2024-01-10 13:45:00")).toDF("ts"))
    for ((day, want) <- expected) {
      val got = Analytics.resample(f, "ts", "week", "w", weekStart = day)
        .records().tail.head(1)
      assert(got == s"${want}T00:00:00Z", s"weekStart=$day")
    }
    intercept[IllegalArgumentException] {
      Analytics.resample(f, "ts", "week", "w", weekStart = "NOODLE")
    }
  }

  test("shift(n) pulls from n rows back in frame order") {
    val f = frame(Seq(("b", 2), ("a", 1), ("c", 3)).toDF("k", "v")).sort(Sorter("k"))
    val got = Analytics.shift(f, "v", 1, "prev").records().tail.map(_(2))
    assert(got == Seq("(null)", "1", "2"))
  }
}
