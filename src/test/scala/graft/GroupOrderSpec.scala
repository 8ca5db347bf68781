package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.{DataFrame, functions => F}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Window => LWindow}

import graft.core._

/** r14 (verdict item 1): grouping/positional-picking a SORTED frame must
  * not recompute the frame ordinal through a GLOBAL one-partition
  * `row_number` over the data. In-group positions come from a
  * partition-local window over the group keys; the group ordinal is ranked
  * on the REDUCED output (#groups rows) from each group's
  * frame-order-first representative. Semantics pinned against the
  * reference contract (first appearance in FRAME order,
  * internal.go:1399-1424) on multi-partition fixtures with desc sorts,
  * null keys, and stringified grouping. */
class GroupOrderSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def multi[T <: Product : scala.reflect.runtime.universe.TypeTag
                                 : scala.reflect.ClassTag](
      rows: Seq[T], parts: Int): TadaFrame = {
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows, parts))
    TadaFrame.ingest(df)
  }

  /** No window over the full data without a partition spec (empty-
    * partition windows over aggregate output — the tiny reduced frame —
    * are the accepted tiny-frame shape, as in PrefixSpec). */
  private def assertNoGlobalDataWindow(df: DataFrame): Unit = {
    val bad = df.queryExecution.optimizedPlan.collect {
      case w: LWindow if w.partitionSpec.isEmpty &&
        w.collectFirst { case a: Aggregate => a }.isEmpty => w
    }
    assert(bad.isEmpty, s"single-partition window over full data:\n${bad.mkString("\n")}")
  }

  // ingest order: groups appear b, a, c; sorted by v: c(1), a(2), b(3|4), d(9)
  private def fixture: TadaFrame = multi(Seq(
    GRow("b", 3L), GRow("a", 2L), GRow("c", 1L), GRow("b", 4L),
    GRow("d", 9L), GRow("a", 5L)), 3)

  test("reduce on a sorted frame: group order follows the sort (asc/desc)") {
    val f = fixture.sort(Sorter("v"))
    val got = f.groupBy("k").sum("v").records().tail.map(_.head)
    assert(got == Seq("c", "a", "b", "d")) // first appearance in v-asc order
    val gotD = fixture.sort(Sorter("v", descending = true))
      .groupBy("k").sum("v").records().tail.map(_.head)
    assert(gotD == Seq("d", "a", "b", "c"))
    assertNoGlobalDataWindow(f.groupBy("k").sum("v").df)
  }

  test("positional first/last on a sorted frame: picks AND group order follow the sort") {
    val f = fixture.sort(Sorter("v", descending = true))
    // per group, v-desc order: a→(5,2), b→(4,3), c→(1), d→(9)
    val firsts = f.groupBy("k").first("v").records().tail
    assert(firsts == Seq(Seq("d", "9"), Seq("a", "5"), Seq("b", "4"), Seq("c", "1")))
    val lasts = f.groupBy("k").last("v").records().tail
    assert(lasts == Seq(Seq("d", "9"), Seq("a", "2"), Seq("b", "3"), Seq("c", "1")))
    val nth1 = f.groupBy("k").nth(1, "v").records().tail
    assert(nth1 == Seq(Seq("d", "(null)"), Seq("a", "2"), Seq("b", "3"), Seq("c", "(null)")))
    assertNoGlobalDataWindow(f.groupBy("k").first("v").df)
  }

  test("a later order-sensitive op walks sorted-group output in group order") {
    // the r13 bug class: head(2) after a sorted-frame reduce must take the
    // first two groups in SORT order, not ingest order
    val f = fixture.sort(Sorter("v")).groupBy("k").sum("v")
    assert(f.head(2).records().tail.map(_.head) == Seq("c", "a"))
    val p = fixture.sort(Sorter("v")).groupBy("k").first("v")
    assert(p.head(2).records().tail.map(_.head) == Seq("c", "a"))
  }

  test("sorted reduce with null sort keys: nulls-last group ordering") {
    val rows = Seq(KRow("x", null), KRow("y", 2.0), KRow("x", 1.0), KRow("z", null))
    val f = multi(rows, 2).sort(Sorter("v"))
    // v asc nulls last: x(1.0), y(2.0), x(null), z(null) → groups x, y, z
    val got = f.groupBy("k").count("v").records().tail.map(_.head)
    assert(got == Seq("x", "y", "z"))
  }

  test("stringified grouping on a sorted frame keeps sort-order group ordinals") {
    val rows = Seq(KRow("b", 3.0), KRow("a", 1.0), KRow("b", 2.0), KRow("a", 4.0))
    val f = multi(rows, 2).sort(Sorter("v"))
    val got = f.groupByStringified("k").sum("v").records().tail
    assert(got.map(_.head) == Seq("a", "b")) // a first (v=1.0 < 2.0)
    assertNoGlobalDataWindow(f.groupByStringified("k").sum("v").df)
  }

  test("multi-key sort (asc k, desc v) group ordinals and tiebreaks") {
    val rows = Seq(GRow("b", 1L), GRow("a", 7L), GRow("a", 3L), GRow("b", 8L))
    val f = multi(rows, 2).sort(Sorter("k"), Sorter("v", descending = true))
    // frame order: (a,7),(a,3),(b,8),(b,1) → groups a, b; first picks 7, 8
    val got = f.groupBy("k").first("v").records().tail
    assert(got == Seq(Seq("a", "7"), Seq("b", "8")))
  }

  test("unsorted frames keep the free ingest ordinal (no windows added)") {
    val f = fixture.groupBy("k").sum("v")
    assert(f.records().tail.map(_.head) == Seq("b", "a", "c", "d"))
    val wins = f.df.queryExecution.optimizedPlan.collect { case w: LWindow => w }
    assert(wins.isEmpty, "unsorted reduce must not plan any window")
  }

  test("anchorOrder (drop a sort key) materializes order chunked, not global") {
    val f = fixture.sort(Sorter("v")).dropCols("v")
    assert(f.records().tail.map(_.head) == Seq("c", "a", "b", "b", "a", "d"))
    assertNoGlobalDataWindow(f.df)
  }

  test("order-key overwrite (cumSum onto the key) stays chunked and anchored") {
    val rows = Seq(GRow("a", 3L), GRow("b", 1L), GRow("c", 2L))
    val f = multi(rows, 2).sort(Sorter("v"))
    val got = Analytics.cumSum(f, "v", "v")
    // anchored order b(1),c(2),a(3) → cumsum 1,3,6 written in that order
    assert(got.records().tail == Seq(Seq("b", "1"), Seq("c", "3"), Seq("a", "6")))
    assertNoGlobalDataWindow(got.df)
  }

  test("append after anchorOrder: banded ordinals stay in disjoint bands") {
    // the r14 banded materialized ordinal (chunk << 33 | row) inherits the
    // old band bits, so `anchored` KEEPS the frame's band claim — an append
    // right after an anchor must still place appended rows strictly after
    // every anchored row
    val a = multi(Seq(GRow("b", 2L), GRow("a", 1L), GRow("c", 3L)), 2)
      .sort(Sorter("v")).dropCols("v") // anchor: order materialized into __ord
    val b = multi(Seq(GRow("x", 9L), GRow("y", 8L)), 2).dropCols("v")
    val got = a.append(b).records().tail.map(_.head)
    assert(got == Seq("a", "b", "c", "x", "y"))
    // and a chunked prefix op over the appended frame still matches the
    // sequential window form (chunk monotonicity across anchor + band)
    val a2 = multi(Seq(GRow("b", 2L), GRow("a", 1L), GRow("c", 3L)), 2)
      .sort(Sorter("v"))
    val f = Analytics.cumSum(a2, "v", "v") // anchors, then chunked cumsum
      .append(multi(Seq(GRow("x", 9L)), 1))
    assert(Analytics.shift(f, "v", 1, "s").records() ==
      Analytics.shiftWindow(f, "v", 1, "s").records())
  }

  test("arranged: grouped view plans chunked, rows regroup in frame order") {
    val f = fixture.sort(Sorter("v"))
    val arr = f.groupBy("k").arranged
    // frame order by v: c1, a2, b3, b4, a5, d9 → groups c, a, b, d; rows
    // regrouped with in-group frame order kept
    assert(arr.records().tail == Seq(
      Seq("c", "1"), Seq("a", "2"), Seq("a", "5"),
      Seq("b", "3"), Seq("b", "4"), Seq("d", "9")))
    assertNoGlobalDataWindow(arr.df)
    // unsorted frames: ingest-order groups, also chunked
    val arrU = fixture.groupBy("k").arranged
    assert(arrU.records().tail.map(_.head) == Seq("b", "b", "a", "a", "c", "d"))
    assertNoGlobalDataWindow(arrU.df)
  }

  test("positional ops plan chunked and stay frame-order-correct (multi-partition)") {
    // r14: Subset/FilterIndex/SetRows/DropRow resolve absolute positions
    // through Prefix.materializePos (chunked dense positions) instead of
    // an empty-partition row_number over the data
    val rows = Seq(GRow("a", 7L), GRow("b", 2L), GRow("c", 9L), GRow("d", 4L),
      GRow("e", 1L), GRow("f", 6L), GRow("g", 3L), GRow("h", 8L))
    val f = multi(rows, 4).sort(Sorter("v"))
    // frame order by v asc: e1, b2, g3, d4, f6, a7, h8, c9
    assert(f.dropRow(2).records().tail.map(_.head) ==
      Seq("e", "b", "d", "f", "a", "h", "c"))
    assert(f.subset(Seq(5, 0, 7)).records().tail.map(_.head) == Seq("a", "e", "c"))
    assert(f.filterIndex(F.col("v") >= 7L) == Seq(5L, 6L, 7L))
    // setRows on a NON-key column rides the chunked positions; overwriting
    // the sort key itself stays on the anchoring fallback by design
    assert(f.setRows("k", Seq(0, 7), F.lit("Z")).records().tail.map(_.head) ==
      Seq("Z", "b", "g", "d", "f", "a", "h", "Z"))
    assertNoGlobalDataWindow(f.dropRow(2).df)
    assertNoGlobalDataWindow(f.subset(Seq(1)).df)
    assertNoGlobalDataWindow(f.setRows("k", Seq(0), F.lit("Z")).df)
  }

  test("grouped median: by-value counting plan equals the percentile agg bit-for-bit") {
    // even + odd group sizes (interpolated and direct medians), a null
    // value, an all-null group, a NULL GROUP KEY, multi-partition input
    val rows = Seq[(String, java.lang.Double)](
      ("a", 3.0), ("a", 1.0), ("a", 2.0), ("a", 8.0),   // even: (2+3)/2
      ("b", 5.0), ("b", 7.0), ("b", 6.0),               // odd: 6
      ("c", null), ("c", null),                         // all-null: null
      ("d", 4.0), ("d", null),                          // nulls excluded
      (null, 9.0), (null, 11.0))                        // null key group
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(r => KRow(r._1, r._2)), 3))
    val f = TadaFrame.ingest(df)
    val got = f.groupBy("k").median("v")
    // dispatch engaged: the plan carries the counting machinery, and no
    // Percentile agg buffers group values
    val plan = got.df.queryExecution.analyzed.toString
    assert(plan.contains("__mv_"), "median did not dispatch to the by-value plan")
    assert(!plan.contains("percentile("), "by-value plan still carries the buffering agg")
    def vals(t: TadaFrame) = t.df.select(F.col("k"), F.col("median_v")).collect()
      .map(r => (Option(r.get(0)).map(_.toString).getOrElse(""), Option(r.get(1))))
      .toSeq.sortBy(_._1)
    val want = vals(f.groupBy("k").reduceWith(
      Seq("median_v" -> F.percentile(F.col("v"), F.lit(0.5)))))
    assert(vals(got) == want)
    assert(vals(got).toMap.apply("a").contains(2.5))
    assert(vals(got).toMap.apply("c").isEmpty)
    // group order contract holds through the by-value plan (first
    // appearance in ingest order: a, b, c, d, null)
    assert(got.records().tail.map(_.head) == Seq("a", "b", "c", "d", "(null)"))
    // SORTED frames dispatch too (r18): the group ordinal rides the
    // repAgg/rankRep path, so group order follows the sort — first
    // appearance in v-asc order (nulls last): a(1), d(4)... v asc walks
    // 1,2,3,4,5,6,7,8,9 → first appearances a, d, b, null, c
    val fs = f.sort(Sorter("v"))
    val gotS = fs.groupBy("k").median("v")
    assert(gotS.df.queryExecution.analyzed.toString.contains("__mv_"),
      "sorted median did not dispatch to the by-value plan")
    assert(vals(gotS) == want)
    assert(gotS.records().tail.map(_.head) ==
      fs.groupBy("k").reduceWith(Seq("median_v" ->
        F.percentile(F.col("v"), F.lit(0.5)))).records().tail.map(_.head),
      "sorted by-value median must keep the sorted-reduce group order")
  }

  test("banded rankRep equals the window form: order, head, desc, strings, append bands (r19)") {
    // the r18 audit's last data-shaped single-partition window: a SORTED
    // frame grouped by a near-unique key ranked its #groups-row reduced
    // output through one Window.orderBy. The banded path materializes
    // the rep fields through Prefix.materializeOrd instead; the conf
    // threshold forces it on fixture-sized group counts. The r17 Feistel
    // lesson says the banded extension is where a first cut breaks — so
    // the append/multi-band fixture is the load-bearing case here.
    val sp = spark
    def withThreshold[A](t: String)(body: => A): A = {
      sp.conf.set("graft.rankRep.maxWindowGroups", t)
      try body finally sp.conf.unset("graft.rankRep.maxWindowGroups")
    }
    val rows = (0 until 40).map(i => GRow(f"g${(i * 7) % 40}%03d", ((i * 13) % 23).toLong))
    def checkBoth(mk: => TadaFrame): Unit = {
      Dispatch.drain()
      val banded = withThreshold("4")(mk)
      assert(Dispatch.drain().contains(("rankRep", "banded")),
        "threshold 4 over ~40 groups must dispatch the banded form")
      val window = withThreshold("1000000000")(mk)
      assert(banded.records() == window.records())
      assert(banded.head(5).records() == window.head(5).records(),
        "head after a banded reduce must select the same leading groups")
      // the banded plan carries NO empty-partition window at all — not
      // even the tiny-reduced-frame one the window form is allowed
      val wins = banded.df.queryExecution.optimizedPlan.collect {
        case w: LWindow if w.partitionSpec.isEmpty => w
      }
      assert(wins.isEmpty, s"banded rankRep still plans a global window:\n${wins.mkString("\n")}")
    }
    // numeric sort key, asc and desc; reduce and positional picks
    val base = multi(rows, 4)
    checkBoth(base.sort(Sorter("v"), Sorter("k")).groupBy("k").sum("v"))
    checkBoth(base.sort(Sorter("v", descending = true), Sorter("k")).groupBy("k").first("v"))
    // STRING first sort key (the binary-prefix image path on the rep axis)
    checkBoth(base.sort(Sorter("k", descending = true)).groupBy("k").sum("v"))
    // APPEND fixture: two bands, rep.o carries band bits in its high
    // half — the within-chunk tiebreak must still walk band order
    val app = multi(rows.take(20), 3).append(multi(rows.drop(20), 2))
    checkBoth(app.sort(Sorter("v"), Sorter("k")).groupBy("k").sum("v"))
    checkBoth(app.sort(Sorter("k")).groupBy("k").last("v"))
    // and an append AFTER a banded reduce still lands strictly above
    val red = withThreshold("4")(
      multi(rows.take(20), 3).sort(Sorter("v"), Sorter("k")).groupBy("k").sum("v"))
    val tail = multi(Seq(GRow("zzz", 99L)), 1)
      .copy(labels = Seq("k")).renameCol("v", "sum_v")
    val got = red.append(tail).records().tail.map(_.head)
    assert(got.last == "zzz", "appended rows must follow every banded-ranked group")
  }

  test("grouped median -0.0 edge: by-value normalizes to +0.0 (documented exception)") {
    // r18 ADVICE: the by-value plan's groupBy normalizes -0.0 to 0.0
    // (NormalizeFloatingNumbers) while the Percentile agg buffers raw
    // values and can return -0.0 — numerically equal (== and SQL =),
    // different raw bits. Pin the by-value side of the contract.
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(KRow("z", -0.0), KRow("w", 1.5)), 2))
    val f = TadaFrame.ingest(df)
    val got = f.groupBy("k").median("v")
    assert(got.df.queryExecution.analyzed.toString.contains("__mv_"),
      "fixture must ride the by-value plan")
    val z = got.df.filter(F.col("k") === "z").select("median_v").head().getDouble(0)
    assert(z == 0.0 && z == -0.0) // numerically equal either way
    assert(java.lang.Double.doubleToRawLongBits(z) == 0L,
      "by-value median normalizes the lone -0.0 group to +0.0 — the documented edge")
  }

  test("string sort key: grouped ordinal still correct via rep ranking") {
    // the CHUNKED ordinal fallback is for anchorOrder; grouped paths never
    // need a global pass even for string keys (partition-local window +
    // reduced-output ranking)
    val rows = Seq(GRow("b", 1L), GRow("c", 2L), GRow("a", 3L))
    val f = multi(rows, 2).sort(Sorter("k", descending = true))
    val got = f.groupBy("k").sum("v").records().tail.map(_.head)
    assert(got == Seq("c", "b", "a"))
    assertNoGlobalDataWindow(f.groupBy("k").sum("v").df)
  }
}

case class GRow(k: String, v: java.lang.Long)
case class KRow(k: String, v: java.lang.Double)
