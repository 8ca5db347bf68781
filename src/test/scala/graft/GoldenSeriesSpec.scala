package graft

import graft.core.{Analytics, Lookup, TadaFrame}
import graft.io.TadaIO
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.{functions => F}
import org.scalatest.funsuite.AnyFunSuite

/** Golden print-format corpus, series side: each expected string is the
  * byte-for-byte output of a reference `Example*` function
  * (example_series_test.go), re-driven through the engine + `TadaIO
  * .render`. Where the reference's default index is load-bearing
  * (joins, filters that drop rows), the fixture materializes it as an
  * explicit `*0` label level — which is what the reference's default
  * labels are (makeDefaultLabels internal.go), and renders identically
  * (`-` via suppressDefaultName).
  */
class GoldenSeriesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def check(got: String, want: String, hint: String): Unit =
    assert(got == want.stripMargin, s"\n[$hint]\ngot:\n$got\nwant:\n${want.stripMargin}")

  private def ts(s: String) = F.lit(s).cast("timestamp")

  test("ExampleSeries: float series renders 1.0 as 1") {
    val f = TadaFrame.ingest(Seq(1.0, 2.0).toDF("foo"))
    check(TadaIO.render(f),
      """+---++-----+
        || - || foo |
        ||---||-----|
        || 0 ||   1 |
        || 1 ||   2 |
        |+---++-----+""", "ExampleSeries")
  }

  test("ExampleSeries_setNaNStatus: NaN is null by default, a value when disabled") {
    import graft.io.TadaOptions
    def mask(f: TadaFrame) = f.records().tail.map(_.head == "(null)")
    val on = TadaIO.readRecords(spark, Seq(Seq("x"), Seq("0"), Seq("NaN")),
      TadaOptions().readConfig(inferTypes = true))
    assert(mask(on) == Seq(false, true)) // isNull: [false true]
    val off = TadaIO.readRecords(spark, Seq(Seq("x"), Seq("0"), Seq("NaN")),
      TadaOptions(nanIsNull = false).readConfig(inferTypes = true))
    assert(mask(off) == Seq(false, false)) // isNull: [false false]
  }

  test("ExampleSeries_setEmptyStringAsNull: sentinel set vs empty-string nulls") {
    import graft.io.TadaOptions
    def mask(f: TadaFrame) = f.records().tail.map(_.head == "(null)")
    // default null-string set {"(null)"}: "" stays a value
    val defaults = TadaIO.readRecords(spark,
      Seq(Seq("x"), Seq("foo"), Seq(""), Seq("(null)")),
      TadaOptions().readConfig())
    assert(mask(defaults) == Seq(false, false, true)) // isNull: [false false true]
    val enabled = TadaIO.readRecords(spark,
      Seq(Seq("x"), Seq("foo"), Seq(""), Seq("(null)")),
      TadaOptions(emptyStringAsNull = true).readConfig())
    assert(mask(enabled) == Seq(false, true, true)) // isNull: [false true true]
  }

  test("ExampleSeries_nestedSlice: Go-style [a b] join, empty slice is null") {
    val f = TadaFrame.ingest(
      Seq(Seq("foo", "bar"), Seq("baz"), Seq.empty[String]).toDF("a"))
    check(TadaIO.render(f),
      """+---++-----------+
        || - ||     a     |
        ||---||-----------|
        || 0 || [foo bar] |
        || 1 ||     [baz] |
        || 2 ||    (null) |
        |+---++-----------+""", "ExampleSeries_nestedSlice")
  }

  test("ExampleSeries_Bin: right-inclusive edges, out-of-range is null") {
    val f = TadaFrame.ingest(Seq(1.0, 3.0, 5.0).toDF("foo"))
    check(TadaIO.render(Analytics.bin(f, "foo", Seq(0, 2, 4), "foo")),
      """+---++--------+
        || - ||  foo   |
        ||---||--------|
        || 0 ||    0-2 |
        || 1 ||    2-4 |
        || 2 || (null) |
        |+---++--------+""", "ExampleSeries_Bin")
  }

  test("ExampleSeries_Bin_andMore: open top bin >4") {
    val f = TadaFrame.ingest(Seq(1.0, 3.0, 5.0).toDF("foo"))
    check(TadaIO.render(Analytics.bin(f, "foo", Seq(0, 2, 4), "foo", andMore = true)),
      """+---++-----+
        || - || foo |
        ||---||-----|
        || 0 || 0-2 |
        || 1 || 2-4 |
        || 2 ||  >4 |
        |+---++-----+""", "ExampleSeries_Bin_andMore")
  }

  test("ExampleSeries_Bin_customLabels") {
    val f = TadaFrame.ingest(Seq(1.0, 3.0).toDF("foo"))
    check(TadaIO.render(
      Analytics.bin(f, "foo", Seq(0, 2, 4), "foo", labels = Seq("low", "high"))),
      """+---++------+
        || - || foo  |
        ||---||------|
        || 0 ||  low |
        || 1 || high |
        |+---++------+""", "ExampleSeries_Bin_customLabels")
  }

  test("ExampleSeries_PercentileBin: left-inclusive percentile bins") {
    val f = TadaFrame.ingest(Seq(1.0, 2.0, 3.0, 4.0).toDF("foo"))
    check(TadaIO.render(Analytics.percentileBin(f, "foo", Seq(0, 0.5, 1), "foo")),
      """+---++-------+
        || - ||  foo  |
        ||---||-------|
        || 0 || 0-0.5 |
        || 1 ||       |
        || 2 || 0.5-1 |
        || 3 ||       |
        |+---++-------+""", "ExampleSeries_PercentileBin")
  }

  test("ExampleSeries_PercentileBin_customLabels") {
    val f = TadaFrame.ingest(Seq(1.0, 2.0, 3.0, 4.0).toDF("foo"))
    check(TadaIO.render(Analytics.percentileBin(f, "foo", Seq(0, 0.5, 1), "foo",
      labels = Seq("Bottom 50%", "Top 50%"))),
      """+---++------------+
        || - ||    foo     |
        ||---||------------|
        || 0 || Bottom 50% |
        || 1 ||            |
        || 2 ||    Top 50% |
        || 3 ||            |
        |+---++------------+""", "ExampleSeries_PercentileBin_customLabels")
  }

  test("ExampleSeries_Lookup: left-shape result, unmatched is null") {
    val s = TadaFrame.ingest(Seq((0, 1.0), (1, 2.0)).toDF("a", "foo"),
      labelCols = Seq("a"))
    val s2 = TadaFrame.ingest(Seq((0, 4.0), (10, 5.0)).toDF("a", "0"),
      labelCols = Seq("a"))
    check(TadaIO.render(s2),
      """+----++---+
        || a  || 0 |
        ||----||---|
        ||  0 || 4 |
        || 10 || 5 |
        |+----++---+""", "ExampleSeries_Lookup (right)")
    check(TadaIO.render(Lookup.lookup(s, s2)),
      """+---++--------+
        || a ||  foo   |
        ||---||--------|
        || 0 ||      4 |
        || 1 || (null) |
        |+---++--------+""", "ExampleSeries_Lookup")
  }

  test("ExampleSeries_Lookup_withOptions: inner on leftOn/rightOn") {
    val s = TadaFrame.ingest(
      Seq(("foo", 0, 1.0), ("bar", 1, 2.0)).toDF("a", "b", "0"),
      labelCols = Seq("a", "b"))
    val s2 = TadaFrame.ingest(
      Seq((0, "baz", 4.0), (10, "bar", 5.0)).toDF("a", "b", "0"),
      labelCols = Seq("a", "b"))
    check(TadaIO.render(
      Lookup.lookup(s, s2, "inner", leftOn = Seq("a"), rightOn = Seq("b"))),
      """+-----+---++---+
        ||  a  | b || 0 |
        ||-----|---||---|
        || bar | 1 || 5 |
        |+-----+---++---+""", "ExampleSeries_Lookup_withOptions")
  }

  test("ExampleSeries_Merge: gains the right column, unmatched null") {
    val s = TadaFrame.ingest(Seq((0, 1.0), (1, 2.0)).toDF("*0", "foo"),
      labelCols = Seq("*0"))
    val s2 = TadaFrame.ingest(Seq((0, 4.0), (10, 5.0)).toDF("*0", "bar"),
      labelCols = Seq("*0"))
    check(TadaIO.render(Lookup.merge(s, s2)),
      """+---++-----+--------+
        || - || foo |  bar   |
        ||---||-----|--------|
        || 0 ||   1 |      4 |
        || 1 ||   2 | (null) |
        |+---++-----+--------+""", "ExampleSeries_Merge")
  }

  test("ExampleSeries_Merge_withOptions: name collision takes _1") {
    val s = TadaFrame.ingest(
      Seq(("foo", 0, 1.0), ("bar", 1, 2.0)).toDF("a", "b", "0"),
      labelCols = Seq("a", "b"))
    val s2 = TadaFrame.ingest(
      Seq((0, "baz", 4.0), (10, "bar", 5.0)).toDF("a", "b", "0"),
      labelCols = Seq("a", "b"))
    check(TadaIO.render(
      Lookup.merge(s, s2, "inner", leftOn = Seq("a"), rightOn = Seq("b"))),
      """+-----+---++---+-----+
        ||  a  | b || 0 | 0_1 |
        ||-----|---||---|-----|
        || bar | 1 || 2 |   5 |
        |+-----+---++---+-----+""", "ExampleSeries_Merge_withOptions")
  }

  test("ExampleSeries_Apply_float64: elementwise times-2") {
    val f = TadaFrame.ingest(Seq(1.0, 2.0, 3.0).toDF("foo"))
    check(TadaIO.render(f.withCol("foo", F.col("foo") * 2)),
      """+---++-----+
        || - || foo |
        ||---||-----|
        || 0 ||   2 |
        || 1 ||   4 |
        || 2 ||   6 |
        |+---++-----+""", "ExampleSeries_Apply_float64")
  }

  test("ExampleSeries_Resample: byMonth / byWeek(Sunday) / byHour / byHalfHour") {
    val f = TadaFrame.ingest(
      spark.range(1).select(ts("2020-01-15 12:30:00").as("foo")))
    check(TadaIO.render(Analytics.resample(f, "foo", "month", "foo")),
      """+---++----------------------+
        || - ||         foo          |
        ||---||----------------------|
        || 0 || 2020-01-01T00:00:00Z |
        |+---++----------------------+""", "ExampleSeries_Resample_byMonth")
    check(TadaIO.render(Analytics.resample(f, "foo", "week", "foo", weekStart = "SUNDAY")),
      """+---++----------------------+
        || - ||         foo          |
        ||---||----------------------|
        || 0 || 2020-01-12T00:00:00Z |
        |+---++----------------------+""", "ExampleSeries_Resample_byWeek")
    check(TadaIO.render(Analytics.resample(f, "foo", "hour", "foo")),
      """+---++----------------------+
        || - ||         foo          |
        ||---||----------------------|
        || 0 || 2020-01-15T12:00:00Z |
        |+---++----------------------+""", "ExampleSeries_Resample_byHour")
    val f2 = TadaFrame.ingest(spark.range(1).select(
      F.explode(F.array(ts("2020-01-15 12:15:00"), ts("2020-01-15 12:45:00"))).as("foo")))
    check(TadaIO.render(Analytics.resampleDuration(f2, "foo", 30L * 60 * 1000000, "foo")),
      """+---++----------------------+
        || - ||         foo          |
        ||---||----------------------|
        || 0 || 2020-01-15T12:00:00Z |
        || 1 || 2020-01-15T12:30:00Z |
        |+---++----------------------+""", "ExampleSeries_Resample_byHalfHour")
  }

  test("ExampleSeries_Cast_date: date renders yyyy-MM-dd") {
    val f = TadaFrame.ingest(
      spark.range(1).select(ts("2020-01-15 12:15:00").as("foo")))
    check(TadaIO.render(f.withCol("foo", F.to_date(F.col("foo")))),
      """+---++------------+
        || - ||    foo     |
        ||---||------------|
        || 0 || 2020-01-15 |
        |+---++------------+""", "ExampleSeries_Cast_date")
  }

  test("ExampleSeries_Cast_time: datetime renders RFC3339, time cast renders HH:mm:ss") {
    // example_series_test.go:487-507 — Cast(map{foo: tada.Time}) narrows
    // the printed form from the full RFC3339 instant to the time of day
    val f = TadaFrame.ingest(
      spark.range(1).select(ts("2020-01-15 12:15:00").as("foo")))
    check(TadaIO.render(f),
      """+---++----------------------+
        || - ||         foo          |
        ||---||----------------------|
        || 0 || 2020-01-15T12:15:00Z |
        |+---++----------------------+""", "ExampleSeries_Cast_time/before")
    check(TadaIO.render(f.cast(Map("foo" -> "time"))),
      """+---++----------+
        || - ||   foo    |
        ||---||----------|
        || 0 || 12:15:00 |
        |+---++----------+""", "ExampleSeries_Cast_time/after")
  }

  test("ExampleSeries_GroupBy: grouped view in first-appearance order") {
    val f = TadaFrame.ingest(
      Seq(("foo", 1.0), ("bar", 2.0), ("foo", 3.0), ("bar", 4.0)).toDF("*0", "0"),
      labelCols = Seq("*0"))
    check(TadaIO.render(f.groupBy().arranged),
      """+-----++---+
        ||  -  || 0 |
        ||-----||---|
        || foo || 1 |
        ||     || 3 |
        || bar || 2 |
        ||     || 4 |
        |+-----++---+""", "ExampleSeries_GroupBy")
  }

  test("ExampleSeries_GroupBy_compoundGroup: two label levels merge independently") {
    val f = TadaFrame.ingest(
      Seq(("foo", "bar", 1.0), ("baz", "qux", 2.0), ("foo", "bar", 3.0), ("baz", "qux", 4.0))
        .toDF("*0", "*1", "0"),
      labelCols = Seq("*0", "*1"))
    check(TadaIO.render(f.groupBy().arranged),
      """+-----+-----++---+
        ||  -  |  -  || 0 |
        ||-----|-----||---|
        || foo | bar || 1 |
        ||     |     || 3 |
        || baz | qux || 2 |
        ||     |     || 4 |
        |+-----+-----++---+""", "ExampleSeries_GroupBy_compoundGroup")
  }

  test("ExampleGroupedSeries_Mean: mean_foo naming, first-appearance group order") {
    val f = TadaFrame.ingest(
      Seq((0, 1.0), (1, 2.0), (0, 3.0), (1, 4.0)).toDF("baz", "foo"),
      labelCols = Seq("baz"))
    check(TadaIO.render(f.groupBy("baz").mean("foo")),
      """+-----++----------+
        || baz || mean_foo |
        ||-----||----------|
        ||   0 ||        2 |
        ||   1 ||        3 |
        |+-----++----------+""", "ExampleGroupedSeries_Mean")
  }

  test("ExampleGroupedSeries_Align_mean: aligned mean broadcast to all rows") {
    val f = TadaFrame.ingest(
      Seq((0, 1.0), (1, 2.0), (0, 3.0), (1, 4.0)).toDF("baz", "foo"),
      labelCols = Seq("baz"))
    check(TadaIO.render(f.groupBy("baz").align.mean("foo").col("mean_foo")),
      """+-----++----------+
        || baz || mean_foo |
        ||-----||----------|
        ||   0 ||        2 |
        ||   1 ||        3 |
        ||   0 ||        2 |
        ||   1 ||        3 |
        |+-----++----------+""", "ExampleGroupedSeries_Align_mean")
  }

  test("ExampleGroupedSeries_Reduce: custom reducer, max odd value per group") {
    val f = TadaFrame.ingest(
      Seq((0, 1.0), (0, 2.0), (0, 3.0), (1, 4.0), (1, 5.0), (1, 6.0)).toDF("baz", "foo"),
      labelCols = Seq("baz"))
    check(TadaIO.render(f.groupBy("baz").reduceExpr("max_odd_foo",
      F.max(F.when(F.col("foo") % 2 === 1, F.col("foo"))))),
      """+-----++-------------+
        || baz || max_odd_foo |
        ||-----||-------------|
        ||   0 ||           3 |
        ||   1 ||           5 |
        |+-----++-------------+""", "ExampleGroupedSeries_Reduce")
  }

  test("ExampleGroupedSeries_Apply: per-group transform, keys-only labels") {
    val f = TadaFrame.ingest(
      Seq(("bar", 0, 1.0), ("bar", 1, 2.0), ("foo", 2, 3.0), ("bar", 3, 4.0))
        .toDF("baz", "qux", "foobar"),
      labelCols = Seq("baz", "qux"))
    val res = f.groupBy("baz").applyExpr("foobar" -> { w =>
      F.when(F.count(F.lit(1)).over(w) >= 3, F.col("foobar") * 2)
    })
    check(TadaIO.render(res),
      """+-----++--------+
        || baz || foobar |
        ||-----||--------|
        || bar ||      2 |
        ||     ||      4 |
        ||     ||      8 |
        || foo || (null) |
        |+-----++--------+""", "ExampleGroupedSeries_Apply")
  }

  test("ExampleGroupedSeries_Apply_align: transform keeps original rows and order") {
    val f = TadaFrame.ingest(
      Seq(("bar", 0, 1.0), ("bar", 1, 2.0), ("foo", 2, 3.0), ("bar", 3, 4.0))
        .toDF("baz", "qux", "foobar"),
      labelCols = Seq("baz", "qux"))
    val res = f.groupBy("baz").align.applyExpr("foobar" -> { w =>
      F.when(F.count(F.lit(1)).over(w) >= 3, F.col("foobar") * 2)
    })
    check(TadaIO.render(res),
      """+-----+-----++--------+
        || baz | qux || foobar |
        ||-----|-----||--------|
        || bar |   0 ||      2 |
        ||     |   1 ||      4 |
        || foo |   2 || (null) |
        || bar |   3 ||      8 |
        |+-----+-----++--------+""", "ExampleGroupedSeries_Apply_align")
  }

  test("ExampleGroupedSeries_HavingCount_sum: only groups passing the count") {
    val f = TadaFrame.ingest(
      Seq((0, 1.0), (1, 2.0), (1, 3.0), (1, 4.0)).toDF("baz", "foo"),
      labelCols = Seq("baz"))
    check(TadaIO.render(f.groupBy("baz").havingCount(_ === 3).sum("foo")),
      """+-----++---------+
        || baz || sum_foo |
        ||-----||---------|
        ||   1 ||       9 |
        |+-----++---------+""", "ExampleGroupedSeries_HavingCount_sum")
  }

  test("ExampleSeries_zscore: composed stats + rounding") {
    val f = TadaFrame.ingest(Seq(1.0, 2.0, 3.0, 4.0, 5.0).toDF("foo"))
    val w = Window.partitionBy()
    val zs = F.round(
      (F.col("foo") - F.avg("foo").over(w)) / F.stddev_pop("foo").over(w), 2)
    check(TadaIO.render(f.withCol("zscore_foo", zs)),
      """+---++-----+------------+
        || - || foo | zscore_foo |
        ||---||-----|------------|
        || 0 ||   1 |      -1.41 |
        || 1 ||   2 |      -0.71 |
        || 2 ||   3 |          0 |
        || 3 ||   4 |       0.71 |
        || 4 ||   5 |       1.41 |
        |+---++-----+------------+""", "ExampleSeries_zscore")
  }
}
