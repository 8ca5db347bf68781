package graft

import graft.core.{Sorter, TadaFrame}
import graft.io.TadaIO
import graft.io.TadaIO.ReadConfig
import org.apache.spark.sql.{functions => F}
import org.scalatest.funsuite.AnyFunSuite

/** Golden print-format corpus: each expected string below is the
  * byte-for-byte output of a reference `Example*` function
  * (example_dataframe_test.go), re-driven through `TadaIO.render`.
  * Together they pin the label/value double border, header centering,
  * right alignment, repeat merging, default-name suppression, the
  * head/…/tail row cap, the middle-column collapse, cell truncation,
  * `(null)` rendering, and the `name:` caption.
  */
class GoldenRenderSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def check(got: String, want: String, hint: String): Unit =
    assert(got == want.stripMargin, s"\n[$hint]\ngot:\n$got\nwant:\n${want.stripMargin}")

  test("ExampleNewReader: CSV with headers, default index") {
    val f = TadaIO.readCsvString(spark, "foo,bar\nbaz,qux\ncorge,fred")
    check(TadaIO.render(f),
      """+---++-------+------+
        || - ||  foo  | bar  |
        ||---||-------|------|
        || 0 ||   baz |  qux |
        || 1 || corge | fred |
        |+---++-------+------+""", "ExampleNewReader")
  }

  test("ExampleNewReader_noHeaders: positional column names") {
    val f = TadaIO.readCsvString(spark, "foo,bar\nbaz,qux\ncorge,fred",
      ReadConfig(headerRows = 0))
    check(TadaIO.render(f),
      """+---++-------+------+
        || - ||   0   |  1   |
        ||---||-------|------|
        || 0 ||   foo |  bar |
        || 1 ||   baz |  qux |
        || 2 || corge | fred |
        |+---++-------+------+""", "ExampleNewReader_noHeaders")
  }

  test("ExampleNewReader_withLabels: first column becomes the label level") {
    val f = TadaIO.readCsvString(spark, "foo,bar\nbaz,qux\ncorge,fred",
      ReadConfig(labelLevels = 1))
    check(TadaIO.render(f),
      """+-------++------+
        ||  foo  || bar  |
        ||-------||------|
        ||   baz ||  qux |
        || corge || fred |
        |+-------++------+""", "ExampleNewReader_withLabels")
  }

  test("ExampleNewReader_multipleHeaders: stacked 2-level headers, literal *0") {
    val f = TadaIO.readCsvString(spark, "foo,bar\nbaz,qux\ncorge,fred",
      ReadConfig(headerRows = 2))
    check(TadaIO.render(f),
      """+----++-------+------+
        || *0 ||  foo  | bar  |
        ||    ||  baz  | qux  |
        ||----||-------|------|
        ||  0 || corge | fred |
        |+----++-------+------+""", "ExampleNewReader_multipleHeaders")
  }

  test("ExampleNewReader_multipleHeadersWithLabels: label name on its own level") {
    val f = TadaIO.readCsvString(spark, ",foo,bar\nlabels,baz,qux\n1,corge,fred",
      ReadConfig(headerRows = 2, labelLevels = 1))
    check(TadaIO.render(f),
      """+--------++-------+------+
        ||        ||  foo  | bar  |
        || labels ||  baz  | qux  |
        ||--------||-------|------|
        ||      1 || corge | fred |
        |+--------++-------+------+""", "ExampleNewReader_multipleHeadersWithLabels")
  }

  test("ExampleNewRecordReader: row-major records, first row is the header") {
    val f = TadaIO.readRecords(spark,
      Seq(Seq("foo", "bar"), Seq("baz", "qux"), Seq("corge", "fred")))
    check(TadaIO.render(f),
      """+---++-------+------+
        || - ||  foo  | bar  |
        ||---||-------|------|
        || 0 ||   baz |  qux |
        || 1 || corge | fred |
        |+---++-------+------+""", "ExampleNewRecordReader")
  }

  test("ExampleNewRecordReader_byColumn: column-major records") {
    val byColumn = Seq(
      Seq("foo", "bar"), Seq("baz", "qux"), Seq("corge", "fred"))
    val f = TadaIO.readRecords(spark, byColumn.transpose)
    check(TadaIO.render(f),
      """+---++-----+-----+-------+
        || - || foo | baz | corge |
        ||---||-----|-----|-------|
        || 0 || bar | qux |  fred |
        |+---++-----+-----+-------+""", "ExampleNewRecordReader_byColumn")
  }

  test("ExampleDataFrame_setColNames: named label level + name caption") {
    val df = Seq((0, 1.0, "baz"), (1, 2.0, "qux")).toDF("baz", "foo", "bar")
    val f = TadaFrame.ingest(df, labelCols = Seq("baz"), name = "foo")
    check(TadaIO.render(f),
      """+-----++-----+-----+
        || baz || foo | bar |
        ||-----||-----|-----|
        ||   0 ||   1 | baz |
        ||   1 ||   2 | qux |
        |+-----++-----+-----+
        |name: foo""", "ExampleDataFrame_setColNames")
  }

  test("ExampleDataFrame_WithCol_append: appended bool column") {
    val f = TadaFrame.ingest(Seq(1.0, 2.0).toDF("foo"))
      .withCol("bar", F.col("foo") > 1.0)
    check(TadaIO.render(f),
      """+---++-----+-------+
        || - || foo |  bar  |
        ||---||-----|-------|
        || 0 ||   1 | false |
        || 1 ||   2 |  true |
        |+---++-----+-------+""", "ExampleDataFrame_WithCol_append")
  }

  test("ExampleDataFrame_Sort: repeat merging + index follows the sort") {
    val f = TadaFrame.ingest(
      Seq((10.0, "d"), (2.0, "b"), (2.0, "c"), (1.0, "a")).toDF("foo", "bar"))
    check(TadaIO.render(f),
      """+---++-----+-----+
        || - || foo | bar |
        ||---||-----|-----|
        || 0 ||  10 |   d |
        || 1 ||   2 |   b |
        || 2 ||     |   c |
        || 3 ||   1 |   a |
        |+---++-----+-----+""", "ExampleDataFrame_Sort (pre)")
    val sorted = f.sort(Sorter("foo"), Sorter("bar", descending = true))
    check(TadaIO.render(sorted),
      """+---++-----+-----+
        || - || foo | bar |
        ||---||-----|-----|
        || 3 ||   1 |   a |
        || 2 ||   2 |   c |
        || 1 ||     |   b |
        || 0 ||  10 |   d |
        |+---++-----+-----+""", "ExampleDataFrame_Sort (post)")
  }

  test("ExamplePrintOptionMaxRows: head + ... + tail") {
    val f = TadaFrame.ingest(
      Seq(1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 8.0).toDF("foo"))
    check(TadaIO.render(f, maxRows = 6),
      """+-----++-----+
        ||  -  || foo |
        ||-----||-----|
        ||   0 ||   1 |
        ||   1 ||   2 |
        ||   2 ||   3 |
        || ... || ... |
        ||   5 ||   6 |
        ||   6 ||   7 |
        ||   7 ||   8 |
        |+-----++-----+""", "ExamplePrintOptionMaxRows")
  }

  test("ExamplePrintOptionMaxColumns: middle columns collapse to ...") {
    val f = TadaFrame.ingest(
      Seq((1.0, 3.0, 5.0, 3.0, 5.0), (2.0, 4.0, 6.0, 4.0, 6.0))
        .toDF("A", "B", "C", "D", "E"))
    check(TadaIO.render(f, maxColumns = 2),
      """+---++---+-----+---+
        || - || A | ... | E |
        ||---||---|-----|---|
        || 0 || 1 | ... | 5 |
        || 1 || 2 |     | 6 |
        |+---++---+-----+---+""", "ExamplePrintOptionMaxColumns")
  }

  test("ExamplePrintOptionMaxCellWidth: wide cells truncate with ...") {
    val f = TadaFrame.ingest(
      Seq("corgilius", "barrius", "foo").toDF("waldonius"))
    check(TadaIO.render(f, maxCellWidth = 5),
      """+---++-------+
        || - || wa... |
        ||---||-------|
        || 0 || co... |
        || 1 || ba... |
        || 2 ||   foo |
        |+---++-------+""", "ExamplePrintOptionMaxCellWidth")
  }

  test("ExampleNewDataFrame: positional column names 0, 1") {
    val f = TadaFrame.ingest(Seq((1.0, "baz"), (2.0, "qux")).toDF("0", "1"))
    check(TadaIO.render(f),
      """+---++---+-----+
        || - || 0 |  1  |
        ||---||---|-----|
        || 0 || 1 | baz |
        || 1 || 2 | qux |
        |+---++---+-----+""", "ExampleNewDataFrame")
  }

  test("ExampleDataFrame_withLabels: explicit label slice, default name suppressed") {
    val f = TadaFrame.ingest(Seq(("foo", 1.0), ("bar", 2.0)).toDF("*0", "0"),
      labelCols = Seq("*0"))
    check(TadaIO.render(f),
      """+-----++---+
        ||  -  || 0 |
        ||-----||---|
        || foo || 1 |
        || bar || 2 |
        |+-----++---+""", "ExampleDataFrame_withLabels")
  }

  test("ExampleDataFrame_WithCol_rename") {
    val f = TadaFrame.ingest(Seq(1.0, 2.0).toDF("foo"))
    check(TadaIO.render(f.renameCol("foo", "qux")),
      """+---++-----+
        || - || qux |
        ||---||-----|
        || 0 ||   1 |
        || 1 ||   2 |
        |+---++-----+""", "ExampleDataFrame_WithCol_rename")
  }

  test("ExampleDataFrame_WithCol_overwrite: dtype change float to string") {
    val f = TadaFrame.ingest(Seq((0, 1.0), (1, 2.0)).toDF("*0", "foo"),
      labelCols = Seq("*0"))
    val overwritten = f.withCol("foo",
      F.element_at(F.array(F.lit("baz"), F.lit("qux")), F.col("*0") + 1))
    check(TadaIO.render(overwritten),
      """+---++-----+
        || - || foo |
        ||---||-----|
        || 0 || baz |
        || 1 || qux |
        |+---++-----+""", "ExampleDataFrame_WithCol_overwrite")
  }

  test("ExampleDataFrame_Filter: intersection of per-column predicates, index kept") {
    val f0 = TadaFrame.ingest(
      Seq((0, 1.0, "2020-01-01 00:00:00"), (1, 2.0, "2020-01-02 00:00:00"),
        (2, 3.0, "2020-01-01 00:00:00")).toDF("*0", "foo", "ts"),
      labelCols = Seq("*0"))
    val f = f0.withCol("bar", F.col("ts").cast("timestamp")).dropCols("ts")
    check(TadaIO.render(f),
      """+---++-----+----------------------+
        || - || foo |         bar          |
        ||---||-----|----------------------|
        || 0 ||   1 | 2020-01-01T00:00:00Z |
        || 1 ||   2 | 2020-01-02T00:00:00Z |
        || 2 ||   3 | 2020-01-01T00:00:00Z |
        |+---++-----+----------------------+""", "ExampleDataFrame_Filter (pre)")
    val ret = f.filter(Map(
      "foo" -> ((c: org.apache.spark.sql.Column) => c > 1),
      "bar" -> ((c: org.apache.spark.sql.Column) =>
        c < F.lit("2020-01-02 00:00:00").cast("timestamp"))))
    check(TadaIO.render(ret),
      """+---++-----+----------------------+
        || - || foo |         bar          |
        ||---||-----|----------------------|
        || 2 ||   3 | 2020-01-01T00:00:00Z |
        |+---++-----+----------------------+""", "ExampleDataFrame_Filter")
  }

  test("ExampleDataFrame_Where: unnamed bool series") {
    val f = TadaFrame.ingest(Seq(1.0, 2.0).toDF("foo"))
    val ret = f.where("", Seq("foo"), F.col("foo") > 1, F.lit(true), F.lit(false))
    check(TadaIO.render(ret.col("")),
      """+---++-------+
        || - ||       |
        ||---||-------|
        || 0 || false |
        || 1 ||  true |
        |+---++-------+""", "ExampleDataFrame_Where")
  }

  test("ExampleDataFrame_GroupBy: grouped view, first-appearance order") {
    val f = TadaFrame.ingest(
      Seq(("foo", 1.0), ("bar", 2.0), ("foo", 3.0), ("bar", 4.0)).toDF("*0", "baz"),
      labelCols = Seq("*0"))
    check(TadaIO.render(f.groupBy().arranged),
      """+-----++-----+
        ||  -  || baz |
        ||-----||-----|
        || foo ||   1 |
        ||     ||   3 |
        || bar ||   2 |
        ||     ||   4 |
        |+-----++-----+""", "ExampleDataFrame_GroupBy")
  }

  test("ExampleNewStructReader: masked value renders as (null)") {
    val f = TadaIO.readRecords(spark,
      Seq(Seq("foo"), Seq("foo"), Seq("(null)"), Seq("bar")))
    check(TadaIO.render(f),
      """+---++--------+
        || - ||  foo   |
        ||---||--------|
        || 0 ||    foo |
        || 1 || (null) |
        || 2 ||    bar |
        |+---++--------+""", "ExampleNewStructReader")
  }

  test("ExampleDataFrameMutator_WithCol_rename: before and after renders") {
    // example_dataframe_test.go:187-209 — the InPlace mutator form
    // prints the frame before and after the rename; both tables pinned
    val f = TadaFrame.ingest(Seq(1.0, 2.0).toDF("foo"))
    check(TadaIO.render(f),
      """+---++-----+
        || - || foo |
        ||---||-----|
        || 0 ||   1 |
        || 1 ||   2 |
        |+---++-----+""", "ExampleDataFrameMutator_WithCol_rename/before")
    check(TadaIO.render(f.renameCol("foo", "qux")),
      """+---++-----+
        || - || qux |
        ||---||-----|
        || 0 ||   1 |
        || 1 ||   2 |
        |+---++-----+""", "ExampleDataFrameMutator_WithCol_rename/after")
  }

  test("ExampleNewStructWriter: typed rows out, Go %+v image pinned") {
    // example_dataframe_test.go:504-520 — WriteTo(NewStructWriter(&out))
    // yields [{Foo:1} {Foo:2}]; the typed surface here is writeCaseClass
    val f = TadaFrame.ingest(Seq(1.0, 2.0).toDF("foo"))
    val out = TadaIO.writeCaseClass[GoldenRenderSpec.FooOut](f)
    assert(out == Seq(GoldenRenderSpec.FooOut(1.0), GoldenRenderSpec.FooOut(2.0)))
    val goImage = out.map(o => s"{Foo:${TadaIO.goSprint(o.foo)}}")
      .mkString("[", " ", "]")
    check(goImage, "[{Foo:1} {Foo:2}]", "ExampleNewStructWriter")
  }
}

object GoldenRenderSpec {
  final case class FooOut(foo: Double)
}
