package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.{functions => F}

import graft.core._

/** tada-semantics unit tests for the operators the driver's SQL oracle
  * can't see: null-fill strategies, first-appearance uniqueness, edge
  * rules, first-match joins, positional picks. */
class CoreSemanticsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def frame(df: org.apache.spark.sql.DataFrame) = TadaFrame.ingest(df)

  test("fillNull forward/backward/zero/const") {
    val f = frame(Seq[(Int, java.lang.Double)](
      (0, null), (1, 1.0), (2, null), (3, null), (4, 4.0)).toDF("i", "v"))
    def vals(g: TadaFrame): Seq[Any] =
      g.sorted.select("v").collect().map(r => if (r.isNullAt(0)) null else r.getDouble(0)).toSeq
    assert(vals(f.fillNull(Map("v" -> FillNullHow.Forward))) == Seq(null, 1.0, 1.0, 1.0, 4.0))
    assert(vals(f.fillNull(Map("v" -> FillNullHow.Backward))) == Seq(1.0, 1.0, 4.0, 4.0, 4.0))
    assert(vals(f.fillNull(Map("v" -> FillNullHow.ZeroValue))) == Seq(0.0, 1.0, 0.0, 0.0, 4.0))
    assert(vals(f.fillNull(Map("v" -> FillNullHow.Const(9.0)))) == Seq(9.0, 1.0, 9.0, 9.0, 4.0))
  }

  test("transpose cap bounds bytes AND rows before anything reaches the driver") {
    // normal small frame transposes fine
    val small = frame(Seq(("a", 1.0, 2.0), ("b", 3.0, 4.0)).toDF("h", "x", "y"))
    val t = Reshape.transpose(small, "h")
    assert(t.records().head == Seq("stat", "a", "b"))
    // row cap fires without collecting the frame
    val tall = frame((0 until 50).map(i => (s"r$i", i.toDouble)).toDF("h", "x"))
    val eRows = intercept[IllegalArgumentException](
      Reshape.transpose(tall, "h", maxRows = 10))
    assert(eRows.getMessage.contains("cap 10 rows"))
    // byte cap fires on FEW rows of WIDE string cells — the r8 audit:
    // a row cap alone would have admitted this driver hazard
    val wide = frame(Seq(("a", "x" * 60000), ("b", "y" * 60000)).toDF("h", "blob"))
    val eBytes = intercept[IllegalArgumentException](
      Reshape.transpose(wide, "h", maxBytes = 10000))
    assert(eBytes.getMessage.contains("byte cap 10000"))
  }

  test("saltedAgg matches plain groupBy on a skewed key for every algebraic op") {
    val rows = (0 until 1000).map(i =>
      (if (i < 900) "hot" else s"k${i % 17}", i.toDouble))
    val df = rows.toDF("k", "v")
    val specs = Seq("s" -> ("v", "sum"), "n" -> ("v", "count"),
      "mn" -> ("v", "min"), "mx" -> ("v", "max"), "avg" -> ("v", "mean"))
    val got = Skew.saltedAgg(df, Seq("k"), specs, salts = 8)
      .orderBy("k").collect()
    val want = df.groupBy("k").agg(F.sum("v").as("s"), F.count(F.col("v")).as("n"),
        F.min("v").as("mn"), F.max("v").as("mx"), F.avg("v").as("avg"))
      .orderBy("k").collect()
    assert(got.length == want.length)
    got.zip(want).foreach { case (g, w) =>
      assert(g.getString(0) == w.getString(0))
      assert(g.getDouble(1) == w.getDouble(1), "sum")
      assert(g.getLong(2) == w.getLong(2), "count")
      assert(g.getDouble(3) == w.getDouble(3) && g.getDouble(4) == w.getDouble(4))
      assert(math.abs(g.getDouble(5) - w.getDouble(5)) < 1e-9, "mean")
    }
  }

  test("unique keeps FIRST appearance (dropDuplicates would not promise order)") {
    val f = frame(Seq(("a", 1), ("b", 2), ("a", 3), ("b", 4)).toDF("k", "v"))
    val got = f.unique(subset = Seq("k")).records()
    assert(got.tail == Seq(Seq("a", "1"), Seq("b", "2")))
  }

  test("filterByValue compares stringified values: double 1.0 matches \"1\"") {
    val f = frame(Seq((1.0, "x"), (2.0, "y")).toDF("v", "t"))
    assert(f.filterByValue(Map("v" -> "1")).records().tail == Seq(Seq("1", "x")))
  }

  test("where: null in any inspected container poisons the result row") {
    val f = frame(Seq[(java.lang.Double, String)]((1.0, "a"), (null, "b")).toDF("v", "t"))
    val got = f.where("flag", Seq("v"), f.df("v") > 0, F.lit("pos"), F.lit("neg"))
      .records().tail.map(_(2))
    assert(got == Seq("pos", "(null)"))
  }

  test("head/tail/range follow frame order") {
    val f = frame(Seq(3, 1, 2, 5, 4).toDF("v")).sort(Sorter("v"))
    assert(f.head(2).records().tail.flatten == Seq("1", "2"))
    assert(f.tail(2).records().tail.flatten == Seq("4", "5"))
    assert(f.range(1, 3).records().tail.flatten == Seq("2", "3"))
  }

  test("sort puts nulls last in BOTH directions (internal.go:1297-1309)") {
    val f = frame(Seq[java.lang.Double](2.0, null, 1.0).toDF("v"))
    assert(f.sort(Sorter("v")).records().tail.flatten == Seq("1", "2", "(null)"))
    assert(f.sort(Sorter("v", descending = true)).records().tail.flatten ==
      Seq("2", "1", "(null)"))
  }

  test("append coerces mismatched types to string (internal.go:1159-1170)") {
    val a = frame(Seq(1.5).toDF("v"))
    val b = frame(Seq("x").toDF("v"))
    val got = a.append(b)
    assert(got.df.schema("v").dataType == org.apache.spark.sql.types.StringType)
    assert(got.records().tail.flatten == Seq("1.5", "x"))
  }

  test("lookup joins are first-match-only: no row multiplication ever") {
    val left = frame(Seq(("k1", 10), ("k2", 20)).toDF("k", "lv"))
    val right = frame(Seq(("k1", "first"), ("k1", "second"), ("k3", "x")).toDF("k", "rv"))
    val got = Lookup.merge(left, right, leftOn = Seq("k"), rightOn = Seq("k"))
    assert(got.records().tail ==
      Seq(Seq("k1", "10", "first"), Seq("k2", "20", "(null)")))
  }

  test("combineMath: divide by zero => null; ignoreNulls treats missing as 0") {
    val l = frame(Seq(("a", 10.0), ("b", 20.0)).toDF("k", "v"))
    val r = frame(Seq(("a", 0.0)).toDF("k", "v"))
    val div = Lookup.combineMath(l, r, "divide", Seq("k"), Seq("k"), "v", "v", "out")
    assert(div.records().tail.map(_(1)) == Seq("(null)", "(null)"))
    val add = Lookup.combineMath(l, r, "add", Seq("k"), Seq("k"), "v", "v", "out",
      ignoreNulls = true)
    assert(add.records().tail.map(_(1)) == Seq("10", "20"))
  }

  test("grouped positional picks: negative nth from end, OOB => null") {
    val f = frame(Seq(("g", 1), ("g", 2), ("g", 3), ("h", 9)).toDF("k", "v"))
    val got = f.groupBy("k").positional(Seq(
      ("p0", "v", 0), ("p_last", "v", -1), ("p5", "v", 5)))
    assert(got.records().tail == Seq(
      Seq("g", "1", "3", "(null)"), Seq("h", "9", "9", "(null)")))
  }

  test("havingCount filters groups; counts include nulls") {
    val f = frame(Seq[(String, java.lang.Double)](
      ("g", 1.0), ("g", null), ("h", 2.0)).toDF("k", "v"))
    // havingCount keeps the grouped frame (groupers.go:595-615) so
    // further reducers chain over only the surviving groups
    val got = f.groupBy("k").havingCount(_ >= 2).sum("v")
    assert(got.records().tail.map(_.head) == Seq("g"))
  }

  test("groupByStringified reproduces tada's |-join key collisions (§1.5)") {
    // ("a|b", "c") and ("a", "b|c") concatenate to the same "a|b|c" key —
    // the reference groups them together; typed groupBy keeps them apart
    val f = frame(Seq(("a|b", "c", 1), ("a", "b|c", 2)).toDF("k1", "k2", "v"))
    assert(f.groupBy("k1", "k2").count("v").records().tail.size == 2)
    val merged = f.groupByStringified("k1", "k2").count("v").records().tail
    assert(merged == Seq(Seq("a|b", "c", "2")))
  }

  test("group key order is first appearance in frame order, even after sort") {
    val f = frame(Seq(("z", 1), ("a", 2), ("z", 3)).toDF("k", "v"))
    assert(f.groupBy("k").count("v").records().tail.map(_.head) == Seq("z", "a"))
    assert(f.sort(Sorter("k")).groupBy("k").count("v").records().tail.map(_.head) ==
      Seq("a", "z"))
  }

  test("pivot knownValues: group order counts rows pivot cells exclude (ADVICE r15 high)") {
    // row 0 (group x) and row 3 (group z) have NULL pivot values —
    // Seq[String] knownValues can never include them, so per-cell
    // partials never see these rows; the group rep must still. Group z
    // has NO row in any known cell at all (its only row is null-k).
    // First appearance over ALL rows: x (row 0), y (row 1), z (row 3).
    val df = Seq[(Int, String, String, java.lang.Double)](
      (1, "x", null, 1.0), (2, "y", "a", 2.0),
      (3, "x", "a", 3.0), (4, "z", null, 4.0)).toDF("s", "g", "k", "v")
    val f = frame(df)
    val un = Reshape.pivotTable(f, Seq("g"), "k", F.sum(F.col("v")),
      knownValues = Seq("a", "b"), prefix = "pv_")
    assert(un.records().tail.map(_.head) == Seq("x", "y", "z"))
    assert(un.records().head == Seq("g", "pv_a", "pv_b"))
    // the all-excluded group z has null cells but a REAL ordinal slot
    assert(un.records().tail.last == Seq("z", "(null)", "(null)"))
    // SORTED frame: same contract through repWindowCol/rankRep
    val so = Reshape.pivotTable(f.sort(Sorter("s", descending = true)),
      Seq("g"), "k", F.sum(F.col("v")), knownValues = Seq("a", "b"), prefix = "pv_")
    assert(so.records().tail.map(_.head) == Seq("z", "x", "y"))
    // plan audit: Spark plans pivot as two-phase aggregation —
    // groupBy(labels, pivotCol) partials, exchange, pivotfirst, exchange
    // — BOTH exchanges carry partial-AGGREGATED rows (~groups × cells),
    // never the data, and partial_ aggregation rides each map side. The
    // rejected window-rep variant exchanged the raw rows (measured
    // 1.6–4× on low-cardinality labels).
    val plan = un.df.queryExecution.executedPlan.toString
    val nEx = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(nEx <= 2, s"pivot must exchange only aggregate partials, saw $nEx:\n" +
      plan.take(2000))
    assert(plan.contains("partial_pivotfirst") || plan.contains("partial_"),
      s"pivot must keep map-side partial aggregation:\n${plan.take(2000)}")
  }

  test("shuffle(seed): deterministic, long ordinal, composes with chunked ops") {
    val f = frame(spark.createDataFrame(spark.sparkContext.parallelize(
      (0 until 32).map(i => (i, i.toLong)), 4)).toDF("i", "v"))
    val s7 = f.shuffle(7)
    assert(s7.records() == f.shuffle(7).records(), "same seed, same order")
    assert(s7.records() != f.shuffle(8).records(), "different seed, different order")
    assert(s7.records().tail.map(_.head).sorted ==
      (0 until 32).map(_.toString).sorted, "a permutation, not a resample")
    // the ordinal stays LONG (r16 review: the rand() double ordinal broke
    // the chunked plans' shiftright bands on any downstream prefix op)
    assert(s7.df.schema(TadaFrame.ORD).dataType ==
      org.apache.spark.sql.types.LongType)
    // r17 (ADVICE medium): the permutation is a Feistel BIJECTION of
    // [0, 2^53), not a raw hash — ordinal uniqueness is load-bearing
    // downstream (positional ops, rollingN tail rebuild), and a hash's
    // ~n²/2^54 collisions silently merge two rows' windows at corpus
    // scale. Distinctness must survive a domain far denser than the
    // test frame: 200k sequential ords AND 200k banded (chunk<<33|row)
    // ords, plus band-boundary values.
    locally {
      val dense = spark.range(200000L)
      val banded = spark.range(200000L)
        .select(F.shiftleft(F.col("id") % 512, 33)
          .bitwiseOR(F.floor(F.col("id") / 512).cast("long")).as("id"))
      val edges = spark.createDataset(Seq(0L, 1L, (1L << 33) - 1, 1L << 33,
        (1L << 53) - 1, (1L << 52) + 12345L))(org.apache.spark.sql.Encoders.scalaLong)
        .toDF("id")
      for ((dom, tag) <- Seq((dense, "dense"), (banded, "banded"), (edges, "edges"))) {
        val n = dom.count()
        val g = TadaFrame.ingest(dom.withColumnRenamed("id", "x"))
          .copy(df = dom.select(F.col("id").as("x"), F.col("id").as(TadaFrame.ORD)))
        val out = g.shuffle(42).df
        assert(out.select(TadaFrame.ORD).distinct().count() == n,
          s"shuffle must be collision-free on the $tag domain")
        val mm = out.agg(F.min(TadaFrame.ORD), F.max(TadaFrame.ORD)).head()
        assert(mm.getLong(0) >= 0L && mm.getLong(1) < (1L << 53),
          s"shuffled ordinals must stay in [0, 2^53) on the $tag domain")
      }
      // APPENDED frames: both sides carry the SAME ingest ordinals in
      // their low 53 bits, so a permutation that ignored the band bits
      // collides every shared position systematically — the bijection
      // must cover the full [0, bands·2^53) domain
      val halfA = (0 until 5000).map(i => RowXY(i, i.toLong))
      val halfB = (0 until 5000).map(i => RowXY(i + 5000, -i.toLong))
      val app = TadaFrame.ingest(
          spark.createDataFrame(spark.sparkContext.parallelize(halfA, 4)))
        .append(TadaFrame.ingest(
          spark.createDataFrame(spark.sparkContext.parallelize(halfB, 4))))
      val sh = app.shuffle(42)
      assert(sh.df.select(TadaFrame.ORD).distinct().count() == 10000L,
        "shuffle must be collision-free on an appended (multi-band) frame")
      assert(sh.bands == app.bands, "band budget survives the shuffle")
      assert(sh.df.agg(F.max(TadaFrame.ORD)).head().getLong(0) <
        (app.bands.toLong << 53), "shuffled ordinals stay inside the band domain")
      assert(sh.records() == app.shuffle(42).records(),
        "multi-band shuffle stays deterministic")
    }
    assert(Analytics.cumSum(s7, "v", "cs").records() ==
      Analytics.cumSumWindow(s7, "v", "cs").records(),
      "whole-frame chunked cumsum must run on a shuffled frame")
    // and the pivot ordinal machinery accepts a shuffled frame
    val pv = Reshape.pivotTable(s7.withCol("g", F.col("i") % 3),
      Seq("g"), "i", F.count(F.lit(1)))
    assert(pv.records().tail.size == 3)
  }

  test("empty pivot domain on a sorted frame returns an empty frame (ADVICE r15 medium)") {
    val empty = frame(Seq.empty[(Int, String, String, Double)]
      .toDF("s", "g", "k", "v")).sort(Sorter("s"))
    val out = Reshape.pivotTable(empty, Seq("g"), "k", F.sum(F.col("v")))
    assert(out.records().tail.isEmpty)
    assert(out.records().head == Seq("g"))
  }
}

/** Tiny two-column fixture for the multi-band shuffle bijectivity case. */
case class RowXY(i: Int, v: java.lang.Long)
