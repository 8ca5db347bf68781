package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.io.TadaIO
import graft.io.TadaIO.ReadConfig

/** §2.1 IO surface: readers' knobs, error paths, renderer, mock data. */
class IoSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("happy path: 1 header row, default labels (test_csv/1_header_0_labels.csv)") {
    val f = TadaIO.readCsvString(spark, "Name,Age\nfoo,1\nbar,2")
    assert(f.listColNames == Seq("Name", "Age"))
    assert(f.records().tail == Seq(Seq("foo", "1"), Seq("bar", "2")))
  }

  test("ragged rows error (test_csv/bad_delimiter.csv path)") {
    val e = intercept[IllegalArgumentException] {
      TadaIO.readCsvString(spark, "a,b\nfoo\nbar,1")
    }
    assert(e.getMessage.contains("ragged"))
  }

  test("empty input errors (test_csv/empty.csv path)") {
    intercept[IllegalArgumentException] { TadaIO.readCsvString(spark, "") }
  }

  test("label levels + multi-row headers join with |, empty cells kept") {
    // joinLevelsIntoName (internal.go:1501-1503) joins the raw header
    // cells — ("lbl","") names the label "lbl|", preserving which level
    // each part came from for stacked rendering
    val f = TadaIO.readRecords(spark,
      Seq(Seq("lbl", "x", "x"), Seq("", "a", "b"), Seq("r1", "1", "2")),
      ReadConfig(headerRows = 2, labelLevels = 1))
    assert(f.listLabelNames == Seq("lbl|"))
    assert(f.listColNames == Seq("x|a", "x|b"))
    assert(f.colLevelNames == Seq("*0", "*1"))
  }

  test("type inference: 10-row majority vote casts to double/date") {
    val f = TadaIO.readCsvString(spark,
      "v,d,s\n1.5,2020-01-01,x\n2,2020-01-02,y\noops,2020-01-03,z",
      ReadConfig(inferTypes = true))
    import org.apache.spark.sql.types._
    assert(f.df.schema("v").dataType == DoubleType)
    assert(f.df.schema("d").dataType == DateType)
    assert(f.df.schema("s").dataType == StringType)
    // failed coercion => null (internal.go:1639-1641)
    assert(f.records().tail.map(_.head) == Seq("1.5", "2", "(null)"))
  }

  test("null strings normalize to null at ingest (options.go:17)") {
    val f = TadaIO.readCsvString(spark, "a,b\n(null),x\nok,")
    assert(f.records().tail == Seq(Seq("(null)", "x"), Seq("ok", "(null)")))
  }

  test("record writer renders nulls as (null) and stringifies doubles Go-style") {
    import spark.implicits._
    val f = graft.core.TadaFrame.ingest(
      Seq[(java.lang.Double, String)]((1.0, "x"), (null, "y")).toDF("v", "t"))
    assert(f.records().tail == Seq(Seq("1", "x"), Seq("(null)", "y")))
  }

  test("ASCII renderer golden") {
    import spark.implicits._
    val f = graft.core.TadaFrame.ingest(Seq(("foo", 1), ("bar", 2)).toDF("name", "n"))
    val want =
      """+---++------+---+
        || - || name | n |
        ||---||------|---|
        || 0 ||  foo | 1 |
        || 1 ||  bar | 2 |
        |+---++------+---+""".stripMargin
    assert(TadaIO.render(f) == want)
  }

  test("frame JSON codec round-trips labels, null kinds, name, colLevelNames") {
    import spark.implicits._
    // two label levels, a double column with a true null, and a string
    // column where "(null)" is a VALUE on one row and a true null on
    // another — the distinction the line-JSON form cannot carry
    val df = Seq(
      ("a", 1L, Some(1.5), Some("(null)")),
      ("a", 2L, None, None),
      ("b", 3L, Some(2.0), Some("x"))
    ).toDF("l1", "l2", "d", "s")
    val f = graft.core.TadaFrame.ingest(df, labelCols = Seq("l1", "l2"), name = "fix")
      .copy(colLevelNames = Seq("*0", "year"))
    val back = TadaIO.unmarshalFrame(spark, TadaIO.marshalFrame(f))
    assert(back.labels == Seq("l1", "l2"))
    assert(back.name == "fix")
    assert(back.colLevelNames == Seq("*0", "year"))
    val rows = back.sorted.select("l1", "l2", "d", "s").collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("a", "a", "b"))
    assert(rows(0).getDouble(2) == 1.5 && rows(2).getDouble(2) == 2.0)
    assert(rows(1).isNullAt(2)) // true null survives
    assert(rows(0).getString(3) == "(null)") // literal string survives AS a value
    assert(rows(1).isNullAt(3)) // true null stays null, not "(null)"
    // document shape matches the reference alias structs (io.go:45-97)
    val doc = TadaIO.marshalFrame(f)
    assert(doc.contains("\"labels\"") && doc.contains("\"values\"")
      && doc.contains("\"slice\"") && doc.contains("\"isNull\"")
      && doc.contains("\"colLevelNames\""))
  }

  test("TadaOptions: reference defaults; knobs thread through readers and render") {
    import graft.io.TadaOptions
    val defaults = TadaOptions()
    // default parity with options.go:9-23
    assert(defaults.levelSeparator == "|" && defaults.maxRows == 50
      && defaults.maxColumns == 20 && defaults.maxCellWidth == 30
      && defaults.mergeRepeats && defaults.nullPrinter == "(null)"
      && defaults.nullStrings == Set("(null)") && !defaults.emptyStringAsNull
      && defaults.nanIsNull && defaults.defaultNamePrefix == "*")
    // SetOptionAddNullString: "NA" reads as null
    val fNa = TadaIO.readRecords(spark, Seq(Seq("x"), Seq("NA"), Seq("v")),
      defaults.addNullString("NA").readConfig())
    assert(fNa.records().tail.map(_.head) == Seq("(null)", "v"))
    // SetOptionDefaultSeparator: multi-row headers collapse with it
    val fSep = TadaIO.readRecords(spark, Seq(Seq("a"), Seq("b"), Seq("1")),
      defaults.copy(levelSeparator = "::").readConfig(headerRows = 2))
    assert(fSep.valueCols == Seq("a::b"))
    // SetOptionNaNStatus: NaN is null by default, a value when disabled
    val fNan = TadaIO.readRecords(spark, Seq(Seq("x"), Seq("NaN"), Seq("1.5")),
      defaults.readConfig(inferTypes = true))
    assert(fNan.records().tail.map(_.head) == Seq("(null)", "1.5"))
    val fNanOff = TadaIO.readRecords(spark, Seq(Seq("x"), Seq("NaN"), Seq("1.5")),
      defaults.copy(nanIsNull = false).readConfig(inferTypes = true))
    assert(fNanOff.records().tail.map(_.head) == Seq("NaN", "1.5"))
    // SetOptionEmptyStringAsNull: default off keeps "" a value
    val fBlank = TadaIO.readRecords(spark, Seq(Seq("x"), Seq(""), Seq("v")),
      defaults.readConfig())
    assert(fBlank.records().tail.map(_.head) == Seq("", "v"))
    val fBlankNull = TadaIO.readRecords(spark, Seq(Seq("x"), Seq(""), Seq("v")),
      defaults.copy(emptyStringAsNull = true).readConfig())
    assert(fBlankNull.records().tail.map(_.head) == Seq("(null)", "v"))
    // PrintOptionMergeRepeats + nullPrinter thread into render
    val fr = TadaIO.readRecords(spark, Seq(Seq("c"), Seq("v"), Seq("v")))
    assert(TadaIO.render(fr, defaults).linesIterator.count(_.contains(" v ")) == 1)
    assert(TadaIO.render(fr, defaults.copy(mergeRepeats = false))
      .linesIterator.count(_.contains(" v ")) == 2)
  }

  test("mock CSV: deterministic, pool-valued, ~10% nulls") {
    val src = "score,name\n1.5,foo\n2.5,bar"
    val a = TadaIO.mockCsv(spark, src, 50)
    val b = TadaIO.mockCsv(spark, src, 50)
    assert(a == b)
    val rows = a.split("\n").tail
    assert(rows.length == 50)
    val fields = rows.map(_.split(",", -1).toSeq)
    assert(fields.forall(r =>
      Seq(".1", ".25", ".5", ".75", ".9", "(null)").contains(r.head)))
  }

  test("interface records: mixed-typed cells, per-column inference, null sentinels") {
    // io_test.go:325-384 "pass - by rows - 1 header": float cells under
    // string headers, default label level
    val f = TadaIO.readInterfaceRecords(spark,
      Seq(Seq("foo", "bar"), Seq(1.0, 2.0)))
    assert(f.listColNames == Seq("foo", "bar"))
    assert(f.df.schema("foo").dataType.typeName == "double")
    assert(f.records().tail == Seq(Seq("1", "2")))
    // per-column types: uniform integral → long, numeric mix → double,
    // bool/date/string native, genuinely mixed → fmt.Sprint string
    val g = TadaIO.readInterfaceRecords(spark,
      Seq(
        Seq("i", "d", "b", "dt", "s", "mixed"),
        Seq(1, 1.5, true, java.time.LocalDate.of(2020, 1, 1), "x", 1),
        Seq(2L, 2, false, java.time.LocalDate.of(2020, 1, 2), "y", "two")))
    val types = g.valueCols.map(c => g.df.schema(c).dataType.typeName)
    assert(types == Seq("long", "double", "boolean", "date", "string", "string"))
    assert(g.records().tail.map(_.last) == Seq("1", "two"))
    // null sentinels (isNullInterface internal.go:1928-1966): nil, NaN,
    // null-string, empty nested slice
    val h = TadaIO.readInterfaceRecords(spark,
      Seq(
        Seq("a", "b", "c", "d"),
        Seq(null, Double.NaN, "(null)", Seq.empty[Int]),
        Seq(1, 2.0, "ok", Seq(1, 2))))
    assert(h.records().tail.head == Seq("(null)", "(null)", "(null)", "(null)"))
    // error paths (io_test.go "fail - no records" / "first record empty")
    intercept[IllegalArgumentException] {
      TadaIO.readInterfaceRecords(spark, Seq.empty)
    }
    intercept[IllegalArgumentException] {
      TadaIO.readInterfaceRecords(spark, Seq(Seq.empty, Seq(0)))
    }
    // by-column form (io_test.go ByColumn) + ragged check
    val byCol = TadaIO.readInterfaceRecords(spark,
      Seq(Seq("foo", 1.0, 2.0), Seq("bar", 3L, 4L)), byColumn = true)
    assert(byCol.listColNames == Seq("foo", "bar"))
    assert(byCol.records().tail == Seq(Seq("1", "3"), Seq("2", "4")))
    // header-rows bound (ADVICE r7: the old guard was a tautology that
    // silently yielded an empty frame with truncated names). Reference
    // semantics: headers > records panics (internal.go:604-610) → error
    // here; headers == records yields an empty body.
    intercept[IllegalArgumentException] {
      TadaIO.readInterfaceRecords(spark, Seq(Seq("h1", "h2")),
        ReadConfig(headerRows = 2))
    }
    val emptyBody = TadaIO.readInterfaceRecords(spark,
      Seq(Seq("a", "b"), Seq("x", "y")), ReadConfig(headerRows = 2))
    assert(emptyBody.listColNames == Seq("a|x", "b|y"))
    assert(emptyBody.records().tail.isEmpty)
  }

  test("interface writer: typed values out, nulls as null, header slots per level") {
    val f = TadaIO.readInterfaceRecords(spark,
      Seq(Seq("n", "v"), Seq("a", 1.5), Seq("b", null)))
    val recs = TadaIO.writeInterfaceRecords(f)
    // row-major: header row then typed rows; null stays null (not "(null)")
    assert(recs == Seq(Seq("n", "v"), Seq("a", 1.5), Seq("b", null)))
    // typed roundtrip: reading the written records reproduces the frame
    val back = TadaIO.readInterfaceRecords(spark, recs)
    assert(back.records() == f.records())
    // column-major with labels: one header slot per column level
    val byCol = TadaIO.writeInterfaceRecords(f, includeLabels = false, byColumn = true)
    assert(byCol == Seq(Seq("n", "a", "b"), Seq("v", 1.5, null)))
  }

  import IoSpec.P
  test("case-class roundtrip (StructReader/StructWriter)") {
    import spark.implicits._
    val in = Seq(P("foo", 1L), P("bar", 2L))
    val f = TadaIO.readCaseClass(spark, in)
    assert(TadaIO.writeCaseClass[P](f) == in)
  }

  test("bucketed tables join with NO shuffle exchange (co-located scale path)") {
    import spark.implicits._
    val a = (0 until 100).map(i => (i.toLong, s"a$i")).toDF("k", "va")
    val b = (0 until 100).map(i => (i.toLong, i * 2.0)).toDF("k", "vb")
    TadaIO.writeBucketed(a, "t_buck_a", Seq("k"), 8)
    TadaIO.writeBucketed(b, "t_buck_b", Seq("k"), 8)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force a non-broadcast join so the claim under test is the
      // bucketing, not a broadcast that would hide a shuffle anyway
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val j = spark.table("t_buck_a").join(spark.table("t_buck_b"), "k")
      assert(j.count() == 100)
      val plan = j.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join should not shuffle:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("partitioned layout prunes non-matching partitions at planning time") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-part").toString
    val df = (0 until 300).map(i => (i.toLong, s"src${i % 3}", i * 1.5))
      .toDF("id", "source", "v")
    TadaIO.writePartitioned(df, dir, Seq("source"))
    val q = spark.read.parquet(dir).filter($"source" === "src1")
    assert(q.count() == 100)
    val scan = q.queryExecution.executedPlan.toString
    // the predicate must resolve against directories, not rows: it
    // appears in PartitionFilters and the scan reads 1 of 3 partitions
    assert(scan.contains("PartitionFilters: [isnotnull(source"),
      s"partition predicate not pruned at planning time:\n$scan")
    val scanned = q.queryExecution.executedPlan.collectLeaves()
      .collectFirst { case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.selectedPartitions.partitionCount }
    assert(scanned.contains(1), s"expected 1 of 3 partitions scanned, got $scanned")
  }

  test("ORC roundtrip with predicate pushdown (alternate columnar format)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-orc").toString
    val df = (0 until 200).map(i => (i.toLong, s"name$i", i * 2.5)).toDF("id", "name", "v")
    df.write.mode("overwrite").orc(dir)
    val back = spark.read.orc(dir)
    assert(back.count() == 200)
    assert(back.schema.map(_.name) == Seq("id", "name", "v"))
    val q = back.filter($"id" < 10).select("id", "v")
    assert(q.count() == 10)
    val scan = q.queryExecution.executedPlan.toString
    // both levers must reach the ORC scan: predicate + column pruning
    assert(scan.contains("PushedFilters: [IsNotNull(id), LessThan(id,10)]"),
      s"ORC pushdown missing:\n$scan")
    assert(scan.contains("ReadSchema: struct<id:bigint,v:double>"),
      s"ORC column pruning missing:\n$scan")
  }

  test("matrix reader/writer roundtrip (gonum Dims/At surface)") {
    val m = Seq(Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0))
    val f = TadaIO.readMatrix(spark, m)
    assert(f.valueCols == Seq("0", "1", "2"))
    assert(TadaIO.writeMatrix(f) == m)
    intercept[IllegalArgumentException] {
      TadaIO.readMatrix(spark, Seq(Seq(1.0), Seq(1.0, 2.0))) // ragged
    }
  }

  test("diffStructs reports the first differing typed row") {
    import IoSpec.P
    assert(TadaIO.diffStructs(Seq(P("a", 1), P("b", 2)), Seq(P("a", 1), P("b", 2))).isEmpty)
    val d = TadaIO.diffStructs(Seq(P("a", 1), P("b", 2)), Seq(P("a", 1), P("b", 3)))
    assert(d.exists(_.startsWith("row 1")))
    assert(TadaIO.diffStructs(Seq(P("a", 1)), Seq.empty[P]).exists(_.contains("row count")))
  }

  test("JSON codec roundtrips a frame through line-delimited JSON") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-json").toString
    val f = graft.core.TadaFrame.ingest(Seq((1L, "x", 2.5), (2L, "y", 3.5)).toDF("id", "s", "v"))
    TadaIO.writeJson(f, dir)
    val back = TadaIO.readJson(spark, dir)
    val got = back.df.select("id", "s", "v").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    assert(got == Set((1L, "x", 2.5), (2L, "y", 3.5)))
  }
}

object IoSpec {
  final case class P(name: String, age: Long)
}
