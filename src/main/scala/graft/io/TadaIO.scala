package graft.io

import org.apache.spark.sql.{DataFrame, Encoder, Row, SparkSession}
import org.apache.spark.sql.{functions => F}
import org.apache.spark.sql.types._

import graft.core.TadaFrame
import graft.semantics.TadaFormat

/** IO surface (SURVEY.md §2.1): record/CSV/case-class readers & writers
  * with the reference's knobs — N header rows, M label levels, optional
  * 10-row-majority type inference, blank-as-null, configurable null
  * strings — plus the `(null)` record writer, ASCII rendering, mock-CSV
  * generation and diff-based equality for the test-driven workflow.
  *
  * Scale note: `readCsvPath` is the distributed path (`spark.read.csv`
  * keeps the scan parallel and pushdown-capable). The record/string
  * forms are driver-side by nature — they exist for the reference's
  * test-driven pipeline workflow (readme_test.go), not for bulk data.
  */
object TadaIO {

  final case class ReadConfig(
      headerRows: Int = 1,
      labelLevels: Int = 0,
      inferTypes: Boolean = false,
      blankAsNull: Boolean = true,
      nullStrings: Seq[String] = Seq("(null)"),
      delimiter: Char = ',')

  /** RecordReader (io.go:213-268): [][]string → frame. Validates
    * rectangularity (internal.go:523-528) and non-emptiness
    * (io.go:253-258). */
  def readRecords(spark: SparkSession, records: Seq[Seq[String]],
                  cfg: ReadConfig = ReadConfig()): TadaFrame = {
    require(records.nonEmpty, "readRecords: empty input")
    val width = records.head.size
    records.zipWithIndex.foreach { case (r, i) =>
      require(r.size == width, s"readRecords: ragged row $i (${r.size} fields, want $width)")
    }
    val headers = records.take(cfg.headerRows)
    val body = records.drop(cfg.headerRows)
    // multi-row headers collapse with "|" (colLevelNames separator, options.go:9)
    val names: Seq[String] =
      if (cfg.headerRows == 0) (0 until width).map(i => i.toString)
      else (0 until width).map(i => headers.map(_(i).trim).filter(_.nonEmpty).mkString("|"))
    val nulls = cfg.nullStrings ++ (if (cfg.blankAsNull) Seq("") else Nil)
    val rows = body.map(r => Row.fromSeq(r.map { v =>
      val t = v.trim
      if (nulls.contains(t)) null else t
    }))
    val schema = StructType(names.map(n => StructField(n, StringType)).toIndexedSeq)
    val df0 = spark.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava),
      schema)
    val df = if (cfg.inferTypes) castInferred(df0, body, names) else df0
    val labels = names.take(cfg.labelLevels)
    TadaFrame.ingest(df, labels)
  }

  /** Per-value inference float → date → datetime → string, majority vote
    * over the first 10 rows (internal.go:844-892). */
  private[io] def inferType(v: String): String = {
    val t = v.trim
    if (t.isEmpty) "string"
    else if (t.toDoubleOption.isDefined) "float"
    else if (t.matches("""\d{4}-\d{2}-\d{2}""")) "date"
    else if (t.matches("""\d{4}-\d{2}-\d{2}[T ]\d{2}:\d{2}(:\d{2})?.*""")) "datetime"
    else "string"
  }

  private def castInferred(df: DataFrame, body: Seq[Seq[String]], names: Seq[String]): DataFrame = {
    val sample = body.take(10)
    names.zipWithIndex.foldLeft(df) { case (d, (n, i)) =>
      val votes = sample.map(r => inferType(r(i))).groupBy(identity).view.mapValues(_.size)
      val winner = if (votes.isEmpty) "string" else votes.maxBy(_._2)._1
      // try_cast: tada's failed coercions produce null (internal.go:1639-1641);
      // Spark 4's default ANSI cast would throw instead
      winner match {
        case "float" => d.withColumn(n, d(n).try_cast(DoubleType))
        case "date" => d.withColumn(n, d(n).try_cast(DateType))
        case "datetime" => d.withColumn(n, d(n).try_cast(TimestampType))
        case _ => d
      }
    }
  }

  /** CSV string form (driver-side fixture path; embeds encoding/csv
    * semantics io.go:304-359). */
  def readCsvString(spark: SparkSession, csv: String,
                    cfg: ReadConfig = ReadConfig()): TadaFrame = {
    val lines = csv.split("\n").toSeq.filter(_.nonEmpty)
    require(lines.nonEmpty, "readCsvString: empty input")
    readRecords(spark, lines.map(splitCsvLine(_, cfg.delimiter)), cfg)
  }

  /** Minimal RFC-4180 line splitter (quotes + escaped quotes). */
  private[io] def splitCsvLine(line: String, delim: Char): Seq[String] = {
    val out = Seq.newBuilder[String]
    val cur = new StringBuilder
    var inQ = false
    var i = 0
    while (i < line.length) {
      val c = line(i)
      if (inQ) {
        if (c == '"' && i + 1 < line.length && line(i + 1) == '"') { cur += '"'; i += 1 }
        else if (c == '"') inQ = false
        else cur += c
      } else c match {
        case '"' => inQ = true
        case `delim` => out += cur.result(); cur.clear()
        case _ => cur += c
      }
      i += 1
    }
    out += cur.result()
    out.result()
  }

  /** Distributed CSV scan — the scale path. */
  def readCsvPath(spark: SparkSession, path: String,
                  cfg: ReadConfig = ReadConfig()): TadaFrame = {
    val df = spark.read
      .option("header", cfg.headerRows > 0)
      .option("delimiter", cfg.delimiter.toString)
      .option("nullValue", cfg.nullStrings.headOption.getOrElse("(null)"))
      .option("inferSchema", cfg.inferTypes)
      .csv(path)
    TadaFrame.ingest(df)
  }

  /** RecordWriter (io.go:271-299): frame → [][]string, nulls as
    * "(null)" (internal.go:2866-2890). Header row first. */
  def writeRecords(f: TadaFrame, includeLabels: Boolean = true): Seq[Seq[String]] =
    f.records(includeLabels)

  /** Case-class reader (StructReader io.go:436-500) — `Dataset[T]`. */
  def readCaseClass[T <: Product : Encoder](spark: SparkSession, data: Seq[T]): TadaFrame =
    TadaFrame.ingest(spark.createDataset(data)(implicitly[Encoder[T]]).toDF())

  /** Case-class writer (StructWriter): frame → typed Seq in frame order. */
  def writeCaseClass[T: Encoder](f: TadaFrame): Seq[T] = {
    val cols = (f.labels ++ f.valueCols).map(f.df(_))
    f.df.orderBy(f.orderCols: _*).select(cols: _*).as[T](implicitly[Encoder[T]])
      .collect().toSeq
  }

  /** ASCII table renderer (dataframe.go:138-222 look): driver-side, for
    * the golden-output test layer. */
  def render(f: TadaFrame, maxRows: Int = 50, maxCellWidth: Int = 30): String = {
    val recs = f.records()
    val shown = recs.head +: recs.tail.take(maxRows)
    val clipped = shown.map(_.map(v => if (v.length > maxCellWidth) v.take(maxCellWidth - 3) + "..." else v))
    val widths = clipped.transpose.map(col => col.map(_.length).max)
    def sep = widths.map("-" * _).mkString("+-", "-+-", "-+")
    def row(r: Seq[String]) =
      r.zip(widths).map { case (v, w) => v.padTo(w, ' ') }.mkString("| ", " | ", " |")
    val overflow = if (recs.tail.size > maxRows) s"\n... (${recs.tail.size - maxRows} more rows)" else ""
    (sep +: row(clipped.head) +: sep +: clipped.tail.map(row) :+ sep).mkString("\n") + overflow
  }

  /** WriteMockCSV (io.go:537-557): infer dtypes from a source CSV, emit n
    * deterministic rows from fixed per-dtype pools (internal.go:909-933),
    * 10% nulls. */
  private val floatPool = Seq(".1", ".25", ".5", ".75", ".9")
  private val stringPool = Seq("foo", "bar", "baz", "qux", "quuz")
  private val datePool = Seq("2019-12-31", "2020-01-01", "2020-01-02", "2020-02-01", "2020-02-02")

  def mockCsv(spark: SparkSession, srcCsv: String, n: Int,
              cfg: ReadConfig = ReadConfig()): String = {
    val lines = srcCsv.split("\n").toSeq.filter(_.nonEmpty)
    val header = lines.head
    val body = lines.tail.map(splitCsvLine(_, cfg.delimiter))
    val kinds = body.head.indices.map { i =>
      val votes = body.take(10).map(r => inferType(r(i))).groupBy(identity).view.mapValues(_.size)
      if (votes.isEmpty) "string" else votes.maxBy(_._2)._1
    }
    val rng = new scala.util.Random(42) // deterministic-clock seam (types.go:271)
    val rows = (0 until n).map { _ =>
      kinds.map { k =>
        if (rng.nextDouble() < 0.1) "(null)"
        else k match {
          case "float" => floatPool(rng.nextInt(floatPool.size))
          case "date" | "datetime" => datePool(rng.nextInt(datePool.size))
          case _ => stringPool(rng.nextInt(stringPool.size))
        }
      }.mkString(cfg.delimiter.toString)
    }
    (header +: rows).mkString("\n")
  }

  /** EqualRecords (io.go:562-597): structural diff of stringified
    * records; None = equal, Some(msg) = first difference. */
  def diffRecords(got: Seq[Seq[String]], want: Seq[Seq[String]]): Option[String] = {
    if (got.size != want.size) return Some(s"row count: got ${got.size}, want ${want.size}")
    got.zip(want).zipWithIndex.collectFirst {
      case ((g, w), i) if g != w => s"row $i: got $g, want $w"
    }
  }

  /** EqualStructs (io.go:600-618): typed-slice equality with the first
    * differing index, the case-class twin of diffRecords. */
  def diffStructs[T](got: Seq[T], want: Seq[T]): Option[String] = {
    if (got.size != want.size) return Some(s"row count: got ${got.size}, want ${want.size}")
    got.zip(want).zipWithIndex.collectFirst {
      case ((g, w), i) if g != w => s"row $i: got $g, want $w"
    }
  }

  /** MatrixReader (io.go:278-299): an all-double row-major matrix as a
    * TadaFrame with columns "0".."k-1" — gonum's Dims/At surface mapped
    * onto an ordinary frame. */
  def readMatrix(spark: SparkSession, m: Seq[Seq[Double]]): TadaFrame = {
    require(m.nonEmpty && m.map(_.size).distinct.size == 1,
      "matrix: non-empty rectangular input required")
    val names = m.head.indices.map(_.toString)
    val rows = m.map(r => org.apache.spark.sql.Row.fromSeq(r))
    val schema = org.apache.spark.sql.types.StructType(names.map(n =>
      org.apache.spark.sql.types.StructField(n, org.apache.spark.sql.types.DoubleType)))
    TadaFrame.ingest(spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toList), schema))
  }

  /** Matrix writer: frame (numeric columns) → row-major Array of rows,
    * in frame order. Driver-side by contract, like the reference's
    * gonum interop (capped the same way the renderers are). */
  def writeMatrix(f: TadaFrame, maxRows: Int = 100000): Seq[Seq[Double]] = {
    val cols = f.valueCols
    f.df.orderBy(f.orderCols: _*).limit(maxRows)
      .select(cols.map(c => F.col(c).cast("double")): _*)
      .collect().toSeq.map(r => cols.indices.map(i => r.getDouble(i)))
  }

  /** JSON codec (io.go:126-154 marshal/unmarshal): distributed
    * line-delimited JSON via Spark's native source — schema inference on
    * read, one JSON object per row on write. */
  def readJson(spark: SparkSession, path: String): TadaFrame =
    TadaFrame.ingest(spark.read.json(path))
  def writeJson(f: TadaFrame, path: String): Unit =
    f.df.select((f.labels ++ f.valueCols).map(F.col): _*)
      .write.mode("overwrite").json(path)

  /** Bucketed persist — the co-located-join scale path. Two tables
    * bucketed (and sort-prepped) on the same keys with the same bucket
    * count join WITHOUT a shuffle exchange: the scan's output
    * partitioning already satisfies the join's requirement, so at 100 TB
    * the fact-to-fact join cost drops from 2 full shuffles to zero
    * (`IoSpec` asserts the no-Exchange plan). Use for the big-×-big
    * joins where neither side broadcasts and the join recurs (the
    * bucketing pays for itself on the second join). */
  def writeBucketed(df: org.apache.spark.sql.DataFrame, table: String,
                    bucketCols: Seq[String], buckets: Int): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    // an in-memory catalog forgets tables across sessions but their
    // managed-table directories survive — clear any leftover or the
    // CREATE refuses the location
    val loc = new org.apache.hadoop.fs.Path(
      spark.sessionState.catalog.defaultTablePath(
        org.apache.spark.sql.catalyst.TableIdentifier(table)))
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    df.write.mode("overwrite").format("parquet")
      .bucketBy(buckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .saveAsTable(table)
  }

  /** Hive-style partitioned persist — the partition-pruning scale path.
    * A predicate on the partition column resolves against directory
    * names at PLANNING time (`PartitionFilters` in the scan), so a
    * 100 TB corpus laid out by source/date/language reads only the
    * matching directories — bytes the query never touches are never
    * listed, opened, or scanned. Complements `writeBucketed`: partition
    * on the low-cardinality selection columns, bucket on the join keys. */
  def writePartitioned(df: org.apache.spark.sql.DataFrame, path: String,
                       partitionCols: Seq[String]): Unit =
    df.write.mode("overwrite")
      .partitionBy(partitionCols: _*)
      .parquet(path)
}
