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
  /** Shared pivot core with the reference's deterministic result order:
    * each group sits at its first appearance in FRAME order (the r14
    * differential-fuzz seed-511 contract — a re-ingested pivot took
    * Spark's partition order and a later stable sort's ties diverged).
    *
    * r16 (ADVICE r15): the group ordinal is an UNFILTERED window rep.
    * Every pivot aggregate is cell-filtered, so the r15 least()-of-
    * per-cell-partials shape lost any row whose pivot value was null or
    * outside `knownValues` (`Seq[String]` can never express null) —
    * group order silently diverged from the reference's first-
    * appearance-over-ALL-rows contract (internal.go:1399-1424), and an
    * all-excluded group got a null ordinal. Instead the rep is computed
    * per ROW as `min(...) over partitionBy(labels)` — constant within a
    * group, covering every row — and carried as an extra GROUPING
    * column: groups are unchanged (the rep is functionally dependent on
    * the labels) and the window's hash exchange on the labels already
    * satisfies the groupBy's clustering, so there is still exactly one
    * shuffle and no join. This also deletes the `_{alias}` sentinel
    * matching and the least()/NullType paths (ADVICE r15 medium + low):
    * with a single un-aliased aggregate Spark names pivot columns by
    * the pivot value alone, and grouping columns lead the output, so
    * the cell columns are derived positionally, never by name.
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
    val w = org.apache.spark.sql.expressions.Window
    val aug0 =
      if (sorted) f.df.withColumn(GPOS, F.row_number().over(
        w.partitionBy(labels.map(f.df(_)): _*).orderBy(f.orderCols: _*)))
      else f.df
    val repCol =
      if (sorted) g.repWindowCol(aug0)
      else F.min(aug0(ORD)).over(w.partitionBy(labels.map(aug0(_)): _*))
    val aug = aug0.withColumn(REP, repCol)
    val cellOrd = if (sorted) aug(GPOS) else aug(ORD)
    val grouped = aug.groupBy((labels :+ REP).map(aug(_)): _*)
    val pv0 =
      if (knownValues.nonEmpty) grouped.pivot(column, knownValues)
      else grouped.pivot(column)
    val pv = pv0.agg(cellAgg(aug, cellOrd))
    // grouping columns (labels, REP) lead the pivot output; the cells
    // follow in pivot-value order — positional, no name convention.
    val cellNames = pv.columns.drop(labels.size + 1).toSeq
    assert(knownValues.isEmpty || cellNames == knownValues,
      s"pivot cell naming drifted: got $cellNames for values $knownValues")
    val withOrd =
      if (sorted) g.rankRep(pv) // reads/ranks REP, drops it, appends ORD
      else pv.withColumn(ORD, pv(REP)).drop(REP)
    // columns now: labels, cells…, ORD — rename cells positionally (a
    // pivot value may collide with a label name; toDF is duplicate-safe)
    val outNames = labels ++ cellNames.map(prefix + _) :+ ORD
    TadaFrame(withOrd.toDF(outNames: _*), labels = labels, name = f.name,
      order = Nil, bands = f.bands)
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
