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
    * ONE aggregation, group ordinal = `least()` over per-cell rep
    * partials (r15 fold): the same `groupBy().pivot().agg()` pass
    * produces the cells and a per-cell group-rep partial, so the plan
    * keeps MAP-SIDE partial aggregation and exchanges ~#groups×#cells
    * partial rows, never the data (the r16 window-rep variant was
    * measured 1.6–4× on low-cardinality labels: a window needs the raw
    * rows exchanged first, killing the partials).
    *
    * Exactness over ALL rows (ADVICE r15 high): every pivot aggregate
    * is cell-filtered, so a row whose pivot value is null or outside
    * `knownValues` would contribute to no rep partial — group order
    * would diverge from the reference's first-appearance-over-ALL-rows
    * contract (internal.go:1399-1424), and an all-excluded group would
    * get a null ordinal. So every row is GIVEN a cell: with
    * `knownValues`, excluded and null pivot values are remapped onto a
    * SENTINEL cell that participates in the `least()` and is dropped
    * from the output; in auto-discovery mode the value list (collected
    * here, exactly as Spark's own discovery would) includes null, so
    * all rows are covered already. Values are always passed explicitly
    * and the output columns derived POSITIONALLY from them — no
    * dependence on Spark's '{value}_{alias}' naming (ADVICE r15 low),
    * and an empty value domain short-circuits to the empty frame
    * instead of ranking a NullType rep (ADVICE r15 medium).
    *
    * `cellAgg(aug, cellOrd)` builds the per-cell aggregate; `cellOrd`
    * ranks the cell's rows in frame order (in-group position for sorted
    * frames, ingest ordinal otherwise) for first-in-frame-order cells. */
  private val SENT = "__pv_other"
  // aggregate aliases — cosmetic only: the output layout is positional
  private val PC = "__pvc"
  private val PR = "__pvr"

  private def pivotCore(f: TadaFrame, labels: Seq[String], column: String,
                        knownValues: Seq[String], prefix: String)(
      cellAgg: (DataFrame, Column) => Column): TadaFrame = {
    import TadaGrouped.{GPOS, REP}
    require(labels.nonEmpty,
      "pivot requires at least one label column to group rows by " +
        "(ADVICE r14: an empty label set previously threw from reduce())")
    require(!knownValues.contains(SENT),
      s"pivot value '$SENT' collides with the internal sentinel cell")
    val sorted = f.order.nonEmpty
    val g = TadaGrouped(f, labels, aligned = false)
    val aug =
      if (sorted) f.df.withColumn(GPOS, F.row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(labels.map(f.df(_)): _*).orderBy(f.orderCols: _*)))
      else f.df
    val cellOrd = if (sorted) aug(GPOS) else aug(ORD)
    val repA = if (sorted) g.cellRepAgg(aug) else F.min(aug(ORD))
    // explicit value list: caller's (+ sentinel), or our own discovery —
    // the same distinct+sort (nulls first) collect Spark's auto pivot
    // runs internally, so auto mode costs no extra job
    val (vals: Seq[Any], pivotCol: Column) =
      if (knownValues.nonEmpty)
        ((knownValues :+ SENT).toSeq,
          F.when(aug(column).isin(knownValues.map(v => v: Any): _*), aug(column))
            .otherwise(F.lit(SENT)))
      else {
        val maxVals = 10000
        val got = f.df.select(column).distinct().limit(maxVals + 1)
          .sort(column).collect().map(_.get(0)).toSeq
        require(got.size <= maxVals,
          s"pivot column '$column' exceeds $maxVals distinct values")
        (got, aug(column))
      }
    if (vals.isEmpty) {
      // empty domain ⇒ zero rows ⇒ zero groups: the empty frame, typed
      val empty = f.df.select(labels.map(f.df(_)): _*)
        .withColumn(ORD, F.lit(null).cast(org.apache.spark.sql.types.LongType))
        .limit(0)
      return TadaFrame(empty, labels = labels, name = f.name,
        order = Nil, bands = f.bands)
    }
    val grouped = aug.groupBy(labels.map(aug(_)): _*)
    val pv = grouped.pivot(pivotCol, vals)
      .agg(cellAgg(aug, cellOrd).as(PC), repA.as(PR))
    // positional layout: labels, then (cell, rep) PAIRS in `vals` order
    val body = pv.columns.drop(labels.size).toSeq
    assert(body.size == 2 * vals.size,
      s"pivot output drifted: ${body.size} columns for ${vals.size} values")
    val repCols = vals.indices.map(i => body(2 * i + 1))
    val repExpr =
      if (repCols.size == 1) pv(repCols.head)
      else F.least(repCols.map(pv(_)): _*)
    val withOrd =
      if (sorted) g.rankRep(pv.withColumn(REP, repExpr).drop(repCols: _*))
      else pv.withColumn(ORD, repExpr).drop(repCols: _*)
    // columns are now positionally labels, cells…, ORD — rename through
    // unambiguous temporaries, drop the sentinel cell (knownValues
    // mode), then apply the final names (a pivot value may collide with
    // a label name; positional toDF is duplicate-safe throughout)
    val tmpNames = labels ++ vals.indices.map(i => s"__pvcell_$i") :+ ORD
    val named = withOrd.toDF(tmpNames: _*)
    val dropped =
      if (knownValues.nonEmpty) named.drop(s"__pvcell_${vals.size - 1}")
      else named
    val keptVals = if (knownValues.nonEmpty) vals.dropRight(1) else vals
    val outNames = labels ++ keptVals.map(v => prefix + String.valueOf(v)) :+ ORD
    TadaFrame(dropped.toDF(outNames: _*), labels = labels, name = f.name,
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
