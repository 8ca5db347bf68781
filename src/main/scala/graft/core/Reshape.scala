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
  /** Deterministic result order for the groupBy-pivot shapes: each
    * group's first appearance in FRAME order, from the grouped ordinal
    * machinery (TadaGrouped.reduceWith with no aggregates — sorted
    * frames rank through the partition-local rep path), joined back
    * null-safely on the label key. The r14 differential fuzz caught the
    * previous `TadaFrame.ingest(renamed)`: the pivoted frame took
    * Spark's partition order, so a later STABLE sort's ties diverged
    * from the reference's physical-order contract (fuzz seed 511). */
  private def withGroupOrdinals(f: TadaFrame, labels: Seq[String],
                                pivoted: DataFrame): TadaFrame = {
    import TadaFrame.ORD
    val ords0 = TadaGrouped(f, labels, aligned = false).reduceWith(Nil).df
    val ords = ords0.select(
      labels.map(l => ords0(l).as(s"__po_$l")) :+ ords0(ORD).as(ORD): _*)
    val cond = labels.map(l => pivoted(l) <=> ords(s"__po_$l")).reduce(_ && _)
    val res = pivoted.join(ords, cond).drop(labels.map(l => s"__po_$l"): _*)
    TadaFrame(res, labels = labels, name = f.name, order = Nil, bands = f.bands)
  }

  def pivotTable(f: TadaFrame, labels: Seq[String], column: String,
                 agg: Column, knownValues: Seq[String] = Nil,
                 prefix: String = ""): TadaFrame = {
    val grouped0 = f.df.groupBy(labels.map(f.df(_)): _*)
    val pivoted0 =
      if (knownValues.nonEmpty) grouped0.pivot(column, knownValues)
      else grouped0.pivot(column)
    val pivoted = pivoted0.agg(agg)
    val renamed = pivoted.columns.foldLeft(pivoted) { (d, c) =>
      if (labels.contains(c)) d else d.withColumnRenamed(c, s"$prefix$c")
    }
    withGroupOrdinals(f, labels, renamed)
  }

  /** PromoteToColLevel (dataframe.go:1265-1373): spread `column`'s unique
    * values into a column level; each (residual labels, promoted value)
    * cell takes the FIRST value in frame order (reference keeps first,
    * internal.go:1435-1483) — min_by on the ordinal, not Spark's
    * nondeterministic first(). */
  def promoteToColLevel(f: TadaFrame, labels: Seq[String], column: String,
                        value: String, knownValues: Seq[String],
                        prefix: String = ""): TadaFrame = {
    // rank rows inside each (residual, promoted) cell by the FRAME order
    // (sort spec, not ingest ordinal) — min_by on that rank is "first"
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy((labels :+ column).map(f.df(_)): _*)
      .orderBy(f.orderCols: _*)
    val aug = f.df.withColumn("__fo", F.row_number().over(w))
    val grouped = aug.groupBy(labels.map(aug(_)): _*)
      .pivot(column, knownValues)
      .agg(F.min_by(aug(value), aug("__fo")))
    val renamed = grouped.columns.foldLeft(grouped) { (d, c) =>
      if (labels.contains(c)) d else d.withColumnRenamed(c, s"$prefix$c")
    }
    withGroupOrdinals(f, labels, renamed)
  }

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
