package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.{functions => F}

/** Temporal operators beyond the reference's surface: as-of joins and
  * gap-based sessionization — the two time-series primitives a
  * training-data/event pipeline needs that plain equi-joins can't say.
  *
  * Both compile to ONE hash shuffle on the key column and are then
  * embarrassingly parallel per key — the shape that survives a
  * 1000-executor scale-up (no broadcast of the big side, no range
  * cross-product, no driver involvement).
  */
object Temporal {

  /** As-of join: for each left row, the single right row with the
    * greatest `rightTs <= leftTs` within the same `keys` (the classic
    * trades-vs-quotes / click-vs-view alignment).
    *
    * Implementation is the union-scan trick, not a range join: tag both
    * sides, sort (ts, tag) within key — right rows at an equal timestamp
    * sort BEFORE left rows, matching DuckDB/kdb "most recent at or
    * before" semantics — and carry the last non-null right payload
    * forward with one running window. Cost: one shuffle of (keys) over
    * rows_l + rows_r; no per-row binary search, no interval explosion.
    * Scale note: a window over (key) never sees more than one key's
    * rows; skewed keys split fine under AQE because the window frame is
    * running (rowsBetween unbounded→current), which Spark evaluates
    * streaming per partition, O(1) memory.
    *
    * @param left      big (probe) side
    * @param right     side providing the looked-up payload
    * @param keys      equi-join key columns (same names both sides)
    * @param leftTs    event-time column name on `left`
    * @param rightTs   event-time column name on `right`
    * @param rightCols right payload columns to carry (null if no match)
    * @param inner     drop left rows with no as-of match (default keeps)
    */
  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTs: String, rightTs: String,
               rightCols: Seq[String], inner: Boolean = false): DataFrame = {
    val TS = "__asof_ts"; val TAG = "__asof_tag"; val M = "__asof_m"
    val lCols = left.columns.toSeq
    // a constant match marker rides with the payload: "has a match" must
    // be judged by it, never by payload nullness — a matched row whose
    // carried value is legitimately null is still matched
    val carried = rightCols.map(c => s"__r_$c") :+ M
    val rSel = right.select(
      (keys.map(F.col) :+ F.col(rightTs).as(TS) :+ F.lit(0).as(TAG)) ++
        rightCols.zip(carried).map { case (c, a) => F.col(c).as(a) } :+
        F.lit(1).as(M): _*)
    val lSel = left.select(
      (lCols.map(F.col) :+ F.col(leftTs).as(TS) :+ F.lit(1).as(TAG)) ++
        carried.map(a => F.lit(null).as(a)): _*)
    // unionByName aligns the two shapes; missing left columns on the
    // right side ride as nulls (allowMissingColumns)
    val u = rSel.unionByName(lSel, allowMissingColumns = true)
    val w = Window.partitionBy(keys.map(F.col): _*)
      .orderBy(F.col(TS).asc, F.col(TAG).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = carried.foldLeft(u) { (df, a) =>
      df.withColumn(a, F.last(a, ignoreNulls = true).over(w))
    }
    val matchedOnly =
      if (inner) filled.filter(F.col(TAG) === 1 && F.col(M) === 1)
      else filled.filter(F.col(TAG) === 1)
    matchedOnly.select(lCols.map(F.col) ++
      rightCols.zip(carried).map { case (c, a) => F.col(a).as(s"asof_$c") }: _*)
  }

  /** Gap-based sessionization: rows of one key whose successive
    * event-time gaps stay <= `gap` share a session; a larger gap starts
    * the next one. Emits the input plus `session` (1-based per key, in
    * time order) — the batch twin of the streaming sessionizer
    * (graft.streaming.Streams).
    *
    * One shuffle (key), two stacked running windows (lag + cumulative
    * sum of break flags) that share the same sort — Spark evaluates both
    * in a single WindowExec pass per key partition.
    *
    * @param tieBreak extra sort columns disambiguating equal timestamps
    *                 (pass the event id for a total, engine-portable order)
    */
  def sessionize(df: DataFrame, keys: Seq[String], ts: String, gap: Column,
                 tieBreak: Seq[String] = Nil): DataFrame = {
    val ord = (F.col(ts).asc +: tieBreak.map(F.col(_).asc))
    val w = Window.partitionBy(keys.map(F.col): _*).orderBy(ord: _*)
    val prev = F.lag(F.col(ts), 1).over(w)
    val tsDt = df.schema(ts).dataType
    val brk = F.when(prev.isNull, 1)
      .when(Prefix.tsMicros(F.col(ts), tsDt) - Prefix.tsMicros(prev, tsDt) > gap, 1)
      .otherwise(0)
    df.withColumn("__brk", brk)
      .withColumn("session", F.sum("__brk").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("__brk")
  }
}
