package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.{functions => F}

/** Interval/range joins: match fact rows to [lo, hi) bands.
  *
  * Two physical shapes, picked by the caller:
  *
  *  - `broadcastRange`: bands are small (a dim of band definitions) —
  *    broadcast them and let the range predicate evaluate inside a
  *    BroadcastNestedLoopJoin. Cost O(rows × bands) with zero shuffles;
  *    the right call whenever bands fit in one broadcast (the common
  *    case: pricing tiers, SLA buckets, histogram edges).
  *
  *  - `binnedRange`: both sides big. Overlay a uniform grid of width
  *    `step`; each band row replicates to every grid cell it overlaps
  *    (explode of a sequence — bounded by ceil(span/step) per band),
  *    facts map to exactly one cell, and the join becomes a hash
  *    equi-join on the cell id with the residual range predicate applied
  *    after. This is the scale path: shuffle is hash(cell), no
  *    nested-loop, and AQE can split skewed cells.
  */
object RangeJoin {

  /** Broadcast the (small) bands side; facts never shuffle. */
  def broadcastRange(facts: DataFrame, bands: DataFrame, value: String,
                     lo: String, hi: String): DataFrame =
    facts.join(F.broadcast(bands),
      facts(value) >= bands(lo) && facts(value) < bands(hi), "left")

  /** Grid-binned equi-join for big×big range joins. `step` must be > 0;
    * recall is exact (the residual predicate re-checks the range). */
  def binnedRange(facts: DataFrame, bands: DataFrame, value: String,
                  lo: String, hi: String, step: Double): DataFrame = {
    val cell = (c: Column) => F.floor(c / step)
    val bandCells = bands.withColumn("__cell",
      F.explode(F.sequence(cell(F.col(lo)), cell(F.col(hi) - F.lit(1e-9)))))
    facts.withColumn("__cell", cell(F.col(value)))
      .join(bandCells, Seq("__cell"))
      .filter(F.col(value) >= F.col(lo) && F.col(value) < F.col(hi))
      .drop("__cell")
  }
}
