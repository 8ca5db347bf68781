package graft.pipeline

/** Shuffle-width sizing for candidate-explosion stages (r8 verdict:
  * the Σ|cell|²/band-fanout estimates that already guard the designs
  * against quadratic blowup should also DRIVE the repartition width,
  * not just document it).
  *
  * Why machine width is not enough: explosion inputs are tiny scalar
  * (id, key) rows, so AQE sizes the stage by input BYTES and runs it a
  * few partitions wide — but each input row fans out to hundreds of
  * candidate rows, and the downstream distinct's partial hash maps then
  * hold estRows/width entries each. The 200k-vector probe measured
  * multi-GiB page-alloc spills at machine width (PERF.md r7). Bounding
  * rows-per-partition keeps partial aggregation in memory at ANY corpus
  * size — the difference between linear and spill-bound at 100×.
  */
object Explosion {

  /** Max candidate rows one partition's partial-aggregate hash map
    * should hold. ~4M (id_a, id_b) scalar rows is a few hundred MB of
    * open-hash map — comfortably inside a task's share of executor
    * memory at 32 tasks/128 GiB, with headroom for the 100 TB target's
    * typical 4-8 GiB-per-task configs. */
  val RowsPerPartition: Double = 4e6

  /** Upper clamp on derived width: past this, per-partition scheduling
    * and shuffle-file overheads dominate any spill savings. */
  val MaxWidth: Int = 4096

  /** Shuffle width for a stage expected to materialize `estRows` rows.
    * Unknown estimates (< 0) keep the machine width; known ones grow it
    * so each partition holds ≤ RowsPerPartition rows, clamped to
    * [machineWidth, MaxWidth]. Pure — spec-pinned in ScaleOpsSpec. */
  def width(estRows: Double, machineWidth: Int): Int =
    if (estRows < 0) machineWidth
    else math.min(MaxWidth,
      math.max(machineWidth, math.ceil(estRows / RowsPerPartition).toInt))

  /** One driver-side log line per sized stage, so probe/bench logs make
    * widths adjudicable (r8 verdict acceptance). */
  def logWidth(stage: String, estRows: Double, width: Int): Unit =
    println(f"[graft] $stage: explosion width=$width estRows=$estRows%.0f")
}
