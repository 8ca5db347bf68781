package graft.core

/** Session log of plan-form DISPATCH decisions (r19, r18 verdict item
  * 4): the cardinality-gated operators (rank/percentile: window vs
  * by-value vs chunked; grouped median: agg vs by-value; whole-frame
  * rollingDuration: window vs time-bucket; grouped rankRep: window vs
  * banded) pick their physical shape from memoized data statistics — a
  * silent flip (an HLL estimate drifting across [[Prefix.VocabCap]],
  * new driver data) would change plan shape invisibly between bench
  * rounds. Every dispatcher notes its choice here; `Bench` drains the
  * log around each query and ships per-query form tags in
  * BENCH_DETAIL's `dispatch` field, so a form change shows up as an
  * artifact diff, not a mystery timing move.
  *
  * Bounded (16 384 entries, oldest kept, newest dropped) so a fuzz
  * sweep or long notebook session that never drains cannot grow driver
  * memory; Bench drains per query, far below the cap.
  */
object Dispatch {
  private val cap = 16384
  private val log = new java.util.concurrent.LinkedBlockingQueue[(String, String)](cap)

  /** Record one decision: `op` and `form` are code-authored identifiers
    * (JSON-safe by construction — same contract as CacheRegistry tags). */
  private[graft] def note(op: String, form: String): Unit = {
    log.offer((op, form)); ()
  }

  /** Drain and return every note since the last drain, in order. */
  private[graft] def drain(): Seq[(String, String)] = {
    val out = new java.util.ArrayList[(String, String)]()
    log.drainTo(out)
    scala.jdk.CollectionConverters.ListHasAsScala(out).asScala.toSeq
  }
}
