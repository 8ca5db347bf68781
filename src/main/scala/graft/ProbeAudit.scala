package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical._

/** Probe-action audit (r11 verdict task 1): classifies every registered
  * query by whether a `count()` probe action measures its real work.
  *
  * The hazard, proven in r11 on q94: `count()` lets Catalyst prune
  * everything that cannot change cardinality — projections (ALL per-row
  * compute), global sorts, and left joins against unique-keyed builds
  * are eliminated outright, so a "100× exponent" recorded through
  * count() on such a query is the exponent of a parquet ROW COUNT.
  *
  * SCOPE since r17: `Bench` no longer uses count() — it executes each
  * query's OWN physical plan (`queryExecution.toRdd.foreach`), which
  * admits no logical rewrite, so the headline bench times ALL listed
  * queries honestly regardless of this audit. The audit remains the
  * hygiene gate for ad-hoc probes (ScaleProbe/DocProbe legs run
  * without GRAFT_PROBE_FORCE=1 still probe through count()).
  *
  * Mechanics: build each query, wrap it in a global count aggregate,
  * and inspect the OPTIMIZED logical plan — after the pruning rules
  * have run, so whatever work-bearing nodes remain are the ones the
  * count action actually executes. A query whose counted plan retains
  * no filter/join/grouped-aggregate/window/generate/distinct/limit is
  * `PRUNED-UNDER-COUNT`: its recorded count-era exponents are invalid
  * and it must be probed with the forced checksum action
  * (`GRAFT_PROBE_FORCE=1`). Everything else reports the surviving node
  * kinds, i.e. WHY count still measures it.
  *
  * Usage: `runMain graft.ProbeAudit [sfDir]` (defaults to sf0.001 —
  * plan shape is scale-independent).
  */
object ProbeAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val pruned = scala.collection.mutable.ArrayBuffer.empty[String]
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val counted = fn(spark, sfDir).groupBy().count()
        val plan = counted.queryExecution.optimizedPlan
        val working = plan.collect {
          case j: Join => j.joinType.toString + "Join"
          case _: Filter => "Filter"
          case a: Aggregate if a.groupingExpressions.nonEmpty => "GroupedAggregate"
          case _: Window => "Window"
          case _: Generate => "Generate"
          case _: Deduplicate => "Deduplicate"
          case _: Distinct => "Distinct"
          case _: GlobalLimit => "Limit"
          case _: Intersect | _: Except => "SetOp"
          case _: RepartitionOperation => "Repartition"
        }.distinct
        val verdict =
          if (working.isEmpty) { pruned += name; "PRUNED-UNDER-COUNT" }
          else s"count-ok: ${working.mkString(",")}"
        println(f"$name%-34s $verdict")
      } catch {
        case e: Throwable =>
          println(f"$name%-34s audit-failed: ${String.valueOf(e.getMessage).take(100)}")
      }
    }
    println(s"\n== ${pruned.size} PRUNED-UNDER-COUNT (need GRAFT_PROBE_FORCE=1): " +
      pruned.mkString(","))
    println("== Bench itself is unaffected since r17: it forces each query's " +
      "own physical plan (toRdd), which count()-pruning cannot touch")
    spark.stop()
  }
}
