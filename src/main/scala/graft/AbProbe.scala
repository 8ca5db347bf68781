package graft

import org.apache.spark.sql.SparkSession

/** Interleaved A/B adjudication probe (r19 verdict lead item: q109's
  * 1.59× rise vs BENCH_r18 in a window with a FASTER canary). Times a
  * fixed list of SparkEntry queries with Bench's own force method
  * (`queryExecution.toRdd` — the query's OWN physical plan, nothing
  * collected), printing one line per timing with the external-cpu
  * cores competing during it, so two ALTERNATING binaries (run
  * A/B/A/B from the shell within one shared-host window) can be
  * compared rep-for-rep instead of across hour-apart round benches —
  * the drift this host shows (PERF.md: identical benches 673 s vs
  * 46 s) makes cross-round per-query ratios inadmissible on their own.
  *
  * Args: `tag=<label>` `reps=<n>` and any number of query-name
  * prefixes (default: the q107–q109 string-key prefix family).
  * Each JVM is a fresh session, so rep 1 carries the cold
  * BoundsCache jobs + codegen and rep 2+ is the warm steady state —
  * both matter for the adjudication (the suspect is a bounds JOB).
  */
object AbProbe {
  private def busyProc(): (Long, Long, Long) = {
    val busy =
      try {
        val p = scala.io.Source.fromFile("/proc/stat").getLines().next()
          .trim.split("\\s+").drop(1).map(_.toLong)
        p.indices.collect { case i if i != 3 && i != 4 => p(i) }.sum
      } catch { case _: Throwable => -1L }
    val proc =
      try java.lang.management.ManagementFactory.getOperatingSystemMXBean
        .asInstanceOf[com.sun.management.OperatingSystemMXBean].getProcessCpuTime
      catch { case _: Throwable => -1L }
    (busy, proc, System.nanoTime())
  }

  def main(args: Array[String]): Unit = {
    val tag = args.collectFirst { case a if a.startsWith("tag=") => a.drop(4) }.getOrElse("?")
    val reps = args.collectFirst { case a if a.startsWith("reps=") => a.drop(5).toInt }.getOrElse(2)
    val prefixes = args.filterNot(a => a.startsWith("tag=") || a.startsWith("reps="))
    val want: String => Boolean =
      if (prefixes.isEmpty) n => n.startsWith("q107") || n.startsWith("q108") || n.startsWith("q109")
      else n => prefixes.exists(n.startsWith)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // same JVM/codegen + page-cache warmup shape as Bench
    spark.range(1000).selectExpr("sum(id)").collect()
    val qs = SparkEntry.queries.toSeq.filter { case (n, _) => want(n) }.sortBy(_._1)
    qs.map(_._1).foreach { n => // touch the tables the queries read
      try SparkEntry.queries(n)(spark, sfDir).queryExecution.analyzed
      catch { case _: Throwable => () }
    }
    (1 to reps).foreach { rep =>
      qs.foreach { case (name, fn) =>
        val (b0, p0, t0) = busyProc()
        fn(spark, sfDir).queryExecution.toRdd.foreach(_ => ())
        val (b1, p1, t1) = busyProc()
        val dt = (t1 - t0) / 1e9
        val ext =
          if (b0 < 0 || p0 < 0) -1.0
          else math.max(0.0, ((b1 - b0) / 100.0 - (p1 - p0) / 1e9) / dt)
        println(f"[ab] tag=$tag rep=$rep $name dt=$dt%.3f ext=$ext%.2f")
      }
    }
    spark.stop()
  }
}
