package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
import java.util.concurrent.Executors
import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration._

/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare.
  *
  * Queries run 4-way concurrent (Spark's scheduler interleaves their
  * jobs across the local[32] pool) with a per-query timeout enforced via
  * job-group cancellation, so one pathological query can neither
  * serialize nor hang the whole round.
  */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // optional 3rd arg: comma-separated name prefixes — subset runs for
    // local iteration; the driver always passes exactly two args
    val only: String => Boolean =
      if (args.length > 2) { val ps = args(2).split(","); n => ps.exists(n.startsWith) }
      else _ => true
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()

    val pool = Executors.newFixedThreadPool(4)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    val work = SparkEntry.queries.toSeq.sortBy(_._1).filter(kv => only(kv._1))
    // Per-query dispatch-form tags at THIS SF (r20, r19 verdict item 4):
    // the cardinality-gated dispatchers decide at CONSTRUCTION time, so
    // a global drain around fn() attributes correctly — but only if
    // constructions never interleave. buildLock serializes construction
    // (cheap: memoized bounds jobs); execution stays 4-way concurrent.
    // Shipped as dispatch.json next to oracle_sql.json so a dispatch
    // flip at oracle scale is an artifact diff, not a bench spelunk.
    val dispatchByQuery = scala.collection.concurrent.TrieMap.empty[String, String]
    val buildLock = new Object
    val futures = work.map { case (name, fn) =>
      name -> Future {
        spark.sparkContext.setJobGroup(name, name, interruptOnCancel = true)
        try {
          val df = buildLock.synchronized {
            graft.core.Dispatch.drain()
            val d = fn(spark, sfDir)
            val forms = graft.core.Dispatch.drain()
            if (forms.nonEmpty) dispatchByQuery(name) = Bench.dispatchJson(forms)
            d
          }
          // repartition(1), NOT coalesce(1): coalesce narrows the WHOLE
          // upstream pipeline to one task; repartition shuffles only the
          // (small) final result into a single output file
          df.repartition(1).write.mode("overwrite").parquet(s"$outDir/$name")
        } finally spark.sparkContext.clearJobGroup()
      }
    }
    futures.foreach { case (name, f) =>
      try Await.result(f, 15.minutes)
      catch {
        case _: java.util.concurrent.TimeoutException =>
          spark.sparkContext.cancelJobGroup(name)
          System.err.println(s"[verify] $name timed out after 15m — cancelled")
        case e: Throwable =>
          System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    pool.shutdown()

    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // ADVICE r20 (low): dispatch attribution assumes every Dispatch.note
    // fires during CONSTRUCTION under buildLock. A note emitted at
    // EXECUTION time (a future op deciding lazily, a re-entered builder
    // inside an action) would have been silently credited to whichever
    // query held buildLock. Drain once more after all executions: any
    // residue means the attribution model broke — flag it loudly in the
    // artifact instead of corrupting dispatch.json.
    val strays = graft.core.Dispatch.drain()
    if (strays.nonEmpty) {
      System.err.println(s"[verify] ${strays.size} execution-time dispatch " +
        s"notes drained AFTER the build phase — per-query attribution is " +
        s"suspect: ${strays.mkString(", ")}")
      dispatchByQuery("__execution_time_strays__") = Bench.dispatchJson(strays)
    }
    // values are Bench.dispatchJson object fragments — embedded verbatim
    val dj = dispatchByQuery.toSeq.sortBy(_._1)
      .map { case (k, v) => s"${q(k)}: $v" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/dispatch.json"), dj)
    spark.stop()
  }
}
