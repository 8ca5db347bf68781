package graft

import scala.collection.concurrent.TrieMap
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Per-query JOB breakdown probe (r21 optimization round): where do a
  * query's seconds actually go? Splits each rep into CONSTRUCTION
  * (driver work + any jobs run while building the DataFrame — bounds
  * estimates, memoized counts, eager CC iterations) and FORCE (the
  * `queryExecution.toRdd` execution Bench times), and lists every
  * Spark job in the rep with its wall duration and call-site — so a
  * 4 s query shows whether it is 15 sequential 0.25 s jobs (fixed
  * per-job overhead to cut) or one 3.5 s shuffle (bytes to cut).
  *
  * Usage: `runMain graft.JobProbe [sfDir] reps=<n> <name-prefix>...`
  * Defaults: sf0.1, reps=2, the heavy tail. Rep 1 carries cold
  * memoized-bounds jobs + codegen; rep 2+ is Bench's warm steady
  * state. Same session hygiene as Bench (releaseAll + clearCache
  * between reps) so per-rep numbers match bench methodology.
  */
object JobProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.find(_.startsWith("/")).getOrElse("/root/testdata/sf0.1")
    val reps = args.find(_.startsWith("reps=")).map(_.drop(5).toInt).getOrElse(2)
    // conf:k=v args let a probe flip operator knobs (r22: the
    // rollingDuration single-scan A/B) without a code edit per leg
    val confs = args.filter(_.startsWith("conf:")).map { a =>
      val kv = a.drop(5).split("=", 2); (kv(0), kv(1))
    }.toSeq
    val prefixes = args.filterNot(a => a.startsWith("/") || a.startsWith("reps=") ||
      a.startsWith("conf:")).toSeq
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    confs.foreach { case (k, v) => spark.conf.set(k, v) }

    val jobStart = TrieMap.empty[Int, (Long, String)]
    val jobs = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Double, String)]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        val site = Option(e.properties)
          .flatMap(p => Option(p.getProperty("callSite.short"))).getOrElse("?")
        jobStart(e.jobId) = (System.nanoTime(), site)
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit =
        jobStart.remove(e.jobId).foreach { case (t0, site) =>
          jobs.add((e.jobId, (System.nanoTime() - t0) / 1e9, site))
        }
    })

    val all = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter(kv => prefixes.isEmpty || prefixes.exists(kv._1.startsWith))
    all.foreach { case (name, fn) =>
      (1 to reps).foreach { rep =>
        jobs.clear()
        val t0 = System.nanoTime()
        val df = fn(spark, sfDir)
        val tBuild = (System.nanoTime() - t0) / 1e9
        val buildJobs = {
          Thread.sleep(300) // listener bus drain (private API in 4.x)
          import scala.jdk.CollectionConverters._
          jobs.asScala.toVector
        }
        val t1 = System.nanoTime()
        df.queryExecution.toRdd.foreach(_ => ())
        val tForce = (System.nanoTime() - t1) / 1e9
        Thread.sleep(300)
        import scala.jdk.CollectionConverters._
        val allJobs = jobs.asScala.toVector
        val forceJobs = allJobs.drop(buildJobs.size)
        def fmt(js: Vector[(Int, Double, String)]): String =
          js.sortBy(-_._2).take(8)
            .map { case (id, s, site) => f"j$id=$s%.2fs[$site]" }.mkString(" ")
        println(f"$name rep$rep build=$tBuild%.2fs (${buildJobs.size} jobs) " +
          f"force=$tForce%.2fs (${forceJobs.size} jobs) total=${tBuild + tForce}%.2fs")
        println(s"  build: ${fmt(buildJobs)}")
        println(s"  force: ${fmt(forceJobs)}")
        graft.core.CacheRegistry.releaseAll()
        spark.catalog.clearCache()
      }
    }
    spark.stop()
  }
}
