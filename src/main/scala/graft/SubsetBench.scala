package graft

import org.apache.spark.sql.SparkSession

/** Same-window cross-BINARY subset bench (r22, r21 verdict item 1):
  * times a named list of registered queries with Bench's exact force
  * method and session config, bracketing every rep with the fixed
  * host-speed canary — so two checkouts (e.g. the r20 baseline worktree
  * and HEAD) can be alternated A/B/B/A in one wall-clock window and
  * their numbers compared canary-normalized. One line per timing:
  *
  *   SUBSET <name> rep<k> sec=<s> canary=<s>
  *
  * Usage: `runMain graft.SubsetBench [sfDir] reps=<n> <query-prefix>...`
  * Defaults: $SPARK_GRAFT_SF_DIR or sf0.1, reps=3. This file is
  * measurement tooling only — it is also dropped verbatim into the
  * baseline worktree, so it must not reference symbols newer than the
  * baseline (SparkEntry.queries, CacheRegistry, Tables only).
  */
object SubsetBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.find(_.startsWith("/"))
      .getOrElse(sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val reps = args.find(_.startsWith("reps=")).map(_.drop(5).toInt).getOrElse(3)
    val prefixes = args.filterNot(a => a.startsWith("/") || a.startsWith("reps=")).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

    // page-cache warm for the tables the subset reads (cheap: subset
    // runs are small; mirrors Bench's warmup discipline)
    Tables.names.foreach { t =>
      try {
        val df = spark.read.parquet(s"$sfDir/$t.parquet")
        df.selectExpr(df.columns.toIndexedSeq
          .map(c => s"max(length(cast(`$c` as string)))"): _*).collect()
      } catch { case _: Throwable => () }
    }

    def canary(): Double = {
      val t0 = System.nanoTime()
      spark.range(50000000L)
        .selectExpr("sum(cast(xxhash64(id) as decimal(38,0)))").collect()
      (System.nanoTime() - t0) / 1e9
    }

    val all = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter(kv => prefixes.isEmpty || prefixes.exists(kv._1.startsWith))
    // one untimed warm pass (JIT + codegen), matching Bench's warm tier
    all.foreach { case (_, fn) =>
      try fn(spark, sfDir).queryExecution.toRdd.foreach(_ => ())
      catch { case _: Throwable => () }
      graft.core.CacheRegistry.releaseAll(); spark.catalog.clearCache()
    }
    (1 to reps).foreach { rep =>
      all.foreach { case (name, fn) =>
        val c = canary()
        val t0 = System.nanoTime()
        fn(spark, sfDir).queryExecution.toRdd.foreach(_ => ())
        val dt = (System.nanoTime() - t0) / 1e9
        graft.core.CacheRegistry.releaseAll(); spark.catalog.clearCache()
        println(f"SUBSET $name rep$rep sec=$dt%.3f canary=$c%.3f")
      }
    }
    println("SUBSET done")
    spark.stop()
  }
}
