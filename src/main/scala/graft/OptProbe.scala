package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Interleaved same-window A/B probe for r21 optimization candidates.
  * Each leg builds a BEFORE and an AFTER formulation of the same
  * computation, asserts their results are identical (sorted-collect
  * checksum — legs keep outputs small), then times both with Bench's
  * force method in alternating order (A/B/B/A per rep pair) so host
  * drift hits both arms equally. External-cpu cores during each timing
  * ride along, AbProbe-style, so a storm-contaminated rep is visible.
  *
  * Usage: `runMain graft.OptProbe [sfDir] reps=<n> <leg>...`
  */
object OptProbe {
  private def cpuBusyProc(): (Long, Long, Long) = {
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

  private def ext(a: (Long, Long, Long), b: (Long, Long, Long)): Double = {
    val wall = (b._3 - a._3) / 1e9
    if (a._1 < 0 || wall <= 0.01) return 0.0
    math.max(0.0, ((b._1 - a._1) / 100.0 - (b._2 - a._2) / 1e9) / wall)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.find(_.startsWith("/")).getOrElse("/root/testdata/sf0.1")
    val reps = args.find(_.startsWith("reps=")).map(_.drop(5).toInt).getOrElse(4)
    val legs = args.filterNot(a => a.startsWith("/") || a.startsWith("reps=")).toSeq
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    import graft.pipeline.Dedup

    def q88Shaped(s: SparkSession, persistFresh: Boolean): DataFrame = {
      import org.apache.spark.sql.functions.col
      val d = Tables.documents(s, sfDir)
      val ixDocs = d.filter(col("doc_id") % 2 === 0)
      val batchDocs = d.filter(col("doc_id") % 2 === 1)
      val index = Dedup.chunkHashIndex(ixDocs, "text", "source", size = 3).persist()
      val oldMatrix = Dedup.sourceChunkOverlapFromIndex(index)
      Dedup.sourceChunkOverlapIncremental(index, oldMatrix, batchDocs,
          "text", "source", size = 3, persistFresh = persistFresh)
        .orderBy("source_a", "source_b")
    }

    // leg name -> (beforeBuilder, afterBuilder)
    val all: Map[String, (SparkSession => DataFrame, SparkSession => DataFrame)] = Map(
      // winnow-overlap: re-extract features per consumer (before) vs
      // persist the capped (id, fp) scalar frame once (after)
      "winnowPersist" -> (
        (s: SparkSession) => Dedup.winnowOverlapPairs(
          Tables.documents(s, sfDir), "doc_id", "text",
          k = 3, w = 4, tau = 0.5, maxDf = 1000, persistFps = false)
          .orderBy("id_small", "id_big"),
        (s: SparkSession) => Dedup.winnowOverlapPairs(
          Tables.documents(s, sfDir), "doc_id", "text",
          k = 3, w = 4, tau = 0.5, maxDf = 1000, persistFps = true)
          .orderBy("id_small", "id_big")),
      // gram-containment pairs: same toggle on the gram features
      "gramPersist" -> (
        (s: SparkSession) => Dedup.containmentPairs(
          Tables.documents(s, sfDir), "doc_id", "text",
          k = 3, tau = 0.8, maxDf = 1000, persistGrams = false)
          .orderBy("id_small", "id_big"),
        (s: SparkSession) => Dedup.containmentPairs(
          Tables.documents(s, sfDir), "doc_id", "text",
          k = 3, tau = 0.8, maxDf = 1000, persistGrams = true)
          .orderBy("id_small", "id_big")),
      // r22: fused single-aggregation Lloyd re-average vs the r13–r21
      // two-shuffle form, driven through the full q56 IVF computation
      "ivfFuse" -> (
        (s: SparkSession) => {
          val e = Tables.embeddings(s, sfDir)
          graft.pipeline.Similarity.ivfTopKWithTrainer(e,
            e.filter(org.apache.spark.sql.functions.col("vec_id") < 10),
            5, nlist = 16, nprobe = 4,
            trainer = graft.pipeline.Similarity.trainCentroidsTwoStep)
            .select("query_id", "neighbor_id", "rank")
            .orderBy("query_id", "rank")
        },
        (s: SparkSession) => {
          val e = Tables.embeddings(s, sfDir)
          graft.pipeline.Similarity.ivfTopK(e,
            e.filter(org.apache.spark.sql.functions.col("vec_id") < 10),
            5, nlist = 16, nprobe = 4)
            .select("query_id", "neighbor_id", "rank")
            .orderBy("query_id", "rank")
        }),
      // r22: q113 rolling-duration — two-FileScan union tag fan-out vs
      // the single-scan explode (conf-toggled inside the operator)
      "rdSingleScan" -> (
        (s: SparkSession) => {
          s.conf.set("graft.rollingDuration.singleScan", "false")
          graft.queries.Registry.all
            .find(_.name == "q113_rolling_duration_frame").get.build(s, sfDir)
        },
        (s: SparkSession) => {
          s.conf.set("graft.rollingDuration.singleScan", "true")
          graft.queries.Registry.all
            .find(_.name == "q113_rolling_duration_frame").get.build(s, sfDir)
        }),
      // r22: q88 — recompute the batch's fresh-membership frame per
      // consumer vs persist it once (r21 verdict item 4)
      "q88Fresh" -> (
        (s: SparkSession) => q88Shaped(s, persistFresh = false),
        (s: SparkSession) => q88Shaped(s, persistFresh = true)))

    def force(df: DataFrame): Double = {
      val t0 = System.nanoTime()
      df.queryExecution.toRdd.foreach(_ => ())
      (System.nanoTime() - t0) / 1e9
    }
    def cleanup(): Unit = {
      graft.core.CacheRegistry.releaseAll(); spark.catalog.clearCache()
    }

    all.filter { case (n, _) => legs.isEmpty || legs.contains(n) }
      .foreach { case (name, (mkA, mkB)) =>
        // result identity first (both tiny pair sets)
        val ra = mkA(spark).collect().map(_.toString).sorted.toSeq
        cleanup()
        val rb = mkB(spark).collect().map(_.toString).sorted.toSeq
        cleanup()
        println(s"$name identical=${ra == rb} rows=${ra.size}")
        // fail loudly on mismatch (ADVICE r21 low): a non-equivalent
        // candidate must not get an authoritative-looking speedup line
        if (ra != rb) {
          System.err.println(s"$name MISMATCH: A=${ra.size} rows, B=${rb.size} rows — skipping timings")
          spark.stop()
          sys.exit(1)
        }
        (1 to reps).foreach { rep =>
          val order = if (rep % 2 == 1) Seq("A" -> mkA, "B" -> mkB)
                      else Seq("B" -> mkB, "A" -> mkA)
          order.foreach { case (tag, mk) =>
            val s0 = cpuBusyProc()
            val dt = force(mk(spark))
            val s1 = cpuBusyProc()
            cleanup()
            println(f"$name rep$rep $tag=$dt%.2fs ext=${ext(s0, s1)}%.1f")
          }
        }
      }
    spark.stop()
  }
}
