package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.{functions => F}

/** Third-decade probe for the containment family (r13 verdict task 4):
  * q89 (containment pairs), q92 (incremental fold), q100 (winnow
  * fingerprint overlap) at ×300 / ×1000 over sf0.1 documents — the
  * VecProbe protocol (one timed leg per scale, forced checksum action,
  * df-watch printed per leg), with the budget arithmetic printed per
  * decade so the engaged branch (adaptive df cap lowering the effective
  * cap, vocabulary-broadcast gate) is named next to its timing.
  *
  * Copies shift doc_id by 5,000 (sf0.1 max doc_id < 5,000); the q92
  * batch twin shifts by 100,000,000 so arrival ids clear grown corpus
  * ids at every factor (the registered query's +1,000,000 offset would
  * collide past ×200, which is why ScaleProbe caps at 200 and this tool
  * exists). Copy growth multiplies every gram's df by the factor, so
  * the df ≤ 1000 stop-gram cap removes MORE of the vocabulary per
  * decade — the family's designed answer-density bound; at ×1000 every
  * base gram shared by ≥2 docs crosses the cap outright.
  *
  * Run like VecProbe: plain `java` with the Spark jar dir glob on the
  * classpath plus the add-opens flags from /tmp/opens.txt, main class
  * `graft.DocProbe`, args `[factor=300] [q89 q92 q100 qcap]`.
  */
object DocProbe {
  def main(args: Array[String]): Unit = {
    val base = "/root/testdata/sf0.1"
    val out = "/tmp/docprobe"
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("graft.containment.maxPairs", sys.env.getOrElse(
        "GRAFT_CONTAINMENT_MAX_PAIRS", "500000000"))
      // r17 two-level wave grid: probing a forced side-B split on the
      // REAL corpus needs the side-A cap movable (grid = w1 × w2 cells)
      .config("graft.containment.maxSideAWaves", sys.env.getOrElse(
        "GRAFT_MAX_SIDEA_WAVES", "1024"))
      // compressed parquet spill for over-budget wave survivors: the
      // block-manager default stores them uncompressed (the first ×1000
      // forced winnow run accumulated ~4× the columnar size)
      .config("graft.containment.waveDir", "/tmp/docprobe/waves")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val D = pipeline.Dedup

    val maxDoc = spark.read.parquet(s"$base/documents.parquet")
      .agg(F.max(F.col("doc_id").cast("long"))).head().getLong(0)
    require(maxDoc < 5000L, s"doc shift span assumes sf0.1 (max id $maxDoc)")

    def build(factor: Int): String = {
      val path = s"$out/docs_${factor}x.parquet"
      if (!new java.io.File(path).exists()) {
        val df = spark.read.parquet(s"$base/documents.parquet")
          .select(F.col("doc_id"), F.col("text"))
        (0 until factor).map(i => df.withColumn("doc_id", F.col("doc_id") + F.lit(i * 5000L)))
          .reduce(_ unionByName _)
          .repartition(32).write.mode("overwrite").parquet(path)
        println(s"[docprobe] built ${factor}x")
      }
      path
    }

    def dfFree(): String = {
      val f = new java.io.File("/tmp")
      f"${f.getUsableSpace / (1L << 30)}%d GiB free"
    }

    def time(tag: String, mk: => DataFrame): Unit =
      try {
        val t0 = System.nanoTime()
        val df = mk
        // checksum PRINTED (r16): the exactness-in-waves criterion is
        // that a forced-budget run reproduces the default-budget answer
        // bit-for-bit — rows + order-free hash make runs comparable
        val r = df.agg(F.count(F.lit(1)),
          F.sum(F.xxhash64(df.columns.map(F.col).toSeq: _*)
            .cast("decimal(38,0)"))).collect()(0)
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"[docprobe] $tag%-28s $dt%9.2f s   rows=${r.get(0)} sum=${r.get(1)}   ${dfFree()}")
      } catch {
        // a disk-fill or OOM on one leg is itself the probe datum
        case e: Throwable =>
          println(s"[docprobe] $tag FAILED: ${String.valueOf(e.getMessage).take(160)}  ${dfFree()}")
      } finally {
        graft.core.CacheRegistry.releaseAll()
        spark.catalog.clearCache()
        System.gc(); Thread.sleep(500); System.gc(); Thread.sleep(500)
      }

    val factors = args.collectFirst {
      case a if a.startsWith("factor=") => Seq(a.drop(7).toInt)
    }.getOrElse(Seq(300, 1000))
    val only = args.filter(_.startsWith("q")).toSet
    def on(p: String) = only.isEmpty || only.contains(p)

    for (factor <- factors) {
      val path = build(factor)
      println(s"[docprobe] === ${factor}x: docs=${(maxDoc + 1) * factor} ${dfFree()} ===")
      def docs = spark.read.parquet(path)
      if (on("qcap")) {
        // the degradation arithmetic the operators will apply, printed
        // up front: effective df cap + exact pair mass at the caller cap
        val gramDf = D.containmentGramIndex(docs, "doc_id", "text")
          .groupBy("g").agg(F.count(F.lit(1)).as("df"))
        val (eff, mass) = D.adaptiveContainmentCap(gramDf, "df", 1000)
        println(s"[docprobe] cap_${factor}x eff=$eff massAtMaxDf=$mass ${dfFree()}")
        spark.catalog.clearCache()
      }
      if (on("q89")) time(s"q89_containment_${factor}x",
        D.containmentPairs(docs, "doc_id", "text", k = 3, tau = 0.8, maxDf = 1000))
      if (on("q92")) time(s"q92_incremental_${factor}x", {
        val d = docs
        val index = graft.core.CacheRegistry.track("docprobe.q92.index",
          D.containmentGramIndex(d, "doc_id", "text"))
        val gramDf = index.groupBy("g").agg(F.count(F.lit(1)).as("df"))
        // r16: the nightly cap is the fixed semantic stop-gram cap (the
        // q92 registration's shape) — the fold's fan-out is batch-
        // bounded, so no mass budget applies to the incremental path
        val eff = 1000
        val sizes = index.join(
            D.maybeBroadcastVocab(gramDf.filter(F.col("df") <= eff), gramDf), "g")
          .groupBy("id").agg(F.count(F.lit(1)).as("n"))
        val batch = d.filter(F.pmod(F.col("doc_id"), F.lit(10)) === 0)
          .select((F.col("doc_id") + 100000000L).as("doc_id"), F.col("text"))
        D.containmentPairsIncremental(index, gramDf, sizes, batch,
          "doc_id", "text", k = 3, tau = 0.8, maxDf = eff)
      })
      if (on("q100")) time(s"q100_winnow_${factor}x",
        D.winnowOverlapPairs(docs, "doc_id", "text", k = 3, w = 4, tau = 0.5, maxDf = 1000))
    }
    spark.stop()
  }
}
