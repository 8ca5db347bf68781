package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.{functions => F}

/** Third-decade probe for the vector heavies (r12 verdict task 3):
  * q55/q58's complete cosine-pairs path and the x99 IVF classification
  * at ×1000 over sf0.1 — vectors-only synthetic growth (2k → 2M
  * embeddings, ~0.5 GB of float payload), which fits this box where a
  * full-table ×1000 corpus would not.
  *
  * The point is the BUDGET CASCADE: per decade, which gated branch runs
  * — sims cache kept vs skipped (`graft.simsCacheMaxBytes`), verify /
  * probes broadcast vs shuffled (`graft.broadcastVecMaxBytes`), label
  * attach hinted vs not (`graft.knn.maxBroadcastSurvivors`) — and
  * whether e/decade stays ≤ 0.85 as the branches engage in sequence.
  * Branch engagement is printed from the same gate arithmetic the
  * operators use (counts × the configured budgets), so the log names
  * the engaged branch per decade next to its timing.
  *
  * {{{
  *   sbt "runMain graft.VecProbe"            # 100× and 1000× legs
  *   sbt "runMain graft.VecProbe 1000only"   # skip the 100× leg
  * }}}
  *
  * Copies shift vec_id by 2,000 (sf0.1 max id < 2,000 — same guard as
  * ScaleProbe); the x99 query twin shifts by 10,000,000 so crawl-sized
  * query ids can never collide with grown corpus ids (ScaleProbe's
  * +1,000,000 would overlap past factor 500). One timed leg per scale
  * (GRAFT_PROBE_LEGS semantics are built in — heavy queries double
  * scratch on a second leg), df-watch printed per leg.
  */
object VecProbe {
  def main(args: Array[String]): Unit = {
    val base = "/root/testdata/sf0.1"
    val out = "/tmp/vecprobe"
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val maxVec = spark.read.parquet(s"$base/embeddings.parquet")
      .agg(F.max(F.col("vec_id").cast("long"))).head().getLong(0)
    require(maxVec < 2000L, s"vec shift span assumes sf0.1 (max id $maxVec)")

    def build(factor: Int): String = {
      val path = s"$out/emb_${factor}x.parquet"
      if (!new java.io.File(path).exists()) {
        val df = spark.read.parquet(s"$base/embeddings.parquet")
        (0 until factor).map(i => df.withColumn("vec_id", F.col("vec_id") + F.lit(i * 2000L)))
          .reduce(_ unionByName _)
          .repartition(32).write.mode("overwrite").parquet(path)
        println(s"[vecprobe] built ${factor}x")
      }
      path
    }

    def dfFree(): String = {
      val f = new java.io.File("/tmp")
      f"${f.getUsableSpace / (1L << 30)}%d GiB free"
    }

    // gate states, from the operators' own arithmetic (r13: the cache
    // budget now gates the n-ROW assigned frame — the n·nlist sims frame
    // is single-consumer and never cached; assignment itself is map-only)
    def gates(n: Long, dim: Int): String = {
      val nlist = math.max(16, math.ceil(8 * math.sqrt(n.toDouble)).toInt)
      val asgBytes = n * 64L
      val asgCap = spark.conf.get("graft.simsCacheMaxBytes", (8L << 30).toString).toLong
      val vecBytes = n * (dim * 4L + 64L)
      val vecCap = spark.conf.get("graft.broadcastVecMaxBytes", (512L * 1024 * 1024).toString).toLong
      val survCap = spark.conf.get("graft.knn.maxBroadcastSurvivors", "8000000").toLong
      s"nlist=$nlist assigned=${asgBytes >> 20}MiB(${if (asgBytes > asgCap) "SKIP cache" else "cache"}) " +
        s"vecs=${vecBytes >> 20}MiB(${if (vecBytes > vecCap) "SHUFFLED verify/probes" else "broadcast"}) " +
        s"survivors(k=5)=${5 * n}(${if (5 * n > survCap) "no hint" else "hinted"})"
    }

    def time(tag: String, mk: DataFrame => DataFrame, path: String, n: Long, dim: Int): Unit =
      try {
        val t0 = System.nanoTime()
        val df = mk(spark.read.parquet(path))
        df.agg(F.sum(F.xxhash64(df.columns.map(F.col).toSeq: _*)
          .cast("decimal(38,0)"))).collect()
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"[vecprobe] $tag%-24s $dt%9.2f s   ${gates(n, dim)}   ${dfFree()}")
      } catch {
        // a disk-fill or OOM on one leg must not lose the sweep — the
        // failure itself is a probe datum (the binding constraint)
        case e: Throwable =>
          println(s"[vecprobe] $tag FAILED: ${String.valueOf(e.getMessage).take(160)}  ${dfFree()}")
      } finally {
        spark.catalog.clearCache()
        System.gc(); Thread.sleep(500); System.gc(); Thread.sleep(500)
      }

    val dim = spark.read.parquet(s"$base/embeddings.parquet")
      .select(F.size(F.col("embedding"))).head().getInt(0)
    val factors = args.collectFirst {
      case a if a.startsWith("factor=") => Seq(a.drop(7).toInt)
    }.getOrElse(if (args.contains("1000only")) Seq(1000) else Seq(100, 1000))
    // q55/q58's registered τ is 0.4 (the completeness-guarantee regime —
    // probe fan-out is the deliberate cost); add "tau=<t>" to probe the
    // near-dup regime too, and name probes (q55,q58,x99) to subset
    val tau = args.collectFirst { case a if a.startsWith("tau=") => a.drop(4).toDouble }
      .getOrElse(0.4)
    val only = args.filter(a => a.startsWith("q") || a.startsWith("x")).toSet
    def on(p: String) = only.isEmpty || only.contains(p)
    for (factor <- factors) {
      val path = build(factor)
      val n = 2000L * factor
      println(s"[vecprobe] === ${factor}x: n=$n dim=$dim tau=$tau ${dfFree()} ===")
      // fan-out pricing: two aggregations, no candidate row materialized —
      // the diagnostic that says whether the τ's candidate join fits disk
      if (on("x55stats")) {
        val stats = pipeline.Similarity
          .cosinePairsCompleteStats(spark.read.parquet(path), tau).head()
        println(s"[vecprobe] x55_fanout_${factor}x_t$tau  n=${stats.getLong(0)} " +
          s"probe_rows=${stats.getLong(1)} candidate_pairs=${stats.getLong(2)} " +
          s"cos_alpha=${stats.getDouble(3)}  ${dfFree()}")
        spark.catalog.clearCache()
      }
      if (on("q55")) time(s"q55_complete_${factor}x_t$tau", d =>
        pipeline.Similarity.cosinePairsComplete(d, tau).select("id_a", "id_b"),
        path, n, dim)
      if (on("q58")) time(s"q58_clusters_${factor}x_t$tau", d =>
        pipeline.Dedup.connectedComponents(
          pipeline.Similarity.cosinePairsComplete(d, tau))
          .select("id", "cluster"),
        path, n, dim)
      if (on("x99")) time(s"x99_knn_ivf_${factor}x", d => {
        val corpus = d.withColumn("label", (F.col("vec_id") % 8).cast("int"))
        val queries = d.select((F.col("vec_id") + 10000000L).as("vec_id"), F.col("embedding"))
        val nlist = math.max(16, math.ceil(8 * math.sqrt(n.toDouble)).toInt)
        pipeline.Similarity.knnClassifyIvf(corpus, queries, k = 5, nlist = nlist, nprobe = 4)
      }, path, n, dim)
    }
    spark.stop()
  }
}
