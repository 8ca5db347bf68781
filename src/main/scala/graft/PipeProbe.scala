package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.{functions => F}

/** Composed-pipeline third-decade probe (r16 verdict item 6): the
  * flagship curation funnel — quality gate → exact dedup → near-dup
  * removal → contamination filter → deterministic sample — as ONE plan
  * forced per scale (×300 / ×1000 over sf0.1 documents), with the
  * DocProbe protocol: forced rows+checksum print, df-watch per leg,
  * and the CacheRegistry per-tag byte footprint logged DURING the
  * composed force — the regime where successive families' internal
  * caches OVERLAP (every individual family already has its own
  * third-decade probe; this is the first composed point, r16 "What's
  * missing" item 4). Per-stage splits come from forcing each PREFIX of
  * the composition (gate / +exact / +neardup / +contam / +sample): the
  * deltas are the per-stage costs in context, repeated-prefix variance
  * and all.
  *
  * The stage ORDER is the at-scale design the operators document:
  * exact dedup runs BEFORE near-dup so the ×N duplication collapses in
  * one hash aggregation and the pair-emitting LSH machinery only ever
  * sees content-distinct survivors (pairing the duplicated corpus
  * directly would be the quadratic non-plan).
  *
  * Run like DocProbe: plain `java` with the Spark jars + add-opens,
  * main `graft.PipeProbe`, args `[factor=300 factor=1000] [upTo=5]`.
  * Shares DocProbe's /tmp/docprobe corpus artifacts.
  */
object PipeProbe {
  def main(args: Array[String]): Unit = {
    val base = "/root/testdata/sf0.1"
    val out = "/tmp/docprobe"
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("graft.containment.waveDir", "/tmp/docprobe/waves")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val D = pipeline.Dedup
    val T = pipeline.TextOps
    val S = pipeline.Sampling

    val maxDoc = spark.read.parquet(s"$base/documents.parquet")
      .agg(F.max(F.col("doc_id").cast("long"))).head().getLong(0)
    require(maxDoc < 5000L, s"doc shift span assumes sf0.1 (max id $maxDoc)")

    def build(factor: Int): String = {
      val path = s"$out/docs_full_${factor}x.parquet"
      if (!new java.io.File(path).exists()) {
        val df = spark.read.parquet(s"$base/documents.parquet")
          .select(F.col("doc_id"), F.col("source"), F.col("text"))
        (0 until factor).map(i =>
            df.withColumn("doc_id", F.col("doc_id") + F.lit(i * 5000L)))
          .reduce(_ unionByName _)
          .repartition(32).write.mode("overwrite").parquet(path)
        println(s"[pipeprobe] built ${factor}x")
      }
      path
    }

    def dfFree(): String = {
      val f = new java.io.File("/tmp")
      f"${f.getUsableSpace / (1L << 30)}%d GiB free"
    }

    // the eval suite for decontamination: the BASE corpus's src0 slice
    // (an eval set does not grow with the training corpus)
    lazy val evalGrams = spark.read.parquet(s"$base/documents.parquet")
      .filter(F.col("source") === "src0")
      .select(F.explode(D.shingles(F.col("text"), 3)).as("g"))
      .distinct().withColumn("__hit", F.lit(1))

    // ===== POOL-SPLIT corpus (r18, r17 verdict item 4) =====
    // The original probe corpus is the real sf0.1 documents table, whose
    // generator shares ONE word pool across all docs — 3-gram overlap
    // with any eval slice is uniformly high, so the decontamination
    // stage had to probe at 0.8 instead of its documented 0.2 operating
    // point (a 0.2 cut left 8 of 2411 docs). The split corpus draws
    // training text from a `tw…` pool and the eval suite from a
    // disjoint `ev…` pool; 10% of base docs splice a 40-token VERBATIM
    // eval span (contamination ≈ 0.25-0.35 of their grams — the shape
    // the filter exists for), so at 0.2 exactly the planted docs cut
    // and every downstream stage stays non-degenerate. All text is a
    // pure function of the base-doc index via xxhash64 expressions —
    // deterministic across executors and re-runs, no driver RNG.
    val SplitBases = 5000L
    val EvalDocs = 200L
    def buildSplit(factor: Int): String = {
      val path = s"$out/docs_split_${factor}x.parquet"
      if (!new java.io.File(path).exists()) {
        val n = SplitBases * factor
        val df = spark.range(n)
          .withColumn("doc_id", F.col("id"))
          .withColumn("__b", F.pmod(F.col("id"), F.lit(SplitBases)))
          .withColumn("source", F.concat(F.lit("src"), F.pmod(F.col("__b"), F.lit(5))))
          .withColumn("__len", (F.lit(80) + F.pmod(F.xxhash64(F.col("__b")), F.lit(120))).cast("int"))
          .withColumn("__train", F.transform(
            F.sequence(F.lit(0), F.col("__len") - 1),
            p => F.concat(F.lit("tw"),
              F.pmod(F.xxhash64(F.col("__b") * 1000003L + p.cast("long")), F.lit(50000)))))
          .withColumn("__e", F.pmod(F.floor(F.col("__b") / F.lit(10)), F.lit(EvalDocs)).cast("long"))
          .withColumn("__s", F.pmod(F.xxhash64(F.col("__b") + 13L), F.lit(60)).cast("int"))
          .withColumn("__span", F.when(F.pmod(F.col("__b"), F.lit(10)) === 0,
            F.transform(F.sequence(F.col("__s"), F.col("__s") + 39),
              p => F.concat(F.lit("ev"),
                F.pmod(F.xxhash64(F.col("__e") * 7919L + p.cast("long")), F.lit(5000)))))
            .otherwise(F.array().cast("array<string>")))
          .withColumn("text", F.array_join(F.concat(F.col("__train"), F.col("__span")), " "))
          .select("doc_id", "source", "text")
        df.repartition(32).write.mode("overwrite").parquet(path)
        println(s"[pipeprobe] built split ${factor}x")
      }
      path
    }
    // the eval suite: 200 docs of 100 `ev…` tokens — the SAME token
    // expression the contaminated spans replay, so planted spans are
    // verbatim eval text
    lazy val evalGramsSplit = {
      val docs = spark.range(EvalDocs)
        .withColumn("text", F.array_join(F.transform(
          F.sequence(F.lit(0), F.lit(99)),
          p => F.concat(F.lit("ev"),
            F.pmod(F.xxhash64(F.col("id") * 7919L + p.cast("long")), F.lit(5000)))), " "))
      docs.select(F.explode(D.shingles(F.col("text"), 3)).as("g"))
        .distinct().withColumn("__hit", F.lit(1))
    }

    /** The funnel up to stage `upTo` (1 gate, 2 exact dedup, 3 near-dup
      * removal, 4 contamination filter, 5 deterministic sample), with
      * the eval gram set + contamination threshold as parameters (r18:
      * the split corpus probes the documented 0.2 operating point). */
    def composed(docs: DataFrame, upTo: Int,
                 evalG: DataFrame = evalGrams, thr: Double = 0.8): DataFrame = {
      // 1: keep each source's top half by the quality kernel — the auto
      // dispatch picks the approx sketch path at third-decade group
      // rows. The gate returns (id, group, quality) scalars; the funnel
      // re-attaches text for the downstream stages (one id-equi-join —
      // at 100 TB that join is the honest cost of not carrying text
      // through the gate's shuffle+sort)
      // approxAbove lowered so the sketch gate (and its corpus-shaped
      // tracked cache — the overlap this probe exists to observe)
      // engages at the probe scales, as it would at 100 TB
      var cur = if (upTo < 1) docs
        else T.qualityGateAuto(docs, "doc_id", "text", "source", pct = 0.5,
            approxAbove = 1000000L)
          .join(docs.select(F.col("doc_id"), F.col("text")), Seq("doc_id"))
      // 2: exact dedup, first-appearance keeper per content key — ONE
      // hash aggregation collapses the ×N duplication before anything
      // pair-shaped runs
      if (upTo >= 2) {
        val keyed = cur.withColumn("__ck", D.exactKey(F.col("text")))
        val keep = keyed.groupBy("__ck").agg(F.min("doc_id").as("doc_id"))
        cur = keyed.join(keep, Seq("__ck", "doc_id")).drop("__ck")
      }
      // 3: near-dup removal on the content-distinct survivors (q41's
      // minhash+LSH shape; the higher id of a verified pair drops)
      if (upTo >= 3) {
        val withBands = graft.core.CacheRegistry.track("pipeprobe.bands",
          cur.select(F.col("doc_id"), D.shingles(F.col("text")).as("sh"))
            .select(F.col("doc_id"), F.col("sh"),
              D.bandKeysDirect(F.col("sh"), k = 32, bands = 8).as("bands")))
        val losers = D.candidatePairs(withBands, "doc_id", "bands")
          .join(withBands.select(F.col("doc_id").as("id_a"), F.col("sh").as("sh_a")), "id_a")
          .join(withBands.select(F.col("doc_id").as("id_b"), F.col("sh").as("sh_b")), "id_b")
          .filter(D.jaccard(F.col("sh_a"), F.col("sh_b")) >= 0.8)
          .select(F.col("id_b").as("doc_id")).distinct()
        cur = cur.join(losers, Seq("doc_id"), "left_anti")
      }
      // 4: decontamination against the broadcast eval shingle set
      if (upTo >= 4) {
        val frac = cur
          .select(F.col("doc_id"), F.explode(D.shingles(F.col("text"), 3)).as("g"))
          .join(F.broadcast(evalG), Seq("g"), "left")
          .groupBy("doc_id")
          .agg((F.sum(F.when(F.col("__hit").isNotNull, 1L).otherwise(0L))
            .cast("double") / F.count(F.lit(1))).as("__contam"))
        // threshold: 0.8 on the shared-pool sf0.1 corpus (3-gram overlap
        // is uniformly high there — a 0.2 cut left 8 of 2411 docs,
        // making the sample stage vacuous); 0.2 — the operators'
        // documented operating point — on the pool-split corpus, where
        // clean docs sit near 0 and planted spans near 0.3
        cur = cur.join(frac, Seq("doc_id"), "left")
          .filter(F.coalesce(F.col("__contam"), F.lit(0.0)) < thr)
          .drop("__contam")
      }
      // 5: deterministic sample — 20% by content-stable row coordinate,
      // then a per-source cap (the q90 shape)
      if (upTo >= 5) {
        val sampled = cur.filter(S.hashBp(F.col("doc_id").cast("string")) < 2000)
        cur = S.capPerGroup(sampled, F.col("doc_id").cast("string"),
          F.col("source"), cap = 200)
      }
      cur
    }

    def time(tag: String, mk: => DataFrame): Unit =
      try {
        val t0 = System.nanoTime()
        val df = mk
        val cols = df.columns.toSeq
        val r = df.agg(F.count(F.lit(1)),
          F.sum(F.xxhash64(cols.map(F.col): _*).cast("decimal(38,0)"))).collect()(0)
        val dt = (System.nanoTime() - t0) / 1e9
        val bytes = graft.core.CacheRegistry.trackedBytes(spark).filter(_._2 > 0)
          .map { case (t, b) => s"$t=${b / (1L << 20)}MiB" }.mkString(" ")
        println(f"[pipeprobe] $tag%-24s $dt%9.2f s   rows=${r.get(0)} " +
          f"sum=${r.get(1)}   cache[$bytes]   ${dfFree()}")
      } catch {
        case e: Throwable =>
          println(s"[pipeprobe] $tag FAILED: ${String.valueOf(e.getMessage).take(160)}  ${dfFree()}")
      } finally {
        graft.core.CacheRegistry.releaseAll()
        spark.catalog.clearCache()
        System.gc(); Thread.sleep(500); System.gc(); Thread.sleep(500)
      }

    val factors = {
      val fs = args.collect { case a if a.startsWith("factor=") => a.drop(7).toInt }
      if (fs.nonEmpty) fs.toSeq else Seq(300, 1000)
    }
    val upTo = args.collectFirst {
      case a if a.startsWith("upTo=") => a.drop(5).toInt
    }.getOrElse(5)
    val split = args.contains("split")
    for (f <- factors) {
      if (split) {
        val docs = spark.read.parquet(buildSplit(f))
        println(s"[pipeprobe] == SPLIT factor $f thr=0.2 (${dfFree()})")
        for (k <- 1 to upTo)
          time(s"split ${f}x upTo=$k", composed(docs, k, evalGramsSplit, thr = 0.2))
      } else {
        val docs = spark.read.parquet(build(f))
        println(s"[pipeprobe] == factor $f (${dfFree()})")
        for (k <- 1 to upTo)
          time(s"${f}x upTo=$k", composed(docs, k))
      }
    }
    spark.stop()
  }
}
