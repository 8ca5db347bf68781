package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.{functions => F}

import scala.util.Random

import graft.streaming.Streams

/** Differential fuzz for the stateful streaming twins (r15 verdict item
  * 3) — the FuzzDiff treatment for the streaming surface: RANDOM inputs,
  * split into time-ordered micro-batch files (the StreamProbe chunking:
  * one file per trigger, ascending mtimes so FileStreamSource replays
  * arrival order), driven with Trigger.AvailableNow into a memory sink,
  * and compared row-for-row against the corresponding BATCH operator
  * over the same data.
  *
  * Covered twins (r16 added the first three; r17 extends to the FULL
  * stateful/stored-artifact surface, r16 verdict item 2 — tumbling/
  * sliding/session window counts vs the same window expressions in
  * batch mode with a sentinel-flushed watermark, embeddingDedupStream
  * vs `Similarity.incrementalCosinePairs`, noveltyStream /
  * stripSpansStream / newDocsStream vs their batch operators on one
  * shared corpus with null/no-gram edge rows, quotaPerGroup contract
  * invariants incl. replay determinism, and sessionSummaries' final
  * state vs batch count/sum; r18 adds the last three uncovered ops —
  * dedupStream / enrichStream / sampleStream, [[ingestTwinsCase]] —
  * closing the surface at 16/16):
  *
  *  - `Streams.intervalJoin` vs the identical batch join predicate.
  *    Arrival disorder is generated BOUNDED (rows arrive within ±J of
  *    event time, watermark ≫ 2J), so no row is watermark-late and the
  *    stream must emit EXACTLY the batch join's pair multiset — state
  *    eviction that is too eager (or a watermark that misadvances)
  *    surfaces as missing pairs, buffering bugs as duplicates.
  *  - `Streams.dedupAgainstIndex` vs `Dedup.incrementalPairs` over the
  *    same stored LSH index and arrival batch: random word-soup corpora
  *    with planted near/exact duplicate families, arrivals a mix of
  *    copies, perturbed copies and fresh docs. Values compare exactly
  *    (both sides share the jaccard kernel).
  *  - `Streams.containmentAgainstIndex` vs the batch incremental fold
  *    restricted to cross pairs — arrivals include random subsequence
  *    slices (the subset-duplicate shape).
  *
  * Late data is deliberately NOT generated here: watermark-drop
  * semantics diverge from batch BY CONTRACT and are pinned separately
  * (StreamingSpec's late-replay fixtures). This harness pins the
  * equality regime: bounded disorder ⇒ batch-identical answers.
  *
  * {{{ runMain graft.StreamFuzz [seeds=6] }}} — runs every seed at two
  * scales; exits non-zero on any mismatch. StreamFuzzSpec runs a small
  * sweep in-suite.
  */
object StreamFuzz {

  private val BASE = 1704067200000L // 2024-01-01 UTC, ms

  /** Write `df` as `files` event-time-ordered micro-batch files under
    * `dir` with ascending names and mtimes (FileStreamSource orders by
    * mtime; a bulk write's near-identical mtimes scramble arrival order
    * — the StreamProbe lesson). `arrivalCol` decides the file a row
    * lands in (bounded jitter of the event time simulates disorder). */
  private def chunkByArrival(df: DataFrame, arrivalCol: String, dir: String,
                             files: Int): Unit = {
    new java.io.File(dir).mkdirs()
    val withB = df.withColumn("__b", F.ntile(files).over(
      org.apache.spark.sql.expressions.Window.orderBy(arrivalCol))).cache()
    for (b <- 1 to files) {
      val tmpd = s"$dir-tmp-$b"
      withB.filter(F.col("__b") === b).drop("__b", arrivalCol)
        .coalesce(1).write.mode("overwrite").parquet(tmpd)
      val part = new java.io.File(tmpd).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      val dst = new java.io.File(dir, f"f$b%03d.parquet")
      java.nio.file.Files.move(part.toPath, dst.toPath)
      dst.setLastModified(1700000000000L + b * 10000L)
      def rm(p: java.io.File): Unit = {
        if (p.isDirectory) p.listFiles().foreach(rm); p.delete()
      }
      rm(new java.io.File(tmpd))
    }
    withB.unpersist()
  }

  private def runToMemory(out: DataFrame, name: String,
                          mode: String = "append"): DataFrame = {
    val spark = out.sparkSession
    val q = out.writeStream.outputMode(mode)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .format("memory").queryName(name).start()
    try { q.processAllAvailable(); q.awaitTermination() } finally q.stop()
    spark.table(name)
  }

  /** Interval join twin vs the batch join predicate. Returns 0 on
    * equality, 1 on mismatch (printed). */
  def intervalJoinCase(spark: SparkSession, seed: Int, nEvents: Int,
                       dir: String, tag: String): Int = {
    import spark.implicits._
    val rng = new Random(seed * 1013 + 17)
    // one event per second in EVENT time; ARRIVAL time jitters ±J s.
    // watermark 10 min ≫ 2J=4 min ⇒ nothing is ever watermark-late.
    val J = 120
    val rows = (0 until nEvents).map { i =>
      (i.toLong,
        new java.sql.Timestamp(BASE + i * 1000L),
        rng.nextInt(12).toLong,
        (rng.nextInt(8001) - 4000) / 4.0,
        i + rng.nextInt(2 * J + 1) - J) // arrival rank
    }.toDF("event_id", "ts", "user_id", "value", "arr")
    val left = rows.filter($"event_id" % 2 === 0)
    val right = rows.filter($"event_id" % 2 =!= 0)
      .select($"event_id".as("r_event_id"), $"ts".as("rts"),
        $"user_id", $"value".as("r_value"), $"arr")
    val (ld, rd) = (s"$dir/ij-left", s"$dir/ij-right")
    chunkByArrival(left, "arr", ld, files = 6)
    chunkByArrival(right, "arr", rd, files = 6)
    val ls = spark.readStream.schema(left.drop("arr").schema)
      .option("maxFilesPerTrigger", "1").parquet(ld)
    val rs = spark.readStream.schema(right.drop("arr").schema)
      .option("maxFilesPerTrigger", "1").parquet(rd)
    val got = runToMemory(
      Streams.intervalJoin(ls, rs, "user_id", "ts", "rts",
          lookback = "3 minutes", watermark = "10 minutes")
        .select("event_id", "r_event_id"),
      s"sfuzz_ij_${tag}_$seed")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    val lb = left.drop("arr"); val rb = right.drop("arr")
    val want = lb.join(rb,
        lb("user_id") === rb("user_id") &&
          rb("rts") >= lb("ts") - F.expr("INTERVAL 3 minutes") &&
          rb("rts") <= lb("ts"), "inner")
      .select("event_id", "r_event_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    spark.sql(s"DROP TABLE IF EXISTS sfuzz_ij_${tag}_$seed")
    if (got == want) 0 else {
      println(s"[streamfuzz] MISMATCH interval_join seed=$seed scale=$tag: " +
        s"stream ${got.size} rows vs batch ${want.size}; " +
        s"extra=${(got.diff(want)).take(5)} missing=${(want.diff(got)).take(5)}")
      1
    }
  }

  /** Near-dup-vs-stored-index twin vs `Dedup.incrementalPairs`. */
  def dedupIndexCase(spark: SparkSession, seed: Int, nDocs: Int,
                     dir: String, tag: String): Int = {
    import spark.implicits._
    val D = graft.pipeline.Dedup
    val rng = new Random(seed * 7919 + 3)
    val pool = (0 until 60).map(i => s"w$i")
    def fresh(): String =
      Seq.fill(12 + rng.nextInt(14))(pool(rng.nextInt(pool.size))).mkString(" ")
    def perturb(s: String): String = {
      val ws = s.split(" ").toBuffer
      for (_ <- 0 until rng.nextInt(3))
        ws(rng.nextInt(ws.size)) = pool(rng.nextInt(pool.size))
      ws.mkString(" ")
    }
    val corpusTexts = scala.collection.mutable.ArrayBuffer.empty[String]
    for (i <- 0 until nDocs)
      corpusTexts += (if (i > 0 && rng.nextInt(5) == 0)
        perturb(corpusTexts(rng.nextInt(i))) else fresh())
    val corpus = corpusTexts.zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toSeq.toDF("doc_id", "text")
    val index = D.lshIndex(corpus, "doc_id", "text").persist()
    val arrivals = (0 until math.max(4, nDocs / 2)).map { j =>
      val t = rng.nextInt(5) match {
        case 0 => corpusTexts(rng.nextInt(corpusTexts.size)) // exact copy
        case 1 => perturb(corpusTexts(rng.nextInt(corpusTexts.size)))
        case _ => fresh()
      }
      (1000000L + j, new java.sql.Timestamp(BASE + j * 1000L), t, j)
    }.toDF("doc_id", "ts", "text", "arr")
    val dd = s"$dir/di-docs"
    chunkByArrival(arrivals, "arr", dd, files = 5)
    val src = spark.readStream.schema(arrivals.drop("arr").schema)
      .option("maxFilesPerTrigger", "1").parquet(dd)
    def key(r: org.apache.spark.sql.Row) =
      (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"), r.getAs[Double]("jaccard"))
    val got = runToMemory(
      Streams.dedupAgainstIndex(src, index, "doc_id", "ts", "text", "10 minutes"),
      s"sfuzz_di_${tag}_$seed").collect().map(key).toSeq.sorted
    val want = D.incrementalPairs(index,
        D.lshIndex(arrivals.drop("ts", "arr"), "doc_id", "text"), 0.8)
      .collect().map(key).toSeq.sorted
    spark.sql(s"DROP TABLE IF EXISTS sfuzz_di_${tag}_$seed")
    index.unpersist()
    if (got == want) 0 else {
      println(s"[streamfuzz] MISMATCH dedup_vs_index seed=$seed scale=$tag: " +
        s"stream ${got.size} vs batch ${want.size}; " +
        s"extra=${(got.diff(want)).take(5)} missing=${(want.diff(got)).take(5)}")
      1
    }
  }

  /** Containment-vs-stored-gram-index twin vs the batch incremental
    * fold, restricted to CROSS pairs (the twin's contract: arrival-vs-
    * arrival pairs are not emitted; run the batch fold over the store
    * when they matter). Arrivals include random SUBSEQUENCE slices of
    * corpus docs — the subset-duplicate shape containment exists for —
    * plus perturbed copies and fresh docs; no gram approaches the df
    * cap at these sizes, so frozen-cap streaming values equal the
    * batch fold's exactly. */
  def containIndexCase(spark: SparkSession, seed: Int, nDocs: Int,
                       dir: String, tag: String): Int = {
    import spark.implicits._
    val D = graft.pipeline.Dedup
    val rng = new Random(seed * 524287 + 11)
    val pool = (0 until 80).map(i => s"t$i")
    def fresh(): String =
      Seq.fill(14 + rng.nextInt(16))(pool(rng.nextInt(pool.size))).mkString(" ")
    val corpusTexts = Array.fill(nDocs)(fresh())
    val corpus = corpusTexts.zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toSeq.toDF("doc_id", "text")
    val index = D.containmentGramIndex(corpus, "doc_id", "text").persist()
    val gramDf = index.groupBy("g").agg(F.count(F.lit(1)).as("df"))
    val sizes = index.join(gramDf.filter(F.col("df") <= 1000), "g")
      .groupBy("id").agg(F.count(F.lit(1)).as("n"))
    val arrivals = (0 until math.max(4, nDocs / 2)).map { j =>
      val t = rng.nextInt(4) match {
        case 0 => // subset slice of a corpus doc — containment ≈ 1.0
          val ws = corpusTexts(rng.nextInt(nDocs)).split(" ")
          val a = rng.nextInt(math.max(1, ws.length - 6))
          ws.slice(a, a + 6 + rng.nextInt(ws.length - a)).mkString(" ")
        case 1 => corpusTexts(rng.nextInt(nDocs)) // exact copy
        case _ => fresh()
      }
      (1000000L + j, new java.sql.Timestamp(BASE + j * 1000L), t, j)
    }.toDF("doc_id", "ts", "text", "arr")
    val cd = s"$dir/ci-docs"
    chunkByArrival(arrivals, "arr", cd, files = 4)
    val src = spark.readStream.schema(arrivals.drop("arr").schema)
      .option("maxFilesPerTrigger", "1").parquet(cd)
    def key(r: org.apache.spark.sql.Row) =
      (r.getAs[Long]("id_small"), r.getAs[Long]("id_big"),
        r.getAs[Long]("n_small"), r.getAs[Long]("inter"),
        r.getAs[Double]("containment"))
    val got = runToMemory(
      Streams.containmentAgainstIndex(src, index, "doc_id", "ts", "text",
        "10 minutes"),
      s"sfuzz_ci_${tag}_$seed").collect().map(key).toSeq.sorted
    val want = D.containmentPairsIncremental(index, gramDf, sizes,
        arrivals.drop("ts", "arr"), "doc_id", "text")
      // cross pairs only — the twin never emits arrival-vs-arrival
      .filter((F.col("id_small") >= 1000000L) =!= (F.col("id_big") >= 1000000L))
      .collect().map(key).toSeq.sorted
    spark.sql(s"DROP TABLE IF EXISTS sfuzz_ci_${tag}_$seed")
    index.unpersist()
    if (got == want) 0 else {
      println(s"[streamfuzz] MISMATCH containment_vs_index seed=$seed scale=$tag: " +
        s"stream ${got.size} vs batch ${want.size}; " +
        s"extra=${(got.diff(want)).take(5)} missing=${(want.diff(got)).take(5)}")
      1
    }
  }

  // ===== r17: the remaining stateful twins (r16 verdict item 2) =====

  /** Winnow-fingerprint-vs-stored-index twin
    * (`Streams.winnowOverlapAgainstIndex`) vs an INDEPENDENT batch
    * model: both sides' features come from the same
    * `TextOps.winnowFromTokens` kernel, but the batch side computes the
    * capped pairs with plain joins/groupBy over the (id, g) frames —
    * none of the streaming path's broadcast/array machinery — so the
    * stream's candidate join + exact array-intersection is checked
    * against first-principles SQL. Arrivals include verbatim SPAN
    * copies (winnowing guarantees shared runs ≥ w+k−1 share a
    * fingerprint — the shape this operator exists for). */
  def winnowIndexCase(spark: SparkSession, seed: Int, nDocs: Int,
                      dir: String, tag: String): Int = {
    import spark.implicits._
    val T = graft.pipeline.TextOps
    val rng = new Random(seed * 130363 + 19)
    val pool = (0 until 90).map(i => s"v$i")
    def fresh(): String =
      Seq.fill(16 + rng.nextInt(18))(pool(rng.nextInt(pool.size))).mkString(" ")
    val corpusTexts = Array.fill(nDocs)(fresh())
    val corpus = corpusTexts.zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toSeq.toDF("doc_id", "text")
    val (k, w, tau, maxDf) = (3, 4, 0.5, 1000)
    // the stored fingerprint membership index — the nightly artifact
    val index = corpus.select(F.col("doc_id").as("id"),
      F.explode(T.winnowFromTokens(T.tokens(F.col("text")), k, w)).as("g"))
      .persist()
    val arrivals = (0 until math.max(4, nDocs / 2)).map { j =>
      val t = rng.nextInt(4) match {
        case 0 => // verbatim span splice: shares a long run with a doc
          val a = corpusTexts(rng.nextInt(nDocs)).split(" ")
          val s = rng.nextInt(math.max(1, a.length - 10))
          (Seq.fill(4)(pool(rng.nextInt(pool.size))) ++
            a.slice(s, s + 8 + rng.nextInt(a.length - s))).mkString(" ")
        case 1 => corpusTexts(rng.nextInt(nDocs))
        case _ => fresh()
      }
      (1000000L + j, new java.sql.Timestamp(BASE + j * 1000L), t, j)
    }.toDF("doc_id", "ts", "text", "arr")
    val wd = s"$dir/wi-docs"
    chunkByArrival(arrivals, "arr", wd, files = 4)
    val src = spark.readStream.schema(arrivals.drop("arr").schema)
      .option("maxFilesPerTrigger", "1").parquet(wd)
    def key(r: org.apache.spark.sql.Row) =
      (r.getAs[Long]("id_small"), r.getAs[Long]("id_big"),
        r.getAs[Long]("n_small"), r.getAs[Long]("inter"),
        r.getAs[Double]("containment"))
    val got = runToMemory(
      Streams.winnowOverlapAgainstIndex(src, index, "doc_id", "ts", "text",
        "10 minutes", k, w, tau, maxDf),
      s"sfuzz_wi_${tag}_$seed").collect().map(key).toSeq.sorted
    // first-principles batch model over the SAME feature kernel: capped
    // df over index ∪ arrivals, cross pairs only, plain joins
    val bFeat = arrivals.select(F.col("doc_id").as("id"),
      F.explode(T.winnowFromTokens(T.tokens(F.col("text")), k, w)).as("g"))
    // the streaming contract FREEZES the cap at the stored index
    val kept = index.groupBy("g").agg(F.count(F.lit(1)).as("__df"))
      .filter(F.col("__df") <= maxDf).select("g")
    val ia = index.join(kept, "g")
    val sza = ia.groupBy("id").agg(F.count(F.lit(1)).as("na"))
    // arrival capped size = its grams minus the index's stop grams
    val stop = index.groupBy("g").agg(F.count(F.lit(1)).as("__df"))
      .filter(F.col("__df") > maxDf).select("g")
    val szb = bFeat.join(stop, Seq("g"), "left_anti")
      .groupBy("id").agg(F.count(F.lit(1)).as("nb"))
    val inter = ia.select(F.col("g"), F.col("id").as("id_a"))
      .join(bFeat.select(F.col("g"), F.col("id").as("id_b")), "g")
      .groupBy("id_a", "id_b").agg(F.count(F.lit(1)).as("inter"))
    val want = inter
      .join(sza.select(F.col("id").as("id_a"), F.col("na")), "id_a")
      .join(szb.select(F.col("id").as("id_b"), F.col("nb")), "id_b")
      .select(
        F.when(F.col("na") <= F.col("nb"), F.col("id_a")).otherwise(F.col("id_b")).as("id_small"),
        F.when(F.col("na") <= F.col("nb"), F.col("id_b")).otherwise(F.col("id_a")).as("id_big"),
        F.least(F.col("na"), F.col("nb")).as("n_small"),
        F.col("inter"),
        F.round(F.col("inter").cast("double") / F.least(F.col("na"), F.col("nb")), 6)
          .as("containment"))
      .filter(F.col("containment") >= tau)
      .collect().map(key).toSeq.sorted
    spark.sql(s"DROP TABLE IF EXISTS sfuzz_wi_${tag}_$seed")
    index.unpersist()
    if (got == want) 0 else {
      println(s"[streamfuzz] MISMATCH winnow_vs_index seed=$seed scale=$tag: " +
        s"stream ${got.size} vs batch ${want.size}; " +
        s"extra=${got.diff(want).take(5)} missing=${want.diff(got).take(5)}")
      1
    }
  }

  /** Windowed-aggregate twins: tumbling / sliding / session counts vs
    * the SAME window expressions evaluated in BATCH mode (Spark's
    * window()/session_window() work in both — the differential isolates
    * the streaming state machinery: partial aggregation, watermark
    * eviction, session MERGE state). Append mode only emits windows the
    * watermark has closed, so a far-future sentinel event rides the
    * LAST micro-batch to flush every real window; sentinel-keyed rows
    * are excluded from both sides. Values are dyadic rationals, so the
    * stream's incremental sums equal the batch sums bit-for-bit. */
  def windowCountsCase(spark: SparkSession, seed: Int, nEvents: Int,
                       dir: String, tag: String): Int = {
    import spark.implicits._
    val rng = new Random(seed * 2741 + 29)
    val J = 120 // arrival jitter, seconds — watermark 10 min ≫ 2J
    val rows = (0 until nEvents).map { i =>
      (i.toLong,
        new java.sql.Timestamp(BASE + i * 1000L + rng.nextInt(1000)),
        rng.nextInt(6).toLong,
        Seq("click", "view", "buy")(rng.nextInt(3)),
        (rng.nextInt(8001) - 4000) / 4.0,
        i + rng.nextInt(2 * J + 1) - J)
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "arr")
    val sentinelTs = BASE + (nEvents + 86400L) * 1000L
    val sentinel = Seq((-1L, new java.sql.Timestamp(sentinelTs), -1L,
      "__flush", 0.0, nEvents + 10 * J))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "arr")
    val all = rows.unionByName(sentinel)
    val ed = s"$dir/wc-events"
    chunkByArrival(all, "arr", ed, files = 6)
    val src = spark.readStream.schema(all.drop("arr").schema)
      .option("maxFilesPerTrigger", "1").parquet(ed)
    val batch = rows.drop("arr").cache()
    var bad = 0
    def report(name: String, got: Seq[Any], want: Seq[Any]): Unit =
      if (got != want) {
        bad += 1
        println(s"[streamfuzz] MISMATCH $name seed=$seed scale=$tag: " +
          s"stream ${got.size} rows vs batch ${want.size}; " +
          s"extra=${got.diff(want).take(5)} missing=${want.diff(got).take(5)}")
      }
    // tumbling: (bucket, type, n, sum) — exact dyadic sums. r20 (r19
    // verdict item 2): EVEN seeds run this twin on a TIMESTAMP_NTZ
    // source. Spark REFUSES a watermark on NTZ
    // (EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE — found by this very twin),
    // so Streams funnels every watermark column through an LTZ cast
    // (`Streams.watermarked`, the documented streaming-only boundary);
    // these seeds pin that funnel with real state machinery. The bucket
    // is cast back to LTZ before extraction so the compare stays
    // flavor-blind (wall-preserving under the pinned UTC session zone).
    val ntz = seed % 2 == 0
    def tsFlavor(df: DataFrame): DataFrame =
      if (ntz) df.withColumn("ts", F.col("ts").cast("timestamp_ntz")) else df
    locally {
      val got = runToMemory(
        Streams.tumblingCounts(tsFlavor(src), "1 minute", "10 minutes"),
        s"sfuzz_wt_${tag}_$seed")
        .withColumn("bucket", $"bucket".cast("timestamp"))
        .filter($"event_type" =!= "__flush").collect()
        .map(r => (r.getTimestamp(0).getTime, r.getString(1), r.getLong(2),
          r.getDouble(3))).toSeq.sorted
      val want = tsFlavor(batch)
        .groupBy(F.window($"ts", "1 minute"), $"event_type")
        .agg(F.count(F.lit(1)).as("n"), F.sum($"value").as("v"))
        .select(F.col("window.start").cast("timestamp"), $"event_type", $"n", $"v")
        .collect()
        .map(r => (r.getTimestamp(0).getTime, r.getString(1), r.getLong(2),
          r.getDouble(3))).toSeq.sorted
      report("tumbling_counts", got, want)
      spark.sql(s"DROP TABLE IF EXISTS sfuzz_wt_${tag}_$seed")
    }
    // sliding: overlapping windows; exclude the sentinel-only windows
    // (strictly after the last real event)
    locally {
      val cutoff = BASE + (nEvents + 3600L) * 1000L
      val got = runToMemory(
        Streams.slidingCounts(src, "3 minutes", "1 minute", "10 minutes"),
        s"sfuzz_ws_${tag}_$seed")
        .filter($"bucket" < new java.sql.Timestamp(cutoff)).collect()
        .map(r => (r.getTimestamp(0).getTime, r.getLong(1))).toSeq.sorted
      // the sentinel contributes 1 to no real window (it is hours past);
      // batch over the real rows only
      val want = batch
        .groupBy(F.window($"ts", "3 minutes", "1 minute"))
        .agg(F.count(F.lit(1)).as("n"))
        .select(F.col("window.start"), $"n").collect()
        .map(r => (r.getTimestamp(0).getTime, r.getLong(1))).toSeq.sorted
      report("sliding_counts", got, want)
      spark.sql(s"DROP TABLE IF EXISTS sfuzz_ws_${tag}_$seed")
    }
    // session windows: the one nontrivial MERGE state — random gaps
    // around the 40 s session gap split users into multiple sessions
    locally {
      val got = runToMemory(
        Streams.sessionCounts(src, "40 seconds", "10 minutes"),
        s"sfuzz_sc_${tag}_$seed")
        .filter($"user_id" =!= -1L).collect()
        .map(r => (r.getTimestamp(0).getTime, r.getTimestamp(1).getTime,
          r.getLong(2), r.getLong(3))).toSeq.sorted
      val want = batch
        .groupBy(F.session_window($"ts", "40 seconds"), $"user_id")
        .agg(F.count(F.lit(1)).as("n"))
        .select(F.col("session_window.start"), F.col("session_window.end"),
          $"user_id", $"n").collect()
        .map(r => (r.getTimestamp(0).getTime, r.getTimestamp(1).getTime,
          r.getLong(2), r.getLong(3))).toSeq.sorted
      report("session_counts", got, want)
      spark.sql(s"DROP TABLE IF EXISTS sfuzz_sc_${tag}_$seed")
    }
    batch.unpersist()
    bad
  }

  /** Embedding near-dup vs stored hyperplane index twin vs
    * `Similarity.incrementalCosinePairs`: random unit vectors with
    * planted near/exact copies; both sides share the cosine kernel, so
    * values compare exactly. */
  def embeddingDedupCase(spark: SparkSession, seed: Int, nVecs: Int,
                         dir: String, tag: String): Int = {
    import spark.implicits._
    val S = graft.pipeline.Similarity
    val rng = new Random(seed * 6151 + 7)
    val dim = 16
    def unit(): Array[Float] = {
      val v = Array.fill(dim)(rng.nextGaussian())
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(x => (x / n).toFloat)
    }
    def near(v: Array[Float]): Array[Float] = {
      val w = v.map(x => x + (rng.nextGaussian() * 0.05).toFloat)
      val n = math.sqrt(w.map(x => x.toDouble * x).sum)
      w.map(x => (x / n).toFloat)
    }
    val corpusVecs = Array.fill(nVecs)(unit())
    val corpus = corpusVecs.zipWithIndex
      .map { case (v, i) => (i.toLong, v) }.toSeq.toDF("vec_id", "embedding")
    val index = S.hyperplaneIndex(corpus).persist()
    val arrivals = (0 until math.max(4, nVecs / 2)).map { j =>
      val v = rng.nextInt(4) match {
        case 0 => near(corpusVecs(rng.nextInt(nVecs)))
        case 1 => corpusVecs(rng.nextInt(nVecs))
        case _ => unit()
      }
      (1000000L + j, new java.sql.Timestamp(BASE + j * 1000L), v, j)
    }.toDF("vec_id", "ts", "embedding", "arr")
    val vd = s"$dir/ed-vecs"
    chunkByArrival(arrivals, "arr", vd, files = 5)
    val src = spark.readStream.schema(arrivals.drop("arr").schema)
      .option("maxFilesPerTrigger", "1").parquet(vd)
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1), r.getDouble(2))
    val got = runToMemory(
      Streams.embeddingDedupStream(src, index, "vec_id", "ts", "embedding",
        "10 minutes", threshold = 0.9),
      s"sfuzz_ed_${tag}_$seed").collect().map(key).toSeq.sorted
    val want = S.incrementalCosinePairs(index,
        arrivals.select($"vec_id".as("id"), $"embedding".as("vec"),
          S.hyperplaneBucket($"embedding").as("bucket")), 0.9)
      .collect().map(key).toSeq.sorted
    spark.sql(s"DROP TABLE IF EXISTS sfuzz_ed_${tag}_$seed")
    index.unpersist()
    if (got == want) 0 else {
      println(s"[streamfuzz] MISMATCH embedding_dedup seed=$seed scale=$tag: " +
        s"stream ${got.size} vs batch ${want.size}; " +
        s"extra=${got.diff(want).take(5)} missing=${want.diff(got).take(5)}")
      1
    }
  }

  /** Stateless stored-artifact twins in one corpus: novelty scoring vs
    * `TextOps.ngramNoveltyFromVocab`, span stripping vs
    * `Dedup.stripSpansFromProfile`, and bloom-gated exact dedup vs
    * `Dedup.bloomNewDocs`. All three are immediate-emission operators —
    * the differential pins that the shared kernels (gram hashing, chunk
    * hashing, bloom probe) produce identical values through the
    * streaming plan, including null-text and no-gram edge rows. */
  def statelessTwinsCase(spark: SparkSession, seed: Int, nDocs: Int,
                         dir: String, tag: String): Int = {
    import spark.implicits._
    val T = graft.pipeline.TextOps
    val D = graft.pipeline.Dedup
    val rng = new Random(seed * 9173 + 5)
    val pool = (0 until 70).map(i => s"n$i")
    def fresh(): String =
      Seq.fill(10 + rng.nextInt(14))(pool(rng.nextInt(pool.size))).mkString(" ")
    val refTexts = Array.fill(math.max(4, nDocs / 2))(fresh())
    val ref = refTexts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toSeq.toDF("doc_id", "text")
    val vocab = T.refGramVocab(ref, "text").persist()
    // profile: the chunk hashes of a few reference docs (distinct)
    val profile = ref.filter($"doc_id" % 3 === 0)
      .select(F.explode(T.chunkHashesKernel(T.tokens($"text"), 3)).as("chunk_hash"))
      .distinct().persist()
    val keyIndex = ref.select(F.concat(F.lit("k"), $"doc_id").as("content_key"))
    val sketch = D.bloomSketch(keyIndex, "content_key", expectedItems = 10000L)
    val arrivals = (0 until math.max(6, nDocs / 2)).map { j =>
      val t: String = rng.nextInt(6) match {
        case 0 => refTexts(rng.nextInt(refTexts.length)) // exact ref copy
        case 1 => // splice two refs: some chunks in-profile, some not
          val a = refTexts(rng.nextInt(refTexts.length)).split(" ")
          val b = refTexts(rng.nextInt(refTexts.length)).split(" ")
          (a.take(3 + rng.nextInt(a.length)) ++ b.take(3 + rng.nextInt(b.length)))
            .mkString(" ")
        case 2 => if (rng.nextBoolean()) null else "xy" // null / no-gram edge
        case _ => fresh()
      }
      val key = if (rng.nextInt(3) == 0) s"k${rng.nextInt(refTexts.length)}"
        else if (rng.nextInt(10) == 0) null else s"new-$seed-$j"
      (1000000L + j, new java.sql.Timestamp(BASE + j * 1000L), t, key, j)
    }.toDF("doc_id", "ts", "text", "content_key", "arr")
    val sd = s"$dir/st-docs"
    chunkByArrival(arrivals, "arr", sd, files = 4)
    val src = spark.readStream.schema(arrivals.drop("arr").schema)
      .option("maxFilesPerTrigger", "1").parquet(sd)
    val batchDocs = arrivals.drop("arr")
    var bad = 0
    def report(name: String, got: Seq[Any], want: Seq[Any]): Unit =
      if (got != want) {
        bad += 1
        println(s"[streamfuzz] MISMATCH $name seed=$seed scale=$tag: " +
          s"stream ${got.size} vs batch ${want.size}; " +
          s"extra=${got.diff(want).take(5)} missing=${want.diff(got).take(5)}")
      }
    locally { // novelty
      def key(r: org.apache.spark.sql.Row) =
        (r.getLong(0), r.getLong(1), r.getLong(2),
          // null novelty as a sentinel, NOT NaN (NaN != NaN would flag
          // identical rows as mismatched)
          if (r.isNullAt(3)) -999.0 else r.getDouble(3))
      val got = runToMemory(
        Streams.noveltyStream(src.drop("content_key"), vocab, "doc_id", "text"),
        s"sfuzz_nv_${tag}_$seed")
        .select("doc_id", "n_grams", "n_novel", "novelty")
        .collect().map(key).toSeq.sortBy(r => (r._1, r._2, r._3))
      val want = T.ngramNoveltyFromVocab(vocab, batchDocs, "doc_id", "text")
        .select("doc_id", "n_grams", "n_novel", "novelty")
        .collect().map(key).toSeq.sortBy(r => (r._1, r._2, r._3))
      report("novelty_stream", got, want)
      spark.sql(s"DROP TABLE IF EXISTS sfuzz_nv_${tag}_$seed")
    }
    locally { // span stripping
      def key(r: org.apache.spark.sql.Row) =
        (r.getLong(0), if (r.isNullAt(1)) -1 else r.getInt(1), r.getInt(2),
          Option(r.getString(3)).getOrElse("\u0000null"))
      val got = runToMemory(
        Streams.stripSpansStream(src, profile, "doc_id", "ts", "text", size = 3),
        s"sfuzz_sp_${tag}_$seed")
        .select("doc_id", "n_tokens", "n_removed", "clean_text")
        .collect().map(key).toSeq.sorted
      val want = D.stripSpansFromProfile(batchDocs, profile, "doc_id", "text", size = 3)
        .select("doc_id", "n_tokens", "n_removed", "clean_text")
        .collect().map(key).toSeq.sorted
      report("strip_spans_stream", got, want)
      spark.sql(s"DROP TABLE IF EXISTS sfuzz_sp_${tag}_$seed")
    }
    locally { // bloom-gated new docs
      def key(r: org.apache.spark.sql.Row) =
        (r.getLong(0), Option(r.getString(1)).getOrElse("\u0000null"))
      val got = runToMemory(
        Streams.newDocsStream(src, keyIndex, sketch, "content_key")
          .select("doc_id", "content_key"),
        s"sfuzz_bn_${tag}_$seed").collect().map(key).toSeq.sorted
      val want = D.bloomNewDocs(batchDocs, keyIndex, sketch, "content_key",
          persistTagged = false)
        .select("doc_id", "content_key")
        .collect().map(key).toSeq.sorted
      report("new_docs_stream", got, want)
      spark.sql(s"DROP TABLE IF EXISTS sfuzz_bn_${tag}_$seed")
    }
    vocab.unpersist(); profile.unpersist()
    bad
  }

  /** quotaPerGroup invariants: append-only per-group admission is BY
    * CONTRACT not the batch `capPerGroup` md5-min selection, so the
    * differential pins the contract instead: (a) per-group admissions =
    * min(cap, group rows), (b) admitted keys ⊆ input keys, (c) a replay
    * over the SAME chunking admits the IDENTICAL set (at-least-once
    * determinism — the within-batch md5 ordering is doing its job). */
  def quotaCase(spark: SparkSession, seed: Int, nRows: Int,
                dir: String, tag: String): Int = {
    import spark.implicits._
    val rng = new Random(seed * 3371 + 13)
    val cap = 5
    val rows = (0 until nRows).map { j =>
      (s"g${rng.nextInt(8)}", s"key-$seed-$j", j)
    }.toDF("grp", "id", "arr")
    val qd = s"$dir/qt-rows"
    chunkByArrival(rows, "arr", qd, files = 5)
    def once(run: Int): Seq[(String, String)] = {
      val src = spark.readStream.schema(rows.drop("arr").schema)
        .option("maxFilesPerTrigger", "1").parquet(qd)
      val out = runToMemory(
        Streams.quotaPerGroup(src, "grp", "id", cap),
        s"sfuzz_qt_${tag}_${seed}_$run")
        .collect().map(r => (r.getString(0), r.getString(1))).toSeq.sorted
      spark.sql(s"DROP TABLE IF EXISTS sfuzz_qt_${tag}_${seed}_$run")
      out
    }
    val a = once(0)
    val b = once(1)
    val inputKeys = rows.collect().map(r => (r.getString(0), r.getString(1))).toSet
    val groupSizes = rows.groupBy("grp").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val admitted = a.groupBy(_._1).view.mapValues(_.size).toMap
    var bad = 0
    def fail(msg: String): Unit = {
      bad += 1; println(s"[streamfuzz] MISMATCH quota seed=$seed scale=$tag: $msg")
    }
    groupSizes.foreach { case (g, n) =>
      val got = admitted.getOrElse(g, 0)
      if (got != math.min(cap.toLong, n).toInt)
        fail(s"group $g admitted $got of $n (cap $cap)")
    }
    if (!a.forall(inputKeys.contains)) fail("admitted a key not in the input")
    if (a != b) fail(s"replay diverged: ${a.diff(b).take(5)} vs ${b.diff(a).take(5)}")
    bad
  }

  /** sessionSummaries (flatMapGroupsWithState, Update mode): the final
    * per-user running summary must equal the batch count/sum. Values
    * are dyadic so the stream's arrival-order accumulation equals the
    * batch sum exactly; the final emission per user is the one with the
    * maximal (monotone) event count. */
  def sessionSummariesCase(spark: SparkSession, seed: Int, nEvents: Int,
                           dir: String, tag: String): Int = {
    import spark.implicits._
    val rng = new Random(seed * 8209 + 1)
    val rows = (0 until nEvents).map { i =>
      (i.toLong, new java.sql.Timestamp(BASE + i * 1000L), rng.nextInt(10).toLong,
        "e", (rng.nextInt(8001) - 4000) / 4.0, i + rng.nextInt(101) - 50)
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "arr")
    val ud = s"$dir/ss-events"
    chunkByArrival(rows, "arr", ud, files = 5)
    val src = spark.readStream.schema(rows.drop("arr").schema)
      .option("maxFilesPerTrigger", "1").parquet(ud)
      .as[Streams.Event]
    val got = runToMemory(
      Streams.sessionSummaries(src).toDF(), s"sfuzz_ss_${tag}_$seed", mode = "update")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
      .groupBy(_._1).map(_._2.maxBy(_._2)).toSeq.sorted
    spark.sql(s"DROP TABLE IF EXISTS sfuzz_ss_${tag}_$seed")
    val want = rows.groupBy("user_id")
      .agg(F.count(F.lit(1)).cast("int").as("n"), F.sum("value").as("v"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))).toSeq.sorted
    if (got == want) 0 else {
      println(s"[streamfuzz] MISMATCH session_summaries seed=$seed scale=$tag: " +
        s"extra=${got.diff(want).take(5)} missing=${want.diff(got).take(5)}")
      1
    }
  }

  // ===== r18: the last 3 uncovered ops (r17 verdict item 2) =====

  /** The three remaining ingest-path twins in one corpus (r18 — takes
    * StreamFuzz to 16/16 streaming ops):
    *
    *  - `Streams.dedupStream` (the only previously-uncovered STATEFUL
    *    op — `dropDuplicatesWithinWatermark`) vs batch key-distinct.
    *    Duplicate keys carry a key-determined payload, the watermark
    *    horizon spans the whole stream, so the stream must emit EXACTLY
    *    one row per key, the payload must be the key's, and the emitted
    *    event_id must belong to that key's input rows (which arrival
    *    wins inside one micro-batch is deliberately not contractual).
    *  - `Streams.enrichStream` vs the batch first-match lookup: a dim
    *    with DUPLICATE keys (first row per key in frame order must win
    *    — the Lookup.merge contract) and stream keys missing from the
    *    dim (null enrichment).
    *  - `Streams.sampleStream` vs the same `Sampling.hashBp` predicate
    *    in batch: identical survivor sets under replayed/reordered
    *    arrival — the backfill-reproducibility contract. */
  def ingestTwinsCase(spark: SparkSession, seed: Int, nRows: Int,
                      dir: String, tag: String): Int = {
    import spark.implicits._
    val rng = new Random(seed * 27449 + 23)
    val nKeys = math.max(8, nRows / 4)
    val rows = (0 until nRows).map { i =>
      val k = s"k${rng.nextInt(nKeys)}"
      (i.toLong, new java.sql.Timestamp(BASE + i * 1000L), k,
        (math.abs(k.hashCode) % 997).toDouble, i + rng.nextInt(101) - 50)
    }.toDF("event_id", "ts", "key", "v", "arr")
    val rd = s"$dir/in-rows"
    chunkByArrival(rows, "arr", rd, files = 5)
    def src() = spark.readStream.schema(rows.drop("arr").schema)
      .option("maxFilesPerTrigger", "1").parquet(rd)
    val batch = rows.drop("arr").cache()
    var bad = 0
    def fail(name: String, msg: String): Unit = {
      bad += 1
      println(s"[streamfuzz] MISMATCH $name seed=$seed scale=$tag: $msg")
    }
    locally { // dedupStream
      // the "emitted once" assertion below requires the WHOLE ts span
      // (nRows seconds — ts = BASE + i·1000 ms) to sit inside the dedup
      // horizon, or late duplicates legitimately re-emit and the twin
      // goes flaky by construction (r18 ADVICE: the old hardcoded
      // "1 hour" held only while scales capped nRows under 3600)
      val got = runToMemory(
        Streams.dedupStream(src(), "ts", s"${nRows + 60} seconds", Seq("key")),
        s"sfuzz_dd_${tag}_$seed")
        .collect().map(r => (r.getLong(0), r.getString(2), r.getDouble(3))).toSeq
      spark.sql(s"DROP TABLE IF EXISTS sfuzz_dd_${tag}_$seed")
      val wantKV = batch.select("key", "v").distinct().collect()
        .map(r => (r.getString(0), r.getDouble(1))).toSeq.sorted
      val keyIds = batch.select("key", "event_id").collect()
        .map(r => (r.getString(0), r.getLong(1)))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      if (got.map(r => (r._2, r._3)).sorted != wantKV)
        fail("dedup_stream", s"kept (key, v) set != batch distinct: " +
          s"stream ${got.size} rows vs batch ${wantKV.size} keys")
      if (got.map(_._2).distinct.size != got.size)
        fail("dedup_stream", "emitted a key more than once inside the horizon")
      got.find(r => !keyIds.getOrElse(r._2, Set.empty).contains(r._1)).foreach { r =>
        fail("dedup_stream", s"kept row $r carries an event_id from another key")
      }
    }
    locally { // enrichStream
      // dim: ~60% of keys present, each with 1-3 duplicate rows whose
      // attr differs by insertion rank — first row per key must win
      val dimRows = (0 until nKeys).filter(_ % 5 != 4).flatMap { j =>
        (0 to rng.nextInt(3)).map(r => (s"k$j", s"a$j-$r"))
      }
      val dim = dimRows.toDF("key", "attr")
      val got = runToMemory(
        Streams.enrichStream(src(), dim, Seq("key"), Seq("attr"))
          .select("event_id", "attr"),
        s"sfuzz_en_${tag}_$seed")
        .collect().map(r => (r.getLong(0), Option(r.getString(1)).getOrElse(" null")))
        .toSeq.sorted
      spark.sql(s"DROP TABLE IF EXISTS sfuzz_en_${tag}_$seed")
      val firstPer = dimRows.groupBy(_._1).map { case (k, g) => (k, g.head._2) }
      val want = batch.select("event_id", "key").collect()
        .map(r => (r.getLong(0), firstPer.get(r.getString(1)).getOrElse(" null")))
        .toSeq.sorted
      if (got != want)
        fail("enrich_stream", s"extra=${got.diff(want).take(5)} " +
          s"missing=${want.diff(got).take(5)}")
    }
    locally { // sampleStream
      val bp = 3000
      val got = runToMemory(
        Streams.sampleStream(src(), F.col("key"), bp).select("event_id"),
        s"sfuzz_sm_${tag}_$seed")
        .collect().map(_.getLong(0)).toSeq.sorted
      spark.sql(s"DROP TABLE IF EXISTS sfuzz_sm_${tag}_$seed")
      val want = batch
        .filter(graft.pipeline.Sampling.hashBp(F.col("key")) < bp)
        .select("event_id").collect().map(_.getLong(0)).toSeq.sorted
      if (got != want)
        fail("sample_stream", s"extra=${got.diff(want).take(5)} " +
          s"missing=${want.diff(got).take(5)}")
    }
    batch.unpersist()
    bad
  }

  /** Full sweep: `seeds` per twin per scale; returns total mismatches.
    * `only` filters cases by name prefix (debug/bisect). */
  def run(spark: SparkSession, seeds: Range, root: String,
          scales: Seq[(String, Int, Int)], only: Option[String] = None): Int = {
    def rm(p: java.io.File): Unit = {
      if (p.isDirectory) p.listFiles().foreach(rm); p.delete()
    }
    def on(n: String) = only.forall(n.startsWith)
    var bad = 0
    for ((tag, nEvents, nDocs) <- scales; seed <- seeds) {
      val dir = s"$root/$tag-$seed"
      rm(new java.io.File(dir))
      println(s"[streamfuzz] scale=$tag seed=$seed starting (bad so far: $bad)")
      if (on("interval")) bad += intervalJoinCase(spark, seed, nEvents, dir, tag)
      if (on("dedup")) bad += dedupIndexCase(spark, seed, nDocs, dir, tag)
      if (on("contain")) bad += containIndexCase(spark, seed, nDocs, dir, tag)
      if (on("winnow")) bad += winnowIndexCase(spark, seed, nDocs, dir, tag)
      // r17: the remaining stateful/stored-artifact twins
      if (on("window")) bad += windowCountsCase(spark, seed, nEvents, dir, tag)
      if (on("embedding")) bad += embeddingDedupCase(spark, seed, nDocs, dir, tag)
      if (on("stateless")) bad += statelessTwinsCase(spark, seed, nDocs, dir, tag)
      if (on("quota")) bad += quotaCase(spark, seed, math.max(40, nDocs), dir, tag)
      if (on("session")) bad += sessionSummariesCase(spark, seed, math.min(nEvents, 4000), dir, tag)
      // r18: dedupStream / enrichStream / sampleStream — 16/16 ops covered
      if (on("ingest")) bad += ingestTwinsCase(spark, seed, math.max(60, nDocs), dir, tag)
      rm(new java.io.File(dir))
    }
    bad
  }

  def main(args: Array[String]): Unit = {
    val seeds = args.headOption.flatMap(_.toIntOption).getOrElse(6)
    val only = args.collectFirst { case a if a.startsWith("only=") => a.drop(5) }
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val scales = Seq(("1x", 2000, 240), ("10x", 20000, 2400))
    val bad = run(spark, 1 to seeds, "/tmp/streamfuzz", scales, only)
    println(s"[streamfuzz] ${seeds} seeds x ${scales.size} scales x 16 twins: " +
      s"$bad mismatches")
    spark.stop()
    if (bad != 0) sys.exit(1)
  }
}
