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
  * Covered twins (the two with state evidence, per the r15 verdict):
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

  private def runToMemory(out: DataFrame, name: String): DataFrame = {
    val spark = out.sparkSession
    val q = out.writeStream.outputMode("append")
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

  /** Full sweep: `seeds` per twin per scale; returns total mismatches. */
  def run(spark: SparkSession, seeds: Range, root: String,
          scales: Seq[(String, Int, Int)]): Int = {
    def rm(p: java.io.File): Unit = {
      if (p.isDirectory) p.listFiles().foreach(rm); p.delete()
    }
    var bad = 0
    for ((tag, nEvents, nDocs) <- scales; seed <- seeds) {
      val dir = s"$root/$tag-$seed"
      rm(new java.io.File(dir))
      bad += intervalJoinCase(spark, seed, nEvents, dir, tag)
      bad += dedupIndexCase(spark, seed, nDocs, dir, tag)
      bad += containIndexCase(spark, seed, nDocs, dir, tag)
      rm(new java.io.File(dir))
    }
    bad
  }

  def main(args: Array[String]): Unit = {
    val seeds = args.headOption.flatMap(_.toIntOption).getOrElse(6)
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val scales = Seq(("1x", 2000, 240), ("10x", 20000, 2400))
    val bad = run(spark, 1 to seeds, "/tmp/streamfuzz", scales)
    println(s"[streamfuzz] ${seeds} seeds x ${scales.size} scales x 3 twins: " +
      s"$bad mismatches")
    spark.stop()
    if (bad != 0) sys.exit(1)
  }
}
