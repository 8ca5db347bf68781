package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.{functions => F}
import org.apache.spark.sql.streaming.Trigger

import graft.streaming.Streams

/** Micro-batch performance probe for the stateful streaming twins (r12
  * verdict task 4): the twins are spec-complete but carried no
  * throughput or state-size evidence. This drives the two stateful
  * operators — exact dedup (`dropDuplicatesWithinWatermark` state) and
  * gap sessionization (`session_window` state) — over a time-ordered
  * chunked copy of the events table at two scales, one file per
  * micro-batch (Trigger.AvailableNow), and prints per batch: input
  * rows, rows/s, state rows TOTAL, state memory, and the watermark.
  *
  * The bounded-state claim is the point: because batches arrive in
  * event-time order, the watermark advances every batch and evicts
  * expired keys/sessions — state rows must plateau (dedup: keys within
  * the horizon; sessions: OPEN sessions only), not grow with the
  * stream. A flat `stateRows` column across batches at 10× the input IS
  * the evidence; a monotone ramp would flag an eviction bug.
  *
  * {{{ sbt "runMain graft.StreamProbe" }}}   // sf0.1 and the 10× corpus
  */
object StreamProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")}]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val scales: Seq[(String, String)] = Seq(
      "sf0.1" -> "/root/testdata/sf0.1",
      "100x" -> "/tmp/sfprobe").filter { case (_, d) =>
      new java.io.File(s"$d/events.parquet").exists()
    }

    def drive(name: String, out: DataFrame, mode: String): Unit = {
      val ckpt = s"/tmp/streamprobe/ckpt-$name-${System.nanoTime()}"
      val q = out.writeStream.format("noop")
        .option("checkpointLocation", ckpt)
        .outputMode(mode)
        .trigger(Trigger.AvailableNow())
        .start()
      println(s"[stream] === $name ===")
      println(f"${"batch"}%5s ${"rows"}%9s ${"rows/s"}%9s ${"stateRows"}%10s ${"stateMB"}%8s  watermark")
      var seen = Set.empty[Long]
      def report(p: org.apache.spark.sql.streaming.StreamingQueryProgress): Unit =
        if (p != null && !seen.contains(p.batchId) && p.numInputRows > 0) {
          seen += p.batchId
          val so = p.stateOperators
          val stateRows = if (so.nonEmpty) so.map(_.numRowsTotal).sum else 0L
          val stateMem = if (so.nonEmpty) so.map(_.memoryUsedBytes).sum else 0L
          val durS = p.durationMs.getOrDefault("triggerExecution", 1L).toDouble / 1000.0
          println(f"${p.batchId}%5d ${p.numInputRows}%9d ${(p.numInputRows / durS).toLong}%9d " +
            f"$stateRows%10d ${stateMem / 1024.0 / 1024.0}%8.1f  ${p.eventTime.get("watermark")}")
        }
      while (q.isActive) { report(q.lastProgress); Thread.sleep(200) }
      q.awaitTermination()
      // drain the tail of progress events published after stop
      Option(q.recentProgress).foreach(_.foreach(report))
    }

    for ((tag, dir) <- scales) {
      // time-ordered chunking: 20 ts-range buckets, written one at a
      // time and MOVED into a flat dir with ascending names AND mtimes —
      // FileStreamSource orders by modification time, and a bulk write
      // leaves near-identical mtimes whose tie-break scrambles event-time
      // order (first probe run: the watermark froze for 13 batches, so
      // most input arrived "late" and the state plateau measured
      // late-drop, not eviction)
      val chunked = s"/tmp/streamprobe/$tag/events"
      if (!new java.io.File(chunked).exists()) {
        new java.io.File(chunked).mkdirs()
        val ev = Tables.events(spark, dir)
        val withB = ev.withColumn("__b",
          F.ntile(20).over(org.apache.spark.sql.expressions.Window.orderBy("ts")))
        withB.cache()
        for (b <- 1 to 20) {
          val tmpd = s"/tmp/streamprobe/$tag/tmp-$b"
          withB.filter(F.col("__b") === b).drop("__b")
            .coalesce(1).write.mode("overwrite").parquet(tmpd)
          val part = new java.io.File(tmpd).listFiles()
            .find(_.getName.endsWith(".parquet")).get
          val dst = new java.io.File(chunked, f"f$b%03d.parquet")
          java.nio.file.Files.move(part.toPath, dst.toPath)
          dst.setLastModified(1700000000000L + b * 10000L)
        }
        withB.unpersist()
      }
      val schema = spark.read.parquet(chunked).schema
      def src: DataFrame = Tables.normalizeEventTs(
        spark.readStream.schema(schema)
          .option("maxFilesPerTrigger", "1").parquet(chunked))

      // exact dedup: content key within a 2-hour horizon — state is the
      // distinct keys younger than the watermark
      drive(s"dedup@$tag",
        Streams.dedupStream(src, "ts", "2 hours", Seq("user_id", "event_type", "value")),
        "append")
      // gap sessionization: 30-minute gaps, state = OPEN sessions
      drive(s"sessionize@$tag",
        Streams.sessionCounts(src, "30 minutes", "2 hours", "user_id"),
        "append")
      // stream-stream interval join (r13 verdict task 8): the largest
      // state surface of the twins — BOTH sides buffer rows within the
      // watermark horizon per key, so state must plateau at
      // O(keys × lookback-density), never grow with the stream. Sides
      // split by event_id parity (the ×N copy shift is even, so the
      // split stays ~50/50 at every factor).
      val srcR = src.filter(F.col("event_id") % 2 =!= 0)
        .select(F.col("event_id").as("r_event_id"), F.col("ts").as("rts"),
          F.col("user_id"), F.col("value").as("r_value"))
      drive(s"interval_join@$tag",
        Streams.intervalJoin(src.filter(F.col("event_id") % 2 === 0), srcR,
          "user_id", "ts", "rts", lookback = "10 minutes", watermark = "1 hour"),
        "append")
    }

    // near-dup dedup against a STORED LSH index (r13 verdict task 8):
    // arrivals stream against the static base-corpus index; state is the
    // emitted-pair dedup within the watermark horizon. The stream side
    // scales with the factor, the index side stays the accumulated store
    // (the operator's contract) — documents carry no event time, so a
    // synthetic second-per-doc timestamp drives the watermark.
    for ((tag, dir) <- scales) {
      val docsChunked = s"/tmp/streamprobe/$tag/docs"
      if (!new java.io.File(docsChunked).exists()) {
        new java.io.File(docsChunked).mkdirs()
        val docs = spark.read.parquet(s"$dir/documents.parquet")
          .select(F.col("doc_id"), F.col("text"))
          .withColumn("ts", F.timestamp_seconds(F.lit(1704067200L) + F.col("doc_id")))
        val withB = docs.withColumn("__b",
          F.ntile(20).over(org.apache.spark.sql.expressions.Window.orderBy("doc_id")))
        withB.cache()
        for (b <- 1 to 20) {
          val tmpd = s"/tmp/streamprobe/$tag/dtmp-$b"
          withB.filter(F.col("__b") === b).drop("__b")
            .coalesce(1).write.mode("overwrite").parquet(tmpd)
          val part = new java.io.File(tmpd).listFiles()
            .find(_.getName.endsWith(".parquet")).get
          val dst = new java.io.File(docsChunked, f"f$b%03d.parquet")
          java.nio.file.Files.move(part.toPath, dst.toPath)
          dst.setLastModified(1700000000000L + b * 10000L)
        }
        withB.unpersist()
      }
      val dschema = spark.read.parquet(docsChunked).schema
      val index = graft.pipeline.Dedup.lshIndex(
        spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
          .select(F.col("doc_id"), F.col("text")),
        "doc_id", "text")
      val dsrc = spark.readStream.schema(dschema)
        .option("maxFilesPerTrigger", "1").parquet(docsChunked)
      drive(s"dedup_vs_index@$tag",
        Streams.dedupAgainstIndex(dsrc, index, "doc_id", "ts", "text", "30 minutes"),
        "append")
    }
    spark.stop()
  }
}
