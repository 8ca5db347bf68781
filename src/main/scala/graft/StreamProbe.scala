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
      "100x" -> "/tmp/sfprobe100").filter { case (_, d) =>
      new java.io.File(s"$d/events.parquet").exists()
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

      def drive(name: String, out: DataFrame, mode: String): Unit = {
        val ckpt = s"/tmp/streamprobe/$tag/ckpt-$name-${System.nanoTime()}"
        val q = out.writeStream.format("noop")
          .option("checkpointLocation", ckpt)
          .outputMode(mode)
          .trigger(Trigger.AvailableNow())
          .start()
        println(s"[stream] === $name @ $tag ===")
        println(f"${"batch"}%5s ${"rows"}%9s ${"rows/s"}%9s ${"stateRows"}%10s ${"stateMB"}%8s  watermark")
        var seen = Set.empty[Long]
        while (q.isActive) {
          val p = q.lastProgress
          if (p != null && !seen.contains(p.batchId) && p.numInputRows > 0) {
            seen += p.batchId
            val so = p.stateOperators
            val stateRows = if (so.nonEmpty) so.map(_.numRowsTotal).sum else 0L
            val stateMem = if (so.nonEmpty) so.map(_.memoryUsedBytes).sum else 0L
            val durS = p.durationMs.getOrDefault("triggerExecution", 1L).toDouble / 1000.0
            println(f"${p.batchId}%5d ${p.numInputRows}%9d ${(p.numInputRows / durS).toLong}%9d " +
              f"$stateRows%10d ${stateMem / 1024.0 / 1024.0}%8.1f  ${p.eventTime.get("watermark")}")
          }
          Thread.sleep(200)
        }
        q.awaitTermination()
        // drain the tail of progress events published after stop
        Option(q.recentProgress).foreach(_.foreach { p =>
          if (!seen.contains(p.batchId) && p.numInputRows > 0) {
            seen += p.batchId
            val so = p.stateOperators
            val stateRows = if (so.nonEmpty) so.map(_.numRowsTotal).sum else 0L
            val stateMem = if (so.nonEmpty) so.map(_.memoryUsedBytes).sum else 0L
            val durS = p.durationMs.getOrDefault("triggerExecution", 1L).toDouble / 1000.0
            println(f"${p.batchId}%5d ${p.numInputRows}%9d ${(p.numInputRows / durS).toLong}%9d " +
              f"$stateRows%10d ${stateMem / 1024.0 / 1024.0}%8.1f  ${p.eventTime.get("watermark")}")
          }
        })
      }

      // exact dedup: content key within a 2-hour horizon — state is the
      // distinct keys younger than the watermark
      drive("dedup",
        Streams.dedupStream(src, "ts", "2 hours", Seq("user_id", "event_type", "value")),
        "append")
      // gap sessionization: 30-minute gaps, state = OPEN sessions
      drive("sessionize",
        Streams.sessionCounts(src, "30 minutes", "2 hours", "user_id"),
        "append")
    }
    spark.stop()
  }
}
