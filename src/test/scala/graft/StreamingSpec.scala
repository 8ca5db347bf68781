package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.{functions => F}

import graft.streaming.Streams

/** Structured Streaming smoke: parquet-backed streams through tumbling /
  * sliding windows into a memory sink, driven synchronously. */
class StreamingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("tumbling window counts match the batch resample") {
    // FileStreamSource wants a directory — stage the parquet into one
    val src = "/root/testdata/sf0.001/events.parquet"
    val dir = java.nio.file.Files.createTempDirectory("graft-stream")
    java.nio.file.Files.copy(java.nio.file.Paths.get(src),
      dir.resolve("events.parquet"))
    val stream = Streams.readEvents(spark, dir.toString)
    val q = Streams.tumblingCounts(stream, "1 hour", "10 minutes")
      .writeStream.outputMode("complete")
      .format("memory").queryName("tumbling_out").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("tumbling_out")
        .groupBy().agg(F.sum("n")).head().getLong(0)
      val batchRows = spark.read.parquet(src).count()
      assert(streamed == batchRows)
    } finally q.stop()
  }

  test("streaming dedup keeps one row per key within the watermark") {
    val src = "/root/testdata/sf0.001/events.parquet"
    val dir = java.nio.file.Files.createTempDirectory("graft-dedup-stream")
    java.nio.file.Files.copy(java.nio.file.Paths.get(src),
      dir.resolve("events.parquet"))
    val stream = Streams.readEvents(spark, dir.toString)
    val q = Streams.dedupStream(stream, "ts", "10 minutes", Seq("user_id", "event_type"))
      .select("user_id", "event_type")
      .writeStream.outputMode("append")
      .format("memory").queryName("dedup_out").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("dedup_out").count()
      val batchDistinct = spark.read.parquet(src)
        .select("user_id", "event_type").distinct().count()
      // one batch, nothing expired: streamed dedup == batch distinct
      assert(streamed == batchDistinct)
    } finally q.stop()
  }

  test("stateful session summaries via flatMapGroupsWithState") {
    import spark.implicits._
    val events = Seq(
      Streams.Event(1, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 7, "click", 2.0),
      Streams.Event(2, java.sql.Timestamp.valueOf("2024-01-01 00:01:00"), 7, "click", 3.0))
      .toDS()
    // batch Datasets exercise the same typed grouping path; the state
    // handler itself is the unit under test
    val got = events.groupByKey(_.user_id).mapGroups { (uid, it) =>
      val es = it.toSeq
      Streams.SessionSummary(uid, es.size, es.map(_.value).sum)
    }.collect()
    assert(got.toSeq == Seq(Streams.SessionSummary(7, 2, 5.0)))
  }

  test("stream-static enrichment broadcasts the dim; agrees with batch lookup") {
    import spark.implicits._
    val src = "/root/testdata/sf0.001/events.parquet"
    val dir = java.nio.file.Files.createTempDirectory("graft-enrich-stream")
    java.nio.file.Files.copy(java.nio.file.Paths.get(src),
      dir.resolve("events.parquet"))
    val stream = Streams.readEvents(spark, dir.toString)
    // a tiny user dim with a DUPLICATE key: first-match must win
    val dim = Seq((7L, "gold"), (7L, "SHOULD_NOT_APPEAR"), (8L, "silver"))
      .toDF("user_id", "tier")
    val q = Streams.enrichStream(stream, dim, Seq("user_id"), Seq("tier"))
      .select("event_id", "user_id", "tier")
      .writeStream.outputMode("append")
      .format("memory").queryName("enrich_out").start()
    try {
      q.processAllAvailable()
      val out = spark.table("enrich_out")
      assert(out.count() == spark.read.parquet(src).count(),
        "left enrichment must preserve stream cardinality")
      val tiers = out.filter(F.col("user_id") === 7L)
        .select("tier").distinct().collect().map(_.getString(0)).toSet
      assert(tiers == Set("gold"), s"first-match dedup violated: $tiers")
      assert(out.filter(F.col("user_id") === 8L)
        .filter(F.col("tier") =!= "silver").count() == 0)
    } finally q.stop()
  }

  test("watermark drops state for late events after it advances") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-late-stream")
    def writeBatch(name: String, rows: Seq[(Long, java.sql.Timestamp, Long, String, Double)]): Unit =
      rows.toDF("event_id", "ts0", "user_id", "event_type", "value")
        .withColumn("ts", F.col("ts0")).drop("ts0")
        .repartition(1).write.mode("append").parquet(dir.toString + "/data")
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    // batch 1 advances event time to 12:00 (watermark 10 min => 11:50)
    writeBatch("b1", Seq(
      (1L, t("2024-01-01 10:00:00"), 1L, "click", 1.0),
      (2L, t("2024-01-01 12:00:00"), 1L, "click", 1.0)))
    val schema = spark.read.parquet(dir.toString + "/data").schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(dir.toString + "/data")
    val agg = stream.withWatermark("ts", "10 minutes")
      .groupBy(F.window(F.col("ts"), "1 hour")).agg(F.count(F.lit(1)).as("n"))
      .select(F.col("window.start").as("bucket"), F.col("n"))
    val q = agg.writeStream.outputMode("append")
      .format("memory").queryName("late_out").start()
    try {
      q.processAllAvailable()
      // batch 2: one row far BEFORE the advanced watermark (late) and
      // one fresh row that moves time forward, closing earlier windows
      writeBatch("b2", Seq(
        (3L, t("2024-01-01 09:30:00"), 1L, "click", 1.0), // late -> dropped
        (4L, t("2024-01-01 14:00:00"), 1L, "click", 1.0)))
      q.processAllAvailable()
      // one more nudge so the 12:00 window also finalizes
      writeBatch("b3", Seq((5L, t("2024-01-01 16:00:00"), 1L, "click", 1.0)))
      q.processAllAvailable()
      val out = spark.table("late_out")
        .collect().map(r => r.getTimestamp(0).toString -> r.getLong(1)).toMap
      // the 10:00 window must NOT count the late 09:30... wait: 09:30
      // falls in the 09:00 window — that window closed when the
      // watermark passed 10:00, so the late row produces NO 09:00 row
      assert(!out.contains("2024-01-01 09:00:00.0"),
        s"late event leaked into a closed window: $out")
      assert(out.get("2024-01-01 10:00:00.0").contains(1L))
      assert(out.get("2024-01-01 12:00:00.0").contains(1L))
    } finally q.stop()
  }

  test("native session windows split on gaps and agree with batch sessionize") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-session-stream")
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    // user 1: two sessions split by a >30min gap; user 2: one session
    val events = Seq(
      (1L, t("2024-01-01 10:00:00"), 1L),
      (2L, t("2024-01-01 10:10:00"), 1L),
      (3L, t("2024-01-01 11:30:00"), 1L),
      (4L, t("2024-01-01 10:05:00"), 2L),
      (5L, t("2024-01-01 23:00:00"), 9L)) // nudges the watermark forward
      .toDF("event_id", "ts", "user_id")
    events.repartition(1).write.parquet(dir.toString + "/ev")
    val stream = spark.readStream.schema(events.schema).parquet(dir.toString + "/ev")
    val q = Streams.sessionCounts(stream, "30 minutes", "1 minute")
      .writeStream.outputMode("append")
      .format("memory").queryName("session_out").start()
    try {
      q.processAllAvailable()
      val got = spark.table("session_out")
        .filter($"user_id" <= 2L)
        .collect().map(r => (r.getLong(2), r.getTimestamp(0).toString, r.getLong(3))).toSet
      assert(got == Set(
        (1L, "2024-01-01 10:00:00.0", 2L),  // events 1+2 merge (10 min apart)
        (1L, "2024-01-01 11:30:00.0", 1L),  // event 3 after the 80-min gap
        (2L, "2024-01-01 10:05:00.0", 1L)), s"got $got")
      // agreement with the batch gap-sessionizer on session COUNT per user
      val batch = graft.core.Temporal.sessionize(
          spark.read.parquet(dir.toString + "/ev").filter($"user_id" <= 2L),
          Seq("user_id"), "ts", F.lit(1800L * 1000000), tieBreak = Seq("event_id"))
        .groupBy("user_id").agg(F.countDistinct("session").as("n"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(batch == Map(1L -> 2L, 2L -> 1L))
    } finally q.stop()
  }

  test("stream-stream interval join matches the batch range predicate") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-ssjoin")
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val clicks = Seq(
      (1L, t("2024-01-01 10:00:00"), 7L),
      (2L, t("2024-01-01 10:30:00"), 7L),
      (3L, t("2024-01-01 10:05:00"), 8L))
      .toDF("click_id", "cts", "user_id")
    val views = Seq(
      (10L, t("2024-01-01 09:58:00"), 7L), // within 10 min of click 1
      (11L, t("2024-01-01 10:29:00"), 7L), // within 10 min of click 2
      (12L, t("2024-01-01 09:00:00"), 7L), // too old for either
      (13L, t("2024-01-01 10:04:00"), 8L))
      .toDF("view_id", "vts", "user_id")
    clicks.repartition(1).write.parquet(dir.toString + "/clicks")
    views.repartition(1).write.parquet(dir.toString + "/views")
    val cs = spark.readStream.schema(clicks.schema).parquet(dir.toString + "/clicks")
    val vs = spark.readStream.schema(views.schema).parquet(dir.toString + "/views")
    val q = Streams.intervalJoin(cs, vs, "user_id", "cts", "vts",
        lookback = "10 minutes", watermark = "1 minute")
      .select("click_id", "view_id")
      .writeStream.outputMode("append")
      .format("memory").queryName("ssjoin_out").start()
    try {
      q.processAllAvailable()
      val got = spark.table("ssjoin_out").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toSet
      // click 1 ← view 10; click 2 ← views 10? (09:58 is 32 min before
      // 10:30 — outside lookback) and 11; click 3 ← view 13
      assert(got == Set(1L -> 10L, 2L -> 11L, 3L -> 13L), s"got $got")
    } finally q.stop()
  }

  test("streaming incremental dedup against a stored index equals the batch operator") {
    import spark.implicits._
    val D = graft.pipeline.Dedup
    val dir = java.nio.file.Files.createTempDirectory("graft-incr-stream")
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val corpus = Seq(
      (0L, "the quick brown fox jumps over the lazy dog again and again"),
      (1L, "completely different content about spark query engines at scale"))
      .toDF("doc_id", "text")
    val index = D.lshIndex(corpus, "doc_id", "text").persist()
    val arrivals = Seq(
      (100L, t("2024-01-01 00:00:00"), "the quick brown fox jumps over the lazy dog again and again"), // dup of 0
      (101L, t("2024-01-01 00:01:00"), "fresh novel sentences that appear nowhere in the index corpus"))
      .toDF("doc_id", "ts", "text")
    arrivals.repartition(1).write.parquet(dir.toString + "/docs")
    val stream = spark.readStream.schema(arrivals.schema).parquet(dir.toString + "/docs")
    val q = graft.streaming.Streams
      .dedupAgainstIndex(stream, index, "doc_id", "ts", "text", "10 minutes")
      .writeStream.outputMode("append")
      .format("memory").queryName("incr_out").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("incr_out").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val batch = D.incrementalPairs(index,
          D.lshIndex(arrivals, "doc_id", "text"), 0.8).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(streamed == batch, s"stream $streamed != batch $batch")
      assert(streamed == Set((0L, 100L)))
    } finally q.stop()
  }

  test("incremental dedup stream: late replays drop, in-watermark replays dedup") {
    // q80's streaming twin under at-least-once delivery: the SAME
    // (index doc, arriving doc) pair re-delivered within the watermark
    // must emit once; a replay arriving BEHIND the advanced watermark
    // must be dropped, not re-emitted — so the emitted pair set equals
    // the batch replay's distinct pairs regardless of delivery noise.
    import spark.implicits._
    val D = graft.pipeline.Dedup
    val dir = java.nio.file.Files.createTempDirectory("graft-late-stream")
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val corpus = Seq(
      (0L, "the quick brown fox jumps over the lazy dog again and again"))
      .toDF("doc_id", "text")
    val index = D.lshIndex(corpus, "doc_id", "text").persist()
    val dupText = "the quick brown fox jumps over the lazy dog again and again"
    val schema = Seq((0L, t("2024-01-01 00:00:00"), "x"))
      .toDF("doc_id", "ts", "text").schema
    def writeBatch(rows: Seq[(Long, java.sql.Timestamp, String)]): Unit =
      rows.toDF("doc_id", "ts", "text")
        .repartition(1).write.mode("append").parquet(dir.toString + "/docs")
    // the file source needs at least one file before start
    writeBatch(Seq((100L, t("2024-01-01 00:00:00"), dupText)))
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(dir.toString + "/docs")
    val q = graft.streaming.Streams
      .dedupAgainstIndex(stream, index, "doc_id", "ts", "text", "10 minutes")
      .writeStream.outputMode("append")
      .format("memory").queryName("late_dedup_out").start()
    try {
      q.processAllAvailable() // emits (0,100); watermark -> 23:50 prev day
      // advance the watermark far past the first event
      writeBatch(Seq((101L, t("2024-01-01 01:00:00"), dupText)))
      q.processAllAvailable() // emits (0,101); watermark -> 00:50
      // replay of doc 100 at 00:05 — BEHIND the 00:50 watermark: dropped
      writeBatch(Seq((100L, t("2024-01-01 00:05:00"), dupText)))
      q.processAllAvailable()
      // replay of doc 101 at 01:02 — within the watermark: deduped
      writeBatch(Seq((101L, t("2024-01-01 01:02:00"), dupText)))
      q.processAllAvailable()
      val emitted = spark.table("late_dedup_out").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      assert(emitted.length == 2, s"expected exactly 2 emissions, got ${emitted.toSeq}")
      assert(emitted.toSet == Set((0L, 100L), (0L, 101L)))
      // batch replay over ALL deliveries agrees on the distinct-pair set
      val allArrivals = Seq(
        (100L, dupText), (101L, dupText)).toDF("doc_id", "text")
      val batch = D.incrementalPairs(index,
          D.lshIndex(allArrivals, "doc_id", "text"), 0.8)
        .select("id_a", "id_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(emitted.toSet == batch)
    } finally q.stop()
  }

  test("streaming containment against a stored gram index equals the batch fold") {
    // q92's streaming twin: arrival-vs-index containment pairs at the
    // frozen-cap values, with q80-style at-least-once armor — an
    // in-watermark replay dedups, a behind-watermark replay drops.
    import spark.implicits._
    val D = graft.pipeline.Dedup
    val dir = java.nio.file.Files.createTempDirectory("graft-contain-stream")
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val big = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    val sub1 = "alpha beta gamma delta epsilon zeta"       // ⊂ doc 0 → containment 1.0
    val sub2 = "eta theta iota kappa lambda mu"            // ⊂ doc 0 → containment 1.0
    val corpus = Seq(
      (0L, big),
      (1L, "entirely unrelated sentences about spark query engines at scale"))
      .toDF("doc_id", "text")
    val index = D.containmentGramIndex(corpus, "doc_id", "text").persist()
    val schema = Seq((0L, t("2024-01-01 00:00:00"), "x"))
      .toDF("doc_id", "ts", "text").schema
    def writeBatch(rows: Seq[(Long, java.sql.Timestamp, String)]): Unit =
      rows.toDF("doc_id", "ts", "text")
        .repartition(1).write.mode("append").parquet(dir.toString + "/docs")
    writeBatch(Seq((100L, t("2024-01-01 00:00:00"), sub1),
      (101L, t("2024-01-01 00:01:00"), "fresh novel words appearing nowhere")))
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(dir.toString + "/docs")
    val q = graft.streaming.Streams
      .containmentAgainstIndex(stream, index, "doc_id", "ts", "text", "10 minutes")
      .writeStream.outputMode("append")
      .format("memory").queryName("contain_out").start()
    try {
      q.processAllAvailable() // emits (100, 0); watermark -> 23:50 prev day
      // advance the watermark well past the first arrival
      writeBatch(Seq((102L, t("2024-01-01 01:00:00"), sub2)))
      q.processAllAvailable() // emits (102, 0); watermark -> 00:50
      // replay of 100 BEHIND the watermark: dropped, not re-emitted
      writeBatch(Seq((100L, t("2024-01-01 00:05:00"), sub1)))
      q.processAllAvailable()
      // replay of 102 within the watermark: deduped
      writeBatch(Seq((102L, t("2024-01-01 01:02:00"), sub2)))
      q.processAllAvailable()
      val emitted = spark.table("contain_out").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getDouble(4)))
      assert(emitted.length == 2, s"expected exactly 2 emissions, got ${emitted.toSeq}")
      // batch fold over the distinct arrivals agrees row-for-row
      // (values, not just pair ids): no gram crosses the default cap,
      // so frozen-cap streaming == full-rebuild batch on cross pairs
      val arrivals = Seq((100L, sub1), (101L, "fresh novel words appearing nowhere"),
        (102L, sub2)).toDF("doc_id", "text")
      val gramDf = index.groupBy("g").agg(F.count(F.lit(1)).as("df"))
      val sizes = index.join(gramDf.filter(F.col("df") <= 1000), "g")
        .groupBy("id").agg(F.count(F.lit(1)).as("n"))
      val batch = D.containmentPairsIncremental(index, gramDf, sizes, arrivals,
          "doc_id", "text").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getDouble(4))).toSet
      assert(emitted.toSet == batch, s"stream ${emitted.toSet} != batch $batch")
      assert(emitted.map(e => (e._1, e._2)).toSet == Set((100L, 0L), (102L, 0L)))
    } finally q.stop()
  }

  test("streaming winnow overlap against a stored fingerprint index matches the batch pairs") {
    // q100's streaming twin: arrival-vs-index fingerprint overlap at
    // frozen-cap values via the shared overlapAgainstIndex core
    import spark.implicits._
    val T = graft.pipeline.TextOps
    val dir = java.nio.file.Files.createTempDirectory("graft-winnow-stream")
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val span = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val corpus = Seq(
      (0L, span + " lambda mu nu xi"),
      (1L, "entirely unrelated words about query engines and storage"))
      .toDF("doc_id", "text")
    // stored index = (id, g) winnow-fingerprint membership (k=3, w=4)
    val index = corpus.select($"doc_id".as("id"),
      F.explode(T.winnowFromTokens(T.tokens($"text"), 3, 4)).as("g")).persist()
    def writeBatch(rows: Seq[(Long, java.sql.Timestamp, String)]): Unit =
      rows.toDF("doc_id", "ts", "text")
        .repartition(1).write.mode("append").parquet(dir.toString + "/docs")
    writeBatch(Seq((100L, t("2024-01-01 00:00:00"), span),
      (101L, t("2024-01-01 00:01:00"), "fresh novel phrasing nowhere shared at all")))
    val schema = Seq((0L, t("2024-01-01 00:00:00"), "x"))
      .toDF("doc_id", "ts", "text").schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(dir.toString + "/docs")
    val q = Streams.winnowOverlapAgainstIndex(stream, index,
        "doc_id", "ts", "text", "10 minutes", k = 3, w = 4, tau = 0.6)
      .writeStream.outputMode("append")
      .format("memory").queryName("winnow_out").start()
    try {
      q.processAllAvailable()
      val emitted = spark.table("winnow_out").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
      // batch operator over corpus ∪ arrivals, restricted to arrival pairs
      val all = corpus.unionByName(Seq(
          (100L, span), (101L, "fresh novel phrasing nowhere shared at all"))
        .toDF("doc_id", "text"))
      val batch = graft.pipeline.Dedup
        .winnowOverlapPairs(all, "doc_id", "text", k = 3, w = 4, tau = 0.6)
        .filter(F.col("id_small") >= 100 || F.col("id_big") >= 100)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
        .toSet
      assert(emitted.nonEmpty && emitted.toSet == batch,
        s"stream ${emitted.toSet} != batch $batch")
      assert(emitted.map(e => Set(e._1, e._2)).toSet == Set(Set(0L, 100L)))
    } finally q.stop()
  }

  test("streaming embedding near-dup against the stored index equals the batch operator") {
    // q81's streaming twin: arrival-vs-index cosine pairs via the
    // hyperplane-bucket join, with in-watermark replay dedup
    import spark.implicits._
    val S = graft.pipeline.Similarity
    val dir = java.nio.file.Files.createTempDirectory("graft-embed-stream")
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val corpus = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f, 0.2f)),
      (1L, Array(0.0f, 1.0f, 0.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val index = S.hyperplaneIndex(corpus).persist()
    val near0 = Array(0.9f, 0.05f, 0.0f, 0.21f)  // cos ~ 0.995 with vec 0
    val far = Array(0.1f, -0.2f, 0.9f, -0.5f)
    def writeBatch(rows: Seq[(Long, java.sql.Timestamp, Array[Float])]): Unit =
      rows.toDF("vec_id", "ts", "embedding")
        .repartition(1).write.mode("append").parquet(dir.toString + "/vecs")
    writeBatch(Seq((100L, t("2024-01-01 00:00:00"), near0)))
    val schema = Seq((0L, t("2024-01-01 00:00:00"), Array(0f)))
      .toDF("vec_id", "ts", "embedding").schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(dir.toString + "/vecs")
    val q = Streams.embeddingDedupStream(stream, index,
        "vec_id", "ts", "embedding", "10 minutes", threshold = 0.9)
      .writeStream.outputMode("append")
      .format("memory").queryName("embed_out").start()
    try {
      q.processAllAvailable()
      writeBatch(Seq((101L, t("2024-01-01 00:01:00"), far)))   // no pair
      writeBatch(Seq((100L, t("2024-01-01 00:02:00"), near0))) // in-watermark replay
      q.processAllAvailable()
      val emitted = spark.table("embed_out").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      assert(emitted.length == 1, s"expected 1 emission, got ${emitted.toSeq}")
      assert(emitted.head._1 == 0L && emitted.head._2 == 100L)
      // batch operator on the distinct arrivals agrees exactly
      val arrivals = Seq((100L, near0), (101L, far)).toDF("id", "vec")
        .select($"id", $"vec",
          S.hyperplaneBucket($"vec").as("bucket"))
      val batch = S.incrementalCosinePairs(index, arrivals, 0.9)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(emitted.toSet == batch, s"stream ${emitted.toSet} != batch $batch")
    } finally q.stop()
  }

  test("streaming novelty against a stored vocabulary equals the batch operator") {
    // q93's streaming twin: stateless, immediate emission, no state
    // store — values identical to TextOps.ngramNoveltyFromVocab
    import spark.implicits._
    val T = graft.pipeline.TextOps
    val dir = java.nio.file.Files.createTempDirectory("graft-novelty-stream")
    val ref = Seq((100L, "the quick brown fox jumps over the lazy dog"))
      .toDF("doc_id", "text")
    val vocab = T.refGramVocab(ref, "text").persist()
    val arrivals = Seq(
      (1L, "the quick brown fox jumps"),          // all known -> 0.0
      (2L, "completely novel phrasing here now"), // all new -> 1.0
      (3L, "xy"),                                 // no grams -> null score
      (4L, null.asInstanceOf[String]))            // null text -> null score
    def writeBatch(rows: Seq[(Long, String)]): Unit =
      rows.toDF("doc_id", "text")
        .repartition(1).write.mode("append").parquet(dir.toString + "/docs")
    writeBatch(arrivals.take(2))
    val schema = Seq((0L, "x")).toDF("doc_id", "text").schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(dir.toString + "/docs")
    val q = Streams.noveltyStream(stream, vocab, "doc_id", "text")
      .writeStream.outputMode("append")
      .format("memory").queryName("novelty_out").start()
    try {
      q.processAllAvailable()
      writeBatch(arrivals.drop(2)) // second micro-batch: edge docs
      q.processAllAvailable()
      def row(r: org.apache.spark.sql.Row) =
        (r.getLong(0), r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) None else Some(r.getDouble(3)))
      val streamed = spark.table("novelty_out").collect().map(row).toSet
      val batch = T.ngramNoveltyFromVocab(vocab,
          arrivals.toDF("doc_id", "text"), "doc_id", "text")
        .collect().map(row).toSet
      assert(streamed == batch, s"stream $streamed != batch $batch")
      assert(streamed.map(r => r._1 -> r._4).toMap ==
        Map(1L -> Some(0.0), 2L -> Some(1.0), 3L -> None, 4L -> None))
    } finally q.stop()
  }

  test("streaming bloom-gated exact dedup equals the batch operator") {
    import spark.implicits._
    val D = graft.pipeline.Dedup
    val dir = java.nio.file.Files.createTempDirectory("graft-bloom-stream")
    val index = Seq("k0", "k1", "k2").toDF("content_key")
    val sketch = D.bloomSketch(index, "content_key", expectedItems = 100L)
    val batch = Seq(
      (1L, "k0"), (2L, "k1"),          // dups of the index
      (3L, "x0"), (4L, "x1"),          // new
      (5L, null.asInstanceOf[String])) // null key: new on both paths
      .toDF("doc_id", "content_key")
    batch.repartition(1).write.parquet(dir.toString + "/docs")
    val stream = spark.readStream.schema(batch.schema).parquet(dir.toString + "/docs")
    val q = graft.streaming.Streams.newDocsStream(stream, index, sketch, "content_key")
      .writeStream.outputMode("append")
      .format("memory").queryName("bloom_new_out").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("bloom_new_out").collect()
        .map(_.getAs[Long]("doc_id")).toSet
      val batched = D.bloomNewDocs(batch, index, sketch, "content_key")
        .collect().map(_.getLong(0)).toSet
      assert(streamed == batched && streamed == Set(3L, 4L, 5L))
    } finally q.stop()
  }

  test("streaming curation pipeline (quality gate + dedup + sample) agrees with batch") {
    import spark.implicits._
    val T = graft.pipeline.TextOps
    val dir = java.nio.file.Files.createTempDirectory("graft-curation-stream")
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val docs = Seq(
      (1L, t("2024-01-01 00:00:00"), "the cat and the dog of this house is that one with hats on it"),
      (2L, t("2024-01-01 00:01:00"), "zz"), // fails the quality gate
      (3L, t("2024-01-01 00:02:00"), "the cat and the dog of this house is that one with hats on it"), // exact dup of 1
      (4L, t("2024-01-01 00:03:00"), "a completely different document with the usual words in it for this test"))
      .toDF("doc_id", "ts", "text")
    docs.repartition(1).write.parquet(dir.toString + "/docs")
    val stream = spark.readStream.schema(docs.schema).parquet(dir.toString + "/docs")
    // the streaming ingest form of the q73 funnel: scan-stage gates are
    // plain filters, dedup keys state on the content hash within the
    // watermark, the sample predicate is stateless
    val curated = graft.streaming.Streams.dedupStream(
        stream.filter(T.qualityScore(F.col("text")) >= 0.35)
          .withColumn("ck", graft.pipeline.Dedup.exactKey(F.col("text"))),
        "ts", "10 minutes", Seq("ck"))
      .filter(graft.pipeline.Sampling.hashBp(F.col("doc_id").cast("string")) < 9900)
    val q = curated.select("doc_id")
      .writeStream.outputMode("append")
      .format("memory").queryName("curated_out").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("curated_out").collect().map(_.getLong(0)).toSet
      // batch replay of the same gates (first-arrival dedup = min ts)
      val batch = spark.read.parquet(dir.toString + "/docs")
        .filter(T.qualityScore(F.col("text")) >= 0.35)
        .withColumn("ck", graft.pipeline.Dedup.exactKey(F.col("text")))
        .withColumn("rn", F.row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy("ck").orderBy("ts")))
        .filter(F.col("rn") === 1)
        .filter(graft.pipeline.Sampling.hashBp(F.col("doc_id").cast("string")) < 9900)
        .collect().map(_.getLong(0)).toSet
      assert(streamed == batch, s"stream $streamed != batch $batch")
      assert(!streamed.contains(2L) && !streamed.contains(3L),
        "quality gate and dedup must both have fired")
      assert(streamed.contains(1L))
    } finally q.stop()
  }

  test("streaming span stripping against a stored profile equals the batch rewrite") {
    // q94's stored-profile streaming twin (r11 verdict task 6): arriving
    // docs rewritten against the bad-hash profile, stateless — so a
    // late-timestamped batch STILL rewrites identically (pure map, no
    // watermark-dropped state), which is exactly the contract to pin.
    import spark.implicits._
    val D = graft.pipeline.Dedup
    val T = graft.pipeline.TextOps
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val dir = java.nio.file.Files.createTempDirectory("graft-strip-stream")
    // profile = the two boilerplate chunks every page shares
    val profile = Seq("common header text", "shared footer line").toDF("t")
      .select(F.md5(F.encode($"t", "UTF-8")).as("chunk_hash"))
    val batchDocs = Seq(
      (1L, "common header text unique one alpha shared footer line"),
      (2L, "body two beta common header text"),
      (3L, "entirely different content here"),
      (4L, null.asInstanceOf[String]))
    val expected = D.stripSpansFromProfile(
        batchDocs.toDF("doc_id", "text"), profile, "doc_id", "text", size = 3)
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) -1 else r.getInt(1),
        r.getInt(2), r.getString(3))).toSet
    val schema = Seq((0L, t("2024-01-01 00:00:00"), "x")).toDF("doc_id", "ts", "text").schema
    def writeBatch(rows: Seq[(Long, java.sql.Timestamp, String)]): Unit =
      rows.toDF("doc_id", "ts", "text")
        .repartition(1).write.mode("append").parquet(dir.toString + "/docs")
    writeBatch(Seq((1L, t("2024-01-01 01:00:00"), batchDocs(0)._2),
      (2L, t("2024-01-01 01:01:00"), batchDocs(1)._2)))
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(dir.toString + "/docs")
    val q = Streams.stripSpansStream(stream, profile, "doc_id", "ts", "text", size = 3)
      .writeStream.outputMode("append")
      .format("memory").queryName("strip_out").start()
    try {
      q.processAllAvailable()
      // a LATE batch (hours behind the first arrivals): still rewritten —
      // the operator is stateless, nothing to drop
      writeBatch(Seq((3L, t("2023-12-31 20:00:00"), batchDocs(2)._2),
        (4L, t("2023-12-31 20:01:00"), batchDocs(3)._2)))
      q.processAllAvailable()
      val got = spark.table("strip_out")
        .select("doc_id", "n_tokens", "n_removed", "clean_text").collect()
        .map(r => (r.getLong(0),
          if (r.isNullAt(1)) -1 else r.getInt(1),
          r.getInt(2),
          r.getString(3))).toSet
      val exp = expected.map { case (id, nt, nr, ct) => (id, nt, nr, ct) }
      assert(got == exp, s"stream $got != batch $exp")
      // the boilerplate is actually gone from doc 1's rewrite
      val clean1 = got.find(_._1 == 1L).get._4
      assert(clean1 == "unique one alpha")
    } finally q.stop()
  }

  test("streaming deterministic sample equals the batch sample row set") {
    val src = "/root/testdata/sf0.001/events.parquet"
    val dir = java.nio.file.Files.createTempDirectory("graft-sample-stream")
    java.nio.file.Files.copy(java.nio.file.Paths.get(src),
      dir.resolve("events.parquet"))
    val stream = Streams.readEvents(spark, dir.toString)
    val q = Streams.sampleStream(stream, F.col("event_id").cast("string"), bp = 1000)
      .select("event_id")
      .writeStream.outputMode("append")
      .format("memory").queryName("sample_out").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("sample_out").collect().map(_.getLong(0)).toSet
      val batch = graft.pipeline.Sampling
        .deterministic(spark.read.parquet(src), F.col("event_id").cast("string"), 1000)
        .select("event_id").collect().map(_.getLong(0)).toSet
      assert(streamed == batch, "stream and batch must pick the same rows")
      assert(streamed.nonEmpty)
    } finally q.stop()
  }

  test("streaming quotaPerGroup: per-group admission stays bounded across batches") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-quota-stream")
    val schema = Seq(("a", 1L)).toDF("grp", "id").schema
    def writeBatch(rows: Seq[(String, Long)]): Unit =
      rows.toDF("grp", "id").repartition(1)
        .write.mode("append").parquet(dir.toString + "/in")
    writeBatch((1L to 5L).map(("a", _)) ++ Seq(("b", 1L), ("b", 2L)))
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(dir.toString + "/in")
    val q = Streams.quotaPerGroup(stream, "grp", "id", cap = 3)
      .writeStream.outputMode("append")
      .format("memory").queryName("quota_out").start()
    try {
      def got = spark.table("quota_out").collect()
        .map(r => (r.getString(0), r.getString(1))).toSeq
      def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString
      q.processAllAvailable()
      // within-batch admission is (md5, key)-ordered — deterministic
      val expA = (1L to 5L).map(_.toString).sortBy(k => (md5hex(k), k)).take(3).toSet
      assert(got.filter(_._1 == "a").map(_._2).toSet == expA)
      assert(got.count(_._1 == "b") == 2, "under-quota group admits everything")
      writeBatch(Seq(("a", 6L), ("a", 7L), ("b", 3L)))
      q.processAllAvailable()
      assert(got.count(_._1 == "a") == 3, "full group admits nothing more")
      assert(got.filter(_._1 == "b").map(_._2).toSet == Set("1", "2", "3"),
        "group with room admits up to the quota")
    } finally q.stop()
  }

  // Tagged SlowStream (ADVICE r17): wall-clock processing-time
  // behavior is inherently timing-sensitive — the timeout-to-trigger
  // ratio below (2 s vs 300 ms) is wide enough that a GC pause cannot
  // expire a key before its second arrival is processed, and the
  // poll deadlines bound the worst case on a loaded box.
  test("sessionSummaries idleTimeout closes state (final re-emit, counters reset)",
      SlowStream) {
    // r17: the timeout is opt-in (the unconditional ProcessingTimeTimeout
    // made every drain-style run non-terminating) and, when armed, must
    // actually CLOSE the session: re-emit the final summary and remove
    // the state, so a later arrival for the same user starts from zero.
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-ss-stream")
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val schema = Seq((1L, t("2024-01-01 00:00:00"), 1L, "e", 1.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value").schema
    def writeBatch(rows: Seq[(Long, java.sql.Timestamp, Long, String, Double)]): Unit =
      rows.toDF("event_id", "ts", "user_id", "event_type", "value")
        .repartition(1).write.mode("append").parquet(dir.toString + "/ev")
    writeBatch(Seq((1L, t("2024-01-01 00:00:00"), 7L, "e", 2.5),
      (2L, t("2024-01-01 00:00:01"), 7L, "e", 1.5)))
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(dir.toString + "/ev")
      .as[Streams.Event]
    // a REAL trigger interval: armed processing-time state makes the
    // default (as-fast-as-possible) trigger busy-spin no-data
    // clock-check batches — the production pairing for idleTimeout is
    // always an interval trigger; processAllAvailable never settles
    // under the spin, so the test polls with deadlines instead
    val q = Streams.sessionSummaries(stream, idleTimeout = Some("2 seconds"))
      .toDF().writeStream.outputMode("update")
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime("300 milliseconds"))
      .format("memory").queryName("ss_out").start()
    try {
      def got = spark.table("ss_out").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))).toSeq
      def awaitCond(what: String)(cond: => Boolean): Unit = {
        val deadline = System.nanoTime() + 60L * 1000000000L
        while (!cond && System.nanoTime() < deadline) Thread.sleep(300)
        assert(cond, s"$what (timed out; got: $got)")
      }
      awaitCond("running summary first")(got.contains((7L, 2, 4.0)))
      // let user 7's timeout expire; its state times out in a later
      // clock-check batch and re-emits the final summary
      awaitCond("timeout must re-emit user 7's final summary")(
        got.count(_ == ((7L, 2, 4.0))) >= 2)
      // state was removed: a fresh arrival for 7 restarts from zero
      writeBatch(Seq((4L, t("2024-01-01 00:02:00"), 7L, "e", 0.25)))
      awaitCond("post-timeout arrival must start a NEW session")(
        got.contains((7L, 1, 0.25)))
    } finally q.stop()
  }
}
