package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.{functions => F}

import graft.core.{RangeJoin, Temporal}
import graft.pipeline.{Sampling, TextOps}

/** Ground-truth tests for the scale-path operators (as-of join, range
  * join, sessionization, TF-IDF, deterministic sampling). */
class ScaleOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("asofJoin matches the most recent right row at or before left ts") {
    val quotes = Seq(
      (1L, ts("2024-01-01 10:00:00"), 100.0),
      (1L, ts("2024-01-01 10:05:00"), 101.0),
      (2L, ts("2024-01-01 10:01:00"), 200.0))
      .toDF("key", "qts", "px")
    val trades = Seq(
      (1L, ts("2024-01-01 10:03:00"), "t1"), // between quotes -> 100.0
      (1L, ts("2024-01-01 10:05:00"), "t2"), // simultaneous -> 101.0 (at-or-before)
      (2L, ts("2024-01-01 10:00:30"), "t3"), // before any quote -> null
      (3L, ts("2024-01-01 10:00:00"), "t4")) // key with no quotes -> null
      .toDF("key", "tts", "tid")
    val out = Temporal.asofJoin(trades, quotes, Seq("key"), "tts", "qts", Seq("px"))
      .select("tid", "asof_px").collect()
      .map(r => r.getString(0) -> Option(r.get(1))).toMap
    assert(out("t1") === Some(100.0))
    assert(out("t2") === Some(101.0))
    assert(out("t3") === None)
    assert(out("t4") === None)
    // inner drops the unmatched rows
    val inner = Temporal.asofJoin(trades, quotes, Seq("key"), "tts", "qts",
      Seq("px"), inner = true)
    assert(inner.count() === 2)
    // inner keeps a MATCHED row whose carried payload is null — match
    // is judged by the marker, not by payload nullness
    val nullQuotes = Seq((9L, ts("2024-01-01 10:00:00"), null.asInstanceOf[java.lang.Double]))
      .toDF("key", "qts", "px")
    val t9 = Seq((9L, ts("2024-01-01 10:01:00"), "t9")).toDF("key", "tts", "tid")
    val kept = Temporal.asofJoin(t9, nullQuotes, Seq("key"), "tts", "qts",
      Seq("px"), inner = true).collect()
    assert(kept.length === 1 && kept.head.isNullAt(kept.head.fieldIndex("asof_px")))
  }

  test("asofJoin plans exactly ONE hash shuffle and no join operator") {
    val quotes = Seq((1L, ts("2024-01-01 10:00:00"), 100.0)).toDF("key", "qts", "px")
    val trades = Seq((1L, ts("2024-01-01 10:03:00"), "t1")).toDF("key", "tts", "tid")
    val plan = Temporal.asofJoin(trades, quotes, Seq("key"), "tts", "qts", Seq("px"))
      .queryExecution.executedPlan.toString
    // the scale contract: union-scan + one keyed window, never a
    // range/nested-loop join and never a second exchange
    assert(!plan.contains("NestedLoopJoin") && !plan.contains("SortMergeJoin") &&
      !plan.contains("CartesianProduct"), s"unexpected join operator in:\n$plan")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges == 1, s"expected exactly 1 hash exchange, got $exchanges:\n$plan")
  }

  test("sessionize splits at gaps strictly greater than the threshold") {
    val e = Seq(
      (1L, 10L, ts("2024-01-01 00:00:00")),
      (1L, 11L, ts("2024-01-01 00:20:00")), // 20 min -> same session
      (1L, 12L, ts("2024-01-01 01:00:00")), // 40 min -> new session
      (1L, 13L, ts("2024-01-01 01:30:00")), // exactly 30 min -> SAME session
      (2L, 20L, ts("2024-01-01 00:00:00")))
      .toDF("user_id", "event_id", "ts")
    val out = Temporal.sessionize(e, Seq("user_id"), "ts",
        F.lit(1800L * 1000000), tieBreak = Seq("event_id"))
      .select("event_id", "session").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(10L) === 1 && out(11L) === 1)
    assert(out(12L) === 2)
    assert(out(13L) === 2, "a gap equal to the threshold must not split")
    assert(out(20L) === 1)
  }

  test("binnedRange produces exactly the broadcastRange matches") {
    val facts = Seq.tabulate(200)(i => (i.toLong, i * 37.3 % 1000)).toDF("id", "v")
    val bands = Seq((0L, 0.0, 250.0), (1L, 250.0, 700.0), (2L, 700.0, 1000.0))
      .toDF("band", "lo", "hi")
    def key(df: org.apache.spark.sql.DataFrame) =
      df.select("id", "band").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val viaBroadcast = key(
      RangeJoin.broadcastRange(facts, bands, "v", "lo", "hi"))
    val viaBinned = key(
      RangeJoin.binnedRange(facts, bands, "v", "lo", "hi", step = 100.0))
    assert(viaBinned === viaBroadcast)
    assert(viaBroadcast.size === 200, "bands cover the domain; every fact matches once")
  }

  test("deterministic sample is invariant under repartitioning and rerun") {
    val df = spark.range(0, 5000).select(F.col("id"))
    def ids(d: org.apache.spark.sql.DataFrame) =
      Sampling.deterministic(d, F.col("id").cast("string"), bp = 1000)
        .select("id").collect().map(_.getLong(0)).toSet
    val a = ids(df)
    val b = ids(df.repartition(13))
    assert(a === b, "sample membership must not depend on partitioning")
    // ~10% +- generous slack; md5 is uniform
    assert(a.size > 350 && a.size < 650, s"got ${a.size} of 5000 at 10%")
  }

  test("train/val/test split: permanent labels, partition-invariant, exhaustive") {
    val df = spark.range(0, 5000).select(F.col("id"))
    def labels(d: org.apache.spark.sql.DataFrame) =
      Sampling.split(d, F.col("id").cast("string"), trainBp = 8000, valBp = 1000)
        .collect().map(r => r.getLong(0) -> r.getAs[String]("split")).toMap
    val a = labels(df)
    val b = labels(df.repartition(13))
    assert(a == b, "a row's split must not depend on partitioning")
    // every row gets exactly one label; proportions near 80/10/10
    val byLabel = a.values.groupBy(identity).view.mapValues(_.size)
    assert(byLabel.values.sum == 5000)
    assert(byLabel("train") > 3800 && byLabel("val") < 800 && byLabel("test") < 800)
    // split is consistent with the sampling coordinate: the train set IS
    // the deterministic 80% sample under the same key
    val trainIds = a.collect { case (id, "train") => id }.toSet
    val det = Sampling.deterministic(df, F.col("id").cast("string"), bp = 8000)
      .collect().map(_.getLong(0)).toSet
    assert(trainIds == det)
    intercept[IllegalArgumentException] {
      Sampling.split(df, F.col("id").cast("string"), trainBp = 9000, valBp = 2000)
    }
  }

  test("stratified sample applies per-stratum rates") {
    val df = spark.range(0, 4000)
      .select(F.col("id"), (F.col("id") % 2 === 0).cast("string").as("s"))
    val out = Sampling.stratified(df, F.col("id").cast("string"), F.col("s"),
        Map("true" -> 10000), defaultBp = 0)
    val kept = out.select("s").collect().map(_.getString(0))
    assert(kept.length === 2000 && kept.forall(_ == "true"),
      "rate 100% stratum fully kept; default 0 stratum fully dropped")
  }

  test("tfIdf: rare terms outscore common terms; df counts documents") {
    val docs = Seq(
      (0L, "alpha beta beta"),
      (1L, "alpha gamma"),
      (2L, "alpha delta"))
      .toDF("doc_id", "text")
    val ti = TextOps.tfIdf(docs, "doc_id", "text")
      .select("doc_id", "term", "tf", "df", "tfidf")
      .collect().map(r => (r.getLong(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    // alpha appears in all 3 docs -> idf = ln(1) = 0
    assert(ti((0L, "alpha"))._3 === 0.0)
    assert(ti((0L, "alpha"))._2 === 3L)
    // beta: tf=2 in doc 0, df=1 -> 2 * ln(3)
    val (tfB, dfB, tfidfB) = ti((0L, "beta"))
    assert(tfB === 2L && dfB === 1L)
    assert(math.abs(tfidfB - 2 * math.log(3.0)) < 1e-12)
  }

  test("approx sketches: HLL distinct and approx percentile within bounds") {
    // the 100 TB shapes for COUNT(DISTINCT) and quantiles: sketches
    // merge associatively across partitions (one shuffle of sketch
    // state, no global sort / exact distinct state). Accuracy is pinned
    // here because sketch internals differ per engine (no DuckDB hash
    // oracle possible).
    val li = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
    val exactD = li.select(F.countDistinct(F.col("l_orderkey"))).head().getLong(0)
    val approxD = li.select(F.approx_count_distinct(F.col("l_orderkey"), 0.02))
      .head().getLong(0)
    assert(math.abs(approxD - exactD).toDouble / exactD < 0.05,
      s"HLL off by >5%: $approxD vs $exactD")
    val exactP = li.select(F.expr("percentile(l_extendedprice, 0.5)")).head().getDouble(0)
    val approxP = li.select(F.percentile_approx(F.col("l_extendedprice"),
      F.lit(0.5), F.lit(1000))).head().getDouble(0)
    assert(math.abs(approxP - exactP) / exactP < 0.01,
      s"approx median off by >1%: $approxP vs $exactP")
    // partial aggregation must ride the shuffle (sketches, not rows)
    val plan = li.groupBy("l_returnflag")
      .agg(F.approx_count_distinct("l_orderkey"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_approx_count_distinct"),
      s"sketch must combine map-side:\n$plan")
  }

  test("Explosion.width bounds candidate rows per partition") {
    import graft.pipeline.Explosion
    // unknown estimate: keep machine width
    assert(Explosion.width(-1.0, 32) === 32)
    // small explosions never shrink below machine width
    assert(Explosion.width(1e5, 32) === 32)
    // the r8 spill case: ~7e8 candidates at the 200k-vector probe must
    // widen past 32 so partial maps hold ≤ RowsPerPartition entries
    val w = Explosion.width(7e8, 32)
    assert(w === math.ceil(7e8 / Explosion.RowsPerPartition).toInt)
    assert(7e8 / w <= Explosion.RowsPerPartition)
    // clamped: scheduling overhead must not grow without bound
    assert(Explosion.width(1e12, 32) === Explosion.MaxWidth)
  }

  test("sized candidate explosion plans one exchange at the derived width") {
    import graft.pipeline.Dedup
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val banded = Dedup.lshIndex(docs, "doc_id", "text")
    // estDocs forces a width above machine: the groupBy must reuse the
    // repartition's hash distribution (one exchange, no second one)
    val plan = Dedup.candidatePairs(banded, "id", "bands", estDocs = 400_000_000L)
      .queryExecution.executedPlan.toString
    val width = math.ceil(400_000_000L * 8 / graft.pipeline.Explosion.RowsPerPartition).toInt
    assert(plan.contains(s"Exchange hashpartitioning"), plan.take(500))
    assert(plan.contains(width.toString),
      s"derived width $width not in plan:\n${plan.take(2000)}")
  }

  test("normalizeEventTs folds all three shipped ts encodings to the same micros") {
    // the r9 gate lost 11 queries to the driver switching events.ts from
    // TIMESTAMP(NANOS) to NTZ micros — pin the whole branch table
    import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}
    val micros = 1700000000123456L // 2023-11-14 22:13:20.123456 UTC
    val asNanosLong = Seq((1L, micros * 1000 + 789L)).toDF("event_id", "ts")
    val asNtz = Seq((1L, "2023-11-14 22:13:20.123456")).toDF("event_id", "s")
      .select($"event_id", $"s".cast(TimestampNTZType).as("ts"))
    val asLtz = Seq((1L, "2023-11-14 22:13:20.123456")).toDF("event_id", "s")
      .select($"event_id", $"s".cast(TimestampType).as("ts"))
    for ((enc, df) <- Seq("nanos-long" -> asNanosLong, "ntz" -> asNtz, "ltz" -> asLtz)) {
      val out = graft.Tables.normalizeEventTs(df)
      assert(out.schema("ts").dataType == TimestampType, s"$enc: wrong type")
      val got = out.select(F.unix_micros($"ts")).head.getLong(0)
      assert(got == micros, s"$enc: $got != $micros")
    }
  }
}
