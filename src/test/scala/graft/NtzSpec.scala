package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.{DataFrame, functions => F}
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}

import graft.core._
import graft.semantics.TadaFormat

/** r19: the TimestampNTZ surface. Zone-less parquet timestamps read as
  * NTZ, and Spark's `unix_micros` has no implicit NTZ cast — before
  * this round the chunked dispatches silently fell back (fixed in
  * Prefix.bucketScaleOf / Analytics.valueAxis, pinned in
  * BoundaryBucketSpec) and the epoch-math operators failed with
  * DATATYPE_MISMATCH. Every ts operator now funnels through
  * `Prefix.tsMicros`; this spec pins the whole surface with NTZ/LTZ
  * TWINS — same wall times, both zone flavors under the pinned UTC
  * session — whose outputs must be value-identical. */
class NtzSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // same wall instants, two zone flavors (UTC session: same instants too)
  private lazy val (ntz, ltz): (DataFrame, DataFrame) = {
    val rng = new scala.util.Random(3)
    val rows = (1 to 400).map { i =>
      (i.toLong,
        java.time.LocalDateTime.of(2024, 1, 1, 0, 0, 0)
          .plusSeconds(rng.nextInt(86400 * 30).toLong),
        rng.nextInt(40).toLong,
        s"k${i % 4}")
    }
    val n = spark.createDataFrame(spark.sparkContext.parallelize(rows, 6))
      .toDF("id", "ts", "v", "k")
    assert(n.schema("ts").dataType == TimestampNTZType)
    (n, n.withColumn("ts", F.col("ts").cast(TimestampType)))
  }

  private def rows(df: DataFrame, cols: String*): Seq[String] =
    df.select(cols.map(c => F.col(c).cast("string")): _*)
      .orderBy("id").collect().toSeq.map(_.toString)

  test("rollingDuration: NTZ == LTZ twin (keyless chunked + keyed)") {
    for (part <- Seq(Nil, Seq("k"))) {
      val a = Rolling.rollingDuration(TadaFrame.ingest(ntz), "ts",
        3600000000L, "v", x => F.sum(x), "r", partitionBy = part)
      val b = Rolling.rollingDuration(TadaFrame.ingest(ltz), "ts",
        3600000000L, "v", x => F.sum(x), "r", partitionBy = part)
      assert(rows(a.out, "id", "r") === rows(b.out, "id", "r"), s"part=$part")
    }
  }

  test("sessionize: NTZ == LTZ twin") {
    val a = Temporal.sessionize(ntz, Seq("k"), "ts", F.lit(3600000000L), Seq("id"))
    val b = Temporal.sessionize(ltz, Seq("k"), "ts", F.lit(3600000000L), Seq("id"))
    assert(rows(a, "id", "session") === rows(b, "id", "session"))
  }

  test("resample (calendar + duration): NTZ == LTZ wall values, NTZ type kept") {
    for (by <- Seq("month", "week", "day", "hour")) {
      val a = Analytics.resample(TadaFrame.ingest(ntz), "ts", by, "rs")
      val b = Analytics.resample(TadaFrame.ingest(ltz), "ts", by, "rs")
      assert(a.df.schema("rs").dataType == TimestampNTZType, by)
      assert(rows(a.out, "id", "rs") === rows(b.out, "id", "rs"), by)
    }
    val a = Analytics.resampleDuration(TadaFrame.ingest(ntz), "ts", 7200000000L, "rs")
    val b = Analytics.resampleDuration(TadaFrame.ingest(ltz), "ts", 7200000000L, "rs")
    assert(a.df.schema("rs").dataType == TimestampNTZType)
    assert(rows(a.out, "id", "rs") === rows(b.out, "id", "rs"))
  }

  test("stringify: NTZ prints RFC3339, identical to the LTZ twin") {
    val a = ntz.select(TadaFormat.stringify(F.col("ts"), TimestampNTZType).as("s"))
      .orderBy("s").collect().map(_.getString(0)).toSeq
    val b = ltz.select(TadaFormat.stringify(F.col("ts"), TimestampType).as("s"))
      .orderBy("s").collect().map(_.getString(0)).toSeq
    assert(a === b)
    assert(a.head.matches("""\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}Z"""))
  }

  test("rank + sorted-frame ops on an NTZ column equal the LTZ twin") {
    val a = Analytics.rankDense(TadaFrame.ingest(ntz), "ts", "rk")
    val b = Analytics.rankDense(TadaFrame.ingest(ltz), "ts", "rk")
    assert(rows(a.out, "id", "rk") === rows(b.out, "id", "rk"))
    val ca = Analytics.cumSum(TadaFrame.ingest(ntz).sort(Sorter("ts"), Sorter("id")), "v", "cs")
    val cb = Analytics.cumSum(TadaFrame.ingest(ltz).sort(Sorter("ts"), Sorter("id")), "v", "cs")
    assert(rows(ca.out, "id", "cs") === rows(cb.out, "id", "cs"))
  }
}
