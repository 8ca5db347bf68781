package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.{functions => F}

import graft.core._
import graft.exprs.BoundaryBucket

/** r19: the O(log k) binary-search chunk id ([[graft.exprs.BoundaryBucket]])
  * must be value-identical to the declarative O(k) form it replaces —
  * `size(filter(lit(boundaries), b => b <= v))` under Spark's comparison
  * semantics (-0.0 = 0.0, NaN above all) — and the chunked plans that
  * consume it must keep their window-form oracle equality. */
class BoundaryBucketSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("count equals the linear filter form on random arrays (incl. ±0.0/NaN/±Inf probes)") {
    val rng = new scala.util.Random(4217)
    for (trial <- 0 until 300) {
      val n = rng.nextInt(12) // 0..11 boundaries
      val raw = Array.fill(n)(rng.nextInt(7) match {
        case 0 => -0.0
        case 1 => 0.0
        case 2 => rng.nextDouble() * 1e12
        case 3 => -rng.nextDouble() * 1e12
        case 4 => rng.nextInt(5).toDouble
        case _ => rng.nextDouble() * 10 - 5
      })
      val bs = BoundaryBucket.prepare(raw)
      // prepared: sorted ascending, distinct under Double.compare, no -0.0
      assert(bs.sliding(2).forall(p =>
        p.length < 2 || java.lang.Double.compare(p(0), p(1)) < 0))
      assert(!bs.exists(b => b == 0.0 && 1.0 / b < 0))
      val probes = raw.toSeq ++ Seq(-0.0, 0.0, Double.NaN,
        Double.PositiveInfinity, Double.NegativeInfinity,
        rng.nextDouble() * 2e12 - 1e12)
      for (v <- probes) {
        // Spark `b <= v` truth: NaN above everything, -0.0 = 0.0
        val expect = bs.count { b =>
          if (v.isNaN) true
          else if (b.isNaN) false
          else b <= v // primitive <= : -0.0 == 0.0 exactly like Spark
        }.toLong
        assert(BoundaryBucket.count(bs, v) === expect,
          s"trial $trial bs=${bs.mkString(",")} v=$v")
      }
    }
  }

  test("expression matches size(filter()) through Spark on a mixed column") {
    val rng = new scala.util.Random(991)
    val vals: Seq[java.lang.Double] =
      Seq[java.lang.Double](null, -0.0, 0.0, Double.NaN,
        Double.PositiveInfinity, Double.NegativeInfinity) ++
        Seq.fill(500)(java.lang.Double.valueOf(
          if (rng.nextBoolean()) rng.nextInt(20).toDouble
          else rng.nextDouble() * 1e9 - 5e8))
    val df = vals.map(Option(_).map(_.doubleValue)).toDF("v")
    val bounds = BoundaryBucket.prepare(
      Array(-4e8, -0.0, 3.0, 7.0, 1e8, 4.2e8))
    graft.exprs.GraftFunctions.register(spark)
    val got = df.select(
      F.call_function("boundary_bucket", F.col("v"), F.lit(bounds)).as("b"),
      F.size(F.filter(F.lit(bounds), b => b <= F.col("v")))
        .cast("long").as("ref"),
      F.col("v"))
      .collect()
    got.foreach { r =>
      if (r.isNullAt(2)) assert(r.isNullAt(0), "null in => null out")
      else assert(r.getLong(0) === r.getLong(1), s"v=${r.get(2)}")
    }
  }

  test("sorted-frame cumSum under a heavy-tailed SORT key equals the window form") {
    // r19: Prefix.chunked now buckets the sort key on equi-depth
    // boundaries — the whole prefix family must stay value-identical
    // to the sequential form on a price^7-style axis (plus ties, nulls
    // in the value column, and a descending run)
    val rng = new scala.util.Random(43)
    val rows = (1 to 3000).map { i =>
      (i.toLong,
        math.pow(rng.nextInt(90) + 10.0, 7) * (if (rng.nextBoolean()) 1 else -1),
        if (rng.nextInt(10) == 0) None else Some(rng.nextInt(100).toLong))
    }
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 8)).toDF("id", "k", "v")
    for (desc <- Seq(false, true)) {
      val fr = TadaFrame.ingest(df)
        .sort(Sorter("k", descending = desc), Sorter("id"))
      val a = Analytics.cumSum(fr, "v", "cs").out
        .select("id", "cs").orderBy("id").collect().toSeq
      val b = Analytics.cumSumWindow(fr, "v", "cs").out
        .select("id", "cs").orderBy("id").collect().toSeq
      assert(a === b, s"desc=$desc")
    }
  }

  test("NTZ timestamp sort key keeps the chunked plan (no global data window)") {
    // r19: parquet timestamp[us] without a zone reads as TimestampNTZ —
    // before the NTZ image in Prefix.bucketScaleOf / Analytics.valueAxis
    // it silently dropped the whole prefix family (and the banded
    // rankRep dispatch) to single-partition fallbacks; found live by
    // q114's dispatch tag reading "window" at sf0.1
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Window => LWindow}
    val rng = new scala.util.Random(11)
    val rows = (1 to 2000).map { i =>
      (i.toLong, java.time.LocalDateTime.of(2024, 1, 1, 0, 0, 0)
        .plusSeconds(rng.nextInt(86400 * 90)), rng.nextInt(50).toLong)
    }
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 8)).toDF("id", "ts", "v")
    assert(df.schema("ts").dataType ==
      org.apache.spark.sql.types.TimestampNTZType)
    val fr = TadaFrame.ingest(df).sort(Sorter("ts"), Sorter("id"))
    val cs = Analytics.cumSum(fr, "v", "cs")
    val bad = cs.df.queryExecution.optimizedPlan.collect {
      case w: LWindow if w.partitionSpec.isEmpty &&
        w.collectFirst { case a: Aggregate => a }.isEmpty => w
    }
    assert(bad.isEmpty, "NTZ sort key fell back to a global window")
    val a = cs.out.select("id", "cs").orderBy("id").collect().toSeq
    val b = Analytics.cumSumWindow(fr, "v", "cs").out
      .select("id", "cs").orderBy("id").collect().toSeq
    assert(a === b)
  }

  test("chunked rank over a heavy-tailed axis still equals the window form") {
    // price^7-style skew: two decades of mass at the bottom, a long tail
    val rng = new scala.util.Random(7)
    val rows = (1 to 4000).map { i =>
      (i.toLong, math.pow(rng.nextDouble() * 100, 7))
    }
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 8)).toDF("id", "p")
    val fr = TadaFrame.ingest(df)
    val chunked = Analytics.rankDenseChunked(fr, "p", "rk")(
      fail("fallback must not fire on a clean numeric axis"))
    val window = Analytics.rankDenseWindow(fr, "p", "rk")
    val a = chunked.out.select("id", "rk").orderBy("id").collect().toSeq
    val b = window.out.select("id", "rk").orderBy("id").collect().toSeq
    assert(a === b)
  }
}
