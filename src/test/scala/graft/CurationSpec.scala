package graft

import graft.pipeline.{Dedup, Embeddings, TextOps}
import org.apache.spark.sql.{functions => F}
import org.scalatest.funsuite.AnyFunSuite

/** Ground truths for the curation operators: repetition metrics,
  * chunk-level cross-doc dedup, int8 quantization, fixed-point cluster
  * statistics. */
class CurationSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("dupNgramFraction: known repetition, short-text guard") {
    val df = Seq(
      (1, "a b a b a"),      // bigrams: ab,ba,ab,ba -> 4 total, 2 distinct
      (2, "x y z"),          // all distinct
      (3, "w"),              // < 2 tokens -> 0.0
      (4, "t t t t")         // bigrams: tt x3 -> 1 distinct / 3
    ).toDF("id", "text")
    val out = df.select($"id", TextOps.dupNgramFraction($"text", 2).as("f"))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    assert(out(1) == 0.5)
    assert(out(2) == 0.0)
    assert(out(3) == 0.0)
    assert(out(4) == 1.0 - 1.0 / 3.0)
  }

  test("chunkHashesFromTokens: full chunks only, content-addressed") {
    val df = Seq(
      (1, "a b c d e f g"),  // 7 tokens, size 3 -> 2 chunks (abc, def)
      (2, "a b c"),          // 1 chunk, same content as doc 1's first
      (3, "q r")             // 0 chunks
    ).toDF("id", "text")
    val chunks = df.select($"id",
        F.explode(TextOps.chunkHashesFromTokens(TextOps.tokens($"text"), 3)).as("h"))
      .collect().map(r => (r.getInt(0), r.getString(1)))
    assert(chunks.count(_._1 == 1) == 2)
    assert(chunks.count(_._1 == 2) == 1)
    assert(!chunks.exists(_._1 == 3))
    // doc 2's chunk equals doc 1's first chunk by content
    val h1 = chunks.filter(_._1 == 1).map(_._2)
    val h2 = chunks.filter(_._1 == 2).map(_._2).head
    assert(h1.contains(h2))
  }

  test("chunkDedupProfile: cross-doc duplicate detection; null text survives") {
    val df = Seq(
      (1, "a b c d e f"),    // chunks abc, def
      (2, "a b c x y z"),    // chunks abc (dup with 1), xyz
      (3, "p q r s t u"),    // chunks pqr, stu — unique
      (4, null)              // routine in web corpora — must not NPE
    ).toDF("doc_id", "text")
    val out = Dedup.chunkDedupProfile(df, "doc_id", "text", 3)
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(out(1) == ((2L, 1L, 0.5)))
    assert(out(2) == ((2L, 1L, 0.5)))
    assert(out(3) == ((2L, 0L, 0.0)))
    assert(!out.contains(4)) // null text contributes no chunks, no crash
  }

  test("JVM kernels match the expression forms bit-for-bit (chunk hashes, winnow)") {
    val docs = Seq(
      (1, "a b c d e f g h i j k l m"),
      (2, "a b"), (3, ""), (4, "x y z x y z x y z"),
      (5, null.asInstanceOf[String]) // null in ⇒ null out, both forms
    ).toDF("id", "text")
    val base = docs.select($"id", TextOps.tokens($"text").as("w"))
    val ch = base.select($"id",
        TextOps.chunkHashesFromTokens($"w", 3).as("expr"),
        TextOps.chunkHashesKernel($"w", 3).as("kern"))
      .collect()
    ch.foreach(r => assert(r.getSeq[String](1) == r.getSeq[String](2),
      s"chunk mismatch id=${r.getInt(0)}"))
    val wn = base.select($"id",
        TextOps.winnow(TextOps.kgramHashes($"w", 3), 4).as("expr"),
        TextOps.winnowFromTokens($"w", 3, 4).as("kern"))
      .collect()
    wn.foreach(r => assert(r.getSeq[Long](1) == r.getSeq[Long](2),
      s"winnow mismatch id=${r.getInt(0)}: ${r.getSeq[Long](1)} vs ${r.getSeq[Long](2)}"))
  }

  test("int8 quantization: scale, norm, bounded reconstruction error") {
    val df = Seq((1, Array(0.3f, -0.4f, 0.0f))).toDF("id", "vec")
    val base = df.select($"id", Embeddings.asDouble($"vec").as("v"))
      .withColumn("scale", Embeddings.int8Scale($"v"))
    val r = base.select($"scale", Embeddings.l2Norm($"v").as("n"),
      Embeddings.maxQuantError($"v", $"scale").as("e")).head()
    val scale = r.getDouble(0)
    assert(scale == 0.4f.toDouble / 127.0) // float32 ingest is exact in double
    assert(math.abs(r.getDouble(1) - 0.5) < 1e-7) // 3-4-5 triangle
    // symmetric quantization reconstruction error is bounded by scale/2
    assert(r.getDouble(2) <= scale / 2 + 1e-12)
  }

  test("winnow: shared runs of >= w+k-1 tokens share a fingerprint; storage shrinks") {
    val df = Seq(
      (1, "alpha beta gamma delta epsilon zeta unique1 unique2 unique3"),
      (2, "other words here alpha beta gamma delta epsilon zeta trailing"),
      (3, "completely different content with no overlap at all present")
    ).toDF("id", "text")
    val fps = df.select($"id", TextOps.tokens($"text").as("w"))
      .select($"id", TextOps.kgramHashes($"w", 3).as("h"))
      .select($"id", TextOps.winnow($"h", 4).as("fp"),
        org.apache.spark.sql.functions.size($"h").as("nh"))
      .collect().map(r => (r.getInt(0), r.getSeq[Long](1).toSet, r.getInt(2))).toList
    val m = fps.map(t => t._1 -> t._2).toMap
    // docs 1 and 2 share "alpha beta gamma delta epsilon zeta" (6 = w+k-1)
    assert((m(1) intersect m(2)).nonEmpty, s"guarantee violated: ${m(1)} vs ${m(2)}")
    assert((m(1) intersect m(3)).isEmpty)
    // fingerprints are a strict subset of the k-gram hashes
    fps.foreach { case (_, fp, nh) => assert(fp.size < nh) }
  }

  test("unigramLogProb: common-word docs outscore rare-word docs") {
    val df = Seq(
      (1L, "the the the the"),        // most frequent token
      (2L, "rare1 rare2 rare3 rare4") // singletons
    ).toDF("doc_id", "text")
    val got = TextOps.unigramLogProb(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got(1L)._1 == 4 && got(2L)._1 == 4)
    assert(got(1L)._2 > got(2L)._2, s"common must outscore rare: $got")
    // doc 1: ln(4/8) = -0.6931...; doc 2: ln(1/8) = -2.0794...
    assert(math.abs(got(1L)._2 - -0.6931) < 1e-3)
    assert(math.abs(got(2L)._2 - -2.0794) < 1e-3)
  }

  test("quantization guard: zero vector has zero error; resize preserves aspect") {
    val df = Seq((1, Array(0.0f, 0.0f))).toDF("id", "vec")
    val r = df.select(Embeddings.asDouble($"vec").as("v"))
      .withColumn("scale", Embeddings.int8Scale($"v"))
      .select(Embeddings.maxQuantError($"v", $"scale")).head().getDouble(0)
    assert(r == 0.0)
    implicit val s = spark
    import spark.implicits._
    val feats = Seq(
      graft.pipeline.Multimodal.MediaFeatures(1L, 10, "png", 640, 480, 7L),
      graft.pipeline.Multimodal.MediaFeatures(2L, 10, "png", 100, 50, 8L)).toDS()
    val out = graft.pipeline.Multimodal.resizeTo(feats, 320)
      .collect().map(f => f.doc_id -> (f.width, f.height)).toMap
    assert(out(1L) == ((320, 240))) // downscaled, aspect kept
    assert(out(2L) == ((100, 50)))  // never upscaled
  }

  test("plan shapes: the scale-critical properties of the curation queries hold") {
    val dir = "/root/testdata/sf0.001"
    def plan(name: String): String = graft.queries.Registry.all
      .find(_.name == name).get.build(spark, dir)
      .queryExecution.executedPlan.toString
    // q66: repetition metrics are scan-stage — no aggregate, no join;
    // the only exchange is the presentation sort
    val p66 = plan("q66_repetition")
    assert(!p66.contains("HashAggregate") && !p66.contains("Join"), p66)
    // q70: per-group top-k must prune partially before the rank shuffle
    assert(plan("q70_heavy_hitters").contains("WindowGroupLimit"))
    // q76: the eval shingle set must broadcast (corpus side never
    // shuffles for the probe)
    assert(plan("q76_contamination").contains("BroadcastHashJoin"))
    // q69: both reductions carry integer partials with map-side combine
    val p69 = plan("q69_cluster_stats")
    assert(p69.contains("partial_sum"), p69)
  }

  test("no un-broadcast cartesian product appears in any join-bearing query plan") {
    // the one true scale-killer shape: a CartesianProduct node means a
    // non-broadcast corpus×corpus join slipped into a registered query.
    // BroadcastNestedLoopJoin is fine (broadcast by definition — the
    // brute-force anchor and centroid assignment use it deliberately).
    val dir = "/root/testdata/sf0.001"
    val joinBearing = Seq(
      "q41_minhash_lsh", "q42_simhash", "q44_embedding_dedup",
      "q45_knn_brute", "q46_knn_lsh", "q53_revenue_top10",
      "q54_nation_revenue", "q55_cosine_pairs", "q56_knn_ivf",
      "q58_dup_clusters", "q59_asof_join", "q60_range_join", "q62_tfidf",
      "q65_range_join_binned", "q67_chunk_dedup", "q76_contamination",
      "q79_simhash_clusters", "q80_incremental_dedup",
      "q81_incremental_embedding", "q82_dedup_keepers",
      "q85_bloom_incremental", "q87_source_overlap")
    joinBearing.foreach { n =>
      val p = graft.queries.Registry.all.find(_.name == n).get
        .build(spark, dir).queryExecution.executedPlan.toString
      assert(!p.contains("CartesianProduct"), s"$n plans a cartesian product")
    }
  }

  test("clusterStats: exact fixed-point inertia on a known clustering") {
    val df = Seq(
      (0, Array(1.0f, 0.0f)), (0, Array(0.0f, 1.0f)),   // centroid (.5,.5)
      (1, Array(2.0f, 2.0f)), (1, Array(2.0f, 2.0f))    // zero variance
    ).toDF("label", "embedding")
    val out = Embeddings.clusterStats(df, "label", "embedding")
      .collect().map(r => r.getInt(0) ->
        (r.getLong(1), r.getDouble(4), r.getDouble(5))).toMap
    val (n0, cn0, wv0) = out(0)
    assert(n0 == 2 && math.abs(cn0 - 0.5) < 1e-9 && math.abs(wv0 - 0.5) < 1e-9)
    val (n1, cn1, wv1) = out(1)
    assert(n1 == 2 && math.abs(cn1 - 8.0) < 1e-9 && math.abs(wv1) < 1e-9)
  }
}
