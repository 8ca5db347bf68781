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
    // q89: the budget-bound pair stream is exchanged ONCE — the per-doc
    // sizes joins must broadcast (the r11 probe measured ~3x the pair
    // bytes on disk when they planned as sort-merge), leaving the gram
    // inverted-index join as the only SortMergeJoin in the plan
    val p89 = plan("q89_containment_pairs")
    assert("SortMergeJoin".r.findAllIn(p89).length == 1,
      s"expected exactly 1 SortMergeJoin (the gram equi-join):\n$p89")
    assert("BroadcastHashJoin".r.findAllIn(p89).length >= 2, p89)
  }

  test("no un-broadcast cartesian product appears in any join-bearing query plan") {
    // the one true scale-killer shape: a CartesianProduct node means a
    // non-broadcast corpus×corpus join slipped into a registered query.
    // BroadcastNestedLoopJoin is fine (broadcast by definition — the
    // brute-force anchor and centroid assignment use it deliberately).
    val dir = "/root/testdata/sf0.001"
    val joinBearing = Seq(
      "q41_minhash_lsh", "q42_simhash_edges", "q44_embedding_dedup",
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

  test("containmentPairs matches a set model, including the df cap path") {
    val texts = Seq(
      1 -> "the quick brown fox jumps over the lazy dog today and tomorrow",
      2 -> "quick brown fox jumps over the lazy dog", // fully inside doc 1
      3 -> "alpha beta gamma delta epsilon zeta eta theta",
      4 -> "gamma delta epsilon zeta eta theta iota kappa", // 4/6 of doc 3
      5 -> "one two three")
    val docs = texts.toDF("doc_id", "text")
    def grams3(t: String): Set[String] = {
      val w = t.split(" ")
      if (w.length < 3) Set.empty else w.sliding(3).map(_.mkString(" ")).toSet
    }
    val sets = texts.map { case (id, t) => id -> grams3(t) }.toMap
    for (maxDf <- Seq(1000, 1)) {
      val docFreq = sets.values.flatten.toSeq.groupBy(identity).map { case (g, xs) => g -> xs.size }
      val kept = sets.map { case (id, s) => id -> s.filter(g => docFreq(g) <= maxDf) }
      val expected = (for {
        a <- kept.keys; b <- kept.keys if a < b
        inter = (kept(a) & kept(b)).size if inter > 0
        nSmall = math.min(kept(a).size, kept(b).size)
        // valueOf, not the exact-binary constructor — matches Spark's Round
        c = BigDecimal(java.math.BigDecimal.valueOf(inter.toDouble / nSmall))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble if c >= 0.5
        (s, l) = if (kept(a).size <= kept(b).size) (a, b) else (b, a)
      } yield (s, l) -> ((nSmall.toLong, inter.toLong, c))).toMap
      val out = Dedup.containmentPairs(docs, "doc_id", "text", k = 3, tau = 0.5, maxDf = maxDf)
        .collect()
        .map(r => (r.getInt(0), r.getInt(1)) -> ((r.getLong(2), r.getLong(3), r.getDouble(4))))
        .toMap
      assert(out == expected, s"maxDf=$maxDf")
      if (maxDf == 1000) { // sanity on the shape itself, not just the model
        assert(out((2, 1)) == ((6L, 6L, 1.0)), "subset dup must score containment 1.0")
        assert(out.contains((3, 4)) || out.contains((4, 3)))
      } else assert(out.isEmpty, "df cap 1 drops every shared gram")
      // cap observability (r16 verdict item 3): the build must record
      // exactly how much evidence the stop-gram cap excluded, so an
      // empty answer (the maxDf=1 leg HERE) is distinguishable from a
      // duplication-free corpus without re-running a probe
      val cs = Dedup.lastCapStats.get
      assert(cs.tag == "containmentPairs" && cs.maxDf == maxDf)
      assert(cs.gramsTotal == docFreq.size.toLong, s"maxDf=$maxDf")
      assert(cs.gramsExcluded == docFreq.values.count(_ > maxDf).toLong, s"maxDf=$maxDf")
      assert(cs.featureRowsTotal == docFreq.values.map(_.toLong).sum, s"maxDf=$maxDf")
      assert(cs.featureRowsExcluded ==
        docFreq.values.filter(_ > maxDf).map(_.toLong).sum, s"maxDf=$maxDf")
      if (maxDf == 1)
        assert(cs.excludedRowFraction > 0.0,
          "the empty answer must be attributable to the cap")
    }
  }

  test("containmentPairsIncremental equals the rebuild restricted to batch pairs") {
    // maxDf = 2 makes "p q r" (index df 2) a CAP-CROSSER when doc 11
    // arrives — the stored capped sizes must shrink via the crosser
    // correction, never by recounting the corpus
    val corpus = Seq(
      (1, "p q r s"), (2, "p q r t"), (3, "a b c d e")).toDF("doc_id", "text")
    val batch = Seq((11, "p q r s"), (12, "a b c d")).toDF("doc_id", "text")
    for (maxDf <- Seq(1000, 2)) {
      val index = Dedup.containmentGramIndex(corpus, "doc_id", "text")
      val gramDf = index.groupBy("g").agg(F.count(F.lit(1)).as("df"))
      val sizes = index.join(gramDf.filter(F.col("df") <= maxDf), "g")
        .groupBy("id").agg(F.count(F.lit(1)).as("n"))
      val inc = Dedup.containmentPairsIncremental(index, gramDf, sizes, batch,
          "doc_id", "text", k = 3, tau = 0.3, maxDf = maxDf)
        .collect()
        .map(r => (r.getInt(0), r.getInt(1)) -> ((r.getLong(2), r.getLong(3), r.getDouble(4))))
        .toMap
      val full = Dedup.containmentPairs(corpus.unionByName(batch), "doc_id", "text",
          k = 3, tau = 0.3, maxDf = maxDf)
        .collect()
        .map(r => (r.getInt(0), r.getInt(1)) -> ((r.getLong(2), r.getLong(3), r.getDouble(4))))
        .filter { case ((a, b), _) => a >= 11 || b >= 11 }
        .toMap
      assert(inc == full, s"maxDf=$maxDf")
      if (maxDf == 2)
        assert(inc.nonEmpty && full.keys.forall { case (a, b) => a >= 11 || b >= 11 })
    }
  }

  test("capPerGroup: absolute bound, churn-stable selection, map-side group limit") {
    import graft.pipeline.Sampling
    val df = (1 to 100).map(i => (i.toLong, if (i <= 90) "big" else "small")).toDF("id", "grp")
    val out = Sampling.capPerGroup(df, F.col("id"), F.col("grp"), 15)
    val counts = out.groupBy("grp").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts == Map("big" -> 15L, "small" -> 10L))
    // the chosen rows are exactly the cap smallest md5(id) per group
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString
    val expBig = (1L to 90L).sortBy(i => md5hex(i.toString)).take(15).toSet
    val gotBig = out.filter($"grp" === "big").select("id").collect().map(_.getLong(0)).toSet
    assert(gotBig == expBig)
    // invariant under physical layout
    val re = Sampling.capPerGroup(df.repartition(7), F.col("id"), F.col("grp"), 15)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(re == out.select("id").collect().map(_.getLong(0)).toSet)
    // rank filter must compile to a WindowGroupLimit (pre-shuffle top-k)
    assert(out.queryExecution.executedPlan.toString.contains("WindowGroupLimit"),
      "cap filter should plan a map-side WindowGroupLimit")
  }

  test("qualityGate keeps each group's top (1-pct) slice by score") {
    val docs = Seq(
      (1, "s1", "the cat and the dog walked to the house with a friend"),
      (2, "s1", "zz!! ## @@ %%"),
      (3, "s1", "one plain sentence that is of the usual sort and length"),
      (4, "s1", "x"),
      (5, "s2", "this is that and the other with more of the usual words"),
      (6, "s2", "qq ww ee rr tt"),
      (7, "s2", "short"),
      (8, "s2", "the of and to is that this with all stopwords here today")
    ).toDF("doc_id", "source", "text")
    val scored = docs
      .select($"doc_id", $"source", TextOps.qualityScore($"text").as("q"))
      .collect().map(r => (r.getInt(0), r.getString(1), r.getDouble(2)))
    val expected = scored.groupBy(_._2).iterator.flatMap { case (_, rows) =>
      val sorted = rows.toSeq.sortBy(r => (r._3, r._1))
      val n = sorted.size
      sorted.zipWithIndex.collect {
        case ((id, _, q), i) if i.toDouble / (n - 1) >= 0.75 =>
          id -> BigDecimal(java.math.BigDecimal.valueOf(q))
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      }
    }.toMap
    val out = TextOps.qualityGate(docs, "doc_id", "text", "source", pct = 0.75)
      .collect().map(r => r.getInt(0) -> r.getDouble(2)).toMap
    assert(out == expected)
    assert(out.keySet.intersect(Set(2, 4, 6, 7)).isEmpty, "garbage/short docs must not pass")
  }

  test("qualityGateApprox matches the exact gate within its rank bound on skewed groups") {
    // one big group with distinct scores (all-stopword text below the
    // 200-char length saturation => score strictly increases with
    // length), one tiny group — the skew shape the sketch path exists for
    val big = (1 to 50).map(i => (i, "big", ("the " * i).trim))
    val small = (101 to 105).map(i => (i, "small", ("the " * (i - 100)).trim))
    val docs = (big ++ small).toDF("doc_id", "source", "text")
    val exact = TextOps.qualityGate(docs, "doc_id", "text", "source", pct = 0.8)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getDouble(2)))
    val approx = TextOps.qualityGateApprox(docs, "doc_id", "text", "source",
      pct = 0.8, accuracy = 100000)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getDouble(2)))
    // same filter shape, sketch threshold: the exact keep-set is always
    // contained (the sketch's threshold sits at-or-below the exact cut
    // by its rank bound), and with accuracy >> n the difference is at
    // most the nearest-rank rounding row per group
    val exIds = exact.map(_._1).toSet
    val apIds = approx.map(_._1).toSet
    assert(exIds.subsetOf(apIds), s"exact=$exIds approx=$apIds")
    Seq("big", "small").foreach { g =>
      val ex = exact.count(_._2 == g); val ap = approx.count(_._2 == g)
      assert(ap - ex >= 0 && ap - ex <= 2, s"group $g: exact=$ex approx=$ap")
    }
    // scores agree bit-for-bit on the shared rows
    val exQ = exact.map(r => r._1 -> r._3).toMap
    approx.filter(r => exQ.contains(r._1)).foreach { r =>
      assert(r._3 == exQ(r._1), s"doc ${r._1}")
    }
  }

  test("qualityGateAuto dispatches by corpus size and falls back exact") {
    val docs = (1 to 20).map(i => (i, "s", ("the " * i).trim))
      .toDF("doc_id", "source", "text")
    val exact = TextOps.qualityGate(docs, "doc_id", "text", "source", 0.5)
      .collect().map(_.getInt(0)).toSet
    // below the threshold: byte-identical to the exact gate
    val auto = TextOps.qualityGateAuto(docs, "doc_id", "text", "source", 0.5)
      .collect().map(_.getInt(0)).toSet
    assert(auto == exact)
    // above the (forced-tiny) threshold: the sketch path engages and
    // stays inside the rank bound
    val autoApprox = TextOps.qualityGateAuto(docs, "doc_id", "text", "source", 0.5,
      approxAbove = 5L)
      .collect().map(_.getInt(0)).toSet
    assert(exact.subsetOf(autoApprox) && (autoApprox.size - exact.size) <= 2,
      s"exact=$exact approx=$autoApprox")
  }

  test("ngramNovelty: set-model fractions; short and null docs surface with null score") {
    val ref = Seq((100, "the quick brown fox jumps"), (101, "over the lazy dog"))
      .toDF("doc_id", "text")
    val docs = Seq(
      (1, "the quick brown fox jumps"),       // every 3-gram in ref -> 0.0
      (2, "completely novel phrasing here now"), // nothing shared -> 1.0
      (3, "the quick brown elephant sings loudly"), // first 3-gram known, rest not
      (4, "too short"),                       // < 3 tokens -> 0 grams, null
      (5, null.asInstanceOf[String])          // null text -> 0 grams, null
    ).toDF("doc_id", "text")
    val out = TextOps.ngramNovelty(docs, ref, "doc_id", "text", k = 3)
      .collect().map(r => r.getInt(0) ->
        ((r.getLong(1), r.getLong(2), if (r.isNullAt(3)) None else Some(r.getDouble(3)))))
      .toMap
    assert(out(1) == ((3L, 0L, Some(0.0))))
    assert(out(2) == ((3L, 3L, Some(1.0))))
    // doc 3: 4 grams, only "the quick brown" appears in ref
    assert(out(3)._1 == 4L && out(3)._2 == 3L && out(3)._3 == Some(0.75))
    assert(out(4) == ((0L, 0L, None)))
    assert(out(5) == ((0L, 0L, None)))
    assert(out.size == 5)
  }

  test("stripDuplicateSpans: cross-doc chunks removed, unique text and tails kept") {
    val docs = Seq(
      // docs 1 and 2 share the chunk "common header text" at different
      // positions; doc 1 also carries a 2-token tail past its last chunk
      (1, "common header text unique one alpha tail bit"),
      (2, "body two beta common header text"),
      (3, "entirely different content here"),  // 1 chunk, unshared + 1-token tail
      (4, "tiny"),                              // 0 chunks -> untouched
      (5, null.asInstanceOf[String])            // null in, null out
    ).toDF("doc_id", "text")
    val out = Dedup.stripDuplicateSpans(docs, "doc_id", "text", size = 3)
      .collect().map(r => r.getInt(0) ->
        ((if (r.isNullAt(1)) -1 else r.getInt(1), r.getInt(2),
          if (r.isNullAt(3)) null else r.getString(3))))
      .toMap
    assert(out(1) == ((8, 3, "unique one alpha tail bit")))
    assert(out(2) == ((6, 3, "body two beta")))
    assert(out(3) == ((4, 0, "entirely different content here")))
    assert(out(4) == ((1, 0, "tiny")))
    assert(out(5) == ((-1, 0, null)))
    // a doc made ENTIRELY of shared chunks empties to "" (not null)
    val docs2 = Seq((1, "a b c"), (2, "a b c")).toDF("doc_id", "text")
    val all = Dedup.stripDuplicateSpans(docs2, "doc_id", "text", size = 3)
      .collect().map(r => r.getString(3))
    assert(all.forall(_ == ""))
  }

  test("stripSpansFromProfile equals the inline form on its own dup profile") {
    val docs = Seq(
      (1, "common header text unique one alpha tail bit"),
      (2, "body two beta common header text"),
      (3, "entirely different content here"),
      (4, "tiny"),
      (5, null.asInstanceOf[String])).toDF("doc_id", "text")
    val inline = Dedup.stripDuplicateSpans(docs, "doc_id", "text", size = 3)
      .collect().map(r => r.toSeq).toSet
    // the stored profile = the same cross-doc duplicated hash set
    val chunks = docs.select($"doc_id",
      F.explode(TextOps.chunkHashesKernel(TextOps.tokens($"text"), 3)).as("chunk_hash"))
    val profile = chunks.groupBy("chunk_hash")
      .agg(F.countDistinct("doc_id").as("nd")).filter($"nd" > 1).select("chunk_hash")
    val stored = Dedup.stripSpansFromProfile(docs, profile, "doc_id", "text", size = 3)
      .collect().map(r => r.toSeq).toSet
    assert(stored == inline)
    // an externally-curated blocklist strips in docs that never shared
    val block = Seq("entirely different content").toDF("t")
      .select(F.md5(F.encode($"t", "UTF-8")).as("chunk_hash"))
    val out = Dedup.stripSpansFromProfile(docs, block, "doc_id", "text", size = 3)
      .collect().map(r => r.getInt(0) -> r.getString(3)).toMap
    assert(out(3) == "here")
  }

  test("slidingChunks: overlap, short tails, stride=window tiling, null text") {
    val toks = TextOps.tokens(F.lit("a b c d e f g"))
    def chunks(w: Int, s: Int) =
      spark.range(1).select(TextOps.slidingChunks(toks, w, s).as("c"))
        .head().getSeq[String](0)
    assert(chunks(3, 2) == Seq("a b c", "c d e", "e f g", "g"))
    assert(chunks(3, 3) == Seq("a b c", "d e f", "g"))       // disjoint tiling
    assert(chunks(10, 4) == Seq("a b c d e f g", "e f g"))   // window > n
    val nul = spark.range(1)
      .select(TextOps.slidingChunks(TextOps.tokens(F.lit(null).cast("string")), 3, 2).as("c"))
      .head()
    assert(nul.isNullAt(0))
  }

  test("corpusProfile: exact counts and decimal-summed mean quality") {
    val docs = Seq(
      (1, "web", "en", "the quick brown fox"),
      (2, "web", "en", "the quick brown fox"),   // exact dup of 1
      (3, "web", "en", "something else entirely"),
      (4, "web", "fr", "le chat"),
      (5, "lit", "en", null.asInstanceOf[String])
    ).toDF("doc_id", "source", "lang", "text")
    val out = TextOps.corpusProfile(docs, "source", "lang", "text")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))))
      .toMap
    assert(out(("web", "en")) == ((3L, 11L, 61L, 2L)))  // 3 docs, dup collapses to 2 unique
    assert(out(("web", "fr")) == ((1L, 2L, 7L, 1L)))
    assert(out(("lit", "en")) == ((1L, 0L, 0L, 0L)))    // null text: no tokens, no fingerprint
    assert(out.size == 3)
  }

  test("sourceJaccard: known chunk vocabularies give exact ratios") {
    // src A: chunks {abc, def}; src B: {abc, xyz}; src C: {qqq}
    val docs = Seq(
      ("A", "a b c d e f"), ("B", "a b c x y z"), ("C", "q q1 q2")
    ).toDF("source", "text")
    val out = Dedup.sourceJaccard(docs, "text", "source")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    // only (A,B) share: 1 shared of 2+2-1=3 distinct
    assert(out.toSeq == Seq(("A", "B", 1L, 0.333333)))
  }

  test("sourceChunkOverlapFromIndex: non-distinct index pinned (ADVICE r10 / r11 verdict 7)") {
    // a chunkHashIndex-shaped frame — one row per (chunk_hash, source)
    val distinctIx = Seq(("h1", "A"), ("h1", "B"), ("h2", "A")).toDF("chunk_hash", "source")
    def shared(ix: org.apache.spark.sql.DataFrame) =
      Dedup.sourceChunkOverlapFromIndex(ix)
        .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(shared(distinctIx) == Map(("A", "B") -> 1L))
    // the SAME membership with one duplicated row: the documented
    // precondition violation — n_shared inflates (2, not 1), silently
    val dupIx = distinctIx.union(Seq(("h1", "A")).toDF("chunk_hash", "source"))
    assert(shared(dupIx) == Map(("A", "B") -> 2L),
      "default path is job-free and trusts the precondition")
    // under the debug conf the violation fails FAST at construction
    try {
      spark.conf.set("graft.debug.assertDistinctIndex", "true")
      val e = intercept[IllegalArgumentException](Dedup.sourceChunkOverlapFromIndex(dupIx))
      assert(e.getMessage.contains("not chunkHashIndex-shaped"), e.getMessage)
      // and a conforming index passes the check unchanged
      assert(shared(distinctIx) == Map(("A", "B") -> 1L))
    } finally spark.conf.unset("graft.debug.assertDistinctIndex")
  }

  test("temperatureRates: smallest source keeps all; alpha=0.5 is sqrt(n_min/n)") {
    val docs = (1 to 16).map(i => (i, if (i <= 4) "small" else "big", "x"))
      .toDF("doc_id", "source", "text")
    val out = graft.pipeline.Sampling.temperatureRates(docs, "source", alpha = 0.5)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(out("small") == ((4L, 1.0)))
    // (4/12)^0.5 = 0.577350...
    assert(out("big") == ((12L, 0.57735)))
    // alpha = 1 keeps observed proportions: every rate 1.0
    val id = graft.pipeline.Sampling.temperatureRates(docs, "source", alpha = 1.0)
      .collect().map(_.getDouble(2))
    assert(id.forall(_ == 1.0))
  }
}
