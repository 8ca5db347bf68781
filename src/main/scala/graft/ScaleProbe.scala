package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.{functions => F}

/** Scale-growth probe: synthesizes a 10× corpus from sf0.1 (6M-row
  * lineitem, 50k documents, 20k embeddings) by unioning key-shifted
  * copies, times a representative query subset at both scales, and
  * prints the per-query scaling exponent e = log10(t_10x / t_1x) —
  * e ≈ 1 is linear, e ≫ 1 flags a shape that would not survive a
  * further 100× (PERF.md records the findings).
  *
  * Document ids shift by 5,000 per copy so they stay below the 1,000,000
  * offset the dedup queries use for their corpus∪copy construction;
  * order keys shift by 10,000,000 so lineitem↔orders joins stay
  * consistent within each copy. Dimension tables are carried unchanged
  * (at 100 TB dims stay broadcast-sized — that is the point of a star
  * schema). Output goes to /tmp, never into the read-only testdata.
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val base = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val out = if (args.length > 1) args(1) else "/tmp/sfprobe"
    val factor = if (args.length > 2) args(2).toInt else 10
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // probe knob (r10 verdict task 1): starve the exact-verify
      // broadcast budget to force the shuffled fallback branch at
      // corpus sizes this box can actually build
      .config("graft.broadcastVecMaxBytes", sys.env.getOrElse(
        "GRAFT_BC_VEC_BYTES", (128L * 1024 * 1024).toString))
      // probe knob: shrink the containment pair budget below the
      // library default when probing on a disk-constrained box
      .config("graft.containment.maxPairs", sys.env.getOrElse(
        "GRAFT_CONTAINMENT_MAX_PAIRS", "500000000"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // the shift spans below assume the sf0.1 base corpus (5k docs, 2k
    // vectors, <10M order keys); a larger base would make copies
    // overlap, and factor > 200 would push doc ids past the 1,000,000
    // corpus∪copy offset the dedup queries use — fail loudly instead of
    // emitting silently-wrong exponents
    require(factor >= 2 && factor <= 200, s"factor $factor outside [2, 200]")
    // guard on MAX ids, not row counts: a sparse-id corpus could pass a
    // count check while its top ids overflow the shift spans, silently
    // colliding copies (ADVICE r05)
    def maxOf(table: String, col: String): Long =
      spark.read.parquet(s"$base/$table.parquet")
        .agg(F.max(F.col(col).cast("long"))).head().getLong(0)
    val maxDoc = maxOf("documents", "doc_id")
    require(maxDoc < 5000L,
      s"$base max doc_id $maxDoc >= 5000; doc shift span assumes the sf0.1 base")
    require(maxDoc + (factor - 1) * 5000L < 1000000L,
      s"shifted doc ids would cross the 1,000,000 corpus-union offset")
    val maxVec = maxOf("embeddings", "vec_id")
    require(maxVec < 2000L,
      s"$base max vec_id $maxVec >= 2000; vec shift span assumes the sf0.1 base")
    val maxOrd = maxOf("orders", "o_orderkey")
    require(maxOrd < 10000000L,
      s"$base max o_orderkey $maxOrd >= 10,000,000; order shift span too small")

    val shiftCols: Map[String, Seq[(String, Long)]] = Map(
      "lineitem" -> Seq("l_orderkey" -> 10000000L),
      "orders" -> Seq("o_orderkey" -> 10000000L),
      "events" -> Seq("event_id" -> 10000000L),
      "documents" -> Seq("doc_id" -> 5000L),
      "embeddings" -> Seq("vec_id" -> 2000L))

    if (!new java.io.File(s"$out/lineitem.parquet").exists()) {
      Tables.names.foreach { t =>
        val df = spark.read.parquet(s"$base/$t.parquet")
        val scaled = shiftCols.get(t) match {
          case None => df // dimension tables stay as-is (broadcast-sized)
          case Some(shifts) =>
            (0 until factor).map { i =>
              shifts.foldLeft(df) { case (d, (c, span)) =>
                d.withColumn(c, F.col(c) + F.lit(i * span))
              }
            }.reduce(_ unionByName _)
        }
        scaled.repartition(32).write.mode("overwrite").parquet(s"$out/$t.parquet")
        println(s"[probe] built $t")
      }
    }

    val sel0 = Seq(
      "q01_agg", "q12_merge_inner", "q33_sort_head", "q40_exact_dedup",
      "q41_minhash_lsh", "q42_simhash_edges", "q44_embedding_dedup",
      "q47_langid", "q55_cosine_pairs", "q56_knn_ivf", "q58_dup_clusters",
      "q62_tfidf", "q67_chunk_dedup", "q73_curation_funnel",
      "q75_unigram_logprob", "q76_contamination", "q79_simhash_clusters",
      "q80_incremental_dedup", "q81_incremental_embedding",
      "q82_dedup_keepers", "q83_sequence_packing", "q84_mixture_rates",
      "q85_bloom_incremental", "q86_train_val_test",
      "q87_source_overlap", "q88_source_overlap_incremental",
      "q89_containment_pairs", "q90_source_caps", "q91_quality_gate",
      "q92_containment_incremental", "q93_ngram_novelty",
      "q94_strip_dup_spans", "q95_source_jaccard", "q96_temperature_mixture",
      "q97_corpus_profile", "q98_sliding_chunks", "q100_winnow_overlap")
    // q99_knn_classify excluded by design: its oracle split grows BOTH the
    // query and corpus sides, so the brute verify is quadratic by
    // contract (the q42-pair-form situation); production classification
    // swaps in the ivfTopK candidate stage — probed below as
    // x99_knn_classify_ivf (r11 verdict task 3), the PRODUCTION shape:
    // crawl-sized query set (the whole corpus, shifted) classified
    // against the labeled corpus through the cell probe, nlist on the
    // same m·√n rule as the cosine-pairs family, label attach
    // count-gated (over the bound at probe scale → shuffled join).
    val extraProbes: Map[String, (SparkSession, String) => DataFrame] = Map(
      // The WHOLE-FRAME prefix family (r12 verdict task 1): no registered
      // query carries the empty-partitionBy shape (q24/q25/q32 are
      // per-key), so the chunked plans in graft.core.Prefix are probed
      // here directly. Results return UNordered (the checksum action is
      // order-insensitive); .out would append a global sort and measure
      // that instead of the operator.
      "x24_cumsum_global" -> ((s, dir) => {
        val f = graft.core.TadaFrame.ingest(
          Tables.lineitem(s, dir).select(F.col("l_orderkey"), F.col("l_quantity")))
        graft.core.Analytics.cumSum(f, "l_quantity", "cs").df
          .select("l_orderkey", "l_quantity", "cs")
      }),
      "x25_shift_global" -> ((s, dir) => {
        val f = graft.core.TadaFrame.ingest(
          Tables.lineitem(s, dir).select(F.col("l_orderkey"), F.col("l_quantity")))
        graft.core.Analytics.shift(f, "l_quantity", 3, "prev").df
          .select("l_orderkey", "l_quantity", "prev")
      }),
      "x32_ffill_global" -> ((s, dir) => {
        val f = graft.core.TadaFrame.ingest(
          Tables.lineitem(s, dir).select(F.col("l_orderkey"),
            F.when(F.col("l_quantity") < 5, F.lit(null)).otherwise(F.col("l_quantity")).as("v")))
        f.fillNull(Map("v" -> graft.core.FillNullHow.Forward)).df
          .select("l_orderkey", "v")
      }),
      // r14 verdict task 1: the sorted-frame ordinal family. Grouped
      // reduce/positional on a SORTED frame (partition-local in-group
      // windows + reduced-output rep ranking) and anchorOrder /
      // order-key overwrite (Prefix.materializeOrd banded chunked
      // ordinal). No registered query carries the shapes; *_global
      // twins re-create the r13 plan (global one-partition row_number)
      // inline for the A/B.
      "xo1_sum_sorted" -> ((s, dir) => {
        val f = graft.core.TadaFrame.ingest(
          Tables.events(s, dir).select(F.col("event_id"), F.col("user_id"), F.col("value")))
          .sort(graft.core.Sorter("value"), graft.core.Sorter("event_id"))
        f.groupBy("user_id").sum("value").df
      }),
      "xo2_first_sorted" -> ((s, dir) => {
        val f = graft.core.TadaFrame.ingest(
          Tables.events(s, dir).select(F.col("event_id"), F.col("user_id"), F.col("value")))
          .sort(graft.core.Sorter("value"), graft.core.Sorter("event_id"))
        f.groupBy("user_id").first("value").df
      }),
      "xo2g_first_global" -> ((s, dir) => {
        // the r13 shape: ordinal recomputed through an EMPTY-partition
        // row_number over the whole frame before the grouped pick
        import org.apache.spark.sql.expressions.Window
        val d0 = Tables.events(s, dir).select(F.col("event_id"), F.col("user_id"), F.col("value"))
        val d = d0.withColumn("__o", F.row_number().over(
          Window.orderBy(F.col("value").asc_nulls_last, F.col("event_id").asc)).cast("long"))
        val w = Window.partitionBy(F.col("user_id")).orderBy(F.col("__o").asc)
        d.withColumn("__gp", F.row_number().over(w))
          .groupBy("user_id")
          .agg(F.min(F.col("__o")).as("__ord"),
            F.max(F.when(F.col("__gp") === 1, F.col("value"))).as("first_value"))
      }),
      "xo3_anchor_drop" -> ((s, dir) => {
        // dropCols of the sort key → anchorOrder materializes the order
        // into the hidden ordinal (chunked banded form); the checksum
        // reads the ordinal so the materialization is the measured work
        val f = graft.core.TadaFrame.ingest(
          Tables.lineitem(s, dir).select(F.col("l_orderkey"),
            F.col("l_quantity"), F.col("l_extendedprice")))
          .sort(graft.core.Sorter("l_quantity"), graft.core.Sorter("l_orderkey"))
        f.dropCols("l_quantity").df
      }),
      "xo3g_anchor_global" -> ((s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val d = Tables.lineitem(s, dir).select(F.col("l_orderkey"),
          F.col("l_quantity"), F.col("l_extendedprice"))
        d.withColumn("__ord", F.row_number().over(
            Window.orderBy(F.col("l_quantity").asc_nulls_last, F.col("l_orderkey").asc))
            .cast("long"))
          .drop("l_quantity")
      }),
      "xo4_cumsum_onto_key" -> ((s, dir) => {
        // overwriting the sort key: anchored (chunked ordinal) + chunked
        // cumsum values — until r14 this was the global window fallback
        val f = graft.core.TadaFrame.ingest(
          Tables.lineitem(s, dir).select(F.col("l_orderkey"), F.col("l_quantity")))
          .sort(graft.core.Sorter("l_quantity"), graft.core.Sorter("l_orderkey"))
        graft.core.Analytics.cumSum(f, "l_quantity", "l_quantity").df
      }),
      "xo5_rollingn_frame" -> ((s, dir) => {
        // whole-frame RollingN (r14 chunked head-carry plan)
        val f = graft.core.TadaFrame.ingest(
          Tables.lineitem(s, dir).select(F.col("l_orderkey"), F.col("l_quantity")))
        graft.core.Rolling.rollingN(f, 4, "l_quantity", x => F.sum(x), "r").df
      }),
      "xo5g_rollingn_global" -> ((s, dir) => {
        val f = graft.core.TadaFrame.ingest(
          Tables.lineitem(s, dir).select(F.col("l_orderkey"), F.col("l_quantity")))
        graft.core.Rolling.rollingNWindow(f, 4, "l_quantity", x => F.sum(x), "r").df
      }),
      // corpus-read floor for the text family: checksumming the raw text
      // column IS the minimum cost of any full-text operator — q48's
      // honest lower bound (r12 verdict task 2)
      "x48_read_floor" -> ((s, dir) =>
        Tables.documents(s, dir).select(F.col("doc_id"), F.col("text"))),
      "x99_knn_classify_ivf" -> ((s, dir) => {
        val e = Tables.embeddings(s, dir).select(F.col("vec_id"), F.col("embedding"))
        val corpus = e.withColumn("label", (F.col("vec_id") % 8).cast("int"))
        val queries = e.select((F.col("vec_id") + 1000000L).as("vec_id"),
          F.col("embedding"))
        // QUARANTINED PATTERN (r12 verdict): a count() at query-
        // construction time is acceptable ONLY here, in a probe-only
        // entry, where the sizing scan is part of the honest measured
        // work. Registered queries must never do this — they carry a
        // job-free plan-construction contract (PipelineSpec pins it);
        // production callers size via Similarity.memoizedCount behind
        // explicit nlist/rowCount parameters instead.
        val n = corpus.count()
        val nlist = math.max(16, math.ceil(8 * math.sqrt(n.toDouble)).toInt)
        graft.pipeline.Similarity.knnClassifyIvf(corpus, queries, k = 5,
          nlist = nlist, nprobe = 4)
      }))
    // optional 4th arg: comma-separated name prefixes to re-probe a
    // subset — resolved against ALL registered queries plus the
    // probe-only entries above, not just the default sweep (ProbeAudit
    // emits names outside sel0; q99's exclusion is default-sweep only)
    val qs = SparkEntry.queries ++ extraProbes
    val sel = if (args.length > 3) {
      val ps = args(3).split(",")
      qs.keys.toSeq.sorted.filter(n => ps.exists(n.startsWith))
    } else sel0
    // GRAFT_PROBE_FORCE=1 swaps the count() action for a full-column
    // checksum. count() lets Catalyst prune work that does not change
    // cardinality — a rewrite behind a left join against a unique-keyed
    // aggregate (q94) or a novelty join (q93) is eliminated entirely
    // and the probe measures a parquet row count. The checksum forces
    // every output column to materialize; join/agg-shaped queries are
    // unaffected either way (their cardinality IS the work), so the
    // default stays count() for continuity with recorded exponents.
    val force = sys.env.get("GRAFT_PROBE_FORCE").contains("1")
    def time(fn: (SparkSession, String) => DataFrame, dir: String): Double = {
      val t0 = System.nanoTime()
      val df = fn(spark, dir)
      if (force)
        // decimal(38,0): summing raw 64-bit hashes overflows ANSI long
        // addition after ~2 rows of same-sign extremes
        df.agg(F.sum(F.xxhash64(df.columns.map(F.col).toSeq: _*)
          .cast("decimal(38,0)"))).collect()
      else df.count()
      val elapsed = (System.nanoTime() - t0) / 1e9
      // cache teardown happens OUTSIDE the measured interval — it would
      // otherwise skew the overhead-bound sub-second exponents
      spark.catalog.clearCache()
      // shuffle files persist until the ContextCleaner GCs their
      // dependencies: without a nudge, min-of-2 legs of a budget-bound
      // pair query stack ~2x the per-leg spill on disk (this killed the
      // first two r11 containment probes at 100x). Two gc passes give
      // the weak-ref queue a chance to drain before the next leg.
      System.gc(); Thread.sleep(500); System.gc(); Thread.sleep(500)
      elapsed
    }
    // GRAFT_PROBE_LEGS=1 runs a single timed leg per scale instead of
    // min-of-2 — for disk-bound heavy queries where a second leg's
    // not-yet-GC'd shuffle files double peak scratch usage (the failure
    // mode that killed two r11 containment probes at 100×)
    // clamped: a non-numeric value or 0 must not crash a long probe run
    // partway through (bare toInt throws; legs=0 makes the min empty)
    val legs = math.max(1,
      sys.env.get("GRAFT_PROBE_LEGS").flatMap(_.toIntOption).getOrElse(2))
    println(f"${"query"}%-22s ${"t_1x"}%8s ${s"t_${factor}x"}%8s  exp")
    sel.foreach { name =>
      qs.get(name).foreach { fn =>
        // one query's failure (a driver-side cap tripping at 100×, an
        // OOM) must not kill the rest of a long sweep
        try {
          // warm once at 1× (JIT), then min of `legs` at each scale
          time(fn, base)
          val t1 = (0 until legs).map(_ => time(fn, base)).min
          val t10 = (0 until legs).map(_ => time(fn, out)).min
          val exp = math.log10(t10 / t1) / math.log10(factor.toDouble)
          println(f"$name%-22s $t1%8.2f $t10%8.2f  $exp%.2f")
        } catch {
          case e: Throwable =>
            println(f"$name%-22s FAILED: ${String.valueOf(e.getMessage).take(120)}")
        }
      }
    }
    spark.stop()
  }
}
