package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.{functions => F}

/** Third-decade (×1000) probe for the chunked-ordinal family (r15
  * verdict item 7): anchorOrder via `Prefix.materializeOrd` (the xo3
  * shape — dropping a sort key materializes the order into the banded
  * chunked ordinal) and whole-frame `Prefix.rollingN` (the xo5 shape —
  * chunked head-carry). Both carry machinery whose constants grow with
  * chunk count; the ×100 points exist (ScaleProbe xo family), this adds
  * the ×1000 decade with the DocProbe protocol: one leg per scale,
  * FORCED checksum printed (rows + order-free hash so two runs are
  * comparable), disk reported per leg.
  *
  * Copies shift l_orderkey by 10^7 (sf0.1 max orderkey < 10^7), the
  * ScaleProbe span — at ×1000 ids stay < 10^10, far inside long range.
  *
  * Run like DocProbe: plain `java` with the Spark jars + add-opens,
  * main `graft.OrdProbe`, args `[factor=1000] [xo3 xo5]`.
  */
object OrdProbe {
  def main(args: Array[String]): Unit = {
    val base = "/root/testdata/sf0.1"
    val out = "/tmp/ordprobe"
    val factor = args.collectFirst {
      case a if a.startsWith("factor=") => a.drop(7).toInt
    }.getOrElse(1000)
    val only = args.filter(_.startsWith("xo")).toSet
    def on(p: String) = only.isEmpty || only.contains(p)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      // chunk count for the sorted-frame prefix family = shuffle
      // partitions; at 600M rows the 32 default means 19M-row
      // single-task chunk sorts (external-sort spill) — the probe knob
      // shows the trajectory is partition-count-governed, exactly the
      // knob a real cluster scales with the data
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("GRAFT_ORD_SHUFFLE", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val maxKey = spark.read.parquet(s"$base/lineitem.parquet")
      .agg(F.max(F.col("l_orderkey").cast("long"))).head().getLong(0)
    require(maxKey < 10000000L, s"orderkey shift span assumes sf0.1 (max $maxKey)")

    def build(f: Int): String = {
      val path = s"$out/lineitem_${f}x.parquet"
      if (!new java.io.File(path).exists()) {
        val df = spark.read.parquet(s"$base/lineitem.parquet")
          .select(F.col("l_orderkey"), F.col("l_quantity"), F.col("l_extendedprice"))
        (0 until f).map(i =>
            df.withColumn("l_orderkey", F.col("l_orderkey") + F.lit(i * 10000000L)))
          .reduce(_ unionByName _)
          .repartition(64).write.mode("overwrite").parquet(path)
        println(s"[ordprobe] built ${f}x")
      }
      path
    }

    def dfFree(): String =
      f"${new java.io.File("/tmp").getUsableSpace / (1L << 30)}%d GiB free"

    // events copies for the rollingDuration leg (r18): each copy's ts
    // shifts by 400 days so windows never cross copies and the time
    // axis keeps a bucketable span at any factor
    def buildEv(f: Int): String = {
      val path = s"$out/events_${f}x.parquet"
      if (!new java.io.File(path).exists()) {
        val df = graft.Tables.events(spark, base)
          .select(F.col("event_id"), F.col("ts"), F.col("value"))
        (0 until f).map(i =>
            df.withColumn("ts", F.col("ts") + F.expr(s"INTERVAL ${i * 400} DAYS"))
              .withColumn("event_id", F.col("event_id") + F.lit(i * 10000000L)))
          .reduce(_ unionByName _)
          .repartition(64).write.mode("overwrite").parquet(path)
        println(s"[ordprobe] built events ${f}x")
      }
      path
    }

    def time(tag: String, mk: => DataFrame): Unit =
      try {
        val t0 = System.nanoTime()
        val df = mk
        val r = df.agg(F.count(F.lit(1)),
          F.sum(F.xxhash64(df.columns.map(F.col).toSeq: _*)
            .cast("decimal(38,0)"))).collect()(0)
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"[ordprobe] $tag%-26s $dt%9.2f s   rows=${r.get(0)} sum=${r.get(1)}   ${dfFree()}")
      } catch {
        case e: Throwable =>
          println(s"[ordprobe] $tag FAILED: ${String.valueOf(e.getMessage).take(160)}  ${dfFree()}")
      } finally {
        graft.core.CacheRegistry.releaseAll()
        spark.catalog.clearCache()
        System.gc(); Thread.sleep(500); System.gc(); Thread.sleep(500)
      }

    for (f <- Seq(1, factor)) {
      val path = if (f == 1) s"$base/lineitem.parquet" else build(f)
      def li = spark.read.parquet(path)
        .select(F.col("l_orderkey"), F.col("l_quantity"), F.col("l_extendedprice"))
      println(s"[ordprobe] === ${f}x: ${dfFree()} ===")
      // corpus floor: checksumming the raw columns IS the minimum cost
      // of any full-materialization probe at this scale (the x48
      // read-floor discipline) — the anchor probes are read against it
      if (on("xo0")) time(s"xo0_read_floor_${f}x", li)
      // Spark's own global sort (range exchange + per-partition sort) +
      // a banded ordinal from monotonically_increasing_id — the
      // apples-to-apples PERFORMANCE comparator for materializeOrd
      // (rejected as the implementation: range boundaries are sampled
      // per execution, the determinism hazard Prefix documents). The
      // checksum consumes the ordinal, so EliminateSorts cannot prune
      // the sort (a bare orderBy under the agg measured the read floor
      // — the GRAFT_PROBE_FORCE hazard class).
      if (on("xo3s")) time(s"xo3s_spark_sort_${f}x",
        li.orderBy(F.col("l_extendedprice"), F.col("l_orderkey"))
          .withColumn("o", F.monotonically_increasing_id()))
      if (on("xo3")) time(s"xo3_anchor_drop_${f}x", {
        val fr = graft.core.TadaFrame.ingest(li)
          .sort(graft.core.Sorter("l_quantity"), graft.core.Sorter("l_orderkey"))
        fr.dropCols("l_quantity").df
      })
      // high-cardinality-key twin: l_quantity has only 50 distinct
      // values, so xo3's width-bucketing caps at ≤50 chunks no matter
      // the partition count — per-chunk sorts grow 10× per decade and
      // dominate the ×1000 point. l_extendedprice is ~continuous, so
      // the bucketing reaches the full configured chunk count; the gap
      // between xo3 and xo3b isolates key-cardinality cost from the
      // ordinal machinery itself.
      if (on("xo3b")) time(s"xo3b_anchor_drop_hk_${f}x", {
        val fr = graft.core.TadaFrame.ingest(li)
          .sort(graft.core.Sorter("l_extendedprice"), graft.core.Sorter("l_orderkey"))
        fr.dropCols("l_extendedprice").df
      })
      // r19: HEAVY-TAILED first SORT key (price^7, ~14 decades) — the
      // xo3b twin on a skewed axis. Under the pre-r19 equi-width sort
      // chunking ~all rows landed in chunk 0 (the whole prefix family
      // degraded to one chunk); the equi-depth boundaries keep the
      // chunks balanced. Read against xo3b in the same window: a
      // comparable number means the skew is absorbed.
      if (on("xo13")) time(s"xo13_anchor_drop_skewed_${f}x", {
        val fr = graft.core.TadaFrame.ingest(
          li.withColumn("p", F.pow(F.col("l_extendedprice"), 7)))
          .sort(graft.core.Sorter("p"), graft.core.Sorter("l_orderkey"))
        fr.dropCols("p").df
      })
      // STRING-key twins (r17 — before the string image, BOTH of these
      // fell to the single-partition global window, the one remaining
      // parallelism cliff; there is no honest pre-r17 number to compare
      // against because that plan shape is precisely what the image
      // removes). xo6 = high-cardinality string (zero-padded orderkey:
      // lcp-stripped digit window, width-bucket path — the xo3b twin);
      // xo6b = 5-value enum string (injective image, value-chunking —
      // the xo3 low-card twin).
      if (on("xo6")) time(s"xo6_anchor_drop_str_${f}x", {
        val fr = graft.core.TadaFrame.ingest(
          li.withColumn("sk", F.format_string("ord%010d", F.col("l_orderkey"))))
          .sort(graft.core.Sorter("sk"), graft.core.Sorter("l_orderkey"))
        fr.dropCols("sk").df
      })
      if (on("xo6b")) time(s"xo6b_anchor_drop_strenum_${f}x", {
        val fr = graft.core.TadaFrame.ingest(
          li.withColumn("sk", F.concat(F.lit("f"),
            (F.col("l_quantity").cast("long") % 5).cast("string"))))
          .sort(graft.core.Sorter("sk"), graft.core.Sorter("l_orderkey"))
        fr.dropCols("sk").df
      })
      if (on("xo5")) time(s"xo5_rollingn_frame_${f}x", {
        val fr = graft.core.TadaFrame.ingest(
          li.select(F.col("l_orderkey"), F.col("l_quantity")))
        graft.core.Rolling.rollingN(fr, 4, "l_quantity", x => F.sum(x), "r").df
      })
      // r18: whole-frame dense rank / exclusive percentile over the
      // NEAR-UNIQUE l_extendedprice — the dispatcher routes to the
      // chunked value-axis plans (Analytics.rankDenseChunked /
      // percentileChunked). Comparators: xo3s (Spark global sort,
      // e≈0.74-0.75 at ×1000 from the r14/r17 probes) is the bound the
      // chunked plan must beat; xo7w is the pre-r18 single-partition
      // window form, run at ×1 only (at ×1000 it IS the cliff — one
      // thread sorting 600M rows; measured once in r12's q26 100×
      // probe at 32 s on 60M rows).
      if (on("xo7")) time(s"xo7_rank_chunked_${f}x", {
        val fr = graft.core.TadaFrame.ingest(li)
        graft.core.Analytics.rankDense(fr, "l_extendedprice", "rk").df
      })
      if (on("xo7p")) time(s"xo7p_pct_chunked_${f}x", {
        val fr = graft.core.TadaFrame.ingest(li)
        graft.core.Analytics.percentile(fr, "l_extendedprice", "pc").df
      })
      if (on("xo7w") && f == 1) time(s"xo7w_rank_window_${f}x", {
        val fr = graft.core.TadaFrame.ingest(li)
        graft.core.Analytics.rankDenseWindow(fr, "l_extendedprice", "rk").df
      })
      // r18: grouped exact median, agg-buffer form vs by-value counting
      // form (TadaGrouped.median dispatch) — the q14 buffer-shape
      // question at scale: 4 groups over the copied corpus means the
      // percentile(c, 0.5) agg holds ~rows/4 doubles in ONE task's
      // buffer, while the by-value form's final stage is 4 × |vocab|.
      if (on("xo8")) time(s"xo8_median_byvalue_${f}x", {
        val fr = graft.core.TadaFrame.ingest(
          li.withColumn("g", (F.col("l_orderkey") % 4).cast("int")))
        fr.groupBy("g").median("l_quantity").df
      })
      if (on("xo8b")) time(s"xo8b_median_aggbuf_${f}x", {
        val fr = graft.core.TadaFrame.ingest(
          li.withColumn("g", (F.col("l_orderkey") % 4).cast("int")))
        fr.groupBy("g").reduceWith(Seq(
          "median_l_quantity" -> F.percentile(F.col("l_quantity"), F.lit(0.5)))).df
      })
      // r18: whole-frame rollingDuration — the time-bucket plan
      // (Rolling.rollingDurationChunked) vs the pre-r18 global range
      // window (xo9w, ×1 only — it IS the cliff)
      if (on("xo9") || on("xo9w")) {
        val evPath = if (f == 1) null else buildEv(f)
        def ev = if (f == 1)
          graft.Tables.events(spark, base)
            .select(F.col("event_id"), F.col("ts"), F.col("value"))
        else spark.read.parquet(evPath)
        if (on("xo9")) time(s"xo9_rollingdur_frame_${f}x", {
          val fr = graft.core.TadaFrame.ingest(ev)
          graft.core.Rolling.rollingDuration(fr, "ts", 3600000000L, "value",
            x => F.sum(x), "r").df
        })
        if (on("xo9w") && f == 1) time(s"xo9w_rollingdur_window_${f}x", {
          val fr = graft.core.TadaFrame.ingest(ev)
          graft.core.Rolling.rollingDurationWindow(fr, "ts", 3600000000L, "value",
            x => F.sum(x), "r").df
        })
        // r19: grouped rollingDuration with FEW keys (4 segments). xo9g =
        // the dispatcher (composed (key, bucket) time-bucket plan — the
        // key HLL of 4 is far under the partition count); xo9gw = the
        // plain keyed window forced, whose parallelism is capped at 4
        // regardless of cores — the cliff the composition removes.
        if (on("xo9g")) time(s"xo9g_rollingdur_grouped_${f}x", {
          val fr = graft.core.TadaFrame.ingest(
            ev.withColumn("g", (F.col("event_id") % 4).cast("int")))
          graft.core.Rolling.rollingDuration(fr, "ts", 3600000000L, "value",
            x => F.sum(x), "r", partitionBy = Seq("g")).df
        })
        if (on("xo9gw")) time(s"xo9gw_rollingdur_grouped_kw_${f}x", {
          val fr = graft.core.TadaFrame.ingest(
            ev.withColumn("g", (F.col("event_id") % 4).cast("int")))
          graft.core.Rolling.rollingDurationKeyedWindow(fr, "ts", 3600000000L,
            "value", x => F.sum(x), "r", Seq("g")).df
        })
        // r19 (r18 verdict item 2): BURSTY time axis — 90% of rows
        // squeezed into one hot hour of the span, d = 60 s. Equi-width
        // buckets over [min, max] landed the hot 90% in one bucket; the
        // equi-depth quantile boundaries (thinned to ≥ 2d) keep the
        // plan parallel. Read against xo9 (uniform axis, same factor):
        // a comparable number means the skew is absorbed.
        if (on("xo11")) time(s"xo11_rollingdur_bursty_${f}x", {
          // hot hour = 2024-01-15T00 UTC (epoch 1705276800); the burst
          // second is a deterministic hash of the event id
          val hotSec = (F.xxhash64(F.col("event_id")) % 3600 + 3600) % 3600
          val burst = ev.withColumn("ts",
            F.when(F.col("event_id") % 10 < 9,
              F.timestamp_micros(F.lit(1705276800000000L) + hotSec * 1000000L))
              .otherwise(F.col("ts")))
          val fr = graft.core.TadaFrame.ingest(burst)
          graft.core.Rolling.rollingDuration(fr, "ts", 60000000L, "value",
            x => F.sum(x), "r").df
        })
      }
      // r19 (r18 verdict item 2): HEAVY-TAILED value axis — p = price^7
      // spans ~14 decades (the q115 shape). Under equi-width buckets
      // ~60% of rows landed in bucket 0; equi-depth boundaries keep the
      // chunked rank balanced. Read against xo7 (uniform axis, same
      // factor): a comparable number means the skew is absorbed.
      if (on("xo10")) {
        time(s"xo10_rank_skewed_${f}x", {
          val fr = graft.core.TadaFrame.ingest(li.withColumn("p",
            F.pow(F.col("l_extendedprice"), 7)))
          graft.core.Analytics.rankDense(fr, "p", "rk").df
        })
        // balance evidence: max-chunk share under the equi-depth
        // boundaries (equi-width put ~60% of a ^7 axis in chunk 0)
        try {
          val fr = graft.core.TadaFrame.ingest(li.withColumn("p",
            F.pow(F.col("l_extendedprice"), 7)))
          graft.core.Analytics.valueChunkCounts(fr, "p").foreach { case (cc, k) =>
            val top = cc.orderBy(F.desc("n")).limit(3).collect()
              .map(r => s"c${r.get(0)}:${r.getLong(1)}").mkString(" ")
            val tot = cc.agg(F.sum("n")).head().getLong(0)
            println(s"[ordprobe] xo10_${f}x chunk balance: k=$k total=$tot top3=[$top]")
          }
        } catch { case e: Throwable =>
          println(s"[ordprobe] xo10 balance FAILED: ${String.valueOf(e.getMessage).take(120)}") }
      }
      // r19: banded rankRep (verdict item 1) — sorted frame grouped by a
      // NEAR-UNIQUE key. xo12 = the dispatcher (banded chunked ordinal
      // over the rep fields); xo12w = the single-partition reduced-output
      // window forced via the conf threshold, ×1 only (at ×1000 it IS
      // the cliff: a one-thread sort of ~600M reduced rows).
      if (on("xo12")) time(s"xo12_rankrep_banded_${f}x", {
        spark.conf.set("graft.rankRep.maxWindowGroups", "32768")
        val fr = graft.core.TadaFrame.ingest(li)
          .sort(graft.core.Sorter("l_extendedprice"), graft.core.Sorter("l_orderkey"))
        fr.groupBy("l_orderkey").reduceWith(Seq("s" -> F.sum(F.col("l_quantity")))).df
      })
      // r20 (r19 verdict item 5): grouped ROWS-frame ops under FEW keys
      // (4). xo14/xo14c = the dispatcher (the composed (key, chunk)
      // plan — 4 keys sit far under the partition count); xo14w = the
      // plain keyed window FORCED, whose parallelism is capped at 4
      // tasks regardless of cores — the xo9gw shape on the rows axis,
      // which the composition removes.
      if (on("xo14")) time(s"xo14_rollingn_grouped_${f}x", {
        val fr = graft.core.TadaFrame.ingest(
          li.withColumn("g", (F.col("l_orderkey") % 4).cast("int")))
        graft.core.Rolling.rollingN(fr, 4, "l_quantity", x => F.sum(x), "r",
          partitionBy = Seq("g")).df
      })
      if (on("xo14c")) time(s"xo14c_cumsum_grouped_${f}x", {
        val fr = graft.core.TadaFrame.ingest(
          li.withColumn("g", (F.col("l_orderkey") % 4).cast("int")))
        graft.core.Analytics.cumSum(fr, "l_quantity", "cs",
          partitionBy = Seq("g")).df
      })
      if (on("xo14cw")) time(s"xo14cw_cumsum_grouped_kw_${f}x", {
        val fr = graft.core.TadaFrame.ingest(
          li.withColumn("g", (F.col("l_orderkey") % 4).cast("int")))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(fr.df("g")).orderBy(fr.orderCols: _*)
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
        fr.withCol("cs", F.sum(F.coalesce(fr.df("l_quantity"),
          F.lit(0).cast(fr.df.schema("l_quantity").dataType))).over(w)).df
      })
      if (on("xo14w")) time(s"xo14w_rollingn_grouped_kw_${f}x", {
        val fr = graft.core.TadaFrame.ingest(
          li.withColumn("g", (F.col("l_orderkey") % 4).cast("int")))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(fr.df("g")).orderBy(fr.orderCols: _*).rowsBetween(0, 3)
        val complete = F.count(F.lit(1)).over(w) === 4
        fr.withCol("r", F.when(complete,
          F.sum(fr.df("l_quantity")).over(w))).df
      })
      if (on("xo12w") && f == 1) time(s"xo12w_rankrep_window_${f}x", {
        spark.conf.set("graft.rankRep.maxWindowGroups", "1000000000")
        try {
          val fr = graft.core.TadaFrame.ingest(li)
            .sort(graft.core.Sorter("l_extendedprice"), graft.core.Sorter("l_orderkey"))
          fr.groupBy("l_orderkey").reduceWith(Seq("s" -> F.sum(F.col("l_quantity")))).df
        } finally spark.conf.set("graft.rankRep.maxWindowGroups", "32768")
      })
    }
    spark.stop()
  }
}
