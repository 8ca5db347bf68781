package graft.queries

import graft.Tables
import graft.pipeline.{Dedup, Embeddings}
import org.apache.spark.sql.{functions => F}

/** Data-curation operators for training pipelines (round 3 widening):
  * repetition metrics, cross-doc chunk dedup, int8 quantization, and
  * fixed-point cluster statistics. Every query is DuckDB-oracle-checked;
  * determinism comes from integer/fixed-point arithmetic (exact,
  * order-independent reductions) rather than rounded floats wherever a
  * value crosses rows.
  */
object CurationQueries extends QueryPack {

  private val normSql =
    "trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'), ' +', ' ', 'g'))"

  /** DuckDB twin of `TextOps.qualityScore` (same shape as q48's oracle). */
  private val qualitySql: String = {
    val stopPat = graft.pipeline.TextOps.stopwords.mkString("\\b(", "|", ")\\b")
    val nTok = s"(CASE WHEN length($normSql) = 0 THEN 0 ELSE len(string_split($normSql, ' ')) END)"
    s"""least(CAST(length(text) AS DOUBLE) / 200.0, 1.0) * 0.4
       + least(CASE WHEN $nTok = 0 THEN 0.0
               ELSE CAST(len(regexp_extract_all($normSql, '$stopPat')) AS DOUBLE)
                    / $nTok END * 4.0, 1.0) * 0.4
       + (1.0 - least(CASE WHEN length(text) = 0 THEN 0.0
                      ELSE CAST(len(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) AS DOUBLE)
                           / length(text) END * 5.0, 1.0)) * 0.2"""
  }

  /** DuckDB twin of `TextOps.langId` (same argmax chain as q47's oracle). */
  private val langIdSql: String = {
    val scores = graft.pipeline.TextOps.langMarkers.map { case (lang, ws) =>
      lang -> s"len(regexp_extract_all($normSql, '\\b(${ws.mkString("|")})\\b'))"
    }
    val best = scores.map(_._2).mkString("greatest(", ", ", ")")
    scores.reverse.foldLeft("'und'") { case (acc, (lang, s)) =>
      s"CASE WHEN $best > 0 AND $s = $best THEN '$lang' ELSE $acc END"
    }
  }

  def queries: Seq[Query] = Seq(

    // Gopher-style repetitiousness: duplicate bigram/trigram fractions
    // per document. Pure scan-stage arithmetic (native Shingles codegen
    // expression for the distinct count) — zero shuffles; the emitted
    // fractions are 1 − distinct/total on integers, so no rounding is
    // needed for engine parity.
    Query(
      "q66_repetition",
      (s, dir) => {
        val T = graft.pipeline.TextOps
        val d = Tables.documents(s, dir)
        // one dup_ngram_stats kernel call per row instead of ~17
        // normalize-regex references + 2 shingle kernels (r21; the
        // two-step select keeps CollapseProject from re-inlining the
        // kernel per field — see TextOps.dupNgramStats)
        d.select(F.col("doc_id"), T.dupNgramStats(F.col("text")).as("__rs"))
          .select(F.col("doc_id"),
            F.col("__rs").getField("tokens").as("n_tokens"),
            T.dupNgramFractionFromStats(F.col("__rs"), 2).as("dup_bigram_frac"),
            T.dupNgramFractionFromStats(F.col("__rs"), 3).as("dup_trigram_frac"))
          .orderBy("doc_id")
      },
      Some(s"""
        WITH ws AS (
          SELECT doc_id,
                 CASE WHEN length($normSql) = 0 THEN []
                      ELSE string_split($normSql, ' ') END AS w
          FROM documents)
        SELECT doc_id, len(w) AS n_tokens,
          CASE WHEN len(w) < 2 THEN 0.0 ELSE
            1.0 - (CAST(len(list_distinct(
                     [w[i] || ' ' || w[i+1] FOR i IN range(1, len(w))])) AS DOUBLE)
                   / CAST(len(w) - 1 AS DOUBLE)) END AS dup_bigram_frac,
          CASE WHEN len(w) < 3 THEN 0.0 ELSE
            1.0 - (CAST(len(list_distinct(
                     [w[i] || ' ' || w[i+1] || ' ' || w[i+2] FOR i IN range(1, len(w)-1)])) AS DOUBLE)
                   / CAST(len(w) - 2 AS DOUBLE)) END AS dup_trigram_frac
        FROM ws ORDER BY doc_id
      """)),

    // Cross-doc chunk dedup profile: fraction of each doc's 3-token
    // chunks that also appear in another document. The shuffle carries
    // (hash, id) pairs only; "in ≥2 docs" is min≠max per hash (no
    // countDistinct state); the profile join re-uses the hash
    // partitioning. Integers + one division ⇒ exact.
    Query(
      "q67_chunk_dedup",
      (s, dir) => {
        Dedup.chunkDedupProfile(Tables.documents(s, dir), "doc_id", "text", size = 3)
          .orderBy("doc_id")
      },
      Some(s"""
        WITH ws AS (
          SELECT doc_id, string_split($normSql, ' ') AS w FROM documents),
        ch AS (
          SELECT doc_id,
                 unnest([md5(array_to_string(w[i*3+1:i*3+3], ' '))
                         FOR i IN range(0, len(w)//3)]) AS chunk_hash
          FROM ws),
        profile AS (
          SELECT chunk_hash, (min(doc_id) <> max(doc_id)) AS dup
          FROM ch GROUP BY 1)
        SELECT doc_id, count(*) AS n_chunks,
               CAST(sum(CASE WHEN dup THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_chunks,
               CAST(sum(CASE WHEN dup THEN 1 ELSE 0 END) AS DOUBLE)
                 / CAST(count(*) AS DOUBLE) AS dup_frac
        FROM ch JOIN profile USING (chunk_hash)
        GROUP BY doc_id ORDER BY doc_id
      """)),

    // Cross-source chunk-overlap matrix: which corpus slices share
    // verbatim 3-token chunks — slice-level contamination/boilerplate
    // diagnostics. Distinct (hash, source) on one shuffle; the
    // self-join fans out at most sources² per hash.
    Query(
      "q87_source_overlap",
      (s, dir) => {
        Dedup.sourceChunkOverlap(Tables.documents(s, dir), "text", "source", size = 3)
          .orderBy("source_a", "source_b")
      },
      Some(s"""
        WITH ws AS (
          SELECT source, string_split($normSql, ' ') AS w FROM documents),
        ch AS (
          SELECT DISTINCT source,
                 unnest([md5(array_to_string(w[i*3+1:i*3+3], ' '))
                         FOR i IN range(0, len(w)//3)]) AS chunk_hash
          FROM ws)
        SELECT a.source AS source_a, b.source AS source_b, count(*) AS n_shared
        FROM ch a JOIN ch b
          ON a.chunk_hash = b.chunk_hash AND a.source < b.source
        GROUP BY 1, 2 ORDER BY 1, 2
      """)),

    // Incremental cross-source overlap (q87's q80/q85-shaped twin):
    // even-id docs are the indexed corpus (stored chunk-hash index +
    // stored matrix), odd-id docs arrive as the nightly batch; the
    // incremental fold must reproduce the full-corpus matrix EXACTLY —
    // the oracle is the same full rebuild q87 runs, so hash-equality
    // proves increment ≡ rebuild. The index is never self-joined: it
    // is touched by one anti-join and one equi-join, both batch-driven.
    Query(
      "q88_source_overlap_incremental",
      (s, dir) => {
        val d = Tables.documents(s, dir)
        val ixDocs = d.filter(F.col("doc_id") % 2 === 0)
        val batchDocs = d.filter(F.col("doc_id") % 2 === 1)
        val index = Dedup.chunkHashIndex(ixDocs, "text", "source", size = 3).persist()
        // derive the stored matrix from the SAME persisted index — the
        // corpus is scanned and distinct-shuffled once, not per consumer
        val oldMatrix = Dedup.sourceChunkOverlapFromIndex(index)
        Dedup.sourceChunkOverlapIncremental(index, oldMatrix, batchDocs,
            "text", "source", size = 3)
          .orderBy("source_a", "source_b")
      },
      Some(s"""
        WITH ws AS (
          SELECT source, string_split($normSql, ' ') AS w FROM documents),
        ch AS (
          SELECT DISTINCT source,
                 unnest([md5(array_to_string(w[i*3+1:i*3+3], ' '))
                         FOR i IN range(0, len(w)//3)]) AS chunk_hash
          FROM ws)
        SELECT a.source AS source_a, b.source AS source_b, count(*) AS n_shared
        FROM ch a JOIN ch b
          ON a.chunk_hash = b.chunk_hash AND a.source < b.source
        GROUP BY 1, 2 ORDER BY 1, 2
      """)),

    // Int8 quantization audit: per-vector scale, L2 norm, and max
    // round-trip reconstruction error — the compression step of an
    // embedding pipeline, run entirely inside the scan stage (vectors
    // never shuffle). scale is max+division (bit-exact across engines);
    // norm/error fold element-wise in a fixed order and are emitted
    // rounded to absorb last-ULP summation differences.
    Query(
      "q68_quantize",
      (s, dir) => {
        val e = Tables.embeddings(s, dir)
        val base = e.select(F.col("vec_id"), Embeddings.asDouble(F.col("embedding")).as("v"))
        base.withColumn("scale", Embeddings.int8Scale(F.col("v")))
          .select(F.col("vec_id"), F.col("scale"),
            F.round(Embeddings.l2Norm(F.col("v")), 5).as("norm"),
            F.round(Embeddings.maxQuantError(F.col("v"), F.col("scale")), 6).as("max_qerr"))
          .orderBy("vec_id")
      },
      Some("""
        WITH v AS (
          SELECT vec_id, [CAST(x AS DOUBLE) FOR x IN embedding] AS v FROM embeddings),
        s AS (
          SELECT vec_id, v, list_max([abs(x) FOR x IN v]) / 127.0 AS scale FROM v)
        SELECT vec_id, scale,
               round(sqrt(list_sum([x * x FOR x IN v])), 5) AS norm,
               CASE WHEN scale = 0 THEN 0.0
                    ELSE round(list_max([abs(x - round(x / scale) * scale) FOR x IN v]), 6)
               END AS max_qerr
        FROM s ORDER BY vec_id
      """)),

    // Per-source vocabulary heavy hitters: top-5 terms per source by
    // frequency. Shape at scale: term counts aggregate with map-side
    // combine; the per-group top-k is a rank window whose
    // WindowGroupLimit pushes a partial top-k BEFORE the rank shuffle,
    // so only ≤k·sources candidate rows cross the final exchange.
    Query(
      "q70_heavy_hitters",
      (s, dir) => {
        val d = Tables.documents(s, dir)
        val terms = d
          .filter(F.length(graft.pipeline.TextOps.normalize(F.col("text"))) > 0)
          .select(F.col("source"),
            F.explode(graft.pipeline.TextOps.tokens(F.col("text"))).as("term"))
        val counts = terms.groupBy("source", "term").agg(F.count(F.lit(1)).as("n"))
        val w = org.apache.spark.sql.expressions.Window.partitionBy("source")
          .orderBy(F.col("n").desc, F.col("term").asc)
        counts.withColumn("rank", F.row_number().over(w))
          .filter(F.col("rank") <= 5)
          .orderBy("source", "rank")
      },
      Some(s"""
        WITH terms AS (
          SELECT source, unnest(string_split($normSql, ' ')) AS term
          FROM documents WHERE length($normSql) > 0),
        counts AS (
          SELECT source, term, count(*) AS n FROM terms GROUP BY 1, 2)
        SELECT source, term, n, rank FROM (
          SELECT source, term, n,
                 row_number() OVER (PARTITION BY source
                   ORDER BY n DESC, term ASC) AS rank
          FROM counts)
        WHERE rank <= 5 ORDER BY source, rank
      """)),

    // PII-style redaction: scrub email addresses and long digit runs
    // from text — the standard pre-training scrub, pure scan-stage
    // regexp work (zero shuffles). The corpus has no natural PII, so
    // the query plants deterministic doc_id-derived tokens first; the
    // operator under test is the redaction pass. Counts and lengths
    // are integers ⇒ exact.
    Query(
      "q71_redact",
      (s, dir) => {
        val d = Tables.documents(s, dir)
        val emailPat = "[a-z0-9._]+@[a-z0-9.]+"
        val digitPat = "[0-9]{4,}"
        val planted = F.concat(F.col("text"),
          F.lit(" contact user"), F.col("doc_id").cast("string"),
          F.lit("@mail.example ref "),
          (F.col("doc_id") * 7919 % 100000 + 100000).cast("string"))
        d.select(F.col("doc_id"), planted.as("t"))
          .select(F.col("doc_id"),
            (F.regexp_count(F.col("t"), F.lit(emailPat)) +
              F.regexp_count(F.col("t"), F.lit(digitPat))).as("n_hits"),
            F.length(F.regexp_replace(F.regexp_replace(F.col("t"),
              emailPat, "<EMAIL>"), digitPat, "<NUM>")).as("redacted_len"),
            F.md5(F.encode(F.regexp_replace(F.regexp_replace(F.col("t"),
              emailPat, "<EMAIL>"), digitPat, "<NUM>"), "UTF-8")).as("redacted_md5"))
          .orderBy("doc_id")
      },
      Some("""
        WITH planted AS (
          SELECT doc_id,
                 text || ' contact user' || CAST(doc_id AS VARCHAR)
                      || '@mail.example ref '
                      || CAST(doc_id * 7919 % 100000 + 100000 AS VARCHAR) AS t
          FROM documents)
        SELECT doc_id,
               len(regexp_extract_all(t, '[a-z0-9._]+@[a-z0-9.]+'))
                 + len(regexp_extract_all(t, '[0-9]{4,}')) AS n_hits,
               length(regexp_replace(regexp_replace(t,
                 '[a-z0-9._]+@[a-z0-9.]+', '<EMAIL>', 'g'),
                 '[0-9]{4,}', '<NUM>', 'g')) AS redacted_len,
               md5(regexp_replace(regexp_replace(t,
                 '[a-z0-9._]+@[a-z0-9.]+', '<EMAIL>', 'g'),
                 '[0-9]{4,}', '<NUM>', 'g')) AS redacted_md5
        FROM planted ORDER BY doc_id
      """)),

    // Frame sampling over opaque binary payloads: every 2nd 16-byte
    // frame, fingerprinted. The corpus payload is UTF-8 ASCII text, so
    // the oracle replays the byte slices with VARCHAR substring; the
    // Spark side slices the real BINARY column.
    Query(
      "q72_frame_sample",
      (s, dir) => {
        // The oracle slices VARCHAR (DuckDB cannot slice BLOBs), i.e.
        // character-wise, while frameSample slices the payload
        // byte-wise. Equal only for ASCII — so non-ASCII text fails
        // loudly here (assert_true rides the payload column; null
        // result = invariant held) instead of silently hash-diverging.
        // null text passes the guard (coalesce): assert_true throws on a
        // NULL condition, and a null payload simply emits no frames —
        // matching the oracle, which drops null rows too
        val ascii = F.assert_true(
          F.coalesce(
            F.octet_length(F.col("text")) === F.length(F.col("text")), F.lit(true)),
          F.lit("q72 oracle requires ASCII text (byte-wise vs char-wise slicing)"))
        val media = Tables.documents(s, dir).select(F.col("doc_id"),
          F.when(ascii.isNull, F.encode(F.col("text"), "UTF-8")).as("payload"))
        graft.pipeline.Multimodal.frameSample(media, "doc_id", "payload",
            frameBytes = 16, everyK = 2)
          .orderBy("doc_id", "frame_no")
      },
      Some("""
        WITH m AS (
          SELECT doc_id, text, CAST(floor(length(text) / 16) AS INT) AS nf
          FROM documents),
        f AS (
          SELECT doc_id, text, unnest(range(0, nf, 2)) AS frame_no
          FROM m WHERE nf > 0)
        SELECT doc_id, frame_no,
               md5(substring(text, CAST(frame_no * 16 + 1 AS INT), 16)) AS frame_md5
        FROM f ORDER BY doc_id, frame_no
      """)),

    // End-to-end curation funnel — the flagship composition: quality
    // gate → language gate → repetition gate → exact-dedup keeper →
    // deterministic sample, reported as cumulative per-source survivor
    // counts. Every gate is engine-exact (quality doubles are
    // bit-identical across engines — q48 hash-matches unrounded — and
    // the rest is integer/string/md5 work), so the funnel is fully
    // oracle-checked. One pass computes all flags in the scan stage;
    // the only shuffles are the keeper window and the final rollup.
    Query(
      "q73_curation_funnel",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val T = graft.pipeline.TextOps
        val d = Tables.documents(s, dir)
        // repetition gate through the one-pass dup_ngram_stats kernel
        // (r21): the dupNgramFraction expression tree re-ran the
        // normalize regex 4+ times per row inside this projection
        val flags = d
          .select(F.col("doc_id"), F.col("source"), F.col("text"),
            T.dupNgramStats(F.col("text")).as("__rs"))
          .select(F.col("doc_id"), F.col("source"),
            (T.qualityScore(F.col("text")) >= 0.35).as("q_ok"),
            (T.langId(F.col("text")) === "en").as("lang_ok"),
            (T.dupNgramFractionFromStats(F.col("__rs"), 2) < 0.6).as("rep_ok"),
            graft.pipeline.Dedup.exactKey(F.col("text")).as("ck"),
            (graft.pipeline.Sampling.hashBp(F.col("doc_id").cast("string")) < 8000)
              .as("samp_ok"))
        val keeper = flags.withColumn("uniq_ok",
          F.col("doc_id") === F.min("doc_id").over(Window.partitionBy("ck")))
        def cum(cols: Seq[String]): org.apache.spark.sql.Column =
          F.sum(F.when(cols.map(F.col).reduce(_ && _), 1L).otherwise(0L))
        keeper.groupBy("source").agg(
            F.count(F.lit(1)).as("n_docs"),
            cum(Seq("q_ok")).as("n_quality"),
            cum(Seq("q_ok", "lang_ok")).as("n_lang"),
            cum(Seq("q_ok", "lang_ok", "rep_ok")).as("n_rep"),
            cum(Seq("q_ok", "lang_ok", "rep_ok", "uniq_ok")).as("n_uniq"),
            cum(Seq("q_ok", "lang_ok", "rep_ok", "uniq_ok", "samp_ok")).as("n_kept"))
          .orderBy("source")
      },
      Some(s"""
        WITH flags AS (
          SELECT doc_id, source,
                 ($qualitySql) >= 0.35 AS q_ok,
                 ($langIdSql) = 'en' AS lang_ok,
                 (CASE WHEN len(string_split($normSql, ' ')) < 2
                         OR length($normSql) = 0 THEN 0.0
                       ELSE 1.0 - (CAST(len(list_distinct(
                              [w[i] || ' ' || w[i+1] FOR i IN range(1, len(w))])) AS DOUBLE)
                            / CAST(len(w) - 1 AS DOUBLE)) END) < 0.6 AS rep_ok,
                 md5($normSql) AS ck,
                 ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
                   % 10000 < 8000 AS samp_ok
          FROM (SELECT *, string_split($normSql, ' ') AS w FROM documents)),
        keeper AS (
          SELECT *, doc_id = min(doc_id) OVER (PARTITION BY ck) AS uniq_ok
          FROM flags)
        SELECT source, count(*) AS n_docs,
               CAST(sum(CASE WHEN q_ok THEN 1 ELSE 0 END) AS BIGINT) AS n_quality,
               CAST(sum(CASE WHEN q_ok AND lang_ok THEN 1 ELSE 0 END) AS BIGINT) AS n_lang,
               CAST(sum(CASE WHEN q_ok AND lang_ok AND rep_ok THEN 1 ELSE 0 END) AS BIGINT) AS n_rep,
               CAST(sum(CASE WHEN q_ok AND lang_ok AND rep_ok AND uniq_ok
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_uniq,
               CAST(sum(CASE WHEN q_ok AND lang_ok AND rep_ok AND uniq_ok AND samp_ok
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
        FROM keeper GROUP BY source ORDER BY source
      """)),

    // Winnowing fingerprints (MOSS rolling-hash scheme): min k-gram
    // hash per sliding window, dedup'd — the sub-document attribution/
    // dedup primitive. k=3 grams, window w=4. Entirely scan-stage;
    // hashes are the md5-prefix 60-bit integers both engines agree on.
    Query(
      "q74_winnow",
      (s, dir) => {
        val T = graft.pipeline.TextOps
        Tables.documents(s, dir)
          .select(F.col("doc_id"), T.tokens(F.col("text")).as("w"))
          // kernel form (one compiled call per row); the expression form
          // is cross-checked bit-for-bit by CurationSpec
          .select(F.col("doc_id"), F.explode(T.winnowFromTokens(F.col("w"), 3, 4)).as("fp"))
          .orderBy("doc_id", "fp")
      },
      Some(s"""
        WITH ws AS (
          SELECT doc_id, string_split($normSql, ' ') AS w FROM documents),
        kg AS (
          SELECT doc_id,
                 CASE WHEN len(w) < 3 THEN []
                      ELSE [('0x' || substring(md5(array_to_string(w[i:i+2], ' ')), 1, 15))::BIGINT
                            FOR i IN range(1, len(w) - 1)] END AS h
          FROM ws),
        fps AS (
          SELECT doc_id,
                 CASE WHEN len(h) = 0 THEN []
                      WHEN len(h) <= 4 THEN [list_min(h)]
                      ELSE [list_min(h[j:j+3]) FOR j IN range(1, len(h) - 2)] END AS fp
          FROM kg)
        SELECT doc_id, unnest(list_sort(list_distinct(fp))) AS fp
        FROM fps ORDER BY doc_id, fp
      """)),

    // Unigram log-probability (perplexity-proxy LM quality score): mean
    // ln(count/N) over token instances. Corpus unigram table broadcasts;
    // the per-doc mean goes round(ln,6)→decimal→sum so the float
    // reduction is partition-order-independent.
    Query(
      "q75_unigram_logprob",
      (s, dir) => {
        graft.pipeline.TextOps.unigramLogProb(Tables.documents(s, dir), "doc_id", "text")
          .orderBy("doc_id")
      },
      Some(s"""
        WITH terms AS (
          SELECT doc_id, unnest(string_split($normSql, ' ')) AS term
          FROM documents WHERE length($normSql) > 0),
        tf AS (SELECT doc_id, term, count(*) AS tf FROM terms GROUP BY 1, 2),
        uni AS (SELECT term, CAST(sum(tf) AS BIGINT) AS cnt FROM tf GROUP BY 1),
        n AS (SELECT CAST(sum(cnt) AS BIGINT) AS n FROM uni)
        SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_tokens,
               round(CAST(sum(CAST(round(ln(CAST(cnt AS DOUBLE) / n), 6)
                 AS DECIMAL(18,6)) * tf) AS DOUBLE) / sum(tf), 4) AS logprob
        FROM tf JOIN uni USING (term), n
        GROUP BY doc_id ORDER BY doc_id
      """)),

    // Benchmark-contamination scan (decontamination): per corpus doc,
    // the fraction of its distinct 3-gram shingles that appear anywhere
    // in a held-out eval set (here: the src0 slice). Shape at scale:
    // the eval shingle set is distinct-compressed and BROADCAST (eval
    // suites are tiny next to a corpus), so the corpus side never
    // shuffles — one scan + broadcast probe + per-doc rollup.
    Query(
      "q76_contamination",
      (s, dir) => {
        val T = graft.pipeline.TextOps
        val d = Tables.documents(s, dir)
        val eval = d.filter(F.col("source") === "src0")
          .select(F.explode(graft.pipeline.Dedup.shingles(F.col("text"), 3)).as("g"))
          .distinct().withColumn("__hit", F.lit(1))
        val corpus = d.filter(F.col("source") =!= "src0")
          .select(F.col("doc_id"),
            F.explode(graft.pipeline.Dedup.shingles(F.col("text"), 3)).as("g"))
        corpus.join(F.broadcast(eval), Seq("g"), "left")
          .groupBy("doc_id")
          .agg(F.count(F.lit(1)).as("n_grams"),
            F.sum(F.when(F.col("__hit").isNotNull, 1L).otherwise(0L)).as("n_hit"))
          .withColumn("contamination",
            F.col("n_hit").cast("double") / F.col("n_grams").cast("double"))
          .orderBy("doc_id")
      },
      Some(s"""
        WITH sh AS (
          SELECT doc_id, source,
                 CASE WHEN len(ws) < 3 THEN [array_to_string(ws, ' ')]
                      ELSE list_distinct([ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]
                                          FOR i IN range(1, len(ws) - 1)]) END AS sh
          FROM (SELECT doc_id, source, string_split($normSql, ' ') AS ws FROM documents)),
        ev AS (SELECT DISTINCT unnest(sh) AS g FROM sh WHERE source = 'src0'),
        corpus AS (SELECT doc_id, unnest(sh) AS g FROM sh WHERE source <> 'src0')
        SELECT c.doc_id, count(*) AS n_grams,
               CAST(sum(CASE WHEN e.g IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hit,
               CAST(sum(CASE WHEN e.g IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
                 / CAST(count(*) AS DOUBLE) AS contamination
        FROM corpus c LEFT JOIN ev e ON c.g = e.g
        GROUP BY c.doc_id ORDER BY c.doc_id
      """)),

    // Robust outlier profile (median/MAD z-score) — numeric-feature
    // cleaning for training pipelines: per group, the median, the
    // median absolute deviation, and how many rows sit beyond 3 MADs.
    // Two exact-percentile aggregations with the tiny per-group stats
    // broadcast back between passes. Median interpolation ((1−f)·a+f·b)
    // can differ by an ULP between Spark's percentile() and DuckDB's
    // quantile_cont, so both medians are rounded to 6 decimals BEFORE
    // any downstream use — the emitted values match bit-for-bit and
    // the outlier comparison reads the same rounded threshold on both
    // engines (an ULP in the raw median can no longer flip a count).
    Query(
      "q77_outliers",
      (s, dir) => {
        val e = Tables.events(s, dir).select("event_type", "value")
        val med = e.groupBy("event_type")
          .agg(F.round(F.expr("percentile(value, 0.5)"), 6).as("med"))
        val dev = e.join(F.broadcast(med), "event_type")
          .withColumn("adev", F.abs(F.col("value") - F.col("med")))
        val mad = dev.groupBy("event_type")
          .agg(F.round(F.expr("percentile(adev, 0.5)"), 6).as("mad"))
        dev.join(F.broadcast(mad), "event_type")
          .groupBy("event_type")
          .agg(F.count(F.lit(1)).as("n"),
            F.max("med").as("med"), F.max("mad").as("mad"),
            F.sum(F.when(F.col("adev") > F.col("mad") * 3, 1L).otherwise(0L))
              .as("n_outliers"))
          .orderBy("event_type")
      },
      Some("""
        WITH med AS (
          SELECT event_type, round(quantile_cont(value, 0.5), 6) AS med
          FROM events GROUP BY 1),
        dev AS (
          SELECT e.event_type, abs(e.value - m.med) AS adev, m.med
          FROM events e JOIN med m USING (event_type)),
        mad AS (
          SELECT event_type, round(quantile_cont(adev, 0.5), 6) AS mad
          FROM dev GROUP BY 1)
        SELECT event_type, count(*) AS n,
               max(d.med) AS med, max(m.mad) AS mad,
               CAST(sum(CASE WHEN d.adev > m.mad * 3 THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_outliers
        FROM dev d JOIN mad m USING (event_type)
        GROUP BY d.event_type ORDER BY event_type
      """)),

    // Fixed-point per-cluster statistics: dims quantized to
    // round(x·10^6) int64, so every cross-row reduction is an exact
    // integer sum — bit-identical under any partitioning/merge order/
    // retry (the 100 TB determinism story). The only float ops are two
    // final divisions per label, written identically in both engines.
    Query(
      "q69_cluster_stats",
      (s, dir) => {
        Embeddings.clusterStats(Tables.embeddings(s, dir), "label", "embedding")
          .orderBy("label")
      },
      Some("""
        WITH raw AS (
          SELECT label, unnest(range(len(embedding))) AS dim, unnest(embedding) AS x
          FROM embeddings),
        dims AS (
          SELECT label, dim,
                 CAST(round(CAST(x AS DOUBLE) * 1000000.0) AS BIGINT) AS xi
          FROM raw),
        perdim AS (
          SELECT label, dim, count(*) AS n, sum(xi) AS sx, sum(xi * xi) AS sx2
          FROM dims GROUP BY 1, 2)
        SELECT label, max(n) AS n_vecs,
               CAST(sum(sx2) AS BIGINT) AS ssq, CAST(sum(sx * sx) AS BIGINT) AS csq,
               ((CAST(sum(sx * sx) AS DOUBLE) / max(n)) / max(n) / 1000000000000.0)
                 AS centroid_norm2,
               ((CAST(sum(sx2) AS DOUBLE) - CAST(sum(sx * sx) AS DOUBLE) / max(n))
                 / max(n) / 1000000000000.0) AS within_var
        FROM perdim GROUP BY label ORDER BY label
      """)),

    // Asymmetric near-containment dedup: pairs where the smaller doc's
    // distinct 3-gram set is ≥ 80% inside the larger's — the
    // subset-duplicate shape symmetric Jaccard (q43) misses. Inverted-
    // index equi-joins only; the per-gram posting count caps stop-gram
    // blowup AND sizes the pair shuffle (Σ df·(df−1), exact).
    Query(
      "q89_containment_pairs",
      (s, dir) => {
        Dedup.containmentPairs(Tables.documents(s, dir), "doc_id", "text",
            k = 3, tau = 0.8, maxDf = 1000)
          .orderBy("id_small", "id_big")
      },
      Some(s"""
        WITH ws AS (
          SELECT doc_id, string_split($normSql, ' ') AS w FROM documents),
        kg AS (
          SELECT doc_id, list_distinct(CASE WHEN len(w) < 3 THEN []
                   ELSE [('0x' || substring(md5(array_to_string(w[i:i+2], ' ')), 1, 15))::BIGINT
                         FOR i IN range(1, len(w) - 1)] END) AS gs
          FROM ws),
        gx AS (SELECT doc_id, unnest(gs) AS g FROM kg),
        gdf AS (SELECT g, count(*) AS df FROM gx GROUP BY g),
        gf AS (SELECT doc_id, g FROM gx JOIN gdf USING (g) WHERE df <= 1000),
        sizes AS (SELECT doc_id, count(*) AS n FROM gf GROUP BY doc_id),
        pairs AS (
          SELECT a.doc_id AS ia, b.doc_id AS ib, count(*) AS inter
          FROM gf a JOIN gf b USING (g) WHERE a.doc_id < b.doc_id GROUP BY 1, 2),
        j AS (
          SELECT CASE WHEN sa.n <= sb.n THEN ia ELSE ib END AS id_small,
                 CASE WHEN sa.n <= sb.n THEN ib ELSE ia END AS id_big,
                 least(sa.n, sb.n) AS n_small, inter,
                 round(CAST(inter AS DOUBLE) / least(sa.n, sb.n), 6) AS containment
          FROM pairs
          JOIN sizes sa ON sa.doc_id = ia
          JOIN sizes sb ON sb.doc_id = ib)
        SELECT * FROM j WHERE containment >= 0.8 ORDER BY id_small, id_big
      """)),

    // Per-source document cap: at most 10 docs per source, chosen as the
    // 10 smallest md5(doc_id) — the "domain cap" curation primitive.
    // rank-filter form → Catalyst InferWindowGroupLimit discards
    // past-cap rows map-side before the shuffle (plan-asserted in
    // CurationSpec); the hash order key is churn-stable and
    // engine-portable.
    Query(
      "q90_source_caps",
      (s, dir) => {
        graft.pipeline.Sampling.capPerGroup(
            Tables.documents(s, dir), F.col("doc_id"), F.col("source"), cap = 10)
          .select("doc_id", "source")
          .orderBy("source", "doc_id")
      },
      Some("""
        SELECT doc_id, source FROM (
          SELECT doc_id, source,
                 row_number() OVER (PARTITION BY source
                   ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
          FROM documents) t
        WHERE rn <= 10 ORDER BY source, doc_id
      """)),

    // Per-source quality gate: keep each source's top quartile by
    // quality score — the mixture-preserving form of quality filtering
    // (a global threshold would let one clean domain crowd out every
    // low-register source). Exact percent_rank on a deterministic
    // (score, id) order, replayed identically by DuckDB.
    Query(
      "q91_quality_gate",
      (s, dir) => {
        graft.pipeline.TextOps.qualityGate(
            Tables.documents(s, dir), "doc_id", "text", "source", pct = 0.75)
          .orderBy("source", "doc_id")
      },
      Some(s"""
        WITH q AS (
          SELECT doc_id, source, ($qualitySql) AS qs FROM documents),
        r AS (
          SELECT doc_id, source, qs,
                 percent_rank() OVER (PARTITION BY source ORDER BY qs, doc_id) AS pr
          FROM q)
        SELECT doc_id, source, round(qs, 6) AS quality
        FROM r WHERE pr >= 0.75 ORDER BY source, doc_id
      """)),

    // Incremental containment: fold a new batch (10% of the corpus
    // replayed under shifted ids — the daily-ingest shape) into the
    // stored gram index; emit every containment pair involving a batch
    // doc at full-rebuild values, index never self-paired. Oracle =
    // the q89 rebuild over corpus ∪ batch, restricted to batch pairs.
    Query(
      "q92_containment_incremental",
      (s, dir) => {
        val d = Tables.documents(s, dir).select(F.col("doc_id"), F.col("text"))
        val index = Dedup.containmentGramIndex(d, "doc_id", "text").persist()
        val gramDf = index.groupBy("g").agg(F.count(F.lit(1)).as("df"))
        // nightly-rebuild cap: the FIXED semantic stop-gram cap (r16).
        // Until r15 this ran the adaptive budget degradation, which at
        // over-budget corpora builds a df≤1-gram index — a silently
        // near-empty incremental system, the same weakness class the
        // one-shot waves replaced. The incremental fold needs no mass
        // budget: its pair fan-out is BATCH-bounded (≤ batch gram
        // instances × maxDf), never corpus-mass-bounded, so the stored
        // sizes and the fold share the honest cap. Stored sizes must be
        // built AT this cap (rebuild-equivalence requires one cap).
        val eff = 1000
        // vocabulary side broadcast when small — without the hint this
        // join exchanges the whole corpus gram explosion (r11 probe)
        val sizes = index.join(
            Dedup.maybeBroadcastVocab(gramDf.filter(F.col("df") <= eff), gramDf), "g")
          .groupBy("id").agg(F.count(F.lit(1)).as("n"))
        val batch = d.filter(F.pmod(F.col("doc_id"), F.lit(10)) === 0)
          .select((F.col("doc_id") + 1000000).as("doc_id"), F.col("text"))
        Dedup.containmentPairsIncremental(index, gramDf, sizes, batch,
            "doc_id", "text", k = 3, tau = 0.8, maxDf = eff)
          .orderBy("id_small", "id_big")
      },
      Some(s"""
        WITH docs AS (
          SELECT doc_id, text FROM documents
          UNION ALL
          SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 10 = 0),
        ws AS (
          SELECT doc_id, string_split($normSql, ' ') AS w FROM docs),
        kg AS (
          SELECT doc_id, list_distinct(CASE WHEN len(w) < 3 THEN []
                   ELSE [('0x' || substring(md5(array_to_string(w[i:i+2], ' ')), 1, 15))::BIGINT
                         FOR i IN range(1, len(w) - 1)] END) AS gs
          FROM ws),
        gx AS (SELECT doc_id, unnest(gs) AS g FROM kg),
        gdf AS (SELECT g, count(*) AS df FROM gx GROUP BY g),
        gf AS (SELECT doc_id, g FROM gx JOIN gdf USING (g) WHERE df <= 1000),
        sizes AS (SELECT doc_id, count(*) AS n FROM gf GROUP BY doc_id),
        pairs AS (
          SELECT a.doc_id AS ia, b.doc_id AS ib, count(*) AS inter
          FROM gf a JOIN gf b USING (g) WHERE a.doc_id < b.doc_id GROUP BY 1, 2),
        j AS (
          SELECT CASE WHEN sa.n <= sb.n THEN ia ELSE ib END AS id_small,
                 CASE WHEN sa.n <= sb.n THEN ib ELSE ia END AS id_big,
                 least(sa.n, sb.n) AS n_small, inter,
                 round(CAST(inter AS DOUBLE) / least(sa.n, sb.n), 6) AS containment
          FROM pairs
          JOIN sizes sa ON sa.doc_id = ia
          JOIN sizes sb ON sb.doc_id = ib)
        SELECT * FROM j
        WHERE containment >= 0.8 AND (id_small >= 1000000 OR id_big >= 1000000)
        ORDER BY id_small, id_big
      """)),

    // N-gram novelty: what fraction of each candidate doc's distinct
    // 3-grams is ABSENT from the reference corpus — the data-value twin
    // of the q76 contamination check (new-crawl triage, snapshot-over-
    // snapshot scoring). Reference = docs with doc_id % 10 != 0,
    // candidates = the rest, the q92-style held-out split. Scalar
    // (id, g) rows through one vocabulary join + one rollup.
    Query(
      "q93_ngram_novelty",
      (s, dir) => {
        val d = Tables.documents(s, dir)
        graft.pipeline.TextOps.ngramNovelty(
            d.filter(F.pmod(F.col("doc_id"), F.lit(10)) === 0),
            d.filter(F.pmod(F.col("doc_id"), F.lit(10)) =!= 0),
            "doc_id", "text", k = 3)
          .orderBy("doc_id")
      },
      Some(s"""
        WITH ws AS (
          SELECT doc_id, string_split($normSql, ' ') AS w FROM documents),
        kg AS (
          SELECT doc_id, list_distinct(CASE WHEN len(w) < 3 THEN []
                   ELSE [('0x' || substring(md5(array_to_string(w[i:i+2], ' ')), 1, 15))::BIGINT
                         FOR i IN range(1, len(w) - 1)] END) AS gs
          FROM ws),
        ref AS (SELECT DISTINCT unnest(gs) AS g FROM kg WHERE doc_id % 10 <> 0),
        tg AS (SELECT doc_id, unnest(gs) AS g FROM kg WHERE doc_id % 10 = 0),
        per AS (
          SELECT tg.doc_id, count(*) AS n_grams,
                 CAST(sum(CASE WHEN ref.g IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_novel
          FROM tg LEFT JOIN ref ON tg.g = ref.g GROUP BY 1)
        SELECT d.doc_id, CAST(coalesce(n_grams, 0) AS BIGINT) AS n_grams,
               CAST(coalesce(n_novel, 0) AS BIGINT) AS n_novel,
               CASE WHEN coalesce(n_grams, 0) = 0 THEN NULL
                    ELSE round(CAST(n_novel AS DOUBLE) / n_grams, 6) END AS novelty
        FROM documents d LEFT JOIN per USING (doc_id)
        WHERE d.doc_id % 10 = 0 ORDER BY d.doc_id
      """)),

    // Duplicate-span stripping: remove every 3-token chunk that appears
    // verbatim in >= 2 distinct docs, keep each doc's unique remainder —
    // the rewrite member of the q67 chunk family (shared header/footer/
    // license boilerplate removal). Hash+position scalars through two
    // exchanges; text moves once, rewrite is a scan-stage HOF filter.
    Query(
      "q94_strip_dup_spans",
      (s, dir) => {
        Dedup.stripDuplicateSpans(Tables.documents(s, dir), "doc_id", "text", size = 3)
          .orderBy("doc_id")
      },
      Some(s"""
        WITH ws AS (
          SELECT doc_id, string_split($normSql, ' ') AS w FROM documents),
        ch AS (
          SELECT doc_id,
                 unnest([{'pos': i, 'h': md5(array_to_string(w[i*3+1:i*3+3], ' '))}
                         FOR i IN range(0, len(w)//3)], recursive := true)
          FROM ws),
        dup AS (
          SELECT h FROM ch GROUP BY h HAVING min(doc_id) <> max(doc_id)),
        dp AS (
          SELECT doc_id, list(DISTINCT pos) AS dps
          FROM ch JOIN dup USING (h) GROUP BY doc_id),
        j AS (
          SELECT ws.doc_id, w, coalesce(dps, []) AS dp2
          FROM ws LEFT JOIN dp USING (doc_id))
        SELECT doc_id, CAST(len(w) AS INT) AS n_tokens,
               CAST(3 * len(dp2) AS INT) AS n_removed,
               -- array_to_string([]) is NULL in DuckDB but '' in Spark;
               -- only a NULL input doc may yield NULL clean_text
               CASE WHEN w IS NULL THEN NULL
                    ELSE coalesce(array_to_string(
                      [w[j] FOR j IN range(1, len(w) + 1)
                       IF NOT list_contains(dp2, (j - 1) // 3)], ' '), '') END AS clean_text
        FROM j ORDER BY doc_id
      """)),

    // Source-pair chunk Jaccard: the q87 overlap matrix normalized to
    // |A∩B| / |A∪B| over each slice's distinct chunk vocabulary —
    // growth-invariant "which crawls duplicate each other" ratios.
    // Integer set sizes + one correctly-rounded division; per-source
    // counts broadcast.
    Query(
      "q95_source_jaccard",
      (s, dir) => {
        Dedup.sourceJaccard(Tables.documents(s, dir), "text", "source", size = 3)
          .orderBy("source_a", "source_b")
      },
      Some(s"""
        WITH ws AS (
          SELECT source, string_split($normSql, ' ') AS w FROM documents),
        ch AS (
          SELECT DISTINCT source,
                 unnest([md5(array_to_string(w[i*3+1:i*3+3], ' '))
                         FOR i IN range(0, len(w)//3)]) AS chunk_hash
          FROM ws),
        counts AS (SELECT source, count(*) AS n FROM ch GROUP BY source),
        shared AS (
          SELECT a.source AS source_a, b.source AS source_b, count(*) AS n_shared
          FROM ch a JOIN ch b
            ON a.chunk_hash = b.chunk_hash AND a.source < b.source
          GROUP BY 1, 2)
        SELECT source_a, source_b, n_shared,
               round(CAST(n_shared AS DOUBLE) / (ca.n + cb.n - n_shared), 6) AS jaccard
        FROM shared
        JOIN counts ca ON ca.source = source_a
        JOIN counts cb ON cb.source = source_b
        ORDER BY source_a, source_b
      """)),

    // Temperature-flattened mixture rates (alpha = 0.5): per-source
    // keep-rates moving the mixture toward p^alpha without upsampling —
    // the smallest source keeps everything (rate 1.0), every other
    // source keeps (n_min/n)^(1-alpha). At alpha = 0.5 the rate is one
    // IEEE division + sqrt, bit-reproducible on any engine.
    Query(
      "q96_temperature_mixture",
      (s, dir) => {
        graft.pipeline.Sampling.temperatureRates(
            Tables.documents(s, dir), "source", alpha = 0.5)
          .orderBy("source")
      },
      Some("""
        WITH counts AS (
          SELECT source, count(*) AS n FROM documents GROUP BY source),
        m AS (SELECT min(n) AS mn FROM counts)
        SELECT source, n, round(sqrt(CAST(mn AS DOUBLE) / n), 6) AS rate
        FROM counts, m ORDER BY source
      """)),

    // Winnow-fingerprint overlap pairs (MOSS-report shape): >= 50% of
    // the smaller doc's winnowing fingerprints appear in the larger's —
    // long-verbatim-span sharing at ~1/w of the gram-set feature
    // volume. Same inverted-index + df-cap + pair-budget machinery as
    // q89, applied to q74's fingerprint scheme (k=3, w=4).
    Query(
      "q100_winnow_overlap",
      (s, dir) => {
        Dedup.winnowOverlapPairs(Tables.documents(s, dir), "doc_id", "text",
            k = 3, w = 4, tau = 0.5, maxDf = 1000)
          .orderBy("id_small", "id_big")
      },
      Some(s"""
        WITH ws AS (
          SELECT doc_id, string_split($normSql, ' ') AS w FROM documents),
        kg AS (
          SELECT doc_id,
                 CASE WHEN len(w) < 3 THEN []
                      ELSE [('0x' || substring(md5(array_to_string(w[i:i+2], ' ')), 1, 15))::BIGINT
                            FOR i IN range(1, len(w) - 1)] END AS h
          FROM ws),
        fps AS (
          SELECT doc_id,
                 CASE WHEN len(h) = 0 THEN []
                      WHEN len(h) <= 4 THEN [list_min(h)]
                      ELSE [list_min(h[j:j+3]) FOR j IN range(1, len(h) - 2)] END AS fp0
          FROM kg),
        gx AS (SELECT doc_id, unnest(list_distinct(fp0)) AS g FROM fps),
        gdf AS (SELECT g, count(*) AS df FROM gx GROUP BY g),
        gf AS (SELECT doc_id, g FROM gx JOIN gdf USING (g) WHERE df <= 1000),
        sizes AS (SELECT doc_id, count(*) AS n FROM gf GROUP BY doc_id),
        pairs AS (
          SELECT a.doc_id AS ia, b.doc_id AS ib, count(*) AS inter
          FROM gf a JOIN gf b USING (g) WHERE a.doc_id < b.doc_id GROUP BY 1, 2),
        j AS (
          SELECT CASE WHEN sa.n <= sb.n THEN ia ELSE ib END AS id_small,
                 CASE WHEN sa.n <= sb.n THEN ib ELSE ia END AS id_big,
                 least(sa.n, sb.n) AS n_small, inter,
                 round(CAST(inter AS DOUBLE) / least(sa.n, sb.n), 6) AS containment
          FROM pairs
          JOIN sizes sa ON sa.doc_id = ia
          JOIN sizes sb ON sb.doc_id = ib)
        SELECT * FROM j WHERE containment >= 0.5 ORDER BY id_small, id_big
      """)),

    // Corpus profile ("dataset card"): per (source, lang) volume,
    // distinct-content count and mean quality — the one-page rollup a
    // curation run starts and ends with. Mean quality goes through
    // round-6 decimals (exact, order-independent) then one double
    // division; one hash aggregation, map-side combined.
    Query(
      "q97_corpus_profile",
      (s, dir) => {
        graft.pipeline.TextOps.corpusProfile(
            Tables.documents(s, dir), "source", "lang", "text")
          .orderBy("source", "lang")
      },
      Some(s"""
        SELECT source, lang, count(*) AS n_docs,
               CAST(coalesce(sum(CASE WHEN length($normSql) = 0 THEN 0
                        ELSE len(string_split($normSql, ' ')) END), 0) AS BIGINT) AS n_tokens,
               CAST(sum(coalesce(length(text), 0)) AS BIGINT) AS n_chars,
               count(DISTINCT md5($normSql)) AS n_unique,
               round(CAST(sum(CAST(round($qualitySql, 6) AS DECIMAL(18,6))) AS DOUBLE)
                     / count(*), 6) AS mean_quality
        FROM documents GROUP BY source, lang ORDER BY source, lang
      """)),

    // Sliding-window chunking (window 32, stride 16): the overlapping
    // context cut training-sequence and RAG pipelines make — every
    // start k·stride emits, tails may be short, no token unreachable.
    // Scan-stage row expansion, no shuffle beyond the result sort.
    Query(
      "q98_sliding_chunks",
      (s, dir) => {
        val T = graft.pipeline.TextOps
        Tables.documents(s, dir).select(F.col("doc_id"),
            F.posexplode(T.slidingChunks(T.tokens(F.col("text")), 32, 16))
              .as(Seq("chunk_idx", "chunk")))
          .orderBy("doc_id", "chunk_idx")
      },
      Some(s"""
        WITH ws AS (
          SELECT doc_id, string_split($normSql, ' ') AS w FROM documents),
        cs AS (
          SELECT doc_id,
                 unnest([{'ci': k, 'c': array_to_string(w[k*16+1 : least(k*16+32, len(w))], ' ')}
                         FOR k IN range(0, CAST(ceil(len(w) / 16.0) AS BIGINT))],
                        recursive := true)
          FROM ws)
        SELECT doc_id, CAST(ci AS INT) AS chunk_idx, c AS chunk
        FROM cs ORDER BY doc_id, chunk_idx
      """)))
}
