package graft.queries

import graft.Tables
import graft.pipeline._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.{functions => F}

/** Training-data pipeline operators (SURVEY.md §7.5 north star):
  * deduplication, similarity search, text analysis, multimodal columns.
  * SQL-expressible ops carry DuckDB oracles; LSH/ANN ops are rows-only
  * (their correctness is pinned by ScalaTest fixtures with known ground
  * truth instead).
  */
object PipelineQueries extends QueryPack {

  /** The test corpus has no exact duplicates, so dedup demos operate on
    * corpus ∪ shifted-copy — every doc then has exactly one exact dup,
    * giving the operators deterministic, non-empty ground truth. */
  private def dupedDocs(s: org.apache.spark.sql.SparkSession, dir: String) = {
    val d = Tables.documents(s, dir).select(F.col("doc_id"), F.col("text"))
    // the corpus parquet is a single split locally — spread the heavy
    // per-doc kernels across all cores (real corpora arrive pre-split)
    d.unionByName(d.select((F.col("doc_id") + 1000000).as("doc_id"), F.col("text")))
      .repartition(s.sparkContext.defaultParallelism)
  }

  private val normSql =
    "trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'), ' +', ' ', 'g'))"

  def queries: Seq[Query] = Seq(
    // Exact dedup: hash-groupBy on a 128-bit content key. The shuffle
    // carries (key, id) only — at 100 TB the payload never moves.
    Query(
      "q40_exact_dedup",
      (s, dir) => {
        val docs = dupedDocs(s, dir)
        docs.select(Dedup.exactKey(F.col("text")).as("content_key"), F.col("doc_id"))
          .groupBy("content_key")
          .agg(F.count(F.lit(1)).as("n_copies"), F.min("doc_id").as("keeper"))
          .filter(F.col("n_copies") > 1)
          .orderBy("content_key")
      },
      Some(s"""
        SELECT md5($normSql) AS content_key,
               count(*) AS n_copies, min(doc_id) AS keeper
        FROM (SELECT doc_id, text FROM documents
              UNION ALL SELECT doc_id + 1000000, text FROM documents)
        GROUP BY 1 HAVING count(*) > 1
        ORDER BY content_key
      """)),

    // MinHash + LSH near-dup: shingle → 32 minhashes → 8 bands × 4 rows →
    // bucket-join candidates → exact n-gram Jaccard verify. Linear in
    // corpus size; candidate buckets capped against boilerplate blowup.
    Query(
      "q41_minhash_lsh",
      (s, dir) => {
        // persist the per-doc (shingles, bands): candidate generation and
        // both verify joins reuse it — without the barrier the whole
        // shingle+32-minhash expression tree is recomputed per use (and
        // per band slice), which is catastrophic at any scale
        val docs = dupedDocs(s, dir)
          .select(F.col("doc_id"), Dedup.shingles(F.col("text")).as("sh"))
          .select(F.col("doc_id"), F.col("sh"),
            Dedup.bandKeysDirect(F.col("sh"), k = 32, bands = 8).as("bands"))
          .persist()
        val cand = Dedup.candidatePairs(docs, "doc_id", "bands")
        val withSets = cand
          .join(docs.select(F.col("doc_id").as("id_a"), F.col("sh").as("sh_a")), "id_a")
          .join(docs.select(F.col("doc_id").as("id_b"), F.col("sh").as("sh_b")), "id_b")
        withSets.select(F.col("id_a"), F.col("id_b"),
            Dedup.jaccard(F.col("sh_a"), F.col("sh_b")).as("jaccard"))
          .filter(F.col("jaccard") >= 0.8)
          .orderBy("id_a", "id_b")
      },
      None),

    // SimHash near-dup: 64-bit sign fingerprint, 4×16-bit bands,
    // Hamming ≤ 3 verification.
    Query(
      "q42_simhash",
      (s, dir) => {
        val sim = Dedup.simhash(dupedDocs(s, dir), "doc_id", "text")
          .withColumn("bands", Dedup.simhashBands(F.col("simhash")))
          .persist()
        // low-entropy corpora cluster 16-bit chunks hard: a generous cap
        // admits O(cap²) pairs per bucket across thousands of buckets —
        // millions of Hamming verifications. 32 keeps exact-dup recall
        // (dup pairs share all four chunks, landing in tiny buckets)
        // while dropping boilerplate clusters, the standard spam control.
        val cand = Dedup.candidatePairs(sim, "id", "bands", maxBucket = 32)
        cand
          .join(sim.select(F.col("id").as("id_a"), F.col("simhash").as("h_a")), "id_a")
          .join(sim.select(F.col("id").as("id_b"), F.col("simhash").as("h_b")), "id_b")
          .select(F.col("id_a"), F.col("id_b"),
            Dedup.hamming(F.col("h_a"), F.col("h_b")).as("hamming"))
          .filter(F.col("hamming") <= 3)
          .orderBy("id_a", "id_b")
      },
      None),

    // Exact n-gram Jaccard on a bounded window of docs — the verify
    // kernel in isolation. Oracle: DuckDB list comprehension rebuilds the
    // same distinct word-bigram sets; |∩|/|∪| of small ints divides to
    // the identical IEEE double on both engines.
    Query(
      "q43_ngram_jaccard",
      (s, dir) => {
        val docs = dupedDocs(s, dir)
          .filter(F.pmod(F.col("doc_id"), F.lit(1000000)) < 60)
          .select(F.col("doc_id"), Dedup.shingles(F.col("text"), 2).as("sh"))
          .persist()
        val a = docs.select(F.col("doc_id").as("id_a"), F.col("sh").as("sh_a"))
        val b = docs.select(F.col("doc_id").as("id_b"), F.col("sh").as("sh_b"))
        a.crossJoin(b).filter(F.col("id_a") < F.col("id_b"))
          .select(F.col("id_a"), F.col("id_b"),
            Dedup.jaccardNative(F.col("sh_a"), F.col("sh_b")).as("jaccard"))
          .filter(F.col("jaccard") >= 0.2)
          .orderBy("id_a", "id_b")
      },
      Some(s"""
        WITH docs AS (
          SELECT doc_id, text FROM documents WHERE doc_id < 60
          UNION ALL SELECT doc_id + 1000000, text FROM documents WHERE doc_id < 60
        ),
        sh AS (
          SELECT doc_id,
                 CASE WHEN len(ws) < 2 THEN [array_to_string(ws, ' ')]
                      ELSE list_distinct([ws[i] || ' ' || ws[i+1] FOR i IN range(1, len(ws))])
                 END AS sh
          FROM (SELECT doc_id, string_split($normSql, ' ') AS ws FROM docs)
        )
        SELECT id_a, id_b, jaccard FROM (
          SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                 CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
                 / len(list_distinct(list_concat(a.sh, b.sh))) AS jaccard
          FROM sh a, sh b WHERE a.doc_id < b.doc_id)
        WHERE jaccard >= 0.2
        ORDER BY id_a, id_b
      """)),

    // Embedding near-dup: hyperplane-LSH buckets, cosine ≥ 0.99 within
    // bucket. Corpus ∪ copy ⇒ every vector has one exact dup (cos = 1).
    // Oracle: all-pairs threshold — equivalent because identical vectors
    // always share an LSH bucket and no non-identical pair reaches even
    // 0.98 in this corpus (measured; ≥0.01 margin below the threshold,
    // so engine float-accumulation differences cannot flip membership).
    // The cos value itself is excluded: last-ULP accumulation order
    // differs across engines.
    Query(
      "q44_embedding_dedup",
      (s, dir) => {
        val e = Tables.embeddings(s, dir).select(F.col("vec_id"), F.col("embedding"))
        val corpus = e.unionByName(
          e.select((F.col("vec_id") + 1000000).as("vec_id"), F.col("embedding")))
        val bucketed = corpus.withColumn("bucket",
          Similarity.hyperplaneBucket(F.col("embedding")))
          .persist()
        val a = bucketed.select(F.col("vec_id").as("id_a"), F.col("embedding").as("v_a"),
          F.col("bucket"))
        val b = bucketed.select(F.col("vec_id").as("id_b"), F.col("embedding").as("v_b"),
          F.col("bucket"))
        a.join(b, "bucket")
          .filter(F.col("id_a") < F.col("id_b"))
          .select(F.col("id_a"), F.col("id_b"),
            Similarity.cosineNative(s)(F.col("v_a"), F.col("v_b")).as("cos"))
          .filter(F.col("cos") >= 0.99)
          .select("id_a", "id_b")
          .orderBy("id_a", "id_b")
      },
      Some("""
        WITH corpus AS (
          SELECT vec_id, embedding FROM embeddings
          UNION ALL SELECT vec_id + 1000000, embedding FROM embeddings
        )
        SELECT a.vec_id AS id_a, b.vec_id AS id_b
        FROM corpus a, corpus b
        WHERE a.vec_id < b.vec_id
          AND list_cosine_similarity(a.embedding, b.embedding) >= 0.99
        ORDER BY id_a, id_b
      """)),

    // Similarity search baseline: exact brute-force cosine top-5 for a
    // broadcast query set; emits ranks (engine-portable determinism).
    Query(
      "q45_knn_brute",
      (s, dir) => {
        val e = Tables.embeddings(s, dir)
        val queries = e.filter(F.col("vec_id") < 10)
        Similarity.bruteForceTopK(e, queries, 5)
          .select("query_id", "neighbor_id", "rank")
          .orderBy("query_id", "rank")
      },
      Some("""
        SELECT query_id, neighbor_id, rank FROM (
          SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                 row_number() OVER (
                   PARTITION BY q.vec_id
                   ORDER BY list_cosine_similarity(q.embedding, c.embedding) DESC,
                            c.vec_id) AS rank
          FROM embeddings q, embeddings c
          WHERE q.vec_id < 10 AND c.vec_id <> q.vec_id)
        WHERE rank <= 5
        ORDER BY query_id, rank
      """)),

    // Scale-path ANN: hyperplane-LSH bucketed top-k (recall < 1 by
    // design — rows-only).
    Query(
      "q46_knn_lsh",
      (s, dir) => {
        val e = Tables.embeddings(s, dir)
        val queries = e.filter(F.col("vec_id") < 10)
        Similarity.lshTopK(e, queries, 5, planes = 4)
          .select("query_id", "neighbor_id", "rank")
          .orderBy("query_id", "rank")
      },
      None),

    // Language ID: marker-lexicon scan + argmax, one pass, no shuffle
    // until the confusion-matrix rollup.
    Query(
      "q47_langid",
      (s, dir) => {
        Tables.documents(s, dir)
          .select(F.col("lang"), TextOps.langId(F.col("text")).as("predicted"))
          .groupBy("lang", "predicted")
          .agg(F.count(F.lit(1)).as("n"))
          .orderBy("lang", "predicted")
      },
      Some {
        val scores = TextOps.langMarkers.map { case (lang, ws) =>
          lang -> s"len(regexp_extract_all($normSql, '\\b(${ws.mkString("|")})\\b'))"
        }
        val best = scores.map(_._2).mkString("greatest(", ", ", ")")
        val argmax = scores.reverse.foldLeft("'und'") { case (acc, (lang, s)) =>
          s"CASE WHEN $best > 0 AND $s = $best THEN '$lang' ELSE $acc END"
        }
        s"""
        SELECT lang, predicted, count(*) AS n
        FROM (SELECT lang, $argmax AS predicted FROM documents)
        GROUP BY lang, predicted
        ORDER BY lang, predicted
        """
      }),

    // Quality scoring: length band + stopword ratio + punctuation ratio.
    Query(
      "q48_quality",
      (s, dir) => {
        Tables.documents(s, dir)
          .select(F.col("doc_id"),
            TextOps.tokenCount(F.col("text")).as("n_tokens"),
            TextOps.stopwordCount(F.col("text")).as("n_stopwords"),
            TextOps.qualityScore(F.col("text")).as("quality"))
          .orderBy("doc_id")
      },
      Some {
        val stopPat = TextOps.stopwords.mkString("\\b(", "|", ")\\b")
        s"""
        SELECT doc_id,
               CASE WHEN length($normSql) = 0 THEN 0
                    ELSE len(string_split($normSql, ' ')) END AS n_tokens,
               len(regexp_extract_all($normSql, '$stopPat')) AS n_stopwords,
               least(CAST(length(text) AS DOUBLE) / 200.0, 1.0) * 0.4
               + least(CASE WHEN (CASE WHEN length($normSql) = 0 THEN 0
                                  ELSE len(string_split($normSql, ' ')) END) = 0 THEN 0.0
                            ELSE CAST(len(regexp_extract_all($normSql, '$stopPat')) AS DOUBLE)
                                 / (CASE WHEN length($normSql) = 0 THEN 0
                                    ELSE len(string_split($normSql, ' ')) END) END * 4.0, 1.0) * 0.4
               + (1.0 - least(CASE WHEN length(text) = 0 THEN 0.0
                              ELSE CAST(len(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) AS DOUBLE)
                                   / length(text) END * 5.0, 1.0)) * 0.2
               AS quality
        FROM documents
        ORDER BY doc_id
        """
      }),

    // Token counting: whitespace + BPE-ish subword proxy.
    Query(
      "q49_token_count",
      (s, dir) => {
        Tables.documents(s, dir)
          .select(F.col("doc_id"),
            TextOps.tokenCount(F.col("text")).as("ws_tokens"),
            TextOps.tokenCountBpeIsh(F.col("text")).as("bpe_tokens"))
          .orderBy("doc_id")
      },
      Some(s"""
        SELECT doc_id,
               CASE WHEN length($normSql) = 0 THEN 0
                    ELSE len(string_split($normSql, ' ')) END AS ws_tokens,
               len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]')) AS bpe_tokens
        FROM documents
        ORDER BY doc_id
      """)),

    // Document fingerprinting: md5 of normalized content, rolled up by
    // source to spot templated/boilerplate sources.
    Query(
      "q50_fingerprint",
      (s, dir) => {
        Tables.documents(s, dir)
          .select(F.col("source"), TextOps.fingerprintMd5(F.col("text")).as("fp"))
          .groupBy("source")
          .agg(F.count(F.lit(1)).as("n_docs"), F.countDistinct(F.col("fp")).as("n_distinct"))
          .orderBy("source")
      },
      Some(s"""
        SELECT source, count(*) AS n_docs, count(DISTINCT md5($normSql)) AS n_distinct
        FROM documents
        GROUP BY source
        ORDER BY source
      """)),

    // Exactness anchor for the embedding near-dup family: all-pairs
    // cosine above a threshold, oracle-checked. At scale this exact
    // stage runs only on LSH/IVF candidate buckets (q44/q46); here it
    // runs standalone so the cosine kernel itself is hash-verified.
    // Threshold 0.4 sits ≥1e-4 from every pair at sf0.01 — engine
    // float-accumulation differences cannot flip membership.
    Query(
      "q55_cosine_pairs",
      (s, dir) => {
        Similarity.cosinePairs(Tables.embeddings(s, dir), 0.4)
          .select("id_a", "id_b")
          .orderBy("id_a", "id_b")
      },
      Some("""
        SELECT a.vec_id AS id_a, b.vec_id AS id_b
        FROM embeddings a, embeddings b
        WHERE a.vec_id < b.vec_id
          AND list_cosine_similarity(a.embedding, b.embedding) > 0.4
        ORDER BY id_a, id_b
      """)),

    // Duplicate-cluster resolution: exact cosine pairs as edges →
    // connected components → one cluster label per transitive duplicate
    // set. Oracle: the same edges in a DuckDB recursive CTE.
    Query(
      "q58_dup_clusters",
      (s, dir) => {
        val edges = Similarity.cosinePairs(Tables.embeddings(s, dir), 0.4)
        Dedup.connectedComponents(edges)
          .select("id", "cluster")
          .orderBy("id")
      },
      Some("""
        WITH RECURSIVE edges AS (
          SELECT a.vec_id AS src, b.vec_id AS dst
          FROM embeddings a, embeddings b
          WHERE a.vec_id < b.vec_id
            AND list_cosine_similarity(a.embedding, b.embedding) > 0.4
        ),
        undirected AS (SELECT src, dst FROM edges UNION SELECT dst, src FROM edges),
        reach(id, r) AS (
          SELECT src, src FROM undirected
          UNION
          SELECT u.dst, reach.r FROM undirected u JOIN reach ON u.src = reach.id
        )
        SELECT id, min(r) AS cluster FROM reach GROUP BY id ORDER BY id
      """)),

    // Scale-path ANN #2: IVF — deterministic Lloyd refinement, probe the
    // nprobe nearest cells. Approximate by construction ⇒ rows-only;
    // recall vs brute force is pinned by ScalaTest ground truth.
    Query(
      "q56_knn_ivf",
      (s, dir) => {
        val e = Tables.embeddings(s, dir)
        val queries = e.filter(F.col("vec_id") < 10)
        Similarity.ivfTopK(e, queries, 5, nlist = 16, nprobe = 4)
          .select("query_id", "neighbor_id", "rank")
          .orderBy("query_id", "rank")
      },
      None),

    // Multimodal metadata: payload as opaque binary + cheap header-level
    // metadata, no decode — stays entirely in the scan stage.
    Query(
      "q51_multimodal_meta",
      (s, dir) => {
        Multimodal.documentsAsMedia(Tables.documents(s, dir))
          .select(F.col("doc_id"),
            F.octet_length(F.col("payload")).as("n_bytes"),
            F.ascii(F.col("payload").cast("string")).as("first_byte"))
          .orderBy("doc_id")
      },
      Some("""
        SELECT doc_id, octet_length(encode(text)) AS n_bytes,
               ascii(text) AS first_byte
        FROM documents
        ORDER BY doc_id
      """)),

    // Multimodal decode: batched per-partition feature extraction over
    // the binary column (STUB kernel — deterministic fake features; the
    // partitioning/batching/schema plumbing is the real deliverable).
    // The stub derives its features from md5 of the payload bytes
    // precisely so this query gets a REAL hash-checked oracle: DuckDB
    // replays the same 60-bit digest prefix in SQL.
    Query(
      "q52_multimodal_decode",
      (s, dir) => {
        implicit val sp: org.apache.spark.sql.SparkSession = s
        Multimodal.extractFeatures(
            Multimodal.documentsAsMedia(Tables.documents(s, dir)))
          .toDF()
          .orderBy("doc_id")
      },
      Some("""
        SELECT doc_id,
               octet_length(encode(text)) AS n_bytes,
               CASE octet_length(encode(text)) % 3
                    WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg' ELSE 'webp' END AS format,
               CAST(64 + (h % 8) * 32 AS INT) AS width,
               CAST(64 + ((h // 8) % 8) * 32 AS INT) AS height,
               h AS checksum
        FROM (SELECT doc_id, text,
                     ('0x' || substring(md5(text), 1, 15))::BIGINT AS h
              FROM documents)
        ORDER BY doc_id
      """)))
}
