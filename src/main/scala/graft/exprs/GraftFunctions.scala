package graft.exprs

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Expression

/** Registration for graft's native Catalyst expressions — callable from
  * Column code via `F.call_function` and from SQL by name. */
object GraftFunctions {

  /** The single source of truth for (name, usage, builder) — consumed by
    * both the imperative `register` below and the session-build-time
    * `GraftExtensions` injection, so the two deployment paths can never
    * drift apart. Int params arrive as foldable literals from
    * `call_function`. */
  val builders: Seq[(String, String, Seq[Expression] => Expression)] = Seq(
    ("simhash64", "_FUNC_(tokens) - 64-bit SimHash of a token array",
      es => SimHash64(es.head)),
    ("cosine_sim", "_FUNC_(a, b) - cosine similarity of two float arrays",
      es => CosineSim(es(0), es(1))),
    ("jaccard_sim", "_FUNC_(a, b) - Jaccard similarity of two string arrays",
      es => JaccardSim(es(0), es(1))),
    ("shingle_w", "_FUNC_(tokens, w) - distinct word w-shingles",
      es => Shingles(es.head, es(1).eval().asInstanceOf[Int])),
    ("text_quality_stats",
      "_FUNC_(text) - struct<len,tokens,stops,punct> of a document in one pass",
      es => TextQualityStats(es.head)),
    ("dup_ngram_stats",
      "_FUNC_(text) - struct<tokens,d2,d3>: token + distinct bigram/trigram counts",
      es => DupNgramStats(es.head)),
    ("minhash_bands", "_FUNC_(shingles, k, bands) - LSH band keys",
      es => MinHashBands(es.head,
        es(1).eval().asInstanceOf[Int], es(2).eval().asInstanceOf[Int])),
    // boundaries arrive as a foldable array literal (driver-held
    // quantiles), folded into the expression at build time so the
    // binary-search array rides codegen as one reference object
    ("boundary_bucket",
      "_FUNC_(v, boundaries) - count of sorted distinct boundaries <= v",
      es => {
        // the function is SQL-visible once registered: reject non-foldable
        // / null / null-element boundaries with a clear message instead of
        // an analysis-time NPE from eval().toDoubleArray()
        def bad(why: String) = throw new IllegalArgumentException(
          s"boundary_bucket: boundaries must be a foldable array<double> literal without nulls ($why)")
        if (es.size != 2) bad(s"${es.size} arguments")
        if (!es(1).foldable) bad("not foldable")
        // element type must already be double (ADVICE r19): eval() of an
        // int-array literal hands ArrayData.toDoubleArray() boxed
        // Integers — an opaque ClassCastException at analysis, exactly
        // the unclear failure this guard chain exists to prevent
        es(1).dataType match {
          case org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.DoubleType, _) => ()
          case other => bad(s"boundaries type ${other.catalogString}")
        }
        es(1).eval() match {
          case a: org.apache.spark.sql.catalyst.util.ArrayData =>
            if ((0 until a.numElements()).exists(a.isNullAt)) bad("null element")
            BoundaryBucket(es.head, BoundaryBucket.prepare(a.toDoubleArray()).toSeq)
          case _ => bad("null or non-array")
        }
      }),
    // Spark ships BloomFilterMightContain for its runtime-filter rewrite
    // but does not expose it in FunctionRegistry; registering it here
    // gives the dedup pipeline a codegen'd membership probe (the sketch
    // rides the plan as a binary literal — no UDF ser/de boundary, no
    // broadcast variable). Probe values must be xxhash64 longs, matching
    // bloom_filter_agg's insertion hashing.
    ("bloom_might_contain", "_FUNC_(sketch, xxhash64_value) - bloom membership",
      es => org.apache.spark.sql.catalyst.expressions
        .BloomFilterMightContain(es(0), es(1))),
    // …and its build-side twin (also unregistered in OSS Spark): the
    // analyzer wraps the returned AggregateFunction in an
    // AggregateExpression during resolution.
    ("bloom_sketch_agg",
      "_FUNC_(xxhash64_value, items, bits) - serialized bloom sketch",
      es => new org.apache.spark.sql.catalyst.expressions.aggregate
        .BloomFilterAggregate(es(0), es(1), es(2))))

  /** Idempotent: re-registering an existing name invalidates session
    * caches (measured 12× slowdown on the next run of the same query),
    * so register once per session only. Synchronized because Verify/Bench
    * run queries concurrently — two threads passing the exists check
    * together would both re-register and trigger that invalidation. */
  def register(spark: SparkSession): Unit = synchronized {
    val reg = spark.sessionState.functionRegistry
    builders.foreach { case (name, _, builder) =>
      val id = org.apache.spark.sql.catalyst.FunctionIdentifier(name)
      if (!reg.functionExists(id)) {
        reg.createOrReplaceTempFunction(name, builder, "scala_udf")
      }
    }
  }
}
