package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.{functions => F}

/** Embedding-column utilities beyond similarity search: int8
  * quantization (the storage/serving compression step of an embedding
  * pipeline) and exact fixed-point cluster statistics.
  *
  * Scale design: every per-vector computation here is a scan-stage
  * column expression (no shuffle, vectors never move); every CROSS-ROW
  * reduction goes through fixed-point integers, so partial aggregates
  * combine exactly in any order — no floating-point drift across 1000
  * executors, safe under AQE re-planning and task retries. */
object Embeddings {

  /** Float array → double array view (float→double is exact). */
  def asDouble(vec: Column): Column = F.transform(vec, _.cast("double"))

  /** Symmetric int8 quantization scale: max|x| / 127. */
  def int8Scale(v: Column): Column =
    F.array_max(F.transform(v, x => F.abs(x))) / 127.0

  /** L2 norm (sequential fold — deterministic element order). */
  def l2Norm(v: Column): Column =
    F.sqrt(F.aggregate(v, F.lit(0.0), (a, x) => a + x * x))

  /** Max absolute reconstruction error of round-trip int8 quantization
    * at the given scale column. A zero vector (scale 0) quantizes to
    * itself exactly — guarded so the division never produces NaN. */
  def maxQuantError(v: Column, scale: Column): Column =
    F.when(scale === 0, F.lit(0.0)).otherwise(
      F.array_max(F.transform(v, x => F.abs(x - F.round(x / scale) * scale))))

  /** Per-cluster statistics over an embedding column, in exact
    * fixed-point arithmetic (dims quantized to round(x·10^6) as int64):
    *
    *   n_vecs         — cluster size
    *   ssq            — Σ_rows Σ_dims xi²          (exact integer)
    *   csq            — Σ_dims (Σ_rows xi)²        (exact integer)
    *   centroid_norm2 — ‖centroid‖²  = csq/n²/10^12
    *   within_var     — mean ‖x−centroid‖² = (ssq − csq/n)/n/10^12
    *
    * Shape at scale: posexplode turns the vector column into (label,
    * dim, xi) scalars — payload arrays never cross a shuffle; one hash
    * aggregation on (label, dim) with map-side combine, then a tiny
    * (labels × dims)-row rollup. Because the shuffled partials are
    * integers, the result is bit-identical regardless of partitioning,
    * merge order, or retries; the only floating ops are two final
    * divisions per label on the driver-visible rollup. */
  def clusterStats(emb: DataFrame, labelCol: String, vecCol: String,
                   scale: Double = 1e6): DataFrame = {
    val dims = emb.select(
      F.col(labelCol),
      F.posexplode(F.col(vecCol)).as(Seq("dim", "x")))
      .select(F.col(labelCol), F.col("dim"),
        F.round(F.col("x").cast("double") * scale).cast("long").as("xi"))
    val perDim = dims.groupBy(labelCol, "dim")
      .agg(F.count(F.lit(1)).as("n"),
        F.sum("xi").as("sx"),
        F.sum(F.col("xi") * F.col("xi")).as("sx2"))
    val sq = scale * scale
    // Ragged vectors (unequal lengths within a label) would silently
    // corrupt the variance (n_vecs = max per-dim count ≠ the count the
    // short dims aggregated over) — fail loudly instead. assert_true
    // yields NULL when the invariant holds, so folding it into n_vecs
    // keeps the output schema unchanged while the check rides the same
    // aggregation (no extra pass over the data).
    perDim.groupBy(labelCol)
      .agg(F.when(F.assert_true(F.min("n") === F.max("n"),
            F.concat(F.lit("clusterStats: ragged vector lengths in label "),
              F.col(labelCol).cast("string"))).isNull,
          F.max("n")).as("n_vecs"),
        F.sum("sx2").as("ssq"),
        F.sum(F.col("sx") * F.col("sx")).as("csq"))
      .select(F.col(labelCol), F.col("n_vecs"), F.col("ssq"), F.col("csq"),
        ((F.col("csq").cast("double") / F.col("n_vecs")) / F.col("n_vecs") / sq)
          .as("centroid_norm2"),
        ((F.col("ssq").cast("double") - F.col("csq").cast("double") / F.col("n_vecs"))
          / F.col("n_vecs") / sq).as("within_var"))
  }

}
