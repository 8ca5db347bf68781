package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.{functions => F}

/** Deterministic sampling for training-data pipelines.
  *
  * `sample(frac)` on a 100 TB corpus is the wrong tool when the sample
  * must be REPRODUCIBLE across reruns, engines, partitionings and
  * retries (Spark's Bernoulli sampler is seeded per partition — a
  * repartition changes the sample). Hashing a stable row key instead
  * gives every row a permanent [0,1) coordinate: the same row is in or
  * out forever, on any engine that agrees on md5 — which is exactly what
  * lets a DuckDB oracle replay the same sample bit-for-bit.
  *
  * Scan-stage only: no shuffle, no RNG state, codegen'd (md5/conv are
  * native expressions).
  */
object Sampling {

  /** Permanent per-row coordinate in [0, 10000): first 60 bits of
    * md5(key) mod 10000 (basis-point resolution). */
  def hashBp(key: Column): Column =
    F.pmod(F.conv(F.substring(F.md5(key), 1, 15), 16, 10).cast("long"),
      F.lit(10000L)).cast("int")

  /** Keep ~`bp`/10000 of rows, deterministically by `key`. */
  def deterministic(df: DataFrame, key: Column, bp: Int): DataFrame =
    df.filter(hashBp(key) < bp)

  /** Stratified variant: per-stratum rates in basis points; strata not
    * in the map fall back to `defaultBp`. Same scan-stage shape — the
    * rate lookup is a when-chain, not a join. */
  def stratified(df: DataFrame, key: Column, stratum: Column,
                 ratesBp: Map[String, Int], defaultBp: Int = 0): DataFrame = {
    val rate = ratesBp.foldLeft(F.lit(defaultBp)) { case (acc, (s, r)) =>
      F.when(stratum === s, F.lit(r)).otherwise(acc)
    }
    df.filter(hashBp(key) < rate)
  }

  /** Deterministic train/val/test split: every row gets a permanent
    * split label from its hash coordinate — `train` below `trainBp`,
    * `val` below `trainBp + valBp`, `test` otherwise. The property that
    * matters for training pipelines is LEAK-FREENESS UNDER CHURN: a
    * row's label never changes when the corpus is re-read, repartitioned,
    * grown, or re-split by another engine, so a document can never
    * migrate from test into train between experiment runs. Scan-stage
    * when-chain — no shuffle, no RNG state. */
  def split(df: DataFrame, key: Column,
            trainBp: Int = 9000, valBp: Int = 500,
            splitCol: String = "split"): DataFrame = {
    require(trainBp >= 0 && valBp >= 0 && trainBp + valBp <= 10000,
      s"split: trainBp + valBp must be within [0, 10000], got $trainBp + $valBp")
    val c = hashBp(key)
    df.withColumn(splitCol,
      F.when(c < trainBp, F.lit("train"))
        .when(c < trainBp + valBp, F.lit("val"))
        .otherwise(F.lit("test")))
  }

  /** Mixture reweighting (data mixing): per-source keep-rates, in basis
    * points, that reshape the corpus toward TARGET source proportions
    * under a total document budget — the stage that turns "we want 50%
    * web, 30% code, 20% reference" into concrete per-source sampling
    * rates. rate_s = min(1, budget·w_s / n_s); sources outside the
    * target map rate 0. The numerator multiplies in exact long
    * arithmetic before one double division, so any engine replays the
    * identical rates. Feed the result straight into `stratified` to
    * materialize the mixture deterministically. One count aggregation —
    * payloads never shuffle. */
  def mixtureRates(docs: DataFrame, sourceCol: String,
                   targetsBp: Map[String, Int], budget: Long): DataFrame = {
    val targetBp = targetsBp.foldLeft(F.lit(0L)) { case (acc, (s, w)) =>
      F.when(F.col(sourceCol) === s, F.lit(w.toLong)).otherwise(acc)
    }
    docs.groupBy(sourceCol).agg(F.count(F.lit(1)).as("n"))
      .withColumn("rate_bp", F.least(F.lit(10000L),
        F.floor((F.lit(budget) * targetBp).cast("double") / F.col("n"))))
  }

  /** Temperature-flattened mixture sampling rates WITHOUT upsampling:
    * per-source keep-rates that move the mixture from observed
    * proportions p_i toward p_i^alpha (alpha < 1 flattens — the
    * standard multilingual/multi-domain rebalancing rule), scaled to
    * the largest budget where no source needs more than its own data.
    * The binding source is the SMALLEST one (its rate is exactly 1.0)
    * and every other rate is (n_min / n_i)^(1-alpha) < 1.
    *
    * Engine parity: at the default alpha = 0.5 the exponent is 0.5 and
    * the whole rate is one correctly-rounded IEEE division + sqrt —
    * bit-reproducible on any engine, so the DuckDB oracle replays it
    * exactly. Other alphas go through pow(), whose last-ULP behavior
    * is libm-specific — fine for production sampling, but pin oracle
    * tests to alpha = 0.5.
    *
    * Shape at scale: one count aggregation (map-side combined), a
    * broadcast single-row min — no corpus-sized shuffle at any size. */
  def temperatureRates(docs: DataFrame, sourceCol: String,
                       alpha: Double = 0.5): DataFrame = {
    // alpha > 1 would SHARPEN the mixture and push large-source rates
    // past 1.0 — upsampling, which this operator contractually never
    // does; alpha = 1 keeps observed proportions (every rate 1.0)
    require(alpha > 0.0 && alpha <= 1.0, s"alpha $alpha outside (0, 1]")
    val counts = docs.groupBy(sourceCol).agg(F.count(F.lit(1)).as("n"))
    val minN = counts.agg(F.min("n").as("__min"))
    val ratio = F.col("__min").cast("double") / F.col("n")
    val rate =
      if (alpha == 0.5) F.sqrt(ratio) else F.pow(ratio, F.lit(1.0 - alpha))
    counts.crossJoin(F.broadcast(minN))
      .select(F.col(sourceCol), F.col("n"), F.round(rate, 6).as("rate"))
  }

  /** Sequence packing (training-batch construction): assign documents,
    * in deterministic per-`partitionCol` order, to fixed token-budget
    * packs — the concat-and-chunk shape that turns a curated corpus
    * into training sequences. A document belongs to the pack its FIRST
    * token falls in (`floor(tokens_before / budget)`); a straddling doc
    * is split at materialization time, but the ASSIGNMENT is what the
    * distributed job shuffles on. The running total is a window cumsum
    * partitioned by `partitionCol` (source/shard) — packing never needs
    * a global single-partition pass, and a power-of-two budget keeps
    * the double division exact so any engine replays the same packs. */
  def packSequences(docs: DataFrame, partitionCol: String, orderCol: String,
                    tokens: Column, budget: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(partitionCol).orderBy(orderCol)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val before = F.sum(tokens).over(w) - tokens
    docs.withColumn("pack_id", F.floor(before / F.lit(budget.toDouble)))
  }

  /** Per-group cap: keep at most `cap` rows per `group`, chosen
    * deterministically as the `cap` smallest md5(key) values — the
    * "no single domain may dominate the mix" primitive (domain caps in
    * web-corpus curation). Unlike the rate-based samplers above this is
    * an absolute bound, so a 10^9-page domain and a 10^3-page domain
    * both land ≤ cap.
    *
    * Shape at scale: rank-over-window then `rn <= cap` is rewritten by
    * Catalyst's InferWindowGroupLimit into a WindowGroupLimit physical
    * node — every task discards past-cap rows map-side BEFORE the
    * group shuffle, so the exchange carries O(groups × cap), not the
    * corpus (plan-asserted in CurationSpec). The md5 order key makes
    * the chosen rows engine-portable and churn-stable, same as
    * `deterministic`. */
  def capPerGroup(df: DataFrame, key: Column, group: Column, cap: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(group).orderBy(F.md5(key.cast("string")), key)
    df.withColumn("__rn", F.row_number().over(w))
      .filter(F.col("__rn") <= cap)
      .drop("__rn")
  }
}
