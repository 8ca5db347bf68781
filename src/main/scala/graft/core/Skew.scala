package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.{functions => F}

/** Skew handling for hot keys (SURVEY.md scale checklist: "skewed keys →
  * salting or AQE skew-join").
  *
  * AQE's skew-join split handles joins; aggregation skew needs the salt
  * trick: a single hot group key funnels its whole partition through one
  * reducer, so phase 1 groups by (key, salt) — spreading the hot key
  * over `salts` reducers — and phase 2 merges the partials by key. Only
  * algebraic aggregates (sum/count/min/max, and mean as sum+count)
  * decompose this way; both shuffles carry one row per (key, salt),
  * so the extra pass costs |keys|·salts tiny rows, not data rows.
  */
object Skew {

  /** Deterministic per-row salt in [0, salts): spreads rows of one key
    * without RNG (re-runs and retries see the same salt). */
  private def salt(salts: Int, cols: Seq[Column]): Column =
    F.pmod(F.xxhash64(cols: _*), F.lit(salts.toLong))

  /** Salted sum/count/min/max over possibly-skewed keys. `aggs` maps
    * output name → (valueColumn, op); op ∈ sum|count|min|max|mean.
    *
    * The default salt hashes the VALUE columns being aggregated: purely
    * row-data-derived, so a task retry or shuffle-fetch-failure recompute
    * assigns every row the same salt bucket (partition-id/monotonic-id
    * salts are NOT retry-stable and can double-count or lose partials —
    * the SPARK-23207 class of wrong results). The trade: rows of a hot
    * key with identical values share a bucket; if a hot key is dominated
    * by one repeated value, pass `saltBy` with a higher-cardinality
    * deterministic column set. */
  def saltedAgg(df: DataFrame, keys: Seq[String],
                aggs: Seq[(String, (String, String))],
                salts: Int = 16,
                saltBy: Seq[Column] = Nil): DataFrame = {
    val saltCol = if (saltBy.nonEmpty) salt(salts, saltBy)
                  else salt(salts, aggs.map(_._2._1).distinct.map(F.col))
    def partial(a: (String, (String, String))): Column = a match {
      case (out, (c, "sum"))   => F.sum(c).as(s"__p_$out")
      case (out, (c, "count")) => F.count(F.col(c)).as(s"__p_$out")
      case (out, (c, "min"))   => F.min(c).as(s"__p_$out")
      case (out, (c, "max"))   => F.max(c).as(s"__p_$out")
      case (out, (c, "mean"))  =>
        F.struct(F.sum(c).as("s"), F.count(F.col(c)).as("n")).as(s"__p_$out")
      case (_, (_, other)) => throw new IllegalArgumentException(s"non-algebraic op $other")
    }
    val ps = aggs.map(partial)
    val phase1 = df.withColumn("__salt", saltCol)
      .groupBy((keys :+ "__salt").map(F.col): _*)
      .agg(ps.head, ps.tail: _*)
    val ms = aggs.map(a => merge(a).as(a._1))
    phase1.groupBy(keys.map(F.col): _*)
      .agg(ms.head, ms.tail: _*)
  }

  private def merge(a: (String, (String, String))): Column = a match {
    case (out, (_, "sum"))   => F.sum(s"__p_$out")
    case (out, (_, "count")) => F.sum(s"__p_$out")
    case (out, (_, "min"))   => F.min(s"__p_$out")
    case (out, (_, "max"))   => F.max(s"__p_$out")
    case (out, (_, "mean"))  =>
      F.sum(F.col(s"__p_$out").getField("s")) / F.sum(F.col(s"__p_$out").getField("n"))
    case (_, (_, other)) => throw new IllegalArgumentException(s"non-algebraic op $other")
  }
}
