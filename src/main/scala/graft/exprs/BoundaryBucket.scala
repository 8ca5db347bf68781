package graft.exprs

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, LongType}

/** Native Catalyst expression: equi-depth chunk id — the count of sorted
  * distinct boundaries ≤ v, by BINARY search.
  *
  * The chunked value/time-axis plans (`Analytics.valueAxis`,
  * `Rolling.rollingDurationChunked`) derive a chunk id as "number of
  * quantile boundaries at or below the value". The declarative form —
  * `size(filter(lit(boundaries), b => b <= v))` — is O(k) comparisons
  * per ROW with k ≈ `spark.sql.shuffle.partitions`: negligible at the
  * local 32, but on a real cluster k is 1000+ and the scan sits in the
  * hot path of every chunked rank/percentile/rollingDuration. This
  * expression is the O(log k) form: `java.util.Arrays.binarySearch`
  * over a driver-held boundary array that rides the generated code as a
  * reference object (no per-row array literal materialization either —
  * the filter form rebuilds the array literal per row in the
  * interpreted fallback). Participates in whole-stage codegen via
  * `doGenCode`, so the surrounding chunk arithmetic stays in one
  * generated pipeline.
  *
  * Semantics pinned to Spark's comparison rules (BoundaryBucketSpec
  * differentials this against the filter form):
  *   - `-0.0` equals `0.0` (Spark `<=`), while `Double.compare` — which
  *     `binarySearch` uses — orders `-0.0 < 0.0`. Both the boundary
  *     array ([[BoundaryBucket.prepare]]) and the probe value
  *     ([[BoundaryBucket.count]]) are therefore normalized to `0.0`.
  *   - NaN is greater than every other value (Spark's total order), so
  *     a NaN probe counts every boundary; `binarySearch`'s insertion
  *     point gives exactly that (boundary arrays never contain NaN —
  *     the bounds jobs null non-finite values out before quantiles).
  *   - null in ⇒ null out (`UnaryExpression.nullSafeEval`), matching
  *     the callers' outer null-pinning when-chains.
  *
  * Boundaries are part of the expression tree (a plain `Seq[Double]`
  * constructor field, so case-class equality and canonicalization work;
  * arrays would compare by reference), bounded by construction: the
  * bounds jobs produce at most k−1 ≈ partitions quantiles.
  */
case class BoundaryBucket(child: Expression, boundaries: Seq[Double])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case DoubleType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"boundary_bucket needs a double value, got ${other.catalogString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "boundary_bucket"

  // one array per JVM per expression instance; re-derived after
  // serialization to executors (interpreted path) — the codegen path
  // ships it once as a reference object instead
  @transient private lazy val arr: Array[Double] = boundaries.toArray

  override def nullSafeEval(v: Any): Any =
    BoundaryBucket.count(arr, v.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bbBounds", arr, "double[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.exprs.BoundaryBucket.count($ref, $c);")
  }

  override protected def withNewChildInternal(newChild: Expression): BoundaryBucket =
    copy(child = newChild)
}

object BoundaryBucket {

  /** Canonical boundary array: sorted, `-0.0` normalized to `0.0`,
    * duplicates dropped (normalization can create one: an array holding
    * both `-0.0` and `0.0` — `Array.distinct` upstream keeps both, as
    * boxed `Double.equals` separates them). Call once on the driver. */
  def prepare(bs: Array[Double]): Array[Double] = {
    val n = bs.map(b => if (b == 0.0) 0.0 else b).sorted
    val out = Array.newBuilder[Double]
    var i = 0
    while (i < n.length) {
      if (i == 0 || java.lang.Double.compare(n(i - 1), n(i)) != 0) out += n(i)
      i += 1
    }
    out.result()
  }

  /** Count of boundaries ≤ v under Spark's ordering (`-0.0 = 0.0`, NaN
    * above all). `bs` must be [[prepare]]d: sorted ascending, distinct
    * under `Double.compare`, NaN-free. */
  def count(bs: Array[Double], v: Double): Long = {
    val key = if (v == 0.0) 0.0 else v // -0.0 probes must hit a 0.0 boundary
    val i = java.util.Arrays.binarySearch(bs, key)
    // exact hit at i: i boundaries strictly below + the hit itself;
    // miss: insertion point -(i+1) = count of boundaries < key = ≤ key
    if (i >= 0) (i + 1).toLong else (-i - 1).toLong
  }
}
