package graft.exprs

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: Jaccard similarity of two string arrays
  * (treated as sets).
  *
  * The exact-verification kernel of MinHash-LSH dedup — runs once per
  * candidate pair, so with the scan stage already codegen the verify
  * projection should be too. One hash-set build per pair, no UDF
  * boundary, no Seq boxing; identical semantics to the UDF kernel
  * (empty ∪ empty ⇒ 0.0, null elements ignored).
  */
case class JaccardSim(left: Expression, right: Expression) extends BinaryExpression {

  private def ok(t: DataType) = t match {
    case ArrayType(StringType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"jaccard_sim needs two array<string>, got ${left.dataType.catalogString}, " +
        s"${right.dataType.catalogString}")

  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaccard_sim"

  override def nullSafeEval(a: Any, b: Any): Any =
    JaccardSim.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.exprs.JaccardSim.compute($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaccardSim =
    copy(left = newLeft, right = newRight)
}

object JaccardSim {
  def compute(a: ArrayData, b: ArrayData): Double = {
    val sa = new java.util.HashSet[UTF8String]()
    var i = 0
    val na = a.numElements()
    while (i < na) {
      if (!a.isNullAt(i)) sa.add(a.getUTF8String(i))
      i += 1
    }
    val sb = new java.util.HashSet[UTF8String]()
    var j = 0
    val nb = b.numElements()
    while (j < nb) {
      if (!b.isNullAt(j)) sb.add(b.getUTF8String(j))
      j += 1
    }
    var inter = 0
    val it = sa.iterator()
    while (it.hasNext) if (sb.contains(it.next())) inter += 1
    val union = sa.size() + sb.size() - inter
    if (union == 0) 0.0 else inter.toDouble / union
  }
}
