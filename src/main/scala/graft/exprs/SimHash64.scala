package graft.exprs

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native Catalyst expression: 64-bit SimHash of a token array.
  *
  * The codegen-integrated form of the pipeline's SimHash kernel
  * (graft.pipeline.Dedup): unlike a Scala UDF it participates in
  * whole-stage codegen — no UDF serialization boundary, null handling
  * inlined by `nullSafeCodeGen`, and the surrounding projection keeps
  * its generated-code pipeline intact. The bit-mixing loop itself lives
  * in the static `compute` helper that both the interpreted and the
  * generated paths call.
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash64 needs array<string>, got ${other.catalogString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def nullSafeEval(v: Any): Any =
    SimHash64.compute(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.exprs.SimHash64.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHash64 {
  private val mdLocal = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** 64-bit token hash = first 8 md5 bytes (big-endian). md5 rather than
    * a murmur mix so an oracle engine can replay the exact word:
    * `('0x' || substr(md5(t), 1, 16))::UBIGINT` in DuckDB carries the
    * identical bit pattern — which is what upgrades the simhash query
    * from rows-only to a full hash-checked oracle. ~10 ns/token slower
    * than murmur; irrelevant next to tokenization cost. */
  def tokenHash64(s: String): Long = {
    val md = mdLocal.get()
    md.reset()
    val d = md.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    v
  }

  /** Same algorithm as the pipeline UDF kernel: per token ±1 into 64 bit
    * sums (md5-derived token hash), sign bits form the word. */
  def compute(tokens: ArrayData): Long = {
    val n = tokens.numElements()
    val sums = new Array[Int](64)
    var t = 0
    while (t < n) {
      if (!tokens.isNullAt(t)) {
        val h = tokenHash64(tokens.getUTF8String(t).toString)
        var i = 0
        while (i < 64) {
          if (((h >>> i) & 1L) == 1L) sums(i) += 1 else sums(i) -= 1
          i += 1
        }
      }
      t += 1
    }
    var word = 0L
    var i = 0
    while (i < 64) { if (sums(i) > 0) word |= (1L << i); i += 1 }
    word
  }
}
