package graft.exprs

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: token count plus DISTINCT word-bigram and
  * word-trigram counts of a document in ONE pass — the three integers
  * behind `TextOps.dupNgramFraction` (the Gopher-class repetitiousness
  * signal, q66) computed without re-running the normalize regex per
  * reference (r21 optimization round; same discipline as
  * [[TextQualityStats]], which replaced q48's four stacked regex scans
  * in r12).
  *
  * The expression form evaluated `trim(regexp_replace(lower(text),
  * "[^a-z0-9]+", " "))` once per column reference — q66's projection
  * holds ~17 references across its CASE trees — plus a `split` into a
  * UTF8String array and two `shingle_w` kernel calls. Measured at
  * sf0.1: 3.0–4.2 s for 5 000 × 300-char documents, i.e. pure
  * per-reference expression overhead, not data volume.
  *
  * Returns `struct<tokens int, d2 int, d3 int>` with EXACT parity:
  *
  *   - `tokens` = `TextOps.tokenCount(text)`: maximal runs of ASCII
  *     `[a-z0-9]` in `lower(text)` — byte-for-byte the
  *     [[TextQualityStats]] tokenizer, which is spec-pinned identical
  *     to the `[^a-z0-9]+` normalize-then-count form.
  *   - `d2`/`d3` = `size(shingle_w(tokens(text), n))` for n = 2/3 when
  *     `tokens ≥ n`: the count of DISTINCT space-joined token n-grams,
  *     distinctness by exact string equality (a java HashSet of the
  *     joined strings — no hashing shortcut, no collision risk). When
  *     `tokens < n` the field is 0; `dupNgramFraction` guards that
  *     branch to 0.0 before ever reading it (the `shingle_w` kernel
  *     returns the 1-element whole-doc shingle there, so a consumer
  *     that DOES want unguarded shingle counts must keep `shingle_w`).
  */
case class DupNgramStats(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"dup_ngram_stats needs string, got ${other.catalogString}")
  }

  override def dataType: DataType = DupNgramStats.schema
  override def prettyName: String = "dup_ngram_stats"

  override def nullSafeEval(v: Any): Any =
    DupNgramStats.compute(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.exprs.DupNgramStats.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): DupNgramStats =
    copy(child = newChild)
}

object DupNgramStats {

  val schema: StructType = StructType(Seq(
    StructField("tokens", IntegerType, nullable = false),
    StructField("d2", IntegerType, nullable = false),
    StructField("d3", IntegerType, nullable = false)))

  @inline private def isAlnumLower(b: Byte): Boolean =
    (b >= 'a' && b <= 'z') || (b >= '0' && b <= '9')

  /** One pass over the lowercased bytes: collect the `[a-z0-9]` runs as
    * ASCII strings (token bytes are ASCII by construction, so the
    * String round-trip is exact), then count distinct space-joined
    * 2- and 3-grams through string-equality HashSets. */
  def compute(s: UTF8String): InternalRow = {
    val low = s.toLowerCase()
    val lb = low.numBytes()
    val toks = new java.util.ArrayList[String]()
    var i = 0
    var runStart = -1
    while (i <= lb) {
      val in = i < lb && isAlnumLower(low.getByte(i))
      if (in) { if (runStart < 0) runStart = i }
      else if (runStart >= 0) {
        val bytes = new Array[Byte](i - runStart)
        var j = 0
        while (j < bytes.length) { bytes(j) = low.getByte(runStart + j); j += 1 }
        toks.add(new String(bytes, java.nio.charset.StandardCharsets.US_ASCII))
        runStart = -1
      }
      i += 1
    }
    val n = toks.size()
    var d2 = 0
    var d3 = 0
    if (n >= 2) {
      val seen2 = new java.util.HashSet[String](math.max(16, n * 2))
      var k = 0
      while (k + 1 < n) {
        if (seen2.add(toks.get(k) + " " + toks.get(k + 1))) d2 += 1
        k += 1
      }
      if (n >= 3) {
        val seen3 = new java.util.HashSet[String](math.max(16, n * 2))
        k = 0
        while (k + 2 < n) {
          if (seen3.add(toks.get(k) + " " + toks.get(k + 1) + " " + toks.get(k + 2))) d3 += 1
          k += 1
        }
      }
    }
    new GenericInternalRow(Array[Any](n, d2, d3))
  }
}
