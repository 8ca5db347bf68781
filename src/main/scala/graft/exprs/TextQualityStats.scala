package graft.exprs

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: the four integers behind
  * `TextOps.qualityScore`, computed in ONE byte-level traversal of the
  * document (plus the lowercase pass) instead of four stacked regex
  * scans (r12 verdict task 2 — q48 was the heaviest honest map-only row
  * at the 100× probe, 31.8 s, dominated by the stopword alternation and
  * punctuation regexes re-reading every byte).
  *
  * Returns `struct<len int, tokens int, stops int, punct int>` with the
  * EXACT values of the regex pipeline it replaces (spec-pinned
  * byte-identical on unicode adversaries and the documents corpus):
  *
  *   - `len`    = `length(text)` — code points, counted as non-continuation
  *     bytes of the UTF-8 encoding.
  *   - `tokens` = `tokenCount(text)`: maximal runs of ASCII `[a-z0-9]` in
  *     `lower(text)` — the same `UTF8String.toLowerCase` Spark's `lower`
  *     uses, so locale-sensitive mappings (İ → i+̇ ) agree by
  *     construction; any non-[a-z0-9] code point (including every
  *     non-ASCII byte) breaks a run exactly like the `[^a-z0-9]+`
  *     replacement did.
  *   - `stops`  = `stopwordCount(text)`: runs equal to one of the 19
  *     stopwords. In single-spaced normalized text the word-boundary
  *     regex can only match whole tokens, so membership == the
  *     alternation count.
  *   - `punct`  = `punctCount(text)`: code points of the RAW text outside
  *     ASCII alnum and outside Java-regex `\s` (ASCII-only class —
  *     non-ASCII whitespace deliberately counts, as it did under
  *     `[^A-Za-z0-9\s]`).
  */
case class TextQualityStats(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"text_quality_stats needs string, got ${other.catalogString}")
  }

  override def dataType: DataType = TextQualityStats.schema
  override def prettyName: String = "text_quality_stats"

  override def nullSafeEval(v: Any): Any =
    TextQualityStats.compute(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.exprs.TextQualityStats.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): TextQualityStats =
    copy(child = newChild)
}

object TextQualityStats {

  val schema: StructType = StructType(Seq(
    StructField("len", IntegerType, nullable = false),
    StructField("tokens", IntegerType, nullable = false),
    StructField("stops", IntegerType, nullable = false),
    StructField("punct", IntegerType, nullable = false)))

  /** TextOps.stopwords packed as big-endian byte keys (all words ≤ 4
    * ASCII bytes; lengths cannot collide — a shorter word's key has zero
    * high bytes while every stopword byte is ≥ 0x61). Sorted for binary
    * search. */
  private val stopKeys: Array[Int] = {
    val ws = Seq(
      "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
      "that", "this", "for", "on", "with", "as", "at", "by", "be")
    val ks = ws.map { w =>
      require(w.length <= 4 && w.forall(c => c >= 'a' && c <= 'z'))
      w.foldLeft(0)((k, c) => (k << 8) | c)
    }.toArray
    java.util.Arrays.sort(ks)
    ks
  }

  @inline private def isAlnumLower(b: Byte): Boolean =
    (b >= 'a' && b <= 'z') || (b >= '0' && b <= '9')

  /** One pass over the raw bytes (len + punct) and one over the
    * lowercased bytes (tokens + stops). No java.lang.String round-trip,
    * no regex engine, no intermediate normalized string. */
  def compute(s: UTF8String): InternalRow = {
    // raw pass: code points + punctuation class [^A-Za-z0-9\s]
    val nb = s.numBytes()
    var len = 0; var punct = 0
    var i = 0
    while (i < nb) {
      val b = s.getByte(i)
      if ((b & 0xC0) != 0x80) { // lead byte of a code point
        len += 1
        if (b >= 0) { // ASCII
          val alnum = (b >= 'a' && b <= 'z') || (b >= 'A' && b <= 'Z') ||
            (b >= '0' && b <= '9')
          val ws = b == ' ' || (b >= '\t' && b <= '\r') // java \s: \t \n \x0B \f \r
          if (!alnum && !ws) punct += 1
        } else punct += 1 // every non-ASCII code point is non-alnum, non-\s
      }
      i += 1
    }
    // lowered pass: [a-z0-9] runs = tokens; runs in the stopword set
    val low = s.toLowerCase()
    val lb = low.numBytes()
    var tokens = 0; var stops = 0
    var runLen = 0; var key = 0
    i = 0
    while (i <= lb) {
      val in = i < lb && {
        val b = low.getByte(i); isAlnumLower(b)
      }
      if (in) {
        runLen += 1
        if (runLen <= 4) key = (key << 8) | (low.getByte(i) & 0xFF)
      } else if (runLen > 0) {
        tokens += 1
        if (runLen <= 4 && java.util.Arrays.binarySearch(stopKeys, key) >= 0) stops += 1
        runLen = 0; key = 0
      }
      i += 1
    }
    new GenericInternalRow(Array[Any](len, tokens, stops, punct))
  }
}
