package graft.semantics

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** tada-compatible value semantics (SURVEY.md §1.3–§1.5).
  *
  * The reference groups/joins/filters on *stringified* values: every row
  * key is the `fmt.Sprint` image of the cell, label levels joined by "|"
  * (reference: internal.go:1347-1376, valueContainers.go:199-265). We
  * reproduce that contract with codegen-friendly column expressions — no
  * UDFs — so key building stays inside whole-stage codegen and pushes
  * through shuffles untouched.
  */
object TadaFormat {

  /** Go `fmt.Sprint` formatting differences from Spark's `cast(string)`:
    *   - float64 1.0 prints "1" (no trailing ".0");
    *   - timestamps print RFC3339 (valueContainers.go:194-196).
    * Both are expressible as native expressions.
    */
  def stringify(c: Column, dt: DataType): Column = dt match {
    case DoubleType | FloatType =>
      // strip a trailing ".0" so 1.0 keys equal to integer/string "1"
      regexp_replace(c.cast(StringType), "\\.0$", "")
    // One body for both zone flavors — a MAPPING DECISION, not literal
    // reference parity (ADVICE r19): under the engine's pinned-UTC
    // session zone an NTZ (zone-less parquet) value is treated as a UTC
    // instant, i.e. the reference's time.Time kind, which prints RFC3339
    // WITH the trailing 'Z' (valueContainers.go:194-196). The reference
    // also has civil.DateTime/Date/Time kinds whose .String() prints
    // RFC3339 WITHOUT the 'Z'; mapping NTZ there would change group keys
    // and astype-string for zone-less data. Chosen so the same wall time
    // keys identically through either flavor (date_format reads NTZ wall
    // time directly — no cast hazard).
    case TimestampType | TimestampNTZType =>
      date_format(c, "yyyy-MM-dd'T'HH:mm:ss'Z'")
    case ArrayType(_, _) =>
      // Go fmt.Sprint of a slice: space-joined in brackets; a ZERO-length
      // nested slice is null (setNullsFromInterface internal.go:1835-1926,
      // pinned by ExampleSeries_nestedSlice)
      when(size(c) === 0, lit(null).cast(StringType))
        .otherwise(concat(lit("["), array_join(c.cast(ArrayType(StringType)), " "), lit("]")))
    case _ => c.cast(StringType)
  }

  /** Multi-level key: stringified containers joined by "|"
    * (options.go:9 default separator). Nulls render as "(null)"
    * (options.go:13) so null keys group together like the reference. */
  def rowKey(cols: Seq[(Column, DataType)]): Column =
    concat_ws("|", cols.map { case (c, dt) =>
      coalesce(stringify(c, dt), lit("(null)")) }: _*)

  /** Null sentinels at ingest (internal.go:1835-1926): NaN, the null-string
    * set {"(null)", ""}, zero time. Applied by readers, not stored masks —
    * Spark nulls are native. */
  def normalizeNullStrings(c: Column, nullStrings: Seq[String] = Seq("(null)", "")): Column =
    when(c.isin(nullStrings.map(lit): _*), lit(null)).otherwise(c)

  /** The reference's default datetime parse formats (options.go:20-23),
    * tried in order; first success wins, all-fail ⇒ null — exactly
    * `coalesce(try_to_timestamp(...))`. Go layouts → JVM patterns. */
  val defaultTimeFormats: Seq[String] = Seq(
    "yyyy-MM-dd", "MM-dd-yyyy", "MM/dd/yyyy", "M/d/yy", "M/d/yyyy",
    "h:mma", "yyyy-MM-dd'T'HH:mm:ssXXX", "yyyy-MM-dd'T'HH:mm:ss.SSSSSSSSSXXX")

  def parseDateTime(c: Column, formats: Seq[String] = defaultTimeFormats): Column =
    coalesce(formats.map(f => try_to_timestamp(c, lit(f))): _*)
}
