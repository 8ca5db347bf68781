package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Exact-arithmetic helpers for oracle parity.
  *
  * Double summation is order-dependent; Spark's shuffle order differs from
  * DuckDB's scan order, so `sum(double)` can drift in the last ULP and fail
  * a hash compare. The test data carries ≤2 decimal digits, so routing
  * aggregation through decimal makes the result exact and order-independent
  * on both engines; the final cast back to double is then deterministic.
  */
object Exact {
  /** Exact decimal image of a ≤2-decimal-digit double column. */
  def dec(c: Column): Column = c.cast("decimal(18,2)")

  /** Order-independent sum of a 2-decimal double column, emitted as double. */
  def dsum(c: Column): Column = sum(dec(c)).cast("double")

  /** Order-independent mean: exact decimal sum / count, divided as double.
    * (x: double) / (n: long) is a single IEEE division — deterministic. */
  def dmean(c: Column): Column =
    sum(dec(c)).cast("double") / count(c)

  /** SQL-side twins (DuckDB syntax = ANSI). */
  def sqlDsum(col: String): String =
    s"CAST(sum(CAST($col AS DECIMAL(18,2))) AS DOUBLE)"
  def sqlDmean(col: String): String =
    s"CAST(sum(CAST($col AS DECIMAL(18,2))) AS DOUBLE) / count($col)"
}
