package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One driver-verifiable query: a Spark plan builder plus (optionally) an
  * equivalent ANSI SQL string runnable by DuckDB over the same parquet
  * tables. Queries without oracle SQL get a weaker rows-only check.
  *
  * Conventions that make the DuckDB hash-compare robust:
  *   - every query ends in a deterministic ORDER BY over emitted columns;
  *   - double aggregations go through exact decimal arithmetic on both
  *     sides (sum order must not change the result bit pattern);
  *   - column names are aliased identically in Spark and SQL.
  */
final case class Query(
    name: String,
    build: (SparkSession, String) => DataFrame,
    oracle: Option[String])

trait QueryPack {
  def queries: Seq[Query]

  /** DuckDB-side table reference: the driver registers each parquet as a
    * view named after the table, so oracle SQL just uses bare names. */
  protected def t(name: String): String = name
}
