package graft.exprs

import org.apache.spark.sql.SparkSession

/** Registration for graft's native Catalyst expressions — callable from
  * Column code via `F.call_function` and from SQL by name. */
object GraftFunctions {
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "simhash64", exprs => SimHash64(exprs.head), "scala_udf")
}
