package graft.exprs

import org.apache.spark.sql.SparkSession

/** Registration for graft's native Catalyst expressions — callable from
  * Column code via `F.call_function` and from SQL by name. */
object GraftFunctions {
  /** Idempotent: re-registering an existing name invalidates session
    * caches (measured 12× slowdown on the next run of the same query),
    * so register once per session only. Synchronized because Verify/Bench
    * run queries concurrently — two threads passing the exists check
    * together would both re-register and trigger that invalidation. */
  def register(spark: SparkSession): Unit = synchronized {
    val reg = spark.sessionState.functionRegistry
    val fns: Seq[(String, Seq[org.apache.spark.sql.catalyst.expressions.Expression] =>
        org.apache.spark.sql.catalyst.expressions.Expression)] = Seq(
      "simhash64" -> (es => SimHash64(es.head)),
      "cosine_sim" -> (es => CosineSim(es(0), es(1))),
      "jaccard_sim" -> (es => JaccardSim(es(0), es(1))),
      // the int params arrive as foldable literals from call_function
      "shingle_w" -> (es => Shingles(es.head,
        es(1).eval().asInstanceOf[Int])),
      "minhash_bands" -> (es => MinHashBands(es.head,
        es(1).eval().asInstanceOf[Int], es(2).eval().asInstanceOf[Int])))
    fns.foreach { case (name, builder) =>
      val id = org.apache.spark.sql.catalyst.FunctionIdentifier(name)
      if (!reg.functionExists(id)) {
        reg.createOrReplaceTempFunction(name, builder, "scala_udf")
      }
    }
  }
}
