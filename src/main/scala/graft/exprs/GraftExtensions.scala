package graft.exprs

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Spark-native deployment entry point for graft's Catalyst expressions:
  *
  *   spark-submit --conf spark.sql.extensions=graft.exprs.GraftExtensions
  *
  * Injecting at session-build time (rather than the imperative
  * `GraftFunctions.register`) makes the functions available in EVERY
  * session created on the cluster — including SQL-only surfaces
  * (Thrift server, `spark.sql(...)` notebooks) that never touch graft's
  * Scala API. `GraftFunctions.register` remains for programmatic use in
  * an already-built session; both paths bind the same expressions. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage,
      "", "", "", "", "", "", "built-in")

  override def apply(ext: SparkSessionExtensions): Unit = {
    val fns: Seq[(String, String, Seq[Expression] => Expression)] = Seq(
      ("simhash64", "_FUNC_(tokens) - 64-bit SimHash of a token array",
        es => SimHash64(es.head)),
      ("cosine_sim", "_FUNC_(a, b) - cosine similarity of two float arrays",
        es => CosineSim(es(0), es(1))),
      ("jaccard_sim", "_FUNC_(a, b) - Jaccard similarity of two string arrays",
        es => JaccardSim(es(0), es(1))),
      ("shingle_w", "_FUNC_(tokens, w) - distinct word w-shingles",
        es => Shingles(es.head, es(1).eval().asInstanceOf[Int])),
      ("minhash_bands", "_FUNC_(shingles, k, bands) - LSH band keys",
        es => MinHashBands(es.head,
          es(1).eval().asInstanceOf[Int], es(2).eval().asInstanceOf[Int])))
    fns.foreach { case (name, usage, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info(name, usage), builder))
    }
  }
}
