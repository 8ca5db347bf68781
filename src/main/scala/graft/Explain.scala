package graft

import org.apache.spark.sql.SparkSession

/** Plan inspector: prints the formatted physical plan for the named
  * queries (all if none given) — for pushdown/broadcast/codegen review. */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val names = if (args.length > 1) args(1).split(",").toSeq else Nil
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // conf:k=v args flip operator knobs for variant captures (r22)
    args.drop(2).filter(_.startsWith("conf:")).foreach { a =>
      val kv = a.drop(5).split("=", 2); spark.conf.set(kv(0), kv(1))
    }
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter(kv => names.isEmpty || names.exists(kv._1.startsWith))
      .foreach { case (name, fn) =>
        println(s"\n===== $name =====")
        try fn(spark, sfDir).explain("formatted")
        catch { case e: Throwable => println(s"explain failed: ${e.getMessage}") }
      }
    spark.stop()
  }
}
