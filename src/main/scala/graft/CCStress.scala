import org.apache.spark.sql.{functions => F}
object CCStress {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]").appName("cc-stress")
      .config("spark.sql.shuffle.partitions", "32").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    // 500k-edge graph: 100k chains of length 5 plus 50k random extra edges
    // linking chains -> components of widely varying size and diameter
    val chains = spark.range(500000L).select(
      F.col("id").as("id_a"), (F.col("id") + 1).as("id_b"))
      .filter(F.col("id_a") % 5 =!= 4) // break into chains of 5
    val rnd = spark.range(50000L).select(
      (F.xxhash64(F.col("id")) % 500000L).as("id_a"),
      (F.xxhash64(F.col("id") + 7L) % 500000L).as("id_b"))
      .select(F.abs(F.col("id_a")).as("id_a"), F.abs(F.col("id_b")).as("id_b"))
    val pairs = chains.union(rnd)
    val t0 = System.nanoTime()
    var rounds = -1
    val labels = graft.pipeline.Dedup.connectedComponents(
      pairs, localSolveMaxEdges = 0, maxIter = 60, // force the iterative scale path
      onStarRounds = r => rounds = r) // per-call readout, immune to concurrent CC calls
    val n = labels.count()
    val nClusters = labels.select(F.countDistinct("cluster")).head().getLong(0)
    val dt = (System.nanoTime() - t0) / 1e9
    println(f"CCSTRESS nodes=$n clusters=$nClusters rounds=$rounds time=$dt%.1f s")
    // sanity vs the local union-find on the same graph
    val local = graft.pipeline.Dedup.connectedComponents(pairs)
    val diff = labels.as("a").join(local.as("b"), "id")
      .filter(F.col("a.cluster") =!= F.col("b.cluster")).count()
    println(s"CCSTRESS mismatches_vs_local=$diff")
    spark.stop()
  }
}
