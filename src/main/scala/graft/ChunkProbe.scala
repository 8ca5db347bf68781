import org.apache.spark.sql.{functions => F}
/** One-off measurement: q67's two-scan recompute vs persisted chunks. */
object ChunkProbe {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]").appName("chunk-probe")
      .config("spark.sql.shuffle.partitions", "32").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    def timeIt(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"CHUNKPROBE $tag rows=$n time=${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    val docs = graft.Tables.documents(spark, dir)
    // current shape: chunks derived twice (profile side + instance side)
    timeIt("recompute") {
      graft.pipeline.Dedup.chunkDedupProfile(docs, "doc_id", "text", 3).count()
    }
    // persisted-chunks variant
    timeIt("persist") {
      val T = graft.pipeline.TextOps
      val chunks = docs.select(F.col("doc_id"), T.tokens(F.col("text")).as("w"))
        .select(F.col("doc_id"), F.explode(T.chunkHashesKernel(F.col("w"), 3)).as("chunk_hash"))
        .persist()
      try {
        val profile = chunks.groupBy("chunk_hash")
          .agg(F.min("doc_id").as("mn"), F.max("doc_id").as("mx"))
          .select(F.col("chunk_hash"), (F.col("mn") =!= F.col("mx")).as("dup"))
        val n = chunks.join(profile, "chunk_hash")
          .groupBy("doc_id")
          .agg(F.count(F.lit(1)).as("n_chunks"),
            F.sum(F.when(F.col("dup"), 1L).otherwise(0L)).as("n_dup"))
          .count()
        n
      } finally { chunks.unpersist(); () }
    }
    // run both twice to see warm numbers
    timeIt("recompute2") {
      graft.pipeline.Dedup.chunkDedupProfile(docs, "doc_id", "text", 3).count()
    }
    spark.stop()
  }
}
