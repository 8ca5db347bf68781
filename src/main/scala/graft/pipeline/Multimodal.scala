package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.{functions => F}

/** Multimodal-column plumbing: image/audio/video payloads ride as opaque
  * `binary` columns with typed metadata; decode / feature-extract runs as
  * a batched per-partition stage.
  *
  * The Spark-side shape is the real thing — schema, partition-parallel
  * batched execution, typed input/output rows, bounded memory per batch.
  * The decode kernel itself is a STUB: the container has no image/audio
  * codecs, so `fakeDecode` derives deterministic pseudo-features from the
  * bytes. Swap `fakeDecode` for a real codec (JNI/FFI) without touching
  * the plumbing.
  *
  * At 100 TB: binary payloads dominate I/O — this stage must stay in the
  * scan's partitioning (mapPartitions, no shuffle), prune the binary
  * column immediately after feature extraction, and bound batch size so
  * executor memory holds `batch × payload` only.
  */
object Multimodal {

  final case class MediaRow(doc_id: Long, payload: Array[Byte])
  final case class MediaFeatures(
      doc_id: Long, n_bytes: Int, format: String,
      width: Int, height: Int, checksum: Long)

  /** STUB decode kernel — deterministic fake features from the payload.
    * A real implementation would decode headers/frames here. */
  def fakeDecode(r: MediaRow): MediaFeatures = {
    val n = r.payload.length
    var h = 1125899906842597L // FNV-ish rolling hash, deterministic
    var i = 0
    while (i < n) { h = h * 31 + (r.payload(i) & 0xff); i += 1 }
    val fmt = if (n % 3 == 0) "png" else if (n % 3 == 1) "jpeg" else "webp"
    MediaFeatures(r.doc_id, n, fmt,
      width = 64 + (math.floorMod(h, 8L) * 32L).toInt,
      height = 64 + (math.floorMod(h >> 8, 8L) * 32L).toInt,
      checksum = h)
  }

  /** Batched per-partition feature extraction. Input: (doc_id, payload)
    * rows; output: typed features, binary column dropped on the spot. */
  def extractFeatures(media: DataFrame, batchSize: Int = 256)
                     (implicit spark: SparkSession): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { it =>
      // batches bound peak memory to batchSize payloads; a real codec
      // would amortize its init cost across each batch
      it.grouped(batchSize).flatMap(_.map(fakeDecode))
    }
  }

  /** Documents→media adapter for the test corpus: treats the UTF-8 text
    * bytes as the opaque payload (the container ships no real media). */
  def documentsAsMedia(docs: DataFrame): DataFrame =
    docs.select(F.col("doc_id"), F.encode(F.col("text"), "UTF-8").as("payload"))
}
