package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.{functions => F}

/** Multimodal-column plumbing: image/audio/video payloads ride as opaque
  * `binary` columns with typed metadata; decode / feature-extract runs as
  * a batched per-partition stage.
  *
  * The Spark-side shape is the real thing — schema, partition-parallel
  * batched execution, typed input/output rows, bounded memory per batch.
  * Two kernels plug into the seam: `ImageIoDecodeKernel` is a REAL image
  * header decoder (JDK `javax.imageio` — PNG/JPEG/GIF/BMP format +
  * dimensions, no external deps), and `StubDecodeKernel` derives
  * deterministic pseudo-features from the bytes — it remains the oracle
  * path because the test corpus ships text payloads, not images, and its
  * checksum is SQL-replayable. Audio/video codecs would implement the
  * same one-trait seam (JNI/FFI) without touching the plumbing.
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

  /** The codec seam: a real decoder (JNI/FFI image or audio library)
    * implements this one trait and plugs into `extractFeatures` without
    * touching the Spark plumbing. The contract is BATCH-level on purpose
    * — real codecs amortize per-call init (context setup, scratch
    * buffers) across a batch, and the batch size is what bounds executor
    * memory to `batch × payload`. Must be Serializable: the kernel ships
    * to executors inside the mapPartitions closure. */
  trait DecodeKernel extends Serializable {
    def decodeBatch(rows: Seq[MediaRow]): Seq[MediaFeatures]
  }

  /** Payload checksum shared by every kernel: first 60 bits of md5 as a
    * non-negative long — chosen over a bespoke rolling hash so an oracle
    * engine can replay the exact values in SQL:
    * `('0x' || substring(md5(x),1,15))::BIGINT` matches bit-for-bit,
    * which upgrades the decode query from rows-only to a full
    * hash-checked oracle. */
  private[pipeline] def payloadChecksum(payload: Array[Byte]): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(payload).take(8).map(b => f"$b%02x").mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16) // 60 bits, >= 0
  }

  /** STUB decode kernel — deterministic fake features from the payload.
    * A real implementation would decode headers/frames here (see
    * `ImageIoDecodeKernel` for one that does). */
  def fakeDecode(r: MediaRow): MediaFeatures = {
    val n = r.payload.length
    val h = payloadChecksum(r.payload)
    val fmt = if (n % 3 == 0) "png" else if (n % 3 == 1) "jpeg" else "webp"
    MediaFeatures(r.doc_id, n, fmt,
      width = 64 + ((h % 8L) * 32L).toInt,
      height = 64 + (((h / 8L) % 8L) * 32L).toInt,
      checksum = h)
  }

  /** Default kernel: the stub, one payload at a time within the batch. */
  object StubDecodeKernel extends DecodeKernel {
    def decodeBatch(rows: Seq[MediaRow]): Seq[MediaFeatures] = rows.map(fakeDecode)
  }

  /** REAL image codec through the same seam: `javax.imageio` (JDK
    * built-in — PNG, JPEG, GIF, BMP, WBMP) reads format + dimensions
    * from the image HEADER via `ImageReader.getWidth/getHeight`, which
    * does NOT decode pixel data — per-row cost is header parsing, not a
    * full raster decode, exactly what a 100 TB metadata-extraction scan
    * wants. Undecodable payloads degrade to format "unknown" with zero
    * dimensions instead of failing the partition (a corrupt image in a
    * billion-row scan must not kill the job). The checksum stays the
    * md5 image, so downstream exact-dup grouping on `checksum` behaves
    * identically under either kernel. */
  object ImageIoDecodeKernel extends DecodeKernel {
    def decodeBatch(rows: Seq[MediaRow]): Seq[MediaFeatures] = rows.map { r =>
      val base = MediaFeatures(r.doc_id, r.payload.length, "unknown", 0, 0,
        payloadChecksum(r.payload))
      // MemoryCacheImageInputStream, NOT ImageIO.createImageInputStream:
      // the factory consults the default USE-FILE-CACHE setting and wraps
      // the stream in a FileCacheImageInputStream — a temp file created
      // and deleted PER ROW on every executor, which at billion-row scale
      // turns a header-only metadata scan into disk churn (ADVICE r7).
      // The payload is already fully in memory; the memory-backed stream
      // is allocation-only.
      val in = new javax.imageio.stream.MemoryCacheImageInputStream(
        new java.io.ByteArrayInputStream(r.payload))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(in)
        if (!readers.hasNext) base
        else {
          val reader = readers.next()
          try {
            reader.setInput(in, true, true)
            base.copy(format = reader.getFormatName.toLowerCase,
              width = reader.getWidth(0), height = reader.getHeight(0))
          } catch {
            case scala.util.control.NonFatal(_) => base
          } finally reader.dispose()
        }
      } finally if (in != null) in.close()
    }
  }

  /** Batched per-partition feature extraction. Input: (doc_id, payload)
    * rows; output: typed features, binary column dropped on the spot. */
  def extractFeatures(media: DataFrame, batchSize: Int = 256,
                      kernel: DecodeKernel = StubDecodeKernel)
                     (implicit spark: SparkSession): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { it =>
      // batches bound peak memory to batchSize payloads; the kernel sees
      // whole batches so a real codec can amortize its init cost
      it.grouped(batchSize).flatMap(kernel.decodeBatch)
    }
  }

  /** STUB resize: recompute feature metadata for a target bounding box,
    * preserving aspect ratio (the real op would rescale pixel buffers in
    * the same batched mapPartitions stage; the metadata arithmetic and
    * the typed row flow are the part a pipeline depends on). */
  def resizeTo(features: Dataset[MediaFeatures], maxDim: Int)
              (implicit spark: SparkSession): Dataset[MediaFeatures] = {
    import spark.implicits._
    features.map { f =>
      val s = math.min(1.0, maxDim.toDouble / math.max(f.width, f.height))
      f.copy(width = math.max(1, math.round(f.width * s).toInt),
        height = math.max(1, math.round(f.height * s).toInt))
    }
  }

  /** Deterministic frame sampling over an opaque binary payload: treat
    * the payload as consecutive `frameBytes`-byte frames, keep every
    * `everyK`-th full frame, emit per-frame content checksums — the
    * video-pipeline shape (decode→frame-sample→fingerprint) with the
    * byte-window standing in for a real frame decoder.
    *
    * Shape at scale: the explode multiplies ROWS but each output row
    * carries only (id, frame_no, md5) — the payload bytes are consumed
    * inside the scan stage's projection and never cross a shuffle. The
    * per-frame substring is lazy byte slicing on the already-loaded
    * payload (no per-frame copy of the whole payload). */
  def frameSample(media: DataFrame, idCol: String, payloadCol: String,
                  frameBytes: Int, everyK: Int = 1): DataFrame = {
    val nf = F.floor(F.length(F.col(payloadCol)) / frameBytes).cast("int")
    val idxs = F.when(nf <= 0, F.array().cast("array<int>"))
      .otherwise(F.sequence(F.lit(0), nf - 1, F.lit(everyK)))
    media.select(F.col(idCol), F.col(payloadCol), F.explode(idxs).as("frame_no"))
      .select(F.col(idCol), F.col("frame_no"),
        // builtin substring via call_function: the public F.substring
        // only takes literal positions; the builtin expression slices
        // BINARY byte-wise with a dynamic start
        F.md5(F.call_function("substring", F.col(payloadCol),
          F.col("frame_no") * frameBytes + 1, F.lit(frameBytes))).as("frame_md5"))
  }

  /** Documents→media adapter for the test corpus: treats the UTF-8 text
    * bytes as the opaque payload (the container ships no real media). */
  def documentsAsMedia(docs: DataFrame): DataFrame =
    docs.select(F.col("doc_id"), F.encode(F.col("text"), "UTF-8").as("payload"))
}
