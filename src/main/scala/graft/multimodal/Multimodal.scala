package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns: image/audio/video as opaque binary with typed
  * metadata, plus the per-partition batch plumbing a real decoder/featurizer
  * plugs into.
  *
  * The reference's media path is a CLIP embedder over an image directory
  * (`clip/embedding.py:39-68`, `clip/db_operation.py:87-121`). No
  * image/audio libraries exist in this container, so `decodeStub` is a
  * clearly-marked deterministic fake; everything around it — the binary
  * schema, `binaryFile` ingest, partition-batched execution with one
  * "model init" per partition (the JVM analog of mapInPandas batch shape),
  * feature schema — is real and tested, and is what survives a swap to a
  * real ONNX/JNI decoder.
  */
object Multimodal {

  /** One media row: opaque payload + typed metadata (reference ingest
    * metadata convention, `clip/db_operation.py:62-67`).
    */
  case class MediaRecord(
      key: String,
      mediaType: String, // "image" | "audio" | "video"
      bytes: Array[Byte],
      meta: Map[String, String])

  case class MediaFeatures(
      key: String,
      mediaType: String,
      nBytes: Long,
      features: Array[Float])

  /** Ingest a directory of media files as binary columns — reference S9
    * (`clip/db_operation.py:87-121`): extension whitelist via pathGlobFilter,
    * recursive enumeration, content as one binary column.
    */
  def readMediaDir(spark: SparkSession, dir: String,
      glob: String = "*.{jpg,jpeg,png,bmp,gif}"): DataFrame =
    spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .option("recursiveFileLookup", "true")
      .load(dir)
      .select(
        regexp_extract(col("path"), "([^/]+)\\.[^.]+$", 1).as("key"),
        lit("image").as("mediaType"),
        col("content").as("bytes"),
        map(lit("file_path"), col("path"),
            lit("length"), col("length").cast("string")).as("meta"))

  /** STUB decoder ??? — stands in for a real image/audio decode. Emits a
    * deterministic `dim`-length feature vector from the payload bytes
    * (rolling-hash folds), so tests exercise exact shapes end-to-end.
    * A real implementation would decode pixels/samples here; signature,
    * batching, and schema stay identical.
    */
  private[multimodal] def decodeStub(bytes: Array[Byte], dim: Int): Array[Float] = {
    val out = new Array[Float](dim)
    var acc = 1469598103934665603L // FNV offset basis — any fixed seed works
    var i = 0
    while (i < bytes.length) {
      acc = (acc ^ (bytes(i) & 0xffL)) * 1099511628211L
      out(i % dim) += ((acc >>> 33) % 1000L) / 1000.0f
      i += 1
    }
    out
  }

  /** Feature extraction over media rows: per-partition "model" init + batch
    * loop. `mapPartitions` is deliberate here (SURVEY guide rule (d)) —
    * a decoder is genuine per-partition imperative logic with expensive
    * one-time init, exactly the case the escape hatch exists for.
    */
  def extractFeatures(ds: Dataset[MediaRecord], dim: Int = 64): Dataset[MediaFeatures] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.mapPartitions { rows =>
      // one-time per-partition init goes here (real decoder: load model)
      rows.map { r =>
        MediaFeatures(r.key, r.mediaType, r.bytes.length.toLong,
          decodeStub(r.bytes, dim))
      }
    }
  }

  /** Frame sampling STUB ??? — picks `n` deterministic byte-slices as stand-in
    * "frames"; a real impl would demux the container and decode keyframes.
    * Output: one row per (key, frame_idx, frame_bytes).
    */
  def sampleFrames(ds: Dataset[MediaRecord], n: Int): DataFrame = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.flatMap { r =>
      val len = r.bytes.length
      (0 until n).map { i =>
        val start = if (n <= 1) 0 else (i.toLong * len / n).toInt
        val end   = math.min(len, start + math.max(1, len / math.max(n, 1)))
        (r.key, i, r.bytes.slice(start, end))
      }
    }.toDF("key", "frame_idx", "frame_bytes")
  }
}
