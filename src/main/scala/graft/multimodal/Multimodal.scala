package graft.multimodal

import java.io.ByteArrayInputStream

import javax.imageio.ImageIO
import javax.sound.sampled.{AudioFormat, AudioSystem, UnsupportedAudioFileException}

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns: image/audio/video as opaque binary with typed
  * metadata, plus per-partition batch feature extraction.
  *
  * The reference's media path is a CLIP embedder over an image directory
  * (`clip/embedding.py:39-68`, `clip/db_operation.py:87-121`). No model
  * runtime exists in this container, so instead of CLIP the image
  * featurizer is a REAL pixel pipeline: `javax.imageio` decode →
  * grid-pooled mean-RGB patch features → L2 normalize (the normalize
  * mirrors `embedding.py:66-67`). It is a genuine, deterministic
  * image→vector function — just not a semantic one; swapping in an
  * ONNX/JNI CLIP keeps every signature, batch shape, and schema below
  * identical. Audio is likewise REAL: `javax.sound.sampled` PCM decode
  * (WAV/AIFF/AU ship with the JDK) → windowed RMS-energy + zero-crossing
  * features → L2 normalize. Video frame sampling is REAL for MJPEG-in-AVI
  * (a pure-JVM RIFF demux, frames ImageIO-decodable); other containers
  * fall back to a clearly-marked byte-slice/byte-hash path.
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

  /** Extracted features. `width`/`height` are the REAL decoded pixel
    * dimensions for images; for audio they carry (sampleRate Hz, decoded
    * PCM frame count). Both are -1 when the payload wasn't decodable and
    * the byte-hash fallback produced the vector.
    */
  case class MediaFeatures(
      key: String,
      mediaType: String,
      nBytes: Long,
      width: Int,
      height: Int,
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

  /** [[readMediaDir]] for audio payloads (JDK-decodable container glob). */
  def readAudioDir(spark: SparkSession, dir: String,
      glob: String = "*.{wav,aiff,aif,au}"): DataFrame =
    spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .option("recursiveFileLookup", "true")
      .load(dir)
      .select(
        regexp_extract(col("path"), "([^/]+)\\.[^.]+$", 1).as("key"),
        lit("audio").as("mediaType"),
        col("content").as("bytes"),
        map(lit("file_path"), col("path"),
            lit("length"), col("length").cast("string")).as("meta"))

  /** Real image decode + pooled patch features: decode pixels with
    * `javax.imageio`, mean-pool R/G/B over a g×g grid of the image
    * (g = ceil(sqrt(dim/3)), row-major (cell, channel) order), truncate
    * to `dim`, L2-normalize. Returns the decoded (width, height) with
    * the vector; None when ImageIO has no reader for the payload.
    */
  private[multimodal] def imageFeatures(bytes: Array[Byte],
      dim: Int): Option[(Int, Int, Array[Float])] = {
    // ImageIO.read returns null for unrecognized formats but THROWS for a
    // recognized header with a corrupt/truncated body ("Premature end of
    // JPEG file" = IIOException <: IOException) — both must fall back, or
    // one bad crawl file among millions kills the whole extract job. The
    // catch enumerates the decode-failure classes JDK plugins are known
    // to throw on malformed bodies: IO, bad color profiles, and the
    // malformed-length throws of corrupt GIF/BMP/PNG headers
    // (IndexOutOfBounds/NegativeArraySize from plugin array sizing). A
    // genuine bug in OUR code below still surfaces — only the
    // ImageIO.read call is guarded.
    val img =
      try ImageIO.read(new ByteArrayInputStream(bytes))
      catch {
        case _: java.io.IOException | _: java.awt.color.CMMException |
             _: IllegalArgumentException | _: IndexOutOfBoundsException |
             _: NegativeArraySizeException => null
      }
    if (img == null) return None
    val w = img.getWidth
    val h = img.getHeight
    if (w <= 0 || h <= 0) return None
    val g = math.max(1, math.ceil(math.sqrt(dim / 3.0)).toInt)
    val sums = new Array[Double](g * g * 3)
    val counts = new Array[Long](g * g)
    val row = new Array[Int](w)
    var y = 0
    while (y < h) {
      img.getRGB(0, y, w, 1, row, 0, w)
      val gy = math.min(g - 1, y * g / h)
      var x = 0
      while (x < w) {
        val gx = math.min(g - 1, x * g / w)
        val cell = gy * g + gx
        val rgb = row(x)
        sums(cell * 3)     += ((rgb >> 16) & 0xff) / 255.0
        sums(cell * 3 + 1) += ((rgb >> 8) & 0xff) / 255.0
        sums(cell * 3 + 2) += (rgb & 0xff) / 255.0
        counts(cell) += 1
        x += 1
      }
      y += 1
    }
    val full = new Array[Double](g * g * 3)
    var c = 0
    while (c < g * g) {
      if (counts(c) > 0) {
        full(c * 3)     = sums(c * 3) / counts(c)
        full(c * 3 + 1) = sums(c * 3 + 1) / counts(c)
        full(c * 3 + 2) = sums(c * 3 + 2) / counts(c)
      }
      c += 1
    }
    Some((w, h, normalized(full.take(dim))))
  }

  /** Real audio decode + windowed features: `javax.sound.sampled` PCM
    * decode (JDK-native readers: WAV/AIFF/AU; lossy formats have no JDK
    * decoder and fall back), mono mixdown, then `dim/2` time windows each
    * contributing (RMS energy, zero-crossing rate) — the classic cheap
    * audio descriptor pair (envelope + spectral-ish brightness) —
    * interleaved and L2-normalized. Returns (sampleRate, numFrames,
    * features); None when no reader accepts the payload. A model-backed
    * audio embedder (wav2vec etc.) swaps in with the same signature.
    */
  private[multimodal] def audioFeatures(bytes: Array[Byte],
      dim: Int): Option[(Int, Int, Array[Float])] = {
    // same guard discipline as imageFeatures: only the DECODE calls are
    // caught (unsupported container, truncated body); our math is not
    val in =
      try AudioSystem.getAudioInputStream(new ByteArrayInputStream(bytes))
      catch {
        case _: UnsupportedAudioFileException | _: java.io.IOException =>
          return None
      }
    try {
      val base = in.getFormat
      val ch = math.max(1, base.getChannels)
      val target = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED,
        base.getSampleRate, 16, ch, ch * 2, base.getSampleRate, false)
      val data =
        try AudioSystem.getAudioInputStream(target, in).readAllBytes()
        catch {
          case _: IllegalArgumentException | _: java.io.IOException =>
            return None
        }
      val n = data.length / (2 * ch)
      if (n == 0) return None
      // mono mixdown, samples scaled to [-1, 1)
      val mono = new Array[Double](n)
      var i = 0
      while (i < n) {
        var s = 0.0
        var c = 0
        while (c < ch) {
          val o = (i * ch + c) * 2
          s += ((data(o) & 0xff) | (data(o + 1) << 8)).toShort / 32768.0
          c += 1
        }
        mono(i) = s / ch
        i += 1
      }
      val g = math.max(1, dim / 2)
      val feat = new Array[Double](g * 2)
      var w = 0
      while (w < g) {
        val lo = (w.toLong * n / g).toInt
        val hi = math.max(lo + 1, ((w + 1).toLong * n / g).toInt)
        var ss = 0.0
        var zc = 0
        var j = lo
        while (j < math.min(hi, n)) {
          ss += mono(j) * mono(j)
          if (j > lo && (mono(j) >= 0) != (mono(j - 1) >= 0)) zc += 1
          j += 1
        }
        val len = math.min(hi, n) - lo
        feat(w * 2) = math.sqrt(ss / len)
        feat(w * 2 + 1) = zc.toDouble / len
        w += 1
      }
      Some((base.getSampleRate.toInt, n, normalized(feat.take(dim))))
    } finally in.close()
  }

  /** FALLBACK featurizer for payloads with no JVM decoder (video, lossy
    * audio, corrupt images): a deterministic byte-hash fold — a real function of
    * the bytes, but NOT a semantic embedding; a production deployment
    * plugs a decoder in where [[imageFeatures]] sits.
    */
  private[multimodal] def byteHashFeatures(bytes: Array[Byte], dim: Int): Array[Float] = {
    val acc0 = new Array[Double](dim)
    var acc = 1469598103934665603L // FNV offset basis — any fixed seed works
    var i = 0
    while (i < bytes.length) {
      acc = (acc ^ (bytes(i) & 0xffL)) * 1099511628211L
      acc0(i % dim) += ((acc >>> 33) % 1000L) / 1000.0
      i += 1
    }
    normalized(acc0)
  }

  /** L2 normalize in Double (CLIP's post-embed normalize,
    * `clip/embedding.py:66-67`), zero-vector guarded like
    * [[graft.functions.VectorFunctions.normalize]].
    */
  private def normalized(v: Array[Double]): Array[Float] = {
    var ss = 0.0
    var i = 0
    while (i < v.length) { ss += v(i) * v(i); i += 1 }
    val nrm = math.sqrt(ss)
    val out = new Array[Float](v.length)
    i = 0
    while (i < v.length) {
      out(i) = (if (nrm == 0.0) v(i) else v(i) / nrm).toFloat
      i += 1
    }
    out
  }

  /** Text→vector via feature hashing (the engine-side analog of the
    * reference's text path, `clip/embedding.py:70-93`): whitespace-token
    * unigrams + bigrams FNV-hashed into `dim` buckets, counted,
    * L2-normalized. A real, deterministic text→vector function — not a
    * semantic model; a CLIP text encoder swaps in with the same signature.
    */
  def textFeatures(text: String, dim: Int = 48): Array[Float] = {
    val acc = new Array[Double](dim)
    def add(s: String): Unit = {
      var h = 1469598103934665603L
      var i = 0
      while (i < s.length) { h = (h ^ s.charAt(i)) * 1099511628211L; i += 1 }
      acc((((h % dim) + dim) % dim).toInt) += 1.0
    }
    val toks = text.trim.split("\\s+").filter(_.nonEmpty)
    toks.foreach(add)
    toks.sliding(2).withFilter(_.length == 2).foreach(bg => add(bg.mkString(" ")))
    normalized(acc)
  }

  /** Feature extraction over media rows: per-partition batch loop with the
    * decode inside (`mapPartitions` is deliberate — SURVEY guide rule (d):
    * a decoder is genuine per-partition imperative logic; a model-backed
    * implementation loads its weights once per partition right here).
    * Images get the real pixel pipeline; everything else the byte-hash
    * fallback, flagged by width/height = -1.
    */
  def extractFeatures(ds: Dataset[MediaRecord], dim: Int = 48): Dataset[MediaFeatures] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.mapPartitions { rows =>
      // one-time per-partition init goes here (real model: load weights)
      rows.map { r =>
        val decoded = r.mediaType match {
          case "image" => imageFeatures(r.bytes, dim)
          case "audio" => audioFeatures(r.bytes, dim)
          case _ => None
        }
        decoded match {
          case Some((w, h, f)) =>
            MediaFeatures(r.key, r.mediaType, r.bytes.length.toLong, w, h, f)
          case None =>
            MediaFeatures(r.key, r.mediaType, r.bytes.length.toLong, -1, -1,
              byteHashFeatures(r.bytes, dim))
        }
      }
    }
  }

  /** 64-bit difference hash (dHash) of an image — the perceptual
    * fingerprint that survives re-encode/resize/minor edits where a
    * byte-level hash breaks: area-average the decoded pixels onto a 9×8
    * integer-grayscale grid, then bit (gy·8+gx) = grid[gy][gx] >
    * grid[gy][gx+1] (horizontal gradient sign). Pure integer arithmetic
    * after decode, so the hash is deterministic across JVMs. None when
    * no decoder accepts the payload (same guard as [[imageFeatures]]).
    */
  def dHash64(bytes: Array[Byte]): Option[Long] = {
    val img =
      try ImageIO.read(new ByteArrayInputStream(bytes))
      catch {
        case _: java.io.IOException | _: java.awt.color.CMMException |
             _: IllegalArgumentException | _: IndexOutOfBoundsException |
             _: NegativeArraySizeException => null
      }
    if (img == null) return None
    val w = img.getWidth
    val h = img.getHeight
    if (w <= 0 || h <= 0) return None
    val (gw, gh) = (9, 8)
    val sums = new Array[Long](gw * gh)
    val counts = new Array[Long](gw * gh)
    val row = new Array[Int](w)
    var y = 0
    while (y < h) {
      img.getRGB(0, y, w, 1, row, 0, w)
      val gy = math.min(gh - 1, y * gh / h)
      var x = 0
      while (x < w) {
        val gx = math.min(gw - 1, x * gw / w)
        val cell = gy * gw + gx
        val rgb = row(x)
        // integer luma (Rec. 601 scaled by 1000) — no float rounding
        sums(cell) += ((rgb >> 16) & 0xff) * 299L +
          ((rgb >> 8) & 0xff) * 587L + (rgb & 0xff) * 114L
        counts(cell) += 1
        x += 1
      }
      y += 1
    }
    var hash = 0L
    var gy = 0
    while (gy < gh) {
      var gx = 0
      while (gx < gw - 1) {
        // cross-multiplied averages compared in 128-bit (multiplyHigh +
        // unsigned low word) — exact at ANY image size: the 64-bit
        // product overflows for cells above ~6e6 pixels (a >430-MP scan),
        // which would silently flip gradient bits
        val la = sums(gy * gw + gx)
        val ca = math.max(1L, counts(gy * gw + gx))
        val lb = sums(gy * gw + gx + 1)
        val cb = math.max(1L, counts(gy * gw + gx + 1))
        if (cmp128(la, cb, lb, ca) > 0) hash |= 1L << (gy * 8 + gx)
        gx += 1
      }
      gy += 1
    }
    Some(hash)
  }

  /** Exact comparison of the non-negative 128-bit products a·b vs c·d. */
  private def cmp128(a: Long, b: Long, c: Long, d: Long): Int = {
    val h1 = java.lang.Math.multiplyHigh(a, b)
    val h2 = java.lang.Math.multiplyHigh(c, d)
    if (h1 != h2) java.lang.Long.compare(h1, h2)
    else java.lang.Long.compareUnsigned(a * b, c * d)
  }

  /** (key, dhash) for the image rows of a media dataset — the input to
    * [[graft.operators.Dedup.hammingPairsBucketed]] (64-bit, pigeonhole
    * equi-join): near-duplicate IMAGE detection with the same capped,
    * lossless scale shape as the text SimHash path. Undecodable rows are
    * dropped (they can't be perceptually compared; byte-exact dedup
    * still catches bit-identical copies).
    */
  def dHashes(ds: Dataset[MediaRecord]): DataFrame = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.mapPartitions { rows =>
      rows.flatMap(r =>
        if (r.mediaType != "image") None
        else dHash64(r.bytes).map(hsh => (r.key, hsh)))
    }.toDF("key", "dhash")
  }

  /** 64-bit audio fingerprint — [[dHash64]]'s audio sibling: the sign of
    * the RMS-envelope gradient across 65 time windows (real PCM decode
    * via [[audioFeatures]]; normalization is a positive scale so the
    * signs are decode-exact). Robust to gain changes and re-encoding of
    * the envelope shape; None when no JDK decoder accepts the payload.
    * Feed (key, ahash) rows to
    * [[graft.operators.Dedup.hammingPairsBucketed]] for near-dup audio.
    */
  def audioHash64(bytes: Array[Byte]): Option[Long] =
    audioFeatures(bytes, 130).map { case (_, _, f) =>
      var h = 0L
      var i = 0
      while (i < 64) {
        if (f(i * 2) > f((i + 1) * 2)) h |= 1L << i
        i += 1
      }
      h
    }

  /** (key, ahash) for the audio rows of a media dataset. */
  def audioHashes(ds: Dataset[MediaRecord]): DataFrame = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.mapPartitions { rows =>
      rows.flatMap(r =>
        if (r.mediaType != "audio") None
        else audioHash64(r.bytes).map(hsh => (r.key, hsh)))
    }.toDF("key", "ahash")
  }

  /** (key, frame_idx, dhash) — one perceptual hash per demuxed video
    * frame ([[aviMjpegFrames]] RIFF walk + [[dHash64]]); rows only for
    * decodable frames. The frame relation is the video-dedup input:
    * [[videoNearDupPairs]] matches frames across videos and counts.
    */
  def videoFrameHashes(ds: Dataset[MediaRecord]): DataFrame = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.mapPartitions { rows =>
      rows.flatMap { r =>
        if (r.mediaType != "video") Iterator.empty
        else aviMjpegFrames(r.bytes).iterator.zipWithIndex.flatMap {
          case (frame, i) => dHash64(frame).map(hsh => (r.key, i, hsh))
        }
      }
    }.toDF("key", "frame_idx", "dhash")
  }

  /** Near-duplicate VIDEO pairs: frame-level pigeonhole Hamming join
    * (each frame keyed by video + control-char separator + idx, so '#' in keys is safe), then per-video-pair matched-frame
    * counting — two videos pair when at least `minMatches` of their
    * frames perceptually match. The frame join inherits the capped,
    * lossless scale shape; the video-pair agg is one hash-key shuffle
    * over the (already candidate-bounded) frame pairs. Output:
    * (a, b, matches), a < b.
    */
  def videoNearDupPairs(frameHashes: DataFrame, maxHamming: Int,
      minMatches: Int,
      maxBucketSize: Option[Int] = None): DataFrame = {
    require(minMatches >= 1, s"minMatches $minMatches must be >= 1")
    val fid = frameHashes.select(
      // the separator itself must never appear in keys, or the split-back
      // conflates distinct videos — fail loud, not silently mis-pair
      concat_ws("\u0001",
        when(col("key").contains("\u0001"),
          raise_error(concat(lit("videoNearDupPairs: key '"), col("key"),
            lit("' contains the frame-id separator"))))
          .otherwise(col("key")),
        col("frame_idx")).as("fid"),
      col("dhash"))
    val framePairs = graft.operators.Dedup.hammingPairsBucketed(
      fid, "fid", "dhash", bits = 64, maxHamming = maxHamming,
      maxBucketSize = maxBucketSize)
    framePairs
      .select(substring_index(col("a"), "\u0001", 1).as("va"),
        substring_index(col("b"), "\u0001", 1).as("vb"))
      .where(col("va") =!= col("vb"))
      .select(least(col("va"), col("vb")).as("a"),
        greatest(col("va"), col("vb")).as("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("matches"))
      .where(col("matches") >= minMatches)
  }

  /** REAL demux for MJPEG-in-AVI: walk the RIFF chunk tree and collect
    * the video-data chunks (fourcc `##dc`/`##db` — each holds one JPEG
    * in an MJPEG stream, decodable by [[imageFeatures]]). Returns Nil
    * for non-AVI payloads and stops cleanly at a torn chunk, so corrupt
    * crawl files degrade instead of throwing. Other containers (MP4 &
    * co.) need a codec stack the JVM lacks — they fall back below.
    */
  private[multimodal] def aviMjpegFrames(bytes: Array[Byte]): Seq[Array[Byte]] = {
    def fourcc(p: Int): String =
      new String(bytes, p, 4, java.nio.charset.StandardCharsets.US_ASCII)
    def le32(p: Int): Long =
      (bytes(p) & 0xffL) | ((bytes(p + 1) & 0xffL) << 8) |
        ((bytes(p + 2) & 0xffL) << 16) | ((bytes(p + 3) & 0xffL) << 24)
    if (bytes.length < 12 || fourcc(0) != "RIFF" || fourcc(8) != "AVI ") return Nil
    val out = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    def walk(start: Int, end: Int): Unit = {
      var p = start
      while (p + 8 <= end) {
        val id = fourcc(p)
        val sz = le32(p + 4)
        if (sz < 0 || sz > Int.MaxValue - 16) return
        val szI = sz.toInt
        val declaredEnd = p + 8 + szI
        if (id == "RIFF" || id == "LIST") {
          // a torn CONTAINER still yields its surviving children —
          // descend into whatever bytes remain of it
          if (p + 12 <= end) walk(p + 12, math.min(declaredEnd, end))
        } else if (id.endsWith("dc") || id.endsWith("db")) {
          if (declaredEnd > end) return // torn LEAF: stop, keep whole frames
          out += java.util.Arrays.copyOfRange(bytes, p + 8, declaredEnd)
        } else if (declaredEnd > end) return
        p = declaredEnd + (szI & 1) // chunks pad to even offsets
      }
    }
    walk(12, math.min(bytes.length, 8 + le32(4)).toInt)
    out.toSeq
  }

  /** Frame sampling: REAL for MJPEG-in-AVI ([[aviMjpegFrames]] — `n`
    * frames evenly spaced over the true frame sequence, each a decodable
    * JPEG); other containers fall back to deterministic byte-slices
    * (stand-in "frames", clearly flagged by `real_frame = false` — a
    * production deployment plugs an MP4 demuxer in at this seam).
    * Output: one row per (key, frame_idx, frame_bytes, real_frame).
    */
  def sampleFrames(ds: Dataset[MediaRecord], n: Int): DataFrame = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.flatMap { r =>
      val frames = aviMjpegFrames(r.bytes)
      if (frames.nonEmpty) {
        // evenly-spaced true frame indices (first frame always included)
        (0 until n).map { i =>
          val fi = if (n <= 1) 0 else math.min(frames.length - 1,
            (i.toLong * frames.length / n).toInt)
          (r.key, i, frames(fi), true)
        }
      } else {
        val len = r.bytes.length
        (0 until n).map { i =>
          val start = if (n <= 1) 0 else (i.toLong * len / n).toInt
          val end   = math.min(len, start + math.max(1, len / math.max(n, 1)))
          (r.key, i, r.bytes.slice(start, end), false)
        }
      }
    }.toDF("key", "frame_idx", "frame_bytes", "real_frame")
  }
}
