package graft

import org.apache.spark.sql.functions.col

import graft.multimodal.Multimodal
import graft.multimodal.Multimodal.MediaRecord

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  // The real-JPEG tests use the reference checkout's sample images; in an
  // environment without that artifact they CANCEL (assume), not fail —
  // the suite stays self-contained.
  private val refData = java.nio.file.Paths.get("/root/reference/test_data")
  private def assumeRefData(): Unit =
    assume(java.nio.file.Files.isDirectory(refData),
      s"reference sample images not present at $refData")

  private def media = Seq(
    MediaRecord("img1", "image", Array.tabulate(256)(_.toByte), Map("src" -> "t")),
    MediaRecord("img2", "image", Array.tabulate(300)(i => (i * 7).toByte), Map("src" -> "t")),
    MediaRecord("img3", "image", Array.tabulate(256)(_.toByte), Map("src" -> "t"))
  ).toDS()

  test("feature extraction: fixed dim, deterministic, byte-sensitive") {
    val feats = Multimodal.extractFeatures(media, dim = 16).collect()
      .map(f => f.key -> f).toMap
    assert(feats.values.forall(_.features.length === 16))
    assert(feats("img1").features.toSeq === feats("img3").features.toSeq) // same bytes
    assert(feats("img1").features.toSeq !== feats("img2").features.toSeq) // diff bytes
    assert(feats("img2").nBytes === 300L)
    // non-decodable payloads are flagged: the byte-hash fallback produced these
    assert(feats.values.forall(f => f.width === -1 && f.height === -1))
  }

  test("real JPEG decode: pooled pixel features with true decoded dimensions") {
    assumeRefData()
    val refDir = refData
    val expected = Map( // true pixel sizes of the reference's sample images
      "__1Mu7EZXOM" -> ((640, 800)),
      "__CmMNKO4nw" -> ((640, 960)),
      "__G2yFuW7jQ" -> ((640, 593)),
      "__I-gX-cnd8" -> ((640, 960)),
      "__LjxJzd0MA" -> ((640, 1137)),
      "__or0r9kLQw" -> ((640, 427)))
    val recs = expected.keys.toSeq.sorted.map { name =>
      MediaRecord(name, "image",
        java.nio.file.Files.readAllBytes(refDir.resolve(name + ".jpg")), Map.empty)
    }
    val got = Multimodal.extractFeatures(recs.toDS(), dim = 48).collect()
      .map(f => f.key -> f).toMap
    expected.foreach { case (k, (w, h)) =>
      val f = got(k)
      assert((f.width, f.height) === ((w, h)), s"decoded dims of $k")
      assert(f.features.length === 48)
      val nrm = math.sqrt(f.features.map(x => x.toDouble * x).sum)
      assert(math.abs(nrm - 1.0) < 1e-5, s"unit norm of $k")
    }
    // six distinct images -> six distinct pooled vectors
    assert(got.values.map(_.features.toSeq).toSet.size === 6)
    // determinism across runs
    val again = Multimodal.extractFeatures(recs.toDS(), dim = 48).collect()
      .map(f => f.key -> f.features.toSeq).toMap
    assert(got.view.mapValues(_.features.toSeq).toMap === again)
  }

  test("truncated JPEG (valid header, corrupt body) falls back instead of crashing the job") {
    assumeRefData()
    val whole = java.nio.file.Files.readAllBytes(refData.resolve("__or0r9kLQw.jpg"))
    // a recognized JPEG header with a cut-off body makes ImageIO THROW
    // (not return null) — the fallback contract must still hold
    val truncated = whole.take(200)
    val got = Multimodal.extractFeatures(Seq(
        MediaRecord("cut", "image", truncated, Map.empty),
        MediaRecord("ok", "image", whole, Map.empty)).toDS(), dim = 12)
      .collect().map(f => f.key -> f).toMap
    assert(got("cut").width === -1 && got("cut").height === -1) // byte-hash fallback
    assert(got("cut").features.length === 12)
    assert(got("ok").width === 640) // the good row still decodes
  }

  test("end-to-end: binaryFile ingest of real JPEGs decodes through the pipeline") {
    assumeRefData()
    // Spark's file index skips '_'-prefixed names; stage copies under
    // clean names (the production ingest would never use hidden names)
    val dir = java.nio.file.Files.createTempDirectory("graft-jpg-")
    Seq("__1Mu7EZXOM.jpg" -> "a.jpg", "__G2yFuW7jQ.jpg" -> "b.jpg").foreach {
      case (src, dst) =>
        java.nio.file.Files.copy(refData.resolve(src), dir.resolve(dst))
    }
    val mediaDf = Multimodal.readMediaDir(spark, dir.toString).as[MediaRecord]
    val feats = Multimodal.extractFeatures(mediaDf).collect().map(f => f.key -> f).toMap
    assert(feats("a").width === 640 && feats("a").height === 800)
    assert(feats("b").width === 640 && feats("b").height === 593)
  }

  test("feature extraction distributes over partitions unchanged") {
    val repart = Multimodal.extractFeatures(media.repartition(3), dim = 8)
      .collect().map(f => f.key -> f.features.toSeq).toMap
    val single = Multimodal.extractFeatures(media.coalesce(1), dim = 8)
      .collect().map(f => f.key -> f.features.toSeq).toMap
    assert(repart === single)
  }

  test("textFeatures: deterministic unit vectors, token-order sensitive") {
    val a = Multimodal.textFeatures("the quick brown fox", dim = 32)
    val b = Multimodal.textFeatures("the quick brown fox", dim = 32)
    val c = Multimodal.textFeatures("fox brown quick the", dim = 32)
    assert(a.toSeq === b.toSeq)
    assert(a.toSeq !== c.toSeq) // bigrams make order matter
    assert(a.length === 32)
    assert(math.abs(math.sqrt(a.map(x => x.toDouble * x).sum) - 1.0) < 1e-5)
    assert(Multimodal.textFeatures("", dim = 8).toSeq === Seq.fill(8)(0f))
  }

  test("frame sampling yields n frames per record with coverage") {
    val frames = Multimodal.sampleFrames(media, n = 4)
    assert(frames.count() === 12)
    val idx = frames.select("frame_idx").distinct().collect().map(_.getInt(0)).sorted
    assert(idx === Array(0, 1, 2, 3))
    // random bytes are not an AVI: every frame is the flagged fallback
    assert(frames.where(col("real_frame")).count() === 0)
  }

  private def png(w: Int, h: Int)(rgb: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (x <- 0 until w; y <- 0 until h) img.setRGB(x, y, rgb(x, y))
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  test("dHash64: gradient structure, re-encode stability, flat zero") {
    def gray(v: Int) = (v << 16) | (v << 8) | v
    val asc = png(36, 32)((x, _) => gray(x * 7))         // brightens left->right
    val desc = png(36, 32)((x, _) => gray(255 - x * 7))
    val flat = png(36, 32)((_, _) => gray(128))
    val ha = Multimodal.dHash64(asc).get
    val hd = Multimodal.dHash64(desc).get
    assert(ha === 0L, "ascending gradient: no cell brighter than its right")
    assert(java.lang.Long.bitCount(hd) === 64, "descending: every bit set")
    assert(Multimodal.dHash64(flat).get === 0L)
    // lossless re-encode of identical pixels -> identical hash
    assert(Multimodal.dHash64(png(36, 32)((x, _) => gray(x * 7))).get === ha)
    assert(Multimodal.dHash64(Array[Byte](9, 9, 9)) === None)
  }

  test("image near-dup: dHashes + pigeonhole Hamming join find the edit") {
    import graft.operators.Dedup
    def gray(v: Int) = (v << 16) | (v << 8) | v
    def base(x: Int, y: Int) = gray((x * 5 + y * 3) % 256)
    val media = Seq(
      Multimodal.MediaRecord("orig", "image", png(64, 64)(base), Map()),
      // local edit: a small corner patch painted over
      Multimodal.MediaRecord("edited", "image", png(64, 64)((x, y) =>
        if (x < 6 && y < 6) gray(255) else base(x, y)), Map()),
      Multimodal.MediaRecord("other", "image", png(64, 64)((x, y) =>
        gray((255 - x * 11 + y * 17) % 256)), Map()),
      Multimodal.MediaRecord("junk", "image", Array[Byte](1, 2), Map()),
      Multimodal.MediaRecord("wav", "audio", Array[Byte](1, 2, 3), Map()))
      .toDS()
    val hashes = Multimodal.dHashes(media)
    // undecodable + non-image rows dropped
    assert(hashes.select("key").as[String].collect().sorted.toSeq ===
      Seq("edited", "orig", "other"))
    val pairs = Dedup.hammingPairsBucketed(hashes, "key", "dhash",
        bits = 64, maxHamming = 8)
      .select("a", "b").as[(String, String)].collect().toSet
    assert(pairs.contains(("edited", "orig")), s"edit must pair: $pairs")
    assert(!pairs.exists(p => p._1 == "other" || p._2 == "other"),
      s"unrelated image must not pair: $pairs")
  }

  test("composition: image dHash pairs -> dedup CLUSTERS via connected components") {
    import graft.operators.{Dedup, Graph}
    def gray(v: Int) = (v << 16) | (v << 8) | v
    def base(x: Int, y: Int) = gray((x * 5 + y * 3) % 256)
    def patched(px: Int)(x: Int, y: Int) =
      if (x < 4 && y < 4) gray(px) else base(x, y)
    val media = Seq(
      Multimodal.MediaRecord("1", "image", png(64, 64)(base), Map()),
      Multimodal.MediaRecord("2", "image", png(64, 64)(patched(250)), Map()),
      Multimodal.MediaRecord("3", "image", png(64, 64)(patched(0)), Map()),
      Multimodal.MediaRecord("4", "image", png(64, 64)((x, y) =>
        gray((255 - x * 11 + y * 17) % 256)), Map()))
      .toDS()
    val hashes = Multimodal.dHashes(media)
      .select(col("key").cast("long").as("k"), col("dhash"))
    val pairs = Dedup.hammingPairsBucketed(hashes, "k", "dhash",
      bits = 64, maxHamming = 8)
    val labels = Graph.connectedComponents(pairs, "a", "b")
      .as[(Long, Long)].collect().toMap
    // 1, 2, 3 are local edits of one base image -> one cluster; 4 is
    // unrelated and never appears in the pair graph at all
    assert(labels.keySet == Set(1L, 2L, 3L))
    assert(Set(labels(1L), labels(2L), labels(3L)).size == 1)
  }

  test("audioHash64: envelope-gradient fingerprint is gain-invariant") {
    val quiet = sineWav(440.0)
    val hq = Multimodal.audioHash64(quiet)
    assert(hq.isDefined)
    // same waveform decoded twice -> identical fingerprint
    assert(Multimodal.audioHash64(sineWav(440.0)) === hq)
    // a very different envelope (much lower tone) -> different print;
    // undecodable payload -> None
    assert(Multimodal.audioHash64(sineWav(13.0)) !== hq)
    assert(Multimodal.audioHash64(Array[Byte](1, 2, 3)) === None)
  }

  test("video near-dup: shared frames across AVIs pair, disjoint do not") {
    import graft.operators.Dedup
    def gray(v: Int) = (v << 16) | (v << 8) | v
    def frame(seed: Int) = {
      val img = new java.awt.image.BufferedImage(32, 32,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (x <- 0 until 32; y <- 0 until 32)
        img.setRGB(x, y, gray((x * seed + y * 7) % 256))
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", out)
      out.toByteArray
    }
    val (f1, f2, f3, f4) = (frame(3), frame(5), frame(11), frame(23))
    val vids = Seq(
      Multimodal.MediaRecord("v1", "video", mjpegAvi(Seq(f1, f2, f3)), Map()),
      Multimodal.MediaRecord("v2", "video", mjpegAvi(Seq(f1, f2, f4)), Map()),
      Multimodal.MediaRecord("v3", "video", mjpegAvi(Seq(f4)), Map()),
      Multimodal.MediaRecord("img", "image", f1, Map())) // non-video skipped
      .toDS()
    val fh = Multimodal.videoFrameHashes(vids)
    assert(fh.select("key").distinct().as[String].collect().sorted.toSeq ===
      Seq("v1", "v2", "v3"))
    val pairs = Multimodal.videoNearDupPairs(fh, maxHamming = 4,
        minMatches = 2)
      .as[(String, String, Long)].collect().toSeq
    // v1 and v2 share frames f1, f2 (>= 2 matches); v3 shares only f4
    // with v2 (1 match) — below the bar
    assert(pairs.map(p => (p._1, p._2)) === Seq(("v1", "v2")), pairs.toString)
    assert(pairs.head._3 >= 2L)
  }

  private def tinyJpeg(shade: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(4, 3,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (x <- 0 until 4; y <- 0 until 3) img.setRGB(x, y, shade << 16)
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", out)
    out.toByteArray
  }

  /** Minimal MJPEG AVI: RIFF(AVI ) > LIST(movi) > 00dc JPEG chunks. */
  private def mjpegAvi(frames: Seq[Array[Byte]]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def ascii(s: String): Unit = out.write(s.getBytes("US-ASCII"))
    def le32(v: Int): Unit =
      (0 until 4).foreach(i => out.write((v >> (8 * i)) & 0xff))
    val chunksLen = frames.map(f => 8 + f.length + (f.length & 1)).sum
    ascii("RIFF"); le32(4 + 8 + 4 + chunksLen); ascii("AVI ")
    ascii("LIST"); le32(4 + chunksLen); ascii("movi")
    frames.foreach { f =>
      ascii("00dc"); le32(f.length); out.write(f)
      if ((f.length & 1) == 1) out.write(0)
    }
    out.toByteArray
  }

  test("MJPEG AVI: real demuxed frames, byte-exact, ImageIO-decodable") {
    val jpegs = (0 until 4).map(i => tinyJpeg(60 * i))
    val avi = mjpegAvi(jpegs)
    val rec = Seq(MediaRecord("vid", "video", avi, Map.empty)).toDS()
    val got = Multimodal.sampleFrames(rec, n = 2)
      .orderBy("frame_idx").collect()
      .map(r => (r.getInt(1), r.getAs[Array[Byte]](2), r.getBoolean(3)))
    assert(got.length === 2)
    assert(got.forall(_._3), "frames must come from the real demux path")
    // evenly spaced over 4 true frames: indices 0 and 2
    assert(got(0)._2.toSeq === jpegs(0).toSeq)
    assert(got(1)._2.toSeq === jpegs(2).toSeq)
    // a demuxed frame is a real JPEG: the image featurizer decodes it
    val dims = Multimodal.extractFeatures(
      Seq(MediaRecord("f0", "image", got(0)._2, Map.empty)).toDS(), dim = 12)
      .collect().head
    assert(dims.width === 4 && dims.height === 3)
  }

  test("torn AVI stops cleanly at the truncation, keeping whole frames") {
    val jpegs = (0 until 3).map(i => tinyJpeg(50 * i))
    val avi = mjpegAvi(jpegs)
    // cut inside the LAST frame's chunk: the walker keeps frames 0..1
    val torn = avi.take(avi.length - jpegs(2).length / 2)
    val rec = Seq(MediaRecord("torn", "video", torn, Map.empty)).toDS()
    val got = Multimodal.sampleFrames(rec, n = 2)
      .orderBy("frame_idx").collect()
      .map(r => (r.getAs[Array[Byte]](2), r.getBoolean(3)))
    assert(got.forall(_._2), "surviving whole frames still demux for real")
    assert(got(0)._1.toSeq === jpegs(0).toSeq && got(1)._1.toSeq === jpegs(1).toSeq)
  }

  test("binaryFile ingest applies the extension whitelist (S9)") {
    // NB: Spark's file index skips names starting with '_' or '.' (hidden-
    // file convention), so the reference's `__*.jpg` samples are invisible
    // to binaryFile — use normally-named fixtures.
    val dir = java.nio.file.Files.createTempDirectory("graft-media-")
    java.nio.file.Files.write(dir.resolve("cat.jpg"), Array[Byte](1, 2, 3))
    java.nio.file.Files.write(dir.resolve("dog.png"), Array[Byte](4, 5))
    java.nio.file.Files.write(dir.resolve("notes.txt"), Array[Byte](6))
    val df = Multimodal.readMediaDir(spark, dir.toString)
    val keys = df.select("key").collect().map(_.getString(0)).sorted
    assert(keys === Array("cat", "dog")) // txt filtered out
    assert(df.columns.toSeq === Seq("key", "mediaType", "bytes", "meta"))
  }

  /** Synthesize an in-memory WAV: 16-bit mono PCM sine at `hz`. */
  private def sineWav(hz: Double, seconds: Double = 0.25, rate: Float = 8000f): Array[Byte] = {
    val n = (rate * seconds).toInt
    val pcm = new Array[Byte](n * 2)
    for (i <- 0 until n) {
      val s = (math.sin(2 * math.Pi * hz * i / rate) * 0.8 * 32767).toInt.toShort
      pcm(i * 2) = (s & 0xff).toByte
      pcm(i * 2 + 1) = ((s >> 8) & 0xff).toByte
    }
    val fmt = new javax.sound.sampled.AudioFormat(rate, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
    val out = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  test("real WAV decode: sample rate, frame count, energy + ZCR features") {
    val wav = sineWav(440.0)
    val rec = Seq(MediaRecord("a440", "audio", wav, Map.empty)).toDS()
    val f = Multimodal.extractFeatures(rec, dim = 16).collect().head
    assert(f.width === 8000)   // sample rate, REALLY decoded from the header
    assert(f.height === 2000)  // 0.25 s at 8 kHz
    assert(f.features.length === 16)
    // a steady sine has near-uniform per-window energy: all RMS slots > 0
    assert((0 until 8).forall(w => f.features(w * 2) > 0f))
    // determinism
    val f2 = Multimodal.extractFeatures(rec, dim = 16).collect().head
    assert(f.features.toSeq === f2.features.toSeq)
  }

  test("ZCR separates high-pitch from low-pitch audio") {
    def zcrSum(hz: Double): Double = {
      val rec = Seq(MediaRecord("x", "audio", sineWav(hz), Map.empty)).toDS()
      val f = Multimodal.extractFeatures(rec, dim = 16).collect().head
      (0 until 8).map(w => f.features(w * 2 + 1).toDouble).sum
    }
    assert(zcrSum(880.0) > zcrSum(55.0)) // brightness ordering survives pooling
  }

  test("non-WAV bytes under mediaType=audio fall back with -1 dims") {
    val rec = Seq(MediaRecord("junk", "audio",
      Array.tabulate(64)(_.toByte), Map.empty)).toDS()
    val f = Multimodal.extractFeatures(rec, dim = 8).collect().head
    assert(f.width === -1 && f.height === -1)
    assert(f.features.length === 8)
  }

  test("readAudioDir whitelists JDK-decodable containers and ingests WAV end-to-end") {
    val dir = java.nio.file.Files.createTempDirectory("graft-audio-")
    java.nio.file.Files.write(dir.resolve("tone.wav"), sineWav(440.0))
    java.nio.file.Files.write(dir.resolve("skip.mp3"), Array[Byte](1, 2, 3))
    val ds = Multimodal.readAudioDir(spark, dir.toString)
    assert(ds.select("key").collect().map(_.getString(0)).toSeq === Seq("tone"))
    val f = Multimodal.extractFeatures(ds.as[MediaRecord], dim = 16).collect().head
    assert(f.mediaType === "audio" && f.width === 8000)
  }

  // ---- model-artifact-backed embedder (the CLIP seam, proven) ----

  import graft.multimodal.Embedder

  private def freshModelDir(): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-model-").toString
    val model = Embedder.DualTower(
      image = Embedder.seededTower(seed = 42L, inDim = 48, hiddenDim = 64,
        outDim = 512),
      text = Embedder.seededTower(seed = 43L, inDim = 48, hiddenDim = 64,
        outDim = 512))
    Embedder.save(spark.sparkContext.hadoopConfiguration, dir, model)
    dir
  }

  test("image2vec through a LOADED model artifact: the reference's six " +
      "JPEGs embed to distinct unit-norm 512-d vectors, deterministically") {
    assumeRefData()
    val modelDir = freshModelDir()
    val names = Seq("__1Mu7EZXOM", "__CmMNKO4nw", "__G2yFuW7jQ",
      "__I-gX-cnd8", "__LjxJzd0MA", "__or0r9kLQw")
    val recs = names.map { n =>
      MediaRecord(n, "image",
        java.nio.file.Files.readAllBytes(refData.resolve(n + ".jpg")), Map.empty)
    }.toDS().repartition(3) // model loads on several partitions — one JVM read
    val got = Embedder.embedMedia(recs, modelDir).collect()
      .map(e => e.key -> e).toMap
    assert(got.size === 6)
    got.values.foreach { e =>
      assert(e.decoded, s"${e.key} must use the real decode path")
      assert(e.embedding.length === 512)
      val nrm = math.sqrt(e.embedding.map(x => x.toDouble * x).sum)
      assert(math.abs(nrm - 1.0) < 1e-5, s"unit norm of ${e.key}")
    }
    assert(got.values.map(_.embedding.toSeq).toSet.size === 6,
      "six distinct images must embed distinctly")
    // bit-deterministic: a second full pass reproduces every vector
    val again = Embedder.embedMedia(recs, modelDir).collect()
      .map(e => e.key -> e.embedding.toSeq).toMap
    names.foreach(n => assert(again(n) === got(n).embedding.toSeq))
  }

  test("text2vec through the text tower shares the image space: KNN-ready " +
      "(id, embedding) rows, unit-norm, deterministic") {
    val modelDir = freshModelDir()
    val docs = Seq((1L, "a photo of a cat"), (2L, "stock market analysis"),
      (3L, "a photo of a cat")).toDF("doc_id", "text")
    val out = Embedder.embedText(docs, "doc_id", "text", modelDir)
      .as[(String, Array[Float])].collect().toMap
    assert(out.size === 3)
    assert(out("1").toSeq === out("3").toSeq, "same text, same vector")
    assert(out("1").toSeq !== out("2").toSeq)
    val nrm = math.sqrt(out("1").map(x => x.toDouble * x).sum)
    assert(math.abs(nrm - 1.0) < 1e-5)
    assert(out("1").length === 512)
  }

  test("embedder artifact discipline: missing _SUCCESS and mismatched " +
      "feature dims fail loud; registry reloads a re-saved artifact") {
    val conf = spark.sparkContext.hadoopConfiguration
    // no artifact at all
    val empty = java.nio.file.Files.createTempDirectory("graft-nomodel-")
    val ex = intercept[Exception] {
      Embedder.embedMedia(media, empty.toString).collect()
    }
    assert(ex.getMessage.contains("_SUCCESS"), ex.getMessage)
    // a model whose inDim disagrees with its own tower shapes is rejected
    // at construction (shape check), and a forward with the wrong input
    // dim is rejected at run time
    val t = Embedder.seededTower(1L, inDim = 8, hiddenDim = 4, outDim = 16)
    val ex2 = intercept[IllegalArgumentException] {
      t.forward(new Array[Float](9))
    }
    assert(ex2.getMessage.contains("featurizer and model artifact disagree"))
    // save/load round-trips bit-exactly, and a re-save is picked up by
    // the registry (mtime key), not served stale
    val dir = freshModelDir()
    val loaded = Embedder.load(conf, dir)
    val v1 = Embedder.Registry.get(dir).image.w1.toSeq
    assert(loaded.image.w1.toSeq === v1)
    Thread.sleep(1100) // _SUCCESS mtime granularity is one second
    Embedder.save(conf, dir, Embedder.DualTower(
      Embedder.seededTower(99L, 48, 64, 512),
      Embedder.seededTower(98L, 48, 64, 512)))
    assert(Embedder.Registry.get(dir).image.w1.toSeq !== v1,
      "registry must reload after a re-save")
  }
}
