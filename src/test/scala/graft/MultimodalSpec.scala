package graft

import graft.multimodal.Multimodal
import graft.multimodal.Multimodal.MediaRecord

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

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
  }

  test("feature extraction distributes over partitions unchanged") {
    val repart = Multimodal.extractFeatures(media.repartition(3), dim = 8)
      .collect().map(f => f.key -> f.features.toSeq).toMap
    val single = Multimodal.extractFeatures(media.coalesce(1), dim = 8)
      .collect().map(f => f.key -> f.features.toSeq).toMap
    assert(repart === single)
  }

  test("frame sampling yields n frames per record with coverage") {
    val frames = Multimodal.sampleFrames(media, n = 4)
    assert(frames.count() === 12)
    val idx = frames.select("frame_idx").distinct().collect().map(_.getInt(0)).sorted
    assert(idx === Array(0, 1, 2, 3))
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
}
