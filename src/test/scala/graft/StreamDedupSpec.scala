package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.operators.Dedup
import graft.streaming.StreamDedup

class StreamDedupSpec extends SparkSpec {
  import spark.implicits._

  // two "arrival waves" as separate files so the file source sees real
  // incremental input; ts encodes arrival order
  private def writeDocs(): String = {
    val dir = Files.createTempDirectory("graft-sdedup-").toString
    def put(name: String, rows: Seq[(Long, String, Long)], mtime: Long): Unit = {
      val json = rows.map { case (id, text, ts) =>
        s"""{"doc_id":$id,"text":"$text","ts":$ts}"""
      }.mkString("", "\n", "\n")
      val p = Paths.get(s"$dir/$name")
      Files.write(p, json.getBytes)
      // the file source orders batches by mtime — make wave order explicit
      Files.setLastModifiedTime(p, java.nio.file.attribute.FileTime.fromMillis(mtime))
    }
    val t0 = System.currentTimeMillis() - 60000
    put("wave1.json", Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again", 1000L),
      (2L, "completely different content about spark structured streaming", 2000L)), mtime = t0)
    put("wave2.json", Seq(
      (3L, "The quick brown fox jumps over the lazy dog again and again", 3000L), // exact dup of 1 (case)
      (4L, "the quick brown fox jumps over the lazy dog again and once", 4000L),  // near-dup of 1
      (5L, "unrelated third topic entirely with no shared phrasing at all", 5000L)), mtime = t0 + 30000)
    dir
  }

  private def docStream(dir: String) =
    spark.readStream
      .schema("doc_id LONG, text STRING, ts LONG")
      .option("maxFilesPerTrigger", "1") // one wave per micro-batch
      .json(dir)

  test("streaming exact dedup keeps only the first arrival of each normalized text") {
    val dir = writeDocs()
    val out = StreamDedup.exactKeepFirst(docStream(dir), "doc_id", "text",
      tsCol = "ts", watermark = "10 seconds")
    val q = out.writeStream.format("memory").queryName("sd_exact")
      .outputMode("append").trigger(Trigger.AvailableNow())
      .option("checkpointLocation",
        Files.createTempDirectory("graft-sdedup-ckpt-").toString).start()
    q.awaitTermination(60000)
    val kept = spark.table("sd_exact").select("doc_id")
      .collect().map(_.getLong(0)).toSet
    // doc 3 normalizes to doc 1's text and arrived later -> dropped
    assert(kept === Set(1L, 2L, 4L, 5L))
  }

  test("streaming LSH candidates find the planted near-dup pair with one-long-per-bucket state") {
    val dir = writeDocs()
    val cands = StreamDedup.minhashCandidates(docStream(dir), "doc_id", "text")
    val q = cands.writeStream.format("memory").queryName("sd_cand")
      .outputMode("append").trigger(Trigger.AvailableNow())
      .option("checkpointLocation",
        Files.createTempDirectory("graft-sdedup-ckpt-").toString).start()
    q.awaitTermination(60000)
    val pairs = spark.table("sd_cand").select("a", "b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // the exact dup (1,3) and the near-dup (1,4) must both surface
    assert(pairs.contains((1L, 3L)), s"missing exact-dup candidate in $pairs")
    assert(pairs.contains((1L, 4L)), s"missing near-dup candidate in $pairs")
    // no candidate may pair two unrelated docs that the batch band join
    // would not pair: streaming candidates ⊆ batch candidates ∪ rep-chains.
    // Verify against batch pairs at jac>0 (candidate legitimacy, not recall).
    val batchPairs = Dedup.minhashPairs(
        spark.read.schema("doc_id LONG, text STRING, ts LONG").json(dir),
        "doc_id", "text", persistIntermediates = false)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.subsetOf(batchPairs),
      s"streaming emitted pairs the batch band join never generates: ${pairs -- batchPairs}")
  }

  test("streaming LSH candidates under keyForm=folded catch an NFC-vs-NFD " +
      "republication arriving in a LATER wave (the batch dispatch, live)") {
    val dir = Files.createTempDirectory("graft-sdfold-").toString
    val nfc = "séance résumé café crème " +
      "brûlée déjà vu encore une fois"
    val nfd = java.text.Normalizer.normalize(nfc,
      java.text.Normalizer.Form.NFD)
    def put(name: String, rows: Seq[(Long, String)], mtime: Long): Unit = {
      val json = rows.map { case (id, text) =>
        s"""{"doc_id":$id,"text":"$text","ts":$id}"""
      }.mkString("", "\n", "\n")
      val p = Paths.get(s"$dir/$name")
      // explicit UTF-8: the platform default would mangle the accents
      // into invalid JSON -> PERMISSIVE null text -> zero candidates
      Files.write(p, json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      Files.setLastModifiedTime(p,
        java.nio.file.attribute.FileTime.fromMillis(mtime))
    }
    val t0 = System.currentTimeMillis() - 60000
    put("w1.json", Seq((1L, nfc),
      (2L, "totally unrelated text about spark shuffles and joins")), t0)
    put("w2.json", Seq((3L, nfd)), t0 + 30000)
    val cands = StreamDedup.minhashCandidates(docStream(dir),
      "doc_id", "text", keyForm = "folded")
    val q = cands.writeStream.format("memory").queryName("sd_fold")
      .outputMode("append").trigger(Trigger.AvailableNow())
      .option("checkpointLocation",
        Files.createTempDirectory("graft-sdfold-ckpt-").toString).start()
    q.awaitTermination(60000)
    val pairs = spark.table("sd_fold").select("a", "b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 3L)), s"folded stream missed the NFD dup: $pairs")
    assert(!pairs.exists(p => p._1 == 2L || p._2 == 2L),
      s"unrelated doc paired: $pairs")
  }

  test("bloom dedup drops cross-wave duplicates with bounded state and no fp at this load") {
    val dir = writeDocs()
    val out = StreamDedup.bloomKeepFirst(docStream(dir), "doc_id", "text",
      shards = 8, bitsPerShard = 1 << 12, k = 5)
    val q = out.writeStream.format("memory").queryName("sd_bloom")
      .outputMode("append").trigger(Trigger.AvailableNow())
      .option("checkpointLocation",
        Files.createTempDirectory("graft-sdbloom-ckpt-").toString).start()
    q.awaitTermination(60000)
    val kept = spark.table("sd_bloom").select("doc_id")
      .collect().map(_.getLong(0)).toSet
    // doc 3 is the case-normalized duplicate of doc 1 (different wave —
    // the state carried); 4 fp-drop-free at 4 texts into 2^12 bits
    assert(kept === Set(1L, 2L, 4L, 5L))
  }

  test("bloom dedup collapses within-batch duplicates and survives heavy load fp-free") {
    val dir = Files.createTempDirectory("graft-sdbloom2-").toString
    // 300 distinct texts, each duplicated 3x (ids interleaved), ONE wave:
    // within-batch dedup must keep exactly the smallest id per text
    val rows = (0 until 900).map { i =>
      val t = i % 300
      s"""{"doc_id":${i + 1},"text":"document number $t with some distinct content","ts":${i + 1}}"""
    }
    Files.write(Paths.get(s"$dir/all.json"), rows.mkString("", "\n", "\n").getBytes)
    val out = StreamDedup.bloomKeepFirst(docStream(dir), "doc_id", "text",
      shards = 8, bitsPerShard = 1 << 14, k = 5)
    val q = out.writeStream.format("memory").queryName("sd_bloom2")
      .outputMode("append").trigger(Trigger.AvailableNow())
      .option("checkpointLocation",
        Files.createTempDirectory("graft-sdbloom2-ckpt-").toString).start()
    q.awaitTermination(60000)
    val kept = spark.table("sd_bloom2").select("doc_id")
      .collect().map(_.getLong(0)).toSet
    // smallest id per text = ids 1..300; 300 texts * 5 bits into 8 shards
    // of 2^14 bits -> fp probability ~1e-10 per doc, structurally zero here
    assert(kept === (1L to 300L).toSet)
  }
}
