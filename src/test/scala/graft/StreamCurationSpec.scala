package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.streaming.StreamCuration

class StreamCurationSpec extends SparkSpec {
  import spark.implicits._

  test("scrub runs stateless inside a stream; streamed output == batch output") {
    val tmp = Files.createTempDirectory("graft-scrubstream-").toString
    val docs = Seq(
      (1L, "mail a@b.co now"),
      (2L, "visit https://x.y/z"),
      (3L, "clean row")).toDF("doc_id", "text")
    docs.write.parquet(s"$tmp/in")
    val stream = spark.readStream
      .schema(docs.schema).option("maxFilesPerTrigger", "1").parquet(s"$tmp/in")
    val scrubbed = StreamCuration.scrubStream(stream, "text")
    assert(scrubbed.isStreaming) // the projection stayed a stream
    val q = scrubbed.writeStream.format("memory").queryName("scrub_out")
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", s"$tmp/ckpt").start()
    q.awaitTermination(120000)
    val streamed = spark.table("scrub_out")
      .select("doc_id", "redacted").orderBy("doc_id")
      .as[(Long, String)].collect().toSeq
    assert(streamed === Seq(
      (1L, "mail <EMAIL> now"), (2L, "visit <URL>"), (3L, "clean row")))
  }

  test("quality gate runs stateless inside a stream; survivors == batch pass set") {
    val tmp = Files.createTempDirectory("graft-qstream-").toString
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again today"),
      (2L, "x"),                                  // fails length
      (3L, "uno dos tres cuatro cinco"),          // fails stopword
      (4L, "the cat sat on a mat near the old barn door"))
      .toDF("doc_id", "text")
    docs.write.parquet(s"$tmp/in")
    val stream = spark.readStream
      .schema(docs.schema).option("maxFilesPerTrigger", "1").parquet(s"$tmp/in")
    val gated = StreamCuration.qualityGateStream(stream, "text", minTok = 3L)
    assert(gated.isStreaming)
    assert(gated.columns.toSeq === Seq("doc_id", "text")) // flags stripped
    val q = gated.writeStream.format("memory").queryName("quality_out")
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", s"$tmp/ckpt").start()
    q.awaitTermination(120000)
    val streamed = spark.table("quality_out")
      .select("doc_id").as[Long].collect().toSeq.sorted
    val batch = graft.operators.Quality.ruleFlags(docs, "text", minTok = 3L)
      .where(col("pass")).select("doc_id").as[Long].collect().toSeq.sorted
    assert(streamed === batch)
    assert(streamed === Seq(1L, 4L))
  }

  test("repetition gate runs stateless inside a stream; survivors == " +
      "batch Curate.run under the same Config") {
    val tmp = Files.createTempDirectory("graft-repstream-").toString
    val docs = Seq(
      (1L, (1 to 40).map(i => s"tok$i").mkString(" ")),  // passes all
      (2L, ("buy now " * 30).trim),                      // top2 + dup5 fail
      (3L, (1 to 30).map(i => s"w$i").mkString(" ")))    // passes all
      .toDF("doc_id", "text")
    docs.write.parquet(s"$tmp/in")
    val cfg = graft.operators.Curate.Config(
      exactDedup = false, repetitionRules = true)
    val stream = spark.readStream
      .schema(docs.schema).option("maxFilesPerTrigger", "1").parquet(s"$tmp/in")
    val gated = StreamCuration.run(stream, "doc_id", "text", cfg)
    assert(gated.isStreaming)
    val q = gated.writeStream.format("memory").queryName("rep_out")
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", s"$tmp/ckpt").start()
    q.awaitTermination(120000)
    val streamed = spark.table("rep_out")
      .select("doc_id").as[Long].collect().toSet
    val batch = graft.operators.Curate.run(docs, "doc_id", "text", cfg)
      .select("doc_id").as[Long].collect().toSet
    assert(streamed === batch)
    assert(streamed === Set(1L, 3L))
  }

  test("streaming decontamination drops the same docs as the batch path") {
    val tmp = Files.createTempDirectory("graft-decstream-").toString
    val corpus = Seq(
      (1L, "a b x y z c d e"),
      (2L, "p q r s t u v w"),
      (3L, "x y z c d e f g")).toDF("doc_id", "text")
    val bench = Seq((10L, "x y z c d e")).toDF("doc_id", "text")
    corpus.write.parquet(s"$tmp/in")
    val stream = spark.readStream
      .schema(corpus.schema).option("maxFilesPerTrigger", "1").parquet(s"$tmp/in")
    val kept = scala.collection.mutable.ArrayBuffer.empty[Long]
    val writer = StreamCuration.decontaminate(stream, bench, "doc_id", "text",
      n = 4, trigger = Trigger.AvailableNow()) { (clean, _) =>
      kept ++= clean.select("doc_id").as[Long].collect()
    }
    val q = writer.option("checkpointLocation", s"$tmp/ckpt").start()
    q.awaitTermination(120000)
    val batchKept = graft.operators.Decontaminate
      .cleanCorpus(corpus, bench, "doc_id", "text", n = 4)
      .select("doc_id").as[Long].collect().toSeq
    assert(kept.sorted.toSeq === batchKept.sorted)
    assert(kept.sorted.toSeq === Seq(2L)) // docs 1 and 3 share 4-grams with bench
  }

  test("blocklist gate runs stateless inside a stream; survivors == batch") {
    val tmp = Files.createTempDirectory("graft-blstream-").toString
    val docs = Seq(
      (1L, "a clean document"), (2L, "contains badword here"),
      (3L, "two bad words overlap"), (4L, "fine")).toDF("doc_id", "text")
    docs.write.parquet(s"$tmp/in")
    val bl = Seq("badword", "bad words")
    val stream = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$tmp/in")
    val gated = StreamCuration.blocklistGateStream(stream, "text", bl)
    assert(gated.isStreaming)
    val q = gated.writeStream.format("memory").queryName("bl_out")
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", s"$tmp/ckpt").start()
    q.awaitTermination(120000)
    val streamed = spark.table("bl_out").select("doc_id")
      .as[Long].collect().sorted.toSeq
    val batch = StreamCuration.blocklistGateStream(docs, "text", bl)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(streamed === batch)
    assert(streamed === Seq(1L, 4L))
  }

  test("DSIR gate runs stateless inside a stream; survivors == batch gate") {
    import graft.operators.Dsir
    val tmp = Files.createTempDirectory("graft-dsirstream-").toString
    // target vocabulary "alpha beta", noise "zeta eta"
    val train = Seq(
      (1L, "alpha beta alpha beta", "t"), (2L, "alpha beta beta", "t"),
      (3L, "zeta eta zeta", "n"), (4L, "eta zeta eta eta", "n"))
      .toDF("doc_id", "text", "kind")
    val scores = Dsir.collectScores(
      Dsir.bucketScoreTable(train, "text", col("kind") === "t", 256, 10000L),
      256, 10000L)
    val incoming = Seq(
      (10L, "alpha beta alpha"), (11L, "zeta eta"), (12L, "beta alpha"))
      .toDF("doc_id", "text")
    incoming.write.parquet(s"$tmp/in")
    val stream = spark.readStream.schema(incoming.schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$tmp/in")
    val gated = StreamCuration.dsirGateStream(stream, "doc_id", "text",
      scores, minMeanScore = 10000L)
    assert(gated.isStreaming)
    val q = gated.writeStream.format("memory").queryName("dsir_out")
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", s"$tmp/ckpt").start()
    q.awaitTermination(120000)
    val streamed = spark.table("dsir_out").select("doc_id")
      .as[Long].collect().sorted.toSeq
    val batch = StreamCuration.dsirGateStream(incoming, "doc_id", "text",
      scores, minMeanScore = 10000L).select("doc_id")
      .as[Long].collect().sorted.toSeq
    assert(streamed === batch)
    assert(streamed === Seq(10L, 12L), s"target-vocab docs pass: $streamed")
  }

  test("Config-driven run: one Curate.Config, stream survivors == batch " +
      "survivors across the full stateless pipeline") {
    import graft.operators.{Curate, Dsir}
    val tmp = Files.createTempDirectory("graft-curstream-").toString
    // fixture exercises every stage: 2 exact dups (min-id arrives first,
    // so keep-first == keep-min-id), 1 contaminated, 1 blocklisted,
    // 1 too short, 1 off-target (fails DSIR), 2 clean survivors
    val docs = Seq(
      (1L, "alpha beta gamma delta alpha", 100L),
      (2L, "alpha beta gamma delta alpha", 200L), // dup of 1 — drops
      (3L, "exam answer key alpha beta gamma", 300L), // contaminated
      (4L, "beta alpha spamword gamma delta", 400L),  // blocklisted
      (5L, "alpha", 500L),                            // too short
      (6L, "zeta eta zeta eta theta", 600L),          // off-target: DSIR
      (7L, "beta alpha beta gamma epsilon", 700L))
      .toDF("doc_id", "text", "ts")
    val bench = Seq((100L, "exam answer key")).toDF("bid", "btext")
      .withColumnRenamed("bid", "doc_id").withColumnRenamed("btext", "text")
    val train = Seq(
      (1L, "alpha beta gamma", "t"), (2L, "beta gamma alpha", "t"),
      (3L, "zeta eta theta", "n"), (4L, "eta zeta eta", "n"))
      .toDF("doc_id", "text", "kind")
    val scores = Dsir.collectScores(
      Dsir.bucketScoreTable(train, "text", col("kind") === "t", 256, 10000L),
      256, 10000L)
    val cfg = Curate.Config(
      exactDedup = true,
      decontaminateBench = Some(bench),
      decontaminateN = 3,
      blocklist = Seq("spamword"),
      minTokens = 3L,
      dsirTarget = Some(col("kind") === "t")) // trained batch-side above

    docs.write.parquet(s"$tmp/in")
    val stream = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$tmp/in")
    val curated = StreamCuration.run(stream, "doc_id", "text", cfg,
      keepFirst = Some(("ts", "10 seconds")),
      dsirScores = Some(scores), dsirMinMeanScore = 10000L)
    assert(curated.isStreaming)
    val q = curated.writeStream.format("memory").queryName("cur_out")
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", s"$tmp/ckpt").start()
    q.awaitTermination(120000)
    val streamed = spark.table("cur_out").select("doc_id")
      .as[Long].collect().sorted.toSeq
    // batch twin: the SAME config through the same entry. The batch
    // dedup keeps min-id deterministically; the stream keeps FIRST
    // ARRIVAL, and a parquet-file source does not guarantee which of a
    // same-batch duplicate pair is encountered first — so the pinned
    // contract is: identical survivor COUNT, identical survivors
    // everywhere dedup is not ambiguous, and exactly one of the dup
    // pair (1, 2) surviving either way.
    val batch = StreamCuration.run(docs, "doc_id", "text", cfg,
      keepFirst = Some(("ts", "10 seconds")),
      dsirScores = Some(scores), dsirMinMeanScore = 10000L)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(batch === Seq(1L, 7L), s"batch keeps min-id: $batch")
    assert(streamed.size === batch.size,
      s"stream $streamed != batch $batch sizes")
    assert(streamed.toSet.intersect(Set(1L, 2L)).size === 1,
      s"exactly one of the duplicate pair survives the stream: $streamed")
    assert(streamed.filterNot(Set(1L, 2L)) === batch.filterNot(Set(1L, 2L)),
      s"non-ambiguous survivors agree: stream $streamed vs batch $batch")
    // the config's corpus-shape stages fail loud instead of silently
    // meaning a different pipeline on the stream
    val ex = intercept[IllegalArgumentException] {
      StreamCuration.run(stream, "doc_id", "text",
        cfg.copy(epochBudgets = Map("web" -> 100L)),
        keepFirst = Some(("ts", "10 seconds")),
        dsirScores = Some(scores))
    }
    assert(ex.getMessage.contains("corpus-shape"), ex.getMessage)
    // dsirTarget without a frozen artifact fails loud too
    val ex2 = intercept[RuntimeException] {
      StreamCuration.run(stream, "doc_id", "text", cfg,
        keepFirst = Some(("ts", "10 seconds")))
    }
    assert(ex2.getMessage.contains("frozen"), ex2.getMessage)
  }

  test("incremental span gate in the stream: scrubbed text == batch twin") {
    import graft.operators.{Curate, Dedup}
    val tmp = Files.createTempDirectory("graft-spanstream-").toString
    val w = (1 to 12).map(i => s"w$i").mkString(" ")
    // frozen reference corpus -> gram index, built batch-side
    val index = Dedup.dupSpanIndex(
      Seq((1L, w)).toDF("doc_id", "text"), "text", n = 8)
    val docs = Seq(
      (10L, s"p1 p2 p3 $w q1", 100L),     // reference passage at offset +3
      (11L, w, 200L),                     // consumed whole -> drops
      (12L, "u1 u2 u3 u4 u5 u6 u7 u8 u9", 300L)) // clean
      .toDF("doc_id", "text", "ts")
    docs.write.parquet(s"$tmp/in")
    val stream = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$tmp/in")
    val cfg = Curate.Config(exactDedup = false)
    val curated = StreamCuration.run(stream, "doc_id", "text", cfg,
      spanIndex = Some(index))
    assert(curated.isStreaming)
    val q = curated.writeStream.format("memory").queryName("span_out")
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", s"$tmp/ckpt").start()
    q.awaitTermination(120000)
    val streamed = spark.table("span_out").select("doc_id", "text")
      .as[(Long, String)].collect().sortBy(_._1).toSeq
    val batch = StreamCuration.run(docs, "doc_id", "text", cfg,
        spanIndex = Some(index))
      .select("doc_id", "text")
      .as[(Long, String)].collect().sortBy(_._1).toSeq
    assert(streamed === batch, s"stream $streamed != batch $batch")
    assert(batch === Seq((10L, "p1 p2 p3 q1"),
      (12L, "u1 u2 u3 u4 u5 u6 u7 u8 u9")))
  }

  test("incremental line gate in the stream: scrubbed text == batch twin, " +
      "fully-boilerplate docs drop") {
    import graft.operators.{Curate, Dedup}
    val tmp = Files.createTempDirectory("graft-linestream-").toString
    // frozen reference corpus -> boilerplate-line index, built batch-side
    val index = Dedup.lineDedupIndex(Seq(
        (1L, "a\nSubscribe to our newsletter"),
        (2L, "b\nsubscribe TO OUR newsletter"))
      .toDF("doc_id", "text"), "doc_id", "text")
    val docs = Seq(
      (10L, "body ten\nSUBSCRIBE to our NEWSLETTER\ntail", 100L),
      (11L, "Subscribe to our newsletter", 200L), // consumed whole -> drops
      (12L, "clean doc", 300L))
      .toDF("doc_id", "text", "ts")
    docs.write.parquet(s"$tmp/in")
    val stream = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$tmp/in")
    val cfg = Curate.Config(exactDedup = false)
    val curated = StreamCuration.run(stream, "doc_id", "text", cfg,
      lineIndex = Some(index))
    assert(curated.isStreaming)
    val q = curated.writeStream.format("memory").queryName("line_out")
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", s"$tmp/ckpt").start()
    q.awaitTermination(120000)
    val streamed = spark.table("line_out").select("doc_id", "text")
      .as[(Long, String)].collect().sortBy(_._1).toSeq
    val batch = StreamCuration.run(docs, "doc_id", "text", cfg,
        lineIndex = Some(index))
      .select("doc_id", "text")
      .as[(Long, String)].collect().sortBy(_._1).toSeq
    assert(streamed === batch, s"stream $streamed != batch $batch")
    assert(batch === Seq((10L, "body ten\ntail"), (12L, "clean doc")))
    // dir form resolves through the mtime registry like the span stage
    val idxDir = s"$tmp/line_idx"
    Dedup.saveLineIndex(spark, idxDir, minDocs = 2, index)
    val viaDir = StreamCuration.run(docs, "doc_id", "text", cfg,
        lineIndexDir = Some(idxDir))
      .select("doc_id", "text").as[(Long, String)].collect().sortBy(_._1).toSeq
    assert(viaDir === batch)
    // both-forms misuse fails loud
    val ex = intercept[IllegalArgumentException] {
      StreamCuration.run(docs, "doc_id", "text", cfg,
        lineIndex = Some(index), lineIndexDir = Some(idxDir))
    }
    assert(ex.getMessage.contains("not both"), ex.getMessage)
  }

  test("html extract stage runs stateless inside a stream; text and " +
      "survivors == batch") {
    import graft.operators.Curate
    val tmp = Files.createTempDirectory("graft-htmlstream-").toString
    val docs = Seq(
      (1L, "<html><body><p>kept prose.</p><script>x()</script></body></html>", 10L),
      (2L, "<div><!-- markup only --></div>", 20L),
      (3L, "already plain.", 30L))
      .toDF("doc_id", "text", "ts")
    docs.write.parquet(s"$tmp/in")
    val stream = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$tmp/in")
    val cfg = Curate.Config(exactDedup = false, htmlExtract = true)
    val q = StreamCuration.run(stream, "doc_id", "text", cfg)
      .writeStream.format("memory").queryName("html_out")
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", s"$tmp/ckpt").start()
    q.awaitTermination(120000)
    val streamed = spark.table("html_out").select("doc_id", "text")
      .as[(Long, String)].collect().sortBy(_._1).toSeq
    val batch = StreamCuration.run(docs, "doc_id", "text", cfg)
      .select("doc_id", "text").as[(Long, String)].collect().sortBy(_._1).toSeq
    assert(streamed === batch)
    assert(batch === Seq((1L, "kept prose."), (3L, "already plain.")))
  }

  test("incremental CDC-chunk gate in the stream: scrubbed text == batch " +
      "twin, geometry rides the artifact") {
    import graft.operators.{Curate, Dedup}
    val tmp = Files.createTempDirectory("graft-cdcstream-").toString
    val passage = (0 until 24).map(i => s"p$i").mkString(" ")
    // frozen reference corpus -> hot-chunk index, built batch-side: the
    // STANDALONE passage twice, so every one of its chunks (edges
    // included) is hot — a new doc that IS the passage drops whole,
    // while an offset copy keeps only its unique-edge chunks (interior
    // boundaries resynchronize to the standalone form's)
    val index = Dedup.cdcChunkIndex(Seq(
        (1L, passage), (2L, passage))
      .toDF("doc_id", "text"), "doc_id", "text", w = 3, divisor = 4)
    val docs = Seq(
      (10L, "c0 c1 c2 " + passage + " cEnd", 100L), // interior scrubbed
      (11L, passage, 200L), // consumed whole -> drops
      (12L, "clean doc stays intact", 300L))
      .toDF("doc_id", "text", "ts")
    docs.write.parquet(s"$tmp/in")
    val stream = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$tmp/in")
    val cfg = Curate.Config(exactDedup = false)
    val curated = StreamCuration.run(stream, "doc_id", "text", cfg,
      cdcIndex = Some((3, 4, "md5", "raw", index)))
    assert(curated.isStreaming)
    val q = curated.writeStream.format("memory").queryName("cdc_out")
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", s"$tmp/ckpt").start()
    q.awaitTermination(120000)
    val streamed = spark.table("cdc_out").select("doc_id", "text")
      .as[(Long, String)].collect().sortBy(_._1).toSeq
    val batch = StreamCuration.run(docs, "doc_id", "text", cfg,
        cdcIndex = Some((3, 4, "md5", "raw", index)))
      .select("doc_id", "text")
      .as[(Long, String)].collect().sortBy(_._1).toSeq
    assert(streamed === batch, s"stream $streamed != batch $batch")
    assert(batch.map(_._1) === Seq(10L, 12L),
      s"doc 11 (fully hot) must drop, 10 and 12 survive: $batch")
    assert(batch(0)._2.startsWith("c0") && batch(0)._2.endsWith("cEnd"))
    assert(batch(1)._2 === "clean doc stays intact")
    // dir form resolves through the mtime registry, geometry inside
    val idxDir = s"$tmp/cdc_idx"
    Dedup.saveCdcChunkIndex(spark, idxDir, w = 3, divisor = 4, index)
    val viaDir = StreamCuration.run(docs, "doc_id", "text", cfg,
        cdcIndexDir = Some(idxDir))
      .select("doc_id", "text").as[(Long, String)].collect().sortBy(_._1).toSeq
    assert(viaDir === batch)
    // both-forms misuse fails loud
    val ex = intercept[IllegalArgumentException] {
      StreamCuration.run(docs, "doc_id", "text", cfg,
        cdcIndex = Some((3, 4, "md5", "raw", index)), cdcIndexDir = Some(idxDir))
    }
    assert(ex.getMessage.contains("not both"), ex.getMessage)
  }

  test("folded-key CDC index round-trips from disk with NO hand-carried " +
      "params; a form-mismatched line-index probe fails loud (r14)") {
    import graft.operators.{Curate, Dedup}
    val tmp = Files.createTempDirectory("graft-cdcfold-").toString
    val passage = (0 until 24).map(i => s"café$i").mkString(" ")
    val passageNfd = java.text.Normalizer.normalize(passage,
      java.text.Normalizer.Form.NFD)
    // reference corpus is NFC; index built under keyForm=folded and
    // persisted — the sidecar carries the form, the caller carries
    // NOTHING but the dir
    val index = Dedup.cdcChunkIndex(
      Seq((1L, passage), (2L, passage)).toDF("doc_id", "text"),
      "doc_id", "text", w = 3, divisor = 4, keyForm = "folded")
    val idxDir = s"$tmp/cdc_idx"
    Dedup.saveCdcChunkIndex(spark, idxDir, w = 3, divisor = 4, index,
      keyForm = "folded")
    val docs = Seq(
      (10L, passageNfd, 100L),                      // NFD republication -> drops whole
      (11L, "clean doc stays intact", 300L))
      .toDF("doc_id", "text", "ts")
    val cfg = Curate.Config(exactDedup = false)
    val got = StreamCuration.run(docs, "doc_id", "text", cfg,
        cdcIndexDir = Some(idxDir))
      .select("doc_id", "text")
      .as[(Long, String)].collect().sortBy(_._1).toSeq
    assert(got === Seq((11L, "clean doc stays intact")),
      s"the NFD republication must be consumed whole via the artifact's " +
        s"own keyForm: $got")
    // and streaming, same artifact, same verdicts
    docs.write.parquet(s"$tmp/in")
    val stream = spark.readStream.schema(docs.schema).parquet(s"$tmp/in")
    val q = StreamCuration.run(stream, "doc_id", "text", cfg,
        cdcIndexDir = Some(idxDir))
      .writeStream.format("memory").queryName("cdc_fold_out")
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", s"$tmp/ckpt").start()
    q.awaitTermination(120000)
    val streamed = spark.table("cdc_fold_out").select("doc_id", "text")
      .as[(Long, String)].collect().sortBy(_._1).toSeq
    assert(streamed === got, s"stream $streamed != batch $got")
    // a line index built folded but probed under cfg's byte default is
    // the ADVICE r13 silent-miss class — must fail loud instead
    val lineIdxDir = s"$tmp/line_idx"
    Dedup.saveLineIndex(spark, lineIdxDir, minDocs = 2,
      Array(1L, 2L, 3L), keyForm = "folded")
    val ex = intercept[IllegalArgumentException] {
      StreamCuration.run(docs, "doc_id", "text", cfg,
        lineIndexDir = Some(lineIdxDir))
    }
    assert(ex.getMessage.contains("keyForm 'folded'") &&
      ex.getMessage.contains("'byte'"), ex.getMessage)
  }

  test("span-index swap contract: a restarted stream picks up the " +
      "regenerated artifact via the mtime registry, no stale reads") {
    import graft.operators.{Curate, Dedup}
    val tmp = Files.createTempDirectory("graft-spanswap-").toString
    val idxDir = s"$tmp/span_idx"
    val w = (1 to 12).map(i => s"w$i").mkString(" ")
    val z = (1 to 12).map(i => s"z$i").mkString(" ")
    // v1 artifact: reference corpus contains the w-passage only
    Dedup.saveSpanIndex(spark, idxDir, n = 8,
      Dedup.dupSpanIndex(Seq((1L, w)).toDF("doc_id", "text"), "text", n = 8))
    val docs = Seq(
      (10L, s"p1 p2 p3 $w q1", 100L),   // w-passage: cut under v1 only
      (11L, s"r1 r2 r3 $z q2", 200L))   // z-passage: cut under v2 only
      .toDF("doc_id", "text", "ts")
    docs.write.parquet(s"$tmp/in")
    val cfg = Curate.Config(exactDedup = false)
    def runOnce(ckpt: String, outName: String): Seq[(Long, String)] = {
      val stream = spark.readStream.schema(docs.schema).parquet(s"$tmp/in")
      val curated = StreamCuration.run(stream, "doc_id", "text", cfg,
        spanIndexDir = Some(idxDir))
      val q = curated.writeStream.format("memory").queryName(outName)
        .trigger(Trigger.AvailableNow())
        .option("checkpointLocation", s"$tmp/$ckpt").start()
      q.awaitTermination(120000)
      spark.table(outName).select("doc_id", "text")
        .as[(Long, String)].collect().sortBy(_._1).toSeq
    }
    val v1 = runOnce("ckpt1", "swap_v1")
    assert(v1 === Seq((10L, "p1 p2 p3 q1"), (11L, s"r1 r2 r3 $z q2")),
      s"v1 artifact must cut only the w-passage: $v1")
    // the reference corpus is rebuilt (now the z-passage); same dir,
    // new artifact — ensure a strictly newer mtime for the registry key
    Thread.sleep(30)
    Dedup.saveSpanIndex(spark, idxDir, n = 8,
      Dedup.dupSpanIndex(Seq((1L, z)).toDF("doc_id", "text"), "text", n = 8))
    // RESTART (fresh checkpoint = a new run): the rebuilt plan resolves
    // the artifact again and must see v2, not the cached v1
    val v2 = runOnce("ckpt2", "swap_v2")
    assert(v2 === Seq((10L, s"p1 p2 p3 $w q1"), (11L, "r1 r2 r3 q2")),
      s"restart must pick up the regenerated artifact: $v2")
    // geometry rides the artifact: a loader can't probe with the wrong n
    assert(Dedup.loadSpanIndex(spark, idxDir)._1 === 8)
    // both-forms misuse fails loud
    val ex = intercept[IllegalArgumentException] {
      StreamCuration.run(docs, "doc_id", "text", cfg,
        spanIndex = Some(Array(1L, 2L)), spanIndexDir = Some(idxDir))
    }
    assert(ex.getMessage.contains("not both"), ex.getMessage)
  }

  test("C4 rule gate runs stateless inside a stream; survivors and " +
      "rewritten text == the batch stage") {
    val tmp = Files.createTempDirectory("graft-c4stream-").toString
    val docs = Seq(
      (1L, "First good sentence right here. Second good sentence follows on.", "s0"),
      (2L, "no terminal punctuation line", "s1"),
      (3L, "Enable javascript for this page. More fine text would not save it.", "s2"),
      (4L, "A brace { appears here. Plus another good sentence too.", "s3"),
      (5L, "Single sentence only here.", "s4"))
      .toDF("doc_id", "text", "source")
    docs.write.parquet(s"$tmp/in")
    val cfg = graft.operators.Curate.Config(
      c4MinSentences = Some(2), exactDedup = false)
    val stream = spark.readStream
      .schema(docs.schema).option("maxFilesPerTrigger", "1").parquet(s"$tmp/in")
    val gated = StreamCuration.run(stream, "doc_id", "text", cfg)
    assert(gated.isStreaming)
    val q = gated.writeStream.format("memory").queryName("c4_out")
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", s"$tmp/ckpt").start()
    q.awaitTermination(120000)
    val streamed = spark.table("c4_out")
      .select("doc_id", "text", "source").orderBy("doc_id")
      .as[(Long, String, String)].collect().toSeq
    val batch = graft.operators.Curate.run(docs, "doc_id", "text", cfg)
      .select("doc_id", "text", "source").orderBy("doc_id")
      .as[(Long, String, String)].collect().toSeq
    assert(streamed === batch)
    // only doc 1 passes: 2 has no terminal punct, 3 is a javascript
    // line (its whole text is one line), 4 has a brace, 5 one sentence
    assert(streamed.map(_._1) === Seq(1L))
    assert(streamed.head._3 === "s0") // rider column survived the gate
  }

  test("exactDedupKey=folded streams: unicode republications dedup " +
      "within the watermark, survivors == batch count") {
    import graft.operators.Curate
    val tmp = Files.createTempDirectory("graft-foldstream-").toString
    // NFC / NFD / stripped variants of one text (byte-distinct, folded
    // equal) + one genuinely distinct doc — the multilingual key live
    val docs = Seq(
      (1L, "Caf\u00e9 menu today", 100L),  // NFC
      (2L, "Cafe\u0301 menu today", 200L), // NFD
      (3L, "cafe menu today", 300L),
      (4L, "a wholly different doc", 400L))
      .toDF("doc_id", "text", "ts")
    docs.write.parquet(s"$tmp/in")
    val stream = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$tmp/in")
    val cfg = Curate.Config(exactDedup = true, exactDedupKey = "folded")
    val q = StreamCuration.run(stream, "doc_id", "text", cfg,
        keepFirst = Some(("ts", "10 seconds")))
      .writeStream.format("memory").queryName("fold_out")
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", s"$tmp/ckpt").start()
    q.awaitTermination(120000)
    val streamed = spark.table("fold_out").select("doc_id")
      .as[Long].collect().sorted.toSeq
    // keep-first is arrival-order on the fold group {1,2,3}; the pinned
    // contract (the Config-driven test's discipline): one survivor from
    // the group, plus the distinct doc
    assert(streamed.size === 2, s"got $streamed")
    assert(streamed.toSet.intersect(Set(1L, 2L, 3L)).size === 1)
    assert(streamed.contains(4L))
    // batch twin through the same entry keeps min-id deterministically
    val batch = StreamCuration.run(docs, "doc_id", "text", cfg,
        keepFirst = Some(("ts", "10 seconds")))
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(batch === Seq(1L, 4L))
  }
}
