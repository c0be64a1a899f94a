package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.Trigger

import graft.multimodal.Multimodal
import graft.operators.Knn
import graft.store.VectorStore
import graft.streaming.WalStream

/** End-to-end drive of the engine's library surface: keyed vector store
  * (put/overwrite/delete/compact/recover/search), the WAL as a live stream
  * (streaming LWW), and multimodal ingest → features. Prints observable
  * state at each step; used as the runnable example of the full write path.
  */
object Demo {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.local(4)
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    println("== SQL surface via GraftExtensions:")
    spark.sql(
      """SELECT vec_l2sq(array(0.0d, 3.0d), array(4.0d, 0.0d)) AS l2sq,
        |       rolling_hash('ab') AS fp""".stripMargin).show(false)

    val dir = Files.createTempDirectory("graft-demo-").toString
    println(s"== store at $dir")
    val store = new VectorStore(spark, dir, dim = 4)

    val b1 = Seq(
      ("cat", Array(1f, 0f, 0f, 0f), Map("tag" -> "animal"), 100L),
      ("dog", Array(0f, 1f, 0f, 0f), Map("tag" -> "animal"), 100L),
      ("car", Array(0f, 0f, 1f, 0f), Map("tag" -> "thing"), 100L),
      ("bad", Array(1f, 2f), Map.empty[String, String], 100L) // wrong dim
    ).toDF("key", "vector", "metadata", "ts")
    val (ok, rej) = store.put(b1)
    println(s"== put batch1: accepted=$ok rejected=$rej (dim validation)")

    store.put(Seq(("cat", Array(0.9f, 0.1f, 0f, 0f), Map("tag" -> "animal"), 200L))
      .toDF("key", "vector", "metadata", "ts"))
    store.delete(Seq("car"), ts = 300L)
    println("== after overwrite cat + delete car:")
    store.scan.orderBy("key").show(false)

    println("== knn search q=[1,0,0,0] filter tag=animal:")
    store.search(Knn.SearchRequest(Array(1.0, 0.0, 0.0, 0.0), topK = 2,
      filter = Map("tag" -> "animal"))).show(false)

    store.compact()
    val listing = Files.list(Paths.get(dir))
    try println(s"== compacted; snapshots: " +
      listing.toArray.map(_.toString.split('/').last).sorted.mkString(", "))
    finally listing.close()

    store.put(Seq(("eel", Array(0f, 0f, 0f, 1f), Map("tag" -> "animal"), 400L))
      .toDF("key", "vector", "metadata", "ts"))
    val reopened = new VectorStore(spark, dir, dim = 4)
    println("== cold reopen (snapshot + incremental WAL replay):")
    reopened.scan.orderBy("key").show(false)

    println("== streaming LWW over the same WAL dir:")
    val q = WalStream.lwwUpdates(WalStream.source(spark, s"$dir/wal"))
      .writeStream.format("memory").queryName("lww")
      .outputMode("append").trigger(Trigger.AvailableNow())
      .option("checkpointLocation", s"$dir/stream_ckpt").start()
    q.awaitTermination(60000)
    spark.table("lww").orderBy("key", "timestamp").show(false)

    println("== ANN tiers on real embeddings (exact | IVF | RP-LSH | MLlib LSH):")
    val sf = "/root/testdata/sf0.001"
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val qv = graft.queries.CoreQueries.queryVec(spark, sf)
    val exact = graft.operators.Knn.search(emb, "vec_id", "embedding", qv, 5)
    val mllib = graft.operators.SimilaritySearch.mllibLshTopK(
      emb, "vec_id", "embedding", queryId = 0L, k = 5)
    val ivf = graft.operators.SimilaritySearch.ivfTopK(
      emb, "vec_id", "embedding", org.apache.spark.sql.functions.col("vec_id") < 8, 0L, 5)
    println("-- exact:");  exact.show(false)
    println("-- mllib lsh (2k over-fetch, exact re-rank):"); mllib.show(false)
    println("-- ivf nprobe=1:"); ivf.show(false)
    val exactIds  = exact.collect().map(_.getLong(0)).toSet
    val mllibIds  = mllib.collect().map(_.getLong(0)).toSet
    println(f"-- recall@5 mllib-vs-exact: ${(exactIds intersect mllibIds).size / 5.0}%.2f")

    println("== continuous KNN serving: stream of query vectors -> top-3 each:")
    val qtmp = Files.createTempDirectory("graft-demo-qserve-").toString
    emb.where(org.apache.spark.sql.functions.col("vec_id").isin(0L, 42L))
      .select(org.apache.spark.sql.functions.col("vec_id").as("qid"),
        org.apache.spark.sql.functions.col("embedding").as("qvec"))
      .write.parquet(s"$qtmp/queries")
    val qstream = spark.readStream
      .schema(spark.read.parquet(s"$qtmp/queries").schema)
      .parquet(s"$qtmp/queries")
    val served = graft.streaming.QueryStream.serve(
      qstream, emb, "vec_id", "embedding", k = 3,
      trigger = Trigger.AvailableNow()) { (answers, epoch) =>
        println(s"-- micro-batch $epoch answers:")
        answers.orderBy("qid", "score", "id").show(false)
      }
    val sq = served.option("checkpointLocation", s"$qtmp/ckpt").start()
    sq.awaitTermination(60000)

    println("== skew-salted two-phase aggregation vs direct groupBy:")
    val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    graft.operators.Skew.saltedCountSum(ev, "event_type", "value",
      org.apache.spark.sql.functions.col("event_id"), salts = 8)
      .orderBy("event_type").show(false)
    println("-- salts=1 degenerate case (single bucket, same totals):")
    graft.operators.Skew.saltedCountSum(ev, "event_type", "value",
      org.apache.spark.sql.functions.col("event_id"), salts = 1)
      .orderBy("event_type").show(false)

    // the media demo uses the reference checkout's sample images; skip
    // gracefully when that artifact isn't present
    val refMediaDir = Paths.get("/root/reference/test_data")
    if (Files.isDirectory(refMediaDir)) {
      println("== multimodal: binaryFile ingest of REAL JPEGs -> decoded pooled features")
      val mdir = Files.createTempDirectory("graft-demo-media-")
      // stage the reference's sample images under non-hidden names (Spark's
      // file index skips '_'-prefixed files)
      val refMedia = java.nio.file.Files.list(refMediaDir)
      try refMedia.forEach { p =>
        val clean = p.getFileName.toString.dropWhile(_ == '_')
        Files.copy(p, mdir.resolve(clean))
      } finally refMedia.close()
      Files.write(mdir.resolve("readme.txt"), "not media".getBytes)
      val media = Multimodal.readMediaDir(spark, mdir.toString)
        .as[Multimodal.MediaRecord]
      val feats = Multimodal.extractFeatures(media, dim = 12)
      feats.select("key", "width", "height", "nBytes", "features").show(false)

      println("== put_image -> text_search composition (F4/F5):")
      val mstore = new VectorStore(spark, Files.createTempDirectory("graft-demo-imgstore-").toString, dim = 12)
      mstore.put(feats.select($"key", $"features".as("vector"),
        org.apache.spark.sql.functions.map(
          org.apache.spark.sql.functions.lit("w"), $"width".cast("string")).as("metadata"),
        org.apache.spark.sql.functions.lit(1L).as("ts")))
      val qtext = Multimodal.textFeatures("sample query text", dim = 12)
      mstore.search(Knn.SearchRequest(qtext.map(_.toDouble), topK = 3)).show(false)
    } else println(s"== multimodal demo skipped ($refMediaDir not present)")

    println("== curation pipeline: scrub -> chunk dedup -> decontaminate -> BPE")
    val corpus = Seq(
      (1L, "visit https://spam.example/x then the quick brown fox jumps over the lazy dog"),
      (2L, "mail me@crawl.org then the quick brown fox jumps over the lazy dog"),
      (3L, "entirely original prose about distributed query engines and columnar scans"),
      (4L, "benchmark question: what is the capital of france paris obviously")
    ).toDF("doc_id", "text")
    val bench = Seq((100L, "what is the capital of france")).toDF("doc_id", "text")
    val scrubbed = graft.operators.Scrub.scrub(corpus, "text")
      .select($"doc_id", $"redacted".as("text"))
    println("-- scrubbed (PII -> tokens):"); scrubbed.show(false)
    val deduped = graft.operators.Dedup.chunkDedup(scrubbed, "doc_id", "text", k = 4)
    println("-- chunk dedup (shared 4-token chunks cut):")
    deduped.show(false)
    val clean = graft.operators.Decontaminate.cleanCorpus(
      deduped.select($"doc_id", $"clean_text".as("text")), bench,
      "doc_id", "text", n = 5)
    println("-- decontaminated vs bench set (doc 4 drops):"); clean.show(false)
    val merges = graft.operators.Bpe.train(clean, "text", numMerges = 8)
    println(s"-- BPE merges learned on the clean corpus: " +
      merges.map(m => s"${m.a}+${m.b}").mkString(", "))

    println("== Curate.run: the whole pipeline as one config-driven call")
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    // ONE config drives both the run and the explain below — the fates
    // always attribute exactly the pipeline being shown
    val demoCfg = graft.operators.Curate.Config(
      exactDedup = true,
      blocklist = Seq("error", "slow"),
      repetitionRules = true, // Gopher §A1.1 gates — shows as 'repetition' fates
      minTokens = 30L,
      dsirTarget = Some($"lang" === "en"), dsirTopN = 8,
      dsirBuckets = 1024,
      curriculumBandWidth = Some(25L))
    val curated = graft.operators.Curate.run(docs, "doc_id", "text", demoCfg)
    println("-- top-8 most-English survivors in curriculum order:")
    curated.orderBy("ord")
      .select($"ord", $"doc_id", $"lang", $"band", $"mean_score").show(false)

    println("== Curate.explain: why is each doc in (or out of) the set?")
    val fates = graft.operators.Curate.explain(docs, "doc_id", "text",
      demoCfg)
    println("-- fate distribution (first rejecting stage per doc):")
    fates.groupBy("fate").count().orderBy($"count".desc).show(false)

    println("== incremental span dedup: today's data vs yesterday's index")
    val yesterday = docs.where($"doc_id" < 250)
    val today = docs.where($"doc_id" >= 250)
    val spanIdx = graft.operators.Dedup.dupSpanIndex(yesterday, "text", n = 8)
    println(s"-- frozen index: ${spanIdx.length} distinct 8-token windows")
    val scrubbedToday = graft.operators.Dedup.dupSpanScrubInline(
      today, "doc_id", "text", n = 8, spanIdx)
    println("-- today's docs with passages already in yesterday's corpus:")
    scrubbedToday.where($"removed_tokens" > 0)
      .select($"doc_id", $"n_tokens", $"n_spans", $"removed_tokens")
      .orderBy($"removed_tokens".desc).show(5, false)

    spark.stop()
  }
}
