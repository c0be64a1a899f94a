package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dsir, Sampling}

class DsirSpec extends SparkSpec {
  import spark.implicits._

  // Planted corpus: "science" docs share a distinctive vocabulary,
  // "noise" docs another; one mixed doc sits between. Target = science.
  private def corpus = Seq(
    (0L, "quantum field theory predicts particle decay", "sci"),
    (1L, "quantum entanglement violates local realism", "sci"),
    (2L, "particle accelerators probe quantum structure", "sci"),
    (3L, "buy cheap pills online casino bonus", "spam"),
    (4L, "casino bonus free spins buy now", "spam"),
    (5L, "cheap online casino free bonus pills", "spam"),
    (6L, "quantum casino theory bonus", "mixed"))
    .toDF("doc_id", "text", "kind")

  private val B = 512
  private val SCALE = 10000L

  test("grams keeps multiplicity and handles one-token docs") {
    val g = Seq((1L, "a b a"), (2L, "solo"))
      .toDF("id", "text")
      .select(col("id"), Dsir.grams(split(col("text"), "\\s+")).as("g"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(g(1L) == Seq("a", "b", "a", "a b", "b a"))
    assert(g(2L) == Seq("solo"))
  }

  test("bucketScoreTable: bounded output, raw >= target, unseen default") {
    val t = Dsir.bucketScoreTable(corpus, "text", col("kind") === "sci",
      B, SCALE).collect()
    assert(t.length <= B)
    t.foreach { r =>
      val (rc, tc, score) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(tc <= rc)
      assert(score == (tc + 1) * SCALE / (rc + 1))
    }
    val arr = Dsir.collectScores(
      Dsir.bucketScoreTable(corpus, "text", col("kind") === "sci", B, SCALE),
      B, SCALE)
    assert(arr.length == B)
    // buckets untouched by the corpus keep the smoothed default
    val seen = t.map(_.getLong(0).toInt).toSet
    (0 until B).filterNot(seen).foreach(b => assert(arr(b) == SCALE))
  }

  test("integer scorer ranks target-like docs above noise, mixed between") {
    val table = Dsir.bucketScoreTable(corpus, "text", col("kind") === "sci",
      B, SCALE)
    val scores = Dsir.collectScores(table, B, SCALE)
    val w = Dsir.importanceWeights(corpus, "doc_id", "text", scores)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    val sci = Seq(0L, 1L, 2L).map(w)
    val spam = Seq(3L, 4L, 5L).map(w)
    assert(sci.min > w(6L), s"science docs must outrank the mixed doc: $w")
    assert(w(6L) > spam.max, s"mixed doc must outrank spam: $w")
  }

  test("paper log scorer agrees with the integer scorer on separated corpora") {
    val table = Dsir.bucketScoreTable(corpus, "text", col("kind") === "sci",
      B, SCALE)
    val lw = Dsir.logImportanceWeights(corpus, "doc_id", "text", table, B)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val sci = Seq(0L, 1L, 2L).map(lw)
    val spam = Seq(3L, 4L, 5L).map(lw)
    assert(sci.min > lw(6L) && lw(6L) > spam.max,
      s"log-ratio ranking must separate sci > mixed > spam: $lw")
  }

  test("codegen DsirWeight kernel is bit-identical to the declarative fold") {
    // real corpus + the planted one, full (n_grams, weight) rows
    val real = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    for (df <- Seq(corpus.withColumnRenamed("kind", "lang"), real)) {
      val table = Dsir.bucketScoreTable(df, "text", col("lang") === "en", B, SCALE)
      val scores = Dsir.collectScores(table, B, SCALE)
      val fast = Dsir.importanceWeights(df, "doc_id", "text", scores)
        .orderBy("doc_id").collect().map(_.toString).toSeq
      val fold = Dsir.importanceWeightsFold(df, "doc_id", "text", scores)
        .orderBy("doc_id").collect().map(_.toString).toSeq
      assert(fast === fold)
    }
  }

  test("scoring scan is row-local: zero Exchange in the weights plan") {
    val scores = Array.fill[Long](B)(SCALE)
    val plan = Dsir.importanceWeights(corpus, "doc_id", "text", scores)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"weights pass must not shuffle:\n$plan")
  }

  test("select: reproducible priority resample, deterministic across runs") {
    val a = Dsir.select(corpus, "doc_id", "text", col("kind") === "sci",
      n = 3, buckets = B, scale = SCALE).collect()
    val b = Dsir.select(corpus, "doc_id", "text", col("kind") === "sci",
      n = 3, buckets = B, scale = SCALE).collect()
    assert(a.map(_.toString).toSeq == b.map(_.toString).toSeq)
    assert(a.length == 3)
    // winners carry the exact integer priority of the JVM mirror
    val w = Dsir.importanceWeights(corpus, "doc_id", "text",
      Dsir.collectScores(Dsir.bucketScoreTable(corpus, "text",
        col("kind") === "sci", B, SCALE), B, SCALE))
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    a.foreach { r =>
      val (id, pri) = (r.getLong(0), r.getLong(4))
      assert(pri == jvmPriority("dsir:rs:", id, w(id)))
    }
  }

  test("priorityTopN matches a JVM mirror and rejects overflow weights") {
    val df = Seq((1L, 100L), (2L, 7L), (3L, 4000L), (4L, 250L))
      .toDF("id", "w")
    val got = Sampling.priorityTopN(df, "id", "w", 2, salt = "t:")
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    val want = Seq(1L -> 100L, 2L -> 7L, 3L -> 4000L, 4L -> 250L)
      .map { case (id, w) => (id, jvmPriority("t:", id, w)) }
      .sortBy { case (id, p) => (-p, id) }.take(2)
    assert(got.toSeq == want)
    val bad = Seq((1L, 1L << 31)).toDF("id", "w")
    val e = intercept[Exception] {
      Sampling.priorityTopN(bad, "id", "w", 1).collect()
    }
    assert(e.getMessage != null)
  }

  test("score table is an Ivm view: merge(base, delta) == full recompute") {
    import graft.operators.Ivm
    val base = corpus.where(col("doc_id") < 4)
    val delta = corpus.where(col("doc_id") >= 4)
    val merged = Ivm.mergeStates(Seq(
        Ivm.aggState(Dsir.gramBuckets(base, "text", col("kind") === "sci", B),
          Seq("bucket"), "is_target"),
        Ivm.aggState(Dsir.gramBuckets(delta, "text", col("kind") === "sci", B),
          Seq("bucket"), "is_target")),
      Seq("bucket"))
    val got = Dsir.scoresFromState(merged, SCALE)
      .select("bucket", "rc", "tc", "score")
      .orderBy("bucket").collect().map(_.toString).toSeq
    val want = Dsir.bucketScoreTable(corpus, "text", col("kind") === "sci",
        B, SCALE)
      .select("bucket", "rc", "tc", "score")
      .orderBy("bucket").collect().map(_.toString).toSeq
    assert(got == want)
  }

  test("streamed score view trails a doc stream and matches batch scores") {
    import java.nio.file.Files
    import graft.operators.Ivm
    import graft.streaming.StreamIvm
    val base = corpus.where(col("doc_id") < 3)
    val delta = corpus.where(col("doc_id") >= 3)
    val viewDir = Files.createTempDirectory("dsir-view").toString
    Ivm.buildAggView(
      Dsir.gramBuckets(base, "text", col("kind") === "sci", B),
      Seq("bucket"), "is_target", viewDir)
    val deltaDir = Files.createTempDirectory("dsir-delta").toString
    delta.repartition(2).write.mode("overwrite").parquet(deltaDir)
    val q = StreamIvm.maintain(
      Dsir.gramBuckets(
        spark.readStream.schema(delta.schema)
          .option("maxFilesPerTrigger", "1").parquet(deltaDir),
        "text", col("kind") === "sci", B),
      Seq("bucket"), "is_target", viewDir,
      Files.createTempDirectory("dsir-ckpt").toString)
    q.awaitTermination(120000)
    val got = Dsir.scoresFromState(Ivm.readAggView(spark, viewDir), SCALE)
      .select("bucket", "score").orderBy("bucket")
      .collect().map(_.toString).toSeq
    val want = Dsir.bucketScoreTable(corpus, "text", col("kind") === "sci",
        B, SCALE)
      .select("bucket", "score").orderBy("bucket")
      .collect().map(_.toString).toSeq
    assert(got == want)
  }

  private def jvmPriority(salt: String, id: Long, w: Long): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$salt$id".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val u = java.lang.Long.parseLong(hex.substring(24, 32), 16)
    (w * 4294967296L) / (u + 1L)
  }
}
