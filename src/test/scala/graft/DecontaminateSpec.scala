package graft

import org.apache.spark.sql.functions._

import graft.operators.Decontaminate

/** Fixture-driven checks for the benchmark-decontamination pass: known
  * overlaps, the minShared boundary, the short-doc/empty-text whole-text
  * fallback inherited from ngramsOfTokens, and the broadcast plan shape.
  * (Oracle parity over real data is q50_decontaminate.)
  */
class DecontaminateSpec extends SparkSpec {
  import spark.implicits._

  // corpus doc 1 shares the 3-gram "x y z" with bench doc 10 once; doc 2
  // shares two distinct grams ("x y z" and "y z w"); doc 3 shares nothing
  private def corpus = Seq(
    (1L, "a b x y z c"),
    (2L, "p x y z w q"),
    (3L, "entirely disjoint words here")
  ).toDF("doc_id", "text")

  private def bench = Seq(
    (10L, "x y z w")
  ).toDF("doc_id", "text")

  test("sharedGramCounts counts distinct shared grams per corpus doc") {
    val got = Decontaminate.sharedGramCounts(corpus, bench, "doc_id", "text", n = 3)
      .orderBy("doc_id").as[(Long, Long)].collect().toSeq
    // bench 10 grams: {x y z, y z w}; doc 1 shares 1, doc 2 shares 2
    assert(got === Seq((1L, 1L), (2L, 2L)))
  }

  test("minShared boundary keeps >= and drops <") {
    val flagged = Decontaminate.sharedGramCounts(corpus, bench, "doc_id", "text",
      n = 3, minShared = 2).orderBy("doc_id").as[(Long, Long)].collect().toSeq
    assert(flagged === Seq((2L, 2L)))
  }

  test("cleanCorpus anti-joins the flag list, preserving all columns") {
    val clean = Decontaminate.cleanCorpus(corpus, bench, "doc_id", "text", n = 3)
    assert(clean.columns.toSeq === Seq("doc_id", "text"))
    assert(clean.select("doc_id").as[Long].collect().toSeq === Seq(3L))
    // minShared=2 spares doc 1 (only one shared gram)
    val clean2 = Decontaminate.cleanCorpus(corpus, bench, "doc_id", "text",
      n = 3, minShared = 2)
    assert(clean2.select("doc_id").orderBy("doc_id").as[Long].collect().toSeq
      === Seq(1L, 3L))
  }

  test("short docs fall back to the whole text as one gram (ngramsOfTokens rule)") {
    val shortCorpus = Seq((1L, "x y"), (2L, "only")).toDF("doc_id", "text")
    val shortBench = Seq((10L, "x y"), (11L, "lone")).toDF("doc_id", "text")
    // "x y" has < 3 tokens -> the single gram is the whole text; it matches
    // the identically-short bench doc. "only" matches nothing.
    val got = Decontaminate.sharedGramCounts(shortCorpus, shortBench, "doc_id", "text", n = 3)
      .orderBy("doc_id").as[(Long, Long)].collect().toSeq
    assert(got === Seq((1L, 1L)))
  }

  test("empty/whitespace-only texts collide on the empty gram, not crash") {
    val c = Seq((1L, ""), (2L, "   "), (3L, "real content that stays")).toDF("doc_id", "text")
    val b = Seq((10L, "")).toDF("doc_id", "text")
    // trim -> "" -> tokens [""] -> whole-text fallback gram "" on both
    // sides: empty corpus docs are flagged against an empty bench doc —
    // the desired outcome (empty training docs are droppable noise anyway)
    val got = Decontaminate.sharedGramCounts(c, b, "doc_id", "text", n = 3)
      .orderBy("doc_id").as[(Long, Long)].collect().toSeq
    assert(got === Seq((1L, 1L), (2L, 1L)))
  }

  test("bench gram set broadcasts — no shuffle of the corpus for the probe join") {
    val plan = Decontaminate.sharedGramCounts(corpus, bench, "doc_id", "text", n = 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(3000))
  }

  // semantic decontamination: planted geometry — vec 1 IS a bench vector
  // (cos 1), vec 2 is a scaled copy (cos 1: scale-invariant), vec 3 is a
  // slightly-jittered near-paraphrase, vec 4 is orthogonal, vec 5 is zero
  private def vecs = Seq(
    (1L, Seq(1.0f, 0.0f, 0.0f, 0.0f)),
    (2L, Seq(3.0f, 0.0f, 0.0f, 0.0f)),
    (3L, Seq(0.99f, 0.1f, 0.0f, 0.0f)),
    (4L, Seq(0.0f, 1.0f, 0.0f, 0.0f)),
    (5L, Seq(0.0f, 0.0f, 0.0f, 0.0f))
  ).toDF("vec_id", "embedding")

  test("semanticFlags: exact copies, scaled copies and paraphrases flag; orthogonal and zero do not") {
    val benchV = Seq(Seq(1.0, 0.0, 0.0, 0.0))
    val got = Decontaminate.semanticFlags(vecs, "vec_id", "embedding",
        benchV, tau = 0.95)
      .orderBy("vec_id")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(got.keySet == Set(1L, 2L, 3L), s"flags: $got")
    assert(got(1L) == 1.0 && got(2L) == 1.0)
    assert(got(3L) > 0.95 && got(3L) < 1.0)
  }

  test("semanticFlags is a row-local scan: zero Exchange, no join") {
    val plan = Decontaminate.semanticFlags(vecs, "vec_id", "embedding",
        Seq(Seq(1.0, 0.0, 0.0, 0.0)), tau = 0.9)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange") && !plan.contains("Join"),
      plan.take(2000))
  }

  test("inline gate == join form on the real corpus; row-local plan") {
    val docs = graft.core.Tables.documents(spark, sf0001)
    val bench = docs.where(col("doc_id") % 17 === 0)
      .select(col("doc_id"), col("text"))
    val joinForm = Decontaminate.cleanCorpus(docs, bench, "doc_id", "text",
        n = 8, minShared = 2)
      .select("doc_id").as[Long].collect().sorted.toSeq
    val grams = Decontaminate.benchGramSet(bench, "doc_id", "text", n = 8)
    val inline = Decontaminate.cleanCorpusInline(docs, grams, "text",
      n = 8, minShared = 2)
    assert(inline.select("doc_id").as[Long].collect().sorted.toSeq
      === joinForm)
    // the inline gate is what a STREAM runs: no join, no aggregation
    val plan = inline.queryExecution.executedPlan.toString
    assert(!plan.contains("Join") && !plan.contains("HashAggregate"),
      plan.take(2000))
  }

  test("evalLeakageReport covers the whole benchmark with per-item counts") {
    val bench2 = Seq(
      (10L, "x y z w"),                       // leaked: grams hit docs 1 and 2
      (11L, "never seen anywhere at all")     // clean eval item
    ).toDF("doc_id", "text")
    val got = Decontaminate.evalLeakageReport(corpus, bench2,
        "doc_id", "text", n = 3)
      .orderBy("doc_id")
      .as[(Long, Long, Long, Long, Boolean)].collect().toSeq
    // bench 10 grams: "x y z" (in corpus docs 1, 2) and "y z w" (doc 2)
    // -> 2 leaking docs, 2 leaked grams of its 2
    assert(got === Seq(
      (10L, 2L, 2L, 2L, true),
      (11L, 3L, 0L, 0L, false)))
  }

  test("evalLeakageReport is consistent with the corpus-side flag list") {
    // symmetry: the benchmark has a leaked item iff sharedGramCounts
    // flags at least one corpus doc (both count the same collisions)
    val leakedAny = Decontaminate.evalLeakageReport(corpus, bench,
      "doc_id", "text", n = 3).where(col("leaked")).count() > 0
    val flaggedAny = Decontaminate.sharedGramCounts(corpus, bench,
      "doc_id", "text", n = 3).count() > 0
    assert(leakedAny === flaggedAny)
  }
}
