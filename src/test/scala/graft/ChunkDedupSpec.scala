package graft

import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._
import graft.operators.Dedup

/** Chunk-level substring dedup: fixture-driven semantics (which chunks
  * drop, reassembly order, fully-boilerplate docs) plus the chunking
  * helper's edge cases. Oracle parity over real data is q52_chunk_dedup.
  */
class ChunkDedupSpec extends SparkSpec {
  import spark.implicits._

  test("chunksOfTokens: non-overlapping, ragged tail, short-text fallback") {
    val df = Seq(
      ("a b c d e"),   // k=2 -> ["a b", "c d", "e"]
      ("a"),           // 1 token -> ["a"]
      ("")             // empty -> [""] (split of "" is [""]; 1 chunk)
    ).toDF("text")
    val got = df.select(chunksOfTokens(wsTokens(col("text")), 2).as("c"))
      .as[Seq[String]].collect().toSeq
    assert(got === Seq(Seq("a b", "c d", "e"), Seq("a"), Seq("")))
  }

  // doc 1 and 2 share chunk "x x"; doc 3 is disjoint; doc 4 repeats "x x"
  // twice WITHIN itself only (df=1 -> kept); doc 5 is pure boilerplate
  private def docs = Seq(
    (1L, "x x a a"),
    (2L, "x x b b"),
    (3L, "c c d d"),
    (4L, "y y y y"),
    (5L, "x x")
  ).toDF("doc_id", "text")

  test("cross-doc chunks drop, within-doc repeats survive, order preserved") {
    val got = Dedup.chunkDedup(docs, "doc_id", "text", k = 2)
      .orderBy("doc_id").as[(Long, Long, Long, String)].collect().toSeq
    assert(got === Seq(
      (1L, 2L, 1L, "a a"),
      (2L, 2L, 1L, "b b"),
      (3L, 2L, 0L, "c c d d"),
      (4L, 2L, 0L, "y y y y"),
      (5L, 1L, 1L, "")))   // fully-boilerplate doc stays, empty
  }

  test("maxDocFreq raises the boilerplate bar") {
    // df("x x") = 3 docs; maxDocFreq=3 tolerates it -> nothing drops
    val got = Dedup.chunkDedup(docs, "doc_id", "text", k = 2, maxDocFreq = 3)
      .agg(sum("n_dropped")).as[Long].head()
    assert(got === 0L)
  }

  test("plan: no cartesian/nested-loop — hash shuffles only") {
    val plan = Dedup.chunkDedup(docs, "doc_id", "text", k = 2)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      plan.take(3000))
  }

  test("keep-first: earliest occurrence survives, later copies drop") {
    val got = Dedup.chunkDedupKeepFirst(docs, "doc_id", "text", k = 2)
      .orderBy("doc_id").as[(Long, Long, Long, String)].collect().toSeq
    assert(got === Seq(
      (1L, 2L, 0L, "x x a a"),   // first owner of "x x" keeps it
      (2L, 2L, 1L, "b b"),       // later copy removed
      (3L, 2L, 0L, "c c d d"),
      (4L, 2L, 1L, "y y"),       // within-doc repeat collapses to first
      (5L, 1L, 1L, "")))         // "x x" already owned by doc 1
  }

  test("keep-first preserves content: every distinct chunk survives once") {
    val cleaned = Dedup.chunkDedupKeepFirst(docs, "doc_id", "text", k = 2)
    val survivors = cleaned.where(col("clean_text") =!= "")
      .select(explode(chunksOfTokens(wsTokens(col("clean_text")), 2)).as("c"))
      .groupBy("c").count().collect()
    // exactly the corpus's distinct chunks, each exactly once
    val distinctChunks = docs
      .select(explode(chunksOfTokens(wsTokens(col("text")), 2)).as("c"))
      .distinct().count()
    assert(survivors.length.toLong == distinctChunks)
    survivors.foreach(r => assert(r.getLong(1) == 1L, r.toString))
  }

  test("keep-first guard: pos past posCap fails loud, not mis-ranked") {
    val long = (1 to 12).map(_ => "t").mkString(" ")
    val e = intercept[Exception] {
      Dedup.chunkDedupKeepFirst(Seq((1L, long)).toDF("doc_id", "text"),
        "doc_id", "text", k = 2, posCap = 4).collect()
    }
    assert(e.getMessage != null)
  }
}
