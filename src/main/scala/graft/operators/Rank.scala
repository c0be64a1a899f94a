package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Lexical relevance ranking and rank fusion — the keyword half of hybrid
  * search. The reference ranks purely by vector distance
  * (`src/datanode/handler.py:364` top-k over embeddings); production
  * retrieval pairs that with BM25 over the raw text and fuses the two
  * rankings (reciprocal rank fusion), which is exactly the composition
  * a Spark engine expresses as two declarative plans + one outer join.
  *
  * Float discipline (FIXTURES.md): every per-document score is a fold in
  * a DETERMINISTIC order — per-term contributions are collected, sorted
  * by term, and summed left-to-right — so equal-stat documents get
  * bit-identical scores and ties break on id, in any engine. RRF scores
  * are built from integer ranks with one correctly-rounded division per
  * list and additions in list order, so they are bit-portable.
  */
object Rank {

  /** BM25 (Lucene-style idf) of `terms` over (`idCol`, `textCol`):
    * (id, score, n_hit, doc_len) for every document matching at least one
    * term. Tokenization is whitespace on the trimmed text, matching the
    * token-stats queries.
    *
    * Scale shape: the explode is filtered to the query terms immediately
    * (shuffle carries only matching (doc, term) rows, never the corpus's
    * token stream); document frequencies and corpus stats are single-row
    * or |terms|-row aggregates broadcast back. No UDFs; one shuffle for
    * tf, one broadcast join per side-table.
    */
  def bm25(docs: DataFrame, idCol: String, textCol: String,
      terms: Seq[String], k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty, "bm25: no query terms")
    require(terms.distinct == terms, "bm25: duplicate query terms")
    val toks = docs.select(col(idCol).as("id"),
        split(trim(col(textCol)), "\\s+").as("toks"))
      .select(col("id"), col("toks"), size(col("toks")).cast("long").as("dl"))
    val stats = toks.agg(count(lit(1)).as("n_docs"), sum("dl").as("sum_dl"))
    val tf = toks.select(col("id"), col("dl"), explode(col("toks")).as("tok"))
      .where(col("tok").isin(terms: _*))
      .groupBy(col("id"), col("dl"), col("tok"))
      .agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("tok").agg(count(lit(1)).as("df"))
    val contrib = tf.join(broadcast(dfreq), "tok")
      .crossJoin(broadcast(stats))
      .withColumn("avgdl",
        col("sum_dl").cast("double") / col("n_docs").cast("double"))
      .withColumn("idf", log(lit(1.0) +
        (col("n_docs").cast("double") - col("df").cast("double") + lit(0.5)) /
          (col("df").cast("double") + lit(0.5))))
      .withColumn("s",
        col("idf") * (col("tf").cast("double") * lit(k1 + 1.0)) /
          (col("tf").cast("double") +
            lit(k1) * (lit(1.0 - b) +
              lit(b) * col("dl").cast("double") / col("avgdl"))))
    contrib.groupBy(col("id"), col("dl"))
      .agg(
        aggregate(sort_array(collect_list(struct(col("tok"), col("s")))),
          lit(0.0), (acc, x) => acc + x("s")).as("score"),
        count(lit(1)).as("n_hit"))
      .select(col("id").as(idCol), col("score"), col("n_hit"),
        col("dl").as("doc_len"))
  }

  /** Reciprocal rank fusion: each input is a ranked list (`idCol`,
    * `rankCol` 1-based); output (id, rrf_score, rank_0..rank_{n-1}) with
    * rrf = Σ_i 1/(k + rank_i) over the lists containing the id, summed in
    * list order (absent lists contribute exactly 0.0). Full-outer joins:
    * an id ranked by ANY list is fused — the standard hybrid-search merge.
    */
  def rrf(lists: Seq[DataFrame], idCol: String, rankCol: String,
      k: Int = 60): DataFrame = {
    require(lists.nonEmpty, "rrf: no ranked lists")
    val tagged = lists.zipWithIndex.map { case (l, i) =>
      l.select(col(idCol).as("id"), col(rankCol).cast("long").as(s"rank_$i"))
    }
    val joined = tagged.reduce((a, b) => a.join(b, Seq("id"), "full_outer"))
    val score = lists.indices
      .map(i => coalesce(lit(1.0) / (lit(k.toDouble) + col(s"rank_$i").cast("double")), lit(0.0)))
      .reduce(_ + _) // left fold: list order, exact two-operand adds
    joined.select((col("id").as(idCol) +: score.as("rrf_score") +:
      lists.indices.map(i => col(s"rank_$i"))): _*)
  }

  /** 1-based rank column for a scored frame: row_number over
    * (`orderBy`…, `tieCol` asc) — the total order every ranked list needs
    * before fusion. The window is global, so call this AFTER cutting the
    * list to its top-L (`orderBy().limit(L)` → TakeOrderedAndProject);
    * ranking L rows on one partition is free, ranking a corpus is not.
    */
  def ranked(scored: DataFrame, tieCol: String, orderBy: Column*): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .orderBy((orderBy :+ col(tieCol).asc): _*)
    scored.withColumn("rank", row_number().over(w).cast("long"))
  }

  /** MAJORITY-VOTE label aggregation — the annotation-consolidation step
    * of a labeling pipeline (N raters / N weak classifiers per item →
    * one training label): per key, the label with the most votes;
    * deterministic tie-break to the lexicographically smallest label so
    * the consolidated set is bit-portable across engines (an arbitrary
    * max_by would flake under ties). Output: (key, label, n_votes,
    * total_votes) — total lets callers gate on agreement ratio
    * (n_votes·den ≥ num·total_votes, integers as always).
    *
    * Two bounded shuffles: a (key, label) hash-agg (map-side combined),
    * then a per-key window over ≤ |labels| rows — never over raw votes.
    */
  def majorityVote(votes: DataFrame, keyCol: String,
      labelCol: String): DataFrame = {
    val counts = votes.groupBy(col(keyCol), col(labelCol))
      .agg(count(lit(1)).as("n_votes"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol))
      .orderBy(col("n_votes").desc, col(labelCol).asc)
    counts
      .withColumn("total_votes",
        sum(col("n_votes")).over(
          org.apache.spark.sql.expressions.Window.partitionBy(col(keyCol))))
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1)
      .select(col(keyCol), col(labelCol), col("n_votes"), col("total_votes"))
  }
}
