package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._

/** Byte-pair-encoding tokenizer TRAINING — the real version of the
  * pipeline stage [[graft.functions.TextFunctions.bpeishTokens]] stands in
  * for (Sennrich et al. 2016): learn a merge table from corpus statistics,
  * then segment text with it.
  *
  * Scale shape (the standard one): BPE trains on the WORD-FREQUENCY
  * table, not the corpus — the distributed work is one hash-groupBy word
  * count (map-side combinable); the merge loop then runs driver-side over
  * the collected vocab, which is tiny by Zipf's law (unique words, not
  * tokens — bounded further by `maxVocab` most-frequent). Applying the
  * learned merges is a typed per-row map with the merge ranks broadcast:
  * embarrassingly parallel, no shuffle.
  *
  * Determinism: pair counts are exact integers; the argmax tie-breaks on
  * (count desc, pair lexicographic), so the merge table is a pure
  * function of the corpus.
  */
object Bpe {

  /** One learned merge: adjacent symbols `a`+`b` fuse (rank = position). */
  case class Merge(a: String, b: String)

  /** (word, cnt): the corpus word-frequency table — ONE shuffle. */
  def wordCounts(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(wsTokens(col(textCol))).as("word"))
      .where(col("word") =!= "")
      .groupBy("word").agg(count(lit(1)).as("cnt"))

  /** Learn `numMerges` merges from the corpus (driver loop over the
    * collected top-`maxVocab` word-frequency rows; stops early when no
    * pair reaches `minPairCount`).
    *
    * INCREMENTAL pair maintenance — the real trainer's loop shape: the
    * pair-count table is built once, and each merge round touches only
    * the words that actually CONTAIN the merged pair (tracked in an
    * inverted pair→words index), subtracting their old pair multiset and
    * re-adding the post-merge one. A full recount per round would be
    * O(rounds × corpus-vocab characters); this is O(rounds × affected
    * words + rounds × distinct-pairs argmax) — the difference between a
    * 20-merge demo and a 50k-merge production vocabulary. Output is
    * bit-identical to the naive recount (delta sums are exact integers;
    * zero-count pairs are REMOVED so the argmax never sees ghosts) —
    * property-pinned in BpeSpec against a naive reference loop.
    */
  def train(df: DataFrame, textCol: String, numMerges: Int,
      maxVocab: Int = 65536, minPairCount: Long = 2L): Seq[Merge] = {
    val vocab: Array[(Array[String], Long)] =
      wordCounts(df, textCol)
        .orderBy(col("cnt").desc, col("word").asc)
        .limit(maxVocab)
        .collect()
        .map(r => (r.getString(0).map(_.toString).toArray, r.getLong(1)))
    val words = vocab.map(_._1.toBuffer)
    val counts = vocab.map(_._2)

    val pairCounts = scala.collection.mutable.Map.empty[(String, String), Long]
    val pairWords = scala.collection.mutable.Map
      .empty[(String, String), scala.collection.mutable.Set[Int]]
    def addWord(i: Int, sign: Long): Unit = {
      val w = words(i)
      var j = 0
      while (j < w.length - 1) {
        val p = (w(j), w(j + 1))
        val c = pairCounts.getOrElse(p, 0L) + sign * counts(i)
        if (c == 0L) { pairCounts.remove(p); pairWords.remove(p) }
        else {
          pairCounts(p) = c
          if (sign > 0)
            pairWords.getOrElseUpdate(p,
              scala.collection.mutable.Set.empty[Int]) += i
        }
        j += 1
      }
      // occurrence-index removal happens lazily: a stale (pair → word)
      // entry just means one no-op visit next time the pair wins
    }
    words.indices.foreach(addWord(_, 1L))

    val merges = scala.collection.mutable.ArrayBuffer.empty[Merge]
    var round = 0
    while (round < numMerges && pairCounts.nonEmpty) {
      val ((a, b), best) = pairCounts.minBy { case ((x, y), c) => (-c, x, y) }
      if (best < minPairCount) return merges.toSeq
      merges += Merge(a, b)
      val fused = a + b
      val affected = pairWords.get((a, b)).map(_.toArray.sorted)
        .getOrElse(Array.empty[Int])
      affected.foreach { i =>
        val w = words(i)
        var contains = false
        var j = 0
        while (!contains && j < w.length - 1) {
          contains = w(j) == a && w(j + 1) == b; j += 1
        }
        if (contains) { // stale index entries skip
          addWord(i, -1L)
          var t = 0
          while (t < w.length - 1) {
            if (w(t) == a && w(t + 1) == b) { w(t) = fused; w.remove(t + 1) }
            else t += 1
          }
          addWord(i, 1L)
        }
      }
      round += 1
    }
    merges.toSeq
  }

  /** Segment one word with a learned merge table (lowest-rank merge first
    * — the standard BPE apply order, deterministic).
    */
  def segment(word: String, ranks: Map[(String, String), Int]): Seq[String] = {
    val syms = word.map(_.toString).toBuffer
    var done = false
    while (!done && syms.length > 1) {
      var bestRank = Int.MaxValue
      var bestAt = -1
      var j = 0
      while (j < syms.length - 1) {
        val r = ranks.getOrElse((syms(j), syms(j + 1)), Int.MaxValue)
        if (r < bestRank) { bestRank = r; bestAt = j }
        j += 1
      }
      if (bestAt < 0) done = true
      else { syms(bestAt) = syms(bestAt) + syms(bestAt + 1); syms.remove(bestAt + 1) }
    }
    syms.toSeq
  }

  /** (idCol, tokens ARRAY<STRING>): corpus tokenized with the learned
    * merges — typed per-row map (genuine imperative segmentation; the
    * merge table broadcasts with the closure), zero shuffle.
    */
  def tokenize(df: DataFrame, idCol: String, textCol: String,
      merges: Seq[Merge]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val ranks: Map[(String, String), Int] =
      merges.zipWithIndex.map { case (m, i) => (m.a, m.b) -> i }.toMap
    val ds: Dataset[(Long, String)] =
      df.select(col(idCol).cast("long"), col(textCol).cast("string"))
        .as[(Long, String)]
    ds.map { case (id, text) =>
      (id, text.trim.split("\\s+").toSeq.filter(_.nonEmpty)
        .flatMap(w => segment(w, ranks)))
    }.toDF(idCol, "tokens")
  }

  /** Persist a learned merge table as a versioned artifact (rank, a, b)
    * — the tokenizer-vocabulary lifecycle every other index in this
    * engine already has (IVF centroids, PQ codebooks, Ivm views):
    * train ONCE on the corpus snapshot, then every later job loads the
    * frozen vocabulary instead of retraining, which is both the cost
    * model (training scans the corpus; loading reads a KB) and the
    * correctness model (a mid-pipeline retrain on a moved corpus would
    * silently change every token count). Versioned dirs with parquet's
    * `_SUCCESS` gate — a torn write is never read, newest complete
    * version wins (the Ivm/VectorStore snapshot discipline).
    */
  def saveMerges(spark: org.apache.spark.sql.SparkSession,
      merges: Seq[Merge], path: String): Unit = {
    import spark.implicits._
    merges.zipWithIndex.map { case (m, i) => (i, m.a, m.b) }
      .toDF("rank", "a", "b")
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$path/v${Ivm.nextVersion(path)}")
  }

  /** Newest complete persisted merge table, in rank order. */
  def loadMerges(spark: org.apache.spark.sql.SparkSession,
      path: String): Seq[Merge] = {
    val v = Ivm.completeVersions(path)
    require(v.nonEmpty, s"no BPE vocabulary at $path — saveMerges first")
    val dir = Ivm.versionDirs(path).filter(_._1 == v.max).head._2
    spark.read.parquet(dir).orderBy("rank")
      .collect().map(r => Merge(r.getString(1), r.getString(2))).toSeq
  }

  /** DECLARATIVE tokenizer apply — the oracle-checkable twin of
    * [[tokenize]]: the document rides the plan as a wrapped-symbol
    * string (q88's `⟨sym⟩` trick: every symbol is `\u0001 sym \u0002`,
    * words separated by `\u0003` so no merge crosses a word boundary)
    * and each learned merge is ONE codegen `replace` — left-to-right
    * non-overlapping, exactly the SQL `replace` semantics, applied in
    * rank order. Zero shuffle, zero UDF, and any engine computing the
    * same replaces matches byte-for-byte — which is what lets q132
    * hash-pin BPE APPLY end-to-end (training oracle-pinned by q56).
    *
    * Rank-order-sequential apply equals [[segment]]'s
    * lowest-rank-first loop whenever no later merge manufactures an
    * earlier merge's symbol pair (true for tables learned from this
    * corpus — BpeSpec cross-checks the two paths token-for-token on
    * real data). Output: (idCol, n_bpe_tokens) — the per-document
    * token count under the learned vocabulary, the number a batch
    * packer or a cost model consumes.
    */
  def tokenizeInPlan(df: DataFrame, idCol: String, textCol: String,
      merges: Seq[Merge], keepCols: Seq[String] = Nil): DataFrame = {
    val (soh, stx, ws) = ("\u0001", "\u0002", "\u0003")
    val wrapWord = (w: org.apache.spark.sql.Column) =>
      when(length(w) === 0, lit("")).otherwise(
        array_join(transform(sequence(lit(1), greatest(length(w), lit(1))),
          i => concat(lit(soh), w.substr(i, lit(1)), lit(stx))), ""))
    val wrapped = array_join(
      transform(wsTokens(col(textCol)), wrapWord), ws)
    val applied = merges.foldLeft(wrapped)((s, m) =>
      replace(s, lit(soh + m.a + stx + soh + m.b + stx),
        lit(soh + m.a + m.b + stx)))
    val keep = keepCols.map(col)
    df.select(col(idCol) +: applied.as("__s") +: keep: _*)
      .select(col(idCol) +:
        (length(col("__s")) - length(replace(col("__s"), lit(soh), lit(""))))
          .cast("long").as("n_bpe_tokens") +: keep: _*)
  }
}
