package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._

/** Benchmark decontamination — the training-data hygiene pass that drops
  * corpus documents overlapping an evaluation/benchmark set (the exact
  * n-gram-collision discipline of published LLM data pipelines: any
  * training doc sharing a long-enough word n-gram with a benchmark doc is
  * flagged and removed before training).
  *
  * Scale shape: grams are hashed to 60-bit md5-derived Longs ([[md5Low60]]
  * — portable, oracle-reproducible), so the shuffle carries (id, gh)
  * pairs, never gram strings. The benchmark side is tiny by nature (eval
  * sets are thousands of docs, the corpus is billions) — its distinct
  * gram-hash set BROADCASTS, making the whole pass one corpus scan +
  * map-side hash join + one groupBy(id) shuffle. Hash collisions affect
  * both engines identically (both count distinct 60-bit values), so
  * results stay hash-matched.
  */
object Decontaminate {

  /** Per-corpus-doc count of distinct word-`n`-gram hashes shared with ANY
    * benchmark doc; docs with fewer than `minShared` drop. Output:
    * (idCol, n_shared) — the flag list; anti-join it back to the corpus
    * to produce the clean training set ([[cleanCorpus]]).
    */
  def sharedGramCounts(corpus: DataFrame, bench: DataFrame, idCol: String,
      textCol: String, n: Int, minShared: Int = 1): DataFrame = {
    val benchGrams = gramHashes(bench, idCol, textCol, n)
      .select(col("gh")).distinct()
    gramHashes(corpus, idCol, textCol, n)
      .join(broadcast(benchGrams), Seq("gh"))
      .groupBy(col(idCol))
      .agg(countDistinct(col("gh")).as("n_shared"))
      .where(col("n_shared") >= minShared)
  }

  /** Per-BENCHMARK-ITEM leakage report — [[sharedGramCounts]] flipped:
    * not which TRAINING docs to drop, but which EVAL items are already
    * burned (present verbatim-enough in the corpus) and must be
    * discarded from the benchmark before it can measure anything. For
    * each bench doc: how many distinct corpus docs share >= 1 word
    * n-gram with it, and how many of its own distinct grams leak. Every
    * bench row is reported (zero-collision rows with leaked = false) —
    * the report covers the WHOLE benchmark.
    *
    * Scale shape: the same broadcast discipline, flipped — the bench
    * gram relation (eval sets are small by nature) broadcasts into a
    * map-side join against the one corpus gram scan; the agg shuffle
    * carries only collision rows grouped to <= |bench| keys. Output:
    * (idCol, n_grams, n_leaking_docs, n_leaked_grams, leaked).
    */
  def evalLeakageReport(corpus: DataFrame, bench: DataFrame, idCol: String,
      textCol: String, n: Int, maxBenchGrams: Long = 1L << 22): DataFrame = {
    val bg = gramHashes(bench, idCol, textCol, n)
      .select(col(idCol).as("__bid"), col("gh"))
    // the broadcast premise fails loud, not at the 8 GB broadcast wall
    // (the benchGramSet discipline): a "benchmark" that grew to corpus
    // size belongs in the shuffled-join form, not here. One cheap
    // count job on the small side — this is a diagnostic report.
    val nGrams = bg.count()
    require(nGrams <= maxBenchGrams,
      s"evalLeakageReport: $nGrams bench gram rows exceed " +
        s"maxBenchGrams=$maxBenchGrams — the bench side broadcasts, so " +
        "it must stay eval-set-sized; shrink the benchmark or raise the " +
        "cap deliberately")
    val totals = bg.groupBy(col("__bid"))
      .agg(countDistinct(col("gh")).as("n_grams"))
    val hits = gramHashes(corpus, idCol, textCol, n)
      .select(col(idCol).as("__cid"), col("gh"))
      .join(broadcast(bg), Seq("gh"))
      .groupBy(col("__bid"))
      .agg(countDistinct(col("__cid")).as("n_leaking_docs"),
        countDistinct(col("gh")).as("n_leaked_grams"))
    totals.join(hits, Seq("__bid"), "left")
      .select(col("__bid").as(idCol),
        col("n_grams"),
        coalesce(col("n_leaking_docs"), lit(0L)).as("n_leaking_docs"),
        coalesce(col("n_leaked_grams"), lit(0L)).as("n_leaked_grams"),
        (coalesce(col("n_leaking_docs"), lit(0L)) > 0).as("leaked"))
  }

  /** The decontaminated corpus: every column of `corpus`, minus docs
    * flagged by [[sharedGramCounts]] (left-anti on the flag list).
    */
  def cleanCorpus(corpus: DataFrame, bench: DataFrame, idCol: String,
      textCol: String, n: Int, minShared: Int = 1): DataFrame =
    corpus.join(
      sharedGramCounts(corpus, bench, idCol, textCol, n, minShared)
        .select(idCol),
      Seq(idCol), "left_anti")

  /** EMBEDDING-level (semantic) decontamination — the modern complement
    * to n-gram collision: flag every corpus vector whose cosine to ANY
    * benchmark vector reaches `tau` (paraphrased or reformatted eval
    * items share no n-grams but sit next to their source in embedding
    * space). Eval sets are small by nature, so the benchmark rides the
    * plan as ONE literal array of vectors and the whole pass is a
    * row-local fold — zero shuffle, zero join, |bench|·d flops per
    * corpus row, embarrassingly parallel over 100 TB. For a benchmark
    * too big to inline (>~10⁵ vectors), generate candidates through the
    * IVF index ([[Dedup.nearestNeighborPerRowIvf]]) instead.
    *
    * Float discipline (FIXTURES.md §3): cosine uses only
    * correctly-rounded IEEE ops (+,·,/,sqrt) over index-order folds, and
    * max is order-free — so the scores hash-match an engine computing
    * the same folds, which is what lets q133 pin this end-to-end.
    * Zero-norm corpus rows score −1 (never flagged) rather than NaN.
    * Output: (idCol, max_cos_bench) for flagged rows.
    */
  def semanticFlags(corpus: DataFrame, idCol: String, vecCol: String,
      bench: Seq[Seq[Double]], tau: Double): DataFrame = {
    import graft.functions.VectorFunctions
    require(bench.nonEmpty, "semanticFlags: empty benchmark set")
    require(bench.size <= (1 << 16),
      s"semanticFlags: ${bench.size} bench vectors — inline literal path " +
        "is for small eval sets; use the IVF candidate path instead")
    // bench norms hoisted to the driver — the same IEEE left fold the
    // engine would run (index-order Σx², then sqrt), so values are
    // bit-identical to the oracle's in-SQL norms while the per-pair work
    // halves; the per-pair dot is the CODEGEN VectorDistance (eval'd
    // inside the lambda — no zip_with array allocation per pair, the
    // difference between ~1 s and ~90 s at 20k×200 pairs)
    val withNorms = bench.map { b =>
      (b, math.sqrt(b.foldLeft(0.0)((acc, x) => acc + x * x)))
    }
    require(withNorms.forall(_._2 > 0.0),
      "semanticFlags: zero-norm benchmark vector")
    val bl = typedLit(withNorms)
    corpus
      .select(col(idCol), col(vecCol).as("__v"),
        VectorFunctions.norm(col(vecCol)).as("__nv"))
      .select(col(idCol),
        when(col("__nv") === 0.0, lit(-1.0)).otherwise(
          aggregate(bl, lit(-2.0), (acc, s) =>
            greatest(acc,
              VectorFunctions.dot(col("__v"), s.getField("_1")) /
                (col("__nv") * s.getField("_2")))))
          .as("max_cos_bench"))
      .where(col("max_cos_bench") >= tau)
  }

  /** The benchmark's distinct gram-hash set as a DRIVER-side artifact —
    * the frozen form a STREAMING gate needs (training-run
    * reproducibility: the gate's behavior is pinned by an artifact, not
    * by whatever the bench table contains mid-stream). Eval sets are
    * small by nature; the [[semanticFlags]] inline-literal size cap
    * applies (≤ 2¹⁶ distinct grams — beyond that, decontaminate
    * batch-side through the join form).
    */
  def benchGramSet(bench: DataFrame, idCol: String, textCol: String,
      n: Int): Array[Long] = {
    val grams = gramHashes(bench, idCol, textCol, n)
      .select(col("gh")).distinct().collect().map(_.getLong(0)).sorted
    require(grams.length <= (1 << 16),
      s"benchGramSet: ${grams.length} distinct bench grams — the inline " +
        "literal gate is for small eval sets; use cleanCorpus (join form)")
    grams
  }

  /** ROW-LOCAL decontamination against a frozen [[benchGramSet]]: the
    * bench rides the plan as one literal array and each doc's distinct
    * grams intersect it in place — zero shuffle, zero join, no
    * aggregation, so the SAME plan runs on a batch frame and inside a
    * streaming query in append mode with no state and no watermark (the
    * [[semanticFlags]] shape for n-grams). Batch ≡ join-form
    * [[cleanCorpus]] is spec-pinned; at 100 TB this is one codegen pass
    * over the corpus.
    */
  def cleanCorpusInline(corpus: DataFrame, benchGrams: Array[Long],
      textCol: String, n: Int, minShared: Int = 1): DataFrame = {
    require(benchGrams.nonEmpty, "cleanCorpusInline: empty benchmark gram set")
    // tokens materialize in their own projection before the n-gram HOF
    // (the gramHashes lambda re-evaluation rule). Membership is the
    // CountInSortedSet codegen probe: the set lives ONCE per executor
    // and each row pays |grams|*log|set| binary searches — the
    // declarative array_intersect twin rebuilds a |set| hash set per
    // row (it cost q147 20 s at sf0.1; this form runs in under a
    // second, parity-pinned in DecontaminateSpec).
    val sortedSet = benchGrams.distinct.sorted
    corpus
      .withColumn("__toks", wsTokens(col(textCol)))
      .withColumn("__shared",
        graft.functions.expressions.TextHashExpressions.countInSortedSet(
          array_distinct(transform(ngramsOfTokens(col("__toks"), n),
            g => md5Low60(g))),
          sortedSet))
      .where(col("__shared") < minShared)
      .drop("__toks", "__shared")
  }

  /** (idCol, gh): one row per distinct word n-gram per doc, gram hashed to
    * its low-60-md5 Long. Tokens are materialized before the n-gram HOF
    * (lambda re-evaluation rule, see [[ngramsOfTokens]]).
    */
  private def gramHashes(df: DataFrame, idCol: String, textCol: String,
      n: Int): DataFrame =
    df.select(col(idCol), wsTokens(col(textCol)).as("toks"))
      .select(col(idCol), explode(ngramsOfTokens(col("toks"), n)).as("gram"))
      .select(col(idCol), md5Low60(col("gram")).as("gh"))
}
