package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** DSIR — Data Selection with Importance Resampling (Xie et al., NeurIPS
  * 2023, arXiv:2302.03169): pick pre-training documents whose hashed
  * n-gram profile resembles a small high-quality TARGET corpus, from a
  * huge RAW corpus. The pipeline stage between quality filtering
  * (rule-packs, q114) and mixture allocation (q72): "more like
  * Wikipedia, please", executed as data selection rather than as a
  * trained classifier.
  *
  * Shape (all three passes are 100-TB safe):
  *   1. FEATURE COUNTS — every document's unigrams + bigrams hash into
  *      `buckets` (bounded, e.g. 4k–64k) buckets; one corpus scan, one
  *      hash-agg shuffle whose output is <= `buckets` rows. The target
  *      membership is a per-row predicate, so target and raw counts come
  *      out of the SAME scan (a conditional sum, not a second pass).
  *   2. SCORE TABLE — per bucket, an add-1-smoothed target/raw frequency
  *      ratio. `buckets` longs, collected to the driver like a PQ
  *      codebook — an artifact, not data.
  *   3. SCORING — per-doc importance weight is a ROW-LOCAL fold over the
  *      document's own grams against the literal score array: zero
  *      shuffle, whole-stage codegen, embarrassingly parallel. Selection
  *      is then a TakeOrderedAndProject (map-side heaps), or a priority
  *      resample via [[Sampling]]'s exact-integer coin.
  *
  * Determinism discipline: the paper scores log(p_tgt/p_raw) summed over
  * grams — a transcendental per-bucket term whose SUM is not bit-stable
  * across engines (libm + float association). The oracle-checked scorer
  * [[importanceWeights]] therefore ranks by the exact-integer smoothed
  * ratio `((tc+1)*scale) div (rc+1)` summed over gram OCCURRENCES and
  * mean-normalized by document length (the same length normalization the
  * log form gets from averaging) — additive evidence, every engine ranks
  * identically. The paper-faithful log scorer is [[logImportanceWeights]]
  * (floats, driver-free); DsirSpec pins that the two agree on separated
  * corpora and that planted target-like documents win under both.
  */
object Dsir {

  /** All unigram + bigram occurrences of a tokens column, WITH
    * multiplicity — DSIR features are counts, not sets (contrast
    * [[TextFunctions.ngramsOfTokens]]'s `array_distinct`). Pass a
    * materialized tokens attribute, not an inline split (HOF lambdas
    * re-evaluate outer expressions per element).
    */
  def grams(toks: Column): Column = {
    val bigrams = when(size(toks) >= 2,
      transform(sequence(lit(1), size(toks) - 1),
        i => concat_ws(" ", element_at(toks, i), element_at(toks, i + 1))))
      .otherwise(array().cast("array<string>"))
    concat(toks, bigrams)
  }

  /** Per-bucket corpus statistics and scores in ONE scan: raw count `rc`
    * (all rows), target count `tc` (rows where `isTarget`), and the
    * exact-integer smoothed ratio `score = ((tc+1)*scale) div (rc+1)`.
    * Output <= `buckets` rows. A bucket never seen in the corpus scores
    * `(0+1)*scale div (0+1) = scale` — [[collectScores]] fills that
    * default, and no real gram can disagree (every scored gram is by
    * definition in the raw corpus).
    *
    * `scale` is the fixed-point resolution of the ratio (1e4 resolves
    * ratios to 0.01%); the row-path guard fails loud if a bucket count
    * is large enough that `(tc+1)*scale` would overflow Long (at
    * scale=1e4 that is ~9e14 occurrences of one bucket — a corpus of
    * ~1e15 tokens concentrated on one hash cell).
    */
  def bucketScoreTable(docs: DataFrame, textCol: String, isTarget: Column,
      buckets: Int, scale: Long, salt: String = "dsir:"): DataFrame = {
    require(buckets >= 2 && buckets <= (1 << 20),
      s"dsir: buckets $buckets out of range [2, 2^20]")
    require(scale >= 1 && scale <= (1L << 30),
      s"dsir: scale $scale out of range [1, 2^30]")
    docs
      .select(isTarget.cast("long").as("__t"),
        TextFunctions.wsTokens(col(textCol)).as("__toks"))
      .select(col("__t"), explode(grams(col("__toks"))).as("__g"))
      .select(col("__t"),
        TextFunctions.md5Bucket(col("__g"), buckets, salt).as("bucket"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("rc"), sum(col("__t")).as("tc"))
      .withColumn("score",
        when(col("tc") < lit(Long.MaxValue / scale - 1),
          expr(s"((tc + 1) * ${scale}L) div (rc + 1)"))
          .otherwise(raise_error(concat(
            lit(s"dsir: bucket count "), col("tc").cast("string"),
            lit(s" * scale $scale overflows Long — lower scale")))))
  }

  /** The gram-bucket relation — one row `(bucket, is_target)` per gram
    * OCCURRENCE: the mergeable-view input. [[bucketScoreTable]]'s counts
    * are exactly [[Ivm.aggState]]`(groupCols=Seq("bucket"),
    * valueCol="is_target")` over this frame (`n` = raw count, `s` =
    * target count — two sum monoids), so the DSIR score table inherits
    * the whole IVM lifecycle for free: `Ivm.buildAggView` pays the one
    * full-corpus scan, `Ivm.refreshAggView` absorbs a delta batch in
    * O(delta + buckets), and [[graft.streaming.StreamIvm.maintain]]
    * keeps it trailing a document stream with idempotent batch merges —
    * the target profile tracks the corpus WITHOUT rescanning 100 TB.
    * Stateless narrow ops only, so the same projection is streamable.
    */
  def gramBuckets(docs: DataFrame, textCol: String, isTarget: Column,
      buckets: Int, salt: String = "dsir:"): DataFrame =
    docs
      .select(isTarget.cast("long").as("is_target"),
        TextFunctions.wsTokens(col(textCol)).as("__toks"))
      .select(col("is_target"), explode(grams(col("__toks"))).as("__g"))
      .select(TextFunctions.md5Bucket(col("__g"), buckets, salt).as("bucket"),
        col("is_target"))

  /** Read the score column off an [[Ivm]] state/view over
    * [[gramBuckets]]: `rc = n`, `tc = s`, same smoothed integer ratio
    * and overflow guard as [[bucketScoreTable]] — a refreshed view
    * yields bit-identical scores to a full recompute (DsirSpec pins
    * merge ≡ recompute).
    */
  def scoresFromState(state: DataFrame, scale: Long): DataFrame = {
    require(scale >= 1 && scale <= (1L << 30),
      s"dsir: scale $scale out of range [1, 2^30]")
    state.select(col("bucket"), col("n").as("rc"), col("s").as("tc"))
      .withColumn("score",
        when(col("tc") < lit(Long.MaxValue / scale - 1),
          expr(s"((tc + 1) * ${scale}L) div (rc + 1)"))
          .otherwise(raise_error(concat(
            lit(s"dsir: bucket count "), col("tc").cast("string"),
            lit(s" * scale $scale overflows Long — lower scale")))))
  }

  /** Score table → dense driver array indexed by bucket (the broadcastable
    * artifact: `buckets` longs, like a PQ codebook). Unseen buckets get
    * the smoothed default `scale`.
    */
  def collectScores(scoreTable: DataFrame, buckets: Int,
      scale: Long): Array[Long] = {
    val arr = Array.fill[Long](buckets)(scale)
    scoreTable.select(col("bucket"), col("score")).collect()
      .foreach(r => arr(r.getLong(0).toInt) = r.getLong(1))
    arr
  }

  /** Persist the score artifact (bucket → score, one row per bucket)
    * as a versioned parquet dir — the [[graft.operators.Bpe.saveMerges]]
    * / PQ-codebook lifecycle: train the target profile ONCE on a corpus
    * snapshot, and every later batch job or streaming gate
    * ([[graft.streaming.StreamCuration.dsirGateStream]]) loads the
    * frozen artifact instead of rescanning. `_SUCCESS`-gated versions,
    * newest complete wins.
    */
  def saveScores(spark: org.apache.spark.sql.SparkSession,
      scores: Array[Long], path: String): Unit = {
    import spark.implicits._
    scores.zipWithIndex.map { case (s, b) => (b, s) }.toSeq
      .toDF("bucket", "score")
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$path/v${Ivm.nextVersion(path)}")
  }

  /** Newest complete persisted score artifact as the dense array. */
  def loadScores(spark: org.apache.spark.sql.SparkSession,
      path: String): Array[Long] = {
    val v = Ivm.completeVersions(path)
    require(v.nonEmpty, s"no DSIR score artifact at $path — saveScores first")
    val dir = Ivm.versionDirs(path).filter(_._1 == v.max).head._2
    val rows = spark.read.parquet(dir).orderBy("bucket")
      .collect().map(r => (r.getInt(0), r.getLong(1)))
    require(rows.nonEmpty && rows.map(_._1).toSeq == (0 until rows.length),
      s"corrupt DSIR score artifact at $dir: non-contiguous buckets")
    rows.map(_._2)
  }

  /** Row-local importance scoring: for each document,
    * `weight = sum over gram occurrences of score(bucket(gram))` and
    * `mean_score = weight div n_grams` (exact-integer length
    * normalization — without it long documents dominate regardless of
    * content, the same reason the paper averages log-likelihood ratios).
    * The score array rides the codegen [[graft.functions.expressions.DsirWeight]]
    * kernel as a reference object (not a join, not a literal tree): the
    * whole pass is a codegen'd fold per row — zero shuffle, no exchange
    * anywhere until the caller aggregates. Output: (idCol, n_grams,
    * weight, mean_score).
    */
  def importanceWeights(docs: DataFrame, idCol: String, textCol: String,
      scores: Array[Long], salt: String = "dsir:"): DataFrame = {
    require(scores.length >= 2, s"dsir: score array length ${scores.length} < 2")
    docs
      .select(col(idCol), TextFunctions.wsTokens(col(textCol)).as("__toks"))
      .select(col(idCol),
        graft.functions.expressions.DsirWeightUtil
          .column(col("__toks"), scores, salt).as("__nw"))
      .select(col(idCol),
        col("__nw.n_grams").as("n_grams"),
        col("__nw.weight").as("weight"))
      .withColumn("mean_score", expr("weight div n_grams"))
  }

  /** The declarative fold twin of [[importanceWeights]] — the executable
    * spec the codegen [[graft.functions.expressions.DsirWeight]] kernel
    * is cross-checked against (DsirSpec pins bit-identity on real data;
    * the house fold-twin discipline).
    */
  def importanceWeightsFold(docs: DataFrame, idCol: String, textCol: String,
      scores: Array[Long], salt: String = "dsir:"): DataFrame = {
    val buckets = scores.length
    require(buckets >= 2, s"dsir: score array length $buckets < 2")
    val sc = lit(scores)
    docs
      .select(col(idCol), TextFunctions.wsTokens(col(textCol)).as("__toks"))
      .select(col(idCol), grams(col("__toks")).as("__g"))
      .select(col(idCol),
        size(col("__g")).cast("long").as("n_grams"),
        aggregate(col("__g"), lit(0L), (acc, g) =>
          acc + element_at(sc,
            (TextFunctions.md5Bucket(g, buckets, salt) + 1L).cast("int")))
          .as("weight"))
      .withColumn("mean_score", expr("weight div n_grams"))
  }

  /** The paper's scorer: per-doc MEAN of ln((tc+1)/(rc+1)) over gram
    * occurrences — floats, so ScalaTest-verified rather than
    * oracle-checked (FIXTURES.md §3: transcendental sums are not
    * bit-stable across engines). Same three-pass shape; the score column
    * rides as a literal double array. Output: (idCol, n_grams,
    * log_weight).
    */
  def logImportanceWeights(docs: DataFrame, idCol: String, textCol: String,
      scoreTable: DataFrame, buckets: Int,
      salt: String = "dsir:"): DataFrame = {
    val arr = Array.fill[Double](buckets)(0.0)
    scoreTable.select(col("bucket"), col("tc"), col("rc")).collect()
      .foreach { r =>
        arr(r.getLong(0).toInt) =
          math.log((r.getLong(1) + 1.0) / (r.getLong(2) + 1.0))
      }
    val sc = lit(arr)
    docs
      .select(col(idCol), TextFunctions.wsTokens(col(textCol)).as("__toks"))
      .select(col(idCol), grams(col("__toks")).as("__g"))
      .select(col(idCol),
        size(col("__g")).cast("long").as("n_grams"),
        aggregate(col("__g"), lit(0.0), (acc, g) =>
          acc + element_at(sc,
            (TextFunctions.md5Bucket(g, buckets, salt) + 1L).cast("int")))
          .as("__sum"))
      .withColumn("log_weight", col("__sum") / col("n_grams"))
      .drop("__sum")
  }

  /** End-to-end DSIR selection: score table (one scan + bounded agg) →
    * driver score artifact → row-local weights → priority RESAMPLE of
    * `n` documents with probability proportional to `mean_score`
    * ([[Sampling.priorityTopN]] — the Gumbel-top-k step of the paper,
    * with the repo's exact-integer md5 coin so the sample is
    * reproducible across runs and engines). Output: the weight columns
    * + `priority`, the `n` winners.
    */
  def select(docs: DataFrame, idCol: String, textCol: String,
      isTarget: Column, n: Int, buckets: Int = 4096,
      scale: Long = 10000L, salt: String = "dsir:"): DataFrame = {
    val table = bucketScoreTable(docs, textCol, isTarget, buckets, scale, salt)
    val scores = collectScores(table, buckets, scale)
    val w = importanceWeights(docs, idCol, textCol, scores, salt)
    Sampling.priorityTopN(w, idCol, "mean_score", n, salt = salt + "rs:")
  }
}
