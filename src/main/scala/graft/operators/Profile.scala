package graft.operators

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Table profiling — the `ANALYZE`/data-quality pass of a warehouse: one
  * row per column with null/distinct/range stats, the input to skew
  * detection, partition planning, and ingestion QA.
  *
  * Scale shape: ONE aggregation over one scan produces every metric
  * (column-wise agg, then an in-row `stack` to the long format — the
  * reshape costs nothing, it runs on a single driver-bound row). The
  * exact `countDistinct` per column makes Spark expand the input (one
  * group-set per column) — correct for oracle parity; at 100 TB swap in
  * `approx_count_distinct` (HLL, single pass, no expand) and drop the
  * cross-engine hash check (sketches are engine-specific by nature).
  */
object Profile {

  /** (col_name, n_nonnull, n_null, n_distinct, min_v, max_v) for each of
    * `cols` (numeric or castable-to-double), ordered by col_name.
    *
    * Shape: null/range stats come from ONE expand-free pass (putting the
    * exact countDistincts in that same agg would make Spark EXPAND the
    * scan — one input replica per distinct column); each distinct count
    * is its own column-pruned branch (scan reads one column, map-side
    * partial-distinct, shuffle carries only the distinct values), all
    * unioned and broadcast-joined to the base stats. At 100 TB swap the
    * branches for `approx_count_distinct` (HLL, zero extra passes) and
    * drop the cross-engine hash check (sketches are engine-specific).
    */
  def numeric(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "Profile.numeric: no columns given")
    val aggs = cols.flatMap(c => Seq(
      count(col(c)).as(s"${c}__n"),
      sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}__nn"),
      min(col(c).cast("double")).as(s"${c}__mn"),
      max(col(c).cast("double")).as(s"${c}__mx")))
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val stacked = cols.map(c =>
      s"'$c', ${c}__n, ${c}__nn, ${c}__mn, ${c}__mx").mkString(", ")
    val base = wide.selectExpr(s"stack(${cols.length}, $stacked) AS " +
      "(col_name, n_nonnull, n_null, min_v, max_v)")
    val ndist = cols.map { c =>
      df.where(col(c).isNotNull).select(col(c).as("v")).distinct()
        .agg(count(lit(1)).as("n_distinct"))
        .select(lit(c).as("col_name"), col("n_distinct"))
    }.reduce(_.unionAll(_))
    base.join(broadcast(ndist), "col_name")
      .select(col("col_name"), col("n_nonnull"), col("n_null"),
        col("n_distinct"), col("min_v"), col("max_v"))
      .orderBy(col("col_name"))
  }

  /** Robust per-group outlier stats on a LONG column: median, MAD
    * (median absolute deviation) and the count of rows beyond
    * `k·MAD` of the median — the outlier detector that, unlike the
    * mean/σ rule (q76), a few extreme values cannot drag: breakdown
    * point 50% vs 0%. Entirely integer-exact: "median" is the LOWER
    * median (the (n+1) div 2-th smallest — a value that exists in the
    * data, no interpolated float), deviations are Long |v−med|, and the
    * cut is an integer comparison, so every engine computes identical
    * stats. Shape: two ranked passes (window row_number per group) over
    * group-local sorts + one counting join — at cluster scale each pass
    * is one shuffle on the group key. Output: (groupCol, med, mad,
    * n_out).
    */
  def madOutliers(df: DataFrame, groupCol: String, valueCol: String,
      k: Int = 3): DataFrame = {
    val byV = Window.partitionBy(col(groupCol)).orderBy(col(valueCol).asc)
    val byG = Window.partitionBy(col(groupCol))
    val med = df
      .withColumn("__rn", row_number().over(byV))
      .withColumn("__n", count(lit(1)).over(byG))
      .where(col("__rn") === expr("(__n + 1) div 2"))
      .select(col(groupCol), col(valueCol).as("med"))
    val byD = Window.partitionBy(col(groupCol)).orderBy(col("__d").asc)
    val mad = df.join(med, groupCol)
      .withColumn("__d", abs(col(valueCol) - col("med")))
      .withColumn("__rn", row_number().over(byD))
      .withColumn("__n", count(lit(1)).over(byG))
      .where(col("__rn") === expr("(__n + 1) div 2"))
      .select(col(groupCol), col("med"), col("__d").as("mad"))
    df.join(mad, groupCol)
      .groupBy(groupCol)
      .agg(min(col("med")).as("med"), min(col("mad")).as("mad"),
        count(when(abs(col(valueCol) - col("med")) > col("mad") * k, lit(1)))
          .as("n_out"))
  }

  /** Vocabulary-growth (Heaps'-law) curve: distinct tokens seen so far
    * after each `bucketDocs`-document prefix of the corpus in `idCol`
    * order — the corpus diagnostic that tells a tokenizer-training or
    * dedup run whether vocabulary is still growing (fresh content) or
    * saturating (template/boilerplate dominated). A corpus whose curve
    * flattens early is near-dup-heavy before any pair join runs.
    *
    * Exact and scale-shaped: each token's FIRST document is one hash-agg
    * (min over its occurrences — map-side combinable); bucketing firsts
    * and the cumulative sum then run over |vocab|/bucketDocs rows — the
    * single-partition window is over the tiny bucket relation, never the
    * corpus. Output: (bucket, new_tokens, cum_vocab), bucket =
    * first_doc div bucketDocs.
    */
  def vocabGrowth(df: DataFrame, idCol: String, textCol: String,
      bucketDocs: Long): DataFrame = {
    require(bucketDocs >= 1, s"bucketDocs $bucketDocs must be >= 1")
    val w = Window.orderBy(col("bucket").asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    df.select(col(idCol),
        explode(array_distinct(
          graft.functions.TextFunctions.wsTokens(col(textCol)))).as("tok"))
      .where(col("tok") =!= "")
      .groupBy("tok").agg(min(col(idCol)).as("first_doc"))
      .groupBy(expr(s"first_doc div ${bucketDocs}L").as("bucket"))
      .agg(count(lit(1)).as("new_tokens"))
      .withColumn("cum_vocab", sum(col("new_tokens")).over(w))
  }

  /** Zipf coverage curve: what fraction of the corpus's total token MASS
    * the top-k most frequent types cover, for each requested k — the
    * companion diagnostic to [[vocabGrowth]] (Heaps' law counts TYPES;
    * this weighs them). The number that sizes a tokenizer vocabulary:
    * "64k types cover 99.2% of tokens" is this query's row.
    *
    * Scale shape: one map-side-combinable hash-agg to type counts, then
    * `orderBy.limit(max k)` — a distributed TakeOrderedAndProject, never
    * a global sort of the vocabulary — so the single-partition ranking
    * window only ever sees max-k rows. Counts stay exact Longs; the
    * coverage ratio is the single IEEE division at the end.
    * Output: (k, top_cnt, total_cnt, coverage), ascending k.
    */
  def zipfCoverage(df: DataFrame, textCol: String, ks: Seq[Long]): DataFrame = {
    require(ks.nonEmpty && ks.forall(_ >= 1), s"ks $ks must be >= 1")
    val counts = df
      .select(explode(
        graft.functions.TextFunctions.wsTokens(col(textCol))).as("tok"))
      .where(col("tok") =!= "")
      .groupBy("tok").agg(count(lit(1)).as("cnt"))
    val total = counts.agg(sum(col("cnt")).as("total_cnt"))
    val top = counts
      .orderBy(col("cnt").desc, col("tok").asc).limit(ks.max.toInt)
      .withColumn("rank",
        row_number().over(Window.orderBy(col("cnt").desc, col("tok").asc)))
    val kRel = df.sparkSession.createDataFrame(
      ks.sorted.map(org.apache.spark.sql.Row(_)).asJava,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("k",
          org.apache.spark.sql.types.LongType, nullable = false))))
    top.join(broadcast(kRel), col("rank") <= col("k"))
      .groupBy("k").agg(sum(col("cnt")).as("top_cnt"))
      .crossJoin(broadcast(total))
      .select(col("k"), col("top_cnt"), col("total_cnt"),
        (col("top_cnt").cast("double") / col("total_cnt").cast("double"))
          .as("coverage"))
      .orderBy("k")
  }

  /** Exact-integer least-squares TREND per group: for Long-valued (x, y)
    * rows, the slope of the best-fit line as an exact rational —
    * numerator n·Σxy − Σx·Σy and denominator n·Σx² − (Σx)², both in
    * decimal(38,0) so nothing wraps at any group size (the q76 cleared-
    * denominator discipline applied to regression). The numerator is
    * also n² times the covariance, so its SIGN alone answers "is this
    * metric drifting up or down" with zero float ops; callers divide
    * only at the very end, if at all.
    *
    * One map-side-combinable hash-agg over five Long monoid sums — the
    * same single-shuffle shape as a plain groupBy count, so it runs at
    * scan speed on any corpus. Output: (group, n, slope_num, slope_den).
    */
  /** Integer-exact two-sample KS drift table — the distribution-shift
    * monitor a continuous-ingest pipeline runs between a reference
    * source/day and a new one ("did the length/score distribution
    * move?"). Values bucket by `value div bucketWidth` (capped at
    * `buckets − 1`); per bucket the CUMULATIVE counts of each sample and
    * the cross-multiplied CDF gap |cumA·nB − cumB·nA| — the KS statistic
    * numerator, exact in integers (÷ nA·nB only if a float is ever
    * wanted; the MAX row is the KS distance). The step-function maximum
    * is always attained at a bucket where a count increments, so only
    * present buckets appear and nothing is missed.
    *
    * One hash-agg on bucket (map-side combined, ≤ `buckets` rows out),
    * then a single-partition window over that bucket-cardinality frame —
    * an artifact, not data (the Curriculum offsets discipline). Output:
    * (bucket, n_a, n_b, cum_a, cum_b, gap_num), ordered by bucket.
    */
  def ksDrift(df: DataFrame, groupCol: String, valueCol: String,
      aVal: String, bVal: String, bucketWidth: Long,
      buckets: Int): DataFrame = {
    require(bucketWidth >= 1 && buckets >= 1,
      s"ksDrift: bucketWidth $bucketWidth and buckets $buckets must be >= 1")
    val two = df.where(col(groupCol).isin(aVal, bVal))
      .select(col(groupCol).as("__g"),
        least(expr(s"CAST(`$valueCol` AS BIGINT) div ${bucketWidth}L"),
          lit(buckets - 1L)).as("bucket"))
    val perBucket = two.groupBy("bucket")
      .agg(count(when(col("__g") === aVal, 1)).as("n_a"),
        count(when(col("__g") === bVal, 1)).as("n_b"))
    val wc = Window.orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val totals = perBucket.agg(sum("n_a").as("ta"), sum("n_b").as("tb"))
    perBucket
      .withColumn("cum_a", sum(col("n_a")).over(wc))
      .withColumn("cum_b", sum(col("n_b")).over(wc))
      .crossJoin(broadcast(totals))
      .select(col("bucket"), col("n_a"), col("n_b"),
        col("cum_a"), col("cum_b"),
        abs(col("cum_a") * col("tb") - col("cum_b") * col("ta"))
          .as("gap_num"))
      .orderBy("bucket")
  }

  /** Exact-integer TOKEN-DISTRIBUTION drift between every pair of
    * sources — the data-mixing diagnostic next to [[ksDrift]] (which
    * watches ONE numeric column between TWO named samples; this watches
    * the whole unigram distribution across ALL source pairs): tokens
    * hash to `buckets` md5 buckets (the DSIR bounded-state discipline,
    * salt `"tvd:"`), and per source pair the TOTAL-VARIATION distance
    * over bucketed distributions comes out as an exact rational —
    * numerator Σ_b |c_A·N_B − c_B·N_A| on common denominator 2·N_A·N_B.
    * TV needs no logs (unlike KL/JS), so the whole statistic is integer
    * arithmetic both engines replay bit-for-bit; `tv_permille` =
    * 1000·num div denom is the 0..1000 headline number.
    *
    * One-sided buckets never join, so the numerator decomposes as
    * Σ_{b∈both} |c_A·N_B − c_B·N_A| + (N_A − S_A)·N_B + (N_B − S_B)·N_A
    * with S = the joined-bucket partial sums — the inner equi-join on
    * bucket is all that runs; nothing materializes the bucket union.
    *
    * Scale shape: one hash-agg to (source, bucket) counts (≤ S·buckets
    * rows — bounded state, map-side combined), a bucket equi-join of
    * that bounded relation with itself (≤ S²·buckets rows), and a
    * broadcast of the S-row totals. The corpus is read once; products
    * run in decimal(38,0) so nothing wraps at 100 TB (N_A·N_B at 10^13
    * tokens per source exceeds Long). Output: (src_a, src_b, n_a, n_b,
    * tv_num, tv_permille), src_a < src_b — tv_num is decimal(38,0), the
    * width the arithmetic needs at corpus scale.
    */
  def tokenTvDrift(df: DataFrame, groupCol: String, textCol: String,
      buckets: Int = 4096): DataFrame =
    tokenTvDriftFromCounts(tokenBucketCounts(df, groupCol, textCol, buckets))

  /** The (source, bucket, c) count STATE behind [[tokenTvDrift]] — one
    * corpus scan into ≤ S·buckets rows. The state is an additive monoid
    * (counts sum), so it maintains INCREMENTALLY: persist it, aggregate
    * only the delta on new ingest, and merge by summing per key
    * ([[mergeTokenBucketCounts]]) — the Ivm refresh discipline applied
    * to the drift monitor; [[tokenTvDriftFromCounts]] reads the merged
    * state and must equal a from-scratch recompute bit-for-bit (q170).
    */
  def tokenBucketCounts(df: DataFrame, groupCol: String, textCol: String,
      buckets: Int = 4096): DataFrame = {
    require(buckets >= 1, s"tokenBucketCounts: buckets $buckets must be >= 1")
    df.select(col(groupCol).as("__g"),
        explode(graft.functions.TextFunctions.wsTokens(col(textCol))).as("tok"))
      .select(col("__g"),
        graft.functions.TextFunctions.md5Bucket(col("tok"), buckets, "tvd:")
          .as("bucket"))
      .groupBy(col("__g"), col("bucket"))
      .agg(count(lit(1)).as("c"))
  }

  /** Merge count states by key-wise sum — O(state), never the corpus. */
  def mergeTokenBucketCounts(states: Seq[DataFrame]): DataFrame = {
    require(states.nonEmpty, "mergeTokenBucketCounts: no states")
    states.reduce(_ unionByName _)
      .groupBy(col("__g"), col("bucket"))
      .agg(sum(col("c")).as("c"))
  }

  /** [[tokenTvDrift]] served from a (pre-aggregated, possibly
    * incrementally merged) count state — all arithmetic from here on
    * touches only the bounded state.
    */
  def tokenTvDriftFromCounts(counts: DataFrame): DataFrame = {
    val dec = "decimal(38,0)"
    val c = counts
    // totals re-aggregate the BOUNDED count relation (≤ S·buckets rows),
    // not the corpus — one corpus scan feeds everything
    val n = c.groupBy(col("__g")).agg(sum(col("c")).as("n"))
    val pairs = n.select(col("__g").as("src_a"), col("n").as("n_a"))
      .join(n.select(col("__g").as("src_b"), col("n").as("n_b")),
        col("src_a") < col("src_b"))
    val inner = c.select(col("__g").as("src_a"), col("bucket"), col("c").as("ca"))
      .join(c.select(col("__g").as("src_b"), col("bucket"), col("c").as("cb")),
        Seq("bucket"))
      .where(col("src_a") < col("src_b"))
      .join(broadcast(n.select(col("__g").as("src_a"), col("n").as("na"))), Seq("src_a"))
      .join(broadcast(n.select(col("__g").as("src_b"), col("n").as("nb"))), Seq("src_b"))
      .groupBy(col("src_a"), col("src_b"))
      .agg(sum(col("ca")).as("sa"), sum(col("cb")).as("sb"),
        sum(abs(col("ca").cast(dec) * col("nb").cast(dec) -
          col("cb").cast(dec) * col("na").cast(dec))).cast(dec).as("inner_num"))
    pairs.join(inner, Seq("src_a", "src_b"), "left")
      .select(col("src_a"), col("src_b"), col("n_a"), col("n_b"),
        (coalesce(col("inner_num"), lit(0L).cast(dec)) +
          (col("n_a") - coalesce(col("sa"), lit(0L))).cast(dec) * col("n_b").cast(dec) +
          (col("n_b") - coalesce(col("sb"), lit(0L))).cast(dec) * col("n_a").cast(dec))
          .cast(dec).as("__num"))
      // permille first (IntegralDivide on decimals -> Long, exact), THEN
      // the numerator narrowed to BIGINT under a fail-loud guard — at
      // 10^13-token sources the numerator outgrows Long and the right
      // fix is per-source sampling or a wider output contract, not a
      // silent wrap (the Dsir scale-guard discipline).
      .withColumn("tv_permille", expr(
        "(__num * CAST(1000 AS DECIMAL(38,0))) div " +
          "(CAST(2 AS DECIMAL(38,0)) * CAST(n_a AS DECIMAL(38,0)) * CAST(n_b AS DECIMAL(38,0)))"))
      .withColumn("tv_num",
        when(col("__num") <= lit(Long.MaxValue).cast(dec),
          col("__num").cast("long"))
          .otherwise(raise_error(concat(lit("tokenTvDrift: tv_num overflows "),
            lit("BIGINT for pair ("), col("src_a"), lit(", "), col("src_b"),
            lit(") — sample per source or widen the output contract")))))
      .select("src_a", "src_b", "n_a", "n_b", "tv_num", "tv_permille")
  }

  /** Collocation extraction — Church & Hanks 1990 association-ratio
    * mining, the new-term/multi-word-expression discovery pass a
    * tokenizer-vocab pipeline runs before training: adjacent token
    * pairs ranked by lift = P(ab) / (P(a)·P(b)) = c_ab·N / (c_a·c_b),
    * reported as EXACT integer permille via decimal(38,0)
    * cross-multiplication (PMI is log(lift) — monotone, so the ranking
    * IS the PMI ranking, with zero float ops). `minCount` gates both
    * the pair and each unigram — the standard mitigation for PMI's
    * rare-pair bias (a hapax pair otherwise tops any list).
    *
    * Scale shape: two map-side-combinable hash aggs (observed-bigram /
    * vocab bounded — never row-bounded), the minCount filter prunes
    * BEFORE the two unigram-count joins, N broadcasts as a 1-row agg,
    * and the top-k is TakeOrderedAndProject (k rows per partition move,
    * no global sort). Output: (a, b, c_ab, lift_permille), top `topK`
    * by (lift desc, a asc, b asc).
    */
  /** Cross-source N-GRAM CONTAINMENT matrix — the corpus-composition
    * twin of decontamination (q50 guards the eval boundary; this guards
    * the SOURCE boundaries): for every pair of sources, the size of the
    * distinct word-n-gram set intersection and both asymmetric
    * containments in exact permille (1000·|A∩B| div |A| — "how much of
    * source A already exists in source B", the signal that one crawl
    * snapshot swallowed another, a mirror got ingested twice, or two
    * vendors sold the same scrape). TV drift (q168) compares unigram
    * DISTRIBUTIONS — near-identical token mixes score low there even
    * when zero passages are shared; containment is the opposite lens:
    * verbatim n-gram overlap, robust to mix differences.
    *
    * Scale shape: grams shuffle once as 60-bit hashes of the distinct
    * (source, gram) relation (never the strings); sizes are a bounded
    * |S|-row agg, the intersection one gh equi-join of that relation
    * grouped to |S|² rows — no all-pairs documents, no text re-scan.
    * Output: (src_a, src_b, n_a, n_b, inter, cont_a_in_b_permille,
    * cont_b_in_a_permille), src_a < src_b, every pair present (0-filled).
    */
  def crossSourceContainment(df: DataFrame, srcCol: String,
      textCol: String, n: Int = 8): DataFrame = {
    require(n >= 1, s"crossSourceContainment: n $n must be >= 1")
    import graft.functions.TextFunctions
    val grams = df
      .select(col(srcCol).as("__g"),
        explode(TextFunctions.overlappingGrams(
          TextFunctions.wsTokens(col(textCol)), n)).as("gram"))
      .select(col("__g"), TextFunctions.md5Low60(col("gram")).as("gh"))
      .distinct()
    // sizes anchor on the DISTINCT source list, not the gram relation: a
    // source whose docs are all shorter than n tokens has zero grams and
    // would otherwise vanish from the matrix, breaking the documented
    // "every pair present (0-filled)" contract (ADVICE r11)
    val sizes = df.select(col(srcCol).as("__g")).distinct()
      .join(grams.groupBy(col("__g")).agg(count(lit(1)).as("__sz")),
        Seq("__g"), "left")
      .select(col("__g"), coalesce(col("__sz"), lit(0L)).as("sz"))
    val pairs = sizes.select(col("__g").as("src_a"), col("sz").as("n_a"))
      .join(sizes.select(col("__g").as("src_b"), col("sz").as("n_b")),
        col("src_a") < col("src_b"))
    val inter = grams.select(col("__g").as("src_a"), col("gh"))
      .join(grams.select(col("__g").as("src_b"), col("gh")), Seq("gh"))
      .where(col("src_a") < col("src_b"))
      .groupBy(col("src_a"), col("src_b"))
      .agg(count(lit(1)).as("inter"))
    pairs.join(inter, Seq("src_a", "src_b"), "left")
      .select(col("src_a"), col("src_b"), col("n_a"), col("n_b"),
        coalesce(col("inter"), lit(0L)).as("inter"))
      .withColumn("cont_a_in_b_permille",
        expr("inter * 1000L div greatest(n_a, 1L)"))
      .withColumn("cont_b_in_a_permille",
        expr("inter * 1000L div greatest(n_b, 1L)"))
      .orderBy("src_a", "src_b")
  }

  /** [[crossSourceContainment]]'s 100-TB path — KMV / bottom-k sketches
    * (Bar-Yossef et al. 2002; Beyer et al. 2007): per source keep the k
    * SMALLEST distinct 60-bit gram hashes (a bounded, merge-friendly
    * set synopsis — the union of two sources' bottom-k's re-trimmed to
    * k IS the union's bottom-k, so the state is an IVM-able monoid),
    * then estimate each pair's Jaccard on the union's bottom-k sample:
    * jac_est = |K ∩ A ∩ B| / |K| with K = bottom-k(bottom-k(A) ∪
    * bottom-k(B)). Every step is integer/array arithmetic on the hash
    * values — DETERMINISTIC, so unlike most sketches the whole table is
    * oracle-hashable. Exact-form cost it avoids: the q181 gh equi-join
    * shuffles EVERY distinct gram; here the per-source synopsis is ≤ k
    * rows and the pair arithmetic runs on broadcastable |S|·k state.
    *
    * The bottom-k extraction avoids one giant per-source sort group at
    * scale with the [[Web.domainCapSalted]] pre-pass discipline: a
    * per-(source, gh mod saltFactor) bottom-k keeps every true
    * bottom-k row alive, then the exact per-source window runs on
    * ≤ saltFactor·k survivors. Output: (src_a, src_b, k_used, inter_k,
    * jac_est_permille), src_a < src_b, every pair present.
    */
  def crossSourceContainmentSketch(df: DataFrame, srcCol: String,
      textCol: String, n: Int = 8, k: Int = 256,
      saltFactor: Int = 32): DataFrame =
    containmentFromSketches(
      gramBottomK(df, srcCol, textCol, n, k, saltFactor), k)

  /** The per-source bottom-k gram synopsis behind
    * [[crossSourceContainmentSketch]]: (__g = source, bk = the k
    * smallest distinct gram hashes, ascending). THE MONOID of this
    * family ([[mergeGramBottomK]] is its ⊕): bottom-k(A ∪ B) =
    * bottom-k(bottom-k(A) ∪ bottom-k(B)), so a daily ingest maintains
    * the synopsis in O(delta) and the pair matrix serves off ≤ |S|·k
    * state — the q170/q175 refresh discipline for set overlap.
    */
  def gramBottomK(df: DataFrame, srcCol: String, textCol: String,
      n: Int = 8, k: Int = 256, saltFactor: Int = 32): DataFrame = {
    require(n >= 1, s"gramBottomK: n $n must be >= 1")
    require(k >= 2, s"gramBottomK: k $k must be >= 2")
    require(saltFactor >= 1, s"gramBottomK: saltFactor $saltFactor must be >= 1")
    import graft.functions.TextFunctions
    val grams = df
      .select(col(srcCol).as("__g"),
        explode(TextFunctions.overlappingGrams(
          TextFunctions.wsTokens(col(textCol)), n)).as("gram"))
      .select(col("__g"), TextFunctions.md5Low60(col("gram")).as("gh"))
      .distinct()
    val wPre = Window
      .partitionBy(col("__g"), pmod(col("gh"), lit(saltFactor.toLong)))
      .orderBy(col("gh"))
    val wExact = Window.partitionBy(col("__g")).orderBy(col("gh"))
    val synopses = grams
      .withColumn("__pr", row_number().over(wPre)).where(col("__pr") <= k)
      .withColumn("__r", row_number().over(wExact)).where(col("__r") <= k)
      .groupBy(col("__g"))
      .agg(sort_array(collect_list(col("gh"))).as("__bk"))
    // anchor on the distinct source list so a gram-less source (all docs
    // shorter than n tokens) still carries an EMPTY synopsis — the same
    // every-pair-present contract as the exact matrix (ADVICE r11)
    df.select(col(srcCol).as("__g")).distinct()
      .join(synopses, Seq("__g"), "left")
      .select(col("__g"),
        coalesce(col("__bk"), array().cast("array<long>")).as("bk"))
  }

  /** Merge bottom-k synopses by key-wise union + re-trim — O(state),
    * never the corpus. merge == recompute is spec-pinned (ProfileSpec),
    * the exactness following from the bottom-k composition identity.
    */
  def mergeGramBottomK(states: Seq[DataFrame], k: Int): DataFrame = {
    require(states.nonEmpty, "Profile.mergeGramBottomK: no states")
    require(k >= 2, s"mergeGramBottomK: k $k must be >= 2")
    val all = states.reduce(_ unionByName _)
    val merged = all
      .select(col("__g"), explode(col("bk")).as("gh"))
      .distinct()
      .withColumn("__r", row_number().over(
        Window.partitionBy(col("__g")).orderBy(col("gh"))))
      .where(col("__r") <= k)
      .groupBy(col("__g"))
      .agg(sort_array(collect_list(col("gh"))).as("__bk"))
    // a source carrying an EMPTY synopsis (gramBottomK's gram-less
    // anchor row) must survive the merge — explode drops its rows, so
    // group presence is re-anchored on the states' own source list
    // (merge == recompute stays exact for 0-gram sources too)
    all.select(col("__g")).distinct()
      .join(merged, Seq("__g"), "left")
      .select(col("__g"),
        coalesce(col("__bk"), array().cast("array<long>")).as("bk"))
  }

  /** The pair-matrix stage of [[crossSourceContainmentSketch]], served
    * off a (possibly incrementally merged) synopsis table.
    *
    * Beyond the symmetric `jac_est_permille`, the matrix estimates the
    * ASYMMETRIC lens the exact form (q181) leads with — "how much of A
    * already exists in B": per-source distinct sizes from the k-th
    * minimum (Beyer et al. 2007, n̂ = (k−1)/v_k with v_k the k-th
    * smallest hash normalized to the 2^60 space), the intersection size
    * from jac_est · union-size estimate, and the containments as their
    * integer-permille ratios. An UNSATURATED sketch (< k hashes) IS the
    * full set, so its size — and, when union < k, the whole pair row —
    * is EXACT, not estimated (ProfileSpec pins est == exact there).
    * Everything stays integer arithmetic on the hash values (products in
    * DECIMAL(38,0): (k−1)·2^60 overflows a long for k > 8), so the whole
    * table remains oracle-hashable. Output adds: (n_a_est, n_b_est,
    * union_est, inter_est, cont_a_in_b_est_permille,
    * cont_b_in_a_est_permille).
    */
  def containmentFromSketches(sets: DataFrame, k: Int): DataFrame = {
    require(k >= 2, s"containmentFromSketches: k $k must be >= 2")
    val two60 = "1152921504606846976" // the md5Low60 hash space, 2^60
    // k-th-minimum distinct-size estimator; the CASE keeps element_at
    // in-bounds (bottom-k arrays never exceed k elements)
    def distEst(bk: String): Column = expr(
      s"CASE WHEN size($bk) < $k THEN CAST(size($bk) AS BIGINT) " +
        s"ELSE CAST((CAST(${k - 1} AS DECIMAL(38,0)) * $two60) div " +
        s"greatest(element_at($bk, $k), 1L) AS BIGINT) END")
    val pairs = sets.select(col("__g").as("src_a"), col("bk").as("bka"))
      .join(sets.select(col("__g").as("src_b"), col("bk").as("bkb")),
        col("src_a") < col("src_b"))
    pairs
      .withColumn("__union_k",
        slice(array_sort(array_union(col("bka"), col("bkb"))), 1, k))
      .select(col("src_a"), col("src_b"),
        size(col("__union_k")).cast("long").as("k_used"),
        size(array_intersect(array_intersect(col("__union_k"), col("bka")),
          col("bkb"))).cast("long").as("inter_k"),
        distEst("bka").as("n_a_est"),
        distEst("bkb").as("n_b_est"),
        distEst("__union_k").as("union_est"))
      .withColumn("jac_est_permille",
        expr("inter_k * 1000L div greatest(k_used, 1L)"))
      .withColumn("inter_est",
        expr("CAST((CAST(inter_k AS DECIMAL(38,0)) * union_est) div " +
          "greatest(k_used, 1L) AS BIGINT)"))
      .withColumn("cont_a_in_b_est_permille",
        expr("CAST((CAST(inter_est AS DECIMAL(38,0)) * 1000) div " +
          "greatest(n_a_est, 1L) AS BIGINT)"))
      .withColumn("cont_b_in_a_est_permille",
        expr("CAST((CAST(inter_est AS DECIMAL(38,0)) * 1000) div " +
          "greatest(n_b_est, 1L) AS BIGINT)"))
      .select(col("src_a"), col("src_b"), col("k_used"), col("inter_k"),
        col("jac_est_permille"), col("n_a_est"), col("n_b_est"),
        col("union_est"), col("inter_est"),
        col("cont_a_in_b_est_permille"), col("cont_b_in_a_est_permille"))
      .orderBy("src_a", "src_b")
  }

  def collocations(df: DataFrame, textCol: String, minCount: Int = 5,
      topK: Int = 50): DataFrame = {
    require(minCount >= 1, s"collocations: minCount $minCount must be >= 1")
    require(topK >= 1, s"collocations: topK $topK must be >= 1")
    val toks = df.select(
      graft.functions.TextFunctions.wsTokens(col(textCol)).as("toks"))
    val uc = toks.select(explode(col("toks")).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("c"))
    val n = uc.agg(sum(col("c")).as("n"))
    // overlappingGrams (NOT ngramsOfTokens): occurrence multiplicity is
    // the statistic here, and a sub-n doc must yield zero pairs
    val bc = toks
      .select(explode(
        graft.functions.TextFunctions.overlappingGrams(col("toks"), 2))
        .as("pair"))
      .groupBy("pair").agg(count(lit(1)).as("c_ab"))
      .where(col("c_ab") >= minCount)
      .select(split_part(col("pair"), lit(" "), lit(1)).as("a"),
        split_part(col("pair"), lit(" "), lit(2)).as("b"), col("c_ab"))
    bc
      .join(uc.select(col("tok").as("a"), col("c").as("c_a")), Seq("a"))
      .join(uc.select(col("tok").as("b"), col("c").as("c_b")), Seq("b"))
      .where(col("c_a") >= minCount && col("c_b") >= minCount)
      .crossJoin(broadcast(n))
      .withColumn("lift_permille", expr(
        "(CAST(c_ab AS DECIMAL(38,0)) * CAST(n AS DECIMAL(38,0)) * " +
          "CAST(1000 AS DECIMAL(38,0))) div " +
          "(CAST(c_a AS DECIMAL(38,0)) * CAST(c_b AS DECIMAL(38,0)))"))
      .select("a", "b", "c_ab", "lift_permille")
      .orderBy(col("lift_permille").desc, col("a").asc, col("b").asc)
      .limit(topK)
  }

  def trendExact(df: DataFrame, groupCol: String,
      xCol: String, yCol: String): DataFrame = {
    val dec = "decimal(38,0)"
    df.select(col(groupCol), col(xCol).cast("long").as("x"),
        col(yCol).cast("long").as("y"))
      .groupBy(groupCol)
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
        sum(col("y")).as("sy"), sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"))
      .select(col(groupCol), col("n"),
        (col("n").cast(dec) * col("sxy").cast(dec) -
          col("sx").cast(dec) * col("sy").cast(dec)).as("slope_num"),
        (col("n").cast(dec) * col("sxx").cast(dec) -
          col("sx").cast(dec) * col("sx").cast(dec)).as("slope_den"))
  }
}
