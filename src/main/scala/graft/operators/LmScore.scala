package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.wsTokens

/** Corpus-conditioned bigram familiarity scoring — the integer-exact core
  * of an LM-based quality filter (the CCNet-style "how typical of the
  * corpus is this document" signal, Wenzek et al. 2020). A smoothed bigram
  * LM's perplexity is a function of corpus n-gram counts; this keeps the
  * counts themselves (familiarity = Σ corpus frequency over the document's
  * bigrams, hapax = bigrams occurring nowhere else in the corpus) so
  * scores stay exact integers — engine-portable, oracle-checkable, and
  * free of libm log() parity hazards. Low familiarity / high hapax =
  * novel-or-junk outlier; the filter thresholds on the ratio.
  *
  * Scale shape: bigrams derive ROW-LOCALLY from each token array (a
  * `transform` over the array — no position self-join), corpus counts are
  * one hash aggregation on bigram (map-side partial combine bounds the
  * shuffle by vocabulary, not corpus size), and the score join shuffles
  * both sides by bigram — never a broadcast of the vocabulary, which at
  * 100 TB does not fit. Stopword-pair heavy hitters skew the score join's
  * bigram key; AQE's skew split covers it (one bigram's rows join one
  * count row, trivially splittable).
  */
object LmScore {

  /** (id, bigram) rows: consecutive whitespace-token pairs, derived
    * row-locally. Documents with fewer than two tokens yield no rows.
    */
  def docBigrams(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol), wsTokens(col(textCol)).as("_toks"))
      .select(col(idCol), explode(expr(
        "transform(slice(_toks, 1, size(_toks) - 1)," +
          " (w, i) -> concat(w, ' ', _toks[i + 1]))")).as("bigram"))

  /** Corpus bigram frequencies: (bigram, cnt). */
  def bigramCounts(bigrams: DataFrame): DataFrame =
    bigrams.groupBy(col("bigram")).agg(count(lit(1)).as("cnt"))

  /** Per-document familiarity stats against the corpus the documents
    * themselves form: (id, n_bigrams, familiarity, n_hapax) where
    * familiarity = Σ corpus count over the document's bigram occurrences
    * and n_hapax counts bigrams whose only corpus occurrence is this one.
    */
  def noveltyStats(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val bg = docBigrams(docs, idCol, textCol)
    bg.join(bigramCounts(bg), Seq("bigram"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"),
        sum(col("cnt")).as("familiarity"),
        sum(when(col("cnt") === 1, 1L).otherwise(0L)).as("n_hapax"))
  }

  /** CCNet's perplexity-tier PARTITION (Wenzek et al. 2020 §4.3): the
    * corpus split into head / middle / tail thirds by LM familiarity
    * (the [[noveltyStats]] bigram score as the perplexity analog —
    * exact floor-milli familiarity per bigram; CCNet keeps head+middle
    * and drops the tail). Tier boundaries are VALUE CUTOFFS from an
    * exact integer score histogram — equal scores always land in the
    * same tier, and the corpus never crosses a global sort: the q99
    * histogram discipline (per-value hash-agg, a window over the
    * artifact-sized distinct-value relation, broadcast cutoffs, one
    * row-local CASE). Under ties the thirds are approximate — exactly
    * CCNet's cutoff semantics. Only scoreable docs (>= 2 tokens)
    * appear, inheriting noveltyStats' domain.
    * Output: (idCol, lm_milli, tier).
    */
  def perplexityTiers(docs: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val sc = noveltyStats(docs, idCol, textCol)
      .select(col(idCol),
        expr("(familiarity * 1000) div n_bigrams").as("lm_milli"))
    val hist = sc.groupBy(col("lm_milli")).agg(count(lit(1)).as("c"))
    // ascending cumulative over the DISTINCT-VALUE relation only
    // (artifact-sized; the corpus itself never enters a window)
    val W = org.apache.spark.sql.expressions.Window
    val ordered = W.orderBy(col("lm_milli"))
    // cum AND the grand total both come from the ONE histogram relation
    // (q99's window discipline) — no second score lineage just for n
    val cuts = hist
      .withColumn("cum", sum(col("c"))
        .over(ordered.rowsBetween(W.unboundedPreceding, W.currentRow)))
      .withColumn("n", sum(col("c"))
        .over(ordered.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)))
      .agg(
        min(when(col("cum") * 3 >= col("n"), col("lm_milli"))).as("t1"),
        min(when(col("cum") * 3 >= col("n") * 2, col("lm_milli"))).as("t2"))
    sc.crossJoin(broadcast(cuts))
      .select(col(idCol), col("lm_milli"),
        when(col("lm_milli") <= col("t1"), "tail")
          .when(col("lm_milli") <= col("t2"), "middle")
          .otherwise("head").as("tier"))
  }
}
