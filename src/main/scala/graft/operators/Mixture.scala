package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Domain-mixture optimization for training-data recipes — DoReMi-style
  * reweighting (Xie et al. 2023, "DoReMi: Optimizing Data Mixtures
  * Speeds Up Language Model Pretraining") with the multiplicative-weights
  * update of Arora–Hazan–Kale 2012 in EXACT scaled-integer arithmetic:
  *
  *  - per-domain EXCESS LOSS = clamp(avg proxy-model loss − avg
  *    reference-model loss, ≥ 0) — DoReMi's clipped regret signal
  *    (domains the proxy already fits as well as the reference get 0
  *    and decay toward the uniform floor);
  *  - T rounds of w_d ← w_d · (k·P + (excess̃_d − mean)) / (k·P), the
  *    first-order multiplicative-weights form of DoReMi's exponentiated
  *    gradient (η = 1/k; exact integers so the trajectory is
  *    oracle-replayable — `exp()` never bit-matches across engines).
  *
  * Scale shape: ONE map-side-combinable hash aggregate over the corpus
  * (the shuffle carries |domains| partial sums per task, never rows);
  * the MW loop runs on the collected |domains|-row table — a bounded
  * driver artifact (the Bpe merge-loop / KMeans-codebook discipline),
  * fail-loud past `maxDomains`. At 100 TB the corpus pass is the whole
  * cost; the loop is microseconds.
  *
  * All arithmetic is nonnegative-integer division (truncation == floor,
  * identical in JVM `/` and DuckDB `//`), so the full (round, domain,
  * weight, mixture) trajectory hash-matches an unrolled-CTE oracle
  * (q173).
  */
object Mixture {

  /** Parts-per-million fixed-point base for weights and mixtures. */
  final val P = 1000000L

  /** DoReMi-style domain reweighting. `df` carries one row per document
    * with a string domain column and nonnegative integral per-document
    * loss surrogates for the proxy and reference models. Returns the
    * full trajectory: (round, domain, excess_ppm, w, mix_ppm) for
    * round = 0 (uniform) .. iters, ordered by (round, domain).
    *
    *  - `excess_ppm`: the domain's clipped excess loss, normalized by
    *    the max over domains into [0, P] (so η is loss-scale-free);
    *  - `w`: the raw multiplicative weight (starts at P);
    *  - `mix_ppm`: w·P / Σw — the training mixture DoReMi feeds the
    *    large run, largest-excess domains upweighted.
    *
    * `invEta` is the inverse learning rate k (η = 1/k, k ≥ 2 keeps every
    * multiplier positive since |excess̃ − mean| ≤ P).
    */
  def domainReweight(df: DataFrame, domainCol: String, proxyCol: String,
      refCol: String, iters: Int = 5, invEta: Int = 2,
      maxDomains: Int = 1 << 16): DataFrame =
    domainReweightFromStats(domainStats(df, domainCol, proxyCol, refCol),
      iters, invEta, maxDomains)
      .withColumnRenamed("domain", domainCol)

  /** The additive per-domain loss-stat MONOID behind [[domainReweight]]:
    * (domain, doc count, Σ proxy loss, Σ ref loss) — key-wise sums, so
    * the state maintains in O(delta) (the q127/q170 IVM discipline: a
    * daily ingest merges its delta instead of rescanning the corpus) and
    * the reweighting is served off the bounded state
    * ([[domainReweightFromStats]]). One map-side-combinable hash agg.
    */
  def domainStats(df: DataFrame, domainCol: String, proxyCol: String,
      refCol: String): DataFrame =
    df.groupBy(col(domainCol).as("__d")).agg(
      count(lit(1)).as("n"),
      sum(col(proxyCol).cast("long")).as("sp"),
      sum(col(refCol).cast("long")).as("sr"))

  /** Merge loss-stat states by key-wise sum — O(state), never the
    * corpus. merge == recompute is oracle-proven by q175 (its oracle is
    * q173's from-scratch unrolled CTE verbatim).
    */
  def mergeDomainStats(states: Seq[DataFrame]): DataFrame = {
    require(states.nonEmpty, "Mixture.mergeDomainStats: no states")
    states.reduce(_ unionByName _)
      .groupBy(col("__d"))
      .agg(sum(col("n")).as("n"), sum(col("sp")).as("sp"),
        sum(col("sr")).as("sr"))
  }

  /** The MW loop served off a (possibly incrementally merged)
    * [[domainStats]] state — output column `domain`. */
  def domainReweightFromStats(statsDf: DataFrame, iters: Int = 5,
      invEta: Int = 2, maxDomains: Int = 1 << 16): DataFrame = {
    require(iters >= 1, s"Mixture.domainReweight: iters $iters must be >= 1")
    require(invEta >= 2, s"Mixture.domainReweight: invEta $invEta must be >= 2")
    val spark = statsDf.sparkSession
    import spark.implicits._

    val stats = statsDf
      .orderBy(col("__d")).limit(maxDomains + 1)
      .collect()
    require(stats.length <= maxDomains,
      s"Mixture.domainReweight: more than $maxDomains domains — the MW " +
        "loop is a bounded driver artifact; coarsen the domain key")
    require(stats.nonEmpty, "Mixture.domainReweight: empty input")

    val doms = stats.map { r =>
      val (dom, n, sp, sr) =
        (r.getAs[String](0), r.getLong(1), r.getLong(2), r.getLong(3))
      require(sp >= 0 && sr >= 0 && sp < Long.MaxValue / P &&
        sr < Long.MaxValue / P,
        s"Mixture.domainReweight: loss sums for '$dom' outside the exact " +
          "fixed-point domain — rescale the per-document losses")
      val ex = math.max(0L, sp * P / n - sr * P / n)
      (dom, ex)
    }
    val mx = math.max(doms.map(_._2).max, 1L)
    val exn = doms.map { case (dom, ex) => (dom, ex * P / mx) }

    val kP = invEta * P
    var w = exn.map(_ => P)
    val rows = Seq.newBuilder[(Long, String, Long, Long, Long)]
    def emit(round: Int): Unit = {
      val tot = w.sum
      exn.indices.foreach { i =>
        rows += ((round.toLong, exn(i)._1, exn(i)._2, w(i), w(i) * P / tot))
      }
    }
    emit(0)
    // overflow fence: Σ w·excess̃ and w·(kP+δ) must stay in Long — w grows
    // ≤ (1+1/k)× per round, so this only trips at extreme iters
    val wCap = Long.MaxValue / (kP + P) / doms.length
    for (t <- 1 to iters) {
      require(w.forall(x => x > 0 && x < wCap),
        s"Mixture.domainReweight: weights left the exact Long domain at " +
          s"round $t — lower iters or raise invEta")
      val tot = w.sum
      val mean = exn.indices.map(i => w(i) * exn(i)._2).sum / tot
      w = exn.indices.toArray.map(i => w(i) * (kP + exn(i)._2 - mean) / kP)
      emit(t)
    }
    rows.result().toDF("round", "domain", "excess_ppm", "w", "mix_ppm")
  }

  /** Integer token-budget allocation from a mixture — the bridge from
    * [[domainReweight]]'s optimized mix to
    * [[Sampling.epochExpand]]'s per-source budgets: largest-remainder
    * apportionment (Hamilton's method) of `totalTokens` across the
    * (domain, mix_ppm) rows, EXACT by construction — floor quotas
    * `total·mix/P`, then the leftover tokens go one each to the largest
    * remainders (`total·mix mod P`, domain-ascending tie-break), so the
    * budgets always sum to exactly `totalTokens` (a float rounding pass
    * can be off by ±|domains| and either over-commits the token budget
    * or silently under-trains).
    *
    * All-Long arithmetic (`totalTokens` ≤ Long.Max / P fail-loud), a
    * |domains|-row window — the input is the bounded mixture table, not
    * the corpus. Output: (domain, mix_ppm, budget), ordered by domain.
    */
  def budgetsFromMix(mix: DataFrame, totalTokens: Long): DataFrame = {
    require(totalTokens >= 0,
      s"Mixture.budgetsFromMix: totalTokens $totalTokens must be >= 0")
    require(totalTokens < Long.MaxValue / P,
      s"Mixture.budgetsFromMix: totalTokens $totalTokens outside the " +
        "exact fixed-point domain — allocate in larger units (e.g. Ki-tokens)")
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("__rem").desc, col("domain").asc)
    // normalize by the ACTUAL share sum S, not the nominal P: mix_ppm
    // values are themselves floored (Σ ≤ P), and dividing by P would
    // leave more leftover tokens than domains — the +1 pass could then
    // never restore the exact sum. With S the leftover is < |domains|
    // by the standard largest-remainder argument. S = 0 (degenerate
    // all-zero mix) fails loud rather than dividing by zero.
    val s = broadcast(mix.agg(
      when(sum(col("mix_ppm")) > 0, sum(col("mix_ppm")))
        .otherwise(raise_error(
          lit("Mixture.budgetsFromMix: mixture sums to zero")))
        .as("__s")))
    val floors = mix.select(col("domain"), col("mix_ppm"))
      .crossJoin(s)
      // `div` (IntegralDivide), not `/` (Divide -> DOUBLE on longs)
      .withColumn("__floor", expr(s"mix_ppm * ${totalTokens}L div __s"))
      .withColumn("__rem", expr(s"(mix_ppm * ${totalTokens}L) % __s"))
    // leftover = total − Σ floors: a second 1-row agg over the same
    // bounded relation; the global window is |domains| rows by contract
    floors
      .crossJoin(broadcast(floors.agg(
        (lit(totalTokens) - sum(col("__floor"))).as("__left"))))
      .withColumn("__rank", row_number().over(w))
      .select(col("domain"), col("mix_ppm"),
        (col("__floor") + when(col("__rank") <= col("__left"), 1L)
          .otherwise(0L)).as("budget"))
      .orderBy("domain")
  }
}
