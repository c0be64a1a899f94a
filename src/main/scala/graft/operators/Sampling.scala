package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Weight-aware sampling — the curation stage between uniform subsampling
  * (q41/q57) and mixture allocation (q72): pick rows with probability
  * proportional to a quality/size weight, reproducibly.
  *
  * Algorithm: priority sampling (Duffield, Lund & Thorup, JACM 2007).
  * Each row gets priority `w / u` with `u` uniform in (0,1]; the n
  * highest-priority rows per group are the sample. The estimator's
  * variance is near-optimal among weighted schemes, and — unlike
  * sequential reservoir algorithms — the priority is a PURE PER-ROW
  * function, so the "reservoir" is just a per-group top-n: map-side
  * heaps + one shuffle, no sequential state, no driver pass. That is
  * what makes it the 100-TB form of weighted sampling.
  *
  * Determinism discipline: `u` is the md5-low-32 coin of the row id
  * (TextFunctions.md5Unit's integer form, salted), and the comparison
  * key is computed in EXACT integer arithmetic —
  * `(w << 32) div (u32 + 1)` — so every engine ranks identically;
  * a float `w / u` could differ in the last ulp across libms and flip a
  * borderline selection. `w` must be a non-negative BIGINT; rows with
  * w <= 0 never sample (w/u = 0 sorts last, ties broken by id).
  */
object Sampling {

  /** Top-`n` rows per group by deterministic priority-sampling rank.
    * Output = input columns + `rk` (1-based within group), rows with
    * rk <= n, priority descending. `weightCol` must be LONG-typed and
    * < 2^31 or the shifted product overflows — milli-scaled money and
    * token counts fit comfortably.
    */
  def prioritySample(df: DataFrame, groupCols: Seq[String], idCol: String,
      weightCol: String, n: Int, salt: String = ""): DataFrame = {
    require(n >= 1, s"prioritySample: n $n must be >= 1")
    // exact-integer priority key: (w * 2^32) div (u32 + 1) — a Long
    // because w < 2^31 and the divisor >= 1; monotone in w/u, so ranking
    // by it IS ranking by the Duffield-Lund-Thorup priority
    val w = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(col("__pri").desc, col(idCol).asc)
    // row-path guard (the winnowing 2^20 discipline): the w*2^32 shift
    // overflows Long at w >= 2^31, which would silently corrupt the
    // ranking (non-ANSI) or fail with an opaque arithmetic error (ANSI) —
    // fail loud with the offending weight instead
    df.withColumn("__w2",
        when(col(weightCol) < lit(1L << 31),
          col(weightCol) * lit(4294967296L))
          .otherwise(raise_error(concat(
            lit(s"prioritySample: $weightCol "), col(weightCol).cast("string"),
            lit(" >= 2^31 — the shifted priority product overflows Long")))))
      .withColumn("__u1",
        TextFunctions.md5Low32(concat(lit(salt), col(idCol).cast("string"))) +
          lit(1L))
      .withColumn("__pri", expr("__w2 div __u1"))
      .withColumn("rk", row_number().over(w))
      .where(col("rk") <= n)
      .drop("__w2", "__u1", "__pri")
  }

  /** Temperature-rebalanced allocation over groups — the multilingual
    * pretraining step (XLM / mC4 exponential smoothing, here the
    * classic α = 1/2): a group's sample quota grows like √(its size),
    * boosting low-resource languages/sources without letting the head
    * drown the tail. Quotas in exact integers: w_g = ⌊√(n_g·scale)⌋
    * (sqrt is correctly-rounded IEEE — identical on any engine — and
    * the ⌊·⌋ makes the weight an integer the rest of the arithmetic
    * can't drift from), alloc_g = (total·w_g) div Σw. One tiny hash-agg
    * (|groups| rows) + a broadcast of the totals row. Output:
    * (groupCol, n, alloc).
    *
    * Precision note: n·scale above 2^53 rounds in the BIGINT→DOUBLE
    * cast — identically on every IEEE engine, so determinism holds; the
    * quota error is ≤ 1 part in 2^53.
    */
  def temperatureAllocation(df: DataFrame, groupCol: String, total: Long,
      scale: Long = 1000000L): DataFrame = {
    require(total >= 1 && scale >= 1,
      s"temperatureAllocation: total $total / scale $scale must be >= 1")
    val counts = df.groupBy(col(groupCol)).agg(count(lit(1)).as("n"))
      .withColumn("w",
        floor(sqrt(col("n").cast("double") * lit(scale.toDouble)))
          .cast("long"))
    val sums = counts.agg(sum(col("w")).as("__sw"))
    counts.crossJoin(broadcast(sums))
      .select(col(groupCol), col("n"),
        // row-path overflow guard (|groups| rows, negligible): total·w
        // must fit a Long — fails loud instead of wrapping (non-ANSI) or
        // erroring opaquely (ANSI)
        when(col("w") < lit(Long.MaxValue / math.max(total, 1L)),
          expr(s"(${total}L * w) div __sw"))
          .otherwise(raise_error(concat(
            lit(s"temperatureAllocation: total $total * weight "),
            col("w").cast("string"), lit(" overflows Long"))))
          .as("alloc"))
  }

  /** The rebalanced sample itself: within each group, the `alloc_g`
    * first rows under the deterministic md5 coin order (the q57
    * reservoir discipline — same rows survive on every engine/run).
    * Output: input columns + `rk` (1-based md5 rank within group).
    */
  def temperatureSample(df: DataFrame, groupCol: String, idCol: String,
      total: Long, scale: Long = 1000000L,
      salt: String = ""): DataFrame = {
    val alloc = temperatureAllocation(df, groupCol, total, scale)
      .select(col(groupCol), col("alloc"))
    val w = Window.partitionBy(col(groupCol))
      .orderBy(TextFunctions.md5Low32(
        concat(lit(salt), col(idCol).cast("string"))).asc, col(idCol).asc)
    df.join(broadcast(alloc), Seq(groupCol))
      .withColumn("rk", row_number().over(w).cast("long"))
      .where(col("rk") <= col("alloc"))
      .drop("alloc")
  }

  /** Epoch-weighted source mixing — the "data recipe" table of LLaMA-
    * style pretraining (N epochs of wiki, 0.6 of web …): each source's
    * repeat factor is its token budget over its available tokens,
    * realized per document as `floor(factor)` full copies plus one more
    * with probability `frac(factor)` — so every source's EXPECTED
    * emitted tokens hit its budget exactly while each decision stays a
    * deterministic per-row md5 coin (same copies on every run/engine).
    *
    * Exact-integer discipline: full = budget div avail, and the
    * fractional coin is the cross-multiplied compare
    * `u32 · avail < (budget mod avail) · 2³²` in DECIMAL(38,0) — no
    * float ratio, no overflow (the [[graft.operators.Ivm.trendOf]]
    * widening rule). Output: input columns + `copy_idx` (0-based), one
    * row per emitted copy. One tiny per-source agg + a broadcast join;
    * the expansion is a row-local explode.
    */
  def epochExpand(df: DataFrame, idCol: String, tokCol: String,
      sourceCol: String, budgets: Map[String, Long],
      salt: String = "epoch:"): DataFrame = {
    require(budgets.nonEmpty, "epochExpand: empty budget table")
    require(budgets.values.forall(_ >= 0), s"epochExpand: negative budget")
    val spark = df.sparkSession
    import spark.implicits._
    val b = budgets.toSeq.toDF(sourceCol, "__budget")
    val avail = df.groupBy(col(sourceCol))
      .agg(sum(col(tokCol)).as("__avail"))
    // Left join FROM the budget table so a budgeted source that is
    // absent from the corpus (recipe typo) or has zero available tokens
    // fails LOUD — the old inner join + non-ANSI `div` null made both
    // vanish silently. Corpus sources without a budget still drop (the
    // recipe is the selection). A zero budget on a present source is
    // fine (expands to nothing through __full = __rem = 0).
    val plan = b.join(avail, Seq(sourceCol), "left")
      .withColumn("__avail",
        when(col("__avail").isNull || col("__avail") <= 0,
          raise_error(format_string(
            "Sampling.epochExpand: budgeted source '%s' has no available " +
              "tokens (absent from the corpus or zero token sum) — check " +
              "the recipe's source names", col(sourceCol))).cast("bigint"))
          .otherwise(col("__avail")))
      .select(col(sourceCol),
        expr("__budget div __avail").as("__full"),
        expr("__budget % __avail").as("__rem"),
        col("__avail"))
    df.join(broadcast(plan), Seq(sourceCol))
      .withColumn("__u", TextFunctions.md5Low32(
        concat(lit(salt), col(idCol).cast("string"))))
      .withColumn("__extra",
        when(expr("CAST(__u AS DECIMAL(38,0)) * CAST(__avail AS DECIMAL(38,0))" +
          " < CAST(__rem AS DECIMAL(38,0)) * CAST(4294967296 AS DECIMAL(38,0))"),
          1).otherwise(0))
      .where(col("__full") + col("__extra") > 0)
      .withColumn("copy_idx",
        explode(sequence(lit(0L), col("__full") + col("__extra") - 1L)))
      .drop("__full", "__rem", "__avail", "__u", "__extra")
  }

  /** GLOBAL priority sample — same exact-integer Duffield-Lund-Thorup
    * priority as [[prioritySample]], but top-`n` over the whole frame
    * via `orderBy().limit()` ⇒ TakeOrderedAndProject (map-side heaps +
    * driver merge of n·partitions rows), NOT a single-partition window —
    * an empty `partitionBy` would funnel the entire corpus through one
    * task, the one shape that cannot survive 100 TB. The deterministic
    * `priority` stays in the output: it IS the selection evidence, and
    * any engine computing the same md5 coin reproduces the ranking
    * bit-for-bit.
    */
  def priorityTopN(df: DataFrame, idCol: String, weightCol: String,
      n: Int, salt: String = ""): DataFrame = {
    require(n >= 1, s"priorityTopN: n $n must be >= 1")
    df.withColumn("__w2",
        when(col(weightCol) < lit(1L << 31),
          col(weightCol) * lit(4294967296L))
          .otherwise(raise_error(concat(
            lit(s"priorityTopN: $weightCol "), col(weightCol).cast("string"),
            lit(" >= 2^31 — the shifted priority product overflows Long")))))
      .withColumn("__u1",
        TextFunctions.md5Low32(concat(lit(salt), col(idCol).cast("string"))) +
          lit(1L))
      .withColumn("priority", expr("__w2 div __u1"))
      .orderBy(col("priority").desc, col(idCol).asc)
      .limit(n)
      .drop("__w2", "__u1")
  }
}
