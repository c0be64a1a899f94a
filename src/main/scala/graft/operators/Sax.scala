package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._

/** SAX — Symbolic Aggregate approXimation (Lin et al. 2003, "A Symbolic
  * Representation of Time Series"): z-normalize a series, reduce it to
  * `segments` piecewise-aggregate means (PAA), then map each mean to a
  * letter by fixed N(0,1) breakpoints. Equal words ⇒ similar shape, so the
  * word is an equi-join BLOCKING key for series similarity — the symbolic
  * sibling of the centered sign-LSH path (q47), trading its random planes
  * for a shape-aware, interpretable key.
  *
  * Scale shape: word building is one narrow projection; the pair join is
  * an equi-join on the word (shuffle ∝ true block sizes, never n²). At
  * 100 TB the word is a write-time column and each block is a partition.
  *
  * Float-parity contract (the engine's oracle discipline): means divide
  * by power-of-two lengths where the fixtures guarantee it (8-long
  * series, segLen 2), variance/std use the same left-fold + correctly-
  * rounded sqrt/divide on both engines, and breakpoint comparisons see
  * bit-identical inputs — so SAX words hash-match DuckDB exactly.
  */
object Sax {

  /** N(0,1) quartile breakpoints — alphabet size 4 (letters a..d). */
  val Breakpoints4: Seq[Double] = Seq(-0.6745, 0.0, 0.6745)

  /** (idCol, seriesCol, sax): the SAX word per row. `segments` should
    * divide the series length (the trailing remainder would otherwise
    * shorten the last segment's mean window).
    */
  def saxWords(df: DataFrame, idCol: String, seriesCol: String,
      segments: Int = 4, breakpoints: Seq[Double] = Breakpoints4): DataFrame = {
    require(segments >= 1, s"saxWords: segments must be >= 1, got $segments")
    require(breakpoints == breakpoints.sorted, "saxWords: breakpoints must ascend")
    val alphabet = (0 to breakpoints.length).map(i => ('a' + i).toChar.toString)
    // mean and std are MATERIALIZED columns before any lambda references
    // them (HOF lambda re-evaluation rule, TextFunctions.ngramsOfTokens)
    val n = size(col(seriesCol)).cast("double")
    val withMean = df.select(col(idCol), col(seriesCol),
      (aggregate(col(seriesCol), lit(0.0), (a, x) => a + x) / n).as("__mean"))
    val withStd = withMean.withColumn("__std",
      sqrt(aggregate(col(seriesCol), lit(0.0),
        (a, x) => a + (x - col("__mean")) * (x - col("__mean"))) /
        size(col(seriesCol)).cast("double")))
    val withZ = withStd.withColumn("__z",
      when(col("__std") === lit(0.0),
        transform(col(seriesCol), _ => lit(0.0)))
        .otherwise(transform(col(seriesCol),
          x => (x - col("__mean")) / col("__std"))))
      .withColumn("__slen", (size(col("__z")) / segments).cast("int"))
    val paa = transform(sequence(lit(0), lit(segments - 1)),
      i => aggregate(slice(col("__z"), i * col("__slen") + 1, col("__slen")),
        lit(0.0), (a, x) => a + x) / col("__slen").cast("double"))
    val word = concat_ws("", transform(paa, v =>
      element_at(typedLit(alphabet),
        breakpoints.map(b => when(v > lit(b), 1).otherwise(0))
          .reduceLeft(_ + _) + 1)))
    withZ.select(col(idCol), col(seriesCol), word.as("sax"))
  }

  /** Single-expression SAX word — the SQL-function form (`sax_word` via
    * GraftExtensions): same semantics as [[saxWords]], self-contained in
    * one Column. The inner mean/std re-evaluate per lambda element (the
    * HOF re-evaluation cost [[saxWords]] materializes away), which is
    * fine for short series; DataFrame paths should prefer [[saxWords]].
    */
  def saxWordCol(series: Column, segments: Int = 4,
      breakpoints: Seq[Double] = Breakpoints4): Column = {
    val alphabet = (0 to breakpoints.length).map(i => ('a' + i).toChar.toString)
    val n = size(series).cast("double")
    val mean = aggregate(series, lit(0.0), (a, x) => a + x) / n
    val std = sqrt(aggregate(series, lit(0.0),
      (a, x) => a + (x - mean) * (x - mean)) / n)
    val z = when(std === lit(0.0), transform(series, _ => lit(0.0)))
      .otherwise(transform(series, x => (x - mean) / std))
    val slen = (size(series) / segments).cast("int")
    val paa = transform(sequence(lit(0), lit(segments - 1)),
      i => aggregate(slice(z, i * slen + 1, slen), lit(0.0),
        (a, x) => a + x) / slen.cast("double"))
    concat_ws("", transform(paa, v =>
      element_at(typedLit(alphabet),
        breakpoints.map(b => when(v > lit(b), 1).otherwise(0))
          .reduceLeft(_ + _) + 1)))
  }

  /** SQL text of the default (4-segment, alphabet-4) SAX word over the
    * rendered series expression `arg` — the `sax_word` SQL function's
    * body (parsed by the extension at resolution time). Semantics match
    * [[saxWords]]; sub-expressions expand textually (mean inside std
    * etc.), which re-evaluates them per reference — fine for short
    * series, and the only form an injected SQL function can take without
    * opaque column nodes.
    */
  def saxWordSql(arg: String): String = {
    val mean = s"(aggregate($arg, 0D, (a, x) -> a + x) / cast(size($arg) as double))"
    val std = s"sqrt(aggregate($arg, 0D, (a, x) -> a + (x - $mean) * (x - $mean)) / cast(size($arg) as double))"
    val z = s"(case when $std = 0D then transform($arg, x -> 0D) " +
      s"else transform($arg, x -> (x - $mean) / $std) end)"
    val slen = s"cast(size($arg) / 4 as int)"
    val paa = s"transform(sequence(0, 3), i -> " +
      s"aggregate(slice($z, i * $slen + 1, $slen), 0D, (a, x) -> a + x) / cast($slen as double))"
    s"concat_ws('', transform($paa, v -> element_at(array('a','b','c','d'), " +
      "1 + (case when v > -0.6745D then 1 else 0 end) " +
      "+ (case when v > 0D then 1 else 0 end) " +
      "+ (case when v > 0.6745D then 1 else 0 end))))"
  }

  /** All (a < b) pairs sharing a SAX word, cosine re-ranked over the RAW
    * series — the blocked similarity join. Output: (a, b, sax, cos_sim).
    */
  def saxBlockedPairs(df: DataFrame, idCol: String, seriesCol: String,
      segments: Int = 4, breakpoints: Seq[Double] = Breakpoints4): DataFrame = {
    val w = saxWords(df, idCol, seriesCol, segments, breakpoints)
    val a = w.select(col(idCol).as("a"), col(seriesCol).as("sa"), col("sax"))
    val b = w.select(col(idCol).as("b"), col(seriesCol).as("sb"),
      col("sax").as("__sax_b"))
    a.join(b, col("sax") === col("__sax_b") && col("a") < col("b"))
      .select(col("a"), col("b"), col("sax"),
        cosine(col("sa"), col("sb")).as("cos_sim"))
  }
}
