package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._

/** Gopher-style document quality RULE-PACK — the hard FILTER stage of a
  * pretraining pipeline, distinct from q22's soft quality SCORE: each rule
  * is a boolean gate, and the per-source rejection matrix (which corpus
  * loses how many docs to which rule) is the report a data curator actually
  * reads before committing a mixture.
  *
  * Rules follow Rae et al. 2021 (Gopher, §A1.1) re-expressed over exact
  * integers so the flags hash-match a SQL oracle bit-for-bit:
  *   - length:   minTok <= n_tok <= maxTok        (Gopher: 50..100k words)
  *   - wordlen:  loLen·n_tok <= Σ|tok| <= hiLen·n_tok  (mean word length
  *               in [loLen, hiLen] — stated as cross-multiplied Longs,
  *               no division)
  *   - symbol:   symPermille·len(text) > 1000·|symbols| (symbol-to-char
  *               ratio below symPermille/1000; symbols = non-alnum-non-space)
  *   - stopword: >= minStop occurrences of the English stop set (Gopher
  *               requires 2 of its 8; the set here is [[LangMarkers]]'s
  *               "en" row, shared with q21/q22)
  *
  * Everything is one map-side pass over the text column — no shuffle until
  * the report's tiny per-source hash-agg — so the filter runs at scan
  * speed on any corpus size.
  */
object Quality {

  /** Per-doc rule flags; keeps the inputs (n_tok, sum_len, n_sym, c_stop)
    * so a report can aggregate or a filter can `where(col("pass"))`.
    */
  def ruleFlags(df: DataFrame, textCol: String,
      minTok: Long = 15L, maxTok: Long = 500L,
      loLen: Long = 3L, hiLen: Long = 8L,
      symPermille: Long = 100L, minStop: Long = 1L): DataFrame = {
    require(minTok >= 0 && maxTok >= minTok, s"bad token bounds [$minTok,$maxTok]")
    require(loLen >= 0 && hiLen >= loLen, s"bad word-length bounds [$loLen,$hiLen]")
    val toks = wsTokens(col(textCol))
    val nTok = size(toks).cast("long")
    val sumLen = aggregate(toks, lit(0L), (acc, x) => acc + length(x).cast("long"))
    val nSym = length(regexp_replace(col(textCol), "[A-Za-z0-9 ]", "")).cast("long")
    val cStop = markerCount(toks, LangMarkers.head._2).cast("long")
    val out = df
      .withColumn("n_tok", nTok)
      .withColumn("sum_len", sumLen)
      .withColumn("n_sym", nSym)
      .withColumn("c_stop", cStop)
      .withColumn("pass_len",
        col("n_tok") >= minTok && col("n_tok") <= maxTok)
      .withColumn("pass_wordlen",
        lit(loLen) * col("n_tok") <= col("sum_len") &&
          col("sum_len") <= lit(hiLen) * col("n_tok"))
      .withColumn("pass_symbol",
        lit(symPermille) * length(col(textCol)).cast("long") >
          lit(1000L) * col("n_sym"))
      .withColumn("pass_stop", col("c_stop") >= minStop)
    out.withColumn("pass",
      col("pass_len") && col("pass_wordlen") &&
        col("pass_symbol") && col("pass_stop"))
  }

  private def fails(flag: String): Column =
    sum(when(col(flag), 0L).otherwise(1L)).as(flag.replace("pass_", "fail_"))

  /** The curator's rejection matrix: per group, total docs, survivors, and
    * how many docs each rule rejects (rules judged independently — a doc
    * failing two rules counts in both columns).
    */
  def rejectionReport(df: DataFrame, groupCol: String, textCol: String,
      minTok: Long = 15L, maxTok: Long = 500L,
      loLen: Long = 3L, hiLen: Long = 8L,
      symPermille: Long = 100L, minStop: Long = 1L): DataFrame =
    ruleFlags(df, textCol, minTok, maxTok, loLen, hiLen, symPermille, minStop)
      .groupBy(groupCol)
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("pass"), 1L).otherwise(0L)).as("n_pass"),
        fails("pass_len"), fails("pass_wordlen"),
        fails("pass_symbol"), fails("pass_stop"))
      .orderBy(groupCol)
}
