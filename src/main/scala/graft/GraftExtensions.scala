package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.graftbridge.ColumnBridge

import graft.functions.expressions.{Md5Low60, MinHashSig, NearestCell, RollingHash, RpBucket, SimHash64, VectorDistance}

/** Session extension registering the engine's codegen expressions as SQL
  * functions — `spark.sql.extensions=graft.GraftExtensions` (or
  * `.withExtensions(new GraftExtensions)`) makes
  * `SELECT vec_l2sq(a, b)` etc. available to pure-SQL users.
  *
  * Functions: vec_l2sq, vec_dot, minhash_sig(hashes, h), simhash64,
  * rolling_hash, nearest_cell, rp_bucket, scrub_text, zorder2, sax_word.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "")

  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((FunctionIdentifier("vec_l2sq"),
      info("vec_l2sq", "vec_l2sq(a, b) - squared L2 distance of two numeric arrays"),
      (exprs: Seq[Expression]) => VectorDistance(exprs(0), exprs(1), squared = true)))
    e.injectFunction((FunctionIdentifier("vec_dot"),
      info("vec_dot", "vec_dot(a, b) - dot product of two numeric arrays"),
      (exprs: Seq[Expression]) => VectorDistance(exprs(0), exprs(1), squared = false)))
    e.injectFunction((FunctionIdentifier("minhash_sig"),
      info("minhash_sig", "minhash_sig(hashes, h) - h-element MinHash signature over array<bigint>"),
      (exprs: Seq[Expression]) => {
        // h must be a positive integer literal — validate here so misuse
        // fails with a clear analysis message, not an internal exception
        if (exprs.length != 2) throw new IllegalArgumentException(
          s"minhash_sig expects exactly 2 arguments (hashes, numHashes), got ${exprs.length}")
        val h = exprs(1) match {
          case e2 if e2.foldable => e2.eval(null) match {
            case n: Number if n.intValue() > 0 => n.intValue()
            case other => throw new IllegalArgumentException(
              s"minhash_sig numHashes must be a positive integer literal, got $other")
          }
          case _ => throw new IllegalArgumentException(
            "minhash_sig numHashes must be a literal, not a column")
        }
        MinHashSig(exprs(0), h)
      }))
    e.injectFunction((FunctionIdentifier("md5_low60"),
      info("md5_low60", "md5_low60(s) - low 60 bits of md5(s) as bigint (the gram-hash space)"),
      (exprs: Seq[Expression]) => Md5Low60(exprs(0))))
    e.injectFunction((FunctionIdentifier("nearest_cell"),
      info("nearest_cell", "nearest_cell(vec, cents) - cid of the squared-L2-nearest centroid; cents is array<struct<cid bigint, ce array<double>>>"),
      (exprs: Seq[Expression]) => NearestCell(exprs(0), exprs(1))))
    e.injectFunction((FunctionIdentifier("rp_bucket"),
      info("rp_bucket", "rp_bucket(vec, planes) - sign-bit LSH bucket; planes is array<struct<pid bigint, pe array<double>>>"),
      (exprs: Seq[Expression]) => RpBucket(exprs(0), exprs(1))))
    e.injectFunction((FunctionIdentifier("simhash64"),
      info("simhash64", "simhash64(hashes) - 60-bit SimHash over array<bigint>"),
      (exprs: Seq[Expression]) => SimHash64(exprs(0))))
    e.injectFunction((FunctionIdentifier("rolling_hash"),
      info("rolling_hash", "rolling_hash(text) - polynomial fingerprint mod 1e9+7"),
      (exprs: Seq[Expression]) => RollingHash(exprs(0))))
    // Composite functions: built from raw catalyst nodes / parsed SQL —
    // a bridged Column tree would embed opaque ColumnNodeExpressions that
    // the analyzer leaves unresolved inside an injected function
    e.injectFunction((FunctionIdentifier("scrub_text"),
      info("scrub_text", "scrub_text(s) - redact URLs/emails/IPs/phones to typed tokens"),
      (exprs: Seq[Expression]) => {
        import org.apache.spark.sql.catalyst.expressions.{Literal, RegExpReplace}
        import graft.operators.Scrub
        def re(sub: Expression, pat: String, rep: String): Expression =
          RegExpReplace(sub, Literal(pat), Literal(rep))
        re(re(re(re(exprs(0), Scrub.UrlRe, "<URL>"), Scrub.EmailRe, "<EMAIL>"),
          Scrub.IpRe, "<IP>"), Scrub.PhoneRe, "<PHONE>")
      }))
    e.injectFunction((FunctionIdentifier("zorder2"),
      info("zorder2", "zorder2(a, b) - morton (z-order) interleave of two integral values for layout clustering"),
      (exprs: Seq[Expression]) => {
        import org.apache.spark.sql.catalyst.expressions.{BitwiseAnd, BitwiseOr, Cast, Literal, ShiftLeft}
        import org.apache.spark.sql.types.LongType
        if (exprs.length != 2) throw new IllegalArgumentException(
          s"zorder2 expects exactly 2 arguments (a, b), got ${exprs.length}")
        // the Layout.spreadBits magic-mask chain as raw catalyst nodes
        def spread(x0: Expression): Expression = {
          var v: Expression = BitwiseAnd(Cast(x0, LongType), Literal(0x7FFFFFFFL))
          def step(sh: Int, mask: Long): Unit =
            v = BitwiseAnd(BitwiseOr(v, ShiftLeft(v, Literal(sh))), Literal(mask))
          step(16, 0x0000FFFF0000FFFFL)
          step(8, 0x00FF00FF00FF00FFL)
          step(4, 0x0F0F0F0F0F0F0F0FL)
          step(2, 0x3333333333333333L)
          step(1, 0x5555555555555555L)
          v
        }
        BitwiseOr(spread(exprs(0)), ShiftLeft(spread(exprs(1)), Literal(1)))
      }))
    e.injectFunction((FunctionIdentifier("blocklist_matches"),
      info("blocklist_matches", "blocklist_matches(text, array('p1','p2',…)) - distinct blocklist patterns present (one Aho-Corasick pass)"),
      (exprs: Seq[Expression]) => {
        if (exprs.length != 2) throw new IllegalArgumentException(
          s"blocklist_matches expects exactly 2 arguments (text, patterns), got ${exprs.length}")
        val pats = exprs(1) match {
          case e2 if e2.foldable => e2.eval(null) match {
            case a: org.apache.spark.sql.catalyst.util.ArrayData =>
              (0 until a.numElements()).map { i =>
                if (a.isNullAt(i)) throw new IllegalArgumentException(
                  "blocklist_matches: null pattern")
                a.getUTF8String(i).toString
              }
            case other => throw new IllegalArgumentException(
              s"blocklist_matches patterns must be an array literal, got $other")
          }
          case _ => throw new IllegalArgumentException(
            "blocklist_matches patterns must be a literal array, not a column")
        }
        graft.functions.expressions.BlocklistMatches(exprs(0), pats)
      }))
    e.injectFunction((FunctionIdentifier("sax_word"),
      info("sax_word", "sax_word(series) - 4-segment alphabet-4 SAX shape word of array<double>"),
      (exprs: Seq[Expression]) => {
        if (exprs.length != 1) throw new IllegalArgumentException(
          s"sax_word expects exactly 1 argument (series), got ${exprs.length}")
        org.apache.spark.sql.catalyst.parser.CatalystSqlParser
          .parseExpression(graft.operators.Sax.saxWordSql(exprs(0).sql))
      }))
  }
}
