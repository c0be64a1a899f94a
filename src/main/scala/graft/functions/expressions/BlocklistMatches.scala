package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Aho-Corasick multi-pattern matcher — the blocklist stage of a content
  * filter: count how many DISTINCT blocklist terms occur as substrings of
  * the text, in ONE pass over the characters regardless of how many
  * thousands of patterns the list holds (a `contains` per pattern scans
  * the text |patterns| times; a regex alternation backtracks). The
  * automaton compiles ONCE driver-side and rides the expression as a
  * reference object (the score-array pattern of [[DsirWeight]]), so the
  * scan is row-local, zero-shuffle, codegen-resident.
  *
  * Semantics: case-sensitive substring match; result = number of distinct
  * patterns present (0 for clean text, null text → 0). Pattern list must
  * be non-empty with no empty/duplicate strings.
  */
case class BlocklistMatches(child: Expression, patterns: Seq[String])
    extends UnaryExpression {

  require(patterns.nonEmpty, "blocklist_matches: empty pattern list")
  require(patterns.forall(_.nonEmpty), "blocklist_matches: empty pattern")
  require(patterns.distinct.size == patterns.size,
    "blocklist_matches: duplicate patterns")

  @transient private lazy val automaton = AhoCorasick.compile(patterns)

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"blocklist_matches expects string, got ${t.catalogString}")
  }

  override def nullable: Boolean = false

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) 0
    else automaton.countDistinct(v.toString)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val acRef = ctx.addReferenceObj("blocklistAc", automaton,
      classOf[AhoCorasick].getName)
    val childGen = child.genCode(ctx)
    val resultCode =
      code"""
        ${childGen.code}
        int ${ev.value} = ${childGen.isNull}
          ? 0 : $acRef.countDistinct(${childGen.value}.toString());
      """
    ev.copy(code = resultCode, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "blocklist_matches"
}

object BlocklistMatches {
  def column(text: Column, patterns: Seq[String]): Column =
    ColumnBridge.column(
      BlocklistMatches(ColumnBridge.expression(text), patterns))
}

/** Classic Aho-Corasick over chars: trie + BFS failure links + output
  * sets (pattern ids, deduplicated through the fail chain at build time
  * via inherited outputs). Serializable — the compiled automaton ships
  * with the task closure once.
  */
class AhoCorasick private (
    next: Array[scala.collection.immutable.Map[Char, Int]],
    fail: Array[Int],
    out: Array[Array[Int]],
    val nPatterns: Int) extends Serializable {

  /** Number of DISTINCT patterns occurring in `text` — one pass. */
  def countDistinct(text: String): Int = {
    if (nPatterns == 0) return 0
    val seen = new Array[Boolean](nPatterns)
    var found = 0
    var s = 0
    var i = 0
    while (i < text.length && found < nPatterns) {
      val c = text.charAt(i)
      var st = s
      while (st != 0 && !next(st).contains(c)) st = fail(st)
      s = next(st).getOrElse(c, 0)
      val o = out(s)
      var j = 0
      while (j < o.length) {
        if (!seen(o(j))) { seen(o(j)) = true; found += 1 }
        j += 1
      }
      i += 1
    }
    found
  }
}

object AhoCorasick {
  def compile(patterns: Seq[String]): AhoCorasick = {
    val next = scala.collection.mutable.ArrayBuffer(
      scala.collection.immutable.Map.empty[Char, Int])
    val outB = scala.collection.mutable.ArrayBuffer(
      scala.collection.mutable.Set.empty[Int])
    patterns.zipWithIndex.foreach { case (p, pid) =>
      var s = 0
      p.foreach { c =>
        next(s).get(c) match {
          case Some(t) => s = t
          case None =>
            next += scala.collection.immutable.Map.empty[Char, Int]
            outB += scala.collection.mutable.Set.empty[Int]
            next(s) = next(s) + (c -> (next.size - 1))
            s = next.size - 1
        }
      }
      outB(s) += pid
    }
    val n = next.size
    val fail = new Array[Int](n)
    val queue = scala.collection.mutable.Queue.empty[Int]
    next(0).values.foreach { t => fail(t) = 0; queue += t }
    while (queue.nonEmpty) {
      val s = queue.dequeue()
      next(s).foreach { case (c, t) =>
        var f = fail(s)
        while (f != 0 && !next(f).contains(c)) f = fail(f)
        fail(t) = if (next(f).contains(c) && next(f)(c) != t) next(f)(c) else 0
        outB(t) ++= outB(fail(t)) // inherit outputs through the fail chain
        queue += t
      }
    }
    new AhoCorasick(next.toArray, fail, outB.map(_.toArray.sorted).toArray,
      patterns.size)
  }
}
