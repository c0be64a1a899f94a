package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Parsed Public Suffix List rules, frozen driver-side as three SORTED
  * string arrays (binary-search probe — the [[CountInSortedSet]]
  * codebook discipline: the set compiles once on the driver and rides
  * the expression as reference objects; per-row cost is
  * labels × log |rules|, independent of corpus size).
  *
  *  - `exact`: plain rules (`com`, `co.uk`, `github.io`)
  *  - `wildcard`: the BASE of `*.`-rules (`*.ck` is stored as `ck` —
  *    the rule matches any suffix with exactly one extra label)
  *  - `exception`: `!`-rules minus the bang (`!www.ck` → `www.ck`);
  *    per the PSL algorithm an exception prevails over every other
  *    matching rule and its public suffix is the rule minus its
  *    leftmost label
  */
case class PslRules(
    exact: Array[String],
    wildcard: Array[String],
    exception: Array[String]) {
  require(exact.nonEmpty, "PslRules: empty exact-rule set")
  def ruleCount: Int = exact.length + wildcard.length + exception.length
}

/** Registered domain (eTLD+1) of a lowercase host under a real Public
  * Suffix List — the production form of
  * [[graft.operators.Web.registeredDomain]]'s documented swap seam
  * (that one recognizes a 16-entry built-in multi-part list; this one
  * evaluates the full PSL algorithm: longest matching rule prevails,
  * exceptions beat everything, unmatched hosts fall to the implicit
  * `*` rule = last label).
  *
  * Fail-soft contract, matching the built-in: a host that IS a public
  * suffix (`co.uk`), a single label (`localhost`), or empty returns
  * AS-IS — curation filters on non-empty / dot-containing output, it
  * never throws on a 100-TB dirty corpus.
  *
  * Null-safe (null → null), codegen via a static helper (the
  * [[CountInSortedSetUtil]] discipline).
  */
case class RegisteredDomainPsl(child: Expression, rules: PslRules)
    extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"registered_domain_psl expects string, got ${t.catalogString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    RegisteredDomainPslUtil.registered(input.asInstanceOf[UTF8String],
      rules.exact, rules.wildcard, rules.exception)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val e = ctx.addReferenceObj("pslExact", rules.exact, "java.lang.String[]")
    val w = ctx.addReferenceObj("pslWild", rules.wildcard, "java.lang.String[]")
    val x = ctx.addReferenceObj("pslExc", rules.exception, "java.lang.String[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.expressions.RegisteredDomainPslUtil.registered($c, $e, $w, $x)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "registered_domain_psl"
}

object RegisteredDomainPsl {
  def column(host: Column, rules: PslRules): Column =
    ColumnBridge.column(
      RegisteredDomainPsl(ColumnBridge.expression(host), rules))
}

object RegisteredDomainPslUtil {

  /** The PSL algorithm (publicsuffix.org/list, "Formal algorithm") over
    * pre-sorted rule arrays. Suffixes are probed LONGEST-FIRST; the
    * first exception hit wins outright (spec: "If more than one rule
    * matches, the prevailing rule is the one which is an exception
    * rule"), else the first (= longest) exact-or-wildcard hit, else the
    * implicit `*` rule (last label is the public suffix).
    */
  def registered(host: UTF8String, exact: Array[String],
      wild: Array[String], exc: Array[String]): UTF8String = {
    val s = host.toString.toLowerCase(java.util.Locale.ROOT)
    // label start offsets: starts(0)=0, starts(k)=index after k-th dot
    val n = {
      var dots = 0
      var i = 0
      while (i < s.length) { if (s.charAt(i) == '.') dots += 1; i += 1 }
      dots + 1
    }
    if (n <= 1 || s.isEmpty) return host
    val starts = new Array[Int](n)
    var li = 1
    var i = 0
    while (i < s.length) {
      if (s.charAt(i) == '.') { starts(li) = i + 1; li += 1 }
      i += 1
    }
    // a trailing dot / empty label ("a..b", "a.b.") → fail-soft as-is:
    // no real registrable host has one and the PSL algorithm is
    // undefined there
    var k = 0
    while (k < n) {
      if (starts(k) >= s.length ||
        (k > 0 && starts(k) == starts(k - 1) + 1)) return host
      k += 1
    }
    // exception pass, longest suffix first
    var e = 0
    while (e < n) {
      if (java.util.Arrays.binarySearch(
          exc.asInstanceOf[Array[AnyRef]], s.substring(starts(e))) >= 0) {
        // public suffix = rule minus leftmost label; registered = rule
        return utf8(s, starts(e), host)
      }
      e += 1
    }
    // normal pass, longest suffix first: exact, or wildcard over the
    // one-label-shorter tail
    var psStart = -1
    var j = 0
    while (psStart < 0 && j < n) {
      if (java.util.Arrays.binarySearch(
          exact.asInstanceOf[Array[AnyRef]], s.substring(starts(j))) >= 0) {
        psStart = j
      } else if (j + 1 < n && java.util.Arrays.binarySearch(
          wild.asInstanceOf[Array[AnyRef]], s.substring(starts(j + 1))) >= 0) {
        psStart = j
      }
      j += 1
    }
    if (psStart < 0) psStart = n - 1 // implicit `*` rule
    if (psStart == 0) host // host IS a public suffix — fail-soft
    else utf8(s, starts(psStart - 1), host)
  }

  /** Suffix of the lowercased host from `from`; reuses the input
    * UTF8String when the whole (already-lowercase) host is the answer.
    */
  private def utf8(s: String, from: Int, orig: UTF8String): UTF8String =
    if (from == 0 && (orig.numBytes == s.length) && orig.toString == s) orig
    else UTF8String.fromString(s.substring(from))
}
