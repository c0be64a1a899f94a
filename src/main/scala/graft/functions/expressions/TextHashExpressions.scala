package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Codegen MinHash signature over pre-hashed shingle values (array<long>):
  * element k of the output = min over inputs x of ((2k+1)·x + (1e9+7)·k + 17) mod P,
  * P = 4294967311 (smallest prime > 2^32) — exactly
  * `TextFunctions.minhashSignature`, whose interpreted
  * `array_min(transform(...))` per hash function costs H×n lambda
  * invocations per row; this is one native H×n loop. Null elements are
  * skipped (array_min ignore-null semantics); an all-null/empty input
  * yields null signature slots.
  */
case class MinHashSig(child: Expression, numHashes: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = true)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) if numHashes > 0 => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig expects array<bigint>, got ${child.dataType.catalogString}")
  }

  // Null INPUT yields an array of null slots (never a null array) — the
  // exact shape of the declarative form, where transform(null) gives null
  // hashes and each array_min(null) slot is null. Hence nullable = false
  // and custom eval/genCode instead of the default null propagation.
  override def nullable: Boolean = false

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) MinHashSigUtil.nullSig(numHashes)
    else MinHashSigUtil.computeFromHashes(v.asInstanceOf[ArrayData], numHashes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val resultCode =
      code"""
        ${childGen.code}
        org.apache.spark.sql.catalyst.util.GenericArrayData ${ev.value} =
          ${childGen.isNull}
            ? graft.functions.expressions.MinHashSigUtil.nullSig($numHashes)
            : graft.functions.expressions.MinHashSigUtil.computeFromHashes(${childGen.value}, $numHashes);
      """
    ev.copy(code = resultCode, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "minhash_sig"
}

/** Codegen 60-bit SimHash over pre-hashed token values (array<long>): bit j
  * of the output is set iff Σ over inputs of (bit j set ? +1 : -1) > 0 —
  * exactly `TextFunctions.simhashFromHashes`, whose interpreted SQL-lambda
  * costs 60×n nested lambda invocations per row. Null elements are skipped.
  *
  * Null INPUT yields 0L, never null — the fold form's shape (its inner
  * `aggregate(null,...)` is null, `IF(null > 0,...)` takes the 0 branch,
  * the outer sum of 60 zeros is 0) and the DuckDB oracle's (CASE on a null
  * sum falls to ELSE 0). nullable = false also lets Catalyst drop inferred
  * `isnotnull(simhash64(...))` join-key filters, which would otherwise
  * recompute the whole tokenize+md5+simhash pipeline once more per row.
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"simhash64 expects array<bigint>, got ${child.dataType.catalogString}")
  }

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) 0L else SimHash64Util.compute(v.asInstanceOf[ArrayData])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val resultCode =
      code"""
        ${childGen.code}
        long ${ev.value} = ${childGen.isNull}
          ? 0L
          : graft.functions.expressions.SimHash64Util.compute(${childGen.value});
      """
    ev.copy(code = resultCode, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "simhash64"
}

/** The SimHash64 kernel, shared by interpreted eval and generated code. */
object SimHash64Util {
  def compute(a: ArrayData): Long = {
    val n = a.numElements()
    val counts = new Array[Int](60)
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i)) {
        val h = a.getLong(i)
        var j = 0
        while (j < 60) {
          counts(j) += (if (((h >>> j) & 1L) == 1L) 1 else -1)
          j += 1
        }
      }
      i += 1
    }
    var sh = 0L
    var j = 0
    while (j < 60) { if (counts(j) > 0) sh |= (1L << j); j += 1 }
    sh
  }
}

/** md5-low-32 of raw UTF-8 bytes without a hex-string detour: digest bytes
  * 12..15 as an unsigned int == `conv(substring(md5(s),25,8),16,10)`.
  */
object Md5Low32Util {
  private val digests = ThreadLocal.withInitial(
    new java.util.function.Supplier[java.security.MessageDigest] {
      override def get(): java.security.MessageDigest =
        java.security.MessageDigest.getInstance("MD5")
    })

  def hash(bytes: Array[Byte]): Long = {
    val md = digests.get()
    md.reset()
    val d = md.digest(bytes)
    ((d(12) & 0xffL) << 24) | ((d(13) & 0xffL) << 16) |
      ((d(14) & 0xffL) << 8) | (d(15) & 0xffL)
  }
}

/** MinHash signature DIRECTLY from an array<string> shingle column: one
  * native loop doing md5-low-32 per shingle plus all `numHashes` minima —
  * replaces `transform(shingles, md5Low32)` + [[MinHashSig]], whose
  * interpreted md5 lambda dominated q17 (2.7M lambda calls ≈ 3.5s at
  * sf0.1). Bit-identical to the declarative pipeline (tested).
  */
case class MinHashSigFromStrings(child: Expression, numHashes: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = true)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if numHashes > 0 => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig_str expects array<string>, got ${child.dataType.catalogString}")
  }

  // see MinHashSig: null input -> array of null slots, matching the
  // declarative pipeline; never a null array
  override def nullable: Boolean = false

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) MinHashSigUtil.nullSig(numHashes)
    else MinHashSigFromStrings.compute(v.asInstanceOf[ArrayData], numHashes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val resultCode =
      code"""
        ${childGen.code}
        org.apache.spark.sql.catalyst.util.GenericArrayData ${ev.value} =
          ${childGen.isNull}
            ? graft.functions.expressions.MinHashSigUtil.nullSig($numHashes)
            : graft.functions.expressions.MinHashSigFromStrings.compute(${childGen.value}, $numHashes);
      """
    ev.copy(code = resultCode, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "minhash_sig_str"
}

object MinHashSigUtil {
  /** The fold-form shape for a null input: h null slots. */
  def nullSig(numHashes: Int): GenericArrayData =
    new GenericArrayData(new Array[Any](numHashes))

  /** Minima over pre-hashed values; null elements skipped (array_min
    * ignore-null), empty/all-null input -> null slots.
    */
  def computeFromHashes(a: ArrayData, numHashes: Int): GenericArrayData = {
    val n = a.numElements()
    val sig = new Array[Any](numHashes)
    var k = 0
    while (k < numHashes) {
      val ak = 2L * k + 1
      val bk = 1000000007L * k + 17L
      var best = Long.MaxValue
      var has = false
      var i = 0
      while (i < n) {
        if (!a.isNullAt(i)) {
          val v = (a.getLong(i) * ak + bk) % 4294967311L
          if (v < best) best = v
          has = true
        }
        i += 1
      }
      sig(k) = if (has) best else null
      k += 1
    }
    new GenericArrayData(sig)
  }
}

object MinHashSigFromStrings {
  /** Shared by interpreted + generated code. Null elements skipped
    * (array_min ignore-null semantics); empty/all-null → null slots.
    */
  def compute(a: ArrayData, numHashes: Int): GenericArrayData = {
    val n = a.numElements()
    val best = Array.fill(numHashes)(Long.MaxValue)
    var any = false
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i)) {
        val x = Md5Low32Util.hash(a.getUTF8String(i).getBytes)
        any = true
        var k = 0
        while (k < numHashes) {
          val v = (x * (2L * k + 1) + (1000000007L * k + 17L)) % 4294967311L
          if (v < best(k)) best(k) = v
          k += 1
        }
      }
      i += 1
    }
    val out = new Array[Any](numHashes)
    var k = 0
    while (k < numHashes) { out(k) = if (any) best(k) else null; k += 1 }
    new GenericArrayData(out)
  }
}

/** md5-low-60 of a STRING without the hex detour — the scalar twin of
  * [[Md5Low32Util]] for the 60-bit gram/chunk hash space: digest bytes
  * 8 (low nibble)..15 as an unsigned 60-bit value, exactly
  * `conv(substring(md5(s),18,15),16,10)` (hex chars 18..32). This is the
  * hash under every gram shuffle in the dedup/decontamination family;
  * the declarative form allocates a 32-char hex string + substring +
  * radix parse per gram — millions of rows per corpus pass.
  * Null propagates (the declarative conv(null) shape), so the default
  * UnaryExpression null handling is exactly right.
  */
case class Md5Low60(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"md5_low60 expects string, got ${child.dataType.catalogString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    Md5Low60Util.hash(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.expressions.Md5Low60Util.hash($c.getBytes())")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "md5_low60"
}

object Md5Low60Util {
  private val digests = ThreadLocal.withInitial(
    new java.util.function.Supplier[java.security.MessageDigest] {
      override def get(): java.security.MessageDigest =
        java.security.MessageDigest.getInstance("MD5")
    })

  /** Low nibble of byte 8, then bytes 9..15 — hex chars 18..32 of the
    * digest, i.e. the exact value of the declarative
    * conv(substring(md5(s),18,15),16,10) twin.
    */
  def hash(bytes: Array[Byte]): Long = {
    val md = digests.get()
    md.reset()
    val d = md.digest(bytes)
    var acc = d(8) & 0x0fL
    var i = 9
    while (i < 16) { acc = (acc << 8) | (d(i) & 0xffL); i += 1 }
    acc
  }
}

/** Count of an array<bigint>'s elements present in a STATIC sorted set —
  * the membership probe under the inline decontamination gate, where the
  * frozen bench gram set rides the plan as ONE shared long[] and each
  * row pays |grams|·log|set| binary searches. The declarative twin
  * `size(array_intersect(grams, lit(set)))` rebuilds a |set|-entry hash
  * set PER ROW (it made q147 the suite's slowest query at 20 s); this
  * expression holds the set once per executor via the codegen reference
  * object. Input arrays are expected distinct (the gram pipeline
  * distincts); null elements are skipped, null input propagates.
  */
case class CountInSortedSet(child: Expression, set: Array[Long])
    extends UnaryExpression {
  require(set.nonEmpty, "CountInSortedSet: empty set")

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"count_in_set expects array<bigint>, got ${child.dataType.catalogString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    CountInSortedSetUtil.count(input.asInstanceOf[ArrayData], set)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setRef = ctx.addReferenceObj("sortedSet", set, "long[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.expressions.CountInSortedSetUtil.count($c, $setRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "count_in_set"
}

object CountInSortedSetUtil {
  /** Binary-search membership count; null slots skipped (array_intersect
    * ignores nulls on the probe side for counting purposes).
    */
  def count(arr: ArrayData, set: Array[Long]): Int = {
    var n = 0
    var i = 0
    val len = arr.numElements()
    while (i < len) {
      if (!arr.isNullAt(i) &&
        java.util.Arrays.binarySearch(set, arr.getLong(i)) >= 0) n += 1
      i += 1
    }
    n
  }

  /** The POSITIONS (0-based, ascending by construction) whose value the
    * sorted set contains — [[count]]'s index-reporting sibling for
    * interval work (the dup-span incremental gate needs WHERE a window
    * hit, not just how many did). Null slots never match.
    */
  def positions(arr: ArrayData, set: Array[Long]): ArrayData = {
    // count-then-fill into a primitive int[] — no growable buffer, no
    // Integer boxing in the per-row hot path (the count sibling's
    // discipline; the second binary-search pass is cheaper than the
    // allocation churn it avoids on mostly-miss rows)
    val n = count(arr, set)
    val hits = new Array[Int](n)
    var i = 0
    var o = 0
    val len = arr.numElements()
    while (o < n && i < len) {
      if (!arr.isNullAt(i) &&
        java.util.Arrays.binarySearch(set, arr.getLong(i)) >= 0) {
        hits(o) = i
        o += 1
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(hits)
  }
}

/** [[CountInSortedSet]]'s index-reporting sibling: the 0-based positions
  * of the probe array whose value is in the frozen sorted set (ascending
  * by construction — downstream interval folds rely on that order). Same
  * codebook pattern: the set compiles once driver-side and rides the
  * expression as a reference object, |set|-independent row cost beyond
  * the log factor.
  */
case class PositionsInSortedSet(child: Expression, set: Array[Long])
    extends UnaryExpression {
  require(set.nonEmpty, "PositionsInSortedSet: empty set")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"positions_in_set expects array<bigint>, got ${child.dataType.catalogString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    CountInSortedSetUtil.positions(input.asInstanceOf[ArrayData], set)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setRef = ctx.addReferenceObj("sortedSet", set, "long[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.expressions.CountInSortedSetUtil.positions($c, $setRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "positions_in_set"
}

/** The WHOLE winnowing fingerprint selection (Schleimer et al. 2003) of
  * one document as a single native pass: per-position k-gram md5-low-32
  * hashes, position-tagged (hp = h·2²⁰ + pos, 1-based), sliding-window
  * minimum over w positions via a monotonic deque (O(n), not O(n·w)),
  * distinct minima out, sorted. Bit-identical to the declarative
  * pipeline (`Dedup.winnowFingerprintsFold`: posexplode → windowed min →
  * full-window filter → distinct — parity-pinned), but ROW-LOCAL: the
  * |text|-row explode and the per-doc window SHUFFLE disappear entirely,
  * which is what the q97/q111/q118/q122 family was paying for at 10×.
  * Docs of ≥ 2²⁰ chars raise (pos bits would alias) exactly like the
  * declarative guard. Null text propagates (explode then drops the doc).
  */
case class WinnowFps(child: Expression, k: Int, w: Int)
    extends UnaryExpression {
  require(k >= 1 && w >= 1, s"winnowing needs k >= 1, w >= 1 (got $k, $w)")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"winnow_fps expects string, got ${child.dataType.catalogString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    WinnowFpsUtil.compute(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.expressions.WinnowFpsUtil.compute($c, $k, $w)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "winnow_fps"
}

object WinnowFpsUtil {
  def compute(text: org.apache.spark.unsafe.types.UTF8String,
      k: Int, w: Int): GenericArrayData = {
    val chars = text.numChars()
    if (chars >= (1 << 20))
      throw new IllegalArgumentException(
        s"winnowing: doc of $chars chars exceeds 2^20 — pos bits would alias")
    val n = math.max(chars - (k - 1), 1)
    val hp = new Array[Long](n + 1) // 1-based positions
    var p = 1
    while (p <= n) {
      // substringSQL is Spark's own substr: code-point positions, then
      // the UTF-8 bytes — exactly what the declarative md5 sees
      val h = Md5Low32Util.hash(text.substringSQL(p, k).getBytes)
      hp(p) = h * 1048576L + p
      p += 1
    }
    val m = math.max(n - (w - 1), 1)
    // monotonic deque of positions with increasing hp values
    val deque = new Array[Int](n + 1)
    var head = 0
    var tail = 0 // exclusive
    val out = new java.util.TreeSet[java.lang.Long]()
    var start = 1
    var next = 1 // next position to feed into the deque
    while (start <= m) {
      val end = math.min(start + w - 1, n)
      while (next <= end) {
        while (tail > head && hp(deque(tail - 1)) >= hp(next)) tail -= 1
        deque(tail) = next
        tail += 1
        next += 1
      }
      while (deque(head) < start) head += 1
      out.add(hp(deque(head)))
      start += 1
    }
    val arr = new Array[Long](out.size())
    val it = out.iterator()
    var i = 0
    while (it.hasNext) { arr(i) = it.next(); i += 1 }
    new GenericArrayData(arr)
  }
}

/** Both Gopher repetition statistics of one document for ONE gram width
  * as a single native pass over the tokens array: struct(top_cnt =
  * occurrences of the most frequent n-gram, dup_cov = tokens covered by
  * the union of all occurrences of n-grams appearing ≥ 2 times — the
  * q153 island rule). Gram key = md5-low-60 of the space-joined tokens,
  * streamed through one MessageDigest (md5(a ++ b) ≡ md5 of the joined
  * string, so the hash is bit-identical to
  * `md5Low60(concat_ws(" ", slice(toks, i+1, n)))`). Bit-parity-pinned
  * against the declarative fold twin
  * ([[graft.operators.Quality.repetitionStatsFold]]) in QualitySpec —
  * the WinnowFps discipline: same results, but one native O(G log G)
  * pass instead of interpreted per-element lambdas (the staged-fold form
  * measured ~3 ms/doc over nine widths; this is what makes the
  * repetition rule-pack scan-speed).
  */
case class RepetitionStats(child: Expression, n: Int)
    extends UnaryExpression {
  require(n >= 1, s"repetition_stats: n $n must be >= 1")

  override def dataType: DataType = StructType(Seq(
    StructField("top_cnt", LongType, nullable = false),
    StructField("dup_cov", LongType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"repetition_stats expects array<string>, got ${child.dataType.catalogString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    RepetitionStatsUtil.compute(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.expressions.RepetitionStatsUtil.compute($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "repetition_stats"
}

/** [[RepetitionStats]] for SEVERAL widths in one pass: the per-token
  * UTF-8 bytes are extracted once and every width's gram hashing loops
  * over the shared byte arrays — the default rule-pack needs nine
  * widths, and nine independent single-width passes would re-materialize
  * the document's bytes nine times per row. Output: array of
  * (top_cnt, dup_cov) structs, index-aligned with `ns`.
  */
case class RepetitionStatsMulti(child: Expression, ns: Seq[Int])
    extends UnaryExpression {
  require(ns.nonEmpty && ns.forall(_ >= 1),
    s"repetition_stats_multi: widths must be >= 1 (got ${ns.mkString(",")})")

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("top_cnt", LongType, nullable = false),
    StructField("dup_cov", LongType, nullable = false))),
    containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"repetition_stats_multi expects array<string>, got ${child.dataType.catalogString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    RepetitionStatsUtil.computeMulti(input.asInstanceOf[ArrayData], ns.toArray)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val nsRef = ctx.addReferenceObj("widths", ns.toArray, "int[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.expressions.RepetitionStatsUtil.computeMulti($c, $nsRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "repetition_stats_multi"
}

object RepetitionStatsUtil {
  private val digests = ThreadLocal.withInitial(
    new java.util.function.Supplier[java.security.MessageDigest] {
      override def get(): java.security.MessageDigest =
        java.security.MessageDigest.getInstance("MD5")
    })

  /** Token bytes extracted ONCE, then one [[computeOne]] per width.
    * A null token element carries the declarative `concat_ws` contract
    * through the hash: skipped, with separators only BETWEEN written
    * tokens — so the gram bytes (and the 60-bit key) match
    * `md5Low60(concat_ws(" ", slice(toks, …)))` exactly, nulls or not.
    */
  def computeMulti(toks: ArrayData, ns: Array[Int]): GenericArrayData = {
    val t = toks.numElements()
    val tb = new Array[Array[Byte]](t)
    var i = 0
    while (i < t) {
      tb(i) = if (toks.isNullAt(i)) null else toks.getUTF8String(i).getBytes
      i += 1
    }
    val out = new Array[Any](ns.length)
    var w = 0
    while (w < ns.length) { out(w) = computeOne(tb, ns(w)); w += 1 }
    new GenericArrayData(out)
  }

  def compute(toks: ArrayData, n: Int): InternalRow =
    computeMulti(toks, Array(n)).array(0).asInstanceOf[InternalRow]

  private def computeOne(tb: Array[Array[Byte]], n: Int): InternalRow = {
    val t = tb.length
    val g = t - n + 1
    if (g <= 0)
      return new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](0L, 0L))
    val md = digests.get()
    val hs = new Array[Long](g)
    var p = 0
    while (p < g) {
      md.reset()
      var j = 0
      var wrote = false
      while (j < n) {
        val b = tb(p + j)
        if (b != null) {
          if (wrote) md.update(' '.toByte)
          md.update(b)
          wrote = true
        }
        j += 1
      }
      val d = md.digest()
      var acc = d(8) & 0x0fL
      var k = 9
      while (k < 16) { acc = (acc << 8) | (d(k) & 0xffL); k += 1 }
      hs(p) = acc
      p += 1
    }
    val sorted = hs.clone()
    java.util.Arrays.sort(sorted)
    // one pass over the sorted hashes: longest equal run (= the top
    // n-gram's count) and the distinct values with count ≥ 2 (ascending
    // by construction — the binary-search probe below needs that)
    var best = 1L
    var run = 1L
    var nd = 0
    val dups = new Array[Long](g / 2 + 1)
    var i = 1
    while (i < g) {
      if (sorted(i) == sorted(i - 1)) {
        run += 1
        if (run == 2L) { dups(nd) = sorted(i); nd += 1 }
        if (run > best) best = run
      } else run = 1
      i += 1
    }
    // island-union coverage: positions ascend naturally, so the fold is
    // one scan — covered += max(0, p+n − max(maxEnd, p))
    var rm = 0L
    var me = -1
    p = 0
    while (p < g) {
      if (nd > 0 && java.util.Arrays.binarySearch(dups, 0, nd, hs(p)) >= 0) {
        val e = p + n
        val lo = if (me > p) me else p
        if (e > lo) rm += (e - lo).toLong
        if (e > me) me = e
      }
      p += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](best, rm))
  }
}

/** Content-defined chunks of a token array (the [[graft.operators.Dedup]]
  * `cdcChunkDedup` kernel): one pass extracts the per-token UTF-8 bytes,
  * hashes each `w`-token window once (the [[Md5Low60Util]] digest — the
  * exact `md5Low60(concat_ws(" ", window))` value, null tokens skipped
  * with separators only between written tokens), cuts after any window
  * whose 60-bit hash ≡ 0 (mod `divisor`), and emits the space-joined
  * chunks (`array_join` null-skip contract). The declarative twin
  * (`TextFunctions.cdcChunksFold` — zip_with over cut indices) is
  * bit-parity-pinned in TextHashExpressionsSpec; it exists for the
  * oracle-shaped proof only: interpreted higher-order lambdas re-inline
  * the token split per gram (measured: one 10× scan task pinned a core
  * for 15+ minutes), where this is one native O(tokens·w) loop.
  */
case class CdcChunks(child: Expression, w: Int, divisor: Int)
    extends UnaryExpression {
  require(w >= 1, s"cdc_chunks: w $w must be >= 1")
  require(divisor >= 2, s"cdc_chunks: divisor $divisor must be >= 2")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"cdc_chunks expects array<string>, got ${child.dataType.catalogString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    CdcChunksUtil.compute(input.asInstanceOf[ArrayData], w, divisor)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.expressions.CdcChunksUtil.compute($c, $w, $divisor)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "cdc_chunks"
}

/** [[CdcChunks]] with a ROLLING window hash — the FastCDC / LBFS
  * discipline proper (Xia et al. 2016; Muthitacharoen et al. 2001): the
  * MD5 form recomputes a full digest per w-token window
  * (O(tokens·w·digest)); this kernel gear-hashes each token's bytes ONCE
  * (h = (h << 1) + GEAR[b], the FastCDC per-unit table mix) and then
  * maintains the w-token window as a polynomial rolling hash —
  * H_{i+1} = (H_i − B^{w−1}·th(i−w+1))·B + th(i+1) mod 2^64 — O(1) per
  * position, O(bytes + tokens) per document. Cut rule: after token i
  * (i ≥ w−1) whenever the window hash's low 60 bits ≡ 0 (mod divisor),
  * plus the forced final cut — [[CdcChunks]]'s rule under a different
  * window hash, so the CHUNK CONTRACT is identical (same emit/null-skip
  * semantics, concatenation property, content-defined resynchronization)
  * while the cut POSITIONS differ. The MD5 form stays the oracle-parity
  * twin (q174's DuckDB oracle replays md5 windows); this is the scale
  * kernel — SCALE.md carries the A/B.
  */
case class CdcChunksGear(child: Expression, w: Int, divisor: Int)
    extends UnaryExpression {
  require(w >= 1, s"cdc_chunks_gear: w $w must be >= 1")
  require(divisor >= 2, s"cdc_chunks_gear: divisor $divisor must be >= 2")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"cdc_chunks_gear expects array<string>, got ${child.dataType.catalogString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    CdcChunksUtil.computeGear(input.asInstanceOf[ArrayData], w, divisor)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.expressions.CdcChunksUtil.computeGear($c, $w, $divisor)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "cdc_chunks_gear"
}

object CdcChunksUtil {
  private val digests = ThreadLocal.withInitial(
    new java.util.function.Supplier[java.security.MessageDigest] {
      override def get(): java.security.MessageDigest =
        java.security.MessageDigest.getInstance("MD5")
    })

  // deterministic 256-entry gear table (FastCDC's per-byte mix),
  // generated from splitmix64 so it ships as code, not data
  private val Gear: Array[Long] = {
    var x = 0x9E3779B97F4A7C15L
    Array.fill(256) {
      x += 0x9E3779B97F4A7C15L
      var z = x
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z ^ (z >>> 31)
    }
  }
  private val NullTokenHash = 0x2545F4914F6CDD1DL
  private val RollB = 0x100000001B3L // FNV-64 prime (odd -> invertible mod 2^64)

  // splitmix64 finalizer: the cut decision reads `roll % divisor`, i.e.
  // its LOW bits — but the gear/polynomial combine leaves low bits
  // dominated by each token's FINAL characters (h<<1 shifts earlier
  // bytes up), which measurably skewed the cut rate on suffix-patterned
  // corpora (the 10× fixture: 1.77× the design rate). One avalanche on
  // the window value before the mod restores 1/divisor.
  private def mix64(v: Long): Long = {
    var z = v
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** Rolling-hash twin of [[compute]]: same chunk-emit contract,
    * content-defined cut positions from the gear/polynomial window hash.
    */
  def computeGear(toks: ArrayData, w: Int, divisor: Int): GenericArrayData = {
    val t = toks.numElements()
    val empty = org.apache.spark.unsafe.types.UTF8String.EMPTY_UTF8
    if (t == 0) return new GenericArrayData(Array[Any](empty))
    val tb = new Array[Array[Byte]](t)
    val th = new Array[Long](t)
    var i = 0
    while (i < t) {
      if (toks.isNullAt(i)) { tb(i) = null; th(i) = NullTokenHash }
      else {
        val b = toks.getUTF8String(i).getBytes
        tb(i) = b
        var h = 0L
        var j = 0
        while (j < b.length) { h = (h << 1) + Gear(b(j) & 0xff); j += 1 }
        th(i) = h
      }
      i += 1
    }
    // B^(w-1) mod 2^64 for the outgoing term
    var bw = 1L
    i = 1
    while (i < w) { bw *= RollB; i += 1 }
    val chunks = scala.collection.mutable.ArrayBuffer.empty[Any]
    var start = 0
    var roll = 0L
    i = 0
    while (i < t) {
      roll =
        if (i < w) roll * RollB + th(i)
        else (roll - th(i - w) * bw) * RollB + th(i)
      var cut = i == t - 1 // the final token always closes a chunk
      if (!cut && i >= w - 1)
        cut = (mix64(roll) & 0x0FFFFFFFFFFFFFFFL) % divisor == 0
      if (cut) {
        chunks += joinTokens(tb, start, i)
        start = i + 1
      }
      i += 1
    }
    new GenericArrayData(chunks.toArray)
  }

  /** Shared chunk emit: tokens [start..end] space-joined, null tokens
    * skipped with separators only between written tokens (the
    * `array_join` null-skip contract both kernels pin).
    */
  private def joinTokens(tb: Array[Array[Byte]], start: Int, end: Int)
      : org.apache.spark.unsafe.types.UTF8String = {
    var len = 0
    var n = 0
    var j = start
    while (j <= end) {
      if (tb(j) != null) { len += tb(j).length; n += 1 }
      j += 1
    }
    val out = new Array[Byte](len + (if (n > 1) n - 1 else 0))
    var p = 0
    var wrote = false
    j = start
    while (j <= end) {
      if (tb(j) != null) {
        if (wrote) { out(p) = ' '.toByte; p += 1 }
        System.arraycopy(tb(j), 0, out, p, tb(j).length)
        p += tb(j).length
        wrote = true
      }
      j += 1
    }
    org.apache.spark.unsafe.types.UTF8String.fromBytes(out)
  }

  def compute(toks: ArrayData, w: Int, divisor: Int): GenericArrayData = {
    val t = toks.numElements()
    val empty = org.apache.spark.unsafe.types.UTF8String.EMPTY_UTF8
    if (t == 0) return new GenericArrayData(Array[Any](empty))
    val tb = new Array[Array[Byte]](t)
    var i = 0
    while (i < t) {
      tb(i) = if (toks.isNullAt(i)) null else toks.getUTF8String(i).getBytes
      i += 1
    }
    val md = digests.get()
    val chunks = scala.collection.mutable.ArrayBuffer.empty[Any]
    var start = 0
    def emit(end: Int): Unit = { // chunk = tokens [start..end], space-joined
      chunks += joinTokens(tb, start, end)
      start = end + 1
    }
    i = 0
    while (i < t) {
      var cut = i == t - 1 // the final token always closes a chunk
      if (!cut && i >= w - 1) {
        md.reset()
        var j = i - w + 1
        var wrote = false
        while (j <= i) {
          if (tb(j) != null) {
            if (wrote) md.update(' '.toByte)
            md.update(tb(j))
            wrote = true
          }
          j += 1
        }
        val d = md.digest()
        var acc = d(8) & 0x0fL
        var k = 9
        while (k < 16) { acc = (acc << 8) | (d(k) & 0xffL); k += 1 }
        cut = acc % divisor == 0
      }
      if (cut) emit(i)
      i += 1
    }
    new GenericArrayData(chunks.toArray)
  }
}

object TextHashExpressions {
  def minhashSig(hashes: Column, numHashes: Int): Column =
    ColumnBridge.column(MinHashSig(ColumnBridge.expression(hashes), numHashes))

  def minhashSigFromStrings(shingles: Column, numHashes: Int): Column =
    ColumnBridge.column(MinHashSigFromStrings(ColumnBridge.expression(shingles), numHashes))

  def simhash64(hashes: Column): Column =
    ColumnBridge.column(SimHash64(ColumnBridge.expression(hashes)))

  def md5Low60(s: Column): Column =
    ColumnBridge.column(Md5Low60(ColumnBridge.expression(s)))

  /** Both sorted-set probes binary-search `set` (`Arrays.binarySearch`),
    * whose contract is undefined on unsorted input — a hand-concatenated
    * index would give silently wrong membership (missed dup spans / open
    * decontamination gates), not an error. One O(n) driver-time pass at
    * plan-build asserts the contract instead; `dupSpanIndex` /
    * `benchGramSet` artifacts (distinct + ordered) satisfy it by
    * construction.
    */
  private def requireStrictlyAscending(set: Array[Long], caller: String): Unit = {
    var i = 1
    while (i < set.length && set(i - 1) < set(i)) i += 1
    require(i >= set.length,
      s"$caller: the sorted-set index must be strictly ascending " +
        s"(binary-search contract) — violated at position $i " +
        s"(${set(i - 1)} !< ${set(i)}); build it with dupSpanIndex/" +
        "benchGramSet, or sort+distinct a hand-built array first")
  }

  def cdcChunks(toks: Column, w: Int, divisor: Int): Column =
    ColumnBridge.column(CdcChunks(ColumnBridge.expression(toks), w, divisor))

  def cdcChunksGear(toks: Column, w: Int, divisor: Int): Column =
    ColumnBridge.column(CdcChunksGear(ColumnBridge.expression(toks), w, divisor))

  def countInSortedSet(arr: Column, set: Array[Long]): Column = {
    requireStrictlyAscending(set, "countInSortedSet")
    ColumnBridge.column(CountInSortedSet(ColumnBridge.expression(arr), set))
  }

  def positionsInSortedSet(arr: Column, set: Array[Long]): Column = {
    requireStrictlyAscending(set, "positionsInSortedSet")
    ColumnBridge.column(PositionsInSortedSet(ColumnBridge.expression(arr), set))
  }

  def winnowFps(text: Column, k: Int, w: Int): Column =
    ColumnBridge.column(WinnowFps(ColumnBridge.expression(text), k, w))

  def repetitionStats(toks: Column, n: Int): Column =
    ColumnBridge.column(RepetitionStats(ColumnBridge.expression(toks), n))

  def repetitionStatsMulti(toks: Column, ns: Seq[Int]): Column =
    ColumnBridge.column(RepetitionStatsMulti(ColumnBridge.expression(toks), ns))
}
