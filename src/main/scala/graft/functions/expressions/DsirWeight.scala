package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Codegen DSIR document scorer over a tokens column: one native loop
  * computing, for every unigram AND bigram occurrence (multiplicity
  * kept — [[graft.operators.Dsir.grams]]' definition), the md5-low-32
  * bucket of salt+gram and the running sum of that bucket's score.
  * Output struct (n_grams, weight) — bit-identical to the declarative
  * `aggregate(grams(toks), …)` fold (DsirSpec pins it), at one digest
  * call per gram instead of a per-gram interpreted lambda tree
  * (conv ∘ substring ∘ md5 ∘ concat per element — measured ~2× the
  * scan cost at the 10× fixture). The score array lives in the
  * expression (a driver artifact, like the PQ codebooks), not the plan.
  *
  * Null INPUT yields (0, 0) — only possible for a null text column,
  * which the corpus contract excludes; null token slots hash as the
  * empty string.
  */
case class DsirWeight(child: Expression, scores: Array[Long], salt: String)
    extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("n_grams", LongType, nullable = false),
    StructField("weight", LongType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if scores.length >= 2 =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"dsir_weight expects array<string> tokens and >= 2 buckets, got " +
        s"${child.dataType.catalogString} / ${scores.length}")
  }

  override def nullable: Boolean = false

  // the expression carries the artifact; codegen references it through
  // ctx.addReferenceObj so generated code and interpreted eval share it
  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) DsirWeightUtil.zero
    else DsirWeightUtil.compute(v.asInstanceOf[ArrayData], scores,
      salt.getBytes("UTF-8"))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val scoresRef = ctx.addReferenceObj("dsirScores", scores, "long[]")
    val saltRef = ctx.addReferenceObj("dsirSalt", salt.getBytes("UTF-8"), "byte[]")
    val resultCode =
      code"""
        ${childGen.code}
        org.apache.spark.sql.catalyst.InternalRow ${ev.value} =
          ${childGen.isNull}
            ? graft.functions.expressions.DsirWeightUtil.zero()
            : graft.functions.expressions.DsirWeightUtil.compute(
                ${childGen.value}, $scoresRef, $saltRef);
      """
    ev.copy(code = resultCode, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "dsir_weight"
}

object DsirWeightUtil {
  private val digests = ThreadLocal.withInitial(
    new java.util.function.Supplier[java.security.MessageDigest] {
      override def get(): java.security.MessageDigest =
        java.security.MessageDigest.getInstance("MD5")
    })

  private val space = Array[Byte](' ')
  private val empty = Array.empty[Byte]

  def zero(): InternalRow =
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](0L, 0L))

  /** md5-low-32 of salt ++ parts, == `conv(substring(md5(concat(…)),25,8),16,10)`. */
  private def bucketOf(md: java.security.MessageDigest, buckets: Int,
      salt: Array[Byte], a: Array[Byte], mid: Array[Byte],
      b: Array[Byte]): Int = {
    md.reset()
    md.update(salt); md.update(a)
    if (mid.length > 0 || b.length > 0) { md.update(mid); md.update(b) }
    val d = md.digest()
    val low = ((d(12) & 0xffL) << 24) | ((d(13) & 0xffL) << 16) |
      ((d(14) & 0xffL) << 8) | (d(15) & 0xffL)
    (low % buckets).toInt
  }

  // NOTE: computeD below is this walk with Double weights — any change
  // to the gram loop, null handling or bucket hashing must mirror there
  // (kept as two monomorphic loops so the hot path stays unboxed)
  def compute(toks: ArrayData, scores: Array[Long],
      salt: Array[Byte]): InternalRow = {
    val md = digests.get()
    val n = toks.numElements()
    val bytes = new Array[Array[Byte]](n)
    var i = 0
    while (i < n) {
      bytes(i) =
        if (toks.isNullAt(i)) empty
        else toks.getUTF8String(i).getBytes
      i += 1
    }
    var w = 0L
    var cnt = 0L
    i = 0
    while (i < n) { // unigram occurrences
      w += scores(bucketOf(md, scores.length, salt, bytes(i), empty, empty))
      cnt += 1
      i += 1
    }
    if (n >= 2) { // bigram occurrences, "a b"
      i = 0
      while (i < n - 1) {
        w += scores(bucketOf(md, scores.length, salt, bytes(i), space,
          bytes(i + 1)))
        cnt += 1
        i += 1
      }
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](cnt, w))
  }

  def column(toks: Column, scores: Array[Long], salt: String): Column =
    ColumnBridge.column(DsirWeight(ColumnBridge.expression(toks), scores, salt))

  /** Double-weight twin for [[graft.operators.Classifier]] scoring:
    * same gram walk, weights summed in gram order (unigrams then
    * bigrams — the declarative fold's order, so the Double sum is
    * bit-identical to it). Output struct (n_grams LONG, wsum DOUBLE).
    */
  def computeD(toks: ArrayData, weights: Array[Double],
      salt: Array[Byte]): InternalRow = {
    val md = digests.get()
    val n = toks.numElements()
    val bytes = new Array[Array[Byte]](n)
    var i = 0
    while (i < n) {
      bytes(i) =
        if (toks.isNullAt(i)) empty
        else toks.getUTF8String(i).getBytes
      i += 1
    }
    var w = 0.0
    var cnt = 0L
    i = 0
    while (i < n) {
      w += weights(bucketOf(md, weights.length, salt, bytes(i), empty, empty))
      cnt += 1
      i += 1
    }
    if (n >= 2) {
      i = 0
      while (i < n - 1) {
        w += weights(bucketOf(md, weights.length, salt, bytes(i), space,
          bytes(i + 1)))
        cnt += 1
        i += 1
      }
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](cnt, w))
  }

  def zeroD(): InternalRow =
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](0L, 0.0))

  def columnD(toks: Column, weights: Array[Double], salt: String): Column =
    ColumnBridge.column(
      DsirWeightD(ColumnBridge.expression(toks), weights, salt))
}

/** [[DsirWeight]] with Double weights — the classifier apply kernel. */
case class DsirWeightD(child: Expression, weights: Array[Double],
    salt: String) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("n_grams", LongType, nullable = false),
    StructField("wsum", DoubleType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if weights.length >= 2 =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"dsir_weight_d expects array<string> tokens and >= 2 buckets, got " +
        s"${child.dataType.catalogString} / ${weights.length}")
  }

  override def nullable: Boolean = false

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) DsirWeightUtil.zeroD()
    else DsirWeightUtil.computeD(v.asInstanceOf[ArrayData], weights,
      salt.getBytes("UTF-8"))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val wRef = ctx.addReferenceObj("clsWeights", weights, "double[]")
    val saltRef = ctx.addReferenceObj("clsSalt", salt.getBytes("UTF-8"), "byte[]")
    val resultCode =
      code"""
        ${childGen.code}
        org.apache.spark.sql.catalyst.InternalRow ${ev.value} =
          ${childGen.isNull}
            ? graft.functions.expressions.DsirWeightUtil.zeroD()
            : graft.functions.expressions.DsirWeightUtil.computeD(
                ${childGen.value}, $wRef, $saltRef);
      """
    ev.copy(code = resultCode, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "dsir_weight_d"
}
