package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen distinct character n-gram shingling — exactly
  * `TextFunctions.charShingles` (array_distinct of per-position substr,
  * first-occurrence order, whole-text fallback for short rows) in one
  * native pass: no per-position interpreted substr lambda, no
  * intermediate non-distinct array. Code-point semantics match Spark's
  * `substr`/`length` (both count code points, not UTF-16 units).
  */
case class CharShinglesExpr(child: Expression, n: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if n > 0 => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"char_shingles expects (string, n>0), got ${child.dataType.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    CharShinglesExpr.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.expressions.CharShinglesExpr.compute($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "char_shingles"
}

object CharShinglesExpr {
  def compute(text: UTF8String, n: Int): GenericArrayData = {
    val s = text.toString
    // code-point array so indexing matches Spark substr semantics
    val cps = s.codePoints().toArray
    val len = cps.length
    val count = math.max(len - (n - 1), 1)
    val seen = new java.util.LinkedHashSet[String](count * 2)
    var i = 0
    while (i < count) {
      val m = math.min(n, len - i)
      seen.add(new String(cps, i, math.max(m, 0)))
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = UTF8String.fromString(it.next()); j += 1 }
    new GenericArrayData(out)
  }

  def apply(text: Column, n: Int): Column =
    ColumnBridge.column(CharShinglesExpr(ColumnBridge.expression(text), n))
}
