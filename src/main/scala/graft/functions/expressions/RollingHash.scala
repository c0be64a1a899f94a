package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Shared loop for interpreted + generated code paths. */
object RollingHashUtil {
  final val Mod = 1000000007L

  def compute(s: UTF8String): Long = {
    val str = s.toString
    var acc = 0L
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      acc = (acc * 31L + cp) % Mod
      i += Character.charCount(cp)
    }
    acc
  }
}

/** Codegen rolling polynomial fingerprint — fold((acc·31 + codepoint) mod
  * 1e9+7) over the characters, exactly `TextFunctions.fingerprint`'s
  * declarative form (per-char `substr`+`ascii` lambdas, one interpreted
  * invocation per character) collapsed into one native loop per row.
  */
case class RollingHash(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"rolling_hash expects string, got ${dt.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    RollingHashUtil.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.expressions.RollingHashUtil.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "rolling_hash"
}

object RollingHash {
  def apply(c: Column): Column =
    ColumnBridge.column(RollingHash(ColumnBridge.expression(c)))
}
