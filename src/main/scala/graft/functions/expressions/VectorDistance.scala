package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType, FloatType}

/** Whole-stage-codegen vector distance over two numeric array columns —
  * the one hot loop of the engine worth owning (SURVEY §4 item 1).
  *
  * Semantics are EXACTLY the `aggregate(zip_with(...))` column form it
  * replaces (and thus the DuckDB oracle): a left fold in index order,
  * each element widened to Double before arithmetic, so results are
  * bit-identical — the fold form stays in tests as the cross-check.
  * Null result when either array is null, lengths differ, or any element
  * is null (zip_with+aggregate null semantics).
  *
  * The generated loop reads ArrayData primitives directly: no
  * per-row array allocation, no boxed Doubles, and it fuses into the
  * surrounding WholeStageCodegen span (scoring stays inside the same
  * generated function as the scan filter and the top-k heap push).
  *
  * `squared = true`  → squared L2 (reference metric, hnswlib `space='l2'`,
  *                     `src/datanode/handler.py:46`)
  * `squared = false` → dot product (cosine numerator).
  */
case class VectorDistance(left: Expression, right: Expression, squared: Boolean)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"vector_distance expects array<float|double> inputs, got " +
          s"${left.dataType.catalogString} / ${right.dataType.catalogString}")
  }

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements()) return null
    val leftIsFloat  = elemType(left) == FloatType
    val rightIsFloat = elemType(right) == FloatType
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = if (leftIsFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (rightIsFloat) b.getFloat(i).toDouble else b.getDouble(i)
      acc += (if (squared) { val d = x - y; d * d } else x * y)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    def getter(e: Expression, arr: String, i: String): String =
      if (elemType(e) == FloatType) s"(double) $arr.getFloat($i)"
      else s"$arr.getDouble($i)"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n   = ctx.freshName("n")
      val i   = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val x   = ctx.freshName("x")
      val y   = ctx.freshName("y")
      val d   = ctx.freshName("d")
      val term = if (squared) s"double $d = $x - $y; $acc += $d * $d;"
                 else s"$acc += $x * $y;"
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    double $x = ${getter(left, a, i)};
         |    double $y = ${getter(right, b, i)};
         |    $term
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $acc;
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = if (squared) "vec_l2sq" else "vec_dot"
}

object VectorDistance {
  /** Column builders over the codegen expression. */
  def l2Sq(a: Column, b: Column): Column =
    ColumnBridge.column(VectorDistance(
      ColumnBridge.expression(a), ColumnBridge.expression(b), squared = true))

  def dot(a: Column, b: Column): Column =
    ColumnBridge.column(VectorDistance(
      ColumnBridge.expression(a), ColumnBridge.expression(b), squared = false))

  /** Register `vec_l2sq` / `vec_dot` for SQL use on a session. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vec_l2sq", exprs => VectorDistance(exprs(0), exprs(1), squared = true), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vec_dot", exprs => VectorDistance(exprs(0), exprs(1), squared = false), "scala_udf")
  }
}
