package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType, StructType}

/** Whole-stage-codegen random-hyperplane bucket id — the RP-LSH bucketing
  * hot loop as one generated function: `left` the row's vector
  * (array<float|double>), `right` the plane array (array<struct<pid
  * bigint, pe array<double>>>, a one-row broadcast), result the OR of
  * `1 << (pid-1)` over planes whose dot product with the vector is
  * strictly positive.
  *
  * Semantics exactly match the `aggregate(...)` fold it replaces
  * ([[graft.operators.SimilaritySearch.rpBucketFold]], parity-pinned):
  * dots are Double left folds in index order; a plane whose dimension
  * differs (or has a null element, or a null pid) contributes 0 — the
  * fold's `when(dot > 0, …).otherwise(0)` swallows null dots the same
  * way; an empty plane array yields bucket 0; a null vector or null
  * plane array yields null. Bit-OR over distinct plane bits is addition,
  * so the fold's `+` and this OR agree.
  */
case class RpBucket(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  private def vecElemIsFloat: Boolean =
    left.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val vecOk = left.dataType match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    val planesOk = right.dataType match {
      case ArrayType(s: StructType, _) if s.length == 2 =>
        s(0).dataType == LongType &&
          (s(1).dataType match {
            case ArrayType(DoubleType, _) => true
            case _ => false
          })
      case _ => false
    }
    if (vecOk && planesOk)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        "rp_bucket expects (array<float|double>, array<struct<pid bigint, pe array<double>>>), got " +
          s"${left.dataType.catalogString} / ${right.dataType.catalogString}")
  }

  override def nullSafeEval(v: Any, p: Any): Any = {
    val vec = v.asInstanceOf[ArrayData]
    val planes = p.asInstanceOf[ArrayData]
    val n = vec.numElements()
    val isFloat = vecElemIsFloat
    var bucket = 0L
    var j = 0
    while (j < planes.numElements()) {
      if (!planes.isNullAt(j)) {
        val row = planes.getStruct(j, 2)
        if (!row.isNullAt(0) && !row.isNullAt(1)) {
          val pe = row.getArray(1)
          if (pe.numElements() == n) {
            var d = 0.0
            var i = 0
            var ok = true
            while (ok && i < n) {
              if (vec.isNullAt(i) || pe.isNullAt(i)) ok = false
              else {
                val x = if (isFloat) vec.getFloat(i).toDouble else vec.getDouble(i)
                d += x * pe.getDouble(i)
                i += 1
              }
            }
            if (ok && d > 0.0) bucket |= 1L << ((row.getLong(0) - 1L) & 63L)
          }
        }
      }
      j += 1
    }
    bucket
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val getter = if (vecElemIsFloat) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (vec, planes) => {
      val n = ctx.freshName("n")
      val j = ctx.freshName("j")
      val i = ctx.freshName("i")
      val row = ctx.freshName("row")
      val pe = ctx.freshName("pe")
      val d = ctx.freshName("d")
      val ok = ctx.freshName("ok")
      val bucket = ctx.freshName("bucket")
      s"""
         |final int $n = $vec.numElements();
         |long $bucket = 0L;
         |for (int $j = 0; $j < $planes.numElements(); $j++) {
         |  if (!$planes.isNullAt($j)) {
         |    org.apache.spark.sql.catalyst.InternalRow $row = $planes.getStruct($j, 2);
         |    if (!$row.isNullAt(0) && !$row.isNullAt(1)) {
         |      org.apache.spark.sql.catalyst.util.ArrayData $pe = $row.getArray(1);
         |      if ($pe.numElements() == $n) {
         |        double $d = 0.0;
         |        boolean $ok = true;
         |        for (int $i = 0; $ok && $i < $n; $i++) {
         |          if ($vec.isNullAt($i) || $pe.isNullAt($i)) { $ok = false; }
         |          else { $d += ((double) $vec.$getter($i)) * $pe.getDouble($i); }
         |        }
         |        if ($ok && $d > 0.0) { $bucket |= 1L << (($row.getLong(0) - 1L) & 63L); }
         |      }
         |    }
         |  }
         |}
         |${ev.value} = $bucket;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "rp_bucket"
}

object RpBucket {
  def apply(vec: Column, planes: Column): Column =
    ColumnBridge.column(RpBucket(
      ColumnBridge.expression(vec), ColumnBridge.expression(planes)))
}
