package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType, StructType}

/** Whole-stage-codegen nearest-centroid argmin — the IVF assignment hot
  * loop as ONE generated function: `left` is the row's vector
  * (array<float|double>), `right` the (cid asc)-sorted centroid array
  * (array<struct<cid bigint, ce array<double>>>, a one-row broadcast in
  * practice), result the cid minimizing squared L2, first-in-array-order
  * (= lowest cid) on exact ties.
  *
  * Semantics are EXACTLY the `aggregate(...)` fold in
  * [[graft.operators.SimilaritySearch.assignCells]]'s original form
  * (bit-parity-tested in VectorDistanceSpec): distances are Double left
  * folds in index order; a centroid whose dimension differs from the
  * vector (or contains a null element) is SKIPPED, mirroring the fold's
  * null-distance behavior; an empty or null centroid array (or null
  * vector) yields null.
  *
  * Why an Expression and not the fold: higher-order functions are
  * CodegenFallback — the fold evaluated interpreted and broke the
  * scan's WholeStageCodegen span. This keeps the assignment leg inside
  * the generated loop AND shuffle-free (the two halves of the
  * write-side-assignment story).
  */
case class NearestCell(left: Expression, right: Expression)
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
    val centsOk = right.dataType match {
      case ArrayType(s: StructType, _) if s.length == 2 =>
        s(0).dataType == LongType &&
          (s(1).dataType match {
            case ArrayType(DoubleType, _) => true
            case _ => false
          })
      case _ => false
    }
    if (vecOk && centsOk)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        "nearest_cell expects (array<float|double>, array<struct<cid bigint, ce array<double>>>), got " +
          s"${left.dataType.catalogString} / ${right.dataType.catalogString}")
  }

  override def nullSafeEval(v: Any, c: Any): Any = {
    val vec = v.asInstanceOf[ArrayData]
    val cents = c.asInstanceOf[ArrayData]
    val n = vec.numElements()
    val isFloat = vecElemIsFloat
    var bestCid = 0L
    var bestD = Double.MaxValue
    var found = false
    var j = 0
    while (j < cents.numElements()) {
      if (!cents.isNullAt(j)) {
        val row = cents.getStruct(j, 2)
        if (!row.isNullAt(0) && !row.isNullAt(1)) {
          val ce = row.getArray(1)
          if (ce.numElements() == n) {
            var d = 0.0
            var i = 0
            var ok = true
            while (ok && i < n) {
              if (vec.isNullAt(i) || ce.isNullAt(i)) ok = false
              else {
                val x = if (isFloat) vec.getFloat(i).toDouble else vec.getDouble(i)
                val diff = x - ce.getDouble(i)
                d += diff * diff
                i += 1
              }
            }
            if (ok && d < bestD) { bestD = d; bestCid = row.getLong(0); found = true }
          }
        }
      }
      j += 1
    }
    if (found) bestCid else null
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val getter = if (vecElemIsFloat) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (vec, cents) => {
      val n = ctx.freshName("n")
      val j = ctx.freshName("j")
      val i = ctx.freshName("i")
      val row = ctx.freshName("row")
      val ce = ctx.freshName("ce")
      val d = ctx.freshName("d")
      val ok = ctx.freshName("ok")
      val diff = ctx.freshName("diff")
      val bestD = ctx.freshName("bestD")
      val bestCid = ctx.freshName("bestCid")
      val found = ctx.freshName("found")
      s"""
         |final int $n = $vec.numElements();
         |double $bestD = Double.MAX_VALUE;
         |long $bestCid = 0L;
         |boolean $found = false;
         |for (int $j = 0; $j < $cents.numElements(); $j++) {
         |  if (!$cents.isNullAt($j)) {
         |    org.apache.spark.sql.catalyst.InternalRow $row = $cents.getStruct($j, 2);
         |    if (!$row.isNullAt(0) && !$row.isNullAt(1)) {
         |      org.apache.spark.sql.catalyst.util.ArrayData $ce = $row.getArray(1);
         |      if ($ce.numElements() == $n) {
         |        double $d = 0.0;
         |        boolean $ok = true;
         |        for (int $i = 0; $ok && $i < $n; $i++) {
         |          if ($vec.isNullAt($i) || $ce.isNullAt($i)) { $ok = false; }
         |          else {
         |            double $diff = ((double) $vec.$getter($i)) - $ce.getDouble($i);
         |            $d += $diff * $diff;
         |          }
         |        }
         |        if ($ok && $d < $bestD) { $bestD = $d; $bestCid = $row.getLong(0); $found = true; }
         |      }
         |    }
         |  }
         |}
         |if ($found) { ${ev.value} = $bestCid; } else { ${ev.isNull} = true; }
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "nearest_cell"
}

object NearestCell {
  def apply(vec: Column, cents: Column): Column =
    ColumnBridge.column(NearestCell(
      ColumnBridge.expression(vec), ColumnBridge.expression(cents)))
}
