package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Whole-stage-codegen bloom membership — the probe-side hot loop of
  * [[graft.operators.Bloom]] as one generated function: ONE md5 digest
  * per row (per 5 hash positions), k slice-and-test bit probes against a
  * bitmap held as a codegen reference object (not a plan literal — a
  * 2^20-bit filter would otherwise embed 16k longs into the plan string
  * five times over).
  *
  * Exists because FilterExec does NOT subexpression-eliminate: the
  * declarative twin ([[graft.operators.Bloom.mightContainDecl]],
  * parity-pinned in BloomSpec) re-evaluates the identical md5 subtree
  * once per position inside a Filter condition, making the probe scan
  * ~k× the cost of the digest. Semantics match the twin bit-for-bit:
  * position i reads hex chars [6·(i%5), 6·(i%5)+6) of
  * md5("bf<i/5>:" + key) mod bits; null key → null.
  */
case class BloomContains(child: Expression, bitmap: Array[Long], k: Int)
    extends UnaryExpression {

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bloom_contains expects a string key, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any = {
    val key = input.asInstanceOf[UTF8String].toString
    val bits = bitmap.length * 64
    var hex: String = null
    var grp = -1
    var i = 0
    while (i < k) {
      val g = i / 5
      if (g != grp) {
        hex = org.apache.commons.codec.digest.DigestUtils.md5Hex(s"bf$g:$key")
        grp = g
      }
      val off = 6 * (i % 5)
      val p = (java.lang.Long.parseLong(hex.substring(off, off + 6), 16) %
        bits).toInt
      if ((bitmap(p >>> 6) & (1L << (p & 63))) == 0L) return false
      i += 1
    }
    true
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bm = ctx.addReferenceObj("bloomBitmap", bitmap, "long[]")
    val bits = bitmap.length * 64
    nullSafeCodeGen(ctx, ev, key => {
      val keyStr = ctx.freshName("keyStr")
      val hex = ctx.freshName("hex")
      val grp = ctx.freshName("grp")
      val pass = ctx.freshName("pass")
      val i = ctx.freshName("i")
      val g = ctx.freshName("g")
      val off = ctx.freshName("off")
      val p = ctx.freshName("p")
      s"""
         |final String $keyStr = $key.toString();
         |String $hex = null;
         |int $grp = -1;
         |boolean $pass = true;
         |for (int $i = 0; $pass && $i < $k; $i++) {
         |  final int $g = $i / 5;
         |  if ($g != $grp) {
         |    $hex = org.apache.commons.codec.digest.DigestUtils.md5Hex(
         |      "bf" + $g + ":" + $keyStr);
         |    $grp = $g;
         |  }
         |  final int $off = 6 * ($i % 5);
         |  final int $p = (int) (Long.parseLong(
         |    $hex.substring($off, $off + 6), 16) % $bits);
         |  if (($bm[$p >>> 6] & (1L << ($p & 63))) == 0L) { $pass = false; }
         |}
         |${ev.value} = $pass;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "bloom_contains"
}

object BloomContains {
  def column(key: Column, bitmap: Array[Long], k: Int): Column =
    ColumnBridge.column(BloomContains(
      ColumnBridge.expression(key.cast("string")), bitmap, k))
}
