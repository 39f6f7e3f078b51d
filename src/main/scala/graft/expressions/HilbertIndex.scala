package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{ByteType, DataType, IntegerType, LongType, ShortType}

/** Distance along the order-`bits` Hilbert curve of the point (x, y) —
  * the space-filling-curve clustering key with strictly better locality
  * than the Morton/Z interleave ([[graft.ops.Layout.zValue]]): every
  * curve-contiguous run of Hilbert indexes is a connected, compact region
  * of the plane (Z-order takes diagonal jumps at power-of-two seams, so a
  * Z-range can span two far-apart rectangles). Used exactly like the
  * Z-value: range-partition + sort by the index and parquet min/max
  * footer stats stay tight in BOTH dimensions.
  *
  * Algorithm: the classic bit-interleaving walk (Hamilton's xy→d form, as
  * in Wikipedia's `xy2d`): per bit from high to low, pick the quadrant,
  * accumulate `s²·((3·rx) xor ry)`, and rotate/reflect the frame. Pure
  * long shifts/compares — the generated code is an inline loop inside
  * whole-stage codegen (no virtual calls, no allocation). Inputs are
  * taken mod 2^`bits`; `bits` ≤ 31 keeps d < 2^62.
  *
  * Why a custom Expression rather than composed built-ins: the per-bit
  * frame rotation carries (x, y) STATE across iterations — a `when`-chain
  * formulation doubles in size per bit (each step's x/y depends on every
  * previous step's), which is exactly the exponential-lineage shape
  * Catalyst cannot simplify; here it is a 16-iteration loop.
  */
case class HilbertIndex(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression {

  require(bits >= 1 && bits <= 31, s"bits must be in [1, 31], got $bits")

  override def checkInputDataTypes(): TypeCheckResult = {
    def integral(dt: DataType): Boolean = dt match {
      case ByteType | ShortType | IntegerType | LongType => true
      case _ => false
    }
    if (integral(left.dataType) && integral(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires integral arguments, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  override def dataType: DataType = LongType

  override def prettyName: String = "hilbert_index"

  override def nullSafeEval(xv: Any, yv: Any): Any =
    HilbertIndex.xy2d(
      xv.asInstanceOf[Number].longValue(),
      yv.asInstanceOf[Number].longValue(), bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (xv, yv) => {
      val x = ctx.freshName("hx")
      val y = ctx.freshName("hy")
      val d = ctx.freshName("hd")
      val s = ctx.freshName("hs")
      val rx = ctx.freshName("hrx")
      val ry = ctx.freshName("hry")
      val t = ctx.freshName("ht")
      val mask = (1L << bits) - 1
      s"""
         |long $x = ((long) $xv) & ${mask}L;
         |long $y = ((long) $yv) & ${mask}L;
         |long $d = 0L;
         |for (long $s = 1L << ${bits - 1}; $s > 0L; $s >>= 1) {
         |  long $rx = (($x & $s) > 0L) ? 1L : 0L;
         |  long $ry = (($y & $s) > 0L) ? 1L : 0L;
         |  $d += $s * $s * ((3L * $rx) ^ $ry);
         |  if ($ry == 0L) {
         |    if ($rx == 1L) { $x = $s - 1L - $x; $y = $s - 1L - $y; }
         |    long $t = $x; $x = $y; $y = $t;
         |  }
         |}
         |${ev.value} = $d;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object HilbertIndex {

  /** Interpreted twin of the generated loop (and the form the DuckDB
    * oracle unrolls step by step). */
  def xy2d(xIn: Long, yIn: Long, bits: Int): Long = {
    val mask = (1L << bits) - 1
    var x = xIn & mask
    var y = yIn & mask
    var d = 0L
    var s = 1L << (bits - 1)
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) { x = s - 1 - x; y = s - 1 - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }
}
