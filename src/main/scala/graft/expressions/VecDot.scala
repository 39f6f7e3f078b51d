package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native codegen'd dot product of two numeric vectors (`array<float>` or
  * `array<double>`), accumulating left-to-right in double — the exact fold
  * order of `aggregate(zip_with(a, b, (x,y) -> x*y), 0d, +)`, so results
  * are bit-identical to the higher-order-function formulation and to the
  * DuckDB oracle's `list_dot_product` on double lists. Null inputs, null
  * elements, and length mismatches all yield NULL, matching both: zip_with
  * pads the shorter array with null and null*x → null poisons the sum.
  *
  * Why a custom Expression: Spark's higher-order functions have no
  * `doGenCode` — each element evaluation is an interpreted lambda call. A
  * cosine top-k over n×m pairs of 64-dim vectors makes n·m·64 of those;
  * this expression turns them into a tight generated loop inside
  * whole-stage codegen.
  */
case class VecDot(left: Expression, right: Expression)
    extends BinaryExpression {

  // null is produced even from non-null inputs (ragged / null-element case)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float> or array<double> arguments, " +
        s"got ${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  override def dataType: DataType = DoubleType

  override def prettyName: String = "vec_dot"

  private def elemIsFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) return null
    val n = x.numElements()
    val xf = elemIsFloat(left); val yf = elemIsFloat(right)
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xv = if (xf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (yf) y.getFloat(i).toDouble else y.getDouble(i)
      acc += xv * yv
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      // fresh local names: two VecDots in one generated function (e.g. the
      // 128 ADC-table dots of a PQ projection) would otherwise redeclare
      // the same Java locals — a Janino compile error that silently drops
      // the WHOLE projection to interpreted mode
      val acc = ctx.freshName("vdAcc")
      val n = ctx.freshName("vdN")
      val i = ctx.freshName("vdI")
      val xGet = if (elemIsFloat(left)) s"(double) $x.getFloat($i)" else s"$x.getDouble($i)"
      val yGet = if (elemIsFloat(right)) s"(double) $y.getFloat($i)" else s"$y.getDouble($i)"
      s"""
         |if ($x.numElements() != $y.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  int $n = $x.numElements();
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($x.isNullAt($i) || $y.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += $xGet * $yGet;
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $acc; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
