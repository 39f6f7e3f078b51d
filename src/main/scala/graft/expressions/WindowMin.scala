package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** All `width`-window minima of a long array in ONE O(n) pass via a
  * monotonic deque — the selection step of winnowing fingerprints
  * (Schleimer/Wilkerson/Aiken 2003): window j of the output is
  * `min(input[j … j+width−1])`, fewer than `width` elements → empty.
  *
  * Why a custom Expression: the `transform(sequence(…), j ->
  * array_min(slice(hs, j, w)))` formulation is O(n·w) interpreted lambda
  * calls outside whole-stage codegen (higher-order functions have no
  * doGenCode) — the same cliff [[RollingHash]] retired for the hash
  * pass. This keeps the fingerprint chain
  * RollingHash → WindowMin → array_distinct one codegen'd projection.
  * The DuckDB oracle uses the O(n·w) `list_min(ws[j+1:j+w])` list
  * comprehension — same minima, cost only paid at oracle scale.
  *
  * Null input → null; null elements are unreachable (the input is
  * always [[RollingHash]] output, which never contains nulls).
  */
case class WindowMin(child: Expression, width: Int)
    extends UnaryExpression {

  require(width >= 1, s"width must be >= 1, got $width")

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint>, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "window_min"

  override def nullSafeEval(input: Any): Any =
    WindowMin.slidingMin(input.asInstanceOf[ArrayData], width)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      s"""
         |${ev.value} = graft.expressions.WindowMin.slidingMin($x, $width);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WindowMin {

  /** Monotonic-deque sliding minimum: O(n) total — each index enters and
    * leaves the deque at most once. */
  def slidingMin(arr: ArrayData, width: Int): ArrayData = {
    val n = arr.numElements()
    val m = n - width + 1
    if (m <= 0) return new GenericArrayData(Array.emptyLongArray)
    val out = new Array[Long](m)
    val deque = new Array[Int](n) // indices, front..back ascending values
    var head = 0
    var tail = -1
    var i = 0
    while (i < n) {
      val v = arr.getLong(i)
      // drop indices whose values can no longer be a window minimum
      while (tail >= head && arr.getLong(deque(tail)) >= v) tail -= 1
      tail += 1
      deque(tail) = i
      // drop the front when it slides out of the window
      if (deque(head) <= i - width) head += 1
      if (i >= width - 1) out(i - width + 1) = arr.getLong(deque(head))
      i += 1
    }
    new GenericArrayData(out)
  }
}
