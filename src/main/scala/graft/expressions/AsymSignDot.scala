package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Asymmetric sign dot product — the candidate scorer of the 1-bit ANN
  * tier ([[graft.ops.Similarity.topKAsymCells]]): given the corpus
  * vector's PACKED sign words (bit i of word ⌊i/32⌋ = sign of dim i,
  * 32 dims/word — the [[graft.ops.Similarity.binaryQuantize]] layout)
  * and the query's dims quantized to exact integer micro-units, returns
  * `Σᵢ (bitᵢ ? qᵢ : −qᵢ)` as one long.
  *
  * Why a custom Expression: the Column formulation is a 64-term
  * `when(bitwiseAND…)` chain — correct, but it codegens 64 branches
  * per candidate row and the serving join evaluates it once per
  * (query, same-cell candidate) pair, the hottest row count in the
  * path (measured 2.3× wall for 10× rows vs the popcount tier's 1.5×).
  * This kernel is one generated static call with a tight shift/mask
  * loop — the UnigramViterbi/RollingHash pattern of folding a wide
  * per-row expression into a single JIT-friendly method. Integer
  * arithmetic throughout: order-independent, no float-accumulation
  * contract, bit-replayable by the SQL oracle.
  *
  * Null in either side → null; elements are never null by construction
  * (both arrays come from engine projections). */
case class AsymSignDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<bigint> (packed sign words, " +
          s"quantized query dims), got ${l.simpleString} and ${r.simpleString}")
    }

  override def dataType: DataType = LongType

  override def prettyName: String = "asym_sign_dot"

  override def nullSafeEval(w: Any, q: Any): Any =
    AsymSignDot.score(w.asInstanceOf[ArrayData], q.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (w, q) =>
      s"${ev.value} = graft.expressions.AsymSignDot.score($w, $q);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object AsymSignDot {

  /** `Σᵢ (bit i of words ? qi(i) : −qi(i))` — dims beyond the packed
    * width read bit 0 of a missing word never happens by construction
    * (callers pass ⌈dim/32⌉ words for exactly `qi.length` dims). */
  def score(words: ArrayData, qi: ArrayData): Long = {
    val n = qi.numElements()
    var s = 0L
    var i = 0
    while (i < n) {
      val q = qi.getLong(i)
      s += (if (((words.getLong(i >> 5) >>> (i & 31)) & 1L) != 0L) q else -q)
      i += 1
    }
    s
  }
}
