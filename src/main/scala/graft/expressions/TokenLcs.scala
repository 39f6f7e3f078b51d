package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Token-level LONGEST COMMON SUBSEQUENCE length — the ROUGE-L kernel
  * (Lin 2004 §3.2): the most-reported summarization metric scores a
  * candidate by the LCS it shares with the reference (precision =
  * LCS/|cand|, recall = LCS/|ref|), rewarding in-order coverage without
  * requiring the contiguity ROUGE-N grams do.
  *
  * Why a custom Expression (the [[GramClipOverlap]] argument, applied
  * to a quadratic kernel): reference and candidate live in the SAME
  * row, so the O(|ref|·|cand|) DP is row-local — a relational
  * formulation would explode both token sequences, shuffle every
  * (id, pos, token) row, and rebuild sequential state an aggregate
  * can't express. This kernel runs the classic rolling-two-row DP
  * inside one codegen'd projection: tokens never leave the row, memory
  * is O(min side), and ROUGE-L is map-only over the pair table at any
  * corpus scale. Token identity is the same FNV-1a 64-bit hash
  * [[GramClipOverlap]] uses — collisions only matter between distinct
  * tokens of ONE document pair (a few hundred against 2⁶⁴), and the
  * DuckDB oracle replays exact string equality to hash-match the
  * result.
  *
  * Null in either side → null (the metric family's null contract);
  * null ELEMENTS hash to the shared sentinel, never NPE.
  */
case class TokenLcs(left: Expression, right: Expression)
    extends BinaryExpression {

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<string>, " +
          s"got ${l.simpleString} and ${r.simpleString}")
    }

  override def dataType: DataType = LongType

  override def prettyName: String = "token_lcs"

  override def nullSafeEval(a: Any, b: Any): Any =
    TokenLcs.lcs(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) =>
      s"${ev.value} = graft.expressions.TokenLcs.lcs($x, $y);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object TokenLcs {

  /** Rolling-two-row LCS DP over the FNV-hashed token sequences —
    * O(n·m) time, O(min(n, m)) space (the longer side streams). */
  def lcs(aArr: ArrayData, bArr: ArrayData): Long = {
    val a = GramClipOverlap.tokenHashes(aArr)
    val b = GramClipOverlap.tokenHashes(bArr)
    // LCS is symmetric: keep the shorter side as the DP row
    val (s, t) = if (a.length >= b.length) (a, b) else (b, a)
    val m = t.length
    if (m == 0) return 0L
    var prev = new Array[Int](m + 1)
    var cur = new Array[Int](m + 1)
    var i = 0
    while (i < s.length) {
      var j = 0
      while (j < m) {
        cur(j + 1) =
          if (s(i) == t(j)) prev(j) + 1
          else math.max(prev(j + 1), cur(j))
        j += 1
      }
      val tmp = prev; prev = cur; cur = tmp
      i += 1
    }
    prev(m).toLong
  }
}
