package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Keyed Feistel shuffle position ([[graft.ops.Sampling.shufflePos]]'s
  * kernel): the 4-round balanced Feistel permutation of `key` on
  * [0, 4^bits) as ONE generated static call.
  *
  * Why a custom Expression: the Column formulation re-inlines the
  * domain-guarded key sub-expression at every one of its ~30 references
  * per epoch column (Catalyst expressions are trees, not DAGs — no
  * sharing), so a 3-epoch projection is already a wall of nested CASEs
  * in the plan, and wider epoch counts risk the JVM method-size limit
  * that silently disables whole-stage codegen (the UrlParts lesson).
  * Here the whole permutation is a tight shift/mask loop; round keys
  * are baked per-instance constants. Out-of-domain keys throw (the
  * raise_error contract of the Column form). Null key → null. */
case class FeistelPos(child: Expression, roundKeys: Seq[Long], bits: Int)
    extends UnaryExpression {

  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires bigint key, got ${t.simpleString}")
  }

  override def dataType: DataType = LongType

  override def prettyName: String = "feistel_pos"

  private lazy val ks: Array[Long] = roundKeys.toArray

  override def nullSafeEval(key: Any): Any =
    FeistelPos.pos(key.asInstanceOf[Long], ks, bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ksRef = ctx.addReferenceObj("feistelKeys", ks, "long[]")
    nullSafeCodeGen(ctx, ev, key =>
      s"${ev.value} = graft.expressions.FeistelPos.pos($key, $ksRef, $bits);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object FeistelPos {
  /** 4 rounds of `(l, r) -> (r, l xor ((r·2654435761 + k) mod 2^bits))`
    * over the key's two `bits`-wide halves; throws on out-of-domain. */
  def pos(key: Long, ks: Array[Long], bits: Int): Long = {
    val half = 1L << bits
    val mask = half - 1
    if (key < 0 || key >= half * half)
      throw new IllegalArgumentException(
        s"shufflePos key out of [0, ${half * half}): $key")
    var l = (key >> bits) & mask
    var r = key & mask
    var i = 0
    while (i < ks.length) {
      val nr = l ^ ((r * 2654435761L + ks(i)) % half)
      l = r
      r = nr
      i += 1
    }
    l * half + r
  }
}
