package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** All `width`-token window hashes of a token array in ONE O(n) pass:
  * per-token 60-bit md5 hash reduced mod P, then a Rabin–Karp rolling
  * polynomial (base 31, mod P = 1000000007) over every window via prefix
  * hashes — `win[i] = (pre[i+w] − pre[i]·31ʷ) mod P`. Windows equal the
  * direct fold `((0·31+t₀)·31+t₁)… mod P` over each slice, which is the
  * form the DuckDB oracle reproduces with `list_reduce` (same integer
  * arithmetic, no overflow: operands stay < P² < 2⁶³).
  *
  * Why a custom Expression: the `transform(sequence(…), i ->
  * aggregate(slice(toks,i,w), …))` formulation is O(n·w) interpreted
  * lambda calls per document — higher-order functions have no
  * `doGenCode`, and the nested aggregate re-folds every window from
  * scratch. This expression is one generated call computing all windows
  * in O(n) digests + O(n) long ops, inside whole-stage codegen.
  *
  * Null input → null; a null token element poisons the whole array to
  * null (tokenizers never produce null elements, so this is unreachable
  * in the shipped pipelines). Fewer than `width` tokens → empty array.
  */
case class RollingHash(child: Expression, width: Int)
    extends UnaryExpression {

  require(width >= 1, s"width must be >= 1, got $width")

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "rolling_hash"

  override def nullSafeEval(input: Any): Any =
    RollingHash.spanHashes(input.asInstanceOf[ArrayData], width)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      // the heavy lifting (md5 per token) dwarfs loop overhead, so the
      // generated code is a single static call — the expression still
      // lives inside the WholeStageCodegen span (no interpreted-projection
      // boundary), which is what matters for the surrounding pipeline
      s"""
         |${ev.value} = graft.expressions.RollingHash.spanHashes($x, $width);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RollingHash {

  /** Mod for the polynomial — [[graft.ops.Hashing.P]] (duplicated here to
    * keep the expression package free of an ops dependency). */
  val P = 1000000007L

  /** Polynomial base; mirrored in every DuckDB `list_reduce` oracle. */
  val B = 31L

  private val md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** First 15 hex chars of md5 as a long (≡ [[graft.ops.Hashing.hash60]]),
    * reduced mod [[P]] — bit-identical to the oracle's
    * `('0x' || substr(md5(t),1,15))::BIGINT % P`. */
  def tokHash(s: UTF8String): Long = {
    val d = md5.get()
    d.reset()
    val digest = d.digest(s.getBytes)
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (digest(i) & 0xffL); i += 1 }
    v = (v << 4) | ((digest(7) & 0xf0L) >>> 4) // 15th hex char = high nibble
    v % P
  }

  /** All window hashes; null iff a token element is null. Called from both
    * the interpreted `eval` and the generated code (static forwarder). */
  def spanHashes(arr: ArrayData, width: Int): ArrayData = {
    val n = arr.numElements()
    // pre[j] = fold of the first j token hashes; powW = B^width mod P
    val pre = new Array[Long](n + 1)
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) return null
      pre(i + 1) = (pre(i) * B + tokHash(arr.getUTF8String(i))) % P
      i += 1
    }
    var powW = 1L
    i = 0
    while (i < width) { powW = (powW * B) % P; i += 1 }
    val m = math.max(n - width + 1, 0)
    val out = new Array[Long](m)
    i = 0
    while (i < m) {
      out(i) = ((pre(i + width) - (pre(i) * powW) % P) % P + P) % P
      i += 1
    }
    new GenericArrayData(out)
  }
}
