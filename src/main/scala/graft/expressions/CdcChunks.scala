package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Content-defined chunking (CDC) over a token array in ONE O(n) pass:
  * the Rabin–Karp rolling window hash (same base-31 mod-P polynomial as
  * [[RollingHash]]) decides chunk boundaries — a cut falls BEFORE token
  * position `p` (p > 0) whenever the `width`-token window starting at
  * `p` satisfies `win[p] % modulus == 0`. The result is the array of
  * per-chunk content hashes (fold `((0·31+h₀)·31+h₁)… mod P` over each
  * chunk's token hashes), in document order.
  *
  * This is the storage/near-dup chunking used by dedup systems (LBFS /
  * restic / borg style): boundaries depend only on local content, so a
  * shared run of text chunks identically in every document that contains
  * it regardless of its offset — insertions shift chunk *positions* but
  * not chunk *identities*, which fixed-size blocking cannot do.
  *
  * Expected chunk length is `modulus` tokens (geometric); no min/max
  * clamps — the oracle mirrors exactly this rule. Fewer than `width`
  * tokens → one chunk (the whole document); empty array → empty array;
  * null input → null; a null token element poisons the array to null
  * (unreachable behind the shipped tokenizers).
  *
  * Why a custom Expression: boundary detection needs every window hash
  * AND a sequential scan carrying the open chunk's running fold — the
  * HOF formulation is two interpreted O(n·|B|) passes (chunk-id per
  * token = filtered-count of boundaries, then per-chunk re-folds); this
  * is one generated call inside whole-stage codegen, O(n) digests +
  * O(n) long ops, and the token array never leaves the projection.
  */
case class CdcChunks(child: Expression, width: Int, modulus: Int)
    extends UnaryExpression {

  require(width >= 1, s"width must be >= 1, got $width")
  require(modulus >= 2, s"modulus must be >= 2, got $modulus")

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "cdc_chunks"

  override def nullSafeEval(input: Any): Any =
    CdcChunks.chunkHashes(input.asInstanceOf[ArrayData], width, modulus)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      // single static call — keeps the expression inside the enclosing
      // WholeStageCodegen span (md5 work dwarfs call overhead)
      s"""
         |${ev.value} = graft.expressions.CdcChunks.chunkHashes($x, $width, $modulus);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CdcChunks {

  import RollingHash.{B, P, tokHash}

  /** Chunk content hashes under the boundary rule above; null iff a token
    * element is null. Called from both the interpreted `eval` and the
    * generated code (static forwarder). */
  def chunkHashes(arr: ArrayData, width: Int, modulus: Int): ArrayData = {
    val n = arr.numElements()
    if (n == 0) return new GenericArrayData(Array.emptyLongArray)
    val hs = new Array[Long](n)
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) return null
      hs(i) = tokHash(arr.getUTF8String(i))
      i += 1
    }
    // prefix fold for the window hashes: win[p] = (pre[p+w] − pre[p]·Bʷ) mod P
    val pre = new Array[Long](n + 1)
    i = 0
    while (i < n) { pre(i + 1) = (pre(i) * B + hs(i)) % P; i += 1 }
    var powW = 1L
    i = 0
    while (i < width) { powW = (powW * B) % P; i += 1 }
    val m = math.max(n - width + 1, 0)
    val out = new scala.collection.mutable.ArrayBuffer[Long](n / modulus + 1)
    var chunk = 0L // running fold of the open chunk
    i = 0
    while (i < n) {
      // cut BEFORE token i (i > 0) when the window starting at i hits 0 mod M
      if (i > 0 && i < m &&
          ((pre(i + width) - (pre(i) * powW) % P) % P + P) % P % modulus == 0) {
        out += chunk
        chunk = 0L
      }
      chunk = (chunk * B + hs(i)) % P
      i += 1
    }
    out += chunk
    new GenericArrayData(out.toArray)
  }
}
