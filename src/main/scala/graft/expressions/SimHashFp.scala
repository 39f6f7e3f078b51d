package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Row-local 60-bit SimHash fingerprint over a token array in ONE pass —
  * the thirteenth codegen'd kernel (r10 optimization round).
  *
  * Replaces [[graft.ops.Dedup.simhash]]'s explode + 60-sum-aggregate
  * formulation: that plan paid a Generate over every token, a per-token
  * 60-column aggregate update, and a full (id, 60 longs) shuffle before
  * the sign projection — all to compute a value that is a pure function
  * of the row's own tokens. Here each token's md5 runs once (compiled,
  * same digest the Catalyst `md5` function computes) and updates 60 vote
  * counters; the fingerprint bit j is the sign of vote sum j.
  *
  * Value parity with the aggregate path, bit for bit:
  *  - per-token hash = first 15 hex chars of md5(UTF-8 bytes) as a long
  *    ([[graft.ops.Hashing.hash60]] ≡ [[graft.ops.Hashing.longHash60]]),
  *    computed as (first 8 digest bytes big-endian) >>> 4;
  *  - vote = (h >> j) % 2 * 2 − 1 ∈ {−1, +1}; bit set iff Σ votes > 0
  *    (ties → 0, the aggregate's `otherwise(0)` branch);
  *  - null tokens are skipped (explode emitted them but `sum` ignored
  *    the null hash); an all-null token array yields fp = 0 (null sums
  *    fail the `> 0` test in every bit) — same here;
  *  - an EMPTY token array yields null (the aggregate path emitted no
  *    row for such a doc — callers filter nulls AFTER materializing,
  *    never through the projection, see [[graft.ops.Dedup.simhashPairs]]
  *    on the PushPredicateThroughProject double-evaluation trap). */
case class SimHashFp(child: Expression) extends UnaryExpression {

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string> (tokens), got " + t.simpleString)
  }

  override def dataType: DataType = LongType

  override def prettyName: String = "simhash_fp"

  override def nullSafeEval(toks: Any): Any =
    SimHashFp.compute(toks.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, toks => {
      s"""
         |java.lang.Long ${ev.value}_r = graft.expressions.SimHashFp.compute($toks);
         |if (${ev.value}_r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ${ev.value}_r.longValue(); }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHashFp {
  private val bits = 60

  private val md5 = ThreadLocal.withInitial[java.security.MessageDigest](
    () => java.security.MessageDigest.getInstance("MD5"))

  /** One pass over the tokens, 60 vote counters; null on an empty array
    * (no tokens → no fingerprint, the aggregate-path drop). */
  def compute(toks: ArrayData): java.lang.Long = {
    val n = toks.numElements()
    if (n == 0) return null
    val votes = new Array[Int](bits)
    val digest = md5.get()
    var i = 0
    while (i < n) {
      if (!toks.isNullAt(i)) {
        val d = digest.digest(toks.getUTF8String(i).getBytes)
        // first 15 hex chars of the digest as a long: the big-endian
        // first 8 bytes with the lowest nibble dropped (hash60 parity)
        var be = 0L
        var b = 0
        while (b < 8) { be = (be << 8) | (d(b) & 0xffL); b += 1 }
        val h = be >>> 4
        var j = 0
        while (j < bits) {
          votes(j) += (((h >>> j) & 1L).toInt << 1) - 1
          j += 1
        }
      }
      i += 1
    }
    var fp = 0L
    var j = 0
    while (j < bits) {
      if (votes(j) > 0) fp |= 1L << j
      j += 1
    }
    java.lang.Long.valueOf(fp)
  }
}
