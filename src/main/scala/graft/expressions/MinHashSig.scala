package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Row-local MinHash signature — the k permuted minima of a document's
  * shingle-hash array in ONE pass (for each hash, update all k running
  * minima in a tight loop), as a codegen'd kernel.
  *
  * Why a custom Expression: the Column formulation is k separate
  * `array_min(transform(hs, …))` lambdas — higher-order functions never
  * enter whole-stage codegen, so each document pays k interpreted
  * traversals of its shingle array (measured 18 s at sf0.1 for the q336
  * gate's two sides; this kernel brings the same plan to ~2 s). The
  * BATCH pair pipeline avoids the problem with explode + k min
  * aggregates ([[graft.ops.Dedup.minhashPairs]]), but a STREAMING gate
  * has only one aggregation to spend and must band row-locally — this
  * kernel is how the row-local form stays cheap.
  *
  * Permutation j: `(37j+11)·h + (101j+7) mod P`, P = 1000000007 — the
  * [[graft.ops.Hashing.permute]] constants, mirrored in the SQL
  * oracles. Empty input → null (a doc with no shingles has no
  * signature — [[graft.ops.Dedup.minhashPairs]] drops such docs too). */
case class MinHashSig(child: Expression, k: Int)
    extends UnaryExpression {

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint> (mod-P shingle hashes), got " +
        t.simpleString)
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "minhash_sig"

  override def nullSafeEval(hs: Any): Any =
    MinHashSig.compute(hs.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, hs => {
      s"""
         |${ev.value} = graft.expressions.MinHashSig.compute($hs, $k);
         |if (${ev.value} == null) { ${ev.isNull} = true; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashSig {
  private val P = 1000000007L

  /** One pass over the hashes, k running minima; null on empty input
    * (no shingles → no signature). */
  def compute(hs: ArrayData, k: Int): GenericArrayData = {
    val n = hs.numElements()
    if (n == 0) return null
    val mins = Array.fill(k)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val h = hs.getLong(i)
      var j = 0
      while (j < k) {
        val v = ((37L * j + 11L) * h + (101L * j + 7L)) % P
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }
}
