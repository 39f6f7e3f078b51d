package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** URL query-string canonicalization (split on `&`, drop empties and
  * tracking parameters, sort, re-join) as a native codegen'd expression.
  *
  * Why a custom Expression: the declarative formulation is
  * `array_join(array_sort(filter(split(q, "&"), λ)), "&")` — and
  * lambda-bearing higher-order functions (`ArrayFilter`) are
  * CodegenFallback, so ONE canonicalization column knocks the whole
  * projection out of whole-stage codegen (the q279/q280/q287 hot path is
  * regex + this; the regexes are codegen'd, the HOF was the only break).
  * The semantics here are bit-identical to that formulation: trailing
  * empties kept by split then dropped by the filter, keys compared
  * lowercased (ROOT locale), parts sorted by UTF8String binary order —
  * the same order `array_sort` and DuckDB's default-collation
  * `list_sort` use.
  */
case class CanonQuery(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.simpleString}")

  override def dataType: DataType = StringType

  override def prettyName: String = "canon_query"

  override def nullSafeEval(input: Any): Any =
    CanonQuery.canon(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.CanonQuery.canon($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CanonQuery {

  /** Tracking parameters stripped during canonicalization — the single
    * source of truth ([[graft.ops.Url.trackingParams]] re-exports it;
    * the oracle SQL is generated from the same Seq). */
  val trackingParams: Seq[String] = Seq(
    "utm_source", "utm_medium", "utm_campaign", "utm_term", "utm_content",
    "gclid", "fbclid", "msclkid", "igshid", "mc_eid", "ref")

  private val trackingSet: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    trackingParams.foreach(p => s.add(p): Unit)
    s
  }

  private val Amp = UTF8String.fromString("&")

  /** Static entry point shared by eval and generated code. */
  def canon(q: UTF8String): UTF8String = {
    if (q.numBytes() == 0) return q
    val parts = q.split(Amp, -1)
    val kept = new java.util.ArrayList[UTF8String](parts.length)
    var i = 0
    while (i < parts.length) {
      val p = parts(i)
      if (p.numBytes() > 0) {
        val s = p.toString
        val eq = s.indexOf('=')
        val k = (if (eq < 0) s else s.substring(0, eq))
          .toLowerCase(java.util.Locale.ROOT)
        if (!trackingSet.contains(k) && !k.startsWith("utm_")) kept.add(p): Unit
      }
      i += 1
    }
    val arr = kept.toArray(new Array[UTF8String](kept.size()))
    // UTF8String compareTo = binary byte order (≡ array_sort / list_sort)
    java.util.Arrays.sort(arr, java.util.Comparator.naturalOrder[UTF8String]())
    UTF8String.concatWs(Amp, arr: _*)
  }
}
