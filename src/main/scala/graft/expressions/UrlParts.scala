package graft.expressions

import java.util.Locale

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass URL decomposition into `(sch, host, port, path, query)` as a
  * native codegen'd expression; null for anything that is not an
  * absolute http(s) URL.
  *
  * Why a custom Expression: the declarative formulation derives each
  * part with its own regex chain, and composing canonical-URL +
  * registered-domain + port from those Columns re-inlines every chain at
  * every use — the expanded projection blew the JVM method-size limit
  * and knocked the ENTIRE q279 projection out of whole-stage codegen
  * (observed: `WholeStageCodegenExec ... Whole-stage codegen disabled`).
  * As one deterministic expression the parse is emitted once, shared by
  * common-subexpression elimination across every getField use, and the
  * per-row cost is a single index scan — no regex engine at all.
  *
  * Semantics replicate the regex formulation EXACTLY (the DuckDB oracle
  * keeps using those regexes, so every oracle row is a parity check):
  * scheme `^[A-Za-z][A-Za-z0-9+.-]*://` lowercased, must be http/https;
  * authority = up to the first `/?#`, empty authority → null host AND
  * empty path (the path regex required `[^/?#]+`); userinfo stripped
  * through the FIRST `@`; port = trailing `:[0-9]+` (a bare trailing `:`
  * strips silently), nulled when default for the scheme (80/http,
  * 443/https); host lowercased with ONE trailing dot stripped, empty →
  * null; path = authority end to the first `?#` with ALL trailing
  * slashes stripped; query = first `?` ANYWHERE to the next `#`
  * (mirroring the search-anywhere `\?([^#]*)` extract). */
case class UrlParts(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.simpleString}")

  override def dataType: DataType = UrlParts.schema

  override def nullable: Boolean = true

  override def prettyName: String = "url_parts"

  override def nullSafeEval(input: Any): Any =
    UrlParts.parse(input.asInstanceOf[UTF8String])

  // not defineCodeGen: parse() returns SQL NULL (a null InternalRow) for
  // non-http(s) values, so the generated code must null-check the RESULT,
  // not just the input
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |${ev.value} = graft.expressions.UrlParts.parse($c);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object UrlParts {

  val schema: StructType = StructType(Seq(
    StructField("sch", StringType, nullable = true),
    StructField("host", StringType, nullable = true),
    StructField("port", IntegerType, nullable = true),
    StructField("path", StringType, nullable = true),
    StructField("query", StringType, nullable = true)))

  private def isSchemeStart(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')

  private def isSchemeChar(c: Char): Boolean =
    isSchemeStart(c) || (c >= '0' && c <= '9') ||
      c == '+' || c == '.' || c == '-'

  /** Static entry point shared by eval and generated code. Returns null
    * (SQL null struct) unless the value is an absolute http(s) URL. */
  def parse(u0: UTF8String): InternalRow = {
    // UTF8String.trim trims 0x20 only — same as SQL trim()
    val s = u0.trim().toString
    if (s.isEmpty || !isSchemeStart(s.charAt(0))) return null
    var i = 1
    while (i < s.length && isSchemeChar(s.charAt(i))) i += 1
    if (i + 2 >= s.length || s.charAt(i) != ':' ||
      s.charAt(i + 1) != '/' || s.charAt(i + 2) != '/') return null
    val sch = s.substring(0, i).toLowerCase(Locale.ROOT)
    if (sch != "http" && sch != "https") return null

    var j = i + 3
    val authStart = j
    while (j < s.length && s.charAt(j) != '/' && s.charAt(j) != '?' &&
      s.charAt(j) != '#') j += 1
    val rawAuth = s.substring(authStart, j)

    // userinfo: strip through the first '@' (regex ^[^@]*@)
    val at = rawAuth.indexOf('@')
    var auth = if (at >= 0) rawAuth.substring(at + 1) else rawAuth

    // trailing :[0-9]* strips; port value only when digits are non-empty
    var port: Integer = null
    val colon = auth.lastIndexOf(':')
    if (colon >= 0) {
      val digits = auth.substring(colon + 1)
      var allDigits = true
      var d = 0
      while (d < digits.length) {
        if (digits.charAt(d) < '0' || digits.charAt(d) > '9') allDigits = false
        d += 1
      }
      if (allDigits) {
        if (digits.nonEmpty) {
          // default-port test on the DIGIT STRING (":080" is not ":80"),
          // exactly like the regex formulation's string comparison
          val default = (sch == "http" && digits == "80") ||
            (sch == "https" && digits == "443")
          if (!default) {
            require(digits.length <= 9, s"port out of range: :$digits")
            port = java.lang.Integer.parseInt(digits)
          }
        }
        auth = auth.substring(0, colon)
      }
    }

    // host: lowercase, ONE trailing dot stripped (regex \.$), empty → null
    var host = auth.toLowerCase(Locale.ROOT)
    if (host.nonEmpty && host.charAt(host.length - 1) == '.')
      host = host.substring(0, host.length - 1)
    val hostOut = if (host.isEmpty) null else UTF8String.fromString(host)

    // path: authority end to the first ?/#, ALL trailing slashes stripped;
    // the regex required a non-empty authority, so empty authority → ""
    val path =
      if (rawAuth.isEmpty) ""
      else {
        var k = j
        while (k < s.length && s.charAt(k) != '?' && s.charAt(k) != '#')
          k += 1
        var e = k
        while (e > j && s.charAt(e - 1) == '/') e -= 1
        s.substring(j, e)
      }

    // query: first '?' ANYWHERE to the next '#' (regex \?([^#]*) searches
    // the whole string)
    val qm = s.indexOf('?')
    val query =
      if (qm < 0) ""
      else {
        val hm = s.indexOf('#', qm + 1)
        s.substring(qm + 1, if (hm < 0) s.length else hm)
      }

    new GenericInternalRow(Array[Any](
      UTF8String.fromString(sch),
      hostOut,
      port,
      UTF8String.fromString(path),
      UTF8String.fromString(query)))
  }
}
