package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Clipped n-gram multiset overlap for ALL orders 1..`maxN` in one
  * per-row pass — the shared kernel of BLEU (Papineni 2002), chrF
  * (Popović 2015) and ROUGE-N (Lin 2004): element `n−1` of the output
  * is `Σ_g min(count_ref(g), count_cand(g))` over order-`n` grams.
  * `chars = false` takes two token arrays (word grams); `chars = true`
  * takes two strings (code-point grams, matching SQL `substr`/`length`
  * character semantics).
  *
  * Why a custom Expression: reference and candidate live in the SAME
  * row, so clipped precision is row-local — yet the compositional
  * formulation pays a tagged flatten-explode of every gram on both
  * sides, two (id, n, gram) shuffled hash-aggregates and an equi-join
  * clip (~8 gram-rows through the network per token at maxN = 4).
  * This kernel keeps the whole metric inside one codegen'd projection:
  * gram text never leaves the row, the shuffle disappears entirely,
  * and BLEU/chrF/ROUGE become map-only over the pair table (measured
  * 15 s → ~3 s on the sf1 MT-eval report). Gram identity is a 64-bit
  * mixed hash (FNV-1a tokens, splitmix combine) — collisions only
  * matter between distinct grams of one document pair (a few hundred
  * against 2⁶⁴), the same admissibility argument as the engine-wide
  * xxhash64 bucketing; the DuckDB oracle replays exact string grams
  * and hash-matches the counts.
  *
  * Null in either side → null row (the metrics' null contract).
  */
case class GramClipOverlap(
    left: Expression,
    right: Expression,
    maxN: Int,
    chars: Boolean)
    extends BinaryExpression {

  require(maxN >= 1 && maxN <= 9, s"maxN must be in [1, 9], got $maxN")

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) if chars =>
        TypeCheckResult.TypeCheckSuccess
      case (ArrayType(StringType, _), ArrayType(StringType, _)) if !chars =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two ${if (chars) "strings" else "array<string>"}, " +
          s"got ${l.simpleString} and ${r.simpleString}")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "gram_clip_overlap"

  override def nullSafeEval(a: Any, b: Any): Any =
    if (chars)
      GramClipOverlap.overlapChars(
        a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String], maxN)
    else
      GramClipOverlap.overlapTokens(
        a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], maxN)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val fn = if (chars) "overlapChars" else "overlapTokens"
      s"${ev.value} = graft.expressions.GramClipOverlap.$fn($x, $y, $maxN);"
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object GramClipOverlap {

  /** FNV-1a 64 per token over its UTF-8 bytes. A NULL element hashes to
    * a fixed sentinel (the FNV offset basis) instead of NPE-ing — the
    * in-repo callers feed `split()` output (never null), but the
    * type check admits containsNull arrays, so an external caller must
    * get a defined gram identity, not an executor NullPointerException. */
  private[expressions] def tokenHashes(a: ArrayData): Array[Long] = {
    val n = a.numElements()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) {
        out(i) = 0xcbf29ce484222325L
      } else {
        val bytes = a.getUTF8String(i).getBytes
        var h = 0xcbf29ce484222325L
        var j = 0
        while (j < bytes.length) {
          h = (h ^ (bytes(j) & 0xffL)) * 0x100000001b3L
          j += 1
        }
        out(i) = h
      }
      i += 1
    }
    out
  }

  /** Splitmix-finalized hash per Unicode CODE POINT — gram boundaries
    * match SQL substr/length character semantics (code points, not
    * UTF-16 units), so supplementary-plane text grams identically. */
  private def codePointHashes(s: UTF8String): Array[Long] = {
    val str = s.toString
    val out = new Array[Long](str.codePointCount(0, str.length))
    var i = 0
    var k = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      var h = cp * 0x9E3779B97F4A7C15L
      h ^= (h >>> 32)
      h *= 0xC2B2AE3D27D4EB4FL
      h ^= (h >>> 29)
      out(k) = h
      k += 1
      i += Character.charCount(cp)
    }
    out
  }

  /** Order-tagged gram hash of `h(i … i+n−1)` — the order seeds the
    * combine so an order-1 gram can never alias an order-2 gram. */
  private def gramHash(h: Array[Long], i: Int, n: Int): Long = {
    var g = 0x9E3779B97F4A7C15L * (n + 1)
    var k = i
    while (k < i + n) {
      g = (g ^ h(k)) * 0xC2B2AE3D27D4EB4FL
      g ^= (g >>> 29)
      k += 1
    }
    g
  }

  private def overlaps(
      ha: Array[Long], hb: Array[Long], maxN: Int): ArrayData = {
    val out = new Array[Long](maxN)
    val map = new java.util.HashMap[java.lang.Long, Integer]()
    var n = 1
    while (n <= maxN) {
      map.clear()
      var i = 0
      while (i + n <= ha.length) {
        val g = java.lang.Long.valueOf(gramHash(ha, i, n))
        val c = map.get(g)
        map.put(g, if (c == null) 1 else c + 1)
        i += 1
      }
      var ov = 0L
      var j = 0
      while (j + n <= hb.length) {
        val g = java.lang.Long.valueOf(gramHash(hb, j, n))
        val c = map.get(g)
        if (c != null && c > 0) {
          map.put(g, c - 1)
          ov += 1
        }
        j += 1
      }
      out(n - 1) = ov
      n += 1
    }
    new GenericArrayData(out)
  }

  def overlapTokens(a: ArrayData, b: ArrayData, maxN: Int): ArrayData =
    overlaps(tokenHashes(a), tokenHashes(b), maxN)

  def overlapChars(a: UTF8String, b: UTF8String, maxN: Int): ArrayData =
    overlaps(codePointHashes(a), codePointHashes(b), maxN)
}
