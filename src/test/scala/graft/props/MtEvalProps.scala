package graft.props

import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

import graft.expressions.GramClipOverlap

/** Invariants of the round-8 MT-eval kernel: the hashed per-row clipped
  * overlap must agree with an exact brute-force string-gram multiset
  * intersection on ARBITRARY token/character material (the hash
  * admissibility claim, tested instead of assumed), respect the
  * mathematical bounds of clipped precision, and be symmetric-bounded.
  * Driver-side only (the kernel is pure) — no Spark session, so the
  * generator budget can be generous. */
object MtEvalProps extends Properties("graft.invariants.round8mt") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(200)

  private val genTok: Gen[String] =
    Gen.choose(1, 5).flatMap(n => Gen.listOfN(n,
      Gen.frequency(6 -> Gen.alphaLowerChar, 1 -> Gen.numChar,
        1 -> Gen.oneOf('ä', 'ß', 'м', '中'))).map(_.mkString))

  private val genToks: Gen[List[String]] = Gen.listOf(genTok)

  private def brute(a: Seq[String], b: Seq[String], n: Int): Long = {
    def grams(t: Seq[String]) =
      t.sliding(n).filter(_.size == n).map(_.mkString("\u0000")).toSeq
    val ra = grams(a).groupBy(identity).view.mapValues(_.size).toMap
    grams(b).groupBy(identity)
      .map { case (g, c) => math.min(ra.getOrElse(g, 0), c.size).toLong }
      .sum
  }

  private def kernel(a: Seq[String], b: Seq[String], maxN: Int): Seq[Long] =
    GramClipOverlap.overlapTokens(
      ArrayData.toArrayData(a.map(UTF8String.fromString).toArray),
      ArrayData.toArrayData(b.map(UTF8String.fromString).toArray),
      maxN).toLongArray().toSeq

  property("token kernel == brute multiset clip for n = 1..4") =
    forAll(genToks, genToks) { (a, b) =>
      val got = kernel(a, b, 4)
      (1 to 4).forall(n => got(n - 1) == brute(a, b, n))
    }

  property("overlap bounded by both sides' gram counts") =
    forAll(genToks, genToks) { (a, b) =>
      val got = kernel(a, b, 3)
      (1 to 3).forall { n =>
        got(n - 1) <= math.max(0, a.size - (n - 1)) &&
          got(n - 1) <= math.max(0, b.size - (n - 1))
      }
    }

  property("self overlap == own gram count (clipped precision 1)") =
    forAll(genToks) { a =>
      val got = kernel(a, a, 4)
      (1 to 4).forall(n => got(n - 1) == math.max(0, a.size - (n - 1)))
    }

  property("overlap is symmetric (min is commutative)") =
    forAll(genToks, genToks) { (a, b) =>
      kernel(a, b, 3) == kernel(b, a, 3)
    }

  private def lcsKernel(a: Seq[String], b: Seq[String]): Long =
    graft.expressions.TokenLcs.lcs(
      ArrayData.toArrayData(a.map(UTF8String.fromString).toArray),
      ArrayData.toArrayData(b.map(UTF8String.fromString).toArray))

  /** Exact reference LCS: full-table DP on the strings themselves. */
  private def bruteLcs(a: Seq[String], b: Seq[String]): Long = {
    val dp = Array.ofDim[Int](a.size + 1, b.size + 1)
    for (i <- 1 to a.size; j <- 1 to b.size)
      dp(i)(j) = if (a(i - 1) == b(j - 1)) dp(i - 1)(j - 1) + 1
        else math.max(dp(i - 1)(j), dp(i)(j - 1))
    dp(a.size)(b.size).toLong
  }

  property("token LCS kernel == brute full-table DP") =
    forAll(genToks, genToks) { (a, b) =>
      lcsKernel(a, b) == bruteLcs(a, b)
    }

  property("LCS bounds: <= both lengths; == length on identical; symmetric") =
    forAll(genToks, genToks) { (a, b) =>
      val l = lcsKernel(a, b)
      l <= math.min(a.size, b.size) &&
        lcsKernel(a, a) == a.size.toLong &&
        l == lcsKernel(b, a)
    }

  property("LCS >= longest common prefix (an order-respecting floor)") =
    forAll(genToks, genToks) { (a, b) =>
      val cp = a.zip(b).takeWhile { case (x, y) => x == y }.size
      lcsKernel(a, b) >= cp.toLong
    }

  // astral char (GRINNING FACE, U+1F600) as a surrogate-pair STRING —
  // a Char literal cannot hold a supplementary code point
  private val genText: Gen[String] = Gen.listOf(
    Gen.frequency(8 -> Gen.alphaLowerChar.map(_.toString),
      1 -> Gen.oneOf("é", "м"),
      1 -> Gen.const(new String(Character.toChars(0x1F600)))))
    .map(_.mkString)

  property("null array elements hash to a defined sentinel, never NPE") =
    forAll(genToks, genToks) { (a, b) =>
      // the type check admits containsNull arrays; a null token must act
      // as one fixed pseudo-token (here spliced at the front of each
      // side), not blow up the executor
      def withNull(t: Seq[String]): ArrayData = ArrayData.toArrayData(
        (null +: t.map(UTF8String.fromString)).toArray[AnyRef])
      val got = GramClipOverlap.overlapTokens(
        withNull(a), withNull(b), 2).toLongArray().toSeq
      // unigram overlap: the shared null sentinel contributes exactly 1
      got.head == brute(a, b, 1) + 1 && got(1) >= brute(a, b, 2)
    }

  property("char kernel == brute code-point grams (incl. astral chars)") =
    forAll(genText, genText) { (a, b) =>
      def grams(s: String, n: Int) = {
        val cps = s.codePoints.toArray.toSeq
        cps.sliding(n).filter(_.size == n).map(_.mkString(",")).toSeq
      }
      def bruteC(x: String, y: String, n: Int): Long = {
        val ra = grams(x, n).groupBy(identity).view.mapValues(_.size).toMap
        grams(y, n).groupBy(identity)
          .map { case (g, c) => math.min(ra.getOrElse(g, 0), c.size).toLong }
          .sum
      }
      val got = GramClipOverlap.overlapChars(
        UTF8String.fromString(a), UTF8String.fromString(b), 3)
        .toLongArray().toSeq
      (1 to 3).forall(n => got(n - 1) == bruteC(a, b, n))
    }
}
