package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

class UnigramSpec extends SparkSpec {
  import spark.implicits._

  test("segment: Viterbi picks the min-cost split, not greedy/longest") {
    val w = Seq("the", "then", "a42", "q").toDF("word")
    val got = Unigram.segment(w).orderBy("word")
      .select("word", "len", "cost", "n_pieces", "seg").collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4))).toMap
    // "the" as one piece (2500) beats th|e (5100) and t|h|e (9800)
    assert(got("the") == ((3L, 2500L, 1L, "the")))
    // "then": th|en (4600) beats the|n (5800) — longest-match is wrong here
    assert(got("then") == ((4L, 4600L, 2L, "th|en")))
    // digits fall to the unk channel; k=1/k=2 cost tie resolves short-first
    assert(got("a42") == ((3L, 21100L, 3L, "a|4|2")))
    assert(got("q") == ((1L, 5400L, 1L, "q")))
  }

  test("segment: cap truncates, passthrough columns survive, DP is exact") {
    val w = Seq(("extraordinarily", 7L)).toDF("word", "n_occ")
    val r = Unigram.segment(w, maxLen = 10).head()
    assert(r.getAs[Long]("n_occ") == 7L)
    assert(r.getAs[Long]("len") == 10L) // "extraordin"
    // driver-side reference DP over the same vocab must agree exactly
    val vocab = Unigram.piecesV1.toMap
    def cost(p: String): Long =
      vocab.get(p).map(_.toLong).getOrElse(9000L * p.length)
    val s = "extraordinarily".take(10)
    val best = Array.fill(s.length + 1)(Long.MaxValue)
    best(0) = 0L
    for (i <- 1 to s.length; k <- 1 to math.min(3, i))
      best(i) = math.min(best(i), best(i - k) + cost(s.substring(i - k, i)))
    assert(r.getAs[Long]("cost") == best(s.length))
    // the reported segmentation re-prices to the reported cost
    val segCost = r.getAs[String]("seg").split('|').map(cost).sum
    assert(segCost == r.getAs[Long]("cost"))
  }

  test("fertility: occurrence-weighted pieces and cost per group") {
    // "the"×2 (1 piece, 2500) + "cat"×1 (c|at, 2 pieces, 6200)
    val df = Seq(("en", "the the cat")).toDF("lang", "text")
    val r = Unigram.fertility(df, "lang", "text").head()
    assert(r.getAs[Long]("total_words") == 3L)
    assert(r.getAs[Long]("total_pieces") == 4L)
    assert(r.getAs[Long]("total_chars") == 9L)
    assert(r.getAs[Double]("fertility") == 1.333333)
    assert(r.getAs[Double]("cost_per_char") == 1244.444444)
  }
}
