package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Unigram-LM (SentencePiece-style, Kudo 2018) Viterbi segmentation with
  * a PINNED piece vocabulary — the serving half of the second major
  * subword family beside BPE (q228/q229): given per-piece integer costs
  * (≈ −1000·ln p), segment each word into the minimum-total-cost piece
  * sequence.
  *
  * The min-plus DP is FULLY UNROLLED into column expressions: words are
  * capped at `maxLen` chars and pieces at `maxPiece`, so `best(i) =
  * min_k best(i−k) + cost(word[i−k+1 … i])` becomes `maxLen` chained
  * projections of `least(...)` / `CASE` columns and the backward
  * reconstruction another `maxLen` — ONE declarative plan, no UDF, no
  * explode, no driver loop over data. Integer costs keep both engines
  * bit-exact (no float parity concerns anywhere in the DP).
  *
  * Scale shape: the op runs on the DISTINCT word table (bounded by the
  * vocabulary, not the corpus — the standard tokenizer-serving layout:
  * segment the vocab once, join by word). All arithmetic is per-row
  * column work in whole-stage codegen; Spark's CollapseProject keeps
  * multi-referenced DP columns as separate projections, so the unrolled
  * plan stays linear in `maxLen`, not exponential.
  */
object Unigram {

  /** Pinned piece vocabulary v1: all 26 single letters (so every a-z
    * word segments without the unknown fallback) plus 20 frequent
    * English 2-/3-grams priced below the sum of their parts. Costs are
    * integer ≈ −1000·ln p, smaller = more probable. */
  val piecesV1: Seq[(String, Int)] = Seq(
    "the" -> 2500, "ing" -> 2800, "ion" -> 3000, "ent" -> 3200,
    "er" -> 2200, "on" -> 2400, "re" -> 2300, "at" -> 2400,
    "en" -> 2500, "es" -> 2400, "or" -> 2600, "te" -> 2500,
    "an" -> 2300, "in" -> 2200, "th" -> 2100, "he" -> 2300,
    "nd" -> 2700, "st" -> 2500, "ar" -> 2600, "ou" -> 2700,
    "e" -> 3000, "t" -> 3200, "a" -> 3100, "o" -> 3200, "i" -> 3200,
    "n" -> 3300, "s" -> 3300, "r" -> 3400, "h" -> 3600, "l" -> 3600,
    "d" -> 3700, "c" -> 3800, "u" -> 3800, "m" -> 3900, "f" -> 4000,
    "p" -> 4000, "g" -> 4100, "w" -> 4200, "y" -> 4200, "b" -> 4300,
    "v" -> 4500, "k" -> 4600, "x" -> 5200, "j" -> 5300, "q" -> 5400,
    "z" -> 5400)

  /** Per-character cost of a piece no vocabulary entry covers (digits,
    * underscores, non-Latin): high enough that any in-vocab split wins,
    * finite so every word still segments. */
  val unkCostPerChar: Int = 9000

  /** Piece-cost lookup for a `k`-char substring: a CASE chain over the
    * vocabulary entries of that length, falling through to
    * `k · unkCostPerChar`. */
  private def pieceCost(
      sub: Column, k: Int, vocab: Seq[(String, Int)], unk: Int): Column =
    vocab.filter(_._1.length == k).foldRight(lit((unk * k).toLong): Column) {
      case ((p, c), acc) => when(sub === p, lit(c.toLong)).otherwise(acc)
    }

  /** Viterbi-segment each row of `words` (columns: `word` plus anything
    * else, all passed through). Adds `len` (capped segmented length),
    * `cost` (total min cost), `n_pieces`, and `seg` (pieces joined by
    * `|`). Ties in the DP resolve to the SHORTEST candidate piece —
    * deterministic and mirrored in the oracle. */
  def segment(
      words: DataFrame,
      maxLen: Int = 10,
      maxPiece: Int = 3,
      vocab: Seq[(String, Int)] = piecesV1,
      unkCost: Int = unkCostPerChar): DataFrame = {
    require(maxLen >= 1 && maxLen <= 16, "maxLen must be in [1, 16]")
    require(maxPiece >= 1 && maxPiece <= 4, "maxPiece must be in [1, 4]")
    var d = words
      .withColumn("_w", substring(col("word"), 1, maxLen))
      .withColumn("_len", length(col("_w")))
      .withColumn("_b0", lit(0L))
      .withColumn("_p0", lit(0L))
    // forward pass: best cost / argmin piece length / piece count per
    // prefix length i
    for (i <- 1 to maxLen) {
      val cands = (1 to math.min(maxPiece, i)).map { k =>
        k -> (col(s"_b${i - k}") +
          pieceCost(col("_w").substr(i - k + 1, k), k, vocab, unkCost))
      }
      d = d.withColumn(s"_b$i", cands.map(_._2).reduce(least(_, _)))
      val ks = cands.init.foldRight(lit(cands.last._1): Column) {
        case ((k, cand), acc) => when(col(s"_b$i") === cand, lit(k))
          .otherwise(acc)
      }
      d = d.withColumn(s"_k$i", ks)
      d = d.withColumn(s"_p$i",
        (1 to math.min(maxPiece, i)).foldRight(lit(null).cast("long")) {
          case (k, acc) => when(col(s"_k$i") === k, col(s"_p${i - k}") + 1L)
            .otherwise(acc)
        })
    }
    def byLen(prefix: String, empty: Column): Column =
      (1 to maxLen).foldRight(empty) { (i, acc) =>
        when(col("_len") === i, col(s"$prefix$i")).otherwise(acc)
      }
    d = d.withColumn("cost", byLen("_b", lit(0L)))
      .withColumn("n_pieces", byLen("_p", lit(0L)))
    // backward pass: walk argmins from _len down to 0, prepending each
    // piece (each step consumes ≥ 1 char, so maxLen steps always finish)
    d = d.withColumn("_pos0", col("_len")).withColumn("_seg0", lit(""))
    for (j <- 1 to maxLen) {
      val kAtPos = (1 to maxLen).foldRight(lit(null).cast("int")) { (pp, acc) =>
        when(col(s"_pos${j - 1}") === pp, col(s"_k$pp")).otherwise(acc)
      }
      d = d.withColumn(s"_kj$j", kAtPos)
      val piece = col("_w").substr(
        col(s"_pos${j - 1}") - col(s"_kj$j") + 1, col(s"_kj$j"))
      d = d.withColumn(s"_seg$j",
        when(col(s"_pos${j - 1}") > 0,
          concat(piece,
            when(col(s"_seg${j - 1}") === "", lit(""))
              .otherwise(concat(lit("|"), col(s"_seg${j - 1}")))))
          .otherwise(col(s"_seg${j - 1}")))
      d = d.withColumn(s"_pos$j",
        when(col(s"_pos${j - 1}") > 0,
          col(s"_pos${j - 1}") - col(s"_kj$j")).otherwise(lit(0)))
    }
    val keep = words.columns.map(col)
    d.select(keep ++ Seq(
      col("_len").cast("long").as("len"),
      col("cost"),
      col("n_pieces"),
      col(s"_seg$maxLen").as("seg")): _*)
  }
}
