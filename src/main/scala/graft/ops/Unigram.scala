package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge

/** Unigram-LM (SentencePiece-style, Kudo 2018) Viterbi segmentation with
  * the PINNED [[graft.expressions.UnigramViterbi.vocab]] piece table —
  * the serving half of the second major subword family beside BPE
  * (q228/q229): each word is split into its minimum-total-cost piece
  * sequence under integer per-piece costs (≈ −1000·ln p).
  *
  * The DP runs in [[graft.expressions.UnigramViterbi]], a codegen'd
  * Catalyst expression (one generated static call per row). The first
  * formulation — the DP fully unrolled into `least`/`CASE` column
  * chains — was semantically identical but exceeded the JVM 64 KB
  * generated-method limit, which silently disabled whole-stage codegen
  * for the projection (3.2 s interpreted at sf0.01 vs sub-second now):
  * the custom-Expression rung of the extension ladder exists precisely
  * for this case.
  *
  * Scale shape: run on the DISTINCT word table (bounded by the
  * vocabulary, not the corpus — the standard tokenizer-serving layout:
  * segment the vocab once, join back by word); all work is per-row
  * column compute inside whole-stage codegen, no shuffle beyond the
  * caller's word aggregation.
  */
object Unigram {

  /** The pinned piece vocabulary (see the expression companion). */
  val piecesV1: Seq[(String, Int)] = graft.expressions.UnigramViterbi.vocab

  /** Cost per char of any substring the vocabulary doesn't cover. */
  val unkCostPerChar: Int = graft.expressions.UnigramViterbi.unkCostPerChar

  /** Viterbi-segment each row of `words` (columns: `word` plus anything
    * else, all passed through). Adds `len` (capped segmented length),
    * `cost` (total min cost), `n_pieces`, and `seg` (pieces joined by
    * `|`). Ties in the DP resolve to the SHORTEST candidate piece —
    * deterministic and mirrored in the generated oracle CTE chain. */
  def segment(
      words: DataFrame,
      maxLen: Int = 10,
      maxPiece: Int = 3): DataFrame = {
    val r = Bridge.column(graft.expressions.UnigramViterbi(
      Bridge.expression(col("word")), maxLen, maxPiece))
    val keep = words.columns.map(col)
    words.withColumn("_r", r)
      .select(keep ++ Seq(
        least(length(col("word")), lit(maxLen)).cast("long").as("len"),
        col("_r.cost").as("cost"),
        col("_r.n_pieces").as("n_pieces"),
        col("_r.seg").as("seg")): _*)
  }

  /** Per-group tokenizer fertility under the pinned unigram vocab: the
    * occurrence-weighted pieces-per-word ratio (THE tokenizer-efficiency
    * number per language/source — q235's BPE fertility, re-measured for
    * the unigram family) plus the cost-per-char average. Segments each
    * DISTINCT (group, word) once, then integer occurrence-weighted sums
    * with two double divisions at the end — the corpus pays one
    * tokenize + one (group, word) hash-aggregate, the DP only the
    * vocabulary. */
  def fertility(
      df: DataFrame,
      groupCol: String,
      textCol: String,
      maxLen: Int = 10,
      maxPiece: Int = 3): DataFrame = {
    val w = df.select(col(groupCol),
        explode(TextAnalysis.words(col(textCol))).as("word"))
      .groupBy(col(groupCol), col("word"))
      .agg(count(lit(1)).as("n_occ"))
    segment(w, maxLen, maxPiece)
      .groupBy(col(groupCol))
      .agg(sum("n_occ").as("total_words"),
        sum(col("n_occ") * col("n_pieces")).as("total_pieces"),
        sum(col("n_occ") * col("len")).as("total_chars"),
        sum(col("n_occ") * col("cost")).as("_total_cost"))
      .withColumn("fertility",
        round(col("total_pieces") / col("total_words"), 6))
      .withColumn("cost_per_char",
        round(col("_total_cost") / col("total_chars"), 6))
      .drop("_total_cost")
  }
}
