package graft.pipelines

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.{Dedup, TextAnalysis}

/** End-to-end corpus curation — the LLM-side counterpart of the
  * reference's E1 flagship ([[TimesheetPipeline]]): the standard
  * pretraining funnel (CCNet/RefinedWeb shape) composed from the
  * engine's own operators, with a per-source FUNNEL REPORT as output so
  * every drop is attributed to the stage that made it:
  *
  *   1. language gate      — [[TextAnalysis.langIdText]] == "en"
  *   2. quality gate       — 6dp-rounded [[TextAnalysis.qualityScoreText]]
  *                           ≥ `minQuality`
  *   3. exact dedup        — keep the lowest doc id per order-sensitive
  *                           [[TextAnalysis.contentFingerprint]]
  *   4. near dedup         — MinHash+LSH banded candidates
  *                           ([[Dedup.minhashPairs]]), est-Jaccard ≥
  *                           `minJac` drops the higher id
  *
  * A document is attributed to the FIRST stage that dropped it
  * (`lang` → `quality` → `exact_dup` → `near_dup` → `kept`), so the
  * per-source counts telescope: n_raw = Σ of the four drop columns +
  * n_kept. `tok_kept` is the surviving token mass — the number that
  * decides whether the mix still meets its budget.
  *
  * Scale shape: both gates are codegen'd projections over the scan (no
  * shuffle); exact dedup is ONE window partitioned by content key (the
  * segment-dedup posture — each key's rows meet once); near dedup is
  * the banded LSH candidate chain (never all-pairs); the stage
  * attributions come back as narrow id-keyed joins; the report is one
  * hash-agg by source. Nothing in the funnel materializes on the
  * driver. */
object CurationPipeline {

  /** Per-document stage attribution — the funnel's row-level core:
    * (doc_id, source, text, stage) where stage ∈ lang | quality |
    * exact_dup | near_dup | kept (first drop wins). [[curate]] aggregates
    * it; [[curateBalanced]] continues the kept set into topic balance. */
  def staged(
      docs: DataFrame, // (doc_id, source, text)
      minQuality: Double,
      minJac: Double): DataFrame = {
    // r10 optimization (guide §8, decide with small rows): the original
    // formulation re-derived the regex gate + fingerprint-window subtree
    // THREE times (keeper tokenization, the `_rn` join-back, and the
    // output's own gate columns). Here the expensive per-text work runs
    // ONCE into a narrow per-doc decision frame (doc_id, two gate bits,
    // dup rank ≈ 20 B/row — materialized by an eager localCheckpoint), and
    // every later consumer joins by id. The window now runs over ALL
    // docs (ordered so gated rows rank first): for a gated row,
    // 1 + (gated rows before it in its fingerprint group) — identical to
    // the original row_number over the gated subset; non-gated rows'
    // rank is never consulted (the stage when-chain checks gates first).
    val w = Window
      .partitionBy(TextAnalysis.contentFingerprint(col("text")))
      .orderBy(col("_gated").desc, col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val decisions = docs
      .select(col("doc_id"),
        (TextAnalysis.langIdText(col("text")) === "en").as("_lang_ok"),
        (round(TextAnalysis.qualityScoreText(col("text")), 6) >= minQuality)
          .as("_q_ok"),
        col("text"))
      .withColumn("_gated", col("_lang_ok") && col("_q_ok"))
      .withColumn("_rn",
        sum(when(col("_gated"), 1).otherwise(0)).over(w))
      .select("doc_id", "_lang_ok", "_q_ok", "_gated", "_rn")
      .localCheckpoint()
    val keeperIds = decisions.filter(col("_gated") && col("_rn") === 1)
      .select("doc_id")
    val keepers = docs
      .join(keeperIds, Seq("doc_id"), "left_semi")
      .select(col("doc_id"), TextAnalysis.words(col("text")).as("toks"))
    val nearDups = Dedup
      .minhashPairs(keepers, "doc_id", Dedup.shingles(col("toks"), 3))
      .filter(col("est_jac") >= minJac)
      .select(col("id_b").as("doc_id")).distinct()
      .withColumn("_near", lit(true))
    docs.select(col("doc_id"), col("source"), col("text"))
      .join(decisions, Seq("doc_id"))
      .join(nearDups, Seq("doc_id"), "left")
      .withColumn("stage",
        when(!col("_lang_ok"), "lang")
          .when(!col("_q_ok"), "quality")
          .when(col("_rn") =!= 1, "exact_dup")
          .when(col("_near"), "near_dup")
          .otherwise("kept"))
      .select(col("doc_id"), col("source"), col("text"), col("stage"))
  }

  def curate(
      docs: DataFrame, // (doc_id, source, text)
      minQuality: Double,
      minJac: Double): DataFrame = {
    val st = staged(docs, minQuality, minJac)
    def n(s: String) = sum(when(col("stage") === s, 1L).otherwise(0L))
    st.groupBy("source").agg(
      count(lit(1)).as("n_raw"),
      n("lang").as("n_lang_dropped"),
      n("quality").as("n_quality_dropped"),
      n("exact_dup").as("n_exact_dropped"),
      n("near_dup").as("n_near_dropped"),
      n("kept").as("n_kept"),
      sum(when(col("stage") === "kept",
        TextAnalysis.wordCount(col("text")).cast("long"))
        .otherwise(0L)).as("tok_kept"))
  }

  /** The funnel composed ONE stage further — topic balancing over the
    * survivors (ClusterClip/DoReMi shape): kept docs join their
    * embeddings 1:1 on id, assign to the nearest PINNED centroid cell,
    * and at most `perCell` survive per cell in deterministic hash-rank
    * order ([[graft.ops.Sampling.clusterBalancedSample]]). Output is the
    * balance report per (source, cell): how many funnel survivors landed
    * in the cell and how many the quota admitted — the mixture sheet a
    * curation run ships with its corpus.
    *
    * Scale shape: the funnel's own plan (gates codegen'd, one
    * fingerprint window, banded LSH) + ONE narrow id-equi-join to the
    * embeddings table (vectors never join by content) + the
    * literal-centroid assignment projection + one per-cell rank window +
    * one hash-agg. Still a single Catalyst plan end to end. */
  def curateBalanced(
      docs: DataFrame, // (doc_id, source, text)
      embeddings: DataFrame, // (vec_id, embedding)
      minQuality: Double,
      minJac: Double,
      centroids: Array[Array[Double]],
      perCell: Int): DataFrame = {
    val kept = staged(docs, minQuality, minJac)
      .filter(col("stage") === "kept")
      .select(col("doc_id"), col("source"))
    val vecs = kept
      .join(embeddings.select(col("vec_id").as("doc_id"),
        col("embedding").as("cvec")), Seq("doc_id"))
      .select(col("doc_id").as("cid"), col("cvec"))
    val sampled = graft.ops.Sampling.clusterBalancedSample(vecs, centroids, perCell)
    kept
      .join(sampled.select(col("cid").as("doc_id"), col("cell"), col("kept")),
        Seq("doc_id"))
      .groupBy("source", "cell")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("kept"), 1L).otherwise(0L)).as("n_sampled"))
  }
}
