package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph algorithms expressed as DataFrame joins — the family
  * [[Dedup.connectedComponents]] opened, here the weighted-propagation
  * side (PageRank). Reference analogue: the reference tool has no graph
  * surface; this serves the corpus-curation journeys (rank documents by
  * how central they are in the near-dup/link graph before choosing
  * canonical copies or mixing weights).
  *
  * Scale shape: the edge list is the only big relation. Per iteration:
  * one equi-join of the (id, rank) table onto edges by src (both sides
  * hash-partitioned on the same key, so consecutive iterations reuse the
  * edge partitioning), then one hash-aggregate by dst whose shuffle
  * carries (dst, partial contribution) — map-side combine means the edge
  * stream itself never crosses the wire twice. Ranks are rounded to
  * `roundTo` decimals each iteration: it keeps the float fold
  * deterministic across engines/partitionings (divergence from summation
  * order is ~1e-15 relative, squashed every round) — and bounds nothing
  * else; the iteration count is fixed, not convergence-tested, exactly
  * like production PageRank over web-scale graphs.
  */
object Graph {

  /** PageRank over a directed edge list (`srcCol`, `dstCol`). Every node
    * must appear as a source (feed symmetric edges for undirected
    * graphs — the natural form for similarity graphs); dangling-node mass
    * redistribution is deliberately out of scope. Returns (id, rank).
    *
    * `checkpointEvery`: truncate the logical plan every k iterations with
    * a lazy localCheckpoint — without it the plan nests one join+agg per
    * iteration and analysis cost grows superlinearly past ~10 rounds
    * (same lineage posture as [[Dedup.connectedComponents]]).
    */
  def pageRank(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      iterations: Int = 5,
      damping: Double = 0.85,
      roundTo: Int = 9,
      checkpointEvery: Int = 8): DataFrame = {
    require(iterations >= 1, "iterations must be >= 1")
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
    // static per-source fan-out, computed once and joined every round
    val outdeg = e.groupBy("src")
      .agg(count(lit(1)).cast("double").as("outdeg"))
    // materialize the degree-annotated edges ONCE, pre-partitioned and
    // pre-sorted on src: the localCheckpoint truncates the derivation
    // (otherwise every iteration re-derives the edge list from its source
    // scans), and the preserved hashpartitioning/ordering means each
    // round's join shuffles only the (id, rank) side. AQE is switched off
    // for JUST this materialization: an adaptive plan reports
    // UnknownPartitioning to the checkpoint (even eagerly executed), and
    // losing the metadata would re-exchange the edge list every round
    val sess = edges.sparkSession
    val aqeWas = sess.conf.get("spark.sql.adaptive.enabled", "true")
    val withDeg =
      try {
        sess.conf.set("spark.sql.adaptive.enabled", "false")
        e.join(outdeg, "src")
          .repartition(col("src")).sortWithinPartitions("src")
          .localCheckpoint(true)
      } finally sess.conf.set("spark.sql.adaptive.enabled", aqeWas)
    var ranks = withDeg.select(col("src").as("id")).distinct()
      .withColumn("rank", lit(1.0))
    for (i <- 1 to iterations) {
      ranks = withDeg
        .join(ranks, col("src") === col("id"))
        .groupBy(col("dst"))
        .agg(round(lit(1.0 - damping) +
          lit(damping) * sum(col("rank") / col("outdeg")), roundTo).as("r"))
        .select(col("dst").as("id"), col("r").as("rank"))
      if (i % checkpointEvery == 0 && i < iterations)
        ranks = ranks.localCheckpoint(false)
    }
    ranks
  }

  /** Synchronous label propagation (community detection): every node
    * adopts the label with the highest neighbor count each round, ties
    * broken by the SMALLER label — the deterministic tie-break is what
    * makes a fixed-iteration run engine-reproducible (textbook LPA
    * breaks ties randomly and is therefore untestable). Labels start as
    * the node ids; `iterations` is fixed, as in [[pageRank]].
    *
    * Scale shape: same skeleton as [[pageRank]] — edges materialized once
    * pre-partitioned on src; per round, one (dst, label) hash-aggregate
    * with map-side combine and one per-dst window bounded by the node's
    * distinct neighbor-label count. */
  def labelPropagation(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      iterations: Int = 4): DataFrame = {
    require(iterations >= 1, "iterations must be >= 1")
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
    val sess = edges.sparkSession
    val aqeWas = sess.conf.get("spark.sql.adaptive.enabled", "true")
    val edgeP =
      try {
        sess.conf.set("spark.sql.adaptive.enabled", "false")
        e.repartition(col("src")).sortWithinPartitions("src")
          .localCheckpoint(true)
      } finally sess.conf.set("spark.sql.adaptive.enabled", aqeWas)
    var labels = edgeP.select(col("src").as("id")).distinct()
      .withColumn("label", col("id"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("dst").orderBy(col("n").desc, col("label"))
    for (_ <- 1 to iterations) {
      labels = edgeP
        .join(labels, col("src") === col("id"))
        .groupBy(col("dst"), col("label"))
        .agg(count(lit(1)).as("n"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("dst").as("id"), col("label"))
    }
    labels
  }
}
