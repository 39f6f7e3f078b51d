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

  /** Personalized PageRank: random walks RESTART AT THE SEED SET instead
    * of everywhere — `r = (1−d)·1_S + d·A·r` — so rank mass measures
    * proximity to the seeds, not global centrality. THE seed-expansion
    * primitive: grow a labeled whitelist/blocklist of sources through the
    * link graph, rank candidates for audit by closeness to known-good or
    * known-bad nodes. Seeds arrive as a DataFrame (they are data — a
    * labeled table — not plan-time literals). Nodes the walk never
    * reaches carry rank 0 and are absent from the output.
    *
    * Same scale/determinism contract as [[pageRank]] (once-checkpointed
    * pre-partitioned degree-annotated edges, per-round rounding,
    * `checkpointEvery` lineage truncation); the per-round extra over
    * pageRank is one full-outer join against the seed base table, which
    * shuffles only (id, rank)-sized rows. */
  def personalizedPageRank(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      seeds: DataFrame,
      seedCol: String,
      iterations: Int = 5,
      damping: Double = 0.85,
      roundTo: Int = 9,
      checkpointEvery: Int = 8): DataFrame = {
    require(iterations >= 1, "iterations must be >= 1")
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
    val outdeg = e.groupBy("src")
      .agg(count(lit(1)).cast("double").as("outdeg"))
    val sess = edges.sparkSession
    val aqeWas = sess.conf.get("spark.sql.adaptive.enabled", "true")
    val withDeg =
      try {
        sess.conf.set("spark.sql.adaptive.enabled", "false")
        e.join(outdeg, "src")
          .repartition(col("src")).sortWithinPartitions("src")
          .localCheckpoint(true)
      } finally sess.conf.set("spark.sql.adaptive.enabled", aqeWas)
    val seedBase = seeds.select(col(seedCol).as("id")).distinct()
      .withColumn("base", lit(1.0 - damping))
      .localCheckpoint(false)
    var ranks = seedBase.select(col("id"), lit(1.0).as("rank"))
    for (i <- 1 to iterations) {
      val contrib = withDeg
        .join(ranks, col("src") === col("id"))
        .groupBy(col("dst"))
        .agg(sum(col("rank") / col("outdeg")).as("c"))
        .select(col("dst").as("id"), col("c"))
      ranks = contrib.join(seedBase, Seq("id"), "full")
        .select(col("id"),
          round(coalesce(col("base"), lit(0.0)) +
            lit(damping) * coalesce(col("c"), lit(0.0)), roundTo).as("rank"))
      if (i % checkpointEvery == 0 && i < iterations)
        ranks = ranks.localCheckpoint(false)
    }
    ranks
  }

  /** HITS hubs-and-authorities over a DIRECTED edge list — PageRank's
    * dual-score sibling: a good hub points at good authorities and a
    * good authority is pointed at by good hubs. Each iteration is the
    * textbook mutual update with MAX-normalization (the max is exact —
    * no float summation enters the normalizer — so scores land in [0,1]
    * deterministically), `roundTo`-rounded like [[pageRank]] so the
    * per-node float sums stay engine-identical. Fixed `iterations`, the
    * production posture. Returns (id, hub, authority) — a pure source
    * has authority 0, a pure sink hub 0.
    *
    * Scale shape: TWO once-checkpointed pre-partitioned copies of the
    * edge list (by dst for the hub step, by src for the authority step) —
    * each round's joins then shuffle only the (id, score) tables, and
    * the score aggregates are map-side combined. The normalizing max is
    * a 1-row broadcast re-entry (the TF-IDF corpus-stats pattern), never
    * a driver collect. Every round's raw score table is localCheckpointed
    * BEFORE normalization: the max subquery and the normalized output
    * both re-enter that table, so an un-materialized subtree would be
    * recomputed twice per normalization — 2^(2·iterations) recompute of
    * the whole history (measured 31 s → 2.5 s at sf0.01). Unlike
    * [[pageRank]] (one linear lineage, truncation optional at
    * `checkpointEvery`), per-round truncation here is load-bearing. */
  def hits(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      iterations: Int = 4,
      roundTo: Int = 9): DataFrame = {
    require(iterations >= 1, "iterations must be >= 1")
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst")).distinct()
    val sess = edges.sparkSession
    val aqeWas = sess.conf.get("spark.sql.adaptive.enabled", "true")
    val (eByDst, eBySrc) =
      try {
        sess.conf.set("spark.sql.adaptive.enabled", "false")
        val d = e.repartition(col("dst")).sortWithinPartitions("dst")
          .localCheckpoint(true)
        val s = e.repartition(col("src")).sortWithinPartitions("src")
          .localCheckpoint(true)
        (d, s)
      } finally sess.conf.set("spark.sql.adaptive.enabled", aqeWas)
    var auth = eByDst.select(col("dst").as("id")).distinct()
      .withColumn("a", lit(1.0))
    var hub: DataFrame = null
    def normalized(raw0: DataFrame, idc: String, vc: String): DataFrame = {
      // materialize once: both the max subquery and the normalized join
      // re-enter this table (see scaladoc — skipping this is exponential)
      val raw = raw0.localCheckpoint(false)
      val mx = raw.agg(max(col(vc)).as("_mx"))
      raw.crossJoin(broadcast(mx))
        .select(col(idc).as("id"),
          round(col(vc) / col("_mx"), roundTo).as(vc))
    }
    for (_ <- 1 to iterations) {
      hub = normalized(
        eByDst.join(auth, col("dst") === col("id"))
          .groupBy("src").agg(sum(col("a")).as("h")), "src", "h")
      auth = normalized(
        eBySrc.join(hub, col("src") === col("id"))
          .groupBy("dst").agg(sum(col("h")).as("a")), "dst", "a")
    }
    hub.join(auth, Seq("id"), "full")
      .select(col("id"),
        coalesce(col("h"), lit(0.0)).as("hub"),
        coalesce(col("a"), lit(0.0)).as("authority"))
  }

  /** Adamic–Adar link-prediction scores over a bipartite incidence list
    * (`leftCol`, `rightCol`): for every LEFT pair sharing ≥ `minCommon`
    * right-neighbors, `AA = Σ_z 1/ln(deg z)` over the shared neighbors z
    * (deg = distinct left nodes of z) plus the raw common count — rare
    * shared neighbors weigh more than ubiquitous ones, THE classic
    * collaborative-filtering / who-to-link feature (Adamic & Adar 2003).
    * A shared neighbor implies deg ≥ 2, so ln(deg) is never 0.
    *
    * Scale shape: the pair space comes from the per-neighbor self-join,
    * which explodes as Σ deg² — `maxDegree` caps it (the [[Dedup
    * .jaccardPairs]] df-cap contract): neighbors above the cap are
    * near-universal hubs carrying ~0 AA weight each (1/ln(deg) → small)
    * and are dropped from scores AND counts; the worst reducer is then
    * bounded by cap². */
  def adamicAdar(
      edges: DataFrame,
      leftCol: String,
      rightCol: String,
      maxDegree: Int = 100,
      minCommon: Int = 2): DataFrame = {
    require(maxDegree >= 2, "maxDegree must be >= 2")
    require(minCommon >= 1, "minCommon must be >= 1")
    val e = edges.select(col(leftCol).as("l"), col(rightCol).as("r"))
      .distinct().localCheckpoint()
    val deg = e.groupBy("r").agg(count(lit(1)).as("deg"))
      .filter(col("deg") <= maxDegree)
    val kept = e.join(deg, "r")
    kept.as("x").join(kept.as("y"),
        col("x.r") === col("y.r") && col("x.l") < col("y.l"))
      .groupBy(col("x.l").as("id_a"), col("y.l").as("id_b"))
      .agg(count(lit(1)).as("common"),
        round(sum(lit(1.0) / log(col("x.deg"))), 6).as("aa"))
      .filter(col("common") >= minCommon)
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
    * with map-side combine, then the winning label per dst via a
    * `max_by(label, (n, −label))` hash-aggregate — a sort-free argmax
    * with one (n, label) pair of state per node, replacing a rank window
    * that sorted every node's neighbor-label list. */
  /** Multi-source BFS: unit-weight shortest hop count from any seed,
    * capped at `maxHops` rounds (nodes farther than the cap are absent
    * from the output — the fixed-frontier form production link-graphs
    * use, since diameter-length runs are unbounded). Returns (id, dist).
    *
    * Scale shape: the [[pageRank]] skeleton — edges materialized ONCE
    * pre-partitioned on src, each round joins only the (id, dist) frontier
    * against them and min-merges into the running distance table; the
    * shuffle carries (id, dist) pairs with map-side combine. Distances
    * only ever decrease, so the merge is a plain min hash-aggregate.
    * Unlike pageRank's rebuild-from-join rounds, the merge references the
    * running table TWICE per round (union + join) — without a per-round
    * lazy checkpoint the logical plan doubles every hop (2^rounds source
    * scans), so the distance table is truncated each round. */
  def bfsDistances(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      seeds: DataFrame,
      idCol: String,
      maxHops: Int = 4): DataFrame = {
    require(maxHops >= 1, "maxHops must be >= 1")
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
    val sess = edges.sparkSession
    val aqeWas = sess.conf.get("spark.sql.adaptive.enabled", "true")
    val edgeP =
      try {
        sess.conf.set("spark.sql.adaptive.enabled", "false")
        e.repartition(col("src")).sortWithinPartitions("src")
          .localCheckpoint(true)
      } finally sess.conf.set("spark.sql.adaptive.enabled", aqeWas)
    var dist = seeds.select(col(idCol).as("id")).distinct()
      .withColumn("dist", lit(0L))
    for (i <- 1 to maxHops) {
      val expanded = edgeP.join(dist, col("src") === col("id"))
        .select(col("dst").as("id"), (col("dist") + 1L).as("dist"))
      dist = dist.unionByName(expanded)
        .groupBy("id").agg(min(col("dist")).as("dist"))
      if (i < maxHops) dist = dist.localCheckpoint(false)
    }
    dist
  }

  /** One-row triangle scorecard over an undirected edge list (either
    * direction, self-loops and duplicates tolerated): node/edge/wedge
    * counts, exact triangle count, and the global clustering coefficient
    * 3·triangles / wedges. Triangle enumeration uses DEGREE-ORDERED
    * orientation (Ortmann & Brandes / the classic compact-forward trick):
    * each edge points from its lower-(degree, id) endpoint to the higher,
    * so wedge expansion fans out from the LOW-degree side — a star node
    * of degree d contributes 0 wedges as a center instead of d², which is
    * the difference between surviving a power-law graph at 100 TB and a
    * quadratic blowup on the hottest key. Each triangle is counted
    * exactly once (its rank-minimal wedge), closed by one semi-join back
    * against the oriented edges. */
  def triangleStats(
      edges: DataFrame,
      aCol: String,
      bCol: String): DataFrame = {
    val und = edges
      .select(least(col(aCol), col(bCol)).as("a"),
        greatest(col(aCol), col(bCol)).as("b"))
      .filter(col("a") =!= col("b")).distinct()
    val deg = und.select(col("a").as("n"))
      .unionByName(und.select(col("b").as("n")))
      .groupBy("n").agg(count(lit(1)).as("deg"))
    val withDeg = und
      .join(deg.select(col("n").as("a"), col("deg").as("da")), "a")
      .join(deg.select(col("n").as("b"), col("deg").as("db")), "b")
    val aFirst = col("da") < col("db") ||
      (col("da") === col("db") && col("a") < col("b"))
    val orient = withDeg.select(
      when(aFirst, col("a")).otherwise(col("b")).as("lo"),
      when(aFirst, col("b")).otherwise(col("a")).as("hi"),
      when(aFirst, col("db")).otherwise(col("da")).as("dhi"))
    val e1 = orient.select(col("lo"), col("hi").as("h1"), col("dhi").as("dh1"))
    val e2 = orient.select(col("lo"), col("hi").as("h2"), col("dhi").as("dh2"))
    val wedges = e1.join(e2, Seq("lo")).filter(
      col("dh1") < col("dh2") ||
        (col("dh1") === col("dh2") && col("h1") < col("h2")))
    // the closing edge between h1 and h2 is oriented (h1 → h2): the wedge
    // condition already ordered them by the orientation rank
    val closed = wedges.join(
      orient.select(col("lo").as("h1"), col("hi").as("h2")),
      Seq("h1", "h2"), "left_semi")
    val tri = closed.agg(count(lit(1)).as("n_triangles"))
    val nodeStats = deg.agg(count(lit(1)).as("n_nodes"),
      sum((col("deg") * (col("deg") - 1) / 2).cast("long")).as("n_wedges"))
    val edgeStats = und.agg(count(lit(1)).as("n_edges"))
    nodeStats.crossJoin(edgeStats).crossJoin(tri)
      .select(col("n_nodes"), col("n_edges"), col("n_wedges"),
        col("n_triangles"),
        round((lit(3.0) * col("n_triangles")) / col("n_wedges"), 6)
          .as("global_clustering"))
  }

  /** Per-node local clustering coefficient — [[triangleStats]]' global
    * ratio, resolved to each node: `lcc(v) = 2·T(v) / (deg(v)·(deg(v)−1))`
    * with T(v) = triangles through v. THE tight-community / bot-ring
    * node feature (a spam clique's members sit near 1.0; organic hubs
    * near 0). Returns every node with (deg, n_tri, lcc); deg < 2 nodes
    * have no defined coefficient → null lcc, zero-triangle nodes keep
    * their row with lcc = 0.
    *
    * Scale shape: identical to [[triangleStats]] — degree-oriented wedge
    * join (each wedge generated ONCE, at its lowest-rank vertex, the
    * Suri–Vassilvitskii bound) closed by a semi... here a plain equi-join
    * so each triangle can credit its THREE corners via one 3-way explode,
    * then a node-keyed hash-aggregate. */
  def localClustering(
      edges: DataFrame,
      aCol: String,
      bCol: String): DataFrame = {
    val und = edges
      .select(least(col(aCol), col(bCol)).as("a"),
        greatest(col(aCol), col(bCol)).as("b"))
      .filter(col("a") =!= col("b")).distinct()
      .localCheckpoint()
    val deg = und.select(col("a").as("n"))
      .unionByName(und.select(col("b").as("n")))
      .groupBy("n").agg(count(lit(1)).as("deg"))
    val withDeg = und
      .join(deg.select(col("n").as("a"), col("deg").as("da")), "a")
      .join(deg.select(col("n").as("b"), col("deg").as("db")), "b")
    val aFirst = col("da") < col("db") ||
      (col("da") === col("db") && col("a") < col("b"))
    val orient = withDeg.select(
      when(aFirst, col("a")).otherwise(col("b")).as("lo"),
      when(aFirst, col("b")).otherwise(col("a")).as("hi"),
      when(aFirst, col("db")).otherwise(col("da")).as("dhi"))
      .localCheckpoint()
    val e1 = orient.select(col("lo"), col("hi").as("h1"), col("dhi").as("dh1"))
    val e2 = orient.select(col("lo"), col("hi").as("h2"), col("dhi").as("dh2"))
    val closed = e1.join(e2, Seq("lo")).filter(
        col("dh1") < col("dh2") ||
          (col("dh1") === col("dh2") && col("h1") < col("h2")))
      .join(orient.select(col("lo").as("h1"), col("hi").as("h2")),
        Seq("h1", "h2"), "left_semi")
    val triPerNode = closed
      .select(explode(array(col("lo"), col("h1"), col("h2"))).as("n"))
      .groupBy("n").agg(count(lit(1)).as("n_tri"))
    deg.join(triPerNode, Seq("n"), "left")
      .select(col("n").as("node_id"), col("deg"),
        coalesce(col("n_tri"), lit(0L)).as("n_tri"),
        when(col("deg") >= 2,
          round(lit(2.0) * coalesce(col("n_tri"), lit(0L)) /
            (col("deg") * (col("deg") - 1)), 6)).as("lcc"))
  }

  /** k-core peel: repeatedly delete nodes of degree < `k` (with their
    * edges) for `rounds` fixed iterations, then report the surviving
    * nodes with their in-subgraph degree. After enough rounds this is
    * the k-core (the maximal subgraph of min-degree ≥ k) — the standard
    * dense-community / spam-farm extraction; fixed rounds keep the run
    * engine-reproducible and bounded, like the rest of the iterative
    * family (a converged peel is reached when a round deletes nothing).
    *
    * Scale shape: per round ONE degree hash-aggregate (map-side combined)
    * and two semi-joins of the edge list against the surviving-node set —
    * all keyed on node id; the edge list shrinks monotonically. The edge
    * table is referenced three times per round, so it is lazily
    * checkpointed each round (same lineage-doubling hazard as
    * [[bfsDistances]]). */
  def kCore(
      edges: DataFrame,
      aCol: String,
      bCol: String,
      k: Int,
      rounds: Int = 3): DataFrame = {
    require(k >= 1, "k must be >= 1")
    require(rounds >= 1, "rounds must be >= 1")
    val und = edges
      .select(least(col(aCol), col(bCol)).as("a"),
        greatest(col(aCol), col(bCol)).as("b"))
      .filter(col("a") =!= col("b")).distinct()
    var sym = und.select(col("a").as("src"), col("b").as("dst"))
      .unionByName(und.select(col("b").as("src"), col("a").as("dst")))
    for (_ <- 1 to rounds) {
      val keep = sym.groupBy("src").agg(count(lit(1)).as("deg"))
        .filter(col("deg") >= k).select("src")
      sym = sym
        .join(keep, Seq("src"), "left_semi")
        .join(keep.withColumnRenamed("src", "dst"), Seq("dst"), "left_semi")
        .localCheckpoint(false)
    }
    sym.groupBy(col("src").as("node")).agg(count(lit(1)).as("deg"))
  }

  /** `checkpointEvery`: truncate the logical plan every k rounds with a
    * lazy localCheckpoint (the [[pageRank]] knob) — without it plan depth
    * grows linearly with `iterations` and analysis cost superlinearly
    * past ~10 rounds. `probeEvery` > 0 adds a stability probe every k
    * rounds: synchronous LPA is a deterministic function of the previous
    * labeling, so an unchanged round is a FIXPOINT and every later round
    * is identical — stopping early returns exactly the fixed-iteration
    * result (the [[graft.ops.Dedup.connectedComponents]] convergence
    * posture; LPA labels are not monotone, so the probe compares the
    * labelings directly instead of their sum). Default 0 keeps the
    * fixed-iteration contract bit-for-bit. */
  def labelPropagation(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      iterations: Int = 4,
      checkpointEvery: Int = 8,
      probeEvery: Int = 0): DataFrame = {
    require(iterations >= 1, "iterations must be >= 1")
    require(checkpointEvery >= 1, "checkpointEvery must be >= 1")
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
    var i = 0
    var converged = false
    while (!converged && i < iterations) {
      i += 1
      val prev = labels
      val next = edgeP
        .join(prev, col("src") === col("id"))
        .groupBy(col("dst"), col("label"))
        .agg(count(lit(1)).as("n"))
        // argmax by (count DESC, label ASC): lexicographic struct max on
        // (n, -label) — a sort-free hash-aggregate whose state is one
        // (n, label) pair per node, where the rank-window formulation it
        // replaces sorted every node's neighbor-label list
        .groupBy(col("dst"))
        .agg(max_by(col("label"),
          struct(col("n"), (-col("label")).as("nl"))).as("label"))
        .select(col("dst").as("id"), col("label"))
      val probing = probeEvery > 0 && i % probeEvery == 0 && i < iterations
      // a probe round materializes the labels once (lazy localCheckpoint)
      // so the probe job and the next round share the computation instead
      // of each re-deriving the same lineage
      labels =
        if ((i % checkpointEvery == 0 || probing) && i < iterations)
          next.localCheckpoint(false)
        else next
      if (probing)
        // FULL-outer: a node present in only one of the two labelings is
        // itself a change — an inner join would hide node-set drift (on a
        // non-symmetrized edge list round 1 shrinks the label table) and
        // declare a false fixpoint
        converged = labels
          .join(prev.withColumnRenamed("label", "_prev"), Seq("id"), "full")
          .where(col("label").isNull || col("_prev").isNull ||
            col("label") =!= col("_prev"))
          .isEmpty
    }
    labels
  }
}
