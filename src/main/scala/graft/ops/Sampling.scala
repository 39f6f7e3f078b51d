package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Referentially-coherent sampling — the development-scale-down story
  * for an entity-keyed warehouse: every table that carries the entity
  * key applies the SAME deterministic hash predicate on that key, so a
  * kept customer keeps ALL their orders (and lineitems, and events)
  * across tables with NO join, no shuffle, and no coordination — the
  * predicate is pushed into each table's scan independently, and
  * referential integrity holds by construction.
  *
  * Contrast with `df.sample()`: row-level Bernoulli sampling breaks
  * every foreign key (a sampled order's customer is probably gone), and
  * making it coherent after the fact costs a semi-join per child table.
  * Hash-bucket sampling on the shared key is the 100 TB idiom: filter
  * first at the scan, join never. Determinism also means two pipeline
  * runs — or two TABLES sampled in different jobs months apart — agree
  * on the kept entities.
  */
object Sampling {

  /** The shared predicate: keep the row iff its entity key falls in the
    * first `pct` of 100 deterministic hash buckets. */
  def coherentKeep(key: Column, pct: Int): Column = {
    require(pct >= 0 && pct <= 100, s"pct must be in [0, 100], got $pct")
    Hashing.hash60(key.cast("string")) % 100 < pct
  }

  /** `df` filtered to the coherent `pct`% sample by `keyCol` — apply to
    * every table carrying the same entity key (parent on its primary
    * key, children on the foreign key) for a consistent cross-table
    * subset. One codegen'd filter; no join, no shuffle. */
  def consistentSample(df: DataFrame, keyCol: String, pct: Int): DataFrame =
    df.filter(coherentKeep(col(keyCol), pct))

  /** Cluster-balanced sampling — the topic-balancing op of the curation
    * stack (ClusterClip / DoReMi-shape; [[Dedup.semDedup]]'s sampling
    * dual): assign every vector to its nearest PINNED centroid cell (the
    * q220 shipped-index posture — centroids are plan-time literals, so
    * assignment is one codegen'd projection, no join) and keep at most
    * `perCell` members per cell in deterministic hash-rank order (the
    * [[TextAnalysis.quotaSample]] exact-quota selection). A dominant
    * topic cluster can no longer swamp the mixture; thin clusters
    * survive whole. Emits EVERY input row flagged — (cid, cell, kept) —
    * so the drop set stays auditable (the semDedup output contract).
    *
    * Scale shape: one broadcast-literal centroid projection + one hash
    * shuffle by cell with a per-cell rank window — ONE pass over the
    * corpus. The tempting sort-free alternative ([[TopK.perKey]] heap
    * selects the admitted set, bounded at cells × perCell, then a
    * broadcast join flags it back) was MEASURED 1.2–2.2× slower at
    * sf0.1–sf1 because the assignment projection feeds two consumers
    * and recomputes — flagging every row inherently wants the one-pass
    * rank. Keep the window; reach for the heap+flag-join form only for
    * a whale cell whose in-window sort actually spills. */
  def clusterBalancedSample(
      df: DataFrame, // (cid, cvec)
      centroids: Array[Array[Double]],
      perCell: Int): DataFrame = {
    require(perCell >= 0, s"perCell must be >= 0, got $perCell")
    val asg = df.select(col("cid"),
      element_at(Similarity.probeCells(col("cvec"), centroids, 1), 1)
        .as("cell"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("cell"))
      .orderBy(Hashing.hash60(col("cid").cast("string")), col("cid"))
    asg.withColumn("_rnk", row_number().over(w))
      .select(col("cid"), col("cell"), (col("_rnk") <= perCell).as("kept"))
  }

  /** Apply per-cell mixture rates as PER-DOCUMENT repeat factors — the
    * executor half of [[ipfMixture]] (solver → this → training shards):
    * a rate of 2.4 means every cell member appears twice and a
    * deterministic-hash 40% of members appear a third time (the
    * DoReMi/epoch-weighting allocation; rates above 1 UPSAMPLE by
    * duplication, below 1 downsample). Σ copies per cell converges to
    * rate × members with zero RNG state — same corpus, same copies.
    *
    * `rates` is a ≤cells-row broadcast; the corpus pays one hash
    * projection. Cells absent from `rates` drop (inner join — the
    * solver emits every cell it saw, so absence means "not in the
    * mixture"). */
  def applyMixtureRates(
      df: DataFrame,
      rates: DataFrame, // (keyCols..., rate)
      keyCols: Seq[String],
      idCol: String): DataFrame = {
    require(keyCols.nonEmpty, "need at least one cell key column")
    val u = (Hashing.hash60(concat(col(idCol).cast("string"), lit(":mix")))
      % 1000000000L).cast("double") / 1e9
    df.join(broadcast(rates), keyCols)
      .withColumn("n_copies",
        (floor(col("rate")) +
          when(u < col("rate") - floor(col("rate")), 1).otherwise(0))
          .cast("int"))
  }

  /** Per-key temporal train/test split — the eval-hygiene splitter for
    * time-ordered data ("train on the past, evaluate on the future", per
    * entity): each key's latest ceil(n·testFrac) rows become `test`, the
    * rest `train`. Forecasting/recommendation models evaluated on a
    * RANDOM split leak the future; [[q134]]-style hash splits are for
    * exchangeable corpora, this is the non-exchangeable twin. Ties on
    * the timestamp break by `idCol` descending (latest id wins a test
    * slot), so the split is total-order deterministic.
    *
    * One window shuffle on the keys; emits every row flagged (the
    * auditable-drop contract). */
  def temporalSplit(
      df: DataFrame,
      keyCols: Seq[String],
      tsCol: String,
      idCol: String,
      testFrac: Double): DataFrame = {
    require(testFrac >= 0.0 && testFrac <= 1.0, "testFrac must be in [0,1]")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCols.map(col): _*)
      .orderBy(col(tsCol).desc, col(idCol).desc)
    val wc = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCols.map(col): _*)
    df.withColumn("_rnk", row_number().over(w))
      .withColumn("_n", count(lit(1)).over(wc))
      .withColumn("split",
        when(col("_rnk") <= ceil(col("_n") * testFrac), lit("test"))
          .otherwise(lit("train")))
      .drop("_rnk", "_n")
  }

  /** Iterative proportional fitting (raking; Deming & Stephan 1940) —
    * the two-marginal corpus-mixture solver: given per-(row, col) mass
    * (e.g. tokens per source × language), find cell weights that match
    * BOTH uniform marginals simultaneously — the closed-loop version of
    * the one-dimensional quota/temperature mixers (q65/q104), and the
    * standard "rebalance sources without starving a language" tool.
    *
    * `iters` alternating scaling rounds, each half-step 9dp-rounded so
    * any engine replaying the same cell table walks the same trajectory
    * (the Bradley–Terry recurrence pattern):
    *
    *   w ← round9(w · (R / rowsum)),  then  w ← round9(w · (C / colsum))
    *
    * with R = total/nRows, C = total/nCols (uniform targets), and
    * all-zero rows/columns left untouched (their cells stay 0).
    *
    * Scale posture: ONE distributed hash-agg builds the cell table; the
    * loop runs driver-side on the ≤`maxCells` dense grid (the
    * bradleyTerry/pqTrain bounded-model posture — mixture grids are
    * sources × languages, never data-sized). Returns the full dense
    * grid, one row per (row, col) incl. empty cells: `(rowCol, colCol,
    * mass, weight, rate)` — `rate = weight/mass` (0 on empty cells) is
    * the per-cell resampling factor downstream samplers apply. */
  def ipfMixture(
      df: DataFrame,
      rowCol: String,
      colCol: String,
      mass: Column,
      iters: Int = 20,
      maxCells: Int = 4096): DataFrame = {
    require(iters >= 1, "iters must be >= 1")
    val spark = df.sparkSession
    val rd9 = (x: Double) => math.rint(x * 1e9) / 1e9
    val rd6 = (x: Double) => math.rint(x * 1e6) / 1e6
    // coalesce: a cell whose every mass is null (e.g. all-null text)
    // aggregates to null — treat it as an observed empty cell, not an
    // NPE at collect time
    val cells = df
      .groupBy(col(rowCol).cast("string").as("_r"),
        col(colCol).cast("string").as("_c"))
      .agg(coalesce(sum(mass.cast("double")), lit(0.0)).as("_n"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2)))
    val rows = cells.map(_._1).distinct.sorted
    val cols = cells.map(_._2).distinct.sorted
    val (m, k) = (rows.length, cols.length)
    require(m.toLong * k <= maxCells,
      s"ipfMixture: $m x $k grid exceeds maxCells=$maxCells")
    val ri = rows.zipWithIndex.toMap
    val ci = cols.zipWithIndex.toMap
    val n = Array.ofDim[Double](m, k)
    cells.foreach { case (r, c, v) => n(ri(r))(ci(c)) = v }
    var total = 0.0
    for (s <- 0 until m; j <- 0 until k) total += n(s)(j)
    val (rt, ct) = (total / m, total / k)
    val w = Array.tabulate(m, k)((s, j) => n(s)(j))
    (1 to iters).foreach { _ =>
      var s = 0
      while (s < m) {
        var rs = 0.0
        var j = 0
        while (j < k) { rs += w(s)(j); j += 1 }
        if (rs != 0.0) {
          val f = rt / rs
          j = 0
          while (j < k) { w(s)(j) = rd9(w(s)(j) * f); j += 1 }
        }
        s += 1
      }
      var j = 0
      while (j < k) {
        var cs = 0.0
        var s2 = 0
        while (s2 < m) { cs += w(s2)(j); s2 += 1 }
        if (cs != 0.0) {
          val f = ct / cs
          s2 = 0
          while (s2 < m) { w(s2)(j) = rd9(w(s2)(j) * f); s2 += 1 }
        }
        j += 1
      }
    }
    import spark.implicits._
    (for (s <- 0 until m; j <- 0 until k) yield (
      rows(s), cols(j), rd6(n(s)(j)), rd6(w(s)(j)),
      if (n(s)(j) == 0.0) 0.0 else rd6(w(s)(j) / n(s)(j))
    )).toDF(rowCol, colCol, "mass", "weight", "rate")
  }

  // ── deterministic epoch shuffle (keyed Feistel permutation) ─────────

  /** Feistel round keys for (`seed`, `epoch`, round i): small affine
    * mixes masked to `bits`, so every product downstream stays far from
    * 2^63 (no wrap in the JVM, no BIGINT overflow in the SQL oracle). */
  def feistelRoundKeys(seed: Long, epoch: Int, bits: Int): Seq[Long] = {
    val mask = (1L << bits) - 1
    (1 to 4).map(i =>
      (seed * 31 + epoch.toLong * 69069 + i.toLong * 1013904223L) & mask)
  }

  /** Pseudorandom shuffle position of `key` for one training epoch —
    * the multi-epoch data-ordering primitive a 100 TB training pipeline
    * needs: a KEYED BIJECTION on [0, 4^bits) (4-round balanced Feistel
    * network, Luby–Rackoff), so `sort by shufflePos(key, seed, epoch)`
    * is a deterministic, seeded, per-epoch-distinct global shuffle of
    * the corpus. Contrast with `orderBy(rand(seed))`: rand() is
    * partition-layout-dependent (re-partitioning the corpus silently
    * reorders an epoch), positions are not resumable (a restarted job
    * re-draws), and epochs need fresh non-reproducible draws. Here the
    * position is a PURE FUNCTION of (key, seed, epoch): map-only to
    * assign (no shuffle, no state — the only data movement is the final
    * range-partition sort the consumer was going to pay anyway),
    * restart-stable mid-epoch (resume = filter pos > last_done), and
    * any shard of the order can be regenerated independently — exactly
    * the Feistel/format-preserving-encryption idiom the data-loading
    * literature uses for epoch shuffles at scale.
    *
    * Keys need NOT be dense: any distinct non-negative keys < 4^bits
    * get distinct positions (injectivity is inherited from the domain
    * bijection), and the induced order restricted to the live keys is
    * the shuffle. Out-of-domain keys fail loud (ANSI raise_error).
    *
    * All arithmetic is exact integer (products ≤ 2^(bits+32), so
    * `bits` ≤ 20 keeps every intermediate under 2^52): the DuckDB
    * oracle replays the rounds bit-for-bit with `//`, `%` and `xor()`.
    * The whole position is one codegen'd scalar chain — ~20 integer ops
    * per row, no branch fan-out (the q329 when-chain lesson does not
    * apply: rounds COMPOSE instead of branching). */
  def shufflePos(key: Column, seed: Long, epoch: Int, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 20, s"bits must be in [1, 20], got $bits")
    import org.apache.spark.sql.graftbridge.Bridge
    // one codegen'd static call per row ([[graft.expressions
    // .FeistelPos]]); the Column-cascade form it replaced re-inlined
    // the guarded key ~30x per epoch column (expression trees share
    // nothing), a method-size-limit liability at wider epoch counts
    Bridge.column(graft.expressions.FeistelPos(
      Bridge.expression(key.cast("long")),
      feistelRoundKeys(seed, epoch, bits), bits))
  }

  /** `df` with one `pos_e<i>` column per requested epoch — the released
    * shape of the epoch shuffle: every row carries its deterministic
    * position in each epoch's order. Map-only; consumers sort by the
    * epoch's column (or filter `pos > watermark` to resume). */
  def epochShuffle(
      df: DataFrame,
      keyCol: String,
      seed: Long,
      epochs: Seq[Int],
      bits: Int = 16): DataFrame =
    epochs.foldLeft(df)((d, e) =>
      d.withColumn(s"pos_e$e", shufflePos(col(keyCol), seed, e, bits)))
}
