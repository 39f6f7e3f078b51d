package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Similarity search over an embedding column (`array<float>`).
  *
  * Baseline: brute-force cosine top-k (exact). Scale path: IVF-style
  * coarse-quantized search — probe only the query's cell(s), which turns
  * the n×m cross join into per-cell joins. All math is array expressions
  * (`zip_with` + `aggregate` folding in element order, in double), so the
  * DuckDB oracle reproduces scores bit-for-bit.
  */
object Similarity {

  /** Sequential-fold dot product in double precision — a native codegen'd
    * expression ([[graft.expressions.VecDot]]); bit-identical to the
    * higher-order formulation [[dotHof]] but stays in whole-stage codegen
    * instead of interpreting two lambdas per element. */
  def dot(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    Bridge.column(graft.expressions.VecDot(
      Bridge.expression(a), Bridge.expression(b)))
  }

  /** Reference higher-order-function dot product (used to cross-check
    * [[dot]] in tests; not on the hot path). */
  def dotHof(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def l2norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (l2norm(a) * l2norm(b))

  /** 6dp cosine from a precomputed dot and the two norms, with the ANSI
    * zero-denominator guard (a zero vector scores 0 against everything
    * instead of raising DIVIDE_BY_ZERO) — degenerate inputs never occur
    * in the registered corpora, so the oracles' unguarded division stays
    * bit-identical there. */
  private def cosSafe(dotQC: Column, na: Column, nb: Column): Column =
    when(na * nb > 0, round(dotQC / (na * nb), 6)).otherwise(0.0)

  /** Exact brute-force cosine top-k: every query scores every corpus row,
    * rank by (cosine desc, id asc). The query side is broadcast (queries
    * ≪ corpus), so the corpus never shuffles — one scan + per-partition
    * top-k via the rank window on the query key. */
  def topKBrute(
      queries: DataFrame, // (qid, qvec)
      corpus: DataFrame, // (cid, cvec)
      k: Int): DataFrame = {
    // norms once per row on each side — every (q,c) pair then costs a
    // single dot product instead of three
    val q = queries.withColumn("qn", l2norm(col("qvec")))
    val c = corpus.withColumn("cn", l2norm(col("cvec")))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("qid") =!= col("cid"))
      .select(col("qid"), col("cid"),
        cosSafe(dot(col("qvec"), col("cvec")), col("qn"), col("cn")).as("cos"))
    val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("cid").asc)
    scored.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= k)
      .select("qid", "rnk", "cid", "cos")
  }

  /** IVF-style approximate top-k: both sides carry a coarse cell id (here
    * a precomputed cluster/label; in a full IVF, argmin over centroids) and
    * only same-cell candidates are scored. Equi-join on the cell →
    * shuffle-by-cell, never n×m. */
  def topKIvf(
      queries: DataFrame, // (qid, qvec, cell)
      corpus: DataFrame, // (cid, cvec, cell)
      k: Int): DataFrame = {
    val q = queries.withColumn("qn", l2norm(col("qvec")))
    val c = corpus.withColumn("cn", l2norm(col("cvec")))
    val scored = c.join(broadcast(q), Seq("cell"))
      .filter(col("qid") =!= col("cid"))
      .select(col("qid"), col("cid"),
        cosSafe(dot(col("qvec"), col("cvec")), col("qn"), col("cn")).as("cos"))
    val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("cid").asc)
    scored.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= k)
      .select("qid", "rnk", "cid", "cos")
  }

  /** Real IVF training: a k-means coarse quantizer fit with the
    * deterministic local [[lloyd]] (farthest-point init + fixed
    * iterations, no RNG) over the bounded [[pqTrain]]-posture sample
    * (every `step`-th id, sorted — partitioning-independent). Replaces
    * the earlier ml-lib KMeans path, whose assignment depended on input
    * partitioning and could not be reproduced by the SQL oracle; this
    * trainer is bit-deterministic anywhere, so a trained index can be
    * PINNED as literals ([[graft.fixtures.PinnedIndex]]) and served by
    * the fully-oracled [[topKIvfCentroids]]. Components are 6dp-rounded:
    * an index wants compact reproducible literals, and quantizer quality
    * is insensitive at 1e-6. */
  def trainIvfLloyd(
      corpus: DataFrame, // (cid, cvec)
      nCells: Int,
      sampleCap: Int = 4096,
      iters: Int = 10): Array[Array[Double]] = {
    val n = corpus.count()
    // ceil division: floor(n/cap) keeps up to ~2*cap-1 rows (n = 2*cap-1
    // gives step 1 = collect everything), breaking the bounded
    // driver-memory contract; ceil keeps the sample <= sampleCap always
    val step = math.max(1L, (n + sampleCap - 1) / sampleCap)
    val sample = corpus
      .filter(pmod(col("cid"), lit(step)) === 0)
      .select(col("cid"), col("cvec").cast("array<double>"))
      .collect()
      .sortBy(_.getLong(0)) // collect order is partition-dependent; sort isn't
      .map(_.getSeq[Double](1).toArray)
    require(sample.nonEmpty, "empty training sample")
    lloyd(sample, nCells, iters)
      .map(_.map(x => math.rint(x * 1e6) / 1e6))
  }

  /** IVF serving against an EXPLICIT centroid array (a trained or pinned
    * index): corpus rows are assigned their nearest centroid cell, each
    * query probes its `nProbe` nearest cells, same-cell candidates score
    * exactly. Centroids are plan-time literals, so assignment and probing
    * stay inside codegen and the corpus is only ever equi-joined by
    * cell — never n×m. */
  def topKIvfCentroids(
      queries: DataFrame, // (qid, qvec)
      corpus: DataFrame, // (cid, cvec)
      centroids: Array[Array[Double]],
      k: Int,
      nProbe: Int = 4): DataFrame = {
    val indexed = corpus.withColumn("cell",
      element_at(probeCells(col("cvec"), centroids, 1), 1))
    val q = queries
      .withColumn("cell", explode(probeCells(col("qvec"), centroids, nProbe)))
    topKIvf(q, indexed, k)
  }

  /** Cells of the `nProbe` nearest centroids for a query vector, as an
    * array column. Ranks by −2·q·cᵢ + ‖cᵢ‖² (monotone in Euclidean
    * distance); centroids are plan-time literals. */
  def probeCells(qvec: Column, centroids: Array[Array[Double]], nProbe: Int): Column = {
    val scored = centroids.zipWithIndex.map { case (c, i) =>
      val cNorm2 = c.map(x => x * x).sum
      struct(
        (dot(qvec, array(c.map(lit): _*)) * -2.0 + cNorm2).as("score"),
        lit(i.toLong).as("cell"))
    }
    transform(
      slice(array_sort(array(scored: _*)), 1, nProbe),
      s => s.getField("cell"))
  }

  /** IVF top-k with a deterministic *sampled* codebook: centroids = the
    * first `nCells` corpus vectors by id. The only driver materialization
    * is that bounded `nCells`-row collect (the [[pqTrain]] posture);
    * serving is [[topKIvfCentroids]] — centroids are plan-time literals,
    * the corpus joins only by cell. The sample rule is trivially
    * reproducible in SQL (`ORDER BY id LIMIT nCells`), which makes this
    * the in-situ oracle-checkable path; Lloyd training
    * ([[trainIvfLloyd]] → pinned literals) is the recall-quality path. */
  def topKIvfSampled(
      queries: DataFrame, // (qid, qvec)
      corpus: DataFrame, // (cid, cvec)
      k: Int,
      nCells: Int = 16,
      nProbe: Int = 4): DataFrame = {
    val centroids = corpus.orderBy(col("cid")).limit(nCells)
      .select(col("cvec").cast("array<double>"))
      .collect().map(_.getSeq[Double](0).toArray)
    topKIvfCentroids(queries, corpus, centroids, k, nProbe)
  }

  // ── Product quantization (IVF-PQ's compression half) ────────────────

  /** Deterministic local Lloyd's over a (sorted) point sample:
    * farthest-point init (maximin — deterministic, no RNG, good spread),
    * then plain Lloyd iterations; empty clusters keep their previous
    * centroid. Pure driver compute over a bounded sample — no Spark
    * jobs. */
  private def lloyd(points: Array[Array[Double]], ksub: Int, iters: Int = 10): Array[Array[Double]] = {
    val k = math.min(ksub, points.length)
    val d = points.head.length
    def d2(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < d) { val x = a(i) - b(i); s += x * x; i += 1 }
      s
    }
    // maximin init: start at the sorted sample's first point, then
    // repeatedly add the point farthest from its nearest chosen centroid
    val minD = points.map(p => d2(p, points(0)))
    val chosen = Array.fill(k)(0)
    var c = 1
    while (c < k) {
      var best = 0; var bestD = -1.0
      var i = 0
      while (i < points.length) {
        if (minD(i) > bestD) { bestD = minD(i); best = i }
        i += 1
      }
      chosen(c) = best
      i = 0
      while (i < points.length) {
        val nd = d2(points(i), points(best))
        if (nd < minD(i)) minD(i) = nd
        i += 1
      }
      c += 1
    }
    var cents = chosen.map(i => points(i).clone())
    for (_ <- 0 until iters) {
      val sums = Array.fill(k)(new Array[Double](d))
      val counts = new Array[Long](k)
      points.foreach { p =>
        var best = 0; var bestD = Double.MaxValue
        var j = 0
        while (j < k) {
          var dist = 0.0; var i = 0
          while (i < d) { val x = p(i) - cents(j)(i); dist += x * x; i += 1 }
          if (dist < bestD) { bestD = dist; best = j }
          j += 1
        }
        counts(best) += 1
        var i = 0
        while (i < d) { sums(best)(i) += p(i); i += 1 }
      }
      cents = Array.tabulate(k)(j =>
        if (counts(j) == 0) cents(j)
        else sums(j).map(_ / counts(j)))
    }
    cents
  }

  /** Train per-subspace PQ codebooks on a BOUNDED deterministic sample:
    * the dim-D vectors split into `m` contiguous subvectors of D/m dims;
    * each subspace gets its own tiny codebook of ≤ `ksub` centroids.
    * Codebook training on a capped sample is the standard ANN-index
    * approach (the driver holds ≤ sampleCap·D doubles regardless of
    * corpus size — ml-lib fits here cost m full Spark jobs for the same
    * quality); all ENCODING and SCORING stays distributed expressions.
    * Returns codebooks(s)(j) = centroid j of subspace s. Requires `cvec`
    * as array<double> (normalize first for cosine). */
  def pqTrain(
      corpus: DataFrame, // (cid, cvec)
      m: Int,
      ksub: Int,
      sampleCap: Int = 4096): Array[Array[Array[Double]]] = {
    val n = corpus.count()
    // ceil division: floor(n/cap) keeps up to ~2*cap-1 rows (n = 2*cap-1
    // gives step 1 = collect everything), breaking the bounded
    // driver-memory contract; ceil keeps the sample <= sampleCap always
    val step = math.max(1L, (n + sampleCap - 1) / sampleCap)
    val sample = corpus
      .filter(pmod(col("cid"), lit(step)) === 0)
      .select(col("cid"), col("cvec"))
      .collect()
      .sortBy(_.getLong(0)) // collect order is partition-dependent; sort isn't
      .map(_.getSeq[Double](1).toArray)
    require(sample.nonEmpty, "empty training sample")
    val dim = sample.head.length
    require(dim % m == 0, s"m=$m must divide dim=$dim")
    val dsub = dim / m
    (0 until m).map { s =>
      lloyd(sample.map(v => java.util.Arrays.copyOfRange(v, s * dsub, (s + 1) * dsub)), ksub)
    }.toArray
  }

  /** Nearest-codebook-entry assignment for subspace `s` — ranks by
    * −2·v·cⱼ + ‖cⱼ‖² (monotone in Euclidean distance); centroids are
    * plan-time literals so encoding is pure codegen'd expressions. */
  private def pqAssign(vec: Column, s: Int, dsub: Int,
      codebook: Array[Array[Double]]): Column = {
    val scored = codebook.zipWithIndex.map { case (c, j) =>
      struct(
        (dot(slice(vec, s * dsub + 1, dsub), array(c.map(lit): _*)) * -2.0 +
          c.map(x => x * x).sum).as("score"),
        lit(j).as("code"))
    }
    element_at(array_sort(array(scored: _*)), 1).getField("code")
  }

  /** PQ top-k with asymmetric distance computation (ADC) + exact re-rank
    * against an EXPLICIT codebook (a [[pqTrain]]-trained or
    * [[graft.fixtures.PinnedIndex]]-pinned index — the index-artifact
    * separation real ANN systems version and ship):
    *
    *  1. corpus vectors are L2-normalized and encoded once as `m` small
    *     integer codes (the 100 TB move: 4·D bytes/vector → m codes, and
    *     scan scoring never touches a float vector);
    *  2. each query precomputes its m×ksub table of subspace dot products
    *     (expressions over codebook literals, broadcast with the query);
    *  3. every candidate's approximate cosine is m table lookups
    *     (`element_at` with a dynamic index — codegen'd, no HOF), and the
    *     top `candMult·k` per query survive;
    *  4. survivors re-rank by EXACT cosine against the real vectors, so
    *     PQ error only affects candidate selection, never final scores —
    *     output schema/semantics match [[topKBrute]].
    */
  def topKPqWithBooks(
      queries: DataFrame, // (qid, qvec)
      corpus: DataFrame, // (cid, cvec)
      books: Array[Array[Array[Double]]],
      k: Int,
      candMult: Int = 4): DataFrame = {
    val normC = normalized(corpus, "cvec")
      .localCheckpoint() // feeds encoding and the re-rank join
    topKPqServe(queries, normC, books, k, candMult)
  }

  /** PQ top-k with *hash-seeded* codebooks: entry (s, j) component d is
    * hash60("pq:s:j:d") mapped into [-1, 1) — the [[planeComponents]]
    * pattern. Zero training cost and engine-reproducible (the SQL oracle
    * embeds the identical literals); corpus vectors are L2-normalized so
    * the unit cube is the right scale. Candidate recall sits below trained
    * codebooks ([[pqTrain]]) — the exact re-rank makes that a
    * candidate-quality knob, never a score error. */
  def topKPqSeeded(
      queries: DataFrame, // (qid, qvec)
      corpus: DataFrame, // (cid, cvec)
      k: Int,
      dim: Int,
      m: Int = 8,
      ksub: Int = 16,
      candMult: Int = 4): DataFrame =
    topKPqWithBooks(queries, corpus, pqSeededBooks(m, ksub, dim), k, candMult)

  /** Deterministic hash-seeded PQ codebooks: entry (s, j) starts as
    * hash-uniform components in [-1, 1) ([[planeComponents]] pattern),
    * then is rescaled to norm 1/√m — the expected subvector norm of an
    * L2-normalized vector with energy spread across subspaces. Without
    * the rescale the entries sit ~4× farther from the origin than the
    * data and assignment barely discriminates. */
  def pqSeededBooks(m: Int, ksub: Int, dim: Int): Array[Array[Array[Double]]] = {
    require(dim % m == 0, s"m=$m must divide dim=$dim")
    val dsub = dim / m
    Array.tabulate(m, ksub) { (s, j) =>
      val raw = Array.tabulate(dsub)(d =>
        (Hashing.longHash60(s"pq:$s:$j:$d") % 2000001L) / 1000000.0 - 1.0)
      val scale = math.sqrt(raw.map(x => x * x).sum) * math.sqrt(m.toDouble)
      raw.map(_ / scale)
    }
  }

  /** L2-normalize a (cid, `vecCol`) corpus frame (norm computed once per
    * row) — the pre-step before [[pqTrain]] when the codebooks will serve
    * cosine search (training and serving must see the same scaling). */
  def l2normalized(df: DataFrame, vecCol: String): DataFrame =
    normalized(df, vecCol)

  private def normalized(df: DataFrame, vecCol: String): DataFrame =
    df.withColumn("_n", l2norm(col(vecCol)))
      .select(col("cid"), transform(col(vecCol), x => x / col("_n")).as(vecCol))

  /** The PQ serving path shared by [[topKPq]] and [[topKPqSeeded]]:
    * encode, ADC-score, cut to candMult·k, exact re-rank. `normC` must be
    * L2-normalized. */
  private def topKPqServe(
      queries: DataFrame,
      normC: DataFrame,
      books: Array[Array[Array[Double]]],
      k: Int,
      candMult: Int): DataFrame = {
    val m = books.length
    val dim = m * books.head.head.length
    val dsub = dim / m
    val encoded = normC.select(col("cid"),
      array((0 until m).map(s => pqAssign(col("cvec"), s, dsub, books(s))): _*)
        .as("codes"))
    // per-query ADC tables, one array column per subspace
    val qNorm = queries
      .withColumn("_n", l2norm(col("qvec")))
      .select(col("qid"), transform(col("qvec"), x => x / col("_n")).as("qvec"))
    val withTables = (0 until m).foldLeft(qNorm) { (df, s) =>
      df.withColumn(s"_t$s", array(books(s).map(c =>
        dot(slice(col("qvec"), s * dsub + 1, dsub), array(c.map(lit): _*))): _*))
    }
    val adc = (0 until m).map(s =>
      element_at(col(s"_t$s"), element_at(col("codes"), s + 1) + 1))
      .reduce(_ + _)
    val wAdc = Window.partitionBy("qid").orderBy(col("adc").desc, col("cid").asc)
    val candidates = encoded.crossJoin(broadcast(withTables.drop("qvec")))
      .filter(col("qid") =!= col("cid"))
      .select(col("qid"), col("cid"), adc.as("adc"))
      .withColumn("_r", row_number().over(wAdc))
      .filter(col("_r") <= candMult * k)
      .select("qid", "cid")
    // exact re-rank of the survivors (vectors already normalized: dot = cosine)
    val wCos = Window.partitionBy("qid").orderBy(col("cos").desc, col("cid").asc)
    candidates
      .join(normC, "cid")
      .join(qNorm, "qid")
      .select(col("qid"), col("cid"),
        round(dot(col("qvec"), col("cvec")), 6).as("cos"))
      .withColumn("rnk", row_number().over(wCos))
      .filter(col("rnk") <= k)
      .select("qid", "rnk", "cid", "cos")
  }

  /** Deterministic hyperplane j for [[lshBucket]]: component d is
    * hash60("plane:j:d") mapped into [-1, 1). Reproducible anywhere
    * (the DuckDB oracle embeds the same values as literals). */
  def planeComponents(j: Int, dim: Int): Seq[Double] =
    (0 until dim).map(d =>
      (Hashing.longHash60(s"plane:$j:$d") % 2000001L) / 1000000.0 - 1.0)

  /** Random-hyperplane (SimHash-for-vectors) LSH bucketing: `nBits` sign
    * bits of dot products with deterministic pseudo-random hyperplanes —
    * fully reproducible, no RNG state. Candidate sets = equal-bucket
    * groups (multi-probe = hamming-ball expansion over buckets, not
    * implemented). */
  def lshBucket(vec: Column, dim: Int, nBits: Int = 8): Column = {
    val bits = (0 until nBits).map { j =>
      val plane = array(planeComponents(j, dim).map(lit): _*)
      when(dot(vec, plane) > 0, lit(1L << j)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /** LSH-bucketed approximate top-k: both sides bucket by [[lshBucket]]
    * and only same-bucket pairs are scored — the self-tuning variant of
    * [[topKIvf]] when no precomputed cell/cluster id exists. Recall
    * depends on `nBits` (fewer bits → bigger buckets → higher recall,
    * more work). */
  def topKLsh(
      queries: DataFrame, // (qid, qvec)
      corpus: DataFrame, // (cid, cvec)
      k: Int,
      dim: Int,
      nBits: Int = 4): DataFrame = {
    val q = queries.withColumn("cell", lshBucket(col("qvec"), dim, nBits))
    val c = corpus.withColumn("cell", lshBucket(col("cvec"), dim, nBits))
    topKIvf(q, c, k)
  }

  /** Multi-probe LSH top-k: each query also probes every bucket at
    * Hamming distance 1 from its own (nBits+1 probes total). Probe cells
    * are distinct, so no candidate dedup is needed; the corpus side still
    * carries one cell per row — only the (small, broadcast) query side
    * fans out. Standard recall/cost knob for hyperplane LSH. */
  def topKLshMultiProbe(
      queries: DataFrame, // (qid, qvec)
      corpus: DataFrame, // (cid, cvec)
      k: Int,
      dim: Int,
      nBits: Int = 4): DataFrame = {
    val c = corpus.withColumn("cell", lshBucket(col("cvec"), dim, nBits))
    val q0 = queries.withColumn("cell0", lshBucket(col("qvec"), dim, nBits))
    val probes = col("cell0") +:
      (0 until nBits).map(j => col("cell0").bitwiseXOR(lit(1L << j)))
    val q = q0
      .withColumn("cell", explode(array(probes: _*)))
      .drop("cell0")
    topKIvf(q, c, k)
  }

  /** Hard-negative mining — the second-epoch complement to
    * [[graft.ops.TextAnalysis.contrastiveTriplets]]' easy negatives: for
    * each (anchor, positive) pair, the corpus vector MOST similar to the
    * anchor that is neither the anchor nor its positive. High-cosine
    * non-duplicates are exactly the negatives that sharpen a contrastive
    * embedding model (the easy random draws quickly contribute ~zero
    * gradient). Candidates come cell-bounded (same coarse cell as the
    * anchor — the [[topKIvf]] posture), so misses are possible for
    * anchors whose nearest non-dup lives in another cell: the standard
    * ANN trade; pairs with no candidate drop. Returns (anchor, positive,
    * negative, neg_cos) — cosine 6dp, ties to the lower candidate id.
    *
    * Scale shape: pairs equi-join embeddings by id (twice — anchor
    * vector + positive exclusion are carried on the pair row), then ONE
    * equi-join by cell against the corpus and a per-pair max_by fold —
    * no window sort, no n×m scoring; shuffle keys are (id) and (cell). */
  def hardNegatives(
      pairs: DataFrame, // (anchor, positive)
      corpus: DataFrame, // (cid, cvec, cell)
      minCos: Double = -1.0): DataFrame = {
    val c = corpus.select(col("cid"), col("cvec"), col("cell"),
      l2norm(col("cvec")).as("cn"))
    val a = pairs
      .join(c.select(col("cid").as("anchor"), col("cvec").as("avec"),
        col("cell"), col("cn").as("an")), Seq("anchor"))
    a.join(c, Seq("cell"))
      .filter(col("cid") =!= col("anchor") && col("cid") =!= col("positive"))
      .select(col("anchor"), col("positive"), col("cid"),
        round(dot(col("avec"), col("cvec")) / (col("an") * col("cn")), 6)
          .as("cos"))
      .filter(col("cos") >= minCos)
      .groupBy(col("anchor"), col("positive"))
      // lexicographic struct max on (cos, -cid): highest cosine, ties to
      // the LOWER candidate id — one hash-agg, no rank window
      .agg(max(struct(col("cos"), (-col("cid")).as("nid"))).as("_m"))
      .select(col("anchor"), col("positive"),
        (-col("_m.nid")).as("negative"), col("_m.cos").as("neg_cos"))
  }

  /** IVF tuning curve — mean recall@k against brute-force ground truth
    * at each probe width in `probes`: the report read before committing
    * an nProbe setting, exactly as [[graft.ops.Dedup.thresholdSweep]] is
    * read before committing a dedup threshold. Returns
    * (n_probe, n_queries, mean_recall); recall of a query the index
    * returns nothing for counts as 0 (spine left join), so the curve
    * never silently drops hard queries.
    *
    * Scale shape: ground truth is ONE brute pass (the bounded query-set
    * × corpus broadcast join of [[topKBrute]] — the expensive arm, paid
    * once and shared by every level via a lazy localCheckpoint); each
    * probe level is the [[topKIvfCentroids]] cell-equi-join; levels
    * union into one plan, one final hash-agg per level. */
  def probeRecallCurve(
      queries: DataFrame, // (qid, qvec)
      corpus: DataFrame, // (cid, cvec)
      centroids: Array[Array[Double]],
      k: Int,
      probes: Seq[Int]): DataFrame = {
    require(probes.nonEmpty && probes.forall(p => p >= 1 && p <= centroids.length),
      s"probes must be in [1, ${centroids.length}]")
    val gt = topKBrute(queries, corpus, k)
      .groupBy("qid").agg(collect_set(col("cid")).as("_gt"))
      .localCheckpoint(false) // one brute pass, shared by every level
    val levels = probes.map { np =>
      topKIvfCentroids(queries, corpus, centroids, k, np)
        .groupBy("qid").agg(collect_set(col("cid")).as("_got"))
        .withColumn("n_probe", lit(np))
    }.reduce(_ unionByName _)
    val spine = probes.map(np => gt.withColumn("n_probe", lit(np)))
      .reduce(_ unionByName _)
    val hits = size(array_intersect(col("_gt"),
      coalesce(col("_got"), array().cast("array<long>"))))
    spine.join(levels, Seq("n_probe", "qid"), "left")
      .groupBy("n_probe")
      .agg(count(lit(1)).as("n_queries"),
        round(avg(hits.cast("double") / lit(k.toDouble)), 6).as("mean_recall"))
  }

  /** Per-dimension embedding drift — [[graft.ops.Models.psiDrift]]'s PSI
    * applied to every embedding coordinate at once: the monitoring
    * number an ANN serving stack watches between index rebuilds (a new
    * encoder checkpoint or a shifted corpus moves coordinate
    * distributions long before recall visibly degrades). Bins are 10
    * fixed-width intervals of the REFERENCE's per-dimension [min, max]
    * (out-of-range current values clamp into the edge bins), shares are
    * +0.5-smoothed, psi = Σ (p−q)·ln(p/q) with the standard 0.2 alarm.
    * Returns one row per dimension: (pos, psi, drifted).
    *
    * Scale shape: one posexplode Generate per side (the shuffle carries
    * (pos, bin) partial counts only — never vectors), per-dim bounds are
    * a ≤dim-row broadcast, and the PSI algebra runs on the dim×bins
    * count grid. */
  /** Pack dims [32j, 32j+32) of a sign-quantized vector into one
    * non-negative BIGINT word (32 dims per word keeps bit 31 < the sign
    * bit — no signed-overflow trap, the aHash lesson). Codegen'd 32-term
    * sum, no UDF, no HOF. */
  private def signWord(vec: Column, j: Int, dim: Int): Column =
    (32 * j until math.min(32 * j + 32, dim)).map { i =>
      when(get(vec, lit(i)).cast("double") > 0, lit(1L << (i - 32 * j)))
        .otherwise(lit(0L))
    }.reduce(_ + _)

  /** 1-bit sign quantization — the 32×-compression ANN memory tier
    * below [[quantizeInt8]]/PQ: each vector becomes ceil(dim/32) packed
    * words (`w0..wN`). Pure projection, map-only at any scale. */
  def binaryQuantize(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      dim: Int): DataFrame = {
    require(dim >= 1 && dim <= 1024, "dim must be in [1, 1024]")
    val nWords = (dim + 31) / 32
    df.select(col(idCol) +:
      (0 until nWords).map(j => signWord(col(vecCol), j, dim).as(s"w$j")): _*)
  }

  /** Brute Hamming top-k over [[binaryQuantize]]d codes — the rerank
    * tier-0 scan: distance = Σⱼ bit_count(qwⱼ XOR cwⱼ), all codegen'd
    * integer ops (no floats touched until the rerank stage a caller
    * appends). Queries broadcast; the corpus scan streams the packed
    * words only — at 100 TB this reads 8 bytes/vector/word instead of
    * 4·dim, which is the point of the tier. Ties break to the lower
    * candidate id. */
  def topKHamming(
      queries: DataFrame, // (qid, qvec)
      corpus: DataFrame, // (cid, cvec)
      dim: Int,
      k: Int): DataFrame = {
    val nWords = (dim + 31) / 32
    val q = binaryQuantize(queries.withColumnRenamed("qvec", "_qv"),
      "qid", "_qv", dim)
      .select(col("qid") +:
        (0 until nWords).map(j => col(s"w$j").as(s"qw$j")): _*)
    val c = binaryQuantize(corpus.withColumnRenamed("cvec", "_cv"),
      "cid", "_cv", dim)
    val hd = (0 until nWords)
      .map(j => bit_count(col(s"qw$j").bitwiseXOR(col(s"w$j"))))
      .reduce(_ + _)
    val scored = c.crossJoin(broadcast(q))
      .filter(col("qid") =!= col("cid"))
      .select(col("qid"), col("cid"), hd.cast("int").as("hamming"))
    val w = Window.partitionBy("qid")
      .orderBy(col("hamming").asc, col("cid").asc)
    scored.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= k)
      .select("qid", "rnk", "cid", "hamming")
  }

  /** CELL-BLOCKED binary ANN serving — the production composition of
    * the pinned coarse quantizer (q220's assignment chain) with the
    * 1-bit Hamming tier: corpus words are assigned their nearest
    * centroid cell ONCE (plan-time literals, codegen'd), each query
    * probes its `nProbe` nearest cells, Hamming + popcount runs only
    * within probed cells, and the exact-cosine rerank touches floats
    * for `candK · |queries|` rows. This retires the one serving-path
    * scale gap of [[topKHamming]]/[[topKBinaryRerank]]: those scan
    * queries × corpus (8 bytes/vector/word, but still the FULL corpus
    * per query — measured 7-8.6× wall for 10× rows), while this scans
    * each corpus word exactly once and pays Σ|probed cell| candidate
    * rows — the same Σ|cell|² argument as [[topKIvfCentroids]], on
    * 8-byte words instead of float vectors. Recall vs the brute
    * Hamming tier is bounded by the coarse quantizer (probe more cells
    * to buy it back); the brute arm stays as the eval ground truth.
    *
    * Scale shape: corpus side is one map (assign + pack) + an equi-join
    * BY CELL against the broadcast query probes; no cross join anywhere.
    * Vectors are fetched only for the candidate set (broadcast
    * semi-probe back against the corpus), so the rerank reads
    * `candK · |queries|` vectors, not the corpus. */
  def topKHammingCells(
      queries: DataFrame, // (qid, qvec)
      corpus: DataFrame, // (cid, cvec)
      centroids: Array[Array[Double]],
      dim: Int,
      candK: Int,
      k: Int,
      nProbe: Int = 4): DataFrame = {
    require(k <= candK, s"k=$k must be <= candK=$candK")
    val nWords = (dim + 31) / 32
    // corpus: nearest-cell assignment + 1-bit pack in ONE projection —
    // (cid, cell, w0..wN) is all that ever travels; vectors stay behind
    val cq = corpus.select(col("cid") +:
      element_at(probeCells(col("cvec"), centroids, 1), 1).as("cell") +:
      (0 until nWords).map(j => signWord(col("cvec"), j, dim).as(s"w$j")): _*)
    val q = queries.select(col("qid") +: col("qvec") +:
        (0 until nWords).map(j => signWord(col("qvec"), j, dim).as(s"qw$j")): _*)
      .withColumn("cell", explode(probeCells(col("qvec"), centroids, nProbe)))
      .drop("qvec")
    val hd = (0 until nWords)
      .map(j => bit_count(col(s"qw$j").bitwiseXOR(col(s"w$j"))))
      .reduce(_ + _)
    // equi-join BY CELL (broadcast probes): a corpus word meets only
    // the queries probing its cell; a (qid, cid) pair appears at most
    // once (one cell per corpus row, distinct probe cells per query)
    val scored = cq.join(broadcast(q), Seq("cell"))
      .filter(col("qid") =!= col("cid"))
      .select(col("qid"), col("cid"), hd.cast("int").as("hamming"))
    val wH = Window.partitionBy("qid")
      .orderBy(col("hamming").asc, col("cid").asc)
    val cand = scored.withColumn("rnk", row_number().over(wH))
      .filter(col("rnk") <= candK).select("qid", "cid")
    val withVec = corpus.join(broadcast(cand), Seq("cid"))
    val qn = queries.withColumn("_qn", l2norm(col("qvec")))
    val rer = withVec.join(broadcast(qn), Seq("qid"))
      .select(col("qid"), col("cid"),
        round(dot(col("qvec"), col("cvec")) /
          (col("_qn") * l2norm(col("cvec"))), 6).as("cos"))
    val wC = Window.partitionBy("qid").orderBy(col("cos").desc, col("cid").asc)
    rer.withColumn("rnk", row_number().over(wC)).filter(col("rnk") <= k)
      .select("qid", "rnk", "cid", "cos")
  }

  /** [[topKHammingCells]] with ASYMMETRIC candidate scoring (the ADC
    * idea applied to the 1-bit tier): the QUERY stays un-quantized and
    * each same-cell candidate scores `Σᵢ qᵢ·sign(cᵢ)` against the
    * packed sign words — strictly more informative than symmetric
    * XOR-popcount, because the query's per-dimension MAGNITUDES weight
    * the agreement (a sign flip on a near-zero query dim costs ~0, not
    * 1 bit). Same plan shape: corpus mapped once (assign + pack),
    * cell equi-join against broadcast probes, bounded heap, exact
    * rerank on candK·|queries| vectors — the asymmetric score is one
    * codegen'd 64-term conditional sum per candidate row, no extra
    * shuffle, no float reads from the corpus side.
    *
    * The score is computed in exact integer MICRO-units
    * (`round(qᵢ·10⁶)::long`, summed ±): order-independent and
    * bit-replayable by the SQL oracle — no float-accumulation-order
    * contract needed at the candidate-selection boundary (the q324
    * integer-milli-reward argument). The per-candidate kernel is the
    * codegen'd [[graft.expressions.AsymSignDot]] (one static call with
    * a shift/mask loop — a 64-term `when` chain measured 2.3× wall for
    * 10× rows; the kernel restores the popcount tier's ~1.5×).
    * Measured on the near-uniform synthetic embeddings this lifts
    * recall@5 ~0.04 absolute over symmetric Hamming at equal nProbe,
    * hitting the cell-coverage ceiling at nProbe 4 (see README curve /
    * graft.tools.RecallCurve). */
  def topKAsymCells(
      queries: DataFrame, // (qid, qvec)
      corpus: DataFrame, // (cid, cvec)
      centroids: Array[Array[Double]],
      dim: Int,
      candK: Int,
      k: Int,
      nProbe: Int = 4): DataFrame = {
    require(k <= candK, s"k=$k must be <= candK=$candK")
    import org.apache.spark.sql.graftbridge.Bridge
    val nWords = (dim + 31) / 32
    val cq = corpus.select(col("cid"),
      element_at(probeCells(col("cvec"), centroids, 1), 1).as("cell"),
      array((0 until nWords)
        .map(j => signWord(col("cvec"), j, dim)): _*).as("wds"))
    // query probes CARRY the quantized query dims (broadcast side only)
    val q = queries.select(col("qid"), col("qvec"),
        array((0 until dim).map(i => round(get(col("qvec"), lit(i))
          .cast("double") * 1e6).cast("long")): _*).as("qia"))
      .withColumn("cell", explode(probeCells(col("qvec"), centroids, nProbe)))
      .drop("qvec")
    val score = Bridge.column(graft.expressions.AsymSignDot(
      Bridge.expression(col("wds")), Bridge.expression(col("qia"))))
    val scored = cq.join(broadcast(q), Seq("cell"))
      .filter(col("qid") =!= col("cid"))
      .select(col("qid"), col("cid"), score.as("asym"))
    val wA = Window.partitionBy("qid")
      .orderBy(col("asym").desc, col("cid").asc)
    val cand = scored.withColumn("rnk", row_number().over(wA))
      .filter(col("rnk") <= candK).select("qid", "cid")
    val withVec = corpus.join(broadcast(cand), Seq("cid"))
    val qn = queries.withColumn("_qn", l2norm(col("qvec")))
    val rer = withVec.join(broadcast(qn), Seq("qid"))
      .select(col("qid"), col("cid"),
        round(dot(col("qvec"), col("cvec")) /
          (col("_qn") * l2norm(col("cvec"))), 6).as("cos"))
    val wC = Window.partitionBy("qid").orderBy(col("cos").desc, col("cid").asc)
    rer.withColumn("rnk", row_number().over(wC)).filter(col("rnk") <= k)
      .select("qid", "rnk", "cid", "cos")
  }

  /** Cell-blocked serving on RESIDUAL codes with a per-vector scale —
    * the IVF-PQ / BQ-with-norm re-centering applied to the 1-bit tier,
    * for CLUSTERED corpora where raw sign codes collapse (measured on
    * the round-10 planted-cluster fixture: raw-sign recall@5 = 0.287
    * at spread 0.25 for cell-blocked AND full-scan Hamming — the CODE,
    * not the candidate generation, is the limit, against an
    * exact-cosine cell ceiling of 1.000). Corpus rows store
    * `(words, β)` = residual sign words + mean residual magnitude
    * ([[graft.expressions.ResidualSignPack]]/[[graft.expressions.
    * ResidualScale]] — the micro-centroid table is one plan reference
    * object, not a per-dim literal lookup); each query probe carries
    * its micro dims and the exact integer `A = Σ Qᵢ·Cᵢ` for the probed
    * cell ([[graft.expressions.CentroidDot]]), and candidates rank by
    *
    *   score = A + β·asym_sign_dot(words, Q)  ≈  10¹²·(q·v)
    *
    * — the ADC decomposition `q·v = q·c + q·r` with `r̂ = β·sign(r)`.
    * The q·c term is what makes scores COMPARABLE ACROSS PROBED CELLS:
    * a first formulation ranking bare residual dots measured recall@5
    * ≈ 0 (far-cell probes have large |q−c| and flood the heap,
    * recall FELL as nProbe grew). All-integer scoring from one
    * float→micro rounding boundary; bit-replayable by the SQL oracle.
    *
    * Same plan shape and cost as [[topKAsymCells]]: map-side pack
    * (+ one long per row for β), cell equi-join against broadcast
    * probes, bounded heap, exact rerank on candK·|queries| vectors. */
  def topKResidualCells(
      queries: DataFrame, // (qid, qvec)
      corpus: DataFrame, // (cid, cvec)
      centroids: Array[Array[Double]],
      dim: Int,
      candK: Int,
      k: Int,
      nProbe: Int = 4): DataFrame = {
    require(k <= candK, s"k=$k must be <= candK=$candK")
    import org.apache.spark.sql.graftbridge.Bridge
    val cents = centroids.map(_.toSeq).toSeq
    def kernel(mk: (org.apache.spark.sql.catalyst.expressions.Expression,
        org.apache.spark.sql.catalyst.expressions.Expression) =>
        org.apache.spark.sql.catalyst.expressions.Expression)(
        v: Column, cell: Column): Column =
      Bridge.column(mk(Bridge.expression(v), Bridge.expression(cell)))
    val packE = kernel((v, c) =>
      graft.expressions.ResidualSignPack(v, c, cents, dim)) _
    val scaleE = kernel((v, c) =>
      graft.expressions.ResidualScale(v, c, cents, dim)) _
    val cdotE = kernel((v, c) =>
      graft.expressions.CentroidDot(v, c, cents, dim)) _
    val cq = corpus
      .select(col("cid"), col("cvec"),
        element_at(probeCells(col("cvec"), centroids, 1), 1).as("cell"))
      .select(col("cid"), col("cell"),
        packE(col("cvec"), col("cell")).as("wds"),
        scaleE(col("cvec"), col("cell")).as("beta"))
    val q = queries.select(col("qid"), col("qvec"),
        array((0 until dim).map(i => round(get(col("qvec"), lit(i))
          .cast("double") * 1e6).cast("long")): _*).as("qia"),
        explode(probeCells(col("qvec"), centroids, nProbe)).as("cell"))
      .select(col("qid"), col("cell"), col("qia"),
        cdotE(col("qvec"), col("cell")).as("qc"))
    val rdot = Bridge.column(graft.expressions.AsymSignDot(
      Bridge.expression(col("wds")), Bridge.expression(col("qia"))))
    val scored = cq.join(broadcast(q), Seq("cell"))
      .filter(col("qid") =!= col("cid"))
      .select(col("qid"), col("cid"),
        (col("qc") + col("beta") * rdot).as("score"))
    val wA = Window.partitionBy("qid")
      .orderBy(col("score").desc, col("cid").asc)
    val cand = scored.withColumn("rnk", row_number().over(wA))
      .filter(col("rnk") <= candK).select("qid", "cid")
    val withVec = corpus.join(broadcast(cand), Seq("cid"))
    val qn = queries.withColumn("_qn", l2norm(col("qvec")))
    val rer = withVec.join(broadcast(qn), Seq("qid"))
      .select(col("qid"), col("cid"),
        round(dot(col("qvec"), col("cvec")) /
          (col("_qn") * l2norm(col("cvec"))), 6).as("cos"))
    val wC = Window.partitionBy("qid").orderBy(col("cos").desc, col("cid").asc)
    rer.withColumn("rnk", row_number().over(wC)).filter(col("rnk") <= k)
      .select("qid", "rnk", "cid", "cos")
  }

  /** [[topKResidualCells]]' QUALITY tier: int8 residual codes
    * ([[graft.expressions.Int8ResidualPack]] — `codeᵢ =
    * round(Rᵢ·127/s)`, 8 signed bytes per long, s = max|Rᵢ| stored per
    * row) scored by the exact integer `127·A + s·Σ Qᵢ·codeᵢ ≈
    * 127·10¹²·(q·v)`. 1 byte/dim (4× under float32, 8× over the 1-bit
    * tier) buys residual MAGNITUDES, which is what within-cluster
    * ranking needs once signs saturate — measured on the
    * planted-cluster fixture the 1-bit+scale tier plateaus at ~0.39
    * recall@5 (spread 0.25) while this tier reaches the candK-bounded
    * ceiling. Same plan shape as every cell serving path: map-side
    * pack, cell equi-join against broadcast probes, bounded heap,
    * exact rerank on candK·|queries| vectors. */
  def topKInt8ResidualCells(
      queries: DataFrame, // (qid, qvec)
      corpus: DataFrame, // (cid, cvec)
      centroids: Array[Array[Double]],
      dim: Int,
      candK: Int,
      k: Int,
      nProbe: Int = 4): DataFrame = {
    require(k <= candK, s"k=$k must be <= candK=$candK")
    import org.apache.spark.sql.graftbridge.Bridge
    val cents = centroids.map(_.toSeq).toSeq
    def kernel(mk: (org.apache.spark.sql.catalyst.expressions.Expression,
        org.apache.spark.sql.catalyst.expressions.Expression) =>
        org.apache.spark.sql.catalyst.expressions.Expression)(
        v: Column, cell: Column): Column =
      Bridge.column(mk(Bridge.expression(v), Bridge.expression(cell)))
    val packE = kernel((v, c) =>
      graft.expressions.Int8ResidualPack(v, c, cents, dim)) _
    val scaleE = kernel((v, c) =>
      graft.expressions.Int8ResidualScale(v, c, cents, dim)) _
    val cdotE = kernel((v, c) =>
      graft.expressions.CentroidDot(v, c, cents, dim)) _
    val cq = corpus
      .select(col("cid"), col("cvec"),
        element_at(probeCells(col("cvec"), centroids, 1), 1).as("cell"))
      .select(col("cid"), col("cell"),
        packE(col("cvec"), col("cell")).as("codes"),
        scaleE(col("cvec"), col("cell")).as("s8"))
    val q = queries.select(col("qid"), col("qvec"),
        array((0 until dim).map(i => round(get(col("qvec"), lit(i))
          .cast("double") * 1e6).cast("long")): _*).as("qia"),
        explode(probeCells(col("qvec"), centroids, nProbe)).as("cell"))
      .select(col("qid"), col("cell"), col("qia"),
        cdotE(col("qvec"), col("cell")).as("qc"))
    val rdot = Bridge.column(graft.expressions.Int8ResidualDot(
      Bridge.expression(col("codes")), Bridge.expression(col("qia"))))
    val scored = cq.join(broadcast(q), Seq("cell"))
      .filter(col("qid") =!= col("cid"))
      .select(col("qid"), col("cid"),
        (col("qc") * 127L + col("s8") * rdot).as("score"))
    val wA = Window.partitionBy("qid")
      .orderBy(col("score").desc, col("cid").asc)
    val cand = scored.withColumn("rnk", row_number().over(wA))
      .filter(col("rnk") <= candK).select("qid", "cid")
    val withVec = corpus.join(broadcast(cand), Seq("cid"))
    val qn = queries.withColumn("_qn", l2norm(col("qvec")))
    val rer = withVec.join(broadcast(qn), Seq("qid"))
      .select(col("qid"), col("cid"),
        round(dot(col("qvec"), col("cvec")) /
          (col("_qn") * l2norm(col("cvec"))), 6).as("cos"))
    val wC = Window.partitionBy("qid").orderBy(col("cos").desc, col("cid").asc)
    rer.withColumn("rnk", row_number().over(wC)).filter(col("rnk") <= k)
      .select("qid", "rnk", "cid", "cos")
  }

  /** Two-tier ANN serving: [[topKHamming]] produces `candK` cheap 1-bit
    * candidates per query, then ONLY those rows pay the exact-cosine
    * rerank — the production binary-index shape (scan 8 bytes/vector/
    * word for everything, touch floats for candK·|queries| rows). The
    * candidate set (bounded, tiny) broadcasts back against the corpus
    * as a semi-probe, so vectors are fetched for candidates only; the
    * rerank window runs over candK rows per query. */
  def topKBinaryRerank(
      queries: DataFrame, // (qid, qvec)
      corpus: DataFrame, // (cid, cvec)
      dim: Int,
      candK: Int,
      k: Int): DataFrame = {
    require(k <= candK, s"k=$k must be <= candK=$candK")
    val cand = topKHamming(queries, corpus, dim, candK).select("qid", "cid")
    val withVec = corpus.join(broadcast(cand), Seq("cid"))
    val q = queries.withColumn("_qn", l2norm(col("qvec")))
    val scored = withVec.join(broadcast(q), Seq("qid"))
      .select(col("qid"), col("cid"),
        round(dot(col("qvec"), col("cvec")) /
          (col("_qn") * l2norm(col("cvec"))), 6).as("cos"))
    val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("cid").asc)
    scored.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= k)
      .select("qid", "rnk", "cid", "cos")
  }

  /** Matryoshka truncation-recall curve (Kusupati et al. 2022): for each
    * prefix width, the exact top-k computed on TRUNCATED vectors scored
    * against the full-dimension top-k — the measurement that picks the
    * serving width for an MRL-trained encoder (how many dims can the
    * index drop before recall pays). One brute arm per width plus the
    * full-dim ground truth; an EVAL harness by design (scans per arm),
    * run on samples, not the full corpus. */
  def matryoshkaRecall(
      queries: DataFrame, // (qid, qvec)
      corpus: DataFrame, // (cid, cvec)
      k: Int,
      dims: Seq[Int]): DataFrame = {
    require(dims.nonEmpty && dims.forall(_ >= 1), "dims must be >= 1")
    val gt = topKBrute(queries, corpus, k)
      .groupBy("qid").agg(collect_set(col("cid")).as("_gt"))
    val arms = dims.map { d =>
      topKBrute(
          queries.select(col("qid"), slice(col("qvec"), 1, d).as("qvec")),
          corpus.select(col("cid"), slice(col("cvec"), 1, d).as("cvec")), k)
        .groupBy("qid").agg(collect_set(col("cid")).as("_got"))
        .withColumn("dim", lit(d))
    }.reduce(_ unionByName _)
    val hits = size(array_intersect(col("_gt"),
      coalesce(col("_got"), array().cast("array<long>"))))
    // recall denominator = |ground-truth set|, not k: identical whenever
    // the corpus holds ≥ k candidates (every registered domain — the
    // oracle's /k is unchanged there), and correct when it doesn't (a
    // 1-vector corpus has recall 1, not 1/k — caught by a shrunken
    // ScalaCheck case that shortened the corpus below the generator's
    // intended minimum)
    gt.join(arms, Seq("qid"), "left")
      .select(col("dim"), col("qid"), hits.cast("long").as("n_hit"),
        round(hits / greatest(size(col("_gt")), lit(1)).cast("double"), 6)
          .as("recall"))
  }

  /** Top-principal-component projection — the embedding-decorrelation op
    * (whitening-lite): score every vector by its coordinate along the
    * direction of maximum variance, plus how much of the total variance
    * that direction explains (the "is this embedding space collapsing to
    * one axis?" monitor next to [[embeddingDrift]]).
    *
    * Two distributed moment passes (mean, raw second moments — posexplode
    * Generates whose shuffles carry (dim, partial) / (dim², partial) only,
    * never vectors), then the covariance eigenproblem runs DRIVER-SIDE on
    * the ≤dim² matrix (the pqTrain bounded-model posture; dim is an
    * embedding width, not a data size): `iters` deterministic power-
    * iteration rounds from the uniform unit vector, every component
    * 9dp-rounded per step so any engine replaying the same rounded
    * moments walks the same trajectory (the Holt/pageRank pattern — no
    * sign ambiguity because there is no randomness). The final projection
    * is a broadcast-literal [[dot]] (codegen'd VecDot), map-only over the
    * corpus.
    *
    * Returns one row per vector: `(idCol, pc1, var_explained)` with
    * `pc1 = v·x − v·μ` (6dp) and the constant
    * `var_explained = λ₁/trace(C)` (6dp). */
  def pcaProject(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      dim: Int,
      iters: Int = 30): DataFrame = {
    require(dim >= 2 && dim <= 4096, "dim must be in [2, 4096]")
    require(iters >= 1, "iters must be >= 1")
    val rd9 = (x: Double) => math.rint(x * 1e9) / 1e9
    val e = df.select(col(vecCol).cast("array<double>").as("_v"))
    val mu = new Array[Double](dim)
    e.select(posexplode(col("_v")).as(Seq("_i", "_x")))
      .groupBy("_i").agg(avg("_x").as("m"))
      .collect().foreach(r => mu(r.getInt(0)) = rd9(r.getDouble(1)))
    val raw = Array.ofDim[Double](dim, dim)
    e.select(col("_v"), posexplode(col("_v")).as(Seq("_i", "_x")))
      .select(col("_i"), col("_x"), posexplode(col("_v")).as(Seq("_j", "_y")))
      .groupBy("_i", "_j").agg(avg(col("_x") * col("_y")).as("m"))
      .collect()
      .foreach(r => raw(r.getInt(0))(r.getInt(1)) = rd9(r.getDouble(2)))
    val c = Array.tabulate(dim, dim)((i, j) => rd9(raw(i)(j) - mu(i) * mu(j)))
    var v = Array.fill(dim)(rd9(1.0 / math.sqrt(dim.toDouble)))
    def cTimes(x: Array[Double]): Array[Double] = Array.tabulate(dim) { i =>
      var s = 0.0
      var j = 0
      while (j < dim) { s += c(i)(j) * x(j); j += 1 }
      s
    }
    (1 to iters).foreach { _ =>
      val w = cTimes(v)
      val n = math.sqrt(w.map(x => x * x).sum)
      v = w.map(x => rd9(x / n))
    }
    val lambda = {
      val cv = cTimes(v)
      var s = 0.0
      var i = 0
      while (i < dim) { s += v(i) * cv(i); i += 1 }
      s
    }
    val trace = {
      var s = 0.0
      var i = 0
      while (i < dim) { s += c(i)(i); i += 1 }
      s
    }
    val muDotV = {
      var s = 0.0
      var k = 0
      while (k < dim) { s += mu(k) * v(k); k += 1 }
      s
    }
    val vLit = array(v.map(lit): _*)
    df.select(col(idCol),
      round(dot(col(vecCol), vLit) - muDotV, 6).as("pc1"),
      lit(math.rint(lambda / trace * 1e6) / 1e6).as("var_explained"))
  }

  def embeddingDrift(
      ref: DataFrame, // (id, vecCol)
      cur: DataFrame,
      vecCol: String,
      nBins: Int = 10): DataFrame = {
    require(nBins >= 2, "nBins must be >= 2")
    def longForm(df: DataFrame): DataFrame =
      df.select(posexplode(transform(col(vecCol), _.cast("double"))))
        .select(col("pos"), col("col").as("v"))
    val r = longForm(ref)
    val c = longForm(cur)
    val bounds = r.groupBy("pos").agg(min("v").as("_lo"), max("v").as("_hi"))
      .localCheckpoint(false) // feeds both binned sides + the spine
    val width = (col("_hi") - col("_lo")) / lit(nBins)
    val bin = when(col("_hi") === col("_lo"), lit(0)).otherwise(
      least(lit(nBins - 1), greatest(lit(0),
        floor((col("v") - col("_lo")) / width).cast("int"))))
    def binned(df: DataFrame, out: String): DataFrame =
      df.join(broadcast(bounds), Seq("pos"))
        .groupBy(col("pos"), bin.as("bin")).agg(count(lit(1)).as(out))
    val spine = bounds.select(col("pos"))
      .crossJoin(ref.sparkSession.range(nBins)
        .select(col("id").cast("int").as("bin")))
    val counts = spine
      .join(binned(r, "n_ref"), Seq("pos", "bin"), "left")
      .join(binned(c, "n_cur"), Seq("pos", "bin"), "left")
      .na.fill(0L, Seq("n_ref", "n_cur"))
    val wPos = Window.partitionBy("pos")
    def share(cn: String): Column = (col(cn) + lit(0.5)) /
      (sum(col(cn)).over(wPos) + lit(0.5) * lit(nBins))
    val p = share("n_ref")
    val q = share("n_cur")
    counts
      .withColumn("_contrib", round((p - q) * log(p / q), 6))
      .groupBy("pos")
      .agg(round(sum(col("_contrib")), 6).as("psi"))
      .withColumn("drifted", col("psi") > 0.2)
  }

  /** Per-vector int8 scalar quantization — the standard 4× memory
    * reduction for ANN serving (float32 → uint8 codes + per-vector
    * (min, scale)): code_i = min(255, ⌊(x_i − mn) / ((mx − mn)/255)⌋),
    * constant vectors (mx = mn) encode as all-zero. Returns the audit
    * view (id, mn, mx, code_sum, mse): code checksum + reconstruction
    * error rather than raw code arrays, so the result is compact and
    * engine-comparable; [[topKPqSeeded]] is the production compressed
    * SERVING path, this is the compressed STORAGE path.
    *
    * One narrow map pass over the scan — no shuffle, no UDF (HOF lambdas
    * are interpreted but stay per-element and allocation-free; the hot
    * alternative is a VecDot-style native expression if profiling ever
    * demands it). Every arithmetic step (two divisions, floor, fused
    * square) is written identically in the DuckDB oracle so results are
    * bit-comparable; mse rounds to 6dp to absorb sum-order ulps. */
  /** Per-label element-wise embedding centroids (class prototypes — IVF
    * codebook seeds, nearest-class-mean classification, drift monitors).
    * Long output (label, pos, mean, n) rather than re-assembled arrays:
    * the per-dimension rows are what downstream joins consume, and the
    * comparison stays scalar.
    *
    * Scale shape: one posexplode Generate (dim× fan-out) then a hash-agg
    * on (label, pos) with map-side partial avg — the shuffle carries
    * (label, pos, partial sum/count) only, never vectors. The HOF-free
    * alternative (collect_list per label, fold on the driver) would bound
    * on executor memory; this shape never does. */
  def labelCentroids(df: DataFrame, labelCol: String, vecCol: String): DataFrame =
    df.select(col(labelCol),
        posexplode(transform(col(vecCol), _.cast("double"))))
      .groupBy(col(labelCol), col("pos"))
      .agg(round(avg(col("col")), 6).as("mean"), count(lit(1)).as("n"))

  def quantizeInt8(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val sq = (d: Column) => d * d
    df.select(col(idCol), transform(col(vecCol), _.cast("double")).as("_v"))
      .withColumn("_mn", array_min(col("_v")))
      .withColumn("_mx", array_max(col("_v")))
      .withColumn("_sc", (col("_mx") - col("_mn")) / lit(255.0))
      .withColumn("_codes", transform(col("_v"), x =>
        when(col("_sc") === 0.0, lit(0L))
          .otherwise(least(lit(255L), floor((x - col("_mn")) / col("_sc"))))))
      .select(col(idCol),
        col("_mn").as("mn"), col("_mx").as("mx"),
        aggregate(col("_codes"), lit(0L), _ + _).as("code_sum"),
        // empty vectors: mn/mx/mse are null (no elements to average over
        // — the bare division would be an ANSI DIVIDE_BY_ZERO), code_sum
        // is the empty fold's 0
        when(size(col("_v")) > 0, round(
          aggregate(
            zip_with(col("_v"), col("_codes"),
              (x, c) => sq(x - (col("_mn") + c * col("_sc")))),
            lit(0.0), _ + _) / size(col("_v")), 6)).as("mse"))
  }

  /** Margin-based bitext mining (Artetxe & Schwenk 2019): for each source
    * vector, its best cross-side match scored by
    * `margin = cos(x, y) / (½·(avgₖNN(x) + avgₖNN(y)))` — the ratio
    * criterion that separates true translation pairs from hubs (vectors
    * near everything score a high raw cosine but a margin ≈ 1). Emits the
    * forward-best pair per source with its margin and a mutual-best flag,
    * kept when `margin ≥ minMargin` (apply `mutual = 1` for the strict
    * intersection variant).
    *
    * Determinism: cosines are 6dp-rounded then scaled to INTEGERS, so the
    * k-NN averages are exact integer sums (no float-association drift vs
    * the oracle); margin = `2·k·cosᵢ / (Σfwd·nbwd + Σbwd·nfwd)` divides
    * integers once at the end.
    *
    * Scale posture: brute cross scoring — the EVAL/calibration harness
    * (mine a sample, tune the margin), same class as [[topKBrute]]; the
    * production path blocks the cross join through the IVF cell
    * ([[topKIvf]]) with identical downstream margin arithmetic. The
    * ranked frame feeds three consumers, so it is localCheckpoint'd
    * once. */
  def bitextMine(
      src: DataFrame, // (sid, svec)
      dst: DataFrame, // (did, dvec)
      k: Int,
      minMargin: Double): DataFrame = {
    require(k >= 1 && minMargin > 0, "need k >= 1 and minMargin > 0")
    val s = src.withColumn("sn", l2norm(col("svec")))
    val d = dst.withColumn("dn", l2norm(col("dvec")))
    val scored = d.crossJoin(broadcast(s))
      .select(col("sid"), col("did"),
        round(round(dot(col("svec"), col("dvec")) /
          (col("sn") * col("dn")), 6) * 1e6, 0).cast("long").as("ci"))
    val wf = Window.partitionBy("sid").orderBy(col("ci").desc, col("did").asc)
    val wb = Window.partitionBy("did").orderBy(col("ci").desc, col("sid").asc)
    val ranked = scored
      .withColumn("rf", row_number().over(wf))
      .withColumn("rb", row_number().over(wb))
      .localCheckpoint()
    val fs = ranked.filter(col("rf") <= k).groupBy("sid")
      .agg(sum("ci").as("sfa"), count(lit(1)).as("sfn"))
    val bs = ranked.filter(col("rb") <= k).groupBy("did")
      .agg(sum("ci").as("sba"), count(lit(1)).as("sbn"))
    val denom = col("sfa") * col("sbn") + col("sba") * col("sfn")
    ranked.filter(col("rf") === 1)
      .join(fs, "sid").join(bs, "did")
      .filter(denom > 0)
      .select(col("sid"), col("did"),
        round(col("ci").cast("double") / 1000000.0, 6).as("cos"),
        round((lit(2L) * col("ci") * col("sfn") * col("sbn")).cast("double") /
          denom, 6).as("margin"),
        (col("rb") === 1).cast("int").as("mutual"))
      .filter(col("margin") >= minMargin)
  }

  /** k-center greedy coreset selection (Gonzalez 1985; Sener & Savarese
    * 2018's active-learning/data-selection workhorse): start from the
    * minimum id, then `k−1` times pick the vector FARTHEST (cosine
    * distance, 6dp) from everything selected so far — the 2-approximation
    * of the k-center cover, and the "maximally diverse subset" selector a
    * curation stack uses to seed labeling or distill a corpus. Emits the
    * selection order with each pick's covering distance (the seed carries
    * the sentinel 2.0, the cosine-distance upper bound) — the decreasing
    * dist column IS the coverage-radius curve.
    *
    * Scale shape: each round is one narrow map (dot against the
    * broadcast last-picked vector, `least` with the running distance,
    * localCheckpoint to keep lineage flat) + a 1-row struct-max
    * aggregate; k driver-side single-row collects total — the bounded
    * plan-time materialization posture of the index trainers
    * (q220/q221), never a data-sized collect. */
  def kCenterGreedy(corpus: DataFrame /* (cid, cvec) */, k: Int): DataFrame = {
    require(k >= 1 && k <= 64, "k must be in [1, 64]")
    val spark = corpus.sparkSession
    import spark.implicits._
    val nrm = normalized(corpus, "cvec").localCheckpoint()
    val first = nrm.agg(min(col("cid"))).head()
    require(!first.isNullAt(0), "kCenterGreedy: empty corpus")
    var prevId = first.getLong(0)
    var prevVec = nrm.filter(col("cid") === prevId)
      .select("cvec").head().getSeq[Double](0)
    var selected = Vector((prevId, 2.0))
    var cur = nrm.withColumn("_d", lit(2.0))
    var i = 1
    var covered = false
    while (i < k && !covered) {
      val pv = array(prevVec.map(lit): _*)
      cur = cur.withColumn("_d",
        least(col("_d"), round(lit(1.0) - dot(col("cvec"), pv), 6)))
        .localCheckpoint()
      val m = cur.agg(max(struct(col("_d").as("d"), (-col("cid")).as("nc"))))
        .head().getStruct(0)
      // max residual distance 0 = every vector coincides with a pick
      // (k > n, or an all-duplicate corpus): the cover is already
      // perfect and any further pick would re-select an existing cid —
      // stop instead of emitting duplicate selection rows
      if (m.getDouble(0) <= 0.0) covered = true
      else {
        val nid = -m.getLong(1)
        selected :+= ((nid, m.getDouble(0)))
        prevVec = cur.filter(col("cid") === nid)
          .select("cvec").head().getSeq[Double](0)
        prevId = nid
        i += 1
      }
    }
    selected.zipWithIndex
      .map { case ((id, d), r) => (r + 1, id, d) }
      .toDF("rank", "cid", "dist")
  }

  /** Per-subspace PQ reconstruction-distortion report for an explicit
    * codebook (the q221 pinned index): every corpus vector's subvector
    * error to its NEAREST codebook entry
    * (`‖sub‖² + min_j(−2·sub·c_j + ‖c_j‖²)`, 6dp, −0.0 guarded), plus
    * code utilization — the index-quality dashboard that says WHICH
    * subspace's codebook is stale before recall degrades. One codegen'd
    * projection (explode of m plan-time structs) + a per-subspace
    * hash-aggregate; output is m rows. */
  def pqDistortion(
      corpus: DataFrame /* (cid, cvec) */,
      books: Array[Array[Array[Double]]]): DataFrame = {
    val m = books.length
    val dsub = books.head.head.length
    val ksub = books.head.length
    val nrm = normalized(corpus, "cvec")
    def scores(s: Int): Column = array(books(s).map { c =>
      dot(slice(col("cvec"), s * dsub + 1, dsub), array(c.map(lit): _*)) *
        -2.0 + c.map(x => x * x).sum
    }: _*)
    val perS = (0 until m).map { s =>
      val sub = slice(col("cvec"), s * dsub + 1, dsub)
      struct(lit(s).as("s"),
        (round(dot(sub, sub) + array_min(scores(s)), 6) + lit(0.0)).as("err"),
        pqAssign(col("cvec"), s, dsub, books(s)).as("code"))
    }
    nrm.select(explode(array(perS: _*)).as("x"))
      .select(col("x.s").as("s"), col("x.err").as("err"),
        col("x.code").as("code"))
      .groupBy("s")
      .agg(count(lit(1)).as("n_vectors"),
        round(sum("err") / count(lit(1)), 6).as("mse"),
        countDistinct(col("code")).as("codes_used"))
      .withColumn("code_util",
        round(col("codes_used") / lit(ksub.toDouble), 6))
  }

  /** Embedding-space benchmark decontamination: flag every corpus vector
    * whose best cosine against the benchmark set reaches `tau` — the
    * semantic complement of the exact/Bloom n-gram gates (q59/q146) and
    * the span-level scalpel (q240): paraphrased or lightly-reworded
    * benchmark leakage that no lexical fingerprint catches. Emits ONE row
    * per corpus vector (best benchmark id, best cosine 6dp, the flag), so
    * the caller can either drop flagged rows or audit the near-misses
    * just under the threshold.
    *
    * Scale posture: the benchmark side is small by definition (eval
    * suites are thousands of rows, the corpus is billions) and is
    * broadcast after a one-pass norm projection; the corpus never
    * shuffles — score + per-id struct-max fold happen map-side, the
    * final hash-aggregate carries one struct per corpus id. The argmax is
    * a sort-free `max(struct(cos, −bid))`, no rank window. */
  def embeddingDecontam(
      corpus: DataFrame, // (cid, cvec)
      bench: DataFrame, // (bid, bvec)
      tau: Double): DataFrame = {
    require(tau > 0 && tau <= 1, "tau must be in (0, 1]")
    val b = bench.withColumn("bn", l2norm(col("bvec")))
    val c = corpus.withColumn("cn", l2norm(col("cvec")))
    c.crossJoin(broadcast(b))
      .select(col("cid"),
        cosSafe(dot(col("cvec"), col("bvec")), col("cn"), col("bn"))
          .as("cos"),
        col("bid"))
      .groupBy("cid")
      .agg(max(struct(col("cos"), (-col("bid")).as("nb"))).as("_m"))
      .select(col("cid"), (-col("_m.nb")).as("bench_id"),
        col("_m.cos").as("max_cos"))
      .withColumn("contaminated", (col("max_cos") >= tau).cast("int"))
  }
}
