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
        round(dot(col("qvec"), col("cvec")) / (col("qn") * col("cn")), 6).as("cos"))
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
        round(dot(col("qvec"), col("cvec")) / (col("qn") * col("cn")), 6).as("cos"))
    val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("cid").asc)
    scored.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= k)
      .select("qid", "rnk", "cid", "cos")
  }

  /** Real IVF: train a k-means coarse quantizer over the corpus (fixed
    * seed → deterministic), assign each corpus vector its nearest
    * centroid cell, and have each query probe its `nProbe` nearest cells.
    * Training is one ml-lib job over a sample-sized corpus; at serving
    * time everything is expressions — centroid scores are literal arrays,
    * so probing stays inside codegen and the corpus is only ever joined
    * by cell. */
  def ivfIndex(
      corpus: DataFrame, // (cid, cvec)
      nCells: Int,
      seed: Long = 42L): (Array[Array[Double]], DataFrame) = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val withVec = corpus.withColumn("_v", array_to_vector(col("cvec")))
    // a coarse quantizer doesn't need convergence: a few Lloyd iterations
    // give cells of equal recall quality at a fraction of the training cost
    val model = new KMeans().setK(nCells).setSeed(seed).setMaxIter(5)
      .setFeaturesCol("_v").setPredictionCol("cell").fit(withVec)
    val indexed = model.transform(withVec)
      .select(col("cid"), col("cvec"), col("cell").cast("long").as("cell"))
    (model.clusterCenters.map(_.toArray), indexed)
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

  /** IVF top-k with a k-means quantizer: probe the `nProbe` nearest cells
    * per query. `nProbe = nCells` is exact (= brute force); small nProbe
    * trades recall for touching a fraction of the corpus. */
  def topKIvfKmeans(
      queries: DataFrame, // (qid, qvec)
      corpus: DataFrame, // (cid, cvec)
      k: Int,
      nCells: Int = 16,
      nProbe: Int = 4,
      seed: Long = 42L): DataFrame = {
    val (centroids, indexed) = ivfIndex(corpus, nCells, seed)
    val q = queries
      .withColumn("cell", explode(probeCells(col("qvec"), centroids, nProbe)))
    topKIvf(q, indexed, k)
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
}
