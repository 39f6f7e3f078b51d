package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Measures the recall@k curve of the cell-blocked binary serving paths
  * ([[graft.ops.Similarity.topKHammingCells]] symmetric XOR vs
  * [[graft.ops.Similarity.topKAsymCells]] asymmetric ±qᵢ) against the
  * exact-cosine brute ground truth, per nProbe — the measurement behind
  * the README recall table (re-run it after retraining the pinned
  * quantizer or changing the candidate budget).
  *
  *   sbt "runMain graft.tools.RecallCurve /root/testdata/sf0.01"
  *
  * Deterministic end to end: pinned centroids, integer/6dp scoring,
  * id tie-breaks — the table reproduces bit-identically per corpus.
  */
object RecallCurve {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val e = graft.ops.Sources.table(spark, sfDir, "embeddings")
    val queries = e.filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val corpus = e.select(col("vec_id").as("cid"), col("embedding").as("cvec"))
    val k = 5
    def hits(df: DataFrame): Map[Long, Set[Long]] =
      df.select("qid", "cid").collect()
        .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val truth = hits(graft.ops.Similarity.topKBrute(queries, corpus, k))
    def recall(got: Map[Long, Set[Long]]): Double = {
      val per = truth.map { case (q, t) =>
        got.getOrElse(q, Set.empty).count(t).toDouble / t.size
      }
      math.rint(per.sum / per.size * 1000) / 1000
    }
    val cents = graft.fixtures.PinnedIndex.ivfCentroidsV1
    println(f"recall@$k vs exact cosine (candK=30, pinned 16-cell quantizer)")
    println("nProbe  symmetric-hamming  asymmetric  cell-ceiling(exact-cos)")
    Seq(4, 6, 8).foreach { np =>
      val sym = recall(hits(graft.ops.Similarity.topKHammingCells(
        queries, corpus, cents, dim = 64, candK = 30, k = k, nProbe = np)))
      val asym = recall(hits(graft.ops.Similarity.topKAsymCells(
        queries, corpus, cents, dim = 64, candK = 30, k = k, nProbe = np)))
      // ceiling: exact cosine over EVERY candidate in the probed cells —
      // what any candidate scorer could at best achieve at this nProbe
      val ceil = recall(hits(graft.ops.Similarity.topKIvfCentroids(
        queries, corpus, cents, k = k, nProbe = np)))
      println(f"$np%6d  $sym%17.3f  $asym%10.3f  $ceil%23.3f")
    }
    val brute = recall(hits(graft.ops.Similarity.topKBinaryRerank(
      queries, corpus, dim = 64, candK = 30, k = k)))
    println(f"full-scan hamming rerank (q277 posture): $brute%.3f")
    spark.stop()
  }
}
