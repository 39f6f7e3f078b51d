package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  test("cosine: orthogonal 0, parallel 1, anti-parallel -1") {
    val df = Seq(
      (Array(1f, 0f), Array(0f, 1f)),
      (Array(1f, 2f), Array(2f, 4f)),
      (Array(1f, 0f), Array(-3f, 0f))
    ).toDF("a", "b")
    val got = df.select(round(Similarity.cosine(col("a"), col("b")), 9))
      .as[Double].collect().toSeq
    assert(got == Seq(0.0, 1.0, -1.0))
  }

  test("topKBrute: exact ranking, self excluded, ties broken by id") {
    val corpus = Seq(
      (10L, Array(1f, 0f)), (11L, Array(0.9f, 0.1f)),
      (12L, Array(0f, 1f)), (13L, Array(1f, 0f))
    ).toDF("cid", "cvec")
    val queries = Seq((10L, Array(1f, 0f))).toDF("qid", "qvec")
    val got = Similarity.topKBrute(queries, corpus, 2)
      .orderBy("rnk").collect()
      .map(r => (r.getInt(1), r.getLong(2))).toSeq
    assert(got == Seq((1, 13L), (2, 11L))) // 13 is cos=1.0; self (10) excluded
  }

  test("topKIvf returns a subset of brute-force candidates with identical scores") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = e.filter(col("vec_id") % 20 === 0)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"),
        col("label").as("cell"))
    val ivf = Similarity.topKIvf(q,
        e.select(col("vec_id").as("cid"), col("embedding").as("cvec"),
          col("label").as("cell")), 3)
      .collect().map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3)).toMap
    val brute = Similarity.topKBrute(q.drop("cell"),
        e.select(col("vec_id").as("cid"), col("embedding").as("cvec")), 10000)
      .collect().map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3)).toMap
    assert(ivf.nonEmpty)
    // every ivf hit appears in the deep brute list with the same score
    ivf.foreach { case (k, v) => assert(brute.get(k).contains(v), s"$k") }
  }

  test("lshBucket: deterministic and equal for identical vectors") {
    val df = Seq((1L, Array.fill(8)(0.5f)), (2L, Array.fill(8)(0.5f)),
      (3L, Array.tabulate(8)(i => if (i % 2 == 0) 1f else -1f)))
      .toDF("id", "v")
      .select(col("id"), Similarity.lshBucket(col("v"), dim = 8, nBits = 8).as("b"))
    val got = df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(1L) == got(2L))
    assert(got.values.forall(b => b >= 0 && b < 256))
  }
}
