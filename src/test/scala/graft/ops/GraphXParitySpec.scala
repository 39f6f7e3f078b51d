package graft.ops

import org.apache.spark.graphx.{Edge, Graph => XGraph}
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Differential check against Spark's own GraphX `staticPageRank` — an
  * independent implementation of the same fixed-iteration update
  * (rank = 0.15 + 0.85 · Σ in(rank/outdeg), init 1.0). Agreement within
  * float tolerance validates the DataFrame formulation end to end. */
class GraphXParitySpec extends SparkSpec {
  import spark.implicits._

  test("pageRank matches GraphX staticPageRank on a random symmetric graph") {
    val rnd = new scala.util.Random(7)
    val pairs = Seq.tabulate(60)(_ =>
      (rnd.nextInt(20).toLong, rnd.nextInt(20).toLong))
      .filter(p => p._1 != p._2).distinct
    val sym = (pairs ++ pairs.map(p => (p._2, p._1))).distinct

    val ours = Graph.pageRank(sym.toDF("src", "dst"), "src", "dst",
        iterations = 5)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

    val xg = XGraph.fromEdges(
      spark.sparkContext.parallelize(sym.map { case (a, b) => Edge(a, b, 1) }),
      defaultValue = 1.0)
    val theirs = xg.staticPageRank(numIter = 5, resetProb = 0.15)
      .vertices.collect().toMap

    assert(ours.keySet == theirs.keySet.map(_.toLong))
    ours.foreach { case (id, r) =>
      assert(math.abs(r - theirs(id)) < 1e-6,
        s"node $id: ours $r vs graphx ${theirs(id)}")
    }
  }
}
