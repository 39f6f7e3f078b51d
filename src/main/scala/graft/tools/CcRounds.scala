package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.{Dedup, Sources, TextAnalysis}

/** Head-to-head of the two connected-components implementations on the
  * REAL q43/q63 edge inputs (simhash / minhash near-dup pairs) — rounds
  * and min-of-3 wall-clock, the measurement behind keeping min-label +
  * pointer jumping as the production implementation (round-10 VERDICT
  * Next #6 asked for large-star/small-star; the fixture spec in
  * DedupSpec shows both are O(log n) rounds, this tool settles
  * wall-clock on data). Run:
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.tools.CcRounds"
  */
object CcRounds {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("cc-rounds")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft_wh_").toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = Sources.table(spark, dir, "documents")
      .select(col("doc_id"), TextAnalysis.words(col("text")).as("toks"))
    val edges = Dedup.simhashPairs(d, "doc_id", col("toks"), maxDist = 6)
      .select(col("id_a"), col("id_b")).localCheckpoint()
    println(s"edges: ${edges.count()} at $dir")
    def bench(name: String, run: () => Long): Unit = {
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        val n = run()
        val s = (System.nanoTime() - t0) / 1e9
        (s, n, Dedup.ccLastRounds)
      }
      val best = times.minBy(_._1)
      println(f"$name%-12s: ${best._1}%6.2f s (min of 3), " +
        f"rounds=${best._3}, labels=${best._2}")
    }
    bench("min-label", () =>
      Dedup.connectedComponents(edges, "id_a", "id_b").count())
    bench("star", () =>
      Dedup.connectedComponentsStar(edges, "id_a", "id_b").count())
    spark.stop()
  }
}
