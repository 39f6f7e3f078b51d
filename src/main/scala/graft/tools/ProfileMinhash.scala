package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.{Dedup, Sources, TextAnalysis}

/** Scratch stage timing for the MinHash pair pipeline variants (r10
  * optimization round). Not library surface. */
object ProfileMinhash {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .withExtensions(new graft.ext.GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(label: String)(df: => DataFrame): Unit =
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        println(f"$label run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }

    val d = Sources.table(spark, sfDir, "documents", balance = true)
      .select(col("doc_id"), TextAnalysis.words(col("text")).as("toks"))
    val shingleCol = Dedup.shingles(col("toks"), 3)
    val k = 16

    time("0 toks              ")(d)
    val hsArr = d.select(col("doc_id").as("id"),
      Dedup.shingleHashes(shingleCol).as("hs"))
    time("1 hash array        ")(hsArr)
    // old formulation: explode + k min aggregates
    val hs = d.select(col("doc_id").as("id"),
      explode(Dedup.shingleHashes(shingleCol)).as("h"))
    val P = 1000000007L
    val mins = (0 until k).map(j =>
      min((lit(37L * j + 11L) * col("h") + lit(101L * j + 7L)) % P).as(s"m$j"))
    val sigsOld = hs.groupBy("id").agg(mins.head, mins.tail: _*)
      .select(col("id"), array((0 until k).map(j => col(s"m$j")): _*).as("sig"))
    time("2 sigs explode+agg  ")(sigsOld)
    // kernel formulation, one projection
    val sigsNew = d.select(col("doc_id").as("id"),
      Dedup.minhashFromHashes(Dedup.shingleHashes(shingleCol), k).as("sig"))
      .filter(col("sig").isNotNull)
    time("3 sigs kernel       ")(sigsNew)
    // kernel over a pre-aliased hash-array projection (CollapseProject
    // barrier experiment)
    val sigsNew2 = hsArr
      .select(col("id"), Dedup.minhashFromHashes(col("hs"), k).as("sig"))
      .filter(col("sig").isNotNull)
    time("4 sigs kernel 2proj ")(sigsNew2)
    // no null filter: does the pushed-down filter double-evaluate?
    val sigsNoF = d.select(col("doc_id").as("id"),
      Dedup.minhashFromHashes(Dedup.shingleHashes(shingleCol), k).as("sig"))
    time("5 kernel no filter  ")(sigsNoF)
    // kernel over a size-guard filter instead of isNotNull on the result
    val sigsSzF = d.filter(size(col("toks")) >= 3)
      .select(col("doc_id").as("id"),
        Dedup.minhashFromHashes(Dedup.shingleHashes(shingleCol), k).as("sig"))
    time("6 kernel size-guard ")(sigsSzF)
    sigsNew.explain("formatted")
    spark.stop()
  }
}
