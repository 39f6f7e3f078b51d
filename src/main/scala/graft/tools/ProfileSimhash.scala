package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.{Dedup, Hashing, Sources, TextAnalysis}

/** Scratch stage timing for the simhash pipeline. Not library surface. */
object ProfileSimhash {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(label: String)(df: => DataFrame): Unit =
      (1 to 2).foreach { i =>
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        println(f"$label run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }

    val d = Sources.table(spark, sfDir, "documents", balance = true)
      .select(col("doc_id"), TextAnalysis.words(col("text")).as("toks"))
    time("1 tokenize        ")(d)
    val th = d.select(col("doc_id").as("id"), explode(col("toks")).as("t"))
      .withColumn("h", Hashing.hash60(col("t")))
    time("2 + explode+hash  ")(th)
    val sums = (0 until 60).map(j =>
      sum(shiftright(col("h"), j) % 2 * 2 - 1).as(s"s$j"))
    time("3 + 60-sum agg    ")(th.groupBy("id").agg(sums.head, sums.tail: _*))
    time("4 simhash fps     ")(Dedup.simhash(d, "doc_id", col("toks")))
    time("5 full pairs      ")(Dedup.simhashPairs(d, "doc_id", col("toks"), 6))
    spark.stop()
  }
}
