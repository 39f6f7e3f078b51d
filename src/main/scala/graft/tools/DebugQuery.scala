package graft.tools

import org.apache.spark.sql.SparkSession

/** Debug harness: runs one SparkEntry query N times, printing per-run wall
  * time (run 1 = warmup) and the formatted physical plan.
  * Usage: runMain graft.tools.DebugQuery <query> <sfDir> [n] [explain]
  */
object DebugQuery {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val n = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // SPARK_GRAFT_CONF="k=v;k=v" injects experimental confs for A/B runs
    val extra = sys.env.get("SPARK_GRAFT_CONF").toSeq
      .flatMap(_.split(";")).map(_.split("=", 2)).map(a => a(0) -> a(1))
    val b0 = SparkSession.builder()
      .withExtensions(new graft.ext.GraftExtensions)
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft_wh_").toString)
      .master(s"local[$cpus]")
    val spark = extra.foldLeft(b0) { case (b, (k, v)) => b.config(k, v) }
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = graft.SparkEntry.queries(name)
    (1 to n).foreach { i =>
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      println(f"RUN$i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    if (args.contains("explain")) fn(spark, sfDir).explain("formatted")
    spark.stop()
  }
}
