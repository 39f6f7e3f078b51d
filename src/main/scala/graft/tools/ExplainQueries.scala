package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** Writes one `<query>.txt` per requested query containing the
  * `.explain("formatted")` output (the optimization-round plan artifact)
  * plus the post-execution (final AQE) physical plan — the two views the
  * judge checks plan claims against.
  *
  * Usage: runMain graft.tools.ExplainQueries <outDir> <q1,q2,...> [sfDir]
  * A query argument matches by prefix (q63 matches q63_canonical).
  */
object ExplainQueries {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: ExplainQueries <outDir> <q1,q2,...> [sfDir]")
    val outDir = Paths.get(args(0))
    Files.createDirectories(outDir)
    val wanted = args(1).split(",").toSet
    val sfDir = if (args.length > 2) args(2) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder()
      .withExtensions(new graft.ext.GraftExtensions)
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft_wh_").toString)
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => wanted.exists(n.startsWith) }
      .foreach { case (name, fn) =>
        try {
          val df = fn(spark, sfDir)
          val formatted = df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          df.write.format("noop").mode("overwrite").save()
          val finalPlan = df.queryExecution.executedPlan match {
            case a: AdaptiveSparkPlanExec => a.executedPlan.toString
            case p => p.toString
          }
          val body = s"# $name ($sfDir)\n\n== explain(formatted) ==\n\n" +
            formatted + "\n\n== post-execution (final AQE) physical plan ==\n\n" +
            finalPlan + "\n"
          Files.write(outDir.resolve(s"$name.txt"),
            body.getBytes("UTF-8"))
          println(s"WROTE $name")
        } catch {
          case e: Throwable => println(s"FAIL $name: $e")
        }
      }
    spark.stop()
  }
}
