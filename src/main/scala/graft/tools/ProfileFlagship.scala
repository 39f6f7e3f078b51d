package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.fixtures.TimesheetFixture
import graft.ops.{Aggregates, Cleansing, Lookup, Reshape}
import graft.pipelines.TimesheetPipeline

/** Scratch stage-by-stage timing of the flagship pipeline (noop sink each
  * stage, 2 runs, second = steady state). Not part of the library surface.
  * Usage: runMain graft.tools.ProfileFlagship <sfDir>
  */
object ProfileFlagship {
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

    def time(label: String)(df: => DataFrame): Unit = {
      (1 to 2).foreach { i =>
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        println(f"$label run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }

    val wide = TimesheetFixture.wide(spark, sfDir)
    time("1 wide scan        ")(wide)
    val parsed = wide
      .filter(Cleansing.hasWeekRange(col("weekrange")))
      .withColumn("week_start", Cleansing.weekStart(col("weekrange")))
      .filter(col("week_start").isNotNull)
      .withColumn("surname", Cleansing.surname(col("autore")))
    time("2 + parse/cleanse  ")(parsed)
    val melted = Reshape.meltWeek(
      parsed, idCols = Seq("rid", "week_start", "surname", "commessa"))
    time("3 + melt           ")(melted)
    val records = TimesheetPipeline.cleansedRecords(spark, sfDir)
    time("4 + hours/date     ")(records)
    val mapped = Lookup.mapWithDefault(
      records, "commessa", TimesheetFixture.mapping(spark))
    time("5 + lookup         ")(mapped)
    val agg = Aggregates.setJoinSum(mapped, Seq("data", "surname"), "commessa", "ore")
    time("6 + setJoinSum agg ")(agg)
    time("7 + orderBy        ")(agg.orderBy("data", "surname"))
    val sum3 = Aggregates.sumByKeys(mapped, Seq("data", "commessa", "surname"), "ore", "ore")
    time("8 sum3 agg (q25)   ")(sum3)
    spark.stop()
  }
}
