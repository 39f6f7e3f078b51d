package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** S1 / S2 — sources (SURVEY.md §2.1).
  *
  * The reference's workbook is a collection of named tables whose sheet
  * name is itself data (timesheet_transform.py:21-29). Canonical columnar
  * equivalent: one frame per "sheet", unioned by name with missing-column
  * tolerance, the sheet name injected both as the default for a missing
  * column and as an explicit `_sheet` lineage column.
  */
object Sources {

  /** S1: canonical structured scan. The `events` table carries a
    * TIMESTAMP(NANOS) parquet column which Spark only reads as long (via
    * spark.sql.legacy.parquet.nanosAsLong, set in Verify/Bench sessions);
    * normalize it back to a microsecond TimestampType here so downstream
    * operators always see a timestamp. */
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    if (name == "events" && df.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      df.withColumn("ts", expr("timestamp_micros(ts div 1000)")) // integer div: ns are > 2^53, double math would lose precision
    else df
  }

  /** S1 (CSV container): schema-first CSV scan, header row, PERMISSIVE
    * row tolerance (malformed rows -> nulls, matching the reference's
    * skip-don't-throw posture). Excel is the reference's *container*;
    * CSV/Parquet are the canonical columnar equivalents here. */
  def csvTable(
      spark: SparkSession,
      path: String,
      schema: org.apache.spark.sql.types.StructType,
      header: Boolean = true): DataFrame =
    spark.read
      .schema(schema)
      .option("header", header)
      .option("mode", "PERMISSIVE")
      .csv(path)

  /** S2: union heterogeneous sheets; a sheet lacking `defaultCol` gets it
    * filled with the sheet name (timesheet_transform.py:23-26); sheets with
    * different column sets union by name with null fill
    * (unionByName(allowMissingColumns=true) ≙ pd.concat). */
  def unionSheets(
      sheets: Seq[(String, DataFrame)],
      defaultCol: String,
      sheetCol: String = "_sheet"): DataFrame = {
    val prepared = sheets.map { case (name, df) =>
      val withDefault =
        if (df.columns.contains(defaultCol)) df
        else df.withColumn(defaultCol, lit(name))
      withDefault.withColumn(sheetCol, lit(name))
    }
    prepared.reduce(_.unionByName(_, allowMissingColumns = true))
  }
}
