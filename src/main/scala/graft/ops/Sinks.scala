package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** S4 — partitioned writer (SURVEY.md §2.1 S4).
  *
  * The reference's one-sheet-per-surname output loop
  * (timesheet_transform_v1.py:91-100) is a `partitionBy` write: each
  * distinct key becomes a directory partition, written fully in parallel
  * (no driver-side per-key loop — the 100 TB-safe shape). The partition
  * column is dropped inside the files by Spark, matching the reference
  * dropping the SURNAME column per sheet; the 31-char sheet-name cap maps
  * to truncating the partition key (P11).
  */
object Sinks {

  /** Write one parquet partition per `key` value (truncated to
    * `maxKeyLen` chars as the reference truncates sheet names). */
  /** Repartitioning by the key first means each task writes a handful of
    * partition directories instead of every task touching every key
    * (tasks × keys small files — the classic partitionBy blowup at scale).
    * AQE coalesces the shuffle if keys are few. */
  /** Bucketed + sorted table write: co-locates (and pre-sorts) rows by
    * `key` so later equi-joins/aggregations on it read shuffle-free —
    * the storage-level answer to "this join shuffles 100 TB every run".
    * Requires a table (bucket metadata lives in the catalog). */
  def writeBucketed(
      df: DataFrame,
      key: String,
      nBuckets: Int,
      table: String): Unit =
    df.write
      .bucketBy(nBuckets, key)
      .sortBy(key)
      .mode("overwrite")
      .format("parquet")
      .saveAsTable(table)

  def writePartitioned(
      df: DataFrame,
      key: String,
      outDir: String,
      maxKeyLen: Int = 31): Unit =
    df.withColumn(key, Cleansing.truncName(col(key), maxKeyLen))
      .repartition(col(key))
      .write.mode("overwrite")
      .partitionBy(key)
      .parquet(outDir)
}
