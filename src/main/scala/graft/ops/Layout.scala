package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout operators: Z-order (Morton) interleaving for
  * multi-dimensional data skipping.
  *
  * The reference's only layout notion is one-sheet-per-surname
  * partitioning (`timesheet_transform_v1.py:91-100` — S4 in SURVEY §2.1);
  * at 100 TB the analogous lever is file-level clustering: range-partition
  * and sort by an interleaved key so every output file covers a compact
  * rectangle in (x, y) space and parquet min/max footer stats prune scans
  * filtered on EITHER column, not just the leading sort key.
  */
object Layout {

  /** Morton/Z-value of two non-negative integer columns: bit i of `x`
    * lands at bit 2i, bit i of `y` at bit 2i+1. Pure shift/and/add
    * chain — codegen'd whole-stage, no UDF; `bits` ≤ 31 keeps the result
    * in a long with room to spare (2·bits ≤ 62). Values are taken mod
    * 2^bits (upper bits ignored), so size `bits` to the column domain. */
  def zValue(x: Column, y: Column, bits: Int = 21): Column = {
    require(bits >= 1 && bits <= 31, "bits must be in [1, 31]")
    val xl = x.cast("long")
    val yl = y.cast("long")
    (0 until bits).map { i =>
      shiftleft(shiftright(xl, i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftright(yl, i).bitwiseAND(lit(1L)), 2 * i + 1)
    }.reduce(_ + _) // disjoint bit positions: + ≡ bitwise OR
  }

  /** Hilbert-curve index of two non-negative integer columns — the
    * better-locality sibling of [[zValue]] (every contiguous index range
    * is one connected plane region; Z-ranges jump at power-of-two seams).
    * Backed by the codegen'd [[graft.expressions.HilbertIndex]]
    * expression: the per-bit frame rotation carries state across
    * iterations, which composed `when`-chains can only express with
    * exponential blowup. */
  def hilbertValue(x: Column, y: Column, bits: Int = 16): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      graft.expressions.HilbertIndex(
        org.apache.spark.sql.graftbridge.Bridge.expression(x.cast("long")),
        org.apache.spark.sql.graftbridge.Bridge.expression(y.cast("long")),
        bits))

  /** [[zOrdered]]'s Hilbert twin: range-partition + local sort by the
    * Hilbert index — same one-shuffle cost, tighter per-file rectangles. */
  def hilbertOrdered(
      df: DataFrame,
      xCol: String,
      yCol: String,
      numParts: Int,
      bits: Int = 16): DataFrame =
    df.withColumn("_h", hilbertValue(col(xCol), col(yCol), bits))
      .repartitionByRange(numParts, col("_h"))
      .sortWithinPartitions("_h")
      .drop("_h")

  /** Z-ordered layout: range-partition by z-value, then sort within
    * partitions. Each partition (→ output file on write) covers one
    * compact, non-overlapping z-range, i.e. a small rectangle in both
    * dimensions — so min/max stats are tight on BOTH columns and a scan
    * with a predicate on either one skips most files. One range shuffle
    * (sampled boundaries, skew-proof) + a local sort; no global sort. */
  def zOrdered(
      df: DataFrame,
      xCol: String,
      yCol: String,
      numParts: Int,
      bits: Int = 21): DataFrame =
    df.withColumn("_z", zValue(col(xCol), col(yCol), bits))
      .repartitionByRange(numParts, col("_z"))
      .sortWithinPartitions("_z")
      .drop("_z")

  /** File-skipping effectiveness report — WHY a table gets laid out by
    * [[zOrdered]]/[[hilbertOrdered]] in the first place: simulate
    * writing the table as `nFiles` files under each candidate layout
    * key (equal-width key-range buckets — integer arithmetic from the
    * collected 1-row global min/max, NO global sort window), record per-file
    * min/max of the predicate column (the parquet row-group stats a
    * reader prunes on), and score the pinned range predicate
    * `value BETWEEN lo AND hi`: how many files must be opened, and what
    * fraction of rows they hold. One row per layout — reading it tells
    * you which sort key turns the predicate into IO savings.
    *
    * Keys must fit `|key| < 2⁴⁰` so the bucket arithmetic
    * `(key−min)·nFiles` stays in a long — ENFORCED at plan time against
    * the collected bounds; pre-reduce wide keys (hash layouts take
    * `hash % 2²⁰`). Scale: one pass per layout (hash-agg on file id),
    * min/max a 1-row driver collect; no sort anywhere. */
  def skippingEval(
      df: DataFrame,
      layouts: Seq[(String, Column)],
      value: Column,
      lo: Long,
      hi: Long,
      nFiles: Int = 64): DataFrame = {
    require(layouts.nonEmpty, "need at least one layout")
    require(nFiles >= 1, "nFiles must be >= 1")
    val reports = layouts.map { case (name, key) =>
      val base = df.select(key.cast("long").as("_k"),
        value.cast("long").as("_v"))
      // 1-row driver materialization (the pqTrain bounded posture): the
      // bounds become plan-time literals, and the documented |key| < 2⁴⁰
      // contract is ENFORCED — (key−min)·nFiles must stay in a long, so
      // a hash60-keyed layout would silently wrap to negative file ids
      // and emit a wrong skip report instead of an error
      val b = base.agg(min("_k"), max("_k")).head()
      require(!b.isNullAt(0), s"skippingEval: layout '$name' has no rows")
      val (kLo, kHi) = (b.getLong(0), b.getLong(1))
      val bound = 1L << 40
      require(math.abs(kLo) < bound && math.abs(kHi) < bound,
        s"skippingEval: layout '$name' keys [$kLo, $kHi] exceed the " +
          "|key| < 2^40 contract (bucket arithmetic would overflow) — " +
          "pre-reduce wide keys, e.g. hash % 2^20")
      val files = base
        .withColumn("_file",
          ((col("_k") - lit(kLo)) * nFiles /
            (lit(kHi) - lit(kLo) + 1)).cast("long"))
        .groupBy("_file")
        .agg(min("_v").as("_vmin"), max("_v").as("_vmax"),
          count(lit(1)).as("_rows"))
      val hit = col("_vmax") >= lo && col("_vmin") <= hi
      files.agg(
        count(lit(1)).as("n_files"),
        sum(hit.cast("long")).as("n_hit_files"),
        sum("_rows").as("rows_total"),
        sum(when(hit, col("_rows")).otherwise(0L)).as("rows_scanned"))
        .withColumn("layout", lit(name))
        .withColumn("file_skip_frac", round(lit(1.0) -
          col("n_hit_files") / col("n_files"), 6))
        .withColumn("io_frac",
          round(col("rows_scanned") / col("rows_total"), 6))
        .select("layout", "n_files", "n_hit_files", "rows_total",
          "rows_scanned", "file_skip_frac", "io_frac")
    }
    reports.reduce(_.unionByName(_))
  }
}
