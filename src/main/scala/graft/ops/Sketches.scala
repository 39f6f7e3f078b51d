package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Cardinality sketches with DETERMINISTIC hash-derived randomness — the
  * estimate a given corpus produces is identical on any engine, any
  * partitioning, any run (unlike `approx_count_distinct`, whose HLL++
  * register encoding is engine-private and therefore un-oracle-able).
  *
  * Scale shape: the sketch is a (group, bucket) → max(rho) hash-aggregate
  * — map-side combine reduces every partition to ≤ m rows per group
  * before the shuffle, the classic mergeable-sketch property; the
  * finalization folds the ≤ m registers per group in bucket-sorted order
  * (an array fold over a bounded list, so the float sum has ONE
  * well-defined ordering — cross-partition double-sum ordering is the
  * usual source of nondeterminism in sketch finalizers).
  */
object Sketches {

  /** HyperLogLog distinct-count estimate per group over `value`, with
    * m = 2^p registers (p=8 → 256, ~6.5% standard error). Returns
    * (group, n_exact is NOT included — compose it if wanted) →
    * (groupCol, hll_est). Register derivation: h = 60-bit md5 hash;
    * bucket = h mod m; rho = leading-zero count of the remaining
    * (60-p)-bit word + 1, via integer `bin`-length arithmetic (float
    * log2 would misround at exact powers of two). Small-range correction
    * (E ≤ 2.5m with empty registers → linear counting) matches the
    * original Flajolet et al. formulation. */
  def hllDistinct(
      df: DataFrame,
      groupCol: String,
      value: Column,
      p: Int = 8): DataFrame =
    finalizeRegisters(registers(df, groupCol, value, p), groupCol, p)

  /** The mergeable half: (group, bucket) → max(rho). Works unchanged as a
    * STREAMING aggregate (max is monotone, so complete-mode state is the
    * running sketch) — merging sketches from any partitioning of the data
    * gives identical registers. */
  def registers(
      df: DataFrame,
      groupCol: String,
      value: Column,
      p: Int = 8): DataFrame = {
    require(p >= 4 && p <= 16, "p in [4, 16]")
    val m = 1 << p
    val wordBits = 60 - p
    val h = Hashing.hash60(value.cast("string"))
    val w = shiftright(h, p)
    val rho = when(w === 0, lit(wordBits + 1))
      .otherwise(lit(wordBits + 1) - length(bin(w)))
    df.select(col(groupCol), (h % m).as("bucket"), rho.as("rho"))
      .groupBy(groupCol, "bucket")
      .agg(max(col("rho")).as("mr"))
  }

  /** The finalization half over (group, bucket, mr) registers. */
  def finalizeRegisters(
      regs: DataFrame,
      groupCol: String,
      p: Int = 8): DataFrame = {
    val m = 1 << p
    val alpha = 0.7213 / (1 + 1.079 / m)
    // fold the ≤ m registers in bucket order; absent buckets are rho=0
    // (contributing 2^0 = 1 each) and count toward the zero-register V
    regs.groupBy(groupCol)
      .agg(count(lit(1)).as("n_present"),
        aggregate(
          array_sort(collect_list(struct(col("bucket"), col("mr")))),
          lit(0.0),
          (acc, x) => acc + pow(lit(2.0), -x.getField("mr")))
          .as("sum_present"))
      .select(col(groupCol),
        (lit(m) - col("n_present")).as("v_zero"),
        (lit(alpha * m * m.toDouble) /
          (col("sum_present") + (lit(m) - col("n_present")))).as("e_raw"))
      .select(col(groupCol),
        round(when(col("e_raw") <= 2.5 * m && col("v_zero") > 0,
            lit(m.toDouble) * log(lit(m.toDouble) / col("v_zero")))
          .otherwise(col("e_raw")), 6).as("hll_est"))
  }
}
