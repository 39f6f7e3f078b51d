package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}

/** Registry-wide −0.0 regression net. The canonical-hash oracle treats
  * +0.0 and −0.0 as different values, and the two engines disagree on
  * which side of zero a float residue rounds to (DuckDB's round keeps
  * the sign, Spark's BigDecimal round normalizes) — the class that has
  * produced three driver-level hash mismatches (q210's `0 − sum`,
  * q318's pq error, q300's single-valued-cohort entropy). Every
  * registered query runs at sf0.001 and every DOUBLE/FLOAT output
  * column (top-level and array elements) must be free of the
  * negative-zero bit pattern (detected via the exact Java string
  * rendering: `cast(x as string) = '-0.0'`). An op that can
  * mathematically emit an exact zero must canonicalize it
  * (`greatest(…, 0.0)` when the quantity is provably ≥ 0, else the
  * `+ lit(0.0)` identity, which maps −0.0 → +0.0).
  */
class NegZeroSweepSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("no registered query emits a -0.0 in any double column (sf0.001)") {
    val failures = scala.collection.mutable.ListBuffer.empty[String]
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val df =
        try fn(spark, dir)
        catch { case e: Throwable => failures += s"$name: build failed: ${e.getMessage}"; null }
      if (df != null) {
        val checks = df.schema.fields.flatMap { f =>
          val c = col(s"`${f.name}`")
          f.dataType match {
            case DoubleType | FloatType =>
              Some(sum(when(c.cast("string") === "-0.0", 1L)
                .otherwise(0L)))
            case ArrayType(DoubleType, _) =>
              Some(sum(coalesce(size(filter(c,
                x => x.cast("string") === "-0.0")), lit(0)).cast("long")))
            case _ => None
          }
        }
        if (checks.nonEmpty) {
          try {
            val row = df.agg(checks.head, checks.tail.toIndexedSeq: _*).head()
            val bad = (0 until row.length).map(i =>
              if (row.isNullAt(i)) 0L else row.getLong(i)).sum
            if (bad > 0) failures += s"$name: $bad negative-zero value(s)"
          } catch {
            case e: Throwable => failures += s"$name: sweep failed: ${e.getMessage}"
          }
        }
      }
    }
    assert(failures.isEmpty, s"\n${failures.mkString("\n")}")
  }
}
