package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.SparkSpec

class SourcesSpec extends SparkSpec {

  test("csvTable: schema-first read, header, PERMISSIVE malformed-row tolerance") {
    val dir = java.nio.file.Files.createTempDirectory("graft_csv_").toString
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/t.csv"),
      "rid,autore,ore\n1,Mario Rossi,7.5\n2,Anna Bianchi,not_a_number\n3,,\n")
    val schema = StructType(Seq(
      StructField("rid", LongType),
      StructField("autore", StringType),
      StructField("ore", DoubleType)))
    val got = Sources.csvTable(spark, s"$dir/t.csv", schema)
      .orderBy("rid").collect()
    assert(got.length == 3)
    assert(got(0).getLong(0) == 1L && got(0).getDouble(2) == 7.5)
    assert(got(1).isNullAt(2)) // malformed double -> null, row kept
    assert(got(2).isNullAt(1) && got(2).isNullAt(2))
  }

  test("orcTable: typed round trip preserves values, nulls, and timestamps") {
    val dir = java.nio.file.Files.createTempDirectory("graft_orc_").toString
    import spark.implicits._
    val df = Seq(
      (1L, Some("x"), Some(1.5)),
      (2L, None, None),
      (3L, Some(""), Some(-0.0))).toDF("k", "s", "v")
    df.write.mode("overwrite").orc(dir)
    val got = Sources.orcTable(spark, dir, df.schema).orderBy("k").collect()
    assert(got.length == 3)
    assert(got(0).getString(1) == "x" && got(0).getDouble(2) == 1.5)
    assert(got(1).isNullAt(1) && got(1).isNullAt(2))
    assert(got(2).getString(1) == "" && got(2).getDouble(2) == -0.0)
  }

  test("csv round trip: wide fixture survives CSV container semantics") {
    val dir = java.nio.file.Files.createTempDirectory("graft_csvrt_").toString
    val wide = graft.fixtures.TimesheetFixture.wide(spark, "/root/testdata/sf0.001")
    wide.write.mode("overwrite").option("header", true).csv(dir)
    val back = Sources.csvTable(spark, dir, wide.schema)
    assert(back.count() == wide.count())
    // NBSP-polluted strings survive the round trip intact
    val dirty = back.filter(col("h_giovedi").contains(" ")).count()
    assert(dirty > 0 && dirty == wide.filter(col("h_giovedi").contains(" ")).count())
  }
}
