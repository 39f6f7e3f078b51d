package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

class AvroSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(name: String): String =
    java.nio.file.Files.createTempDirectory(name).toString + "/out"

  test("round trip preserves values, nulls, and all five supported types") {
    val out = tmp("avro_rt_")
    val df = Seq(
      (1L, Some("alpha"), Some(1.5), Some(7), Some(true)),
      (2L, None: Option[String], None: Option[Double], None: Option[Int],
        None: Option[Boolean]),
      (3L, Some("gamma"), Some(-0.25), Some(-9), Some(false))
    ).toDF("id", "s", "d", "i", "b")
    Avro.writeAvro(df, out)
    val schema = StructType.fromDDL(
      "id BIGINT, s STRING, d DOUBLE, i INT, b BOOLEAN")
    val back = Avro.readAvro(spark, s"$out/*.avro", schema)
      .orderBy("id").collect()
    assert(back.length == 3)
    assert(back(0).getLong(0) == 1L && back(0).getString(1) == "alpha" &&
      back(0).getDouble(2) == 1.5 && back(0).getInt(3) == 7 &&
      back(0).getBoolean(4))
    assert((1 to 4).forall(back(1).isNullAt))
    assert(back(2).getString(1) == "gamma" && back(2).getInt(3) == -9)
  }

  test("multi-partition write emits one container per non-empty partition") {
    val out = tmp("avro_mp_")
    Avro.writeAvro((0L until 100L).toDF("id").repartition(5), out)
    val files = new java.io.File(out).listFiles()
      .filter(_.getName.endsWith(".avro"))
    assert(files.length == 5)
    val back = Avro.readAvro(spark, s"$out/*.avro",
      StructType.fromDDL("id BIGINT"))
    assert(back.as[Long].collect().sorted.toSeq == (0L until 100L))
  }

  test("read matches by field NAME: reordered/extra writer columns are fine") {
    val out = tmp("avro_ev_")
    Avro.writeAvro(Seq((1L, "x", 9.0)).toDF("a", "b", "extra"), out)
    // read schema reorders and adds a field the container lacks
    val got = Avro.readAvro(spark, s"$out/*.avro",
      StructType.fromDDL("b STRING, a BIGINT, missing DOUBLE")).head()
    assert(got.getString(0) == "x" && got.getLong(1) == 1L && got.isNullAt(2))
  }

  test("unsupported types fail loud at plan time") {
    val err = intercept[IllegalArgumentException] {
      Avro.writeAvro(Seq((1L, Seq(1, 2))).toDF("a", "arr"), tmp("avro_bad_"))
    }
    assert(err.getMessage.contains("arr"))
  }
}
