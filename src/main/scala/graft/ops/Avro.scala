package graft.ops

import scala.collection.mutable

import org.apache.avro.Schema
import org.apache.avro.file.{DataFileReader, DataFileWriter, SeekableByteArrayInput}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.spark.sql.{DataFrame, Encoders, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Avro Object Container File source/sink built directly on the Avro
  * core library (already on Spark's runtime classpath — no new
  * dependencies, the same constraint the [[Xlsx]] codec met; the
  * `spark-avro` DATASOURCE module is not shipped here, so the engine
  * provides the container itself). Extends the S1/S4 container surface
  * (SURVEY §2.1) beyond parquet/CSV/JSON/ORC/XML/xlsx with the remaining
  * row-oriented interchange format warehouse pipelines actually emit.
  *
  * Typed subset: long / int / double / boolean / string, all nullable
  * (encoded as `["null", T]` unions) — the q62 ORC round-trip class.
  * Richer nesting stays parquet's job.
  *
  * Scale posture: [[writeAvro]] emits ONE CONTAINER PER PARTITION in
  * parallel (the [[Xlsx.writeWorkbooks]] posture, not the one-task
  * report sink), each through the session's Hadoop conf so executors
  * resolve the same filesystems the session reads. [[readAvro]]
  * distributes FILES via the `binaryFile` source and each executor
  * decodes its own containers' bytes inside the partition boundary —
  * the documented codec-boundary shape of [[Multimodal]]. */
object Avro {

  private val supported: Set[DataType] =
    Set(LongType, IntegerType, DoubleType, BooleanType, StringType)

  /** Avro record schema for a (flat, typed-subset) Spark schema; every
    * field is a nullable union in field order. */
  def avroSchemaFor(st: StructType, name: String = "graft_record"): Schema = {
    st.fields.foreach { f =>
      require(supported.contains(f.dataType),
        s"Avro codec supports ${supported.mkString("/")}; " +
          s"field '${f.name}' is ${f.dataType}")
    }
    def avroType(t: DataType): String = t match {
      case LongType => "long"
      case IntegerType => "int"
      case DoubleType => "double"
      case BooleanType => "boolean"
      case StringType => "string"
      case other => throw new IllegalArgumentException(other.toString)
    }
    val fields = st.fields.map { f =>
      s"""{"name":"${f.name}","type":["null","${avroType(f.dataType)}"],"default":null}"""
    }.mkString(",")
    new Schema.Parser().parse(
      s"""{"type":"record","name":"$name","fields":[$fields]}""")
  }

  /** Session Hadoop conf → serializable pairs (the [[Xlsx]] writer fix:
    * executor-side writers must resolve the session's filesystems). */
  private def confProps(spark: SparkSession): Array[(String, String)] = {
    val c = spark.sessionState.newHadoopConf()
    val buf = mutable.ArrayBuffer.empty[(String, String)]
    val it = c.iterator()
    while (it.hasNext) { val e = it.next(); buf += ((e.getKey, e.getValue)) }
    buf.toArray
  }

  private def writeFile(
      path: String,
      bytes: Array[Byte],
      props: Array[(String, String)]): Unit = {
    val conf = new org.apache.hadoop.conf.Configuration()
    props.foreach { case (k, v) => conf.set(k, v) }
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(conf)
    val out = fs.create(p, true)
    try out.write(bytes) finally out.close()
  }

  /** Write `df` as `dir/part-<partition>.avro` container files, one per
    * non-empty partition, in parallel. Overwrites `dir`. */
  def writeAvro(df: DataFrame, dir: String): Unit = {
    val st = df.schema
    val schemaJson = avroSchemaFor(st).toString
    val props = confProps(df.sparkSession)
    val conf = df.sparkSession.sessionState.newHadoopConf()
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(conf)
    if (fs.exists(p)) fs.delete(p, true): Unit
    fs.mkdirs(p): Unit
    val width = st.fields.length
    val names = st.fields.map(_.name)
    df.foreachPartition { (rows: Iterator[Row]) =>
      if (rows.hasNext) { // empty partitions emit no file
        val schema = new Schema.Parser().parse(schemaJson)
        val bos = new java.io.ByteArrayOutputStream()
        val w = new DataFileWriter[GenericRecord](
          new GenericDatumWriter[GenericRecord](schema))
        w.create(schema, bos): Unit
        rows.foreach { r =>
          val rec = new GenericData.Record(schema)
          var i = 0
          while (i < width) {
            rec.put(names(i), if (r.isNullAt(i)) null else r.get(i))
            i += 1
          }
          w.append(rec)
        }
        w.close()
        val pid = org.apache.spark.TaskContext.getPartitionId()
        writeFile(s"$dir/part-$pid.avro", bos.toByteArray, props)
      }
    }
  }

  /** Read Avro container files matching `pathGlob` into `schema`
    * (matched BY FIELD NAME against each container's writer schema, so
    * column order may differ; a field absent from a container reads as
    * null — the schema-evolution-tolerant posture of q87). */
  def readAvro(
      spark: SparkSession,
      pathGlob: String,
      schema: StructType): DataFrame = {
    schema.fields.foreach { f =>
      require(supported.contains(f.dataType),
        s"Avro codec supports ${supported.mkString("/")}; " +
          s"field '${f.name}' is ${f.dataType}")
    }
    val names = schema.fields.map(_.name)
    val types = schema.fields.map(_.dataType)
    val enc = Encoders.row(schema)
    spark.read.format("binaryFile").load(pathGlob)
      .select(col("content")).as(Encoders.BINARY)
      .mapPartitions { it =>
        it.flatMap { bytes =>
          val rdr = new DataFileReader[GenericRecord](
            new SeekableByteArrayInput(bytes),
            new GenericDatumReader[GenericRecord]())
          val buf = mutable.ArrayBuffer.empty[Row]
          try {
            while (rdr.hasNext) {
              val rec = rdr.next()
              val hasField: String => Boolean =
                n => rec.getSchema.getField(n) != null
              val vals: Array[Any] = Array.tabulate(names.length) { i =>
                val v = if (hasField(names(i))) rec.get(names(i)) else null
                (v, types(i)) match {
                  case (null, _) => null
                  case (s: CharSequence, StringType) => s.toString
                  case (x: java.lang.Long, LongType) => x
                  case (x: java.lang.Integer, IntegerType) => x
                  case (x: java.lang.Double, DoubleType) => x
                  case (x: java.lang.Boolean, BooleanType) => x
                  case (x, t) => throw new IllegalArgumentException(
                    s"field '${names(i)}': container value " +
                      s"${x.getClass.getSimpleName} does not fit $t")
                }
              }
              buf += Row(vals.toIndexedSeq: _*)
            }
          } finally rdr.close()
          buf.iterator
        }
      }(enc)
  }
}
