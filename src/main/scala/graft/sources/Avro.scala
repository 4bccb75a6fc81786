package graft.sources

import org.apache.avro.Schema
import org.apache.avro.file.{CodecFactory, DataFileStream, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._
import scala.collection.mutable

/** Thin Avro container-file source/sink over the BUNDLED avro-core library
  * (`avro-1.12.1.jar` ships in /opt/spark/jars; only the spark-avro
  * DATASOURCE jar is absent — SURVEY's "Avro gap" was a packaging gap, not
  * a capability one). Flat records of primitive types — the interchange
  * shape Kafka/connect pipelines emit — with nullable-union fields;
  * nested records/arrays/maps are out of scope here (parquet is the
  * engine's nested format).
  *
  * Read is DISTRIBUTED: one task per container file via
  * `sparkContext.binaryFiles` → `DataFileStream` decode → typed `Row`s
  * under the caller's declared schema (fields matched BY NAME — the
  * loadCsv/Xlsx contract). Avro files are also block-splittable, but
  * per-FILE parallelism is how real pipelines shard them (a writer per
  * producer partition), so that is the granularity this source scales by.
  * Write is also distributed: `foreachPartition` streams each Spark
  * partition into its own deflate-compressed container file (deflate is
  * in-JDK; snappy would need a jar this environment doesn't ship).
  */
object Avro {

  /** Spark field type → Avro schema JSON fragment (primitive subset). */
  private def avroType(dt: DataType): String = dt match {
    case LongType    => "\"long\""
    case IntegerType => "\"int\""
    case DoubleType  => "\"double\""
    case FloatType   => "\"float\""
    case BooleanType => "\"boolean\""
    case StringType  => "\"string\""
    case BinaryType  => "\"bytes\""
    case other => throw new IllegalArgumentException(
      s"Avro source: unsupported type $other (flat primitive records only)")
  }

  /** Avro record schema JSON for a Spark schema; every field nullable. */
  private[graft] def avroSchemaJson(schema: StructType, name: String = "row"): String = {
    val fields = schema.fields.map { f =>
      s"""{"name":"${f.name}","type":["null",${avroType(f.dataType)}],"default":null}"""
    }.mkString(",")
    s"""{"type":"record","name":"$name","fields":[$fields]}"""
  }

  /** Write `df` as one deflate-compressed .avro container file per Spark
    * partition under `dir` (created if absent). Executor-side streaming —
    * no driver materialization. */
  def write(df: DataFrame, dir: String): Unit = {
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    val json = avroSchemaJson(df.schema)
    val names = df.schema.fields.map(_.name)
    df.foreachPartition { (rows: Iterator[Row]) =>
      if (rows.nonEmpty) {
        val sch = new Schema.Parser().parse(json)
        val w = new DataFileWriter(new GenericDatumWriter[GenericRecord](sch))
        w.setCodec(CodecFactory.deflateCodec(6))
        val pid = Option(TaskContext.get()).map(_.partitionId()).getOrElse(0)
        w.create(sch, new java.io.File(s"$dir/part-$pid.avro"))
        try rows.foreach { r =>
          val rec = new GenericData.Record(sch)
          var i = 0
          while (i < names.length) {
            val v = if (r.isNullAt(i)) null else r.get(i) match {
              case b: Array[Byte] => java.nio.ByteBuffer.wrap(b)
              case other          => other
            }
            rec.put(names(i), v)
            i += 1
          }
          w.append(rec)
        } finally w.close()
      }
    }
  }

  /** One decoded Avro value → the declared Spark type. */
  private def convert(v: AnyRef, dt: DataType): Any = (v, dt) match {
    case (null, _)                        => null
    case (s: org.apache.avro.util.Utf8, StringType) => s.toString
    case (s: CharSequence, StringType)    => s.toString
    case (n: java.lang.Number, LongType)  => n.longValue()
    case (n: java.lang.Number, IntegerType) => n.intValue()
    case (n: java.lang.Number, DoubleType) => n.doubleValue()
    case (n: java.lang.Number, FloatType) => n.floatValue()
    case (b: java.lang.Boolean, BooleanType) => b.booleanValue()
    case (bb: java.nio.ByteBuffer, BinaryType) =>
      val a = new Array[Byte](bb.remaining()); bb.duplicate().get(a); a
    case (other, t) => throw new IllegalArgumentException(
      s"Avro source: cannot convert ${other.getClass.getSimpleName} to $t")
  }

  /** Distributed read of every .avro container file under `dir` with a
    * declared schema (fields matched by name; absent fields → null). */
  def read(spark: SparkSession, dir: String, schema: StructType): DataFrame = {
    val fields = schema.fields.map(f => (f.name, f.dataType))
    val rdd = spark.sparkContext.binaryFiles(s"$dir/*.avro").flatMap { case (_, pds) =>
      val in = pds.open()
      val reader = new DataFileStream[GenericRecord](in, new GenericDatumReader[GenericRecord]())
      val buf = mutable.ArrayBuffer[Row]()
      try {
        while (reader.hasNext) {
          val rec = reader.next()
          buf += Row.fromSeq(fields.toSeq.map { case (n, dt) =>
            val raw = if (rec.getSchema.getField(n) == null) null else rec.get(n)
            convert(raw, dt)
          })
        }
      } finally { reader.close(); in.close() }
      buf
    }
    spark.createDataFrame(rdd, schema)
  }
}
