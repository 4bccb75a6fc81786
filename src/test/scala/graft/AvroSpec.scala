package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.sources.Avro

/** The thin distributed Avro container source/sink over bundled avro-core
  * (SURVEY §2.1 — the former spark-avro packaging gap). */
class AvroSpec extends SparkSpec {
  import spark.implicits._

  test("write -> read round-trip: all supported primitives, nulls, multiple part files") {
    val dir = java.nio.file.Files.createTempDirectory("graft_avro").toString
    val df = Seq(
      (1L, Some("alpha"), Some(1.5), true),
      (2L, None, Some(-2.25e10), false),
      (3L, Some("uni 独角 & <x>"), None, true))
      .toDF("id", "name", "score", "flag")
      .repartition(2) // > 1 container file; the reader must union them
    Avro.write(df, dir)
    assert(new java.io.File(dir).listFiles().count(_.getName.endsWith(".avro")) == 2)
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType),
      StructField("score", DoubleType), StructField("flag", BooleanType)))
    val got = Avro.read(spark, dir, schema).orderBy("id").collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) null else r.getString(1),
        if (r.isNullAt(2)) null else r.getDouble(2),
        r.getBoolean(3)))
    assert(got.toSeq == Seq(
      (1L, "alpha", 1.5, true),
      (2L, null, -2.25e10, false),
      (3L, "uni 独角 & <x>", null, true)))
  }

  test("declared schema may carry fields the file lacks: they read as null") {
    val dir = java.nio.file.Files.createTempDirectory("graft_avro_evo").toString
    Avro.write(Seq((7L, "x")).toDF("id", "name"), dir)
    val wider = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType),
      StructField("added_later", DoubleType)))
    val r = Avro.read(spark, dir, wider).collect()
    assert(r.length == 1 && r.head.getLong(0) == 7L && r.head.isNullAt(2))
  }

  test("unsupported (nested) types are rejected loudly at write time") {
    val df = Seq((1L, Seq(1, 2))).toDF("id", "xs")
    val e = intercept[IllegalArgumentException] {
      Avro.write(df, java.nio.file.Files.createTempDirectory("graft_avro_bad").toString)
    }
    assert(e.getMessage.contains("unsupported type"))
  }

  test("avroRoundtrip query equals the direct parquet aggregate") {
    val got = graft.ops.SourceOps.avroRoundtrip(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val want = graft.sources.Tables.load(spark, sf0001, "orders")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_orders"), round(sum("o_totalprice"), 4).as("revenue"))
      .orderBy("o_orderpriority").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq == want.toSeq && got.nonEmpty)
  }
}
