package graft.ops

import java.nio.file.Files
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Source-format round-trips (SURVEY.md §2.1 family) beyond parquet/CSV:
  * JSON lines, ORC, and raw text lines — each written from a harness table,
  * read back with an EXPLICIT schema (never inference, SURVEY.md §1.4), and
  * aggregated so the oracle can check the result against the original
  * parquet. Lossless round-trip ⇒ identical aggregates.
  *
  * Environment note: spark-avro's datasource jar is absent from
  * /opt/spark/jars (only core avro-*), so Avro joins Excel as a documented
  * environment gap — the read/write call shape would be identical to ORC.
  */
object SourceOps {

  /** JSON-lines round-trip: the interchange format of most LLM-data-pipeline
    * corpora. Jackson prints doubles in shortest round-trip form, so the
    * re-read values are bit-identical and the aggregate hash-matches. */
  def jsonRoundtrip(spark: SparkSession, sf: String): DataFrame = {
    val tmp = Files.createTempDirectory("graft_json").toString
    val src = EventOps.events(spark, sf).select("event_id", "event_type", "value")
    src.coalesce(1).write.mode("overwrite").json(tmp)
    spark.read.schema(src.schema).json(tmp)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), round(sum("value"), 4).as("sum_value"))
      .orderBy("event_type")
  }

  /** ORC round-trip — the other columnar format Spark ships natively. */
  def orcRoundtrip(spark: SparkSession, sf: String): DataFrame = {
    val tmp = Files.createTempDirectory("graft_orc").toString
    val src = Tables.load(spark, sf, "customer")
      .select("c_custkey", "c_name", "c_acctbal")
    src.coalesce(1).write.mode("overwrite").orc(tmp)
    spark.read.schema(src.schema).orc(tmp)
      .orderBy("c_custkey")
  }

  /** Raw text-line source — how an LLM pipeline ingests an unstructured
    * corpus (one document per line; the fixture texts contain no newlines,
    * verified). Aggregate so row order through the file round-trip is
    * irrelevant. */
  def textSource(spark: SparkSession, sf: String): DataFrame = {
    val tmp = Files.createTempDirectory("graft_text").toString
    Tables.load(spark, sf, "documents").select("text")
      .coalesce(1).write.mode("overwrite").text(tmp)
    spark.read.text(tmp)
      .agg(
        count(lit(1)).as("n_lines"),
        sum(length(col("value"))).cast("long").as("total_chars"))
  }
}
