package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Event-stream batch operators (SURVEY.md §2.9 X5, §2.10 X6) over the
  * `events` table (`ts, user_id, event_type, value, props`).
  *
  * Scale notes: at 100 TB `events` is partitioned by `date_trunc('day', ts)`
  * so time-bucket queries prune partitions; both queries below are single
  * scan→agg shapes with map-side partial aggregation.
  */
object EventOps {

  /** The harness `events.ts` is parquet TIMESTAMP(NANOS), which Spark 4
    * rejects outright (PARQUET_TYPE_ILLEGAL). Read nanos as raw longs and
    * convert with integer division (`div`, not `/` — double division loses
    * precision above 2^53 and ~1.7e18 ns is well past it), then
    * `timestamp_micros`. Session TZ is pinned UTC so wall-clock formatting
    * matches DuckDB's naive TIMESTAMP_NS reading. */
  def events(spark: SparkSession, sf: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    Tables.load(spark, sf, "events")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }

  /** JSON field extraction — `get_json_object` over the `props` JSON column,
    * aggregated per event type. Models semi-structured payload analytics the
    * reference's flat Mongo projection sidesteps (`app_test.py:38-52`). */
  def jsonExtract(spark: SparkSession, sf: String): DataFrame =
    events(spark, sf)
      .select(
        col("event_type"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n"),
        round(avg("k"), 4).as("avg_k"))
      .orderBy("event_type")

  /** Time bucketing — tumbling 1-hour window as a batch aggregate
    * (SURVEY.md §2.10): `date_trunc('hour', ts)` ≡ `window($"ts","1 hour")`,
    * the same physical agg Structured Streaming runs incrementally. The
    * bucket is emitted as a formatted string so the hash-compare is immune
    * to timestamp-encoding differences between engines. */
  def timeBucket(spark: SparkSession, sf: String): DataFrame =
    events(spark, sf)
      .groupBy(date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm:ss").as("hour"))
      .agg(
        count(lit(1)).as("n"),
        round(sum("value"), 4).as("sum_value"))
      .orderBy("hour")
}
