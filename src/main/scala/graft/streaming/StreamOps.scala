package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Structured Streaming forms of the batch event operators (SURVEY.md §2.10).
  *
  * The reference has no stream processing — its only "incremental" behavior is
  * Streamlit's rerun-over-cached-snapshot loop (`app_test.py:36,67`) — but the
  * engine's `events` surface generalizes to streams for free: the SAME
  * transform runs on a batch DataFrame and on a `readStream` DataFrame
  * (`withWatermark` is a no-op in batch). At scale: watermarked state keeps
  * the agg incremental; state store size is bounded by (windows in flight ×
  * group cardinality), not input size.
  */
object StreamOps {

  /** Tumbling 1-hour windowed counts + sums with a 1-hour watermark — the
    * streaming twin of EventOps.timeBucket (identical results in batch). */
  def hourlyEventCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 4).as("sum_value"))
      .select(col("window.start").as("hour"), col("event_type"), col("n"), col("sum_value"))

  /** Exact dedup on a stream: state-bounded via the watermark (an event id
    * must recur within 1 hour to be caught — the streaming contract for the
    * batch TextOps.dedupExact capability). */
  def dedupEvents(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("event_id")
}
