package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.StreamOps

case class Ev(event_id: Long, ts: Timestamp, event_type: String, value: Double)

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def t(s: String) = Timestamp.valueOf(s)

  test("hourlyEventCounts over a MemoryStream matches the batch result") {
    implicit val sqlCtx = spark.sqlContext
    val data = Seq(
      Ev(1, t("2024-01-01 10:05:00"), "click", 1.0),
      Ev(2, t("2024-01-01 10:55:00"), "click", 2.0),
      Ev(3, t("2024-01-01 11:10:00"), "view", 3.0),
      Ev(4, t("2024-01-01 12:01:00"), "click", 4.0))
    val stream = MemoryStream[Ev]
    stream.addData(data: _*)
    val q = StreamOps.hourlyEventCounts(stream.toDF())
      .writeStream.format("memory").queryName("hourly")
      .outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("hourly")
      .orderBy("hour", "event_type")
      .collect().map(r => (r.getTimestamp(0).toString, r.getString(1), r.getLong(2), r.getDouble(3)))
    val batch = StreamOps.hourlyEventCounts(data.toDF())
      .orderBy("hour", "event_type")
      .collect().map(r => (r.getTimestamp(0).toString, r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(streamed.toSeq == batch.toSeq)
    assert(streamed.toSeq == Seq(
      ("2024-01-01 10:00:00.0", "click", 2L, 3.0),
      ("2024-01-01 11:00:00.0", "view", 1L, 3.0),
      ("2024-01-01 12:00:00.0", "click", 1L, 4.0)))
  }

  test("dedupEvents drops in-watermark duplicate ids on a stream") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Ev]
    stream.addData(
      Ev(1, t("2024-01-01 10:00:00"), "click", 1.0),
      Ev(1, t("2024-01-01 10:00:30"), "click", 1.0), // dup id within watermark
      Ev(2, t("2024-01-01 10:01:00"), "view", 2.0))
    val q = StreamOps.dedupEvents(stream.toDF())
      .writeStream.format("memory").queryName("dedup")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    assert(spark.table("dedup").select("event_id").as[Long].collect().sorted.toSeq == Seq(1L, 2L))
  }
}
