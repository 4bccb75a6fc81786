package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.{StreamOps, UserSession}

case class Ev(event_id: Long, ts: Timestamp, event_type: String, value: Double)
case class EvU(event_id: Long, user_id: Long, ts: Timestamp, value: Double)
case class FeedRow(key: Long, op: String, old_bal: Option[Double], new_bal: Option[Double])

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

  test("sessionWindowCounts merges gap-windows on a stream and matches batch") {
    implicit val sqlCtx = spark.sqlContext
    // user 1: two events 10 min apart (one session), then one 2h later
    // (second session); user 2: a single event. The 13:30 event advances
    // the watermark past 10:00-session-end + 1h so both early sessions emit.
    val data = Seq(
      EvU(1, 1L, t("2024-01-01 09:00:00"), 1.0),
      EvU(2, 1L, t("2024-01-01 09:10:00"), 1.0),
      EvU(3, 2L, t("2024-01-01 09:05:00"), 1.0),
      EvU(4, 1L, t("2024-01-01 11:30:00"), 1.0),
      EvU(5, 1L, t("2024-01-01 13:30:00"), 1.0))
    val stream = MemoryStream[EvU]
    val q = StreamOps.sessionWindowCounts(stream.toDF())
      .writeStream.format("memory").queryName("sesswin")
      .outputMode("append").start()
    try {
      stream.addData(data.take(3): _*)
      q.processAllAvailable()
      stream.addData(data.drop(3): _*)
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("sesswin")
      .orderBy("user_id", "session_start")
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).toString, r.getLong(3))).toSeq
    // append mode emits only watermark-closed sessions: the 13:30 event
    // moves the watermark to 12:30, closing both 09:xx sessions AND the
    // 11:30 one (its end = 11:30 + 1h gap = 12:30, right at the watermark);
    // only the 13:30 session stays open
    assert(streamed == Seq(
      (1L, "2024-01-01 09:00:00.0", 2L),
      (1L, "2024-01-01 11:30:00.0", 1L),
      (2L, "2024-01-01 09:05:00.0", 1L)), streamed.mkString(","))
    // the SAME expression in batch computes the full gap-split
    val batch = StreamOps.sessionWindowCounts(data.toDF())
      .orderBy("user_id", "session_start").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).toString, r.getLong(3))).toSeq
    assert(batch == Seq(
      (1L, "2024-01-01 09:00:00.0", 2L),
      (1L, "2024-01-01 11:30:00.0", 1L),
      (1L, "2024-01-01 13:30:00.0", 1L),
      (2L, "2024-01-01 09:05:00.0", 1L)), batch.mkString(","))
  }

  test("sessionWindowCounts watermark delay defaults to the gap (ADVICE)") {
    // a 3h gap with the old fixed 1h watermark would drop in-gap events
    // older than 1h in streaming while batch keeps them — the delay must
    // track the gap unless the caller overrides it explicitly
    import org.apache.spark.sql.catalyst.plans.logical.EventTimeWatermark
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[EvU]
    def delayMicros(df: org.apache.spark.sql.DataFrame): Long =
      df.queryExecution.analyzed.collectFirst {
        case e: EventTimeWatermark => e.delay.microseconds
      }.get
    assert(delayMicros(StreamOps.sessionWindowCounts(stream.toDF(), gap = "3 hours"))
      == 3L * 3600 * 1000000)
    assert(delayMicros(StreamOps.sessionWindowCounts(stream.toDF(), gap = "3 hours",
      delay = Some("30 minutes"))) == 30L * 60 * 1000000)
  }

  test("sessionize closes sessions across micro-batches with persisted state") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val stream = MemoryStream[(Long, Timestamp)]
    val q = StreamOps.sessionize(stream.toDS(), gapMs = 30 * 60 * 1000L)
      .writeStream.format("memory").queryName("sessions")
      .outputMode("append").start()
    try {
      // batch 1: user 1 has two close events (one open session)
      stream.addData((1L, t("2024-01-01 10:00:00")), (1L, t("2024-01-01 10:10:00")))
      q.processAllAvailable()
      assert(spark.table("sessions").count() == 0) // nothing closed yet
      // batch 2: a later event beyond the gap closes the first session —
      // proving the (start,last,n) state survived the batch boundary
      stream.addData((1L, t("2024-01-01 12:00:00")))
      q.processAllAvailable()
      val s = spark.table("sessions").as[UserSession].collect()
      assert(s.length == 1)
      assert(s.head == UserSession(1L, t("2024-01-01 10:00:00"),
        t("2024-01-01 10:10:00"), 2L))
    } finally q.stop()
  }

  test("sessionize emits a too-late straggler as its own session, never stitching") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val stream = MemoryStream[(Long, Timestamp)]
    val q = StreamOps.sessionize(stream.toDS(), gapMs = 30 * 60 * 1000L)
      .writeStream.format("memory").queryName("sessions_straggler")
      .outputMode("append").start()
    try {
      stream.addData((1L, t("2024-01-01 10:00:00")))
      q.processAllAvailable()
      // 9:05 is within the 1h watermark tolerance but > gap before the open
      // session's start: absorbing it would make one session spanning a
      // 55-minute hole (> gap). It must close as a singleton instead.
      stream.addData((1L, t("2024-01-01 09:05:00")))
      q.processAllAvailable()
      val s = spark.table("sessions_straggler").as[UserSession].collect()
      assert(s.toSeq == Seq(UserSession(1L, t("2024-01-01 09:05:00"),
        t("2024-01-01 09:05:00"), 1L)), s.toSeq.toString)
    } finally q.stop()
  }

  test("sessionize flushes the trailing open session once the watermark passes") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val stream = MemoryStream[(Long, Timestamp)]
    val q = StreamOps.sessionize(stream.toDS(), gapMs = 30 * 60 * 1000L)
      .writeStream.format("memory").queryName("sessions_flush")
      .outputMode("append").start()
    try {
      stream.addData((1L, t("2024-01-01 10:00:00")), (1L, t("2024-01-01 10:10:00")))
      q.processAllAvailable()
      assert(spark.table("sessions_flush").count() == 0) // open, not flushed
      // watermark only advances at batch boundaries: batch 2 (another user's
      // event at 12:00) sets wm=12:00 for batch 3; batch 3's timeout check
      // then sees user 1's horizon 10:40 < wm and flushes the open session
      stream.addData((2L, t("2024-01-01 12:00:00")))
      q.processAllAvailable()
      stream.addData((2L, t("2024-01-01 12:01:00")))
      q.processAllAvailable()
      val s = spark.table("sessions_flush").as[UserSession].collect()
      assert(s.contains(UserSession(1L, t("2024-01-01 10:00:00"),
        t("2024-01-01 10:10:00"), 2L)), s"trailing session not flushed: ${s.toSeq}")
    } finally q.stop()
  }

  test("enrichStream joins each micro-batch against a broadcast static dim") {
    implicit val sqlCtx = spark.sqlContext
    val dim = Seq((10L, "BUILDING"), (20L, "MACHINERY"))
      .toDF("c_custkey", "c_mktsegment")
    val stream = MemoryStream[EvU]
    stream.addData(
      EvU(1, 10L, t("2024-01-01 10:00:00"), 1.5),
      EvU(2, 20L, t("2024-01-01 10:01:00"), 2.5),
      EvU(3, 99L, t("2024-01-01 10:02:00"), 3.5)) // no dim row → dropped
    val q = StreamOps.enrichStream(stream.toDF(), dim)
      .writeStream.format("memory").queryName("enriched")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val rows = spark.table("enriched").orderBy("event_id")
      .collect().map(r => (r.getLong(0), r.getString(3)))
    assert(rows.toSeq == Seq((1L, "BUILDING"), (2L, "MACHINERY")))
  }

  test("foreachBatchMerge: append-log upsert collapses to latest per key") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_merge").toString
    val stream = MemoryStream[EvU]
    val q = StreamOps.foreachBatchMerge(stream.toDF(), s"$dir/log", s"$dir/ckpt")
    try {
      stream.addData(
        EvU(1, 10L, t("2024-01-01 10:00:00"), 1.0),
        EvU(2, 10L, t("2024-01-01 10:30:00"), 2.0), // later → wins batch 1
        EvU(3, 20L, t("2024-01-01 10:10:00"), 5.0))
      q.processAllAvailable()
      // batch 2 updates user 10, leaves user 20 untouched
      stream.addData(EvU(4, 10L, t("2024-01-01 11:00:00"), 9.0))
      q.processAllAvailable()
    } finally q.stop()
    val state = StreamOps.latestState(spark, s"$dir/log")
      .orderBy("user_id")
      .collect().map(r => (r.getLong(0), r.getDouble(2)))
    assert(state.toSeq == Seq((10L, 9.0), (20L, 5.0)))
    // the log keeps history (one row per key per batch that saw it)
    assert(spark.read.parquet(s"$dir/log").count() == 3)
  }

  test("mvDeltaSink: streamed delta log refreshes the MV to the batch answer") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_mv").toString
    // old snapshot: keys 1..6, bal = key * 10; buckets = key % 20
    val oldRows = (1L to 6L).map(k => (k, k * 10.0))
    val old = oldRows.toDF("key", "bal")
    val stream = MemoryStream[FeedRow]
    val q = graft.streaming.StreamOps.mvDeltaSink(
      stream.toDF(), s"$dir/log", s"$dir/ckpt")
    try {
      // batch 1: update key 2 (20 -> 25), delete key 3
      stream.addData(
        FeedRow(2L, "U", Some(20.0), Some(25.0)),
        FeedRow(3L, "D", Some(30.0), None))
      q.processAllAvailable()
      // batch 2: insert key 7, update key 2 again (25 -> 28)
      stream.addData(
        FeedRow(7L, "I", None, Some(70.0)),
        FeedRow(2L, "U", Some(25.0), Some(28.0)))
      q.processAllAvailable()
    } finally q.stop()
    val got = graft.streaming.StreamOps.mvState(
      spark, graft.ops.Relational.mvOf(old), s"$dir/log")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // the final state the feed describes: keys 1,2(28),4,5,6,7(70)
    val finalRows = Seq((1L, 10.0), (2L, 28.0), (4L, 40.0), (5L, 50.0),
      (6L, 60.0), (7L, 70.0))
    val want = finalRows.toDF("key", "bal")
      .groupBy((col("key") % 20).as("bucket"))
      .agg(count(lit(1)).as("n"), round(sum("bal"), 2).as("sum_bal"))
      .orderBy("bucket")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq == want.toSeq)
    // delta log is append-only partials: one row per touched bucket per batch
    assert(spark.read.parquet(s"$dir/log").count() == 4)
    // zero-delta refresh: a log dir that was never written returns the base
    // MV through the same output contract, not an AnalysisException
    val fresh = graft.streaming.StreamOps.mvState(
      spark, graft.ops.Relational.mvOf(old), s"$dir/never_written")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val base = oldRows.toDF("key", "bal")
      .groupBy((col("key") % 20).as("bucket"))
      .agg(count(lit(1)).as("n"), round(sum("bal"), 2).as("sum_bal"))
      .orderBy("bucket")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(fresh.toSeq == base.toSeq)
  }

  test("batch sessionize splits on >1h gaps (window-lag form)") {
    val rows = graft.ops.EventOps.sessionize(spark, sf0001).collect()
    assert(rows.nonEmpty)
    // session invariants: starts ordered per user, n_events >= 1
    rows.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      val nos = rs.map(_.getLong(1)).sorted
      assert(nos.head == 1L && nos.zipWithIndex.forall { case (n, i) => n == i + 1 })
      rs.foreach(r => assert(r.getLong(4) >= 1L))
    }
  }

  test("stream-stream interval join attributes purchases to prior-hour clicks") {
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[Ev]
    val purchases = MemoryStream[Ev]
    clicks.addData(
      Ev(1, t("2024-01-01 09:30:00"), "click", 0.0),  // in window for p1
      Ev(2, t("2024-01-01 07:00:00"), "click", 0.0),  // too old for p2
      Ev(3, t("2024-01-01 09:50:00"), "click", 0.0))  // wrong user
    purchases.addData(
      Ev(10, t("2024-01-01 10:00:00"), "purchase", 99.0).copy(event_id = 10),
      Ev(11, t("2024-01-01 10:00:00"), "purchase", 5.0).copy(event_id = 11))
    // rename: Ev has no user column; reuse event_id as user_id via select
    def withUser(df: org.apache.spark.sql.DataFrame, users: Map[Long, Long]) = {
      val mapping = typedLit(users)
      df.select(element_at(mapping, col("event_id")).as("user_id"),
        col("ts"), col("value"))
    }
    val c = withUser(clicks.toDF(), Map(1L -> 100L, 2L -> 200L, 3L -> 300L))
    val p = withUser(purchases.toDF(), Map(10L -> 100L, 11L -> 200L))
    val q = StreamOps.purchaseAttribution(c, p)
      .writeStream.format("memory").queryName("attr")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val rows = spark.table("attr").collect()
    assert(rows.length == 1) // only user 100's click is within the hour
    assert(rows.head.getLong(0) == 100L)
    assert(rows.head.getDouble(3) == 99.0)
  }

  test("streamAttrib: the drained two-source file stream equals the batch interval join") {
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getString(1), r.getString(2), r.getDouble(3))
    val out = StreamOps.streamAttrib(spark, sf0001).collect().map(key).toSet
    val ev = graft.ops.EventOps.events(spark, sf0001)
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts").as("pts"), col("value"))
    val c = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("cu"), col("ts").as("cts"))
    val batch = p.join(c, col("user_id") === col("cu") &&
        col("cts") >= col("pts") - expr("INTERVAL 1 HOUR") &&
        col("cts") <= col("pts"))
      .select(col("user_id"),
        date_format(col("pts"), "yyyy-MM-dd HH:mm:ss"),
        date_format(col("cts"), "yyyy-MM-dd HH:mm:ss"),
        round(col("value"), 4))
      .collect().map(key).toSet
    assert(out == batch, s"stream ${out.size} vs batch ${batch.size}")
    assert(out.nonEmpty)
    // the run dir is cleaned up: no stream_attrib_ staging survives
    val left = java.nio.file.Files.list(java.nio.file.Paths.get("target", "tmp"))
      .iterator()
    val leftover = new scala.collection.mutable.ArrayBuffer[String]
    while (left.hasNext) { val p2 = left.next()
      if (p2.getFileName.toString.startsWith("stream_attrib_")) leftover += p2.toString }
    assert(leftover.isEmpty, s"staging left behind: $leftover")
  }

  test("streamAttribOuter: watermark-evicted null rows equal the batch anti-join below the boundary") {
    val out = StreamOps.streamAttribOuter(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    val ev = graft.ops.EventOps.events(spark, sf0001)
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts").as("pts"), col("value"))
    val c = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("cu"), col("ts").as("cts"))
    val wm = p.agg(max("pts")).head().getTimestamp(0).getTime
      .min(c.agg(max("cts")).head().getTimestamp(0).getTime) - 3600 * 1000L
    val joined = p.join(c, col("user_id") === col("cu") &&
        col("cts") >= col("pts") - expr("INTERVAL 1 HOUR") &&
        col("cts") <= col("pts"), "left_outer")
    val matched = joined.filter(col("cts").isNotNull)
      .groupBy("user_id").agg(count(lit(1)).as("n_matched"))
    val expired = joined.filter(col("cts").isNull &&
        col("pts") < lit(new java.sql.Timestamp(wm)))
      .groupBy(col("user_id").as("uu"))
      .agg(count(lit(1)).as("n_expired"),
        round(sum("value"), 4).as("value_at_risk"))
    val batch = matched.join(expired, col("user_id") === col("uu"), "full_outer")
      .select(coalesce(col("user_id"), col("uu")),
        coalesce(col("n_matched"), lit(0L)),
        coalesce(col("n_expired"), lit(0L)),
        coalesce(col("value_at_risk"), lit(0.0)))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    assert(out == batch, s"stream ${out.size} vs batch ${batch.size}")
    // the outer half must be non-vacuous: nulls really were emitted
    assert(out.exists(_._3 > 0), "no watermark-evicted outer rows emitted")
  }

  test("streamDedup: planted duplicates flow through the stream and are removed") {
    val out = StreamOps.streamDedup(spark, sf0001).collect()
    val batch = graft.ops.EventOps.events(spark, sf0001)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), countDistinct(col("user_id")).as("u"),
        round(sum("value"), 4).as("v"))
      .orderBy("event_type").collect()
    assert(out.length == batch.length && out.nonEmpty)
    out.zip(batch).foreach { case (o, b) =>
      assert(o.getString(0) == b.getString(0))
      assert(o.getLong(1) == b.getLong(1), s"n_events for ${o.getString(0)}")
      assert(o.getLong(2) == b.getLong(2), s"n_users for ${o.getString(0)}")
      assert(o.getDouble(3) == b.getDouble(3), s"total_value for ${o.getString(0)}")
    }
    // the staged input really contains duplicates: purchases appear twice,
    // so WITHOUT the stateful dedup the purchase count would be inflated
    val staged = spark.read.parquet(
      graft.ops.SourceOps.materialize(s"stream_dedup_in_$sf0001")(_ => ()) + "/in")
    val purchases = batch.find(_.getString(0) == "purchase").get.getLong(1)
    assert(staged.filter(col("event_type") === "purchase").count() == 2 * purchases,
      "staging must plant each purchase twice")
  }

  test("streamWindow: drained windowed agg equals the batch agg on watermark-closed windows") {
    val out = StreamOps.streamWindow(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSeq
    val ev = graft.ops.EventOps.events(spark, sf0001)
    val mx = ev.agg(max(col("ts"))).head().getTimestamp(0)
    val batch = ev
      .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 4).as("sum_value"))
      .filter(col("hour") + expr("INTERVAL 1 HOUR") <= lit(mx) - expr("INTERVAL 1 HOUR"))
      .select(date_format(col("hour"), "yyyy-MM-dd HH:mm:ss").as("hour"),
        col("event_type"), col("n"), col("sum_value"))
      .orderBy("hour", "event_type").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(out.nonEmpty, "the drained sink must contain closed windows")
    assert(out == batch, s"stream ${out.size} rows vs batch ${batch.size}")
  }

  test("streamUpdate: dashboard final state equals the batch aggregate and the drain is genuinely multi-update") {
    // drive the update-mode pipeline at spec scale with 1-file triggers so
    // keys are provably touched across SEVERAL micro-batches — then (a) the
    // upsert log must hold more rows than final keys (update semantics, not
    // a disguised single append) and (b) the latest update per key must
    // equal the batch aggregate (the batching-independence claim)
    val dir = java.nio.file.Files.createTempDirectory("graft_update_spec").toString
    val ev = graft.ops.EventOps.events(spark, sf0001)
      .select(col("event_id"), col("ts"), col("event_type"), col("value"))
    ev.repartition(4).write.parquet(s"$dir/in")
    val stream = spark.readStream.schema(ev.schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$dir/in")
    val q = StreamOps.dailyDashboard(stream).writeStream
      .outputMode("update")
      .option("checkpointLocation", s"$dir/ckpt")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
        batch.withColumn("batch_id", lit(batchId))
          .write.mode("append").parquet(s"$dir/log")
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val log = spark.read.parquet(s"$dir/log")
    val finalState = StreamOps.dashboardFinalState(log).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))).toSeq
    assert(log.count() > finalState.size,
      "every key updated only once — the drain never exercised update mode")
    val batchAgg = StreamOps.dailyDashboard(ev)
      .select(date_format(col("day"), "yyyy-MM-dd").as("day"),
        col("event_type"), col("n"), col("sum_cents"))
      .orderBy("day", "event_type").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))).toSeq
    assert(finalState.nonEmpty && finalState == batchAgg,
      s"final upsert state ${finalState.size} rows vs batch ${batchAgg.size}")
  }

  test("checkpointed parquet sink with AvailableNow drains the stream exactly once") {
    implicit val sqlCtx = spark.sqlContext
    val out = java.nio.file.Files.createTempDirectory("graft_sink").toString
    val cp = java.nio.file.Files.createTempDirectory("graft_cp").toString
    val stream = MemoryStream[Ev]
    stream.addData(
      Ev(1, t("2024-01-01 10:00:00"), "click", 1.0),
      Ev(2, t("2024-01-01 10:01:00"), "view", 2.0))
    val q = stream.toDF().writeStream
      .format("parquet").option("path", out)
      .option("checkpointLocation", cp)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)
    assert(spark.read.parquet(out).count() == 2)
    // restart with NO new data: the checkpoint prevents reprocessing
    val q2 = stream.toDF().writeStream
      .format("parquet").option("path", out)
      .option("checkpointLocation", cp)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q2.awaitTermination(60000)
    assert(spark.read.parquet(out).count() == 2, "checkpoint must prevent duplicates")
  }

  /** Stage `rows` as ONE parquet file named `name` inside the watched dir,
    * with a controlled mtime (the file source's processing order). */
  private def stageFile[T <: Product : org.apache.spark.sql.Encoder](
      rows: Seq[T], dir: String, name: String, mtime: Long): Unit = {
    val tmp = java.nio.file.Files.createTempDirectory("graft_stage").toString
    rows.toDF().coalesce(1).write.mode("overwrite").parquet(tmp)
    val part = new java.io.File(tmp).listFiles().filter(_.getName.startsWith("part-")).head
    val dest = java.nio.file.Paths.get(dir, name)
    java.nio.file.Files.copy(part.toPath, dest)
    dest.toFile.setLastModified(mtime)
    import scala.jdk.CollectionConverters._
    java.nio.file.Files.walk(java.nio.file.Paths.get(tmp)).iterator().asScala
      .toSeq.reverse.foreach(p => java.nio.file.Files.deleteIfExists(p))
  }

  test("checkpoint restart: stateful windowed agg resumes mid-drain with identical output") {
    // VERDICT r9 #3 — the gap between "drained end to end" and production
    // streaming: stop AFTER batch N, resume from the checkpoint, and the
    // final sink must equal an uninterrupted drain's. The planted data makes
    // the restart carry REAL state: window 11:00 holds two events when run 1
    // stops and is only closed (and emitted) by run 2's data, so the output
    // row for it is correct ONLY if the state store and watermark survive
    // the restart.
    // Watermark arithmetic: wm = max event time − 1 h; append emits a
    // window once wm ≥ its END. After run 1 (files A+B) wm = 11:10, so
    // exactly the 10:00 windows (end 11:00) are emitted and window 11:00
    // holds the 11:10 click in STATE. Run 2's 11:45 click lands in that
    // same (window, type) group, and 14:00 pushes wm to 13:00, closing
    // 11:00 and 12:00 — so the (11:00, click, n=2, sum=8.0) row is correct
    // only if run 2 recovered run 1's state AND watermark.
    val fileA = Seq(
      Ev(1, t("2024-01-01 10:05:00"), "click", 1.0),
      Ev(2, t("2024-01-01 10:20:00"), "view", 2.0))
    val fileB = Seq(
      Ev(3, t("2024-01-01 11:10:00"), "click", 3.0),
      Ev(4, t("2024-01-01 12:10:00"), "click", 4.0))
    val fileC = Seq(
      Ev(5, t("2024-01-01 11:45:00"), "click", 5.0),
      Ev(6, t("2024-01-01 14:00:00"), "click", 6.0)) // advances wm to 13:00; stays open itself
    val schema = fileA.toDF().schema
    def drain(in: String, out: String, cp: String): Unit = {
      val q = StreamOps.hourlyEventCounts(
          spark.readStream.schema(schema).option("maxFilesPerTrigger", "1").parquet(in))
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", cp)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    def sinkRows(out: String) = spark.read.parquet(out)
      .collect().map(r => (r.getTimestamp(0).toString, r.getString(1), r.getLong(2), r.getDouble(3)))
      .toSeq.sorted
    // interrupted path: drain A+B, STOP, add C, resume from the same checkpoint
    val in1 = java.nio.file.Files.createTempDirectory("graft_rst_in1").toString
    val out1 = java.nio.file.Files.createTempDirectory("graft_rst_out1").toString
    val cp1 = java.nio.file.Files.createTempDirectory("graft_rst_cp1").toString
    stageFile(fileA, in1, "f0.parquet", 1700000000000L)
    stageFile(fileB, in1, "f1.parquet", 1700000060000L)
    drain(in1, out1, cp1) // run 1 ends: window 10:00 emitted, 11:00 open in state
    val afterRun1 = sinkRows(out1)
    assert(afterRun1.map(x => (x._1, x._2)).toSet ==
      Set(("2024-01-01 10:00:00.0", "click"), ("2024-01-01 10:00:00.0", "view")),
      s"run 1 should have emitted exactly the closed 10:00 windows: $afterRun1")
    stageFile(fileC, in1, "f2.parquet", 1700000120000L)
    drain(in1, out1, cp1) // run 2: resumes, closes 11:00 with state from BOTH runs
    // uninterrupted reference: same files, one drain
    val in2 = java.nio.file.Files.createTempDirectory("graft_rst_in2").toString
    val out2 = java.nio.file.Files.createTempDirectory("graft_rst_out2").toString
    val cp2 = java.nio.file.Files.createTempDirectory("graft_rst_cp2").toString
    stageFile(fileA, in2, "f0.parquet", 1700000000000L)
    stageFile(fileB, in2, "f1.parquet", 1700000060000L)
    stageFile(fileC, in2, "f2.parquet", 1700000120000L)
    drain(in2, out2, cp2)
    val finalRows = sinkRows(out1)
    assert(finalRows == sinkRows(out2),
      "restarted drain must equal the uninterrupted drain")
    assert(finalRows == Seq(
      ("2024-01-01 10:00:00.0", "click", 1L, 1.0),
      ("2024-01-01 10:00:00.0", "view", 1L, 2.0),
      ("2024-01-01 11:00:00.0", "click", 2L, 8.0), // run-1 state + run-2 event
      ("2024-01-01 12:00:00.0", "click", 1L, 4.0)), finalRows.toString)
  }

  test("checkpoint restart: a batch crashing after its write replays and compaction stays exact") {
    // The write-succeeded-commit-lost crash window: batch 2's foreachBatch
    // body appends its rows to the log and THEN dies, so the checkpoint
    // never commits it. On restart Spark re-runs batch 2 (same batchId,
    // same data — the file source's offset log pins the slice), the log
    // gains duplicate rows for it, and latestState's (ts, batch_id) argmax
    // collapses them — the exactly-once contract the scaladoc promises,
    // here exercised through a REAL crash + restart instead of prose.
    val files = Seq(
      Seq(EvU(1, 1L, t("2024-01-01 10:00:00"), 10.0), EvU(2, 2L, t("2024-01-01 10:01:00"), 20.0)),
      Seq(EvU(3, 1L, t("2024-01-01 11:00:00"), 11.0)),
      Seq(EvU(4, 2L, t("2024-01-01 12:00:00"), 22.0), EvU(5, 3L, t("2024-01-01 12:01:00"), 30.0)),
      Seq(EvU(6, 1L, t("2024-01-01 13:00:00"), 13.0)))
    val in = java.nio.file.Files.createTempDirectory("graft_crash_in").toString
    val log = java.nio.file.Files.createTempDirectory("graft_crash_log").toString
    val cp = java.nio.file.Files.createTempDirectory("graft_crash_cp").toString
    files.zipWithIndex.foreach { case (rows, i) =>
      stageFile(rows, in, s"f$i.parquet", 1700000000000L + i * 60000L)
    }
    val schema = files.head.toDF().schema
    @volatile var crashOnce = true
    def run(): org.apache.spark.sql.streaming.StreamingQuery =
      spark.readStream.schema(schema).option("maxFilesPerTrigger", "1").parquet(in)
        .writeStream.option("checkpointLocation", cp)
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
          StreamOps.mergeBatch(batch, batchId, log)
          if (batchId == 2 && crashOnce) {
            crashOnce = false
            throw new RuntimeException("injected crash after write, before commit")
          }
        }
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
    val failed = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      run().awaitTermination()
    }
    def messages(e: Throwable): Seq[String] =
      if (e == null) Nil else Option(e.getMessage).toSeq ++ messages(e.getCause)
    assert(messages(failed).exists(_.contains("injected crash")), messages(failed).toString)
    assert(!crashOnce, "the injected crash must actually have fired")
    run().awaitTermination() // resume: re-runs batch 2, then batch 3
    val logRows = spark.read.parquet(log)
    // the crash path was genuinely exercised: batch 2's rows appear TWICE
    assert(logRows.filter(col("batch_id") === 2).count() == 4,
      "expected the failed attempt AND the replay of batch 2 in the log")
    val compacted = StreamOps.latestState(spark, log)
      .collect().map(r => (r.getLong(0), r.getTimestamp(1).toString, r.getDouble(2)))
      .toSeq.sorted
    assert(compacted == Seq(
      (1L, "2024-01-01 13:00:00.0", 13.0),
      (2L, "2024-01-01 12:00:00.0", 22.0),
      (3L, "2024-01-01 12:01:00.0", 30.0)))
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

  test("hourlyApproxUsers: streamed HLL merge equals the batch sketch") {
    implicit val sqlCtx = spark.sqlContext
    val data = (0 until 40).map { i =>
      EvU(i.toLong, (i % 7).toLong, t(f"2024-01-01 ${10 + i / 20}%02d:${i % 20}%02d:00"), 1.0)
    }
    val stream = MemoryStream[EvU]
    val q = StreamOps.hourlyApproxUsers(stream.toDF())
      .writeStream.format("memory").queryName("approx_users")
      .outputMode("complete").start()
    try {
      stream.addData(data.take(25): _*)
      q.processAllAvailable()
      stream.addData(data.drop(25): _*)  // second batch merges into open windows
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("approx_users").orderBy("hour")
      .collect().map(r => r.getTimestamp(0).toString -> r.getLong(1))
    val batch = StreamOps.hourlyApproxUsers(data.toDF()).orderBy("hour")
      .collect().map(r => r.getTimestamp(0).toString -> r.getLong(1))
    assert(streamed.toSeq == batch.toSeq)
    // 7 distinct users is far below HLL error range: the estimate is exact
    streamed.foreach { case (_, n) => assert(n == 7L) }
  }

  test("funnelAdvances emits per-stage advancements and agrees with the batch funnel") {
    implicit val sqlCtx = spark.sqlContext
    // user 1 converts fully; user 2 clicks but purchases OUTSIDE the 24 h
    // window (no stage 3); user 3 clicks BEFORE viewing (click ignored,
    // still reaches stage 1 only); user 4 never views (purchase ignored)
    val data = Seq(
      (1L, "view", t("2024-01-01 10:00:00")),
      (1L, "click", t("2024-01-01 11:00:00")),
      (2L, "view", t("2024-01-01 10:00:00")),
      (3L, "click", t("2024-01-01 09:00:00")),
      (3L, "view", t("2024-01-01 10:30:00")),
      (4L, "purchase", t("2024-01-01 10:00:00")),
      (2L, "click", t("2024-01-01 12:00:00")),
      (1L, "purchase", t("2024-01-01 12:30:00")),
      (2L, "purchase", t("2024-01-03 13:00:00"))) // > 24 h after the click
    val stream = MemoryStream[(Long, String, Timestamp)]
    val q = StreamOps.funnelAdvances(stream.toDS())
      .writeStream.format("memory").queryName("funnel_adv")
      .outputMode("append").start()
    try {
      stream.addData(data.take(5): _*)
      q.processAllAvailable()
      stream.addData(data.drop(5): _*)
      q.processAllAvailable()
    } finally q.stop()
    val adv = spark.table("funnel_adv")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(adv == Set(
      (1L, "1_view"), (1L, "2_click"), (1L, "3_purchase"),
      (2L, "1_view"), (2L, "2_click"),
      (3L, "1_view")))
    // stage counts over the advancement log == the batch funnel on the same rows
    val streamCounts = spark.table("funnel_adv")
      .groupBy("stage").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val batchCounts = graft.ops.EventOps.funnelFrom(
        data.toDF("user_id", "event_type", "ts"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(streamCounts == batchCounts)
  }

  test("funnelAdvances: a view after conversion does not re-enter the funnel") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, String, Timestamp)]
    val q = StreamOps.funnelAdvances(stream.toDS())
      .writeStream.format("memory").queryName("funnel_noreenter")
      .outputMode("append").start()
    try {
      stream.addData(
        (1L, "view", t("2024-01-01 10:00:00")),
        (1L, "click", t("2024-01-01 10:30:00")),
        (1L, "purchase", t("2024-01-01 11:00:00")))
      q.processAllAvailable()
      // converted user views again within the retention horizon: state is
      // terminal, so NO new 1_view row may appear (double-count guard)
      stream.addData((1L, "view", t("2024-01-01 12:00:00")))
      q.processAllAvailable()
    } finally q.stop()
    val adv = spark.table("funnel_noreenter")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(adv.length == 3, s"re-emission detected: ${adv.mkString(",")}")
    assert(adv.count(_._2 == "1_view") == 1)
  }

  test("streamRunning: transformWithState drain equals the batch window fold, state crosses batches") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val got = graft.streaming.StreamOps.streamRunning(spark, sf0001).collect()
    assert(got.nonEmpty)
    // batch twin: per-user row_number + running exact-cents sum
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val seqd = graft.ops.EventOps.events(spark, sf0001)
      .select(col("user_id"), col("event_id"), col("ts"),
        round(col("value") * 100, 0).cast("long").as("cents"))
      .select(col("user_id"), col("event_id"),
        row_number().over(w).cast("long").as("seq"),
        sum("cents").over(w).as("cum_cents"))
    val digest = conv(substring(md5(concat_ws("|",
      col("user_id").cast("string"), col("event_id").cast("string"),
      col("seq").cast("string"), col("cum_cents").cast("string"))), 1, 15),
      16, 10).cast("long")
    val expected = seqd.select(col("user_id"), col("seq"), col("cum_cents"),
        digest.as("digest"))
      .groupBy("user_id")
      .agg(max("seq").as("n_events"),
        max_by(col("cum_cents"), col("seq")).as("cents_total"),
        expr("bit_xor(digest)").as("xor_digest"))
      .orderBy("user_id").collect()
    assert(got.toSeq == expected.toSeq)
    // multi-batch reality: 6 staged files at maxFilesPerTrigger=2 means at
    // least one user's events span micro-batches; equality of the FULL
    // per-event digest (not just endpoints) proves the ValueState carried
    // seq/cum across those batches
    val nUsersMultiEvent = expected.count(_.getAs[Long]("n_events") > 1L)
    assert(nUsersMultiEvent > 0, "fixture has no multi-event user; spec is vacuous")
  }

  test("streamCov: the drained moment store equals the batch covariance bit-for-bit, state crosses batches") {
    // THE contract: exact Long moments merge associatively, so the
    // transformWithState drain over ANY micro-batch slicing must equal the
    // one-pass batch aggregate not just approximately but BIT-identically
    val got = graft.streaming.StreamOps.streamCov(spark, sf0001).collect().toSeq
    val want = graft.ops.VectorOps.embedCov(spark, sf0001).collect().toSeq
    assert(got.nonEmpty)
    assert(got == want, "streamed covariance diverged from the batch aggregate")
    // multi-batch reality: every shard's upd counter is its number of
    // micro-batches touched; 6 staged files at maxFilesPerTrigger=2 and
    // vec_id % 4 sharding must put at least one shard in ≥ 2 batches —
    // otherwise the drain never exercised cross-batch state and the
    // bit-equality above is vacuous
    val snaps = graft.streaming.StreamOps.streamCovSnaps(spark, sf0001)
    val maxUpd = snaps.groupBy("shard").agg(max("upd").as("u"))
      .agg(max("u")).collect()(0).getLong(0)
    assert(maxUpd >= 2L, s"no shard's state crossed a micro-batch (max upd = $maxUpd)")
    // and the snapshots are genuinely RUNNING states: per shard, n must be
    // strictly increasing in upd (each batch folds IN, never resets)
    val perShard = snaps.select("shard", "upd", "n").collect()
      .groupBy(_.getLong(0)).values
    perShard.foreach { rows =>
      val ordered = rows.sortBy(_.getLong(1)).map(_.getLong(2))
      assert(ordered.zip(ordered.tail).forall { case (a, b) => a < b },
        s"a shard's running count did not strictly grow across batches: ${ordered.mkString(",")}")
    }
  }

  test("streamAnnIngest: the micro-batched frozen-artifact ingest equals the batch annAppend bit-for-bit, genuinely multi-batch") {
    // the ANN twin of streamCov's contract: encoding under frozen
    // artifacts is a deterministic pure map, so HOWEVER the file source
    // slices the append batch, the probed union must equal the one-shot
    // batch append exactly
    val got = graft.streaming.StreamOps.streamAnnIngest(spark, sf0001).collect()
    assert(got.nonEmpty)
    // the drain really split the ingest across micro-batches (the nb
    // audit column every probe row carries)
    assert(got.forall(_.getAs[Long]("nb") >= 2L),
      s"ingest ran as a single micro-batch (nb=${got.head.getAs[Long]("nb")})")
    val gotRows = got.map(r => r.toSeq.dropRight(1)).toSeq // drop nb
    val want = graft.ops.VectorOps.annAppend(spark, sf0001).collect()
      .map(_.toSeq).toSeq
    assert(gotRows == want, "streamed ingest probes diverged from batch annAppend")
    // deterministic across reruns (frozen artifacts; idempotent log)
    val again = graft.streaming.StreamOps.streamAnnIngest(spark, sf0001)
      .collect().map(_.toSeq).toSeq
    assert(again == got.map(_.toSeq).toSeq)
  }

  test("streamDf: the micro-batched lexical ingest equals the batch dfUpdate bit-for-bit, genuinely multi-batch") {
    // the lexical-tier twin of streamCov/streamAnnIngest's contract:
    // doc-disjoint micro-batches keep df additive and Long addition is
    // batching-independent, so HOWEVER the file source slices the ingest
    // batch, the merged store must equal the one-shot dfUpdate exactly
    val got = graft.streaming.StreamOps.streamDf(spark, sf0001)
      .collect().map(_.toSeq).toSeq
    assert(got.nonEmpty)
    val want = graft.ops.TextOps.dfUpdate(spark, sf0001)
      .collect().map(_.toSeq).toSeq
    assert(got == want, "streamed lexical store diverged from batch dfUpdate")
    // multi-batch reality: 4 staged files at maxFilesPerTrigger=1 must
    // drain as ≥ 3 micro-batches (≥ 3 keeps the assertion meaningful even
    // if the source ever coalesces one pair) — otherwise the
    // batching-independence above is vacuous
    val log = graft.streaming.StreamOps.streamDfLog(spark, sf0001)
    val nb = log.select(countDistinct("batch_id")).collect()(0).getLong(0)
    assert(nb >= 3L, s"lexical ingest ran as $nb micro-batch(es)")
    // and the per-batch logs are genuinely doc-disjoint aggregates: each
    // batch's df can never exceed the whole ingest split's doc count, and
    // summing the per-batch dfs reproduces the one-shot batch count —
    // the additivity the oracle argument rests on
    val summed = log.groupBy("tok")
      .agg(sum("df").as("df"), sum("tf").as("tf"))
      .orderBy("tok").collect().map(_.toSeq).toSeq
    val oneShot = graft.ops.TextOps.lexCounts(
        graft.sources.Tables.load(spark, sf0001, "documents")
          .filter(col("doc_id") % 10 === 0))
      .orderBy("tok").collect().map(_.toSeq).toSeq
    assert(summed == oneShot, "per-batch lexical counts are not additive")
  }

  test("streamPostings: the micro-batched postings ingest equals the batch postingsUpdate bit-for-bit, genuinely multi-batch and doc-disjoint") {
    // the per-document twin of streamDf's contract, with a stronger
    // mechanism: doc-disjoint micro-batches make the ingest APPEND-ONLY
    // (each doc's rows are produced whole by exactly one micro-batch — no
    // merge arithmetic anywhere), so HOWEVER the file source slices the
    // ingest, the appended table must equal the one-shot batch append
    val got = graft.streaming.StreamOps.streamPostings(spark, sf0001)
      .collect().map(_.toSeq).toSeq
    assert(got.nonEmpty)
    val want = graft.ops.TextOps.postingsUpdate(spark, sf0001)
      .collect().map(_.toSeq).toSeq
    assert(got == want, "streamed postings diverged from batch postingsUpdate")
    // multi-batch reality: 4 staged files at maxFilesPerTrigger=1 must
    // drain as ≥ 3 micro-batches, or batching-independence is vacuous
    val log = graft.streaming.StreamOps.streamPostingsLog(spark, sf0001)
    val nb = log.select(countDistinct("batch_id")).collect()(0).getLong(0)
    assert(nb >= 3L, s"postings ingest ran as $nb micro-batch(es)")
    // and the append-only mechanism is structural: each doc_id appears in
    // EXACTLY one micro-batch (doc-disjoint slicing is what removes the
    // merge arithmetic the aggregate store needs)
    val crossBatch = log.groupBy("doc_id")
      .agg(countDistinct("batch_id").as("nbid"))
      .filter(col("nbid") > 1).count()
    assert(crossBatch == 0L,
      s"$crossBatch doc(s) span micro-batches — the ingest is not doc-disjoint")
  }

  test("streamDocLen: the streamed doc-length append equals the batch form bit-for-bit (r17 verdict #2)") {
    // the length relation's streaming ingest: lengths aggregated from the
    // SAME drained idempotent log, appended onto the standing partition —
    // doc-disjoint micro-batches contribute each doc's rows whole, so the
    // result must equal the batch append (== the full-corpus recompute,
    // postingsUpdate's oracled contract) for this (and any) slicing
    val got = graft.streaming.StreamOps.streamDocLen(spark, sf0001)
      .collect().map(_.toSeq).toSeq
    assert(got.nonEmpty)
    val want = graft.ops.TextOps.postingsUpdate(spark, sf0001)
      .groupBy("doc_id").agg(sum("tf").as("len"))
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(got == want, "streamed doc lengths diverged from the batch append")
  }

  test("streamLexStats: per-micro-batch counter deltas fold to the batch counters exactly (r17 verdict #2)") {
    // the scalar counters' streaming form: each micro-batch's own
    // (doc count, Σ len) Long deltas added to the standing counters must
    // equal the full-corpus recompute bit-for-bit — Long addition is
    // batching-independent, doc-disjointness keeps every doc in exactly
    // one delta. With this, every relation postingsLifecycle serves
    // (postings, lengths, counters) has a streaming ingest form.
    val got = graft.streaming.StreamOps.streamLexStats(spark, sf0001)
      .collect().head.toSeq
    val want = graft.sources.Tables.load(spark, sf0001, "documents")
      .select(col("doc_id"),
        explode(graft.ops.TextOps.tokens(col("text"))).as("tok"))
      .groupBy("doc_id").agg(count(lit(1)).as("len"))
      .agg(count(lit(1)).as("n_docs"),
        coalesce(sum("len"), lit(0L)).as("sum_len"))
      .collect().head.toSeq
    assert(got == want, s"streamed counters diverged: $got != $want")
  }

  test("streamNdocs: per-micro-batch raw document counts fold to the all-documents counter exactly (r18 verdict #4)") {
    // the all-documents counter's streaming form: each micro-batch's OWN
    // raw slice count (zero-token docs included — they never reach the
    // postings log, which is why the delta comes off the raw slice, not
    // the drained postings) added to the standing %10≠0 counter must
    // equal the whole-corpus document count bit-for-bit. With this,
    // every input of tfidfLifecycle (postings, df store, n_docs) has a
    // streaming ingest form.
    val got = graft.streaming.StreamOps.streamNdocs(spark, sf0001)
      .collect().head.getLong(0)
    val want = graft.sources.Tables.load(spark, sf0001, "documents").count()
    assert(got == want, s"streamed all-documents counter diverged: $got != $want")
    // the count log is genuinely per-batch (one row per micro-batch, the
    // shared drain's >= 3 multi-batch contract), its deltas sum to the
    // RAW ingest batch — including any docs the postings log never sees
    val (postLog, nLogOpt) =
      graft.streaming.StreamOps.streamPostingsDrain(spark, sf0001, withCounts = true)
    val nLog = nLogOpt.get
    val nb = nLog.select(countDistinct("batch_id")).collect()(0).getLong(0)
    assert(nb >= 3L, s"ndocs drain ran as $nb micro-batch(es)")
    assert(nLog.count() == nb, "count log is not one row per micro-batch")
    val rawBatch = graft.sources.Tables.load(spark, sf0001, "documents")
      .filter(col("doc_id") % 10 === 0).count()
    val logged = nLog.agg(coalesce(sum("n_docs"), lit(0L))).collect()(0).getLong(0)
    assert(logged == rawBatch, "per-batch counts do not sum to the raw ingest batch")
    assert(logged >= postLog.select("doc_id").distinct().count(),
      "raw count fell below the token-bearing doc count")
  }

  test("streamAsof: the foreachBatch as-of drain equals the batch as-of join") {
    // batching-independence is the claim: each event's answer depends only
    // on the static orders side, so HOWEVER the file source slices batches,
    // the drained union equals the one-shot batch as-of
    val got = graft.streaming.StreamOps.streamAsof(spark, sf0001).collect().toSeq
    val want = graft.ops.EventOps.asofJoin(spark, sf0001).collect().toSeq
    assert(got.nonEmpty)
    assert(got == want)
  }

  private def withRocksDb[A](body: => A): A = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try body finally prev.fold(spark.conf.unset(key))(spark.conf.set(key, _))
  }

  test("transformWithState TTL: an idle key's state expires and the count restarts") {
    import graft.streaming.{TimedEvent, TtlCount}
    // Two single-batch (Trigger.Once) drains over a shared checkpoint,
    // 300 ms of real processing time apart. NOT processAllAvailable or
    // AvailableNow on a long-lived query: in TimeMode.ProcessingTime the
    // engine self-triggers timer-check batches forever, so neither ever
    // settles — Once() is the deterministic way to run exactly one batch
    // per drain (each staged file fits one batch: no maxFilesPerTrigger).
    def run(ttlMs: Long): Set[(Long, Long, Long)] = withRocksDb {
      val in = java.nio.file.Files.createTempDirectory("graft_ttl_in").toString
      val out = java.nio.file.Files.createTempDirectory("graft_ttl_out").toString
      val cp = java.nio.file.Files.createTempDirectory("graft_ttl_cp").toString
      val f0 = Seq(
        TimedEvent(7L, 1L, t("2024-01-01 10:00:00")),
        TimedEvent(7L, 2L, t("2024-01-01 10:01:00")))
      val f1 = Seq(TimedEvent(7L, 3L, t("2024-01-01 10:02:00")))
      val schema = f0.toDF().schema
      def drain(): Unit = {
        val q = StreamOps.ttlCounts(
            spark.readStream.schema(schema).parquet(in).as[TimedEvent], ttlMs)
          .writeStream.format("parquet")
          .option("path", out).option("checkpointLocation", cp)
          .trigger(org.apache.spark.sql.streaming.Trigger.Once())
          .start()
        q.awaitTermination()
      }
      stageFile(f0, in, "f0.parquet", 1700000000000L)
      drain()
      Thread.sleep(300) // real processing time passes far beyond a 1 ms TTL
      stageFile(f1, in, "f1.parquet", 1700000060000L)
      drain()
      spark.read.schema(org.apache.spark.sql.Encoders.product[TtlCount].schema)
        .parquet(out).as[TtlCount].collect()
        .map(c => (c.user_id, c.batch_n, c.total_n)).toSet
    }
    // control arm, no TTL: run 2's single event lands ON TOP of run 1's 2
    assert(run(0L) == Set((7L, 2L, 2L), (7L, 1L, 3L)))
    // 1 ms TTL: the 300 ms idle gap expires the key between the runs — the
    // second run must observe NO prior state and restart the count
    assert(run(1L) == Set((7L, 2L, 2L), (7L, 1L, 1L)))
  }

  test("transformWithState event-time timer fires across a checkpoint restart") {
    import graft.streaming.{TimedEvent, IdleFlush}
    // user 1's session ends at 10:10 in RUN 1, arming a flush timer at 11:10
    // (gap 1 h). Run 1's watermark never reaches it. Run 2 adds only USER-2
    // data; the recovered watermark sweeps past 11:10 and the timer fires —
    // with zero new user-1 input — proving timers and their state survive
    // the checkpoint restart.
    val f0 = Seq(
      TimedEvent(1L, 1L, t("2024-01-01 10:00:00")),
      TimedEvent(1L, 2L, t("2024-01-01 10:10:00")))
    val f1 = Seq(TimedEvent(2L, 3L, t("2024-01-01 10:30:00")))
    val f2 = Seq(TimedEvent(2L, 4L, t("2024-01-01 23:00:00")))
    val f3 = Seq(TimedEvent(2L, 5L, t("2024-01-01 23:05:00")))
    val in = java.nio.file.Files.createTempDirectory("graft_tws_in").toString
    val out = java.nio.file.Files.createTempDirectory("graft_tws_out").toString
    val cp = java.nio.file.Files.createTempDirectory("graft_tws_cp").toString
    val schema = f0.toDF().schema
    def drain(): Unit = withRocksDb {
      val q = StreamOps.idleFlush(
          spark.readStream.schema(schema).option("maxFilesPerTrigger", "1")
            .parquet(in).as[TimedEvent],
          gapMs = 3600L * 1000L)
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", cp)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    def sinkRows(): Seq[IdleFlush] = spark.read.schema(
        org.apache.spark.sql.Encoders.product[IdleFlush].schema)
      .parquet(out).as[IdleFlush].collect().toSeq
    stageFile(f0, in, "f0.parquet", 1700000000000L)
    stageFile(f1, in, "f1.parquet", 1700000060000L)
    drain() // run 1: timers armed (user 1 @ 11:10, user 2 @ 11:30), none fired
    // run 1's watermark tops out at 10:20 — nothing may flush yet (the
    // sink does hold empty per-batch part files; rows are what matter)
    val afterRun1 = sinkRows()
    assert(afterRun1.isEmpty, s"run 1 must not flush anything: $afterRun1")
    stageFile(f2, in, "f2.parquet", 1700000120000L)
    stageFile(f3, in, "f3.parquet", 1700000180000L)
    drain() // run 2: f2 pushes the watermark to 22:50; f3's batch fires user 1's timer
    assert(sinkRows() == Seq(IdleFlush(1L, 2L, t("2024-01-01 11:10:00").getTime)),
      s"flushes=${sinkRows()}")
  }
}
