package graft

import org.apache.spark.sql.functions._

/** Memory-envelope spec for TopKPerKeyExec (verdict r8 #3): past
  * `spark.graft.topk.maxHeapKeys` distinct keys per partition the operator
  * must switch mid-stream from per-key heaps to the spill-capable external
  * sort and still produce exactly the window-form answer. The threshold is
  * planted absurdly low (50) against 5,000 distinct keys so every partition
  * overflows; the same query at the default threshold pins heap-path
  * equality.
  */
class TopKFallbackSpec extends SparkSpec {
  import spark.implicits._

  private def planted = {
    // 5,000 keys × 4 rows, values arranged so top-2 per key is (40+key*…)
    // deterministic: per key i, rows (i, j, v = (i*7 + j*13) % 101)
    (0 until 5000).flatMap { i =>
      (0 until 4).map(j => (s"k$i", i.toLong * 10 + j, ((i * 7 + j * 13) % 101).toDouble))
    }.toDF("k", "id", "v")
  }

  private def expected(df: org.apache.spark.sql.DataFrame) = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("k").orderBy(col("v").desc, col("id"))
    df.withColumn("rk", row_number().over(w).cast("long")).filter(col("rk") <= 2)
      .orderBy("k", "rk")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSeq
  }

  test("sort-fallback past the key threshold matches the heap path and the window form") {
    val df = planted
    val want = expected(df)
    assert(want.size == 10000)
    def run(): Seq[(String, Long, Double, Long)] =
      org.apache.spark.sql.graft.TopKPerKey
        .topKPerKey(df, 2, Seq("k"), Seq("v" -> false, "id" -> true))
        .orderBy("k", "rk")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSeq
    // heap path (default threshold 1M — 5k keys never overflow)
    assert(run() == want)
    // fallback path: threshold 50 « 5000 keys / 2 partitions — every
    // partition overflows mid-stream and finishes on the external sort
    spark.conf.set("spark.graft.topk.maxHeapKeys", "50")
    try assert(run() == want)
    finally spark.conf.unset("spark.graft.topk.maxHeapKeys")
  }

  test("fallback completes under constrained memory with a REAL spill") {
    // The envelope claim, demonstrated rather than asserted: 500k rows on
    // ONE partition with the heap threshold at 1k keys — the external sort
    // receives ~496k rows, and the session's 300k force-spill threshold
    // (SparkSpec) makes the sorter genuinely spill to disk mid-run. The
    // listener proves the spill happened; the counts and spot-checked keys
    // prove nothing was lost across it.
    val spilled = new java.util.concurrent.atomic.AtomicLong(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (t.taskMetrics != null) spilled.addAndGet(t.taskMetrics.memoryBytesSpilled)
    }
    spark.sparkContext.addSparkListener(listener)
    spark.conf.set("spark.graft.topk.maxHeapKeys", "1000")
    try {
      // key i ∈ [0, 100k), 5 rows each; top-2 by v desc = j ∈ {4, 3}
      val big = spark.range(500000L).selectExpr(
        "id % 100000 AS k", "id AS rid", "CAST(id DIV 100000 AS DOUBLE) AS v")
      val out = org.apache.spark.sql.graft.TopKPerKey
        .topKPerKey(big.repartition(1), 2, Seq("k"), Seq("v" -> false, "rid" -> true))
      assert(out.count() == 200000L)
      val probe = out.filter(col("k").isin(0L, 54321L, 99999L))
        .orderBy("k", "rk")
        .collect().map(r => (r.getLong(0), r.getDouble(2), r.getLong(3))).toSeq
      assert(probe == Seq(
        (0L, 4.0, 1L), (0L, 3.0, 2L),
        (54321L, 4.0, 1L), (54321L, 3.0, 2L),
        (99999L, 4.0, 1L), (99999L, 3.0, 2L)))
      // listener delivery is async — poll briefly before asserting
      val deadline = System.nanoTime() + 10e9.toLong
      while (spilled.get() == 0 && System.nanoTime() < deadline) Thread.sleep(100)
      assert(spilled.get() > 0, "expected the fallback's external sorter to spill")
    } finally {
      spark.conf.unset("spark.graft.topk.maxHeapKeys")
      spark.sparkContext.removeSparkListener(listener)
    }
  }

  test("byte-threshold overflow (wide rows) matches the heap path too") {
    // the key-count proxy misses wide rows; the byte guard is exact. A
    // tiny 4 KB budget overflows within the first few hundred rows (every
    // row ~0.1 KB retained), with NO pending row (the last row was
    // consumed into a heap before the guard fired) — the branch the
    // key-count path never takes.
    val df = planted
    val want = expected(df)
    spark.conf.set("spark.graft.topk.maxHeapBytes", "4096")
    try {
      val got = org.apache.spark.sql.graft.TopKPerKey
        .topKPerKey(df, 2, Seq("k"), Seq("v" -> false, "id" -> true))
        .orderBy("k", "rk")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSeq
      assert(got == want)
    } finally spark.conf.unset("spark.graft.topk.maxHeapBytes")
  }

  test("fallback handles groups split around the overflow point and ties to k") {
    // threshold 1: the very SECOND distinct key overflows, so nearly the
    // whole partition rides the sorter; also k > some group sizes
    val df = Seq(
      ("a", 1L, 5.0), ("b", 2L, 7.0), ("a", 3L, 6.0), ("c", 4L, 1.0),
      ("b", 5L, 8.0), ("a", 6L, 4.0), ("c", 7L, 2.0)).toDF("k", "id", "v")
    spark.conf.set("spark.graft.topk.maxHeapKeys", "1")
    try {
      val got = org.apache.spark.sql.graft.TopKPerKey
        .topKPerKey(df.repartition(1), 2, Seq("k"), Seq("v" -> false, "id" -> true))
        .orderBy("k", "rk")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(3))).toSeq
      assert(got == Seq(
        ("a", 3L, 1L), ("a", 1L, 2L),
        ("b", 5L, 1L), ("b", 2L, 2L),
        ("c", 7L, 1L), ("c", 4L, 2L)))
    } finally spark.conf.unset("spark.graft.topk.maxHeapKeys")
  }
}
