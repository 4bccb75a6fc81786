package graft

import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Sink-side scale techniques: bucketed tables for shuffle-free co-located
  * joins, and ML model persistence (SURVEY.md §2.1 S4/S6). */
class SinkSpec extends SparkSpec {

  test("bucketed tables join without a shuffle exchange (co-located join)") {
    // tables land in the default ./spark-warehouse (gitignored);
    // disable broadcast so the join strategy must rely on the bucketing
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      Tables.load(spark, sf0001, "orders")
        .write.mode("overwrite").bucketBy(4, "o_custkey").sortBy("o_custkey")
        .saveAsTable("orders_b")
      Tables.load(spark, sf0001, "customer")
        .write.mode("overwrite").bucketBy(4, "c_custkey").sortBy("c_custkey")
        .saveAsTable("customer_b")
      val joined = spark.table("orders_b")
        .join(spark.table("customer_b"), col("o_custkey") === col("c_custkey"))
      val plan = joined.queryExecution.executedPlan.toString
      // both sides pre-bucketed on the join key: SortMergeJoin with ZERO
      // Exchange operators — the layout a 100 TB fact/fact join needs
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("Exchange"), "bucketed join must not shuffle:\n" + plan)
      assert(joined.count() > 0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS customer_b")
    }
  }

  test("q_bucket_join: staged bucketed tables co-locate the declared join") {
    import graft.ops.BucketOps
    // the declared-query form: hinted SortMergeJoin over the staged
    // bucketed external tables — no Exchange on either join input
    // (pre-AQE sparkPlan: deterministic regardless of runtime re-planning)
    val frame = BucketOps.bucketJoinFrame(spark, sf0001)
    val plan = frame.queryExecution.sparkPlan.toString
    assert(plan.contains("SortMergeJoin"), plan)
    assert(!plan.contains("Exchange"), "bucketed join must not shuffle:\n" + plan)
    // and the full query agrees with the same aggregate off a plain join
    val got = BucketOps.bucketJoin(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    val want = Tables.load(spark, sf0001, "orders")
      .join(Tables.load(spark, sf0001, "customer"),
        col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 4).as("rev"))
      .orderBy("c_mktsegment").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got == want)
  }

  test("bucket tables re-register from memoized files after a catalog drop") {
    import graft.ops.BucketOps
    // simulate a fresh session hitting the JVM-global staging memo: the
    // catalog entries are gone but the bucketed files remain — stage() must
    // re-create the external tables (metadata-only DDL) instead of throwing
    val before = BucketOps.bucketJoin(spark, sf0001).collect().toSeq
    spark.sql("DROP TABLE IF EXISTS graft_b_orders_" + sf0001.replaceAll("[^A-Za-z0-9_]", "_"))
    spark.sql("DROP TABLE IF EXISTS graft_b_customer_" + sf0001.replaceAll("[^A-Za-z0-9_]", "_"))
    val frame = BucketOps.bucketJoinFrame(spark, sf0001)
    val plan = frame.queryExecution.sparkPlan.toString
    // the re-registered tables must still report the bucket spec — the
    // co-located (Exchange-free) join is the point of the layout
    assert(plan.contains("SortMergeJoin"), plan)
    assert(!plan.contains("Exchange"), "re-registered bucket join must not shuffle:\n" + plan)
    assert(BucketOps.bucketJoin(spark, sf0001).collect().toSeq == before)
  }

  test("day-partitioned events layout prunes the scan to the requested day") {
    // the 100 TB layout EventOps documents: events partitioned by day so
    // time-bucket queries read one partition, not the history. Prove it:
    // write sf0.001 events partitionBy(day), scan one day, assert the
    // FileSourceScan selected exactly one partition via a PartitionFilter.
    import org.apache.spark.sql.execution.FileSourceScanExec
    val dir = java.nio.file.Files.createTempDirectory("graft_events_day").toString
    val events = graft.ops.EventOps.events(spark, sf0001)
    events.withColumn("day", to_date(col("ts")))
      .write.mode("overwrite").partitionBy("day").parquet(dir)
    val firstDay = spark.read.parquet(dir).select(min("day")).head().getDate(0)
    val pruned = spark.read.parquet(dir).filter(col("day") === lit(firstDay))
    val scans = pruned.queryExecution.executedPlan.collect {
      case f: FileSourceScanExec => f }
    assert(scans.nonEmpty, pruned.queryExecution.executedPlan.toString)
    assert(scans.head.partitionFilters.nonEmpty,
      "day predicate must become a PartitionFilter, not a data Filter")
    assert(scans.head.selectedPartitions.partitionCount == 1,
      s"expected 1 pruned partition, got ${scans.head.selectedPartitions.partitionCount}")
    val expected = events.filter(to_date(col("ts")) === lit(firstDay)).count()
    assert(pruned.count() == expected)
  }

  test("FAILFAST CSV rejects a corrupt upload instead of nulling it (ADVICE.md)") {
    import org.apache.spark.sql.types._
    val dir = java.nio.file.Files.createTempDirectory("graft_badcsv")
    java.nio.file.Files.writeString(dir.resolve("bad.csv"),
      "id,amount\n1,10.5\n2,not-a-number\n")
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("amount", DoubleType)))
    val ex = intercept[org.apache.spark.SparkException] {
      Tables.loadCsv(spark, dir.toString, schema).collect()
    }
    val chain = Iterator.iterate[Throwable](ex)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString(" | ")
    assert(chain.toLowerCase.contains("malformed"), chain)
  }

  test("GBT model artifact saves and reloads with identical predictions (S4)") {
    import graft.ops.Scoring
    val dir = java.nio.file.Files.createTempDirectory("graft_model").toString + "/gbt"
    val train = Scoring.synthCustomers(spark, sf0001)
    val model = Scoring.trainModel(train.filter(col("customer_id") % 3 =!= 0))
    model.write.overwrite().save(dir)
    val reloaded = org.apache.spark.ml.classification.GBTClassificationModel.load(dir)
    val a = Scoring.score(model, train).collect()
    val b = Scoring.score(reloaded, train).collect()
    assert(a.toSeq == b.toSeq)
  }

  test("compactFiles: 64 tiny files collapse to <= 8 disjoint time-clustered files") {
    import org.apache.spark.sql.functions._
    // build (memoized) and get the staging dir by running the declared query
    val out = graft.ops.LayoutOps.compactFiles(spark, sf0001)
    assert(out.count() > 0)
    // locate the staged dirs through the same memo key the op used
    val dir = graft.ops.SourceOps.materialize(s"compact_$sf0001")(_ => fail("memo missed"))
    def parquetFiles(p: String) =
      new java.io.File(p).listFiles().filter(_.getName.endsWith(".parquet"))
    val small = parquetFiles(s"$dir/small")
    val compacted = parquetFiles(s"$dir/compacted")
    assert(small.length >= 32, s"expected the small-file pathology, got ${small.length}")
    assert(compacted.length <= 8, s"compaction failed: ${compacted.length} files")
    // row mass preserved through the rewrite
    val nSmall = spark.read.parquet(s"$dir/small").count()
    val nCompacted = spark.read.parquet(s"$dir/compacted").count()
    assert(nSmall == nCompacted)
    // range-partitioner contract: per-file ts spans are pairwise disjoint,
    // which is what re-arms zone-map pruning on the compacted layout
    val spans = compacted.sortBy(_.getName).map { f =>
      val r = spark.read.parquet(f.getAbsolutePath)
        .agg(min("ts"), max("ts")).head()
      (r.getTimestamp(0).getTime, r.getTimestamp(1).getTime)
    }.sortBy(_._1)
    spans.sliding(2).foreach {
      case Array((_, hiA), (loB, _)) => assert(hiA <= loB, s"overlapping file spans")
      case _ =>
    }
  }

  test("materialize: nested staging of DIFFERENT keys works; a same-key cycle fails fast instead of deadlocking") {
    // the r16 Recursive-update fix's two contracts, planted: a writer may
    // stage other keys (the eigen-ladder / lex_df_maint shape at any hash
    // bin layout)...
    val outer = graft.ops.SourceOps.materialize("spec_nest_outer") { d =>
      val inner = graft.ops.SourceOps.materialize("spec_nest_inner") { d2 =>
        java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$d2/x"), "i")
        ()
      }
      assert(new java.io.File(s"$inner/x").exists())
      java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$d/y"), "o")
      ()
    }
    assert(new java.io.File(s"$outer/y").exists())
    // ...but a writer that transitively re-stages its OWN key is a cycle
    // in the staging DAG and must throw (the old computeIfAbsent's
    // fail-fast), never block forever in get() on its own task
    val e = intercept[IllegalArgumentException] {
      graft.ops.SourceOps.materialize("spec_cycle_key") { _ =>
        graft.ops.SourceOps.materialize("spec_cycle_key")(_ => ())
        ()
      }
    }
    assert(e.getMessage.contains("cycle"))
    // the failed construction did not poison the memo: the key can be
    // rebuilt by a well-behaved writer afterwards
    val retry = graft.ops.SourceOps.materialize("spec_cycle_key") { d =>
      java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$d/z"), "r")
      ()
    }
    assert(new java.io.File(s"$retry/z").exists())
  }
}
