package graft

import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources.{EqualTo, GreaterThanOrEqual, LessThan}
import org.apache.spark.sql.types.StructType

import graft.ops.SourceOps
import graft.sources.{GenScanBuilder, GenSource}

/** The custom DataSource V2 ladder rung: pushdown facts are asserted against
  * the PHYSICAL plan (what Spark actually handed the source), and the
  * planning-time partition pruning is asserted at the ScanBuilder level.
  * Value correctness rides the DuckDB oracle (q_gen_source); here we pin the
  * mechanism, not just the numbers.
  */
class GenSourceSpec extends SparkSpec {

  private def gen(rows: Long = 200000L, slices: Int = 16) =
    spark.read.format("graft-gen")
      .option("rows", rows.toString).option("slices", slices.toString).load()

  // sparkPlan, not executedPlan: AQE wraps shuffle queries in
  // AdaptiveSparkPlanExec, which hides the scan from collectFirst
  private def scanOf(df: org.apache.spark.sql.DataFrame): BatchScanExec =
    df.queryExecution.sparkPlan.collectFirst { case b: BatchScanExec => b }.get

  test("short name resolves via ServiceLoader and full scan has rows × schema") {
    val df = gen(rows = 1000L, slices = 4)
    assert(df.schema.fieldNames.toSeq ==
      Seq("id", "age", "gender", "tenure", "spend", "plan", "bucket"))
    assert(df.count() == 1000L)
  }

  test("id-range predicate prunes input partitions at planning time") {
    // 16 slices of 12500 ids; [150000, 180000) touches slices 12..14 → 3
    val df = gen().where(col("id") >= 150000L && col("id") < 180000L)
    val scan = scanOf(df)
    assert(scan.inputRDD.getNumPartitions == 3,
      s"expected 3 surviving slices, plan: ${scan.scan.description()}")
    assert(df.count() == 30000L)
  }

  test("pushed filters reach the scan; non-key filters stay residual") {
    val df = gen().where(col("id") < 100L && col("plan") === "Basic")
    val desc = scanOf(df).scan.description()
    assert(desc.contains("LessThan(id,100)"), desc)
    val pushedSegment = desc.substring(desc.indexOf("PushedFilters:"))
    assert(!pushedSegment.contains("plan"),
      s"plan filter must NOT be pushed: $desc")
    // residual is still applied: only ids ≡ 0 (mod 3) below 100
    assert(df.count() == 34L)
  }

  test("column pruning reaches the reader schema") {
    val df = gen().where(col("id") < 1000L).select("gender", "spend")
    val read = scanOf(df).scan.readSchema()
    assert(read.fieldNames.toSet.subsetOf(Set("id", "gender", "spend")),
      s"readSchema not pruned: $read")
    assert(!read.fieldNames.contains("tenure") && !read.fieldNames.contains("age"))
  }

  test("equality on id plans exactly one single-row partition") {
    val b = new GenScanBuilder(200000L, 16)
    b.pushFilters(Array(EqualTo("id", 123456L)))
    val parts = b.build().asInstanceOf[graft.sources.GenScan].planInputPartitions()
    assert(parts.length == 1)
  }

  test("contradictory pushed range plans zero partitions") {
    val b = new GenScanBuilder(200000L, 16)
    val residual = b.pushFilters(
      Array(GreaterThanOrEqual("id", 180000L), LessThan("id", 150000L)))
    assert(residual.isEmpty)
    val scan = b.build().asInstanceOf[graft.sources.GenScan]
    assert(scan.planInputPartitions().isEmpty)
  }

  test("ungrouped count/min/max pushes completely: one synthetic row, zero data rows") {
    val df = SourceOps.genAgg(spark, sf0001)
    val scan = scanOf(df)
    assert(scan.scan.description().contains("PushedAggregation"),
      s"aggregate not pushed: ${scan.scan.description()}")
    assert(scan.inputRDD.getNumPartitions == 1)
    val r = df.head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == (50000L, 120000L, 169999L))
  }

  test("pushed aggregate over an empty range: count 0, null min/max") {
    val df = gen().where(col("id") >= 180000L && col("id") < 150000L)
      .agg(count(lit(1)).as("n"), min("id").as("mn"), max("id").as("mx"))
    assert(scanOf(df).scan.description().contains("PushedAggregation"))
    val r = df.head()
    assert(r.getLong(0) == 0L && r.isNullAt(1) && r.isNullAt(2))
  }

  test("grouped or derived-column aggregates fall back to scan + Spark aggregation") {
    val grouped = gen(rows = 1000L).groupBy("plan").count()
    assert(!scanOf(grouped).scan.description().contains("PushedAggregation"))
    assert(grouped.collect().map(_.getLong(1)).sum == 1000L)
    val derived = gen(rows = 1000L).agg(min("age").as("mn"), max("age").as("mx"))
    assert(!scanOf(derived).scan.description().contains("PushedAggregation"))
    val r = derived.head()
    // age = 18 + (id*37 % 83) covers the full residue set over 1000 ids
    assert(r.getLong(0) == 18L && r.getLong(1) == 100L)
  }

  test("declared query matches the same computation over spark.range") {
    import graft.sources.GenSource.{gen => colGen}
    val viaRange = spark.range(200000L).toDF("id")
      .withColumn("age", lit(18L) + (col("id") * 37L) % 83L)
      .withColumn("gender", when(col("id") % 2 === 0, "Female").otherwise("Male"))
      .withColumn("spend", ((col("id") * 97L) % 100000L).cast("double") / 100.0)
      .withColumn("plan",
        when(col("id") % 3 === 0, "Basic")
          .when(col("id") % 3 === 1, "Standard").otherwise("Premium"))
      .where(col("id") >= 150000L && col("id") < 180000L && col("plan") =!= "Basic")
      .groupBy("plan", "gender")
      .agg(count(lit(1)).as("n"), round(sum("spend"), 2).as("total_spend"),
        round(avg("age"), 4).as("avg_age"))
      .orderBy("plan", "gender")
    val got = SourceOps.genSource(spark, sf0001).collect().toSeq
    assert(got == viaRange.collect().toSeq)
    assert(got.nonEmpty)
    // keep the generator map total over the schema (throws on drift)
    GenSource.schema.fieldNames.foreach(f => colGen(f, 8)(7L))
  }

  test("runtime filtering: dim join keys prune fact slices 16 -> 1; values unchanged without it") {
    import graft.sources.GenScan
    def scanOf2(df: org.apache.spark.sql.DataFrame): GenScan =
      df.queryExecution.sparkPlan.collect { case b: BatchScanExec => b.scan }
        .collectFirst { case g: GenScan => g }.get
    val df = SourceOps.genRuntime(spark, sf0001)
    val withPruning = df.collect().toSeq
    assert(withPruning.nonEmpty)
    val s1 = scanOf2(df)
    assert(s1.lastPlanned == 1,
      s"expected the runtime In-set to collapse 16 slices to 1, got ${s1.lastPlanned}")
    val prev = spark.conf.get("spark.sql.optimizer.dynamicPartitionPruning.enabled")
    try {
      spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.enabled", "false")
      val df2 = SourceOps.genRuntime(spark, sf0001)
      val noPruning = df2.collect().toSeq
      assert(scanOf2(df2).lastPlanned == 16, "without DPP all 16 slices plan")
      assert(withPruning == noPruning, "runtime pruning must not change values")
    } finally
      spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.enabled", prev)
  }

  test("storage-partitioned join: two bucket-layout scans join with ZERO shuffle") {
    val prev = spark.conf.getOption("spark.sql.sources.v2.bucketing.enabled")
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    // AQE off for the PLAN assertion: AdaptiveSparkPlanExec has no children,
    // so a collect over it finds nothing and a zero-shuffle assert would be
    // vacuously green; the non-adaptive executedPlan shows real exchanges
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    // join keys (bucket, id) are a SUPERSET of the partition key (bucket):
    // co-partition elimination for the superset case is behind this flag
    val prevReq = spark.conf.get("spark.sql.requireAllClusterKeysForCoPartition")
    spark.conf.set("spark.sql.requireAllClusterKeysForCoPartition", "false")
    // reported stats (SupportsReportStatistics) would auto-broadcast this
    // small fixture and the zero-shuffle assert would pass for the WRONG
    // reason — force the shuffle-family join so the test proves SPJ
    val prevBc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      def bucketGen = spark.read.format("graft-gen")
        .option("rows", "20000").option("slices", "8")
        .option("layout", "bucket").load()
      val a = bucketGen.filter(col("plan") =!= "Basic")
        .select(col("id"), col("bucket"), col("spend"))
      val b = bucketGen.filter(col("age") > 50L)
        .select(col("id").as("id2"), col("bucket").as("bucket2"), col("age"))
      val j = a.join(b, col("bucket") === col("bucket2") && col("id") === col("id2"))
      val shuffles = j.queryExecution.executedPlan.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
      }
      assert(shuffles.isEmpty,
        s"expected a storage-partitioned join with zero shuffles, got\n${j.queryExecution.executedPlan}")
      val joins = j.queryExecution.executedPlan.collect {
        case jn: org.apache.spark.sql.execution.joins.BaseJoinExec => jn
      }
      assert(joins.nonEmpty, "the plan must actually contain the join node")
      assert(joins.forall(
        !_.isInstanceOf[org.apache.spark.sql.execution.joins.BroadcastHashJoinExec]),
        "must be the shuffle-family join riding key-grouped partitions, not a broadcast")
      // same values as the range layout computes (placement must not matter)
      val viaRange = {
        val g = gen(20000L, 8)
        val ra = g.filter(col("plan") =!= "Basic").select(col("id"), col("spend"))
        val rb = g.filter(col("age") > 50L).select(col("id").as("id2"), col("age"))
        ra.join(rb, col("id") === col("id2")).agg(
          count(lit(1)), round(sum("spend"), 2), sum("age")).head()
      }
      // round the double sum: partition-order changes its fp association
      val got = j.agg(count(lit(1)), round(sum("spend"), 2), sum("age")).head()
      assert(got == viaRange)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBc)
      spark.conf.set("spark.sql.requireAllClusterKeysForCoPartition", prevReq)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      prev match {
        case Some(v) => spark.conf.set("spark.sql.sources.v2.bucketing.enabled", v)
        case None => spark.conf.unset("spark.sql.sources.v2.bucketing.enabled")
      }
    }
  }

  test("reported statistics drive the broadcast decision: small scan auto-broadcasts, no hint") {
    // 2,000 rows x ~96 B reported ~ 200 KB << the 10 MB broadcast
    // threshold; without SupportsReportStatistics a DSv2 relation weighs
    // in at spark.sql.defaultSizeInBytes and would sort-merge join
    val small = gen(rows = 2000L, slices = 4)
    val big = spark.range(100000L).toDF("k")
    val j = big.join(small, col("k") === col("id"))
    val bhj = j.queryExecution.sparkPlan.collect {
      case b: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => b
    }
    assert(bhj.nonEmpty, s"expected an UNHINTED broadcast join from reported stats, got\n${j.queryExecution.sparkPlan}")
    // and the pushed range shrinks the estimate: a filtered scan reports
    // the filtered size (contract: stats are post-pushdown)
    import graft.sources.GenScan
    def stats(df: org.apache.spark.sql.DataFrame) =
      df.queryExecution.sparkPlan.collect { case b: BatchScanExec => b.scan }
        .collectFirst { case g: GenScan => g }.get.estimateStatistics()
    val full = stats(gen(rows = 2000L, slices = 4).filter(col("age") > 0L))
    val pruned = stats(gen(rows = 2000L, slices = 4).filter(col("id") < 100L))
    assert(full.numRows.getAsLong == 2000L)
    assert(pruned.numRows.getAsLong == 100L)
    assert(pruned.sizeInBytes.getAsLong < full.sizeInBytes.getAsLong)
  }

  test("TopN pushdown narrows the scan to the last n surviving ids") {
    val df = SourceOps.genLimit(spark, sf0001)
    val desc = scanOf(df).scan.description()
    assert(desc.contains("ids=[149995,150000)"), desc)
    assert(desc.contains("PushedLimit: 5 DESC"), desc)
    val rows = df.collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(149999L, 149998L, 149997L, 149996L, 149995L))
    // plain LIMIT (no sort) narrows from the front instead
    val lim = gen(rows = 1000L, slices = 4).limit(7)
    assert(scanOf(lim).scan.description().contains("ids=[0,7)"))
    assert(lim.count() == 7L)
    // bucket layout refuses the cut (interleaved ids): full range planned
    val b = spark.read.format("graft-gen").option("rows", "1000")
      .option("slices", "4").option("layout", "bucket").load().limit(7)
    assert(b.count() == 7L)
    assert(!scanOf(b).scan.description().contains("PushedLimit: 7"))
  }
}
