package graft

import org.apache.spark.sql.functions._
import graft.ops.{Relational, SkewOps}
import graft.sources.Tables

class SkewOpsSpec extends SparkSpec {

  test("salted two-phase avg reproduces the direct groupBy avg") {
    val direct = Relational.groupbyAvg(spark, sf0001).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val salted = SkewOps.saltedAgg(spark, sf0001).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(salted == direct)
  }

  test("salted plan spreads the hot key over salt buckets before the final agg") {
    val plan = SkewOps.saltedAgg(spark, sf0001).queryExecution.executedPlan.toString
    // two aggregation rounds: (k, salt) then (k)
    assert(plan.contains("hashpartitioning(k"), plan)
    assert("HashAggregate".r.findAllIn(plan).size >= 4, plan) // 2 partial+final pairs
  }

  test("saltedJoin equals the plain join") {
    val customer = Tables.load(spark, sf0001, "customer")
    val nation = Tables.load(spark, sf0001, "nation")
    val plain = customer.join(nation, col("c_nationkey") === col("n_nationkey"))
      .select("c_custkey", "n_name").orderBy("c_custkey").collect()
    val salted = SkewOps.saltedJoin(customer, nation,
      col("c_nationkey"), col("n_nationkey"), col("c_custkey"), salts = 4)
      .select("c_custkey", "n_name").orderBy("c_custkey").collect()
    assert(salted.toSeq == plain.toSeq)
  }

  test("q_salted_join reproduces the plain orders-customer join") {
    val plain = Tables.load(spark, sf0001, "orders")
      .join(Tables.load(spark, sf0001, "customer"),
        col("o_custkey") === col("c_custkey"))
      .select("o_orderkey", "o_custkey", "c_mktsegment", "o_totalprice")
      .orderBy("o_orderkey").collect()
    val salted = SkewOps.saltedJoinQuery(spark, sf0001).collect()
    assert(salted.toSeq == plain.toSeq)
  }

  test("AQE splits a skewed sort-merge join partition at runtime") {
    // the runtime half of the skew story: salting (above) is the manual
    // mitigation, AQE's OptimizeSkewedJoin is the automatic one — prove the
    // engine's configs let it fire on a 90%-hot-key join
    import spark.implicits._
    val keep = Seq("spark.sql.adaptive.enabled",
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.shuffle.partitions")
      .map(k => k -> spark.conf.getOption(k)).toMap
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64KB")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.shuffle.partitions", "8")
      val left = spark.range(0, 300000)
        .select(when(col("id") % 10 =!= 0, lit(0L)).otherwise(col("id")).as("k"),
          col("id").as("v"))
      val right = spark.range(0, 100).select(col("id").as("k"), (col("id") * 2).as("w"))
      val joined = left.join(right, "k")
      // execute THIS plan instance: AQE finalizes per QueryExecution, so a
      // separate write/count action would leave this one isFinalPlan=false
      joined.queryExecution.executedPlan.executeCollect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"), s"no skew split in final plan:\n$plan")
    } finally keep.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("partitioned parquet sink lays out events by day (100 TB layout)") {
    val out = java.nio.file.Files.createTempDirectory("graft_part").toString
    graft.ops.EventOps.events(spark, sf0001)
      .withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
      .write.mode("overwrite").partitionBy("day").parquet(out)
    val days = new java.io.File(out).listFiles().filter(_.isDirectory)
      .map(_.getName).filter(_.startsWith("day="))
    assert(days.length >= 28) // ~30 days of fixture events
    // partition pruning: reading one day scans only that directory
    val one = spark.read.parquet(out).filter(col("day") === days.head.stripPrefix("day="))
    val plan = one.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"), plan)
    assert(one.count() > 0)
  }

  test("dppJoin: the fact scan carries a dynamicpruning partition filter, result = static rule") {
    val df = graft.ops.RuntimeFilterOps.dppJoin(spark, sf0001)
    // the DPP subquery is planted at planning time on the partitioned scan
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("dynamicpruning"),
      s"expected a dynamicpruning PartitionFilter on the fact scan:\n$plan")
    val got = df.collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val want = graft.ops.EventOps.events(spark, sf0001)
      .filter(dayofmonth(to_date(col("ts"))) % 7 === 3)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), round(sum("value"), 4).as("sum_value"))
      .orderBy("event_type").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq == want.toSeq)
    assert(got.nonEmpty)
  }

  test("skewAudit: shares sum below 1, ordered by weight, straggler factor >= 1") {
    val rows = graft.ops.SkewOps.skewAudit(spark, sf0001).collect()
    assert(rows.length == 10)
    val cnts = rows.map(_.getAs[Long]("cnt"))
    assert(cnts.sameElements(cnts.sorted(Ordering[Long].reverse)))
    assert(rows.map(_.getAs[Double]("share")).sum < 1.0)
    // the heaviest key must be at least as loaded as the average key
    assert(rows.head.getAs[Double]("x_mean") >= 1.0)
    // share and x_mean reconcile: x_mean = share * nkeys
    val nkeys = graft.sources.Tables.load(spark, sf0001, "lineitem")
      .select("l_partkey").distinct().count()
    rows.foreach { r =>
      assert(math.abs(r.getAs[Double]("x_mean") -
        r.getAs[Double]("share") * nkeys) < 0.01 * nkeys)
    }
  }

  test("joinSizeEstimate: prediction equals the materialized join exactly") {
    import org.apache.spark.sql.functions._
    val r = graft.ops.SkewOps.joinSizeEstimate(spark, sf0001).collect().head
    val actual = graft.sources.Tables.load(spark, sf0001, "orders")
      .join(graft.sources.Tables.load(spark, sf0001, "lineitem"),
        col("o_orderkey") === col("l_orderkey")).count()
    assert(r.getAs[Long]("predicted_rows") == actual)
    assert(r.getAs[Long]("n_matched_keys") <=
      math.min(r.getAs[Long]("n_keys_left"), r.getAs[Long]("n_keys_right")))
    assert(r.getAs[Long]("max_key_rows") <= r.getAs[Long]("predicted_rows"))
  }
}
