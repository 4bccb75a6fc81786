package graft

import org.apache.spark.sql.functions._

/** The real `format("jdbc")` connector path over EMBEDDED Derby
  * (SourceOps.jdbcRoundtrip): value equality with the original parquet,
  * server-side predicate pushdown pinned on the scan, and the partitioned
  * parallel read actually split into its declared stride tasks.
  */
class JdbcSpec extends SparkSpec {

  test("jdbcRoundtrip query equals the direct parquet aggregate") {
    val got = graft.ops.SourceOps.jdbcRoundtrip(spark, sf0001).collect().toSeq
    val want = graft.sources.Tables.load(spark, sf0001, "customer")
      .filter(col("c_acctbal") > 0)
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_cust"), round(sum("c_acctbal"), 4).as("sum_bal"))
      .orderBy("c_mktsegment").collect().toSeq
    assert(got == want, s"got $got")
  }

  test("the balance filter is pushed to the database, not applied post-scan") {
    val plan = graft.ops.SourceOps.jdbcRoundtrip(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("GreaterThan(c_acctbal"),
      s"expected a pushed c_acctbal filter in:\n$plan")
  }

  test("the partitioned read opens its declared number of stride tasks") {
    // 4 range strides over partitionColumn = 4 scan partitions, each its
    // own cursor — the parallel-ingest contract (empty strides included)
    assert(graft.ops.SourceOps.jdbcCustomer(spark, sf0001)
      .rdd.getNumPartitions == 4)
  }
}
