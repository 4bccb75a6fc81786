package graft

import org.apache.spark.sql.functions._
import graft.ops.{Relational, TpchOps}
import graft.sources.Tables

class TpchSpec extends SparkSpec {

  test("q3 SQL front door equals the same query built with the DataFrame API") {
    val sqlSide = TpchOps.shippingPriority(spark, sf0001).collect()
    val cut = lit(s"${TpchOps.Q3Cutoff} 00:00:00").cast("timestamp")
    val dfSide = Tables.load(spark, sf0001, "customer")
      .filter(col("c_mktsegment") === "BUILDING")
      .join(Tables.load(spark, sf0001, "orders").filter(col("o_orderdate") < cut),
        col("c_custkey") === col("o_custkey"))
      .join(Tables.load(spark, sf0001, "lineitem").filter(col("l_shipdate") > cut),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate").cast("date").as("o_orderdate"),
        col("o_orderpriority"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4)
        .as("revenue"))
      .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10).collect()
    assert(sqlSide.toSeq == dfSide.toSeq)
  }

  test("q5 plan broadcasts the tiny dims and keeps one shuffle join chain") {
    val plan = TpchOps.localSupplierVolume(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(500))
    // region/nation must never arrive via shuffle
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan.take(500))
  }

  test("q5 revenue agrees with a two-join recompute restricted to one nation") {
    val out = TpchOps.localSupplierVolume(spark, sf0001).collect()
    assert(out.nonEmpty)
    // every reported nation must be in ASIA
    val asiaNations = Tables.load(spark, sf0001, "nation")
      .join(Tables.load(spark, sf0001, "region"),
        col("n_regionkey") === col("r_regionkey"))
      .filter(col("r_name") === "ASIA")
      .select("n_name").collect().map(_.getString(0)).toSet
    out.foreach(r => assert(asiaNations.contains(r.getAs[String]("n_name"))))
  }

  test("q1 aggregate identities: sum = avg * n per group, discount never raises price") {
    val rows = TpchOps.pricingSummary(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getAs[Long]("n").toDouble
      assert(math.abs(r.getAs[Double]("sum_qty") - r.getAs[Double]("avg_qty") * n) < 1.0)
      assert(r.getAs[Double]("sum_disc_price") <= r.getAs[Double]("sum_base_price"))
    }
  }

  test("q18: the agg-then-join plan aggregates lineitem before any join") {
    val df = TpchOps.largeOrders(spark, sf0001)
    val rows = df.collect()
    assert(rows.nonEmpty && rows.length <= 20)
    // monotone by total_qty desc
    val qtys = rows.map(_.getAs[Double]("total_qty"))
    assert(qtys.sameElements(qtys.sorted(Ordering[Double].reverse)))
    // every reported order really exceeds the threshold when recomputed
    val recheck = Tables.load(spark, sf0001, "lineitem")
      .groupBy("l_orderkey").agg(sum("l_quantity").as("q")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    rows.foreach(r =>
      assert(recheck(r.getAs[Long]("o_orderkey")) > TpchOps.Q18MinQty))
  }

  test("mvRefreshFrom with an empty feed returns the base MV unchanged") {
    import spark.implicits._
    import graft.ops.Relational
    val old = Seq((1L, 10.0), (2L, 20.0), (21L, 30.0)).toDF("key", "bal")
    val feed = Seq.empty[(Long, String, Option[Double], Option[Double])]
      .toDF("key", "op", "old_bal", "new_bal")
    val got = Relational.mvRefreshFrom(old, feed)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq == Seq((1L, 2L, 40.0), (2L, 1L, 20.0)))
  }

  test("null semantics: counts reconcile and null-safe equality is total") {
    val rows = Relational.nullSemantics(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nTotal, nX, nXNull) = (r.getAs[Long]("n_total"),
        r.getAs[Long]("n_x"), r.getAs[Long]("n_x_null"))
      assert(nX + nXNull == nTotal) // count(col) skips exactly the NULLs
      // x <=> y: equal where both non-null (status P) — never undefined,
      // so the count is between 0 and n_total
      val eq = r.getAs[Long]("n_nullsafe_eq")
      assert(eq >= 0 && eq <= nTotal)
    }
    // statuses are O/F/P: x null iff 'O', y null iff 'F', equal iff 'P'
    val statuses = Tables.load(spark, sf0001, "orders")
      .groupBy("o_orderstatus").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val totalEq = rows.map(_.getAs[Long]("n_nullsafe_eq")).sum
    assert(totalEq == statuses.getOrElse("P", 0L))
  }
}
