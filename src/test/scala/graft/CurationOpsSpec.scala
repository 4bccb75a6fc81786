package graft

import graft.ops.CurationOps
import org.apache.spark.sql.functions._

class CurationOpsSpec extends SparkSpec {

  test("dpRelease: neighboring datasets that differ only above the clamp release identically") {
    import spark.implicits._
    // two fixtures differing in ONE record's balance, both beyond DpClampHi:
    // contribution bounding makes the released sum IDENTICAL — the
    // sensitivity contract the Laplace scale was calibrated against
    def fixture(bal: Double): String = {
      val dir = java.nio.file.Files
        .createTempDirectory("graft_dp_fixture").toString
      Seq((1L, "SEG-A", bal), (2L, "SEG-A", 100.0), (3L, "SEG-B", -50.0))
        .toDF("c_custkey", "c_mktsegment", "c_acctbal")
        .write.mode("overwrite").parquet(s"$dir/customer.parquet")
      dir
    }
    val a = CurationOps.dpRelease(spark, fixture(10000.0)).collect().toSeq
    val b = CurationOps.dpRelease(spark, fixture(99999.0)).collect().toSeq
    assert(a == b, s"neighboring releases differ: $a vs $b")
    // and the noise is real: the released count is NOT the true count
    assert(a.forall(r => r.getDouble(1) != 2.0 && r.getDouble(1) != 1.0))
  }

  test("dpRelease: noise reproduces the inverse-CDF Laplace sampler exactly") {
    val rows = CurationOps.dpRelease(spark, sf0001).collect()
    val truth = graft.sources.Tables.load(spark, sf0001, "customer")
      .groupBy(org.apache.spark.sql.functions.col("c_mktsegment").as("segment"))
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      val seg = r.getString(0)
      val md5 = java.security.MessageDigest.getInstance("MD5")
        .digest(s"cnt|$seg".getBytes("UTF-8"))
        .take(4).map("%02x".format(_)).mkString
      val u = (java.lang.Long.parseLong(md5, 16).toDouble + 0.5) / 4294967296.0
      val noise = -(1.0 / CurationOps.DpEpsilon) * math.signum(u - 0.5) *
        math.log(1.0 - 2.0 * math.abs(u - 0.5))
      val want = BigDecimal(truth(seg) + noise)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(r.getDouble(1) == want, s"$seg: ${r.getDouble(1)} != $want")
    }
  }

  test("piiRedact: every injected email and IP is found and redacted") {
    val rows = CurationOps.piiRedact(spark, sf0001).collect()
    assert(rows.length == 500)
    rows.foreach { r =>
      assert(r.getLong(1) == 1L, s"doc ${r.getLong(0)}: n_emails=${r.getLong(1)}")
      assert(r.getLong(2) == 1L, s"doc ${r.getLong(0)}: n_ips=${r.getLong(2)}")
      val tail = r.getString(4)
      assert(tail.contains("<EMAIL>"), s"tail lacks <EMAIL>: $tail")
      assert(tail.contains("<IP>"), s"tail lacks <IP>: $tail")
      assert(!tail.contains("@"), s"unredacted email survives: $tail")
    }
  }

  test("piiRedact: long numbers are masked but short ones survive") {
    // ref=doc_id*7919: doc 0 -> ref=0 (1 digit, kept); doc 1 -> ref=7919
    // (4 digits, masked); doc 2 -> ref=15838 (5 digits, masked)
    val byId = CurationOps.piiRedact(spark, sf0001).collect()
      .map(r => r.getLong(0) -> r.getString(4)).toMap
    assert(byId(0L).endsWith("ref=0"))
    assert(byId(1L).endsWith("ref=<NUM>"))
    assert(byId(2L).endsWith("ref=<NUM>"))
  }

  test("fuzzyJoin recovers a best match for every corrupted name at distance <= 1") {
    val rows = CurationOps.fuzzyJoin(spark, sf0001).collect()
      .map(r => (r.getAs[Number](0).longValue, r.getString(1), r.getString(2), r.getLong(3)))
    assert(rows.length == 25) // every dirty name resolved
    rows.foreach { case (_, _, _, d) => assert(d <= 1L) }
    // a mid-string deletion can only match its own source name
    val r3 = rows.find(_._1 == 3L).get
    assert(r3._2 == "NATON_3" && r3._3 == "NATION_3" && r3._4 == 1L)
    // key 7 deletes the trailing digit -> 'NATION_' matches NATION_0 by the
    // deterministic (dist, name) tie-break
    val r7 = rows.find(_._1 == 7L).get
    assert(r7._2 == "NATION_" && r7._3 == "NATION_0" && r7._4 == 1L)
  }

  test("skyline rows are mutually non-dominating and complete vs brute force") {
    val parts = graft.sources.Tables.load(spark, sf0001, "part")
      .selectExpr("p_partkey", "p_size", "round(p_retailprice, 2) AS price")
      .collect().map(r => (r.getLong(0), r.getAs[Number](1).longValue, r.getDouble(2)))
    def dominates(a: (Long, Long, Double), b: (Long, Long, Double)) =
      a._2 <= b._2 && a._3 >= b._3 && (a._2 < b._2 || a._3 > b._3)
    val brute = parts.filter(p => !parts.exists(q => dominates(q, p))).map(_._1).toSet
    val got = CurationOps.skyline(spark, sf0001).collect().map(_.getLong(0)).toSet
    assert(got == brute, s"skyline mismatch: extra=${got -- brute} missing=${brute -- got}")
    assert(got.nonEmpty)
  }

  test("dataQuality counts exactly the planted violations on a corrupted fixture") {
    import spark.implicits._
    val dir = s"${System.getProperty("java.io.tmpdir")}/graft_dq_fixture"
    // one violation of each kind, one clean row each
    Seq(
      // (orderkey, partkey, suppkey, linenumber, qty, extprice, discount, tax, rf, ls, shipdate)
      (1L, 1L, 1L, 1L, 5.0, 100.0, 0.1, 0.0, "N", "O", "1996-01-10"),
      (99L, 1L, 1L, 1L, 5.0, 100.0, 0.1, 0.0, "N", "O", "1996-01-10"), // orphan order 99
      (1L, 2L, 1L, 2L, -3.0, 100.0, 0.1, 0.0, "N", "O", "1996-01-10"), // negative qty
      (1L, 3L, 1L, 3L, 5.0, 100.0, 1.5, 0.0, "N", "O", "1996-01-10"),  // discount > 1
      (1L, 4L, 1L, 4L, 5.0, 100.0, 0.1, 0.0, "N", "O", "1995-12-01"))  // ships before order
      .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
        "l_extendedprice", "l_discount", "l_tax", "l_returnflag", "l_linestatus", "l_shipdate")
      .withColumn("l_shipdate", to_date($"l_shipdate"))
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    Seq((1L, 1L, "O", 200.0, "1996-01-01", "1-URGENT"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .withColumn("o_orderdate", to_date($"o_orderdate"))
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    Seq((1L, "a", 1L, 10.0, Some("BUILDING")),
        (1L, "b", 1L, 10.0, Some("BUILDING")), // duplicate custkey
        (2L, "c", 1L, 10.0, None))             // null segment
      .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    val got = CurationOps.dataQuality(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map(
      "fk_lineitem_order" -> 1L, "unique_custkey" -> 1L, "qty_positive" -> 1L,
      "discount_in_unit_range" -> 1L, "mktsegment_not_null" -> 1L,
      "ship_after_order" -> 1L), s"got $got")
  }

  test("dataQuality on the harness fixture: intact where expected, and it catches the real inconsistency") {
    val got = CurationOps.dataQuality(spark, sf0001).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got.size == 6)
    // referentially intact and in-domain...
    Seq("fk_lineitem_order", "unique_custkey", "qty_positive",
      "discount_in_unit_range", "mktsegment_not_null")
      .foreach(name => assert(got(name) == 0L, s"$name: ${got(name)} violations"))
    // ...but the synthetic generator draws shipdate independently of the
    // order date, and the audit catches it — a real finding, not a bug
    assert(got("ship_after_order") > 0L)
  }

  test("fuzzyJoin plan: equi-join on the variant key, never an all-pairs scan") {
    val plan = CurationOps.fuzzyJoin(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast equi-join:\n$plan")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"fuzzy join degraded to all-pairs:\n$plan")
  }

  test("withHealthMetrics: observed counters match direct aggregates, same pass") {
    import org.apache.spark.sql.functions._
    val orders = graft.sources.Tables.load(spark, sf0001, "orders")
    val (observed, obs) = CurationOps.withHealthMetrics(orders, "o_custkey")
    // the downstream "real" job: an aggregate the pipeline already runs
    val revenue = observed.agg(sum("o_totalprice")).head().getDouble(0)
    assert(revenue > 0)
    val m = obs.get
    assert(m("n_rows") == orders.count())
    assert(m("n_key_null") == 0L)
    val exact = orders.select(count_distinct(col("o_custkey"))).head().getLong(0)
    val approx = m("n_key_approx_distinct").asInstanceOf[Long]
    // HLL default rsd 5%: generous 15% band keeps this deterministic-safe
    assert(math.abs(approx - exact) <= exact * 0.15, s"approx $approx exact $exact")
  }

  test("langEntropy: bounded by log2(n_langs), top_share consistent, counts reconcile") {
    val rows = CurationOps.langEntropy(spark, sf0001).collect()
    assert(rows.nonEmpty)
    val total = rows.map(_.getAs[Long]("n_docs")).sum
    assert(total == graft.sources.Tables.load(spark, sf0001, "documents").count())
    rows.foreach { r =>
      val h = r.getAs[Double]("entropy_bits")
      val k = r.getAs[Long]("n_langs").toDouble
      assert(h >= -1e-9 && h <= math.log(k) / math.log(2.0) + 1e-9,
        s"entropy $h outside [0, log2($k)]")
      val ts = r.getAs[Double]("top_share")
      // uniform lower bound: the heaviest of k classes holds >= 1/k
      assert(ts >= 1.0 / k - 1e-9 && ts <= 1.0)
    }
  }

  test("forgetCascade: censuses reconcile with direct recounts, cascade is consistent") {
    import org.apache.spark.sql.functions._
    val rows = CurationOps.forgetCascade(spark, sf0001).collect()
      .map(r => r.getAs[String]("table_name") ->
        (r.getAs[Long]("rows_before"), r.getAs[Long]("rows_deleted"),
         r.getAs[Long]("rows_after"))).toMap
    assert(rows.keySet == Set("customer", "orders", "lineitem"))
    rows.values.foreach { case (before, del, after) =>
      assert(after == before - del && del > 0, s"$before/$del/$after")
    }
    // direct recount of the order cascade
    val doomedOrders = graft.sources.Tables.load(spark, sf0001, "orders")
      .filter(col("o_custkey") % CurationOps.ForgetModulus === 0).count()
    assert(rows("orders")._2 == doomedOrders)
    // deleting the survivors' complement leaves no orphaned order
    val c = graft.sources.Tables.load(spark, sf0001, "customer")
      .filter(col("c_custkey") % CurationOps.ForgetModulus =!= 0)
    val orphans = graft.sources.Tables.load(spark, sf0001, "orders")
      .filter(col("o_custkey") % CurationOps.ForgetModulus =!= 0)
      .join(c, col("o_custkey") === col("c_custkey"), "left_anti").count()
    assert(orphans == 0)
  }

  test("urlDedup: canonical forms are clean, every doc accounted, variants collide") {
    val rows = CurationOps.urlDedup(spark, sf0001).collect()
    val nDocs = graft.sources.Tables.load(spark, sf0001, "documents").count()
    assert(rows.map(_.getAs[Long]("n_raw")).sum == nDocs)
    rows.foreach { r =>
      val u = r.getAs[String]("canonical_url")
      assert(u == u.toLowerCase, s"case survived: $u")
      assert(!u.contains(":80") && !u.contains("utm_") && !u.contains("ref="),
        s"decoration survived: $u")
      assert(!u.endsWith("/") && !u.endsWith("?") && !u.endsWith("&"),
        s"dangle survived: $u")
    }
    // canonicalization must actually merge variants: fewer groups than docs
    assert(rows.length < nDocs)
    assert(rows.exists(_.getAs[Long]("n_raw") > 1))
  }

  test("canonicalizeUrl: real params survive tracking-param removal") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val cases = Seq(
      ("http://example.com/a?utm_source=x&page=2",
       "http://example.com/a?page=2"),
      ("http://example.com/a?page=2&utm_source=x",
       "http://example.com/a?page=2"),
      ("http://example.com/a?utm_a=1&utm_b=2&page=2",
       "http://example.com/a?page=2"),
      ("HTTPS://Example.COM:80/a/?ref=nav", "https://example.com:80/a"),
      ("HTTPS://Example.COM:443/a/?ref=nav", "https://example.com/a"),
      ("http://example.com:80/a?utm_x=1", "http://example.com/a"),
      ("http://example.com/a?utm_source=a?page=2",
       "http://example.com/a?page=2"),
      // param names that merely END in 'ref' are real params, not tracking:
      // an unanchored '(utm_…|ref)=' would fire inside them ('href=x' →
      // 'h'), which is exactly the corruption the separator anchor prevents
      ("http://example.com/a?href=x&utm_b=2", "http://example.com/a?href=x"),
      ("http://example.com/a?aref=1&ref=nav", "http://example.com/a?aref=1"))
    val got = cases.map(_._1).toDF("u")
      .select(CurationOps.canonicalizeUrl(col("u")).as("c"))
      .collect().map(_.getString(0))
    got.zip(cases).foreach { case (g, (in, want)) =>
      assert(g == want, s"$in -> $g, wanted $want")
    }
  }

  test("tableChecksum is partition/order invariant and single-row sensitive") {
    val orders = graft.sources.Tables.load(spark, sf0001, "orders")
    def digests(df: org.apache.spark.sql.DataFrame) =
      CurationOps.tableChecksumFrom(df).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    val base = digests(orders)
    assert(base.nonEmpty)
    // any repartitioning / arrival order yields the same digest (XOR is
    // commutative) — this is the property that makes it cross-cluster safe
    assert(digests(orders.repartition(13)) == base)
    assert(digests(orders.orderBy(col("o_orderdate").desc)) == base)
    // flipping one row's priority flips exactly that group's digest,
    // leaves its count alone
    val mutated = orders.withColumn("o_orderpriority",
      when(col("o_orderkey") === 1L, lit("9-MUTATED"))
        .otherwise(col("o_orderpriority")))
    val mut = digests(mutated)
    val changedStatus = orders.filter(col("o_orderkey") === 1L)
      .select("o_orderstatus").collect().head.getString(0)
    base.zip(mut).foreach { case ((s, n, d), (s2, n2, d2)) =>
      assert(s == s2 && n == n2)
      if (s == changedStatus) assert(d != d2, s"group $s digest should move")
      else assert(d == d2, s"group $s digest should not move")
    }
  }

  test("tableChecksum distinguishes rows that differ only in NULL position") {
    // without per-field sentinels, concat_ws would render both rows as the
    // same payload (it silently skips NULLs) and the digests would collide
    import java.sql.Timestamp
    val ts = Timestamp.valueOf("1997-01-01 00:00:00")
    import spark.implicits._
    def frame(status: Option[String], prio: Option[String]) =
      Seq((1L, 2L, status, ts, prio))
        .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_orderdate",
          "o_orderpriority")
    def digest(df: org.apache.spark.sql.DataFrame) =
      CurationOps.tableChecksumFrom(df).collect().map(_.getLong(2)).toSeq
    assert(digest(frame(None, Some("P1"))) != digest(frame(Some("P1"), None)))
  }

  test("kAnonymity: classes partition the table, verdicts consistent with the thresholds") {
    val rows = CurationOps.kAnonymity(spark, sf001).collect()
    assert(rows.nonEmpty)
    val total = graft.sources.Tables.load(spark, sf001, "customer").count()
    assert(rows.map(_.getAs[Long]("class_size")).sum == total)
    rows.foreach { r =>
      val size = r.getAs[Long]("class_size")
      val ldiv = r.getAs[Long]("l_diversity")
      assert(r.getAs[Boolean]("k_anonymous") == (size >= CurationOps.KAnonThreshold))
      assert(r.getAs[Boolean]("l_diverse") == (ldiv >= 2L))
      assert(ldiv >= 1L && ldiv <= 4L && ldiv <= size)
    }
    // QI classes are unique — the audit is a census, not a sample
    val keys = rows.map(r => (r.getAs[String]("segment"), r.getAs[Long]("nation")))
    assert(keys.toSet.size == keys.length)
  }
}
