package graft

import graft.ops.CurationOps

class CurationOpsSpec extends SparkSpec {

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

  test("fuzzyJoin plan: equi-join on the variant key, never an all-pairs scan") {
    val plan = CurationOps.fuzzyJoin(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast equi-join:\n$plan")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"fuzzy join degraded to all-pairs:\n$plan")
  }
}
