package graft

/** Contract-wide smoke: EVERY declared query builds, executes at sf0.001,
  * and returns rows. Catches a broken builder or an sf-dependent assumption
  * before the driver's Verify does. */
class ContractSmokeSpec extends SparkSpec {

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name runs and returns rows at sf0.001") {
      val df = fn(spark, sf0001)
      assert(df.columns.nonEmpty)
      assert(df.count() > 0, s"$name returned zero rows")
      // several query builders persist() shared frames and rely on the
      // caller-side cache contract (Bench/Verify clearCache per query) —
      // honor it here too, or the suite accumulates one cache per query
      spark.catalog.clearCache()
    }
  }

  test("entry returns rows (driver t1 smoke)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a query (no orphan oracles)") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"orphan oracles: $orphans")
  }

  test("every staged query name is a declared query") {
    val unknown = graft.ops.SourceOps.stagedQueries.toSet -- SparkEntry.queries.keySet
    assert(unknown.isEmpty, s"stagedQueries not in registry: $unknown")
  }
}
