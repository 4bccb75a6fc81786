package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deep-recursion scale smoke (PLANS.md, VERDICT r10 #3): two arms.
  *
  * ARM 1 — planted DEEP chain for weighted SSSP: a path graph 0—1—…—n
  * (the adversarial depth regime the co-purchase fixture's ~3-hop diameter
  * never exercises) with one seed at node 0, relaxed for a FIXED 16 rounds
  * at two sizes. Expected ~linear in n at fixed rounds: each Bellman-Ford
  * round scans the edge list once against a ≤ rounds-sized distance table,
  * and `localCheckpoint` keeps round r's plan independent of r — the two
  * properties that make depth safe at scale.
  *
  * ARM 2 — native `WITH RECURSIVE` (UnionLoop) vs the hand-rolled
  * checkpointed iterative frontier, on a depth-d chain over `range(n)`
  * (parent = id−1, seed 0, so the recursion runs exactly d rounds of
  * O(1)-row frontiers): measures PER-ROUND FIXED OVERHEAD — driver
  * scheduling + (for the iterative form) one localCheckpoint per round —
  * which is what decides the crossover between the two forms when data
  * per round is small. The data-dominated regime is already covered by
  * the declared q_recursive_cte / q_khop pair at sf0.01→sf0.1.
  *
  * Each case runs twice in one JVM; read the WARM rep-2 number.
  * Usage: runMain graft.DeepSmoke
  */
object DeepSmoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .withExtensions(new graft.functions.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def time(tag: String, rep: Int)(body: => Long): Unit = {
      val t0 = System.nanoTime()
      try {
        val out = body
        System.err.println(
          f"[deep] $tag%-38s rep$rep ${(System.nanoTime() - t0) / 1e9}%8.2f s  ($out)")
      } catch {
        // a failing arm is itself a measurement (e.g. UnionLoop's default
        // 100-level recursion limit at depth 128) — record it, keep going
        case e: Throwable => System.err.println(
          s"[deep] $tag rep$rep FAILED: ${e.getMessage.linesIterator.next()}")
      }
    }

    // ARM 1: chain SSSP, fixed 16 relaxation rounds, n and 10n
    for (n <- Seq(100000, 1000000); rep <- 1 to 2)
      time(s"sssp_chain n=$n hops=16", rep) {
        val e = spark.range(n).select(col("id").as("u"), (col("id") + 1).as("v"))
        val dir = e.union(e.select(col("v").as("u"), col("u").as("v")))
          .select(col("u").as("src"), col("v").as("dst"), lit(1L).as("w"))
        val seeds = Seq(0L).toDF("node")
        graft.ops.GraphOps.ssspFrom(spark, dir, seeds, 16).count()
      }

    // ARM 2: depth-d chain, native UnionLoop vs checkpointed iteration
    for (d <- Seq(8, 32, 128); rep <- 1 to 2) {
      // past 100 levels the native form needs an explicit MAX RECURSION
      // LEVEL (default limit 100: RECURSION_LEVEL_LIMIT_EXCEEDED) — the
      // iterative form below has no such ceiling
      val lvl = if (d >= 100) s" MAX RECURSION LEVEL ${2 * d}" else ""
      time(s"recursive_cte chain depth=$d", rep) {
        spark.sql(s"""
          WITH RECURSIVE r$lvl AS (
            SELECT CAST(0 AS BIGINT) AS k
            UNION ALL
            SELECT c.id FROM range($d) c JOIN r ON c.id = r.k + 1)
          SELECT count(*) FROM r""").head().getLong(0)
      }
      time(s"iterative chain depth=$d", rep) {
        val nodes = spark.range(d)
        var frontier = Seq(0L).toDF("k").localCheckpoint()
        var total = 1L
        for (_ <- 1 until d) {
          frontier = nodes.join(frontier, col("id") === col("k") + 1)
            .select(col("id").as("k")).localCheckpoint()
          total += frontier.count()
        }
        total
      }
    }
    spark.stop()
  }
}
