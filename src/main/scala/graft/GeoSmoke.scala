package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.GeoOps

/** Geo-join scale smoke (PLANS.md growth-exponent tables, VERDICT r9 #2):
  * times the banded cell-blocked distance join at two sizes on synthetic
  * point sets generated in-plan (`spark.range` + the same latOf/lonOf key
  * derivation the declared query uses), so exponents are measured on one
  * distribution with zero fixture IO. Two regimes per size:
  *
  *  - `uniform`: keys → points over ±60° (the declared query's
  *    distribution; candidate volume grows ~linearly — cells get denser
  *    but the 3×3 neighborhood stays O(1) cells).
  *  - `hot_cell`: EVERY point inside one 0.5°×0.5° city box — the
  *    adversarial skew case. Blocking degenerates to one cell = all
  *    pairs; the measured ~quadratic exponent is the documented cost of
  *    unmitigated single-cell skew (the salting/AQE note in GeoOps), and
  *    the run proves the plan survives it rather than OOMing.
  *
  * Each (size, case) runs twice in one JVM; read the WARM rep-2 number.
  * Usage: runMain graft.GeoSmoke [nCust1 nCust2 ...]  (default 15000 150000;
  * suppliers = nCust/15, the TPC-H ratio the declared query joins at).
  */
object GeoSmoke {
  def main(args: Array[String]): Unit = {
    val sizes = if (args.nonEmpty) args.toSeq.map(_.toInt) else Seq(15000, 150000)
    val spark = SparkSession.builder().master("local[32]")
      .withExtensions(new graft.functions.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def uniform(n: Int, keyCol: String, latCol: String, lonCol: String): DataFrame =
      spark.range(1, n + 1).select(col("id").as(keyCol),
        GeoOps.latOf(col("id")).as(latCol), GeoOps.lonOf(col("id")).as(lonCol))
    // one 0.5°×0.5° box at 40°N — everything lands in a single 6°-band cell
    def hotCell(n: Int, keyCol: String, latCol: String, lonCol: String): DataFrame =
      spark.range(1, n + 1).select(col("id").as(keyCol),
        (lit(40.0) + (col("id") * 37L % 500L).cast("double") / 1000.0).as(latCol),
        (lit(10.0) + (col("id") * 53L % 500L).cast("double") / 1000.0).as(lonCol))

    for (n <- sizes; skew <- Seq(false, true); rep <- 1 to 2) {
      val gen = if (skew) hotCell _ else uniform _
      val name = if (skew) "hot_cell" else "uniform"
      // hot-cell pair volume is n·m in ONE cell: keep it at decade-feasible
      // sizes (n/5 × m) so 10× growth is still measurable in minutes
      val (nc, ns) = if (skew) (n / 5, n / 75) else (n, n / 15)
      val a = gen(nc, "a_key", "a_lat", "a_lon")
      val b = gen(ns, "b_key", "b_lat", "b_lon")
      val t0 = System.nanoTime()
      val rows = GeoOps.geoJoinFrom(a, b).count()
      val dt = (System.nanoTime() - t0) / 1e9
      System.err.println(f"[smoke] geo n=$nc%-7d m=$ns%-6d $name%-9s rep$rep ${dt}%8.2f s  ($rows pairs)")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
