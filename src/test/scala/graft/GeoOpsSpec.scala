package graft

import org.apache.spark.sql.functions._

import graft.ops.GeoOps

/** The spatial tier's one load-bearing claim: cell blocking is EXACT —
  * the candidate neighborhood provably covers the threshold at every
  * latitude in range, including across the antimeridian, so the blocked
  * join equals brute force. Value parity rides the DuckDB oracle
  * (q_geo_join, a literal cross-join-filter).
  */
class GeoOpsSpec extends SparkSpec {
  import spark.implicits._

  private def key(r: org.apache.spark.sql.Row) =
    (r.getLong(0), r.getLong(1), r.getDouble(2))

  test("cell-blocked distance join equals brute force, antimeridian included") {
    val rnd = new scala.util.Random(7)
    def pts(n: Int) = (1 to n).map(i =>
      (i.toLong, -59.9 + rnd.nextDouble * 119.8, -180.0 + rnd.nextDouble * 360.0))
    // plant a cross-dateline near-pair (~10.8 km apart at lat 10) that a
    // non-wrapping cell key would silently miss
    val a = (pts(120) :+ (999L, 10.0, -179.95)).toDF("a_key", "a_lat", "a_lon")
    val b = (pts(40) :+ (888L, 10.0, 179.95)).toDF("b_key", "b_lat", "b_lon")
    val blocked = GeoOps.geoJoinFrom(a, b).collect().map(key).toSet
    val brute = a.crossJoin(b)
      .select(col("a_key"), col("b_key"),
        round(GeoOps.haversineKm(col("a_lat"), col("a_lon"),
          col("b_lat"), col("b_lon")), 4).as("d"))
      .filter(col("d") <= GeoOps.ThresholdKm)
      .collect().map(key).toSet
    assert(blocked == brute,
      s"missed: ${brute -- blocked}; extra: ${blocked -- brute}")
    assert(blocked.exists { case (ak, bk, d) => ak == 999L && bk == 888L && d < 15.0 },
      "the planted antimeridian pair must be found")
  }

  test("declared query: every reported pair is within threshold and plan is an equi-join") {
    val df = GeoOps.geoJoin(spark, sf0001)
    val rows = df.collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getDouble(2) <= GeoOps.ThresholdKm))
    // candidate generation must be an equi-join on the cell key — a
    // cartesian/broadcast-nested-loop here means blocking fell apart
    val plan = df.queryExecution.sparkPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("geoNearest: one row per covered customer, the true argmin of its candidates") {
    val pairs = GeoOps.geoJoin(spark, sf0001).collect()
      .groupBy(_.getLong(0))
    val nearest = GeoOps.geoNearest(spark, sf0001).collect()
    assert(nearest.nonEmpty)
    assert(nearest.map(_.getLong(0)).toSet == pairs.keySet, "exactly the covered customers")
    nearest.foreach { r =>
      val best = pairs(r.getLong(0)).minBy(p => (p.getDouble(2), p.getLong(1)))
      assert((r.getLong(1), r.getDouble(2)) == ((best.getLong(1), best.getDouble(2))))
    }
  }
}
