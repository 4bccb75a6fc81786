package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** As-of-join hot-key scale smoke (PLANS.md growth-exponent tables,
  * VERDICT r10 #1): times the union + ordered-window as-of plan on the
  * adversarial fixture the old equi-join+max_by form could not survive —
  * ONE user with n events AND n orders, where the join form materializes
  * n² intermediate rows (10⁸ at n=10k) while the window form sorts 2n.
  * Measured at two decades on the same in-plan synthetic distribution
  * (spark.range, one order/event per day), warm rep-2 numbers; the
  * expected exponent is ~1 (n·log n sort over a single partition — the
  * hot key deliberately defeats parallelism, which is the point: the
  * plan's cost is linearithmic in the KEY's size, not quadratic).
  *
  * Usage: runMain graft.AsofSmoke [n1 n2 ...]  (default 10000 100000)
  */
object AsofSmoke {
  def main(args: Array[String]): Unit = {
    val sizes = if (args.nonEmpty) args.toSeq.map(_.toInt) else Seq(10000, 100000)
    val spark = SparkSession.builder().master("local[32]")
      .withExtensions(new graft.functions.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (n <- sizes; rep <- 1 to 2) {
      val ev = spark.range(n).select(
        col("id").as("event_id"), lit(7L).as("user_id"),
        to_timestamp(date_add(lit("2000-01-01").cast("date"),
          (col("id") % 1000000).cast("int"))).as("ts"))
      val ord = spark.range(n).select(
        lit(7L).as("o_custkey"), col("id").as("o_orderkey"),
        date_add(lit("2000-01-01").cast("date"),
          (col("id") % 1000000).cast("int")).as("o_orderdate"),
        (col("id") * 1.5).as("o_totalprice"))
      val t0 = System.nanoTime()
      val rows = graft.ops.EventOps.asofJoinFrom(ev, ord).count()
      val dt = (System.nanoTime() - t0) / 1e9
      System.err.println(f"[asof] n=$n%-8d rep$rep ${dt}%8.2f s  ($rows rows)")
    }
    spark.stop()
  }
}
