package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch micro-repro for the graph-loop per-iteration cost (r19
  * optimization round instrument; never on a query path): synthesizes an
  * edge table the size/shape of pageRank's undDeg and times one
  * join+aggregate pass per variant. */
object IterRepro {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val n = 20000L
    val und = spark.range(2400000)
      .select((col("id") % n).as("s"), ((col("id") * 7 + 3) % n).as("d"))
    val deg = und.groupBy("s").agg(count(lit(1)).as("outdeg"))
    val undDeg = und.join(deg, "s").repartition(32, col("s")).persist()
    println("rows=" + undDeg.count())
    var ranks = undDeg.select(col("s").as("nd")).distinct()
      .withColumn("r", lit(1.0 / n))
    def pass(tag: String)(body: => Unit): Unit = {
      val t0 = System.nanoTime()
      body
      println(f"[repro] $tag%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
    }
    // warm
    (1 to 2).foreach { _ =>
      ranks = undDeg.join(broadcast(ranks), undDeg("s") === ranks("nd"))
        .groupBy(col("d")).agg(sum(col("r") / col("outdeg")).as("inflow"))
        .select(col("d").as("nd"), (lit(0.15 / n) + lit(0.85) * col("inflow")).as("r"))
        .localCheckpoint()
    }
    (1 to 5).foreach { i =>
      pass(s"join+agg+ckpt $i") {
        ranks = undDeg.join(broadcast(ranks), undDeg("s") === ranks("nd"))
          .groupBy(col("d")).agg(sum(col("r") / col("outdeg")).as("inflow"))
          .select(col("d").as("nd"), (lit(0.15 / n) + lit(0.85) * col("inflow")).as("r"))
          .localCheckpoint()
      }
    }
    // variant: no checkpoint, just noop-write the one-iteration frame
    (1 to 3).foreach { i =>
      pass(s"join+agg noop $i") {
        undDeg.join(broadcast(ranks), undDeg("s") === ranks("nd"))
          .groupBy(col("d")).agg(sum(col("r") / col("outdeg")).as("inflow"))
          .write.format("noop").mode("overwrite").save()
      }
    }
    // variant: agg only (no join)
    (1 to 3).foreach { i =>
      pass(s"agg only $i") {
        undDeg.groupBy(col("d")).agg(sum(col("outdeg").cast("double")).as("x"))
          .write.format("noop").mode("overwrite").save()
      }
    }
    // variant: scan only
    (1 to 3).foreach { i =>
      pass(s"scan only $i") {
        undDeg.select(sum(col("s"))).write.format("noop").mode("overwrite").save()
      }
    }
    // width sweep: cache AND shuffle width pinned to p for the iteration
    Seq(16, 8, 4, 2).foreach { p =>
      spark.conf.set("spark.sql.shuffle.partitions", p.toString)
      val ud = und.join(deg, "s").repartition(p, col("s")).persist()
      ud.count()
      var rk = ud.select(col("s").as("nd")).distinct().withColumn("r", lit(1.0 / n))
      rk = ud.join(broadcast(rk), ud("s") === rk("nd"))
        .groupBy(col("d")).agg(sum(col("r") / col("outdeg")).as("inflow"))
        .select(col("d").as("nd"), (lit(0.15 / n) + lit(0.85) * col("inflow")).as("r"))
        .localCheckpoint() // warm
      (1 to 4).foreach { i =>
        pass(s"width=$p iter $i") {
          rk = ud.join(broadcast(rk), ud("s") === rk("nd"))
            .groupBy(col("d")).agg(sum(col("r") / col("outdeg")).as("inflow"))
            .select(col("d").as("nd"), (lit(0.15 / n) + lit(0.85) * col("inflow")).as("r"))
            .localCheckpoint()
        }
      }
      ud.unpersist()
    }
    spark.stop()
  }
}
