package graft.ops

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** The typed `Dataset[T]` tier of the API, as a DECLARED query under the
  * hash gate (the untyped twin `q_groupby_avg` / `q_salted_agg` share the
  * oracle — same answer, different API tier, like the salted rewrite).
  *
  * When the typed tier is the right call: per-group logic a SQL aggregate
  * can't express (arbitrary Scala state machines — see the streaming
  * `mapGroupsWithState` twins) with compile-time row types. Its cost:
  * `groupByKey`'s key function and the Aggregator's reduce run on DECODED
  * objects, so the Encoder ser/de boundary exits whole-stage codegen —
  * keep it off 100 TB hot paths where `functions._` expressions suffice
  * (the design rule this repo follows everywhere else). The aggregation
  * itself still combines map-side: Aggregator's reduce/merge contract is
  * exactly a partial aggregate.
  */
object TypedOps {

  /** Single-pass (sum, count) mean over the value of a (flag, value) row —
    * associative merge, so it partial-aggregates like any builtin. */
  class MeanAgg extends Aggregator[(String, Double), (Double, Long), Double] {
    override def zero: (Double, Long) = (0.0, 0L)
    override def reduce(b: (Double, Long), r: (String, Double)): (Double, Long) =
      (b._1 + r._2, b._2 + 1)
    override def merge(a: (Double, Long), b: (Double, Long)): (Double, Long) =
      (a._1 + b._1, a._2 + b._2)
    override def finish(r: (Double, Long)): Double =
      if (r._2 == 0) 0.0 else r._1 / r._2
    override def bufferEncoder: Encoder[(Double, Long)] =
      Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong)
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** Declared query: mean discount per return flag through
    * `as[T] → groupByKey → Aggregator` — the flagship analytic computed by
    * the typed path, hash-checked against the same plain-AVG oracle the
    * untyped forms use. */
  def typedAvg(spark: SparkSession, sf: String): DataFrame = {
    import spark.implicits._
    Tables.load(spark, sf, "lineitem")
      .select(col("l_returnflag"), col("l_discount"))
      .as[(String, Double)]
      .groupByKey(_._1)
      .agg(new MeanAgg().toColumn.name("avg_discount"))
      .toDF("l_returnflag", "avg_discount")
      .select(col("l_returnflag"), round(col("avg_discount"), 4).as("avg_discount"))
      .orderBy("l_returnflag")
  }
}
