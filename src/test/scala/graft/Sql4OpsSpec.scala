package graft

import graft.ops.{Relational, Sql4Ops}
import org.apache.spark.sql.functions._

/** Spark 4 SQL-surface operators (Sql4Ops): native recursive CTE, pipe
  * syntax, collations, SQL-body UDF + session variable. Each is checked for
  * value-equality against its classic-form twin so the sugar provably
  * changes the SYNTAX, not the answer; the recursive CTE is additionally
  * pinned to really use the native iterative executor (not our hand loop).
  */
class Sql4OpsSpec extends SparkSpec {

  test("recursive CTE census equals the iterative BFS rollup") {
    val rec = Sql4Ops.recursiveCte(spark, sf0001).collect().toSeq
    val bfs = Relational.bomRollup(spark, sf0001).collect().toSeq
    assert(rec == bfs)
  }

  test("recursive CTE runs through the native UnionLoop executor") {
    val plan = Sql4Ops.recursiveCte(spark, sf0001)
      .queryExecution.optimizedPlan.toString
    assert(plan.contains("UnionLoop"), s"expected UnionLoop in:\n$plan")
  }

  test("pipe syntax is sugar: equals the DataFrame join+agg form") {
    val piped = Sql4Ops.pipeSql(spark, sf0001).collect().toSeq
    val classic = graft.sources.Tables.load(spark, sf0001, "orders")
      .filter(col("o_orderstatus").isin("F", "O"))
      .join(graft.sources.Tables.load(spark, sf0001, "customer"),
        col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment", "o_orderstatus")
      .agg(count(lit(1)).as("n_orders"),
        round(sum("o_totalprice"), 4).as("revenue"),
        round(avg("o_totalprice"), 4).as("avg_price"))
      .orderBy("c_mktsegment", "o_orderstatus")
      .collect().toSeq
    assert(piped == classic)
  }

  test("collation census: case-insensitive distinct collapses the variants") {
    val rows = Sql4Ops.collationCensus(spark, sf0001).collect()
    assert(rows.nonEmpty)
    // UTF8_LCASE sees one spelling per segment; binary sees the injected ones
    assert(rows.forall(_.getAs[Long]("n_variants_ci") == 1L))
    assert(rows.exists(_.getAs[Long]("n_variants_binary") >= 2L))
    // census covers every segment exactly once
    val segs = rows.map(_.getAs[String]("seg_lc")).toSeq
    assert(segs == segs.distinct.sorted)
  }

  test("paramSql: bindings behave exactly like hand-written constants") {
    val bound = Sql4Ops.paramSql(spark, sf0001).collect().toSeq
    val inlined = graft.sources.Tables.load(spark, sf0001, "orders")
      .filter(col("o_totalprice") > Sql4Ops.ParamSqlFloor)
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_orders"),
        round(sum("o_totalprice"), 4).as("revenue"))
      .orderBy("o_orderpriority").collect().toSeq
    assert(bound == inlined)
  }

  test("observe: the inline gate metrics equal an independent aggregate") {
    val (df, obs) = graft.ops.Relational.observedOrders(spark, sf0001)
    val main = df.collect()
    assert(main.nonEmpty)
    val m = obs.get
    val truth = graft.sources.Tables.load(spark, sf0001, "orders")
      .agg(count(lit(1)), round(sum("o_totalprice"), 4),
        count(when(col("o_custkey").isNull, 1))).head()
    assert(m("rows_seen") == truth.getLong(0))
    assert(m("revenue_seen") == truth.getDouble(1))
    assert(m("null_keys") == truth.getLong(2))
  }

  test("SQL script: WHILE sweep equals the DataFrame threshold sweep") {
    val script = Sql4Ops.sqlScript(spark, sf0001).collect().toSeq
    val orders = graft.sources.Tables.load(spark, sf0001, "orders")
    val classic = (1 to Sql4Ops.ScriptSteps).map { k =>
      val t = k * Sql4Ops.ScriptStep
      orders.filter(col("o_totalprice") > t)
        .agg(count(lit(1)).as("n_orders"),
          round(coalesce(sum("o_totalprice"), lit(0.0)), 4).as("revenue"))
        .select(lit(t).as("threshold"), col("n_orders"), col("revenue"))
        .collect().head
    }
    assert(script == classic, s"got $script")
    // the top threshold must actually exercise the empty guard at sf0.001
    assert(script.last.getLong(1) == 0L && script.last.getDouble(2) == 0.0)
  }

  test("SQL-body UDF + session variable equal the inlined expression") {
    val udf = Sql4Ops.sqlUdfBands(spark, sf0001).collect().toSeq
    val inline = graft.sources.Tables.load(spark, sf0001, "orders")
      .filter(col("o_totalprice") > 50000.0)
      .withColumn("band",
        when(col("o_totalprice") < 150000.0, "low")
          .when(col("o_totalprice") < 300000.0, "mid")
          .otherwise("high"))
      .groupBy("band")
      .agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 4).as("total"))
      .orderBy("band")
      .collect().toSeq
    assert(udf == inline)
    assert(udf.map(_.getString(0)).toSet.subsetOf(Set("low", "mid", "high")))
  }

  test("SQL-body UDF stays declarative: no ScalaUDF in the optimized plan") {
    val plan = Sql4Ops.sqlUdfBands(spark, sf0001)
      .queryExecution.optimizedPlan.toString
    assert(!plan.contains("ScalaUDF"), s"SQL UDF was not inlined:\n$plan")
  }

  test("SQL table function equals the DataFrame per-segment top-k window form") {
    import org.apache.spark.sql.expressions.Window
    val tvf = Sql4Ops.sqlTableUdf(spark, sf0001).collect().toSeq
    val w = Window.partitionBy("c_mktsegment")
      .orderBy(col("c_acctbal").desc, col("c_custkey"))
    val window = graft.sources.Tables.load(spark, sf0001, "customer")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("c_mktsegment").as("seg"), col("c_custkey"), col("c_name"),
        round(col("c_acctbal"), 4).as("c_acctbal"))
      .orderBy(col("seg"), col("c_acctbal").desc, col("c_custkey"))
      .collect().toSeq
    assert(tvf == window)
    assert(tvf.size >= 3) // at least one segment's full top-3
  }

  test("SQL table function resolves to plain operators: no unresolved TVF, no ScalaUDF") {
    val plan = Sql4Ops.sqlTableUdf(spark, sf0001)
      .queryExecution.optimizedPlan.toString
    assert(!plan.contains("ScalaUDF"), s"table UDF left a black-box UDF:\n$plan")
    assert(!plan.contains("SQLTableFunction"),
      s"table UDF was not rewritten to plain operators:\n$plan")
  }
}
