package graft

import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions

class VectorExpressionsSpec extends SparkSpec {
  import spark.implicits._

  test("native dot_product matches the composable aggregate/zip_with form") {
    val df = Seq((Array(1.5, -2.0, 3.25), Array(4.0, 0.5, -1.0))).toDF("a", "b")
    val native = df.select(VectorFunctions.dot_product(col("a"), col("b"))).head().getDouble(0)
    val composed = df.select(
      aggregate(zip_with(col("a"), col("b"), (x, y) => x * y), lit(0.0), (s, x) => s + x))
      .head().getDouble(0)
    assert(native == composed) // bit-identical, same summation order
    assert(native == 1.5 * 4.0 + -2.0 * 0.5 + 3.25 * -1.0)
  }

  test("native cosine_sim is bit-identical to dot/(sqrt*sqrt)") {
    val df = Seq((Array(0.1, 0.2, 0.7), Array(0.3, 0.9, 0.11))).toDF("a", "b")
    val fused = df.select(VectorFunctions.cosine_sim(col("a"), col("b"))).head().getDouble(0)
    val composed = df.select(
      VectorFunctions.dot_product(col("a"), col("b")) /
        (sqrt(VectorFunctions.dot_product(col("a"), col("a"))) *
          sqrt(VectorFunctions.dot_product(col("b"), col("b"))))).head().getDouble(0)
    assert(fused == composed)
  }

  test("expressions survive codegen over many rows and null inputs") {
    val df = (1 to 1000).map(i => (Array(i.toDouble, 1.0), Array(2.0, i.toDouble)))
      .toDF("a", "b")
    val s = df.select(sum(VectorFunctions.dot_product(col("a"), col("b")))).head().getDouble(0)
    assert(s == (1 to 1000).map(i => 3.0 * i).sum)
    val withNull = Seq((Some(Array(1.0)), Option.empty[Array[Double]])).toDF("a", "b")
    assert(withNull.select(VectorFunctions.dot_product(col("a"), col("b"))).head().isNullAt(0))
  }

  test("native functions are SQL-callable once registered (extensions path)") {
    // the shared test session predates extension wiring, so inject into its
    // registry the same way GraftExtensions does at session build time
    spark.sessionState.functionRegistry.registerFunction(
      org.apache.spark.sql.catalyst.FunctionIdentifier("dot_product"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[graft.functions.DotProduct].getName, "dot_product"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        graft.functions.DotProduct(children(0), children(1)))
    val r = spark.sql("SELECT dot_product(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d")
      .head().getDouble(0)
    assert(r == 11.0)
    // and the extension hook itself injects without error
    new graft.functions.GraftExtensions()(new org.apache.spark.sql.SparkSessionExtensions)
  }

  test("GraftExtensions wires a full session: SQL function + TopK strategy") {
    import org.apache.spark.sql.SparkSession
    // getOrCreate returns the shared test session (ignoring extensions)
    // unless the active/default slots are cleared first — build a REAL
    // extension-wired session on the same SparkContext, restore after
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .config("spark.sql.shuffle.partitions", "2")
        .withExtensions(new graft.functions.GraftExtensions)
        .getOrCreate()
      val r = s2.sql("SELECT cosine_sim(array(1.0d, 0.0d), array(1.0d, 0.0d)) AS c")
        .head().getDouble(0)
      assert(math.abs(r - 1.0) < 1e-12)
      // the strategy arrived via injectPlannerStrategy, not the
      // experimental-registration side door
      import s2.implicits._
      val base = Seq(("a", 1L, 3.0), ("a", 2L, 2.0), ("a", 3L, 1.0))
        .toDF("k", "id", "v")
      val frame = org.apache.spark.sql.graft.TopKPerKey
        .frameOnly(base, 1, Seq("k"), Seq("v" -> false, "id" -> true))
      assert(frame.queryExecution.executedPlan.toString.contains("TopKPerKey"))
      assert(frame.collect().map(r2 => (r2.getAs[String]("k"),
        r2.getAs[Double]("v"))).toSeq == Seq(("a", 3.0)))
      // KLL sketch surface is SQL-callable through the same extension:
      // build, merge (across 4 grouped sketches) and query — the median
      // of 0..1000 must land within the k=200 rank-error envelope (±1.65%
      // of 1001 ranks ≈ ±17; ±50 allows slack)
      val kllMed = s2.sql(
        """SELECT kll_quantile(kll_union_agg(sk), 0.5d) AS med FROM (
          |  SELECT kll_sketch_agg(CAST(id AS DOUBLE)) AS sk
          |  FROM range(1001) GROUP BY id % 4)""".stripMargin)
        .head().getDouble(0)
      assert(math.abs(kllMed - 500.0) <= 50.0, s"kll median $kllMed")
      // explicit-k form parses; plain-decimal rank literal and an integer
      // value column both work (review r9: a strict DOUBLE check rejected
      // `0.5` = DECIMAL(1,1) and unwidened int columns)
      assert(s2.sql("SELECT kll_quantile(kll_sketch_agg(id, 128), 0.5) FROM range(100)")
        .head().getDouble(0) > 0.0)
    } finally {
      SparkSession.setDefaultSession(spark)
      SparkSession.setActiveSession(spark)
    }
  }

  test("TopKRewriteRule: window row_number filter rewrites to the heap operator") {
    import org.apache.spark.sql.SparkSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .config("spark.sql.shuffle.partitions", "2")
        .withExtensions(new graft.functions.GraftExtensions)
        .getOrCreate()
      import s2.implicits._
      import org.apache.spark.sql.expressions.Window
      import org.apache.spark.sql.functions._
      val base = Seq(
        ("a", 1L, 3.0), ("a", 2L, 2.0), ("a", 3L, 1.0),
        ("b", 4L, 9.0), ("b", 5L, 8.0)).toDF("k", "id", "v")
      val w = Window.partitionBy("k").orderBy(col("v").desc, col("id"))
      // the user writes the UNIVERSAL window form...
      val windowForm = base.withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 2)
      // ...and the optimizer swaps in the custom operator
      assert(windowForm.queryExecution.optimizedPlan.collect {
        case t: org.apache.spark.sql.graft.TopKPerKey => t
      }.size == 1, windowForm.queryExecution.optimizedPlan.toString)
      assert(windowForm.queryExecution.executedPlan.toString
        .contains("TopKPerKey"))
      val got = windowForm.orderBy("k", "rk").collect()
        .map(r => (r.getString(0), r.getInt(3), r.getLong(1))).toSeq
      assert(got == Seq(("a", 1, 1L), ("a", 2, 2L), ("b", 1, 4L), ("b", 2, 5L)))
      // rank column keeps its name and IntegerType (exprId-preserving cast)
      assert(windowForm.schema("rk").dataType ==
        org.apache.spark.sql.types.IntegerType)
      // the library's own idiom — BIGINT rank for oracle parity — must
      // rewrite through the interposed cast Project
      val castForm = base.withColumn("rk", row_number().over(w).cast("long"))
        .filter(col("rk") <= 2)
      assert(castForm.queryExecution.optimizedPlan.collect {
        case t: org.apache.spark.sql.graft.TopKPerKey => t
      }.size == 1, castForm.queryExecution.optimizedPlan.toString)
      assert(castForm.schema("rk").dataType ==
        org.apache.spark.sql.types.LongType)
      val gotCast = castForm.orderBy("k", "rk").collect()
        .map(r => (r.getString(0), r.getLong(3), r.getLong(1))).toSeq
      assert(gotCast == Seq(("a", 1L, 1L), ("a", 2L, 2L), ("b", 1L, 4L), ("b", 2L, 5L)))
      // ADVICE r8: a legal variant keeps the ORIGINAL int rank column AND
      // filters on a separate cast column. The rank attribute is then a
      // bare pass-through in the Project — it must be re-derived from the
      // operator's long rank, not passed through (the Window that produced
      // it is gone; the unpatched rule failed attribute binding here).
      val keepBoth = base.withColumn("rk", row_number().over(w))
        .withColumn("rkl", col("rk").cast("long"))
        .filter(col("rkl") <= 2)
      assert(keepBoth.queryExecution.optimizedPlan.collect {
        case t: org.apache.spark.sql.graft.TopKPerKey => t
      }.size == 1, keepBoth.queryExecution.optimizedPlan.toString)
      assert(keepBoth.schema("rk").dataType ==
        org.apache.spark.sql.types.IntegerType)
      assert(keepBoth.schema("rkl").dataType ==
        org.apache.spark.sql.types.LongType)
      val gotBoth = keepBoth.orderBy("k", "rk").collect()
        .map(r => (r.getString(0), r.getInt(3), r.getLong(4), r.getLong(1))).toSeq
      assert(gotBoth == Seq(("a", 1, 1L, 1L), ("a", 2, 2L, 2L),
        ("b", 1, 1L, 4L), ("b", 2, 2L, 5L)))
      // edge cases through the rewritten operator: groups smaller than k
      // (heap never fills) and the rk = 1 argmax form
      val small = Seq(("a", 1L, 5.0), ("b", 2L, 4.0), ("b", 3L, 6.0))
        .toDF("k", "id", "v")
      val under = small.withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 10)
      assert(under.queryExecution.optimizedPlan.collect {
        case t: org.apache.spark.sql.graft.TopKPerKey => t }.size == 1)
      assert(under.count() == 3) // k > group size emits every row
      val argmax = small.withColumn("rk", row_number().over(w))
        .filter(col("rk") === 1)
      assert(argmax.queryExecution.optimizedPlan.collect {
        case t: org.apache.spark.sql.graft.TopKPerKey => t }.size == 1)
      assert(argmax.orderBy("k").collect().map(_.getLong(1)).toSeq ==
        Seq(1L, 3L)) // per-key argmax by (v desc, id)
      // crash-shape guards (review r8): a GLOBAL top-k (no PARTITION BY)
      // must fall through to Window/TakeOrdered — TopKPerKey's required
      // ClusteredDistribution rejects empty keys
      val globalW = Window.orderBy(col("v").desc, col("id"))
      val globalTopk = base.withColumn("rk", row_number().over(globalW))
        .filter(col("rk") <= 2)
      assert(globalTopk.queryExecution.optimizedPlan.collect {
        case t: org.apache.spark.sql.graft.TopKPerKey => t }.isEmpty)
      assert(globalTopk.collect().map(_.getLong(1)).toSeq == Seq(4L, 5L))
      // ...and a provably-empty bound must not wrap into a giant k
      val wrapped = base.withColumn("rk", row_number().over(w))
        .filter(col("rk") < Int.MinValue)
      assert(wrapped.queryExecution.optimizedPlan.collect {
        case t: org.apache.spark.sql.graft.TopKPerKey => t }.isEmpty)
      assert(wrapped.count() == 0)
      // negative guards: rank() and non-rank-only predicates DON'T rewrite
      val rankForm = base.withColumn("rk", rank().over(w)).filter(col("rk") <= 2)
      assert(rankForm.queryExecution.optimizedPlan.collect {
        case t: org.apache.spark.sql.graft.TopKPerKey => t }.isEmpty)
      val compound = base.withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 2 && col("v") > 0)
      assert(compound.queryExecution.optimizedPlan.collect {
        case t: org.apache.spark.sql.graft.TopKPerKey => t }.isEmpty)
      assert(compound.count() == 4) // and still answers correctly via Window
    } finally {
      SparkSession.setDefaultSession(spark)
      SparkSession.setActiveSession(spark)
    }
  }
}
