package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}
import org.apache.spark.sql.SparkSessionExtensions

/** Native Catalyst expressions for the embedding hot path (SURVEY.md §2.9 X3).
  *
  * The composable form — `aggregate(zip_with(a, b, _*_), 0.0, _+_)` — is
  * correct but evaluates higher-order lambdas per element, which blocks
  * whole-stage codegen of the surrounding plan and allocates per row. These
  * expressions generate a tight primitive loop instead (`doGenCode`), the
  * preference order the engine follows: built-in functions, then a native
  * `Expression` with codegen, then (never, here) a Scala UDF.
  *
  * Semantics match the composable form bit-for-bit: left-to-right summation
  * over doubles, so results stay hash-identical to the DuckDB oracles.
  */
abstract class VectorBinaryExpression extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<double>, array<double>), got ($l, $r)")
    }
}

/** Σ aᵢ·bᵢ over two array<double> columns (length = min of the two). */
case class DotProduct(left: Expression, right: Expression) extends VectorBinaryExpression {
  override def prettyName: String = "dot_product"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]; val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0; var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val s = ctx.freshName("s"); val i = ctx.freshName("i")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) { $s += $a.getDouble($i) * $b.getDouble($i); }
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** cos(a, b) = Σaᵢbᵢ / (√Σaᵢ² · √Σbᵢ²), fused into one pass over both arrays
  * (the composable form walks each array three times). */
case class CosineSimilarity(left: Expression, right: Expression) extends VectorBinaryExpression {
  override def prettyName: String = "cosine_sim"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]; val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < n) {
      val xi = x.getDouble(i); val yi = y.getDouble(i)
      dot += xi * yi; na += xi * xi; nb += yi * yi; i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val dot = ctx.freshName("dot"); val na = ctx.freshName("na"); val nb = ctx.freshName("nb")
      val xi = ctx.freshName("xi"); val yi = ctx.freshName("yi")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xi = $a.getDouble($i); double $yi = $b.getDouble($i);
         |  $dot += $xi * $yi; $na += $xi * $xi; $nb += $yi * $yi;
         |}
         |${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Column-API and SQL-registration surface for the native expressions. */
object VectorFunctions {
  def dot_product(a: Column, b: Column): Column =
    Bridge.column(DotProduct(Bridge.expression(a), Bridge.expression(b)))

  def cosine_sim(a: Column, b: Column): Column =
    Bridge.column(CosineSimilarity(Bridge.expression(a), Bridge.expression(b)))
}

/** `SparkSessionExtensions` hook: registers the native functions for SQL use
  * (`spark.sql("SELECT cosine_sim(a, b) ...")`) AND the [[TopKPerKey]]
  * physical strategy, so one wiring line exposes the library's whole
  * custom-Catalyst surface. Wire with
  * `SparkSession.builder.withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.functions.GraftExtensions`
  * ([[org.apache.spark.sql.graft.TopKPerKey.topKPerKey]] also
  * self-registers via `experimental.extraStrategies` for callers that
  * skip the extension). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectPlannerStrategy(_ => org.apache.spark.sql.graft.TopKStrategy)
    // the (c)-tier ladder's Rule: row_number-filter window top-k rewrites
    // to the bounded-heap operator with no user opt-in
    ext.injectOptimizerRule(_ => org.apache.spark.sql.graft.TopKRewriteRule)
    ext.injectFunction((
      new FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      (children: Seq[Expression]) => DotProduct(children(0), children(1))))
    ext.injectFunction((
      new FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
      (children: Seq[Expression]) => CosineSimilarity(children(0), children(1))))
    ext.injectFunction((
      new FunctionIdentifier("xgb_margin"),
      new ExpressionInfo(classOf[XgbMargin].getName, "xgb_margin"),
      (children: Seq[Expression]) => XgbMargin(children.head)))
    ext.injectFunction((
      new FunctionIdentifier("jaro_winkler"),
      new ExpressionInfo(classOf[JaroWinkler].getName, "jaro_winkler"),
      (children: Seq[Expression]) => JaroWinkler(children(0), children(1))))
    // KLL sketch surface (round 9): SQL-callable like Spark's own
    // hll_sketch_agg family — `kll_sketch_agg(value)`, `kll_union_agg(sk)`,
    // `kll_quantile(sk, 0.5)`; optional second arg on the aggs sets k
    ext.injectFunction((
      new FunctionIdentifier("kll_sketch_agg"),
      new ExpressionInfo(classOf[KllSketchAgg].getName, "kll_sketch_agg"),
      (children: Seq[Expression]) => {
        val k = children.lift(1).map(kOf("kll_sketch_agg", _))
          .getOrElse(KllFunctions.DefaultK)
        KllSketchAgg(children.head, k).toAggregateExpression()
      }))
    ext.injectFunction((
      new FunctionIdentifier("kll_union_agg"),
      new ExpressionInfo(classOf[KllUnionAgg].getName, "kll_union_agg"),
      (children: Seq[Expression]) => {
        val k = children.lift(1).map(kOf("kll_union_agg", _))
          .getOrElse(KllFunctions.DefaultK)
        KllUnionAgg(children.head, k).toAggregateExpression()
      }))
    ext.injectFunction((
      new FunctionIdentifier("kll_quantile"),
      new ExpressionInfo(classOf[KllQuantile].getName, "kll_quantile"),
      (children: Seq[Expression]) => KllQuantile(children(0), children(1))))
    ext.injectFunction((
      new FunctionIdentifier("kll_rank"),
      new ExpressionInfo(classOf[KllRank].getName, "kll_rank"),
      (children: Seq[Expression]) => KllRank(children(0), children(1))))
    // CMS point-frequency surface: `cms_sketch_agg(key)`, `cms_union_agg(sk)`,
    // `cms_estimate(sk, key)` — fixed (depth, width, seed) so every blob in a
    // deployment is merge-compatible (CmsFunctions scaladoc)
    ext.injectFunction((
      new FunctionIdentifier("cms_sketch_agg"),
      new ExpressionInfo(classOf[CmsSketchAgg].getName, "cms_sketch_agg"),
      (children: Seq[Expression]) => CmsSketchAgg(children.head).toAggregateExpression()))
    ext.injectFunction((
      new FunctionIdentifier("cms_union_agg"),
      new ExpressionInfo(classOf[CmsUnionAgg].getName, "cms_union_agg"),
      (children: Seq[Expression]) => CmsUnionAgg(children.head).toAggregateExpression()))
    ext.injectFunction((
      new FunctionIdentifier("cms_estimate"),
      new ExpressionInfo(classOf[CmsEstimate].getName, "cms_estimate"),
      (children: Seq[Expression]) => CmsEstimate(children(0), children(1))))
    // one-pass covariance buffer over a vector column (CovFunctions)
    ext.injectFunction((
      new FunctionIdentifier("cov_accum_agg"),
      new ExpressionInfo(classOf[CovAccumAgg].getName, "cov_accum_agg"),
      (children: Seq[Expression]) => CovAccumAgg(children.head).toAggregateExpression()))
  }

  /** The k parameter must be a literal int at registration time (it sizes
    * the aggregation buffer before any row is seen). */
  private def kOf(fn: String, e: Expression): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$fn(col, k): k must be an integer literal, got $other")
  }
}
