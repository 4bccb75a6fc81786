package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Jaro-Winkler string similarity as a native Catalyst expression — the
  * similarity tier Spark's built-in string functions lack (`levenshtein`
  * counts edits; Jaro-Winkler scores transposition-tolerant, prefix-boosted
  * similarity in [0,1], the standard record-linkage comparator since the
  * Census Bureau work it is named for).
  *
  * Semantics match DuckDB's `jaro_winkler_similarity` (the rapidfuzz
  * formulation, which is how the declared query is oracle-checked
  * end-to-end): match window = max(|a|,|b|)/2 − 1, transpositions counted
  * over matched sequences, Winkler prefix boost `+ ℓ·0.1·(1−jaro)` with
  * ℓ = common prefix capped at 4, applied only when jaro > 0.7. Both
  * engines evaluate in IEEE doubles over the same few ratios, so rounded-4
  * outputs hash-match. Comparison is per Unicode CODE POINT (ADVICE r10:
  * per-UTF-16-code-unit counted supplementary-plane characters twice), so
  * every user-perceived character weighs 1 across the whole BMP+astral
  * range; on ASCII — the oracle's domain — this is character-identical to
  * DuckDB's evaluation, which is what the declared query pins.
  *
  * The expression is codegen'd ([[doGenCode]] emits one static call — the
  * same shape as Spark's own `levenshtein`), so a 100 TB entity-resolution
  * verify stage stays inside whole-stage codegen; the blocking stage that
  * FEEDS it pairs (deletion-variant index, sorted-neighborhood, LSH) is the
  * scale lever, as everywhere in the dedup family.
  */
object JaroWinklerImpl {
  /** Pure-JVM Jaro-Winkler similarity; public static so generated code can
    * call it. */
  def similarity(left: UTF8String, right: UTF8String): Double = {
    val sa = left.toString
    val sb = right.toString
    // iterate CODE POINTS, not UTF-16 units: a surrogate pair is one
    // character for matching/transposition/prefix purposes
    val a = sa.codePoints().toArray
    val b = sb.codePoints().toArray
    val la = a.length
    val lb = b.length
    // empty-first, THEN the identity shortcut: DuckDB scores "" vs "" as 0
    if (la == 0 || lb == 0) return 0.0
    if (sa == sb) return 1.0
    val window = math.max(0, math.max(la, lb) / 2 - 1)
    val aMatched = new Array[Boolean](la)
    val bMatched = new Array[Boolean](lb)
    var matches = 0
    var i = 0
    while (i < la) {
      val lo = math.max(0, i - window)
      val hi = math.min(lb - 1, i + window)
      var j = lo
      var found = false
      while (j <= hi && !found) {
        if (!bMatched(j) && a(i) == b(j)) {
          aMatched(i) = true; bMatched(j) = true; matches += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (matches == 0) return 0.0
    var transpositions = 0
    var k = 0
    i = 0
    while (i < la) {
      if (aMatched(i)) {
        while (!bMatched(k)) k += 1
        if (a(i) != b(k)) transpositions += 1
        k += 1
      }
      i += 1
    }
    val m = matches.toDouble
    val jaro = (m / la + m / lb + (m - transpositions / 2) / m) / 3.0
    if (jaro <= 0.7) return jaro
    var prefix = 0
    val maxPrefix = math.min(4, math.min(la, lb))
    while (prefix < maxPrefix && a(prefix) == b(prefix)) prefix += 1
    jaro + prefix * 0.1 * (1.0 - jaro)
  }
}

/** `jaro_winkler(a, b)` — see [[JaroWinklerImpl.similarity]]. */
case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression {
  override def prettyName: String = "jaro_winkler"
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (_: StringType, _: StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (string, string), got ($l, $r)")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    JaroWinklerImpl.similarity(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.JaroWinklerImpl.similarity($a, $b);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Column-API surface. */
object StringSimilarityFunctions {
  def jaro_winkler(a: Column, b: Column): Column =
    Bridge.column(JaroWinkler(Bridge.expression(a), Bridge.expression(b)))
}
