package graft

import graft.functions.{JaroWinklerImpl, StringSimilarityFunctions}
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** Pins the native jaro_winkler expression to the rapidfuzz/DuckDB
  * formulation (the declared q_jaro_rank query is additionally
  * value-checked against DuckDB's jaro_winkler_similarity end to end). */
class StringSimilaritySpec extends SparkSpec {

  private def jw(a: String, b: String): Double =
    JaroWinklerImpl.similarity(UTF8String.fromString(a), UTF8String.fromString(b))

  private def r4(x: Double): Double = math.rint(x * 10000) / 10000

  test("canonical literature values (= DuckDB jaro_winkler_similarity)") {
    assert(r4(jw("MARTHA", "MARHTA")) == 0.9611)
    assert(r4(jw("DWAYNE", "DUANE")) == 0.84)
    assert(r4(jw("DIXON", "DICKSONX")) == 0.8133)
    // 3 mismatched matched-positions halve to t=1 by INTEGER division
    // (rapidfuzz/DuckDB semantics; float t=1.5 would give 0.9167)
    assert(r4(jw("ABCDEF", "BCADEF")) == 0.9444)
  }

  test("edges: DuckDB parity on empties, identity, disjoint, boost gate") {
    assert(jw("", "") == 0.0) // DuckDB scores empty-vs-empty 0, not 1
    assert(jw("a", "") == 0.0)
    assert(jw("SAME", "SAME") == 1.0)
    assert(jw("FVIE", "TEN") == 0.0)
    // below the 0.7 gate the Winkler prefix boost must NOT apply: these
    // share prefix "AB" but jaro = (2/8+2/8+1)/3 = 0.5 exactly
    assert(jw("ABCDEFGH", "ABZZZZZZ") == 0.5)
  }

  test("supplementary-plane code points count as ONE character (ADVICE r10)") {
    // U+1D400 MATHEMATICAL BOLD CAPITAL A is a surrogate pair in UTF-16.
    // Per-code-unit iteration scored these as length-2 strings; per-code-
    // point they are single characters.
    val bold = new String(Character.toChars(0x1D400)) // 𝐀
    val boldB = new String(Character.toChars(0x1D401)) // 𝐁
    assert(jw(bold, bold) == 1.0)
    assert(jw(bold, boldB) == 0.0) // disjoint single chars: no match at all
    // "𝐀x" vs "𝐀y": 1 match of 2 chars each, jaro = (1/2+1/2+1)/3 = 2/3
    assert(r4(jw(bold + "x", bold + "y")) == r4(2.0 / 3.0))
    // astral char mixed with ASCII behaves exactly like a BMP char would:
    // same score as the all-ASCII analog of identical shape
    assert(jw(bold + "bc", bold + "bc") == 1.0)
    assert(r4(jw(bold + "bcd", bold + "bce")) == r4(jw("abcd", "abce")))
  }

  test("symmetry and range on fixture names") {
    val names = graft.sources.Tables.load(spark, sf0001, "nation")
      .select("n_name").collect().map(_.getString(0))
    for (a <- names; b <- names.take(5)) {
      val s = jw(a, b)
      assert(s >= 0.0 && s <= 1.0)
      assert(s == jw(b, a))
    }
  }

  test("expression evaluates in codegen and via SQL registration") {
    import spark.implicits._
    val folded = Seq(("MARTHA", "MARHTA"), ("DIXON", "DICKSONX"))
      .toDF("a", "b")
      .select(round(StringSimilarityFunctions.jaro_winkler(col("a"), col("b")), 4).as("jw"))
    assert(folded.collect().map(_.getDouble(0)).toSeq == Seq(0.9611, 0.8133))
    // codegen proof needs a non-literal input (a literal frame folds to a
    // LocalTableScan at plan time — itself proof that eval() works)
    val nation = graft.sources.Tables.load(spark, sf0001, "nation")
    val someName = nation.select("n_name").orderBy("n_name").head().getString(0)
    val scan = nation
      .select(StringSimilarityFunctions.jaro_winkler(col("n_name"), lit(someName)).as("jw"))
    // "*(n)" prefixes mark WholeStageCodegen spans in the plan string
    val plan = scan.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [jaro_winkler"), s"expected codegen:\n$plan")
    assert(scan.collect().map(_.getDouble(0)).max == 1.0) // self-match present
  }

  test("jaroRank query: every exact-prefix deletion scores high, output sane") {
    val rows = graft.ops.CurationOps.jaroRank(spark, sf0001).collect()
    assert(rows.nonEmpty)
    // the corrupted variant of a name always matches its own clean form
    // with a high score (single deletion keeps jaro near 1)
    val selfPairs = rows.filter(r => {
      val dirty = r.getAs[String]("dirty_name")
      val clean = r.getAs[String]("n_name")
      clean.length == dirty.length + 1
    })
    assert(selfPairs.nonEmpty)
    rows.foreach(r => assert(r.getAs[Double]("jw") >= 0.8 && r.getAs[Double]("jw") <= 1.0))
  }
}
