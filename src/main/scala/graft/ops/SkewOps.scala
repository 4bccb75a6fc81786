package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Skew-mitigation operators (100 TB design note, SURVEY.md §7.4).
  *
  * AQE's skew-join handling (`spark.sql.adaptive.skewJoin`, on by default)
  * covers sort-merge joins; these utilities cover the two cases it doesn't:
  * a single hot GROUP BY key, and broadcast-ineligible joins against a
  * skewed key column. Salting is deterministic here — the salt derives from
  * a hash of a row-identifying column, never `rand()`, so results are
  * reproducible and oracle-checkable.
  */
object SkewOps {

  /** Two-phase (salted) aggregation: partial-aggregate on (key, salt) —
    * spreading a hot key over `salts` reducers — then final-aggregate on key.
    * Algebraic re-association: SUM/COUNT compose exactly, AVG = Σsum/Σcount.
    * Output is bit-identical to the direct groupBy (same double-summation
    * tree? no — association differs, which is why the final avg is assembled
    * from sums, not from partial avgs). */
  def saltedAvg(df: DataFrame, key: Column, value: Column, saltFrom: Column,
                salts: Int = 16): DataFrame =
    df.select(key.as("k"), value.as("v"), pmod(xxhash64(saltFrom), lit(salts)).as("salt"))
      .groupBy("k", "salt")
      .agg(sum("v").as("ps"), count(lit(1)).as("pc"))
      .groupBy("k")
      .agg((sum("ps") / sum("pc")).as("avg_v"))

  /** Salted aggregation declared query: the flagship groupby_avg computed
    * through the salted two-phase plan. l_returnflag has only 3 distinct
    * values — exactly the shape (giant table, tiny key domain) where the
    * single-phase final agg funnels everything into 3 reducers at 100 TB.
    * Note the oracle is plain AVG: the salted plan must REPRODUCE the
    * direct answer (rounded to 4), not approximate it. */
  def saltedAgg(spark: SparkSession, sf: String): DataFrame =
    saltedAvg(
      Tables.load(spark, sf, "lineitem"),
      col("l_returnflag"), col("l_discount"), col("l_orderkey"))
      .select(col("k").as("l_returnflag"), round(col("avg_v"), 4).as("avg_discount"))
      .orderBy("l_returnflag")

  /** Salted-join declared query: orders ⋈ customer on custkey computed
    * through the salted plan. The oracle is the PLAIN join — like
    * [[saltedAgg]], the salted rewrite must reproduce the direct answer
    * row-for-row, never approximate it. The scenario it models at 100 TB: a
    * handful of mega-customers own most order rows, the dim side is too big
    * (or too wide) to broadcast, and AQE's skew splitting doesn't apply
    * (e.g. the skewed side arrives pre-sorted from a bucketed layout) — the
    * salt spreads each hot key over 16 reducers at the cost of replicating
    * the right side 16×. */
  def saltedJoinQuery(spark: SparkSession, sf: String): DataFrame =
    saltedJoin(
      Tables.load(spark, sf, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice"),
      Tables.load(spark, sf, "customer").select("c_custkey", "c_mktsegment"),
      col("o_custkey"), col("c_custkey"), col("o_orderkey"))
      .select(col("o_orderkey"), col("o_custkey"), col("c_mktsegment"),
        col("o_totalprice"))
      .orderBy("o_orderkey")

  /** Hot-key audit — the diagnostic that decides WHETHER the salted forms
    * above are needed: the top-10 heaviest join/shuffle keys with their
    * share of all rows and their multiple of the mean per-key load. A
    * reducer's wall-clock is proportional to its heaviest key, so
    * `x_mean` IS the straggler factor a plain hash-partition would see.
    * One groupBy shuffle (the same one the real query would pay) + a
    * single-row global stat broadcast back; the top-10 head is a
    * TakeOrderedAndProject, never a full sort. Counts are exact integers
    * and the quotients are computed from identical longs on both engines,
    * so 4/6-dp rounding is stable. */
  def skewAudit(spark: SparkSession, sf: String): DataFrame = {
    val counts = Tables.load(spark, sf, "lineitem")
      .groupBy("l_partkey").agg(count(lit(1)).as("cnt"))
    val stats = counts.agg(sum("cnt").as("total"), count(lit(1)).as("nkeys"))
    counts.join(broadcast(stats))
      .select(
        col("l_partkey"), col("cnt"),
        round(col("cnt") * lit(1.0) / col("total"), 6).as("share"),
        round(col("cnt") * col("nkeys") * lit(1.0) / col("total"), 4)
          .as("x_mean"))
      .orderBy(col("cnt").desc, col("l_partkey"))
      .limit(10)
  }

  /** Join-cardinality pre-flight — predict |orders ⋈ lineitem| from the
    * two sides' per-key histograms WITHOUT running the join:
    * Σ_k cnt_a(k)·cnt_b(k), plus the single heaviest key's contribution.
    * The estimate is EXACT for an equi join (it's the same sum the join
    * materializes row by row), but costs two aggregates and a
    * histogram-sized join — at 100 TB that's |distinct keys| rows through
    * the shuffle instead of the full fact tables, which is why planners
    * run exactly this before choosing broadcast vs sort-merge vs salting
    * ([[skewAudit]] reads the same histogram one level deeper). The
    * max_key_rows / predicted_rows ratio is the skew alarm: a single key
    * owning a material fraction of the output means AQE skew-split or
    * [[saltedJoin]], not a plain hash join. */
  def joinSizeEstimate(spark: SparkSession, sf: String): DataFrame = {
    val a = Tables.load(spark, sf, "orders")
      .groupBy("o_orderkey").agg(count(lit(1)).as("ca"))
    val b = Tables.load(spark, sf, "lineitem")
      .groupBy("l_orderkey").agg(count(lit(1)).as("cb"))
    val matched = a.join(b, col("o_orderkey") === col("l_orderkey"))
      .agg(
        count(lit(1)).as("n_matched_keys"),
        sum(col("ca") * col("cb")).as("predicted_rows"),
        max(col("ca") * col("cb")).as("max_key_rows"))
    a.agg(count(lit(1)).as("n_keys_left"))
      .join(b.agg(count(lit(1)).as("n_keys_right")))
      .join(matched)
      .select("n_keys_left", "n_keys_right", "n_matched_keys",
        "predicted_rows", "max_key_rows")
  }

  /** Salted join for a skewed key against a non-broadcastable right side:
    * left rows get salt = hash(probe col) % salts; the right side is
    * replicated `salts` times (explode) so every (key, salt) pair finds its
    * match. Replication factor is the knob: salts × |right|. */
  def saltedJoin(left: DataFrame, right: DataFrame, leftKey: Column,
                 rightKey: Column, saltFrom: Column, salts: Int = 16): DataFrame = {
    val saltedLeft = left.withColumn("_salt", pmod(xxhash64(saltFrom), lit(salts)))
    val saltedRight = right.withColumn("_salt",
      explode(sequence(lit(0L), lit(salts - 1L))))
    saltedLeft.join(saltedRight,
      leftKey === rightKey && saltedLeft("_salt") === saltedRight("_salt"))
      .drop("_salt")
  }
}
