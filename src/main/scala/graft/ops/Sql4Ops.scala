package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.sources.Tables

/** Spark 4 SQL-surface operators (SURVEY.md §2.9/§2.11 extensions).
  *
  * The reference exposes exactly one query surface — pandas calls behind a
  * Streamlit form (`app_test.py:88-123`) — but a user replacing it with this
  * library gets Spark's FULL SQL front door. This file pins the Spark 4
  * additions to that front door which earlier rounds could not use because
  * they did not exist in Spark 3: native recursive CTEs (SPARK-24497, 4.0),
  * SQL pipe syntax (SPARK-49555, 4.0), string collations (SPARK-46830, 4.0),
  * SQL-body scalar/table functions (SPARK-46246) and session variables
  * (SPARK-46248). Each query is DuckDB-oracled like every other declared
  * query; each also carries a scale note in the scaladoc.
  *
  * Views are registered under `s4_`-prefixed names so running all declared
  * queries in one session (Verify) cannot collide with other ops' views.
  */
object Sql4Ops {

  private def view(spark: SparkSession, sf: String, table: String): String = {
    val name = s"s4_$table"
    Tables.load(spark, sf, table).createOrReplaceTempView(name)
    name
  }

  /** Native `WITH RECURSIVE` hierarchy rollup — the declarative twin of
    * [[Relational.bomRollup]]'s iterative BFS (same synthesized binary tree
    * over custkeys, parent = k div 2, root 0; same per-level census). Until
    * Spark 4 this shape REQUIRED the driver loop; now the optimizer runs the
    * loop itself (`UnionLoop`: each iteration joins the previous level
    * against the node table, exactly the checkpointed-frontier plan, but
    * planned not hand-written). Iterations are bounded by tree depth
    * (log2 n ≈ 40 rounds at 100 TB of nodes), far under the
    * `spark.sql.cteRecursionLevelLimit` default of 100; each round shuffles
    * only the frontier. The DuckDB oracle is the same recursion — both
    * engines run their NATIVE recursive-CTE executor over the same data. */
  def recursiveCte(spark: SparkSession, sf: String): DataFrame = {
    val c = view(spark, sf, "customer")
    spark.sql(s"""
      WITH RECURSIVE tree AS (
        SELECT c_custkey AS k, c_acctbal AS bal, CAST(1 AS BIGINT) AS depth
        FROM $c WHERE c_custkey = 0
        UNION ALL
        SELECT c.c_custkey, c.c_acctbal, t.depth + 1
        FROM $c c JOIN tree t ON c.c_custkey div 2 = t.k
        WHERE c.c_custkey <> 0
      )
      SELECT depth, count(*) AS n_nodes, round(sum(bal), 4) AS sum_bal
      FROM tree GROUP BY depth ORDER BY depth""")
  }

  /** SQL pipe syntax — the linear `|>` form of a join + aggregate + rank
    * report (orders × customer → per-segment order stats). Pipe syntax is
    * sugar over the same logical plan (the optimizer sees an identical
    * join/aggregate tree, so broadcast and partial aggregation apply
    * unchanged — plan-asserted in the spec); its value is that multi-stage
    * pipelines read top-to-bottom like the DataFrame chain, which is how a
    * 100 TB curation pipeline's SQL stays reviewable. Oracle: the classic
    * nested form in DuckDB. */
  def pipeSql(spark: SparkSession, sf: String): DataFrame = {
    val o = view(spark, sf, "orders")
    val c = view(spark, sf, "customer")
    spark.sql(s"""
      FROM $o
      |> WHERE o_orderstatus IN ('F', 'O')
      |> JOIN $c ON o_custkey = c_custkey
      |> AGGREGATE count(*) AS n_orders,
                   round(sum(o_totalprice), 4) AS revenue,
                   round(avg(o_totalprice), 4) AS avg_price
         GROUP BY c_mktsegment, o_orderstatus
      |> WHERE n_orders > 0
      |> ORDER BY c_mktsegment, o_orderstatus""")
  }

  /** Collation-aware grouping — case-insensitive semantics declared in the
    * TYPE (`COLLATE UTF8_LCASE`), not hand-lowercased. Mixed-case variants
    * are injected deterministically from the key (the urlDedup
    * inject-then-process pattern: upper / lower / first-letter-cap by
    * custkey mod 3), then the census counts distinct spellings under binary
    * vs case-insensitive collation per segment. At scale collation beats
    * `lower()`-wrapping because comparisons collate at the UTF8String level
    * inside codegen (no materialized lowercase copy of a 100 TB column) and
    * the collation travels with the column through joins/aggregates. The
    * oracle lowers explicitly — same answer, which is the point. */
  def collationCensus(spark: SparkSession, sf: String): DataFrame = {
    val c = view(spark, sf, "customer")
    spark.sql(s"""
      WITH mixed AS (
        SELECT CASE c_custkey % 3
                 WHEN 0 THEN upper(c_mktsegment)
                 WHEN 1 THEN lower(c_mktsegment)
                 ELSE concat(upper(substr(c_mktsegment, 1, 1)),
                             lower(substr(c_mktsegment, 2)))
               END AS seg
        FROM $c)
      SELECT lower(seg) AS seg_lc,
             count(*) AS n_rows,
             count(DISTINCT seg) AS n_variants_binary,
             count(DISTINCT collate(seg, 'UTF8_LCASE')) AS n_variants_ci
      FROM mixed GROUP BY lower(seg) ORDER BY seg_lc""")
  }

  /** SQL-body scalar function + session variable — the governed-SQL tier:
    * a `CREATE TEMPORARY FUNCTION … RETURN CASE …` price-band UDF (pure SQL,
    * so Catalyst INLINES the body — it stays codegen'd, unlike a black-box
    * Scala UDF) used under a `DECLARE`d session-variable threshold. This is
    * how shared business logic (banding rules, thresholds) is centralized
    * across a warehouse's queries without shipping jars. The oracle inlines
    * both by hand; matching output proves the inlining semantics. */
  def sqlUdfBands(spark: SparkSession, sf: String): DataFrame = {
    val o = view(spark, sf, "orders")
    spark.sql("DECLARE OR REPLACE s4_floor DOUBLE DEFAULT 50000.0")
    spark.sql("""
      CREATE OR REPLACE TEMPORARY FUNCTION s4_price_band(p DOUBLE)
      RETURNS STRING
      RETURN CASE WHEN p < 150000.0 THEN 'low'
                  WHEN p < 300000.0 THEN 'mid'
                  ELSE 'high' END""")
    spark.sql(s"""
      SELECT s4_price_band(o_totalprice) AS band,
             count(*) AS n,
             round(sum(o_totalprice), 4) AS total
      FROM $o WHERE o_totalprice > s4_floor
      GROUP BY 1 ORDER BY band""")
  }
}
