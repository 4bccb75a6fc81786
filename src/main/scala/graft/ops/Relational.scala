package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.sources.Tables

/** Core relational operators (SURVEY.md §2.1–2.7).
  *
  * Each builder is a pure `(SparkSession, sfDir) => DataFrame` over the harness
  * tables, modeling a behavior of the reference app (cited per method). Every
  * declared query ends in an explicit ORDER BY on a unique key and rounds
  * computed floats to 4 decimals so the driver's hash-compare against the
  * DuckDB oracle is stable (SURVEY.md §4.2).
  *
  * Scale notes (100 TB): all plans here are single-pass scan→(shuffle)→agg/sort
  * shapes. Aggregations use partial (map-side) combine via HashAggregate;
  * top-k uses TakeOrderedAndProject (no global sort materialization); the
  * dimension side of joins is broadcast explicitly.
  */
object Relational {

  /** Columnar scan + projection — models the reference's 12-field Mongo
    * projection (`app_test.py:38-52`). Column pruning reaches the parquet
    * reader: ReadSchema carries only the 4 selected columns. */
  def scanProject(spark: SparkSession, sf: String): DataFrame =
    Tables.load(spark, sf, "lineitem")
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
      .orderBy("l_orderkey", "l_linenumber")

  /** Equality filter — models `df[df['Churn'] == 1]` (`app_test.py:88-93`).
    * The predicate is pushed to the parquet scan (PushedFilters). */
  def filterEq(spark: SparkSession, sf: String): DataFrame =
    Tables.load(spark, sf, "lineitem")
      .filter(col("l_returnflag") === "R")
      .select("l_orderkey", "l_linenumber", "l_returnflag", "l_quantity")
      .orderBy("l_orderkey", "l_linenumber")

  /** Range filter — models the slider-driven `df[df['Age'] > min_age]`
    * (`app_test.py:122-123`). */
  def filterRange(spark: SparkSession, sf: String): DataFrame =
    Tables.load(spark, sf, "customer")
      .filter(col("c_acctbal") > 5000.0)
      .select("c_custkey", "c_name", "c_acctbal")
      .orderBy("c_custkey")

  /** Global count — `len(df)` (`app_test.py:87`). */
  def countAll(spark: SparkSession, sf: String): DataFrame =
    Tables.load(spark, sf, "lineitem").agg(count(lit(1)).as("n"))

  /** Filtered ratio — churn % = count(Churn==1)/count(*)*100
    * (`app_test.py:88`), one conditional aggregate instead of two scans. */
  def ratio(spark: SparkSession, sf: String): DataFrame =
    Tables.load(spark, sf, "orders")
      .agg(round(avg(when(col("o_orderstatus") === "F", 1).otherwise(0)) * 100, 4)
        .as("churn_pct"))

  /** Conditional means — the reference computes 5 filtered means with 5
    * separate scans (`app_test.py:89-93`); one grouped pass replaces them.
    * `coalesce(avg, 0)` mirrors the empty-frame guard (`app_test.py:88-93`). */
  def condMeans(spark: SparkSession, sf: String): DataFrame =
    Tables.load(spark, sf, "lineitem")
      .groupBy("l_linestatus")
      .agg(
        count(lit(1)).as("n"),
        coalesce(round(avg("l_quantity"), 4), lit(0.0)).as("avg_qty"),
        coalesce(round(avg("l_extendedprice"), 4), lit(0.0)).as("avg_price"),
        coalesce(round(avg("l_discount"), 4), lit(0.0)).as("avg_discount"))
      .orderBy("l_linestatus")

  /** Group-by + mean — the flagship analytic, churn rate by subscription type
    * (`app_test.py:99`), transposed to harness columns (SURVEY.md §7.3).
    * HashAggregate with partial combine: only group-cardinality rows shuffle. */
  def groupbyAvg(spark: SparkSession, sf: String): DataFrame =
    Tables.load(spark, sf, "lineitem")
      .groupBy("l_returnflag")
      .agg(round(avg("l_discount"), 4).as("avg_discount"))
      .orderBy("l_returnflag")

  /** Histogram binning stacked by a second key — models
    * `sns.histplot(x=Age, hue=Churn, multiple='stack')` (`app_test.py:107-111`):
    * fixed-width bins, count per (bin, hue). */
  def histogram(spark: SparkSession, sf: String): DataFrame =
    Tables.load(spark, sf, "orders")
      .groupBy(
        (floor(col("o_totalprice") / 50000.0).cast("long") * 50000L).as("price_bin"),
        col("o_orderstatus"))
      .agg(count(lit(1)).as("n"))
      .orderBy("price_bin", "o_orderstatus")

  /** Sort + limit top-k — models `filtered_df.head(10)` made deterministic
    * (`app_test.py:124-125`). Physical plan is TakeOrderedAndProject: each
    * partition keeps 10 rows, no global sort. */
  def topk(spark: SparkSession, sf: String): DataFrame =
    Tables.load(spark, sf, "orders")
      .select("o_orderkey", "o_custkey", "o_totalprice")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(10)

  /** 3-way CASE risk bucket + percent formatting — `app_test.py:238,300-301`.
    * Strict `<` thresholds: p<0.3 Low, p<0.7 Medium, else High. The synthetic
    * probability (o_orderkey%100)/100 is the same IEEE double in any engine
    * (identical integer inputs, one division), so the formatted string and
    * bucket boundaries agree exactly. */
  def bucketCase(spark: SparkSession, sf: String): DataFrame = {
    val p = (col("o_orderkey") % 100).cast("double") / 100.0
    Tables.load(spark, sf, "orders")
      .select(
        col("o_orderkey"),
        p.as("p"),
        format_string("%.2f%%", p * 100).as("churn_pct"),
        when(p < 0.3, "Low").when(p < 0.7, "Medium").otherwise("High").as("risk"))
      .orderBy("o_orderkey")
  }

  /** Id fallback — `df.get("CustomerID", df.index + 1)` (`app_test.py:299`):
    * synthesize an ordinal id when the key column is absent, deterministically
    * ordered by a unique column (pandas' implicit row order does not exist on
    * a cluster).
    *
    * Two-phase ordinal synthesis, NOT `row_number().over(Window.orderBy(...))`
    * — an unpartitioned window funnels the whole table through one partition.
    * Here the sort is a parallel range-shuffle, and `zipWithIndex` then runs
    * one light count-job per partition and broadcasts the cumulative offsets,
    * so every partition numbers its rows locally. Each phase is cluster-wide
    * parallel; this survives a 100× scale-up where the global window cannot. */
  def idFallback(spark: SparkSession, sf: String): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    val sorted = Tables.load(spark, sf, "customer")
      .select("c_name", "c_mktsegment").orderBy("c_name")
    val schema = StructType(StructField("customer_id", LongType, nullable = false)
      +: sorted.schema.fields)
    val withId = sorted.rdd.zipWithIndex().map { case (r, i) =>
      Row.fromSeq((i + 1L) +: r.toSeq)
    }
    spark.createDataFrame(withId, schema)
      .select("customer_id", "c_name", "c_mktsegment")
      .orderBy("customer_id")
  }

  /** Window rank: top-3 per group — generalizes the reference's top-10 view
    * (`app_test.py:124-125`) to "top spenders per segment" (SURVEY.md §2.6).
    * Single shuffle on the partition key; rank tie-broken by unique key. */
  def windowRank(spark: SparkSession, sf: String): DataFrame = {
    val w = Window.partitionBy("c_mktsegment")
      .orderBy(col("c_acctbal").desc, col("c_custkey"))
    Tables.load(spark, sf, "customer")
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= 3)
      .select("c_mktsegment", "rk", "c_custkey", "c_acctbal")
      .orderBy("c_mktsegment", "rk")
  }

  /** Broadcast equi join — enrichment join of fact against a small dimension
    * (SURVEY.md §2.5 J1). `broadcast()` pins BroadcastHashJoin: zero shuffle
    * of the fact side — the shape that survives a 100× scale-up as long as
    * the dim stays small. */
  def joinBroadcast(spark: SparkSession, sf: String): DataFrame = {
    val customer = Tables.load(spark, sf, "customer")
    val nation = Tables.load(spark, sf, "nation")
    customer.join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .select("c_custkey", "c_name", "n_name")
      .orderBy("c_custkey")
  }

  /** Multi-way join + aggregation — customer ⋈ nation ⋈ region rolled up to
    * region grain (SURVEY.md §2.5 J2). Both dims broadcast (25 and 5 rows);
    * the only shuffle is the final 5-group aggregate. */
  def joinMultiway(spark: SparkSession, sf: String): DataFrame = {
    val customer = Tables.load(spark, sf, "customer")
    val nation = Tables.load(spark, sf, "nation")
    val region = Tables.load(spark, sf, "region")
    customer
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .groupBy("r_name")
      .agg(count(lit(1)).as("n_customers"), round(avg("c_acctbal"), 4).as("avg_bal"))
      .orderBy("r_name")
  }

  /** Star-join revenue rollup (TPC-H Q9 family): the fact table joins THREE
    * broadcast dimensions (part, supplier, nation) and aggregates discounted
    * revenue by brand × nation. The fact side never shuffles until the final
    * group agg (partial map-side, shuffle = group cardinality) — the
    * canonical warehouse shape a 100 TB star schema runs all day. Also the
    * only declared consumers of the `part` and `supplier` fixtures.
    * Revenue rounds to 4 decimals: each product has exactly 4 decimal
    * digits, so group sums are representable at 4 places and the round is
    * exact regardless of summation order — rounding to 2 would sit on the
    * .xx50 half-cent boundary where a 1-ulp order difference vs the oracle
    * flips the cent. */
  def brandRevenue(spark: SparkSession, sf: String): DataFrame = {
    // part/supplier get NO broadcast hint: they scale with the data (a
    // 100 TB star's part dim is billions of rows) and a hard hint would
    // force an OOM there, while at any SF where they DO fit the
    // autoBroadcastJoinThreshold + AQE picks broadcast unaided (plan
    // asserted in RelationalSpec). nation stays hinted — a constant
    // 25-row domain is broadcast-sized by definition.
    val li = Tables.load(spark, sf, "lineitem")
    li.join(Tables.load(spark, sf, "part"),
        col("l_partkey") === col("p_partkey"))
      .join(Tables.load(spark, sf, "supplier"),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(Tables.load(spark, sf, "nation")),
        col("s_nationkey") === col("n_nationkey"))
      .groupBy("p_brand", "n_name")
      .agg(
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 4).as("revenue"),
        count(lit(1)).as("n"))
      .orderBy("p_brand", "n_name")
  }

  /** Distinct aggregation (SURVEY.md §2.3 ext). Exact `count(DISTINCT)` so the
    * DuckDB oracle is hash-comparable; the approximate HLL form
    * (`approx_count_distinct`) is exercised in unit tests + bench, where
    * cross-engine sketches can't be compared bit-for-bit. */
  def distinctAgg(spark: SparkSession, sf: String): DataFrame =
    Tables.load(spark, sf, "lineitem")
      .agg(
        countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_suppkey")).as("n_supps"))

  /** Hierarchical rollup — subtotal rows per (returnflag, linestatus) plus
    * per-returnflag and grand totals (SURVEY.md §2.3 "free from Spark"
    * grouping-sets family). NULL group keys order first, matching the
    * oracle's explicit NULLS FIRST. */
  def rollupAgg(spark: SparkSession, sf: String): DataFrame =
    Tables.load(spark, sf, "lineitem")
      .rollup("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("n"), round(sum("l_quantity"), 4).as("sum_qty"))
      .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)

  /** Cube — all 2^n grouping-set combinations (rollup's bigger sibling). */
  def cubeAgg(spark: SparkSession, sf: String): DataFrame =
    Tables.load(spark, sf, "lineitem")
      .cube("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("n"))
      .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)

  /** Explicit GROUPING SETS — the general form rollup/cube specialize: an
    * arbitrary subset of grouping combinations in ONE pass (one Expand +
    * one shuffle, vs one scan per set if unioned by hand). `grouping()`
    * flags disambiguate a real NULL key from a subtotal row; group keys are
    * coalesced to 'ALL' so the output needs no NULL-ordering contract. */
  def groupingSetsAgg(spark: SparkSession, sf: String): DataFrame =
    Tables.load(spark, sf, "lineitem")
      .groupingSets(
        Seq(Seq(col("l_returnflag"), col("l_linestatus")), Seq(col("l_returnflag")), Seq()),
        col("l_returnflag"), col("l_linestatus"))
      .agg(
        grouping(col("l_returnflag")).cast("long").as("g_rf"),
        grouping(col("l_linestatus")).cast("long").as("g_ls"),
        count(lit(1)).as("n"),
        round(sum("l_quantity"), 2).as("sum_qty"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("l_returnflag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("l_linestatus"),
        col("g_rf"), col("g_ls"), col("n"), col("sum_qty"))
      .orderBy("g_rf", "g_ls", "l_returnflag", "l_linestatus")

  /** SCD Type-2 history build — turn a per-key change log (each order is a
    * new "version" of the customer's state) into validity intervals:
    * `valid_from` = this version's date, `valid_to` = the next version's
    * (9999-12-31 open horizon on the latest), `is_current` flags the live
    * row. One window over (key, date) computes version number and interval
    * end in a single shuffle — the standard warehouse dimension-history
    * shape, complementing [[upsert]] (SCD-1 overwrite) and [[cdcApply]]
    * (latest-wins compaction). At 100 TB the window partitions by key, so
    * skew follows key cardinality, not history length; o_orderkey breaks
    * same-day ties deterministically. */
  def scd2(spark: SparkSession, sf: String): DataFrame = {
    val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    val nextDate = lead(col("o_orderdate"), 1).over(w)
    Tables.load(spark, sf, "orders")
      .select(
        col("o_custkey").as("custkey"),
        row_number().over(w).cast("long").as("version"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("valid_from"),
        coalesce(date_format(nextDate, "yyyy-MM-dd"), lit("9999-12-31")).as("valid_to"),
        round(col("o_totalprice"), 2).as("price"),
        nextDate.isNull.as("is_current"))
      .orderBy("custkey", "version")
  }

  /** Aggregate report with an inline `observe` gate — Spark's observation
    * API as the production ETL data-quality pattern: named metrics
    * (`rows_seen`, `revenue_seen`, `null_keys`) accumulate ON the scan
    * while the query runs (an `Observe` node is a zero-copy pass-through;
    * no second scan, no extra action), and the job reads them after the
    * sink commits to decide whether to promote the output — the inline
    * alternative to a separate validation pass that would re-read 100 TB.
    * The declared result is the ordinary aggregate (oracled); the spec
    * runs the query through [[observedOrders]] directly and proves the
    * observed metrics equal an independent aggregate of the same table,
    * i.e. the instrumentation is free AND faithful. */
  def observedAgg(spark: SparkSession, sf: String): DataFrame =
    observedOrders(spark, sf)._1

  /** The instrumented plan + its Observation handle (spec seam). */
  private[graft] def observedOrders(spark: SparkSession, sf: String)
      : (DataFrame, org.apache.spark.sql.Observation) = {
    val obs = new org.apache.spark.sql.Observation()
    val df = Tables.load(spark, sf, "orders")
      .observe(obs, count(lit(1)).as("rows_seen"),
        round(sum("o_totalprice"), 4).as("revenue_seen"),
        count(when(col("o_custkey").isNull, 1)).as("null_keys"))
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n_orders"),
        round(avg("o_totalprice"), 4).as("avg_price"))
      .orderBy("o_orderstatus")
    (df, obs)
  }

  /** Quantile-grid resolution for [[quantileNorm]]. */
  val QNormBuckets = 10

  /** Grid-based quantile normalization — align each segment's balance
    * distribution to the GLOBAL one (the feature/source-alignment step a
    * multi-source training pipeline runs so no source's scale dominates;
    * the discretized form of the bioinformatics quantile-normalization
    * recipe): each row lands in its segment's ntile decile (deterministic:
    * ordered by (value, key)), and the decile is re-valued at the global
    * distribution's mid-decile quantile ((d−½)/Q, exact interpolated
    * percentile). Reports per (segment, decile): population, raw mean, and
    * the aligned value. Plan: one window per segment key (the sort shuffles
    * segment-sized partitions), one map-combined aggregate, and the Q-row
    * global grid BROADCAST into the result — at 100 TB the grid comes from
    * a mergeable KLL sketch (`q_kll_merge`'s store) instead of the exact
    * percentile, and nothing else changes; Q is a constant so the join adds
    * no shuffle. Both engines interpolate percentiles identically
    * (`percentile` / `quantile_cont`) and ntile identically over the same
    * unique order key. */
  def quantileNorm(spark: SparkSession, sf: String): DataFrame = {
    val c = Tables.load(spark, sf, "customer")
    val grid = c.select(posexplode(percentile(col("c_acctbal"),
        lit((1 to QNormBuckets).map(d => (d - 0.5) / QNormBuckets).toArray)))
        .as(Seq("d0", "norm_value")))
      .select((col("d0") + 1).cast("long").as("decile"),
        (round(col("norm_value"), 4) + lit(0.0)).as("norm_value"))
    val w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    c.withColumn("decile", ntile(QNormBuckets).over(w).cast("long"))
      .groupBy(col("c_mktsegment").as("segment"), col("decile"))
      .agg(count(lit(1)).as("n"),
        (round(avg("c_acctbal"), 4) + lit(0.0)).as("mean_raw"))
      .join(broadcast(grid), "decile")
      .select("segment", "decile", "n", "mean_raw", "norm_value")
      .orderBy("segment", "decile")
  }

  /** Snapshot dates for [[scd2Asof]] — interpolated into the oracle's
    * VALUES list so the report dates cannot drift between engines. */
  val Scd2Snapshots = Seq("1996-01-01", "1997-07-01", "1999-01-01", "2000-07-01")

  /** Point-in-time (AS OF) census over the [[scd2]] dimension — the query a
    * type-2 dimension EXISTS for: for each snapshot date, stab the validity
    * intervals (`valid_from ≤ d < valid_to`) and report how many customers
    * had a live version, their mean version number (dimension churn up to
    * that date), and the mean in-effect price. Plan: the 4-row date dim
    * BROADCASTS into an interval-stabbing nested-loop join — at 100 TB this
    * is D linear passes folded into one scan of a dim-sized table (never
    * fact-sized), then one map-combined aggregate per date; no shuffle of
    * the dimension at all. ISO-8601 strings compare lexicographically =
    * chronologically, so both engines stab identically; at most one version
    * per (customer, date) matches because [[scd2]]'s intervals tile the
    * timeline. */
  def scd2Asof(spark: SparkSession, sf: String): DataFrame = {
    val dates = spark.createDataFrame(Scd2Snapshots.map(Tuple1(_))).toDF("as_of")
    scd2(spark, sf)
      .join(broadcast(dates),
        col("valid_from") <= col("as_of") && col("as_of") < col("valid_to"))
      .groupBy("as_of")
      .agg(count(lit(1)).as("n_active"),
        round(avg("version"), 4).as("avg_version"),
        round(avg("price"), 4).as("avg_price"))
      .orderBy("as_of")
  }

  /** Pure-SQL surface: the engine's other front door. A correlated-free
    * scalar subquery (above-average filter) through `spark.sql` over a temp
    * view — proves a reference user can bring plain SQL, not just the
    * DataFrame API, and Catalyst plans both identically. */
  def sqlEntry(spark: SparkSession, sf: String): DataFrame = {
    Tables.load(spark, sf, "customer").createOrReplaceTempView("customer_v")
    spark.sql("""
      SELECT c_custkey, round(c_acctbal, 2) AS acctbal
      FROM customer_v
      WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer_v)
      ORDER BY c_custkey""")
  }

  /** Pivot — the reference's stacked histogram is a pivot of counts on the
    * hue key (`app_test.py:107-111`); explicit pivot values keep the output
    * schema static, `coalesce` 0 matches SQL's count-of-no-rows. */
  def pivotCounts(spark: SparkSession, sf: String): DataFrame =
    Tables.load(spark, sf, "lineitem")
      .groupBy("l_returnflag")
      .pivot("l_linestatus", Seq("F", "O"))
      .agg(count(lit(1)))
      .select(col("l_returnflag"),
        coalesce(col("F"), lit(0L)).as("F"),
        coalesce(col("O"), lit(0L)).as("O"))
      .orderBy("l_returnflag")

  /** Left-semi join — "customers having orders" (EXISTS). Only the key
    * column of the right side ships; output is left columns only. */
  def joinSemi(spark: SparkSession, sf: String): DataFrame =
    Tables.load(spark, sf, "customer").as("c")
      .join(Tables.load(spark, sf, "orders").as("o"),
        col("c.c_custkey") === col("o.o_custkey"), "left_semi")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")

  /** Left-anti join — "customers with no high-value order" (NOT EXISTS).
    * The right side is pre-filtered so the anti-join is non-vacuous at every
    * sf (every customer has SOME order in the fixtures). */
  def joinAnti(spark: SparkSession, sf: String): DataFrame =
    Tables.load(spark, sf, "customer").as("c")
      .join(Tables.load(spark, sf, "orders")
          .filter(col("o_totalprice") > 300000.0).as("o"),
        col("c.c_custkey") === col("o.o_custkey"), "left_anti")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")

  /** Set operations (SURVEY.md §2.8): high-balance ∩ BUILDING-segment and
    * high-balance ∖ BUILDING-segment customer keys, tagged and unioned. */
  def setOps(spark: SparkSession, sf: String): DataFrame = {
    val c = Tables.load(spark, sf, "customer")
    val a = c.filter(col("c_acctbal") > 5000.0).select("c_custkey")
    val b = c.filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
    a.intersect(b).withColumn("op", lit("intersect"))
      .union(a.except(b).withColumn("op", lit("except")))
      .select("op", "c_custkey")
      .orderBy("op", "c_custkey")
  }

  /** Approximate sketches — HLL++ distinct and approximate median
    * (SURVEY.md §2.3 ext). Deterministic for fixed input but sketch
    * implementations differ across engines, so no SQL oracle; the exact
    * twins are q_approx_distinct / q_cond_means. At 100 TB these replace
    * their exact forms: fixed-size sketches merge map-side, no exact
    * distinct shuffle. */
  def sketchStats(spark: SparkSession, sf: String): DataFrame =
    Tables.load(spark, sf, "lineitem")
      .agg(
        approx_count_distinct("l_partkey").as("approx_parts"),
        round(percentile_approx(col("l_extendedprice"), lit(0.5), lit(1000)), 4)
          .as("approx_median_price"))

  /** Top-3 per segment through the CUSTOM physical operator
    * (org.apache.spark.sql.graft.TopKPerKey: LogicalPlan + Strategy +
    * SparkPlan with bounded per-key heaps) — same semantics and oracle as
    * [[windowRank]], but instead of sorting each segment's full row set the
    * executor keeps at most k rows per key. The window form IS the right
    * plan until group sizes explode; this is the 100 TB replacement. */
  def topkCustom(spark: SparkSession, sf: String): DataFrame = {
    import org.apache.spark.sql.graft.TopKPerKey
    val base = Tables.load(spark, sf, "customer")
      .select("c_mktsegment", "c_custkey", "c_acctbal")
    TopKPerKey.topKPerKey(base, 3,
        Seq("c_mktsegment"),
        Seq("c_acctbal" -> false, "c_custkey" -> true))
      .select("c_mktsegment", "rk", "c_custkey", "c_acctbal")
      .orderBy("c_mktsegment", "rk")
  }

  /** String-function pack over customer names — upper/lower, 1-based
    * substring, regexp replace, concat, length: the scalar-function family
    * the reference only touches via Python f-strings (`app_test.py:300`). */
  def stringFuncs(spark: SparkSession, sf: String): DataFrame =
    Tables.load(spark, sf, "customer")
      .select(
        col("c_custkey"),
        upper(col("c_name")).as("name_upper"),
        substring(col("c_name"), 1, 8).as("name_prefix"),
        regexp_replace(col("c_name"), "[0-9]", "#").as("name_masked"),
        concat(col("c_mktsegment"), lit(":"), col("c_name")).as("segmented"),
        length(col("c_name")).cast("long").as("name_len"))
      .orderBy("c_custkey")

  /** Descriptive-stats pack — sample stddev and Pearson correlation per
    * group (both single-pass algebraic aggregates with map-side combine;
    * definitions match DuckDB's stddev_samp/corr exactly). */
  def statsPack(spark: SparkSession, sf: String): DataFrame =
    Tables.load(spark, sf, "lineitem")
      .groupBy("l_returnflag")
      .agg(
        round(stddev_samp("l_extendedprice"), 4).as("sd_price"),
        (round(corr("l_quantity", "l_extendedprice"), 4) + lit(0.0)).as("corr_qty_price"))
      .orderBy("l_returnflag")

  /** Exact interpolated median per group — `percentile` (exact, sort-based
    * per group) vs the sketch form in [[sketchStats]]. At 100 TB the exact
    * form costs a per-group sort; the t-digest/GK sketch replaces it. */
  def percentileExact(spark: SparkSession, sf: String): DataFrame =
    Tables.load(spark, sf, "lineitem")
      .groupBy("l_returnflag")
      .agg(round(percentile(col("l_extendedprice"), lit(0.5)), 4).as("median_price"))
      .orderBy("l_returnflag")

  /** Day-of-week aggregation (0 = Sunday, matching DuckDB's dayofweek). */
  def dayOfWeek(spark: SparkSession, sf: String): DataFrame =
    EventOps.events(spark, sf)
      .groupBy((dayofweek(col("ts")) - 1).cast("long").as("dow"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 4).as("sum_value"))
      .orderBy("dow")

  /** Gaussian KDE over a fixed evaluation grid — closes SURVEY.md §2.3 A6
    * (the seaborn `kde=True` overlay, `app_test.py:109`). density(x) =
    * mean over rows of N(x − v; h) — an avg of codegen'd exp terms per grid
    * point: the 21-point grid broadcasts, the data side scans once, and the
    * aggregate combines map-side. Rounded to 8 decimals (densities are
    * ~1e-4; libm exp differs across engines only in the last ulp). */
  val KdeBandwidth = 500.0
  val KdeGrid: Seq[Double] = (-1000 to 10000 by 550).map(_.toDouble)

  def kde(spark: SparkSession, sf: String): DataFrame = {
    import spark.implicits._
    val grid = KdeGrid.toDF("x")
    val h = KdeBandwidth
    val norm = h * math.sqrt(2 * math.Pi)
    val d = col("x") - col("v")
    // Each Gaussian term ∈ (0,1] is floor-quantized once to the 2²⁴ grid
    // and summed as exact Longs (the cov draw-stability discipline): the
    // r12 margin audit measured this cell mean 1.7e-10 from a round-8
    // half-boundary — an order-dependent double sum there needed a
    // reviewed-floor whitelist entry; the exact sum retires it. The final
    // (S/2²⁴)/n/norm division chain is spelled identically in the DuckDB
    // oracle, so the pre-round double is a pure function of the data.
    val g = graft.functions.CovFunctions.CovGridScale.toDouble
    Tables.load(spark, sf, "customer").select(col("c_acctbal").as("v"))
      .join(broadcast(grid))
      .groupBy("x")
      .agg(round(
        sum(floor(exp(-(d * d) / (2 * h * h)) * g).cast("long")).cast("double")
          / g / count(lit(1)) / norm, 8).as("density"))
      .orderBy("x")
  }

  /** Full outer join with null-coalescing on both sides (SURVEY.md §2.5 ext).
    * Both inputs are filtered so each contributes unmatched keys (every
    * customer has orders in the fixtures): customers whose big orders have no
    * high balance → right-null, high-balance customers with no big order →
    * left-null. At 100 TB this is a key-partitioned shuffle join on both
    * sides — no broadcast is possible for FULL OUTER, so the co-location
    * story is bucketing (see the SinkSpec bucketed-join proof). */
  def joinOuter(spark: SparkSession, sf: String): DataFrame = {
    val big = Tables.load(spark, sf, "orders")
      .filter(col("o_totalprice") > 350000.0)
      .groupBy("o_custkey")
      .agg(count(lit(1)).as("n_big_orders"), round(sum("o_totalprice"), 4).as("big_total"))
    val rich = Tables.load(spark, sf, "customer")
      .filter(col("c_acctbal") > 5000.0)
      .select(col("c_custkey"), round(col("c_acctbal"), 2).as("acctbal"))
    big.join(rich, col("o_custkey") === col("c_custkey"), "full_outer")
      .select(
        coalesce(col("o_custkey"), col("c_custkey")).as("custkey"),
        coalesce(col("n_big_orders"), lit(0L)).as("n_big_orders"),
        coalesce(col("big_total"), lit(0.0)).as("big_total"),
        col("acctbal"))
      .orderBy("custkey")
  }

  /** UNION ALL vs UNION DISTINCT, tagged in one output (SURVEY.md §2.8).
    * `union` in Spark is bag semantics (SQL UNION ALL); the distinct form
    * adds one shuffle for the dedup — at scale prefer the ALL form and
    * dedup once downstream if needed. */
  def unionTagged(spark: SparkSession, sf: String): DataFrame = {
    val c = Tables.load(spark, sf, "customer")
    val a = c.filter(col("c_acctbal") > 8000.0).select("c_custkey")
    val b = c.filter(col("c_mktsegment") === "MACHINERY").select("c_custkey")
    a.union(b).withColumn("op", lit("union_all"))
      .union(a.union(b).distinct().withColumn("op", lit("union_distinct")))
      .select("op", "c_custkey")
      .orderBy("op", "c_custkey")
  }

  /** Unpivot (melt): wide per-group aggregates → long (group, metric, value)
    * rows — the inverse of [[pivotCounts]]. Map-only after the aggregate:
    * each wide row expands to 3 long rows with no extra shuffle. */
  def unpivotMeans(spark: SparkSession, sf: String): DataFrame =
    Tables.load(spark, sf, "lineitem")
      .groupBy("l_linestatus")
      .agg(
        round(avg("l_quantity"), 4).as("avg_qty"),
        round(avg("l_extendedprice"), 4).as("avg_price"),
        round(avg("l_discount"), 4).as("avg_discount"))
      .unpivot(
        Array(col("l_linestatus")),
        Array(col("avg_qty"), col("avg_price"), col("avg_discount")),
        "metric", "value")
      .orderBy("l_linestatus", "metric")

  /** Date/time scalar pack over order dates — extraction (year/month),
    * truncation, day arithmetic, end-of-month: the temporal-function family.
    * All codegen'd scalar expressions in the scan's projection; derived ints
    * cast to BIGINT and dates formatted as strings for cross-engine hashing. */
  def dateFuncs(spark: SparkSession, sf: String): DataFrame = {
    val d = col("o_orderdate").cast("date")
    Tables.load(spark, sf, "orders")
      .select(
        col("o_orderkey"),
        year(d).cast("long").as("yr"),
        month(d).cast("long").as("mo"),
        date_format(trunc(d, "month"), "yyyy-MM-dd").as("month_start"),
        datediff(d, lit(java.sql.Date.valueOf("1995-01-01"))).cast("long").as("days_since"),
        date_format(date_add(d, 30), "yyyy-MM-dd").as("due_date"),
        date_format(last_day(d), "yyyy-MM-dd").as("month_end"))
      .orderBy("o_orderkey")
  }

  /** Regex field extraction — structured parsing of semi-structured strings
    * (log-line parsing at pipeline scale). `regexp_extract` group capture is
    * a codegen'd scalar in the scan projection; the always-matching patterns
    * keep no-match semantics (Spark '' vs engine NULLs) out of the oracle. */
  def regexExtract(spark: SparkSession, sf: String): DataFrame =
    Tables.load(spark, sf, "customer")
      .select(
        col("c_custkey"),
        regexp_extract(col("c_name"), "([0-9]+)", 1).as("name_digits"),
        regexp_extract(col("c_name"), "^([A-Za-z]+)", 1).as("name_word"))
      .orderBy("c_custkey")

  /** Array aggregation — collect the (filtered) order keys per status into a
    * deterministic sorted list, emitted as a CSV string so the hash-compare
    * is engine-neutral. `collect_list` order is partition-dependent by
    * design; `sort_array` restores determinism — zero-padded so lexical
    * order equals numeric order. At scale collect_list per group is bounded
    * by the pre-filter, not table size (unbounded array aggs don't scale). */
  def arrayAgg(spark: SparkSession, sf: String): DataFrame =
    Tables.load(spark, sf, "orders")
      .filter(col("o_totalprice") > 400000.0)
      .groupBy("o_orderstatus")
      .agg(
        count(lit(1)).as("n"),
        concat_ws(",",
          sort_array(collect_list(lpad(col("o_orderkey").cast("string"), 10, "0"))))
          .as("keys_csv"))
      .orderBy("o_orderstatus")

  /** SCD-1 upsert (merge): updates override matching base rows, inserts
    * append. Without a transactional table format MERGE INTO isn't available;
    * the engine-level equivalent is anti-join + union — both sides hash-
    * partition once on the key, so at 100 TB the cost is one co-partitioned
    * shuffle (or zero with bucketed layout). The updates table is derived
    * deterministically from the fixtures: every 5th customer gets a new
    * balance, every 7th spawns an insert under a disjoint key range. */
  def upsert(spark: SparkSession, sf: String): DataFrame = {
    val base = Tables.load(spark, sf, "customer")
      .select(col("c_custkey").as("custkey"),
        (round(col("c_acctbal"), 2) + lit(0.0)).as("acctbal"))
    val updates = base.filter(col("custkey") % 5 === 0)
      .select(col("custkey"), (round(col("acctbal") + 1000.0, 2) + lit(0.0)).as("acctbal"))
      .union(base.filter(col("custkey") % 7 === 0)
        .select((col("custkey") + 10000000L).as("custkey"), lit(0.0).as("acctbal")))
    updates.withColumn("src", lit("new"))
      .union(base.join(updates, Seq("custkey"), "left_anti").withColumn("src", lit("base")))
      .select("custkey", "acctbal", "src")
      .orderBy("custkey")
  }

  /** CDC apply — compact a change stream (op ∈ U/D, ordered by a unique
    * sequence) onto a base snapshot: per key keep only the LATEST change
    * (map-side-combinable argmax, shuffle = key cardinality), then one
    * co-partitioned left join applies it — U overrides the balance, D
    * tombstones the row. Complements [[upsert]] (SCD-1, no deletes) with
    * the delete semantics a real CDC feed carries; with a transactional
    * format this is the MERGE ... WHEN MATCHED DELETE form. The change
    * stream derives deterministically from `orders` (seq = o_orderkey;
    * every 17th order is a delete). */
  def cdcApply(spark: SparkSession, sf: String): DataFrame = {
    val base = Tables.load(spark, sf, "customer")
      .select(col("c_custkey").as("custkey"), col("c_acctbal").as("bal"))
    val changes = Tables.load(spark, sf, "orders").select(
      col("o_custkey").as("custkey"),
      when(col("o_orderkey") % 17 === 0, "D").otherwise("U").as("op"),
      col("o_totalprice").as("new_bal"),
      col("o_orderkey").as("seq"))
    val latest = changes.groupBy("custkey")
      .agg(max_by(struct(col("op"), col("new_bal")), col("seq")).as("c"))
      .select(col("custkey"), col("c.op").as("op"), col("c.new_bal").as("new_bal"))
    base.join(latest, Seq("custkey"), "left")
      .filter(col("op").isNull || col("op") =!= "D")
      .select(col("custkey"),
        round(when(col("op") === "U", col("new_bal")).otherwise(col("bal")), 2).as("bal"))
      .orderBy("custkey")
  }

  /** Snapshot diff — the PRODUCER dual of [[cdcApply]]: given two table
    * snapshots, emit the change feed (I/U/D rows) that transforms old into
    * new. One full-outer join co-partitioned on the key classifies every
    * row: right-only → insert, left-only → delete, both-but-changed →
    * update (unchanged rows drop out — the feed is minimal). The "new"
    * snapshot derives deterministically from the fixtures with all three
    * change kinds: every 5th customer's balance moves, every 13th is
    * dropped, and a disjoint key range is inserted. At 100 TB both sides
    * hash-partition once on the key (or zero shuffles with bucketed
    * layout), and the diff is the standard backfill-free way to generate
    * incremental feeds from full dumps. */
  def snapshotDiff(spark: SparkSession, sf: String): DataFrame = {
    val old = oldSnapshot(spark, sf)
    changeFeed(old, newSnapshot(old))
      .select(col("key"), col("op"),
        coalesce(col("new_bal"), col("old_bal")).as("bal"))
      .orderBy("key")
  }

  /** The diff fixtures' "old" snapshot: customer keys + 2-dp balances. */
  private def oldSnapshot(spark: SparkSession, sf: String): DataFrame =
    Tables.load(spark, sf, "customer")
      .select(col("c_custkey").as("key"), (round(col("c_acctbal"), 2) + lit(0.0)).as("bal"))

  /** Deterministic "new" snapshot with all three change kinds: every 13th
    * key dropped, every 5th balance moved, a disjoint key range inserted. */
  private def newSnapshot(old: DataFrame): DataFrame =
    old.filter(col("key") % 13 =!= 0)
      .select(col("key"),
        when(col("key") % 5 === 0, round(col("bal") + 100.0, 2) + lit(0.0)).otherwise(col("bal"))
          .as("bal"))
      .union(old.filter(col("key") % 7 === 0)
        .select((col("key") + 20000000L).as("key"), lit(1.0).as("bal")))

  /** Minimal change feed WITH before/after images (the Debezium row shape):
    * one co-partitioned full-outer join classifies every key; unchanged
    * rows drop out. Carrying old_bal AND new_bal is what lets a consumer
    * maintain aggregates incrementally ([[mvRefresh]]) — a feed with only
    * the after-image forces a re-read of the base table for every U/D. */
  private[graft] def changeFeed(old: DataFrame, neu: DataFrame): DataFrame =
    old.select(col("key"), col("bal").as("old_bal"))
      .join(neu.select(col("key"), col("bal").as("new_bal")), Seq("key"), "full_outer")
      .withColumn("op",
        when(col("old_bal").isNull, "I")
          .when(col("new_bal").isNull, "D")
          .when(col("old_bal") =!= col("new_bal"), "U"))
      .filter(col("op").isNotNull)

  /** Incremental materialized-view refresh — the CONSUMER of
    * [[changeFeed]], closing the producer/consumer loop that
    * [[snapshotDiff]] and [[EventOps.cdcApply]] open. The standing MV
    * (per-bucket count + sum over the old snapshot) is merged with
    * per-bucket DELTAS aggregated from the feed alone: I → (+1, +new),
    * D → (−1, −old), U → (0, new−old). Count and sum are self-maintainable
    * aggregates, so refresh cost is O(|feed|) + one co-partitioned merge
    * join with the stored MV — it never rescans the 100 TB base table,
    * which is the entire economics of incremental ETL. The oracle is the
    * full recompute over the new snapshot: the incremental path must land
    * on identical rows (empty buckets retired, n = 0 rows dropped). */
  def mvRefresh(spark: SparkSession, sf: String): DataFrame = {
    val old = oldSnapshot(spark, sf)
    mvRefreshFrom(old, changeFeed(old, newSnapshot(old)))
  }

  /** The delta-merge core of [[mvRefresh]], over any (key, bal) snapshot and
    * (key, op, old_bal, new_bal) feed — split out so the algebra is
    * property-testable on generated inputs. */
  private[graft] def mvRefreshFrom(old: DataFrame, feed: DataFrame): DataFrame =
    mvMerge(mvOf(old), feedDeltas(feed))

  /** The standing MV: per-bucket count + sum of a (key, bal) snapshot. */
  private[graft] def mvOf(snapshot: DataFrame): DataFrame =
    snapshot.groupBy((col("key") % 20).as("bucket"))
      .agg(count(lit(1)).as("n"), sum("bal").as("s"))

  /** Per-bucket (Δcount, Δsum) of a change feed — the partial an
    * incremental maintainer aggregates per batch (count/sum deltas are
    * associative+commutative, so batch partials sum to the total delta —
    * which is what makes the streaming form, [[graft.streaming.StreamOps]]
    * `mvDeltaSink`, a pure append of per-batch partials). */
  private[graft] def feedDeltas(feed: DataFrame): DataFrame =
    feed.groupBy((col("key") % 20).as("bucket"))
      .agg(
        sum(when(col("op") === "I", 1L).when(col("op") === "D", -1L)
          .otherwise(0L)).as("dn"),
        sum(when(col("op") === "I", col("new_bal"))
          .when(col("op") === "D", -col("old_bal"))
          .otherwise(col("new_bal") - col("old_bal"))).as("ds"))

  /** Merge accumulated (dn, ds) deltas into the standing MV; buckets whose
    * count hits zero are retired. */
  private[graft] def mvMerge(mv: DataFrame, deltas: DataFrame): DataFrame =
    mv.join(deltas, Seq("bucket"), "full_outer")
      .select(col("bucket"),
        (coalesce(col("n"), lit(0L)) + coalesce(col("dn"), lit(0L))).as("n"),
        (round(coalesce(col("s"), lit(0.0)) + coalesce(col("ds"), lit(0.0)), 2)
          + lit(0.0)).as("sum_bal"))
      .filter(col("n") > 0)
      .orderBy("bucket")

  /** CSV round-trip — the reference's upload path (`pd.read_csv`,
    * `app_test.py:262-263`): write a table as CSV, read it back with an
    * explicit schema (never inference, SURVEY.md §1.4), prove losslessness. */
  def csvRoundtrip(spark: SparkSession, sf: String): DataFrame = {
    val region = Tables.load(spark, sf, "region")
    val tmp = SourceOps.materialize(s"csv_$sf") { dir =>
      region.coalesce(1).write.mode("overwrite").option("header", "true").csv(dir)
    }
    Tables.loadCsv(spark, tmp, region.schema)
      .select("r_regionkey", "r_name")
      .orderBy("r_regionkey")
  }

  /** Three-valued-logic semantics pack: NULL-skipping aggregates, COALESCE
    * defaulting, and null-safe equality (`<=>` ≡ IS NOT DISTINCT FROM) on
    * two derived nullable columns. ANSI NULL discipline is load-bearing in
    * a 100 TB pipeline — count(col) vs count(*) drift or a `=` that
    * silently drops NULL=NULL pairs corrupts every downstream join/dedup;
    * this query pins the exact semantics against the oracle. */
  def nullSemantics(spark: SparkSession, sf: String): DataFrame = {
    val x = when(col("o_orderstatus") =!= "O", col("o_totalprice"))
    val y = when(col("o_orderstatus") =!= "F", col("o_totalprice"))
    Tables.load(spark, sf, "orders")
      .select(col("o_orderpriority"), x.as("x"), y.as("y"))
      .groupBy("o_orderpriority")
      .agg(
        count(lit(1)).as("n_total"),
        count(col("x")).as("n_x"),
        sum(when(col("x").isNull, 1L).otherwise(0L)).as("n_x_null"),
        round(avg(col("x")), 4).as("avg_x"),
        round(avg(coalesce(col("x"), lit(0.0))), 4).as("avg_x0"),
        sum(when(col("x") <=> col("y"), 1L).otherwise(0L)).as("n_nullsafe_eq"))
      .orderBy("o_orderpriority")
  }

  /** Ordered intra-group string aggregation — the LISTAGG ... WITHIN GROUP
    * surface (SQL:2016, new as a built-in in Spark 4): per market segment,
    * the top-3 customer names by balance as one ordered comma-joined
    * string. Rank first (one window per segment), THEN aggregate the ≤ 3
    * survivors — the aggregate's input is 3 rows per group regardless of
    * customer count, so the concat state never grows with the data (the
    * unbounded form — listagg over all members — is the documented
    * anti-pattern at 100 TB: per-group state is O(group size) strings).
    * Through the `spark.sql` front door to exercise the WITHIN GROUP
    * parse path (the [[TpchOps.shippingPriority]] precedent), with the
    * same catalog-hygiene discipline. Total order (bal DESC, custkey)
    * makes rank and concat order engine-independent. */
  def topNamesListAgg(spark: SparkSession, sf: String): DataFrame = {
    Tables.load(spark, sf, "customer").createOrReplaceTempView("graft_la_customer")
    try spark.sql(
      """WITH ranked AS (
        |  SELECT c_mktsegment, c_name,
        |    row_number() OVER (PARTITION BY c_mktsegment
        |      ORDER BY c_acctbal DESC, c_custkey) AS rk
        |  FROM graft_la_customer)
        |SELECT c_mktsegment,
        |  listagg(c_name, ',') WITHIN GROUP (ORDER BY rk) AS top_names
        |FROM ranked WHERE rk <= 3
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin)
    finally spark.catalog.dropTempView("graft_la_customer")
  }

  /** Distribution-rank window pack — `dense_rank`, `percent_rank`,
    * `cume_dist` per market segment over account balance, the analytic
    * trio [[windowFrames]]'s frame/offset family doesn't cover. The
    * window orders by VALUE ONLY (no tie-break key): all three functions
    * are functions of the value's position in the group's multiset, so
    * ties get identical outputs and the result is deterministic without a
    * unique ordering — which is exactly what makes them safe to compare
    * across engines (a row-unique order would make them trivially
    * rank/n). One hash partitioning on segment scores every row in one
    * pass; rounding keeps the two ratio outputs off the hash boundary. */
  def rankPack(spark: SparkSession, sf: String): DataFrame = {
    val w = Window.partitionBy("c_mktsegment").orderBy(col("c_acctbal").desc)
    Tables.load(spark, sf, "customer")
      .select(col("c_custkey"), col("c_mktsegment"),
        dense_rank().over(w).cast("long").as("drank"),
        round(percent_rank().over(w), 4).as("prank"),
        round(cume_dist().over(w), 4).as("cdist"))
      .orderBy("c_custkey")
  }

  /** Correlated LATERAL subquery — each customer's 2 priciest orders, the
    * top-N-per-key shape stated as the SQL standard writes it (a per-row
    * dependent subquery with ORDER BY … LIMIT) instead of the
    * window+filter rewrite [[windowRank]] uses. Catalyst DECORRELATES it:
    * the planned query is one equi-join on custkey feeding a per-key
    * rank filter — no per-customer re-execution, same plan family as the
    * window form, so the 100 TB cost is one fact shuffle regardless of
    * customer count (the spec pins no BroadcastNestedLoop/Cartesian in
    * the plan). Through the `spark.sql` front door because LATERAL is a
    * parser-level surface; temp views are dropped in `finally` (the
    * [[topNamesListAgg]] catalog-hygiene discipline). Only customers
    * with orders appear (inner lateral join) — stated in the oracle as a
    * plain JOIN. */
  def lateralTopN(spark: SparkSession, sf: String): DataFrame = {
    Tables.load(spark, sf, "customer").createOrReplaceTempView("graft_lat_customer")
    Tables.load(spark, sf, "orders").createOrReplaceTempView("graft_lat_orders")
    try spark.sql(
      """SELECT c.c_custkey, o.o_orderkey, o.o_totalprice
        |FROM graft_lat_customer c
        |JOIN LATERAL (
        |  SELECT o_orderkey, o_totalprice FROM graft_lat_orders
        |  WHERE o_custkey = c.c_custkey
        |  ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) o
        |ORDER BY c.c_custkey, o.o_totalprice DESC, o.o_orderkey""".stripMargin)
    finally {
      spark.catalog.dropTempView("graft_lat_customer")
      spark.catalog.dropTempView("graft_lat_orders")
    }
  }

  /** ANSI-safe arithmetic pack — Spark 4 runs ANSI mode ON, so raw
    * division by zero / bigint overflow THROW instead of silently nulling
    * or wrapping; `try_divide` / `try_add` are the per-expression escape
    * hatch that keeps a 100 TB job from dying on one poisoned row while
    * preserving strictness everywhere else. The quantity−1 denominator
    * manufactures real zeros from fixture data; the Long.MaxValue addend
    * manufactures real overflows on ~0.1% of rows (orderkey ≡ 0 mod 1000
    * adds 1 to Long.MaxValue). Poison density matters, and it's MEASURED:
    * `TryEval` implements the TRY semantics as a per-row try/catch, so
    * every poisoned row costs a thrown-and-caught ArithmeticException
    * (~20 µs with stack fill) — at 100%-poisoned this one-pass aggregate
    * went 0.5 → 13 s at sf0.1. The operator contract is therefore
    * "`try_*` protects against RARE poison"; a column where errors are
    * the common case should be pre-filtered or computed with explicit
    * CASE guards instead. Map-only over the scan + one-row aggregate;
    * the oracle states the NULL contract explicitly as CASE arms. The
    * mean is rounded (not the sum): a ratio sum isn't decimal-exact, and
    * the mean's relative summation noise (~1e-14) is far below 4 dp. */
  def tryArithmetic(spark: SparkSession, sf: String): DataFrame = {
    val ratio = try_divide(col("l_extendedprice"), col("l_quantity") - lit(1))
    val poisonedAdd = try_add(lit(Long.MaxValue),
      when(col("l_orderkey") % 1000 === 0, lit(1L)).otherwise(lit(0L)))
    Tables.load(spark, sf, "lineitem")
      .agg(
        count(lit(1)).as("n"),
        count(ratio).as("n_div_ok"),
        round(avg(ratio), 4).as("avg_ratio"),
        count(poisonedAdd).as("n_add_ok"))
  }

  /** Columns profiled by [[columnProfile]]. */
  val ProfileColumns: Seq[String] =
    Seq("c_acctbal", "c_custkey", "c_mktsegment", "c_name", "c_nationkey")

  /** One-pass whole-table column profile — the ANALYZE TABLE / `describe`
    * shape every catalog and data-quality tool runs first: per column,
    * null count, exact distinct count, and min/max (rendered to string so
    * heterogeneous column types share one output schema). ONE aggregate
    * over the scan computes all 5 columns × 4 metrics; the multi-column
    * DISTINCTs plan as a single Expand (×5 row duplication) feeding one
    * shuffle — not 5 scans. Min/max/null-count partials are
    * map-side-combined; the melt to (column, metric…) rows is a `stack`
    * over the single aggregate row, map-only. At 100 TB the Expand's ×N
    * duplication is the cost driver — the documented swap is
    * `approx_count_distinct` (HLL partials, no Expand, same single-pass
    * plan), the [[sketchStats]] precedent; the exact form IS the oracle
    * twin. */
  def columnProfile(spark: SparkSession, sf: String): DataFrame = {
    val cols = ProfileColumns
    val aggs = cols.flatMap { c => Seq(
      count(when(col(c).isNull, lit(1))).as(s"${c}__nulls"),
      count_distinct(col(c)).as(s"${c}__nd"),
      min(col(c)).cast("string").as(s"${c}__min"),
      max(col(c)).cast("string").as(s"${c}__max"))
    }
    Tables.load(spark, sf, "customer")
      .agg(aggs.head, aggs.tail: _*)
      .select(expr(
        s"stack(${cols.size}, " + cols.map(c =>
          s"'$c', ${c}__nulls, ${c}__nd, ${c}__min, ${c}__max").mkString(", ") +
          ") AS (column_name, n_nulls, n_distinct, min_v, max_v)"))
      .orderBy("column_name")
  }

  /** Insert an explicit-width exchange on `key` ONLY when `scan` is
    * narrower than the session shuffle width — the bench-scale spread for
    * compute-heavy aggregates over a single-row-group scan, without the
    * 100 TB cost of an unconditional full-data exchange (r19 advisor #6:
    * a wide production scan never needs it — aggregate partials merge
    * buffers, not rows). Physical partition count read off the compiled
    * scan (no job runs). */
  private def spreadNarrowScan(spark: SparkSession, scan: DataFrame,
      key: org.apache.spark.sql.Column): DataFrame = {
    val width = spark.conf.get("spark.sql.shuffle.partitions").toInt
    if (scan.rdd.getNumPartitions < width) scan.repartition(width, key)
    else scan
  }

  /** Per-group winsorization — clip a value column to its group's
    * [p05, p95] band and report how many rows each tail clipped plus the
    * before/after means: the standard outlier-robustification pass a
    * feature pipeline runs before scaling (a single corrupt sensor read
    * otherwise owns the group's mean and the fitted scaler with it). Two
    * passes by necessity (quantiles, then clip) but ONE shuffle each: the
    * exact per-group percentiles are a sort-based aggregate (3 group
    * rows), broadcast-joined back onto the scan; at 100 TB the exact
    * percentile swaps for `approx_percentile` — same shape, sketch
    * accuracy, one pass ([[sketchStats]] is that form). Interpolated
    * `percentile` matches DuckDB's `quantile_cont` bit-for-bit
    * (the parity [[percentileExact]] pins). */
  def winsorize(spark: SparkSession, sf: String): DataFrame = {
    // spread the single-row-group bench-scale scan with an EXPLICIT
    // width: the exact percentile partials buffer a value→count map per
    // task, the stage's real cost — AQE's byte-based coalescing would
    // serialize it (blind to per-row aggregate compute). GUARDED on scan
    // parallelism (r19 advisor: at 100 TB the scan is already wide and an
    // unconditional repartition would insert a full-data exchange the
    // percentile partial-aggregate pipeline never needs — partials merge
    // buffers, not rows): the exchange exists only while the scan is
    // narrower than the session width
    val li = spreadNarrowScan(spark,
      Tables.load(spark, sf, "lineitem")
        .select(col("l_returnflag"), col("l_extendedprice").as("x")),
      col("x"))
    val bands = li.groupBy("l_returnflag")
      .agg(
        percentile(col("x"), lit(0.05)).as("lo"),
        percentile(col("x"), lit(0.95)).as("hi"))
    li.join(broadcast(bands), "l_returnflag")
      .groupBy("l_returnflag")
      .agg(
        count(lit(1)).as("n"),
        sum(when(col("x") < col("lo"), 1L).otherwise(0L)).as("n_clipped_lo"),
        sum(when(col("x") > col("hi"), 1L).otherwise(0L)).as("n_clipped_hi"),
        round(avg(col("x")), 4).as("mean_raw"),
        round(avg(greatest(col("lo"), least(col("hi"), col("x")))), 4)
          .as("mean_winsor"))
      .orderBy("l_returnflag")
  }

  /** Chi-square independence test between market segment and order
    * priority — "is the categorical feature informative about the label,
    * or can the pipeline drop it": the feature-selection screen run
    * before one-hot-encoding ([[graft.ops.Scoring]]'s encoder) blows up
    * the feature space. Plan: one (segment × priority) cell census — a
    * 25-row relation — then margins via windows OVER THAT CENSUS (never
    * a second scan of the fact), expected counts e = row·col/N, and
    * χ² = Σ (o−e)²/e. The customer join carries NO broadcast hint —
    * customers scale with the data ([[brandRevenue]]'s rule); at SFs
    * where the dim fits, AQE picks broadcast unaided. dof is (r−1)(c−1)
    * computed from the observed domain sizes, not hardcoded. */
  def chi2(spark: SparkSession, sf: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cells = Tables.load(spark, sf, "orders")
      .join(Tables.load(spark, sf, "customer"),
        col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment", "o_orderpriority")
      .agg(count(lit(1)).as("o"))
    val withMargins = cells.select(
      col("o").cast("double").as("o"),
      sum("o").over(Window.partitionBy("c_mktsegment")).cast("double").as("rt"),
      sum("o").over(Window.partitionBy("o_orderpriority")).cast("double").as("ct"),
      sum("o").over(Window.partitionBy()).cast("double").as("n"),
      col("c_mktsegment"), col("o_orderpriority"))
    withMargins.agg(
        round(sum((col("o") - col("rt") * col("ct") / col("n")) *
          (col("o") - col("rt") * col("ct") / col("n")) /
          (col("rt") * col("ct") / col("n"))), 4).as("chi2"),
        ((countDistinct("c_mktsegment") - 1) *
          (countDistinct("o_orderpriority") - 1)).as("dof"),
        max("n").cast("long").as("n"))
  }

  /** Equal-width bin size for [[psi]] over `l_extendedprice`. */
  val PsiBinWidth = 7000.0

  /** Population Stability Index between the early (<1998) and late
    * (≥1998) shipment populations' price distributions — the
    * model-monitoring drift score ([[ksDrift]] is the distribution-shape
    * twin; PSI is what scorecards alarm on: <0.1 stable, >0.25 retrain).
    * Prices bin into fixed [[PsiBinWidth]]-wide buckets — integer
    * binning, no quantile estimation — so the two one-pass conditional
    * censuses are ONE aggregate over the scan. Σ (p−q)·ln(p/q) runs over
    * bins populated on BOTH sides (the standard finite-PSI convention;
    * `n_bins_skipped` reports how many one-sided bins were excluded
    * rather than silently smoothing them away). */
  def psi(spark: SparkSession, sf: String): DataFrame = {
    val cut = lit("1998-01-01").cast("timestamp")
    val li = Tables.load(spark, sf, "lineitem").select(
      floor(col("l_extendedprice") / lit(PsiBinWidth)).as("bin"),
      when(col("l_shipdate") < cut, 1L).otherwise(0L).as("a"),
      when(col("l_shipdate") >= cut, 1L).otherwise(0L).as("b"))
    val bins = li.groupBy("bin")
      .agg(sum("a").as("na"), sum("b").as("nb"))
    val tot = bins.agg(sum("na").as("ta"), sum("nb").as("tb"))
    bins.join(broadcast(tot))
      .select(col("na"), col("nb"),
        (col("na") * lit(1.0) / col("ta")).as("p"),
        (col("nb") * lit(1.0) / col("tb")).as("q"),
        col("ta"), col("tb"))
      .groupBy("ta", "tb")
      .agg(
        round(sum(when(col("na") > 0 && col("nb") > 0,
          (col("p") - col("q")) * log(col("p") / col("q")))
          .otherwise(lit(0.0))), 6).as("psi"),
        sum(when(col("na") > 0 && col("nb") > 0, 1L).otherwise(0L))
          .as("n_bins_used"),
        sum(when(col("na") === 0 || col("nb") === 0, 1L).otherwise(0L))
          .as("n_bins_skipped"))
      .select(col("psi"), col("n_bins_used"), col("n_bins_skipped"),
        col("ta").as("n_early"), col("tb").as("n_late"))
  }

  /** Lag-1 autocorrelation of the daily-revenue series — the "is there
    * momentum / is yesterday predictive" screen run before fitting any
    * forecaster. Two cascaded shapes, both bounded: the daily rollup is
    * the only fact-sized shuffle; the lag window and the final `corr`
    * run over |days| rows (the [[ksDrift]] bounded-relation argument —
    * the window's global order never sees raw orders). `corr` is
    * algebraic, so the day-pair relation reduces map-side. Calendar gaps
    * use PHYSICAL series order (lag = previous observed day), the
    * convention that keeps the statistic defined on sparse fixtures;
    * [[EventOps.gapFill]] composes upstream when true calendar lag is wanted. */
  def autocorr(spark: SparkSession, sf: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = Tables.load(spark, sf, "orders")
      .groupBy(col("o_orderdate").cast("date").as("day"))
      .agg(sum("o_totalprice").as("rev"))
    val paired = daily.select(col("rev"),
      lag("rev", 1).over(Window.orderBy("day")).as("prev"))
    paired.filter(col("prev").isNotNull)
      .agg(
        count(lit(1)).as("n_pairs"),
        (round(corr(col("rev"), col("prev")), 4) + lit(0.0)).as("acf1"))
  }

  /** 1-in-N sampling denominator for [[aqpSample]]. */
  val AqpBuckets = 16L

  /** Approximate query processing from a deterministic hash sample — the
    * interactive-analytics tier: answer a scan-heavy aggregate from a
    * 1/16 Bernoulli sample with a 95% error bar instead of reading 100 TB.
    * The sample is md5-bucketed on the row key (the [[TextOps
    * .weightedSample]] draw discipline), so it is reproducible in any
    * engine — which is also what makes the estimate DuckDB-oracled
    * exactly, not statistically. Estimates scale by 1/p; the count CI
    * uses Var(N̂) ≈ n·(1/p)(1/p−1) (Bernoulli sampling variance with the
    * sample count standing in for pN). The exact columns make this the
    * AUDIT form — production materializes the sample as its own table
    * (one-time pass, then every interactive query reads 6% of the bytes)
    * and never computes them. */
  def aqpSample(spark: SparkSession, sf: String): DataFrame = {
    val keyed = Tables.load(spark, sf, "lineitem").select(
      col("l_returnflag"), col("l_quantity"),
      (conv(substring(md5(concat_ws("|",
        col("l_orderkey").cast("string"),
        col("l_linenumber").cast("string"))), 1, 15), 16, 10)
        .cast("long") % AqpBuckets).as("bucket"))
    val sample = keyed.filter(col("bucket") === 0L)
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n_sample"), sum("l_quantity").as("s_qty"))
    val exact = keyed.groupBy("l_returnflag")
      .agg(count(lit(1)).as("exact_rows"),
        round(sum("l_quantity"), 4).as("exact_qty"))
    sample.join(exact, "l_returnflag")
      .select(col("l_returnflag"), col("n_sample"),
        (col("n_sample") * AqpBuckets).as("est_rows"),
        col("exact_rows"),
        round(lit(1.96) * sqrt(col("n_sample").cast("double") *
          (AqpBuckets * (AqpBuckets - 1)).toDouble), 4).as("rows_ci95"),
        round(col("s_qty") * AqpBuckets, 4).as("est_qty"),
        col("exact_qty"))
      .orderBy("l_returnflag")
  }

  /** Walk-forward forecast backtest over the daily revenue series — the
    * capacity-planning loop: score the two standard zero-parameter
    * baselines (naive-1 = yesterday, seasonal-7 = same weekday last week)
    * against every realized day, reporting MAPE and sMAPE per model. Any
    * real forecaster must beat these numbers; producing them IS the
    * pipeline's job. Plan: the daily rollup is the only fact-sized
    * shuffle; lags and scoring run over the |days|-row series (the
    * [[autocorr]] bounded-window argument, same physical-series lag
    * convention — [[EventOps.gapFill]] composes upstream for calendar
    * lags). Both models score only days where the 7-lag exists, so they
    * are compared on the SAME eval window. */
  def forecastBacktest(spark: SparkSession, sf: String): DataFrame = {
    val w = Window.orderBy("day")
    val daily = Tables.load(spark, sf, "orders")
      .groupBy(col("o_orderdate").cast("date").as("day"))
      .agg(sum("o_totalprice").as("rev"))
    val lagged = daily.select(col("rev"),
      lag("rev", 1).over(w).as("naive1"),
      lag("rev", 7).over(w).as("seasonal7"))
      .filter(col("seasonal7").isNotNull)
    lagged
      .select(col("rev"), explode(map(
        lit("naive1"), col("naive1"),
        lit("seasonal7"), col("seasonal7"))).as(Seq("model", "pred")))
      .groupBy("model")
      .agg(count(lit(1)).cast("long").as("n_days"),
        round(avg(abs(col("rev") - col("pred")) / col("rev")), 4).as("mape"),
        round(avg(abs(col("rev") - col("pred")) * lit(2.0) /
          (abs(col("rev")) + abs(col("pred")))), 4).as("smape"))
      .orderBy("model")
  }

  /** Mutual information between customer segment and order priority — the
    * information-theoretic companion of [[chi2]] (same one-pass cell
    * census, same window margins): I(X;Y) = Σ p(x,y)·log2(p(x,y)/(p(x)p(y))),
    * plus the marginal entropies and the normalized score
    * I/√(H(X)H(Y)) — the feature-relevance number a curation pipeline
    * ranks candidate features by (MI sees non-linear association that
    * correlation misses; χ² tests significance, MI measures magnitude).
    * All log chains are written in the same operand order as the oracle
    * so IEEE rounding agrees. Independent-ish fixture columns score ≈ 0,
    * which is itself the point of the audit. */
  def mutualInfo(spark: SparkSession, sf: String): DataFrame = {
    val cells = Tables.load(spark, sf, "orders")
      .join(Tables.load(spark, sf, "customer"),
        col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment", "o_orderpriority")
      .agg(count(lit(1)).as("o"))
    val m = cells.select(
      col("o").cast("double").as("o"),
      sum("o").over(Window.partitionBy("c_mktsegment")).cast("double").as("rt"),
      sum("o").over(Window.partitionBy("o_orderpriority")).cast("double").as("ct"),
      sum("o").over(Window.partitionBy()).cast("double").as("n"))
    val mi = m.agg(
      sum((col("o") / col("n")) *
        log2(col("o") * col("n") / (col("rt") * col("ct")))).as("mi"))
    // marginal entropies from the margin relations (distinct x / y rows)
    val hx = cells.groupBy("c_mktsegment").agg(sum("o").as("c"))
      .agg(sum(col("c")).as("n"), sum(col("c") * log2(col("c"))).as("slc"))
      .select((log2(col("n")) - col("slc") / col("n")).as("h_segment"))
    val hy = cells.groupBy("o_orderpriority").agg(sum("o").as("c"))
      .agg(sum(col("c")).as("n"), sum(col("c") * log2(col("c"))).as("slc"))
      .select((log2(col("n")) - col("slc") / col("n")).as("h_priority"))
    mi.select(col("mi")).join(hx).join(hy)
      .select(round(col("mi"), 4).as("mi"),
        round(col("h_segment"), 4).as("h_segment"),
        round(col("h_priority"), 4).as("h_priority"),
        round(col("mi") / sqrt(col("h_segment") * col("h_priority")), 4)
          .as("nmi"))
  }

  /** Hierarchy (BOM-style) rollup — the recursive-traversal shape every
    * warehouse needs for org charts / bills of material / category trees,
    * which plain SQL-on-Spark lacks (no recursive CTE): iterative
    * breadth-first labeling, one equi-join per LEVEL (not per node), with
    * the frontier `localCheckpoint`ed each round so lineage stays flat —
    * the [[graft.ops.TextOps]] label-propagation discipline applied to a
    * DAG. The fixture has no hierarchy, so a binary tree is synthesized
    * over custkeys (parent = k div 2, root 0 — the [[CurationOps
    * .urlDedup]] inject-then-process pattern). Iterations are bounded by
    * TREE DEPTH (log₂ n), not node count: 100 TB of nodes is ~40 rounds
    * of small joins, each shuffling only the frontier. The per-level
    * census (node count + balance mass) is the standard rollup readout;
    * the DuckDB oracle is the genuine `WITH RECURSIVE` twin. */
  def bomRollup(spark: SparkSession, sf: String): DataFrame = {
    val nodes = Tables.load(spark, sf, "customer")
      .select(col("c_custkey").as("k"), col("c_acctbal").as("bal"))
      .persist()
    try {
      var frontier = nodes.filter(col("k") === 0)
        .withColumn("depth", lit(1L)).localCheckpoint()
      val levels = scala.collection.mutable.ArrayBuffer(frontier)
      var n = frontier.count()
      while (n > 0) {
        frontier = nodes.filter(col("k") =!= 0)
          .join(frontier.select(expr("k").as("pk"), col("depth")),
            expr("k div 2") === col("pk"))
          .select(col("k"), col("bal"), (col("depth") + 1L).as("depth"))
          .localCheckpoint() // flat lineage: each level is a fresh root
        n = frontier.count() // loop control — 1-scalar driver action
        if (n > 0) levels += frontier
      }
      levels.reduce(_ unionAll _)
        .groupBy("depth")
        .agg(count(lit(1)).as("n_nodes"), round(sum("bal"), 4).as("sum_bal"))
        .orderBy("depth")
    } finally nodes.unpersist()
  }

  /** RFM customer segmentation — the classic recency/frequency/monetary
    * quartile scoring, done the way it survives 100 TB: NOT with three
    * global `ntile` windows (a no-PARTITION window is one task holding
    * every customer) but with the three quartile cut-points computed as a
    * 1-row aggregate and broadcast back, scores assigned by comparison —
    * map-only after the per-customer rollup, identical results. Scores
    * use strict `>` against the cuts (so a metric equal to the cut stays
    * in the lower bucket on both engines — `quantile_cont` parity makes
    * the cuts bit-identical). Output is the 4³-cell segment census, not
    * per-customer rows: the decision table a marketing pipeline actually
    * consumes. Recency is measured against the fixture's global max
    * order date so the query is deterministic, not wall-clock-relative.
    *
    * DRAW-STABILITY (round-12; found by the tools_margin audit): monetary
    * was a raw double sum of prices, and one segment's avg landed EXACTLY
    * on a round-4 half-boundary — the q_embed_cov failure mode latent. The
    * money column carries 2-decimal values, so it quantizes losslessly:
    * monetary accumulates as exact cent Longs (round(price·100) is ~1e-10
    * from an integer, nowhere near a tie), the quantile cuts and score
    * comparisons run on the exact cent values, and the declared average is
    * (Σcents/100)/n over the exact Long sum — a pure function of the data,
    * identically spelled in the DuckDB twin. */
  def rfm(spark: SparkSession, sf: String): DataFrame = {
    val o = Tables.load(spark, sf, "orders")
    val maxDate = o.agg(max("o_orderdate").as("max_date"))
    val perCust = o.groupBy("o_custkey")
      .agg(
        max("o_orderdate").as("last_order"),
        count(lit(1)).as("frequency"),
        sum(round(col("o_totalprice") * 100, 0).cast("long")).as("cents"))
      .join(broadcast(maxDate))
      .withColumn("recency",
        datediff(col("max_date"), col("last_order")))
    val cuts = perCust.agg(
      percentile(col("recency").cast("double"), lit(0.25)).as("r25"),
      percentile(col("recency").cast("double"), lit(0.5)).as("r50"),
      percentile(col("recency").cast("double"), lit(0.75)).as("r75"),
      percentile(col("frequency").cast("double"), lit(0.25)).as("f25"),
      percentile(col("frequency").cast("double"), lit(0.5)).as("f50"),
      percentile(col("frequency").cast("double"), lit(0.75)).as("f75"),
      percentile(col("cents").cast("double"), lit(0.25)).as("m25"),
      percentile(col("cents").cast("double"), lit(0.5)).as("m50"),
      percentile(col("cents").cast("double"), lit(0.75)).as("m75"))
    def score(v: Column, c25: Column, c50: Column, c75: Column): Column =
      when(v > c75, 4).when(v > c50, 3).when(v > c25, 2).otherwise(1)
    perCust.join(broadcast(cuts))
      .select(
        // low recency = recently active = best score: invert the bucket
        (lit(5) - score(col("recency").cast("double"),
          col("r25"), col("r50"), col("r75"))).as("r_score"),
        score(col("frequency").cast("double"),
          col("f25"), col("f50"), col("f75")).as("f_score"),
        score(col("cents").cast("double"), col("m25"), col("m50"), col("m75"))
          .as("m_score"),
        col("cents"))
      .groupBy("r_score", "f_score", "m_score")
      .agg(count(lit(1)).as("n_customers"),
        round(sum("cents").cast("double") / 100.0 / count(lit(1)), 4)
          .as("avg_monetary"))
      .orderBy("r_score", "f_score", "m_score")
  }

  /** Two-sample Kolmogorov–Smirnov drift statistic between the returned
    * ('R') and accepted ('A') populations' price distributions — THE
    * distribution-drift alarm a data pipeline runs between snapshots
    * (means/variances agree long after the shape has drifted). Shape:
    * reduce to per-distinct-value counts first (one shuffle, cardinality
    * ≤ |distinct prices|), then the cumulative-difference max runs as a
    * window over ONLY the distinct values — that bounded relation is what
    * makes a global-order window acceptable at 100 TB (same argument as
    * the exact-percentile sort agg; the raw rows never enter a single
    * partition). D and the scaled statistic are quotients of exact
    * integer cumulatives, identical on both engines. */
  def ksDrift(spark: SparkSession, sf: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val v = Tables.load(spark, sf, "lineitem")
      .filter(col("l_returnflag").isin("R", "A"))
      .select(col("l_extendedprice").as("x"),
        when(col("l_returnflag") === "R", 1L).otherwise(0L).as("a"),
        when(col("l_returnflag") === "A", 1L).otherwise(0L).as("b"))
    val g = v.groupBy("x").agg(sum("a").as("na"), sum("b").as("nb"))
    val w = Window.orderBy("x")
    val c = g.select(
      sum("na").over(w).as("cna"), sum("nb").over(w).as("cnb"),
      sum("na").over(Window.partitionBy()).as("ta"),
      sum("nb").over(Window.partitionBy()).as("tb"))
    c.groupBy("ta", "tb")
      .agg(max(abs(col("cna") * lit(1.0) / col("ta") -
        col("cnb") * lit(1.0) / col("tb"))).as("d"))
      .select(
        round(col("d"), 6).as("d_stat"),
        round(col("d") * sqrt(col("ta") * col("tb") * lit(1.0) /
          (col("ta") + col("tb"))), 4).as("ks_scaled"),
        col("ta").as("n_a"), col("tb").as("n_b"))
  }

  /** Sketch-side KS drift — the monitoring twin of [[ksDrift]] and the
    * USE CASE the mergeable KLL blobs exist for: each population is
    * reduced to ONE ~5 KB KLL(200) blob in a single map-combined pass
    * (vs the exact form's distinct-value cumulative window), and the KS
    * statistic is estimated as max over a 1001-point probe grid — the
    * quantiles of BOTH sketches — of |rank_a(v) − rank_b(v)|. At 100 TB
    * the two periods' blobs live in the sketch store ([[graft.ops
    * .EventOps.kllMerge]]'s discipline) and drift is answered WITHOUT
    * rescanning either period; error ≤ the two sketches' rank errors
    * (±1.65% each) + grid resolution, spec'd against the exact twin.
    * Declared no-oracle (randomized compaction, the q_kll_merge
    * contract). */
  def ksDriftSketch(spark: SparkSession, sf: String): DataFrame = {
    import graft.functions.KllFunctions._
    val v = Tables.load(spark, sf, "lineitem")
      .filter(col("l_returnflag").isin("R", "A"))
      .select(col("l_extendedprice").as("x"), col("l_returnflag").as("f"))
    val sk = v.agg(
      kll_sketch_agg(when(col("f") === "R", col("x"))).as("ska"),
      kll_sketch_agg(when(col("f") === "A", col("x"))).as("skb"),
      sum(when(col("f") === "R", 1L).otherwise(0L)).as("n_a"),
      sum(when(col("f") === "A", 1L).otherwise(0L)).as("n_b"))
    val grid = spark.range(0, 1001).select((col("id") / 1000.0).as("q"))
    grid.crossJoin(broadcast(sk)) // sk is ONE row of two blobs
      // probe values hoisted once per row (review r9: the fallback-eval'd
      // expressions get no guaranteed subexpression elimination, so the
      // inline form deserialized each blob twice per probe)
      .select(col("n_a"), col("n_b"), col("ska"), col("skb"),
        kll_quantile(col("ska"), col("q")).as("va"),
        kll_quantile(col("skb"), col("q")).as("vb"))
      .select(col("n_a"), col("n_b"),
        greatest(
          abs(kll_rank(col("ska"), col("va")) - kll_rank(col("skb"), col("va"))),
          abs(kll_rank(col("ska"), col("vb")) - kll_rank(col("skb"), col("vb"))))
          .as("dd"))
      .groupBy("n_a", "n_b")
      // an EMPTY side makes every probe null and d_est null — exactly when
      // a monitor must scream, so the condition is surfaced as a column
      // instead of read back out of a silent null (review r9)
      .agg(round(max(col("dd")), 4).as("d_est"))
      .select(col("d_est"), col("n_a"), col("n_b"),
        (col("n_a") > 0 && col("n_b") > 0 && col("d_est").isNotNull)
          .as("both_present"))
  }

  /** Gini coefficient of customer revenue — the concentration audit
    * ("what share of spend do the top customers own"), the same statistic
    * a corpus pipeline runs over per-source token mass before fixing a
    * training mix. Needs each customer's rank in revenue order; ranking
    * runs over the per-customer ROLLUP (one row per customer, not per
    * order), and ties are broken by custkey so the rank — and therefore
    * the Σ i·xᵢ term — is deterministic on both engines. At 100 TB the
    * rollup is the big shuffle; the ranked relation is |customers| and
    * its global window swaps for the two-phase partition-offset rank of
    * [[idFallback]] if even that outgrows one task. */
  def gini(spark: SparkSession, sf: String): DataFrame =
    giniFrom(Tables.load(spark, sf, "orders")
      .groupBy("o_custkey").agg(sum("o_totalprice").as("rev"))
      .withColumnRenamed("o_custkey", "key"))

  /** Core of [[gini]] over any (key, rev) frame. */
  def giniFrom(rev: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ranked = rev.select(col("rev"),
      row_number().over(Window.orderBy(col("rev"), col("key")))
        .cast("long").as("i"))
    ranked.agg(
        count(lit(1)).as("n"), sum("rev").as("total"),
        sum(col("i") * col("rev")).as("iw"))
      .select(
        col("n"),
        round(col("total"), 4).as("total_rev"),
        round(lit(2.0) * col("iw") / (col("n") * col("total")) -
          (col("n") + lit(1.0)) / col("n"), 6).as("gini"))
  }

  /** Numeric columns profiled by [[corrMatrix]] — every unordered pair
    * gets a Pearson coefficient. */
  val CorrCols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")

  /** Pairwise Pearson correlation matrix over the fact's numeric columns —
    * the first look any feature pipeline takes before fitting anything
    * (collinear features, leakage candidates). All C(4,2)=6 coefficients
    * are ALGEBRAIC (sums of x, y, xy, x², y² compose across partitions),
    * so the whole matrix is ONE map-side-combined pass over the scan with
    * a single-row shuffle — at 100 TB the reduce stage sees one partial
    * row of 6×5 moments per task, never the data. The wide 1-row result
    * is melted to (col_x, col_y, r) rows with `stack` — plan-side
    * reshaping, zero extra passes. */
  def corrMatrix(spark: SparkSession, sf: String): DataFrame = {
    val pairs = for {
      i <- CorrCols.indices; j <- CorrCols.indices if i < j
    } yield (CorrCols(i), CorrCols(j))
    val aggs = count(lit(1)).as("n") +:
      pairs.map { case (a, b) => (round(corr(col(a), col(b)), 4) + lit(0.0)).as(s"${a}__$b") }
    val wide = Tables.load(spark, sf, "lineitem")
      .select(CorrCols.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
    val stackArgs = pairs
      .map { case (a, b) => s"'$a', '$b', ${a}__$b" }.mkString(", ")
    wide.select(
        expr(s"stack(${pairs.size}, $stackArgs) AS (col_x, col_y, r)"),
        col("n"))
      .orderBy("col_x", "col_y")
  }

  /** 3×1.4826 — the standard "3 sigma" cut in MAD units (1.4826 scales a
    * MAD to the sigma of a normal). Written as one literal so the Spark
    * and DuckDB sides compare against bit-identical doubles. */
  val MadCut = 4.4478

  /** Per-group robust outlier census — median, median-absolute-deviation,
    * and how many rows sit beyond [[MadCut]]×MAD from the median. The
    * robust twin of z-score outliers ([[EventOps.zscoreOutliers]]'s μ/σ are
    * themselves dragged by the outliers being hunted; the median/MAD pair
    * isn't, which is why curation pipelines cut on MAD). Three passes by
    * necessity (median → MAD → census) but each is one shuffle, and the
    * two quantile frames are 3-row broadcasts back onto the scan; at
    * 100 TB the exact `percentile` swaps for `approx_percentile` — same
    * shape, one fewer decimal of accuracy. Median/MAD interpolation
    * matches DuckDB `quantile_cont` bit-for-bit (q_percentile pins). */
  def madOutliers(spark: SparkSession, sf: String): DataFrame = {
    // spread the single-row-group bench-scale scan (see winsorize — same
    // scan-parallelism guard): all three percentile/census passes inherit
    // machine-wide parallelism from this one explicit-width exchange
    val li = spreadNarrowScan(spark,
      Tables.load(spark, sf, "lineitem")
        .select(col("l_returnflag"), col("l_extendedprice").as("x")),
      col("x"))
    val med = li.groupBy("l_returnflag")
      .agg(percentile(col("x"), lit(0.5)).as("med"))
    val dev = li.join(broadcast(med), "l_returnflag")
      .withColumn("adev", abs(col("x") - col("med")))
    val mad = dev.groupBy("l_returnflag")
      .agg(percentile(col("adev"), lit(0.5)).as("mad"))
    dev.join(broadcast(mad), "l_returnflag")
      .groupBy("l_returnflag", "med", "mad")
      .agg(
        count(lit(1)).as("n"),
        sum(when(col("adev") > lit(MadCut) * col("mad"), 1L).otherwise(0L))
          .as("n_outliers"))
      .select(col("l_returnflag"), col("n"), round(col("med"), 4).as("med"),
        round(col("mad"), 4).as("mad"), col("n_outliers"))
      .orderBy("l_returnflag")
  }

  /** Per-group simple linear regression — slope/intercept/R²/count of
    * extendedprice on quantity, one per return flag. All four are
    * single-pass ALGEBRAIC aggregates (sums of x, y, x², y², xy compose
    * associatively → map-side combine, no sort, no second pass), which is
    * why per-group OLS is free at 100 TB while an iterative fit is not.
    * Definitions match DuckDB's `regr_*` family exactly (population
    * covariance over population variance). The reference's analytics page
    * eyeballs this relationship as a scatter plot (`app_test.py:104-110`);
    * the regression line is its closed form. */
  def regression(spark: SparkSession, sf: String): DataFrame =
    Tables.load(spark, sf, "lineitem")
      .groupBy("l_returnflag")
      .agg(
        (round(regr_slope(col("l_extendedprice"), col("l_quantity")), 4) + lit(0.0)).as("slope"),
        (round(regr_intercept(col("l_extendedprice"), col("l_quantity")), 4) + lit(0.0)).as("intercept"),
        round(regr_r2(col("l_extendedprice"), col("l_quantity")), 4).as("r2"),
        regr_count(col("l_extendedprice"), col("l_quantity")).as("n"))
      .orderBy("l_returnflag")

  /** Equi-DEPTH histogram (deciles) of order totalprice — the complement of
    * [[histogram]]'s equi-width bins: every bucket holds the same row
    * count, bucket BOUNDARIES carry the information. `ntile` over a total
    * order is the exact form (one global sort — acceptable because the
    * output is 10 rows); at 100 TB the sort is a range-partitioned
    * TakeOrdered-style pass, or the approx_percentile sketch in
    * [[sketchStats]] replaces it outright. Tie-break on o_orderkey makes
    * bucket assignment total and both engines agree bit-for-bit
    * (ntile's remainder-to-early-buckets rule is shared). */
  def histogramEqDepth(spark: SparkSession, sf: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.orderBy(col("o_totalprice"), col("o_orderkey"))
    Tables.load(spark, sf, "orders")
      .select(col("o_orderkey"), col("o_totalprice"))
      .withColumn("decile", ntile(10).over(w).cast("long"))
      .groupBy("decile")
      .agg(
        count(lit(1)).as("n"),
        round(min("o_totalprice"), 4).as("lo"),
        round(max("o_totalprice"), 4).as("hi"))
      .orderBy("decile")
  }
}
