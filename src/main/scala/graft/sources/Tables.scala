package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** Typed source layer for the harness tables (SURVEY.md §1.4, FIXTURES.md §A).
  *
  * The reference loads one flat relation from MongoDB with a server-side
  * projection (`app_test.py:36-57`) — the Spark-native equivalent is a columnar
  * parquet scan, where column pruning and predicate pushdown are automatic
  * (Catalyst `ColumnPruning` + parquet filter pushdown). At 100 TB the same
  * call reads a partitioned directory tree (e.g. `events/` partitioned by day,
  * `documents/` by source) and partition pruning applies; a single file per
  * table is just the harness layout.
  */
object Tables {

  /** All harness tables (one parquet file each at sf0.001/0.01/0.1). */
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Columnar scan. Parquet is self-describing; we never rely on runtime
    * inference the way the reference relies on pandas dtype inference
    * (`app_test.py:57`). */
  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** Explicit schema CSV read — the Spark mapping of the reference's
    * `pd.read_csv(uploaded_file)` upload path (`app_test.py:262-263`), with
    * the schema declared instead of inferred. FAILFAST because Spark's
    * default PERMISSIVE mode silently nulls type-mismatched cells, which
    * would then be silently imputed by the scoring pipeline's median/mode
    * stage — a corrupted upload must be rejected, not absorbed. */
  def loadCsv(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.option("header", "true").option("mode", "FAILFAST")
      .schema(schema).csv(path)

  /** Reference-faithful customer schema (FIXTURES.md §B) for unit tests and the
    * scoring pipeline's exact-semantics corners. Column names keep the
    * reference's embedded spaces (`app_test.py:38-52`). */
  val customerSchema: StructType = StructType(Seq(
    StructField("CustomerID", LongType),
    StructField("Age", LongType),
    StructField("Gender", StringType),
    StructField("Tenure", LongType),
    StructField("Usage Frequency", LongType),
    StructField("Support Calls", LongType),
    StructField("Payment Delay", LongType),
    StructField("Subscription Type", StringType),
    StructField("Contract Length", StringType),
    StructField("Total Spend", DoubleType),
    StructField("Last Interaction", LongType),
    StructField("Churn", IntegerType)))
}
