package graft

import org.apache.spark.sql.functions._
import graft.ops.{LayoutOps, Relational, RuntimeFilterOps, TextOps}
import graft.sources.Tables

/** Specs for the round-7 layout / runtime-filter / sampling operators. */
class LayoutFilterSpec extends SparkSpec {

  // --- q_bloom_join -------------------------------------------------------

  test("bloom-pruned join equals the plain join") {
    val dim = Tables.load(spark, sf0001, "customer")
      .filter(col("c_mktsegment") === "BUILDING")
      .select("c_custkey", "c_mktsegment")
    val plain = Tables.load(spark, sf0001, "orders")
      .join(dim, col("o_custkey") === col("c_custkey"))
      .select("o_orderkey").orderBy("o_orderkey").collect()
    val pruned = RuntimeFilterOps.bloomJoin(spark, sf0001)
      .select("o_orderkey").collect()
    assert(pruned.toSeq == plain.toSeq)
  }

  test("bloom filter actually prunes: survivors ≈ semi-join count, < fact count") {
    val fact = Tables.load(spark, sf0001, "orders")
    val dim = Tables.load(spark, sf0001, "customer")
      .filter(col("c_mktsegment") === "BUILDING")
    val total = fact.count()
    val semi = fact.join(dim, col("o_custkey") === col("c_custkey"), "left_semi").count()
    val survivors = RuntimeFilterOps.bloomSemiFilter(
      fact, dim, col("o_custkey"), col("c_custkey")).count()
    // no false negatives ever; false positives bounded well above fpp=3%
    assert(survivors >= semi)
    assert(survivors <= semi + math.max(10L, (total * 0.10).toLong))
    assert(survivors < total)
  }

  test("bloom probe stays inside whole-stage codegen") {
    val fact = Tables.load(spark, sf0001, "orders")
    val dim = Tables.load(spark, sf0001, "customer").limit(50)
    val plan = RuntimeFilterOps.bloomSemiFilter(
      fact, dim, col("o_custkey"), col("c_custkey"))
      .queryExecution.executedPlan.toString
    // `*(n)` is the WholeStageCodegen marker in the plan's string form; the
    // probe must sit inside a codegen'd Filter, not a standalone one
    assert("""\*\(\d+\) Filter might_contain""".r.findFirstIn(plan).isDefined,
      plan.take(300))
  }

  test("bloom semi-filter with an EMPTY dim prunes everything (empty-frame guard)") {
    import spark.implicits._
    val fact = Seq(1L, 2L, 3L).toDF("fk")
    val dim = Seq.empty[Long].toDF("k")
    val survivors = RuntimeFilterOps.bloomSemiFilter(
      fact, dim, col("fk"), col("k"), expectedItems = 16)
    assert(survivors.count() == 0)
  }

  // --- q_regression -------------------------------------------------------

  test("per-group regression matches the closed form from raw sums") {
    val li = Tables.load(spark, sf0001, "lineitem")
      .filter(col("l_returnflag") === "R")
      .select(col("l_quantity").cast("double").as("x"),
        col("l_extendedprice").as("y"))
    val r = li.agg(
      count(lit(1)).cast("double").as("n"), sum("x").as("sx"), sum("y").as("sy"),
      sum(col("x") * col("x")).as("sxx"), sum(col("x") * col("y")).as("sxy")).head()
    val (n, sx, sy, sxx, sxy) =
      (r.getDouble(0), r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))
    val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    val intercept = sy / n - slope * sx / n
    val row = Relational.regression(spark, sf0001)
      .filter(col("l_returnflag") === "R").head()
    assert(math.abs(row.getAs[Double]("slope") - slope) < 1e-3)
    assert(math.abs(row.getAs[Double]("intercept") - intercept) < 1e-3)
    assert(row.getAs[Long]("n") == n.toLong)
  }

  // --- q_histogram_eqdepth ------------------------------------------------

  test("equi-depth deciles partition all rows into near-equal buckets") {
    val rows = Relational.histogramEqDepth(spark, sf0001).collect()
    assert(rows.length == 10)
    val total = Tables.load(spark, sf0001, "orders").count()
    assert(rows.map(_.getAs[Long]("n")).sum == total)
    val sizes = rows.map(_.getAs[Long]("n"))
    assert(sizes.max - sizes.min <= 1)
    // boundaries are monotone: bucket i's hi <= bucket i+1's lo
    val los = rows.map(_.getAs[Double]("lo"))
    val his = rows.map(_.getAs[Double]("hi"))
    (0 until 9).foreach(i => assert(his(i) <= los(i + 1)))
  }

  // --- q_inverted_index ---------------------------------------------------

  test("inverted index: postings head bounded, df counts full list") {
    val rows = TextOps.invertedIndex(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val postings = r.getAs[String]("postings").split(',')
      val df = r.getAs[Long]("df")
      assert(postings.length <= TextOps.PostingHeadK)
      assert(df >= postings.length)
      // head is sorted ascending and duplicate-free
      val ids = postings.map(_.toLong).toSeq
      assert(ids == ids.sorted && ids.distinct == ids)
    }
  }

  // --- q_weighted_sample --------------------------------------------------

  test("weighted sample: k rows per stratum, rank keys agree with a local recompute") {
    import java.security.MessageDigest
    val out = TextOps.weightedSample(spark, sf0001).collect()
    val bySource = out.groupBy(_.getAs[String]("source"))
    bySource.values.foreach(rs =>
      assert(rs.map(_.getAs[Long]("rk")).sorted.toSeq == (1L to TextOps.WeightedSampleK)))
    // recompute the A-ES key locally for every doc and check the selected ids
    val docs = Tables.load(spark, sf0001, "documents")
      .select("source", "doc_id", "n_chars").collect()
    def key(docId: Long, w: Long): Double = {
      val hex = MessageDigest.getInstance("MD5")
        .digest(docId.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(8)
      val u = (java.lang.Long.parseLong(hex, 16).toDouble + 0.5) / 4294967296.0
      math.log(u) / w
    }
    val expected = docs.groupBy(_.getAs[String]("source")).map { case (src, rs) =>
      src -> rs.map(r => (r.getAs[Long]("doc_id"), key(r.getAs[Long]("doc_id"), r.getAs[Long]("n_chars"))))
        .sortBy { case (id, k) => (-k, id) }.take(TextOps.WeightedSampleK).map(_._1).toSeq
    }
    bySource.foreach { case (src, rs) =>
      val got = rs.sortBy(_.getAs[Long]("rk")).map(_.getAs[Long]("doc_id")).toSeq
      assert(got == expected(src), s"stratum $src")
    }
  }

  // --- q_zorder -----------------------------------------------------------

  test("zValue interleaves bits like a local reference implementation") {
    import spark.implicits._
    def ref(x: Long, y: Long): Long =
      (0 until LayoutOps.ZBits).map(i =>
        (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))).reduce(_ | _)
    val pts = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1023L, 1023L), (513L, 2L), (77L, 900L))
    val got = pts.toDF("x", "y")
      .select(LayoutOps.zValue(col("x"), col("y")).as("z"))
      .collect().map(_.getLong(0)).toSeq
    assert(got == pts.map { case (x, y) => ref(x, y) })
  }

  test("z-sorted files carry narrow min/max ranges on BOTH dims; 1-D sort does not") {
    // the physical claim behind q_zorder: range-partition by the z value,
    // write one file per partition, and every file's zone map is narrow in
    // both dimensions — vs a date-sorted layout whose custkey zone maps
    // span the whole domain (so a custkey predicate can skip nothing)
    val mask = (1L << LayoutOps.ZBits) - 1
    val base = Tables.load(spark, sf001, "orders")
      .select(col("o_orderkey"),
        col("o_custkey").bitwiseAND(lit(mask)).as("xk"),
        datediff(col("o_orderdate"), lit("1992-01-01").cast("date"))
          .cast("long").bitwiseAND(lit(mask)).as("yk"))
      .withColumn("z", LayoutOps.zValue(col("xk"), col("yk")))
    val dir = java.nio.file.Files.createTempDirectory("zlayout").toString
    base.repartitionByRange(64, col("z")).write.mode("overwrite")
      .parquet(s"$dir/bz")
    base.repartitionByRange(64, col("yk"), col("o_orderkey")).write.mode("overwrite")
      .parquet(s"$dir/bdate")
    def avgExtent(path: String): Double =
      spark.read.parquet(path)
        .groupBy(input_file_name())
        .agg((max("xk") - min("xk")).as("ext"))
        .agg(avg("ext")).head().getDouble(0)
    // NOTE: range-partition split points don't align to z-prefix cells, so
    // a file can straddle adjacent 128-wide cells (the aligned-bucket ≤127
    // bound lives in the zorderAudit test below); the layout claim is the
    // RELATIVE one — z-sorted zone maps are several times narrower on the
    // dimension the 1-D sort ignores
    val zExt = avgExtent(s"$dir/bz")
    val dateExt = avgExtent(s"$dir/bdate")
    assert(zExt < dateExt / 2, s"z $zExt vs date $dateExt")
  }

  test("z-order buckets are locality rectangles: extent ≤ 127 per dimension") {
    val rows = LayoutOps.zorderAudit(spark, sf001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("hi_cust") - r.getAs[Long]("lo_cust") <= LayoutOps.ZBucketMaxExtent)
      assert(r.getAs[Long]("hi_day") - r.getAs[Long]("lo_day") <= LayoutOps.ZBucketMaxExtent)
    }
  }
}
