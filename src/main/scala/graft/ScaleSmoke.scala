package graft

import org.apache.spark.sql.SparkSession

/** Scale-smoke harness (PLANS.md growth-exponent tables): times the dedup/ANN
  * family on the synthetic embeddings fixtures (tools_scale_fixture.py) at
  * two sizes so exponents are measured on one distribution. Each (dir, op) is
  * run twice in the same JVM; read the WARM (second) number — the first pays
  * one-time codegen JIT and, for IVF, the quantizer fit.
  *
  * Usage: runMain graft.ScaleSmoke [dir1 dir2 ...]
  * (defaults: target/scale1x target/scale10x)
  */
object ScaleSmoke {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq else Seq("target/scale1x", "target/scale10x")
    val spark = SparkSession.builder().master("local[32]")
      .withExtensions(new graft.functions.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // cheap ops first: the fixture-shaped 0.45/8x2 form is candidate-
    // quadratic on background pairs and may dominate the run at 10x — its
    // cost is itself a measurement, so it goes last
    val ops: Seq[(String, (SparkSession, String) => org.apache.spark.sql.DataFrame)] = Seq(
      "ann_ivf" -> ((s: SparkSession, d: String) => graft.ops.VectorOps.ivfTopk(s, d)),
      // fixed-k arm: the eventually-quadratic regime, kept as the contrast
      "semdedup(k=16)" -> ((s: SparkSession, d: String) =>
        graft.ops.VectorOps.semDedup(s, d, k = 16)),
      // the paper's k ~ sqrt(n) regime: per-cell pair volume (n/k)^2 * k =
      // n^1.5 total — since round 8 this IS the declared default
      "semdedup(k=sqrt_n)" -> ((s: SparkSession, d: String) =>
        graft.ops.VectorOps.semDedup(s, d)),
      "dedup_cosine_lsh_prod(0.95,8x8)" -> (graft.ops.VectorOps.dedupCosineLshProd _),
      "dedup_cosine_lsh(0.45,8x2)" -> (graft.ops.VectorOps.dedupCosineLsh _))
    for (dir <- dirs; (name, fn) <- ops; rep <- 1 to 2) {
      val t0 = System.nanoTime()
      val n = fn(spark, dir).count()
      val dt = (System.nanoTime() - t0) / 1e9
      System.err.println(f"[smoke] $dir%-18s $name%-32s rep$rep ${dt}%8.2f s  ($n rows)")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
