package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    // flags never fill positional slots: `Verify <sf> --sql-only` must not
    // silently use "--sql-only" as the output directory
    val positional = args.filterNot(_.startsWith("--"))
    require(positional.length >= 2, s"usage: Verify <sfDir> <outDir> [--sql-only] [--only=a,b]; got ${args.mkString(" ")}")
    val Array(sfDir, outDir) = positional.take(2)
    // --sql-only: refresh oracle_sql.json without re-running the queries
    // (iterating on an oracle against already-dumped parquet results)
    val sqlOnly = args.contains("--sql-only")
    // --only=a,b: re-dump a subset (iterating on one query's Spark side).
    // A typo'd name must fail loudly — a silent no-op run would leave stale
    // dumps that the driver then compares against a fresh oracle_sql.json.
    val only = args.collectFirst { case a if a.startsWith("--only=") =>
      a.stripPrefix("--only=").split(',').toSet }
    only.foreach { names =>
      val unknown = names -- SparkEntry.queries.keySet
      require(unknown.isEmpty, s"--only names not in SparkEntry.queries: ${unknown.mkString(",")}")
    }
    new java.io.File(outDir).mkdirs()
    val toRun =
      if (sqlOnly) Map.empty[String, (SparkSession, String) => org.apache.spark.sql.DataFrame]
      else SparkEntry.queries.view.filterKeys(k => only.forall(_.contains(k))).toMap
    if (toRun.nonEmpty) {
      // --sql-only writes a static JSON — don't pay SparkSession startup
      val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
      val spark = SparkSession.builder()
        .withExtensions(new graft.functions.GraftExtensions)
        .master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      spark.sparkContext.setLogLevel("WARN")
      toRun.foreach { case (name, fn) =>
        try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        catch { case e: Throwable =>
          System.err.println(s"[verify] $name failed: ${e.getMessage}")
        }
        // some queries persist() small frames; don't accumulate the whole
        // registry's cache in one session
        spark.catalog.clearCache()
      }
      spark.stop()
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
  }
}
