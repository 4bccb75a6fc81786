package graft

import org.apache.spark.sql.functions._

import graft.ops.{CurationOps, SourceOps}
import graft.sources.AuditRegistry

/** The DSv2 WRITE rung: commit-protocol facts. Value parity of the
  * published digest rides the DuckDB oracle (q_audit_sink); here we pin
  * that the committed stats equal an independent in-engine aggregate, that
  * they are invariant under repartitioning (task count changes, result
  * does not), and that a failed task publishes NOTHING (abort path).
  */
class AuditSinkSpec extends SparkSpec {
  import spark.implicits._

  private def digests = spark.read.parquet(s"$sf0001/orders.parquet")
    .select(CurationOps.orderDigest.as("digest"))

  test("committed stats equal the independent in-engine aggregate") {
    val r = SourceOps.auditSink(spark, sf0001).head()
    val direct = digests
      .agg(count(lit(1)).as("n"), expr("bit_xor(digest)").as("x")).head()
    assert(r.getLong(0) == direct.getLong(0))
    assert(r.getLong(1) == direct.getLong(1))
  }

  test("stats are task-count invariant: 1 vs 13 write partitions agree") {
    digests.coalesce(1).write.format("graft-audit").option("runId", "inv1").mode("append").save()
    digests.repartition(13).write.format("graft-audit").option("runId", "inv13").mode("append").save()
    val (a, b) = (AuditRegistry.get("inv1").get, AuditRegistry.get("inv13").get)
    assert(a.tasks == 1 && b.tasks == 13)
    assert((a.rows, a.xorDigest) == (b.rows, b.xorDigest))
  }

  test("abort path: a poisoned row fails the job and publishes nothing") {
    val poisoned = Seq(Some(7L), None).toDF("digest")
    intercept[Exception] {
      poisoned.write.format("graft-audit").option("runId", "poison").mode("append").save()
    }
    assert(AuditRegistry.get("poison").isEmpty, "no partial publish")
    assert(AuditRegistry.aborted("poison"), "abort recorded")
  }

  test("schema contract: a frame without a BIGINT digest column is rejected") {
    intercept[Exception] {
      Seq("x").toDF("not_digest").write.format("graft-audit")
        .option("runId", "bad").mode("append").save()
    }
    assert(AuditRegistry.get("bad").isEmpty)
  }
}
