package graft

import org.apache.spark.sql.functions._

/** The session-stop teardown for the in-JVM memo maps (r17 verdict #5 +
  * advisor #2): populating any context-keyed memo arms an
  * onApplicationEnd listener whose body is `MemoHygiene.clearAll(appId)`;
  * these specs drive that body directly through the spec seam (the shared
  * suite context cannot be stopped mid-run) and assert the memos empty,
  * the persisted frames released, and the getters rebuilding cleanly
  * afterwards — the full listener path minus the context stop itself. */
class MemoHygieneSpec extends SparkSpec {

  test("clearAll empties every context-bound memo and the getters rebuild") {
    // populate one memo per owner: a token relation (bm25), an embedding
    // projection + a chain (the ANN lifecycle probes build both), a dedup
    // base relation + the cluster table (dupClusters builds both, r18
    // verdict #1/#5), and the graph edge relation (graphMetrics)
    val bm25Before = graft.ops.TextOps.bm25(spark, sf0001).collect().toSeq
    val probeBefore =
      graft.ops.VectorOps.annLifecycleProbes(spark, sf0001, useCompacted = true)
        .collect().toSeq
    val clustersBefore = graft.ops.TextOps.dupClusters(spark, sf0001).collect().toSeq
    val metricsBefore = graft.ops.GraphOps.graphMetrics(spark, sf0001).collect().toSeq
    assert(graft.ops.TextOps.memoEntryCount > 0)
    assert(graft.ops.VectorOps.memoEntryCount > 0)
    assert(graft.ops.GraphOps.memoEntryCount > 0)
    // populating a memo must have armed the application-end hook
    assert(graft.ops.MemoHygiene.installedFor(spark),
      "memo lookup did not install the session-stop listener")

    graft.ops.MemoHygiene.clearAll(spark.sparkContext.applicationId)
    assert(graft.ops.TextOps.memoEntryCount == 0,
      "TextOps memos survived clearAll")
    assert(graft.ops.VectorOps.memoEntryCount == 0,
      "VectorOps memos survived clearAll")
    assert(graft.ops.GraphOps.memoEntryCount == 0,
      "GraphOps memos survived clearAll")
    // the getters rebuild from scratch — same results, fresh entries
    val bm25After = graft.ops.TextOps.bm25(spark, sf0001).collect().toSeq
    assert(bm25After == bm25Before, "bm25 diverged after memo teardown")
    val probeAfter =
      graft.ops.VectorOps.annLifecycleProbes(spark, sf0001, useCompacted = true)
        .collect().toSeq
    assert(probeAfter == probeBefore, "ANN probes diverged after memo teardown")
    assert(graft.ops.TextOps.dupClusters(spark, sf0001).collect().toSeq
      == clustersBefore, "dup clusters diverged after memo teardown")
    assert(graft.ops.GraphOps.graphMetrics(spark, sf0001).collect().toSeq
      == metricsBefore, "graph metrics diverged after memo teardown")
    assert(graft.ops.TextOps.memoEntryCount > 0)
    assert(graft.ops.VectorOps.memoEntryCount > 0)
    assert(graft.ops.GraphOps.memoEntryCount > 0)
    // the hook stays armed across an explicit mid-life clearAll (only a
    // real application end drops the installed mark — re-installing here
    // would register a second listener for the same context)
    assert(graft.ops.MemoHygiene.installedFor(spark))
  }

  test("the embedding-projection memo holds ONE persisted entry across the ANN family (r17 verdict #1)") {
    val before = graft.ops.VectorOps.memoEntryCount
    // three family members that each used to persist their own projection
    graft.ops.VectorOps.annPq(spark, sf0001).collect()
    graft.ops.VectorOps.ivfTopk(spark, sf0001).collect()
    graft.ops.VectorOps.annDelete(spark, sf0001).collect()
    val after = graft.ops.VectorOps.memoEntryCount
    // at most the one (context, sf, confs) projection entry was added by
    // the three calls together — no per-invocation growth
    assert(after - before <= 1,
      s"ANN family added ${after - before} memo entries across three calls")
  }

  test("the dedup family's prod entry points share ONE memoized shingle relation (r18 verdict #1)") {
    // first call may add the (context, sf, confs) shingle entry...
    graft.ops.TextOps.dedupJaccard(spark, sf0001).collect()
    val before = graft.ops.TextOps.memoEntryCount
    // ...after which every other family member reuses it — each of these
    // used to park its own per-call persist of the same corpus-sized plan
    graft.ops.TextOps.dedupPrefix(spark, sf0001).collect()
    graft.ops.TextOps.dedupMinhash(spark, sf0001).collect()
    graft.ops.TextOps.decontaminate(spark, sf0001).collect()
    graft.ops.TextOps.dedupIncremental(spark, sf0001).collect()
    assert(graft.ops.TextOps.memoEntryCount == before,
      "a dedup prod entry point added a per-invocation memo entry")
  }
}
