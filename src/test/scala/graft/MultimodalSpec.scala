package graft

import org.apache.spark.sql.functions._
import graft.multimodal.MultimodalOps

class MultimodalSpec extends SparkSpec {

  test("mediaTable carries an opaque binary payload with a kind per id") {
    val df = MultimodalOps.mediaTable(spark, sf0001)
    assert(df.schema("content").dataType.typeName == "binary")
    val kinds = df.select("kind").distinct().collect().map(_.getString(0)).toSet
    assert(kinds == Set("image", "audio", "video"))
  }

  test("decodeMeta is deterministic and n_bytes matches the payload") {
    val a = MultimodalOps.decodeMeta(spark, sf0001).collect().sortBy(_.media_id)
    val b = MultimodalOps.decodeMeta(spark, sf0001).collect().sortBy(_.media_id)
    assert(a.toSeq == b.toSeq) // stub decode must be reproducible
    assert(a.forall(m => m.n_bytes > 0 && m.width >= 16 && m.height >= 16))
    assert(a.filter(_.kind == "image").forall(_.n_frames == 1))
    assert(a.exists(m => m.kind != "image" && m.n_frames > 1))
  }

  test("extractFeatures yields L1-normalized 64-dim vectors") {
    val feats = MultimodalOps.extractFeatures(spark, sf0001).collect()
    assert(feats.nonEmpty)
    feats.foreach { f =>
      assert(f.features.length == 64)
      assert(math.abs(f.features.map(_.toDouble).sum - 1.0) < 1e-3)
    }
  }

  test("sampleFrames emits every stride-th fixed-size block of videos only") {
    val frames = MultimodalOps.sampleFrames(spark, sf0001, frameBytes = 100, stride = 2)
    val rows = frames.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) % 2 == 0) // stride respected
      assert(r.getAs[Array[Byte]](2).length <= 100)
    }
    // frame extraction is map-only: no shuffle exchange in the plan
    val plan = frames.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("byteHistogram is the integer core of extractFeatures") {
    val hist = MultimodalOps.byteHistogram(spark, sf0001)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val feats = MultimodalOps.extractFeatures(spark, sf0001).collect()
    assert(feats.nonEmpty)
    feats.foreach { f =>
      val h = hist(f.media_id)
      val n = math.max(1L, h.sum).toFloat
      (0 until 64).foreach(j => assert(f.features(j) == h(j) / n))
    }
  }

  test("mediaDedup pairs near-identical payloads, above threshold, deterministically") {
    val rows = MultimodalOps.mediaDedup(spark, sf0001).collect()
    assert(rows.nonEmpty) // the fixture plants near-dup documents
    rows.foreach { r =>
      assert(r.getLong(0) < r.getLong(1))
      assert(r.getDouble(2) >= MultimodalOps.MediaDupCos)
    }
    val again = MultimodalOps.mediaDedup(spark, sf0001).collect()
    assert(rows.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }

  test("q_media_dedup_lsh is a subset of the exact form with high recall") {
    // the declared 100 TB composition: stub features -> sign-LSH banding ->
    // candidate equi-join -> exact verify. Precision 1 by construction
    // (same threshold on the recomputed cosine), recall probabilistic
    val exact = MultimodalOps.mediaDedup(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(exact.nonEmpty)
    val lsh = MultimodalOps.mediaDedupLsh(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(lsh.toSet.subsetOf(exact.toSet),
      s"LSH output must be a subset of exact: extra = ${lsh.toSet -- exact.toSet}")
    val recall = exact.count(lsh.toSet).toDouble / exact.size
    assert(recall >= 0.9, s"LSH recall $recall over ${exact.size} exact pairs")
  }

  test("media features compose with VectorOps cosine") {
    import graft.ops.VectorOps
    val two = MultimodalOps.extractFeatures(spark, sf0001).limit(2).toDF()
    val a = two.orderBy("media_id").limit(1).select(col("features").as("a"))
    val cos = a.crossJoin(a.select(col("a").as("b")))
      .select(VectorOps.cosine(VectorOps.asDouble(col("a")), VectorOps.asDouble(col("b"))))
      .head().getDouble(0)
    assert(math.abs(cos - 1.0) < 1e-9) // self-similarity
  }
}
