package graft

import org.apache.spark.sql.functions._
import graft.ops.VectorOps

class VectorOpsSpec extends SparkSpec {
  import spark.implicits._

  test("embedCov: hand trace on a 2-vector fixture; symmetric half only") {
    // vectors (1,2) and (3,4): per-dim mean (2,3); var(0)=var(1)=cov(0,1)=1
    val dir = s"${System.getProperty("java.io.tmpdir")}/graft_cov_fixture"
    Seq((0L, Seq(1f, 2f)), (1L, Seq(3f, 4f))).toDF("vec_id", "embedding")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val got = VectorOps.embedCov(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got == Seq((0L, 0L, 1.0), (0L, 1L, 1.0), (1L, 1L, 1.0)), s"got $got")
  }

  test("embedCov: the buffer aggregate equals the declarative explode+groupBy form") {
    // both sides accumulate exact 2^24-grid Long sums, so two DIFFERENT
    // implementations must agree BIT-exactly — no tolerance
    val fast = VectorOps.embedCov(spark, sf0001).collect().toSeq
    val slow = VectorOps.embedCovDeclarative(spark, sf0001).collect().toSeq
    assert(fast == slow)
  }

  test("embedCov/embedCovByLabel: rounded output is bit-identical across perturbed partitionings") {
    // the r11 driver-oracle failure mode: shuffle-arrival merge order moved
    // a double sum across a round-6 half-boundary. With exact quantized Long
    // sums the declared values must be a pure function of the data — drive
    // the merge tree through coprime partition counts and demand equality
    // of the full rounded output, doubles compared by BITS (0.0 vs -0.0 and
    // last-ulp flips both count as failures here)
    def bits(rows: Seq[org.apache.spark.sql.Row]): Seq[Seq[Long]] = rows.map(
      _.toSeq.map {
        case d: Double => java.lang.Double.doubleToRawLongBits(d)
        case l: Long => l
        case other => other.hashCode.toLong
      })
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      val runs = Seq("7", "31", "2").map { p =>
        spark.conf.set("spark.sql.shuffle.partitions", p)
        (bits(VectorOps.embedCov(spark, sf0001).collect().toSeq),
          bits(VectorOps.embedCovByLabel(spark, sf0001).collect().toSeq))
      }
      assert(runs.distinct.size == 1,
        "cov output moved under partitioning perturbation — order-dependent sum leaked back in")
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  test("embedCovByLabel: per-class cells reconcile with per-class declarative covariance") {
    val byLabel = VectorOps.embedCovByLabel(spark, sf0001).collect()
    val labels = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .select(countDistinct(col("label"))).head().getLong(0)
    val d = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .select(size(col("embedding"))).head().getInt(0)
    assert(byLabel.length == labels * d * (d + 1) / 2)
    // each class's diagonal is a variance: nonnegative
    byLabel.filter(r => r.getLong(1) == r.getLong(2))
      .foreach(r => assert(r.getDouble(3) >= 0.0, s"negative variance: $r"))
  }

  test("embedOutliers: a planted far-away vector ranks first with the hand score") {
    // three unit-ish vectors plus one at 10× scale: the planted outlier's
    // variance-normalized distance must dominate, and every distance is
    // nonnegative with exactly k (or corpus-size) rows reported
    val dir = s"${System.getProperty("java.io.tmpdir")}/graft_outlier_fixture"
    Seq((0L, Seq(1f, 0f)), (1L, Seq(0.9f, 0.1f)), (2L, Seq(1.1f, -0.1f)),
      (3L, Seq(10f, 10f))).toDF("vec_id", "embedding")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val got = VectorOps.embedOutliers(spark, dir).collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    assert(got.length == 4)
    assert(got.head._1 == 3L, s"planted outlier not first: ${got.toSeq}")
    assert(got.map(_._2).forall(_ >= 0.0))
    // scores descend
    assert(got.map(_._2).sliding(2).forall(p => p(0) >= p(1)))
  }

  test("embedCov: diagonal is nonnegative and the cell count is d(d+1)/2") {
    val got = VectorOps.embedCov(spark, sf0001).collect()
    val d = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .select(size(col("embedding"))).head().getInt(0)
    assert(got.length == d * (d + 1) / 2)
    got.filter(r => r.getLong(0) == r.getLong(1))
      .foreach(r => assert(r.getDouble(2) >= 0.0, s"negative variance: $r"))
  }

  test("tripletMine: hardest pos shares the label, hardest neg doesn't; window-rank A/B agrees") {
    val out = VectorOps.tripletMine(spark, sf0001).collect()
    assert(out.length == 32)
    val labels = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .select(col("vec_id"), col("label")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    out.foreach { r =>
      val (a, p, n) = (r.getLong(0), r.getLong(1), r.getLong(3))
      assert(labels(p) == labels(a), s"positive $p must share anchor $a's label")
      assert(labels(n) != labels(a), s"negative $n must differ from anchor $a's label")
      // margin is round(pos-neg, 4); the raw difference of two 4-decimal
      // doubles carries binary residue, so compare within half an ulp of 1e-4
      assert(math.abs(r.getDouble(5) - (r.getDouble(2) - r.getDouble(4))) < 5e-5,
        "margin reconciles")
    }
    // structural A/B: re-derive both argmaxes with window row_number
    // instead of conditional max_by — mechanisms must agree exactly
    import org.apache.spark.sql.expressions.Window
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .select(col("vec_id"), col("label"), VectorOps.asDouble(col("embedding")).as("v"))
    val anchors = emb.filter(col("vec_id") < 32)
      .select(col("vec_id").as("anchor_id"), col("label").as("a_label"), col("v").as("av"))
    val w = Window.partitionBy("anchor_id", "same")
      .orderBy(col("cos").desc, col("vec_id"))
    val ranked = emb.join(broadcast(anchors), col("vec_id") =!= col("anchor_id"))
      .select(col("anchor_id"), (col("label") === col("a_label")).as("same"),
        col("vec_id"), round(VectorOps.cosine(col("v"), col("av")), 4).as("cos"))
      .withColumn("rk", row_number().over(w)).filter(col("rk") === 1)
      .collect().map(r => (r.getLong(0), r.getBoolean(1)) -> (r.getLong(2), r.getDouble(3)))
      .toMap
    out.foreach { r =>
      val a = r.getLong(0)
      assert(ranked((a, true)) == ((r.getLong(1), r.getDouble(2))), s"pos argmax for $a")
      assert(ranked((a, false)) == ((r.getLong(3), r.getDouble(4))), s"neg argmax for $a")
    }
  }

  test("dot / l2norm / cosine on known vectors") {
    val df = Seq((Array(1.0f, 2.0f, 2.0f), Array(2.0f, 4.0f, 4.0f)))
      .toDF("a", "b")
      .select(
        VectorOps.dot(VectorOps.asDouble(col("a")), VectorOps.asDouble(col("b"))).as("dot"),
        VectorOps.l2norm(VectorOps.asDouble(col("a"))).as("na"),
        VectorOps.cosine(VectorOps.asDouble(col("a")), VectorOps.asDouble(col("b"))).as("cos"))
    val r = df.head()
    assert(r.getDouble(0) == 18.0)
    assert(r.getDouble(1) == 3.0)
    assert(math.abs(r.getDouble(2) - 1.0) < 1e-12)
  }

  test("orthogonal vectors have cosine 0, opposite have -1") {
    val df = Seq(
      (Array(1.0f, 0.0f), Array(0.0f, 1.0f)),
      (Array(1.0f, 0.0f), Array(-1.0f, 0.0f)))
      .toDF("a", "b")
      .select(VectorOps.cosine(VectorOps.asDouble(col("a")), VectorOps.asDouble(col("b"))).as("c"))
    assert(df.collect().map(_.getDouble(0)).toSeq == Seq(0.0, -1.0))
  }

  test("cosineTopk returns 10 ranked neighbors, self excluded, cos descending") {
    val rows = VectorOps.cosineTopk(spark, sf0001).collect()
    assert(rows.length == 10)
    assert(!rows.map(_.getLong(0)).contains(0L))
    val sims = rows.map(_.getDouble(1))
    assert(sims.zip(sims.tail).forall { case (a, b) => a >= b })
  }

  test("annLsh candidates agree with brute-force where buckets collide") {
    // ANN results must be a subset of the exact ranking's candidate pool
    // (same probe, cos computed identically) with valid per-probe ranks
    val ann = VectorOps.annLsh(spark, sf0001).collect()
    assert(ann.nonEmpty, "probes must at least match themselves' bucket-mates or none")
    ann.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      val ranks = rs.map(_.getLong(1)).sorted
      assert(ranks.zipWithIndex.forall { case (r, i) => r == i + 1 })
    }
  }

  test("ivfTopk is deterministic and ranks candidates per probe") {
    val a = VectorOps.ivfTopk(spark, sf0001).collect()
    val b = VectorOps.ivfTopk(spark, sf0001).collect()
    assert(a.toSeq == b.toSeq) // fixed-seed quantizer => reproducible
    assert(a.nonEmpty)
    a.groupBy(_.getLong(0)).foreach { case (pid, rs) =>
      assert(!rs.map(_.getLong(2)).contains(pid)) // self excluded
      val ranks = rs.map(_.getLong(1)).sorted
      assert(ranks.zipWithIndex.forall { case (r, i) => r == i + 1 })
    }
    // recall sanity (fixture embeddings are near-random, so demand a floor,
    // not perfection): some probes' IVF top-1 appears in the exact top-3
    val exact = VectorOps.knnJoin(spark, sf0001).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(2)).toSet).toMap
    val hits = a.filter(_.getLong(1) == 1L)
      .count(r => exact.getOrElse(r.getLong(0), Set.empty).contains(r.getLong(2)))
    assert(hits >= 2, s"IVF top-1 recall too low: $hits/5 probes")
  }

  test("annPq: deterministic, well-ranked, and the ADC shortlist recalls exact neighbors") {
    val a = VectorOps.annPq(spark, sf0001).collect()
    val b = VectorOps.annPq(spark, sf0001).collect()
    assert(a.toSeq == b.toSeq) // fixed-seed quantizer + codebooks
    assert(a.nonEmpty)
    a.groupBy(_.getLong(0)).foreach { case (pid, rs) =>
      assert(!rs.map(_.getLong(2)).contains(pid)) // self excluded
      assert(rs.map(_.getLong(1)).sorted.zipWithIndex.forall { case (r, i) => r == i + 1 })
      // re-rank really ordered by cosine desc
      val cs = rs.sortBy(_.getLong(1)).map(_.getDouble(3))
      assert(cs.zip(cs.tail).forall { case (x, y) => x >= y })
    }
    // recall floor vs the exact twin (near-random fixture embeddings: the
    // IVF cells + PQ shortlist must still surface some true neighbors)
    val exact = VectorOps.knnJoin(spark, sf0001).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(2)).toSet).toMap
    val hits = a.filter(_.getLong(1) == 1L)
      .count(r => exact.getOrElse(r.getLong(0), Set.empty).contains(r.getLong(2)))
    assert(hits >= 2, s"IVF-PQ top-1 recall too low: $hits/5 probes")
  }

  test("annAppend: frozen-codebook append is reachable, deterministic, and recalls exact neighbors") {
    val a = VectorOps.annAppend(spark, sf0001).collect()
    val b = VectorOps.annAppend(spark, sf0001).collect()
    assert(a.toSeq == b.toSeq) // frozen artifacts: fully deterministic
    assert(a.nonEmpty)
    a.groupBy(_.getLong(0)).foreach { case (pid, rs) =>
      assert(!rs.map(_.getLong(2)).contains(pid))
      assert(rs.map(_.getLong(1)).sorted.zipWithIndex.forall { case (r, i) => r == i + 1 })
      val cs = rs.sortBy(_.getLong(1)).map(_.getDouble(3))
      assert(cs.zip(cs.tail).forall { case (x, y) => x >= y })
    }
    // recall floor vs the exact twin over the SAME (union) corpus — the
    // frozen-artifact index may not be weaker than q_ann_pq's floor
    val exact = VectorOps.knnJoin(spark, sf0001).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(2)).toSet).toMap
    val hits = a.filter(_.getLong(1) == 1L)
      .count(r => exact.getOrElse(r.getLong(0), Set.empty).contains(r.getLong(2)))
    assert(hits >= 2, s"frozen-index top-1 recall too low: $hits/5 probes")
    // APPENDED vectors are reachable: at least one append-partition vector
    // (vec_id % 5 == 4) must appear in some probe's top-3 — with 20 % of
    // the corpus appended, an unreachable append partition would mean the
    // union never actually included the batch
    assert(a.exists(_.getLong(2) % 5 == 4),
      "no appended vector ever retrieved — the append batch is invisible to probes")
  }

  test("pqCodebooks: right geometry, centroids finite, disk round-trip identical") {
    val books = VectorOps.pqCodebooks(spark, sf0001)
    // the first call persisted to target/models; a reload must reproduce
    // the in-memory fit bit-for-bit (full Double.toString precision)
    val path = java.nio.file.Paths.get("target/models/pq-_root_testdata_sf0.001.txt")
    assert(java.nio.file.Files.exists(path), s"codebook artifact missing: $path")
    assert(books.length == VectorOps.PqSubspaces)
    books.foreach { sub =>
      assert(sub.length == VectorOps.PqCodes)
      sub.foreach { c =>
        assert(c.length == VectorOps.PqSubDim)
        assert(c.forall(x => !x.isNaN && !x.isInfinite))
      }
    }
    import scala.jdk.CollectionConverters._
    val reloaded = Array.ofDim[Array[Double]](VectorOps.PqSubspaces, VectorOps.PqCodes)
    java.nio.file.Files.readAllLines(path).asScala.filter(_.nonEmpty).foreach { line =>
      val f = line.trim.split("\\s+")
      reloaded(f(0).toInt)(f(1).toInt) = f.drop(2).map(_.toDouble)
    }
    for (s <- books.indices; c <- books(s).indices)
      assert(books(s)(c).sameElements(reloaded(s)(c)), s"codebook ($s,$c) drifted on disk")
  }

  test("typed CentroidAggregator matches the posexplode centroid query") {
    import graft.functions.CentroidAggregator
    val ds = graft.sources.Tables.load(spark, sf0001, "embeddings")
      .select(col("label"), col("embedding")).as[(Int, Array[Float])]
    val typed = ds.groupByKey(_._1).mapValues(_._2)
      .agg(new CentroidAggregator(64).toColumn.name("c"))
      .collect().toMap
    val longForm = VectorOps.centroids(spark, sf0001).collect()
      .groupBy(_.getInt(0))
      .view.mapValues(_.sortBy(_.getLong(1)).map(_.getDouble(2))).toMap
    assert(typed.keySet == longForm.keySet)
    typed.foreach { case (label, c) =>
      val expect = longForm(label)
      c.zip(expect).foreach { case (a, b) =>
        assert(math.abs(a - b) < 1e-4, s"label $label: $a vs $b") // b is rounded(4)
      }
    }
  }

  test("dedupCosineLsh pairs ⊆ exact pairs with high recall") {
    val exact = VectorOps.dedupCosine(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty, "fixture must contain near-dup pairs for a recall test")
    val lsh = VectorOps.dedupCosineLsh(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.subsetOf(exact), s"LSH emitted non-pairs: ${lsh.diff(exact)}")
    // banding bound: P(collide) = 1-(1-p²)^8 ≈ 0.99 at cos 0.45; demand 0.7
    // to keep the test robust to the small fixture
    val recall = lsh.size.toDouble / exact.size
    assert(recall >= 0.7, s"recall $recall (${lsh.size}/${exact.size})")
  }

  test("arrayHof reconciles with the explode-based computation, no Generate in plan") {
    val hof = VectorOps.arrayHof(spark, sf0001)
    // the whole point of the lambda pipeline: per-vector scalars without a
    // ×64 row explosion
    assert(!hof.queryExecution.executedPlan.toString.contains("Generate"),
      "arrayHof must not explode the array")
    val got = hof.collect().map(r => (r.getInt(0), r.getLong(1),
      r.getDouble(2), r.getDouble(3), r.getLong(4)))
    val want = graft.sources.Tables.load(spark, sf0001, "embeddings")
      .select(col("label"), col("vec_id"),
        posexplode(VectorOps.asDouble(col("embedding"))).as(Seq("pos", "x")))
      .groupBy("label", "vec_id")
      .agg((count(when(col("x") > 0, 1)) / 64.0).as("pos_frac"),
        sum(abs(col("x"))).as("l1"),
        max((abs(col("x")) > 2.0).cast("long")).as("ext"))
      .groupBy("label")
      .agg(count(lit(1)).as("n_vecs"), round(avg("pos_frac"), 4).as("pf"),
        round(avg("l1"), 4).as("l1"), sum("ext").as("ne"))
      .orderBy("label").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getLong(4)))
    assert(got.toSeq == want.toSeq)
  }

  test("lshBucket is deterministic and bucket-stable for identical vectors") {
    val df = Seq(Array.fill(8)(0.5f), Array.fill(8)(0.5f)).toDF("v")
      .select(VectorOps.lshBucket(VectorOps.asDouble(col("v"))).as("b"))
    val bs = df.collect().map(_.getLong(0))
    assert(bs(0) == bs(1))
  }

  test("semDedup: one row per vector, precision 1, measured recall vs exact twin") {
    val rows = VectorOps.semDedup(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    val nVec = graft.sources.Tables.load(spark, sf001, "embeddings").count()
    assert(rows.length == nVec.toInt)
    assert(rows.map(_._1).distinct.length == rows.length)
    // exact twin: global near-dup pairs at the same threshold. The greedy
    // keep-lowest-id rule over the FULL pair set would drop exactly the
    // larger-id members, so:
    val exactPairs = VectorOps.dedupCosine(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val exactDrop = exactPairs.map(_._2).toSet
    val dropped = rows.filter(_._3).map(_._1).toSet
    // precision 1: a within-cell drop is backed by an exact global pair
    assert(dropped.subsetOf(exactDrop),
      s"semDedup dropped non-dups: ${dropped.diff(exactDrop)}")
    // recall: pairs split across cells are missed — demand a measured floor
    assert(exactDrop.nonEmpty)
    val recall = dropped.size.toDouble / exactDrop.size
    assert(recall >= 0.5, s"recall $recall (${dropped.size}/${exactDrop.size})")
    // deterministic: the quantizer is cached + seeded, the rule is id-based
    val again = VectorOps.semDedup(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(rows.toSeq == again.toSeq)
  }
}
