package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.apache.spark.sql.functions._
import graft.ops.TextOps

/** Property tests (SURVEY.md §5.2) for the semantics corners that must hold
  * for ALL inputs, not just fixtures. Raw ScalaCheck generators with a fixed
  * seed (the scalatest-scalacheck bridge isn't in the offline dep cache). */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  /** Deterministic forAll: 30 samples from a seeded generator. */
  private def forAll[A](gen: Gen[A])(body: A => Unit): Unit =
    (0 until 30).foreach { i =>
      gen.apply(Gen.Parameters.default, Seed(42L + i)).foreach(body)
    }

  private def whenever(cond: Boolean)(body: => Unit): Unit = if (cond) body

  private def bucket(p: Double): String =
    if (p < 0.3) "Low" else if (p < 0.7) "Medium" else "High"

  test("risk bucketing: strict-< rule partitions [0,1] exactly (app_test.py:238)") {
    forAll(Gen.choose(0.0, 1.0)) { p =>
      val spark_bucket = Seq(p).toDF("p")
        .select(when(col("p") < 0.3, "Low").when(col("p") < 0.7, "Medium")
          .otherwise("High")).head().getString(0)
      assert(spark_bucket == bucket(p))
    }
  }

  test("one-hot: exactly one indicator fires per known category, zero per unknown") {
    import graft.ops.Scoring
    import graft.ops.Scoring.ModelConstants._
    val knowns = categories.values.flatten.toSeq
    forAll(Gen.oneOf(knowns ++ Seq("Nope", "", "premium" /* case matters */))) { v =>
      val df = Seq((v, v, v)).toDF("gender", "subscription_type", "contract_length")
      val row = Scoring.onehot(df)
        .select(onehotCols.map { case (o, _, _) => col(o) }: _*).head()
      val fired = row.toSeq.map(_.asInstanceOf[Double]).sum
      val expected = catCols.count(c => categories(c).contains(v)).toDouble
      assert(fired == expected)
    }
  }

  private val tokenGen = Gen.listOfN(12, Gen.oneOf("spark", "data", "fast", "a", "b", "c"))

  test("simhash is invariant under multiset doubling (votes scale, signs don't)") {
    forAll(tokenGen) { toks =>
      val df = Seq((toks, toks ++ toks)).toDF("a", "b")
        .select(TextOps.simhash(array(toks.map(lit): _*)).as("ha"),
          TextOps.simhash(array((toks ++ toks).map(lit): _*)).as("hb"))
      val r = df.head()
      assert(r.getLong(0) == r.getLong(1))
    }
  }

  test("shingle Jaccard of a doc with itself is 1; with disjoint vocab is 0") {
    forAll(Gen.listOfN(6, Gen.identifier)) { ws =>
      whenever(ws.toSet.size >= 4) {
        val text = ws.mkString(" ").toLowerCase
        val other = ws.map(w => s"zz${w}q").mkString(" ").toLowerCase
        val df = Seq((1L, text), (2L, text), (3L, other)).toDF("doc_id", "text")
          .select(col("doc_id"), TextOps.shingles3(TextOps.tokens(col("text"))).as("sh"))
        val shs = df.collect().map(r => r.getLong(0) -> r.getSeq[String](1).toSet).toMap
        assert(shs(1L) == shs(2L))
        assert(shs(1L).intersect(shs(3L)).isEmpty)
      }
    }
  }

  test("TopKPerKey equals window row_number on random data for random k") {
    import org.apache.spark.sql.expressions.{Window => W}
    val rowGen = Gen.listOfN(120, for {
      key <- Gen.choose(0, 5)
      value <- Gen.choose(-100.0, 100.0)
      id <- Gen.choose(0L, 1000000L)
    } yield (key, value, id))
    forAll(Gen.zip(rowGen, Gen.choose(1, 5))) { case (rows, k) =>
      // unique tiebreak ids so both forms are deterministic
      val distinct = rows.groupBy(_._3).map(_._2.head).toSeq
      whenever(distinct.nonEmpty) {
        val df = distinct.toDF("key", "value", "id")
        val win = df.withColumn("rk",
            row_number().over(W.partitionBy("key")
              .orderBy(col("value").desc, col("id"))).cast("long"))
          .filter(col("rk") <= k)
          .orderBy("key", "rk")
          .collect().toSeq
        val custom = org.apache.spark.sql.graft.TopKPerKey
          .topKPerKey(df, k, Seq("key"), Seq("value" -> false, "id" -> true))
          .select("key", "value", "id", "rk")
          .orderBy("key", "rk")
          .collect().toSeq
        assert(custom == win, s"k=$k")
      }
    }
  }

  test("minhash banding recall meets the 1-(1-s^8)^16 bound on planted near-dups") {
    // plant pairs of known decreasing overlap: doc 2i is 40 random-ish
    // tokens, doc 2i+1 replaces m of them — shingle Jaccard falls with m.
    // The banding detection probability at similarity s is 1-(1-s^8)^16;
    // summed over the ACTUAL pair similarities it predicts the expected
    // recall, so asserting against it (with slack for the fixed hash seed)
    // turns the no-oracle LSH twin into a quantitative guarantee.
    val rnd = new scala.util.Random(7L)
    val vocab = (0 until 500).map(i => s"w$i")
    val docs = (0 until 24).flatMap { i =>
      val base = Array.fill(40)(vocab(rnd.nextInt(vocab.size)))
      val m = i % 6 // 0..5 replacements
      val dup = base.clone()
      (0 until m).foreach(_ => dup(rnd.nextInt(dup.length)) = s"x${rnd.nextInt(1000)}")
      Seq((2L * i, base.mkString(" ")), (2L * i + 1, dup.mkString(" ")))
    }
    val ex = TextOps.shingleRowsOf(docs.toDF("doc_id", "text")).persist()
    val exact = TextOps.dedupJaccardFrom(ex).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val lsh = TextOps.dedupMinhashFrom(ex).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    ex.unpersist()
    assert(exact.size >= 8, s"planting failed: only ${exact.size} pairs >= 0.8")
    assert(lsh.subsetOf(exact.keySet), s"spurious pairs: ${lsh.diff(exact.keySet)}")
    val expected = exact.values.map(s => 1.0 - math.pow(1.0 - math.pow(s, 8), 16)).sum
    val observed = lsh.size.toDouble
    assert(observed >= 0.8 * expected,
      s"recall $observed below banding-bound expectation $expected over ${exact.size} pairs")
  }

  test("prefix filtering is exact: dedupPrefix == brute-force jaccard on adversarial plants") {
    // stresses every prune that could over-fire: varying doc lengths (the
    // length filter), a boilerplate phrase in every doc (hot shingles the
    // df-cap family must drop but prefix filtering must handle exactly),
    // and overlap levels straddling the 0.8 threshold (the positional
    // filter's α bound). Exactness means the FULL (pair -> jaccard) map
    // matches the uncapped brute-force inverted-index form.
    val rnd = new scala.util.Random(23L)
    val docs = (0 until 18).flatMap { i =>
      val len = 15 + 5 * (i % 5) // 15..35 tokens
      val base = Array.fill(len)(s"u${i}_${rnd.nextInt(100000)}")
      val m = i % 4 // 0..3 replacements: jaccard from 1.0 down past 0.8
      val dup = base.clone()
      (0 until m).foreach(_ => dup(rnd.nextInt(dup.length)) = s"x${rnd.nextInt(100000)}")
      val boiler = "all rights reserved terms of service apply"
      Seq((2L * i, boiler + " " + base.mkString(" ")),
        (2L * i + 1, dup.mkString(" ") + " " + boiler))
    }
    val ex = TextOps.shingleRowsOf(docs.toDF("doc_id", "text")).persist()
    val brute = TextOps.dedupJaccardFrom(ex, dfCap = Int.MaxValue).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val pfx = TextOps.dedupPrefixFrom(ex).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    ex.unpersist()
    assert(brute.size >= 8, s"planting failed: only ${brute.size} pairs >= 0.8")
    assert(pfx == brute)
  }

  test("prefix filtering keeps threshold-boundary pairs: exact J=0.8 subset and round-up J<0.8") {
    // The two ADVICE-r9 exactness traps, planted as raw shingle sets:
    //  (0,1): 28-shingle doc contained in a 35-shingle doc — J = 28/35 = 0.8
    //    EXACTLY and |a|+|b| = 63 with 9 | 4·63, the case where the double
    //    form ceil(0.8/1.8·s) over-computed the positional bound α by 1 and
    //    pruned the pair (0.8/1.8 in binary64 rounds UP from 4/9).
    //  (10,11): 3203-shingle doc contained in a 4004-shingle one — true
    //    J = 3203/4004 ≈ 0.799950 ∈ [0.79995, 0.8): kept by the rounded
    //    (4-dp HALF_UP) verification filter but dropped by any prune derived
    //    from t = 0.8 itself (0.8·4004 = 3203.2 > 3203 fails the unslacked
    //    length filter). Both must survive every prune and match the
    //    brute-force inverted-index form exactly.
    val rows =
      (1 to 28).map(s => (0L, s.toLong)) ++
        (1 to 35).map(s => (1L, s.toLong)) ++
        (1 to 3203).map(s => (10L, 100000L + s)) ++
        (1 to 4004).map(s => (11L, 100000L + s))
    val ex = rows.toDF("doc_id", "s").persist()
    val brute = TextOps.dedupJaccardFrom(ex, dfCap = Int.MaxValue).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val pfx = TextOps.dedupPrefixFrom(ex).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    ex.unpersist()
    assert(brute.keySet == Set((0L, 1L), (10L, 11L)), s"planting failed: $brute")
    assert(brute((0L, 1L)) == 0.8)
    assert(brute((10L, 11L)) == 0.8) // 0.799950... rounds up to the threshold
    assert(pfx == brute)
  }

  test("planted near-dups still pair under a BINDING hot-shingle df-cap") {
    // 6 near-dup pairs of mostly-unique tokens, plus one boilerplate phrase
    // planted in EVERY doc — its shingles have df = 12, far above cap = 3.
    // Capped candidate generation must still propose every true pair (they
    // share plenty of rare shingles) and verification runs on the FULL sets,
    // so the reported jaccard must equal the uncapped form's exactly.
    val rnd = new scala.util.Random(11L)
    val docs = (0 until 6).flatMap { i =>
      val base = Array.fill(30)(s"u${i}_${rnd.nextInt(100000)}")
      val dup = base.clone(); dup(rnd.nextInt(dup.length)) = s"x${rnd.nextInt(100000)}"
      val boiler = "subscribe to our newsletter for updates today"
      Seq((2L * i, boiler + " " + base.mkString(" ")),
        (2L * i + 1, boiler + " " + dup.mkString(" ")))
    }
    val ex = TextOps.shingleRowsOf(docs.toDF("doc_id", "text")).persist()
    val uncapped = TextOps.dedupJaccardFrom(ex, dfCap = Int.MaxValue).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val capped = TextOps.dedupJaccardFrom(ex, dfCap = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    ex.unpersist()
    assert(uncapped.size >= 6, s"planting failed: ${uncapped.size} pairs")
    assert(capped == uncapped)
  }

  test("cdcApply equals a sequential replay of the change stream") {
    import graft.sources.Tables
    val base = Tables.load(spark, sf0001, "customer")
      .select(col("c_custkey"), col("c_acctbal")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val changes = Tables.load(spark, sf0001, "orders")
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sortBy(_._2) // replay in sequence order
    val state = scala.collection.mutable.Map.empty[Long, Option[Double]]
    changes.foreach { case (k, seq, price) =>
      state(k) = if (seq % 17 == 0) None else Some(price)
    }
    val expected = base.flatMap { case (k, bal) =>
      state.get(k) match {
        case Some(None) => None // deleted
        case Some(Some(nb)) => Some(k -> BigDecimal(nb).setScale(2, BigDecimal.RoundingMode.HALF_UP))
        case None => Some(k -> BigDecimal(bal).setScale(2, BigDecimal.RoundingMode.HALF_UP))
      }
    }
    val got = graft.ops.Relational.cdcApply(spark, sf0001).collect()
      .map(r => r.getLong(0) -> BigDecimal(r.getDouble(1)).setScale(2, BigDecimal.RoundingMode.HALF_UP)).toMap
    assert(got == expected.toMap)
  }

  test("quantize reconstruction error is bounded by half a quantization step") {
    import graft.sources.Tables
    val maxAbsPerDim = Tables.load(spark, sf0001, "embeddings")
      .select(posexplode(graft.ops.VectorOps.asDouble(col("embedding"))).as(Seq("pos", "x")))
      .groupBy("pos").agg(max(abs(col("x"))).as("m"))
      .collect().map(_.getDouble(1))
    val bound = maxAbsPerDim.max / 254.0 + 1e-4 // half step + round(,4) slack
    val rows = graft.ops.VectorOps.quantizeErr(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getDouble(1) <= bound, s"vec ${r.getLong(0)}: ${r.getDouble(1)} > $bound")
      assert(r.getDouble(2) <= r.getDouble(1) + 1e-4) // rmse <= max abs err
    }
  }

  test("scaling is invertible: unscale(scale(x)) == x within fp tolerance") {
    import graft.ops.Scoring.ModelConstants._
    forAll(Gen.choose(-1e4, 1e4)) { x =>
      val (m, s) = (means.head, scales.head)
      val z = (x - m) / s
      assert(math.abs(z * s + m - x) < 1e-9)
    }
  }

  private val partsGen = Gen.listOfN(25, Gen.zip(Gen.choose(1L, 8L), Gen.choose(1, 50)))

  test("skyline equals brute-force dominance for generated (size, price) sets") {
    // 5 seeded samples (each runs a full Spark job; 30 would drag the suite)
    (0 until 5).foreach { i =>
      partsGen.apply(Gen.Parameters.default, Seed(7L + i)).foreach { sample =>
        val rows = sample.zipWithIndex.map { case ((size, price), k) =>
          (k.toLong, size, price.toDouble)
        }
        val df = rows.toDF("p_partkey", "p_size", "price")
        val got = graft.ops.CurationOps.skylineFrom(df)
          .collect().map(_.getLong(0)).toSet
        def dom(a: (Long, Long, Double), b: (Long, Long, Double)) =
          a._2 <= b._2 && a._3 >= b._3 && (a._2 < b._2 || a._3 > b._3)
        val brute = rows.filter(p => !rows.exists(q => dom(q, p))).map(_._1).toSet
        assert(got == brute, s"sample $i: got $got brute $brute")
      }
    }
  }

  test("fuzzyResolve recovers every single-character deletion at distance <= 1") {
    val wordGen = Gen.listOfN(8, Gen.listOfN(6, Gen.alphaLowerChar).map(_.mkString))
    (0 until 5).foreach { i =>
      wordGen.apply(Gen.Parameters.default, Seed(11L + i)).foreach { ws =>
        val words = ws.distinct
        val clean = words.toDF("n_name")
        // delete position (k % len) from word k — every dirty string is a
        // true single-deletion corruption of some clean word
        val dirty = words.zipWithIndex.map { case (w, k) =>
          val pos = k % w.length
          (k.toLong, w.substring(0, pos) + w.substring(pos + 1))
        }.toDF("dirty_key", "dirty_name")
        val got = graft.ops.CurationOps.fuzzyResolve(clean, dirty).collect()
          .map(r => (r.getLong(0), r.getLong(3)))
        assert(got.length == words.length, s"sample $i: unresolved corruptions")
        got.foreach { case (k, d) => assert(d <= 1L, s"sample $i key $k dist $d") }
      }
    }
  }

  test("mv delta-merge equals direct recompute for generated snapshots and feeds") {
    import graft.ops.Relational
    val snapGen = for {
      n <- Gen.choose(5, 40)
      keys <- Gen.pick(n, 1L to 200L)
      bals <- Gen.listOfN(n, Gen.choose(1, 99999).map(_ / 100.0))
      // independent random mutation mask: each key may be dropped, moved, or kept
      ops <- Gen.listOfN(n, Gen.oneOf("keep", "drop", "move"))
      ins <- Gen.choose(0, 10)
    } yield (keys.toSeq.zip(bals), ops, ins)
    var i = 0
    forAll(snapGen) { case (oldRows, ops, ins) =>
      i += 1
      val old = oldRows.toDF("key", "bal")
      val neuRows = oldRows.zip(ops).collect {
        case ((k, b), "keep") => (k, b)
        case ((k, b), "move") => (k, math.rint(b * 150) / 100.0)
      } ++ (1 to ins).map(j => (1000L + j, j / 100.0))
      val neu = neuRows.toDF("key", "bal")
      val incremental = Relational.mvRefreshFrom(old, Relational.changeFeed(old, neu))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      val direct = neu.groupBy((col("key") % 20).as("bucket"))
        .agg(count(lit(1)).as("n"), round(sum("bal"), 2).as("sum_bal"))
        .orderBy("bucket")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      assert(incremental.toSeq == direct.toSeq, s"sample $i")
    }
  }

  test("zValue matches a local interleave and preserves prefix locality for random points") {
    import graft.ops.LayoutOps
    def ref(x: Long, y: Long): Long =
      (0 until LayoutOps.ZBits).map(i =>
        (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))).reduce(_ | _)
    val ptsGen = Gen.listOfN(20, Gen.zip(Gen.choose(0L, 1023L), Gen.choose(0L, 1023L)))
    forAll(ptsGen) { pts =>
      val got = pts.toDF("x", "y")
        .select(col("x"), col("y"), LayoutOps.zValue(col("x"), col("y")).as("z"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      got.foreach { case (x, y, z) =>
        assert(z == ref(x, y))
        // same 14-bit-prefix bucket ⇒ coordinates within a 128-cell box
        // (checked pairwise inside the sample)
      }
      got.groupBy(_._3 >> LayoutOps.ZBucketShift).values.foreach { cell =>
        val xs = cell.map(_._1); val ys = cell.map(_._2)
        assert(xs.max - xs.min <= LayoutOps.ZBucketMaxExtent &&
          ys.max - ys.min <= LayoutOps.ZBucketMaxExtent)
      }
    }
  }

  test("A-ES weighted sample selects the same rows as a local recompute on random weights") {
    import java.security.MessageDigest
    import graft.ops.TextOps
    def key(docId: Long, w: Long): Double = {
      val hex = MessageDigest.getInstance("MD5")
        .digest(docId.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(8)
      (math.log((java.lang.Long.parseLong(hex, 16).toDouble + 0.5) / 4294967296.0)) / w
    }
    val rowsGen = for {
      n <- Gen.choose(4, 50)
      ids <- Gen.pick(n, 1L to 5000L)
      ws <- Gen.listOfN(n, Gen.choose(1L, 10000L))
    } yield ids.toSeq.zip(ws)
    forAll(rowsGen) { rows =>
      val df = rows.map { case (id, w) => ("s", id, w) }.toDF("source", "doc_id", "n_chars")
      val got = TextOps.weightedSampleFrom(df, 3)
        .collect().map(_.getAs[Long]("doc_id")).toSeq
      val want = rows.map { case (id, w) => (id, key(id, w)) }
        .sortBy { case (id, k) => (-k, id) }.take(3).map(_._1)
      assert(got == want)
    }
  }

  test("bloom semi-filter never drops a matching key (no false negatives)") {
    import graft.ops.RuntimeFilterOps
    val genSets = for {
      dimKeys <- Gen.listOfN(30, Gen.choose(1L, 500L))
      factKeys <- Gen.listOfN(120, Gen.choose(1L, 1000L))
    } yield (dimKeys.distinct, factKeys)
    forAll(genSets) { case (dimKeys, factKeys) =>
      val dim = dimKeys.toDF("k")
      val fact = factKeys.toDF("fk")
      val survivors = RuntimeFilterOps.bloomSemiFilter(
        fact, dim, col("fk"), col("k"), expectedItems = 1L << 12)
        .collect().map(_.getLong(0)).toSet
      val matching = factKeys.filter(dimKeys.toSet).toSet
      assert(matching.subsetOf(survivors))
      // and on STRING keys: build and probe must hash identically for
      // non-integral types too (both sides go through xxhash64)
      val sdim = dimKeys.map(k => s"key_$k").toDF("k")
      val sfact = factKeys.map(k => s"key_$k").toDF("fk")
      val ssurvivors = RuntimeFilterOps.bloomSemiFilter(
        sfact, sdim, col("fk"), col("k"), expectedItems = 1L << 12)
        .collect().map(_.getString(0)).toSet
      val smatching = factKeys.filter(dimKeys.toSet).map(k => s"key_$k").toSet
      assert(smatching.subsetOf(ssurvivors))
    }
  }

  test("TopKPerKey heap AND sort-fallback paths equal the window form for all inputs") {
    // the operator silently serves every user window-top-k via the rewrite
    // rule, so its two execution paths must agree with row_number semantics
    // on ARBITRARY data — duplicate values, tiny and oversized k, skewed
    // key distributions. Ordering is total (v desc, id asc), so the answer
    // is unique and comparable row-for-row.
    val rowsGen = for {
      n <- Gen.choose(1, 60)
      ks <- Gen.listOfN(n, Gen.choose(0, 6))      // few keys → collisions
      vs <- Gen.listOfN(n, Gen.choose(0, 9))      // few values → rank ties broken by id
      k <- Gen.choose(1, 5)
    } yield (ks.zip(vs).zipWithIndex.map { case ((key, v), id) =>
      (s"g$key", id.toLong, v.toDouble) }, k)
    forAll(rowsGen) { case (rows, k) =>
      val df = rows.toDF("k", "id", "v")
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("k").orderBy(col("v").desc, col("id"))
      val expect = df.withColumn("rk", row_number().over(w).cast("long"))
        .filter(col("rk") <= k).orderBy("k", "rk")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(3))).toSeq
      def run(): Seq[(String, Long, Long)] = org.apache.spark.sql.graft.TopKPerKey
        .topKPerKey(df, k, Seq("k"), Seq("v" -> false, "id" -> true))
        .orderBy("k", "rk")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(3))).toSeq
      assert(run() == expect) // heap path
      spark.conf.set("spark.graft.topk.maxHeapKeys", "1")
      try assert(run() == expect) // fallback path (overflows at key #2)
      finally spark.conf.unset("spark.graft.topk.maxHeapKeys")
    }
  }

  test("dupSpanCoverage: lag-window union equals brute-force interval union on random corpora") {
    // small vocab + short docs force heavy cross-doc 13-gram collisions,
    // exercising overlap, containment, and adjacent-hit coalescing
    val K = TextOps.NgramK
    val docGen = Gen.listOfN(5,
      Gen.chooseNum(K, 40).flatMap(n => Gen.listOfN(n, Gen.oneOf("a", "b", "c"))))
    forAll(docGen) { docs =>
      val df = docs.zipWithIndex
        .map { case (toks, i) => (i.toLong, toks.mkString(" ")) }
        .toDF("doc_id", "text")
      val got = TextOps.dupSpanCoverageFrom(df).collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
      // brute force: per doc, the union of [i, i+K) over grams seen in
      // ANOTHER doc, computed with plain position sets
      val grams = docs.zipWithIndex.map { case (toks, i) =>
        i.toLong -> toks.sliding(K).zipWithIndex
          .map { case (g, p) => (g.mkString(" "), p + 1) }.toSeq
      }.toMap
      val docsOf = grams.toSeq.flatMap { case (d, gs) => gs.map { case (g, _) => (g, d) } }
        .groupBy(_._1).map { case (g, ds) => g -> ds.map(_._2).distinct.size }
      val expect = grams.flatMap { case (d, gs) =>
        val hits = gs.filter { case (g, _) => docsOf(g) > 1 }
        if (hits.isEmpty) None
        else {
          val covered = hits.flatMap { case (_, p) => p until (p + K) }.distinct.size
          Some(d -> ((docs(d.toInt).size.toLong, hits.size.toLong, covered.toLong)))
        }
      }
      assert(got == expect, s"docs=${docs.map(_.mkString(" "))}")
    }
  }

  test("as-of family == brute force on random relations (ties, misses, fractional seconds)") {
    import java.sql.{Date, Timestamp}
    val fmt = new java.text.SimpleDateFormat("yyyy-MM-dd")
    fmt.setTimeZone(java.util.TimeZone.getTimeZone("UTC"))
    // 8 seeded instances; each compares BOTH declared as-of semantics
    // against a plain-Scala oracle over the same in-memory relations
    for (seed <- 0 until 8) {
      val rnd = new scala.util.Random(1234L + seed)
      val base = Timestamp.valueOf("2024-03-01 00:00:00").getTime
      val day = 86400000L
      val nEv = 3 + rnd.nextInt(13)
      val nOrd = rnd.nextInt(13) // may be 0: every event then drops
      val events = (0 until nEv).map { i =>
        val millis = base + rnd.nextInt(40) * day +
          (if (rnd.nextBoolean()) 0L else rnd.nextInt(86400) * 1000L + (if (rnd.nextBoolean()) 500L else 0L))
        (i.toLong, 1L + rnd.nextInt(3), new Timestamp(millis))
      }
      val orders = (0 until nOrd).map { i =>
        // duplicate dates are likely (40-day span) → same-date tie-breaks fire
        (1L + rnd.nextInt(3), 100L + i, new Date(base + rnd.nextInt(40) * day), rnd.nextInt(1000) / 10.0)
      }
      val evDf = events.toDF("event_id", "user_id", "ts")
      val ordDf = orders.toDF("o_custkey", "o_orderkey", "o_orderdate", "o_totalprice")

      def floorSec(ms: Long) = Math.floorDiv(ms, 1000L)
      // plain-Scala oracle
      val expBack = events.flatMap { case (eid, u, ts) =>
        val cand = orders.filter(o => o._1 == u && o._3.getTime <= ts.getTime)
        if (cand.isEmpty) None
        else {
          val b = cand.maxBy(o => (o._3.getTime, o._2))
          Some((eid, u, b._2, fmt.format(b._3), b._4))
        }
      }.sortBy(_._1)
      val expNear = events.flatMap { case (eid, u, ts) =>
        val mine = orders.filter(_._1 == u)
        val back = mine.filter(_._3.getTime <= ts.getTime)
          .sortBy(o => (o._3.getTime, o._2)).lastOption
        val fwd = mine.filter(_._3.getTime > ts.getTime)
          .sortBy(o => (o._3.getTime, o._2)).headOption
        (back, fwd) match {
          case (None, None) => None
          case (b, f) =>
            val backS = b.map(o => floorSec(ts.getTime) - floorSec(o._3.getTime))
            val fwdS = f.map(o => floorSec(o._3.getTime) - floorSec(ts.getTime))
            val takeBack = f.isEmpty || (b.nonEmpty && backS.get <= fwdS.get)
            val (o, dir, gap) =
              if (takeBack) (b.get, "back", backS.get) else (f.get, "fwd", fwdS.get)
            Some((eid, u, o._2, dir, gap, o._4))
        }
      }.sortBy(_._1)

      val gotBack = graft.ops.EventOps.asofJoinFrom(evDf, ordDf).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3), r.getDouble(4))).toSeq
      assert(gotBack == expBack, s"seed=$seed backward\nev=$events\nord=$orders")
      val gotNear = graft.ops.EventOps.asofNearestFrom(evDf, ordDf).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3), r.getLong(4), r.getDouble(5))).toSeq
      assert(gotNear == expNear, s"seed=$seed nearest\nev=$events\nord=$orders")
    }
  }

  /** Random co-purchase graph staged as a lineitem fixture in a FRESH dir
    * (the edges memo keys on the dir, so reuse would serve a stale graph).
    * Returns (dir, canonical u<v edge set). */
  private def randomGraphFixture(seed: Long): (String, Set[(Long, Long)]) = {
    val rnd = new scala.util.Random(seed)
    val edges = (0 until (8 + rnd.nextInt(16))).map { _ =>
      val u = 1L + rnd.nextInt(12); val v = 1L + rnd.nextInt(12)
      (math.min(u, v), math.max(u, v))
    }.filter(e => e._1 != e._2).toSet
    val li = edges.toSeq.sorted.zipWithIndex.flatMap { case ((u, v), o) =>
      Seq((o.toLong, u), (o.toLong, v))
    }.toDF("l_orderkey", "l_partkey")
    val dir = java.nio.file.Files.createTempDirectory("graft_graph_prop").toString
    li.write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    (dir, edges)
  }

  test("kcore census equals an in-memory peel on random graphs") {
    (0 until 6).foreach { seed =>
      val (dir, edges) = randomGraphFixture(1000L + seed)
      whenever(edges.nonEmpty) {
        // brute-force peel, mirroring the declared semantics exactly:
        // surv = deg >= k on the CURRENT edges; census counts survivors
        // (even those left edgeless by the restriction) + restricted edges
        var sym = edges.flatMap(e => Seq(e, e.swap))
        val nodes = sym.map(_._1).size.toLong
        val twoE = sym.size.toLong
        val k = twoE / nodes + 1
        var want = Vector((0L, nodes, twoE / 2))
        (1 to graft.ops.GraphOps.KCoreRounds).foreach { r =>
          val deg = sym.groupBy(_._1).map { case (nd, es) => nd -> es.size.toLong }
          val surv = deg.filter(_._2 >= k).keySet
          sym = sym.filter(e => surv(e._1) && surv(e._2))
          want :+= ((r.toLong, surv.size.toLong, sym.size.toLong / 2))
        }
        val got = graft.ops.GraphOps.kcore(spark, dir).collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toVector
        assert(got == want, s"seed=$seed edges=$edges")
      }
    }
  }

  test("linkPredict equals a brute-force Adamic-Adar ranking on random graphs") {
    (0 until 6).foreach { seed =>
      val (dir, edges) = randomGraphFixture(2000L + seed)
      whenever(edges.nonEmpty) {
        val nbrs = edges.flatMap(e => Seq(e, e.swap))
          .groupBy(_._1).map { case (n, es) => n -> es.map(_._2).toSet }
        val acc = scala.collection.mutable.Map
          .empty[(Long, Long), (Long, Double)].withDefaultValue((0L, 0.0))
        nbrs.foreach { case (_, ns) =>
          val d = ns.size
          if (d >= 2 && d <= graft.ops.GraphOps.LinkPredDegCap) {
            val wt = 1.0 / math.log(d.toDouble)
            val sorted = ns.toSeq.sorted
            for (i <- sorted.indices; j <- i + 1 until sorted.size) {
              val key = (sorted(i), sorted(j))
              val (c, s) = acc(key); acc(key) = (c + 1, s + wt)
            }
          }
        }
        val want = acc.toSeq.collect {
          case ((u, v), (c, s)) if !edges((u, v)) =>
            val r = BigDecimal(s).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
            (u, v, c, r)
        }.sortBy { case (u, v, _, s) => (-s, u, v) }
          .take(graft.ops.GraphOps.LinkPredTopK)
        val got = graft.ops.GraphOps.linkPredict(spark, dir).collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
        assert(got == want, s"seed=$seed edges=$edges")
      }
    }
  }

  test("rrfFuse: fused score is exactly the rank formula, monotone in rank, order total") {
    // random rank tables: ids 0..9, each arm ranks a random subset 1..k.
    // Property 1 (value): every fused score equals the closed-form RRF of
    // the two integer ranks. Property 2 (monotonicity): within one arm,
    // improving a doc's rank (holding the other arm fixed) strictly
    // improves its fused score — the axiom that makes rank fusion sane.
    val ranksGen = Gen.listOf(Gen.choose(0L, 9L)).map(_.distinct)
    forAll(ranksGen.flatMap(l => ranksGen.map(d => (l, d)))) { case (lids, dids) =>
      whenever(lids.nonEmpty || dids.nonEmpty) {
        val lex = lids.zipWithIndex.map { case (id, r) => (id, r + 1L) }
          .toDF("doc_id", "rank_lex")
        val dense = dids.zipWithIndex.map { case (id, r) => (id, r + 1L) }
          .toDF("doc_id", "rank_dense")
        val lexR = lids.zipWithIndex.map { case (id, r) => id -> (r + 1L) }.toMap
        val denR = dids.zipWithIndex.map { case (id, r) => id -> (r + 1L) }.toMap
        val got = TextOps.rrfFuse(lex, dense).collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
        assert(got.map(_._1).toSet == (lids ++ dids).toSet)
        got.foreach { case (id, rl, rd, s) =>
          assert(rl == lexR.getOrElse(id, 0L) && rd == denR.getOrElse(id, 0L))
          val expect = BigDecimal(
            (if (rl > 0) 1.0 / (TextOps.RrfK + rl) else 0.0) +
            (if (rd > 0) 1.0 / (TextOps.RrfK + rd) else 0.0))
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
          assert(s == expect, s"doc $id: got $s want $expect")
        }
        // monotonicity: holding the dense rank fixed, a strictly better lex
        // rank gives a strictly higher fused score (strict even after
        // round-6: adjacent reciprocal gaps at k<=10 are >= 1/70-1/71
        // ~ 2e-4, far above the rounding grid)
        for {
          (_, rl1, rd1, s1) <- got
          (_, rl2, rd2, s2) <- got
          if rd1 == rd2 && rl1 > 0 && rl2 > 0 && rl1 < rl2
        } assert(s1 > s2, s"lex rank $rl1 vs $rl2 at dense $rd1: $s1 !> $s2")
        // total order: output sorted by (rrf desc, doc_id)
        val keys = got.map(t => (-t._4, t._1)).toSeq
        assert(keys == keys.sorted)
      }
    }
  }
}
