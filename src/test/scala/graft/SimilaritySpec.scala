package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Similarity

class SimilaritySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._
  private val sf = TestSpark.Sf

  test("labelOutliers: planted far vector ranks first in its label") {
    val vecs = Seq(
      (0L, Seq(0f, 0f), 0L),
      (1L, Seq(2f, 0f), 0L),
      (2L, Seq(10f, 10f), 0L),   // the planted outlier
      (3L, Seq(1f, 1f), 1L),
      (4L, Seq(1f, 1f), 1L))     // identical pair: dist 0, id tiebreak
    val dir = java.nio.file.Files.createTempDirectory("graft_outlier").toString
    vecs.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val got = Similarity.labelOutliers(spark, dir)
      .as[(Long, Long, Long, Double)].collect().toSeq
    // label 0 centroid = (4, 10/3): dists 2→~8.97, 0→~5.21, 1→~3.89
    assert(got.filter(_._1 == 0L).map(r => (r._2, r._3)) ===
      Seq((2L, 1L), (0L, 2L), (1L, 3L)))
    // label 1: both AT the centroid, dist exactly 0, vec_id breaks the tie
    assert(got.filter(_._1 == 1L) === Seq((1L, 3L, 1L, 0.0), (1L, 4L, 2L, 0.0)))
    // distances are non-increasing within each label
    got.groupBy(_._1).values.foreach { rows =>
      val ds = rows.sortBy(_._3).map(_._4)
      assert(ds === ds.sorted.reverse)
    }
  }

  test("knnQuantized: codes and integer dots match hand-quantized vectors") {
    val vecs = Seq(
      (0L, Seq(3f, 4f), 0L),   // nrm 5 → codes (76, 102)
      (1L, Seq(1f, 0f), 0L),   // → (127, 0)
      (2L, Seq(0f, 1f), 0L),   // → (0, 127)
      (3L, Seq(-3f, -4f), 0L)) // → (-76, -102)
    val dir = java.nio.file.Files.createTempDirectory("graft_quant").toString
    vecs.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val got = Similarity.knnQuantized(spark, dir)
      .as[(Long, Long, Long, Long)].collect().toSeq
    // query 0: dot(76,102)·(0,127)=12954 > (127,0)=9652 > (-76,-102)=-16180
    assert(got.filter(_._1 == 0L) ===
      Seq((0L, 2L, 1L, 12954L), (0L, 1L, 2L, 9652L), (0L, 3L, 3L, -16180L)))
    // antipodal query 3: every dot negates, so the order reverses
    assert(got.filter(_._1 == 3L).map(r => (r._2, r._4)) ===
      Seq((1L, -9652L), (2L, -12954L), (0L, -16180L)))
  }

  test("knnQuantized: int8 codes preserve the exact top-1 on the corpus") {
    val qz = Similarity.knnQuantized(spark, sf)
      .as[(Long, Long, Long, Long)].collect().toSeq
    val bf = Similarity.knnBruteForce(spark, sf)
      .as[(Long, Long, Long, Double)].collect().toSeq
    val queries = qz.map(_._1).distinct
    assert(queries.size === 8)
    queries.foreach { q =>
      val qrows = qz.filter(_._1 == q)
      assert(qrows.map(_._3) === (1L to 5L), s"query $q ranks 1..5")
      assert(qrows.map(_._4) === qrows.map(_._4).sorted.reverse, s"query $q scores sorted")
      // quantization keeps the winner
      assert(qrows.head._2 === bf.filter(_._1 == q).head._2, s"query $q top-1")
    }
    // and ≥ 35/40 of the exact top-5 survive quantization (recall@5)
    val overlap = queries.map { q =>
      (qz.filter(_._1 == q).map(_._2).toSet
        intersect bf.filter(_._1 == q).map(_._2).toSet).size
    }.sum
    assert(overlap >= 35, s"recall@5 overlap $overlap/40")
  }

  test("labelOutliers: every corpus label emits exactly k ranked rows") {
    val got = Similarity.labelOutliers(spark, sf)
      .as[(Long, Long, Long, Double)].collect().toSeq
    val labels = got.map(_._1).distinct
    assert(labels.size === 10)
    labels.foreach { l =>
      val rows = got.filter(_._1 == l)
      assert(rows.map(_._3) === (1L to 10L), s"label $l ranks 1..10")
    }
  }

  test("kmeansStep: full k×d centroid table, members partition the corpus") {
    import org.apache.spark.sql.functions._
    val step = Similarity.kmeansStep(spark, sf).persist()
    val nVecs = graft.Tables.embeddings(spark, sf).count()
    // every (cluster, pos) cell is present: all 8 seeds claim at least
    // themselves (their own d2 is exactly 0), dims are dense
    assert(step.count() === 8L * 64L)
    assert(step.select("cluster_id").distinct().count() === 8L)
    // the assignment is a partition of the corpus: member counts at any
    // fixed position sum to the vector count
    val perPos = step.groupBy("pos").agg(sum("n_members").as("m"))
      .select("m").distinct().as[Long].collect().toSeq
    assert(perPos === Seq(nVecs))
    // a centroid mean can never leave the member value envelope
    assert(step.filter(col("c_val").isNull || abs(col("c_val")) > 1e6).count() === 0)
    step.unpersist()
    ()
  }

  test("dimStats: hand-computed mean/variance on a planted two-vector table") {
    import org.apache.spark.sql.functions.col
    // dim 0: values 1, 3 → mean 2, var ((1+9)/2 − 4) = 1
    // dim 1: values 2, 2 → mean 2, var 0
    val dir = java.nio.file.Files.createTempDirectory("graft_dims").toString
    Seq((0L, Array(1.0f, 2.0f), 0), (1L, Array(3.0f, 2.0f), 1))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val got = Similarity.dimStats(spark, dir)
      .as[(Long, Long, Double, Double)].collect().toSeq
    assert(got === Seq((0L, 2L, 2.0, 1.0), (1L, 2L, 2.0, 0.0)))
  }

  test("clusterSample: every cluster's rank-1 prototype is its own seed") {
    import org.apache.spark.sql.functions.col
    val cs = Similarity.clusterSample(spark, sf).persist()
    // the seed is at distance 0 from itself, so it must rank first
    assert(cs.filter(col("rnk") === 1L &&
      col("vec_id") =!= col("cluster_id")).count() === 0)
    // ranks are dense 1..m within every cluster
    assert(cs.groupBy("cluster_id").count()
      .filter(col("count") =!= 3L).count() === 0)
    cs.unpersist()
    ()
  }

  test("knnClassify: one prediction per query, votes bounded by K, majority agrees with hand count") {
    import org.apache.spark.sql.functions.col
    val pred = Similarity.knnClassify(spark, sf).collect()
    assert(pred.map(_.getLong(0)).toSeq === (0L until 8L))
    assert(pred.forall { r => r.getLong(3) >= 1 && r.getLong(3) <= 5 })
    // recompute query 0's modal neighbor label straight from the kNN output
    val labels = Tables.embeddings(spark, sf)
      .select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val n0 = Similarity.knnBruteForce(spark, sf)
      .filter(col("query_id") === 0L).collect().map(_.getLong(1))
    val expect = n0.map(labels).groupBy(identity).toSeq
      .map { case (l, v) => (-v.length, l) }.min._2
    assert(pred.head.getInt(2) === expect)
  }

  test("kmeansAssign: seeds claim themselves at distance 0, counts match the step") {
    import org.apache.spark.sql.functions._
    val asg = Similarity.kmeansAssign(spark, sf).persist()
    // each seed vector's nearest centroid is itself, exactly
    assert(asg.filter(col("vec_id") < 8 &&
      (col("cluster_id") =!= col("vec_id") || col("dist") =!= 0.0)).count() === 0)
    // the assignment sizes agree with the step's n_members
    val sizes = asg.groupBy("cluster_id").agg(count(lit(1)).as("n"))
    val stepSizes = Similarity.kmeansStep(spark, sf)
      .filter(col("pos") === 0L)
      .select(col("cluster_id"), col("n_members").as("m"))
    assert(sizes.join(stepSizes, Seq("cluster_id"))
      .filter(col("n") =!= col("m")).count() === 0)
    asg.unpersist()
    ()
  }

  test("q105 PQ: ADC distance equals distance to the reconstructed vector") {
    import org.apache.spark.sql.functions.col
    val out = Similarity.knnPq(spark, sf).collect()
    assert(out.length === Similarity.QuerySetSize * Similarity.K)
    // per query: rnk 1..K with pq_dist2 non-decreasing
    out.groupBy(_.getAs[Long]("query_id")).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_.getAs[Long]("rnk"))
      assert(sorted.map(_.getAs[Long]("rnk")).toSeq ===
        (1L to Similarity.K.toLong))
      val d = sorted.map(_.getAs[Double]("pq_dist2")).toSeq
      assert(d.zip(d.tail).forall { case (a, b) => a <= b })
    }
    // the ADC identity, recomputed independently with plain Scala doubles:
    // Σ_m table[m][code_v(m)] IS ||q − reconstruct(v)||² where
    // reconstruct(v) concatenates v's chosen codewords
    val emb = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getAs[Long]("vec_id") ->
        r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    val m0 = Similarity.PqSubspaces; val sd = Similarity.PqSubDim
    val ks = Similarity.PqCodes
    def subv(v: Array[Double], m: Int): Array[Double] = v.slice(m * sd, m * sd + sd)
    def sq(a: Array[Double], b: Array[Double]): Double =
      a.zip(b).foldLeft(0.0) { case (acc, (x, y)) => acc + (x - y) * (x - y) }
    def code(v: Array[Double], m: Int): Int =
      (0 until ks).minBy(c => (sq(subv(v, m), subv(emb(c.toLong), m)), c))
    for (r <- out) {
      val q = emb(r.getAs[Long]("query_id"))
      val n = emb(r.getAs[Long]("neighbor_id"))
      val adc = (0 until m0).foldLeft(0.0) { (acc, m) =>
        acc + sq(subv(q, m), subv(emb(code(n, m).toLong), m))
      }
      assert(math.abs(adc - r.getAs[Double]("pq_dist2")) < 1e-6,
        s"ADC mismatch for (${r.getAs[Long]("query_id")}, ${r.getAs[Long]("neighbor_id")})")
    }
  }

  test("annSweep: full grid, monotone in radius, agrees with q115 at the shipped rungs") {
    import org.apache.spark.sql.functions.col
    val sw = Similarity.annSweep(spark, sf).collect()
    assert(sw.length === Similarity.SweepConfigs.size)
    // a wider radius can only ADD cells: candidates and hits are
    // non-decreasing in probe_hamming for every quantizer width
    sw.groupBy(_.getAs[Long]("bits")).values.foreach { rows =>
      val byR = rows.sortBy(_.getAs[Long]("probe_hamming")).toSeq
      val cand = byR.map(_.getAs[Long]("n_cand"))
      val hits = byR.map(_.getAs[Long]("n_hits"))
      assert(cand === cand.sorted, s"n_cand not monotone: $cand")
      assert(hits === hits.sorted, s"n_hits not monotone: $hits")
    }
    // the shipped rungs ARE grid points: (IvfBits, r=0) is q29's IVF
    // probe and (IvfBits, r=1) is q55's multi-probe, so the sweep's
    // recall there must equal q115's per-method means exactly — the
    // masked-popcount candidate set is the flip-join's
    val mean = Similarity.annRecall(spark, sf)
      .filter(col("query_id") === -1L).collect()
      .map(r => r.getAs[String]("method") -> r.getAs[Double]("recall")).toMap
    val at = sw.map(r => (r.getAs[Long]("bits"), r.getAs[Long]("probe_hamming")) ->
      r.getAs[Double]("recall")).toMap
    assert(at((Similarity.IvfBits.toLong, 0L)) === mean("ivf"))
    assert(at((Similarity.IvfBits.toLong, 1L)) === mean("multiprobe"))
  }

  test("annSweep: planted clusters reach recall 1.0 at a fraction of the scan") {
    // The sf corpora are near-uniform (max cosine ≈ 0.5), so high recall
    // there needs a high scan fraction — the r14 verdict asked whether
    // the knobs can reach recall ≥ 0.8 AT ALL. On a corpus with real
    // cluster structure they do, cheaply: 4 tight clusters whose centers
    // have distinct sign patterns in the first 4 dims ⇒ at bits=4 every
    // cluster is one cell, own-cell probing (radius 0) already sees all
    // true neighbors, and the candidate set is ~cluster-sized, not the
    // corpus.
    val dim = 16
    val centers = Seq(
      Array.fill(dim)(1f),
      Array.tabulate(dim)(i => if (i < 4 && i % 2 == 0) -1f else 1f),
      Array.tabulate(dim)(i => if (i < 4 && i % 2 == 1) -1f else 1f),
      Array.tabulate(dim)(i => if (i < 4) -1f else 1f))
    // ids interleaved across clusters so queries (vec_id < 8) cover all
    // four; perturbation small enough to never flip a sign
    val vecs = for (j <- 0 until 10; cl <- 0 until 4) yield {
      val id = (j * 4 + cl).toLong
      (id, centers(cl).zipWithIndex.map { case (v, i) =>
        v * (1f + 0.001f * ((id + i) % 7).toFloat) }.toSeq, cl.toLong)
    }
    val dir = java.nio.file.Files.createTempDirectory("graft_sweep_planted").toString
    vecs.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val sw = Similarity.annSweep(spark, dir).collect()
      .map(r => (r.getAs[Long]("bits"), r.getAs[Long]("probe_hamming")) ->
        (r.getAs[Long]("n_cand"), r.getAs[Double]("recall"))).toMap
    val fullScan = 8L * (vecs.size - 1) // every query scores every other vector
    val (cand40, recall40) = sw((4L, 0L))
    assert(recall40 === 1.0,
      s"own-cell probe at bits=4 must see every true neighbor, got $recall40")
    assert(cand40 <= fullScan / 3,
      s"planted clusters must prune the scan: $cand40 of $fullScan pairs")
    // and the exhaustive config agrees with ground truth by construction
    assert(sw((2L, 2L)) === ((fullScan, 1.0)))
    // the auto-pick turns that curve into the deployment decision: one
    // row per target, recall meets the target, and on a structured
    // corpus even the 1.0 target picks a config cheaper than full scan
    val picks = Similarity.annAutoPick(spark, dir).collect()
    assert(picks.map(_.getAs[Double]("recall_target")).toSeq ===
      Similarity.PickTargets)
    picks.foreach { p =>
      assert(p.getAs[Double]("recall") >= p.getAs[Double]("recall_target"))
    }
    val pick10 = picks.find(_.getAs[Double]("recall_target") == 1.0).get
    assert(pick10.getAs[Long]("n_cand") < fullScan,
      "planted structure must let the 1.0 target beat the full scan")
  }
}
