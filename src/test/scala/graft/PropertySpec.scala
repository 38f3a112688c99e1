package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TextFns

/** Property-based tests (SURVEY §5.3) over generated strings — the column
  * expressions must uphold the reference's invariants for ANY input, not
  * just the corpus. (Plain ScalaCheck generators driven from ScalaTest; the
  * scalatestplus bridge isn't on the offline classpath.)
  */
class PropertySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("every query has an oracle and every oracle has a query (CLAUDE.md invariant)") {
    assert(SparkEntry.queries.keySet === SparkEntry.oracleSql.keySet)
    // qNN prefixes unique: Bench's short-key JSON maps would silently
    // drop a timing on collision
    val prefixes = SparkEntry.queries.keys.map(_.takeWhile(_ != '_')).toSeq
    assert(prefixes.distinct.size === prefixes.size)
  }

  test("README's inventory count matches the query map (CLAUDE.md invariant)") {
    // the third leg of the queries/oracleSql/README sync rule — hand-
    // maintained until r15, so a query could land without its README row.
    // Forked tests run with cwd = the build base directory.
    // explicit codec: the README carries UTF-8 punctuation and the forked
    // test JVM's default charset is not guaranteed UTF-8
    val readme = scala.io.Source.fromFile("README.md")(scala.io.Codec.UTF8)
    val counts = try readme.getLines()
      .flatMap("""^(\d+) queries total""".r.findFirstMatchIn(_))
      .map(_.group(1).toInt).toList
    finally readme.close()
    assert(counts.size === 1, "README must state the count exactly once")
    assert(counts.head === SparkEntry.queries.size,
      s"README says ${counts.head} queries, SparkEntry has " +
        s"${SparkEntry.queries.size} — update the README inventory")
  }

  private val weird: Gen[String] = Gen.listOf(Gen.oneOf(
    Gen.alphaNumChar, Gen.const(' '), Gen.const('é'), Gen.const('!'),
    Gen.const('_'), Gen.const('中'))).map(_.mkString)

  private def sample[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  /** Adversarial PII-shaped strings: fragments that can chain into (or
    * almost into) emails / dotted quads / 555-lines, plus pre-existing
    * placeholders and separators that stress leftmost-match boundaries.
    */
  private val piiish: Gen[String] = Gen.listOf(Gen.oneOf(
    Gen.const("a"), Gen.const("5"), Gen.const("@"), Gen.const("."),
    Gen.const("-"), Gen.const(" "), Gen.const("555-"), Gen.const("1.2.3.4"),
    Gen.const("x@y.co"), Gen.const("example.com"), Gen.const("<EMAIL>"),
    Gen.const("12"), Gen.const("bb"))).map(_.mkString)

  test("PII scrub leaves zero residual matches on 300 adversarial strings") {
    import graft.operators.TextAnalysis
    val inputs = sample(piiish, 300)
    val red = inputs.toDF("s").select(
      regexp_replace(regexp_replace(regexp_replace($"s",
        TextAnalysis.EmailRe, "<EMAIL>"),
        TextAnalysis.Ipv4Re, "<IP>"),
        TextAnalysis.PhoneRe, "<PHONE>").as("red"))
      .as[String].collect().toSeq
    val pats = Seq(TextAnalysis.EmailRe, TextAnalysis.Ipv4Re,
      TextAnalysis.PhoneRe).map(_.r)
    inputs.zip(red).foreach { case (in, r) =>
      pats.foreach { p =>
        assert(p.findFirstIn(r).isEmpty,
          s"residual ${p.regex.take(20)}… in redaction of ${in.take(60)}")
      }
    }
    // and the Spark-side match COUNTS equal driver-side java.util.regex
    // counts on the originals (same leftmost-non-overlapping semantics)
    val counts = inputs.toDF("s").select(
      size(regexp_extract_all($"s", lit(TextAnalysis.EmailRe), lit(0))),
      size(regexp_extract_all($"s", lit(TextAnalysis.Ipv4Re), lit(0))),
      size(regexp_extract_all($"s", lit(TextAnalysis.PhoneRe), lit(0))))
      .as[(Int, Int, Int)].collect().toSeq
    inputs.zip(counts).foreach { case (in, (e, i, ph)) =>
      assert(e === pats(0).findAllIn(in).size, s"email count on ${in.take(60)}")
      assert(i === pats(1).findAllIn(in).size, s"ip count on ${in.take(60)}")
      assert(ph === pats(2).findAllIn(in).size, s"phone count on ${in.take(60)}")
    }
  }

  test("clean+tokenize agrees with reference string semantics on 200 random strings") {
    val inputs = sample(weird, 200)
    val got = inputs.toDF("s")
      .select(TextFns.tokenize($"s").as("r")).collect().toSeq
      .map(_.getSeq[String](0))
    inputs.zip(got).foreach { case (s, toks) =>
      toks.foreach { t =>
        assert(t.nonEmpty && t.forall(ch => ch.isDigit || (ch >= 'a' && ch <= 'z')))
      }
      val want = s.replaceAll("[^a-zA-Z0-9 ]", "").toLowerCase
        .split(" ").filter(_.nonEmpty).toSeq
      assert(toks === want, s"input=${s.take(40)}")
    }
  }

  test("shingleArray size is max(0, n-k+1) and each shingle has k tokens") {
    val inputs = sample(weird, 100)
    for (k <- 2 to 6) {
      val rows = inputs.toDF("s")
        .select(size(TextFns.tokenize($"s")).as("n"),
          TextFns.shingleArray(TextFns.tokenize($"s"), k).as("sh"))
        .collect()
      rows.foreach { r =>
        val n = r.getInt(0); val sh = r.getSeq[String](1)
        assert(sh.length === math.max(0, n - k + 1))
        sh.foreach(s => assert(s.split(" ").length === k))
      }
    }
  }

  test("simhashNearPairs has FULL recall for hamming<=3 on random 32-bit sigs") {
    // the pigeonhole claim, checked against a brute-force oracle: every
    // pair within hamming 3 must appear, no pair beyond 3 may appear
    val sigs = sample(Gen.choose(0L, (1L << 32) - 1), 120).distinct
      .zipWithIndex.map { case (s, i) => (i.toLong, s) }
    val want = (for {
      (a, sa) <- sigs; (b, sb) <- sigs if a < b
      h = java.lang.Long.bitCount(sa ^ sb) if h <= 3
    } yield (a, b, h.toLong)).toSet
    val got = graft.operators.Dedup
      .simhashNearPairs(sigs.toDF("doc_id", "simhash"), bits = 32)
      .as[(Long, Long, Long)].collect().toSet
    assert(got === want)
  }

  test("simhash64NearPairs has full recall for random two-long sigs at d=1..5") {
    // the (d+1)-band construction over the concatenated 64-bit space,
    // against a brute-force oracle. Band edges are k·64/(d+1): d=2 and
    // d=4 put a band across the lo/hi boundary ([21,42) and [25,38)),
    // exercising the two-long key stitch; d=1,3,5 split cleanly. Random
    // 64-bit pairs sit at expected hamming 32, so each base gets a planted
    // variant with 0..6 flipped bits — recall is exercised, not just
    // precision
    val bases = sample(Gen.choose(0L, (1L << 32) - 1), 80)
      .grouped(2).collect { case Seq(lo, hi) => (lo, hi) }.toSeq
    val flips = sample(Gen.listOfN(8, Gen.choose(0, 63)), bases.size)
    val sigs = bases.zip(flips).zipWithIndex.flatMap {
      case (((lo, hi), pos), i) =>
        val ps = pos.distinct.take(i % 7)
        val (flo, fhi) = ps.foldLeft((lo, hi)) { case ((l, h), p) =>
          if (p < 32) (l ^ (1L << p), h) else (l, h ^ (1L << (p - 32)))
        }
        Seq((2L * i, lo, hi), (2L * i + 1, flo, fhi))
    }
    for (d <- 1 to 5) {
      val want = (for {
        (a, la, ha) <- sigs; (b, lb, hb) <- sigs if a < b
        h = java.lang.Long.bitCount(la ^ lb) + java.lang.Long.bitCount(ha ^ hb)
        if h <= d
      } yield (a, b, h.toLong)).toSet
      val got = graft.operators.Dedup
        .simhash64NearPairs(sigs.toDF("doc_id", "sh_lo", "sh_hi"), maxHamming = d)
        .as[(Long, Long, Long)].collect().toSet
      assert(got === want, s"maxHamming=$d")
    }
  }

  test("pagePath/parentPath: parent of path(n) is path(n/10), for random ids") {
    val ids = sample(Gen.choose(0L, 999999L), 300)
    val rows = ids.toDF("id")
      .select($"id", TextFns.pagePath($"id").as("p"))
      .withColumn("pp", TextFns.parentPath($"p"))
      .collect()
    rows.foreach { r =>
      val (id, p, pp) = (r.getLong(0), r.getString(1), r.getString(2))
      assert(p.split("/").last === id.toString)
      if (id < 10) assert(pp === "")
      else assert(pp.split("/").last === (id / 10).toString)
    }
  }

  test("corpus invariants: pagerank mass bound, variance >= 0, span <= shingle count") {
    val sf = TestSpark.Sf
    // damped PageRank can only LOSE mass to dangling tokens: every
    // per-token rank stays within [base*15/100, SCALE], and the total
    // never exceeds SCALE (integer floors only shrink)
    val pr = graft.operators.TextAnalysis.tokenPagerank(spark, sf)
      .as[(String, Long, Long)].collect()
    assert(pr.forall(r => r._2 >= 0 && r._2 <= 1000000000L &&
      r._3 >= 0 && r._3 <= 1000000000L))
    assert(pr.map(_._2).sum <= 1000000000L)
    assert(pr.map(_._3).sum <= 1000000000L)
    // population variance is non-negative for every dimension
    val ds = graft.operators.Similarity.dimStats(spark, sf)
      .as[(Long, Long, Double, Double)].collect()
    assert(ds.forall(_._4 >= 0.0))
    // a shared run can never exceed either member's POSITIONAL shingle
    // count (n_tokens − k + 1; distinct counts undercount repeated
    // shingles, which verbatim pairs hit)
    val k = graft.operators.Dedup.ShingleSize
    val counts = graft.Tables.documents(spark, sf)
      .select($"doc_id", greatest(
        size(TextFns.tokenize($"text")) - (k - 1), lit(0)).cast("long").as("c"))
      .as[(Long, Long)].collect().toMap
    graft.operators.Dedup.sharedSpans(spark, sf)
      .as[(Long, Long, Long, Long)].collect()
      .foreach { case (a, b, run, span) =>
        assert(run <= math.min(counts(a), counts(b)))
        assert(span === run + k - 1)
      }
  }

  test("propagateMinLabels equals union-find on random graphs") {
    // 10 random graphs spanning sparse scatter to near-connected: the
    // pointer-doubling round must land every vertex on its component's
    // true minimum id regardless of shape (chains, cliques, isolates)
    val rnd = new scala.util.Random(7L)
    (1 to 10).foreach { trial =>
      val n = 30 + rnd.nextInt(40)
      val m = rnd.nextInt(2 * n)
      val edges = Seq.fill(m)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      // driver-side union-find oracle
      val parent = Array.tabulate(n)(identity)
      def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); r }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a.toInt), find(b.toInt))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val want = (0 until n).map(v => (v.toLong, find(v).toLong)).toSet
      val e = edges.toDF("doc_a", "doc_b")
      val sym = e.union(e.select(col("doc_b").as("doc_a"), col("doc_a").as("doc_b")))
      val verts = (0L until n.toLong).toDF("doc_id")
      val got = graft.operators.Dedup.propagateMinLabels(verts, sym)
        .as[(Long, Long)].collect().toSet
      assert(got === want, s"trial=$trial n=$n m=$m")
    }
  }

  test("native collect_top_k == ROW_NUMBER window contract on random scored rows") {
    // the q43/q51/q97 hot-path swap: struct(-score, tiebreak) under
    // reverse=true must equal ROW_NUMBER() OVER (ORDER BY score DESC,
    // tiebreak ASC) <= k for ANY score multiset — duplicated scores,
    // zeros (negation → -0.0), negative scores, tiny groups
    val rows: Gen[(Long, Long, Double)] = for {
      g <- Gen.choose(0L, 7L)
      t <- Gen.choose(0L, 999L)
      s <- Gen.oneOf(Gen.choose(-5, 5).map(_.toDouble),
        Gen.choose(-100, 100).map(_ / 8.0))
    } yield (g, t, s)
    (1 to 5).foreach { trial =>
      val data = sample(Gen.listOfN(300, rows), 1).head
        .distinctBy(r => (r._1, r._2)) // one score per (group, tiebreak)
      val df = data.toDF("g", "t", "s")
      val k = 1 + trial % 4
      val native = df.groupBy("g")
        .agg(org.apache.spark.sql.GraftBridge.collectTopK(
          struct((-col("s")).as("ns"), col("t")), k, reverse = true).as("top"))
        .select(col("g"), posexplode(col("top")).as(Seq("pos", "x")))
        .select(col("g"), (col("pos") + 1).as("rnk"), col("x.t").as("t"),
          (-col("x.ns")).as("s"))
        .as[(Long, Int, Long, Double)].collect().toSet
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("g").orderBy(col("s").desc, col("t"))
      val window = df.withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= k)
        .select(col("g"), col("rnk"), col("t"), col("s"))
        .as[(Long, Int, Long, Double)].collect().toSet
      assert(native === window, s"trial=$trial k=$k")
    }
  }
}
