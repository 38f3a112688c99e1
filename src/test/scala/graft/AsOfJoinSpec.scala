package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{AsOfJoin, Skew}
import graft.operators.TokenPipeline

class AsOfJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("asofJoin picks greatest right ts <= left ts; equal ts matches; none -> null") {
    val left = Seq((1L, 100L, "e1"), (1L, 200L, "e2"), (2L, 150L, "e3"))
      .toDF("k", "ts", "name")
    val right = Seq((1L, 90L, "p1"), (1L, 150L, "p2"), (1L, 200L, "p3"), (2L, 300L, "p4"))
      .toDF("k", "rts", "rname")
    val out = AsOfJoin.asofJoin(left, right, "k", "ts", "rts")
      .select($"name", $"asof.rname".as("matched"))
      .collect().map(r => (r.getString(0), Option(r.getString(1)))).toMap
    assert(out === Map(
      "e1" -> Some("p1"),   // 90 <= 100 < 150
      "e2" -> Some("p3"),   // equal ts matches (>= semantics)
      "e3" -> None))        // only right ts is AFTER the left row
  }

  test("asof equals a theta-join + argmax formulation on real events") {
    val got = graft.operators.Events.errorsWithLastPurchase(spark, TestSpark.Sf)
    val ev = Tables.events(spark, TestSpark.Sf)
      .withColumn("ts_us", unix_micros($"ts"))
    val err = ev.filter($"event_type" === "error")
      .select($"user_id", $"event_id", $"ts_us")
    val pur = ev.filter($"event_type" === "purchase")
      .select($"user_id".as("p_user"), $"event_id".as("p_id"), $"ts_us".as("p_ts"))
    // brute force: left theta-join on ts_us >= p_ts, lexicographic argmax
    // over (p_ts, p_id) — O(|E|·|P|) per user, fine as a test oracle
    val want = err.join(pur,
        $"user_id" === $"p_user" && $"p_ts" <= $"ts_us", "left")
      .groupBy("user_id", "event_id", "ts_us")
      .agg(max(struct($"p_ts", $"p_id")).as("m"))
      .select($"user_id", $"event_id", $"ts_us",
        coalesce($"m.p_id", lit(-1L)).as("last_purchase_id"),
        coalesce($"m.p_ts", lit(-1L)).as("last_purchase_ts"))
    assert(got.exceptAll(want).count() === 0)
    assert(got.count() === want.count())
  }

  test("composed asofJoin: NULL keys/timestamps never match (native parity)") {
    val left = Seq(
      (Some(1L), Some(200L), "ok"),
      (None: Option[Long], Some(200L), "nullkey"),
      (Some(1L), None: Option[Long], "nullts"))
      .toDF("k", "ts", "name")
    val right = Seq(
      (Some(1L), Some(100L), "r1"),
      (Some(1L), None: Option[Long], "rnullts"),
      (None: Option[Long], Some(50L), "rnullkey"))
      .toDF("k", "rts", "rname")
    val out = AsOfJoin.asofJoin(left, right, "k", "ts", "rts")
      .select($"name", $"asof.rname".as("m"))
      .collect().map(r => (r.getString(0), Option(r.getString(1)))).toMap
    assert(out === Map(
      "ok" -> Some("r1"),  // NULL-ts right row must NOT act as -infinity
      "nullkey" -> None,
      "nullts" -> None))
  }

  test("saltedJoin equals the plain join exactly") {
    val big = Tables.orders(spark, TestSpark.Sf)
    val small = Tables.customer(spark, TestSpark.Sf)
    val plain = big.join(small, big("o_custkey") === small("c_custkey"))
      .select("o_orderkey", "c_custkey")
    val salted = Skew.saltedJoin(
      big.withColumnRenamed("o_custkey", "custkey"),
      small.withColumnRenamed("c_custkey", "custkey"), "custkey", 8)
      .select($"o_orderkey", $"custkey".as("c_custkey"))
    assert(plain.exceptAll(salted).count() === 0)
    assert(salted.exceptAll(plain).count() === 0)
  }

  test("HLL sketch (approx_count_distinct) lands within 5% of exact") {
    val kept = TokenPipeline.docTokenCounts(spark, TestSpark.Sf)
    val r = kept.agg(
      countDistinct($"doc_id").as("exact"),
      approx_count_distinct($"doc_id", 0.02).as("approx")).collect()(0)
    val (exact, approx) = (r.getLong(0).toDouble, r.getLong(1).toDouble)
    assert(math.abs(approx - exact) / exact < 0.05)
  }
}
