package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftx.AsOfJoinNative
import org.scalatest.funsuite.AnyFunSuite

/** The native physical as-of operator must agree with the composed
  * union+window implementation on real data, and its plan must show the
  * custom exec node with one exchange per side.
  */
class AsOfNativeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def errorsAndPurchases() = {
    val ev = Tables.events(spark, TestSpark.Sf)
      .withColumn("ts_us", unix_micros($"ts"))
    val errors = ev.filter($"event_type" === "error")
      .select($"user_id", $"event_id", $"ts_us")
    val purchases = ev.filter($"event_type" === "purchase")
      .groupBy($"user_id", $"ts_us".as("p_ts"))
      .agg(max("event_id").as("p_event_id"))
      .select("user_id", "p_ts", "p_event_id")
    (errors, purchases)
  }

  test("native AsOfJoinExec matches the composed union+window as-of") {
    val (errors, purchases) = errorsAndPurchases()
    val native = AsOfJoinNative.asofJoin(errors, purchases, "user_id", "ts_us", "p_ts")
      .select($"user_id", $"event_id", $"ts_us",
        coalesce($"r_p_event_id", lit(-1L)).as("last_purchase_id"),
        coalesce($"r_p_ts", lit(-1L)).as("last_purchase_ts"))
    val composed = graft.operators.Events
      .errorsWithLastPurchase(spark, TestSpark.Sf)
    assert(native.count() === composed.count())
    assert(native.exceptAll(composed).count() === 0)
    assert(composed.exceptAll(native).count() === 0)
  }

  test("the physical plan contains AsOfJoinExec fed by one exchange per side") {
    val (errors, purchases) = errorsAndPurchases()
    val df = AsOfJoinNative.asofJoin(errors, purchases, "user_id", "ts_us", "p_ts")
    df.count() // materialize so AQE finalizes the plan
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"), s"plan:\n$plan")
  }

  test("NULL keys and timestamps never match (SQL equality semantics)") {
    val left = Seq(
      (Some(1L), Some(200L), "ok"),
      (None: Option[Long], Some(200L), "nullkey"),
      (Some(1L), None: Option[Long], "nullts"))
      .toDF("k", "ts", "tag")
    val right = Seq(
      (Some(1L), Some(100L), "r1"),
      (None: Option[Long], Some(50L), "rnull"))
      .toDF("k", "rts", "rtag")
    val out = AsOfJoinNative.asofJoin(left, right, "k", "ts", "rts")
      .select($"tag", $"r_rtag")
      .collect().map(r => (r.getString(0), Option(r.getString(1)))).toMap
    assert(out === Map(
      "ok" -> Some("r1"),     // normal match; the null-key right row is skipped
      "nullkey" -> None,      // NULL key matches nothing (not key 0)
      "nullts" -> None))      // NULL ts matches nothing
  }

  test("left rows with no preceding right row get nulls") {
    val left = Seq((1L, 50L, "early"), (1L, 300L, "late")).toDF("k", "ts", "tag")
    val right = Seq((1L, 100L, "r1")).toDF("k", "rts", "rtag")
    val out = AsOfJoinNative.asofJoin(left, right, "k", "ts", "rts")
      .select($"tag", $"r_rtag")
      .collect().map(r => (r.getString(0), Option(r.getString(1)))).toMap
    assert(out === Map("early" -> None, "late" -> Some("r1")))
  }
}
