package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table loaders for the driver-generated test data
  * (see /root/repo/TESTDATA.md). One loader per table; schemas are
  * whatever the parquet footers declare — we never infer beyond that.
  *
  * At 100 TB these would be partitioned/bucketed external tables; the
  * loaders stay the single choke point where that changes.
  */
object Tables {
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame    = load(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame      = load(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame    = load(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame    = load(spark, dir, "region")
  /** `events.parquet` carries TIMESTAMP(NANOS), which Spark's parquet reader
    * rejects; read nanos as long and convert to a microsecond timestamp
    * (integer floor-div — exactly DuckDB's ns→us cast truncation).
    *
    * Side effect: sets the session-wide `nanosAsLong` legacy flag (the only
    * way to read nanos), so any OTHER nanos-timestamp parquet read later in
    * the session will also surface as BIGINT. events is the only such table
    * here.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // `div` truncates toward zero — measured to be EXACTLY DuckDB 1.0's
    // ns→us cast behavior including pre-1970 values (-1500 ns → -1 µs,
    // -999 ns → 0 µs), so the two engines agree on all sign cases.
    load(spark, dir, "events")
      .withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts div 1000")))
  }
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")
}
