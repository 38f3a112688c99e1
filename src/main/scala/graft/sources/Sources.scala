package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Source/sink surface (reference O1/O3/O20: SQLite scan, text-file
  * dictionary, MongoDB bulk sinks → re-expressed as Spark's pluggable
  * DataSource API).
  *
  * Schemas are always declared, never inferred (the reference's fixed-schema
  * philosophy, SURVEY §1.3) — inference costs an extra pass and produces
  * run-dependent types at 100 TB.
  *
  * Sinks write partitioned columnar data; `partitionBy` columns become
  * directory-level partition pruning for every downstream reader. (The
  * driver harness compares parquet; Mongo/JDBC sinks would be the same
  * one-liner with the respective connector on the classpath.)
  */
object Sources {

  def readParquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  def readCsv(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).option("header", "true").csv(path)

  def readJson(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  /** Line-delimited text (the reference's `en` dictionary file, one word
    * per line, main.go:108–118).
    */
  def readWordList(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    spark.read.textFile(path).toDF("token")
      .select(org.apache.spark.sql.functions.lower($"token").as("token"))
  }

  def writeParquet(df: DataFrame, path: String, partitionCols: Seq[String] = Nil): Unit = {
    val w = df.write.mode("overwrite")
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w).parquet(path)
  }

  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("header", "true").csv(path)

  def writeJson(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)
}
