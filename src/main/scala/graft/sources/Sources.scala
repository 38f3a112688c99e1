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
    import org.apache.spark.sql.functions.{lower, trim}
    // trim + drop blank lines, matching the graft-words DSv2 source —
    // dictionary files are one word per line but hand-edited ones carry
    // stray whitespace, and a blank line must not become an empty "word"
    spark.read.textFile(path).toDF("token")
      .select(lower(trim($"token")).as("token"))
      .filter($"token" =!= "")
  }

  /** JDBC source (reference O1 is literally a SQLite table scan,
    * main.go:130). `options` passes through e.g. partitionColumn/
    * lowerBound/upperBound/numPartitions for a parallel read — without
    * them Spark reads the table on one task, which is fine for a dim
    * table and wrong for a fact table. (This container has no SQLite
    * driver jar; tests use the Derby jar Spark ships for its metastore —
    * same code path, different URL.)
    */
  def readJdbc(spark: SparkSession, url: String, table: String,
      options: Map[String, String] = Map.empty): DataFrame =
    spark.read.format("jdbc")
      .option("url", url).option("dbtable", table)
      .options(options).load()

  def writeJdbc(df: DataFrame, url: String, table: String,
      options: Map[String, String] = Map.empty): Unit =
    df.write.format("jdbc")
      .option("url", url).option("dbtable", table)
      .options(options).mode("overwrite").save()

  def writeParquet(df: DataFrame, path: String, partitionCols: Seq[String] = Nil): Unit = {
    val w = df.write.mode("overwrite")
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w).parquet(path)
  }

  /** Bucketed + sorted table write: the co-located-join / bucket-pruned-
    * probe storage layout. Bucket metadata lives in the catalog, so this
    * is a saveAsTable; `path` keeps the data external. Readers joining on
    * the bucket column skip the shuffle (BucketingSpec), and equality
    * probes on it read only the matching bucket files
    * (SelectedBucketsCount in the scan).
    */
  def writeBucketed(df: DataFrame, table: String, path: String,
      buckets: Int, bucketCol: String, sortCols: Seq[String] = Nil): Unit = {
    val w = df.write.mode("overwrite").bucketBy(buckets, bucketCol)
    val ws = if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w
    ws.option("path", path).saveAsTable(table)
  }

  /** Format-pluggable sink passthrough: the write side is one
    * DataSource-API call, so the sink choice is a string. The reference's
    * MongoDB bulk sinks (main.go:164,174,238) are exactly
    * `writeFormat(df, "mongodb", options = Map("collection" -> …))` with
    * the connector jar on the classpath — absent from this container, so
    * the test exercises the identical code path through built-in formats
    * (orc/json/parquet). Everything upstream of the write is
    * sink-agnostic; formats that need no path (JDBC-like) pass their
    * target through `options` and `path = null` is not supported — use
    * writeJdbc for those.
    */
  def writeFormat(df: DataFrame, format: String, path: String,
      options: Map[String, String] = Map.empty,
      partitionCols: Seq[String] = Nil): Unit = {
    val w = df.write.format(format).options(options).mode("overwrite")
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w).save(path)
  }

  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("header", "true").csv(path)

  def writeJson(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)
}
