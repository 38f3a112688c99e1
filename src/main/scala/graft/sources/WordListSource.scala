package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 word-list source (`graft-words`): one lowercased word per
  * row from line-delimited dictionary files — the reference's dictionary
  * load (main.go:75–96) as a first-class pluggable source instead of a
  * helper function. `spark.read.format("graft-words").load(path)` where
  * path is a file or a directory of files; each FILE is one input
  * partition, so a directory of dictionaries reads in parallel and a
  * 1000-executor cluster schedules them independently — the same
  * file-granularity parallelism the built-in text source uses.
  *
  * Deliberately read-only and schema-fixed: the point is the V2 plumbing
  * (TableProvider → Table → ScanBuilder → Batch → PartitionReader), not a
  * config surface. Sources.readWordList remains the composable
  * DataFrame-API twin; SourcesSpec proves they agree row-for-row.
  */
class WordListSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-words"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    WordListSource.Schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new WordListTable(properties.get("path"))
}

object WordListSource {
  val Schema: StructType = StructType(Seq(StructField("word", StringType, nullable = false)))
}

private[sources] class WordListTable(path: String) extends Table with SupportsRead {
  require(path != null && path.nonEmpty, "graft-words needs a path: .load(<file-or-dir>)")
  override def name(): String = s"graft-words($path)"
  override def schema(): StructType = WordListSource.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new WordListScanBuilder(path)
}

private[sources] class WordListScanBuilder(path: String)
    extends ScanBuilder with Scan with Batch {
  override def build(): Scan = this
  override def readSchema(): StructType = WordListSource.Schema
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] = {
    // local-filesystem reader by design: a remote scheme would silently
    // fall through to `new File("hdfs://...")`, so reject it loudly
    // (prefix match, not URI.create — plain paths with spaces aren't URIs)
    require("^[a-zA-Z][a-zA-Z0-9+.-]*://".r.findFirstIn(path).isEmpty,
      s"graft-words reads plain local paths only, got '$path'")
    val p = new java.io.File(path)
    val files =
      if (p.isDirectory) {
        val listed = p.listFiles() // null on permission failure / races
        require(listed != null, s"cannot list word-list directory $path")
        listed.filter(_.isFile).map(_.getPath).sorted
      } else {
        require(p.isFile, s"word-list path $path does not exist")
        Array(path)
      }
    files.map(f => WordListPartition(f): InputPartition)
  }
  override def createReaderFactory(): PartitionReaderFactory = new WordListReaderFactory
}

private[sources] case class WordListPartition(file: String) extends InputPartition

private[sources] class WordListReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val file = partition.asInstanceOf[WordListPartition].file
    new PartitionReader[InternalRow] {
      private val source = scala.io.Source.fromFile(file, "UTF-8")
      private val it = source.getLines().map(_.trim).filter(_.nonEmpty)
      private var current: String = _
      override def next(): Boolean = { val has = it.hasNext; if (has) current = it.next(); has }
      override def get(): InternalRow =
        InternalRow(UTF8String.fromString(current.toLowerCase(java.util.Locale.ROOT)))
      override def close(): Unit = source.close()
    }
  }
}
