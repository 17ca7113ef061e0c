package graft.cj

import java.util.{Map => JMap}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader,
  PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 batch source for CityJSON corpora — the Spark-native form
  * of the reference's JSON file source (SURVEY §2.1 S1):
  *
  * {{{ spark.read.format("cityjson").load("/data/cities") }}}
  *
  * yields one row per emitted triple, `(doc_iri, subj, pred, obj_iri,
  * obj_lit, obj_type)`, converted on EXECUTORS (one input partition per
  * document file, so a city corpus parallelizes by document exactly like
  * the binaryFile + mapPartitions path it complements). Column pruning is
  * pushed into the reader (`SupportsPushDownRequiredColumns`): a
  * `select(pred)` materializes only the pruned columns per row.
  * Conversion semantics are [[CjConvert]] — identical to every other entry
  * point (spec-locked against `CjSpark.convert`); doc-level failures
  * follow the reference's NULL-model contract and emit zero rows.
  */
class CityJsonSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "cityjson"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = CityJsonSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table =
    new CityJsonTable(Option(properties.get("path")).getOrElse(
      throw new IllegalArgumentException("cityjson source needs a path: .load(<dir>)")))
}

object CityJsonSource {
  val schema: StructType = StructType(Seq(
    StructField("doc_iri", StringType, nullable = false),
    StructField("subj", StringType, nullable = false),
    StructField("pred", StringType, nullable = false),
    StructField("obj_iri", StringType, nullable = true),
    StructField("obj_lit", StringType, nullable = true),
    StructField("obj_type", StringType, nullable = true)))

  private[cj] def docIriFor(path: String): String = {
    val name = path.substring(path.lastIndexOf('/') + 1)
    s"cj:${name.stripSuffix(".city.json").stripSuffix(".json")}"
  }
}

final class CityJsonTable(path: String) extends Table with SupportsRead {
  override def name(): String = s"cityjson:$path"
  override def schema(): StructType = CityJsonSource.schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new CityJsonScanBuilder(path)
}

final class CityJsonScanBuilder(path: String)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = CityJsonSource.schema
  override def pruneColumns(requiredSchema: StructType): Unit = required = requiredSchema
  override def build(): Scan = new CityJsonScan(path, required)
}

final class CityJsonScan(path: String, required: StructType) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] = {
    // driver-side listing only — file CONTENT is read on executors
    val hadoopPath = new org.apache.hadoop.fs.Path(path)
    val fs = hadoopPath.getFileSystem(
      org.apache.spark.sql.SparkSession.active.sparkContext.hadoopConfiguration)
    val files =
      if (fs.getFileStatus(hadoopPath).isDirectory)
        fs.listStatus(hadoopPath).toSeq.filter(s => s.isFile && s.getPath.getName.endsWith(".json"))
      else Seq(fs.getFileStatus(hadoopPath))
    files.sortBy(_.getPath.toString)
      .map(s => CityJsonFilePartition(s.getPath.toString): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new CityJsonReaderFactory(required.fieldNames)
}

final case class CityJsonFilePartition(filePath: String) extends InputPartition

final class CityJsonReaderFactory(fields: Array[String]) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val filePath = partition.asInstanceOf[CityJsonFilePartition].filePath
    new PartitionReader[InternalRow] {
      private var current: InternalRow = _
      private lazy val rows: Iterator[InternalRow] = {
        val p = new org.apache.hadoop.fs.Path(filePath)
        val fs = p.getFileSystem(new org.apache.hadoop.conf.Configuration())
        val in = fs.open(p)
        val json = try new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
          finally in.close()
        val docIri = CityJsonSource.docIriFor(filePath)
        val docUtf8 = UTF8String.fromString(docIri)
        def u(s: String): AnyRef = if (s == null) null else UTF8String.fromString(s)
        CjConvert.convert(docIri, json).triples.iterator.map { t =>
          InternalRow.fromSeq(fields.toIndexedSeq.map {
            case "doc_iri" => docUtf8
            case "subj" => u(t.subj)
            case "pred" => u(t.pred)
            case "obj_iri" => u(t.obj_iri)
            case "obj_lit" => u(t.obj_lit)
            case "obj_type" => u(t.obj_type)
            case other => throw new IllegalArgumentException(s"unknown column $other")
          })
        }
      }
      override def next(): Boolean =
        if (rows.hasNext) { current = rows.next(); true } else false
      override def get(): InternalRow = current
      override def close(): Unit = ()
    }
  }
}
