package graft.sources.v2

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import java.util.{Map => JMap}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, IsNotNull, LessThan}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 exhibit: a typed-TSV "workbook" reader.
  *
  * Stands in for the one reference ingest operator with no runnable
  * Spark analog in this container — the Excel workbook read
  * (`/root/reference/dags/bronze/dag_bronze_financial_sample.py:154`,
  * `dags/silver/dag_silver_financial_sample.py:43`; spark-excel is
  * unavailable offline). The format is deliberately simple (first line
  * `name:type<TAB>name:type`, then TSV rows, empty cell = null) so the
  * exhibit's weight sits in the CONNECTOR mechanics a custom source
  * must get right, all of which are real here:
  *
  *   - `TableProvider.inferSchema` — schema from the typed header;
  *   - `SupportsPushDownRequiredColumns` — column pruning reaches the
  *     reader (unread columns are never parsed, the V2 analog of
  *     parquet's ReadSchema);
  *   - `SupportsPushDownFilters` — =, >, <, IS NOT NULL evaluate
  *     inside the partition reader; unsupported filters stay residual;
  *   - one `InputPartition` per file → readers run in parallel across
  *     executors (a production file source would further split large
  *     files by byte range and use a Hadoop `FileIndex` for listing —
  *     out of scope for the exhibit, noted for the 100 TB story).
  *
  * Usage: `spark.read.format(classOf[TsvDataSource].getName).load(dir)`.
  */
class TsvDataSource extends TableProvider {

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    TsvFormat.inferSchema(TsvFormat.listFiles(options.get("path")))

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: JMap[String, String]): Table =
    new TsvTable(schema, properties.get("path"))

  override def supportsExternalMetadata(): Boolean = true
}

private[v2] object TsvFormat {
  def listFiles(path: String): Seq[String] = {
    require(path != null, "path option is required")
    val p = Paths.get(path)
    if (Files.isDirectory(p)) {
      val stream = Files.list(p)
      try stream.iterator().asScala
        .filter(f => f.toString.endsWith(".tsv")).map(_.toString).toSeq.sorted
      finally stream.close()
    } else Seq(p.toString)
  }

  def inferSchema(files: Seq[String]): StructType = {
    require(files.nonEmpty, "no .tsv files found")
    val lines = Files.lines(Paths.get(files.head))
    val header = try lines.findFirst().orElseThrow() finally lines.close()
    StructType(header.split('\t').toSeq.map { cell =>
      val Array(name, tpe) = cell.split(':')
      StructField(name, tpe match {
        case "int"    => IntegerType
        case "long"   => LongType
        case "double" => DoubleType
        case "string" => StringType
        case other    => throw new IllegalArgumentException(s"unsupported type $other")
      })
    })
  }

  def parse(raw: String, dt: DataType): Any =
    if (raw.isEmpty) null
    else dt match {
      case IntegerType => raw.toInt
      case LongType    => raw.toLong
      case DoubleType  => raw.toDouble
      case StringType  => UTF8String.fromString(raw)
      case other       => throw new IllegalStateException(s"unreachable: $other")
    }

  /** evaluate a pushed filter against a parsed row. Comparison result
    * is Option[-1|0|1] — None for null operands, and compareTo results
    * are signum-normalized (raw String.compareTo returns arbitrary
    * char-code differences, so ANY in-band integer sentinel would
    * collide with a legitimate comparison value). */
  def eval(f: Filter, schema: StructType, row: Array[Any]): Boolean = {
    def v(attr: String): Any = row(schema.fieldIndex(attr))
    def cmp(attr: String, value: Any): Option[Int] = {
      val x = v(attr)
      if (x == null) return None // comparisons with null are false
      (x, value) match {
        case (a: Int, b: Number)    => Some(java.lang.Integer.compare(a, b.intValue()))
        case (a: Long, b: Number)   => Some(java.lang.Long.compare(a, b.longValue()))
        case (a: Double, b: Number) => Some(java.lang.Double.compare(a, b.doubleValue()))
        case (a: UTF8String, b)     => Some(Integer.signum(a.toString.compareTo(b.toString)))
        case _                      => None
      }
    }
    f match {
      case EqualTo(a, value)     => cmp(a, value).contains(0)
      case GreaterThan(a, value) => cmp(a, value).exists(_ > 0)
      case LessThan(a, value)    => cmp(a, value).exists(_ < 0)
      case IsNotNull(a)          => v(a) != null
      case _                     => true // never pushed; defensive
    }
  }

  def supported(f: Filter): Boolean = f match {
    case _: EqualTo | _: GreaterThan | _: LessThan | _: IsNotNull => true
    case _ => false
  }
}

private[v2] class TsvTable(tableSchema: StructType, path: String)
    extends Table with SupportsRead {
  override def name(): String = s"tsv:$path"
  override def schema(): StructType = tableSchema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new TsvScanBuilder(tableSchema, path)
}

private[v2] class TsvScanBuilder(tableSchema: StructType, path: String)
    extends ScanBuilder
    with SupportsPushDownRequiredColumns with SupportsPushDownFilters {
  private var required: StructType = tableSchema
  private var pushed: Array[Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (ours, residual) = filters.partition(TsvFormat.supported)
    pushed = ours
    residual
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan = new TsvScan(tableSchema, required, pushed, path)
}

private[v2] case class TsvInputPartition(file: String) extends InputPartition

private[v2] class TsvScan(tableSchema: StructType, required: StructType,
                          pushed: Array[Filter], path: String)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"TsvScan(path=$path, read=${required.fieldNames.mkString(",")}, " +
      s"pushed=[${pushed.mkString(", ")}])"
  override def planInputPartitions(): Array[InputPartition] =
    TsvFormat.listFiles(path).map(TsvInputPartition.apply).toArray
  override def createReaderFactory(): PartitionReaderFactory =
    new TsvReaderFactory(tableSchema, required, pushed)
}

private[v2] class TsvReaderFactory(tableSchema: StructType,
                                   required: StructType,
                                   pushed: Array[Filter])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val file = partition.asInstanceOf[TsvInputPartition].file
    new PartitionReader[InternalRow] {
      private val lines = Files.newBufferedReader(
        Paths.get(file), StandardCharsets.UTF_8)
      private val header = TsvFormat.inferSchema(Seq(file))
      require(header == tableSchema,
        s"file $file header ${header.simpleString} != table ${tableSchema.simpleString}")
      private val outIdx = required.fieldNames.map(tableSchema.fieldIndex)
      // parse ONLY the columns the scan needs: the pruned projection
      // plus any column a pushed filter references — this is what makes
      // SupportsPushDownRequiredColumns an actual saving here, not just
      // a narrower output row
      private val neededIdx: Array[Int] =
        (outIdx ++ pushed.flatMap(_.references.map(tableSchema.fieldIndex)))
          .distinct.sorted
      lines.readLine() // consume the header line
      private var row: Array[Any] = _
      private var lineNo = 1L

      override def next(): Boolean = {
        var line = lines.readLine()
        while (line != null) {
          lineNo += 1
          val cells = line.split("\t", -1)
          if (cells.length != tableSchema.length)
            throw new IllegalStateException(
              s"$file:$lineNo: expected ${tableSchema.length} cells, got ${cells.length}")
          row = new Array[Any](tableSchema.length)
          neededIdx.foreach { i =>
            row(i) = TsvFormat.parse(cells(i), tableSchema(i).dataType)
          }
          if (pushed.forall(TsvFormat.eval(_, tableSchema, row))) return true
          line = lines.readLine()
        }
        false
      }
      override def get(): InternalRow =
        InternalRow.fromSeq(outIdx.map(row).toSeq)
      override def close(): Unit = lines.close()
    }
  }
}
