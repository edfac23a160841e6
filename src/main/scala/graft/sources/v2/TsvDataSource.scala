package graft.sources.v2

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import java.util.{Map => JMap}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.write._
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
  *   - byte-range splits — each file is planned as
  *     ceil(size / split_bytes) `InputPartition`s (Hadoop text-split
  *     rule: a split seeks to start-1 and discards through the first
  *     newline, so every line is read exactly once, by the split
  *     where it STARTS; the split containing byte 0 skips the header
  *     line instead). One 10 GB file therefore fans out across
  *     executors rather than pinning one task — the property a 100 TB
  *     file source must have. `split_bytes` is a read option so tests
  *     can force multi-split plans on small files (a production
  *     source would add a Hadoop `FileIndex` for distributed listing).
  *
  * Usage: `spark.read.format(classOf[TsvDataSource].getName).load(dir)`.
  */
class TsvDataSource extends TableProvider {

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    // a fresh WRITE target has no files to infer from: return the
    // empty schema and let the write builder adopt the query schema
    // (reading such a dir yields an empty zero-column frame)
    val files = TsvFormat.listFiles(options.get("path"))
    if (files.isEmpty) new StructType() else TsvFormat.inferSchema(files)
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: JMap[String, String]): Table = {
    val splitBytes = Option(properties.get("split_bytes")).map { v =>
      val n = try v.toLong catch {
        case _: NumberFormatException => throw new IllegalArgumentException(
          s"split_bytes must be a positive integer, got '$v'")
      }
      require(n > 0, s"split_bytes must be positive, got $n")
      n
    }.getOrElse(TsvFormat.DefaultSplitBytes)
    new TsvTable(schema, properties.get("path"), splitBytes)
  }

  override def supportsExternalMetadata(): Boolean = true
}

private[v2] object TsvFormat {
  /** 32 MB default split: small enough that a handful of files keeps
    * every core busy, large enough that per-task overhead stays
    * negligible (same order as parquet's maxPartitionBytes). */
  val DefaultSplitBytes: Long = 32L * 1024 * 1024

  def listFiles(path: String): Seq[String] = {
    require(path != null, "path option is required")
    val p = Paths.get(path)
    if (Files.isDirectory(p)) {
      val stream = Files.list(p)
      try stream.iterator().asScala
        .filter(f => f.toString.endsWith(".tsv")).map(_.toString).toSeq.sorted
      finally stream.close()
    } else if (Files.exists(p)) Seq(p.toString)
    else Seq.empty // a fresh write target
  }

  def inferSchema(files: Seq[String]): StructType = {
    require(files.nonEmpty, "no .tsv files found")
    val lines = Files.lines(Paths.get(files.head))
    val header = try lines.findFirst().orElseThrow() finally lines.close()
    StructType(header.split('\t').toSeq.map { cell =>
      val (name, tpe) = cell.split(':') match {
        case Array(n, t) => (n, t)
        case _ => throw new IllegalArgumentException(
          s"malformed header cell '$cell', expected name:type")
      }
      StructField(name, tpe match {
        case "int"    => IntegerType
        case "long"   => LongType
        case "double" => DoubleType
        case "string" => StringType
        case other    => throw new IllegalArgumentException(s"unsupported type $other")
      })
    })
  }

  /** Header type tag for a field — inverse of [[inferSchema]]'s map. */
  def typeName(dt: DataType): String = dt match {
    case IntegerType => "int"
    case LongType    => "long"
    case DoubleType  => "double"
    case StringType  => "string"
    case other       => throw new IllegalArgumentException(s"unsupported type $other")
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

private[v2] class TsvTable(tableSchema: StructType, path: String, splitBytes: Long)
    extends Table with SupportsRead with SupportsWrite {
  override def name(): String = s"tsv:$path"
  override def schema(): StructType = tableSchema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.BATCH_WRITE, TableCapability.TRUNCATE)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new TsvScanBuilder(tableSchema, path, splitBytes)
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    // a fresh target (empty inferred schema) adopts the query schema;
    // appends to an existing table must match its NAMES and TYPES —
    // silent schema drift is how a header-typed format dies. Only
    // names+types: full StructType equality also compares nullability
    // and metadata, and a computed frame with non-nullable fields
    // (aggregate outputs) must still append to an inferred
    // all-nullable table (ADVICE r7)
    def shape(st: StructType): Seq[(String, org.apache.spark.sql.types.DataType)] =
      st.fields.map(f => (f.name, f.dataType)).toSeq
    if (tableSchema.nonEmpty)
      require(shape(info.schema()) == shape(tableSchema),
        s"write schema ${info.schema().simpleString} != table ${tableSchema.simpleString}")
    new TsvWriteBuilder(info.schema(), path)
  }
}

/** Write path: each task streams rows to a `.tsv.tmp-<uuid>` file and
  * reports it in its commit message; files become visible only when
  * the DRIVER commit renames every temp to its final `.tsv` name —
  * the standard two-phase commit that makes a failed/speculative task
  * invisible (its temp is deleted on abort) and an aborted job leave
  * the directory untouched. `truncate()` (the OVERWRITE mode hook)
  * publishes every new file FIRST and only then deletes the
  * pre-existing `.tsv` files (captured before publishing; temp-derived
  * names are UUID-unique so no collision is possible): a crash at any
  * point can leave old and new data visible TOGETHER, but never loses
  * the old data — duplicate visibility is recoverable, deletion-first
  * (the r7 ADVICE finding) is not. */
private[v2] class TsvWriteBuilder(schema: StructType, path: String)
    extends WriteBuilder with SupportsTruncate {
  private var doTruncate = false
  override def truncate(): WriteBuilder = { doTruncate = true; this }
  override def build(): Write = new Write {
    override def toBatch: BatchWrite = new TsvBatchWrite(schema, path, doTruncate)
  }
}

private[v2] final case class TsvCommitMessage(tmpFile: String)
    extends WriterCommitMessage

private[v2] class TsvBatchWrite(schema: StructType, path: String,
                                truncate: Boolean) extends BatchWrite {
  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory = {
    Files.createDirectories(Paths.get(path))
    new TsvWriterFactory(schema, path)
  }
  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val dir = Paths.get(path)
    // capture the old files BEFORE publishing so the fresh ones can
    // never be swept up in the delete
    val olds =
      if (truncate) TsvFormat.listFiles(path) else Seq.empty
    // stage 1 complete (every temp exists) → publish new, THEN drop
    // old: a crash between the two leaves old+new visible (benign,
    // recoverable) instead of a directory missing its old data
    messages.foreach { case TsvCommitMessage(tmp) =>
      val t = Paths.get(tmp)
      Files.move(t, dir.resolve(t.getFileName.toString.stripSuffix(".tmp") + ".tsv"))
    }
    olds.foreach(f => Files.deleteIfExists(Paths.get(f)))
  }
  override def abort(messages: Array[WriterCommitMessage]): Unit =
    messages.foreach {
      case TsvCommitMessage(tmp) => Files.deleteIfExists(Paths.get(tmp))
      case _ => ()
    }
}

private[v2] class TsvWriterFactory(schema: StructType, path: String)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new TsvDataWriter(schema, path, partitionId, taskId)
}

private[v2] class TsvDataWriter(schema: StructType, path: String,
                                partitionId: Int, taskId: Long)
    extends DataWriter[InternalRow] {
  private val tmp = Paths.get(path).resolve(
    f"part-$partitionId%05d-$taskId-${java.util.UUID.randomUUID().toString.take(8)}.tmp")
  private val out = new java.io.BufferedWriter(new java.io.OutputStreamWriter(
    Files.newOutputStream(tmp), StandardCharsets.UTF_8))
  out.write(schema.fields.map(f => s"${f.name}:${TsvFormat.typeName(f.dataType)}")
    .mkString("\t"))
  out.write("\n")

  override def write(row: InternalRow): Unit = {
    val cells = schema.fields.zipWithIndex.map { case (f, i) =>
      if (row.isNullAt(i)) ""
      else f.dataType match {
        case IntegerType => row.getInt(i).toString
        case LongType    => row.getLong(i).toString
        case DoubleType  => row.getDouble(i).toString
        case StringType  =>
          val s = row.getUTF8String(i).toString
          require(!s.exists(c => c == '\t' || c == '\n' || c == '\r'),
            s"string cell contains a TSV delimiter: '$s'")
          s
        case other => throw new IllegalStateException(s"unreachable: $other")
      }
    }
    out.write(cells.mkString("\t"))
    out.write("\n")
  }
  override def commit(): WriterCommitMessage = {
    out.close()
    TsvCommitMessage(tmp.toString)
  }
  override def abort(): Unit = {
    out.close()
    Files.deleteIfExists(tmp); ()
  }
  override def close(): Unit = ()
}

private[v2] class TsvScanBuilder(tableSchema: StructType, path: String, splitBytes: Long)
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

  override def build(): Scan =
    new TsvScan(tableSchema, required, pushed, path, splitBytes)
}

/** One byte range [start, end) of one file. */
private[v2] case class TsvInputPartition(file: String, start: Long, end: Long)
    extends InputPartition

private[v2] class TsvScan(tableSchema: StructType, required: StructType,
                          pushed: Array[Filter], path: String, splitBytes: Long)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"TsvScan(path=$path, read=${required.fieldNames.mkString(",")}, " +
      s"pushed=[${pushed.mkString(", ")}])"
  override def planInputPartitions(): Array[InputPartition] =
    TsvFormat.listFiles(path).flatMap { f =>
      // validate every file's header ONCE, at planning time on the
      // driver: fail-fast with the header-mismatch message before any
      // task launches — per-split reader checks either multiplied the
      // header IO by the split count (round-4 review #1) or, checked
      // only in split 0, let data splits of a drifted file misparse
      // rows first (review #2)
      val header = TsvFormat.inferSchema(Seq(f))
      require(header == tableSchema,
        s"file $f header ${header.simpleString} != table ${tableSchema.simpleString}")
      val size = Files.size(Paths.get(f))
      val n = math.max(1L, (size + splitBytes - 1) / splitBytes)
      (0L until n).map(k =>
        TsvInputPartition(f, k * splitBytes, math.min((k + 1) * splitBytes, size)))
    }.toArray
  override def createReaderFactory(): PartitionReaderFactory =
    new TsvReaderFactory(tableSchema, required, pushed)
}

private[v2] class TsvReaderFactory(tableSchema: StructType,
                                   required: StructType,
                                   pushed: Array[Filter])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val part = partition.asInstanceOf[TsvInputPartition]
    val file = part.file
    new PartitionReader[InternalRow] {
      // header consistency is validated at planning time (once per
      // file, on the driver) — see planInputPartitions
      private val in = new java.io.BufferedInputStream(
        new java.io.FileInputStream(file))
      private var pos = 0L
      private val buf = new java.io.ByteArrayOutputStream(256)

      /** next raw line as UTF-8 (sans newline), advancing `pos` past
        * its terminator; null at EOF. Byte-counted by hand because
        * BufferedReader hides offsets and multibyte chars break any
        * chars-to-bytes guess. */
      private def readRawLine(): String = {
        var b = in.read()
        if (b == -1) return null
        buf.reset()
        while (b != -1 && b != '\n') { buf.write(b); pos += 1; b = in.read() }
        if (b == '\n') pos += 1
        val s = new String(buf.toByteArray, StandardCharsets.UTF_8)
        if (s.endsWith("\r")) s.substring(0, s.length - 1) else s
      }

      // Position at the first line this split owns. The split holding
      // byte 0 consumes the header; any other seeks to start-1 and
      // discards through the first newline — the straddling line
      // belongs to the split where it starts, so each line is read
      // exactly once across splits regardless of boundary placement.
      if (part.start == 0) readRawLine()
      else { in.skipNBytes(part.start - 1); pos = part.start - 1; readRawLine() }

      private val outIdx = required.fieldNames.map(tableSchema.fieldIndex)
      // parse ONLY the columns the scan needs: the pruned projection
      // plus any column a pushed filter references — this is what makes
      // SupportsPushDownRequiredColumns an actual saving here, not just
      // a narrower output row
      private val neededIdx: Array[Int] =
        (outIdx ++ pushed.flatMap(_.references.map(tableSchema.fieldIndex)))
          .distinct.sorted
      private var row: Array[Any] = _

      override def next(): Boolean = {
        // a line STARTING at or past `end` belongs to the next split
        while (pos < part.end) {
          val lineStart = pos
          val line = readRawLine()
          if (line == null) return false
          val cells = line.split("\t", -1)
          if (cells.length != tableSchema.length)
            throw new IllegalStateException(
              s"$file@$lineStart: expected ${tableSchema.length} cells, got ${cells.length}")
          row = new Array[Any](tableSchema.length)
          neededIdx.foreach { i =>
            row(i) = TsvFormat.parse(cells(i), tableSchema(i).dataType)
          }
          if (pushed.forall(TsvFormat.eval(_, tableSchema, row))) return true
        }
        false
      }
      override def get(): InternalRow =
        InternalRow.fromSeq(outIdx.map(row).toSeq)
      override def close(): Unit = in.close()
    }
  }
}
