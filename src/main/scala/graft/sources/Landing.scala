package graft.sources

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.file.{Files, Path, Paths}
import java.time.Duration

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Ingest landing — the reference's bronze acquisition surface
  * (SURVEY.md §2A S1–S4) re-expressed for Spark.
  *
  * The reference GETs a workbook over HTTP with a 60 s timeout and
  * puts the bytes in an object store
  * (`dags/bronze/dag_bronze_financial_sample.py:40-94`). Spark has no
  * HTTP reader — acquisition is a *driver-side* concern (one small
  * control-plane download), and Spark takes over at the first
  * distributed step: `spark.read.schema(...)` over the landed path.
  * At cluster scale the landing target is an object store
  * (`s3a://bucket/...` via the Hadoop S3A connector with a MinIO
  * endpoint, exactly the reference's MinIO layout); the code below is
  * target-path agnostic. */
object Landing {

  /** S1: HTTP GET → landed file. Timeout mirrors the reference's 60 s
    * (`dags/bronze/dag_bronze_financial_sample.py:54`). */
  private lazy val client: HttpClient = HttpClient.newBuilder()
    .connectTimeout(Duration.ofSeconds(60))
    .followRedirects(HttpClient.Redirect.NORMAL)
    .build()

  def httpFetch(url: String, dest: Path, timeoutSeconds: Long = 60L): Path = {
    val req = HttpRequest.newBuilder(URI.create(url))
      .timeout(Duration.ofSeconds(timeoutSeconds))
      .GET().build()
    val resp = client.send(req, HttpResponse.BodyHandlers.ofByteArray())
    require(resp.statusCode() / 100 == 2, s"HTTP ${resp.statusCode()} from $url")
    Option(dest.getParent).foreach(Files.createDirectories(_))
    Files.write(dest, resp.body())
    dest
  }

  /** S3/S4 analog: schema-enforced scan of a landed file — the
    * engine's answer to the reference's infer-at-read drift
    * (SURVEY.md §1.4). */
  def readLanded(spark: SparkSession, path: Path, schema: StructType,
                 format: String = "csv", options: Map[String, String] = Map.empty)
      : DataFrame =
    spark.read.options(options).schema(schema).format(format)
      .load(path.toString)

  /** S2/S5 analog: land a DataFrame to a (object-store-shaped) path. */
  def writeLanded(df: DataFrame, path: String, format: String = "parquet"): Unit =
    df.write.mode("overwrite").format(format).save(path)

  /** S7: JDBC row sink. The reference loads Postgres with a driver-side
    * per-row INSERT loop (`dags/bronze/dag_bronze_financial_sample.py:160-179`)
    * — O(rows) round-trips from one process. Spark's equivalent is
    * `df.write.jdbc`: one connection PER PARTITION, rows sent via
    * `addBatch`/`executeBatch`, so load parallelism scales with the
    * cluster instead of being pinned to a single driver loop.
    * `columnTypes` mirrors the reference's explicit DDL
    * (`...py:110-129`) via `createTableColumnTypes`. */
  def jdbcLoad(df: DataFrame, url: String, table: String,
               columnTypes: Option[String] = None,
               mode: String = "overwrite",
               props: java.util.Properties = new java.util.Properties())
      : Unit = {
    val writer = df.write.mode(mode)
    columnTypes.foreach(ct => writer.option("createTableColumnTypes", ct))
    writer.jdbc(url, table, props)
  }

  /** Small-files compaction: rewrite a parquet directory into
    * ~`targetFileBytes` files. Streaming sinks and incremental loads
    * accrete small files; at 100 TB the file count (not the byte
    * count) is what kills scan planning (one FileIndex entry + one
    * task per file) and object-store metadata ops. Sizing from the
    * CURRENT directory bytes keeps output files near target without a
    * second pass over the data. The two-rename swap leaves a brief
    * window where the path is absent — on a shared posix filesystem,
    * quiesce readers first; on an object store / lakehouse the swap is
    * a metadata-catalog pointer update, which IS atomic. Operates on
    * one FLAT parquet directory; a partitionBy layout must be
    * compacted per leaf partition (preserving the layout and letting
    * each leaf get its own file count). */
  def compact(spark: SparkSession, path: String,
              targetFileBytes: Long = 128L * 1024 * 1024): Int = {
    // this implementation sizes and swaps via local filesystem calls;
    // a URI-schemed path (s3a://, hdfs://) would silently list nothing
    // and die with a misleading "no .parquet files" — reject it up
    // front (an object-store compact swaps a catalog pointer instead)
    require(!path.contains("://"),
      s"compact() operates on local filesystem paths; got '$path' — " +
        "object-store layouts compact via a metadata-catalog swap, not a rename")
    val dir = new java.io.File(path)
    val entries = Option(dir.listFiles()).getOrElse(Array.empty)
    require(!entries.exists(_.isDirectory),
      s"$path contains subdirectories (a partitioned layout?) — compact each leaf partition directory instead")
    val bytes = entries
      .filter(f => f.isFile && f.getName.endsWith(".parquet"))
      .map(_.length()).sum
    require(bytes > 0, s"no .parquet files found at $path")
    val nFiles = math.max(1, math.ceil(bytes.toDouble / targetFileBytes).toInt)
    val tmp = path.stripSuffix("/") + ".compact_tmp"
    spark.read.parquet(path).repartition(nFiles)
      .write.mode("overwrite").parquet(tmp)
    val dest = Paths.get(path)
    val old = Files.createTempDirectory(dir.getParentFile.toPath, ".pre_compact")
    Files.move(dest, old, java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    try Files.move(Paths.get(tmp), dest)
    catch { case e: Exception =>
      // the original data is intact in `old` — surface the recovery
      // path instead of stranding it in a hidden temp dir
      throw new IllegalStateException(
        s"compact swap failed after moving the original aside: " +
          s"restore it with `mv $old $path` (compacted data is at $tmp)", e)
    }
    // recursive: the pre-compact dir may hold partition subdirectories
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
      f.delete(); ()
    }
    rm(old.toFile)
    nFiles
  }

  /** S7 read-back twin (also the S3-from-RDBMS shape): predicate and
    * column pruning push through to the database as SQL. */
  def jdbcRead(spark: SparkSession, url: String, table: String,
               props: java.util.Properties = new java.util.Properties())
      : DataFrame =
    spark.read.jdbc(url, table, props)
}
