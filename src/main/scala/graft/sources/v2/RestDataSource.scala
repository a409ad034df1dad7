package graft.sources.v2

import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import java.util.{Map => JMap}
import scala.jdk.CollectionConverters._

/** One fetched record in the World-Bank-style long shape the reference's
  * REST extractor flattens to (`ops/extract.py:285-294`).
  */
final case class WbRecord(countryCode: String, countryName: String,
                          indicator: String, year: Int, value: Option[Double])

/** Executor-side page fetcher. Implementations must be constructible from a
  * zero-arg constructor (instantiated by class name INSIDE each partition
  * reader — the real one holds an HTTP client, created once per partition).
  */
trait PageFetcher extends Serializable {
  def fetch(page: Int): Seq[WbRecord]
}

/** Deterministic offline fetcher (stands in for the HTTP client in tests and
  * in this zero-egress environment; arithmetic is reproducible in any SQL
  * engine for oracle checks).
  */
final class FakeWbFetcher extends PageFetcher {
  override def fetch(page: Int): Seq[WbRecord] =
    (0 until 25).map { i =>
      val id = page * 25 + i
      WbRecord(
        countryCode = s"C${id % 5}",
        countryName = s"Country ${id % 5}",
        indicator = s"IND${id % 3}",
        year = 2000 + id % 10,
        value = if (id % 7 == 0) None else Some((id * 31 % 997) / 10.0))
    }
}

/** DataSource V2 batch source for paged REST-style APIs — the scale path of
  * SURVEY §2.1/S5: instead of staging every page through the driver
  * ([[graft.sources.RestSource.paged]]), each Spark InputPartition owns a
  * contiguous page range and fetches it executor-side, so ingest parallelism
  * is `ceil(pages / pagesPerPartition)` and the driver never materializes a
  * row.
  *
  * Usage:
  * {{{
  * spark.read.format("graft-rest")
  *   .option("pages", 40)            // total pages to fetch
  *   .option("pagesPerPartition", 8) // fan-out granularity
  *   .option("fetcher", classOf[FakeWbFetcher].getName)
  *   .load()
  * }}}
  */
class RestDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-rest"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    RestDataSource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: JMap[String, String]): Table =
    new RestTable(new CaseInsensitiveStringMap(properties))
}

object RestDataSource {
  val schema: StructType = StructType(Seq(
    StructField("country_code", StringType, nullable = false),
    StructField("country_name", StringType, nullable = false),
    StructField("indicator", StringType, nullable = false),
    StructField("year", IntegerType, nullable = false),
    StructField("value", DoubleType, nullable = true)))
}

private class RestTable(options: CaseInsensitiveStringMap)
    extends Table with SupportsRead {
  override def name(): String = "graft_rest"
  override def schema(): StructType = RestDataSource.schema
  override def capabilities(): java.util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(opts: CaseInsensitiveStringMap): ScanBuilder =
    new RestScan(opts)
}

private class RestScan(options: CaseInsensitiveStringMap)
    extends ScanBuilder with Scan with Batch {
  private val pages = options.getInt("pages", 1)
  private val pagesPerPartition = options.getInt("pagesPerPartition", 8)
  private val fetcherClass =
    options.getOrDefault("fetcher", classOf[FakeWbFetcher].getName)
  private val maxRetries = options.getInt("maxRetries", 3)
  private val retryDelayMs = options.getLong("retryDelayMs", 1000L)

  override def build(): Scan = this
  override def readSchema(): StructType = RestDataSource.schema
  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] =
    (0 until pages by pagesPerPartition).map { start =>
      RestInputPartition(start, math.min(start + pagesPerPartition, pages),
        fetcherClass, maxRetries, retryDelayMs)
        .asInstanceOf[InputPartition]
    }.toArray

  override def createReaderFactory(): PartitionReaderFactory =
    new RestReaderFactory
}

private case class RestInputPartition(startPage: Int, endPage: Int,
                                      fetcherClass: String,
                                      maxRetries: Int = 3,
                                      retryDelayMs: Long = 1000L) extends InputPartition

private class RestReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[RestInputPartition]
    // fetcher (HTTP client in real life) instantiated once per partition
    val fetcher = Class.forName(p.fetcherClass)
      .getDeclaredConstructor().newInstance().asInstanceOf[PageFetcher]
    // per-page retry with exponential backoff: cheaper than a Spark task
    // retry, which would re-fetch the partition's every page
    val rows = (p.startPage until p.endPage).iterator
      .flatMap(page => graft.sources.RestSource.withRetry(
        p.maxRetries, p.retryDelayMs)(fetcher.fetch(page)))
    new PartitionReader[InternalRow] {
      private var current: WbRecord = _
      override def next(): Boolean = {
        if (rows.hasNext) { current = rows.next(); true } else false
      }
      override def get(): InternalRow =
        InternalRow(
          UTF8String.fromString(current.countryCode),
          UTF8String.fromString(current.countryName),
          UTF8String.fromString(current.indicator),
          current.year,
          current.value.map(Double.box).orNull)
      override def close(): Unit = ()
    }
  }
}
