package graft.sources.v2

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Flaky executor-side fetcher: the FIRST fetch of every page throws, the
  * retry succeeds — exercises the per-page retry inside the partition reader
  * (zero-arg constructible; first-failure bookkeeping is JVM-wide, which is
  * exactly the visibility a local[n] test has).
  */
final class FlakyWbFetcher extends PageFetcher {
  private val inner = new FakeWbFetcher
  override def fetch(page: Int): Seq[WbRecord] = {
    if (FlakyWbFetcher.firstCall.putIfAbsent(page, java.lang.Boolean.TRUE) == null)
      throw new RuntimeException(s"transient fault on page $page")
    inner.fetch(page)
  }
}
object FlakyWbFetcher {
  val firstCall = new java.util.concurrent.ConcurrentHashMap[Int, java.lang.Boolean]()
}

class RestDataSourceSpec extends SparkSpec {

  private def read(pages: Int, perPartition: Int) =
    spark.read.format("graft-rest")
      .option("pages", pages)
      .option("pagesPerPartition", perPartition)
      .load()

  test("reads all pages with the declared schema") {
    val df = read(pages = 10, perPartition = 4)
    assert(df.columns.toSeq ==
      Seq("country_code", "country_name", "indicator", "year", "value"))
    assert(df.count() == 250) // 10 pages x 25 records
  }

  test("partitions by page range (executor-side fan-out)") {
    assert(read(10, 4).rdd.getNumPartitions == 3)  // ceil(10/4)
    assert(read(40, 8).rdd.getNumPartitions == 5)
    assert(read(1, 8).rdd.getNumPartitions == 1)
  }

  test("partition reader retries transient page faults and loses nothing") {
    FlakyWbFetcher.firstCall.clear()
    val df = spark.read.format("graft-rest")
      .option("pages", 6)
      .option("pagesPerPartition", 2)
      .option("fetcher", classOf[FlakyWbFetcher].getName)
      .option("retryDelayMs", 1)
      .load()
    assert(df.count() == 150) // every page failed once, retried, none lost
    assert(FlakyWbFetcher.firstCall.size() == 6)
  }

  test("values match the deterministic fetcher, including nulls") {
    val first = read(1, 1).orderBy("year", "value").collect()
    val direct = new FakeWbFetcher().fetch(0)
    assert(first.length == direct.size)
    assert(direct.count(_.value.isEmpty) ==
      read(1, 1).filter(col("value").isNull).count())
    // spot-check record id=1: C1 / IND1 / 2001 / 3.1
    val r1 = read(1, 1).filter(col("value") === 3.1).collect().head
    assert(r1.getString(0) == "C1" && r1.getInt(3) == 2001)
  }
}
