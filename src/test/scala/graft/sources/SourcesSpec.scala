package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.types._

case class Rec(page: Int, i: Int)

class SourcesSpec extends SparkSpec {
  import spark.implicits._

  test("CsvSource.requireColumns passes when present, throws listing missing") {
    val df = Seq((1, "a")).toDF("id", "name")
    assert(CsvSource.requireColumns(df, Seq("id", "name")) eq df)
    val e = intercept[CsvSource.ContractViolation] {
      CsvSource.requireColumns(df, Seq("id", "missing_one", "missing_two"))
    }
    assert(e.getMessage.contains("missing_one"))
    assert(e.getMessage.contains("missing_two"))
  }

  test("CsvSource round-trips a table through disk with explicit schema") {
    val dir = "/root/repo/target/qtmp/test_csv"
    val df = Seq((1, "x,with,commas", 1.5), (2, "quote\"inside", -0.25))
      .toDF("id", "s", "v")
    df.write.mode("overwrite").option("header", "true").csv(dir)
    val schema = StructType(Seq(StructField("id", IntegerType),
      StructField("s", StringType), StructField("v", DoubleType)))
    val back = CsvSource.read(spark, dir, schema, required = Seq("id", "s", "v"),
      requireRows = true)
    assert(back.as[(Int, String, Double)].collect().toSet ==
      Set((1, "x,with,commas", 1.5), (2, "quote\"inside", -0.25)))
  }

  test("CsvSource.requireNonEmpty throws on empty input") {
    val empty = Seq.empty[(Int, String)].toDF("id", "s")
    intercept[CsvSource.ContractViolation] {
      CsvSource.requireNonEmpty(empty, "test")
    }
  }

  test("RestSource.paged stops on the first empty page") {
    val fetched = scala.collection.mutable.ArrayBuffer[Int]()
    def fetch(p: Int): Seq[Rec] = {
      fetched += p
      if (p >= 3) Nil else (0 until 5).map(Rec(p, _))
    }
    val ds = RestSource.paged(spark, fetch)
    assert(ds.count() == 15)
    assert(fetched.toSeq == Seq(0, 1, 2, 3)) // probed exactly one empty page
  }

  test("RestSource.paged rides out transient page failures via retry") {
    val failedOnce = scala.collection.mutable.Set[Int]()
    def flaky(p: Int): Seq[Rec] = {
      if (failedOnce.add(p)) sys.error(s"transient fault on page $p")
      if (p >= 3) Nil else (0 until 5).map(Rec(p, _))
    }
    val ds = RestSource.paged(spark, flaky, maxRetries = 2, retryDelayMs = 1)
    assert(ds.count() == 15) // all pages recovered, nothing dropped
    assert(failedOnce == Set(0, 1, 2, 3))
  }

  test("RestSource.withRetry retries then succeeds; exhausts -> throws") {
    var n = 0
    val v = RestSource.withRetry(maxRetries = 3, delayMs = 1) {
      n += 1; if (n < 3) sys.error("flaky") else 42
    }
    assert(v == 42 && n == 3)
    intercept[RuntimeException] {
      RestSource.withRetry(maxRetries = 1, delayMs = 1) { sys.error("always") }
    }
  }

  test("JdbcSink DDL statement construction mirrors the reference protocol") {
    assert(JdbcSink.dropTableSql("DIM_Peak") == "DROP TABLE IF EXISTS [DIM_Peak]")
    assert(JdbcSink.setPrimaryKeySql("DIM_Peak", "Id", "VARCHAR(255)") == Seq(
      "ALTER TABLE [DIM_Peak] ALTER COLUMN [Id] VARCHAR(255) NOT NULL",
      "ALTER TABLE [DIM_Peak] ADD CONSTRAINT [PK_DIM_Peak] PRIMARY KEY ([Id])"))
    assert(JdbcSink.setForeignKeySql("FACT", "PeakId", "DIM_Peak", "Id")
      .contains("FOREIGN KEY ([PeakId]) REFERENCES [DIM_Peak] ([Id])"))
    assert(JdbcSink.sqlServerType(IntegerType) == "INT")
    assert(JdbcSink.sqlServerType(DecimalType(18, 4)) == "DECIMAL(18,4)")
    assert(JdbcSink.sqlServerType(StringType) == "VARCHAR(255)")
  }
}
