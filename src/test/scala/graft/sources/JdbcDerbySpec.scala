package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

import java.sql.DriverManager

/** Executes the reference's warehouse load protocol (`ops/load.py:36-168`:
  * drop FKs → overwrite dims → PK → overwrite fact → column types → FKs)
  * against a LIVE embedded Apache Derby database — not statement-construction
  * unit checks but real DDL, with the resulting constraints enforced by the
  * engine (duplicate-PK and orphan-FK inserts must be rejected).
  */
class JdbcDerbySpec extends SparkSpec {
  import spark.implicits._
  import JdbcSink._

  private val cfg = JdbcConfig("jdbc:derby:memory:graftddl;create=true", "app", "app")
  private val dialect = DerbyDialect

  private def execRaw(sql: String): Unit = {
    val c = DriverManager.getConnection(cfg.url, cfg.user, cfg.password)
    try { val st = c.createStatement(); try st.execute(sql) finally st.close() }
    finally c.close()
  }

  test("full drop-recreate load protocol with PK/FK enforcement on live Derby") {
    val dim = Seq((1, "Everest"), (2, "K2"), (3, "Lhotse")).toDF("peak_id", "name")
    val fact = Seq((10, 1, 8848.0), (11, 1, 8844.4), (12, 3, 8516.0))
      .toDF("exp_id", "peak_id", "height")

    // fresh run: tear down in FK-safe order (fact before dim), like the
    // reference's drop_fks + drop_table preamble
    dropTable(cfg, "fact_exp", dialect)
    dropTable(cfg, "dim_peak", dialect)
    assert(!tableExists(cfg, "dim_peak", dialect))

    // dims first (ops/load.py loads dims, then PKs them)
    overwrite(dim, cfg, "dim_peak", columnTypes = "name VARCHAR(64)")
    assert(tableExists(cfg, "dim_peak", dialect))
    setPrimaryKey(cfg, "dim_peak", "peak_id", dialect.columnType(org.apache.spark.sql.types.IntegerType), dialect)

    // fact next, typed, then FK-wired to the dim
    overwrite(fact, cfg, "fact_exp", columnTypes = "")
    setPrimaryKey(cfg, "fact_exp", "exp_id", "INTEGER", dialect)
    setForeignKey(cfg, "fact_exp", "peak_id", "dim_peak", "peak_id", dialect)

    // live enforcement: duplicate PK rejected
    val dupPk = intercept[java.sql.SQLException](
      execRaw("INSERT INTO fact_exp VALUES (10, 2, 1.0)"))
    assert(dupPk.getSQLState.startsWith("23")) // integrity-constraint class

    // live enforcement: orphan FK rejected
    val orphan = intercept[java.sql.SQLException](
      execRaw("INSERT INTO fact_exp VALUES (99, 42, 1.0)"))
    assert(orphan.getSQLState.startsWith("23"))

    // a valid row passes and append() moves rows through Spark's JDBC writer
    append(Seq((13, 2, 8611.0)).toDF("exp_id", "peak_id", "height"),
      cfg, "fact_exp", batchSize = 2, numPartitions = 2)

    // parameterized pushed-down read (resources.py execute_query shape)
    val joined = readQuery(spark, cfg,
      """SELECT f."exp_id", d."name" FROM fact_exp f JOIN dim_peak d ON f."peak_id" = d."peak_id"""")
    assert(joined.count() == 4)
    assert(joined.filter(col("name") === "K2").count() == 1)

    // column-type evolution: widen the VARCHAR (set_type, resources.py:167)
    setColumnType(cfg, "dim_peak", "name", "VARCHAR(256)", dialect)
    execRaw("INSERT INTO dim_peak VALUES (4, '" + "x" * 100 + "')")

    // teardown order matters with live FKs: drop the constraint, then tables
    dropForeignKey(cfg, "fact_exp", "peak_id", dialect)
    dropTable(cfg, "fact_exp", dialect)
    dropTable(cfg, "dim_peak", dialect)
    assert(!tableExists(cfg, "fact_exp", dialect))
  }

  test("dropForeignKey on a fresh database is a guarded no-op (no IF EXISTS on Derby)") {
    // the reference protocol drops all FKs FIRST; on a fresh run the
    // constraint does not exist and Derby has no IF EXISTS — the probe must
    // swallow the preamble instead of throwing
    val t = Seq((1, 2)).toDF("a", "b")
    overwrite(t, cfg, "fresh_t")
    assert(!foreignKeyExists(cfg, "fresh_t", "b", dialect))
    dropForeignKey(cfg, "fresh_t", "b", dialect) // must not throw
    // and on a table that never existed at all
    dropForeignKey(cfg, "never_created_t", "b", dialect)
    dropTable(cfg, "fresh_t", dialect)
  }

  test("overwrite really drops and recreates (schema change survives)") {
    val v1 = Seq((1, "a")).toDF("id", "s")
    overwrite(v1, cfg, "reshape_t", columnTypes = "s VARCHAR(8)")
    val v2 = Seq((1, 2.5)).toDF("id", "d") // different schema entirely
    overwrite(v2, cfg, "reshape_t")
    val back = spark.read.jdbc(cfg.url, "reshape_t", cfg.props)
    assert(back.columns.map(_.toLowerCase).sorted.toSeq == Seq("d", "id"))
    dropTable(cfg, "reshape_t", dialect)
  }

  test("upsert: updates matched keys, inserts new ones, idempotent; PK stays clean") {
    dropTable(cfg, "ups_t", dialect)
    val base = Seq((1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0))
      .toDF("id", "tag", "v")
    overwrite(base, cfg, "ups_t", columnTypes = "tag VARCHAR(16)")
    setPrimaryKey(cfg, "ups_t", "id", "INTEGER", dialect)

    // batch: id=1 updated, id=4 and id=5 inserted, id=2 untouched
    val batch = Seq((1, "a2", 11.0), (4, "d", 40.0), (5, "e", 50.0))
      .toDF("id", "tag", "v")
    JdbcSink.upsert(batch, cfg, "ups_t", Seq("id"), dialect, numPartitions = 3)

    def state(): Set[(Int, String, Double)] =
      readQuery(spark, cfg, """SELECT "id", "tag", "v" FROM ups_t""")
        .as[(Int, String, Double)].collect().toSet
    assert(state() == Set((1, "a2", 11.0), (2, "b", 20.0), (3, "c", 30.0),
      (4, "d", 40.0), (5, "e", 50.0)))

    // idempotent: the same batch again must not duplicate or corrupt
    JdbcSink.upsert(batch, cfg, "ups_t", Seq("id"), dialect, numPartitions = 3)
    assert(state().size == 5)

    // composite-key form: key = (id, tag)
    dropTable(cfg, "ups_c", dialect)
    overwrite(Seq((1, "x", 1.0), (1, "y", 2.0)).toDF("id", "tag", "v"),
      cfg, "ups_c", columnTypes = "tag VARCHAR(16)")
    JdbcSink.upsert(Seq((1, "x", 9.0), (2, "x", 3.0)).toDF("id", "tag", "v"),
      cfg, "ups_c", Seq("id", "tag"), dialect)
    val got = readQuery(spark, cfg, """SELECT "id", "tag", "v" FROM ups_c""")
      .as[(Int, String, Double)].collect().toSet
    assert(got == Set((1, "x", 9.0), (1, "y", 2.0), (2, "x", 3.0)))
  }

  test("incremental pull: watermark deltas, no-op on no news, crash-replay idempotence") {
    val dir = java.nio.file.Files.createTempDirectory("jdbc-inc").toString
    try {
      dropTable(cfg, "inc_t", DerbyDialect)
      overwrite((1L to 5L).map(i => (i, s"r$i")).toDF("k", "tag"),
        cfg, "inc_t", columnTypes = "tag VARCHAR(16)")
      JdbcIncremental.init(spark, dir)
      assert(JdbcIncremental.pull(spark, cfg, "inc_t", "k", dir) == 5L)
      assert(JdbcIncremental.watermark(spark, dir) == 5L)
      // nothing new -> no-op, state untouched
      assert(JdbcIncremental.pull(spark, cfg, "inc_t", "k", dir) == 0L)
      assert(JdbcIncremental.watermark(spark, dir) == 5L)
      // the second pull's remote SQL only sees the delta
      append((6L to 8L).map(i => (i, s"r$i")).toDF("k", "tag"), cfg, "inc_t")
      assert(JdbcIncremental.pull(spark, cfg, "inc_t", "k", dir) == 3L)
      def lake() = JdbcIncremental.read(spark, dir)
        .select("k", "tag").as[(Long, String)].collect().toSet
      assert(lake() == (1L to 8L).map(i => (i, s"r$i")).toSet)
      // crash window: a landed-but-uncommitted pull partition (id = next
      // pull counter) must be invisible, and the real pull overwrites it
      Seq((99L, "ghost")).toDF("k", "tag").withColumn("pull", lit(2L))
        .write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
        .partitionBy("pull").parquet(s"$dir/data")
      assert(lake() == (1L to 8L).map(i => (i, s"r$i")).toSet,
        "uncommitted partition leaked into the lake")
      append(Seq((9L, "r9")).toDF("k", "tag"), cfg, "inc_t")
      assert(JdbcIncremental.pull(spark, cfg, "inc_t", "k", dir) == 1L)
      assert(lake() == (1L to 9L).map(i => (i, s"r$i")).toSet,
        "replayed pull must overwrite the ghost partition")
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    }
  }
}
