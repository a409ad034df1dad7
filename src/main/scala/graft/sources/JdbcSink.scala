package graft.sources

import org.apache.spark.sql.DataFrame

import java.sql.{Connection, DriverManager}

/** JDBC warehouse sink + DDL surface (reference: dw-etl
  * `himalayan_etl/resources.py:58-180` bulk_insert/table_exists/drop_table/
  * set_pk/set_fk/set_type/get_table_schema and `ops/load.py:36-168`
  * drop-and-recreate loads with PK/FK wiring).
  *
  * Bulk data movement goes through Spark's JDBC writer (one connection per
  * partition, `batchsize` rows per round-trip — the distributed version of the
  * reference's 50-row `to_sql` chunks); constraint DDL has no Spark
  * abstraction, so it runs as plain statements on a driver-side connection,
  * exactly like the reference's raw `ALTER TABLE` strings.
  *
  * No database ships in this container, so this surface is exercised by unit
  * tests only up to statement construction; the load protocol mirrors
  * `ops/load.py` 1:1 (drop FKs → overwrite dims → PK → overwrite fact →
  * column types → FKs).
  */
object JdbcSink {

  final case class JdbcConfig(url: String, user: String, password: String,
                              driver: String = "") {
    def props: java.util.Properties = {
      val p = new java.util.Properties()
      p.setProperty("user", user)
      p.setProperty("password", password)
      if (driver.nonEmpty) p.setProperty("driver", driver)
      p
    }
  }

  /** Append in `batchSize`-row batches over `numPartitions` connections
    * (reference `bulk_insert`, `resources.py:58-78`).
    */
  def append(df: DataFrame, cfg: JdbcConfig, table: String,
             batchSize: Int = 1000, numPartitions: Int = 8): Unit =
    df.repartition(numPartitions)
      .write.mode("append")
      .option("batchsize", batchSize)
      .jdbc(cfg.url, table, cfg.props)

  /** Drop-and-recreate load (reference `load_table`, `ops/load.py:36-74`). */
  def overwrite(df: DataFrame, cfg: JdbcConfig, table: String,
                batchSize: Int = 1000): Unit =
    df.write.mode("overwrite")
      .option("batchsize", batchSize)
      .option("truncate", "false") // real drop+recreate, like the reference
      .jdbc(cfg.url, table, cfg.props)

  private def withConnection[A](cfg: JdbcConfig)(f: Connection => A): A = {
    val conn = DriverManager.getConnection(cfg.url, cfg.user, cfg.password)
    try f(conn) finally conn.close()
  }

  private def exec(cfg: JdbcConfig, sql: String): Unit =
    withConnection(cfg) { c =>
      val st = c.createStatement()
      try st.execute(sql) finally st.close()
    }

  /** Parameterized SQL read pushed down to the database (reference
    * `execute_query`, `resources.py:50-56`): the query runs remotely, Spark
    * scans only its result set.
    */
  def readQuery(spark: org.apache.spark.sql.SparkSession, cfg: JdbcConfig,
                sql: String, numPartitions: Int = 1): DataFrame =
    spark.read
      .option("numPartitions", numPartitions)
      .jdbc(cfg.url, s"($sql) AS q", cfg.props)

  /** INFORMATION_SCHEMA existence probe (reference `table_exists`,
    * `resources.py:80-87`).
    */
  def tableExists(cfg: JdbcConfig, table: String): Boolean =
    withConnection(cfg) { c =>
      val rs = c.getMetaData.getTables(null, null, table, Array("TABLE"))
      try rs.next() finally rs.close()
    }

  def dropTableSql(table: String): String = s"DROP TABLE IF EXISTS [$table]"

  /** NOT NULL + PRIMARY KEY (reference `set_pk`, `resources.py:101-119`). */
  def setPrimaryKeySql(table: String, column: String, sqlType: String): Seq[String] = Seq(
    s"ALTER TABLE [$table] ALTER COLUMN [$column] $sqlType NOT NULL",
    s"ALTER TABLE [$table] ADD CONSTRAINT [PK_$table] PRIMARY KEY ([$column])")

  /** ADD FK (reference `set_fk`, `resources.py:121-137`). */
  def setForeignKeySql(table: String, column: String,
                       refTable: String, refColumn: String): String =
    s"ALTER TABLE [$table] ADD CONSTRAINT [FK_$column] " +
      s"FOREIGN KEY ([$column]) REFERENCES [$refTable] ([$refColumn])"

  def dropForeignKeySql(table: String, column: String): String =
    s"ALTER TABLE [$table] DROP CONSTRAINT IF EXISTS [FK_$column]"

  /** ALTER COLUMN type (reference `set_type`, `resources.py:167-180`). */
  def setColumnTypeSql(table: String, column: String, sqlType: String): String =
    s"ALTER TABLE [$table] ALTER COLUMN [$column] $sqlType"

  /** Spark DataType → SQL-Server column type (reference `get_id_datatype`,
    * `ops/load.py:21-33`, generalized).
    */
  def sqlServerType(dt: org.apache.spark.sql.types.DataType): String = {
    import org.apache.spark.sql.types._
    dt match {
      case IntegerType        => "INT"
      case LongType           => "BIGINT"
      case DoubleType | FloatType => "FLOAT"
      case d: DecimalType     => s"DECIMAL(${d.precision},${d.scale})"
      case DateType           => "DATE"
      case TimestampType      => "DATETIME2"
      case BooleanType        => "BIT"
      case _                  => "VARCHAR(255)"
    }
  }

  def dropTable(cfg: JdbcConfig, table: String): Unit = exec(cfg, dropTableSql(table))
  def setPrimaryKey(cfg: JdbcConfig, table: String, column: String, sqlType: String): Unit =
    setPrimaryKeySql(table, column, sqlType).foreach(exec(cfg, _))
  def setForeignKey(cfg: JdbcConfig, table: String, column: String,
                    refTable: String, refColumn: String): Unit =
    exec(cfg, setForeignKeySql(table, column, refTable, refColumn))
  def dropForeignKey(cfg: JdbcConfig, table: String, column: String): Unit =
    exec(cfg, dropForeignKeySql(table, column))
  def setColumnType(cfg: JdbcConfig, table: String, column: String, sqlType: String): Unit =
    exec(cfg, setColumnTypeSql(table, column, sqlType))
}
