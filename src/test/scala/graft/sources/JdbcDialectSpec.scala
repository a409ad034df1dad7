package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.types._
import JdbcSink._

/** The dialect matrix as pure string tests — no engine needed, so the two
  * dialects with no live server in this sandbox (SQL Server, Postgres) get
  * the same coverage shape as Derby (which JdbcDerbySpec additionally
  * executes live). One table drives every Spark type through all three
  * `columnType` maps; DDL-shape tests pin quoting, identifier folding and
  * the retype/constraint statement forms each engine actually accepts.
  */
class JdbcDialectSpec extends AnyFunSuite {

  private val dialects = Seq(SqlServerDialect, PostgresDialect, DerbyDialect)

  test("columnType matrix: every Spark type maps per engine") {
    // dt -> (mssql, postgres, derby)
    val matrix: Seq[(DataType, String, String, String)] = Seq(
      (IntegerType, "INT", "INTEGER", "INTEGER"),
      (LongType, "BIGINT", "BIGINT", "BIGINT"),
      (DoubleType, "FLOAT", "DOUBLE PRECISION", "DOUBLE"),
      (FloatType, "FLOAT", "DOUBLE PRECISION", "DOUBLE"),
      (DecimalType(12, 2), "DECIMAL(12,2)", "NUMERIC(12,2)", "DECIMAL(12,2)"),
      (DateType, "DATE", "DATE", "DATE"),
      (TimestampType, "DATETIME2", "TIMESTAMP", "TIMESTAMP"),
      (BooleanType, "BIT", "BOOLEAN", "BOOLEAN"),
      (StringType, "VARCHAR(255)", "VARCHAR(255)", "VARCHAR(255)"))
    matrix.foreach { case (dt, ms, pg, db) =>
      assert(SqlServerDialect.columnType(dt) == ms, s"mssql $dt")
      assert(PostgresDialect.columnType(dt) == pg, s"postgres $dt")
      assert(DerbyDialect.columnType(dt) == db, s"derby $dt")
    }
  }

  test("identifier folding matches each engine's unquoted-name storage") {
    assert(SqlServerDialect.storedName("Fact_Exp") == "Fact_Exp") // preserved
    assert(PostgresDialect.storedName("Fact_Exp") == "fact_exp")  // lower
    assert(DerbyDialect.storedName("Fact_Exp") == "FACT_EXP")     // upper
  }

  test("quoting: brackets for T-SQL, double quotes elsewhere") {
    assert(SqlServerDialect.q("a b") == "[a b]")
    assert(PostgresDialect.q("a b") == "\"a b\"")
    assert(DerbyDialect.q("a b") == "\"a b\"")
  }

  test("drop-table honors IF EXISTS support") {
    assert(SqlServerDialect.supportsIfExists && PostgresDialect.supportsIfExists)
    assert(!DerbyDialect.supportsIfExists)
    assert(SqlServerDialect.dropTableSql("t") == "DROP TABLE IF EXISTS [t]")
    assert(PostgresDialect.dropTableSql("t") == "DROP TABLE IF EXISTS \"t\"")
    assert(DerbyDialect.dropTableSql("t") == "DROP TABLE t")
  }

  test("retype statement takes each engine's accepted form") {
    assert(SqlServerDialect.setColumnTypeSql("t", "c", "INT")
      == "ALTER TABLE [t] ALTER COLUMN [c] INT")
    assert(PostgresDialect.setColumnTypeSql("t", "c", "INTEGER")
      == "ALTER TABLE \"t\" ALTER COLUMN \"c\" TYPE INTEGER")
    assert(DerbyDialect.setColumnTypeSql("t", "c", "VARCHAR(64)")
      == "ALTER TABLE t ALTER COLUMN \"c\" SET DATA TYPE VARCHAR(64)")
  }

  test("primary-key protocol: NOT NULL first, then the constraint") {
    dialects.foreach { d =>
      val stmts = d.setPrimaryKeySql("t", "id", d.columnType(IntegerType))
      assert(stmts.length == 2, s"${d} pk steps")
      assert(stmts.head.contains("NOT NULL"), s"$d: ${stmts.head}")
      assert(stmts(1).contains("PRIMARY KEY"), s"$d: ${stmts(1)}")
    }
    // engine-specific NOT NULL forms: T-SQL restates the type, Postgres
    // uses SET NOT NULL, Derby bare NOT NULL
    assert(SqlServerDialect.setPrimaryKeySql("t", "id", "INT").head
      == "ALTER TABLE [t] ALTER COLUMN [id] INT NOT NULL")
    assert(PostgresDialect.setPrimaryKeySql("t", "id", "INTEGER").head
      == "ALTER TABLE \"t\" ALTER COLUMN \"id\" SET NOT NULL")
    assert(DerbyDialect.setPrimaryKeySql("t", "id", "INTEGER").head
      == "ALTER TABLE t ALTER COLUMN \"id\" NOT NULL")
  }

  test("foreign keys add and drop with engine-correct constraint syntax") {
    dialects.foreach { d =>
      val add = d.setForeignKeySql("fact", "dim_id", "dim", "id")
      assert(add.contains("FOREIGN KEY") && add.contains("REFERENCES"), s"$d: $add")
      val drop = d.dropForeignKeySql("fact", "dim_id")
      assert(drop.contains("DROP CONSTRAINT"), s"$d: $drop")
    }
    // IF EXISTS on the drop only where the engine accepts it
    assert(SqlServerDialect.dropForeignKeySql("f", "c").contains("IF EXISTS"))
    assert(PostgresDialect.dropForeignKeySql("f", "c").contains("IF EXISTS"))
    assert(!DerbyDialect.dropForeignKeySql("f", "c").contains("IF EXISTS"))
  }
}
