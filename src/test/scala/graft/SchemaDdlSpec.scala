package graft

import graft.cdc.SchemaDdl
import graft.cdc.SchemaDdl._
import graft.sinks.TableSink
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

class SchemaDdlSpec extends AnyFunSuite {
  import TestSpark.{spark, dir}

  test("DDL generation covers all four target dialects for a real schema") {
    val schema = Tables.load(spark, dir, "orders").schema
    val pg = SchemaDdl.createTableDdl("orders", schema, Postgres, Seq("o_orderkey"))
    assert(pg.contains("\"o_orderkey\" BIGINT"))
    assert(pg.contains("\"o_orderdate\" TIMESTAMP"))
    assert(pg.contains("PRIMARY KEY (\"o_orderkey\")"))
    val mssql = SchemaDdl.createTableDdl("orders", schema, SqlServer)
    assert(mssql.contains("[o_totalprice] FLOAT"))
    assert(mssql.contains("[o_orderstatus] NVARCHAR(MAX)"))
    val ora = SchemaDdl.createTableDdl("orders", schema, Oracle)
    assert(ora.contains("\"o_orderkey\" NUMBER(19)"))
    val sf = SchemaDdl.createTableDdl("orders", schema, Snowflake)
    assert(sf.contains("\"o_orderdate\" TIMESTAMP_NTZ"))
  }

  test("unmappable types fail loudly") {
    val bad = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("a",
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType))))
    val e = intercept[IllegalArgumentException] {
      SchemaDdl.createTableDdl("t", bad, Postgres)
    }
    assert(e.getMessage.contains("no postgresql mapping"))
  }

  test("primary-key columns are forced NOT NULL with bounded string types") {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("id", StringType, nullable = true),
      StructField("payload", StringType, nullable = true)))
    val mssql = SchemaDdl.createTableDdl("t", schema, SchemaDdl.SqlServer, Seq("id"))
    // a PK over a nullable column is rejected by SQL Server outright, and
    // NVARCHAR(MAX)/CLOB cannot be key columns
    assert(mssql.contains("[id] NVARCHAR(255) NOT NULL"))
    assert(mssql.contains("[payload] NVARCHAR(MAX)"))
    assert(!mssql.contains("[payload] NVARCHAR(MAX) NOT NULL"))
    val ora = SchemaDdl.createTableDdl("t", schema, SchemaDdl.Oracle, Seq("id"))
    assert(ora.contains("\"id\" VARCHAR2(255) NOT NULL"))
  }

  test("identifiers with embedded quote characters are escaped, not injected") {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("a\"b", LongType, nullable = true)))
    val pg = SchemaDdl.createTableDdl("t", schema, Postgres)
    assert(pg.contains("\"a\"\"b\" BIGINT"))
    val weird = StructType(Seq(StructField("a]b", LongType, nullable = true)))
    val mssql = SchemaDdl.createTableDdl("t", weird, SchemaDdl.SqlServer)
    assert(mssql.contains("[a]]b] BIGINT"))
  }

  test("time-partitioned sink writes prunable dt partitions") {
    val out = Files.createTempDirectory("tp").toString + "/events"
    TableSink.writeTimePartitioned(Tables.load(spark, dir, "events"), "ts", out)
    val dirs = new java.io.File(out).listFiles().filter(_.isDirectory).map(_.getName)
    assert(dirs.forall(_.startsWith("dt=")))
    assert(dirs.length > 1)
    // a date-filtered read prunes to one partition's rows
    val oneDay = spark.read.parquet(out).where(col("dt") === dirs.head.stripPrefix("dt="))
    assert(oneDay.count() > 0)
    val total = spark.read.parquet(out).count()
    assert(total === 1000)
  }
}
