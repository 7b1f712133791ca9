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

  // --- schema sync: ALTER generation from a drifted source ---
  // drift fixture mirroring cdc_schema_drift's scenario: target is missing
  // o_comment (added in source), has o_totalprice as VARCHAR while the
  // source moved to DECIMAL (type_changed), and keeps a legacy o_sync_ts
  // the source never had (removed_in_source)
  private def driftPair = {
    import org.apache.spark.sql.types._
    val source = StructType(Seq(
      StructField("o_orderkey", LongType, nullable = false),
      StructField("o_totalprice", DecimalType(12, 2), nullable = true),
      StructField("o_comment", StringType, nullable = true)))
    val target = StructType(Seq(
      StructField("o_orderkey", LongType, nullable = false),
      StructField("o_totalprice", StringType, nullable = true),
      StructField("o_sync_ts", TimestampType, nullable = true)))
    (source, target)
  }

  test("schema sync emits ADD COLUMN per dialect for source-only columns") {
    val (source, target) = driftPair
    val pg = SchemaDdl.alterTableDdl("orders", source, target, Postgres)
    assert(pg.statements.contains("ALTER TABLE \"orders\" ADD COLUMN \"o_comment\" TEXT"))
    val mssql = SchemaDdl.alterTableDdl("orders", source, target, SqlServer)
    assert(mssql.statements.contains("ALTER TABLE [orders] ADD [o_comment] NVARCHAR(MAX)"))
    val ora = SchemaDdl.alterTableDdl("orders", source, target, Oracle)
    assert(ora.statements.contains("ALTER TABLE \"orders\" ADD (\"o_comment\" CLOB)"))
    val sf = SchemaDdl.alterTableDdl("orders", source, target, Snowflake)
    assert(sf.statements.contains("ALTER TABLE \"orders\" ADD COLUMN \"o_comment\" VARCHAR"))
  }

  test("schema sync emits the dialect's retype form for type changes") {
    val (source, target) = driftPair
    val pg = SchemaDdl.alterTableDdl("orders", source, target, Postgres)
    assert(pg.statements.contains(
      "ALTER TABLE \"orders\" ALTER COLUMN \"o_totalprice\" TYPE NUMERIC(12,2) USING \"o_totalprice\"::NUMERIC(12,2)"))
    val mssql = SchemaDdl.alterTableDdl("orders", source, target, SqlServer)
    assert(mssql.statements.contains(
      "ALTER TABLE [orders] ALTER COLUMN [o_totalprice] DECIMAL(12,2) NULL"))
    val ora = SchemaDdl.alterTableDdl("orders", source, target, Oracle)
    assert(ora.statements.contains(
      "ALTER TABLE \"orders\" MODIFY (\"o_totalprice\" NUMBER(12,2))"))
    val sf = SchemaDdl.alterTableDdl("orders", source, target, Snowflake)
    assert(sf.statements.contains(
      "ALTER TABLE \"orders\" ALTER COLUMN \"o_totalprice\" SET DATA TYPE NUMBER(12,2)"))
  }

  test("schema sync never drops target-only columns — warning instead") {
    val (source, target) = driftPair
    for (d <- Seq[SchemaDdl.Dialect](Postgres, SqlServer, Oracle, Snowflake)) {
      val plan = SchemaDdl.alterTableDdl("orders", source, target, d)
      assert(!plan.statements.exists(_.contains("DROP")),
        s"${d.name} must not emit DROP for target-only columns")
      assert(plan.warnings.exists(w => w.contains("o_sync_ts") && w.contains("NOT dropped")))
      assert(plan.hasChanges)
    }
  }

  test("schema sync handles nullability drift: relax is a statement, tighten warns") {
    import org.apache.spark.sql.types._
    val src = StructType(Seq(StructField("c", LongType, nullable = true)))
    val tgt = StructType(Seq(StructField("c", LongType, nullable = false)))
    val relax = SchemaDdl.alterTableDdl("t", src, tgt, Postgres)
    assert(relax.statements === Seq("ALTER TABLE \"t\" ALTER COLUMN \"c\" DROP NOT NULL"))
    assert(relax.warnings.isEmpty)
    val tighten = SchemaDdl.alterTableDdl("t", tgt, src, Postgres)
    assert(tighten.statements === Seq("ALTER TABLE \"t\" ALTER COLUMN \"c\" SET NOT NULL"))
    assert(tighten.warnings.exists(_.contains("backfill")))
    // SQL Server restates the type; Oracle uses MODIFY (c NOT NULL)
    assert(SchemaDdl.alterTableDdl("t", tgt, src, SqlServer).statements ===
      Seq("ALTER TABLE [t] ALTER COLUMN [c] BIGINT NOT NULL"))
    assert(SchemaDdl.alterTableDdl("t", tgt, src, Oracle).statements ===
      Seq("ALTER TABLE \"t\" MODIFY (\"c\" NOT NULL)"))
  }

  test("schema sync adds source-NOT-NULL columns nullable with a backfill warning") {
    import org.apache.spark.sql.types._
    val src = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("created", TimestampType, nullable = false)))
    val tgt = StructType(Seq(StructField("id", LongType, nullable = false)))
    val plan = SchemaDdl.alterTableDdl("t", src, tgt, Postgres)
    assert(plan.statements === Seq("ALTER TABLE \"t\" ADD COLUMN \"created\" TIMESTAMP"))
    assert(!plan.statements.head.contains("NOT NULL"),
      "a NOT NULL add without default fails on a populated target")
    assert(plan.warnings.exists(w => w.contains("created") && w.contains("backfill")))
  }

  test("schema sync falls back to CREATE TABLE when the target does not exist") {
    val (source, _) = driftPair
    val created = SchemaDdl.syncDdl("orders", source, None, Postgres, Seq("o_orderkey"))
    assert(created.statements.length === 1)
    assert(created.statements.head.startsWith("CREATE TABLE \"orders\""))
    assert(created.statements.head.contains("PRIMARY KEY (\"o_orderkey\")"))
    val noop = SchemaDdl.syncDdl("orders", source, Some(source), Postgres)
    assert(!noop.hasChanges)
    assert(noop.warnings.isEmpty)
  }

  // --- pre-provisioning compatibility verdict (schema_service.py:1455) ---

  test("compatibility verdict: missing-in-target columns are exactly what syncDdl would add") {
    val (source, target) = driftPair
    val c = SchemaDdl.compatibility(source, Some(target))
    assert(!c.compatible)
    assert(c.message === "Incompatible - missing columns in target")
    assert(c.missingColumns === Seq("o_comment"))
    assert(c.extraColumns === Seq("o_sync_ts"))
    assert(c.sourceColumns === 3 && c.targetColumns === 3)
    // wiring: the verdict's missing list is precisely the set of columns the
    // sync plan ADDs — the verdict is the read-only pre-flight of the repair
    val plan = SchemaDdl.syncDdl("orders", source, Some(target), Postgres)
    val added = plan.statements.filter(_.contains(" ADD COLUMN "))
    assert(added === c.missingColumns.map(m => s"""ALTER TABLE "orders" ADD COLUMN "$m" TEXT"""))
  }

  test("compatibility verdict: absent target is compatible and syncDdl creates it") {
    val (source, _) = driftPair
    val c = SchemaDdl.compatibility(source, None)
    assert(c.compatible)
    assert(c.message === "Target table does not exist - can be created")
    assert(c.sourceColumns === 3 && c.targetColumns === 0)
    assert(c.missingColumns.isEmpty && c.extraColumns.isEmpty)
    val plan = SchemaDdl.syncDdl("orders", source, None, Postgres)
    assert(plan.statements.head.startsWith("CREATE TABLE \"orders\""))
  }

  test("compatibility verdict: extra target columns are tolerated, names-only check") {
    import org.apache.spark.sql.types._
    val source = StructType(Seq(StructField("id", LongType, nullable = false)))
    // target keeps a legacy column AND retypes id — still compatible: the
    // reference's verdict is on column names only (types are sync_schema's job)
    val target = StructType(Seq(
      StructField("id", StringType, nullable = true),
      StructField("legacy", StringType, nullable = true)))
    val c = SchemaDdl.compatibility(source, Some(target))
    assert(c.compatible && c.message === "Compatible")
    assert(c.extraColumns === Seq("legacy"))
    // and the sync plan never drops the extra column (warning only)
    val plan = SchemaDdl.syncDdl("t", source, Some(target), Postgres)
    assert(plan.warnings.exists(w => w.contains("legacy") && w.contains("NOT")))
    assert(!plan.statements.exists(_.contains("DROP")))
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
