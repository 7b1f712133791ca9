package graft

import graft.cdc.ConnectorConfig
import graft.cdc.ConnectorConfig._
import org.scalatest.funsuite.AnyFunSuite

/** Config-generation semantics: snapshot-mode ladder, identifier
  * sanitization, include-list assembly, mode bundles, URL dialects. */
class ConnectorConfigSpec extends AnyFunSuite {

  private val src = SourceSpec(
    pipeline = "My-Pipe.v2", dialect = Postgres, host = "db", port = 5432,
    user = "cdc", database = "app", schema = "", tables = Seq("users", "orders"))

  test("snapshot-mode resolution ladder") {
    assert(resolveSnapshotMode("never", fullLoadDone = false) === "never")
    assert(resolveSnapshotMode("never", fullLoadDone = true) === "never")
    assert(resolveSnapshotMode("schema_only", fullLoadDone = true) === "initial_only")
    assert(resolveSnapshotMode("schema_only", fullLoadDone = false) === "initial")
    assert(resolveSnapshotMode("initial", fullLoadDone = true) === "initial_only")
    assert(resolveSnapshotMode("initial", fullLoadDone = false) === "initial")
  }

  test("postgres source: defaults, sanitized slot, include list") {
    val c = sourceConfig(src)
    assert(c("connector.class") === "io.debezium.connector.postgresql.PostgresConnector")
    assert(c("table.include.list") === "public.users,public.orders") // schema defaulted
    assert(c("slot.name") === "my_pipe_v2_slot")
    assert(c("publication.name") === "my_pipe_v2_pub")
    assert(c("topic.prefix") === "My-Pipe.v2")
    assert(c("snapshot.mode") === "never")
    assert(c("errors.tolerance") === "all")
  }

  test("sqlserver source defaults schema to dbo") {
    val c = sourceConfig(src.copy(dialect = SqlServer))
    assert(c("connector.class") === "io.debezium.connector.sqlserver.SqlServerConnector")
    assert(c("table.include.list") === "dbo.users,dbo.orders")
    assert(!c.contains("slot.name"))
  }

  test("empty table list is rejected") {
    assertThrows[IllegalArgumentException](sourceConfig(src.copy(tables = Nil)))
  }

  test("sink upsert bundle vs history bundle") {
    val base = SinkSpec(
      connector = "sink1", dialect = Postgres, host = "tgt", port = 5432,
      user = "w", database = "dw", schema = "rep",
      topics = Seq("pipe.public.users"))
    val up = sinkConfig(base)
    assert(up("insert.mode") === "upsert")
    assert(up("pk.mode") === "record_key")
    assert(up("delete.enabled") === "true")
    assert(up("table.name.format") === "rep.users")
    assert(up("transforms.unwrap.delete.handling.mode") === "rewrite")
    val hist = sinkConfig(base.copy(mode = History))
    assert(hist("insert.mode") === "insert")
    assert(hist("pk.mode") === "none")
    assert(hist("delete.enabled") === "false")
  }

  test("jdbc url per dialect") {
    assert(jdbcUrl(Postgres, "h", 5432, "d") === "jdbc:postgresql://h:5432/d")
    assert(jdbcUrl(SqlServer, "h", 1433, "d") === "jdbc:sqlserver://h:1433;databaseName=d")
    assert(jdbcUrl(OracleDb, "h", 1521, "d") === "jdbc:oracle:thin:@h:1521/d")
  }

  test("source topics parse back through the envelope router") {
    // topic format {prefix}.{schema}.{table} is what Cdc.parseEnvelope splits
    val c = sourceConfig(src.copy(pipeline = "pipe"))
    val topic = s"${c("topic.prefix")}.public.users"
    assert(topic.split("\\.").toSeq === Seq("pipe", "public", "users"))
  }
}
