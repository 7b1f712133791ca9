package graft

import graft.cdc.{ConnectionUpsert, Discovery}
import org.scalatest.funsuite.AnyFunSuite

/** Endpoint-semantics checks for Discovery.ConnectionDirectory — the
  * connection CRUD family (api.py:1239 POST, :1447 GET list, :1555 GET,
  * :1665 PUT, :1883 DELETE) as catalog-shaped driver state: each branch of
  * the delete ladder (missing / in-use / soft / hard / post-soft listing),
  * the update ladder, and the snowflake/S3 host-port derivation quirks.
  */
class ConnectionDirectorySpec extends AnyFunSuite {

  private def pg(name: String = "pg") = ConnectionUpsert(
    name = name, databaseType = Some("postgresql"),
    host = Some("db.internal"), port = Some(5432),
    database = "app", username = "svc", password = "secret")

  test("create: 400 detail without database_type; password masked; id/seq assigned") {
    val d = new Discovery.ConnectionDirectory
    val err = d.createConnection(ConnectionUpsert(name = "x")).left.toOption.get
    assert(err.startsWith("database_type is required. Supported types:"))
    val c = d.createConnection(pg()).toOption.get
    assert(c.id == "c-1" && c.password == "***" && c.isActive)
    assert(c.host == "db.internal" && c.port == 5432)
    assert(c.connectionType == "source", "connection_type defaults to source")
  }

  test("create: snowflake account from additional_config wins over host, port defaults 443") {
    val d = new Discovery.ConnectionDirectory
    val c = d.createConnection(ConnectionUpsert(name = "sf",
      databaseType = Some("Snowflake"), host = Some("ignored-host"),
      additionalConfig = Map("account" -> "acme-xy12345"))).toOption.get
    assert(c.host == "acme-xy12345" && c.port == 443)
    assert(c.databaseType == "Snowflake", "type value stored as given, branch on lowercase")
  }

  test("create: S3 defaults host and port; POST's falsy-host fallback hits every type") {
    val d = new Discovery.ConnectionDirectory
    val s3 = d.createConnection(ConnectionUpsert(name = "s3",
      databaseType = Some("s3"))).toOption.get
    assert(s3.host == "s3.amazonaws.com" && s3.port == 443)
    // the POST quirk mirrored from api.py:1291 (`host_value or "s3..."`
    // runs for every database type): hostless postgres gets the S3 host
    val odd = d.createConnection(ConnectionUpsert(name = "odd",
      databaseType = Some("postgresql"))).toOption.get
    assert(odd.host == "s3.amazonaws.com" && odd.port == 3306)
  }

  test("update: 404 on missing; 400 without database_type persists nothing; PUT fallbacks differ from POST") {
    val d = new Discovery.ConnectionDirectory
    assert(d.updateConnection("c-9", pg()) == Left("Connection not found: c-9"))
    val c = d.createConnection(pg()).toOption.get
    val bad = d.updateConnection(c.id, ConnectionUpsert(name = "renamed"))
    assert(bad.left.toOption.get.startsWith("database_type is required"))
    assert(d.getConnection(c.id).get.name == "pg", "failed validation persists nothing")
    // PUT's own fallbacks: host "" (not the S3 default), port 3306
    val up = d.updateConnection(c.id,
      ConnectionUpsert(name = "renamed", databaseType = Some("mysql"))).toOption.get
    assert(up.name == "renamed" && up.host == "" && up.port == 3306)
    assert(up.updatedSeq > up.createdSeq)
  }

  test("delete ladder: missing / in-use with count / soft / post-soft 404s everywhere / hard") {
    val d = new Discovery.ConnectionDirectory
    assert(d.deleteConnection("c-9") == Left("Connection not found: c-9"))
    val a = d.createConnection(pg("a")).toOption.get
    val b = d.createConnection(pg("b")).toOption.get
    // in-use guard counts source OR target references
    d.registerPipeline("pl-1", a.id, b.id)
    d.registerPipeline("pl-2", b.id, a.id)
    assert(d.deleteConnection(a.id) ==
      Left("Cannot delete connection: 2 pipeline(s) are using this connection"))
    val c = d.createConnection(pg("c")).toOption.get
    // soft delete: row survives but 404s on every read and drops from listings
    val soft = d.deleteConnection(c.id).toOption.get
    assert(soft.message == s"Connection ${c.id} deleted" && !soft.hardDelete)
    assert(d.getConnection(c.id).isEmpty, "soft-deleted connection must 404")
    assert(d.listConnections().map(_.name) == Seq("a", "b"))
    assert(d.updateConnection(c.id, pg()) == Left(s"Connection not found: ${c.id}"))
    assert(d.deleteConnection(c.id) == Left(s"Connection not found: ${c.id}"),
      "the delete filter is deleted_at IS NULL — a soft-deleted row 404s")
    // hard delete removes the row outright
    val e = d.createConnection(pg("e")).toOption.get
    assert(d.deleteConnection(e.id, hardDelete = true).toOption.get.hardDelete)
    assert(d.getConnection(e.id).isEmpty && d.listConnections().length == 2)
  }

  test("list: activeOnly filters; soft delete flips is_active false") {
    val d = new Discovery.ConnectionDirectory
    d.createConnection(pg("a"))
    val b = d.createConnection(pg("b")).toOption.get
    d.deleteConnection(b.id)
    assert(d.listConnections().map(_.name) == Seq("a"))
    assert(d.listConnections(activeOnly = true).map(_.name) == Seq("a"))
  }

  test("listInvitations: empty-string status filter is a no-op (Python truthiness)") {
    val d = new Discovery.UserDirectory
    d.createInvitation("x@example.com", "viewer", "admin")
    d.createInvitation("y@example.com", "viewer", "admin")
    assert(d.listInvitations(statusFilter = Some("")).length == 2,
      "the endpoint guards with `if status_filter:` — Some(\"\") must not filter")
    assert(d.listInvitations(statusFilter = Some("PENDING")).length == 2)
    assert(d.listInvitations(statusFilter = Some("ACCEPTED")).isEmpty)
  }
}
