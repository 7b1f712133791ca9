package graft

import graft.cdc.{ConnectionUpsert, Discovery, PipelineCreateRequest, PipelineUpdateRequest}
import org.scalatest.funsuite.AnyFunSuite

/** Endpoint-semantics checks for Discovery.PipelineDirectory — the
  * pipeline CRUD family (api.py:2871 POST, :3762 PUT, :7362 DELETE):
  * the create derivation ladder (connection lookups, schema/table
  * extraction with the Pydantic-validator prefix-kept quirk, mode
  * mapping), the update status guard, and every branch of the delete
  * ladder (missing / running-stop-fails / connector-teardown warnings /
  * soft / hard / hard-after-soft).
  */
class PipelineDirectorySpec extends AnyFunSuite {

  private def dirs(): (Discovery.ConnectionDirectory, Discovery.PipelineDirectory) = {
    val c = new Discovery.ConnectionDirectory
    (c, new Discovery.PipelineDirectory(c))
  }

  private def conn(c: Discovery.ConnectionDirectory, name: String,
      dbType: String = "postgresql", database: String = "app",
      schema: Option[String] = None): String =
    c.createConnection(ConnectionUpsert(name = name, databaseType = Some(dbType),
      host = Some("h"), port = Some(1), database = database, username = "u",
      password = "p", schemaName = schema)).toOption.get.id

  test("create: 404 details for missing source/target connections (soft-deleted 404s too)") {
    val (c, p) = dirs()
    val src = conn(c, "src")
    assert(p.createPipeline(PipelineCreateRequest("p", "c-9", src))
      == Left("Source connection not found: c-9"))
    assert(p.createPipeline(PipelineCreateRequest("p", src, "c-9"))
      == Left("Target connection not found: c-9"))
    val tgt = conn(c, "tgt")
    c.deleteConnection(tgt, hardDelete = false)
    assert(p.createPipeline(PipelineCreateRequest("p", src, tgt))
      == Left(s"Target connection not found: $tgt"))
  }

  test("create: database/schema/tables derive from connections, defaults by db type") {
    val (c, p) = dirs()
    val src = conn(c, "src", schema = Some("sales"))
    val tgt = conn(c, "tgt", dbType = "sqlserver", database = "dw")
    val r = p.createPipeline(PipelineCreateRequest("p1", src, tgt,
      sourceTables = Some(Seq("orders")))).toOption.get
    assert(r.sourceDatabase == "app" && r.sourceSchema == "sales")
    assert(r.targetDatabase == "dw" && r.targetSchema == "dbo",
      "sqlserver target defaults dbo")
    assert(r.status == "STOPPED" && r.fullLoadStatus == "NOT_STARTED"
      && r.cdcStatus == "NOT_STARTED")
    // snowflake default is PUBLIC, postgres public
    val sf = conn(c, "sf", dbType = "snowflake", database = "x")
    val r2 = p.createPipeline(PipelineCreateRequest("p2", src, sf,
      sourceTables = Some(Seq("t")))).toOption.get
    assert(r2.targetSchema == "PUBLIC" && r2.sourceSchema == "sales")
  }

  test("create: 400 messages when database/schema/tables underivable") {
    val (c, p) = dirs()
    val noDb = c.createConnection(ConnectionUpsert(name = "nodb",
      databaseType = Some("postgresql"))).toOption.get.id
    val tgt = conn(c, "tgt")
    assert(p.createPipeline(PipelineCreateRequest("p", noDb, tgt,
      sourceTables = Some(Seq("t"))))
      == Left("source_database is required. Provide it directly or ensure connection has a database."))
    val src = conn(c, "src")
    assert(p.createPipeline(PipelineCreateRequest("p", src, tgt))
      == Left("source_tables is required. Provide it directly or in table_mappings."))
  }

  test("create: Pydantic validator fills tables from mappings PREFIX-KEPT; prefix beats explicit schema key") {
    val (c, p) = dirs()
    val src = conn(c, "src")
    val tgt = conn(c, "tgt", dbType = "sqlserver", database = "dw")
    val r = p.createPipeline(PipelineCreateRequest("p", src, tgt,
      tableMappings = Seq(
        Map("source_table" -> "sales.orders", "source_schema" -> "ignored",
          "target_table" -> "public.orders_t"),
        Map("sourceTable" -> "customers", "source_schema" -> "crm",
          "targetTable" -> "cust_t")))).toOption.get
    // validator quirk (api.py:905): names kept verbatim — the endpoint's
    // strip-prefix extraction (api.py:2998) is dead when mappings exist
    assert(r.sourceTables == Seq("sales.orders", "customers"))
    assert(r.targetTables == Seq("public.orders_t", "cust_t"))
    // per-mapping ladder: "schema.table" prefix beats source_schema key
    assert(r.sourceSchema == "sales")
    // target prefix "public" hits the sqlserver override on the provided
    // branch (the validator-filled value reads as user-provided)
    assert(r.targetSchema == "dbo")
  }

  test("create: mode mapping — cdc_enabled wins, then deprecated enable_full_load") {
    val (c, p) = dirs()
    val src = conn(c, "s"); val tgt = conn(c, "t")
    def mk(mode: String = "full_load_and_cdc", efl: Option[Boolean] = None,
        cdc: Option[Boolean] = None, flt: Option[String] = None) =
      p.createPipeline(PipelineCreateRequest("p", src, tgt,
        sourceTables = Some(Seq("t")), mode = mode, enableFullLoad = efl,
        cdcEnabled = cdc, fullLoadType = flt)).toOption.get.mode
    assert(mk(cdc = Some(true), flt = Some("overwrite")) == "full_load_and_cdc")
    assert(mk(cdc = Some(true), flt = Some("append")) == "cdc_only")
    assert(mk(cdc = Some(false), flt = Some("overwrite")) == "full_load_only")
    assert(mk(mode = "cdc_only", efl = Some(true)) == "full_load_and_cdc")
    assert(mk(mode = "full_load_only", efl = Some(true)) == "full_load_only",
      "enable_full_load=true only upgrades cdc_only")
    assert(mk(mode = "full_load_and_cdc", efl = Some(false)) == "cdc_only")
    assert(mk(mode = "full_load_only") == "full_load_only")
  }

  test("update: 404 missing; 400 while RUNNING/STARTING/STOPPING; partial update bumps seq") {
    val (c, p) = dirs()
    val src = conn(c, "s"); val tgt = conn(c, "t")
    assert(p.updatePipeline("p-9", PipelineUpdateRequest())
      == Left("Pipeline not found: p-9"))
    val r = p.createPipeline(PipelineCreateRequest("p", src, tgt,
      sourceTables = Some(Seq("t")))).toOption.get
    p.setStatus(r.id, "RUNNING")
    assert(p.updatePipeline(r.id, PipelineUpdateRequest(name = Some("x")))
      == Left("Cannot update a running pipeline. Please stop it first."))
    p.setStatus(r.id, "STOPPED")
    assert(p.updatePipeline(r.id, PipelineUpdateRequest(mode = Some("bogus")))
      == Left("'bogus' is not a valid PipelineMode"))
    val up = p.updatePipeline(r.id, PipelineUpdateRequest(name = Some("renamed"),
      targetSchema = Some("public"))).toOption.get
    assert(up.name == "renamed" && up.updatedSeq > r.updatedSeq)
    assert(up.targetSchema == "public",
      "PUT assigns raw values — no sqlserver override re-run")
    assert(up.sourceTables == r.sourceTables, "absent fields keep their values")
  }

  test("delete: 404 missing; hard_delete defaults TRUE and removes the row + in-use guard row") {
    val (c, p) = dirs()
    val src = conn(c, "s"); val tgt = conn(c, "t")
    assert(p.deletePipeline("p-9") == Left("Pipeline not found: p-9"))
    val r = p.createPipeline(PipelineCreateRequest("p", src, tgt,
      sourceTables = Some(Seq("t")))).toOption.get
    // created pipeline blocks connection deletion (reference counts rows)
    assert(c.deleteConnection(src).left.toOption.get.contains("1 pipeline(s)"))
    val del = p.deletePipeline(r.id).toOption.get
    assert(del.hardDelete && del.message == s"Pipeline ${r.id} permanently deleted")
    assert(del.warnings.isEmpty && p.getRaw(r.id).isEmpty)
    // hard delete removed the guard row — connection now deletable
    assert(c.deleteConnection(src).isRight)
  }

  test("delete: soft stamps deleted_at (row kept, still blocks connections); hard-after-soft succeeds; soft-after-soft 404s") {
    val (c, p) = dirs()
    val src = conn(c, "s"); val tgt = conn(c, "t")
    val r = p.createPipeline(PipelineCreateRequest("p", src, tgt,
      sourceTables = Some(Seq("t")))).toOption.get
    val del = p.deletePipeline(r.id, hardDelete = false).toOption.get
    assert(!del.hardDelete && del.message == s"Pipeline ${r.id} soft deleted")
    assert(p.getPipeline(r.id).isEmpty && p.getRaw(r.id).exists(_.deletedSeq.nonEmpty))
    // soft-deleted pipeline STILL blocks connection deletion (no
    // deleted_at filter on the reference's in-use count)
    assert(c.deleteConnection(src).isLeft)
    // soft lookup filters deleted_at → second soft delete 404s
    assert(p.deletePipeline(r.id, hardDelete = false)
      == Left(s"Pipeline not found: ${r.id}"))
    // hard lookup INCLUDES soft-deleted rows → hard-after-soft succeeds
    assert(p.deletePipeline(r.id, hardDelete = true).isRight)
    assert(p.getRaw(r.id).isEmpty && c.deleteConnection(src).isRight)
  }

  test("delete: stop-failure and per-connector teardown failures warn and continue; response carries names + topics") {
    val (c, p) = dirs()
    val src = conn(c, "s"); val tgt = conn(c, "t")
    val r = p.createPipeline(PipelineCreateRequest("p", src, tgt,
      sourceTables = Some(Seq("t")))).toOption.get
    p.setStatus(r.id, "RUNNING")
    p.setConnectors(r.id, Some("dbz-1"), Some("sink-1"),
      Seq("cdc.app.t1", "cdc.app.t2"))
    p.stopFails = Set(r.id)
    p.connectorDeleteFails = Set("dbz-1")
    val del = p.deletePipeline(r.id).toOption.get
    assert(del.warnings.exists(_.startsWith("Failed to stop pipeline before deletion")))
    assert(del.warnings.exists(_.startsWith("Failed to delete Debezium connector dbz-1")))
    assert(!del.warnings.exists(_.contains("Sink")), "sink teardown succeeded")
    assert(del.deletedDebeziumConnector.contains("dbz-1")
      && del.deletedSinkConnector.contains("sink-1"),
      "names reported regardless of teardown outcome")
    assert(del.unregisteredTopics == Seq("cdc.app.t1", "cdc.app.t2"))
    assert(p.getRaw(r.id).isEmpty, "deletion proceeds despite every warning")
  }
}
