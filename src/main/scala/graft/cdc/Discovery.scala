package graft.cdc

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Catalog discovery — the Spark-native form of the reference's
  * discovery_service.py (list databases/schemas/tables/columns for the
  * pipeline wizard). Here the "database" is a scale-factor directory of
  * parquet tables; against a warehouse the same surface binds to
  * spark.catalog / JDBC metadata.
  */
object Discovery {

  /** One row per table: name, column count, schema DDL. */
  def listTables(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.all.map { t =>
      val schema = Tables.load(spark, dir, t).schema
      (t, schema.fields.length, schema.toDDL)
    }.toDF("table_name", "n_columns", "schema_ddl")
      .orderBy("table_name")
  }

  /** One row per column of a table: name, type, nullability. */
  def describeTable(spark: SparkSession, dir: String, table: String): DataFrame = {
    import spark.implicits._
    Tables.load(spark, dir, table).schema.fields.toSeq
      .map(f => (f.name, f.dataType.simpleString, f.nullable))
      .toDF("column_name", "data_type", "nullable")
  }

  /** ONE source of truth for the per-column byte model: each Spark
    * `simpleString` type maps to (the Spark Column, the DuckDB SQL term) in
    * a single match, so the two engines cannot diverge on the model —
    * `sizeEstimate` walks the live schema, `sizeEstimateSql` walks
    * [[schemaCatalog]], and DiscoverySpec pins catalog == live schema so a
    * schema change fails the spec loudly instead of surfacing as a
    * bench-time hash mismatch. */
  private def byteModel(name: String, simpleType: String): (Column, String) =
    simpleType match {
      case "string" =>
        (coalesce(length(col(name)).cast("long"), lit(0L)), s"length($name)")
      case "int" => (lit(4L), "4")
      case "array<float>" =>
        (coalesce(size(col(name)).cast("long") * 4L, lit(0L)), s"4 * len($name)")
      case _ => (lit(8L), "8") // int64 / double / timestamp
    }

  /** Static (table → columns with Spark simpleString types) catalog of the
    * post-load testdata schemas. The SQL oracle string must exist before
    * any SparkSession does, so it cannot walk the live schema — this
    * catalog stands in, and DiscoverySpec asserts it equals the live
    * `Tables.load(...).schema` for every table. */
  val schemaCatalog: Seq[(String, Seq[(String, String)])] = Seq(
    "region" -> Seq("r_regionkey" -> "int", "r_name" -> "string"),
    "nation" -> Seq("n_nationkey" -> "int", "n_name" -> "string",
      "n_regionkey" -> "int"),
    "customer" -> Seq("c_custkey" -> "bigint", "c_name" -> "string",
      "c_nationkey" -> "int", "c_acctbal" -> "double",
      "c_mktsegment" -> "string"),
    "supplier" -> Seq("s_suppkey" -> "bigint", "s_name" -> "string",
      "s_nationkey" -> "int", "s_acctbal" -> "double"),
    "part" -> Seq("p_partkey" -> "bigint", "p_name" -> "string",
      "p_brand" -> "string", "p_type" -> "string", "p_size" -> "int",
      "p_retailprice" -> "double"),
    "orders" -> Seq("o_orderkey" -> "bigint", "o_custkey" -> "bigint",
      "o_orderstatus" -> "string", "o_totalprice" -> "double",
      "o_orderdate" -> "timestamp", "o_orderpriority" -> "string"),
    "lineitem" -> Seq("l_orderkey" -> "bigint", "l_partkey" -> "bigint",
      "l_suppkey" -> "bigint", "l_linenumber" -> "int",
      "l_quantity" -> "double", "l_extendedprice" -> "double",
      "l_discount" -> "double", "l_tax" -> "double",
      "l_returnflag" -> "string", "l_linestatus" -> "string",
      "l_shipdate" -> "timestamp"),
    "events" -> Seq("event_id" -> "bigint", "ts" -> "timestamp",
      "user_id" -> "bigint", "event_type" -> "string", "value" -> "double",
      "props" -> "string"),
    "documents" -> Seq("doc_id" -> "bigint", "text" -> "string",
      "lang" -> "string", "source" -> "string", "n_chars" -> "bigint"),
    "embeddings" -> Seq("vec_id" -> "bigint", "embedding" -> "array<float>",
      "label" -> "int"))

  /** Table size estimation — the pre-transfer planning probe behind the
    * reference's `/tables/size-estimate` endpoint (api.py; feeds
    * transfer.py's chunked full-load): per table, the row count, a
    * data-driven byte estimate from the shared [[byteModel]]
    * (4/8 bytes for int32 / 64-bit scalars & timestamps, character
    * counts for strings, 4·len for float arrays — the same arithmetic on
    * both engines, so the estimate is oracle-checkable), the mean row
    * width and the chunk count a 16 MB-target chunked copy would plan
    * ([[graft.cdc.Materialize]]'s snapshot chunking consumes this).
    *
    * Scale shape: one scan + one scalar aggregation per table (each
    * aggregate is a map-side-combined sum over the scan — no shuffle of
    * rows), unioned into a |tables|-row result. */
  def sizeEstimate(spark: SparkSession, dir: String,
                   chunkBytes: Long = 16L * 1024 * 1024): DataFrame = {
    val per = Tables.all.map { t =>
      // loadSerial: a pure scalar aggregation pipelines into the scan and
      // partial aggregation already parallelizes at production split
      // counts; the parallelism-guard shuffle would move the whole table
      // just to count it
      val df = Tables.loadSerial(spark, dir, t)
      val rowBytes: Column = df.schema.fields
        .map(f => byteModel(f.name, f.dataType.simpleString)._1)
        .reduce(_ + _)
      df.agg(count(lit(1)).as("n_rows"),
          coalesce(sum(rowBytes), lit(0L)).as("est_bytes"))
        .select(lit(t).as("table_name"), col("n_rows"), col("est_bytes"))
    }
    per.reduce(_ unionAll _)
      .withColumn("est_row_bytes",
        col("est_bytes").cast("double") / col("n_rows").cast("double"))
      .withColumn("n_chunks",
        greatest(expr(s"(est_bytes + ${chunkBytes - 1}L) div ${chunkBytes}L"), lit(1L)))
      .orderBy("table_name")
  }

  val sizeEstimateSql: String = {
    val union = schemaCatalog.map { case (t, cols) =>
      val m = cols.map { case (n, dt) => byteModel(n, dt)._2 }.mkString(" + ")
      s"""SELECT '$t' AS table_name, count(*) AS n_rows,
         |       CAST(coalesce(sum($m), 0) AS BIGINT) AS est_bytes FROM $t""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH s AS (
       |$union)
       |SELECT table_name, n_rows, est_bytes,
       |       CAST(est_bytes AS DOUBLE) / CAST(n_rows AS DOUBLE) AS est_row_bytes,
       |       greatest((est_bytes + ${16L * 1024 * 1024 - 1}) // ${16L * 1024 * 1024}, 1) AS n_chunks
       |FROM s ORDER BY table_name""".stripMargin
  }

  /** Dependency-ordered load plan — the reference's
    * `/tables/{t}/dependencies` surface applied to full-load planning
    * (api.py; the reference's fix-pipeline scripts exist because loading
    * child tables before parents violates FKs): foreign keys are derived
    * by the TPC-H column-name convention (a column `x_<stem>key` in T
    * references the other table whose name starts with `<stem>`), then
    * each table gets its longest-path depth — load level L tables can
    * start once L-1 finished, tables sharing a level copy in parallel.
    *
    * This is CATALOG work: inputs are the ≤|tables|·|columns| schema
    * fields, not data, so the plan is computed driver-side and emitted
    * as a literal frame (the ConnectorConfig generation-only pattern) —
    * the oracle recomputes it independently from information_schema via
    * a recursive CTE, so the convention itself is cross-checked. */
  def loadOrder(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val pat = "^[a-z]+_([a-z]+)key$".r
    val cols = Tables.all.map(t => t -> Tables.load(spark, dir, t).schema.fieldNames.toSeq).toMap
    val edges: Map[String, Set[String]] = cols.map { case (t, cs) =>
      t -> cs.flatMap(c => pat.findFirstMatchIn(c).map(_.group(1)))
        .flatMap(stem => Tables.all.filter(u => u != t && u.startsWith(stem)))
        .toSet
    }
    val level = loadLevels(Tables.all, edges)
    Tables.all.map { t =>
      val deps = edges(t).toSeq.sorted
      (t, level(t).toLong, deps.length.toLong, deps.mkString(","))
    }.toDF("table_name", "load_level", "n_deps", "depends_on")
      .orderBy("load_level", "table_name")
  }

  /** Longest-path load levels by relaxation. A DAG's longest path
    * stabilizes within |nodes|-1 rounds; one more still-changing round
    * proves a cycle in the (schema-driven) name-convention edges, so the
    * loop fails loudly instead of relaxing levels forever. */
  private[graft] def loadLevels(nodes: Seq[String],
                                edges: Map[String, Set[String]]): Map[String, Int] = {
    var level = nodes.map(_ -> 0).toMap
    var changed = true
    var rounds = 0
    while (changed) {
      require(rounds <= nodes.size,
        s"loadOrder: dependency cycle detected in FK convention edges: $edges")
      rounds += 1
      changed = false
      for (t <- nodes; d <- edges.getOrElse(t, Set.empty))
        if (level(t) < level(d) + 1) { level += t -> (level(d) + 1); changed = true }
    }
    level
  }

  val loadOrderSql: String = {
    val tabs = Tables.all.map(t => s"'$t'").mkString(", ")
    s"""WITH RECURSIVE cols AS (
       |  SELECT table_name, column_name FROM information_schema.columns
       |  WHERE table_name IN ($tabs)),
       |tabs AS (SELECT DISTINCT table_name FROM cols),
       |stems AS (
       |  SELECT table_name, regexp_extract(column_name, '^[a-z]+_([a-z]+)key$$', 1) AS stem
       |  FROM cols WHERE regexp_matches(column_name, '^[a-z]+_([a-z]+)key$$')),
       |edges AS (
       |  SELECT DISTINCT s.table_name AS tbl, t.table_name AS dep
       |  FROM stems s JOIN tabs t
       |    ON t.table_name <> s.table_name AND starts_with(t.table_name, s.stem)),
       |paths AS (
       |  SELECT table_name AS tbl, 0 AS depth FROM tabs
       |  UNION ALL
       |  -- depth < |tables| bounds the recursion: never binding on a DAG
       |  -- (longest path <= |tables|-1), terminates instead of spinning
       |  -- if the convention edges ever form a cycle
       |  SELECT e.tbl, p.depth + 1 FROM edges e JOIN paths p
       |  ON e.dep = p.tbl WHERE p.depth < ${Tables.all.size}),
       |lv AS (SELECT tbl, CAST(max(depth) AS BIGINT) AS load_level FROM paths GROUP BY tbl),
       |deps AS (
       |  SELECT tbl, CAST(count(*) AS BIGINT) AS n_deps,
       |         string_agg(dep, ',' ORDER BY dep) AS depends_on
       |  FROM edges GROUP BY tbl)
       |SELECT l.tbl AS table_name, l.load_level,
       |       coalesce(d.n_deps, 0) AS n_deps,
       |       coalesce(d.depends_on, '') AS depends_on
       |FROM lv l LEFT JOIN deps d ON d.tbl = l.tbl
       |ORDER BY load_level, table_name""".stripMargin
  }

  /** Deterministic table-data preview — the reference's
    * `/connections/{id}/tables/{t}/data` endpoint (api.py:2583-2641 →
    * connection_service.py:797 get_table_data: records + columns, limit
    * clamped to [1,1000]). The reference issues `SELECT * ... LIMIT n`,
    * whose row set is engine-dependent; here the head is pinned to the
    * table's first column (the PK by the TPC-H naming convention) so the
    * preview is reproducible — and oracle-checkable.
    *
    * Scale shape: orderBy+limit collapses to TakeOrderedAndProject (a
    * per-partition top-n then a driver merge of n·|partitions| rows) —
    * never a full sort. */
  def preview(spark: SparkSession, dir: String, table: String,
              limit: Int = 100): DataFrame = {
    require(limit >= 1 && limit <= 1000, s"preview limit must be in [1,1000], got $limit")
    // loadSerial: a bounded take must not pay the parallelism-guard
    // shuffle — TakeOrdered's per-partition top-n over the natural scan
    // splits is already the right plan at every scale
    val df = Tables.loadSerial(spark, dir, table)
    df.orderBy(col(df.columns.head)).limit(limit)
  }

  def previewSql(table: String, limit: Int = 100): String = {
    val pk = schemaCatalog.toMap.apply(table).head._1
    s"SELECT * FROM $table ORDER BY $pk LIMIT $limit"
  }

  /** Connection-test verdict — the reference's `/connections/test`
    * endpoint (api.py:2019-2155 test_connection_data): validate the
    * config's per-database-type required fields and, when the type is
    * locally probeable (`parquet_dir` — this engine's native source),
    * actually probe it. The reference's network probes (JDBC ping, S3
    * HeadBucket) are environment calls, not data semantics, so types
    * other than `parquet_dir` stop at the validation verdict — the same
    * early-return shape the reference takes for a failed validation.
    * Catalog work: pure driver-side function, no jobs. */
  def connectionTest(config: Map[String, String]): ConnectionTestResult = {
    val t0 = System.nanoTime()
    def ms: Long = (System.nanoTime() - t0) / 1000000L
    def fail(err: String) = ConnectionTestResult(
      success = false, status = "FAILED", error = err, probed = false, responseTimeMs = ms)
    val supported = Seq("postgresql", "mysql", "sqlserver", "oracle",
      "mongodb", "snowflake", "s3", "as400", "parquet_dir")
    config.get("database_type").map(_.toLowerCase) match {
      case None | Some("") =>
        fail(s"database_type is required. Supported types: ${supported.mkString(", ")}")
      case Some(dbType) if !supported.contains(dbType) =>
        fail(s"Unsupported database_type: $dbType. Supported types: ${supported.mkString(", ")}")
      case Some(dbType) =>
        def missing(field: String, label: String): Option[String] =
          if (config.get(field).exists(_.nonEmpty)) None else Some(label)
        val required: Seq[Option[String]] = dbType match {
          case "s3" => Seq(
            missing("database", "Bucket name is required for S3 connections"),
            missing("username", "AWS Access Key ID is required for S3 connections"),
            missing("password", "AWS Secret Access Key is required for S3 connections"))
          case "snowflake" => Seq(
            missing("host", "Account is required for Snowflake connections"),
            missing("username", "Username is required"),
            missing("password", "Password is required"),
            missing("database", "Database is required"))
          case "parquet_dir" => Seq(
            missing("path", "path is required for parquet_dir connections"))
          case "mongodb" => Seq(
            missing("host", "Host is required"),
            missing("username", "Username is required"),
            missing("password", "Password is required"))
          case _ => Seq( // JDBC family: postgresql/mysql/sqlserver/oracle/as400
            missing("host", "Host is required"),
            missing("port", "Port is required"),
            missing("database", "Database is required"),
            missing("username", "Username is required"),
            missing("password", "Password is required"))
        }
        required.flatten.headOption match {
          case Some(err) => fail(err)
          case None if dbType == "parquet_dir" =>
            val path = java.nio.file.Paths.get(config("path"))
            val found = Tables.all.filter(t =>
              java.nio.file.Files.exists(path.resolve(s"$t.parquet")))
            if (found.nonEmpty)
              ConnectionTestResult(success = true, status = "SUCCESS",
                error = "", probed = true, responseTimeMs = ms)
            else fail(s"No graft tables found under $path")
          case None =>
            ConnectionTestResult(success = true, status = "VALIDATED",
              error = "", probed = false, responseTimeMs = ms)
        }
    }
  }

  /** Source→target table mapping — the reference's
    * `/pipelines/{id}/tables/mapping` endpoint backed by
    * discovery_service.py:96 map_tables, with its exact precedence:
    * a custom mapping wins (absent entries fall back to the source
    * name), else provided target tables pair 1:1 by index (shorter
    * target list falls back to the source name), else identity.
    * Catalog work — pure function, no jobs. */
  def mapTables(
      sourceTables: Seq[String],
      targetTables: Seq[String] = Nil,
      customMapping: Map[String, String] = Map.empty): Seq[(String, String)] =
    if (customMapping.nonEmpty)
      sourceTables.map(s => s -> customMapping.getOrElse(s, s))
    else if (targetTables.nonEmpty)
      sourceTables.zipWithIndex.map { case (s, i) =>
        s -> (if (i < targetTables.length) targetTables(i) else s)
      }
    else sourceTables.map(s => s -> s)

  /** Table-selection validation — the reference's
    * `/pipelines/{id}/tables/select` guard (discovery_service.py:135
    * validate_table_selection): each selected table is checked against
    * the catalog for existence and for a primary key (CDC needs one —
    * missing PK is the reference's warning, missing table its error).
    * PK convention matches [[preview]]/the TPC-H naming: the first
    * catalog column. Returns per-table detail rows plus the overall
    * verdict, mirroring the endpoint's `valid`/`errors`/`warnings`
    * split. Catalog work — no jobs. */
  def validateTableSelection(tables: Seq[String]): TableSelectionResult = {
    val catalog = schemaCatalog.toMap
    val details = tables.map { t =>
      catalog.get(t) match {
        case None =>
          TableSelectionDetail(t, exists = false, hasPrimaryKey = false,
            errors = Seq(s"Table '$t' does not exist"), warnings = Nil)
        case Some(cols) =>
          val pk = cols.headOption.exists(_._1.endsWith("key")) ||
            cols.headOption.exists(_._1.endsWith("_id"))
          TableSelectionDetail(t, exists = true, hasPrimaryKey = pk,
            errors = Nil,
            warnings = if (pk) Nil
            else Seq("Table has no primary key - may cause issues with CDC"))
      }
    }
    TableSelectionResult(
      valid = details.forall(_.exists),
      errors = details.flatMap(_.errors),
      warnings = details.flatMap(_.warnings),
      tableDetails = details)
  }

  /** Connection-test HISTORY — the reference's
    * `/connections/{id}/test/history` endpoint backed by its
    * `_save_test_history` / `get_test_history` pair
    * (connection_service.py:1420-1450): every test run appends a record,
    * the history endpoint returns the connection's records newest-first
    * with a limit. The store is an instance (not a global) so specs are
    * isolated; `tested_seq` is a monotone sequence in place of the
    * reference's wall-clock `tested_at` (same ordering role, clock-free
    * and thus reproducible). Catalog-sized driver state, like the
    * pipeline registry. */
  final class TestHistory {
    private val records =
      scala.collection.mutable.ArrayBuffer.empty[ConnectionTestRecord]
    private var seq = 0L

    /** Run [[connectionTest]] for `config` and append the outcome. */
    def recordTest(connectionId: String, config: Map[String, String]): ConnectionTestRecord =
      synchronized {
        seq += 1
        val r = connectionTest(config)
        val rec = ConnectionTestRecord(
          id = seq, connectionId = connectionId, status = r.status,
          responseTimeMs = r.responseTimeMs,
          errorMessage = if (r.error.isEmpty) None else Some(r.error),
          testedSeq = seq)
        records += rec
        rec
      }

    /** Newest-first history for one connection, limited — the endpoint's
      * exact shape (order by tested_at desc, limit). */
    def history(connectionId: String, limit: Int = 10): Seq[ConnectionTestRecord] =
      synchronized {
        records.filter(_.connectionId == connectionId)
          .sortBy(-_.testedSeq).take(math.max(limit, 0)).toSeq
      }
  }

  /** The seven built-in roles the reference serves when its roles table
    * is empty or missing (api.py:11973 `_builtin_roles` / GET /roles) —
    * ids here are the stable role names instead of fresh UUIDs so the
    * listing is reproducible (the reference mints a new uuid per call,
    * which even its own clients cannot depend on). */
  val builtinRoles: Seq[RoleRecord] = Seq(
    RoleRecord("admin", "admin", "Full platform access"),
    RoleRecord("super_admin", "super_admin", "Platform owner"),
    RoleRecord("org_admin", "org_admin", "Organization admin"),
    RoleRecord("data_engineer", "data_engineer", "Create pipelines, CDC"),
    RoleRecord("operator", "operator", "Run pipelines, monitor"),
    RoleRecord("viewer", "viewer", "Read-only"),
    RoleRecord("user", "user", "Basic user"))

  /** User-admin directory — the reference's user/role/invitation family
    * (api.py:11189 GET /users OFFSET listing, :11973 GET /roles with the
    * built-in fallback, :12052 POST /invitations) as catalog-shaped
    * driver state like [[TestHistory]]: an instance-scoped store (spec
    * isolation), a monotone sequence in place of wall clocks and
    * `secrets.token_urlsafe` (same ordering/uniqueness role, clock- and
    * RNG-free so specs are reproducible). Faithful endpoint semantics:
    * `listUsers` pages with offset/limit in insertion order (the
    * reference's unordered `offset().limit()` over the session-scoped
    * table IS insertion order on its test fixtures); invitation role
    * falls back to `viewer` off the endpoint's whitelist; an email
    * without '@' or an already-active user rejects; a fresh invitee
    * materializes as a PENDING inactive user with the email's local part
    * as full name and superuser iff admin/super_admin — api.py's exact
    * branch ladder. This is directory metadata (thousands of rows, not
    * 100 TB): driver-side state is the right shape, as with the pipeline
    * registry. */
  final class UserDirectory {
    private val users = scala.collection.mutable.LinkedHashMap.empty[String, UserRecord]
    private val invitations = scala.collection.mutable.ArrayBuffer.empty[InvitationRecord]
    private val roles = scala.collection.mutable.ArrayBuffer.empty[RoleRecord]
    private var seq = 0L
    private def nextSeq(): Long = { seq += 1; seq }

    val validRoles: Set[String] =
      Set("user", "operator", "viewer", "admin", "super_admin", "org_admin", "data_engineer")

    /** Register an active user directly (the POST /users path, minus
      * password hashing — auth is out of scope per SURVEY §1). Rejects a
      * duplicate email like the endpoint's UNIQUE-constraint branch. */
    def createUser(email: String, fullName: String, roleName: String): Either[String, UserRecord] =
      synchronized {
        val e = email.trim.toLowerCase
        if (e.isEmpty || !e.contains("@")) Left("Invalid email")
        else if (users.values.exists(_.email == e)) Left("User with this email already exists")
        else {
          val u = UserRecord(s"u-${nextSeq()}", e, fullName, roleName,
            isActive = true, isSuperuser = roleName == "admin" || roleName == "super_admin",
            status = "ACTIVE", createdSeq = seq)
          users(u.id) = u
          Right(u)
        }
      }

    /** GET /users — offset/limit page in insertion order. */
    def listUsers(skip: Int = 0, limit: Int = 100): Seq[UserRecord] =
      synchronized { users.values.slice(skip, skip + math.max(limit, 0)).toSeq }

    /** GET /users/{id} — None is the endpoint's 404. */
    def getUser(id: String): Option[UserRecord] = synchronized { users.get(id) }

    /** PUT /users/{user_id} (api.py:11303) — admin field-wise patch, the
      * endpoint's exact branch ladder: 404 for an unknown id; a role
      * outside the whitelist is a 400 `Invalid role. Must be one of: …`
      * (REJECTED — unlike the invitation path's silent viewer fallback);
      * a non-empty password runs the strength ladder and its specific
      * message wins; role updates re-derive `is_superuser` (admin /
      * super_admin). All-or-nothing: a failed validation persists NOTHING
      * (the endpoint raises before `db.commit()`, rolling back earlier
      * field writes), and role validation precedes password validation,
      * so when both are bad the role message is the one returned. */
    def updateUser(userId: String,
        fullName: Option[String] = None, roleName: Option[String] = None,
        isActive: Option[Boolean] = None, status: Option[String] = None,
        password: Option[String] = None): Either[String, UserRecord] =
      synchronized {
        users.get(userId) match {
          case None => Left("User not found")
          case Some(u0) =>
            if (roleName.exists(!validRoles(_)))
              Left("Invalid role. Must be one of: " +
                "user, operator, viewer, admin, super_admin, org_admin, data_engineer")
            else password.filter(_.nonEmpty).map(validatePasswordStrength) match {
              case Some(Left(msg)) => Left(msg)
              case _ =>
                var u = u0
                fullName.foreach(n => u = u.copy(fullName = n))
                roleName.foreach(r => u = u.copy(roleName = r,
                  isSuperuser = r == "admin" || r == "super_admin"))
                isActive.foreach(a => u = u.copy(isActive = a))
                status.foreach(s => u = u.copy(status = s))
                users(userId) = u
                Right(u)
            }
        }
      }

    /** DELETE /users/{user_id} (api.py:11523) — a HARD delete (the
      * endpoint calls `db.delete(user)`, not a deactivate), 404 ladder
      * first. Returns the removed record — the id/email/full_name/role
      * quad the endpoint captures for its audit log before deletion. */
    def deleteUser(userId: String): Either[String, UserRecord] =
      synchronized { users.remove(userId).toRight("User not found") }

    /** GET /roles — stored roles, or the built-in seven when none exist
      * (the endpoint's empty-or-missing-table fallback). */
    def listRoles(): Seq[RoleRecord] =
      synchronized { if (roles.nonEmpty) roles.toSeq else builtinRoles }

    def addRole(name: String, description: String): RoleRecord = synchronized {
      val r = RoleRecord(s"r-${nextSeq()}", name, description)
      roles += r
      r
    }

    /** POST /invitations — the endpoint's branch ladder: role whitelist
      * with viewer fallback, email validation, active-user rejection,
      * PENDING user materialization for a fresh invitee, 7-day expiry
      * (seq units here). */
    def createInvitation(email: String, role: String, invitedBy: String,
        workspaceId: Option[String] = None): Either[String, InvitationRecord] =
      synchronized {
        val effRole = if (validRoles(role)) role else "viewer"
        val e = email.trim.toLowerCase
        if (e.isEmpty || !e.contains("@")) Left("Invalid email")
        else {
          val existing = users.values.find(_.email == e)
          if (existing.exists(_.isActive)) Left("User already exists and is active")
          else {
            if (existing.isEmpty) {
              val u = UserRecord(s"u-${nextSeq()}", e, e.split("@")(0), effRole,
                isActive = false,
                isSuperuser = effRole == "admin" || effRole == "super_admin",
                status = "PENDING", createdSeq = seq)
              users(u.id) = u
            }
            val inv = InvitationRecord(s"i-${nextSeq()}", e, invitedBy,
              token = s"tok-$seq", expiresSeq = seq + 7, status = "PENDING",
              roleName = effRole, workspaceId = workspaceId)
            invitations += inv
            Right(inv)
          }
        }
      }

    /** Bulk import (the user-import endpoint above the role list):
      * per email, an invitation is attempted; duplicates of ACTIVE users
      * are counted as skips, invalid emails as errors — the endpoint's
      * imported/skipped_duplicates/errors/invitation_tokens quad. */
    def importUsers(emails: Seq[String], role: String, invitedBy: String): UserImportResult =
      synchronized {
        val results = emails.map(e => e -> createInvitation(e, role, invitedBy))
        UserImportResult(
          imported = results.count(_._2.isRight),
          skippedDuplicates = results.count(_._2.left.exists(_.contains("already exists"))),
          // a duplicate is a SKIP, not an error — the endpoint separates them
          errors = results.collect {
            case (e, Left(err)) if !err.contains("already exists") => s"$e: $err"
          },
          invitationTokens = results.collect { case (_, Right(inv)) => inv.token })
      }

    /** GET /invitations (api.py:12052) — newest-first listing with the
      * endpoint's full parameter set: optional exact-match `statusFilter`
      * applied first, then `skip` offset, then `limit` — the SQLAlchemy
      * `order_by(created_at.desc()).filter(status).offset(skip)
      * .limit(limit)` chain. Newest-first here is descending expiresSeq
      * (expiry = creation + 7 in seq units, so the order is identical to
      * created_at DESC). */
    def listInvitations(limit: Int = 100, skip: Int = 0,
        statusFilter: Option[String] = None): Seq[InvitationRecord] =
      synchronized {
        val ordered = invitations.sortBy(i => -i.expiresSeq)
        // the endpoint guards with Python truthiness (`if status_filter:`),
        // so an EMPTY-string filter is a no-op there — mirror it, instead
        // of filtering to invitations whose status is literally ""
        val filtered = statusFilter.filter(_.nonEmpty)
          .fold(ordered.toSeq)(s => ordered.filter(_.status == s).toSeq)
        filtered.slice(math.max(skip, 0), math.max(skip, 0) + math.max(limit, 0))
      }

    /** The reference's password-strength ladder (api.py:10789
      * validate_password_strength), verbatim branch order: required →
      * length 8..128 → upper → lower → digit → special. Left = the
      * endpoint's 400 detail. */
    private def validatePasswordStrength(password: String): Either[String, Unit] = {
      val special = "!@#$%^&*()_+-=[]{}|;:,.<>?"
      if (password == null || password.isEmpty) Left("Password is required")
      else if (password.length < 8) Left("Password must be at least 8 characters long")
      else if (password.length > 128) Left("Password must be less than 128 characters")
      else if (!password.exists(_.isUpper)) Left("Password must contain at least one uppercase letter")
      else if (!password.exists(_.isLower)) Left("Password must contain at least one lowercase letter")
      else if (!password.exists(_.isDigit)) Left("Password must contain at least one digit")
      else if (!password.exists(special.contains(_)))
        Left("Password must contain at least one special character (!@#$%^&*()_+-=[]{}|;:,.<>?)")
      else Right(())
    }

    /** POST /invitations/accept (api.py:12087) — token redemption, the
      * exact branch ladder: unknown token → 404 "Invalid or expired
      * invitation token"; non-PENDING → 400 "already used or expired";
      * past expiry → invitation FLIPS to EXPIRED (a state write, not just
      * an error) then 400 "Invitation has expired"; missing user row →
      * 404; weak password → its specific strength message. On success the
      * user activates (ACTIVE, full name from the request or the email's
      * local part), the invitation flips to ACCEPTED, and the activated
      * user is returned. JWT issuance is auth plumbing (out of scope per
      * SURVEY §1); the directory-state transitions are the semantics. */
    def acceptInvitation(token: String, password: String,
        fullName: Option[String] = None): Either[String, UserRecord] =
      synchronized {
        invitations.zipWithIndex.find(_._1.token == token.trim) match {
          case None => Left("Invalid or expired invitation token")
          case Some((inv, idx)) =>
            if (inv.status != "PENDING") Left("Invitation already used or expired")
            else if (inv.expiresSeq < seq) {
              invitations(idx) = inv.copy(status = "EXPIRED")
              Left("Invitation has expired")
            } else users.values.find(_.email == inv.email) match {
              case None => Left("User record not found")
              case Some(user) =>
                validatePasswordStrength(password) match {
                  case Left(msg) => Left(msg)
                  case Right(()) =>
                    val name = fullName.map(_.trim).filter(_.nonEmpty)
                      .orElse(Option(user.fullName).filter(_.nonEmpty))
                      .getOrElse(inv.email.split("@")(0))
                    val activated = user.copy(fullName = name,
                      isActive = true, status = "ACTIVE")
                    users(user.id) = activated
                    invitations(idx) = inv.copy(status = "ACCEPTED")
                    Right(activated)
                }
            }
        }
      }

    /** Test hook: advance the monotone sequence (stands in for wall-clock
      * passage so expiry branches are reachable in specs). */
    private[graft] def advanceSeq(n: Long): Unit = synchronized { seq += n }
  }

  /** Connection-catalog lifecycle — the reference's connection CRUD family
    * (api.py:1239 POST, :1447 GET list, :1555 GET by id, :1665 PUT,
    * :1883 DELETE) as catalog-shaped driver state like [[UserDirectory]]:
    * instance-scoped store, monotone sequence replacing uuid4/utcnow (same
    * uniqueness/ordering role, reproducible in specs). Closes the last
    * catalog-shaped endpoint family without a twin (r13 verdict item 2).
    *
    * Faithful endpoint semantics, including the quirks:
    * - every read/update/delete filters `deleted_at IS NULL` first — a
    *   soft-deleted connection 404s everywhere and drops out of listings;
    * - missing database_type is the 400 with the supported-types detail,
    *   on BOTH create and update;
    * - Snowflake pulls the account from additional_config.account (falling
    *   back to host) and defaults port 443; S3 defaults host
    *   s3.amazonaws.com and port 443 — Python-truthiness on both (an
    *   empty-string host and port 0 count as missing);
    * - POST's final fallback is `host or "s3.amazonaws.com"` for EVERY
    *   database type (the reference comment claims "empty string for
    *   others" but the code says otherwise — mirrored as-is), while PUT
    *   falls back to `""`; POST defaults port 443 for s3/snowflake else
    *   3306, PUT always 3306;
    * - DELETE guards in-use: pipelines referencing the connection as
    *   source OR target block deletion with the count in the message;
    * - `hard_delete=true` removes the row; soft delete stamps deleted_at
    *   and flips is_active false;
    * - responses mask the password as `***` (stored verbatim).
    *
    * Directory metadata (dozens of rows, not 100 TB): driver-side state is
    * the right shape, as with [[UserDirectory]] and the pipeline registry. */
  final class ConnectionDirectory {
    private val store =
      scala.collection.mutable.LinkedHashMap.empty[String, ConnectionRecord]
    private val pipelines =
      scala.collection.mutable.ArrayBuffer.empty[(String, String, String)]
    private var seq = 0L
    private def nextSeq(): Long = { seq += 1; seq }

    private val typeDetail = "database_type is required. Supported types: " +
      "postgresql, mysql, sqlserver, oracle, mongodb, snowflake, s3, as400, db2"

    private def mask(c: ConnectionRecord): ConnectionRecord = c.copy(password = "***")

    /** The snowflake/S3 host+port derivation shared VERBATIM by the POST
      * and PUT endpoints (the branch runs before their differing final
      * fallbacks). Python truthiness throughout: "" and 0 are missing. */
    private def deriveHostPort(d: ConnectionUpsert, dbType: String): (Option[String], Option[Int]) = {
      var host = d.host.filter(_.nonEmpty)
      var port = d.port.filter(_ != 0)
      if (dbType == "snowflake") {
        d.additionalConfig.get("account").filter(_.nonEmpty).orElse(host)
          .foreach(a => host = Some(a))
        if (port.isEmpty) port = Some(443)
      } else if (dbType == "s3" || dbType == "aws_s3") {
        if (host.isEmpty) host = Some("s3.amazonaws.com")
        if (port.isEmpty) port = Some(443)
      }
      (host, port)
    }

    /** POST /connections (api.py:1239). */
    def createConnection(data: ConnectionUpsert): Either[String, ConnectionRecord] =
      synchronized {
        data.databaseType.filter(_.nonEmpty) match {
          case None => Left(typeDetail)
          case Some(dt) =>
            val dbType = dt.toLowerCase
            val (host, port) = deriveHostPort(data, dbType)
            val c = ConnectionRecord(
              id = s"c-${nextSeq()}",
              name = data.name,
              connectionType =
                Option(data.connectionType).filter(_.nonEmpty).getOrElse("source"),
              databaseType = dt,
              // the POST quirk: ANY falsy host falls back to the S3 default
              host = host.getOrElse("s3.amazonaws.com"),
              port = port.getOrElse(
                if (dbType == "s3" || dbType == "aws_s3" || dbType == "snowflake") 443
                else 3306),
              database = data.database, username = data.username,
              password = data.password, schemaName = data.schemaName,
              additionalConfig = data.additionalConfig,
              isActive = true, lastTestStatus = None,
              createdSeq = seq, updatedSeq = seq, deletedSeq = None)
            store(c.id) = c
            Right(mask(c))
        }
      }

    /** GET /connections (api.py:1447) — soft-deleted rows excluded, then
      * the optional is_active filter; insertion order (the reference's
      * unordered `query.all()` over its fixtures). */
    def listConnections(activeOnly: Boolean = false): Seq[ConnectionRecord] =
      synchronized {
        store.values.filter(_.deletedSeq.isEmpty)
          .filter(c => !activeOnly || c.isActive).map(mask).toSeq
      }

    /** GET /connections/{id} (api.py:1555) — None is the endpoint's 404
      * (soft-deleted rows 404 too, same filter). */
    def getConnection(id: String): Option[ConnectionRecord] =
      synchronized { store.get(id).filter(_.deletedSeq.isEmpty).map(mask) }

    /** PUT /connections/{id} (api.py:1665) — full-record replace, the
      * endpoint's branch ladder: 404 for unknown/soft-deleted, 400 for a
      * missing database_type, the shared snowflake/S3 derivation, then
      * PUT's own fallbacks (host `""`, port 3306). All-or-nothing: a
      * validation failure persists nothing. */
    def updateConnection(id: String, data: ConnectionUpsert): Either[String, ConnectionRecord] =
      synchronized {
        store.get(id).filter(_.deletedSeq.isEmpty) match {
          case None => Left(s"Connection not found: $id")
          case Some(c0) =>
            data.databaseType.filter(_.nonEmpty) match {
              case None => Left(typeDetail)
              case Some(dt) =>
                val dbType = dt.toLowerCase
                val (host, port) = deriveHostPort(data, dbType)
                val c = c0.copy(
                  name = data.name, connectionType = data.connectionType,
                  databaseType = dt,
                  host = host.getOrElse(""), port = port.getOrElse(3306),
                  database = data.database, username = data.username,
                  password = data.password, schemaName = data.schemaName,
                  additionalConfig = data.additionalConfig,
                  updatedSeq = nextSeq())
                store(id) = c
                Right(mask(c))
            }
        }
      }

    /** Register a pipeline's connection references — the rows the DELETE
      * endpoint's in-use guard counts (source OR target). */
    def registerPipeline(pipelineId: String,
        sourceConnectionId: String, targetConnectionId: String): Unit =
      synchronized { pipelines += ((pipelineId, sourceConnectionId, targetConnectionId)) }

    /** DELETE /connections/{id} (api.py:1883) — the branch ladder: 404 for
      * unknown/soft-deleted; in-use guard (ANY pipeline referencing the
      * connection as source or target blocks with the count — the
      * reference counts all pipeline rows, with no active-only filter);
      * then hard delete removes the row, soft delete stamps deleted_at and
      * deactivates (listings exclude it from then on). */
    def deleteConnection(id: String, hardDelete: Boolean = false): Either[String, ConnectionDeleteResult] =
      synchronized {
        store.get(id).filter(_.deletedSeq.isEmpty) match {
          case None => Left(s"Connection not found: $id")
          case Some(c) =>
            val inUse = pipelines.count(p => p._2 == id || p._3 == id)
            if (inUse > 0)
              Left(s"Cannot delete connection: $inUse pipeline(s) are using this connection")
            else {
              if (hardDelete) store.remove(id)
              else store(id) = c.copy(deletedSeq = Some(nextSeq()), isActive = false)
              Right(ConnectionDeleteResult(s"Connection $id deleted", hardDelete))
            }
        }
      }

    /** Remove a pipeline's reference rows — the hard-delete side of the
      * in-use guard ([[PipelineDirectory.deletePipeline]] calls this: the
      * reference's hard delete removes the PipelineModel row the guard
      * counts, while a SOFT-deleted pipeline still blocks connection
      * deletion because the guard has no deleted_at filter). */
    private[graft] def unregisterPipeline(pipelineId: String): Unit =
      synchronized { pipelines.filterInPlace(_._1 != pipelineId) }
  }

  /** Pipeline-catalog lifecycle — the reference's pipeline CRUD family
    * (api.py:2871 POST, :3762 PUT, :7362 DELETE) as catalog-shaped driver
    * state, closing the last catalog family without a directory twin
    * (r14 verdict item 3). Start/stop/pause/recover/config-generation
    * live in [[graft.Pipeline]]/[[Recovery]]/[[ConnectorConfig]]; this is
    * the registry the admin screen mutates.
    *
    * Faithful endpoint semantics, including the quirks:
    * - PipelineCreate's Pydantic `extract_from_table_mappings` validator
    *   (api.py:905) runs BEFORE the endpoint and fills
    *   source/target_tables with the mapping names' schema prefixes KEPT
    *   (`source_tables_list.append(source_table)` raw) — which makes the
    *   endpoint's own strip-the-prefix extraction (api.py:2998) dead code
    *   whenever mappings are present. Mirrored: both layers exist, the
    *   validator wins, so tables arrive prefix-kept.
    * - per-mapping schema precedence in the validator: a "schema.table"
    *   prefix beats the mapping's explicit source_schema/target_schema
    *   key (the `if '.' in name / elif tm.get(...)` ladder). The
    *   reference then takes `list(set)[0]` — Python set order; mirrored
    *   as first-encountered, the only deterministic reading.
    * - schema defaults by database type: sqlserver/mssql → "dbo",
    *   snowflake → "PUBLIC", else "public"; and the sqlserver
    *   public→dbo override applies on EVERY target-schema branch
    *   (connection schema, mapping schema, prefix, user-provided) but
    *   never to source schemas.
    * - mode mapping: cdc_enabled (when sent) wins — true maps
    *   full_load_type=="overwrite" to full_load_and_cdc else cdc_only,
    *   false to full_load_only; otherwise the deprecated enable_full_load
    *   ladder; otherwise the mode field verbatim.
    * - PUT refuses RUNNING/STARTING/STOPPING with the stop-first detail,
    *   then field-if-provided partial update (no derivation re-run — the
    *   reference PUT assigns raw values, quirks included).
    * - DELETE defaults hard_delete=TRUE — the OPPOSITE of the connections
    *   endpoint — and the hard lookup INCLUDES soft-deleted rows (so
    *   hard-after-soft succeeds where soft-after-soft 404s); stop-first
    *   continues on failure; per-connector teardown warns, never aborts;
    *   the response carries the connector names and the Kafka topic list
    *   regardless of teardown outcome. The reference's warning log lines
    *   surface as `warnings` data so specs can pin each branch.
    *
    * Directory metadata (dozens of rows, not 100 TB): driver-side state
    * is the right shape, as with [[UserDirectory]]/[[ConnectionDirectory]]. */
  final class PipelineDirectory(connections: ConnectionDirectory) {
    private val store =
      scala.collection.mutable.LinkedHashMap.empty[String, PipelineRecord]
    private var seq = 0L
    private def nextSeq(): Long = { seq += 1; seq }

    /** Failure injection for the delete ladder's warning branches (stands
      * in for the reference's Kafka Connect REST errors). */
    private[graft] var stopFails: Set[String] = Set.empty
    private[graft] var connectorDeleteFails: Set[String] = Set.empty

    private val validModes = Set("full_load_only", "cdc_only", "full_load_and_cdc")

    private def truthy(tm: Map[String, String], keys: String*): Option[String] =
      keys.iterator.flatMap(tm.get).find(_.nonEmpty)

    /** The Pydantic validator (api.py:905): fills tables/schemas from
      * table_mappings, names kept VERBATIM (prefixes and all). */
    private def applyMappingsValidator(d: PipelineCreateRequest): PipelineCreateRequest = {
      if (d.tableMappings.isEmpty) d
      else {
        val srcTables = scala.collection.mutable.ArrayBuffer.empty[String]
        val srcSchemas = scala.collection.mutable.LinkedHashSet.empty[String]
        val tgtTables = scala.collection.mutable.ArrayBuffer.empty[String]
        val tgtSchemas = scala.collection.mutable.LinkedHashSet.empty[String]
        d.tableMappings.foreach { tm =>
          truthy(tm, "source_table", "sourceTable", "source").foreach { t =>
            srcTables += t
            if (t.contains('.')) srcSchemas += t.split("\\.", 2)(0)
            else truthy(tm, "source_schema").foreach(srcSchemas += _)
          }
          truthy(tm, "target_table", "targetTable", "target").foreach { t =>
            tgtTables += t
            if (t.contains('.')) tgtSchemas += t.split("\\.", 2)(0)
            else truthy(tm, "target_schema").foreach(tgtSchemas += _)
          }
        }
        d.copy(
          sourceTables = d.sourceTables.filter(_.nonEmpty)
            .orElse(Option(srcTables.toSeq).filter(_.nonEmpty)),
          sourceSchema = d.sourceSchema.filter(_.nonEmpty)
            .orElse(srcSchemas.headOption),
          targetTables = d.targetTables.filter(_.nonEmpty)
            .orElse(Option(tgtTables.toSeq).filter(_.nonEmpty)),
          targetSchema = d.targetSchema.filter(_.nonEmpty)
            .orElse(tgtSchemas.headOption))
      }
    }

    private def defaultSchema(dbType: String): String =
      if (dbType == "sqlserver" || dbType == "mssql") "dbo"
      else if (dbType == "snowflake") "PUBLIC"
      else "public"

    /** The sqlserver public→dbo override the target ladder applies on
      * every branch (api.py:3040-3150). */
    private def overrideForType(dbType: String, schema: String): String =
      if ((dbType == "sqlserver" || dbType == "mssql") && schema.toLowerCase == "public") "dbo"
      else schema

    /** POST /pipelines (api.py:2871). */
    def createPipeline(data0: PipelineCreateRequest): Either[String, PipelineRecord] =
      synchronized {
        val data = applyMappingsValidator(data0)
        connections.getConnection(data.sourceConnectionId) match {
          case None => Left(s"Source connection not found: ${data.sourceConnectionId}")
          case Some(src) => connections.getConnection(data.targetConnectionId) match {
            case None => Left(s"Target connection not found: ${data.targetConnectionId}")
            case Some(tgt) =>
              val srcType = src.databaseType.toLowerCase
              val sourceDatabase = data.sourceDatabase.filter(_.nonEmpty)
                .orElse(Option(src.database).filter(_.nonEmpty))
              val sourceSchema = data.sourceSchema.filter(_.nonEmpty)
                .orElse(src.schemaName.filter(_.nonEmpty))
                // endpoint's first_tm branch (api.py:2975) — reachable only
                // when the validator found no schema anywhere, i.e. never
                // with well-formed mappings; kept for fidelity
                .orElse(data.tableMappings.headOption.flatMap { tm =>
                  truthy(tm, "source_schema").orElse(
                    truthy(tm, "source_table").filter(_.contains('.'))
                      .map(_.split("\\.", 2)(0)))
                })
                .orElse(Some(defaultSchema(srcType)))
              // endpoint extraction strips prefixes — dead when the
              // validator already filled the list (prefix-kept)
              val sourceTables = data.sourceTables.filter(_.nonEmpty).getOrElse(
                data.tableMappings.flatMap(tm =>
                  truthy(tm, "source_table", "sourceTable", "source")
                    .map(t => if (t.contains('.')) t.split("\\.", 2)(1) else t)))
              if (sourceDatabase.isEmpty)
                Left("source_database is required. Provide it directly or ensure connection has a database.")
              else if (sourceSchema.exists(_.isEmpty))
                Left("source_schema is required. Provide it directly, in table_mappings, or ensure connection has a schema.")
              else if (sourceTables.isEmpty)
                Left("source_tables is required. Provide it directly or in table_mappings.")
              else {
                val tgtType = tgt.databaseType.toLowerCase
                val targetDatabase = data.targetDatabase.filter(_.nonEmpty)
                  .getOrElse(tgt.database)
                val targetSchema = data.targetSchema.filter(_.nonEmpty) match {
                  case Some(provided) => overrideForType(tgtType, provided)
                  case None =>
                    tgt.schemaName.filter(_.nonEmpty)
                      .map(overrideForType(tgtType, _))
                      .orElse(data.tableMappings.headOption.flatMap { tm =>
                        truthy(tm, "target_schema").orElse(
                          truthy(tm, "target_table").filter(_.contains('.'))
                            .map(_.split("\\.", 2)(0)))
                          .map(overrideForType(tgtType, _))
                      })
                      .getOrElse(defaultSchema(tgtType))
                }
                val targetTables = data.targetTables.filter(_.nonEmpty).getOrElse(
                  data.tableMappings.flatMap(tm =>
                    truthy(tm, "target_table", "targetTable", "target")
                      .map(t => if (t.contains('.')) t.split("\\.", 2)(1) else t)))
                val mode = data.cdcEnabled match {
                  case Some(true) =>
                    if (data.fullLoadType.contains("overwrite")) "full_load_and_cdc"
                    else "cdc_only"
                  case Some(false) => "full_load_only"
                  case None => data.enableFullLoad match {
                    case Some(true) =>
                      if (data.mode == "cdc_only") "full_load_and_cdc" else data.mode
                    case Some(false) => "cdc_only"
                    case None => data.mode
                  }
                }
                val p = PipelineRecord(
                  id = s"p-${nextSeq()}", name = data.name,
                  sourceConnectionId = data.sourceConnectionId,
                  targetConnectionId = data.targetConnectionId,
                  sourceDatabase = sourceDatabase.get,
                  sourceSchema = sourceSchema.get,
                  sourceTables = sourceTables,
                  targetDatabase = targetDatabase,
                  targetSchema = targetSchema,
                  targetTables = targetTables,
                  mode = mode, enableFullLoad = data.enableFullLoad,
                  autoCreateTarget = data.autoCreateTarget,
                  targetTableMapping = data.targetTableMapping,
                  tableFilter = data.tableFilter,
                  status = "STOPPED", fullLoadStatus = "NOT_STARTED",
                  cdcStatus = "NOT_STARTED",
                  debeziumConnectorName = None, sinkConnectorName = None,
                  kafkaTopics = Seq.empty,
                  createdSeq = seq, updatedSeq = seq, deletedSeq = None)
                store(p.id) = p
                connections.registerPipeline(p.id,
                  data.sourceConnectionId, data.targetConnectionId)
                Right(p)
              }
          }
        }
      }

    /** PUT /pipelines/{id} (api.py:3762) — 404 for unknown/soft-deleted,
      * 400 while RUNNING/STARTING/STOPPING, then field-if-provided
      * assignment (raw — the PUT re-runs none of POST's derivations). */
    def updatePipeline(id: String, data: PipelineUpdateRequest): Either[String, PipelineRecord] =
      synchronized {
        store.get(id).filter(_.deletedSeq.isEmpty) match {
          case None => Left(s"Pipeline not found: $id")
          case Some(p0) if Set("RUNNING", "STARTING", "STOPPING")(p0.status) =>
            Left(s"Cannot update a ${p0.status.toLowerCase} pipeline. Please stop it first.")
          case Some(p0) =>
            data.mode.filterNot(validModes) match {
              case Some(bad) => Left(s"'$bad' is not a valid PipelineMode")
              case None =>
                val p = p0.copy(
                  name = data.name.getOrElse(p0.name),
                  sourceConnectionId =
                    data.sourceConnectionId.getOrElse(p0.sourceConnectionId),
                  targetConnectionId =
                    data.targetConnectionId.getOrElse(p0.targetConnectionId),
                  sourceDatabase = data.sourceDatabase.getOrElse(p0.sourceDatabase),
                  sourceSchema = data.sourceSchema.getOrElse(p0.sourceSchema),
                  sourceTables = data.sourceTables.getOrElse(p0.sourceTables),
                  targetDatabase = data.targetDatabase.getOrElse(p0.targetDatabase),
                  targetSchema = data.targetSchema.getOrElse(p0.targetSchema),
                  targetTables = data.targetTables.getOrElse(p0.targetTables),
                  mode = data.mode.getOrElse(p0.mode),
                  enableFullLoad = data.enableFullLoad.orElse(p0.enableFullLoad),
                  autoCreateTarget = data.autoCreateTarget.getOrElse(p0.autoCreateTarget),
                  targetTableMapping =
                    data.targetTableMapping.getOrElse(p0.targetTableMapping),
                  tableFilter = data.tableFilter.orElse(p0.tableFilter),
                  updatedSeq = nextSeq())
                store(id) = p
                Right(p)
            }
        }
      }

    /** DELETE /pipelines/{id} (api.py:7362) — hard_delete defaults TRUE
      * (the connections endpoint's inverse); hard lookup includes
      * soft-deleted rows; stop-first and connector teardown warn and
      * continue; the response carries connector names + topics. */
    def deletePipeline(id: String, hardDelete: Boolean = true): Either[String, PipelineDeleteResult] =
      synchronized {
        val found =
          if (hardDelete) store.get(id) else store.get(id).filter(_.deletedSeq.isEmpty)
        found match {
          case None => Left(s"Pipeline not found: $id")
          case Some(p) =>
            val warnings = scala.collection.mutable.ArrayBuffer.empty[String]
            if (stopFails(id))
              warnings += s"Failed to stop pipeline before deletion: stop failed for $id"
            else if (store.contains(id))
              store(id) = store(id).copy(status = "STOPPED")
            p.debeziumConnectorName.foreach { c =>
              if (connectorDeleteFails(c))
                warnings += s"Failed to delete Debezium connector $c: delete failed"
            }
            p.sinkConnectorName.foreach { c =>
              if (connectorDeleteFails(c))
                warnings += s"Failed to delete Sink connector $c: delete failed"
            }
            if (hardDelete) {
              store.remove(id)
              connections.unregisterPipeline(id)
            } else {
              store(id) = store(id).copy(deletedSeq = Some(nextSeq()))
            }
            Right(PipelineDeleteResult(
              message = s"Pipeline $id ${if (hardDelete) "permanently deleted" else "soft deleted"}",
              hardDelete = hardDelete,
              deletedDebeziumConnector = p.debeziumConnectorName,
              deletedSinkConnector = p.sinkConnectorName,
              unregisteredTopics = p.kafkaTopics,
              warnings = warnings.toSeq))
        }
      }

    /** GET by id with the standard deleted_at filter (for specs). */
    def getPipeline(id: String): Option[PipelineRecord] =
      synchronized { store.get(id).filter(_.deletedSeq.isEmpty) }

    def listPipelines(): Seq[PipelineRecord] =
      synchronized { store.values.filter(_.deletedSeq.isEmpty).toSeq }

    /** Raw row regardless of deleted_at — lets specs observe the
      * soft-deleted state the hard lookup targets. */
    private[graft] def getRaw(id: String): Option[PipelineRecord] =
      synchronized { store.get(id) }

    /** Test hooks: the runtime fields the start path populates in the
      * reference (status transitions, connector names, topic registry). */
    private[graft] def setStatus(id: String, status: String): Unit =
      synchronized { store.get(id).foreach(p => store(id) = p.copy(status = status)) }
    private[graft] def setConnectors(id: String, debezium: Option[String],
        sink: Option[String], topics: Seq[String]): Unit =
      synchronized {
        store.get(id).foreach(p => store(id) = p.copy(
          debeziumConnectorName = debezium, sinkConnectorName = sink,
          kafkaTopics = topics))
      }
  }
}

/** Row shape of [[Discovery.connectionTest]] — the reference's test
  * response minus the wall-clock `tested_at` (callers stamp it; keeping
  * the function clock-free keeps it reproducible in specs). */
case class ConnectionTestResult(success: Boolean, status: String,
                                error: String, probed: Boolean,
                                responseTimeMs: Long)

/** Row shape of [[Discovery.TestHistory]] — the reference's test-history
  * record (id / status / response_time_ms / error_message / tested_at),
  * with the wall-clock stamp replaced by the monotone `testedSeq`. */
case class ConnectionTestRecord(id: Long, connectionId: String, status: String,
                                responseTimeMs: Long, errorMessage: Option[String],
                                testedSeq: Long)

/** Per-table row of [[Discovery.validateTableSelection]] — the
  * reference's table_details entry (name/exists/has_primary_key plus its
  * errors/warnings lists). */
case class TableSelectionDetail(name: String, exists: Boolean,
                                hasPrimaryKey: Boolean,
                                errors: Seq[String], warnings: Seq[String])

/** Verdict shape of [[Discovery.validateTableSelection]] — the endpoint's
  * valid/errors/warnings/table_details split. */
case class TableSelectionResult(valid: Boolean, errors: Seq[String],
                                warnings: Seq[String],
                                tableDetails: Seq[TableSelectionDetail])

/** Row shape of the reference's UserResponse (api.py:11189) minus the
  * wall-clock created/updated stamps (monotone `createdSeq` keeps the
  * ordering role, reproducibly). */
case class UserRecord(id: String, email: String, fullName: String,
                      roleName: String, isActive: Boolean,
                      isSuperuser: Boolean, status: String, createdSeq: Long)

/** Row shape of RoleResponse (api.py:11973). */
case class RoleRecord(id: String, name: String, description: String)

/** Row shape of InvitationResponse (api.py:12052) with the random token
  * and wall-clock expiry replaced by sequence-derived values. */
case class InvitationRecord(id: String, email: String, invitedBy: String,
                            token: String, expiresSeq: Long, status: String,
                            roleName: String, workspaceId: Option[String])

/** The user-import endpoint's imported/skipped/errors/tokens quad. */
case class UserImportResult(imported: Int, skippedDuplicates: Int,
                            errors: Seq[String], invitationTokens: Seq[String])

/** Request shape of the reference's ConnectionCreate model (api.py:775),
  * shared by POST and PUT exactly as the endpoints share it. Defaults
  * mirror the Pydantic fields (name/database/username/password default
  * empty, connection_type defaults "source", the rest optional). */
case class ConnectionUpsert(name: String = "",
                            connectionType: String = "source",
                            databaseType: Option[String] = None,
                            host: Option[String] = None,
                            port: Option[Int] = None,
                            database: String = "",
                            username: String = "",
                            password: String = "",
                            schemaName: Option[String] = None,
                            additionalConfig: Map[String, String] = Map.empty)

/** Row shape of the connection CRUD responses (api.py:1239/1447/1555/1665)
  * with uuid4/utcnow replaced by the monotone sequence
  * (created/updated/deleted seq keep the ordering and null-vs-set roles).
  * `password` is masked `***` on every directory read; `deletedSeq`
  * non-empty marks a soft-deleted row (excluded from reads). */
case class ConnectionRecord(id: String, name: String, connectionType: String,
                            databaseType: String, host: String, port: Int,
                            database: String, username: String,
                            password: String, schemaName: Option[String],
                            additionalConfig: Map[String, String],
                            isActive: Boolean, lastTestStatus: Option[String],
                            createdSeq: Long, updatedSeq: Long,
                            deletedSeq: Option[Long])

/** The DELETE endpoint's message/hard_delete response pair. */
case class ConnectionDeleteResult(message: String, hardDelete: Boolean)

/** Request shape of the reference's PipelineCreate model (api.py:879).
  * Defaults mirror the Pydantic fields: mode defaults full_load_and_cdc,
  * auto_create_target true, everything else optional. `tableMappings`
  * carries the frontend's per-table dicts (string-valued keys are the
  * only ones the extraction reads). */
case class PipelineCreateRequest(
    name: String,
    sourceConnectionId: String,
    targetConnectionId: String,
    sourceDatabase: Option[String] = None,
    sourceSchema: Option[String] = None,
    sourceTables: Option[Seq[String]] = None,
    targetDatabase: Option[String] = None,
    targetSchema: Option[String] = None,
    targetTables: Option[Seq[String]] = None,
    mode: String = "full_load_and_cdc",
    enableFullLoad: Option[Boolean] = None,
    autoCreateTarget: Boolean = true,
    targetTableMapping: Map[String, String] = Map.empty,
    tableFilter: Option[String] = None,
    tableMappings: Seq[Map[String, String]] = Seq.empty,
    fullLoadType: Option[String] = None,
    cdcEnabled: Option[Boolean] = None)

/** Request shape of PipelineUpdate (api.py:1033) — every field optional,
  * absent means keep. */
case class PipelineUpdateRequest(
    name: Option[String] = None,
    sourceConnectionId: Option[String] = None,
    targetConnectionId: Option[String] = None,
    sourceDatabase: Option[String] = None,
    sourceSchema: Option[String] = None,
    sourceTables: Option[Seq[String]] = None,
    targetDatabase: Option[String] = None,
    targetSchema: Option[String] = None,
    targetTables: Option[Seq[String]] = None,
    mode: Option[String] = None,
    enableFullLoad: Option[Boolean] = None,
    autoCreateTarget: Option[Boolean] = None,
    targetTableMapping: Option[Map[String, String]] = None,
    tableFilter: Option[String] = None)

/** Row shape of the pipeline CRUD responses (PipelineModel,
  * models_db.py:93) with uuid4/utcnow replaced by the monotone sequence;
  * `deletedSeq` non-empty marks a soft-deleted row. The connector names /
  * topic list are the runtime fields the start path populates — carried
  * here because the DELETE response reports them. */
case class PipelineRecord(
    id: String, name: String,
    sourceConnectionId: String, targetConnectionId: String,
    sourceDatabase: String, sourceSchema: String, sourceTables: Seq[String],
    targetDatabase: String, targetSchema: String, targetTables: Seq[String],
    mode: String, enableFullLoad: Option[Boolean], autoCreateTarget: Boolean,
    targetTableMapping: Map[String, String], tableFilter: Option[String],
    status: String, fullLoadStatus: String, cdcStatus: String,
    debeziumConnectorName: Option[String], sinkConnectorName: Option[String],
    kafkaTopics: Seq[String],
    createdSeq: Long, updatedSeq: Long, deletedSeq: Option[Long])

/** The pipeline DELETE endpoint's response: message / hard_delete /
  * deleted_connectors {debezium, sink} / unregistered_topics, plus the
  * reference's warning log lines surfaced as data so the
  * continue-on-failure branches are observable in specs. */
case class PipelineDeleteResult(message: String, hardDelete: Boolean,
    deletedDebeziumConnector: Option[String],
    deletedSinkConnector: Option[String],
    unregisteredTopics: Seq[String],
    warnings: Seq[String])
