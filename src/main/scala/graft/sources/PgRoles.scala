package graft.sources

import java.sql.DriverManager

/** Destination role/grant management for PostgreSQL mirrors (reference
  * postgres/update.py:92-127 `_ensure_schema_and_roles` /
  * `_apply_table_roles`; `create_roles=True` is the reference's public
  * default).
  *
  * The reference's contract, reproduced exactly: the destination schema is
  * created when absent; a role named after the schema owns the schema and
  * every loaded table; a `<schema>_access` role holds USAGE on the schema
  * and SELECT on every loaded table — so a shared research database gets a
  * grantable read surface per schema out of the box.
  *
  * DDL synthesis is pure and unit-tested ([[schemaRoleDdl]],
  * [[tableRolesDdl]]); execution is PostgreSQL-gated the same way the COPY
  * pumps are — `CREATE ROLE`/`ALTER ... OWNER TO`/`GRANT` are PG-dialect
  * statements Derby and friends cannot run, so on a non-PG destination the
  * façade simply skips role management (and [[ensureSchemaAndRoles]]
  * refuses to run outright). PostgreSQL has no `CREATE ROLE IF NOT
  * EXISTS`, so existence is probed via `pg_roles` first, exactly as the
  * reference does (update.py:78-81).
  */
object PgRoles {

  /** The read-access role for a schema (update.py:106). */
  def accessRole(schema: String): String = s"${schema}_access"

  /** Idempotent schema creation (PG supports IF NOT EXISTS here). */
  def createSchemaSql(schema: String): String =
    s"CREATE SCHEMA IF NOT EXISTS ${Jdbc.sqlIdent(schema)}"

  /** Role DDL given probed existence: create missing roles, then (always,
    * as the reference does) re-assert schema ownership and USAGE. */
  def schemaRoleDdl(
      schema: String,
      ownerExists: Boolean,
      accessExists: Boolean): Seq[String] = {
    val owner = Jdbc.sqlIdent(schema)
    val access = Jdbc.sqlIdent(accessRole(schema))
    (if (ownerExists) Nil else Seq(s"CREATE ROLE $owner")) ++
      (if (accessExists) Nil else Seq(s"CREATE ROLE $access")) ++
      Seq(
        s"ALTER SCHEMA ${Jdbc.sqlIdent(schema)} OWNER TO $owner",
        s"GRANT USAGE ON SCHEMA ${Jdbc.sqlIdent(schema)} TO $access")
  }

  /** Per-table ownership + read grant (update.py:124-127), applied after
    * each load. */
  def tableRolesDdl(schema: String, table: String): Seq[String] = {
    val qt = s"${Jdbc.sqlIdent(schema)}.${Jdbc.sqlIdent(table)}"
    Seq(
      s"ALTER TABLE $qt OWNER TO ${Jdbc.sqlIdent(schema)}",
      s"GRANT SELECT ON $qt TO ${Jdbc.sqlIdent(accessRole(schema))}")
  }

  /** `pg_roles` probe (update.py:78-81) — parameterized, never
    * interpolated. */
  def roleExists(url: String, role: String): Boolean = {
    val conn = DriverManager.getConnection(url)
    try {
      val st = conn.prepareStatement(
        "SELECT 1 FROM pg_roles WHERE rolname = ? LIMIT 1")
      try {
        st.setString(1, role)
        val rs = st.executeQuery()
        try rs.next() finally rs.close()
      } finally st.close()
    } finally conn.close()
  }

  /** Ensure the schema exists and (optionally) its owner/access roles with
    * schema-level grants — the reference's `_ensure_schema_and_roles`.
    * PostgreSQL destinations only. */
  def ensureSchemaAndRoles(
      url: String,
      schema: String,
      createRoles: Boolean = true): Unit = {
    require(PgCopy.isPostgres(url),
      s"role/schema management is PostgreSQL-only (got $url)")
    PgCopy.execDdl(url, Seq(createSchemaSql(schema)))
    if (createRoles)
      PgCopy.execDdl(url, schemaRoleDdl(schema,
        ownerExists = roleExists(url, schema),
        accessExists = roleExists(url, accessRole(schema))))
  }

  /** Apply per-table ownership/grants — the reference's
    * `_apply_table_roles`. PostgreSQL destinations only. */
  def applyTableRoles(url: String, schema: String, table: String): Unit = {
    require(PgCopy.isPostgres(url),
      s"role/schema management is PostgreSQL-only (got $url)")
    PgCopy.execDdl(url, tableRolesDdl(schema, table))
  }
}
