package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** Role/grant DDL synthesis + dialect gate (reference
  * postgres/update.py:92-127). Derby cannot run PG role DDL, so — exactly
  * like the COPY pumps — synthesis and gating are unit-covered here and
  * the live path runs only against real PostgreSQL. The Derby dbToDb /
  * pqToDb integration tests in JdbcIntegrationSpec run with
  * `createRoles` at its default `true`, proving the gate keeps non-PG
  * destinations untouched. */
class PgRolesSpec extends AnyFunSuite {

  test("access role is schema-derived") {
    assert(PgRoles.accessRole("crsp") == "crsp_access")
  }

  test("schema creation is idempotent DDL") {
    assert(PgRoles.createSchemaSql("crsp") ==
      """CREATE SCHEMA IF NOT EXISTS "crsp"""")
  }

  test("schema role DDL: both roles missing -> create both, then owner+usage") {
    assert(PgRoles.schemaRoleDdl("crsp", ownerExists = false,
      accessExists = false) == Seq(
      """CREATE ROLE "crsp"""",
      """CREATE ROLE "crsp_access"""",
      """ALTER SCHEMA "crsp" OWNER TO "crsp"""",
      """GRANT USAGE ON SCHEMA "crsp" TO "crsp_access""""))
  }

  test("schema role DDL: existing roles are not re-created; owner+usage " +
    "always re-asserted (reference behavior)") {
    assert(PgRoles.schemaRoleDdl("crsp", ownerExists = true,
      accessExists = false) == Seq(
      """CREATE ROLE "crsp_access"""",
      """ALTER SCHEMA "crsp" OWNER TO "crsp"""",
      """GRANT USAGE ON SCHEMA "crsp" TO "crsp_access""""))
    assert(PgRoles.schemaRoleDdl("crsp", ownerExists = true,
      accessExists = true) == Seq(
      """ALTER SCHEMA "crsp" OWNER TO "crsp"""",
      """GRANT USAGE ON SCHEMA "crsp" TO "crsp_access""""))
  }

  test("table role DDL: OWNER TO schema role, SELECT to access role") {
    assert(PgRoles.tableRolesDdl("crsp", "dsf") == Seq(
      """ALTER TABLE "crsp"."dsf" OWNER TO "crsp"""",
      """GRANT SELECT ON "crsp"."dsf" TO "crsp_access""""))
  }

  test("identifiers with embedded quotes cannot break out of the DDL") {
    assert(PgRoles.tableRolesDdl("s\"x", "t") == Seq(
      "ALTER TABLE \"s\"\"x\".\"t\" OWNER TO \"s\"\"x\"",
      "GRANT SELECT ON \"s\"\"x\".\"t\" TO \"s\"\"x_access\""))
  }

  test("runtime application is PostgreSQL-gated") {
    intercept[IllegalArgumentException] {
      PgRoles.ensureSchemaAndRoles("jdbc:derby:memory:x;create=true", "s")
    }
    intercept[IllegalArgumentException] {
      PgRoles.applyTableRoles("jdbc:derby:memory:x;create=true", "s", "t")
    }
  }
}
