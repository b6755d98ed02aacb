package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.io.JdbcSinks

/** Live-PostgreSQL integration for the [[JdbcSinks.PostgresUpsert]]
  * dialect — the one surface Derby cannot exercise (`ON CONFLICT` is
  * Postgres SQL; reference runs PostgreSQL 17, `docker-compose.yml:3`,
  * `init_db.sql:17-19`).
  *
  * Guarded testcontainers-style: every test `assume`s `PG_URL`, so the
  * suite CANCELS (not fails, not passes vacuously) in the no-DB sandbox
  * and runs end-to-end wherever a reachable Postgres is provided, e.g.
  * `PG_URL='jdbc:postgresql://localhost:5432/graft?user=u&password=p'`.
  * The dialect SQL under test is exactly what ships — no test-only
  * variant.
  */
class PostgresIntegrationSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val pgUrl = sys.env.get("PG_URL")

  private def withConn[A](url: String)(body: java.sql.Connection => A): A = {
    val conn = java.sql.DriverManager.getConnection(url)
    try body(conn) finally conn.close()
  }

  test("dialectFor routes a live Postgres URL to the ON CONFLICT merge") {
    assume(pgUrl.isDefined, "PG_URL not set — live-Postgres suite skipped")
    assert(JdbcSinks.dialectFor(pgUrl.get) == JdbcSinks.PostgresUpsert)
  }

  test("PostgresUpsert merges idempotently against live PostgreSQL") {
    assume(pgUrl.isDefined, "PG_URL not set — live-Postgres suite skipped")
    val url = pgUrl.get
    val table = "graft_pg_upsert_spec"
    withConn(url) { conn =>
      val st = conn.createStatement()
      st.execute(s"DROP TABLE IF EXISTS $table")
      st.execute(
        s"""CREATE TABLE $table (
           |  summary_date DATE NOT NULL, hour_of_day INT NOT NULL,
           |  machine_id VARCHAR(50) NOT NULL, cycle_count BIGINT,
           |  PRIMARY KEY (summary_date, hour_of_day, machine_id))""".stripMargin)
      st.close()
    }
    val d = java.sql.Date.valueOf("2024-10-16")
    val keys = Seq("summary_date", "hour_of_day", "machine_id")
    def frame(rows: Seq[(java.sql.Date, Int, String, Long)]) =
      rows.toDF("summary_date", "hour_of_day", "machine_id", "cycle_count")

    // first write inserts; routed dialect, not a hardcoded one
    JdbcSinks.upsert(frame(Seq((d, 0, "M1", 10L), (d, 1, "M1", 20L))),
      url, table, keys, JdbcSinks.dialectFor(url))
    // second write: one key updated in place, one new key inserted —
    // the reference's append would die (or swallow) on the PK here
    JdbcSinks.upsert(frame(Seq((d, 0, "M1", 99L), (d, 2, "M1", 30L))),
      url, table, keys, JdbcSinks.dialectFor(url))

    val got = JdbcSinks.read(spark, url, table)
      .select("summary_date", "hour_of_day", "machine_id", "cycle_count")
      .as[(java.sql.Date, Int, String, Long)].collect().toSet
    assert(got == Set((d, 0, "M1", 99L), (d, 1, "M1", 20L), (d, 2, "M1", 30L)))
    withConn(url)(_.createStatement().execute(s"DROP TABLE $table"))
  }

  test("re-running the identical batch is a no-op on row count (idempotence)") {
    assume(pgUrl.isDefined, "PG_URL not set — live-Postgres suite skipped")
    val url = pgUrl.get
    val table = "graft_pg_idem_spec"
    withConn(url) { conn =>
      val st = conn.createStatement()
      st.execute(s"DROP TABLE IF EXISTS $table")
      st.execute(
        s"""CREATE TABLE $table (
           |  k INT NOT NULL PRIMARY KEY, v BIGINT)""".stripMargin)
      st.close()
    }
    val df = Seq((1, 5L), (2, 6L)).toDF("k", "v")
    JdbcSinks.upsert(df, url, table, Seq("k"), JdbcSinks.dialectFor(url))
    JdbcSinks.upsert(df, url, table, Seq("k"), JdbcSinks.dialectFor(url))
    assert(JdbcSinks.read(spark, url, table).count() == 2)
    withConn(url)(_.createStatement().execute(s"DROP TABLE $table"))
  }
}
