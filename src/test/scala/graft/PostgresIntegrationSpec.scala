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

  test("full machine-day pipeline round-trips through the reference DDL") {
    assume(pgUrl.isDefined, "PG_URL not set — live-Postgres suite skipped")
    val url = pgUrl.get
    // The reference's own table shapes (`src/init_db.sql:4-42`): BIGSERIAL
    // surrogate key on events, NUMERIC columns at the reference scales,
    // composite PK on the summary. Nothing test-shaped about the DDL.
    withConn(url) { conn =>
      val st = conn.createStatement()
      st.execute("DROP TABLE IF EXISTS graft_pg_events_spec")
      st.execute("DROP TABLE IF EXISTS graft_pg_summary_spec")
      st.execute(
        """CREATE TABLE graft_pg_events_spec (
          |  event_id BIGSERIAL PRIMARY KEY,
          |  event_timestamp TIMESTAMP WITH TIME ZONE NOT NULL,
          |  machine_id VARCHAR(50) NOT NULL,
          |  event_name VARCHAR(50) NOT NULL,
          |  parameter_name VARCHAR(50) NULL,
          |  value NUMERIC(7, 2) NULL,
          |  is_error INT CHECK (is_error IN (0, 1)) NOT NULL,
          |  cycle_seq BIGINT NOT NULL,
          |  cycle_time_seconds NUMERIC(10, 3) NULL)""".stripMargin)
      st.execute(
        """CREATE TABLE graft_pg_summary_spec (
          |  summary_date DATE NOT NULL,
          |  hour_of_day INT NOT NULL CHECK (hour_of_day >= 0 AND hour_of_day <= 23),
          |  machine_id VARCHAR(50) NOT NULL,
          |  avg_pick_force NUMERIC(7, 2), max_pick_force NUMERIC(7, 2),
          |  min_pick_force NUMERIC(7, 2),
          |  avg_place_force NUMERIC(7, 2), max_place_force NUMERIC(7, 2),
          |  min_place_force NUMERIC(7, 2),
          |  as_vacuum_error_count INT, pp_vacuum_error_count INT,
          |  as_release_error_count INT, pp_release_error_count INT,
          |  pick_force_error_count INT, place_force_error_count INT,
          |  cycle_count INT,
          |  min_cycle_time_seconds NUMERIC(10, 3),
          |  max_cycle_time_seconds NUMERIC(10, 3),
          |  avg_cycle_time_seconds NUMERIC(10, 3),
          |  PRIMARY KEY (summary_date, hour_of_day, machine_id))""".stripMargin)
      st.close()
    }
    graft.fixtures.Fixtures.ensure(spark)
    val out = graft.pipeline.DailyAggregatorJob.run(
      spark, graft.fixtures.Fixtures.rawCsv, graft.model.Rules.referenceDefaults)
    try {
      val events = out.enrichedEvents.cache()
      val summary = out.hourlySummary.cache()
      val nEvents = events.count()

      // S2: events append (reference appends blindly behind a serial PK).
      JdbcSinks.append(events, url, "graft_pg_events_spec")
      assert(JdbcSinks.read(spark, url, "graft_pg_events_spec").count() == nEvents)
      // Second append duplicates — the serial PK absorbs it (parity with
      // the reference's no-dedup daily batch, `daily_aggregator.py`).
      JdbcSinks.append(events, url, "graft_pg_events_spec")
      assert(JdbcSinks.read(spark, url, "graft_pg_events_spec").count() == 2 * nEvents)

      // S3: summary upsert, twice — idempotent on the composite PK.
      JdbcSinks.upsert(summary, url, "graft_pg_summary_spec",
        Seq("summary_date", "hour_of_day", "machine_id"), JdbcSinks.dialectFor(url))
      JdbcSinks.upsert(summary, url, "graft_pg_summary_spec",
        Seq("summary_date", "hour_of_day", "machine_id"), JdbcSinks.dialectFor(url))

      // Read back through S5 and compare against the batch output exactly:
      // every numeric is pre-rounded to its NUMERIC scale (F4), so the
      // decimal round-trip must be lossless once cast back to batch types.
      val cols = summary.columns.toSeq
      val gotRows = {
        val back = JdbcSinks.read(spark, url, "graft_pg_summary_spec")
        back.select(cols.map { c =>
          org.apache.spark.sql.functions.col(c)
            .cast(summary.schema(c).dataType).as(c)
        }: _*).collect().toSet
      }
      assert(gotRows == summary.collect().toSet,
        "live-Postgres summary read-back diverged from the batch output")

      // In-place update: bump one hour's cycle_count, re-upsert, row count
      // unchanged, new value visible.
      import org.apache.spark.sql.functions.{col => c}
      val bumpedRow = summary
        .orderBy("summary_date", "hour_of_day", "machine_id").limit(1)
        .withColumn("cycle_count", c("cycle_count") + 1000000L)
      val bumpKey = bumpedRow
        .select("summary_date", "hour_of_day", "machine_id", "cycle_count")
        .as[(java.sql.Date, Int, String, Long)].head()
      JdbcSinks.upsert(bumpedRow, url, "graft_pg_summary_spec",
        Seq("summary_date", "hour_of_day", "machine_id"), JdbcSinks.dialectFor(url))
      val back2 = JdbcSinks.read(spark, url, "graft_pg_summary_spec")
      assert(back2.count() == summary.count())
      val gotBump = back2
        .filter(c("summary_date") === bumpKey._1 &&
          c("hour_of_day") === bumpKey._2 && c("machine_id") === bumpKey._3)
        .select(c("cycle_count").cast("long")).as[Long].head()
      assert(gotBump == bumpKey._4)
      events.unpersist(); summary.unpersist()
    } finally out.unpersist()
    withConn(url) { conn =>
      val st = conn.createStatement()
      st.execute("DROP TABLE graft_pg_events_spec")
      st.execute("DROP TABLE graft_pg_summary_spec")
      st.close()
    }
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
