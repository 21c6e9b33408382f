package graft

import java.nio.file.Files
import java.sql.DriverManager

import org.apache.spark.sql.functions._

import graft.etl.{JdbcMergeSink, MetadataStore, Pipeline, PipelineRunner}
import graft.sources.Tables

/** The JDBC merge sink against a REAL embedded database (Derby, from the
  * Spark distribution's own jars): insert, conflict-update, idempotent
  * re-run, and incremental appends — the `ON CONFLICT (key) DO UPDATE`
  * contract of the reference's Postgres loaders
  * (loaders/__init__.py:253-276) driven end-to-end through
  * PipelineRunner, not a fake.
  */
class JdbcSinkSpec extends SparkSpecBase {

  private val url = "jdbc:derby:memory:graftjdbc;create=true"

  private def withConn[A](f: java.sql.Connection => A): A = {
    val c = DriverManager.getConnection(url)
    try f(c) finally c.close()
  }

  private def queryLong(sql: String): Long = withConn { c =>
    val rs = c.createStatement().executeQuery(sql)
    rs.next(); rs.getLong(1)
  }

  private def queryString(sql: String): String = withConn { c =>
    val rs = c.createStatement().executeQuery(sql)
    rs.next(); rs.getString(1)
  }

  test("real JDBC round-trip through PipelineRunner: insert, conflict-update, idempotent re-run, increments") {
    withConn { c =>
      c.createStatement().executeUpdate(
        "CREATE TABLE dim_nation (n_nationkey INT PRIMARY KEY, " +
          "n_name VARCHAR(64), n_regionkey INT)")
      c.createStatement().executeUpdate(
        "CREATE TABLE fact_events (event_id BIGINT PRIMARY KEY, ts TIMESTAMP, " +
          "user_id BIGINT, event_type VARCHAR(64), value DOUBLE, props VARCHAR(512))")
    }
    val wh = Files.createTempDirectory("graft_wh_").toString
    val md = Files.createTempDirectory("graft_md_").toString
    val store = new MetadataStore(spark, md)
    val specs = Seq(
      Pipeline.TableSpec("dim_nation", Pipeline.PreSeason, Nil, Seq("n_nationkey")),
      Pipeline.TableSpec("fact_events", Pipeline.PostRace, Seq("dim_nation"),
        Seq("event_id"), versionColumn = Some("ts")))
    // the mutable knob the conflict-update leg flips: the re-extract
    // returns the same keys with rewritten names
    var renamed = false
    val extracts: Map[String, Pipeline.Extract] = Map(
      "dim_nation" -> ((s, _) => {
        val n = Tables(s, sfDir).nation
        if (renamed) n.withColumn("n_name", concat(lit("UPD_"), col("n_name"))) else n
      }),
      "fact_events" -> ((s, since) => {
        val ev = Tables(s, sfDir).events
        since match {
          case Some(mark) => ev.filter(unix_timestamp(col("ts")) > mark)
          case None => ev.filter(unix_timestamp(col("ts")) <= 1705276800L)
        }
      }))
    val sink = new JdbcMergeSink(url, (name: String) => name)
    val runner = new PipelineRunner(spark, wh, store, specs, extracts,
      mergeSink = Some(sink))

    // INSERT: a fresh PreSeason run lands every nation row in Derby
    val nNations = Tables(spark, sfDir).nation.count()
    runner.run(Pipeline.PreSeason)
    assert(queryLong("SELECT COUNT(*) FROM dim_nation") == nNations)
    assert(!Files.exists(java.nio.file.Paths.get(s"$wh/dim_nation")),
      "with a JDBC sink, nothing may be written to the parquet warehouse")
    assert(store.currentStatus("dim_nation").contains("success"))

    // IDEMPOTENT RE-RUN: replaying the same increment changes nothing
    runner.run(Pipeline.PreSeason, force = true)
    assert(queryLong("SELECT COUNT(*) FROM dim_nation") == nNations,
      "re-publishing the same increment must not duplicate")

    // CONFLICT-UPDATE: same keys, new values — ON CONFLICT semantics
    renamed = true
    runner.run(Pipeline.PreSeason, force = true)
    assert(queryLong("SELECT COUNT(*) FROM dim_nation") == nNations)
    assert(queryLong("SELECT COUNT(*) FROM dim_nation WHERE n_name LIKE 'UPD_%'") == nNations,
      "a conflicting key must UPDATE in place, not insert or be dropped")

    // INCREMENTS: the PostRace watermark flow appends only new keys
    runner.run(Pipeline.PostRace, newWatermark = Some(1705276800L))
    val afterFirst = queryLong("SELECT COUNT(*) FROM fact_events")
    assert(afterFirst > 0)
    runner.run(Pipeline.PostRace)
    val afterSecond = queryLong("SELECT COUNT(*) FROM fact_events")
    assert(afterSecond > afterFirst, "the second increment upserts new keys")
    assert(afterSecond == Tables(spark, sfDir).events.count(),
      "the two increments together cover the corpus exactly once")
  }

  test("intra-batch key conflicts collapse last-write-wins by version before the destination sees them") {
    import spark.implicits._
    withConn { c =>
      c.createStatement().executeUpdate(
        "CREATE TABLE versioned (k BIGINT PRIMARY KEY, v VARCHAR(16), ver BIGINT)")
    }
    val spec = Pipeline.TableSpec("versioned", Pipeline.PreSeason, Nil,
      Seq("k"), versionColumn = Some("ver"))
    val fresh = Seq((1L, "old", 1L), (1L, "new", 2L), (2L, "only", 1L))
      .toDF("k", "v", "ver")
    val sink = new JdbcMergeSink(url, "versioned")
    assert(sink.publish(spec, fresh) == 2L, "the deduped increment has 2 keys")
    assert(queryLong("SELECT COUNT(*) FROM versioned") == 2L)
    assert(queryString("SELECT v FROM versioned WHERE k = 1") == "new",
      "the destination must only ever see the latest version per key")
  }

  test("null column values bind through setNull and round-trip Derby (insert AND conflict-update legs)") {
    import spark.implicits._
    withConn { c =>
      c.createStatement().executeUpdate(
        "CREATE TABLE nullable_t (k BIGINT PRIMARY KEY, s VARCHAR(16), " +
          "n BIGINT, d DOUBLE, ts TIMESTAMP, ver BIGINT)")
    }
    val spec = Pipeline.TableSpec("nullable_t", Pipeline.PreSeason, Nil,
      Seq("k"), versionColumn = Some("ver"))
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    // row 1 carries nulls in every nullable slot type (string, long,
    // double, timestamp) — Derby rejects untyped setObject(i, null),
    // so this row fails the whole partition unless nulls bind typed
    val fresh = Seq(
      (1L, Option.empty[String], Option.empty[Long], Option.empty[Double],
        Option.empty[java.sql.Timestamp], 1L),
      (2L, Some("two"), Some(2L), Some(2.0), Some(t0), 1L))
      .toDF("k", "s", "n", "d", "ts", "ver")
    val sink = new JdbcMergeSink(url, "nullable_t")
    assert(sink.publish(spec, fresh) == 2L)
    assert(queryLong("SELECT COUNT(*) FROM nullable_t WHERE s IS NULL AND n IS NULL " +
      "AND d IS NULL AND ts IS NULL") == 1L, "nulls must land as SQL NULLs")
    // conflict-update leg: flip which row holds the nulls — the UPDATE
    // statement also binds nulls, exercising setNull on the other leg
    val flipped = Seq(
      (1L, Some("one"), Some(1L), Some(1.0), Some(t0), 2L),
      (2L, Option.empty[String], Option.empty[Long], Option.empty[Double],
        Option.empty[java.sql.Timestamp], 2L))
      .toDF("k", "s", "n", "d", "ts", "ver")
    assert(sink.publish(spec, flipped) == 2L)
    assert(queryString("SELECT s FROM nullable_t WHERE k = 1") == "one")
    assert(queryLong("SELECT COUNT(*) FROM nullable_t WHERE k = 2 AND s IS NULL") == 1L,
      "a conflict-update must be able to write NULL over a value")
  }

  test("UpdateThenInsert refuses to run under spark.speculation (duplicate-insert hazard)") {
    // spark.speculation is a static conf — the session under test cannot
    // flip it live, so the guard is asserted at its seam: the same call
    // publish() makes, with the speculation bit forced both ways
    val cols = Seq("k", "v")
    val upPlan = JdbcMergeSink.UpdateThenInsert.plan("spec_t", cols, Seq("k"))
    val ex = intercept[IllegalStateException] {
      JdbcMergeSink.assertSpeculationSafe(upPlan, "spec_t",
        JdbcMergeSink.UpdateThenInsert, speculation = true)
    }
    assert(ex.getMessage.contains("speculation") &&
      ex.getMessage.contains("UpdateThenInsert"))
    // speculation off → no complaint
    JdbcMergeSink.assertSpeculationSafe(upPlan, "spec_t",
      JdbcMergeSink.UpdateThenInsert, speculation = false)
    // the single-statement dialect resolves conflicts destination-side
    // atomically — safe under speculation, the guard must not trip
    val pgPlan = JdbcMergeSink.PostgresOnConflict.plan("spec_t", cols, Seq("k"))
    JdbcMergeSink.assertSpeculationSafe(pgPlan, "spec_t",
      JdbcMergeSink.PostgresOnConflict, speculation = true)
  }

  test("PostgresOnConflict emits the reference's statement shape; UpdateThenInsert binds in statement order") {
    val pg = JdbcMergeSink.PostgresOnConflict.plan("t", Seq("k", "a", "b"), Seq("k"))
    assert(pg.statements.size == 1 && !pg.stopOnFirstChange)
    assert(pg.statements.head._1 ==
      "INSERT INTO t (k, a, b) VALUES (?, ?, ?) ON CONFLICT (k) DO UPDATE SET a = EXCLUDED.a, b = EXCLUDED.b")
    assert(pg.statements.head._2 == Seq("k", "a", "b"))
    // key-only association tables degrade to DO NOTHING, as the reference's do
    val assoc = JdbcMergeSink.PostgresOnConflict.plan("t", Seq("k1", "k2"), Seq("k1", "k2"))
    assert(assoc.statements.head._1.endsWith("ON CONFLICT (k1, k2) DO NOTHING"))

    val up = JdbcMergeSink.UpdateThenInsert.plan("t", Seq("k", "a", "b"), Seq("k"))
    assert(up.stopOnFirstChange)
    assert(up.statements == Seq(
      "UPDATE t SET a = ?, b = ? WHERE k = ?" -> Seq("a", "b", "k"),
      "INSERT INTO t (k, a, b) VALUES (?, ?, ?)" -> Seq("k", "a", "b")))
  }
}
