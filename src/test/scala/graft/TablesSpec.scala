package graft

import org.apache.spark.sql.functions._

import graft.sources.Tables

/** The testdata-drift guard: a driver-side regeneration that changes a
  * table's shape must fail at `Tables` construction with the drifted
  * column NAMED — round 9's mid-round `events.ts` physical-type change
  * surfaced as an empty gate artifact; this spec pins the loud path.
  */
class TablesSpec extends SparkSpecBase {

  test("the shipped testdata passes the schema guard on every table") {
    val t = Tables(spark, sfDir)
    // touching each accessor runs the guard; schema-only, no job
    Seq(t.region, t.nation, t.customer, t.supplier, t.part, t.orders,
      t.lineitem, t.eventsRaw, t.events, t.documents, t.embeddings)
      .foreach(df => assert(df.schema.nonEmpty))
  }

  test("events.ts is accepted in BOTH physical domains: timestamp and legacy INT64 nanos") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_ts_").toString
    // current shape: TIMESTAMP(MICROS). Built from a UTC Instant, not
    // Timestamp.valueOf (which reads the JVM default zone) — this test
    // must pass on a non-UTC JVM too
    Seq((1L, java.sql.Timestamp.from(java.time.Instant.parse("2024-01-20T01:02:03Z")),
        7L, "view", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/micros/events.parquet")
    val micros = Tables(spark, s"$dir/micros")
    assert(micros.events.schema("ts").dataType ==
      org.apache.spark.sql.types.TimestampType)
    // legacy shape: raw nanos exposed as LongType (nanosAsLong session flag)
    Seq((1L, 1705712523000000000L, 7L, "view", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/nanos/events.parquet")
    val nanos = Tables(spark, s"$dir/nanos")
    assert(nanos.eventsRaw.schema("ts").dataType ==
      org.apache.spark.sql.types.LongType, "raw view keeps the stored domain")
    assert(nanos.events.schema("ts").dataType ==
      org.apache.spark.sql.types.TimestampType, "converted view normalizes to timestamp")
    // the two domains describe the same instant after normalization
    val a = micros.events.select(col("ts")).collect()(0).getTimestamp(0)
    val b = nanos.events.select(col("ts")).collect()(0).getTimestamp(0)
    assert(a == b, s"micros/nanos views disagree: $a vs $b")
  }

  test("a drifted column type fails loudly, naming table and column") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_drift_").toString
    Seq((1L, "2024-01-20", 7L, "view", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    val e = intercept[IllegalStateException] { Tables(spark, dir).eventsRaw }
    assert(e.getMessage.contains("'events'") && e.getMessage.contains("'ts'"),
      s"error must name the drifted table+column: ${e.getMessage}")
    assert(e.getMessage.contains("string"), s"error must show the found type: ${e.getMessage}")
  }

  test("subset tables stay sanctioned: a docs frame with only the columns an operator reads loads") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_subset_").toString
    // specs and bench mains write exactly this shape; a missing column
    // is not drift (Spark's unresolved-column error names it at plan
    // time) — only a TYPE change on a present column is
    Seq((1L, "text only")).toDF("doc_id", "text")
      .write.parquet(s"$dir/documents.parquet")
    assert(Tables(spark, dir).documents.count() == 1)
  }
}
