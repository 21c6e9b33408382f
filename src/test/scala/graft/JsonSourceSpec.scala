package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.JsonSource

/** JSON ingestion with quarantine (§2.1b): schema'd JSONL reads and
  * payload-column parses both split malformed input into an audit frame
  * instead of failing or silently dropping — the reference's per-row
  * skip-and-log for its JSON API responses.
  */
class JsonSourceSpec extends SparkSpecBase {

  private val schema = StructType(Seq(
    StructField("season", IntegerType),
    StructField("round", IntegerType),
    StructField("winner", StringType)))

  test("jsonlWithQuarantine: every line lands in exactly one frame") {
    val dir = Files.createTempDirectory("graft_json")
    val lines = Seq(
      """{"season":2024,"round":1,"winner":"VER"}""",
      """{"season":2024,"round":2,"winner":"NOR"}""",
      """{"season":2024,"round":"not-a-number","winner":"PIA"}""", // type violation
      """{broken json!""") // syntactically malformed
    Files.write(dir.resolve("r.jsonl"), lines.mkString("\n").getBytes("UTF-8"))
    val (clean, quarantine) = JsonSource.jsonlWithQuarantine(spark, dir.toString, schema)
    assert(clean.count() + quarantine.count() == lines.size, "nothing silently dropped")
    assert(clean.collect().map(r => (r.getInt(0), r.getInt(1), r.getString(2))).sorted.toSeq
      == Seq((2024, 1, "VER"), (2024, 2, "NOR")).sorted)
    val q = quarantine.collect().map(_.getString(0)).toSeq
    assert(q.exists(_.contains("not-a-number")) && q.exists(_.contains("broken json")))
    assert(quarantine.columns.toSeq == Seq("raw", "_reason"))
  }

  test("parseResponses: typed payload parse with skip-and-log, arrays explode") {
    import spark.implicits._
    val respSchema = StructType(Seq(
      StructField("season", IntegerType),
      StructField("results", ArrayType(StructType(Seq(
        StructField("pos", IntegerType),
        StructField("driver", StringType)))))))
    val payloads = Seq(
      ("r1", """{"season":2024,"results":[{"pos":1,"driver":"VER"},{"pos":2,"driver":"NOR"}]}"""),
      ("r2", """{"season":2025,"results":[{"pos":1,"driver":"PIA"}]}"""),
      ("r3", """### not json at all""")).toDF("req", "payload")
    val (clean, quarantine) = JsonSource.parseResponses(payloads, "payload", respSchema)
    assert(clean.count() + quarantine.count() == 3)
    val rows = clean
      .select(col("_parsed.season").as("season"), explode(col("_parsed.results")).as("r"))
      .select(col("season"), col("r.pos"), col("r.driver"))
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getString(2))).sorted.toSeq
    assert(rows == Seq((2024, 1, "VER"), (2024, 2, "NOR"), (2025, 1, "PIA")))
    assert(quarantine.collect().map(_.getString(0)).toSeq == Seq("### not json at all"))
  }
}
