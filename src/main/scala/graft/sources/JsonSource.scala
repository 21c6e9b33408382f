package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** JSON ingestion — the reference's post-race path consumes JSON API
  * responses (/root/reference/api_client.py:94-165 pulls
  * `response['MRData'][...]` record arrays; loaders transform them).
  * Spark-first form: schema'd `spark.read.json` for response dumps on
  * disk, `from_json` for response payloads already in a column — both
  * PERMISSIVE with a quarantine split, mirroring the reference's
  * per-row skip-and-log (`loaders/__init__.py:67-115`): a malformed
  * response never fails the load and is never silently dropped.
  *
  * Schema is always EXPLICIT: inference reads the data twice and infers
  * from whatever sample it saw — at 100 TB that is both a full extra
  * pass and a correctness hazard (a type decided by the sample, not the
  * contract). The reference's loaders have fixed schemas; so do we.
  */
object JsonSource {

  private val Corrupt = "_corrupt_record"

  /** Read JSON-lines with an explicit schema; rows Spark cannot parse
    * into it are captured whole. Returns (clean — typed rows,
    * quarantine — the raw line + `_reason`). The split accounts for
    * every input line: clean.count + quarantine.count == lines.
    */
  def jsonlWithQuarantine(spark: SparkSession, path: String,
      schema: StructType): (DataFrame, DataFrame) = {
    val withCorrupt = StructType(schema.fields :+ StructField(Corrupt, StringType, nullable = true))
    val raw = spark.read
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", Corrupt)
      .schema(withCorrupt)
      .json(path)
      // Spark disallows filtering on the internal corrupt column of a
      // streaming-parsed scan (SPARK-21610); materialize the parse once
      .localCheckpoint(true)
    val clean = raw.filter(col(Corrupt).isNull).drop(Corrupt)
    val quarantine = raw.filter(col(Corrupt).isNotNull)
      .select(col(Corrupt).as("raw"), lit("malformed_json").as("_reason"))
    (clean, quarantine)
  }

  /** Parse a column of raw API response payloads (one JSON document per
    * row — the shape an extract job lands) into a typed struct, with
    * the reference's skip-and-log semantics: rows whose payload does not
    * parse into `schema` go to the quarantine frame with the original
    * payload intact. The parse is one codegen'd `from_json` projection;
    * callers explode the nested record arrays from the typed struct
    * (`api_client.py`'s `response['MRData']['RaceTable']['Races']`
    * access, as a column path).
    */
  def parseResponses(df: DataFrame, payloadCol: String,
      schema: StructType): (DataFrame, DataFrame) = {
    // FAILFAST would throw; PERMISSIVE from_json yields a struct of
    // nulls for malformed input — detect via a null-parse probe column.
    // from_json returns null (not null-struct) only for null input, so
    // probe with a sentinel: re-serialize and compare non-nullness of
    // the parse of a known-required access. Simplest robust probe:
    // from_json in FAILFAST inside try_... is unavailable; instead
    // treat "every top-level field null" as a failed parse — a real
    // payload always carries at least one recognized top-level field.
    val parsed = df.withColumn("_parsed", from_json(col(payloadCol), schema))
    val topNull = schema.fields.map(f => col(s"_parsed.${f.name}").isNull)
      .reduce(_ && _)
    val failed = col("_parsed").isNull || topNull
    val clean = parsed.filter(!failed)
    val quarantine = parsed.filter(failed)
      .select(col(payloadCol).as("raw"), lit("unparseable_payload").as("_reason"))
    (clean, quarantine)
  }
}
