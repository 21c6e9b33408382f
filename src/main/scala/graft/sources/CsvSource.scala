package graft.sources

import java.util.zip.ZipFile

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** CSV ingestion — the reference's pre-season path reads CSV dumps out of
  * a ZIP archive and coerces them to the table schema
  * (/root/reference/loaders/__init__.py:16-146: get_raw_zip +
  * sanitize_df). Spark-first form: `spark.read.csv` with an explicit
  * schema (header-driven permissive parse would lose type errors), then a
  * declarative sanitize pass.
  *
  * ZIP is not a splittable Spark format; entries are extracted to
  * temporary files once (driver-side IO, not a row loop) and then read by
  * the distributed CSV reader. At scale the dumps would land uncompressed
  * or as per-entry gzip behind a manifest, and the extraction step drops
  * away.
  */
object CsvSource {

  /** Read one CSV file/directory with an explicit schema. */
  def csv(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .option("header", "true")
      .option("mode", "PERMISSIVE")
      .schema(schema)
      .csv(path)

  /** Extract named entries of a ZIP to temp CSV files and read each into
    * a DataFrame (reference: PreSeasonLoader.transform's dump_list_csv).
    * Columns are read as raw strings — like the reference's CSV parse —
    * so out-of-range values reach [[sanitize]] instead of being nulled by
    * a typed parse; pass the result through `sanitize(df, schema)`.
    */
  def fromZip(spark: SparkSession, zipPath: String,
      entries: Map[String, StructType]): Map[String, DataFrame] = {
    val zf = new ZipFile(zipPath)
    try {
      val available = zf.entries().asScala.map(_.getName).toSet
      entries.collect { case (entry, schema) if available.contains(entry) =>
        val tmp = java.nio.file.Files.createTempFile(s"graft_zip_", ".csv")
        val in = zf.getInputStream(zf.getEntry(entry))
        try java.nio.file.Files.copy(in, tmp, java.nio.file.StandardCopyOption.REPLACE_EXISTING)
        finally in.close()
        tmp.toFile.deleteOnExit()
        val rawSchema = StructType(schema.fields.map(f => StructField(f.name, StringType, nullable = true)))
        entry -> csv(spark, tmp.toString, rawSchema)
      }
    } finally zf.close()
  }

  /** Row-level error quarantine (reference: loaders/__init__.py:67-115 —
    * per-row savepoints skip bad rows instead of failing the load).
    * Spark-first form: one codegen'd projection computes a per-row reason
    * string (a present value that fails its typed coercion, or a missing
    * required column), then the raw frame splits into
    * (clean — sanitized, quarantine — raw rows + `_reason`). Nothing is
    * silently dropped: the quarantine frame is the audit trail the
    * reference logs per skipped row.
    */
  def sanitizeWithQuarantine(df: DataFrame, schema: StructType,
      required: Seq[String] = Nil): (DataFrame, DataFrame) = {
    // a required column missing from the frame entirely is schema drift,
    // not a bad row — no row-level skip can repair it, so fail loudly
    val absent = required.filterNot(df.columns.contains)
    require(absent.isEmpty, s"required columns absent from input: ${absent.mkString(", ")}")
    val checks = df.columns.flatMap { name =>
      // try_cast, not cast: under ANSI semantics a plain cast THROWS on
      // the malformed values this probe exists to detect. The probe type
      // must match what sanitize() will actually cast to — probing a
      // 32-bit column at BIGINT would pass a 10-digit value through to a
      // throwing INT cast (ShortType probes INTEGER because sanitize
      // clamps shorts through an int cast).
      def tryCastNull(sqlType: String) =
        col(name).isNotNull && expr(s"try_cast(`$name` AS $sqlType)").isNull
      val bad = schema.find(_.name == name).flatMap { f =>
        f.dataType match {
          case ShortType | IntegerType => Some(tryCastNull("INTEGER"))
          case LongType => Some(tryCastNull("BIGINT"))
          case DoubleType | FloatType => Some(tryCastNull("DOUBLE"))
          case BooleanType =>
            Some(col(name).isNotNull &&
              !lower(trim(col(name).cast("string"))).isin("true", "t", "1", "false", "f", "0"))
          case DateType => Some(tryCastNull("DATE"))
          case TimestampType => Some(tryCastNull("TIMESTAMP"))
          case _ => None
        }
      }
      val missing =
        if (required.contains(name))
          Some(when(col(name).isNull || trim(col(name).cast("string")) === "", lit(s"$name:missing")))
        else None
      bad.map(b => when(b, lit(s"$name:bad_value"))).toSeq ++ missing.toSeq
    }
    // concat_ws skips nulls, so the reason column stays codegen'd: empty
    // string = clean row
    val flagged = df.withColumn("_reason",
      nullif(concat_ws(",", checks.toIndexedSeq: _*), lit("")))
    val clean = sanitize(flagged.filter(col("_reason").isNull).drop("_reason"), schema)
    val quarantine = flagged.filter(col("_reason").isNotNull)
    (clean, quarantine)
  }

  /** Schema-driven sanitize (reference: sanitize_df,
    * loaders/__init__.py:117-146): per-column coercions expressed as
    * codegen'd projections — trim/null-normalize strings, clamp
    * smallints, round-trip numerics, parse dates/booleans.
    */
  def sanitize(df: DataFrame, schema: StructType): DataFrame = {
    val cols = df.columns.map { name =>
      schema.find(_.name == name) match {
        case Some(f) => (f.dataType match {
          case StringType => coalesce(nullif(trim(col(name).cast("string")), lit("")), lit(null))
          case ShortType => least(greatest(col(name).cast("int"), lit(-32768)), lit(32767)).cast("short")
          case IntegerType | LongType => col(name).cast(f.dataType)
          case DoubleType | FloatType => col(name).cast(f.dataType)
          case BooleanType => lower(trim(col(name).cast("string"))).isin("true", "t", "1").as(name)
          case DateType => to_date(col(name))
          case TimestampType => to_timestamp(col(name))
          case other => col(name).cast(other)
        }).as(name)
        case None => col(name)
      }
    }
    df.select(cols.toSeq: _*)
  }
}
