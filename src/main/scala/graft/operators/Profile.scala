package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.GraftFunctions.hll_distinct
import graft.sources.Tables

/** q27: ANALYZE-style column profiling — the statistics pass a warehouse
  * runs before planning and a data pipeline runs as its first look at a
  * new drop. Re-expresses the reference's sync-audit statistics shape
  * (/root/reference/metadata.py:44-115) at column granularity.
  *
  * One aggregation PER COLUMN, unioned — not one wide multi-distinct
  * agg: N distinct aggregates in one `agg` make Catalyst Expand every
  * row N+1 ways (measured 13.7× slower on lineitem at sf0.1), whereas
  * per-column plans each scan ONE parquet column (columnar pruning
  * makes the N scans read the same total bytes as one wide scan) and
  * shuffle only that column's distinct values. Every branch is
  * map-side partial + a scalar exchange.
  *
  * Distinct counts: `exactDistinct = true` (the default, and the
  * `queries()` row) uses COUNT(DISTINCT c). At 100 TB the per-column
  * distinct shuffle is the dominant cost, so `exactDistinct = false`
  * swaps in the deterministic HLL sketch (q22's kernel, 2^p bytes per
  * column, no distinct shuffle at all) — same schema, estimated
  * `n_distinct`.
  *
  * Timestamps profile as exact epoch-microsecond doubles (micros are
  * < 2^53, so the double is exact and DuckDB's epoch_us replays it).
  */
object Profile {

  private def isNum(dt: DataType): Boolean = dt match {
    case _: NumericType => true
    case _ => false
  }

  def profile(df: DataFrame, exactDistinct: Boolean = true): DataFrame = {
    val fields = df.schema.fields.toSeq
    def numView(f: StructField): Option[Column] = f.dataType match {
      case dt if isNum(dt) => Some(col(f.name).cast(DoubleType))
      // NTZ first casts to LTZ; tz-independent under the library's pinned
      // UTC sessions (GraftSession), and the current testdata is LTZ anyway
      case _: TimestampType | _: TimestampNTZType =>
        Some(unix_micros(col(f.name).cast(TimestampType)).cast(DoubleType))
      case _ => None
    }
    val perCol = fields.map { f =>
      val c = col(f.name)
      val nv = numView(f)
      val distinct: Column =
        if (exactDistinct) count_distinct(c)
        else hll_distinct(c.cast(StringType)).cast(LongType)
      df.select(c)
        .agg(
          count(lit(1)).as("n_rows"),
          count(c).as("nn"),
          distinct.as("n_distinct"),
          nv.map(n => min(n)).getOrElse(lit(null).cast(DoubleType)).as("min_num"),
          nv.map(n => max(n)).getOrElse(lit(null).cast(DoubleType)).as("max_num"),
          (if (nv.isEmpty) min(c.cast(StringType)) else lit(null).cast(StringType)).as("min_str"),
          (if (nv.isEmpty) max(c.cast(StringType)) else lit(null).cast(StringType)).as("max_str"))
        .select(
          lit(f.name).as("col_name"),
          col("n_rows"),
          (col("n_rows") - col("nn")).as("n_nulls"),
          col("n_distinct"), col("min_num"), col("max_num"),
          col("min_str"), col("max_str"))
    }
    perCol.reduce(_ unionAll _).orderBy(col("col_name"))
  }

  /** The `queries()` row: exact profile of lineitem. */
  def lineitemProfile(t: Tables): DataFrame = profile(t.lineitem)
}
