package graft.etl

import java.sql.{Connection, DriverManager}
import java.util.Properties

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** The reference's Postgres load path through the [[Pipeline.MergeSink]]
  * seam: `INSERT ... ON CONFLICT (key) DO UPDATE`
  * (reference: loaders/__init__.py:253-276) pushed down to a JDBC
  * destination. The runner keeps extract ordering, freshness gating,
  * watermarks and the sync log; this sink owns only the write.
  *
  * Upsert semantics are destination syntax, so they live in a
  * [[JdbcMergeSink.Dialect]]:
  *   - [[JdbcMergeSink.PostgresOnConflict]] emits the reference's literal
  *     statement shape (one prepared statement per row batch-executed);
  *   - [[JdbcMergeSink.UpdateThenInsert]] is the portable ANSI fallback
  *     (UPDATE; if no row changed, INSERT) every JDBC destination
  *     supports — the spec drives it against an embedded Derby for a
  *     real round-trip (insert, conflict-update, idempotent re-run).
  *
  * Correctness at the seam:
  *   - the fresh increment is first collapsed to ONE row per business
  *     key ([[Pipeline.merge]] with no existing side — last-write-wins
  *     by the spec's version column), so the destination never sees an
  *     intra-batch key conflict and the upsert order within the batch
  *     cannot matter;
  *   - the deduped increment is repartitioned ON the key columns into at
  *     most `maxConnections` partitions, so a given key is written by
  *     exactly one connection (two-statement dialects would otherwise be
  *     racy) and a 3-row increment does not open 32 transactions;
  *   - each partition writes in ONE transaction (autoCommit off, commit
  *     at partition end, rollback on failure), so a task retry re-runs
  *     a clean slate and the upsert itself makes re-publishing the same
  *     increment a no-op — idempotence, the seam's contract.
  *
  * Scale shape: only the increment moves (one shuffle on the key);
  * per-partition writes go through JDBC BATCHES of `batchSize` rows
  * (addBatch/executeBatch — the reference's psycopg2 `execute_batch`
  * round-trip amortization), parallel across `maxConnections`
  * connections, and the destination's own conflict resolution runs
  * destination-side. This is the sanctioned imperative-per-partition
  * RDD use — there is no declarative Spark operator for a JDBC upsert.
  */
final class JdbcMergeSink(
    url: String,
    tableFor: String => String,
    dialect: JdbcMergeSink.Dialect = JdbcMergeSink.UpdateThenInsert,
    connectionProperties: Properties = new Properties,
    maxConnections: Int = 16,
    batchSize: Int = 500)
  extends Pipeline.MergeSink with Serializable {

  def this(url: String, table: String) = this(url, (_: String) => table)

  override def publish(spec: Pipeline.TableSpec, fresh: DataFrame): Long = {
    require(spec.keyColumns.nonEmpty,
      s"JdbcMergeSink needs key columns to upsert '${spec.name}'")
    require(maxConnections >= 1 && batchSize >= 1,
      "maxConnections and batchSize must be positive")
    val deduped = Pipeline.merge(None, fresh, spec.keyColumns, spec.versionColumn)
    val columns = deduped.columns.toSeq
    val plan = dialect.plan(tableFor(spec.name), columns, spec.keyColumns)
    // the single-writer-per-key guarantee below is void when Spark runs
    // two attempts of the same partition concurrently: both attempts
    // UPDATE zero rows and both INSERT — silent duplicates unless the
    // destination enforces a unique/PK constraint on the keys. The guard
    // refuses the PREDICTABLE cause (speculative execution); a zombie
    // retry racing its replacement is not driver-detectable, which is
    // why the class doc REQUIRES a unique key constraint on the
    // destination for update-then-insert (making the zombie's duplicate
    // a loud constraint violation, retried via the update path).
    // Single-statement upserts are destination-side atomic either way.
    JdbcMergeSink.assertSpeculationSafe(plan, spec.name, dialect,
      fresh.sparkSession.sparkContext.getConf.getBoolean("spark.speculation", false))
    val colIdx = columns.zipWithIndex.toMap
    // JDBC type per bind slot, derived from the Spark schema: null values
    // must bind through setNull(i, type) — several drivers (embedded
    // Derby included) reject an untyped setObject(i, null) with "unable
    // to determine parameter type", failing the whole partition's
    // transaction on the first nullable column
    val typeOf = deduped.schema.fields
      .map(f => f.name -> JdbcMergeSink.sqlTypeOf(f.dataType)).toMap
    val binds = plan.statements.map { case (_, cols) => cols.map(colIdx) }
    val bindTypes = plan.statements.map { case (_, cols) => cols.map(typeOf) }
    val sqls = plan.statements.map(_._1)
    val stopOnFirstChange = plan.stopOnFirstChange
    val jdbcUrl = url
    val props = connectionProperties
    val chunk = batchSize
    deduped
      .repartition(maxConnections, spec.keyColumns.map(col): _*)
      .rdd
      .mapPartitions { rows =>
        if (rows.isEmpty) Iterator(0L)
        else {
          val conn = DriverManager.getConnection(jdbcUrl, props)
          var committed = false
          try {
            conn.setAutoCommit(false)
            val stmts = sqls.map(conn.prepareStatement)
            var n = 0L
            rows.grouped(chunk).foreach { group =>
              // each statement consumes the rows its predecessor did not
              // settle: a single-statement upsert settles everything in
              // one batch; update-then-insert batch-updates, then
              // batch-inserts exactly the rows whose update matched none
              var pending: Seq[org.apache.spark.sql.Row] = group
              stmts.lazyZip(binds).lazyZip(bindTypes).foreach { (ps, idxs, types) =>
                if (pending.nonEmpty) {
                  pending.foreach { row =>
                    idxs.zipWithIndex.foreach { case (ci, i) =>
                      val v = row.get(ci)
                      if (v == null) ps.setNull(i + 1, types(i))
                      else ps.setObject(i + 1, JdbcMergeSink.jdbcValue(v))
                    }
                    ps.addBatch()
                  }
                  val counts = ps.executeBatch()
                  pending =
                    if (!stopOnFirstChange) Seq.empty
                    else {
                      require(!counts.contains(java.sql.Statement.SUCCESS_NO_INFO),
                        "driver reports SUCCESS_NO_INFO for batched updates — " +
                          "update-then-insert needs exact counts; use a " +
                          "single-statement upsert dialect for this destination")
                      pending.zip(counts).collect { case (r, c) if c == 0 => r }
                    }
                }
              }
              n += group.size
            }
            stmts.foreach(_.close())
            conn.commit()
            committed = true
            Iterator(n)
          } finally {
            if (!committed) scala.util.Try(conn.rollback())
            conn.close()
          }
        }
      }
      .fold(0L)(_ + _)
  }
}

object JdbcMergeSink {

  /** Rows carry java.time values under Spark's Java-8 datetime API, but
    * many drivers' untyped setObject (Derby included) only accept the
    * java.sql classics — normalize at the bind site.
    */
  private[etl] def jdbcValue(v: Any): AnyRef = v match {
    case ldt: java.time.LocalDateTime => java.sql.Timestamp.valueOf(ldt)
    case i: java.time.Instant => java.sql.Timestamp.from(i)
    case ld: java.time.LocalDate => java.sql.Date.valueOf(ld)
    case other => other.asInstanceOf[AnyRef]
  }

  /** The single-writer-per-key guarantee the class doc relies on is void
    * when Spark runs two attempts of one partition concurrently
    * (speculative execution, or a zombie retry racing its replacement):
    * both attempts pass the UPDATE-matched-nothing probe and both
    * INSERT — silent duplicates unless the destination enforces a
    * unique/PK constraint on the keys. Two-statement dialects therefore
    * refuse to run under speculation; single-statement upserts resolve
    * the conflict destination-side atomically and stay safe.
    */
  private[graft] def assertSpeculationSafe(plan: Plan, table: String,
      dialect: Dialect, speculation: Boolean): Unit =
    if (plan.stopOnFirstChange && speculation)
      throw new IllegalStateException(
        s"JdbcMergeSink(${dialect.getClass.getSimpleName.stripSuffix("$")}) cannot " +
          "upsert '" + table + "' with spark.speculation enabled: concurrent " +
          "attempts of one partition both pass the UPDATE-matched-nothing probe and " +
          "both INSERT. Use a single-statement dialect (PostgresOnConflict) or " +
          "disable speculation; a unique key constraint on the destination is " +
          "required either way for update-then-insert to be retry-safe")

  /** The java.sql.Types code a null in this Spark column binds as.
    * Drivers that reject an untyped setObject(i, null) (Derby) accept
    * setNull(i, type) for any concrete code; the mapping below follows
    * Spark's own JdbcUtils type assignments.
    */
  private[etl] def sqlTypeOf(dt: org.apache.spark.sql.types.DataType): Int = {
    import org.apache.spark.sql.types._
    import java.sql.Types
    dt match {
      case IntegerType => Types.INTEGER
      case LongType => Types.BIGINT
      case DoubleType => Types.DOUBLE
      case FloatType => Types.FLOAT
      case ShortType => Types.SMALLINT
      case ByteType => Types.TINYINT
      case BooleanType => Types.BOOLEAN
      case StringType => Types.VARCHAR
      case BinaryType => Types.BINARY
      case TimestampType | TimestampNTZType => Types.TIMESTAMP
      case DateType => Types.DATE
      case _: DecimalType => Types.DECIMAL
      case _ => Types.VARCHAR
    }
  }

  /** How one destination expresses "upsert one row": prepared-statement
    * texts plus, per statement, the column names in bind order.
    * `stopOnFirstChange` chains fallback statements (UPDATE → INSERT);
    * a true single-statement upsert sets it false with one entry.
    */
  final case class Plan(statements: Seq[(String, Seq[String])],
      stopOnFirstChange: Boolean)

  trait Dialect extends Serializable {
    def plan(table: String, columns: Seq[String], keys: Seq[String]): Plan
  }

  /** The reference's literal statement (loaders/__init__.py:262-270):
    * `INSERT ... VALUES ... ON CONFLICT (keys) DO UPDATE SET
    * col = EXCLUDED.col` for every non-key column. Key-only tables
    * degrade to `DO NOTHING`, exactly as the reference's association
    * tables do.
    */
  object PostgresOnConflict extends Dialect {
    override def plan(table: String, columns: Seq[String], keys: Seq[String]): Plan = {
      val nonKeys = columns.filterNot(keys.contains)
      val action =
        if (nonKeys.isEmpty) "DO NOTHING"
        else "DO UPDATE SET " + nonKeys.map(c => s"$c = EXCLUDED.$c").mkString(", ")
      val sql = s"INSERT INTO $table (${columns.mkString(", ")}) " +
        s"VALUES (${columns.map(_ => "?").mkString(", ")}) " +
        s"ON CONFLICT (${keys.mkString(", ")}) $action"
      Plan(Seq(sql -> columns), stopOnFirstChange = false)
    }
  }

  /** Portable ANSI upsert: UPDATE by key; if it changed nothing, INSERT.
    * Safe under this sink's key-partitioned single-writer-per-key
    * execution (see class doc); key-only tables probe existence with a
    * no-op self-assignment UPDATE so the INSERT still skips duplicates.
    */
  object UpdateThenInsert extends Dialect {
    override def plan(table: String, columns: Seq[String], keys: Seq[String]): Plan = {
      val nonKeys = columns.filterNot(keys.contains)
      val where = keys.map(c => s"$c = ?").mkString(" AND ")
      val (set, updateBinds) =
        if (nonKeys.isEmpty) (s"${keys.head} = ${keys.head}", keys)
        else (nonKeys.map(c => s"$c = ?").mkString(", "), nonKeys ++ keys)
      val update = s"UPDATE $table SET $set WHERE $where"
      val insert = s"INSERT INTO $table (${columns.mkString(", ")}) " +
        s"VALUES (${columns.map(_ => "?").mkString(", ")})"
      Plan(Seq(update -> updateBinds, insert -> columns), stopOnFirstChange = true)
    }
  }
}
