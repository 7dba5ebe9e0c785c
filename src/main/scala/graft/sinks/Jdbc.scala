package graft.sinks

import java.sql.{Connection, DriverManager, PreparedStatement}

import org.apache.spark.sql.{DataFrame, Row, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Presentation-layer JDBC connector: the last leg of the reference's
  * daily flow, which lands every dim/fact in an external RDBMS
  * (reference: include/scripts/create_store_dim.py:68-78
  * `final_scd_df.write.jdbc(...)`; dags/main_pipeline.py:245-249
  * `to_sql('DimCounty', ...)`), plus the matching ingest direction
  * (reference: include/scripts/download_new_records_from_dataset.py:20
  * pages BigQuery rows where `date > max_date`).
  *
  * Scale shape: bulk loads ride Spark's built-in JDBC relation (one
  * connection per partition, batched inserts) with the partition count
  * capped — a 1000-executor cluster must not open a connection per
  * core against one database. The SCD upsert apply is MERGE-shaped:
  * batched per-partition UPDATE/INSERT prepared statements on the
  * executors — never the reference's driver-side row loop
  * (reference: include/scripts/scd.py:203).
  */
object Jdbc {

  /** The helpers below interpolate table/column names into SQL text
    * (pushed-down subqueries, prepared-statement UPDATE/INSERT shells).
    * Identifiers are therefore restricted to `[A-Za-z_][A-Za-z0-9_]*`
    * (tables may be schema-qualified with `.`) and emitted either bare
    * or ANSI double-quoted — a caller-tainted name like
    * `t; DROP TABLE x` must fail fast, not reach the database. Exotic
    * or backtick-dialect identifiers are out of contract here; use
    * Spark's own `read/write.jdbc` dialect handling for those. */
  private val SafeIdent = "[A-Za-z_][A-Za-z0-9_]*".r
  private def requireIdent(name: String, what: String): Unit =
    require(SafeIdent.pattern.matcher(name).matches(),
      s"$what '$name' is not a safe SQL identifier " +
        "([A-Za-z_][A-Za-z0-9_]*); refusing to interpolate it")
  private def requireTableIdent(name: String): Unit = {
    val parts = name.split("\\.", -1)
    require(parts.nonEmpty && parts.forall(p =>
        SafeIdent.pattern.matcher(p).matches()),
      s"table '$name' is not a safe (optionally schema-qualified) SQL " +
        "identifier; refusing to interpolate it")
  }

  /** Bulk-load a dim/fact snapshot. `maxConnections` caps the writing
    * partitions (and thus concurrent connections + batch streams). */
  def writeTable(
      df: DataFrame,
      url: String,
      table: String,
      mode: SaveMode = SaveMode.Overwrite,
      maxConnections: Int = 8,
      batchSize: Int = 10000,
      properties: java.util.Properties = new java.util.Properties): Unit = {
    val bounded =
      if (df.rdd.getNumPartitions > maxConnections) df.coalesce(maxConnections)
      else df
    properties.setProperty("batchsize", batchSize.toString)
    bounded.write.mode(mode).jdbc(url, table, properties)
  }

  /** Partitioned parallel read of an external table: `numPartitions`
    * executors each scan one stride of `partitionCol` ∈ [lower, upper].
    * The WHERE clauses push to the database, so no single connection
    * streams the whole table. */
  def readPartitioned(
      spark: SparkSession,
      url: String,
      table: String,
      partitionCol: String,
      lower: Long,
      upper: Long,
      numPartitions: Int = 8,
      properties: java.util.Properties = new java.util.Properties): DataFrame =
    spark.read.jdbc(url, table, partitionCol, lower, upper, numPartitions,
      properties)

  /** Incremental ingest: only rows with `dateCol` strictly after
    * `watermark` leave the database — the predicate ships INSIDE the
    * pushed-down subquery, the Spark-native form of the reference's
    * `WHERE date > '{max_date}'` paging loop. `dateCol` is emitted as a
    * quoted identifier (Spark's own JDBC writer creates case-exact
    * quoted columns, so the unquoted form would fold to the database's
    * default case and miss). */
  def readNewerThan(
      spark: SparkSession,
      url: String,
      table: String,
      dateCol: String,
      watermark: java.sql.Date,
      properties: java.util.Properties = new java.util.Properties): DataFrame = {
    requireTableIdent(table)
    requireIdent(dateCol, "dateCol")
    spark.read.jdbc(url,
      s"""(SELECT * FROM $table WHERE "$dateCol" > '$watermark') AS incr""",
      properties)
  }

  /** Apply an SCD upsert (the `toUpdate`/`toInsert` split of
    * [[graft.etl.Scd.scdUpsert]]) to an external table with MERGE
    * semantics: matched rows are UPDATEd in place on `keyCols`, new
    * rows INSERTed — executed as batched prepared statements per
    * partition on the executors. `maxConnections` bounds parallelism.
    *
    * Columns in `updates`/`inserts` must match the target table's; the
    * update SET list is every non-key column. */
  def applyScdUpsert(
      updates: DataFrame,
      inserts: DataFrame,
      url: String,
      table: String,
      keyCols: Seq[String],
      maxConnections: Int = 8,
      batchSize: Int = 1000): Unit = {
    requireTableIdent(table)
    val cols = updates.columns.toSeq
    cols.foreach(requireIdent(_, "column"))
    require(inserts.columns.toSeq == cols,
      s"updates/inserts schemas differ: $cols vs ${inserts.columns.toSeq}")
    require(keyCols.nonEmpty && keyCols.forall(cols.contains),
      s"keyCols $keyCols must be a subset of $cols")
    val setCols = cols.filterNot(keyCols.contains)
    val updateSql =
      s"UPDATE $table SET ${setCols.map(c => s"$c = ?").mkString(", ")} " +
        s"WHERE ${keyCols.map(c => s"$c = ?").mkString(" AND ")}"
    val insertSql =
      s"INSERT INTO $table (${cols.mkString(", ")}) " +
        s"VALUES (${cols.map(_ => "?").mkString(", ")})"

    // UPDATE binds SET cols first, then key cols; INSERT binds in order
    runBatched(updates, updateSql, setCols ++ keyCols, maxConnections,
      batchSize, url)
    runBatched(inserts, insertSql, cols, maxConnections, batchSize, url)
  }

  private def runBatched(
      df: DataFrame,
      sql: String,
      bindCols: Seq[String],
      maxConnections: Int,
      batchSize: Int,
      url: String): Unit = {
    val idx = bindCols.map(df.columns.indexOf(_))
    val bounded =
      if (df.rdd.getNumPartitions > maxConnections) df.coalesce(maxConnections)
      else df
    bounded.foreachPartition { (rows: Iterator[Row]) =>
      if (rows.nonEmpty) {
        val conn: Connection = DriverManager.getConnection(url)
        try {
          conn.setAutoCommit(false)
          val st: PreparedStatement = conn.prepareStatement(sql)
          try {
            var pending = 0
            rows.foreach { row =>
              idx.zipWithIndex.foreach { case (srcIdx, bindPos) =>
                st.setObject(bindPos + 1, row.get(srcIdx))
              }
              st.addBatch()
              pending += 1
              if (pending >= batchSize) { st.executeBatch(); pending = 0 }
            }
            if (pending > 0) st.executeBatch()
            conn.commit()
          } finally st.close()
        } finally conn.close()
      }
    }
  }
}
