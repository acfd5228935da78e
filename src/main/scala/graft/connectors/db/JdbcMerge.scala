package graft.connectors.db

import java.sql.{Connection, DriverManager}

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.jdbc.JdbcDialects

import graft.core.{Disposition, MergeEngine, Naming, TableHints}

/** Destination-side merge into a SQL database — the reference's merge
  * loads land in duckdb/postgres via destination SQL
  * (tests/utils.py:209-228 verifies merges by querying the destination;
  * sources/pg_replication/helpers.py:765-773 hard_delete/dedup_sort
  * semantics), and until now the engine's TableWriter merged only
  * parquet tables. This writer gives every disposition a JDBC target:
  *
  *  - the update batch is deduped in Spark (primary key + dedup_sort —
  *    the same `MergeEngine.dedupeBatch` the parquet path uses), then
  *    STAGED into `<table>_stage` via Spark's distributed JDBC writer
  *    (N partitions → N parallel inserts — at scale the batch lands on
  *    the destination without funneling through the driver);
  *  - the merge itself is two set-based statements executed BY THE
  *    DESTINATION in one transaction: DELETE every target row whose key
  *    appears in the stage (update keys and hard-delete keys alike),
  *    then INSERT the stage rows not marked deleted. Delete-insert
  *    rather than MERGE because it is ANSI-portable (Derby, Postgres,
  *    DuckDB all take it) and it is exactly dlt-core's destination
  *    merge shape;
  *  - `merge_key` (delete-insert by key set), `hard_delete` (non-null
  *    marker deletes the key and suppresses the insert) and pk-less
  *    degradation to append all follow the parquet TableWriter's
  *    contracts;
  *  - added columns evolve via ALTER TABLE ADD COLUMN (type from the
  *    Spark JDBC dialect); type WIDENING of an existing column is not
  *    attempted — destinations own their column types (dlt behaves the
  *    same: variant columns, never in-place retype).
  *
  * Identifier conventions match Spark's JDBC writer: table names pass
  * through unquoted (the destination case-folds them), column names are
  * always quoted and case-exact.
  */
object JdbcMerge {

  /** Disposition dispatcher — the JDBC twin of `TableWriter.write`. */
  def write(spark: SparkSession, updates: DataFrame, cfg: JdbcSource.JdbcConfig,
      hints: TableHints): Unit = {
    val table = tableName(cfg, hints)
    hints.disposition match {
      case Disposition.Append =>
        jdbcWrite(updates, cfg, table, SaveMode.Append)
      case Disposition.Replace =>
        jdbcWrite(updates, cfg, table, SaveMode.Overwrite)
      case Disposition.Merge =>
        merge(spark, updates, cfg, hints)
      case Disposition.Scd2 =>
        val loadTs = hints.scd2LoadTs
          .getOrElse(new java.sql.Timestamp(System.currentTimeMillis()))
        val existing =
          if (tableExists(cfg, table)) Some(JdbcSource.read(spark, cfg.copy(table = table)))
          else None
        val merged = MergeEngine.scd2Apply(existing, updates, hints.keyColumns, loadTs)
        // rewrite through the stage so the plan never reads the table it
        // is overwriting: stage the full state, then swap via
        // transactional delete-all + insert
        replaceViaStage(spark, merged, cfg, table)
    }
  }

  /** Merge `updates` into the destination table per `hints`. */
  def merge(spark: SparkSession, updates: DataFrame, cfg: JdbcSource.JdbcConfig,
      hints: TableHints): Unit = {
    val table = tableName(cfg, hints)
    val keys = hints.keyColumns
    val deduped = MergeEngine.dedupeBatch(updates, hints.primaryKey, hints.dedupSort)
    val markerCol = hints.hardDeleteCol.filter(deduped.columns.contains)
    val liveCols = deduped.columns.toSeq.filterNot(markerCol.contains)

    if (keys.isEmpty) {
      // pk-less merge degrades to append, like the parquet path
      val live = markerCol match {
        case Some(mc) => deduped.filter(col(mc).isNull).drop(mc)
        case None     => deduped
      }
      jdbcWrite(live, cfg, table, SaveMode.Append)
      return
    }

    if (!tableExists(cfg, table)) {
      val live = markerCol match {
        case Some(mc) => deduped.filter(col(mc).isNull).drop(mc)
        case None     => deduped
      }
      jdbcWrite(live, cfg, table, SaveMode.Append)
      return
    }

    // evolve: add columns the target lacks before staging
    val stage = table + "_stage"
    withConnection(cfg) { conn =>
      val existingCols = columnsOf(conn, table)
      val missing = deduped.schema.fields
        .filter(f => liveCols.contains(f.name) && !existingCols.contains(f.name))
      missing.foreach { f =>
        // dialect first (it overrides only its non-default mappings — e.g.
        // Derby String→CLOB), then the ANSI common types
        val sqlType = JdbcDialects.get(cfg.url).getJDBCType(f.dataType)
          .map(_.databaseTypeDefinition)
          .orElse(commonSqlType(f.dataType))
          .getOrElse("VARCHAR(4000)")
        exec(conn, s"""ALTER TABLE $table ADD COLUMN ${q(f.name)} $sqlType""")
      }
    }

    jdbcWrite(deduped, cfg, stage, SaveMode.Overwrite)
    try {
      withConnection(cfg) { conn =>
        conn.setAutoCommit(false)
        try {
          // string keys are cast to VARCHAR on both sides: Spark's Derby
          // dialect creates strings as CLOB, and CLOB = CLOB is not a
          // comparable pair there (harmless elsewhere — Postgres/DuckDB
          // take the cast as a no-op). 32672 is Derby's VARCHAR max.
          val stringKeys = deduped.schema.fields
            .filter(f => keys.contains(f.name) &&
              f.dataType == org.apache.spark.sql.types.StringType)
            .map(_.name).toSet
          def keySide(alias: String, k: String) =
            if (stringKeys(k)) s"CAST($alias.${q(k)} AS VARCHAR(32672))"
            else s"$alias.${q(k)}"
          val keyMatch = keys
            .map(k => s"${keySide("S", k)} = ${keySide(table, k)}").mkString(" AND ")
          exec(conn,
            s"""DELETE FROM $table WHERE EXISTS (SELECT 1 FROM $stage S WHERE $keyMatch)""")
          val colList = liveCols.map(q).mkString(", ")
          val liveFilter = markerCol.map(mc => s" WHERE ${q(mc)} IS NULL").getOrElse("")
          exec(conn, s"""INSERT INTO $table ($colList) SELECT $colList FROM $stage$liveFilter""")
          conn.commit()
        } catch {
          case e: Throwable => conn.rollback(); throw e
        } finally conn.setAutoCommit(true)
      }
    } finally dropIfExists(cfg, stage)
  }

  /** Full-state replace without reading-while-writing: land the new state
    * in a stage table, then transactionally delete-all + insert-select.
    */
  private def replaceViaStage(spark: SparkSession, state: DataFrame,
      cfg: JdbcSource.JdbcConfig, table: String): Unit = {
    if (!tableExists(cfg, table)) {
      jdbcWrite(state, cfg, table, SaveMode.Append)
      return
    }
    val stage = table + "_stage"
    jdbcWrite(state, cfg, stage, SaveMode.Overwrite)
    try {
      withConnection(cfg) { conn =>
        conn.setAutoCommit(false)
        try {
          val colList = state.columns.map(q).mkString(", ")
          exec(conn, s"DELETE FROM $table")
          exec(conn, s"INSERT INTO $table ($colList) SELECT $colList FROM $stage")
          conn.commit()
        } catch {
          case e: Throwable => conn.rollback(); throw e
        } finally conn.setAutoCommit(true)
      }
    } finally dropIfExists(cfg, stage)
  }

  private def tableName(cfg: JdbcSource.JdbcConfig, hints: TableHints): String =
    if (cfg.table.nonEmpty) cfg.table else Naming.normalize(hints.tableName)

  private def jdbcWrite(df: DataFrame, cfg: JdbcSource.JdbcConfig, table: String,
      mode: SaveMode): Unit = {
    var w = df.write.format("jdbc")
      .option("url", cfg.url)
      .option("dbtable", table)
      .option("batchsize", cfg.fetchSize)
    cfg.user.foreach(u => w = w.option("user", u))
    cfg.password.foreach(p => w = w.option("password", p))
    cfg.driver.foreach(d => w = w.option("driver", d))
    cfg.options.foreach { case (k, v) => w = w.option(k, v) }
    w.mode(mode).save()
  }

  private def q(ident: String): String = "\"" + ident.replace("\"", "\"\"") + "\""

  /** ANSI fallbacks for types the dialect leaves to the default mapping. */
  private def commonSqlType(dt: org.apache.spark.sql.types.DataType): Option[String] = {
    import org.apache.spark.sql.types._
    dt match {
      case LongType           => Some("BIGINT")
      case IntegerType        => Some("INTEGER")
      case ShortType          => Some("SMALLINT")
      case DoubleType         => Some("DOUBLE PRECISION")
      case FloatType          => Some("REAL")
      case BooleanType        => Some("BOOLEAN")
      case TimestampType      => Some("TIMESTAMP")
      case DateType           => Some("DATE")
      case d: DecimalType     => Some(s"DECIMAL(${d.precision},${d.scale})")
      case BinaryType         => Some("BLOB")
      case _                  => None
    }
  }

  private def withConnection[A](cfg: JdbcSource.JdbcConfig)(f: Connection => A): A = {
    cfg.driver.foreach(Class.forName)
    val props = new java.util.Properties()
    cfg.user.foreach(props.setProperty("user", _))
    cfg.password.foreach(props.setProperty("password", _))
    val conn = DriverManager.getConnection(cfg.url, props)
    try f(conn)
    finally conn.close()
  }

  private def exec(conn: Connection, sql: String): Unit = {
    val st = conn.createStatement()
    try st.executeUpdate(sql)
    finally st.close()
  }

  /** Existence probe via JDBC metadata — NOT a probe query with a blanket
    * SQLException catch: a transient destination error (lock timeout,
    * permissions) must surface, because merge() downgrades to a blind
    * first-load append when this returns false, and a false negative
    * would silently duplicate every key in the destination.
    */
  def tableExists(cfg: JdbcSource.JdbcConfig, table: String): Boolean =
    withConnection(cfg) { conn =>
      val md = conn.getMetaData
      // getTables takes LIKE patterns: '_'/'%' in a real table name act
      // as wildcards, and 'sch.tbl' must be split into the
      // (schemaPattern, tablePattern) arguments or it never matches.
      // Escape when the driver declares an escape string (Derby returns
      // "" — none), and ALWAYS verify exact TABLE_NAME/TABLE_SCHEM
      // equality on the returned rows: a wildcard over-match must not
      // report a table that doesn't exist (and the escape-less path must
      // not report T7DATA for a probe of T7_ATA).
      val escOpt = Option(md.getSearchStringEscape).filter(_.nonEmpty)
      def quote(s: String): String = escOpt.fold(s)(e =>
        s.replace(e, e + e).replace("_", e + "_").replace("%", e + "%"))
      val (schemaOpt, bare) = table.lastIndexOf('.') match {
        case -1 => (None, table)
        case i  => (Some(table.substring(0, i)), table.substring(i + 1))
      }
      // unquoted identifiers are case-normalized by the destination
      // (Derby/Postgres: upper/lower); check both plus verbatim
      def variants(s: String) = Seq(s, s.toUpperCase, s.toLowerCase).distinct
      val pairs = for {
        s <- schemaOpt.map(sc => variants(sc).map(Some(_))).getOrElse(Seq(None))
        t <- variants(bare)
      } yield (s, t)
      pairs.exists { case (s, t) =>
        val rs = md.getTables(null, s.map(quote).orNull, quote(t), Array("TABLE"))
        try {
          var found = false
          while (!found && rs.next())
            found = rs.getString("TABLE_NAME") == t &&
              s.forall(_ == rs.getString("TABLE_SCHEM"))
          found
        } finally rs.close()
      }
    }

  private def columnsOf(conn: Connection, table: String): Set[String] = {
    val st = conn.createStatement()
    try {
      val rs = st.executeQuery(s"SELECT * FROM $table WHERE 1=0")
      try {
        val md = rs.getMetaData
        (1 to md.getColumnCount).map(md.getColumnName).toSet
      } finally rs.close()
    } finally st.close()
  }

  private def dropIfExists(cfg: JdbcSource.JdbcConfig, table: String): Unit =
    withConnection(cfg) { conn =>
      try exec(conn, s"DROP TABLE $table")
      catch { case _: java.sql.SQLException => () }
    }
}
