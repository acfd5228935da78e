package graft.connectors.db

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.core.{Disposition, TableHints}

/** JDBC table scan — `sql_database` parity (SURVEY §2.1 row 5; used by the
  * reference at sources/pg_replication/helpers.py:183-192,439-451). Spark's
  * JDBC source already does reflection, predicate pushdown and partitioned
  * reads; this wrapper pins the engine's conventions:
  *  - partitioned parallel reads on a numeric column (the reference's
  *    skip/limit batch analog, sources/mongodb/helpers.py:215-227);
  *  - cursor predicates pushed into the remote query
  *    (`WHERE cursor > last`, sources/salesforce/helpers/records.py:89-94);
  *  - pk reflection left to the caller's hints (Spark JDBC surfaces no pk).
  */
object JdbcSource {

  final case class JdbcConfig(
      url: String,
      table: String, // table name or "(subquery) alias"
      user: Option[String] = None,
      password: Option[String] = None,
      driver: Option[String] = None,
      partitionColumn: Option[String] = None,
      numPartitions: Int = 8,
      fetchSize: Int = 10000,
      options: Map[String, String] = Map.empty,
  )

  /** Build the reader. When a partition column is set, bounds are probed
    * with one remote MIN/MAX query so each executor reads a disjoint range
    * — at scale this is the difference between 1 connection streaming the
    * table and N connections each reading 1/N of it.
    */
  def read(spark: SparkSession, cfg: JdbcConfig, pushdown: Option[String] = None): DataFrame = {
    val table = pushdown match {
      case Some(pred) => s"(SELECT * FROM ${cfg.table} WHERE $pred) graft_pushdown"
      case None       => cfg.table
    }
    var reader = spark.read.format("jdbc")
      .option("url", cfg.url)
      .option("dbtable", table)
      .option("fetchsize", cfg.fetchSize)
    cfg.user.foreach(u => reader = reader.option("user", u))
    cfg.password.foreach(p => reader = reader.option("password", p))
    cfg.driver.foreach(d => reader = reader.option("driver", d))
    cfg.options.foreach { case (k, v) => reader = reader.option(k, v) }

    cfg.partitionColumn match {
      case Some(pc) =>
        val bounds = spark.read.format("jdbc")
          .option("url", cfg.url)
          .option("dbtable", s"(SELECT MIN($pc) lo, MAX($pc) hi FROM ${cfg.table}) graft_bounds")
          .options(cfg.user.map("user" -> _).toMap ++ cfg.password.map("password" -> _).toMap)
          .load().head()
        if (bounds.isNullAt(0)) reader.load()
        else reader
          .option("partitionColumn", pc)
          .option("lowerBound", bounds.get(0).toString)
          .option("upperBound", bounds.get(1).toString)
          .option("numPartitions", cfg.numPartitions)
          .load()
      case None => reader.load()
    }
  }

  /** Default hints for a reflected table: merge on the given pk, else
    * full replace (reflection_level semantics left to the caller).
    */
  def defaultHints(table: String, primaryKey: Seq[String]): TableHints =
    if (primaryKey.nonEmpty)
      TableHints(table, Disposition.Merge, primaryKey = primaryKey)
    else TableHints(table, Disposition.Replace)
}
