package graft.connectors.db

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** Mongo-style document scan rebuilt on partitioned reads (SURVEY §2.1
  * row 2): the reference splits a collection into parallel skip/limit
  * batches (sources/mongodb/helpers.py:215-227) executed on a thread pool
  * (255-263); here each split is a Spark task and the store client is
  * opened per partition.
  *
  * Pushdown mirrors the reference's option surface:
  *  - filter: cursor `$gte/$lt` range on the incremental field plus user
  *    filter, with conflict detection (helpers.py:97-120,628-647);
  *  - projection: include/exclude lists with forced pk inclusion
  *    (helpers.py:122-157).
  */
object DocumentSource {

  /** Abstract document store: count + range scan returning JSON documents.
    * Implementations wrap a driver (or a fixture in tests); must be
    * serializable since scans run on executors.
    */
  trait DocumentStore extends Serializable {
    def count(collection: String, filter: Map[String, String]): Long
    /** Documents [skip, skip+limit) under `filter`, as JSON strings,
      * ordered by a stable key so splits are disjoint.
      */
    def scan(collection: String, filter: Map[String, String], skip: Long, limit: Long,
        projection: Seq[String]): Iterator[String]
  }

  /** Projection resolution with pk protection: exclude lists can never drop
    * the pk; include lists always gain it (helpers.py:122-157).
    */
  def resolveProjection(
      allFields: Seq[String],
      include: Seq[String],
      exclude: Seq[String],
      pk: String,
  ): Seq[String] = {
    require(include.isEmpty || exclude.isEmpty, "projection is include-only or exclude-only")
    if (include.nonEmpty) (include :+ pk).distinct
    else if (exclude.nonEmpty) allFields.filterNot(f => exclude.contains(f) && f != pk)
    else allFields
  }

  /** Cursor range filter with user-filter conflict detection: a user
    * filter on the cursor field would silently fight the incremental
    * bound, so it is rejected (helpers.py:628-647).
    */
  def cursorFilter(
      cursorField: Option[String],
      last: Option[String],
      end: Option[String],
      userFilter: Map[String, String],
  ): Map[String, String] = {
    cursorField.foreach { cf =>
      require(!userFilter.contains(cf),
        s"user filter on cursor field '$cf' conflicts with incremental bounds")
    }
    val range = cursorField.toSeq.flatMap { cf =>
      last.map(v => s"$cf.gte" -> v).toSeq ++ end.map(v => s"$cf.lt" -> v).toSeq
    }
    userFilter ++ range
  }

  /** Parallel chunked scan: one count, then ceil(n/chunk) disjoint
    * skip/limit splits, one Spark task each (chunk default mirrors the
    * reference's 10 000, sources/mongodb/__init__.py:104).
    */
  def read(
      spark: SparkSession,
      store: DocumentStore,
      collection: String,
      filter: Map[String, String] = Map.empty,
      projection: Seq[String] = Nil,
      chunkSize: Long = 10000,
  ): DataFrame = {
    import spark.implicits._
    val total = store.count(collection, filter)
    if (total == 0) return spark.emptyDataFrame
    val splits = (0L until total by chunkSize).map(skip => (skip, math.min(chunkSize, total - skip)))
    val docs: Dataset[String] = spark
      .createDataset(splits)
      .repartition(splits.size)
      .mapPartitions { it =>
        it.flatMap { case (skip, limit) => store.scan(collection, filter, skip, limit, projection) }
      }
    spark.read.json(docs)
  }
}
