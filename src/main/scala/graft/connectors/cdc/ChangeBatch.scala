package graft.connectors.cdc

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.core.{Disposition, MergeEngine, TableHints}
import PgOutput._

/** Assembles decoded pgoutput messages into per-relation change
  * DataFrames carrying the CDC framework columns:
  * `_lsn BIGINT` (dedup_sort desc) and `_deleted_ts TIMESTAMP`
  * (hard_delete marker) — the contract the merge writer consumes
  * (sources/pg_replication/helpers.py:764-773).
  *
  * Batching rules mirrored from the reference:
  *  - transactions are never split across batches
  *    (sources/pg_replication/__init__.py:62-67): `consume` only emits
  *    completed transactions; an open transaction at the cut stays pending;
  *  - a Relation re-definition mid-stream forces a batch flush so each
  *    batch has a single schema per table
  *    (sources/pg_replication/helpers.py:725-736 StopReplication).
  */
object ChangeBatch {

  /** Postgres type OID → Spark type (text output format), the public
    * subset of the reference's OID map
    * (sources/pg_replication/schema_types.py:31-110).
    */
  def oidToSpark(oid: Int): DataType = oid match {
    case 16           => BooleanType       // bool
    case 21           => ShortType         // int2
    case 23           => IntegerType       // int4
    case 20           => LongType          // int8
    case 700          => FloatType         // float4
    case 701          => DoubleType        // float8
    case 1700         => DecimalType(38, 9) // numeric (no typmod → generous)
    case 1082         => DateType          // date
    case 1114 | 1184  => TimestampType     // timestamp / timestamptz
    case 17           => BinaryType        // bytea (hex text '\x...')
    case 114 | 3802   => StringType        // json / jsonb kept as json text
    case _            => StringType        // text, varchar, uuid, time, ...
  }

  final case class Change(
      relation: RelationMeta,
      lsn: Long,
      commitTsMicros: Long,
      deleted: Boolean,
      values: Seq[TupleValue],
  )

  final case class Batch(changes: Seq[Change]) {
    def byRelation: Map[String, Seq[Change]] =
      changes.groupBy(c => c.relation.name)
  }

  /** Result of consuming a frame stream: completed batches plus the LSN to
    * resume from (the last committed transaction's end).
    */
  final case class ConsumeResult(
      batch: Batch,
      lastCommitLsn: Option[Long],
      schemaChanged: Boolean,
      /** Relations truncated in this batch: the loader must clear those
        * tables BEFORE applying the batch's changes (postgres TRUNCATE
        * replicates as a Truncate frame, not per-row deletes).
        */
      truncatedRelations: Seq[String] = Nil,
  )

  /** Consume (lsn, frame) pairs up to `targetBatchSize` items, honoring
    * transaction boundaries (may exceed the target to finish a
    * transaction — reference target_batch_size semantics,
    * sources/pg_replication/__init__.py:26,60-67).
    */
  def consume(
      frames: Iterator[(Long, Array[Byte])],
      targetBatchSize: Int = 1000,
  ): ConsumeResult = {
    val relations = scala.collection.mutable.Map.empty[Int, RelationMeta]
    val emitted = scala.collection.mutable.ArrayBuffer.empty[Change]
    val pendingTxn = scala.collection.mutable.ArrayBuffer.empty[Change]
    val pendingTruncates = scala.collection.mutable.ArrayBuffer.empty[Int]
    val truncated = scala.collection.mutable.LinkedHashSet.empty[String]
    // v2 streamed transactions: ordered (subXid, change-or-truncate) per
    // top-level xid, held until StreamCommit/StreamAbort. Each entry keeps
    // the SUBtransaction xid from the wire so a subxact abort can drop
    // exactly its changes.
    val streamBuf = scala.collection.mutable.Map
      .empty[Int, scala.collection.mutable.ArrayBuffer[(Int, Either[Seq[Int], Change])]]
    var inStream = false
    var curStreamXid = 0
    var commitTs = 0L
    var lastCommitLsn: Option[Long] = None
    var schemaChanged = false
    var done = false

    while (frames.hasNext && !done) {
      val (lsn, frame) = frames.next()
      PgOutput.decode(frame, inStream) match {
        case Begin(_, ts, _) =>
          commitTs = ts
        case Relation(meta) =>
          if (relations.get(meta.relationId).exists(_ != meta) && emitted.nonEmpty) {
            // schema changed mid-stream: flush what we have, caller starts
            // a new batch with the evolved schema
            schemaChanged = true
            done = true
          }
          relations(meta.relationId) = meta
        case Insert(relId, row) =>
          pendingTxn += Change(relations(relId), lsn, commitTs, deleted = false, row)
        case Update(relId, _, newRow) =>
          pendingTxn += Change(relations(relId), lsn, commitTs, deleted = false, newRow)
        case Delete(relId, keyRow) =>
          pendingTxn += Change(relations(relId), lsn, commitTs, deleted = true, keyRow)
        case Truncate(relIds) =>
          pendingTruncates ++= relIds
          // rows written EARLIER in this txn to a truncated relation are
          // wiped by the truncate itself — drop them now (safe even if the
          // txn never commits: an open txn's pendingTxn is discarded)
          val ids = relIds.toSet
          pendingTxn.filterInPlace(ch => !ids.contains(ch.relation.relationId))
        case Commit(_, endLsn, _) =>
          // a committed truncate also wipes rows from earlier txns in this
          // batch: the loader clears the table BEFORE applying the batch,
          // so keeping them would resurrect truncated rows. Filter emitted
          // before appending this txn — its post-truncate changes survive.
          val truncIds = pendingTruncates.toSet
          if (truncIds.nonEmpty)
            emitted.filterInPlace(ch => !truncIds.contains(ch.relation.relationId))
          emitted ++= pendingTxn
          pendingTxn.clear()
          pendingTruncates.foreach(id => relations.get(id).foreach(m => truncated += m.name))
          pendingTruncates.clear()
          lastCommitLsn = Some(endLsn)
          if (emitted.size >= targetBatchSize) done = true

        // ---- v2 streamed transactions
        case StreamStart(xid, _) =>
          inStream = true
          curStreamXid = xid
          streamBuf.getOrElseUpdate(xid, scala.collection.mutable.ArrayBuffer.empty)
        case StreamStop =>
          inStream = false
        case Streamed(subXid, inner) =>
          val buf = streamBuf.getOrElseUpdate(curStreamXid, scala.collection.mutable.ArrayBuffer.empty)
          inner match {
            case Relation(meta) =>
              if (relations.get(meta.relationId).exists(_ != meta) && emitted.nonEmpty) {
                schemaChanged = true
                done = true
              }
              relations(meta.relationId) = meta
            case Insert(relId, row) =>
              buf += subXid -> Right(Change(relations(relId), lsn, 0L, deleted = false, row))
            case Update(relId, _, newRow) =>
              buf += subXid -> Right(Change(relations(relId), lsn, 0L, deleted = false, newRow))
            case Delete(relId, keyRow) =>
              buf += subXid -> Right(Change(relations(relId), lsn, 0L, deleted = true, keyRow))
            case Truncate(relIds) =>
              buf += subXid -> Left(relIds)
            case _ => ()
          }
        case StreamAbort(xid, subXid) =>
          if (subXid == xid) streamBuf.remove(xid)
          else streamBuf.get(xid).foreach(_.filterInPlace(_._1 != subXid))
        case StreamCommit(xid, _, endLsn, ts) =>
          // replay the surviving entries with the same ordering semantics a
          // normal txn gets: a truncate wipes this txn's earlier rows and
          // the batch's earlier txns for those relations
          val entries = streamBuf.remove(xid).getOrElse(scala.collection.mutable.ArrayBuffer.empty)
          val txChanges = scala.collection.mutable.ArrayBuffer.empty[Change]
          entries.foreach {
            case (_, Right(ch)) => txChanges += ch.copy(commitTsMicros = ts)
            case (_, Left(relIds)) =>
              val ids = relIds.toSet
              txChanges.filterInPlace(c => !ids.contains(c.relation.relationId))
              emitted.filterInPlace(c => !ids.contains(c.relation.relationId))
              relIds.foreach(id => relations.get(id).foreach(m => truncated += m.name))
          }
          emitted ++= txChanges
          lastCommitLsn = Some(endLsn)
          if (emitted.size >= targetBatchSize) done = true

        case _ => ()
      }
    }
    ConsumeResult(Batch(emitted.toSeq), lastCommitLsn, schemaChanged, truncated.toSeq)
  }

  /** Spark schema for a relation's change rows: data columns as strings
    * (text output format) + framework columns; `toTypedDf` applies OID
    * casts. `_toast_unchanged` records which columns arrived as 'u'
    * (unchanged TOAST — the value was NOT sent and must be taken from the
    * base row, sources/pg_replication/schema_types.py:123-140).
    */
  def changeRows(spark: SparkSession, relation: RelationMeta, changes: Seq[Change]): DataFrame = {
    val fields = relation.columns.map(c => StructField(c.name, StringType)) ++
      Seq(StructField("_lsn", LongType), StructField("_deleted_ts", TimestampType),
        StructField("_toast_unchanged", ArrayType(BooleanType, containsNull = false)))
    val rows = changes.map { ch =>
      val vals = ch.values.map(_.value.orNull)
      val mask = ch.values.map(_.unchangedToast)
      val deletedTs =
        if (ch.deleted) new java.sql.Timestamp(ch.commitTsMicros / 1000) else null
      Row.fromSeq(vals ++ Seq(ch.lsn, deletedTs, mask))
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, math.max(1, rows.size / 10000 + 1)),
      StructType(fields))
  }

  /** Text-format → typed columns per the OID map. Postgres booleans arrive
    * as 't'/'f'; bytea as '\x<hex>'.
    */
  def toTypedDf(df: DataFrame, relation: RelationMeta): DataFrame = {
    val cols: Seq[Column] = relation.columns.map { c =>
      val raw = col(c.name)
      val typed = oidToSpark(c.typeOid) match {
        case BooleanType => raw === "t"
        case BinaryType  => unhex(regexp_replace(raw, "^\\\\x", ""))
        case dt          => raw.cast(dt)
      }
      typed.as(c.name)
    } ++ Seq(col("_lsn"), col("_deleted_ts")) ++
      (if (df.columns.contains("_toast_unchanged")) Seq(col("_toast_unchanged")) else Nil)
    df.select(cols: _*)
  }

  /** Apply a typed change batch to the base table, resolving unchanged-
    * TOAST columns from the base row BEFORE the merge: an Update whose
    * column arrived as 'u' keeps the base value instead of nulling it —
    * replacing the whole row from the wire image alone would lose data.
    *
    * The resolution is fully plan-side (no driver probe job): rows
    * carrying a toast marker are split off, left-joined to the base on
    * the pk, and unioned back with the untouched rows. In the common
    * no-toast batch the marker side is empty at runtime and AQE's
    * empty-relation propagation collapses the join — the base is never
    * scanned for it.
    */
  def applyChanges(base: Option[DataFrame], typed: DataFrame, relation: RelationMeta): DataFrame = {
    val hints = mergeHints(relation)
    val hasMask = typed.columns.contains("_toast_unchanged")
    val resolved = (base, hasMask) match {
      case (Some(b), true) =>
        val pk = hints.primaryKey
        val needsBase = exists(col("_toast_unchanged"), m => m)
        val outCols: Seq[Column] =
          relation.columns.map(c => col(c.name)) ++ Seq(col("_lsn"), col("_deleted_ts"))
        val clean = typed.filter(!needsBase).select(outCols: _*)
        val baseCols = relation.columns.map(_.name).filterNot(pk.contains)
        val bPrefixed = b.select(
          pk.map(col) ++ baseCols.map(c => col(c).as(s"__base_$c")): _*)
        val joined = typed.filter(needsBase).join(bPrefixed, pk, "left")
        val cols: Seq[Column] = relation.columns.zipWithIndex.map { case (c, i) =>
          if (pk.contains(c.name)) col(c.name)
          else when(element_at(col("_toast_unchanged"), i + 1), col(s"__base_${c.name}"))
            .otherwise(col(c.name)).as(c.name)
        } ++ Seq(col("_lsn"), col("_deleted_ts"))
        joined.select(cols: _*).unionByName(clean)
      case _ => typed.drop("_toast_unchanged")
    }
    MergeEngine.mergePlan(base, resolved.drop("_toast_unchanged"), hints)
  }

  /** Snapshot-bootstrap handoff (reference `init_replication` with
    * `persist_snapshots=True`, sources/pg_replication/helpers.py:91-159:
    * the slot's exported snapshot is the initial table state and the
    * stream applies on top). When replaying a frame archive the boundary
    * LSN makes the handoff exact: changes at/under `snapshotLsn` are
    * already IN the snapshot and must not re-apply — without the filter a
    * pre-boundary delete would erase a snapshot row that a later
    * pre-boundary insert restored, or vice versa.
    */
  def bootstrap(
      spark: SparkSession,
      snapshot: DataFrame,
      relation: RelationMeta,
      frames: Iterator[(Long, Array[Byte])],
      snapshotLsn: Long,
      targetBatchSize: Int = 1000,
  ): (DataFrame, ConsumeResult) = {
    val res = consume(frames, targetBatchSize)
    val changes = res.batch.byRelation.getOrElse(relation.name, Nil)
      .filter(_.lsn > snapshotLsn)
    val typed = toTypedDf(changeRows(spark, relation, changes), relation)
    (applyChanges(Some(snapshot), typed, relation), res)
  }

  /** Merge hints for a relation's change stream: pk from the replica
    * identity, latest-lsn-wins, hard delete on `_deleted_ts`
    * (sources/pg_replication/helpers.py:764-778).
    */
  def mergeHints(relation: RelationMeta): TableHints = TableHints(
    tableName = relation.name,
    disposition = Disposition.Merge,
    primaryKey = relation.columns.filter(_.isKey).map(_.name),
    dedupSort = Some(("_lsn", true)),
    hardDeleteCol = Some("_deleted_ts"),
  )
}
