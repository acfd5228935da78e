package graft.connectors.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.core.StateStore
import graft.ops.Multimodal

/** Inbox/IMAP source (SURVEY §2.1 row 21, sources/inbox/__init__.py:21-179):
  * UID-cursored message listing with server-side SINCE/FROM criteria
  * pushdown (75-93), message bodies, and attachments as FileItems — binary
  * content + typed metadata (99-173), feeding the engine's multimodal
  * column conventions.
  *
  * The mail protocol client is a trait (no mail libs in this container);
  * the shape — UID high-water mark in state, criteria pushed to the
  * server, attachments never shuffled before metadata projection — is the
  * real contract.
  */
object Inbox {

  final case class MailCriteria(
      sinceDate: Option[String] = None,  // server-side SINCE
      fromAddress: Option[String] = None, // server-side FROM
      folder: String = "INBOX",
  )

  final case class MailMessage(
      uid: Long,
      messageId: String,
      from: String,
      to: String,
      subject: String,
      date: String, // ISO
      bodyText: String,
  )

  final case class MailAttachment(
      uid: Long,
      fileName: String,
      mimeType: String,
      content: Array[Byte],
  )

  trait MailClient extends Serializable {
    /** UIDs above `afterUid` matching the criteria (server-side search). */
    def listUids(criteria: MailCriteria, afterUid: Long): Seq[Long]
    def fetchMessage(folder: String, uid: Long): MailMessage
    def fetchAttachments(folder: String, uid: Long): Seq[MailAttachment]
  }

  def uidStateKey(folder: String) = s"inbox.last_uid.$folder"

  /** One bounded batch of new messages: UIDs beyond the committed
    * high-water mark, fetched in parallel on executors.
    */
  def readMessages(
      spark: SparkSession,
      client: MailClient,
      criteria: MailCriteria,
      state: StateStore,
  ): (DataFrame, Long) = {
    import spark.implicits._
    val lastUid = state.getLong(uidStateKey(criteria.folder)).getOrElse(0L)
    val uids = client.listUids(criteria, lastUid)
    val folder = criteria.folder
    val df = spark.createDataset(uids)
      .repartition(math.max(1, math.min(uids.size, 32)))
      .map(uid => client.fetchMessage(folder, uid))
      .toDF()
    (df, if (uids.isEmpty) lastUid else uids.max)
  }

  /** Attachments as multimodal rows: binary content + (media_type, format,
    * n_bytes, sha) metadata struct, mirroring FileItem
    * (sources/inbox/__init__.py:136-173).
    */
  def readAttachments(
      spark: SparkSession,
      client: MailClient,
      folder: String,
      uids: Seq[Long],
  ): DataFrame = {
    import spark.implicits._
    val raw = spark.createDataset(uids)
      .repartition(math.max(1, math.min(uids.size, 32)))
      .flatMap(uid => client.fetchAttachments(folder, uid))
      .toDF()
    Multimodal.withMediaMeta(raw, "content", "attachment", "raw")
  }

  def commit(state: StateStore, folder: String, lastUid: Long): Unit = {
    state.put(uidStateKey(folder), lastUid)
    state.commit()
  }
}
