package graft.connectors.sources

import graft.SparkTestBase
import graft.core.StateStore
import Inbox._

class FakeMail(messages: Map[Long, MailMessage], attachments: Map[Long, Seq[MailAttachment]])
    extends MailClient {
  override def listUids(criteria: MailCriteria, afterUid: Long): Seq[Long] = {
    val base = messages.keys.toSeq.sorted.filter(_ > afterUid)
    criteria.fromAddress match {
      case Some(f) => base.filter(uid => messages(uid).from == f)
      case None    => base
    }
  }
  override def fetchMessage(folder: String, uid: Long): MailMessage = messages(uid)
  override def fetchAttachments(folder: String, uid: Long): Seq[MailAttachment] =
    attachments.getOrElse(uid, Nil)
}

class InboxSpec extends SparkTestBase {
  import spark.implicits._

  private def msg(uid: Long, from: String) =
    uid -> MailMessage(uid, s"<m$uid>", from, "me@x", s"subject $uid", "2024-01-01T00:00:00Z", s"body $uid")

  test("uid cursor: first run reads all, commit, second run reads only new") {
    val dir = tmpDir("inbox")
    val state = StateStore(dir, "p")
    val client = new FakeMail(Map(msg(1, "a@x"), msg(2, "b@x"), msg(3, "a@x")), Map.empty)

    val (df1, hw1) = readMessages(spark, client, MailCriteria(), state)
    assert(df1.count() == 3 && hw1 == 3L)
    commit(state, "INBOX", hw1)

    val (df2, hw2) = readMessages(spark, client, MailCriteria(), StateStore(dir, "p"))
    assert(df2.count() == 0 && hw2 == 3L)
  }

  test("server-side FROM criteria prunes before fetch") {
    val state = StateStore(tmpDir("inbox2"), "p")
    val client = new FakeMail(Map(msg(1, "a@x"), msg(2, "b@x")), Map.empty)
    val (df, _) = readMessages(spark, client, MailCriteria(fromAddress = Some("a@x")), state)
    assert(df.select("uid").as[Long].collect().toSeq == Seq(1L))
  }

  test("attachments carry binary content + metadata struct") {
    val att = MailAttachment(1L, "doc.pdf", "application/pdf", Array[Byte](1, 2, 3, 4))
    val client = new FakeMail(Map(msg(1, "a@x")), Map(1L -> Seq(att)))
    val df = readAttachments(spark, client, "INBOX", Seq(1L))
    assert(df.columns.contains("content_meta"))
    val r = df.selectExpr("fileName", "content_meta.n_bytes", "content_meta.sha").head()
    assert(r.getString(0) == "doc.pdf" && r.getLong(1) == 4L && r.getString(2).length == 64)
  }
}
