package graft.ops

import java.util.concurrent.atomic.{AtomicInteger, AtomicReference}
import graft.SparkTestBase
import graft.ops.Extraction.{DocFeatureExtractor, ExtractDoc}

class ExtractionSpec extends SparkTestBase {
  import spark.implicits._

  test("canned extractor e2e: one column per query field, answers aligned by id") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta"),
      (2L, "one two"),
      (3L, "solo")).toDF("doc_id", "text")
    val out = Extraction.extractStructured(docs, "doc_id", "text", Map(
      "summary" -> "summarize this",
      "n_words" -> "count the words",
      "head" -> "opening characters"))
      .orderBy("doc_id").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
    // fields land in sorted order: head, n_words, summary
    assert(out.head.schema.fieldNames.toSeq == Seq("doc_id", "head", "n_words", "summary"))
    assert(out(0).getString(1) == "alpha beta gamma delta e") // take(24)
    assert(out(0).getString(2) == "7")
    assert(out(0).getString(3) == "alpha beta gamma delta epsilon")
    assert(out(2).getString(2) == "1" && out(2).getString(3) == "solo")
  }

  test("extractor lifecycle: open/close once per partition, batches capped at batchSize") {
    import ExtractionSpec.{Probe, ProbeExtractor}
    Probe.reset()
    val docs = spark.range(0, 100).selectExpr("id AS doc_id", "concat('doc ', id) AS text")
      .repartition(4)
    val out = Extraction.extractStructured(docs, "doc_id", "text",
      Map("tag" -> "anything"), new ProbeExtractor, batchSize = 8)
    assert(out.count() == 100)
    assert(Probe.opens.get() == 4, s"open per partition, got ${Probe.opens.get()}")
    assert(Probe.closes.get() == 4, s"close per partition, got ${Probe.closes.get()}")
    val sizes = Probe.batchSizes.get()
    assert(sizes.forall(_ <= 8), s"batch over cap: $sizes")
    assert(sizes.sum == 100)
    // a real remote client amortizes per batch: most batches must be full
    assert(sizes.count(_ == 8) >= 8)

    // a limit that drops iterators mid-partition must still close every
    // opened client (task-completion hook)
    Probe.reset()
    Extraction.extractStructured(docs, "doc_id", "text",
      Map("tag" -> "anything"), new ProbeExtractor, batchSize = 8).limit(3).collect()
    assert(Probe.opens.get() == Probe.closes.get(),
      s"opens ${Probe.opens.get()} != closes ${Probe.closes.get()} after early stop")
  }

  test("null documents yield all-null answers without reaching the extractor") {
    val strict = new DocFeatureExtractor {
      def extract(docs: Seq[ExtractDoc], queries: Map[String, String]): Seq[Map[String, String]] = {
        docs.foreach(d => require(d.content != null, "null leaked into extractor"))
        docs.map(d => Map("f" -> d.content.take(4)))
      }
    }
    val docs = Seq((1L, Some("text one")), (2L, None), (3L, Some("three")))
      .toDF("doc_id", "text")
    val out = Extraction.extractStructured(docs, "doc_id", "text", Map("f" -> "q"), strict)
      .orderBy("doc_id").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
    assert(out(0).getString(1) == "text" && out(2).getString(1) == "thre")
    assert(out(1).isNullAt(1))
  }

  test("missing fields from the extractor surface as nulls, not failures") {
    val half = new DocFeatureExtractor {
      def extract(docs: Seq[ExtractDoc], queries: Map[String, String]): Seq[Map[String, String]] =
        docs.map(d => Map("present" -> d.id.toString)) // omits "absent"
    }
    val docs = Seq((7L, "x")).toDF("doc_id", "text")
    val row = Extraction.extractStructured(docs, "doc_id", "text",
      Map("present" -> "q1", "absent" -> "q2"), half).head()
    assert(row.getString(row.fieldIndex("present")) == "7")
    assert(row.isNullAt(row.fieldIndex("absent")))
  }
}

/** Probe lives outside the suite so the extractor closure doesn't drag
  * the (non-serializable) ScalaTest engine along. local[*] runs tasks
  * in-process, so static state observes the executor side.
  */
object ExtractionSpec {
  object Probe {
    val opens = new AtomicInteger(0)
    val closes = new AtomicInteger(0)
    val batchSizes = new AtomicReference[List[Int]](Nil)
    def reset(): Unit = { opens.set(0); closes.set(0); batchSizes.set(Nil) }
  }

  class ProbeExtractor extends DocFeatureExtractor {
    override def open(): Unit = { Probe.opens.incrementAndGet(); () }
    override def close(): Unit = { Probe.closes.incrementAndGet(); () }
    def extract(docs: Seq[ExtractDoc], queries: Map[String, String]): Seq[Map[String, String]] = {
      Probe.batchSizes.updateAndGet(docs.length :: _)
      docs.map(d => queries.map { case (f, _) => f -> s"$f:${d.id}" })
    }
  }
}
