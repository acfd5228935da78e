package graft.ops

import graft.SparkTestBase
import graft.ops.Embedding.{EmbedDoc, EmbeddingClient}

object EmbeddingSpec {
  object Probe {
    val opens = new java.util.concurrent.atomic.AtomicInteger(0)
    val closes = new java.util.concurrent.atomic.AtomicInteger(0)
    val batchSizes = new java.util.concurrent.atomic.AtomicReference[List[Int]](Nil)
    def reset(): Unit = { opens.set(0); closes.set(0); batchSizes.set(Nil) }
  }

  final class ProbeEmbedder extends EmbeddingClient {
    override def open(): Unit = { Probe.opens.incrementAndGet(); () }
    override def close(): Unit = { Probe.closes.incrementAndGet(); () }
    def embed(docs: Seq[EmbedDoc], dim: Int): Seq[Array[Double]] = {
      Probe.batchSizes.updateAndGet(docs.length :: _)
      docs.map(d => Array.tabulate(dim)(i => if (i == (d.id % dim).toInt) 1.0 else 0.0))
    }
  }
}

class EmbeddingSpec extends SparkTestBase {
  import spark.implicits._

  test("hashed-BoW embedder: deterministic, dim-bounded, token-count mass") {
    val docs = Seq((1L, "alpha beta alpha"), (2L, "gamma"), (3L, ""))
      .toDF("doc_id", "text")
    val out = Embedding.embedDocuments(docs, "doc_id", "text", dim = 16)
      .orderBy("doc_id").collect()
    assert(out.length == 3)
    val v1 = out(0).getSeq[Double](1)
    assert(v1.length == 16)
    // 3 tokens, signed: total absolute mass <= 3, parity matches count
    assert(v1.map(math.abs).sum <= 3.0 && v1.map(math.abs).sum >= 1.0)
    // determinism: same text, same vector
    val again = Embedding.embedDocuments(docs, "doc_id", "text", dim = 16)
      .orderBy("doc_id").collect()(0).getSeq[Double](1)
    assert(again == v1)
    // empty text still embeds (the '' token hashes somewhere)
    assert(out(2).getSeq[Double](1).map(math.abs).sum == 1.0)
  }

  test("embedder lifecycle: open/close once per partition, batches capped, early stop closes") {
    import EmbeddingSpec.{Probe, ProbeEmbedder}
    Probe.reset()
    val docs = spark.range(0, 100).selectExpr("id AS doc_id", "concat('doc ', id) AS text")
      .repartition(4)
    val out = Embedding.embedDocuments(docs, "doc_id", "text", dim = 8,
      new ProbeEmbedder, batchSize = 8)
    assert(out.count() == 100)
    assert(Probe.opens.get() == 4 && Probe.closes.get() == 4,
      s"opens ${Probe.opens.get()} closes ${Probe.closes.get()}")
    val sizes = Probe.batchSizes.get()
    assert(sizes.forall(_ <= 8) && sizes.sum == 100)

    Probe.reset()
    Embedding.embedDocuments(docs, "doc_id", "text", dim = 8,
      new ProbeEmbedder, batchSize = 8).limit(3).collect()
    assert(Probe.opens.get() == Probe.closes.get(),
      s"opens ${Probe.opens.get()} != closes ${Probe.closes.get()} after early stop")
  }

  test("null documents yield null embeddings without reaching the client") {
    val strict = new EmbeddingClient {
      def embed(docs: Seq[EmbedDoc], dim: Int): Seq[Array[Double]] = {
        docs.foreach(d => require(d.text != null, "null leaked into embedder"))
        docs.map(_ => Array.fill(dim)(0.5))
      }
    }
    val docs = Seq((1L, Some("text")), (2L, None), (3L, Some("more")))
      .toDF("doc_id", "text")
    val out = Embedding.embedDocuments(docs, "doc_id", "text", dim = 4, strict)
      .orderBy("doc_id").collect()
    assert(out(0).getSeq[Double](1) == Seq(0.5, 0.5, 0.5, 0.5))
    assert(out(1).isNullAt(1))
    assert(!out(2).isNullAt(1))
  }

  test("a wrong-dim or misaligned client fails loudly, not silently") {
    val shortVec = new EmbeddingClient {
      def embed(docs: Seq[EmbedDoc], dim: Int): Seq[Array[Double]] =
        docs.map(_ => Array(1.0)) // ignores dim
    }
    val docs = Seq((1L, "x")).toDF("doc_id", "text")
    val e = intercept[Exception] {
      Embedding.embedDocuments(docs, "doc_id", "text", dim = 4, shortVec).collect()
    }
    assert(e.getMessage.contains("dim") || e.getCause != null)
  }
}
