package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoder, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling: image/audio/video as opaque `binary`
  * columns with a typed metadata struct, plus the Spark-side plumbing for
  * decode / feature-extract stages.
  *
  * WAV/BMP/PNG/JPEG/GIF decode is REAL (JDK-only codecs in `MediaCodecs`,
  * including `javax.imageio` for JPEG and multi-frame animated GIF —
  * `sampleFrames` does real frame extraction); only true video codecs the
  * JDK does not ship (H.264/H.265/VP9/AV1) use the clearly-marked
  * deterministic fake (`fakeDecodeKernel`). Everything around the kernels
  * — schema, batch iteration via mapPartitions, partition sizing — is
  * real and is what matters at 100 TB: media blobs must never be
  * shuffled (decode before any wide op, project metadata early, keep blobs
  * out of join keys).
  *
  * Reference pattern: FileItem attachments as binary + metadata
  * (sources/inbox/__init__.py:99-173) and per-document model calls batched
  * in an executor-side loop (sources/unstructured_data/helpers.py:20-91).
  */
object Multimodal {

  /** Typed metadata carried next to each blob. */
  val mediaMetaSchema: StructType = StructType(Seq(
    StructField("media_type", StringType),   // image|audio|video
    StructField("format", StringType),       // png|wav|mp4|...
    StructField("n_bytes", LongType),
    StructField("sha", StringType),
  ))

  /** Wrap a binary column into the canonical (content, meta) pair. */
  def withMediaMeta(df: DataFrame, binCol: String, mediaType: String, format: String): DataFrame =
    df.withColumn(
      s"${binCol}_meta",
      struct(
        lit(mediaType).as("media_type"),
        lit(format).as("format"),
        length(col(binCol)).cast(LongType).as("n_bytes"),
        sha2(col(binCol), 256).as("sha"),
      ),
    )

  /** Feature row produced by the decode/extract stage. */
  case class MediaFeatures(
      id: Long,
      n_bytes: Long,
      width: Int,
      height: Int,
      n_frames: Int,
      feature: Array[Float],
  )

  /** STUB decode kernel. In production this calls the image/audio codec on
    * a batch of blobs (the libs are not in this container). The fake is
    * deterministic in the blob bytes so tests are stable; the signature —
    * Iterator[batch of blobs] -> Iterator[features] — is the real contract
    * a codec UDF must satisfy (vectorized, per-partition, no driver data).
    *
    * The fake dims derive from the byte LENGTH through a Knuth
    * multiplicative hash (not a content hash) so an external SQL oracle
    * can recompute them and hard-gate the whole mapPartitions plumbing —
    * id alignment, schema, batching. The feature vector stays
    * content-derived.
    */
  def fakeDecodeKernel(id: Long, bytes: Array[Byte]): MediaFeatures = {
    val n = bytes.length
    val h = (n.toLong * 2654435769L) & 0xffffffffL
    val c = java.util.Arrays.hashCode(bytes)
    val feat = Array.tabulate(8)(i => ((c >>> (i * 4)) & 0xf).toFloat / 15.0f)
    MediaFeatures(id, n.toLong, width = 1 + (h & 0x3ff).toInt, height = 1 + ((h >>> 10) & 0x3ff).toInt,
      n_frames = 1 + (n % 16), feature = feat)
  }

  /** Decode stage: batch-iterates each partition through the kernel.
    * Executors see blobs exactly once; output is small typed rows, so
    * everything downstream shuffles features, never media bytes.
    */
  def decodeFeatures(df: DataFrame, idCol: String, binCol: String): Dataset[MediaFeatures] = {
    implicit val enc: Encoder[MediaFeatures] = Encoders.product[MediaFeatures]
    df.select(col(idCol).cast(LongType), col(binCol))
      .mapPartitions { it: Iterator[Row] =>
        it.map(r => fakeDecodeKernel(r.getLong(0), r.getAs[Array[Byte]](1)))
      }
  }

  /** REAL decode stage for JDK-decodable formats (WAV/BMP/PNG via
    * `MediaCodecs`): same per-partition batch contract as the stub path,
    * but the kernel actually parses the container and pixels/samples.
    * Unknown formats degrade to a stub row instead of failing the batch.
    */
  def decodeMedia(df: DataFrame, idCol: String, binCol: String): Dataset[MediaCodecs.MediaInfo] = {
    implicit val enc: Encoder[MediaCodecs.MediaInfo] = Encoders.product[MediaCodecs.MediaInfo]
    df.select(col(idCol).cast(LongType), col(binCol))
      .mapPartitions { it: Iterator[Row] =>
        it.map(r => MediaCodecs.decodeAny(r.getLong(0), r.getAs[Array[Byte]](1)))
      }
  }

  /** Frame sampling plan for video blobs: every `stride`-th frame index up
    * to n_frames — pure expression, the decode kernel receives the index
    * list. Demonstrates explode-based fan-out without duplicating blobs:
    * sample indices first, join back to blobs by id at decode time.
    */
  def frameSampleIndices(nFrames: Column, stride: Int): Column =
    sequence(lit(0), greatest(nFrames - 1, lit(0)), lit(stride))

  /** Frame-sample fan-out: (id, frame_idx) rows from the feature table —
    * the blob column is never exploded; the decode pass joins these light
    * rows back to blobs by id and extracts only the sampled frames.
    */
  def sampleFramePlan(features: DataFrame, idCol: String, nFramesCol: String, stride: Int): DataFrame =
    features.select(
      col(idCol),
      explode(frameSampleIndices(col(nFramesCol), stride)).as("frame_idx"),
    )

  case class FrameFeatures(id: Long, frame_idx: Int, width: Int, height: Int, pix_sum: Long)

  /** REAL frame sampling against a real multi-frame container (animated
    * GIF — the one the JDK decodes; true video codecs are the remaining
    * stub). The kernel derives the sample indices from the container's
    * OWN frame count inside the partition — no plan join, no blob
    * movement: one narrow map, one reader open per blob, only every
    * `stride`-th frame decoded. Non-GIF or corrupt blobs contribute no
    * rows instead of failing the batch.
    */
  def sampleFrames(df: DataFrame, idCol: String, binCol: String, stride: Int): Dataset[FrameFeatures] = {
    require(stride >= 1, "stride >= 1")
    implicit val enc: Encoder[FrameFeatures] = Encoders.product[FrameFeatures]
    df.select(col(idCol).cast(LongType), col(binCol))
      .mapPartitions { it: Iterator[Row] =>
        it.flatMap { r =>
          val id = r.getLong(0)
          val bytes = r.getAs[Array[Byte]](1)
          val isGif = bytes != null && bytes.length >= 4 &&
            bytes(0) == 'G'.toByte && bytes(1) == 'I'.toByte &&
            bytes(2) == 'F'.toByte && bytes(3) == '8'.toByte
          if (!isGif) Iterator.empty
          else try {
            val n = MediaCodecs.gifFrameCount(bytes) // header walk, no pixel decode
            MediaCodecs.decodeGifFrames(bytes, 0 until n by stride)
              .iterator.map { case (i, w, h, s) => FrameFeatures(id, i, w, h, s) }
          } catch { case scala.util.control.NonFatal(_) => Iterator.empty }
        }
      }
  }

  case class ResizedMedia(id: Long, content: Array[Byte], width: Int, height: Int)

  /** STUB resize kernel: a real implementation hands the blob to the image
    * codec and re-encodes at the target size. The stub derives the
    * "original" dims the same way `fakeDecodeKernel` does, scales the long
    * side down to `maxDim` preserving aspect, and truncates the bytes
    * proportionally — deterministic in the input, so specs pin behavior.
    */
  def fakeResizeKernel(id: Long, bytes: Array[Byte], maxDim: Int): ResizedMedia = {
    val h = (bytes.length.toLong * 2654435769L) & 0xffffffffL
    val (w0, h0) = (1 + (h & 0x3ff).toInt, 1 + ((h >>> 10) & 0x3ff).toInt)
    val long0 = math.max(w0, h0)
    val scale = if (long0 <= maxDim) 1.0 else maxDim.toDouble / long0
    val (w1, h1) = (math.max(1, (w0 * scale).toInt), math.max(1, (h0 * scale).toInt))
    val keep = math.max(1, (bytes.length * scale * scale).toInt.min(bytes.length))
    ResizedMedia(id, bytes.take(keep), w1, h1)
  }

  /** Resize stage: blob in, smaller blob out, per-partition — the one
    * multimodal transform whose OUTPUT is still a blob. It must sit
    * directly after the scan (before any wide op) so the large originals
    * die with their scan partitions and only the resized bytes flow on.
    *
    * Raster images (PNG/BMP/JPEG) go through the REAL JDK resize
    * (`MediaCodecs.resizeImage`: decode → bilinear redraw → lossless
    * re-encode); blobs ImageIO can't decode fall back to the
    * deterministic stub so a mixed-modality column never fails the pass.
    */
  def resizeImages(df: DataFrame, idCol: String, binCol: String, maxDim: Int): Dataset[ResizedMedia] = {
    implicit val enc: Encoder[ResizedMedia] = Encoders.product[ResizedMedia]
    df.select(col(idCol).cast(LongType), col(binCol))
      .mapPartitions { it: Iterator[Row] =>
        it.map { r =>
          val (id, bytes) = (r.getLong(0), r.getAs[Array[Byte]](1))
          MediaCodecs.resizeImage(bytes, maxDim) match {
            case Some(ri) => ResizedMedia(id, ri.bytes, ri.width, ri.height)
            case None     => fakeResizeKernel(id, bytes, maxDim)
          }
        }
      }
  }

  /** Batched decode: the vectorized-kernel contract (a GPU/codec kernel
    * wants blob BATCHES, not single rows). Same per-blob results as
    * `decodeFeatures`; only the invocation shape changes — each partition
    * iterates in `batchSize` groups and the kernel sees the whole group.
    */
  def decodeFeaturesBatched(df: DataFrame, idCol: String, binCol: String, batchSize: Int = 64): Dataset[MediaFeatures] = {
    implicit val enc: Encoder[MediaFeatures] = Encoders.product[MediaFeatures]
    df.select(col(idCol).cast(LongType), col(binCol))
      .mapPartitions { it: Iterator[Row] =>
        it.grouped(batchSize).flatMap { batch =>
          // the kernel receives the full batch (here: stub maps each blob;
          // a real codec would run one vectorized call over the arrays)
          batch.map(r => fakeDecodeKernel(r.getLong(0), r.getAs[Array[Byte]](1)))
        }
      }
  }
}
