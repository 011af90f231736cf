package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._

/** Media payload row: opaque bytes + typed metadata — the multimodal
  * column convention for a training-data pipeline. Content stays an
  * uninterpreted `binary` column end-to-end (Spark shuffles/spills it
  * like any other column); only the explicitly-invoked decode stage
  * looks inside. */
final case class MediaRow(id: Long, kind: String, content: Array[Byte],
                          width: Int, height: Int, format: String)

/** Decoded/feature output: fixed-width feature vector per media item. */
final case class MediaFeatures(id: Long, kind: String, n_bytes: Int,
                               features: Array[Float])

/** Integer twin of MediaFeatures: the raw 16-bin byte histogram the
  * stub kernel derives its normalized features from. Integer counts are
  * exactly comparable across engines (no float normalization), so this
  * is the oracle-checkable face of the multimodal decode path. */
final case class MediaHistogram(id: Long, n_bytes: Int, counts: Array[Long])

/** Multimodal (image/audio/video-as-bytes) plumbing.
  *
  * The decode kernel is a STUB (this environment has no media codecs):
  * `decodeStub` derives a deterministic 16-bin byte histogram instead of
  * running a real decoder. Everything AROUND the kernel is the real
  * production shape:
  *
  *  - media rows travel as `binary` + metadata struct columns;
  *  - feature extraction runs via `mapPartitions` — the kernel is
  *    handed an ITERATOR of rows per partition, so a real decoder can
  *    amortize model/codec initialization once per partition (the same
  *    batch shape a vectorized/Arrow UDF would get);
  *  - partition sizing is the caller's control surface: media blobs are
  *    large, so repartition by byte budget, not row count, before
  *    decoding at scale.
  */
object Multimodal {

  /** Wrap a documents-like table into media rows (fixture adapter:
    * text bytes stand in for image bytes; deterministic metadata). */
  def asMedia(docs: DataFrame, idCol: String, payloadCol: String): Dataset[MediaRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(
      col(idCol).cast("long").as("id"),
      lit("image").as("kind"),
      col(payloadCol).cast("binary").as("content"),
      (pmod(col(idCol), lit(4)) * 64 + 64).cast("int").as("width"),
      (pmod(col(idCol), lit(3)) * 64 + 64).cast("int").as("height"),
      lit("png").as("format")).as[MediaRow]
  }

  /** STUB decode kernel: 16-bin byte histogram normalized to [0,1].
    * A real implementation would decode `content` with a codec and
    * run a feature extractor; the signature and batch shape would not
    * change. Deterministic: same bytes → same features. */
  private[operators] def decodeStub(bytes: Array[Byte]): Array[Float] = {
    val hist = new Array[Float](16)
    var i = 0
    while (i < bytes.length) {
      hist((bytes(i) & 0xFF) >> 4) += 1f
      i += 1
    }
    if (bytes.length > 0) {
      var j = 0
      while (j < 16) { hist(j) /= bytes.length; j += 1 }
    }
    hist
  }

  /** Feature extraction over media rows. `mapPartitions` so per-partition
    * init (codec/model load in a real pipeline) happens once, and rows
    * stream through without materializing the partition. */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      // per-partition init would go here (decoder handle, model weights)
      rows.map { r =>
        MediaFeatures(r.id, r.kind, r.content.length, decodeStub(r.content))
      }
    }
  }

  /** Un-normalized histogram variant of the decode kernel: same
    * `mapPartitions` batch shape as `extractFeatures`, but emits the raw
    * high-nibble byte-histogram COUNTS (features = counts / n_bytes).
    * Integer output → bit-exact across engines, which makes this the
    * driver-checkable query form of the multimodal pipeline. */
  def byteHistogram(media: Dataset[MediaRow]): Dataset[MediaHistogram] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      // per-partition init would go here (decoder handle, model weights)
      rows.map { r =>
        val hist = new Array[Long](16)
        var i = 0
        while (i < r.content.length) {
          hist((r.content(i) & 0xFF) >> 4) += 1L
          i += 1
        }
        MediaHistogram(r.id, r.content.length, hist)
      }
    }
  }

  /** Resize stub: nearest-neighbor sample over the (width × height)
    * byte grid down to `newW × newH` — the thumbnail/normalize-
    * resolution step. A real implementation decodes and interpolates
    * pixels; the stub samples source index
    * `min(⌊y·h/newH⌋·w + ⌊x·w/newW⌋, n−1)` — ALL integer arithmetic,
    * so a SQL oracle reproduces the sampled bytes exactly. Same
    * `mapPartitions` batch shape as the other kernels (per-partition
    * codec init in a real pipeline). */
  def resizeStub(media: Dataset[MediaRow], newW: Int, newH: Int): Dataset[MediaRow] = {
    require(newW >= 1 && newH >= 1)
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      // per-partition init would go here (decoder handle)
      rows.map { r =>
        val n = r.content.length
        val out = new Array[Byte](newW * newH)
        if (n > 0) {
          var y = 0
          while (y < newH) {
            val sy = y * r.height / newH
            var x = 0
            while (x < newW) {
              val sx = x * r.width / newW
              out(y * newW + x) = r.content(math.min(sy * r.width + sx, n - 1))
              x += 1
            }
            y += 1
          }
        }
        r.copy(content = out, width = newW, height = newH)
      }
    }
  }

  /** Frame-sample stub: pick every `stride`-th byte window as a "frame"
    * (the video analog: sample frames, decode each). Returns one row per
    * sampled frame — the explode shape a real frame sampler produces. */
  def sampleFrames(media: Dataset[MediaRow], stride: Int, frameLen: Int): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.flatMap { r =>
      val n = r.content.length
      (0 until n by stride).take(32).map { off =>
        val end = math.min(off + frameLen, n)
        (r.id, off, java.util.Arrays.copyOfRange(r.content, off, end))
      }
    }.toDF("id", "frame_offset", "frame_bytes")
  }

  /** Metadata-only projection — never touches content bytes, so column
    * pruning keeps the blob out of the scan entirely. */
  def metadata(media: Dataset[MediaRow]): DataFrame =
    media.toDF().select(col("id"), col("kind"), col("width"), col("height"),
      col("format"), octet_length(col("content")).as("n_bytes"))
}
