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
  * Two kernel tiers share the same `mapPartitions` batch shape:
  *
  *  - REAL codecs for the formats the JDK itself ships: PNG/JPEG/BMP/
  *    GIF through `javax.imageio.ImageIO` and WAV/PCM through
  *    `javax.sound.sampled.AudioSystem` — no external library, works
  *    headless. `decodeImageFeatures`/`resizeImage`/`decodeWavFeatures`
  *    run these end-to-end, and q197/q198 hash-gate the full
  *    encode→decode→transform→re-encode→decode round-trip against a
  *    DuckDB oracle (the codecs are lossless for gray PNG and PCM WAV,
  *    so the oracle can compute the same integers straight from the
  *    pixel/sample source).
  *  - STUB kernels (`decodeStub`, `resizeStub`) for byte-level
  *    histogram/sampling paths that treat the payload as raw bytes —
  *    still useful as the format-agnostic fallback, and the
  *    oracle-checkable face of q30/q31/q75. Video decode and learned
  *    feature extractors remain out of reach in this environment (no
  *    ffmpeg/model runtimes) — those kernels stay documented stubs.
  *
  * Production shape shared by both tiers:
  *
  *  - media rows travel as `binary` + metadata struct columns;
  *  - feature extraction runs via `mapPartitions` — the kernel is
  *    handed an ITERATOR of rows per partition, so decoder/model
  *    initialization amortizes once per partition (the same batch
  *    shape a vectorized/Arrow UDF would get);
  *  - partition sizing is the caller's control surface: media blobs are
  *    large, so repartition by byte budget, not row count, before
  *    decoding at scale.
  */
object Multimodal {

  // ───────────────────────── REAL codec tier ─────────────────────────

  /** Per-partition codec init (the "decoder handle" slot): ImageIO's
    * disk cache is useless for in-memory blobs and costs a temp-file
    * per decode — turn it off once per JVM. Idempotent and thread-safe. */
  private def initImageIo(): Unit = javax.imageio.ImageIO.setUseCache(false)

  /** REAL image decode — `javax.imageio` readers (PNG/JPEG/BMP/GIF ship
    * in every Java SE runtime). Returns (width, height, 8-bit gray
    * pixels): 1-band rasters read their samples directly, right-shifted
    * to 8 bits when the source is deeper (16-bit gray PNG → high byte —
    * deterministic, and it keeps the downstream 8-bit re-encode path
    * honest instead of silently truncating to the LOW byte); multi-band
    * images fold to integer ITU-R 601 luma ((299r+587g+114b)/1000) —
    * pure integer math, no AWT graphics or colorspace objects, so the
    * result is deterministic across JVMs. Undecodable bytes → None
    * (callers drop or count them); the catch is NonFatal, not just
    * IOException, because the JDK readers are known to throw
    * RuntimeExceptions (AIOOBE, IllegalArgument, NegativeArraySize) on
    * structurally inconsistent payloads — a corrupt blob must count as
    * corrupt, never kill the task. */
  private[graft] def decodeImage(bytes: Array[Byte]): Option[(Int, Int, Array[Int])] =
    try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))).map { img =>
      val w = img.getWidth
      val h = img.getHeight
      val px =
        if (img.getRaster.getNumBands == 1) {
          val raw = img.getRaster.getSamples(0, 0, w, h, 0, new Array[Int](w * h))
          val bits = img.getRaster.getSampleModel.getSampleSize(0)
          if (bits > 8) {
            var i = 0
            while (i < raw.length) { raw(i) = raw(i) >> (bits - 8); i += 1 }
          } else if (bits < 8) {
            // sub-8-bit gray (1/2/4-bit PNG): stretch to the 8-bit range so a
            // white pixel reads 255, not (1<<bits)-1 — downstream gray stats
            // and the re-encode path assume full-range 8-bit samples
            val maxv = (1 << bits) - 1
            var i = 0
            while (i < raw.length) { raw(i) = raw(i) * 255 / maxv; i += 1 }
          }
          raw
        } else {
          val out = new Array[Int](w * h)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val rgb = img.getRGB(x, y)
              out(y * w + x) =
                (((rgb >> 16) & 0xFF) * 299 + ((rgb >> 8) & 0xFF) * 587 +
                  (rgb & 0xFF) * 114) / 1000
              x += 1
            }
            y += 1
          }
          out
        }
      (w, h, px)
    } catch { case scala.util.control.NonFatal(_) => None }

  /** REAL 8-bit grayscale PNG encode (`ImageIO.write`, the JDK's zlib
    * PNG writer). Gray PNG is lossless: decodeImage(encodeGrayPng(px))
    * returns `px` bit-for-bit — the invariant q197 hash-gates. */
  private[graft] def encodeGrayPng(px: Array[Int], w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    img.getRaster.setSamples(0, 0, w, h, 0, px)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** REAL WAV encode — 16-bit signed little-endian mono PCM through
    * `javax.sound.sampled.AudioSystem` (the JDK's RIFF/WAVE writer). */
  private[graft] def encodeWav(samples: Array[Short], sampleRate: Float): Array[Byte] = {
    import javax.sound.sampled._
    val pcm = new Array[Byte](samples.length * 2)
    var i = 0
    while (i < samples.length) {
      pcm(2 * i) = (samples(i) & 0xFF).toByte
      pcm(2 * i + 1) = ((samples(i) >> 8) & 0xFF).toByte
      i += 1
    }
    val fmt = new AudioFormat(sampleRate, 16, 1, true, false)
    val ais = new AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, samples.length.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** REAL WAV decode — `AudioSystem.getAudioInputStream` parses the
    * RIFF/WAVE container; 16-bit PCM frames are reassembled per the
    * file's declared endianness. Returns (sampleRate, samples).
    * Non-WAV / non-16-bit payloads → None; NonFatal catch for the same
    * reason as [[decodeImage]] (a malformed chunk table must count as
    * corrupt, not kill the task). */
  private[graft] def decodeWav(bytes: Array[Byte]): Option[(Int, Array[Short])] =
    try {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val fmt = ais.getFormat
      if (fmt.getSampleSizeInBits != 16 || fmt.getChannels != 1 ||
          fmt.getEncoding != javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED) None
      else {
        val raw = ais.readAllBytes()
        val out = new Array[Short](raw.length / 2)
        val be = fmt.isBigEndian
        var i = 0
        while (i < out.length) {
          out(i) =
            if (be) (((raw(2 * i) & 0xFF) << 8) | (raw(2 * i + 1) & 0xFF)).toShort
            else (((raw(2 * i + 1) & 0xFF) << 8) | (raw(2 * i) & 0xFF)).toShort
          i += 1
        }
        Some((fmt.getSampleRate.toInt, out))
      }
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Fixture adapter for the REAL image path: render each ASCII doc's
    * first `w`·`h` character codepoints as a REAL `w`×`h` grayscale PNG
    * (codepoints ≤ 127 fit the 8-bit gray band). ASCII is enforced
    * structurally (byte length == char length) so a SQL oracle reading
    * codepoints sees exactly the bytes the engine rendered — the same
    * contract q75 pins. */
  def synthesizeGrayPng(docs: DataFrame, idCol: String, textCol: String,
                        w: Int, h: Int): Dataset[MediaRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val n = w * h
    docs
      .where(octet_length(col(textCol)) === length(col(textCol)) &&
        length(col(textCol)) >= n)
      .select(col(idCol).cast("long").as("id"), col(textCol).as("text"))
      .as[(Long, String)]
      .mapPartitions { rows =>
        initImageIo()
        rows.map { case (id, text) =>
          val px = new Array[Int](n)
          var i = 0
          while (i < n) { px(i) = text.charAt(i).toInt; i += 1 }
          MediaRow(id, "image", encodeGrayPng(px, w, h), w, h, "png")
        }
      }
  }

  /** Fixture adapter for the REAL audio path: first `nSamples` ASCII
    * codepoints become 16-bit PCM samples ((c − 64) · 256, spanning
    * both signs) in a REAL WAV container at 8 kHz mono. */
  def synthesizeWav(docs: DataFrame, idCol: String, textCol: String,
                    nSamples: Int): Dataset[MediaRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .where(octet_length(col(textCol)) === length(col(textCol)) &&
        length(col(textCol)) >= nSamples)
      .select(col(idCol).cast("long").as("id"), col(textCol).as("text"))
      .as[(Long, String)]
      .mapPartitions { rows =>
        rows.map { case (id, text) =>
          val s = new Array[Short](nSamples)
          var i = 0
          while (i < nSamples) {
            s(i) = ((text.charAt(i).toInt - 64) * 256).toShort
            i += 1
          }
          MediaRow(id, "audio", encodeWav(s, 8000f), nSamples, 1, "wav")
        }
      }
  }

  /** REAL image feature pass: ImageIO decode per row (PNG/JPEG/BMP/
    * GIF), integer gray stats out — (id, width, height, n_px, px_sum,
    * px_min, px_max), all exact integers so the pipeline is
    * hash-gateable. Undecodable payloads are DROPPED (count the
    * difference against `metadata` if loss matters). */
  def decodeImageFeatures(media: Dataset[MediaRow]): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      initImageIo()
      rows.flatMap { r =>
        decodeImage(r.content).map { case (w, h, px) =>
          var sum = 0L
          // seed from the first pixel, not a range assumption — a
          // min/max the image doesn't contain must never be reported
          var mn = if (px.isEmpty) 0 else px(0)
          var mx = mn
          var i = 0
          while (i < px.length) {
            sum += px(i)
            if (px(i) < mn) mn = px(i)
            if (px(i) > mx) mx = px(i)
            i += 1
          }
          (r.id, w, h, px.length, sum, mn, mx)
        }
      }
    }.toDF("id", "width", "height", "n_px", "px_sum", "px_min", "px_max")
  }

  /** REAL resize: ImageIO decode → integer nearest-neighbor sample on
    * the DECODED pixel grid (same `⌊y·h/newH⌋/⌊x·w/newW⌋` mapping as
    * `resizeStub`, but over pixels, not raw bytes) → lossless gray-PNG
    * re-encode. Deliberately NN and not an AWT interpolator: AWT
    * filtering kernels are unspecified across JVMs; integer NN is
    * bit-reproducible, which is what makes the q197 round-trip
    * hash-gateable end to end. */
  def resizeImage(media: Dataset[MediaRow], newW: Int, newH: Int): Dataset[MediaRow] = {
    require(newW >= 1 && newH >= 1)
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      initImageIo()
      rows.flatMap { r =>
        decodeImage(r.content).map { case (w, h, px) =>
          val out = new Array[Int](newW * newH)
          var y = 0
          while (y < newH) {
            val sy = y * h / newH
            var x = 0
            while (x < newW) {
              out(y * newW + x) = px(sy * w + x * w / newW)
              x += 1
            }
            y += 1
          }
          r.copy(content = encodeGrayPng(out, newW, newH),
            width = newW, height = newH)
        }
      }
    }
  }

  /** REAL audio feature pass: WAV parse per row, exact-integer PCM
    * stats — (id, sample_rate, n_samples, pcm_sum, pcm_abs_sum,
    * peak_abs, zero_crossings); a crossing is a strict sign flip
    * (s_i · s_{i+1} < 0). Non-WAV payloads are dropped. */
  def decodeWavFeatures(media: Dataset[MediaRow]): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        decodeWav(r.content).map { case (sr, s) =>
          var sum = 0L
          var absSum = 0L
          var peak = 0
          var zc = 0L
          var i = 0
          while (i < s.length) {
            val v = s(i).toInt
            sum += v
            absSum += math.abs(v)
            if (math.abs(v) > peak) peak = math.abs(v)
            if (i > 0 && s(i - 1).toInt * v < 0) zc += 1
            i += 1
          }
          (r.id, sr, s.length, sum, absSum, peak, zc)
        }
      }
    }.toDF("id", "sample_rate", "n_samples", "pcm_sum", "pcm_abs_sum",
      "peak_abs", "zero_crossings")
  }

  /** Decodable/corrupt census over a media column — the data-quality
    * gate an ingest runs BEFORE paying for feature extraction. ONE
    * pass (each blob is decode-attempted exactly once, dispatched on
    * the row's `kind`: audio rows parse as WAV, everything else as an
    * image), map-combinable counts out; a corrupt payload increments a
    * counter, never throws. Emits one row: (n_total, n_ok, n_corrupt). */
  def integrityCard(media: Dataset[MediaRow]): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      initImageIo()
      rows.map { r =>
        val ok =
          if (r.kind == "audio") decodeWav(r.content).isDefined
          else decodeImage(r.content).isDefined
        if (ok) (1L, 1L) else (1L, 0L)
      }
    }.toDF("t", "o")
      // coalesce: sum over zero rows is NULL — an empty ingest must census
      // as (0,0,0) so a downstream n_corrupt==0 gate still fires
      .agg(coalesce(sum(col("t")), lit(0L)).as("n_total"),
        coalesce(sum(col("o")), lit(0L)).as("n_ok"))
      .select(col("n_total"), col("n_ok"),
        (col("n_total") - col("n_ok")).as("n_corrupt"))
  }

  // ───────────────────────── stub tier ─────────────────────────

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
