package graft

import graft.operators.{MediaRow, Multimodal}

/** The REAL codec tier (JDK ImageIO / javax.sound — q197/q198's
  * kernels) against known media content: lossless gray-PNG round-trip,
  * JPEG multi-format decode, deterministic integer luma fold, NN
  * resize on the decoded grid, exact WAV PCM round-trip, and the
  * drop-don't-throw contract for undecodable payloads. The oracle gate
  * proves the fixture pipeline end-to-end; these pin the codec-level
  * behaviors SQL can't reach (real JPEG bytes, containers, sign
  * edges). */
class MultimodalCodecSpec extends SparkSpec {
  import spark.implicits._

  test("gray PNG encode/decode is a lossless bit round-trip") {
    val px = Array.tabulate(64)(i => (i * 4) % 256)
    val bytes = Multimodal.encodeGrayPng(px, 8, 8)
    assert((bytes(0) & 0xFF) === 0x89 && bytes(1) === 'P'.toByte,
      "output must be a real PNG container")
    val (w, h, back) = Multimodal.decodeImage(bytes).get
    assert(w === 8 && h === 8 && back.toSeq === px.toSeq)
  }

  test("JPEG payloads decode through the same reader (multi-format, lossy-tolerant)") {
    val img = new java.awt.image.BufferedImage(
      16, 16, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    img.getRaster.setSamples(0, 0, 16, 16, 0, Array.fill(256)(128))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    val (w, h, px) = Multimodal.decodeImage(bos.toByteArray).get
    assert(w === 16 && h === 16)
    // uniform gray is DC-only: decode must land within quantization slack
    assert(px.forall(v => math.abs(v - 128) <= 2),
      s"uniform JPEG should decode near-exactly, got ${px.distinct.toSeq}")
  }

  test("RGB images fold to gray via the integer 299/587/114 luma — no AWT colorspace math") {
    val img = new java.awt.image.BufferedImage(
      2, 1, java.awt.image.BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, 0xFF0000) // pure red
    img.setRGB(1, 0, 0x00FF00) // pure green
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val (_, _, px) = Multimodal.decodeImage(bos.toByteArray).get
    assert(px.toSeq === Seq(255 * 299 / 1000, 255 * 587 / 1000)) // 76, 149
  }

  test("resizeImage samples the DECODED pixel grid with integer nearest-neighbor") {
    val px = Array.tabulate(16)(i => i * 16)
    val media = Seq(
      MediaRow(1L, "image", Multimodal.encodeGrayPng(px, 4, 4), 4, 4, "png")).toDS()
    val out = Multimodal.resizeImage(media, newW = 2, newH = 2).collect().head
    assert(out.width === 2 && out.height === 2)
    val (w, h, small) = Multimodal.decodeImage(out.content).get
    // sy = 2y, sx = 2x over the 4x4 source: indices 0, 2, 8, 10
    assert(w === 2 && h === 2 &&
      small.toSeq === Seq(px(0), px(2), px(8), px(10)))
  }

  test("WAV encode/decode round-trips 16-bit PCM exactly, including sign extremes") {
    val s = Array[Short](100, -200, 0, 300, -1, 32767, -32768, 5)
    val (sr, back) = Multimodal.decodeWav(Multimodal.encodeWav(s, 8000f)).get
    assert(sr === 8000 && back.toSeq === s.toSeq)
    val media = Seq(
      MediaRow(1L, "audio", Multimodal.encodeWav(s, 8000f), 8, 1, "wav")).toDS()
    val row = Multimodal.decodeWavFeatures(media).collect().head
    assert(row.getInt(2) === 8)                       // n_samples
    assert(row.getLong(3) === s.map(_.toLong).sum)    // pcm_sum
    assert(row.getLong(4) === s.map(v => math.abs(v.toLong)).sum)
    assert(row.getInt(5) === 32768)                   // peak_abs
    // strict sign flips: 100/-200, 300/-1, -1/32767, 32767/-32768, -32768/5
    assert(row.getLong(6) === 5L)
  }

  test("16-bit gray PNG decodes to the high byte — never low-byte truncation") {
    // a deep gray image must fold to 8 bits deterministically: value
    // 1000 (0x03E8) must read 3 (high shift), not 232 (low byte), and
    // px_min must be a value the image actually contains
    val img = new java.awt.image.BufferedImage(
      2, 1, java.awt.image.BufferedImage.TYPE_USHORT_GRAY)
    img.getRaster.setSamples(0, 0, 2, 1, 0, Array(1000, 65535))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val (_, _, px) = Multimodal.decodeImage(bos.toByteArray).get
    assert(px.toSeq === Seq(1000 >> 8, 65535 >> 8)) // 3, 255
    val media = Seq(
      MediaRow(1L, "image", bos.toByteArray, 2, 1, "png")).toDS()
    val row = Multimodal.decodeImageFeatures(media).collect().head
    assert(row.getInt(5) === 3 && row.getInt(6) === 255,
      "px_min/px_max must be values present in the folded image")
  }

  test("integrityCard dispatches on kind: a WAV census counts audio as decodable") {
    val s = Array[Short](1, -2, 3)
    val rows = Seq(
      MediaRow(1L, "audio", Multimodal.encodeWav(s, 8000f), 3, 1, "wav"),
      MediaRow(2L, "audio", "truncated".getBytes("UTF-8"), 3, 1, "wav"),
      MediaRow(3L, "image",
        Multimodal.encodeGrayPng(Array(1, 2, 3, 4), 2, 2), 2, 2, "png")).toDS()
    val card = Multimodal.integrityCard(rows).collect().head
    assert(card.getLong(0) === 3L && card.getLong(1) === 2L &&
      card.getLong(2) === 1L,
      s"audio must parse as WAV, not be misclassified as a corrupt image: $card")
  }

  test("integrityCard on an EMPTY ingest degrades to (0,0,0), not NULLs") {
    // sum over zero rows is NULL — a downstream n_corrupt==0 gate on an
    // empty batch must still see integer zeros
    val card = Multimodal.integrityCard(
      spark.emptyDataset[MediaRow]).collect().head
    assert(!card.isNullAt(0) && !card.isNullAt(1) && !card.isNullAt(2))
    assert(card.getLong(0) === 0L && card.getLong(1) === 0L &&
      card.getLong(2) === 0L)
  }

  test("sub-8-bit gray (1-bit PNG) stretches to the full 8-bit range") {
    // a white pixel in a 1-bit image must read 255, not 1 — downstream
    // gray stats assume full-range samples
    val img = new java.awt.image.BufferedImage(
      2, 1, java.awt.image.BufferedImage.TYPE_BYTE_BINARY)
    img.getRaster.setSamples(0, 0, 2, 1, 0, Array(0, 1))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val (_, _, px) = Multimodal.decodeImage(bos.toByteArray).get
    assert(px.toSeq === Seq(0, 255),
      s"1-bit white must stretch to 255, got ${px.toSeq}")
  }

  test("16-bit non-PCM_SIGNED WAV payloads are dropped, not sign-misread") {
    // hand-craft a RIFF/WAVE header claiming fmt tag 3 (IEEE float) at
    // 16 bits — whether the JDK parser rejects the container or parses
    // it as a non-signed encoding, decodeWav must return None rather
    // than reinterpret the payload as signed samples
    val bos = new java.io.ByteArrayOutputStream()
    val d = new java.io.DataOutputStream(bos)
    def le16(v: Int): Unit = { d.write(v & 0xFF); d.write((v >> 8) & 0xFF) }
    def le32(v: Int): Unit = {
      d.write(v & 0xFF); d.write((v >> 8) & 0xFF)
      d.write((v >> 16) & 0xFF); d.write((v >> 24) & 0xFF)
    }
    d.writeBytes("RIFF"); le32(36 + 4); d.writeBytes("WAVE")
    d.writeBytes("fmt "); le32(16)
    le16(3) /* IEEE float */ ; le16(1); le32(8000); le32(16000)
    le16(2); le16(16)
    d.writeBytes("data"); le32(4); le32(0x12345678)
    assert(Multimodal.decodeWav(bos.toByteArray).isEmpty)
  }

  test("undecodable payloads drop out of both feature passes, never throw") {
    val junk = Seq(
      MediaRow(9L, "image", "definitely not media bytes".getBytes("UTF-8"),
        0, 0, "png")).toDS()
    assert(Multimodal.decodeImageFeatures(junk).count() === 0L)
    assert(Multimodal.decodeWavFeatures(junk).count() === 0L)
  }

  test("streaming twin: real decode runs per micro-batch with batch parity") {
    // the codec pass is stateless per-row, so the SAME operator runs
    // on a stream unchanged — pin that and the batch-parity contract
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val rows = (1L to 5L).map { id =>
      val px = Array.tabulate(16)(i => ((id * 37 + i * 11) % 128).toInt)
      MediaRow(id, "image", Multimodal.encodeGrayPng(px, 4, 4), 4, 4, "png")
    }
    val in = MemoryStream[MediaRow]
    val q = Multimodal.decodeImageFeatures(in.toDS())
      .writeStream.format("memory").queryName("codec_stream_t")
      .outputMode("append").start()
    in.addData(rows.take(3))
    q.processAllAvailable()
    in.addData(rows.drop(3))
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("codec_stream_t").collect()
      .map(r => (r.getLong(0), r.getLong(4))).toSet
    val batch = Multimodal.decodeImageFeatures(rows.toDS()).collect()
      .map(r => (r.getLong(0), r.getLong(4))).toSet
    assert(streamed === batch && streamed.size === 5)
  }

  test("synthesized fixtures are REAL containers (PNG magic, RIFF/WAVE header)") {
    val docs = Seq((1L, "The quick brown fox jumps over the lazy dog, " +
      "then does it again for good measure today."))
      .toDF("doc_id", "text")
    val png = Multimodal.synthesizeGrayPng(docs, "doc_id", "text", 8, 8)
      .collect().head
    assert((png.content(0) & 0xFF) === 0x89 &&
      new String(png.content.slice(1, 4), "US-ASCII") === "PNG")
    val wav = Multimodal.synthesizeWav(docs, "doc_id", "text", 32)
      .collect().head
    assert(new String(wav.content.take(4), "US-ASCII") === "RIFF" &&
      new String(wav.content.slice(8, 12), "US-ASCII") === "WAVE")
    // and the pixels are the codepoints: decode back and compare
    val (_, _, px) = Multimodal.decodeImage(png.content).get
    val text = docs.collect().head.getString(1)
    assert(px.toSeq === (0 until 64).map(text.charAt(_).toInt))
  }
}
