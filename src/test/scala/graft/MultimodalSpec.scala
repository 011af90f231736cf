package graft

import graft.operators.Multimodal

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (1L, "hello world of bytes"),
    (2L, ""),
    (3L, "another payload with different content entirely")
  ).toDF("doc_id", "text")

  test("asMedia carries bytes + typed metadata; extractFeatures is deterministic") {
    val media = Multimodal.asMedia(docs, "doc_id", "text")
    val feats = Multimodal.extractFeatures(media).collect().sortBy(_.id)
    assert(feats.map(_.id).toSeq === Seq(1L, 2L, 3L))
    assert(feats.forall(_.features.length === 16))
    assert(feats.head.n_bytes === "hello world of bytes".getBytes.length)
    // empty payload → zero histogram, no NaN
    assert(feats(1).features.forall(_ === 0f))
    // histogram is normalized
    assert(math.abs(feats.head.features.sum - 1f) < 1e-5)
    // deterministic across runs
    val again = Multimodal.extractFeatures(media).collect().sortBy(_.id)
    assert(again.head.features.toSeq === feats.head.features.toSeq)
  }

  test("metadata projection never reads content (column pruned scan)") {
    val media = Multimodal.asMedia(docs, "doc_id", "text")
    val meta = Multimodal.metadata(media)
    assert(meta.columns.toSeq ===
      Seq("id", "kind", "width", "height", "format", "n_bytes"))
    assert(meta.count() === 3)
  }

  test("sampleFrames explodes byte windows per media row") {
    val media = Multimodal.asMedia(docs.where($"doc_id" === 1), "doc_id", "text")
    val frames = Multimodal.sampleFrames(media, stride = 8, frameLen = 8).collect()
    assert(frames.length === 3) // 20 bytes / stride 8 → offsets 0,8,16
    assert(frames.map(_.getInt(1)).toSeq.sorted === Seq(0, 8, 16))
  }

  test("resizeStub samples the integer nearest-neighbor grid, clipped to content length") {
    import graft.operators.MediaRow
    // 2x2 "image" abcd: 1x1 resize picks index 0; 4x4 upsample repeats
    // each source byte in a 2x2 block (y*2/4 = y/2, x*2/4 = x/2)
    val media = Seq(
      MediaRow(1L, "image", "abcd".getBytes("UTF-8"), 2, 2, "png")).toDS()
    val one = Multimodal.resizeStub(media, 1, 1).collect().head
    assert(one.content.toSeq === "a".getBytes("UTF-8").toSeq)
    assert(one.width === 1 && one.height === 1)
    val four = Multimodal.resizeStub(media, 4, 4).collect().head
    assert(new String(four.content, "UTF-8") === "aabbaabbccddccdd")
    // metadata claims a larger grid than content: indices clip to n-1
    val short = Seq(MediaRow(2L, "image", "xy".getBytes("UTF-8"), 64, 64, "png")).toDS()
    val clipped = Multimodal.resizeStub(short, 2, 2).collect().head
    assert(clipped.content.length === 4)
    assert(clipped.content.forall(b => b == 'x'.toByte || b == 'y'.toByte))
  }
}
