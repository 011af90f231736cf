package graft

import graft.operators.Chunking

class ChunkingSpec extends SparkSpec {
  import spark.implicits._

  test("chunkDocuments: boundaries, overlap, short last chunk, single-chunk doc") {
    val ten = (1 to 10).map(i => s"w$i").mkString(" ")
    val two = "a b"
    val docs = Seq((1L, ten), (2L, two)).toDF("doc_id", "text")
    val got = Chunking.chunkDocuments(docs, "doc_id", "text",
        chunkTokens = 4, overlap = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getString(3))))
      .toMap
    // step 3: starts 0,3,6 -> [w1..w4], [w4..w7], [w7..w10]
    assert(got((1L, 0L)) === ((4L, "w1 w2 w3 w4")))
    assert(got((1L, 1L)) === ((4L, "w4 w5 w6 w7")))
    assert(got((1L, 2L)) === ((4L, "w7 w8 w9 w10")))
    assert(!got.contains((1L, 3L)))
    // short doc: exactly one (short) chunk
    assert(got((2L, 0L)) === ((2L, "a b")))
  }

  test("chunkDocuments: every token position is covered and consecutive chunks overlap") {
    val n = 23
    val docs = Seq((1L, (1 to n).map(i => s"t$i").mkString(" "))).toDF("doc_id", "text")
    val chunks = Chunking.chunkDocuments(docs, "doc_id", "text",
        chunkTokens = 8, overlap = 3)
      .orderBy("chunk_id")
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getString(3)))
    val step = 8 - 3
    chunks.foreach { case (id, nTok, text) =>
      assert(text.split(" ").length.toLong === nTok)
      assert(text.split(" ").head === s"t${id * step + 1}")
    }
    // coverage: union of [id*step, id*step + nTok) is exactly [0, n)
    val covered = chunks.flatMap { case (id, nTok, _) =>
      (id * step) until (id * step + nTok) }.toSet
    assert(covered === (0L until n.toLong).toSet)
    // overlap: chunk i+1 starts before chunk i ends
    chunks.sliding(2).foreach {
      case Array((i, nTok, _), (j, _, _)) => assert(j * step < i * step + nTok)
      case _ =>
    }
  }

  test("packSequences: exclusive running offsets, boundary spill, per-domain streams") {
    import org.apache.spark.sql.functions._
    // domain A: 6+6+6 tokens into 10-token sequences; domain B independent
    val docs = Seq(
      (1L, "A", "a b c d e f"), (2L, "A", "g h i j k l"), (3L, "A", "m n o p q r"),
      (10L, "B", "x y z")
    ).toDF("doc_id", "domain", "text")
    val got = Chunking.packSequences(docs, "doc_id", "domain",
        graft.functions.TextAnalysis.tokenCount(col("text")), seqTokens = 10)
      .collect().map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    assert(got(1L) === ((6L, 0L, 0L)))   // starts seq 0 at offset 0
    assert(got(2L) === ((6L, 0L, 6L)))   // starts in seq 0, spills into seq 1
    assert(got(3L) === ((6L, 1L, 2L)))   // starts at token 12 -> seq 1 offset 2
    assert(got(10L) === ((3L, 0L, 0L)))  // domain B has its own stream
    // determinism across partitionings (pure function of content+order)
    val again = Chunking.packSequences(docs.repartition(7), "doc_id", "domain",
        graft.functions.TextAnalysis.tokenCount(col("text")), seqTokens = 10)
      .collect().map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    assert(again === got)
  }

  test("packingEfficiency: planted padding bill; concat packing never loses to padded") {
    import spark.implicits._
    // tokens 3 and 5 at L=4: padded ⌈3/4⌉+⌈5/4⌉ = 3 seqs, pad = 4,
    // eff = 8/12; concat ⌈8/4⌉ = 2 seqs, eff = 1.
    val docs = Seq((1L, "a b c"), (2L, "a b c d e")).toDF("doc_id", "text")
    val r = Chunking.packingEfficiency(docs, "text", seqLens = Seq(4))
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect().head
    assert(r === ((4L, 2L, 8L, 3L, 4L, 666667L, 1000000L)))
    // default three lengths, one row each, monotone: a longer context
    // can only pad MORE under one-doc-per-sequence packing
    val eff = Chunking.packingEfficiency(docs, "text")
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect()
      .sortBy(_._1).map(r2 => r2._6)
    assert(eff.length === 3 && eff.toSeq === eff.sorted.reverse.toSeq)
  }
}
