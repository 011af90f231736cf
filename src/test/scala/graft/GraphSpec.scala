package graft

import graft.operators.Graph

class GraphSpec extends SparkSpec {
  import spark.implicits._

  test("pageRank: star centers outrank leaves; clique is uniform; mass conserved") {
    val star = Seq((0L, 1L), (0L, 2L), (0L, 3L)).toDF("id_a", "id_b")
    val pr = Graph.pageRank(star).as[(Long, Double)].collect().toMap
    spark.catalog.clearCache()
    assert(pr.size === 4)
    assert(pr(0L) > pr(1L), s"hub must outrank leaves: $pr")
    assert(pr(1L) === pr(2L) && pr(2L) === pr(3L))
    // undirected + no dangling nodes → total mass stays 1
    assert(math.abs(pr.values.sum - 1.0) < 1e-4, pr.toString)
    // 4-clique: symmetry pins every rank at exactly 1/4
    val k4 = (for { a <- 0L to 3L; b <- 0L to 3L if a < b } yield (a, b))
      .toDF("id_a", "id_b")
    val prK = Graph.pageRank(k4).as[(Long, Double)].collect()
    spark.catalog.clearCache()
    assert(prK.length === 4 && prK.forall(_._2 === 0.25), prK.toSeq.toString)
  }

  test("triangleStats: clique transitivity 1, path 0, duplicate/reversed pairs collapse") {
    val k4 = (for { a <- 0L to 3L; b <- 0L to 3L if a < b } yield (a, b))
      .toDF("id_a", "id_b")
    val s1 = Graph.triangleStats(k4)
      .as[(Long, Long, Option[Long], Option[Long])].collect().head
    spark.catalog.clearCache()
    // C(4,3)=4 triangles; triads Σ 3·2/2 = 12; 3·4/12 = 1
    assert(s1 === ((4L, 4L, Some(12L), Some(1000000L))))
    // path a-b-c (with a reversed duplicate edge): one open triad, no
    // triangle
    val path = Seq((1L, 2L), (2L, 3L), (2L, 1L)).toDF("id_a", "id_b")
    val s2 = Graph.triangleStats(path)
      .as[(Long, Long, Option[Long], Option[Long])].collect().head
    spark.catalog.clearCache()
    assert(s2 === ((3L, 0L, Some(1L), Some(0L))))
  }

  test("kCore: triangle with a pendant chain peels to the triangle; empty graph peels to nothing") {
    // triangle 1-2-3 plus chain 3-4-5: the chain needs TWO peel rounds
    // (5 drops, then 4), the triangle survives with degree 2
    val g = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L))
      .toDF("id_a", "id_b")
    val core = Graph.kCore(g, k = 2).as[(Long, Long)].collect().toSet
    assert(core === Set((1L, 2L), (2L, 2L), (3L, 2L)))
    // a pure chain 2-core peels to empty (from both ends inward)
    val chain = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("id_a", "id_b")
    assert(Graph.kCore(chain, k = 2).count() === 0)
    // empty input: empty result on every operator, no exceptions
    val none = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    assert(Graph.kCore(none).count() === 0)
    assert(Graph.pageRank(none).count() === 0)
    val t = Graph.triangleStats(none)
      .as[(Long, Long, Option[Long], Option[Long])].collect().head
    // n_triads NULL on the empty graph — the oracle's empty-sum value
    assert(t._1 === 0L && t._2 === 0L && t._3.isEmpty && t._4.isEmpty)
  }

  test("hits: fan-in node is the authority, its feeders the hubs, side-less scores 0") {
    // 1→3, 2→3 (3 = authority; 1,2 = symmetric hubs), 3→4
    val g = Seq((1L, 3L), (2L, 3L), (3L, 4L)).toDF("id_a", "id_b")
    val m = Graph.hits(g).as[(Long, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    spark.catalog.clearCache()
    assert(m.keySet === Set(1L, 2L, 3L, 4L))
    assert(m(3L)._3 > m(4L)._3 && m(4L)._3 >= 0,
      s"fan-in node must dominate authority: $m")
    assert(m(1L)._2 === m(2L)._2 && m(1L)._2 > 0, s"symmetric hubs: $m")
    assert(m(1L)._3 === 0.0 && m(2L)._3 === 0.0, "no in-edges → authority 0")
    assert(m(4L)._2 === 0.0, "no out-edges → hub 0")
    // hub vector is L2-normalized (within round-6)
    val hnorm = m.values.map(r => r._2 * r._2).sum
    assert(math.abs(hnorm - 1.0) < 1e-4, s"hub norm: $hnorm")
    // empty graph: empty result
    assert(Graph.hits(Seq.empty[(Long, Long)].toDF("id_a", "id_b")).count() === 0)
  }

  test("manifest: columns replay the standalone operators; peeled nodes read core_deg 0") {
    import graft.operators.Dedup
    // triangle {1,2,3} + pendant 4, plus a separate pair {10,11}
    val g = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (10L, 11L))
      .toDF("id_a", "id_b").cache()
    val m = Graph.manifest(g, Dedup.connectedComponentsStar(g))
      .as[(Long, Long, Long, Long, Long, Double)].collect()
      .map(r => r._1 -> r).toMap
    val pr = Graph.pageRank(g).as[(Long, Double)].collect().toMap
    val core = Graph.kCore(g).as[(Long, Long)].collect().toMap
    spark.catalog.clearCache()
    assert(m.keySet === Set(1L, 2L, 3L, 4L, 10L, 11L))
    m.values.foreach { case (id, clu, cluN, deg, coreDeg, rank) =>
      assert(rank === pr(id), s"manifest pagerank must replay q175 for $id")
      assert(coreDeg === core.getOrElse(id, 0L))
    }
    assert(m(3L)._4 === 3L && m(4L)._4 === 1L) // degrees
    assert(m(4L)._5 === 0L && m(10L)._5 === 0L) // peeled / pair: no 2-core
    assert(m(1L)._2 === 1L && m(1L)._3 === 4L) // component min-label + size
    assert(m(10L)._2 === 10L && m(10L)._3 === 2L)
  }
}
