package graft

/** The DuckDB oracle surface (VERDICT r11 item 7: split out of
  * `SparkEntry` for maintainability — no behavior change): one
  * ANSI-SQL oracle per `SparkEntry.queries` entry, runnable by DuckDB
  * over the same parquet tables registered under their bare names,
  * plus the private SQL-builder helpers the composite oracles share.
  * Column names/aliases match the Spark side exactly — the driver
  * sorts columns by name before hashing. All the CLAUDE.md oracle
  * rules (DECIMAL money paths, BIGINT casts on summed integers,
  * MATERIALIZED multi-ref CTEs, round-6 doubles) live here. */
object OracleSql {

  /** DuckDB CTE block reproducing `LshSignatures` bit-for-bit: ±1 plane
    * signs from md5("plane|seed|t|b|d"), dot over floor(v·2^20) integer
    * quantizations (order-independent), bit b set when the dot ≥ 0.
    * Yields `sig(vec_id, t, sig)`. */
  private def srpSigCtes(tables: Int, bits: Int, dim: Int, seed: Long): String =
    s"""signs AS (
         SELECT t.t, b.b, d.d,
           CASE WHEN (strpos('0123456789abcdef', substring(md5('plane|$seed|' || CAST(t.t AS VARCHAR) || '|' || CAST(b.b AS VARCHAR) || '|' || CAST(d.d AS VARCHAR)), 32, 1)) - 1) % 2 = 1 THEN 1 ELSE -1 END AS s
         FROM range($tables) t(t), range($bits) b(b), range($dim) d(d)
       ), qv AS (
         SELECT vec_id, d.d,
           CAST(floor(CAST(embedding[CAST(d.d + 1 AS INT)] AS DOUBLE) * 1048576.0) AS BIGINT) AS qd
         FROM embeddings, range($dim) d(d)
       ), sigbits AS (
         SELECT qv.vec_id, signs.t, signs.b,
           CASE WHEN sum(signs.s * qv.qd) >= 0 THEN (CAST(1 AS BIGINT) << CAST(signs.b AS INT)) ELSE 0 END AS bit
         FROM qv JOIN signs ON qv.d = signs.d
         GROUP BY qv.vec_id, signs.t, signs.b
       ), sig AS (
         SELECT vec_id, t, CAST(sum(bit) AS BIGINT) AS sig FROM sigbits GROUP BY vec_id, t
       )"""

  /** DuckDB query reproducing `Dedup.minHashLshPairs` (q19) exactly —
    * factored out so the q47 clustering oracle can build its edge list
    * from the same pairs. sig_i = min over shingles of (h1 + i·h2),
    * h1/h2 = the two 48-bit halves of md5(shingle) — exact integers in
    * both engines. Banding: any pair agreeing on ≥ 52/64 positions
    * shares ≥1 fully-equal band (pigeonhole), so bucket identity ==
    * slice equality. */
  /** Exact n-gram Jaccard pair oracle (q18) — shared with q123's
    * recall eval so the truth leg can never drift from the standalone
    * query. */
  private def ngramJaccardPairsSql: String =
    """WITH t AS (
           SELECT doc_id,
             string_split(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')), ' ') AS toks
           FROM documents
         ), sh AS (
           SELECT DISTINCT doc_id,
             unnest(list_transform(range(1, len(toks) - 1),
               i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS shingle
           FROM t WHERE len(toks) >= 3
         ), sizes AS (
           SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY 1
         ), capped AS (
           SELECT sh.doc_id, sh.shingle FROM sh
           JOIN (SELECT shingle FROM sh GROUP BY shingle HAVING count(*) <= 1000) keep
             USING (shingle)
         ), inter AS (
           SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_common
           FROM capped a JOIN capped b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
           GROUP BY 1, 2
         )
         SELECT id_a, id_b,
           CAST(n_common AS DOUBLE) / (sa.n_sh + sb.n_sh - n_common) AS jaccard
         FROM inter
         JOIN sizes sa ON id_a = sa.doc_id
         JOIN sizes sb ON id_b = sb.doc_id
         WHERE CAST(n_common AS DOUBLE) / (sa.n_sh + sb.n_sh - n_common) >= 0.8"""

  /** DuckDB replay of the IVF family (q39/q184/q185): centroids from
    * `centWhere`'s rows (the fixed quantizer — q184 trains on the
    * pre-append half), assignment over `assignWhere`'s rows (q185
    * tombstones delete neighbors, never probes). Both "TRUE" = q39. */
  private def ivfKnnSql(centWhere: String, assignWhere: String,
                        src: String = "embeddings",
                        extraCtes: String = ""): String =
    s"""WITH ${if (extraCtes.nonEmpty) extraCtes + ", " else ""}cent AS (
           SELECT row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS cpos,
                  CAST(embedding AS DOUBLE[]) AS ce
           FROM $src WHERE $centWhere
           ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 16
         ), assign AS (
           SELECT e.vec_id AS neighbor_id, cpos
           FROM $src e CROSS JOIN cent
           WHERE $assignWhere
           QUALIFY row_number() OVER (PARTITION BY e.vec_id
             ORDER BY list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), ce) DESC, cpos ASC) = 1
         ), probes AS (
           SELECT q.vec_id AS query_id, cpos
           FROM $src q CROSS JOIN cent
           WHERE q.vec_id < 10
           QUALIFY row_number() OVER (PARTITION BY q.vec_id
             ORDER BY list_cosine_similarity(CAST(q.embedding AS DOUBLE[]), ce) DESC, cpos ASC) <= 6
         ), cand AS (
           SELECT query_id, neighbor_id
           FROM probes JOIN assign USING (cpos)
           WHERE query_id <> neighbor_id
         ), scored AS (
           SELECT query_id, neighbor_id,
             list_cosine_similarity(CAST(q.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[])) AS sim,
             row_number() OVER (PARTITION BY query_id
               ORDER BY list_cosine_similarity(CAST(q.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[])) DESC,
                        neighbor_id ASC) AS rank
           FROM cand
           JOIN $src q ON query_id = q.vec_id
           JOIN $src c ON neighbor_id = c.vec_id
         )
         SELECT query_id, rank, neighbor_id, round(sim, 6) AS cos_sim
         FROM scored WHERE rank <= 5"""

  private def minhashPairsSql: String = minhashPairsSqlWhere("TRUE")

  /** q19's shingle→MinHash→band CTE chain (t/sh/hh/mh/band) over a
    * FILTERED document set — the one copy shared by the pair oracles
    * and the q187 bucket-occupancy card. The oracle's bucket is the
    * band's mh-value string (not the engine's hash of it): identical
    * for joining/grouping purposes absent hash collisions — the same
    * assumption the q19 equivalence already rests on. */
  private def minhashBandCtes(docWhere: String,
                              docsFrom: String = "documents",
                              rowsPerBand: Int = 4): String = {
    def parse12(start: Int) =
      s"CAST(list_sum(list_transform(range(12), j -> CAST(strpos('0123456789abcdef', substring(hx, CAST(j + $start AS INT), 1)) - 1 AS BIGINT) << (4*(11 - CAST(j AS INT))))) AS BIGINT)"
    s"""t AS (
           SELECT doc_id,
             string_split(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')), ' ') AS toks
           FROM $docsFrom WHERE $docWhere
         ), sh AS (
           SELECT DISTINCT doc_id,
             unnest(list_transform(range(1, len(toks) - 1),
               i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS shingle
           FROM t WHERE len(toks) >= 3
         ), hh AS (
           SELECT doc_id, ${parse12(1)} AS h1, ${parse12(13)} AS h2
           FROM (SELECT doc_id, md5(shingle) AS hx FROM sh)
         ), mh AS (
           SELECT doc_id, i.i AS i, min(h1 + i.i * h2) AS mh
           FROM hh CROSS JOIN range(64) i(i) GROUP BY doc_id, i.i
         ), band AS (
           SELECT doc_id, i // $rowsPerBand AS band,
             string_agg(CAST(mh AS VARCHAR), ',' ORDER BY i) AS bucket
           FROM mh GROUP BY doc_id, band
         )"""
  }

  /** q19's pair query over a FILTERED document set at a parameterized
    * agreement threshold — the oracle for the tombstone read path
    * (q183, filtered docs) and the threshold sweep (q186, minJ >
    * 1 − bands/numHashes = 0.75 keeps the banded candidates EXACT by
    * the pigeonhole argument). */
  private def minhashPairsSqlWhere(docWhere: String,
                                   minJ: Double = 0.8,
                                   docsFrom: String = "documents",
                                   extraCtes: String = "",
                                   rowsPerBand: Int = 4): String =
    s"""WITH ${if (extraCtes.nonEmpty) extraCtes + ", " else ""}${minhashBandCtes(docWhere, docsFrom, rowsPerBand)}, cand AS (
           SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
           FROM band a JOIN band b
             ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
         )
         SELECT id_a, id_b,
           CAST(count(*) FILTER (WHERE ma.mh = mb.mh) AS DOUBLE) / 64 AS est_jaccard
         FROM cand
         JOIN mh ma ON ma.doc_id = id_a
         JOIN mh mb ON mb.doc_id = id_b AND ma.i = mb.i
         GROUP BY id_a, id_b
         HAVING CAST(count(*) FILTER (WHERE ma.mh = mb.mh) AS DOUBLE) / 64 >= CAST($minJ AS DOUBLE)"""

  /** DuckDB replay of `Dedup.bbitMinhashPairs` (q163): the q19
    * MinHash/band CTEs, with the 1-bit estimate counted per POSITION
    * (`(ma.mh & 1) = (mb.mh & 1)`) — position-wise low-bit agreement
    * is by construction the popcount identity the engine computes on
    * its packed longs. Both estimates are exact dyadic (k/64). */
  private def bbitMinhashSql: String = {
    def parse12(start: Int) =
      s"CAST(list_sum(list_transform(range(12), j -> CAST(strpos('0123456789abcdef', substring(hx, CAST(j + $start AS INT), 1)) - 1 AS BIGINT) << (4*(11 - CAST(j AS INT))))) AS BIGINT)"
    s"""WITH t AS (
           SELECT doc_id,
             string_split(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')), ' ') AS toks
           FROM documents
         ), sh AS (
           SELECT DISTINCT doc_id,
             unnest(list_transform(range(1, len(toks) - 1),
               i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS shingle
           FROM t WHERE len(toks) >= 3
         ), hh AS (
           SELECT doc_id, ${parse12(1)} AS h1, ${parse12(13)} AS h2
           FROM (SELECT doc_id, md5(shingle) AS hx FROM sh)
         ), mh AS (
           SELECT doc_id, i.i AS i, min(h1 + i.i * h2) AS mh
           FROM hh CROSS JOIN range(64) i(i) GROUP BY doc_id, i.i
         ), band AS (
           SELECT doc_id, i // 4 AS band,
             string_agg(CAST(mh AS VARCHAR), ',' ORDER BY i) AS bucket
           FROM mh GROUP BY doc_id, band
         ), cand AS (
           SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
           FROM band a JOIN band b
             ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
         )
         SELECT id_a, id_b,
           CAST(count(*) FILTER (WHERE ma.mh = mb.mh) AS DOUBLE) / 64 AS est_full,
           greatest(0.0,
             2 * CAST(count(*) FILTER (WHERE (ma.mh & 1) = (mb.mh & 1)) AS DOUBLE) / 64 - 1) AS est_1bit
         FROM cand
         JOIN mh ma ON ma.doc_id = id_a
         JOIN mh mb ON mb.doc_id = id_b AND ma.i = mb.i
         GROUP BY id_a, id_b
         HAVING CAST(count(*) FILTER (WHERE ma.mh = mb.mh) AS DOUBLE) / 64 >= 0.8"""
  }

  /** DuckDB replay of `Similarity.topPrincipalComponent` (q166): the
    * covariance from the q63-style dim explosion (self-join on vec_id
    * → 64×64 cells), then the 8 power-iteration steps unrolled as
    * MATERIALIZED (matvec, normalize) CTE pairs mirroring the driver
    * loop op-for-op; Rayleigh eigenvalue; sign fixed on the
    * largest-|loading| dim (smallest index on ties). Sum order across
    * engines differs ~1e-15; round-6 absorbs it. */
  private def topPrincipalSql: String = {
    val iters = (1 to 8).map { t =>
      val p = s"v${t - 1}"
      s"""p$t AS MATERIALIZED (
           SELECT cov.i AS i, sum(cov.c * $p.v) AS u
           FROM cov JOIN $p ON cov.j = $p.i GROUP BY cov.i
         ), v$t AS MATERIALIZED (
           SELECT i, u / (SELECT sqrt(sum(u * u)) FROM p$t) AS v FROM p$t
         )"""
    }.mkString(", ")
    s"""WITH e AS MATERIALIZED (
           SELECT vec_id, embedding FROM embeddings WHERE len(embedding) = 64
         ), x AS MATERIALIZED (
           SELECT vec_id, i.i AS i,
             CAST(embedding[CAST(i.i + 1 AS INT)] AS DOUBLE) AS v
           FROM e, range(64) i(i)
         ), nn AS MATERIALIZED (
           SELECT CAST(count(*) AS DOUBLE) AS n FROM e
         ), mu AS MATERIALIZED (
           SELECT i, sum(v) / (SELECT n FROM nn) AS mu FROM x GROUP BY i
         ), cov AS MATERIALIZED (
           SELECT a.i AS i, b.i AS j,
             sum(a.v * b.v) / (SELECT n FROM nn) - ma.mu * mb.mu AS c
           FROM x a JOIN x b ON a.vec_id = b.vec_id
           JOIN mu ma ON ma.i = a.i JOIN mu mb ON mb.i = b.i
           GROUP BY a.i, b.i, ma.mu, mb.mu
         ), v0 AS MATERIALIZED (
           SELECT i, CAST(1.0 AS DOUBLE) AS v FROM mu
         ), $iters, pf AS MATERIALIZED (
           SELECT cov.i AS i, sum(cov.c * v8.v) AS u
           FROM cov JOIN v8 ON cov.j = v8.i GROUP BY cov.i
         ), lam AS MATERIALIZED (
           SELECT sum(v8.v * pf.u) AS l FROM v8 JOIN pf ON v8.i = pf.i
         ), sgn AS MATERIALIZED (
           SELECT CASE WHEN v < 0 THEN CAST(-1.0 AS DOUBLE)
                       ELSE CAST(1.0 AS DOUBLE) END AS s
           FROM v8 ORDER BY abs(v) DESC, i ASC LIMIT 1
         )
         SELECT i AS dim, round(v * (SELECT s FROM sgn), 6) AS loading,
           round((SELECT l FROM lam), 6) AS eigval
         FROM v8"""
  }

  /** DuckDB replay of `Similarity.principalSpectrum` (q167): q166's
    * covariance CTEs, then per component the unrolled power iteration,
    * Rayleigh eigenvalue, and a deflation CTE (C ← C − λ·v_i·v_j,
    * left-to-right like the driver loop; vvᵀ is sign-invariant so the
    * canonical flip stays output-side). var_share = λ/trace — trace
    * sum order differs ~1e-16 across engines, absorbed by round-6. */
  /** Shared CTE prefix for the q167/q168 oracles: embeddings → dim
    * rows → mean → covariance → trace → per-component power-iteration
    * and deflation CTEs (cov0..cov3, v{c}_8, lam{c}, sgn{c}). */
  private def spectrumCtePrefix: String = {
    def componentCtes(c: Int): String = {
      val iters = (1 to 8).map { t =>
        val p = s"v${c}_${t - 1}"
        s"""p${c}_$t AS MATERIALIZED (
             SELECT k.i AS i, sum(k.c * $p.v) AS u
             FROM cov$c k JOIN $p ON k.j = $p.i GROUP BY k.i
           ), v${c}_$t AS MATERIALIZED (
             SELECT i, u / (SELECT sqrt(sum(u * u)) FROM p${c}_$t) AS v FROM p${c}_$t
           )"""
      }.mkString(", ")
      val deflate = if (c < 3)
        s""", cov${c + 1} AS MATERIALIZED (
             SELECT a.i AS i, a.j AS j,
               a.c - (SELECT l FROM lam$c) * va.v * vb.v AS c
             FROM cov$c a
             JOIN v${c}_8 va ON va.i = a.i JOIN v${c}_8 vb ON vb.i = a.j
           )"""
      else ""
      s"""v${c}_0 AS MATERIALIZED (
           SELECT i, CAST(1.0 AS DOUBLE) AS v FROM mu
         ), $iters, pf$c AS MATERIALIZED (
           SELECT k.i AS i, sum(k.c * v${c}_8.v) AS u
           FROM cov$c k JOIN v${c}_8 ON k.j = v${c}_8.i GROUP BY k.i
         ), lam$c AS MATERIALIZED (
           SELECT sum(v${c}_8.v * pf$c.u) AS l
           FROM v${c}_8 JOIN pf$c ON v${c}_8.i = pf$c.i
         ), sgn$c AS MATERIALIZED (
           SELECT CASE WHEN v < 0 THEN CAST(-1.0 AS DOUBLE)
                       ELSE CAST(1.0 AS DOUBLE) END AS s
           FROM v${c}_8 ORDER BY abs(v) DESC, i ASC LIMIT 1
         )$deflate"""
    }
    s"""e AS MATERIALIZED (
           SELECT vec_id, embedding FROM embeddings WHERE len(embedding) = 64
         ), x AS MATERIALIZED (
           SELECT vec_id, i.i AS i,
             CAST(embedding[CAST(i.i + 1 AS INT)] AS DOUBLE) AS v
           FROM e, range(64) i(i)
         ), nn AS MATERIALIZED (
           SELECT CAST(count(*) AS DOUBLE) AS n FROM e
         ), mu AS MATERIALIZED (
           SELECT i, sum(v) / (SELECT n FROM nn) AS mu FROM x GROUP BY i
         ), cov0 AS MATERIALIZED (
           SELECT a.i AS i, b.i AS j,
             sum(a.v * b.v) / (SELECT n FROM nn) - ma.mu * mb.mu AS c
           FROM x a JOIN x b ON a.vec_id = b.vec_id
           JOIN mu ma ON ma.i = a.i JOIN mu mb ON mb.i = b.i
           GROUP BY a.i, b.i, ma.mu, mb.mu
         ), tr AS MATERIALIZED (
           SELECT sum(c) AS tr FROM cov0 WHERE i = j
         ), ${(0 until 4).map(componentCtes).mkString(", ")}"""
  }

  private def principalSpectrumSql: String = {
    val outs = (0 until 4).map(c =>
      s"""SELECT CAST($c AS BIGINT) AS component, i AS dim,
            round(v * (SELECT s FROM sgn$c), 6) AS loading,
            round((SELECT l FROM lam$c), 6) AS eigval,
            round((SELECT l FROM lam$c) / (SELECT tr FROM tr), 6) AS var_share
          FROM v${c}_8""").mkString(" UNION ALL ")
    s"WITH $spectrumCtePrefix $outs"
  }

  /** DuckDB replay of `Similarity.pcaResidualOutliers` (q168): the
    * spectrum CTEs, centered dim rows, per-component projections, then
    * residual = e² − p₀² − p₁² − p₂² − p₃² (left-to-right, the codegen
    * kernel's subtraction order), rounded BEFORE the ordering so both
    * engines cut the identical top-N boundary (id tiebreak). */
  private def pcaResidualSql: String = {
    val projCtes = (0 until 4).map(c =>
      s"""p${c}v AS MATERIALIZED (
           SELECT d.vec_id, sum(v${c}_8.v * d.d) AS p
           FROM d JOIN v${c}_8 ON v${c}_8.i = d.i GROUP BY d.vec_id
         )""").mkString(", ")
    s"""WITH $spectrumCtePrefix, d AS MATERIALIZED (
           SELECT x.vec_id, x.i, x.v - mu.mu AS d
           FROM x JOIN mu ON mu.i = x.i
         ), e2 AS MATERIALIZED (
           SELECT vec_id, sum(d * d) AS e FROM d GROUP BY vec_id
         ), $projCtes, res AS (
           SELECT e2.vec_id,
             round(e2.e - p0v.p * p0v.p - p1v.p * p1v.p
               - p2v.p * p2v.p - p3v.p * p3v.p, 6) AS residual
           FROM e2
           JOIN p0v ON p0v.vec_id = e2.vec_id
           JOIN p1v ON p1v.vec_id = e2.vec_id
           JOIN p2v ON p2v.vec_id = e2.vec_id
           JOIN p3v ON p3v.vec_id = e2.vec_id
         )
         SELECT vec_id,
           CAST(row_number() OVER (ORDER BY residual DESC, vec_id) AS INT) AS rank,
           residual
         FROM res ORDER BY residual DESC, vec_id LIMIT 50"""
  }

  /** DuckDB replay of `Graph.pageRank` over the q19 pair graph
    * (q175): the minhash pair CTEs, symmetric-distinct edges, then 8
    * unrolled MATERIALIZED PR steps mirroring the engine's
    * base + d·Σ pr/deg op order. */
  /** PR CTE chain (references a `pairs` CTE): ed, deg, nn, pr0..pr8 —
    * ONE copy of the edge/degree/iteration SQL shared by q175 and the
    * q178 manifest. */
  private def pageRankCtes: String = {
    val iters = (1 to 8).map { t =>
      val p = s"pr${t - 1}"
      s"""pr$t AS MATERIALIZED (
           SELECT ed.dst AS id,
             (CAST(1.0 AS DOUBLE) - CAST(0.85 AS DOUBLE)) / (SELECT n FROM nn)
               + CAST(0.85 AS DOUBLE) * sum(p.pr / deg.deg) AS pr
           FROM ed JOIN deg ON deg.src = ed.src JOIN $p p ON p.id = ed.src
           GROUP BY ed.dst
         )"""
    }.mkString(", ")
    s"""ed AS MATERIALIZED (
           SELECT id_a AS src, id_b AS dst FROM gpairs
           UNION
           SELECT id_b AS src, id_a AS dst FROM gpairs
         ), deg AS MATERIALIZED (
           SELECT src, count(*) AS deg FROM ed GROUP BY src
         ), nn AS MATERIALIZED (
           SELECT CAST(count(*) AS DOUBLE) AS n FROM deg
         ), pr0 AS MATERIALIZED (
           SELECT src AS id, CAST(1.0 AS DOUBLE) / (SELECT n FROM nn) AS pr
           FROM deg
         ), $iters"""
  }

  private def dupPageRankSql: String =
    s"""WITH gpairs AS MATERIALIZED (
           SELECT id_a, id_b FROM ($minhashPairsSql)
         ), $pageRankCtes
         SELECT id AS doc_id, round(pr, 6) AS pagerank FROM pr8"""

  /** DuckDB replay of `Graph.triangleStats` over the q19 pair graph
    * (q176): canonical a<b<c two-hop + closing-edge join; all-integer
    * census, half-up micro transitivity. */
  private def dupTrianglesSql: String =
    s"""WITH pairs AS MATERIALIZED (
           SELECT id_a, id_b FROM ($minhashPairsSql)
         ), canon AS MATERIALIZED (
           SELECT least(id_a, id_b) AS u, greatest(id_a, id_b) AS v
           FROM pairs WHERE id_a <> id_b GROUP BY 1, 2
         ), tri AS (
           SELECT CAST(count(*) AS BIGINT) AS n_triangles
           FROM canon e1
           JOIN canon e2 ON e1.v = e2.u
           JOIN canon e3 ON e3.u = e1.u AND e3.v = e2.v
         ), deg AS (
           SELECT id, count(*) AS deg
           FROM (SELECT u AS id FROM canon UNION ALL SELECT v AS id FROM canon)
           GROUP BY id
         ), s AS (
           SELECT CAST(count(*) AS BIGINT) AS n_nodes,
             CAST(sum(CAST(deg AS HUGEINT) * (deg - 1) // 2) AS BIGINT) AS n_triads
           FROM deg
         )
         SELECT n_nodes, n_triangles, n_triads,
           CAST(CASE WHEN n_triads > 0
             THEN (6 * CAST(n_triangles AS HUGEINT) * 1000000 + n_triads) // (2 * CAST(n_triads AS HUGEINT))
           END AS BIGINT) AS transitivity_micro
         FROM tri, s"""

  /** DuckDB replay of `Graph.kCore` over the q19 pair graph (q177):
    * 8 unrolled peel rounds (degree CTE → keep CTE → edge filter). */
  /** k-core CTE chain (references a `pairs` CTE): e0..e8 — shared by
    * q177 and the q178 manifest. */
  private def kcoreCtes: String = {
    val rounds = (1 to 8).map { r =>
      val p = s"e${r - 1}"
      s"""d$r AS MATERIALIZED (
           SELECT id, count(*) AS deg
           FROM (SELECT u AS id FROM $p UNION ALL SELECT v AS id FROM $p)
           GROUP BY id
         ), k$r AS MATERIALIZED (
           SELECT id FROM d$r WHERE deg >= 2
         ), e$r AS MATERIALIZED (
           SELECT u, v FROM $p
           WHERE u IN (SELECT id FROM k$r) AND v IN (SELECT id FROM k$r)
         )"""
    }.mkString(", ")
    s"""e0 AS MATERIALIZED (
           SELECT least(id_a, id_b) AS u, greatest(id_a, id_b) AS v
           FROM gpairs WHERE id_a <> id_b GROUP BY 1, 2
         ), $rounds"""
  }

  /** DuckDB replay of `Dedup.dupEvidenceSpans` (q181): the q19 pair
    * CTEs + the q101-style positional trigram hashes; diagonal islands
    * via the row_number trick; (longest, start_a, start_b) tiebreak. */
  private def dupEvidenceSql: String = {
    def parse12(start: Int) =
      s"CAST(list_sum(list_transform(range(12), j -> CAST(strpos('0123456789abcdef', substring(hx, CAST(j + $start AS INT), 1)) - 1 AS BIGINT) << (4*(11 - CAST(j AS INT))))) AS BIGINT)"
    s"""WITH pr AS MATERIALIZED (
           SELECT id_a, id_b FROM ($minhashPairsSql)
         ), t AS (
           SELECT doc_id, string_split(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')), ' ') AS toks
           FROM documents
         ), pos AS MATERIALIZED (
           SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos, ${parse12(1)} AS h
           FROM (SELECT doc_id, i, md5(array_to_string(toks[i:i+2], ' ')) AS hx
                 FROM (SELECT doc_id, toks, unnest(generate_series(1, len(toks) - 2)) AS i
                       FROM t WHERE len(toks) >= 3))
         ), m AS MATERIALIZED (
           SELECT pr.id_a, pr.id_b, a.pos AS pos_a, b.pos AS pos_b
           FROM pr
           JOIN pos a ON a.doc_id = pr.id_a
           JOIN pos b ON b.doc_id = pr.id_b AND b.h = a.h
         ), runs AS (
           SELECT id_a, id_b, min(pos_a) AS start_a, min(pos_b) AS start_b,
             CAST(count(*) + 2 AS BIGINT) AS span_tokens
           FROM (SELECT id_a, id_b, pos_a, pos_b, pos_a - pos_b AS diag,
                   pos_a - row_number() OVER (
                     PARTITION BY id_a, id_b, pos_a - pos_b ORDER BY pos_a) AS grp
                 FROM m)
           GROUP BY id_a, id_b, diag, grp
         )
         SELECT id_a, id_b, start_a, start_b, span_tokens FROM (
           SELECT runs.*, row_number() OVER (
             PARTITION BY id_a, id_b
             ORDER BY span_tokens DESC, start_a, start_b) AS rk
           FROM runs
         ) WHERE rk = 1"""
  }

  /** DuckDB replay of `Dedup.dupMassCurve` (q182): componentsSql's
    * labeling + per-cluster redundant-token sums (kept member =
    * min_by id, the q64 contract), top-K, K-row cumulative window;
    * HUGEINT mirrors for the windowed sum and the share. */
  private def dupMassCurveSql: String =
    s"""WITH gcomp AS MATERIALIZED (
           SELECT doc_id, cluster_id FROM ($componentsSql)
         ), tk AS (
           SELECT doc_id,
             CAST(len(string_split(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')), ' ')) AS BIGINT) AS t
           FROM documents
         ), pc AS MATERIALIZED (
           SELECT cluster_id, CAST(count(*) AS BIGINT) AS cluster_docs,
             CAST(sum(t) - min_by(t, doc_id) AS BIGINT) AS dup_tokens
           FROM gcomp JOIN tk USING (doc_id) GROUP BY cluster_id
           HAVING sum(t) - min_by(t, doc_id) > 0
         ), tot AS (
           SELECT CAST(sum(dup_tokens) AS HUGEINT) AS tot FROM pc
         ), top AS (
           SELECT * FROM pc ORDER BY dup_tokens DESC, cluster_id LIMIT 20
         )
         SELECT CAST(row_number() OVER (ORDER BY dup_tokens DESC, cluster_id) AS INT) AS rank,
           cluster_id, cluster_docs, dup_tokens,
           CAST(sum(dup_tokens) OVER (ORDER BY dup_tokens DESC, cluster_id
             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_dup_tokens,
           CAST((2 * CAST(sum(dup_tokens) OVER (ORDER BY dup_tokens DESC, cluster_id
             ROWS UNBOUNDED PRECEDING) AS HUGEINT) * 1000000 + tot) // (2 * tot) AS BIGINT) AS cum_share_ppm
         FROM top, tot"""

  /** q170's head/tail/fanout-cap CTE chain (through bh/bt) — shared
    * by the edge list itself and the q180 HITS oracle. */
  private def continuationCtes: String =
    """t AS (
           SELECT doc_id, string_split(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')), ' ') AS toks
           FROM documents
         ), g AS (
           SELECT doc_id, array_to_string(toks[1:3], ' ') AS head,
             array_to_string(toks[-3:], ' ') AS tail
           FROM t WHERE len(toks) >= 3
         ), bh AS (
           SELECT doc_id, head FROM g
           WHERE head NOT IN (SELECT head FROM g GROUP BY head HAVING count(*) > 16)
         ), bt AS (
           SELECT doc_id, tail FROM g
           WHERE tail NOT IN (SELECT tail FROM g GROUP BY tail HAVING count(*) > 16)
         )"""

  /** DuckDB replay of `Graph.hits` over the continuation edges
    * (q180): 4 unrolled MATERIALIZED (authority, hub) phase pairs,
    * each L2-normalized by a scalar subquery, mirroring the engine's
    * op order; side-less nodes coalesce to 0. */
  private def continuationHitsSql: String = {
    val rounds = (1 to 4).map { t =>
      val hPrev = s"h${t - 1}"
      s"""ar$t AS MATERIALIZED (
           SELECT ced.dst AS id, sum($hPrev.s) AS s
           FROM ced JOIN $hPrev ON $hPrev.id = ced.src GROUP BY ced.dst
         ), a$t AS MATERIALIZED (
           SELECT id, s / (SELECT sqrt(sum(s * s)) FROM ar$t) AS s FROM ar$t
         ), hr$t AS MATERIALIZED (
           SELECT ced.src AS id, sum(a$t.s) AS s
           FROM ced JOIN a$t ON a$t.id = ced.dst GROUP BY ced.src
         ), h$t AS MATERIALIZED (
           SELECT id, s / (SELECT sqrt(sum(s * s)) FROM hr$t) AS s FROM hr$t
         )"""
    }.mkString(", ")
    s"""WITH $continuationCtes, ced AS MATERIALIZED (
           SELECT DISTINCT bt.doc_id AS src, bh.doc_id AS dst
           FROM bt JOIN bh ON bh.head = bt.tail AND bt.doc_id <> bh.doc_id
         ), nodes AS MATERIALIZED (
           SELECT src AS id FROM ced UNION SELECT dst AS id FROM ced
         ), h0 AS MATERIALIZED (
           SELECT id, CAST(1.0 AS DOUBLE) AS s FROM nodes
         ), $rounds
         SELECT nodes.id AS doc_id,
           round(COALESCE(h4.s, CAST(0.0 AS DOUBLE)), 6) AS hub,
           round(COALESCE(a4.s, CAST(0.0 AS DOUBLE)), 6) AS authority
         FROM nodes
         LEFT JOIN h4 ON h4.id = nodes.id
         LEFT JOIN a4 ON a4.id = nodes.id"""
  }

  private def dupKcoreSql: String =
    s"""WITH gpairs AS MATERIALIZED (
           SELECT id_a, id_b FROM ($minhashPairsSql)
         ), $kcoreCtes
         SELECT id AS doc_id, CAST(count(*) AS BIGINT) AS core_deg
         FROM (SELECT u AS id FROM e8 UNION ALL SELECT v AS id FROM e8)
         GROUP BY id"""

  /** DuckDB replay of `Graph.manifest` (q178): ONE `pairs` CTE feeds
    * the shared PR and k-core chains plus the degree frame; the
    * component labeling is componentsSql VERBATIM (the q102 rule: one
    * copy of each sub-oracle's formulas). */
  private def graphManifestSql: String =
    s"""WITH gpairs AS MATERIALIZED (
           SELECT id_a, id_b FROM ($minhashPairsSql)
         ), $pageRankCtes, $kcoreCtes, core AS MATERIALIZED (
           SELECT id, CAST(count(*) AS BIGINT) AS core_deg
           FROM (SELECT u AS id FROM e8 UNION ALL SELECT v AS id FROM e8)
           GROUP BY id
         ), gcomp AS MATERIALIZED (
           SELECT doc_id, cluster_id, cluster_size FROM ($componentsSql)
         )
         SELECT deg.src AS doc_id, gcomp.cluster_id, gcomp.cluster_size,
           CAST(deg.deg AS BIGINT) AS degree,
           COALESCE(core.core_deg, 0) AS core_deg,
           round(pr8.pr, 6) AS pagerank
         FROM deg
         JOIN gcomp ON gcomp.doc_id = deg.src
         JOIN pr8 ON pr8.id = deg.src
         LEFT JOIN core ON core.id = deg.src"""

  /** DuckDB replay of `Similarity.labelPrincipalAlignment` (q169):
    * per-label covariance keyed by label so ALL labels power-iterate
    * through one shared CTE chain (8 labeled matvec/normalize pairs),
    * plus the q166-style global chain; alignment = |Σ v_l·v_g| —
    * sign-invariant, so no canonicalization enters. */
  private def labelAlignSql: String = {
    val labelIters = (1 to 8).map { t =>
      val p = s"vl${t - 1}"
      s"""pl$t AS MATERIALIZED (
           SELECT k.label, k.i AS i, sum(k.c * $p.v) AS u
           FROM cl k JOIN $p ON $p.label = k.label AND $p.i = k.j
           GROUP BY k.label, k.i
         ), vl$t AS MATERIALIZED (
           SELECT pl$t.label, pl$t.i, pl$t.u / nrm.s AS v
           FROM pl$t JOIN (SELECT label, sqrt(sum(u * u)) AS s
                           FROM pl$t GROUP BY label) nrm
             ON nrm.label = pl$t.label
         )"""
    }.mkString(", ")
    val globalIters = (1 to 8).map { t =>
      val p = s"gv${t - 1}"
      s"""gp$t AS MATERIALIZED (
           SELECT k.i AS i, sum(k.c * $p.v) AS u
           FROM gc k JOIN $p ON $p.i = k.j GROUP BY k.i
         ), gv$t AS MATERIALIZED (
           SELECT i, u / (SELECT sqrt(sum(u * u)) FROM gp$t) AS v FROM gp$t
         )"""
    }.mkString(", ")
    s"""WITH e AS MATERIALIZED (
           SELECT vec_id, label, embedding FROM embeddings
           WHERE len(embedding) = 64
         ), x AS MATERIALIZED (
           SELECT vec_id, label, i.i AS i,
             CAST(embedding[CAST(i.i + 1 AS INT)] AS DOUBLE) AS v
           FROM e, range(64) i(i)
         ), nl AS MATERIALIZED (
           SELECT label, CAST(count(*) AS DOUBLE) AS n FROM e GROUP BY label
         ), ml AS MATERIALIZED (
           SELECT x.label, x.i, sum(x.v) / nl.n AS mu
           FROM x JOIN nl ON nl.label = x.label GROUP BY x.label, x.i, nl.n
         ), cl AS MATERIALIZED (
           SELECT a.label, a.i AS i, b.i AS j,
             sum(a.v * b.v) / nl.n - ma.mu * mb.mu AS c
           FROM x a JOIN x b ON a.vec_id = b.vec_id
           JOIN nl ON nl.label = a.label
           JOIN ml ma ON ma.label = a.label AND ma.i = a.i
           JOIN ml mb ON mb.label = a.label AND mb.i = b.i
           GROUP BY a.label, a.i, b.i, nl.n, ma.mu, mb.mu
         ), vl0 AS MATERIALIZED (
           SELECT label, i, CAST(1.0 AS DOUBLE) AS v FROM ml
         ), $labelIters, pfl AS MATERIALIZED (
           SELECT k.label, k.i AS i, sum(k.c * vl8.v) AS u
           FROM cl k JOIN vl8 ON vl8.label = k.label AND vl8.i = k.j
           GROUP BY k.label, k.i
         ), laml AS MATERIALIZED (
           SELECT vl8.label, sum(vl8.v * pfl.u) AS l
           FROM vl8 JOIN pfl ON pfl.label = vl8.label AND pfl.i = vl8.i
           GROUP BY vl8.label
         ), gn AS MATERIALIZED (
           SELECT CAST(count(*) AS DOUBLE) AS n FROM e
         ), gm AS MATERIALIZED (
           SELECT i, sum(v) / (SELECT n FROM gn) AS mu FROM x GROUP BY i
         ), gc AS MATERIALIZED (
           SELECT a.i AS i, b.i AS j,
             sum(a.v * b.v) / (SELECT n FROM gn) - ma.mu * mb.mu AS c
           FROM x a JOIN x b ON a.vec_id = b.vec_id
           JOIN gm ma ON ma.i = a.i JOIN gm mb ON mb.i = b.i
           GROUP BY a.i, b.i, ma.mu, mb.mu
         ), gv0 AS MATERIALIZED (
           SELECT i, CAST(1.0 AS DOUBLE) AS v FROM gm
         ), $globalIters, al AS MATERIALIZED (
           SELECT vl8.label, sum(vl8.v * gv8.v) AS a
           FROM vl8 JOIN gv8 ON gv8.i = vl8.i GROUP BY vl8.label
         )
         SELECT nl.label AS label, CAST(nl.n AS BIGINT) AS n_vecs,
           round(laml.l, 6) AS eigval, round(abs(al.a), 6) AS align
         FROM nl JOIN laml ON laml.label = nl.label
         JOIN al ON al.label = nl.label"""
  }

  /** DuckDB replay of `Sampling.domainReweightMW` (q165): the 10
    * multiplicative-weight iterations unrolled as CTE pairs (update,
    * normalize) — every arithmetic op mirrors the engine's driver loop
    * shape exactly (+,−,×,÷ on doubles, no transcendentals), so the
    * only cross-engine slack is k-element sum order (~1e-16, absorbed
    * by round-6). Literals are cast to DOUBLE: DuckDB's bare `1.0` /
    * `0.25` are DECIMAL, and a DECIMAL division would round
    * differently than the engine's IEEE divide. */
  private def domainReweightSql: String = {
    val toks = "len(string_split(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')), ' '))"
    val iters = (1 to 10).map { t =>
      val p = s"w${t - 1}"
      s"""u$t AS MATERIALIZED (
           SELECT source, n, ls, loss,
             w * (1 + CAST(0.25 AS DOUBLE) * ((loss - (SELECT sum(w * loss) FROM $p)) / (SELECT sum(w * loss) FROM $p))) AS w
           FROM $p
         ), w$t AS MATERIALIZED (
           SELECT source, n, ls, loss, w / (SELECT sum(w) FROM u$t) AS w FROM u$t
         )"""
    }.mkString(", ")
    s"""WITH per AS MATERIALIZED (
           SELECT source, CAST(count(*) AS BIGINT) AS n,
             CAST(sum($toks) AS BIGINT) AS ls
           FROM documents GROUP BY source
         ), w0 AS MATERIALIZED (
           SELECT source, n, ls, CAST(ls AS DOUBLE) / n AS loss,
             CAST(1.0 AS DOUBLE) / (SELECT count(*) FROM per) AS w
           FROM per
         ), $iters
         SELECT source, n AS n_docs,
           CAST((2 * CAST(ls AS HUGEINT) * 1000000 + n) // (2 * CAST(n AS HUGEINT)) AS BIGINT) AS loss_micro,
           round(w, 6) AS weight
         FROM w10"""
  }

  /** DuckDB replay of `Layout.zOrderTileStats` (q162): the Morton
    * interleave unrolled to a shift-mask-or chain — pure BIGINT bit
    * arithmetic, so the tile assignment is bit-identical. */
  private def zorderTilesSql: String = {
    val interleave = (0 until 10).map(i =>
      s"(((ux >> $i) & 1) << ${2 * i}) | (((tx >> $i) & 1) << ${2 * i + 1})")
      .mkString(" | ")
    s"""WITH b AS (
           SELECT (user_id & 1023) AS ux,
             ((epoch_us(ts) // 3600000000) & 1023) AS tx
           FROM events
         ), z AS (
           SELECT ux, tx, ($interleave) AS zv FROM b
         )
         SELECT zv // 256 AS tile, CAST(count(*) AS BIGINT) AS n_rows,
           min(ux) AS ux_min, max(ux) AS ux_max,
           min(tx) AS tx_min, max(tx) AS tx_max
         FROM z GROUP BY 1"""
  }

  /** DuckDB replay of `Dedup.lshProbeIndexed` over a freshly built
    * index (q159): the q19 MinHash/band CTEs; candidates = (probe,
    * corpus) docs sharing a band bucket with probe doc_id < 25 and
    * probe ≠ corpus; emitted at signature agreement ≥ 0.8. The
    * engine's bucket-literal scan prune and its band-folded xxhash64
    * bucketing only change WHERE the index is read and how candidates
    * are keyed — by the q19 pigeonhole argument the ≥ 0.8 output set
    * is exactly the agreement pairs either way. */
  private def lshProbeSql: String = {
    def parse12(start: Int) =
      s"CAST(list_sum(list_transform(range(12), j -> CAST(strpos('0123456789abcdef', substring(hx, CAST(j + $start AS INT), 1)) - 1 AS BIGINT) << (4*(11 - CAST(j AS INT))))) AS BIGINT)"
    s"""WITH t AS (
           SELECT doc_id,
             string_split(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')), ' ') AS toks
           FROM documents
         ), sh AS (
           SELECT DISTINCT doc_id,
             unnest(list_transform(range(1, len(toks) - 1),
               i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS shingle
           FROM t WHERE len(toks) >= 3
         ), hh AS (
           SELECT doc_id, ${parse12(1)} AS h1, ${parse12(13)} AS h2
           FROM (SELECT doc_id, md5(shingle) AS hx FROM sh)
         ), mh AS (
           SELECT doc_id, i.i AS i, min(h1 + i.i * h2) AS mh
           FROM hh CROSS JOIN range(64) i(i) GROUP BY doc_id, i.i
         ), band AS (
           SELECT doc_id, i // 4 AS band,
             string_agg(CAST(mh AS VARCHAR), ',' ORDER BY i) AS bucket
           FROM mh GROUP BY doc_id, band
         ), cand AS (
           SELECT DISTINCT a.doc_id AS doc_id, b.doc_id AS corpus_id
           FROM band a JOIN band b
             ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id != b.doc_id
           WHERE a.doc_id < 25
         )
         SELECT c.doc_id, c.corpus_id,
           CAST(count(*) FILTER (WHERE ma.mh = mb.mh) AS DOUBLE) / 64 AS est_jaccard
         FROM cand c
         JOIN mh ma ON ma.doc_id = c.doc_id
         JOIN mh mb ON mb.doc_id = c.corpus_id AND ma.i = mb.i
         GROUP BY 1, 2
         HAVING CAST(count(*) FILTER (WHERE ma.mh = mb.mh) AS DOUBLE) / 64 >= 0.8"""
  }

  /** DuckDB replay of `Dedup.incrementalNearDup` (q100): the q19
    * MinHash CTEs over ALL docs, candidate pairs restricted to
    * (new-bucket ≥ 70) × (old-bucket < 70) band collisions, exact
    * fingerprint membership against the old side's distinct digests.
    * est values are exact multiples of 1/64 — max() needs no round. */
  private def incrementalDedupSql: String = {
    def parse12(start: Int) =
      s"CAST(list_sum(list_transform(range(12), j -> CAST(strpos('0123456789abcdef', substring(hx, CAST(j + $start AS INT), 1)) - 1 AS BIGINT) << (4*(11 - CAST(j AS INT))))) AS BIGINT)"
    val norm =
      "trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g'))"
    s"""WITH bkt AS (
           SELECT doc_id, text,
             CAST(list_sum(list_transform(range(8),
               j -> CAST(strpos('0123456789abcdef', substring(hx, CAST(j + 1 AS INT), 1)) - 1 AS BIGINT) << (4*(7 - CAST(j AS INT))))) AS BIGINT) % 100 AS bucket
           FROM (SELECT doc_id, text, md5('graft:' || CAST(doc_id AS VARCHAR)) AS hx FROM documents)
         ), t AS (
           SELECT doc_id, string_split($norm, ' ') AS toks FROM bkt
         ), sh AS (
           SELECT DISTINCT doc_id,
             unnest(list_transform(range(1, len(toks) - 1),
               i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS shingle
           FROM t WHERE len(toks) >= 3
         ), hh AS (
           SELECT doc_id, ${parse12(1)} AS h1, ${parse12(13)} AS h2
           FROM (SELECT doc_id, md5(shingle) AS hx FROM sh)
         ), mh AS (
           SELECT doc_id, i.i AS i, min(h1 + i.i * h2) AS mh
           FROM hh CROSS JOIN range(64) i(i) GROUP BY doc_id, i.i
         ), band AS (
           SELECT doc_id, i // 4 AS band,
             string_agg(CAST(mh AS VARCHAR), ',' ORDER BY i) AS bkey
           FROM mh GROUP BY doc_id, band
         ), cand AS (
           SELECT DISTINCT n.doc_id AS id_new, o.doc_id AS id_old
           FROM band n
           JOIN bkt bn ON n.doc_id = bn.doc_id AND bn.bucket >= 70
           JOIN band o ON n.band = o.band AND n.bkey = o.bkey
           JOIN bkt bo ON o.doc_id = bo.doc_id AND bo.bucket < 70
         ), est AS (
           SELECT id_new, id_old,
             CAST(count(*) FILTER (WHERE ma.mh = mb.mh) AS DOUBLE) / 64 AS est
           FROM cand
           JOIN mh ma ON ma.doc_id = id_new
           JOIN mh mb ON mb.doc_id = id_old AND ma.i = mb.i
           GROUP BY 1, 2
           HAVING CAST(count(*) FILTER (WHERE ma.mh = mb.mh) AS DOUBLE) / 64 >= 0.8
         ), near AS (
           SELECT id_new AS doc_id, CAST(count(*) AS BIGINT) AS n_near_dups,
             max(est) AS max_est_jaccard
           FROM est GROUP BY 1
         ), oldfp AS (
           SELECT DISTINCT md5($norm) AS fp FROM bkt WHERE bucket < 70
         ), newdocs AS (
           SELECT doc_id, md5($norm) AS fp FROM bkt WHERE bucket >= 70
         )
         SELECT n.doc_id,
           (o.fp IS NOT NULL) AS exact_dup,
           CAST(coalesce(nr.n_near_dups, 0) AS BIGINT) AS n_near_dups,
           nr.max_est_jaccard,
           (o.fp IS NULL AND coalesce(nr.n_near_dups, 0) = 0) AS keep
         FROM newdocs n
         LEFT JOIN oldfp o ON n.fp = o.fp
         LEFT JOIN near nr ON n.doc_id = nr.doc_id"""
  }

  /** DuckDB CTE block reproducing `Dedup.winnowFingerprints` (q40):
    * 4-gram hashes = first 48 bits of md5; fingerprints = DISTINCT
    * window-min VALUES over sliding windows of 8 grams. Yields
    * `sel(doc_id, win, fp)` — consumers take DISTINCT (doc_id, fp).
    * Factored out so the q48 overlap oracle reuses it. */
  /** Shared 64-bit SimHash CTE chain ending in `sh(doc_id, simhash)` —
    * the per-hex-digit vote recomputation of [[graft.operators.Dedup.simHash64]]
    * (md5 halves recombined; bit i of digit 16−i/4 selected by `// 2^(i%4) % 2`).
    * Consumed by q20 (fingerprints) and q134 (Hamming-band pairs). */
  private val simhashCtes: String = {
    val votes = (0 until 64).map { i =>
      val p = 16 - i / 4
      val m = 1 << (i % 4)
      s"sum(CASE WHEN (strpos('0123456789abcdef', substring(hx, $p, 1)) - 1) // $m % 2 = 1 THEN 1 ELSE -1 END) AS b$i"
    }.mkString(",\n             ")
    val bits = (0 until 64).map { i =>
      s"CASE WHEN b$i > 0 THEN CAST(${1L << i} AS BIGINT) ELSE CAST(0 AS BIGINT) END"
    }.mkString("\n           + ")
    s"""tk AS (
           SELECT doc_id,
             unnest(string_split(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')), ' ')) AS tok
           FROM documents
         ), h AS (
           SELECT doc_id, md5(tok) AS hx FROM tk
         ), v AS (
           SELECT doc_id,
             $votes
           FROM h GROUP BY doc_id
         ), sh AS (
           SELECT doc_id, CAST($bits AS BIGINT) AS simhash FROM v
         )"""
  }

  private val winnowFpCtes: String =
    """t AS (
           SELECT doc_id,
             string_split(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')), ' ') AS toks
           FROM documents
         ), g AS (
           SELECT doc_id, i,
             CAST(list_sum(list_transform(range(12), j -> CAST(strpos('0123456789abcdef', substring(hx, CAST(j + 1 AS INT), 1)) - 1 AS BIGINT) << (4*(11 - CAST(j AS INT))))) AS BIGINT) AS h
           FROM (
             SELECT doc_id, i,
               md5(toks[CAST(i AS INT)] || ' ' || toks[CAST(i AS INT) + 1] || ' ' || toks[CAST(i AS INT) + 2] || ' ' || toks[CAST(i AS INT) + 3]) AS hx
             FROM (SELECT doc_id, toks, unnest(range(1, len(toks) - 2)) AS i
                   FROM t WHERE len(toks) >= 4)
           )
         ), gc AS (
           SELECT doc_id, count(*) AS m FROM g GROUP BY doc_id
         ), wins AS (
           SELECT doc_id, unnest(range(1, greatest(2, m - 6))) AS win FROM gc
         ), sel AS (
           SELECT w.doc_id, w.win, min(g.h) AS fp
           FROM wins w JOIN g ON g.doc_id = w.doc_id AND g.i BETWEEN w.win AND w.win + 7
           GROUP BY 1, 2
         )"""

  /** DuckDB replay of `Similarity.kmeansRefine` (q49): c0 = the same
    * md5-hex-keyed centroid sample as q39; each iteration = exact-L2
    * argmin assignment (lowest-cluster tiebreak) + per-dim means
    * ROUNDED to 6 dp (the rounding is what makes engine-to-engine
    * summation-order noise non-compounding); empty clusters keep their
    * previous centroid via the LEFT JOIN + coalesce. */
  private def kmeansRefineSql(k: Int, dim: Int, iters: Int): String = {
    def assign(it: Int, prev: String) =
      s"""a$it AS (
           SELECT vec_id, c, dist FROM (
             SELECT e.vec_id, cc.c AS c,
               list_sum(list_transform(range($dim), i ->
                 (e.v[CAST(i+1 AS INT)] - cc.ce[CAST(i+1 AS INT)]) * (e.v[CAST(i+1 AS INT)] - cc.ce[CAST(i+1 AS INT)]))) AS dist
             FROM e CROSS JOIN $prev cc
           ) QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY dist ASC, c ASC) = 1
         )"""
    def update(it: Int, prev: String) =
      s"""m$it AS (
           SELECT a.c, i.i, round(avg(e.v[CAST(i.i+1 AS INT)]), 6) AS w
           FROM a$it a JOIN e USING (vec_id) CROSS JOIN range($dim) i(i)
           GROUP BY a.c, i.i
         ), c$it AS (
           SELECT p.c, coalesce(nu.ce, p.ce) AS ce
           FROM $prev p LEFT JOIN (SELECT c, list(w ORDER BY i) AS ce FROM m$it GROUP BY c) nu USING (c)
         )"""
    val ctes = Seq(
      s"""e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         c0 AS (
           SELECT row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1 AS c,
                  CAST(embedding AS DOUBLE[]) AS ce
           FROM embeddings ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT $k
         )""") ++
      (1 to iters).flatMap(it => Seq(assign(it, s"c${it - 1}"), update(it, s"c${it - 1}"))) :+
      assign(iters + 1, s"c$iters")
    s"""WITH ${ctes.mkString(",\n         ")}
         SELECT vec_id, CAST(c AS INT) AS cluster, round(dist, 6) AS l2sq
         FROM a${iters + 1}"""
  }

  /** DuckDB replay of `Similarity.semDedup` (q56): the same k-means
    * CTE chain as q49 (so the cluster partition is identical), then a
    * within-cluster-only pair join — a vector is dropped when a
    * smaller-id cluster-mate has round-6 cosine ≥ the threshold. */
  private def semDedupSql(k: Int, dim: Int, iters: Int, threshold: Double): String = {
    val refine = kmeansRefineSql(k, dim, iters)
    // reuse the full replay as a subquery: its SELECT is exactly the
    // per-vector (vec_id, cluster, l2sq) assignment table
    s"""WITH asg AS (SELECT vec_id, cluster FROM ($refine)),
         pair AS (
           SELECT a.vec_id AS id, a.cluster,
             round(list_cosine_similarity(CAST(ea.embedding AS DOUBLE[]), CAST(eb.embedding AS DOUBLE[])), 6) AS cs
           FROM asg a JOIN asg b ON a.cluster = b.cluster AND b.vec_id < a.vec_id
           JOIN embeddings ea ON a.vec_id = ea.vec_id
           JOIN embeddings eb ON b.vec_id = eb.vec_id
         ), d AS (
           SELECT id, count(*) AS n_dups, max(cs) AS max_cos
           FROM pair WHERE cs >= $threshold GROUP BY id
         )
         SELECT a.vec_id, a.cluster,
           coalesce(d.n_dups, 0) AS n_dups, d.max_cos,
           coalesce(d.n_dups, 0) = 0 AS keep
         FROM asg a LEFT JOIN d ON a.vec_id = d.id"""
  }

  /** Exact component labeling over the q19 pair graph by recursive
    * reachability — the shared oracle for BOTH connected-components
    * implementations (q47 min-propagation, q68 alternating stars),
    * which must agree row-for-row. */
  /** q51's funnel-verdict oracle, factored out so the q102 pipeline
    * manifest composes the IDENTICAL gate (one copy of the thresholds,
    * signal formulas and verdict precedence). */
  private def curationFunnelSql: String =
    """WITH n AS (
           SELECT doc_id, lang, text,
             string_split(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')), ' ') AS toks,
             trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')) AS norm
           FROM documents
         ), sig AS (
           SELECT doc_id, lang,
             CAST(len(toks) AS INT) AS n_tokens,
             CASE WHEN len(toks) >= 2 THEN round(1.0 -
               CAST(len(list_distinct(list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i+1]))) AS DOUBLE)
               / CAST(len(toks) - 1 AS DOUBLE), 6) END AS repetition_ratio,
             least(CAST(length(text) AS DOUBLE) / 500.0, 1.0) * 0.4
               + least(CAST(len(list_filter(toks, t -> t IN ('the', 'a', 'an', 'of', 'and', 'or', 'to', 'in', 'is', 'it'))) AS DOUBLE)
                 / CAST(len(toks) AS DOUBLE) / 0.1, 1.0) * 0.3
               + (CASE WHEN CAST(length(replace(norm, ' ', '')) AS DOUBLE) / CAST(len(toks) AS DOUBLE) >= 3.0
                        AND CAST(length(replace(norm, ' ', '')) AS DOUBLE) / CAST(len(toks) AS DOUBLE) <= 8.0
                   THEN 1.0 ELSE 0.0 END) * 0.3 AS quality,
             CASE WHEN greatest(
                    len(list_filter(toks, t -> t IN ('the', 'a', 'of', 'and', 'is', 'to', 'in', 'it'))),
                    len(list_filter(toks, t -> t IN ('der', 'die', 'das', 'und', 'ist', 'nicht', 'ein'))),
                    len(list_filter(toks, t -> t IN ('el', 'la', 'de', 'y', 'es', 'que', 'un'))),
                    len(list_filter(toks, t -> t IN ('le', 'la', 'et', 'les', 'des', 'est', 'une')))) = 0 THEN 'und'
                  WHEN len(list_filter(toks, t -> t IN ('the', 'a', 'of', 'and', 'is', 'to', 'in', 'it'))) = greatest(
                    len(list_filter(toks, t -> t IN ('the', 'a', 'of', 'and', 'is', 'to', 'in', 'it'))),
                    len(list_filter(toks, t -> t IN ('der', 'die', 'das', 'und', 'ist', 'nicht', 'ein'))),
                    len(list_filter(toks, t -> t IN ('el', 'la', 'de', 'y', 'es', 'que', 'un'))),
                    len(list_filter(toks, t -> t IN ('le', 'la', 'et', 'les', 'des', 'est', 'une')))) THEN 'en'
                  WHEN len(list_filter(toks, t -> t IN ('der', 'die', 'das', 'und', 'ist', 'nicht', 'ein'))) = greatest(
                    len(list_filter(toks, t -> t IN ('the', 'a', 'of', 'and', 'is', 'to', 'in', 'it'))),
                    len(list_filter(toks, t -> t IN ('der', 'die', 'das', 'und', 'ist', 'nicht', 'ein'))),
                    len(list_filter(toks, t -> t IN ('el', 'la', 'de', 'y', 'es', 'que', 'un'))),
                    len(list_filter(toks, t -> t IN ('le', 'la', 'et', 'les', 'des', 'est', 'une')))) THEN 'de'
                  WHEN len(list_filter(toks, t -> t IN ('el', 'la', 'de', 'y', 'es', 'que', 'un'))) = greatest(
                    len(list_filter(toks, t -> t IN ('the', 'a', 'of', 'and', 'is', 'to', 'in', 'it'))),
                    len(list_filter(toks, t -> t IN ('der', 'die', 'das', 'und', 'ist', 'nicht', 'ein'))),
                    len(list_filter(toks, t -> t IN ('el', 'la', 'de', 'y', 'es', 'que', 'un'))),
                    len(list_filter(toks, t -> t IN ('le', 'la', 'et', 'les', 'des', 'est', 'une')))) THEN 'es'
                  ELSE 'fr' END AS pred_lang
           FROM n
         )
         SELECT doc_id, lang, n_tokens, repetition_ratio, quality, pred_lang,
           CASE WHEN n_tokens < 20 THEN 'drop:too_short'
                WHEN repetition_ratio > 0.2 THEN 'drop:repetitive'
                WHEN quality < 0.5 THEN 'drop:low_quality'
                WHEN pred_lang <> lang THEN 'drop:lang_mismatch'
                ELSE 'keep' END AS verdict
         FROM sig"""

  /** q57's token-budget oracle, factored out so the q102 pipeline
    * manifest composes the IDENTICAL per-source keep_buckets. */
  private def tokenBudgetMixSql: String =
    """WITH b AS (
           SELECT source,
             CAST(CAST(list_sum(list_transform(range(8),
               j -> CAST(strpos('0123456789abcdef', substring(hx, CAST(j + 1 AS INT), 1)) - 1 AS BIGINT) << (4*(7 - CAST(j AS INT))))) AS BIGINT) % 100 AS INT) AS bucket,
             CAST(len(string_split(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')), ' ')) AS BIGINT) AS n_tokens
           FROM (SELECT source, text,
                   md5('graft:' || CAST(doc_id AS VARCHAR)) AS hx FROM documents)
         ), g AS (
           SELECT source, bucket, count(*) AS n_docs, sum(n_tokens) AS n_tokens
           FROM b GROUP BY 1, 2
         ), tot AS (
           SELECT source,
             CAST(sum(n_docs) AS BIGINT) AS total_docs,
             CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
             CAST(CASE WHEN sum(n_tokens) <= 0 THEN 100
                  ELSE least(100, 800 * 100 // sum(n_tokens)) END AS BIGINT) AS keep_buckets
           FROM g GROUP BY source
         )
         SELECT t.source, t.total_docs, t.total_tokens, t.keep_buckets,
           CAST(sum(CASE WHEN g.bucket < t.keep_buckets THEN g.n_docs ELSE 0 END) AS BIGINT) AS kept_docs,
           CAST(sum(CASE WHEN g.bucket < t.keep_buckets THEN g.n_tokens ELSE 0 END) AS BIGINT) AS kept_tokens
         FROM g JOIN tot t USING (source)
         GROUP BY t.source, t.total_docs, t.total_tokens, t.keep_buckets"""

  /** Unrolled integral-PageRank CTE chain for q120: iteration k maps
    * r{k-1} → r{k} with rᵥ = 150000 + Σᵤ (85·rᵤ·w) // (100·Sᵤ) — the
    * exact integer contract of [[graft.operators.CorpusStats.textRank]]
    * (non-negative operands, order-independent sums). */
  private def textRankSql(vocab: Int, iters: Int): String = {
    val iterCtes = (1 to iters).map { k =>
      s"""r$k AS (
           SELECT n.token, CAST(150000 + COALESCE(c.s, 0) AS BIGINT) AS r
           FROM nodes n LEFT JOIN (
             SELECT e.dst AS token,
               CAST(sum((85 * r.r * e.w) // (100 * e.s_src)) AS BIGINT) AS s
             FROM e JOIN r${k - 1} r ON e.src = r.token GROUP BY 1) c
           ON n.token = c.token
         )"""
    }.mkString(", ")
    s"""WITH t AS (
           SELECT string_split(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')), ' ') AS toks
           FROM documents
         ), tok AS (
           SELECT unnest(toks) AS token FROM t
         ), uni AS (
           SELECT token, CAST(count(*) AS BIGINT) AS cnt FROM tok GROUP BY token
         ), nodes AS (
           SELECT token, cnt FROM uni ORDER BY cnt DESC, token LIMIT $vocab
         ), bi AS (
           SELECT tok_a, tok_b FROM (
             SELECT toks[i] AS tok_a, toks[i + 1] AS tok_b
             FROM (SELECT toks, unnest(generate_series(1, len(toks) - 1)) AS i
                   FROM t WHERE len(toks) >= 2))
           WHERE tok_a <> tok_b
             AND tok_a IN (SELECT token FROM nodes)
             AND tok_b IN (SELECT token FROM nodes)
         ), und AS (
           SELECT least(tok_a, tok_b) AS u, greatest(tok_a, tok_b) AS v,
             CAST(count(*) AS BIGINT) AS w
           FROM bi GROUP BY 1, 2
         ), sym AS (
           SELECT u AS src, v AS dst, w FROM und
           UNION ALL
           SELECT v AS src, u AS dst, w FROM und
         ), st AS (
           SELECT src, CAST(sum(w) AS BIGINT) AS s_src FROM sym GROUP BY 1
         ), e AS (
           SELECT sym.src, sym.dst, sym.w, st.s_src
           FROM sym JOIN st ON sym.src = st.src
         ), r0 AS (
           SELECT token, CAST(1000000 AS BIGINT) AS r FROM nodes
         ), $iterCtes
         SELECT CAST(row_number() OVER (ORDER BY r.r DESC, r.token) AS BIGINT) AS rank,
           r.token, n.cnt, r.r AS score_micro
         FROM r$iters r JOIN nodes n ON r.token = n.token"""
  }

  private def componentsSql: String =
    s"""WITH RECURSIVE pairs AS (
           SELECT id_a, id_b FROM ($minhashPairsSql)
         ), edges AS (
           SELECT id_a AS u, id_b AS v FROM pairs
           UNION
           SELECT id_b, id_a FROM pairs
         ), nodes AS (
           SELECT DISTINCT u AS id FROM edges
         ), reach(id, lab) AS (
           SELECT id, id FROM nodes
           UNION
           SELECT e.v, r.lab FROM reach r JOIN edges e ON e.u = r.id
         ), comp AS (
           SELECT id AS doc_id, min(lab) AS cluster_id FROM reach GROUP BY id
         )
         SELECT c.doc_id, c.cluster_id, s.cluster_size
         FROM comp c
         JOIN (SELECT cluster_id, count(*) AS cluster_size FROM comp GROUP BY 1) s
           USING (cluster_id)"""

  /** Shared BM25 scoring CTE chain (through `sc`) for q72 and q73 —
    * ONE copy of the k1/b literals, idf formula and double-op order,
    * so the lexical leg of the hybrid fusion can never drift from the
    * standalone ranking. */
  private def bm25ScoreCtes: String =
    """lens AS (
           SELECT doc_id,
             CAST(len(string_split(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')), ' ')) AS BIGINT) AS dl
           FROM documents
         ), stats AS (
           SELECT count(*) AS n_docs, sum(dl) AS total_dl FROM lens
         ), tok AS (
           SELECT doc_id,
             unnest(string_split(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')), ' ')) AS token
           FROM documents
         ), tf AS (
           SELECT doc_id, token, count(*) AS tf FROM tok
           WHERE token IN ('vector', 'merge', 'stream', 'window')
           GROUP BY 1, 2
         ), dfr AS (
           SELECT token, count(*) AS df FROM tf GROUP BY token
         ), sc AS (
           SELECT tf.doc_id, count(*) AS n_matched,
             round(sum(
               ln(1.0 + (CAST(stats.n_docs AS DOUBLE) - CAST(dfr.df AS DOUBLE) + 0.5) / (CAST(dfr.df AS DOUBLE) + 0.5))
               * (CAST(tf.tf AS DOUBLE) * 2.2)
               / (CAST(tf.tf AS DOUBLE) + 1.2 * (1.0 - 0.75 + 0.75 * CAST(lens.dl AS DOUBLE) / (CAST(stats.total_dl AS DOUBLE) / CAST(stats.n_docs AS DOUBLE))))
             ), 6) AS score
           FROM tf JOIN dfr USING (token) JOIN lens USING (doc_id) CROSS JOIN stats
           GROUP BY tf.doc_id
         )"""

  /** DuckDB-runnable oracle per query (same parquet tables registered
    * under their bare names). Column names/aliases match the Spark side
    * exactly — the driver sorts columns by name before hashing. */
  def map: Map[String, String] = Map(
    "q01_pricing_agg" ->
      """SELECT l_returnflag, l_linestatus,
         CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
         CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
         CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS sum_disc_price,
         CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2))) * (1 + CAST(l_tax AS DECIMAL(4,2)))) AS DOUBLE) AS sum_charge,
         count(*) AS count_order
         FROM lineitem GROUP BY l_returnflag, l_linestatus""",
    "q02_filter_project" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice * l_discount AS disc_revenue
         FROM lineitem
         WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
           AND l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24.0""",
    "q03_enrich_join" ->
      """SELECT o_orderkey, o_totalprice, c_name, n_name
         FROM orders JOIN customer ON o_custkey = c_custkey
         JOIN nation ON c_nationkey = n_nationkey""",
    "q04_revenue_topn" ->
      """SELECT o_orderkey, epoch_us(o_orderdate) AS o_orderdate_us,
         CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         GROUP BY o_orderkey, o_orderdate
         ORDER BY revenue DESC, o_orderkey ASC LIMIT 10""",
    "q05_upsert_latest" ->
      """SELECT user_id, event_id AS last_event_id, event_type AS last_event_type,
         value AS last_value, epoch_us(ts) AS ts_us
         FROM (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
               FROM events) WHERE rn = 1""",
    "q06_dedup_first" ->
      """SELECT user_id, event_type, event_id AS first_event_id, epoch_us(ts) AS first_ts_us
         FROM (SELECT *, row_number() OVER (PARTITION BY user_id, event_type ORDER BY ts ASC, event_id ASC) AS rn
               FROM events) WHERE rn = 1""",
    "q07_window_tumble" ->
      """SELECT epoch_us(date_trunc('hour', ts)) AS window_start_us, event_type,
         count(*) AS n_events,
         CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
         FROM events GROUP BY 1, 2""",
    "q08_window_hop" ->
      """SELECT (epoch_us(ts) // 1800000000 - k) * 1800000000 AS window_start_us,
         count(*) AS n_events,
         CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
         FROM events CROSS JOIN (VALUES (0), (1)) AS probes(k)
         GROUP BY 1""",
    "q09_session_window" ->
      """WITH marked AS (
           SELECT user_id, ts, value,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_sess
           FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)
         ), numbered AS (
           SELECT *, sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_id
           FROM marked
         )
         SELECT user_id, epoch_us(min(ts)) AS session_start_us,
           epoch_us(max(ts) + INTERVAL 30 MINUTE) AS session_end_us,
           count(*) AS n_events,
           CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
         FROM numbered GROUP BY user_id, sess_id""",
    "q35_window_cumulate" ->
      """SELECT (epoch_us(ts) // 7200000000) * 7200000000 AS window_start_us,
         (epoch_us(ts) // 7200000000) * 7200000000 + k * CAST(1800000000 AS BIGINT) AS window_end_us,
         count(*) AS n_events,
         CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
         FROM events CROSS JOIN (VALUES (1), (2), (3), (4)) AS steps(k)
         WHERE epoch_us(ts) < (epoch_us(ts) // 7200000000) * 7200000000 + k * CAST(1800000000 AS BIGINT)
         GROUP BY 1, 2""",
    "q10_topn_per_group" ->
      """SELECT o_custkey, rn, o_orderkey, o_totalprice
         FROM (SELECT o_custkey, o_orderkey, o_totalprice,
                 row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
               FROM orders) WHERE rn <= 3""",
    "q11_interval_join" ->
      """SELECT p.event_id AS purchase_id, c.event_id AS click_id, p.user_id
         FROM events p JOIN events c
           ON p.user_id = c.user_id
          AND p.event_type = 'purchase' AND c.event_type = 'click'
          AND c.ts >= p.ts - INTERVAL 1 HOUR AND c.ts <= p.ts""",
    "q12_asof_join" ->
      """SELECT event_id AS purchase_id, user_id, epoch_us(ts) AS ts_us, matched_view_id
         FROM (
           SELECT user_id, ts, event_id, event_type,
             last_value(CASE WHEN event_type = 'view' THEN event_id END IGNORE NULLS)
               OVER (PARTITION BY user_id
                     ORDER BY ts, CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS matched_view_id
           FROM events WHERE event_type IN ('view', 'purchase')
         ) WHERE event_type = 'purchase'""",
    "q13_retract_net" ->
      """SELECT user_id,
         CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE -1 END) AS BIGINT) AS net_count,
         CAST(sum((CASE WHEN event_type = 'click' THEN 1 ELSE -1 END) * CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS net_value
         FROM events WHERE event_type IN ('click', 'error')
         GROUP BY user_id
         HAVING sum(CASE WHEN event_type = 'click' THEN 1 ELSE -1 END) <> 0""",
    "q14_token_stats" ->
      """SELECT doc_id,
         len(string_split(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')), ' ')) AS n_tokens,
         len(list_distinct(string_split(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')), ' '))) AS n_distinct_tokens,
         len(list_filter(string_split(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')), ' '),
             t -> t IN ('the', 'a', 'an', 'of', 'and', 'or', 'to', 'in', 'is', 'it'))) AS n_stopwords,
         len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS n_subword_tokens,
         length(text) AS n_chars_raw
         FROM documents""",
    "q15_quality_score" ->
      """WITH n AS (
           SELECT doc_id, text,
             string_split(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')), ' ') AS toks,
             trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')) AS norm
           FROM documents
         ), c AS (
           SELECT doc_id,
             CAST(length(text) AS DOUBLE) AS n_chars,
             CAST(len(toks) AS DOUBLE) AS n_toks,
             CAST(len(list_filter(toks, t -> t IN ('the', 'a', 'an', 'of', 'and', 'or', 'to', 'in', 'is', 'it'))) AS DOUBLE) AS n_stop,
             CAST(length(replace(norm, ' ', '')) AS DOUBLE) AS n_tok_chars
           FROM n
         )
         SELECT doc_id,
           least(n_chars / 500.0, 1.0) * 0.4
           + least(n_stop / n_toks / 0.1, 1.0) * 0.3
           + (CASE WHEN n_tok_chars / n_toks >= 3.0 AND n_tok_chars / n_toks <= 8.0 THEN 1.0 ELSE 0.0 END) * 0.3 AS quality
         FROM c""",
    "q16_lang_id" ->
      """WITH toks AS (
           SELECT doc_id, lang,
             string_split(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')), ' ') AS tk
           FROM documents
         ), sc AS (
           SELECT doc_id, lang,
             len(list_filter(tk, t -> t IN ('the', 'a', 'of', 'and', 'is', 'to', 'in', 'it'))) AS s_en,
             len(list_filter(tk, t -> t IN ('der', 'die', 'das', 'und', 'ist', 'nicht', 'ein'))) AS s_de,
             len(list_filter(tk, t -> t IN ('el', 'la', 'de', 'y', 'es', 'que', 'un'))) AS s_es,
             len(list_filter(tk, t -> t IN ('le', 'la', 'et', 'les', 'des', 'est', 'une'))) AS s_fr
           FROM toks
         )
         SELECT doc_id,
           CASE WHEN greatest(s_en, s_de, s_es, s_fr) = 0 THEN 'und'
                WHEN s_en = greatest(s_en, s_de, s_es, s_fr) THEN 'en'
                WHEN s_de = greatest(s_en, s_de, s_es, s_fr) THEN 'de'
                WHEN s_es = greatest(s_en, s_de, s_es, s_fr) THEN 'es'
                ELSE 'fr' END AS pred_lang,
           (CASE WHEN greatest(s_en, s_de, s_es, s_fr) = 0 THEN 'und'
                WHEN s_en = greatest(s_en, s_de, s_es, s_fr) THEN 'en'
                WHEN s_de = greatest(s_en, s_de, s_es, s_fr) THEN 'de'
                WHEN s_es = greatest(s_en, s_de, s_es, s_fr) THEN 'es'
                ELSE 'fr' END) = lang AS is_match
         FROM sc""",
    "q17_dedup_exact" ->
      """SELECT md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g'))) AS fp,
         min(doc_id) AS keep_id, count(*) AS n_copies
         FROM documents GROUP BY 1""",
    "q18_ngram_dedup" -> ngramJaccardPairsSql,
    // MinHash: sig_i = min over shingles of (h1 + i·h2), h1/h2 = the two
    // 48-bit halves of md5(shingle) — exact integers in both engines.
    // Banding: any pair agreeing on ≥ 52/64 positions shares ≥1 fully-
    // equal band (pigeonhole), so bucket identity == slice equality.
    "q19_minhash_lsh" -> minhashPairsSql,
    // Persisted-index pairs are output-identical to q19 (the index only
    // changes WHERE the banded signatures live, not which pairs agree).
    "q158_lsh_indexed_pairs" -> minhashPairsSql,
    // Index point probe: q19's CTEs, candidates restricted to the
    // probe side (doc_id < 25), identity excluded, both orders kept.
    "q159_lsh_index_probe" -> lshProbeSql,
    // Head-position token bias: 0-based positions, top-200 by
    // (count DESC, token) — q42's convention; lift cross products in
    // HUGEINT mirroring the engine's DECIMAL(38,0), outputs BIGINT.
    "q162_zorder_tiles" -> zorderTilesSql,
    "q163_bbit_minhash" -> bbitMinhashSql,
    "q165_domain_reweight" -> domainReweightSql,
    "q166_top_principal" -> topPrincipalSql,
    "q167_principal_spectrum" -> principalSpectrumSql,
    "q168_pca_residual" -> pcaResidualSql,
    "q169_label_pca_drift" -> labelAlignSql,
    "q175_dup_pagerank" -> dupPageRankSql,
    "q176_dup_triangles" -> dupTrianglesSql,
    "q177_dup_kcore" -> dupKcoreSql,
    "q178_graph_manifest" -> graphManifestSql,
    // Vocabulary richness: exact type-frequency folds; unseen mass and
    // Chao1 in all-integer half-up forms.
    "q174_vocab_richness" ->
      """WITH t AS (
           SELECT source, string_split(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')), ' ') AS toks
           FROM documents
         ), tok AS (
           SELECT source, unnest(toks) AS token FROM t
         ), c AS (
           SELECT source, token, count(*) AS c FROM tok GROUP BY 1, 2
         ), s AS (
           SELECT source, CAST(sum(c) AS BIGINT) AS n_tokens,
             CAST(count(*) AS BIGINT) AS vocab,
             CAST(count(*) FILTER (WHERE c = 1) AS BIGINT) AS n1,
             CAST(count(*) FILTER (WHERE c = 2) AS BIGINT) AS n2
           FROM c GROUP BY source
         )
         SELECT source, n_tokens, vocab, n1, n2,
           CAST((2*CAST(n1 AS HUGEINT)*1000000 + n_tokens) // (2*CAST(n_tokens AS HUGEINT)) AS BIGINT) AS unseen_ppm,
           CAST(vocab + (2*CAST(n1 AS HUGEINT)*(n1-1) + 2*(CAST(n2 AS HUGEINT)+1)) // (4*(CAST(n2 AS HUGEINT)+1)) AS BIGINT) AS chao1
         FROM s""",
    // Language agreement: q16's scoring CTEs verbatim, grouped to
    // (source, declared, predicted) cells; shares in half-up micro.
    "q179_lang_agreement" ->
      """WITH toks AS (
           SELECT source, lang,
             string_split(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')), ' ') AS tk
           FROM documents
         ), sc AS (
           SELECT source, lang,
             len(list_filter(tk, t -> t IN ('the', 'a', 'of', 'and', 'is', 'to', 'in', 'it'))) AS s_en,
             len(list_filter(tk, t -> t IN ('der', 'die', 'das', 'und', 'ist', 'nicht', 'ein'))) AS s_de,
             len(list_filter(tk, t -> t IN ('el', 'la', 'de', 'y', 'es', 'que', 'un'))) AS s_es,
             len(list_filter(tk, t -> t IN ('le', 'la', 'et', 'les', 'des', 'est', 'une'))) AS s_fr
           FROM toks
         ), pred AS (
           SELECT source, lang,
             CASE WHEN greatest(s_en, s_de, s_es, s_fr) = 0 THEN 'und'
                  WHEN s_en = greatest(s_en, s_de, s_es, s_fr) THEN 'en'
                  WHEN s_de = greatest(s_en, s_de, s_es, s_fr) THEN 'de'
                  WHEN s_es = greatest(s_en, s_de, s_es, s_fr) THEN 'es'
                  ELSE 'fr' END AS pred_lang
           FROM sc
         ), cells AS (
           SELECT source, lang, pred_lang, CAST(count(*) AS BIGINT) AS n
           FROM pred GROUP BY 1, 2, 3
         )
         SELECT source, lang, pred_lang, n,
           CAST((2 * n * 1000000 + sum(n) OVER (PARTITION BY source, lang))
             // (2 * sum(n) OVER (PARTITION BY source, lang)) AS BIGINT) AS share_ppm
         FROM cells""",
    // Snapshot diff: q44's portable bucket carves old/new views; md5
    // fingerprint equality (the q17 contract) classifies rows.
    "q173_corpus_diff" ->
      """WITH b AS (
           SELECT doc_id, source, text,
             CAST(CAST(list_sum(list_transform(range(8),
               j -> CAST(strpos('0123456789abcdef', substring(hx, CAST(j + 1 AS INT), 1)) - 1 AS BIGINT) << (4*(7 - CAST(j AS INT))))) AS BIGINT) % 100 AS INT) AS bkt
           FROM (SELECT doc_id, source, text,
                   md5('graft:' || CAST(doc_id AS VARCHAR)) AS hx FROM documents)
         ), o AS (
           SELECT doc_id, source, md5(text) AS h,
             CAST(len(string_split(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')), ' ')) AS BIGINT) AS t
           FROM b WHERE bkt < 90
         ), n AS (
           SELECT doc_id, source, md5(text) AS h,
             CAST(len(string_split(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')), ' ')) AS BIGINT) AS t
           FROM b WHERE bkt >= 10
         ), j AS (
           -- presence = the row's OWN id (the engine's literal flag):
           -- a null-text row must classify changed/stable by presence,
           -- never masquerade as added/removed; stable compares
           -- null-safe (IS NOT DISTINCT FROM), mirroring the <=>
           SELECT COALESCE(n.source, o.source) AS source,
             o.doc_id AS oid, n.doc_id AS nid,
             o.h AS ho, n.h AS hn, o.t AS t_o, n.t AS t_n
           FROM o FULL OUTER JOIN n ON o.doc_id = n.doc_id
         )
         SELECT source,
           CAST(count(*) FILTER (WHERE oid IS NULL) AS BIGINT) AS n_added,
           CAST(count(*) FILTER (WHERE nid IS NULL) AS BIGINT) AS n_removed,
           CAST(count(*) FILTER (WHERE oid IS NOT NULL AND nid IS NOT NULL AND ho IS DISTINCT FROM hn) AS BIGINT) AS n_changed,
           CAST(count(*) FILTER (WHERE oid IS NOT NULL AND nid IS NOT NULL AND ho IS NOT DISTINCT FROM hn) AS BIGINT) AS n_stable,
           CAST(COALESCE(sum(t_n) FILTER (WHERE oid IS NULL), 0) AS BIGINT) AS tok_added,
           CAST(COALESCE(sum(t_o) FILTER (WHERE nid IS NULL), 0) AS BIGINT) AS tok_removed,
           CAST(COALESCE(sum(COALESCE(t_n, 0)), 0) - COALESCE(sum(COALESCE(t_o, 0)), 0) AS BIGINT) AS tok_net
         FROM j GROUP BY source""",
    // Lead–lag: zero-filled hour grid; exact integer Pearson
    // statistics (HUGEINT mirror of the engine's DECIMAL), doubles
    // only in the final formula.
    "q172_lead_lag" ->
      """WITH h AS (
           SELECT (epoch_us(ts) // 3600000000) AS hr, event_type AS ty FROM events
         ), bounds AS (
           SELECT min(hr) AS lo, max(hr) AS hi FROM h
         ), grid AS (
           SELECT unnest(generate_series((SELECT lo FROM bounds),
                                         (SELECT hi FROM bounds))) AS hr
         ), xa AS (
           SELECT hr, count(*) AS c FROM h WHERE ty = 'view' GROUP BY hr
         ), xb AS (
           SELECT hr, count(*) AS c FROM h WHERE ty = 'purchase' GROUP BY hr
         ), series AS (
           SELECT g.hr, COALESCE(xa.c, 0) AS x, COALESCE(xb.c, 0) AS y
           FROM grid g LEFT JOIN xa USING (hr) LEFT JOIN xb USING (hr)
         ), lags AS (
           SELECT unnest(generate_series(-3, 3)) AS lag
         ), s AS (
           SELECT l.lag, CAST(count(*) AS BIGINT) AS n_buckets,
             CAST(sum(CAST(a.x AS HUGEINT)) AS DOUBLE) AS sx,
             CAST(sum(CAST(b.y AS HUGEINT)) AS DOUBLE) AS sy,
             CAST(sum(CAST(a.x AS HUGEINT) * b.y) AS DOUBLE) AS sxy,
             CAST(sum(CAST(a.x AS HUGEINT) * a.x) AS DOUBLE) AS sxx,
             CAST(sum(CAST(b.y AS HUGEINT) * b.y) AS DOUBLE) AS syy,
             CAST(count(*) AS DOUBLE) AS n
           FROM lags l
           JOIN series a ON true
           JOIN series b ON b.hr = a.hr + l.lag
           GROUP BY l.lag
         )
         SELECT CAST(lag AS BIGINT) AS lag, n_buckets,
           CASE WHEN n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
             THEN round((n * sxy - sx * sy)
               / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)), 6)
           END AS corr
         FROM s""",
    // Interpolated Kneser–Ney: q98's bigram CTEs; continuation stats
    // from the (a,b) TYPE frame; formula left-to-right, D = 3/4,
    // DOUBLE-cast literals; ln under the libm-parity contract.
    "q171_kn_bigram_lm" ->
      """WITH t AS (
           SELECT doc_id, string_split(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')), ' ') AS toks
           FROM documents
         ), bi AS (
           SELECT doc_id, toks[i] AS tok_a, toks[i + 1] AS tok_b
           FROM (SELECT doc_id, toks, unnest(generate_series(1, len(toks) - 1)) AS i
                 FROM t WHERE len(toks) >= 2)
         ), big AS (
           SELECT tok_a, tok_b, count(*) AS c_ab FROM bi GROUP BY 1, 2
         ), ctx AS (
           SELECT tok_a, CAST(sum(c_ab) AS BIGINT) AS c_a, count(*) AS n1_a
           FROM big GROUP BY tok_a
         ), lb AS (
           SELECT tok_b, count(*) AS n1_b FROM big GROUP BY tok_b
         ), nt AS (
           SELECT CAST(count(*) AS DOUBLE) AS nt FROM big
         )
         SELECT b.doc_id, count(*) AS n_bigrams,
           round(sum(ln(
             (greatest(CAST(g.c_ab AS DOUBLE) - CAST(0.75 AS DOUBLE), CAST(0.0 AS DOUBLE))
              + CAST(0.75 AS DOUBLE) * CAST(x.n1_a AS DOUBLE) * CAST(l.n1_b AS DOUBLE)
                / (SELECT nt FROM nt))
             / CAST(x.c_a AS DOUBLE))) / count(*), 6) AS mean_kn_logprob
         FROM bi b
         JOIN big g USING (tok_a, tok_b)
         JOIN ctx x ON b.tok_a = x.tok_a
         JOIN lb l ON b.tok_b = l.tok_b
         GROUP BY b.doc_id""",
    // Continuation edges: q138's head/tail gram idiom, fanout-capped on
    // both sides before the equi-join.
    "q170_continuation_chains" ->
      s"""WITH $continuationCtes
         SELECT bt.doc_id AS id_a, bh.doc_id AS id_b, bt.tail AS bridge
         FROM bt JOIN bh ON bh.head = bt.tail AND bt.doc_id <> bh.doc_id""",
    "q180_continuation_hits" -> continuationHitsSql,
    "q181_dup_evidence" -> dupEvidenceSql,
    "q182_dup_mass_curve" -> dupMassCurveSql,
    // Tombstone read path: pairs over corpus MINUS the deleted ids —
    // equal to the full-index anti-join because bucket membership is
    // per-doc (removing a doc only removes its candidacy).
    "q183_lsh_tombstones" -> minhashPairsSqlWhere("NOT (doc_id % 7 = 0)"),
    // Fixed-quantizer append: centroids from the even half only,
    // assignment over the full (post-append) corpus.
    "q184_ivf_index_append" ->
      ivfKnnSql(centWhere = "vec_id % 2 = 0", assignWhere = "TRUE"),
    // IVF tombstones delete NEIGHBORS (assign rows), never probes.
    "q185_ivf_tombstones" ->
      ivfKnnSql(centWhere = "TRUE", assignWhere = "NOT (e.vec_id % 5 = 0)"),
    // Threshold sweep: one pair list at the loosest (still-exact)
    // threshold, cross-joined with the sweep points; thresholds with
    // zero qualifying pairs are absent on BOTH sides by construction.
    "q186_dedup_threshold_sweep" ->
      s"""WITH p AS MATERIALIZED (
           SELECT id_a, id_b, est_jaccard
           FROM (${minhashPairsSqlWhere("TRUE", 0.78125)})
         ), th(th) AS (
           VALUES (CAST(0.78125 AS DOUBLE)), (CAST(0.84375 AS DOUBLE)),
                  (CAST(0.90625 AS DOUBLE)), (CAST(0.96875 AS DOUBLE))
         ), sw AS (
           SELECT th AS threshold, id_a, id_b FROM th CROSS JOIN p
           WHERE est_jaccard >= th
         ), np AS (
           SELECT threshold, CAST(count(*) AS BIGINT) AS n_pairs
           FROM sw GROUP BY 1
         ), nd AS (
           SELECT threshold, CAST(count(DISTINCT id) AS BIGINT) AS n_docs
           FROM (SELECT threshold, id_a AS id FROM sw
                 UNION ALL SELECT threshold, id_b FROM sw)
           GROUP BY 1
         )
         SELECT threshold, n_pairs, n_docs FROM np JOIN nd USING (threshold)""",
    // Index freshness: index ids = past snapshot (<90 bucket) docs
    // with ≥3 tokens (nothing shorter ever enters an index); current
    // corpus = ≥10 bucket with the same token floor.
    "q189_index_staleness" ->
      """WITH ids AS (
           SELECT doc_id,
             CAST(CAST(list_sum(list_transform(range(8),
               j -> CAST(strpos('0123456789abcdef', substring(hx, CAST(j + 1 AS INT), 1)) - 1 AS BIGINT) << (4*(7 - CAST(j AS INT))))) AS BIGINT) % 100 AS INT) AS bucket,
             len(string_split(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')), ' ')) AS ntok
           FROM (SELECT doc_id, md5('graft:' || CAST(doc_id AS VARCHAR)) AS hx, text FROM documents)
         ), i AS (
           SELECT doc_id, 1 AS fi FROM ids WHERE bucket < 90 AND ntok >= 3
         ), c AS (
           SELECT doc_id, 1 AS fc FROM ids WHERE bucket >= 10 AND ntok >= 3
         )
         SELECT CAST(count(*) AS BIGINT) AS n_union,
           CAST(count(*) FILTER (WHERE fi IS NOT NULL AND fc IS NOT NULL) AS BIGINT) AS n_covered,
           CAST(count(*) FILTER (WHERE fi IS NULL) AS BIGINT) AS n_missing,
           CAST(count(*) FILTER (WHERE fc IS NULL) AS BIGINT) AS n_gone
         FROM i FULL JOIN c USING (doc_id)""",
    // Same-id replace lifecycle (LSH): from-scratch q19 pairs over the
    // REPLACED corpus (doc 7's text := doc 8's) — the engine's
    // tombstone→compact→append sequence must land exactly here.
    "q190_lsh_replace_lifecycle" ->
      minhashPairsSqlWhere("TRUE", docsFrom = "documents2",
        extraCtes = """documents2 AS (
           SELECT doc_id,
             CASE WHEN doc_id = 7
               THEN (SELECT text FROM documents WHERE doc_id = 8)
               ELSE text END AS text
           FROM documents)"""),
    // Capacity growth: re-bucketing changes only the physical layout,
    // so the oracle is q19's pair query verbatim.
    "q192_lsh_rebucket" -> minhashPairsSql,
    // Threshold migration: 32 bands of 2 keep the banded candidates
    // exact down to minJ > 0.5 by pigeonhole; the oracle is the q19
    // chain re-banded the same way, at the loosened 0.7 threshold.
    "q193_lsh_reband" -> minhashPairsSqlWhere("TRUE", minJ = 0.7,
      rowsPerBand = 2),
    // Re-quantized rebuild ≡ from-scratch 16-centroid build over the
    // union corpus, so the oracle is q39's query verbatim.
    "q194_ivf_retrain" -> ivfKnnSql(centWhere = "TRUE", assignWhere = "TRUE"),
    // Occupancy card: replay the stale-quantizer assignment (8
    // centroids from the even half, union corpus) and group on it; the
    // engine's cent_id is the 0-based index into the md5-ordered
    // centroid matrix, i.e. cpos - 1.
    "q195_ivf_occupancy" ->
      """WITH cent AS (
           SELECT row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS cpos,
                  CAST(embedding AS DOUBLE[]) AS ce
           FROM embeddings WHERE vec_id % 2 = 0
           ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 8
         ), assign AS (
           SELECT e.vec_id AS neighbor_id, cpos
           FROM embeddings e CROSS JOIN cent
           QUALIFY row_number() OVER (PARTITION BY e.vec_id
             ORDER BY list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), ce) DESC, cpos ASC) = 1
         )
         SELECT CAST(cpos - 1 AS INT) AS cent_id,
           CAST(count(*) AS BIGINT) AS n_vecs,
           CAST(count(*) FILTER (WHERE neighbor_id % 2 = 1) AS BIGINT) AS n_appended
         FROM assign GROUP BY cpos""",
    // Freshness card: q189's full-outer coverage counts over vector
    // ids (no token filter — IVF indexes every vector).
    "q196_ivf_freshness" ->
      """WITH ids AS (
           SELECT vec_id,
             CAST(CAST(list_sum(list_transform(range(8),
               j -> CAST(strpos('0123456789abcdef', substring(hx, CAST(j + 1 AS INT), 1)) - 1 AS BIGINT) << (4*(7 - CAST(j AS INT))))) AS BIGINT) % 100 AS INT) AS bucket
           FROM (SELECT vec_id, md5('graft:' || CAST(vec_id AS VARCHAR)) AS hx FROM embeddings)
         ), i AS (
           SELECT vec_id, 1 AS fi FROM ids WHERE bucket < 90
         ), c AS (
           SELECT vec_id, 1 AS fc FROM ids WHERE bucket >= 10
         )
         SELECT CAST(count(*) AS BIGINT) AS n_union,
           CAST(count(*) FILTER (WHERE fi IS NOT NULL AND fc IS NOT NULL) AS BIGINT) AS n_covered,
           CAST(count(*) FILTER (WHERE fi IS NULL) AS BIGINT) AS n_missing,
           CAST(count(*) FILTER (WHERE fc IS NULL) AS BIGINT) AS n_gone
         FROM i FULL JOIN c USING (vec_id)""",
    // Real-codec image round-trip: gray PNG is lossless and the resize
    // is integer NN on the decoded grid, so the 4x4 output pixels are
    // the codepoints at source index (y*2)*8 + (x*2) — i.e. flat index
    // (i//4)*16 + (i%4)*2. ASCII enforced structurally on both sides.
    "q197_image_codec_roundtrip" ->
      """WITH m AS (
           SELECT doc_id AS id,
             list_transform(range(16), i ->
               ord(substr(text, CAST((i // 4) * 16 + (i % 4) * 2 + 1 AS INT), 1))) AS px
           FROM documents
           WHERE strlen(text) = len(text) AND len(text) >= 64
         )
         SELECT id, 4 AS width, 4 AS height, 16 AS n_px,
           CAST(list_sum(px) AS BIGINT) AS px_sum,
           CAST(list_min(px) AS INT) AS px_min,
           CAST(list_max(px) AS INT) AS px_max
         FROM m""",
    // Real-codec WAV round-trip: PCM is verbatim in the container, so
    // sample i is exactly (codepoint_i - 64) * 256; a zero crossing is
    // a strict sign flip between consecutive samples.
    "q198_wav_codec_roundtrip" ->
      """WITH m AS (
           SELECT doc_id AS id,
             list_transform(range(32), i ->
               (ord(substr(text, CAST(i + 1 AS INT), 1)) - 64) * 256) AS s
           FROM documents
           WHERE strlen(text) = len(text) AND len(text) >= 32
         )
         SELECT id, 8000 AS sample_rate, 32 AS n_samples,
           CAST(list_sum(s) AS BIGINT) AS pcm_sum,
           CAST(list_sum(list_transform(s, v -> abs(v))) AS BIGINT) AS pcm_abs_sum,
           CAST(list_max(list_transform(s, v -> abs(v))) AS INT) AS peak_abs,
           CAST(list_sum(list_transform(range(31), i ->
             CASE WHEN s[CAST(i + 1 AS INT)] * s[CAST(i + 2 AS INT)] < 0 THEN 1 ELSE 0 END)) AS BIGINT)
             AS zero_crossings
         FROM m""",
    // Integrity card: the planted corruption is structural (truncated
    // container), so the oracle counts it without decoding anything.
    "q199_media_integrity_card" ->
      """WITH m AS (
           SELECT doc_id FROM documents
           WHERE strlen(text) = len(text) AND len(text) >= 64
         )
         SELECT CAST(count(*) AS BIGINT) AS n_total,
           CAST(count(*) FILTER (WHERE doc_id % 7 <> 0) AS BIGINT) AS n_ok,
           CAST(count(*) FILTER (WHERE doc_id % 7 = 0) AS BIGINT) AS n_corrupt
         FROM m""",
    // Event-time temporal join: the batch AS-OF semantics the streaming
    // replay must equal — for each purchase, the latest view version
    // at-or-before its event time per user (ties within a (user, ts)
    // version collapsed to max event_id on BOTH sides).
    // Streaming near-dup gate: the q19 pairs crossing the 80/20
    // md5-bucket split, oriented corpus→stream (q188's orientation
    // machinery with the stream side as "eval").
    "q201_stream_neardup_gate" ->
      s"""WITH p AS (
           SELECT id_a, id_b, est_jaccard FROM ($minhashPairsSql)
         ), b AS (
           SELECT doc_id,
             CAST(CAST(list_sum(list_transform(range(8),
               j -> CAST(strpos('0123456789abcdef', substring(hx, CAST(j + 1 AS INT), 1)) - 1 AS BIGINT) << (4*(7 - CAST(j AS INT))))) AS BIGINT) % 100 AS INT) < 80 AS is_corpus
           FROM (SELECT doc_id, md5('graft:' || CAST(doc_id AS VARCHAR)) AS hx FROM documents)
         )
         SELECT CASE WHEN ba.is_corpus THEN id_b ELSE id_a END AS doc_id,
                CASE WHEN ba.is_corpus THEN id_a ELSE id_b END AS corpus_id,
                est_jaccard
         FROM p
         JOIN b ba ON ba.doc_id = id_a
         JOIN b bb ON bb.doc_id = id_b
         WHERE ba.is_corpus <> bb.is_corpus""",
    // Statement-runner streaming upsert: the final materialized state
    // must equal batch latest-per-key — q05's SQL with the runner's
    // target column names.
    "q202_stream_upsert_runner" ->
      """SELECT user_id, event_id AS last_event_id, event_type AS last_event_type,
         value AS last_value, epoch_us(ts) AS ts_us
         FROM (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
               FROM events) WHERE rn = 1""",
    // Checkpointed-restart replay: the runner is killed after epoch 2
    // and a new one resumes from the checkpoints — the final upsert
    // state must STILL equal the uninterrupted latest-per-key oracle
    // (same SQL as q202; the restart must be invisible in the output).
    "q224_stream_restart_runner" ->
      """SELECT user_id, event_id AS last_event_id, event_type AS last_event_type,
         value AS last_value, epoch_us(ts) AS ts_us
         FROM (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
               FROM events) WHERE rn = 1""",
    // Chained table-to-table INSERT: statement B consumes statement A's
    // changelog (the runner promotes A's table to a stream of its
    // topic), so B's append table holds ONE record per (epoch, user) —
    // the per-quartile-epoch folded max-(ts, event_id) row, whose
    // integer epoch boundaries the oracle re-derives. ep is only a
    // partition key (never output), so its // arithmetic carries no
    // HUGEINT risk; both division operands are non-negative.
    "q225_stream_chained_insert" ->
      """WITH b AS (SELECT min(epoch_us(ts)) AS lo, max(epoch_us(ts)) AS hi FROM events),
         e AS (SELECT user_id, event_id, event_type, value, epoch_us(ts) AS ts_us,
                 (epoch_us(ts) - b.lo) // GREATEST(1, (b.hi - b.lo) // 4 + 1) AS ep
               FROM events, b),
         f AS (SELECT *, row_number() OVER (
                 PARTITION BY ep, user_id ORDER BY ts_us DESC, event_id DESC) AS rn
               FROM e)
         SELECT user_id, event_id AS last_event_id, event_type AS last_event_type,
                value AS last_value, ts_us
         FROM f WHERE rn = 1""",
    // Promoted-append aggregate: a continuous GROUP BY over an append
    // table's promoted changelog revises per-key counts in update mode
    // and must land on the plain batch aggregate.
    "q226_stream_promoted_agg" ->
      """SELECT user_id, CAST(count(*) AS BIGINT) AS n_events
         FROM events WHERE user_id % 4 = 0 GROUP BY user_id""",
    // Retraction-aware aggregate over an UPSERT changelog driver: each
    // per-epoch revision retracts the user's prior contribution and
    // adds the new one, so the final continuous-aggregate state equals
    // the batch aggregate over latest-per-key — NOT over revisions.
    "q227_stream_retract_agg_upsert" ->
      """WITH latest AS (
           SELECT user_id, event_type, value
           FROM (SELECT *, row_number() OVER (PARTITION BY user_id
                   ORDER BY ts DESC, event_id DESC) AS rn
                 FROM events) WHERE rn = 1)
         SELECT event_type, CAST(count(*) AS BIGINT) AS n_users,
                CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
         FROM latest GROUP BY event_type""",
    // Retract-mode topic consumed by a chained aggregate: explicit
    // -U/+U revision pairs flow through and fold, so the final state
    // equals the batch aggregate over each user's last revision.
    "q228_stream_retract_consume" ->
      """WITH latest AS (
           SELECT user_id, event_type, value
           FROM (SELECT *, row_number() OVER (PARTITION BY user_id
                   ORDER BY ts DESC, event_id DESC) AS rn
                 FROM events WHERE user_id % 4 = 0) WHERE rn = 1)
         SELECT event_type, CAST(count(*) AS BIGINT) AS n_rows,
                CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
         FROM latest GROUP BY event_type""",
    // Merge-on-write aggregate over a snapshot join: per-epoch signed
    // deltas cross the stream-dim join and merge onto the target's
    // prior state — final state equals the batch join + aggregate.
    "q229_stream_merge_join_agg" ->
      """SELECT c.c_mktsegment AS segment, CAST(count(*) AS BIGINT) AS n_events,
         CAST(sum(CAST(e.value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
         FROM events e JOIN customer c ON e.user_id = c.c_custkey
         WHERE e.user_id % 4 = 0
         GROUP BY 1""",
    // Merge aggregate over a promoted UPSERT driver + dim join: each
    // revision retracts its prior contribution from the joined group —
    // final state equals batch latest-per-key ⋈ dim ⋈ aggregate.
    "q230_stream_merge_upsert_join_agg" ->
      """WITH latest AS (
           SELECT user_id, value
           FROM (SELECT *, row_number() OVER (PARTITION BY user_id
                   ORDER BY ts DESC, event_id DESC) AS rn
                 FROM events WHERE user_id % 4 = 0) WHERE rn = 1)
         SELECT c.c_mktsegment AS segment, CAST(count(*) AS BIGINT) AS n_users,
                CAST(sum(CAST(l.value AS DECIMAL(18,4))) AS DOUBLE) AS sum_last
         FROM latest l JOIN customer c ON l.user_id = c.c_custkey
         GROUP BY 1""",
    // Retractable min/max + exact DISTINCT over an upsert changelog
    // driver: per-(group, value) multiset folding — final state equals
    // the batch aggregate over latest-per-key.
    "q231_stream_retract_minmax_distinct" ->
      """WITH latest AS (
           SELECT user_id, event_type, value
           FROM (SELECT *, row_number() OVER (PARTITION BY user_id
                   ORDER BY ts DESC, event_id DESC) AS rn
                 FROM events WHERE user_id % 4 = 0) WHERE rn = 1)
         SELECT event_type, CAST(count(*) AS BIGINT) AS n_users,
                min(value) AS min_value, max(value) AS max_value,
                CAST(count(DISTINCT user_id % 16) AS BIGINT) AS n_buckets
         FROM latest GROUP BY event_type""",
    // HAVING over a retract-folded continuous aggregate: groups enter
    // and leave the predicate as revisions fold; final state equals
    // the batch latest-per-key aggregate under the same HAVING.
    "q232_stream_retract_agg_having" ->
      """WITH latest AS (
           SELECT user_id, event_type, value
           FROM (SELECT *, row_number() OVER (PARTITION BY user_id
                   ORDER BY ts DESC, event_id DESC) AS rn
                 FROM events) WHERE rn = 1)
         SELECT event_type, CAST(count(*) AS BIGINT) AS n_users,
                CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
         FROM latest GROUP BY event_type
         HAVING count(*) % 2 = 0""",
    // Multi-level continuous aggregate: level 1 merge-aggregates (max +
    // HAVING) into an upsert table; level 2 retract-folds over its
    // changelog. Final state = the batch two-level aggregate over
    // latest-per-key, HAVING applied at level 1.
    "q233_stream_multilevel_agg" ->
      """WITH latest AS (
           SELECT user_id, event_type, value
           FROM (SELECT *, row_number() OVER (PARTITION BY user_id
                   ORDER BY ts DESC, event_id DESC) AS rn
                 FROM events WHERE user_id % 4 = 0) WHERE rn = 1),
         l1 AS (
           SELECT event_type, count(*) AS n_users, max(value) AS max_value
           FROM latest GROUP BY event_type
           HAVING count(*) % 2 = 0)
         SELECT CAST(n_users % 3 AS BIGINT) AS bucket,
                CAST(count(*) AS BIGINT) AS n_types,
                CAST(sum(CAST(max_value AS DECIMAL(18,4))) AS DOUBLE) AS sum_max
         FROM l1 GROUP BY 1""",
    // Argmax/argmin + multi-column DISTINCT over an upsert changelog
    // driver: (order, value) multisets retract the moved holder;
    // user_id order keys make the argmax deterministic. Final state =
    // the batch latest-per-key aggregate.
    "q234_stream_argmax_distinct" ->
      """WITH latest AS (
           SELECT user_id, event_type, value
           FROM (SELECT *, row_number() OVER (PARTITION BY user_id
                   ORDER BY ts DESC, event_id DESC) AS rn
                 FROM events WHERE user_id % 4 = 0) WHERE rn = 1)
         SELECT event_type, CAST(count(*) AS BIGINT) AS n_users,
                arg_max(value, user_id) AS top_value,
                arg_min(value, user_id) AS bot_value,
                CAST(count(DISTINCT (user_id % 8, user_id % 3)) AS BIGINT) AS n_pairs
         FROM latest GROUP BY event_type""",
    // Variance family + bool_and/bool_or + retractable listagg over an
    // upsert changelog driver: variance mirrors the engine's
    // exact-decimal-moment closed form OP FOR OP (greatest clamp, the
    // same cast/divide order, round 6 — the iterative-float rule);
    // bool/listagg are exact. All over batch latest-per-key.
    "q235_stream_variance_bool_listagg" ->
      """WITH latest AS (
           SELECT user_id, event_type, value
           FROM (SELECT *, row_number() OVER (PARTITION BY user_id
                   ORDER BY ts DESC, event_id DESC) AS rn
                 FROM events WHERE user_id % 4 = 0) WHERE rn = 1),
         m AS (
           SELECT event_type,
                  CAST(count(*) AS BIGINT) AS n_users,
                  count(value) AS cnt,
                  sum(CAST(value AS DECIMAL(18,4))) AS s1,
                  sum(CAST(value AS DECIMAL(18,4)) * CAST(value AS DECIMAL(18,4))) AS s2,
                  sum(CAST(user_id AS DECIMAL(18,0))) AS su,
                  sum(CAST(user_id AS DECIMAL(18,0)) * CAST(user_id AS DECIMAL(18,0))) AS suu,
                  sum(CAST(value AS DECIMAL(18,4)) * CAST(user_id AS DECIMAL(18,0))) AS sxu,
                  CAST(sum(CASE WHEN value > 100.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_big,
                  bool_and(value < 300.0) AS all_small,
                  bool_or(value > 300.0) AS any_big
           FROM latest GROUP BY event_type),
         b AS (
           SELECT DISTINCT event_type, CAST(user_id % 5 AS VARCHAR) AS bkt
           FROM latest),
         bs AS (
           SELECT event_type, string_agg(bkt, ',' ORDER BY bkt) AS buckets
           FROM b GROUP BY event_type),
         f AS (
           SELECT event_type, n_users, cnt, n_big, all_small, any_big,
                  greatest(CAST(s2 AS DOUBLE) -
                      (CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)) / CAST(cnt AS DOUBLE),
                      CAST(0 AS DOUBLE)) AS m2x,
                  greatest(CAST(suu AS DOUBLE) -
                      (CAST(su AS DOUBLE) * CAST(su AS DOUBLE)) / CAST(cnt AS DOUBLE),
                      CAST(0 AS DOUBLE)) AS m2u,
                  CAST(sxu AS DOUBLE) -
                    (CAST(s1 AS DOUBLE) * CAST(su AS DOUBLE)) / CAST(cnt AS DOUBLE) AS c2
           FROM m)
         SELECT f.event_type, f.n_users,
                CASE WHEN cnt <= 1 THEN NULL ELSE
                  round(m2x / (CAST(cnt AS DOUBLE) - CAST(1 AS DOUBLE)), 6) END AS var_s,
                CASE WHEN cnt <= 0 THEN NULL ELSE
                  round(sqrt(m2x / CAST(cnt AS DOUBLE)), 6) END AS std_p,
                CASE WHEN cnt <= 1 THEN NULL ELSE
                  round(c2 / (CAST(cnt AS DOUBLE) - CAST(1 AS DOUBLE)), 6) END AS cov_vu,
                CASE WHEN cnt <= 0 OR sqrt(m2x * m2u) <= CAST(0 AS DOUBLE) THEN NULL ELSE
                  round(c2 / sqrt(m2x * m2u), 6) END AS corr_vu,
                n_big, all_small, any_big, bs.buckets
         FROM f JOIN bs ON f.event_type = bs.event_type""",
    // Flink regular join into a retract target: dim revisions retract
    // and re-emit previously-joined rows, so the folded net state is
    // the batch join of ALL facts against FINAL dim state — the
    // per-epoch dim slices collapse to the global latest per user.
    "q236_stream_regular_join" ->
      """WITH latest AS (
           SELECT user_id, event_type
           FROM (SELECT *, row_number() OVER (PARTITION BY user_id
                   ORDER BY ts DESC, event_id DESC) AS rn
                 FROM events WHERE user_id % 4 = 0) WHERE rn = 1)
         SELECT e.event_id, e.user_id, l.event_type AS last_event_type, e.value
         FROM events e JOIN latest l ON e.user_id = l.user_id
         WHERE e.user_id % 4 = 0""",
    // Retractable collect over the latest-per-user changelog: the live
    // multiset as value-sorted joined strings (set = distinct values,
    // list = every live copy).
    "q237_stream_collect_agg" ->
      """WITH latest AS (
           SELECT user_id, event_type
           FROM (SELECT *, row_number() OVER (PARTITION BY user_id
                   ORDER BY ts DESC, event_id DESC) AS rn
                 FROM events WHERE user_id % 4 = 0) WHERE rn = 1)
         SELECT CAST(user_id % 41 AS BIGINT) AS bucket,
                CAST(count(*) AS BIGINT) AS n_users,
                string_agg(DISTINCT event_type, ',' ORDER BY event_type) AS types,
                string_agg(CAST(user_id % 7 AS VARCHAR), ','
                  ORDER BY CAST(user_id % 7 AS VARCHAR)) AS septets
         FROM latest GROUP BY CAST(user_id % 41 AS BIGINT)""",
    // Three-level continuous aggregate chain: merge-agg → retract-fold
    // → retract-fold must equal the batch three-level aggregate over
    // final latest-per-user state (integer-only above level 2).
    "q238_stream_three_level_agg" ->
      """WITH latest AS (
           SELECT user_id, event_type
           FROM (SELECT *, row_number() OVER (PARTITION BY user_id
                   ORDER BY ts DESC, event_id DESC) AS rn
                 FROM events WHERE user_id % 4 = 0) WHERE rn = 1),
         lvl1 AS (
           SELECT event_type, CAST(count(*) AS BIGINT) AS n_users
           FROM latest GROUP BY event_type),
         lvl2 AS (
           SELECT CAST(n_users % 3 AS BIGINT) AS bucket,
                  CAST(count(*) AS BIGINT) AS n_types,
                  CAST(sum(n_users) AS BIGINT) AS sum_users
           FROM lvl1 GROUP BY CAST(n_users % 3 AS BIGINT))
         SELECT CAST(n_types % 2 AS BIGINT) AS par,
                CAST(count(*) AS BIGINT) AS n_buckets,
                CAST(sum(sum_users) AS BIGINT) AS total
         FROM lvl2 GROUP BY CAST(n_types % 2 AS BIGINT)""",
    // TUMBLE TVF through the multiset merge path: hourly windows over
    // the latest-per-user state, max retraction-aware as a
    // (window, value) multiset — equals the batch hourly aggregate.
    "q239_stream_tumble_multiset" ->
      """WITH latest AS (
           SELECT user_id, ts, value
           FROM (SELECT *, row_number() OVER (PARTITION BY user_id
                   ORDER BY ts DESC, event_id DESC) AS rn
                 FROM events WHERE user_id % 4 = 0) WHERE rn = 1)
         SELECT epoch_us(date_trunc('hour', ts)) AS window_start_us,
                CAST(count(*) AS BIGINT) AS n_users,
                max(value) AS max_value
         FROM latest GROUP BY 1""",
    // Left-outer regular join: pads retract when a match appears; the
    // folded net state is the batch LEFT JOIN of all facts against
    // final dim state (dims exist only for user_id % 8 = 0).
    "q240_stream_left_outer_join" ->
      """WITH latest AS (
           SELECT user_id, event_type
           FROM (SELECT *, row_number() OVER (PARTITION BY user_id
                   ORDER BY ts DESC, event_id DESC) AS rn
                 FROM events WHERE user_id % 8 = 0) WHERE rn = 1)
         SELECT e.event_id, e.user_id, l.event_type AS last_event_type, e.value
         FROM events e LEFT JOIN latest l ON e.user_id = l.user_id
         WHERE e.user_id % 4 = 0""",
    // Full-outer regular join: both sides pad (facts of never-dimmed
    // users left; dims of factless user_id % 8 = 1 users right); the
    // folded net state equals the batch FULL JOIN over final inputs.
    "q241_stream_full_outer_join" ->
      """WITH latest AS (
           SELECT user_id, event_type
           FROM (SELECT *, row_number() OVER (PARTITION BY user_id
                   ORDER BY ts DESC, event_id DESC) AS rn
                 FROM events WHERE user_id % 8 IN (0, 1)) WHERE rn = 1),
         ev AS (
           SELECT event_id, user_id, value FROM events WHERE user_id % 4 = 0)
         SELECT e.event_id, e.user_id AS fact_user, l.user_id AS dim_user,
                l.event_type AS last_event_type, e.value
         FROM ev e FULL JOIN latest l ON e.user_id = l.user_id""",
    // Regular join → continuous aggregate chain: re-emissions move
    // aggregate contributions between groups, so the final stats equal
    // the batch join-then-aggregate over final dim state.
    "q242_stream_join_agg_chain" ->
      """WITH latest AS (
           SELECT user_id, event_type
           FROM (SELECT *, row_number() OVER (PARTITION BY user_id
                   ORDER BY ts DESC, event_id DESC) AS rn
                 FROM events WHERE user_id % 4 = 0) WHERE rn = 1)
         SELECT l.event_type AS last_event_type,
                CAST(count(*) AS BIGINT) AS n_rows,
                CAST(sum(CAST(e.value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
         FROM events e JOIN latest l ON e.user_id = l.user_id
         WHERE e.user_id % 4 = 0
         GROUP BY l.event_type""",
    // Streaming decontamination vs a revisable blocklist: block →
    // retract already-kept rows, unblock → re-admit; the folded net
    // state equals NOT EXISTS against the FINAL blocklist (% 16 = 4:
    // blocked in epoch 3 and never unblocked; % 16 = 0 was unblocked).
    "q243_stream_blocklist_decontam" ->
      """SELECT event_id, user_id, value FROM events
         WHERE user_id % 4 = 0 AND user_id % 16 <> 4""",
    // Exact percentile over the latest-per-user changelog: integer
    // values + dyadic percentages make every interpolation step
    // exactly representable, so Spark's weighted Percentile and
    // DuckDB's quantile_cont agree bit-for-bit.
    "q244_stream_exact_percentile" ->
      """WITH latest AS (
           SELECT user_id, event_type
           FROM (SELECT *, row_number() OVER (PARTITION BY user_id
                   ORDER BY ts DESC, event_id DESC) AS rn
                 FROM events WHERE user_id % 4 = 0) WHERE rn = 1)
         SELECT event_type, CAST(count(*) AS BIGINT) AS n_users,
                quantile_cont(CAST(user_id % 97 AS DOUBLE), 0.25) AS p25,
                quantile_cont(CAST(user_id % 97 AS DOUBLE), 0.5) AS p50,
                quantile_cont(CAST(user_id % 97 AS DOUBLE), 0.75) AS p75,
                median(CAST(user_id % 97 AS DOUBLE)) AS med
         FROM latest GROUP BY event_type""",
    // Exact percentile_disc over the latest-per-user changelog: the
    // oracle states the discrete pick RULE explicitly — value at
    // 1-based sorted position max(1, ceil(m·N/1e6)) computed in
    // integer arithmetic — mirroring the engine bit-for-bit instead
    // of trusting DuckDB's quantile_disc pick convention.
    "q246_stream_percentile_disc" ->
      """WITH latest AS (
           SELECT user_id, event_type
           FROM (SELECT *, row_number() OVER (PARTITION BY user_id
                   ORDER BY ts DESC, event_id DESC) AS rn
                 FROM events WHERE user_id % 4 = 0) WHERE rn = 1),
         ranked AS (
           SELECT event_type, CAST(user_id % 97 AS DOUBLE) AS v,
                  row_number() OVER (PARTITION BY event_type
                    ORDER BY CAST(user_id % 97 AS DOUBLE)) AS rn,
                  row_number() OVER (PARTITION BY event_type
                    ORDER BY CAST(user_id % 97 AS DOUBLE) DESC) AS rnd,
                  count(*) OVER (PARTITION BY event_type) AS n
           FROM latest)
         SELECT event_type, CAST(max(n) AS BIGINT) AS n_users,
                max(CASE WHEN rn = greatest((500000 * n + 999999) // 1000000, 1)
                    THEN v END) AS d50,
                max(CASE WHEN rn = greatest((250000 * n + 999999) // 1000000, 1)
                    THEN v END) AS d25,
                max(CASE WHEN rnd = greatest((500000 * n + 999999) // 1000000, 1)
                    THEN v END) AS d50r
         FROM ranked GROUP BY event_type""",
    // Chained LEFT OUTER regular join: the folded net state equals the
    // batch fact LEFT JOIN dim1 LEFT JOIN dim2 over FINAL dim states.
    // dim1 = per-user latest type among user%8=0 (others pad level 1);
    // dim2 = per-type label 'L'+last-epoch-seen, keyed on DIM1'S OUTPUT
    // and excluding 'click' (click-latest users pad level 2). The
    // epoch index mirrors the gate's integer slicing exactly.
    "q245_stream_chained_left_join" ->
      """WITH ev45 AS (
           SELECT event_id, user_id, event_type, value, epoch_us(ts) AS ts_us
           FROM events WHERE user_id % 4 = 0),
         bounds45 AS (
           SELECT min(ts_us) AS lo, (max(ts_us) - min(ts_us)) // 4 + 1 AS w
           FROM ev45),
         eve45 AS (
           SELECT e.*, CAST((e.ts_us - b.lo) // b.w AS BIGINT) AS ep
           FROM ev45 e CROSS JOIN bounds45 b),
         latest45 AS (
           SELECT user_id, event_type
           FROM (SELECT *, row_number() OVER (PARTITION BY user_id
                   ORDER BY ts_us DESC, event_id DESC) AS rn
                 FROM eve45 WHERE user_id % 8 = 0) WHERE rn = 1),
         bands45 AS (
           SELECT event_type, 'L' || CAST(max(ep) AS VARCHAR) AS label
           FROM eve45 WHERE event_type <> 'click' GROUP BY event_type)
         SELECT e.event_id, e.user_id, l.event_type AS last_event_type,
                b.label AS band_label, e.value
         FROM eve45 e
         LEFT JOIN latest45 l ON e.user_id = l.user_id
         LEFT JOIN bands45 b ON l.event_type = b.event_type""",
    // Array-of-percentages exact percentile (round 18): q244's
    // latest-per-user discipline with the quartiles computed as one
    // LIST aggregate (dyadic ps + small-integer values interpolate
    // exactly in binary on both engines — no rounding needed). The
    // output unpacks the list into scalar q25/q50/q75 columns (DuckDB
    // lists are 1-indexed): the driver's pandas compare cannot sort a
    // top-level array column (round-18 red row).
    "q248_stream_percentile_array" ->
      """WITH latest AS (
           SELECT user_id, event_type
           FROM (SELECT *, row_number() OVER (PARTITION BY user_id
                   ORDER BY ts DESC, event_id DESC) AS rn
                 FROM events WHERE user_id % 4 = 0) WHERE rn = 1),
         agg48 AS (
           SELECT event_type, CAST(count(*) AS BIGINT) AS n_users,
                  quantile_cont(CAST(user_id % 97 AS DOUBLE),
                                [0.25, 0.5, 0.75]) AS qs,
                  quantile_cont(CAST(user_id % 97 AS DOUBLE), 0.5) AS med
           FROM latest GROUP BY event_type)
         SELECT event_type, n_users, qs[1] AS q25, qs[2] AS q50,
                qs[3] AS q75, med
         FROM agg48""",
    // Multi-column count(DISTINCT a, b) over the latest-per-user upsert
    // state (round 19): the pair (user_id % 16, event_id % 8) encodes
    // bijectively as a*8+b (b < 8, both non-negative), so a
    // single-column DISTINCT count here equals the engine's true
    // struct-keyed multi-column form while keeping the output flat.
    "q252_stream_multicol_distinct" ->
      """WITH latest AS (
           SELECT user_id, event_id, event_type
           FROM (SELECT *, row_number() OVER (PARTITION BY user_id
                   ORDER BY ts DESC, event_id DESC) AS rn
                 FROM events WHERE user_id % 4 = 0) WHERE rn = 1)
         SELECT event_type, CAST(count(*) AS BIGINT) AS n_users,
                CAST(count(DISTINCT (user_id % 16) * 8 + (event_id % 8))
                     AS BIGINT) AS n_pairs
         FROM latest GROUP BY event_type""",
    // Multi-use CTE self-join regular join (round 18): the folded net
    // state equals the batch same-user event-pair join (eid1 < eid2)
    // against the FINAL dim label 'L'+lastEpochSeen, over the user%8=0
    // slice. The epoch index mirrors the gate's integer slicing.
    "q249_stream_cte_selfjoin" ->
      """WITH ev49 AS (
           SELECT event_id, user_id, epoch_us(ts) AS ts_us
           FROM events WHERE user_id % 8 = 0),
         bounds49 AS (
           SELECT min(ts_us) AS lo, (max(ts_us) - min(ts_us)) // 3 + 1 AS w
           FROM (SELECT epoch_us(ts) AS ts_us FROM events WHERE user_id % 4 = 0)),
         eve49 AS (
           SELECT e.*, CAST((e.ts_us - b.lo) // b.w AS BIGINT) AS ep
           FROM ev49 e CROSS JOIN bounds49 b),
         dim49 AS (
           SELECT user_id, 'L' || CAST(max(ep) AS VARCHAR) AS label
           FROM eve49 GROUP BY user_id)
         SELECT a.event_id AS eid1, b.event_id AS eid2, a.user_id, d.label
         FROM eve49 a
         JOIN eve49 b ON a.user_id = b.user_id AND a.event_id < b.event_id
         JOIN dim49 d ON a.user_id = d.user_id""",
    // Bushy (non-left-deep) regular join (round 18): the folded net
    // state equals the batch fact LEFT (dim INNER band) over FINAL
    // dim states — a fact pads when its user has no dim row OR its
    // latest type has no band (the INNER inside the operand).
    "q251_stream_bushy_join" ->
      """WITH ev51 AS (
           SELECT event_id, user_id, event_type, value, epoch_us(ts) AS ts_us
           FROM events WHERE user_id % 4 = 0),
         bounds51 AS (
           SELECT min(ts_us) AS lo, (max(ts_us) - min(ts_us)) // 3 + 1 AS w
           FROM ev51),
         eve51 AS (
           SELECT e.*, CAST((e.ts_us - b.lo) // b.w AS BIGINT) AS ep
           FROM ev51 e CROSS JOIN bounds51 b),
         latest51 AS (
           SELECT user_id, event_type
           FROM (SELECT *, row_number() OVER (PARTITION BY user_id
                   ORDER BY ts_us DESC, event_id DESC) AS rn
                 FROM eve51 WHERE user_id % 8 = 0) WHERE rn = 1),
         bands51 AS (
           SELECT event_type,
                  'L' || CAST(max(ep) AS VARCHAR) || '_' || event_type AS label
           FROM eve51 WHERE event_type <> 'click' GROUP BY event_type),
         lookup51 AS (
           SELECT l.user_id, l.event_type, b.label
           FROM latest51 l JOIN bands51 b ON l.event_type = b.event_type)
         SELECT e.event_id, e.user_id, cb.event_type AS last_event_type,
                cb.label AS band_label, e.value
         FROM eve51 e
         LEFT JOIN lookup51 cb ON e.user_id = cb.user_id""",
    // Doubly-null-dominated regular join (round 18, the multi-node
    // bracket): the folded net state equals the batch
    // fact LEFT dim1 RIGHT band over FINAL dim states — q247's data
    // recipe with the RIGHT node preserving only bands (facts whose
    // latest type has no band, or whose user has no dim row, DROP).
    "q250_stream_doubly_dominated_join" ->
      """WITH ev50 AS (
           SELECT event_id, user_id, event_type, value, epoch_us(ts) AS ts_us
           FROM events WHERE user_id % 4 = 0),
         bounds50 AS (
           SELECT min(ts_us) AS lo, (max(ts_us) - min(ts_us)) // 3 + 1 AS w
           FROM ev50),
         eve50 AS (
           SELECT e.*, CAST((e.ts_us - b.lo) // b.w AS BIGINT) AS ep
           FROM ev50 e CROSS JOIN bounds50 b),
         latest50 AS (
           SELECT user_id, event_type
           FROM (SELECT *, row_number() OVER (PARTITION BY user_id
                   ORDER BY ts_us DESC, event_id DESC) AS rn
                 FROM eve50 WHERE user_id % 8 = 0) WHERE rn = 1),
         bands50 AS (
           SELECT event_type,
                  'L' || CAST(max(ep) AS VARCHAR) || '_' || event_type AS label
           FROM eve50 WHERE event_type <> 'click' GROUP BY event_type)
         SELECT e.event_id, e.user_id, l.event_type AS last_event_type,
                b.label AS band_label, e.value
         FROM eve50 e
         LEFT JOIN latest50 l ON e.user_id = l.user_id
         RIGHT JOIN bands50 b ON l.event_type = b.event_type""",
    // Mid-chain FULL OUTER regular join (round 18): the folded net
    // state equals the batch fact INNER dim1 FULL dim2 over FINAL dim
    // states. dim1 = per-user latest type among user%8=0 (INNER gates
    // other users out entirely); dim2 = per-type label
    // 'L'+lastEpochSeen+'_'+type (unique per type so right-pad rows
    // stay net-1), keyed on DIM1'S OUTPUT and excluding 'click'
    // ('click'-latest users left-pad; never-latest band types
    // right-pad with the whole left side null).
    "q247_stream_midchain_full_join" ->
      """WITH ev47 AS (
           SELECT event_id, user_id, event_type, value, epoch_us(ts) AS ts_us
           FROM events WHERE user_id % 4 = 0),
         bounds47 AS (
           SELECT min(ts_us) AS lo, (max(ts_us) - min(ts_us)) // 3 + 1 AS w
           FROM ev47),
         eve47 AS (
           SELECT e.*, CAST((e.ts_us - b.lo) // b.w AS BIGINT) AS ep
           FROM ev47 e CROSS JOIN bounds47 b),
         latest47 AS (
           SELECT user_id, event_type
           FROM (SELECT *, row_number() OVER (PARTITION BY user_id
                   ORDER BY ts_us DESC, event_id DESC) AS rn
                 FROM eve47 WHERE user_id % 8 = 0) WHERE rn = 1),
         bands47 AS (
           SELECT event_type,
                  'L' || CAST(max(ep) AS VARCHAR) || '_' || event_type AS label
           FROM eve47 WHERE event_type <> 'click' GROUP BY event_type)
         SELECT e.event_id, e.user_id, l.event_type AS last_event_type,
                b.label AS band_label, e.value
         FROM eve47 e
         JOIN latest47 l ON e.user_id = l.user_id
         FULL JOIN bands47 b ON l.event_type = b.event_type""",
    // Streaming tumble replay: append-mode windowed aggregation over a
    // watermarked stream must equal the batch tumble — q07's SQL.
    "q203_stream_tumble_replay" ->
      """SELECT epoch_us(date_trunc('hour', ts)) AS window_start_us, event_type,
         count(*) AS n_events,
         CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
         FROM events GROUP BY 1, 2""",
    // Stream-stream interval join replay: inner matches are
    // emission-complete once both sides drain — q11's batch SQL.
    "q204_stream_interval_join" ->
      """SELECT p.event_id AS purchase_id, c.event_id AS click_id, p.user_id
         FROM events p JOIN events c
           ON p.user_id = c.user_id
          AND p.event_type = 'purchase' AND c.event_type = 'click'
          AND c.ts >= p.ts - INTERVAL 1 HOUR AND c.ts <= p.ts""",
    // Streaming session replay: watermark-closed merged sessions must
    // equal the batch gap sessionization — q09's SQL.
    "q205_stream_session_replay" ->
      """WITH marked AS (
           SELECT user_id, ts, value,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_sess
           FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)
         ), numbered AS (
           SELECT *, sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_id
           FROM marked
         )
         SELECT user_id, epoch_us(min(ts)) AS session_start_us,
           epoch_us(max(ts) + INTERVAL 30 MINUTE) AS session_end_us,
           count(*) AS n_events,
           CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
         FROM numbered GROUP BY user_id, sess_id""",
    // Streaming retract-net replay: the final update-mode state must
    // equal the batch changelog fold — q13's SQL.
    "q206_stream_retract_net" ->
      """SELECT user_id,
         CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE -1 END) AS BIGINT) AS net_count,
         CAST(sum((CASE WHEN event_type = 'click' THEN 1 ELSE -1 END) * CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS net_value
         FROM events WHERE event_type IN ('click', 'error')
         GROUP BY user_id
         HAVING sum(CASE WHEN event_type = 'click' THEN 1 ELSE -1 END) <> 0""",
    // Processing-time temporal join on an event-time-ordered replay ==
    // the event-time answer — q200's AS-OF SQL.
    "q207_stream_proctime_temporal" ->
      """WITH v AS (
           SELECT user_id, epoch_us(ts) AS ts_us, max(event_id) AS view_id
           FROM events WHERE event_type = 'view' GROUP BY 1, 2
         ), p AS (
           SELECT user_id, epoch_us(ts) AS ts_us, event_id AS purchase_id
           FROM events WHERE event_type = 'purchase'
         ), m AS (
           SELECT p.purchase_id, p.user_id, p.ts_us, v.view_id,
             row_number() OVER (PARTITION BY p.purchase_id
               ORDER BY v.ts_us DESC, v.view_id DESC) AS rn
           FROM p LEFT JOIN v
             ON v.user_id = p.user_id AND v.ts_us <= p.ts_us
         )
         SELECT purchase_id, user_id, CAST(ts_us AS BIGINT) AS ts_us,
           view_id AS matched_view_id
         FROM m WHERE rn = 1""",
    // Streaming hop replay: watermark-closed sliding windows must equal
    // the batch hop — q08's SQL.
    "q208_stream_hop_replay" ->
      """SELECT (epoch_us(ts) // 1800000000 - k) * 1800000000 AS window_start_us,
         count(*) AS n_events,
         CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
         FROM events CROSS JOIN (VALUES (0), (1)) AS probes(k)
         GROUP BY 1""",
    // Streaming cumulate replay: window-end-watermarked growing windows
    // must equal the batch expansion — q35's SQL.
    "q209_stream_cumulate_replay" ->
      """SELECT (epoch_us(ts) // 7200000000) * 7200000000 AS window_start_us,
         (epoch_us(ts) // 7200000000) * 7200000000 + k * CAST(1800000000 AS BIGINT) AS window_end_us,
         count(*) AS n_events,
         CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
         FROM events CROSS JOIN (VALUES (1), (2), (3), (4)) AS steps(k)
         WHERE epoch_us(ts) < (epoch_us(ts) // 7200000000) * 7200000000 + k * CAST(1800000000 AS BIGINT)
         GROUP BY 1, 2""",
    // Runner tombstone path: the last event per user wins; a last
    // 'error' event is a DELETE — the key must be absent from the
    // materialized state.
    "q210_stream_tombstone_runner" ->
      """SELECT user_id, event_id AS last_event_id, value AS last_value,
         epoch_us(ts) AS ts_us
         FROM (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
               FROM events) WHERE rn = 1 AND event_type <> 'error'""",
    // Streaming first-per-key dedup replay: dropDuplicates state across
    // micro-batches must equal the batch rank-1 — q06's SQL.
    "q211_stream_dedup_first" ->
      """SELECT user_id, event_type, event_id AS first_event_id, epoch_us(ts) AS first_ts_us
         FROM (SELECT *, row_number() OVER (PARTITION BY user_id, event_type ORDER BY ts ASC, event_id ASC) AS rn
               FROM events) WHERE rn = 1""",
    // Streaming windowed HLL replay: q144's exact estimator SQL with
    // the group key swapped to the hour window over events.user_id.
    "q212_stream_hll_window" ->
      """WITH h AS (
           SELECT DISTINCT epoch_us(date_trunc('hour', ts)) AS w,
             CAST(list_sum(list_transform(range(12), j -> CAST(strpos('0123456789abcdef', substring(hx, CAST(j + 1 AS INT), 1)) - 1 AS BIGINT) << (4*(11 - CAST(j AS INT))))) AS BIGINT) AS h
           FROM (SELECT ts, md5(CAST(user_id AS VARCHAR)) AS hx FROM events)
         ), nr AS (
           SELECT epoch_us(date_trunc('hour', ts)) AS w, count(*) AS n_rows
           FROM events GROUP BY 1
         ), br AS (
           SELECT w, h // 4398046511104 AS b,
             CASE WHEN h % 4398046511104 = 0 THEN 43
                  ELSE 43 - length(bin(h % 4398046511104)) END AS rho
           FROM h
         ), regs AS (
           SELECT w, b, max(rho) AS mr FROM br GROUP BY 1, 2
         ), agg AS (
           SELECT w, count(*) AS present,
             sum(CAST(power(2, 50 - mr) AS BIGINT)) AS zp
           FROM regs GROUP BY 1
         ), fin AS (
           SELECT a.w, 64 - a.present AS v_zero,
             a.zp + (64 - a.present) * 1125899906842624 AS z_int
           FROM agg a
         ), est AS (
           SELECT w, v_zero, z_int,
             CAST((CAST(2 AS HUGEINT)*709341*4096*1125899906842624
                   + CAST(1000000 AS HUGEINT)*z_int)
                  // (CAST(2000000 AS HUGEINT)*z_int) AS BIGINT) AS est_raw,
             CASE WHEN v_zero > 0 THEN
               (2*64*CAST(floor(ln(64.0/v_zero)*1e6) AS BIGINT) + 1000000) // 2000000 END AS est_lin
           FROM fin
         )
         SELECT e.w AS window_start_us, CAST(nr.n_rows AS BIGINT) AS n_rows,
           CAST(v_zero AS BIGINT) AS v_zero, CAST(z_int AS BIGINT) AS z_int,
           CAST(CASE WHEN est_raw <= 160 AND v_zero > 0 THEN est_lin
                ELSE est_raw END AS BIGINT) AS est_hll
         FROM est e JOIN nr ON e.w = nr.w""",
    // Streaming windowed KMV replay: q52's estimator SQL keyed by the
    // hour window.
    "q213_stream_kmv_window" ->
      """WITH h AS (
           SELECT DISTINCT epoch_us(date_trunc('hour', ts)) AS w,
             CAST(list_sum(list_transform(range(12), j -> CAST(strpos('0123456789abcdef', substring(hx, CAST(j + 1 AS INT), 1)) - 1 AS BIGINT) << (4*(11 - CAST(j AS INT))))) AS BIGINT) AS h
           FROM (SELECT ts, md5(CAST(user_id AS VARCHAR)) AS hx FROM events)
         ), nr AS (
           SELECT epoch_us(date_trunc('hour', ts)) AS w, count(*) AS n_rows
           FROM events GROUP BY 1
         ), r AS (
           SELECT w, h,
             row_number() OVER (PARTITION BY w ORDER BY h) AS rn,
             count(*) OVER (PARTITION BY w) AS nd
           FROM h
         )
         SELECT r.w AS window_start_us, CAST(max(nr.n_rows) AS BIGINT) AS n_rows,
           CAST(least(max(nd), 64) AS BIGINT) AS n_kept,
           round(CASE WHEN max(nd) < 64 THEN CAST(max(nd) AS DOUBLE)
                 ELSE CAST(63 AS DOUBLE) * CAST(281474976710656 AS DOUBLE) / CAST(max(CASE WHEN rn = 64 THEN h END) AS DOUBLE)
                 END, 6) AS estimate
         FROM r JOIN nr ON r.w = nr.w GROUP BY r.w""",
    // Streaming windowed PSI replay: per-hour Laplace-smoothed category
    // mix vs the global mix, psi term mirrored op-for-op ((pA − pB) ·
    // ln(pA/pB), round 6); share intentionally ungated (integer-ratio
    // round-6 tie hazard).
    "q214_stream_psi_window" ->
      """WITH e AS (
           SELECT epoch_us(date_trunc('hour', ts)) AS w, event_type AS category
           FROM events
         ), wins AS (SELECT DISTINCT w FROM e
         ), cats AS (
           SELECT category, count(*) AS n_c FROM e GROUP BY 1
         ), tot AS (SELECT count(*) AS n_tot FROM e
         ), base AS (
           SELECT category,
             CAST(n_c AS DOUBLE) / CAST(n_tot AS DOUBLE) AS p_b,
             (SELECT count(*) FROM cats) AS k
           FROM cats, tot
         ), wc AS (
           SELECT w, category, count(*) AS n FROM e GROUP BY 1, 2
         ), wt AS (
           SELECT w, count(*) AS tot_w FROM e GROUP BY 1
         ), j AS (
           SELECT wins.w, base.category,
             COALESCE(wc.n, 0) AS n, wt.tot_w, base.p_b, base.k
           FROM wins CROSS JOIN base
           LEFT JOIN wc ON wc.w = wins.w AND wc.category = base.category
           JOIN wt ON wt.w = wins.w
         )
         SELECT w AS window_start_us, category, CAST(n AS BIGINT) AS n,
           round((CAST(n + 1 AS DOUBLE) / CAST(tot_w + k AS DOUBLE) - p_b)
                 * ln((CAST(n + 1 AS DOUBLE) / CAST(tot_w + k AS DOUBLE)) / p_b), 6) AS psi_term
         FROM j""",
    // Streaming windowed JS replay: per-window md5-bucket unigram mix
    // vs the global mix, 2·JS as Σ floor(1e6·term2) — the q108 micro
    // convention. Reference buckets cover every window bucket (same
    // corpus), so the support is exactly the reference's.
    "q215_stream_js_window" ->
      """WITH d AS (
           SELECT doc_id % 48 AS hr,
             unnest(string_split(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')), ' ')) AS tok
           FROM documents
         ), b AS (
           SELECT hr,
             CAST(list_sum(list_transform(range(8), j -> CAST(strpos('0123456789abcdef', substring(hx, CAST(j + 1 AS INT), 1)) - 1 AS BIGINT) << (4*(7 - CAST(j AS INT))))) AS BIGINT) % 1024 AS bucket
           FROM (SELECT hr, md5(tok) AS hx FROM d)
         ), ref AS (
           SELECT bucket, count(*) AS c_b FROM b GROUP BY 1
         ), rtot AS (SELECT count(*) AS n_tot FROM b
         ), hrs AS (SELECT DISTINCT hr FROM b
         ), wb AS (
           SELECT hr, bucket, count(*) AS cnt FROM b GROUP BY 1, 2
         ), wt AS (
           SELECT hr, count(*) AS tot FROM b GROUP BY 1
         ), grid AS (
           SELECT hrs.hr, ref.bucket,
             CAST(ref.c_b AS DOUBLE) / CAST(rtot.n_tot AS DOUBLE) AS q
           FROM hrs CROSS JOIN ref, rtot
         ), j AS (
           SELECT g.hr, g.q, COALESCE(wb.cnt, 0) AS cnt, wt.tot
           FROM grid g LEFT JOIN wb ON wb.hr = g.hr AND wb.bucket = g.bucket
           JOIN wt ON wt.hr = g.hr
         ), terms AS (
           SELECT hr, tot,
             CAST(floor(CAST(1000000 AS DOUBLE) * (
               CASE WHEN cnt > 0 THEN
                 (CAST(cnt AS DOUBLE) / CAST(tot AS DOUBLE))
                 * ln((CAST(cnt AS DOUBLE) / CAST(tot AS DOUBLE))
                      / ((CAST(cnt AS DOUBLE) / CAST(tot AS DOUBLE) + q) / CAST(2 AS DOUBLE)))
               ELSE CAST(0 AS DOUBLE) END
               + q * ln(q / ((CAST(cnt AS DOUBLE) / CAST(tot AS DOUBLE) + q) / CAST(2 AS DOUBLE)))
             )) AS BIGINT) AS t_micro
           FROM j
         )
         SELECT 1704067200000000 + hr * 3600000000 AS window_start_us,
           CAST(max(tot) AS BIGINT) AS n_tokens,
           CAST(sum(t_micro) AS BIGINT) AS js2_micro
         FROM terms GROUP BY 1""",
    // Streaming burst-gate replay: q155's exact z-test (z=3) against
    // the same-events moments baseline, mean column dropped (the
    // streaming gate doesn't emit it).
    "q216_stream_burst_window" ->
      """WITH w AS (
           SELECT event_type, epoch_us(ts) // 3600000000 AS wdx,
             CAST(count(*) AS BIGINT) AS n_events
           FROM events GROUP BY 1, 2
         ), st AS (
           SELECT event_type, CAST(count(*) AS BIGINT) AS wn,
             CAST(sum(n_events) AS BIGINT) AS s,
             sum(CAST(n_events AS HUGEINT) * n_events) AS sq
           FROM w GROUP BY 1
         )
         SELECT CAST(wdx * 3600000000 AS BIGINT) AS window_start_us,
           w.event_type, n_events,
           ((CAST(n_events AS HUGEINT) * wn - s) * (CAST(n_events AS HUGEINT) * wn - s)
             > 9 * (CAST(wn AS HUGEINT) * sq - CAST(s AS HUGEINT) * s)
            AND CAST(n_events AS HUGEINT) * wn > s) AS is_burst
         FROM w JOIN st USING (event_type)""",
    // Streaming corpus card replay: q81's card keyed by the synthetic
    // hour window, dup count absent (append mode can't chain the
    // distinct under the windowed aggregate).
    "q217_stream_corpus_card" ->
      """WITH nrm AS (
           SELECT doc_id % 48 AS hr, text,
             trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')) AS norm
           FROM documents
         ), q AS (
           SELECT hr,
             len(string_split(norm, ' ')) AS n_toks,
             least(len(text), 500) * 800
             + (CASE WHEN 10 * len(list_filter(string_split(norm, ' '),
                      t2 -> list_contains(['the','a','an','of','and','or','to','in','is','it'], t2)))
                      >= len(string_split(norm, ' ')) THEN 300000
                ELSE (6000000 * len(list_filter(string_split(norm, ' '),
                        t2 -> list_contains(['the','a','an','of','and','or','to','in','is','it'], t2)))
                      + len(string_split(norm, ' ')))
                     // (2 * len(string_split(norm, ' '))) END)
             + (CASE WHEN len(replace(norm, ' ', '')) >= 3 * len(string_split(norm, ' '))
                      AND len(replace(norm, ' ', '')) <= 8 * len(string_split(norm, ' '))
                THEN 300000 ELSE 0 END) AS q_micro
           FROM nrm
         )
         SELECT 1704067200000000 + hr * 3600000000 AS window_start_us,
           count(*) AS n_docs,
           CAST(sum(n_toks) AS BIGINT) AS n_tokens,
           min(n_toks) AS min_toks,
           max(n_toks) AS max_toks,
           CAST((2 * CAST(sum(q_micro) AS BIGINT) + count(*)) // (2 * count(*)) AS DOUBLE) / 1e6 AS mean_quality
         FROM q GROUP BY 1""",
    // Streaming calibration replay: q119's bins keyed by the synthetic
    // hour window.
    "q218_stream_calibration" ->
      """WITH t AS (
           SELECT doc_id, doc_id % 48 AS hr,
             trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')) AS norm,
             string_split(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')), ' ') AS toks
           FROM documents
         ), w AS (
           SELECT doc_id, unnest(toks) AS tok FROM t
         ), b AS (
           SELECT doc_id,
             (CAST(list_sum(list_transform(range(8),
               j -> CAST(strpos('0123456789abcdef', substring(md5(tok), CAST(j + 1 AS INT), 1)) - 1 AS BIGINT) << (4*(7 - CAST(j AS INT))))) AS BIGINT) % 4096) % 1001 - 500 AS wt
           FROM w
         ), agg AS (
           SELECT doc_id, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(wt) AS BIGINT) AS w_sum
           FROM b GROUP BY doc_id
         ), g AS (
           SELECT doc_id,
             (len(toks) >= 50 AND len(toks) <= 100000)
             AND (CAST(len(replace(norm, ' ', '')) AS DOUBLE) / len(toks) >= 3.0
                  AND CAST(len(replace(norm, ' ', '')) AS DOUBLE) / len(toks) <= 10.0)
             AND len(list_intersect(toks, ['the','a','an','of','and','or','to','in','is','it'])) >= 2
             AND CAST(len(list_filter(toks, t2 -> regexp_matches(t2, '[a-z]'))) AS DOUBLE) / len(toks) >= 0.8
             AND (CASE WHEN len(toks) >= 2
                  THEN 1.0 - CAST(len(list_distinct(list_transform(range(1, len(toks)),
                    i -> toks[i] || ' ' || toks[i+1]))) AS DOUBLE) / (len(toks) - 1)
                  ELSE 0.0 END) <= 0.5 AS keep
           FROM t
         ), sc AS (
           SELECT a.doc_id,
             ((a.w_sum + 500*a.n) * 2000000 + 1000*a.n) // (2000*a.n) AS s_micro,
             g.keep
           FROM agg a JOIN g ON a.doc_id = g.doc_id
         ), bn AS (
           SELECT t.hr, keep, s_micro, (s_micro * 10) // 1000001 AS bin
           FROM sc JOIN t ON sc.doc_id = t.doc_id
         )
         SELECT 1704067200000000 + hr * 3600000000 AS window_start_us,
           CAST(bin AS BIGINT) AS bin, CAST(count(*) AS BIGINT) AS n_docs,
           CAST((2*sum(s_micro) + count(*)) // (2*count(*)) AS BIGINT) AS mean_score_micro,
           CAST((2000000*sum(CASE WHEN keep THEN 1 ELSE 0 END) + count(*)) // (2*count(*)) AS BIGINT) AS keep_rate_micro,
           CAST((2*sum(s_micro) + count(*)) // (2*count(*))
             - (2000000*sum(CASE WHEN keep THEN 1 ELSE 0 END) + count(*)) // (2*count(*)) AS BIGINT) AS gap_micro
         FROM bn GROUP BY 1, 2""",
    // Streaming lang-agreement replay: q179's confusion cells keyed by
    // the synthetic hour window, share_ppm absent.
    "q219_stream_lang_agreement" ->
      """WITH toks AS (
           SELECT doc_id % 48 AS hr, source, lang,
             string_split(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')), ' ') AS tk
           FROM documents
         ), sc AS (
           SELECT hr, source, lang,
             len(list_filter(tk, t -> t IN ('the', 'a', 'of', 'and', 'is', 'to', 'in', 'it'))) AS s_en,
             len(list_filter(tk, t -> t IN ('der', 'die', 'das', 'und', 'ist', 'nicht', 'ein'))) AS s_de,
             len(list_filter(tk, t -> t IN ('el', 'la', 'de', 'y', 'es', 'que', 'un'))) AS s_es,
             len(list_filter(tk, t -> t IN ('le', 'la', 'et', 'les', 'des', 'est', 'une'))) AS s_fr
           FROM toks
         ), pred AS (
           SELECT hr, source, lang,
             CASE WHEN greatest(s_en, s_de, s_es, s_fr) = 0 THEN 'und'
                  WHEN s_en = greatest(s_en, s_de, s_es, s_fr) THEN 'en'
                  WHEN s_de = greatest(s_en, s_de, s_es, s_fr) THEN 'de'
                  WHEN s_es = greatest(s_en, s_de, s_es, s_fr) THEN 'es'
                  ELSE 'fr' END AS pred_lang
           FROM sc
         )
         SELECT 1704067200000000 + hr * 3600000000 AS window_start_us,
           source, lang, pred_lang, CAST(count(*) AS BIGINT) AS n
         FROM pred GROUP BY 1, 2, 3, 4""",
    // Streaming novelty presence: on the ordered replay the first
    // arrival day per entity is its min day.
    "q220_stream_novelty_presence" ->
      """WITH dd AS (
           SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS d FROM events
         )
         SELECT user_id AS entity, CAST(d AS BIGINT) AS day,
           (d = min(d) OVER (PARTITION BY user_id)) AS is_new
         FROM dd""",
    // Streaming vector near-dup gate: the q39 IVF chain (content-
    // sampled centroids, nearest-centroid assignment, nProbe=6 probes)
    // as a probed pair join with the q23 threshold convention.
    "q221_stream_nearvec_gate" ->
      """WITH cent AS (
           SELECT row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS cpos,
                  CAST(embedding AS DOUBLE[]) AS ce
           FROM embeddings
           ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 16
         ), assign AS (
           SELECT e.vec_id AS neighbor_id, cpos
           FROM embeddings e CROSS JOIN cent
           QUALIFY row_number() OVER (PARTITION BY e.vec_id
             ORDER BY list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), ce) DESC, cpos ASC) = 1
         ), probes AS (
           SELECT q.vec_id, cpos
           FROM embeddings q CROSS JOIN cent
           WHERE q.vec_id % 5 = 0
           QUALIFY row_number() OVER (PARTITION BY q.vec_id
             ORDER BY list_cosine_similarity(CAST(q.embedding AS DOUBLE[]), ce) DESC, cpos ASC) <= 6
         ), cand AS (
           SELECT p.vec_id, a.neighbor_id
           FROM probes p JOIN assign a USING (cpos)
           WHERE p.vec_id <> a.neighbor_id
         )
         SELECT c.vec_id, c.neighbor_id,
           round(list_cosine_similarity(CAST(q.embedding AS DOUBLE[]), CAST(n.embedding AS DOUBLE[])), 6) AS cos_sim
         FROM cand c
         JOIN embeddings q ON c.vec_id = q.vec_id
         JOIN embeddings n ON c.neighbor_id = n.vec_id
         WHERE list_cosine_similarity(CAST(q.embedding AS DOUBLE[]), CAST(n.embedding AS DOUBLE[])) >= 0.3""",
    // Stream-stream LEFT OUTER interval join: q11's shape with the
    // unmatched purchases NULL-padded.
    "q222_stream_interval_outer" ->
      """SELECT p.event_id AS purchase_id, c.event_id AS click_id, p.user_id
         FROM (SELECT * FROM events WHERE event_type = 'purchase') p
         LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
           ON p.user_id = c.user_id
          AND c.ts >= p.ts - INTERVAL 1 HOUR AND c.ts <= p.ts""",
    // Streaming grid quantiles: exact integer-rank quantiles over the
    // micro lattice per hour window — ⌈p·n⌉ as (num·n + den−1) // den.
    "q223_stream_quantile_window" ->
      """WITH v AS (
           SELECT epoch_us(date_trunc('hour', ts)) AS w,
             CAST(CAST(value AS DECIMAL(18,4)) * 1000000 AS BIGINT) AS m
           FROM events
         ), h AS (
           SELECT w, m, count(*) AS c FROM v GROUP BY 1, 2
         ), cum AS (
           SELECT w, m, sum(c) OVER (PARTITION BY w ORDER BY m) AS cm,
             sum(c) OVER (PARTITION BY w) AS n
           FROM h
         )
         SELECT w AS window_start_us, CAST(max(n) AS BIGINT) AS n_rows,
           CAST(min(CASE WHEN cm >= (n + 1) // 2 THEN m END) AS BIGINT) AS p50_micro,
           CAST(min(CASE WHEN cm >= (9*n + 9) // 10 THEN m END) AS BIGINT) AS p90_micro,
           CAST(min(CASE WHEN cm >= (99*n + 99) // 100 THEN m END) AS BIGINT) AS p99_micro
         FROM cum GROUP BY 1""",
    "q200_temporal_join_eventtime" ->
      """WITH v AS (
           SELECT user_id, epoch_us(ts) AS ts_us, max(event_id) AS view_id
           FROM events WHERE event_type = 'view' GROUP BY 1, 2
         ), p AS (
           SELECT user_id, epoch_us(ts) AS ts_us, event_id AS purchase_id
           FROM events WHERE event_type = 'purchase'
         ), m AS (
           SELECT p.purchase_id, p.user_id, p.ts_us, v.view_id,
             row_number() OVER (PARTITION BY p.purchase_id
               ORDER BY v.ts_us DESC, v.view_id DESC) AS rn
           FROM p LEFT JOIN v
             ON v.user_id = p.user_id AND v.ts_us <= p.ts_us
         )
         SELECT purchase_id, user_id, CAST(ts_us AS BIGINT) AS ts_us,
           view_id AS matched_view_id
         FROM m WHERE rn = 1""",
    // Same-id replace lifecycle (IVF): the q39 replay over the
    // REPLACED corpus (vec 42 := vec 43's embedding); target 42 is
    // outside the bottom-16 md5 centroid sample at every SF, so the
    // replayed quantizer equals the engine's immutable sidecar.
    "q191_ivf_replace_lifecycle" ->
      ivfKnnSql("TRUE", "TRUE", src = "embeddings2",
        extraCtes = """embeddings2 AS (
           SELECT vec_id,
             CASE WHEN vec_id = 42
               THEN (SELECT embedding FROM embeddings WHERE vec_id = 43)
               ELSE embedding END AS embedding
           FROM embeddings)"""),
    // Near-dup decontamination: the q19 pairs crossing the 80/20
    // md5-bucket split (q44's bucket formula), oriented train→eval.
    "q188_neardup_decontam" ->
      s"""WITH p AS (
           SELECT id_a, id_b, est_jaccard FROM ($minhashPairsSql)
         ), b AS (
           SELECT doc_id,
             CAST(CAST(list_sum(list_transform(range(8),
               j -> CAST(strpos('0123456789abcdef', substring(hx, CAST(j + 1 AS INT), 1)) - 1 AS BIGINT) << (4*(7 - CAST(j AS INT))))) AS BIGINT) % 100 AS INT) < 80 AS is_train
           FROM (SELECT doc_id, md5('graft:' || CAST(doc_id AS VARCHAR)) AS hx FROM documents)
         )
         SELECT CASE WHEN ba.is_train THEN id_a ELSE id_b END AS train_id,
                CASE WHEN ba.is_train THEN id_b ELSE id_a END AS eval_id,
                est_jaccard
         FROM p
         JOIN b ba ON ba.doc_id = id_a
         JOIN b bb ON bb.doc_id = id_b
         WHERE ba.is_train <> bb.is_train""",
    // Bucket occupancy: the oracle's bucket key is the band's mh
    // string (engine: hash of it) — identical grouping absent
    // collisions, the standing q19 assumption.
    "q187_lsh_bucket_stats" ->
      s"""WITH ${minhashBandCtes("TRUE")}, occ AS (
           SELECT band, bucket, CAST(count(*) AS BIGINT) AS occupancy
           FROM band GROUP BY 1, 2
         )
         SELECT occupancy, CAST(count(*) AS BIGINT) AS n_buckets,
           CAST(count(*) * ((CAST(occupancy AS HUGEINT) * (occupancy - 1)) // 2) AS BIGINT) AS cand_pairs
         FROM occ GROUP BY occupancy""",
    // Per-day novelty: first-seen via min-window over each key's
    // (key, day) presence rows; exact half-up micro shares (integer
    // ratios CAN tie at the 6th decimal — the q82 rule).
    "q164_novelty_timeline" ->
      """WITH b AS (
           SELECT user_id AS u, event_type AS ty,
             (epoch_us(ts) // 86400000000) AS day
           FROM events
         ), ud AS (
           SELECT u, day FROM b GROUP BY u, day
         ), uf AS (
           SELECT u, day, min(day) OVER (PARTITION BY u) AS first FROM ud
         ), uc AS (
           SELECT day, CAST(count(*) AS BIGINT) AS active_users,
             CAST(count(*) FILTER (WHERE day = first) AS BIGINT) AS new_users
           FROM uf GROUP BY day
         ), pd AS (
           SELECT u, ty, day FROM b GROUP BY u, ty, day
         ), pf AS (
           SELECT u, ty, day, min(day) OVER (PARTITION BY u, ty) AS first FROM pd
         ), pc AS (
           SELECT day, CAST(count(*) AS BIGINT) AS active_pairs,
             CAST(count(*) FILTER (WHERE day = first) AS BIGINT) AS new_pairs
           FROM pf GROUP BY day
         )
         SELECT uc.day, active_users, new_users,
           CAST((2*new_users*1000000 + active_users) // (2*active_users) AS BIGINT) AS new_user_ppm,
           active_pairs, new_pairs,
           CAST((2*new_pairs*1000000 + active_pairs) // (2*active_pairs) AS BIGINT) AS new_pair_ppm
         FROM uc JOIN pc ON uc.day = pc.day""",
    "q161_head_token_bias" ->
      """WITH tk AS (
           SELECT CAST(i - 1 AS BIGINT) AS pos, toks[i] AS token
           FROM (SELECT toks, unnest(generate_series(1, len(toks))) AS i
                 FROM (SELECT string_split(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')), ' ') AS toks
                       FROM documents))
         ), per AS (
           SELECT token, CAST(count(*) AS BIGINT) AS n_total,
             CAST(count(*) FILTER (WHERE pos < 10) AS BIGINT) AS n_head
           FROM tk GROUP BY 1
         ), tot AS (
           SELECT CAST(sum(n_total) AS HUGEINT) AS t,
             CAST(sum(n_head) AS HUGEINT) AS th
           FROM per
         ), top AS (
           SELECT token, n_total, n_head FROM per
           ORDER BY n_total DESC, token LIMIT 200
         )
         SELECT token, n_total, n_head,
           CAST((2 * CAST(n_head AS HUGEINT) * 1000000 + n_total) // (2 * CAST(n_total AS HUGEINT)) AS BIGINT) AS head_micro,
           CAST((2 * CAST(n_head AS HUGEINT) * t * 1000000 + CAST(n_total AS HUGEINT) * th)
             // (2 * CAST(n_total AS HUGEINT) * th) AS BIGINT) AS lift_micro
         FROM top, tot""",
    // Span-dedup materialization: q101's covered islands as removal
    // intervals; kept tokens via a per-doc range ANTI JOIN, re-joined
    // in index order (normalized-token text on both sides).
    "q160_strip_dup_spans" ->
      """WITH t AS (
           SELECT doc_id,
             string_split(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')), ' ') AS toks
           FROM documents
         ), pos AS (
           SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos,
             CAST(list_sum(list_transform(range(12),
               j -> CAST(strpos('0123456789abcdef', substring(hx, CAST(j + 1 AS INT), 1)) - 1 AS BIGINT) << (4*(11 - CAST(j AS INT))))) AS BIGINT) AS h
           FROM (
             SELECT doc_id, i, md5(array_to_string(toks[i:i+9], ' ')) AS hx
             FROM (SELECT doc_id, toks, unnest(generate_series(1, len(toks) - 9)) AS i
                   FROM t WHERE len(toks) >= 10)
           )
         ), dfq AS (
           SELECT h, count(*) AS df FROM pos GROUP BY h
         ), cov AS (
           SELECT doc_id, pos FROM pos JOIN dfq USING (h) WHERE df >= 2
         ), isl AS (
           SELECT doc_id, pos,
             CAST(sum(CASE WHEN prev IS NOT NULL AND pos - prev > 9 THEN 1 ELSE 0 END)
               OVER (PARTITION BY doc_id ORDER BY pos
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS isl
           FROM (SELECT doc_id, pos,
                   lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
                 FROM cov)
         ), iv AS (
           SELECT doc_id, isl, min(pos) AS s, max(pos) + 9 AS e
           FROM isl GROUP BY 1, 2
         ), tok AS (
           SELECT doc_id, CAST(i - 1 AS BIGINT) AS idx, toks[i] AS tok
           FROM (SELECT doc_id, toks, unnest(generate_series(1, len(toks))) AS i FROM t)
         ), kept AS (
           SELECT tk.doc_id, tk.idx, tk.tok
           FROM tok tk
           ANTI JOIN iv ON tk.doc_id = iv.doc_id AND tk.idx BETWEEN iv.s AND iv.e
         ), agg AS (
           SELECT doc_id, CAST(count(*) AS BIGINT) AS kept_tokens,
             string_agg(tok, ' ' ORDER BY idx) AS clean_text
           FROM kept GROUP BY doc_id
         ), base AS (
           SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens FROM t
         )
         SELECT b.doc_id, b.n_tokens,
           COALESCE(a.kept_tokens, 0) AS kept_tokens,
           b.n_tokens - COALESCE(a.kept_tokens, 0) AS removed_tokens,
           COALESCE(a.clean_text, '') AS clean_text
         FROM base b LEFT JOIN agg a USING (doc_id)""",
    // Near-dup CLUSTERS: connected components (min reachable id) over
    // the q19 MinHash-LSH pair list, via a recursive reachability CTE —
    // replays the engine's iterated min-label propagation exactly.
    "q47_dedup_clusters" -> componentsSql,
    // Alternating stars must produce the IDENTICAL labeling — the same
    // reachability oracle checks both implementations.
    "q68_components_star" -> componentsSql,
    // SimHash: bit i of md5(token) (parsed nibble-wise from the first 16
    // hex chars) votes ±1; simhash = Σ 2^i over positive vote totals.
    "q20_simhash" -> s"WITH $simhashCtes SELECT doc_id, simhash FROM sh",
    // Winnowing: 4-gram hashes = first 48 bits of md5 (parse the first
    // 12 hex chars — exact integers both engines); fingerprints = the
    // DISTINCT window-min VALUES over sliding windows of 8 grams
    // (value-set output makes the tiebreak rule irrelevant). Docs with
    // fewer than 8 grams fingerprint their single truncated window.
    "q40_winnow_fingerprint" ->
      s"""WITH $winnowFpCtes
         SELECT DISTINCT doc_id, fp FROM sel""",
    // Fingerprint-overlap pairs (MOSS): docs sharing >= 2 winnowing
    // fingerprints, with both containment ratios. The >100-doc hot-
    // fingerprint cap mirrors the engine's broadcast anti-join guard
    // (vacuous at this sf, engaged at scale).
    "q48_fingerprint_overlap" ->
      s"""WITH $winnowFpCtes, fps AS (
           SELECT DISTINCT doc_id, fp FROM sel
         ), kept AS (
           SELECT * FROM fps WHERE fp NOT IN (
             SELECT fp FROM fps GROUP BY fp HAVING count(*) > 100)
         ), sizes AS (
           SELECT doc_id, count(*) AS n_fp FROM kept GROUP BY doc_id
         ), shared AS (
           SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_shared
           FROM kept a JOIN kept b ON a.fp = b.fp AND a.doc_id < b.doc_id
           GROUP BY 1, 2 HAVING count(*) >= 2
         )
         SELECT id_a, id_b, n_shared,
           CAST(n_shared AS DOUBLE) / sa.n_fp AS containment_a,
           CAST(n_shared AS DOUBLE) / sb.n_fp AS containment_b
         FROM shared
         JOIN sizes sa ON id_a = sa.doc_id
         JOIN sizes sb ON id_b = sb.doc_id""",
    // Curation funnel: q14/q15/q16/q46's signal formulations composed
    // into the precedence CASE. Repetition compares the ROUNDED ratio;
    // quality is double-exact (integer counts through IEEE ops); docs
    // with < 2 tokens have NULL repetition (caught by too_short first).
    "q51_curation_funnel" -> curationFunnelSql,
    // KMV distinct sketch: the k-th smallest DISTINCT md5-48 bigram hash
    // is an order statistic — engine-independent — so the estimate
    // (k-1)·2^48/h_k is the SAME double in both engines. Exact when a
    // group has fewer than k distinct grams.
    "q52_kmv_distinct" ->
      """WITH t AS (
           SELECT lang,
             string_split(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')), ' ') AS toks
           FROM documents
         ), g AS (
           SELECT lang, md5(gram) AS hx FROM (
             SELECT lang, unnest(list_transform(range(1, len(toks)),
               i -> toks[i] || ' ' || toks[i+1])) AS gram
             FROM t WHERE len(toks) >= 2)
         ), h AS (
           SELECT DISTINCT lang,
             CAST(list_sum(list_transform(range(12), j -> CAST(strpos('0123456789abcdef', substring(hx, CAST(j + 1 AS INT), 1)) - 1 AS BIGINT) << (4*(11 - CAST(j AS INT))))) AS BIGINT) AS h
           FROM g
         ), r AS (
           SELECT lang, h,
             row_number() OVER (PARTITION BY lang ORDER BY h) AS rn,
             count(*) OVER (PARTITION BY lang) AS nd
           FROM h
         )
         SELECT lang, CAST(max(nd) AS BIGINT) AS n_exact,
           CAST(least(max(nd), 64) AS BIGINT) AS n_kept,
           round(CASE WHEN max(nd) < 64 THEN CAST(max(nd) AS DOUBLE)
                 ELSE CAST(63 AS DOUBLE) * CAST(281474976710656 AS DOUBLE) / CAST(max(CASE WHEN rn = 64 THEN h END) AS DOUBLE)
                 END, 6) AS est_distinct_grams
         FROM r GROUP BY lang""",
    // Salted two-phase aggregation: decimal partial sums merge exactly,
    // so the oracle is the plain one-phase GROUP BY.
    "q53_salted_agg" ->
      """SELECT l_returnflag, count(*) AS n,
         CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_l_quantity,
         CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_l_extendedprice
         FROM lineitem GROUP BY l_returnflag""",
    // Group holdout: identical md5-hex ordering key in both engines.
    "q54_group_holdout" ->
      """SELECT doc_id, lang, source, n_chars, holdout_rank FROM (
           SELECT doc_id, lang, source, n_chars,
             CAST(row_number() OVER (PARTITION BY lang
               ORDER BY md5('graft:' || CAST(doc_id AS VARCHAR)), doc_id) AS INT) AS holdout_rank
           FROM documents
         ) WHERE holdout_rank <= 5""",
    // Label centroid stats: mean per dim = Σ/n (same IEEE ops), norms
    // are left-to-right double folds; 6-dp rounding bridges group-order
    // summation noise (the repo metric rule).
    "q55_label_centroids" ->
      """WITH e AS (
           SELECT label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
         ), d AS (
           SELECT label, i.i AS pos, sum(v[CAST(i.i + 1 AS INT)]) / count(*) AS m
           FROM e CROSS JOIN range(64) i(i) GROUP BY label, i.i
         ), cn AS (
           SELECT label, round(sqrt(sum(m * m)), 6) AS centroid_norm FROM d GROUP BY label
         ), vs AS (
           SELECT label, count(*) AS n_vecs,
             round(sum(sqrt(list_sum(list_transform(v, x -> x * x)))) / count(*), 6) AS avg_vec_norm
           FROM e GROUP BY label
         )
         SELECT label, n_vecs, centroid_norm, avg_vec_norm
         FROM vs JOIN cn USING (label)""",
    // SemDeDup: q49's k-means replay + within-cluster pair join.
    "q56_semdedup" -> semDedupSql(k = 8, dim = 64, iters = 1, threshold = 0.35),
    // Token-budget mix: q44's md5 bucket, q45's tokenizer, integer `//`.
    "q57_token_budget_mix" -> tokenBudgetMixSql,
    // Count-min sketch: md5-48("cms|r|token") mod w bucket hashes —
    // the sketch cells and min-estimates are exact integers both sides.
    "q58_cms_estimates" ->
      """WITH tok AS (
           SELECT unnest(string_split(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')), ' ')) AS token
           FROM documents
         ), vocab AS (
           SELECT token, count(*) AS n_exact FROM tok GROUP BY token
         ), hashed AS (
           SELECT token, n_exact, r.r,
             CAST(list_sum(list_transform(range(12),
               j -> CAST(strpos('0123456789abcdef', substring(md5('cms|' || CAST(r.r AS VARCHAR) || '|' || token), CAST(j + 1 AS INT), 1)) - 1 AS BIGINT) << (4*(11 - CAST(j AS INT))))) AS BIGINT) % 16 AS bucket
           FROM vocab, range(3) r(r)
         ), sketch AS (
           SELECT r, bucket, sum(n_exact) AS cell FROM hashed GROUP BY 1, 2
         ), top AS (
           SELECT token, n_exact FROM vocab ORDER BY n_exact DESC, token LIMIT 30
         ), est AS (
           SELECT t.token, t.n_exact, CAST(min(s.cell) AS BIGINT) AS n_est
           FROM top t JOIN hashed h ON t.token = h.token
           JOIN sketch s ON h.r = s.r AND h.bucket = s.bucket
           GROUP BY 1, 2
         )
         SELECT row_number() OVER (ORDER BY n_exact DESC, token) AS rank,
           token, n_exact, n_est, n_est - n_exact AS overcount
         FROM est""",
    // Char entropy: per-codepoint histogram; Σ cnt·ln cnt folded in
    // ascending-codepoint order (list ORDER BY c = UTF-8 byte order =
    // codepoint order), H = (ln n − S/n) / the shared LN2 literal.
    "q59_char_entropy" ->
      """WITH ch AS (
           SELECT doc_id, c, count(*) AS cnt
           FROM (SELECT doc_id, unnest(regexp_extract_all(text, '[\s\S]')) AS c
                 FROM documents)
           GROUP BY 1, 2
         ), s AS (
           SELECT doc_id,
             CAST(sum(cnt) AS INT) AS n_chars,
             CAST(count(*) AS INT) AS n_unique,
             CAST(sum(cnt) AS DOUBLE) AS n,
             list_sum(list_transform(list(CAST(cnt AS DOUBLE) ORDER BY c), x -> x * ln(x))) AS sl
           FROM ch GROUP BY doc_id
         )
         SELECT d.doc_id,
           coalesce(s.n_chars, 0) AS n_chars,
           coalesce(s.n_unique, 0) AS n_unique,
           round(CASE WHEN s.n IS NULL OR s.n = 0 THEN 0.0
                      ELSE (ln(s.n) - s.sl / s.n) / 0.6931471805599453 END, 6) AS entropy
         FROM documents d LEFT JOIN s USING (doc_id)""",
    // ANN recall eval: q21's exact ranking vs q22's LSH ranking.
    "q60_ann_recall" ->
      s"""WITH ${srpSigCtes(tables = 8, bits = 8, dim = 64, seed = 42L)},
         probes AS (
           SELECT s.vec_id AS query_id, s.t,
             CASE WHEN f.f = 8 THEN s.sig
                  ELSE xor(s.sig, CAST(1 AS BIGINT) << CAST(f.f AS INT)) END AS sig
           FROM sig s, range(9) f(f) WHERE s.vec_id < 10
         ), cand AS (
           SELECT DISTINCT p.query_id, c.vec_id AS neighbor_id
           FROM probes p JOIN sig c ON p.t = c.t AND p.sig = c.sig
           WHERE p.query_id <> c.vec_id
         ), approx AS (
           SELECT query_id, neighbor_id FROM (
             SELECT query_id, neighbor_id,
               row_number() OVER (PARTITION BY query_id
                 ORDER BY list_cosine_similarity(CAST(q.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[])) DESC,
                          neighbor_id ASC) AS rank
             FROM cand
             JOIN embeddings q ON query_id = q.vec_id
             JOIN embeddings c ON neighbor_id = c.vec_id
           ) WHERE rank <= 5
         ), truth AS (
           SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id
           FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
           WHERE q.vec_id < 10
           QUALIFY row_number() OVER (PARTITION BY q.vec_id
             ORDER BY list_cosine_similarity(CAST(q.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[])) DESC,
                      c.vec_id ASC) <= 5
         ), hits AS (
           SELECT t.query_id, count(*) AS n_hits
           FROM truth t JOIN approx a
             ON t.query_id = a.query_id AND t.neighbor_id = a.neighbor_id
           GROUP BY 1
         )
         SELECT n.query_id, n.n_truth,
           coalesce(h.n_hits, 0) AS n_hits,
           round(CAST(coalesce(h.n_hits, 0) AS DOUBLE) / n.n_truth, 6) AS recall
         FROM (SELECT query_id, count(*) AS n_truth FROM truth GROUP BY 1) n
         LEFT JOIN hits h USING (query_id)""",
    // Inter-doc duplicate grams: distinct 5-grams per doc (raw strings —
    // the engine's 64-bit hash join is equivalent modulo the documented
    // 2^-64 collision class), df >= 2 means some OTHER doc shares it.
    "q61_interdup_grams" ->
      """WITH t AS (
           SELECT doc_id,
             string_split(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')), ' ') AS toks
           FROM documents
         ), g AS (
           SELECT DISTINCT doc_id,
             unnest(list_transform(range(1, len(toks) - 3),
               i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3] || ' ' || toks[i+4])) AS gram
           FROM t WHERE len(toks) >= 5
         ), df AS (
           SELECT gram, count(*) AS df FROM g GROUP BY gram
         )
         SELECT g.doc_id, count(*) AS n_grams,
           CAST(sum(CASE WHEN df.df >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_shared,
           round(CAST(CAST(sum(CASE WHEN df.df >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6) AS dup_frac
         FROM g JOIN df USING (gram)
         GROUP BY g.doc_id""",
    // Bloom decontamination: grams hash to md5-48 (portable), position
    // j of hash h = md5-48('bloom|j|h') mod m — the filter bits, hits
    // and FALSE POSITIVES are all engine-exact integers.
    "q62_bloom_decontaminate" -> {
      def parse12(e: String) =
        s"CAST(list_sum(list_transform(range(12), j2 -> CAST(strpos('0123456789abcdef', substring($e, CAST(j2 + 1 AS INT), 1)) - 1 AS BIGINT) << (4*(11 - CAST(j2 AS INT))))) AS BIGINT)"
      s"""WITH t AS (
           SELECT doc_id,
             string_split(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')), ' ') AS toks
           FROM documents
         ), cg AS (
           SELECT DISTINCT doc_id, ${parse12("md5(gram)")} AS h FROM (
             SELECT doc_id, unnest(list_transform(range(1, len(toks) - 1),
               i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS gram
             FROM t WHERE doc_id % 10 <> 0 AND len(toks) >= 3)
         ), rg AS (
           SELECT DISTINCT ${parse12("md5(gram)")} AS h FROM (
             SELECT unnest(list_transform(range(1, len(toks) - 1),
               i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS gram
             FROM t WHERE doc_id % 10 = 0 AND len(toks) >= 3)
         ), fbits AS (
           SELECT DISTINCT ${parse12("md5('bloom|' || CAST(j.j AS VARCHAR) || '|' || CAST(h AS VARCHAR))")} % 16384 AS pos
           FROM rg, range(3) j(j)
         ), cpos AS (
           SELECT doc_id, h,
             ${parse12("md5('bloom|' || CAST(j.j AS VARCHAR) || '|' || CAST(h AS VARCHAR))")} % 16384 AS pos
           FROM cg, range(3) j(j)
         ), bh AS (
           SELECT doc_id, h FROM cpos
           WHERE pos IN (SELECT pos FROM fbits)
           GROUP BY doc_id, h HAVING count(*) = 3
         ), bhc AS (
           SELECT doc_id, count(*) AS n_bloom_hits FROM bh GROUP BY 1
         ), eh AS (
           SELECT c.doc_id, count(*) AS n_exact_hits FROM cg c JOIN rg USING (h) GROUP BY 1
         )
         SELECT s.doc_id, s.n_grams,
           coalesce(b.n_bloom_hits, 0) AS n_bloom_hits,
           coalesce(e.n_exact_hits, 0) AS n_exact_hits,
           coalesce(b.n_bloom_hits, 0) - coalesce(e.n_exact_hits, 0) AS n_false_pos
         FROM (SELECT doc_id, count(*) AS n_grams FROM cg GROUP BY 1) s
         LEFT JOIN bhc b USING (doc_id)
         LEFT JOIN eh e USING (doc_id)"""
    },
    // Per-dimension embedding stats: population std over per-dim sums.
    "q63_embedding_dimstats" ->
      """WITH d AS (
           SELECT i.i AS pos, CAST(embedding[CAST(i.i + 1 AS INT)] AS DOUBLE) AS x
           FROM embeddings, range(64) i(i)
         )
         SELECT pos, count(*) AS n,
           round(sum(x) / count(*), 6) AS mean_x,
           round(sqrt(greatest(sum(x * x) / count(*) - (sum(x) / count(*)) * (sum(x) / count(*)), 0.0)), 6) AS std_x,
           round(min(x), 6) AS min_x,
           round(max(x), 6) AS max_x
         FROM d GROUP BY pos""",
    // Materialized dedup: documents minus non-representative members of
    // the SAME labeling componentsSql produces for q47/q68 — one copy
    // of the component SQL, three consumers.
    "q64_dedup_materialize" ->
      s"""SELECT d.doc_id, d.lang, d.source, d.n_chars
         FROM documents d
         WHERE NOT EXISTS (SELECT 1 FROM ($componentsSql) c
           WHERE c.doc_id = d.doc_id AND c.doc_id <> c.cluster_id)""",
    // Chunking: integer chunk boundaries (step 24 = 32 - 8), 1-based
    // inclusive list slice == Spark's slice(start, length) clipped.
    "q65_chunking" ->
      """WITH t AS (
           SELECT doc_id,
             string_split(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')), ' ') AS toks
           FROM documents
         ), b AS (
           SELECT doc_id, toks, CAST(len(toks) AS BIGINT) AS n,
             CASE WHEN len(toks) <= 32 THEN 1
                  ELSE 1 + (CAST(len(toks) AS BIGINT) - 32 + 23) // 24 END AS n_starts
           FROM t WHERE len(toks) >= 1
         ), c AS (
           SELECT doc_id, toks, n, unnest(range(n_starts)) AS chunk_id FROM b
         )
         SELECT doc_id, chunk_id,
           least(32, n - chunk_id * 24) AS chunk_tokens,
           array_to_string(toks[CAST(chunk_id * 24 + 1 AS INT) : CAST(least(chunk_id * 24 + 32, n) AS INT)], ' ') AS chunk_text
         FROM c""",
    // Windowed dedup: first row per (user, type, 30-min tumble) by
    // (ts, event_id), plus the suppressed-duplicate count.
    "q66_window_dedup" ->
      """WITH b AS (
           SELECT user_id, event_type,
             (epoch_us(ts) // 1800000000) * 1800000000 AS window_start_us,
             ts, event_id, value
           FROM events
         ), r AS (
           SELECT *,
             row_number() OVER (PARTITION BY user_id, event_type, window_start_us ORDER BY ts, event_id) AS rn,
             count(*) OVER (PARTITION BY user_id, event_type, window_start_us) AS n_rows
           FROM b
         )
         SELECT user_id, event_type, window_start_us,
           epoch_us(ts) AS first_ts_us, event_id AS first_event_id,
           value AS first_value, n_rows - 1 AS n_dups
         FROM r WHERE rn = 1""",
    // Unigram log-prob: p from the corpus's own unigram counts; the
    // per-doc mean is a double sum both engines round at 6dp.
    "q67_unigram_logprob" ->
      """WITH tok AS (
           SELECT doc_id,
             unnest(string_split(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')), ' ')) AS token
           FROM documents
         ), vocab AS (
           SELECT token, count(*) AS c FROM tok GROUP BY token
         ), tot AS (
           SELECT count(*) AS n_total FROM tok
         )
         SELECT t.doc_id, count(*) AS n_tokens,
           round(sum(ln(CAST(v.c AS DOUBLE) / CAST(tot.n_total AS DOUBLE))) / count(*), 6) AS mean_logprob
         FROM tok t JOIN vocab v USING (token) CROSS JOIN tot
         GROUP BY t.doc_id""",
    // Sequence packing: exclusive running token sum per source (ordered
    // by doc_id), integer div/mod into 1024-token sequences.
    "q70_sequence_packing" ->
      """WITH b AS (
           SELECT doc_id, source,
             CAST(len(string_split(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')), ' ')) AS BIGINT) AS n_tokens
           FROM documents
         ), r AS (
           SELECT doc_id, source, n_tokens,
             CAST(coalesce(sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens, 0) AS BIGINT) AS s
           FROM b
         )
         SELECT doc_id, source, n_tokens,
           s // 1024 AS seq_id, s % 1024 AS seq_offset
         FROM r""",
    // Idf-weighted gram cosine: raw gram strings stand in for the
    // engine's md5-48 hashes (weights depend only on df — the
    // documented hash/string set equivalence); threshold on the
    // ROUNDED cosine both sides.
    "q71_idf_cosine_pairs" ->
      """WITH t AS (
           SELECT doc_id,
             string_split(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')), ' ') AS toks
           FROM documents
         ), g AS (
           SELECT DISTINCT doc_id,
             unnest(list_transform(range(1, len(toks) - 1),
               i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS gram
           FROM t WHERE len(toks) >= 3
         ), dfr AS (
           SELECT gram, count(*) AS df FROM g GROUP BY gram
         ), w AS (
           SELECT doc_id, gram, w FROM (
             SELECT g.doc_id, g.gram,
               ln(CAST((SELECT count(*) FROM documents) AS DOUBLE) / CAST(dfr.df AS DOUBLE)) AS w
             FROM g JOIN dfr USING (gram) WHERE dfr.df <= 100
           ) WHERE w > 0
         ), nrm AS (
           SELECT doc_id, sqrt(sum(w * w)) AS nrm FROM w GROUP BY doc_id
         ), p AS (
           SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             count(*) AS n_shared, sum(a.w * b.w) AS dot
           FROM w a JOIN w b ON a.gram = b.gram AND a.doc_id < b.doc_id
           GROUP BY 1, 2
         )
         SELECT id_a, id_b, n_shared,
           round(dot / (na.nrm * nb.nrm), 6) AS cos_sim
         FROM p
         JOIN nrm na ON p.id_a = na.doc_id
         JOIN nrm nb ON p.id_b = nb.doc_id
         WHERE round(dot / (na.nrm * nb.nrm), 6) >= 0.2""",
    // BM25: same k1=1.2 / b=0.75 literals and the same double-op order
    // (avgdl = total/n first, then dl/avgdl) as the Spark plan.
    "q72_bm25_search" ->
      s"""WITH $bm25ScoreCtes
         SELECT row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank,
           doc_id, n_matched, score
         FROM sc ORDER BY score DESC, doc_id ASC LIMIT 20""",
    // Hybrid RRF: BM25 top-50 (the SAME bm25ScoreCtes as q72 — the
    // lexical leg cannot drift) fused with the exact dense top-50 for
    // query vector 0; 1/(60+rank) sums are fixed-order exact doubles.
    "q73_hybrid_rrf" ->
      s"""WITH $bm25ScoreCtes, lex AS (
           SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank
           FROM sc ORDER BY score DESC, doc_id ASC LIMIT 50
         ), dense AS (
           SELECT doc_id, rank FROM (
             SELECT c.vec_id AS doc_id,
               row_number() OVER (ORDER BY list_cosine_similarity(CAST(q.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[])) DESC, c.vec_id ASC) AS rank
             FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
             WHERE q.vec_id = 0
           ) WHERE rank <= 50
         ), f AS (
           SELECT coalesce(l.doc_id, d.doc_id) AS doc_id,
             round(coalesce(1.0 / (60 + l.rank), 0.0) + coalesce(1.0 / (60 + d.rank), 0.0), 6) AS rrf_score,
             l.doc_id IS NOT NULL AS in_lexical,
             d.doc_id IS NOT NULL AS in_dense
           FROM lex l FULL OUTER JOIN dense d ON l.doc_id = d.doc_id
         )
         SELECT row_number() OVER (ORDER BY rrf_score DESC, doc_id ASC) AS rank,
           doc_id, rrf_score, in_lexical, in_dense
         FROM f ORDER BY rrf_score DESC, doc_id ASC LIMIT 20""",
    // Conversion funnel: first click per user, earliest purchase within
    // the hour — all delay math in exact epoch-micros integers.
    "q74_conversion" ->
      """WITH f AS (
           SELECT user_id, min(epoch_us(ts)) AS from_us FROM events
           WHERE event_type = 'click' GROUP BY 1
         ), t2 AS (
           SELECT user_id, epoch_us(ts) AS to_us FROM events
           WHERE event_type = 'purchase'
         ), c AS (
           SELECT f.user_id, min(to_us - from_us) AS delay_us
           FROM f JOIN t2 USING (user_id)
           WHERE to_us >= from_us AND to_us <= from_us + 3600000000
           GROUP BY 1
         )
         SELECT count(*) AS n_from_users,
           count(c.delay_us) AS n_converted,
           round(CASE WHEN count(*) = 0 THEN 0.0
                 ELSE CAST(count(c.delay_us) AS DOUBLE) / CAST(count(*) AS DOUBLE) END, 6) AS conv_rate,
           round(CASE WHEN count(c.delay_us) = 0 THEN NULL
                 ELSE CAST(sum(c.delay_us) AS DOUBLE) / CAST(count(c.delay_us) AS DOUBLE) END, 6) AS avg_delay_us,
           min(c.delay_us) AS min_delay_us
         FROM f LEFT JOIN c USING (user_id)""",
    // Split leakage: holdout = q44's md5 bucket < 10; membership by
    // raw gram strings (hash/string set equivalence, as q18/q41/q61).
    "q76_split_leakage" ->
      """WITH t AS (
           SELECT doc_id,
             CAST(CAST(list_sum(list_transform(range(8),
               j -> CAST(strpos('0123456789abcdef', substring(md5('graft:' || CAST(doc_id AS VARCHAR)), CAST(j + 1 AS INT), 1)) - 1 AS BIGINT) << (4*(7 - CAST(j AS INT))))) AS BIGINT) % 100 AS INT) < 10 AS holdout,
             string_split(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')), ' ') AS toks
           FROM documents
         ), g AS (
           SELECT DISTINCT doc_id, holdout,
             unnest(list_transform(range(1, len(toks) - 1),
               i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS gram
           FROM t WHERE len(toks) >= 3
         ), tg AS (
           SELECT DISTINCT gram FROM g WHERE NOT holdout
         ), ho AS (
           SELECT doc_id, gram FROM g WHERE holdout
         ), l AS (
           SELECT ho.doc_id, count(*) AS n_leaked
           FROM ho JOIN tg USING (gram) GROUP BY 1
         )
         SELECT h.doc_id, h.n_grams,
           coalesce(l.n_leaked, 0) AS n_leaked,
           round(CAST(coalesce(l.n_leaked, 0) AS DOUBLE) / CAST(h.n_grams AS DOUBLE), 6) AS leak_frac
         FROM (SELECT doc_id, count(*) AS n_grams FROM ho GROUP BY 1) h
         LEFT JOIN l USING (doc_id)""",
    // Quality percentile: q15's exact quality expression, rounded 6dp,
    // then percent_rank over (quality, doc_id) — tie-free ordering.
    "q77_quality_percentile" ->
      """WITH n AS (
           SELECT doc_id, lang, text,
             string_split(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')), ' ') AS toks,
             trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')) AS norm
           FROM documents
         ), c AS (
           SELECT doc_id, lang,
             CAST(length(text) AS DOUBLE) AS n_chars,
             CAST(len(toks) AS DOUBLE) AS n_toks,
             CAST(len(list_filter(toks, t -> t IN ('the', 'a', 'an', 'of', 'and', 'or', 'to', 'in', 'is', 'it'))) AS DOUBLE) AS n_stop,
             CAST(length(replace(norm, ' ', '')) AS DOUBLE) AS n_tok_chars
           FROM n
         ), q AS (
           SELECT doc_id, lang,
             round(least(n_chars / 500.0, 1.0) * 0.4
               + least(n_stop / n_toks / 0.1, 1.0) * 0.3
               + (CASE WHEN n_tok_chars / n_toks >= 3.0 AND n_tok_chars / n_toks <= 8.0 THEN 1.0 ELSE 0.0 END) * 0.3, 6) AS quality
           FROM c
         )
         SELECT doc_id, lang, quality,
           round(percent_rank() OVER (PARTITION BY lang ORDER BY quality, doc_id), 6) AS q_pctile
         FROM q""",
    // Media resize: the stub's nearest-neighbor source index is pure
    // integer math over the asMedia metadata (w = id%4*64+64,
    // h = id%3*64+64). Both sides restrict to ASCII docs (byte length
    // == char length) so ord(char-at) == byte-at holds by construction,
    // not by fixture luck.
    "q75_media_resize" ->
      """WITH m AS (
           SELECT doc_id AS id, text, len(text) AS n,
             (doc_id % 4) * 64 + 64 AS w, (doc_id % 3) * 64 + 64 AS h
           FROM documents
           WHERE strlen(text) = len(text)
         )
         SELECT id, 32 AS out_w, 32 AS out_h, 1024 AS n_bytes_out,
           CASE WHEN n = 0 THEN CAST(0 AS BIGINT)
                ELSE CAST(list_sum(list_transform(range(1024), i ->
                  ord(substr(text,
                    CAST(least(((i // 32) * h // 32) * w + ((i % 32) * w // 32), n - 1) + 1 AS INT),
                    1)))) AS BIGINT) END AS byte_sum
         FROM m""",
    // Lloyd k-means replay: see kmeansRefineSql scaladoc.
    "q49_kmeans_refine" -> kmeansRefineSql(k = 8, dim = 64, iters = 2),
    // Stratified portable sample: q44's md5 bucket, per-lang keep rate.
    "q50_stratified_sample" ->
      """SELECT doc_id, lang, source, bucket FROM (
           SELECT doc_id, lang, source,
             CAST(CAST(list_sum(list_transform(range(8),
               j -> CAST(strpos('0123456789abcdef', substring(hx, CAST(j + 1 AS INT), 1)) - 1 AS BIGINT) << (4*(7 - CAST(j AS INT))))) AS BIGINT) % 100 AS INT) AS bucket
           FROM (SELECT doc_id, lang, source,
                   md5('graft:' || CAST(doc_id AS VARCHAR)) AS hx FROM documents)
         ) WHERE bucket < CASE lang WHEN 'en' THEN 10 WHEN 'zh' THEN 80 ELSE 30 END""",
    // Decontamination: membership of corpus 3-grams in the reference
    // gram set, on raw gram strings (the engine joins 64-bit hashes —
    // equivalent modulo the documented 2^-64 collision class). The
    // contaminated flag compares n_shared >= 0.5*n_grams (float-exact).
    "q41_decontaminate" ->
      """WITH t AS (
           SELECT doc_id,
             string_split(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')), ' ') AS toks
           FROM documents
         ), g AS (
           SELECT DISTINCT doc_id,
             unnest(list_transform(range(1, len(toks) - 1),
               i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS gram
           FROM t WHERE len(toks) >= 3
         ), corp AS (
           SELECT * FROM g WHERE doc_id % 10 <> 0
         ), refg AS (
           SELECT DISTINCT gram FROM g WHERE doc_id % 10 = 0
         ), sizes AS (
           SELECT doc_id, count(*) AS n_grams FROM corp GROUP BY 1
         ), shared AS (
           SELECT corp.doc_id, count(*) AS n_shared
           FROM corp JOIN refg USING (gram) GROUP BY 1
         )
         SELECT d.doc_id,
           coalesce(s.n_grams, 0) AS n_grams,
           coalesce(sh.n_shared, 0) AS n_shared,
           CASE WHEN coalesce(s.n_grams, 0) = 0 THEN 0.0
                ELSE round(CAST(coalesce(sh.n_shared, 0) AS DOUBLE) / s.n_grams, 6)
           END AS overlap,
           coalesce(s.n_grams, 0) > 0 AND
             CAST(coalesce(sh.n_shared, 0) AS DOUBLE) >= 0.5 * coalesce(s.n_grams, 0)
             AS contaminated
         FROM (SELECT doc_id FROM documents WHERE doc_id % 10 <> 0) d
         LEFT JOIN sizes s ON d.doc_id = s.doc_id
         LEFT JOIN shared sh ON d.doc_id = sh.doc_id""",
    "q21_knn_brute" ->
      """SELECT q.vec_id AS query_id,
         row_number() OVER (PARTITION BY q.vec_id
           ORDER BY list_cosine_similarity(CAST(q.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[])) DESC,
                    c.vec_id ASC) AS rank,
         c.vec_id AS neighbor_id,
         round(list_cosine_similarity(CAST(q.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[])), 6) AS cos_sim
         FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
         WHERE q.vec_id < 10
         QUALIFY rank <= 5""",
    // LSH ANN: same portable signatures as the engine, exact bucket +
    // every 1-bit flip (multi-probe), exact-cosine rerank of candidates.
    "q22_knn_lsh" ->
      s"""WITH ${srpSigCtes(tables = 8, bits = 8, dim = 64, seed = 42L)},
         probes AS (
           SELECT s.vec_id AS query_id, s.t,
             CASE WHEN f.f = 8 THEN s.sig
                  ELSE xor(s.sig, CAST(1 AS BIGINT) << CAST(f.f AS INT)) END AS sig
           FROM sig s, range(9) f(f) WHERE s.vec_id < 10
         ), cand AS (
           SELECT DISTINCT p.query_id, c.vec_id AS neighbor_id
           FROM probes p JOIN sig c ON p.t = c.t AND p.sig = c.sig
           WHERE p.query_id <> c.vec_id
         ), scored AS (
           SELECT query_id, neighbor_id,
             list_cosine_similarity(CAST(q.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[])) AS sim,
             row_number() OVER (PARTITION BY query_id
               ORDER BY list_cosine_similarity(CAST(q.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[])) DESC,
                        neighbor_id ASC) AS rank
           FROM cand
           JOIN embeddings q ON query_id = q.vec_id
           JOIN embeddings c ON neighbor_id = c.vec_id
         )
         SELECT query_id, rank, neighbor_id, round(sim, 6) AS cos_sim
         FROM scored WHERE rank <= 5""",
    // Near-dup pairs: LSH candidates (one-sided 1-bit multi-probe) +
    // exact-cosine verification — identical candidate set to the engine.
    "q23_embedding_neardup" ->
      s"""WITH ${srpSigCtes(tables = 8, bits = 8, dim = 64, seed = 42L)},
         probes AS (
           SELECT s.vec_id, s.t,
             CASE WHEN f.f = 8 THEN s.sig
                  ELSE xor(s.sig, CAST(1 AS BIGINT) << CAST(f.f AS INT)) END AS sig
           FROM sig s, range(9) f(f)
         ), cand AS (
           SELECT DISTINCT p.vec_id AS id_a, c.vec_id AS id_b
           FROM probes p JOIN sig c ON p.t = c.t AND p.sig = c.sig
           WHERE p.vec_id < c.vec_id
         )
         SELECT id_a, id_b,
           round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])), 6) AS cos_sim
         FROM cand
         JOIN embeddings a ON id_a = a.vec_id
         JOIN embeddings b ON id_b = b.vec_id
         WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])) >= 0.4""",
    // IVF ANN: centroid sample keyed on md5-hex string order, nearest-
    // centroid assignment, nProbe=6 probed clusters, exact rerank.
    "q39_knn_ivf" -> ivfKnnSql(centWhere = "TRUE", assignWhere = "TRUE"),
    "q24_setops" ->
      """SELECT 'both' AS tag, c_custkey FROM
           (SELECT c_custkey FROM customer INTERSECT SELECT o_custkey FROM orders)
         UNION ALL
         SELECT 'no_orders' AS tag, c_custkey FROM
           (SELECT c_custkey FROM customer EXCEPT SELECT o_custkey FROM orders)""",
    "q25_rollup" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
         CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty
         FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)""",
    "q26_scalar_funcs" ->
      """SELECT l_orderkey, l_linenumber,
         year(l_shipdate) AS ship_year, month(l_shipdate) AS ship_month,
         l_returnflag || '-' || l_linestatus AS flag_status,
         upper(l_returnflag) AS flag_upper,
         abs(l_extendedprice - l_quantity * 1000.0) AS price_gap,
         CASE WHEN l_quantity > 25.0 THEN 'big' ELSE 'small' END AS size_class
         FROM lineitem""",
    "q27_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
         WHERE NOT EXISTS (SELECT 1 FROM orders
                           WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')""",
    "q28_distinct_agg" ->
      """SELECT o_custkey, count(DISTINCT o_orderpriority) AS n_priorities,
         count(DISTINCT o_orderstatus) AS n_statuses, count(*) AS n_orders
         FROM orders GROUP BY o_custkey""",
    "q29_window_analytics" ->
      """SELECT o_custkey, o_orderkey,
         rank() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC) AS price_rank,
         lag(o_orderkey, 1) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS prev_orderkey,
         CAST(sum(CAST(o_totalprice AS DECIMAL(18,4)))
           OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total
         FROM orders""",
    "q30_binary_meta" ->
      """SELECT doc_id, octet_length(encode(text)) AS n_bytes,
         hex(encode(substring(text, 1, 8))) AS head_hex
         FROM documents""",
    "q37_pivot" ->
      """SELECT user_id,
         count(*) FILTER (WHERE event_type = 'click') AS n_click,
         count(*) FILTER (WHERE event_type = 'view') AS n_view,
         count(*) FILTER (WHERE event_type = 'purchase') AS n_purchase,
         count(*) FILTER (WHERE event_type = 'signup') AS n_signup,
         count(*) FILTER (WHERE event_type = 'error') AS n_error
         FROM events GROUP BY user_id""",
    "q38_above_avg" ->
      """SELECT o_orderkey, o_custkey, o_totalprice,
         CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) OVER (PARTITION BY o_custkey) AS DOUBLE)
              / count(*) OVER (PARTITION BY o_custkey) AS cust_avg
         FROM orders
         QUALIFY o_totalprice > CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) OVER (PARTITION BY o_custkey) AS DOUBLE)
              / count(*) OVER (PARTITION BY o_custkey)""",
    "q36_array_funcs" ->
      """SELECT vec_id, len(embedding) AS n_dims,
         round(CAST(embedding[1] AS DOUBLE), 6) AS first_dim,
         round(list_aggregate(CAST(embedding AS DOUBLE[]), 'sum'), 6) AS vec_sum,
         round(CAST(list_aggregate(embedding, 'max') AS DOUBLE), 6) AS vec_max
         FROM embeddings""",
    "q32_json_extract" ->
      """SELECT event_id, CAST(json_extract_string(props, '$.k') AS INT) AS prop_k
         FROM events WHERE CAST(json_extract_string(props, '$.k') AS INT) >= 50""",
    // byte histogram via the hex dump: the high nibble of UTF-8 byte i is
    // hex char 2i-1 — pure SQL byte access (DuckDB has no BLOB substring)
    "q31_media_features" -> {
      val bins = (0 until 16).map(i =>
        f"count(d) FILTER (WHERE d = '${i.toHexString}') AS bin_$i%02d").mkString(",\n           ")
      s"""WITH h AS (
           SELECT CAST(doc_id AS BIGINT) AS id, lower(hex(encode(text))) AS hx,
                  CAST(octet_length(encode(text)) AS INT) AS n_bytes
           FROM documents
         ), nb AS (
           SELECT id, substring(hx, CAST(2*unnest(range(1, CAST(length(hx)//2 AS INT)+1))-1 AS INT), 1) AS d
           FROM h
         )
         SELECT h.id, h.n_bytes,
           $bins
         FROM h LEFT JOIN nb ON h.id = nb.id
         GROUP BY h.id, h.n_bytes"""
    },
    "q33_outer_join" ->
      """SELECT c_custkey, count(o_orderkey) AS n_orders,
         CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total_spend
         FROM customer LEFT JOIN orders ON c_custkey = o_custkey
         GROUP BY c_custkey""",
    "q34_cube" ->
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n,
         CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price
         FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)""",
    "q46_repetition" ->
      """WITH t AS (
           SELECT doc_id,
             string_split(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')), ' ') AS toks
           FROM documents
         ), g AS (
           SELECT doc_id, unnest(list_transform(range(1, len(toks)),
             i -> toks[i] || ' ' || toks[i+1])) AS gram
           FROM t WHERE len(toks) >= 2
         ), c AS (
           SELECT doc_id, CAST(count(*) AS INT) AS n_grams,
             CAST(count(DISTINCT gram) AS INT) AS n_distinct_grams
           FROM g GROUP BY 1
         )
         SELECT doc_id, n_grams, n_distinct_grams,
           round(1.0 - CAST(n_distinct_grams AS DOUBLE) / CAST(n_grams AS DOUBLE), 6) AS repetition_ratio
         FROM c""",
    "q42_heavy_hitters" ->
      """WITH tk AS (
           SELECT doc_id,
             unnest(string_split(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')), ' ')) AS token
           FROM documents
         ), c AS (
           SELECT token, count(*) AS n_occurrences, count(DISTINCT doc_id) AS n_docs
           FROM tk GROUP BY 1
         ), r AS (
           SELECT CAST(row_number() OVER (ORDER BY n_occurrences DESC, token) AS INT) AS rank,
                  token, n_occurrences, n_docs
           FROM c
         )
         SELECT rank, token, n_occurrences, n_docs FROM r WHERE rank <= 50""",
    // rank on the ROUNDED score (token tiebreak): both engines rank the
    // same 6-dp values, immune to last-ulp ln() differences
    "q43_tfidf" ->
      """WITH tk AS (
           SELECT doc_id,
             unnest(string_split(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')), ' ')) AS token
           FROM documents
         ), tf AS (
           SELECT doc_id, token, count(*) AS tf FROM tk GROUP BY 1, 2
         ), dfq AS (
           SELECT token, count(*) AS df FROM tf GROUP BY 1
         ), n AS (
           SELECT count(*) AS n_docs FROM documents
         ), s AS (
           SELECT doc_id, token, round(tf * ln(n_docs / df), 6) AS tfidf
           FROM tf JOIN dfq USING (token) CROSS JOIN n
         ), r AS (
           SELECT doc_id,
             CAST(row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, token) AS INT) AS rank,
             token, tfidf
           FROM s
         )
         SELECT doc_id, rank, token, tfidf FROM r WHERE rank <= 5""",
    // bucket = first 32 bits of md5('graft:' || id) mod 100 — the same
    // hex-nibble parse the MinHash oracle uses
    "q44_hash_sample" ->
      """SELECT doc_id, lang, source, n_chars, bucket FROM (
           SELECT doc_id, lang, source, n_chars,
             CAST(CAST(list_sum(list_transform(range(8),
               j -> CAST(strpos('0123456789abcdef', substring(hx, CAST(j + 1 AS INT), 1)) - 1 AS BIGINT) << (4*(7 - CAST(j AS INT))))) AS BIGINT) % 100 AS INT) AS bucket
           FROM (SELECT doc_id, lang, source, n_chars,
                   md5('graft:' || CAST(doc_id AS VARCHAR)) AS hx FROM documents)
         ) WHERE bucket < 10""",
    // explicit quantile interpolation (idx = (n-1)p; v_lo(1-frac) +
    // v_hi·frac) — the same IEEE ops the Spark plan runs, NOT
    // quantile_cont, so the doubles match bit-for-bit pre-round
    "q45_token_quantiles" -> tokenQuantilesSql("documents"),
    // Sampled quantile estimation: the SAME quantile machinery over the
    // deterministic 30/100 md5-bucket sample (q44's formula) joined to
    // the exact profile — estimation error is observable AND
    // engine-exact because the sample is content-keyed, not random.
    "q69_sampled_quantiles" -> {
      val sampled = """(SELECT * FROM (
             SELECT d.*,
               CAST(CAST(list_sum(list_transform(range(8),
                 j -> CAST(strpos('0123456789abcdef', substring(md5('graft:' || CAST(doc_id AS VARCHAR)), CAST(j + 1 AS INT), 1)) - 1 AS BIGINT) << (4*(7 - CAST(j AS INT))))) AS BIGINT) % 100 AS INT) AS bucket
             FROM documents d
           ) WHERE bucket < 30)"""
      s"""WITH ex AS (${tokenQuantilesSql("documents")}),
           es AS (${tokenQuantilesSql(sampled)})
         SELECT ex.lang, ex.n_docs, es.n_docs AS n_docs_sample,
           ex.p50_tokens, es.p50_tokens AS p50_est,
           ex.p90_tokens, es.p90_tokens AS p90_est
         FROM ex JOIN es USING (lang)"""
    },
    // Gopher rules: per-row arithmetic over the normalized token list;
    // distinct-2-gram count via list_distinct == the engine's distinct
    // gram-hash cardinality (collision-free at corpus scale, same
    // identity q46 relies on).
    "q78_gopher_rules" ->
      """WITH t AS (
           SELECT doc_id,
             trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')) AS norm,
             string_split(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')), ' ') AS toks
           FROM documents
         ), c AS (
           SELECT doc_id, len(toks) AS n,
             CAST(len(replace(norm, ' ', '')) AS DOUBLE) / len(toks) AS mean_len,
             len(list_intersect(toks, ['the','a','an','of','and','or','to','in','is','it'])) AS n_stop,
             CAST(len(list_filter(toks, t2 -> regexp_matches(t2, '[a-z]'))) AS DOUBLE) / len(toks) AS alpha_frac,
             CASE WHEN len(toks) >= 2
                  THEN 1.0 - CAST(len(list_distinct(list_transform(range(1, len(toks)),
                    i -> toks[i] || ' ' || toks[i+1]))) AS DOUBLE) / (len(toks) - 1)
                  ELSE 0.0 END AS rep_ratio
           FROM t
         )
         SELECT doc_id,
           n >= 50 AND n <= 100000 AS r_words,
           mean_len >= 3.0 AND mean_len <= 10.0 AS r_mean_len,
           n_stop >= 2 AS r_stop,
           alpha_frac >= 0.8 AS r_alpha,
           rep_ratio <= 0.5 AS r_rep,
           (n >= 50 AND n <= 100000) AND (mean_len >= 3.0 AND mean_len <= 10.0)
             AND n_stop >= 2 AND alpha_frac >= 0.8 AND rep_ratio <= 0.5 AS keep
         FROM c""",
    // PII scrub: identical Java∩RE2 patterns, redaction order
    // email → ipv4 → ssn → phone (placeholders carry no digits/@ so a
    // replacement can never re-match a later pattern).
    "q79_pii_redact" ->
      """SELECT doc_id,
           len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_email,
           len(regexp_extract_all(text, '\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b')) AS n_ipv4,
           len(regexp_extract_all(text, '\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b')) AS n_ssn,
           len(regexp_extract_all(text, '\+?\b(?:[0-9]{1,2}[ .-]?)?\(?[0-9]{3}\)?[ .-]?[0-9]{3}[ .-]?[0-9]{4}\b')) AS n_phone,
           regexp_replace(
             regexp_replace(
               regexp_replace(
                 regexp_replace(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
                 '\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b', '<IP>', 'g'),
               '\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b', '<SSN>', 'g'),
             '\+?\b(?:[0-9]{1,2}[ .-]?)?\(?[0-9]{3}\)?[ .-]?[0-9]{3}[ .-]?[0-9]{4}\b', '<PHONE>', 'g') AS redacted
         FROM documents""",
    // Gram novelty: q61's distinct-gram explode with min-doc_id
    // attribution instead of df counting.
    "q80_gram_novelty" ->
      """WITH t AS (
           SELECT doc_id,
             string_split(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')), ' ') AS toks
           FROM documents
         ), g AS (
           SELECT DISTINCT doc_id,
             unnest(list_transform(range(1, len(toks) - 1),
               i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS gram
           FROM t WHERE len(toks) >= 3
         ), fs AS (
           SELECT gram, min(doc_id) AS first_doc FROM g GROUP BY gram
         )
         SELECT g.doc_id, count(*) AS n_grams,
           CAST(sum(CASE WHEN fs.first_doc < g.doc_id THEN 1 ELSE 0 END) AS BIGINT) AS n_seen,
           round(1.0 - CAST(sum(CASE WHEN fs.first_doc < g.doc_id THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 6) AS novelty
         FROM g JOIN fs USING (gram)
         GROUP BY g.doc_id""",
    // Corpus card: all-algebraic group stats; quality mass in EXACT
    // integer micro-units (the qualityMicro integer form — the only
    // fractional term, 0.3·min(10s/n,1), is half-up via the shifted
    // (2x+y)//(2y) idiom; round(double·1e6) is the tie trap).
    // mean_quality = Σq_micro/n is itself an integer ratio → same
    // shifted intDiv half-up, never round(double, 6). sum() outputs
    // CAST to BIGINT (DuckDB sum is HUGEINT; the driver hash is
    // type-aware).
    "q81_corpus_card" ->
      """WITH nrm AS (
           SELECT source, lang, text,
             trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')) AS norm
           FROM documents
         ), q AS (
           SELECT source, lang,
             md5(norm) AS fp,
             len(string_split(norm, ' ')) AS n_toks,
             least(len(text), 500) * 800
             + (CASE WHEN 10 * len(list_filter(string_split(norm, ' '),
                      t2 -> list_contains(['the','a','an','of','and','or','to','in','is','it'], t2)))
                      >= len(string_split(norm, ' ')) THEN 300000
                ELSE (6000000 * len(list_filter(string_split(norm, ' '),
                        t2 -> list_contains(['the','a','an','of','and','or','to','in','is','it'], t2)))
                      + len(string_split(norm, ' ')))
                     // (2 * len(string_split(norm, ' '))) END)
             + (CASE WHEN len(replace(norm, ' ', '')) >= 3 * len(string_split(norm, ' '))
                      AND len(replace(norm, ' ', '')) <= 8 * len(string_split(norm, ' '))
                THEN 300000 ELSE 0 END) AS q_micro
           FROM nrm
         )
         SELECT source, lang,
           count(*) AS n_docs,
           count(*) - count(DISTINCT fp) AS n_dup_docs,
           CAST(sum(n_toks) AS BIGINT) AS n_tokens,
           min(n_toks) AS min_toks,
           max(n_toks) AS max_toks,
           CAST((2 * CAST(sum(q_micro) AS BIGINT) + count(*)) // (2 * count(*)) AS DOUBLE) / 1e6 AS mean_quality
         FROM q
         GROUP BY source, lang""",
    // Hashed linear classifier: per-token weight = ((first32(md5(tok))
    // % 4096) % 1001) − 500 (the q44 hex-parse idiom per token); the
    // sum is integer-exact. The 6-dp logit is INTEGER half-up on the
    // exact rational (shifted non-negative so // ≡ Spark div) — a
    // round(double) ties at the 6th dp (−2094/32000 at sf0.1) and the
    // engines send shortest-repr ties to different sides.
    "q82_hash_classifier" ->
      """WITH t AS (
           SELECT doc_id,
             string_split(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')), ' ') AS toks
           FROM documents
         ), w AS (
           SELECT doc_id, unnest(toks) AS tok FROM t
         ), b AS (
           SELECT doc_id,
             (CAST(list_sum(list_transform(range(8),
               j -> CAST(strpos('0123456789abcdef', substring(md5(tok), CAST(j + 1 AS INT), 1)) - 1 AS BIGINT) << (4*(7 - CAST(j AS INT))))) AS BIGINT) % 4096) % 1001 - 500 AS wt
           FROM w
         ), agg AS (
           SELECT doc_id, count(*) AS n, CAST(sum(wt) AS BIGINT) AS w_sum
           FROM b GROUP BY doc_id
         )
         SELECT doc_id, n AS n_tokens, w_sum,
           CAST(((w_sum + 500*n) * 2000000 + 500*n) // (1000*n) - 1000000 AS DOUBLE) / 1e6 AS logit,
           w_sum >= 0 AS label
         FROM agg""",
    // Domain mixture: √n_tokens snapped to integer micro-units BEFORE
    // the cross-domain sums (√ is IEEE-correctly-rounded; a raw double
    // Σ would be FP-order-dependent), ratios are single divides.
    "q83_domain_mixture" ->
      """WITH d AS (
           SELECT source AS domain, count(*) AS n_docs,
             CAST(sum(len(string_split(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')), ' '))) AS BIGINT) AS n_tokens
           FROM documents GROUP BY 1
         ), s AS (
           SELECT *, CAST(floor(sqrt(CAST(n_tokens AS DOUBLE)) * 1e6) AS BIGINT) AS s_micro FROM d
         ), t AS (
           SELECT CAST(sum(n_tokens) AS BIGINT) AS tot_tokens,
                  CAST(sum(s_micro) AS BIGINT) AS tot_s FROM s
         )
         SELECT domain, n_docs, n_tokens,
           round(CAST(n_tokens AS DOUBLE) / CAST(tot_tokens AS DOUBLE), 6) AS p_raw,
           round(CAST(s_micro AS DOUBLE) / CAST(tot_s AS DOUBLE), 6) AS p_temp,
           round((CAST(s_micro AS DOUBLE) / CAST(tot_s AS DOUBLE))
               / (CAST(n_tokens AS DOUBLE) / CAST(tot_tokens AS DOUBLE)), 6) AS epochs
         FROM s, t""",
    // Chunk dup: group by the BLOCK STRING where the engine groups by
    // its md5-48 (string/hash grouping equivalence, the q18/q61
    // convention); duplicates preserved — each occurrence is a row.
    "q84_chunk_dup" ->
      """WITH t AS (
           SELECT doc_id,
             string_split(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')), ' ') AS toks
           FROM documents
         ), c AS (
           SELECT doc_id, unnest(list_transform(range(len(toks) // 10),
             i -> array_to_string(toks[(CAST(i AS INT)*10+1):(CAST(i AS INT)*10+10)], ' '))) AS chunk
           FROM t WHERE len(toks) >= 10
         ), g AS (
           SELECT chunk, count(*) AS c FROM c GROUP BY chunk
         )
         SELECT c.doc_id, count(*) AS n_chunks,
           CAST(sum(CASE WHEN g.c >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup,
           round(CAST(sum(CASE WHEN g.c >= 2 THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 6) AS dup_frac
         FROM c JOIN g USING (chunk)
         GROUP BY c.doc_id""",
    // Quality-proportional sample: bucket (md5, seed 'qs', mod 10⁶)
    // vs quality micro-units — integers on both sides of the keep
    // comparison; q_micro = q81's EXACT integer qualityMicro form (a
    // tie flip here would move a whole row in or out of the sample).
    "q85_quality_sample" ->
      """SELECT doc_id, lang, source, q_micro, bucket FROM (
           SELECT doc_id, lang, source,
             least(len(text), 500) * 800
             + (CASE WHEN 10 * len(list_filter(string_split(norm, ' '),
                      t2 -> list_contains(['the','a','an','of','and','or','to','in','is','it'], t2)))
                      >= len(string_split(norm, ' ')) THEN 300000
                ELSE (6000000 * len(list_filter(string_split(norm, ' '),
                        t2 -> list_contains(['the','a','an','of','and','or','to','in','is','it'], t2)))
                      + len(string_split(norm, ' ')))
                     // (2 * len(string_split(norm, ' '))) END)
             + (CASE WHEN len(replace(norm, ' ', '')) >= 3 * len(string_split(norm, ' '))
                      AND len(replace(norm, ' ', '')) <= 8 * len(string_split(norm, ' '))
                THEN 300000 ELSE 0 END) AS q_micro,
             CAST(list_sum(list_transform(range(8),
               j -> CAST(strpos('0123456789abcdef', substring(hx, CAST(j + 1 AS INT), 1)) - 1 AS BIGINT) << (4*(7 - CAST(j AS INT))))) AS BIGINT) % 1000000 AS bucket
           FROM (SELECT doc_id, lang, source, text,
                   trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')) AS norm,
                   md5('qs:' || CAST(doc_id AS VARCHAR)) AS hx FROM documents)
         ) WHERE bucket < q_micro""",
    // PSI drift: integral midpoint split (// on epoch micros), Laplace
    // +1/(tot+k) smoothing, ln under the q67 libm-parity contract.
    "q86_psi_drift" ->
      """WITH e AS (
           SELECT event_type AS category, epoch_us(ts) AS us FROM events
         ), b AS (
           SELECT min(us) AS lo, max(us) AS hi FROM e
         ), h AS (
           SELECT category, us < lo + (hi - lo) // 2 AS first_half FROM e, b
         ), pc AS (
           SELECT category,
             CAST(sum(CASE WHEN first_half THEN 1 ELSE 0 END) AS BIGINT) AS n_first,
             CAST(sum(CASE WHEN NOT first_half THEN 1 ELSE 0 END) AS BIGINT) AS n_second
           FROM h GROUP BY category
         ), t AS (
           SELECT CAST(sum(n_first) AS BIGINT) AS tot_a,
                  CAST(sum(n_second) AS BIGINT) AS tot_b,
                  count(*) AS k FROM pc
         )
         SELECT category, n_first, n_second,
           round(CAST(n_first + 1 AS DOUBLE) / CAST(tot_a + k AS DOUBLE), 6) AS p_first,
           round(CAST(n_second + 1 AS DOUBLE) / CAST(tot_b + k AS DOUBLE), 6) AS p_second,
           round((CAST(n_first + 1 AS DOUBLE) / CAST(tot_a + k AS DOUBLE)
                - CAST(n_second + 1 AS DOUBLE) / CAST(tot_b + k AS DOUBLE))
             * ln((CAST(n_first + 1 AS DOUBLE) / CAST(tot_a + k AS DOUBLE))
                / (CAST(n_second + 1 AS DOUBLE) / CAST(tot_b + k AS DOUBLE))), 6) AS psi_term
         FROM pc, t""",
    // PQ ADC replay: codebooks = the q49 c0 content-sample sliced per
    // subspace; codes/lut by per-subspace L2 argmin (same fold the
    // kernels run); ADC = join codes↔lut on (subspace, code), ranked
    // on the ROUNDED distance with id tiebreak (metric rule).
    "q87_pq_adc" -> pqAdcSql(m = 8, subDim = 8, ks = 16, k = 10),
    // PQ + exact re-rank: the q87 ADC replay (at shortlist size) feeds
    // an exact direct-fold L2 re-scoring — same fold as VectorL2Sq —
    // ranked on the ROUNDED distance with id tiebreak.
    "q88_pq_rerank" ->
      s"""WITH sl AS (${pqAdcSql(m = 8, subDim = 8, ks = 16, k = 50)}),
           e2 AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
           ex AS (
             SELECT sl.query_id, sl.neighbor_id,
               round(list_sum(list_transform(range(64), i ->
                 (q.v[CAST(i + 1 AS INT)] - c.v[CAST(i + 1 AS INT)])
               * (q.v[CAST(i + 1 AS INT)] - c.v[CAST(i + 1 AS INT)]))), 6) AS l2_dist
             FROM sl
             JOIN e2 q ON q.vec_id = sl.query_id
             JOIN e2 c ON c.vec_id = sl.neighbor_id
           )
           SELECT query_id, CAST(rnk AS INT) AS rank, neighbor_id, l2_dist FROM (
             SELECT query_id, neighbor_id, l2_dist,
               row_number() OVER (PARTITION BY query_id
                 ORDER BY l2_dist ASC, neighbor_id ASC) AS rnk
             FROM ex
           ) WHERE rnk <= 10""",
    // Source overlap: gram STRINGS where the engine joins 64-bit
    // hashes (hash/string set equivalence, the q18/q41/q61 class).
    "q89_source_overlap" ->
      """WITH t AS (
           SELECT source,
             string_split(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')), ' ') AS toks
           FROM documents
         ), g AS (
           SELECT DISTINCT source,
             unnest(list_transform(range(1, len(toks) - 1),
               i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS gram
           FROM t WHERE len(toks) >= 3
         ), sz AS (
           SELECT source, count(*) AS n FROM g GROUP BY 1
         ), sh AS (
           SELECT a.source AS source_a, b.source AS source_b, count(*) AS n_shared
           FROM g a JOIN g b USING (gram)
           WHERE a.source < b.source
           GROUP BY 1, 2
         )
         SELECT source_a, source_b, n_shared,
           round(CAST(n_shared AS DOUBLE) / CAST(na.n + nb.n - n_shared AS DOUBLE), 6) AS jaccard
         FROM sh
         JOIN sz na ON na.source = sh.source_a
         JOIN sz nb ON nb.source = sh.source_b""",
    // KMV source overlap: q52's parse12 bottom-k sketch per source,
    // pairwise merge-k with membership flags; jaccard via the q82
    // integer half-up micro form, union via q52's (k−1)·2^48/h_k.
    "q90_kmv_source_overlap" ->
      """WITH t AS (
           SELECT source,
             string_split(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')), ' ') AS toks
           FROM documents
         ), gr AS (
           SELECT DISTINCT source,
             unnest(list_transform(range(1, len(toks) - 1),
               i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS gram
           FROM t WHERE len(toks) >= 3
         ), h AS (
           SELECT DISTINCT source,
             CAST(list_sum(list_transform(range(12), j -> CAST(strpos('0123456789abcdef', substring(md5(gram), CAST(j + 1 AS INT), 1)) - 1 AS BIGINT) << (4*(11 - CAST(j AS INT))))) AS BIGINT) AS h
           FROM gr
         ), bk AS (
           SELECT source, h FROM h
           QUALIFY row_number() OVER (PARTITION BY source ORDER BY h) <= 64
         ), prs AS (
           SELECT a.source AS sa, b.source AS sb
           FROM (SELECT DISTINCT source FROM bk) a, (SELECT DISTINCT source FROM bk) b
           WHERE a.source < b.source
         ), m AS (
           SELECT sa, sb, h, max(ina) AS ina, max(inb) AS inb FROM (
             SELECT prs.sa, prs.sb, bk.h, 1 AS ina, 0 AS inb
             FROM prs JOIN bk ON bk.source = prs.sa
             UNION ALL
             SELECT prs.sa, prs.sb, bk.h, 0 AS ina, 1 AS inb
             FROM prs JOIN bk ON bk.source = prs.sb
           ) GROUP BY 1, 2, 3
         ), tk AS (
           SELECT sa, sb, h, ina, inb,
             row_number() OVER (PARTITION BY sa, sb ORDER BY h) AS rn
           FROM m QUALIFY rn <= 64
         ), agg AS (
           SELECT sa, sb, count(*) AS sample_k,
             max(CASE WHEN rn = 64 THEN h END) AS hk,
             CAST(sum(CASE WHEN ina = 1 AND inb = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_both
           FROM tk GROUP BY 1, 2
         )
         SELECT sa AS source_a, sb AS source_b,
           CAST(sample_k AS BIGINT) AS sample_k, n_both,
           CAST((n_both * 2000000 + sample_k) // (sample_k * 2) AS DOUBLE) / 1e6 AS jaccard_est,
           round(CASE WHEN hk IS NULL THEN CAST(sample_k AS DOUBLE)
                 ELSE CAST(63 AS DOUBLE) * CAST(281474976710656 AS DOUBLE) / CAST(hk AS DOUBLE) END, 6) AS union_est
         FROM agg""",
    // Cluster purity: the q49 k-means replay (identical partition) +
    // label cross-tab; majority by (n DESC, label ASC), purity via the
    // q82 integer half-up micro form.
    "q92_cluster_purity" ->
      s"""WITH asg AS (SELECT vec_id, cluster FROM (${kmeansRefineSql(k = 8, dim = 64, iters = 2)})),
           cont AS (
             SELECT asg.cluster, e.label, count(*) AS n
             FROM asg JOIN embeddings e USING (vec_id)
             GROUP BY 1, 2
           )
           SELECT cluster, n_vecs, majority_label, n_majority,
             CAST((n_majority * 2000000 + n_vecs) // (n_vecs * 2) AS DOUBLE) / 1e6 AS purity
           FROM (
             SELECT cluster, label AS majority_label, CAST(n AS BIGINT) AS n_majority,
               CAST(sum(n) OVER (PARTITION BY cluster) AS BIGINT) AS n_vecs,
               row_number() OVER (PARTITION BY cluster ORDER BY n DESC, label ASC) AS rn
             FROM cont
           ) WHERE rn = 1""",
    // Numeric profile: identical fixed-point micro-unit pipeline —
    // integral bin div (non-negative // ≡ Spark div), moments from
    // exact integer/decimal sums, frac via the q82 half-up micro form.
    "q91_numeric_profile" ->
      """WITH v AS (
           SELECT CAST(CAST(o_totalprice AS DECIMAL(18,4)) * 10000 AS BIGINT) AS vv FROM orders
         ), s AS (
           SELECT count(*) AS n, min(vv) AS lo, max(vv) AS hi,
                  CAST(sum(vv) AS BIGINT) AS s1,
                  sum(CAST(vv AS DECIMAL(38,0)) * CAST(vv AS DECIMAL(38,0))) AS s2
           FROM v
         ), b AS (
           SELECT CASE WHEN s.hi = s.lo THEN 0
                       ELSE least(19, ((vv - lo) * 20) // (hi - lo)) END AS bin,
                  n, lo, hi, s1, s2
           FROM v, s
         ), g AS (
           SELECT bin, n, lo, hi, s1, s2, count(*) AS nb FROM b GROUP BY 1,2,3,4,5,6
         )
         SELECT CAST(bin AS BIGINT) AS bin,
           round((lo + bin * (hi - lo) / 20) / 10000.0, 6) AS bin_lo,
           round((lo + (bin + 1) * (hi - lo) / 20) / 10000.0, 6) AS bin_hi,
           nb AS n,
           CAST((nb * 2000000 + n) // (n * 2) AS DOUBLE) / 1e6 AS frac,
           round(CAST(s1 AS DOUBLE) / n / 10000.0, 6) AS mean,
           round(sqrt(greatest(CAST(s2 AS DOUBLE) / n
             - (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n), 0)) / 10000.0, 6) AS stddev
         FROM g""",
    // Vocab coverage: limit-before-window top-V; cum window sum CAST to
    // BIGINT (type parity); coverage = cum/total via the q82 integer
    // half-up micro form.
    "q93_vocab_coverage" ->
      """WITH tok AS (
           SELECT unnest(string_split(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')), ' ')) AS token
           FROM documents
         ), vocab AS (
           SELECT token, count(*) AS n FROM tok GROUP BY token
         ), tot AS (
           SELECT CAST(sum(n) AS BIGINT) AS tot FROM vocab
         ), top AS (
           SELECT token, n FROM vocab ORDER BY n DESC, token LIMIT 50
         ), rk AS (
           SELECT row_number() OVER (ORDER BY n DESC, token) AS rank, token, n,
             CAST(sum(n) OVER (ORDER BY n DESC, token
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_n
           FROM top
         )
         SELECT rank, token, n, cum_n,
           CAST((2000000 * CAST(cum_n AS HUGEINT) + tot) // (2 * CAST(tot AS HUGEINT)) AS DOUBLE) / 1e6 AS coverage
         FROM rk, tot""",
    // Bigram PMI: adjacent pairs by 1-based index; the ln fold order is
    // written IDENTICALLY to the Spark expression (left-assoc:
    // ((((ln n_ab + ln U) + ln U) − ln n_a) − ln n_b) − ln B).
    "q94_pmi_bigrams" ->
      """WITH t AS (
           SELECT string_split(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')), ' ') AS toks
           FROM documents
         ), tok AS (
           SELECT unnest(toks) AS token FROM t
         ), uni AS (
           SELECT token, count(*) AS cnt FROM tok GROUP BY token
         ), u AS (
           SELECT CAST(sum(cnt) AS BIGINT) AS u FROM uni
         ), bi AS (
           SELECT toks[i] AS tok_a, toks[i + 1] AS tok_b
           FROM (SELECT toks, unnest(generate_series(1, len(toks) - 1)) AS i
                 FROM t WHERE len(toks) >= 2)
         ), big AS (
           SELECT tok_a, tok_b, count(*) AS n_ab FROM bi GROUP BY 1, 2
         ), b AS (
           SELECT CAST(sum(n_ab) AS BIGINT) AS b FROM big
         ), top AS (
           SELECT tok_a, tok_b, n_ab FROM big WHERE n_ab >= 5
           ORDER BY n_ab DESC, tok_a, tok_b LIMIT 30
         )
         SELECT row_number() OVER (ORDER BY n_ab DESC, tok_a, tok_b) AS rank,
           tok_a, tok_b, n_ab, ua.cnt AS n_a, ub.cnt AS n_b,
           round(ln(CAST(n_ab AS DOUBLE)) + ln(CAST(u.u AS DOUBLE)) + ln(CAST(u.u AS DOUBLE))
             - ln(CAST(ua.cnt AS DOUBLE)) - ln(CAST(ub.cnt AS DOUBLE)) - ln(CAST(b.b AS DOUBLE)), 6) AS pmi
         FROM top
         JOIN uni ua ON top.tok_a = ua.token
         JOIN uni ub ON top.tok_b = ub.token
         CROSS JOIN u CROSS JOIN b""",
    // Zipf OLS: the ≤R points collected into ONE rank-ordered list and
    // folded in list order (q59's ordered-fold precedent) so the double
    // sums match Spark's left fold; ln under the q67 libm contract.
    "q95_zipf_fit" ->
      """WITH tok AS (
           SELECT unnest(string_split(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')), ' ')) AS token
           FROM documents
         ), vocab AS (
           SELECT token, count(*) AS n FROM tok GROUP BY token
         ), top AS (
           SELECT token, n FROM vocab ORDER BY n DESC, token LIMIT 100
         ), pts AS (
           SELECT row_number() OVER (ORDER BY n DESC, token) AS rank,
             ln(CAST(row_number() OVER (ORDER BY n DESC, token) AS DOUBLE)) AS x,
             ln(CAST(n AS DOUBLE)) AS y
           FROM top
         ), s AS (
           SELECT CAST(count(*) AS BIGINT) AS n_terms,
             list_sum(list_transform(list(x ORDER BY rank), v -> v)) AS sx,
             list_sum(list_transform(list(y ORDER BY rank), v -> v)) AS sy,
             list_sum(list_transform(list({'x': x, 'y': y} ORDER BY rank), e -> e.x * e.y)) AS sxy,
             list_sum(list_transform(list(x ORDER BY rank), v -> v * v)) AS sxx,
             list_sum(list_transform(list(y ORDER BY rank), v -> v * v)) AS syy
           FROM pts
         )
         SELECT n_terms,
           round((CAST(n_terms AS DOUBLE) * sxy - sx * sy)
             / (CAST(n_terms AS DOUBLE) * sxx - sx * sx), 6) AS slope,
           round((sy - ((CAST(n_terms AS DOUBLE) * sxy - sx * sy)
             / (CAST(n_terms AS DOUBLE) * sxx - sx * sx)) * sx)
             / CAST(n_terms AS DOUBLE), 6) AS intercept,
           round(((CAST(n_terms AS DOUBLE) * sxy - sx * sy) * (CAST(n_terms AS DOUBLE) * sxy - sx * sy))
             / ((CAST(n_terms AS DOUBLE) * sxx - sx * sx) * (CAST(n_terms AS DOUBLE) * syy - sy * sy)), 6) AS r2
         FROM s""",
    // Perplexity band: q67's scored frame + q44's md5 bucket (seed
    // 'ppl', keep 20/100) + q45's spelled-out interpolation; the band
    // compare runs on the 6-dp-ROUNDED score both sides.
    "q96_ppl_band" ->
      """WITH tok AS (
           SELECT doc_id, unnest(string_split(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')), ' ')) AS token
           FROM documents
         ), vocab AS (
           SELECT token, count(*) AS c FROM tok GROUP BY token
         ), tot AS (
           SELECT count(*) AS n_total FROM tok
         ), scored AS (
           SELECT t.doc_id, count(*) AS n_tokens,
             round(sum(ln(CAST(v.c AS DOUBLE) / CAST(tot.n_total AS DOUBLE))) / count(*), 6) AS mean_logprob
           FROM tok t JOIN vocab v USING (token) CROSS JOIN tot
           GROUP BY t.doc_id
         ), samp AS (
           SELECT s.doc_id, s.mean_logprob FROM scored s JOIN (
             SELECT doc_id FROM (
               SELECT doc_id,
                 CAST(list_sum(list_transform(range(8),
                   j -> CAST(strpos('0123456789abcdef', substring(hx, CAST(j + 1 AS INT), 1)) - 1 AS BIGINT) << (4*(7 - CAST(j AS INT))))) AS BIGINT) % 100 AS bucket
               FROM (SELECT doc_id, md5('ppl:' || CAST(doc_id AS VARCHAR)) AS hx FROM documents))
             WHERE bucket < 20) USING (doc_id)
         ), rk AS (
           SELECT mean_logprob,
             row_number() OVER (ORDER BY mean_logprob, doc_id) AS rn,
             count(*) OVER () AS n
           FROM samp
         ), bounds AS (
           SELECT
             round(sum(CASE
               WHEN rn = floor(CAST(n - 1 AS DOUBLE) * 0.1) + 1
                 THEN mean_logprob * (1.0 - (CAST(n - 1 AS DOUBLE) * 0.1 - floor(CAST(n - 1 AS DOUBLE) * 0.1)))
               WHEN rn = floor(CAST(n - 1 AS DOUBLE) * 0.1) + 2
                 THEN mean_logprob * (CAST(n - 1 AS DOUBLE) * 0.1 - floor(CAST(n - 1 AS DOUBLE) * 0.1))
               ELSE 0.0 END), 6) AS lo_bound,
             round(sum(CASE
               WHEN rn = floor(CAST(n - 1 AS DOUBLE) * 0.9) + 1
                 THEN mean_logprob * (1.0 - (CAST(n - 1 AS DOUBLE) * 0.9 - floor(CAST(n - 1 AS DOUBLE) * 0.9)))
               WHEN rn = floor(CAST(n - 1 AS DOUBLE) * 0.9) + 2
                 THEN mean_logprob * (CAST(n - 1 AS DOUBLE) * 0.9 - floor(CAST(n - 1 AS DOUBLE) * 0.9))
               ELSE 0.0 END), 6) AS hi_bound
           FROM rk
         )
         SELECT doc_id, n_tokens, mean_logprob, lo_bound, hi_bound,
           mean_logprob >= lo_bound AND mean_logprob <= hi_bound AS keep
         FROM scored, bounds""",
    // UniMax epoch-capped mix: the water-filling closed form — prefix
    // windows over the per-lang aggregate, all-integer allocations,
    // epochs via the q82 half-up micro form. B = 3,000,000, E = 3.
    "q97_epoch_mix" ->
      """WITH d AS (
           SELECT lang,
             CAST(len(string_split(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')), ' ')) AS BIGINT) AS t
           FROM documents
         ), pl AS (
           SELECT lang, count(*) AS n_docs, CAST(sum(t) AS BIGINT) AS n_tokens
           FROM d GROUP BY lang
         ), rk AS (
           SELECT lang, n_docs, n_tokens,
             row_number() OVER (ORDER BY n_tokens, lang) AS i,
             count(*) OVER () AS l,
             CAST(coalesce(sum(n_tokens) OVER (ORDER BY n_tokens, lang
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum
           FROM pl
         ), fl AS (
           SELECT lang, n_docs, n_tokens,
             min(CASE WHEN n_tokens * 3 * (l - i + 1) <= 3000000 - 3 * cum
                 THEN 1 ELSE 0 END)
               OVER (ORDER BY n_tokens, lang
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) = 1 AS capped
           FROM rk
         ), caps AS (
           SELECT CAST(coalesce(sum(CASE WHEN capped THEN n_tokens END), 0) AS BIGINT) AS cap_tok,
             CAST(coalesce(sum(CASE WHEN capped THEN 1 END), 0) AS BIGINT) AS n_cap,
             count(*) AS l2
           FROM fl
         ), alloc AS (
           SELECT lang, n_docs, n_tokens, capped,
             CAST(CASE WHEN capped THEN n_tokens * 3
                  ELSE (3000000 - 3 * cap_tok) // (l2 - n_cap) END AS BIGINT) AS alloc_tokens
           FROM fl, caps
         )
         SELECT lang, n_docs, n_tokens, capped, alloc_tokens,
           CAST((2000000 * alloc_tokens + n_tokens) // (2 * n_tokens) AS DOUBLE) / 1e6 AS epochs
         FROM alloc""",
    // Bigram LM: add-one smoothing, counts from the corpus itself,
    // V = |unigram vocab|; Σ ln / n is the q67 aggregation contract.
    "q98_bigram_lm" ->
      """WITH t AS (
           SELECT doc_id, string_split(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')), ' ') AS toks
           FROM documents
         ), tok AS (
           SELECT unnest(toks) AS token FROM t
         ), uni AS (
           SELECT token, count(*) AS c_a FROM tok GROUP BY token
         ), v AS (
           SELECT count(*) AS v FROM uni
         ), bi AS (
           SELECT doc_id, toks[i] AS tok_a, toks[i + 1] AS tok_b
           FROM (SELECT doc_id, toks, unnest(generate_series(1, len(toks) - 1)) AS i
                 FROM t WHERE len(toks) >= 2)
         ), big AS (
           SELECT tok_a, tok_b, count(*) AS c_ab FROM bi GROUP BY 1, 2
         )
         SELECT b.doc_id, count(*) AS n_bigrams,
           round(sum(ln((CAST(g.c_ab AS DOUBLE) + 1.0)
             / (CAST(u.c_a AS DOUBLE) + CAST(v.v AS DOUBLE)))) / count(*), 6) AS mean_logprob
         FROM bi b
         JOIN big g USING (tok_a, tok_b)
         JOIN uni u ON b.tok_a = u.token
         CROSS JOIN v
         GROUP BY b.doc_id""",
    // Dim-ablation recall: q21's brute-force ranking on list_slice
    // prefixes vs the full-dim truth; hit counts exact integers, the
    // q60 recall-join shape.
    "q99_dim_ablation" ->
      """WITH truth AS (
           SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id
           FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
           WHERE q.vec_id < 5
           QUALIFY row_number() OVER (PARTITION BY q.vec_id
             ORDER BY list_cosine_similarity(CAST(q.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[])) DESC,
                      c.vec_id ASC) <= 5
         ), approx AS (
           SELECT dd.d AS dims, q.vec_id AS query_id, c.vec_id AS neighbor_id
           FROM (SELECT unnest([16, 32, 64]) AS d) dd
           CROSS JOIN embeddings q
           JOIN embeddings c ON q.vec_id <> c.vec_id
           WHERE q.vec_id < 5
           QUALIFY row_number() OVER (PARTITION BY dd.d, q.vec_id
             ORDER BY list_cosine_similarity(
                 CAST(list_slice(q.embedding, 1, CAST(dd.d AS INT)) AS DOUBLE[]),
                 CAST(list_slice(c.embedding, 1, CAST(dd.d AS INT)) AS DOUBLE[])) DESC,
                      c.vec_id ASC) <= 5
         ), hits AS (
           SELECT a.dims, a.query_id,
             CAST(sum(CASE WHEN t.neighbor_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hits
           FROM approx a
           LEFT JOIN truth t
             ON a.query_id = t.query_id AND a.neighbor_id = t.neighbor_id
           GROUP BY 1, 2
         ), tc AS (
           SELECT query_id, count(*) AS n_truth FROM truth GROUP BY 1
         )
         SELECT h.query_id, CAST(h.dims AS INT) AS dims, tc.n_truth, h.n_hits,
           round(CAST(h.n_hits AS DOUBLE) / tc.n_truth, 6) AS recall
         FROM hits h JOIN tc USING (query_id)""",
    "q100_incremental_dedup" -> incrementalDedupSql,
    // DSIR: md5-32 token buckets mod 1024 (q82's nibble idiom), Laplace
    // log-ratio λ floored to micro-units on the bucket frame, per-doc
    // Σ exact-integer — output all-BIGINT, no rounding surface.
    "q103_dsir_weights" ->
      """WITH tok AS (
           SELECT doc_id, (source IN ('src0', 'src1')) AS tgt,
             unnest(string_split(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')), ' ')) AS token
           FROM documents
         ), b AS (
           SELECT doc_id, tgt,
             CAST(CAST(list_sum(list_transform(range(8),
               j -> CAST(strpos('0123456789abcdef', substring(md5(token), CAST(j + 1 AS INT), 1)) - 1 AS BIGINT) << (4*(7 - CAST(j AS INT))))) AS BIGINT) % 1024 AS INT) AS bucket
           FROM tok
         ), counts AS (
           SELECT bucket,
             CAST(sum(CASE WHEN tgt THEN 1 ELSE 0 END) AS BIGINT) AS c_t,
             CAST(sum(CASE WHEN tgt THEN 0 ELSE 1 END) AS BIGINT) AS c_r
           FROM b GROUP BY 1
         ), tot AS (
           SELECT CAST(sum(CASE WHEN tgt THEN 1 ELSE 0 END) AS BIGINT) AS t_tot,
                  CAST(sum(CASE WHEN tgt THEN 0 ELSE 1 END) AS BIGINT) AS r_tot
           FROM b
         ), lam AS (
           SELECT bucket,
             CAST(floor(1e6 * (ln(CAST(c_t + 1 AS DOUBLE) / CAST(t_tot + 1024 AS DOUBLE))
                             - ln(CAST(c_r + 1 AS DOUBLE) / CAST(r_tot + 1024 AS DOUBLE)))) AS BIGINT) AS lam_micro
           FROM counts CROSS JOIN tot
         )
         SELECT b.doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
           CAST(sum(lam_micro) AS BIGINT) AS logw_micro
         FROM b JOIN lam USING (bucket)
         GROUP BY b.doc_id""",
    // Boilerplate bigrams: DISTINCT (doc, source, gram), per-(source,
    // gram) df vs source size (relative threshold df·5 ≥ n_src, df ≥
    // 2), per-doc fraction via the q82 integer half-up micro form.
    "q104_boilerplate" ->
      """WITH t AS (
           SELECT doc_id, source,
             string_split(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')), ' ') AS toks
           FROM documents
         ), g AS (
           SELECT DISTINCT doc_id, source,
             unnest(list_transform(range(1, len(toks)),
               i -> toks[i] || ' ' || toks[i+1])) AS gram
           FROM t WHERE len(toks) >= 2
         ), sz AS (
           SELECT source, count(DISTINCT doc_id) AS n_src FROM g GROUP BY 1
         ), fl AS (
           SELECT source, gram,
             (df * 5 >= n_src AND df >= 2) AS boiler
           FROM (SELECT source, gram, count(*) AS df FROM g GROUP BY 1, 2)
           JOIN sz USING (source)
         )
         SELECT g.doc_id, g.source,
           CAST(count(*) AS BIGINT) AS n_grams,
           CAST(sum(CASE WHEN boiler THEN 1 ELSE 0 END) AS BIGINT) AS n_boiler,
           CAST((sum(CASE WHEN boiler THEN 1 ELSE 0 END) * 2000000 + count(*))
             // (count(*) * 2) AS DOUBLE) / 1e6 AS boiler_frac
         FROM g JOIN fl USING (source, gram)
         GROUP BY 1, 2""",
    // Efraimidis–Spirakis: u = (md5-32(seed:id)+1)/2^32 (exact dyadic),
    // key = round(ln(u)/w, 6), top-100 by (key DESC, id) — the metric
    // rule (ln outputs can't land exactly on 6-dp ties).
    "q105_weighted_sample" ->
      """WITH h AS (
           SELECT doc_id, CAST(n_chars AS BIGINT) AS weight,
             CAST(list_sum(list_transform(range(8),
               j -> CAST(strpos('0123456789abcdef', substring(md5('es:' || CAST(doc_id AS VARCHAR)), CAST(j + 1 AS INT), 1)) - 1 AS BIGINT) << (4*(7 - CAST(j AS INT))))) AS BIGINT) AS m
           FROM documents WHERE n_chars > 0
         ), k AS (
           SELECT doc_id, weight,
             round(ln(CAST(m + 1 AS DOUBLE) / 4294967296.0) / CAST(weight AS DOUBLE), 6) AS es_key
           FROM h
         )
         SELECT * FROM (
           SELECT CAST(row_number() OVER (ORDER BY es_key DESC, doc_id ASC) AS INT) AS rank,
             doc_id, weight, es_key
           FROM k
         ) WHERE rank <= 100""",
    // Hard negatives: q21's brute-kNN oracle + label-inequality join
    // predicate; neighbor label carried through.
    "q106_hard_negatives" ->
      """SELECT q.vec_id AS query_id,
         CAST(row_number() OVER (PARTITION BY q.vec_id
           ORDER BY list_cosine_similarity(CAST(q.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[])) DESC,
                    c.vec_id ASC) AS INT) AS rank,
         c.vec_id AS neighbor_id, c.label AS neighbor_label,
         round(list_cosine_similarity(CAST(q.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[])), 6) AS cos_sim
         FROM embeddings q JOIN embeddings c
           ON q.vec_id <> c.vec_id AND q.label <> c.label
         WHERE q.vec_id < 10
         QUALIFY rank <= 5""",
    // Per-group E-S sample: q105's key, ranked within each source.
    "q107_group_weighted_sample" ->
      """WITH h AS (
           SELECT source, doc_id, CAST(n_chars AS BIGINT) AS weight,
             CAST(list_sum(list_transform(range(8),
               j -> CAST(strpos('0123456789abcdef', substring(md5('es:' || CAST(doc_id AS VARCHAR)), CAST(j + 1 AS INT), 1)) - 1 AS BIGINT) << (4*(7 - CAST(j AS INT))))) AS BIGINT) AS m
           FROM documents WHERE n_chars > 0
         ), k AS (
           SELECT source, doc_id, weight,
             round(ln(CAST(m + 1 AS DOUBLE) / 4294967296.0) / CAST(weight AS DOUBLE), 6) AS es_key
           FROM h
         )
         SELECT * FROM (
           SELECT source,
             CAST(row_number() OVER (PARTITION BY source ORDER BY es_key DESC, doc_id ASC) AS INT) AS sample_rank,
             doc_id, weight, es_key
           FROM k
         ) WHERE sample_rank <= 5""",
    // Source-vs-corpus JS divergence: q103's md5-32 buckets; per-bucket
    // 2·JS term floored to micro-units on the tiny (source × occupied
    // bucket) frame, Σ exact integer — p = 0 term is 0 by convention.
    "q108_source_js_divergence" ->
      """WITH tok AS (
           SELECT source,
             unnest(string_split(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')), ' ')) AS token
           FROM documents
         ), b AS (
           SELECT source,
             CAST(CAST(list_sum(list_transform(range(8),
               j -> CAST(strpos('0123456789abcdef', substring(md5(token), CAST(j + 1 AS INT), 1)) - 1 AS BIGINT) << (4*(7 - CAST(j AS INT))))) AS BIGINT) % 1024 AS INT) AS bucket
           FROM tok
         ), sb AS (
           SELECT source, bucket, CAST(count(*) AS BIGINT) AS c_sb
           FROM b GROUP BY 1, 2
         ), g AS (
           SELECT bucket, CAST(sum(c_sb) AS BIGINT) AS c_b FROM sb GROUP BY 1
         ), ns AS (
           SELECT source, CAST(sum(c_sb) AS BIGINT) AS n_s FROM sb GROUP BY 1
         ), tot AS (
           SELECT CAST(sum(c_sb) AS BIGINT) AS n_tot FROM sb
         ), terms AS (
           SELECT ns.source, ns.n_s,
             CAST(floor(1e6 * (
               CASE WHEN COALESCE(sb.c_sb, 0) > 0
                 THEN (CAST(sb.c_sb AS DOUBLE) / CAST(ns.n_s AS DOUBLE))
                   * ln((CAST(sb.c_sb AS DOUBLE) / CAST(ns.n_s AS DOUBLE))
                     / (((CAST(COALESCE(sb.c_sb, 0) AS DOUBLE) / CAST(ns.n_s AS DOUBLE)) + (CAST(g.c_b AS DOUBLE) / CAST(tot.n_tot AS DOUBLE))) / 2.0))
                 ELSE 0.0 END
               + (CAST(g.c_b AS DOUBLE) / CAST(tot.n_tot AS DOUBLE))
                 * ln((CAST(g.c_b AS DOUBLE) / CAST(tot.n_tot AS DOUBLE))
                   / (((CAST(COALESCE(sb.c_sb, 0) AS DOUBLE) / CAST(ns.n_s AS DOUBLE)) + (CAST(g.c_b AS DOUBLE) / CAST(tot.n_tot AS DOUBLE))) / 2.0))
             )) AS BIGINT) AS term2_micro
           FROM ns CROSS JOIN g
           LEFT JOIN sb ON sb.source = ns.source AND sb.bucket = g.bucket
           CROSS JOIN tot
         )
         SELECT source, max(n_s) AS n_tokens,
           CAST(sum(term2_micro) AS BIGINT) AS js2_micro
         FROM terms GROUP BY 1""",
    // Leakage-safe split: q47's components label every clustered doc,
    // singletons fall back to their own id; the q44 md5 bucket idiom
    // runs on the CLUSTER id so near-dups share a split.
    "q109_leakage_safe_split" ->
      s"""WITH comp AS ($componentsSql),
         a AS (
           SELECT d.doc_id, COALESCE(c.cluster_id, d.doc_id) AS cluster_id
           FROM documents d LEFT JOIN comp c ON d.doc_id = c.doc_id
         ), bk AS (
           SELECT doc_id, cluster_id,
             CAST(CAST(list_sum(list_transform(range(8),
               j -> CAST(strpos('0123456789abcdef', substring(md5('graft:' || CAST(cluster_id AS VARCHAR)), CAST(j + 1 AS INT), 1)) - 1 AS BIGINT) << (4*(7 - CAST(j AS INT))))) AS BIGINT) % 100 AS INT) AS bucket
           FROM a
         )
         SELECT doc_id, cluster_id, bucket,
           CASE WHEN bucket < 10 THEN 'holdout' ELSE 'train' END AS split
         FROM bk""",
    // Winsorize: q45's contribution-sum percentile interpolation per
    // source (one copy of the rank/frac formulas), clip against the
    // 6-dp-rounded bounds.
    "q110_winsorize" ->
      """WITH base AS (
           SELECT doc_id, source AS grp, CAST(n_chars AS DOUBLE) AS v
           FROM documents
         ), r AS (
           SELECT doc_id, grp, v,
             row_number() OVER (PARTITION BY grp ORDER BY v) AS rn,
             count(*) OVER (PARTITION BY grp) AS n
           FROM base
         ), b AS (
           SELECT grp,
             round(sum(CASE WHEN rn = CAST(floor(CAST(n - 1 AS DOUBLE) * 0.05) AS BIGINT) + 1
                         THEN v * (1.0 - (CAST(n - 1 AS DOUBLE) * 0.05 - floor(CAST(n - 1 AS DOUBLE) * 0.05)))
                       WHEN rn = CAST(floor(CAST(n - 1 AS DOUBLE) * 0.05) AS BIGINT) + 2
                         THEN v * (CAST(n - 1 AS DOUBLE) * 0.05 - floor(CAST(n - 1 AS DOUBLE) * 0.05))
                       ELSE 0.0 END), 6) AS lo,
             round(sum(CASE WHEN rn = CAST(floor(CAST(n - 1 AS DOUBLE) * 0.95) AS BIGINT) + 1
                         THEN v * (1.0 - (CAST(n - 1 AS DOUBLE) * 0.95 - floor(CAST(n - 1 AS DOUBLE) * 0.95)))
                       WHEN rn = CAST(floor(CAST(n - 1 AS DOUBLE) * 0.95) AS BIGINT) + 2
                         THEN v * (CAST(n - 1 AS DOUBLE) * 0.95 - floor(CAST(n - 1 AS DOUBLE) * 0.95))
                       ELSE 0.0 END), 6) AS hi
           FROM r GROUP BY grp
         )
         SELECT r.doc_id, r.grp AS source, r.v, b.lo, b.hi,
           least(greatest(r.v, b.lo), b.hi) AS v_winsor
         FROM r JOIN b USING (grp)""",
    // Eval-side span contamination: q101's positional md5-48 grams and
    // island windows, coverage = membership in the TRAIN side's
    // distinct gram set over the q44 80/20 bucket split.
    // longest_contam_span is EXACT: eval windows enumerated inside
    // contiguous covered runs, matched by (m, gram-sequence) against
    // the train side's windows over ITS shared-gram runs.
    "q111_eval_contamination" ->
      """WITH t AS (
           SELECT doc_id,
             string_split(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')), ' ') AS toks,
             CAST(CAST(list_sum(list_transform(range(8),
               j -> CAST(strpos('0123456789abcdef', substring(md5('graft:' || CAST(doc_id AS VARCHAR)), CAST(j + 1 AS INT), 1)) - 1 AS BIGINT) << (4*(7 - CAST(j AS INT))))) AS BIGINT) % 100 AS INT) AS bucket
           FROM documents
         ), pos AS (
           SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos,
             CAST(list_sum(list_transform(range(12),
               j -> CAST(strpos('0123456789abcdef', substring(hx, CAST(j + 1 AS INT), 1)) - 1 AS BIGINT) << (4*(11 - CAST(j AS INT))))) AS BIGINT) AS h
           FROM (
             SELECT doc_id, i, md5(array_to_string(toks[i:i+9], ' ')) AS hx
             FROM (SELECT doc_id, toks, unnest(generate_series(1, len(toks) - 9)) AS i
                   FROM t WHERE bucket >= 80 AND len(toks) >= 10)
           )
         ), tpos AS (
           SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos,
             CAST(list_sum(list_transform(range(12),
               j -> CAST(strpos('0123456789abcdef', substring(hx, CAST(j + 1 AS INT), 1)) - 1 AS BIGINT) << (4*(11 - CAST(j AS INT))))) AS BIGINT) AS h
           FROM (
             SELECT doc_id, i, md5(array_to_string(toks[i:i+9], ' ')) AS hx
             FROM (SELECT doc_id, toks, unnest(generate_series(1, len(toks) - 9)) AS i
                   FROM t WHERE bucket < 80 AND len(toks) >= 10)
           )
         ), tg AS (
           SELECT DISTINCT h FROM tpos
         ), cov AS (
           SELECT doc_id, pos, h FROM pos WHERE h IN (SELECT h FROM tg)
         ), isl AS (
           SELECT doc_id, pos,
             CAST(sum(CASE WHEN prev IS NOT NULL AND pos - prev > 9 THEN 1 ELSE 0 END)
               OVER (PARTITION BY doc_id ORDER BY pos
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS isl
           FROM (SELECT doc_id, pos,
                   lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
                 FROM cov)
         ), pisl AS (
           SELECT doc_id, isl, max(pos) - min(pos) + 10 AS len, count(*) AS nst
           FROM isl GROUP BY 1, 2
         ), agg AS (
           SELECT doc_id,
             CAST(sum(nst) AS BIGINT) AS n_contam_positions,
             CAST(sum(len) AS BIGINT) AS contam_tokens
           FROM pisl GROUP BY 1
         ), eruns AS (
           SELECT doc_id, pos, h,
             CAST(sum(CASE WHEN prev IS NOT NULL AND pos - prev = 1 THEN 0 ELSE 1 END)
               OVER (PARTITION BY doc_id ORDER BY pos
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS rid
           FROM (SELECT doc_id, pos, h,
                   lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
                 FROM cov)
         ), earr AS (
           SELECT doc_id, rid, list(h ORDER BY pos) AS garr
           FROM eruns GROUP BY 1, 2
         ), ewin AS (
           SELECT doc_id, mm.m AS m,
             array_to_string(list_slice(garr, jj.j, jj.j + mm.m - 1), ',') AS wkey
           FROM earr
           CROSS JOIN LATERAL (SELECT unnest(range(1, len(garr) + 1)) AS m) mm
           CROSS JOIN LATERAL (SELECT unnest(range(1, len(garr) - mm.m + 2)) AS j) jj
         ), eg AS (
           SELECT DISTINCT h FROM pos
         ), tcov AS (
           SELECT doc_id, pos, h FROM tpos WHERE h IN (SELECT h FROM eg)
         ), truns AS (
           SELECT doc_id, pos, h,
             CAST(sum(CASE WHEN prev IS NOT NULL AND pos - prev = 1 THEN 0 ELSE 1 END)
               OVER (PARTITION BY doc_id ORDER BY pos
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS rid
           FROM (SELECT doc_id, pos, h,
                   lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
                 FROM tcov)
         ), tarr AS (
           SELECT doc_id, rid, list(h ORDER BY pos) AS garr
           FROM truns GROUP BY 1, 2
         ), twin AS (
           SELECT DISTINCT mm.m AS m,
             array_to_string(list_slice(garr, jj.j, jj.j + mm.m - 1), ',') AS wkey
           FROM tarr
           CROSS JOIN LATERAL (SELECT unnest(range(1, len(garr) + 1)) AS m) mm
           CROSS JOIN LATERAL (SELECT unnest(range(1, len(garr) - mm.m + 2)) AS j) jj
         ), longest AS (
           SELECT e.doc_id, CAST(max(e.m + 9) AS BIGINT) AS longest_contam_span
           FROM ewin e JOIN twin w ON e.m = w.m AND e.wkey = w.wkey
           GROUP BY e.doc_id
         ), base AS (
           SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens
           FROM t WHERE bucket >= 80
         )
         SELECT b.doc_id, b.n_tokens,
           COALESCE(a.n_contam_positions, 0) AS n_contam_positions,
           COALESCE(a.contam_tokens, 0) AS contam_tokens,
           COALESCE(l.longest_contam_span, 0) AS longest_contam_span,
           CAST((COALESCE(a.contam_tokens, 0) * 2000000 + b.n_tokens)
             // (b.n_tokens * 2) AS DOUBLE) / 1e6 AS contam_frac
         FROM base b
         LEFT JOIN agg a USING (doc_id)
         LEFT JOIN longest l USING (doc_id)""",
    // Dup-cluster histogram: q47's components grouped by size; the
    // size-1 row = corpus minus clustered docs.
    "q112_dup_cluster_stats" ->
      s"""WITH comp AS ($componentsSql),
         s AS (
           SELECT CAST(cluster_size AS BIGINT) AS cluster_size,
             CAST(count(DISTINCT cluster_id) AS BIGINT) AS n_clusters,
             CAST(count(*) AS BIGINT) AS n_docs
           FROM comp GROUP BY 1
         ), tot AS (
           SELECT CAST(count(*) AS BIGINT) AS total FROM documents
         ), c AS (
           SELECT CAST(COALESCE(sum(n_docs), 0) AS BIGINT) AS clustered FROM s
         )
         SELECT cluster_size, n_clusters, n_docs,
           CAST(n_docs - n_clusters AS BIGINT) AS n_redundant
         FROM s
         UNION ALL
         SELECT CAST(1 AS BIGINT), total - clustered, total - clustered,
           CAST(0 AS BIGINT)
         FROM tot CROSS JOIN c""",
    // Heaps fit: integral prefix assignment off the 1-row id range,
    // first occurrence = min(doc_id), cum window sums CAST to BIGINT
    // (type parity), then exactly the q95 ordered-fold fit idiom on
    // the ln(N)/ln(V) points.
    "q113_heaps_fit" ->
      """WITH tok AS (
           SELECT doc_id, unnest(string_split(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')), ' ')) AS token
           FROM documents
         ), r AS (
           SELECT min(doc_id) AS lo, max(doc_id) AS hi FROM documents
         ), massb AS (
           SELECT least(9, ((doc_id - lo) * 10) // (hi - lo + 1)) AS part,
             CAST(count(*) AS BIGINT) AS m
           FROM tok CROSS JOIN r GROUP BY 1
         ), ft AS (
           SELECT token, min(doc_id) AS fid FROM tok GROUP BY 1
         ), vocabb AS (
           SELECT least(9, ((fid - lo) * 10) // (hi - lo + 1)) AS part,
             CAST(count(*) AS BIGINT) AS v
           FROM ft CROSS JOIN r GROUP BY 1
         ), spine AS (SELECT CAST(unnest(range(10)) AS BIGINT) AS part),
         pts AS (
           SELECT part,
             CAST(sum(COALESCE(m, 0)) OVER (ORDER BY part
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS n_tokens_cum,
             CAST(sum(COALESCE(v, 0)) OVER (ORDER BY part
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS vocab_cum
           FROM spine LEFT JOIN massb USING (part) LEFT JOIN vocabb USING (part)
         ), pp AS (
           SELECT part, n_tokens_cum, vocab_cum,
             ln(CAST(n_tokens_cum AS DOUBLE)) AS x,
             ln(CAST(vocab_cum AS DOUBLE)) AS y
           FROM pts WHERE n_tokens_cum > 0 AND vocab_cum > 0
         ), s AS (
           SELECT CAST(count(*) AS BIGINT) AS n_terms,
             list_sum(list_transform(list(x ORDER BY part), v -> v)) AS sx,
             list_sum(list_transform(list(y ORDER BY part), v -> v)) AS sy,
             list_sum(list_transform(list({'x': x, 'y': y} ORDER BY part), e -> e.x * e.y)) AS sxy,
             list_sum(list_transform(list(x ORDER BY part), v -> v * v)) AS sxx,
             list_sum(list_transform(list(y ORDER BY part), v -> v * v)) AS syy
           FROM pp
         )
         SELECT pp.part, pp.n_tokens_cum, pp.vocab_cum,
           round((CAST(n_terms AS DOUBLE) * sxy - sx * sy)
             / (CAST(n_terms AS DOUBLE) * sxx - sx * sx), 6) AS beta,
           round((sy - ((CAST(n_terms AS DOUBLE) * sxy - sx * sy)
             / (CAST(n_terms AS DOUBLE) * sxx - sx * sx)) * sx)
             / CAST(n_terms AS DOUBLE), 6) AS log_k,
           round(((CAST(n_terms AS DOUBLE) * sxy - sx * sy) * (CAST(n_terms AS DOUBLE) * sxy - sx * sy))
             / ((CAST(n_terms AS DOUBLE) * sxx - sx * sx) * (CAST(n_terms AS DOUBLE) * syy - sy * sy)), 6) AS r2
         FROM pp CROSS JOIN s""",
    // Label-noise audit: q92's contingency/majority CTEs, joined back
    // per vector; the q82 half-up micro form for majority_frac.
    "q114_label_noise" ->
      s"""WITH asg AS (SELECT vec_id, cluster FROM (${kmeansRefineSql(k = 8, dim = 64, iters = 2)})),
           cont AS (
             SELECT asg.cluster, e.label, count(*) AS n
             FROM asg JOIN embeddings e USING (vec_id)
             GROUP BY 1, 2
           ), maj AS (
             SELECT cluster, label AS majority_label, CAST(n AS BIGINT) AS n_majority,
               CAST(sum(n) OVER (PARTITION BY cluster) AS BIGINT) AS n_vecs,
               row_number() OVER (PARTITION BY cluster ORDER BY n DESC, label ASC) AS rn
             FROM cont
           )
           SELECT a.vec_id, a.cluster, e.label, m.majority_label,
             m.n_majority, m.n_vecs,
             e.label <> m.majority_label AS is_suspect,
             CAST((m.n_majority * 2000000 + m.n_vecs) // (m.n_vecs * 2) AS DOUBLE) / 1e6 AS majority_frac
           FROM asg a
           JOIN embeddings e USING (vec_id)
           JOIN (SELECT * FROM maj WHERE rn = 1) m USING (cluster)""",
    // k-anonymity: one grouped count over the generalized QI tuple.
    "q115_k_anonymity" ->
      """SELECT lang, source, n_chars // 500 AS chars_bin,
           CAST(count(*) AS BIGINT) AS n_rows,
           count(*) < 5 AS at_risk
         FROM documents GROUP BY 1, 2, 3""",
    // JL projection: the SignedProjection integer contract replayed —
    // md5('jl|seed|j|d') low bit signs over floor(v·2^20) quants; the
    // list_sum CAST kills the HUGEINT (type-parity rule).
    "q116_jl_project" ->
      """WITH q AS (
           SELECT vec_id,
             list_transform(range(64), d ->
               CAST(floor(CAST(embedding[CAST(d AS INT) + 1] AS DOUBLE) * 1048576) AS BIGINT)) AS qv
           FROM embeddings WHERE len(embedding) > 0
         ), proj AS (
           SELECT vec_id, j,
             CAST(list_sum(list_transform(range(64), d ->
               (CASE WHEN (strpos('0123456789abcdef',
                   substring(md5('jl|42|' || CAST(j AS VARCHAR) || '|' || CAST(d AS VARCHAR)), 32, 1)) - 1) % 2 = 1
                 THEN 1 ELSE -1 END)
               * qv[CAST(d AS INT) + 1])) AS BIGINT) AS q_units
           FROM q CROSS JOIN (SELECT unnest(range(16)) AS j)
         )
         SELECT vec_id, CAST(j AS BIGINT) AS proj_dim, q_units,
           round(CAST(q_units AS DOUBLE) / (1048576.0 * sqrt(16.0)), 6) AS y
         FROM proj""",
    // Mutual-kNN: q23's signature/probe/candidate CTEs, both-direction
    // ranking on the ROUNDED cosine, swapped-key self-join.
    "q117_mutual_knn" ->
      s"""WITH ${srpSigCtes(tables = 8, bits = 8, dim = 64, seed = 42L)},
         probes AS (
           SELECT s.vec_id, s.t,
             CASE WHEN f.f = 8 THEN s.sig
                  ELSE xor(s.sig, CAST(1 AS BIGINT) << CAST(f.f AS INT)) END AS sig
           FROM sig s, range(9) f(f)
         ), cand AS (
           SELECT DISTINCT p.vec_id AS id_a, c.vec_id AS id_b
           FROM probes p JOIN sig c ON p.t = c.t AND p.sig = c.sig
           WHERE p.vec_id < c.vec_id
         ), scored AS (
           SELECT id_a, id_b,
             round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])), 6) AS cos
           FROM cand
           JOIN embeddings a ON id_a = a.vec_id
           JOIN embeddings b ON id_b = b.vec_id
         ), sym AS (
           SELECT id_a AS src, id_b AS dst, cos FROM scored
           UNION ALL
           SELECT id_b AS src, id_a AS dst, cos FROM scored
         ), ranked AS (
           SELECT src, dst, cos,
             row_number() OVER (PARTITION BY src ORDER BY cos DESC, dst ASC) AS rnk
           FROM sym
           QUALIFY rnk <= 10
         )
         SELECT x.src AS id_a, x.dst AS id_b, x.cos AS cos_sim,
           CAST(x.rnk AS BIGINT) AS rank_ab, CAST(y.rnk AS BIGINT) AS rank_ba
         FROM ranked x JOIN ranked y ON x.src = y.dst AND x.dst = y.src
         WHERE x.src < x.dst""",
    // int8 quant profile: same floor(v·2^20) unit domain; all divides
    // are // with non-negative operands (code and deq), so floor ==
    // truncate on both engines; sums CAST (type-parity rule).
    "q118_int8_quant" ->
      """WITH e AS (
           SELECT CAST(d AS BIGINT) AS dim,
             CAST(floor(CAST(embedding[CAST(d AS INT) + 1] AS DOUBLE) * 1048576) AS BIGINT) AS vq
           FROM embeddings, range(64) t(d) WHERE len(embedding) > 0
         ), s AS (
           SELECT dim, CAST(count(*) AS BIGINT) AS n,
             min(vq) AS min_q, max(vq) AS max_q
           FROM e GROUP BY 1
         ), c AS (
           SELECT e.dim, vq, n, min_q, max_q,
             CASE WHEN max_q = min_q THEN CAST(0 AS BIGINT)
                  ELSE ((vq - min_q) * 255) // (max_q - min_q) END AS code
           FROM e JOIN s ON e.dim = s.dim
         ), r AS (
           SELECT dim, n, min_q, max_q,
             abs(vq - (min_q + (code * (max_q - min_q)) // 255)) AS err
           FROM c
         )
         SELECT dim, n, min_q, max_q,
           CAST(max(err) AS BIGINT) AS max_err,
           CAST(sum(err * err) AS BIGINT) AS sse,
           round(sqrt(CAST(sum(err * err) AS DOUBLE) / n) / 1048576.0, 6) AS rmse
         FROM r GROUP BY 1, 2, 3, 4""",
    // Calibration bins: q82's hashed-weight formula + q78's Gopher
    // keep, composed; score/means are the shifted half-up intDiv micro
    // forms (integer-ratio tie rule) — the `//` chains stay on
    // non-negative operands; outputs CAST (HUGEINT parity rule).
    "q119_calibration" ->
      """WITH t AS (
           SELECT doc_id,
             trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')) AS norm,
             string_split(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')), ' ') AS toks
           FROM documents
         ), w AS (
           SELECT doc_id, unnest(toks) AS tok FROM t
         ), b AS (
           SELECT doc_id,
             (CAST(list_sum(list_transform(range(8),
               j -> CAST(strpos('0123456789abcdef', substring(md5(tok), CAST(j + 1 AS INT), 1)) - 1 AS BIGINT) << (4*(7 - CAST(j AS INT))))) AS BIGINT) % 4096) % 1001 - 500 AS wt
           FROM w
         ), agg AS (
           SELECT doc_id, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(wt) AS BIGINT) AS w_sum
           FROM b GROUP BY doc_id
         ), g AS (
           SELECT doc_id,
             (len(toks) >= 50 AND len(toks) <= 100000)
             AND (CAST(len(replace(norm, ' ', '')) AS DOUBLE) / len(toks) >= 3.0
                  AND CAST(len(replace(norm, ' ', '')) AS DOUBLE) / len(toks) <= 10.0)
             AND len(list_intersect(toks, ['the','a','an','of','and','or','to','in','is','it'])) >= 2
             AND CAST(len(list_filter(toks, t2 -> regexp_matches(t2, '[a-z]'))) AS DOUBLE) / len(toks) >= 0.8
             AND (CASE WHEN len(toks) >= 2
                  THEN 1.0 - CAST(len(list_distinct(list_transform(range(1, len(toks)),
                    i -> toks[i] || ' ' || toks[i+1]))) AS DOUBLE) / (len(toks) - 1)
                  ELSE 0.0 END) <= 0.5 AS keep
           FROM t
         ), sc AS (
           SELECT a.doc_id,
             ((a.w_sum + 500*a.n) * 2000000 + 1000*a.n) // (2000*a.n) AS s_micro,
             g.keep
           FROM agg a JOIN g ON a.doc_id = g.doc_id
         ), bn AS (
           SELECT keep, s_micro, (s_micro * 10) // 1000001 AS bin FROM sc
         )
         SELECT CAST(bin AS BIGINT) AS bin, CAST(count(*) AS BIGINT) AS n_docs,
           CAST((2*sum(s_micro) + count(*)) // (2*count(*)) AS BIGINT) AS mean_score_micro,
           CAST((2000000*sum(CASE WHEN keep THEN 1 ELSE 0 END) + count(*)) // (2*count(*)) AS BIGINT) AS keep_rate_micro,
           CAST((2*sum(s_micro) + count(*)) // (2*count(*))
             - (2000000*sum(CASE WHEN keep THEN 1 ELSE 0 END) + count(*)) // (2*count(*)) AS BIGINT) AS gap_micro
         FROM bn GROUP BY 1""",
    // Token fertility: exact integer ratios, shifted half-up //.
    "q129_token_fertility" ->
      """WITH a AS (
           SELECT lang, count(*) AS n_docs, sum(len(text)) AS n_chars,
             sum(len(string_split(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')), ' '))) AS n_tokens
           FROM documents GROUP BY 1
         )
         SELECT lang, CAST(n_docs AS BIGINT) AS n_docs,
           CAST(n_chars AS BIGINT) AS n_chars,
           CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST((2000000 * n_chars + n_tokens) // (2 * n_tokens) AS BIGINT) AS chars_per_token_micro,
           CAST((2000000 * n_tokens + n_docs) // (2 * n_docs) AS BIGINT) AS tokens_per_doc_micro
         FROM a""",
    // Log-length moments: floor(ln·1e6) snapped per doc before the
    // sums; E[x²]−E[x]² on the half-up micros, clamped at 0.
    "q130_log_length" ->
      """WITH d AS (
           SELECT source,
             CAST(floor(ln(CAST(len(string_split(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')), ' ')) AS DOUBLE)) * 1e6) AS BIGINT) AS l
           FROM documents
         ), a AS (
           SELECT source, count(*) AS n_docs, sum(l) AS s, sum(l * l) AS s2
           FROM d GROUP BY 1
         )
         SELECT source, CAST(n_docs AS BIGINT) AS n_docs,
           CAST((2*s + n_docs) // (2*n_docs) AS BIGINT) AS mean_ln_micro,
           CAST(greatest(0, (2*s2 + n_docs) // (2*n_docs)
             - ((2*s + n_docs) // (2*n_docs)) * ((2*s + n_docs) // (2*n_docs))) AS BIGINT) AS var_ln_micro2
         FROM a""",
    // Global shuffle: md5-hex sort key + the q44 bucket contract;
    // ordinal = exclusive shard-count offset + within-shard rank.
    "q131_global_shuffle" ->
      """WITH s AS (
           SELECT doc_id, md5('shuf:' || CAST(doc_id AS VARCHAR)) AS hx,
             CAST(CAST(list_sum(list_transform(range(8),
               j -> CAST(strpos('0123456789abcdef', substring(md5('shuf:' || CAST(doc_id AS VARCHAR)), CAST(j + 1 AS INT), 1)) - 1 AS BIGINT) << (4*(7 - CAST(j AS INT))))) AS BIGINT) % 32 AS INT) AS shard
           FROM documents
         ), r AS (
           SELECT doc_id, shard,
             CAST(row_number() OVER (PARTITION BY shard ORDER BY hx, doc_id) AS BIGINT) - 1 AS pos
           FROM s
         ), oo AS (
           SELECT shard, CAST(COALESCE(SUM(n) OVER (ORDER BY shard
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS off
           FROM (SELECT shard, count(*) AS n FROM s GROUP BY 1)
         )
         SELECT r.doc_id, r.shard, CAST(oo.off + r.pos AS BIGINT) AS ordinal
         FROM r JOIN oo USING (shard)""",
    // Bigram conditional entropy: q98 bigram convention; each ln of an
    // integer count floor-snaps to micro BEFORE the weighted sum.
    "q132_bigram_entropy" ->
      """WITH t AS (
           SELECT source, string_split(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')), ' ') AS toks
           FROM documents
         ), bi AS (
           SELECT source, toks[i] AS tok_a, toks[i + 1] AS tok_b
           FROM (SELECT source, toks, unnest(generate_series(1, len(toks) - 1)) AS i
                 FROM t WHERE len(toks) >= 2)
         ), cab AS (
           SELECT source, tok_a, tok_b, count(*) AS c_ab FROM bi GROUP BY 1, 2, 3
         ), ca AS (
           SELECT source, tok_a, sum(c_ab) AS c_a FROM cab GROUP BY 1, 2
         )
         SELECT c.source, CAST(sum(c.c_ab) AS BIGINT) AS n_bigrams,
           CAST(count(*) AS BIGINT) AS n_distinct_bigrams,
           CAST((2 * sum(c.c_ab * (CAST(floor(ln(CAST(a.c_a AS DOUBLE)) * 1e6) AS BIGINT)
                                 - CAST(floor(ln(CAST(c.c_ab AS DOUBLE)) * 1e6) AS BIGINT)))
                 + sum(c.c_ab)) // (2 * sum(c.c_ab)) AS BIGINT) AS cond_entropy_micro
         FROM cab c JOIN ca a USING (source, tok_a)
         GROUP BY 1""",
    // Embedding outlier audit: norm floor-snaps to micro (left-to-right
    // Σx² fold both engines); μ/σ² are exact integer moments; the flag
    // is the integer comparison (x−μ)² > 9σ².
    "q133_embedding_outliers" ->
      """WITH d AS (
           SELECT vec_id,
             CAST(floor(sqrt(list_sum(list_transform(CAST(embedding AS DOUBLE[]), x -> x*x))) * 1e6) AS BIGINT) AS nm
           FROM embeddings
         ), m AS (
           SELECT (2*sum(nm) + count(*)) // (2*count(*)) AS mean,
             greatest(0, (2*sum(nm*nm) + count(*)) // (2*count(*))
               - ((2*sum(nm) + count(*)) // (2*count(*))) * ((2*sum(nm) + count(*)) // (2*count(*)))) AS var
           FROM d
         )
         SELECT d.vec_id, CAST(d.nm AS BIGINT) AS norm_micro,
           d.nm = 0 AS is_zero,
           (d.nm - m.mean)*(d.nm - m.mean) > 9 * m.var AS is_outlier
         FROM d, m""",
    // SimHash Hamming pairs: shared sh CTE; band value = low 16 bits
    // of the shifted fingerprint (mask kills arith-shift sign fill);
    // >100-doc hot bands anti-joined out; exact popcount verify.
    "q134_simhash_pairs" ->
      s"""WITH $simhashCtes, bands AS (
           SELECT doc_id, simhash, b.band,
             ((simhash >> (16 * CAST(b.band AS INT))) & 65535) AS v
           FROM sh, range(4) b(band)
         ), kept AS (
           SELECT * FROM bands t WHERE NOT EXISTS (
             SELECT 1 FROM bands g WHERE g.band = t.band AND g.v = t.v
             GROUP BY g.band, g.v HAVING count(*) > 100)
         ), p AS (
           SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
             a.simhash AS sa, b.simhash AS sb
           FROM kept a JOIN kept b ON a.band = b.band AND a.v = b.v
             AND a.doc_id < b.doc_id
         )
         SELECT id_a, id_b, CAST(bit_count(xor(sa, sb)) AS INT) AS hamming
         FROM p WHERE bit_count(xor(sa, sb)) <= 3""",
    // Corpus↔embedding integrity: full-outer on doc_id=vec_id;
    // orphan vectors land in the '(orphan)' sentinel source.
    "q135_embedding_coverage" ->
      """WITH j AS (
           SELECT d.doc_id, d.source, e.vec_id
           FROM documents d FULL OUTER JOIN embeddings e ON d.doc_id = e.vec_id
         )
         SELECT coalesce(source, '(orphan)') AS source,
           CAST(count(doc_id) AS BIGINT) AS n_docs,
           CAST(count(vec_id) AS BIGINT) AS n_vecs,
           CAST(sum(CASE WHEN doc_id IS NOT NULL AND vec_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_matched,
           CAST(CASE WHEN count(doc_id) > 0 THEN
             (2 * sum(CASE WHEN doc_id IS NOT NULL AND vec_id IS NOT NULL THEN 1 ELSE 0 END) * 1000000
              + count(doc_id)) // (2 * count(doc_id)) END AS BIGINT) AS coverage_micro
         FROM j GROUP BY 1""",
    // Char classes: translate-deletion length differences on the RAW
    // text; ratios are shifted half-up intDiv micro (all operands >= 0).
    "q136_char_classes" ->
      """WITH c AS (
           SELECT source, CAST(len(text) AS BIGINT) AS c,
             CAST(len(text) - len(translate(text, 'abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ', '')) AS BIGINT) AS l,
             CAST(len(text) - len(translate(text, '0123456789', '')) AS BIGINT) AS d,
             CAST(len(text) - len(translate(text, ' ', '')) AS BIGINT) AS s
           FROM documents
         ), g AS (
           SELECT source, CAST(sum(c) AS BIGINT) AS n_chars,
             CAST(sum(l) AS BIGINT) AS n_letters,
             CAST(sum(d) AS BIGINT) AS n_digits,
             CAST(sum(s) AS BIGINT) AS n_spaces
           FROM c GROUP BY 1
         )
         SELECT source, n_chars, n_letters, n_digits, n_spaces,
           n_chars - n_letters - n_digits - n_spaces AS n_other,
           CAST(CASE WHEN n_chars > 0 THEN (2*CAST(n_letters AS HUGEINT)*1000000 + n_chars) // (2*CAST(n_chars AS HUGEINT)) END AS BIGINT) AS letter_micro,
           CAST(CASE WHEN n_chars > 0 THEN (2*CAST(n_digits AS HUGEINT)*1000000 + n_chars) // (2*CAST(n_chars AS HUGEINT)) END AS BIGINT) AS digit_micro,
           CAST(CASE WHEN n_chars > 0 THEN (2*CAST(n_spaces AS HUGEINT)*1000000 + n_chars) // (2*CAST(n_chars AS HUGEINT)) END AS BIGINT) AS space_micro,
           CAST(CASE WHEN n_chars > 0 THEN (2*CAST(n_chars - n_letters - n_digits - n_spaces AS HUGEINT)*1000000 + n_chars) // (2*CAST(n_chars AS HUGEINT)) END AS BIGINT) AS other_micro
         FROM g""",
    // Hapax stats: (source, token) count frame; both micro ratios are
    // shifted half-up intDiv on exact integers.
    "q137_hapax" ->
      """WITH tk AS (
           SELECT source,
             unnest(string_split(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')), ' ')) AS tok
           FROM documents
         ), v AS (
           SELECT source, tok, count(*) AS c FROM tk GROUP BY 1, 2
         )
         SELECT source, CAST(count(*) AS BIGINT) AS vocab_size,
           CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax,
           CAST(sum(c) AS BIGINT) AS n_tokens,
           CAST((2*sum(CASE WHEN c = 1 THEN 1 ELSE 0 END)*1000000 + count(*)) // (2*count(*)) AS BIGINT) AS hapax_vocab_micro,
           CAST((2*sum(CASE WHEN c = 1 THEN 1 ELSE 0 END)*1000000 + sum(c)) // (2*sum(c)) AS BIGINT) AS hapax_mass_micro
         FROM v GROUP BY 1""",
    // Head/tail anchors: first/last 8 normalized tokens (docs shorter
    // than 8 tokens excluded); group sizes joined back per doc.
    "q138_head_tail_dups" ->
      """WITH t AS (
           SELECT doc_id, string_split(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')), ' ') AS toks
           FROM documents
         ), g AS (
           SELECT doc_id, array_to_string(toks[1:8], ' ') AS head,
             array_to_string(toks[-8:], ' ') AS tail
           FROM t WHERE len(toks) >= 8
         ), hn AS (
           SELECT head, count(*) AS head_group_n FROM g GROUP BY 1
         ), tn AS (
           SELECT tail, count(*) AS tail_group_n FROM g GROUP BY 1
         )
         SELECT g.doc_id, CAST(hn.head_group_n AS BIGINT) AS head_group_n,
           CAST(tn.tail_group_n AS BIGINT) AS tail_group_n,
           hn.head_group_n > 1 AS is_head_dup,
           tn.tail_group_n > 1 AS is_tail_dup
         FROM g JOIN hn USING (head) JOIN tn USING (tail)""",
    // Session features: the q09 islands-and-gaps lowering of the
    // session window, with the per-session feature aggregates; error
    // rate is the shifted half-up intDiv micro.
    "q139_session_features" ->
      """WITH marked AS (
           SELECT user_id, ts, event_type, value,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_sess
           FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)
         ), numbered AS (
           SELECT *, sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_id
           FROM marked
         )
         SELECT user_id, epoch_us(min(ts)) AS session_start_us,
           CAST(count(*) AS BIGINT) AS n_events,
           epoch_us(max(ts)) - epoch_us(min(ts)) AS span_us,
           CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_errors,
           CAST((2*sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)*1000000 + count(*))
                // (2*count(*)) AS BIGINT) AS error_micro,
           CAST(count(DISTINCT event_type) AS BIGINT) AS n_types,
           CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
         FROM numbered GROUP BY user_id, sess_id""",
    // Embedding z-score: coordinates snap to floor-micro; min-shift
    // half-up mean (exact shift identity), q130 E[x²] form, var =
    // max(0, E[x²] − mean²); z floor-snaps the shared double op chain.
    "q140_embedding_zscore" ->
      """WITH x AS (
           SELECT vec_id, CAST(r.d AS INT) AS pos,
             CAST(floor(CAST(embedding[CAST(r.d AS INT) + 1] AS DOUBLE) * 1e6) AS BIGINT) AS xm
           FROM embeddings, range(64) r(d) WHERE len(embedding) = 64
         ), st AS (
           SELECT pos, count(*) AS n, sum(xm) AS s, min(xm) AS mn,
             sum(CAST(xm AS HUGEINT) * xm) AS s2
           FROM x GROUP BY 1
         ), m AS (
           SELECT pos,
             CAST((2*(s - n*mn) + n) // (2*n) + mn AS BIGINT) AS mean,
             CAST((2*s2 + n) // (2*n) AS BIGINT) AS ex2
           FROM st
         ), mv AS (
           SELECT pos, mean, greatest(0, ex2 - mean*mean) AS var FROM m
         )
         SELECT x.vec_id, x.pos,
           CAST(CASE WHEN mv.var > 0 THEN
             floor(CAST(x.xm - mv.mean AS DOUBLE) / sqrt(CAST(mv.var AS DOUBLE)) * 1e6)
           END AS BIGINT) AS z_micro
         FROM x JOIN mv USING (pos)""",
    // Two-sample KS: exact integer cross-multiplied CDF gaps; max by
    // (gap DESC, v ASC); final ratio is the shifted half-up micro.
    "q141_ks_drift" ->
      """WITH c AS (
           SELECT CAST(n_chars AS BIGINT) AS v,
             sum(CASE WHEN source = 'src0' THEN 1 ELSE 0 END) AS ca,
             sum(CASE WHEN source = 'src1' THEN 1 ELSE 0 END) AS cb
           FROM documents WHERE source IN ('src0', 'src1') GROUP BY 1
         ), r AS (
           SELECT v,
             sum(ca) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cuma,
             sum(cb) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumb,
             sum(ca) OVER () AS na, sum(cb) OVER () AS nb
           FROM c
         ), m AS (
           SELECT v, na, nb, abs(cuma*nb - cumb*na) AS gap
           FROM r ORDER BY gap DESC, v LIMIT 1
         )
         SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
           CAST((2*gap*1000000 + na*nb) // (2*na*nb) AS BIGINT) AS ks_micro,
           v AS ks_at_value
         FROM m""",
    // Hill tail index over doc token counts: top-(k+1) by value (ties
    // at the cutoff are value-equal — row choice is irrelevant), each
    // ln of an integer floor-snaps to micro before the exact sum.
    "q142_hill_tail" ->
      """WITH t AS (
           SELECT CAST(len(string_split(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')), ' ')) AS BIGINT) AS x
           FROM documents
         ), top AS (
           SELECT x FROM t ORDER BY x DESC LIMIT 101
         ), mm AS (
           SELECT min(x) AS xk1, count(*) AS n FROM top
         ), s AS (
           SELECT mm.n - 1 AS k, mm.xk1,
             sum(CASE WHEN mm.xk1 > 0 THEN
               CAST(floor(ln(CAST(top.x AS DOUBLE)) * 1e6) AS BIGINT)
               - CAST(floor(ln(CAST(mm.xk1 AS DOUBLE)) * 1e6) AS BIGINT) END) AS sl
           FROM top, mm GROUP BY 1, 2
         )
         SELECT CAST(k AS BIGINT) AS k, CAST(xk1 AS BIGINT) AS x_k1,
           CAST(sl AS BIGINT) AS sum_ln_micro,
           CAST(CASE WHEN xk1 > 0 AND sl > 0 THEN
             (2*k*1000000000000 + sl) // (2*sl) END AS BIGINT) AS alpha_micro
         FROM s""",
    // Key-skew profile over the token key: exact lower order stats
    // (cum·den ≥ keys·num ⟺ rank ≥ ⌈q·keys⌉) off the count-of-counts
    // frame; hot-key share is the shifted half-up micro.
    "q143_key_skew" ->
      """WITH tk AS (
           SELECT unnest(string_split(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')), ' ')) AS tok
           FROM documents
         ), pk AS (
           SELECT tok, count(*) AS n FROM tk GROUP BY 1
         ), cc AS (
           SELECT n, count(*) AS k FROM pk GROUP BY 1
         ), r AS (
           SELECT n,
             sum(k) OVER (ORDER BY n ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
             sum(k) OVER () AS keys, sum(n*k) OVER () AS rws
           FROM cc
         )
         SELECT CAST(max(keys) AS BIGINT) AS n_keys,
           CAST(max(rws) AS BIGINT) AS n_rows,
           CAST(max(n) AS BIGINT) AS max_n,
           CAST(min(CASE WHEN cum*2 >= keys*1 THEN n END) AS BIGINT) AS p50_n,
           CAST(min(CASE WHEN cum*100 >= keys*99 THEN n END) AS BIGINT) AS p99_n,
           CAST((2*CAST(max(n) AS HUGEINT)*1000000 + max(rws)) // (2*CAST(max(rws) AS HUGEINT)) AS BIGINT) AS top_share_micro
         FROM r""",
    // HLL distinct tokens per lang: the q52 md5-48 hex-parse contract;
    // register index = top 6 bits, ρ via the minimal-binary length
    // (bin() is minimal in both engines), Z in exact 2^(50−M) integer
    // units, α₆₄ = the spec constant 709341 micro. HUGEINT only in
    // the α·m²·2^50 intermediate — every output column casts BIGINT.
    "q144_hll_distinct" ->
      """WITH t AS (
           SELECT lang,
             string_split(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')), ' ') AS toks
           FROM documents
         ), h AS (
           SELECT DISTINCT lang,
             CAST(list_sum(list_transform(range(12), j -> CAST(strpos('0123456789abcdef', substring(hx, CAST(j + 1 AS INT), 1)) - 1 AS BIGINT) << (4*(11 - CAST(j AS INT))))) AS BIGINT) AS h
           FROM (SELECT lang, md5(tok) AS hx
                 FROM (SELECT lang, unnest(toks) AS tok FROM t))
         ), br AS (
           SELECT lang, h // 4398046511104 AS b,
             CASE WHEN h % 4398046511104 = 0 THEN 43
                  ELSE 43 - length(bin(h % 4398046511104)) END AS rho
           FROM h
         ), regs AS (
           SELECT lang, b, max(rho) AS mr FROM br GROUP BY 1, 2
         ), agg AS (
           SELECT lang, count(*) AS present,
             sum(CAST(power(2, 50 - mr) AS BIGINT)) AS zp
           FROM regs GROUP BY 1
         ), ex AS (
           SELECT lang, count(*) AS n_exact FROM h GROUP BY 1
         ), fin AS (
           SELECT a.lang, ex.n_exact, 64 - a.present AS v_zero,
             a.zp + (64 - a.present) * 1125899906842624 AS z_int
           FROM agg a JOIN ex USING (lang)
         ), est AS (
           SELECT lang, n_exact, v_zero, z_int,
             CAST((CAST(2 AS HUGEINT)*709341*4096*1125899906842624
                   + CAST(1000000 AS HUGEINT)*z_int)
                  // (CAST(2000000 AS HUGEINT)*z_int) AS BIGINT) AS est_raw,
             CASE WHEN v_zero > 0 THEN
               (2*64*CAST(floor(ln(64.0/v_zero)*1e6) AS BIGINT) + 1000000) // 2000000 END AS est_lin
           FROM fin
         )
         SELECT lang, CAST(n_exact AS BIGINT) AS n_exact,
           CAST(v_zero AS BIGINT) AS v_zero, CAST(z_int AS BIGINT) AS z_int,
           est_raw,
           CAST(CASE WHEN est_raw <= 160 AND v_zero > 0 THEN est_lin
                ELSE est_raw END AS BIGINT) AS est_hll
         FROM est""",
    // Doc-level co-occurrence: DISTINCT (doc, token) df convention;
    // lift product through HUGEINT (q121 mirror), outputs all BIGINT.
    "q150_cooccurrence" ->
      """WITH tk AS (
           SELECT DISTINCT doc_id, token FROM (
             SELECT doc_id,
               unnest(string_split(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')), ' ')) AS token
             FROM documents)
         ), vocab AS (
           SELECT token, df FROM (
             SELECT token, count(*) AS df FROM tk GROUP BY 1
           ) ORDER BY df DESC, token LIMIT 40
         ), p AS (
           SELECT tk.doc_id, tk.token FROM tk JOIN vocab ON tk.token = vocab.token
         ), pr AS (
           SELECT a.token AS tok_a, b.token AS tok_b, count(*) AS n_ab
           FROM p a JOIN p b ON a.doc_id = b.doc_id AND a.token < b.token
           GROUP BY 1, 2 HAVING count(*) >= 25
         ), nn AS (SELECT count(*) AS n FROM documents)
         SELECT tok_a, tok_b, CAST(va.df AS BIGINT) AS n_a,
           CAST(vb.df AS BIGINT) AS n_b, CAST(n_ab AS BIGINT) AS n_ab,
           CAST((2 * n_ab * 1000000 + va.df) // (2 * va.df) AS BIGINT) AS conf_micro,
           CAST((CAST(2 AS HUGEINT) * n_ab * nn.n * 1000000
                 + CAST(va.df AS HUGEINT) * vb.df)
                // (CAST(2 AS HUGEINT) * va.df * vb.df) AS BIGINT) AS lift_micro
         FROM pr
         JOIN vocab va ON pr.tok_a = va.token
         JOIN vocab vb ON pr.tok_b = vb.token, nn""",
    // Sequential funnel: m_k = first step-k event STRICTLY after the
    // user's m_{k−1} (NULL propagates "never reached"); ratios //.
    "q149_funnel_steps" ->
      """WITH e AS (
           SELECT user_id AS u, event_type AS t, epoch_us(ts) AS us FROM events
         ), s0 AS (
           SELECT u, min(CASE WHEN t = 'view' THEN us END) AS m0 FROM e GROUP BY 1
         ), s1 AS (
           SELECT e.u, min(CASE WHEN t = 'click' AND us > m0 THEN us END) AS m1
           FROM e JOIN s0 USING (u) GROUP BY 1
         ), s2 AS (
           SELECT e.u, min(CASE WHEN t = 'purchase' AND us > m1 THEN us END) AS m2
           FROM e JOIN s1 USING (u) GROUP BY 1
         ), n AS (
           SELECT (SELECT count(m0) FROM s0) AS n0,
             (SELECT count(m1) FROM s1) AS n1,
             (SELECT count(m2) FROM s2) AS n2
         ), sel AS (
           SELECT 0 AS step, 'view' AS event_type, n0 AS n_users,
             CAST(NULL AS BIGINT) AS prev, n0 AS fst FROM n
           UNION ALL SELECT 1, 'click', n1, n0, n0 FROM n
           UNION ALL SELECT 2, 'purchase', n2, n1, n0 FROM n
         )
         SELECT CAST(step AS BIGINT) AS step, event_type,
           CAST(n_users AS BIGINT) AS n_users,
           CAST(CASE WHEN prev > 0 THEN
             (2 * n_users * 1000000 + prev) // (2 * prev) END AS BIGINT) AS from_prev_micro,
           CAST(CASE WHEN fst > 0 THEN
             (2 * n_users * 1000000 + fst) // (2 * fst) END AS BIGINT) AS from_first_micro
         FROM sel""",
    // Dup-graph degrees: the q19 pair CTEs verbatim; degree-0 row
    // derives from corpus minus touched (q112's singleton idiom).
    "q148_dup_degree" ->
      s"""WITH pairs AS (
           SELECT id_a, id_b FROM ($minhashPairsSql)
         ), ep AS (
           SELECT id_a AS id FROM pairs UNION ALL SELECT id_b FROM pairs
         ), deg AS (
           SELECT id, count(*) AS degree FROM ep GROUP BY 1
         ), hist AS (
           SELECT degree, count(*) AS n_docs FROM deg GROUP BY 1
         ), tot AS (SELECT count(*) AS n FROM documents),
         tch AS (SELECT count(*) AS k FROM deg)
         SELECT CAST(degree AS BIGINT) AS degree,
           CAST(n_docs AS BIGINT) AS n_docs FROM hist
         UNION ALL
         SELECT CAST(0 AS BIGINT), CAST(n - k AS BIGINT) FROM tot, tch""",
    // Template-family pairs: q134's band CTEs verbatim, then prefix
    // Levenshtein verify; ned is the shifted half-up intDiv micro of
    // exact integers (both operands non-negative).
    "q151_template_pairs" ->
      s"""WITH $simhashCtes, bands AS (
           SELECT doc_id, simhash, b.band,
             ((simhash >> (16 * CAST(b.band AS INT))) & 65535) AS v
           FROM sh, range(4) b(band)
         ), kept AS (
           SELECT * FROM bands t WHERE NOT EXISTS (
             SELECT 1 FROM bands g WHERE g.band = t.band AND g.v = t.v
             GROUP BY g.band, g.v HAVING count(*) > 100)
         ), p AS (
           SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
             a.simhash AS sa, b.simhash AS sb
           FROM kept a JOIN kept b ON a.band = b.band AND a.v = b.v
             AND a.doc_id < b.doc_id
         ), cand AS (
           SELECT id_a, id_b, CAST(bit_count(xor(sa, sb)) AS INT) AS hamming
           FROM p WHERE bit_count(xor(sa, sb)) <= 3
         ), pre AS (
           SELECT doc_id, substr(text, 1, 400) AS pfx FROM documents
         ), lv AS (
           -- DuckDB's levenshtein counts UTF-8 BYTE edits; the engine
           -- matches it exactly with LevenshteinBytes (Spark's builtin
           -- counts code points and would desync on non-ASCII raw
           -- text). Denominator is strlen = BYTE length to match.
           SELECT c.id_a, c.id_b, c.hamming,
             CAST(levenshtein(pa.pfx, pb.pfx) AS BIGINT) AS lev_edits,
             CAST(greatest(strlen(pa.pfx), strlen(pb.pfx)) AS BIGINT) AS den
           FROM cand c
           JOIN pre pa ON c.id_a = pa.doc_id
           JOIN pre pb ON c.id_b = pb.doc_id
         )
         SELECT id_a, id_b, hamming, lev_edits,
           CAST(CASE WHEN den = 0 THEN 0
             ELSE (2 * lev_edits * 1000000 + den) // (2 * den) END AS BIGINT) AS ned_micro
         FROM lv
         WHERE (CASE WHEN den = 0 THEN 0
           ELSE (2 * lev_edits * 1000000 + den) // (2 * den) END) <= 300000""",
    // Spearman signal redundancy: doubled average ranks from the
    // value-histogram cumsum (integers end-to-end); the five sums are
    // exact (HUGEINT ≡ Spark DECIMAL(38,0)), ρ is the identical double
    // op sequence on both engines, round 6 (metric-double rule).
    // Base rows filter to the JOINT non-null set BEFORE the rank
    // histograms — the engine (signalSpearman) drops either-null rows
    // up front, so an oracle that kept a half-null row in one
    // histogram would shift that signal's cumulative ranks and desync.
    // (Both signals here derive from the same text, so nulls co-occur
    // on this data — the filter pins the contract for callers with
    // independently-null signals.)
    "q152_signal_spearman" ->
      """WITH base AS (
           SELECT * FROM (
           SELECT CAST(len(string_split(norm, ' ')) AS BIGINT) AS x,
             least(len(text), 500) * 800
             + (CASE WHEN 10 * len(list_filter(string_split(norm, ' '),
                      t2 -> list_contains(['the','a','an','of','and','or','to','in','is','it'], t2)))
                      >= len(string_split(norm, ' ')) THEN 300000
                ELSE (6000000 * len(list_filter(string_split(norm, ' '),
                        t2 -> list_contains(['the','a','an','of','and','or','to','in','is','it'], t2)))
                      + len(string_split(norm, ' ')))
                     // (2 * len(string_split(norm, ' '))) END)
             + (CASE WHEN len(replace(norm, ' ', '')) >= 3 * len(string_split(norm, ' '))
                      AND len(replace(norm, ' ', '')) <= 8 * len(string_split(norm, ' '))
                THEN 300000 ELSE 0 END) AS y
           FROM (SELECT text,
                   trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')) AS norm
                 FROM documents)
           ) WHERE x IS NOT NULL AND y IS NOT NULL
         ), xr AS (
           SELECT x, CAST(count(*) AS BIGINT) AS c FROM base GROUP BY x
         ), xa AS (
           SELECT x, 2 * (sum(c) OVER (ORDER BY x ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - c) + c + 1 AS rx
           FROM xr
         ), yr AS (
           SELECT y, CAST(count(*) AS BIGINT) AS c FROM base GROUP BY y
         ), ya AS (
           SELECT y, 2 * (sum(c) OVER (ORDER BY y ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - c) + c + 1 AS ry
           FROM yr
         ), j AS (
           SELECT rx, ry FROM base JOIN xa USING (x) JOIN ya USING (y)
         ), s AS (
           SELECT CAST(count(*) AS DOUBLE) AS n,
             CAST(sum(rx) AS DOUBLE) AS sx, CAST(sum(ry) AS DOUBLE) AS sy,
             CAST(sum(rx * ry) AS DOUBLE) AS sxy,
             CAST(sum(rx * rx) AS DOUBLE) AS sxx,
             CAST(sum(ry * ry) AS DOUBLE) AS syy
           FROM j
         )
         SELECT CAST(n AS BIGINT) AS n_docs,
           CASE WHEN n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0 THEN
             round((n * sxy - sx * sy) /
               (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)), 6) END AS rho
         FROM s""",
    // Containment pairs: q18's CTEs with the asymmetric ratios; sizes
    // from the UNCAPPED shingle sets (true denominators), unrounded
    // exact-integer IEEE divisions (the q18 contract).
    "q153_containment_pairs" ->
      """WITH t AS (
           SELECT doc_id,
             string_split(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')), ' ') AS toks
           FROM documents
         ), sh AS (
           SELECT DISTINCT doc_id,
             unnest(list_transform(range(1, len(toks) - 1),
               i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS shingle
           FROM t WHERE len(toks) >= 3
         ), sizes AS (
           SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY 1
         ), capped AS (
           SELECT sh.doc_id, sh.shingle FROM sh
           JOIN (SELECT shingle FROM sh GROUP BY shingle HAVING count(*) <= 1000) keep
             USING (shingle)
         ), inter AS (
           SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_common
           FROM capped a JOIN capped b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
           GROUP BY 1, 2
         )
         SELECT id_a, id_b, CAST(n_common AS BIGINT) AS n_common,
           CAST(n_common AS DOUBLE) / sa.n_sh AS containment_a,
           CAST(n_common AS DOUBLE) / sb.n_sh AS containment_b
         FROM inter
         JOIN sizes sa ON id_a = sa.doc_id
         JOIN sizes sb ON id_b = sb.doc_id
         WHERE CAST(n_common AS DOUBLE) / sa.n_sh >= 0.6
            OR CAST(n_common AS DOUBLE) / sb.n_sh >= 0.6""",
    // Cramér's V: sparse-cell χ² identity; per-cell pico terms floor-
    // snapped from the SAME pinned double op sequence as the engine,
    // exact 128-bit sums, one decimal→double division for chi2.
    "q154_source_lang_assoc" ->
      """WITH cells AS (
           SELECT source AS a, lang AS b, CAST(count(*) AS BIGINT) AS o
           FROM documents GROUP BY 1, 2
         ), ra AS (SELECT a, CAST(sum(o) AS BIGINT) AS ra FROM cells GROUP BY a),
         cb AS (SELECT b, CAST(sum(o) AS BIGINT) AS cb FROM cells GROUP BY b),
         tm AS (
           SELECT CAST(floor(CAST(o AS DOUBLE) * o / (CAST(ra AS DOUBLE) * cb) * 1e12) AS HUGEINT) AS t
           FROM cells JOIN ra USING (a) JOIN cb USING (b)
         ), s AS (SELECT sum(t) AS st FROM tm),
         d AS (SELECT count(DISTINCT a) AS n_a, count(DISTINCT b) AS n_b,
                 sum(o) AS n FROM cells)
         SELECT CAST(n AS BIGINT) AS n_rows, CAST(n_a AS BIGINT) AS n_a,
           CAST(n_b AS BIGINT) AS n_b,
           greatest(CAST((st - 1000000000000) * n AS DOUBLE) / 1e12, 0.0) AS chi2,
           CASE WHEN least(n_a, n_b) > 1 THEN
             round(sqrt(greatest(CAST((st - 1000000000000) * n AS DOUBLE) / 1e12, 0.0) /
               (CAST(n AS DOUBLE) * (CAST(least(n_a, n_b) AS DOUBLE) - 1.0))), 6)
           END AS cramers_v
         FROM d, s""",
    // Burst windows: per-type tumbling counts; the z-test cleared of
    // divisions — (cW−S)² > z²(W·Sq−S²) ∧ cW > S in exact 128-bit
    // integers; mean is the shifted half-up intDiv micro.
    "q155_burst_windows" ->
      """WITH w AS (
           SELECT event_type, epoch_us(ts) // 3600000000 AS wdx,
             CAST(count(*) AS BIGINT) AS n_events
           FROM events GROUP BY 1, 2
         ), st AS (
           SELECT event_type, CAST(count(*) AS BIGINT) AS wn,
             CAST(sum(n_events) AS BIGINT) AS s,
             sum(CAST(n_events AS HUGEINT) * n_events) AS sq
           FROM w GROUP BY 1
         )
         SELECT w.event_type, CAST(wdx * 3600000000 AS BIGINT) AS window_start_us,
           n_events,
           CAST((2 * s * 1000000 + wn) // (2 * wn) AS BIGINT) AS mean_micro,
           ((CAST(n_events AS HUGEINT) * wn - s) * (CAST(n_events AS HUGEINT) * wn - s)
             > 9 * (CAST(wn AS HUGEINT) * sq - CAST(s AS HUGEINT) * s)
            AND CAST(n_events AS HUGEINT) * wn > s) AS is_burst
         FROM w JOIN st USING (event_type)""",
    // Label centroid compactness: micro-lattice component snap (floor,
    // one pinned double op), signed half-up component means, the q21
    // cosine parity path rounded to micro, exact shifted-mean fold.
    "q156_label_compactness" ->
      """WITH comp AS (
           SELECT label, CAST(d.i AS BIGINT) - 1 AS dim,
             CAST(floor(CAST(embedding[CAST(d.i AS INT)] AS DOUBLE) * 1e6) AS BIGINT) AS cm
           FROM embeddings, range(1, 65) d(i) WHERE len(embedding) = 64
         ), sums AS (
           SELECT label, dim, CAST(sum(cm) AS BIGINT) AS s,
             CAST(count(*) AS BIGINT) AS n
           FROM comp GROUP BY 1, 2
         ), cent AS (
           SELECT label, list(CAST(c AS DOUBLE) / 1e6 ORDER BY dim) AS cvec FROM (
             SELECT label, dim,
               CASE WHEN s >= 0 THEN (2*s + n) // (2*n)
                    ELSE -((-2*s + n) // (2*n)) END AS c
             FROM sums) GROUP BY 1
         ), r AS (
           SELECT e.label,
             CASE WHEN list_sum(list_transform(CAST(e.embedding AS DOUBLE[]), x -> x*x)) > 0
                   AND list_sum(list_transform(cvec, x -> x*x)) > 0
               THEN CAST(round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), cvec) * 1e6, 0) AS BIGINT)
             END AS cosm
           FROM embeddings e JOIN cent USING (label)
           WHERE len(e.embedding) = 64
         )
         SELECT label, CAST(count(*) AS BIGINT) AS n_vecs,
           CAST(count(cosm) AS BIGINT) AS n_scored,
           CAST(CASE WHEN count(cosm) > 0 THEN
             (2 * sum(cosm + 1000000) + count(cosm)) // (2 * count(cosm)) - 1000000
           END AS BIGINT) AS mean_cos_micro,
           CAST(min(cosm) AS BIGINT) AS min_cos_micro
         FROM r GROUP BY 1""",
    // Cross-source dup matrix: the q19 pair CTEs + two source lookups;
    // canonical (least, greatest) cell, share in half-up micro.
    "q157_cross_source_dups" ->
      s"""WITH p AS (
           SELECT id_a, id_b FROM ($minhashPairsSql)
         ), lab AS (
           SELECT least(da.source, db.source) AS source_a,
             greatest(da.source, db.source) AS source_b
           FROM p
           JOIN documents da ON p.id_a = da.doc_id
           JOIN documents db ON p.id_b = db.doc_id
         ), m AS (
           SELECT source_a, source_b, CAST(count(*) AS BIGINT) AS n_pairs
           FROM lab GROUP BY 1, 2
         ), tot AS (SELECT CAST(coalesce(sum(n_pairs), 0) AS BIGINT) AS t FROM m)
         SELECT source_a, source_b, n_pairs,
           CAST((2 * CAST(n_pairs AS HUGEINT) * 1000000 + t) // (2 * CAST(t AS HUGEINT)) AS BIGINT) AS share_micro
         FROM m, tot""",
    // Shard composition entropy: the q126 md5-shard idiom (first 8
    // hex % 16); each ln of an integer count floor-snaps to micro
    // before the weighted sum (q132 rule), divides shifted half-up.
    "q147_shard_entropy" ->
      """WITH b AS (
           SELECT CAST(CAST(list_sum(list_transform(range(8),
               j -> CAST(strpos('0123456789abcdef', substring(hx, CAST(j + 1 AS INT), 1)) - 1 AS BIGINT) << (4*(7 - CAST(j AS INT))))) AS BIGINT) % 16 AS BIGINT) AS shard,
             source
           FROM (SELECT source, md5('graft:' || CAST(doc_id AS VARCHAR)) AS hx FROM documents)
         ), cnt AS (
           SELECT shard, source, count(*) AS c FROM b GROUP BY 1, 2
         ), per AS (
           SELECT shard, sum(c) AS n_docs, count(*) AS n_sources,
             sum(c * CAST(floor(ln(CAST(c AS DOUBLE)) * 1e6) AS BIGINT)) AS term
           FROM cnt GROUP BY 1
         ), e AS (
           SELECT shard, n_docs, n_sources,
             CAST(floor(ln(CAST(n_docs AS DOUBLE)) * 1e6) AS BIGINT)
               - (2 * term + n_docs) // (2 * n_docs) AS h,
             CAST(floor(ln(CAST(n_sources AS DOUBLE)) * 1e6) AS BIGINT) AS ln_ns
           FROM per
         )
         SELECT shard, CAST(n_docs AS BIGINT) AS n_docs,
           CAST(n_sources AS BIGINT) AS n_sources,
           CAST(h AS BIGINT) AS entropy_micro,
           CAST(CASE WHEN n_sources > 1 THEN
             (2000000 * h + ln_ns) // (2 * ln_ns) END AS BIGINT) AS evenness_micro
         FROM e""",
    // Per-doc OOV rate: top-500 vocab by (count DESC, token) — the
    // q42 ranking convention; counts are BIGINT, ratio half-up //.
    "q146_oov_rate" ->
      """WITH tk AS (
           SELECT doc_id,
             unnest(string_split(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')), ' ')) AS token
           FROM documents
         ), vocab AS (
           SELECT token FROM (
             SELECT token, count(*) AS c FROM tk GROUP BY 1
           ) ORDER BY c DESC, token LIMIT 500
         )
         SELECT tk.doc_id AS doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
           CAST(sum(CASE WHEN vocab.token IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
           CAST((2 * sum(CASE WHEN vocab.token IS NULL THEN 1 ELSE 0 END) * 1000000
                 + count(*)) // (2 * count(*)) AS BIGINT) AS oov_micro
         FROM tk LEFT JOIN vocab ON tk.token = vocab.token
         GROUP BY tk.doc_id""",
    // Median/MAD robust outliers: LOWER medians as order statistics
    // (cum·2 ≥ n on the count-of-counts frame — never interpolated),
    // strict integer cut compare; window sums are HUGEINT → every
    // output column casts BIGINT.
    "q145_mad_outliers" ->
      """WITH rws AS (
           SELECT source AS grp, CAST(n_chars AS BIGINT) AS v FROM documents
         ), cc AS (
           SELECT grp, v, count(*) AS k FROM rws GROUP BY 1, 2
         ), r AS (
           SELECT grp, v,
             sum(k) OVER (PARTITION BY grp ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
             sum(k) OVER (PARTITION BY grp) AS n
           FROM cc
         ), med AS (
           SELECT grp, max(n) AS n,
             min(CASE WHEN cum * 2 >= n THEN v END) AS median
           FROM r GROUP BY 1
         ), dv AS (
           SELECT rws.grp, abs(v - median) AS d
           FROM rws JOIN med USING (grp)
         ), dcc AS (
           SELECT grp, d, count(*) AS k FROM dv GROUP BY 1, 2
         ), dr AS (
           SELECT grp, d,
             sum(k) OVER (PARTITION BY grp ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
             sum(k) OVER (PARTITION BY grp) AS n
           FROM dcc
         ), mad AS (
           SELECT grp, min(CASE WHEN cum * 2 >= n THEN d END) AS mad
           FROM dr GROUP BY 1
         ), o AS (
           SELECT rws.grp,
             sum(CASE WHEN abs(v - median) > 3 * mad THEN 1 ELSE 0 END) AS n_outliers
           FROM rws JOIN med USING (grp) JOIN mad USING (grp) GROUP BY 1
         )
         SELECT med.grp AS source, CAST(med.n AS BIGINT) AS n,
           CAST(med.median AS BIGINT) AS median, CAST(mad.mad AS BIGINT) AS mad,
           CAST(o.n_outliers AS BIGINT) AS n_outliers,
           CAST((2 * o.n_outliers * 1000000 + med.n) // (2 * med.n) AS BIGINT) AS outlier_micro
         FROM med JOIN mad USING (grp) JOIN o USING (grp)""",
    // Lexical diversity: bigram string = the q18 space-join gram
    // convention; ratios shifted half-up //, NULL when no bigrams.
    "q128_lexical_diversity" ->
      """WITH t AS (
           SELECT source,
             string_split(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')), ' ') AS toks
           FROM documents
         ), u AS (
           SELECT source, count(*) AS n_tokens,
             count(DISTINCT g) AS distinct_1
           FROM (SELECT source, unnest(toks) AS g FROM t) GROUP BY 1
         ), b AS (
           SELECT source, count(*) AS n_bigrams,
             count(DISTINCT g) AS distinct_2
           FROM (SELECT source, unnest(list_transform(range(1, len(toks)),
                   i -> toks[i] || ' ' || toks[i+1])) AS g
                 FROM t WHERE len(toks) >= 2) GROUP BY 1
         )
         SELECT u.source, CAST(u.n_tokens AS BIGINT) AS n_tokens,
           CAST(COALESCE(b.n_bigrams, 0) AS BIGINT) AS n_bigrams,
           CAST(u.distinct_1 AS BIGINT) AS distinct_1,
           CAST(COALESCE(b.distinct_2, 0) AS BIGINT) AS distinct_2,
           CAST((2000000 * u.distinct_1 + u.n_tokens) // (2 * u.n_tokens) AS BIGINT) AS ttr_micro,
           CASE WHEN COALESCE(b.n_bigrams, 0) = 0 THEN NULL
                ELSE CAST((2000000 * b.distinct_2 + b.n_bigrams) // (2 * b.n_bigrams) AS BIGINT)
           END AS distinct2_micro
         FROM u LEFT JOIN b ON u.source = b.source""",
    // PII density: q79's exact regexp_extract_all patterns, rolled up
    // per source; rate is the shifted half-up // micro form.
    "q127_pii_density" ->
      """WITH c AS (
           SELECT source,
             len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS e,
             len(regexp_extract_all(text, '\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b')) AS i,
             len(regexp_extract_all(text, '\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b')) AS s,
             len(regexp_extract_all(text, '\+?\b(?:[0-9]{1,2}[ .-]?)?\(?[0-9]{3}\)?[ .-]?[0-9]{3}[ .-]?[0-9]{4}\b')) AS p
           FROM documents
         ), a AS (
           SELECT source, count(*) AS n_docs,
             sum(e) AS n_email, sum(i) AS n_ipv4, sum(s) AS n_ssn,
             sum(p) AS n_phone,
             sum(CASE WHEN e + i + s + p > 0 THEN 1 ELSE 0 END) AS na
           FROM c GROUP BY 1
         )
         SELECT source, CAST(n_docs AS BIGINT) AS n_docs,
           CAST(n_email AS BIGINT) AS n_email, CAST(n_ipv4 AS BIGINT) AS n_ipv4,
           CAST(n_ssn AS BIGINT) AS n_ssn, CAST(n_phone AS BIGINT) AS n_phone,
           CAST((2000000 * na + n_docs) // (2 * n_docs) AS BIGINT) AS pii_doc_rate_micro
         FROM a""",
    // Shard balance: the q44 md5-32 bucket idiom mod 32; both micro
    // shares are half-up // on non-negative operands, deviation their
    // difference; sums HUGEINT through the products (q121 rule).
    "q126_shard_balance" ->
      """WITH d AS (
           SELECT CAST(CAST(list_sum(list_transform(range(8),
               j -> CAST(strpos('0123456789abcdef', substring(hx, CAST(j + 1 AS INT), 1)) - 1 AS BIGINT) << (4*(7 - CAST(j AS INT))))) AS BIGINT) % 32 AS BIGINT) AS shard,
             len(string_split(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')), ' ')) AS n
           FROM (SELECT text, md5('graft:' || CAST(doc_id AS VARCHAR)) AS hx FROM documents)
         ), a AS (
           SELECT shard, count(*) AS n_docs, sum(n) AS n_tokens FROM d GROUP BY 1
         ), t AS (SELECT sum(n_tokens) AS tot FROM a)
         SELECT shard, CAST(n_docs AS BIGINT) AS n_docs,
           CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST((n_tokens * 2000000 + tot) // (2 * tot) AS BIGINT) AS share_micro,
           CAST((n_tokens * 2000000 + tot) // (2 * tot)
             - (2000000 + 32) // 64 AS BIGINT) AS dev_micro
         FROM a, t""",
    // Packing efficiency: ⌈⌉ via (a+b−1)//b on non-negative operands;
    // sums stay HUGEINT through the ·2e6 products (q121 rule).
    "q125_packing_efficiency" ->
      """WITH d AS (
           SELECT len(string_split(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')), ' ')) AS n
           FROM documents
         ), e AS (
           SELECT CAST(l AS BIGINT) AS seq_len, CAST(n AS BIGINT) AS n
           FROM d CROSS JOIN (SELECT unnest([512, 1024, 2048]) AS l)
         ), a AS (
           SELECT seq_len, count(*) AS n_docs, sum(n) AS total_tokens,
             sum((n + seq_len - 1) // seq_len) AS n_seqs_padded
           FROM e GROUP BY 1
         )
         SELECT seq_len, CAST(n_docs AS BIGINT) AS n_docs,
           CAST(total_tokens AS BIGINT) AS total_tokens,
           CAST(n_seqs_padded AS BIGINT) AS n_seqs_padded,
           CAST(n_seqs_padded * seq_len - total_tokens AS BIGINT) AS pad_tokens,
           CAST((total_tokens * 2000000 + n_seqs_padded * seq_len)
             // (2 * n_seqs_padded * seq_len) AS BIGINT) AS eff_padded_micro,
           CAST((total_tokens * 2000000 + ((total_tokens + seq_len - 1) // seq_len) * seq_len)
             // (2 * ((total_tokens + seq_len - 1) // seq_len) * seq_len) AS BIGINT) AS eff_concat_micro
         FROM a""",
    // BPE merges: 1-based char indexing over the distinct-vocab frame;
    // weighting by token count reproduces the corpus-stream mass.
    "q124_bpe_merges" ->
      """WITH tok AS (
           SELECT unnest(string_split(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')), ' ')) AS token
           FROM documents
         ), uni AS (
           SELECT token, CAST(count(*) AS BIGINT) AS cnt FROM tok
           GROUP BY 1 HAVING len(token) >= 2
         ), pr AS (
           SELECT token[i] AS left_unit, token[i + 1] AS right_unit, cnt
           FROM (SELECT token, cnt, unnest(generate_series(1, len(token) - 1)) AS i
                 FROM uni)
         ), agg AS (
           SELECT left_unit, right_unit, CAST(sum(cnt) AS BIGINT) AS freq
           FROM pr GROUP BY 1, 2
         ), top AS (
           SELECT left_unit, right_unit, freq FROM agg
           ORDER BY freq DESC, left_unit, right_unit LIMIT 30
         )
         SELECT CAST(row_number() OVER (ORDER BY freq DESC, left_unit, right_unit) AS BIGINT) AS rank,
           left_unit, right_unit, freq
         FROM top""",
    // LSH recall: the q18 and q19 oracles composed verbatim (shared
    // defs); ratios are shifted half-up intDiv micro, NULL-guarded.
    "q123_lsh_recall" ->
      s"""WITH truth AS (
           SELECT id_a, id_b FROM ($ngramJaccardPairsSql)
         ), cand AS (
           SELECT id_a, id_b FROM ($minhashPairsSql)
         ), h AS (
           SELECT count(*) AS n_hit FROM truth JOIN cand USING (id_a, id_b)
         ), tn AS (SELECT count(*) AS n_true FROM truth),
         cn AS (SELECT count(*) AS n_cand FROM cand)
         SELECT CAST(n_true AS BIGINT) AS n_true,
           CAST(n_cand AS BIGINT) AS n_cand,
           CAST(n_hit AS BIGINT) AS n_hit,
           CASE WHEN n_true = 0 THEN NULL
                ELSE CAST((2000000*CAST(n_hit AS HUGEINT) + n_true) // (2*CAST(n_true AS HUGEINT)) AS BIGINT)
           END AS recall_micro,
           CASE WHEN n_cand = 0 THEN NULL
                ELSE CAST((2000000*CAST(n_hit AS HUGEINT) + n_cand) // (2*CAST(n_cand AS HUGEINT)) AS BIGINT)
           END AS precision_micro
         FROM tn, cn, h""",
    // Quality representatives: the shared components CTE + q85's exact
    // q_micro formula (one copy each), argmax via QUALIFY rank.
    "q122_quality_reps" ->
      s"""WITH comp AS (
           SELECT doc_id, cluster_id FROM ($componentsSql)
         ), q AS (
           SELECT doc_id,
             least(len(text), 500) * 800
             + (CASE WHEN 10 * len(list_filter(string_split(norm, ' '),
                      t2 -> list_contains(['the','a','an','of','and','or','to','in','is','it'], t2)))
                      >= len(string_split(norm, ' ')) THEN 300000
                ELSE (6000000 * len(list_filter(string_split(norm, ' '),
                        t2 -> list_contains(['the','a','an','of','and','or','to','in','is','it'], t2)))
                      + len(string_split(norm, ' ')))
                     // (2 * len(string_split(norm, ' '))) END)
             + (CASE WHEN len(replace(norm, ' ', '')) >= 3 * len(string_split(norm, ' '))
                      AND len(replace(norm, ' ', '')) <= 8 * len(string_split(norm, ' '))
                THEN 300000 ELSE 0 END) AS q_micro
           FROM (SELECT doc_id, text,
                   trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')) AS norm
                 FROM documents)
         ), j AS (
           SELECT c.cluster_id, c.doc_id, q.q_micro,
             row_number() OVER (PARTITION BY c.cluster_id
               ORDER BY q.q_micro DESC, c.doc_id) AS rn
           FROM comp c JOIN q ON c.doc_id = q.doc_id
         )
         SELECT cluster_id, CAST(count(*) AS BIGINT) AS n_members,
           CAST(max(CASE WHEN rn = 1 THEN doc_id END) AS BIGINT) AS rep_id,
           CAST(max(CASE WHEN rn = 1 THEN q_micro END) AS BIGINT) AS rep_q_micro,
           CAST(min(q_micro) AS BIGINT) AS min_q_micro,
           CAST(count(*) - 1 AS BIGINT) AS n_dropped
         FROM j GROUP BY 1""",
    // Token Gini: rank formula over the ascending (x, source) order;
    // sums stay UNCAST (HUGEINT) through the ·1e6 arithmetic (BIGINT
    // would overflow before Spark's DECIMAL does), outputs CAST.
    "q121_token_gini" ->
      """WITH d AS (
           SELECT lang, source,
             sum(len(string_split(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')), ' '))) AS x
           FROM documents GROUP BY 1, 2
         ), r AS (
           SELECT lang, source, x,
             CAST(row_number() OVER (PARTITION BY lang ORDER BY x, source) AS BIGINT) AS i
           FROM d
         ), a AS (
           SELECT lang, count(*) AS n, sum(x) AS sx, sum(i * x) AS six,
             max(x) AS mx
           FROM r GROUP BY 1
         )
         SELECT lang, CAST(n AS BIGINT) AS n_sources,
           CAST(sx AS BIGINT) AS total_tokens,
           CAST(((2*six - (n+1)*sx) * 2000000 + n*sx) // (2*n*sx) AS BIGINT) AS gini_micro,
           CAST((mx * 2000000 + sx) // (2*sx) AS BIGINT) AS top_share_micro
         FROM a""",
    // TextRank: unrolled integral-PageRank CTEs (exact integer rank
    // units — a double PageRank would be FP-fold-order-dependent and
    // unhashable across engines).
    "q120_textrank" -> textRankSql(vocab = 100, iters = 5),
    // Pipeline manifest: the q51 funnel, q47 components and q57 budget
    // oracles composed VERBATIM (shared defs — one copy of each gate's
    // formulas), joined per doc; bucket = the q44 md5 idiom.
    "q102_pipeline_manifest" ->
      s"""WITH f AS ($curationFunnelSql),
         c AS ($componentsSql),
         b AS ($tokenBudgetMixSql),
         d AS (
           SELECT doc_id, source,
             CAST(list_sum(list_transform(range(8),
               j -> CAST(strpos('0123456789abcdef', substring(hx, CAST(j + 1 AS INT), 1)) - 1 AS BIGINT) << (4*(7 - CAST(j AS INT))))) AS BIGINT) % 100 AS bucket
           FROM (SELECT doc_id, source, md5('graft:' || CAST(doc_id AS VARCHAR)) AS hx FROM documents)
         )
         SELECT d.doc_id, f.lang, d.source,
           (f.verdict = 'keep') AS keep_funnel,
           (c.doc_id IS NULL OR c.doc_id = c.cluster_id) AS keep_dedup,
           (d.bucket < b.keep_buckets) AS keep_budget,
           ((f.verdict = 'keep') AND (c.doc_id IS NULL OR c.doc_id = c.cluster_id)
             AND d.bucket < b.keep_buckets) AS keep
         FROM d
         JOIN f USING (doc_id)
         LEFT JOIN c ON d.doc_id = c.doc_id
         JOIN b ON d.source = b.source""",
    // Exact duplicated-substring stats: positional sliding-10-gram
    // md5-48 hashes (1-based slice → 0-based pos), df ≥ 2 covered
    // starts, gap ≤ k−1 islands-and-gaps merge for the interval-union
    // columns; longest_dup_span is EXACT — brute-force window
    // enumeration inside maximal CONTIGUOUS covered runs (every
    // occurrence of a duplicated L-substring lies in such a run),
    // (m, gram-sequence) occurrence count ≥ 2 ⟺ duplicated. The
    // engine's binary search must land on the same maxima; dup_frac
    // via the q82 integer half-up micro form; sum() outputs CAST to
    // BIGINT (type parity).
    "q101_exact_substr" ->
      """WITH t AS (
           SELECT doc_id,
             string_split(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')), ' ') AS toks
           FROM documents
         ), pos AS (
           SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos,
             CAST(list_sum(list_transform(range(12),
               j -> CAST(strpos('0123456789abcdef', substring(hx, CAST(j + 1 AS INT), 1)) - 1 AS BIGINT) << (4*(11 - CAST(j AS INT))))) AS BIGINT) AS h
           FROM (
             SELECT doc_id, i, md5(array_to_string(toks[i:i+9], ' ')) AS hx
             FROM (SELECT doc_id, toks, unnest(generate_series(1, len(toks) - 9)) AS i
                   FROM t WHERE len(toks) >= 10)
           )
         ), dfq AS (
           SELECT h, count(*) AS df FROM pos GROUP BY h
         ), cov AS (
           SELECT doc_id, pos, h FROM pos JOIN dfq USING (h) WHERE df >= 2
         ), isl AS (
           SELECT doc_id, pos,
             CAST(sum(CASE WHEN prev IS NOT NULL AND pos - prev > 9 THEN 1 ELSE 0 END)
               OVER (PARTITION BY doc_id ORDER BY pos
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS isl
           FROM (SELECT doc_id, pos,
                   lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
                 FROM cov)
         ), pisl AS (
           SELECT doc_id, isl, max(pos) - min(pos) + 10 AS len, count(*) AS nst
           FROM isl GROUP BY 1, 2
         ), agg AS (
           SELECT doc_id,
             CAST(sum(nst) AS BIGINT) AS n_dup_positions,
             CAST(sum(len) AS BIGINT) AS dup_tokens
           FROM pisl GROUP BY 1
         ), runs AS (
           SELECT doc_id, pos, h,
             CAST(sum(CASE WHEN prev IS NOT NULL AND pos - prev = 1 THEN 0 ELSE 1 END)
               OVER (PARTITION BY doc_id ORDER BY pos
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS rid
           FROM (SELECT doc_id, pos, h,
                   lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
                 FROM cov)
         ), rarr AS (
           SELECT doc_id, rid, list(h ORDER BY pos) AS garr
           FROM runs GROUP BY 1, 2
         ), win AS (
           SELECT doc_id, mm.m AS m,
             array_to_string(list_slice(garr, jj.j, jj.j + mm.m - 1), ',') AS wkey
           FROM rarr
           CROSS JOIN LATERAL (SELECT unnest(range(1, len(garr) + 1)) AS m) mm
           CROSS JOIN LATERAL (SELECT unnest(range(1, len(garr) - mm.m + 2)) AS j) jj
         ), dupw AS (
           SELECT m, wkey FROM win GROUP BY m, wkey HAVING count(*) >= 2
         ), longest AS (
           SELECT doc_id, CAST(max(m + 9) AS BIGINT) AS longest_dup_span
           FROM win JOIN dupw USING (m, wkey) GROUP BY doc_id
         ), base AS (
           SELECT doc_id,
             CAST(len(string_split(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')), ' ')) AS BIGINT) AS n_tokens
           FROM documents
         )
         SELECT b.doc_id, b.n_tokens,
           coalesce(a.n_dup_positions, 0) AS n_dup_positions,
           coalesce(a.dup_tokens, 0) AS dup_tokens,
           coalesce(l.longest_dup_span, 0) AS longest_dup_span,
           CAST((2000000 * coalesce(a.dup_tokens, 0) + b.n_tokens)
             // (2 * b.n_tokens) AS DOUBLE) / 1e6 AS dup_frac
         FROM base b
         LEFT JOIN agg a USING (doc_id)
         LEFT JOIN longest l USING (doc_id)""")

  /** DuckDB replay of `Similarity.pqAdcSearch` (q87). The subspace-s
    * slice of a vector is elements s·subDim+1 … (s+1)·subDim
    * (1-based); argmin via QUALIFY ORDER BY (dist, c) = the kernels'
    * strict-< lowest-index tie rule. */
  private def pqAdcSql(m: Int, subDim: Int, ks: Int, k: Int): String = {
    val subDist =
      s"""list_sum(list_transform(range($subDim), i ->
            (e.v[CAST(s.s*$subDim + i + 1 AS INT)] - cb.ce[CAST(s.s*$subDim + i + 1 AS INT)])
          * (e.v[CAST(s.s*$subDim + i + 1 AS INT)] - cb.ce[CAST(s.s*$subDim + i + 1 AS INT)])))"""
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         cb AS (
           SELECT row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1 AS c,
                  CAST(embedding AS DOUBLE[]) AS ce
           FROM embeddings ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT $ks
         ),
         codes AS (
           SELECT vec_id, s, c AS code FROM (
             SELECT e.vec_id, s.s, cb.c, $subDist AS dist
             FROM e CROSS JOIN range($m) s(s) CROSS JOIN cb
           ) QUALIFY row_number() OVER (PARTITION BY vec_id, s ORDER BY dist ASC, c ASC) = 1
         ),
         lut AS (
           SELECT e.vec_id AS query_id, s.s, cb.c, $subDist AS d
           FROM e CROSS JOIN range($m) s(s) CROSS JOIN cb
           WHERE e.vec_id < 5
         ),
         adc AS (
           SELECT lut.query_id, codes.vec_id AS neighbor_id, sum(lut.d) AS dist
           FROM codes JOIN lut ON codes.s = lut.s AND codes.code = lut.c
           WHERE codes.vec_id <> lut.query_id
           GROUP BY 1, 2
         )
         SELECT query_id, CAST(rnk AS INT) AS rank, neighbor_id, adc_dist FROM (
           SELECT query_id, neighbor_id, round(dist, 6) AS adc_dist,
             row_number() OVER (PARTITION BY query_id
               ORDER BY round(dist, 6) ASC, neighbor_id ASC) AS rnk
           FROM adc
         ) WHERE rnk <= $k"""
  }

  /** The q45 quantile-replay SQL over an arbitrary documents-shaped
    * source (must expose `lang`, `text`): explicit `quantile_cont`
    * interpolation — the same IEEE ops the Spark plan runs. */
  private def tokenQuantilesSql(source: String): String = {
    def q(p: String, alias: String) =
      s"""round(sum(CASE
            WHEN rn = floor(CAST(n - 1 AS DOUBLE) * $p) + 1
              THEN v * (1.0 - (CAST(n - 1 AS DOUBLE) * $p - floor(CAST(n - 1 AS DOUBLE) * $p)))
            WHEN rn = floor(CAST(n - 1 AS DOUBLE) * $p) + 2
              THEN v * (CAST(n - 1 AS DOUBLE) * $p - floor(CAST(n - 1 AS DOUBLE) * $p))
            ELSE 0.0 END), 6) AS $alias"""
    s"""SELECT grp AS lang, count(*) AS n_docs,
           CAST(sum(CAST(v AS BIGINT)) AS BIGINT) AS total_tokens,
           round(CAST(CAST(sum(CAST(v AS BIGINT)) AS BIGINT) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6) AS avg_tokens,
           ${q("0.5", "p50_tokens")},
           ${q("0.9", "p90_tokens")},
           ${q("0.99", "p99_tokens")}
         FROM (
           SELECT grp, v,
             row_number() OVER (PARTITION BY grp ORDER BY v) AS rn,
             count(*) OVER (PARTITION BY grp) AS n
           FROM (
             SELECT lang AS grp,
               CAST(len(string_split(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')), ' ')) AS DOUBLE) AS v
             FROM $source
           )
         ) GROUP BY grp"""
  }
}
