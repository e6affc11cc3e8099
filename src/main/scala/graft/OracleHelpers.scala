package graft

/** Shared oracle-SQL fragments (CTE chains, unrolled iterations,
  * mirrored hash folds) used by more than one OraclesA/B/C entry —
  * ONE definition per fragment so paired oracle copies cannot drift
  * (the q49/q81, q21/q72, q269/q270 rule).  Split out of SparkEntry
  * with the registry slices (r14 verdict #4).
  */
private[graft] trait OracleHelpers {

  // Incremental-dedup oracle shared by q49 (plain left_anti) and q81
  // (bloom-prefiltered): both compute exactly this set, so ONE
  // definition keeps the pair honest.
  /** DuckDB mirror of `TextAnalysis.hv60` (Spark: `conv(substring(
    * md5(e), 1, 15), 16, 10)`): positional base-16 fold of the first
    * 15 hex digits of md5 — ONE definition (shared by q272/q273/q274,
    * matching the inlined q241/q254/q262 fold) so the cross-engine
    * bit-exactness contract stays structural.
    */
  protected def hv60Sql(e: String): String =
    s"""list_reduce(list_transform(range(1, 16),
       |      i -> CAST(strpos('0123456789abcdef', substring(md5($e), i, 1)) - 1 AS BIGINT)),
       |      (a, b) -> a * 16 + b)""".stripMargin

  protected val CorpusDiffSql =
    """WITH fp AS (SELECT doc_id, source,
      |  md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' ')) AS fp
      |  FROM documents),
      |corp AS (SELECT DISTINCT fp FROM fp WHERE doc_id < 250)
      |SELECT f.doc_id, f.source FROM fp f WHERE f.fp NOT IN (SELECT fp FROM corp)""".stripMargin

  // Exact SQL mirror of TextFunctions.qualityScore (IEEE-sequence-
  // critical): TTR*0.5 + min(avgWordLen/10, 1)*0.5 — ONE definition
  // shared by q31 and q74 so the two oracle copies cannot drift.
  protected val qualitySql =
    """(CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
      |     / CAST(len(string_split(text, ' ')) AS DOUBLE)) * 0.5
      |  + least((CAST(length(text) - len(string_split(text, ' ')) + 1 AS DOUBLE)
      |     / CAST(len(string_split(text, ' ')) AS DOUBLE)) / 10.0, 1.0) * 0.5""".stripMargin

  // Shared oracle fragments: shingle CTE (word 3-grams, distinct per
  // doc) exactly mirroring TextFunctions.shingles.
  protected val shingleCte =
    """w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      |sh AS (SELECT DISTINCT doc_id,
      |  unnest([array_to_string(w[i:i+2], ' ') FOR i IN range(1, len(w) - 1)]) AS shingle
      |  FROM w WHERE len(w) >= 3)""".stripMargin

  // MinHash-LSH candidate pairs as a reusable CTE chain (ends in
  // mh_pairs) — the seeded-fold contract mirrored from
  // graft.plans.MinHashes; shared by q21 and q72's recursive closure.
  protected val minhashPairsCte =
    s"""$shingleCte,
       |hs AS (SELECT doc_id,
       |  list_reduce(list_concat([CAST(0 AS BIGINT)],
       |    list_transform(range(1, length(shingle) + 1), j -> CAST(ascii(substr(shingle, j, 1)) AS BIGINT))),
       |    (a, b) -> (a * 31 + b) % 4294967296) AS f
       |  FROM sh),
       |mh AS (SELECT doc_id, seed,
       |  min(CAST((CAST((((2654435761 * (seed + 1)) % 4294967296) | 1) AS HUGEINT) * f + seed)
       |      % 4294967296 AS BIGINT)) AS mh
       |  FROM hs CROSS JOIN (SELECT unnest(range(0, 8)) AS seed) seeds
       |  GROUP BY doc_id, seed),
       |sig AS (SELECT doc_id, seed // 2 AS band, string_agg(CAST(mh AS VARCHAR), ',' ORDER BY seed) AS sig
       |  FROM mh GROUP BY doc_id, seed // 2),
       |mh_pairs AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM sig a JOIN sig b ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id)""".stripMargin

  // Recursive min-reachable-id closure over the minhash candidate
  // pairs, ending in `cc_labels(doc_id, cluster_id)` — the exact
  // oracle of Dedup.connectedComponents' fixpoint, ONE definition
  // shared by q72 and q77 so the two copies cannot drift.  Callers
  // must open with WITH RECURSIVE.
  protected val closureCte =
    s"""$minhashPairsCte,
       |e AS (SELECT doc_a AS src, doc_b AS dst FROM mh_pairs
       |      UNION SELECT doc_b, doc_a FROM mh_pairs),
       |r AS (SELECT src AS doc_id, dst AS peer FROM e
       |      UNION
       |      SELECT r.doc_id, e.dst FROM r JOIN e ON r.peer = e.src),
       |cc_labels AS (SELECT doc_id, CAST(least(doc_id, min(peer)) AS BIGINT) AS cluster_id
       |              FROM r GROUP BY doc_id)""".stripMargin

  // Norm CTE mirroring VectorFunctions: sequential left-fold sums via
  // list_reduce (bit-identical to Spark's aggregate() fold).
  protected val normCte =
    """e AS (SELECT vec_id, embedding,
      |  sqrt(list_reduce(list_transform(embedding,
      |    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (a, b) -> a + b)) AS nrm
      |  FROM embeddings)""".stripMargin

  protected def dotSql(aEmb: String, bEmb: String): String =
    s"""list_reduce(list_transform(range(1, len($aEmb) + 1),
       |  i -> CAST($aEmb[i] AS DOUBLE) * CAST($bEmb[i] AS DOUBLE)), (a, b) -> a + b)""".stripMargin

  /** Shared q149/q155 attribution chain: events in integer µs,
    * purchases, touches, and the per-purchase argmax-(tus, t_id)
    * strictly-earlier touch (j1).  Emits CTEs e / p / t / j / j1.
    */
  protected val lastTouchCte =
    """e AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS us
      |  FROM events),
      |p AS (SELECT user_id, event_id AS purchase_id, us AS pus FROM e
      |      WHERE event_type = 'purchase'),
      |t AS (SELECT user_id, event_id AS t_id, event_type AS t_type, us AS tus
      |      FROM e WHERE event_type IN ('click', 'view')),
      |j AS (SELECT p.purchase_id, t.t_type, t.t_id, t.tus,
      |  row_number() OVER (PARTITION BY p.purchase_id
      |    ORDER BY t.tus DESC, t.t_id DESC) AS rk
      |  FROM p JOIN t ON t.user_id = p.user_id AND t.tus < p.pus),
      |j1 AS (SELECT * FROM j WHERE rk = 1)""".stripMargin

  /** One band-width row of the q157 operating curve: band keys by
    * seed-order string_agg (the q21 contract), bucket sizes, then
    * exact integer occupancy statistics.  Emits CTEs sw$w / bw$w /
    * st$w; assumes the `mh` CTE (doc_id, seed, mh) is in scope.
    */
  protected def bandStatsCte(w: Int, numHashes: Int = 8): String =
    s"""sw$w AS (SELECT doc_id, seed // $w AS band,
       |  string_agg(CAST(mh AS VARCHAR), ',' ORDER BY seed) AS sig
       |  FROM mh GROUP BY doc_id, seed // $w),
       |bw$w AS (SELECT band, sig, count(*) AS s FROM sw$w GROUP BY band, sig),
       |st$w AS (SELECT CAST($w AS INTEGER) AS rows_per_band,
       |  CAST(${numHashes / w} AS INTEGER) AS n_bands,
       |  count(*) AS n_buckets,
       |  CAST(sum(CASE WHEN s > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_multi_buckets,
       |  CAST(sum((s * (s - 1)) // 2) AS BIGINT) AS join_pairs,
       |  CAST(max(s) AS BIGINT) AS max_bucket FROM bw$w)""".stripMargin

  /** One q160 power iteration, mirroring
    * EventOps.stationaryDistribution: neighbor sums fold in prev
    * order (the q119 contract).  Emits CTE v$i referencing v${i-1}.
    */
  protected def statIterCte(i: Int): String =
    s"""v$i AS (SELECT p.next AS state,
       |  list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |    list(v.prob * p.p ORDER BY p.prev)), (a, b) -> a + b) AS prob
       |  FROM v${i - 1} v JOIN p ON p.prev = v.state GROUP BY p.next)""".stripMargin

  /** Bucketed all-vector kNN CTE chain (q143/q144), mirroring
    * Similarity.bucketedAllKnn: label-carrying norm frame, 6-bit
    * axis-sign buckets (the q26 rule), within-bucket cosine ranking,
    * rank ≤ k.  Emits CTEs el / ebk / bpairs / br / knn.
    */
  protected def allKnnCte(k: Int): String =
    s"""el AS (SELECT vec_id, label, embedding,
       |  sqrt(list_reduce(list_transform(embedding,
       |    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (a, b) -> a + b)) AS nrm
       |  FROM embeddings),
       |ebk AS (SELECT *,
       |  (CASE WHEN embedding[1] > 0 THEN 1 ELSE 0 END
       | + CASE WHEN embedding[2] > 0 THEN 2 ELSE 0 END
       | + CASE WHEN embedding[3] > 0 THEN 4 ELSE 0 END
       | + CASE WHEN embedding[4] > 0 THEN 8 ELSE 0 END
       | + CASE WHEN embedding[5] > 0 THEN 16 ELSE 0 END
       | + CASE WHEN embedding[6] > 0 THEN 32 ELSE 0 END) AS bucket FROM el),
       |bpairs AS (SELECT a.vec_id, a.label, c.vec_id AS neighbor_id,
       |    c.label AS n_label,
       |    ${dotSql("a.embedding", "c.embedding")} / (a.nrm * c.nrm) AS cos
       |  FROM ebk a JOIN ebk c ON a.bucket = c.bucket AND a.vec_id <> c.vec_id),
       |br AS (SELECT *, row_number() OVER (PARTITION BY vec_id
       |  ORDER BY cos DESC, neighbor_id) AS rank FROM bpairs),
       |knn AS (SELECT * FROM br WHERE rank <= $k)""".stripMargin

  /** One Lloyd iteration (q54), mirroring Similarity.lloydCentroids:
    * assign sample vectors to argmax-dot centroid (ties → lowest cid),
    * recompute each centroid as the per-dim mean folded in vec_id order
    * and rounded back to float32; empty cells keep the previous
    * centroid.  `prev` is the previous centroid CTE name; emits CTEs
    * a$i/u$i/m$i and the new centroid CTE c$i.
    */
  protected def lloydIterSql(prev: String, i: Int): String =
    s"""a$i AS (SELECT s.vec_id, s.embedding, c.cid,
       |  row_number() OVER (PARTITION BY s.vec_id ORDER BY
       |    ${dotSql("s.embedding", "c.c_emb")} DESC, c.cid) AS rk
       |  FROM smp s CROSS JOIN $prev c),
       |u$i AS (SELECT cid, list(embedding ORDER BY vec_id) AS embs
       |  FROM a$i WHERE rk = 1 GROUP BY cid),
       |m$i AS (SELECT cid, [CAST(list_reduce(list_transform(embs,
       |    x -> CAST(x[d] AS DOUBLE)), (a, b) -> a + b) / len(embs) AS REAL)
       |  FOR d IN range(1, 65)] AS c_emb FROM u$i),
       |c$i AS (SELECT p.cid, coalesce(m$i.c_emb, p.c_emb) AS c_emb
       |  FROM $prev p LEFT JOIN m$i USING (cid))""".stripMargin

  /** Per-subspace PQ codebook CTEs (q92), mirroring Similarity.pqAnn:
    * slice the embedding to subspace `s`, q54's Lloyd contract at
    * subDim dims (first-k init, bounded sample, ONE iteration,
    * argmax-dot ties→lowest-cid, vec_id-ordered mean fold, float32
    * round-back, empty cells keep previous), then the full-corpus code
    * assignment.  Emits CTEs sub$s/psmp$s/pc${s}0/pa$s/pu$s/pm$s/
    * pc${s}1 (the trained codebook) and pk$s (the code column).
    */
  protected def pqSubspaceSql(s: Int, subDim: Int, k: Int, sampleN: Int): String = {
    val lo = s * subDim + 1
    val hi = (s + 1) * subDim
    s"""sub$s AS (SELECT vec_id, embedding[$lo:$hi] AS embedding FROM embeddings),
       |psmp$s AS (SELECT vec_id, embedding FROM sub$s WHERE vec_id < $sampleN),
       |pc${s}0 AS (SELECT vec_id AS cid, embedding AS c_emb FROM sub$s WHERE vec_id < $k),
       |pa$s AS (SELECT t.vec_id, t.embedding, c.cid,
       |  row_number() OVER (PARTITION BY t.vec_id ORDER BY
       |    ${dotSql("t.embedding", "c.c_emb")} DESC, c.cid) AS rk
       |  FROM psmp$s t CROSS JOIN pc${s}0 c),
       |pu$s AS (SELECT cid, list(embedding ORDER BY vec_id) AS embs
       |  FROM pa$s WHERE rk = 1 GROUP BY cid),
       |pm$s AS (SELECT cid, [CAST(list_reduce(list_transform(embs,
       |    x -> CAST(x[d] AS DOUBLE)), (a, b) -> a + b) / len(embs) AS REAL)
       |  FOR d IN range(1, ${subDim + 1})] AS c_emb FROM pu$s),
       |pc${s}1 AS (SELECT p.cid, coalesce(pm$s.c_emb, p.c_emb) AS c_emb
       |  FROM pc${s}0 p LEFT JOIN pm$s USING (cid)),
       |pk$s AS (SELECT vec_id, cid FROM (
       |  SELECT t.vec_id, c.cid, row_number() OVER (PARTITION BY t.vec_id ORDER BY
       |    ${dotSql("t.embedding", "c.c_emb")} DESC, c.cid) AS rk
       |  FROM sub$s t CROSS JOIN pc${s}1 c) z WHERE rk = 1)""".stripMargin
  }

  /** Tier-ANN oracle bodies, shared verbatim by the index queries
    * (q54/q92/q95) and their recall audits (q209-q211), so the audited
    * index and the audit can never drift apart.
    */
  /** The q54 trained-cell CTE prefix (c0..e: 2-iter Lloyd, full-corpus
    * assignment, norms), shared verbatim by the IVF index (q54) and
    * the cell-bounded threshold-pair twin + its recall audit
    * (q223/q224).
    */
  protected def ivfCellsSql: String =
    s"""c0 AS (SELECT vec_id AS cid, embedding AS c_emb FROM embeddings WHERE vec_id < 8),
       |smp AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 256),
       |${lloydIterSql("c0", 1)},
       |${lloydIterSql("c1", 2)},
       |a AS (SELECT vec_id, embedding, cid,
       |  row_number() OVER (PARTITION BY vec_id
       |    ORDER BY ${dotSql("embedding", "c_emb")} DESC, cid) AS rk
       |  FROM embeddings CROSS JOIN c2),
       |asg AS (SELECT vec_id, embedding, cid FROM a WHERE rk = 1),
       |e AS (SELECT vec_id, embedding, cid,
       |  sqrt(list_reduce(list_transform(embedding,
       |    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (a, b) -> a + b)) AS nrm
       |  FROM asg)""".stripMargin

  protected def ivfAnnSql: String =
    s"""WITH $ivfCellsSql,
       |pairs AS (SELECT p.vec_id AS probe_id, q.vec_id AS neighbor_id,
       |  ${dotSql("p.embedding", "q.embedding")} / (p.nrm * q.nrm) AS cos
       |  FROM e p JOIN e q ON p.cid = q.cid AND p.vec_id < 6 AND p.vec_id <> q.vec_id),
       |r AS (SELECT *, row_number() OVER (PARTITION BY probe_id
       |  ORDER BY cos DESC, neighbor_id) AS rank FROM pairs)
       |SELECT probe_id, neighbor_id, cos AS cos_sim, CAST(rank AS INTEGER) AS rank
       |FROM r WHERE rank <= 3""".stripMargin

  /** Cell-bounded threshold pairs (q223), shared with its q224 recall
    * audit: q25's output contract restricted to same-cell candidates.
    */
  protected def cellPairsSql: String =
    s"""WITH $ivfCellsSql,
       |p AS (SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       |  ${dotSql("a.embedding", "b.embedding")} / (a.nrm * b.nrm) AS cos
       |  FROM e a JOIN e b ON a.cid = b.cid AND a.vec_id < b.vec_id)
       |SELECT vec_a, vec_b, cos AS cos_sim FROM p WHERE cos >= 0.42""".stripMargin

  /** q25's exact all-pairs oracle body, shared with q224. */
  protected def thresholdPairsSql: String =
    s"""WITH $normCte,
       |pairs AS (
       |  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       |    ${dotSql("a.embedding", "b.embedding")} / (a.nrm * b.nrm) AS cos
       |  FROM e a JOIN e b ON a.vec_id < b.vec_id)
       |SELECT vec_a, vec_b, cos AS cos_sim FROM pairs WHERE cos >= 0.42""".stripMargin

  protected def pqAnnSql: String =
    s"""WITH ${(0 until 4).map(pqSubspaceSql(_, 16, 8, 256)).mkString(",\n")},
       |codes AS (SELECT pk0.vec_id, pk0.cid AS k0, pk1.cid AS k1,
       |    pk2.cid AS k2, pk3.cid AS k3
       |  FROM pk0 JOIN pk1 USING (vec_id) JOIN pk2 USING (vec_id)
       |  JOIN pk3 USING (vec_id)),
       |sc AS (SELECT p.vec_id AS probe_id, c.vec_id AS neighbor_id,
       |  ${dotSql("p.embedding[1:16]", "z0.c_emb")}
       |  + ${dotSql("p.embedding[17:32]", "z1.c_emb")}
       |  + ${dotSql("p.embedding[33:48]", "z2.c_emb")}
       |  + ${dotSql("p.embedding[49:64]", "z3.c_emb")} AS adc
       |  FROM embeddings p JOIN codes c ON p.vec_id < 10 AND p.vec_id <> c.vec_id
       |  JOIN pc01 z0 ON z0.cid = c.k0
       |  JOIN pc11 z1 ON z1.cid = c.k1
       |  JOIN pc21 z2 ON z2.cid = c.k2
       |  JOIN pc31 z3 ON z3.cid = c.k3),
       |r AS (SELECT *, row_number() OVER (PARTITION BY probe_id
       |  ORDER BY adc DESC, neighbor_id) AS rank FROM sc)
       |SELECT probe_id, CAST(rank AS INTEGER) AS rank, neighbor_id, adc
       |FROM r WHERE rank <= 5""".stripMargin

  protected def ivfPqAnnSql: String =
    s"""WITH c0 AS (SELECT vec_id AS cid, embedding AS c_emb FROM embeddings WHERE vec_id < 8),
       |smp AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 256),
       |${lloydIterSql("c0", 1)},
       |cellasg AS (SELECT vec_id, cid AS cell FROM (
       |  SELECT e.vec_id, c.cid, row_number() OVER (PARTITION BY e.vec_id ORDER BY
       |    ${dotSql("e.embedding", "c.c_emb")} DESC, c.cid) AS rk
       |  FROM embeddings e CROSS JOIN c1 c) z WHERE rk = 1),
       |${(0 until 4).map(pqSubspaceSql(_, 16, 8, 256)).mkString(",\n")},
       |codes AS (SELECT pk0.vec_id, ca.cell, pk0.cid AS k0, pk1.cid AS k1,
       |    pk2.cid AS k2, pk3.cid AS k3
       |  FROM pk0 JOIN pk1 USING (vec_id) JOIN pk2 USING (vec_id)
       |  JOIN pk3 USING (vec_id) JOIN cellasg ca USING (vec_id)),
       |sc AS (SELECT p.vec_id AS probe_id, c.vec_id AS neighbor_id,
       |  ${dotSql("p.embedding[1:16]", "z0.c_emb")}
       |  + ${dotSql("p.embedding[17:32]", "z1.c_emb")}
       |  + ${dotSql("p.embedding[33:48]", "z2.c_emb")}
       |  + ${dotSql("p.embedding[49:64]", "z3.c_emb")} AS adc
       |  FROM embeddings p JOIN cellasg pc ON pc.vec_id = p.vec_id
       |  JOIN codes c ON p.vec_id < 10 AND p.vec_id <> c.vec_id AND c.cell = pc.cell
       |  JOIN pc01 z0 ON z0.cid = c.k0
       |  JOIN pc11 z1 ON z1.cid = c.k1
       |  JOIN pc21 z2 ON z2.cid = c.k2
       |  JOIN pc31 z3 ON z3.cid = c.k3),
       |r AS (SELECT *, row_number() OVER (PARTITION BY probe_id
       |  ORDER BY adc DESC, neighbor_id) AS rank FROM sc)
       |SELECT probe_id, CAST(rank AS INTEGER) AS rank, neighbor_id, adc
       |FROM r WHERE rank <= 5""".stripMargin

  /** Recall@k audit around any tier's oracle body (q209-q211),
    * mirroring Similarity.recallAgainstExact: the exact brute-force
    * top-`kExact` over `nProbes` probes LEFT-joins the tier's
    * (probe, neighbor) set — which runs unchanged inside a subquery —
    * then per-probe hit counts and one exact-integer divide.
    */
  protected def tierRecallSql(tierSql: String, nProbes: Int, kExact: Int): String =
    s"""WITH el AS (SELECT vec_id, embedding,
       |  sqrt(list_reduce(list_transform(embedding,
       |    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (a, b) -> a + b)) AS nrm
       |  FROM embeddings),
       |xp AS (SELECT p.vec_id AS probe_id, c.vec_id AS neighbor_id,
       |    ${dotSql("p.embedding", "c.embedding")} / (p.nrm * c.nrm) AS cos
       |  FROM el p JOIN el c ON p.vec_id < $nProbes AND p.vec_id <> c.vec_id),
       |xr AS (SELECT *, row_number() OVER (PARTITION BY probe_id
       |  ORDER BY cos DESC, neighbor_id) AS rank FROM xp),
       |exact AS (SELECT probe_id, neighbor_id FROM xr WHERE rank <= $kExact),
       |approx AS (SELECT probe_id, neighbor_id FROM (
       |$tierSql
       |) tier),
       |j AS (SELECT x.probe_id,
       |  CASE WHEN a.neighbor_id IS NULL THEN 0 ELSE 1 END AS hit
       |  FROM exact x LEFT JOIN approx a
       |    ON x.probe_id = a.probe_id AND x.neighbor_id = a.neighbor_id)
       |SELECT probe_id, count(*) AS n_exact, CAST(sum(hit) AS BIGINT) AS n_hits,
       |  CAST(sum(hit) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS recall
       |FROM j GROUP BY probe_id""".stripMargin

  /** One unrolled power-iteration step (q217), mirroring
    * Similarity.principalComponent: per-vector dot against v$prev
    * (0.0-seeded sequential fold — list_prepend replays Spark's
    * aggregate seed), per-dimension w_d via the quantize-then-exact-sum
    * scheme (floor(t·1e9 + 0.5) per term, summed as DECIMAL(38,0)
    * nano-units, one divide back — the DECIMAL(38,18)-cast-of-double
    * path measured 1-ulp cross-engine drift, see SCALING.md), the norm
    * folded over the d-ordered squares, and the normalized v$i list.
    * Emits CTEs dots$i/w$i/f$i/v$i.
    */
  protected def powerIterSql(i: Int): String =
    s"""dots$i AS (SELECT e.vec_id, e.embedding,
       |  list_reduce(list_prepend(0.0e0,
       |    [CAST(e.embedding[j] AS DOUBLE) * vv.v[j] FOR j IN range(1, 65)]),
       |    (a, b) -> a + b) AS dt
       |  FROM embeddings e CROSS JOIN v${i - 1} vv),
       |w$i AS (SELECT d,
       |  CAST(sum(CAST(floor(CAST(embedding[d] AS DOUBLE) * dt * 1.0e9 + 0.5)
       |    AS DECIMAL(38,0))) AS DOUBLE) / 1.0e9 AS wd
       |  FROM dots$i, (SELECT unnest(range(1, 65)) AS d) dd GROUP BY d),
       |f$i AS (SELECT ws,
       |  sqrt(list_reduce(list_prepend(0.0e0, list_transform(ws, x -> x * x)),
       |    (a, b) -> a + b)) AS nrm
       |  FROM (SELECT list(wd ORDER BY d) AS ws FROM w$i) z),
       |v$i AS (SELECT list_transform(ws, x -> x / nrm) AS v FROM f$i)""".stripMargin

  /** Power-iteration oracle body (q217), shared verbatim with the
    * q220 anisotropy audit that projects onto the same direction.
    */
  protected def principalComponentSql: String =
    s"""WITH v0 AS (SELECT list_transform(range(1, 65), i -> 0.125e0) AS v),
       |${powerIterSql(1)},
       |${powerIterSql(2)},
       |${powerIterSql(3)}
       |SELECT CAST(d AS INTEGER) AS d, ws[d] / nrm AS loading, nrm AS eigval
       |FROM f3, (SELECT unnest(range(1, 65)) AS d) dd""".stripMargin

  /** One unrolled MMR greedy iteration (q140), mirroring
    * Similarity.mmrSelect: anti-join the running selection u${i-1}
    * out of the candidate set, penalty = max pair-cos to any selected
    * doc, blend with the EXPLICIT double literal
    * 0.30000000000000004e0 — Catalyst folds (1.0 − 0.7) in binary
    * doubles to that value, but DuckDB parses bare decimal literals
    * as DECIMAL and folds (1.0 − 0.7) EXACTLY to 0.3, a DIFFERENT
    * double (measured: 1 ulp off on 9/50 rows); the e0 suffix forces
    * DuckDB's parser into DOUBLE and replays Java's fold.  Pick via
    * the q54 argmax contract.  Emits CTEs r$i/p$i/m$i/s$i/u$i.
    */
  protected def mmrIterSql(i: Int): String = {
    val prev = s"u${i - 1}"
    s"""r$i AS (SELECT q.* FROM qs q WHERE NOT EXISTS (
       |  SELECT 1 FROM $prev s WHERE s.probe_id = q.probe_id AND s.doc_id = q.doc_id)),
       |p$i AS (SELECT pp.probe_id, pp.doc_a AS doc_id, max(pp.cos) AS pen
       |  FROM pp JOIN $prev s ON s.probe_id = pp.probe_id AND s.doc_id = pp.doc_b
       |  GROUP BY pp.probe_id, pp.doc_a),
       |m$i AS (SELECT r.probe_id, r.doc_id, r.rel,
       |    0.7 * r.rel - 0.30000000000000004e0 * p.pen AS mmr
       |  FROM r$i r JOIN p$i p ON p.probe_id = r.probe_id AND p.doc_id = r.doc_id),
       |s$i AS (SELECT probe_id, doc_id, rel, mmr AS mmr_score, $i AS sel_rank
       |  FROM (SELECT *, row_number() OVER (PARTITION BY probe_id
       |    ORDER BY mmr DESC, doc_id) AS rk FROM m$i) z WHERE rk = 1),
       |u$i AS (SELECT * FROM $prev UNION ALL SELECT * FROM s$i)""".stripMargin
  }


  // Shared BPE-training chain (q295/q300/q302): w0 word histogram, s0
  // char symbols, and per-round (explode, pair-count, argmax, merged
  // state, symbol total) CTE stages for rounds 1..5 — ONE definition
  // so the three oracles cannot drift.  The merge fold replays
  // Tokenizer.mergeFold's left-to-right non-overlapping semantics
  // structurally (seeded list fold, NOT string replace); `word` rides
  // through every state so appliers (q300) can join segmentations
  // back to per-source occurrences.  Callers append final SELECTs.
  protected val bpeChainCte: String = {
    val roundCte = (k: Int) =>
      s"""e$k AS (SELECT freq,
         |    unnest([{'l': syms[i], 'r': syms[i+1]} FOR i IN range(1, len(syms))]) AS pp
         |  FROM s${k - 1}),
         |p$k AS (SELECT pp.l AS l, pp.r AS r, CAST(sum(freq) AS BIGINT) AS c
         |  FROM e$k GROUP BY 1, 2),
         |m$k AS (SELECT l, r, c FROM p$k ORDER BY c DESC, l ASC, r ASC LIMIT 1),
         |s$k AS MATERIALIZED (SELECT word, freq,
         |    list_reduce(list_prepend(CAST([] AS VARCHAR[]), list_transform(syms, s -> [s])),
         |      (acc, e) -> CASE WHEN len(acc) > 0 AND acc[len(acc)] = m.l AND e[1] = m.r
         |        THEN acc[1:len(acc)-1] || [m.l || m.r]
         |        ELSE acc || e END) AS syms
         |  FROM s${k - 1}, m$k AS m),
         |n$k AS (SELECT CAST(sum(freq * len(syms)) AS BIGINT) AS n_after FROM s$k)""".stripMargin
    s"""w0 AS (SELECT word, CAST(count(*) AS BIGINT) AS freq
       |  FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents) z
       |  WHERE word <> '' GROUP BY word),
       |s0 AS MATERIALIZED (SELECT word, freq,
       |    list_transform(range(1, length(word) + 1), i -> substring(word, i, 1)) AS syms
       |  FROM w0),
       |${(1 to 5).map(roundCte).mkString(",\n")}""".stripMargin
  }

  // q269/q270's shared oracle chain: deciles → buckets → interval
  // means → the minimax isotonic fit
  protected val isotonicCtes =
    """d AS (SELECT doc_id, n_chars,
      |    CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos,
      |    ntile(10) OVER (ORDER BY n_chars, doc_id) AS decile
      |  FROM documents),
      |b AS MATERIALIZED (SELECT decile, CAST(count(*) AS BIGINT) AS n_docs,
      |    CAST(sum(pos) AS BIGINT) AS n_pos FROM d GROUP BY decile),
      |iv AS MATERIALIZED (SELECT a.decile AS j, c.decile AS kk,
      |    CAST(sum(m.n_pos) AS DOUBLE) / CAST(sum(m.n_docs) AS DOUBLE) AS avg_jk
      |  FROM b a JOIN b c ON a.decile <= c.decile
      |  JOIN b m ON m.decile BETWEEN a.decile AND c.decile
      |  GROUP BY 1, 2),
      |mn AS (SELECT i.decile AS i, v.j, min(v.avg_jk) AS mn
      |  FROM b i JOIN iv v ON v.j <= i.decile AND v.kk >= i.decile
      |  GROUP BY 1, 2),
      |iso AS (SELECT i, max(mn) AS iso_rate FROM mn GROUP BY i)""".stripMargin
}
