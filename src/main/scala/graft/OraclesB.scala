package graft

/** Oracle-SQL registry slice B (q71…q199, 91 entries) —
  * split out of SparkEntry so the per-batch oracle constants stop
  * being a single merge hot-spot (r14 verdict #4).  Pure data: the
  * assembled map is `SparkEntry.oracleSql`; the determinism rules
  * live in SparkEntry's scaladoc and every entry still pairs 1:1
  * with a `queries` entry of the same name.
  */
private[graft] trait OraclesB extends OracleHelpers {

  protected def oraclesB: Map[String, String] = Map(
    "q71_seq_packing" ->
      """WITH t AS (SELECT doc_id,
        |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok FROM documents),
        |c AS (SELECT doc_id, n_tok,
        |  coalesce(sum(n_tok) OVER (ORDER BY doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
        |  FROM t)
        |SELECT doc_id, n_tok, CAST(cum_before AS BIGINT) AS cum_before,
        |  CAST(cum_before // 2048 AS BIGINT) AS pack_id,
        |  CAST(cum_before % 2048 AS BIGINT) AS pack_offset
        |FROM c""".stripMargin,
    "q73_kmeans" ->
      s"""WITH c0 AS (SELECT vec_id AS cid, embedding AS c_emb FROM embeddings WHERE vec_id < 8),
         |smp AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 256),
         |${lloydIterSql("c0", 1)},
         |${lloydIterSql("c1", 2)},
         |a AS (SELECT vec_id, cid,
         |  row_number() OVER (PARTITION BY vec_id
         |    ORDER BY ${dotSql("embedding", "c_emb")} DESC, cid) AS rk
         |  FROM embeddings CROSS JOIN c2)
         |SELECT cid, count(*) AS n_vecs, min(vec_id) AS min_vec
         |FROM a WHERE rk = 1 GROUP BY cid""".stripMargin,
    "q74_qgate" ->
      s"""WITH d AS (SELECT source,
        |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
        |  $qualitySql AS q
        |  FROM documents),
        |s AS (SELECT CAST(sum(n_tok) AS BIGINT) AS tot, count(*) AS n FROM d)
        |SELECT source, count(*) AS n_kept, CAST(sum(n_tok) AS BIGINT) AS kept_tokens
        |FROM d CROSS JOIN s
        |WHERE q >= 0.45 AND CAST(n_tok AS DOUBLE) > CAST(tot AS DOUBLE) / CAST(n AS DOUBLE)
        |GROUP BY source""".stripMargin,
    "q75_sample" ->
      """WITH r AS (SELECT * FROM (VALUES ('src0', 100), ('src1', 75), ('src2', 25)) v(source, pct)),
        |d AS (SELECT doc_id, source,
        |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
        |  ((strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 5, 1)) - 1) * 4096
        | + (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 6, 1)) - 1) * 256
        | + (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 7, 1)) - 1) * 16
        | + (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 8, 1)) - 1)) % 100 AS b
        | FROM documents),
        |k AS (SELECT d.source, n_tok, b < coalesce(r.pct, 50) AS keep
        |      FROM d LEFT JOIN r USING (source))
        |SELECT source, count(*) AS n_docs,
        |  CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled,
        |  CAST(sum(CASE WHEN keep THEN n_tok ELSE 0 END) AS BIGINT) AS sampled_tokens
        |FROM k GROUP BY source""".stripMargin,
    "q76_srcdups" ->
      s"""WITH $minhashPairsCte,
         |j AS (SELECT least(da.source, db.source) AS source_x,
         |             greatest(da.source, db.source) AS source_y
         |      FROM mh_pairs p
         |      JOIN documents da ON p.doc_a = da.doc_id
         |      JOIN documents db ON p.doc_b = db.doc_id)
         |SELECT source_x, source_y, count(*) AS n_pairs FROM j GROUP BY 1, 2""".stripMargin,
    "q77_survivor" ->
      s"""WITH RECURSIVE $closureCte,
         |qs AS (SELECT doc_id, $qualitySql AS q FROM documents),
         |j AS (SELECT l.cluster_id, l.doc_id, qs.q,
         |  row_number() OVER (PARTITION BY l.cluster_id ORDER BY qs.q DESC, l.doc_id) AS rk,
         |  count(*) OVER (PARTITION BY l.cluster_id) AS n_members
         |  FROM cc_labels l JOIN qs USING (doc_id))
         |SELECT cluster_id, doc_id AS survivor_id, q AS survivor_q,
         |  CAST(n_members AS BIGINT) AS n_members
         |FROM j WHERE rk = 1""".stripMargin,
    // 48-bit simhash over the shared 3-gram shingles (same bit-read
    // contract as q23: hex digit b/4 of md5, big-endian within the
    // digit), banded 4×12 for candidates, exact Hamming ≤ 3 filter,
    "q78_simhash_pairs" ->
      s"""WITH $shingleCte,
         |bits AS (
         |  SELECT doc_id, b,
         |    CASE WHEN 2 * sum(((strpos('0123456789abcdef', substr(md5(shingle), CAST(b // 4 AS INTEGER) + 1, 1)) - 1)
         |      // (CASE WHEN b % 4 = 0 THEN 8 WHEN b % 4 = 1 THEN 4 WHEN b % 4 = 2 THEN 2 ELSE 1 END)) % 2)
         |      >= count(*) THEN 1 ELSE 0 END AS maj
         |  FROM sh CROSS JOIN (SELECT unnest(range(0, 48)) AS b) bb
         |  GROUP BY doc_id, b),
         |sg AS (SELECT doc_id, CAST(sum(maj * (CAST(1 AS BIGINT) << CAST(b AS INTEGER))) AS BIGINT) AS simhash
         |       FROM bits GROUP BY doc_id),
         |bands AS (SELECT doc_id, simhash, b, (simhash >> (12 * CAST(b AS INTEGER))) & 4095 AS slice
         |          FROM sg CROSS JOIN (SELECT unnest(range(0, 4)) AS b) t),
         |cand AS (SELECT DISTINCT a.doc_id AS doc_a, c.doc_id AS doc_b, a.simhash AS sig_a, c.simhash AS sig_b
         |         FROM bands a JOIN bands c ON a.b = c.b AND a.slice = c.slice AND a.doc_id < c.doc_id)
         |SELECT doc_a, doc_b, CAST(bit_count(xor(sig_a, sig_b)) AS INTEGER) AS hamming
         |FROM cand WHERE bit_count(xor(sig_a, sig_b)) <= 3""".stripMargin,
    "q79_dup_spans" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |sp AS (SELECT DISTINCT doc_id,
        |  unnest([array_to_string(w[i:i+7], ' ') FOR i IN range(1, len(w) - 6)]) AS shingle
        |  FROM w WHERE len(w) >= 8),
        |df AS (SELECT shingle, count(*) AS df FROM sp GROUP BY shingle),
        |per AS (SELECT s.doc_id, count(*) AS n_spans,
        |        CAST(sum(CASE WHEN d.df >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_spans
        |        FROM sp s JOIN df d USING (shingle) GROUP BY s.doc_id)
        |SELECT doc_id, n_spans, n_dup_spans,
        |  CAST(n_dup_spans AS DOUBLE) / CAST(n_spans AS DOUBLE) AS dup_frac
        |FROM per WHERE n_dup_spans > 0""".stripMargin,
    // same trained-centroid chain as q54/q73; pairs only within a
    // cell, dropped = lower-id mate with cosine ≥ 0.40,
    "q80_semdedup" ->
      s"""WITH c0 AS (SELECT vec_id AS cid, embedding AS c_emb FROM embeddings WHERE vec_id < 8),
         |smp AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 256),
         |${lloydIterSql("c0", 1)},
         |${lloydIterSql("c1", 2)},
         |a AS (SELECT vec_id, embedding, cid,
         |  row_number() OVER (PARTITION BY vec_id
         |    ORDER BY ${dotSql("embedding", "c_emb")} DESC, cid) AS rk
         |  FROM embeddings CROSS JOIN c2),
         |e AS (SELECT vec_id, embedding, cid,
         |  sqrt(list_reduce(list_transform(embedding,
         |    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (a, b) -> a + b)) AS nrm
         |  FROM a WHERE rk = 1),
         |pr AS (SELECT q.vec_id AS id_b
         |       FROM e p JOIN e q ON p.cid = q.cid AND p.vec_id < q.vec_id
         |       WHERE ${dotSql("p.embedding", "q.embedding")} / (p.nrm * q.nrm) >= 0.40),
         |dropped AS (SELECT DISTINCT id_b FROM pr)
         |SELECT e.cid, count(*) AS n_vecs,
         |  CAST(sum(CASE WHEN d.id_b IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
         |  CAST(count(*) - sum(CASE WHEN d.id_b IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
         |FROM e LEFT JOIN dropped d ON e.vec_id = d.id_b
         |GROUP BY e.cid""".stripMargin,
    "q64_vocab_oov" ->
      """WITH toks AS (SELECT source, unnest(string_split(text, ' ')) AS token FROM documents),
        |vocab AS (SELECT token FROM (SELECT token, count(*) AS freq FROM toks GROUP BY 1
        |          ORDER BY freq DESC, token LIMIT 20)),
        |j AS (SELECT t.source, CASE WHEN v.token IS NULL THEN 0 ELSE 1 END AS in_vocab
        |      FROM toks t LEFT JOIN vocab v USING (token))
        |SELECT source, count(*) AS n_tokens,
        |  CAST(sum(in_vocab) AS BIGINT) AS n_in_vocab,
        |  CAST(count(*) - sum(in_vocab) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS oov_rate
        |FROM j GROUP BY source""".stripMargin,
    // — round-12 oracles —
    // entropy folds in token order, SUBTRACTING each p·ln p term (the
    // seed-prepend + a−b fold mirrors Spark's aggregate exactly and
    // keeps single-type docs at +0.0, never IEEE −0.0),
    "q102_token_entropy" ->
      """WITH tc AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
        |c AS (SELECT doc_id, token, count(*) AS c FROM tc GROUP BY doc_id, token),
        |d AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tok, count(*) AS n_types,
        |      list(c ORDER BY token) AS lst FROM c GROUP BY doc_id)
        |SELECT doc_id, n_tok, n_types,
        |  list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform(lst,
        |    c -> (CAST(c AS DOUBLE) / CAST(n_tok AS DOUBLE))
        |         * ln(CAST(c AS DOUBLE) / CAST(n_tok AS DOUBLE)))),
        |    (a, b) -> a - b) AS entropy
        |FROM d""".stripMargin,
    "q103_doc_chunks" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |s AS (SELECT doc_id, w, len(w) AS n, unnest(range(0, len(w), 24)) AS start
        |      FROM t WHERE len(w) >= 1)
        |SELECT doc_id,
        |  CAST(start // 24 AS BIGINT) AS chunk_id,
        |  CAST(start AS BIGINT) AS start_tok,
        |  CAST(least(32, n - start) AS BIGINT) AS chunk_len,
        |  md5(array_to_string(w[start + 1 : start + 32], ' ')) AS chunk_md5
        |FROM s""".stripMargin,
    // the Spark side computes ntile arithmetically over a two-pass
    // global rank (no single-partition window); the declarative form
    // here is bucket-for-bucket identical by ntile's definition,
    "q104_len_deciles" ->
      """WITH d AS (SELECT doc_id, n_chars,
        |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
        |  CAST(ntile(10) OVER (ORDER BY n_chars, doc_id) AS INTEGER) AS decile
        |  FROM documents)
        |SELECT decile, count(*) AS n_docs,
        |  min(n_chars) AS min_chars, max(n_chars) AS max_chars,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
        |  CAST(sum(n_tok) AS BIGINT) AS sum_tokens,
        |  CAST(sum(n_chars) AS DOUBLE) / count(*) AS avg_chars
        |FROM d GROUP BY decile""".stripMargin,
    "q105_hourly_anomaly" ->
      """WITH h AS (SELECT event_type,
        |  strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00') AS hour,
        |  count(*) AS c FROM events GROUP BY 1, 2),
        |s AS (SELECT event_type, count(*) AS n, CAST(sum(c) AS DOUBLE) AS sx,
        |      CAST(sum(c * c) AS DOUBLE) AS sxx FROM h GROUP BY event_type),
        |z AS (SELECT h.event_type, h.hour, h.c,
        |      (CAST(h.c AS DOUBLE) - sx / n) / sqrt((sxx - sx * sx / n) / (n - 1)) AS z
        |      FROM h JOIN s ON h.event_type = s.event_type)
        |SELECT event_type, hour, c, z FROM z
        |ORDER BY abs(z) DESC, event_type, hour LIMIT 20""".stripMargin,
    "q106_resample" ->
      """WITH b AS (SELECT date_trunc('hour', min(ts)) AS h0,
        |           date_trunc('hour', max(ts)) AS h1 FROM events),
        |spine AS (SELECT unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h FROM b),
        |ty AS (SELECT DISTINCT event_type FROM events),
        |hc AS (SELECT date_trunc('hour', ts) AS h, event_type, count(*) AS c
        |       FROM events GROUP BY 1, 2),
        |g AS (SELECT ty.event_type, spine.h, coalesce(hc.c, 0) AS n
        |      FROM spine CROSS JOIN ty
        |      LEFT JOIN hc ON hc.h = spine.h AND hc.event_type = ty.event_type)
        |SELECT event_type, strftime(h, '%Y-%m-%d %H:00') AS hour,
        |  CAST(n AS BIGINT) AS n,
        |  CAST(sum(n) OVER (PARTITION BY event_type ORDER BY h
        |       ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_n
        |FROM g""".stripMargin,
    // q12's exact session CTEs (ts+event_id order, strict >30 min),
    "q107_cooccurrence" ->
      """WITH e AS (
        |  SELECT user_id, event_id, event_type, epoch_ms(ts) AS ms,
        |    lag(epoch_ms(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ms,
        |    ts
        |  FROM events),
        |f AS (SELECT *, CASE WHEN prev_ms IS NULL OR ms - prev_ms > 1800000
        |  THEN 1 ELSE 0 END AS new_session FROM e),
        |s AS (SELECT *, sum(new_session) OVER (PARTITION BY user_id
        |  ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS session_idx FROM f),
        |st AS (SELECT DISTINCT user_id, session_idx, event_type FROM s),
        |tot AS (SELECT count(*) AS sn FROM (SELECT DISTINCT user_id, session_idx FROM st) q),
        |ct AS (SELECT event_type, count(*) AS c FROM st GROUP BY event_type),
        |p AS (SELECT a.event_type AS t_a, b.event_type AS t_b, count(*) AS n_ab
        |      FROM st a JOIN st b ON a.user_id = b.user_id
        |        AND a.session_idx = b.session_idx AND a.event_type < b.event_type
        |      GROUP BY 1, 2)
        |SELECT p.t_a, p.t_b, p.n_ab,
        |  (CAST(p.n_ab AS DOUBLE) * CAST(tot.sn AS DOUBLE)) /
        |  (CAST(ca.c AS DOUBLE) * CAST(cb.c AS DOUBLE)) AS lift
        |FROM p JOIN ct ca ON ca.event_type = p.t_a
        |  JOIN ct cb ON cb.event_type = p.t_b
        |  CROSS JOIN tot""".stripMargin,
    "q108_rolling_dau" ->
      """WITH du AS (SELECT DISTINCT user_id, epoch_ms(ts) // 86400000 AS day FROM events),
        |b AS (SELECT max(epoch_ms(ts)) // 86400000 AS d1 FROM events),
        |x AS (SELECT du.user_id, du.day + k.k AS t_day, k.k
        |      FROM du CROSS JOIN (SELECT unnest(range(0, 7)) AS k) k CROSS JOIN b
        |      WHERE du.day + k.k <= b.d1)
        |SELECT t_day AS day,
        |  CAST(DATE '1970-01-01' + CAST(t_day AS INTEGER) AS VARCHAR) AS day_date,
        |  count(DISTINCT CASE WHEN k = 0 THEN user_id END) AS dau,
        |  count(DISTINCT user_id) AS wau
        |FROM x GROUP BY t_day""".stripMargin,
    // q73's trained cells + a per-cell majority-label argmax (count
    // DESC, ties → lowest label — the house max-of-struct rule),
    "q109_cell_purity" ->
      s"""WITH c0 AS (SELECT vec_id AS cid, embedding AS c_emb FROM embeddings WHERE vec_id < 8),
         |smp AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 256),
         |${lloydIterSql("c0", 1)},
         |${lloydIterSql("c1", 2)},
         |a AS (SELECT vec_id, label, cid,
         |  row_number() OVER (PARTITION BY vec_id
         |    ORDER BY ${dotSql("embedding", "c_emb")} DESC, cid) AS rk
         |  FROM embeddings CROSS JOIN c2),
         |cl AS (SELECT cid, label, count(*) AS cl FROM a WHERE rk = 1 GROUP BY cid, label),
         |r AS (SELECT cid, label, cl,
         |      row_number() OVER (PARTITION BY cid ORDER BY cl DESC, label ASC) AS rk2,
         |      CAST(sum(cl) OVER (PARTITION BY cid) AS BIGINT) AS n_vecs
         |      FROM cl)
         |SELECT cid, n_vecs, CAST(label AS INTEGER) AS top_label, cl AS n_top,
         |  CAST(cl AS DOUBLE) / CAST(n_vecs AS DOUBLE) AS purity
         |FROM r WHERE rk2 = 1""".stripMargin,
    "q110_originality" ->
      s"""WITH $shingleCte,
         |df AS (SELECT shingle, count(*) AS df FROM sh GROUP BY shingle)
         |SELECT s.doc_id, count(*) AS n_shingles,
         |  CAST(sum(CASE WHEN d.df = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_unique,
         |  CAST(sum(CASE WHEN d.df = 1 THEN 1 ELSE 0 END) AS DOUBLE) / count(*) AS originality
         |FROM sh s JOIN df d USING (shingle) GROUP BY s.doc_id""".stripMargin,
    "q111_forward_fill" ->
      """WITH b AS (SELECT date_trunc('hour', min(ts)) AS h0,
        |           date_trunc('hour', max(ts)) AS h1 FROM events),
        |spine AS (SELECT unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h FROM b),
        |ty AS (SELECT DISTINCT event_type FROM events),
        |hc AS (SELECT date_trunc('hour', ts) AS h, event_type,
        |       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_obs
        |       FROM events GROUP BY 1, 2),
        |g AS (SELECT ty.event_type, spine.h, hc.avg_obs
        |      FROM spine CROSS JOIN ty
        |      LEFT JOIN hc ON hc.h = spine.h AND hc.event_type = ty.event_type),
        |f AS (SELECT event_type, h, avg_obs,
        |      last_value(avg_obs IGNORE NULLS) OVER (PARTITION BY event_type ORDER BY h
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled
        |      FROM g)
        |SELECT event_type, strftime(h, '%Y-%m-%d %H:00') AS hour,
        |  CAST(CASE WHEN avg_obs IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) AS has_data,
        |  coalesce(avg_obs, 0.0) AS hour_avg,
        |  coalesce(filled, 0.0) AS filled_avg
        |FROM f""".stripMargin,
    "q112_user_growth" ->
      """WITH f AS (SELECT user_id, min(epoch_ms(ts) // 86400000) AS day
        |           FROM events GROUP BY user_id),
        |g AS (SELECT day, count(*) AS new_users FROM f GROUP BY day)
        |SELECT day,
        |  CAST(DATE '1970-01-01' + CAST(day AS INTEGER) AS VARCHAR) AS day_date,
        |  new_users,
        |  CAST(sum(new_users) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_users
        |FROM g""".stripMargin,
    // q97's bigram CTE re-read as an autocomplete table: top-20 heads
    // by continuation total, top-3 continuations per head,
    "q113_next_token" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |bi AS (SELECT bigram, count(*) AS cnt FROM (
        |  SELECT unnest([array_to_string(w[i:i+1], ' ') FOR i IN range(1, len(w))]) AS bigram
        |  FROM w WHERE len(w) >= 2) GROUP BY bigram),
        |x AS (SELECT string_split(bigram, ' ')[1] AS head_tok,
        |             string_split(bigram, ' ')[2] AS next_tok, cnt FROM bi),
        |hd AS (SELECT head_tok, CAST(sum(cnt) AS BIGINT) AS tot FROM x GROUP BY head_tok
        |       ORDER BY tot DESC, head_tok ASC LIMIT 20),
        |r AS (SELECT x.head_tok, x.next_tok, x.cnt, hd.tot,
        |      row_number() OVER (PARTITION BY x.head_tok
        |        ORDER BY x.cnt DESC, x.next_tok ASC) AS rank
        |      FROM x JOIN hd USING (head_tok))
        |SELECT head_tok, CAST(rank AS INTEGER) AS rank, next_tok, cnt, tot,
        |  CAST(cnt AS DOUBLE) / CAST(tot AS DOUBLE) AS p_next
        |FROM r WHERE rank <= 3""".stripMargin,
    "q114_feature_scale" ->
      s"""WITH d AS (SELECT source, doc_id, $qualitySql AS q FROM documents),
         |s AS (SELECT source, min(q) AS qmin, max(q) AS qmax FROM d GROUP BY source)
         |SELECT d.source, d.doc_id, d.q,
         |  CASE WHEN s.qmax > s.qmin THEN (d.q - s.qmin) / (s.qmax - s.qmin)
         |       ELSE 0.5 END AS q_norm
         |FROM d JOIN s USING (source)""".stripMargin,
    // md5 hex digits 13-16 as the priority (the house digit registry:
    // q63 split 1-4, q75 rates 5-8, q98 fixed sample 9-12),
    "q115_class_balance" ->
      """WITH pr AS (SELECT vec_id, label, CAST(
        |  ((strpos('0123456789abcdef', substr(md5(CAST(vec_id AS VARCHAR)), 13, 1)) - 1) * 4096
        | + (strpos('0123456789abcdef', substr(md5(CAST(vec_id AS VARCHAR)), 14, 1)) - 1) * 256
        | + (strpos('0123456789abcdef', substr(md5(CAST(vec_id AS VARCHAR)), 15, 1)) - 1) * 16
        | + (strpos('0123456789abcdef', substr(md5(CAST(vec_id AS VARCHAR)), 16, 1)) - 1)) AS INTEGER) AS priority
        | FROM embeddings),
        |mn AS (SELECT min(n) AS min_n FROM (SELECT label, count(*) AS n
        |       FROM embeddings GROUP BY label)),
        |r AS (SELECT label, vec_id, priority, row_number() OVER (
        |        PARTITION BY label ORDER BY priority, vec_id) AS rank FROM pr)
        |SELECT label, CAST(rank AS INTEGER) AS rank, vec_id, priority
        |FROM r CROSS JOIN mn WHERE rank <= min_n""".stripMargin,
    "q116_pareto" ->
      """WITH lvl AS (SELECT p_brand, p_retailprice, max(p_size) AS lvl_max
        |             FROM part GROUP BY 1, 2),
        |pre AS (SELECT p_brand, p_retailprice,
        |        max(lvl_max) OVER (PARTITION BY p_brand ORDER BY p_retailprice
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS cheaper_max
        |        FROM lvl)
        |SELECT p.p_brand, p.p_partkey, p.p_retailprice, p.p_size
        |FROM part p JOIN pre USING (p_brand, p_retailprice)
        |WHERE cheaper_max IS NULL OR p.p_size > cheaper_max""".stripMargin,
    // q21's candidate pairs × q63's exact split buckets, oriented
    // train-side / eval-side,
    "q117_split_leakage" ->
      s"""WITH $minhashPairsCte,
         |lab AS (SELECT doc_id,
         |  CASE WHEN bucket < 80 THEN 'train'
         |       WHEN bucket < 90 THEN 'valid' ELSE 'test' END AS split
         |  FROM (SELECT doc_id,
         |    ((strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 4096
         |   + (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1) * 256
         |   + (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 3, 1)) - 1) * 16
         |   + (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 4, 1)) - 1)) % 100 AS bucket
         |   FROM documents)),
         |j AS (SELECT p.doc_a, p.doc_b, la.split AS split_a, lb.split AS split_b
         |      FROM mh_pairs p JOIN lab la ON la.doc_id = p.doc_a
         |      JOIN lab lb ON lb.doc_id = p.doc_b)
         |SELECT CASE WHEN split_a = 'train' THEN doc_a ELSE doc_b END AS train_doc,
         |  CASE WHEN split_a = 'train' THEN doc_b ELSE doc_a END AS eval_doc,
         |  CASE WHEN split_a = 'train' THEN split_b ELSE split_a END AS eval_split
         |FROM j WHERE split_a <> split_b
         |  AND (split_a = 'train' OR split_b = 'train')""".stripMargin,
    // integer features (quality in millionths via the q34 floor
    // trick): every sum is a pure integer, so the only double
    // conversions are correctly-rounded int→double on both sides,
    "q118_len_quality_corr" ->
      s"""WITH d AS (SELECT source,
         |  n_chars AS x,
         |  CAST(floor(($qualitySql) * 1000000.0 + 0.5) AS BIGINT) AS y
         |  FROM documents),
         |s AS (SELECT source, count(*) AS n_docs,
         |  CAST(sum(x) AS DOUBLE) AS sx, CAST(sum(y) AS DOUBLE) AS sy,
         |  CAST(sum(x * y) AS DOUBLE) AS sxy,
         |  CAST(sum(x * x) AS DOUBLE) AS sxx,
         |  CAST(sum(y * y) AS DOUBLE) AS syy
         |  FROM d GROUP BY source)
         |SELECT source, n_docs,
         |  (n_docs * sxy - sx * sy) /
         |  (sqrt(n_docs * sxx - sx * sx) * sqrt(n_docs * syy - sy * sy)) AS pearson_r
         |FROM s""".stripMargin,
    // 4 unrolled power iterations over the symmetrized q21 pair
    // graph; each neighbor sum replays GraphFold.segmentedSum — the
    // bounded two-level fold: residue segments (src % 4096) folded in
    // neighbor-id order, then partials in segment order (the r16
    // hub-hazard fix); damping constants written as the same literal
    // arithmetic both sides so both engines fold them to identical
    // doubles,
    "q119_pagerank" -> {
      val iterCte = (k: Int) =>
        s"""i${k}p AS (SELECT ed.dst AS id, ed.src % 4096 AS sg,
           |  list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
           |    list(r.r / ed.deg ORDER BY ed.src)), (a, b) -> a + b) AS p
           |  FROM ed JOIN r${k - 1} r ON r.id = ed.src GROUP BY ed.dst, sg),
           |i$k AS (SELECT id,
           |  list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
           |    list(p ORDER BY sg)), (a, b) -> a + b) AS s
           |  FROM i${k}p GROUP BY id),
           |r$k AS (SELECT id,
           |  (CAST(1.0 AS DOUBLE) - CAST(0.85 AS DOUBLE)) / n
           |    + CAST(0.85 AS DOUBLE) * s AS r FROM i$k, tot)""".stripMargin
      s"""WITH $minhashPairsCte,
         |e AS (SELECT doc_a AS src, doc_b AS dst FROM mh_pairs
         |      UNION ALL SELECT doc_b, doc_a FROM mh_pairs),
         |deg AS (SELECT src, count(*) AS deg FROM e GROUP BY src),
         |ed AS (SELECT e.src, e.dst, d.deg FROM e JOIN deg d USING (src)),
         |tot AS (SELECT count(*) AS n FROM deg),
         |r0 AS (SELECT src AS id, CAST(1.0 AS DOUBLE) / n AS r FROM deg, tot),
         |${iterCte(1)},
         |${iterCte(2)},
         |${iterCte(3)},
         |${iterCte(4)}
         |SELECT id AS doc_id, r AS pagerank FROM r4""".stripMargin
    },
    // audit form (q33/q58 pattern): exact top-k token counts +
    // literal-1 error-contract flags; Spark computes the sketch AND
    // its own exact recount, so a broken estimate flips a flag and
    // fails the hash,
    "q120_cms_heavy_hitters" ->
      """WITH t AS (SELECT unnest(string_split(text, ' ')) AS token FROM documents),
        |c AS (SELECT token, count(*) AS exact_cnt FROM t GROUP BY token)
        |SELECT token, exact_cnt,
        |  CAST(1 AS BIGINT) AS never_under, CAST(1 AS BIGINT) AS within_eps
        |FROM c ORDER BY exact_cnt DESC, token LIMIT 20""".stripMargin,
    // the oracle runs the naive all-pairs comparison the blocked join
    // provably equals (symmetric-delete candidates are a superset of
    // the true dist-1 pairs; the exact filter removes the rest),
    "q121_fuzzy_join" ->
      """SELECT a.s_name AS name_a, b.s_name AS name_b
        |FROM supplier a JOIN supplier b
        |ON a.s_name < b.s_name AND levenshtein(a.s_name, b.s_name) = 1""".stripMargin,
    // exact-rank percentile cuts with PURE-INTEGER rank arithmetic
    // ((n+19)//20, (19n+19)//20) — float rank math is a cross-engine
    // trap for fractions with no exact binary form (see q104 ntile),
    "q122_winsorized" ->
      """WITH r AS (SELECT source, n_chars,
        |  row_number() OVER (PARTITION BY source ORDER BY n_chars, doc_id) AS rn,
        |  count(*) OVER (PARTITION BY source) AS n FROM documents),
        |c AS (SELECT source,
        |  max(CASE WHEN rn = (n + 19) // 20 THEN n_chars END) AS p05,
        |  max(CASE WHEN rn = (19 * n + 19) // 20 THEN n_chars END) AS p95
        |  FROM r GROUP BY source)
        |SELECT d.source, count(*) AS n_docs, max(c.p05) AS p05, max(c.p95) AS p95,
        |  CAST(sum(greatest(least(d.n_chars, c.p95), c.p05)) AS DOUBLE)
        |    / CAST(count(*) AS DOUBLE) AS win_mean,
        |  CAST(sum(d.n_chars) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS raw_mean
        |FROM documents d JOIN c ON d.source = c.source GROUP BY d.source""".stripMargin,
    // integer-µs gaps (epoch_us, the q94 convention), lower median at
    // (n+1)//2 and p90 at (9n+9)//10, ties by event_id — all BIGINT,
    "q123_interarrival" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS us, event_id FROM events),
        |g AS (SELECT user_id, event_id,
        |  us - lag(us) OVER (PARTITION BY user_id ORDER BY us, event_id) AS gap FROM e),
        |gg AS (SELECT user_id, gap, event_id FROM g WHERE gap IS NOT NULL),
        |rk AS (SELECT user_id, gap,
        |  row_number() OVER (PARTITION BY user_id ORDER BY gap, event_id) AS rn,
        |  count(*) OVER (PARTITION BY user_id) AS n FROM gg)
        |SELECT user_id, max(n) AS n_gaps, min(gap) AS min_gap_us,
        |  max(CASE WHEN rn = (n + 1) // 2 THEN gap END) AS median_gap_us,
        |  max(CASE WHEN rn = (9 * n + 9) // 10 THEN gap END) AS p90_gap_us,
        |  max(gap) AS max_gap_us
        |FROM rk GROUP BY user_id""".stripMargin,
    // two-stage mirror: rare-shingle candidates (df <= 8, the q45
    // rule), then EXACT intersection over the full shingle sets —
    // containment is true, not the capped undercount,
    "q124_containment" ->
      s"""WITH $shingleCte,
         |dfc AS (SELECT shingle FROM (SELECT shingle, count(*) AS df FROM sh GROUP BY 1) t
         |        WHERE df <= 8),
         |shc AS (SELECT doc_id, sh.shingle FROM sh JOIN dfc USING (shingle)),
         |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM shc a JOIN shc b ON a.shingle = b.shingle AND a.doc_id < b.doc_id),
         |i AS (SELECT c.doc_a, c.doc_b, count(*) AS inter
         |  FROM cand c JOIN sh sa ON sa.doc_id = c.doc_a
         |  JOIN sh sb ON sb.doc_id = c.doc_b AND sb.shingle = sa.shingle
         |  GROUP BY 1, 2),
         |sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id)
         |SELECT i.doc_a, i.doc_b, inter, sa.n AS n_a, sb.n AS n_b,
         |  CAST(inter AS DOUBLE) / CAST(sa.n AS DOUBLE) AS containment_a,
         |  CAST(inter AS DOUBLE) / CAST(sb.n AS DOUBLE) AS containment_b
         |FROM i JOIN sz sa ON sa.doc_id = i.doc_a JOIN sz sb ON sb.doc_id = i.doc_b
         |WHERE greatest(CAST(inter AS DOUBLE) / CAST(sa.n AS DOUBLE),
         |               CAST(inter AS DOUBLE) / CAST(sb.n AS DOUBLE)) >= 0.9""".stripMargin,
    // centroid sums fold by vec_id, pair dot/norm sums fold by dim —
    // the zipped-unnest posexplode mirror + list_reduce ordered folds,
    "q125_centroid_sim" ->
      """WITH ex AS (SELECT label, vec_id,
        |  unnest(range(0, len(embedding))) AS dim,
        |  CAST(unnest(embedding) AS DOUBLE) AS v FROM embeddings),
        |cent AS (SELECT label, dim,
        |  list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list(v ORDER BY vec_id)),
        |    (a, b) -> a + b) / count(*) AS m
        |  FROM ex GROUP BY label, dim)
        |SELECT a.label AS label_a, b.label AS label_b,
        |  list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list(a.m * b.m ORDER BY a.dim)),
        |    (x, y) -> x + y)
        |  / (sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list(a.m * a.m ORDER BY a.dim)),
        |       (x, y) -> x + y))
        |   * sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list(b.m * b.m ORDER BY a.dim)),
        |       (x, y) -> x + y))) AS cos_sim
        |FROM cent a JOIN cent b ON a.dim = b.dim AND a.label < b.label
        |GROUP BY a.label, b.label""".stripMargin,
    // conditional-min firsts, integer-µs latencies, pure-integer
    // exact ranks over the converted-user set,
    "q126_conversion_latency" ->
      """WITH f AS (SELECT user_id,
        |  min(CASE WHEN event_type = 'view' THEN epoch_us(ts) END) AS fv,
        |  min(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END) AS fp
        |  FROM events GROUP BY user_id),
        |l AS (SELECT user_id, fp - fv AS lat FROM f
        |      WHERE fv IS NOT NULL AND fp IS NOT NULL AND fp >= fv),
        |r AS (SELECT lat, row_number() OVER (ORDER BY lat, user_id) AS rn,
        |      count(*) OVER () AS n FROM l)
        |SELECT max(n) AS n_converted,
        |  max(CASE WHEN rn = 1 THEN lat END) AS min_lat_us,
        |  max(CASE WHEN rn = (n + 3) // 4 THEN lat END) AS p25_lat_us,
        |  max(CASE WHEN rn = (n + 1) // 2 THEN lat END) AS median_lat_us,
        |  max(CASE WHEN rn = (3 * n + 3) // 4 THEN lat END) AS p75_lat_us,
        |  max(CASE WHEN rn = (9 * n + 9) // 10 THEN lat END) AS p90_lat_us,
        |  max(CASE WHEN rn = n THEN lat END) AS max_lat_us
        |FROM r""".stripMargin,
    // first-occurrence construction of the cumulative-distinct curve
    // (min doc_id per token → per-doc new counts → running sums),
    // decile checkpoints at pure-integer ranks, q85's fold-ordered
    // least-squares over ln(T)/ln(V),
    "q127_vocab_growth" ->
      """WITH tk AS (SELECT source, doc_id,
        |    unnest(string_split(text, ' ')) AS token FROM documents),
        |fst AS (SELECT source, token, min(doc_id) AS doc_id FROM tk GROUP BY source, token),
        |nv AS (SELECT source, doc_id, count(*) AS nv FROM fst GROUP BY source, doc_id),
        |nt AS (SELECT source, doc_id, count(*) AS nt FROM tk GROUP BY source, doc_id),
        |pd AS (SELECT nt.source, nt.doc_id, nt.nt, coalesce(nv.nv, 0) AS nv
        |       FROM nt LEFT JOIN nv ON nv.source = nt.source AND nv.doc_id = nt.doc_id),
        |cur AS (SELECT source, doc_id,
        |  row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn,
        |  sum(nt) OVER (PARTITION BY source ORDER BY doc_id) AS tokens_seen,
        |  sum(nv) OVER (PARTITION BY source ORDER BY doc_id) AS vocab_seen,
        |  count(*) OVER (PARTITION BY source) AS n
        |  FROM pd),
        |cp AS (SELECT source, k.decile, rn AS docs_seen,
        |  CAST(tokens_seen AS BIGINT) AS tokens_seen, CAST(vocab_seen AS BIGINT) AS vocab_seen
        |  FROM cur CROSS JOIN (SELECT unnest(range(1, 11)) AS decile) k
        |  WHERE rn = (k.decile * n + 9) // 10),
        |pts AS (SELECT source, decile, tokens_seen, vocab_seen,
        |  ln(CAST(tokens_seen AS DOUBLE)) AS x, ln(CAST(vocab_seen AS DOUBLE)) AS y FROM cp),
        |g AS (SELECT source, count(*) AS np,
        |  list_reduce(list_prepend(0.0, list(x ORDER BY decile)), (a, b) -> a + b) AS sx,
        |  list_reduce(list_prepend(0.0, list(y ORDER BY decile)), (a, b) -> a + b) AS sy,
        |  list_reduce(list_prepend(0.0, list(x * y ORDER BY decile)), (a, b) -> a + b) AS sxy,
        |  list_reduce(list_prepend(0.0, list(x * x ORDER BY decile)), (a, b) -> a + b) AS sxx
        |  FROM pts GROUP BY source)
        |SELECT cp.source, CAST(cp.decile AS INTEGER) AS decile,
        |  CAST(cp.docs_seen AS BIGINT) AS docs_seen, cp.tokens_seen, cp.vocab_seen,
        |  (CAST(np AS DOUBLE) * sxy - sx * sy) / (CAST(np AS DOUBLE) * sxx - sx * sx) AS heaps_b
        |FROM cp JOIN g ON g.source = cp.source""".stripMargin,
    // inner self-join on token (one-sided tokens contribute 0 to
    // BC); every op is correctly rounded IEEE — sqrt, divides, one
    // multiply, order-pinned fold — so parity is by-standard, not
    // sampled (the ln-based JSD variant hash-failed on a measured
    // Math.log/glibc last-ulp split; see the operator scaladoc),
    "q128_source_hellinger" ->
      """WITH cs AS (SELECT source, token, count(*) AS c FROM (
        |    SELECT source, unnest(string_split(text, ' ')) AS token FROM documents)
        |  GROUP BY source, token),
        |ts AS (SELECT source, sum(c) AS t FROM cs GROUP BY source),
        |w AS (SELECT cs.source, token, CAST(c AS DOUBLE) / CAST(t AS DOUBLE) AS p
        |      FROM cs JOIN ts ON ts.source = cs.source),
        |g AS (SELECT a.source AS source_a, b.source AS source_b,
        |    count(*) AS n_shared_terms,
        |    list_reduce(list_prepend(0.0, list(sqrt(a.p * b.p) ORDER BY a.token)),
        |      (x, y) -> x + y) AS bc_affinity
        |  FROM w a JOIN w b ON a.token = b.token AND a.source < b.source
        |  GROUP BY a.source, b.source)
        |SELECT source_a, source_b, n_shared_terms, bc_affinity,
        |  sqrt(greatest(0.0, 1.0 - bc_affinity)) AS hellinger
        |FROM g""".stripMargin,
    // q94's ordered lag → exact transition counts → one divide per
    // probability, GraftLn, fold in (prev, next) order,
    "q129_transition_entropy" ->
      """WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS us, event_id FROM events),
        |tr AS (SELECT user_id, event_type AS next,
        |    lag(event_type) OVER (PARTITION BY user_id ORDER BY us, event_id) AS prev
        |  FROM e),
        |c AS (SELECT user_id, prev, next, count(*) AS c FROM tr
        |      WHERE prev IS NOT NULL GROUP BY user_id, prev, next),
        |t AS (SELECT user_id, prev, sum(c) AS t FROM c GROUP BY user_id, prev),
        |tt AS (SELECT user_id, sum(c) AS tt FROM c GROUP BY user_id),
        |sc AS (SELECT c.user_id, c.prev, c.next,
        |    -((CAST(c.c AS DOUBLE) / CAST(tt.tt AS DOUBLE))
        |      * ln(CAST(c.c AS DOUBLE) / CAST(t.t AS DOUBLE))) AS contrib, tt.tt
        |  FROM c JOIN t ON t.user_id = c.user_id AND t.prev = c.prev
        |  JOIN tt ON tt.user_id = c.user_id)
        |SELECT user_id, CAST(max(tt) AS BIGINT) AS n_transitions, count(*) AS n_patterns,
        |  list_reduce(list_prepend(0.0, list(contrib ORDER BY prev, next)), (a, b) -> a + b)
        |    AS entropy_nats
        |FROM sc GROUP BY user_id""".stripMargin,
    // degree-oriented triangle enumeration: each triangle generated
    // once from its minimum-(deg, id) corner; integer counts, one
    // mul + one divide for the coefficient — parity by-standard,
    "q130_triangles" ->
      s"""WITH $minhashPairsCte,
         |deg AS (SELECT id, count(*) AS deg FROM (
         |    SELECT doc_a AS id FROM mh_pairs UNION ALL SELECT doc_b FROM mh_pairs)
         |  GROUP BY id),
         |e AS (SELECT
         |    CASE WHEN da.deg < db.deg OR (da.deg = db.deg AND p.doc_a < p.doc_b)
         |         THEN p.doc_a ELSE p.doc_b END AS src,
         |    CASE WHEN da.deg < db.deg OR (da.deg = db.deg AND p.doc_a < p.doc_b)
         |         THEN p.doc_b ELSE p.doc_a END AS dst
         |  FROM mh_pairs p
         |  JOIN deg da ON da.id = p.doc_a JOIN deg db ON db.id = p.doc_b),
         |f AS (SELECT e.src, e.dst, d.deg AS ddeg FROM e JOIN deg d ON d.id = e.dst),
         |tri AS (SELECT e1.src AS u, e1.dst AS v, e2.dst AS w
         |  FROM f e1 JOIN f e2 ON e2.src = e1.src
         |    AND (e1.ddeg < e2.ddeg OR (e1.ddeg = e2.ddeg AND e1.dst < e2.dst))
         |  JOIN f e3 ON e3.src = e1.dst AND e3.dst = e2.dst),
         |tc AS (SELECT id, count(*) AS n_tri FROM (
         |    SELECT u AS id FROM tri UNION ALL SELECT v FROM tri UNION ALL SELECT w FROM tri)
         |  GROUP BY id)
         |SELECT d.id AS doc_id, d.deg AS degree,
         |  coalesce(tc.n_tri, 0) AS n_triangles,
         |  CASE WHEN d.deg >= 2
         |       THEN (2.0 * CAST(coalesce(tc.n_tri, 0) AS DOUBLE))
         |            / CAST(d.deg * (d.deg - 1) AS DOUBLE)
         |       ELSE 0.0 END AS clustering
         |FROM deg d LEFT JOIN tc ON tc.id = d.id""".stripMargin,
    // exact integer rank formula: HUGEINT sums mirror Spark's
    // DECIMAL(38,0); the only float ops are two int→double casts and
    // one divide,
    "q131_gini" ->
      """WITH r AS (SELECT source, n_chars,
        |    row_number() OVER (PARTITION BY source ORDER BY n_chars, doc_id) AS rank
        |  FROM documents),
        |g AS (SELECT source, count(*) AS n_docs,
        |    sum(CAST(n_chars AS HUGEINT)) AS sx,
        |    sum(CAST(rank AS HUGEINT) * CAST(n_chars AS HUGEINT)) AS rs
        |  FROM r GROUP BY source)
        |SELECT source, n_docs, CAST(sx AS BIGINT) AS total_chars,
        |  CAST(2 * rs - (CAST(n_docs AS HUGEINT) + 1) * sx AS DOUBLE)
        |    / CAST(CAST(n_docs AS HUGEINT) * sx AS DOUBLE) AS gini
        |FROM g""".stripMargin,
    // marginals RE-aggregate the observed cell frame (one corpus
    // scan, like Spark); expected is mul+div of int→double casts,
    // contrib sub+mul+div — per-cell, no cross-cell fold,
    "q132_chi_square" ->
      """WITH o AS (SELECT source, lang, count(*) AS o FROM documents
        |  GROUP BY source, lang),
        |rt AS (SELECT source, CAST(sum(o) AS BIGINT) AS rt FROM o GROUP BY source),
        |ct AS (SELECT lang, CAST(sum(o) AS BIGINT) AS ct FROM o GROUP BY lang),
        |n AS (SELECT CAST(sum(o) AS BIGINT) AS n FROM o),
        |c AS (SELECT o.source, o.lang, o.o,
        |  CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE) / CAST(n AS DOUBLE) AS expected
        |  FROM o JOIN rt USING (source) JOIN ct USING (lang) CROSS JOIN n)
        |SELECT source, lang, o AS n_obs, expected,
        |  (CAST(o AS DOUBLE) - expected) * (CAST(o AS DOUBLE) - expected)
        |    / expected AS contrib
        |FROM c""".stripMargin,
    // the q88 BM25 chain (self-excluded, top-20) fused with the q24
    // dense-cosine chain (top-20) by reciprocal-rank fusion: each RRF
    // term is one int add + one divide, absent list → literal 0.0;
    // absent ranks surface as 0 ints, never NULL,
    "q133_hybrid_rrf" ->
      s"""WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token
         |  FROM documents),
         |tf AS (SELECT doc_id, token, count(*) AS tf FROM tok GROUP BY doc_id, token),
         |df AS (SELECT token, count(*) AS df FROM tf GROUP BY token),
         |nd AS (SELECT count(*) AS n_docs FROM documents),
         |dl AS (SELECT doc_id, len(string_split(text, ' ')) AS dl FROM documents),
         |st AS (SELECT count(*) AS n_docs,
         |  CAST(sum(dl) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avgdl FROM dl),
         |ts AS (SELECT tf.doc_id, tf.token, tf.tf, df.df,
         |  CAST(tf.tf AS DOUBLE) * ln(CAST(nd.n_docs AS DOUBLE) / CAST(df.df AS DOUBLE)) AS tfidf
         |  FROM tf JOIN df USING (token) CROSS JOIN nd),
         |qr AS (SELECT *, row_number() OVER (PARTITION BY doc_id
         |        ORDER BY tfidf DESC, token ASC) AS trank FROM ts),
         |probes AS (SELECT doc_id AS probe_id, token FROM qr
         |  WHERE trank <= 3 AND doc_id < 10),
         |terms AS (SELECT p.probe_id, tf.doc_id, tf.token,
         |  ln((CAST(st.n_docs AS DOUBLE) - CAST(df.df AS DOUBLE) + 0.5)
         |     / (CAST(df.df AS DOUBLE) + 0.5))
         |  * ((CAST(tf.tf AS DOUBLE) * (1.2 + 1.0))
         |     / (CAST(tf.tf AS DOUBLE)
         |        + 1.2 * ((1.0 - 0.75) + 0.75 * (CAST(dl.dl AS DOUBLE) / st.avgdl)))) AS s
         |  FROM probes p JOIN tf ON p.token = tf.token AND tf.doc_id <> p.probe_id
         |  JOIN df ON df.token = tf.token
         |  JOIN dl ON dl.doc_id = tf.doc_id
         |  CROSS JOIN st),
         |g AS (SELECT probe_id, doc_id,
         |  list_reduce(list_prepend(0.0, list(s ORDER BY token)), (a, x) -> a + x) AS score
         |  FROM terms GROUP BY probe_id, doc_id),
         |lr AS (SELECT probe_id, doc_id, row_number() OVER (PARTITION BY probe_id
         |        ORDER BY score DESC, doc_id ASC) AS lex_rank FROM g),
         |lex AS (SELECT * FROM lr WHERE lex_rank <= 20),
         |$normCte,
         |dp AS (SELECT p.vec_id AS probe_id, c.vec_id AS doc_id,
         |    ${dotSql("p.embedding", "c.embedding")} / (p.nrm * c.nrm) AS cos
         |  FROM e p JOIN e c ON p.vec_id < 10 AND p.vec_id <> c.vec_id),
         |dr AS (SELECT probe_id, doc_id, row_number() OVER (PARTITION BY probe_id
         |        ORDER BY cos DESC, doc_id ASC) AS dense_rank FROM dp),
         |den AS (SELECT * FROM dr WHERE dense_rank <= 20),
         |f AS (SELECT coalesce(l.probe_id, d.probe_id) AS probe_id,
         |    coalesce(l.doc_id, d.doc_id) AS doc_id,
         |    l.lex_rank, d.dense_rank,
         |    coalesce(1.0 / CAST(60 + l.lex_rank AS DOUBLE), 0.0)
         |      + coalesce(1.0 / CAST(60 + d.dense_rank AS DOUBLE), 0.0) AS rrf_score
         |  FROM lex l FULL OUTER JOIN den d
         |    ON l.probe_id = d.probe_id AND l.doc_id = d.doc_id),
         |r AS (SELECT *, row_number() OVER (PARTITION BY probe_id
         |       ORDER BY rrf_score DESC, doc_id ASC) AS rank FROM f)
         |SELECT probe_id, CAST(rank AS INTEGER) AS rank, doc_id,
         |  CAST(coalesce(lex_rank, 0) AS INTEGER) AS lex_rank,
         |  CAST(coalesce(dense_rank, 0) AS INTEGER) AS dense_rank, rrf_score
         |FROM r WHERE rank <= 10""".stripMargin,
    // priority q = w/u is ONE divide (ES keys would need ln — parity
    // is sampled luck, measured 57/65536 mismatches on these md5
    // ratios); u from md5 hex digits 13-16, disjoint from the q63/q75
    // and q98 digits; τ = the 11th priority, ŵ = max(w, τ),
    "q134_priority_sample" ->
      """WITH pr AS (SELECT source, doc_id, n_chars, CAST(
        |  ((strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 13, 1)) - 1) * 4096
        | + (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 14, 1)) - 1) * 256
        | + (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 15, 1)) - 1) * 16
        | + (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 16, 1)) - 1)) AS INTEGER) AS h
        | FROM documents),
        |p2 AS (SELECT source, doc_id, n_chars,
        |  CAST(n_chars AS DOUBLE) / (CAST(h + 1 AS DOUBLE) / 65537.0) AS priority
        |  FROM pr),
        |r AS (SELECT *, row_number() OVER (PARTITION BY source
        |  ORDER BY priority DESC, doc_id) AS rank FROM p2),
        |tau AS (SELECT source, priority AS tau FROM r WHERE rank = 11)
        |SELECT r.source, CAST(r.rank AS INTEGER) AS rank, r.doc_id,
        |  r.n_chars AS weight, r.priority,
        |  coalesce(tau.tau, 0.0) AS tau,
        |  greatest(CAST(r.n_chars AS DOUBLE), coalesce(tau.tau, 0.0)) AS w_est
        |FROM r LEFT JOIN tau USING (source) WHERE r.rank <= 10""".stripMargin,
    // exact ECDF sup over the union of step points; integer window
    // cums, one divide per ECDF value, abs + max — no fold, no
    // transcendental,
    "q135_ks_matrix" ->
      """WITH cells AS (SELECT source, n_chars AS len, count(*) AS cnt
        |  FROM documents GROUP BY source, n_chars),
        |tot AS (SELECT source, CAST(sum(cnt) AS BIGINT) AS n FROM cells GROUP BY source),
        |srcs AS (SELECT source FROM tot),
        |lft AS (SELECT c.source AS s1, s.source AS s2, c.len,
        |    c.cnt AS c1, CAST(0 AS BIGINT) AS c2
        |  FROM cells c JOIN srcs s ON c.source < s.source),
        |rgt AS (SELECT s.source AS s1, c.source AS s2, c.len,
        |    CAST(0 AS BIGINT) AS c1, c.cnt AS c2
        |  FROM cells c JOIN srcs s ON s.source < c.source),
        |m AS (SELECT s1, s2, len, CAST(sum(c1) AS BIGINT) AS c1,
        |    CAST(sum(c2) AS BIGINT) AS c2
        |  FROM (SELECT * FROM lft UNION ALL SELECT * FROM rgt) u
        |  GROUP BY s1, s2, len),
        |cum AS (SELECT s1, s2, len,
        |  CAST(sum(c1) OVER (PARTITION BY s1, s2 ORDER BY len
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum1,
        |  CAST(sum(c2) OVER (PARTITION BY s1, s2 ORDER BY len
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum2
        |  FROM m),
        |g AS (SELECT cum.s1, cum.s2, max(ta.n) AS n_a, max(tb.n) AS n_b,
        |    count(*) AS n_steps,
        |    max(abs(CAST(cum1 AS DOUBLE) / CAST(ta.n AS DOUBLE)
        |          - CAST(cum2 AS DOUBLE) / CAST(tb.n AS DOUBLE))) AS ks_stat
        |  FROM cum JOIN tot ta ON ta.source = cum.s1
        |  JOIN tot tb ON tb.source = cum.s2
        |  GROUP BY cum.s1, cum.s2)
        |SELECT s1 AS source_a, s2 AS source_b, n_a, n_b, n_steps, ks_stat
        |FROM g""".stripMargin,
    // signature match count is an order-independent integer sum over
    // the 8 seeds; exact Jaccard is the q22 intersection/union; a
    // band collision without shared shingles left-joins to a 0 floor,
    "q136_minhash_calibration" ->
      s"""WITH $minhashPairsCte,
         |m AS (SELECT p.doc_a, p.doc_b,
         |    CAST(sum(CASE WHEN a.mh = b.mh THEN 1 ELSE 0 END) AS BIGINT) AS n_match
         |  FROM mh_pairs p
         |  JOIN mh a ON a.doc_id = p.doc_a
         |  JOIN mh b ON b.doc_id = p.doc_b AND b.seed = a.seed
         |  GROUP BY p.doc_a, p.doc_b),
         |ix AS (SELECT p.doc_a, p.doc_b, count(*) AS i
         |  FROM mh_pairs p
         |  JOIN sh sa ON sa.doc_id = p.doc_a
         |  JOIN sh sb ON sb.doc_id = p.doc_b AND sb.shingle = sa.shingle
         |  GROUP BY p.doc_a, p.doc_b),
         |sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id)
         |SELECT m.doc_a, m.doc_b, m.n_match,
         |  CAST(m.n_match AS DOUBLE) / 8.0 AS est_jac,
         |  CAST(coalesce(ix.i, 0) AS DOUBLE)
         |    / CAST(na.n + nb.n - coalesce(ix.i, 0) AS DOUBLE) AS exact_jac,
         |  abs(CAST(m.n_match AS DOUBLE) / 8.0
         |    - CAST(coalesce(ix.i, 0) AS DOUBLE)
         |      / CAST(na.n + nb.n - coalesce(ix.i, 0) AS DOUBLE)) AS abs_err
         |FROM m LEFT JOIN ix ON ix.doc_a = m.doc_a AND ix.doc_b = m.doc_b
         |JOIN sz na ON na.doc_id = m.doc_a
         |JOIN sz nb ON nb.doc_id = m.doc_b""".stripMargin,
    // within-source document frequency over the DISTINCT shingle
    // frame; ties on shingle text; coverage one int->double divide,
    "q137_boilerplate" ->
      s"""WITH $shingleCte,
         |bs AS (SELECT d.source, s.shingle, count(*) AS n_docs_with
         |  FROM sh s JOIN documents d ON d.doc_id = s.doc_id
         |  GROUP BY d.source, s.shingle),
         |nd AS (SELECT source, count(*) AS n_docs_source FROM documents
         |  GROUP BY source),
         |r AS (SELECT *, row_number() OVER (PARTITION BY source
         |  ORDER BY n_docs_with DESC, shingle ASC) AS rank FROM bs)
         |SELECT r.source, CAST(r.rank AS INTEGER) AS rank, r.shingle,
         |  r.n_docs_with, nd.n_docs_source,
         |  CAST(r.n_docs_with AS DOUBLE) / CAST(nd.n_docs_source AS DOUBLE) AS coverage
         |FROM r JOIN nd USING (source) WHERE r.rank <= 5""".stripMargin,
    // integer day durations (epoch-ms DIV, the q91 rule); each
    // survival factor one divide of exact integers; the running
    // product is the windowed list fold with a 1.0 seed (exact under
    // multiplication), day-ordered on both engines,
    "q138_kaplan_meier" ->
      """WITH pu AS (SELECT user_id,
        |    min(epoch_ms(ts)) AS t0,
        |    min(CASE WHEN event_type = 'purchase' THEN epoch_ms(ts) END) AS tconv,
        |    max(epoch_ms(ts)) AS tlast
        |  FROM events GROUP BY user_id),
        |du AS (SELECT user_id,
        |    CASE WHEN tconv IS NOT NULL THEN 1 ELSE 0 END AS converted,
        |    (coalesce(tconv, tlast) - t0) // 86400000 AS dur_day
        |  FROM pu),
        |tot AS (SELECT count(*) AS n_total FROM du),
        |bd AS (SELECT dur_day, CAST(sum(converted) AS BIGINT) AS n_conv,
        |    CAST(sum(1 - converted) AS BIGINT) AS n_censor
        |  FROM du GROUP BY dur_day),
        |cr AS (SELECT dur_day, n_conv, n_censor,
        |    n_total - coalesce(CAST(sum(n_conv + n_censor) OVER (ORDER BY dur_day
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0) AS n_risk
        |  FROM bd CROSS JOIN tot),
        |f AS (SELECT *, CAST(n_risk - n_conv AS DOUBLE) / CAST(n_risk AS DOUBLE) AS factor
        |  FROM cr)
        |SELECT dur_day, n_risk, n_conv, n_censor,
        |  list_reduce(list_prepend(1.0, list(factor) OVER (ORDER BY dur_day
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)), (a, b) -> a * b) AS survival
        |FROM f""".stripMargin,
    // group sums/counts exact integers; one subtract + one divide;
    // singleton groups emit literal 0.0 behind the n > 1 guard,
    "q139_loo_encoding" ->
      """WITH j AS (SELECT e.vec_id AS doc_id, d.source, e.label
        |  FROM embeddings e JOIN documents d ON d.doc_id = e.vec_id),
        |g AS (SELECT source, CAST(sum(label) AS BIGINT) AS s, count(*) AS n
        |  FROM j GROUP BY source)
        |SELECT j.doc_id, j.source, j.label,
        |  CASE WHEN g.n > 1
        |       THEN CAST(g.s - j.label AS DOUBLE) / CAST(g.n - 1 AS DOUBLE)
        |       ELSE 0.0 END AS loo_mean
        |FROM j JOIN g USING (source)""".stripMargin,
    // unrolled greedy MMR: candidate top-10 per probe from the q24
    // chain, within-probe pair sims, then four mmrIterSql iterations
    // on top of the pure-relevance first pick,
    "q140_mmr" ->
      s"""WITH $normCte,
         |qp AS (SELECT p.vec_id AS probe_id, c.vec_id AS doc_id,
         |    ${dotSql("p.embedding", "c.embedding")} / (p.nrm * c.nrm) AS rel
         |  FROM e p JOIN e c ON p.vec_id < 10 AND p.vec_id <> c.vec_id),
         |qs AS (SELECT probe_id, doc_id, rel FROM (
         |    SELECT *, row_number() OVER (PARTITION BY probe_id
         |      ORDER BY rel DESC, doc_id) AS rk FROM qp) z
         |  WHERE rk <= 10),
         |pp AS (SELECT a.probe_id, a.doc_id AS doc_a, b.doc_id AS doc_b,
         |    ${dotSql("ea.embedding", "eb.embedding")} / (ea.nrm * eb.nrm) AS cos
         |  FROM qs a JOIN qs b ON a.probe_id = b.probe_id AND a.doc_id <> b.doc_id
         |  JOIN e ea ON ea.vec_id = a.doc_id
         |  JOIN e eb ON eb.vec_id = b.doc_id),
         |s1 AS (SELECT probe_id, doc_id, rel, rel AS mmr_score, 1 AS sel_rank
         |  FROM (SELECT *, row_number() OVER (PARTITION BY probe_id
         |    ORDER BY rel DESC, doc_id) AS rk FROM qs) z WHERE rk = 1),
         |u1 AS (SELECT * FROM s1),
         |${mmrIterSql(2)},
         |${mmrIterSql(3)},
         |${mmrIterSql(4)},
         |${mmrIterSql(5)}
         |SELECT probe_id, CAST(sel_rank AS INTEGER) AS sel_rank, doc_id,
         |  rel, mmr_score
         |FROM u5""".stripMargin,
    // tie-aware Mann-Whitney AUC from per-score class counts: all
    // integer until the single final divide; the half-tie term stays
    // integral by doubling (num2 / 2PN),
    "q141_roc_auc" ->
      """WITH cells AS (SELECT source, n_chars AS score,
        |  sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS pos,
        |  sum(CASE WHEN lang = 'en' THEN 0 ELSE 1 END) AS neg
        |  FROM documents GROUP BY source, n_chars),
        |w AS (SELECT source, pos, neg,
        |  coalesce(sum(neg) OVER (PARTITION BY source ORDER BY score
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cumneg
        |  FROM cells),
        |s AS (SELECT source,
        |  CAST(sum(pos * (2 * cumneg + neg)) AS DOUBLE) AS num2,
        |  CAST(sum(pos) AS DOUBLE) AS p, CAST(sum(neg) AS DOUBLE) AS n
        |  FROM w GROUP BY source)
        |SELECT source, CAST(p AS BIGINT) AS n_pos, CAST(n AS BIGINT) AS n_neg,
        |  CASE WHEN p > 0 AND n > 0 THEN num2 / (2.0 * p * n) ELSE 0.5 END AS auc
        |FROM s""".stripMargin,
    // quantile mapping: within-source percent-rank as-of-joined onto
    // the pooled step table; both percent-ranks are single divides of
    // exact integers, the as-of pick argmax over distinct gp values,
    "q142_quantile_norm" ->
      """WITH d AS (SELECT doc_id, source, n_chars FROM documents),
        |r AS (SELECT doc_id, source, n_chars,
        |  rank() OVER (PARTITION BY source ORDER BY n_chars) AS rk,
        |  count(*) OVER (PARTITION BY source) AS ns
        |  FROM d),
        |p AS (SELECT doc_id, source, n_chars,
        |  CASE WHEN ns > 1 THEN CAST(rk - 1 AS DOUBLE) / CAST(ns - 1 AS DOUBLE)
        |       ELSE 0.0 END AS p
        |  FROM r),
        |cells AS (SELECT n_chars AS v, count(*) AS c FROM d GROUP BY n_chars),
        |tot AS (SELECT CAST(sum(c) AS BIGINT) AS n_tot FROM cells),
        |steps AS (SELECT v,
        |  CAST(coalesce(sum(c) OVER (ORDER BY v
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS DOUBLE)
        |    / CAST(n_tot - 1 AS DOUBLE) AS gp
        |  FROM cells, tot)
        |SELECT p.doc_id, p.source, p.n_chars, p.p AS src_pct,
        |  arg_max(s.v, s.gp) AS norm_chars
        |FROM p JOIN steps s ON s.gp <= p.p
        |GROUP BY p.doc_id, p.source, p.n_chars, p.p""".stripMargin,
    // per-label disagreement over the bucketed kNN frame; integer
    // counts, one final divide, argmax confusion with the
    // smaller-label tiebreak, (-1, 0) sentinel for clean labels,
    "q143_knn_label_noise" ->
      s"""WITH ${allKnnCte(5)},
         |kd AS (SELECT *, CASE WHEN label <> n_label THEN 1 ELSE 0 END AS dis
         |  FROM knn),
         |pv AS (SELECT vec_id, label, count(*) AS nn, sum(dis) AS dis
         |  FROM kd GROUP BY vec_id, label),
         |pl AS (SELECT label, count(*) AS n_vecs,
         |    CAST(sum(nn) AS BIGINT) AS knn_rows,
         |    CAST(sum(dis) AS BIGINT) AS dis_total
         |  FROM pv GROUP BY label),
         |cf AS (SELECT label, n_label, count(*) AS cnt
         |  FROM kd WHERE dis = 1 GROUP BY label, n_label),
         |top AS (SELECT label, n_label AS top_confusion, cnt AS top_confusion_n
         |  FROM (SELECT *, row_number() OVER (PARTITION BY label
         |    ORDER BY cnt DESC, n_label) AS rk FROM cf) z WHERE rk = 1)
         |SELECT pl.label, pl.n_vecs, pl.knn_rows,
         |  CAST(pl.dis_total AS DOUBLE) / CAST(pl.knn_rows AS DOUBLE)
         |    AS disagree_frac,
         |  coalesce(top.top_confusion, -1) AS top_confusion,
         |  CAST(coalesce(top.top_confusion_n, 0) AS BIGINT) AS top_confusion_n
         |FROM pl LEFT JOIN top ON top.label = pl.label""".stripMargin,
    // reciprocity = equi-join of the kNN frame with itself on the
    // swapped id pair; cos is the identical dimension fold in both
    // directions so the a->b double is emitted,
    "q144_mutual_knn" ->
      s"""WITH ${allKnnCte(5)}
         |SELECT f.vec_id AS vec_a, f.neighbor_id AS vec_b, f.cos AS cos_sim,
         |  CAST(f.rank AS INTEGER) AS rank_ab, CAST(r2.rank AS INTEGER) AS rank_ba
         |FROM knn f JOIN knn r2
         |  ON r2.vec_id = f.neighbor_id AND r2.neighbor_id = f.vec_id
         |WHERE f.vec_id < f.neighbor_id""".stripMargin,
    // Poisson bootstrap: per-(doc, replicate) inverse-CDF weight from
    // md5 digits 1-4 of "doc#rep"; per-replicate integer sums, one
    // divide per mean, order-statistic CI picks; every CDF threshold
    // e0-suffixed so DuckDB parses DOUBLE, not DECIMAL,
    "q145_bootstrap_ci" ->
      """WITH reps AS (SELECT unnest(generate_series(1, 64)) AS b),
        |hh AS (SELECT d.n_chars, r.b, CAST(
        |   (strpos('0123456789abcdef', substr(md5(CAST(d.doc_id AS VARCHAR) || '#' || CAST(r.b AS VARCHAR)), 1, 1)) - 1) * 4096
        | + (strpos('0123456789abcdef', substr(md5(CAST(d.doc_id AS VARCHAR) || '#' || CAST(r.b AS VARCHAR)), 2, 1)) - 1) * 256
        | + (strpos('0123456789abcdef', substr(md5(CAST(d.doc_id AS VARCHAR) || '#' || CAST(r.b AS VARCHAR)), 3, 1)) - 1) * 16
        | + (strpos('0123456789abcdef', substr(md5(CAST(d.doc_id AS VARCHAR) || '#' || CAST(r.b AS VARCHAR)), 4, 1)) - 1) AS INTEGER) AS h
        | FROM documents d CROSS JOIN reps r),
        |uu AS (SELECT b, n_chars,
        |  (CAST(h AS DOUBLE) + 0.5e0) / 65536.0e0 AS u FROM hh),
        |ww AS (SELECT b, n_chars, CASE
        |  WHEN u < 0.36787944117144233e0 THEN 0
        |  WHEN u < 0.7357588823428847e0 THEN 1
        |  WHEN u < 0.9196986029286058e0 THEN 2
        |  WHEN u < 0.9810118431238462e0 THEN 3
        |  WHEN u < 0.9963401531726563e0 THEN 4
        |  WHEN u < 0.9994058151824183e0 THEN 5
        |  ELSE 6 END AS w FROM uu),
        |m AS (SELECT b, CAST(sum(w) AS DOUBLE) AS sw,
        |  CAST(sum(w * n_chars) AS DOUBLE) AS swx FROM ww GROUP BY b),
        |m0 AS (SELECT b, CASE WHEN sw > 0 THEN swx / sw ELSE 0.0 END AS mn FROM m),
        |mm AS (SELECT b, mn, row_number() OVER (ORDER BY mn, b) AS rk FROM m0),
        |lo AS (SELECT mn AS ci_lo FROM mm WHERE rk = 2),
        |hi AS (SELECT mn AS ci_hi FROM mm WHERE rk = 63),
        |pt AS (SELECT count(*) AS n_docs,
        |  CAST(sum(n_chars) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS mean_chars
        |  FROM documents)
        |SELECT pt.n_docs, pt.mean_chars, lo.ci_lo, hi.ci_hi,
        |  CAST(64 AS INTEGER) AS b_reps
        |FROM pt CROSS JOIN lo CROSS JOIN hi""".stripMargin,
    // endpoint-degree Pearson over directed near-dup edges: exact
    // integer moments (the q118 rule), one fixed-order double
    // expression, zero-variance guard to 0.0,
    "q146_assortativity" ->
      s"""WITH $minhashPairsCte,
         |e AS (SELECT doc_a AS src, doc_b AS dst FROM mh_pairs
         |      UNION ALL SELECT doc_b, doc_a FROM mh_pairs),
         |deg AS (SELECT src AS id, count(*) AS deg FROM e GROUP BY src),
         |ed AS (SELECT dx.deg AS dx, dy.deg AS dy FROM e
         |  JOIN deg dx ON dx.id = e.src JOIN deg dy ON dy.id = e.dst),
         |s AS (SELECT count(*) AS n,
         |  CAST(sum(dx) AS DOUBLE) AS sx, CAST(sum(dy) AS DOUBLE) AS sy,
         |  CAST(sum(dx * dy) AS DOUBLE) AS sxy,
         |  CAST(sum(dx * dx) AS DOUBLE) AS sxx,
         |  CAST(sum(dy * dy) AS DOUBLE) AS syy FROM ed)
         |SELECT CAST(CAST(n AS DOUBLE) / 2.0e0 AS BIGINT) AS n_edges,
         |  CASE WHEN CAST(n AS DOUBLE) * sxx - sx * sx > 0
         |        AND CAST(n AS DOUBLE) * syy - sy * sy > 0
         |    THEN (CAST(n AS DOUBLE) * sxy - sx * sy) /
         |      (sqrt(CAST(n AS DOUBLE) * sxx - sx * sx) *
         |       sqrt(CAST(n AS DOUBLE) * syy - sy * sy))
         |    ELSE 0.0 END AS assortativity
         |FROM s""".stripMargin,
    // q24's probe scan with the label filter before ranking: top-k
    // most-similar DIFFERENT-label candidates per probe,
    "q147_hard_negatives" ->
      s"""WITH el AS (SELECT vec_id, label, embedding,
         |  sqrt(list_reduce(list_transform(embedding,
         |    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (a, b) -> a + b)) AS nrm
         |  FROM embeddings),
         |pairs AS (SELECT p.vec_id AS probe_id, p.label AS probe_label,
         |    c.vec_id AS neighbor_id, c.label AS neg_label,
         |    ${dotSql("p.embedding", "c.embedding")} / (p.nrm * c.nrm) AS cos
         |  FROM el p JOIN el c ON p.vec_id < 10 AND p.label <> c.label),
         |r AS (SELECT *, row_number() OVER (PARTITION BY probe_id
         |  ORDER BY cos DESC, neighbor_id) AS rank FROM pairs)
         |SELECT probe_id, probe_label, neighbor_id, neg_label,
         |  cos AS cos_sim, CAST(rank AS INTEGER) AS rank
         |FROM r WHERE rank <= 5""".stripMargin,
    // index of dispersion from exact integer sums over containing
    // docs (zero cells cancel); minDf before the bounded cut,
    "q148_burstiness" ->
      """WITH tc AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token
        |  FROM documents),
        |c AS (SELECT doc_id, token, count(*) AS c FROM tc GROUP BY doc_id, token),
        |n AS (SELECT count(*) AS n_docs FROM documents),
        |s AS (SELECT token, count(*) AS df,
        |    CAST(sum(c) AS DOUBLE) AS sc, CAST(sum(c * c) AS DOUBLE) AS sc2
        |  FROM c GROUP BY token HAVING count(*) >= 5)
        |SELECT token, df, CAST(sc AS BIGINT) AS tf_total,
        |  (CAST(n_docs AS DOUBLE) * sc2 - sc * sc)
        |    / (CAST(n_docs AS DOUBLE) * sc) AS dispersion
        |FROM s, n ORDER BY dispersion DESC, token LIMIT 50""".stripMargin,
    // quadratic mirror of the union-window as-of: per purchase, the
    // max-(tus, t_id) strictly-earlier touch; ('none', -1, -1)
    // sentinel for untouched purchases,
    "q149_last_touch" ->
      s"""WITH $lastTouchCte
         |SELECT p.purchase_id, p.user_id, p.pus AS purchase_us,
         |  coalesce(j1.t_type, 'none') AS touch_type,
         |  CAST(coalesce(j1.t_id, -1) AS BIGINT) AS touch_event_id,
         |  CAST(coalesce(p.pus - j1.tus, -1) AS BIGINT) AS gap_us
         |FROM p LEFT JOIN j1 ON j1.purchase_id = p.purchase_id""".stripMargin,
    // q125's centroid folds -> per-vec argmax assignment -> integer
    // confusion sums; kappa = (N*A - B)/(N^2 - B), one divide,
    "q150_centroid_kappa" ->
      """WITH ex AS (SELECT label, vec_id,
        |  unnest(range(0, len(embedding))) AS dim,
        |  CAST(unnest(embedding) AS DOUBLE) AS v FROM embeddings),
        |cent AS (SELECT label AS label_c, dim,
        |  list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list(v ORDER BY vec_id)),
        |    (a, b) -> a + b) / count(*) AS m
        |  FROM ex GROUP BY label, dim),
        |cn AS (SELECT label_c, sqrt(list_reduce(
        |    list_prepend(CAST(0.0 AS DOUBLE), list(m * m ORDER BY dim)),
        |    (a, b) -> a + b)) AS nc
        |  FROM cent GROUP BY label_c),
        |vn AS (SELECT vec_id, sqrt(list_reduce(list_transform(embedding,
        |    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (a, b) -> a + b)) AS nv
        |  FROM embeddings),
        |d AS (SELECT ex.vec_id, ex.label AS label_true, c.label_c,
        |  list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list(ex.v * c.m ORDER BY ex.dim)),
        |    (a, b) -> a + b) AS dot
        |  FROM ex JOIN cent c ON c.dim = ex.dim
        |  GROUP BY ex.vec_id, ex.label, c.label_c),
        |a1 AS (SELECT d.vec_id, d.label_true, d.label_c,
        |    d.dot / (vn.nv * cn.nc) AS cos
        |  FROM d JOIN vn ON vn.vec_id = d.vec_id JOIN cn ON cn.label_c = d.label_c),
        |asg AS (SELECT vec_id, label_true, label_c AS assigned FROM
        |  (SELECT *, row_number() OVER (PARTITION BY vec_id
        |    ORDER BY cos DESC, label_c) AS rk FROM a1) z WHERE rk = 1),
        |conf AS (SELECT label_true, assigned, count(*) AS c FROM asg
        |  GROUP BY label_true, assigned),
        |ag AS (SELECT CAST(coalesce(sum(c), 0) AS BIGINT) AS a FROM conf
        |  WHERE label_true = assigned),
        |rk_ AS (SELECT label_true AS k, sum(c) AS rk FROM conf GROUP BY label_true),
        |ck_ AS (SELECT assigned AS k, sum(c) AS ck FROM conf GROUP BY assigned),
        |bb AS (SELECT CAST(coalesce(sum(coalesce(rk, 0) * coalesce(ck, 0)), 0) AS DOUBLE) AS b
        |  FROM rk_ FULL JOIN ck_ USING (k)),
        |nn AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM conf)
        |SELECT nn.n AS n_vecs, ag.a AS agree,
        |  CAST(ag.a AS DOUBLE) / CAST(nn.n AS DOUBLE) AS po,
        |  bb.b / (CAST(nn.n AS DOUBLE) * CAST(nn.n AS DOUBLE)) AS pe,
        |  CASE WHEN CAST(nn.n AS DOUBLE) * CAST(nn.n AS DOUBLE) - bb.b > 0
        |    THEN (CAST(nn.n AS DOUBLE) * CAST(ag.a AS DOUBLE) - bb.b) /
        |         (CAST(nn.n AS DOUBLE) * CAST(nn.n AS DOUBLE) - bb.b)
        |    ELSE 0.0 END AS kappa
        |FROM nn CROSS JOIN ag CROSS JOIN bb""".stripMargin,
    // q128's Bhattacharyya fold over the q63 split assignment: inner
    // join IS the statistic (missing tokens contribute exactly 0),
    "q151_split_affinity" ->
      """WITH b AS (SELECT text,
        |  ((strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 4096
        | + (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1) * 256
        | + (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 3, 1)) - 1) * 16
        | + (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 4, 1)) - 1)) % 100 AS bucket
        | FROM documents),
        |sp AS (SELECT CASE WHEN bucket < 80 THEN 'train'
        |    WHEN bucket < 90 THEN 'valid' ELSE 'test' END AS split,
        |  unnest(string_split(text, ' ')) AS token FROM b),
        |cs AS (SELECT split, token, count(*) AS c FROM sp GROUP BY split, token),
        |ts AS (SELECT split, sum(c) AS t FROM cs GROUP BY split),
        |w AS (SELECT cs.split, token,
        |    CAST(c AS DOUBLE) / CAST(t AS DOUBLE) AS p
        |  FROM cs JOIN ts ON ts.split = cs.split),
        |g AS (SELECT a.split AS split_a, b2.split AS split_b,
        |    count(*) AS n_shared_terms,
        |    list_reduce(list_prepend(0.0, list(sqrt(a.p * b2.p) ORDER BY a.token)),
        |      (x, y) -> x + y) AS bc_affinity
        |  FROM w a JOIN w b2 ON a.token = b2.token AND a.split < b2.split
        |  GROUP BY a.split, b2.split)
        |SELECT split_a, split_b, n_shared_terms, bc_affinity,
        |  sqrt(greatest(0.0, 1.0 - bc_affinity)) AS hellinger
        |FROM g""".stripMargin,
    // q71's exact integer offsets replayed with a plain global
    // window (quadratic-safe oracle mirror), then pure integer
    // crossing arithmetic and two final divides,
    "q152_packing_audit" ->
      """WITH d AS (SELECT doc_id, len(string_split(text, ' ')) AS n_tok
        |  FROM documents),
        |c AS (SELECT doc_id, n_tok, CAST(coalesce(sum(n_tok) OVER (ORDER BY doc_id
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum_before
        |  FROM d),
        |x AS (SELECT n_tok,
        |  (cum_before + n_tok - 1) // 2048 - cum_before // 2048 AS crossings
        |  FROM c),
        |s AS (SELECT count(*) AS n_docs,
        |  CAST(sum(n_tok) AS BIGINT) AS total_tokens,
        |  CAST(sum(CASE WHEN crossings > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_crossing_docs,
        |  CAST(sum(crossings) AS BIGINT) AS total_crossings FROM x)
        |SELECT n_docs, total_tokens,
        |  (total_tokens + 2047) // 2048 AS n_packs,
        |  n_crossing_docs, total_crossings,
        |  CAST(n_crossing_docs AS DOUBLE) / CAST(n_docs AS DOUBLE) AS crossing_rate,
        |  1.0e0 + CAST(total_crossings AS DOUBLE) / CAST(n_docs AS DOUBLE) AS mean_fragments
        |FROM s""".stripMargin,
    // top-21 order statistics, ln on integer-valued doubles (away
    // from the q128 near-1 ulp region), rank-ordered fold, one
    // divide; alpha guards the all-tied case,
    "q153_hill_tail" ->
      """WITH t AS (SELECT n_chars, doc_id FROM documents
        |  ORDER BY n_chars DESC, doc_id LIMIT 21),
        |r AS (SELECT n_chars, row_number() OVER
        |  (ORDER BY n_chars DESC, doc_id) AS rn FROM t),
        |k1 AS (SELECT n_chars AS x_k1 FROM r WHERE rn = 21),
        |h AS (SELECT list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |    list(ln(CAST(r.n_chars AS DOUBLE)) - ln(CAST(k1.x_k1 AS DOUBLE))
        |      ORDER BY r.rn)), (a, b) -> a + b) / 20.0e0 AS hill
        |  FROM r, k1 WHERE rn <= 20)
        |SELECT CAST(20 AS INTEGER) AS k, k1.x_k1, h.hill,
        |  CASE WHEN h.hill > 0 THEN 1.0e0 / h.hill ELSE 0.0 END AS alpha
        |FROM h, k1""".stripMargin,
    // q149's chain rolled up per channel with DECIMAL(18,2) money
    // sums and an exact integer gap mean over the attributed subset,
    "q155_channel_revenue" ->
      s"""WITH $lastTouchCte,
         |att AS (SELECT p.purchase_id,
         |    coalesce(j1.t_type, 'none') AS touch_type,
         |    CAST(coalesce(p.pus - j1.tus, -1) AS BIGINT) AS gap_us
         |  FROM p LEFT JOIN j1 ON j1.purchase_id = p.purchase_id),
         |v AS (SELECT event_id AS purchase_id,
         |  CAST(value AS DECIMAL(18,2)) AS v FROM events)
         |SELECT touch_type, count(*) AS n_conversions,
         |  CAST(sum(v.v) AS DOUBLE) AS revenue,
         |  CAST(sum(CASE WHEN gap_us >= 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_attributed,
         |  CASE WHEN sum(CASE WHEN gap_us >= 0 THEN 1 ELSE 0 END) > 0
         |    THEN CAST(sum(CASE WHEN gap_us >= 0 THEN gap_us ELSE 0 END) AS DOUBLE)
         |       / CAST(sum(CASE WHEN gap_us >= 0 THEN 1 ELSE 0 END) AS DOUBLE)
         |    ELSE 0.0 END AS mean_gap_us
         |FROM att JOIN v USING (purchase_id)
         |GROUP BY touch_type""".stripMargin,
    // fixed-community Newman modularity: e_cc, d_c, m exact integer
    // counts; per-source contribution one fixed divide/square/
    // subtract sequence, no cross-row double sum,
    "q156_modularity" ->
      s"""WITH $minhashPairsCte,
         |tg AS (SELECT p.doc_a, p.doc_b, sa.source AS src_a, sb.source AS src_b
         |  FROM mh_pairs p JOIN documents sa ON sa.doc_id = p.doc_a
         |  JOIN documents sb ON sb.doc_id = p.doc_b),
         |mm AS (SELECT count(*) AS m FROM tg),
         |ein AS (SELECT src_a AS source, count(*) AS e_in FROM tg
         |  WHERE src_a = src_b GROUP BY src_a),
         |en AS (SELECT doc_a AS id, src_a AS source FROM tg
         |       UNION ALL SELECT doc_b, src_b FROM tg),
         |dg AS (SELECT source, count(*) AS deg_sum,
         |  count(DISTINCT id) AS n_nodes FROM en GROUP BY source)
         |SELECT dg.source, dg.n_nodes,
         |  CAST(coalesce(ein.e_in, 0) AS BIGINT) AS e_in, dg.deg_sum,
         |  CAST(coalesce(ein.e_in, 0) AS DOUBLE) / CAST(mm.m AS DOUBLE)
         |  - (CAST(dg.deg_sum AS DOUBLE) / (2.0e0 * CAST(mm.m AS DOUBLE)))
         |    * (CAST(dg.deg_sum AS DOUBLE) / (2.0e0 * CAST(mm.m AS DOUBLE))) AS contrib
         |FROM dg LEFT JOIN ein ON ein.source = dg.source CROSS JOIN mm""".stripMargin,
    // the q21 signature chain once, then one bucket-count pass per
    // band width; join_pairs = sum s(s-1)/2 IS the band-join row
    // count at that width,
    "q157_band_curve" ->
      s"""WITH $minhashPairsCte,
         |${bandStatsCte(1)},
         |${bandStatsCte(2)},
         |${bandStatsCte(4)},
         |${bandStatsCte(8)}
         |SELECT * FROM st1 UNION ALL SELECT * FROM st2
         |UNION ALL SELECT * FROM st4 UNION ALL SELECT * FROM st8""".stripMargin,
    // Kish effective sample size from exact integer moment sums;
    // two divides at the end,
    "q158_ess" ->
      """WITH s AS (SELECT source, count(*) AS n_docs,
        |  CAST(sum(n_chars) AS DOUBLE) AS sw,
        |  CAST(sum(n_chars * n_chars) AS DOUBLE) AS sw2
        |  FROM documents GROUP BY source)
        |SELECT source, n_docs, CAST(sw AS BIGINT) AS total_chars,
        |  sw * sw / sw2 AS ess,
        |  sw * sw / sw2 / CAST(n_docs AS DOUBLE) AS ess_ratio
        |FROM s""".stripMargin,
    // gaps-and-islands: island id = running sum of integer change
    // flags over the (us, event_id) total order,
    "q159_run_lengths" ->
      """WITH e AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS us
        |  FROM events),
        |f AS (SELECT user_id, event_type, us, event_id,
        |  CASE WHEN lag(event_type) OVER w IS NULL
        |    OR lag(event_type) OVER w <> event_type THEN 1 ELSE 0 END AS chg
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
        |r AS (SELECT user_id, event_type,
        |  sum(chg) OVER (PARTITION BY user_id ORDER BY us, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run_id
        |  FROM f),
        |runs AS (SELECT user_id, run_id, event_type, count(*) AS len
        |  FROM r GROUP BY user_id, run_id, event_type)
        |SELECT event_type, count(*) AS n_runs,
        |  CAST(sum(len) AS BIGINT) AS total_events,
        |  CAST(max(len) AS BIGINT) AS max_run_len,
        |  CAST(sum(len) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS mean_run_len
        |FROM runs GROUP BY event_type""".stripMargin,
    // q129's transition counts -> row-normalized matrix -> 8 unrolled
    // v*P iterations, neighbor sums folded in prev order,
    "q160_stationary" ->
      s"""WITH e AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS us
         |  FROM events),
         |tr0 AS (SELECT event_type AS next,
         |  lag(event_type) OVER (PARTITION BY user_id ORDER BY us, event_id) AS prev
         |  FROM e),
         |c AS (SELECT prev, next, count(*) AS c FROM tr0
         |  WHERE prev IS NOT NULL GROUP BY prev, next),
         |t AS (SELECT prev, sum(c) AS t FROM c GROUP BY prev),
         |p AS (SELECT c.prev, c.next,
         |  CAST(c.c AS DOUBLE) / CAST(t.t AS DOUBLE) AS p
         |  FROM c JOIN t ON t.prev = c.prev),
         |kk AS (SELECT count(DISTINCT prev) AS k FROM p),
         |v0 AS (SELECT DISTINCT prev AS state,
         |  1.0e0 / CAST(k AS DOUBLE) AS prob FROM p, kk),
         |${statIterCte(1)},
         |${statIterCte(2)},
         |${statIterCte(3)},
         |${statIterCte(4)},
         |${statIterCte(5)},
         |${statIterCte(6)},
         |${statIterCte(7)},
         |${statIterCte(8)}
         |SELECT state AS event_type, prob AS stationary_prob FROM v8""".stripMargin,
    // binary Brier expanded to (p^2 n - 2pk + k)/n: exact-integer
    // counts, fixed-order double arithmetic, inner-join semantics,
    "q161_calibration" ->
      """WITH b AS (SELECT source, lang,
        |  ((strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 4096
        | + (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1) * 256
        | + (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 3, 1)) - 1) * 16
        | + (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 4, 1)) - 1)) % 100 AS bucket
        | FROM documents),
        |c AS (SELECT source,
        |  CASE WHEN bucket < 80 THEN 'train' WHEN bucket < 90 THEN 'valid'
        |       ELSE 'test' END AS split,
        |  count(*) AS n,
        |  CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS k
        |  FROM b GROUP BY source, 2),
        |tr AS (SELECT source, n AS train_n, k AS train_k FROM c WHERE split = 'train'),
        |te AS (SELECT source, n AS test_n, k AS test_k FROM c WHERE split = 'test'),
        |j AS (SELECT tr.source, train_n, test_n, train_k, test_k,
        |  CAST(train_k AS DOUBLE) / CAST(train_n AS DOUBLE) AS p
        |  FROM tr JOIN te ON te.source = tr.source
        |  WHERE train_n > 0 AND test_n > 0)
        |SELECT source, train_n, test_n, p AS p_train,
        |  CAST(test_k AS DOUBLE) / CAST(test_n AS DOUBLE) AS test_rate,
        |  (p * p * CAST(test_n AS DOUBLE) - 2.0e0 * p * CAST(test_k AS DOUBLE)
        |   + CAST(test_k AS DOUBLE)) / CAST(test_n AS DOUBLE) AS brier
        |FROM j""".stripMargin,
    // explicit decile formula ((rn-1)*10) div n + 1 (never engine
    // ntile), integer cums over the 10-row frame, single divides,
    "q162_gains" ->
      """WITH d AS (SELECT doc_id, n_chars,
        |  CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y FROM documents),
        |r AS (SELECT *, row_number() OVER (ORDER BY n_chars DESC, doc_id) AS rn,
        |  count(*) OVER () AS n FROM d),
        |dc AS (SELECT CAST(((rn - 1) * 10) // n + 1 AS INTEGER) AS decile,
        |  count(*) AS n_docs, CAST(sum(y) AS BIGINT) AS n_pos
        |  FROM r GROUP BY 1),
        |g AS (SELECT *, CAST(sum(n_docs) OVER w AS BIGINT) AS cum_docs,
        |  CAST(sum(n_pos) OVER w AS BIGINT) AS cum_pos,
        |  CAST(sum(n_docs) OVER () AS BIGINT) AS tot_docs,
        |  CAST(sum(n_pos) OVER () AS BIGINT) AS tot_pos
        |  FROM dc WINDOW w AS (ORDER BY decile
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        |SELECT decile, n_docs, n_pos, cum_docs, cum_pos,
        |  CAST(cum_pos AS DOUBLE) / CAST(tot_pos AS DOUBLE) AS capture_rate,
        |  (CAST(cum_pos AS DOUBLE) / CAST(cum_docs AS DOUBLE)) /
        |  (CAST(tot_pos AS DOUBLE) / CAST(tot_docs AS DOUBLE)) AS lift
        |FROM g""".stripMargin,
    // exact HUGEINT group sums, one divide per leave-one-out theta,
    // both cross-source reductions folded in source order,
    "q163_jackknife" ->
      """WITH cells AS (SELECT source, sum(n_chars) AS cj,
        |  sum(len(string_split(text, ' '))) AS tj
        |  FROM documents GROUP BY source),
        |tot AS (SELECT sum(cj) AS ct, sum(tj) AS tt, count(*) AS j FROM cells),
        |th AS (SELECT source, CAST(ct AS DOUBLE) AS ct, CAST(tt AS DOUBLE) AS tt, j,
        |  CAST(ct - cj AS DOUBLE) / CAST(tt - tj AS DOUBLE) AS theta_j
        |  FROM cells, tot),
        |bar AS (SELECT j, ct, tt, list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |    list(theta_j ORDER BY source)), (a, b) -> a + b)
        |    / CAST(j AS DOUBLE) AS theta_bar
        |  FROM th GROUP BY j, ct, tt),
        |ss AS (SELECT th.j, th.ct, th.tt, bar.theta_bar,
        |  list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |    list((theta_j - theta_bar) * (theta_j - theta_bar) ORDER BY source)),
        |    (a, b) -> a + b) AS ss
        |  FROM th, bar GROUP BY th.j, th.ct, th.tt, bar.theta_bar)
        |SELECT j AS n_sources, ct / tt AS theta, theta_bar,
        |  CAST(j - 1 AS DOUBLE) / CAST(j AS DOUBLE) * ss AS var_jack,
        |  sqrt(CAST(j - 1 AS DOUBLE) / CAST(j AS DOUBLE) * ss) AS se_jack
        |FROM ss""".stripMargin,
    // leading digit by string inspection of the scale-2 decimal (no
    // log10 in the comparison path); Benford rates stamped as the
    // identical literal doubles the plan uses,
    "q164_benford" -> {
      val bfCase = graft.operators.EventOps.benfordRates
        .map { case (d, p) => s"WHEN digit = '$d' THEN ${p}e0" }
        .mkString(" ")
      s"""WITH v AS (SELECT CAST(value AS DECIMAL(18,2)) AS v FROM events
         |  WHERE CAST(value AS DECIMAL(18,2)) > 0),
         |d AS (SELECT regexp_extract(CAST(v AS VARCHAR), '[1-9]', 0) AS digit
         |  FROM v),
         |c AS (SELECT digit, count(*) AS n_obs FROM d GROUP BY digit),
         |t AS (SELECT sum(n_obs) AS n FROM c)
         |SELECT digit, n_obs,
         |  CAST(n_obs AS DOUBLE) / CAST(n AS DOUBLE) AS obs_rate,
         |  CASE $bfCase END AS benford_rate,
         |  CAST(n_obs AS DOUBLE) / CAST(n AS DOUBLE) - CASE $bfCase END AS dev
         |FROM c, t""".stripMargin
    },
    // rank over all candidates, first same-label hit within top-20,
    // reciprocals folded in probe_id order, one divide per label,
    "q165_label_mrr" ->
      s"""WITH el AS (SELECT vec_id, label, embedding,
         |  sqrt(list_reduce(list_transform(embedding,
         |    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (a, b) -> a + b)) AS nrm
         |  FROM embeddings),
         |pairs AS (SELECT p.vec_id AS probe_id, p.label AS probe_label,
         |    c.vec_id AS neighbor_id, c.label AS n_label,
         |    ${dotSql("p.embedding", "c.embedding")} / (p.nrm * c.nrm) AS cos
         |  FROM el p JOIN el c ON p.vec_id < 50 AND p.vec_id <> c.vec_id),
         |r AS (SELECT *, row_number() OVER (PARTITION BY probe_id
         |  ORDER BY cos DESC, neighbor_id) AS rank FROM pairs),
         |fh AS (SELECT probe_id, min(rank) AS first_rank FROM r
         |  WHERE rank <= 20 AND n_label = probe_label GROUP BY probe_id),
         |pr AS (SELECT vec_id AS probe_id, label AS probe_label
         |  FROM embeddings WHERE vec_id < 50),
         |rr AS (SELECT pr.probe_id, pr.probe_label,
         |  CASE WHEN fh.first_rank IS NOT NULL
         |    THEN 1.0e0 / CAST(fh.first_rank AS DOUBLE) ELSE 0.0 END AS rr
         |  FROM pr LEFT JOIN fh ON fh.probe_id = pr.probe_id)
         |SELECT probe_label, count(*) AS n_probes,
         |  list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
         |    list(rr ORDER BY probe_id)), (a, b) -> a + b)
         |    / CAST(count(*) AS DOUBLE) AS mrr
         |FROM rr GROUP BY probe_label""".stripMargin,
    // the q72 fixpoint reduced to its size histogram; shares are
    // single divides over broadcast totals,
    "q166_cluster_sizes" ->
      s"""WITH RECURSIVE $closureCte,
         |sz AS (SELECT cluster_id, count(*) AS size FROM cc_labels
         |  GROUP BY cluster_id),
         |cells AS (SELECT size, count(*) AS n_clusters FROM sz GROUP BY size),
         |t AS (SELECT sum(size * n_clusters) AS ndt FROM cells)
         |SELECT size, n_clusters, size * n_clusters AS n_docs,
         |  CAST(size * n_clusters AS DOUBLE) / CAST(ndt AS DOUBLE) AS doc_share,
         |  (size - 1) * n_clusters AS n_removed
         |FROM cells, t""".stripMargin,
    // integer cumulative token weights over the (n_chars, doc_id)
    // order; quantile picks are integer comparisons, no division,
    "q167_weighted_quantiles" ->
      """WITH d AS (SELECT source, doc_id, n_chars,
        |  len(string_split(text, ' ')) AS tok FROM documents),
        |w AS (SELECT source, n_chars,
        |  CAST(sum(tok) OVER (PARTITION BY source ORDER BY n_chars, doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cumw,
        |  CAST(sum(tok) OVER (PARTITION BY source) AS BIGINT) AS tot
        |  FROM d)
        |SELECT source, count(*) AS n_docs, max(tot) AS total_tokens,
        |  min(CASE WHEN 2 * cumw >= tot THEN n_chars END) AS w_median_chars,
        |  min(CASE WHEN 10 * cumw >= 9 * tot THEN n_chars END) AS w_p90_chars
        |FROM w GROUP BY source""".stripMargin,
    // exact-value grouping (the double is compared, never summed);
    // two-level keyed counts, one divide,
    "q168_event_dups" ->
      """WITH g AS (SELECT user_id, epoch_us(ts) AS us, event_type, value,
        |  count(*) AS c FROM events GROUP BY user_id, us, event_type, value)
        |SELECT event_type, CAST(sum(c) AS BIGINT) AS n_events,
        |  count(*) AS n_distinct,
        |  CAST(sum(c - 1) AS BIGINT) AS n_dup_events,
        |  CAST(sum(c - 1) AS DOUBLE) / CAST(sum(c) AS DOUBLE) AS dup_rate
        |FROM g GROUP BY event_type""".stripMargin,
    // doubled midranks (2·rank + peers − 1, exact integers) so tied
    // runs carry their average rank without leaving the integer
    // domain; Pearson-on-ranks with the q118 integer-moment rule and
    // the identical fixed-order final formula,
    "q169_spearman" ->
      s"""WITH d AS (SELECT source, n_chars AS x,
         |  CAST(floor(($qualitySql) * 1000000.0 + 0.5) AS BIGINT) AS y
         |  FROM documents),
         |r AS (SELECT source,
         |  2 * rank() OVER (PARTITION BY source ORDER BY x)
         |    + count(*) OVER (PARTITION BY source, x) - 1 AS rx2,
         |  2 * rank() OVER (PARTITION BY source ORDER BY y)
         |    + count(*) OVER (PARTITION BY source, y) - 1 AS ry2
         |  FROM d),
         |s AS (SELECT source, count(*) AS n_docs,
         |  CAST(sum(rx2) AS DOUBLE) AS sx, CAST(sum(ry2) AS DOUBLE) AS sy,
         |  CAST(sum(rx2 * ry2) AS DOUBLE) AS sxy,
         |  CAST(sum(rx2 * rx2) AS DOUBLE) AS sxx,
         |  CAST(sum(ry2 * ry2) AS DOUBLE) AS syy
         |  FROM r GROUP BY source)
         |SELECT source, n_docs,
         |  (n_docs * sxy - sx * sy) /
         |  (sqrt(n_docs * sxx - sx * sx) * sqrt(n_docs * syy - sy * sy)) AS spearman_rho
         |FROM s""".stripMargin,
    // support/confidence/lift as one-divide ratios of exact basket
    // counts, lift written as confidence/(n_b/U) in the same order,
    "q185_assoc_rules" ->
      """WITH dt AS (SELECT DISTINCT user_id, event_type FROM events),
        |u AS (SELECT count(DISTINCT user_id) AS u FROM dt),
        |marg AS (SELECT event_type, count(*) AS n_t FROM dt GROUP BY event_type),
        |pairs AS (SELECT a.event_type AS antecedent, b.event_type AS consequent,
        |    count(*) AS n_both
        |  FROM dt a JOIN dt b ON a.user_id = b.user_id
        |    AND a.event_type <> b.event_type
        |  GROUP BY 1, 2)
        |SELECT antecedent, consequent, n_both,
        |  ma.n_t AS n_a, mb.n_t AS n_b,
        |  CAST(n_both AS DOUBLE) / CAST(u AS DOUBLE) AS support,
        |  CAST(n_both AS DOUBLE) / CAST(ma.n_t AS DOUBLE) AS confidence,
        |  (CAST(n_both AS DOUBLE) / CAST(ma.n_t AS DOUBLE))
        |    / (CAST(mb.n_t AS DOUBLE) / CAST(u AS DOUBLE)) AS lift
        |FROM pairs JOIN marg ma ON ma.event_type = antecedent
        |JOIN marg mb ON mb.event_type = consequent, u""".stripMargin,
    // the recursion folds the ordered prefix with the head as seed —
    // DuckDB list_reduce's implicit-init semantics, mirrored by the
    // Spark aggregate over the tail; only mult/add in the lambda,
    "q186_ewma" ->
      """WITH d AS (SELECT epoch_ms(ts) // 86400000 AS day, count(*) AS c
        |  FROM events GROUP BY 1),
        |b AS (SELECT min(day) AS d0, max(day) AS d1 FROM d),
        |cal AS (SELECT unnest(range(d0, d1 + 1)) AS day FROM b),
        |z AS (SELECT cal.day AS day, coalesce(d.c, 0) AS c
        |  FROM cal LEFT JOIN d ON d.day = cal.day),
        |arr AS (SELECT list(struct_pack(day := day, c := c) ORDER BY day) AS arr
        |  FROM z),
        |p AS (SELECT unnest(arr) AS e,
        |  unnest(generate_series(1, len(arr))) AS pos, arr FROM arr),
        |s AS (SELECT e.day AS day, e.c AS c,
        |  list_reduce(list_transform(arr[1:pos], x -> CAST(x.c AS DOUBLE)),
        |    (acc, x) -> 0.2 * x + (1.0 - 0.2) * acc) AS ewma
        |  FROM p)
        |SELECT day, c, ewma, CAST(c AS DOUBLE) - ewma AS residual FROM s""".stripMargin,
    // every probability is a ratio of exact integer counts; the
    // per-(doc, lang) log-likelihood folds in document order from a
    // 0.0 seed (q84's pinning); argmax tie-breaks (joint DESC, lang),
    "q187_naive_bayes" ->
      """WITH b AS (SELECT doc_id, lang, text,
        |  ((strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 4096
        | + (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1) * 256
        | + (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 3, 1)) - 1) * 16
        | + (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 4, 1)) - 1)) % 100 AS bucket
        | FROM documents),
        |tr AS (SELECT lang, text FROM b WHERE bucket < 80),
        |trtok AS (SELECT lang, unnest(string_split(text, ' ')) AS token FROM tr),
        |m AS (SELECT lang, token, count(*) AS ctl FROM trtok GROUP BY 1, 2),
        |cl AS (SELECT lang, sum(ctl) AS cl FROM m GROUP BY 1),
        |v AS (SELECT count(DISTINCT token) AS v FROM m),
        |pri AS (SELECT lang, count(*) AS nl FROM tr GROUP BY 1),
        |n AS (SELECT sum(nl) AS n FROM pri),
        |te AS (SELECT doc_id, lang AS true_lang, string_split(text, ' ') AS w
        |  FROM b WHERE bucket >= 90),
        |tok AS (SELECT doc_id, true_lang, unnest(range(0, len(w))) AS pos,
        |  unnest(w) AS token FROM te),
        |sc AS (SELECT t.doc_id, t.true_lang, t.pos, c.lang,
        |  ln(CAST(coalesce(x.ctl, 0) + 1 AS DOUBLE) / CAST(c.cl + v.v AS DOUBLE)) AS logp
        |  FROM tok t CROSS JOIN cl c CROSS JOIN v
        |  LEFT JOIN m x ON x.lang = c.lang AND x.token = t.token),
        |g AS (SELECT doc_id, true_lang, lang, count(*) AS n_tokens,
        |  list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list(logp ORDER BY pos)),
        |    (a, x) -> a + x) AS total_logp
        |  FROM sc GROUP BY 1, 2, 3),
        |j AS (SELECT g.doc_id, g.true_lang, g.lang, g.n_tokens,
        |  g.total_logp + ln(CAST(p.nl AS DOUBLE) / CAST(n.n AS DOUBLE)) AS joint
        |  FROM g JOIN pri p ON p.lang = g.lang CROSS JOIN n),
        |r AS (SELECT *, row_number() OVER (PARTITION BY doc_id
        |  ORDER BY joint DESC, lang) AS rk FROM j)
        |SELECT doc_id, true_lang, lang AS predicted, n_tokens, joint AS log_joint,
        |  CASE WHEN lang = true_lang THEN 1 ELSE 0 END AS is_correct
        |FROM r WHERE rk = 1""".stripMargin,
    // q173's deferred-divide centering on both series: the N² factors
    // cancel, numerator/denominators are HUGEINT-exact, and per lag
    // the only floating steps are two sqrts, one multiply, one divide,
    "q189_ccf" ->
      """WITH e AS (SELECT event_type, epoch_ms(ts) // 86400000 AS day FROM events
        |  WHERE event_type IN ('view', 'purchase')),
        |b AS (SELECT min(day) AS d0, max(day) AS d1 FROM e),
        |cal AS (SELECT unnest(range(d0, d1 + 1)) AS day FROM b),
        |cx AS (SELECT day, count(*) AS c FROM e WHERE event_type = 'view' GROUP BY 1),
        |cy AS (SELECT day, count(*) AS c FROM e WHERE event_type = 'purchase' GROUP BY 1),
        |sx AS (SELECT cal.day AS day, coalesce(cx.c, 0) AS c
        |  FROM cal LEFT JOIN cx ON cx.day = cal.day),
        |sy AS (SELECT cal.day AS day, coalesce(cy.c, 0) AS c
        |  FROM cal LEFT JOIN cy ON cy.day = cal.day),
        |tx AS (SELECT count(*) AS n, sum(c) AS s FROM sx),
        |ty AS (SELECT count(*) AS n, sum(c) AS s FROM sy),
        |x AS (SELECT day, CAST(tx.n AS HUGEINT) * c - CAST(tx.s AS HUGEINT) AS v
        |  FROM sx, tx),
        |y AS (SELECT day, CAST(ty.n AS HUGEINT) * c - CAST(ty.s AS HUGEINT) AS v
        |  FROM sy, ty),
        |dx AS (SELECT sum(v * v) AS dx FROM x),
        |dy AS (SELECT sum(v * v) AS dy, count(*) AS n_days FROM y),
        |lags AS (SELECT unnest(range(-7, 8)) AS lag),
        |num AS (SELECT lag, sum(x.v * y.v) AS num
        |  FROM x CROSS JOIN lags JOIN y ON y.day = x.day + lag
        |  GROUP BY lag)
        |SELECT lag, n_days, CAST(num AS DOUBLE)
        |  / (sqrt(CAST(dx AS DOUBLE)) * sqrt(CAST(dy AS DOUBLE))) AS ccf
        |FROM num, dx, dy""".stripMargin,
    // each slope is one divide of exact integer differences; the
    // median is picked explicitly by rank (no engine median()),
    // and the even-count mean is one add+divide of two doubles,
    "q190_theil_sen" ->
      """WITH d AS (SELECT epoch_ms(ts) // 86400000 AS day, count(*) AS c
        |  FROM events GROUP BY 1),
        |b AS (SELECT min(day) AS d0, max(day) AS d1 FROM d),
        |cal AS (SELECT unnest(range(d0, d1 + 1)) AS day FROM b),
        |z AS (SELECT cal.day AS day, coalesce(d.c, 0) AS c
        |  FROM cal LEFT JOIN d ON d.day = cal.day),
        |nd AS (SELECT count(*) AS n_days FROM z),
        |p AS (SELECT CAST(bb.c - aa.c AS DOUBLE) / CAST(bb.day - aa.day AS DOUBLE) AS slope
        |  FROM z aa JOIN z bb ON bb.day > aa.day),
        |np AS (SELECT count(*) AS n_pairs FROM p),
        |r AS (SELECT slope, row_number() OVER (ORDER BY slope) AS rn FROM p),
        |mid AS (SELECT r.slope FROM r, np
        |  WHERE (n_pairs % 2 = 1 AND rn = (n_pairs + 1) // 2)
        |     OR (n_pairs % 2 = 0 AND (rn = n_pairs // 2 OR rn = n_pairs // 2 + 1))),
        |m AS (SELECT sum(slope) AS s, count(*) AS c FROM mid)
        |SELECT n_days, n_pairs, m.s / CAST(m.c AS DOUBLE) AS sen_slope
        |FROM nd, np, m""".stripMargin,
    // q100's decimal-revenue rule with the Q7 disjunctive nation pair;
    // the ship-year is integer extraction,
    "q191_tpch_q7" ->
      """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |  year(l_shipdate) AS l_year,
        |  CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
        |  count(*) AS n_items
        |FROM lineitem
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation n1 ON s_nationkey = n1.n_nationkey
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation n2 ON c_nationkey = n2.n_nationkey
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1998-01-01'
        |  AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        |    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        |GROUP BY 1, 2, 3""".stripMargin,
    // α = 0.5 keeps every smoothed term exactly representable; the
    // δ and σ² chains run in ONE fixed operation order (two lns, one
    // subtract, two divides, one add, one sqrt), mirrored verbatim,
    "q192_log_odds" ->
      """WITH st AS (SELECT source, unnest(string_split(text, ' ')) AS token
        |  FROM documents),
        |c AS (SELECT source, token, count(*) AS y FROM st GROUP BY 1, 2),
        |tot AS (SELECT token, sum(y) AS yt FROM c GROUP BY 1),
        |ns AS (SELECT source, sum(y) AS ns FROM c GROUP BY 1),
        |nn AS (SELECT sum(y) AS n FROM c),
        |v AS (SELECT count(*) AS v FROM tot),
        |sc AS (SELECT c.source, c.token, c.y, tot.yt - c.y AS yr,
        |    ns.ns AS ns, nn.n - ns.ns AS nr
        |  FROM c JOIN tot USING (token) JOIN ns USING (source) CROSS JOIN nn
        |  WHERE c.y >= 5),
        |z AS (SELECT source, token, y,
        |  (ln((y + 0.5) / (ns + 0.5 * v - y - 0.5))
        |    - ln((yr + 0.5) / (nr + 0.5 * v - yr - 0.5)))
        |   / sqrt(1.0 / (y + 0.5) + 1.0 / (yr + 0.5)) AS z
        |  FROM sc CROSS JOIN v),
        |r AS (SELECT *, row_number() OVER (PARTITION BY source
        |  ORDER BY z DESC, token) AS rank FROM z)
        |SELECT source, rank, token, y AS y_source, z FROM r WHERE rank <= 10""".stripMargin,
    // q186's rule for floating recursions: both engines replay the
    // SAME scalar recursion with coefficients written as 1.0 - a (a
    // pre-simplified literal can differ in the last ulp) and the level
    // update duplicated in the trend line on BOTH sides.  The DuckDB
    // side is a RECURSIVE CTE, not a list_reduce: DuckDB 1.0's
    // list_reduce with a STRUCT accumulator mis-evaluates the lambda
    // (two fields holding the identical expression come back with
    // different values — reproduced on [364,339,333]); plain scalar
    // recursion evaluates correctly and bit-matches Spark's aggregate(),
    "q193_holt" ->
      """WITH RECURSIVE d AS (SELECT epoch_ms(ts) // 86400000 AS day, count(*) AS c
        |  FROM events GROUP BY 1),
        |b AS (SELECT min(day) AS d0, max(day) AS d1 FROM d),
        |cal AS (SELECT unnest(range(d0, d1 + 1)) AS day FROM b),
        |z AS (SELECT cal.day AS day, coalesce(d.c, 0) AS c
        |  FROM cal LEFT JOIN d ON d.day = cal.day),
        |va AS (SELECT list(day ORDER BY day) AS days,
        |  list(c ORDER BY day) AS cs,
        |  list(CAST(c AS DOUBLE) ORDER BY day) AS vals FROM z),
        |it(t, l, tr) AS (
        |  SELECT 1, vals[1], vals[2] - vals[1] FROM va
        |  UNION ALL
        |  SELECT t + 1,
        |    0.2 * vals[t + 1] + (1.0 - 0.2) * (l + tr),
        |    0.1 * (0.2 * vals[t + 1] + (1.0 - 0.2) * (l + tr) - l)
        |      + (1.0 - 0.1) * tr
        |  FROM it, va WHERE t < len(vals)),
        |s AS (SELECT cur.t AS t, prev.l AS pl, prev.tr AS pb,
        |    cur.l AS cl, cur.tr AS cb
        |  FROM it cur JOIN it prev ON prev.t = cur.t - 1)
        |SELECT days[t] AS day, cs[t] AS c, cl AS level, cb AS trend,
        |  pl + pb AS forecast,
        |  CAST(cs[t] AS DOUBLE) - (pl + pb) AS residual
        |FROM s, va""".stripMargin,
    // N_r, N, N1 are exact integers; r* is one cast-multiply-divide
    // chain and p0 a single divide; rows keep r <= 20 with N_{r+1}>0.
    // Counts are BIGRAM counts (q83's table) — the fixture vocabulary
    // is ~31 tokens so the unigram spectrum has no low-r mass at all,
    "q194_good_turing" ->
      """WITH w AS (SELECT string_split(text, ' ') AS w FROM documents),
        |tok AS (SELECT unnest([array_to_string(w[i:i+1], ' ') FOR i IN range(1, len(w))]) AS token
        |  FROM w WHERE len(w) >= 2),
        |c AS (SELECT token, count(*) AS r FROM tok GROUP BY 1),
        |fof AS (SELECT r, count(*) AS n_r FROM c GROUP BY 1),
        |nt AS (SELECT sum(r) AS n FROM c),
        |n1 AS (SELECT coalesce(sum(CASE WHEN r = 1 THEN n_r END), 0) AS n_1 FROM fof),
        |nx AS (SELECT r - 1 AS r, n_r AS n_r1 FROM fof)
        |SELECT fof.r, fof.n_r, nx.n_r1,
        |  CAST(fof.r + 1 AS DOUBLE) * CAST(nx.n_r1 AS DOUBLE)
        |    / CAST(fof.n_r AS DOUBLE) AS r_star,
        |  CAST(n_1 AS DOUBLE) / CAST(n AS DOUBLE) AS p_unseen
        |FROM fof JOIN nx USING (r), nt, n1
        |WHERE fof.r <= 20""".stripMargin,
    // Q8's share: exact DECIMAL(18,4) sums on both sides, the divide
    // on doubles after both sums — never a decimal/decimal divide
    // (engines round those differently),
    "q195_tpch_q8" ->
      """SELECT year(o_orderdate) AS o_year,
        |  CAST(sum(CASE WHEN sn.n_name = 'NATION_1'
        |        THEN CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4)) END) AS DOUBLE)
        |    / CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE)
        |    AS mkt_share,
        |  CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE)
        |    AS total_volume,
        |  count(*) AS n_items
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey AND p_type = 'ECONOMY'
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation cn ON c_nationkey = cn.n_nationkey
        |JOIN region ON cn.n_regionkey = r_regionkey AND r_name = 'ASIA'
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation sn ON s_nationkey = sn.n_nationkey
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1998-01-01'
        |GROUP BY 1""".stripMargin,
    // Q10 top-20: revenue DESC with c_custkey tie-break makes the
    // LIMIT deterministic on both engines,
    "q196_tpch_q10" ->
      """SELECT c_custkey, c_name, n_name, c_acctbal,
        |  CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE)
        |    AS revenue,
        |  count(*) AS n_items
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE l_returnflag = 'R'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1996-07-01'
        |GROUP BY c_custkey, c_name, n_name, c_acctbal
        |ORDER BY revenue DESC, c_custkey
        |LIMIT 20""".stripMargin,
    // Q13: integer counts only — no float anywhere; the k=0 bin
    // comes from customers missing in the filtered orders frame,
    "q197_tpch_q13" ->
      """WITH pc AS (SELECT o_custkey, count(*) AS c_count FROM orders
        |  WHERE o_orderpriority IN ('1-URGENT', '2-HIGH') GROUP BY 1)
        |SELECT coalesce(pc.c_count, 0) AS c_count, count(*) AS custdist
        |FROM customer LEFT JOIN pc ON c_custkey = o_custkey
        |GROUP BY 1
        |ORDER BY custdist DESC, c_count DESC""".stripMargin,
    // Q14: numerator/denominator as exact DECIMAL sums; the single
    // 100*x/y divide on doubles after both,
    "q198_tpch_q14" ->
      """SELECT
        |  100.0 * CAST(sum(CASE WHEN p_type = 'PROMO'
        |      THEN CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4)) END) AS DOUBLE)
        |    / CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE)
        |    AS promo_pct,
        |  CAST(sum(CASE WHEN p_type = 'PROMO'
        |      THEN CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4)) END) AS DOUBLE)
        |    AS promo_revenue,
        |  CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE)
        |    AS total_revenue,
        |  count(*) AS n_items
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE l_shipdate >= TIMESTAMP '1996-03-01'
        |  AND l_shipdate < TIMESTAMP '1996-04-01'""".stripMargin,
    // Q3: revenue is the house exact-DECIMAL sum; l_orderkey
    // tie-breaks the top-10,
    "q199_tpch_q3" ->
      """SELECT l_orderkey, o_orderdate,
        |  CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE)
        |    AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1997-01-01'
        |  AND l_shipdate > TIMESTAMP '1997-01-01'
        |GROUP BY l_orderkey, o_orderdate
        |ORDER BY revenue DESC, l_orderkey
        |LIMIT 10""".stripMargin,
    // Q18: quantities are integral doubles, so the sum is exact in
    // any order and the BIGINT cast is lossless on both engines
  )
}
