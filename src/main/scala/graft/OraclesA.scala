package graft

/** Oracle-SQL registry slice A (q01…q72, 91 entries) —
  * split out of SparkEntry so the per-batch oracle constants stop
  * being a single merge hot-spot (r14 verdict #4).  Pure data: the
  * assembled map is `SparkEntry.oracleSql`; the determinism rules
  * live in SparkEntry's scaladoc and every entry still pairs 1:1
  * with a `queries` entry of the same name.
  */
private[graft] trait OraclesA extends OracleHelpers {

  protected def oraclesA: Map[String, String] = Map(
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_qty,
        |  CAST(sum(CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) / count(*) AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "q02_join_broadcast" ->
      """SELECT p_brand,
        |  CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
        |  count(*) AS n_items
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY p_brand""".stripMargin,
    "q03_join_multi" ->
      """SELECT r_name, n_name,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_revenue,
        |  count(*) AS n_orders
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name""".stripMargin,
    "q04_topk_orders" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10""".stripMargin,
    "q05_anti_join" ->
      """SELECT c_custkey, c_name FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o
        |  WHERE o.o_custkey = c.c_custkey AND o.o_orderdate >= TIMESTAMP '1998-01-01')""".stripMargin,
    "q06_semi_join" ->
      """SELECT p_partkey, p_name, p_brand FROM part p
        |WHERE EXISTS (SELECT 1 FROM lineitem l
        |  WHERE l.l_partkey = p.p_partkey AND l.l_quantity > 45)""".stripMargin,
    "q07_set_except" ->
      """SELECT DISTINCT c_nationkey AS nationkey FROM customer WHERE c_acctbal < 0
        |EXCEPT
        |SELECT DISTINCT s_nationkey AS nationkey FROM supplier WHERE s_acctbal < 0""".stripMargin,
    "q08_orders_by_month" ->
      """SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m') AS order_month,
        |  count(*) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS month_revenue
        |FROM orders GROUP BY 1""".stripMargin,
    "q09_event_type_stats" ->
      """SELECT event_type, count(*) AS n_events,
        |  count(DISTINCT user_id) AS n_users,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM events GROUP BY event_type""".stripMargin,
    "q10_window_latest" ->
      """SELECT user_id, event_id, event_type, value FROM (
        |  SELECT user_id, event_id, event_type, value,
        |    row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events) t
        |WHERE rn = 1""".stripMargin,
    "q11_window_gaps" ->
      """WITH g AS (
        |  SELECT user_id,
        |    epoch_ms(ts) - lag(epoch_ms(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_ms
        |  FROM events)
        |SELECT user_id, count(*) AS n_gaps,
        |  CAST(sum(gap_ms) AS DOUBLE) / count(*) AS avg_gap_ms,
        |  CAST(max(gap_ms) AS BIGINT) AS max_gap_ms
        |FROM g WHERE gap_ms IS NOT NULL GROUP BY user_id""".stripMargin,
    "q12_sessionize" ->
      """WITH e AS (
        |  SELECT user_id, event_id, ts, value, epoch_ms(ts) AS ms,
        |    lag(epoch_ms(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ms
        |  FROM events),
        |f AS (SELECT *, CASE WHEN prev_ms IS NULL OR ms - prev_ms > 1800000
        |  THEN 1 ELSE 0 END AS new_session FROM e),
        |s AS (SELECT *, sum(new_session) OVER (PARTITION BY user_id
        |  ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS session_idx FROM f)
        |SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx, count(*) AS n_events,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS session_value
        |FROM s GROUP BY user_id, session_idx""".stripMargin,
    "q13_json_props" ->
      """SELECT event_type, count(k) AS n_with_k,
        |  CAST(sum(k) AS BIGINT) AS sum_k, max(k) AS max_k
        |FROM (SELECT event_type,
        |  CAST(NULLIF(regexp_extract(props, '"k":\s*(-?\d+)', 1), '') AS INTEGER) AS k
        |  FROM events) t
        |GROUP BY event_type""".stripMargin,
    "q14_hourly_buckets" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H') AS hour_bucket, event_type,
        |  count(*) AS n_events,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS bucket_value
        |FROM events GROUP BY 1, 2""".stripMargin,
    "q15_flatten_props" ->
      """SELECT event_id, 'k_i' AS "key",
        |  NULLIF(regexp_extract(props, '"k":\s*(-?\d+)', 1), '') AS "value"
        |FROM events
        |WHERE NULLIF(regexp_extract(props, '"k":\s*(-?\d+)', 1), '') IS NOT NULL""".stripMargin,
    "q40_running_total" ->
      """SELECT user_id, event_id,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) OVER (PARTITION BY user_id
        |    ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS running_value
        |FROM events""".stripMargin,
    "q16_reindex_scan" ->
      """SELECT CAST(doc_id AS VARCHAR) AS id, CAST(doc_id AS VARCHAR) AS txn_id,
        |  source AS owner, text AS content
        |FROM documents WHERE CAST(doc_id AS VARCHAR) >= '25'""".stripMargin,
    "q17_reindex_chunks" ->
      """WITH s AS (SELECT CAST(doc_id AS VARCHAR) AS id, source AS owner FROM documents)
        |SELECT id, owner,
        |  CAST((row_number() OVER (ORDER BY id) - 1) // 20 AS BIGINT) AS chunk
        |FROM s""".stripMargin,
    "q18_enrich_broadcast" ->
      """SELECT doc_id, source, source_docs, source_max_chars FROM documents
        |JOIN (SELECT source, count(*) AS source_docs, max(n_chars) AS source_max_chars
        |      FROM documents GROUP BY source) s USING (source)""".stripMargin,
    "q19_dedup_exact" ->
      """SELECT md5(text) AS text_hash, min(doc_id) AS keeper_id, count(*) AS n_copies
        |FROM documents GROUP BY md5(text)""".stripMargin,
    "q20_dedup_fingerprint" ->
      """SELECT md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' ')) AS fp,
        |  min(doc_id) AS keeper_id, count(*) AS n_docs
        |FROM documents GROUP BY 1""".stripMargin,
    "q21_dedup_minhash" ->
      s"""WITH $minhashPairsCte
         |SELECT doc_a, doc_b FROM mh_pairs""".stripMargin,
    "q22_ngram_jaccard" ->
      s"""WITH $shingleCte,
         |sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
         |inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
         |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2)
         |SELECT doc_a, doc_b,
         |  CAST(inter AS DOUBLE) / CAST(sa.n + sb.n - inter AS DOUBLE) AS jaccard
         |FROM inter JOIN sz sa ON sa.doc_id = doc_a JOIN sz sb ON sb.doc_id = doc_b
         |WHERE CAST(inter AS DOUBLE) / CAST(sa.n + sb.n - inter AS DOUBLE) >= 0.8""".stripMargin,
    "q45_jaccard_capped" ->
      s"""WITH $shingleCte,
         |rare AS (SELECT shingle FROM (SELECT shingle, count(*) AS df FROM sh GROUP BY 1) t WHERE df <= 8),
         |shc AS (SELECT doc_id, sh.shingle FROM sh JOIN rare USING (shingle)),
         |sz AS (SELECT doc_id, count(*) AS n FROM shc GROUP BY doc_id),
         |inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
         |  FROM shc a JOIN shc b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2)
         |SELECT doc_a, doc_b,
         |  CAST(inter AS DOUBLE) / CAST(sa.n + sb.n - inter AS DOUBLE) AS jaccard
         |FROM inter JOIN sz sa ON sa.doc_id = doc_a JOIN sz sb ON sb.doc_id = doc_b
         |WHERE CAST(inter AS DOUBLE) / CAST(sa.n + sb.n - inter AS DOUBLE) >= 0.5""".stripMargin,
    "q23_simhash" ->
      """WITH wrd AS (SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS word FROM documents),
        |bits AS (
        |  SELECT doc_id, b,
        |    CASE WHEN 2 * sum(((strpos('0123456789abcdef', substr(md5(word), CAST(b // 4 AS INTEGER) + 1, 1)) - 1)
        |      // (CASE WHEN b % 4 = 0 THEN 8 WHEN b % 4 = 1 THEN 4 WHEN b % 4 = 2 THEN 2 ELSE 1 END)) % 2)
        |      >= count(*) THEN 1 ELSE 0 END AS maj
        |  FROM wrd CROSS JOIN (SELECT unnest(range(0, 16)) AS b) bb
        |  GROUP BY doc_id, b)
        |SELECT doc_id, CAST(sum(maj * CAST(power(2, b) AS BIGINT)) AS BIGINT) AS simhash
        |FROM bits GROUP BY doc_id""".stripMargin,
    "q44_winnowing" ->
      """WITH h AS (SELECT doc_id,
        |  [list_reduce(list_transform(range(i, i+8), j -> CAST(ascii(substr(text, j, 1)) AS BIGINT)),
        |               (a, b) -> (a * 31 + b) % 4294967296) FOR i IN range(1, length(text) - 6)] AS hs
        |  FROM documents WHERE length(text) >= 8),
        |fp AS (SELECT DISTINCT doc_id,
        |         unnest([list_aggregate(hs[j:j+3], 'min') FOR j IN range(1, len(hs) - 2)]) AS fp
        |       FROM h WHERE len(hs) >= 4),
        |rare AS (SELECT fp FROM (SELECT fp, count(*) AS df FROM fp GROUP BY 1) t WHERE df <= 5),
        |fpr AS (SELECT doc_id, fp.fp FROM fp JOIN rare USING (fp)),
        |pairs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS shared
        |          FROM fpr a JOIN fpr b ON a.fp = b.fp AND a.doc_id < b.doc_id GROUP BY 1, 2)
        |SELECT doc_a, doc_b, shared FROM pairs WHERE shared >= 10""".stripMargin,
    "q24_topk_cosine" ->
      s"""WITH $normCte,
         |pairs AS (
         |  SELECT p.vec_id AS probe_id, c.vec_id AS neighbor_id,
         |    ${dotSql("p.embedding", "c.embedding")} / (p.nrm * c.nrm) AS cos
         |  FROM e p JOIN e c ON p.vec_id < 3 AND p.vec_id <> c.vec_id),
         |r AS (SELECT *, row_number() OVER (PARTITION BY probe_id
         |  ORDER BY cos DESC, neighbor_id) AS rank FROM pairs)
         |SELECT probe_id, neighbor_id, cos AS cos_sim, CAST(rank AS INTEGER) AS rank
         |FROM r WHERE rank <= 5""".stripMargin,
    "q25_embed_neardup" -> thresholdPairsSql,
    "q26_ann_bucketed" ->
      s"""WITH $normCte,
         |eb AS (SELECT *,
         |  (CASE WHEN embedding[1] > 0 THEN 1 ELSE 0 END
         | + CASE WHEN embedding[2] > 0 THEN 2 ELSE 0 END
         | + CASE WHEN embedding[3] > 0 THEN 4 ELSE 0 END
         | + CASE WHEN embedding[4] > 0 THEN 8 ELSE 0 END
         | + CASE WHEN embedding[5] > 0 THEN 16 ELSE 0 END
         | + CASE WHEN embedding[6] > 0 THEN 32 ELSE 0 END) AS bucket FROM e),
         |pairs AS (
         |  SELECT p.vec_id AS probe_id, c.vec_id AS neighbor_id,
         |    ${dotSql("p.embedding", "c.embedding")} / (p.nrm * c.nrm) AS cos
         |  FROM eb p JOIN eb c ON p.bucket = c.bucket AND p.vec_id < 10 AND p.vec_id <> c.vec_id),
         |r AS (SELECT *, row_number() OVER (PARTITION BY probe_id
         |  ORDER BY cos DESC, neighbor_id) AS rank FROM pairs)
         |SELECT probe_id, neighbor_id, cos AS cos_sim, CAST(rank AS INTEGER) AS rank
         |FROM r WHERE rank <= 3""".stripMargin,
    "q37_topk_aggregator" ->
      s"""WITH $normCte,
         |pairs AS (
         |  SELECT p.vec_id AS probe_id, c.vec_id AS neighbor_id,
         |    ${dotSql("p.embedding", "c.embedding")} / (p.nrm * c.nrm) AS cos
         |  FROM e p JOIN e c ON p.vec_id < 5 AND p.vec_id <> c.vec_id),
         |r AS (SELECT *, row_number() OVER (PARTITION BY probe_id
         |  ORDER BY cos DESC, neighbor_id) AS rank FROM pairs)
         |SELECT probe_id, neighbor_id, cos AS cos_sim, CAST(rank AS INTEGER) AS rank
         |FROM r WHERE rank <= 4""".stripMargin,
    "q27_label_stats" ->
      """WITH el AS (SELECT label,
        |  sqrt(list_reduce(list_transform(embedding,
        |    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (a, b) -> a + b)) AS nrm
        |  FROM embeddings)
        |SELECT label, count(*) AS n_vecs, min(nrm) AS min_norm, max(nrm) AS max_norm
        |FROM el GROUP BY label""".stripMargin,
    "q28_corpus_stats" ->
      """WITH d AS (SELECT lang,
        |  len(string_split(text, ' ')) AS n_tok,
        |  len(list_distinct(string_split(text, ' '))) AS n_dist,
        |  length(text) AS n_char FROM documents)
        |SELECT lang, count(*) AS n_docs,
        |  CAST(sum(n_tok) AS BIGINT) AS total_tokens,
        |  CAST(sum(n_dist) AS DOUBLE) / CAST(sum(n_tok) AS DOUBLE) AS distinct_ratio,
        |  CAST(sum(n_char) - sum(n_tok) + count(*) AS DOUBLE) / CAST(sum(n_tok) AS DOUBLE) AS avg_word_len
        |FROM d GROUP BY lang""".stripMargin,
    "q29_token_freq" ->
      """SELECT token, count(*) AS n
        |FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents) t
        |GROUP BY token ORDER BY n DESC, token LIMIT 20""".stripMargin,
    "q30_langid" ->
      """SELECT lang, CASE
        |  WHEN strpos(' ' || text || ' ', ' the ') > 0 OR strpos(' ' || text || ' ', ' a ') > 0 THEN 'en'
        |  WHEN strpos(' ' || text || ' ', ' el ') > 0 OR strpos(' ' || text || ' ', ' una ') > 0 THEN 'es'
        |  WHEN strpos(' ' || text || ' ', ' le ') > 0 OR strpos(' ' || text || ' ', ' une ') > 0 THEN 'fr'
        |  WHEN strpos(' ' || text || ' ', ' der ') > 0 OR strpos(' ' || text || ' ', ' und ') > 0 THEN 'de'
        |  ELSE 'und' END AS lang_pred, count(*) AS n_docs
        |FROM documents GROUP BY 1, 2""".stripMargin,
    "q31_quality" ->
      s"""WITH d AS (SELECT source,
        |  $qualitySql AS q,
        |  len(regexp_extract_all(text, '[a-z0-9]{1,4}')) AS n_sub
        |FROM documents)
        |SELECT source, count(*) AS n_docs,
        |  CAST(sum(CASE WHEN q >= 0.6 THEN 1 ELSE 0 END) AS BIGINT) AS n_high_quality,
        |  CAST(sum(n_sub) AS BIGINT) AS total_subwords
        |FROM d GROUP BY source""".stripMargin,
    "q35_rollup" ->
      """SELECT CASE WHEN GROUPING(order_year) = 1 THEN 'ALL'
        |       ELSE coalesce(order_year, 'NULL') END AS order_year,
        |  CASE WHEN GROUPING(o_orderpriority) = 1 THEN 'ALL'
        |       ELSE coalesce(o_orderpriority, 'NULL') END AS priority,
        |  count(*) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM (SELECT strftime(o_orderdate, '%Y') AS order_year, o_orderpriority, o_totalprice
        |      FROM orders) t
        |GROUP BY ROLLUP(order_year, o_orderpriority)""".stripMargin,
    "q41_cube" ->
      """SELECT CASE WHEN GROUPING(l_returnflag) = 1 THEN 'ALL'
        |       ELSE coalesce(l_returnflag, 'NULL') END AS returnflag,
        |  CASE WHEN GROUPING(l_linestatus) = 1 THEN 'ALL'
        |       ELSE coalesce(l_linestatus, 'NULL') END AS linestatus,
        |  count(*) AS n_items,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
        |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)""".stripMargin,
    "q42_union_all" ->
      """SELECT c_name AS party_name, c_acctbal AS acctbal, 'customer' AS kind FROM customer
        |UNION ALL
        |SELECT s_name AS party_name, s_acctbal AS acctbal, 'supplier' AS kind FROM supplier""".stripMargin,
    "q43_sql_frontend" -> graft.operators.Relational.PriorityCheckSql,
    "q38_set_intersect" ->
      """SELECT DISTINCT c_nationkey AS nationkey FROM customer WHERE c_acctbal < 0
        |INTERSECT
        |SELECT DISTINCT s_nationkey AS nationkey FROM supplier WHERE s_acctbal < 0""".stripMargin,
    "q39_pivot" ->
      """SELECT CAST(user_id % 10 AS BIGINT) AS cohort,
        |  count(*) FILTER (WHERE event_type = 'click') AS n_click,
        |  count(*) FILTER (WHERE event_type = 'error') AS n_error,
        |  count(*) FILTER (WHERE event_type = 'purchase') AS n_purchase,
        |  count(*) FILTER (WHERE event_type = 'signup') AS n_signup,
        |  count(*) FILTER (WHERE event_type = 'view') AS n_view
        |FROM events GROUP BY 1""".stripMargin,
    "q36_scalar_funcs" ->
      """SELECT p_partkey,
        |  upper(p_brand) AS brand_uc,
        |  substr(p_name, 1, 8) AS name_prefix,
        |  CAST(length(p_name) AS INTEGER) AS name_len,
        |  regexp_replace(p_type, '[aeiou]', '_', 'g') AS type_masked,
        |  p_size % 5 AS size_mod,
        |  abs(p_size - 25) AS size_dist,
        |  CASE WHEN p_retailprice > 1500.0 THEN 'premium'
        |       WHEN p_retailprice > 1000.0 THEN 'standard'
        |       ELSE 'budget' END AS price_tier,
        |  p_brand || '#' || p_type AS brand_type
        |FROM part""".stripMargin,
    "q32_multimodal_meta" ->
      """SELECT doc_id,
        |  CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS byte_len,
        |  md5(text) AS content_md5,
        |  CASE WHEN regexp_matches(substr(text, 1, 1), '[a-m]') THEN 'typeA' ELSE 'typeB' END AS sniffed_format
        |FROM documents""".stripMargin,
    // q33: HLL sketch internals are engine-specific, so the query is
    // audit-form — Spark computes approx AND exact and emits a 0/1
    // within-5σ flag; the oracle is the exact count plus a literal 1,
    "q33_approx_distinct" ->
      """SELECT event_type, count(DISTINCT user_id) AS exact_users,
        |  CAST(1 AS BIGINT) AS within_rsd
        |FROM events GROUP BY event_type""".stripMargin,
    "q46_asof_join" ->
      """WITH e AS (SELECT user_id, event_id, epoch_ms(ts) AS ms,
        |  CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS tag FROM events),
        |w AS (SELECT *,
        |  last_value(CASE WHEN tag = 0 THEN event_id END IGNORE NULLS)
        |    OVER (PARTITION BY user_id ORDER BY ms, tag, event_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS attr_event_id,
        |  last_value(CASE WHEN tag = 0 THEN ms END IGNORE NULLS)
        |    OVER (PARTITION BY user_id ORDER BY ms, tag, event_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS attr_ms
        |  FROM e)
        |SELECT event_id, user_id, attr_event_id, ms - attr_ms AS gap_ms
        |FROM w WHERE tag = 1 AND attr_event_id IS NOT NULL""".stripMargin,
    "q47_range_join" ->
      """SELECT e.event_id, e.user_id, count(a.event_id) AS n_prev_24h
        |FROM (SELECT event_id, user_id, epoch_ms(ts) AS ms FROM events
        |      WHERE event_type = 'error') e
        |LEFT JOIN (SELECT event_id, user_id, epoch_ms(ts) AS ms FROM events) a
        |  ON a.user_id = e.user_id AND a.ms >= e.ms - 86400000 AND a.ms < e.ms
        |GROUP BY 1, 2""".stripMargin,
    "q48_salted_join" ->
      """SELECT p_brand,
        |  CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
        |  count(*) AS n_items
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY p_brand""".stripMargin,
    "q49_corpus_diff" -> CorpusDiffSql,
    // identical result to q49 by bloom no-false-negatives — the oracle
    // IS q49's exact formulation (the bloom is a pure prefilter),
    "q81_bloom_diff" -> CorpusDiffSql,
    // TF-IDF mirror of TextAnalysis.tfidfTerms: tf/df are exact integer
    // counts; the score replays Spark's IEEE sequence (divide, ln,
    // multiply — GraftLn is libm `ln`, bit-identical to DuckDB's);
    // ties on equal tfidf break by token ASC in both engines.,
    "q82_tfidf_terms" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token
        |  FROM documents),
        |tf AS (SELECT doc_id, token, count(*) AS tf FROM tok GROUP BY doc_id, token),
        |df AS (SELECT token, count(*) AS df FROM tf GROUP BY token),
        |n AS (SELECT count(*) AS n_docs FROM documents),
        |s AS (SELECT tf.doc_id, tf.token, tf.tf, df.df,
        |  CAST(tf.tf AS DOUBLE) * ln(CAST(n.n_docs AS DOUBLE) / CAST(df.df AS DOUBLE)) AS tfidf
        |  FROM tf JOIN df USING (token) CROSS JOIN n),
        |r AS (SELECT *, row_number() OVER (PARTITION BY doc_id
        |        ORDER BY tfidf DESC, token ASC) AS rank FROM s)
        |SELECT doc_id, CAST(rank AS INTEGER) AS rank, token, tf, df, tfidf
        |FROM r WHERE rank <= 3""".stripMargin,
    // Bigram-LM mirror of TextAnalysis.bigramFluency: q63's md5-bucket
    // split, q68's multiplicity-keeping bigram comprehension, add-one
    // smoothing ln((cb+1)/(cu+V)), and the document-order fold —
    // list(logp ORDER BY pos) + list_reduce replays Spark's
    // sort_array(collect_list(struct(pos, logp))) left fold exactly
    // (the fold's 0.0 seed is absorbed: 0.0 + x == x for every
    // finite nonzero logp, and logp < 0 always since cb+1 <= cu+V).,
    "q83_bigram_lm" ->
      """WITH b AS (SELECT doc_id, text,
        |  ((strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 4096
        | + (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1) * 256
        | + (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 3, 1)) - 1) * 16
        | + (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 4, 1)) - 1)) % 100 AS bucket
        | FROM documents),
        |w AS (SELECT doc_id, bucket, string_split(text, ' ') AS w FROM b),
        |cb AS (SELECT bigram, count(*) AS cb FROM (
        |  SELECT unnest([array_to_string(w[i:i+1], ' ') FOR i IN range(1, len(w))]) AS bigram
        |  FROM w WHERE bucket < 80 AND len(w) >= 2) GROUP BY bigram),
        |cu AS (SELECT w1, count(*) AS cu FROM (
        |  SELECT unnest(w) AS w1 FROM w WHERE bucket < 80) GROUP BY w1),
        |v AS (SELECT count(*) AS v FROM cu),
        |t AS (SELECT doc_id,
        |  unnest(range(0, len(w) - 1)) AS pos,
        |  unnest([array_to_string(w[i:i+1], ' ') FOR i IN range(1, len(w))]) AS bigram
        |  FROM w WHERE bucket >= 90 AND len(w) >= 2),
        |s AS (SELECT t.doc_id, t.pos,
        |  ln(CAST(coalesce(cb.cb, 0) + 1 AS DOUBLE) / CAST(coalesce(cu.cu, 0) + v.v AS DOUBLE)) AS logp
        |  FROM t LEFT JOIN cb USING (bigram)
        |       LEFT JOIN cu ON cu.w1 = string_split(t.bigram, ' ')[1]
        |       CROSS JOIN v),
        |g AS (SELECT doc_id, count(*) AS n_bigrams,
        |  list_reduce(list(logp ORDER BY pos), (a, x) -> a + x) AS total_logp
        |  FROM s GROUP BY doc_id)
        |SELECT doc_id, n_bigrams, total_logp,
        |  total_logp / CAST(n_bigrams AS DOUBLE) AS avg_logp
        |FROM g""".stripMargin,
    // Unigram-surprisal mirror of TextAnalysis.tokenSurprisal: exact
    // integer counts, one divide + libm ln per token, document-order
    // fold (list ORDER BY pos == Spark's sorted-struct fold), and the
    // final negate-after-divide in the same sequence.,
    "q84_surprisal" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |tok AS (SELECT doc_id, unnest(range(0, len(w))) AS pos, unnest(w) AS token FROM w),
        |c AS (SELECT token, count(*) AS c FROM tok GROUP BY token),
        |t AS (SELECT sum(c) AS t FROM c),
        |s AS (SELECT tok.doc_id, tok.pos,
        |  ln(CAST(c.c AS DOUBLE) / CAST(t.t AS DOUBLE)) AS logp
        |  FROM tok JOIN c USING (token) CROSS JOIN t),
        |g AS (SELECT doc_id, count(*) AS n_tokens,
        |  list_reduce(list(logp ORDER BY pos), (a, x) -> a + x) AS total_logp
        |  FROM s GROUP BY doc_id)
        |SELECT doc_id, n_tokens, total_logp,
        |  -(total_logp / CAST(n_tokens AS DOUBLE)) AS surprisal_nats
        |FROM g""".stripMargin,
    // Zipf-fit mirror of TextAnalysis.zipfSlope: ranks replay the
    // heap's total order (freq DESC, token ASC), each regression sum
    // is its own 0.0-seeded left fold in rank order
    // (list_prepend(0.0, ...) == Spark aggregate's lit(0.0) seed),
    // and the slope/intercept arithmetic is the same fixed sequence.,
    "q85_zipf" ->
      """WITH tf AS (SELECT source, token, count(*) AS freq FROM (
        |    SELECT source, unnest(string_split(text, ' ')) AS token FROM documents)
        |  GROUP BY source, token),
        |r AS (SELECT source, freq,
        |  row_number() OVER (PARTITION BY source ORDER BY freq DESC, token ASC) AS rank
        |  FROM tf),
        |top AS (SELECT source, rank,
        |  ln(CAST(rank AS DOUBLE)) AS x, ln(CAST(freq AS DOUBLE)) AS y
        |  FROM r WHERE rank <= 30),
        |g AS (SELECT source, count(*) AS n,
        |  list_reduce(list_prepend(0.0, list(x ORDER BY rank)), (a, b) -> a + b) AS sx,
        |  list_reduce(list_prepend(0.0, list(y ORDER BY rank)), (a, b) -> a + b) AS sy,
        |  list_reduce(list_prepend(0.0, list(x * y ORDER BY rank)), (a, b) -> a + b) AS sxy,
        |  list_reduce(list_prepend(0.0, list(x * x ORDER BY rank)), (a, b) -> a + b) AS sxx
        |  FROM top GROUP BY source),
        |g2 AS (SELECT source, n, sx, sy,
        |  (CAST(n AS DOUBLE) * sxy - sx * sy) / (CAST(n AS DOUBLE) * sxx - sx * sx) AS zipf_slope
        |  FROM g)
        |SELECT source, n AS n_terms, zipf_slope,
        |  (sy - zipf_slope * sx) / CAST(n AS DOUBLE) AS intercept
        |FROM g2""".stripMargin,
    // CDC-merge mirror of Reindex.cdcMerge: same deterministic
    // snapshot/change derivation, FULL JOIN + the same
    // kept/updated/inserted classification, deletes dropped last.,
    "q86_cdc_merge" ->
      """WITH snap AS (SELECT doc_id, text, source FROM documents WHERE doc_id < 450),
        |ch AS (SELECT doc_id,
        |  CASE WHEN doc_id % 10 < 2 THEN 'delete' ELSE 'upsert' END AS op,
        |  text || ' v2' AS new_text
        |  FROM documents WHERE doc_id >= 400),
        |j AS (SELECT coalesce(s.doc_id, c.doc_id) AS doc_id,
        |  s.text AS old_text, c.op, c.new_text
        |  FROM snap s FULL JOIN ch c ON s.doc_id = c.doc_id)
        |SELECT doc_id, coalesce(new_text, old_text) AS text,
        |  CASE WHEN op IS NULL THEN 'kept'
        |       WHEN old_text IS NULL THEN 'inserted'
        |       ELSE 'updated' END AS action
        |FROM j WHERE op IS NULL OR op <> 'delete'""".stripMargin,
    // Recall-audit mirror of Similarity.annRecall: q24's exact top-k
    // and q26's bucketed top-k as CTEs over the SAME probe set (10
    // probes, k=3, 6-bit sign LSH), then one left join + count ratio
    // of exact integers.,
    "q87_ann_recall" ->
      s"""WITH $normCte,
         |eb AS (SELECT *,
         |  (CASE WHEN embedding[1] > 0 THEN 1 ELSE 0 END
         | + CASE WHEN embedding[2] > 0 THEN 2 ELSE 0 END
         | + CASE WHEN embedding[3] > 0 THEN 4 ELSE 0 END
         | + CASE WHEN embedding[4] > 0 THEN 8 ELSE 0 END
         | + CASE WHEN embedding[5] > 0 THEN 16 ELSE 0 END
         | + CASE WHEN embedding[6] > 0 THEN 32 ELSE 0 END) AS bucket FROM e),
         |xp AS (
         |  SELECT p.vec_id AS probe_id, c.vec_id AS neighbor_id,
         |    ${dotSql("p.embedding", "c.embedding")} / (p.nrm * c.nrm) AS cos
         |  FROM e p JOIN e c ON p.vec_id < 10 AND p.vec_id <> c.vec_id),
         |xr AS (SELECT *, row_number() OVER (PARTITION BY probe_id
         |  ORDER BY cos DESC, neighbor_id) AS rank FROM xp),
         |exact AS (SELECT probe_id, neighbor_id FROM xr WHERE rank <= 3),
         |ap AS (
         |  SELECT p.vec_id AS probe_id, c.vec_id AS neighbor_id,
         |    ${dotSql("p.embedding", "c.embedding")} / (p.nrm * c.nrm) AS cos
         |  FROM eb p JOIN eb c ON p.bucket = c.bucket AND p.vec_id < 10 AND p.vec_id <> c.vec_id),
         |ar AS (SELECT *, row_number() OVER (PARTITION BY probe_id
         |  ORDER BY cos DESC, neighbor_id) AS rank FROM ap),
         |approx AS (SELECT probe_id, neighbor_id FROM ar WHERE rank <= 3),
         |j AS (SELECT x.probe_id,
         |  CASE WHEN a.neighbor_id IS NULL THEN 0 ELSE 1 END AS hit
         |  FROM exact x LEFT JOIN approx a
         |    ON x.probe_id = a.probe_id AND x.neighbor_id = a.neighbor_id)
         |SELECT probe_id, count(*) AS n_exact, CAST(sum(hit) AS BIGINT) AS n_hits,
         |  CAST(sum(hit) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS recall
         |FROM j GROUP BY probe_id""".stripMargin,
    // BM25 mirror of TextAnalysis.bm25Search: q82's tf/df/tfidf CTEs
    // pick each probe's top-3 query terms; the Okapi score replays
    // Spark's IEEE sequence exactly — idf = ln((N-df+0.5)/(df+0.5))
    // (GraftLn is libm ln, bit-identical to DuckDB's), the length
    // norm's constants fold identically ((1.0-0.75) → 0.25, (1.2+1.0)
    // → 2.2 — the same two IEEE ops both engines), avgdl is ONE
    // divide of exact integers, and the per-(probe,doc) sum folds in
    // token order with a 0.0 seed (list_prepend == Spark's lit(0.0)
    // aggregate seed).  Ranking ties break on doc_id.,
    "q88_bm25" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token
        |  FROM documents),
        |tf AS (SELECT doc_id, token, count(*) AS tf FROM tok GROUP BY doc_id, token),
        |df AS (SELECT token, count(*) AS df FROM tf GROUP BY token),
        |n AS (SELECT count(*) AS n_docs FROM documents),
        |dl AS (SELECT doc_id, len(string_split(text, ' ')) AS dl FROM documents),
        |st AS (SELECT count(*) AS n_docs,
        |  CAST(sum(dl) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avgdl FROM dl),
        |ts AS (SELECT tf.doc_id, tf.token, tf.tf, df.df,
        |  CAST(tf.tf AS DOUBLE) * ln(CAST(n.n_docs AS DOUBLE) / CAST(df.df AS DOUBLE)) AS tfidf
        |  FROM tf JOIN df USING (token) CROSS JOIN n),
        |qr AS (SELECT *, row_number() OVER (PARTITION BY doc_id
        |        ORDER BY tfidf DESC, token ASC) AS rank FROM ts),
        |probes AS (SELECT doc_id AS probe_id, token FROM qr
        |  WHERE rank <= 3 AND doc_id < 10),
        |terms AS (SELECT p.probe_id, tf.doc_id, tf.token,
        |  ln((CAST(st.n_docs AS DOUBLE) - CAST(df.df AS DOUBLE) + 0.5)
        |     / (CAST(df.df AS DOUBLE) + 0.5))
        |  * ((CAST(tf.tf AS DOUBLE) * (1.2 + 1.0))
        |     / (CAST(tf.tf AS DOUBLE)
        |        + 1.2 * ((1.0 - 0.75) + 0.75 * (CAST(dl.dl AS DOUBLE) / st.avgdl)))) AS s
        |  FROM probes p JOIN tf ON p.token = tf.token
        |  JOIN df ON df.token = tf.token
        |  JOIN dl ON dl.doc_id = tf.doc_id
        |  CROSS JOIN st),
        |g AS (SELECT probe_id, doc_id, count(*) AS n_hits,
        |  list_reduce(list_prepend(0.0, list(s ORDER BY token)), (a, x) -> a + x) AS score
        |  FROM terms GROUP BY probe_id, doc_id),
        |r AS (SELECT *, row_number() OVER (PARTITION BY probe_id
        |       ORDER BY score DESC, doc_id ASC) AS rank FROM g)
        |SELECT probe_id, CAST(rank AS INTEGER) AS rank, doc_id, n_hits, score
        |FROM r WHERE rank <= 5""".stripMargin,
    // KL-drift mirror of TextAnalysis.sourceDrift: corpus counts and
    // per-source totals RE-aggregate the (source, token) frame exactly
    // as Spark does (sum of cs, not a second scan); p, q, p/q are each
    // one divide; the per-source fold is token-ordered with the 0.0
    // seed.  n_tokens surfaces as BIGINT (DuckDB sum() is HUGEINT).,
    "q89_source_drift" ->
      """WITH tok AS (SELECT source, unnest(string_split(text, ' ')) AS token
        |  FROM documents),
        |cs AS (SELECT source, token, count(*) AS cs FROM tok GROUP BY source, token),
        |c AS (SELECT token, CAST(sum(cs) AS BIGINT) AS c FROM cs GROUP BY token),
        |tsrc AS (SELECT source, CAST(sum(cs) AS BIGINT) AS t_src FROM cs GROUP BY source),
        |tot AS (SELECT CAST(sum(c) AS BIGINT) AS t_all FROM c),
        |s AS (SELECT cs.source, cs.token,
        |  CAST(cs.cs AS DOUBLE) / CAST(t_src AS DOUBLE) AS p,
        |  CAST(c.c AS DOUBLE) / CAST(t_all AS DOUBLE) AS q
        |  FROM cs JOIN c USING (token) JOIN tsrc USING (source) CROSS JOIN tot),
        |s2 AS (SELECT source, token, p * ln(p / q) AS contrib FROM s),
        |g AS (SELECT source, count(*) AS n_terms,
        |  list_reduce(list_prepend(0.0, list(contrib ORDER BY token)), (a, x) -> a + x) AS kl_nats
        |  FROM s2 GROUP BY source)
        |SELECT g.source, g.n_terms, tsrc.t_src AS n_tokens, g.kl_nats
        |FROM g JOIN tsrc ON g.source = tsrc.source""".stripMargin,
    // Funnel mirror of EventOps.funnel: the same min-after-previous
    // cascade in integer epoch-millis; strict > at each stage; the
    // only double is the final ratio.,
    "q90_funnel" ->
      """WITH e AS (SELECT user_id, event_type, epoch_ms(ts) AS ms FROM events),
        |u1 AS (SELECT user_id, min(ms) AS t1 FROM e
        |  WHERE event_type = 'view' GROUP BY user_id),
        |u2 AS (SELECT e.user_id, min(e.ms) AS t2 FROM e JOIN u1 USING (user_id)
        |  WHERE e.event_type = 'click' AND e.ms > u1.t1 GROUP BY e.user_id),
        |u3 AS (SELECT e.user_id, min(e.ms) AS t3 FROM e JOIN u2 USING (user_id)
        |  WHERE e.event_type = 'purchase' AND e.ms > u2.t2 GROUP BY e.user_id),
        |c AS (SELECT 1 AS stage_idx, 'view' AS stage, count(*) AS n_users FROM u1
        |  UNION ALL SELECT 2, 'click', count(*) FROM u2
        |  UNION ALL SELECT 3, 'purchase', count(*) FROM u3),
        |f AS (SELECT count(*) AS n_first FROM u1)
        |SELECT stage_idx, stage, n_users,
        |  CAST(n_users AS DOUBLE) / CAST(n_first AS DOUBLE) AS pct_of_first
        |FROM c CROSS JOIN f""".stripMargin,
    // Retention mirror of EventOps.retentionCohorts: weeks are integer
    // epoch-ms // 604800000 (DuckDB's // == Spark's div on positive
    // BIGINTs); distinct (user, week), min-week cohorts, equi-join,
    // one final divide.,
    "q91_retention" ->
      """WITH w AS (SELECT DISTINCT user_id, epoch_ms(ts) // 604800000 AS week
        |  FROM events),
        |f AS (SELECT user_id, min(week) AS cohort_week FROM w GROUP BY user_id),
        |s AS (SELECT cohort_week, count(*) AS cohort_size FROM f GROUP BY cohort_week),
        |a AS (SELECT f.cohort_week, w.week - f.cohort_week AS week_offset,
        |  count(*) AS n_active
        |  FROM w JOIN f ON w.user_id = f.user_id GROUP BY 1, 2)
        |SELECT a.cohort_week, a.week_offset, a.n_active, s.cohort_size,
        |  CAST(a.n_active AS DOUBLE) / CAST(s.cohort_size AS DOUBLE) AS retention
        |FROM a JOIN s ON a.cohort_week = s.cohort_week""".stripMargin,
    // PQ-ANN mirror of Similarity.pqAnn: four independent subspace
    // codebooks (q54's Lloyd contract at 16 dims each), integer code
    // assignment (argmax dot, ties → lowest cid == assignCells'
    // max-struct rule), and ADC scoring — probe's EXACT subvector ·
    // assigned centroid, four sequential-fold dots added left to
    // right, the same IEEE sequence Spark's reduce(_ + _) emits.,
    "q92_pq_ann" -> pqAnnSql,
    // MAD mirror of TextAnalysis.madOutliers: both medians are the
    // lower-median rn == ceil(0.5·n) row of a (value, doc_id) ranking
    // (q51's exact-percentile rule); the gate compares exact integers
    // through two exact int→double conversions; one final ratio.,
    "q93_mad_outliers" ->
      """WITH d AS (SELECT source, doc_id, n_chars FROM documents),
        |r1 AS (SELECT source, doc_id, n_chars,
        |  row_number() OVER (PARTITION BY source ORDER BY n_chars, doc_id) AS rn,
        |  count(*) OVER (PARTITION BY source) AS n FROM d),
        |med AS (SELECT source, n_chars AS med_chars FROM r1
        |  WHERE rn = CAST(ceil(0.5 * n) AS BIGINT)),
        |dv AS (SELECT d.source, d.doc_id, d.n_chars, med.med_chars,
        |  abs(d.n_chars - med.med_chars) AS dev FROM d JOIN med USING (source)),
        |r2 AS (SELECT source, doc_id, dev,
        |  row_number() OVER (PARTITION BY source ORDER BY dev, doc_id) AS rn,
        |  count(*) OVER (PARTITION BY source) AS n FROM dv),
        |mad AS (SELECT source, dev AS mad_chars FROM r2
        |  WHERE rn = CAST(ceil(0.5 * n) AS BIGINT)),
        |g AS (SELECT dv.source, count(*) AS n_docs,
        |  max(dv.med_chars) AS med_chars, max(mad.mad_chars) AS mad_chars,
        |  CAST(sum(CASE WHEN CAST(dv.dev AS DOUBLE) > 3.0 * CAST(mad.mad_chars AS DOUBLE)
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
        |  FROM dv JOIN mad USING (source) GROUP BY dv.source)
        |SELECT source, n_docs, med_chars, mad_chars, n_outliers,
        |  CAST(n_outliers AS DOUBLE) / CAST(n_docs AS DOUBLE) AS outlier_pct
        |FROM g""".stripMargin,
    // Session-path mirror of EventOps.sessionPaths: q67's strict
    // >30-min-gap session rule computed on epoch MICROseconds (the
    // precision Tables.events normalizes to, so both engines order by
    // the identical integer key), per-session event-type lists in
    // (us, event_id) order, trigram comprehension, top-20 by
    // (count DESC, path ASC) — a total order, so LIMIT is exact.,
    "q94_session_paths" ->
      """WITH e AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS us FROM events),
        |l AS (SELECT *, lag(us) OVER (PARTITION BY user_id ORDER BY us, event_id) AS prev_us FROM e),
        |f AS (SELECT *, CASE WHEN prev_us IS NULL OR us - prev_us > 1800000000
        |  THEN 1 ELSE 0 END AS new_session FROM l),
        |s AS (SELECT *, sum(new_session) OVER (PARTITION BY user_id
        |  ORDER BY us, event_id ROWS UNBOUNDED PRECEDING) AS sid FROM f),
        |seq AS (SELECT user_id, sid, list(event_type ORDER BY us, event_id) AS evs
        |  FROM s GROUP BY user_id, sid),
        |p AS (SELECT unnest([array_to_string(evs[i:i+2], '->')
        |    FOR i IN range(1, len(evs) - 1)]) AS path
        |  FROM seq WHERE len(evs) >= 3)
        |SELECT path, count(*) AS n_paths FROM p GROUP BY path
        |ORDER BY n_paths DESC, path ASC LIMIT 20""".stripMargin,
    // IVF-PQ mirror of Similarity.ivfPqAnn: q54's coarse Lloyd at ONE
    // iteration assigns every vector a cell; q92's four subspace
    // codebooks encode it; candidates are same-cell only (equi-join),
    // scored by the identical fixed-sequence ADC sum.,
    "q95_ivfpq_ann" -> ivfPqAnnSql,
    // Overlap mirror of Dedup.sourceOverlap: distinct (source,
    // trigram) frame (q69's comprehension), self-equi-join on the
    // shingle with src_a < src_b, per-source sizes, integer Jaccard
    // arithmetic up to one divide.,
    "q96_source_overlap" ->
      """WITH w AS (SELECT source, string_split(text, ' ') AS w FROM documents),
        |sh AS (SELECT DISTINCT source,
        |  unnest([array_to_string(w[i:i+2], ' ') FOR i IN range(1, len(w) - 1)]) AS shingle
        |  FROM w WHERE len(w) >= 3),
        |sizes AS (SELECT source, count(*) AS n FROM sh GROUP BY source),
        |inter AS (SELECT a.source AS source_x, b.source AS source_y, count(*) AS n_inter
        |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.source < b.source
        |  GROUP BY 1, 2)
        |SELECT i.source_x, i.source_y, sa.n AS n_a, sb.n AS n_b, i.n_inter,
        |  CAST(i.n_inter AS DOUBLE) / CAST(sa.n + sb.n - i.n_inter AS DOUBLE) AS jaccard
        |FROM inter i JOIN sizes sa ON sa.source = i.source_x
        |JOIN sizes sb ON sb.source = i.source_y""".stripMargin,
    // PMI mirror of TextAnalysis.pmiCollocations: q83's
    // multiplicity-keeping bigram comprehension, exact counts, one
    // divide per probability, one multiply + one divide + libm ln per
    // score, (pmi DESC, bigram ASC) total order for the LIMIT.,
    "q97_pmi" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |cb AS (SELECT bigram, count(*) AS cb FROM (
        |  SELECT unnest([array_to_string(w[i:i+1], ' ') FOR i IN range(1, len(w))]) AS bigram
        |  FROM w WHERE len(w) >= 2) GROUP BY bigram),
        |cu AS (SELECT w1, count(*) AS cu FROM (SELECT unnest(w) AS w1 FROM w) GROUP BY w1),
        |tot AS (SELECT (SELECT CAST(sum(cb) AS BIGINT) FROM cb) AS b_total,
        |               (SELECT CAST(sum(cu) AS BIGINT) FROM cu) AS t_total),
        |s AS (SELECT cb.bigram, cb.cb, c1.cu AS c1, c2.cu AS c2,
        |  CAST(cb.cb AS DOUBLE) / CAST(tot.b_total AS DOUBLE) AS p_ab,
        |  CAST(c1.cu AS DOUBLE) / CAST(tot.t_total AS DOUBLE) AS p_a,
        |  CAST(c2.cu AS DOUBLE) / CAST(tot.t_total AS DOUBLE) AS p_b
        |  FROM cb JOIN cu c1 ON c1.w1 = string_split(cb.bigram, ' ')[1]
        |  JOIN cu c2 ON c2.w1 = string_split(cb.bigram, ' ')[2]
        |  CROSS JOIN tot WHERE cb.cb >= 5)
        |SELECT bigram, cb, c1, c2, ln(p_ab / (p_a * p_b)) AS pmi
        |FROM s ORDER BY pmi DESC, bigram ASC LIMIT 20""".stripMargin,
    // Fixed-sample mirror of TextAnalysis.fixedSample: md5 hex digits
    // 9-12 as the integer priority (independent of q63's 1-4 and
    // q75's 5-8), (priority, doc_id) ranking, rank <= 10.,
    "q98_fixed_sample" ->
      """WITH pr AS (SELECT source, doc_id, CAST(
        |  ((strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 9, 1)) - 1) * 4096
        | + (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 10, 1)) - 1) * 256
        | + (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 11, 1)) - 1) * 16
        | + (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 12, 1)) - 1)) AS INTEGER) AS priority
        | FROM documents),
        |r AS (SELECT *, row_number() OVER (PARTITION BY source
        |  ORDER BY priority, doc_id) AS rank FROM pr)
        |SELECT source, CAST(rank AS INTEGER) AS rank, doc_id, priority
        |FROM r WHERE rank <= 10""".stripMargin,
    // Rolling-window mirror of EventOps.rolling24h: the identical
    // RANGE frame over integer epoch-millis ([ms-86399999, ms], peers
    // included in both engines), DECIMAL(18,2) exact value sums
    // surfacing as DOUBLE.,
    "q99_rolling_24h" ->
      """WITH e AS (SELECT event_id, user_id, epoch_ms(ts) AS ms,
        |  CAST(value AS DECIMAL(18,2)) AS v FROM events)
        |SELECT event_id, user_id, ms,
        |  count(*) OVER w AS n_24h,
        |  CAST(sum(v) OVER w AS DOUBLE) AS sum_24h
        |FROM e
        |WINDOW w AS (PARTITION BY user_id ORDER BY ms
        |  RANGE BETWEEN 86399999 PRECEDING AND CURRENT ROW)""".stripMargin,
    // TPC-H Q5 mirror of Relational.localSupplierVolume: same join
    // graph, date/region constants, and the house DECIMAL(18,4)
    // revenue sum; revenue doubles are bit-identical so the ORDER BY
    // is a shared total order (n_name tiebreak regardless).,
    "q100_tpch_q5" ->
      """SELECT n_name,
        |  CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
        |  count(*) AS n_items
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1997-01-01'
        |GROUP BY n_name
        |ORDER BY revenue DESC, n_name""".stripMargin,
    // Sparse-cosine mirror of TextAnalysis.sparseCosinePairs: q82's
    // exact tf·ln(N/df) weights, token-ordered 0.0-seeded folds for
    // BOTH the norms (all tokens) and the pair dots (df-capped inverted
    // index, shared tokens only), one multiply + one divide per cosine,
    // (cos DESC, doc_a, doc_b) total order for the LIMIT.,
    "q101_sparse_sim" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token
        |  FROM documents),
        |tf AS (SELECT doc_id, token, count(*) AS tf FROM tok GROUP BY doc_id, token),
        |df AS (SELECT token, count(*) AS df FROM tf GROUP BY token),
        |n AS (SELECT count(*) AS n_docs FROM documents),
        |w AS (SELECT tf.doc_id, tf.token, df.df,
        |  CAST(tf.tf AS DOUBLE) * ln(CAST(n.n_docs AS DOUBLE) / CAST(df.df AS DOUBLE)) AS w
        |  FROM tf JOIN df USING (token) CROSS JOIN n),
        |nr AS (SELECT doc_id,
        |  sqrt(list_reduce(list_prepend(0.0, list(w * w ORDER BY token)), (a, x) -> a + x)) AS nrm
        |  FROM w GROUP BY doc_id),
        |p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_shared,
        |  list_reduce(list_prepend(0.0, list(a.w * b.w ORDER BY a.token)), (a2, x) -> a2 + x) AS dot
        |  FROM w a JOIN w b ON a.token = b.token AND a.doc_id < b.doc_id
        |  WHERE a.df <= 50 AND b.df <= 50
        |  GROUP BY 1, 2),
        |c AS (SELECT p.doc_a, p.doc_b, p.n_shared,
        |  p.dot / (na.nrm * nb.nrm) AS cos
        |  FROM p JOIN nr na ON na.doc_id = p.doc_a
        |  JOIN nr nb ON nb.doc_id = p.doc_b)
        |SELECT doc_a, doc_b, n_shared, cos FROM c
        |ORDER BY cos DESC, doc_a, doc_b LIMIT 20""".stripMargin,
    // Stub-decode mirror of Multimodal.featureSummary: the payload is
    // the document's ASCII text, so every step is exact SQL — frame
    // count len//100 in [1, 4], 100-byte slices, integer byte sums,
    // ONE divide per mean, and floor(x·1e6 + 0.5)/1e6 for BOTH
    // roundings (JVM Math.round is floor(x+0.5); Spark's round() was
    // deliberately NOT used, its decimal-string HALF_UP has no DuckDB
    // twin).  The per-doc avg folds in frame order (a payload's frames
    // are consecutive rows of one partition, so Spark's partial sum is
    // frame-ordered; list(feature ORDER BY f) replays it).,
    "q34_media_features" ->
      """WITH d AS (SELECT doc_id, text, length(text) AS len FROM documents),
        |fr AS (SELECT doc_id, text, len,
        |  unnest(range(0, least(greatest(len // 100, 1), 4))) AS f FROM d),
        |sl AS (SELECT doc_id, f, substr(text, CAST(f * 100 + 1 AS INTEGER), 100) AS slice FROM fr),
        |ft AS (SELECT doc_id, f,
        |  floor((CAST(list_aggregate(list_transform(range(1, length(slice) + 1),
        |      i -> unicode(slice[i])), 'sum') AS DOUBLE)
        |    / CAST(length(slice) AS DOUBLE)) * 1000000.0 + 0.5) / 1000000.0 AS feature
        |  FROM sl),
        |g AS (SELECT doc_id, count(*) AS n_frames,
        |  list_reduce(list_prepend(0.0, list(feature ORDER BY f)), (a, b) -> a + b) AS s
        |  FROM ft GROUP BY doc_id)
        |SELECT doc_id, n_frames,
        |  floor((s / CAST(n_frames AS DOUBLE)) * 1000000.0 + 0.5) / 1000000.0 AS mean_feature
        |FROM g""".stripMargin,
    "q50_variance" ->
      """WITH s AS (SELECT c_nationkey, count(*) AS n,
        |  CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sx,
        |  CAST(sum(CAST(c_acctbal AS DECIMAL(18,2)) * CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sxx
        |  FROM customer GROUP BY c_nationkey)
        |SELECT c_nationkey, n,
        |  (sxx - sx * sx / n) / (n - 1) AS var_acctbal,
        |  sqrt((sxx - sx * sx / n) / (n - 1)) AS stddev_acctbal
        |FROM s""".stripMargin,
    "q65_pctl_scale" -> // identical result to q51 via the two-pass path
      """WITH r AS (SELECT o_orderpriority, o_totalprice,
        |  row_number() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey) AS rn,
        |  count(*) OVER (PARTITION BY o_orderpriority) AS n
        |  FROM orders)
        |SELECT o_orderpriority,
        |  max(CASE WHEN rn = CAST(ceil(0.5 * n) AS BIGINT) THEN o_totalprice END) AS p50,
        |  max(CASE WHEN rn = CAST(ceil(0.9 * n) AS BIGINT) THEN o_totalprice END) AS p90,
        |  max(n) AS n_orders
        |FROM r GROUP BY o_orderpriority""".stripMargin,
    "q51_percentile" ->
      """WITH r AS (SELECT o_orderpriority, o_totalprice,
        |  row_number() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey) AS rn,
        |  count(*) OVER (PARTITION BY o_orderpriority) AS n
        |  FROM orders)
        |SELECT o_orderpriority,
        |  max(CASE WHEN rn = CAST(ceil(0.5 * n) AS BIGINT) THEN o_totalprice END) AS p50,
        |  max(CASE WHEN rn = CAST(ceil(0.9 * n) AS BIGINT) THEN o_totalprice END) AS p90,
        |  max(n) AS n_orders
        |FROM r GROUP BY o_orderpriority""".stripMargin,
    "q52_grouping_sets" ->
      """SELECT CASE WHEN GROUPING(order_year) = 1 THEN 'ALL'
        |       ELSE coalesce(order_year, 'NULL') END AS order_year,
        |  CASE WHEN GROUPING(o_orderpriority) = 1 THEN 'ALL'
        |       ELSE coalesce(o_orderpriority, 'NULL') END AS priority,
        |  count(*) AS n_orders
        |FROM (SELECT strftime(o_orderdate, '%Y') AS order_year, o_orderpriority FROM orders) t
        |GROUP BY GROUPING SETS ((order_year), (o_orderpriority), ())""".stripMargin,
    "q53_edit_distance" ->
      """SELECT p_partkey, substr(p_name, 1, 10) AS name_prefix, p_type,
        |  CAST(levenshtein(substr(p_name, 1, 10), p_type) AS INTEGER) AS edit_dist
        |FROM part""".stripMargin,
    "q54_ivf_ann" -> ivfAnnSql,
    "q55_pos_tokens" ->
      """SELECT doc_id, CAST(pos AS INTEGER) AS pos, token
        |FROM (SELECT doc_id, unnest(range(0, len(w))) AS pos, unnest(w) AS token
        |      FROM (SELECT doc_id, string_split(text, ' ') AS w
        |            FROM documents WHERE doc_id < 20) t) z""".stripMargin,
    "q56_topk_per_group" ->
      """SELECT o_orderpriority, CAST(rank AS INTEGER) AS rank, o_orderkey, o_totalprice
        |FROM (SELECT o_orderpriority, o_orderkey, o_totalprice,
        |        row_number() OVER (PARTITION BY o_orderpriority
        |          ORDER BY o_totalprice DESC, o_orderkey) AS rank
        |      FROM orders) t
        |WHERE rank <= 3""".stripMargin,
    "q57_rank_funcs" ->
      """SELECT o_orderpriority, o_orderkey, o_totalprice,
        |  CAST(dense_rank() OVER w AS INTEGER) AS drank,
        |  percent_rank() OVER w AS prank,
        |  cume_dist() OVER w AS cdist,
        |  CAST(ntile(4) OVER w AS INTEGER) AS quartile
        |FROM orders WHERE o_totalprice > 400000.0
        |WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey)""".stripMargin,
    // q58: GK-sketch internals are engine-specific, so the query is
    // audit-form — Spark recounts the returned elements' exact rank
    // intervals and emits 0/1 contract flags; the oracle is the exact
    // count plus literal 1s (q51 stays the exact-value anchor),
    "q58_approx_quantile" ->
      """SELECT o_orderpriority, count(*) AS n_orders,
        |  CAST(1 AS BIGINT) AS p50_ok, CAST(1 AS BIGINT) AS p90_ok
        |FROM orders GROUP BY o_orderpriority""".stripMargin,
    "q59_collect_sets" ->
      """SELECT user_id,
        |  string_agg(DISTINCT event_type, ',' ORDER BY event_type) AS event_types,
        |  count(*) AS n_events
        |FROM events GROUP BY user_id""".stripMargin,
    "q60_date_facets" ->
      """SELECT o_orderkey,
        |  CAST(year(o_orderdate) AS INTEGER) AS y,
        |  CAST(quarter(o_orderdate) AS INTEGER) AS q,
        |  CAST(month(o_orderdate) AS INTEGER) AS m,
        |  CAST(dayofweek(o_orderdate) + 1 AS INTEGER) AS dow,
        |  CAST(dayofyear(o_orderdate) AS INTEGER) AS doy,
        |  strftime(last_day(o_orderdate), '%Y-%m-%d') AS month_end,
        |  strftime(o_orderdate + INTERVAL 3 MONTH, '%Y-%m-%d') AS plus_quarter,
        |  CAST(datediff('day', o_orderdate, DATE '1999-01-01') AS INTEGER) AS days_to_99
        |FROM orders WHERE o_orderkey % 20 = 0""".stripMargin,
    "q61_corr_subquery" -> graft.operators.Relational.PremiumPartsSql,
    "q66_union_distinct" ->
      """SELECT c_nationkey AS nationkey FROM customer
        |UNION
        |SELECT s_nationkey AS nationkey FROM supplier""".stripMargin,
    // session_window merges at MICROsecond precision and MERGES an
    // event landing exactly at prev+gap (verified against Spark 4.1.2:
    // the merge test is start2 <= end1, inclusive) → the oracle uses
    // epoch_us with a STRICT > gap new-session condition; a ms-floored
    // comparison would disagree by 1ms on straddling gaps.  end = last
    // ts + gap, floored to ms.,
    "q67_session_window" ->
      """WITH e AS (
        |  SELECT user_id, event_id, value, epoch_us(ts) AS us,
        |    lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
        |  FROM events),
        |f AS (SELECT *, CASE WHEN prev_us IS NULL OR us - prev_us > 1800000000
        |  THEN 1 ELSE 0 END AS new_session FROM e),
        |s AS (SELECT *, sum(new_session) OVER (PARTITION BY user_id
        |  ORDER BY us, event_id ROWS UNBOUNDED PRECEDING) AS sid FROM f)
        |SELECT user_id, min(us) // 1000 AS session_start_ms,
        |  (max(us) + 1800000000) // 1000 AS session_end_ms,
        |  count(*) AS n_events,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS session_value
        |FROM s GROUP BY user_id, sid""".stripMargin,
    // the resize stub keeps every 2nd byte; text is ASCII so byte ==
    // char and DuckDB can rebuild the exact resized payload,
    "q62_media_resize" ->
      """SELECT doc_id, CAST(length(text) AS BIGINT) AS orig_len,
        |  CAST((length(text) + 1) // 2 AS BIGINT) AS resized_len,
        |  md5(array_to_string([substr(text, i, 1) FOR i IN range(1, length(text) + 1, 2)], '')) AS resized_md5
        |FROM documents""".stripMargin,
    "q63_train_split" ->
      """WITH b AS (SELECT source, text,
        |  ((strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 4096
        | + (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1) * 256
        | + (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 3, 1)) - 1) * 16
        | + (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 4, 1)) - 1)) % 100 AS bucket
        | FROM documents)
        |SELECT source,
        |  CASE WHEN bucket < 80 THEN 'train' WHEN bucket < 90 THEN 'valid' ELSE 'test' END AS split,
        |  count(*) AS n_docs,
        |  CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
        |FROM b GROUP BY 1, 2""".stripMargin,
    "q68_repetition" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |bg AS (SELECT doc_id,
        |  unnest([array_to_string(w[i:i+1], ' ') FOR i IN range(1, len(w))]) AS bigram
        |  FROM w WHERE len(w) >= 2),
        |c AS (SELECT doc_id, bigram, count(*) AS c FROM bg GROUP BY 1, 2),
        |d AS (SELECT doc_id, sum(c) AS n_bigrams, count(*) AS n_distinct, max(c) AS top_count
        |      FROM c GROUP BY doc_id)
        |SELECT doc_id, CAST(n_bigrams AS BIGINT) AS n_bigrams,
        |  CAST(n_bigrams - n_distinct AS DOUBLE) / CAST(n_bigrams AS DOUBLE) AS dup_bigram_frac,
        |  CAST(top_count AS DOUBLE) / CAST(n_bigrams AS DOUBLE) AS top_bigram_frac
        |FROM d""".stripMargin,
    "q69_contamination" ->
      """WITH b AS (SELECT doc_id, text,
        |  ((strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 4096
        | + (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1) * 256
        | + (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 3, 1)) - 1) * 16
        | + (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 4, 1)) - 1)) % 100 AS bucket
        | FROM documents),
        |w AS (SELECT doc_id, bucket, string_split(text, ' ') AS w FROM b),
        |sh AS (SELECT DISTINCT doc_id, bucket,
        |  unnest([array_to_string(w[i:i+2], ' ') FOR i IN range(1, len(w) - 1)]) AS shingle
        |  FROM w WHERE len(w) >= 3),
        |train AS (SELECT DISTINCT shingle FROM sh WHERE bucket < 80),
        |test AS (SELECT doc_id, shingle FROM sh WHERE bucket >= 90),
        |j AS (SELECT t.doc_id, CASE WHEN tr.shingle IS NULL THEN 0 ELSE 1 END AS hit
        |      FROM test t LEFT JOIN train tr USING (shingle))
        |SELECT doc_id, count(*) AS n_shingles,
        |  CAST(sum(hit) AS BIGINT) AS n_contaminated,
        |  CAST(sum(hit) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS contamination_rate
        |FROM j GROUP BY doc_id""".stripMargin,
    "q70_mix_weights" ->
      """WITH per AS (SELECT source, count(*) AS n_docs,
        |  CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
        |  FROM documents GROUP BY source),
        |tot AS (SELECT sum(n_tokens) AS total_tokens, count(*) AS n_sources FROM per)
        |SELECT source, n_docs, n_tokens,
        |  CASE WHEN n_tokens = 0 THEN NULL
        |       ELSE CAST(total_tokens AS DOUBLE) / CAST(n_sources * n_tokens AS DOUBLE)
        |  END AS weight
        |FROM per CROSS JOIN tot""".stripMargin,
    "q72_dedup_clusters" ->
      s"""WITH RECURSIVE $closureCte
         |SELECT doc_id, cluster_id FROM cc_labels""".stripMargin
  )
}
