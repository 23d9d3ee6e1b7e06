package graft

/**
 * DuckDB oracle SQL — one entry per [[Queries]] member, semantically and
 * bit-identically equivalent (see Queries scaladoc for the determinism
 * rules; portable hash = `CAST('0x'||substr(md5(s),1,8) AS BIGINT)`,
 * mirroring pipeline.ops.Portable.hash32).
 */
object Oracle {

  /** Shared SQL fragments. */
  private val H32 = "CAST('0x'||substr(md5(%s),1,8) AS BIGINT)"
  private def h32(e: String) = H32.format(e)

  /** Portable cosine: sequential double fold == Spark CosineSimExpr. */
  private def cosSql(a: String, b: String): String =
    s"""list_reduce(list_prepend(CAST(0 AS DOUBLE), list_transform(range(1, 65),
       |      i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE))), (x,y) -> x+y)
       |    / (sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE), list_transform(range(1, 65),
       |        i -> CAST($a[i] AS DOUBLE) * CAST($a[i] AS DOUBLE))), (x,y) -> x+y))
       |     * sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE), list_transform(range(1, 65),
       |        i -> CAST($b[i] AS DOUBLE) * CAST($b[i] AS DOUBLE))), (x,y) -> x+y)))""".stripMargin

  /** Shared multi-table hyperplane-LSH candidate-pair CTEs (3 tables x 4
    * planes over `embeddings`) — used by q_dedup_embed_lsh and
    * q_dedup_near_apply so the bit-parity-critical bucket arithmetic has
    * exactly one SQL copy. Yields CTE `pairs(a, b)`. */
  private def lshPairsCte: String =
    s"""WITH tb AS (SELECT unnest([0, 1, 2]) AS tbl),
      |b AS (
      |  SELECT e.vec_id, tb.tbl,
      |   CAST(list_sum(list_transform(range(0, 4), pp ->
      |     CASE WHEN list_reduce(list_prepend(CAST(0 AS DOUBLE), list_transform(range(1, 65),
      |       i -> CAST(e.embedding[i] AS DOUBLE) *
      |            CAST((${h32("(tb.tbl*4+pp)||':'||(i-1)")} % 2)*2 - 1 AS DOUBLE))), (x,y) -> x+y) > 0
      |          THEN (CAST(1 AS BIGINT) << pp) ELSE 0 END)) AS BIGINT) AS bucket
      |  FROM embeddings e CROSS JOIN tb),
      |pairs AS (
      |  SELECT DISTINCT l.vec_id AS a, r.vec_id AS b
      |  FROM b l JOIN b r ON l.tbl = r.tbl AND l.bucket = r.bucket AND l.vec_id < r.vec_id)""".stripMargin

  /** Shared URL-fixture + canonicalization CTEs (mirrors Queries.urlLine →
    * CorpusRefine.canonicalizeUrl; group-free rewrites only, since
    * replacement backreference syntax differs between engines). Yields CTE
    * `canon(doc_id, url_canon)`; `body` selects from it. */
  private def urlCanonicalSql(body: String): String =
    s"""WITH u0 AS (SELECT doc_id,
      |  'HTTPS://WWW.Example' || CAST(doc_id % 5 AS VARCHAR) ||
      |  '.COM:443/Path/' || CAST(doc_id % 50 AS VARCHAR) ||
      |  CASE WHEN doc_id % 3 = 0 THEN '/?utm_source=feed&id=' || CAST(doc_id % 7 AS VARCHAR)
      |       WHEN doc_id % 3 = 1 THEN '?id=' || CAST(doc_id % 7 AS VARCHAR) || '&utm_campaign=x'
      |       ELSE '?id=' || CAST(doc_id % 7 AS VARCHAR) END ||
      |  CASE WHEN doc_id % 4 = 0 THEN '#frag' ELSE '' END AS url
      |  FROM documents),
      |nf AS (SELECT doc_id, url, regexp_replace(url, '#.*$$', '') AS nofrag FROM u0),
      |parts AS (SELECT doc_id, url,
      |  lower(regexp_extract(nofrag, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
      |  lower(regexp_extract(nofrag, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)', 1)) AS hostport,
      |  regexp_extract(nofrag, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+(.*)$$', 1) AS rest
      | FROM nf),
      |canon AS (SELECT doc_id, CASE WHEN scheme = '' OR hostport = '' THEN url ELSE scheme || '://' ||
      |  regexp_replace(CASE WHEN scheme = 'https' THEN regexp_replace(hostport, ':443$$', '')
      |                      WHEN scheme = 'http' THEN regexp_replace(hostport, ':80$$', '')
      |                      ELSE hostport END, '^www\\.', '') ||
      |  regexp_replace(regexp_replace(
      |    regexp_replace(regexp_replace(regexp_replace(rest,
      |      '&(utm_[A-Za-z0-9_]*|fbclid)=[^&]*', '', 'g'),
      |      '\\?(utm_[A-Za-z0-9_]*|fbclid)=[^&]*&', '?'),
      |      '\\?(utm_[A-Za-z0-9_]*|fbclid)=[^&]*$$', ''),
      |    '/+\\?', '?'), '/+$$', '') END AS url_canon FROM parts)
      |$body""".stripMargin

  private val shinglesSql =
    """CASE WHEN len(w) >= 3
      | THEN list_distinct(list_transform(range(1, len(w)-1), i -> w[i]||' '||w[i+1]||' '||w[i+2]))
      | ELSE [] END""".stripMargin

  val sql: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        | CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
        | CAST(sum(CAST(floor(l_extendedprice*100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_price_cents,
        | count(*) AS count_order,
        | CAST(sum(CAST(l_quantity AS BIGINT)) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avg_qty
        |FROM lineitem GROUP BY 1, 2""".stripMargin,

    "q_parse_extract" ->
      """SELECT doc_id,
        | regexp_extract(text, '^([a-z]+)', 1) AS first_word,
        | regexp_matches(text, 'spark') AS mentions_spark,
        | len(regexp_extract_all(text, 'join')) AS n_join
        |FROM documents""".stripMargin,

    "q_parse_json" ->
      """SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val
        |FROM events""".stripMargin,

    "q_normalize_coalesce" ->
      """SELECT event_id,
        | CAST(coalesce(nullif(CASE WHEN user_id % 7 = 0 THEN ''
        |   ELSE CAST(user_id AS VARCHAR) END, ''), '0') AS BIGINT) AS norm_user
        |FROM events""".stripMargin,

    "q_map_filter" ->
      """SELECT event_type, count(*) AS n_high,
        | CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k
        |FROM events
        |WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) > 50
        |GROUP BY 1""".stripMargin,

    "q_dedup_apply" ->
      // null-text rows pass through unconditionally (Dedup.dropExactDuplicates
      // semantics — md5(NULL) must not conflate distinct docs)
      """SELECT doc_id, lang, n_chars FROM documents
        |WHERE text IS NULL OR doc_id IN (
        |  SELECT min(doc_id) FROM documents WHERE text IS NOT NULL GROUP BY md5(text))""".stripMargin,

    "q_truncate_guard" ->
      """SELECT doc_id,
        | CAST(octet_length(encode(substr(text, 1, 100))) AS BIGINT) AS trunc_bytes,
        | n_chars > 450 AS is_oversize
        |FROM documents""".stripMargin,

    "q_enrich_broadcast" ->
      """SELECT coalesce(d.lang_family, 'unknown') AS lang_family,
        | count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS sum_chars
        |FROM documents
        |LEFT JOIN (VALUES ('en','germanic'),('de','germanic'),('fr','romance'),
        |                  ('es','romance'),('zh','sinitic')) AS d(lang, lang_family)
        |  USING (lang)
        |GROUP BY 1""".stripMargin,

    "q_route_explode" ->
      """SELECT doc_id,
        | unnest(CASE WHEN n_chars > 450 THEN ['deadletter']
        |   ELSE list_filter([
        |     CASE WHEN source = 'src0' THEN 'printer' END,
        |     CASE WHEN lang = 'en' OR source = 'src0' THEN 'runreveal' END,
        |     's3'], x -> x IS NOT NULL) END) AS sink
        |FROM documents""".stripMargin,

    "q_sink_counts" ->
      """SELECT sink, count(*) AS n_rows FROM (
        |  SELECT unnest(CASE WHEN n_chars > 450 THEN ['deadletter']
        |    ELSE list_filter([
        |      CASE WHEN source = 'src0' THEN 'printer' END,
        |      CASE WHEN lang = 'en' OR source = 'src0' THEN 'runreveal' END,
        |      's3'], x -> x IS NOT NULL) END) AS sink
        |  FROM documents)
        |GROUP BY 1""".stripMargin,

    "q_source_sink_counts" ->
      """SELECT source, sink, count(*) AS n_rows FROM (
        |  SELECT source, unnest(CASE WHEN n_chars > 450 THEN ['deadletter']
        |    ELSE list_filter([
        |      CASE WHEN source = 'src0' THEN 'printer' END,
        |      CASE WHEN lang = 'en' OR source = 'src0' THEN 'runreveal' END,
        |      's3'], x -> x IS NOT NULL) END) AS sink
        |  FROM documents)
        |GROUP BY 1, 2""".stripMargin,

    "q_fanin_union" ->
      """SELECT source, count(*) AS n_events, count(DISTINCT user_id) AS n_users FROM (
        |  SELECT 'ui' AS source, user_id FROM events WHERE event_type IN ('click','view')
        |  UNION ALL
        |  SELECT 'backend' AS source, user_id FROM events
        |  WHERE event_type IN ('purchase','signup','error'))
        |GROUP BY 1""".stripMargin,

    "q_deadletter" ->
      "SELECT doc_id, n_chars FROM documents WHERE n_chars > 450",

    "q_window_hourly" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
        | event_type, count(*) AS n,
        | CAST(sum(CAST(floor(value*100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_value_cents
        |FROM events GROUP BY 1, 2""".stripMargin,

    "q_sessionize" ->
      """WITH o AS (
        |  SELECT user_id, ts, value,
        |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev
        |  FROM events),
        |m AS (
        |  SELECT user_id, ts, value,
        |    CASE WHEN prev IS NULL OR ts - prev >= INTERVAL 30 MINUTE
        |         THEN 1 ELSE 0 END AS new_s
        |  FROM o),
        |s AS (
        |  SELECT user_id, ts, value,
        |    sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
        |                     ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM m)
        |SELECT user_id,
        |  strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
        |  count(*) AS n_events,
        |  CAST(sum(CAST(floor(value*100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_value_cents
        |FROM s GROUP BY user_id, sid""".stripMargin,

    "q_topk_users" ->
      """SELECT user_id, count(*) AS n_events FROM events
        |GROUP BY 1 ORDER BY n_events DESC, user_id ASC LIMIT 10""".stripMargin,

    "q_distinct" ->
      """SELECT event_type, count(DISTINCT user_id) AS n_users
        |FROM events GROUP BY 1""".stripMargin,

    "q_semi_join" ->
      """SELECT c_mktsegment, count(*) AS n_customers FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |GROUP BY 1""".stripMargin,

    "q_anti_join" ->
      """SELECT c_mktsegment, count(*) AS n_customers FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |GROUP BY 1""".stripMargin,

    "q_window_rank" ->
      """SELECT event_type, event_id, value, rn FROM (
        | SELECT event_type, event_id, value,
        |  row_number() OVER (PARTITION BY event_type ORDER BY value DESC, event_id ASC) AS rn
        | FROM events)
        |WHERE rn <= 3""".stripMargin,

    "q_rollup" ->
      """SELECT source, lang, count(*) AS n_docs
        |FROM documents GROUP BY ROLLUP (source, lang)""".stripMargin,

    "q_join_agg" ->
      """SELECT o_orderpriority,
        | CAST(sum(CAST(floor(l_extendedprice*100 + 0.5) AS BIGINT) *
        |          (100 - CAST(floor(l_discount*100 + 0.5) AS BIGINT))) AS BIGINT) AS revenue_e4,
        | count(*) AS n_items
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY 1""".stripMargin,

    "q_dedup_exact" ->
      // null digests excluded, matching Dedup.exact
      """SELECT md5(text) AS digest, min(doc_id) AS keep_id, count(*) AS n_copies
        |FROM documents WHERE text IS NOT NULL GROUP BY 1""".stripMargin,

    "q_dedup_minhash" ->
      s"""WITH words AS (
        |  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS w FROM documents
        |), sigs AS (
        |  SELECT doc_id, list_transform(range(0, 8), j ->
        |    list_min(list_transform($shinglesSql,
        |      s -> ((2*j+1) * ${h32("s")} + j*7919 + 1) % 2147483647))) AS sig
        |  FROM words
        |), ok AS (
        |  SELECT doc_id, sig FROM sigs
        |  WHERE len(sig) > 0
        |    AND NOT list_contains(list_transform(sig, x -> x IS NULL), true)
        |), banded AS (
        |  SELECT doc_id, 0 AS band, md5(array_to_string(sig[1:4], ',')) AS bkey FROM ok
        |  UNION ALL
        |  SELECT doc_id, 1 AS band, md5(array_to_string(sig[5:8], ',')) AS bkey FROM ok
        |)
        |SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
        |FROM banded l JOIN banded r
        |  ON l.band = r.band AND l.bkey = r.bkey AND l.doc_id < r.doc_id""".stripMargin,

    "q_dedup_simhash" ->
      s"""WITH hs AS (
        |  SELECT doc_id, list_transform(regexp_split_to_array(trim(text), '\\s+'),
        |    t -> ${h32("t")}) AS h
        |  FROM documents
        |), sh AS (
        |  SELECT doc_id, CAST(list_sum(list_transform(range(0, 16), i ->
        |    CASE WHEN CAST(list_sum(list_transform(h, x -> ((x >> i) & 1)*2 - 1)) AS BIGINT) > 0
        |         THEN (CAST(1 AS BIGINT) << i) ELSE 0 END)) AS BIGINT) AS simhash
        |  FROM hs)
        |SELECT simhash, count(*) AS n_docs, min(doc_id) AS min_id
        |FROM sh GROUP BY 1""".stripMargin,

    "q_dedup_simhash_near" ->
      // banded hamming multi-probe: 4-bit slices of the 16-bit simhash
      // bucket candidates; bit_count(xor) verifies exactly — both engines
      // ship integer bit_count, so the verify is portable verbatim
      s"""WITH hs AS (
        |  SELECT doc_id, list_transform(regexp_split_to_array(trim(text), '\\s+'),
        |    t -> ${h32("t")}) AS h
        |  FROM documents WHERE doc_id < 300
        |), sh AS (
        |  SELECT doc_id, CAST(list_sum(list_transform(range(0, 16), i ->
        |    CASE WHEN CAST(list_sum(list_transform(h, x -> ((x >> i) & 1)*2 - 1)) AS BIGINT) > 0
        |         THEN (CAST(1 AS BIGINT) << i) ELSE 0 END)) AS BIGINT) AS simhash
        |  FROM hs
        |), banded AS (
        |  SELECT doc_id, simhash, t.i AS band,
        |    (simhash >> (CAST(t.i AS INTEGER) * 4)) & 15 AS bkey
        |  FROM sh, range(0, 4) t(i)
        |), cand AS (
        |  SELECT DISTINCT l.doc_id AS a, r.doc_id AS b,
        |    l.simhash AS sa, r.simhash AS sb
        |  FROM banded l JOIN banded r
        |    ON l.band = r.band AND l.bkey = r.bkey AND l.doc_id < r.doc_id)
        |SELECT a, b, CAST(bit_count(xor(sa, sb)) AS INTEGER) AS hamming
        |FROM cand WHERE bit_count(xor(sa, sb)) <= 2""".stripMargin,

    "q_dedup_image" ->
      // the Spark side renders a REAL 9×8 PNG per doc (pngFromDhash),
      // decodes it back through javax.imageio, pools to the dHash grid and
      // runs the banded hamming probe; the fixture construction makes each
      // image's dHash pure arithmetic on doc_id, so the oracle rebuilds
      // the hashes directly (base bytes + flipped bits, bit 63 kept clear)
      // and replays the 8-band probe + bit_count verify in SQL
      s"""WITH dh AS (
        |  SELECT doc_id,
        |    xor(
        |      CAST(list_sum(list_transform(range(0, 8), j ->
        |        (((doc_id % 25) * 11 + j * 17 + 7)
        |          % (CASE WHEN j = 7 THEN 128 ELSE 256 END)) << (j * 8)))
        |        AS BIGINT),
        |      CAST(COALESCE(list_sum(list_transform(
        |        range(0, LEAST(doc_id // 25, 3)), k ->
        |          CAST(1 AS BIGINT) <<
        |            CAST(((doc_id // 25) * 9 + k * 13) % 63 AS INTEGER))), 0)
        |        AS BIGINT)) AS sh
        |  FROM documents WHERE doc_id < 200
        |), banded AS (
        |  SELECT doc_id, sh, t.i AS band,
        |    (sh >> (CAST(t.i AS INTEGER) * 8)) & 255 AS bkey
        |  FROM dh, range(0, 8) t(i)
        |), cand AS (
        |  SELECT DISTINCT l.doc_id AS a, r.doc_id AS b, l.sh AS sa, r.sh AS sb
        |  FROM banded l JOIN banded r
        |    ON l.band = r.band AND l.bkey = r.bkey AND l.doc_id < r.doc_id)
        |SELECT a, b, CAST(bit_count(xor(sa, sb)) AS INTEGER) AS hamming
        |FROM cand WHERE bit_count(xor(sa, sb)) <= 3""".stripMargin,

    "q_dedup_ngram" ->
      s"""WITH sh AS (
        |  SELECT doc_id, unnest($shinglesSql) AS sh FROM (
        |    SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS w
        |    FROM documents WHERE doc_id < 1500)
        |), sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
        |inter AS (
        |  SELECT a.doc_id AS a, b.doc_id AS b, count(*) AS n_common
        |  FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id GROUP BY 1, 2)
        |SELECT a, b,
        |  CAST(n_common AS DOUBLE) / CAST(sa.n + sb.n - n_common AS DOUBLE) AS jaccard
        |FROM inter
        |JOIN sizes sa ON sa.doc_id = a
        |JOIN sizes sb ON sb.doc_id = b
        |WHERE CAST(n_common AS DOUBLE) / CAST(sa.n + sb.n - n_common AS DOUBLE) >= 0.5""".stripMargin,

    "q_dedup_embed" ->
      s"""WITH a AS (SELECT vec_id AS a, embedding AS va FROM embeddings),
        |b AS (SELECT vec_id AS b, embedding AS vb FROM embeddings),
        |scored AS (
        |  SELECT a, b, ${cosSql("va", "vb")} AS cos
        |  FROM a JOIN b ON a < b)
        |SELECT a, b, cos FROM scored WHERE cos >= 0.4""".stripMargin,

    "q_ann_cosine" ->
      s"""WITH q AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings WHERE vec_id < 20),
        |c AS (SELECT vec_id AS cid, embedding AS cv FROM embeddings),
        |scored AS (
        |  SELECT qid, cid, ${cosSql("qv", "cv")} AS cos
        |  FROM q JOIN c ON qid <> cid),
        |ranked AS (SELECT qid, cid, cos,
        |  CAST(row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cid ASC) AS BIGINT) AS rnk
        | FROM scored)
        |SELECT qid, cid, cos, rnk FROM ranked WHERE rnk <= 10""".stripMargin,

    "q_ann_lsh" ->
      s"""WITH b AS (
        |  SELECT vec_id,
        |   CAST(list_sum(list_transform(range(0, 6), p ->
        |     CASE WHEN list_reduce(list_prepend(CAST(0 AS DOUBLE), list_transform(range(1, 65),
        |       i -> CAST(embedding[i] AS DOUBLE) *
        |            CAST((${h32("p||':'||(i-1)")} % 2)*2 - 1 AS DOUBLE))), (a,b) -> a+b) > 0
        |          THEN (CAST(1 AS BIGINT) << p) ELSE 0 END)) AS BIGINT) AS bucket
        |  FROM embeddings)
        |SELECT bucket, count(*) AS n_vecs, min(vec_id) AS min_vec FROM b GROUP BY 1""".stripMargin,

    "q_ann_ivf" ->
      s"""WITH cents AS (SELECT vec_id AS cell, embedding AS cvec FROM embeddings WHERE vec_id < 8),
        |cellscore AS (
        |  SELECT e.vec_id, c.cell, ${cosSql("e.embedding", "c.cvec")} AS ccos
        |  FROM embeddings e CROSS JOIN cents c),
        |ranked AS (
        |  SELECT vec_id, cell,
        |    row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cell ASC) AS r
        |  FROM cellscore),
        |corpus AS (SELECT e.vec_id AS cid, e.embedding AS cv, r.cell
        |  FROM embeddings e JOIN ranked r ON r.vec_id = e.vec_id AND r.r = 1),
        |queries AS (SELECT e.vec_id AS qid, e.embedding AS qv, r.cell
        |  FROM embeddings e JOIN ranked r ON r.vec_id = e.vec_id AND r.r <= 3
        |  WHERE e.vec_id < 10),
        |scored AS (SELECT qid, cid, ${cosSql("qv", "cv")} AS cos
        |  FROM queries JOIN corpus USING (cell) WHERE qid <> cid),
        |rq AS (SELECT qid, cid, cos,
        |  CAST(row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cid ASC) AS BIGINT) AS rnk
        |  FROM scored)
        |SELECT qid, cid, cos, rnk FROM rq WHERE rnk <= 5""".stripMargin,

    "q_dedup_embed_lsh" ->
      s"""$lshPairsCte,
        |scored AS (
        |  SELECT a, b, ${cosSql("ea.embedding", "eb.embedding")} AS cos
        |  FROM pairs JOIN embeddings ea ON ea.vec_id = a JOIN embeddings eb ON eb.vec_id = b)
        |SELECT a, b, cos FROM scored WHERE cos >= 0.4""".stripMargin,

    "q_dedup_near_apply" ->
      s"""$lshPairsCte,
        |drops AS (
        |  SELECT DISTINCT b AS drop_id FROM pairs
        |  JOIN embeddings ea ON ea.vec_id = a JOIN embeddings eb ON eb.vec_id = b
        |  WHERE ${cosSql("ea.embedding", "eb.embedding")} >= 0.4)
        |SELECT vec_id, CAST(label AS BIGINT) AS label FROM embeddings
        |WHERE vec_id NOT IN (SELECT drop_id FROM drops)""".stripMargin,

    "q_dedup_components" ->
      // transitive closure via recursive CTE: reach(node, r) = every id
      // reachable from node over the symmetric pair graph; component =
      // min reachable (same definition as min-label propagation)
      s"""${lshPairsCte.replaceFirst("^WITH ", "WITH RECURSIVE ")},
        |cand AS (
        |  SELECT a, b FROM pairs
        |  JOIN embeddings ea ON ea.vec_id = a JOIN embeddings eb ON eb.vec_id = b
        |  WHERE ${cosSql("ea.embedding", "eb.embedding")} >= 0.4),
        |sym AS (SELECT a AS src, b AS dst FROM cand
        |        UNION SELECT b, a FROM cand),
        |nodes AS (SELECT DISTINCT src AS node FROM sym),
        |reach AS (
        |  SELECT node, node AS r FROM nodes
        |  UNION
        |  SELECT reach.node, sym.dst AS r
        |  FROM reach JOIN sym ON sym.src = reach.r
        |)
        |SELECT node AS vec_id, CAST(min(r) AS BIGINT) AS component
        |FROM reach GROUP BY 1""".stripMargin,

    "q_parse_syslog" ->
      """SELECT doc_id,
        | CAST(octet_length(encode(regexp_extract(
        |   '<190>Jan  1 00:00:01 web01 nginx: ' || regexp_replace(text, '\n', ' ', 'g'),
        |   '^<[0-9]{1,3}>[A-Z][a-z]{2} [ 0-9][0-9] [0-9:]{8} \S+ \S+?: (.*)$', 1)))
        |  AS BIGINT) AS payload_bytes
        |FROM documents""".stripMargin,

    "q_lang_id" -> {
      // GENERATED from pipeline.ops.TextAnalysis.LangMarkers — the marker
      // table is the dialect-shared spec (the grok pattern); both engines
      // execute the same lists and the same first-wins tie order
      val lm = pipeline.ops.TextAnalysis.LangMarkers
      val scoreCols = lm.map { case (l, ms) =>
        val inList = ms.map(m => s"'${m.replace("'", "''")}'").mkString(",")
        s"CAST(list_sum(list_transform(w, t -> CASE WHEN t IN ($inList) THEN 1 ELSE 0 END)) AS BIGINT) AS s_$l"
      }.mkString(",\n   ")
      val g = s"greatest(${lm.map("s_" + _._1).mkString(", ")})"
      val pick = lm.map { case (l, _) =>
        s"WHEN s_$l = $g AND $g > 0 THEN '$l'"
      }.mkString("\n      ")
      s"""WITH scores AS (
        |  SELECT doc_id,
        |   $scoreCols
        |  FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS w FROM documents))
        |SELECT doc_id,
        | CASE $pick
        |      ELSE 'und' END AS lang_pred
        |FROM scores""".stripMargin
    },

    "q_quality" ->
      """WITH f AS (
        |  SELECT doc_id,
        |   CAST(len(list_filter(regexp_split_to_array(trim(text), '\s+'), t -> t != '')) AS BIGINT) AS n_tokens,
        |   CAST(length(regexp_replace(text, '[A-Za-z0-9\s\x{0080}-\x{FFFF}]', '', 'g')) AS BIGINT) AS n_punct,
        |   CAST(list_sum(list_transform(regexp_split_to_array(trim(text), '\s+'),
        |     t -> CASE WHEN t IN ('the','a','of','and') THEN 1 ELSE 0 END)) AS BIGINT) AS n_stopwords,
        |   CAST(length(text) AS BIGINT) AS n_chars2
        |  FROM documents)
        |SELECT doc_id, n_tokens, n_punct, n_stopwords,
        | CASE WHEN n_chars2 > 0 THEN CAST(n_punct AS DOUBLE)/CAST(n_chars2 AS DOUBLE) ELSE 0.0 END AS punct_ratio,
        | CASE WHEN n_tokens > 0 THEN CAST(n_stopwords AS DOUBLE)/CAST(n_tokens AS DOUBLE) ELSE 0.0 END AS stopword_ratio
        |FROM f""".stripMargin,

    "q_quality_score" ->
      // mirrors TextAnalysis.qualityScore term for term, same association
      // order — (stopOk + lenOk) + punctOk, then /3.0 — so the IEEE
      // doubles are bit-identical; list_sum of an EMPTY filtered list is
      // NULL in DuckDB (Spark's aggregate init gives 0) but every NULL
      // case is guarded by the n_tokens/n_chars > 0 branches. NULL text:
      // Spark's when(null > 0).otherwise(0.0) ratios are 0.0 (not null),
      // so the score is the deterministic constant 0.5 — the CASE WHEN
      // NULL branches here fall to ELSE 0.0 identically
      """WITH f AS (
        |  SELECT doc_id,
        |   CAST(len(list_filter(regexp_split_to_array(trim(text), '\s+'), t -> t != '')) AS BIGINT) AS n_tokens,
        |   CAST(length(regexp_replace(text, '[A-Za-z0-9\s\x{0080}-\x{FFFF}]', '', 'g')) AS BIGINT) AS n_punct,
        |   CAST(list_sum(list_transform(regexp_split_to_array(trim(text), '\s+'),
        |     t -> CASE WHEN t IN ('the','a','of','and') THEN 1 ELSE 0 END)) AS BIGINT) AS n_stop,
        |   CAST(coalesce(list_sum(list_transform(
        |     list_filter(regexp_split_to_array(trim(text), '\s+'), t -> t != ''),
        |     t -> length(t))), 0) AS BIGINT) AS sum_tok_len,
        |   CAST(length(text) AS BIGINT) AS n_chars
        |  FROM documents),
        |r AS (SELECT doc_id, n_chars,
        |   CASE WHEN n_tokens > 0 THEN CAST(n_stop AS DOUBLE)/CAST(n_tokens AS DOUBLE) ELSE 0.0 END AS stopword_ratio,
        |   CASE WHEN n_chars > 0 THEN CAST(n_punct AS DOUBLE)/CAST(n_chars AS DOUBLE) ELSE 0.0 END AS punct_ratio,
        |   CASE WHEN n_tokens > 0 THEN CAST(sum_tok_len AS DOUBLE)/CAST(n_tokens AS DOUBLE) ELSE 0.0 END AS mean_tok_len
        |  FROM f),
        |sc AS (SELECT doc_id,
        |   (least(stopword_ratio * 5.0, 1.0)
        |    + CASE WHEN mean_tok_len BETWEEN 3.0 AND 10.0 THEN 1.0 ELSE 0.5 END
        |    + (1.0 - least(punct_ratio * 4.0, 1.0))) / 3.0 AS q_score
        |  FROM r)
        |SELECT doc_id, q_score, q_score >= 0.5 AS passes_gate FROM sc""".stripMargin,

    "q_token_count" ->
      """SELECT doc_id,
        | CAST(len(list_filter(regexp_split_to_array(trim(text), '\s+'),
        |   t -> t != '')) AS BIGINT) AS ws_tokens,
        | CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]+')) AS BIGINT) AS bpe_tokens
        |FROM documents""".stripMargin,

    "q_fingerprint" ->
      s"""SELECT doc_id,
        | list_reduce(list_prepend(CAST(0 AS BIGINT),
        |   list_transform(regexp_split_to_array(trim(text), '\\s+'), t -> ${h32("t")})),
        |   (a, b) -> (a*31 + b) % 2147483647) AS fp
        |FROM documents""".stripMargin,

    "q_grok_extract" -> {
      // the SAME compiled expansion the Spark side executes (RE2 ∩ Java
      // subset); field i = capture group i
      val re = pipeline.expr.Grok.compile(Queries.grokPattern).regex
        .replace("'", "''")
      val line =
        """'ts=2026-01-01T00:00:00Z level=INFO src=' || source ||
          | ' ip=10.0.' || CAST(doc_id % 256 AS VARCHAR) ||
          | '.' || CAST((doc_id * 7) % 256 AS VARCHAR) ||
          | ' status=' || CAST(200 + doc_id % 5 AS VARCHAR) ||
          | ' bytes=' || CAST(n_chars AS VARCHAR) ||
          | ' dur=' || CAST(doc_id % 9 AS VARCHAR) ||
          | '.' || CAST(doc_id % 100 AS VARCHAR) ||
          | ' msg=' || substr(text, 1, 12)""".stripMargin
      s"""WITH lines AS (SELECT doc_id, $line AS l FROM documents)
        |SELECT doc_id,
        | regexp_extract(l, '$re', 1) AS g_ts,
        | regexp_extract(l, '$re', 2) AS g_level,
        | regexp_extract(l, '$re', 3) AS g_src,
        | regexp_extract(l, '$re', 4) AS g_ip,
        | CAST(regexp_extract(l, '$re', 5) AS INTEGER) AS g_status,
        | CAST(regexp_extract(l, '$re', 6) AS BIGINT) AS g_bytes,
        | CAST(regexp_extract(l, '$re', 7) AS DOUBLE) AS g_dur,
        | regexp_extract(l, '$re', 8) AS g_msg
        |FROM lines""".stripMargin
    },

    "q_corpus_clean" ->
      """WITH k AS (SELECT min(doc_id) AS doc_id FROM documents WHERE text IS NOT NULL GROUP BY md5(text)),
        |f AS (
        |  SELECT doc_id, lang,
        |   CAST(len(list_filter(regexp_split_to_array(trim(text), '\s+'), t -> t != '')) AS BIGINT) AS n_tokens,
        |   CAST(list_sum(list_transform(regexp_split_to_array(trim(text), '\s+'),
        |     t -> CASE WHEN t IN ('the','a','of','and') THEN 1 ELSE 0 END)) AS BIGINT) AS n_stop
        |  FROM documents
        |  WHERE lang IN ('en','de','fr') AND doc_id IN (SELECT doc_id FROM k))
        |SELECT doc_id, lang, n_tokens FROM f
        |WHERE n_tokens >= 10
        |  AND CASE WHEN n_tokens > 0
        |        THEN CAST(n_stop AS DOUBLE)/CAST(n_tokens AS DOUBLE) ELSE 0.0 END > 0""".stripMargin,

    "q_journald_fields" ->
      // the Spark side round-trips through to_json → MapType decode →
      // element_at; values are pure functions of doc columns, so the oracle
      // computes them directly (null text ⇒ MESSAGE key omitted ⇒ null
      // length, skipped by sum on both engines)
      """SELECT 'app-' || source || '.service' AS unit,
        | count(*) AS n_entries,
        | CAST(sum(length(text)) AS BIGINT) AS sum_msg_chars
        |FROM documents WHERE doc_id % 8 <= 3 GROUP BY 1""".stripMargin,

    "q_grok_httpd" -> {
      // same compiled expansion as the Spark side; field k = capture group k.
      // Fields: 1 clientip, 2 ident, 3 auth, 4 timestamp, 5 verb, 6 request,
      // 7 httpversion, 8 response, 9 bytes, 10 referrer, 11 agent.
      // bytes takes the '-' branch on doc_id%10=0: Java's non-participating
      // group is null, DuckDB's regexp_extract is '' → nullif before cast.
      val re = pipeline.expr.Grok.compile("%{COMBINEDAPACHELOG}").regex
        .replace("'", "''")
      val line =
        """'10.1.' || CAST(doc_id % 256 AS VARCHAR) ||
          | '.' || CAST((doc_id * 3) % 256 AS VARCHAR) ||
          | ' - u' || CAST(doc_id % 50 AS VARCHAR) ||
          | ' [01/Jan/2026:12:00:0' || CAST(doc_id % 10 AS VARCHAR) ||
          | ' +0000] "' || CASE WHEN doc_id % 2 = 0 THEN 'GET' ELSE 'POST' END ||
          | ' /p/' || CAST(doc_id AS VARCHAR) ||
          | ' HTTP/1.1" ' || CAST(200 + doc_id % 5 AS VARCHAR) ||
          | ' ' || CASE WHEN doc_id % 10 = 0 THEN '-' ELSE CAST(n_chars AS VARCHAR) END ||
          | ' "http://ref.example/' || CAST(doc_id % 7 AS VARCHAR) ||
          | '" "UA/' || CAST(doc_id % 3 AS VARCHAR) ||
          | ' t' || substr(regexp_replace(text, '[^A-Za-z0-9 ]', '', 'g'), 1, 8) ||
          | '"'""".stripMargin
      // the name-list regexp_extract variant: the integer-group form caps
      // at group 9, and this format has 11 capture groups. A NULL line
      // yields a NULL struct (→ all-null fields, same as Spark); every
      // non-null fixture line matches by construction, so DuckDB's
      // no-match '' struct never surfaces.
      s"""WITH lines AS (SELECT doc_id, $line AS l FROM documents),
        |g AS (SELECT doc_id, regexp_extract(l, '$re',
        |  ['clientip','ident','auth','ts','verb','request','httpversion',
        |   'response','bytes','referrer','agent']) AS s FROM lines)
        |SELECT doc_id,
        | s.clientip AS g_clientip,
        | s.auth AS g_auth,
        | s.ts AS g_ts,
        | s.verb AS g_verb,
        | s.request AS g_request,
        | s.httpversion AS g_httpversion,
        | CAST(s.response AS INTEGER) AS g_response,
        | TRY_CAST(nullif(s.bytes, '') AS BIGINT) AS g_bytes,
        | s.referrer AS g_referrer,
        | s.agent AS g_agent
        |FROM g""".stripMargin
    },

    "q_grok_multiline" ->
      // relational reformulation of the multiline joiner: mark headers by
      // the SAME continuation rule (indent / Caused by / "... N more"),
      // rec_id = running header count per source, record text = ordered
      // string_agg; then the header fields + frame count re-derive from
      // the joined text (anchored regexes — RE2's ^ is whole-string here)
      """WITH lines AS (
        |  SELECT 'app-' || CAST(doc_id % 5 AS VARCHAR) AS source,
        |    doc_id * 10 + t.i AS off,
        |    CASE WHEN t.i = 0
        |      THEN printf('com.example.Err%d: boom %d', doc_id % 7, doc_id)
        |      ELSE chr(9) || printf('at com.example.Svc%d.call(Svc.java:%d)',
        |        t.i, doc_id + t.i)
        |    END AS line
        |  FROM documents, range(0, 4) t(i)
        |  WHERE doc_id < 300 AND t.i < 1 + doc_id % 4
        |), marked AS (
        |  SELECT source, off, line,
        |    NOT (regexp_matches(line, '^[ \t]') OR line LIKE 'Caused by: %'
        |      OR regexp_matches(line, '^\.\.\. [0-9]+ more')) AS hdr
        |  FROM lines
        |), numbered AS (
        |  SELECT source, off, line, hdr,
        |    SUM(CASE WHEN hdr THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY source ORDER BY off) AS rec_id
        |  FROM marked
        |), recs AS (
        |  SELECT source, CAST(rec_id AS BIGINT) AS rec_id,
        |    MIN(off) AS first_offset, COUNT(*) AS n_lines,
        |    bool_or(hdr) AS has_header,
        |    string_agg(line, chr(10) ORDER BY off) AS rec_text
        |  FROM numbered GROUP BY 1, 2)
        |SELECT source, rec_id, first_offset, n_lines, has_header, rec_text,
        |  regexp_extract(rec_text,
        |    '^((?:[a-zA-Z$_][a-zA-Z$_0-9]*\.)+[a-zA-Z$_][a-zA-Z$_0-9]*)', 1)
        |    AS jt_exception,
        |  regexp_extract(rec_text, '^[^\n:]+:[ ]+([^\n]*)', 1) AS jt_message,
        |  CAST(length(list_filter(string_split(rec_text, chr(10)),
        |    l -> regexp_matches(l, '^[ \t]*at '))) AS INTEGER) AS n_frames
        |FROM recs""".stripMargin,

    "q_grok_postgres" -> {
      // fields in group order: 1 ts, 2 tz, 3 pid, 4 user, 5 db, 6 level,
      // 7 message. user/db nil on doc_id%3==0 → DuckDB '' → nullif
      // ('user' is reserved in DuckDB → struct field named 'usr').
      val re = pipeline.expr.Grok.compile("%{POSTGRESQLLOG}").regex
        .replace("'", "''")
      val line =
        """'2026-01-0' || CAST(doc_id % 9 + 1 AS VARCHAR) ||
          | ' 12:00:0' || CAST(doc_id % 10 AS VARCHAR) ||
          | '.' || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') ||
          | ' UTC [' || CAST(doc_id % 9000 + 1000 AS VARCHAR) || '] ' ||
          | CASE WHEN doc_id % 3 = 0 THEN ''
          |      ELSE 'u' || CAST(doc_id % 50 AS VARCHAR) ||
          |           '@db' || CAST(doc_id % 5 AS VARCHAR) || ' ' END ||
          | CASE doc_id % 4 WHEN 0 THEN 'LOG' WHEN 1 THEN 'ERROR'
          |      WHEN 2 THEN 'WARNING' ELSE 'STATEMENT' END ||
          | ':  duration: ' || CAST(doc_id % 500 AS VARCHAR) ||
          | ' ms  statement: SELECT ' || CAST(doc_id % 7 AS VARCHAR)""".stripMargin
      s"""WITH lines AS (SELECT doc_id, $line AS l FROM documents),
        |g AS (SELECT doc_id, regexp_extract(l, '$re',
        |  ['ts','tz','pid','usr','db','lvl','msg']) AS s FROM lines)
        |SELECT doc_id,
        | s.ts AS g_ts,
        | s.tz AS g_tz,
        | CAST(s.pid AS INTEGER) AS g_pid,
        | nullif(s.usr, '') AS g_user,
        | nullif(s.db, '') AS g_db,
        | s.lvl AS g_level,
        | s.msg AS g_message
        |FROM g""".stripMargin
    },

    "q_grok_haproxy" -> {
      // fields in group order: 1 client_ip, 2 client_port, 3 accept_date,
      // 4 frontend, 5 backend, 6 server, 7 tq, 8 tw, 9 tc, 10 tr, 11 tt,
      // 12 status, 13 bytes, 14 req_cookie, 15 resp_cookie, 16 term_state,
      // 17 actconn, 18 feconn, 19 beconn, 20 srvconn, 21 retries,
      // 22 srv_queue, 23 backend_queue, 24 request
      val re = pipeline.expr.Grok.compile("%{HAPROXYHTTPLINE}").regex
        .replace("'", "''")
      val line =
        """'10.4.' || CAST(doc_id % 256 AS VARCHAR) ||
          | '.' || CAST((doc_id * 11) % 256 AS VARCHAR) ||
          | ':' || CAST(40000 + doc_id % 20000 AS VARCHAR) ||
          | ' [01/Jan/2026:12:00:0' || CAST(doc_id % 10 AS VARCHAR) ||
          | '.' || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') ||
          | '] fe' || CAST(doc_id % 3 AS VARCHAR) ||
          | ' be' || CAST(doc_id % 4 AS VARCHAR) ||
          | '/srv' || CAST(doc_id % 6 AS VARCHAR) ||
          | ' ' || CAST(doc_id % 9 AS VARCHAR) ||
          | '/' || CAST(doc_id % 7 AS VARCHAR) ||
          | '/' || CAST(doc_id % 5 AS VARCHAR) ||
          | '/' || CAST(doc_id % 11 AS VARCHAR) ||
          | '/' || CAST(10 + doc_id % 90 AS VARCHAR) ||
          | ' ' || CAST(200 + doc_id % 5 AS VARCHAR) ||
          | ' ' || CAST(n_chars AS VARCHAR) ||
          | ' - - ---- ' ||
          | CAST(doc_id % 50 AS VARCHAR) ||
          | '/' || CAST(doc_id % 40 AS VARCHAR) ||
          | '/' || CAST(doc_id % 30 AS VARCHAR) ||
          | '/' || CAST(doc_id % 20 AS VARCHAR) ||
          | '/' || CAST(doc_id % 3 AS VARCHAR) ||
          | ' ' || CAST(doc_id % 8 AS VARCHAR) ||
          | '/' || CAST(doc_id % 6 AS VARCHAR) ||
          | ' "GET /h/' || CAST(doc_id AS VARCHAR) ||
          | ' t' || substr(regexp_replace(text, '[^A-Za-z0-9 ]', '', 'g'), 1, 8) ||
          | '"'""".stripMargin
      s"""WITH lines AS (SELECT doc_id, $line AS l FROM documents),
        |g AS (SELECT doc_id, regexp_extract(l, '$re',
        |  ['client_ip','client_port','accept_date','frontend','backend',
        |   'server','tq','tw','tc','tr','tt','status','bytes','req_cookie',
        |   'resp_cookie','term_state','actconn','feconn','beconn','srvconn',
        |   'retries','srv_queue','backend_queue','request']) AS s FROM lines)
        |SELECT doc_id,
        | s.client_ip AS g_client_ip,
        | CAST(s.client_port AS INTEGER) AS g_client_port,
        | s.accept_date AS g_accept_date,
        | s.frontend AS g_frontend,
        | s.backend AS g_backend,
        | s.server AS g_server,
        | CAST(s.tq AS INTEGER) AS g_tq,
        | CAST(s.tt AS INTEGER) AS g_tt,
        | CAST(s.status AS INTEGER) AS g_status,
        | CAST(s.bytes AS BIGINT) AS g_bytes,
        | s.term_state AS g_term_state,
        | CAST(s.actconn AS INTEGER) AS g_actconn,
        | CAST(s.retries AS INTEGER) AS g_retries,
        | CAST(s.srv_queue AS INTEGER) AS g_srv_queue,
        | s.request AS g_request
        |FROM g""".stripMargin
    },

    "q_grok_syslog5424" -> {
      // same compiled expansion; fields 1..9 = pri, ver, ts, host, app,
      // proc, msgid, sd, msg. proc is nil on doc_id%3==0 and sd on odd
      // doc_id: Java leaves the group null, DuckDB's name-list extract
      // yields '' — NOTSPACE/SD can never legitimately match '', so
      // nullif('') is an exact bridge.
      val re = pipeline.expr.Grok.compile("%{SYSLOG5424LINE}").regex
        .replace("'", "''")
      val line =
        """'<' || CAST(doc_id % 192 AS VARCHAR) || '>1 2026-01-01T00:00:' ||
          | lpad(CAST(doc_id % 60 AS VARCHAR), 2, '0') ||
          | 'Z host' || CAST(doc_id % 20 AS VARCHAR) ||
          | ' app' || CAST(doc_id % 5 AS VARCHAR) ||
          | ' ' || CASE WHEN doc_id % 3 = 0 THEN '-' ELSE CAST(1000 + doc_id % 100 AS VARCHAR) END ||
          | ' id' || CAST(doc_id % 9 AS VARCHAR) ||
          | ' ' || CASE WHEN doc_id % 2 = 0 THEN '[ex@32473 iut="' || CAST(doc_id % 4 AS VARCHAR) || '"]' ELSE '-' END ||
          | ' t' || substr(regexp_replace(text, '[^A-Za-z0-9 ]', '', 'g'), 1, 10)""".stripMargin
      s"""WITH lines AS (SELECT doc_id, $line AS l FROM documents),
        |g AS (SELECT doc_id, regexp_extract(l, '$re',
        |  ['pri','ver','ts','host','app','proc','msgid','sd','msg']) AS s FROM lines)
        |SELECT doc_id,
        | CAST(s.pri AS INTEGER) AS g_pri,
        | CAST(s.ver AS INTEGER) AS g_ver,
        | s.ts AS g_ts,
        | s.host AS g_host,
        | s.app AS g_app,
        | nullif(s.proc, '') AS g_proc,
        | s.msgid AS g_msgid,
        | nullif(s.sd, '') AS g_sd,
        | s.msg AS g_msg
        |FROM g""".stripMargin
    },

    "q_pii_redact" -> {
      // the SAME Java∩RE2 patterns the Spark side compiles (string-shared,
      // engine-independent execution — the grok-oracle contract)
      val (em, ph, ip) =
        (pipeline.ops.CorpusRefine.EmailRe, pipeline.ops.CorpusRefine.PhoneRe,
          pipeline.ops.CorpusRefine.Ipv4Re)
      s"""WITH lines AS (SELECT doc_id,
        |  substr(text, 1, 40) || ' contact u' || CAST(doc_id % 40 AS VARCHAR) ||
        |  '@mail.example.org or u' || CAST(doc_id % 9 AS VARCHAR) ||
        |  '@corp.example.com ip 10.3.' || CAST(doc_id % 256 AS VARCHAR) ||
        |  '.' || CAST((doc_id * 5) % 256 AS VARCHAR) ||
        |  ' tel +1-415-555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS l
        |  FROM documents),
        |r AS (SELECT doc_id, l,
        |  regexp_replace(regexp_replace(regexp_replace(l,
        |    '$em', '<EMAIL>', 'g'), '$ph', '<PHONE>', 'g'), '$ip', '<IP>', 'g') AS red
        |  FROM lines)
        |SELECT doc_id,
        | CAST(len(regexp_extract_all(l, '$em')) AS BIGINT) AS n_emails,
        | CAST(len(regexp_extract_all(l, '$ph')) AS BIGINT) AS n_phones,
        | CAST(len(regexp_extract_all(l, '$ip')) AS BIGINT) AS n_ips,
        | md5(red) AS redacted_md5,
        | CAST(length(red) AS BIGINT) AS n_redacted_chars
        |FROM r""".stripMargin
    },

    /** Shared canonicalization SQL over a `url` column (mirrors
      * CorpusRefine.canonicalizeUrl — group-free rewrites only, since
      * replacement backreference syntax differs between engines). */
    "q_url_canonical" -> urlCanonicalSql("SELECT doc_id, url_canon FROM canon"),

    "q_url_dedup" -> urlCanonicalSql(
      """SELECT url_canon, min(doc_id) AS keep_id, count(*) AS n_copies
        |FROM canon GROUP BY 1""".stripMargin),

    "q_repetition" ->
      // same narrow formulation: sorted bigrams + max run-length fold (any
      // total order groups equal bigrams contiguously, so Spark/DuckDB
      // comparator differences cannot change the run counts)
      """WITH w AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w FROM documents),
        |b AS (SELECT doc_id, w,
        |  list_sort(list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1])) AS sb
        | FROM w WHERE len(w) >= 2),
        |r AS (SELECT doc_id, w, sb,
        |  list_reduce(
        |    list_prepend({'prev': '', 'run': CAST(0 AS BIGINT), 'best': CAST(0 AS BIGINT)},
        |      list_transform(sb, x -> {'prev': x, 'run': CAST(1 AS BIGINT), 'best': CAST(1 AS BIGINT)})),
        |    (a, e) -> CASE WHEN e.prev = a.prev
        |       THEN {'prev': e.prev, 'run': a.run + 1, 'best': greatest(a.best, a.run + 1)}
        |       ELSE {'prev': e.prev, 'run': CAST(1 AS BIGINT), 'best': greatest(a.best, CAST(1 AS BIGINT))} END) AS st
        |  FROM b)
        |SELECT doc_id,
        | CAST(len(sb) AS BIGINT) AS n_bigrams,
        | st.best AS top_bigram_n,
        | CAST(st.best AS DOUBLE) / CAST(len(sb) AS DOUBLE) AS top_bigram_fraction,
        | CAST(len(list_distinct(w)) AS DOUBLE) / CAST(len(w) AS DOUBLE) AS distinct_word_ratio
        |FROM r""".stripMargin,

    "q_paragraph_dedup" ->
      // 3-word chunks; first occurrence (doc_id, pos) wins corpus-wide.
      // DuckDB zips equal-length unnests positionally → (para, pos) pairs.
      """WITH w AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w FROM documents),
        |p AS (SELECT doc_id,
        |  CASE WHEN len(w) >= 1
        |    THEN list_transform(range(0, greatest((len(w)+2)//3, 1)),
        |           i -> array_to_string(w[i*3+1:i*3+3], ' '))
        |    ELSE [] END AS ps FROM w),
        |e AS (SELECT doc_id, unnest(ps) AS para,
        |        unnest(range(1, len(ps)+1)) AS pos FROM p),
        |k AS (SELECT doc_id,
        |  row_number() OVER (PARTITION BY md5(para) ORDER BY doc_id, pos) AS rn
        | FROM e)
        |SELECT doc_id, count(*) AS n_paras,
        | CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
        |FROM k GROUP BY 1""".stripMargin,

    "q_paragraph_apply" ->
      // same chunking + first-occurrence rule as q_paragraph_dedup, then
      // per-doc reassembly in position order
      """WITH w AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w FROM documents),
        |p AS (SELECT doc_id,
        |  CASE WHEN len(w) >= 1
        |    THEN list_transform(range(0, greatest((len(w)+2)//3, 1)),
        |           i -> array_to_string(w[i*3+1:i*3+3], ' '))
        |    ELSE [] END AS ps FROM w),
        |e AS (SELECT doc_id, unnest(ps) AS para,
        |        unnest(range(1, len(ps)+1)) AS pos FROM p),
        |r AS (SELECT doc_id, pos, para,
        |  row_number() OVER (PARTITION BY md5(para) ORDER BY doc_id, pos) AS rn
        | FROM e)
        |SELECT doc_id, string_agg(para, ' ' ORDER BY pos) AS clean_text
        |FROM r WHERE rn = 1 GROUP BY 1""".stripMargin,

    "q_tfidf" ->
      // rational tf-idf: score = tf·N/df (exact integers into one IEEE
      // division — libm ln() is NOT guaranteed bit-identical across engines)
      """WITH pr AS (
        |  SELECT doc_id, term, count(*) AS tf FROM (
        |    SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS term
        |    FROM documents)
        |  WHERE term != '' GROUP BY 1, 2),
        |dfq AS (SELECT term, count(*) AS df FROM pr GROUP BY 1),
        |nq AS (SELECT count(DISTINCT doc_id) AS n_docs FROM pr),
        |sc AS (SELECT doc_id, term, tf, df,
        |  CAST(tf * n_docs AS DOUBLE) / CAST(df AS DOUBLE) AS score
        | FROM pr JOIN dfq USING (term) CROSS JOIN nq),
        |r AS (SELECT doc_id, term, tf, df, score,
        |  CAST(row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, term ASC) AS BIGINT) AS rnk
        | FROM sc)
        |SELECT doc_id, term, tf, df, score, rnk FROM r WHERE rnk <= 3""".stripMargin,

    "q_corpus_assemble" -> urlCanonicalSql(
      s"""SELECT d.doc_id, d.lang,
        | CAST(len(regexp_split_to_array(trim(d.text), '\\s+')) AS BIGINT) AS n_words
        |FROM documents d
        |JOIN (SELECT min(doc_id) AS doc_id FROM canon GROUP BY url_canon) k
        |  USING (doc_id)
        |WHERE d.lang IN ('en', 'de', 'fr')
        |  AND len(regexp_split_to_array(trim(d.text), '\\s+')) >= 2
        |  AND CAST((SELECT st.best FROM (SELECT list_reduce(
        |    list_prepend({'prev': '', 'run': CAST(0 AS BIGINT), 'best': CAST(0 AS BIGINT)},
        |      list_transform(
        |        list_sort(list_transform(range(1, len(regexp_split_to_array(trim(d.text), '\\s+'))),
        |          i -> regexp_split_to_array(trim(d.text), '\\s+')[i] || ' ' ||
        |               regexp_split_to_array(trim(d.text), '\\s+')[i+1])),
        |        x -> {'prev': x, 'run': CAST(1 AS BIGINT), 'best': CAST(1 AS BIGINT)})),
        |    (a, e) -> CASE WHEN e.prev = a.prev
        |       THEN {'prev': e.prev, 'run': a.run + 1, 'best': greatest(a.best, a.run + 1)}
        |       ELSE {'prev': e.prev, 'run': CAST(1 AS BIGINT), 'best': greatest(a.best, CAST(1 AS BIGINT))} END) AS st) t)
        |   AS DOUBLE) / CAST(len(regexp_split_to_array(trim(d.text), '\\s+')) - 1 AS DOUBLE) < 0.5
        |  AND ${h32("CAST(d.doc_id AS VARCHAR)")} % 100 <
        |    CASE WHEN d.lang = 'en' THEN 50 WHEN d.lang = 'de' THEN 30 ELSE 10 END""".stripMargin),

    "q_pack_shards" ->
      // one flat window cumsum here vs the distributed two-level prefix sum
      // on the Spark side — same values by construction
      """WITH t AS (SELECT doc_id,
        |  CAST(len(list_filter(regexp_split_to_array(trim(text), '\s+'),
        |    x -> x != '')) AS BIGINT) AS n_tokens FROM documents),
        |c AS (SELECT doc_id, n_tokens,
        |  sum(n_tokens) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS cum
        | FROM t)
        |SELECT doc_id, n_tokens,
        | CAST((cum - n_tokens) // 1000 AS BIGINT) AS shard
        |FROM c""".stripMargin,

    "q_bpe_encode" ->
      // byte-level decode∘encode is the identity on ANY text (whitespace
      // included) — the oracle pins the input itself; ids_bounded is the
      // structural 1..n_bytes envelope (BPE never emits more tokens than
      // bytes, and non-empty text emits at least one)
      """SELECT doc_id, text AS decoded, TRUE AS ids_bounded
        |FROM documents""".stripMargin,

    "q_token_shards" ->
      // the oracle derives shard boundaries from ITS OWN ws-token prefix
      // sum (the q_pack_shards arithmetic) and reassembles each shard's
      // exact text in doc order — a wrong id, merge, or shard assignment
      // on the Spark side breaks the string equality
      """WITH t AS (SELECT doc_id, text,
        |  CAST(len(list_filter(regexp_split_to_array(trim(text), '\s+'),
        |    x -> x != '')) AS BIGINT) AS n_tokens FROM documents),
        |c AS (SELECT doc_id, text, n_tokens,
        |  sum(n_tokens) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS cum
        | FROM t)
        |SELECT CAST((cum - n_tokens) // 1000 AS BIGINT) AS shard,
        |  count(*) AS n_docs,
        |  CAST(sum(n_tokens) AS BIGINT) AS sum_tokens,
        |  string_agg(text, '' ORDER BY doc_id) AS shard_text
        |FROM c GROUP BY 1""".stripMargin,

    "q_dup_spans" ->
      // positional (non-distinct) 8-token windows; a window duplicated
      // ≥2 times ANYWHERE (other docs or the same one) is a dup span.
      // DuckDB list slice ws[i:i+7] is END-INCLUSIVE (8 elements); range()
      // is end-exclusive, so windows i = 1 .. len-7
      """WITH w AS (
        |  SELECT doc_id, text, regexp_split_to_array(trim(text), '\s+') AS ws
        |  FROM documents),
        |g AS (
        |  SELECT doc_id, unnest(list_transform(range(1, len(ws) - 6),
        |    i -> array_to_string(ws[i:i+7], ' '))) AS gram
        |  FROM w WHERE text IS NOT NULL AND len(ws) >= 8),
        |occ AS (SELECT gram FROM g GROUP BY gram HAVING count(*) >= 2),
        |dup AS (
        |  SELECT doc_id, count(*) AS n_dup_grams
        |  FROM g JOIN occ USING (gram) GROUP BY 1)
        |SELECT w.doc_id,
        |  CAST(len(w.ws) - 7 AS BIGINT) AS n_grams,
        |  CAST(dup.n_dup_grams AS BIGINT) AS n_dup_grams,
        |  CAST(dup.n_dup_grams AS DOUBLE) / (len(w.ws) - 7) AS dup_frac
        |FROM w JOIN dup USING (doc_id)
        |WHERE dup.n_dup_grams > 0""".stripMargin,

    "q_dup_spans_apply" ->
      // keeper = row_number 1 ordered by (doc_id, pos) == Spark's
      // min(struct(id, pos)); covered = distinct token indices under
      // non-keeper occurrences; rewritten docs rejoin kept tokens in
      // position order, untouched docs keep byte-original text
      """WITH w AS (
        |  SELECT doc_id, text, regexp_split_to_array(trim(text), '\s+') AS ws
        |  FROM documents),
        |o AS (
        |  SELECT doc_id,
        |    generate_subscripts(list_transform(range(1, len(ws) - 6),
        |      i -> array_to_string(ws[i:i+7], ' ')), 1) - 1 AS pos,
        |    unnest(list_transform(range(1, len(ws) - 6),
        |      i -> array_to_string(ws[i:i+7], ' '))) AS gram
        |  FROM w WHERE text IS NOT NULL AND len(ws) >= 8),
        |r AS (
        |  SELECT doc_id, pos FROM (
        |    SELECT doc_id, pos,
        |      count(*) OVER (PARTITION BY gram) AS occ,
        |      row_number() OVER (PARTITION BY gram ORDER BY doc_id, pos) AS rn
        |    FROM o) WHERE occ >= 2 AND rn > 1),
        |cov AS (SELECT DISTINCT doc_id, unnest(range(pos, pos + 8)) AS tpos FROM r),
        |tk AS (
        |  SELECT doc_id, unnest(ws) AS tok,
        |    generate_subscripts(ws, 1) - 1 AS tpos
        |  FROM w WHERE doc_id IN (SELECT doc_id FROM cov)),
        |kept AS (
        |  SELECT tk.doc_id, string_agg(tok, ' ' ORDER BY tpos) AS txt
        |  FROM tk ANTI JOIN cov USING (doc_id, tpos) GROUP BY 1),
        |nrem AS (SELECT doc_id, count(*) AS n FROM cov GROUP BY 1)
        |SELECT w.doc_id,
        |  CASE WHEN nrem.n IS NOT NULL THEN COALESCE(kept.txt, '')
        |       ELSE w.text END AS text,
        |  CAST(COALESCE(nrem.n, 0) AS BIGINT) AS n_removed_tokens
        |FROM w LEFT JOIN kept USING (doc_id) LEFT JOIN nrem USING (doc_id)""".stripMargin,

    "q_pack_sequences" ->
      // rebuild the identical global token stream: per-doc portable ids +
      // EOS(-1), exclusive prefix-sum offsets in doc_id order, ALIGNED
      // unnest (unnest + generate_subscripts over the same list zip in
      // DuckDB) to global positions, then 64-chunk and CSV each full
      // sequence in position order
      s"""WITH t AS (
        |  SELECT doc_id,
        |    list_append(list_transform(
        |      list_filter(regexp_split_to_array(trim(text), '\\s+'), x -> x != ''),
        |      w -> ${h32("w")}), -1) AS ids
        |  FROM documents WHERE text IS NOT NULL),
        |c AS (
        |  SELECT doc_id, ids,
        |    COALESCE(sum(len(ids)) OVER (ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off
        |  FROM t),
        |u AS (
        |  SELECT off + generate_subscripts(ids, 1) - 1 AS pos, unnest(ids) AS id
        |  FROM c)
        |SELECT CAST(pos // 64 AS BIGINT) AS seq, count(*) AS n_ids,
        |  string_agg(CAST(id AS VARCHAR), ',' ORDER BY pos) AS ids_csv
        |FROM u GROUP BY 1 HAVING count(*) = 64""".stripMargin,

    "q_decontaminate" ->
      s"""WITH sh AS (
        |  SELECT doc_id, unnest($shinglesSql) AS sh FROM (
        |    SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS w FROM documents)
        |), bench AS (
        |  SELECT DISTINCT sh FROM sh WHERE doc_id % 50 = 0
        |), corpus AS (
        |  SELECT doc_id, sh FROM sh WHERE doc_id % 50 <> 0
        |)
        |SELECT doc_id, count(*) AS n_shared
        |FROM corpus JOIN bench USING (sh)
        |GROUP BY 1 HAVING count(*) >= 5""".stripMargin,

    "q_sample_stratified" ->
      s"""SELECT doc_id, lang FROM documents
        |WHERE ${h32("CAST(doc_id AS VARCHAR)")} % 100 <
        |  CASE WHEN lang = 'en' THEN 50 WHEN lang = 'de' THEN 30 ELSE 10 END""".stripMargin,

    "q_multimodal" ->
      """SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        | md5(text) AS digest
        |FROM documents""".stripMargin,

    "q_multimodal_image" ->
      // the Spark side ENCODES a real PNG per row and DECODES its header
      // back through javax.imageio; dims are pure functions of doc_id and
      // the magic is the fixed 8-byte PNG signature, so the oracle states
      // the expected values directly — a stubbed codec cannot reproduce
      // them from the payload
      """SELECT doc_id,
        | CAST(doc_id % 64 + 1 AS INTEGER) AS img_w,
        | CAST(doc_id % 48 + 1 AS INTEGER) AS img_h,
        | 'png' AS img_format,
        | '89504E470D0A1A0A' AS magic_hex
        |FROM documents""".stripMargin,

    "q_multimodal_audio" ->
      // same contract as q_multimodal_image: the Spark side ENCODES a real
      // PCM WAV per row and DECODES its header back through
      // javax.sound.sampled; rate/channels/frames are pure functions of
      // doc_id and the magic is the 4-byte RIFF signature
      """SELECT doc_id,
        | CAST(8000 + (doc_id % 4) * 4000 AS INTEGER) AS sample_rate,
        | CAST(doc_id % 2 + 1 AS INTEGER) AS n_channels,
        | CAST(doc_id % 100 + 50 AS BIGINT) AS n_frames,
        | CAST(floor(CAST(doc_id % 100 + 50 AS DOUBLE) * 1000.0 /
        |   CAST(8000 + (doc_id % 4) * 4000 AS DOUBLE)) AS BIGINT) AS duration_ms,
        | 'wav' AS audio_format,
        | '52494646' AS magic_hex
        |FROM documents""".stripMargin,

    "q_multimodal_video" ->
      // the Spark side ENCODES a minimal ISO-BMFF MP4 per row and DECODES
      // its container header back with the pure-byte box walk; timescale/
      // duration/dims are pure functions of doc_id and the magic is the
      // literal 'ftyp' fourcc at byte offset 4
      """SELECT doc_id,
        | 'isom' AS brand,
        | CAST(600 + (doc_id % 4) * 600 AS INTEGER) AS timescale,
        | CAST((doc_id % 500 + 100) * 6 AS BIGINT) AS duration_ticks,
        | CAST(floor(CAST((doc_id % 500 + 100) * 6 AS DOUBLE) * 1000.0 /
        |   CAST(600 + (doc_id % 4) * 600 AS DOUBLE)) AS BIGINT) AS duration_ms,
        | CAST(doc_id % 320 + 16 AS INTEGER) AS vid_w,
        | CAST(doc_id % 240 + 16 AS INTEGER) AS vid_h,
        | '66747970' AS magic_hex
        |FROM documents""".stripMargin
  )
}
