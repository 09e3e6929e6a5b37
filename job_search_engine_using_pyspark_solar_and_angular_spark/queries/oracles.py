"""DuckDB oracle SQL for every hash-checkable query in QUERIES.

Contract: column names AND types match the Spark side; float literals that are
not exactly representable are emitted via ``repr`` of the same Python
constants the Spark expressions use, so both engines parse identical doubles;
integer SUMs are cast to BIGINT (DuckDB SUM(BIGINT) -> HUGEINT otherwise).

Queries intentionally absent (rows-only check by the driver):
x4_approx_distinct (HLL), ext_ann_lsh / ext_embedding_near_dups (hyperplane
sign bits are float-order-sensitive).
"""

from __future__ import annotations

from ..operators.dedup import _MINHASH_PARAMS
from ..operators.pipeline import TOP_BIGRAM_MAX, TOP_TOKEN_MAX
from ..operators.similarity import PQ_KSUB, PQ_M, PQ_SHORTLIST
from ..operators.similarity import rademacher_plane
from ..search.bm25 import B, K1

# ---- shared SQL fragments -------------------------------------------------

# mirror of functions.text.tokenize_normalized
TOKS = (
    "list_filter(list_transform(string_split(text, ' '), "
    "t -> regexp_replace(lower(t), '[^a-z0-9]', '', 'g')), t -> t <> '')"
)

STOP_SQL = "('the', 'a', 'of', 'and', 'to')"
EN_PROFILE_SQL = "('the', 'and', 'of', 'to', 'a', 'in', 'is', 'that')"


def md5long(expr: str) -> str:
    """mirror of functions.hashing.md5_long (15 hex chars -> int64)."""
    return f"CAST(CONCAT('0x', substr(md5({expr}), 1, 15)) AS BIGINT)"


MERSENNE_61 = (1 << 61) - 1

# shingle hash CTEs shared by the MinHash family (3-gram shingles)
_SHINGLE_CTES = f"""
toks AS (SELECT doc_id, {TOKS} AS tk FROM documents),
grams AS (
  SELECT doc_id, array_to_string(tk[i:i+2], ' ') AS sh FROM (
    SELECT doc_id, tk, unnest(generate_series(1, len(tk) - 2)) AS i FROM toks)
),
hashes AS (SELECT DISTINCT doc_id, {md5long('sh')} AS h FROM grams)
"""


def _minhash_sig_cte(num_perm: int = 16) -> str:
    mins = ", ".join(
        f"MIN(({a} * (h % 2147483647) + {b}) % {MERSENNE_61}) AS m{i}"
        for i, (a, b) in enumerate(_MINHASH_PARAMS[:num_perm])
    )
    return f"sigs AS (SELECT doc_id, {mins} FROM hashes GROUP BY doc_id)"


def _band_cte(num_perm: int = 16, bands: int = 4) -> str:
    rpb = num_perm // bands
    parts = []
    for bidx in range(bands):
        cols = [f"m{bidx * rpb + j}" for j in range(rpb)]
        key = " || '_' || ".join(f"CAST({c} AS VARCHAR)" for c in cols)
        parts.append(f"SELECT doc_id, {bidx} AS band, {key} AS bk FROM sigs")
    return "bands AS (" + " UNION ALL ".join(parts) + ")"


_PAIRS_CTE = (
    "pairs AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b "
    "FROM bands a JOIN bands b ON a.band = b.band AND a.bk = b.bk "
    "AND a.doc_id < b.doc_id)"
)

# ---- the oracle dict ------------------------------------------------------

ORACLES: dict[str, str] = {}

ORACLES["q01_scan_project"] = (
    "SELECT doc_id, lang AS language, CAST(n_chars AS VARCHAR) AS n_chars_s "
    "FROM documents ORDER BY doc_id"
)

ORACLES["q02_filter"] = (
    "SELECT event_id, user_id, ROUND(value, 2) AS v FROM events "
    "WHERE event_type = 'purchase' AND value > 100 ORDER BY event_id"
)

ORACLES["q03_anti_join"] = (
    "SELECT o_orderkey FROM orders o WHERE NOT EXISTS ("
    "SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey "
    "AND l.l_returnflag = 'R') ORDER BY o_orderkey"
)

ORACLES["q04_semi_join"] = (
    "SELECT o_orderkey FROM orders o WHERE EXISTS ("
    "SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey "
    "AND c.c_mktsegment = 'BUILDING') ORDER BY o_orderkey"
)

ORACLES["q05_regex_filter"] = (
    "SELECT doc_id FROM documents WHERE regexp_matches(lower(text), "
    "'hash join|merge (join|part)|stream.*window') ORDER BY doc_id"
)

ORACLES["q06_clean_chain"] = (
    "SELECT doc_id, trim(regexp_replace(regexp_replace(lower(text), "
    "'[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g')) AS ct "
    "FROM documents WHERE lang = 'en' ORDER BY doc_id"
)

ORACLES["q07_ts_trunc"] = (
    "SELECT event_id, strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS h "
    "FROM events WHERE event_type = 'signup' ORDER BY event_id"
)

ORACLES["q08_latest_wins"] = (
    "SELECT user_id, event_id, event_type FROM ("
    "SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, "
    "event_id DESC) AS rn FROM events) WHERE rn = 1 ORDER BY user_id"
)

ORACLES["q09_split_union_dedup"] = (
    "WITH tagged AS ("
    "SELECT event_id, user_id, ts, 'E' AS tag FROM events WHERE event_type = 'error' "
    "UNION ALL "
    "SELECT event_id, user_id, ts, 'P' AS tag FROM events WHERE event_type = 'purchase') "
    "SELECT event_id, user_id, tag FROM ("
    "SELECT *, row_number() OVER (PARTITION BY event_id ORDER BY ts DESC) AS rn "
    "FROM tagged) WHERE rn = 1 ORDER BY event_id"
)

ORACLES["q10_group_having"] = (
    "SELECT user_id, COUNT(*) AS c FROM events GROUP BY user_id "
    "HAVING COUNT(*) > 20 ORDER BY user_id"
)

ORACLES["q11_agg_tpch_q1"] = (
    "SELECT l_returnflag, l_linestatus, ROUND(SUM(l_quantity), 2) AS sum_qty, "
    "ROUND(SUM(l_extendedprice), 2) AS sum_price, ROUND(AVG(l_discount), 4) AS avg_disc, "
    "COUNT(*) AS cnt FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02' "
    "GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus"
)

ORACLES["q12_broadcast_join"] = (
    "SELECT l.l_orderkey, l.l_linenumber, p.p_brand FROM lineitem l "
    "JOIN part p ON l.l_partkey = p.p_partkey WHERE p.p_size = 10 "
    "ORDER BY l.l_orderkey, l.l_linenumber"
)

ORACLES["q13_point_join"] = (
    "SELECT e.event_id, c.c_name FROM events e JOIN customer c "
    "ON e.user_id = c.c_custkey WHERE e.event_type = 'purchase' ORDER BY e.event_id"
)

ORACLES["q14_topk"] = (
    "SELECT doc_id, n_chars FROM documents ORDER BY n_chars DESC, doc_id LIMIT 10"
)

ORACLES["q15_user_listing"] = (
    "SELECT event_id, event_type FROM events "
    "WHERE user_id = (SELECT MIN(user_id) FROM events) "
    "ORDER BY ts DESC, event_id LIMIT 1000"
)

ORACLES["q16_posexplode"] = (
    "SELECT vec_id, CAST(pos AS BIGINT) AS pos, ROUND(CAST(val AS DOUBLE), 4) + 0.0 AS val "
    "FROM (SELECT vec_id, unnest(embedding) AS val, "
    "generate_subscripts(embedding, 1) - 1 AS pos FROM embeddings WHERE vec_id < 5) u "
    "ORDER BY vec_id, pos"
)

ORACLES["q17_wordcount_topk"] = (
    "SELECT word, COUNT(*) AS c FROM (SELECT unnest(string_split(text, ' ')) AS word "
    "FROM documents WHERE lang = 'en') GROUP BY word ORDER BY c DESC, word LIMIT 20"
)

ORACLES["q18_normalized_wordcount"] = (
    f"SELECT word, COUNT(*) AS c FROM (SELECT unnest({TOKS}) AS word "
    f"FROM documents WHERE lang = 'en') "
    f"WHERE word NOT IN {STOP_SQL} AND length(word) > 1 "
    "GROUP BY word ORDER BY c DESC, word LIMIT 20"
)

ORACLES["q19_grouped_concat"] = (
    "SELECT lang, string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) AS ids "
    "FROM documents GROUP BY lang ORDER BY lang"
)

def _bm25_ranked(terms: tuple[str, str]) -> str:
    """The q20 BM25 chain parametrized by the query terms — one definition
    for q20 itself and every retrieval-eval leg, so the ranking SQL can
    never drift between the search query and its metrics."""
    tl = ", ".join(f"'{t}'" for t in terms)
    return f"""
WITH toks AS (SELECT doc_id, unnest({TOKS}) AS token FROM documents),
postings AS (SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS tf
             FROM toks GROUP BY doc_id, token),
dlen AS (SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS dl FROM postings GROUP BY doc_id),
stats AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, AVG(CAST(dl AS DOUBLE)) AS avgdl FROM dlen),
dfreq AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS df FROM postings
          WHERE token IN ({tl}) GROUP BY token),
scores AS (
  SELECT p.doc_id,
         SUM( ln(1.0 + (s.n - d.df + 0.5) / (d.df + 0.5)) * p.tf * {K1 + 1.0!r}
              / (p.tf + {K1!r} * (1.0 - {B!r} + {B!r} * l.dl / s.avgdl)) ) AS raw
  FROM postings p
  JOIN dfreq d ON p.token = d.token
  JOIN dlen l ON l.doc_id = p.doc_id
  CROSS JOIN stats s
  GROUP BY p.doc_id)
SELECT doc_id, ROUND(raw, 4) AS score FROM scores
ORDER BY score DESC, doc_id LIMIT 10
"""


ORACLES["q20_bm25_search"] = _bm25_ranked(("spark", "join"))



ORACLES["q21_array_contains"] = (
    "SELECT doc_id FROM documents WHERE list_contains(string_split(text, ' '), "
    "'spark') ORDER BY doc_id"
)

ORACLES["q22_json_extract"] = (
    "SELECT event_id, CAST(json_extract_string(props, '$.k') AS INT) AS k "
    "FROM events ORDER BY event_id"
)

ORACLES["q23_tumbling_window"] = (
    "SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS w, event_type, "
    "COUNT(*) AS n, ROUND(SUM(value), 2) AS sum_value FROM events "
    "GROUP BY 1, 2 ORDER BY 1, 2"
)

ORACLES["q24_user_search"] = (
    "SELECT e.event_id, e.event_type, c.c_name FROM events e "
    "JOIN customer c ON e.user_id = c.c_custkey "
    "WHERE c.c_name = 'Customer#000000001' "
    "ORDER BY e.ts DESC, e.event_id LIMIT 1000"
)

ORACLES["sql_frontdoor"] = (
    "SELECT lang, COUNT(*) AS n_docs, CAST(MAX(n_chars) AS BIGINT) AS max_chars "
    "FROM documents GROUP BY lang ORDER BY lang"
)

# ---- extensions -----------------------------------------------------------

ORACLES["x1_dedup_stats"] = (
    "SELECT COUNT(*) AS n_rows, COUNT(DISTINCT md5(text)) AS n_distinct FROM documents"
)

ORACLES["x1b_dup_groups"] = (
    "SELECT MIN(doc_id) AS min_doc_id, COUNT(*) AS cnt FROM documents "
    "GROUP BY md5(text) HAVING COUNT(*) > 1 ORDER BY min_doc_id"
)

ORACLES["x2_cosine_topk"] = (
    "SELECT e.vec_id, ROUND(list_cosine_similarity("
    "CAST(e.embedding AS DOUBLE[]), CAST(q.embedding AS DOUBLE[])), 4) + 0.0 AS sim "
    "FROM embeddings e, (SELECT embedding FROM embeddings WHERE vec_id = 0) q "
    "WHERE e.vec_id <> 0 ORDER BY sim DESC, e.vec_id LIMIT 5"
)

ORACLES["x3_corpus_stats"] = (
    "SELECT lang, COUNT(*) AS n_docs, ROUND(AVG(CAST(n_chars AS DOUBLE)), 2) AS avg_chars, "
    "MIN(n_chars) AS min_chars, MAX(n_chars) AS max_chars "
    "FROM documents GROUP BY lang ORDER BY lang"
)

ORACLES["ext_token_counts"] = (
    "SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_ws, "
    r"CAST(len(regexp_extract_all(text, '(\w+|[^\w\s])', 1)) AS BIGINT) AS n_bpe "
    "FROM documents ORDER BY doc_id"
)

_LANG_PROFILES_SQL = {
    "en": EN_PROFILE_SQL,
    "es": "('el', 'la', 'de', 'que', 'y', 'en', 'un', 'los')",
    "de": "('der', 'die', 'und', 'das', 'ist', 'von', 'ein', 'mit')",
    "fr": "('le', 'la', 'de', 'et', 'les', 'des', 'un', 'est')",
}

ORACLES["ext_lang_id"] = (
    "WITH toks AS (SELECT doc_id, " + TOKS + " AS tk FROM documents), "
    "scores AS ("
    + " UNION ALL ".join(
        f"SELECT doc_id, '{lang}' AS plang, "
        f"len(list_filter(tk, t -> t IN {words})) AS hits FROM toks"
        for lang, words in _LANG_PROFILES_SQL.items()
    )
    + "), ranked AS (SELECT doc_id, plang, hits, row_number() OVER ("
    "PARTITION BY doc_id ORDER BY hits DESC, plang DESC) AS rn FROM scores) "
    "SELECT doc_id, CASE WHEN hits > 0 THEN plang ELSE 'und' END AS lang_pred "
    "FROM ranked WHERE rn = 1 ORDER BY doc_id"
)

ORACLES["ext_quality"] = f"""
WITH feat AS (
  SELECT doc_id,
         length(text) AS n_chars,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
         len(list_filter({TOKS}, t -> t IN {EN_PROFILE_SQL})) AS n_stop,
         length(regexp_replace(text, '[\\w\\s]', '', 'g')) AS n_punct
  FROM documents),
ratios AS (
  SELECT doc_id, n_tokens,
         CASE WHEN n_chars > 0 THEN CAST(n_punct AS DOUBLE) / n_chars ELSE 0.0 END AS pr,
         CASE WHEN n_tokens > 0 THEN CAST(n_stop AS DOUBLE) / n_tokens ELSE 0.0 END AS sr
  FROM feat)
SELECT doc_id, n_tokens, ROUND(pr, 4) AS punct_ratio, ROUND(sr, 4) AS stopword_ratio,
       ROUND(GREATEST(LEAST(
         (CASE WHEN n_tokens >= 5 AND n_tokens <= 100000 THEN 0.5 ELSE 0.0 END)
         + LEAST(sr * 2.0, 0.5) - LEAST(pr * 2.0, 0.25), 1.0), 0.0), 4) AS quality
FROM ratios ORDER BY doc_id
"""

_FP_EXPR = md5long("array_to_string(" + TOKS + ", ' ')")
ORACLES["ext_fingerprint"] = (
    f"SELECT doc_id, {_FP_EXPR} AS fp FROM documents ORDER BY doc_id"
)

ORACLES["ext_winnow_fp"] = f"""
WITH ct AS (
  SELECT doc_id, trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),
                                     ' +', ' ', 'g')) AS c
  FROM documents),
grams AS (
  SELECT doc_id, i - 1 AS pos, {md5long('substr(c, i, 8)')} AS h FROM (
    SELECT doc_id, c, unnest(generate_series(1, length(c) - 7)) AS i FROM ct)
)
, garr AS (
  SELECT doc_id, list(h ORDER BY pos) AS hs FROM grams GROUP BY doc_id
)
SELECT DISTINCT doc_id, CAST(fp AS BIGINT) AS fp FROM (
  SELECT doc_id, unnest(list_transform(
    generate_series(1, greatest(len(hs) - 3, 1)),
    i -> list_min(hs[i:i+3]))) AS fp
  FROM garr WHERE len(hs) > 0)
ORDER BY doc_id, fp
"""

ORACLES["ext_simhash"] = f"""
WITH toks AS (SELECT doc_id, unnest({TOKS}) AS token FROM documents),
tf AS (SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS tf, {md5long('token')} AS h
       FROM toks GROUP BY doc_id, token),
bitsum AS (
  SELECT doc_id, b.bit,
         CAST(SUM(CASE WHEN (h >> b.bit) & 1 = 1 THEN tf ELSE -tf END) AS BIGINT) AS s
  FROM tf, generate_series(0, 31) b(bit) GROUP BY doc_id, b.bit)
SELECT doc_id,
       CAST(SUM(CASE WHEN s > 0 THEN (CAST(1 AS BIGINT) << bit) ELSE 0 END) AS BIGINT) AS simhash
FROM bitsum GROUP BY doc_id ORDER BY doc_id
"""

ORACLES["ext_minhash_signatures"] = (
    f"WITH {_SHINGLE_CTES}, {_minhash_sig_cte()} "
    + "SELECT doc_id, CAST(perm AS BIGINT) AS perm, minhash FROM ("
    + " UNION ALL ".join(
        f"SELECT doc_id, {i} AS perm, m{i} AS minhash FROM sigs" for i in range(16)
    )
    + ") ORDER BY doc_id, perm"
)

ORACLES["ext_minhash_candidates"] = (
    f"WITH {_SHINGLE_CTES}, {_minhash_sig_cte()}, {_band_cte()}, {_PAIRS_CTE} "
    "SELECT doc_a, doc_b FROM pairs ORDER BY doc_a, doc_b"
)

ORACLES["ext_ngram_jaccard"] = f"""
WITH {_SHINGLE_CTES}, {_minhash_sig_cte()}, {_band_cte()}, {_PAIRS_CTE},
sizes AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_sh FROM hashes GROUP BY doc_id),
inter AS (
  SELECT p.doc_a, p.doc_b, CAST(COUNT(*) AS BIGINT) AS n_inter
  FROM pairs p
  JOIN hashes ha ON ha.doc_id = p.doc_a
  JOIN hashes hb ON hb.doc_id = p.doc_b AND hb.h = ha.h
  GROUP BY p.doc_a, p.doc_b)
SELECT i.doc_a, i.doc_b,
       ROUND(CAST(n_inter AS DOUBLE) / CAST(sa.n_sh + sb.n_sh - n_inter AS DOUBLE), 4) AS jaccard
FROM inter i
JOIN sizes sa ON sa.doc_id = i.doc_a
JOIN sizes sb ON sb.doc_id = i.doc_b
ORDER BY i.doc_a, i.doc_b
"""

ORACLES["ext_simhash_near_dups"] = f"""
WITH toks AS (SELECT doc_id, unnest({TOKS}) AS token FROM documents),
tf AS (SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS tf, {md5long('token')} AS h
       FROM toks GROUP BY doc_id, token),
bitsum AS (
  SELECT doc_id, b.bit,
         CAST(SUM(CASE WHEN (h >> b.bit) & 1 = 1 THEN tf ELSE -tf END) AS BIGINT) AS s
  FROM tf, generate_series(0, 31) b(bit) GROUP BY doc_id, b.bit),
sh AS (
  SELECT doc_id,
         CAST(SUM(CASE WHEN s > 0 THEN (CAST(1 AS BIGINT) << bit) ELSE 0 END) AS BIGINT) AS simhash
  FROM bitsum GROUP BY doc_id),
chunked AS (
  SELECT doc_id, simhash, b.blk AS block, (simhash >> (b.blk * 8)) & 255 AS chunk
  FROM sh, generate_series(0, 3) b(blk)),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
         a.simhash AS sa, b.simhash AS sb
  FROM chunked a JOIN chunked b
    ON a.block = b.block AND a.chunk = b.chunk AND a.doc_id < b.doc_id)
SELECT doc_a, doc_b, CAST(bit_count(xor(sa, sb)) AS INT) AS hamming
FROM cand WHERE bit_count(xor(sa, sb)) <= 6 ORDER BY doc_a, doc_b
"""

ORACLES["ext_pagination"] = (
    "SELECT event_id, event_type FROM events "
    "ORDER BY ts, event_id LIMIT 20 OFFSET 40"
)

ORACLES["ext_arrays_zip"] = (
    "SELECT vec_id, CAST(i - 1 AS BIGINT) AS pos, "
    "ROUND(CAST(embedding[i] AS DOUBLE) * CAST(embedding[i + 32] AS DOUBLE), 4) + 0.0 AS prod "
    "FROM embeddings, generate_series(1, 32) g(i) WHERE vec_id < 3 "
    "ORDER BY vec_id, pos"
)


def _lemma_values_sql() -> str:
    from .extensions import LEMMA_MAP

    return ", ".join(f"('{k}', '{v}')" for k, v in LEMMA_MAP.items())


ORACLES["ext_lemmatize"] = (
    f"WITH toks AS (SELECT doc_id, {TOKS} AS tk FROM documents WHERE doc_id < 50), "
    "ex AS (SELECT doc_id, i - 1 AS pos, tk[i] AS token FROM "
    "(SELECT doc_id, tk, unnest(generate_series(1, len(tk))) AS i FROM toks)), "
    f"lm(token, lemma) AS (VALUES {_lemma_values_sql()}) "
    "SELECT ex.doc_id, CAST(ex.pos AS BIGINT) AS pos, "
    "COALESCE(lm.lemma, ex.token) AS lemma "
    "FROM ex LEFT JOIN lm ON ex.token = lm.token ORDER BY doc_id, pos"
)

def _spell_dict_values_sql() -> str:
    from .extensions import SPELL_DICT

    pairs = set()
    for w in SPELL_DICT:
        pairs.add((w, w))
        for i in range(len(w)):
            pairs.add((w[:i] + w[i + 1 :], w))
    return ", ".join(f"('{k}', '{v}')" for k, v in sorted(pairs))


ORACLES["ext_spell_correct"] = (
    f"WITH toks AS (SELECT doc_id, {TOKS} AS tk FROM documents WHERE doc_id < 50), "
    "ex AS (SELECT doc_id, i - 1 AS pos, tk[i] AS token FROM "
    "(SELECT doc_id, tk, unnest(generate_series(1, len(tk))) AS i FROM toks)), "
    "vocab AS (SELECT DISTINCT token FROM ex), "
    "keys AS (SELECT token, unnest(list_append(list_transform("
    "generate_series(1, length(token)), "
    "i -> substr(token, 1, i - 1) || substr(token, i + 1)), token)) AS dkey "
    "FROM vocab), "
    f"dict(dkey, word) AS (VALUES {_spell_dict_values_sql()}), "
    "cands AS (SELECT DISTINCT token, word FROM keys JOIN dict USING (dkey)), "
    "scored AS (SELECT token, word, levenshtein(token, word) AS dist "
    "FROM cands WHERE levenshtein(token, word) <= 1), "
    "best AS (SELECT token, word AS corrected FROM "
    "(SELECT token, word, row_number() OVER "
    "(PARTITION BY token ORDER BY dist, word) AS rn FROM scored) WHERE rn = 1) "
    "SELECT ex.doc_id, CAST(ex.pos AS BIGINT) AS pos, ex.token, "
    "COALESCE(best.corrected, ex.token) AS corrected "
    "FROM ex LEFT JOIN best USING (token) ORDER BY doc_id, pos"
)


def _pos_tag_values_sql() -> str:
    from .extensions import POS_TAG_MAP

    return ", ".join(f"('{k}', '{v}')" for k, v in POS_TAG_MAP.items())


ORACLES["ext_pos_tag"] = (
    f"WITH toks AS (SELECT doc_id, {TOKS} AS tk FROM documents WHERE doc_id < 50), "
    "ex AS (SELECT doc_id, i - 1 AS pos, tk[i] AS token FROM "
    "(SELECT doc_id, tk, unnest(generate_series(1, len(tk))) AS i FROM toks)), "
    f"tm(token, dtag) AS (VALUES {_pos_tag_values_sql()}), "
    "tagged AS (SELECT ex.doc_id, CAST(ex.pos AS BIGINT) AS pos, ex.token, "
    "COALESCE(tm.dtag, CASE WHEN regexp_matches(ex.token, '^[0-9]+$') THEN 'NUM' "
    "WHEN ex.token LIKE '%ly' THEN 'ADV' "
    "WHEN ex.token LIKE '%ing' OR ex.token LIKE '%ed' THEN 'VERB' "
    "ELSE 'NOUN' END) AS tag "
    "FROM ex LEFT JOIN tm ON ex.token = tm.token) "
    "SELECT doc_id, pos, token, tag FROM tagged "
    "WHERE tag IN ('NOUN', 'ADJ') ORDER BY doc_id, pos"
)

ORACLES["ext_rollup"] = (
    "SELECT event_type, h, COUNT(*) AS n, ROUND(SUM(value), 2) AS sum_value "
    "FROM (SELECT event_type, strftime(date_trunc('hour', ts), "
    "'%Y-%m-%d %H:%M:%S') AS h, value FROM events) "
    "GROUP BY ROLLUP(event_type, h) ORDER BY event_type, h"
)

ORACLES["ext_tpch_q3"] = """
SELECT l.l_orderkey AS l_orderkey,
       ROUND(SUM(l.l_extendedprice * (1.0 - l.l_discount)), 2) AS revenue,
       strftime(o.o_orderdate, '%Y-%m-%d %H:%M:%S') AS o_orderdate,
       o.o_orderpriority AS o_orderpriority
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
  AND l.l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""

ORACLES["ext_pivot"] = (
    "SELECT user_id, "
    + ", ".join(
        f"CAST(COUNT(*) FILTER (WHERE event_type = '{t}') AS BIGINT) AS n_{t}"
        for t in ["click", "view", "purchase", "signup", "error"]
    )
    + " FROM events GROUP BY user_id ORDER BY user_id"
)

ORACLES["ext_gap_fill"] = """
WITH e AS (SELECT * FROM events WHERE user_id < 20),
spans AS (SELECT user_id, date_trunc('hour', MIN(ts)) AS h0,
                 date_trunc('hour', MAX(ts)) AS h1 FROM e GROUP BY user_id),
hours AS (SELECT user_id, unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h
          FROM spans),
counts AS (SELECT user_id, date_trunc('hour', ts) AS h,
                  CAST(COUNT(*) AS BIGINT) AS n FROM e GROUP BY 1, 2)
SELECT hours.user_id, strftime(hours.h, '%Y-%m-%d %H:%M:%S') AS hour,
       COALESCE(counts.n, 0) AS n
FROM hours LEFT JOIN counts ON hours.user_id = counts.user_id AND hours.h = counts.h
ORDER BY hours.user_id, hour
"""

ORACLES["ext_funnel"] = """
WITH s AS (SELECT user_id, MIN(ts) AS signup_ts FROM events
           WHERE event_type = 'signup' GROUP BY user_id),
p AS (SELECT e.user_id, MIN(e.ts) AS purchase_ts
      FROM events e JOIN s ON e.user_id = s.user_id AND e.ts >= s.signup_ts
      WHERE e.event_type = 'purchase' GROUP BY e.user_id)
SELECT s.user_id,
       strftime(s.signup_ts, '%Y-%m-%d %H:%M:%S') AS signup_ts,
       strftime(p.purchase_ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
       CAST(CASE WHEN p.purchase_ts <= s.signup_ts + INTERVAL 24 HOUR
                 THEN 1 ELSE 0 END AS BIGINT) AS converted
FROM s LEFT JOIN p ON s.user_id = p.user_id
ORDER BY s.user_id
"""

ORACLES["ext_percentile"] = """
SELECT event_type,
       ROUND(quantile_cont(value, 0.5), 2) AS p50,
       ROUND(quantile_cont(value, 0.9), 2) AS p90,
       CAST(COUNT(*) AS BIGINT) AS n
FROM events GROUP BY event_type ORDER BY event_type
"""

ORACLES["ext_search_e2e"] = f"""
WITH toks AS (SELECT doc_id, unnest({TOKS}) AS token FROM documents),
postings AS (SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS tf
             FROM toks GROUP BY doc_id, token),
dlen AS (SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS dl FROM postings GROUP BY doc_id),
stats AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, AVG(CAST(dl AS DOUBLE)) AS avgdl FROM dlen),
dfreq AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS df FROM postings
          WHERE token IN ('spark', 'join') GROUP BY token),
scores AS (
  SELECT p.doc_id,
         SUM( ln(1.0 + (s.n - d.df + 0.5) / (d.df + 0.5)) * p.tf * {K1 + 1.0!r}
              / (p.tf + {K1!r} * (1.0 - {B!r} + {B!r} * l.dl / s.avgdl)) ) AS raw
  FROM postings p
  JOIN dfreq d ON p.token = d.token
  JOIN dlen l ON l.doc_id = p.doc_id
  CROSS JOIN stats s
  GROUP BY p.doc_id),
topk AS (SELECT doc_id, ROUND(raw, 4) AS score FROM scores
         ORDER BY score DESC, doc_id LIMIT 10)
SELECT t.doc_id, t.score, d.lang, c.c_name
FROM topk t
JOIN documents d ON d.doc_id = t.doc_id
JOIN customer c ON c.c_custkey = (t.doc_id % 100) + 1
ORDER BY t.score DESC, t.doc_id
"""

ORACLES["ext_asof_join"] = """
WITH p AS (SELECT user_id, ts, event_id FROM events WHERE event_type = 'purchase'),
s AS (SELECT user_id, ts, ROUND(MAX(value), 2) AS signup_value
      FROM events WHERE event_type = 'signup' GROUP BY user_id, ts)
SELECT p.event_id, p.user_id, s.signup_value
FROM p ASOF LEFT JOIN s ON p.user_id = s.user_id AND p.ts >= s.ts
ORDER BY p.event_id
"""

ORACLES["ext_range_join"] = (
    "WITH r(lo, hi, bucket) AS (VALUES "
    "(0.0, 50.0, 'low'), (50.0, 150.0, 'mid'), (150.0, 1000000000.0, 'high')) "
    "SELECT e.event_id, r.bucket FROM events e "
    "LEFT JOIN r ON e.value >= r.lo AND e.value < r.hi ORDER BY e.event_id"
)

# gap computed on floor(epoch) in BOTH engines: Spark's timestamp->long cast
# truncates to whole seconds; DuckDB's epoch() keeps fractions.
ORACLES["ext_sessionize"] = """
WITH marked AS (
  SELECT user_id, ts,
         CASE WHEN LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                OR CAST(FLOOR(epoch(ts)) AS BIGINT)
                   - CAST(FLOOR(epoch(LAG(ts) OVER (PARTITION BY user_id ORDER BY ts))) AS BIGINT) > 1800
              THEN 1 ELSE 0 END AS new_s
  FROM events),
sess AS (
  SELECT user_id, ts, SUM(new_s) OVER (
    PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS session_idx
  FROM marked)
SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
       COUNT(*) AS n_events,
       strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS s_start,
       strftime(MAX(ts), '%Y-%m-%d %H:%M:%S') AS s_end
FROM sess GROUP BY user_id, session_idx ORDER BY user_id, session_idx
"""

ORACLES["ext_cube"] = (
    "SELECT event_type, ub, COUNT(*) AS n FROM "
    "(SELECT event_type, CAST(user_id % 4 AS BIGINT) AS ub FROM events) "
    "GROUP BY CUBE(event_type, ub) ORDER BY event_type, ub"
)

ORACLES["ext_intersect"] = (
    "SELECT doc_id FROM documents WHERE list_contains(string_split(text, ' '), 'spark') "
    "INTERSECT "
    "SELECT doc_id FROM documents WHERE list_contains(string_split(text, ' '), 'join') "
    "ORDER BY doc_id"
)

ORACLES["ext_except"] = (
    "SELECT doc_id FROM documents WHERE list_contains(string_split(text, ' '), 'spark') "
    "EXCEPT "
    "SELECT doc_id FROM documents WHERE list_contains(string_split(text, ' '), 'join') "
    "ORDER BY doc_id"
)

ORACLES["ext_window_analytics"] = (
    "SELECT event_id, user_id, "
    "ROUND(LAG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id), 2) AS prev_value, "
    "ROUND(SUM(value) OVER (PARTITION BY user_id ORDER BY ts, event_id "
    "ROWS UNBOUNDED PRECEDING), 2) AS running_value, "
    "CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS INT) AS rn "
    "FROM events WHERE user_id < 100 ORDER BY user_id, rn"
)

# mirrors sources/synthetic.py construction field-by-field; branch routing
# (original/retweet/quoted) only changes WHERE each field is read from in the
# nested input, so the oracle states values directly.
ORACLES["ext_preprocess_pipeline"] = """
WITH obs AS (
  SELECT doc_id, text, 0 AS re FROM documents
  UNION ALL
  SELECT doc_id, text, 1 FROM documents WHERE doc_id % 7 = 0 AND doc_id % 3 <> 0
),
flat AS (
  SELECT
    CASE WHEN doc_id % 3 = 0 THEN doc_id + 1000000 ELSE doc_id END AS org_id,
    doc_id + 1000000 + re * 1000000 AS samp_id,
    TIMESTAMP '2022-01-01 00:00:00'
      + (doc_id + 3600 + re * 7200) * INTERVAL 1 SECOND AS samp_ts,
    CASE WHEN doc_id % 3 = 2 THEN 'https://p/' || doc_id ELSE NULL END AS org_url,
    text AS org_text,
    [string_split(text, ' ')[1]] AS org_hashtags,
    CAST(doc_id % 100 AS BIGINT) AS user_id,
    'u' || CAST(doc_id % 100 AS VARCHAR) AS user_name,
    CAST(doc_id % 10 + re * 5 AS BIGINT) AS org_favorite_count,
    CASE WHEN doc_id % 3 = 0
         THEN TIMESTAMP '2022-01-01 00:00:00' + (doc_id + 3600) * INTERVAL 1 SECOND
         ELSE TIMESTAMP '2022-01-01 00:00:00' + doc_id * INTERVAL 1 SECOND
    END AS org_dt_ts
  FROM obs WHERE doc_id % 11 <> 3
),
dedup AS (
  SELECT *, row_number() OVER (
    PARTITION BY org_id ORDER BY samp_ts DESC, samp_id DESC) AS rn
  FROM flat)
SELECT org_id, samp_id, strftime(samp_ts, '%Y-%m-%d %H:%M:%S') AS samp_dt,
       org_url, org_text,
       CAST(to_json(org_hashtags) AS VARCHAR) AS org_hashtags,
       user_id, user_name, org_favorite_count,
       strftime(org_dt_ts, '%Y-%m-%d %H:%M:%S') AS org_dt
FROM dedup
WHERE rn = 1 AND regexp_matches(lower(org_text), 'spark|join|window')
ORDER BY org_id
"""

ORACLES["ext_funnel"] = """
WITH v AS (SELECT user_id, MIN(ts) AS t_view FROM events
           WHERE event_type = 'view' GROUP BY user_id),
c AS (SELECT e.user_id, MIN(e.ts) AS t_click
      FROM events e JOIN v USING (user_id)
      WHERE e.event_type = 'click' AND e.ts > v.t_view GROUP BY e.user_id),
p AS (SELECT e.user_id, MIN(e.ts) AS t_purchase
      FROM events e JOIN c USING (user_id)
      WHERE e.event_type = 'purchase' AND e.ts > c.t_click GROUP BY e.user_id)
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM v) AS n_view,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM c) AS n_click_after_view,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM p) AS n_purchase_after_click
"""

ORACLES["ext_cohort_retention"] = """
WITH first AS (SELECT user_id, date_trunc('day', MIN(ts)) AS d0
               FROM events GROUP BY user_id),
active AS (SELECT DISTINCT user_id, date_trunc('day', ts) AS d FROM events)
SELECT strftime(f.d0, '%Y-%m-%d') AS cohort_day,
       CAST(date_diff('day', f.d0, a.d) AS BIGINT) AS day_offset,
       CAST(COUNT(DISTINCT a.user_id) AS BIGINT) AS n_users
FROM active a JOIN first f USING (user_id)
WHERE date_diff('day', f.d0, a.d) <= 3
GROUP BY cohort_day, day_offset ORDER BY cohort_day, day_offset
"""

ORACLES["ext_tfidf_topterms"] = f"""
WITH toks AS (SELECT doc_id, unnest({TOKS}) AS term FROM documents),
tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY doc_id, term),
dfreq AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM toks GROUP BY term),
n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents),
scored AS (
  SELECT t.doc_id, t.term,
         ROUND(t.tf * ln(n.n_docs / d.df), 4) AS score
  FROM tf t JOIN dfreq d USING (term) CROSS JOIN n),
ranked AS (
  SELECT doc_id, term, score,
         CAST(ROW_NUMBER() OVER (
           PARTITION BY doc_id ORDER BY score DESC, term) AS INT) AS rn
  FROM scored)
SELECT doc_id, term, score, rn FROM ranked WHERE rn <= 3
ORDER BY doc_id, rn
"""

ORACLES["ext_length_trim"] = """
WITH b AS (SELECT quantile_cont(n_chars, 0.05) AS p05,
                  quantile_cont(n_chars, 0.95) AS p95 FROM documents)
SELECT doc_id, CAST(n_chars AS BIGINT) AS n_chars,
       ROUND(b.p05, 2) AS p05, ROUND(b.p95, 2) AS p95
FROM documents, b
WHERE CAST(n_chars AS DOUBLE) >= b.p05 AND CAST(n_chars AS DOUBLE) <= b.p95
ORDER BY doc_id
"""

ORACLES["ext_pmi_bigrams"] = f"""
WITH toks AS (SELECT doc_id, {TOKS} AS tk FROM documents),
uni AS (
  SELECT u.token, COUNT(*) AS cu FROM
    (SELECT unnest(tk) AS token FROM toks) u GROUP BY u.token),
tu AS (SELECT CAST(SUM(cu) AS BIGINT) AS tu FROM uni),
grams AS (
  SELECT array_to_string(tk[i:i+1], ' ') AS gram FROM (
    SELECT tk, unnest(generate_series(1, len(tk) - 1)) AS i FROM toks)),
big AS (SELECT gram, COUNT(*) AS cb FROM grams GROUP BY gram),
tb AS (SELECT CAST(SUM(cb) AS BIGINT) AS tb FROM big)
SELECT b.gram, CAST(b.cb AS BIGINT) AS n_pair,
       ROUND(ln((b.cb / t2.tb) /
             ((u1.cu / t1.tu) * (u2.cu / t1.tu))), 4) AS pmi
FROM big b
JOIN uni u1 ON u1.token = string_split(b.gram, ' ')[1]
JOIN uni u2 ON u2.token = string_split(b.gram, ' ')[2]
CROSS JOIN tu t1 CROSS JOIN tb t2
WHERE b.cb >= 5
ORDER BY n_pair DESC, gram LIMIT 20
"""

ORACLES["ext_dataset_card"] = """
SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
       CAST(COUNT(DISTINCT md5(text)) AS BIGINT) AS n_unique_texts,
       CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS total_ws_tokens,
       ROUND(AVG(CAST(n_chars AS DOUBLE)), 2) AS avg_chars,
       ROUND(quantile_cont(n_chars, 0.5), 2) AS p50_chars,
       ROUND(quantile_cont(n_chars, 0.9), 2) AS p90_chars,
       CAST((COUNT(*) - COUNT(DISTINCT md5(text))) * 10000
            // COUNT(*) AS BIGINT) AS dup_rate_bp
FROM documents
"""

ORACLES["ext_duplicated_ngrams"] = f"""
WITH toks AS (SELECT doc_id, {TOKS} AS tk FROM documents),
grams AS (
  SELECT doc_id, array_to_string(tk[i:i+4], ' ') AS gram FROM (
    SELECT doc_id, tk, unnest(generate_series(1, len(tk) - 4)) AS i FROM toks)
)
SELECT gram, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
       CAST(COUNT(*) AS BIGINT) AS n_occurrences
FROM grams GROUP BY gram
HAVING COUNT(DISTINCT doc_id) >= 2
ORDER BY n_docs DESC, n_occurrences DESC, gram LIMIT 20
"""

ORACLES["ext_shard_manifest"] = """
SELECT CAST(CAST(CONCAT('0x', substr(md5(CAST(doc_id AS VARCHAR) || 'shard'), 1, 15)) AS BIGINT) % 8 AS INT) AS shard,
       COUNT(*) AS n_docs,
       CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens,
       MIN(doc_id) AS min_id,
       MAX(doc_id) AS max_id,
       CAST(SUM(CAST(CAST(CONCAT('0x', substr(md5(CAST(doc_id AS VARCHAR) || ':' || text), 1, 15)) AS BIGINT) AS DECIMAL(38,0))) AS VARCHAR) AS content_digest
FROM documents GROUP BY shard ORDER BY shard
"""

# shared CTE chain for the integer-exact clustering family: corpus int8
# codes (per-dimension min/max), md5-selected exemplars, integer-L2 argmin
_CODES_CTES = """
dims AS (
  SELECT i.pos,
         MIN(CAST(e.embedding[i.pos] AS DOUBLE)) AS mn,
         MAX(CAST(e.embedding[i.pos] AS DOUBLE)) AS mx
  FROM embeddings e
  JOIN (SELECT unnest(generate_series(1,
          (SELECT MAX(len(embedding)) FROM embeddings))) AS pos) i ON TRUE
  GROUP BY i.pos),
stats AS (SELECT list(mn ORDER BY pos) AS mns, list(mx ORDER BY pos) AS mxs
          FROM dims),
codes AS (
  SELECT vec_id,
    list_transform(list_zip(CAST(embedding AS DOUBLE[]), s.mns, s.mxs),
      z -> CASE WHEN z[3] = z[2] THEN 0
                ELSE CAST(floor((z[1] - z[2]) * 255.0 / (z[3] - z[2]) + 0.5)
                     AS INT) - 128 END) AS c
  FROM embeddings, stats s)"""

_CLUSTER_CTES = _CODES_CTES + """,
ex AS (
  SELECT vec_id AS centroid_id, c AS cc FROM codes
  ORDER BY CAST(CONCAT('0x', substr(md5(CAST(vec_id AS VARCHAR)), 1, 15)) AS BIGINT), vec_id LIMIT 8),
scored AS (
  SELECT codes.vec_id, ex.centroid_id,
    list_sum(list_transform(list_zip(c, cc),
      z -> CAST((z[1] - z[2]) * (z[1] - z[2]) AS BIGINT))) AS dist2
  FROM codes, ex),
best AS (
  SELECT vec_id, centroid_id, dist2,
    ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist2, centroid_id) AS r
  FROM scored)
"""

# dist2 MUST be cast back to BIGINT: list_sum over BIGINT returns HUGEINT
# (arrow decimal128(38,0)), which a pandas/arrow fetch path renders as
# float64 ("123.0" vs Spark's "123") — the exact driver-side hash mismatch
# of CORRECTNESS_r04. The values were always numerically identical (the
# quantization's nearest floor boundary sits 5.2e-05 away at sf0.01, nine
# orders of magnitude beyond any ULP effect); only the result TYPE differed.
ORACLES["ext_cluster_assign"] = (
    "WITH " + _CLUSTER_CTES
    + "SELECT vec_id, centroid_id, CAST(dist2 AS BIGINT) AS dist2"
    + " FROM best WHERE r = 1 ORDER BY vec_id"
)

# PQ-ADC CTEs: same shared-space codes; sub-codebooks are the PQ_KSUB
# lowest-md5 corpus vectors' slices; encode = per-subspace L2 argmin
# (d2, cid tie-break); ADC = sum over subspaces of query-to-assigned-
# sub-centroid L2. PQ_M subspaces of (64 // PQ_M) dims each — slice
# bounds interpolate from the SAME constants the Spark plan reads, so
# the two sides cannot drift. Shared by ext_ann_pq and the shortlist of
# ext_ann_pq_rerank.
_PQ_DSUB = 64 // PQ_M
_PQ_CTES = _CODES_CTES + f""",
cb AS (
  SELECT vec_id AS cid, c AS cc FROM codes WHERE vec_id != 0
  ORDER BY CAST(CONCAT('0x', substr(md5(CAST(vec_id AS VARCHAR)), 1, 15)) AS BIGINT), vec_id
  LIMIT {PQ_KSUB}),
qs AS (SELECT c AS qc FROM codes WHERE vec_id = 0),
enc AS (
  SELECT codes.vec_id, j.j, cb.cid,
    list_sum(list_transform(
      list_zip(list_slice(codes.c, j.j*{_PQ_DSUB}+1, j.j*{_PQ_DSUB}+{_PQ_DSUB}),
               list_slice(cb.cc,   j.j*{_PQ_DSUB}+1, j.j*{_PQ_DSUB}+{_PQ_DSUB})),
      z -> CAST((z[1]-z[2])*(z[1]-z[2]) AS BIGINT))) AS d2,
    list_sum(list_transform(
      list_zip(list_slice(q.qc, j.j*{_PQ_DSUB}+1, j.j*{_PQ_DSUB}+{_PQ_DSUB}),
               list_slice(cb.cc, j.j*{_PQ_DSUB}+1, j.j*{_PQ_DSUB}+{_PQ_DSUB})),
      z -> CAST((z[1]-z[2])*(z[1]-z[2]) AS BIGINT))) AS dq2
  FROM codes, (SELECT unnest(generate_series(0, {PQ_M - 1})) AS j) j, cb, qs q
  WHERE codes.vec_id != 0),
best AS (
  SELECT vec_id, j, cid, dq2,
    ROW_NUMBER() OVER (PARTITION BY vec_id, j ORDER BY d2, cid) AS r
  FROM enc),
agg AS (
  SELECT vec_id,
    string_agg(CAST(cid AS VARCHAR), '-' ORDER BY j) AS pq_code,
    CAST(SUM(dq2) AS BIGINT) AS adc_dist2
  FROM best WHERE r = 1 GROUP BY vec_id)"""

ORACLES["ext_ann_pq"] = (
    "WITH " + _PQ_CTES + """
SELECT vec_id, pq_code, adc_dist2 FROM agg
ORDER BY adc_dist2, vec_id LIMIT 10
"""
)

ORACLES["ext_ann_pq_rerank"] = (
    "WITH " + _PQ_CTES + f""",
shortlist AS (SELECT vec_id FROM agg ORDER BY adc_dist2, vec_id LIMIT {PQ_SHORTLIST})
SELECT e.vec_id,
  ROUND(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                               CAST(q.embedding AS DOUBLE[])), 4) + 0.0 AS sim
FROM embeddings e
JOIN shortlist s ON e.vec_id = s.vec_id,
     (SELECT embedding FROM embeddings WHERE vec_id = 0) q
ORDER BY sim DESC, e.vec_id LIMIT 5
"""
)

ORACLES["ext_diversity_sample"] = (
    "WITH " + _CLUSTER_CTES + """,
assigned AS (SELECT vec_id, centroid_id FROM best WHERE r = 1),
ranked AS (
  SELECT vec_id, centroid_id,
    CAST(ROW_NUMBER() OVER (PARTITION BY centroid_id
      ORDER BY CAST(CONCAT('0x', substr(md5(CAST(vec_id AS VARCHAR) || 'divsamp'), 1, 15)) AS BIGINT), vec_id) AS INT) AS rn
  FROM assigned)
SELECT vec_id, centroid_id, rn FROM ranked WHERE rn <= 10
ORDER BY centroid_id, rn
""".replace("CAST(CONCAT('0x', substr(md5(CAST(vec_id AS VARCHAR) || 'divsamp'), 1, 15)) AS BIGINT)", """CAST(CONCAT('0x', substr(md5(CAST(vec_id AS VARCHAR) || 'divsamp'), 1, 15)) AS BIGINT)""")
)

ORACLES["ext_train_test_split"] = (
    f"SELECT doc_id, CASE WHEN {md5long('CAST(doc_id AS VARCHAR)')} % 10000 < 2000 "
    "THEN 'test' ELSE 'train' END AS split "
    "FROM documents ORDER BY doc_id"
)

_PSEUD_TOKEN = md5long("CAST(user_id AS VARCHAR) || 'pseud'")
ORACLES["ext_pseudonymize"] = (
    f"SELECT {_PSEUD_TOKEN} AS user_token, "
    "CAST(COUNT(*) AS BIGINT) AS n_events, "
    "CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) "
    "AS n_purchases "
    "FROM events GROUP BY user_token "
    "ORDER BY n_events DESC, user_token LIMIT 20"
)


def _fk_leg(child, ck, parent, pk):
    return (
        f"SELECT '{child}.{ck}->{parent}.{pk}' AS fk, "
        f"CAST((SELECT COUNT(*) FROM {child}) AS BIGINT) AS n_child, "
        f"CAST((SELECT COUNT(*) FROM {child} c WHERE NOT EXISTS "
        f"(SELECT 1 FROM {parent} p WHERE p.{pk} = c.{ck})) AS BIGINT) AS n_orphans, "
        f"CAST(((SELECT COUNT(*) FROM {child}) - (SELECT COUNT(*) FROM {child} c "
        f"WHERE NOT EXISTS (SELECT 1 FROM {parent} p WHERE p.{pk} = c.{ck}))) "
        f"* 10000 // (SELECT COUNT(*) FROM {child}) AS BIGINT) AS coverage_bp"
    )


ORACLES["ext_fk_profile"] = (
    "SELECT * FROM ("
    + " UNION ALL ".join(
        _fk_leg(*t)
        for t in [
            ("orders", "o_custkey", "customer", "c_custkey"),
            ("lineitem", "l_orderkey", "orders", "o_orderkey"),
            ("customer", "c_nationkey", "nation", "n_nationkey"),
            ("supplier", "s_nationkey", "nation", "n_nationkey"),
            ("nation", "n_regionkey", "region", "r_regionkey"),
        ]
    )
    + ") ORDER BY fk"
)


ORACLES["ext_sql_lateral"] = """
SELECT u.user_id, e.event_id,
       CAST(FLOOR(epoch(e.ts)) AS BIGINT) AS ts_epoch
FROM (SELECT DISTINCT user_id FROM events WHERE user_id < 20) u,
LATERAL (SELECT event_id, ts FROM events e
         WHERE e.user_id = u.user_id
         ORDER BY ts DESC, event_id LIMIT 3) e
ORDER BY u.user_id, ts_epoch DESC, e.event_id
"""

ORACLES["ext_typo_pairs"] = f"""
WITH tf AS (
  SELECT tok, CAST(COUNT(*) AS BIGINT) AS c
  FROM (SELECT unnest({TOKS}) AS tok FROM documents) GROUP BY tok),
pairs AS (
  SELECT a.tok AS tok_a, b.tok AS tok_b, a.c AS c_a, b.c AS c_b
  FROM tf a JOIN tf b ON a.tok < b.tok AND levenshtein(a.tok, b.tok) <= 1)
SELECT tok_a, tok_b, c_a, c_b, c_a + c_b AS c_sum
FROM pairs ORDER BY c_sum DESC, tok_a, tok_b LIMIT 20
"""

ORACLES["ext_temperature_mix"] = """
WITH per AS (
  SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS sum_tokens
  FROM documents GROUP BY lang),
w AS (SELECT *, CAST(FLOOR(SQRT(sum_tokens)) AS BIGINT) AS w FROM per)
SELECT lang, n_docs, sum_tokens,
       CAST(sum_tokens * 10000 // SUM(sum_tokens) OVER () AS BIGINT) AS raw_bp,
       CAST(w * 10000 // SUM(w) OVER () AS BIGINT) AS smooth_bp
FROM w ORDER BY lang
"""

ORACLES["ext_kfold"] = (
    f"SELECT {md5long('CAST(doc_id AS VARCHAR)')} % 5 AS fold, "
    "CAST(COUNT(*) AS BIGINT) AS n_docs, "
    "CAST(SUM(n_chars) AS BIGINT) AS sum_chars "
    "FROM documents GROUP BY fold ORDER BY fold"
)

ORACLES["ext_stratified_sample"] = (
    "SELECT event_id, event_type FROM events "
    f"WHERE {md5long('CAST(event_id AS VARCHAR)')} % 10000 < "
    "CASE event_type WHEN 'view' THEN 1000 WHEN 'click' THEN 5000 "
    "WHEN 'purchase' THEN 10000 ELSE 2500 END "
    "ORDER BY event_id"
)

ORACLES["ext_multimodal_frames"] = (
    # mirror of operators/multimodal.frame_sample_stub(every_n=10): per doc,
    # n_frames = min(max(len//10, 1), 8); frame f = bytes [f*10, (f+1)*10).
    # Fixture text is ASCII, so byte slicing == substr on chars.
    "WITH docs AS (SELECT doc_id, text, octet_length(encode(text)) AS n "
    "FROM documents WHERE doc_id < 100), "
    "f AS (SELECT doc_id, text, "
    "unnest(generate_series(0, CAST(least(greatest(n // 10, 1), 8) AS INT) - 1)) AS fno "
    "FROM docs) "
    "SELECT doc_id AS media_id, CAST(fno AS BIGINT) AS frame_no, "
    "substr(text, fno * 10 + 1, 10) AS frame_text "
    "FROM f ORDER BY media_id, frame_no"
)

# Mirror of the REAL PPM encode->decode loop (r4): the Spark side writes an
# actual P6 header + solid raster and the real parser reads it back, so every
# output is a closed-form function of (text length, md5 bytes):
#   header "P6\n{w} {h}\n255\n" = 9 + len(str(w)) + len(str(h)) bytes;
#   solid fill => integer channel means == the fill bytes exactly.
ORACLES["ext_multimodal_features"] = (
    "WITH p AS (SELECT doc_id, substr(sha256(text), 1, 16) AS sha, "
    "CAST(4 + octet_length(encode(text)) % 13 AS BIGINT) AS w, "
    "CAST(4 + octet_length(encode(text)) % 7 AS BIGINT) AS h, "
    "CAST(CAST(CONCAT('0x', substr(md5(text), 1, 2)) AS INT) AS BIGINT) AS r, "
    "CAST(CAST(CONCAT('0x', substr(md5(text), 3, 2)) AS INT) AS BIGINT) AS g, "
    "CAST(CAST(CONCAT('0x', substr(md5(text), 5, 2)) AS INT) AS BIGINT) AS b "
    "FROM documents) "
    "SELECT doc_id AS media_id, sha AS sha256_16, 'ppm' AS format, "
    "CAST(9 + length(CAST(w AS VARCHAR)) + length(CAST(h AS VARCHAR)) + 3 * w * h "
    "AS BIGINT) AS n_bytes, "
    "w AS width, h AS height, w * h AS n_pixels, "
    "r AS mean_r, g AS mean_g, b AS mean_b "
    "FROM p ORDER BY media_id"
)

# Mirror of the OCR-hook loop over the solid-PPM corpus: the pixel-probe
# engine reports "WxH:r,g,b" of the decoded raster — closed-form because
# the fill is solid and the params derive from md5/length
ORACLES["ext_ocr_features"] = (
    "WITH p AS (SELECT doc_id, "
    "CAST(4 + octet_length(encode(text)) % 13 AS BIGINT) AS w, "
    "CAST(4 + octet_length(encode(text)) % 7 AS BIGINT) AS h, "
    "CAST(CAST(CONCAT('0x', substr(md5(text), 1, 2)) AS INT) AS BIGINT) AS r, "
    "CAST(CAST(CONCAT('0x', substr(md5(text), 3, 2)) AS INT) AS BIGINT) AS g, "
    "CAST(CAST(CONCAT('0x', substr(md5(text), 5, 2)) AS INT) AS BIGINT) AS b "
    "FROM documents) "
    "SELECT doc_id AS media_id, 'ppm' AS format, "
    "CONCAT(w, 'x', h, ':', r, ',', g, ',', b) AS ocr_text, "
    "CAST(NULL AS VARCHAR) AS ocr_skipped "
    "FROM p ORDER BY media_id"
)

# Mirror of the REAL WAV encode->decode loop: alternating +a/-b PCM16 tone,
# n samples -> peak = max(a, b), rms = floor(sqrt((ceil(n/2)*a^2 +
# floor(n/2)*b^2) // n)) — sqrt args < 2^53 and far from square boundaries,
# so IEEE double sqrt + floor is engine-identical to Python isqrt here.
ORACLES["ext_audio_features"] = (
    "WITH p AS (SELECT doc_id, "
    "CAST(50 + octet_length(encode(text)) % 100 AS BIGINT) AS n, "
    "CAST(1 + CAST(CONCAT('0x', substr(md5(text), 1, 2)) AS INT) * 100 AS BIGINT) AS a, "
    "CAST(1 + CAST(CONCAT('0x', substr(md5(text), 3, 2)) AS INT) * 100 AS BIGINT) AS b "
    "FROM documents) "
    "SELECT doc_id AS media_id, 'wav' AS format, "
    "CAST(8000 AS BIGINT) AS sample_rate, CAST(1 AS BIGINT) AS channels, "
    "n AS n_samples, greatest(a, b) AS peak, "
    "CAST(floor(sqrt(CAST((((n + 1) // 2) * a * a + (n // 2) * b * b) // n "
    "AS DOUBLE))) AS BIGINT) AS rms "
    "FROM p ORDER BY media_id"
)


# ---- training-data pipeline oracles (operators/pipeline.py) ---------------


def _shingle_ctes(prefix: str, where: str) -> str:
    """3-gram shingle-hash CTEs over a filtered documents subset (mirror of
    operators.pipeline._shingle_hashes)."""
    return f"""{prefix}toks AS (SELECT doc_id, {TOKS} AS tk FROM documents WHERE {where}),
{prefix}grams AS (
  SELECT doc_id, array_to_string(tk[i:i+2], ' ') AS sh FROM (
    SELECT doc_id, tk, unnest(generate_series(1, len(tk) - 2)) AS i FROM {prefix}toks)
),
{prefix}hashes AS (SELECT DISTINCT doc_id, {md5long('sh')} AS h FROM {prefix}grams)"""


ORACLES["ext_decontaminate"] = f"""
WITH {_shingle_ctes('c_', 'doc_id % 50 <> 0')},
{_shingle_ctes('b_', 'doc_id % 50 = 0')},
bset AS (SELECT DISTINCT h FROM b_hashes),
per AS (
  SELECT c.doc_id,
         CAST(SUM(CASE WHEN b.h IS NOT NULL THEN 1 END) AS BIGINT) AS n_hit,
         CAST(COUNT(*) AS BIGINT) AS n_grams
  FROM c_hashes c LEFT JOIN bset b ON c.h = b.h
  GROUP BY c.doc_id
)
SELECT doc_id, n_hit, n_grams, ROUND(n_hit / n_grams, 4) AS contamination
FROM per WHERE n_hit IS NOT NULL ORDER BY doc_id
"""

# mirror of queries/extensions.ext_pii_redact's planted-PII expression
_PII_TEXT = (
    "text"
    " || CASE WHEN doc_id % 7 = 0 THEN ' contact user' || CAST(doc_id AS VARCHAR)"
    " || '@example.com' ELSE '' END"
    " || CASE WHEN doc_id % 5 = 0 THEN ' call 555-010-'"
    " || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ELSE '' END"
    " || CASE WHEN doc_id % 11 = 0 THEN ' from 10.0.' || CAST(doc_id % 256 AS VARCHAR)"
    " || '.' || CAST((doc_id * 7) % 256 AS VARCHAR) ELSE '' END"
)
_EMAIL_RE = r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}"
_PHONE_RE = r"\b\d{3}-\d{3}-\d{4}\b"
_IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"

ORACLES["ext_pii_redact"] = f"""
WITH pii AS (SELECT doc_id, {_PII_TEXT} AS t FROM documents)
SELECT doc_id,
  regexp_replace(regexp_replace(regexp_replace(t,
    '{_EMAIL_RE}', '<EMAIL>', 'g'), '{_PHONE_RE}', '<PHONE>', 'g'),
    '{_IPV4_RE}', '<IP>', 'g') AS redacted,
  CAST(len(regexp_extract_all(t, '{_EMAIL_RE}')) AS BIGINT) AS n_emails,
  CAST(len(regexp_extract_all(t, '{_PHONE_RE}')) AS BIGINT) AS n_phones,
  CAST(len(regexp_extract_all(t, '{_IPV4_RE}')) AS BIGINT) AS n_ips
FROM pii ORDER BY doc_id
"""

ORACLES["ext_repetition"] = f"""
WITH toks AS (SELECT doc_id, {TOKS} AS tk FROM documents),
uni AS (SELECT doc_id, 1 AS n, unnest(tk) AS gram FROM toks),
bi AS (
  SELECT doc_id, 2 AS n, tk[i] || ' ' || tk[i+1] AS gram FROM (
    SELECT doc_id, tk, unnest(generate_series(1, len(tk) - 1)) AS i FROM toks)
),
counts AS (
  SELECT doc_id, n, gram, COUNT(*) AS c
  FROM (SELECT * FROM uni UNION ALL SELECT * FROM bi)
  GROUP BY doc_id, n, gram
),
stats AS (
  SELECT doc_id,
    CAST(SUM(CASE WHEN n = 1 THEN c END) AS BIGINT) AS n_tokens,
    CAST(COUNT(CASE WHEN n = 1 THEN 1 END) AS BIGINT) AS n_distinct,
    MAX(CASE WHEN n = 1 THEN c END) AS top_cnt,
    SUM(CASE WHEN n = 2 THEN c END) AS n_bigrams,
    MAX(CASE WHEN n = 2 THEN c END) AS top_bg_cnt
  FROM counts GROUP BY doc_id
)
SELECT doc_id, n_tokens, n_distinct,
  ROUND(top_cnt / n_tokens, 4) AS top_token_frac,
  COALESCE(ROUND(top_bg_cnt / n_bigrams, 4), 0.0) AS top_bigram_frac,
  (ROUND(top_cnt / n_tokens, 4) > {TOP_TOKEN_MAX}
   OR COALESCE(ROUND(top_bg_cnt / n_bigrams, 4), 0.0) > {TOP_BIGRAM_MAX}) AS repetitive
FROM stats ORDER BY doc_id
"""

ORACLES["ext_corpus_shuffle"] = f"""
WITH h AS (
  SELECT doc_id,
         {md5long("CAST(doc_id AS VARCHAR) || 'shuffle'")} AS h
  FROM documents
)
SELECT doc_id, CAST(h % 16 AS BIGINT) AS shard,
       CAST(row_number() OVER (PARTITION BY h % 16 ORDER BY h, doc_id) AS BIGINT) AS pos
FROM h ORDER BY doc_id
"""

ORACLES["ext_pack_sequences"] = f"""
WITH base AS (
  SELECT doc_id,
         {md5long("CAST(doc_id AS VARCHAR) || 'pack'")} AS h,
         CAST(len({TOKS}) AS BIGINT) AS n_tokens
  FROM documents
),
f AS (SELECT *, CAST(h % 16 AS BIGINT) AS shard FROM base WHERE n_tokens > 0),
c AS (
  SELECT *, SUM(n_tokens) OVER (
    PARTITION BY shard ORDER BY h, doc_id
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM f
)
SELECT doc_id, shard,
  CAST(FLOOR((cum - n_tokens) / 512) AS BIGINT) AS seq_id,
  CAST((cum - n_tokens) % 512 AS BIGINT) AS tok_start,
  n_tokens,
  CAST(FLOOR((cum - 1) / 512) - FLOOR((cum - n_tokens) / 512) + 1 AS BIGINT) AS n_seqs
FROM c ORDER BY doc_id
"""

ORACLES["ext_curriculum"] = f"""
WITH feat AS (
  SELECT doc_id,
         length(text) AS n_chars,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
         len(list_filter({TOKS}, t -> t IN {EN_PROFILE_SQL})) AS n_stop,
         length(regexp_replace(text, '[\\w\\s]', '', 'g')) AS n_punct
  FROM documents),
ratios AS (
  SELECT doc_id, n_tokens,
         CASE WHEN n_chars > 0 THEN CAST(n_punct AS DOUBLE) / n_chars ELSE 0.0 END AS pr,
         CASE WHEN n_tokens > 0 THEN CAST(n_stop AS DOUBLE) / n_tokens ELSE 0.0 END AS sr
  FROM feat),
q AS (
  SELECT doc_id,
         CAST(ROUND(ROUND(GREATEST(LEAST(
           (CASE WHEN n_tokens >= 5 AND n_tokens <= 100000 THEN 0.5 ELSE 0.0 END)
           + LEAST(sr * 2.0, 0.5) - LEAST(pr * 2.0, 0.25), 1.0), 0.0), 4) * 10000, 0) AS BIGINT) AS q_bp
  FROM ratios),
per AS (
  SELECT {md5long("CAST(doc_id AS VARCHAR) || 'shuffle'")} % 8 AS shard,
         CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(q_bp) // COUNT(*) AS BIGINT) AS mean_q_bp
  FROM q JOIN documents USING (doc_id) GROUP BY shard)
SELECT shard, n_docs, mean_q_bp,
       CAST(ROW_NUMBER() OVER (ORDER BY mean_q_bp DESC, shard) AS BIGINT)
         AS curriculum_pos
FROM per ORDER BY curriculum_pos
"""
ORACLES["ext_pack_multimodal"] = f"""
WITH base AS (
  SELECT doc_id,
         {md5long("CAST(doc_id AS VARCHAR) || 'mmpack'")} AS h,
         CAST(len({TOKS}) + (doc_id % 4) * 64 AS BIGINT) AS n_tokens
  FROM documents
),
f AS (SELECT *, CAST(h % 8 AS BIGINT) AS shard FROM base WHERE n_tokens > 0),
c AS (
  SELECT *, SUM(n_tokens) OVER (
    PARTITION BY shard ORDER BY h, doc_id
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM f
)
SELECT doc_id, shard,
  CAST(FLOOR((cum - n_tokens) / 1024) AS BIGINT) AS seq_id,
  CAST((cum - n_tokens) % 1024 AS BIGINT) AS tok_start,
  n_tokens,
  CAST(FLOOR((cum - 1) / 1024) - FLOOR((cum - n_tokens) / 1024) + 1 AS BIGINT) AS n_seqs
FROM c ORDER BY doc_id
"""

# transitive closure over the symmetric LSH pair graph: cluster_id = MIN
# reachable node (every edge endpoint reaches itself through any neighbor
# round-trip, so MIN(b) includes the node's own id's component minimum)
_CLUSTER_SQL_TAIL = (
    "edges AS (SELECT doc_a AS a, doc_b AS b FROM pairs "
    "UNION SELECT doc_b, doc_a FROM pairs), "
    "reach AS (SELECT a, b FROM edges "
    "UNION SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a) "
)

ORACLES["ext_dedup_clusters"] = (
    f"WITH RECURSIVE {_SHINGLE_CTES}, {_minhash_sig_cte()}, {_band_cte()}, "
    f"{_PAIRS_CTE}, {_CLUSTER_SQL_TAIL}"
    "SELECT a AS doc_id, MIN(b) AS cluster_id FROM reach GROUP BY a "
    "ORDER BY doc_id"
)

ORACLES["ext_near_dedup"] = (
    f"WITH RECURSIVE {_SHINGLE_CTES}, {_minhash_sig_cte()}, {_band_cte()}, "
    f"{_PAIRS_CTE}, {_CLUSTER_SQL_TAIL}"
    ", removed AS (SELECT a AS doc_id FROM reach GROUP BY a "
    "HAVING MIN(b) <> a) "
    "SELECT doc_id FROM documents WHERE doc_id NOT IN "
    "(SELECT doc_id FROM removed) ORDER BY doc_id"
)

ORACLES["ext_snapshot_diff"] = """
WITH e AS (
  SELECT event_id, event_type,
         CAST(ROUND(value * 100) AS BIGINT) AS cents
  FROM events
),
old AS (
  SELECT event_id,
         md5(event_type || chr(31) || CAST(cents AS VARCHAR)) AS fp
  FROM e WHERE event_id % 5 <> 0
),
new AS (
  SELECT event_id,
         md5(event_type || chr(31) || CAST(
           CASE WHEN event_id % 7 = 0 THEN cents * 2 ELSE cents END
           AS VARCHAR)) AS fp
  FROM e WHERE event_id % 3 <> 0
)
SELECT COALESCE(o.event_id, n.event_id) AS event_id,
       CASE WHEN o.fp IS NULL THEN 'added'
            WHEN n.fp IS NULL THEN 'removed'
            WHEN o.fp <> n.fp THEN 'changed' END AS change
FROM old o FULL OUTER JOIN new n ON o.event_id = n.event_id
WHERE (o.fp IS NULL OR n.fp IS NULL OR o.fp <> n.fp)
ORDER BY event_id
"""

ORACLES["ext_chunk_documents"] = f"""
WITH toks AS (SELECT doc_id, {TOKS} AS tk FROM documents),
nz AS (SELECT doc_id, tk, len(tk) AS n FROM toks WHERE len(tk) > 0),
starts AS (
  SELECT doc_id, tk, s, row_number() OVER (PARTITION BY doc_id ORDER BY s) - 1 AS chunk_id
  FROM (SELECT doc_id, tk,
        unnest(generate_series(1, greatest(n - 8, 1), 56)) AS s FROM nz)
)
SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
       array_to_string(tk[s:s+63], ' ') AS chunk_text,
       CAST(len(tk[s:s+63]) AS BIGINT) AS n_chunk_tokens
FROM starts ORDER BY doc_id, chunk_id
"""

ORACLES["ext_unigram_logprob"] = f"""
WITH toks AS (
  SELECT doc_id, unnest({TOKS}) AS token FROM documents
),
freqs AS (SELECT token, COUNT(*) AS c FROM toks GROUP BY token),
total AS (SELECT CAST(SUM(c) AS BIGINT) AS total FROM freqs)
SELECT t.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_tokens,
       ROUND(AVG(-ln(f.c / tt.total)), 4) AS avg_surprisal
FROM toks t JOIN freqs f ON t.token = f.token CROSS JOIN total tt
GROUP BY t.doc_id ORDER BY t.doc_id
"""

ORACLES["ext_interval_join"] = """
WITH l AS (
  SELECT user_id, event_id AS l_event, ts AS ls,
         ts + INTERVAL 30 MINUTE AS le
  FROM events WHERE event_type = 'purchase'
),
r AS (
  SELECT user_id, event_id AS r_event, ts AS rs,
         ts + INTERVAL 30 MINUTE AS re
  FROM events WHERE event_type = 'view'
)
SELECT l.user_id, l_event, r_event
FROM l JOIN r ON l.user_id = r.user_id AND ls < re AND rs < le
             AND ls < le AND rs < re
ORDER BY l.user_id, l_event, r_event
"""

ORACLES["ext_dedup_lines"] = """
WITH src AS (
  SELECT doc_id, concat_ws(chr(10),
    CASE WHEN doc_id % 4 = 0 THEN 'copyright acme corp - all rights reserved' END,
    text,
    CASE WHEN doc_id % 6 = 0 THEN 'subscribe to our newsletter' END) AS t
  FROM documents
),
lines AS (
  SELECT doc_id, i AS pos, ls[i] AS ln FROM (
    SELECT doc_id, string_split(t, chr(10)) AS ls FROM src),
    unnest(generate_series(1, len(ls))) AS u(i)
),
freq AS (
  SELECT ln FROM (SELECT ln, COUNT(DISTINCT doc_id) AS df FROM lines GROUP BY ln)
  WHERE df > 2
)
SELECT l.doc_id,
  COALESCE(string_agg(CASE WHEN f.ln IS NULL THEN l.ln END, chr(10) ORDER BY l.pos), '') AS cleaned,
  CAST(COUNT(*) AS BIGINT) AS n_lines,
  CAST(SUM(CASE WHEN f.ln IS NULL THEN 0 ELSE 1 END) AS BIGINT) AS n_dropped
FROM lines l LEFT JOIN freq f ON l.ln = f.ln
GROUP BY l.doc_id ORDER BY l.doc_id
"""

# the curation funnel composes the already-verified stage oracles as derived
# tables (each keeps its own WITH/ORDER BY — legal in a subquery) and applies
# the same first-failing-stage CASE as the Spark side.
ORACLES["ext_curation_verdict"] = f"""
SELECT d.doc_id,
  CASE WHEN l.lang_pred <> 'en' THEN 'lang'
       WHEN q.quality < 0.55 THEN 'quality'
       WHEN r.repetitive THEN 'repetition'
       WHEN c.doc_id IS NOT NULL THEN 'duplicate'
       WHEN x.contamination > 0.2 THEN 'contaminated'
       ELSE 'keep' END AS verdict
FROM documents d
LEFT JOIN ({ORACLES['ext_lang_id']}) l ON d.doc_id = l.doc_id
LEFT JOIN ({ORACLES['ext_quality']}) q ON d.doc_id = q.doc_id
LEFT JOIN ({ORACLES['ext_repetition']}) r ON d.doc_id = r.doc_id
LEFT JOIN (SELECT doc_id FROM ({ORACLES['ext_dedup_clusters']})
           WHERE doc_id <> cluster_id) c ON d.doc_id = c.doc_id
LEFT JOIN ({ORACLES['ext_decontaminate']}) x ON d.doc_id = x.doc_id
ORDER BY d.doc_id
"""

# mirror of operators/sampling.domain_mix over the ext_domain_mix share rule
ORACLES["ext_domain_mix"] = f"""
WITH stats AS (
  SELECT source, SUM(len(string_split(text, ' '))) AS tok FROM documents
  GROUP BY source
),
rates AS (
  SELECT source,
    LEAST(10000, CAST(FLOOR(
      (CASE WHEN CAST(substr(source, 4) AS INT) % 2 = 0 THEN 800 ELSE 200 END)
      * 5000 / tok) AS BIGINT)) AS rate_bps
  FROM stats
)
SELECT d.doc_id, d.source
FROM documents d JOIN rates r ON d.source = r.source
WHERE {md5long("CAST(d.doc_id AS VARCHAR) || ''")} % 10000 < r.rate_bps
ORDER BY d.doc_id
"""

# temperature-scaled mixing: shares derived as sqrt(token mass),
# micro-quantized before the cross-domain sum; int64 floor-division (//)
# everywhere after — mirror of sampling.temperature_mix at T=2
ORACLES["ext_mix_temperature"] = f"""
WITH stats AS (
  SELECT source, CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS tok
  FROM documents GROUP BY source
),
q AS (
  SELECT source, tok,
         CAST(ROUND(sqrt(CAST(tok AS DOUBLE)) * 1000000, 0) AS BIGINT) AS q
  FROM stats
),
tot AS (SELECT SUM(q) AS tq FROM q),
rates AS (
  SELECT source,
    LEAST(CAST(10000 AS BIGINT), ((10000 * q // tq) * 5000) // tok) AS rate_bps
  FROM q, tot
)
SELECT d.doc_id, d.source
FROM documents d JOIN rates r ON d.source = r.source
WHERE {md5long("CAST(d.doc_id AS VARCHAR) || ''")} % 10000 < r.rate_bps
ORDER BY d.doc_id
"""

# T=1 leg: proportional shares from RAW integer token counts (no sqrt, no
# quantization) — the same // chain as the T=2 oracle minus the q mapping
ORACLES["ext_mix_proportional"] = f"""
WITH stats AS (
  SELECT source, CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS tok
  FROM documents GROUP BY source
),
tot AS (SELECT SUM(tok) AS tq FROM stats),
rates AS (
  SELECT source,
    LEAST(CAST(10000 AS BIGINT), ((10000 * tok // tq) * 5000) // tok) AS rate_bps
  FROM stats, tot
)
SELECT d.doc_id, d.source
FROM documents d JOIN rates r ON d.source = r.source
WHERE {md5long("CAST(d.doc_id AS VARCHAR) || ''")} % 10000 < r.rate_bps
ORDER BY d.doc_id
"""

# per-shard packing audit: same shard hash + token counts as the pack
# oracle; windows/waste/efficiency in int64 floor division
ORACLES["ext_packing_stats"] = f"""
WITH base AS (
  SELECT doc_id,
         {md5long("CAST(doc_id AS VARCHAR) || 'pack'")} AS h,
         CAST(len({TOKS}) AS BIGINT) AS n_tokens
  FROM documents
),
f AS (SELECT *, CAST(h % 16 AS BIGINT) AS shard FROM base WHERE n_tokens > 0),
agg AS (
  SELECT shard, CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(n_tokens) AS BIGINT) AS n_tokens
  FROM f GROUP BY shard
)
SELECT shard, n_docs, n_tokens,
  (n_tokens + 511) // 512 AS n_windows,
  ((n_tokens + 511) // 512) * 512 - n_tokens AS waste_tokens,
  (10000 * n_tokens) // (((n_tokens + 511) // 512) * 512) AS efficiency_bps
FROM agg ORDER BY shard
"""

ORACLES["ext_ring_negatives"] = f"""
WITH h AS (
  SELECT doc_id, {md5long("CAST(doc_id AS VARCHAR) || 'neg'")} AS h
  FROM documents
),
p AS (
  SELECT doc_id, CAST(h % 4 AS BIGINT) AS shard,
         CAST(row_number() OVER (PARTITION BY h % 4 ORDER BY h, doc_id) AS BIGINT) AS pos
  FROM h
),
s AS (SELECT shard, MAX(pos) AS n FROM p GROUP BY shard),
c AS (
  SELECT p.doc_id AS anchor, p.shard, p.pos, CAST(u.i AS BIGINT) AS neg_rank,
         ((p.pos - 1 + u.i * GREATEST(s.n // 3, 1)) % s.n) + 1 AS neg_pos
  FROM p JOIN s USING (shard), unnest(generate_series(1, 2)) AS u(i)
)
SELECT c.anchor, c.neg_rank, p2.doc_id AS negative
FROM c JOIN p p2 ON p2.shard = c.shard AND p2.pos = c.neg_pos
WHERE c.neg_pos <> c.pos
ORDER BY anchor, neg_rank
"""

ORACLES["ext_cap_per_group"] = f"""
SELECT doc_id, source FROM (
  SELECT doc_id, source, row_number() OVER (
    PARTITION BY source
    ORDER BY {md5long("CAST(doc_id AS VARCHAR) || ''")}, doc_id) AS rn
  FROM documents
) WHERE rn <= 8 ORDER BY doc_id
"""

ORACLES["ext_zorder_key"] = (
    "SELECT event_id, CAST(((((user_id % 256) >> 0) & 1) << 0) + ((((user_id % 256) >> 1) & 1) << 2) + ((((user_id % 256) >> 2) & 1) << 4) + ((((user_id % 256) >> 3) & 1) << 6) + ((((user_id % 256) >> 4) & 1) << 8) + ((((user_id % 256) >> 5) & 1) << 10) + ((((user_id % 256) >> 6) & 1) << 12) + ((((user_id % 256) >> 7) & 1) << 14) + ((((CAST(FLOOR(value) AS BIGINT) % 256) >> 0) & 1) << 1) + ((((CAST(FLOOR(value) AS BIGINT) % 256) >> 1) & 1) << 3) + ((((CAST(FLOOR(value) AS BIGINT) % 256) >> 2) & 1) << 5) + ((((CAST(FLOOR(value) AS BIGINT) % 256) >> 3) & 1) << 7) + ((((CAST(FLOOR(value) AS BIGINT) % 256) >> 4) & 1) << 9) + ((((CAST(FLOOR(value) AS BIGINT) % 256) >> 5) & 1) << 11) + ((((CAST(FLOOR(value) AS BIGINT) % 256) >> 6) & 1) << 13) + ((((CAST(FLOOR(value) AS BIGINT) % 256) >> 7) & 1) << 15) AS BIGINT) AS z "
    "FROM events ORDER BY event_id"
)

ORACLES["ext_dq_audit"] = """
WITH c AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
    CAST(SUM(CASE WHEN NOT (value >= 0) THEN 1 ELSE 0 END) AS BIGINT) AS v1,
    CAST(SUM(CASE WHEN NOT (value < 500) THEN 1 ELSE 0 END) AS BIGINT) AS v2,
    CAST(SUM(CASE WHEN NOT (event_type IN ('view','click','purchase','signup','error')) THEN 1 ELSE 0 END) AS BIGINT) AS v3,
    CAST(SUM(CASE WHEN NOT (user_id > 0) THEN 1 ELSE 0 END) AS BIGINT) AS v4
  FROM events
)
SELECT r.rule, c.n AS n_rows, r.v AS n_violations,
       ROUND(r.v / c.n, 4) AS violation_rate
FROM c, (
  SELECT 'value_nonneg' AS rule, v1 AS v FROM c UNION ALL
  SELECT 'value_under_500', v2 FROM c UNION ALL
  SELECT 'known_type', v3 FROM c UNION ALL
  SELECT 'user_positive', v4 FROM c
) r
ORDER BY rule
"""

ORACLES["ext_tfidf_keywords"] = f"""
WITH toks AS (SELECT doc_id, unnest({TOKS}) AS token FROM documents),
postings AS (
  SELECT doc_id, token, COUNT(*) AS tf FROM toks GROUP BY doc_id, token
),
df_t AS (SELECT token, COUNT(*) AS df FROM postings GROUP BY token),
nd AS (SELECT COUNT(DISTINCT doc_id) AS n FROM postings),
scored AS (
  SELECT p.doc_id, p.token,
         ROUND(p.tf * ln(nd.n / d.df), 6) AS score
  FROM postings p JOIN df_t d ON p.token = d.token CROSS JOIN nd
),
topk AS (
  SELECT doc_id, token,
         row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, token) AS rn
  FROM scored
)
SELECT doc_id, string_agg(token, ' ' ORDER BY rn) AS keywords
FROM topk WHERE rn <= 3 GROUP BY doc_id ORDER BY doc_id
"""

ORACLES["ext_pmi_collocations"] = f"""
WITH toks AS (SELECT doc_id, {TOKS} AS tk FROM documents),
uni AS (
  SELECT w, COUNT(*) AS cw FROM (SELECT unnest(tk) AS w FROM toks) GROUP BY w
),
bi AS (
  SELECT tk[i] AS a, tk[i+1] AS b, COUNT(*) AS cab FROM (
    SELECT tk, unnest(generate_series(1, len(tk) - 1)) AS i FROM toks)
  GROUP BY tk[i], tk[i+1] HAVING COUNT(*) >= 5
),
tot AS (
  SELECT (SELECT SUM(cw) FROM uni) AS nw, (SELECT SUM(cab) FROM bi) AS nb
)
SELECT bi.a, bi.b, CAST(bi.cab AS BIGINT) AS cab,
  ROUND(ln((bi.cab / tot.nb) / ((ua.cw / tot.nw) * (ub.cw / tot.nw))), 4) AS pmi
FROM bi JOIN uni ua ON bi.a = ua.w JOIN uni ub ON bi.b = ub.w CROSS JOIN tot
ORDER BY pmi DESC, bi.a, bi.b LIMIT 20
"""

ORACLES["ext_suggest_next"] = f"""
WITH toks AS (SELECT {TOKS} AS tk FROM documents),
bi AS (
  SELECT tk[i+1] AS next_token, COUNT(*) AS c FROM (
    SELECT tk, unnest(generate_series(1, len(tk) - 1)) AS i FROM toks)
  WHERE tk[i] = 'hash' GROUP BY tk[i+1]
),
tot AS (SELECT SUM(c) AS n FROM bi)
SELECT next_token, CAST(c AS BIGINT) AS c, ROUND(c / tot.n, 4) AS p
FROM bi CROSS JOIN tot
ORDER BY c DESC, next_token LIMIT 5
"""

ORACLES["ext_autocomplete"] = f"""
SELECT token, CAST(COUNT(*) AS BIGINT) AS c FROM (
  SELECT unnest({TOKS}) AS token FROM documents)
WHERE token LIKE 's%'
GROUP BY token ORDER BY c DESC, token LIMIT 10
"""

ORACLES["ext_facet_counts"] = """
WITH pairs AS (
  SELECT 'lang' AS facet, lang AS value FROM documents
  UNION ALL
  SELECT 'source', source FROM documents
),
counts AS (SELECT facet, value, COUNT(*) AS c FROM pairs GROUP BY facet, value)
SELECT facet, value, CAST(c AS BIGINT) AS c FROM (
  SELECT *, row_number() OVER (PARTITION BY facet ORDER BY c DESC, value) AS rn
  FROM counts
) WHERE rn <= 3 ORDER BY facet, value
"""

ORACLES["ext_histogram"] = """
SELECT CAST(FLOOR(value / 50) AS BIGINT) AS bin,
       CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(MIN(value), 2) AS lo, ROUND(MAX(value), 2) AS hi
FROM events GROUP BY 1 ORDER BY bin
"""

ORACLES["ext_corr_profile"] = """
SELECT event_type,
  ROUND(corr(value, CAST(hour(ts) AS DOUBLE)), 4) AS corr_vh,
  ROUND(covar_samp(value, CAST(hour(ts) AS DOUBLE)), 4) AS covar_vh,
  ROUND(stddev_samp(value), 4) AS sd_value
FROM events GROUP BY event_type ORDER BY event_type
"""

ORACLES["ext_ntile_segments"] = """
WITH spend AS (
  SELECT user_id, ROUND(SUM(value), 2) AS spend FROM events
  WHERE event_type = 'purchase' GROUP BY user_id
)
SELECT user_id, spend,
       CAST(ntile(10) OVER (ORDER BY spend DESC, user_id) AS BIGINT) AS decile
FROM spend ORDER BY user_id
"""

ORACLES["ext_event_transitions"] = """
WITH seq AS (
  SELECT event_type AS from_type,
         lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS to_type
  FROM events
)
SELECT from_type, to_type, CAST(COUNT(*) AS BIGINT) AS n
FROM seq WHERE to_type IS NOT NULL
GROUP BY from_type, to_type ORDER BY from_type, to_type
"""

ORACLES["ext_sliding_window"] = """
WITH hops AS (SELECT unnest(generate_series(0, 3)) AS i),
b AS (
  SELECT date_trunc('minute', ts)
           - (CAST(EXTRACT(minute FROM ts) AS INT) % 15) * INTERVAL 1 MINUTE
           AS b15,
         event_type, value
  FROM events)
SELECT strftime(b15 - i * INTERVAL 15 MINUTE, '%Y-%m-%d %H:%M:%S') AS w_start,
       event_type, COUNT(*) AS n, ROUND(SUM(value), 2) AS sum_value
FROM b CROSS JOIN hops
GROUP BY 1, 2 ORDER BY 1, 2
"""

ORACLES["ext_grouping_sets"] = (
    "SELECT COALESCE(o_orderstatus, 'ALL') AS status, "
    "COALESCE(o_orderpriority, 'ALL') AS priority, "
    "COUNT(*) AS n, ROUND(SUM(o_totalprice), 2) AS revenue "
    "FROM orders "
    "GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ()) "
    "ORDER BY 1, 2"
)

# oracle is the PLAIN join — salting must be invisible in the result
ORACLES["ext_salted_join"] = (
    "SELECT c.c_mktsegment, COUNT(*) AS n_events, "
    "ROUND(SUM(e.value), 2) AS sum_value "
    "FROM events e JOIN customer c ON e.user_id = c.c_custkey "
    "GROUP BY 1 ORDER BY 1"
)

ORACLES["ext_quantize_embeddings"] = """
WITH s AS (
  SELECT vec_id, embedding,
         CAST(list_min(embedding) AS DOUBLE) AS mn,
         CAST(list_max(embedding) AS DOUBLE) AS mx
  FROM embeddings)
SELECT vec_id,
  CASE WHEN mx = mn THEN list_transform(embedding, x -> 0)
       ELSE list_transform(embedding, x ->
         CAST(floor((CAST(x AS DOUBLE) - mn) * 255.0 / (mx - mn) + 0.5) AS INT) - 128)
  END AS codes,
  ROUND(mn, 6) AS zero_point,
  ROUND((mx - mn) / 255.0, 6) AS scale
FROM s ORDER BY vec_id
"""

# oracle aggregates RAW rows directly at the coarse grain; the query merges
# persisted fine-grain states — associativity says they must agree
ORACLES["ext_agg_merge_rollup"] = (
    "SELECT strftime(date_trunc('month', ts), '%Y-%m') AS month, event_type, "
    "COUNT(*) AS n, ROUND(SUM(value), 2) AS sum_v, "
    "ROUND(MIN(value), 2) AS min_v, ROUND(MAX(value), 2) AS max_v, "
    "ROUND(SUM(value) / COUNT(*), 4) AS avg_v "
    "FROM events GROUP BY 1, 2 ORDER BY 1, 2"
)

# the quantized ANN tier is deterministic end-to-end: dequantized coarse
# scores (round 4, id tie-break) pick the same top-50 in both engines, and
# the rerank reuses x2's exact-cosine convention
ORACLES["ext_ann_quantized"] = """
WITH s AS (
  SELECT vec_id, embedding,
         CAST(list_min(embedding) AS DOUBLE) AS mn,
         CAST(list_max(embedding) AS DOUBLE) AS mx
  FROM embeddings WHERE vec_id <> 0),
dq AS (
  SELECT vec_id,
    CASE WHEN mx = mn
         THEN list_transform(embedding, x -> mn + 128.0 * 0.0)
         ELSE list_transform(embedding, x ->
           mn + (CAST(CAST(floor((CAST(x AS DOUBLE) - mn) * 255.0 / (mx - mn) + 0.5) AS INT) - 128 AS DOUBLE) + 128.0)
                * ((mx - mn) / 255.0))
    END AS approx
  FROM s),
q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0),
coarse AS (
  SELECT d.vec_id,
         ROUND(list_cosine_similarity(d.approx, q.qv), 4) + 0.0 AS csim
  FROM dq d, q
  ORDER BY csim DESC, d.vec_id LIMIT 50)
SELECT e.vec_id,
       ROUND(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qv), 4) + 0.0 AS sim
FROM coarse c JOIN embeddings e USING (vec_id), q
ORDER BY sim DESC, e.vec_id LIMIT 5
"""

ORACLES["ext_batch_cosine_topk"] = """
WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
           FROM embeddings WHERE vec_id IN (0, 1, 2)),
scored AS (
  SELECT q.query_id, e.vec_id,
         ROUND(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qv), 4)
           + 0.0 AS sim
  FROM embeddings e CROSS JOIN q
  WHERE e.vec_id NOT IN (0, 1, 2)),
ranked AS (
  SELECT query_id, vec_id, sim,
         CAST(ROW_NUMBER() OVER (
           PARTITION BY query_id ORDER BY sim DESC, vec_id) AS BIGINT) AS rank
  FROM scored)
SELECT query_id, rank, sim, vec_id FROM ranked WHERE rank <= 3
ORDER BY query_id, rank
"""

# integer-exact mirror of lsh_bucket_int8: Rademacher +-1 planes over int8
# codes, generated from the SAME operators.similarity.rademacher_plane the
# Spark plan uses, so the two sides cannot drift.
_RADEMACHER_BITS = "\n       + ".join(
    "CASE WHEN list_sum(list_transform(list_zip(c, ["
    + ",".join(str(v) for v in rademacher_plane(j, 64))
    + "]::INT[]), z -> z[1]*z[2])) >= 0 THEN " + str(1 << j) + " ELSE 0 END"
    for j in range(4)
)
ORACLES["ext_ann_lsh_quantized"] = f"""
WITH s AS (
  SELECT vec_id, embedding,
         CAST(list_min(embedding) AS DOUBLE) AS mn,
         CAST(list_max(embedding) AS DOUBLE) AS mx
  FROM embeddings),
codes AS (
  SELECT vec_id, embedding,
    CASE WHEN mx = mn THEN list_transform(embedding, x -> 0)
         ELSE list_transform(embedding, x ->
           CAST(floor((CAST(x AS DOUBLE) - mn) * 255.0 / (mx - mn) + 0.5) AS INT) - 128)
    END AS c
  FROM s),
buck AS (
  SELECT vec_id, embedding,
       {_RADEMACHER_BITS}
       AS bucket
  FROM codes),
q AS (SELECT bucket AS qbucket, CAST(embedding AS DOUBLE[]) AS qv
      FROM buck WHERE vec_id = 0)
SELECT b.vec_id,
       ROUND(list_cosine_similarity(CAST(b.embedding AS DOUBLE[]), q.qv), 4) + 0.0 AS sim
FROM buck b, q
WHERE b.vec_id <> 0 AND b.bucket = q.qbucket
ORDER BY sim DESC, b.vec_id LIMIT 5
"""

# multi-probe: query bucket plus its 4 Hamming-1 neighbors (XOR of each bit)
ORACLES["ext_ann_lsh_multiprobe"] = f"""
WITH s AS (
  SELECT vec_id, embedding,
         CAST(list_min(embedding) AS DOUBLE) AS mn,
         CAST(list_max(embedding) AS DOUBLE) AS mx
  FROM embeddings),
codes AS (
  SELECT vec_id, embedding,
    CASE WHEN mx = mn THEN list_transform(embedding, x -> 0)
         ELSE list_transform(embedding, x ->
           CAST(floor((CAST(x AS DOUBLE) - mn) * 255.0 / (mx - mn) + 0.5) AS INT) - 128)
    END AS c
  FROM s),
buck AS (
  SELECT vec_id, embedding,
       {{_RADEMACHER_BITS}}
       AS bucket
  FROM codes),
probes AS (
  SELECT DISTINCT xor(b.bucket, f.flip) AS qbucket
  FROM (SELECT bucket FROM buck WHERE vec_id = 0) b
  CROSS JOIN (SELECT unnest([0, 1, 2, 4, 8]) AS flip) f),
q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM buck WHERE vec_id = 0)
SELECT b.vec_id,
       ROUND(list_cosine_similarity(CAST(b.embedding AS DOUBLE[]), q.qv), 4) + 0.0 AS sim
FROM buck b JOIN probes p ON b.bucket = p.qbucket, q
WHERE b.vec_id <> 0
ORDER BY sim DESC, b.vec_id LIMIT 5
"""
ORACLES["ext_ann_lsh_multiprobe"] = ORACLES["ext_ann_lsh_multiprobe"].replace(
    "{_RADEMACHER_BITS}", _RADEMACHER_BITS
)


ORACLES["ext_heavy_hitters"] = f"""
WITH g AS (SELECT unnest(generate_series(0, 3)) AS i),
cms AS (
  SELECT i, {md5long("CONCAT(i, ':', CAST(user_id AS VARCHAR))")} % 256 AS bucket,
         COUNT(*) AS c
  FROM events CROSS JOIN g GROUP BY 1, 2),
keys AS (SELECT user_id, COUNT(*) AS true_c FROM events GROUP BY 1),
probes AS (
  SELECT k.user_id, k.true_c, g.i,
         {md5long("CONCAT(g.i, ':', CAST(k.user_id AS VARCHAR))")} % 256 AS bucket
  FROM keys k CROSS JOIN g),
est AS (
  SELECT p.user_id, ANY_VALUE(p.true_c) AS true_c, MIN(c.c) AS est
  FROM probes p JOIN cms c ON p.i = c.i AND p.bucket = c.bucket
  GROUP BY p.user_id)
SELECT user_id, est, true_c FROM est
ORDER BY est DESC, user_id LIMIT 10
"""

# the frame orders on WHOLE epoch seconds exactly like the Spark side's
# cast("long") — ordering on raw ts would let sub-second components flip
# frame membership at rows exactly 1h apart (first observed at sf0.1)
ORACLES["ext_moving_avg"] = """
WITH e AS (
  SELECT event_id, event_type, value,
         CAST(FLOOR(epoch(ts)) AS BIGINT) AS t
  FROM events WHERE user_id < 100)
SELECT event_id, event_type,
  ROUND(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) OVER (
    PARTITION BY event_type ORDER BY t
    RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
    / (100.0 * COUNT(*) OVER (
    PARTITION BY event_type ORDER BY t
    RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)), 4)
    AS trailing_avg_1h,
  COUNT(*) OVER (
    PARTITION BY event_type ORDER BY t
    RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
    AS n_in_1h
FROM e
ORDER BY event_id
"""

ORACLES["ext_tpch_q5"] = """
SELECT n_name,
       SUM(CAST(ROUND(l_extendedprice * (1.0 - l_discount) * 100, 0) AS BIGINT)) / 100.0
         AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
GROUP BY n_name
ORDER BY revenue DESC, n_name
"""

# exact integer 3-sigma predicate — cross-multiplied, no fp mean/stddev
ORACLES["ext_outliers"] = """
WITH b AS (
  SELECT event_id, event_type, value,
         CAST(CAST(ROUND(value * 100, 0) AS BIGINT) AS HUGEINT) AS xc
  FROM events WHERE user_id < 100),
g AS (
  SELECT *, COUNT(*) OVER w AS n, SUM(xc) OVER w AS s, SUM(xc * xc) OVER w AS ss
  FROM b WINDOW w AS (PARTITION BY event_type))
SELECT event_id, event_type, value FROM g
WHERE n >= 2 AND (n * ss - s * s) > 0
  AND (xc * n - s) * (xc * n - s) * (n - 1) > 9 * n * (n * ss - s * s)
ORDER BY event_id
"""


ORACLES["ext_minhash_est_jaccard"] = f"""
WITH {_SHINGLE_CTES}, {_minhash_sig_cte()}, {_band_cte()}, {_PAIRS_CTE},
est AS (
  SELECT p.doc_a, p.doc_b,
         ((CASE WHEN sa.m0 = sb.m0 THEN 1 ELSE 0 END) + (CASE WHEN sa.m1 = sb.m1 THEN 1 ELSE 0 END) + (CASE WHEN sa.m2 = sb.m2 THEN 1 ELSE 0 END) + (CASE WHEN sa.m3 = sb.m3 THEN 1 ELSE 0 END) + (CASE WHEN sa.m4 = sb.m4 THEN 1 ELSE 0 END) + (CASE WHEN sa.m5 = sb.m5 THEN 1 ELSE 0 END) + (CASE WHEN sa.m6 = sb.m6 THEN 1 ELSE 0 END) + (CASE WHEN sa.m7 = sb.m7 THEN 1 ELSE 0 END) + (CASE WHEN sa.m8 = sb.m8 THEN 1 ELSE 0 END) + (CASE WHEN sa.m9 = sb.m9 THEN 1 ELSE 0 END) + (CASE WHEN sa.m10 = sb.m10 THEN 1 ELSE 0 END) + (CASE WHEN sa.m11 = sb.m11 THEN 1 ELSE 0 END) + (CASE WHEN sa.m12 = sb.m12 THEN 1 ELSE 0 END) + (CASE WHEN sa.m13 = sb.m13 THEN 1 ELSE 0 END) + (CASE WHEN sa.m14 = sb.m14 THEN 1 ELSE 0 END) + (CASE WHEN sa.m15 = sb.m15 THEN 1 ELSE 0 END)) / 16.0 AS est_jaccard
  FROM pairs p JOIN sigs sa ON sa.doc_id = p.doc_a
               JOIN sigs sb ON sb.doc_id = p.doc_b),
sizes AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_sh FROM hashes GROUP BY doc_id),
inter AS (
  SELECT p.doc_a, p.doc_b, CAST(COUNT(*) AS BIGINT) AS n_inter
  FROM pairs p
  JOIN hashes ha ON ha.doc_id = p.doc_a
  JOIN hashes hb ON hb.doc_id = p.doc_b AND hb.h = ha.h
  GROUP BY p.doc_a, p.doc_b),
ex AS (
  SELECT i.doc_a, i.doc_b,
         ROUND(CAST(n_inter AS DOUBLE) / CAST(sa.n_sh + sb.n_sh - n_inter AS DOUBLE), 4) AS jaccard
  FROM inter i
  JOIN sizes sa ON sa.doc_id = i.doc_a
  JOIN sizes sb ON sb.doc_id = i.doc_b)
SELECT e.doc_a, e.doc_b, e.est_jaccard, x.jaccard,
       ROUND(ABS(e.est_jaccard - x.jaccard), 4) AS est_err
FROM est e JOIN ex x ON e.doc_a = x.doc_a AND e.doc_b = x.doc_b
ORDER BY e.doc_a, e.doc_b
"""

# per-dim stats from exact HUGEINT sums; every later op is the same IEEE
# double expression as the Spark side, so arrays compare bit-identically
# shared z-normalization chain: scalar (vec_id, dim, z) rows
_ZSCORE_CTES = """
WITH idx AS (
  SELECT vec_id, embedding,
         unnest(generate_series(1, len(embedding))) AS ord
  FROM embeddings),
e AS (
  SELECT vec_id, CAST(ord AS INT) - 1 AS dim,
         CAST(embedding[ord] AS DOUBLE) AS x
  FROM idx),
q AS (
  SELECT vec_id, dim, x,
         CAST(CAST(ROUND(x * 1000000, 0) AS BIGINT) AS HUGEINT) AS xq
  FROM e),
st AS (
  SELECT dim, CAST(COUNT(*) AS DOUBLE) AS n, CAST(SUM(xq) AS DOUBLE) AS s,
         CAST(SUM(xq * xq) AS DOUBLE) AS ss
  FROM q GROUP BY dim),
z AS (
  SELECT vec_id, q.dim,
         CASE WHEN (n * ss - s * s) > 0
              THEN ROUND((ROUND(x * 1000000, 0) * n - s)
                         * sqrt((n - 1) / (n * (n * ss - s * s))), 6)
              ELSE 0.0 END AS z
  FROM q JOIN st ON q.dim = st.dim)
"""

ORACLES["ext_zscore_embeddings"] = (
    _ZSCORE_CTES
    + "SELECT vec_id, list(z ORDER BY dim) AS norm FROM z"
    + " GROUP BY vec_id ORDER BY vec_id"
)

# the driver-hashable flat twin: array columns hash engine-dependently on a
# pandas/arrow fetch path (numpy repr vs list repr — caught by
# tools/certify_window.py), so the rotation window carries scalar rows
ORACLES["ext_zscore_flat"] = (
    _ZSCORE_CTES
    + "SELECT vec_id, CAST(dim AS INT) AS dim, z FROM z ORDER BY vec_id, dim"
)


# integer PageRank: 5 iterations unrolled as chained CTEs (all-integer
# updates -- no recursive aggregates, no fp summation anywhere)
_PR_ITERS = 5
_PR_SCALE = 10**12
_pr_cte = """
edges AS (SELECT doc_a AS a, doc_b AS b FROM pairs
          UNION SELECT doc_b, doc_a FROM pairs),
deg AS (SELECT a, CAST(COUNT(*) AS BIGINT) AS deg FROM edges GROUP BY a),
consts AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM deg),
pr0 AS (SELECT a AS node, CAST(%(S)d // n AS BIGINT) AS rank FROM deg, consts)"""
for _k in range(1, _PR_ITERS + 1):
    _pr_cte += """,
pr%(k)d AS (
  SELECT d.a AS node,
         CAST((15 * (%(S)d // c.n)) // 100
              + (85 * COALESCE(inc.s, 0)) // 100 AS BIGINT) AS rank
  FROM deg d CROSS JOIN consts c
  LEFT JOIN (
    SELECT e.b AS node, SUM(p.rank // dd.deg) AS s
    FROM edges e JOIN pr%(km1)d p ON p.node = e.a JOIN deg dd ON dd.a = e.a
    GROUP BY e.b) inc ON inc.node = d.a)""" % {"k": _k, "km1": _k - 1, "S": 10**12}
_pr_cte = _pr_cte % {"S": 10**12} if "%(S)d" in _pr_cte else _pr_cte

ORACLES["ext_pagerank"] = (
    f"WITH {_SHINGLE_CTES}, {_minhash_sig_cte()}, {_band_cte()}, {_PAIRS_CTE}, "
    + _pr_cte
    + f" SELECT node AS doc_id, rank FROM pr{_PR_ITERS} "
    "ORDER BY rank DESC, doc_id LIMIT 20"
)


# personalized variant: pr0 mass and the 15% restart both concentrate at
# the seed (graph-min node) instead of spreading uniformly
_ppr_cte = """
edges AS (SELECT doc_a AS a, doc_b AS b FROM pairs
          UNION SELECT doc_b, doc_a FROM pairs),
deg AS (SELECT a, CAST(COUNT(*) AS BIGINT) AS deg FROM edges GROUP BY a),
consts AS (SELECT CAST(MIN(a) AS BIGINT) AS seed FROM edges),
ppr0 AS (SELECT a AS node,
                CAST(CASE WHEN a = c.seed THEN %(S)d ELSE 0 END AS BIGINT) AS rank
         FROM deg, consts c)"""
for _k in range(1, _PR_ITERS + 1):
    _ppr_cte += """,
ppr%(k)d AS (
  SELECT d.a AS node,
         CAST(CASE WHEN d.a = c.seed THEN (15 * %(S)d) // 100 ELSE 0 END
              + (85 * COALESCE(inc.s, 0)) // 100 AS BIGINT) AS rank
  FROM deg d CROSS JOIN consts c
  LEFT JOIN (
    SELECT e.b AS node, SUM(p.rank // dd.deg) AS s
    FROM edges e JOIN ppr%(km1)d p ON p.node = e.a JOIN deg dd ON dd.a = e.a
    GROUP BY e.b) inc ON inc.node = d.a)""" % {"k": _k, "km1": _k - 1, "S": _PR_SCALE}
_ppr_cte = _ppr_cte % {"S": _PR_SCALE}

ORACLES["ext_pagerank_personalized"] = (
    f"WITH {_SHINGLE_CTES}, {_minhash_sig_cte()}, {_band_cte()}, {_PAIRS_CTE}, "
    + _ppr_cte
    + f" SELECT node AS doc_id, rank FROM ppr{_PR_ITERS} WHERE rank > 0 "
    "ORDER BY rank DESC, doc_id LIMIT 20"
)

ORACLES["ext_corpus_report"] = f"""
WITH feat AS (
  SELECT doc_id, text, lang,
         length(text) AS n_chars,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
         len(list_filter({TOKS}, t -> t IN {EN_PROFILE_SQL})) AS n_stop,
         length(regexp_replace(text, '[\\w\\s]', '', 'g')) AS n_punct
  FROM documents),
scored AS (
  SELECT *,
    ROUND(GREATEST(LEAST(
      (CASE WHEN n_tokens >= 5 AND n_tokens <= 100000 THEN 0.5 ELSE 0.0 END)
      + LEAST((CASE WHEN n_tokens > 0 THEN CAST(n_stop AS DOUBLE) / n_tokens ELSE 0.0 END) * 2.0, 0.5)
      - LEAST((CASE WHEN n_chars > 0 THEN CAST(n_punct AS DOUBLE) / n_chars ELSE 0.0 END) * 2.0, 0.25),
      1.0), 0.0), 4) AS quality
  FROM feat),
agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
         CAST(SUM(n_tokens) AS BIGINT) AS tok,
         CAST(SUM(CAST(ROUND(quality * 10000, 0) AS BIGINT)) AS BIGINT) AS qsum,
         CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS n_en,
         CAST(COUNT(DISTINCT md5(text)) AS BIGINT) AS n_uniq
  FROM scored)
SELECT u.metric, u.value FROM agg, LATERAL (
  VALUES ('n_docs', CAST(n AS DOUBLE)),
         ('n_langs', CAST(n_langs AS DOUBLE)),
         ('total_tokens', CAST(tok AS DOUBLE)),
         ('avg_quality', ROUND(CAST(qsum AS DOUBLE) / 10000.0 / CAST(n AS DOUBLE), 4)),
         ('pct_en', ROUND(CAST(n_en AS DOUBLE) / n, 4)),
         ('dup_rate', ROUND(1.0 - CAST(n_uniq AS DOUBLE) / n, 4)),
         ('avg_tokens', ROUND(CAST(tok AS DOUBLE) / n, 4))
) AS u(metric, value)
ORDER BY u.metric
"""

ORACLES["ext_join_cardinality"] = f"""
WITH g AS (SELECT unnest(generate_series(0, 3)) AS i),
lo AS (SELECT user_id FROM events WHERE event_id % 2 = 0),
hi AS (SELECT user_id FROM events WHERE event_id % 2 = 1),
ca AS (SELECT i, {md5long("CONCAT(i, ':', CAST(user_id AS VARCHAR))")} % 256 AS bucket,
              CAST(COUNT(*) AS BIGINT) AS c
       FROM lo CROSS JOIN g GROUP BY 1, 2),
cb AS (SELECT i, {md5long("CONCAT(i, ':', CAST(user_id AS VARCHAR))")} % 256 AS bucket,
              CAST(COUNT(*) AS BIGINT) AS c
       FROM hi CROSS JOIN g GROUP BY 1, 2),
ip AS (SELECT a.i, CAST(SUM(a.c * b.c) AS BIGINT) AS ip
       FROM ca a JOIN cb b ON a.i = b.i AND a.bucket = b.bucket GROUP BY a.i),
est AS (SELECT CAST(MIN(ip) AS BIGINT) AS est FROM ip),
tru AS (
  SELECT CAST(SUM(na * nb) AS BIGINT) AS true_card FROM
    (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS na FROM lo GROUP BY 1) x
    JOIN (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS nb FROM hi GROUP BY 1) y
    USING (user_id))
SELECT est, true_card,
       ROUND((est - true_card) / CAST(true_card AS DOUBLE), 4) AS rel_err
FROM est, tru
"""

# oracle is the NEW snapshot itself: old + delta must reconstruct it exactly
ORACLES["ext_apply_cdc"] = """
SELECT event_id, event_type,
       CASE WHEN event_id % 7 = 0 THEN CAST(ROUND(value * 100) AS BIGINT) * 2
            ELSE CAST(ROUND(value * 100) AS BIGINT) END AS cents
FROM events WHERE event_id % 3 <> 0
ORDER BY event_id
"""

ORACLES["ext_cohort_retention"] = """
WITH act AS (
  SELECT DISTINCT user_id, date_trunc('week', ts) AS wk FROM events),
first AS (
  SELECT user_id, MIN(wk) AS cohort FROM act GROUP BY user_id)
SELECT strftime(f.cohort, '%Y-%m-%d') AS cohort,
       CAST(date_diff('day', f.cohort, a.wk) / 7 AS INT) AS week_offset,
       CAST(COUNT(DISTINCT a.user_id) AS BIGINT) AS n_users
FROM act a JOIN first f USING (user_id)
GROUP BY 1, 2 ORDER BY 1, 2
"""

ORACLES["ext_phrase_search"] = f"""
WITH toks AS (SELECT doc_id, {TOKS} AS tk FROM documents),
pos AS (
  SELECT doc_id, unnest(generate_series(1, len(tk) - 1)) AS i, tk
  FROM toks WHERE len(tk) >= 2)
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_occurrences
FROM pos WHERE tk[i] = 'window' AND tk[i + 1] = 'join'
GROUP BY doc_id ORDER BY n_occurrences DESC, doc_id LIMIT 10
"""

ORACLES["ext_search_and"] = f"""
WITH toks AS (SELECT doc_id, unnest({TOKS}) AS tok FROM documents),
hits AS (
  SELECT DISTINCT doc_id, tok FROM toks
  WHERE tok IN ('spark', 'join', 'window'))
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_terms
FROM hits GROUP BY doc_id HAVING COUNT(*) = 3
ORDER BY doc_id LIMIT 10
"""

ORACLES["ext_snippets"] = """
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS raw,
         list_position(
           list_transform(string_split(text, ' '),
                          x -> regexp_replace(lower(x), '[^a-z0-9]', '', 'g')),
           'spark') AS pos
  FROM documents)
SELECT doc_id, CAST(pos AS BIGINT) AS pos,
       array_to_string(
         list_slice(raw, GREATEST(pos - 3, 1), pos + 3), ' ') AS snippet
FROM t WHERE pos IS NOT NULL AND pos > 0
ORDER BY doc_id LIMIT 20
"""

ORACLES["ext_containment"] = f"""
WITH {_SHINGLE_CTES}, {_minhash_sig_cte()}, {_band_cte()}, {_PAIRS_CTE},
sizes AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_sh FROM hashes GROUP BY doc_id),
inter AS (
  SELECT p.doc_a, p.doc_b, CAST(COUNT(*) AS BIGINT) AS n_inter
  FROM pairs p
  JOIN hashes ha ON ha.doc_id = p.doc_a
  JOIN hashes hb ON hb.doc_id = p.doc_b AND hb.h = ha.h
  GROUP BY p.doc_a, p.doc_b)
SELECT i.doc_a, i.doc_b,
       ROUND(CAST(n_inter AS DOUBLE) / sa.n_sh, 4) AS in_a,
       ROUND(CAST(n_inter AS DOUBLE) / sb.n_sh, 4) AS in_b
FROM inter i
JOIN sizes sa ON sa.doc_id = i.doc_a
JOIN sizes sb ON sb.doc_id = i.doc_b
ORDER BY i.doc_a, i.doc_b
"""

ORACLES["ext_verified_clusters"] = (
    f"WITH RECURSIVE {_SHINGLE_CTES}, {_minhash_sig_cte()}, {_band_cte()}, "
    f"{_PAIRS_CTE}, "
    "sizes AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_sh "
    "FROM hashes GROUP BY doc_id), "
    "inter AS (SELECT p.doc_a, p.doc_b, CAST(COUNT(*) AS BIGINT) AS n_inter "
    "FROM pairs p JOIN hashes ha ON ha.doc_id = p.doc_a "
    "JOIN hashes hb ON hb.doc_id = p.doc_b AND hb.h = ha.h "
    "GROUP BY p.doc_a, p.doc_b), "
    "vpairs AS (SELECT i.doc_a, i.doc_b FROM inter i "
    "JOIN sizes sa ON sa.doc_id = i.doc_a JOIN sizes sb ON sb.doc_id = i.doc_b "
    "WHERE CAST(n_inter AS DOUBLE) / CAST(sa.n_sh + sb.n_sh - n_inter AS DOUBLE) >= 0.5), "
    "vedges AS (SELECT doc_a AS a, doc_b AS b FROM vpairs "
    "UNION SELECT doc_b, doc_a FROM vpairs), "
    "vreach AS (SELECT a, b FROM vedges "
    "UNION SELECT r.a, e.b FROM vreach r JOIN vedges e ON r.b = e.a) "
    "SELECT a AS doc_id, MIN(b) AS cluster_id FROM vreach GROUP BY a "
    "ORDER BY doc_id"
)


# precision@10 of the q20 BM25 ranking vs the conjunctive relevance rule
ORACLES["ext_retrieval_eval"] = f"""
WITH ranked AS ({ORACLES['q20_bm25_search']}),
toksr AS (SELECT doc_id, unnest({TOKS}) AS tok FROM documents),
rel AS (
  SELECT doc_id FROM (
    SELECT DISTINCT doc_id, tok FROM toksr WHERE tok IN ('spark', 'join'))
  GROUP BY doc_id HAVING COUNT(*) = 2)
SELECT ROUND(AVG(CASE WHEN rel.doc_id IS NOT NULL THEN 1.0 ELSE 0.0 END), 4)
         AS p_at_10,
       CAST(COUNT(*) AS BIGINT) AS k
FROM ranked LEFT JOIN rel ON ranked.doc_id = rel.doc_id
"""


ORACLES["ext_ndcg"] = f"""
WITH ranked AS ({ORACLES['q20_bm25_search']}),
toksn AS (SELECT doc_id, unnest({TOKS}) AS tok FROM documents),
grades AS (
  SELECT doc_id, CAST(COUNT(*) AS DOUBLE) AS rel FROM (
    SELECT DISTINCT doc_id, tok FROM toksn WHERE tok IN ('spark', 'join'))
  GROUP BY doc_id),
g AS (
  SELECT r.doc_id, r.score, COALESCE(gr.rel, 0.0) AS rel
  FROM ranked r LEFT JOIN grades gr ON r.doc_id = gr.doc_id),
w AS (
  SELECT (pow(2.0, rel) - 1.0)
           / log2(CAST(ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS DOUBLE) + 1.0) AS dg,
         (pow(2.0, rel) - 1.0)
           / log2(CAST(ROW_NUMBER() OVER (ORDER BY rel DESC, doc_id) AS DOUBLE) + 1.0) AS idg
  FROM g)
SELECT ROUND(SUM(dg) / SUM(idg), 4) AS ndcg_at_10,
       ROUND(SUM(dg), 4) AS dcg, ROUND(SUM(idg), 4) AS idcg
FROM w
"""


ORACLES["ext_split_leakage"] = f"""
WITH s AS (
  SELECT text,
         CASE WHEN {md5long("CAST(doc_id AS VARCHAR)")} % 10000 < 2000
              THEN 'test' ELSE 'train' END AS split
  FROM documents),
g AS (
  SELECT md5(text) AS h,
         CAST(SUM(CASE WHEN split = 'train' THEN 1 ELSE 0 END) AS BIGINT) AS n_train,
         CAST(SUM(CASE WHEN split = 'test' THEN 1 ELSE 0 END) AS BIGINT) AS n_test
  FROM s GROUP BY md5(text))
SELECT CAST(COUNT(*) AS BIGINT) AS leaked_texts,
       CAST(COALESCE(SUM(n_test), 0) AS BIGINT) AS test_docs_affected,
       CAST(COALESCE(SUM(n_train), 0) AS BIGINT) AS train_docs_leaking
FROM g WHERE n_train > 0 AND n_test > 0
"""


ORACLES["ext_importance_sample"] = f"""
WITH feat AS (
  SELECT doc_id,
         length(text) AS n_chars,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
         len(list_filter({TOKS}, t -> t IN {EN_PROFILE_SQL})) AS n_stop,
         length(regexp_replace(text, '[\\w\\s]', '', 'g')) AS n_punct
  FROM documents),
scored AS (
  SELECT doc_id,
    CAST(ROUND(ROUND(GREATEST(LEAST(
      (CASE WHEN n_tokens >= 5 AND n_tokens <= 100000 THEN 0.5 ELSE 0.0 END)
      + LEAST((CASE WHEN n_tokens > 0 THEN CAST(n_stop AS DOUBLE) / n_tokens ELSE 0.0 END) * 2.0, 0.5)
      - LEAST((CASE WHEN n_chars > 0 THEN CAST(n_punct AS DOUBLE) / n_chars ELSE 0.0 END) * 2.0, 0.25),
      1.0), 0.0), 4) * 10000, 0) AS BIGINT) AS rate_bps
  FROM feat)
SELECT doc_id, rate_bps FROM scored
WHERE {md5long("CONCAT(CAST(doc_id AS VARCHAR), 'is')")} % 10000 < rate_bps
ORDER BY doc_id
"""

ORACLES["ext_robust_trend"] = """
WITH e AS (
  SELECT event_type, CAST(epoch(ts) AS BIGINT) AS t,
         CAST(ROUND(value * 100) AS BIGINT) AS v
  FROM events WHERE user_id < 10),
slopes AS (
  SELECT a.event_type, (b.v - a.v) / CAST(b.t - a.t AS DOUBLE) AS s
  FROM e a JOIN e b ON a.event_type = b.event_type AND a.t < b.t),
n AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_points FROM e GROUP BY 1)
SELECT n.event_type, n.n_points,
       ROUND(COALESCE(m.med, 0.0), 6) AS slope_cents_per_s
FROM n LEFT JOIN (
  SELECT event_type, MEDIAN(s) AS med FROM slopes GROUP BY 1) m
  USING (event_type)
ORDER BY n.event_type
"""


ORACLES["ext_best_survivor"] = (
    f"WITH RECURSIVE {_SHINGLE_CTES}, {_minhash_sig_cte()}, {_band_cte()}, "
    f"{_PAIRS_CTE}, {_CLUSTER_SQL_TAIL}, "
    "clusters AS (SELECT a AS doc_id, MIN(b) AS cluster_id FROM reach GROUP BY a), "
    "feat AS ("
    "  SELECT doc_id, length(text) AS n_chars, "
    "         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens, "
    f"         len(list_filter({TOKS}, t -> t IN {EN_PROFILE_SQL})) AS n_stop, "
    r"         length(regexp_replace(text, '[\w\s]', '', 'g')) AS n_punct "
    "  FROM documents), "
    "scored AS ("
    "  SELECT doc_id, ROUND(GREATEST(LEAST("
    "    (CASE WHEN n_tokens >= 5 AND n_tokens <= 100000 THEN 0.5 ELSE 0.0 END)"
    "    + LEAST((CASE WHEN n_tokens > 0 THEN CAST(n_stop AS DOUBLE) / n_tokens ELSE 0.0 END) * 2.0, 0.5)"
    "    - LEAST((CASE WHEN n_chars > 0 THEN CAST(n_punct AS DOUBLE) / n_chars ELSE 0.0 END) * 2.0, 0.25),"
    "    1.0), 0.0), 4) AS quality FROM feat), "
    "ranked AS ("
    "  SELECT c.cluster_id, c.doc_id, s.quality, "
    "         ROW_NUMBER() OVER (PARTITION BY c.cluster_id "
    "                            ORDER BY s.quality DESC, c.doc_id) AS rn, "
    "         COUNT(*) OVER (PARTITION BY c.cluster_id) AS cluster_size "
    "  FROM clusters c JOIN scored s USING (doc_id)) "
    "SELECT cluster_id, doc_id AS survivor, quality, "
    "       CAST(cluster_size AS BIGINT) AS cluster_size "
    "FROM ranked WHERE rn = 1 ORDER BY cluster_id"
)

ORACLES["ext_lang_confusion"] = (
    "WITH toks AS (SELECT doc_id, lang, " + TOKS + " AS tk FROM documents), "
    "scores AS ("
    + " UNION ALL ".join(
        f"SELECT doc_id, lang, '{lang}' AS plang, "
        f"len(list_filter(tk, t -> t IN {words})) AS hits FROM toks"
        for lang, words in _LANG_PROFILES_SQL.items()
    )
    + "), ranked AS (SELECT doc_id, lang, plang, hits, row_number() OVER ("
    "PARTITION BY doc_id ORDER BY hits DESC, plang DESC) AS rn FROM scores), "
    "pred AS (SELECT doc_id, lang, CASE WHEN hits > 0 THEN plang ELSE 'und' END "
    "AS lang_pred FROM ranked WHERE rn = 1) "
    "SELECT lang, lang_pred, CAST(COUNT(*) AS BIGINT) AS n FROM pred "
    "GROUP BY 1, 2 ORDER BY 1, 2"
)

ORACLES["ext_session_funnel"] = """
WITH g AS (
  SELECT user_id, ts, event_type,
         CASE WHEN epoch(ts) - LAG(epoch(ts)) OVER w IS NULL
                OR epoch(ts) - LAG(epoch(ts)) OVER w > 1800
              THEN 1 ELSE 0 END AS newflag
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
s AS (
  SELECT user_id, ts, event_type,
         SUM(newflag) OVER (PARTITION BY user_id ORDER BY ts
                            ROWS UNBOUNDED PRECEDING) AS session_idx
  FROM g),
per AS (
  SELECT user_id, session_idx,
         MIN(CASE WHEN event_type = 'signup' THEN ts END) AS fs,
         MAX(CASE WHEN event_type = 'purchase' THEN ts END) AS lp
  FROM s GROUP BY 1, 2)
SELECT user_id, CAST(COUNT(*) AS BIGINT) AS converted_sessions
FROM per WHERE fs IS NOT NULL AND lp IS NOT NULL AND fs < lp
GROUP BY 1 ORDER BY 1
"""

# oracle = FULL rebuild of daily states from the new snapshot; the query
# refreshes only delta-touched buckets -- they must agree exactly
ORACLES["ext_incremental_agg"] = """
WITH newsnap AS (
  SELECT event_id, ts, event_type,
         CASE WHEN event_id % 7 = 0
              THEN CAST(ROUND(value * 100) AS BIGINT) * 2 / 100.0
              ELSE CAST(ROUND(value * 100) AS BIGINT) / 100.0 END AS value
  FROM events WHERE event_id % 3 <> 0)
SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day, event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(SUM(value), 2) AS sum_v,
       ROUND(MIN(value), 2) AS min_v,
       ROUND(MAX(value), 2) AS max_v
FROM newsnap GROUP BY 1, 2 ORDER BY 1, 2
"""


ORACLES["ext_mrr"] = f"""
WITH ranked AS ({ORACLES['q20_bm25_search']}),
tokm AS (SELECT doc_id, unnest({TOKS}) AS tok FROM documents),
grades AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS rel FROM (
    SELECT DISTINCT doc_id, tok FROM tokm WHERE tok IN ('spark', 'join'))
  GROUP BY doc_id),
g AS (
  SELECT ROW_NUMBER() OVER (ORDER BY r.score DESC, r.doc_id) AS rank,
         COALESCE(gr.rel, 0) AS rel
  FROM ranked r LEFT JOIN grades gr ON r.doc_id = gr.doc_id)
SELECT ROUND(COALESCE(1.0 / MIN(CASE WHEN rel >= 2 THEN rank END), 0.0), 4) AS mrr
FROM g
"""

# per-query retrieval metrics leg — graded relevance DELIBERATELY sparser
# than the ranking signal (real judgments are not the ranker's features):
# grade 2 = the exact adjacent phrase "t1 t2" in the raw lowercased text,
# grade 1 = both terms anywhere (token-normalized), 0 otherwise. P@10
# counts grade >= 1; MRR demands grade 2; nDCG uses the grades with an
# idcg=0 guard. Each leg self-contained (WITH inside a derived table) so
# four legs UNION ALL into the suite.
def _eval_leg(t1: str, t2: str) -> str:
    label = f"{t1}+{t2}"
    return f"""
SELECT '{label}' AS query, p_at_10, mrr, ndcg_at_10 FROM (
WITH ranked AS ({_bm25_ranked((t1, t2))}),
tokq AS (SELECT doc_id, unnest({TOKS}) AS tok FROM documents),
grades AS (
  SELECT COALESCE(b.doc_id, p.doc_id) AS doc_id,
    CASE WHEN p.doc_id IS NOT NULL THEN 2 ELSE 1 END AS rel
  FROM (
    SELECT doc_id FROM (
      SELECT DISTINCT doc_id, tok FROM tokq WHERE tok IN ('{t1}', '{t2}'))
    GROUP BY doc_id HAVING COUNT(*) = 2) b
  FULL JOIN (
    SELECT doc_id FROM documents
    WHERE lower(text) LIKE '%{t1} {t2}%') p
  ON b.doc_id = p.doc_id),
g AS (
  SELECT r.doc_id,
         ROW_NUMBER() OVER (ORDER BY r.score DESC, r.doc_id) AS rank,
         COALESCE(gr.rel, 0) AS rel
  FROM ranked r LEFT JOIN grades gr ON r.doc_id = gr.doc_id),
w AS (
  SELECT rank, rel,
    (pow(2.0, CAST(rel AS DOUBLE)) - 1.0)
      / log2(CAST(rank AS DOUBLE) + 1.0) AS dg,
    (pow(2.0, CAST(rel AS DOUBLE)) - 1.0)
      / log2(CAST(ROW_NUMBER() OVER (ORDER BY rel DESC, doc_id) AS DOUBLE) + 1.0) AS idg
  FROM g)
SELECT
  ROUND(AVG(CASE WHEN rel >= 1 THEN 1.0 ELSE 0.0 END), 4) AS p_at_10,
  ROUND(COALESCE(1.0 / MIN(CASE WHEN rel >= 2 THEN rank END), 0.0), 4) AS mrr,
  ROUND(CASE WHEN SUM(idg) = 0 THEN 0.0 ELSE SUM(dg) / SUM(idg) END, 4) AS ndcg_at_10
FROM w)
"""


EVAL_SUITE_PAIRS = [
    ("spark", "join"),
    ("merge", "join"),
    ("column", "scan"),
    ("group", "order"),
]

ORACLES["ext_retrieval_eval_suite"] = (
    " UNION ALL ".join(_eval_leg(a, b) for a, b in EVAL_SUITE_PAIRS)
    + " ORDER BY query"
)

ORACLES["ext_degree_distribution"] = (
    f"WITH {_SHINGLE_CTES}, {_minhash_sig_cte()}, {_band_cte()}, {_PAIRS_CTE}, "
    "deg AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS degree FROM ("
    "  SELECT doc_a AS doc_id FROM pairs UNION ALL SELECT doc_b FROM pairs) "
    "GROUP BY doc_id) "
    "SELECT degree, CAST(COUNT(*) AS BIGINT) AS n_docs FROM deg "
    "GROUP BY degree ORDER BY degree"
)

ORACLES["ext_index_stats"] = f"""
WITH toki AS (SELECT doc_id, unnest({TOKS}) AS token FROM documents),
postings AS (SELECT doc_id, token, COUNT(*) AS tf FROM toki GROUP BY 1, 2),
dfreq AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS df FROM postings GROUP BY token),
stats AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_terms,
         ROUND(AVG(CAST(df AS DOUBLE)), 4) AS avg_df,
         MAX(df) AS max_df
  FROM dfreq),
top AS (
  SELECT token AS top_term FROM dfreq ORDER BY df DESC, token DESC LIMIT 1),
np AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_postings FROM postings)
SELECT s.n_terms, np.n_postings, s.avg_df, s.max_df, t.top_term
FROM stats s, np, top t
"""

ORACLES["ext_cms_range_query"] = f"""
WITH g AS (SELECT unnest(generate_series(0, 3)) AS i),
first3 AS (
  SELECT DISTINCT date_trunc('day', ts) AS day FROM events
  ORDER BY day LIMIT 3),
e3 AS (
  SELECT user_id FROM events
  WHERE date_trunc('day', ts) IN (SELECT day FROM first3)),
cms AS (
  SELECT i, {md5long("CONCAT(i, ':', CAST(user_id AS VARCHAR))")} % 256 AS bucket,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM e3 CROSS JOIN g GROUP BY 1, 2),
keys AS (SELECT user_id, COUNT(*) AS true_c FROM e3 GROUP BY 1),
probes AS (
  SELECT k.user_id, k.true_c, g.i,
         {md5long("CONCAT(g.i, ':', CAST(k.user_id AS VARCHAR))")} % 256 AS bucket
  FROM keys k CROSS JOIN g),
est AS (
  SELECT p.user_id, ANY_VALUE(p.true_c) AS true_c, MIN(c.c) AS est
  FROM probes p JOIN cms c ON p.i = c.i AND p.bucket = c.bucket
  GROUP BY p.user_id)
SELECT user_id, est, CAST(true_c AS BIGINT) AS true_c FROM est
ORDER BY est DESC, user_id LIMIT 5
"""

ORACLES["ext_vocab_growth"] = f"""
WITH tokv AS (SELECT doc_id, unnest({TOKS}) AS tok FROM documents),
m AS (SELECT MAX(doc_id) AS m FROM documents)
SELECT
  CAST(COUNT(DISTINCT CASE WHEN doc_id * 100 <= m * 20 THEN tok END) AS BIGINT) AS vocab_20,
  CAST(COUNT(DISTINCT CASE WHEN doc_id * 100 <= m * 40 THEN tok END) AS BIGINT) AS vocab_40,
  CAST(COUNT(DISTINCT CASE WHEN doc_id * 100 <= m * 60 THEN tok END) AS BIGINT) AS vocab_60,
  CAST(COUNT(DISTINCT CASE WHEN doc_id * 100 <= m * 80 THEN tok END) AS BIGINT) AS vocab_80,
  CAST(COUNT(DISTINCT CASE WHEN doc_id * 100 <= m * 100 THEN tok END) AS BIGINT) AS vocab_100
FROM tokv, m
"""

ORACLES["ext_stickiness"] = """
WITH daily AS (
  SELECT date_trunc('month', ts) AS month, date_trunc('day', ts) AS day,
         CAST(COUNT(DISTINCT user_id) AS BIGINT) AS dau
  FROM events GROUP BY 1, 2),
d AS (SELECT month, CAST(SUM(dau) AS BIGINT) AS dau_sum,
             CAST(COUNT(*) AS BIGINT) AS n_days FROM daily GROUP BY 1),
m AS (SELECT date_trunc('month', ts) AS month,
             CAST(COUNT(DISTINCT user_id) AS BIGINT) AS mau
      FROM events GROUP BY 1)
SELECT strftime(d.month, '%Y-%m') AS month, m.mau,
       ROUND(CAST(dau_sum AS DOUBLE) / n_days, 4) AS avg_dau,
       ROUND(CAST(dau_sum AS DOUBLE) / CAST(n_days * mau AS DOUBLE), 4)
         AS stickiness
FROM d JOIN m USING (month) ORDER BY month
"""

ORACLES["ext_power_users"] = """
WITH pu AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n
            FROM events GROUP BY 1),
tiled AS (SELECT user_id, n,
                 NTILE(10) OVER (ORDER BY n DESC, user_id) AS decile
          FROM pu),
t AS (SELECT CAST(SUM(n) AS BIGINT) AS t FROM pu)
SELECT decile, CAST(COUNT(*) AS BIGINT) AS users,
       CAST(SUM(n) AS BIGINT) AS events,
       CAST(FLOOR(SUM(n) * 10000 / t.t) AS BIGINT) AS share_bps
FROM tiled, t GROUP BY decile, t.t ORDER BY decile
"""

ORACLES["ext_basket_lift"] = """
WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
singles AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS c
            FROM ut GROUP BY 1),
nu AS (SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n FROM ut),
pairs AS (
  SELECT a.event_type AS a, b.event_type AS b, CAST(COUNT(*) AS BIGINT) AS both
  FROM ut a JOIN ut b ON a.user_id = b.user_id AND a.event_type < b.event_type
  GROUP BY 1, 2)
SELECT p.a, p.b, p.both,
       ROUND(CAST(p.both AS DOUBLE) * CAST(nu.n AS DOUBLE)
             / CAST(sa.c * sb.c AS DOUBLE), 4) AS lift
FROM pairs p
JOIN singles sa ON sa.event_type = p.a
JOIN singles sb ON sb.event_type = p.b
CROSS JOIN nu
ORDER BY p.a, p.b
"""


ORACLES["ext_lang_stopwords"] = (
    "WITH toks AS (SELECT doc_id, " + TOKS + " AS tk FROM documents), "
    "scores AS ("
    + " UNION ALL ".join(
        f"SELECT doc_id, '{lang}' AS plang, "
        f"len(list_filter(tk, t -> t IN {words})) AS hits FROM toks"
        for lang, words in _LANG_PROFILES_SQL.items()
    )
    + "), ranked AS (SELECT doc_id, plang, hits, row_number() OVER ("
    "PARTITION BY doc_id ORDER BY hits DESC, plang DESC) AS rn FROM scores), "
    "pred AS (SELECT doc_id, CASE WHEN hits > 0 THEN plang ELSE 'und' END "
    "AS lang_pred FROM ranked WHERE rn = 1), "
    "kept AS (SELECT t.doc_id, p.lang_pred, "
    "  CASE p.lang_pred "
    + " ".join(
        f"WHEN '{lang}' THEN len(list_filter(tk, x -> x NOT IN {words}))"
        for lang, words in _LANG_PROFILES_SQL.items()
    )
    + "  ELSE len(tk) END AS n_content "
    "FROM toks t JOIN pred p USING (doc_id)) "
    "SELECT doc_id, lang_pred, CAST(n_content AS INT) AS n_content "
    "FROM kept ORDER BY doc_id"
)


ORACLES["ext_effective_size"] = (
    f"WITH RECURSIVE {_SHINGLE_CTES}, {_minhash_sig_cte()}, {_band_cte()}, "
    f"{_PAIRS_CTE}, {_CLUSTER_SQL_TAIL}, "
    "removed AS (SELECT a AS doc_id FROM reach GROUP BY a HAVING MIN(b) <> a), "
    "tl AS (SELECT doc_id, CAST(len(" + TOKS + ") AS BIGINT) AS n_tok, "
    "       CASE WHEN doc_id IN (SELECT doc_id FROM removed) THEN 0 ELSE 1 END AS keep "
    "FROM documents) "
    "SELECT CAST(COUNT(*) AS BIGINT) AS n_docs, "
    "CAST(SUM(keep) AS BIGINT) AS n_survivors, "
    "CAST(SUM(n_tok) AS BIGINT) AS total_tokens, "
    "CAST(SUM(CASE WHEN keep = 1 THEN n_tok ELSE 0 END) AS BIGINT) AS surviving_tokens, "
    "CAST(FLOOR(SUM(CASE WHEN keep = 1 THEN n_tok ELSE 0 END) * 10000 / SUM(n_tok)) AS BIGINT) "
    "AS effective_bps FROM tl"
)

ORACLES["ext_freshness"] = """
WITH o AS (SELECT MAX(ts) AS wm FROM events)
SELECT event_type,
       strftime(MAX(ts), '%Y-%m-%d %H:%M:%S') AS last_ts,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(FLOOR(epoch(o.wm)) AS BIGINT) - CAST(FLOOR(epoch(MAX(ts))) AS BIGINT) AS lag_seconds
FROM events, o GROUP BY event_type, o.wm ORDER BY event_type
"""

ORACLES["ext_null_profile"] = """
WITH a AS (
  SELECT
    CAST(SUM(CASE WHEN event_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_event_id,
    CAST(SUM(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_user_id,
    CAST(SUM(CASE WHEN event_type IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_event_type,
    CAST(SUM(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_value,
    CAST(SUM(CASE WHEN props IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_props,
    CAST(SUM(CASE WHEN value = 0.0 THEN 1 ELSE 0 END) AS BIGINT) AS z_value,
    CAST(SUM(CASE WHEN event_type = '' THEN 1 ELSE 0 END) AS BIGINT) AS z_event_type,
    CAST(SUM(CASE WHEN props = '' THEN 1 ELSE 0 END) AS BIGINT) AS z_props
  FROM events)
SELECT u.column_name, u.n_null, u.n_degenerate FROM a, LATERAL (
  VALUES ('event_id', n_event_id, CAST(0 AS BIGINT)),
         ('user_id', n_user_id, CAST(0 AS BIGINT)),
         ('event_type', n_event_type, z_event_type),
         ('value', n_value, z_value),
         ('props', n_props, z_props)
) AS u(column_name, n_null, n_degenerate)
ORDER BY u.column_name
"""

ORACLES["ext_seasonality"] = """
SELECT CAST(dayofweek(ts) + 1 AS BIGINT) AS dow, CAST(hour(ts) AS BIGINT) AS hour,
       CAST(COUNT(*) AS BIGINT) AS n,
       SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) / 100.0 AS sum_value
FROM events GROUP BY 1, 2 ORDER BY 1, 2
"""

ORACLES["ext_new_vs_returning"] = """
WITH first AS (
  SELECT user_id, date_trunc('day', MIN(ts)) AS first_day
  FROM events GROUP BY 1),
tagged AS (
  SELECT e.*, date_trunc('day', e.ts) = f.first_day AS is_new,
         date_trunc('day', e.ts) AS day
  FROM events e JOIN first f USING (user_id))
SELECT strftime(day, '%Y-%m-%d') AS day,
       CAST(SUM(CASE WHEN is_new THEN 1 ELSE 0 END) AS BIGINT) AS new_events,
       CAST(SUM(CASE WHEN NOT is_new THEN 1 ELSE 0 END) AS BIGINT) AS returning_events,
       CAST(COUNT(DISTINCT CASE WHEN is_new THEN user_id END) AS BIGINT) AS new_users
FROM tagged GROUP BY 1 ORDER BY 1
"""

ORACLES["ext_return_rate"] = """
WITH li AS (
  SELECT strftime(date_trunc('month', l_shipdate), '%Y-%m') AS month,
         l_returnflag = 'R' AS ret,
         CAST(ROUND(l_extendedprice * (1.0 - l_discount) * 100, 0) AS BIGINT) AS cents
  FROM lineitem)
SELECT month,
       CAST(COUNT(*) AS BIGINT) AS n_items,
       CAST(SUM(CASE WHEN ret THEN 1 ELSE 0 END) AS BIGINT) AS n_returned,
       CAST(FLOOR(SUM(CASE WHEN ret THEN 1 ELSE 0 END) * 10000 / COUNT(*)) AS BIGINT)
         AS item_return_bps,
       CAST(FLOOR(SUM(CASE WHEN ret THEN cents ELSE 0 END) * 10000 / SUM(cents)) AS BIGINT)
         AS revenue_return_bps
FROM li GROUP BY 1 ORDER BY 1
"""

ORACLES["ext_mad_outliers"] = """
WITH b AS (
  SELECT event_type, CAST(ROUND(value * 100, 0) * 2 AS BIGINT) AS dc
  FROM events),
m1 AS (SELECT event_type, CAST(MEDIAN(dc) AS BIGINT) AS med2
       FROM b GROUP BY event_type),
d AS (SELECT b.event_type, dc, med2, ABS(dc - med2) * 2 AS dev2
      FROM b JOIN m1 USING (event_type)),
m2 AS (SELECT event_type, CAST(MEDIAN(dev2) AS BIGINT) AS mad4
       FROM d GROUP BY event_type)
SELECT d.event_type, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CASE WHEN dev2 > 3 * mad4 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_outliers,
       CAST(MAX(med2) * 500 AS BIGINT) AS med_millicents,
       CAST(MAX(mad4) * 250 AS BIGINT) AS mad_millicents
FROM d JOIN m2 USING (event_type)
GROUP BY d.event_type ORDER BY d.event_type
"""

ORACLES["ext_exact_median"] = """
SELECT event_type, ROUND(MEDIAN(value), 4) AS median_value,
       CAST(COUNT(*) AS BIGINT) AS n
FROM events GROUP BY event_type ORDER BY event_type
"""

ORACLES["ext_token_entropy"] = f"""
WITH tfe AS (
  SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS c FROM (
    SELECT doc_id, unnest({TOKS}) AS tok FROM documents)
  GROUP BY doc_id, tok),
tot AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n FROM tfe GROUP BY doc_id)
SELECT t.doc_id,
       ROUND(-SUM((CAST(c AS DOUBLE) / n) * log2(CAST(c AS DOUBLE) / n)), 4)
         AS entropy_bits
FROM tfe t JOIN tot USING (doc_id)
GROUP BY t.doc_id ORDER BY t.doc_id
"""

ORACLES["ext_burstiness"] = """
WITH g AS (
  SELECT event_type,
         CAST(FLOOR(epoch(ts)) AS BIGINT)
           - CAST(FLOOR(epoch(LAG(ts) OVER w)) AS BIGINT) AS gap
  FROM events
  WINDOW w AS (PARTITION BY event_type, user_id ORDER BY ts, event_id)),
a AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(gap) AS BIGINT) AS s, CAST(SUM(gap * gap) AS BIGINT) AS ss
  FROM g WHERE gap IS NOT NULL GROUP BY 1)
SELECT event_type, n,
       ROUND(CAST(s AS DOUBLE) / CAST(n AS DOUBLE), 4) AS mean_gap_s,
       ROUND(sqrt((CAST(n AS DOUBLE) * CAST(ss AS DOUBLE)
                   - CAST(s AS DOUBLE) * CAST(s AS DOUBLE))
                  / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1)))
             / (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)), 4) AS cv
FROM a ORDER BY event_type
"""

ORACLES["ext_gini"] = """
WITH pu AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS x
            FROM events GROUP BY 1),
ranked AS (SELECT x, ROW_NUMBER() OVER (ORDER BY x, user_id) AS i FROM pu)
SELECT ROUND(2.0 * CAST(SUM(i * x) AS DOUBLE)
               / CAST(COUNT(*) * SUM(x) AS DOUBLE)
             - CAST(COUNT(*) + 1 AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 4)
         AS gini,
       CAST(COUNT(*) AS BIGINT) AS n_users
FROM ranked
"""

ORACLES["ext_autocorrelation"] = """
WITH hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS h,
         CAST(COUNT(*) AS BIGINT) AS x
  FROM events GROUP BY 1, 2),
pairs AS (
  SELECT event_type, x, LEAD(x) OVER w AS y FROM hourly
  WINDOW w AS (PARTITION BY event_type ORDER BY h)),
a AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(x * y) AS BIGINT) AS sxy,
         CAST(SUM(x * x) AS BIGINT) AS sxx,
         CAST(SUM(y * y) AS BIGINT) AS syy
  FROM pairs WHERE y IS NOT NULL GROUP BY 1)
SELECT event_type, n,
  ROUND((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
           - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                 - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
               * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                 - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 4)
    AS lag1_autocorr
FROM a ORDER BY event_type
"""

ORACLES["ext_skew_report"] = """
WITH g AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n
           FROM events GROUP BY 1)
SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
       MAX(n) AS max_group,
       ROUND(MEDIAN(n), 1) AS median_group,
       ROUND(CAST(MAX(n) AS DOUBLE) / MEDIAN(n), 4) AS skew_ratio,
       CAST(FLOOR(MAX(n) * 10000 / SUM(n)) AS BIGINT) AS top_key_bps
FROM g
"""


ORACLES["ext_cluster_sizes"] = (
    f"WITH RECURSIVE {_SHINGLE_CTES}, {_minhash_sig_cte()}, {_band_cte()}, "
    f"{_PAIRS_CTE}, {_CLUSTER_SQL_TAIL}, "
    "clusters AS (SELECT a AS doc_id, MIN(b) AS cluster_id FROM reach GROUP BY a), "
    "sizes AS (SELECT cluster_id, CAST(COUNT(*) AS BIGINT) AS size "
    "FROM clusters GROUP BY 1) "
    "SELECT size, CAST(COUNT(*) AS BIGINT) AS n_clusters FROM sizes "
    "GROUP BY size ORDER BY size"
)

ORACLES["ext_anomalous_hours"] = """
WITH hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS h,
         CAST(CAST(COUNT(*) AS BIGINT) AS HUGEINT) AS x
  FROM events GROUP BY 1, 2),
g AS (
  SELECT *, COUNT(*) OVER w AS n, SUM(x) OVER w AS s, SUM(x * x) OVER w AS ss
  FROM hourly WINDOW w AS (PARTITION BY event_type))
SELECT event_type, strftime(h, '%Y-%m-%d %H:%M:%S') AS hour,
       CAST(x AS BIGINT) AS n_events
FROM g
WHERE n >= 2 AND (n * ss - s * s) > 0
  AND (x * n - s) * (x * n - s) * (n - 1) > 9 * n * (n * ss - s * s)
ORDER BY event_type, hour
"""

ORACLES["ext_event_paths"] = """
WITH p AS (
  SELECT event_type AS s1,
         LEAD(event_type, 1) OVER w AS s2,
         LEAD(event_type, 2) OVER w AS s3
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
SELECT s1, s2, s3, CAST(COUNT(*) AS BIGINT) AS n
FROM p WHERE s3 IS NOT NULL
GROUP BY 1, 2, 3 ORDER BY n DESC, s1, s2, s3 LIMIT 20
"""

ORACLES["ext_first_touch"] = """
WITH ranked AS (
  SELECT user_id, event_type,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM events),
ft AS (SELECT user_id, event_type AS first_touch FROM ranked WHERE rn = 1),
conv AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase')
SELECT ft.first_touch,
       CAST(COUNT(*) AS BIGINT) AS users,
       CAST(SUM(CASE WHEN c.user_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS converted,
       CAST(FLOOR(SUM(CASE WHEN c.user_id IS NOT NULL THEN 1 ELSE 0 END)
                  * 10000 / COUNT(*)) AS BIGINT) AS conv_bps
FROM ft LEFT JOIN conv c USING (user_id)
GROUP BY 1 ORDER BY 1
"""

ORACLES["ext_cohort_ltv"] = """
WITH first AS (
  SELECT user_id, date_trunc('week', MIN(ts)) AS cohort
  FROM events GROUP BY 1),
spend AS (
  SELECT f.cohort,
         CAST(date_diff('day', f.cohort, date_trunc('week', e.ts)) / 7 AS INT)
           AS week_offset,
         CAST(SUM(CAST(ROUND(e.value * 100, 0) AS BIGINT)) AS BIGINT) AS cents
  FROM events e JOIN first f USING (user_id)
  WHERE e.event_type = 'purchase'
  GROUP BY 1, 2)
SELECT strftime(cohort, '%Y-%m-%d') AS cohort, week_offset,
       SUM(cents) OVER (PARTITION BY cohort ORDER BY week_offset
                        ROWS UNBOUNDED PRECEDING) / 100.0 AS cum_value
FROM spend ORDER BY 1, 2
"""

ORACLES["ext_rfm"] = """
WITH wm AS (SELECT MAX(ts) AS wm FROM events),
pu AS (
  SELECT user_id, MAX(ts) AS last_p, CAST(COUNT(*) AS BIGINT) AS frequency,
         CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT) AS cents
  FROM events WHERE event_type = 'purchase' GROUP BY 1),
base AS (
  SELECT user_id,
         CAST(FLOOR((CAST(FLOOR(epoch(wm.wm)) AS BIGINT)
                     - CAST(FLOOR(epoch(last_p)) AS BIGINT)) / 86400.0) AS BIGINT)
           AS recency_days,
         frequency, cents / 100.0 AS monetary, cents
  FROM pu, wm)
SELECT user_id, recency_days, frequency, monetary,
       CAST(NTILE(5) OVER (ORDER BY recency_days, user_id) AS INT) AS r_quintile,
       CAST(NTILE(5) OVER (ORDER BY frequency DESC, user_id) AS INT) AS f_quintile,
       CAST(NTILE(5) OVER (ORDER BY cents DESC, user_id) AS INT) AS m_quintile
FROM base ORDER BY user_id
"""

ORACLES["ext_purchase_intervals"] = """
WITH g AS (
  SELECT CAST(FLOOR(epoch(ts)) AS BIGINT)
           - CAST(FLOOR(epoch(LAG(ts) OVER w)) AS BIGINT) AS gap
  FROM events WHERE event_type = 'purchase'
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
SELECT CAST(COUNT(*) AS BIGINT) AS n_gaps,
       ROUND(MEDIAN(gap), 1) AS median_gap_s,
       ROUND(CAST(SUM(gap) AS DOUBLE) / COUNT(*), 1) AS mean_gap_s
FROM g WHERE gap IS NOT NULL
"""


ORACLES["ext_source_quality"] = f"""
WITH feat AS (
  SELECT doc_id, source, text,
         length(text) AS n_chars,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
         len(list_filter({TOKS}, t -> t IN {EN_PROFILE_SQL})) AS n_stop,
         length(regexp_replace(text, '[\\w\\s]', '', 'g')) AS n_punct
  FROM documents),
scored AS (
  SELECT source, text,
    CAST(ROUND(ROUND(GREATEST(LEAST(
      (CASE WHEN n_tokens >= 5 AND n_tokens <= 100000 THEN 0.5 ELSE 0.0 END)
      + LEAST((CASE WHEN n_tokens > 0 THEN CAST(n_stop AS DOUBLE) / n_tokens ELSE 0.0 END) * 2.0, 0.5)
      - LEAST((CASE WHEN n_chars > 0 THEN CAST(n_punct AS DOUBLE) / n_chars ELSE 0.0 END) * 2.0, 0.25),
      1.0), 0.0), 4) * 10000, 0) AS BIGINT) AS qmilli
  FROM feat)
SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
       ROUND(CAST(SUM(qmilli) AS DOUBLE) / 10000.0 / COUNT(*), 4) AS avg_quality,
       CAST(FLOOR((COUNT(*) - COUNT(DISTINCT md5(text))) * 10000 / COUNT(*)) AS BIGINT)
         AS dup_bps
FROM scored GROUP BY source ORDER BY source
"""

ORACLES["ext_weekly_trend"] = """
WITH weekly AS (
  SELECT date_trunc('week', ts) AS wk, CAST(COUNT(*) AS BIGINT) AS n
  FROM events GROUP BY 1),
t AS (SELECT wk, n, LAG(n) OVER (ORDER BY wk) AS prev FROM weekly)
SELECT strftime(wk, '%Y-%m-%d') AS week, n,
       CAST(COALESCE(prev, 0) AS BIGINT) AS prev,
       CAST(CASE WHEN prev IS NOT NULL
                 THEN FLOOR((n - prev) * 10000 / prev) ELSE 0 END AS BIGINT)
         AS wow_bps
FROM t ORDER BY week
"""

ORACLES["ext_error_rate"] = """
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00') AS hour,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_errors,
       CAST(FLOOR(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
                  * 10000 / COUNT(*)) AS BIGINT) AS error_bps
FROM events GROUP BY 1 ORDER BY 1
"""

ORACLES["ext_catalog_summary"] = (
    " UNION ALL ".join(
        f"SELECT '{t}' AS table_name, CAST(COUNT(*) AS BIGINT) AS n_rows FROM {t}"
        for t in (
            "region nation customer supplier part orders lineitem events "
            "documents embeddings"
        ).split()
    )
    + " ORDER BY table_name"
)

ORACLES["ext_abandonment"] = """
WITH g AS (
  SELECT user_id, ts, event_type,
         CASE WHEN epoch(ts) - LAG(epoch(ts)) OVER w IS NULL
                OR epoch(ts) - LAG(epoch(ts)) OVER w > 1800
              THEN 1 ELSE 0 END AS newflag
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
s AS (
  SELECT user_id, event_type,
         SUM(newflag) OVER (PARTITION BY user_id ORDER BY ts
                            ROWS UNBOUNDED PRECEDING) AS session_idx
  FROM g),
per AS (
  SELECT user_id, session_idx,
         MAX(CASE WHEN event_type IN ('view', 'click') THEN 1 ELSE 0 END) AS browsed,
         MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS bought
  FROM s GROUP BY 1, 2)
SELECT user_id, CAST(COUNT(*) AS BIGINT) AS sessions,
       CAST(SUM(CASE WHEN browsed = 1 AND bought = 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS abandoned,
       CAST(FLOOR(SUM(CASE WHEN browsed = 1 AND bought = 0 THEN 1 ELSE 0 END)
                  * 10000 / COUNT(*)) AS BIGINT) AS abandon_bps
FROM per GROUP BY 1 ORDER BY 1
"""

ORACLES["ext_conversion_lag"] = """
WITH s AS (
  SELECT user_id, MIN(CAST(FLOOR(epoch(ts)) AS BIGINT)) AS t_signup
  FROM events WHERE event_type = 'signup' GROUP BY 1),
p AS (
  SELECT user_id, CAST(FLOOR(epoch(ts)) AS BIGINT) AS t_p
  FROM events WHERE event_type = 'purchase'),
lag AS (
  SELECT p.user_id, MIN(t_p) - MIN(t_signup) AS lag_s
  FROM p JOIN s USING (user_id) WHERE t_p >= t_signup
  GROUP BY p.user_id)
SELECT CAST(COUNT(*) AS BIGINT) AS n_converted,
       ROUND(MEDIAN(lag_s), 1) AS median_lag_s,
       ROUND(CAST(SUM(lag_s) AS DOUBLE) / COUNT(*), 1) AS mean_lag_s
FROM lag
"""

ORACLES["ext_peak_hour"] = """
WITH hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS h, CAST(COUNT(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2),
ranked AS (
  SELECT event_type, h, n,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY n DESC, h DESC) AS rn
  FROM hourly)
SELECT event_type, strftime(h, '%Y-%m-%d %H:00') AS peak_hour, n AS n_events
FROM ranked WHERE rn = 1 ORDER BY event_type
"""

ORACLES["ext_log_histogram"] = """
SELECT CAST(FLOOR(log2(CAST(CAST(ROUND(value * 100, 0) AS BIGINT) AS DOUBLE) + 1.0))
            AS BIGINT) AS log2_bucket,
       CAST(COUNT(*) AS BIGINT) AS n
FROM events GROUP BY 1 ORDER BY 1
"""

ORACLES["ext_audience_overlap"] = """
WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
sizes AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS c FROM ut GROUP BY 1),
inter AS (
  SELECT a.event_type AS a, b.event_type AS b, CAST(COUNT(*) AS BIGINT) AS n_both
  FROM ut a JOIN ut b ON a.user_id = b.user_id AND a.event_type < b.event_type
  GROUP BY 1, 2)
SELECT i.a, i.b, i.n_both,
       ROUND(CAST(i.n_both AS DOUBLE)
             / CAST(sa.c + sb.c - i.n_both AS DOUBLE), 4) AS jaccard
FROM inter i
JOIN sizes sa ON sa.event_type = i.a
JOIN sizes sb ON sb.event_type = i.b
ORDER BY i.a, i.b
"""

ORACLES["ext_behavior_diversity"] = """
WITH pu AS (
  SELECT user_id, CAST(COUNT(DISTINCT event_type) AS BIGINT) AS k
  FROM events GROUP BY 1)
SELECT k, CAST(COUNT(*) AS BIGINT) AS n_users FROM pu GROUP BY k ORDER BY k
"""

ORACLES["ext_discount_impact"] = """
SELECT CAST(ROUND(l_discount * 100, 0) AS BIGINT) AS discount_pct,
       CAST(COUNT(*) AS BIGINT) AS n_items,
       SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)) / 100.0
         AS gross_revenue,
       SUM(CAST(ROUND(l_extendedprice * l_discount * 100, 0) AS BIGINT)) / 100.0
         AS discount_given
FROM lineitem GROUP BY 1 ORDER BY 1
"""


ORACLES["ext_tpch_q1"] = """
SELECT l_returnflag, l_linestatus,
       SUM(CAST(ROUND(l_quantity * 100, 0) AS BIGINT)) / 100.0 AS sum_qty,
       SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)) / 100.0
         AS sum_base_price,
       SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100, 0) AS BIGINT))
         / 100.0 AS sum_disc_price,
       SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 100,
                      0) AS BIGINT)) / 100.0 AS sum_charge,
       ROUND(CAST(SUM(CAST(ROUND(l_quantity * 100, 0) AS BIGINT)) AS DOUBLE)
             / 100.0 / COUNT(*), 2) AS avg_qty,
       ROUND(CAST(SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)) AS DOUBLE)
             / 100.0 / COUNT(*), 2) AS avg_price,
       ROUND(CAST(SUM(CAST(ROUND(l_discount * 10000, 0) AS BIGINT)) AS DOUBLE)
             / 10000.0 / COUNT(*), 4) AS avg_disc,
       CAST(COUNT(*) AS BIGINT) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""

ORACLES["ext_spend_percentiles"] = """
WITH spend AS (
  SELECT user_id,
         CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT) AS sc
  FROM events WHERE event_type = 'purchase' GROUP BY user_id)
SELECT user_id, sc / 100.0 AS spend,
       ROUND(percent_rank() OVER (ORDER BY sc, user_id), 4) AS pct_rank,
       ROUND(cume_dist() OVER (ORDER BY sc, user_id), 4) AS cume
FROM spend ORDER BY user_id
"""

ORACLES["ext_cumulative_revenue"] = """
WITH daily AS (
  SELECT date_trunc('day', o_orderdate) AS day,
         CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT) AS rc
  FROM orders GROUP BY 1)
SELECT strftime(day, '%Y-%m-%d') AS day, rc / 100.0 AS revenue,
       CAST(SUM(rc) OVER (ORDER BY day
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         / 100.0 AS cum_revenue
FROM daily ORDER BY day
"""

ORACLES["ext_triangles"] = (
    f"WITH {_SHINGLE_CTES}, {_minhash_sig_cte()}, {_band_cte()}, {_PAIRS_CTE}, "
    "deg AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS deg FROM ("
    "  SELECT doc_a AS doc_id FROM pairs UNION ALL SELECT doc_b FROM pairs) "
    "GROUP BY doc_id), "
    "tri AS (SELECT e1.doc_a AS a, e1.doc_b AS b, e2.doc_b AS c "
    "  FROM pairs e1 JOIN pairs e2 ON e2.doc_a = e1.doc_b "
    "  JOIN pairs e3 ON e3.doc_a = e1.doc_a AND e3.doc_b = e2.doc_b), "
    "s AS (SELECT "
    "  (SELECT CAST(COUNT(*) AS BIGINT) FROM deg) AS n_nodes, "
    "  (SELECT CAST(COUNT(*) AS BIGINT) FROM pairs) AS n_edges, "
    "  (SELECT CAST(COUNT(*) AS BIGINT) FROM tri) AS n_triangles, "
    "  (SELECT CAST(SUM(CAST((deg * (deg - 1)) // 2 AS BIGINT)) AS BIGINT) "
    "     FROM deg) AS n_triplets) "
    "SELECT n_nodes, n_edges, n_triangles, n_triplets, "
    "  CASE WHEN n_triplets > 0 THEN ROUND(3.0 * CAST(n_triangles AS DOUBLE) "
    "       / CAST(n_triplets AS DOUBLE), 4) ELSE 0.0 END AS clustering "
    "FROM s"
)

_BLOOM_M = 8192


def _bloom_pos_expr(i: int) -> str:
    key_expr = "CONCAT('bf" + str(i) + ":', CAST(key AS VARCHAR))"
    return f"({md5long(key_expr)} % {_BLOOM_M})"


_bloom_pos_sql = [_bloom_pos_expr(i) for i in range(3)]
ORACLES["ext_bloom_prune"] = f"""
WITH bkeys AS (
  SELECT DISTINCT c_custkey AS key FROM customer
  WHERE c_mktsegment = 'BUILDING'),
pos AS (
  SELECT DISTINCT {_bloom_pos_sql[0]} AS p FROM bkeys
  UNION SELECT {_bloom_pos_sql[1]} FROM bkeys
  UNION SELECT {_bloom_pos_sql[2]} FROM bkeys),
checked AS (
  SELECT key,
    ({_bloom_pos_sql[0]} IN (SELECT p FROM pos))
    AND ({_bloom_pos_sql[1]} IN (SELECT p FROM pos))
    AND ({_bloom_pos_sql[2]} IN (SELECT p FROM pos)) AS pass,
    key IN (SELECT key FROM bkeys) AS is_true
  FROM (SELECT o_custkey AS key FROM orders))
SELECT CAST(COUNT(*) AS BIGINT) AS n_probe,
       CAST(SUM(CASE WHEN pass THEN 1 ELSE 0 END) AS BIGINT) AS n_pass,
       CAST(SUM(CASE WHEN is_true THEN 1 ELSE 0 END) AS BIGINT) AS n_true,
       CAST(SUM(CASE WHEN pass AND NOT is_true THEN 1 ELSE 0 END) AS BIGINT)
         AS n_false_pos
FROM checked
"""


ORACLES["ext_more_like_this"] = f"""
WITH toks AS (SELECT doc_id, unnest({TOKS}) AS token FROM documents),
postings AS (
  SELECT doc_id, token, COUNT(*) AS tf FROM toks GROUP BY doc_id, token),
df_t AS (SELECT token, COUNT(*) AS df FROM postings GROUP BY token),
nd AS (SELECT COUNT(DISTINCT doc_id) AS n FROM postings),
wts AS (
  SELECT p.doc_id, p.token,
         CAST(ROUND(p.tf * ln(nd.n / d.df) * 1000, 0) AS BIGINT) AS w
  FROM postings p JOIN df_t d USING (token) CROSS JOIN nd),
tgt AS (SELECT token, w AS wq FROM wts WHERE doc_id = 1),
qn AS (SELECT CAST(SUM(wq * wq) AS BIGINT) AS qn FROM tgt),
norms AS (
  SELECT doc_id, CAST(SUM(w * w) AS BIGINT) AS nsq FROM wts GROUP BY doc_id),
dots AS (
  SELECT w.doc_id, CAST(SUM(w.w * t.wq) AS BIGINT) AS dot
  FROM wts w JOIN tgt t USING (token) WHERE w.doc_id <> 1 GROUP BY w.doc_id)
SELECT d.doc_id,
       ROUND(CAST(dot AS DOUBLE)
             / (sqrt(CAST(nsq AS DOUBLE)) * sqrt(CAST(qn AS DOUBLE))),
             4) AS sim
FROM dots d JOIN norms USING (doc_id) CROSS JOIN qn
ORDER BY sim DESC, doc_id LIMIT 10
"""

ORACLES["ext_tpch_q6"] = """
SELECT SUM(CAST(ROUND(l_extendedprice * l_discount * 100, 0) AS BIGINT))
         / 100.0 AS revenue,
       CAST(COUNT(*) AS BIGINT) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_quantity < 24
  AND CAST(ROUND(l_discount * 10000, 0) AS BIGINT) BETWEEN 500 AND 700
"""


ORACLES["ext_scd2"] = """
WITH ordered AS (
  SELECT user_id, ts, event_id, event_type,
         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS prev
  FROM events),
changes AS (
  SELECT user_id, ts, event_id, event_type FROM ordered
  WHERE prev IS NULL OR prev <> event_type)
SELECT user_id, event_type AS state,
       strftime(ts, '%Y-%m-%d %H:%M:%S') AS valid_from,
       strftime(lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),
                '%Y-%m-%d %H:%M:%S') AS valid_to
FROM changes ORDER BY user_id, valid_from
"""

ORACLES["ext_chi2"] = """
WITH cells AS (
  SELECT event_type, dayofweek(ts) AS dow, CAST(COUNT(*) AS BIGINT) AS o
  FROM events GROUP BY 1, 2),
r_t AS (SELECT event_type, CAST(SUM(o) AS BIGINT) AS r FROM cells GROUP BY 1),
c_t AS (SELECT dow, CAST(SUM(o) AS BIGINT) AS c FROM cells GROUP BY 1),
n_t AS (SELECT CAST(SUM(o) AS BIGINT) AS n FROM cells),
contrib AS (
  SELECT CAST(ROUND(1e9 * CAST(n AS DOUBLE) * CAST(o * o AS DOUBLE)
              / CAST(r * c AS DOUBLE), 0) AS BIGINT) AS t, n
  FROM cells JOIN r_t USING (event_type) JOIN c_t USING (dow) CROSS JOIN n_t)
SELECT ROUND((CAST(SUM(t) AS DOUBLE) / 1e9) - n, 4) AS chi2,
       n AS n_events
FROM contrib GROUP BY n
"""

ORACLES["ext_wilson_rates"] = """
WITH agg AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CASE WHEN value >= 50 THEN 1 ELSE 0 END) AS BIGINT) AS hits
  FROM events GROUP BY 1),
d AS (
  SELECT event_type, n, hits,
         CAST(hits AS DOUBLE) / CAST(n AS DOUBLE) AS p,
         CAST(n AS DOUBLE) AS nn
  FROM agg)
SELECT event_type, n, hits, ROUND(p, 4) AS rate,
       ROUND((p + 3.8415999999999997 / (2 * nn)
              - 1.96 * sqrt(p * (1 - p) / nn + 3.8415999999999997 / (4 * nn * nn)))
             / (1 + 3.8415999999999997 / nn), 4) AS wilson_lower
FROM d ORDER BY event_type
"""


ORACLES["ext_hybrid_rrf"] = f"""
WITH toks AS (SELECT doc_id, unnest({TOKS}) AS token FROM documents),
postings AS (SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS tf
             FROM toks GROUP BY doc_id, token),
dlen AS (SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS dl FROM postings GROUP BY doc_id),
stats AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, AVG(CAST(dl AS DOUBLE)) AS avgdl FROM dlen),
dfreq AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS df FROM postings
          WHERE token IN ('spark', 'join') GROUP BY token),
scores AS (
  SELECT p.doc_id,
         SUM( ln(1.0 + (s.n - d.df + 0.5) / (d.df + 0.5)) * p.tf * {K1 + 1.0!r}
              / (p.tf + {K1!r} * (1.0 - {B!r} + {B!r} * l.dl / s.avgdl)) ) AS raw
  FROM postings p
  JOIN dfreq d ON p.token = d.token
  JOIN dlen l ON l.doc_id = p.doc_id
  CROSS JOIN stats s
  GROUP BY p.doc_id),
bm AS (SELECT doc_id, ROUND(raw, 4) AS score FROM scores
       ORDER BY score DESC, doc_id LIMIT 20),
bmr AS (SELECT doc_id,
               CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT)
                 AS rb
        FROM bm),
cos AS (SELECT e.vec_id AS doc_id,
               ROUND(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                     CAST(q.embedding AS DOUBLE[])), 4) + 0.0 AS sim
        FROM embeddings e,
             (SELECT embedding FROM embeddings WHERE vec_id = 0) q
        WHERE e.vec_id <> 0 ORDER BY sim DESC, doc_id LIMIT 20),
vr AS (SELECT doc_id,
              CAST(row_number() OVER (ORDER BY sim DESC, doc_id) AS BIGINT)
                AS rv
       FROM cos),
fused AS (SELECT COALESCE(b.doc_id, v.doc_id) AS doc_id, b.rb, v.rv
          FROM bmr b FULL OUTER JOIN vr v ON b.doc_id = v.doc_id)
SELECT doc_id, rb, rv,
       ROUND(COALESCE(1.0 / (60 + rb), 0.0)
             + COALESCE(1.0 / (60 + rv), 0.0), 6) AS rrf
FROM fused ORDER BY rrf DESC, doc_id LIMIT 10
"""

ORACLES["ext_percentile_bands"] = """
SELECT event_type,
       ROUND(quantile_cont(value, 0.25), 4) AS p25,
       ROUND(quantile_cont(value, 0.5), 4) AS p50,
       ROUND(quantile_cont(value, 0.75), 4) AS p75,
       ROUND(quantile_cont(value, 0.95), 4) AS p95,
       ROUND(quantile_cont(value, 0.99), 4) AS p99,
       CAST(COUNT(*) AS BIGINT) AS n
FROM events GROUP BY event_type ORDER BY event_type
"""

ORACLES["ext_rolling_dau"] = """
WITH du AS (
  SELECT DISTINCT CAST(date_trunc('day', ts) AS DATE) AS src_d, user_id
  FROM events),
days AS (SELECT DISTINCT src_d AS d FROM du),
grid AS (
  SELECT d, d - CAST(off AS INTEGER) AS src_d
  FROM days CROSS JOIN (SELECT unnest(generate_series(0, 6)) AS off)),
rolled AS (
  SELECT g.d, CAST(COUNT(DISTINCT du.user_id) AS BIGINT) AS dau7
  FROM grid g JOIN du ON du.src_d = g.src_d GROUP BY g.d),
daily AS (
  SELECT src_d AS d, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS dau
  FROM du GROUP BY src_d)
SELECT strftime(daily.d, '%Y-%m-%d') AS day, dau, dau7
FROM daily JOIN rolled ON daily.d = rolled.d ORDER BY day
"""

ORACLES["ext_reconcile_daily"] = """
WITH s AS (
  SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
         CAST(COUNT(*) AS BIGINT) AS n_signup
  FROM events WHERE event_type = 'signup' GROUP BY 1),
p AS (
  SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
         CAST(COUNT(*) AS BIGINT) AS n_purchase
  FROM events WHERE event_type = 'purchase' GROUP BY 1)
SELECT COALESCE(s.day, p.day) AS day,
       COALESCE(n_signup, 0) AS n_signup,
       COALESCE(n_purchase, 0) AS n_purchase,
       COALESCE(n_purchase, 0) - COALESCE(n_signup, 0) AS net
FROM s FULL OUTER JOIN p ON s.day = p.day ORDER BY day
"""


ORACLES["ext_source_drift"] = f"""
WITH d2 AS (
  SELECT source, unnest({TOKS}) AS token FROM documents
  WHERE source IN ('src0', 'src1')),
counts AS (
  SELECT source, token, CAST(COUNT(*) AS BIGINT) AS c FROM d2 GROUP BY 1, 2),
cc0 AS (SELECT token, c AS c0 FROM counts WHERE source = 'src0'),
cc1 AS (SELECT token, c AS c1 FROM counts WHERE source = 'src1'),
j AS (
  SELECT COALESCE(cc0.c0, 0) AS c0, COALESCE(cc1.c1, 0) AS c1
  FROM cc0 FULL OUTER JOIN cc1 ON cc0.token = cc1.token),
tot AS (SELECT CAST(SUM(c0) AS BIGINT) AS n0, CAST(SUM(c1) AS BIGINT) AS n1
        FROM j),
terms AS (
  SELECT c0, c1,
    CAST(ROUND((
      CASE WHEN c0 > 0 THEN 0.5 * (CAST(c0 AS DOUBLE) / CAST(n0 AS DOUBLE))
        * ln((CAST(c0 AS DOUBLE) / CAST(n0 AS DOUBLE))
             / (((CAST(c0 AS DOUBLE) / CAST(n0 AS DOUBLE))
                 + (CAST(c1 AS DOUBLE) / CAST(n1 AS DOUBLE))) / 2))
      ELSE 0.0 END
      + CASE WHEN c1 > 0 THEN 0.5 * (CAST(c1 AS DOUBLE) / CAST(n1 AS DOUBLE))
        * ln((CAST(c1 AS DOUBLE) / CAST(n1 AS DOUBLE))
             / (((CAST(c0 AS DOUBLE) / CAST(n0 AS DOUBLE))
                 + (CAST(c1 AS DOUBLE) / CAST(n1 AS DOUBLE))) / 2))
      ELSE 0.0 END) * 1e12, 0) AS BIGINT) AS t
  FROM j CROSS JOIN tot)
SELECT ROUND(CAST(SUM(t) AS DOUBLE) / 1e12, 6) AS js_divergence,
       CAST(SUM(CASE WHEN c0 > 0 THEN 1 ELSE 0 END) AS BIGINT) AS vocab_src0,
       CAST(SUM(CASE WHEN c1 > 0 THEN 1 ELSE 0 END) AS BIGINT) AS vocab_src1,
       CAST(SUM(CASE WHEN c0 > 0 AND c1 > 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS vocab_shared
FROM terms
"""

ORACLES["ext_k_anonymity"] = """
WITH groups AS (
  SELECT event_type, hour(ts) AS hod,
         CAST(FLOOR(value / 10) AS BIGINT) AS vband,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2, 3)
SELECT CAST(COUNT(*) AS BIGINT) AS n_groups,
       CAST(SUM(CASE WHEN n < 5 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_unsafe_groups,
       CAST(SUM(n) AS BIGINT) AS n_rows,
       CAST(SUM(CASE WHEN n < 5 THEN n ELSE 0 END) AS BIGINT) AS n_unsafe_rows,
       CAST(SUM(CASE WHEN n < 5 THEN n ELSE 0 END) * 10000 // SUM(n) AS BIGINT)
         AS unsafe_bp
FROM groups
"""

ORACLES["ext_label_balance"] = """
WITH per AS (SELECT label, CAST(COUNT(*) AS BIGINT) AS n FROM embeddings
             GROUP BY label),
tot AS (SELECT CAST(SUM(n) AS BIGINT) AS total,
               CAST(COUNT(*) AS BIGINT) AS n_classes FROM per)
SELECT label, n,
       CAST(n * 10000 // total AS BIGINT) AS share_bp,
       CAST(n * 10000 // total - 10000 // n_classes AS BIGINT)
         AS dev_from_uniform_bp
FROM per CROSS JOIN tot ORDER BY label
"""


ORACLES["ext_interval_merge"] = """
WITH ev AS (
  SELECT user_id, event_id,
         CAST(FLOOR(epoch(ts)) AS BIGINT) AS s,
         CAST(FLOOR(epoch(ts)) AS BIGINT) + 1800 AS en
  FROM events),
f AS (
  SELECT user_id, event_id, s, en,
         CASE WHEN MAX(en) OVER (PARTITION BY user_id ORDER BY s, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
              OR s > MAX(en) OVER (PARTITION BY user_id ORDER BY s, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
         THEN 1 ELSE 0 END AS ni
  FROM ev),
g AS (
  SELECT user_id, s, en,
         CAST(SUM(ni) OVER (PARTITION BY user_id ORDER BY s, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS island
  FROM f)
SELECT user_id, island, MIN(s) AS start_s, MAX(en) AS end_s,
       CAST(COUNT(*) AS BIGINT) AS n_events
FROM g GROUP BY user_id, island ORDER BY user_id, island
"""

ORACLES["ext_ratio_to_report"] = """
WITH daily AS (
  SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day, event_type,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2)
SELECT day, event_type, n,
       CAST(n * 10000 // SUM(n) OVER (PARTITION BY day) AS BIGINT) AS share_bp
FROM daily ORDER BY day, event_type
"""

ORACLES["ext_recall_at_k"] = """
WITH s AS (
  SELECT vec_id, embedding,
         CAST(list_min(embedding) AS DOUBLE) AS mn,
         CAST(list_max(embedding) AS DOUBLE) AS mx
  FROM embeddings WHERE vec_id <> 0),
dq AS (
  SELECT vec_id,
    CASE WHEN mx = mn
         THEN list_transform(embedding, x -> mn + 128.0 * 0.0)
         ELSE list_transform(embedding, x ->
           mn + (CAST(CAST(floor((CAST(x AS DOUBLE) - mn) * 255.0 / (mx - mn) + 0.5) AS INT) - 128 AS DOUBLE) + 128.0)
                * ((mx - mn) / 255.0))
    END AS approx
  FROM s),
q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0),
coarse AS (
  SELECT d.vec_id,
         ROUND(list_cosine_similarity(d.approx, q.qv), 4) + 0.0 AS csim
  FROM dq d, q
  ORDER BY csim DESC, d.vec_id LIMIT 50),
approx_top AS (
  SELECT e.vec_id,
         ROUND(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qv), 4)
           + 0.0 AS sim
  FROM coarse c JOIN embeddings e USING (vec_id), q
  ORDER BY sim DESC, e.vec_id LIMIT 5),
exact_top AS (
  SELECT e.vec_id,
         ROUND(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qv), 4)
           + 0.0 AS sim
  FROM embeddings e, q WHERE e.vec_id <> 0
  ORDER BY sim DESC, e.vec_id LIMIT 5),
hit AS (SELECT a.vec_id FROM approx_top a JOIN exact_top x USING (vec_id))
SELECT CAST(5 AS BIGINT) AS k, CAST(COUNT(*) AS BIGINT) AS n_hit,
       ROUND(CAST(COUNT(*) AS DOUBLE) / 5.0, 4) AS recall
FROM hit
"""


ORACLES["ext_json_extract"] = """
WITH parsed AS (
  SELECT event_type, CAST(json_extract(props, '$.k') AS BIGINT) AS k
  FROM events)
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CASE WHEN k IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
       MIN(k) AS min_k, MAX(k) AS max_k,
       ROUND(CAST(SUM(k) AS DOUBLE)
             / SUM(CASE WHEN k IS NOT NULL THEN 1 ELSE 0 END), 4) AS avg_k
FROM parsed GROUP BY event_type ORDER BY event_type
"""


ORACLES["ext_tokenizer_fertility"] = r"""
WITH per AS (
  SELECT lang, CAST(length(text) AS BIGINT) AS nc,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS nt,
         CAST(len(regexp_extract_all(text, '(\w+|[^\w\s])', 1)) AS BIGINT) AS nb
  FROM documents)
SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(nc) AS BIGINT) AS total_chars,
       CAST(SUM(nt) AS BIGINT) AS total_ws_tokens,
       ROUND(CAST(SUM(nc) AS DOUBLE) / SUM(nt), 4) AS chars_per_ws_token,
       ROUND(CAST(SUM(nc) AS DOUBLE) / SUM(nb), 4) AS chars_per_bpe_token
FROM per GROUP BY lang ORDER BY lang
"""


ORACLES["ext_growth_accounting"] = """
WITH um AS (
  SELECT DISTINCT user_id, date_trunc('month', ts) AS m FROM events),
first_m AS (SELECT user_id, MIN(m) AS m0 FROM um GROUP BY user_id),
prev AS (
  SELECT user_id, m + INTERVAL 1 MONTH AS m, TRUE AS was_prev FROM um),
cur AS (
  SELECT um.m,
         CASE WHEN um.m = f.m0 THEN 'new'
              WHEN p.was_prev THEN 'retained'
              ELSE 'resurrected' END AS status
  FROM um JOIN first_m f USING (user_id)
  LEFT JOIN prev p ON p.user_id = um.user_id AND p.m = um.m),
active AS (
  SELECT strftime(m, '%Y-%m') AS month, status,
         CAST(COUNT(*) AS BIGINT) AS n_users
  FROM cur GROUP BY 1, 2),
churned AS (
  SELECT strftime(n.m, '%Y-%m') AS month, 'churned' AS status,
         CAST(COUNT(*) AS BIGINT) AS n_users
  FROM (SELECT user_id, m + INTERVAL 1 MONTH AS m FROM um) n
  WHERE NOT EXISTS (
    SELECT 1 FROM um u2 WHERE u2.user_id = n.user_id AND u2.m = n.m)
  GROUP BY 1)
SELECT * FROM active UNION ALL SELECT * FROM churned
ORDER BY month, status
"""

ORACLES["ext_peak_concurrency"] = """
WITH b AS (
  SELECT CAST(FLOOR(epoch(ts)) AS BIGINT) AS t, 1 AS d, event_id FROM events
  UNION ALL
  SELECT CAST(FLOOR(epoch(ts)) AS BIGINT) + 1800, -1, event_id FROM events),
b2 AS (
  SELECT t, d, event_id,
         strftime(to_timestamp(t), '%Y-%m-%d') AS day
  FROM b),
live AS (
  SELECT day,
         SUM(d) OVER (PARTITION BY day ORDER BY t, d, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS live
  FROM b2)
SELECT day, CAST(MAX(live) AS BIGINT) AS peak_concurrent
FROM live GROUP BY day ORDER BY day
"""


ORACLES["ext_ship_delay"] = """
WITH j AS (
  SELECT o.o_orderpriority,
         CAST(date_diff('day', CAST(o.o_orderdate AS DATE),
                        CAST(l.l_shipdate AS DATE)) AS BIGINT) AS lag_d
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey)
SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(quantile_cont(lag_d, 0.5), 2) AS median_days,
       ROUND(quantile_cont(lag_d, 0.95), 2) AS p95_days,
       MAX(lag_d) AS max_days
FROM j GROUP BY o_orderpriority ORDER BY o_orderpriority
"""


ORACLES["ext_sql_correlated"] = """
SELECT event_id, event_type, ROUND(value, 2) AS v
FROM events e
WHERE value > 0.5 * (SELECT MAX(value) FROM events e2
                     WHERE e2.event_type = e.event_type)
ORDER BY event_id
"""

ORACLES["ext_unpivot"] = """
SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day, event_type,
       CAST(COUNT(*) AS BIGINT) AS n
FROM events WHERE event_type IN ('view', 'click', 'purchase')
GROUP BY 1, 2 ORDER BY day, event_type
"""


ORACLES["ext_benford"] = """
WITH d AS (
  SELECT CAST(c // CAST(pow(10, floor(log10(CAST(c AS DOUBLE)))) AS BIGINT)
              AS BIGINT) AS d
  FROM (SELECT CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS c FROM orders)
  WHERE c > 0),
per AS (SELECT d, CAST(COUNT(*) AS BIGINT) AS n FROM d GROUP BY d),
tot AS (SELECT CAST(SUM(n) AS BIGINT) AS total FROM per)
SELECT d, n,
       CAST(n * 10000 // total AS BIGINT) AS share_bp,
       CAST([0.301, 0.1761, 0.1249, 0.0969, 0.0792, 0.0669, 0.058, 0.0512,
             0.0458][CAST(d AS INT)] AS DOUBLE) AS benford_share
FROM per CROSS JOIN tot ORDER BY d
"""

# ---- TPC-H dossier completion (shape-faithful; see extensions.py note) ----

_DISC_CENTS = "CAST(ROUND(l_extendedprice * (1 - l_discount) * 100, 0) AS BIGINT)"

ORACLES["ext_tpch_q4"] = """
SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
FROM orders o
WHERE o_orderdate >= TIMESTAMP '1996-07-01'
  AND o_orderdate < TIMESTAMP '1996-10-01'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
GROUP BY o_orderpriority ORDER BY o_orderpriority
"""

ORACLES["ext_tpch_q7"] = f"""
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(year(l_shipdate) AS BIGINT) AS l_year,
       SUM({_DISC_CENTS}) / 100.0 AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1998-01-01'
  AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
"""

ORACLES["ext_tpch_q8"] = f"""
SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
       ROUND(SUM(CASE WHEN ns.n_name = 'NATION_5' THEN {_DISC_CENTS}
                      ELSE 0 END)
             / SUM({_DISC_CENTS}), 6) AS mkt_share
FROM lineitem
JOIN part ON l_partkey = p_partkey AND p_type = 'PROMO'
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation nc ON c_nationkey = nc.n_nationkey
JOIN region ON nc.n_regionkey = r_regionkey AND r_name = 'ASIA'
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ns ON s_nationkey = ns.n_nationkey
WHERE o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1998-01-01'
GROUP BY 1 ORDER BY 1
"""

ORACLES["ext_tpch_q10"] = f"""
SELECT c_custkey, c_name, c_acctbal, n_name,
       SUM({_DISC_CENTS}) / 100.0 AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1996-10-01'
  AND o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY 1, 2, 3, 4
ORDER BY revenue DESC, c_custkey LIMIT 20
"""

ORACLES["ext_tpch_q12"] = """
SELECT CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY
            THEN 'LATE' ELSE 'ONTIME' END AS ship_class,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
GROUP BY 1 ORDER BY 1
"""

ORACLES["ext_tpch_q13"] = """
WITH per_cust AS (
  SELECT c_custkey, CAST(COUNT(o_orderkey) AS BIGINT) AS c_count
  FROM customer
  LEFT OUTER JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
  GROUP BY c_custkey)
SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
FROM per_cust GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""

ORACLES["ext_tpch_q14"] = f"""
SELECT ROUND(100.0 * SUM(CASE WHEN p_type = 'PROMO' THEN {_DISC_CENTS}
                              ELSE 0 END)
             / SUM({_DISC_CENTS}), 4) AS promo_revenue_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-09-01'
  AND l_shipdate < TIMESTAMP '1996-10-01'
"""

ORACLES["ext_tpch_q15"] = f"""
WITH rev AS (
  SELECT l_suppkey, CAST(SUM({_DISC_CENTS}) AS BIGINT) AS rc
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate < TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey)
SELECT s_suppkey, s_name, rc / 100.0 AS total_revenue
FROM rev JOIN supplier ON l_suppkey = s_suppkey
WHERE rc = (SELECT MAX(rc) FROM rev)
ORDER BY s_suppkey
"""

ORACLES["ext_tpch_q17"] = """
WITH per_part AS (
  SELECT l_partkey AS pk,
         CAST(SUM(CAST(ROUND(l_quantity * 100, 0) AS BIGINT)) AS BIGINT)
           AS sum_qc,
         CAST(COUNT(*) AS BIGINT) AS n_li
  FROM lineitem GROUP BY l_partkey)
SELECT ROUND(SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT))
             / 100.0 / 7.0, 4) AS avg_yearly
FROM lineitem
JOIN part ON l_partkey = p_partkey AND p_brand = 'Brand#1' AND p_size < 10
JOIN per_part ON l_partkey = pk
WHERE CAST(ROUND(l_quantity * 100, 0) AS BIGINT) * 5 * n_li < sum_qc
"""

ORACLES["ext_tpch_q18"] = """
WITH big AS (
  SELECT l_orderkey AS lk,
         CAST(SUM(CAST(ROUND(l_quantity * 100, 0) AS BIGINT)) AS BIGINT)
           AS sum_qc
  FROM lineitem GROUP BY l_orderkey
  HAVING SUM(CAST(ROUND(l_quantity * 100, 0) AS BIGINT)) > 25000)
SELECT c_name, c_custkey, o_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
       ROUND(o_totalprice, 2) AS o_totalprice,
       sum_qc / 100.0 AS sum_qty
FROM orders
JOIN big ON o_orderkey = lk
JOIN customer ON o_custkey = c_custkey
ORDER BY o_totalprice DESC, o_orderdate, o_orderkey LIMIT 100
"""

ORACLES["ext_tpch_q19"] = f"""
SELECT SUM({_DISC_CENTS}) / 100.0 AS revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
       AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
       AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 20 AND 30)
"""

# textbook EXISTS / NOT EXISTS form — independently derives the same
# semantics the Spark side computes via the single per-order aggregate
ORACLES["ext_tpch_q21"] = """
WITH rws AS (
  SELECT l_orderkey, l_suppkey,
         l_shipdate > o_orderdate + INTERVAL 365 DAY AS is_late
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE o_orderstatus = 'F')
SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
FROM (
  SELECT DISTINCT r1.l_orderkey, r1.l_suppkey
  FROM rws r1
  WHERE r1.is_late
    AND EXISTS (SELECT 1 FROM rws r2
                WHERE r2.l_orderkey = r1.l_orderkey
                  AND r2.l_suppkey <> r1.l_suppkey)
    AND NOT EXISTS (SELECT 1 FROM rws r3
                    WHERE r3.l_orderkey = r1.l_orderkey
                      AND r3.l_suppkey <> r1.l_suppkey
                      AND r3.is_late)
) q JOIN supplier ON q.l_suppkey = s_suppkey
GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 10
"""

ORACLES["ext_tpch_q22"] = """
WITH cust AS (
  SELECT c_custkey, c_nationkey,
         CAST(ROUND(c_acctbal * 100, 0) AS BIGINT) AS bc
  FROM customer WHERE c_nationkey IN (1, 3, 5, 7, 9, 11, 13)),
avg_pos AS (
  SELECT CAST(SUM(bc) AS BIGINT) AS sum_bc,
         CAST(COUNT(*) AS BIGINT) AS n_pos
  FROM cust WHERE bc > 0)
SELECT c_nationkey AS cntrycode, CAST(COUNT(*) AS BIGINT) AS numcust,
       CAST(SUM(bc) AS BIGINT) / 100.0 AS totacctbal
FROM cust, avg_pos
WHERE bc * n_pos > sum_bc
  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
GROUP BY c_nationkey ORDER BY cntrycode
"""

# ---- graph traversal + LM scoring + experimentation ----------------------

_BFS_EDGES = (
    "e AS (SELECT doc_a AS a, doc_b AS b FROM pairs "
    "UNION SELECT doc_b, doc_a FROM pairs)"
)


def _bfs_round(k: int) -> str:
    """dist_k = min(dist_{k-1}, neighbor-of-dist_{k-1} + 1)."""
    return (
        f"d{k} AS (SELECT node, CAST(MIN(dist) AS BIGINT) AS dist FROM ("
        f"SELECT node, dist FROM d{k-1} UNION ALL "
        f"SELECT e.b AS node, d{k-1}.dist + 1 AS dist "
        f"FROM d{k-1} JOIN e ON e.a = d{k-1}.node) GROUP BY node)"
    )


ORACLES["ext_bfs_distances"] = (
    f"WITH {_SHINGLE_CTES}, {_minhash_sig_cte()}, {_band_cte()}, {_PAIRS_CTE}, "
    f"{_BFS_EDGES}, "
    "d0 AS (SELECT MIN(doc_a) AS node, CAST(0 AS BIGINT) AS dist FROM pairs), "
    + ", ".join(_bfs_round(k) for k in (1, 2, 3, 4))
    + " SELECT node AS doc_id, dist FROM d4 ORDER BY doc_id"
)


def _kcore_round(k: int, core: int = 2) -> str:
    return (
        f"k{k} AS (SELECT a FROM e{k-1} GROUP BY a HAVING COUNT(*) >= {core}), "
        f"e{k} AS (SELECT a, b FROM e{k-1} "
        f"WHERE a IN (SELECT a FROM k{k}) AND b IN (SELECT a FROM k{k}))"
    )


ORACLES["ext_kcore"] = (
    f"WITH {_SHINGLE_CTES}, {_minhash_sig_cte()}, {_band_cte()}, {_PAIRS_CTE}, "
    "e0 AS (SELECT doc_a AS a, doc_b AS b FROM pairs "
    "UNION SELECT doc_b, doc_a FROM pairs), "
    + ", ".join(_kcore_round(k) for k in (1, 2, 3))
    + " SELECT a AS doc_id, CAST(COUNT(*) AS BIGINT) AS deg "
    "FROM e3 GROUP BY a ORDER BY doc_id"
)

ORACLES["ext_bigram_surprisal"] = f"""
WITH toks AS (
  SELECT doc_id, unnest({TOKS}) AS w,
         generate_subscripts({TOKS}, 1) AS pos
  FROM documents),
bigrams AS (
  SELECT t1.doc_id, t1.w AS w1, t2.w AS w2
  FROM toks t1 JOIN toks t2
    ON t1.doc_id = t2.doc_id AND t2.pos = t1.pos + 1),
big_c AS (SELECT w1, w2, COUNT(*) AS c12 FROM bigrams GROUP BY w1, w2),
ctx_c AS (SELECT w1, COUNT(*) AS c1 FROM bigrams GROUP BY w1),
vocab AS (SELECT COUNT(DISTINCT w) AS v FROM toks)
SELECT b.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_bigrams,
       ROUND(AVG(-ln((c12 + 1) / CAST(c1 + v AS DOUBLE))), 4) AS avg_surprisal
FROM bigrams b
JOIN big_c USING (w1, w2) JOIN ctx_c USING (w1) CROSS JOIN vocab
GROUP BY b.doc_id ORDER BY b.doc_id
"""

ORACLES["ext_ab_assignment"] = f"""
WITH users AS (
  SELECT user_id,
         MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS converted
  FROM events GROUP BY user_id)
SELECT {md5long("CAST(user_id AS VARCHAR)")} % 2 AS arm,
       CAST(COUNT(*) AS BIGINT) AS n_users,
       CAST(SUM(converted) AS BIGINT) AS n_converted,
       CAST(SUM(converted) * 10000 // COUNT(*) AS BIGINT) AS conv_bp
FROM users GROUP BY arm ORDER BY arm
"""


def _bpe_round(r: int) -> str:
    """pair counts -> 1-row argmax -> leftmost-non-overlapping merge."""
    return (
        f"p{r} AS (SELECT l[i] || ' ' || l[i+1] AS pair, "
        f"CAST(SUM(wc) AS BIGINT) AS freq "
        f"FROM (SELECT string_split(sym, ' ') AS l, wc FROM w{r-1}) s, "
        f"UNNEST(range(1, len(s.l))) AS u(i) GROUP BY 1), "
        f"b{r} AS (SELECT pair, freq FROM p{r} ORDER BY freq DESC, pair LIMIT 1), "
        f"w{r} AS (SELECT word, rtrim(replace(sym || ' ', (SELECT pair FROM b{r}) || ' ', "
        f"replace((SELECT pair FROM b{r}), ' _', '') || ' ')) AS sym, wc FROM w{r-1})"
    )


_BPE_CTES = (
    f"toks AS (SELECT unnest({TOKS}) AS word FROM documents), "
    "wf AS (SELECT word, COUNT(*) AS wc FROM toks GROUP BY word), "
    "w0 AS (SELECT word, '_' || array_to_string("
    "list_transform(range(1, length(word) + 1), i -> substr(word, i, 1)), "
    "' _') AS sym, wc FROM wf), "
    + ", ".join(_bpe_round(r) for r in (1, 2, 3))
)

ORACLES["ext_bpe_merges"] = (
    f"WITH {_BPE_CTES}"
    " SELECT * FROM ("
    "SELECT CAST(1 AS BIGINT) AS round, pair, replace(pair, ' _', '') AS merged, freq FROM b1 "
    "UNION ALL SELECT 2, pair, replace(pair, ' _', ''), freq FROM b2 "
    "UNION ALL SELECT 3, pair, replace(pair, ' _', ''), freq FROM b3"
    ") ORDER BY round"
)

ORACLES["ext_readability"] = f"""
WITH t AS (
  SELECT doc_id,
         len({TOKS}) AS n_words,
         greatest(len(regexp_extract_all(text, '[.!?]+')), 1) AS n_sentences,
         len(regexp_extract_all(lower(text), '[aeiouy]+')) AS n_syllables
  FROM documents)
SELECT doc_id, CAST(n_words AS BIGINT) AS n_words,
       CAST(n_sentences AS BIGINT) AS n_sentences,
       CAST(n_syllables AS BIGINT) AS n_syllables,
       CAST(206835 - (1015 * n_words) // n_sentences
                   - (84600 * n_syllables) // n_words AS BIGINT) AS flesch_milli
FROM t WHERE n_words > 0 ORDER BY doc_id
"""

# RE2 spelling of operators.textstats.MOJIBAKE_RE / CTRL_RE
ORACLES["ext_encoding_audit"] = r"""
WITH d AS (
  SELECT source,
         len(regexp_extract_all(text, '�')) AS nr,
         len(regexp_extract_all(text,
             'Ã[\x{0080}-\x{00ff}]|Â[\x{0080}-\x{00ff}]|â€')) AS nm,
         len(regexp_extract_all(text,
             '[\x{01}-\x{08}\x{0b}\x{0c}\x{0e}-\x{1f}]')) AS nc
  FROM documents)
SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN nr + nm + nc > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_damaged,
       CAST(SUM(nr) AS BIGINT) AS n_repl_chars,
       CAST(SUM(nm) AS BIGINT) AS n_mojibake,
       CAST(SUM(nc) AS BIGINT) AS n_ctrl_chars
FROM d GROUP BY source ORDER BY source
"""

ORACLES["ext_bpe_encode"] = (
    f"WITH {_BPE_CTES}, "
    "vocab AS (SELECT word, len(string_split(sym, ' ')) AS n_sym FROM w3), "
    f"dtoks AS (SELECT doc_id, unnest({TOKS}) AS word FROM documents) "
    "SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_words, "
    "CAST(SUM(n_sym) AS BIGINT) AS n_bpe_tokens "
    "FROM dtoks JOIN vocab USING (word) "
    "GROUP BY doc_id ORDER BY doc_id"
)


ORACLES["ext_repeated_spans"] = f"""
WITH toks AS (SELECT doc_id, {TOKS} AS tk FROM documents),
grams AS (
  SELECT doc_id, CAST(i AS BIGINT) AS pos,
         md5(array_to_string(tk[i:i+7], ' ')) AS h
  FROM (SELECT doc_id, tk FROM toks WHERE len(tk) >= 8) s,
       UNNEST(range(1, len(s.tk) - 8 + 2)) AS u(i)),
rep AS (SELECT h FROM grams GROUP BY h HAVING COUNT(DISTINCT doc_id) >= 2),
covered AS (
  SELECT doc_id, pos, pos + 7 AS "end"
  FROM grams WHERE h IN (SELECT h FROM rep)),
flagged AS (
  SELECT doc_id, pos, "end",
         CASE WHEN MAX("end") OVER (PARTITION BY doc_id ORDER BY pos
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
               OR pos > MAX("end") OVER (PARTITION BY doc_id ORDER BY pos
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) + 1
              THEN 1 ELSE 0 END AS new_island
  FROM covered),
islands AS (
  SELECT doc_id, pos, "end",
         SUM(new_island) OVER (PARTITION BY doc_id ORDER BY pos
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
  FROM flagged)
SELECT doc_id,
       CAST(MIN(pos) AS BIGINT) AS span_start,
       CAST(MAX("end") AS BIGINT) AS span_end,
       CAST(MAX("end") - MIN(pos) + 1 AS BIGINT) AS span_tokens
FROM islands GROUP BY doc_id, island
ORDER BY doc_id, span_start
"""


ORACLES["ext_variant_extract"] = """
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CASE WHEN CAST(json_extract(props, '$.k') AS BIGINT) >= 50
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_high,
       CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k
FROM events GROUP BY event_type ORDER BY event_type
"""


ORACLES["ext_sql_pipe"] = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(ROUND(l_quantity * 100, 0) AS BIGINT)) AS BIGINT) AS sum_qc,
       CAST(COUNT(*) AS BIGINT) AS n
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""

ORACLES["ext_sql_recursive_bfs"] = (
    f"WITH RECURSIVE {_SHINGLE_CTES}, {_minhash_sig_cte()}, {_band_cte()}, "
    f"{_PAIRS_CTE}, "
    "reach(node, dist) AS ("
    "  SELECT MIN(doc_a), 0 FROM pairs"
    "  UNION ALL"
    "  SELECT e.b, reach.dist + 1 FROM reach"
    "  JOIN (SELECT doc_a AS a, doc_b AS b FROM pairs"
    "        UNION ALL SELECT doc_b, doc_a FROM pairs) e"
    "    ON e.a = reach.node"
    "  WHERE reach.dist < 4) "
    "SELECT node AS doc_id, CAST(MIN(dist) AS BIGINT) AS dist "
    "FROM reach GROUP BY node ORDER BY doc_id"
)

# composed at module end so every referenced tier oracle already exists
def _tier_recall_leg(tier: str, tier_sql: str, exact_sql: str) -> str:
    return (
        f"SELECT '{tier}' AS tier, CAST(5 AS BIGINT) AS k, "
        "CAST(COUNT(*) AS BIGINT) AS n_hit, "
        "ROUND(CAST(COUNT(*) AS DOUBLE) / 5.0, 4) AS recall "
        f"FROM ({tier_sql}) a JOIN ({exact_sql}) x USING (vec_id)"
    )


ORACLES["ext_ann_tier_recall"] = (
    " UNION ALL ".join(
        _tier_recall_leg(t, ORACLES[q], ORACLES["x2_cosine_topk"])
        for t, q in (
            ("lsh_single_bucket", "ext_ann_lsh_quantized"),
            ("lsh_served_default", "ext_ann_lsh_multiprobe"),
            ("quantized_rerank", "ext_ann_quantized"),
            ("pq_rerank", "ext_ann_pq_rerank"),
        )
    )
    + " ORDER BY tier"
)

ORACLES["ext_search_facets"] = f"""
WITH toks AS (SELECT doc_id, unnest({TOKS}) AS token FROM documents),
hits AS (SELECT DISTINCT doc_id FROM toks WHERE token IN ('spark', 'join')),
matched AS (SELECT d.* FROM documents d JOIN hits USING (doc_id)),
counts AS (
  SELECT 'lang' AS facet, CAST(lang AS VARCHAR) AS value, COUNT(*) AS n
  FROM matched GROUP BY value
  UNION ALL
  SELECT 'source', CAST(source AS VARCHAR), COUNT(*) FROM matched GROUP BY 2),
ranked AS (
  SELECT facet, value, CAST(n AS BIGINT) AS n,
         ROW_NUMBER() OVER (PARTITION BY facet ORDER BY n DESC, value) AS rn
  FROM counts)
SELECT facet, value, n, CAST(rn AS BIGINT) AS rn FROM ranked
WHERE rn <= 5 ORDER BY facet, rn
"""



def _serve_loop_e2e_oracle() -> str:
    """ext_serve_loop_e2e: replay the serve loop's TWO-STAGE gate in SQL
    (stage 1: bootstrap batch self-gates — a doc is suppressed iff it shares
    a band bucket with ANY lower-id doc in the batch; stage 2: the delta
    batch gates against the SURVIVORS' buckets plus lower-id delta docs),
    then score BM25 over the resulting corpus with q20's arithmetic. The
    banded-minhash fragments mirror _minhash_sig_cte/_band_cte (proven by
    ext_minhash_candidates) but run over the combined corpus + delta."""
    from .extensions import _SERVE_E2E_NEW_DOCS

    new_vals = ", ".join(f"({i}, '{t}')" for i, t in _SERVE_E2E_NEW_DOCS)
    mins = ", ".join(
        f"MIN(({a} * (h % 2147483647) + {b}) % {MERSENNE_61}) AS m{i}"
        for i, (a, b) in enumerate(_MINHASH_PARAMS[:16])
    )
    band_parts = []
    for bidx in range(4):
        cols = [f"m{bidx * 4 + j}" for j in range(4)]
        key = " || '_' || ".join(f"CAST({c} AS VARCHAR)" for c in cols)
        band_parts.append(f"SELECT doc_id, {bidx} AS band, {key} AS bk FROM sigs2")
    bands2 = " UNION ALL ".join(band_parts)
    return f"""
WITH allc AS (
  SELECT doc_id, text FROM documents
  UNION ALL SELECT * FROM (VALUES {new_vals}) v(doc_id, text)
  UNION ALL SELECT 9000003 AS doc_id, text FROM documents WHERE doc_id = 1
),
toks2 AS (SELECT doc_id, {TOKS} AS tk FROM allc),
grams2 AS (
  SELECT doc_id, array_to_string(tk[i:i+2], ' ') AS sh FROM (
    SELECT doc_id, tk, unnest(generate_series(1, len(tk) - 2)) AS i FROM toks2)
),
hashes2 AS (SELECT DISTINCT doc_id, {md5long('sh')} AS h FROM grams2),
sigs2 AS (SELECT doc_id, {mins} FROM hashes2 GROUP BY doc_id),
bands2 AS ({bands2}),
sup1 AS (
  SELECT DISTINCT a.doc_id FROM bands2 a JOIN bands2 b
    ON a.band = b.band AND a.bk = b.bk
  WHERE a.doc_id < 9000000 AND b.doc_id < a.doc_id),
surv1 AS (SELECT doc_id FROM documents
          WHERE doc_id NOT IN (SELECT doc_id FROM sup1)),
sup2 AS (
  SELECT DISTINCT a.doc_id FROM bands2 a JOIN bands2 b
    ON a.band = b.band AND a.bk = b.bk
  WHERE a.doc_id >= 9000000 AND (
        (b.doc_id < 9000000 AND b.doc_id IN (SELECT doc_id FROM surv1))
     OR (b.doc_id >= 9000000 AND b.doc_id < a.doc_id))),
corpus AS (
  SELECT a.doc_id, a.text FROM allc a
  WHERE a.doc_id IN (SELECT doc_id FROM surv1)
     OR (a.doc_id >= 9000000 AND a.doc_id NOT IN (SELECT doc_id FROM sup2))),
toksb AS (SELECT doc_id, unnest({TOKS}) AS token FROM corpus),
postings AS (SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS tf
             FROM toksb GROUP BY doc_id, token),
dlen AS (SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS dl FROM postings GROUP BY doc_id),
stats AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, AVG(CAST(dl AS DOUBLE)) AS avgdl FROM dlen),
dfreq AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS df FROM postings
          WHERE token IN ('spark', 'join') GROUP BY token),
scores AS (
  SELECT p.doc_id,
         SUM( ln(1.0 + (s.n - d.df + 0.5) / (d.df + 0.5)) * p.tf * {K1 + 1.0!r}
              / (p.tf + {K1!r} * (1.0 - {B!r} + {B!r} * l.dl / s.avgdl)) ) AS raw
  FROM postings p
  JOIN dfreq d ON p.token = d.token
  JOIN dlen l ON l.doc_id = p.doc_id
  CROSS JOIN stats s
  GROUP BY p.doc_id)
SELECT doc_id, ROUND(raw, 4) AS score FROM scores
ORDER BY score DESC, doc_id LIMIT 10
"""


ORACLES["ext_serve_loop_e2e"] = _serve_loop_e2e_oracle()


# ---- TPC-H partsupp-bound five: the DERIVED partsupp CTE -------------------
# Mirrors extensions._derived_partsupp exactly: 4 supplier rows per part
# via integer arithmetic over (p_partkey, j, |supplier|). ps_supplycost is
# an integer cent count / 100.0 — ONE IEEE division of the same integer on
# both engines, so even double equality (Q2's min-cost join) is exact.
_PARTSUPP_CTE = """
partsupp AS (
  SELECT p_partkey AS ps_partkey,
         (p_partkey + jj.j * s.step) % s.cnt AS ps_suppkey,
         CAST((p_partkey * 11 + jj.j * 17) % 9999 + 1 AS INT) AS ps_availqty,
         ((p_partkey * 13 + jj.j * 29) % 99900 + 100) / 100.0 AS ps_supplycost
  FROM part,
       (SELECT unnest([0, 1, 2, 3]) AS j) jj,
       (SELECT cnt,
               CASE WHEN (2 * (cnt // 4 + 1)) % cnt = 0
                      OR (3 * (cnt // 4 + 1)) % cnt = 0
                    THEN 1 ELSE cnt // 4 + 1 END AS step
        FROM (SELECT COUNT(*) AS cnt FROM supplier)) s)
"""

ORACLES["ext_tpch_q2"] = (
    "WITH " + _PARTSUPP_CTE + """,
cand AS (
  SELECT ps.ps_partkey, ps.ps_supplycost, s.s_acctbal, s.s_name, n.n_name
  FROM partsupp ps
  JOIN supplier s ON ps.ps_suppkey = s.s_suppkey
  JOIN nation n ON s.s_nationkey = n.n_nationkey
  JOIN region r ON n.n_regionkey = r.r_regionkey
  WHERE r.r_name = 'EUROPE'),
mc AS (SELECT ps_partkey AS mk, MIN(ps_supplycost) AS mn
       FROM cand GROUP BY ps_partkey)
SELECT c.s_acctbal, c.s_name, c.n_name, p.p_partkey, p.p_brand,
       c.ps_supplycost
FROM cand c
JOIN mc ON c.ps_partkey = mc.mk AND c.ps_supplycost = mc.mn
JOIN part p ON c.ps_partkey = p.p_partkey
WHERE p.p_type = 'ECONOMY' AND p.p_size BETWEEN 10 AND 20
ORDER BY c.s_acctbal DESC, c.n_name, c.s_name, p.p_partkey
LIMIT 100
"""
)

ORACLES["ext_tpch_q9"] = (
    "WITH " + _PARTSUPP_CTE + """
SELECT n.n_name AS nation,
       CAST(EXTRACT(YEAR FROM o.o_orderdate) AS BIGINT) AS o_year,
       SUM(CAST(ROUND(l.l_extendedprice * (1.0 - l.l_discount) * 100, 0) AS BIGINT)
           - CAST(ROUND(ps.ps_supplycost * 100, 0) AS BIGINT)
             * CAST(ROUND(l.l_quantity, 0) AS BIGINT)) / 100.0 AS sum_profit
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey AND p.p_name LIKE '%red%'
JOIN partsupp ps ON l.l_partkey = ps.ps_partkey AND l.l_suppkey = ps.ps_suppkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN orders o ON l.l_orderkey = o.o_orderkey
GROUP BY nation, o_year
ORDER BY nation, o_year DESC
"""
)

ORACLES["ext_tpch_q11"] = (
    "WITH " + _PARTSUPP_CTE + """,
base AS (
  SELECT ps.ps_partkey,
         CAST(ROUND(ps.ps_supplycost * 100, 0) AS BIGINT)
           * CAST(ps.ps_availqty AS BIGINT) AS vc
  FROM partsupp ps
  JOIN supplier s ON ps.ps_suppkey = s.s_suppkey
  JOIN nation n ON s.s_nationkey = n.n_nationkey
  WHERE n.n_name = 'NATION_7'),
grouped AS (SELECT ps_partkey, SUM(vc) AS gvc FROM base GROUP BY ps_partkey),
total AS (SELECT SUM(vc) AS tot FROM base)
SELECT g.ps_partkey, CAST(g.gvc AS BIGINT) / 100.0 AS value
FROM grouped g, total t
WHERE g.gvc * 500 > t.tot
ORDER BY value DESC, g.ps_partkey
"""
)

ORACLES["ext_tpch_q16"] = (
    "WITH " + _PARTSUPP_CTE + """
SELECT p.p_brand, p.p_type, p.p_size,
       CAST(COUNT(DISTINCT ps.ps_suppkey) AS BIGINT) AS supplier_cnt
FROM partsupp ps
JOIN part p ON ps.ps_partkey = p.p_partkey
WHERE p.p_brand <> 'Brand#1'
  AND p.p_type NOT LIKE 'PROMO%'
  AND p.p_size IN (1, 5, 11, 15, 21, 26, 31, 36)
  AND ps.ps_suppkey NOT IN
      (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p.p_brand, p.p_type, p.p_size
ORDER BY supplier_cnt DESC, p.p_brand, p.p_type, p.p_size
"""
)

ORACLES["ext_tpch_q20"] = (
    "WITH " + _PARTSUPP_CTE + """,
liq AS (
  SELECT l_partkey, l_suppkey,
         SUM(CAST(ROUND(l_quantity, 0) AS BIGINT)) AS sq
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
  GROUP BY l_partkey, l_suppkey)
SELECT s.s_name, s.s_acctbal
FROM supplier s
JOIN nation n ON s.s_nationkey = n.n_nationkey
WHERE n.n_name = 'NATION_3'
  AND s.s_suppkey IN (
    SELECT ps.ps_suppkey
    FROM partsupp ps
    JOIN part p ON ps.ps_partkey = p.p_partkey AND p.p_name LIKE 'red%'
    JOIN liq ON ps.ps_partkey = liq.l_partkey
            AND ps.ps_suppkey = liq.l_suppkey
    WHERE CAST(ps.ps_availqty AS BIGINT) * 2 > liq.sq)
ORDER BY s.s_name
"""
)

# ---- round-8 additions: training-feed audits -------------------------------

ORACLES["ext_truncation_audit"] = f"""
WITH per AS (
  SELECT source, CAST(len({TOKS}) AS BIGINT) AS n FROM documents)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN n > 128 THEN 1 ELSE 0 END) AS BIGINT) AS n_truncated,
       CAST(10000 * SUM(CASE WHEN n > 128 THEN 1 ELSE 0 END) // COUNT(*) AS BIGINT) AS truncated_bps,
       CAST(SUM(n) AS BIGINT) AS total_tokens,
       CAST(SUM(GREATEST(n - 128, 0)) AS BIGINT) AS tokens_lost,
       CAST(10000 * SUM(GREATEST(n - 128, 0)) // SUM(n) AS BIGINT) AS loss_bps
FROM per GROUP BY source ORDER BY source
"""

ORACLES["ext_ngram_novelty"] = f"""
WITH toks AS (SELECT doc_id, {TOKS} AS tk FROM documents),
grams AS (
  SELECT DISTINCT doc_id, array_to_string(tk[i:i+4], ' ') AS gram FROM (
    SELECT doc_id, tk, unnest(generate_series(1, len(tk) - 4)) AS i FROM toks)
),
first AS (SELECT gram, MIN(doc_id) AS first_doc FROM grams GROUP BY gram),
per AS (
  SELECT g.doc_id,
         CAST(COUNT(*) AS BIGINT) AS n_grams,
         CAST(SUM(CASE WHEN f.first_doc = g.doc_id THEN 1 ELSE 0 END) AS BIGINT) AS n_novel
  FROM grams g JOIN first f USING (gram) GROUP BY g.doc_id)
SELECT doc_id, n_grams, n_novel,
       CAST(10000 * n_novel // n_grams AS BIGINT) AS novelty_bps
FROM per WHERE n_grams >= 5
ORDER BY novelty_bps, n_grams DESC, doc_id LIMIT 20
"""

ORACLES["ext_vocab_topk_coverage"] = f"""
WITH counts AS (
  SELECT tok, CAST(COUNT(*) AS BIGINT) AS c FROM (
    SELECT unnest({TOKS}) AS tok FROM documents) GROUP BY tok),
total AS (SELECT CAST(SUM(c) AS BIGINT) AS total FROM counts),
k10 AS (SELECT c FROM counts ORDER BY c DESC, tok LIMIT 10),
k100 AS (SELECT c FROM counts ORDER BY c DESC, tok LIMIT 100),
k1000 AS (SELECT c FROM counts ORDER BY c DESC, tok LIMIT 1000)
SELECT CAST(10 AS BIGINT) AS k, CAST(COUNT(*) AS BIGINT) AS n_types,
       CAST(SUM(c) AS BIGINT) AS covered_tokens,
       CAST(10000 * SUM(c) // (SELECT total FROM total) AS BIGINT) AS coverage_bps
FROM k10
UNION ALL
SELECT 100, CAST(COUNT(*) AS BIGINT), CAST(SUM(c) AS BIGINT),
       CAST(10000 * SUM(c) // (SELECT total FROM total) AS BIGINT) FROM k100
UNION ALL
SELECT 1000, CAST(COUNT(*) AS BIGINT), CAST(SUM(c) AS BIGINT),
       CAST(10000 * SUM(c) // (SELECT total FROM total) AS BIGINT) FROM k1000
ORDER BY k
"""

ORACLES["ext_hapax_rate"] = f"""
WITH counts AS (
  SELECT source, tok, CAST(COUNT(*) AS BIGINT) AS c FROM (
    SELECT source, unnest({TOKS}) AS tok FROM documents) GROUP BY source, tok)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_types,
       CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax,
       CAST(10000 * SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) // COUNT(*) AS BIGINT) AS hapax_bps,
       CAST(SUM(c) AS BIGINT) AS n_tokens
FROM counts GROUP BY source ORDER BY source
"""

ORACLES["ext_source_vocab_overlap"] = f"""
WITH counts AS (
  SELECT source, tok, CAST(COUNT(*) AS BIGINT) AS c FROM (
    SELECT source, unnest({TOKS}) AS tok FROM documents) GROUP BY source, tok),
head AS (
  SELECT source, tok FROM (
    SELECT source, tok,
           ROW_NUMBER() OVER (PARTITION BY source ORDER BY c DESC, tok) AS rn
    FROM counts) WHERE rn <= 100),
hs AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS hn FROM head GROUP BY source)
SELECT src_a, src_b, overlap_n,
       CAST(10000 * overlap_n // (sa.hn + sb.hn - overlap_n) AS BIGINT)
         AS jaccard_bps
FROM (
  SELECT a.source AS src_a, b.source AS src_b,
         CAST(COUNT(*) AS BIGINT) AS overlap_n
  FROM head a JOIN head b ON a.tok = b.tok AND a.source < b.source
  GROUP BY a.source, b.source) p
JOIN hs sa ON sa.source = p.src_a
JOIN hs sb ON sb.source = p.src_b
ORDER BY jaccard_bps DESC, src_a, src_b LIMIT 20
"""

ORACLES["ext_sentence_stats"] = """
WITH per AS (
  SELECT source,
         CAST(len(list_filter(list_transform(
           regexp_split_to_array(text, '[.!?]'), s -> trim(s)), s -> s <> '')) AS BIGINT) AS n_sentences,
         CAST(n_chars AS BIGINT) AS n_chars
  FROM documents)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_sentences) AS BIGINT) AS total_sentences,
       CAST(100 * SUM(n_sentences) // COUNT(*) AS BIGINT) AS sentences_per_doc_x100,
       CAST(SUM(n_chars) // SUM(n_sentences) AS BIGINT) AS chars_per_sentence
FROM per GROUP BY source ORDER BY source
"""

ORACLES["ext_dup_sample_estimate"] = f"""
WITH groups AS (
  SELECT {md5long('text')} AS h, CAST(COUNT(*) AS BIGINT) AS n
  FROM documents GROUP BY h),
g AS (SELECT n, CASE WHEN ((h % 8) + 8) % 8 = 0 THEN 1 ELSE 0 END AS in_sample FROM groups),
agg AS (
  SELECT CAST(SUM(n) AS BIGINT) AS n_docs,
         CAST(SUM(n - 1) AS BIGINT) AS n_dup_docs,
         CAST(SUM(n * in_sample) AS BIGINT) AS n_sample_docs,
         CAST(SUM((n - 1) * in_sample) AS BIGINT) AS n_sample_dups
  FROM g)
SELECT n_docs, n_dup_docs,
       CAST(10000 * n_dup_docs // n_docs AS BIGINT) AS exact_dup_bps,
       n_sample_docs, n_sample_dups,
       CAST(CASE WHEN n_sample_docs > 0 THEN 10000 * n_sample_dups // n_sample_docs ELSE 0 END AS BIGINT) AS est_dup_bps,
       CAST(ABS(10000 * n_dup_docs // n_docs - CASE WHEN n_sample_docs > 0 THEN 10000 * n_sample_dups // n_sample_docs ELSE 0 END) AS BIGINT) AS err_bps
FROM agg
"""
