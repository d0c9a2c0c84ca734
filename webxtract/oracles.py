"""DuckDB oracle SQL for the driver-contract queries (webxtract.contract).

Every oracle is hand-derived ANSI SQL over the pre-registered views
(region nation customer supplier part orders lineitem events documents
embeddings) that reproduces the Spark query bit-for-bit: same column
names, same rounding, same engine-neutral hashes (md5 low-60-bit on
the dedup paths). EVERY contract query has an oracle — including the
LSH banding joins, simhash bit sums, and ANN probes, whose
deterministic plane/permutation families were chosen precisely so the
bucket arithmetic stays SQL-expressible; the driver records zero
rows-only checks.
"""

RUN_DATE = "2026-01-15"

_POLY_HASH = (
    "list_reduce(list_prepend(0::BIGINT, list_transform(string_split({s}, ''),"
    " c -> ord(c)::BIGINT)), (acc, c) -> (acc * 31 + c) % 2147483647)"
)

_TOKENS = "regexp_split_to_array(trim({t}), '\\s+')"

ORACLES: dict[str, str] = {}

# ------------------------------------------------------------ relational

ORACLES["tpch_q1_agg"] = """
SELECT
  l_returnflag,
  l_linestatus,
  round(sum(l_quantity), 2) AS sum_qty,
  round(sum(l_extendedprice), 2) AS sum_base_price,
  round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
  count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-01'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""

ORACLES["broadcast_revenue_by_nation"] = """
SELECT
  n_name,
  round(sum(o_totalprice), 2) AS revenue,
  count(*) AS order_count
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
ORDER BY n_name
"""

ORACLES["window_top3_orders"] = """
SELECT o_custkey, o_orderkey, totalprice, rn FROM (
  SELECT
    o_custkey,
    o_orderkey,
    round(o_totalprice, 2) AS totalprice,
    row_number() OVER (
      PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey
    ) AS rn
  FROM orders
) WHERE rn <= 3
"""

ORACLES["windowed_event_counts"] = """
SELECT
  time_bucket(INTERVAL '10 minutes', ts) AS window_start,
  event_type,
  count(*) AS n_events,
  round(sum(value), 6) AS total_value
FROM events
GROUP BY 1, 2
ORDER BY window_start, event_type
"""

ORACLES["sessionize_events"] = """
WITH gaps AS (
  SELECT
    user_id,
    event_id,
    ts,
    CASE WHEN
      CAST(floor(epoch(ts)) AS BIGINT)
        - lag(CAST(floor(epoch(ts)) AS BIGINT)) OVER w IS NULL
      OR CAST(floor(epoch(ts)) AS BIGINT)
        - lag(CAST(floor(epoch(ts)) AS BIGINT)) OVER w > 1800
    THEN 1 ELSE 0 END AS brk
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sess AS (
  SELECT
    user_id,
    event_id,
    CAST(sum(brk) OVER (
      PARTITION BY user_id ORDER BY ts, event_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
    ) AS BIGINT) AS session_id
  FROM gaps
)
SELECT user_id, session_id, count(*) AS n_events
FROM sess GROUP BY user_id, session_id
ORDER BY user_id, session_id
"""

# ------------------------------------------------------------ extraction

ORACLES["extract_html_roundtrip"] = """
SELECT doc_id, text AS extracted_text FROM documents
"""

ORACLES["extract_pdf_roundtrip"] = """
SELECT doc_id, text AS extracted_text, 1 AS n_pages FROM documents
"""

ORACLES["page_concat_e5"] = """
SELECT doc_id, text || chr(10) || chr(10) || upper(lang) AS joined
FROM documents
"""

ORACLES["field_extraction_e6"] = """
SELECT
  c_custkey,
  c_name AS first_name,
  'seg ' || c_mktsegment AS address,
  CAST(c_custkey AS VARCHAR) AS document_number
FROM customer
"""

ORACLES["pdf_page_explode"] = """
SELECT doc_id, page_number, 2 AS n_pages, page_text, 1224 AS width, 1584 AS height
FROM (
  SELECT doc_id, 1 AS page_number, text AS page_text FROM documents
  UNION ALL
  SELECT doc_id, 2, 'LANG ' || upper(lang) FROM documents
)
ORDER BY doc_id, page_number
"""

ORACLES["ocr_fallback_e3"] = """
SELECT doc_id, text AS extracted_text, 'pdf_ocr' AS source_kind, 1 AS n_pages
FROM documents
"""

# BMP -> stub PNG: magic + 'NORM' + first 16 bytes of sha256(source);
# PNG/JPEG passthrough. Compared as uppercase hex (Spark F.hex twin).
ORACLES["media_normalize"] = """
SELECT
  doc_id,
  CASE doc_id % 3 WHEN 2 THEN 'image/jpeg' ELSE 'image/png' END AS media_type,
  CASE doc_id % 3
    WHEN 0 THEN '89504E470D0A1A0A' || '4E4F524D'
                || upper(substr(sha256('BM' || text), 1, 32))
    WHEN 1 THEN '89504E470D0A1A0A' || hex(text)
    ELSE 'FFD8FFE0' || hex(text)
  END AS payload_hex
FROM documents
"""

# stub resize output: PNG magic + 'RSZ{w}x{h}:' + first 16 bytes of
# sha256(source); source = 'BM' || text (hex-compared, like normalize)
ORACLES["media_resize"] = """
SELECT
  doc_id,
  224 AS width,
  224 AS height,
  '89504E470D0A1A0A' || hex('RSZ224x224:')
    || upper(substr(sha256('BM' || text), 1, 32)) AS payload_hex
FROM documents
"""

# stub frame sampler: duration = max(1, bytes/1024) sec, one frame per
# second capped at 4; frame = FFD8FFE0 + sha256(payload|frame=i)[:16]
ORACLES["frame_sample"] = """
SELECT
  doc_id,
  CAST(i AS INT) AS frame_no,
  CAST(i AS INT) AS ts_sec,
  'FFD8FFE0' || upper(substr(sha256(text || '|frame=' || i), 1, 32)) AS frame_hex
FROM documents, generate_series(0, 3) AS t(i)
WHERE octet_length(encode(text)) > 0
  AND i < greatest(1, least(4, octet_length(encode(text)) // 1024))
"""

ORACLES["bpe_token_count"] = """
SELECT doc_id,
  len(regexp_extract_all(text,
    '''(?:s|t|re|ve|m|ll|d)| ?[\\p{L}]+| ?[\\p{N}]+| ?[^\\s\\p{L}\\p{N}]+|\\s+'
  )) AS bpe_tokens
FROM documents
"""

# ------------------------------------------------- detection / fake / valid

ORACLES["doc_type_cascade"] = """
SELECT
  doc_id,
  CASE doc_id % 7
    WHEN 0 THEN 'ontario_drivers_license'
    WHEN 1 THEN 'canadian_passport'
    WHEN 2 THEN 'japan_passport'
    WHEN 3 THEN 'ontario_health_card'
    WHEN 4 THEN 'canada_pr_card'
    WHEN 5 THEN 'saskatchewan_drivers_license'
    ELSE 'california_drivers_license'
  END AS document_type,
  CASE doc_id % 7
    WHEN 0 THEN 0.85 WHEN 1 THEN 0.9 WHEN 2 THEN 0.85
    WHEN 3 THEN 0.9 WHEN 4 THEN 0.9 WHEN 5 THEN 0.7 ELSE 0.45
  END AS confidence,
  CASE doc_id % 7
    WHEN 2 THEN 'Japan' WHEN 6 THEN 'United States' ELSE 'Canada'
  END AS country,
  CASE doc_id % 7
    WHEN 0 THEN 'Ontario' WHEN 3 THEN 'Ontario'
    WHEN 5 THEN 'Saskatchewan' WHEN 6 THEN 'California' ELSE NULL
  END AS state_province,
  CASE doc_id % 7
    WHEN 0 THEN 'dl_keyword_found; province: ontario'
    WHEN 1 THEN 'passport_keyword_found; country_code: CAN'
    WHEN 2 THEN 'passport_keyword_found; country_code: JPN'
    WHEN 3 THEN 'health_card_keyword_found; province: ontario'
    WHEN 4 THEN 'pr_card_keyword_found; country: Canada'
    WHEN 5 THEN 'document_number_format_match; pattern: ^\\d{8}$'
    ELSE 'keywords_found: california, ca, dmv, state of california'
  END AS detected_features
FROM documents
"""

ORACLES["fake_detection"] = """
SELECT
  doc_id,
  CASE doc_id % 4
    WHEN 0 THEN TRUE WHEN 1 THEN TRUE WHEN 2 THEN TRUE ELSE FALSE
  END AS is_fake,
  CASE doc_id % 4
    WHEN 0 THEN 0.5    -- John Doe exact pair (+1.0)
    WHEN 1 THEN 1.0    -- known specimen + pattern + sequential (2.7)
    WHEN 2 THEN 0.4    -- '123 main' address (+0.8)
    ELSE 0.0
  END AS confidence
FROM documents
"""

ORACLES["validator_expiry"] = f"""
SELECT
  doc_id,
  CASE
    WHEN (doc_id % 100) - 50 < 0 THEN 'failed'
    WHEN (doc_id % 100) - 50 < 30 THEN 'warning'
    ELSE 'passed'
  END AS status
FROM documents
"""

ORACLES["luhn_checksum"] = """
WITH nums AS (
  SELECT doc_id,
         lpad(CAST(doc_id * 37 % 1000000000 AS VARCHAR), 10, '7') AS number
  FROM documents
)
SELECT
  doc_id,
  number,
  (list_sum(
     list_transform(range(1, 11), i ->
       CASE WHEN (10 - i) % 2 = 1 THEN
         CASE WHEN CAST(number[i] AS BIGINT) * 2 > 9
              THEN CAST(number[i] AS BIGINT) * 2 - 9
              ELSE CAST(number[i] AS BIGINT) * 2 END
       ELSE CAST(number[i] AS BIGINT) END)
   ) % 10 = 0) AS luhn_valid
FROM nums
"""

ORACLES["validation_battery"] = """
SELECT
  doc_id,
  CASE
    WHEN (doc_id % 100) - 50 < 0 THEN 'failed'
    WHEN (doc_id % 100) - 50 < 30 THEN 'warning'
    ELSE 'passed'
  END AS overall_status,
  CASE
    WHEN (doc_id % 100) - 50 < 0 THEN 0.0
    WHEN (doc_id % 100) - 50 < 30 THEN 0.5
    ELSE 1.0
  END AS validation_score,
  4 AS skipped_checks
FROM documents
"""

# ------------------------------------------------------------- text ops

ORACLES["quality_signals"] = f"""
WITH t AS (
  SELECT doc_id, text, {_TOKENS.format(t='text')} AS toks FROM documents
)
SELECT
  doc_id,
  length(text) AS n_chars,
  len(toks) AS n_tokens,
  len(list_distinct(toks)) AS n_distinct_tokens,
  round(len(list_distinct(toks)) / CAST(len(toks) AS DOUBLE), 6) AS ttr,
  round(CASE WHEN length(text) > 0 THEN
    (length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g')))
        / CAST(length(text) AS DOUBLE) END, 6) AS punct_ratio,
  round(CASE WHEN length(text) > 0 THEN
    (length(text) - length(regexp_replace(text, '[0-9]', '', 'g')))
        / CAST(length(text) AS DOUBLE) END, 6) AS digit_ratio,
  round(list_sum(list_transform(toks, x -> length(x)))
        / CAST(len(toks) AS DOUBLE), 6) AS mean_token_len
FROM t
"""

_LANG_SCORE = (
    "len(list_intersect(list_distinct({toks}), {words}))"
)

def _lang_sql() -> str:
    from webxtract.textops import LANG_ORDER, LANG_STOPWORDS

    toks = _TOKENS.format(t="lower(text)")
    scores = {
        lang: _LANG_SCORE.format(
            toks=toks,
            words="[" + ", ".join(f"'{w}'" for w in LANG_STOPWORDS[lang]) + "]",
        )
        for lang in LANG_ORDER
    }
    best = "greatest(" + ", ".join(scores.values()) + ")"
    whens = " ".join(
        f"WHEN {scores[lang]} = {best} THEN '{lang}'" for lang in LANG_ORDER
    )
    return f"""
SELECT doc_id,
  CASE WHEN {best} > 0 THEN (CASE {whens} END) ELSE 'unknown' END
  AS predicted_lang
FROM documents
"""

ORACLES["lang_id"] = _lang_sql()


def _lang_clf_sql() -> str:
    """contract.q_lang_id_clf twin: identical planted suffix (the
    row's own lang's stopwords), identical md5-60 bucket per token
    (computed ONCE per token), identical 9dp weight literals from the
    committed webxtract/lang_clf.py fit, in-order list_sum fold,
    6dp-rounded mean per language BEFORE the argmax, fixed
    LANG_CLF_LANGS tie-break order."""
    from webxtract.lang_clf import (
        LANG_CLF_BUCKETS,
        LANG_CLF_LANGS,
        LANG_CLF_WEIGHTS,
    )
    from webxtract.textops import LANG_STOPWORDS

    suffix = " ".join(
        f"WHEN '{lang}' THEN '{' '.join(words)}'"
        for lang, words in LANG_STOPWORDS.items()
    )
    wl = ",\n  ".join(
        "["
        + ", ".join(repr(float(x)) for x in LANG_CLF_WEIGHTS[lang])
        + f"] AS w_{lang}"
        for lang in LANG_CLF_LANGS
    )
    scores = ",\n    ".join(
        f"round(list_sum(list_transform(b, i -> w_{lang}[i]))"
        f" / CAST(len(b) AS DOUBLE), 6) AS s_{lang}"
        for lang in LANG_CLF_LANGS
    )
    best = "greatest(" + ", ".join(f"s_{lang}" for lang in LANG_CLF_LANGS) + ")"
    whens = " ".join(
        f"WHEN s_{lang} = best THEN '{lang}'" for lang in LANG_CLF_LANGS
    )
    bucket = (
        f"CAST(({_H60.format(s='t')}) % {LANG_CLF_BUCKETS} AS INTEGER) + 1"
    )
    return f"""
WITH planted AS (
  SELECT doc_id, lang,
    coalesce(text, '') || ' ' || (CASE lang {suffix} ELSE '' END) AS ptext
  FROM documents
),
bs AS (
  SELECT doc_id, lang,
    list_transform(regexp_split_to_array(trim(lower(ptext)), '\\s+'),
                   t -> {bucket}) AS b
  FROM planted
),
w AS (SELECT
  {wl}
),
scored AS (
  SELECT doc_id, lang,
    {scores}
  FROM bs CROSS JOIN w
)
SELECT doc_id, lang,
  CASE {whens} END AS predicted_lang,
  best AS lang_score
FROM (SELECT *, {best} AS best FROM scored)
ORDER BY doc_id
"""


# (registered below, after _H60 is defined)

# md5-derived 60-bit engine-neutral hash (webxtract.textops.stable_hash60_expr)
_H60 = "('0x' || substr(md5({s}),1,15))::BIGINT"

ORACLES["lang_id_clf"] = _lang_clf_sql()

ORACLES["fingerprint"] = f"""
SELECT doc_id, {_H60.format(s='text')} AS fingerprint
FROM documents
"""

# --------------------------------------------------------------- dedup

ORACLES["exact_dedup"] = """
SELECT md5(text) AS text_hash, min(doc_id) AS keep_id, count(*) AS dup_count
FROM documents GROUP BY md5(text) ORDER BY text_hash
"""

ORACLES["ngram_jaccard_consecutive"] = """
WITH sh AS (
  SELECT doc_id,
    list_distinct(list_transform(
      range(1, greatest(len(regexp_split_to_array(trim(text), '\\s+')) - 1, 1)),
      i -> regexp_split_to_array(trim(text), '\\s+')[i] || ' ' ||
           regexp_split_to_array(trim(text), '\\s+')[i+1] || ' ' ||
           regexp_split_to_array(trim(text), '\\s+')[i+2]
    )) AS sh
  FROM documents
  WHERE len(regexp_split_to_array(trim(text), '\\s+')) >= 3
)
SELECT
  a.doc_id AS a,
  b.doc_id AS b,
  round(len(list_intersect(a.sh, b.sh)) /
        CAST(len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)) AS DOUBLE),
        6) AS jaccard
FROM sh a JOIN sh b ON a.doc_id + 1 = b.doc_id
"""

def _minhash_sql() -> str:
    """Exact twin of dedup.minhash_lsh_pairs on doc_id<200, k=2,
    threshold 0.5: md5 shingle hashes -> 12 (a*h+b)%P permutations ->
    4 banded buckets -> bucket-local candidate pairs -> exact Jaccard."""
    from webxtract.dedup import MINHASH_PARAMS

    h60 = _H60.format(s="s")
    perms = ",\n    ".join(
        f"list_min(list_transform(hashes, h -> (h*{a}+{b})%2147483647))"
        for a, b in MINHASH_PARAMS
    )
    return f"""
WITH t AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks
  FROM documents WHERE doc_id < 200
),
sh AS (
  SELECT doc_id, list_distinct(list_transform(
    list_distinct(list_transform(range(1, greatest(len(toks), 1)),
                                 i -> toks[i] || ' ' || toks[i+1])),
    s -> {h60} % 2147483647)) AS hashes
  FROM t
),
mh AS (SELECT doc_id, [{perms}] AS mh FROM sh),
bands AS (
  SELECT doc_id, u.b AS band,
    ((mh[3*u.b+1] * 1000003 + mh[3*u.b+2]) % 2147483647
      * 1000003 + mh[3*u.b+3]) % 2147483647 AS band_hash
  FROM mh CROSS JOIN (SELECT unnest([0,1,2,3]) AS b) u
),
cand AS (
  SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
  FROM bands l JOIN bands r
    ON l.band = r.band AND l.band_hash = r.band_hash AND l.doc_id < r.doc_id
)
SELECT cand.a, cand.b,
  round(len(list_intersect(sa.hashes, sb.hashes))::DOUBLE /
        (len(sa.hashes) + len(sb.hashes)
         - len(list_intersect(sa.hashes, sb.hashes))), 6) AS jaccard
FROM cand
JOIN sh sa ON sa.doc_id = cand.a
JOIN sh sb ON sb.doc_id = cand.b
WHERE round(len(list_intersect(sa.hashes, sb.hashes))::DOUBLE /
        (len(sa.hashes) + len(sb.hashes)
         - len(list_intersect(sa.hashes, sb.hashes))), 6) >= 0.5
ORDER BY a, b
"""


ORACLES["minhash_lsh_pairs"] = _minhash_sql()

ORACLES["simhash_groups"] = f"""
WITH t AS (
  SELECT doc_id,
    list_transform(regexp_split_to_array(trim(text), '\\s+'),
                   tk -> {_H60.format(s='tk')}) AS th
  FROM documents WHERE doc_id < 200
)
SELECT doc_id,
  (list_sum(list_transform(range(0, 32), b ->
    CASE WHEN list_sum(list_transform(th,
           h -> CASE WHEN (h & (1::BIGINT << b)) != 0 THEN 1 ELSE -1 END)) > 0
         THEN 1::BIGINT << b ELSE 0 END)))::BIGINT AS simhash
FROM t
"""


# contract._synthetic_url_expr twin — shared by every URL-shaped oracle
_SYNTH_URL_SQL = """
    CASE doc_id % 4
      WHEN 0 THEN 'HTTPS://Example.COM:443/a/' || CAST(doc_id AS VARCHAR)
                  || '?utm_source=tw&id=' || CAST(doc_id AS VARCHAR) || '#frag'
      WHEN 1 THEN 'http://News.Site.org:80/story-' || CAST(doc_id AS VARCHAR)
                  || '?fbclid=xyz'
      WHEN 2 THEN 'https://host.net/p' || CAST(doc_id AS VARCHAR)
                  || '?id=' || CAST(doc_id AS VARCHAR) || '&utm_campaign=c&q=1'
      ELSE 'https://plain.example/x/' || CAST(doc_id AS VARCHAR)
    END
"""

# curation.URL_HOST_RE twin (RE2 == Java semantics for this pattern)
_HOST_SQL = (
    "lower(regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://([^/:?#]+)', 1))"
)


def _url_canon_sql() -> str:
    """Twin of curation.canonicalize_url_expr over q_url_canonicalize's
    planted urls. DuckDB regexp_replace replaces the first match (all
    patterns are anchored, so first == all) and uses \\1 backrefs."""
    from webxtract.curation import _TRACKING_PARAM_RE

    url = _SYNTH_URL_SQL
    return f"""
WITH u AS (SELECT doc_id, {url} AS url FROM documents),
nf AS (
  SELECT doc_id, url, regexp_replace(url, '#.*$', '') AS no_frag FROM u
),
hq AS (
  SELECT doc_id, url,
         regexp_replace(no_frag, '\\?.*$', '') AS head,
         regexp_extract(no_frag, '\\?(.*)$', 1) AS query
  FROM nf
),
lc AS (
  SELECT doc_id, url, query,
    regexp_replace(
      regexp_replace(
        lower(regexp_extract(head, '^([A-Za-z][A-Za-z0-9+.-]*://[^/]*)', 1))
          || regexp_replace(head, '^[A-Za-z][A-Za-z0-9+.-]*://[^/]*', ''),
        '^(https://[^/:]+):443(/|$)', '\\1\\2'),
      '^(http://[^/:]+):80(/|$)', '\\1\\2') AS head_np
  FROM hq
),
kp AS (
  SELECT doc_id, url, head_np,
         list_filter(string_split(query, '&'),
                     kv -> NOT regexp_matches(kv, '{_TRACKING_PARAM_RE}')) AS kept,
         query
  FROM lc
)
SELECT doc_id, url,
  CASE WHEN query = '' OR len(kept) = 0 THEN head_np
       ELSE head_np || '?' || list_aggregate(kept, 'string_agg', '&')
  END AS canonical
FROM kp
"""


ORACLES["url_canonicalize"] = _url_canon_sql()

ORACLES["host_stats"] = f"""
WITH u AS (
  SELECT doc_id, text, lang, {_SYNTH_URL_SQL} AS url FROM documents
)
SELECT {_HOST_SQL} AS host,
  count(*) AS n_docs,
  CAST(sum(length(coalesce(text, ''))) AS BIGINT) AS total_chars,
  CAST(CAST(sum(length(coalesce(text, ''))) AS BIGINT) AS DOUBLE)
    / count(*) AS avg_chars,
  count(DISTINCT lang) AS n_langs
FROM u
GROUP BY 1
ORDER BY 1
"""

ORACLES["domain_filter"] = f"""
WITH u AS (SELECT doc_id, {_SYNTH_URL_SQL} AS url FROM documents)
SELECT doc_id, url
FROM u
WHERE {_HOST_SQL} NOT IN ('news.site.org', 'plain.example')
ORDER BY doc_id
"""

# contract.q_normalize_text planting twin: chr(769)=U+0301 combining
# acute, chr(1)=C0 control, chr(8491)=U+212B ANGSTROM SIGN, chr(7)=BEL.
ORACLES["normalize_text"] = r"""
WITH p AS (
  SELECT doc_id,
    CASE doc_id % 5
      WHEN 0 THEN text || ' Cafe' || chr(769) || chr(1) || chr(8491)
      WHEN 1 THEN text || chr(7)
      ELSE text
    END AS text
  FROM documents
),
n AS (
  SELECT doc_id, text,
    nfc_normalize(
      regexp_replace(text, '[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]', '', 'g')
    ) AS text_norm
  FROM p
)
SELECT doc_id, text_norm,
  coalesce(text_norm != text, FALSE) AS changed,
  length(text) AS n_chars_before,
  length(text_norm) AS n_chars_after
FROM n
ORDER BY doc_id
"""


def _gopher_sql() -> str:
    from webxtract.textops import GOPHER_STOPWORDS

    stop = ", ".join(f"'{s}'" for s in GOPHER_STOPWORDS)
    return f"""
WITH t AS (
  SELECT doc_id, text,
    regexp_split_to_array(trim(text), '\\s+') AS toks,
    regexp_split_to_array(text, '\\n') AS lines
  FROM documents
),
m AS (
  SELECT doc_id,
    len(toks) AS n,
    list_sum(list_transform(toks, tk -> length(tk))) / CAST(len(toks) AS DOUBLE) AS mean_len,
    len(list_filter(toks, tk -> tk IN ('#', '...', '…'))) AS n_sym,
    len(lines) AS n_lines,
    len(list_filter(lines, l -> regexp_matches(l, '^[\\s]*([-*•‣◦])'))) AS n_bullet,
    len(list_filter(lines, l -> regexp_matches(l, '(\\.\\.\\.|…)\\s*$'))) AS n_ell,
    len(list_filter(toks, tk -> regexp_matches(tk, '[A-Za-z]'))) AS n_alpha,
    len(list_filter([{stop}], s -> list_contains(toks, s))) AS n_stop
  FROM t
)
SELECT doc_id,
  (n >= 50 AND n <= 100000) AS ok_word_count,
  (mean_len >= 3.0 AND mean_len <= 10.0) AS ok_mean_word_len,
  (n_sym / CAST(n AS DOUBLE) <= 0.1) AS ok_symbol_ratio,
  (n_bullet / CAST(greatest(n_lines, 1) AS DOUBLE) < 0.9) AS ok_bullets,
  (n_ell / CAST(greatest(n_lines, 1) AS DOUBLE) < 0.3) AS ok_ellipsis,
  (n_alpha / CAST(n AS DOUBLE) >= 0.8) AS ok_alpha_words,
  (n_stop >= 2) AS ok_stopwords,
  ((n >= 50 AND n <= 100000) AND (mean_len >= 3.0 AND mean_len <= 10.0)
   AND (n_sym / CAST(n AS DOUBLE) <= 0.1)
   AND (n_bullet / CAST(greatest(n_lines, 1) AS DOUBLE) < 0.9)
   AND (n_ell / CAST(greatest(n_lines, 1) AS DOUBLE) < 0.3)
   AND (n_alpha / CAST(n AS DOUBLE) >= 0.8) AND (n_stop >= 2)) AS gopher_keep
FROM m
"""


ORACLES["gopher_quality"] = _gopher_sql()

def _repetition_sql(ns: tuple[int, ...] = (2, 3, 4)) -> str:
    """Twin of q_repetition_signals: planted repeated tail, line-dup
    fractions, and per-n top-gram char coverage with the same
    (count, gram-length) struct-max tie-break."""
    toks = "regexp_split_to_array(trim(text), '\\s+')"

    def gram_list(k: int) -> str:
        joined = " || ' ' || ".join(f"{toks}[i+{j}]" for j in range(k))
        return (
            f"list_transform(range(1, greatest(len({toks}) - {k - 2}, 1)), "
            f"i -> ({joined}))"
        )

    gram_ctes, joins, cols = [], [], []
    for n in ns:
        gram_ctes.append(f"""
g{n} AS (
  SELECT doc_id, unnest({gram_list(n)}) AS g FROM p
),
m{n} AS (
  SELECT doc_id,
         max(struct_pack(cnt := cnt, glen := glen)) AS m
  FROM (SELECT doc_id, g, count(*) AS cnt, length(g) AS glen
        FROM g{n} GROUP BY doc_id, g)
  GROUP BY doc_id
)""")
        joins.append(f"LEFT JOIN m{n} USING (doc_id)")
        cols.append(
            f"round(CASE WHEN length(text) > 0 THEN "
            f"coalesce(m{n}.m.cnt * m{n}.m.glen, 0) / CAST(length(text) AS DOUBLE) "
            f"ELSE 0.0 END, 6) AS top{n}gram_char_frac"
        )
    f6 = (
        f"list_aggregate(list_slice({toks}, 1, 6), 'string_agg', ' ')"
    )
    return f"""
WITH p AS (
  SELECT doc_id,
    CASE WHEN doc_id % 3 = 0
         THEN text || chr(10) || {f6} || chr(10) || {f6}
         ELSE text END AS text
  FROM documents
),
lf AS (
  SELECT doc_id,
    round(CASE WHEN len(regexp_split_to_array(text, '\\n')) > 0 THEN
      (len(regexp_split_to_array(text, '\\n'))
       - len(list_distinct(regexp_split_to_array(text, '\\n'))))
      / CAST(len(regexp_split_to_array(text, '\\n')) AS DOUBLE)
      ELSE 0.0 END, 6) AS dup_line_frac,
    round(CASE WHEN list_sum(list_transform(regexp_split_to_array(text, '\\n'),
                                            l -> length(l))) > 0 THEN
      (list_sum(list_transform(regexp_split_to_array(text, '\\n'), l -> length(l)))
       - list_sum(list_transform(list_distinct(regexp_split_to_array(text, '\\n')),
                                 l -> length(l))))
      / CAST(list_sum(list_transform(regexp_split_to_array(text, '\\n'),
                                     l -> length(l))) AS DOUBLE)
      ELSE 0.0 END, 6) AS dup_line_char_frac
  FROM p
),{",".join(gram_ctes)}
SELECT p.doc_id, lf.dup_line_frac, lf.dup_line_char_frac,
       {", ".join(cols)}
FROM p JOIN lf USING (doc_id) {" ".join(joins)}
ORDER BY p.doc_id
"""


ORACLES["repetition_signals"] = _repetition_sql()

ORACLES["remove_boilerplate"] = f"""
WITH d AS (
  SELECT doc_id,
         'ACCEPT COOKIES TO CONTINUE' || chr(10) || text || chr(10) ||
         '(c) example inc - all rights reserved' AS text
  FROM documents
),
l AS (
  SELECT doc_id,
         unnest(regexp_split_to_array(text, '\\n')) AS line,
         generate_subscripts(regexp_split_to_array(text, '\\n'), 1) AS pos
  FROM d
),
lh AS (
  SELECT doc_id, pos, line, {_H60.format(s='trim(line)')} AS h FROM l
),
hot AS (
  SELECT h FROM (
    SELECT h, count(DISTINCT doc_id) AS docs
    FROM lh WHERE length(trim(line)) > 0 GROUP BY h
  ) WHERE docs > 10
)
SELECT doc_id,
  coalesce(string_agg(line, chr(10) ORDER BY pos)
             FILTER (WHERE h NOT IN (SELECT h FROM hot)), '') AS text,
  count(*) FILTER (WHERE h IN (SELECT h FROM hot)) AS n_removed_lines
FROM lh
GROUP BY doc_id
ORDER BY doc_id
"""

ORACLES["pack_sequences"] = f"""
WITH t AS (
  SELECT doc_id,
         len(regexp_split_to_array(trim(text), '\\s+')) AS n_tokens,
         ({_H60.format(s='CAST(doc_id AS VARCHAR)')} % 8)::INT AS shard
  FROM documents
),
c AS (
  -- CAST: DuckDB sum(BIGINT) is HUGEINT; a harness that fetches via
  -- Arrow/pandas renders HUGEINT as float ("2047.0") and hash-diverges
  -- from Spark's BIGINT ("2047"). Integer floor-div (//) instead of
  -- float floor keeps seq_no arithmetic exact on both engines.
  SELECT doc_id, n_tokens, shard,
         CAST(sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
                             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
  FROM t
)
SELECT shard,
       CAST((cum - n_tokens) // 2048 AS BIGINT) AS seq_no,
       count(*) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
       min(doc_id) AS first_doc,
       max(doc_id) AS last_doc
FROM c
GROUP BY shard, CAST((cum - n_tokens) // 2048 AS BIGINT)
ORDER BY shard, seq_no
"""

ORACLES["deterministic_sample"] = f"""
SELECT doc_id, lang FROM documents
WHERE ({_H60.format(s='CAST(doc_id AS VARCHAR)')} % 1000000)
      < CAST((CASE lang WHEN 'en' THEN 0.5 WHEN 'de' THEN 0.25
                        WHEN 'fr' THEN 0.1 ELSE 0.05 END) * 1000000 AS BIGINT)
ORDER BY doc_id
"""

# contract.q_dedup_paragraphs twin: same planted promo + within-doc
# repeat, same keep-first-by-(doc_id,pos) winner per trimmed-paragraph
# hash (row_number ORDER BY doc_id,pos == Spark's min(struct(id,pos))),
# whitespace-only blocks exempt from dedup, blank-line runs normalized
# to one chr(10)chr(10) separator on rebuild. Positions are 1-based
# here vs Spark's 0-based posexplode — order-isomorphic, so winners
# and rebuild order agree.
ORACLES["dedup_paragraphs"] = f"""
WITH d AS (
  SELECT doc_id,
         text || chr(10) || chr(10) ||
         'Subscribe to our newsletter for daily updates!' ||
         CASE WHEN doc_id % 3 = 0
              THEN chr(10) || chr(10) || 'Limited time offer.' ||
                   chr(10) || chr(10) || 'Limited time offer.'
              ELSE '' END AS text
  FROM documents
),
p AS (
  SELECT doc_id,
         unnest(regexp_split_to_array(coalesce(text, ''), '\\n{{2,}}')) AS para,
         generate_subscripts(
           regexp_split_to_array(coalesce(text, ''), '\\n{{2,}}'), 1) AS pos
  FROM d
),
m AS (
  SELECT doc_id, pos, para,
         length(trim(para)) > 0 AS eligible,
         row_number() OVER (
           PARTITION BY length(trim(para)) > 0,
                        {_H60.format(s='trim(para)')}
           ORDER BY doc_id, pos) AS rn
  FROM p
)
SELECT doc_id,
  coalesce(string_agg(para, chr(10) || chr(10) ORDER BY pos)
             FILTER (WHERE NOT eligible OR rn = 1), '') AS text,
  count(*) FILTER (WHERE eligible AND rn > 1) AS n_removed_paras
FROM m
GROUP BY doc_id
ORDER BY doc_id
"""

# contract.q_dedup_incremental twin: NOT EXISTS (not NOT IN) so a NULL
# hash on either side can never collapse the result set — matching
# Spark LEFT ANTI's null-never-matches semantics.
ORACLES["dedup_incremental"] = """
WITH seen AS (
  SELECT md5(text) AS text_hash FROM documents WHERE doc_id % 7 = 0
),
inc AS (
  SELECT md5(text) AS text_hash, doc_id FROM documents
)
SELECT text_hash,
       min(doc_id) AS keep_id,
       count(*) AS dup_count
FROM inc
WHERE NOT EXISTS (SELECT 1 FROM seen WHERE seen.text_hash = inc.text_hash)
GROUP BY text_hash
ORDER BY text_hash
"""

# contract.q_near_dedup_incremental twin: brute-force NOT EXISTS hamming
# checks stand in for the banded bucket-local candidates (banding is
# exact-recall by pigeonhole, so the survivor sets agree); a row
# survives iff NO committed fingerprint and NO smaller-id increment row
# is within the hamming budget.
ORACLES["near_dedup_incremental"] = """
WITH base AS (
  SELECT doc_id, text FROM documents WHERE doc_id < 200
),
inc AS (
  SELECT doc_id, text FROM base
  UNION ALL
  SELECT doc_id + 100000, text || ' zzz' FROM base WHERE doc_id % 5 = 0
),
it AS (
  SELECT doc_id,
    list_transform(regexp_split_to_array(trim(text), '\\s+'),
                   tk -> {h}) AS th
  FROM inc
),
ish AS (
  SELECT doc_id,
    (list_sum(list_transform(range(0, 32), b ->
      CASE WHEN list_sum(list_transform(th,
             h -> CASE WHEN (h & (1::BIGINT << b)) != 0 THEN 1 ELSE -1 END)) > 0
           THEN 1::BIGINT << b ELSE 0 END)))::BIGINT AS simhash
  FROM it
),
st AS (
  SELECT list_transform(regexp_split_to_array(trim(text), '\\s+'),
                        tk -> {h}) AS th
  FROM documents WHERE doc_id % 7 = 0
),
ssh AS (
  SELECT DISTINCT
    (list_sum(list_transform(range(0, 32), b ->
      CASE WHEN list_sum(list_transform(th,
             h -> CASE WHEN (h & (1::BIGINT << b)) != 0 THEN 1 ELSE -1 END)) > 0
           THEN 1::BIGINT << b ELSE 0 END)))::BIGINT AS simhash
  FROM st
)
SELECT r.doc_id, r.simhash FROM ish r
WHERE NOT EXISTS (SELECT 1 FROM ssh s
                  WHERE bit_count(xor(r.simhash, s.simhash)) <= 3)
  AND NOT EXISTS (SELECT 1 FROM ish l
                  WHERE l.doc_id < r.doc_id
                    AND bit_count(xor(l.simhash, r.simhash)) <= 3)
ORDER BY doc_id
""".format(h=_H60.format(s="tk"))

# contract.q_exact_dedup_stream_twin twin: closed-form survivor set of
# the two-drop streaming exact dedup — drop-1 texts are per-doc unique
# (all survive), drop-2 copies are suppressed by run-1 state, drop-2
# fresh texts survive.
ORACLES["exact_dedup_stream_twin"] = """
SELECT doc_id, md5(text || ' #' || CAST(doc_id AS VARCHAR)) AS text_hash
FROM documents WHERE doc_id < 500
UNION ALL
SELECT doc_id + 200000,
       md5(text || ' #new' || CAST(doc_id AS VARCHAR)) AS text_hash
FROM documents WHERE doc_id < 500 AND doc_id % 10 = 5
ORDER BY doc_id
"""

# contract.q_near_dedup_stream_twin twin: brute-force replay of the two
# streaming microbatches. Batch 1 = docs < 150; a row survives iff no
# batch-mate with a LEXICOGRAPHICALLY smaller url (the stream keys on
# the url STRING) is within hamming 3. Batch-1 survivors commit their
# fingerprints; batch 2 = ' zzz' copies (+100000) of doc_id%5==0 plus
# fresh docs 150..199, surviving iff no committed fingerprint and no
# smaller-url batch-2 mate is within hamming 3 (banding is exact-recall
# by pigeonhole, so brute force agrees with the banded kernel).
ORACLES["near_dedup_stream_twin"] = """
WITH b1 AS (
  SELECT doc_id, CAST(doc_id AS VARCHAR) AS url, text
  FROM documents WHERE doc_id < 150
),
sh1 AS (
  SELECT doc_id, url, text,
    (list_sum(list_transform(range(0, 32), b ->
      CASE WHEN list_sum(list_transform(
             list_transform(regexp_split_to_array(trim(text), '\\s+'),
                            tk -> {h}),
             h -> CASE WHEN (h & (1::BIGINT << b)) != 0 THEN 1 ELSE -1 END)) > 0
           THEN 1::BIGINT << b ELSE 0 END)))::BIGINT AS sh
  FROM b1
),
s1 AS (
  SELECT * FROM sh1 r
  WHERE NOT EXISTS (SELECT 1 FROM sh1 l
                    WHERE l.url < r.url
                      AND bit_count(xor(l.sh, r.sh)) <= 3)
),
b2 AS (
  SELECT doc_id + 100000 AS doc_id,
         CAST(doc_id + 100000 AS VARCHAR) AS url, text || ' zzz' AS text
  FROM documents WHERE doc_id < 150 AND doc_id % 5 = 0
  UNION ALL
  SELECT doc_id, CAST(doc_id AS VARCHAR), text
  FROM documents WHERE doc_id >= 150 AND doc_id < 200
),
sh2 AS (
  SELECT doc_id, url, text,
    (list_sum(list_transform(range(0, 32), b ->
      CASE WHEN list_sum(list_transform(
             list_transform(regexp_split_to_array(trim(text), '\\s+'),
                            tk -> {h}),
             h -> CASE WHEN (h & (1::BIGINT << b)) != 0 THEN 1 ELSE -1 END)) > 0
           THEN 1::BIGINT << b ELSE 0 END)))::BIGINT AS sh
  FROM b2
),
s2 AS (
  SELECT * FROM sh2 r
  WHERE NOT EXISTS (SELECT 1 FROM s1
                    WHERE bit_count(xor(s1.sh, r.sh)) <= 3)
    AND NOT EXISTS (SELECT 1 FROM sh2 l
                    WHERE l.url < r.url
                      AND bit_count(xor(l.sh, r.sh)) <= 3)
)
SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars FROM s1
UNION ALL
SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars FROM s2
ORDER BY doc_id
""".format(h=_H60.format(s="tk"))

# contract.q_top_tokens twin: whitespace tokens over trimmed text,
# empty tokens excluded, (count desc, token asc) total order.
ORACLES["top_tokens"] = """
SELECT token, count(*) AS n
FROM (
  SELECT unnest(regexp_split_to_array(trim(coalesce(text, '')), '\\s+')) AS token
  FROM documents
)
WHERE length(token) > 0
GROUP BY token
ORDER BY n DESC, token
LIMIT 50
"""

# contract.q_temperature_mix twin: per-lang weights n^0.5 normalized,
# rate = min(1, w * 1000 / n) rounded to 6 dp BEFORE thresholding (both
# engines compute pow/sum in doubles; the rounding absorbs last-ulp libm
# and summation-order differences), then the deterministic_sample keep
# rule. round(rate*1e6, 0) before the BIGINT cast because DuckDB's
# double->int cast rounds while Spark's truncates.
ORACLES["temperature_mix"] = f"""
WITH counts AS (
  SELECT lang, count(*) AS n FROM documents GROUP BY lang
),
rates AS (
  SELECT lang,
         round(least(1.0,
                     pow(n, 0.5) / sum(pow(n, 0.5)) OVER ()
                     * 1000 / n), 6) AS rate
  FROM counts
)
SELECT d.doc_id, d.lang
FROM documents d JOIN rates r USING (lang)
WHERE ({_H60.format(s='CAST(d.doc_id AS VARCHAR)')} % 1000000)
      < CAST(round(rate * 1000000, 0) AS BIGINT)
ORDER BY d.doc_id
"""

# contract.q_chunk_tokens twin: whitespace tokens (same split as
# top_tokens), window starts 1, 1+24, 1+48, ... (generate_series is
# inclusive, matching F.sequence), 1-based inclusive list slice of 32
# tokens clamped at the tail. Empty/NULL docs produce no chunks.
ORACLES["chunk_tokens"] = """
WITH toks AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(trim(coalesce(text, '')), '\\s+'),
                     t -> length(t) > 0) AS tk
  FROM documents WHERE doc_id < 200
),
starts AS (
  SELECT doc_id, tk, unnest(generate_series(1, len(tk), 24)) AS s
  FROM toks WHERE len(tk) > 0
)
SELECT doc_id,
       CAST((s - 1) // 24 + 1 AS INT) AS chunk_no,
       CAST(len(tk[s : s + 31]) AS INT) AS n_tokens,
       array_to_string(tk[s : s + 31], ' ') AS chunk_text
FROM starts
ORDER BY doc_id, chunk_no
"""


def _pii_sql() -> str:
    """Twin of q_pii_redaction: same planted text, same patterns (from
    curation.PII_PATTERNS, so the two can never drift); each kind's
    count runs on the text with earlier kinds already replaced
    (reconciles with the emitted tags), replacements with 'g'."""
    from webxtract.curation import PII_PATTERNS

    planted = (
        "text || ' Contact j.doe' || CAST(doc_id AS VARCHAR) || "
        "'@mail.example.com or call 555-123-4567,"
        " card 4111 1111 1111 1111, host 10.0.0.1'"
    )
    red = "t"
    count_parts = []
    for kind, pat, repl in PII_PATTERNS:
        count_parts.append(f"len(regexp_extract_all({red}, '{pat}')) AS n_{kind}")
        red = f"regexp_replace({red}, '{pat}', '{repl}', 'g')"
    counts = ", ".join(count_parts)
    return f"""
WITH p AS (SELECT doc_id, {planted} AS t FROM documents)
SELECT doc_id, {red} AS redacted, {counts} FROM p
"""


ORACLES["pii_redaction"] = _pii_sql()


def _shingle_hash_list_sql(k: int) -> str:
    """Distinct md5-60bit (mod P) hashes of word-k-shingles of `text`
    (twin of dedup.shingle_hashes_expr)."""
    toks = "regexp_split_to_array(trim(text), '\\s+')"
    joined = " || ' ' || ".join(f"{toks}[i+{j}]" for j in range(k))
    h = _H60.format(s=f"({joined})")
    return (
        f"list_distinct(list_transform(range(1, len({toks}) - {k - 2}), "
        f"i -> {h} % 2147483647))"
    )


ORACLES["benchmark_overlap"] = f"""
WITH sh AS (
  SELECT doc_id, {_shingle_hash_list_sql(8)} AS hs FROM documents
),
bench AS (
  SELECT DISTINCT unnest(hs) AS h FROM sh WHERE doc_id < 20
),
dsh AS (
  SELECT doc_id, unnest(hs) AS h FROM sh
)
SELECT dsh.doc_id AS id, count(*) AS n_hits
FROM dsh JOIN bench USING (h)
GROUP BY dsh.doc_id
HAVING count(*) >= 3
ORDER BY id
"""


def _components_sql() -> str:
    """Twin of q_dedup_components: simhash hamming<=3 pair graph over
    the planted-copy corpus, components = min reachable id via a
    recursive-CTE transitive closure."""
    simhash = """
  SELECT doc_id,
    (list_sum(list_transform(range(0, 32), b ->
      CASE WHEN list_sum(list_transform(th,
             h -> CASE WHEN (h & (1::BIGINT << b)) != 0 THEN 1 ELSE -1 END)) > 0
           THEN 1::BIGINT << b ELSE 0 END)))::BIGINT AS simhash
  FROM t
"""
    h = _H60.format(s="tk")
    return f"""
WITH RECURSIVE docs AS (
  SELECT doc_id, text FROM documents WHERE doc_id < 150
  UNION ALL
  SELECT doc_id + 100000, text || ' zzz' FROM documents WHERE doc_id < 150
),
t AS (
  SELECT doc_id,
    list_transform(regexp_split_to_array(trim(text), '\\s+'),
                   tk -> {h}) AS th
  FROM docs
),
sh AS ({simhash}),
pairs AS (
  SELECT l.doc_id AS a, r.doc_id AS b
  FROM sh l JOIN sh r ON l.doc_id < r.doc_id
  WHERE bit_count(xor(l.simhash, r.simhash)) <= 3
),
edges AS (
  SELECT a AS src, b AS dst FROM pairs
  UNION
  SELECT b AS src, a AS dst FROM pairs
),
verts AS (SELECT DISTINCT src AS id FROM edges),
reach(id, r) AS (
  SELECT id, id FROM verts
  UNION
  SELECT e.dst, reach.r FROM reach JOIN edges e ON e.src = reach.id
)
SELECT id, min(r) AS component FROM reach GROUP BY id ORDER BY id
"""


ORACLES["dedup_components"] = _components_sql()


ORACLES["simhash_near_dup"] = f"""
WITH docs AS (
  SELECT doc_id, text FROM documents WHERE doc_id < 150
  UNION ALL
  SELECT doc_id + 100000, text || ' zzz' FROM documents WHERE doc_id < 150
),
t AS (
  SELECT doc_id,
    list_transform(regexp_split_to_array(trim(text), '\\s+'),
                   tk -> {{h}}) AS th
  FROM docs
),
sh AS (
  SELECT doc_id,
    (list_sum(list_transform(range(0, 32), b ->
      CASE WHEN list_sum(list_transform(th,
             h -> CASE WHEN (h & (1::BIGINT << b)) != 0 THEN 1 ELSE -1 END)) > 0
           THEN 1::BIGINT << b ELSE 0 END)))::BIGINT AS simhash
  FROM t
)
SELECT l.doc_id AS a, r.doc_id AS b,
       bit_count(xor(l.simhash, r.simhash)) AS hamming
FROM sh l JOIN sh r ON l.doc_id < r.doc_id
WHERE bit_count(xor(l.simhash, r.simhash)) <= 3
ORDER BY a, b
""".format(h=_H60.format(s='tk'))

# ------------------------------------------------------------ similarity


def _proj_sql(vec: str, h: str) -> str:
    """Signed projection of a 64-dim embedding onto deterministic plane
    ``h`` (webxtract.similarity._plane_weight)."""
    return (
        f"list_sum(list_transform(range(1, 65), i -> "
        f"CAST({vec}[i] AS DOUBLE) * ((({h}*1009 + (i-1)*9176) % 2000)/1000.0 - 1.0)))"
    )


def _cos_sql(a: str, b: str) -> str:
    dot = (
        f"list_sum(list_transform(range(1, 65), i -> "
        f"CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)))"
    )
    na = (
        f"sqrt(list_sum(list_transform(range(1, 65), i -> "
        f"CAST({a}[i] AS DOUBLE) * CAST({a}[i] AS DOUBLE))))"
    )
    nb = (
        f"sqrt(list_sum(list_transform(range(1, 65), i -> "
        f"CAST({b}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE))))"
    )
    return f"({dot} / ({na} * {nb}))"


def _ann_sql() -> str:
    """Exact twin of similarity.lsh_topk: 8-plane bucket of the query
    vector (vec_id=0), same-bucket candidates, exact cosine re-rank."""
    bucket = (
        "list_sum(list_transform(range(0, 8), h -> CASE WHEN "
        + _proj_sql("{v}", "h")
        + " >= 0 THEN 1 << h ELSE 0 END))"
    )
    return f"""
WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
bq AS (SELECT {bucket.format(v='qv')} AS qb, qv FROM q),
be AS (
  SELECT e.vec_id, e.embedding,
         {bucket.format(v='e.embedding')} AS b
  FROM embeddings e
)
SELECT be.vec_id, round({_cos_sql('be.embedding', 'bq.qv')}, 6) AS cosine
FROM be, bq WHERE be.b = bq.qb
ORDER BY cosine DESC, vec_id LIMIT 10
"""


ORACLES["ann_lsh_topk"] = _ann_sql()


def _ann_multiprobe_sql() -> str:
    """Twin of lsh_topk(multiprobe=True): candidate buckets are the
    query bucket plus each single-plane flip (Hamming distance 1)."""
    bucket = (
        "list_sum(list_transform(range(0, 8), h -> CASE WHEN "
        + _proj_sql("{v}", "h")
        + " >= 0 THEN 1 << h ELSE 0 END))"
    )
    return f"""
WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
bq AS (SELECT {bucket.format(v='qv')} AS qb, qv FROM q),
probes AS (
  SELECT list_append(list_transform(range(0, 8), h -> xor(qb, 1 << h)), qb) AS pl, qv
  FROM bq
),
be AS (
  SELECT e.vec_id, e.embedding,
         {bucket.format(v='e.embedding')} AS b
  FROM embeddings e
)
SELECT be.vec_id, round({_cos_sql('be.embedding', 'probes.qv')}, 6) AS cosine
FROM be, probes WHERE list_contains(probes.pl, be.b)
ORDER BY cosine DESC, vec_id LIMIT 10
"""


ORACLES["ann_multiprobe_topk"] = _ann_multiprobe_sql()


def _near_dup_sql() -> str:
    """Exact twin of the planted-copy embedding_near_dup query: union
    vec_id<300 with copies at +100000, bucket per 16-plane band (2
    bands), same-bucket candidate pairs, exact cosine >= 0.9."""
    def band(b: int, vec: str) -> str:
        return (
            f"list_sum(list_transform(range(0, 16), j -> CASE WHEN "
            + _proj_sql(vec, f"({b}*16 + j)")
            + " >= 0 THEN 1 << j ELSE 0 END))"
        )

    return f"""
WITH base AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 300),
unioned AS (
  SELECT vec_id, embedding FROM base
  UNION ALL SELECT vec_id + 100000, embedding FROM base
),
bk AS (
  SELECT vec_id, embedding,
         {band(0, 'embedding')} AS b0,
         {band(1, 'embedding')} AS b1
  FROM unioned
),
posting AS (
  SELECT vec_id, 0 AS band, b0 AS bucket FROM bk
  UNION ALL SELECT vec_id, 1, b1 FROM bk
),
cand AS (
  SELECT DISTINCT l.vec_id AS a, r.vec_id AS b
  FROM posting l JOIN posting r
    ON l.band = r.band AND l.bucket = r.bucket AND l.vec_id < r.vec_id
)
SELECT cand.a, cand.b,
       round({_cos_sql('ea.embedding', 'eb.embedding')}, 6) AS cosine
FROM cand
JOIN bk ea ON ea.vec_id = cand.a
JOIN bk eb ON eb.vec_id = cand.b
WHERE round({_cos_sql('ea.embedding', 'eb.embedding')}, 6) >= 0.9
ORDER BY a, b
"""


ORACLES["embedding_near_dup"] = _near_dup_sql()

ORACLES["cosine_topk"] = """
WITH q AS (
  SELECT embedding AS qv FROM embeddings WHERE vec_id = 0
),
scored AS (
  SELECT
    e.vec_id,
    round(
      list_sum(list_transform(range(1, 65),
        i -> CAST(e.embedding[i] AS DOUBLE) * CAST(q.qv[i] AS DOUBLE)))
      / (sqrt(list_sum(list_transform(range(1, 65),
           i -> CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE))))
       * sqrt(list_sum(list_transform(range(1, 65),
           i -> CAST(q.qv[i] AS DOUBLE) * CAST(q.qv[i] AS DOUBLE))))),
      6) AS cosine
  FROM embeddings e, q
)
SELECT vec_id, cosine FROM scored
ORDER BY cosine DESC, vec_id LIMIT 10
"""


# contract.q_warc_roundtrip twin: the WARC container layer cancels
# exactly iff serializer+parser preserve payload bytes, so the truth is
# computable from the documents table alone (strlen/md5 hash the same
# utf-8 bytes the record carries).
ORACLES["warc_roundtrip"] = """
SELECT doc_id,
       strlen(text)          AS n_bytes,
       md5(text)             AS text_md5,
       CAST(200 AS INTEGER)  AS status
FROM (
  SELECT doc_id, text FROM documents
  WHERE text IS NOT NULL
  ORDER BY doc_id LIMIT 240
)
ORDER BY doc_id
"""

# contract.q_warc_cdx twin: urlkey/timestamp/mime/status are pure
# functions of the fixture construction (SURT of the synthetic url,
# fixed WARC-Date, text/plain records).
ORACLES["warc_cdx"] = """
SELECT 'com,example,docs)/' || CAST(doc_id AS VARCHAR) AS urlkey,
       '20250601000000'                                AS timestamp,
       'http://docs.example.com/' || CAST(doc_id AS VARCHAR) AS url,
       'text/plain'                                    AS mime,
       CAST(200 AS INTEGER)                            AS status
FROM (
  SELECT doc_id FROM documents
  WHERE text IS NOT NULL
  ORDER BY doc_id LIMIT 240
)
ORDER BY urlkey
"""


# Shared CTE chain for the content-defined chunking twin queries
# (contract.q_chunk_dups / q_chunk_dedup): whitespace tokens with
# positions -> boundary AFTER tokens whose 60-bit md5 hash % 8 == 0 ->
# chunk ids via a 1-preceding cumulative boundary sum -> chunk strings.
_CHUNKS_CTE = """
WITH d AS (
  SELECT doc_id, trim(text) AS t FROM documents
  WHERE text IS NOT NULL AND trim(text) <> ''
),
tok AS (
  SELECT doc_id,
         unnest(regexp_split_to_array(t, '\\s+')) AS w,
         generate_subscripts(regexp_split_to_array(t, '\\s+'), 1) AS pos
  FROM d
),
flagged AS (
  SELECT doc_id, w, pos,
         CASE WHEN ('0x' || substr(md5(w), 1, 15))::BIGINT % 8 = 0
              THEN 1 ELSE 0 END AS b
  FROM tok
),
chunked AS (
  SELECT doc_id, w, pos,
         1 + COALESCE(SUM(b) OVER (
               PARTITION BY doc_id ORDER BY pos
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cid
  FROM flagged
),
chunks AS (
  SELECT doc_id, cid, COUNT(*) AS n_tok,
         string_agg(w, ' ' ORDER BY pos) AS chunk
  FROM chunked GROUP BY doc_id, cid
),
hashed AS (
  SELECT doc_id, cid, n_tok, chunk,
         ('0x' || substr(md5(chunk), 1, 15))::BIGINT AS chunk_hash
  FROM chunks
)
"""

ORACLES["chunk_dups"] = _CHUNKS_CTE + """
SELECT chunk_hash,
       CAST(n_tok AS INTEGER)   AS n_tok,
       COUNT(*)                 AS n_occurrences,
       COUNT(DISTINCT doc_id)   AS n_docs
FROM hashed
WHERE n_tok >= 4
GROUP BY chunk_hash, n_tok
HAVING COUNT(*) >= 2
ORDER BY chunk_hash
"""

ORACLES["chunk_dedup"] = _CHUNKS_CTE + """,
ranked AS (
  SELECT doc_id, cid, n_tok, chunk,
         ROW_NUMBER() OVER (
           PARTITION BY chunk_hash ORDER BY doc_id, cid) AS rn
  FROM hashed
),
decided AS (
  SELECT doc_id, cid, chunk,
         (n_tok < 4 OR rn = 1) AS keep
  FROM ranked
)
SELECT doc_id AS id,
       COALESCE(
         string_agg(CASE WHEN keep THEN chunk END, ' ' ORDER BY cid),
         '')                                   AS clean_text,
       CAST(COUNT(*) AS INTEGER)               AS n_chunks,
       CAST(COUNT(*) FILTER (WHERE NOT keep) AS INTEGER) AS n_dropped
FROM decided
GROUP BY doc_id
ORDER BY id
"""


# contract.q_script_signals twin. Java spells the script property
# \p{IsLatin}; RE2 spells it \p{Latin} — same Unicode script data.
# Dominant = first script (SCRIPTS order) whose count equals the max.
ORACLES["script_signals"] = """
WITH c AS (
  SELECT doc_id,
         length(regexp_replace(coalesce(text,''), '\\s', '', 'g')) AS base,
         length(regexp_replace(coalesce(text,''), '[^\\p{Latin}]', '', 'g')) AS c_latin,
         length(regexp_replace(coalesce(text,''), '[^\\p{Cyrillic}]', '', 'g')) AS c_cyrillic,
         length(regexp_replace(coalesce(text,''), '[^\\p{Han}]', '', 'g')) AS c_han,
         length(regexp_replace(coalesce(text,''), '[^\\p{Arabic}]', '', 'g')) AS c_arabic,
         length(regexp_replace(coalesce(text,''), '[^\\p{Hangul}]', '', 'g')) AS c_hangul,
         length(regexp_replace(coalesce(text,''), '[^\\p{Devanagari}]', '', 'g')) AS c_devanagari
  FROM documents
),
m AS (
  SELECT *, greatest(c_latin, c_cyrillic, c_han, c_arabic, c_hangul,
                     c_devanagari) AS mx
  FROM c
)
SELECT doc_id,
       CASE WHEN mx = 0 THEN 'other'
            WHEN c_latin      = mx THEN 'latin'
            WHEN c_cyrillic   = mx THEN 'cyrillic'
            WHEN c_han        = mx THEN 'han'
            WHEN c_arabic     = mx THEN 'arabic'
            WHEN c_hangul     = mx THEN 'hangul'
            ELSE 'devanagari' END                               AS dominant_script,
       round(CASE WHEN base > 0 THEN c_arabic     / base::DOUBLE ELSE 0 END, 6) AS frac_arabic,
       round(CASE WHEN base > 0 THEN c_cyrillic   / base::DOUBLE ELSE 0 END, 6) AS frac_cyrillic,
       round(CASE WHEN base > 0 THEN c_devanagari / base::DOUBLE ELSE 0 END, 6) AS frac_devanagari,
       round(CASE WHEN base > 0 THEN c_han        / base::DOUBLE ELSE 0 END, 6) AS frac_han,
       round(CASE WHEN base > 0 THEN c_hangul     / base::DOUBLE ELSE 0 END, 6) AS frac_hangul,
       round(CASE WHEN base > 0 THEN c_latin      / base::DOUBLE ELSE 0 END, 6) AS frac_latin
FROM m
ORDER BY doc_id
"""


# contract.q_unigram_surprisal twin: same tokenization, same top-1000
# vocabulary (count desc, token asc at the boundary), same 0.5 OOV
# smoothing; avg computed in float64 on both engines, rounded to 6.
ORACLES["unigram_surprisal"] = """
WITH d AS (
  SELECT doc_id, trim(text) AS t FROM documents
  WHERE text IS NOT NULL AND trim(text) <> ''
),
tok AS (
  SELECT doc_id, unnest(regexp_split_to_array(t, '\\s+')) AS w FROM d
),
counts AS (
  SELECT w, COUNT(*) AS c FROM tok GROUP BY w
),
total AS (
  SELECT SUM(c)::DOUBLE AS tt FROM counts
),
vocab AS (
  SELECT w, c FROM counts ORDER BY c DESC, w LIMIT 1000
)
SELECT tok.doc_id AS id,
       COUNT(*) AS n_tokens,
       round(AVG(-ln(coalesce(v.c, 0.5) / t.tt)), 6) AS surprisal
FROM tok
LEFT JOIN vocab v USING (w)
CROSS JOIN total t
GROUP BY tok.doc_id
ORDER BY id
"""


# contract.q_crawl_diff twin: same snapshot derivation, same md5
# fingerprints, same status classification over the full outer join.
ORACLES["crawl_diff"] = """
WITH old AS (
  SELECT doc_id AS id, md5(coalesce(text, '')) AS old_fp
  FROM documents WHERE doc_id % 5 <> 0
),
new AS (
  SELECT doc_id AS id,
         md5(coalesce(
           CASE WHEN doc_id % 3 = 0 THEN text || ' [recrawl]' ELSE text END,
           '')) AS new_fp
  FROM documents WHERE doc_id % 7 <> 0
)
SELECT COALESCE(old.id, new.id) AS id,
       CASE WHEN old_fp IS NULL THEN 'added'
            WHEN new_fp IS NULL THEN 'removed'
            WHEN old_fp <> new_fp THEN 'changed'
            ELSE 'unchanged' END AS status
FROM old FULL OUTER JOIN new ON old.id = new.id
ORDER BY id
"""


# contract.q_html_metadata twin: the HTML is constructed from the row,
# so the parsed-back metadata equals the planted values directly.
ORACLES["html_metadata"] = """
SELECT doc_id,
       'http://docs.example.com/' || CAST(doc_id AS VARCHAR) AS canonical_url,
       lang                                                  AS html_lang,
       'About ' || source                                    AS meta_description,
       CAST(doc_id % 5 + 1 AS INTEGER)                       AS n_links,
       'Doc ' || CAST(doc_id AS VARCHAR) || ' - ' || source  AS title
FROM documents
WHERE text IS NOT NULL
ORDER BY doc_id
"""


# ------------------------------------------------------------ link graph

# contract._linky_pages twin: same per-modulo-class HTML + url
# construction, then href extraction and the resolve_link_expr CASE
# replicated literally (fragment strip, javascript/mailto drop,
# absolute pass-through, protocol-relative scheme graft, root-relative
# site-root resolution).
_LINKY_PAGES_SQL = """
pages AS (
  SELECT doc_id,
         'https://h' || CAST(doc_id % 7 AS VARCHAR) || '.example/p/'
           || CAST(doc_id AS VARCHAR) AS url,
         '<html><body><nav><a href="/nav">Nav</a></nav><article><p>'
           || text || '</p>'
           || CASE CAST(doc_id % 4 AS INTEGER)
                WHEN 0 THEN '<a href="https://partner.example/r/'
                  || CAST(doc_id AS VARCHAR) || '">p</a><a href="#top">t</a>'
                WHEN 1 THEN '<a href="//cdn.example/lib.js">c</a>'
                  || '<a href="mailto:a@b.example">m</a>'
                WHEN 2 THEN '<a href="/p/' || CAST(doc_id % 50 AS VARCHAR)
                  || '">rel</a><a href="javascript:void(0)">j</a>'
                ELSE '<a href="docs/' || CAST(doc_id % 20 AS VARCHAR)
                  || '.html">d</a>'
              END
           || '</article></body></html>' AS html
  FROM documents
),
raw AS (
  SELECT doc_id, url,
         unnest(regexp_extract_all(html, 'href="([^"]*)"', 1)) AS link
  FROM pages
),
stripped AS (
  SELECT doc_id, url,
         lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1))
           AS scheme,
         lower(regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://([^/:?#]+)', 1))
           AS host,
         regexp_replace(link, '#.*$', '') AS l2
  FROM raw
),
links AS (
  SELECT DISTINCT doc_id, url,
    CASE
      WHEN l2 = '' THEN NULL
      WHEN regexp_matches(lower(l2), '^(javascript|mailto):') THEN NULL
      WHEN regexp_matches(l2, '^[A-Za-z][A-Za-z0-9+.-]*://') THEN l2
      WHEN l2 LIKE '//%' THEN scheme || ':' || l2
      WHEN l2 LIKE '/%' THEN scheme || '://' || host || l2
      ELSE scheme || '://' || host || '/' || l2
    END AS outlink
  FROM stripped
  WHERE CASE
      WHEN l2 = '' THEN NULL
      WHEN regexp_matches(lower(l2), '^(javascript|mailto):') THEN NULL
      WHEN regexp_matches(l2, '^[A-Za-z][A-Za-z0-9+.-]*://') THEN l2
      WHEN l2 LIKE '//%' THEN scheme || ':' || l2
      WHEN l2 LIKE '/%' THEN scheme || '://' || host || l2
      ELSE scheme || '://' || host || '/' || l2
    END IS NOT NULL
)
"""

ORACLES["outlinks"] = (
    "WITH " + _LINKY_PAGES_SQL
    + "SELECT doc_id, url, outlink FROM links ORDER BY doc_id, outlink"
)

ORACLES["host_graph"] = (
    "WITH " + _LINKY_PAGES_SQL
    + """
SELECT lower(regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://([^/:?#]+)', 1))
         AS src_host,
       lower(regexp_extract(outlink,
                            '^[A-Za-z][A-Za-z0-9+.-]*://([^/:?#]+)', 1))
         AS dst_host,
       count(*) AS n_links
FROM links
GROUP BY 1, 2
ORDER BY src_host, dst_host
"""
)


def _pagerank_sql(iterations: int = 5, damping: float = 0.85) -> str:
    """Unrolled fixed-iteration PageRank CTE chain — the exact twin of
    webxtract.linkgraph.pagerank over contract.q_pagerank's edge list,
    including the per-iteration round(_, 9) that keeps both engines'
    float drift from compounding."""
    cte = [
        """edges AS (
  SELECT DISTINCT src, dst FROM (
    SELECT doc_id AS src, doc_id % 97 AS dst FROM documents
    UNION ALL
    SELECT doc_id, (doc_id * 7 + 3) % 89 FROM documents WHERE doc_id % 3 <> 0
    UNION ALL
    SELECT doc_id, 1000000 + doc_id % 13 FROM documents WHERE doc_id % 11 = 0
  )
)""",
        """nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges)""",
        """nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM nodes)""",
        """deg AS (
  SELECT n.node, coalesce(d.c, CAST(0 AS BIGINT)) AS out_deg
  FROM nodes n
  LEFT JOIN (SELECT src, count(*) AS c FROM edges GROUP BY src) d
    ON n.node = d.src
)""",
        """r0 AS (SELECT node, out_deg, 1.0 / nn.n AS pr FROM deg CROSS JOIN nn)""",
    ]
    for i in range(1, iterations + 1):
        cte.append(f"""r{i} AS (
  SELECT g.node, g.out_deg,
         round((1 - {damping}) / nn.n
               + {damping} * (coalesce(c.contrib, 0) + dang.dm / nn.n),
               9) AS pr
  FROM deg g
  CROSS JOIN nn
  CROSS JOIN (SELECT coalesce(sum(pr), 0) AS dm
              FROM r{i - 1} WHERE out_deg = 0) dang
  LEFT JOIN (SELECT e.dst AS node, sum(r.pr / r.out_deg) AS contrib
             FROM r{i - 1} r JOIN edges e ON r.node = e.src
             WHERE r.out_deg > 0
             GROUP BY e.dst) c
    ON g.node = c.node
)""")
    return (
        "WITH " + ",\n".join(cte)
        + f"\nSELECT node, round(pr, 6) AS pagerank FROM r{iterations} ORDER BY node"
    )


ORACLES["pagerank"] = _pagerank_sql()


# contract._anchor_pages twin: same construction, two-pass group
# extraction zipped positionally (identical match sites guarantee
# alignment on both engines), href-level nofollow via list_contains.
_ANCHOR_PAGES_SQL = """
pages AS (
  SELECT doc_id,
         'https://w' || CAST(doc_id % 5 AS VARCHAR) || '.example/page/'
           || CAST(doc_id AS VARCHAR) AS url,
         '<html><head>'
           || CASE CAST(doc_id % 4 AS INTEGER)
                WHEN 0 THEN '<meta name="robots" content="noindex, follow">'
                WHEN 1 THEN '<meta name="robots" content="index, nofollow">'
                WHEN 2 THEN '<meta name="robots" content="none">'
                ELSE ''
              END
           || '</head><body><a href="/a/' || CAST(doc_id AS VARCHAR)
           || '">first ' || CAST(doc_id AS VARCHAR) || '</a>'
           || CASE CAST(doc_id % 4 AS INTEGER)
                WHEN 0 THEN '<a href="/sponsored/' || CAST(doc_id % 9 AS VARCHAR)
                  || '" rel="nofollow">ad link</a>'
                WHEN 1 THEN '<a href="https://x.example/'
                  || CAST(doc_id AS VARCHAR) || '">ext link</a>'
                WHEN 2 THEN '<a href="/dup">one</a><a href="/dup">two</a>'
                ELSE '<a href="/t/' || CAST(doc_id % 5 AS VARCHAR)
                  || '">topic </a>'
              END
           || '</body></html>' AS html
  FROM documents
)
"""

ORACLES["anchor_texts"] = (
    "WITH " + _ANCHOR_PAGES_SQL
    + """,
arrs AS (
  SELECT doc_id, url,
         regexp_extract_all(html, '<a href="([^"]*)"[^>]*>([^<]*)</a>', 1)
           AS hrefs,
         regexp_extract_all(html, '<a href="([^"]*)"[^>]*>([^<]*)</a>', 2)
           AS texts,
         regexp_extract_all(html,
           '<a href="([^"]*)"[^>]*rel="[^"]*nofollow[^"]*"[^>]*>', 1) AS nf
  FROM pages
),
raw AS (
  SELECT doc_id, url, nf, unnest(list_zip(hrefs, texts)) AS z FROM arrs
),
stripped AS (
  SELECT doc_id, url, nf,
         lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1))
           AS scheme,
         lower(regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://([^/:?#]+)', 1))
           AS host,
         z[1] AS href,
         regexp_replace(z[1], '#.*$', '') AS l2,
         trim(z[2]) AS anchor_text
  FROM raw
),
resolved AS (
  SELECT DISTINCT doc_id, url,
    CASE
      WHEN l2 = '' THEN NULL
      WHEN regexp_matches(lower(l2), '^(javascript|mailto):') THEN NULL
      WHEN regexp_matches(l2, '^[A-Za-z][A-Za-z0-9+.-]*://') THEN l2
      WHEN l2 LIKE '//%' THEN scheme || ':' || l2
      WHEN l2 LIKE '/%' THEN scheme || '://' || host || l2
      ELSE scheme || '://' || host || '/' || l2
    END AS outlink,
    anchor_text,
    list_contains(nf, href) AS nofollow
  FROM stripped
)
SELECT doc_id, url, outlink, anchor_text, nofollow
FROM resolved WHERE outlink IS NOT NULL
ORDER BY doc_id, outlink, anchor_text
"""
)

# planted-values oracle: noindex for classes {0, 2}, nofollow for
# {1, 2} (class 2 plants content="none", which implies both)
ORACLES["robots_meta"] = """
SELECT doc_id,
       CAST(doc_id % 4 IN (0, 2) AS BOOLEAN) AS robots_noindex,
       CAST(doc_id % 4 IN (1, 2) AS BOOLEAN) AS robots_nofollow
FROM documents
ORDER BY doc_id
"""


def _bm25_sql(terms: tuple[str, ...], k1: float = 1.2, b: float = 0.75) -> str:
    """textops.bm25_scores twin: exact-integer corpus stats, fixed
    term-order summation, float constants written as the same IEEE
    operations ((1.2 + 1), (1 - 0.75)) the engine computes."""
    tf_cols = ",\n         ".join(
        f"CAST(len(list_filter(tk, x -> x = '{t}')) AS BIGINT) AS tf_{i}"
        for i, t in enumerate(terms)
    )
    df_cols = ",\n         ".join(
        f"CAST(sum(CASE WHEN tf_{i} > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df_{i}"
        for i in range(len(terms))
    )
    avgdl = "(CAST(sumdl AS DOUBLE) / CAST(n AS DOUBLE))"
    parts = []
    for i in range(len(terms)):
        idf = (
            f"ln((CAST(n AS DOUBLE) - CAST(df_{i} AS DOUBLE) + 0.5)"
            f" / (CAST(df_{i} AS DOUBLE) + 0.5) + 1.0)"
        )
        norm = f"((1 - {b}) + {b} * (CAST(dl AS DOUBLE) / {avgdl}))"
        parts.append(
            f"{idf} * (CAST(tf_{i} AS DOUBLE) * ({k1} + 1))"
            f" / (CAST(tf_{i} AS DOUBLE) + {k1} * {norm})"
        )
    score = "0.0 + " + " + ".join(parts)
    return f"""
WITH toks AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(trim(coalesce(text, '')), '\\s+'),
                     t -> length(t) > 0) AS tk
  FROM documents
),
base AS (
  SELECT doc_id, CAST(len(tk) AS BIGINT) AS dl,
         {tf_cols}
  FROM toks
),
stats AS (
  SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(dl) AS BIGINT) AS sumdl,
         {df_cols}
  FROM base
)
SELECT doc_id, round({score}, 6) AS bm25
FROM base CROSS JOIN stats
ORDER BY doc_id
"""


ORACLES["bm25"] = _bm25_sql(("join", "filter", "scan"))


# contract.q_robots_filter twin: expected verdicts planted per
# (host class doc_id%5, path class doc_id%4) — host 0 blocks only
# /private/{id} (the /private/ok Allow out-lengths the Disallow),
# host 1 blocks only /tmp (its * section, not the googlebot one),
# host 2 has an empty Disallow (allow all), host 3 blocks everything,
# host 4 has no robots row (allow).
ORACLES["robots_filter"] = """
SELECT doc_id,
       'https://r' || CAST(doc_id % 5 AS VARCHAR) || '.example' ||
       CASE CAST(doc_id % 4 AS INTEGER)
         WHEN 0 THEN '/private/ok/' || CAST(doc_id AS VARCHAR)
         WHEN 1 THEN '/private/' || CAST(doc_id AS VARCHAR)
         WHEN 2 THEN '/tmp/' || CAST(doc_id AS VARCHAR)
         ELSE '/page/' || CAST(doc_id AS VARCHAR)
       END AS url,
       CASE CAST(doc_id % 5 AS INTEGER)
         WHEN 0 THEN doc_id % 4 <> 1
         WHEN 1 THEN doc_id % 4 <> 2
         WHEN 2 THEN TRUE
         WHEN 3 THEN FALSE
         ELSE TRUE
       END AS allowed
FROM documents
ORDER BY doc_id
"""


def _pagerank_weighted_hosts_sql(iterations: int = 5, damping: float = 0.85) -> str:
    """contract.q_pagerank_hosts twin: the _LINKY_PAGES_SQL host graph
    as a weighted edge list, then the unrolled weighted-PageRank CTE
    chain (contrib = pr * w / out_w; out_w = sum of outgoing weights;
    per-iteration round(_, 9) as in the unweighted oracle). Weight
    sums are integer-exact in doubles, so both engines agree before
    rounding."""
    host = "lower(regexp_extract({u}, '^[A-Za-z][A-Za-z0-9+.-]*://([^/:?#]+)', 1))"
    cte = [
        _LINKY_PAGES_SQL.strip().rstrip(),
        f"""hedges AS (
  SELECT {host.format(u='url')} AS src,
         {host.format(u='outlink')} AS dst,
         CAST(count(*) AS DOUBLE) AS w
  FROM links GROUP BY 1, 2
)""",
        """gnodes AS (SELECT src AS node FROM hedges UNION SELECT dst FROM hedges)""",
        """nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM gnodes)""",
        """deg AS (
  SELECT g.node, coalesce(d.sw, 0.0) AS out_deg
  FROM gnodes g
  LEFT JOIN (SELECT src, sum(w) AS sw FROM hedges GROUP BY src) d
    ON g.node = d.src
)""",
        """r0 AS (SELECT node, out_deg, 1.0 / nn.n AS pr FROM deg CROSS JOIN nn)""",
    ]
    for i in range(1, iterations + 1):
        cte.append(f"""r{i} AS (
  SELECT g.node, g.out_deg,
         round((1 - {damping}) / nn.n
               + {damping} * (coalesce(c.contrib, 0) + dang.dm / nn.n),
               9) AS pr
  FROM deg g
  CROSS JOIN nn
  CROSS JOIN (SELECT coalesce(sum(pr), 0) AS dm
              FROM r{i - 1} WHERE out_deg = 0) dang
  LEFT JOIN (SELECT e.dst AS node, sum(r.pr * e.w / r.out_deg) AS contrib
             FROM r{i - 1} r JOIN hedges e ON r.node = e.src
             WHERE r.out_deg > 0
             GROUP BY e.dst) c
    ON g.node = c.node
)""")
    return (
        "WITH " + ",\n".join(cte)
        + f"\nSELECT node, round(pr, 6) AS pagerank FROM r{iterations} ORDER BY node"
    )


ORACLES["pagerank_hosts"] = _pagerank_weighted_hosts_sql()


# contract.q_extraction_eval twin: identical perturbation + tokenizer;
# the multiset intersection is the explode→group→join formulation
# (sum(least(count_cand, count_gold)) over matched tokens) which is
# exactly Σ_t min — integer-exact, so the raw doubles fed to round()
# are bit-identical across engines.
ORACLES["extraction_eval"] = """
WITH docs AS (
  SELECT doc_id,
         text AS gold,
         CASE WHEN doc_id % 3 = 0
                THEN text || chr(10) || 'home about contact privacy terms login'
              WHEN doc_id % 5 = 0 THEN substr(text, 1, 120)
              ELSE text END AS cand
  FROM documents
),
tok AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(trim(lower(gold)), '[^a-z0-9]+'),
                     t -> t <> '') AS g,
         list_filter(regexp_split_to_array(trim(lower(cand)), '[^a-z0-9]+'),
                     t -> t <> '') AS a
  FROM docs
),
gt AS (SELECT doc_id, unnest(g) AS tk FROM tok),
at AS (SELECT doc_id, unnest(a) AS tk FROM tok),
gc AS (SELECT doc_id, tk, count(*) AS c FROM gt GROUP BY 1, 2),
ac AS (SELECT doc_id, tk, count(*) AS c FROM at GROUP BY 1, 2),
iv AS (
  SELECT gc.doc_id, sum(least(gc.c, ac.c)) AS inter
  FROM gc JOIN ac ON gc.doc_id = ac.doc_id AND gc.tk = ac.tk
  GROUP BY 1
),
base AS (
  SELECT t.doc_id,
         CAST(len(t.g) AS BIGINT) AS n_gold,
         CAST(len(t.a) AS BIGINT) AS n_cand,
         CAST(coalesce(iv.inter, 0) AS BIGINT) AS inter_tokens
  FROM tok t LEFT JOIN iv ON t.doc_id = iv.doc_id
)
SELECT doc_id, n_gold, n_cand, inter_tokens,
       CASE WHEN n_cand > 0
            THEN round(CAST(inter_tokens AS DOUBLE) / n_cand, 6) END AS prec,
       CASE WHEN n_gold > 0
            THEN round(CAST(inter_tokens AS DOUBLE) / n_gold, 6) END AS rec,
       CASE WHEN n_cand > 0 AND n_gold > 0 THEN
         CASE WHEN inter_tokens > 0 THEN
           round(2.0 * (CAST(inter_tokens AS DOUBLE) / n_cand)
                     * (CAST(inter_tokens AS DOUBLE) / n_gold)
                 / ((CAST(inter_tokens AS DOUBLE) / n_cand)
                    + (CAST(inter_tokens AS DOUBLE) / n_gold)), 6)
         ELSE 0.0 END
       END AS f1
FROM base
ORDER BY doc_id
"""


# contract.q_c4_clean twin: identical line predicate (rtrim-anchored
# terminal punctuation, >=5 non-empty whitespace tokens, no
# 'javascript' substring) and document flags.
ORACLES["c4_clean"] = """
WITH base AS (
  SELECT doc_id,
         concat_ws(chr(10),
           text,
           substr(text, 1, 100) || ' and so it ends.',
           'Too short.',
           CASE WHEN doc_id % 7 = 0
                THEN 'Please enable javascript to view this page.'
                ELSE 'Another sentence with enough words to pass.' END,
           CASE WHEN doc_id % 11 = 0 THEN 'function() { return 1; }'
                WHEN doc_id % 13 = 0
                THEN 'Lorem ipsum dolor sit amet, consectetur adipiscing elit.'
                ELSE 'Final closing line with sufficient words here.' END
         ) AS t
  FROM documents
),
k AS (
  SELECT doc_id, t,
         regexp_split_to_array(t, '\n') AS lines,
         list_filter(
           regexp_split_to_array(t, '\n'),
           l -> regexp_matches(rtrim(l), '[.!?"]$')
                AND len(list_filter(regexp_split_to_array(trim(l), '\\s+'),
                                    w -> w <> '')) >= 5
                AND NOT contains(lower(l), 'javascript')
         ) AS kept
  FROM base
)
SELECT doc_id,
       CAST(len(lines) AS BIGINT) AS n_lines,
       CAST(len(kept) AS BIGINT) AS n_lines_kept,
       coalesce(array_to_string(kept, chr(10)), '') AS cleaned_text,
       contains(lower(t), 'lorem ipsum') AS has_lorem_ipsum,
       contains(t, '{') AS has_curly_brace,
       (len(kept) >= 3 AND NOT contains(lower(t), 'lorem ipsum')
        AND NOT contains(t, '{')) AS c4_keep
FROM k
ORDER BY doc_id
"""


# contract.q_wet_records twin: the full WET conversion record rebuilt
# character-for-character in SQL (same deterministic uuid derivations,
# conditional language header, sha256 digest, CRLF discipline), hashed.
ORACLES["wet_records"] = """
WITH base AS (
  SELECT doc_id,
         'doc://' || CAST(doc_id AS VARCHAR) AS uri,
         strftime(TIMESTAMP '2026-01-15 00:00:00'
                  + (doc_id % 86400) * INTERVAL 1 SECOND,
                  '%Y-%m-%dT%H:%M:%SZ') AS d,
         coalesce(text, '') AS t,
         CASE WHEN doc_id % 17 = 0 THEN NULL ELSE lang END AS lg
  FROM documents
),
ids AS (
  SELECT *,
         md5(uri || chr(10) || 'conversion' || chr(10) || d) AS h1,
         md5(uri || chr(10) || d) AS h2
  FROM base
),
rec AS (
  SELECT doc_id,
         CAST(strlen(t) AS BIGINT) AS content_length,
         'WARC/1.0' || chr(13) || chr(10)
         || 'WARC-Type: conversion' || chr(13) || chr(10)
         || 'WARC-Target-URI: ' || uri || chr(13) || chr(10)
         || 'WARC-Date: ' || d || chr(13) || chr(10)
         || 'WARC-Record-ID: <urn:uuid:' || substr(h1, 1, 8) || '-'
            || substr(h1, 9, 4) || '-' || substr(h1, 13, 4) || '-'
            || substr(h1, 17, 4) || '-' || substr(h1, 21, 12) || '>'
            || chr(13) || chr(10)
         || 'WARC-Refers-To: <urn:uuid:' || substr(h2, 1, 8) || '-'
            || substr(h2, 9, 4) || '-' || substr(h2, 13, 4) || '-'
            || substr(h2, 17, 4) || '-' || substr(h2, 21, 12) || '>'
            || chr(13) || chr(10)
         || CASE WHEN lg IS NOT NULL
                 THEN 'WARC-Identified-Content-Language: ' || lg
                      || chr(13) || chr(10)
                 ELSE '' END
         || 'WARC-Block-Digest: sha256:' || sha256(t) || chr(13) || chr(10)
         || 'Content-Type: text/plain' || chr(13) || chr(10)
         || 'Content-Length: ' || CAST(strlen(t) AS VARCHAR)
            || chr(13) || chr(10) || chr(13) || chr(10)
         || t || chr(13) || chr(10) || chr(13) || chr(10) AS r
  FROM ids
)
SELECT doc_id, content_length,
       CAST(strlen(r) AS BIGINT) AS rec_bytes,
       md5(r) AS rec_md5
FROM rec
ORDER BY doc_id
"""


# contract.q_fix_mojibake twin: the corruption AND the repair chain are
# generated from the same MOJIBAKE_PAIRS table the engine uses, so the
# two sides cannot drift.
def _mojibake_sql() -> str:
    from webxtract.curation import MOJIBAKE_PAIRS

    def q(s: str) -> str:
        return "'" + s.replace("'", "''") + "'"

    planted = " ".join(b for b, _ in MOJIBAKE_PAIRS)
    fixed = "t"
    for bad, good in MOJIBAKE_PAIRS:
        fixed = f"replace({fixed}, {q(bad)}, {q(good)})"
    return f"""
WITH base AS (
  SELECT doc_id,
         CASE WHEN doc_id % 3 = 0
              THEN coalesce(text, '') || ' ' || {q(planted)}
              ELSE coalesce(text, '') END AS t
  FROM documents
),
fx AS (
  SELECT doc_id, t, {fixed} AS fixed FROM base
)
SELECT doc_id,
       length(t) <> length(fixed) AS had_mojibake,
       CAST(length(t) - length(fixed) AS BIGINT) AS chars_saved,
       md5(fixed) AS fixed_md5
FROM fx
ORDER BY doc_id
"""


ORACLES["fix_mojibake"] = _mojibake_sql()


# contract.q_postings twin: same analyzer (lowercased alphanumeric
# split), same (tf DESC, doc_id) ranking; the oracle needs no salting —
# phase-1 pruning keeps a superset of the global top-k, so results are
# identical by construction.
ORACLES["postings"] = """
WITH toks AS (
  SELECT doc_id, tok AS term
  FROM documents,
       unnest(list_filter(
         regexp_split_to_array(trim(lower(coalesce(text, ''))),
                               '[^a-z0-9]+'),
         t -> t <> '')) AS u(tok)
),
tf AS (
  SELECT term, doc_id, CAST(count(*) AS BIGINT) AS tf
  FROM toks GROUP BY term, doc_id
),
ranked AS (
  SELECT term, doc_id, tf,
         CAST(count(*) OVER (PARTITION BY term) AS BIGINT) AS df,
         CAST(sum(tf) OVER (PARTITION BY term) AS BIGINT) AS total_tf,
         row_number() OVER (PARTITION BY term
                            ORDER BY tf DESC, doc_id) AS rank
  FROM tf
)
SELECT term, df, total_tf, CAST(rank AS INTEGER) AS rank, doc_id, tf
FROM ranked
WHERE rank <= 3 AND df >= 5
ORDER BY term, rank
"""


def _keep_best_sql() -> str:
    """Twin of q_dedup_keep_best: the _components_sql closure plus a
    LEFT JOIN back to all docs (singletons self-label) and the same
    (score DESC, id) representative window."""
    simhash = """
  SELECT doc_id,
    (list_sum(list_transform(range(0, 32), b ->
      CASE WHEN list_sum(list_transform(th,
             h -> CASE WHEN (h & (1::BIGINT << b)) != 0 THEN 1 ELSE -1 END)) > 0
           THEN 1::BIGINT << b ELSE 0 END)))::BIGINT AS simhash
  FROM t
"""
    h = _H60.format(s="tk")
    return f"""
WITH RECURSIVE docs AS (
  SELECT doc_id, text FROM documents WHERE doc_id < 150
  UNION ALL
  SELECT doc_id + 100000, text || ' zzz' FROM documents WHERE doc_id < 150
),
t AS (
  SELECT doc_id,
    list_transform(regexp_split_to_array(trim(text), '\\s+'),
                   tk -> {h}) AS th
  FROM docs
),
sh AS ({simhash}),
pairs AS (
  SELECT l.doc_id AS a, r.doc_id AS b
  FROM sh l JOIN sh r ON l.doc_id < r.doc_id
  WHERE bit_count(xor(l.simhash, r.simhash)) <= 3
),
edges AS (
  SELECT a AS src, b AS dst FROM pairs
  UNION
  SELECT b AS src, a AS dst FROM pairs
),
verts AS (SELECT DISTINCT src AS id FROM edges),
reach(id, r) AS (
  SELECT id, id FROM verts
  UNION
  SELECT e.dst, reach.r FROM reach JOIN edges e ON e.src = reach.id
),
comp AS (SELECT id, min(r) AS component FROM reach GROUP BY id),
scored AS (
  SELECT d.doc_id AS id, length(d.text) AS sc,
         coalesce(c.component, d.doc_id) AS component
  FROM docs d LEFT JOIN comp c ON c.id = d.doc_id
),
ranked AS (
  SELECT id, component,
         row_number() OVER (PARTITION BY component
                            ORDER BY sc DESC, id) AS rn,
         first_value(id) OVER (PARTITION BY component
                               ORDER BY sc DESC, id) AS kept_id
  FROM scored
)
SELECT id, component, rn = 1 AS keep, kept_id
FROM ranked ORDER BY id
"""


ORACLES["dedup_keep_best"] = _keep_best_sql()


def _tag_topics_sql() -> str:
    """Twin of q_tag_topics: counts and the first-wins CASE argmax are
    generated from the engine's own TOPIC_TAXONOMY, so keyword tables
    cannot drift."""
    from webxtract.curation import TOPIC_TAXONOMY

    def q(s: str) -> str:
        return "'" + s.replace("'", "''") + "'"

    cnt_cols = []
    for topic, kws in TOPIC_TAXONOMY.items():
        arr = ", ".join(q(k) for k in kws)
        cnt_cols.append(
            f"CAST(len(list_filter([{arr}], kw -> contains(t, kw)))"
            f" AS BIGINT) AS n_{topic}"
        )
    names = list(TOPIC_TAXONOMY)
    g = "greatest(" + ", ".join(f"n_{n}" for n in names) + ")"
    whens = "\n              ".join(
        f"WHEN n_{n} = {g} THEN '{n}'" for n in names
    )
    cnts = ",\n         ".join(cnt_cols)
    return f"""
WITH base AS (
  SELECT doc_id,
         lower(coalesce(text, '') ||
           CASE CAST(doc_id % 5 AS INTEGER)
             WHEN 0 THEN ' The startup shipped new software with a clever algorithm.'
             WHEN 1 THEN ' The championship playoff had every athlete and coach ready.'
             WHEN 2 THEN ' A recipe with one secret ingredient from the restaurant.'
             WHEN 3 THEN ' Symptom diagnosis and treatment for the patient.'
             ELSE '' END) AS t
  FROM documents
),
c AS (
  SELECT doc_id,
         {cnts}
  FROM base
)
SELECT doc_id, {', '.join('n_' + n for n in names)},
       CASE WHEN {g} = 0 THEN 'other'
            ELSE CASE {whens}
              END END AS topic
FROM c
ORDER BY doc_id
"""


ORACLES["tag_topics"] = _tag_topics_sql()


# contract.q_value_percentiles twin: DuckDB's row-level percent_rank is
# exactly (count of strictly smaller)/(N-1) — the quantity the engine
# computes from the value histogram.
ORACLES["value_percentiles"] = """
SELECT doc_id,
       n_chars AS value,
       round(percent_rank() OVER (ORDER BY n_chars), 9) AS pct_rank
FROM documents
WHERE n_chars IS NOT NULL
ORDER BY doc_id
"""


# contract.q_host_cap_sample twin: same (host, n_chars DESC, doc_id)
# total order, row_number cap at 20 — the two-phase salted ranking in
# the engine is rank-equivalent to this single window by construction.
ORACLES["host_cap_sample"] = f"""
WITH u AS (
  SELECT doc_id, n_chars, {_SYNTH_URL_SQL} AS url FROM documents
),
h AS (
  SELECT doc_id, n_chars, {_HOST_SQL} AS host FROM u
),
r AS (
  SELECT doc_id, n_chars, host,
         CAST(row_number() OVER (
           PARTITION BY host ORDER BY n_chars DESC, doc_id
         ) AS BIGINT) AS host_rank
  FROM h
)
SELECT doc_id, n_chars, host, host_rank
FROM r WHERE host_rank <= 20
ORDER BY doc_id
"""


# contract.q_bpe_pairs twin: identical analyzer (lowercased
# alphanumeric split), vocab-frequency reduce, then adjacent char
# pairs per distinct word weighted by word frequency. DuckDB range(1,
# len) yields 1..len-1; substr is 1-based like Spark's.
ORACLES["bpe_pairs"] = """
WITH toks AS (
  SELECT tok AS word
  FROM documents,
       unnest(list_filter(
         regexp_split_to_array(trim(lower(coalesce(text, ''))),
                               '[^a-z0-9]+'),
         t -> t <> '')) AS u(tok)
),
vocab AS (
  SELECT word, CAST(count(*) AS BIGINT) AS freq FROM toks GROUP BY 1
),
pairs AS (
  SELECT substr(word, CAST(i AS INTEGER), 2) AS pair, freq
  FROM vocab, unnest(range(1, length(word))) AS t(i)
  WHERE length(word) >= 2
)
SELECT pair, CAST(sum(freq) AS BIGINT) AS pair_count
FROM pairs
GROUP BY 1
ORDER BY pair_count DESC, pair
LIMIT 50
"""


# contract.q_kmeans_assign twin: same seeds (vec_id < 8), same
# float64 squared-L2 with 1..64 summation order, round 6dp BEFORE the
# (dist2, cluster) argmin so both engines break float ties identically.
ORACLES["kmeans_assign"] = """
WITH c AS (
  SELECT vec_id AS cid, embedding AS cv FROM embeddings WHERE vec_id < 8
),
d AS (
  SELECT e.vec_id, c.cid,
         round(list_sum(list_transform(range(1, 65),
           i -> (CAST(e.embedding[i] AS DOUBLE) - CAST(c.cv[i] AS DOUBLE))
              * (CAST(e.embedding[i] AS DOUBLE) - CAST(c.cv[i] AS DOUBLE))
         )), 6) AS dist2
  FROM embeddings e CROSS JOIN c
),
r AS (
  SELECT vec_id, cid, dist2,
         row_number() OVER (PARTITION BY vec_id
                            ORDER BY dist2, cid) AS rn
  FROM d
)
SELECT vec_id, CAST(cid AS BIGINT) AS cluster, dist2
FROM r WHERE rn = 1
ORDER BY vec_id
"""


# contract.q_dsir_weights twin: identical bigram features (whitespace
# tokens, ' '-joined), identical md5-60 bucket hash, raw histogram +
# smoothing from the data, target p[b] = (b+1)/2080 in closed form.
# The per-doc score is an IN-ORDER list_sum over the same addend
# doubles as Spark's left fold; round 6dp absorbs last-ulp libm drift
# in the ln() literals.
ORACLES["dsir_weights"] = """
WITH toks AS (
  SELECT doc_id,
         regexp_split_to_array(trim(coalesce(text, '')), '\\s+') AS tk
  FROM documents
),
grams AS (
  SELECT doc_id,
         CASE WHEN len(tk) >= 2
              THEN list_transform(range(1, len(tk)),
                                  i -> tk[i] || ' ' || tk[i + 1])
              ELSE [] END AS gs
  FROM toks
),
raw AS (
  SELECT ('0x' || substr(md5(g), 1, 15))::BIGINT % 64 AS bucket,
         count(*) AS n
  FROM grams, unnest(gs) AS u(g)
  GROUP BY 1
),
tot AS (SELECT sum(n) AS t FROM raw),
buckets AS (SELECT unnest(range(0, 64)) AS b),
lr AS (
  SELECT list(
           ln((bk.b + 1) / 2080.0)
           - ln((coalesce(raw.n, 0) + 1.0) / (tot.t + 64))
           ORDER BY bk.b
         ) AS l
  FROM buckets bk LEFT JOIN raw ON raw.bucket = bk.b CROSS JOIN tot
)
SELECT g.doc_id,
       CAST(len(g.gs) AS BIGINT) AS n_grams,
       round(coalesce(list_sum(list_transform(g.gs,
         x -> lr.l[CAST(('0x' || substr(md5(x), 1, 15))::BIGINT % 64
                   AS INTEGER) + 1])), 0.0), 6) AS dsir_logweight
FROM grams g CROSS JOIN lr
ORDER BY g.doc_id
"""


# Shared CTE chain for the k-means oracles: seeds = vec_id < k,
# float64 squared-L2 with in-order 1..64 summation, 6dp round BEFORE
# the (dist2, cid) argmin — identical to kmeans_assign's contract.
def _kmeans_cte(base_table: str, k: int = 8) -> str:
    return f"""
c AS (
  SELECT vec_id AS cid, embedding AS cv FROM embeddings WHERE vec_id < {k}
),
d AS (
  SELECT e.vec_id, c.cid,
         round(list_sum(list_transform(range(1, 65),
           i -> (CAST(e.embedding[i] AS DOUBLE) - CAST(c.cv[i] AS DOUBLE))
              * (CAST(e.embedding[i] AS DOUBLE) - CAST(c.cv[i] AS DOUBLE))
         )), 6) AS dist2
  FROM {base_table} e CROSS JOIN c
),
r AS (
  SELECT vec_id, cid, dist2,
         row_number() OVER (PARTITION BY vec_id
                            ORDER BY dist2, cid) AS rn
  FROM d
),
assigned AS (
  SELECT vec_id, cid AS cluster FROM r WHERE rn = 1
)"""


# contract.q_kmeans_update twin: same assignment, per-(cluster, dim)
# float64 averages rounded 6dp (order-free after the round), arrays
# reassembled in dim order.
ORACLES["kmeans_update"] = f"""
WITH {_kmeans_cte('embeddings')},
vals AS (
  SELECT a.cluster, CAST(i - 1 AS INTEGER) AS dim,
         CAST(e.embedding[CAST(i AS INTEGER)] AS DOUBLE) AS v
  FROM assigned a JOIN embeddings e USING (vec_id),
       unnest(range(1, 65)) AS t(i)
),
m AS (
  SELECT cluster, dim, round(avg(v), 6) AS m, count(*) AS n
  FROM vals GROUP BY 1, 2
)
SELECT CAST(cluster AS BIGINT) AS cluster,
       CAST(max(n) AS BIGINT) AS n_members,
       list(m ORDER BY dim) AS centroid
FROM m GROUP BY cluster ORDER BY cluster
"""


# contract.q_semantic_dedup twin: planted exact copies at
# vec_id + 100000, same assignment over the unioned frame, exact
# cosine within clusters at 0.999. k=64 blocking clusters (vs 8 for
# the assignment queries): SemDeDup's k scales with N so per-cluster
# pair counts stay bounded — at sf0.1 this is the difference between
# an 8-task 600k-pair join and a 64-way ~40k-pair one.
ORACLES["semantic_dedup"] = f"""
WITH base AS (
  SELECT vec_id, embedding FROM embeddings
  UNION ALL
  SELECT vec_id + 100000 AS vec_id, embedding
  FROM embeddings WHERE vec_id < 200
),
{_kmeans_cte('base', k=64)},
av AS (
  SELECT b.vec_id, b.embedding, a.cluster
  FROM base b JOIN assigned a USING (vec_id)
)
SELECT l.vec_id AS a, r2.vec_id AS b,
  round(
    list_sum(list_transform(range(1, 65),
      i -> CAST(l.embedding[i] AS DOUBLE) * CAST(r2.embedding[i] AS DOUBLE)))
    / (sqrt(list_sum(list_transform(range(1, 65),
         i -> CAST(l.embedding[i] AS DOUBLE) * CAST(l.embedding[i] AS DOUBLE))))
     * sqrt(list_sum(list_transform(range(1, 65),
         i -> CAST(r2.embedding[i] AS DOUBLE) * CAST(r2.embedding[i] AS DOUBLE))))),
    6) AS cosine
FROM av l JOIN av r2
  ON l.cluster = r2.cluster AND l.vec_id < r2.vec_id
WHERE round(
    list_sum(list_transform(range(1, 65),
      i -> CAST(l.embedding[i] AS DOUBLE) * CAST(r2.embedding[i] AS DOUBLE)))
    / (sqrt(list_sum(list_transform(range(1, 65),
         i -> CAST(l.embedding[i] AS DOUBLE) * CAST(l.embedding[i] AS DOUBLE))))
     * sqrt(list_sum(list_transform(range(1, 65),
         i -> CAST(r2.embedding[i] AS DOUBLE) * CAST(r2.embedding[i] AS DOUBLE))))),
    6) >= 0.999
ORDER BY a, b
"""


# contract.q_split_assign twin: same md5-60 host hash, same integer
# thresholds out of 10^6 (train < 980000, valid < 990000, else test).
ORACLES["split_assign"] = f"""
WITH u AS (
  SELECT doc_id, {_SYNTH_URL_SQL} AS url FROM documents
),
h AS (
  SELECT doc_id, {_HOST_SQL} AS host FROM u
)
SELECT doc_id, host,
       CASE WHEN ({_H60.format(s='host')}) % 1000000 < 980000 THEN 'train'
            WHEN ({_H60.format(s='host')}) % 1000000 < 990000 THEN 'valid'
            ELSE 'test' END AS split
FROM h
ORDER BY doc_id
"""


# contract.q_bigram_perplexity twin: same whitespace tokens, same
# 'prev w' bigram keys, same (count DESC, key ASC) top-k boundaries,
# same alpha=0.7 interpolation with 0.5 OOV smoothing. All count
# inputs are exact integers; the per-doc mean of ln(p) is a float64
# group aggregate on both engines, with exp+round(6) absorbing
# last-ulp summation-order drift.
ORACLES["bigram_perplexity"] = """
WITH base AS (
  SELECT doc_id AS id, text AS t FROM documents
  WHERE text IS NOT NULL AND trim(text) <> ''
),
tk AS (
  SELECT id, regexp_split_to_array(trim(t), '\\s+') AS tks FROM base
),
tok AS (SELECT unnest(tks) AS w FROM tk),
uni AS (SELECT w, count(*) AS c FROM tok GROUP BY 1),
tot AS (SELECT sum(c) AS tt FROM uni),
vocab AS (SELECT w, c FROM uni ORDER BY c DESC, w LIMIT 1000),
bg AS (
  SELECT id, unnest(
    CASE WHEN len(tks) >= 2
         THEN list_transform(range(1, len(tks)),
                             i -> tks[i] || ' ' || tks[i + 1])
         ELSE [] END) AS g
  FROM tk
),
bigtop AS (
  SELECT g, count(*) AS cb FROM bg GROUP BY 1
  ORDER BY cb DESC, g LIMIT 4000
),
sc AS (
  SELECT bg.id,
         0.7 * coalesce(bt.cb / vp.c, 0.0)
       + 0.3 * coalesce(vw.c, 0.5) / tot.tt AS p
  FROM bg
  LEFT JOIN bigtop bt USING (g)
  LEFT JOIN vocab vp ON vp.w = split_part(bg.g, ' ', 1)
  LEFT JOIN vocab vw ON vw.w = split_part(bg.g, ' ', 2)
  CROSS JOIN tot
)
SELECT id AS doc_id,
       CAST(count(*) AS BIGINT) AS n_bigrams,
       round(exp(-avg(ln(p))), 6) AS ppl
FROM sc GROUP BY id ORDER BY doc_id
"""


# contract.q_split_sentences twin: identical RE2∩Java pattern (no
# lookbehind), trim-then-filter-then-index so sent_idx is dense in
# both engines; DuckDB lists are 1-based, range(1, n+1) = 1..n.
ORACLES["split_sentences"] = """
WITH p AS (
  SELECT doc_id,
         CASE CAST(doc_id % 4 AS INTEGER)
           WHEN 0 THEN text || '. Tail question? Yes! '
           WHEN 1 THEN '...' || text
           WHEN 2 THEN text || '.   '
           ELSE text
         END AS text
  FROM documents
),
s AS (
  SELECT doc_id,
         list_filter(
           list_transform(
             regexp_extract_all(coalesce(text, ''), '[^.!?]+[.!?]*'),
             x -> trim(x)),
           x -> x <> '') AS sents
  FROM p
)
SELECT doc_id,
       CAST(i - 1 AS BIGINT) AS sent_idx,
       sents[CAST(i AS INTEGER)] AS sentence
FROM s, unnest(range(1, len(sents) + 1)) AS t(i)
ORDER BY doc_id, sent_idx
"""


# contract.q_stratified_keep twin: percent_rank PARTITION BY lang is
# rank-identical to the engine's per-stratum histogram window (count
# of strictly-smaller values / (n-1)); both sides compare the ROUNDED
# rank against 0.75 so the boundary class cannot diverge.
ORACLES["stratified_keep"] = """
SELECT doc_id, lang, n_chars AS value,
       round(percent_rank() OVER (PARTITION BY lang ORDER BY n_chars),
             9) AS pct_rank
FROM documents
WHERE n_chars IS NOT NULL AND lang IS NOT NULL
QUALIFY pct_rank >= 0.75
ORDER BY doc_id
"""


# contract.q_stratified_keep_cume twin: cume_dist PARTITION BY lang
# over the planted tie-heavy value (n_chars % 50) plus a singleton
# 'zz' stratum; the engine's histogram form (cumulative count
# INCLUDING the current value class / n) is exactly cume_dist, both
# sides rounded to 9 digits before the 0.75 compare.
ORACLES["stratified_keep_cume"] = """
WITH d AS (
  SELECT doc_id, lang, n_chars % 50 AS v FROM documents
  UNION ALL
  SELECT CAST(-1 AS BIGINT), 'zz', CAST(7 AS BIGINT)
)
SELECT doc_id, lang, v AS value,
       round(cume_dist() OVER (PARTITION BY lang ORDER BY v),
             9) AS cume_dist
FROM d
WHERE v IS NOT NULL AND lang IS NOT NULL
QUALIFY cume_dist >= 0.75
ORDER BY doc_id
"""


# contract.q_frontier_schedule twin: single-window row_number per
# host over the identical (priority DESC, url ASC) total order (the
# engine's two-phase salted ranking is rank-equivalent by the
# superset construction); delays replicate crawl_delay_expr over the
# planted robots fixtures — r2's googlebot-only section must NOT
# apply, r3 has no delay, r4 has no robots row (both default to 1s).
ORACLES["frontier_schedule"] = """
WITH urls AS (
  SELECT 'https://r' || CAST(doc_id % 5 AS VARCHAR) || '.example/page/'
           || CAST(doc_id AS VARCHAR) AS url,
         'r' || CAST(doc_id % 5 AS VARCHAR) || '.example' AS host,
         n_chars AS priority
  FROM documents
),
r AS (
  SELECT url, host, priority,
         CAST(row_number() OVER (
           PARTITION BY host ORDER BY priority DESC, url
         ) AS BIGINT) AS host_rank
  FROM urls
)
SELECT url, host, priority, host_rank,
       CAST((host_rank - 1) * (CASE host
          WHEN 'r0.example' THEN 5
          WHEN 'r1.example' THEN 2
          ELSE 1 END) AS BIGINT) AS fetch_at_sec
FROM r WHERE host_rank <= 30
ORDER BY url
"""


# contract.q_host_components twin: recursive-CTE transitive closure
# over the identical planted string edge list; min over VARCHAR uses
# DuckDB's default binary collation == Spark's UTF8 binary ordering.
ORACLES["host_components"] = """
WITH RECURSIVE e0 AS (
  SELECT 's' || CAST((doc_id % 12) * 10 + doc_id % 7 AS VARCHAR) AS src,
         's' || CAST((doc_id % 12) * 10 + (doc_id * 3) % 10 AS VARCHAR) AS dst
  FROM documents
),
edges AS (
  SELECT src, dst FROM e0 UNION SELECT dst, src FROM e0
),
verts AS (SELECT DISTINCT src AS id FROM edges),
reach(id, r) AS (
  SELECT id, id FROM verts
  UNION
  SELECT e.dst, reach.r FROM reach JOIN edges e ON e.src = reach.id
)
SELECT id AS host, min(r) AS component FROM reach GROUP BY id ORDER BY host
"""


# contract.q_doc_containment twin: the _CHUNKS_CTE chunking (mod 8)
# over the planted superset corpus, then set-dedup / df-cap / posting
# self-join / a-side size join exactly as the engine. The ratio
# filter compares the UNROUNDED int/int double on both sides (IEEE-
# identical); output rounds to 6dp.
ORACLES["doc_containment"] = """
WITH d AS (
  SELECT doc_id, trim(text) AS t FROM (
    SELECT doc_id, text FROM documents WHERE doc_id < 100
    UNION ALL
    SELECT doc_id + 200000,
           text || ' appended tail words for the containment fixture'
    FROM documents WHERE doc_id < 100
  ) WHERE text IS NOT NULL AND trim(text) <> ''
),
tok AS (
  SELECT doc_id,
         unnest(regexp_split_to_array(t, '\\s+')) AS w,
         generate_subscripts(regexp_split_to_array(t, '\\s+'), 1) AS pos
  FROM d
),
flagged AS (
  SELECT doc_id, w, pos,
         CASE WHEN ('0x' || substr(md5(w), 1, 15))::BIGINT % 8 = 0
              THEN 1 ELSE 0 END AS b
  FROM tok
),
chunked AS (
  SELECT doc_id, w, pos,
         1 + COALESCE(SUM(b) OVER (
               PARTITION BY doc_id ORDER BY pos
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cid
  FROM flagged
),
chunks AS (
  SELECT doc_id, cid, COUNT(*) AS n_tok,
         string_agg(w, ' ' ORDER BY pos) AS chunk
  FROM chunked GROUP BY doc_id, cid
),
sets AS (
  SELECT DISTINCT doc_id,
         ('0x' || substr(md5(chunk), 1, 15))::BIGINT AS chunk_hash
  FROM chunks WHERE n_tok >= 4
),
sizes AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_chunks_a
  FROM sets GROUP BY 1 HAVING count(*) >= 3
),
dfc AS (
  SELECT chunk_hash FROM sets GROUP BY 1 HAVING count(*) <= 100
),
posts AS (
  SELECT s.doc_id, s.chunk_hash FROM sets s JOIN dfc USING (chunk_hash)
),
pr AS (
  SELECT pa.doc_id AS a, pb.doc_id AS b,
         CAST(count(*) AS BIGINT) AS shared_chunks
  FROM posts pa JOIN posts pb USING (chunk_hash)
  WHERE pa.doc_id <> pb.doc_id
  GROUP BY 1, 2
)
SELECT pr.a, pr.b, pr.shared_chunks, sz.n_chunks_a,
       round(pr.shared_chunks / sz.n_chunks_a::DOUBLE, 6) AS containment
FROM pr JOIN sizes sz ON sz.doc_id = pr.a
WHERE pr.shared_chunks / sz.n_chunks_a::DOUBLE >= 0.75
ORDER BY a, b
"""


# contract.q_wat_records twin: the WAT metadata record rebuilt
# byte-for-byte — same uuid derivations as the WET twin, the reduced
# Envelope JSON with explicit escape chain (backslash then quote,
# chr(92) spellings keep SQL-literal ambiguity out), planted title
# with quotes, doc_id%9 null-title branch, and the two surviving
# resolved links in document order (mailto dropped).
ORACLES["wat_records"] = """
WITH base AS (
  SELECT doc_id,
         'https://h' || CAST(doc_id % 7 AS VARCHAR) || '.example/p/'
           || CAST(doc_id AS VARCHAR) AS uri,
         strftime(TIMESTAMP '2026-01-15 00:00:00'
                  + (doc_id % 86400) * INTERVAL 1 SECOND,
                  '%Y-%m-%dT%H:%M:%SZ') AS d,
         CASE WHEN doc_id % 9 = 0 THEN NULL
              ELSE 'Doc' || CASE WHEN doc_id % 9 = 1 THEN chr(9)
                                 ELSE ' ' END
                   || '"' || CAST(doc_id AS VARCHAR) || '" - ' || source
         END AS title,
         'https://partner.example/r/' || CAST(doc_id AS VARCHAR) AS l1,
         'https://h' || CAST(doc_id % 7 AS VARCHAR) || '.example/p/'
           || CAST(doc_id % 50 AS VARCHAR) AS l2
  FROM documents
),
esc AS (
  -- mirrors webxtract.warc._json_str_expr: backslash, quote, then
  -- tab/LF/CR to two-char escapes, then strip remaining C0 controls
  SELECT *,
         '"' || regexp_replace(
                  replace(replace(replace(
                    replace(replace(coalesce(title, ''), chr(92),
                                    chr(92) || chr(92)),
                            '"', chr(92) || '"'),
                    chr(9), chr(92) || 't'),
                    chr(10), chr(92) || 'n'),
                    chr(13), chr(92) || 'r'),
                  '[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f]', '', 'g') || '"' AS jtitle
  FROM base
),
pay AS (
  SELECT doc_id, uri, d,
         '{"Envelope":{"WARC-Header-Metadata":{"WARC-Target-URI":"'
         || uri || '","WARC-Date":"' || d
         || '"},"Payload-Metadata":{"HTML-Metadata":{"Head":{"Title":'
         || CASE WHEN title IS NULL THEN 'null' ELSE jtitle END
         || '},"Links":["' || l1 || '","' || l2 || '"]}}}}' AS p
  FROM esc
),
ids AS (
  SELECT *,
         md5(uri || chr(10) || 'metadata' || chr(10) || d) AS h1,
         md5(uri || chr(10) || d) AS h2
  FROM pay
),
rec AS (
  SELECT doc_id,
         'WARC/1.0' || chr(13) || chr(10)
         || 'WARC-Type: metadata' || chr(13) || chr(10)
         || 'WARC-Target-URI: ' || uri || chr(13) || chr(10)
         || 'WARC-Date: ' || d || chr(13) || chr(10)
         || 'WARC-Record-ID: <urn:uuid:' || substr(h1, 1, 8) || '-'
            || substr(h1, 9, 4) || '-' || substr(h1, 13, 4) || '-'
            || substr(h1, 17, 4) || '-' || substr(h1, 21, 12) || '>'
            || chr(13) || chr(10)
         || 'WARC-Refers-To: <urn:uuid:' || substr(h2, 1, 8) || '-'
            || substr(h2, 9, 4) || '-' || substr(h2, 13, 4) || '-'
            || substr(h2, 17, 4) || '-' || substr(h2, 21, 12) || '>'
            || chr(13) || chr(10)
         || 'Content-Type: application/json' || chr(13) || chr(10)
         || 'Content-Length: ' || CAST(strlen(p) AS VARCHAR)
            || chr(13) || chr(10) || chr(13) || chr(10)
         || p || chr(13) || chr(10) || chr(13) || chr(10) AS r
  FROM ids
)
SELECT doc_id,
       CAST(strlen(r) AS INTEGER) AS rec_bytes,
       md5(r) AS rec_md5
FROM rec
ORDER BY doc_id
"""


# contract.q_robots_sitemaps twin: planted values emitted directly.
ORACLES["robots_sitemaps"] = """
SELECT doc_id,
       'https://s' || CAST(doc_id % 5 AS VARCHAR) || '.example/sitemap-'
         || CAST(doc_id AS VARCHAR) || '.xml'
         || CASE WHEN doc_id % 3 = 0
                 THEN ',https://s.example/extra.xml' ELSE '' END AS sitemaps,
       CAST(CASE WHEN doc_id % 3 = 0 THEN 2 ELSE 1 END AS INTEGER)
         AS n_sitemaps
FROM documents
ORDER BY doc_id
"""


# contract.q_classifier_score twin: identical unigram+bigram feature
# list (tokens then bigrams, document order), identical md5-60 bucket
# hash, the same exact-double weight table w[j]=((37j mod 64)-31.5)/64
# built from integer arithmetic, in-order list_sum for the fold, and
# the 6dp round applied BEFORE the keep comparison on both sides.
ORACLES["classifier_score"] = """
WITH toks AS (
  SELECT doc_id,
         regexp_split_to_array(trim(coalesce(text, '')), '\\s+') AS tk
  FROM documents
),
feats AS (
  SELECT doc_id,
         list_concat(tk,
           CASE WHEN len(tk) >= 2
                THEN list_transform(range(1, len(tk)),
                                    i -> tk[i] || ' ' || tk[i + 1])
                ELSE [] END) AS fs
  FROM toks
),
w AS (
  SELECT list(((37 * j) % 64 - 31.5) / 64.0 ORDER BY j) AS wl
  FROM (SELECT unnest(range(0, 64)) AS j)
),
scored AS (
  SELECT doc_id, CAST(len(fs) AS BIGINT) AS n_feats,
         round(1.0 / (1.0 + exp(-(-0.1 +
           list_sum(list_transform(fs,
             x -> wl[CAST((('0x' || substr(md5(x), 1, 15))::BIGINT % 64)
                     AS INTEGER) + 1]))
           / len(fs)))), 6) AS clf_score
  FROM feats CROSS JOIN w
)
SELECT doc_id, n_feats, clf_score, clf_score >= 0.5 AS clf_keep
FROM scored ORDER BY doc_id
"""


# contract.q_shard_assign twin: same md5-60(id-as-string) hash, same
# mod-8 shard, same (hash, id) window order; the exclusive prefix sum
# casts DuckDB's HUGEINT sum back to BIGINT to match Spark's long.
ORACLES["shard_assign"] = """
WITH base AS (
  SELECT doc_id AS id,
         ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT AS h,
         len(regexp_split_to_array(trim(coalesce(text, '')), '\\s+'))
           AS n_tok
  FROM documents
)
SELECT id,
       CAST(h % 8 AS INTEGER) AS shard,
       CAST(row_number() OVER won AS INTEGER) AS pos,
       CAST(n_tok AS BIGINT) AS n_tokens,
       CAST(coalesce(sum(n_tok) OVER (
         PARTITION BY h % 8 ORDER BY h, id
         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
         AS tok_offset
FROM base
WINDOW won AS (PARTITION BY h % 8 ORDER BY h, id)
ORDER BY shard, pos
"""


# contract.q_sitemap_entries twin: rebuilds the identical planted XML
# (urlset with padded-loc + lastmod first entry and bare second entry;
# sitemapindex for doc_id%4==0) and parses it with the same (?s) RE2
# block regexes — loc trimmed, lastmod NULL when the tag is absent in
# ITS OWN block, '-' placeholder in the joined projection.
ORACLES["sitemap_entries"] = """
WITH d AS (
  SELECT doc_id,
         CASE WHEN doc_id % 4 = 0 THEN
           '<sitemapindex><sitemap><loc>https://s.example/a-' || CAST(doc_id AS VARCHAR) ||
           '.xml</loc></sitemap><sitemap><loc> https://s.example/b-' ||
           doc_id || '.xml </loc></sitemap></sitemapindex>'
         ELSE
           '<?xml version="1.0"?><urlset><url><loc> https://h' ||
           (doc_id % 7) || '.example/p/' || CAST(doc_id AS VARCHAR) ||
           ' </loc><lastmod>2026-01-' ||
           lpad(CAST((doc_id % 28) + 1 AS VARCHAR), 2, '0') ||
           '</lastmod></url><url><loc>https://h' || CAST(doc_id % 7 AS VARCHAR) ||
           '.example/p/' || CAST(doc_id AS VARCHAR) || '?page=2</loc></url></urlset>'
         END AS xml
  FROM documents
),
parsed AS (
  SELECT doc_id,
         regexp_extract_all(xml, '(?s)<url>(.*?)</url>', 1) AS blocks,
         regexp_extract_all(xml, '(?s)<sitemap>(.*?)</sitemap>', 1)
           AS sblocks
  FROM d
)
SELECT doc_id,
       CAST(len(blocks) AS INTEGER) AS n_entries,
       coalesce(list_aggregate(list_transform(blocks, b ->
         regexp_extract(b, '(?s)<loc>\\s*(.*?)\\s*</loc>', 1) || '@' ||
         CASE WHEN regexp_extract(b, '(?s)<lastmod>\\s*(.*?)\\s*</lastmod>', 1)
                   <> ''
              THEN regexp_extract(b, '(?s)<lastmod>\\s*(.*?)\\s*</lastmod>', 1)
              ELSE '-' END
       ), 'string_agg', ','), '') AS entries,
       CAST(len(sblocks) AS INTEGER) AS n_children,
       coalesce(list_aggregate(list_transform(sblocks, b ->
         regexp_extract(b, '(?s)<loc>\\s*(.*?)\\s*</loc>', 1)
       ), 'string_agg', ','), '') AS children
FROM parsed ORDER BY doc_id
"""


# contract.q_structured_metadata twin: emits the PLANTED values
# directly (parse-vs-construction, the html_metadata pattern) — the
# engine must recover exactly what the fixture embedded.
ORACLES["structured_metadata"] = """
SELECT doc_id,
       CASE WHEN doc_id % 4 <> 1 THEN 'Article' ELSE '' END AS jsonld_type,
       CAST(CASE WHEN doc_id % 4 <> 1
                 THEN 1 + CASE WHEN doc_id % 8 = 0 THEN 1 ELSE 0 END
                 ELSE 0 END AS INTEGER) AS n_jsonld,
       '' AS og_description,
       CASE WHEN doc_id % 3 = 0
            THEN 'https://img.example/' || CAST(doc_id AS VARCHAR) || '.jpg'
            ELSE '' END AS og_image,
       'OG ' || CAST(doc_id AS VARCHAR) AS og_title,
       'article' AS og_type,
       CASE WHEN doc_id % 3 = 0
            THEN '2026-01-' || lpad(CAST((doc_id % 28) + 1 AS VARCHAR), 2, '0')
                 || 'T08:00:00Z'
            ELSE '' END AS published_time
FROM documents WHERE text IS NOT NULL ORDER BY doc_id
"""


# Zipnum secondary-index layout (contract.q_zipnum_index): the same
# CDX line corpus rebuilt from documents, globally ranked with one
# window (the oracle MAY use a global window — the engine may not),
# cut into 37-line blocks and 4 shards with the engine's exact
# blocks-per-shard rule, per-block first key + uncompressed offsets.
ORACLES["zipnum_index"] = """
WITH lines AS (
  SELECT substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) || ',site)/'
           || CAST(doc_id AS VARCHAR) AS urlkey,
         CAST(20260101000000 + doc_id % 9973 AS VARCHAR) AS timestamp,
         substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) || ',site)/'
           || CAST(doc_id AS VARCHAR)
           || ' ' || CAST(20260101000000 + doc_id % 9973 AS VARCHAR)
           || ' http://site.example/' || CAST(doc_id AS VARCHAR)
           || ' text/html 200' AS line
  FROM documents WHERE text IS NOT NULL
),
ranked AS (
  SELECT urlkey, timestamp, line,
         row_number() OVER (ORDER BY urlkey, timestamp, line) - 1 AS rnk,
         count(*) OVER () AS n
  FROM lines
),
blocked AS (
  SELECT urlkey, timestamp, line, rnk,
         rnk // 37 AS block_seq,
         GREATEST(1, CAST(CEIL(CEIL(n / 37.0) / 4.0) AS BIGINT)) AS bps
  FROM ranked
),
agg AS (
  SELECT CAST(block_seq // bps AS INTEGER) AS shard,
         block_seq,
         MIN(rnk) AS first_rnk,
         CAST(SUM(strlen(line) + 1) AS BIGINT) AS length,
         COUNT(*) AS n_lines
  FROM blocked GROUP BY 1, 2
)
SELECT a.shard,
       printf('cdx-%05d.gz', a.shard) AS shard_file,
       a.block_seq,
       r.urlkey,
       r.timestamp,
       CAST(COALESCE(SUM(a.length) OVER (
              PARTITION BY a.shard ORDER BY a.block_seq
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
            0) AS BIGINT) AS offset,
       a.length,
       a.n_lines
FROM agg a JOIN ranked r ON r.rnk = a.first_rnk
ORDER BY shard, block_seq
"""
