"""Generated DuckDB oracle SQL for the dedup / similarity / text
operators. Each builder mirrors the corresponding Spark operator's
exact deterministic computation (portable md5 hashing, integer-exact
quantized vector arithmetic), so results hash-match across engines.
"""

from __future__ import annotations

from orestes_spark.operators.similarity import hyperplanes
from orestes_spark.operators.text import LANG_MARKERS

# Shared CTE: distinct 3-token shingles per document.
TOKEN_SHINGLES = r"""
toks AS (
  SELECT doc_id, u.tok AS tok, u.pos AS pos FROM documents,
  (SELECT UNNEST(string_split_regex(trim(lower(text)), '\s+')) AS tok,
          generate_subscripts(string_split_regex(trim(lower(text)), '\s+'), 1) AS pos) u
),
shingles AS (
  SELECT DISTINCT doc_id AS _id, concat_ws(' ', tok,
      lead(tok, 1) OVER (PARTITION BY doc_id ORDER BY pos),
      lead(tok, 2) OVER (PARTITION BY doc_id ORDER BY pos)) AS sh
  FROM toks
  QUALIFY lead(tok, 2) OVER (PARTITION BY doc_id ORDER BY pos) IS NOT NULL
)"""


def minhash_neardup_sql(num_hashes: int = 8, rows_per_band: int = 2, threshold: float = 0.5) -> str:
    sig_cols = ",\n         ".join(
        f"min(md5('{i}:' || sh)) AS h{i}" for i in range(num_hashes)
    )
    bands = num_hashes // rows_per_band
    band_selects = " UNION ALL ".join(
        "SELECT _id, {b} AS band, concat({cols}) AS bval FROM sig".format(
            b=b,
            cols=", ".join(f"h{b * rows_per_band + r}" for r in range(rows_per_band)),
        )
        for b in range(bands)
    )
    return f"""
WITH {TOKEN_SHINGLES},
sig AS (
  SELECT _id, {sig_cols}
  FROM shingles GROUP BY _id
),
banded AS ({band_selects}),
cands AS (
  SELECT DISTINCT a._id AS id_a, b._id AS id_b
  FROM banded a JOIN banded b ON a.band = b.band AND a.bval = b.bval AND a._id < b._id
),
sizes AS (SELECT _id, count(*) AS n FROM shingles GROUP BY 1),
inter AS (
  SELECT c.id_a, c.id_b, count(*) AS i
  FROM cands c
  JOIN shingles sa ON sa._id = c.id_a
  JOIN shingles sb ON sb._id = c.id_b AND sb.sh = sa.sh
  GROUP BY 1, 2
)
SELECT id_a, id_b, round(i * 1.0 / (na.n + nb.n - i), 6) AS jaccard
FROM inter JOIN sizes na ON na._id = id_a JOIN sizes nb ON nb._id = id_b
WHERE round(i * 1.0 / (na.n + nb.n - i), 6) >= {threshold}
"""


def incremental_neardup_sql(
    num_hashes: int = 8,
    rows_per_band: int = 2,
    threshold: float = 0.5,
    new_mod: int = 5,
) -> str:
    """Twin of dedup.incremental_neardup over the documents table with
    the corpus/new split `doc_id % new_mod` (== 0 → new batch,
    != 0 → indexed corpus): same md5 minhash, banding, and exact
    Jaccard as minhash_neardup_sql, pairs restricted to new × corpus."""
    sig_cols = ",\n         ".join(
        f"min(md5('{i}:' || sh)) AS h{i}" for i in range(num_hashes)
    )
    bands = num_hashes // rows_per_band
    band_selects = " UNION ALL ".join(
        "SELECT _id, {b} AS band, concat({cols}) AS bval FROM sig".format(
            b=b,
            cols=", ".join(f"h{b * rows_per_band + r}" for r in range(rows_per_band)),
        )
        for b in range(bands)
    )
    return f"""
WITH {TOKEN_SHINGLES},
sig AS (
  SELECT _id, {sig_cols}
  FROM shingles GROUP BY _id
),
banded AS ({band_selects}),
cands AS (
  SELECT DISTINCT a._id AS id_new, b._id AS id_corpus
  FROM banded a JOIN banded b ON a.band = b.band AND a.bval = b.bval
  WHERE a._id % {new_mod} = 0 AND b._id % {new_mod} != 0
),
sizes AS (SELECT _id, count(*) AS n FROM shingles GROUP BY 1),
inter AS (
  SELECT c.id_new, c.id_corpus, count(*) AS i
  FROM cands c
  JOIN shingles sa ON sa._id = c.id_new
  JOIN shingles sb ON sb._id = c.id_corpus AND sb.sh = sa.sh
  GROUP BY 1, 2
)
SELECT id_new, id_corpus, round(i * 1.0 / (na.n + nb.n - i), 6) AS jaccard
FROM inter JOIN sizes na ON na._id = id_new JOIN sizes nb ON nb._id = id_corpus
WHERE round(i * 1.0 / (na.n + nb.n - i), 6) >= {threshold}
"""


def neardup_recall_sql(
    num_hashes: int = 8, rows_per_band: int = 2, threshold: float = 0.5
) -> str:
    """Recall probe of the MinHash-LSH banded route vs exact-Jaccard
    ground truth — extends the ANN probe family's "every approximate
    route carries a measured recall row" discipline (emb_lsh_recall /
    emb_ivf_recall / emb_pq_recall) to the text dedup family. Ground
    truth = every pair with exact token-shingle Jaccard >= threshold
    (inverted-index co-occurrence join: exact for threshold > 0, since
    J >= t > 0 requires a shared shingle). Caught = banded candidates
    that survive the same exact verify — by construction a subset of
    truth, so recall = caught/truth and (n_cands - n_caught) is the
    wasted-verify cost the band count dial trades against recall."""
    sig_cols = ",\n         ".join(
        f"min(md5('{i}:' || sh)) AS h{i}" for i in range(num_hashes)
    )
    bands = num_hashes // rows_per_band
    band_selects = " UNION ALL ".join(
        "SELECT _id, {b} AS band, concat({cols}) AS bval FROM sig".format(
            b=b,
            cols=", ".join(f"h{b * rows_per_band + r}" for r in range(rows_per_band)),
        )
        for b in range(bands)
    )
    return f"""
WITH {TOKEN_SHINGLES},
sig AS (
  SELECT _id, {sig_cols}
  FROM shingles GROUP BY _id
),
banded AS ({band_selects}),
cands AS (
  SELECT DISTINCT a._id AS id_a, b._id AS id_b
  FROM banded a JOIN banded b ON a.band = b.band AND a.bval = b.bval AND a._id < b._id
),
sizes AS (SELECT _id, count(*) AS n FROM shingles GROUP BY 1),
inter_all AS (
  SELECT a._id AS id_a, b._id AS id_b, count(*) AS i
  FROM shingles a JOIN shingles b ON a.sh = b.sh AND a._id < b._id
  GROUP BY 1, 2
),
truth AS (
  SELECT ia.id_a, ia.id_b
  FROM inter_all ia
  JOIN sizes na ON na._id = ia.id_a JOIN sizes nb ON nb._id = ia.id_b
  WHERE round(ia.i * 1.0 / (na.n + nb.n - ia.i), 6) >= {threshold}
),
caught AS (
  SELECT t.id_a, t.id_b
  FROM truth t JOIN cands c ON c.id_a = t.id_a AND c.id_b = t.id_b
)
SELECT
  (SELECT count(*) FROM truth) AS n_true,
  (SELECT count(*) FROM cands) AS n_cands,
  (SELECT count(*) FROM caught) AS n_caught,
  round((SELECT count(*) FROM caught) * 1.0
        / greatest((SELECT count(*) FROM truth), 1), 6) AS recall
"""


def token_shingles_cte(n: int) -> str:
    """Parameterized twin of TOKEN_SHINGLES for n-token shingles."""
    leads = ", ".join(
        f"lead(tok, {i}) OVER (PARTITION BY doc_id ORDER BY pos)" for i in range(1, n)
    )
    return rf"""
toks AS (
  SELECT doc_id, u.tok AS tok, u.pos AS pos FROM documents,
  (SELECT UNNEST(string_split_regex(trim(lower(text)), '\s+')) AS tok,
          generate_subscripts(string_split_regex(trim(lower(text)), '\s+'), 1) AS pos) u
),
shingles AS (
  SELECT DISTINCT doc_id AS _id, concat_ws(' ', tok, {leads}) AS sh
  FROM toks
  QUALIFY lead(tok, {n - 1}) OVER (PARTITION BY doc_id ORDER BY pos) IS NOT NULL
)"""


def decontaminate_sql(n: int = 4, mod: int = 20) -> str:
    """Docs sharing ≥1 n-token shingle with the doc_id % mod == 0
    holdout 'benchmark'."""
    return f"""
WITH {token_shingles_cte(n)},
bench AS (SELECT DISTINCT sh FROM shingles WHERE _id % {mod} = 0)
SELECT s._id AS doc_id, count(*) AS n_overlap
FROM shingles s JOIN bench b USING (sh)
WHERE s._id % {mod} <> 0
GROUP BY 1
"""


def simhash_sql(bits: int = 32) -> str:
    # Beyond 32 bits the per-token hash string is extended with a second
    # md5 ('sh2:' salt), matching dedup.simhash_signatures; bit 63 is the
    # sign bit (weight = BIGINT min), so 64-bit signatures span the full
    # signed range on both engines.
    hash_expr = (
        "md5('sh:' || tok)" if bits <= 32 else "md5('sh:' || tok) || md5('sh2:' || tok)"
    )
    votes = ",\n         ".join(
        f"sum(CASE WHEN instr('13579bdf', substr({hash_expr}, {i + 1}, 1)) > 0 THEN 1 ELSE -1 END) AS v{i}"
        for i in range(bits)
    )
    def weight(i: int) -> str:
        if i == 63:
            return "CAST(-9223372036854775807 - 1 AS BIGINT)"
        return f"CAST({2**i} AS BIGINT)"

    sig = " + ".join(f"CASE WHEN v{i} >= 0 THEN {weight(i)} ELSE 0 END" for i in range(bits))
    return rf"""
WITH toks AS (
  SELECT doc_id, u.tok AS tok FROM documents,
  (SELECT UNNEST(string_split_regex(trim(lower(text)), '\s+')) AS tok) u
),
votes AS (
  SELECT doc_id, {votes}
  FROM toks GROUP BY doc_id
)
SELECT doc_id, {sig} AS simhash FROM votes
"""


def simhash_pairs_sql(bits: int = 32, band_bits: int = 8, max_hamming: int = 3) -> str:
    bands = bits // band_bits
    mask = (1 << band_bits) - 1
    # (simhash >> k) & mask — sign-safe band extraction, equal to
    # Spark's shiftrightunsigned+mask for every band including the one
    # holding the sign bit (verified: arithmetic shift + mask keeps
    # exactly bits [k, k+band_bits)).
    band_selects = " UNION ALL ".join(
        f"SELECT doc_id, simhash, {b} AS band, "
        f"CAST((simhash >> {b * band_bits}) & {mask} AS BIGINT) AS bval FROM sig"
        for b in range(bands)
    )
    return f"""
WITH base AS ({simhash_sql(bits)}),
sig AS (SELECT doc_id, simhash FROM base),
banded AS ({band_selects}),
pairs AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b, a.simhash AS sa, b.simhash AS sb
  FROM banded a JOIN banded b ON a.band = b.band AND a.bval = b.bval AND a.doc_id < b.doc_id
)
SELECT id_a, id_b, bit_count(xor(sa, sb)) AS hamming
FROM pairs WHERE bit_count(xor(sa, sb)) <= {max_hamming}
"""


def ngram_jaccard_sql(
    n: int = 5,
    threshold: float = 0.7,
    max_df: int | None = 100,
    min_grams: int = 1,
    min_cooccur: int = 1,
) -> str:
    size_filter = (
        f"WHERE _id IN (SELECT _id FROM grams_raw GROUP BY _id HAVING count(*) >= {min_grams})"
        if min_grams > 1
        else ""
    )
    cand_select = (
        "SELECT DISTINCT a._id AS id_a, b._id AS id_b"
        if min_cooccur <= 1
        else "SELECT a._id AS id_a, b._id AS id_b"
    )
    cand_having = "" if min_cooccur <= 1 else f" GROUP BY 1, 2 HAVING count(*) >= {min_cooccur}"
    if max_df is not None:
        cands = f"""
rare AS (SELECT sh FROM grams GROUP BY sh HAVING count(*) <= {max_df}),
grams_rare AS (SELECT _id, sh FROM grams WHERE sh IN (SELECT sh FROM rare)),
cands AS (
  {cand_select}
  FROM grams_rare a JOIN grams_rare b ON a.sh = b.sh AND a._id < b._id{cand_having}
),
inter AS (
  SELECT c.id_a, c.id_b, count(*) AS i
  FROM cands c
  JOIN grams ga ON ga._id = c.id_a
  JOIN grams gb ON gb._id = c.id_b AND gb.sh = ga.sh
  GROUP BY 1, 2
)"""
    else:
        cands = """
inter AS (
  SELECT a._id AS id_a, b._id AS id_b, count(*) AS i
  FROM grams a JOIN grams b ON a.sh = b.sh AND a._id < b._id
  GROUP BY 1, 2
)"""
    return f"""
WITH d AS (SELECT doc_id, trim(lower(text)) AS norm FROM documents),
grams_raw AS (
  SELECT DISTINCT doc_id AS _id, substr(norm, u.i, {n}) AS sh FROM d,
  (SELECT UNNEST(generate_series(1, greatest(length(norm) - {n - 1}, 1))) AS i) u
),
grams AS (SELECT _id, sh FROM grams_raw {size_filter}),
sizes AS (SELECT _id, count(*) AS nn FROM grams GROUP BY 1),
{cands}
SELECT id_a, id_b, round(i * 1.0 / (na.nn + nb.nn - i), 6) AS jaccard
FROM inter JOIN sizes na ON na._id = id_a JOIN sizes nb ON nb._id = id_b
WHERE round(i * 1.0 / (na.nn + nb.nn - i), 6) >= {threshold}
"""


def lang_id_sql() -> str:
    selects = []
    for lang, markers in LANG_MARKERS.items():
        in_list = ", ".join(f"'{m}'" for m in markers)
        selects.append(
            rf"""SELECT doc_id, '{lang}' AS lang,
       len(list_filter(string_split_regex(trim(lower(text)), '\s+'), x -> x IN ({in_list}))) AS score
       FROM documents"""
        )
    union = " UNION ALL ".join(selects)
    return f"""
WITH scores AS ({union}),
ranked AS (
  SELECT doc_id, lang, score,
         row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, lang) AS rn
  FROM scores
)
SELECT doc_id, lang AS pred_lang, score FROM ranked WHERE rn = 1
"""


def fingerprint_sql() -> str:
    return r"""
WITH d AS (
  SELECT doc_id, regexp_replace(trim(lower(text)), '\s+', ' ', 'g') AS norm FROM documents
),
toks AS (
  SELECT doc_id, u.tok AS tok, u.pos AS pos FROM d,
  (SELECT UNNEST(string_split(norm, ' ')) AS tok,
          generate_subscripts(string_split(norm, ' '), 1) AS pos) u
),
shingles AS (
  SELECT doc_id, md5(concat_ws(' ', tok,
      lead(tok, 1) OVER (PARTITION BY doc_id ORDER BY pos),
      lead(tok, 2) OVER (PARTITION BY doc_id ORDER BY pos))) AS shash
  FROM toks
  QUALIFY lead(tok, 2) OVER (PARTITION BY doc_id ORDER BY pos) IS NOT NULL
)
SELECT d.doc_id, md5(d.norm) AS fingerprint, s.mf AS shingle_fingerprint
FROM d JOIN (SELECT doc_id, min(shash) AS mf FROM shingles GROUP BY 1) s USING (doc_id)
"""


_QUANT_VECS = """
q AS (SELECT vec_id, list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS v
      FROM embeddings),
u AS (SELECT vec_id, UNNEST(v) AS x, generate_subscripts(v, 1) AS i FROM q),
norms AS (SELECT vec_id, sum(x * x) AS n2 FROM u GROUP BY 1)"""


def emb_topk_sql(k: int = 5, num_queries: int = 10) -> str:
    return f"""
WITH {_QUANT_VECS},
dots AS (
  SELECT a.vec_id AS qid, b.vec_id AS cid, sum(a.x * b.x) AS dot
  FROM u a JOIN u b ON a.i = b.i AND a.vec_id != b.vec_id
  WHERE a.vec_id < {num_queries}
  GROUP BY 1, 2
),
scored AS (
  SELECT qid, cid, dot / (sqrt(na.n2) * sqrt(nb.n2)) AS c
  FROM dots JOIN norms na ON na.vec_id = qid JOIN norms nb ON nb.vec_id = cid
),
ranked AS (
  SELECT qid, cid, c, row_number() OVER (PARTITION BY qid ORDER BY c DESC, cid) AS rank
  FROM scored
)
SELECT qid AS query_id, cid AS neighbor_id, round(c, 6) AS cosine, rank
FROM ranked WHERE rank <= {k}
"""


def _planes_values(num_planes: int, dims: int, seed: str = "orestes") -> str:
    planes = hyperplanes(num_planes, dims, seed)
    rows = [f"({p}, {d}, {planes[p][d]})" for p in range(num_planes) for d in range(dims)]
    return "planes(p, d, s) AS (SELECT * FROM (VALUES " + ", ".join(rows) + "))"


def _bucketed_vecs(num_planes: int, dims: int) -> str:
    bucket_sum = " + ".join(
        f"CASE WHEN pr{p} >= 0 THEN CAST({2**p} AS BIGINT) ELSE 0 END" for p in range(num_planes)
    )
    proj_cols = ",\n    ".join(
        f"sum(CASE WHEN pl.p = {p} THEN u.x * pl.s ELSE 0 END) AS pr{p}" for p in range(num_planes)
    )
    return f"""
{_planes_values(num_planes, dims)},
projs AS (
  SELECT u.vec_id,
    {proj_cols}
  FROM u JOIN planes pl ON pl.d = u.i - 1
  GROUP BY u.vec_id
),
buckets AS (SELECT vec_id, {bucket_sum} AS bucket FROM projs)"""


def emb_topk_lsh_sql(k: int = 5, num_queries: int = 10, num_planes: int = 8, dims: int = 64) -> str:
    return f"""
WITH {_QUANT_VECS},
{_bucketed_vecs(num_planes, dims)},
dots AS (
  SELECT a.vec_id AS qid, b.vec_id AS cid, sum(a.x * b.x) AS dot
  FROM u a
  JOIN buckets ba ON ba.vec_id = a.vec_id
  JOIN buckets bb ON bb.bucket = ba.bucket AND bb.vec_id != a.vec_id
  JOIN u b ON b.vec_id = bb.vec_id AND b.i = a.i
  WHERE a.vec_id < {num_queries}
  GROUP BY 1, 2
),
scored AS (
  SELECT qid, cid, dot / (sqrt(na.n2) * sqrt(nb.n2)) AS c
  FROM dots JOIN norms na ON na.vec_id = qid JOIN norms nb ON nb.vec_id = cid
),
ranked AS (
  SELECT qid, cid, c, row_number() OVER (PARTITION BY qid ORDER BY c DESC, cid) AS rank
  FROM scored
)
SELECT qid AS query_id, cid AS neighbor_id, round(c, 6) AS cosine, rank
FROM ranked WHERE rank <= {k}
"""


def emb_lsh_recall_sql(
    k: int = 5, num_queries: int = 10, num_planes: int = 8, dims: int = 64
) -> str:
    """Recall@k of the LSH-bucketed search vs exact quantized cosine —
    completes the probe family (emb_pq_recall measures the PQ dial,
    emb_ivf_recall the nprobe dial, this one the num_planes dial):
    emb_topk_lsh_sql's bucketed approx CTEs plus the exact ranking
    and the shared probe/agg tail. A query whose bucket holds fewer
    than k others simply contributes fewer approx rows — misses count
    against recall, which is the metric's point."""
    return f"""
WITH {_QUANT_VECS},
{_bucketed_vecs(num_planes, dims)},
adots AS (
  SELECT a.vec_id AS qid, b.vec_id AS cid, sum(a.x * b.x) AS dot
  FROM u a
  JOIN buckets ba ON ba.vec_id = a.vec_id
  JOIN buckets bb ON bb.bucket = ba.bucket AND bb.vec_id != a.vec_id
  JOIN u b ON b.vec_id = bb.vec_id AND b.i = a.i
  WHERE a.vec_id < {num_queries}
  GROUP BY 1, 2
),
approx AS (
  SELECT qid, cid FROM (
    SELECT qid, cid,
           row_number() OVER (
             PARTITION BY qid
             ORDER BY dot / (sqrt(na.n2) * sqrt(nb.n2)) DESC, cid) AS rank
    FROM adots JOIN norms na ON na.vec_id = qid JOIN norms nb ON nb.vec_id = cid
  ) WHERE rank <= {k}
),
edots AS (
  SELECT a.vec_id AS qid, b.vec_id AS cid, sum(a.x * b.x) AS dot
  FROM u a JOIN u b ON a.i = b.i AND a.vec_id != b.vec_id
  WHERE a.vec_id < {num_queries}
  GROUP BY 1, 2
),
exact AS (
  SELECT qid, cid FROM (
    SELECT qid, cid,
           row_number() OVER (
             PARTITION BY qid
             ORDER BY dot / (sqrt(na.n2) * sqrt(nb.n2)) DESC, cid) AS rank
    FROM edots JOIN norms na ON na.vec_id = qid JOIN norms nb ON nb.vec_id = cid
  ) WHERE rank <= {k}
),
probe AS (
  SELECT e.qid, e.cid, p.cid AS hit
  FROM exact e LEFT JOIN approx p ON p.qid = e.qid AND p.cid = e.cid
)
SELECT {k} AS k,
       CAST(count(*) / {k} AS BIGINT) AS n_queries,
       count(hit) AS hits,
       round(count(hit) / count(*), 4) AS recall
FROM probe
"""


def emb_pq_topk_sql(
    k: int = 5, num_queries: int = 10, m: int = 4, ks: int = 16, dims: int = 64
) -> str:
    """DuckDB twin of similarity.pq_topk_quantized: integer-quantized
    vectors, codebooks = the ks vectors with the smallest
    (md5(vec_id), vec_id) — code index is the rank in that order —
    per-subspace argmin encoding (ties to the lower code), ADC via
    exact integer lookup sums, rank by (adc asc, neighbor asc). Every
    intermediate is integer arithmetic, so the match is bit-exact."""
    sub = dims // m
    return f"""
WITH {_QUANT_VECS},
sample AS (
  SELECT vec_id AS cb_id,
         row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1 AS code
  FROM q ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT {ks}
),
cb AS (
  SELECT s.code, (u.i - 1) // {sub} AS j, (u.i - 1) % {sub} AS d, u.x
  FROM sample s JOIN u ON u.vec_id = s.cb_id
),
enc AS (
  SELECT u.vec_id, cb.j, cb.code, sum((u.x - cb.x) * (u.x - cb.x)) AS dd
  FROM u JOIN cb ON (u.i - 1) // {sub} = cb.j AND (u.i - 1) % {sub} = cb.d
  GROUP BY 1, 2, 3
),
codes AS (
  SELECT vec_id, j, code FROM (
    SELECT vec_id, j, code, row_number() OVER (PARTITION BY vec_id, j ORDER BY dd, code) AS rn
    FROM enc
  ) WHERE rn = 1
),
lut AS (
  SELECT vec_id AS qid, j, code, dd FROM enc WHERE vec_id < {num_queries}
),
adc AS (
  SELECT l.qid, c.vec_id AS cid, sum(l.dd) AS adc
  FROM codes c JOIN lut l ON l.j = c.j AND l.code = c.code
  WHERE c.vec_id != l.qid
  GROUP BY 1, 2
),
ranked AS (
  SELECT qid, cid, adc, row_number() OVER (PARTITION BY qid ORDER BY adc, cid) AS rank
  FROM adc
)
SELECT qid AS query_id, cid AS neighbor_id, CAST(adc AS BIGINT) AS adc_dist, rank
FROM ranked WHERE rank <= {k}
"""


def emb_pq_recall_sql(
    k: int = 5, num_queries: int = 10, m: int = 4, ks: int = 16, dims: int = 64
) -> str:
    """recall@k of the integer PQ tier against the integer exact-cosine
    ranking — both sides deterministic (emb_pq_topk_sql + emb_topk_sql
    over the SAME quantized CTEs), so the instrumentation row itself is
    oracle-checkable."""
    sub = dims // m
    return f"""
WITH {_QUANT_VECS},
xdots AS (
  SELECT a.vec_id AS qid, b.vec_id AS cid, sum(a.x * b.x) AS dot
  FROM u a JOIN u b ON a.i = b.i AND a.vec_id != b.vec_id
  WHERE a.vec_id < {num_queries}
  GROUP BY 1, 2
),
exact AS (
  SELECT qid, cid FROM (
    SELECT qid, cid,
           row_number() OVER (
             PARTITION BY qid
             ORDER BY dot / (sqrt(na.n2) * sqrt(nb.n2)) DESC, cid
           ) AS rank
    FROM xdots JOIN norms na ON na.vec_id = qid JOIN norms nb ON nb.vec_id = cid
  ) WHERE rank <= {k}
),
sample AS (
  SELECT vec_id AS cb_id,
         row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1 AS code
  FROM q ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT {ks}
),
cb AS (
  SELECT s.code, (u.i - 1) // {sub} AS j, (u.i - 1) % {sub} AS d, u.x
  FROM sample s JOIN u ON u.vec_id = s.cb_id
),
enc AS (
  SELECT u.vec_id, cb.j, cb.code, sum((u.x - cb.x) * (u.x - cb.x)) AS dd
  FROM u JOIN cb ON (u.i - 1) // {sub} = cb.j AND (u.i - 1) % {sub} = cb.d
  GROUP BY 1, 2, 3
),
codes AS (
  SELECT vec_id, j, code FROM (
    SELECT vec_id, j, code, row_number() OVER (PARTITION BY vec_id, j ORDER BY dd, code) AS rn
    FROM enc
  ) WHERE rn = 1
),
lut AS (SELECT vec_id AS qid, j, code, dd FROM enc WHERE vec_id < {num_queries}),
adc AS (
  SELECT l.qid, c.vec_id AS cid, sum(l.dd) AS adc
  FROM codes c JOIN lut l ON l.j = c.j AND l.code = c.code
  WHERE c.vec_id != l.qid
  GROUP BY 1, 2
),
pq AS (
  SELECT qid, cid FROM (
    SELECT qid, cid, row_number() OVER (PARTITION BY qid ORDER BY adc, cid) AS rank
    FROM adc
  ) WHERE rank <= {k}
),
probe AS (
  SELECT e.qid, e.cid, p.cid AS hit
  FROM exact e LEFT JOIN pq p ON p.qid = e.qid AND p.cid = e.cid
)
SELECT {k} AS k,
       CAST(count(*) / {k} AS BIGINT) AS n_queries,
       count(hit) AS hits,
       round(count(hit) / count(*), 4) AS recall
FROM probe
"""


def emb_ivfpq_topk_sql(
    k: int = 5,
    num_queries: int = 10,
    m: int = 4,
    ks: int = 16,
    nprobe: int = 2,
    dims: int = 64,
) -> str:
    """DuckDB twin of similarity.ivf_pq_topk(quantize=1000): micro-unit
    integer residual PQ. Centroids = CAST(round(1000·sum/n) AS BIGINT)
    per (label, dim) — DuckDB round() is half-away-from-zero, the same
    rule the Python side applies; cells indexed by label sort order;
    codebooks = residuals of the ks (md5(id), id)-smallest vectors;
    per-subspace argmin encoding (ties → lower code); queries probe
    their nprobe nearest cells (ties → lower cell) and score probed-cell
    members by exact integer ADC sums, rank (adc asc, cid asc)."""
    sub = dims // m
    return f"""
WITH {_QUANT_VECS},
ql AS (SELECT vec_id, label FROM embeddings),
cellidx AS (
  SELECT label, row_number() OVER (ORDER BY label) - 1 AS cell
  FROM (SELECT DISTINCT label FROM embeddings)
),
cent AS (
  SELECT ql.label, u.i, CAST(round(1000.0 * sum(u.x) / count(*)) AS BIGINT) AS c
  FROM u JOIN ql USING (vec_id)
  GROUP BY 1, 2
),
res AS (
  SELECT u.vec_id, u.i, u.x * 1000 - cent.c AS r
  FROM u JOIN ql USING (vec_id) JOIN cent ON cent.label = ql.label AND cent.i = u.i
),
sample AS (
  SELECT vec_id AS cb_id,
         row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1 AS code
  FROM q ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT {ks}
),
cb AS (
  SELECT s.code, (r.i - 1) // {sub} AS j, (r.i - 1) % {sub} AS d, r.r AS x
  FROM sample s JOIN res r ON r.vec_id = s.cb_id
),
enc AS (
  SELECT r.vec_id, cb.j, cb.code, sum((r.r - cb.x) * (r.r - cb.x)) AS dd
  FROM res r JOIN cb ON (r.i - 1) // {sub} = cb.j AND (r.i - 1) % {sub} = cb.d
  GROUP BY 1, 2, 3
),
codes AS (
  SELECT e.vec_id, ci.cell, e.j, e.code FROM (
    SELECT vec_id, j, code, row_number() OVER (PARTITION BY vec_id, j ORDER BY dd, code) AS rn
    FROM enc
  ) e JOIN ql ON ql.vec_id = e.vec_id JOIN cellidx ci ON ci.label = ql.label
  WHERE e.rn = 1
),
qcell AS (
  SELECT u.vec_id AS qid, ci.cell, sum((u.x * 1000 - cent.c) * (u.x * 1000 - cent.c)) AS d2
  FROM u JOIN cent ON cent.i = u.i JOIN cellidx ci ON ci.label = cent.label
  WHERE u.vec_id < {num_queries}
  GROUP BY 1, 2
),
probes AS (
  SELECT qid, cell FROM (
    SELECT qid, cell, row_number() OVER (PARTITION BY qid ORDER BY d2, cell) AS pr
    FROM qcell
  ) WHERE pr <= {nprobe}
),
qres AS (
  SELECT u.vec_id AS qid, p.cell, u.i, u.x * 1000 - cent.c AS r
  FROM u
  JOIN probes p ON p.qid = u.vec_id
  JOIN cellidx ci ON ci.cell = p.cell
  JOIN cent ON cent.label = ci.label AND cent.i = u.i
),
lut AS (
  SELECT qr.qid, qr.cell, cb.j, cb.code, sum((qr.r - cb.x) * (qr.r - cb.x)) AS dd
  FROM qres qr JOIN cb ON (qr.i - 1) // {sub} = cb.j AND (qr.i - 1) % {sub} = cb.d
  GROUP BY 1, 2, 3, 4
),
adc AS (
  SELECT l.qid, c.vec_id AS cid, sum(l.dd) AS adc
  FROM codes c
  JOIN lut l ON l.cell = c.cell AND l.j = c.j AND l.code = c.code
  WHERE c.vec_id != l.qid
  GROUP BY 1, 2
),
ranked AS (
  SELECT qid, cid, adc, row_number() OVER (PARTITION BY qid ORDER BY adc, cid) AS rank
  FROM adc
)
SELECT qid AS query_id, cid AS neighbor_id, CAST(adc AS BIGINT) AS adc_dist, rank
FROM ranked WHERE rank <= {k}
"""


def emb_highsim_pairs_sql(threshold: float = 0.3, num_planes: int = 8, dims: int = 64) -> str:
    return f"""
WITH {_QUANT_VECS},
{_bucketed_vecs(num_planes, dims)},
cands AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b
  FROM buckets a JOIN buckets b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
),
dots AS (
  SELECT c.id_a, c.id_b, sum(ua.x * ub.x) AS dot
  FROM cands c JOIN u ua ON ua.vec_id = c.id_a JOIN u ub ON ub.vec_id = c.id_b AND ub.i = ua.i
  GROUP BY 1, 2
)
SELECT id_a, id_b, round(dot / (sqrt(na.n2) * sqrt(nb.n2)), 6) AS cosine
FROM dots JOIN norms na ON na.vec_id = id_a JOIN norms nb ON nb.vec_id = id_b
WHERE round(dot / (sqrt(na.n2) * sqrt(nb.n2)), 6) >= {threshold}
"""


def _hex4(off: int) -> str:
    """SQL for int(md5_hex[off:off+4], 16), 1-indexed, over column h."""
    digits = [
        f"(strpos('0123456789abcdef', substr(h, {off + j}, 1)) - 1)" for j in range(4)
    ]
    return f"({digits[0]} * 4096 + {digits[1]} * 256 + {digits[2]} * 16 + {digits[3]})"


def multimodal_meta_sql() -> str:
    return f"""
WITH m AS (SELECT doc_id, text, md5(text) AS h FROM documents)
SELECT doc_id AS media_id,
       'image' AS modality,
       'application/octet-stream' AS mime,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       h AS checksum,
       CAST({_hex4(1)} % 1024 AS INTEGER) AS width,
       CAST({_hex4(5)} % 1024 AS INTEGER) AS height,
       CAST({_hex4(9)} AS BIGINT) AS duration_ms
FROM m
"""


def frame_sample_sql(every_ms: int = 1000) -> str:
    return f"""
WITH m AS (SELECT doc_id, CAST({_hex4(9)} AS BIGINT) AS duration_ms
           FROM (SELECT doc_id, md5(text) AS h FROM documents))
SELECT doc_id AS media_id,
       CAST(u.i AS INTEGER) AS frame_idx,
       CAST(u.i * {every_ms} AS BIGINT) AS frame_ts_ms
FROM m, (SELECT UNNEST(generate_series(0, duration_ms // {every_ms})) AS i) u
"""


def wav_meta_sql() -> str:
    """Closed-form twin of multimodal.wav_metadata over synth_wav
    payloads: the synth derives (amp, rate, n_frames) from
    md5('wav:'+text) and emits a pure ±amp square wave through the
    stdlib wave writer (44-byte canonical header), so every REAL
    decode output — header fields, n_bytes, and the sample-derived
    peak/rms (both exactly amp) — is stateable in SQL. A hash match
    therefore certifies the synthesize→decode round-trip."""
    return """
WITH m AS (SELECT doc_id, md5('wav:' || text) AS h FROM documents),
p AS (SELECT doc_id,
        1000 + CAST('0x' || substr(h, 1, 4) AS BIGINT) % 20000 AS amp,
        CASE CAST('0x' || substr(h, 5, 2) AS BIGINT) % 4
          WHEN 0 THEN 8000 WHEN 1 THEN 16000 WHEN 2 THEN 22050
          ELSE 44100 END AS rate,
        100 + CAST('0x' || substr(h, 7, 4) AS BIGINT) % 2000 AS n_frames
      FROM m)
SELECT doc_id AS media_id,
       CAST(44 + 2 * n_frames AS BIGINT) AS n_bytes,
       CAST(1 AS INTEGER) AS channels,
       CAST(2 AS INTEGER) AS sampwidth,
       CAST(rate AS INTEGER) AS framerate,
       CAST(n_frames AS BIGINT) AS n_frames,
       CAST(n_frames * 1000 // rate AS BIGINT) AS duration_ms,
       CAST(amp AS BIGINT) AS peak,
       CAST(amp AS BIGINT) AS rms
FROM p
"""


def ppm_meta_sql() -> str:
    """Closed-form twin of multimodal.ppm_metadata over synth_ppm
    payloads: md5-derived dimensions (width a multiple of 16) and a
    tiled 16-byte pixel pattern make the REAL decoder's pixel SUM
    equal pattern_sum · (3wh/16), and n_bytes the exact header length
    plus the RGB plane."""
    return """
WITH m AS (SELECT doc_id, md5('ppm:' || text) AS h, md5('px:' || text) AS hp
           FROM documents),
p AS (SELECT doc_id, hp,
        16 * (1 + CAST('0x' || substr(h, 1, 2) AS BIGINT) % 8) AS w,
        1 + CAST('0x' || substr(h, 3, 2) AS BIGINT) % 24 AS ht
      FROM m),
ps AS (
  SELECT doc_id, sum(CAST('0x' || substr(hp, 2 * u.j + 1, 2) AS BIGINT)) AS psum
  FROM p, (SELECT UNNEST(generate_series(0, 15)) AS j) u
  GROUP BY doc_id
)
SELECT p.doc_id AS media_id,
       CAST(length('P6' || chr(10) || CAST(w AS VARCHAR) || ' ' ||
                   CAST(ht AS VARCHAR) || chr(10) || '255' || chr(10))
            + 3 * w * ht AS BIGINT) AS n_bytes,
       CAST(w AS INTEGER) AS width,
       CAST(ht AS INTEGER) AS height,
       CAST(255 AS INTEGER) AS maxval,
       CAST(ps.psum * (3 * w * ht // 16) AS BIGINT) AS pixel_sum
FROM p JOIN ps ON ps.doc_id = p.doc_id
"""


def phash_pairs_sql(max_hamming: int = 3) -> str:
    """Closed-form twin of multimodal.dhash_signatures +
    dedup.simhash_near_pairs over attach_ppm_pair payloads: the synth
    tiles a 16-byte md5 pattern over an odd-width plane, so the gray
    value at any sampled (x, y) is stateable from substrings of
    md5('pxi:'+text); the 2x-upscaled variant hashes identically by
    the floor identity floor(floor(2a)/2) = floor(a) — the ORACLE
    states that identity, the Spark side proves it by actually
    resizing and re-decoding. Banding is omitted here because with 4
    bands and max_hamming=3 the pigeonhole makes band-LSH EXACT
    (>=1 band must be untouched), so all-pairs-Hamming<=h is the same
    set — and the oracle corpus is 2 rows/doc, small enough to state
    directly."""
    return f"""
WITH {DHASH_SIG0_CTES},
sig AS (SELECT 2 * doc_id AS mid, dh FROM sig0
        UNION ALL
        SELECT 2 * doc_id + 1 AS mid, dh FROM sig0)
SELECT a.mid AS id_a, b.mid AS id_b, bit_count(xor(a.dh, b.dh)) AS hamming
FROM sig a JOIN sig b ON a.mid < b.mid
WHERE bit_count(xor(a.dh, b.dh)) <= {max_hamming}
"""


# Shared CTE chain: per-document dHash-64 of the synth_ppm_img fixture
# in closed form (tiled 16-byte pattern, odd width) — used by the
# image-pair and incremental-phash oracles.
DHASH_SIG0_CTES = """m AS (SELECT doc_id, md5('ppi:' || text) AS h, md5('pxi:' || text) AS hp
           FROM documents),
p AS (SELECT doc_id, hp,
        9 + 2 * (CAST('0x' || substr(h, 1, 2) AS BIGINT) % 60) AS w,
        8 + CAST('0x' || substr(h, 3, 2) AS BIGINT) % 24 AS ht
      FROM m),
cells AS (
  SELECT doc_id, hp, gx.x AS x, gy.y AS y,
         3 * ((y * ht // 8) * w + (x * w // 9)) AS o
  FROM p, (SELECT UNNEST(generate_series(0, 8)) AS x) gx,
       (SELECT UNNEST(generate_series(0, 7)) AS y) gy),
grays AS (
  SELECT doc_id, x, y,
         (CAST('0x' || substr(hp, 2 * ((o) % 16) + 1, 2) AS BIGINT)
        + CAST('0x' || substr(hp, 2 * ((o + 1) % 16) + 1, 2) AS BIGINT)
        + CAST('0x' || substr(hp, 2 * ((o + 2) % 16) + 1, 2) AS BIGINT)) // 3 AS g
  FROM cells),
bits AS (
  SELECT a.doc_id, a.y * 8 + a.x AS i
  FROM grays a JOIN grays b
    ON b.doc_id = a.doc_id AND b.y = a.y AND b.x = a.x + 1
  WHERE a.x < 8 AND b.g > a.g),
sig0 AS (
  SELECT p.doc_id,
         CAST(coalesce(sum(CASE WHEN i = 63 THEN -9223372036854775808
                                ELSE (CAST(1 AS BIGINT) << i) END), 0)
              AS BIGINT) AS dh
  FROM p LEFT JOIN bits ON bits.doc_id = p.doc_id
  GROUP BY p.doc_id)"""


def incremental_phash_sql(max_hamming: int = 3, probe_mod: int = 5) -> str:
    """Twin of the incremental perceptual-dedup probe: every doc_id %
    probe_mod == 0 doc's 2x-upscaled re-encode (arriving under id +
    1,000,000) probed against the banded signature index of ALL base
    images. The upscale's dHash equals the base dHash (floor
    identity — proven on the Spark side by actually resizing), so the
    oracle joins sig0 against itself; banding is pigeonhole-exact at
    4 bands / Hamming 3, so plain Hamming <= h is the same set."""
    return f"""
WITH {DHASH_SIG0_CTES}
SELECT 1000000 + a.doc_id AS id_new, b.doc_id AS id_corpus,
       bit_count(xor(a.dh, b.dh)) AS hamming
FROM sig0 a JOIN sig0 b
  ON a.doc_id % {probe_mod} = 0
 AND 1000000 + a.doc_id <> b.doc_id
 AND bit_count(xor(a.dh, b.dh)) <= {max_hamming}
"""


# Shared CTE chain: per-(document, frame) dHash-64 of the synth_video
# fixture in closed form (per-frame tiled patterns, the
# DHASH_SIG0_CTES cell math keyed by (doc, frame)) — used by the
# video-pair and incremental-video oracles.
VIDEO_SIG0_CTES = """m AS (SELECT doc_id, text, md5('pvd:' || text) AS h FROM documents),
p AS (SELECT doc_id, text,
        2 + CAST('0x' || substr(h, 1, 2) AS BIGINT) % 3 AS nf,
        9 + 2 * (CAST('0x' || substr(h, 3, 2) AS BIGINT) % 60) AS w,
        8 + CAST('0x' || substr(h, 5, 2) AS BIGINT) % 24 AS ht
      FROM m),
fr AS (SELECT doc_id, w, ht, u.k AS k,
              md5('pvf:' || text || ':' || CAST(u.k AS VARCHAR)) AS hp
       FROM p, (SELECT UNNEST(generate_series(0, 3)) AS k) u
       WHERE u.k < nf),
cells AS (
  SELECT doc_id, k, hp, gx.x AS x, gy.y AS y,
         3 * ((y * ht // 8) * w + (x * w // 9)) AS o
  FROM fr, (SELECT UNNEST(generate_series(0, 8)) AS x) gx,
       (SELECT UNNEST(generate_series(0, 7)) AS y) gy),
grays AS (
  SELECT doc_id, k, x, y,
         (CAST('0x' || substr(hp, 2 * ((o) % 16) + 1, 2) AS BIGINT)
        + CAST('0x' || substr(hp, 2 * ((o + 1) % 16) + 1, 2) AS BIGINT)
        + CAST('0x' || substr(hp, 2 * ((o + 2) % 16) + 1, 2) AS BIGINT)) // 3 AS g
  FROM cells),
bits AS (
  SELECT a.doc_id, a.k, a.y * 8 + a.x AS i
  FROM grays a JOIN grays b
    ON b.doc_id = a.doc_id AND b.k = a.k AND b.y = a.y AND b.x = a.x + 1
  WHERE a.x < 8 AND b.g > a.g),
sig0 AS (
  SELECT fr.doc_id, fr.k,
         CAST(coalesce(sum(CASE WHEN i = 63 THEN -9223372036854775808
                                ELSE (CAST(1 AS BIGINT) << i) END), 0)
              AS BIGINT) AS dh
  FROM fr LEFT JOIN bits ON bits.doc_id = fr.doc_id AND bits.k = fr.k
  GROUP BY fr.doc_id, fr.k)"""


def video_pairs_sql(min_frames: int = 2) -> str:
    """Closed-form twin of multimodal.video_frame_dhash +
    video_near_pairs over attach_video_pair payloads: per-frame tiled
    patterns make every frame's dHash stateable from md5 substrings
    (the phash_pairs_sql cell math, keyed by (doc, frame)); the
    2x-upscaled variant hashes identically per frame by the floor
    identity, which the Spark side proves by actually resizing and
    re-demuxing. Candidates are (frame_idx, dh) equality — stated
    directly here, exactly the operator's join key."""
    return f"""
WITH {VIDEO_SIG0_CTES},
sig AS (SELECT 2 * doc_id AS mid, k, dh FROM sig0
        UNION ALL
        SELECT 2 * doc_id + 1 AS mid, k, dh FROM sig0),
matched AS (
  SELECT a.mid AS id_a, b.mid AS id_b, count(*) AS nm
  FROM sig a JOIN sig b ON b.k = a.k AND b.dh = a.dh AND a.mid < b.mid
  GROUP BY 1, 2)
SELECT id_a, id_b, CAST(nm AS BIGINT) AS n_matched
FROM matched WHERE nm >= {min_frames}
"""


def incremental_video_sql(min_frames: int = 2, probe_mod: int = 5) -> str:
    """Twin of the incremental video-dedup probe: every doc_id %
    probe_mod == 0 doc's REAL frame-by-frame 2x upscale arrives as a
    new ingest batch under id + 1,000,000 and is matched against the
    persisted unit index of ALL base containers. Each upscaled
    frame's dHash equals its base frame's (floor identity — proven on
    the Spark side by actually resizing and re-demuxing), so the
    oracle joins sig0 against itself on (frame, dh) — exactly the
    operator's aligned-unit key."""
    return f"""
WITH {VIDEO_SIG0_CTES}
SELECT 1000000 + a.doc_id AS id_new, b.doc_id AS id_corpus,
       CAST(count(*) AS BIGINT) AS n_matched
FROM sig0 a JOIN sig0 b
  ON a.doc_id % {probe_mod} = 0 AND b.k = a.k AND b.dh = a.dh
 AND 1000000 + a.doc_id <> b.doc_id
GROUP BY 1, 2 HAVING count(*) >= {min_frames}
"""


def audio_pairs_sql(min_windows: int = 2) -> str:
    """Closed-form twin of multimodal.audio_envelope +
    audio_near_pairs over attach_wav_pair payloads: each segment is a
    pure +-amp square wave, so the per-window integer RMS is EXACTLY
    the md5-derived segment amplitude — both renders (different
    square-wave periods, different bytes) state the identical
    envelope, which the Spark side proves by actually decoding the
    PCM of both."""
    return f"""
WITH {AUDIO_SEG_CTES},
env AS (SELECT 2 * doc_id AS mid, k, amp FROM seg
        UNION ALL
        SELECT 2 * doc_id + 1 AS mid, k, amp FROM seg),
matched AS (
  SELECT a.mid AS id_a, b.mid AS id_b, count(*) AS nm
  FROM env a JOIN env b ON b.k = a.k AND b.amp = a.amp AND a.mid < b.mid
  GROUP BY 1, 2)
SELECT id_a, id_b, CAST(nm AS BIGINT) AS n_matched
FROM matched WHERE nm >= {min_windows}
"""


# Shared CTE chain: per-(document, window) envelope amplitude of the
# synth_wav_segments fixture in closed form (each segment is a pure
# +-amp square wave, so the per-window integer RMS IS the md5-derived
# segment amplitude) — used by the audio-pair and incremental-audio
# oracles.
AUDIO_SEG_CTES = """m AS (SELECT doc_id, text, md5('wsn:' || text) AS h FROM documents),
p AS (SELECT doc_id, text,
        3 + CAST('0x' || substr(h, 1, 2) AS BIGINT) % 3 AS s
      FROM m),
seg AS (SELECT doc_id, u.k AS k,
        1000 + CAST('0x' || substr(
            md5('wa:' || text || ':' || CAST(u.k AS VARCHAR)), 1, 4)
          AS BIGINT) % 30000 AS amp
        FROM p, (SELECT UNNEST(generate_series(0, 4)) AS k) u
        WHERE u.k < s)"""


def incremental_audio_sql(min_windows: int = 2, probe_mod: int = 5) -> str:
    """Twin of the incremental audio-dedup probe: every doc_id %
    probe_mod == 0 doc is RE-RENDERED with different waveform
    micro-structure (the h2 half-salt), arrives under id + 1,000,000,
    and is matched against the persisted envelope index of ALL base
    renders. Both renders state the identical integer envelope (pure
    square waves — RMS == amp exactly), so the oracle joins seg
    against itself on (window, amp) — exactly the operator's
    aligned-unit key."""
    return f"""
WITH {AUDIO_SEG_CTES}
SELECT 1000000 + a.doc_id AS id_new, b.doc_id AS id_corpus,
       CAST(count(*) AS BIGINT) AS n_matched
FROM seg a JOIN seg b
  ON a.doc_id % {probe_mod} = 0 AND b.k = a.k AND b.amp = a.amp
 AND 1000000 + a.doc_id <> b.doc_id
GROUP BY 1, 2 HAVING count(*) >= {min_windows}
"""


# Record fixture shared by the cross-modal pair oracles: two
# (image, caption) records per doc — rid 2*doc_id = base image +
# verbatim caption; rid 2*doc_id+1 = the REAL 2x re-encode (dHash
# identical by the floor identity) + a PARAPHRASED caption (first
# token dropped — high but non-1.0 Jaccard), except every third doc
# whose variant caption is a genuinely different single token (the
# same-image-different-caption pair that must be KEPT).
CROSS_MODAL_REC_CTE = r"""rec AS (
  SELECT 2 * doc_id AS rid, doc_id, text AS caption FROM documents
  UNION ALL
  SELECT 2 * doc_id + 1 AS rid, doc_id,
         CASE WHEN doc_id % 3 = 0 THEN 'zz' || md5('unrel:' || text)
              ELSE array_to_string(list_slice(
                     string_split_regex(trim(lower(text)), '\s+'),
                     2, 100000000), ' ')
         END AS caption
  FROM documents
)"""


def cross_modal_pair_sql(
    max_hamming: int = 3, threshold: float = 0.5, kept: bool = False
) -> str:
    """Closed-form twin of multimodal.cross_modal_pair_matches /
    cross_modal_pair_dedup over the CROSS_MODAL_REC_CTE fixture: both
    records of a doc share the base image's dHash (the upscale hashes
    identically — proven on the Spark side by actually resizing), so
    the image side is all-pairs Hamming <= max_hamming over sig0
    values; the caption side is exact 3-token-shingle Jaccard over
    the stated captions, computed ONLY for image-near pairs — valid
    because image banding is pigeonhole-complete at the defaults, so
    the joint result set is exactly {hamming <= h AND jaccard >= t}
    regardless of the operator's candidate union."""
    select = (
        "SELECT rid FROM rec WHERE rid NOT IN (SELECT id_b FROM matches)"
        if kept
        else "SELECT id_a, id_b, hamming, jaccard FROM matches"
    )
    return f"""
WITH {DHASH_SIG0_CTES},
{CROSS_MODAL_REC_CTE},
rsig AS (SELECT r.rid, r.caption, s.dh
         FROM rec r JOIN sig0 s ON s.doc_id = r.doc_id),
himg AS (
  SELECT a.rid AS id_a, b.rid AS id_b,
         bit_count(xor(a.dh, b.dh)) AS hamming
  FROM rsig a JOIN rsig b ON a.rid < b.rid
  WHERE bit_count(xor(a.dh, b.dh)) <= {max_hamming}),
toks AS (
  SELECT rid, u.tok AS tok, u.pos AS pos FROM rec,
  (SELECT UNNEST(string_split_regex(trim(lower(caption)), '\\s+')) AS tok,
          generate_subscripts(string_split_regex(trim(lower(caption)), '\\s+'), 1) AS pos) u
),
shing AS (
  SELECT DISTINCT rid, concat_ws(' ', tok,
      lead(tok, 1) OVER (PARTITION BY rid ORDER BY pos),
      lead(tok, 2) OVER (PARTITION BY rid ORDER BY pos)) AS sh
  FROM toks
  QUALIFY lead(tok, 2) OVER (PARTITION BY rid ORDER BY pos) IS NOT NULL
),
sizes AS (SELECT rid, count(*) AS nn FROM shing GROUP BY 1),
inter AS (
  SELECT h.id_a, h.id_b, count(*) AS i
  FROM himg h
  JOIN shing sa ON sa.rid = h.id_a
  JOIN shing sb ON sb.rid = h.id_b AND sb.sh = sa.sh
  GROUP BY 1, 2),
matches AS (
  SELECT h.id_a, h.id_b, h.hamming,
         round(i * 1.0 / (na.nn + nb.nn - i), 6) AS jaccard
  FROM himg h
  JOIN inter ON inter.id_a = h.id_a AND inter.id_b = h.id_b
  JOIN sizes na ON na.rid = h.id_a
  JOIN sizes nb ON nb.rid = h.id_b
  WHERE round(i * 1.0 / (na.nn + nb.nn - i), 6) >= {threshold})
{select}
"""


def audio_quality_sql(clip_thresh: int = 30000) -> str:
    """Closed-form twin of multimodal.audio_quality over synth_wav_q
    payloads: lead silence + pure +-amp square wave + trail silence
    make every metric an integer function of the md5-derived params
    (clipped = active iff amp >= clip_thresh; rms = isqrt of
    amp^2*active//n, exact as floor(sqrt) in the value range; silence
    runs are exactly the pads since amp >= 1000 > the 100
    threshold)."""
    return f"""
WITH m AS (SELECT doc_id, md5('wavq:' || text) AS h FROM documents),
p AS (SELECT doc_id,
        1000 + CAST('0x' || substr(h, 1, 4) AS BIGINT) % 31000 AS amp,
        CASE CAST('0x' || substr(h, 5, 2) AS BIGINT) % 4
          WHEN 0 THEN 8000 WHEN 1 THEN 16000 WHEN 2 THEN 22050
          ELSE 44100 END AS rate,
        200 + CAST('0x' || substr(h, 7, 4) AS BIGINT) % 2000 AS active,
        CAST('0x' || substr(h, 11, 2) AS BIGINT) % 200 AS ld,
        CAST('0x' || substr(h, 13, 2) AS BIGINT) % 200 AS tr
      FROM m),
q AS (SELECT doc_id, amp, rate, active, ld, tr,
             ld + active + tr AS n,
             CASE WHEN amp >= {clip_thresh} THEN active ELSE 0 END AS clipped
      FROM p)
SELECT doc_id AS media_id,
       CAST(n AS BIGINT) AS n_samples,
       CAST(clipped AS BIGINT) AS clipped,
       CAST(1000000 * clipped // n AS BIGINT) AS clip_ppm,
       CAST(floor(sqrt(amp * amp * active // n)) AS BIGINT) AS rms,
       CAST(ld * 1000 // rate AS BIGINT) AS lead_ms,
       CAST(tr * 1000 // rate AS BIGINT) AS trail_ms
FROM q
"""


def emb_ivf_topk_sql(k: int = 5, num_queries: int = 10, nprobe: int = 1) -> str:
    return f"""
WITH {_QUANT_VECS},
labeled AS (SELECT vec_id, label FROM embeddings),
ul AS (SELECT u.vec_id, l.label, u.x, u.i FROM u JOIN labeled l ON l.vec_id = u.vec_id),
csums AS (SELECT label, i, sum(x) AS s FROM ul GROUP BY 1, 2),
cnorm AS (SELECT label, sqrt(sum(s * s)) AS cn FROM csums GROUP BY 1),
qassign AS (
  SELECT qid, label FROM (
    SELECT a.vec_id AS qid, c.label,
           row_number() OVER (
             PARTITION BY a.vec_id
             ORDER BY sum(a.x * c.s) / any_value(cn.cn) DESC, c.label
           ) AS rn
    FROM u a JOIN csums c ON c.i = a.i JOIN cnorm cn ON cn.label = c.label
    WHERE a.vec_id < {num_queries}
    GROUP BY a.vec_id, c.label
  ) WHERE rn <= {nprobe}
),
dots AS (
  SELECT qa.qid, b.vec_id AS cid, sum(a.x * b.x) AS dot
  FROM qassign qa
  JOIN u a ON a.vec_id = qa.qid
  JOIN labeled lb ON lb.label = qa.label AND lb.vec_id != qa.qid
  JOIN u b ON b.vec_id = lb.vec_id AND b.i = a.i
  GROUP BY 1, 2
),
scored AS (
  SELECT qid, cid, dot / (sqrt(na.n2) * sqrt(nb.n2)) AS c
  FROM dots JOIN norms na ON na.vec_id = qid JOIN norms nb ON nb.vec_id = cid
),
ranked AS (
  SELECT qid, cid, c, row_number() OVER (PARTITION BY qid ORDER BY c DESC, cid) AS rank
  FROM scored
)
SELECT qid AS query_id, cid AS neighbor_id, round(c, 6) AS cosine, rank
FROM ranked WHERE rank <= {k}
"""


_LABELED_CENTROIDS = """
csums AS (
  SELECT e.label, u.i, sum(u.x) AS s
  FROM u JOIN embeddings e ON e.vec_id = u.vec_id GROUP BY 1, 2),
cnorm AS (SELECT label, sqrt(sum(s * s)) AS cn FROM csums GROUP BY 1)"""

_ASSIGNED = """
assigned AS (
  SELECT vec_id, label AS cluster FROM (
    SELECT u.vec_id, c.label,
           row_number() OVER (
             PARTITION BY u.vec_id
             ORDER BY sum(u.x * c.s) / any_value(cn.cn) DESC, c.label
           ) AS rn
    FROM u JOIN csums c ON c.i = u.i JOIN cnorm cn ON cn.label = c.label
    GROUP BY u.vec_id, c.label
  ) WHERE rn = 1)"""


def emb_semantic_dedup_sql(threshold: float = 0.35) -> str:
    """SemDeDup twin: nearest-centroid cluster assignment, then the
    within-cluster keep-lowest-id rule at ``threshold``."""
    return f"""
WITH {_QUANT_VECS},
{_LABELED_CENTROIDS},
{_ASSIGNED},
pairdots AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b, sum(ua.x * ub.x) AS dot
  FROM assigned a
  JOIN assigned b ON b.cluster = a.cluster AND a.vec_id < b.vec_id
  JOIN u ua ON ua.vec_id = a.vec_id
  JOIN u ub ON ub.vec_id = b.vec_id AND ub.i = ua.i
  GROUP BY 1, 2
),
dropped AS (
  SELECT DISTINCT id_b
  FROM pairdots
  JOIN norms na ON na.vec_id = id_a
  JOIN norms nb ON nb.vec_id = id_b
  WHERE round(dot / (sqrt(na.n2) * sqrt(nb.n2)), 6) >= {threshold}
)
SELECT a.vec_id, a.cluster, (d.id_b IS NULL) AS kept
FROM assigned a LEFT JOIN dropped d ON d.id_b = a.vec_id
"""


def emb_incremental_semdedup_sql(threshold: float = 0.35) -> str:
    """Incremental SemDeDup twin: centroids come from the CORPUS only
    (vec_id % 5 != 0 — the persisted index), every vector (corpus and
    new) is assigned against them, and a NEW vector (vec_id % 5 = 0)
    drops when its rounded cosine to ANY same-cell corpus member — or
    to a lower-id new vector of the same cell — reaches the threshold.
    Output is the new batch only."""
    return f"""
WITH {_QUANT_VECS},
csums AS (
  SELECT e.label, u.i, sum(u.x) AS s
  FROM u JOIN embeddings e ON e.vec_id = u.vec_id
  WHERE e.vec_id % 5 != 0 GROUP BY 1, 2),
cnorm AS (SELECT label, sqrt(sum(s * s)) AS cn FROM csums GROUP BY 1),
assigned AS (
  SELECT vec_id, label AS cluster FROM (
    SELECT u.vec_id, c.label,
           row_number() OVER (
             PARTITION BY u.vec_id
             ORDER BY sum(u.x * c.s) / any_value(cn.cn) DESC, c.label
           ) AS rn
    FROM u JOIN csums c ON c.i = u.i JOIN cnorm cn ON cn.label = c.label
    GROUP BY u.vec_id, c.label
  ) WHERE rn = 1),
pairdots AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b, sum(ua.x * ub.x) AS dot
  FROM assigned b
  JOIN assigned a ON a.cluster = b.cluster
   AND (a.vec_id % 5 != 0 OR a.vec_id < b.vec_id)
  JOIN u ua ON ua.vec_id = a.vec_id
  JOIN u ub ON ub.vec_id = b.vec_id AND ub.i = ua.i
  WHERE b.vec_id % 5 = 0
  GROUP BY 1, 2
),
dropped AS (
  SELECT DISTINCT id_b
  FROM pairdots
  JOIN norms na ON na.vec_id = id_a
  JOIN norms nb ON nb.vec_id = id_b
  WHERE round(dot / (sqrt(na.n2) * sqrt(nb.n2)), 6) >= {threshold}
)
SELECT a.vec_id, a.cluster, (d.id_b IS NULL) AS kept
FROM assigned a LEFT JOIN dropped d ON d.id_b = a.vec_id
WHERE a.vec_id % 5 = 0
"""


def emb_prototypes_sql(top: int = 10) -> str:
    """Prototype-rank twin: cosine of each vector to its OWN label
    centroid, ranked within the label (desc, tie → smaller id)."""
    return f"""
WITH {_QUANT_VECS},
{_LABELED_CENTROIDS},
owndots AS (
  SELECT e.label, u.vec_id, sum(u.x * c.s) AS dot
  FROM u
  JOIN embeddings e ON e.vec_id = u.vec_id
  JOIN csums c ON c.label = e.label AND c.i = u.i
  GROUP BY 1, 2
),
scored AS (
  SELECT o.label, o.vec_id, o.dot / (sqrt(n.n2) * cn.cn) AS c
  FROM owndots o
  JOIN norms n ON n.vec_id = o.vec_id
  JOIN cnorm cn ON cn.label = o.label
),
ranked AS (
  SELECT label, vec_id, c,
         row_number() OVER (PARTITION BY label ORDER BY c DESC, vec_id) AS proto_rank
  FROM scored
)
SELECT label, vec_id, proto_rank, round(c, 6) AS cosine
FROM ranked WHERE proto_rank <= {top}
"""


def emb_knn_classify_sql(k: int = 5, num_queries: int = 10) -> str:
    """k-NN majority-vote twin: queries are vec_id < num_queries, the
    corpus is everything else; vote tie → smaller label."""
    return f"""
WITH {_QUANT_VECS},
dots AS (
  SELECT a.vec_id AS qid, b.vec_id AS cid, sum(a.x * b.x) AS dot
  FROM u a JOIN u b ON b.i = a.i AND b.vec_id >= {num_queries}
  WHERE a.vec_id < {num_queries}
  GROUP BY 1, 2
),
scored AS (
  SELECT qid, cid, dot / (sqrt(na.n2) * sqrt(nb.n2)) AS c
  FROM dots JOIN norms na ON na.vec_id = qid JOIN norms nb ON nb.vec_id = cid
),
ranked AS (
  SELECT qid, cid, row_number() OVER (PARTITION BY qid ORDER BY c DESC, cid) AS rank
  FROM scored
),
votes AS (
  SELECT r.qid, e.label, count(*) AS votes
  FROM ranked r JOIN embeddings e ON e.vec_id = r.cid
  WHERE r.rank <= {k}
  GROUP BY 1, 2
)
SELECT qid AS query_id, label AS predicted_label, votes FROM (
  SELECT qid, label, votes,
         row_number() OVER (PARTITION BY qid ORDER BY votes DESC, label) AS rn
  FROM votes
) WHERE rn = 1
"""


def doc_chunk_dedup_sql(chunk_words: int = 10) -> str:
    """Chunk-dedup twin: fixed token windows, corpus-global keep-first
    by (doc_id, chunk_idx), in-order reassembly of survivors."""
    return f"""
WITH words AS (
  SELECT doc_id,
         UNNEST(string_split_regex(trim(lower(text)), '\\s+')) AS w,
         generate_subscripts(string_split_regex(trim(lower(text)), '\\s+'), 1) AS i
  FROM documents
),
chunks AS (
  SELECT doc_id, CAST(floor((i - 1) / {chunk_words}) AS INT) AS chunk_idx,
         string_agg(w, ' ' ORDER BY i) AS chunk
  FROM words GROUP BY 1, 2
),
kept AS (
  SELECT doc_id, chunk_idx, chunk FROM (
    SELECT doc_id, chunk_idx, chunk,
           row_number() OVER (PARTITION BY chunk ORDER BY doc_id, chunk_idx) AS rn
    FROM chunks
  ) WHERE rn = 1
),
per_doc AS (
  SELECT doc_id, count(*) AS kept_chunks,
         string_agg(chunk, ' ' ORDER BY chunk_idx) AS clean_text
  FROM kept GROUP BY 1
),
totals AS (SELECT doc_id, count(*) AS n_chunks FROM chunks GROUP BY 1)
SELECT t.doc_id, t.n_chunks,
       COALESCE(p.kept_chunks, 0) AS kept_chunks,
       COALESCE(p.clean_text, '') AS clean_text
FROM totals t LEFT JOIN per_doc p ON p.doc_id = t.doc_id
"""


def _kmeans_ctes(k: int = 8, iters: int = 2) -> str:
    """CTE body for the Lloyd k-means twin (kmeans_cosine):
    deterministic residue-class seeding, integer centroid SUMS
    (cosine is scale-invariant), one csums/cnorm/assigned triple per
    assignment pass; final assignment is ``assigned{iters-1}``.
    Expects the ``u`` CTE from ``_QUANT_VECS`` in scope."""
    body = [
        f"""ids AS (SELECT DISTINCT vec_id FROM u),
seeds AS (
  SELECT vec_id % {k} AS label, vec_id FROM (
    SELECT vec_id, row_number() OVER (PARTITION BY vec_id % {k} ORDER BY vec_id) AS rn
    FROM ids) WHERE rn = 1),
csums0 AS (
  SELECT s.label, u.i, u.x AS s FROM seeds s JOIN u ON u.vec_id = s.vec_id),
cnorm0 AS (SELECT label, sqrt(sum(s * s)) AS cn FROM csums0 GROUP BY 1),
assigned0 AS (
  SELECT vec_id, label AS cluster FROM (
    SELECT u.vec_id, c.label,
           row_number() OVER (
             PARTITION BY u.vec_id
             ORDER BY sum(u.x * c.s) / any_value(cn.cn) DESC, c.label) AS rn
    FROM u JOIN csums0 c ON c.i = u.i JOIN cnorm0 cn ON cn.label = c.label
    GROUP BY u.vec_id, c.label) WHERE rn = 1)"""
    ]
    for t in range(1, iters):
        body.append(
            f""",
csums{t} AS (
  SELECT a.cluster AS label, u.i, sum(u.x) AS s
  FROM assigned{t - 1} a JOIN u ON u.vec_id = a.vec_id GROUP BY 1, 2),
cnorm{t} AS (SELECT label, sqrt(sum(s * s)) AS cn FROM csums{t} GROUP BY 1),
assigned{t} AS (
  SELECT vec_id, label AS cluster FROM (
    SELECT u.vec_id, c.label,
           row_number() OVER (
             PARTITION BY u.vec_id
             ORDER BY sum(u.x * c.s) / any_value(cn.cn) DESC, c.label) AS rn
    FROM u JOIN csums{t} c ON c.i = u.i JOIN cnorm{t} cn ON cn.label = c.label
    GROUP BY u.vec_id, c.label) WHERE rn = 1)"""
        )
    return "".join(body)


def emb_kmeans_sql(k: int = 8, iters: int = 2) -> str:
    return (
        f"WITH {_QUANT_VECS},\n"
        + _kmeans_ctes(k, iters)
        + f"\nSELECT vec_id, cluster FROM assigned{iters - 1}"
    )


def emb_ivf_trained_sql(
    k: int = 5, num_queries: int = 10, nprobe: int = 1, cells: int = 8, iters: int = 2
) -> str:
    """IVF search over the TRAINED quantizer: the k-means CTEs supply
    the cell assignment (``labeled``); centroid sums for query routing
    derive from the FINAL assignment (exactly what Spark's
    label_centroid_sums recomputes from the cluster-labeled corpus)."""
    return f"""
WITH {_QUANT_VECS},
{_kmeans_ctes(cells, iters)},
labeled AS (SELECT vec_id, cluster AS label FROM assigned{iters - 1}),
csumsf AS (
  SELECT l.label, u.i, sum(u.x) AS s
  FROM u JOIN labeled l ON l.vec_id = u.vec_id GROUP BY 1, 2),
cnormf AS (SELECT label, sqrt(sum(s * s)) AS cn FROM csumsf GROUP BY 1),
qassign AS (
  SELECT qid, label FROM (
    SELECT a.vec_id AS qid, c.label,
           row_number() OVER (
             PARTITION BY a.vec_id
             ORDER BY sum(a.x * c.s) / any_value(cn.cn) DESC, c.label
           ) AS rn
    FROM u a JOIN csumsf c ON c.i = a.i JOIN cnormf cn ON cn.label = c.label
    WHERE a.vec_id < {num_queries}
    GROUP BY a.vec_id, c.label
  ) WHERE rn <= {nprobe}
),
dots AS (
  SELECT qa.qid, b.vec_id AS cid, sum(a.x * b.x) AS dot
  FROM qassign qa
  JOIN u a ON a.vec_id = qa.qid
  JOIN labeled lb ON lb.label = qa.label AND lb.vec_id != qa.qid
  JOIN u b ON b.vec_id = lb.vec_id AND b.i = a.i
  GROUP BY 1, 2
),
scored AS (
  SELECT qid, cid, dot / (sqrt(na.n2) * sqrt(nb.n2)) AS c
  FROM dots JOIN norms na ON na.vec_id = qid JOIN norms nb ON nb.vec_id = cid
),
ranked AS (
  SELECT qid, cid, c, row_number() OVER (PARTITION BY qid ORDER BY c DESC, cid) AS rank
  FROM scored
)
SELECT qid AS query_id, cid AS neighbor_id, round(c, 6) AS cosine, rank
FROM ranked WHERE rank <= {k}
"""


# ------------------------------------------------ span-level dedup ---

_SPAN_TOKS = r"""
toks AS (
  SELECT doc_id, u.tok AS tok, u.pos AS pos FROM documents,
  (SELECT UNNEST(string_split_regex(trim(lower(text)), '\s+')) AS tok,
          generate_subscripts(string_split_regex(trim(lower(text)), '\s+'), 1) AS pos) u
)"""


def _span_flag_ctes(k: int, min_count: int, keep_first: bool = False) -> str:
    """CTE chain up to ``fl`` (doc_id, 0-based flagged window starts)
    for the span-dedup twins: positional k-grams via k-1 leads, the
    repeated set by exact-string GROUP BY (the Spark side groups the
    xxhash64 of the same string — identical flag set absent a 64-bit
    collision), flags by semi join. ``keep_first`` exempts each
    duplicated k-gram's first occurrence by (doc, position) — the
    row_number twin of Spark's min-struct-per-hash-group."""
    leads = ", ".join(f"lead(tok,{j}) OVER w" for j in range(1, k))
    if keep_first:
        fl = """ranked AS (
  SELECT v.doc_id, v.start,
         row_number() OVER (PARTITION BY v.g ORDER BY v.doc_id, v.start) AS rn
  FROM valid v JOIN rep USING (g)),
fl AS (SELECT doc_id, start FROM ranked WHERE rn > 1),
canon AS (SELECT doc_id, start FROM ranked WHERE rn = 1)"""
    else:
        fl = "fl AS (SELECT v.doc_id, v.start FROM valid v JOIN rep USING (g))"
    return f"""{_SPAN_TOKS},
kg AS (
  SELECT doc_id, pos - 1 AS start,
         concat_ws(' ', tok, {leads}) AS g,
         lead(tok,{k - 1}) OVER w AS lastt
  FROM toks WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
),
valid AS (SELECT doc_id, start, g FROM kg WHERE lastt IS NOT NULL),
rep AS (SELECT g FROM valid GROUP BY g HAVING count(*) >= {min_count}),
{fl}"""


def _span_island_sql(k: int) -> str:
    """Shared gaps-and-islands merge over the ``fl`` CTE + final
    interval select — ONE SQL copy, mirroring dedup._merge_flagged_spans
    (the batch and incremental twins change together, by construction)."""
    return f"""pe AS (
  SELECT doc_id, start,
         max(start) OVER (PARTITION BY doc_id ORDER BY start
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) + {k} AS prev_end
  FROM fl),
isl AS (
  SELECT doc_id, start,
         sum(CASE WHEN prev_end IS NULL OR start > prev_end THEN 1 ELSE 0 END)
           OVER (PARTITION BY doc_id ORDER BY start) AS island
  FROM pe)
SELECT doc_id, CAST(min(start) AS BIGINT) AS span_start,
       CAST(max(start) + {k} AS BIGINT) AS span_end,
       CAST(max(start) + {k} - min(start) AS BIGINT) AS span_len
FROM isl GROUP BY doc_id, island"""


def span_dedup_sql(k: int = 8, min_count: int = 2) -> str:
    """Twin of dedup.repeated_spans: merged maximal duplicated-span
    intervals via the gaps-and-islands pattern (island break when a
    flagged start exceeds the running max end of earlier windows)."""
    return f"""
WITH {_span_flag_ctes(k, min_count)},
{_span_island_sql(k)}
"""


def span_strip_sql(k: int = 8, min_count: int = 2, keep_first: bool = False) -> str:
    """Twin of dedup.strip_repeated_spans: a token survives iff no
    flagged window covers it; clean_text reassembles survivors in
    position order ('' when nothing survives, so every document
    keeps its row). ``keep_first`` mirrors the ExactSubstr variant,
    INCLUDING canonical-window protection: a token inside a canonical
    window survives even when an overlapping flagged window covers it
    (without this, the canonical copy itself could be stripped and a
    duplicated k-gram would keep zero intact copies corpus-wide)."""
    protect = (
        f"""
                     AND NOT EXISTS (SELECT 1 FROM canon c WHERE c.doc_id = t.doc_id
                                     AND t.pos - 1 >= c.start AND t.pos - 1 < c.start + {k})"""
        if keep_first
        else ""
    )
    return f"""
WITH {_span_flag_ctes(k, min_count, keep_first)},
kept AS (
  SELECT t.doc_id, t.pos, t.tok FROM toks t
  WHERE NOT (EXISTS (SELECT 1 FROM fl f WHERE f.doc_id = t.doc_id
                     AND t.pos - 1 >= f.start AND t.pos - 1 < f.start + {k}){protect})),
agg AS (
  SELECT doc_id, count(*) AS n_kept,
         string_agg(tok, ' ' ORDER BY pos) AS clean_text
  FROM kept GROUP BY 1),
nt AS (SELECT doc_id, count(*) AS n_tokens FROM toks GROUP BY 1)
SELECT nt.doc_id, CAST(nt.n_tokens AS BIGINT) AS n_tokens,
       CAST(nt.n_tokens - COALESCE(a.n_kept, 0) AS BIGINT) AS n_removed,
       COALESCE(a.clean_text, '') AS clean_text
FROM nt LEFT JOIN agg a USING (doc_id)
"""


def emb_ivf_recall_sql(
    k: int = 5, num_queries: int = 10, nprobe: int = 1, cells: int = 8, iters: int = 2
) -> str:
    """Recall@k of IVF-over-TRAINED-cells vs exact quantized cosine —
    emb_pq_recall's probe/agg shape over emb_ivf_trained_sql's CTE
    stack plus the exact ranking from emb_topk_sql (both integer
    tiers, so the instrumentation row itself hash-matches)."""
    return f"""
WITH {_QUANT_VECS},
{_kmeans_ctes(cells, iters)},
labeled AS (SELECT vec_id, cluster AS label FROM assigned{iters - 1}),
csumsf AS (
  SELECT l.label, u.i, sum(u.x) AS s
  FROM u JOIN labeled l ON l.vec_id = u.vec_id GROUP BY 1, 2),
cnormf AS (SELECT label, sqrt(sum(s * s)) AS cn FROM csumsf GROUP BY 1),
qassign AS (
  SELECT qid, label FROM (
    SELECT a.vec_id AS qid, c.label,
           row_number() OVER (
             PARTITION BY a.vec_id
             ORDER BY sum(a.x * c.s) / any_value(cn.cn) DESC, c.label
           ) AS rn
    FROM u a JOIN csumsf c ON c.i = a.i JOIN cnormf cn ON cn.label = c.label
    WHERE a.vec_id < {num_queries}
    GROUP BY a.vec_id, c.label
  ) WHERE rn <= {nprobe}
),
idots AS (
  SELECT qa.qid, b.vec_id AS cid, sum(a.x * b.x) AS dot
  FROM qassign qa
  JOIN u a ON a.vec_id = qa.qid
  JOIN labeled lb ON lb.label = qa.label AND lb.vec_id != qa.qid
  JOIN u b ON b.vec_id = lb.vec_id AND b.i = a.i
  GROUP BY 1, 2
),
approx AS (
  SELECT qid, cid FROM (
    SELECT qid, cid,
           row_number() OVER (
             PARTITION BY qid
             ORDER BY dot / (sqrt(na.n2) * sqrt(nb.n2)) DESC, cid) AS rank
    FROM idots JOIN norms na ON na.vec_id = qid JOIN norms nb ON nb.vec_id = cid
  ) WHERE rank <= {k}
),
edots AS (
  SELECT a.vec_id AS qid, b.vec_id AS cid, sum(a.x * b.x) AS dot
  FROM u a JOIN u b ON a.i = b.i AND a.vec_id != b.vec_id
  WHERE a.vec_id < {num_queries}
  GROUP BY 1, 2
),
exact AS (
  SELECT qid, cid FROM (
    SELECT qid, cid,
           row_number() OVER (
             PARTITION BY qid
             ORDER BY dot / (sqrt(na.n2) * sqrt(nb.n2)) DESC, cid) AS rank
    FROM edots JOIN norms na ON na.vec_id = qid JOIN norms nb ON nb.vec_id = cid
  ) WHERE rank <= {k}
),
probe AS (
  SELECT e.qid, e.cid, p.cid AS hit
  FROM exact e LEFT JOIN approx p ON p.qid = e.qid AND p.cid = e.cid
)
SELECT {k} AS k,
       CAST(count(*) / {k} AS BIGINT) AS n_queries,
       count(hit) AS hits,
       round(count(hit) / count(*), 4) AS recall
FROM probe
"""


def incremental_span_sql(k: int = 8, new_mod: int = 5, batch_mod: int | None = None) -> str:
    """Twin of dedup.incremental_repeated_spans over the documents
    table with the corpus/new split ``doc_id % new_mod`` (== 0 → new
    batch, != 0 → indexed corpus, same convention as
    incremental_neardup_sql): the index is the corpus's DISTINCT
    k-gram set; batch windows flag by membership; islands merge as in
    span_dedup_sql. ``batch_mod`` (round-10) narrows the BATCH to
    ``doc_id % batch_mod == 0`` while the index keeps the new_mod
    split — valid whenever new_mod divides batch_mod, the
    small-ingest-batch regime the Bloom-sidecar probe is built for."""
    bm = batch_mod or new_mod
    if bm % new_mod:
        raise ValueError(f"batch_mod {bm} must be a multiple of new_mod {new_mod}")
    leads = ", ".join(f"lead(tok,{j}) OVER w" for j in range(1, k))
    return f"""
WITH {_SPAN_TOKS},
kg AS (
  SELECT doc_id, pos - 1 AS start,
         concat_ws(' ', tok, {leads}) AS g,
         lead(tok,{k - 1}) OVER w AS lastt
  FROM toks WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
),
valid AS (SELECT doc_id, start, g FROM kg WHERE lastt IS NOT NULL),
idx AS (SELECT DISTINCT g FROM valid WHERE doc_id % {new_mod} != 0),
fl AS (
  SELECT v.doc_id, v.start FROM valid v JOIN idx USING (g)
  WHERE v.doc_id % {bm} = 0),
{_span_island_sql(k)}
"""


def dsir_sql(
    buckets: int = 4096, target_mod: int = 20, salt: str = "dsir", bigrams: bool = False
) -> str:
    r"""Twin of sampling.dsir_logratio_weights with target = doc_id %
    target_mod == 0: identical hashed buckets (md5 prefix, the
    sampling-module idiom), add-one multinomials with the exact same
    double-division order, ln on bit-identical arguments (DuckDB and
    CPython share libm; the Spark side computes these logs driver-side
    in Python for precisely this reason), nano-quantized weights, and
    an exact integer weighted sum per document. ``bigrams`` switches
    to the paper's unigram+bigram feature set (column n_feats)."""
    n_col = "n_feats" if bigrams else "n_tokens"
    feat_cte = (
        """,
feats AS (
  SELECT doc_id, tok FROM toks
  UNION ALL
  SELECT doc_id,
         concat_ws(' ', tok, lead(tok) OVER (PARTITION BY doc_id ORDER BY pos)) AS tok
  FROM toks
  QUALIFY lead(tok) OVER (PARTITION BY doc_id ORDER BY pos) IS NOT NULL
)"""
        if bigrams
        else ",\nfeats AS (SELECT doc_id, tok FROM toks)"
    )
    return rf"""
WITH toks AS (
  SELECT doc_id, u.tok AS tok, u.pos AS pos FROM documents,
  (SELECT UNNEST(string_split_regex(trim(lower(text)), '\s+')) AS tok,
          generate_subscripts(string_split_regex(trim(lower(text)), '\s+'), 1) AS pos) u
){feat_cte},
b AS (
  SELECT doc_id,
         CAST('0x' || substr(md5('{salt}:' || tok), 1, 8) AS BIGINT) % {buckets} AS bucket
  FROM feats
),
tc AS (SELECT bucket, count(*) AS c FROM b WHERE doc_id % {target_mod} = 0 GROUP BY 1),
cc AS (SELECT bucket, count(*) AS c FROM b WHERE doc_id % {target_mod} <> 0 GROUP BY 1),
tot AS (SELECT
  (SELECT count(*) FROM b WHERE doc_id % {target_mod} = 0) AS dt,
  (SELECT count(*) FROM b WHERE doc_id % {target_mod} <> 0) AS dc),
w AS (
  SELECT g.bucket,
         CAST(round(ln(
            (CAST(COALESCE(tc.c, 0) + 1 AS DOUBLE) / (tot.dt + {buckets}))
            / (CAST(COALESCE(cc.c, 0) + 1 AS DOUBLE) / (tot.dc + {buckets}))
         ) * 1e9) AS BIGINT) AS wq
  FROM (SELECT UNNEST(generate_series(0, {buckets - 1})) AS bucket) g
  CROSS JOIN tot
  LEFT JOIN tc ON tc.bucket = g.bucket
  LEFT JOIN cc ON cc.bucket = g.bucket
)
SELECT b.doc_id, CAST(count(*) AS BIGINT) AS {n_col},
       round(CAST(sum(w.wq) AS DOUBLE) / 1e9, 6) AS dsir_logratio
FROM b JOIN w ON w.bucket = b.bucket
WHERE b.doc_id % {target_mod} <> 0
GROUP BY 1
"""


def dsir_sample_sql(
    n: int = 100,
    buckets: int = 4096,
    target_mod: int = 20,
    salt: str = "dsir",
    noise_salt: str = "gumbel",
    bigrams: bool = False,
) -> str:
    """Twin of sampling.dsir_resample: dsir_sql's weights, per-doc
    Gumbel noise from the md5-hash uniform u = (2h+1)/2^53, BOTH ln's
    via detmath's shared expression text (bit-identical on the two
    engines by construction — only IEEE +,-,*,/ and comparisons), and
    the top-n by logweight + noise with doc_id tie-break."""
    from orestes_spark import detmath
    from orestes_spark.operators.sampling import hash_u53_sql

    n_col = "n_feats" if bigrams else "n_tokens"
    weights = dsir_sql(buckets, target_mod, salt, bigrams)
    noise_in = (
        "SELECT *, "
        + hash_u53_sql("doc_id", noise_salt)
        + " AS _u FROM ("
        + weights
        + ")"
    )
    stepped = detmath.wrap_steps_sql(noise_in, detmath.gumbel_steps("_u", "_g"))
    return f"""
SELECT doc_id, {n_col}, dsir_logratio,
       round(dsir_logratio + _g, 6) AS gumbel_key
FROM {stepped}
ORDER BY dsir_logratio + _g DESC, doc_id
LIMIT {n}
"""


def quality_model_sql(
    buckets: int = 4096, seed_mod: int = 3, salt: str = "qm"
) -> str:
    r"""Twin of text.quality_model_scores with the fixture seed:
    labeled docs = doc_id % seed_mod == 0, label = (lang = 'en') —
    the reference-vs-crawl stand-in this synthetic corpus supports.
    Identical hashed buckets (md5 prefix), add-one multinomials with
    the dsir_sql double-division order, ln on bit-identical arguments
    (shared libm), nano-quantized weights + prior, and an exact
    integer per-doc sum; keep decided on the INTEGER total."""
    return rf"""
WITH toks AS (
  SELECT doc_id, u.tok AS tok FROM documents,
  (SELECT UNNEST(string_split_regex(trim(lower(text)), '\s+')) AS tok) u
),
b AS (
  SELECT doc_id,
         CAST('0x' || substr(md5('{salt}:' || tok), 1, 8) AS BIGINT) % {buckets} AS bucket
  FROM toks
),
seed AS (SELECT doc_id, lang = 'en' AS label FROM documents WHERE doc_id % {seed_mod} = 0),
pc AS (SELECT bucket, count(*) AS c FROM b JOIN seed USING (doc_id) WHERE label GROUP BY 1),
nc AS (SELECT bucket, count(*) AS c FROM b JOIN seed USING (doc_id) WHERE NOT label GROUP BY 1),
tot AS (SELECT
  (SELECT count(*) FROM b JOIN seed USING (doc_id) WHERE label) AS dp,
  (SELECT count(*) FROM b JOIN seed USING (doc_id) WHERE NOT label) AS dn,
  (SELECT count(*) FROM seed WHERE label) AS np,
  (SELECT count(*) FROM seed WHERE NOT label) AS nn),
w AS (
  SELECT g.bucket,
         CAST(round(ln(
            (CAST(COALESCE(pc.c, 0) + 1 AS DOUBLE) / (tot.dp + {buckets}))
            / (CAST(COALESCE(nc.c, 0) + 1 AS DOUBLE) / (tot.dn + {buckets}))
         ) * 1e9) AS BIGINT) AS wq
  FROM (SELECT UNNEST(generate_series(0, {buckets - 1})) AS bucket) g
  CROSS JOIN tot
  LEFT JOIN pc ON pc.bucket = g.bucket
  LEFT JOIN nc ON nc.bucket = g.bucket
),
prior AS (
  SELECT CAST(round(ln(CAST(np + 1 AS DOUBLE) / (nn + 1)) * 1e9) AS BIGINT) AS pq
  FROM tot),
per AS (
  SELECT b.doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
         CAST(sum(w.wq) AS BIGINT) AS s
  FROM b JOIN w ON w.bucket = b.bucket GROUP BY 1)
-- LEFT JOIN: every doc gets a verdict; a doc with no feature rows
-- (NULL text) scores prior-only, mirroring score_quality_model
SELECT d.doc_id,
       CAST(coalesce(per.n_tokens, 0) AS BIGINT) AS n_tokens,
       round(CAST(prior.pq + coalesce(per.s, 0) AS DOUBLE) / 1e9, 6) AS nb_logodds,
       prior.pq + coalesce(per.s, 0) >= 0 AS keep
FROM documents d LEFT JOIN per ON per.doc_id = d.doc_id CROSS JOIN prior
"""


def quality_model_eval_sql(seed_mod: int = 3) -> str:
    """Twin of text.quality_model_eval over the fixture seed: embeds
    quality_model_sql verbatim as a scoped CTE (the
    doc_quality_report nesting precedent), joins verdicts back to the
    labels, and reduces to the one-row confusion matrix + half-away-
    rounded ratios (NULL on a zero denominator, both engines)."""
    base = quality_model_sql(seed_mod=seed_mod)

    def ratio(num: str, den: str) -> str:
        return (
            f"CASE WHEN ({den}) = 0 THEN NULL ELSE"
            f" CAST((2 * ({num}) * 1000000 + ({den})) // (2 * ({den})) AS DOUBLE)"
            " / 1e6 END"
        )

    return f"""
WITH q AS ({base}),
lab AS (SELECT doc_id, lang = 'en' AS label FROM documents WHERE doc_id % {seed_mod} = 0),
j AS (SELECT q.keep, lab.label FROM lab JOIN q ON q.doc_id = lab.doc_id),
cm AS (SELECT
  count(*) AS n_labeled,
  sum(CASE WHEN keep AND label THEN 1 ELSE 0 END) AS tp,
  sum(CASE WHEN keep AND NOT label THEN 1 ELSE 0 END) AS fp,
  sum(CASE WHEN NOT keep AND label THEN 1 ELSE 0 END) AS fn,
  sum(CASE WHEN NOT keep AND NOT label THEN 1 ELSE 0 END) AS tn
FROM j)
SELECT CAST(n_labeled AS BIGINT) AS n_labeled,
       CAST(tp AS BIGINT) AS tp, CAST(fp AS BIGINT) AS fp,
       CAST(fn AS BIGINT) AS fn, CAST(tn AS BIGINT) AS tn,
       {ratio('tp', 'tp + fp')} AS precision,
       {ratio('tp', 'tp + fn')} AS recall,
       {ratio('tp + tn', 'n_labeled')} AS accuracy
FROM cm
"""


def bpe_trained_sql(num_merges: int = 12) -> str:
    r"""Twin of text.train_bpe + bpe_segment_counts: the SAME training
    loop unrolled as ``num_merges`` generated CTE rounds — per round,
    exploded adjacent symbol pairs over the word-type table, integer
    argmax with (count DESC, left, right) binary-order tie-break, and
    the merge applied with ``replace`` on the space-padded symbol
    string (DuckDB's replace and Spark's StringReplace share
    left-to-right non-overlapping scan-past-the-replacement
    semantics, so the segmentations agree everywhere, including
    inside symbol runs)."""
    rounds = []
    for n in range(num_merges):
        rounds.append(
            f""",
p{n} AS (
  SELECT list_extract(t, u.i) AS l, list_extract(t, u.i + 1) AS r,
         CAST(sum(cnt) AS BIGINT) AS c
  FROM (SELECT cnt, string_split(trim(s), ' ') AS t FROM t{n}),
       UNNEST(range(1, len(t))) AS u(i)
  GROUP BY 1, 2 ORDER BY c DESC, l, r LIMIT 1
),
t{n + 1} AS (
  SELECT w, cnt, replace(s, ' ' || l || ' ' || r || ' ', ' ' || l || r || ' ') AS s
  FROM t{n} CROSS JOIN p{n}
)"""
        )
    return rf"""
WITH words AS (
  SELECT doc_id, u.tok AS w FROM documents,
  (SELECT UNNEST(string_split_regex(trim(lower(text)), '\s+')) AS tok) u
  WHERE u.tok <> ''
),
t0 AS (
  SELECT w, CAST(count(*) AS BIGINT) AS cnt,
         ' ' || regexp_replace(w, '(.)', '\1 ', 'g') AS s
  FROM words GROUP BY 1
){''.join(rounds)},
seg AS (
  SELECT w, len(string_split(trim(s), ' ')) AS nsym FROM t{num_merges}
)
SELECT words.doc_id, CAST(count(*) AS BIGINT) AS n_words,
       CAST(sum(seg.nsym) AS BIGINT) AS n_bpe_tokens
FROM words JOIN seg USING (w)
GROUP BY 1
"""


def token_entropy_sql() -> str:
    r"""Twin of text.token_entropy: identical tokenization, detmath's
    shared ln expression text on per-type counts and on n, per-type
    terms quantized floor(x*1e9 + 0.5) and integer-summed (float-sum
    order never crosses engines), one rounded display step."""
    from orestes_spark import detmath

    tc = r"""SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS c,
       CAST(count(*) AS DOUBLE) AS cd
FROM (SELECT doc_id, u.tok AS tok FROM documents,
      (SELECT UNNEST(string_split_regex(trim(lower(text)), '\s+')) AS tok) u)
GROUP BY 1, 2"""
    lnc = detmath.wrap_steps_sql(tc, detmath.detln_steps("cd", "lnc"))
    agg = f"""SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
       CAST(count(*) AS BIGINT) AS n_types,
       CAST(sum(CAST(floor(cd * lnc * 1e9 + 0.5) AS BIGINT)) AS BIGINT) AS _s,
       CAST(sum(c) AS DOUBLE) AS nd
FROM {lnc} GROUP BY 1"""
    lnn = detmath.wrap_steps_sql(agg, detmath.detln_steps("nd", "lnn"))
    return f"""
SELECT doc_id, n_tokens, n_types,
       round(lnn - (CAST(_s AS DOUBLE) / 1e9) / nd, 6) AS entropy
FROM {lnn}
"""


def emb_decontaminate_sql(threshold: float = 0.3, eval_mod: int = 97) -> str:
    """Twin of similarity.semantic_decontaminate with eval =
    vec_id % eval_mod == 0: integer-quantized dots, full-precision
    cosine rank with eval-id tie-break, rounded threshold and
    display — the emb-family determinism recipe."""
    return f"""
WITH {_QUANT_VECS},
dots AS (
  SELECT a.vec_id AS cid, b.vec_id AS qid, sum(a.x * b.x) AS dot
  FROM u a JOIN u b ON a.i = b.i
  WHERE b.vec_id % {eval_mod} = 0 AND a.vec_id % {eval_mod} <> 0
  GROUP BY 1, 2
),
scored AS (
  SELECT cid, qid, dot / (sqrt(na.n2) * sqrt(nb.n2)) AS c
  FROM dots JOIN norms na ON na.vec_id = cid JOIN norms nb ON nb.vec_id = qid
  WHERE round(dot / (sqrt(na.n2) * sqrt(nb.n2)), 6) >= {threshold}
),
ranked AS (
  SELECT cid, qid, c,
         row_number() OVER (PARTITION BY cid ORDER BY c DESC, qid) AS rank,
         count(*) OVER (PARTITION BY cid) AS n
  FROM scored
)
SELECT cid AS vec_id, CAST(n AS BIGINT) AS n_eval_hits, qid AS eval_id,
       round(c, 6) AS cosine
FROM ranked WHERE rank = 1
"""


def decontam_report_sql(n: int = 4, mod: int = 20, threshold: float = 0.3) -> str:
    """Twin of the composed per-document decontamination report: the
    three leak-scan modality oracles embedded verbatim as scoped CTEs
    (the doc_quality_report nesting precedent) under ONE eval
    convention (id % mod == 0), left-joined onto the corpus ids — any
    drift in a component oracle drifts this one with it, which is the
    point: the report certifies the COMPOSITION."""
    vb = rf"""
WITH needles AS (
  SELECT doc_id AS eval_id,
         array_to_string(list_slice(string_split_regex(trim(text), '\s+'), 1, 3), ' ')
           AS needle
  FROM documents WHERE doc_id % {mod} = 0
),
valid AS (SELECT * FROM needles WHERE len(needle) >= 9)
SELECT d.doc_id, count(*) AS n_eval_hits, min(n.eval_id) AS first_eval_id
FROM documents d JOIN valid n ON contains(d.text, n.needle)
WHERE d.doc_id % {mod} <> 0
GROUP BY 1"""
    return f"""
WITH ov AS ({decontaminate_sql(n, mod)}),
vb AS ({vb}),
em AS ({emb_decontaminate_sql(threshold, mod)}),
corpus AS (SELECT doc_id FROM documents WHERE doc_id % {mod} <> 0)
SELECT c.doc_id,
       CAST(coalesce(ov.n_overlap, 0) AS BIGINT) AS n_overlap,
       CAST(coalesce(vb.n_eval_hits, 0) AS BIGINT) AS n_verbatim,
       vb.first_eval_id AS verbatim_eval_id,
       CAST(coalesce(em.n_eval_hits, 0) AS BIGINT) AS n_emb_hits,
       em.eval_id AS emb_eval_id,
       em.cosine AS best_cosine,
       (coalesce(ov.n_overlap, 0) > 0 OR coalesce(vb.n_eval_hits, 0) > 0
        OR coalesce(em.n_eval_hits, 0) > 0) AS flagged
FROM corpus c
LEFT JOIN ov ON ov.doc_id = c.doc_id
LEFT JOIN vb ON vb.doc_id = c.doc_id
LEFT JOIN em ON em.vec_id = c.doc_id
"""


def emb_decontam_ivf_sql(
    threshold: float = 0.3,
    eval_mod: int = 97,
    nprobe: int = 2,
    cells: int = 8,
    iters: int = 2,
) -> str:
    """Twin of similarity.semantic_decontaminate_ivf over the shared
    trained quantizer: the k-means CTEs label the FULL embedding set
    (exactly _kmeans_cells_for), eval queries (vec_id % eval_mod = 0)
    route to their nprobe best cells by centroid cosine, and only
    probed cells' corpus members are scored/thresholded — then the
    per-corpus-id best-hit rank of emb_decontaminate_sql."""
    return f"""
WITH {_QUANT_VECS},
{_kmeans_ctes(cells, iters)},
labeled AS (SELECT vec_id, cluster AS label FROM assigned{iters - 1}),
csumsf AS (
  -- routing centroids sum over CORPUS members only: the Spark side
  -- recomputes label_centroid_sums from the corpus argument, which
  -- excludes the eval set
  SELECT l.label, u.i, sum(u.x) AS s
  FROM u JOIN labeled l ON l.vec_id = u.vec_id
  WHERE l.vec_id % {eval_mod} <> 0
  GROUP BY 1, 2),
cnormf AS (SELECT label, sqrt(sum(s * s)) AS cn FROM csumsf GROUP BY 1),
qassign AS (
  SELECT qid, label FROM (
    SELECT a.vec_id AS qid, c.label,
           row_number() OVER (
             PARTITION BY a.vec_id
             ORDER BY sum(a.x * c.s) / any_value(cn.cn) DESC, c.label
           ) AS rn
    FROM u a JOIN csumsf c ON c.i = a.i JOIN cnormf cn ON cn.label = c.label
    WHERE a.vec_id % {eval_mod} = 0
    GROUP BY a.vec_id, c.label
  ) WHERE rn <= {nprobe}
),
dots AS (
  SELECT b.vec_id AS cid, qa.qid, sum(a.x * b.x) AS dot
  FROM qassign qa
  JOIN u a ON a.vec_id = qa.qid
  JOIN labeled lb ON lb.label = qa.label AND lb.vec_id % {eval_mod} <> 0
  JOIN u b ON b.vec_id = lb.vec_id AND b.i = a.i
  GROUP BY 1, 2
),
scored AS (
  SELECT cid, qid, dot / (sqrt(na.n2) * sqrt(nb.n2)) AS c
  FROM dots JOIN norms na ON na.vec_id = cid JOIN norms nb ON nb.vec_id = qid
  WHERE round(dot / (sqrt(na.n2) * sqrt(nb.n2)), 6) >= {threshold}
),
ranked AS (
  SELECT cid, qid, c,
         row_number() OVER (PARTITION BY cid ORDER BY c DESC, qid) AS rank,
         count(*) OVER (PARTITION BY cid) AS n
  FROM scored
)
SELECT cid AS vec_id, CAST(n AS BIGINT) AS n_eval_hits, qid AS eval_id,
       round(c, 6) AS cosine
FROM ranked WHERE rank = 1
"""
