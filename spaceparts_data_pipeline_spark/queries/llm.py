"""LLM-training-data operator queries over the ``documents`` and
``embeddings`` tables: dedup families, similarity search, text analysis,
multimodal plumbing. Oracle-checked where DuckDB can express the
semantics; hash-only (rows-only) for the LSH/SimHash approximate paths.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from spaceparts_data_pipeline_spark.operators import dedup_fuzzy, multimodal, similarity, text
from spaceparts_data_pipeline_spark.sources.parquet import load_table

QUERIES: dict = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn
    return deco


def T(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def _multiline(df: DataFrame, every: int = 8, text_col: str = "text") -> DataFrame:
    """Deterministic multi-line derivation of the fixture text: every
    ``every`` tokens become one line ending in a period.

    The driver fixtures' documents are single-line and punctuation-free,
    which made the line-structured driver rows vacuous (r07 ADVICE: d18
    passed with 0 rows on BOTH engines — only the crafted-doc unit tests
    exercised the rule bodies). The fixtures are driver-owned and
    read-only, so instead the line-structured queries (d18/d21/c01b)
    derive a multi-line input IDENTICALLY in Spark and in the DuckDB
    oracle (see _ML_CTE) — the C4/Gopher line rules then do real
    discriminating work in the driver gate: at sf0.01, d18 keeps 450 of
    500 docs and drops trailing short lines from the kept ones, and d21
    sees nonzero duplicate-line fractions.

    NULL text stays NULL (both engines), so downstream NULL handling is
    exercised unchanged.
    """
    t = F.split(F.trim(F.col(text_col)), r"\s+")
    lines = F.transform(
        F.sequence(F.lit(0), F.floor((F.size(t) - 1) / every).cast("int")),
        lambda i: F.concat(
            F.array_join(F.slice(t, i * every + 1, every), " "), F.lit(".")),
    )
    return df.withColumn(text_col, F.array_join(lines, "\n"))


def _ML_CTE(every: int) -> str:
    """The DuckDB twin of :func:`_multiline` as a pair of CTEs —
    compose as ``WITH {_ML_CTE(n)}, ...`` and read FROM ``ml``; every
    column of ``documents`` survives with ``text`` rewritten."""
    return f"""mltoks AS (
      SELECT *, string_split_regex(trim(text), '\\s+') AS __t FROM documents
    ),
    ml AS (
      SELECT * EXCLUDE (text, __t),
             CASE WHEN text IS NULL THEN NULL ELSE
               array_to_string(list_transform(
                 range(0, CAST(floor((len(__t) - 1) / {every}) AS INTEGER) + 1),
                 i -> array_to_string(__t[i*{every}+1 : i*{every}+{every}], ' ') || '.'),
                 chr(10)) END AS text
      FROM mltoks
    )"""


# ---------------------------------------------------------------------------
# d01 — exact dedup canonicalization: hash-groupBy (window-min) over text.
# ---------------------------------------------------------------------------

@register(
    "d01_dedup_exact",
    """
    SELECT doc_id,
           MIN(doc_id) OVER (PARTITION BY text) AS canonical_doc_id,
           doc_id <> MIN(doc_id) OVER (PARTITION BY text) AS is_duplicate
    FROM documents
    """,
)
def d01_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = T(spark, sf_dir, "documents")
    # Shuffle on md5(text), not text: at corpus scale the window's
    # partition key would otherwise BE the full document. 16-byte keys
    # move through the exchange; grouping is equivalent (md5 collisions
    # are negligible and the oracle's PARTITION BY text agrees on this data).
    w = Window.partitionBy(F.md5("text"))
    return d.select(
        "doc_id",
        F.min("doc_id").over(w).alias("canonical_doc_id"),
        (F.col("doc_id") != F.min("doc_id").over(w)).alias("is_duplicate"),
    )


# ---------------------------------------------------------------------------
# d02 — content fingerprinting (md5).
# ---------------------------------------------------------------------------

@register(
    "d02_fingerprint",
    "SELECT doc_id, md5(text) AS fingerprint FROM documents",
)
def d02_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = T(spark, sf_dir, "documents")
    return d.select("doc_id", text.fingerprint_md5("text").alias("fingerprint"))


# ---------------------------------------------------------------------------
# d03 — token statistics.
# ---------------------------------------------------------------------------

@register(
    "d03_token_stats",
    """
    SELECT doc_id, n_chars,
           CAST(CASE WHEN length(trim(text)) = 0 THEN 0
                     ELSE len(string_split_regex(trim(text), '\\s+')) END AS INT) AS n_tokens
    FROM documents
    """,
)
def d03_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = T(spark, sf_dir, "documents")
    return d.select("doc_id", "n_chars", text.token_count("text").alias("n_tokens"))


# ---------------------------------------------------------------------------
# d04 — quality scoring: punctuation / stopword ratios + boolean gate.
# ---------------------------------------------------------------------------

@register(
    "d04_text_quality",
    r"""
    WITH t AS (
      SELECT doc_id,
             CASE WHEN length(trim(text)) = 0 THEN 0
                  ELSE len(string_split_regex(trim(text), '\s+')) END AS n_tokens,
             length(text) AS n_chars,
             CAST(len(regexp_extract_all(text, '[.,!?;:]')) AS BIGINT) AS punct_cnt,
             CAST(len(regexp_extract_all(lower(text), '\b(the|and|of|to|a|in|is)\b')) AS BIGINT) AS stopword_cnt
      FROM documents
    )
    SELECT doc_id, punct_cnt, stopword_cnt,
           punct_cnt / greatest(CAST(n_chars AS BIGINT), 1) AS punct_ratio,
           stopword_cnt / greatest(CAST(n_tokens AS BIGINT), 1) AS stopword_ratio,
           n_tokens >= 20 AND n_tokens <= 5000 AND stopword_cnt > 0 AS is_quality
    FROM t
    """,
)
def d04_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = T(spark, sf_dir, "documents")
    return text.with_quality_score(d).select(
        "doc_id", "punct_cnt", "stopword_cnt", "punct_ratio", "stopword_ratio", "is_quality"
    )


# ---------------------------------------------------------------------------
# d05 — heuristic language ID (stopword-hit argmax).
# ---------------------------------------------------------------------------

@register(
    "d05_lang_id",
    r"""
    WITH h AS (
      SELECT doc_id, lang,
             CAST(len(regexp_extract_all(lower(text), '\b(the|and|of|to|a|in|is)\b')) AS BIGINT) AS en_hits,
             CAST(len(regexp_extract_all(lower(text), '\b(el|la|de|que|y|en|los)\b')) AS BIGINT) AS es_hits,
             CAST(len(regexp_extract_all(lower(text), '\b(der|die|und|das|ein|zu|ist)\b')) AS BIGINT) AS de_hits,
             CAST(len(regexp_extract_all(lower(text), '\b(le|les|et|des|un|une|dans)\b')) AS BIGINT) AS fr_hits
      FROM documents
    )
    SELECT doc_id, lang, en_hits, es_hits, de_hits, fr_hits,
           CASE WHEN en_hits > es_hits AND en_hits > de_hits AND en_hits > fr_hits THEN 'en'
                WHEN es_hits > en_hits AND es_hits > de_hits AND es_hits > fr_hits THEN 'es'
                WHEN de_hits > en_hits AND de_hits > es_hits AND de_hits > fr_hits THEN 'de'
                WHEN fr_hits > en_hits AND fr_hits > es_hits AND fr_hits > de_hits THEN 'fr'
                ELSE 'und' END AS predicted_lang
    FROM h
    """,
)
def d05_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = T(spark, sf_dir, "documents")
    return text.with_lang_id(d).select(
        "doc_id", "lang", "en_hits", "es_hits", "de_hits", "fr_hits", "predicted_lang"
    )


# ---------------------------------------------------------------------------
# d06 — exact n-gram Jaccard similar pairs (shingle self-join).
# ---------------------------------------------------------------------------

@register(
    "d06_jaccard_pairs",
    r"""
    WITH toks AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS t FROM documents),
    docs AS (SELECT * FROM toks WHERE len(t) >= 3),
    sh AS (
      SELECT DISTINCT doc_id,
             unnest(list_transform(range(1, len(t) - 1), i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS shingle
      FROM docs
    ),
    cnt AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
    pairs AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS inter
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT id_a, id_b, inter, inter / (ca.n + cb.n - inter) AS jaccard
    FROM pairs
    JOIN cnt ca ON id_a = ca.doc_id
    JOIN cnt cb ON id_b = cb.doc_id
    WHERE inter / (ca.n + cb.n - inter) >= 0.05
    """,
)
def d06_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = T(spark, sf_dir, "documents")
    return dedup_fuzzy.jaccard_pairs(d, threshold=0.05)


# ---------------------------------------------------------------------------
# d09 — near-dup clustering: connected components over the exact n-gram
# Jaccard pair graph (d06's edges), each doc labeled with the min doc_id
# of its component. The iterative Spark min-label propagation is checked
# against a DuckDB recursive-CTE transitive closure — the one genuinely
# iterative algorithm in the engine, still oracle-verifiable.
# ---------------------------------------------------------------------------

@register(
    "d09_near_dup_components",
    r"""
    WITH RECURSIVE toks AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS t FROM documents),
    docs AS (SELECT * FROM toks WHERE len(t) >= 3),
    sh AS (
      SELECT DISTINCT doc_id,
             unnest(list_transform(range(1, len(t) - 1), i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS shingle
      FROM docs
    ),
    cnt AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
    pairs AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS inter
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    sim AS (
      SELECT id_a, id_b FROM pairs
      JOIN cnt ca ON id_a = ca.doc_id
      JOIN cnt cb ON id_b = cb.doc_id
      WHERE inter / (ca.n + cb.n - inter) >= 0.05
    ),
    edges AS (
      SELECT id_a AS src, id_b AS dst FROM sim
      UNION ALL
      SELECT id_b, id_a FROM sim
    ),
    reach AS (
      SELECT doc_id AS a, doc_id AS b FROM documents
      UNION
      SELECT r.a, e.dst FROM reach r JOIN edges e ON e.src = r.b
    )
    SELECT a AS doc_id, MIN(b) AS component FROM reach GROUP BY a
    """,
)
def d09_near_dup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = T(spark, sf_dir, "documents")
    pairs = dedup_fuzzy.jaccard_pairs(d, threshold=0.05)
    return dedup_fuzzy.connected_components(pairs, d.select("doc_id"))


# ---------------------------------------------------------------------------
# d13 — near-dup REMOVAL: the deduplicated corpus itself (one canonical
# min-id doc per d09 component, full document schema). The step training
# pipelines actually consume; oracle = d09's recursive-CTE closure + a
# keep-canonical filter + join back to the documents.
# ---------------------------------------------------------------------------

@register(
    "d13_canonical_corpus",
    r"""
    WITH RECURSIVE toks AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS t FROM documents),
    docs AS (SELECT * FROM toks WHERE len(t) >= 3),
    sh AS (
      SELECT DISTINCT doc_id,
             unnest(list_transform(range(1, len(t) - 1), i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS shingle
      FROM docs
    ),
    cnt AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
    pairs AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS inter
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    sim AS (
      SELECT id_a, id_b FROM pairs
      JOIN cnt ca ON id_a = ca.doc_id
      JOIN cnt cb ON id_b = cb.doc_id
      WHERE inter / (ca.n + cb.n - inter) >= 0.05
    ),
    edges AS (
      SELECT id_a AS src, id_b AS dst FROM sim
      UNION ALL
      SELECT id_b, id_a FROM sim
    ),
    reach AS (
      SELECT doc_id AS a, doc_id AS b FROM documents
      UNION
      SELECT r.a, e.dst FROM reach r JOIN edges e ON e.src = r.b
    ),
    comp AS (SELECT a AS doc_id, MIN(b) AS component FROM reach GROUP BY a)
    SELECT d.doc_id, d.text, d.lang, d.source, d.n_chars
    FROM documents d JOIN comp USING (doc_id)
    WHERE comp.component = comp.doc_id
    """,
)
def d13_canonical_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = T(spark, sf_dir, "documents")
    pairs = dedup_fuzzy.jaccard_pairs(d, threshold=0.05)
    return dedup_fuzzy.canonical_corpus(d, pairs)


# ---------------------------------------------------------------------------
# d14 — the LSH-routed canonical corpus: MinHash-LSH candidates →
# exact-Jaccard verify on candidates only → components → min-id
# canonical. Same contract as d13 with the linear-scale pair generator
# swapped in — the pipeline a 100 TB corpus actually runs.
#
# ORACLE NOTE: the SQL below is the EXACT-path closure (d13's recursive
# CTE) at d14's threshold 0.5 — not a SQL transcription of MinHash-LSH
# (xxhash64 signatures are not SQL-expressible). Using it as d14's
# value oracle is sound because survivor-set equality between the LSH
# route and the exact route at threshold 0.5 / rows_per_band=1 is a
# TESTED PROPERTY at the oracle SFs (tests/test_llm_ops.py::
# test_canonical_corpus_lsh_equals_exact_path, run at sf0.01 and the
# sf0.1 stretch): the banding profile's per-pair miss probability at
# J>=0.5 is <1e-3, and the exact-Jaccard verify step removes all false
# candidates. It is a property pinned at these SFs, not an identity —
# at other data/thresholds LSH may legitimately miss pairs.
# ---------------------------------------------------------------------------

@register(
    "d14_canonical_corpus_lsh",
    r"""
    WITH RECURSIVE toks AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS t FROM documents),
    docs AS (SELECT * FROM toks WHERE len(t) >= 3),
    sh AS (
      SELECT DISTINCT doc_id,
             unnest(list_transform(range(1, len(t) - 1), i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS shingle
      FROM docs
    ),
    cnt AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
    pairs AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS inter
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    sim AS (
      SELECT id_a, id_b FROM pairs
      JOIN cnt ca ON id_a = ca.doc_id
      JOIN cnt cb ON id_b = cb.doc_id
      WHERE inter / (ca.n + cb.n - inter) >= 0.5
    ),
    edges AS (
      SELECT id_a AS src, id_b AS dst FROM sim
      UNION ALL
      SELECT id_b, id_a FROM sim
    ),
    reach AS (
      SELECT doc_id AS a, doc_id AS b FROM documents
      UNION
      SELECT r.a, e.dst FROM reach r JOIN edges e ON e.src = r.b
    ),
    comp AS (SELECT a AS doc_id, MIN(b) AS component FROM reach GROUP BY a)
    SELECT d.doc_id, d.text, d.lang, d.source, d.n_chars
    FROM documents d JOIN comp USING (doc_id)
    WHERE comp.component = comp.doc_id
    """,
)
def d14_canonical_corpus_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = T(spark, sf_dir, "documents")
    return dedup_fuzzy.canonical_corpus_lsh(d, threshold=0.5, rows_per_band=1)


# ---------------------------------------------------------------------------
# x29 — benchmark-contamination check: corpus docs sharing word-3-gram
# shingles with a held-out "benchmark" slice (deterministic doc_id%20
# split stands in for the eval set). Shingles travel as md5 hashes —
# reproducible in ANSI SQL, so unlike the xxhash LSH paths this check
# has a FULL value-hash oracle.
# ---------------------------------------------------------------------------

@register(
    "x29_contamination_check",
    r"""
    WITH toks AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS t FROM documents),
    docs AS (SELECT * FROM toks WHERE len(t) >= 3),
    sh AS (
      SELECT DISTINCT doc_id, shingle FROM (
        SELECT doc_id,
               unnest(list_transform(range(1, len(t) - 1), i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS shingle
        FROM docs
      )
    ),
    bsh AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % 20 = 0),
    csh AS (SELECT doc_id, shingle FROM sh WHERE doc_id % 20 != 0),
    shared AS (
      SELECT doc_id, COUNT(*) AS n FROM csh JOIN bsh USING (shingle) GROUP BY doc_id
    )
    SELECT d.doc_id,
           CAST(COALESCE(shared.n, 0) AS BIGINT) AS n_shared_shingles,
           COALESCE(shared.n, 0) > 0 AS contaminated
    FROM documents d LEFT JOIN shared USING (doc_id)
    WHERE d.doc_id % 20 != 0
    """,
)
def x29_contamination_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = T(spark, sf_dir, "documents")
    benchmark = d.filter(F.col("doc_id") % 20 == 0)
    corpus = d.filter(F.col("doc_id") % 20 != 0)
    return dedup_fuzzy.contamination_check(corpus, benchmark)


# ---------------------------------------------------------------------------
# x30 — concat-and-chunk sequence packing (GPT-style pretrain shaping):
# per-source shards, docs in id order, fixed 64-token sequences, docs
# straddle boundaries. One distributed running-sum window; full SQL
# oracle with the identical window.
# ---------------------------------------------------------------------------

@register(
    "x30_sequence_packing",
    r"""
    WITH t AS (
      SELECT doc_id, source,
             CASE WHEN len(trim(text)) = 0 THEN 0
                  ELSE len(string_split_regex(trim(text), '\s+')) END AS n_tokens
      FROM documents
    ),
    nz AS (SELECT * FROM t WHERE n_tokens > 0),
    c AS (
      SELECT *, SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                                    ROWS UNBOUNDED PRECEDING) AS cum
      FROM nz
    )
    SELECT doc_id, source, CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(FLOOR((cum - n_tokens) / 64.0) AS BIGINT) AS start_seq,
           CAST((cum - n_tokens) % 64 AS BIGINT) AS start_offset,
           CAST(FLOOR((cum - 1) / 64.0) AS BIGINT) AS end_seq
    FROM c
    """,
)
def x30_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = T(spark, sf_dir, "documents")
    return text.sequence_packing(d, capacity=64, shard_col="source")


# ---------------------------------------------------------------------------
# d10 — embedding-cosine near-dup dedup decision: each document marked
# duplicate of the lowest-id doc whose embedding cosine ≥ threshold.
# Exact pair generator here (oracle-able); at corpus scale swap in the
# banded-LSH generator — the decision layer is unchanged.
# ---------------------------------------------------------------------------

@register(
    "d10_embed_near_dup",
    """
    WITH e AS (SELECT vec_id, embedding FROM embeddings),
    p AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             list_sum(list_transform(range(1, 65), i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))
             / (sqrt(list_sum(list_transform(range(1, 65), i -> CAST(a.embedding[i] AS DOUBLE) * CAST(a.embedding[i] AS DOUBLE))))
                * sqrt(list_sum(list_transform(range(1, 65), i -> CAST(b.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE))))) AS cos
      FROM e a JOIN e b ON a.vec_id < b.vec_id
    ),
    d AS (SELECT id_b AS doc_id, MIN(id_a) AS dup_of FROM p WHERE cos >= 0.35 GROUP BY id_b)
    SELECT doc.doc_id, d.dup_of, d.dup_of IS NOT NULL AS is_dup
    FROM documents doc LEFT JOIN d USING (doc_id)
    """,
)
def d10_embed_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = T(spark, sf_dir, "documents")
    embs = T(spark, sf_dir, "embeddings")
    return similarity.embedding_near_dup(docs, embs, threshold=0.35)


# ---------------------------------------------------------------------------
# d11 — within-document repetition profile (Gopher-rule quality family):
# duplicate-token fraction + top-token dominance per document.
# ---------------------------------------------------------------------------

@register(
    "d11_repetition_stats",
    r"""
    WITH toks AS (
      SELECT doc_id,
             unnest(list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '')) AS tok
      FROM documents
    ),
    c AS (SELECT doc_id, tok, COUNT(*) AS cnt FROM toks GROUP BY 1, 2),
    s AS (
      SELECT doc_id, CAST(SUM(cnt) AS BIGINT) AS total_tokens,
             COUNT(*) AS distinct_tokens, MAX(cnt) AS top
      FROM c GROUP BY 1
    )
    SELECT d.doc_id,
           coalesce(s.total_tokens, 0) AS total_tokens,
           coalesce(s.distinct_tokens, 0) AS distinct_tokens,
           CASE WHEN s.total_tokens > 0
                THEN 1.0 - CAST(s.distinct_tokens AS DOUBLE) / CAST(s.total_tokens AS DOUBLE)
           END AS dup_token_frac,
           CASE WHEN s.total_tokens > 0
                THEN CAST(s.top AS DOUBLE) / CAST(s.total_tokens AS DOUBLE)
           END AS top_token_frac,
           coalesce(CAST(s.top AS DOUBLE) / CAST(s.total_tokens AS DOUBLE) > 0.2, false)
             AS is_repetitive
    FROM documents d LEFT JOIN s USING (doc_id)
    """,
)
def d11_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = T(spark, sf_dir, "documents")
    return text.repetition_stats(d, top_frac_threshold=0.2)


# ---------------------------------------------------------------------------
# d12 — deterministic stratified corpus rebalance: cap the dominant
# language at 10%, keep half of everything else (md5 hash bucket, same
# engine-portable split primitive as x05 — no rand(), no sampleBy()).
# ---------------------------------------------------------------------------

@register(
    "d12_stratified_sample",
    """
    SELECT doc_id, lang FROM documents
    WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100
          < CASE WHEN lang = 'en' THEN 10 ELSE 50 END
    """,
)
def d12_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = T(spark, sf_dir, "documents")
    return text.stratified_sample(d, "doc_id", "lang", rates={"en": 10}, default_rate=50) \
        .select("doc_id", "lang")


# ---------------------------------------------------------------------------
# d07 — MinHash+LSH candidate pairs (approximate; hash functions are
# Spark-native xxhash64 → no SQL oracle; driver records rows-only check).
# ---------------------------------------------------------------------------

@register("d07_minhash_lsh_pairs")
def d07_minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = T(spark, sf_dir, "documents")
    return dedup_fuzzy.minhash_lsh_pairs(d, num_perm=16, rows_per_band=2)


# ---------------------------------------------------------------------------
# d08 — SimHash signatures (rows-only: xxhash64-based).
# ---------------------------------------------------------------------------

@register("d08_simhash")
def d08_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = T(spark, sf_dir, "documents")
    return dedup_fuzzy.simhash(d)


# ---------------------------------------------------------------------------
# e01 — brute-force cosine top-k (exact ANN baseline).
# ---------------------------------------------------------------------------

@register(
    "e01_knn_topk",
    """
    WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 20),
    c AS (SELECT vec_id AS neighbor_id, embedding AS nv FROM embeddings),
    p AS (
      SELECT query_id, neighbor_id,
             list_sum(list_transform(range(1, 65), i -> CAST(qv[i] AS DOUBLE) * CAST(nv[i] AS DOUBLE))) AS dot,
             sqrt(list_sum(list_transform(range(1, 65), i -> CAST(qv[i] AS DOUBLE) * CAST(qv[i] AS DOUBLE)))) AS qn,
             sqrt(list_sum(list_transform(range(1, 65), i -> CAST(nv[i] AS DOUBLE) * CAST(nv[i] AS DOUBLE)))) AS nn
      FROM c, q WHERE query_id <> neighbor_id
    ),
    r AS (
      SELECT query_id, neighbor_id, dot / (qn * nn) AS cos,
             row_number() OVER (PARTITION BY query_id ORDER BY dot / (qn * nn) DESC, neighbor_id) AS rnk
      FROM p
    )
    SELECT query_id, neighbor_id, CAST(rnk AS INT) AS knn_rank, round(cos, 6) AS cosine_sim
    FROM r WHERE rnk <= 3
    """,
)
def e01_knn_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = T(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 20)
    return similarity.knn_bruteforce(e, q, k=3)


# ---------------------------------------------------------------------------
# e02 — bounded exact similar-pairs (cosine ≥ 0.35 over vec_id < 1000).
# ---------------------------------------------------------------------------

@register(
    "e02_similar_pairs",
    """
    WITH e AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 1000),
    p AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             list_sum(list_transform(range(1, 65), i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))
             / (sqrt(list_sum(list_transform(range(1, 65), i -> CAST(a.embedding[i] AS DOUBLE) * CAST(a.embedding[i] AS DOUBLE))))
                * sqrt(list_sum(list_transform(range(1, 65), i -> CAST(b.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE))))) AS cos
      FROM e a JOIN e b ON a.vec_id < b.vec_id
    )
    SELECT id_a, id_b, round(cos, 6) AS cosine_sim FROM p WHERE cos >= 0.35
    """,
)
def e02_similar_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = T(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 1000)
    return similarity.similar_pairs_bruteforce(e, threshold=0.35)


# ---------------------------------------------------------------------------
# e03 — LSH-bucketed similar pairs (the scale path; approximate → rows-only:
# numpy Gaussian planes aren't SQL-replayable. The banding geometry is
# driver-VALUE-checked through e03c below — the deterministic fixed-point
# variant with a FULL oracle — while e03/e03b keep their recall/precision
# floors pinned in tests/test_llm_ops.py; both are standing out-of-window
# rows-only exceptions per the weak-evidence rotation policy.)
# ---------------------------------------------------------------------------

@register("e03_similar_pairs_lsh")
def e03_similar_pairs_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spaceparts_data_pipeline_spark.sources.parquet import footer_row_count

    d = T(spark, sf_dir, "embeddings")
    # n_planes=None → self-sized from the corpus count: total candidate
    # pairs stay ~64·n at any sf instead of n²/2^planes blowing up.
    # The count comes from parquet footers (n_hint) — no counting job.
    return similarity.similar_pairs_lsh(
        d, n_planes=None, n_bands=8, threshold=0.35,
        n_hint=footer_row_count(sf_dir, "embeddings", spark=spark),
    )


@register("e03b_similar_pairs_lsh_recall")
def e03b_similar_pairs_lsh_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """e03 under the pinned HIGH-RECALL profile (4 planes × 16 bands,
    ≥0.9 recall at threshold-level similarity vs the self-sized
    default's ~0.2; raised from 12 bands after the 8× harness showed
    the 12-band fixture number was one lucky plane draw) — the named
    variant for moderate-similarity use, so the recall trade is a
    visible choice rather than a silent default (round-3 verdict
    next-round #8). Approximate → rows-only, like e03; the recall
    floor is pinned in tests/test_llm_ops.py at 1× and by
    scale_harness --recall-e03b at 8×."""
    d = T(spark, sf_dir, "embeddings")
    return similarity.similar_pairs_lsh(
        d, threshold=0.35, **similarity.HIGH_RECALL_LSH
    )


# ---------------------------------------------------------------------------
# e03c — DETERMINISTIC banded hyperplane LSH (FULL oracle). The float-
# plane production profiles (e03 self-sized, e03b high-recall) are
# inherently rows-only — numpy Gaussian planes aren't SQL-replayable —
# so this variant makes the ENTIRE pipeline cross-engine exact: seeded
# ±1 Rademacher planes (embedded below as SQL literals), int64
# fixed-point signature bits (floor(v·2^20) — exact in both engines,
# order-free), and e02's sequential-fold cosine as the verify decision.
# The driver can therefore value-hash candidate generation itself, not
# just spot-check recall. Profile = HIGH_RECALL_LSH (4 planes × 16
# bands) so the in-window row exercises the recall-oriented geometry.
# ---------------------------------------------------------------------------

_E03C = {"dim": 64, "n_planes": 4, "n_bands": 16, "seed": 12, "threshold": 0.35}

#: e02's exact-cosine expression between two embedding relations ea/eb —
#: the shared verify tail of e03c's and d26's oracles.
_COS_EA_EB = (
    "list_sum(list_transform(range(1, 65), i -> CAST(ea.embedding[i] AS DOUBLE) * CAST(eb.embedding[i] AS DOUBLE)))"
    " / (sqrt(list_sum(list_transform(range(1, 65), i -> CAST(ea.embedding[i] AS DOUBLE) * CAST(ea.embedding[i] AS DOUBLE))))"
    " * sqrt(list_sum(list_transform(range(1, 65), i -> CAST(eb.embedding[i] AS DOUBLE) * CAST(eb.embedding[i] AS DOUBLE)))))"
)


def _det_lsh_sql_prefix() -> str:
    """The shared deterministic-LSH CTE prefix (planes literals +
    fixed-point quantization + int64 band signatures) both e03c's and
    d26's oracles open with — generated from the SAME
    rademacher_planes matrix the Spark kernels use."""
    P = similarity.rademacher_planes(
        _E03C["dim"], _E03C["n_planes"], _E03C["n_bands"], _E03C["seed"])
    n_planes, n_bands = _E03C["n_planes"], _E03C["n_bands"]
    rows = []
    for band in range(n_bands):
        for plane in range(n_planes):
            w = ", ".join(str(int(x)) for x in P[band * n_planes + plane])
            rows.append(f"({band}, {plane}, [{w}])")
    planes_values = ",\n      ".join(rows)
    scale = similarity.DET_LSH_SCALE
    return f"""
    WITH planes(band, plane, wv) AS (VALUES
      {planes_values}
    ),
    q AS MATERIALIZED (
      SELECT vec_id,
             list_transform(range(1, {_E03C['dim'] + 1}),
                            i -> CAST(floor(CAST(embedding[i] AS DOUBLE) * {scale}.0) AS BIGINT)) AS qv
      FROM embeddings
    ),
    sigs AS MATERIALIZED (
      SELECT q.vec_id, p.band,
             SUM(CASE WHEN list_sum(list_transform(range(1, {_E03C['dim'] + 1}),
                                                   i -> q.qv[i] * p.wv[i])) >= 0
                      THEN (1 << p.plane) ELSE 0 END) AS sig
      FROM q CROSS JOIN planes p
      GROUP BY q.vec_id, p.band
    )"""


def _e03c_oracle() -> str:
    return _det_lsh_sql_prefix() + f""",
    cand AS (
      SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
      FROM sigs a JOIN sigs b ON a.band = b.band AND a.sig = b.sig
                             AND a.vec_id < b.vec_id
    ),
    v AS (
      SELECT c.id_a, c.id_b,
             list_sum(list_transform(range(1, 65), i -> CAST(ea.embedding[i] AS DOUBLE) * CAST(eb.embedding[i] AS DOUBLE)))
             / (sqrt(list_sum(list_transform(range(1, 65), i -> CAST(ea.embedding[i] AS DOUBLE) * CAST(ea.embedding[i] AS DOUBLE))))
                * sqrt(list_sum(list_transform(range(1, 65), i -> CAST(eb.embedding[i] AS DOUBLE) * CAST(eb.embedding[i] AS DOUBLE))))) AS cos
      FROM cand c
      JOIN embeddings ea ON ea.vec_id = c.id_a
      JOIN embeddings eb ON eb.vec_id = c.id_b
    )
    SELECT id_a, id_b, round(cos, 6) AS cosine_sim FROM v WHERE cos >= {_E03C['threshold']}
    """


@register("e03c_similar_pairs_lsh_det", _e03c_oracle())
def e03c_similar_pairs_lsh_det(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spaceparts_data_pipeline_spark.sources.parquet import footer_row_count

    d = T(spark, sf_dir, "embeddings")
    return similarity.similar_pairs_lsh_det(
        d, dim=_E03C["dim"], n_planes=_E03C["n_planes"],
        n_bands=_E03C["n_bands"], threshold=_E03C["threshold"],
        seed=_E03C["seed"],
        n_hint=footer_row_count(sf_dir, "embeddings", spark=spark),
    )


# ---------------------------------------------------------------------------
# d26 — cross-run SEMANTIC dedup (incremental_semdedup): the embedding
# member of the incremental-screen family (d15 = exact md5, d16 = MinHash
# text). Two rounds replayed end to end: batch 1 (vec_id < 250) admits
# against an empty store, batch 2 admits against batch 1's store — the
# output is round-2's admitted ids. FULL oracle: deterministic signatures
# make the whole decision — banding, collisions, exact-cosine verify —
# SQL-replayable; unlike d16 no admit-set-equality assumption is needed
# because the store keeps vectors and every rejection is verified.
# ---------------------------------------------------------------------------

_D26_SPLIT = 250


def _d26_oracle() -> str:
    t = _E03C["threshold"]
    s = _D26_SPLIT
    return _det_lsh_sql_prefix() + f""",
    cand1 AS (
      SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
      FROM sigs a JOIN sigs b ON a.band = b.band AND a.sig = b.sig
                             AND a.vec_id < b.vec_id
      WHERE a.vec_id < {s} AND b.vec_id < {s}
    ),
    d1 AS (
      SELECT DISTINCT c.id_b AS vec_id FROM cand1 c
      JOIN embeddings ea ON ea.vec_id = c.id_a
      JOIN embeddings eb ON eb.vec_id = c.id_b
      WHERE {_COS_EA_EB} >= {t}
    ),
    adm1 AS MATERIALIZED (
      SELECT e.vec_id FROM embeddings e
      WHERE e.vec_id < {s}
        AND NOT EXISTS (SELECT 1 FROM d1 WHERE d1.vec_id = e.vec_id)
    ),
    cand2 AS (
      SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
      FROM sigs a JOIN sigs b ON a.band = b.band AND a.sig = b.sig
                             AND a.vec_id < b.vec_id
      WHERE a.vec_id >= {s} AND b.vec_id >= {s}
    ),
    d2 AS (
      SELECT DISTINCT c.id_b AS vec_id FROM cand2 c
      JOIN embeddings ea ON ea.vec_id = c.id_a
      JOIN embeddings eb ON eb.vec_id = c.id_b
      WHERE {_COS_EA_EB} >= {t}
    ),
    surv2 AS MATERIALIZED (
      SELECT e.vec_id FROM embeddings e
      WHERE e.vec_id >= {s}
        AND NOT EXISTS (SELECT 1 FROM d2 WHERE d2.vec_id = e.vec_id)
    ),
    screen_cand AS (
      SELECT DISTINCT sb.vec_id, ss.vec_id AS sid
      FROM sigs sb JOIN surv2 ON surv2.vec_id = sb.vec_id
      JOIN sigs ss ON ss.band = sb.band AND ss.sig = sb.sig
      JOIN adm1 ON adm1.vec_id = ss.vec_id
    ),
    hits AS (
      SELECT DISTINCT c.vec_id FROM screen_cand c
      JOIN embeddings ea ON ea.vec_id = c.vec_id
      JOIN embeddings eb ON eb.vec_id = c.sid
      WHERE {_COS_EA_EB} >= {t}
    )
    SELECT vec_id FROM surv2
    WHERE NOT EXISTS (SELECT 1 FROM hits WHERE hits.vec_id = surv2.vec_id)
    """


@register("d26_incremental_semdedup", _d26_oracle())
def d26_incremental_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round 1 admits embeddings vec_id < 250 against an empty store;
    round 2 admits the rest against round 1's store; output = round-2
    admitted ids. Cites the reference's incremental watermark-batch
    shape (SURVEY §2.11) transplanted to embedding space."""
    e = T(spark, sf_dir, "embeddings")
    b1 = e.filter(F.col("vec_id") < _D26_SPLIT)
    b2 = e.filter(F.col("vec_id") >= _D26_SPLIT)
    _, store = similarity.incremental_semdedup(
        b1, None, threshold=_E03C["threshold"])
    admitted, _ = similarity.incremental_semdedup(
        b2, store, threshold=_E03C["threshold"])
    return admitted.select("vec_id")


# ---------------------------------------------------------------------------
# x05 — deterministic train/val split (md5 hash bucket; stable across
# engines, runs, and partitionings — the reproducible alternative to rand).
# ---------------------------------------------------------------------------

@register(
    "x05_train_val_split",
    """
    SELECT doc_id,
           CASE WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100 < 90
                THEN 'train' ELSE 'val' END AS split
    FROM documents
    """,
)
def x05_train_val_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = T(spark, sf_dir, "documents")
    return text.deterministic_split(d, "doc_id", train_pct=90).select("doc_id", "split")


# ---------------------------------------------------------------------------
# x06 — vocabulary building: corpus token frequencies, top 20.
# ---------------------------------------------------------------------------

@register(
    "x06_vocab_topk",
    r"""
    WITH toks AS (
      SELECT unnest(string_split_regex(trim(text), '\s+')) AS token
      FROM documents WHERE length(trim(text)) > 0
    )
    SELECT token, COUNT(*) AS freq FROM toks
    GROUP BY token ORDER BY freq DESC, token LIMIT 20
    """,
)
def x06_vocab_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = T(spark, sf_dir, "documents").filter(F.length(F.trim("text")) > 0)
    toks = d.select(F.explode(F.split(F.trim("text"), r"\s+")).alias("token"))
    return (
        toks.groupBy("token").agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.desc("freq"), F.asc("token")).limit(20)
    )


# ---------------------------------------------------------------------------
# x07 — TF-IDF top terms per document (bounded doc set): term frequency ×
# ln((N+1)/(df+1)), the classic corpus-statistics join pattern.
# ---------------------------------------------------------------------------

@register(
    "x07_tfidf_topterms",
    r"""
    WITH toks AS (
      SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS token
      FROM documents WHERE length(trim(text)) > 0
    ),
    tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
    df AS (SELECT token, COUNT(DISTINCT doc_id) AS df FROM toks GROUP BY 1),
    n AS (SELECT COUNT(*) AS n FROM documents WHERE length(trim(text)) > 0),
    scored AS (
      SELECT tf.doc_id, tf.token,
             round(tf.tf * ln((n.n + 1) / (df.df + 1)), 6) AS tfidf
      FROM tf JOIN df USING (token) CROSS JOIN n
      WHERE tf.doc_id < 100
    )
    SELECT doc_id, token, tfidf, CAST(rnk AS INT) AS term_rank
    FROM (SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, token) AS rnk FROM scored)
    WHERE rnk <= 3
    """,
)
def x07_tfidf_topterms(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = T(spark, sf_dir, "documents").filter(F.length(F.trim("text")) > 0)
    toks = d.select("doc_id", F.explode(F.split(F.trim("text"), r"\s+")).alias("token"))
    tf = toks.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = toks.groupBy("token").agg(F.count_distinct("doc_id").alias("df"))
    n = d.agg(F.count(F.lit(1)).alias("n"))
    scored = (
        tf.filter(F.col("doc_id") < 100)
        .join(F.broadcast(dfreq), "token")
        .crossJoin(F.broadcast(n))
        .withColumn("tfidf", F.round(F.col("tf") * F.log((F.col("n") + 1) / (F.col("df") + 1)), 6))
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("token"))
    return (
        scored.withColumn("term_rank", F.row_number().over(w))
        .filter(F.col("term_rank") <= 3)
        .select("doc_id", "token", "tfidf", "term_rank")
    )


# ---------------------------------------------------------------------------
# e04 — IVF approximate kNN (coarse-quantize + probe; the partition-pruned
# ANN scale path). Every step is deterministic — centroid seeds are a
# deterministic md5-hash sample (smallest md5(cast(vec_id)) — Spark md5
# and DuckDB md5 agree on the hex digest of the decimal string, so the
# oracle reproduces the exact same seed set), assignment/probing/top-k
# all have explicit tie-breaks — so unlike the hash-based LSH paths it
# admits a FULL SQL oracle: the same quantize→probe→rank pipeline in
# DuckDB, with the cosine written as the identical left-fold so values
# hash-match bit-for-bit.
# ---------------------------------------------------------------------------

_COS = (
    "list_sum(list_transform(range(1, 65), i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)))"
    " / (sqrt(list_sum(list_transform(range(1, 65), i -> CAST({a}[i] AS DOUBLE) * CAST({a}[i] AS DOUBLE))))"
    " * sqrt(list_sum(list_transform(range(1, 65), i -> CAST({b}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)))))"
)


@register(
    "e04_knn_ivf",
    f"""
    WITH cents AS (
      SELECT vec_id AS centroid_id, embedding AS cv FROM embeddings
      ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 16
    ),
    assigned AS (
      SELECT vec_id AS neighbor_id, embedding AS nv, centroid_id FROM (
        SELECT e.vec_id, e.embedding, c.centroid_id,
               row_number() OVER (
                 PARTITION BY e.vec_id
                 ORDER BY {_COS.format(a='e.embedding', b='c.cv')} DESC, c.centroid_id ASC
               ) AS r
        FROM embeddings e CROSS JOIN cents c
      ) WHERE r = 1
    ),
    probes AS (
      SELECT query_id, qv, centroid_id FROM (
        SELECT q.vec_id AS query_id, q.embedding AS qv, c.centroid_id,
               row_number() OVER (
                 PARTITION BY q.vec_id
                 ORDER BY {_COS.format(a='q.embedding', b='c.cv')} DESC, c.centroid_id ASC
               ) AS r
        FROM embeddings q CROSS JOIN cents c WHERE q.vec_id < 20
      ) WHERE r <= 4
    ),
    scored AS (
      SELECT p.query_id, a.neighbor_id, {_COS.format(a='p.qv', b='a.nv')} AS cos
      FROM assigned a JOIN probes p USING (centroid_id)
      WHERE p.query_id <> a.neighbor_id
    ),
    r AS (
      SELECT query_id, neighbor_id, cos,
             row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rnk
      FROM scored
    )
    SELECT query_id, neighbor_id, CAST(rnk AS INT) AS knn_rank, round(cos, 6) AS cosine_sim
    FROM r WHERE rnk <= 3
    """,
)
def e04_knn_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = T(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 20)
    return similarity.knn_ivf(e, q, k=3, n_centroids=16, n_probe=4)


# ---------------------------------------------------------------------------
# e04b — IVF kNN with one Lloyd refinement pass over the seed quantizer.
# The refinement mean uses the engine's decimal-sum pattern (exact,
# order-independent), so the REFINED centroids — the quantizer you'd
# actually run at 100 TB — are bit-identical under any partitioning and
# the whole pipeline admits the same FULL SQL oracle as e04: seeds →
# assign → per-position decimal mean (VARCHAR round-trip to double, the
# dsum_sql route) → reassign against refined centroids → probe → rank.
# ---------------------------------------------------------------------------

@register(
    "e04b_knn_ivf_refined",
    f"""
    WITH cents AS (
      SELECT vec_id AS centroid_id, embedding AS cv FROM embeddings
      ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 16
    ),
    assigned0 AS (
      SELECT vec_id AS neighbor_id, embedding AS nv, centroid_id FROM (
        SELECT e.vec_id, e.embedding, c.centroid_id,
               row_number() OVER (
                 PARTITION BY e.vec_id
                 ORDER BY {_COS.format(a='e.embedding', b='c.cv')} DESC, c.centroid_id ASC
               ) AS r
        FROM embeddings e CROSS JOIN cents c
      ) WHERE r = 1
    ),
    vals AS (
      SELECT centroid_id, i AS pos, CAST(nv[i] AS DOUBLE) AS val
      FROM assigned0 CROSS JOIN range(1, 65) t(i)
    ),
    means AS (
      SELECT centroid_id, pos,
             CAST(CAST(SUM(CAST(val AS DECIMAL(27,12))) AS VARCHAR) AS DOUBLE) / COUNT(*) AS m
      FROM vals GROUP BY centroid_id, pos
    ),
    refined AS (
      SELECT c.centroid_id, COALESCE(mv.cv, c.cv) AS cv
      FROM cents c LEFT JOIN (
        SELECT centroid_id, list(m ORDER BY pos) AS cv FROM means GROUP BY centroid_id
      ) mv USING (centroid_id)
    ),
    assigned AS (
      SELECT vec_id AS neighbor_id, embedding AS nv, centroid_id FROM (
        SELECT e.vec_id, e.embedding, c.centroid_id,
               row_number() OVER (
                 PARTITION BY e.vec_id
                 ORDER BY {_COS.format(a='e.embedding', b='c.cv')} DESC, c.centroid_id ASC
               ) AS r
        FROM embeddings e CROSS JOIN refined c
      ) WHERE r = 1
    ),
    probes AS (
      SELECT query_id, qv, centroid_id FROM (
        SELECT q.vec_id AS query_id, q.embedding AS qv, c.centroid_id,
               row_number() OVER (
                 PARTITION BY q.vec_id
                 ORDER BY {_COS.format(a='q.embedding', b='c.cv')} DESC, c.centroid_id ASC
               ) AS r
        FROM embeddings q CROSS JOIN refined c WHERE q.vec_id < 20
      ) WHERE r <= 4
    ),
    scored AS (
      SELECT p.query_id, a.neighbor_id, {_COS.format(a='p.qv', b='a.nv')} AS cos
      FROM assigned a JOIN probes p USING (centroid_id)
      WHERE p.query_id <> a.neighbor_id
    ),
    r AS (
      SELECT query_id, neighbor_id, cos,
             row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rnk
      FROM scored
    )
    SELECT query_id, neighbor_id, CAST(rnk AS INT) AS knn_rank, round(cos, 6) AS cosine_sim
    FROM r WHERE rnk <= 3
    """,
)
def e04b_knn_ivf_refined(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = T(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 20)
    return similarity.knn_ivf(e, q, k=3, n_centroids=16, n_probe=4, kmeans_iters=1)


# ---------------------------------------------------------------------------
# x19 — array-column functions over embeddings (size/min/max/slice).
# ---------------------------------------------------------------------------

@register(
    "x19_array_stats",
    """
    SELECT vec_id,
           CAST(len(embedding) AS INT) AS dim,
           CAST(list_max(embedding) AS DOUBLE) AS max_elem,
           CAST(list_min(embedding) AS DOUBLE) AS min_elem,
           CAST(embedding[1] AS DOUBLE) AS first_elem,
           CAST(len(list_filter(embedding, x -> x > 0)) AS INT) AS n_positive
    FROM embeddings
    """,
)
def x19_array_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = T(spark, sf_dir, "embeddings")
    return e.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.array_max("embedding").cast("double").alias("max_elem"),
        F.array_min("embedding").cast("double").alias("min_elem"),
        F.element_at("embedding", 1).cast("double").alias("first_elem"),
        F.size(F.filter("embedding", lambda x: x > 0)).alias("n_positive"),
    )


# ---------------------------------------------------------------------------
# e05 — vectorized kNN via Arrow pandas_udf (NumPy matmul): same results
# as e01, the fast path when built-in higher-order functions become the
# bottleneck. Same oracle as e01.
# ---------------------------------------------------------------------------

@register(
    "e05_knn_topk_vectorized",
    ORACLES.get("e01_knn_topk"),
)
def e05_knn_topk_vectorized(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = T(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 20)
    return similarity.knn_bruteforce_vectorized(e, q, k=3)


# ---------------------------------------------------------------------------
# x23 — positional explode (token position index), the lateral-view shape.
# ---------------------------------------------------------------------------

@register(
    "x23_posexplode_tokens",
    r"""
    WITH toks AS (
      SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
      FROM documents WHERE doc_id < 20 AND length(trim(text)) > 0
    ),
    u AS (
      SELECT doc_id, unnest(list_transform(range(1, len(t) + 1), i -> {'pos': i - 1, 'tok': t[i]})) AS s
      FROM toks
    )
    SELECT doc_id, CAST(s.pos AS INT) AS pos, s.tok AS token FROM u
    """,
)
def x23_posexplode_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = T(spark, sf_dir, "documents").filter((F.col("doc_id") < 20) & (F.length(F.trim("text")) > 0))
    toks = d.select("doc_id", F.split(F.trim("text"), r"\s+").alias("t"))
    return toks.select("doc_id", F.posexplode("t").alias("pos", "token"))


# ---------------------------------------------------------------------------
# m01 — multimodal plumbing: binary payload through Arrow mapInPandas,
# oracle-checked against octet_length.
# ---------------------------------------------------------------------------

@register(
    "m01_binary_bytes",
    "SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes FROM documents",
)
def m01_binary_bytes(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = T(spark, sf_dir, "documents").select("doc_id", F.col("text").cast("binary").alias("payload"))
    return multimodal.byte_lengths(d, "doc_id", "payload")


# ---------------------------------------------------------------------------
# d15 — cross-run incremental dedup: a new batch screened against the
# fingerprint store of everything previously ingested (the production
# ingestion shape — each run sees a delta, never re-admits a doc).
# Store/batch are carved from `documents` by doc_id decile with a
# deliberate overlap (deciles 4-5 are in both → screened out) and a
# shifted echo of deciles 8-9 inside the batch (same text under a new
# id → within-batch canonicalization actively picks the min id).
# ---------------------------------------------------------------------------

@register(
    "d15_incremental_dedup",
    """
    WITH store AS (
      SELECT DISTINCT md5(text) AS fingerprint
      FROM documents WHERE doc_id % 10 < 6
    ),
    batch_rows AS (
      -- text IS NOT NULL mirrors incremental_dedup's documented NULL
      -- semantics: the engine drops NULL text (md5(NULL) can never be
      -- screened by an equi anti join), so the oracle must too — else
      -- a NULL-text fixture row would survive here as a NULL-
      -- fingerprint group and break parity.
      SELECT doc_id, text FROM documents
      WHERE doc_id % 10 >= 4 AND text IS NOT NULL
      UNION ALL
      SELECT doc_id + 1000000 AS doc_id, text
      FROM documents WHERE doc_id % 10 >= 8 AND text IS NOT NULL
    ),
    canon AS (
      SELECT MIN(doc_id) AS doc_id, md5(text) AS fingerprint
      FROM batch_rows GROUP BY md5(text)
    )
    SELECT doc_id, fingerprint FROM canon c
    WHERE NOT EXISTS (SELECT 1 FROM store s WHERE s.fingerprint = c.fingerprint)
    """,
)
def d15_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spaceparts_data_pipeline_spark.operators import dedup

    d = T(spark, sf_dir, "documents")
    store = d.filter(F.col("doc_id") % 10 < 6).select(F.md5("text").alias("fingerprint"))
    batch = d.filter(F.col("doc_id") % 10 >= 4).select("doc_id", "text").unionAll(
        d.filter(F.col("doc_id") % 10 >= 8)
        .select((F.col("doc_id") + 1000000).alias("doc_id"), "text")
    )
    return dedup.incremental_dedup(batch, store)


# ---------------------------------------------------------------------------
# x31 — per-language bigram heavy hitters: word n-gram construction as a
# per-row array lambda (no shuffle), then one map-side-combinable count
# over the vocab-bounded (lang, bigram) space and a top-k window over
# the counted table (vocab-sized, not corpus-sized).
# ---------------------------------------------------------------------------

@register(
    "x31_bigram_topk",
    r"""
    WITH toks AS (
      SELECT lang, string_split_regex(trim(text), '\s+') AS t
      FROM documents WHERE length(trim(text)) > 0
    ),
    grams AS (
      SELECT lang, unnest(list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1])) AS bigram
      FROM toks
    ),
    counted AS (
      SELECT lang, bigram, COUNT(*) AS freq FROM grams GROUP BY lang, bigram
    )
    SELECT lang, bigram, freq,
           CAST(row_number() OVER (PARTITION BY lang ORDER BY freq DESC, bigram) AS INT) AS rk
    FROM counted
    QUALIFY rk <= 10
    """,
)
def x31_bigram_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = T(spark, sf_dir, "documents")
    return text.ngram_topk(d, "lang", "text", n=2, k=10)


# ---------------------------------------------------------------------------
# x31b — the same heavy hitters via the TWO-PASS hash-count route: the
# big shuffle moves 8-byte xxhash64 values, never bigram strings; only
# the (broadcast-small) candidate set's grams are re-counted as text.
# Same oracle as x31 — identical result by construction (rank() keeps
# every boundary tie in the candidate superset; collisions are the
# already-accepted negligible md5/xxhash class). SCALING.md measures
# the shuffle-byte difference at 8×.
# ---------------------------------------------------------------------------

@register(
    "x31b_bigram_topk_twopass",
    r"""
    WITH toks AS (
      SELECT lang, string_split_regex(trim(text), '\s+') AS t
      FROM documents WHERE length(trim(text)) > 0
    ),
    grams AS (
      SELECT lang, unnest(list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1])) AS bigram
      FROM toks
    ),
    counted AS (
      SELECT lang, bigram, COUNT(*) AS freq FROM grams GROUP BY lang, bigram
    )
    SELECT lang, bigram, freq,
           CAST(row_number() OVER (PARTITION BY lang ORDER BY freq DESC, bigram) AS INT) AS rk
    FROM counted
    QUALIFY rk <= 10
    """,
)
def x31b_bigram_topk_twopass(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = T(spark, sf_dir, "documents")
    return text.ngram_topk(d, "lang", "text", n=2, k=10, two_pass=True)


# ---------------------------------------------------------------------------
# x32 — PII / pattern redaction over the events payload: the chained
# regexp_replace scrub (emails → IPs → phone-ish runs → bare numbers)
# plus an audit count of spans redacted. Pure codegen projection.
# The oracle replays the chain stage-by-stage (DuckDB regexp_replace
# needs the 'g' flag; Spark's is global by default).
# ---------------------------------------------------------------------------

@register(
    "x32_pii_redact",
    r"""
    WITH r0 AS (SELECT event_id, props AS s FROM events),
    r1 AS (
      SELECT event_id,
             len(regexp_extract_all(s, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS c1,
             regexp_replace(s, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g') AS s
      FROM r0
    ),
    r2 AS (
      SELECT event_id, c1,
             len(regexp_extract_all(s, '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b')) AS c2,
             regexp_replace(s, '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b', '<IP>', 'g') AS s
      FROM r1
    ),
    r3 AS (
      SELECT event_id, c1, c2,
             len(regexp_extract_all(s, '(?:\B\+|\b)[0-9][0-9 ()-]{6,}[0-9]\b')) AS c3,
             regexp_replace(s, '(?:\B\+|\b)[0-9][0-9 ()-]{6,}[0-9]\b', '<PHONE>', 'g') AS s
      FROM r2
    ),
    r4 AS (
      SELECT event_id, c1, c2, c3,
             len(regexp_extract_all(s, '[0-9]+')) AS c4,
             regexp_replace(s, '[0-9]+', '<NUM>', 'g') AS s
      FROM r3
    )
    SELECT event_id, s AS props_redacted, CAST(c1 + c2 + c3 + c4 AS INT) AS n_redactions
    FROM r4
    """,
)
def x32_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = T(spark, sf_dir, "events")
    return e.select(
        "event_id",
        text.redact_pii("props").alias("props_redacted"),
        text.redaction_count("props").cast("int").alias("n_redactions"),
    )


# ---------------------------------------------------------------------------
# x33 — BPE-ish regex pretokenization stats: GPT-2-style pretokenizer
# (lookahead-free Java∩RE2 subset) counted against the whitespace
# tokenizer — the standard "token budget" pass of a corpus ingest.
# ---------------------------------------------------------------------------

@register(
    "x33_bpe_token_stats",
    r"""
    WITH t AS (
      SELECT doc_id, n_chars,
             CASE WHEN length(trim(text)) = 0 THEN 0
                  ELSE len(string_split_regex(trim(text), '\s+')) END AS n_ws_tokens,
             len(list_filter(
                   regexp_extract_all(text, '''(?:s|t|re|ve|m|ll|d)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+'),
                   x -> length(trim(x)) > 0)) AS n_bpe
      FROM documents
    )
    SELECT doc_id,
           CAST(n_ws_tokens AS INT) AS n_ws_tokens,
           CAST(n_bpe AS INT) AS n_bpe_tokens,
           CAST(n_chars AS DOUBLE) / greatest(n_bpe, 1) AS chars_per_bpe_token
    FROM t
    """,
)
def x33_bpe_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = T(spark, sf_dir, "documents")
    n_bpe = text.bpe_token_count("text")
    return d.select(
        "doc_id",
        text.token_count("text").alias("n_ws_tokens"),
        n_bpe.alias("n_bpe_tokens"),
        (F.col("n_chars").cast("double") / F.greatest(n_bpe, F.lit(1)))
        .alias("chars_per_bpe_token"),
    )


# ---------------------------------------------------------------------------
# d16 — cross-run NEAR-dup dedup against a MinHash band store (the
# FineWeb/RefinedWeb cross-dump pattern): within-batch LSH dedup with
# exact verify, then a band-collision screen against signatures of
# everything prior runs admitted — no prior text needed.
#
# ORACLE NOTE (the d14 playbook, round 9): the SQL below is the
# EXACT-path twin — within-batch exact-Jaccard dedup (d13's recursive
# CTE over the batch deciles) followed by an exact-Jaccard>=0.5 screen
# against the STORE deciles' md5 shingles — not a SQL transcription of
# the band screen (xxhash64 signatures are not SQL-expressible). Using
# it as d16's value oracle is sound because ADMIT-SET EQUALITY between
# the LSH route and the exact route at threshold 0.5 with the pinned
# num_perm=32 / rows_per_band=4 profile is a TESTED PROPERTY at the
# oracle SFs (tests/test_llm_ops.py::
# test_incremental_near_dedup_equals_exact_screen, run at sf0.01 and
# the sf0.1 stretch). The profile matters on BOTH sides: 8 bands of 4
# rows keeps per-band false-collision probability at J~0.05 near 1e-5
# (rows_per_band=2 deterministically over-screens 3 fixture docs whose
# max store-J is <=0.053; rows_per_band=1 over-screens ~95% of the
# batch), while an exact duplicate still collides in every band. It is
# a property pinned at these SFs/profile, not an identity — at other
# data or profiles the band screen may legitimately differ.
# ---------------------------------------------------------------------------

@register(
    "d16_incremental_near_dedup",
    r"""
    WITH RECURSIVE
    b AS (SELECT doc_id, lang, string_split_regex(trim(text), '\s+') AS t
          FROM documents WHERE doc_id % 10 >= 4),
    docs AS (SELECT doc_id, t FROM b WHERE len(t) >= 3),
    sh AS (
      SELECT DISTINCT doc_id,
             unnest(list_transform(range(1, len(t) - 1), i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS shingle
      FROM docs
    ),
    cnt AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
    pairs AS (
      SELECT a.doc_id AS id_a, b2.doc_id AS id_b, COUNT(*) AS inter
      FROM sh a JOIN sh b2 ON a.shingle = b2.shingle AND a.doc_id < b2.doc_id
      GROUP BY 1, 2
    ),
    sim AS (
      SELECT id_a, id_b FROM pairs
      JOIN cnt ca ON id_a = ca.doc_id
      JOIN cnt cb ON id_b = cb.doc_id
      WHERE inter / (ca.n + cb.n - inter) >= 0.5
    ),
    edges AS (
      SELECT id_a AS src, id_b AS dst FROM sim
      UNION ALL
      SELECT id_b, id_a FROM sim
    ),
    reach AS (
      SELECT doc_id AS a, doc_id AS b FROM b
      UNION
      SELECT r.a, e.dst FROM reach r JOIN edges e ON e.src = r.b
    ),
    comp AS (SELECT a AS doc_id, MIN(b) AS component FROM reach GROUP BY a),
    surv AS (
      SELECT b.doc_id, b.lang FROM b JOIN comp USING (doc_id)
      WHERE comp.component = comp.doc_id
    ),
    stoks AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
              FROM documents WHERE doc_id % 10 < 6),
    ssh AS (
      SELECT DISTINCT doc_id,
             unnest(list_transform(range(1, len(t) - 1), i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS shingle
      FROM stoks WHERE len(t) >= 3
    ),
    scnt AS (SELECT doc_id, COUNT(*) AS n FROM ssh GROUP BY doc_id),
    xpairs AS (
      SELECT a.doc_id AS bid, s.doc_id AS sid, COUNT(*) AS inter
      FROM sh a JOIN ssh s ON a.shingle = s.shingle
      GROUP BY 1, 2
    ),
    hits AS (
      SELECT DISTINCT bid FROM xpairs
      JOIN cnt ON bid = cnt.doc_id
      JOIN scnt ON sid = scnt.doc_id
      WHERE inter / (cnt.n + scnt.n - inter) >= 0.5
    )
    SELECT doc_id, lang FROM surv
    WHERE NOT EXISTS (SELECT 1 FROM hits WHERE hits.bid = surv.doc_id)
    """,
)
def d16_incremental_near_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = T(spark, sf_dir, "documents")
    store = dedup_fuzzy.band_table(
        d.filter(F.col("doc_id") % 10 < 6), num_perm=32, rows_per_band=4)
    batch = d.filter(F.col("doc_id") % 10 >= 4)
    admitted, _bands = dedup_fuzzy.incremental_near_dedup(
        batch, store, num_perm=32, rows_per_band=4)
    return admitted.select("doc_id", "lang")


# ---------------------------------------------------------------------------
# x34 — corpus summary profile: the per-source snapshot a corpus owner
# watches per ingest (doc counts, token budget, language spread). One
# map-side-combinable multi-aggregation; integer sums + one exact
# division, so the whole profile is value-hash oracle-able.
# ---------------------------------------------------------------------------

@register(
    "x34_corpus_summary",
    r"""
    SELECT source,
           COUNT(*) AS n_docs,
           -- DuckDB SUM(BIGINT) returns HUGEINT (-> float64 in the compare
           -- frame) where Spark emits bigint; the driver's value hash is
           -- dtype-sensitive, so normalize with the same CAST(SUM AS BIGINT)
           -- discipline every other oracle in the repo follows.
           CAST(SUM(CAST(CASE WHEN length(trim(text)) = 0 THEN 0
                    ELSE len(string_split_regex(trim(text), '\s+')) END AS BIGINT)) AS BIGINT) AS total_tokens,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           COUNT(DISTINCT lang) AS n_langs,
           MAX(n_chars) AS max_chars,
           CAST(CAST(SUM(n_chars) AS BIGINT) AS DOUBLE) / COUNT(*) AS avg_chars
    FROM documents
    GROUP BY source
    """,
)
def x34_corpus_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = T(spark, sf_dir, "documents")
    return (
        d.groupBy("source").agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(text.token_count("text").cast("bigint")).alias("total_tokens"),
            F.sum("n_chars").alias("total_chars"),
            F.countDistinct("lang").alias("n_langs"),
            F.max("n_chars").alias("max_chars"),
        )
        .withColumn("avg_chars",
                    F.col("total_chars").cast("double") / F.col("n_docs"))
    )


# ---------------------------------------------------------------------------
# c01 — the COMPOSED corpus-ingest funnel (plans/corpus.py), end to end
# with a FULL oracle: quality gate → PII redaction → cross-run exact
# dedup against a seeded fingerprint store → durable partitioned corpus
# write → store append — the artifact a production ingest deploys, not
# its stages in isolation. The wrapper runs the REAL run_corpus_ingest
# (temp out dir, reset per invocation; same persist boundaries, write
# ordering, and store lifecycle as the CLI) in exact-only mode
# (near_dedup=False: the LSH screen is xxhash-based and would drop the
# oracle to rows-only; its composed behavior is e2e-tested in
# tests/test_pipeline_e2e.py instead). The store is seeded with the
# REDACTED-text fingerprints of deciles <6 — what prior runs of this
# same funnel would have left — so the batch (deciles >=4) exercises a
# real cross-run screen with overlap. Returns the durable corpus
# (lazy read), i.e. exactly what survived.
# ---------------------------------------------------------------------------

@register(
    "c01_corpus_funnel",
    r"""
    WITH r0 AS (
      SELECT doc_id, text, source FROM documents WHERE text IS NOT NULL
    ),
    r1 AS (
      SELECT doc_id, source, text AS raw,
             regexp_replace(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g') AS s
      FROM r0
    ),
    r2 AS (
      SELECT doc_id, source, raw,
             regexp_replace(s, '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b', '<IP>', 'g') AS s
      FROM r1
    ),
    r3 AS (
      SELECT doc_id, source, raw,
             regexp_replace(s, '(?:\B\+|\b)[0-9][0-9 ()-]{6,}[0-9]\b', '<PHONE>', 'g') AS s
      FROM r2
    ),
    red AS (
      SELECT doc_id, source, raw,
             regexp_replace(s, '[0-9]+', '<NUM>', 'g') AS rtext
      FROM r3
    ),
    store AS (
      SELECT DISTINCT md5(rtext) AS fp FROM red WHERE doc_id % 10 < 6
    ),
    batch AS (
      SELECT doc_id, rtext, source FROM red
      WHERE doc_id % 10 >= 4
        AND (CASE WHEN length(trim(raw)) = 0 THEN 0
                  ELSE len(string_split_regex(trim(raw), '\s+')) END) BETWEEN 20 AND 5000
        AND len(regexp_extract_all(lower(raw), '\b(the|and|of|to|a|in|is)\b')) > 0
    ),
    canon AS (
      SELECT MIN(doc_id) AS doc_id, md5(rtext) AS fp
      FROM batch GROUP BY md5(rtext)
    ),
    surv AS (
      SELECT c.doc_id FROM canon c
      WHERE NOT EXISTS (SELECT 1 FROM store s WHERE s.fp = c.fp)
    )
    SELECT b.doc_id, b.rtext AS text, b.source
    FROM batch b JOIN surv USING (doc_id)
    """,
)
def c01_corpus_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    import hashlib
    import os
    import shutil
    import tempfile

    from spaceparts_data_pipeline_spark.plans.corpus import run_corpus_ingest

    d = T(spark, sf_dir, "documents")
    tag = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:12]
    out = os.path.join(tempfile.gettempdir(), f"c01_{tag}")
    shutil.rmtree(out, ignore_errors=True)
    # seed the fingerprint store as prior funnel runs would have: the
    # fingerprints are of REDACTED text (the funnel redacts before it
    # fingerprints, so two docs differing only in a phone number are
    # the same doc)
    d.filter(F.col("doc_id") % 10 < 6).select(
        F.md5(text.redact_pii("text")).alias("fingerprint")
    ).write.parquet(os.path.join(out, "fp_store"))

    batch = d.filter(F.col("doc_id") % 10 >= 4).select("doc_id", "text", "source")
    run_corpus_ingest(spark, batch, out, "c01run", near_dedup=False)
    return (
        spark.read.parquet(os.path.join(out, "corpus"))
        .filter(F.col("run_id") == "c01run")
        .select("doc_id", "text", "source")
    )


# ---------------------------------------------------------------------------
# c01b — the corpus-ingest funnel in C4 mode (round-7 verdict #7: the
# README's --quality-rules funnel composition, driver-checked, not just
# e2e-tested). Same run_corpus_ingest wrapper as c01, with
# quality_rules='c4': the full C4 §2.2 chain — line gate + document
# gates + the list-parameterized blocked-term stage — runs as a
# TRANSFORMATION (survivors continue with the CLEANED text), then PII
# redaction, then the store-screened exact dedup, then the durable
# corpus write. Input is the multi-line fixture derivation (_multiline;
# the raw fixture has no line structure for C4 to act on); the
# blocklist passes fixture-present phrases so that stage really drops
# docs inside the funnel. The fp store is seeded with what prior C4
# runs would have left: fingerprints of the CLEANED+redacted text of
# deciles <6. FULL oracle replaying every stage.
# ---------------------------------------------------------------------------

#: fixture-present blocklist for the c01b funnel run (stage must drop
#: real docs; ~60 of 500 sf0.01 docs contain one of these)
_C01B_TERMS: tuple[str, ...] = ("table value", "fast merge")

@register(
    "c01b_corpus_funnel_c4",
    rf"""
    WITH {_ML_CTE(8)},
    c4 AS (
      SELECT doc_id, source,
             list_filter(string_split(text, chr(10)),
                         x -> regexp_matches(x, '[.!?"]\s*$')
                              AND length(trim(x)) > 0
                              AND len(string_split_regex(trim(x), '\s+')) >= 5) AS kept,
             (NOT contains(lower(text), 'lorem ipsum')) AND (NOT contains(text, '{{')) AS doc_ok,
             len(regexp_extract_all(lower(text), '\b(table value|fast merge)\b')) > 0 AS blocked
      FROM ml WHERE text IS NOT NULL
    ),
    surv0 AS (
      SELECT doc_id, source, array_to_string(kept, chr(10)) AS s
      FROM c4 WHERE doc_ok AND len(kept) >= 3 AND NOT blocked
    ),
    r1 AS (
      SELECT doc_id, source,
             regexp_replace(s, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{{2,}}', '<EMAIL>', 'g') AS s
      FROM surv0
    ),
    r2 AS (
      SELECT doc_id, source,
             regexp_replace(s, '\b[0-9]{{1,3}}\.[0-9]{{1,3}}\.[0-9]{{1,3}}\.[0-9]{{1,3}}\b', '<IP>', 'g') AS s
      FROM r1
    ),
    r3 AS (
      SELECT doc_id, source,
             regexp_replace(s, '(?:\B\+|\b)[0-9][0-9 ()-]{{6,}}[0-9]\b', '<PHONE>', 'g') AS s
      FROM r2
    ),
    red AS (
      SELECT doc_id, source, regexp_replace(s, '[0-9]+', '<NUM>', 'g') AS rtext
      FROM r3
    ),
    store AS (
      SELECT DISTINCT md5(rtext) AS fp FROM red WHERE doc_id % 10 < 6
    ),
    batch AS (
      SELECT doc_id, rtext, source FROM red WHERE doc_id % 10 >= 4
    ),
    canon AS (
      SELECT MIN(doc_id) AS doc_id, md5(rtext) AS fp
      FROM batch GROUP BY md5(rtext)
    ),
    surv AS (
      SELECT c.doc_id FROM canon c
      WHERE NOT EXISTS (SELECT 1 FROM store s WHERE s.fp = c.fp)
    )
    SELECT b.doc_id, b.rtext AS text, b.source
    FROM batch b JOIN surv USING (doc_id)
    """,
)
def c01b_corpus_funnel_c4(spark: SparkSession, sf_dir: str) -> DataFrame:
    import hashlib
    import os
    import shutil
    import tempfile

    from spaceparts_data_pipeline_spark.plans.corpus import run_corpus_ingest

    d = _multiline(T(spark, sf_dir, "documents"), every=8)
    tag = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:12]
    out = os.path.join(tempfile.gettempdir(), f"c01b_{tag}")
    shutil.rmtree(out, ignore_errors=True)
    # seed the fp store as prior C4-mode runs would have: deciles <6,
    # passed through the SAME c4 chain (gate + clean + blocklist) and
    # redacted — the funnel fingerprints what training would see
    seed = d.filter(F.col("doc_id") % 10 < 6)
    kept = text.c4_kept_lines("text")
    seed_clean = (
        seed.filter(text.c4_doc_ok("text") & (F.size(kept) >= 3)
                    & ~text.blocked_expr("text", terms=_C01B_TERMS))
        .withColumn("text", F.array_join(kept, "\n"))
    )
    seed_clean.select(
        F.md5(text.redact_pii("text")).alias("fingerprint")
    ).write.parquet(os.path.join(out, "fp_store"))

    batch = d.filter(F.col("doc_id") % 10 >= 4).select("doc_id", "text", "source")
    run_corpus_ingest(spark, batch, out, "c01brun", near_dedup=False,
                      quality_rules="c4", blocklist_terms=_C01B_TERMS)
    return (
        spark.read.parquet(os.path.join(out, "corpus"))
        .filter(F.col("run_id") == "c01brun")
        .select("doc_id", "text", "source")
    )


# ---------------------------------------------------------------------------
# d17 — Gopher-rule quality filter (Rae et al. 2021 app. A1.1): the
# published rule set behind most modern pretrain corpora, as per-rule
# measures plus the combined gate. Every regex sits in the Java∩RE2
# subset and every ratio divides raw integer counts, so the DuckDB
# oracle replays all seven rules bit-exactly (same discipline as x32).
# ---------------------------------------------------------------------------

@register(
    "d17_gopher_quality",
    r"""
    WITH m AS (
      SELECT doc_id,
             CAST(CASE WHEN length(trim(text)) = 0 THEN 0
                  ELSE len(string_split_regex(trim(text), '\s+')) END AS BIGINT) AS n_words,
             CAST(length(regexp_replace(text, '\s+', '', 'g')) AS BIGINT) AS nonspace,
             CAST(len(regexp_extract_all(text, '(\.\.\.|[#…])')) AS BIGINT) AS symbols,
             CAST(len(regexp_extract_all(' ' || text, '\s+\S*[A-Za-z]')) AS BIGINT) AS alpha_words,
             string_split(text, chr(10)) AS lines,
             lower(text) AS low
      FROM documents
    ),
    r AS (
      SELECT doc_id, n_words, greatest(n_words, 1) AS w1,
             nonspace, symbols, alpha_words,
             greatest(CAST(len(lines) AS BIGINT), 1) AS n_lines,
             CAST(len(list_filter(lines, x -> regexp_matches(x, '^\s*[-*•]'))) AS BIGINT) AS bullet_lines,
             CAST(len(list_filter(lines, x -> regexp_matches(x, '(\.\.\.|…)\s*$'))) AS BIGINT) AS ellipsis_lines,
             CAST((CASE WHEN regexp_matches(low, '\bthe\b') THEN 1 ELSE 0 END
                 + CASE WHEN regexp_matches(low, '\bbe\b') THEN 1 ELSE 0 END
                 + CASE WHEN regexp_matches(low, '\bto\b') THEN 1 ELSE 0 END
                 + CASE WHEN regexp_matches(low, '\bof\b') THEN 1 ELSE 0 END
                 + CASE WHEN regexp_matches(low, '\band\b') THEN 1 ELSE 0 END
                 + CASE WHEN regexp_matches(low, '\bthat\b') THEN 1 ELSE 0 END
                 + CASE WHEN regexp_matches(low, '\bhave\b') THEN 1 ELSE 0 END
                 + CASE WHEN regexp_matches(low, '\bwith\b') THEN 1 ELSE 0 END) AS BIGINT) AS n_stop
      FROM m
    )
    SELECT doc_id, n_words,
           nonspace / w1 AS mean_word_len,
           symbols / w1 AS symbol_word_ratio,
           bullet_lines / n_lines AS bullet_line_frac,
           ellipsis_lines / n_lines AS ellipsis_line_frac,
           alpha_words / w1 AS alpha_word_frac,
           n_stop AS n_stop_distinct,
           n_words >= 50 AND n_words <= 100000
             AND nonspace / w1 >= 3 AND nonspace / w1 <= 10
             AND symbols / w1 < 0.1
             AND bullet_lines / n_lines < 0.9
             AND ellipsis_lines / n_lines < 0.3
             AND alpha_words / w1 > 0.8
             AND n_stop >= 2 AS gopher_pass
    FROM r
    """,
)
def d17_gopher_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = T(spark, sf_dir, "documents")
    return text.gopher_quality(d)


# ---------------------------------------------------------------------------
# d18 — C4-style line/document cleanup (Raffel et al. 2020 §2.2): a
# TRANSFORMATION (the cleaned text), not just a flag — terminal-punct +
# ≥5-word line gate, then document gates (no '{', no "lorem ipsum",
# ≥3 surviving lines). Pure array lambdas; full oracle. Runs on the
# deterministic multi-line derivation of the fixture (see _multiline) —
# the raw fixture is single-line/punctuation-free, which made this
# driver row vacuous (0 rows both engines, r07 ADVICE); now 450/500
# docs pass with trailing short lines genuinely stripped.
# ---------------------------------------------------------------------------

@register(
    "d18_c4_line_filter",
    rf"""
    WITH {_ML_CTE(8)},
    k AS (
      SELECT doc_id,
             list_filter(string_split(text, chr(10)),
                         x -> regexp_matches(x, '[.!?"]\s*$')
                              AND length(trim(x)) > 0
                              AND len(string_split_regex(trim(x), '\s+')) >= 5) AS kept,
             (NOT contains(lower(text), 'lorem ipsum')) AND (NOT contains(text, '{{')) AS doc_ok
      FROM ml
    )
    SELECT doc_id, CAST(len(kept) AS BIGINT) AS n_lines_kept,
           array_to_string(kept, chr(10)) AS clean_text
    FROM k WHERE doc_ok AND len(kept) >= 3
    """,
)
def d18_c4_line_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = T(spark, sf_dir, "documents")
    return text.c4_line_filter(_multiline(d, every=8))


# ---------------------------------------------------------------------------
# d19 — duplicated-passage profile (Lee et al. 2021): substring-level
# duplication the whole-document dedup family can't see — per-doc
# fraction of word-5-gram positions whose gram recurs anywhere in the
# corpus. Grams shuffle as md5 hashes only; FULL oracle.
# ---------------------------------------------------------------------------

@register(
    "d19_duplicate_passages",
    r"""
    WITH toks AS (
      SELECT doc_id, string_split_regex(trim(text), '\s+') AS t FROM documents
    ),
    g AS (
      SELECT doc_id,
             unnest(list_transform(range(1, len(t) - 3),
                                   i -> md5(array_to_string(t[i:i+4], ' ')))) AS h
      FROM toks
    ),
    c AS (SELECT doc_id, COUNT(*) OVER (PARTITION BY h) AS c_glob FROM g),
    per_doc AS (
      SELECT doc_id,
             CAST(COUNT(*) AS BIGINT) AS n_grams,
             CAST(SUM(CASE WHEN c_glob > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_grams
      FROM c GROUP BY doc_id
    )
    SELECT d.doc_id,
           CAST(COALESCE(n_grams, 0) AS BIGINT) AS n_grams,
           CAST(COALESCE(n_dup_grams, 0) AS BIGINT) AS n_dup_grams,
           CASE WHEN COALESCE(n_grams, 0) > 0
                THEN COALESCE(n_dup_grams, 0) / COALESCE(n_grams, 0) END AS dup_gram_frac,
           COALESCE(CASE WHEN COALESCE(n_grams, 0) > 0
                         THEN COALESCE(n_dup_grams, 0) / COALESCE(n_grams, 0) END > 0.3,
                    FALSE) AS dup_passage_flag
    FROM documents d LEFT JOIN per_doc USING (doc_id)
    """,
)
def d19_duplicate_passages(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = T(spark, sf_dir, "documents")
    return text.duplicate_passages(d, k=5, flag_threshold=0.3)


# ---------------------------------------------------------------------------
# d22 — exact-substring dedup REMOVAL (round-9 verdict #2): the dedup
# Lee et al. 2021 actually run, completing d19's profile — duplicated
# word-5-gram passages are CUT from every document (both copies, as
# published), unique text survives, whole-doc dups reduce to ''. Same
# single gram-scale md5 window as d19; reconstruction is per-doc array
# work (hash-based array_except — O(T + dups·k), no lambda-CSE trap).
# FULL oracle: the removal decision is relational (positions covered
# by a >1-count gram), so DuckDB replays it with joins + string_agg.
# ---------------------------------------------------------------------------

@register(
    "d22_substring_dedup",
    r"""
    WITH toks AS (
      SELECT doc_id,
             CASE WHEN text IS NULL THEN NULL
                  WHEN length(trim(text)) = 0 THEN CAST([] AS VARCHAR[])
                  ELSE string_split_regex(trim(text), '\s+') END AS t
      FROM documents
    ),
    g AS (
      SELECT doc_id,
             unnest(range(1, len(t) - 3)) - 1 AS p,
             unnest(list_transform(range(1, len(t) - 3),
                                   i -> md5(array_to_string(t[i:i+4], ' ')))) AS h
      FROM toks
    ),
    c AS (SELECT doc_id, p, COUNT(*) OVER (PARTITION BY h) AS c_glob FROM g),
    dup AS (SELECT doc_id, p FROM c WHERE c_glob > 1),
    tok AS (
      SELECT doc_id,
             unnest(range(1, len(t) + 1)) - 1 AS j,
             unnest(t) AS w
      FROM toks
    ),
    removed AS (
      SELECT DISTINCT tok.doc_id, tok.j
      FROM tok JOIN dup ON dup.doc_id = tok.doc_id
                        AND tok.j BETWEEN dup.p AND dup.p + 4
    ),
    kept AS (
      SELECT tok.doc_id, tok.j, tok.w FROM tok
      WHERE NOT EXISTS (SELECT 1 FROM removed r
                        WHERE r.doc_id = tok.doc_id AND r.j = tok.j)
    ),
    agg AS (
      SELECT doc_id, string_agg(w, ' ' ORDER BY j) AS clean_text
      FROM kept GROUP BY doc_id
    ),
    rem AS (SELECT doc_id, COUNT(*) AS n_removed FROM removed GROUP BY doc_id)
    SELECT d.doc_id,
           CASE WHEN d.text IS NULL THEN NULL
                ELSE COALESCE(agg.clean_text, '') END AS clean_text,
           CAST(CASE WHEN t.t IS NULL THEN 0 ELSE len(t.t) END AS BIGINT) AS n_tokens,
           CAST(COALESCE(rem.n_removed, 0) AS BIGINT) AS n_removed_tokens
    FROM documents d
    JOIN toks t USING (doc_id)
    LEFT JOIN agg USING (doc_id)
    LEFT JOIN rem USING (doc_id)
    """,
)
def d22_substring_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = T(spark, sf_dir, "documents")
    return text.substring_dedup(d, k=5)


# ---------------------------------------------------------------------------
# d23 — character-bigram LM quality score (the CCNet / KenLM-style
# model-based quality signal next to the rule-based Gopher/C4 gates):
# train a Laplace-smoothed char-bigram LM on the lang='en' slice, score
# EVERY doc by total + per-gram negative log-likelihood. Fully
# relational (model join + broadcast), so it gets a FULL oracle —
# per-gram terms rounded to 6dp before the decimal multiply-sum so both
# engines are bit-identical.
# ---------------------------------------------------------------------------

@register(
    "d23_charlm_quality",
    """
    WITH train AS (
      SELECT text FROM documents
      WHERE lang = 'en' AND text IS NOT NULL AND length(text) >= 2
    ),
    tg AS (
      SELECT unnest(list_transform(range(1, length(text)),
                                   i -> substr(text, CAST(i AS INT), 2))) AS g
      FROM train
    ),
    model AS (SELECT g, COUNT(*) AS c12 FROM tg GROUP BY g),
    ctx AS (
      SELECT substr(g, 1, 1) AS c1, CAST(SUM(c12) AS BIGINT) AS c1n
      FROM model GROUP BY 1
    ),
    vocab AS (
      SELECT COUNT(DISTINCT ch) AS v FROM (
        SELECT unnest(list_transform(range(1, length(text) + 1),
                                     i -> substr(text, CAST(i AS INT), 1))) AS ch
        FROM train)
    ),
    dg AS (
      SELECT doc_id,
             unnest(list_transform(range(1, length(text)),
                                   i -> substr(text, CAST(i AS INT), 2))) AS g
      FROM documents WHERE text IS NOT NULL AND length(text) >= 2
    ),
    dgc AS (SELECT doc_id, g, COUNT(*) AS dcnt FROM dg GROUP BY doc_id, g),
    terms AS (
      SELECT doc_id, dcnt,
             round(ln(CAST(COALESCE(c1n, 0) + v AS DOUBLE)
                      / CAST(COALESCE(c12, 0) + 1 AS DOUBLE)), 6) AS term6
      FROM dgc
      LEFT JOIN model USING (g)
      LEFT JOIN ctx ON substr(g, 1, 1) = ctx.c1
      CROSS JOIN vocab
    ),
    per_doc AS (
      SELECT doc_id, CAST(SUM(dcnt) AS BIGINT) AS n_grams,
             CAST(CAST(SUM(CAST(dcnt * term6 AS DECIMAL(27,6))) AS VARCHAR) AS DOUBLE) AS nll6
      FROM terms GROUP BY doc_id
    )
    SELECT d.doc_id, d.lang,
           CAST(COALESCE(p.n_grams, 0) AS BIGINT) AS n_grams,
           COALESCE(p.nll6, 0.0) AS nll6,
           CASE WHEN COALESCE(p.n_grams, 0) = 0 THEN 0.0
                ELSE COALESCE(p.nll6, 0.0) / p.n_grams END AS avg_nll
    FROM documents d LEFT JOIN per_doc p USING (doc_id)
    """,
)
def d23_charlm_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = T(spark, sf_dir, "documents")
    train = d.filter(
        (F.col("lang") == "en") & F.col("text").isNotNull() & (F.length("text") >= 2))
    return text.charlm_nll(d, train, keep_cols=("lang",))


# ---------------------------------------------------------------------------
# d24 — DSIR importance weights (Xie et al. 2023, "Data Selection for
# Language Models via Importance Resampling"): score every raw-pool doc
# by the log importance weight of its hashed unigram+bigram features
# under a target-vs-raw bag-of-hashed-ngrams model (target = the
# lang='en' slice). The distribution-matching selection signal next to
# d23's model-based NLL and the d17/d18 rule gates. Fully relational
# (B=512 md5 buckets, broadcast log-ratio table), so FULL oracle —
# per-bucket terms rounded to 6dp before the decimal multiply-sum.
# ---------------------------------------------------------------------------

@register(
    "d24_dsir_importance",
    """
    WITH pool AS (
      SELECT doc_id, lang, string_split_regex(trim(text), '\\s+') AS w
      FROM documents
      WHERE text IS NOT NULL AND length(trim(text)) > 0
    ),
    grams AS (
      SELECT doc_id, lang, unnest(w) AS g FROM pool
      UNION ALL
      SELECT doc_id, lang,
             unnest(list_transform(range(1, len(w)),
                                   i -> w[CAST(i AS INT)] || ' ' || w[CAST(i AS INT) + 1])) AS g
      FROM pool
    ),
    feats AS (
      SELECT doc_id, lang,
             ('0x' || substr(md5(g), 1, 8))::BIGINT % 512 AS b
      FROM grams
    ),
    tcnt AS (SELECT b, COUNT(*) AS ct FROM feats WHERE lang = 'en' GROUP BY b),
    ttot AS (SELECT CAST(SUM(ct) AS DOUBLE) AS tn FROM tcnt),
    rcnt AS (SELECT b, COUNT(*) AS cr FROM feats GROUP BY b),
    rtot AS (SELECT CAST(SUM(cr) AS DOUBLE) AS rn FROM rcnt),
    ratio AS (
      SELECT b, round(ln(((COALESCE(ct, 0) + 1.0) / (tn + 512.0))
                         / ((cr + 1.0) / (rn + 512.0))), 6) AS r6
      FROM rcnt LEFT JOIN tcnt USING (b) CROSS JOIN ttot CROSS JOIN rtot
    ),
    dgc AS (SELECT doc_id, b, COUNT(*) AS dcnt FROM feats GROUP BY doc_id, b),
    per_doc AS (
      SELECT doc_id, CAST(SUM(dcnt) AS BIGINT) AS n_feats,
             CAST(CAST(SUM(CAST(dcnt * r6 AS DECIMAL(27,6))) AS VARCHAR) AS DOUBLE) AS logw6
      FROM dgc JOIN ratio USING (b) GROUP BY doc_id
    )
    SELECT d.doc_id, d.lang,
           CAST(COALESCE(p.n_feats, 0) AS BIGINT) AS n_feats,
           COALESCE(p.logw6, 0.0) AS logw6,
           CASE WHEN COALESCE(p.n_feats, 0) = 0 THEN 0.0
                ELSE COALESCE(p.logw6, 0.0) / p.n_feats END AS avg_logw
    FROM documents d LEFT JOIN per_doc p USING (doc_id)
    """,
)
def d24_dsir_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = T(spark, sf_dir, "documents")
    return text.dsir_importance(d, d.filter(F.col("lang") == "en"),
                                keep_cols=("lang",))


# ---------------------------------------------------------------------------
# d25 — SemDeDup (Abbas et al. 2023): semantic dedup with k-means
# blocking — the scale path between d10's exact quadratic and e03b's
# LSH. Reuses e04b's deterministic refined-quantizer machinery (md5
# hash-sample seeds + one decimal-mean Lloyd pass) for the blocking,
# then d10's min-id survivor decision within cells. FULL oracle: the
# e04b refined-centroid CTE chain verbatim, then the cell-blocked pair
# join with the identical cosine fold.
# ---------------------------------------------------------------------------

@register(
    "d25_semdedup",
    f"""
    WITH cents AS (
      SELECT vec_id AS centroid_id, embedding AS cv FROM embeddings
      ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 16
    ),
    assigned0 AS (
      SELECT vec_id AS neighbor_id, embedding AS nv, centroid_id FROM (
        SELECT e.vec_id, e.embedding, c.centroid_id,
               row_number() OVER (
                 PARTITION BY e.vec_id
                 ORDER BY {_COS.format(a='e.embedding', b='c.cv')} DESC, c.centroid_id ASC
               ) AS r
        FROM embeddings e CROSS JOIN cents c
      ) WHERE r = 1
    ),
    vals AS (
      SELECT centroid_id, i AS pos, CAST(nv[i] AS DOUBLE) AS val
      FROM assigned0 CROSS JOIN range(1, 65) t(i)
    ),
    means AS (
      SELECT centroid_id, pos,
             CAST(CAST(SUM(CAST(val AS DECIMAL(27,12))) AS VARCHAR) AS DOUBLE) / COUNT(*) AS m
      FROM vals GROUP BY centroid_id, pos
    ),
    refined AS (
      SELECT c.centroid_id, COALESCE(mv.cv, c.cv) AS cv
      FROM cents c LEFT JOIN (
        SELECT centroid_id, list(m ORDER BY pos) AS cv FROM means GROUP BY centroid_id
      ) mv USING (centroid_id)
    ),
    assigned AS (
      SELECT vec_id AS neighbor_id, embedding AS nv, centroid_id FROM (
        SELECT e.vec_id, e.embedding, c.centroid_id,
               row_number() OVER (
                 PARTITION BY e.vec_id
                 ORDER BY {_COS.format(a='e.embedding', b='c.cv')} DESC, c.centroid_id ASC
               ) AS r
        FROM embeddings e CROSS JOIN refined c
      ) WHERE r = 1
    ),
    p AS (
      SELECT a.neighbor_id AS id_a, b.neighbor_id AS id_b,
             {_COS.format(a='a.nv', b='b.nv')} AS cos
      FROM assigned a JOIN assigned b USING (centroid_id)
      WHERE a.neighbor_id < b.neighbor_id
    ),
    d AS (SELECT id_b AS doc_id, MIN(id_a) AS dup_of FROM p WHERE cos >= 0.35 GROUP BY id_b)
    SELECT doc.doc_id, d.dup_of, d.dup_of IS NOT NULL AS is_dup
    FROM documents doc LEFT JOIN d USING (doc_id)
    """,
)
def d25_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = T(spark, sf_dir, "documents")
    embs = T(spark, sf_dir, "embeddings")
    return similarity.semdedup(docs, embs, threshold=0.35,
                               n_centroids=16, kmeans_iters=1)


# ---------------------------------------------------------------------------
# c02 — the selection TRIAD composed as one declarative pipeline: the
# model-based charlm NLL gate (d23's body) AND the DSIR
# distribution-matching gate (d24's body) feed a per-source
# token-budget cap (x35's two-phase machinery) — i.e. "keep docs that
# look well-formed AND look like the target domain, then mix under
# per-source budgets", the standard pretrain selection recipe as a
# single Catalyst plan. FULL oracle: both scoring bodies verbatim,
# intersected, then the naive single-window cumsum SQL (equality with
# the two-phase route is x35's own pinned property).
# Thresholds are fixture-calibrated constants (see SCALING/d23-d24
# distribution notes): NLL <= 1.76 cuts the worst-formed tail,
# avg_logw >= -0.005 keeps the en-like mass.
# ---------------------------------------------------------------------------

@register(
    "c02_selection_pipeline",
    r"""
    WITH train AS (
      SELECT text FROM documents
      WHERE lang = 'en' AND text IS NOT NULL AND length(text) >= 2
    ),
    tg AS (
      SELECT unnest(list_transform(range(1, length(text)),
                                   i -> substr(text, CAST(i AS INT), 2))) AS g
      FROM train
    ),
    model AS (SELECT g, COUNT(*) AS c12 FROM tg GROUP BY g),
    ctx AS (
      SELECT substr(g, 1, 1) AS c1, CAST(SUM(c12) AS BIGINT) AS c1n
      FROM model GROUP BY 1
    ),
    vocab AS (
      SELECT COUNT(DISTINCT ch) AS v FROM (
        SELECT unnest(list_transform(range(1, length(text) + 1),
                                     i -> substr(text, CAST(i AS INT), 1))) AS ch
        FROM train)
    ),
    qdg AS (
      SELECT doc_id,
             unnest(list_transform(range(1, length(text)),
                                   i -> substr(text, CAST(i AS INT), 2))) AS g
      FROM documents WHERE text IS NOT NULL AND length(text) >= 2
    ),
    qdgc AS (SELECT doc_id, g, COUNT(*) AS dcnt FROM qdg GROUP BY doc_id, g),
    qterms AS (
      SELECT doc_id, dcnt,
             round(ln(CAST(COALESCE(c1n, 0) + v AS DOUBLE)
                      / CAST(COALESCE(c12, 0) + 1 AS DOUBLE)), 6) AS term6
      FROM qdgc
      LEFT JOIN model USING (g)
      LEFT JOIN ctx ON substr(g, 1, 1) = ctx.c1
      CROSS JOIN vocab
    ),
    nll_doc AS (
      SELECT doc_id, CAST(SUM(dcnt) AS BIGINT) AS n_grams,
             CAST(CAST(SUM(CAST(dcnt * term6 AS DECIMAL(27,6))) AS VARCHAR) AS DOUBLE) AS nll6
      FROM qterms GROUP BY doc_id
    ),
    pool AS (
      SELECT doc_id, lang, string_split_regex(trim(text), '\s+') AS w
      FROM documents
      WHERE text IS NOT NULL AND length(trim(text)) > 0
    ),
    wgrams AS (
      SELECT doc_id, lang, unnest(w) AS g FROM pool
      UNION ALL
      SELECT doc_id, lang,
             unnest(list_transform(range(1, len(w)),
                                   i -> w[CAST(i AS INT)] || ' ' || w[CAST(i AS INT) + 1])) AS g
      FROM pool
    ),
    wfeats AS (
      SELECT doc_id, lang,
             ('0x' || substr(md5(g), 1, 8))::BIGINT % 512 AS b
      FROM wgrams
    ),
    wtcnt AS (SELECT b, COUNT(*) AS ct FROM wfeats WHERE lang = 'en' GROUP BY b),
    wttot AS (SELECT CAST(SUM(ct) AS DOUBLE) AS tn FROM wtcnt),
    wrcnt AS (SELECT b, COUNT(*) AS cr FROM wfeats GROUP BY b),
    wrtot AS (SELECT CAST(SUM(cr) AS DOUBLE) AS rn FROM wrcnt),
    wratio AS (
      SELECT b, round(ln(((COALESCE(ct, 0) + 1.0) / (tn + 512.0))
                         / ((cr + 1.0) / (rn + 512.0))), 6) AS r6
      FROM wrcnt LEFT JOIN wtcnt USING (b) CROSS JOIN wttot CROSS JOIN wrtot
    ),
    wdgc AS (SELECT doc_id, b, COUNT(*) AS dcnt FROM wfeats GROUP BY doc_id, b),
    w_doc AS (
      SELECT doc_id, CAST(SUM(dcnt) AS BIGINT) AS n_feats,
             CAST(CAST(SUM(CAST(dcnt * r6 AS DECIMAL(27,6))) AS VARCHAR) AS DOUBLE) AS logw6
      FROM wdgc JOIN wratio USING (b) GROUP BY doc_id
    ),
    keep AS (
      SELECT q.doc_id FROM nll_doc q JOIN w_doc w USING (doc_id)
      WHERE q.n_grams > 0 AND q.nll6 / q.n_grams <= 1.76
        AND w.n_feats > 0 AND w.logw6 / w.n_feats >= -0.005
    ),
    t AS (
      SELECT d.doc_id, d.source,
             CAST(CASE WHEN d.text IS NULL OR length(trim(d.text)) = 0 THEN 0
                  ELSE len(string_split_regex(trim(d.text), '\s+')) END AS BIGINT) AS n_tokens
      FROM documents d JOIN keep USING (doc_id)
    ),
    c AS (
      SELECT doc_id, source, n_tokens,
             CAST(SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                                      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
      FROM t
    )
    SELECT doc_id, source, n_tokens, cum_tokens
    FROM c WHERE cum_tokens <= 1500
    """,
)
def c02_selection_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = T(spark, sf_dir, "documents")
    train = d.filter(
        (F.col("lang") == "en") & F.col("text").isNotNull() & (F.length("text") >= 2))
    nll = text.charlm_nll(d, train)
    dsir = text.dsir_importance(d, d.filter(F.col("lang") == "en"))
    keep = (
        nll.filter((F.col("n_grams") > 0) & (F.col("avg_nll") <= 1.76))
        .select("doc_id")
        .join(dsir.filter((F.col("n_feats") > 0)
                          & (F.col("avg_logw") >= -0.005)).select("doc_id"),
              "doc_id")
    )
    survivors = d.join(keep, "doc_id", "left_semi")
    return text.token_budget_mix(survivors, default_budget=1500)


# ---------------------------------------------------------------------------
# x35 — token-budget data mixing: per-source contribution caps in
# TOKENS (the pretrain mixing-weights op — cap the crawl, keep the
# curated sources), deterministic id-order selection, one window per
# source. FULL oracle with the identical running-sum window.
# ---------------------------------------------------------------------------

@register(
    "x35_token_budget_mix",
    r"""
    WITH t AS (
      SELECT doc_id, source,
             CAST(CASE WHEN text IS NULL OR length(trim(text)) = 0 THEN 0
                  ELSE len(string_split_regex(trim(text), '\s+')) END AS BIGINT) AS n_tokens
      FROM documents
    ),
    c AS (
      SELECT doc_id, source, n_tokens,
             CAST(SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                                      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
      FROM t
    )
    SELECT doc_id, source, n_tokens, cum_tokens
    FROM c
    WHERE cum_tokens <= CASE WHEN source = 'src0' THEN 200 ELSE 700 END
    """,
)
def x35_token_budget_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = T(spark, sf_dir, "documents")
    return text.token_budget_mix(d, default_budget=700, budgets={"src0": 200})


# ---------------------------------------------------------------------------
# x36 — deterministic corpus shuffle: reproducible pseudo-random
# (shard, position) training order from md5(seed:id) — no rand(), so
# the permutation is engine/run/partitioning-stable and FULL-oracle.
# One rank window per shard (never a global ORDER BY).
# ---------------------------------------------------------------------------

@register(
    "x36_corpus_shuffle",
    r"""
    WITH k AS (
      SELECT doc_id,
             md5('epoch0' || ':' || CAST(doc_id AS VARCHAR)) AS key
      FROM documents
    ),
    s AS (
      SELECT doc_id, key,
             CAST(CAST(('0x' || substr(key, 1, 8)) AS BIGINT) % 8 AS INTEGER) AS shard
      FROM k
    )
    SELECT doc_id, shard,
           CAST(ROW_NUMBER() OVER (PARTITION BY shard ORDER BY key, doc_id) - 1 AS BIGINT) AS position
    FROM s
    """,
)
def x36_corpus_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = T(spark, sf_dir, "documents")
    return text.corpus_shuffle(d, seed="epoch0", n_shards=8)


# ---------------------------------------------------------------------------
# d20 — C4-style blocked-term filter: per-doc blocked word/phrase hit
# count + flag (Raffel et al. 2020 §2.2's blocklist stage; the list is
# a parameter). Pure projection, zero shuffle; FULL oracle. The driver
# query passes phrases that OCCUR in the fixture vocabulary (the demo
# DEFAULT_BLOCKLIST's marketing phrases never appear in the synthetic
# word-soup, which would make every count 0 and the row near-vacuous);
# at sf0.01 each term hits ~30-40 docs, so counts and flags carry real
# discrimination through the value hash.
# ---------------------------------------------------------------------------

#: fixture-present phrases for the driver row (the operator itself
#: defaults to DEFAULT_BLOCKLIST; deployments pass their own list)
_D20_TERMS: tuple[str, ...] = ("table value", "fast merge", "window table")

@register(
    "d20_blocklist_filter",
    r"""
    SELECT doc_id,
           CAST(len(regexp_extract_all(lower(text),
                '\b(table value|fast merge|window table)\b')) AS BIGINT)
             AS n_blocked_terms,
           len(regexp_extract_all(lower(text),
                '\b(table value|fast merge|window table)\b')) > 0
             AS blocked
    FROM documents
    """,
)
def d20_blocklist_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = T(spark, sf_dir, "documents")
    return text.blocklist_filter(d, terms=_D20_TERMS)


# ---------------------------------------------------------------------------
# d21 — line-level repetition rules (the Gopher repetition half d11's
# token stats don't cover): duplicate-line fraction + duplicate-line
# CHARACTER fraction, flagged past the published 0.30/0.20 thresholds.
# Pure array lambdas; FULL oracle with the identical nested lambdas.
# Runs on the 2-token-line multi-line derivation (see _multiline): the
# raw single-line fixture made every fraction trivially 0; at 2-token
# lines 181/500 docs have genuine duplicate lines and several trip the
# char-fraction flag, so the driver row checks real rule behavior.
# ---------------------------------------------------------------------------

@register(
    "d21_line_repetition",
    rf"""
    WITH {_ML_CTE(2)},
    l AS (
      SELECT doc_id,
             list_filter(string_split(text, chr(10)), x -> length(trim(x)) > 0) AS lines
      FROM ml
    ),
    m AS (
      SELECT doc_id,
             CAST(len(lines) AS BIGINT) AS n_lines,
             CAST(len(list_distinct(lines)) AS BIGINT) AS n_distinct_lines,
             CAST(COALESCE(list_sum(list_transform(lines, x -> length(x))), 0) AS BIGINT) AS total_chars,
             CAST(COALESCE(list_sum(list_transform(lines,
                  x -> CASE WHEN len(list_filter(lines, y -> y = x)) > 1
                            THEN length(x) ELSE 0 END)), 0) AS BIGINT) AS dup_chars
      FROM l
    )
    SELECT doc_id, n_lines, n_distinct_lines,
           CASE WHEN n_lines > 0 THEN 1 - n_distinct_lines / n_lines END AS dup_line_frac,
           CASE WHEN n_lines > 0 AND total_chars > 0 THEN dup_chars / total_chars END AS dup_line_char_frac,
           COALESCE(CASE WHEN n_lines > 0 THEN 1 - n_distinct_lines / n_lines END > 0.30, FALSE)
             OR COALESCE(CASE WHEN n_lines > 0 AND total_chars > 0 THEN dup_chars / total_chars END > 0.20, FALSE)
             AS line_repetitive
    FROM m
    """,
)
def d21_line_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = T(spark, sf_dir, "documents")
    return text.line_repetition_stats(_multiline(d, every=2))


# ---------------------------------------------------------------------------
# x37 — BPE merge TRAINING (Sennrich et al. 2016): learn the first K
# merge rules from the corpus — per round, the most frequent adjacent
# symbol pair (ties: count DESC, lhs ASC, rhs ASC) is fused by greedy
# left-to-right non-overlapping replacement. FULL oracle: the K rounds
# unrolled mechanically (one CTE block per round, generated below) on
# the long (word, position, symbol) form — the greedy fold on the
# Spark side equals "odd offsets within each run of consecutive match
# positions" on the SQL side, a pinned test property.
# ---------------------------------------------------------------------------

_BPE_K = 8

_BPE_ROUND = r"""
    p{k} AS (
      SELECT l, r, CAST(SUM(cnt) AS BIGINT) AS c
      FROM (SELECT cnt, s AS l,
                   lead(s) OVER (PARTITION BY w ORDER BY i) AS r
            FROM pos{k})
      WHERE r IS NOT NULL GROUP BY l, r HAVING SUM(cnt) >= 2
    ),
    m{k} AS MATERIALIZED (SELECT l, r, c FROM p{k} ORDER BY c DESC, l, r LIMIT 1),
    hit{k} AS (
      SELECT q.w, q.i FROM (
        SELECT w, i, s AS l2,
               lead(s) OVER (PARTITION BY w ORDER BY i) AS r2
        FROM pos{k}
      ) q JOIN m{k} m ON q.l2 = m.l AND q.r2 = m.r
    ),
    tk{k} AS (
      SELECT w, i FROM (
        SELECT w, i, row_number() OVER (PARTITION BY w, grp ORDER BY i) AS rn
        FROM (SELECT w, i,
                     i - row_number() OVER (PARTITION BY w ORDER BY i) AS grp
              FROM hit{k})
      ) WHERE rn % 2 = 1
    ),
    reb{k} AS (
      SELECT p.w, p.cnt, p.i, p.s, (t.i IS NOT NULL) AS taken,
             lead(p.s) OVER (PARTITION BY p.w ORDER BY p.i) AS nxt
      FROM pos{k} p LEFT JOIN tk{k} t ON p.w = t.w AND p.i = t.i
    ),
    pos{k1} AS MATERIALIZED (
      SELECT w, cnt,
             CAST(row_number() OVER (PARTITION BY w ORDER BY i) AS BIGINT) AS i,
             CASE WHEN taken THEN s || nxt ELSE s END AS s
      FROM (SELECT *, lag(taken, 1, FALSE) OVER (PARTITION BY w ORDER BY i) AS ptk
            FROM reb{k})
      WHERE NOT ptk
    )"""


def _bpe_oracle(k: int) -> str:
    rounds = ",".join(_BPE_ROUND.format(k=i, k1=i + 1) for i in range(k))
    final = "\n      UNION ALL ".join(
        f"SELECT CAST({i} AS INT) AS merge_rank, l AS lhs, r AS rhs, "
        f"c AS pair_count FROM m{i}" for i in range(k))
    return rf"""
    WITH wrd AS (
      SELECT w, COUNT(*) AS cnt FROM (
        SELECT unnest(string_split_regex(trim(text), '\s+')) AS w
        FROM documents WHERE text IS NOT NULL AND length(trim(text)) > 0
      ) WHERE length(w) > 0 GROUP BY w
    ),
    pos0 AS MATERIALIZED (
      SELECT w, cnt, CAST(generate_subscripts(chars, 1) AS BIGINT) AS i,
             unnest(chars) AS s
      FROM (SELECT w, cnt,
                   list_transform(range(1, length(w) + 1),
                                  j -> substr(w, CAST(j AS INT), 1)) AS chars
            FROM wrd)
    ),{rounds}
    SELECT * FROM (
      {final}
    )
    """


@register("x37_bpe_merges", _bpe_oracle(_BPE_K))
def x37_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text.bpe_train(T(spark, sf_dir, "documents"), k=_BPE_K, min_count=2)


# ---------------------------------------------------------------------------
# x37b — GREEDY-batched BPE training (the production-vocab trainer
# path, VERDICT r12 next-round #3): per round, scan the ranked pair
# counts and accept every pair compatible with the batch so far
# (disjoint symbols, no fused-string collision), up to batch_max, then
# apply the whole batch in one fold pass. Deterministic end to end —
# ranked scan order (c DESC, l, r), _bpe_compatible predicate, cap
# truncation, greedy-fold application — so the merge table is FULLY
# oracle-able, closing the one below-house-standard validation gap
# (exact mode carried x37's oracle; greedy carried only overlap /
# compression pins).
#
# Oracle mechanics, mirroring operators/text.py:bpe_train(exact=False)
# statement for statement:
#  - pr{k}: pair counts ranked by (c DESC, l, r), truncated to the
#    SAME bounded collect window Spark scans (top_l = max(64,
#    16*batch_max)) — a compatible pair past the window is invisible
#    to BOTH engines;
#  - s{k}b{j}: the greedy max-compatible scan unrolled one CTE per
#    batch slot — slot j is the lowest-rank row after slot j-1 that is
#    _bpe_compatible with every earlier slot ({l,r} disjoint from each
#    accepted {al, ar, al||ar}, and l||r colliding with no accepted
#    al/ar). Greedy selection is PREFIX-CLOSED (the first c accepted
#    pairs never depend on the cap), so selecting batch_max slots and
#    truncating to this round's cap (k − merges-so-far, via the acc{k}
#    scalar subquery) replays Spark's break-at-cap loop exactly;
#  - rebuild: x37's run-parity machinery verbatim. Two DIFFERENT
#    accepted rules can never hit adjacent positions (that would need
#    a shared symbol — incompatible by construction), so overlap runs
#    are single-rule and the odd-offset trick carries over unchanged;
#    rounds after the cap empties (m{k} empty) pass pos through.
# ---------------------------------------------------------------------------

_BPE_GREEDY_K = 10
_BPE_GREEDY_BATCH = 4

_COMPAT = ("q.l IN (a.l, a.r, a.l || a.r) OR q.r IN (a.l, a.r, a.l || a.r)"
           " OR (q.l || q.r) IN (a.l, a.r)")


def _bpe_greedy_round(k: int, total_k: int, batch_max: int, top_l: int) -> str:
    k1 = k + 1
    sel = [f"""
    s{k}b1 AS (SELECT l, r, c, rk FROM pr{k} WHERE rk = 1),
    a{k}b1 AS MATERIALIZED (SELECT * FROM s{k}b1)"""]
    for j in range(2, batch_max + 1):
        sel.append(f"""
    s{k}b{j} AS (
      SELECT q.l, q.r, q.c, q.rk FROM pr{k} q
      WHERE q.rk > (SELECT max(rk) FROM a{k}b{j - 1})
        AND NOT EXISTS (SELECT 1 FROM a{k}b{j - 1} a WHERE {_COMPAT})
      ORDER BY q.rk LIMIT 1
    ),
    a{k}b{j} AS MATERIALIZED (
      SELECT * FROM a{k}b{j - 1} UNION ALL SELECT * FROM s{k}b{j})""")
    selection = ",".join(sel)
    return rf"""
    p{k} AS (
      SELECT l, r, CAST(SUM(cnt) AS BIGINT) AS c
      FROM (SELECT cnt, s AS l,
                   lead(s) OVER (PARTITION BY w ORDER BY i) AS r
            FROM pos{k})
      WHERE r IS NOT NULL GROUP BY l, r HAVING SUM(cnt) >= 2
    ),
    pr{k} AS MATERIALIZED (
      SELECT l, r, c, rk FROM (
        SELECT l, r, c,
               row_number() OVER (ORDER BY c DESC, l, r) AS rk
        FROM p{k})
      WHERE rk <= {top_l}
    ),{selection},
    m{k} AS MATERIALIZED (
      SELECT l, r, c, bseq FROM (
        SELECT l, r, c, row_number() OVER (ORDER BY rk) AS bseq
        FROM a{k}b{batch_max})
      WHERE bseq <= {total_k} - (SELECT COUNT(*) FROM acc{k})
    ),
    acc{k1} AS MATERIALIZED (
      SELECT * FROM acc{k}
      UNION ALL
      SELECT CAST((SELECT COUNT(*) FROM acc{k}) + bseq - 1 AS INT) AS merge_rank,
             l AS lhs, r AS rhs, c AS pair_count
      FROM m{k}
    ),
    hit{k} AS (
      SELECT q.w, q.i FROM (
        SELECT w, i, s AS l2,
               lead(s) OVER (PARTITION BY w ORDER BY i) AS r2
        FROM pos{k}
      ) q JOIN m{k} m ON q.l2 = m.l AND q.r2 = m.r
    ),
    tk{k} AS (
      SELECT w, i FROM (
        SELECT w, i, row_number() OVER (PARTITION BY w, grp ORDER BY i) AS rn
        FROM (SELECT w, i,
                     i - row_number() OVER (PARTITION BY w ORDER BY i) AS grp
              FROM hit{k})
      ) WHERE rn % 2 = 1
    ),
    reb{k} AS (
      SELECT p.w, p.cnt, p.i, p.s, (t.i IS NOT NULL) AS taken,
             lead(p.s) OVER (PARTITION BY p.w ORDER BY p.i) AS nxt
      FROM pos{k} p LEFT JOIN tk{k} t ON p.w = t.w AND p.i = t.i
    ),
    pos{k1} AS MATERIALIZED (
      SELECT w, cnt,
             CAST(row_number() OVER (PARTITION BY w ORDER BY i) AS BIGINT) AS i,
             CASE WHEN taken THEN s || nxt ELSE s END AS s
      FROM (SELECT *, lag(taken, 1, FALSE) OVER (PARTITION BY w ORDER BY i) AS ptk
            FROM reb{k})
      WHERE NOT ptk
    )"""


def _bpe_greedy_oracle(k: int, batch_max: int) -> str:
    top_l = max(64, 16 * batch_max)
    # worst case every round accepts a single merge -> k round blocks;
    # once acc reaches k, m{k} is empty and the block passes through
    rounds = ",".join(
        _bpe_greedy_round(i, k, batch_max, top_l) for i in range(k))
    return rf"""
    WITH wrd AS (
      SELECT w, COUNT(*) AS cnt FROM (
        SELECT unnest(string_split_regex(trim(text), '\s+')) AS w
        FROM documents WHERE text IS NOT NULL AND length(trim(text)) > 0
      ) WHERE length(w) > 0 GROUP BY w
    ),
    pos0 AS MATERIALIZED (
      SELECT w, cnt, CAST(generate_subscripts(chars, 1) AS BIGINT) AS i,
             unnest(chars) AS s
      FROM (SELECT w, cnt,
                   list_transform(range(1, length(w) + 1),
                                  j -> substr(w, CAST(j AS INT), 1)) AS chars
            FROM wrd)
    ),
    acc0 AS (
      SELECT CAST(NULL AS INT) AS merge_rank, CAST(NULL AS VARCHAR) AS lhs,
             CAST(NULL AS VARCHAR) AS rhs, CAST(NULL AS BIGINT) AS pair_count
      WHERE FALSE
    ),{rounds}
    SELECT merge_rank, lhs, rhs, pair_count FROM acc{k}
    """


@register("x37b_bpe_merges_greedy",
          _bpe_greedy_oracle(_BPE_GREEDY_K, _BPE_GREEDY_BATCH))
def x37b_bpe_merges_greedy(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text.bpe_train(T(spark, sf_dir, "documents"), k=_BPE_GREEDY_K,
                          min_count=2, batch_max=_BPE_GREEDY_BATCH,
                          exact=False)


# ---------------------------------------------------------------------------
# e06 — IVF-PQ kNN (Jégou et al. 2011): the memory-compression ANN leg
# next to brute force (e01), hyperplane LSH (e03/e03b), and IVF-flat
# (e04/e04b). Coarse IVF cells prune the corpus; product-quantization
# codes (m=8 subspaces × 16 codes, one decimal-Lloyd pass) replace the
# vectors at query time; scoring is ADC over a broadcast lookup table.
# FULL oracle: every stage is deterministic (md5-sample seeds, decimal
# per-position means, fixed-order IEEE folds, 6dp-rounded ADC terms
# with decimal sums), so DuckDB replays seeds → per-subspace codebooks
# → refinement → encode → probe → LUT → ADC rank bit-identically.
# ---------------------------------------------------------------------------

_SUBV = ("list_transform(range(1, 9), i -> "
         "CAST({v}[j*8 + CAST(i AS INT)] AS DOUBLE))")
_SQD = ("list_sum(list_transform(range(1, 9), i -> "
        "({a}[i] - {b}[i]) * ({a}[i] - {b}[i])))")
_SDOT = "list_sum(list_transform(range(1, 9), i -> {a}[i] * {b}[i]))"


@register(
    "e06_knn_ivf_pq",
    f"""
    WITH pqseeds AS (
      SELECT vec_id AS code, embedding AS cv FROM embeddings
      ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 16
    ),
    book0 AS MATERIALIZED (
      SELECT j AS sub, code, {_SUBV.format(v='cv')} AS sub_cv
      FROM pqseeds CROSS JOIN range(0, 8) t(j)
    ),
    subvecs AS MATERIALIZED (
      SELECT e.vec_id, j AS sub, {_SUBV.format(v='e.embedding')} AS sv
      FROM embeddings e CROSS JOIN range(0, 8) t(j)
    ),
    codes0 AS (
      SELECT vec_id, sub, code, sv FROM (
        SELECT s.vec_id, s.sub, b.code, s.sv,
               row_number() OVER (
                 PARTITION BY s.vec_id, s.sub
                 ORDER BY {_SQD.format(a='s.sv', b='b.sub_cv')} ASC, b.code ASC
               ) AS r
        FROM subvecs s JOIN book0 b USING (sub)
      ) WHERE r = 1
    ),
    bvals AS (
      SELECT sub, code, i AS pos, sv[i] AS val
      FROM codes0 CROSS JOIN range(1, 9) t(i)
    ),
    bmeans AS (
      SELECT sub, code, pos,
             CAST(CAST(SUM(CAST(val AS DECIMAL(27,12))) AS VARCHAR) AS DOUBLE)
               / COUNT(*) AS mval
      FROM bvals GROUP BY sub, code, pos
    ),
    book AS MATERIALIZED (
      SELECT b.sub, b.code, COALESCE(mv.mcv, b.sub_cv) AS sub_cv
      FROM book0 b LEFT JOIN (
        SELECT sub, code, list(mval ORDER BY pos) AS mcv
        FROM bmeans GROUP BY sub, code
      ) mv USING (sub, code)
    ),
    bookn AS MATERIALIZED (
      SELECT sub, code, sub_cv,
             round({_SDOT.format(a='sub_cv', b='sub_cv')}, 6) AS c26
      FROM book
    ),
    codes AS MATERIALIZED (
      SELECT vec_id AS neighbor_id, sub, code FROM (
        SELECT s.vec_id, s.sub, b.code,
               row_number() OVER (
                 PARTITION BY s.vec_id, s.sub
                 ORDER BY {_SQD.format(a='s.sv', b='b.sub_cv')} ASC, b.code ASC
               ) AS r
        FROM subvecs s JOIN book b USING (sub)
      ) WHERE r = 1
    ),
    cents AS MATERIALIZED (
      SELECT vec_id AS centroid_id, embedding AS cv FROM embeddings
      ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 16
    ),
    assigned AS MATERIALIZED (
      SELECT vec_id AS neighbor_id, centroid_id FROM (
        SELECT e.vec_id, c.centroid_id,
               row_number() OVER (
                 PARTITION BY e.vec_id
                 ORDER BY {_COS.format(a='e.embedding', b='c.cv')} DESC, c.centroid_id ASC
               ) AS r
        FROM embeddings e CROSS JOIN cents c
      ) WHERE r = 1
    ),
    probes AS MATERIALIZED (
      SELECT query_id, centroid_id FROM (
        SELECT q.vec_id AS query_id, c.centroid_id,
               row_number() OVER (
                 PARTITION BY q.vec_id
                 ORDER BY {_COS.format(a='q.embedding', b='c.cv')} DESC, c.centroid_id ASC
               ) AS r
        FROM embeddings q CROSS JOIN cents c WHERE q.vec_id < 20
      ) WHERE r <= 4
    ),
    qn AS (
      SELECT vec_id AS query_id,
             sqrt(list_sum(list_transform(range(1, 65), i ->
               CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)))) AS qnorm
      FROM embeddings WHERE vec_id < 20
    ),
    qsubs AS (
      SELECT q.vec_id AS query_id, j AS sub, {_SUBV.format(v='q.embedding')} AS qs
      FROM embeddings q CROSS JOIN range(0, 8) t(j) WHERE q.vec_id < 20
    ),
    lut AS MATERIALIZED (
      SELECT s.query_id, b.sub, b.code,
             round({_SDOT.format(a='s.qs', b='b.sub_cv')}, 6) AS dot6,
             b.c26
      FROM qsubs s JOIN bookn b USING (sub)
    ),
    scored AS (
      SELECT p.query_id, c.neighbor_id,
             CAST(CAST(SUM(CAST(l.dot6 AS DECIMAL(27,6))) AS VARCHAR) AS DOUBLE) AS num,
             CAST(CAST(SUM(CAST(l.c26 AS DECIMAL(27,6))) AS VARCHAR) AS DOUBLE) AS den2
      FROM codes c
      JOIN assigned a USING (neighbor_id)
      JOIN probes p USING (centroid_id)
      JOIN lut l ON l.query_id = p.query_id AND l.sub = c.sub AND l.code = c.code
      WHERE p.query_id <> c.neighbor_id
      GROUP BY p.query_id, c.neighbor_id
    ),
    rr AS (
      SELECT s.query_id, s.neighbor_id,
             s.num / (qn.qnorm * sqrt(s.den2)) AS adc,
             row_number() OVER (
               PARTITION BY s.query_id
               ORDER BY s.num / (qn.qnorm * sqrt(s.den2)) DESC, s.neighbor_id
             ) AS rnk
      FROM scored s JOIN qn USING (query_id)
    )
    SELECT query_id, neighbor_id, CAST(rnk AS INT) AS knn_rank,
           round(adc, 6) AS adc_sim
    FROM rr WHERE rnk <= 3
    """,
)
def e06_knn_ivf_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = T(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 20)
    return similarity.knn_ivf_pq(e, q, k=3, n_centroids=16, n_probe=4,
                                 m=8, k_pq=16, pq_iters=1)


# ---------------------------------------------------------------------------
# x38 — BPE ENCODE with the learned merge table: train x37's K merges,
# then replay them over the corpus (k nested greedy folds, JVM-side)
# and report per-doc word/symbol counts — the compression the learned
# vocabulary achieves. FULL oracle: x37's unrolled training chain
# already carries every distinct word's final symbol stream in
# pos{K}; encoding is word-deterministic, so the per-doc symbol count
# is just the doc's word stream joined to per-word encoded lengths.
# ---------------------------------------------------------------------------

def _bpe_encode_oracle(k: int) -> str:
    rounds = ",".join(_BPE_ROUND.format(k=i, k1=i + 1) for i in range(k))
    return rf"""
    WITH wrd AS (
      SELECT w, COUNT(*) AS cnt FROM (
        SELECT unnest(string_split_regex(trim(text), '\s+')) AS w
        FROM documents WHERE text IS NOT NULL AND length(trim(text)) > 0
      ) WHERE length(w) > 0 GROUP BY w
    ),
    pos0 AS MATERIALIZED (
      SELECT w, cnt, CAST(generate_subscripts(chars, 1) AS BIGINT) AS i,
             unnest(chars) AS s
      FROM (SELECT w, cnt,
                   list_transform(range(1, length(w) + 1),
                                  j -> substr(w, CAST(j AS INT), 1)) AS chars
            FROM wrd)
    ),{rounds},
    wlen AS (
      SELECT w, CAST(COUNT(*) AS BIGINT) AS enc_len FROM pos{k} GROUP BY w
    ),
    docw AS (
      SELECT doc_id, w FROM (
        SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS w
        FROM documents WHERE text IS NOT NULL AND length(trim(text)) > 0
      ) WHERE length(w) > 0
    )
    SELECT d.doc_id, CAST(COUNT(*) AS BIGINT) AS n_words,
           CAST(SUM(wl.enc_len) AS BIGINT) AS n_symbols
    FROM docw d JOIN wlen wl USING (w)
    GROUP BY d.doc_id
    """


@register("x38_bpe_encode", _bpe_encode_oracle(_BPE_K))
def x38_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = T(spark, sf_dir, "documents")
    merges = text.bpe_train(d, k=_BPE_K, min_count=2)
    return text.bpe_encode(d, merges)


# ---------------------------------------------------------------------------
# d25b — SemDeDup with the AUTO-SCALED k (the r10 verdict's fix made
# driver-checkable): n_centroids="auto" = max(16, ceil(sqrt(n))) is
# itself one SQL scalar, so the oracle computes the same k from the
# same COUNT and replays d25's full chain (seed sample -> decimal-Lloyd
# refinement -> cell self-join -> min-id survivor) at that k. This
# upgrades the auto path from unit-pinned (blocking-subset-of-exact)
# to FULL value-hash driver evidence; d25 keeps the fixed-16 pin so
# both the explicit and auto APIs stay covered.
# ---------------------------------------------------------------------------

@register(
    "d25b_semdedup_auto",
    f"""
    WITH kk AS (
      SELECT GREATEST(16, CAST(ceil(sqrt(COUNT(*))) AS BIGINT)) AS k
      FROM embeddings
    ),
    cents AS MATERIALIZED (
      SELECT centroid_id, cv FROM (
        SELECT vec_id AS centroid_id, embedding AS cv,
               row_number() OVER (
                 ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS rn
        FROM embeddings
      ) CROSS JOIN kk WHERE rn <= kk.k
    ),
    assigned0 AS (
      SELECT vec_id AS neighbor_id, embedding AS nv, centroid_id FROM (
        SELECT e.vec_id, e.embedding, c.centroid_id,
               row_number() OVER (
                 PARTITION BY e.vec_id
                 ORDER BY {_COS.format(a='e.embedding', b='c.cv')} DESC, c.centroid_id ASC
               ) AS r
        FROM embeddings e CROSS JOIN cents c
      ) WHERE r = 1
    ),
    vals AS (
      SELECT centroid_id, i AS pos, CAST(nv[i] AS DOUBLE) AS val
      FROM assigned0 CROSS JOIN range(1, 65) t(i)
    ),
    means AS (
      SELECT centroid_id, pos,
             CAST(CAST(SUM(CAST(val AS DECIMAL(27,12))) AS VARCHAR) AS DOUBLE) / COUNT(*) AS m
      FROM vals GROUP BY centroid_id, pos
    ),
    refined AS MATERIALIZED (
      SELECT c.centroid_id, COALESCE(mv.cv, c.cv) AS cv
      FROM cents c LEFT JOIN (
        SELECT centroid_id, list(m ORDER BY pos) AS cv FROM means GROUP BY centroid_id
      ) mv USING (centroid_id)
    ),
    assigned AS MATERIALIZED (
      SELECT vec_id AS neighbor_id, embedding AS nv, centroid_id FROM (
        SELECT e.vec_id, e.embedding, c.centroid_id,
               row_number() OVER (
                 PARTITION BY e.vec_id
                 ORDER BY {_COS.format(a='e.embedding', b='c.cv')} DESC, c.centroid_id ASC
               ) AS r
        FROM embeddings e CROSS JOIN refined c
      ) WHERE r = 1
    ),
    p AS (
      SELECT a.neighbor_id AS id_a, b.neighbor_id AS id_b,
             {_COS.format(a='a.nv', b='b.nv')} AS cos
      FROM assigned a JOIN assigned b USING (centroid_id)
      WHERE a.neighbor_id < b.neighbor_id
    ),
    d AS (SELECT id_b AS doc_id, MIN(id_a) AS dup_of FROM p WHERE cos >= 0.35 GROUP BY id_b)
    SELECT doc.doc_id, d.dup_of, d.dup_of IS NOT NULL AS is_dup
    FROM documents doc LEFT JOIN d USING (doc_id)
    """,
)
def d25b_semdedup_auto(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = T(spark, sf_dir, "documents")
    embs = T(spark, sf_dir, "embeddings")
    return similarity.semdedup(docs, embs, threshold=0.35, kmeans_iters=1)


# ---------------------------------------------------------------------------
# e06b — IVFADC proper (residual PQ): codes quantize x − c(cell), the
# per-(query, probed-cell) LUT holds ‖(q−c)ⱼ − codewordⱼ‖², candidates
# rank by approximate L2 (ascending). Same determinism toolkit as e06,
# so the FULL oracle replays coarse-assign → residuals → residual
# codebooks (+1 decimal-Lloyd pass) → encode → probe → per-cell LUT →
# summed distance rank.
# ---------------------------------------------------------------------------

_RESV = ("list_transform(range(1, 65), i -> "
         "CAST({x}[i] AS DOUBLE) - CAST({c}[i] AS DOUBLE))")
_RSUBV = ("list_transform(range(1, 9), i -> {v}[j*8 + CAST(i AS INT)])")


@register(
    "e06b_knn_ivf_pq_residual",
    f"""
    WITH cents AS MATERIALIZED (
      SELECT vec_id AS centroid_id, embedding AS cv FROM embeddings
      ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 16
    ),
    assigned AS MATERIALIZED (
      SELECT vec_id AS neighbor_id, centroid_id FROM (
        SELECT e.vec_id, c.centroid_id,
               row_number() OVER (
                 PARTITION BY e.vec_id
                 ORDER BY {_COS.format(a='e.embedding', b='c.cv')} DESC, c.centroid_id ASC
               ) AS r
        FROM embeddings e CROSS JOIN cents c
      ) WHERE r = 1
    ),
    res AS MATERIALIZED (
      SELECT a.neighbor_id, a.centroid_id,
             {_RESV.format(x='e.embedding', c='c.cv')} AS rv
      FROM assigned a
      JOIN embeddings e ON e.vec_id = a.neighbor_id
      JOIN cents c USING (centroid_id)
    ),
    pqseeds AS (
      SELECT neighbor_id AS code, rv FROM res
      ORDER BY md5(CAST(neighbor_id AS VARCHAR)), neighbor_id LIMIT 16
    ),
    book0 AS MATERIALIZED (
      SELECT j AS sub, code, {_RSUBV.format(v='rv')} AS sub_cv
      FROM pqseeds CROSS JOIN range(0, 8) t(j)
    ),
    subvecs AS MATERIALIZED (
      SELECT r.neighbor_id, j AS sub, {_RSUBV.format(v='r.rv')} AS sv
      FROM res r CROSS JOIN range(0, 8) t(j)
    ),
    codes0 AS (
      SELECT neighbor_id, sub, code, sv FROM (
        SELECT s.neighbor_id, s.sub, b.code, s.sv,
               row_number() OVER (
                 PARTITION BY s.neighbor_id, s.sub
                 ORDER BY {_SQD.format(a='s.sv', b='b.sub_cv')} ASC, b.code ASC
               ) AS r
        FROM subvecs s JOIN book0 b USING (sub)
      ) WHERE r = 1
    ),
    bvals AS (
      SELECT sub, code, i AS pos, sv[i] AS val
      FROM codes0 CROSS JOIN range(1, 9) t(i)
    ),
    bmeans AS (
      SELECT sub, code, pos,
             CAST(CAST(SUM(CAST(val AS DECIMAL(27,12))) AS VARCHAR) AS DOUBLE)
               / COUNT(*) AS mval
      FROM bvals GROUP BY sub, code, pos
    ),
    book AS MATERIALIZED (
      SELECT b.sub, b.code, COALESCE(mv.mcv, b.sub_cv) AS sub_cv
      FROM book0 b LEFT JOIN (
        SELECT sub, code, list(mval ORDER BY pos) AS mcv
        FROM bmeans GROUP BY sub, code
      ) mv USING (sub, code)
    ),
    codes AS MATERIALIZED (
      SELECT neighbor_id, sub, code FROM (
        SELECT s.neighbor_id, s.sub, b.code,
               row_number() OVER (
                 PARTITION BY s.neighbor_id, s.sub
                 ORDER BY {_SQD.format(a='s.sv', b='b.sub_cv')} ASC, b.code ASC
               ) AS r
        FROM subvecs s JOIN book b USING (sub)
      ) WHERE r = 1
    ),
    probes AS MATERIALIZED (
      SELECT query_id, centroid_id FROM (
        SELECT q.vec_id AS query_id, c.centroid_id,
               row_number() OVER (
                 PARTITION BY q.vec_id
                 ORDER BY {_COS.format(a='q.embedding', b='c.cv')} DESC, c.centroid_id ASC
               ) AS r
        FROM embeddings q CROSS JOIN cents c WHERE q.vec_id < 20
      ) WHERE r <= 4
    ),
    qres AS (
      SELECT p.query_id, p.centroid_id,
             {_RESV.format(x='q.embedding', c='c.cv')} AS qr
      FROM probes p
      JOIN embeddings q ON q.vec_id = p.query_id
      JOIN cents c USING (centroid_id)
    ),
    qsubs AS (
      SELECT query_id, centroid_id, j AS sub, {_RSUBV.format(v='qr')} AS qs
      FROM qres CROSS JOIN range(0, 8) t(j)
    ),
    lut AS MATERIALIZED (
      SELECT s.query_id, s.centroid_id, b.sub, b.code,
             round({_SQD.format(a='s.qs', b='b.sub_cv')}, 6) AS d6
      FROM qsubs s JOIN book b USING (sub)
    ),
    scored AS (
      SELECT p.query_id, c.neighbor_id,
             CAST(CAST(SUM(CAST(l.d6 AS DECIMAL(27,6))) AS VARCHAR) AS DOUBLE) AS dist2
      FROM codes c
      JOIN assigned a USING (neighbor_id)
      JOIN probes p USING (centroid_id)
      JOIN lut l ON l.query_id = p.query_id AND l.centroid_id = a.centroid_id
                AND l.sub = c.sub AND l.code = c.code
      WHERE p.query_id <> c.neighbor_id
      GROUP BY p.query_id, c.neighbor_id
    ),
    rr AS (
      SELECT query_id, neighbor_id, dist2,
             row_number() OVER (
               PARTITION BY query_id ORDER BY dist2 ASC, neighbor_id
             ) AS rnk
      FROM scored
    )
    SELECT query_id, neighbor_id, CAST(rnk AS INT) AS knn_rank,
           round(sqrt(dist2), 6) AS adc_dist
    FROM rr WHERE rnk <= 3
    """,
)
def e06b_knn_ivf_pq_residual(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = T(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 20)
    return similarity.knn_ivf_pq_residual(e, q, k=3, n_centroids=16,
                                          n_probe=4, m=8, k_pq=16, pq_iters=1)


# ---------------------------------------------------------------------------
# x38b — BPE DECODE roundtrip: train x37's merges, build the vocab,
# encode the corpus to id sequences (x38's ids variant), then decode
# the ids back to text. Merges fuse only within whitespace words and
# the vocab's base alphabet covers every corpus character, so the
# decode of a document is EXACTLY the concatenation of its pretokenized
# words — a one-line FULL oracle that value-checks the entire
# train → vocab → encode-ids → decode chain end-to-end (any wrong
# merge, id, or ordering anywhere in the chain breaks the hash).
# ---------------------------------------------------------------------------

@register(
    "x38b_bpe_decode",
    r"""
    SELECT doc_id,
           array_to_string(
             list_filter(string_split_regex(trim(text), '\s+'),
                         w -> length(w) > 0), '') AS text_decoded
    FROM documents
    WHERE text IS NOT NULL AND length(trim(text)) > 0
    """,
)
def x38b_bpe_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = T(spark, sf_dir, "documents")
    merges = text.bpe_train(d, k=_BPE_K, min_count=2)
    vocab = text.bpe_vocab(d, merges)
    ids = text.bpe_encode_ids(d, merges, vocab)
    return text.bpe_decode(ids, vocab)


# ---------------------------------------------------------------------------
# x40 — sliding-window document chunking (context-window prep): 120-char
# windows every 90 chars, final window clipped. Pure integer window
# arithmetic on both sides; one explode over the scan, no shuffle.
# ---------------------------------------------------------------------------

_CHUNK_SIZE, _CHUNK_STRIDE = 120, 90

@register(
    "x40_doc_chunking",
    f"""
    WITH d AS (
      SELECT doc_id, trim(text) AS t FROM documents
      WHERE text IS NOT NULL AND length(trim(text)) > 0
    ),
    idx AS (
      SELECT doc_id, t,
             unnest(range(0, GREATEST(0,
               (length(t) - {_CHUNK_SIZE} + {_CHUNK_STRIDE} - 1) // {_CHUNK_STRIDE}) + 1)) AS i
      FROM d
    )
    SELECT doc_id, CAST(i AS INT) AS chunk_id,
           CAST(i * {_CHUNK_STRIDE} + 1 AS BIGINT) AS chunk_start,
           substr(t, CAST(i * {_CHUNK_STRIDE} + 1 AS INT), {_CHUNK_SIZE}) AS chunk_text,
           CAST(length(substr(t, CAST(i * {_CHUNK_STRIDE} + 1 AS INT), {_CHUNK_SIZE})) AS BIGINT)
             AS n_chunk_chars
    FROM idx
    """,
)
def x40_doc_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = T(spark, sf_dir, "documents")
    return text.chunk_documents(d, chunk_size=_CHUNK_SIZE, stride=_CHUNK_STRIDE)


# ---------------------------------------------------------------------------
# d27 — corpus-wide line dedup with document reconstruction (C4's
# keep-one-occurrence line rule, Raffel et al. 2020 §2.2): a non-empty
# line survives iff it is the canonical (min doc_id, min pos)
# occurrence of its text anywhere in the corpus; docs are rebuilt from
# surviving lines in order. Runs over the _multiline(2) derivation
# (the d18/d21 convention) so 2-token lines collide across docs and
# the rule does real discriminating work in the driver gate.
# ---------------------------------------------------------------------------

@register(
    "d27_line_dedup_global",
    rf"""
    WITH {_ML_CTE(2)},
    l0 AS (
      SELECT doc_id, string_split(text, chr(10)) AS ls FROM ml
      WHERE text IS NOT NULL
    ),
    lx AS (
      SELECT doc_id, CAST(pl.pos AS INT) AS pos, pl.line AS line FROM (
        SELECT doc_id, unnest(list_transform(range(1, len(ls) + 1),
                       i -> {{'pos': i, 'line': ls[i]}})) AS pl
        FROM l0
      ) WHERE length(trim(pl.line)) > 0
    ),
    flagged AS (
      SELECT doc_id, pos, line,
             row_number() OVER (PARTITION BY line ORDER BY doc_id, pos) AS rn
      FROM lx
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           string_agg(CASE WHEN rn = 1 THEN line END, chr(10) ORDER BY pos) AS text_dedup
    FROM flagged GROUP BY doc_id
    HAVING SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END) >= 1
    """,
)
def d27_line_dedup_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = T(spark, sf_dir, "documents")
    return text.global_line_dedup(_multiline(d, every=2))


# ---------------------------------------------------------------------------
# x41 — fractional-epoch source upsampling (the LLaMA-style sampling-
# weight table materialized): src0 seen 2.5 epochs, src1 downsampled to
# 0.4, src2 dropped, src3 1.25, everything else 1.0 — the fractional
# part decided per doc by the same engine-portable md5 bucket as x05's
# split, so exactly the requested fraction repeats, deterministically.
# Config-sized when-chain + one Generate; no shuffle, no join.
# ---------------------------------------------------------------------------

_EPOCH_RECIPE = {"src0": 2.5, "src1": 0.4, "src2": 0.0, "src3": 1.25}

@register(
    "x41_epoch_upsample",
    """
    WITH b AS (
      SELECT doc_id, source,
             ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100 AS bkt
      FROM documents
    ),
    n AS (
      SELECT doc_id, source,
             CASE source
               WHEN 'src0' THEN 2 + CASE WHEN bkt < 50 THEN 1 ELSE 0 END
               WHEN 'src1' THEN CASE WHEN bkt < 40 THEN 1 ELSE 0 END
               WHEN 'src2' THEN 0
               WHEN 'src3' THEN 1 + CASE WHEN bkt < 25 THEN 1 ELSE 0 END
               ELSE 1 END AS n_copies
      FROM b
    )
    SELECT doc_id, source, CAST(n_copies AS INT) AS n_copies,
           CAST(unnest(range(0, n_copies)) AS INT) AS epoch
    FROM n
    """,
)
def x41_epoch_upsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = T(spark, sf_dir, "documents").select("doc_id", "source")
    return text.epoch_upsample(d, _EPOCH_RECIPE)


# ---------------------------------------------------------------------------
# d07b — MinHash-LSH candidate pairs under a FULL oracle (the e03c
# determinism playbook applied to the MinHash family): md5-derived
# 60-bit hash functions replace xxhash64, so the signature mins, the
# band buckets, and the collision pair list are all SQL-replayable and
# value-hashed end-to-end. d07 (xxhash64) stays as the production-
# throughput twin; the banding geometry both share is now driver-
# value-checked here, not just pinned by admit-set-equality tests.
# ---------------------------------------------------------------------------

@register(
    "d07b_minhash_lsh_det",
    r"""
    WITH t AS (
      SELECT doc_id, string_split_regex(trim(text), '\s+') AS tk
      FROM documents WHERE text IS NOT NULL AND length(trim(text)) > 0
    ),
    sh AS MATERIALIZED (
      SELECT doc_id, list_distinct(list_transform(range(1, len(tk) - 1),
             i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])) AS sl
      FROM t WHERE len(tk) >= 3
    ),
    sig AS MATERIALIZED (
      SELECT doc_id, list_transform(range(0, 8), p ->
        list_min(list_transform(sl, s ->
          ('0x' || substr(md5(CAST(p AS VARCHAR) || ':' || s), 1, 15))::BIGINT))) AS sig
      FROM sh
    ),
    bands AS MATERIALIZED (
      SELECT doc_id, CAST(b AS INT) AS band,
             md5(CAST(sig[CAST(b*2+1 AS INT)] AS VARCHAR) || ',' ||
                 CAST(sig[CAST(b*2+2 AS INT)] AS VARCHAR)) AS bucket
      FROM sig CROSS JOIN range(0, 4) r(b)
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b, CAST(COUNT(*) AS BIGINT) AS n_bands
    FROM bands a JOIN bands b
      ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
    GROUP BY 1, 2
    """,
)
def d07b_minhash_lsh_det(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = T(spark, sf_dir, "documents")
    return dedup_fuzzy.minhash_lsh_pairs_det(d, num_perm=8, rows_per_band=2)


# ---------------------------------------------------------------------------
# d08b — SimHash signatures under a FULL oracle: the md5-derived 60-bit
# token hash makes the bit-vote signature itself SQL-replayable (d08's
# xxhash64 twin stays rows-only). 60 bits = strictly positive bigint,
# no sign-wrap special case on either engine.
# ---------------------------------------------------------------------------

@register(
    "d08b_simhash_det",
    r"""
    WITH toks AS (
      SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS tok
      FROM documents WHERE text IS NOT NULL AND length(trim(text)) > 0
    ),
    h AS MATERIALIZED (
      SELECT doc_id, ('0x' || substr(md5(tok), 1, 15))::BIGINT AS hv FROM toks
    ),
    v AS (
      SELECT doc_id, b,
             SUM(CASE WHEN (hv >> CAST(b AS INT)) & 1 = 1 THEN 1 ELSE -1 END) AS vote
      FROM h CROSS JOIN range(0, 60) r(b)
      GROUP BY doc_id, b
    )
    SELECT doc_id,
           CAST(SUM(CASE WHEN vote > 0 THEN CAST(1 AS BIGINT) << CAST(b AS INT)
                         ELSE 0 END) AS BIGINT) AS simhash
    FROM v GROUP BY doc_id
    """,
)
def d08b_simhash_det(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = T(spark, sf_dir, "documents")
    return dedup_fuzzy.simhash_det(d)
