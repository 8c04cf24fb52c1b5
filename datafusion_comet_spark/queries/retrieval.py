"""Retrieval / local-fingerprint operators over the documents corpus.

Two capabilities a training-data pipeline needs that the doc-level
dedup family (datapipe.py) does not cover:

- **Winnowing fingerprints** (Schleimer, Wilkerson, Aiken — the MOSS
  local fingerprinting scheme): k-gram rolling hashes thinned by a
  window-min rule, guaranteeing any shared run of >= k+w-1 tokens
  shares at least one fingerprint.  This catches COPIED SPANS between
  otherwise-different documents — the substring-duplication class that
  whole-document MinHash/SimHash signatures miss (Lee et al.,
  "Deduplicating Training Data Makes Language Models Better" treat
  substring dedup as its own pass for exactly this reason).
- **BM25 ranked retrieval** (Robertson/Spärck Jones, k1=1.2 b=0.75):
  the standard lexical relevance score, used in data pipelines for
  query-based corpus audits and hard-negative mining.

The reference engine has no retrieval surface at all (its closest
analog is the expression kernels both of these compile onto); both
operators here are pure JVM expression/aggregate compositions — no
Python in the hot path, no pair joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..catalog import load_table
from . import register
from ._shared import _dim_hint, _spread_scan

# Winnowing parameters: k tokens per gram, w grams per window.  Any
# shared token run of length >= K + WIN - 1 (the paper's guarantee
# threshold t = k + w - 1) shares a fingerprint.
K = 4
WIN = 4

# BM25 free parameters (the standard Okapi defaults) and the audit
# query's term set (drawn from the corpus vocabulary).
BM25_TERMS = ("spark", "merge", "window")

# The multi-query form's QUERY TABLE (query_id, term) — in production
# this is a real table of audit queries / hard-negative probes; here a
# deterministic literal so the DuckDB oracle can mirror it as VALUES.
# q3 shares 'merge' with q1 on purpose: one (doc, term) tf row must
# serve both queries without recomputation.
BM25_QUERIES: tuple[tuple[int, str], ...] = (
    (1, "spark"), (1, "merge"), (1, "window"),
    (2, "hash"), (2, "join"), (2, "filter"),
    (3, "stream"), (3, "batch"), (3, "merge"),
)


# The K-gram rolling-hash projection shared by every winnow variant:
# engine-portable md5 hex prefix per K-token gram (lexicographic =
# numeric order, so array_min is the winnow min on both engines).
# Gram tokens are read by element_at (0-based `toks[i-1]` = 1-based
# position i), not slice(): the slice allocates a K-element array per
# gram inside an interpreted lambda, and dropping it measured -0.4s
# min-of-8 interleaved on the sf0.1 positions pipeline with identical
# md5 inputs (round 11; same move as datapipe._shingle_hashes).
_GRAM_HASH_EXPR = (
    f"transform(sequence(1, size(toks) - {K} + 1), "
    f"i -> substring(md5(concat_ws(' ', "
    + ", ".join(
        "toks[i - 1]" if j == 0 else f"toks[i + {j} - 1]" for j in range(K)
    )
    + ")), 1, 16))"
)

# Short docs produce an EMPTY gram set instead of being filtered out:
# a .filter(size(toks) >= t) gets pushed below the tokenize projection
# by predicate pushdown, so split(lower(text)) runs TWICE per row (once
# in the Filter, once in the Project) — a duplicated full-corpus
# tokenize pass at 100 TB (guide §4.4's optimizer-duplication class,
# measured 0.10 s/pass at sf0.1).  The when-guard keeps one tokenize;
# explode of the empty array yields zero rows = the filter's semantics
# (the oracles keep the WHERE len(toks) >= t spelling, proving the
# equivalence differentially).
def _guarded_grams(min_toks: int) -> str:
    return (
        f"CASE WHEN size(toks) >= {min_toks} THEN {_GRAM_HASH_EXPR} "
        f"ELSE array() END"
    )


def winnow_fingerprint_positions(
    docs: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """(id, fp, pos) rows: winnowing fingerprints WITH the gram start
    index of each selected minimum carried through the window-min
    selection — pos covers tokens [pos, pos+K-1], which is what lets a
    consumer reconstruct the matched SPAN EXTENTS instead of just
    flagging the document (`dedup_winnow_cut`).  array_position picks
    the leftmost minimum of each window, mirrored by list_position in
    the DuckDB oracles; distinct (fp, pos) pairs replace the flag
    variant's array_distinct (one fp selected at two positions is two
    matchable span instances)."""
    toked = docs.select(
        id_col, F.split(F.lower("text"), " ").alias("toks")
    )
    hashed = toked.select(
        id_col, F.expr(_guarded_grams(K + WIN - 1)).alias("hashes")
    )
    # array_distinct BEFORE the explode: adjacent windows re-select the
    # same minimum constantly (that's the winnowing rule working), and
    # a (fp, pos) pair can only repeat WITHIN a document — so the
    # map-side array dedup is exactly a global distinct of the
    # (id, fp, pos) triples, without the extra all-columns exchange a
    # .distinct() after the explode would plan (measured: 4 shuffles
    # -> 3 on dedup_winnow_cut).  The DuckDB oracles spell it as
    # SELECT DISTINCT post-unnest instead (list_distinct over structs
    # is unimplemented there); same triples either way.
    # The window slice and its min are BOUND once via 1-element-array
    # lambdas (`transform(array(x), v -> ...)[0]` is the expression
    # language's let-binding): interpreted lambdas have no common-
    # subexpression elimination, so the flat spelling evaluated
    # slice(hashes, s, WIN) twice and array_min three times per window
    # — binding measured -0.2s min-of-8 interleaved at sf0.1 with
    # bit-identical output structs.  Guarded like the grams: short
    # docs' empty hash array yields an empty window set, and explode
    # drops them (the oracles keep the WHERE-filter spelling).
    win = (
        f"CASE WHEN size(hashes) >= {WIN} THEN "
        f"array_distinct(transform(sequence(1, size(hashes) - {WIN} + 1), "
        f"s -> transform(array(slice(hashes, s, {WIN})), "
        f"sl -> transform(array(array_min(sl)), "
        f"m -> named_struct('fp', m, "
        f"'pos', cast(s - 1 as bigint) + array_position(sl, m)))[0])[0])) "
        f"ELSE array() END"
    )
    return hashed.select(
        id_col, F.explode(F.expr(win)).alias("w")
    ).select(id_col, "w.fp", "w.pos")


def winnow_fingerprints(
    docs: DataFrame, id_col: str = "doc_id", carry: tuple[str, ...] = ()
) -> DataFrame:
    """(id, *carry, fp) rows: the winnowing fingerprint set of each
    document's ``text`` column — K-token-gram md5-prefix hashes,
    window-min selected, deduplicated map-side by array_distinct.  The
    selection guarantee (Schleimer et al. §2): two documents sharing
    any token run of length >= K + WIN - 1 share at least one
    fingerprint (pinned by tests/test_retrieval_semantics.py).  Pure
    per-row array expressions until the final explode of the
    already-thinned set."""
    keep = [id_col, *carry]
    toked = docs.select(
        *keep, F.split(F.lower("text"), " ").alias("toks")
    )
    hashed = toked.select(
        *keep, F.expr(_guarded_grams(K + WIN - 1)).alias("hashes")
    )
    # guarded like the positions variant: short docs carry an empty
    # hash array (one tokenize pass, no pushed-down duplicate Filter)
    # and explode drops them
    return hashed.select(
        *keep,
        F.explode(
            F.expr(
                f"CASE WHEN size(hashes) >= {WIN} THEN "
                f"array_distinct(transform(sequence(1, size(hashes) - {WIN} + 1), "
                f"s -> array_min(slice(hashes, s, {WIN})))) "
                f"ELSE array() END"
            )
        ).alias("fp"),
    )


@register(
    "dedup_winnow_fingerprint",
    oracle=f"""
WITH fps AS (
  SELECT doc_id,
         unnest(list_distinct(list_transform(
           range(1, len(hashes) - {WIN} + 2),
           s -> list_aggregate(hashes[s:s+{WIN - 1}], 'min')))) AS fp
  FROM (
    SELECT doc_id,
           list_transform(range(1, len(toks) - {K} + 2),
             i -> substr(md5(array_to_string(toks[i:i+{K - 1}], ' ')), 1, 16)) AS hashes
    FROM (SELECT doc_id, str_split(lower(text), ' ') AS toks FROM documents)
    WHERE len(toks) >= {K + WIN - 1}
  )
), marked AS (
  SELECT doc_id, fp, count(*) OVER (PARTITION BY fp) AS n_docs_fp
  FROM fps
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_fps,
       CAST(sum(CASE WHEN n_docs_fp >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_shared
FROM marked
GROUP BY doc_id
HAVING sum(CASE WHEN n_docs_fp >= 2 THEN 1 ELSE 0 END) * 2 >= count(*)
ORDER BY doc_id
""",
    tags=("retrieval", "datapipe", "dedup", "fingerprint", "bench"),
)
def dedup_winnow_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing local fingerprints → substring-duplication suspects.

    Per document: hash every K-token gram (engine-portable md5 hex
    prefix, lexicographic = numeric order), keep the minimum of every
    WIN-gram window (the winnowing rule — selected positions are a
    provable cover of any shared run >= K+WIN-1 tokens), and flag
    documents where shared fingerprints (appearing in >= 2 docs) are
    at least half of their fingerprint set.

    Shape at 100 TB: gram hashing and window-min both run INSIDE the
    per-row array expressions (transform/sequence/slice/array_min —
    whole-stage codegen, zero Python, zero explode until the
    fingerprint set is already thinned ~1/WIN and deduplicated
    map-side by array_distinct).  Sharing is counted with ONE window
    pass hash-partitioned on the fingerprint — never a pair join, so a
    boilerplate span duplicated across k documents costs k rows, not
    k² (the duplication-skew lesson from dedup_lsh_star_cluster).
    Exchanges: fp window + doc_id aggregate = 2 (plus the footer-gated
    _spread_scan rebalance only where the parquet layout starves scan
    parallelism — a no-op at 100 TB; measured 1.35→0.97 s at sf0.1).
    """
    fps = winnow_fingerprints(
        _spread_scan(load_table(spark, sf_dir, "documents"), sf_dir, "documents")
    )
    marked = fps.withColumn(
        "n_docs_fp", F.count(F.lit(1)).over(W.partitionBy("fp"))
    )
    return (
        marked.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_fps"),
            F.sum(F.when(F.col("n_docs_fp") >= 2, 1).otherwise(0))
            .cast("bigint")
            .alias("n_shared"),
        )
        .filter(F.col("n_shared") * 2 >= F.col("n_fps"))
        .orderBy("doc_id")
    )


@register(
    "text_bm25_topk",
    oracle=f"""
WITH tf AS (
  SELECT doc_id, tok, count(*) AS tf, min(dl) AS dl
  FROM (
    SELECT doc_id, len(str_split(lower(text), ' ')) AS dl,
           unnest(str_split(lower(text), ' ')) AS tok
    FROM documents
  )
  WHERE tok IN {BM25_TERMS!r}
  GROUP BY doc_id, tok
), stats AS (
  SELECT count(*) AS n_docs,
         sum(len(toks)) AS sum_dl,
         {", ".join(f"CAST(sum(CASE WHEN list_contains(toks, '{t}') THEN 1 ELSE 0 END) AS BIGINT) AS df_{t}" for t in BM25_TERMS)}
  FROM (SELECT str_split(lower(text), ' ') AS toks FROM documents)
), withdf AS (
  SELECT tf.doc_id, tf.tf, tf.dl, stats.n_docs, stats.sum_dl,
         CASE tf.tok {" ".join(f"WHEN '{t}' THEN stats.df_{t}" for t in BM25_TERMS)} END AS df
  FROM tf CROSS JOIN stats
), scored AS (
  SELECT doc_id,
         CAST(round(
           ln(1.0 + (n_docs - df + 0.5) / (df + 0.5))
           * (tf * 2.2)
           / (tf + 1.2 * (0.25 + 0.75 * dl /
                (CAST(sum_dl AS DOUBLE) / CAST(n_docs AS DOUBLE))))
           * 1000000.0) AS BIGINT) AS contrib_micros
  FROM withdf
)
SELECT doc_id, bm25_micros, rn FROM (
  SELECT doc_id,
         CAST(sum(contrib_micros) AS BIGINT) AS bm25_micros,
         CAST(row_number() OVER (
           ORDER BY sum(contrib_micros) DESC, doc_id) AS INT) AS rn
  FROM scored GROUP BY doc_id
) t
WHERE rn <= 10
ORDER BY rn
""",
    tags=("retrieval", "text", "bm25", "bench"),
)
def text_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 top-10 documents for a fixed audit-query term set.

    idf = ln(1 + (N - df + 0.5)/(df + 0.5)); per-term contribution
    tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl)) with k1=1.2, b=0.75.
    Each (doc, term) contribution is quantized to integer MICROS
    before the per-doc sum: double sums are addend-order-dependent
    (the round(sum(double)) flake class in COMPAT.md), integer sums
    are exact and order-free — ranking and the driver hash are stable
    by construction, with only the one deterministic per-contribution
    rounding left in double space.

    Shape at 100 TB: ONE corpus scan feeds tf and dl together (dl
    rides the tokenize projection; no join back to the corpus); the
    term filter drops non-query tokens before the (doc, tok)
    aggregate so the shuffle carries only matching docs; per-term
    document frequencies ride the SAME keyless 1-row aggregate as
    N/sum_dl (array_contains per literal term — the first two
    spellings of this query were both scale traps: a groupBy-join df
    re-scanned the corpus, and a window df partitioned by a
    |terms|-cardinality key, serializing every matched row through
    ≤|terms| tasks); the scored rows pick their df from the broadcast
    1-row stats by a CASE on the term; the final top-k is a
    single-partition window over the per-doc aggregate (rows already
    reduced to matched docs), never a global sort of the corpus.
    """
    # NO _spread_scan here: BM25's per-row work (tokenize + explode) is
    # light relative to shipping the raw text through a rebalance
    # exchange — measured min-of-8 interleaved at sf0.1: raw 0.61 s vs
    # spread 0.98 s (the winnow family's md5-gram hashing is what makes
    # the rebalance pay; this pipeline has no such stage)
    docs = load_table(spark, sf_dir, "documents")
    toked = docs.select(
        "doc_id", F.split(F.lower("text"), " ").alias("toks")
    )
    toks = toked.select(
        "doc_id",
        F.size("toks").alias("dl"),
        F.explode("toks").alias("tok"),
    )
    tf = (
        toks.filter(F.col("tok").isin(*BM25_TERMS))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("tf"), F.min("dl").alias("dl"))
    )
    stats = toked.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size("toks")).alias("sum_dl"),
        *[
            F.sum(F.array_contains("toks", t).cast("int"))
            .cast("bigint")
            .alias(f"df_{t}")
            for t in BM25_TERMS
        ],
    )
    df_case = F.when(F.col("tok") == BM25_TERMS[0], F.col(f"df_{BM25_TERMS[0]}"))
    for t in BM25_TERMS[1:]:
        df_case = df_case.when(F.col("tok") == t, F.col(f"df_{t}"))
    scored = (
        tf.crossJoin(F.broadcast(stats))
        .withColumn("df", df_case)
        .withColumn(
            "avgdl",
            F.col("sum_dl").cast("double") / F.col("n_docs").cast("double"),
        )
        .withColumn(
            "contrib_micros",
            F.round(
                F.log(
                    F.lit(1.0)
                    + (F.col("n_docs") - F.col("df") + 0.5)
                    / (F.col("df") + 0.5)
                )
                * (F.col("tf") * 2.2)
                / (
                    F.col("tf")
                    + 1.2 * (0.25 + 0.75 * F.col("dl") / F.col("avgdl"))
                )
                * 1000000.0
            ).cast("bigint"),
        )
    )
    w = W.orderBy(F.col("bm25_micros").desc(), "doc_id")
    return (
        scored.groupBy("doc_id")
        .agg(F.sum("contrib_micros").cast("bigint").alias("bm25_micros"))
        .withColumn("rn", F.row_number().over(w).cast("int"))
        .filter(F.col("rn") <= 10)
        .orderBy("rn")
    )


@register(
    "dedup_winnow_cut",
    oracle=f"""
WITH grams AS (
  SELECT doc_id,
         list_transform(range(1, len(toks) - {K} + 2),
           i -> substr(md5(array_to_string(toks[i:i+{K - 1}], ' ')), 1, 16))
           AS hashes
  FROM (SELECT doc_id, str_split(lower(text), ' ') AS toks FROM documents)
  WHERE len(toks) >= {K + WIN - 1}
), fpp AS (
  SELECT DISTINCT doc_id, w.fp AS fp, w.pos AS pos FROM (
    SELECT doc_id,
           unnest(list_transform(range(1, len(hashes) - {WIN} + 2),
             s -> {{'fp': list_aggregate(hashes[s:s+{WIN - 1}], 'min'),
                    'pos': s - 1 + list_position(hashes[s:s+{WIN - 1}],
                      list_aggregate(hashes[s:s+{WIN - 1}], 'min'))}})) AS w
    FROM grams)
), marked AS (
  SELECT doc_id, pos,
         min(doc_id) OVER (PARTITION BY fp) AS mn,
         max(doc_id) OVER (PARTITION BY fp) AS mx
  FROM fpp
), spans AS (
  SELECT doc_id, list_sort(list(DISTINCT pos)) AS poss
  FROM marked WHERE mn <> mx AND doc_id <> mn
  GROUP BY doc_id
), cutdocs AS (
  SELECT d.doc_id, str_split(lower(d.text), ' ') AS toks,
         coalesce(s.poss, []) AS poss
  FROM documents d LEFT JOIN spans s USING (doc_id)
)
SELECT doc_id,
       CAST(len(toks) AS BIGINT) AS n_toks,
       CAST(len(toks) - len(keep_idx) AS BIGINT) AS n_cut,
       md5(coalesce(array_to_string(
         list_transform(keep_idx, i -> toks[i]), ' '), '')) AS kept_md5
FROM (
  SELECT doc_id, toks,
         list_filter(range(1, len(toks) + 1),
           t -> NOT list_contains(covered, t)) AS keep_idx
  FROM (SELECT doc_id, toks,
               list_distinct(flatten(list_transform(
                 poss, p -> range(p, p + {K})))) AS covered
        FROM cutdocs)
)
ORDER BY doc_id
""",
    tags=("retrieval", "datapipe", "dedup", "fingerprint", "bench"),
)
def dedup_winnow_cut(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Substring dedup CUT: remove the matched spans, keep the rest.

    `dedup_winnow_fingerprint` FLAGS suspect documents; the Lee et al.
    substring pass its docstring cites removes the shared span and
    keeps the remainder.  This operator does the cut: winnow
    fingerprints carry their gram start index through the window-min
    selection (winnow_fingerprint_positions), a fingerprint is SHARED
    when >= 2 distinct documents selected it, the lowest doc_id among
    the sharers is the canonical owner and keeps its copy (the
    keep-first rule every dedup in this family uses), and every other
    sharer cuts tokens [pos, pos+K-1] for each of its matched
    positions.  The document is reassembled from its surviving tokens
    in order (over the lowered token stream the fingerprints are
    defined on) and emitted as md5 + counts, like
    dedup_paragraph_reassemble.

    Shape at 100 TB: shared-ness and ownership come from ONE
    fp-partitioned window (min==max doc_id distinguishes 1-doc from
    multi-doc fingerprints — no count-distinct, no self-join, and a
    boilerplate span in k documents costs k rows, never k²); cut
    positions aggregate per doc (exchange 2, doc-bounded rows of
    bigint positions — never text); the span list joins back to the
    corpus on doc_id (exchange 3 — bucketed away at 100 TB, the
    corpus_snapshot_diff layout) and the cut+reassembly itself is
    per-row codegen array arithmetic: covered = flatten of K-length
    ranges, keep = array_except over the index sequence, kept text
    re-joined and hashed map-side.
    """
    docs = _spread_scan(
        load_table(spark, sf_dir, "documents"), sf_dir, "documents"
    )
    fpp = winnow_fingerprint_positions(docs)
    wfp = W.partitionBy("fp")
    spans = (
        fpp.select(
            "doc_id",
            "pos",
            F.min("doc_id").over(wfp).alias("mn"),
            F.max("doc_id").over(wfp).alias("mx"),
        )
        .filter((F.col("mn") != F.col("mx")) & (F.col("doc_id") != F.col("mn")))
        .groupBy("doc_id")
        .agg(F.sort_array(F.collect_set("pos")).alias("poss"))
    )
    toked = docs.select(
        "doc_id", F.split(F.lower("text"), " ").alias("toks")
    )
    joined = toked.join(spans, "doc_id", "left").withColumn(
        "poss", F.coalesce("poss", F.expr("cast(array() as array<bigint>)"))
    )
    covered = F.array_distinct(
        F.flatten(
            F.transform(
                F.col("poss"), lambda p: F.sequence(p, p + F.lit(K - 1))
            )
        )
    )
    keep_idx = F.array_except(
        F.sequence(F.lit(1).cast("bigint"), F.size("toks").cast("bigint")),
        covered,
    )
    kept = F.transform(
        F.col("keep_idx"),
        lambda i: F.element_at(F.col("toks"), i.cast("int")),
    )
    return (
        joined.withColumn("keep_idx", keep_idx)
        .select(
            "doc_id",
            F.size("toks").cast("bigint").alias("n_toks"),
            (F.size("toks") - F.size("keep_idx")).cast("bigint").alias("n_cut"),
            F.md5(F.array_join(kept, " ").cast("binary")).alias("kept_md5"),
        )
        .orderBy("doc_id")
    )


_BM25_QTERMS_VALUES = ", ".join(f"({q}, '{t}')" for q, t in BM25_QUERIES)


@register(
    "text_bm25_multiquery",
    oracle=f"""
WITH qterms(query_id, term) AS (VALUES {_BM25_QTERMS_VALUES}),
toked AS (
  SELECT doc_id, str_split(lower(text), ' ') AS toks FROM documents
), tf AS (
  SELECT doc_id, tok, count(*) AS tf, min(dl) AS dl
  FROM (SELECT doc_id, len(toks) AS dl, unnest(toks) AS tok FROM toked)
  WHERE tok IN (SELECT term FROM qterms)
  GROUP BY doc_id, tok
), df AS (
  SELECT tok, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY tok
), stats AS (
  SELECT count(*) AS n_docs, sum(len(toks)) AS sum_dl FROM toked
), scored AS (
  SELECT q.query_id, tf.doc_id,
         CAST(round(
           ln(1.0 + (n_docs - df + 0.5) / (df + 0.5))
           * (tf * 2.2)
           / (tf + 1.2 * (0.25 + 0.75 * dl /
                (CAST(sum_dl AS DOUBLE) / CAST(n_docs AS DOUBLE))))
           * 1000000.0) AS BIGINT) AS contrib_micros
  FROM tf JOIN df USING (tok)
          JOIN qterms q ON tf.tok = q.term
          CROSS JOIN stats
)
SELECT query_id, doc_id, bm25_micros, rn FROM (
  SELECT query_id, doc_id,
         CAST(sum(contrib_micros) AS BIGINT) AS bm25_micros,
         CAST(row_number() OVER (
           PARTITION BY query_id
           ORDER BY sum(contrib_micros) DESC, doc_id) AS INT) AS rn
  FROM scored GROUP BY query_id, doc_id
) t
WHERE rn <= 10
ORDER BY query_id, rn
""",
    tags=("retrieval", "text", "bm25", "bench"),
)
def text_bm25_multiquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 as a real retrieval OPERATOR: the query is a TABLE of
    (query_id, term) rows, scored for every query in ONE corpus pass —
    the round-10 `text_bm25_topk` generalized past its fixed 3-literal
    term unrolling (its `df_<t>` columns and term CASE grow with the
    query set; a query TABLE does not).

    Same Okapi scoring (k1=1.2, b=0.75, idf = ln(1 + (N−df+0.5)/
    (df+0.5))) and the same integer-micro quantization per (doc, term)
    contribution (addend-order-free sums; COMPAT.md).  A term shared
    by two queries ('merge' in q1 and q3) is counted once in tf/df and
    fanned out only at the bounded qterms join.

    Shape at 100 TB: the corpus tokenizes ONCE; the term filter is a
    left-semi join against the BROADCAST distinct-terms set (bounded
    by the query table — audit/probe query sets are fixed-size in
    production, so the broadcast is unconditional the same way the ANN
    family's constant query sets are), so the (doc, tok) aggregate
    shuffle carries only matching docs.  Document frequencies are an
    aggregate OF tf — never a second corpus scan (the round-10
    rejected-spelling lesson); df is |terms|-bounded and broadcasts
    back.  Corpus-level N/avgdl ride the same keyless 1-row stats
    aggregate as the fixed-term form.  The per-query top-k filters
    row_number() <= 10 over a |queries|-keyed window — Spark's
    WindowGroupLimit prunes each partition to its top 10 BEFORE the
    exchange, so the window never materializes a query's full match
    list on one task.
    """
    # NO _spread_scan (same measurement as text_bm25_topk: raw 1.01 s
    # vs rebalanced 1.11 s min-of-8 interleaved — tokenize+explode is
    # too light to pay for a text rebalance exchange)
    docs = load_table(spark, sf_dir, "documents")
    # The query table as a literal-array explode (not createDataFrame,
    # which plans as an opaque ExistingRDD scan): stays in Catalyst
    # with exact row counts, no Python->JVM row serialization.  In
    # production this is `spark.read.table("audit_queries")`.
    qterms = spark.range(1).select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(q).cast("int").alias("query_id"),
                        F.lit(t).alias("term"),
                    )
                    for q, t in BM25_QUERIES
                ]
            )
        ).alias("qt")
    ).select("qt.query_id", "qt.term")
    terms = qterms.select("term").distinct()
    toked = docs.select(
        "doc_id", F.split(F.lower("text"), " ").alias("toks")
    )
    toks = toked.select(
        "doc_id",
        F.size("toks").alias("dl"),
        F.explode("toks").alias("tok"),
    )
    # persist() the matched-docs aggregate: tf feeds BOTH the scored
    # rows and the df aggregate, and per-branch column pruning
    # specializes the two subtrees (scored keeps tf/dl, df keeps only
    # the key) so ReuseExchange cannot merge them — without the cache
    # the executed plan re-runs the tokenize+semi-join+aggregate from
    # a SECOND corpus scan (observed in this query's first spelling;
    # same mechanism as tpcds_return_ratio_rank's persist, round 7).
    # The cached set is (matched docs × query terms) — the operator's
    # working set, a term-filtered fraction of the corpus.
    tf = (
        toks.join(
            F.broadcast(terms), toks["tok"] == terms["term"], "left_semi"
        )
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("tf"), F.min("dl").alias("dl"))
        .persist()
    )
    df = tf.groupBy("tok").agg(
        F.count(F.lit(1)).cast("bigint").alias("df")
    )
    stats = toked.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size("toks")).alias("sum_dl"),
    )
    scored = (
        tf.join(F.broadcast(df), "tok")
        .join(F.broadcast(qterms), F.col("tok") == F.col("term"))
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "avgdl",
            F.col("sum_dl").cast("double") / F.col("n_docs").cast("double"),
        )
        .withColumn(
            "contrib_micros",
            F.round(
                F.log(
                    F.lit(1.0)
                    + (F.col("n_docs") - F.col("df") + 0.5)
                    / (F.col("df") + 0.5)
                )
                * (F.col("tf") * 2.2)
                / (
                    F.col("tf")
                    + 1.2 * (0.25 + 0.75 * F.col("dl") / F.col("avgdl"))
                )
                * 1000000.0
            ).cast("bigint"),
        )
    )
    w = W.partitionBy("query_id").orderBy(
        F.col("bm25_micros").desc(), "doc_id"
    )
    return (
        scored.groupBy("query_id", "doc_id")
        .agg(F.sum("contrib_micros").cast("bigint").alias("bm25_micros"))
        .withColumn("rn", F.row_number().over(w).cast("int"))
        .filter(F.col("rn") <= 10)
        .orderBy("query_id", "rn")
    )


@register(
    "decontaminate_winnow_spans",
    oracle=f"""
WITH fps AS (
  SELECT doc_id, source,
         unnest(list_distinct(list_transform(
           range(1, len(hashes) - {WIN} + 2),
           s -> list_aggregate(hashes[s:s+{WIN - 1}], 'min')))) AS fp
  FROM (
    SELECT doc_id, source,
           list_transform(range(1, len(toks) - {K} + 2),
             i -> substr(md5(array_to_string(toks[i:i+{K - 1}], ' ')), 1, 16)) AS hashes
    FROM (SELECT doc_id, source, str_split(lower(text), ' ') AS toks
          FROM documents)
    WHERE len(toks) >= {K + WIN - 1}
  )
), eval_fps AS (
  SELECT DISTINCT fp FROM fps WHERE doc_id % 25 = 0
), hit AS (
  SELECT t.doc_id, t.source, count(*) AS n_spans
  FROM fps t JOIN eval_fps e USING (fp)
  WHERE t.doc_id % 25 <> 0
  GROUP BY t.doc_id, t.source
)
SELECT source,
       CAST(count(*) AS BIGINT) AS docs_flagged,
       CAST(max(n_spans) AS BIGINT) AS max_spans,
       CAST(sum(n_spans) AS BIGINT) AS total_spans
FROM hit
GROUP BY source
ORDER BY source
""",
    tags=("retrieval", "datapipe", "decontamination", "fingerprint"),
)
def decontaminate_winnow_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Substring-level benchmark decontamination: flag training
    documents sharing a winnow fingerprint with the eval set (every
    25th document here; a benchmark suite in production) — i.e. a
    likely COPIED SPAN of >= K+WIN-1 tokens, the leakage class the
    5-gram set-overlap pass (decontaminate_ngram_overlap) reports only
    statistically and a MinHash doc-signature misses entirely.

    Shape at 100 TB: the eval index is the winnowed fingerprint set —
    ~2/(WIN+1) of the eval corpus's grams by the winnowing density
    bound, so the thing broadcast is a FRACTION of what the 5-gram
    variant ships — and the training side joins against it with no
    shuffle of the corpus (the broadcast is size-gated the same way:
    eval suites are fixed-size in production, this fixture's grows
    with the corpus, so _dim_hint keys on the documents table).
    Per-doc hit counts aggregate (doc_id, source) pairs, never text.
    """
    fps = winnow_fingerprints(
        _spread_scan(
            load_table(spark, sf_dir, "documents"), sf_dir, "documents"
        ),
        carry=("source",),
    )
    eval_fps = fps.filter(F.col("doc_id") % 25 == 0).select("fp").distinct()
    hits = (
        fps.filter(F.col("doc_id") % 25 != 0)
        .join(_dim_hint(eval_fps, sf_dir, "documents"), "fp")
        .groupBy("doc_id", "source")
        .agg(F.count(F.lit(1)).alias("n_spans"))
    )
    return (
        hits.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("docs_flagged"),
            F.max("n_spans").cast("bigint").alias("max_spans"),
            F.sum("n_spans").cast("bigint").alias("total_spans"),
        )
        .orderBy("source")
    )
