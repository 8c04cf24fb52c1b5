#!/usr/bin/env python
"""Scale-data generator — the same star schema as /root/testdata at an
arbitrary scale factor, for the SCALE.md scaling-exponent program
(round-8 verdict, "Next round #5").

The driver's testdata tops out at sf0.1 (600k lineitem) with ONE parquet
row group per table, which caps single-table scan parallelism at one
core (measured in bench.py's header note).  This generator exists to
measure how the engine's plans and wall-clock scale ACROSS decades of
data growth, so it:

- matches the driver tables' schema exactly (column names, types,
  timestamp[us], float32 embeddings) and their measured distributions
  (dev-profiled against sf0.1: key ranges, categorical frequencies,
  lines-per-order ~ U{1..7}, unit-norm embeddings, ~0.2% duplicate
  documents, 15k users per sf0.1 of events);
- scales row counts linearly (TPC-H-proportional: lineitem 6M/sf,
  orders 1.5M/sf, customer 150k/sf, supplier 10k/sf, part 200k/sf;
  events 1M/sf, documents 50k/sf, embeddings 20k/sf);
- writes MULTI-row-group parquet (256k rows/group) so scans
  parallelize the way a real 100 TB table would — scaling exponents
  measured on single-row-group files would mostly measure the
  one-core scan bottleneck, not the engine;
- is fully deterministic (numpy PCG64 seeded from (42, sf, table)) and
  chunked (1M rows per generation chunk) so any sf fits in memory.

Cross-generator numbers are NOT comparable: a bench at this
generator's sf0.1 differs from the driver's sf0.1 (row-group count,
RNG).  Exponents must be computed within one generator's series —
that is exactly how SCALE.md's round-9 table uses it.

Usage: python dev/gen_scale_data.py SF [SF...] [--skew S] [--dup-skew D]
Writes to /root/repo/scaledata/sf{SF}/ (gitignored — ~170 MB/sf);
with --skew S, to /root/repo/scaledata/sf{SF}-skew{S}/; with
--dup-skew D, to /root/repo/scaledata/sf{SF}-dup{D}/ (suffixes
compose).

--skew S (round-9 verdict, "Next round #1"): draw the fact tables'
foreign keys Zipf(S)-distributed instead of uniform — the realistic
web-corpus hot-key shape (S ~ 1.1-1.3; at S=1.2 over 150k customers
the hottest key takes ~19% of all orders).  Skewed columns:
``orders.o_custkey``, ``lineitem.l_partkey`` / ``l_suppkey``,
``events.user_id``; additionally 0.1% of orders become "bulk" orders
with U{50..500} lines so ``l_orderkey`` multiplicity is heavy-tailed
too.  Hot ranks are scattered through key space by a fixed
permutation, so skew never correlates with key-ordered attributes and
hot keys don't hash adjacently.  Row COUNTS are unchanged except
lineitem's ~+7% from bulk orders — uniform-vs-skewed wall-time deltas
are therefore attributable to skew, not volume.

--dup-skew D (round-10 verdict, "Next round #2"): the --skew dial's
missing axis — DUPLICATION skew in the corpus itself.  ~10% of
documents AND embeddings rows are overwritten into heavy-tailed
duplicate clusters: cluster sizes Zipf(D)-drawn, clipped to [2, n/100],
with the first cluster FORCED to n/100 rows (the "boilerplate page
copied onto 1% of the corpus" shape the star-cluster dedups exist
for; at sf1 that's a 1000-document cluster).  This is the shape where
pair-join dedups (dedup_minhash_lsh's bucket join) do O(k²) work per
cluster while the star form does k−1 — previously argued only by the
k=3000 synthetic guard in tests/test_skew_stress.py.  The FACT tables
are byte-identical between sf{SF} and sf{SF}-dup{D} (the mirror of
--skew's noise control, where documents/embeddings stay identical);
row counts, document lengths, and vocabulary are unchanged — only
which rows share content moves — so uniform-vs-dup wall-time deltas
are attributable to duplication structure, not volume.
"""

from __future__ import annotations

import os
import sys
import zlib

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT_BASE = os.path.join(REPO, "scaledata")

ROW_GROUP = 256 * 1024
CHUNK = 1_000_000

SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
STATUSES = ["F", "O", "P"]
RETURNFLAGS = ["A", "N", "R"]
LINESTATUSES = ["F", "O"]
EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]
PTYPES = ["LARGE", "ECONOMY", "SMALL", "STANDARD", "MEDIUM", "PROMO"]
# vocabularies below are the DRIVER data's exact value sets (profiled
# from /root/testdata/sf0.1) — queries filter on literals like
# p_name LIKE '%widget%' and n_name = 'NATION_1', so a divergent
# vocabulary silently empties their outputs (q7/q9 caught this)
ADJS = ["blue", "old", "small", "large", "hot", "red", "new", "cold"]
NOUNS = ["widget", "gizmo", "ring", "gear", "anvil", "bolt", "plate", "rod"]
LANGS = ["en", "de", "es", "fr", "zh"]
LANG_W = [0.41, 0.14, 0.15, 0.15, 0.15]
VOCAB = ["a", "agg", "batch", "big", "column", "customer", "data", "dup",
         "fast", "filter", "group", "hash", "join", "key", "line",
         "merge", "order", "part", "query", "row", "scan", "slow",
         "small", "sort", "spark", "stream", "table", "the", "value",
         "vector", "window"]

DAY_US = 86_400_000_000


def _rng(sf: float, table: str) -> np.random.Generator:
    # zlib.crc32, NOT hash(): Python randomizes str hashes per process
    # (PYTHONHASHSEED), which silently made every generator run draw
    # different streams — "fully deterministic" only held within one
    # process, so cross-RUN byte-identity controls (uniform dir vs
    # skew/dup dir generated separately) were broken.  Found round 11
    # while verifying the --dup-skew noise control; crc32 is stable
    # across processes and platforms.
    return np.random.default_rng(
        [42, int(round(sf * 1000)), zlib.crc32(table.encode())]
    )


# set by main() from --skew; None = uniform keys (the default)
SKEW: float | None = None

# set by main() from --dup-skew; None = only the organic ~0.2%/0.3%
# duplicate rate every dir has (the default)
DUP_SKEW: float | None = None


def _dup_assign(
    rng: np.random.Generator, n: int
) -> tuple[np.ndarray, np.ndarray]:
    """(src_idx, dst_idx): rows dst_idx[i] get overwritten with the
    content of src_idx[i], forming heavy-tailed duplicate clusters.

    ~10% of rows join clusters; sizes are Zipf(DUP_SKEW) clipped to
    [2, n/100]; the first cluster is pinned at n/100 (the hottest
    boilerplate page).  Members come from one permutation, so clusters
    are disjoint, scattered through id space, and each cluster's
    source row keeps its organic content (size-k cluster = 1 organic
    row + k-1 overwrites)."""
    budget = n // 10
    kmax = max(2, n // 100)
    sizes = [kmax]
    while sum(sizes) < budget:
        sizes.append(int(np.clip(rng.zipf(DUP_SKEW), 2, kmax)))
    perm = rng.permutation(n)
    src: list[np.ndarray] = []
    dst: list[np.ndarray] = []
    pos = 0
    for k in sizes:
        rows = perm[pos:pos + k]
        if len(rows) < 2:
            break
        pos += k
        src.append(np.repeat(rows[0], len(rows) - 1))
        dst.append(rows[1:])
    return np.concatenate(src), np.concatenate(dst)

_PERM_CACHE: dict[int, np.ndarray] = {}


def _fk(rng: np.random.Generator, n_keys: int, m: int) -> np.ndarray:
    """m foreign keys over [0, n_keys): uniform, or Zipf(SKEW).

    Zipf by inverse-CDF over the n_keys ranks (exact, bounded — unlike
    numpy's unbounded Generator.zipf), then rank -> key through a fixed
    per-cardinality permutation so the hot keys are scattered across
    key space rather than clustered at 0..k.
    """
    if SKEW is None:
        return rng.integers(0, n_keys, m)
    w = np.arange(1, n_keys + 1, dtype="float64") ** -SKEW
    cdf = np.cumsum(w)
    cdf /= cdf[-1]
    ranks = np.searchsorted(cdf, rng.random(m), side="left")
    if n_keys not in _PERM_CACHE:
        _PERM_CACHE[n_keys] = np.random.default_rng([7, n_keys]).permutation(n_keys)
    return _PERM_CACHE[n_keys][ranks]


def _writer(path: str, schema: pa.Schema) -> pq.ParquetWriter:
    return pq.ParquetWriter(path, schema, compression="snappy")


def _ts_us(days_int: np.ndarray) -> pa.Array:
    # midnight timestamps: integer days since epoch -> timestamp[us]
    return pa.array(days_int.astype("int64") * DAY_US, type=pa.timestamp("us"))


def gen_region_nation(out: str) -> None:
    regions = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
    pq.write_table(
        pa.table({"r_regionkey": pa.array(range(5), pa.int32()),
                  "r_name": regions}),
        os.path.join(out, "region.parquet"))
    pq.write_table(
        pa.table({"n_nationkey": pa.array(range(25), pa.int32()),
                  "n_name": [f"NATION_{i}" for i in range(25)],
                  "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int32())}),
        os.path.join(out, "nation.parquet"))


def gen_customer(out: str, sf: float) -> int:
    n = int(150_000 * sf)
    rng = _rng(sf, "customer")
    tbl = pa.table({
        "c_custkey": pa.array(np.arange(n), pa.int64()),
        "c_name": [f"Customer#{i:09d}" for i in range(n)],
        "c_nationkey": pa.array(rng.integers(0, 25, n), pa.int32()),
        "c_acctbal": np.round(rng.uniform(-1000, 10000, n), 2),
        "c_mktsegment": np.array(SEGMENTS)[rng.integers(0, 5, n)],
    })
    pq.write_table(tbl, os.path.join(out, "customer.parquet"),
                   row_group_size=ROW_GROUP)
    return n


def gen_supplier(out: str, sf: float) -> int:
    n = int(10_000 * sf)
    rng = _rng(sf, "supplier")
    tbl = pa.table({
        "s_suppkey": pa.array(np.arange(n), pa.int64()),
        "s_name": [f"Supplier#{i:09d}" for i in range(n)],
        "s_nationkey": pa.array(rng.integers(0, 25, n), pa.int32()),
        "s_acctbal": np.round(rng.uniform(-1000, 10000, n), 2),
    })
    pq.write_table(tbl, os.path.join(out, "supplier.parquet"),
                   row_group_size=ROW_GROUP)
    return n


def gen_part(out: str, sf: float) -> int:
    n = int(200_000 * sf)
    rng = _rng(sf, "part")
    adj = np.array(ADJS)[rng.integers(0, len(ADJS), n)]
    noun = np.array(NOUNS)[rng.integers(0, len(NOUNS), n)]
    tbl = pa.table({
        "p_partkey": pa.array(np.arange(n), pa.int64()),
        "p_name": np.char.add(np.char.add(adj, " "), noun),
        "p_brand": np.array([f"Brand#{b}" for b in range(1, 26)])[
            rng.integers(0, 25, n)],
        "p_type": np.array(PTYPES)[rng.integers(0, len(PTYPES), n)],
        "p_size": pa.array(rng.integers(1, 51, n), pa.int32()),
        "p_retailprice": np.round(rng.uniform(900, 1000, n), 2),
    })
    pq.write_table(tbl, os.path.join(out, "part.parquet"),
                   row_group_size=ROW_GROUP)
    return n


def gen_orders_lineitem(out: str, sf: float, n_cust: int, n_part: int,
                        n_supp: int) -> tuple[int, int]:
    n_ord = int(1_500_000 * sf)
    rng = _rng(sf, "orders")
    date_lo = np.datetime64("1995-01-01").astype("datetime64[D]").astype(int)
    date_hi = np.datetime64("2001-08-01").astype("datetime64[D]").astype(int)
    ow = _writer(os.path.join(out, "orders.parquet"), pa.schema([
        ("o_orderkey", pa.int64()), ("o_custkey", pa.int64()),
        ("o_orderstatus", pa.string()), ("o_totalprice", pa.float64()),
        ("o_orderdate", pa.timestamp("us")), ("o_orderpriority", pa.string()),
    ]))
    lw = _writer(os.path.join(out, "lineitem.parquet"), pa.schema([
        ("l_orderkey", pa.int64()), ("l_partkey", pa.int64()),
        ("l_suppkey", pa.int64()), ("l_linenumber", pa.int32()),
        ("l_quantity", pa.float64()), ("l_extendedprice", pa.float64()),
        ("l_discount", pa.float64()), ("l_tax", pa.float64()),
        ("l_returnflag", pa.string()), ("l_linestatus", pa.string()),
        ("l_shipdate", pa.timestamp("us")),
    ]))
    n_line_total = 0
    for lo in range(0, n_ord, CHUNK):
        m = min(CHUNK, n_ord - lo)
        okey = np.arange(lo, lo + m)
        odate = rng.integers(date_lo, date_hi + 1, m)
        ords = pa.table({
            "o_orderkey": pa.array(okey, pa.int64()),
            "o_custkey": pa.array(_fk(rng, n_cust, m), pa.int64()),
            "o_orderstatus": np.array(STATUSES)[rng.integers(0, 3, m)],
            "o_totalprice": np.round(rng.uniform(1000, 500000, m), 2),
            "o_orderdate": _ts_us(odate),
            "o_orderpriority": np.array(PRIORITIES)[rng.integers(0, 5, m)],
        })
        ow.write_table(ords, row_group_size=ROW_GROUP)
        # 1..7 lines per order (measured mean 4.075 ~= U{1..7});
        # in skew mode 0.1% of orders are "bulk" (50..500 lines) so
        # l_orderkey multiplicity is heavy-tailed as well
        nlines = rng.integers(1, 8, m)
        if SKEW is not None:
            bulk = rng.random(m) < 0.001
            nlines = np.where(bulk, rng.integers(50, 501, m), nlines)
        k = int(nlines.sum())
        l_okey = np.repeat(okey, nlines)
        l_odate = np.repeat(odate, nlines)
        linenum = (np.arange(k) - np.repeat(
            np.concatenate(([0], np.cumsum(nlines)[:-1])), nlines) + 1)
        lines = pa.table({
            "l_orderkey": pa.array(l_okey, pa.int64()),
            "l_partkey": pa.array(_fk(rng, n_part, k), pa.int64()),
            "l_suppkey": pa.array(_fk(rng, n_supp, k), pa.int64()),
            "l_linenumber": pa.array(linenum, pa.int32()),
            "l_quantity": rng.integers(1, 51, k).astype("float64"),
            "l_extendedprice": np.round(rng.uniform(900, 105000, k), 2),
            "l_discount": np.round(rng.integers(0, 11, k) / 100.0, 2),
            "l_tax": np.round(rng.integers(0, 9, k) / 100.0, 2),
            "l_returnflag": np.array(RETURNFLAGS)[rng.integers(0, 3, k)],
            "l_linestatus": np.array(LINESTATUSES)[rng.integers(0, 2, k)],
            "l_shipdate": _ts_us(l_odate + rng.integers(1, 96, k)),
        })
        lw.write_table(lines, row_group_size=ROW_GROUP)
        n_line_total += k
    ow.close()
    lw.close()
    return n_ord, n_line_total


def gen_events(out: str, sf: float) -> int:
    n = int(1_000_000 * sf)
    n_users = max(1, int(15_000 * sf))
    rng = _rng(sf, "events")
    t_lo = np.datetime64("2024-01-01T00:00:00").astype("datetime64[us]").astype(int)
    t_hi = np.datetime64("2024-01-31T00:00:00").astype("datetime64[us]").astype(int)
    w = _writer(os.path.join(out, "events.parquet"), pa.schema([
        ("event_id", pa.int64()), ("ts", pa.timestamp("us")),
        ("user_id", pa.int64()), ("event_type", pa.string()),
        ("value", pa.float64()), ("props", pa.string()),
    ]))
    for lo in range(0, n, CHUNK):
        m = min(CHUNK, n - lo)
        ks = rng.integers(0, 100, m)
        w.write_table(pa.table({
            "event_id": pa.array(np.arange(lo, lo + m), pa.int64()),
            "ts": pa.array(np.sort(rng.integers(t_lo, t_hi, m)),
                           pa.timestamp("us")),
            "user_id": pa.array(_fk(rng, n_users, m), pa.int64()),
            "event_type": np.array(EVENT_TYPES)[rng.integers(0, 5, m)],
            "value": np.round(np.minimum(rng.exponential(60.0, m), 999.0), 2),
            "props": np.array([f'{{"k": {k}}}' for k in ks]),
        }), row_group_size=ROW_GROUP)
    w.close()
    return n


def gen_documents(out: str, sf: float) -> int:
    n = int(50_000 * sf)
    rng = _rng(sf, "documents")
    vocab = np.array(VOCAB)
    nwords = rng.integers(8, 101, n)
    flat = vocab[rng.integers(0, len(vocab), int(nwords.sum()))]
    texts: list[str] = []
    pos = 0
    for c in nwords:
        texts.append(" ".join(flat[pos:pos + c]))
        pos += c
    # ~0.2% exact duplicates + ~0.3% near-duplicates (one word changed)
    # so the dedup family has real work at every sf
    n_dup = max(1, n // 500)
    src_idx = rng.integers(0, n, n_dup)
    dst_idx = rng.integers(0, n, n_dup)
    for s, t in zip(src_idx, dst_idx):
        if s != t:
            texts[t] = texts[s]
    n_near = max(1, (3 * n) // 1000)
    for s, t in zip(rng.integers(0, n, n_near), rng.integers(0, n, n_near)):
        if s != t:
            words = texts[s].split(" ")
            words[int(rng.integers(0, len(words)))] = str(vocab[int(rng.integers(0, len(vocab)))])
            texts[t] = " ".join(words)
    if DUP_SKEW is not None:
        # dedicated rng stream: the organic rows above stay
        # byte-identical to the uniform dir; only overwritten rows move
        src_d, dst_d = _dup_assign(_rng(sf, "dup-documents"), n)
        for s, t in zip(src_d, dst_d):
            texts[t] = texts[s]
    tbl = pa.table({
        "doc_id": pa.array(np.arange(n), pa.int64()),
        "text": texts,
        "lang": np.array(LANGS)[rng.choice(5, n, p=LANG_W)],
        "source": np.array([f"src{i}" for i in range(20)])[rng.integers(0, 20, n)],
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    })
    pq.write_table(tbl, os.path.join(out, "documents.parquet"),
                   row_group_size=ROW_GROUP)
    return n


def gen_embeddings(out: str, sf: float) -> int:
    n = int(20_000 * sf)
    dim = 64
    rng = _rng(sf, "embeddings")
    labels = rng.integers(0, 10, n)
    # mild label clustering (unit cluster direction * 0.25 + noise),
    # unit-normalized like the driver data (measured |v| = 1.0 exactly)
    dirs = rng.standard_normal((10, dim))
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    v = rng.standard_normal((n, dim)) + 0.25 * dirs[labels] * np.sqrt(dim)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    v32 = v.astype("float32")
    if DUP_SKEW is not None:
        # identical-vector clusters (the class sign-bit LSH cannot
        # split, SCALE.md "identical-embedding dedup hazard"); labels
        # ride along so a duplicate is a full row copy
        src_d, dst_d = _dup_assign(_rng(sf, "dup-embeddings"), n)
        v32[dst_d] = v32[src_d]
        labels[dst_d] = labels[src_d]
    emb = pa.FixedSizeListArray.from_arrays(pa.array(v32.ravel()), dim).cast(
        pa.list_(pa.float32()))
    tbl = pa.table({
        "vec_id": pa.array(np.arange(n), pa.int64()),
        "embedding": emb,
        "label": pa.array(labels, pa.int32()),
    })
    pq.write_table(tbl, os.path.join(out, "embeddings.parquet"),
                   row_group_size=ROW_GROUP)
    return n


def main() -> None:
    global SKEW, DUP_SKEW
    argv = list(sys.argv[1:])
    if "--skew" in argv:
        i = argv.index("--skew")
        SKEW = float(argv[i + 1])
        del argv[i:i + 2]
    if "--dup-skew" in argv:
        i = argv.index("--dup-skew")
        DUP_SKEW = float(argv[i + 1])
        del argv[i:i + 2]
    sfs = [float(a) for a in argv] or [1.0]
    for sf in sfs:
        label = f"{sf:g}"
        suffix = f"-skew{SKEW:g}" if SKEW is not None else ""
        suffix += f"-dup{DUP_SKEW:g}" if DUP_SKEW is not None else ""
        out = os.path.join(OUT_BASE, f"sf{label}{suffix}")
        os.makedirs(out, exist_ok=True)
        print(f"generating sf{label} -> {out}")
        gen_region_nation(out)
        nc = gen_customer(out, sf)
        ns = gen_supplier(out, sf)
        npart = gen_part(out, sf)
        no, nl = gen_orders_lineitem(out, sf, nc, npart, ns)
        ne = gen_events(out, sf)
        nd = gen_documents(out, sf)
        nemb = gen_embeddings(out, sf)
        print(f"  customer={nc} supplier={ns} part={npart} orders={no} "
              f"lineitem={nl} events={ne} documents={nd} embeddings={nemb}")


if __name__ == "__main__":
    main()
