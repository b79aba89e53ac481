"""Property-based checks (hypothesis) for operators whose correctness
rests on a claimed algebraic identity — the rewrites are only safe if
they hold on adversarial inputs (nulls, duplicates, empty groups), not
just the fixtures."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from lab5_lakehouse_etl_spark.operators import relational as ops
from lab5_lakehouse_etl_spark.operators import skew

_key = st.one_of(st.none(), st.integers(0, 4))
_val = st.one_of(st.none(), st.integers(0, 3))
_rows = st.lists(st.tuples(_key, _val), min_size=0, max_size=25)

_SETTINGS = dict(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(data=_rows)
@settings(**_SETTINGS)
def test_rejected_keys_is_except_distinct(spark, data):
    """rejected_keys(df, k, cond) ≡ df.select(k) EXCEPT valid.select(k)
    for any row-local cond — including null keys and duplicate rows."""
    df = spark.createDataFrame(data, "k int, v int")
    cond = F.col("v").isNotNull() & (F.col("v") > 0)
    via_agg = ops.rejected_keys(df, ["k"], cond)
    via_except = df.select("k").subtract(df.filter(cond).select("k"))
    assert sorted(map(tuple, via_agg.collect()), key=str) == sorted(
        map(tuple, via_except.collect()), key=str
    )


@given(data=_rows)
@settings(**_SETTINGS)
def test_salted_agg_is_plain_agg(spark, data):
    df = spark.createDataFrame(data, "k int, v int")
    plain = df.groupBy("k").agg(
        F.sum("v").alias("s"), F.max("v").alias("m"), F.count("v").alias("c")
    )
    salted = skew.salted_agg(
        df, ["k"], {"s": ("v", "sum"), "m": ("v", "max"), "c": ("v", "count")},
        n_salts=4,
    )
    assert sorted(map(tuple, salted.select(*plain.columns).collect()), key=str) == sorted(
        map(tuple, plain.collect()), key=str
    )


@given(data=_rows)
@settings(**_SETTINGS)
def test_latest_wins_dedup_survivor(spark, data):
    """Exactly one survivor per key, and it carries the max order value
    (nulls lose), matching a driver-side reference computation."""
    df = spark.createDataFrame(data, "k int, v int")
    out = ops.latest_wins_dedup(df.filter(F.col("k").isNotNull()), ["k"], "v")
    got = {r.k: r.v for r in out.collect()}
    expect: dict[int, int | None] = {}
    for k, v in data:
        if k is None:
            continue
        if k not in expect:
            expect[k] = v
        else:
            cur = expect[k]
            if cur is None or (v is not None and v > cur):
                expect[k] = v
    assert got == expect


def test_sketch_quantile_error_bounded(spark):
    """GK-sketch quantile estimates stay within the rank-error bound
    implied by accuracy=10000 (1/accuracy relative rank error — on the
    fixture it is exact because group sizes are below the accuracy)."""
    from lab5_lakehouse_etl_spark import queries as Q
    from tests.conftest import SF_DIR

    Q.load_all()
    rows = Q.QUERIES["q_sketch_quantile"](spark, SF_DIR).collect()
    assert rows
    # the declared query emits the GK rank-error guarantee as booleans
    # (approx within the exact q ± _GK_EPS window) next to the exact
    # interpolated percentiles — assert the invariant holds AND that
    # the exact columns match a from-scratch sorted-list interpolation
    from lab5_lakehouse_etl_spark.session import load_table

    vals: dict[str, list[float]] = {}
    for row in (
        load_table(spark, SF_DIR, "events")
        .select("event_type", "value")
        .filter("value IS NOT NULL")
        .collect()
    ):
        vals.setdefault(row["event_type"], []).append(row["value"])

    def interp(group, q):
        pos = (len(group) - 1) * q
        lo, hi = int(pos), min(int(pos) + 1, len(group) - 1)
        return group[lo] + (pos - lo) * (group[hi] - group[lo])

    for r in rows:
        group = sorted(vals[r["event_type"]])
        assert r["n"] == len(group)
        for label, q in (("p50", 0.5), ("p95", 0.95), ("p99", 0.99)):
            assert r[f"{label}_ok"] is True, (r["event_type"], label)
            assert abs(r[f"{label}_exact"] - interp(group, q)) < 1e-3, (
                r["event_type"], label,
            )


_prune_rows = st.lists(
    st.tuples(
        st.integers(-5, 40),
        st.one_of(st.none(), st.floats(-4, 4, allow_nan=False, width=32)),
        st.text(alphabet="abc197-", min_size=0, max_size=10),
        st.dates(
            min_value=__import__("datetime").date(1996, 12, 25),
            max_value=__import__("datetime").date(1997, 1, 15),
        ),
    ),
    min_size=1,
    max_size=30,
)
_prune_op = st.sampled_from([">=", ">", "<=", "<", "=", "between"])
_prune_col = st.sampled_from(["k", "v", "s", "d"])
_prune_val = st.one_of(
    st.integers(-5, 40),
    st.floats(-4, 4, allow_nan=False),
    st.text(alphabet="abc197-", max_size=8),
    st.dates(
        min_value=__import__("datetime").date(1996, 12, 20),
        max_value=__import__("datetime").date(1997, 1, 20),
    ),
    st.datetimes(
        min_value=__import__("datetime").datetime(1996, 12, 20),
        max_value=__import__("datetime").datetime(1997, 1, 20),
    ),
    st.booleans(),
)


@given(data=_prune_rows, col=_prune_col, op=_prune_op, val=_prune_val, hi=_prune_val)
@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_manifest_pruning_sound_and_backend_agnostic(
    spark, tmp_path_factory, data, col, op, val, hi
):
    """For ANY predicate — matched, mismatched, or cross-kind — data
    skipping must (1) never drop a file holding a matching row
    (read(prune) ∘ filter ≡ filter: soundness) and (2) agree between
    the driver manifest walk and the distributed stats-checkpoint job.
    Hypothesis hunts the type-boundary cases (bools, temporal shapes,
    mixed kinds) the fixtures don't cover."""
    from lab5_lakehouse_etl_spark.lakehouse import LakeTable

    df = spark.createDataFrame(
        data, "k int, v float, s string, d date"
    ).repartitionByRange(3, "k")
    t = LakeTable.create(df, str(tmp_path_factory.mktemp("prop") / "t"))
    # bloom indexes join the contract: every "=" predicate below now
    # exercises the membership lane too (kind mismatches, empty
    # strings, values absent from every file)
    t.add_bloom_index("k", m=512, k=4)
    t.add_bloom_index("s", m=512, k=4)
    pred = [(col, "between", (val, hi)) if op == "between" else (col, op, val)]
    drv = t.prune_files(pred)
    dist = t.prune_files_distributed(spark, pred)
    assert drv == dist, f"driver/distributed disagree for {pred}"
    # soundness: pruned scan + row filter == full scan + row filter
    if op == "between":
        expr = F.col(col).between(F.lit(val), F.lit(hi))
    else:
        expr = {
            ">=": F.col(col) >= F.lit(val),
            ">": F.col(col) > F.lit(val),
            "<=": F.col(col) <= F.lit(val),
            "<": F.col(col) < F.lit(val),
            "=": F.col(col) == F.lit(val),
        }[op]
    try:
        full = sorted(map(str, t.read(spark).filter(expr).collect()))
    except Exception:
        return  # Spark itself rejects the cross-kind comparison: no contract
    pruned = sorted(map(str, t.read(spark, prune=pred).filter(expr).collect()))
    assert pruned == full, f"skipping dropped matching rows for {pred}"


def test_hll_sketch_merge_lossless_and_bounded(spark):
    """The persisted-sketch union must estimate what a direct
    whole-corpus sketch estimates to within the sketch's own error
    envelope (Datasketches HLL union is register-lossless, but the
    union target runs HLL_8 vs the sketch's HLL_4, so the ESTIMATOR can
    differ by a hair — the property that matters for a two-phase store
    is that merging adds no scan-order or partitioning error), and
    every estimate must sit within the lgK=12 relative-error envelope
    of the exact distinct count."""
    from pyspark.sql import functions as F

    from lab5_lakehouse_etl_spark import queries as Q
    from lab5_lakehouse_etl_spark.session import load_table
    from tests.conftest import SF_DIR

    Q.load_all()
    rows = {
        r["source"]: (r["exact_distinct"], r["est_ok"])
        for r in Q.QUERIES["q_sketch_hll_merge"](spark, SF_DIR).collect()
    }
    docs = (
        load_table(spark, SF_DIR, "documents")
        .filter(F.col("text").isNotNull())
        .select("source", F.xxhash64("text").alias("h"))
    )
    exact = {
        r["source"]: r["n"]
        for r in docs.groupBy("source")
        .agg(F.countDistinct("h").alias("n"))
        .collect()
    }
    exact["__all__"] = docs.select("h").distinct().count()
    # the declared query now carries the lgK=12 error envelope as the
    # est_ok boolean (|est − exact| ≤ max(3, 0.081·exact), ~5σ of the
    # 1.6% RSE plus the small-n exactness floor) and the exact count
    # itself — both must agree with a from-scratch computation
    assert set(rows) == set(exact)
    for src, (n_query, ok) in rows.items():
        assert n_query == exact[src], (src, n_query, exact[src])
        assert ok is True, src
    # merging adds no partitioning-dependent error: the union of the
    # persisted per-source sketches tracks a direct whole-corpus
    # sketch to well under the sketch's own RSE (observed off-by-2 at
    # n=500 from the HLL_4 vs HLL_8 estimator difference)
    sketches = docs.groupBy("source").agg(F.hll_sketch_agg("h", 12).alias("sk"))
    merged = sketches.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).cast("bigint")
    ).collect()[0][0]
    direct_global = docs.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("h", 12)).cast("bigint")
    ).collect()[0][0]
    n_all = exact["__all__"]
    assert abs(merged - direct_global) <= max(3, 0.01 * n_all)


_band_rows = st.lists(
    st.tuples(
        st.one_of(st.none(), st.integers(0, 1)),  # lang bucket
        st.one_of(st.none(), st.integers(0, 1)),  # source bucket
        st.one_of(st.none(), st.integers(0, 120)),  # band value
    ),
    min_size=1,
    max_size=30,
)


@given(data=_band_rows)
@settings(**_SETTINGS)
def test_interval_island_components_equal_generic_cc(spark, data):
    """q_dedup_clusters' r7 claim under adversarial inputs: for ANY
    banded relation (same group keys AND |delta band| <= 20), the
    gap-island partition of the sorted band values equals the
    transitive closure generic label propagation computes over the
    NULL-falsy equi-join edge relation.  Random values exercise what
    the fixture cannot: duplicate band values, exact-20 boundary
    gaps, singleton groups, and NULL keys/band values (which must
    come back as singleton components, not a merged NULL group)."""
    from lab5_lakehouse_etl_spark.functions.dedup import band_components
    from lab5_lakehouse_etl_spark.functions.graph import connected_components

    rows = [(i, lang, src, v) for i, (lang, src, v) in enumerate(data)]
    df = spark.createDataFrame(
        rows, "doc_id BIGINT, lang INT, source INT, n_chars INT"
    )
    island = {
        r.doc_id: r.component
        for r in band_components(
            df, id_col="doc_id", keys=["lang", "source"],
            band_col="n_chars", gap=20,
        ).collect()
    }
    # generic CC over the materialized pair relation
    a = df.select(
        F.col("doc_id").alias("src"), "lang", "source",
        F.col("n_chars").alias("na"),
    )
    b = df.select(
        F.col("doc_id").alias("dst"), F.col("lang").alias("lang_b"),
        F.col("source").alias("source_b"), F.col("n_chars").alias("nb"),
    )
    edges = a.join(
        b,
        (a.lang == b.lang_b)
        & (a.source == b.source_b)
        & (F.abs(F.col("na") - F.col("nb")) <= 20)
        & (F.col("src") != F.col("dst")),
    ).select("src", "dst")
    generic = {
        r.node: r.component
        for r in connected_components(
            df.select("doc_id"), edges, node_col="doc_id", max_iter=60
        ).collect()
    }
    assert island == generic


def test_cms_matrices_merge_by_elementwise_sum(spark):
    """Count-min linearity (the property that makes q_sketch_cms a
    SKETCH): the CMS of a union is the elementwise sum of the shards'
    matrices — so per-shard 8 KiB matrices roll up without touching
    tokens again."""
    from lab5_lakehouse_etl_spark.functions import text as T
    from lab5_lakehouse_etl_spark.session import load_table
    from tests.conftest import SF_DIR

    d, w = 4, 2048
    docs = load_table(spark, SF_DIR, "documents")

    def cms(df):
        toks = df.select(F.explode(T.tokens(F.col("text"))).alias("token"))
        buckets = F.array(
            *[
                F.pmod(F.xxhash64(F.col("token"), F.lit(r)), F.lit(w))
                for r in range(d)
            ]
        )
        rows = (
            toks.select(F.posexplode(buckets).alias("r", "bucket"))
            .groupBy("r", "bucket")
            .agg(F.count(F.lit(1)).alias("c"))
            .collect()
        )
        return {(x.r, x.bucket): x.c for x in rows}

    even = cms(docs.filter(F.col("doc_id") % 2 == 0))
    odd = cms(docs.filter(F.col("doc_id") % 2 == 1))
    merged = dict(even)
    for k, v in odd.items():
        merged[k] = merged.get(k, 0) + v
    assert merged == cms(docs)


_span_starts = st.lists(
    st.tuples(st.integers(0, 3), st.integers(0, 40)),
    min_size=0,
    max_size=30,
    unique=True,
)


@given(occ=_span_starts, n=st.sampled_from([3, 8]))
@settings(**_SETTINGS)
def test_merge_covered_spans_equals_bruteforce_union(spark, occ, n):
    """merge_covered_spans(occ, n) must equal the brute-force union of
    per-start coverage intervals [s, s+n-1] split into maximal
    contiguous runs — for any (doc, start) set, any gram width."""
    from lab5_lakehouse_etl_spark.functions import dedup as D

    if occ:
        df = spark.createDataFrame(
            [(d, s) for d, s in occ], "doc_id long, start long"
        )
    else:
        df = spark.createDataFrame([], "doc_id long, start long")
    got = sorted(
        (r.doc_id, r.span_start, r.span_len)
        for r in D.merge_covered_spans(df, n=n).collect()
    )
    # brute force: mark covered positions, emit maximal runs
    exp = []
    from collections import defaultdict

    byd = defaultdict(set)
    for d, s in occ:
        byd[d].update(range(s, s + n))
    for d, cov in byd.items():
        run = None
        for p in sorted(cov):
            if run and p == run[1] + 1:
                run[1] = p
            else:
                if run:
                    exp.append((d, run[0], run[1] - run[0] + 1))
                run = [p, p]
        if run:
            exp.append((d, run[0], run[1] - run[0] + 1))
    assert got == sorted(exp)


def test_bloom_filters_merge_by_bitwise_or(spark):
    """Bloom linearity (the property that makes q_sketch_bloom a
    SKETCH): the filter of a union is the wordwise bitwise OR of the
    shards' filters — so per-shard 1 KiB bit arrays roll up without
    re-hashing keys — and membership never false-negatives."""
    from lab5_lakehouse_etl_spark.session import load_table
    from tests.conftest import SF_DIR

    m_bits, n_hash = 8192, 4
    users = load_table(spark, SF_DIR, "events").select("user_id").distinct()

    def bloom(df):
        pos = F.explode(
            F.array(
                *[
                    F.pmod(
                        F.xxhash64(F.col("user_id"), F.lit(r)), F.lit(m_bits)
                    )
                    for r in range(n_hash)
                ]
            )
        ).alias("pos")
        rows = (
            df.select(pos)
            .select(
                F.expr("pos DIV 64").alias("word"),
                F.expr(
                    "shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT))"
                ).alias("mask"),
            )
            .groupBy("word")
            .agg(F.bit_or("mask").alias("bits"))
            .collect()
        )
        return {r.word: r.bits for r in rows}

    even = bloom(users.filter(F.col("user_id") % 2 == 0))
    odd = bloom(users.filter(F.col("user_id") % 2 == 1))
    merged = dict(even)
    for w, bits in odd.items():
        merged[w] = merged.get(w, 0) | bits
    full = bloom(users)
    assert merged == full
    # no false negatives: every key's bits are set in the full filter
    import pyspark.sql.functions as SF

    probes = users.select(
        "user_id",
        *[
            F.pmod(SF.xxhash64(F.col("user_id"), F.lit(r)), F.lit(m_bits)).alias(
                f"p{r}"
            )
            for r in range(n_hash)
        ],
    ).collect()
    for row in probes:
        for r in range(n_hash):
            p = row[f"p{r}"]
            assert full.get(p // 64, 0) & (1 << (p % 64))


@given(
    seed=st.integers(0, 10_000),
    n=st.integers(8, 40),
    k=st.integers(1, 6),
    n_blocks=st.sampled_from([2, 3, 5]),
)
@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_knn_graph_matches_bruteforce_property(spark, seed, n, k, n_blocks):
    """knn_graph over random corpora salted with duplicate and
    NEAR-TIE vectors (a clone nudged by ~1e-8 — well inside the local
    cut margin, the adversarial case for partial top-k) must equal the
    brute-force oracle semantics for every (n, k, n_blocks)."""
    import numpy as np
    from decimal import ROUND_HALF_UP, Decimal

    from lab5_lakehouse_etl_spark.functions import similarity as S

    rng = np.random.RandomState(seed)
    dim = 8
    vecs = rng.randn(n, dim)
    vecs[1] = vecs[0]                       # exact duplicate
    vecs[2] = vecs[0] + 1e-8 * rng.randn(dim)  # near-tie clone
    rows = [(i, [float(x) for x in vecs[i]]) for i in range(n)]
    df = spark.createDataFrame(rows, "vec_id BIGINT, embedding ARRAY<FLOAT>")
    got = {
        (r.src, r.nbr): (r.knn_rank, r.sim)
        for r in S.knn_graph(df, k=k, n_blocks=n_blocks).collect()
    }

    def fold_cos(a, b):
        dot = na = nb = 0.0
        for x, y in zip(a, b):
            dot += x * y
            na += x * x
            nb += y * y
        return dot / (na**0.5 * nb**0.5)

    def r6(x):
        return float(
            Decimal(x).quantize(Decimal("0.000001"), rounding=ROUND_HALF_UP)
        )

    # the float32 storage cast is part of the contract: fold over the
    # values the engine actually reads back
    V = [[float(np.float32(x)) for x in v] for v in vecs]
    exp = {}
    for i in range(n):
        sims = sorted(
            ((r6(fold_cos(V[i], V[j])), j) for j in range(n) if j != i),
            key=lambda t: (-t[0], t[1]),
        )[:k]
        for rank, (s, j) in enumerate(sims, 1):
            exp[(i, j)] = (rank, s)
    assert got == exp


@given(
    seed=st.integers(0, 10_000),
    n=st.integers(2, 18),
    thr=st.sampled_from([0.5, 0.8, 1.0]),
)
@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_containment_pairs_matches_bruteforce_property(spark, seed, n, thr):
    """containment_pairs (asymmetric prefix-probe / full-index join)
    must equal brute-force overlap-coefficient on adversarial corpora:
    tiny shared vocabulary (hot postings), planted exact duplicates
    (equal-size tie-break), planted strict subsets (the size-asymmetry
    case), and threshold 1.0 (prefix degenerates to a single token)."""
    import random

    from lab5_lakehouse_etl_spark.functions import dedup as D

    rng = random.Random(seed)
    vocab = [f"w{i}" for i in range(10)]
    rows = []
    for i in range(n):
        k = rng.randint(1, 7)
        rows.append((i, " ".join(rng.choice(vocab) for _ in range(k))))
    # plant a strict subset of doc 0 and an exact duplicate of doc 1
    toks0 = rows[0][1].split()
    rows.append((n, " ".join(toks0[: max(1, len(toks0) // 2)])))
    rows.append((n + 1, rows[1 % n][1]))
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    sets = {i: frozenset(t.lower().split()) for i, t in rows}
    want = {}
    ids = sorted(sets)
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            a, b = ids[x], ids[y]
            sa, sb = sets[a], sets[b]
            inter = len(sa & sb)
            m = min(len(sa), len(sb))
            if m and inter / m >= thr:
                sm, lg = (a, b) if (len(sa), a) <= (len(sb), b) else (b, a)
                want[(sm, lg)] = inter / m

    got = {
        (r.id_small, r.id_large): r.containment
        for r in D.containment_pairs(docs, threshold=thr).collect()
    }
    assert set(got) == set(want)
    for pair, c in want.items():
        assert abs(got[pair] - c) < 1e-6


def test_minhash_params_chooser_pins():
    """The corpus-statistics banding chooser (functions/dedup.
    minhash_params, r9): lab tier must resolve to the historical
    (32, 8) — every fixture SF keeps byte-identical candidate sets —
    and the scale tier must sharpen rows-per-band (the r8 stress
    response: collision density at J=0.5 must DROP, recall at the
    planted-dup similarity must hold the 1-1e-3 floor at BOTH tiers)."""
    from lab5_lakehouse_etl_spark.functions import dedup as D

    for n in (1, 500, 5_000, 20_000):
        assert D.minhash_params(n) == (32, 8)
    H, b = D.minhash_params(50_000)
    assert (H, b) == (128, 16)
    for n_docs in (500, 50_000):
        h, bb = D.minhash_params(n_docs)
        r = h // bb
        assert D.lsh_collision_prob(0.9, bb, r) >= 1 - 1e-3
    # the scale tier's S-curve is strictly sharper at moderate J
    assert D.lsh_collision_prob(0.5, 16, 8) < D.lsh_collision_prob(0.5, 8, 4) / 4


def test_minhash_recall_at_both_parameter_points(spark):
    """Planted near-dup recall holds at BOTH chooser tiers (r8 verdict
    #3 'recall pin holds at both lab and 10x parameters'): a corpus of
    unrelated docs plus planted single-word-edit near-dups (char-5-
    shingle J >= 0.9) must yield the identical verified pair set under
    (32, 8) and (128, 16) banding, equal to brute force."""
    import random

    from lab5_lakehouse_etl_spark.functions import dedup as D

    rng = random.Random(7)
    vocab = [f"word{i:03d}" for i in range(300)]
    rows = []
    for i in range(30):
        # sample WITHOUT replacement: repeated words would shrink the
        # distinct-gram sets and drag the planted similarity down
        rows.append((i, " ".join(rng.sample(vocab, 50))))
    # plant near-dups: one word substituted in a 50-word doc — both
    # char-5-shingle J and the signature basis (word-bigram) J land
    # >= 0.92, above the chooser's 0.9 design target, so the per-pair
    # miss probability is < 1e-4 at BOTH parameter points and the
    # fixed-seed corpus recalls deterministically with real margin
    planted = []
    for i in range(8):
        toks = rows[i][1].split()
        toks[7] = "edited"
        rows.append((100 + i, " ".join(toks)))
        planted.append((i, 100 + i))
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    sh = {
        r.doc_id: set(r.sh)
        for r in docs.select(
            "doc_id", D.char_shingles("text").alias("sh")
        ).collect()
    }
    truth = set()
    ids = sorted(sh)
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            a, b = ids[x], ids[y]
            if len(sh[a] & sh[b]) / len(sh[a] | sh[b]) >= 0.5:
                truth.add((a, b))
    assert set(planted) <= truth  # the plant took

    for H, bands in ((32, 8), (128, 16)):
        cands = D.minhash_candidate_pairs(docs, num_hashes=H, bands=bands)
        got = {
            (r.id_a, r.id_b)
            for r in D.verified_near_dups(docs, cands, threshold=0.5).collect()
        }
        assert got == truth, (H, bands)


def test_char_entropy_known_values_and_empty_null(spark):
    """char_entropy pins: empty text is NULL (not 0 — and the guard
    keeps Spark's DESCENDING sequence(1, 0) out of the plan), a
    single-symbol doc is exactly 0 bits, a balanced two-symbol doc is
    exactly 1 bit, and a uniform 4-symbol doc is exactly 2 bits."""
    from pyspark.sql import functions as F

    from lab5_lakehouse_etl_spark.functions import text as T

    df = spark.createDataFrame(
        [(1, ""), (2, "aaaa"), (3, "abab"), (4, "abcd")],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: r.e
        for r in df.select(
            "doc_id", F.round(T.char_entropy("text"), 6).alias("e")
        ).collect()
    }
    assert got == {1: None, 2: 0.0, 3: 1.0, 4: 2.0}
    # the Arrow UDF scale path the query actually uses: same values
    got_udf = {
        r.doc_id: r.e
        for r in df.select(
            "doc_id", F.round(T.char_entropy_udf(F.col("text")), 6).alias("e")
        ).collect()
    }
    assert got_udf == got


def test_char_entropy_udf_matches_sql_form_on_fixture(spark):
    """Engine-internal parity: the Arrow scale path and the all-JVM HOF
    formulation agree to round-6 on every fixture document (the oracle
    additionally checks the UDF against DuckDB's relational form)."""
    from pyspark.sql import functions as F

    from lab5_lakehouse_etl_spark.functions import text as T
    from lab5_lakehouse_etl_spark.session import load_table
    from tests.conftest import SF_DIR

    docs = load_table(spark, SF_DIR, "documents")
    diff = (
        docs.select(
            F.round(T.char_entropy("text"), 6).alias("a"),
            F.round(T.char_entropy_udf(F.col("text")), 6).alias("b"),
        )
        .filter("a IS DISTINCT FROM b")
        .count()
    )
    assert diff == 0


_vec = st.lists(
    st.floats(-1.0, 1.0, allow_nan=False, width=32), min_size=4, max_size=4
)
_emb_rows = st.lists(_vec, min_size=2, max_size=14)
_thresh = st.sampled_from([0.0, 0.3, 0.7, 0.95])


@given(vecs=_emb_rows, threshold=_thresh)
@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_cross_pairs_blocked_property_equals_bruteforce(spark, vecs, threshold):
    """cross_pairs_blocked on RANDOM low-dim vectors at random
    thresholds (including 0.0 — every pair — and 0.95 — near-boundary
    sparse): pair set and re-scored cosines equal the sequential-fold
    brute force; zero-norm vectors yield NULL cosine and are never
    emitted (the kernel's normalize divides by 0 → nan → filtered by
    the declared fold-cosine gate, which is NULL-safe)."""
    import math

    from lab5_lakehouse_etl_spark.functions import similarity as S

    rows = [(i, v) for i, v in enumerate(vecs)]
    df = spark.createDataFrame(rows, "vec_id BIGINT, embedding ARRAY<FLOAT>")
    a_df = df.filter(F.col("vec_id") % 2 == 0)
    b_df = df.filter(F.col("vec_id") % 2 == 1)
    got = {
        (r.id_a, r.id_b): r.cosine_sim
        for r in S.cross_pairs_blocked(
            a_df, b_df, threshold=threshold, n_blocks=3
        ).collect()
    }
    want = {}
    for ia, va in rows:
        if ia % 2 != 0:
            continue
        for ib, vb in rows:
            if ib % 2 != 1:
                continue
            # float32 storage first (ARRAY<FLOAT>), then double fold
            va32 = [float(__import__("numpy").float32(x)) for x in va]
            vb32 = [float(__import__("numpy").float32(x)) for x in vb]
            dot = sum(x * y for x, y in zip(va32, vb32))
            na = math.sqrt(sum(x * x for x in va32))
            nb = math.sqrt(sum(x * x for x in vb32))
            if na == 0.0 or nb == 0.0:
                continue  # NULL cosine never passes the gate
            c = dot / (na * nb)
            if c >= threshold:
                want[(ia, ib)] = round(c, 4)
    assert got == want


def test_word_ngrams_all_consistent_with_distinct_form(spark):
    """word_ngrams_all (positional, non-distinct) and word_ngrams
    (distinct) must stay the same tokenization: distinct(all) == set of
    word_ngrams, positions are 0-based contiguous, and count equals
    max(n_tokens - n + 1, 1) — the pin that keeps the two definitions
    from drifting apart the way the hand-inlined copies did."""
    from pyspark.sql import functions as F

    from lab5_lakehouse_etl_spark.functions import dedup as D

    df = spark.createDataFrame(
        [
            (1, "a b c d e"),
            (2, "x x x x"),          # repeated grams: all != distinct
            (3, "only two"),         # shorter than n: one short gram
            (4, "single"),
        ],
        "doc_id long, text string",
    )
    rows = df.select(
        "doc_id",
        D.word_ngrams("text", 3).alias("dst"),
        D.word_ngrams_all("text", 3).alias("all"),
        F.size(F.split(F.col("text"), "[ ]+")).alias("ntok"),
    ).collect()
    for r in rows:
        assert sorted(set(r.all)) == sorted(r.dst), r.doc_id
        assert len(r.all) == max(r.ntok - 2, 1), r.doc_id


def test_table_rows_matches_spark_count(spark):
    """session.table_rows (parquet-footer metadata, zero Spark jobs)
    equals a real distributed count on every fixture table, and on a
    multi-file directory written by Spark."""
    from lab5_lakehouse_etl_spark.session import load_table, table_rows
    from tests.conftest import SF_DIR

    for t in ("documents", "embeddings", "region"):
        assert table_rows(SF_DIR, t) == load_table(spark, SF_DIR, t).count()


def test_table_rows_multifile_dir(spark, tmp_path):
    df = spark.range(0, 1234).repartition(4)
    df.write.parquet(str(tmp_path / "t.parquet"))
    from lab5_lakehouse_etl_spark.session import table_rows

    assert table_rows(str(tmp_path), "t") == 1234


def test_table_rows_hive_partitioned_dir(spark, tmp_path):
    """r9 advice: a hive-partitioned directory nests files under
    key=value/ subdirs; the top-level listdir finds no *.parquet and the
    old sum() over an empty generator silently returned 0 — which would
    route minhash_params to the 32-hash lab tier at ANY corpus scale.
    The recursive walk must count every nested footer."""
    df = spark.range(0, 500).withColumn("p", F.col("id") % 5)
    df.write.partitionBy("p").parquet(str(tmp_path / "t.parquet"))
    from lab5_lakehouse_etl_spark.session import table_rows

    assert table_rows(str(tmp_path), "t") == 500


def test_table_rows_empty_dir_falls_back_not_zero(spark, tmp_path):
    """A directory with NO parquet files anywhere must not report 0 from
    the footer path; it routes to the Spark-count fallback (which then
    raises on an unreadable location rather than inventing a count)."""
    import pytest

    (tmp_path / "t.parquet").mkdir()
    from lab5_lakehouse_etl_spark.session import table_rows

    from pyspark.errors import AnalysisException

    with pytest.raises(AnalysisException):
        table_rows(str(tmp_path), "t")


def test_bpe_learn_matches_reference_implementation(spark):
    """q_bpe_merges' distributed trainer vs a pure-Python reference BPE
    (Sennrich et al. greedy left-to-right merge, occurrence-weighted
    pair counts, (count DESC, pair ASC) tie-break) on randomized small
    corpora — pins both the merge TABLE and the per-word merged piece
    counts (the q_bpe_encode contract) across seeds, including the
    adjacent-repeat words where the delimiter-wrapped replace has to
    reproduce greedy semantics exactly."""
    import random

    from lab5_lakehouse_etl_spark.queries.text_ops import _bpe_learn

    def ref_bpe(freqs, k):
        vocab = {w: tuple(w) for w in freqs}
        merges = []
        for rnd in range(1, k + 1):
            counts = {}
            for w, syms in vocab.items():
                for i in range(len(syms) - 1):
                    p = (syms[i], syms[i + 1])
                    counts[p] = counts.get(p, 0) + freqs[w]
            if not counts:
                break
            (l, r), c = min(
                counts.items(), key=lambda kv: (-kv[1], kv[0])
            )
            merges.append((rnd, l, r, c))
            for w, syms in vocab.items():
                out, i = [], 0
                while i < len(syms):
                    if (
                        i + 1 < len(syms)
                        and syms[i] == l
                        and syms[i + 1] == r
                    ):
                        out.append(l + r)
                        i += 2
                    else:
                        out.append(syms[i])
                        i += 1
                vocab[w] = tuple(out)
        return merges, {w: len(s) for w, s in vocab.items()}

    for seed in (0, 1, 2, 3):
        rng = random.Random(seed)
        words = {
            "".join(
                rng.choice("ab") for _ in range(rng.randint(1, 6))
            ): rng.randint(1, 4)
            for _ in range(rng.randint(4, 9))
        }
        text_parts = []
        for w, f in words.items():
            text_parts.extend([w] * f)
        rng.shuffle(text_parts)
        docs = spark.createDataFrame(
            [(1, " ".join(text_parts))], "doc_id long, text string"
        )
        exp_merges, exp_pieces = ref_bpe(words, 3)
        merges, merged, cached = _bpe_learn(docs, 3)
        got_pieces = {
            r["word"]: len(r["sym"].strip("|").split("||"))
            for r in merged.collect()
        }
        cached.unpersist()
        assert merges == exp_merges, f"seed {seed}"
        assert got_pieces == exp_pieces, f"seed {seed}"


def test_blocked_kernels_null_embedding_alignment(spark):
    """r10 review: collect_list skips NULL VALUES but keeps the ids'
    rows, so a NULL embedding used to misalign ids[] against vecs[]
    inside the blocked matmul kernels — every vector after the NULL in
    its block was scored under the WRONG id.  Pin: with a planted NULL
    row, exact_pairs_blocked equals the brute-force pair set of the
    non-null subset, and the NULL id never appears."""
    import itertools

    import numpy as np

    from lab5_lakehouse_etl_spark.functions import similarity as S

    rng = np.random.RandomState(3)
    vecs = {i: rng.randn(8).astype("float32") for i in range(7)}
    # make a couple of near-duplicate pairs so the threshold passes
    vecs[5] = vecs[0] + 1e-3
    vecs[6] = vecs[1] + 1e-3
    rows = [(i, [float(x) for x in v]) for i, v in vecs.items()]
    rows.insert(2, (99, None))  # the NULL row, mid-block
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>"
    )
    got = sorted(
        (r.id_a, r.id_b, round(r.cosine_sim, 4))
        for r in S.exact_pairs_blocked(df, threshold=0.9).collect()
    )
    def cos(a, b):
        a, b = np.asarray(a, "float64"), np.asarray(b, "float64")
        return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
    exp = sorted(
        (i, j, round(round(cos(vecs[i], vecs[j]), 6), 4))
        for i, j in itertools.combinations(sorted(vecs), 2)
        if round(cos(vecs[i], vecs[j]), 6) >= 0.9
    )
    assert got == exp
    assert all(99 not in (a, b) for a, b, _ in got)


def test_pq_and_topk_null_rows_do_not_hijack_ranking(spark):
    """r10 review: ascending orderBy is NULLS FIRST, so NULL distances
    (pq_encode propagates NULL embeddings as NULL codes) used to fill
    the PQ top-k ahead of every real candidate; topk_cosine's NULL
    cosines (zero-norm vectors) padded the tail when fewer than k rows
    qualified.  Pin both exclusions."""
    import numpy as np

    from lab5_lakehouse_etl_spark.functions import similarity as S

    rng = np.random.RandomState(5)
    rows = [
        (i, [float(x) for x in rng.randn(8)]) for i in range(20)
    ] + [(98, None), (99, [0.0] * 8)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = [float(x) for x in rng.randn(8)]
    top = S.topk_cosine(df, q, k=30).collect()
    ids = [r.vec_id for r in top]
    assert 98 not in ids and 99 not in ids  # no NULL-sim padding
    assert len(ids) == 20
    books = S.pq_train(df, m=2, k=4)
    codes = S.pq_encode(df, books)
    pq_ids = [r.vec_id for r in S.pq_topk(codes, books, q, k=30).collect()]
    assert 98 not in pq_ids
    assert len(pq_ids) == 21  # zero vector HAS codes; only NULL drops
    sr_ids = [
        r.vec_id for r in S.pq_search(codes, df, books, q, k=30).collect()
    ]
    assert 98 not in sr_ids


def test_assign_clusters_decimals_plumbed(spark):
    """r10 review: assign_clusters hardcoded round(dist, 6) while its
    oracle twin rounds to the caller's `decimals` before ranking — the
    documented both-engines parity silently broke for any non-default
    caller.  Pin: decimals=2 yields dists that are exact 2-decimal
    values."""
    import numpy as np

    from lab5_lakehouse_etl_spark.functions import clustering as C

    rng = np.random.RandomState(7)
    df = spark.createDataFrame(
        [(i, [float(x) for x in rng.randn(4)]) for i in range(30)],
        "vec_id long, embedding array<float>",
    )
    out = C.kmeans_fit_assign(
        df, k=3, iters=2, decimals=2, with_dist=True
    ).collect()
    assert out
    for r in out:
        assert abs(r.dist * 100 - round(r.dist * 100)) < 1e-9, r
