"""Pair-level golden checks for the near-dup family at sf0.01 (the
driver's correctness scale) — not just the sf0.001 default the rest of
the suite uses. The minhash/ngram pipelines are additionally
oracle-paired (brute-force exact-Jaccard in DuckDB); simhash has no
SQL twin, so its pair set is pinned structurally here: deterministic
count + containment of every true high-Jaccard duplicate."""

from __future__ import annotations

import duckdb
import pytest

from lab5_lakehouse_etl_spark import queries as Q
from tests.conftest import rows_key

Q.load_all()

SF_001 = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def ddb_01():
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF_001}/documents.parquet')"
    )
    yield con
    con.close()


def _truth_pairs(con, sql):
    return {(a, b): j for a, b, j in con.sql(sql).fetchall()}


def test_minhash_pairs_equal_truth_sf001(spark, ddb_01):
    got = Q.QUERIES["q_dedup_minhash"](spark, SF_001)
    truth = ddb_01.sql(Q.ORACLES["q_dedup_minhash"])
    assert rows_key(
        [tuple(r) for r in got.collect()], got.columns
    ) == rows_key(truth.fetchall(), truth.columns)


def test_ngram_pairs_equal_truth_sf001(spark, ddb_01):
    got = Q.QUERIES["q_dedup_ngram"](spark, SF_001)
    truth = ddb_01.sql(Q.ORACLES["q_dedup_ngram"])
    assert rows_key(
        [tuple(r) for r in got.collect()], got.columns
    ) == rows_key(truth.fetchall(), truth.columns)


def test_prefix_filter_collapse_path_parity(spark):
    """The adaptive identical-set pre-collapse (functions/dedup.py,
    prefix_filter_jaccard_pairs) engages when >2% of docs share an
    exact token set; its output must equal brute force — intra-class
    pairs at J=1 and cross-class pairs expanded from representatives.
    The parquet fixtures are below the dup threshold, so this corpus
    force-engages the path."""
    import itertools

    from lab5_lakehouse_etl_spark.functions import dedup as D

    texts = [
        "alpha beta gamma delta epsilon zeta eta theta",
        "alpha beta gamma delta epsilon zeta eta iota",
        "one two three four five six seven eight nine ten",
        "completely different words entirely here now today folks",
    ]
    rows = []
    did = 0
    for i, tx in enumerate(texts):
        for _ in range(3 if i < 2 else 1):  # two texts duplicated 3x
            rows.append((did, tx))
            did += 1
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = sorted(
        (r.id_a, r.id_b, round(r.jaccard, 6))
        for r in D.prefix_filter_jaccard_pairs(docs, threshold=0.5).collect()
    )
    sets = {i: set(t.split()) for i, t in rows}
    exp = sorted(
        (x, y, round(len(sets[x] & sets[y]) / len(sets[x] | sets[y]), 6))
        for x, y in itertools.combinations(sorted(sets), 2)
        if len(sets[x] & sets[y]) / len(sets[x] | sets[y]) >= 0.5
    )
    assert got == exp


def test_simhash_contains_all_true_dups_sf001(spark, ddb_01):
    # simhash (Hamming ≤ 6 over 64-bit fingerprints) measures a
    # different similarity than Jaccard, so no value oracle on the raw
    # pair set — but at sf0.01 every planted near-identical pair
    # (char-5-shingle J ≥ 0.5) happens to land within Hamming 6 and
    # must be recalled, and the pipeline is deterministic (fixed
    # xxhash64), so the pair set is stable run to run. (The DECLARED
    # query q_dedup_simhash emits the cross-SF-safe invariant — truth
    # count + recall-floor boolean — because other fixtures hold
    # J≥0.5 pairs out to Hamming 12; see _SIMHASH_RECALL_FLOOR.)
    from lab5_lakehouse_etl_spark.functions import dedup as D
    from lab5_lakehouse_etl_spark.session import load_table

    docs = load_table(spark, SF_001, "documents")
    got = D.simhash_near_dups(docs, max_hamming=6)
    pairs = {(r.id_a, r.id_b) for r in got.collect()}
    truth = set(
        _truth_pairs(ddb_01, Q.ORACLES["q_dedup_minhash"])
    )  # J >= 0.5 pairs
    missing = truth - pairs
    assert not missing, f"simhash missed true near-dups: {sorted(missing)}"
    rerun = {
        (r.id_a, r.id_b)
        for r in D.simhash_near_dups(docs, max_hamming=6).collect()
    }
    assert rerun == pairs  # deterministic
    # and the declared invariant query agrees with the brute-force
    # truth count + states its recall floor
    row = Q.QUERIES["q_dedup_simhash"](spark, SF_001).collect()[0]
    assert row.n_true_pairs == len(truth)
    assert row.recall_ok is True


def test_variable_length_spans_planted_fixture(spark):
    """q_dup_spans_var's primitives on a hand-built corpus with known
    repeats — pins exact (span_start, span_len) boundaries for every
    structural case of the variable-length ExactSubstr report:

    - a 10-token passage P and a 9-token passage Q planted across docs
      at different offsets (variable length, variable position);
    - two repeats separated by ONE uncovered token stay two spans;
    - two repeats whose coverages abut (P directly followed by Q, with
      the boundary grams unique) merge into one span, like the Lee et
      al. remove phase's merged ranges;
    - a document with no cross-doc repeat reports nothing.
    """
    from lab5_lakehouse_etl_spark.functions import dedup as D
    from lab5_lakehouse_etl_spark.functions import text as T
    from pyspark.sql import functions as F

    P = " ".join(f"p{i}" for i in range(10))   # 10 tokens
    Qp = " ".join(f"q{i}" for i in range(9))   # 9 tokens
    corpus = [
        (1, f"w1 w2 {P} g1 {Qp} w3"),   # P at 2 len 10; gap; Q at 13 len 9
        (2, f"{P} a1 a2"),              # P at 0
        (3, f"b1 {Qp}"),                # Q at 1
        (4, "c1 c2 c3 c4 c5 c6 c7 c8"),  # unique - no spans
        (5, f"{P} {Qp}"),               # abutting coverages -> one span
    ]
    docs = spark.createDataFrame(corpus, "doc_id long, text string")
    t = docs.select("doc_id", T.tokens(F.col("text")).alias("toks"))
    spans = D.merge_covered_spans(D.shared_gram_occurrences(t, n=8), n=8)
    got = sorted(
        (r.doc_id, r.span_start, r.span_len) for r in spans.collect()
    )
    assert got == [
        (1, 2, 10), (1, 13, 9),
        (2, 0, 10),
        (3, 1, 9),
        (5, 0, 19),
    ]


def test_decontaminate_spans_planted_pair_grain(spark, tmp_path):
    """q_decontaminate_spans on a hand-built corpus with known leaks —
    pins the PAIR grain and span boundaries the sf fixtures can't
    distinguish from a doc-grain report:

    - one train passage shared with TWO different held-out docs
      reports TWICE (once per test_doc_id), same boundaries;
    - two leaks from the SAME pair separated by an uncovered token
      stay two spans; abutting coverages merge into one;
    - a train doc sharing grams only with ANOTHER TRAIN doc reports
      nothing (train-train repeats are dedup's business, not
      decontamination's);
    - val-split docs participate on neither side.

    doc_ids are chosen so the query's own hash split routes them to
    the intended splits ((id * 2654435761) % 100: <80 train,
    80-89 val, else test).
    """
    import pyarrow as pa
    import pyarrow.parquet as pq

    # split probe: 1,2,4 -> train; 13,18 -> test; 3 -> val
    def split_of(i):
        return (
            "train" if (i * 2654435761) % 100 < 80
            else "val" if (i * 2654435761) % 100 < 90
            else "test"
        )

    assert [split_of(i) for i in (1, 2, 4, 13, 18, 3)] == [
        "train", "train", "train", "test", "test", "val"
    ]

    P = " ".join(f"p{i}" for i in range(7))   # 7 tokens -> 3 shared 5-grams
    Qp = " ".join(f"q{i}" for i in range(5))  # 5 tokens -> 1 shared 5-gram
    corpus = [
        (1, f"w1 w2 {P} g1 {Qp}"),   # train: P at 2 (len 7), Q at 10 (len 5)
        (2, f"{P} {Qp}"),            # train: abutting -> ONE span (0, 12) per pair
        (4, f"{P} x1 x2 x3"),        # train: P only
        (13, f"{P} t1 {Qp}"),        # test: holds P and Q
        (18, f"z1 {P}"),             # test: holds P only
        (3, f"{Qp} v1 v2 v3 v4"),    # val: holds Q — must NOT create pairs
    ]
    table = pa.table({
        "doc_id": pa.array([r[0] for r in corpus], pa.int64()),
        "text": pa.array([r[1] for r in corpus], pa.string()),
        "source": pa.array(["t"] * len(corpus), pa.string()),
        "lang": pa.array(["en"] * len(corpus), pa.string()),
    })
    pq.write_table(table, str(tmp_path / "documents.parquet"))

    df = Q.QUERIES["q_decontaminate_spans"](spark, str(tmp_path))
    got = sorted(
        (r.train_doc_id, r.test_doc_id, r.span_start, r.span_len)
        for r in df.collect()
    )
    assert got == [
        (1, 13, 2, 7), (1, 13, 10, 5),  # P and Q vs test 13, gap keeps 2 spans
        (1, 18, 2, 7),                  # P only vs test 18
        (2, 13, 0, 12),                 # abutting P+Q merge into one span
        (2, 18, 0, 7),
        (4, 13, 0, 7),
        (4, 18, 0, 7),
    ]


def test_containment_pairs_equal_truth_sf001(spark, ddb_01):
    got = Q.QUERIES["q_dedup_containment"](spark, SF_001)
    truth = ddb_01.sql(Q.ORACLES["q_dedup_containment"])
    assert rows_key(
        [tuple(r) for r in got.collect()], got.columns
    ) == rows_key(truth.fetchall(), truth.columns)


def test_containment_catches_subset_jaccard_misses(spark):
    """The operator's reason to exist: a short doc quoted inside a much
    longer one has overlap 1.0 but Jaccard |A|/|B| << 0.5 — the
    containment join must emit the pair; the exact-Jaccard join at 0.5
    must not.  Also exercises the asymmetric prefix math at an extreme
    size ratio (prefix of the small side = 1 token at t=1.0 bound)."""
    from lab5_lakehouse_etl_spark.functions import dedup as D

    quote = "alpha beta gamma delta epsilon"
    filler = " ".join(f"w{i} x{i} y{i}" for i in range(40))
    docs = spark.createDataFrame(
        [
            (1, quote),
            (2, filler + " " + quote + " " + filler.upper()),
            (3, "entirely unrelated content nothing shared here at all"),
        ],
        "doc_id long, text string",
    )
    cont = {
        (r.id_small, r.id_large): r.containment
        for r in D.containment_pairs(
            docs, threshold=0.8, elements=D.word_ngrams("text", 3)
        ).collect()
    }
    assert (1, 2) in cont and cont[(1, 2)] == 1.0
    assert (1, 3) not in cont and (3, 1) not in cont
    jac = {
        (r.id_a, r.id_b)
        for r in D.prefix_filter_jaccard_pairs(
            docs, threshold=0.5, elements=D.word_ngrams("text", 3)
        ).collect()
    }
    assert (1, 2) not in jac  # Jaccard structurally blind to the quote


def test_containment_collapse_path_parity(spark):
    """The r9 identical-set pre-collapse in containment_pairs: on a
    dup-heavy corpus (>2% identical token sets) the kernel runs one
    representative per distinct set, emits intra-class pairs at
    containment 1.0 directly, and expands cross-class pairs from the
    representatives — output must equal brute force, including the
    orientation contract (smaller side first; lower id on size ties).
    The planted corpus engages the collapse (8/12 docs are dups) and
    covers every expand branch: intra-class, cross-class with unequal
    sizes (quote-inside-long — the member of the SMALL class must stay
    id_small even when its id is larger), and an equal-size tie."""
    import itertools

    from lab5_lakehouse_etl_spark.functions import dedup as D

    quote = "alpha beta gamma delta epsilon"
    long_a = quote + " " + " ".join(f"w{i}" for i in range(20))
    tie_a = "one two three four five six seven eight nine ten"
    tie_b = "one two three four five six seven eight nine zzz"
    texts = [quote, long_a, tie_a, tie_b]
    rows, did = [], 0
    for i, tx in enumerate(texts):
        for _ in range(3 if i < 2 else 3):  # every class has 3 members
            rows.append((did, tx))
            did += 1
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = sorted(
        (r.id_small, r.id_large, round(r.containment, 6))
        for r in D.containment_pairs(docs, threshold=0.8).collect()
    )
    sets = {i: set(t.split()) for i, t in rows}
    exp = []
    for x, y in itertools.combinations(sorted(sets), 2):
        i = len(sets[x] & sets[y])
        c = i / min(len(sets[x]), len(sets[y]))
        if c >= 0.8:
            if len(sets[x]) <= len(sets[y]):
                exp.append((x, y, round(c, 6)))
            else:
                exp.append((y, x, round(c, 6)))
    assert got == sorted(exp)
    # and the collapse genuinely engaged on this corpus (guards the
    # test against silently exercising only the straight path)
    import pyspark.sql.functions as F

    n = len(rows)
    n_sig = (
        docs.select(
            F.xxhash64(
                F.array_distinct(
                    F.expr("split(lower(text), '[ \\\\t\\\\n\\\\r\\\\f]+')")
                )
            ).alias("h")
        )
        .distinct()
        .count()
    )
    assert n_sig <= n * D.COLLAPSE_DUP_FRACTION


def test_diagnose_missing_pair_markers(spark):
    """The truth-source marker for the index-store/epoch family
    (functions/dedup.diagnose_missing_pair): a forced banding miss must
    be classified as banding recall, NOT epoch logic — and each other
    branch must be reachable — so a future oracle diff on
    q_dedup_index_store / q_dedup_epoch names the broken contract
    instead of implicating the epoch machinery wholesale."""
    from lab5_lakehouse_etl_spark.functions import dedup as D

    base = (
        "the quick brown fox jumps over the lazy dog while seven "
        "wizards pack my box with five dozen liquor jugs tonight"
    )
    near = base.replace("tonight", "today").replace("seven", "nine")
    docs = spark.createDataFrame(
        [(1, base), (2, near), (3, "entirely unrelated words here")],
        "doc_id long, text string",
    )
    # sanity: the pair is a TRUE pair at char-5-shingle J >= 0.5
    js = {
        r.doc_id: set(r.sh)
        for r in docs.select(
            "doc_id", D.char_shingles("text").alias("sh")
        ).collect()
    }
    j12 = len(js[1] & js[2]) / len(js[1] | js[2])
    assert j12 >= 0.5
    # bands=1 (one 32-row band): collision requires the FULL signatures
    # equal, which a genuinely-different pair never achieves — the
    # deterministic forced banding miss
    assert (
        D.diagnose_missing_pair(docs, 1, 2, bands=1)
        == "banding_recall_miss"
    )
    # default banding recalls the pair -> only epoch logic could lose it
    assert D.diagnose_missing_pair(docs, 1, 2) == "epoch_logic"
    # unimplicated diff: not a true pair at the threshold
    assert D.diagnose_missing_pair(docs, 1, 3) == "not_a_true_pair"
    # estimate-gate branch: collided in a band but gated by the
    # signature estimate (est <= 1 < 1.01 forces the branch)
    assert (
        D.diagnose_missing_pair(docs, 1, 2, est_threshold=1.01)
        == "estimate_gate_miss"
    )
    # missing-id / null-text branch (r9 advice): a fixture-side absence
    # is its own marker, NOT a below-threshold verdict — conflating the
    # two misdirected triage toward the Jaccard gate
    assert D.diagnose_missing_pair(docs, 1, 99) == "doc_not_found"
    with_null = docs.union(
        spark.createDataFrame([(4, None)], "doc_id long, text string")
    )
    assert D.diagnose_missing_pair(with_null, 1, 4) == "doc_not_found"


def test_banding_recall_boundary_at_moderate_jaccard(spark):
    """ADVERSARIAL banding fixture (r8 advice #1): pins what the
    banding guarantee actually is at Jaccard just above the 0.5 verify
    threshold — NOT recall 1.0.  A pair at char-5-shingle J=0.53
    (12 of 40 words substituted) sits far below the S-curve knee at
    both chooser tiers, IS missed by the candidate generator, is
    correctly classified by the truth-source marker as a banding
    recall miss (never epoch logic), and IS caught by the exact
    kernel — the documented contractual-exactness path.  If a future
    banding change claims recall at this regime, this test is where
    the claim gets measured."""
    from lab5_lakehouse_etl_spark.functions import dedup as D

    base_words = [f"tok{i}" for i in range(40)]
    a = " ".join(base_words)
    b = " ".join(base_words[:28] + [f"alt{i}" for i in range(12)])
    docs = spark.createDataFrame(
        [(1, a), (2, b)], "doc_id long, text string"
    )
    sh = {
        r.doc_id: set(r.sh)
        for r in docs.select(
            "doc_id", D.char_shingles("text").alias("sh")
        ).collect()
    }
    j = len(sh[1] & sh[2]) / len(sh[1] | sh[2])
    assert 0.5 <= j < 0.56  # the boundary regime, just above threshold
    for H, bands in ((32, 8), (128, 16)):
        cands = D.minhash_candidate_pairs(
            docs, num_hashes=H, bands=bands
        ).collect()
        assert cands == [], (H, bands)  # the honest boundary: missed
    assert D.diagnose_missing_pair(docs, 1, 2) in (
        "banding_recall_miss",
        "estimate_gate_miss",
    )
    exact = {
        (r.id_a, r.id_b)
        for r in D.exact_jaccard_pairs(
            docs, threshold=0.5, elements=D.char_shingles("text", 5)
        ).collect()
    }
    assert (1, 2) in exact  # exactness is the contractual path here


def test_dedup_epoch_advance_planted(spark, tmp_path):
    """Pins the two epoch-advance contracts on a planted corpus:
    a batch-2 doc duplicating an ACCEPTED batch-1 doc is rejected
    (the append worked), and a batch-2 doc duplicating a REJECTED
    batch-1 doc is reported only against the doc's own stored
    partners (rejected docs never enter the index)."""
    X = "the quick brown fox jumps over the lazy dog tonight"
    Y = "pack my box with five dozen liquor jugs right now ok"
    Z = "sphinx of black quartz judge my vow immediately today"
    rows = [
        (1, X),   # base (1 % 4 != 0)
        (8, X),   # batch 1: dup of base -> rejected epoch 1
        (16, Y),  # batch 1: unique -> ACCEPTED, appended to index
        (4, Y),   # batch 2: dup of accepted 16 -> rejected epoch 2
        (12, X),  # batch 2: dup of base 1 AND of REJECTED 8
        (20, Z),  # batch 2: unique -> no rows
    ]
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows]),
                "lang": pa.array(["en"] * len(rows)),
                "source": pa.array(["web"] * len(rows)),
                "n_chars": pa.array(
                    [len(r[1]) for r in rows], pa.int64()
                ),
            }
        ),
        str(tmp_path / "documents.parquet"),
    )
    got = {
        (r.epoch, r.doc_id, r.dup_of)
        for r in Q.QUERIES["q_dedup_epoch"](spark, str(tmp_path)).collect()
    }
    assert got == {
        (1, 8, 1),    # epoch 1: dup of base
        (2, 4, 16),   # epoch 2: caught ONLY because 16 was appended
        (2, 12, 1),   # epoch 2: dup of base; (2, 12, 8) must be absent
    }


def test_ingest_epoch_advance_planted(spark, tmp_path):
    """The parquet fixtures carry no batch-2 doc equal to a batch-1-only
    doc, so the differential oracle cannot distinguish a broken append
    for q_ingest_epoch — this planted corpus can: a batch-2 doc equal
    to an ACCEPTED batch-1 doc must be dropped (the store append
    worked), within-batch-1 duplicates accept only the first, and a
    batch-2-only text is accepted."""
    X = "base text one"
    Y = "batch one unique text"
    Z = "batch two only text"
    rows = [
        (1, X),   # base
        (8, Y),   # batch 1: unique -> accepted, fp appended
        (24, Y),  # batch 1: within-batch dup of 8 -> rejected
        (16, X),  # batch 1: dup of base -> rejected
        (4, Y),   # batch 2: equals ACCEPTED 8 -> dropped iff append landed
        (12, Z),  # batch 2: unique -> accepted
    ]
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows]),
                "lang": pa.array(["en"] * len(rows)),
                "source": pa.array(["web"] * len(rows)),
                "n_chars": pa.array([len(r[1]) for r in rows], pa.int64()),
            }
        ),
        str(tmp_path / "documents.parquet"),
    )
    got = {
        (r.epoch, r.doc_id)
        for r in Q.QUERIES["q_ingest_epoch"](spark, str(tmp_path)).collect()
    }
    assert got == {(1, 8), (2, 12)}


def test_text_normalize_planted_punctuation(spark, tmp_path):
    """The parquet fixtures are pure [a-z0-9 ] text, so the hash gate
    never exercises q_text_normalize's distinctive semantics — this
    planted corpus does: casing, punctuation, tabs/newlines and
    multi-space variants of one sentence must all collapse to a single
    fingerprint group (lowest id keeps), verified against BOTH the
    hand-computed expectation and the DuckDB oracle on the same file."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    rows = [
        (1, "Hello, World!"),
        (2, "hello world"),
        (3, "HELLO...   world?!"),
        (4, "hello\tworld"),
        (5, "hello\nworld "),
        (6, "entirely different"),
    ]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows]),
                "lang": pa.array(["en"] * len(rows)),
                "source": pa.array(["web"] * len(rows)),
                "n_chars": pa.array([len(r[1]) for r in rows], pa.int64()),
            }
        ),
        str(tmp_path / "documents.parquet"),
    )
    out = Q.QUERIES["q_text_normalize"](spark, str(tmp_path)).collect()
    by_id = {r.doc_id: r for r in out}
    fps = {r.doc_id: r.norm_fp for r in out}
    assert len({fps[i] for i in (1, 2, 3, 4, 5)}) == 1  # one group
    assert fps[6] != fps[1]
    assert by_id[1].keep and by_id[1].n_norm_copies == 5
    assert not any(by_id[i].keep for i in (2, 3, 4, 5))
    assert by_id[6].keep and by_id[6].n_norm_copies == 1
    # cross-engine: DuckDB oracle over the same planted file
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{tmp_path}/documents.parquet')"
    )
    truth = con.sql(Q.ORACLES["q_text_normalize"])
    assert rows_key(
        [tuple(r) for r in out],
        Q.QUERIES["q_text_normalize"](spark, str(tmp_path)).columns,
    ) == rows_key(truth.fetchall(), truth.columns)


def test_bpe_merges_planted_corpus_greedy_semantics(spark, tmp_path):
    """q_bpe_merges on a hand-built corpus with hand-computed merges —
    pins the BPE contracts the sf fixtures can't isolate:

    - pair counts are occurrence counts weighted by word frequency
      ("abab" contributes (a,b) TWICE per occurrence);
    - applying a merge is greedy LEFT-TO-RIGHT, non-overlapping:
      "aaa" under merge (a,a) becomes [aa, a], never [a, aa], and
      "aaaa"-style adjacent repeats merge pairwise (the
      delimiter-wrapped replace's whole reason to exist);
    - the tie-break is (count DESC, left ASC, right ASC);
    - training STOPS early when no pair remains (fewer than
      _BPE_ROUNDS rows is a legal, meaningful output).
    """
    import pyarrow as pa
    import pyarrow.parquet as pq

    # vocab: abab x3, ab x2, aaa x1
    corpus = [
        (1, "abab abab ab"),
        (2, "abab ab aaa"),
    ]
    table = pa.table({
        "doc_id": pa.array([r[0] for r in corpus], pa.int64()),
        "text": pa.array([r[1] for r in corpus], pa.string()),
        "source": pa.array(["t"] * len(corpus), pa.string()),
        "lang": pa.array(["en"] * len(corpus), pa.string()),
    })
    pq.write_table(table, str(tmp_path / "documents.parquet"))

    df = Q.QUERIES["q_bpe_merges"](spark, str(tmp_path))
    got = [
        (r.merge_round, r.left_sym, r.right_sym, r.pair_count)
        for r in df.collect()
    ]
    # r1: (a,b) 2x3 + 1x2 = 8 beats (b,a) 3 and (a,a) 2
    # r2: abab -> |ab||ab| so (ab,ab) 3 beats (a,a) 2
    # r3: only aaa remains unmerged: (a,a) 2 -> greedy LTR [aa, a]
    # r4: (aa,a) 1 -- the greedy direction pin: (a,aa) would mean RTL
    # r5+: vocabulary fully merged -> early stop at 4 rows
    assert got == [
        (1, "a", "b", 8),
        (2, "ab", "ab", 3),
        (3, "a", "a", 2),
        (4, "aa", "a", 1),
    ]
    # encode side (q_bpe_encode): after the four merges every vocab
    # word is a single symbol (abab -> |abab|, ab -> |ab|,
    # aaa -> |aa||a| -> |aaa|), so each document encodes to one BPE
    # token per word
    enc = {
        r.doc_id: (r.n_words, r.n_bpe_tokens)
        for r in Q.QUERIES["q_bpe_encode"](spark, str(tmp_path)).collect()
    }
    assert enc == {1: (3, 3), 2: (3, 3)}
    # and the ORACLE agrees on this early-exhausted corpus (r10 review
    # finding: an empty merge stage used to NULL-propagate through the
    # remaining unrolled CTE stages and emit NULL n_bpe_tokens)
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{tmp_path}/documents.parquet')"
    )
    oracle = {
        doc_id: (n_words, n_tokens)
        for doc_id, n_words, n_tokens in con.sql(
            Q.ORACLES["q_bpe_encode"]
        ).fetchall()
    }
    assert oracle == enc
    o_merges = con.sql(Q.ORACLES["q_bpe_merges"]).fetchall()
    assert [tuple(r) for r in o_merges] == got


def test_null_text_never_a_dup_verdict(spark):
    """r10 deep review: NULL text is "no content", never a similarity
    verdict.  Previously every NULL-text doc (a) shared the [NULL]
    shingle signature and verified at jaccard 1.0 through the MinHash
    pipeline, (b) folded to SimHash fingerprint 0 and paired at
    hamming 0, (c) crashed the dense exact-Jaccard route while the
    prefix route silently dropped it, and (d) shared the [NULL] span
    through the chargram report.  Pin: with planted NULL docs, every
    kernel returns exactly the NULL-free corpus's answer."""
    from lab5_lakehouse_etl_spark.functions import dedup as D
    from lab5_lakehouse_etl_spark.functions import text as T
    from pyspark.sql import functions as SF

    base = "the quick brown fox jumps over the lazy dog tonight"
    near = base.replace("tonight", "today")
    docs = spark.createDataFrame(
        [(1, base), (2, near), (3, None), (4, None),
         (5, "entirely unrelated words appear here now")],
        "doc_id long, text string",
    )
    # (a) minhash: only the true (1,2) pair; never (3,4)
    cands = D.minhash_candidate_pairs(docs)
    pairs = {
        (r.id_a, r.id_b)
        for r in D.verified_near_dups(docs, cands, threshold=0.5).collect()
    }
    assert pairs == {(1, 2)}
    # (b) simhash: no NULL pair
    sh = {(r.id_a, r.id_b) for r in D.simhash_near_dups(docs).collect()}
    assert (3, 4) not in sh
    # (c) exact-jaccard router: dense route must not crash, and no
    # NULL doc appears (force dense with a huge vocab cap)
    dense = {
        (r.id_a, r.id_b)
        for r in D.exact_jaccard_pairs(
            docs, threshold=0.5, dense_vocab_max=10**6
        ).collect()
    }
    prefix = {
        (r.id_a, r.id_b)
        for r in D.exact_jaccard_pairs(
            docs, threshold=0.5, dense_vocab_max=0
        ).collect()
    }
    assert dense == prefix == {(1, 2)}
    # (d) span reports: no occurrence rows from NULL docs
    toks = docs.select("doc_id", T.tokens(SF.col("text")).alias("toks"))
    g = D.shared_gram_occurrences(toks, n=8)
    assert not {r.doc_id for r in g.collect()} & {3, 4}
    cg = D.shared_chargram_occurrences(docs, n=20)
    assert not {r.doc_id for r in cg.collect()} & {3, 4}
    # (e) the band index never stores a NULL doc
    idx_ids = {r.id for r in D.minhash_band_index(docs).collect()}
    assert not idx_ids & {3, 4}


def test_drop_boilerplate_lines_semantics(spark):
    """Ground-truth pins for the line-level boilerplate operator:
    (a) threshold counts DISTINCT docs — a line repeated 5x inside
    ONE doc is not boilerplate; (b) no-owner semantics — a
    boilerplate line vanishes from EVERY doc including the first;
    (c) exactly-at-threshold lines drop, threshold-minus-one lines
    survive; (d) the line text never enters an exchange (only the
    8-byte fingerprint does)."""
    from pyspark.sql import functions as F

    from lab5_lakehouse_etl_spark.functions import dedup as D

    rows = [
        (0, ["nav", "alpha", "rep", "rep", "rep", "rep", "rep"]),
        (1, ["nav", "beta", "pair"]),
        (2, ["nav", "gamma", "pair"]),
        (3, ["delta"]),
    ]
    df = spark.createDataFrame(rows, "doc_id long, lines array<string>")
    out = {
        r.doc_id: list(r.kept)
        for r in D.drop_boilerplate_lines(df, min_docs=3).collect()
    }
    # 'nav' in 3 distinct docs -> dropped everywhere (no owner)
    assert out[0] == ["alpha", "rep", "rep", "rep", "rep", "rep"]
    # 'rep' x5 in one doc: one distinct doc, NOT boilerplate
    # 'pair' in 2 docs < 3: kept
    assert out[1] == ["beta", "pair"]
    assert out[2] == ["gamma", "pair"]
    assert out[3] == ["delta"]
    # plan: no exchange carries the line text
    import re

    plan = (
        D.drop_boilerplate_lines(df, min_docs=3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    for m in re.finditer(r"Exchange hashpartitioning\(([^)]*)\)", plan):
        assert "line#" not in m.group(1) and "lines#" not in m.group(1)
