"""Plan-hygiene tests: pin the physical-plan properties that matter at
scale for the flagship queries — pushdown, pruning, broadcast, shuffle
budget. A regression here is a performance bug even when results stay
correct."""

from __future__ import annotations

from lab5_lakehouse_etl_spark import queries as Q
from lab5_lakehouse_etl_spark.plans import (
    has_broadcast_join,
    has_pushed_filters,
    scan_read_schema,
    shuffle_count,
)
from tests.conftest import SF_DIR

Q.load_all()


def test_q1_filter_pushed_and_pruned(spark):
    df = Q.QUERIES["q_agg_groupby"](spark, SF_DIR)
    assert has_pushed_filters(df)  # shipdate predicate reaches the scan
    schemas = scan_read_schema(df)
    # scan must read only the 7 referenced columns, not all 11
    assert schemas and all(len(s) <= 7 for s in schemas)


def test_star_join_broadcasts_all_dims(spark):
    df = Q.QUERIES["q_join_star"](spark, SF_DIR)
    assert has_broadcast_join(df)
    # fact side never shuffles pre-aggregation: the only exchange is the
    # final groupBy on r_name
    assert shuffle_count(df) <= 1


def test_semi_join_prunes_probe_columns(spark):
    df = Q.QUERIES["q_join_semi"](spark, SF_DIR)
    schemas = scan_read_schema(df)
    # the lineitem side of the semi-join must read ONLY l_orderkey
    assert any(s == ["l_orderkey"] for s in schemas)


def test_window_dedup_single_shuffle(spark):
    df = Q.QUERIES["q_window_dedup"](spark, SF_DIR)
    assert shuffle_count(df) == 1  # one hash partition on the dedup key


def test_topk_is_take_ordered(spark):
    from lab5_lakehouse_etl_spark.plans import explain_str

    df = Q.QUERIES["q_sort_limit"](spark, SF_DIR)
    assert "TakeOrderedAndProject" in explain_str(df)  # no global sort


def test_tpch_q5_broadcasts_dims_single_fact_shuffle(spark):
    df = Q.QUERIES["q_tpch_q5"](spark, SF_DIR)
    assert has_broadcast_join(df)
    assert has_pushed_filters(df)  # date range reaches the orders scan
    # only the lineitem↔orders sort-merge join and the final groupBy
    # shuffle; every dimension side is broadcast
    assert shuffle_count(df) <= 3


def test_tpch_q3_topk_no_global_sort(spark):
    from lab5_lakehouse_etl_spark.plans import explain_str

    df = Q.QUERIES["q_tpch_q3"](spark, SF_DIR)
    assert "TakeOrderedAndProject" in explain_str(df)


def test_tpch_q6_single_scan_fully_pushed(spark):
    df = Q.QUERIES["q_tpch_q6"](spark, SF_DIR)
    assert has_pushed_filters(df)  # shipdate/discount/quantity reach the scan
    schemas = scan_read_schema(df)
    # only the four referenced lineitem columns are read
    assert schemas and all(len(s) <= 4 for s in schemas)
    # partial → final agg: the lone exchange moves 1-row partials
    assert shuffle_count(df) <= 1


def test_tpch_q12_prunes_fact_scan(spark):
    df = Q.QUERIES["q_tpch_q12"](spark, SF_DIR)
    assert has_pushed_filters(df)
    schemas = scan_read_schema(df)
    # lineitem side reads only join key + group key + filter column
    assert any(sorted(s) == ["l_linestatus", "l_orderkey", "l_shipdate"] for s in schemas)


def test_tpch_q14_broadcasts_part_dim(spark):
    df = Q.QUERIES["q_tpch_q14"](spark, SF_DIR)
    assert has_broadcast_join(df)
    # broadcast join leaves only the scalar-agg exchange
    assert shuffle_count(df) <= 1


def test_tpch_q18_single_fact_shuffle_topk(spark):
    from lab5_lakehouse_etl_spark.plans import explain_str

    df = Q.QUERIES["q_tpch_q18"](spark, SF_DIR)
    # top-k must not globally sort
    assert "TakeOrderedAndProject" in explain_str(df)
    plan = explain_str(df)
    # lineitem is aggregated once, never re-joined against itself
    assert plan.count("lineitem.parquet") == 1


def test_project_reads_only_projected_columns(spark):
    df = Q.QUERIES["q_project"](spark, SF_DIR)
    schemas = scan_read_schema(df)
    assert schemas == [["c_custkey", "c_name", "c_mktsegment"]]


def test_tpch_q7_broadcasts_all_dims(spark):
    df = Q.QUERIES["q_tpch_q7"](spark, SF_DIR)
    assert has_broadcast_join(df)
    assert has_pushed_filters(df)  # shipdate range reaches the fact scan
    # lineitem↔orders join + final groupBy are the only shuffles; the
    # four dimension sides (customer, supplier, nation×2) broadcast
    assert shuffle_count(df) <= 3


def test_tpch_q15_single_fact_scan(spark):
    df = Q.QUERIES["q_tpch_q15"](spark, SF_DIR)
    # the revenue aggregate is cached and reused — the max side and the
    # join side must not each rebuild the lineitem scan
    assert has_broadcast_join(df)
    assert has_pushed_filters(df)


def test_tpch_q17_one_fact_shuffle(spark):
    from lab5_lakehouse_etl_spark.plans import explain_str

    df = Q.QUERIES["q_tpch_q17"](spark, SF_DIR)
    assert has_broadcast_join(df)  # brand-filtered part dim broadcasts
    # the per-part avg shuffles only map-side partials; the limits table
    # broadcasts back; the final 1-row agg moves partials only
    assert shuffle_count(df) <= 2
    # the agg-join decorrelation must never introduce a per-partition
    # sort (the window formulation would)
    assert "Sort" not in explain_str(df)


def test_tpch_q19_pushes_common_predicates(spark):
    df = Q.QUERIES["q_tpch_q19"](spark, SF_DIR)
    assert has_broadcast_join(df)
    # quantity bounds (the OR-common range) reach the lineitem scan
    assert has_pushed_filters(df)
    schemas = scan_read_schema(df)
    assert schemas and all(len(s) <= 4 for s in schemas)


def test_sessionize_single_fact_shuffle(spark):
    df = Q.QUERIES["q_sessionize_batch"](spark, SF_DIR)
    # lag-window, running-sum window, and session rollup all share the
    # user_id hash partitioning: one exchange total
    assert shuffle_count(df) <= 1


def test_funnel_partial_aggregates(spark):
    df = Q.QUERIES["q_funnel"](spark, SF_DIR)
    # per-user conditional-min combines map-side; stage rollup is tiny
    assert shuffle_count(df) <= 2


def test_tpch_q8_single_fact_shuffle(spark):
    df = Q.QUERIES["q_tpch_q8"](spark, SF_DIR)
    assert has_broadcast_join(df)  # part/cust/sup/nation all broadcast
    # lineitem↔orders join + final year rollup are the only exchanges
    assert shuffle_count(df) <= 2


def test_tpch_q9_broadcast_chain(spark):
    df = Q.QUERIES["q_tpch_q9"](spark, SF_DIR)
    assert has_broadcast_join(df)
    assert shuffle_count(df) <= 2


def test_tpch_q21_two_keyed_aggs_no_self_join_blowup(spark):
    from lab5_lakehouse_etl_spark.plans import explain_str

    df = Q.QUERIES["q_tpch_q21"](spark, SF_DIR)
    plan = explain_str(df)
    # the EXISTS/NOT-EXISTS pair is aggregates, not correlated joins:
    # lineitem appears exactly once in the scan list
    assert plan.count("lineitem.parquet") == 1
    assert has_broadcast_join(df)  # supplier dim broadcasts


def test_vocab_topk_partial_agg_no_global_sort(spark):
    from lab5_lakehouse_etl_spark.plans import explain_str

    df = Q.QUERIES["q_vocab_topk"](spark, SF_DIR)
    plan = explain_str(df)
    # top-k never globally sorts the vocabulary
    assert "TakeOrderedAndProject" in plan
    # the shuffle carries (token, partial count): partial_count before
    # the exchange
    assert "partial_count" in plan or "partial" in plan.lower()


def test_text_chunk_is_pure_narrow_map(spark):
    df = Q.QUERIES["q_text_chunk"](spark, SF_DIR)
    assert shuffle_count(df) == 0  # explode-based chunking never shuffles
    schemas = scan_read_schema(df)
    assert schemas and all(sorted(s) == ["doc_id", "text"] for s in schemas)


def test_pii_mask_is_pure_narrow_map(spark):
    df = Q.QUERIES["q_text_pii_mask"](spark, SF_DIR)
    assert shuffle_count(df) == 0


def test_semantic_search_broadcasts_hits(spark):
    df = Q.QUERIES["q_semantic_search"](spark, SF_DIR)
    # the 10-row hit list broadcasts; the documents side never shuffles
    assert has_broadcast_join(df)
    from lab5_lakehouse_etl_spark.plans import explain_str

    assert "TakeOrderedAndProject" in explain_str(df)


def test_decontaminate_broadcasts_benchmark_grams(spark):
    df = Q.QUERIES["q_decontaminate"](spark, SF_DIR)
    # the held-out n-gram set is the broadcast side; the train text is
    # probed in place — contamination never shuffles raw text
    assert has_broadcast_join(df)


def test_decontaminate_spans_broadcast_probe_single_merge_shuffle(spark):
    df = Q.QUERIES["q_decontaminate_spans"](spark, SF_DIR)
    # the (test_doc, gram) relation broadcasts into the train-side
    # posexplode probe; only contaminated (train, test, start) triples
    # reach the pair-keyed island-merge window, whose partitioning the
    # final group-by reuses — so the whole report costs ONE exchange
    # beyond the broadcast, bounded by contamination volume
    assert has_broadcast_join(df)
    assert shuffle_count(df) == 1


def test_decontaminate_index_broadcast_probe(spark):
    df = Q.QUERIES["q_decontaminate_index"](spark, SF_DIR)
    # the persisted (test_doc_id, gram) LakeTable broadcasts into the
    # train-side explode; only contaminated hits reach the test_doc
    # aggregate exchanges (countDistinct pair → expand + partial/final)
    assert has_broadcast_join(df)


def test_probe_leak_counts_o_batch(spark):
    """The shared ingest-gate probe (functions/decontaminate.
    probe_leak_counts — what stream_decontaminate_gate runs per
    micro-batch) must be O(batch): a narrow explode into a BROADCAST
    hash join, with the doc-keyed count as the ONLY exchange — so
    per-batch cost is bounded by batch tokens + contamination volume,
    never by corpus or benchmark size."""
    from pyspark.sql import functions as F

    from lab5_lakehouse_etl_spark.functions import decontaminate as DC
    from lab5_lakehouse_etl_spark.session import load_table

    docs = load_table(spark, SF_DIR, "documents")
    split = F.pmod(F.col("doc_id") * F.lit(2654435761), F.lit(100))
    gram_set = DC.heldout_grams(docs.filter(split >= 90), n=5)
    batch = docs.filter(split < 80).select("doc_id", "text").limit(50)
    probed = DC.probe_leak_counts(batch, gram_set, n=5)
    assert has_broadcast_join(probed)
    # one exchange for the gram-set distinct (benchmark-bounded, feeds
    # the broadcast) + one for the doc-keyed count — the BATCH side
    # itself never shuffles
    assert shuffle_count(probed) <= 2


def test_sample_weighted_window_group_limit_single_shuffle(spark):
    df = Q.QUERIES["q_sample_weighted"](spark, SF_DIR)
    from lab5_lakehouse_etl_spark.plans import explain_str

    plan = explain_str(df)
    # the rank-<=-20 filter pushes a per-map-task top-k BEFORE the
    # stratum exchange (the distributed-reservoir merge shape) and the
    # whole sample costs one shuffle
    assert "WindowGroupLimit" in plan
    assert shuffle_count(df) == 1


def test_drift_psi_single_scan_two_shuffles(spark):
    df = Q.QUERIES["q_drift_psi"](spark, SF_DIR)
    from lab5_lakehouse_etl_spark.plans import explain_str

    # corpus read ONCE into a partial-aggregated groupBy; totals come
    # from an unpartitioned window over the tiny cell relation (a
    # totals-by-crossJoin would plan the corpus subtree twice)
    assert shuffle_count(df) == 2
    plan = explain_str(df)
    assert plan.count("Location: InMemoryFileIndex") == 1
    assert "partial_sum" in plan


def test_decontaminate_semantic_broadcasts_heldout_block(spark):
    df = Q.QUERIES["q_decontaminate_semantic"](spark, SF_DIR)
    # the held-out matrix is a broadcast block; the corpus side only
    # shuffles into its own blocking, never a self-join
    assert has_broadcast_join(df)


def test_dedup_canonical_two_shuffles(spark):
    df = Q.QUERIES["q_dedup_canonical"](spark, SF_DIR)
    # island window (one (lang, source)-keyed exchange) + the
    # component-keyed selection window; the doc join broadcasts and
    # the rank/count/sum aggregates reuse the component partitioning
    assert shuffle_count(df) == 2
    assert has_broadcast_join(df)


def test_quality_entropy_zero_shuffles(spark):
    df = Q.QUERIES["q_quality_entropy"](spark, SF_DIR)
    # Arrow-batched pandas-UDF scale path (functions/text.char_entropy_udf,
    # the r9 fix for the interpreted-HOF x117 blowup): an ArrowEvalPython
    # NARROW map over the scan — still zero exchanges; the pure-JVM HOF
    # form survives only as the parity reference inside the unit tests
    assert shuffle_count(df) == 0


def test_embed_quantize_zero_shuffles(spark):
    df = Q.QUERIES["q_embed_quantize"](spark, SF_DIR)
    # pure row-local HOF arithmetic: no exchange anywhere in the plan
    assert shuffle_count(df) == 0


def test_sample_stratified_single_shuffle(spark):
    df = Q.QUERIES["q_sample_stratified"](spark, SF_DIR)
    # sample predicate is row-local; only the stratum audit aggregates
    assert shuffle_count(df) <= 1


def test_keyword_search_broadcast_stats_takeordered(spark):
    from lab5_lakehouse_etl_spark.plans import explain_str

    df = Q.QUERIES["q_keyword_search"](spark, SF_DIR)
    plan = explain_str(df)
    # df/N/avgdl stat relations broadcast; ranking is top-k, not a sort
    assert has_broadcast_join(df)
    assert "TakeOrderedAndProject" in plan


def test_quality_gopher_pure_narrow_map(spark):
    df = Q.QUERIES["q_quality_gopher"](spark, SF_DIR)
    # Repetition metrics are row-local; the ONLY allowed exchange is
    # session.spread's fixture-parallelism repartition (present exactly
    # because the one-file fixture scan can't split — conditional, so a
    # split corpus gets the zero-exchange plan). The scan still reads
    # only (doc_id, text).
    assert shuffle_count(df) <= 1
    schemas = scan_read_schema(df)
    assert schemas and all(set(s) <= {"doc_id", "text"} for s in schemas)


def test_cluster_sample_single_window_shuffle(spark):
    df = Q.QUERIES["q_cluster_sample"](spark, SF_DIR)
    # Assignment is a narrow map over literal centroids; the only
    # exchange in the FINAL plan is the per-cluster rank window.
    assert shuffle_count(df) <= 1


def test_semdedup_scan_prunes_embedding_columns(spark):
    df = Q.QUERIES["q_semdedup"](spark, SF_DIR)
    # Every embeddings scan reads at most (vec_id, embedding) — the
    # label column never loads.
    schemas = scan_read_schema(df)
    assert schemas and all(set(s) <= {"vec_id", "embedding"} for s in schemas)


def test_lm_unigram_vocab_broadcast_no_raw_token_shuffle(spark):
    df = Q.QUERIES["q_lm_unigram"](spark, SF_DIR)
    # the |V|-sized vocab (and the 1-row total) broadcast back onto the
    # token stream; the only exchanges are the vocab aggregate and the
    # per-doc mean — raw tokens never shuffle unaggregated
    assert has_broadcast_join(df)
    assert shuffle_count(df) <= 3


def test_hybrid_search_fuses_two_topk_legs(spark):
    from lab5_lakehouse_etl_spark.plans import explain_str

    df = Q.QUERIES["q_hybrid_search"](spark, SF_DIR)
    # both retrieval legs end in TakeOrderedAndProject before fusion
    assert explain_str(df).count("TakeOrderedAndProject") >= 2


def test_dup_remove_no_window_sort_on_tokens(spark):
    import re

    from lab5_lakehouse_etl_spark.plans import explain_str

    df = Q.QUERIES["q_dup_remove"](spark, SF_DIR)
    plan = explain_str(df)
    # exactly ONE window — the span-partition ownership min/max; the
    # per-doc redaction + reassembly is row-local array work, so the
    # oracle's per-doc (pos-ordered) window must NOT leak into the
    # engine plan
    assert len(re.findall(r"\(\d+\) Window", plan)) == 1
    # the one window is keyed on the span, not the doc/token stream:
    # formatted explain renders the partition key as
    # `windowspecdefinition(span#N, ...)` inside the Window node detail
    normalized = re.sub(r"#\d+L?", "", plan.lower().replace(" ", ""))
    assert "windowspecdefinition(span," in normalized
    # span window, start-collection agg, and the doc-keyed join back
    # are the only exchanges
    assert shuffle_count(df) <= 4


def test_triangle_count_reads_only_graph_columns(spark):
    # composed with materialize=False: the production query checkpoints
    # the oriented edges (hiding upstream lineage from the final plan),
    # so the scan-pruning property is asserted on the same composition
    # with the checkpoint disabled
    from lab5_lakehouse_etl_spark.functions.graph import triangle_counts
    from lab5_lakehouse_etl_spark.queries.dedup_ops import similarity_edges
    from lab5_lakehouse_etl_spark.session import load_table

    docs = load_table(spark, SF_DIR, "documents")
    df = triangle_counts(similarity_edges(docs), materialize=False)
    schemas = scan_read_schema(df)
    # the documents scan never loads text — graph columns only
    assert schemas and all(
        set(s) <= {"doc_id", "lang", "source", "n_chars"} for s in schemas
    )


def test_range_join_binned_is_equi_not_nested_loop(spark):
    from lab5_lakehouse_etl_spark.plans import explain_str

    df = Q.QUERIES["q_range_join_binned"](spark, SF_DIR)
    plan = explain_str(df)
    # the whole point of binning: the interval predicate rides an
    # equi-join on the bin id, never a nested loop
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_dedup_prefix_join_is_equi_not_cartesian(spark):
    """The prefix-filter candidate join must plan as a hash/sort-merge
    EQUI join on the prefix token — a cartesian/BNL plan would mean the
    length-filter conjuncts swallowed the equi key."""
    from lab5_lakehouse_etl_spark.plans import explain_str

    df = Q.QUERIES["q_dedup_prefix"](spark, SF_DIR)
    plan = explain_str(df).lower()
    assert "cartesianproduct" not in plan
    assert "broadcastnestedloop" not in plan


def test_dedup_prefix_verify_stage_full_width(spark):
    """The candidate-dedupe exchange before exact verification must be
    an explicit full-width repartition on (id_a, id_b): AQE's byte-based
    coalescing collapsed the CPU-dense array_intersect stage to a
    handful of tasks (r6 fix — measured 5 tasks / 0.9 s serial wall at
    sf0.1; full width cut the query ~25%)."""
    from lab5_lakehouse_etl_spark.plans import explain_str

    df = Q.QUERIES["q_dedup_prefix"](spark, SF_DIR)
    plan = explain_str(df).lower()
    assert "repartitionbyexpression" in plan.replace(" ", "") or (
        "hashpartitioning(id_a" in plan
    ), "verify-stage width repartition missing from the prefix plan"


def test_stream_drains_return_table_scans(spark):
    """q_stream_tumbling / q_stream_session results must be LakeTable
    parquet scans (foreachBatch-landed), not driver memory-sink tables
    — the r4/r5 review's production-shape requirement."""
    from lab5_lakehouse_etl_spark.plans import explain_str

    for name in ("q_stream_tumbling", "q_stream_session"):
        df = Q.QUERIES[name](spark, SF_DIR)
        plan = explain_str(df)
        assert "Scan parquet" in plan, f"{name} no longer scans a table"
        assert "MemoryPlan" not in plan and "LocalTableScan" not in plan, (
            f"{name} result still driver-resident"
        )


def test_resample_interp_single_fact_scan(spark):
    """Gap filling touches the events table exactly once: the observed
    aggregate is the only scan of the fact; the grid derives from a
    |types|-row aggregate, and interpolation is window math over
    grid-sized data."""
    from lab5_lakehouse_etl_spark.plans.inspect import explain_str

    df = Q.QUERIES["q_resample_interp"](spark, SF_DIR)
    txt = explain_str(df)
    import re

    scans = re.findall(r"Scan parquet[^\n]*", txt)
    assert len([s for s in scans if "events" in s]) <= 2  # obs + grid share
    # the fact-side aggregate partial-combines before any exchange
    assert "HashAggregate" in txt


def test_ewma_shuffles_points_not_events(spark):
    """EWMA's shuffles carry (type, bucket) points and per-type series
    rows only — bucket aggregate + per-type collect are the whole
    exchange budget; the trajectory fold is row-local."""
    df = Q.QUERIES["q_ewma"](spark, SF_DIR)
    assert shuffle_count(df) <= 2


def test_pq_search_broadcasts_shortlist(spark):
    """PQ re-rank hydrates true vectors through a BROADCAST semi-join
    against the ADC shortlist — the embedding store never shuffles."""
    from pyspark.sql import functions as F

    from lab5_lakehouse_etl_spark.functions import similarity as S
    from lab5_lakehouse_etl_spark.session import load_table

    emb = load_table(spark, SF_DIR, "embeddings")
    books = S.pq_train(emb, m=8, k=16, iters=1)
    codes = S.pq_encode(emb, books)
    q = emb.filter(F.col("vec_id") == 0).select("embedding").first()[0]
    df = S.pq_search(codes, emb, books, q, k=10)
    assert has_broadcast_join(df)


def test_dedup_clusters_island_plan_no_joins(spark):
    """The interval-island reduction must stay join-free and iteration-
    free: two window shuffles (group sort for the gap scan, island key
    for the component min), zero joins — the property that replaced
    ~19 label-propagation rounds in r7. A Join reappearing here means
    someone reverted to the pair-materializing formulation."""
    from lab5_lakehouse_etl_spark.plans import explain_str

    df = Q.QUERIES["q_dedup_clusters"](spark, SF_DIR)
    plan = explain_str(df)
    assert "Join" not in plan
    assert shuffle_count(df) <= 2


def test_dedup_fuzzy_verify_stage_join_free(spark):
    """q_dedup_fuzzy's returned plan must be the POST-BARRIER verify
    stage: a levenshtein filter over the checkpointed candidate
    relation, with NO join — if a Join (or worse, a nested-loop
    product) reappears, the checkpoint barrier was removed and
    Catalyst is again free to push `levenshtein <= 12` into the join
    residual ahead of the band predicates, the exact r7 regression
    that cost 229 s at sf0.1 (every key-matched pair paid the
    O(len^2) DP)."""
    from lab5_lakehouse_etl_spark.plans import explain_str

    df = Q.QUERIES["q_dedup_fuzzy"](spark, SF_DIR)
    plan = explain_str(df)
    assert "levenshtein" in plan
    assert "Join" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoop" not in plan


def test_pq_encode_shuffle_free_arrow_projection(spark):
    """PQ encode is the corpus-scale pass of the PQ pipeline and must
    stay a partition-local Arrow projection: zero shuffles, one
    ArrowEvalPython stage (r7 moved it off the 128-expression HOF
    formulation; a shuffle appearing here means someone re-introduced
    a grouped or joined encode)."""
    from lab5_lakehouse_etl_spark.functions import similarity as S
    from lab5_lakehouse_etl_spark.plans import explain_str
    from lab5_lakehouse_etl_spark.session import load_table

    emb = load_table(spark, SF_DIR, "embeddings")
    books = S.pq_train(emb, m=8, k=16, iters=5)
    codes = S.pq_encode(emb, books)
    assert shuffle_count(codes) == 0
    assert "ArrowEvalPython" in explain_str(codes)


def test_recursion_scans_bounded_shuffles(spark):
    """q_ewma / q_holt_trend: one bucket aggregate + one per-type
    collect — two shuffles total, with the trajectory computed in the
    O(n) Arrow scan (r7). A third shuffle or a Python-free plan (the
    scan silently replaced by the O(n^2) HOF matrix) are both
    regressions."""
    from lab5_lakehouse_etl_spark.plans import explain_str

    for name in ("q_ewma", "q_holt_trend"):
        df = Q.QUERIES[name](spark, SF_DIR)
        assert shuffle_count(df) == 2, name
        assert "ArrowEvalPython" in explain_str(df), name


def test_pmi_cooccur_broadcast_vocab_no_nested_loop(spark):
    """q_pmi_cooccur: the ranked vocabulary and the doc-count scalar
    must broadcast (no sort-merge join at fixture scale, never a
    nested-loop product), and the aggregates stay within the designed
    shuffle budget — token df, distinct presence, pair counts."""
    from lab5_lakehouse_etl_spark.plans import explain_str

    df = Q.QUERIES["q_pmi_cooccur"](spark, SF_DIR)
    plan = explain_str(df)
    assert has_broadcast_join(df)
    assert "CartesianProduct" not in plan
    # exactly one nested-loop join is by design: the crossJoin against
    # the broadcast 1-ROW doc-count aggregate; more would mean the
    # pair join lost its doc_id key (formatted explain prints each
    # node twice — once in the tree, once as a detail header)
    assert plan.count("BroadcastNestedLoopJoin") <= 2
    assert shuffle_count(df) <= 5


def test_dup_spans_var_bounded_shuffles_and_pruned_scan(spark):
    """q_dup_spans_var: one spread exchange + the span-sharing window
    shuffle + ONE doc-keyed shuffle serving both islands windows AND
    the final group-by (HashPartitioning(doc_id) satisfies the
    grouping's clustered distribution — no aggregate re-exchange), and
    the scan reads only (doc_id, text)."""
    df = Q.QUERIES["q_dup_spans_var"](spark, SF_DIR)
    assert shuffle_count(df) <= 3
    schemas = scan_read_schema(df)
    assert schemas and all(set(s) <= {"doc_id", "text"} for s in schemas)


def test_sketch_cms_single_corpus_scan(spark):
    """q_sketch_cms: the exact tokfreq relation feeds sketch + total +
    top-k, so the corpus text is scanned ONCE; every shuffle past the
    token group-by carries bounded keys (d*w cells, 1 stat row, 20)."""
    df = Q.QUERIES["q_sketch_cms"](spark, SF_DIR)
    schemas = scan_read_schema(df)
    assert len(schemas) == 1 and set(schemas[0]) <= {"text"}
    assert shuffle_count(df) <= 4


def test_dup_spans_char_single_scan_bounded_shuffles(spark):
    df = Q.QUERIES["q_dup_spans_char"](spark, SF_DIR)
    schemas = scan_read_schema(df)
    assert len(schemas) == 1 and set(schemas[0]) <= {"doc_id", "text"}
    assert shuffle_count(df) <= 3


def test_scan_jsonl_no_shuffle_declared_schema(spark):
    """q_scan_jsonl: a declared-schema JSON scan is a pure narrow read —
    zero exchanges, and the schema is pinned (no inference pass)."""
    df = Q.QUERIES["q_scan_jsonl"](spark, SF_DIR)
    assert shuffle_count(df) == 0
    assert [f.name for f in df.schema.fields] == [
        "doc_id", "text", "lang", "source", "n_chars",
    ]


def test_knn_graph_bounded_shuffles(spark):
    """knn_graph's plan: block build (one groupBy shuffle), block-pair
    join, candidate emit, ONE global window shuffle on src — no extra
    exchanges, and the scan reads only (vec_id, embedding)."""
    df = Q.QUERIES["q_knn_graph"](spark, SF_DIR)
    # block groupBy + block-pair join sides + per-src window — the
    # n²-score shuffle the naive self-join would add must not appear
    assert shuffle_count(df) <= 4
    schemas = scan_read_schema(df)
    assert schemas and all(
        set(s) <= {"vec_id", "embedding"} for s in schemas
    )


def test_sketch_bloom_broadcast_filter_partial_agg(spark):
    """q_sketch_bloom: the m/64-row filter relation reaches the probe
    side as a BROADCAST join (never a shuffle join against the corpus),
    and the whole plan stays within the build-groupBy / probe-groupBy /
    final-agg shuffle budget."""
    df = Q.QUERIES["q_sketch_bloom"](spark, SF_DIR)
    assert has_broadcast_join(df)
    # distinct(seen) + distinct(probes) + bloom build groupBy +
    # per-probe bool_and groupBy + membership join + final single-row
    # agg — bounded, corpus-side never re-shuffled beyond these
    assert shuffle_count(df) <= 8


def test_ppl_buckets_broadcast_vocab(spark):
    """q_ppl_buckets inherits q_lm_unigram's layout: the vocabulary
    reaches the token stream as a BROADCAST join (corpus tokens are
    never shuffled for scoring); only the scalar score relation is
    exchanged for the per-language tiling window."""
    df = Q.QUERIES["q_ppl_buckets"](spark, SF_DIR)
    assert has_broadcast_join(df)
    schemas = scan_read_schema(df)
    assert schemas and all(
        set(s) <= {"doc_id", "text", "lang"} for s in schemas
    )


def test_tpch_q2_one_fact_shuffle_window_on_candidates(spark):
    from lab5_lakehouse_etl_spark.plans import explain_str

    df = Q.QUERIES["q_tpch_q2"](spark, SF_DIR)
    assert has_broadcast_join(df)  # part prune + region-filtered esupp
    assert has_pushed_filters(df)  # p_size/p_type reach the part scan
    plan = explain_str(df)
    # supply agg shuffle + per-part window exchange over the candidate
    # relation; dims never shuffle
    assert shuffle_count(df) <= 2
    assert "TakeOrderedAndProject" in plan  # LIMIT 100 never global-sorts
    assert plan.count("lineitem.parquet") == 1


def test_tpch_q11_single_fact_scan_broadcast_total(spark):
    from lab5_lakehouse_etl_spark.plans import explain_str

    df = Q.QUERIES["q_tpch_q11"](spark, SF_DIR)
    assert has_broadcast_join(df)  # nation-pruned supplier keys + 1-row total
    plan = explain_str(df)
    # the cached per-part aggregate feeds both the total and the filter:
    # lineitem must not be scanned once per consumer
    assert plan.count("lineitem.parquet") <= 1


def test_dedup_index_store_probe_is_narrow(spark, tmp_path):
    """The stored-index probe join must key on (band, bucket) with the
    batch side never rescanning base-corpus text: candidate generation
    reads the persisted band relation, not documents.parquet."""
    from lab5_lakehouse_etl_spark.functions import dedup as D
    from lab5_lakehouse_etl_spark.lakehouse import LakeTable
    from lab5_lakehouse_etl_spark.plans import explain_str
    from lab5_lakehouse_etl_spark.session import load_table

    docs = load_table(spark, SF_DIR, "documents")
    t = LakeTable.create(
        D.minhash_band_index(docs.filter("doc_id % 4 != 0")).repartition(
            "band"
        ),
        str(tmp_path / "bi"),
        partition_by=["band"],
    )
    cands = D.minhash_probe_index(
        t.read(spark),
        D.minhash_band_index(docs.filter("doc_id % 4 = 0")),
    )
    plan = explain_str(cands)
    # the index side comes from the stored table; documents.parquet
    # appears only under the batch's signature subtree
    assert plan.count("documents.parquet") == 1


def test_ppl_buckets_gk_broadcasts_cutoffs(spark):
    df = Q.QUERIES["q_ppl_buckets_gk"](spark, SF_DIR)
    # cutoff relation (per-language sketch output) broadcasts back;
    # the scoring pass inherits q_lm_unigram's broadcast vocabulary
    assert has_broadcast_join(df)


def test_ann_index_store_probe_prunes_partitions(spark, tmp_path):
    """The persisted IVF index's core claim: probing filters the
    cell-partitioned table with a PARTITION filter, so unprobed cells'
    files are pruned at planning (hive-style recovery via basePath —
    the read schema must not even contain the cell column)."""
    from lab5_lakehouse_etl_spark.functions import similarity as S
    from lab5_lakehouse_etl_spark.lakehouse import LakeTable
    from lab5_lakehouse_etl_spark.session import load_table
    from pyspark.sql import functions as F

    emb = load_table(spark, SF_DIR, "embeddings")
    planes = S.hyperplanes(64, n_planes=8, seed=42)
    t = LakeTable.create(
        emb.withColumn("cell", S.lsh_bucket("embedding", planes))
        .repartition("cell"),
        str(tmp_path / "ivf"),
        partition_by=["cell"],
    )
    probe = t.read(spark).filter(F.col("cell").isin([1, 2, 3]))
    plan = probe._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [cell" in plan
    assert "ReadSchema: struct<vec_id:bigint,embedding:array<float>" in plan


def test_dedup_containment_bounded_shuffles(spark):
    """q_dedup_containment: the checkpointed set relation feeds every
    branch (scan hidden behind the localCheckpoint), then exactly the
    df group-by, the per-doc prefix window, and the widened candidate
    dedupe — never an all-pairs exchange."""
    df = Q.QUERIES["q_dedup_containment"](spark, SF_DIR)
    assert shuffle_count(df) <= 3


def test_corpus_shuffle_single_shard_exchange(spark):
    """q_corpus_shuffle: ONE hash exchange on the shard key (the
    per-shard row_number sort rides that partitioning), and the scan
    reads only doc_id — the text never moves."""
    df = Q.QUERIES["q_corpus_shuffle"](spark, SF_DIR)
    assert shuffle_count(df) == 1
    schemas = scan_read_schema(df)
    assert schemas and all(s == ["doc_id"] for s in schemas)


def test_text_normalize_single_fp_shuffle(spark):
    """q_text_normalize: normalization + md5 are narrow codegen maps;
    the only exchanges are the conditional fixture spread (no-op on a
    split corpus) and the fingerprint window, which carries
    (doc_id, norm_fp) — the text column is projected away first."""
    df = Q.QUERIES["q_text_normalize"](spark, SF_DIR)
    assert shuffle_count(df) <= 2
    schemas = scan_read_schema(df)
    assert schemas and all(set(s) <= {"doc_id", "text"} for s in schemas)


def test_dedup_epoch_probe_narrow_scans(spark):
    """q_dedup_epoch's returned plan (epoch-2 probe + checkpointed
    epoch-1 rows): the stored index scan reads only (bucket, id, sig) —
    band is partition-pruned metadata, text is never stored — and the
    documents scans read only (doc_id, text); shuffle budget covers
    the probe join, verify, and union legs PLUS the two r11 features:
    the hot-bucket cap (one exchange over the narrow index relation,
    map-side bounded — the plan shows WindowGroupLimit(Partial) BEFORE
    the exchange, so each task ships <=cap rows per bucket) and the
    candidate-sized verify prefilter (distinct candidate ids + corpus
    semi-join; both legs are candidate-sized, and the static SMJ is
    deliberate — AQE converts it to broadcast at runtime when the id
    set is small, while a forced broadcast hint would OOM on a large
    ingest batch)."""
    df = Q.QUERIES["q_dedup_epoch"](spark, SF_DIR)
    assert shuffle_count(df) <= 7
    schemas = scan_read_schema(df)
    assert schemas
    for s in schemas:
        assert set(s) <= {"doc_id", "text"} or set(s) <= {
            "bucket", "id", "sig",
        }


def test_ingest_epoch_narrow_store_scan(spark):
    """q_ingest_epoch's returned plan (epoch-2 anti-join + checkpointed
    epoch-1 rows): the fingerprint-store scan reads ONLY the
    fingerprint column (the 32 B/doc index contract), and the corpus
    scan reads only (doc_id, text)."""
    df = Q.QUERIES["q_ingest_epoch"](spark, SF_DIR)
    schemas = scan_read_schema(df)
    assert schemas
    for s in schemas:
        assert set(s) <= {"doc_id", "text"} or s == ["fingerprint"]
    assert shuffle_count(df) <= 3


def test_dedup_chunks_fingerprint_width_shuffles(spark):
    """q_dedup_chunks: one scan (LET-bound split — the token array
    materializes once per row), fp-keyed group + join sharing the hash
    partitioning, one per-doc rollup; every shuffled relation carries
    md5 fingerprints, never chunk text."""
    df = Q.QUERIES["q_dedup_chunks"](spark, SF_DIR)
    assert shuffle_count(df) <= 4
    schemas = scan_read_schema(df)
    assert schemas and all(set(s) <= {"doc_id", "text"} for s in schemas)


def test_bpe_encode_broadcast_vocab_single_agg_shuffle(spark):
    df = Q.QUERIES["q_bpe_encode"](spark, SF_DIR)
    # the merged vocabulary (word -> n_pieces) broadcasts into the
    # exploded token stream; the doc-keyed count is the only exchange
    # past the vocabulary build's own aggregate
    assert has_broadcast_join(df)


def test_gram_index_built_once_per_process(spark):
    """The build-once/probe-many CLAIM, pinned: after any two
    decontamination consumers run against the same sf_dir, the scratch
    area holds exactly ONE gram-index LakeTable for that benchmark
    snapshot, still at version 0 (never rebuilt, never appended) — the
    audit, span report, streaming gate, and per-item index query all
    probe the same artifact."""
    import hashlib
    import os

    from lab5_lakehouse_etl_spark.lakehouse import LakeTable
    from lab5_lakehouse_etl_spark.session import scratch_dir

    Q.QUERIES["q_decontaminate"](spark, SF_DIR).collect()
    Q.QUERIES["q_decontaminate_index"](spark, SF_DIR).collect()
    digest = hashlib.md5(
        f"{os.path.abspath(SF_DIR)}|n=5|doc_id|text".encode()
    ).hexdigest()[:12]
    path = os.path.join(scratch_dir("gram_index"), digest)
    assert LakeTable.is_table(path)
    assert LakeTable(path).version() == 0


def test_codec_queries_prune_scan_to_id(spark):
    """The r11 codec queries generate payloads FROM ids: their only
    parquet scan must read doc_id alone (a codec query that drags the
    text column through the exchange ships the whole corpus for
    nothing), and the whole pipeline runs in <=1 exchange — the
    row-count-adaptive codec repartition; decode stages chain
    shuffle-free."""
    for name in (
        "q_multimodal_decode",
        "q_multimodal_jpeg",
        "q_multimodal_jpeg_prog",
        "q_multimodal_webp",
        "q_multimodal_gif",
        "q_multimodal_bmp",
        "q_multimodal_audio",
        "q_multimodal_flac",
        "q_multimodal_video",
        "q_multimodal_resize_real",
        "q_media_quarantine",
    ):
        df = Q.QUERIES[name](spark, SF_DIR)
        schemas = scan_read_schema(df)
        assert schemas and all(s == ["doc_id"] for s in schemas), name
        assert shuffle_count(df) <= 1, name


def test_image_dedup_shuffles_fingerprints_only(spark):
    """q_image_dedup: scan reads only doc_id; shuffle budget covers the
    codec repartition + the ONE dedup exchange, whose rows are (id,
    16 B fingerprint) — pixels never cross the wire (they exist only
    inside the two chained mapInPandas stages)."""
    df = Q.QUERIES["q_image_dedup"](spark, SF_DIR)
    schemas = scan_read_schema(df)
    assert schemas and all(s == ["doc_id"] for s in schemas)
    assert shuffle_count(df) <= 2


def test_stream_neardup_drain_job_budget(spark):
    """q_stream_neardup cost-structure pin (r11 verdict #7): the
    registry's heaviest query splits into a one-time index build
    (landing write + band-index LakeTable + the gate's hot-bucket-cap
    materialization) and a 4-micro-batch drain whose per-batch cost
    must stay O(batch). This pins the DRAIN's job count so a
    structural regression in the probe path — e.g. re-capping the
    index per batch (an O(index) window shuffle each trigger) or the
    verify leg falling back to a corpus-wide shingle pass — shows up
    as job growth instead of hiding inside the build wall.

    Measured baseline: 29 jobs per micro-batch (116/4) on the
    capped-probe + prefiltered-verify + overwrite-sink path; budget
    36/batch leaves headroom for Spark-version job-split jitter, not
    for a new per-batch table scan (the cheapest O(table) leg adds
    4+ jobs/batch). Job counts are size-independent, so the sf0.001
    fixture pins the same structure the sf0.1 bench runs."""
    from lab5_lakehouse_etl_spark.queries import streaming_ops

    df = Q.QUERIES["q_stream_neardup"](spark, SF_DIR)
    df.collect()
    ph = streaming_ops.NEARDUP_PHASES
    assert set(ph) >= {"build_jobs", "cap_jobs", "drain_jobs"}
    # the cap is ONE materialization, never per-batch
    assert ph["cap_jobs"] <= 4
    assert ph["drain_jobs"] <= 4 * 36


def test_ann_recall_monitor_phase_job_budget(spark):
    """q_ann_recall_monitor cost-structure pin (r12 verdict #4): the
    tier-2 heaviest query splits into index BUILD (create + the
    one-row dim probe), APPEND (one O(batch) cell commit) and PROBE
    (histogram + per-probe IVF-vs-exact overlap).  This pins each
    phase's job count so a structural regression — e.g. the probe
    path falling back to an O(table) scan per probe, or append
    rebuilding the index — shows up as phase job growth instead of
    hiding inside host drift (r12 measured a 2.8x whole-query wall
    swing on unchanged code; job counts are size- and drift-
    independent, so the sf0.001 fixture pins the same structure the
    sf0.1 bench isolates).

    Measured baseline: build 4 / append 2 / probe 8 jobs for 3
    probes (~2-3 jobs per probe: cell-pruned IVF leg + exact re-rank
    + top-k collect).  Budgets leave jitter headroom, not room for a
    new per-probe table scan (the cheapest O(table) leg adds 1+ job
    per probe)."""
    from lab5_lakehouse_etl_spark.queries import similarity_ops

    df = Q.QUERIES["q_ann_recall_monitor"](spark, SF_DIR)
    df.collect()
    ph = similarity_ops.ANN_MONITOR_PHASES
    assert set(ph) >= {"build_jobs", "append_jobs", "probe_jobs"}
    assert ph["build_jobs"] <= 8
    assert ph["append_jobs"] <= 4
    # 3 probes: at most 5 jobs per probe before the pin trips
    assert ph["probe_jobs"] <= 15


def test_html_extract_no_python_no_shuffle(spark):
    """HTML -> text extraction is a pure JVM narrow projection: the
    plan carries NO Python evaluation node and NO exchange — the
    property that lets the pass run at payload scale inside
    whole-stage codegen."""
    from lab5_lakehouse_etl_spark.plans import explain_str

    df = Q.QUERIES["q_text_html_extract"](spark, SF_DIR)
    plan = explain_str(df)
    assert "Python" not in plan and "ArrowEval" not in plan
    assert shuffle_count(df) == 0


def test_url_canonicalize_single_shuffle_no_python(spark):
    """URL canonicalization is JVM expressions; the only exchange is
    the per-canonical-key window (the shuffle URL-level dedup pays at
    any scale)."""
    from lab5_lakehouse_etl_spark.plans import explain_str

    df = Q.QUERIES["q_url_canonicalize"](spark, SF_DIR)
    plan = explain_str(df)
    assert "Python" not in plan and "ArrowEval" not in plan
    assert shuffle_count(df) == 1


def test_pipeline_web_plan_shape(spark):
    """The web-corpus composite is ONE Catalyst plan over ONE
    binaryFile scan with exactly two exchanges (URL-dedup window,
    text-dedup window — both WindowGroupLimit-pruned map-side) and
    exactly two Python nodes (the WARC Arrow decode + the langid
    pandas UDF).  Document bodies never cross either exchange: the
    shuffled relation carries only ids/url/lang/stats/fingerprint."""
    from lab5_lakehouse_etl_spark.plans import explain_str

    df = Q.QUERIES["q_pipeline_web"](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("FileScan") == 1  # the binaryFile scan only
    assert shuffle_count(df) == 2
    assert plan.count("MapInPandas") == 1
    assert plan.count("ArrowEvalPython") == 1
    # map-side pre-prune of both windows (rn = 1 pushed to Partial)
    assert plan.count("WindowGroupLimit") == 4
    # the full text column is projected away before the exchanges
    import re

    for m in re.finditer(r"Exchange hashpartitioning\(([^)]*)\)", plan):
        assert "text#" not in m.group(1)
