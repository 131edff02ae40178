"""Physical-plan regression tests: the 100 TB contract is a property
of the plan. A change that adds a shuffle, drops a broadcast, or stops
pushing a filter to the parquet scan fails here even though small-SF
results stay correct."""

import pyspark.sql.functions as F
import pytest

from data_ingest_spark.harness import registry
from data_ingest_spark.plans import (assert_no_cartesian,
                                     assert_pushed_filters,
                                     broadcast_join_count,
                                     codegen_span_count, physical_plan,
                                     scan_columns, shuffle_count)

SF = "/root/testdata/sf0.001"


@pytest.fixture(autouse=True)
def _fresh_cache(spark):
    """Cached subtrees (e.g. emptyDrops' persisted weights) print their
    stored plan inside InMemoryRelation, inflating Exchange counts —
    audit the uncached plan."""
    spark.catalog.clearCache()
    yield


def q(spark, name):
    return registry.REGISTRY[name][0](spark, SF)


def test_cell_counts_single_shuffle_pruned_scan(spark):
    """A1/A2 is one partial+final aggregation: exactly one shuffle, and
    the scan reads only the 3 needed lineitem columns (of 16)."""
    df = q(spark, "a1_a2_cell_counts")
    assert shuffle_count(df) == 1
    assert all(len(cols) <= 4 for cols in scan_columns(df))


def test_dimension_joins_broadcast_no_shuffle(spark):
    """J4 customer⋈nation must broadcast the dimension, never
    shuffle-join it."""
    df = q(spark, "j4_sample_metadata")
    assert broadcast_join_count(df) >= 1
    assert shuffle_count(df) == 0


def test_filter_pushdown_reaches_scan(spark):
    """A filter on a scanned column must appear in PushedFilters."""
    df = (registry.load(spark, SF, "orders")
          .filter(F.col("o_totalprice") > 1000.0)
          .select("o_orderkey", "o_totalprice"))
    assert_pushed_filters(df, "GreaterThan(o_totalprice")
    assert scan_columns(df) == [["o_orderkey", "o_totalprice"]]


def test_no_cartesian_anywhere(spark):
    """No registry query may degenerate to a cartesian product (the
    kNN brute-force is an explicit broadcast nested-loop, which is the
    documented exception and still not a CartesianProduct node)."""
    for name, (fn, _) in registry.REGISTRY.items():
        if name.startswith(("m13", "m10", "m9", "m2", "p1")):
            continue  # driver-side / applyInPandas paths, audited in their own tests
        assert_no_cartesian(fn(spark, SF))


def test_empty_drops_shuffle_budget(spark):
    """M1's documented shape: totals + ambient + distinct + loglik +
    moments + FDR windows. The static plan must stay within 9 shuffles
    (persisted weights subtree counted once per consumer) — a
    regression that re-normalizes per-row or loses the broadcast joins
    pushes this past the budget."""
    df = q(spark, "m1_empty_drops")
    assert shuffle_count(df) <= 9
    assert broadcast_join_count(df) >= 2


def test_hot_path_runs_codegen(spark):
    """The expression-table aggregations must run inside
    WholeStageCodegen (JVM fused loops), not as interpreted rows."""
    assert codegen_span_count(q(spark, "a1_a2_cell_counts")) >= 1
    assert codegen_span_count(q(spark, "m5_log_normalize")) >= 1


def test_minhash_no_pathological_codegen(spark):
    """The MinHash signature plan must keep the shingle explode OUT of
    the per-hash expression (the inlined variant compiled a
    pathological codegen function; see dedup.minhash_bands docstring):
    the exploded shingles feed a cross join with the tiny hash index
    range, then aggregate."""
    df = q(spark, "x2_minhash_lsh_pairs")
    plan = physical_plan(df)
    assert plan.count("Generate explode") <= 3
    assert_no_cartesian(df)


def test_minhash_exchange_budget(spark):
    """x2's stage chain is pinned (round-3 rewrite: candidate pairs
    come from ONE groupBy(band, bucket) with a map-side ordered-pair
    expansion instead of the band self-join + distinct). Static plan:
    ≤10 exchanges — the remaining ones are the signature groupBy, the
    bucket groupBy, the pair distinct, and the genuinely-at-scale
    verification joins; AQE collapses the small sides at runtime (5
    executed exchanges at sf0.01). Re-introducing the self-join fails
    this budget."""
    df = q(spark, "x2_minhash_lsh_pairs")
    assert shuffle_count(df) <= 10


def test_decontam_broadcasts_benchmark_single_corpus_pass(spark):
    """x34: the benchmark shingle set must broadcast (test sets are
    tiny), and hit-count + shingle-count must come from ONE corpus
    aggregation — two shuffles total (the groupBy and the bench-side
    distinct), never a second corpus pass."""
    df = q(spark, "x34_decontam")
    assert broadcast_join_count(df) >= 1
    assert shuffle_count(df) <= 4


def test_tpch_q6_full_pushdown_no_join(spark):
    """v5: all four predicates reach the parquet scan; the plan is a
    scan → partial agg → single-row exchange, nothing else."""
    df = q(spark, "v5_tpch_q6")
    assert_pushed_filters(df, "l_shipdate", "l_discount", "l_quantity")
    assert broadcast_join_count(df) == 0
    assert shuffle_count(df) == 1


def test_doublets_grid_scans_fact_table_twice_only(spark):
    """m2: the per-cell aggregate and the distinct-point table are
    materialized ONCE each via lazy localCheckpoints, and the round-7b
    rewrite funnels the whole pairing/cells derivation through ONE
    corpus exchange (bucket census broadcast scan-side; every
    downstream groupBy keys on a superset of the partition keys) plus
    a closed-form fast path for self-sufficient query points —
    5.6 s -> 3.6 s steady-state at sf0.1. The receipt: the final
    adaptive plan consumes ONLY the two checkpointed tables — every
    parquet byte of the fact table was read inside the
    checkpoint-materialization jobs, never re-derived in the main
    query."""
    df = q(spark, "m2_doublets_native")
    df.collect()
    final = df._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in final
    assert final.count("Scan parquet") == 0
    assert final.count("ExistingRDD") >= 2


def test_ppl_buckets_broadcasts_model(spark):
    """x74: the per-language LM scalars and vocabulary-sized logp
    table broadcast back onto the token stream; a shuffle join there
    would move the corpus twice."""
    df = q(spark, "x74_ppl_buckets")
    assert broadcast_join_count(df) >= 2
    assert shuffle_count(df) <= 5


def test_training_prep_shuffle_budget(spark):
    """p4: the packing stage reads the lazily-checkpointed bucketed
    frame (round 7 made pack_sequences lazy — the gate/dedup/count
    chain materializes exactly ONCE instead of three times, so its
    broadcasts now live in the checkpoint's own job, pinned by
    test_ppl_buckets_broadcasts_model); the visible plan is the range
    totals + offsets broadcast + the seq window/aggregate, within a
    tight budget."""
    df = q(spark, "p4_training_prep")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "ExistingRDD" in plan       # the checkpointed bucketed frame
    assert shuffle_count(df) <= 5
    assert broadcast_join_count(df) >= 1


def test_curate_reuses_dedup_exchange(spark):
    """p3: the composed pipeline's dedup subtree feeds two consumers
    (decontamination + anti-join); the executed plan must share it via
    ReusedExchange instead of recomputing the upstream stages."""
    df = q(spark, "p3_curate")
    df.collect()
    executed = df._jdf.queryExecution().executedPlan().toString()
    assert "ReusedExchange" in executed


def test_tokenize_vocab_broadcasts_back(spark):
    """x38: the capped vocabulary must broadcast onto the exploded
    token stream — a shuffle join there would move the corpus."""
    df = q(spark, "x38_tokenize_ids")
    assert broadcast_join_count(df) >= 1


def test_tpch_round3_shapes_broadcast_dims(spark):
    """The round-3 TPC-H shapes must keep their star-join plans: every
    dimension side broadcast (no shuffle-join on a dim), and the fact
    chain within a fixed exchange budget. Counts measured at authoring
    time; a regression that turns a dim broadcast into a sort-merge
    join or adds a fact shuffle fails here."""
    expect = {
        "v15_tpch_q7": (5, 1), "v16_tpch_q8": (7, 1),
        "v17_tpch_q9": (4, 1), "v18_tpch_q10": (3, 1),
        "v19_tpch_q12": (1, 1), "v20_tpch_q15": (2, 3),
        "v21_tpch_q17": (2, 2), "v22_tpch_q19": (1, 1),
        "v23_tpch_q21": (3, 5), "v24_tpch_q2": (7, 5),
        "v25_tpch_q11": (5, 3), "v26_tpch_q20": (3, 5),
    }
    for name, (min_bcast, max_shuffles) in expect.items():
        df = q(spark, name)
        assert broadcast_join_count(df) >= min_bcast, name
        assert shuffle_count(df) <= max_shuffles, name


def test_evaluation_ops_single_shuffle(spark):
    """x77/x79/x81 are one-shuffle plans: the ranking window and its
    grouped aggregation share the group-key partitioning, the epoch
    shuffle ranks within coarse hash buckets, and the preference-pair
    struct-min/max is a plain partial-aggregated groupBy with the
    click predicate pushed to the scan."""
    for name in ("x77_ranking_metrics", "x79_epoch_shuffle",
                 "x81_preference_pairs"):
        assert shuffle_count(q(spark, name)) == 1, name
    assert_pushed_filters(q(spark, "x81_preference_pairs"),
                          "EqualTo(event_type,click)")


def test_incremental_rollup_pushes_cutoff_to_scan(spark):
    """e26 reads the events scan twice with the history/batch cutoff
    pushed down — the incremental-maintenance contract is that the
    batch side touches only batch rows."""
    df = q(spark, "e26_incremental_rollup")
    assert shuffle_count(df) == 2
    assert_pushed_filters(df, "GreaterThanOrEqual(ts")
    assert_pushed_filters(df, "LessThan(ts")


def test_mix_quota_broadcasts_quota_corpus_moves_once(spark):
    """x80's per-source quota table is broadcast; the corpus itself is
    shuffled exactly once (the per-source cumulative-sum window). The
    remaining exchanges carry one row per source."""
    df = q(spark, "x80_mix_quota")
    assert broadcast_join_count(df) >= 1
    # 6 since the round-7 lazy dense-rank rework: the former eager
    # offsets collect() hid a size aggregate + cumsum window as driver
    # actions that re-executed the upstream; they now appear statically
    # but run over the one-row-per-source frame.
    assert shuffle_count(df) <= 6


def test_bpe_and_lloyd_broadcast_and_bounded_shuffles(spark):
    """x82: the seed-centroid table broadcasts with the vec_id<4
    predicate pushed to the scan; two shuffles (assignment window +
    re-centering groupBy). x84: the encoded vocabulary broadcasts
    back to the token stream; two shuffles (distinct vocab + per-doc
    reassembly) — both independent of corpus size."""
    lloyd = q(spark, "x82_lloyd_step")
    assert broadcast_join_count(lloyd) >= 1
    assert shuffle_count(lloyd) == 2
    assert_pushed_filters(lloyd, "LessThan(vec_id,4)")
    bpe = q(spark, "x84_bpe_encode")
    assert broadcast_join_count(bpe) >= 1
    assert shuffle_count(bpe) == 2


def test_round3b_batch2_bounded_shuffles(spark):
    """x85-x88 + the MNN anchors stay within their pinned exchange
    budgets. x87 uses the cosine_topk broadcast-MATRIX shape (a
    sparkContext broadcast feeding mapInPandas — no join node at all;
    its one exchange is the final rank window), so only the anchor
    cross join still pins a broadcast-join node."""
    for name, max_sh in (("x85_length_buckets", 1), ("x86_soft_dedup", 2),
                         ("x87_hard_negatives", 2), ("x88_ngram_novelty", 4),
                         ("m9_mnn_anchors", 2)):
        assert shuffle_count(q(spark, name)) <= max_sh, name
    assert broadcast_join_count(q(spark, "m9_mnn_anchors")) >= 1


def test_round4_batch_bounded_shuffles(spark):
    """Round-4 operator batch plan pins. x93: each candidate cut is a
    distributed top-k (TakeOrderedAndProject), the fusion join is over
    bounded candidate lists — one corpus-sized shuffle max. x94 is one
    grouped aggregation over map-side canonicalization. x95 is
    map-only (the ±1 matrix folds into codegen — zero exchanges).
    x97 broadcasts the df table back onto tf. x98 does one grouped
    count then tiny-aggregate arithmetic."""
    # x93 counts 3 since the round-7 lazy dense-rank rework (the
    # bounded-candidate rank windows' size-aggregate/cumsum exchanges
    # are now in the static plan instead of hidden driver collects);
    # all three run over ≤ n_candidates rows.
    for name, max_sh in (("x93_rrf_fusion", 3), ("x94_url_canonical", 1),
                         ("x95_random_projection", 0),
                         ("x97_doc_keywords", 5),
                         ("x98_temperature_mix", 3)):
        assert shuffle_count(q(spark, name)) <= max_sh, name
    for name in ("x93_rrf_fusion", "x97_doc_keywords",
                 "x98_temperature_mix"):
        assert broadcast_join_count(q(spark, name)) >= 1, name


def test_ks_drift_scans_corpus_once(spark):
    """x96: the (group, value) count is the only corpus-sized work and
    it is materialized ONCE behind a lazy localCheckpoint (round 5:
    checkpoint instead of persist, so the blocks are GC-reclaimable
    across a long session) — the outer static plan therefore contains
    ZERO parquet scans (the corpus scan lives inside the checkpointed
    subtree, which by construction executes exactly once); everything
    downstream operates on bounded aggregates with broadcast joins."""
    df = q(spark, "x96_ks_drift")
    assert len(scan_columns(df)) == 0
    assert broadcast_join_count(df) >= 2


def test_power_pc1_covariance_single_corpus_shuffle(spark):
    """x99 (r10 shape): everything the iteration needs — second
    moments, column sums, row count — comes out of ONE corpus scan and
    ONE fixed-size shuffle (dim²+dim+1 partial rows per task); the
    power iterations themselves run on the driver over the collected
    64×64 matrix, so the returned frame is a LocalTableScan with no
    Python/RDD re-entry."""
    from data_ingest_spark.extensions.similarity import (pc1_moment_rows,
                                                         power_iteration_pc1)
    emb = registry.load(spark, SF, "embeddings")
    mom = pc1_moment_rows(emb, dim=64)
    assert len(scan_columns(mom)) == 1   # one corpus pass, not two
    assert shuffle_count(mom) == 1       # the fixed-size groupBy
    assert_no_cartesian(mom)
    out = power_iteration_pc1(emb, dim=64, n_iters=1)
    plan = physical_plan(out)
    assert "LocalTableScan" in plan and "ExistingRDD" not in plan


def test_ivf_incremental_and_skew_profile_plans(spark):
    """x100: seed centroids broadcast into both sub-corpus assignment
    passes; the merge is one grouped sum over k*dims partials. x101:
    one grouped count, a distributed top-k cut, totals broadcast."""
    df = q(spark, "x100_ivf_incremental")
    assert broadcast_join_count(df) >= 2
    assert_no_cartesian(df)
    sp = q(spark, "x101_skew_profile")
    assert shuffle_count(sp) <= 3
    assert broadcast_join_count(sp) >= 1


def test_winsorize_and_pmi_plans(spark):
    """x102: quantile bounds broadcast back, two grouped passes.
    x103: bigram counts from one scan-side explode; unigram marginals
    join onto the bounded top-k, scalars broadcast."""
    w = q(spark, "x102_winsorize")
    assert broadcast_join_count(w) >= 1
    assert shuffle_count(w) <= 4
    p = q(spark, "x103_pmi_collocations")
    assert broadcast_join_count(p) >= 2
    assert_no_cartesian(p)


def test_weighted_sample_single_shuffle_pruned(spark):
    """x106: the πps sample is one rank shuffle over a 3-column scan —
    no extra exchange for the priority computation (map-side) and no
    unpartitioned window."""
    df = q(spark, "x106_weighted_sample")
    assert shuffle_count(df) == 1
    assert all(len(cols) <= 3 for cols in scan_columns(df))
    assert "PartitionBy: []" not in physical_plan(df)


def test_wilson_rank_is_partitioned(spark):
    """x107: agg + bucketed two-pass rank = ≤2 shuffles, and the rank
    window is partitioned (the zero-unpartitioned-windows contract)."""
    df = q(spark, "x107_wilson_winrate")
    assert shuffle_count(df) <= 2
    plan = physical_plan(df)
    assert "Window" not in plan or "PartitionBy: []" not in plan


def test_hist_merge_bounded_shuffles(spark):
    """x108: three ≤nbins-row grouped histograms; the merge/compare
    join never shuffles the corpus again."""
    df = q(spark, "x108_hist_merge")
    assert shuffle_count(df) <= 4
    assert_no_cartesian(df)


def test_round5_batch_bounded_shuffles(spark):
    """Round-5 operator batch plan pins. x126 (pHash) is a pure
    map-only decode->hash chain — ZERO exchanges; x127's banded
    Hamming join pays exactly one; x122's pairwise slopes key one
    shuffle on the entity; the text-statistics family (x123/x124/
    x128) shuffles token aggregates only; x125/x129/x130 are the
    composite pipelines (entity resolution, sketch-merge timeline,
    prefix-filtered join) whose exchange budgets are pinned so a
    refactor can't silently regress them into wider plans.

    x130's 16 reflects the candidate join's pa/pb sides being
    projections of one prefix subtree, which the static plan prints
    twice (AQE reuses identical stages at runtime — the executed plan
    at sf0.01 shows ReusedExchange nodes). The r10 localCheckpoint
    that statically deduped it back to 8 measured ~2x SLOWER
    end-to-end (block-manager serialization of the full prefix table
    + lost AQE stats), so the pin accepts the mirrored static count —
    interleaved reps: ckpt 5.1-9.9 s vs none 2.8-4.3 s at sf0.1."""
    for name, max_sh in (("x126_phash", 0), ("x127_phash_neardup", 1),
                         ("x122_theil_sen", 1), ("x124_zipf_fit", 2),
                         ("x123_good_turing", 6),
                         ("x125_entity_resolution", 7),
                         ("x128_kneser_ney", 7),
                         ("x129_kmv_timeline", 9),
                         ("x130_ppjoin", 16)):
        assert shuffle_count(q(spark, name)) <= max_sh, name


def test_round5_batch2_bounded_shuffles(spark):
    """Second round-5 batch: x134 (charset screen) is pure map-only —
    zero exchanges; x131 pays one explode-side aggregation with the
    64-row stats broadcast back; e28's attribution window keys on the
    user; g3's BFS rounds stay within the checkpointed-lineage budget;
    the rank statistics (x132/x133) shuffle token/value aggregates
    only."""
    for name, max_sh in (("x134_charset_quality", 0),
                         ("x131_standardize_dims", 1),
                         ("e28_attribution", 3),
                         # r9: lazy frontier checkpoints keep all 8
                         # relaxation rounds visible in the STATIC
                         # plan (eager checkpoints used to hide the
                         # earlier rounds inside their own jobs); the
                         # runtime cost went DOWN (no blocking
                         # per-cadence jobs, edge frame pinned+cached)
                         ("g3_bfs_hops", 10),
                         ("x132_log_odds", 8),
                         ("x133_mannwhitney", 8),
                         ("x135_mutual_knn", 1),
                         ("x136_stratified_kfold", 1),
                         ("x137_vocab_coverage", 3),
                         ("x138_psi_drift", 4),
                         ("x139_feature_hash", 1),
                         ("x120_cdc_chunks", 1),
                         # r6: funnel rewritten as one sorted-collect
                         # fold — 1 scan, 2 exchanges, step-count-free
                         ("e29_window_funnel", 2)):
        assert shuffle_count(q(spark, name)) <= max_sh, name


def test_round6_batch_bounded_shuffles(spark):
    """Round-6 operator batch plan pins. x141's linkage self-join keys
    on the block columns (one shuffle, dimension-free scoring);
    x144/x145/x146 are single-key window/aggregate plans; x148's
    winnowing chain is explode -> per-doc window -> distinct ->
    posting-list pair expansion; x143's neighbor join keys on the
    dense rank (the two-pass W5 scheme, no global sort); x142 audits
    the full LSH pipeline, whose static plan duplicates the persisted
    membership subtree (runtime reuses it — same caveat as x57);
    x147's static count includes the pre-checkpoint bucket subtrees."""
    for name, max_sh in (("x141_fellegi_sunter", 2),
                         ("x144_bot_regularity", 1),
                         ("x145_token_fertility", 1),
                         ("x146_gini_source", 1),
                         ("x143_sorted_neighborhood", 3),
                         ("x148_winnowing", 4),
                         ("x147_js_divergence", 6),
                         # membership localCheckpoint collapses the
                         # static duplication the old persist left
                         ("x142_lsh_precision", 10)):
        assert shuffle_count(q(spark, name)) <= max_sh, name
    for name in ("x141_fellegi_sunter", "x143_sorted_neighborhood",
                 "x148_winnowing"):
        assert_no_cartesian(q(spark, name))


def test_round6_batch2_bounded_shuffles(spark):
    """Round-6 batch-2 plan pins. p5's five-rule gate is pure
    scan-side Column math — ZERO exchanges; x149/e30 are one
    window+aggregate on the group key; x150's pair join keys on the
    user; x151's dispersion pipeline shuffles bounded token
    aggregates with the part sizes and totals broadcast."""
    for name, max_sh in (("p5_gopher_gate", 0),
                         ("x149_rbo", 1),
                         ("e30_peak_concurrency", 1),
                         ("x150_kendall_tau", 2),
                         ("x152_k_anonymity", 1),
                         ("e31_pattern_negation", 1),
                         ("e32_decay_attribution", 3),
                         ("x153_srm_check", 3),
                         ("e33_hourly_xcorr", 2),
                         ("e34_cusum_changepoint", 3),
                         ("e35_kaplan_meier", 5),
                         ("x154_stratified_uplift", 2),
                         ("e36_seasonal_backtest", 3),
                         ("x151_term_dispersion", 7)):
        assert shuffle_count(q(spark, name)) <= max_sh, name
    assert_no_cartesian(q(spark, "x150_kendall_tau"))


def _cached_leaf_builders(df):
    """{output-name-signature: set(cacheBuilder hashes)} over the
    InMemoryRelation leaves of the EXECUTED (cache-substituted) plan."""
    plan = df._jdf.queryExecution().withCachedData()
    leaves = plan.collectLeaves()
    sigs: dict[str, set] = {}
    for i in range(leaves.size()):
        node = leaves.apply(i)
        if node.getClass().getSimpleName() != "InMemoryRelation":
            continue
        out = node.output()
        sig = ",".join(sorted(out.apply(j).name()
                              for j in range(out.size())))
        sigs.setdefault(sig, set()).add(node.cacheBuilder().hashCode())
    return sigs


def test_drop_contained_pairs_cached_once(spark):
    """x71's 154 static exchanges collapse at runtime ONLY because the
    containment-pairs subtree is persisted and all four consumers (the
    mutual self-join's two sides + two drop-set branches) read ONE
    cache (round-8 verdict ask #6). Receipt: every pairs-schema
    InMemoryRelation leaf in the executed plan shares a single
    CachedRDDBuilder — a refactor that drops the persist (no cached
    leaf) or rebuilds the subtree per consumer (>1 builder) fails."""
    df = q(spark, "x71_drop_contained")
    df.collect()
    sigs = _cached_leaf_builders(df)
    pairs = [b for s, b in sigs.items() if "contained_id" in s]
    assert pairs, f"pairs subtree no longer cached: {sorted(sigs)}"
    assert all(len(b) == 1 for b in pairs), sigs


def test_lpa_pagerank_edge_frame_partitioning_pinned(spark):
    """The iterative graph operators must NOT re-exchange the edge
    frame every round: pin_partitioning persists a repartition whose
    hash partitioning the per-round joins reuse (a checkpoint alone
    reports UnknownPartitioning under AQE — the round-8 regression
    this guards against). Receipt: in a 2-round LPA plan (below the
    checkpoint cadence, so the rounds stay visible) no Exchange on the
    edge key sits above an InMemoryTableScan."""
    from data_ingest_spark.operators import clustering as cl
    edges = (spark.range(20000)
             .select((F.col("id") % 500).cast("string").alias("src"),
                     ((F.col("id") * 13) % 500).cast("string").alias("dst"),
                     F.lit(1.0).alias("snn_weight")))
    out = cl.label_propagation(edges, max_iter=2, checkpoint_every=99)
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    lines = plan.splitlines()
    for i, ln in enumerate(lines):
        if "InMemoryTableScan" not in ln:
            continue
        depth = len(ln) - len(ln.lstrip(" :+-*("))
        for j in range(i - 1, max(0, i - 4), -1):
            up = lines[j]
            if "Exchange hashpartitioning(dst" in up and \
                    "REPARTITION_BY_COL" not in up:
                raise AssertionError(
                    f"edge frame re-exchanged above its cache:\n{up}")
    # and the cache itself exists exactly once
    sigs = _cached_leaf_builders(out)
    edge_sigs = [b for s, b in sigs.items() if "snn_weight" in s]
    assert edge_sigs and all(len(b) == 1 for b in edge_sigs), sigs


def test_round7_batch_bounded_shuffles(spark):
    """Round-7 plan pins. e37's CORPUS work is ONE per-user aggregate;
    its other six exchanges (three ntile sorts on the constant key +
    the segment rollup) all move the tiny per-user table, bounded by
    |users|; e38/e39 are one per-user window + bounded
    aggregates; x155's benchmark position set broadcasts (the only
    corpus shuffles are the shingle distinct + per-doc rollups);
    x156 computes every k from ONE per-task aggregate (an explode,
    never a per-k union re-deriving the corpus scan); x157/x158 are
    census aggregates."""
    for name, max_sh in (("e37_rfm_segments", 7),
                         ("e38_markov_transitions", 3),
                         ("e39_session_paths", 2),
                         ("x155_bloom_decontam", 5),
                         ("x156_pass_at_k", 2),
                         ("x157_calibration_ece", 3),
                         ("x158_benford", 2)):
        assert shuffle_count(q(spark, name)) <= max_sh, name
        assert_no_cartesian(q(spark, name))
    # x155: the bench position set must reach the corpus via a
    # broadcast join, never a shuffle join
    assert broadcast_join_count(q(spark, "x155_bloom_decontam")) >= 1


def test_arrow_local_relations_never_touch_python(spark):
    """Round-9 pin: small driver-built tables must enter plans as
    Arrow LocalTableScan relations, not as pickled-list RDD scans —
    the list form pays one Python-worker round-trip per slice on
    EVERY action over the table (~4.5 s of executor time per noop
    save of an 8-row table on local[32], measured). Covers the shared
    helper and the two hottest call sites (the BPE merge table and
    the IVF probe list build their frames through it)."""
    from data_ingest_spark.functions.localrel import arrow_local_df

    df = arrow_local_df(spark, [(1, "a"), (2, "b")],
                        "id long, v string", ["id", "v"])
    plan = physical_plan(df)
    assert "LocalTableScan" in plan or "Scan OneRowRelation" in plan
    assert "ExistingRDD" not in plan
    assert df.collect() == [(1, "a"), (2, "b")]
    # empty input keeps the declared schema
    empty = arrow_local_df(spark, [], "id long, v string", ["id", "v"])
    assert empty.schema.simpleString() == "struct<id:bigint,v:string>"
    assert empty.count() == 0
