"""Evaluation and label-aggregation operators for training-data work.

Three primitives a large-scale data/eval pipeline needs beyond the
reference's analytics surface:

- ``ranking_metrics``: per-group MRR and NDCG@k over a scored result
  list — the retrieval-quality gate run over embedding-search output
  before an index is promoted.
- ``majority_vote``: aggregate multiple annotator votes per item into
  a single label with a deterministic tiebreak and an agreement score
  — the RLHF / labeling-QA primitive.
- ``preference_pairs``: build (chosen, rejected) preference pairs per
  prompt group from scored completions — the DPO/RM training-data
  shape.

All three are single-shuffle grouped aggregations (plus one window for
ranking), no UDFs, and hash-match DuckDB oracles exactly: the NDCG
discount weights are precomputed as scaled int64 constants
(``round(1e9 / log2(r+1))``) so the DCG sum is exact integer
arithmetic in both engines — no cross-engine libm log2 drift — and
only the final normalization divides (the same int64s, hence the same
double) on each side.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window as W, functions as F

#: Fixed-point scale for DCG discount weights.
DCG_SCALE = 10**9


def dcg_weights_fp(k: int) -> list[int]:
    """Scaled-integer DCG discounts: w[r] = round(1e9 / log2(r+1))."""
    return [round(DCG_SCALE / math.log2(r + 1)) for r in range(1, k + 1)]


def idcg_prefix_fp(k: int) -> list[int]:
    """Ideal-DCG prefix sums over the scaled discounts (m relevant
    items in the top-k ideally occupy ranks 1..m)."""
    out, acc = [], 0
    for w in dcg_weights_fp(k):
        acc += w
        out.append(acc)
    return out


def ranking_metrics(df: DataFrame, group_col: str = "user_id",
                    score_col: str = "value", id_col: str = "event_id",
                    rel_col: str = "relevant", k: int = 10) -> DataFrame:
    """Per-group retrieval metrics over a scored candidate list.

    Ranks candidates within each group by (score desc, id asc — fully
    deterministic), then emits one row per group: the rank of the
    first relevant hit, the relevant count, reciprocal rank, and
    binary-relevance NDCG@k. Groups with no relevant candidate get
    rr = ndcg = 0.0 and a NULL first rank.

    Plan: one window + one grouped aggregation — a single shuffle on
    ``group_col``. At 100 TB the group key (query id) partitions
    evenly by construction; no global sort, no driver state.
    """
    wts = dcg_weights_fp(k)
    idcg = idcg_prefix_fp(k)
    warr = F.array(*[F.lit(x).cast("long") for x in wts])
    iarr = F.array(*[F.lit(x).cast("long") for x in idcg])
    w = W.partitionBy(group_col).orderBy(F.col(score_col).desc(),
                                         F.col(id_col).asc())
    rel = F.col(rel_col)
    per = (df.withColumn("_rk", F.row_number().over(w))
           .groupBy(group_col)
           .agg(F.min(F.when(rel, F.col("_rk"))).cast("int")
                .alias("first_rel_rank"),
                F.sum(F.when(rel & (F.col("_rk") <= k),
                             F.element_at(warr, F.col("_rk")))
                      .otherwise(F.lit(0).cast("long")))
                .alias("_dcg_fp"),
                F.sum(F.when(rel, 1).otherwise(0)).cast("long")
                .alias("n_relevant")))
    m = F.greatest(F.least(F.col("n_relevant"), F.lit(k)), F.lit(1))
    return per.select(
        group_col, "first_rel_rank", "n_relevant",
        F.round(F.when(F.col("first_rel_rank").isNotNull(),
                       F.lit(1.0) / F.col("first_rel_rank"))
                .otherwise(0.0), 9).alias("rr"),
        F.round(F.when(F.col("n_relevant") > 0,
                       F.col("_dcg_fp") / F.element_at(iarr, m.cast("int")))
                .otherwise(0.0), 9).alias("ndcg_k"),
    )


def majority_vote(df: DataFrame, item_col: str = "item",
                  label_col: str = "label") -> DataFrame:
    """Aggregate annotator votes: one row per item with the majority
    label (ties broken by label ascending — deterministic), its vote
    count, the total votes, and the agreement ratio.

    Two grouped passes fused into one shuffle: count per (item, label),
    then a per-item window picks the winner and sums the total — the
    window reuses the groupBy's hash partitioning on ``item_col``
    (Catalyst sees the child distribution, no second exchange).
    """
    counts = df.groupBy(item_col, label_col).agg(
        F.count("*").alias("votes"))
    w = W.partitionBy(item_col).orderBy(F.col("votes").desc(),
                                        F.col(label_col).asc())
    return (counts
            .withColumn("_rk", F.row_number().over(w))
            .withColumn("total_votes",
                        F.sum("votes").over(W.partitionBy(item_col)))
            .filter(F.col("_rk") == 1)
            .select(F.col(item_col),
                    F.col(label_col).alias("majority_label"),
                    F.col("votes").cast("long").alias("votes"),
                    F.col("total_votes").cast("long").alias("total_votes"),
                    F.round(F.col("votes") / F.col("total_votes"), 9)
                    .alias("agreement")))


def wilson_winrate(df: DataFrame, group_col: str = "user_id",
                   outcome_col: str = "event_type",
                   win_value: str = "purchase", loss_value: str = "click",
                   z: float = 1.96, top_k: int = 50) -> DataFrame:
    """Rank items (models, prompts, documents) from binary preference
    outcomes by the Wilson score lower confidence bound on win rate —
    the standard guard against promoting an item that won 2/2 over one
    that won 90/100. Emits wins, losses, n, the raw rate, and the LCB;
    keeps the ``top_k`` best by (LCB desc, id asc).

    One grouped aggregation (conditional counts) then scalar math:
      lcb = (p + z²/2n − z·√((p(1−p) + z²/4n)/n)) / (1 + z²/n)
    All terms are +,·,/ on exact integers plus one √ — rounded to 6dp
    before the rank so a last-ulp √ difference can't flip the cut
    (the repo's m12/m9 rounding convention)."""
    wins = F.sum(F.when(F.col(outcome_col) == win_value, 1)
                 .otherwise(0)).cast("long")
    losses = F.sum(F.when(F.col(outcome_col) == loss_value, 1)
                   .otherwise(0)).cast("long")
    agg = (df.filter(F.col(outcome_col).isin(win_value, loss_value))
           .groupBy(group_col)
           .agg(wins.alias("wins"), losses.alias("losses")))
    n = (F.col("wins") + F.col("losses")).cast("double")
    p = F.col("wins").cast("double") / n
    z2 = z * z
    lcb = ((p + z2 / (2.0 * n)
            - z * F.sqrt((p * (1.0 - p) + z2 / (4.0 * n)) / n))
           / (1.0 + z2 / n))
    scored = (agg.filter(n > 0)
              .withColumn("n", n.cast("long"))
              .withColumn("win_rate", F.round(p, 6))
              .withColumn("wilson_lcb", F.round(lcb, 6)))
    # two-pass global rank (the dense_ids_scalable pattern): partition
    # the sort by a coarse bucket monotone in the key — floor(lcb·32),
    # ≤ 33 buckets — rank within buckets in parallel, then shift by
    # the collected per-bucket prefix sums. No unpartitioned window.
    scored = scored.withColumn(
        "_cb", F.floor(F.col("wilson_lcb") * 32).cast("long"))
    sizes = (scored.groupBy("_cb").agg(F.count("*").alias("n"))
             .orderBy(F.col("_cb").desc()).collect())
    offsets, acc = {}, 0
    for r in sizes:
        offsets[r["_cb"]] = acc
        acc += r["n"]
    if not offsets:
        return (scored.withColumn("rank", F.lit(1)).filter(F.lit(False))
                .drop("_cb"))
    offmap = F.create_map(*[F.lit(x) for kv in offsets.items() for x in kv])
    w = W.partitionBy("_cb").orderBy(F.col("wilson_lcb").desc(),
                                     F.col(group_col).asc())
    return (scored
            .withColumn("rank",
                        (F.row_number().over(w) + offmap[F.col("_cb")])
                        .cast("int"))
            .filter(F.col("rank") <= top_k).drop("_cb"))


def preference_pairs(df: DataFrame, group_col: str = "user_id",
                     score_col: str = "value",
                     id_col: str = "event_id") -> DataFrame:
    """Build (chosen, rejected) preference pairs from scored
    completions: per group, chosen = highest score (ties → smallest
    id), rejected = lowest score (ties → largest id); groups whose
    best and worst scores are equal produce no pair.

    One grouped aggregation — a single shuffle — using struct-ordered
    min/max (score first, then negated id) instead of two window
    passes, so the 100 TB plan is a plain partial-aggregated groupBy.
    """
    negid = (-F.col(id_col)).cast("long")
    best = F.max(F.struct(F.col(score_col).alias("s"),
                          negid.alias("negid")))
    worst = F.min(F.struct(F.col(score_col).alias("s"),
                           negid.alias("negid")))
    agg = df.groupBy(group_col).agg(best.alias("_b"), worst.alias("_w"))
    return (agg.filter(F.col("_b.s") > F.col("_w.s"))
            .select(F.col(group_col),
                    (-F.col("_b.negid")).cast("long").alias("chosen_id"),
                    (-F.col("_w.negid")).cast("long").alias("rejected_id"),
                    F.round(F.col("_b.s") - F.col("_w.s"), 9)
                    .alias("margin")))


def rrf_fuse(lex: DataFrame, sem: DataFrame, id_col: str = "doc_id",
             lex_score: str = "lex_score", sem_score: str = "sem_score",
             k0: int = 60, n_candidates: int = 100) -> DataFrame:
    """Reciprocal-rank fusion of a lexical and a semantic ranking —
    the standard hybrid-retrieval merge (BM25 + embedding search)
    used to build RAG / retrieval training corpora. Each side
    contributes its top-``n_candidates`` documents ranked by
    (score desc, id asc); a document's fused score is
    ``sum over lists containing it of 1/(k0 + rank)`` (Cormack et
    al.'s RRF with the conventional k0 = 60), and the output carries
    both source ranks (NULL when only one list has the doc), the
    fused score (6dp) and the fused rank.

    Plan shape: each side's candidate cut is a distributed
    TakeOrderedAndProject (map-side top-k, no global sort, no
    window over the corpus); ranks over the *bounded* candidate
    lists use the two-pass grouped-offset rank (no unpartitioned
    window), the two lists meet in one full outer join over ≤
    2·n_candidates rows, and every float is a fixed two-term IEEE
    sum — deterministic across engines.
    """
    from data_ingest_spark.operators.windows import dense_ids_scalable

    def _ranked(side: DataFrame, score: str, out: str) -> DataFrame:
        cand = (side.select(id_col, score)
                .orderBy(F.col(score).desc(), F.col(id_col).asc())
                .limit(n_candidates)
                .withColumn("_neg", -F.col(score)))
        ranked = dense_ids_scalable(cand, order=["_neg", id_col],
                                    id_col="_r")
        return ranked.select(
            F.col(id_col),
            (F.col("_r") + 1).cast("long").alias(out))

    la = _ranked(lex, lex_score, "lex_rank")
    sb = _ranked(sem, sem_score, "sem_rank")
    fused = (la.join(sb, [id_col], "full_outer")
             .select(id_col, "lex_rank", "sem_rank"))
    term_a = F.lit(1.0) / (F.lit(k0) + F.col("lex_rank"))
    term_b = F.lit(1.0) / (F.lit(k0) + F.col("sem_rank"))
    scored = fused.withColumn(
        "rrf", F.round(F.coalesce(term_a, F.lit(0.0))
                       + F.coalesce(term_b, F.lit(0.0)), 6))
    final = dense_ids_scalable(
        scored.withColumn("_negf", -F.col("rrf")),
        order=["_negf", id_col], id_col="_fr")
    return (final.select(
        id_col, "lex_rank", "sem_rank", "rrf",
        (F.col("_fr") + 1).cast("long").alias("fused_rank")))


#: LCM(1..10): every reciprocal rank 1/r with r ≤ 10 scales to an
#: exact integer — the fixed-point discipline that makes jackknife
#: sums summation-order-independent.
RR_SCALE = 2520


def mrr_jackknife(df: DataFrame, group_col: str = "user_id",
                  score_col: str = "value", id_col: str = "event_id",
                  rel_col: str = "relevant", k: int = 10,
                  rr_scale: int = RR_SCALE) -> DataFrame:
    """MRR@k with a leave-one-query-out jackknife standard error and
    95% CI — the error bar an eval report needs before claiming one
    retrieval run beats another. Returns ONE row:
    ``(n_queries, mrr, se_jack, ci_lo, ci_hi)``.

    Exactness: reciprocal ranks are fixed-pointed (``rr_scale`` must
    be divisible by 1..k), so the MRR numerator S and the jackknife
    spread Q = Σ(S − n·rr_i)² are exact int64 — the identity
    θ_{-i} − θ̄ = (S − n·rr_i)/(n(n−1)·scale) turns the whole CI into
    two integer aggregates and a handful of pinned double ops; the
    only libm call is one sqrt. (Int64 bound: Q ≤ n³·scale² — fine to
    ~10⁷ queries; past that, cast the two sums to DECIMAL(38,0).)

    Plan: one window + three bounded aggregations (per-group rank,
    then (n, S), then Q against the broadcast totals) — a single
    corpus shuffle on the query key."""
    assert all(rr_scale % r == 0 for r in range(1, k + 1)), \
        "rr_scale must be divisible by every rank 1..k"
    w = W.partitionBy(group_col).orderBy(F.col(score_col).desc(),
                                         F.col(id_col).asc())
    per = (df.withColumn("_rk", F.row_number().over(w))
           .groupBy(group_col)
           .agg(F.min(F.when(F.col(rel_col), F.col("_rk")))
                .alias("_frr")))
    rr = per.select(
        F.when(F.col("_frr").isNotNull() & (F.col("_frr") <= k),
               F.expr(f"{int(rr_scale)} div _frr"))
        .otherwise(0).cast("long").alias("_rr"))
    t = rr.agg(F.count("*").cast("long").alias("_n"),
               F.sum("_rr").cast("long").alias("_s"))
    d = F.col("_s") - F.col("_n") * F.col("_rr")
    q = (rr.crossJoin(F.broadcast(t))
         .agg(F.sum(d * d).cast("long").alias("_qq"),
              F.first("_n").alias("_n"), F.first("_s").alias("_s")))
    mrr_d = F.col("_s").cast("double") / (F.col("_n") * rr_scale)
    se_d = F.when(
        F.col("_n") > 1,
        F.sqrt(F.col("_qq").cast("double") * (F.col("_n") - 1)
               / F.col("_n"))
        / (F.col("_n").cast("double") * (F.col("_n") - 1) * rr_scale)
    ).otherwise(F.lit(0.0))
    u = q.select(F.col("_n").alias("n_queries"),
                 mrr_d.alias("_mrr"), se_d.alias("_se"))
    return u.select(
        "n_queries", F.round("_mrr", 9).alias("mrr"),
        F.round("_se", 9).alias("se_jack"),
        F.round(F.col("_mrr") - 1.96 * F.col("_se"), 9).alias("ci_lo"),
        F.round(F.col("_mrr") + 1.96 * F.col("_se"), 9).alias("ci_hi"))


def classification_report(df: DataFrame, gold_col: str = "gold",
                          pred_col: str = "pred") -> DataFrame:
    """Per-class precision / recall / F1 / support from a
    (gold, pred) pair table — the standard classifier eval report.
    Returns one row per label seen in EITHER column:
    ``(label, n_gold, n_pred, tp, precision, recall, f1)``.

    Exactness: every metric is a single long/long division of exact
    counts — F1 uses the identity 2pr/(p+r) = 2·tp/(n_gold + n_pred),
    so no intermediate float ever feeds another division. Zero
    denominators report 0.0 (absent class conventions).

    Plan: ONE groupBy(gold, pred) census shuffle (bounded by
    |classes|²); marginals and the label spine derive from that tiny
    aggregate."""
    cm = (df.groupBy(F.col(gold_col).alias("_g"),
                     F.col(pred_col).alias("_p"))
          .agg(F.count("*").cast("long").alias("_c"))
          .localCheckpoint(eager=False))
    gold = cm.groupBy(F.col("_g").alias("label")).agg(
        F.sum("_c").cast("long").alias("n_gold"))
    pred = cm.groupBy(F.col("_p").alias("label")).agg(
        F.sum("_c").cast("long").alias("n_pred"))
    tp = (cm.filter(F.col("_g") == F.col("_p"))
          .select(F.col("_g").alias("label"),
                  F.col("_c").alias("tp")))
    rep = (gold.join(pred, "label", "full")
           .join(tp, "label", "left")
           .fillna({"n_gold": 0, "n_pred": 0, "tp": 0}))
    prec = F.when(F.col("n_pred") > 0,
                  F.col("tp") / F.col("n_pred")).otherwise(0.0)
    rec = F.when(F.col("n_gold") > 0,
                 F.col("tp") / F.col("n_gold")).otherwise(0.0)
    f1 = F.when(F.col("n_gold") + F.col("n_pred") > 0,
                2 * F.col("tp") / (F.col("n_gold") + F.col("n_pred"))
                ).otherwise(0.0)
    return rep.select("label", "n_gold", "n_pred",
                      F.col("tp").cast("long").alias("tp"),
                      F.round(prec, 9).alias("precision"),
                      F.round(rec, 9).alias("recall"),
                      F.round(f1, 9).alias("f1"))


def auc_rank(df: DataFrame, label_col: str = "label",
             score_col: str = "score",
             coarse=None) -> DataFrame:
    """Exact ROC-AUC via the Mann-Whitney rank-sum identity, with
    midrank tie handling — the standard classifier-quality gate run
    over scored eval sets before a model/ranker is promoted.

    AUC = (R_pos - n_pos(n_pos+1)/2) / (n_pos·n_neg) where R_pos is
    the sum of (mid)ranks of the positive class. Everything up to the
    single final division is integer: doubling the midranks makes them
    whole (2·midrank = 2·below + cnt + 1), and the sums accumulate as
    DECIMAL(38,0) so corpus-scale row counts (R_pos grows as n²) don't
    overflow int64. Returns one row
    ``(n_pos, n_neg, n_ties_groups, auc, gini)`` with auc/gini rounded
    to 9 dp — hash-exact against a DuckDB oracle built from the same
    integers.

    Plan: ONE groupBy(score) census shuffle, then the
    ``ntile_scalable`` coarse-bucket trick for the global cumulative —
    rank within each coarse score bucket (parallel windows), shift by
    driver-collected per-bucket totals (one tiny row per bucket) — and
    a single global aggregate. No unpartitioned window, no collect of
    anything unbounded. ``coarse`` must be a Column MONOTONE in the
    score with modest cardinality (default ``floor(score * 32)``).

    NULL scores are EXCLUDED (an unscored row has no rank; keeping it
    would also surface as a null coarse-bucket map key, which Spark
    rejects at runtime) — mirror the filter in any oracle."""
    df = df.filter(F.col(score_col).isNotNull())
    lab = F.col(label_col).cast("long")
    census = (df.groupBy(F.col(score_col).alias("_s"))
              .agg(F.count("*").cast("long").alias("_cnt"),
                   F.sum(lab).cast("long").alias("_pos")))
    cb = coarse if coarse is not None else F.floor(F.col("_s") * 32)
    census = census.withColumn("_cb", cb.cast("long"))
    sizes = (census.groupBy("_cb").agg(F.sum("_cnt").alias("n"))
             .orderBy("_cb").collect())
    offsets, acc = {}, 0
    for r in sizes:
        offsets[r["_cb"]] = acc
        acc += r["n"]
    if not offsets:
        return df.sparkSession.createDataFrame(
            [(0, 0, 0, 0.0, 0.0)],
            "n_pos long, n_neg long, n_tie_groups long, "
            "auc double, gini double")
    offmap = F.create_map(*[F.lit(x) for kv in offsets.items() for x in kv])
    w = (W.partitionBy("_cb").orderBy("_s")
         .rowsBetween(W.unboundedPreceding, -1))
    below = (F.coalesce(F.sum("_cnt").over(w), F.lit(0))
             + offmap[F.col("_cb")])
    # 2·R_pos contribution of a tie group: pos · (2·below + cnt + 1)
    contrib = (F.col("_pos").cast("decimal(38,0)")
               * (2 * below + F.col("_cnt") + 1).cast("decimal(38,0)"))
    agg = (census.withColumn("_r2", contrib)
           .agg(F.sum("_pos").cast("decimal(38,0)").alias("np"),
                F.sum(F.col("_cnt") - F.col("_pos"))
                .cast("decimal(38,0)").alias("nn"),
                F.sum("_r2").alias("r2"),
                F.sum(F.when(F.col("_cnt") > 1, 1).otherwise(0))
                .cast("long").alias("n_tie_groups")))
    auc = ((F.col("r2") - F.col("np") * (F.col("np") + 1))
           .cast("double")
           / (2 * F.col("np") * F.col("nn")).cast("double"))
    auc = F.when((F.col("np") > 0) & (F.col("nn") > 0), auc).otherwise(0.0)
    return agg.select(F.col("np").cast("long").alias("n_pos"),
                      F.col("nn").cast("long").alias("n_neg"),
                      "n_tie_groups",
                      F.round(auc, 9).alias("auc"),
                      F.round(2 * auc - 1, 9).alias("gini"))


def calibration_bins(df: DataFrame, label_col: str = "label",
                     p_col: str = "p", bins: int = 10) -> DataFrame:
    """Reliability-diagram bins: bucket predictions into ``bins`` equal
    probability bins and report, per bin, the exact mean predicted
    probability vs the exact empirical positive rate — the calibration
    check (ECE is one weighted sum over these rows).

    Exactness: predictions quantize to fixed-point (p·1e6 as int64)
    BEFORE summing, so mean_p is a single decimal/long division and
    frac_pos is a count ratio — both hash-exact cross-engine. One
    groupBy(bin) shuffle, output bounded by ``bins``."""
    p_fp = F.round(F.col(p_col) * 1000000).cast("long")
    b = F.least(F.floor(F.col(p_col) * bins), F.lit(bins - 1)).cast("int")
    agg = (df.groupBy(b.alias("bin"))
           .agg(F.count("*").cast("long").alias("n"),
                F.sum(F.col(label_col).cast("long"))
                .cast("long").alias("n_pos"),
                F.sum(p_fp).cast("decimal(38,0)").alias("sp")))
    mean_p = (F.col("sp").cast("double")
              / (F.col("n").cast("double") * 1000000.0))
    frac = F.col("n_pos") / F.col("n")
    return (agg.select("bin", "n", "n_pos",
                       F.round(mean_p, 9).alias("mean_p"),
                       F.round(frac, 9).alias("frac_pos"),
                       F.round(F.abs(mean_p - frac), 9).alias("gap"))
            .orderBy("bin"))


def cohens_kappa(df: DataFrame, a_col: str = "rater_a",
                 b_col: str = "rater_b") -> DataFrame:
    """Cohen's kappa for two-annotator agreement over a shared label
    set — the labeling-QA statistic behind inter-rater reliability
    gates. kappa = (p_o - p_e)/(1 - p_e) computed as the single exact
    division (n·agree - Σ r_i·c_i) / (n² - Σ r_i·c_i): the marginal
    products accumulate as DECIMAL(38,0) (n² overflows int64 exactly
    at corpus scale), so no float feeds a float. Returns one row
    ``(n, n_agree, n_labels, kappa)``.

    Plan: ONE groupBy(a, b) census shuffle bounded by |labels|²; the
    marginals and their product join derive from that tiny frame."""
    cm = (df.groupBy(F.col(a_col).alias("_a"), F.col(b_col).alias("_b"))
          .agg(F.count("*").cast("long").alias("_c"))
          .localCheckpoint(eager=False))
    ra = cm.groupBy(F.col("_a").alias("_l")).agg(
        F.sum("_c").cast("decimal(38,0)").alias("_ra"))
    rb = cm.groupBy(F.col("_b").alias("_l")).agg(
        F.sum("_c").cast("decimal(38,0)").alias("_rb"))
    pe = (ra.join(rb, "_l", "full")
          .agg(F.sum(F.coalesce(F.col("_ra"), F.lit(0).cast("decimal(38,0)"))
                     * F.coalesce(F.col("_rb"),
                                  F.lit(0).cast("decimal(38,0)")))
               .alias("_sumrc"),
               F.count("*").cast("long").alias("n_labels")))
    tot = cm.agg(F.sum("_c").cast("decimal(38,0)").alias("_n"),
                 F.sum(F.when(F.col("_a") == F.col("_b"), F.col("_c"))
                       .otherwise(0)).cast("decimal(38,0)").alias("_agree"))
    j = tot.crossJoin(pe)
    num = (F.col("_n") * F.col("_agree") - F.col("_sumrc")).cast("double")
    den = (F.col("_n") * F.col("_n") - F.col("_sumrc")).cast("double")
    kappa = F.when(den != 0, num / den).otherwise(0.0)
    return j.select(F.col("_n").cast("long").alias("n"),
                    F.col("_agree").cast("long").alias("n_agree"),
                    "n_labels",
                    F.round(kappa, 9).alias("kappa"))


def last_touch_attribution(events: DataFrame, user_col: str = "user_id",
                           ts_col: str = "ts",
                           type_col: str = "event_type",
                           convert_type: str = "purchase",
                           seq_col: str = "event_id") -> DataFrame:
    """Last-touch conversion attribution: every conversion event is
    credited to the type of the user's most recent PRECEDING
    non-conversion event (order: timestamp, then the sequence column
    as the deterministic tie-break); conversions with no prior touch
    credit 'direct'. The point-in-time-correct formulation — the
    running last-touch is a window over each user's own history, so
    no future event can leak into the credit.

    One window per user partition + one bounded groupBy (touch types).
    Returns ``(touch_type, n_conversions, share)``.
    """
    w = (W.partitionBy(user_col)
         .orderBy(F.col(ts_col).asc(), F.col(seq_col).asc())
         .rowsBetween(W.unboundedPreceding, -1))
    touch = F.last(
        F.when(F.col(type_col) != convert_type, F.col(type_col)),
        ignorenulls=True).over(w)
    conv = (events.withColumn("_touch", touch)
            .filter(F.col(type_col) == convert_type)
            .select(F.coalesce("_touch", F.lit("direct"))
                    .alias("touch_type")))
    tot = conv.agg(F.count("*").cast("double").alias("_n"))
    return (conv.groupBy("touch_type")
            .agg(F.count("*").cast("long").alias("n_conversions"))
            .crossJoin(F.broadcast(tot))
            .select("touch_type", "n_conversions",
                    F.round(F.col("n_conversions") / F.col("_n"), 6)
                    .alias("share")))


def window_funnel(events: DataFrame, steps: list[str],
                  window_sec: int = 604800, user_col: str = "user_id",
                  ts_col: str = "ts",
                  type_col: str = "event_type") -> DataFrame:
    """Time-bound ordered funnel depth (the windowFunnel analytic):
    per user, walk the greedy earliest chain -- t1 = first step-1
    event, then each t_{i+1} = first step-(i+1) event strictly after
    t_i -- and count how many steps complete within ``window_sec`` of
    t1. Greedy-earliest makes the chain (and therefore the result)
    deterministic and engine-checkable, where "any chain" semantics
    are search-order dependent. Returns the depth histogram
    ``(funnel_depth, n_users)`` over users that started step 1.

    ONE scan and ONE shuffle regardless of ``len(steps)``: filter to
    the step types (pushed to the scan), groupBy(user) collecting the
    time-sorted (ts, step) list, then a linear ``F.aggregate`` fold
    walks the greedy chain -- a left-to-right pass over time-sorted
    events advances at the first qualifying next-step event, which IS
    the per-step min the chain definition asks for. (The previous
    shape joined a grouped-min back per step: len(steps) shuffles and
    re-scans with lineage growing quadratically in the step count --
    the wrong shape for a 20-step funnel at 100 TB.) Per-user state
    is bounded by that user's funnel-step events, the same posture as
    the session/attribution aggregates.
    """
    from data_ingest_spark.functions.stats import epoch_seconds
    idx_map = F.create_map(*[F.lit(x) for i, s in enumerate(steps, 1)
                             for x in (s, i)])
    ev = (events.filter(F.col(type_col).isin(list(steps)))
          .select(F.col(user_col),
                  F.struct(epoch_seconds(F.col(ts_col)).alias("ts"),
                           idx_map[F.col(type_col)].cast("int")
                           .alias("idx")).alias("_e")))
    per_user = (ev.groupBy(user_col)
                .agg(F.sort_array(F.collect_list("_e")).alias("_es")))
    zero = F.struct(F.lit(0).alias("depth"),
                    F.lit(0.0).alias("t1"), F.lit(0.0).alias("tprev"))

    def _step(acc, e):
        start = (acc["depth"] == 0) & (e["idx"] == 1)
        adv = ((acc["depth"] > 0) & (e["idx"] == acc["depth"] + 1)
               & (e["ts"] > acc["tprev"])
               & (e["ts"] - acc["t1"] <= F.lit(float(window_sec))))
        return (F.when(start, F.struct(
                    F.lit(1).alias("depth"), e["ts"].alias("t1"),
                    e["ts"].alias("tprev")))
                .when(adv, F.struct(
                    (acc["depth"] + 1).alias("depth"),
                    acc["t1"].alias("t1"), e["ts"].alias("tprev")))
                .otherwise(acc))

    depth = F.aggregate("_es", zero, _step)["depth"]
    return (per_user.select(depth.alias("_d"))
            .filter(F.col("_d") >= 1)
            .groupBy(F.col("_d").cast("long").alias("funnel_depth"))
            .agg(F.count("*").cast("long").alias("n_users")))


def rbo_suffix_weights(k: int = 10, p: float = 0.9) -> list[float]:
    """Truncated rank-biased-overlap suffix weights: W[m] = Σ_{d=m..k}
    (1−p)·p^(d−1)/d, each term rounded to 9dp BEFORE summing so both
    engines consume identical literals (the dcg_weights_fp
    convention). An item appearing at ranks (ra, rb) in the two lists
    is inside the depth-d intersection for every d ≥ max(ra, rb), so
    truncated RBO = Σ_items W[max(ra, rb)] — one literal lookup per
    common item, no per-depth loop."""
    w = [round((1 - p) * p ** (d - 1) / d, 9) for d in range(1, k + 1)]
    return [round(sum(w[m:]), 9) for m in range(k)]


def rbo_overlap(df: DataFrame, group_col: str = "user_id",
                item_col: str = "event_id", score_a: str = "value",
                score_b: str = "ts", k: int = 10,
                p: float = 0.9) -> DataFrame:
    """Truncated rank-biased overlap (Webber 2010) between two top-k
    rankings of each group's items — here "by score_a" vs "by
    score_b" (e.g. engagement vs recency): the standard top-weighted
    comparison of two retrieval/ranking policies, ∈ [0, 1].

    Determinism: ranks are row_number with the item id as tie-break;
    the geometric weights are driver-side literals (see
    :func:`rbo_suffix_weights`); the score is Σ of ≤ k literal
    lookups, rounded 6dp.

    One shuffle on the group key (two in-partition windows), one
    self-join of two k-row-per-group frames — bounded state per
    group at any scale."""
    wsuf = rbo_suffix_weights(k, p)
    wmap = F.array(*[F.lit(x) for x in wsuf])
    wa = W.partitionBy(group_col).orderBy(F.col(score_a).desc(),
                                          F.col(item_col).asc())
    wb = W.partitionBy(group_col).orderBy(F.col(score_b).desc(),
                                          F.col(item_col).asc())
    ranked = (df.withColumn("_ra", F.row_number().over(wa))
              .withColumn("_rb", F.row_number().over(wb))
              .filter((F.col("_ra") <= k) | (F.col("_rb") <= k)))
    common = ranked.filter((F.col("_ra") <= k) & (F.col("_rb") <= k))
    contrib = wmap[F.greatest("_ra", "_rb") - 1]
    return (common.groupBy(group_col)
            .agg(F.count("*").cast("long").alias("n_common"),
                 F.round(F.sum(contrib), 6).alias("rbo")))


def kendall_tau_b(df: DataFrame, group_col: str = "user_id",
                  id_col: str = "event_id", x_col: str = "value",
                  y_col: str = "_y") -> DataFrame:
    """Kendall τ-b rank correlation between two measures within each
    group, tie-corrected: τ-b = (C − D) / √((n₀−n₁)(n₀−n₂)) with n₀ =
    n(n−1)/2 and n₁/n₂ the tied-pair counts in x/y. The
    pairwise-agreement complement to Theil–Sen (x122) and
    Mann-Whitney (x133).

    All counts are exact integers from a within-group pair self-join
    (id < id — pair count is Σ n_g², bounded by the group key, never
    corpus-quadratic); the only floating math is one sqrt-divide,
    rounded 6dp."""
    base = df.select(group_col, F.col(id_col).alias("_i"),
                     F.col(x_col).alias("_x"), F.col(y_col).alias("_yy"))
    a = base.select(group_col, F.col("_i").alias("_ia"),
                    F.col("_x").alias("_xa"), F.col("_yy").alias("_ya"))
    b = base.select(group_col, F.col("_i").alias("_ib"),
                    F.col("_x").alias("_xb"), F.col("_yy").alias("_yb"))
    pairs = a.join(b, group_col).filter(F.col("_ia") < F.col("_ib"))
    sx = F.signum(F.col("_xa") - F.col("_xb"))
    sy = F.signum(F.col("_ya") - F.col("_yb"))
    agg = pairs.groupBy(group_col).agg(
        F.count("*").alias("n0"),
        F.sum(F.when(sx * sy > 0, 1).otherwise(0)).alias("c"),
        F.sum(F.when(sx * sy < 0, 1).otherwise(0)).alias("d"),
        F.sum(F.when(sx == 0, 1).otherwise(0)).alias("n1"),
        F.sum(F.when(sy == 0, 1).otherwise(0)).alias("n2"))
    den = F.sqrt((F.col("n0") - F.col("n1")).cast("double")
                 * (F.col("n0") - F.col("n2")).cast("double"))
    return (agg.filter((F.col("n0") > F.col("n1"))
                       & (F.col("n0") > F.col("n2")))
            .select(group_col,
                    F.col("c").cast("long").alias("concordant"),
                    F.col("d").cast("long").alias("discordant"),
                    F.round((F.col("c") - F.col("d")) / den, 6)
                    .alias("tau_b")))


def peak_concurrency(events: DataFrame, key_col: str = "event_type",
                     ts_col: str = "ts", dur_col: str = "value",
                     id_col: str = "event_id") -> DataFrame:
    """Maximum simultaneous activity per key over intervals
    [ts, ts + dur seconds] — the classic +1/−1 boundary sweep:
    explode each interval into a start(+1) and end(−1) boundary, order
    by (time, delta, id) within the key (an end at time t closes
    BEFORE a start at t opens, so touching intervals don't
    double-count), running-sum, take the max and the first time it is
    reached.

    Exact integer µs end-points (the x119 convention: round(dur·1e6)
    as long); one partitioned window over the boundary stream — a
    single shuffle on the key, 2 rows per event."""
    s = F.unix_micros(F.col(ts_col).cast("timestamp"))
    e = s + F.round(F.col(dur_col) * 1000000).cast("long")
    bounds = events.select(
        key_col, F.col(id_col),
        F.explode(F.array(
            F.struct(s.alias("t"), F.lit(1).alias("delta")),
            F.struct(e.alias("t"), F.lit(-1).alias("delta"))))
        .alias("_b")).select(key_col, id_col,
                             F.col("_b.t").alias("_t"),
                             F.col("_b.delta").alias("_d"))
    wrun = (W.partitionBy(key_col).orderBy("_t", "_d", id_col)
            .rowsBetween(W.unboundedPreceding, W.currentRow))
    run = bounds.withColumn("_c", F.sum("_d").over(wrun))
    return (run.withColumn("_peak", F.max("_c").over(
                W.partitionBy(key_col)))
            .filter(F.col("_c") == F.col("_peak"))
            .groupBy(key_col)
            .agg(F.max("_c").cast("long").alias("peak"),
                 F.min("_t").alias("first_peak_t")))


def pattern_negation(events: DataFrame, start: str = "signup",
                     goal: str = "purchase", blocker: str = "click",
                     within_s: int = 604800, user_col: str = "user_id",
                     ts_col: str = "ts",
                     id_col: str = "event_id") -> DataFrame:
    """CEP negation pattern per user: occurrences of ``start`` whose
    EARLIEST following ``goal`` arrives within ``within_s`` seconds
    AND has no ``blocker`` event strictly between them — the
    "converted without churning through support" class of funnel
    question that plain ordered-step funnels (window_funnel) cannot
    express.

    One pass: per user, two conditional MIN-over-following window
    aggregates give each start row its next goal and next blocker
    time in exact integer µs; the negation is then a row-local
    comparison (clean ⇔ next_goal ≤ start + T and next_blocker is
    NULL or ≥ next_goal). A single shuffle on the user key, no joins,
    no per-step iteration — the same plan at 20 pattern steps."""
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    w = (W.partitionBy(user_col).orderBy("_us", id_col)
         .rowsBetween(1, W.unboundedFollowing))
    typed = events.select(user_col, F.col(id_col), "event_type",
                          us.alias("_us"))
    nxt = (typed
           .withColumn("_ng", F.min(F.when(
               F.col("event_type") == goal, F.col("_us"))).over(w))
           .withColumn("_nb", F.min(F.when(
               F.col("event_type") == blocker, F.col("_us"))).over(w))
           .filter(F.col("event_type") == start))
    conv = F.col("_ng").isNotNull() & (
        F.col("_ng") - F.col("_us") <= within_s * 1_000_000)
    clean = conv & (F.col("_nb").isNull()
                    | (F.col("_nb") >= F.col("_ng")))
    return (nxt.groupBy(user_col).agg(
        F.count("*").cast("long").alias("n_starts"),
        F.sum(conv.cast("int")).cast("long").alias("n_conversions"),
        F.sum(clean.cast("int")).cast("long").alias("n_clean")))


def decay_attribution(events: DataFrame, conv_type: str = "purchase",
                      touch_types: tuple = ("click", "view"),
                      half_life_s: float = 86400.0,
                      lookback_s: int = 604800,
                      user_col: str = "user_id", ts_col: str = "ts",
                      id_col: str = "event_id") -> DataFrame:
    """Time-decay multi-touch attribution: every conversion spreads
    one unit of credit over the user's preceding touchpoints within
    the lookback, weighted 0.5^(Δt/half_life) and normalized per
    conversion — the standard alternative to last-touch (e28), which
    hands the whole unit to the most recent touch.

    Determinism at the float boundary (the x49/x39 convention): each
    pair's decay weight is fixed-pointed ONCE (round(w·1e6) as int64),
    the per-conversion normalizer is an exact integer sum, and the
    credit division + final channel sum are the only float steps,
    rounded 6dp.

    Plan: one user-keyed join of conversions to touches (pair count
    bounded by per-user activity — the attribution join every
    warehouse runs), one groupBy(conversion) for normalizers, one
    groupBy(channel). At 100 TB everything keys on user/conversion
    ids; no global state."""
    LN_HALF = -0.6931471805599453
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    base = events.select(F.col(user_col).alias("_u"),
                         F.col(id_col).alias("_eid"),
                         F.col("event_type"), us.alias("_us"))
    conv = (base.filter(F.col("event_type") == conv_type)
            .select(F.col("_u"), F.col("_eid").alias("_cid"),
                    F.col("_us").alias("_cus")))
    touch = (base.filter(F.col("event_type").isin(*touch_types))
             .select(F.col("_u"), F.col("_eid").alias("_tid"),
                     F.col("event_type").alias("channel"),
                     F.col("_us").alias("_tus")))
    pairs = (conv.join(touch, "_u")
             .filter((F.col("_tus") < F.col("_cus"))
                     & (F.col("_cus") - F.col("_tus")
                        <= F.lit(int(lookback_s) * 1_000_000))))
    age_s = (F.col("_cus") - F.col("_tus")).cast("double") / 1_000_000.0
    w_fp = F.round(F.exp(F.lit(LN_HALF) * age_s / F.lit(half_life_s))
                   * 1_000_000).cast("long")
    weighted = pairs.withColumn("_w", w_fp)
    norm = weighted.groupBy("_cid").agg(F.sum("_w").alias("_wsum"))
    credited = (weighted.join(norm, "_cid")
                .select("channel",
                        (F.col("_w").cast("double")
                         / F.col("_wsum")).alias("_credit")))
    return (credited.groupBy("channel")
            .agg(F.count("*").cast("long").alias("n_touches"),
                 F.round(F.sum("_credit"), 6).alias("total_credit")))


def kaplan_meier(events: DataFrame, user_col: str = "user_id",
                 ts_col: str = "ts") -> DataFrame:
    """Kaplan–Meier retention curve over user lifetimes: duration =
    days between a user's first and last event; a user whose last
    activity precedes the corpus end is a churn EVENT, one still
    active on the final day is CENSORED (their true lifetime is only
    known to exceed the observation). S(t) = Π_{d≤t} (1 − deaths_d /
    at_risk_d) — the estimator that cohort retention tables (e12)
    approximate without handling censoring.

    Determinism: durations, death counts, and risk sets are exact
    integers (at_risk_t = Σ of durations ≥ t via a suffix sum over
    the duration histogram); the survival product is computed as
    exp(Σ ln(1 − d/n)) over the ordered days — the x39 ln-sum
    convention — rounded 6dp. Two bounded shuffles: per-user min/max,
    then the duration histogram (rows = distinct durations)."""
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    per_user = (events.select(F.col(user_col).alias("_u"),
                              F.floor(us / 86_400_000_000).alias("_d"))
                .groupBy("_u")
                .agg(F.min("_d").alias("_first"), F.max("_d").alias("_last")))
    gend = per_user.agg(F.max("_last").alias("_end"))
    lt = (per_user.crossJoin(F.broadcast(gend))
          .select((F.col("_last") - F.col("_first")).alias("dur"),
                  (F.col("_last") < F.col("_end")).alias("churned")))
    hist = lt.groupBy("dur").agg(
        F.count("*").alias("_n"),
        F.sum(F.col("churned").cast("int")).alias("_deaths"))
    # the histogram is tiny (distinct durations) — single-partition
    # windows over it are fine at any corpus size (the corpus-sized
    # work all happened in the two aggregates above). The partition
    # key must be NON-FOLDABLE: F.lit(1) is constant-folded out of
    # the partition spec, which re-triggers the unpartitioned
    # WindowExec warning the key exists to avoid — dur % 1 is always
    # 0 but Catalyst cannot fold it, so the spec survives.
    hist = hist.withColumn("_pk", F.col("dur") % F.lit(1))
    wrisk = (W.partitionBy("_pk").orderBy(F.col("dur").desc())
             .rowsBetween(W.unboundedPreceding, W.currentRow))
    wcum = (W.partitionBy("_pk").orderBy(F.col("dur").asc())
            .rowsBetween(W.unboundedPreceding, W.currentRow))
    # deaths == at_risk (every longest-lived user churned) makes the
    # KM term 1 - d/n exactly 0: Spark F.log(0) is NULL, which F.sum
    # would silently SKIP, reporting the previous survival instead of
    # 0. Guard the term and latch survival to 0.0 from that row on.
    dead = (F.col("_deaths") >= F.col("_risk")).cast("int")
    risked = (hist.withColumn("_risk", F.sum("_n").over(wrisk))
              .withColumn("_dead", dead)
              .withColumn("_lnterm", F.when(
                  F.col("_deaths") < F.col("_risk"),
                  F.log(1.0 - F.col("_deaths").cast("double")
                        / F.col("_risk"))).otherwise(F.lit(0.0))))
    surv = F.when(F.max("_dead").over(wcum) == 1, F.lit(0.0)) \
            .otherwise(F.round(F.exp(F.sum("_lnterm").over(wcum)), 6))
    return (risked.withColumn("survival", surv)
        .select(F.col("dur").cast("long").alias("duration_days"),
                F.col("_risk").cast("long").alias("n_at_risk"),
                F.col("_deaths").cast("long").alias("n_churned"),
                "survival")
        .filter(F.col("n_churned") > 0))


def session_paths(events: DataFrame, gap_s: float = 1800.0,
                  max_steps: int = 8, top_k: int = 20,
                  user_col: str = "user_id", ts_col: str = "ts",
                  type_col: str = "event_type") -> DataFrame:
    """Top-k session PATHS: sessionize each user's stream at a
    ``gap_s`` inactivity split (the e3 convention), truncate each
    session to its first ``max_steps`` events, join the event types
    into a '>'-separated path string, and report the ``top_k`` most
    common paths — the "how do users actually move through the
    product" mining primitive behind funnel DISCOVERY (e6/e29 check a
    KNOWN funnel; this surfaces the candidates).

    Determinism: events order by (ts µs, event_id) — a total order —
    so the path string is unique per session; counts are exact
    integers and the top-k tiebreak is path ASC. Plan: ONE
    corpus-sized shuffle (the per-user session window), a grouped
    path aggregate (rows = sessions), and a TakeOrderedAndProject
    top-k — no driver-side state."""
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    gap_us = int(gap_s * 1_000_000)
    wu = (W.partitionBy(user_col).orderBy(us, "event_id"))
    new_sess = F.when(
        (us - F.lag(us).over(wu)) > gap_us, 1).otherwise(0)
    sess = (events
            .withColumn("_new", F.coalesce(new_sess, F.lit(1)))
            .withColumn("_sid", F.sum("_new").over(
                wu.rowsBetween(W.unboundedPreceding, W.currentRow)))
            .withColumn("_rn", F.row_number().over(
                W.partitionBy(user_col, "_sid").orderBy(us, "event_id")))
            .filter(F.col("_rn") <= max_steps))
    paths = (sess.groupBy(user_col, "_sid")
             .agg(F.array_join(
                 F.transform(
                     F.array_sort(F.collect_list(
                         F.struct(F.col("_rn"), F.col(type_col)
                                  .alias("_t")))),
                     lambda s: s["_t"]), ">").alias("path")))
    return (paths.groupBy("path")
            .agg(F.count("*").cast("long").alias("n_sessions"))
            .orderBy(F.col("n_sessions").desc(), F.col("path").asc())
            .limit(top_k))


def pass_at_k(events: DataFrame, ks: tuple = (1, 5, 10),
              task_col: str = "user_id", value_col: str = "value",
              threshold: float = 50.0) -> DataFrame:
    """pass@k estimator (Chen et al. 2021, "Evaluating Large Language
    Models Trained on Code", eq. 1) over per-task attempt outcomes:
    with n attempts and c successes per task, the unbiased estimate is
    1 − C(n−c, k)/C(n, k), computed in the numerically stable product
    form 1 − Π_{i=0..k-1} (n−c−i)/(n−i). Rows where n < k report NULL
    (the estimator is undefined below k attempts). Returns the
    mean pass@k across tasks per k — the eval-suite headline number.

    Determinism: the ≤k-term product folds left-to-right in BOTH
    engines (F.aggregate here, list_reduce in the oracle) over exact
    integer (n, c), so the double chains are bit-identical; the final
    per-k mean divides two exact aggregates (a fixed-point sum of
    6dp-rounded per-task values) and rounds 6dp."""
    per_task = (events.groupBy(task_col).agg(
        F.count("*").alias("_n"),
        F.sum((F.col(value_col) > threshold).cast("int")).alias("_c")))
    # ONE corpus aggregate for all k: the per-task table explodes to
    # |tasks|·|ks| rows (a per-k union would re-derive the corpus
    # aggregate once per k — three scans at 100 TB for nothing)
    karr = F.explode(F.array(*[F.lit(int(k)) for k in ks])).alias("k")
    ek = per_task.select(task_col, "_n", "_c", karr)
    prod = F.aggregate(
        F.sequence(F.lit(0), F.col("k") - 1), F.lit(1.0),
        lambda acc, i: acc * (F.col("_n") - F.col("_c") - i)
        / (F.col("_n") - i))
    pk = F.when(F.col("_n") < F.col("k"), F.lit(None)).otherwise(
        F.when(F.col("_c") >= F.col("_n"), F.lit(1.0))
        .when(F.col("_n") - F.col("_c") < F.col("k"), F.lit(1.0))
        .otherwise(F.round(1.0 - prod, 6)))
    # fixed-point per-task values make the cross-task mean an exact
    # integer sum in both engines
    pk_fp = F.floor(pk * 1_000_000 + F.lit(0.5)).cast("long")
    return (ek.select("k", pk_fp.alias("_fp"))
            .filter(F.col("_fp").isNotNull())
            .groupBy("k")
            .agg(F.count("*").cast("long").alias("n_tasks"),
                 F.round(F.sum("_fp") / 1_000_000.0 / F.count("*"), 6)
                 .alias("mean_pass_at_k")))


def calibration_ece(events: DataFrame, n_bins: int = 10,
                    conf_col: str = "value",
                    type_col: str = "event_type",
                    positive: str = "purchase") -> DataFrame:
    """Expected-calibration-error table: confidence = value/100
    clamped to [0, 1], binned into ``n_bins`` equal-width bins;
    per bin the mean confidence, empirical accuracy (fraction of
    ``positive`` events) and |acc − conf| gap, plus each bin's
    weighted ECE contribution (n_b/N · gap) — Σ of the last column is
    the ECE (Guo et al. 2017). The model-confidence audit run before
    a quality/filter score is trusted as a sampling weight.

    Determinism: confidence enters as EXACT fixed-point (round(conf ·
    1e4) as int64 — value is on the 0-100 scale, so that is
    round(value·100), clamped to [0, 10000]), so bin ids, per-bin
    sums and counts are exact integers in both engines; the four
    output doubles are single division chains over those integers,
    rounded 6dp."""
    fp = F.least(F.greatest(
        F.floor(F.col(conf_col) * 100 + F.lit(0.5)).cast("long"),
        F.lit(0)), F.lit(10_000))
    # FLOOR, not a double->int cast: Spark's cast truncates while
    # DuckDB's rounds — floor is the one op both engines agree on
    bin_id = F.least(F.floor(fp * n_bins / 10_000),
                     F.lit(n_bins - 1)).cast("int")
    hit = (F.col(type_col) == positive).cast("int")
    binned = (events.select(bin_id.alias("bin"), fp.alias("_fp"),
                            hit.alias("_hit"))
              .groupBy("bin")
              .agg(F.count("*").alias("_n"), F.sum("_fp").alias("_sfp"),
                   F.sum("_hit").alias("_sh")))
    tot = binned.agg(F.sum("_n").alias("_tot"))
    conf = F.col("_sfp") / 10_000.0 / F.col("_n")
    acc = F.col("_sh").cast("double") / F.col("_n")
    gap = F.abs(acc - conf)
    return (binned.crossJoin(F.broadcast(tot))
            .select(F.col("bin").cast("int").alias("bin"),
                    F.col("_n").cast("long").alias("n"),
                    F.round(conf, 6).alias("mean_conf"),
                    F.round(acc, 6).alias("accuracy"),
                    F.round(gap, 6).alias("gap"),
                    F.round(gap * F.col("_n") / F.col("_tot"), 6)
                    .alias("ece_contrib")))


def fleiss_kappa(subjects: DataFrame, id_col: str = "doc_id",
                 n_raters: int = 5, n_cats: int = 3) -> DataFrame:
    """Fleiss' kappa for inter-rater agreement over ``n_raters``
    synthetic raters per subject (categories from the repo's seeded
    md5-prefix hash convention, so both engines derive the identical
    rating matrix) — the multi-rater generalization of x118's Cohen
    kappa, the labeling-QA gate for annotation campaigns with rotating
    rater pools.

    Exactness: with R raters and subject-category counts n_ij, every
    term is integer — P̄ = (Σ_ij n_ij² − N·R) / (N·R·(R−1)) and
    P̄_e = (Σ_j C_j²) / (N·R)² — so kappa is a two-division chain over
    three int64 aggregates; nothing float accumulates. Plan: one
    map-side explode (×R), two bounded aggregates."""
    rater = F.explode(F.array(*[F.lit(i) for i in range(n_raters)]))
    rated = subjects.select(F.col(id_col).alias("_s"),
                            rater.alias("_r"))
    cat = (F.conv(F.substring(
        F.md5(F.concat(F.col("_s").cast("string"), F.lit("#"),
                       F.col("_r").cast("string"))), 1, 8), 16, 10)
        .cast("long") % n_cats)
    nij = (rated.select("_s", cat.alias("_c"))
           .groupBy("_s", "_c").agg(F.count("*").alias("_n"))
           .localCheckpoint(eager=False))   # two rollups read it
    per_subj = nij.groupBy("_s").agg(
        F.sum(F.col("_n") * F.col("_n")).alias("_s2"))
    per_cat = nij.groupBy("_c").agg(F.sum("_n").alias("_cj"))
    tots = per_subj.agg(F.count("*").alias("_N"),
                        F.sum("_s2").alias("_S2"))
    catsq = per_cat.agg(F.sum(F.col("_cj") * F.col("_cj")).alias("_T"))
    row = tots.join(catsq.hint("broadcast"))
    r = F.lit(n_raters)
    nr = F.col("_N") * r
    pbar = (F.col("_S2") - nr) / (nr * (r - 1))
    pe = F.col("_T") / (nr * nr)
    return row.select(
        F.col("_N").cast("long").alias("n_subjects"),
        F.lit(n_raters).cast("long").alias("n_raters"),
        F.round(pbar, 6).alias("p_bar"),
        F.round(pe, 6).alias("p_e"),
        F.round((pbar - pe) / (1 - pe), 6).alias("kappa"))


def bradley_terry(events: DataFrame, user_col: str = "user_id",
                  item_col: str = "event_type",
                  value_col: str = "value",
                  iters: int = 2) -> DataFrame:
    """Bradley–Terry preference strengths from pairwise comparisons:
    within each user, item a "beats" item b when the user's exact
    cent total for a exceeds b's (ties abstain); the per-pair win
    matrix feeds ``iters`` unrolled MM updates (Hunter 2004,
    p_i ← W_i / Σ_j n_ij/(p_i+p_j)) from a uniform start — the
    RLHF/arena rating primitive over x81's preference-pair shape.

    Determinism: wins/comparison counts are exact ints; each MM
    term n_ij/(p_i+p_j) quantizes to 1e-9 fixed-point int64 BEFORE
    the per-item sum (so summation order can't move the result), and
    each iteration's p re-quantizes to 9dp. Plan: one corpus shuffle
    (user×item aggregate), a per-user bounded self-join (≤|items|²
    per user), then |items|²-row iterate frames."""
    cents = F.floor(F.col(value_col) * 100 + F.lit(0.5)).cast("long")
    ui = (events.select(F.col(user_col).alias("u"),
                        F.col(item_col).alias("i"), cents.alias("c"))
          .groupBy("u", "i").agg(F.sum("c").alias("c"))
          # both duel sides read this bounded (users × items) frame
          .localCheckpoint(eager=False))
    a, b = ui.alias("a"), ui.alias("b")
    duel = (a.join(b, (F.col("a.u") == F.col("b.u"))
                   & (F.col("a.i") < F.col("b.i")))
            .filter(F.col("a.c") != F.col("b.c"))
            .groupBy(F.col("a.i").alias("ia"), F.col("b.i").alias("ib"))
            .agg(F.sum((F.col("a.c") > F.col("b.c")).cast("long"))
                 .alias("w_ab"),
                 F.sum((F.col("b.c") > F.col("a.c")).cast("long"))
                 .alias("w_ba"))
            # ≤ |items|² rows, re-read by EVERY MM iteration: without
            # the checkpoint the whole duel subtree re-expands per
            # iteration (static plan measured 148 exchanges / 84
            # scans before; 3 after)
            .localCheckpoint(eager=False))
    # symmetric (i, j, n_ij, wins_of_i_over_j) view
    sym = (duel.select(F.col("ia").alias("i"), F.col("ib").alias("j"),
                       (F.col("w_ab") + F.col("w_ba")).alias("n"),
                       F.col("w_ab").alias("w"))
           .unionByName(duel.select(
               F.col("ib").alias("i"), F.col("ia").alias("j"),
               (F.col("w_ab") + F.col("w_ba")).alias("n"),
               F.col("w_ba").alias("w")))
           .localCheckpoint(eager=False))
    wins = (sym.groupBy("i").agg(F.sum("w").alias("wins"),
                                 F.sum("n").alias("n_comp"))
            .localCheckpoint(eager=False))
    p = wins.select("i", F.lit(1.0).alias("p"))
    for _ in range(iters):
        pj = p.select(F.col("i").alias("j"), F.col("p").alias("pj"))
        terms = (sym.join(p.hint("broadcast"), "i")
                 .join(pj.hint("broadcast"), "j")
                 .select("i", F.floor(
                     F.col("n") / (F.col("p") + F.col("pj")) * 1e9
                     + F.lit(0.5)).cast("long").alias("_t")))
        denom = terms.groupBy("i").agg(F.sum("_t").alias("_d"))
        p = (wins.join(denom, "i")
             .select("i", (F.floor(F.col("wins") * 1e9
                                   / (F.col("_d") / 1e9) + F.lit(0.5))
                           / 1e9).alias("p")))
    tot = p.agg(F.sum("p").alias("_tp"))
    return (wins.join(p, "i").join(tot.hint("broadcast"))
            .select(F.col("i").alias(item_col),
                    F.col("wins").cast("long").alias("wins"),
                    F.col("n_comp").cast("long").alias("n_comparisons"),
                    F.round(F.col("p") / F.col("_tp"), 6).alias("rating")))


def self_bleu(docs: DataFrame, id_col: str = "doc_id",
              text_col: str = "text",
              group_col: str = "source") -> DataFrame:
    """Self-BLEU-2 corpus diversity audit (Zhu et al. 2018): each doc
    scores as a CANDIDATE against the next doc (by id) in its group
    as the REFERENCE — high self-BLEU means the corpus repeats itself,
    the generation-diversity red flag. Per group: pair count and mean
    clipped unigram/bigram precision and BLEU-2 (geometric mean ×
    brevity penalty).

    Per-pair p1/p2 are exact int ratios (clipped-count sums over
    candidate length); BLEU-2 = BP·sqrt(p1·p2) quantizes to 1e-6
    fixed-point BEFORE the group mean so the aggregate sums int64,
    immune to float summation order. The brevity penalty is the
    LINEAR min(1, len_c/len_r) rather than Papineni's exp(1 − r/c):
    same monotonicity and fixed points (1 at equal length, → 0 as the
    candidate shrinks), but an exact int-ratio double instead of
    libm exp, whose last-ulp engine drift can flip the 1e-6
    fixed-point floor (the repo's zero-libm determinism convention). Plan: n-gram explodes are
    map-side; the only shuffles are the per-(pair, gram) count
    aggregates and their pair join — linear in token count."""
    wg = W.partitionBy("_g").orderBy(F.col("_id").asc())
    toks = F.split(F.lower(F.col(text_col)), r"\s+")
    base = docs.select(F.col(id_col).alias("_id"),
                       F.col(group_col).alias("_g"),
                       toks.alias("_tk"))
    pairs = (base
             .withColumn("_rtk", F.lead("_tk").over(wg))
             .filter(F.col("_rtk").isNotNull())
             .filter((F.size("_tk") >= 2) & (F.size("_rtk") >= 2))
             # (A round-robin repartition here — to spread the
             # ≤|groups| non-empty window partitions before the n-gram
             # explodes — was measured and REJECTED: the extra
             # token-array shuffle costs more than the parallelism
             # gains, 2.2 s → 3.4 s at sf0.1.)
             # five consumers (4 n-gram explodes + the length join)
             .localCheckpoint(eager=False))

    def grams(col: str, n: int) -> F.Column:
        if n == 1:
            return F.col(col)
        return F.expr(
            f"transform(slice({col}, 1, size({col}) - 1), "
            f"(x, k) -> concat(x, ' ', element_at({col}, k + 2)))")

    def clipped(n: int, name: str) -> DataFrame:
        cand = (pairs.select("_id", "_g",
                             F.explode(grams("_tk", n)).alias("_gr"))
                .groupBy("_id", "_g", "_gr")
                .agg(F.count("*").alias("_cc")))
        ref = (pairs.select("_id", F.explode(grams("_rtk", n)).alias("_gr"))
               .groupBy("_id", "_gr").agg(F.count("*").alias("_cr")))
        per = (cand.join(ref, ["_id", "_gr"], "left")
               .groupBy("_id", "_g")
               .agg(F.sum(F.least("_cc", F.coalesce("_cr", F.lit(0))))
                    .alias(f"_clip{name}"),
                    F.sum("_cc").alias(f"_tot{name}")))
        return per

    joined = (clipped(1, "1").join(clipped(2, "2"), ["_id", "_g"])
              .join(pairs.select("_id", F.size("_tk").alias("_lc"),
                                 F.size("_rtk").alias("_lr")), "_id"))
    p1 = F.col("_clip1") / F.col("_tot1")
    p2 = F.col("_clip2") / F.col("_tot2")
    bp = F.when(F.col("_lc") >= F.col("_lr"), F.lit(1.0)).otherwise(
        F.col("_lc") / F.col("_lr"))
    fx = lambda c: F.floor(c * 1e6 + F.lit(0.5)).cast("long")  # noqa: E731
    per_pair = joined.select(
        "_g", fx(p1).alias("_fp1"), fx(p2).alias("_fp2"),
        fx(bp * F.sqrt(p1 * p2)).alias("_fb"))
    return (per_pair.groupBy(F.col("_g").alias(group_col))
            .agg(F.count("*").cast("long").alias("n_pairs"),
                 F.round(F.sum("_fp1") / 1e6 / F.count("*"), 6)
                 .alias("mean_p1"),
                 F.round(F.sum("_fp2") / 1e6 / F.count("*"), 6)
                 .alias("mean_p2"),
                 F.round(F.sum("_fb") / 1e6 / F.count("*"), 6)
                 .alias("mean_self_bleu2")))


def conformal_coverage(events: DataFrame, group_col: str = "event_type",
                       value_col: str = "value",
                       alpha_num: int = 1, alpha_den: int = 10) -> DataFrame:
    """Split-conformal calibration audit (Vovk; Angelopoulos & Bates
    2021): the even-user half calibrates, the odd-user half tests.
    The predictor is the calibration half's per-group mean cent value;
    nonconformity is |cents − pred|; q̂ is the EXACT order statistic
    at rank ⌈(n_cal+1)(1−α)⌉ (never an interpolated quantile — rank
    selection over integer scores is engine-identical); coverage is
    the test-half fraction within q̂. A well-calibrated interval
    covers ≥ 1−α — the distribution-free guarantee this audit
    checks per group.

    The prediction is an exact int ratio; nonconformity compares
    |cents·n_cal − sum_cal| as pure int64 (cents − sum/n multiplied
    through by n, so no float enters the ranking or the coverage
    test). Plan: one grouped aggregate, one bounded per-group rank
    window over the calibration half, one test-half census."""
    cents = F.floor(F.col(value_col) * 100 + F.lit(0.5)).cast("long")
    base = events.select(F.col(group_col).alias("g"),
                         (F.col("user_id") % 2 == 0).alias("is_cal"),
                         cents.alias("c"))
    calstat = (base.filter("is_cal").groupBy("g")
               .agg(F.count("*").alias("n_cal"), F.sum("c").alias("s_cal")))
    # nonconformity scaled by n_cal: |c·n − s| is exact int64
    scored = (base.join(calstat.hint("broadcast"), "g")
              .withColumn("_nc", F.abs(F.col("c") * F.col("n_cal")
                                       - F.col("s_cal"))))
    # ⌈(n+1)(1−α)⌉ in PURE INT arithmetic: (n+1)(den−num) can land
    # exactly on a multiple of den, where the float form
    # (n+1)·0.9 = 4500.0000000000009 would ceil one rank too high —
    # and differently per engine.
    rank_k = F.floor(((F.col("n_cal") + 1) * F.lit(alpha_den - alpha_num)
                      + F.lit(alpha_den - 1)) / F.lit(alpha_den))
    wq = W.partitionBy("g").orderBy(F.col("_nc").asc())
    qhat = (scored.filter("is_cal")
            .withColumn("_r", F.row_number().over(wq))
            .filter(F.col("_r") == F.least(rank_k, F.col("n_cal")))
            .select("g", F.col("_nc").alias("_q")))
    test = (scored.filter(~F.col("is_cal"))
            .join(qhat.hint("broadcast"), "g")
            .groupBy("g")
            .agg(F.max("n_cal").alias("n_cal"),
                 F.count("*").alias("n_test"),
                 F.sum((F.col("_nc") <= F.col("_q")).cast("long"))
                 .alias("n_cov"),
                 F.max("_q").alias("qs")))
    return test.select(
        F.col("g").alias(group_col),
        F.col("n_cal").cast("long").alias("n_cal"),
        F.col("n_test").cast("long").alias("n_test"),
        # q̂ back on the cent scale (scaled score / n_cal)
        F.round(F.col("qs") / F.col("n_cal"), 6).alias("qhat_cents"),
        F.round(F.col("n_cov") / F.col("n_test"), 6).alias("coverage"))


def shapley_attribution(events: DataFrame, user_col: str = "user_id",
                        type_col: str = "event_type",
                        conversion_type: str = "purchase") -> DataFrame:
    """Data-driven Shapley channel attribution (Shapley 1953 over the
    touchpoint lattice, the Zhao et al. 2018 marketing formulation):
    a user's TOUCHSET is the set of non-conversion event types they
    emitted; v(S) = conversion rate of users whose touchset is
    EXACTLY S (0 for unobserved sets); channel c's credit is
    Σ_{S ∌ c} w(|S|)·(v(S∪{c}) − v(S)) with the exact Shapley kernel
    w(s) = s!(k−1−s)!/k! — the fair-division answer to "which channel
    actually moves conversion", where last-touch (e28) and time-decay
    (e32) only reward position.

    Everything is engine-side: channels get bit indices by
    lexicographic rank, touchsets become bitmasks, the full 2^k
    lattice comes from a sequence explode (k = |channels| is tiny;
    2^k rows), v(S) is an exact int ratio, and the Shapley kernel is
    applied as integer factorial numerators over one k! denominator
    literal. No driver-side collect anywhere."""
    import math
    conv = (events.groupBy(F.col(user_col).alias("u"))
            .agg(F.max((F.col(type_col) == conversion_type)
                       .cast("int")).alias("cv")))
    ch = (events.filter(F.col(type_col) != conversion_type)
          .select(F.col(type_col).alias("ch")).distinct())
    wch = W.partitionBy(F.substring("ch", 1, 0)).orderBy("ch")
    chbit = (ch.withColumn("bit", F.row_number().over(wch) - 1)
             .localCheckpoint(eager=False))   # read 4x, ≤ k rows
    touched = (events.filter(F.col(type_col) != conversion_type)
               .select(F.col(user_col).alias("u"),
                       F.col(type_col).alias("ch")).distinct()
               .join(F.broadcast(chbit), "ch")
               .groupBy("u")
               .agg(F.sum(F.expr("shiftleft(1, bit)")
                          .cast("long")).alias("mask"))
               # users' masks feed the census AND per-channel counts
               .localCheckpoint(eager=False))
    census = (conv.join(touched, "u", "left")
              .select(F.coalesce("mask", F.lit(0)).alias("mask"), "cv")
              .groupBy("mask")
              .agg(F.count("*").alias("n"), F.sum("cv").alias("nc")))
    k = chbit.agg(F.count("*").alias("k"))
    lattice = (k.select(F.explode(F.sequence(
        F.lit(0), F.expr("shiftleft(1, k)") - 1)).alias("m"), "k"))
    v = (lattice.join(census.withColumnRenamed("mask", "m"), "m", "left")
         .select("m", "k",
                 F.when(F.col("n").isNotNull(),
                        F.col("nc") / F.col("n"))
                 .otherwise(F.lit(0.0)).alias("v"))
         # 2^k rows, read by both the pair side and the S∪{c} lookup
         .localCheckpoint(eager=False))
    # pair every channel with every lattice set not containing it
    pairs = (v.join(F.broadcast(chbit)).filter(
        F.expr("shiftright(m, bit)").bitwiseAND(1) == 0))
    v_with = v.select(F.col("m").alias("_mw"), F.col("v").alias("vw"))
    joined = pairs.withColumn(
        "_mw", F.col("m") + F.expr("shiftleft(1, bit)").cast("long")) \
        .join(v_with.hint("broadcast"), "_mw")
    s = F.bit_count(F.col("m"))
    # w(s)·k! = s!(k−1−s)! via a precomputed factorial literal array
    # (index 0..12 — k beyond 12 channels would overflow the kernel
    # anyway and no event stream has that many)
    facts = [1]
    for i in range(1, 13):
        facts.append(facts[-1] * i)
    farr = F.array(*[F.lit(x) for x in facts])
    wnum = (F.element_at(farr, (s + 1).cast("int"))
            * F.element_at(farr, ((F.col("k") - 1 - s) + 1).cast("int"))
            ).cast("double")
    kfact = F.element_at(farr, (F.col("k") + 1).cast("int")).cast("double")
    credit = wnum / kfact * (F.col("vw") - F.col("v"))
    out = (joined.groupBy("bit")
           .agg(F.round(F.sum(credit), 6).alias("shapley_credit")))
    users_per = (touched.join(F.broadcast(chbit)).filter(
        F.expr("shiftright(mask, bit)").bitwiseAND(1) == 1)
        .groupBy("bit").agg(F.count("*").alias("touched_users")))
    return (out.join(users_per, "bit", "left")
            .join(F.broadcast(chbit), "bit")
            .select(F.col("ch").alias(type_col), "shapley_credit",
                    F.coalesce("touched_users", F.lit(0)).cast("long")
                    .alias("touched_users")))
