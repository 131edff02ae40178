"""Deduplication operators for LLM corpus curation.

Four tiers, each one Spark-shape class stronger (and costlier):

  exact_dedup          — hash-groupBy, one shuffle of (hash, id)
  near_dup_pairs       — MinHash + LSH banding: shingle → salted-md5
                         min-hash signature → band buckets →
                         candidate self-join WITHIN buckets → exact
                         Jaccard verification of candidates only
  simhash (text.py)    — explode + groupBy fingerprint
  jaccard_pairs_blocked— exact n-gram Jaccard within cheap blocking
                         keys (never all-pairs)

Determinism: min-hash uses an exact-int64 universal hash family over a
28-bit md5 prefix (see MERSENNE31 below; md5 and integer arithmetic are
identical in Spark and DuckDB), so signatures, buckets, candidate
sets, verified pairs, and the connected-component cluster labels are
all bit-reproducible across engines — every operator here is
oracle-checkable.

100 TB posture: no operator compares all pairs. LSH bounds the join to
same-bucket candidates; blocking bounds exact Jaccard to same-block
candidates; both joins key on (bucket/block) so the shuffle is
partitioned by bucket. Hot buckets (boilerplate shingles) are the known
skew risk — AQE skew-join splitting plus the band-hash keyspace keeps
partitions bounded; a production run would additionally cap bucket
size (drop buckets > N as "template" clusters), which is a filter on
the bucket-count aggregate, noted here for the scale path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F

from data_ingest_spark.functions.partitioning import spread


def exact_dedup(df: DataFrame, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """Exact duplicate groups by content hash. Returns one row per
    duplicated content (keep_id = smallest id, n_copies > 1). The
    keep-set itself is `df` semi-joined on keep_id; callers that want
    the deduplicated corpus use :func:`dedup_keep_first`."""
    h = F.md5(F.col(text_col).cast("binary"))
    return (
        df.select(F.col(id_col), h.alias("content_hash"))
        .groupBy("content_hash")
        .agg(F.min(id_col).alias("keep_id"), F.count("*").alias("n_copies"))
        .filter(F.col("n_copies") > 1)
    )


def dedup_keep_first(df: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """The deduplicated corpus: keep the smallest id per content hash.
    One shuffle on the hash; rows with unique content pass untouched."""
    h = F.md5(F.col(text_col).cast("binary"))
    keep = (
        df.select(F.col(id_col).alias("_kid"), h.alias("_h"))
        .groupBy("_h").agg(F.min("_kid").alias(id_col))
    )
    return df.join(keep.select(id_col), id_col, "left_semi")


def dedup_keep_best(df: DataFrame, score_col: str,
                    id_col: str = "doc_id",
                    text_col: str = "text") -> DataFrame:
    """Survivorship-policy dedup: among rows sharing a content hash,
    keep the one with the HIGHEST ``score_col`` (ties broken by
    smallest id — fully deterministic). The policy real curation
    pipelines want: when the same text arrives from several sources,
    retain the copy with the best provenance/quality metadata, not an
    arbitrary id. One shuffle on the hash via max_by semantics."""
    # row_number ordered by (score desc, id asc): works for ANY id
    # type (a negated-id struct-max would NULL out on string ids and
    # silently return nothing); one shuffle on the hash either way.
    h = F.md5(F.col(text_col).cast("binary"))
    w = W.partitionBy("_h").orderBy(F.col(score_col).desc(),
                                    F.col(id_col).asc())
    keep = (
        df.select(F.col(id_col), h.alias("_h"), F.col(score_col))
        .withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") == 1)
        .select(id_col)
    )
    return df.join(keep, id_col, "left_semi")


#: Universal-hash family for MinHash: h_j(s) = (a_j·h28(s) + b_j) mod P
#: with h28(s) = the first 7 hex digits of md5(s) as an integer and P
#: the Mersenne prime 2^31−1. One md5 per shingle instead of one per
#: (shingle, hash) — 12× less hashing — and the affine mixing stays in
#: exact int64 (28-bit h × 31-bit a < 2^59), so Spark and DuckDB agree
#: bit-for-bit.
MERSENNE31 = 2147483647


def hash_params(num_hashes: int) -> list[tuple[int, int]]:
    return [((999983 * (j + 1)) % MERSENNE31,
             (998244353 * (j + 1)) % MERSENNE31)
            for j in range(num_hashes)]


def minhash_bands(df: DataFrame, id_col: str = "doc_id",
                  text_col: str = "text", k: int = 3,
                  num_hashes: int = 12, bands: int = 4,
                  membership: bool = False) -> DataFrame:
    """(id, band, bucket) — LSH band buckets from a MinHash signature.
    With ``membership=True``, ``df`` is already an (id, shingle) table
    (lets callers reuse one shingle pass across signature + verify).

    Hash family j is the universal family above; band b's bucket is the
    md5 of its signature rows joined in j order. Probability that two
    documents share ≥1 bucket ≈ 1 − (1 − J^r)^b with r = num_hashes/bands.

    Plan shape: explode shingles once, md5 each shingle ONCE, then ALL
    ``num_hashes`` minima in a single groupBy(id) — each hash is a
    two-op integer mix over the shared ``_h28``, so the inlined
    aggregates stay cheap in codegen (the historical pathological
    version inlined the SHINGLE expression per hash: 106 s vs 3 s on
    550 docs), map-side combine collapses every partition to one row
    per doc before the only shuffle, and band buckets derive from the
    signature columns map-side (no second shuffle)."""
    rows = num_hashes // bands
    base = (df if membership
            else shingle_sets(spread(df), id_col, text_col, k))
    sh = base.withColumn(
        "_h28",
        F.conv(F.substring(F.md5(F.col("shingle").cast("binary")), 1, 7),
               16, 10).cast("long"))
    # All num_hashes minima in ONE groupBy(id): the per-hash mix is a
    # two-op integer expression, so 12 inlined aggregates stay cheap in
    # codegen (the pathological version inlined the SHINGLE expression,
    # not the mix), map-side combine collapses each partition to one
    # row per doc, and the (id, j) shuffle + parameter cross-join of
    # the previous form disappear entirely.
    aggs = [
        F.min((F.lit(a) * F.col("_h28") + F.lit(b)) % MERSENNE31)
        .alias(f"_mh{j}")
        for j, (a, b) in enumerate(hash_params(num_hashes))
    ]
    sig = sh.groupBy(id_col).agg(*aggs)
    band_structs = [
        F.struct(
            F.lit(b).alias("band"),
            F.md5(F.concat_ws(",", *[
                F.col(f"_mh{b * rows + r}").cast("string")
                for r in range(rows)]).cast("binary")).alias("bucket"))
        for b in range(bands)
    ]
    return (sig.select(F.col(id_col),
                       F.explode(F.array(*band_structs)).alias("_bb"))
            .select(id_col, F.col("_bb.band").alias("band"),
                    F.col("_bb.bucket").alias("bucket")))


def shingle_sets(df: DataFrame, id_col: str = "doc_id",
                 text_col: str = "text", k: int = 3) -> DataFrame:
    """(id, shingle) exploded distinct shingle membership table
    (Arrow mapInPandas kernel — the Column-expression path is
    interpreted and ~7× slower; see text.shingle_rows)."""
    from data_ingest_spark.extensions.text import shingle_rows
    return shingle_rows(df, id_col=id_col, text_col=text_col, k=k)


def jaccard_of_pairs(pairs: DataFrame, membership: DataFrame,
                     id_col: str = "doc_id") -> DataFrame:
    """Exact Jaccard for candidate (id_a, id_b) pairs given the
    (id, shingle) membership table: |A∩B| via a shingle equi-join of
    the two sides, |A∪B| = |A|+|B|−|A∩B|. Work is proportional to the
    candidates' shingle lists, not to the corpus."""
    sizes = membership.groupBy(id_col).agg(F.count("*").alias("n"))
    a = membership.select(F.col(id_col).alias("id_a"), "shingle")
    b = membership.select(F.col(id_col).alias("id_b"), "shingle")
    inter = (
        pairs.join(a, "id_a").join(b, ["id_b", "shingle"])
        .groupBy("id_a", "id_b").agg(F.count("*").alias("_inter"))
    )
    return (
        inter
        .join(sizes.select(F.col(id_col).alias("id_a"), F.col("n").alias("_na")),
              "id_a")
        .join(sizes.select(F.col(id_col).alias("id_b"), F.col("n").alias("_nb")),
              "id_b")
        .select(
            "id_a", "id_b",
            (F.col("_inter")
             / (F.col("_na") + F.col("_nb") - F.col("_inter"))).alias("jaccard"),
        )
    )


def jaccard_of_pairs_two_sided(pairs: DataFrame, mem_a: DataFrame,
                               mem_b: DataFrame,
                               id_col: str = "doc_id") -> DataFrame:
    """Exact Jaccard for cross-corpus candidate pairs where ``id_a``
    comes from ``mem_a`` and ``id_b`` from ``mem_b``. Unlike unioning
    the two membership tables into :func:`jaccard_of_pairs`, this stays
    correct when the two corpora share id values — each side's sizes
    and the intersection resolve against its own table only."""
    size_a = mem_a.groupBy(id_col).agg(F.count("*").alias("_na"))
    size_b = mem_b.groupBy(id_col).agg(F.count("*").alias("_nb"))
    a = mem_a.select(F.col(id_col).alias("id_a"), "shingle")
    b = mem_b.select(F.col(id_col).alias("id_b"), "shingle")
    inter = (
        pairs.join(a, "id_a").join(b, ["id_b", "shingle"])
        .groupBy("id_a", "id_b").agg(F.count("*").alias("_inter"))
    )
    return (
        inter
        .join(size_a.select(F.col(id_col).alias("id_a"), "_na"), "id_a")
        .join(size_b.select(F.col(id_col).alias("id_b"), "_nb"), "id_b")
        .select(
            "id_a", "id_b",
            (F.col("_inter")
             / (F.col("_na") + F.col("_nb") - F.col("_inter"))).alias("jaccard"),
        )
    )


def near_dup_pairs(df: DataFrame, id_col: str = "doc_id",
                   text_col: str = "text", k: int = 3,
                   num_hashes: int = 12, bands: int = 4,
                   threshold: float = 0.6) -> DataFrame:
    """MinHash-LSH near-duplicate detection: band-bucket candidates,
    then exact-Jaccard verification, keeping pairs ≥ threshold.
    Returns (id_a, id_b, jaccard) with id_a < id_b."""
    # Shingling is the CPU hot path: widen a small/single-file scan to
    # all cores first (no-op at scale), and persist the two frames each
    # consumed by multiple joins — bands (candidate self-join) and the
    # shingle membership (sizes + both sides of the intersection join)
    # — so the tokenize→shingle→explode subtree runs once, not 5×.
    df = spread(df)
    # One shingle pass feeds BOTH the signature computation and the
    # exact-Jaccard verification.
    membership = shingle_sets(df, id_col, text_col, k).persist()
    bb = minhash_bands(membership, id_col, text_col, k, num_hashes, bands,
                       membership=True)
    cand = lsh_candidate_pairs(bb, id_col)
    return jaccard_of_pairs(cand, membership).filter(
        F.col("jaccard") >= threshold)


def lsh_candidate_pairs(bands: DataFrame,
                        id_col: str = "doc_id") -> DataFrame:
    """Distinct (id_a, id_b) candidate pairs (id_a < id_b) from an LSH
    band table (id, band, bucket) — the pre-verification stage of
    :func:`near_dup_pairs`, exposed so callers can audit the filter's
    PRECISION (what fraction of candidates verify) as well as compose
    custom verification.

    Plan shape: ONE groupBy(band, bucket) + a map-side ordered-pair
    expansion, instead of the historical band self-join (2 exchanges)
    — the collect_list per bucket is bounded by bucket occupancy, the
    same O(bucket²) the self-join would emit, and the cross-band dedup
    is the single remaining pair shuffle."""
    return (
        bands.groupBy("band", "bucket")
        .agg(F.sort_array(F.collect_list(F.col(id_col))).alias("_ids"))
        .filter(F.size("_ids") > 1)
        .select(F.explode(F.expr(
            "flatten(transform(_ids, (x, i) -> "
            "transform(slice(_ids, i + 2, size(_ids)), "
            "y -> struct(x AS id_a, y AS id_b))))")).alias("_p"))
        .select(F.col("_p.id_a").alias("id_a"),
                F.col("_p.id_b").alias("id_b"))
        .distinct()
    )


def jaccard_pairs_blocked(df: DataFrame, block_cols: list[str],
                          id_col: str = "doc_id", text_col: str = "text",
                          k: int = 3, threshold: float = 0.3) -> DataFrame:
    """Exact n-gram Jaccard over pairs sharing a blocking key (e.g.
    same source + same length band). The block join replaces LSH when
    a cheap domain key already bounds the candidate set."""
    keyed = spread(df).select(F.col(id_col), F.col(text_col),
                              F.concat_ws("\x01", *block_cols).alias("_blk"))
    left = keyed.select(F.col("_blk"), F.col(id_col).alias("id_a"))
    right = keyed.select(F.col("_blk"), F.col(id_col).alias("id_b"))
    cand = (
        left.join(right, "_blk")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
    )
    membership = shingle_sets(keyed, id_col, text_col, k)
    return jaccard_of_pairs(cand, membership).filter(
        F.col("jaccard") >= threshold)


def dup_clusters(pairs: DataFrame, id_cols: tuple[str, str] = ("id_a", "id_b"),
                 max_iter: int = 20,
                 checkpoint_every: int = 5,
                 check_every: int | None = None) -> DataFrame:
    """(doc_id, cluster) — connected components over a duplicate-pair
    edge list; cluster = the component's minimum doc id, so labels are
    canonical and engine-exact (integer min, no floats).

    Distributed min-label propagation: each round every node takes the
    min of its own label and its neighbors' labels — one join + one
    groupBy per round, converging in O(component diameter) rounds
    (near-dup clusters are shallow: most are cliques from a shared
    bucket). Lineage is truncated lazily EVERY round (the label frame
    is referenced twice per round, so any longer cadence grows the
    plan tree 2^k between barriers); ``checkpoint_every`` therefore
    only sets the DEFAULT convergence-test cadence. ``check_every``
    overrides that cadence —
    shallow duplicate graphs converge in 2-3 rounds, so callers that
    know their components are flat (entity resolution, exact-dup
    stars) pass 1 and stop paying for rounds 3-5; each test is one
    count over the label frame, so leave the default for graphs whose
    per-round state is expensive. The canonical corpus then follows
    with one semi-join on (doc_id = cluster)."""
    from data_ingest_spark.operators.clustering import pin_partitioning
    a, b = id_cols
    # pin hash(dst) across all min-propagation rounds (persisted
    # repartition — a checkpoint alone loses the partitioning under
    # AQE; see clustering.pin_partitioning): the per-round neighbor
    # join then only exchanges the node-sized label frame.
    edges = pin_partitioning(
        pairs.select(F.col(a).alias("src"), F.col(b).alias("dst"))
        .unionByName(pairs.select(F.col(b).alias("src"),
                                  F.col(a).alias("dst")))
        .distinct(), "dst")
    labels = (edges.select(F.col("src").alias("id")).distinct()
              .withColumn("lbl", F.col("id")))
    for i in range(max_iter):
        nbr_min = (edges.join(labels.select(F.col("id").alias("dst"),
                                            F.col("lbl").alias("_nl")), "dst")
                   .groupBy("src").agg(F.min("_nl").alias("_nm")))
        new_labels = (labels.join(nbr_min.withColumnRenamed("src", "id"),
                                  "id", "left")
                      .select("id", F.least("lbl", F.coalesce("_nm", "lbl"))
                              .alias("lbl"))
                      # every round, lazily: labels(i) references
                      # labels(i-1) twice (vote join + min-merge), so
                      # a cadence-k barrier lets the plan tree grow
                      # 2^k between checkpoints (the LPA finding)
                      .localCheckpoint(eager=False))
        if (i + 1) % (check_every or checkpoint_every) == 0:
            changed = (new_labels.alias("n")
                       .join(labels.alias("o"), "id")
                       .filter("n.lbl != o.lbl").count())
            if changed == 0:
                labels = new_labels
                break
        labels = new_labels
    return labels.select(F.col("id").alias("doc_id"),
                         F.col("lbl").alias("cluster"))


def dedup_against(incoming: DataFrame, existing: DataFrame,
                  id_col: str = "doc_id",
                  text_col: str = "text") -> DataFrame:
    """Incremental dedup: incoming rows whose content does not already
    appear in the existing corpus (and is not duplicated within the
    incoming batch itself — smallest id wins there).

    The existing side reduces to DISTINCT content hashes before the
    anti-join, so the shuffle carries one 32-byte row per unique
    existing document, not the corpus. This is the daily-ingest
    primitive at 100 TB: the hash set is also the natural thing to
    persist (bucketed by hash) so tomorrow's batch joins co-located.
    """
    h = F.md5(F.col(text_col).cast("binary"))
    seen = existing.select(h.alias("_h")).distinct()
    batch_first = (
        incoming.withColumn("_h", h)
        .withColumn("_rk", F.row_number().over(
            W.partitionBy("_h").orderBy(F.col(id_col).asc())))
        .filter(F.col("_rk") == 1)
    )
    return (batch_first.join(seen, "_h", "left_anti")
            .drop("_h", "_rk"))


def near_dups_against(incoming: DataFrame, existing: DataFrame,
                      id_col: str = "doc_id", text_col: str = "text",
                      k: int = 3, num_hashes: int = 12, bands: int = 4,
                      threshold: float = 0.6) -> DataFrame:
    """Incremental FUZZY dedup: incoming docs that near-duplicate the
    existing corpus. Returns ``(id_new, id_old, jaccard)`` pairs with
    jaccard >= threshold — anti-join incoming against ``id_new`` to
    keep only genuinely novel documents.

    The fuzzy companion to :func:`dedup_against`: candidates come from
    an LSH band-bucket join BETWEEN the two corpora (never within one,
    never all-pairs), verified by exact Jaccard over both membership
    tables. At 100 TB the existing side's (id, band, bucket) table and
    shingle membership are the artifacts to persist, bucketed by
    ``bucket`` — each daily batch then joins co-located against
    yesterday's state instead of re-shingling the archive."""
    inc_m = shingle_sets(spread(incoming), id_col, text_col, k).persist()
    ex_m = shingle_sets(spread(existing), id_col, text_col, k).persist()
    inc_b = minhash_bands(inc_m, id_col, text_col, k, num_hashes, bands,
                          membership=True)
    ex_b = minhash_bands(ex_m, id_col, text_col, k, num_hashes, bands,
                         membership=True)
    cand = (
        inc_b.select("band", "bucket", F.col(id_col).alias("id_a"))
        .join(ex_b.select("band", "bucket", F.col(id_col).alias("id_b")),
              ["band", "bucket"])
        .select("id_a", "id_b").distinct()
    )
    # Two-sided verification: each side's shingle sizes/intersections
    # resolve against its own membership table, so incoming and
    # existing corpora may legitimately share id values.
    return (jaccard_of_pairs_two_sided(cand, inc_m, ex_m)
            .filter(F.col("jaccard") >= threshold)
            .select(F.col("id_a").alias("id_new"),
                    F.col("id_b").alias("id_old"), "jaccard"))


def decontaminate(corpus: DataFrame, benchmark: DataFrame, k: int = 3,
                  id_col: str = "doc_id",
                  text_col: str = "text") -> DataFrame:
    """Benchmark decontamination: for each corpus document, count how
    many of its distinct word ``k``-shingles also occur anywhere in the
    ``benchmark`` set (the standard n-gram-overlap test-set-leakage
    check for training corpora). Returns
    ``(doc_id, n_hit_shingles, n_shingles, contaminated)`` for
    documents with at least one hit; join back anti-style to drop them.

    Plan shape: the benchmark side collapses to DISTINCT shingles
    before the join — at 100 TB the corpus explodes scan-side while the
    benchmark (test sets are tiny) broadcasts. Hit marking is a LEFT
    broadcast join, so the shingle count and the hit count come out of
    ONE groupBy(doc_id) over a single corpus scan — no second
    evaluation of the (interpreted-lambda) shingle expression. No
    all-pairs comparison anywhere.
    """
    from data_ingest_spark.extensions.text import shingle_rows
    bench_sh = (shingle_rows(benchmark, id_col=id_col, text_col=text_col,
                             k=k)
                .select(F.col("shingle").alias("_sh")).distinct()
                .withColumn("_hit", F.lit(1)))
    corpus_sh = (shingle_rows(corpus, id_col=id_col, text_col=text_col,
                              k=k)
                 .withColumnRenamed("shingle", "_sh"))
    marked = corpus_sh.join(F.broadcast(bench_sh), "_sh", "left")
    agg = marked.groupBy(id_col).agg(
        F.count("*").alias("n_shingles"),
        F.sum(F.coalesce(F.col("_hit"), F.lit(0))).alias("n_hit_shingles"))
    return (agg.filter(F.col("n_hit_shingles") > 0)
            .select(id_col, "n_hit_shingles", "n_shingles",
                    F.lit(True).alias("contaminated")))


def cap_repetitions(df: DataFrame, k: int = 2, id_col: str = "doc_id",
                    text_col: str = "text", seed: int = 5) -> DataFrame:
    """Repetition control: keep at most ``k`` copies of any identical
    content (training corpora tolerate a few repeats, not hundreds).
    Survivors are chosen by content-addressed hash order (seeded md5 of
    the id, tie-broken by id) so the kept set is layout-stable; the
    window partitions by content hash — parallel across contents, and
    the heaviest key's partition is bounded by the largest duplicate
    group, which capping itself keeps from mattering downstream."""
    from data_ingest_spark.extensions.sampling import hash_bucket
    h = F.md5(F.col(text_col).cast("binary"))
    b = hash_bucket(F.col(id_col), seed)
    w = W.partitionBy("_h").orderBy(b.asc(), F.col(id_col).asc())
    return (df.withColumn("_h", h)
            .withColumn("_rk", F.row_number().over(w))
            .filter(F.col("_rk") <= k)
            .drop("_h", "_rk"))


def substring_dedup(df: DataFrame, n: int = 20, id_col: str = "doc_id",
                    text_col: str = "text") -> DataFrame:
    """Exact-substring deduplication: remove every token span that
    repeats an ``n``-token window occurring anywhere else in the
    corpus, keeping exactly one (the globally first) occurrence per
    window — the technique shown to improve LM training ("deduping
    training data" with suffix-array exact matches; this is the
    n-gram-postings formulation of it, which distributes as plain
    groupBys/joins instead of a monolithic suffix array).

    Contract (deterministic, whitespace-canonical):

    1. tokens = text split on whitespace, positions 0-based;
    2. every n-token window hashes to md5 of its space-joined tokens;
    3. a window value seen at >1 (doc, pos) sites is DUPLICATED; its
       keeper is the smallest (doc, pos) site (lexicographic);
    4. token (d, i) is removed iff some non-keeper duplicated site
       (d, s) covers it (s ≤ i < s+n);
    5. clean_text = kept tokens joined by single spaces (canonical
       whitespace — same normalization both engines apply).

    Docs with < n tokens pass through untouched. Returns
    (id, clean_text, n_removed) sorted-stable for hashing.

    Scale shape: windows explode ≈ tokens× rows but immediately
    collapse in a partial-agg'd groupBy(hash); non-keeper spans —
    and only those — re-explode to (doc, pos) keys for an equi
    anti-join (never a range join), so post-shuffle volume is
    proportional to the duplicated text, not the corpus.
    """
    toks = df.select(
        F.col(id_col), F.split(F.col(text_col), r"\s+").alias("_tk"))
    # (doc, pos, token) with positions; windows only where a full
    # n-token slice exists
    win = toks.select(
        F.col(id_col),
        F.posexplode(F.expr(
            f"CASE WHEN size(_tk) >= {n} THEN "
            f"transform(sequence(1, size(_tk) - {n} + 1), "
            f"i -> array_join(slice(_tk, i, {n}), ' ')) "
            "ELSE array() END")).alias("pos", "_w"))
    sites = win.select(id_col, "pos", F.md5(F.col("_w").cast("binary"))
                       .alias("_h"))
    wk = W.partitionBy("_h").orderBy(F.col(id_col).asc(), F.col("pos").asc())
    marked = (sites
              .withColumn("_rk", F.row_number().over(wk))
              .withColumn("_n_sites", F.count("*").over(W.partitionBy("_h"))))
    removal_spans = marked.filter(
        (F.col("_n_sites") > 1) & (F.col("_rk") > 1)).select(id_col, "pos")
    # span -> covered token positions (equi keys, no range join)
    covered = removal_spans.select(
        id_col, F.explode(F.expr(
            f"sequence(pos, pos + {n} - 1)")).alias("tpos")).distinct()
    tok_rows = toks.select(
        id_col, F.posexplode("_tk").alias("tpos", "token"))
    kept = tok_rows.join(covered, [id_col, "tpos"], "left_anti")
    total = toks.select(id_col, F.size("_tk").alias("_tot"))
    agg = (kept.groupBy(id_col)
           .agg(F.array_join(
                    F.transform(
                        F.array_sort(F.collect_list(
                            F.struct("tpos", "token"))),
                        lambda s: s["token"]), " ").alias("clean_text"),
                F.count("*").alias("_kept")))
    return (total.join(agg, id_col, "left")
            .select(id_col,
                    F.coalesce("clean_text", F.lit("")).alias("clean_text"),
                    (F.col("_tot") - F.coalesce("_kept", F.lit(0)))
                    .cast("long").alias("n_removed")))


def line_boilerplate_removal(df: DataFrame, min_docs: int = 2,
                             id_col: str = "doc_id",
                             text_col: str = "text",
                             sep: str = "\n") -> DataFrame:
    """Line-level boilerplate removal: drop every line that appears in
    ≥ ``min_docs`` DISTINCT documents (headers, nav bars, cookie
    banners — the line-dedup pass web-curation pipelines run before
    document-level dedup). Unlike :func:`substring_dedup` no occurrence
    is kept: a line shared widely enough is boilerplate everywhere.

    Contract: lines = text split on ``sep`` (no trimming — byte-exact
    matching); output text = kept lines rejoined with ``sep`` in
    original order; (id, clean_text, n_removed_lines).

    Scale shape: explode → groupBy(line-hash) with countDistinct(doc)
    (partial aggs both levels) → anti-join back. Post-shuffle volume is
    the distinct-line table; the anti-join keys on the line hash, so
    skew from empty/short boilerplate lines is bounded by distinct
    values, and AQE handles the hot keys.
    """
    lines = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), sep)).alias("pos", "line"))
    boiler = (lines
              .groupBy(F.md5(F.col("line").cast("binary")).alias("_lh"))
              .agg(F.countDistinct(F.col(id_col)).alias("_nd"))
              .filter(F.col("_nd") >= min_docs)
              .select("_lh"))
    kept = (lines
            .withColumn("_lh", F.md5(F.col("line").cast("binary")))
            .join(boiler, "_lh", "left_anti"))
    total = df.select(
        id_col, F.size(F.split(F.col(text_col), sep)).alias("_tot"))
    agg = (kept.groupBy(id_col)
           .agg(F.array_join(
                    F.transform(
                        F.array_sort(F.collect_list(
                            F.struct("pos", "line"))),
                        lambda s: s["line"]), sep).alias("clean_text"),
                F.count("*").alias("_kept")))
    return (total.join(agg, id_col, "left")
            .select(id_col,
                    F.coalesce("clean_text", F.lit("")).alias("clean_text"),
                    (F.col("_tot") - F.coalesce("_kept", F.lit(0)))
                    .cast("long").alias("n_removed_lines")))


def containment_pairs(df: DataFrame, id_col: str = "doc_id",
                      text_col: str = "text", k: int = 3,
                      threshold: float = 0.8,
                      max_df: int = 1000) -> DataFrame:
    """Asymmetric containment detection: (contained_id, container_id,
    containment) pairs where C(A→B) = |shingles(A) ∩ shingles(B)| /
    |shingles(A)| ≥ threshold — catches excerpts/quotes swallowed by a
    longer document, which Jaccard-based near-dup misses (a 10-token
    excerpt of a 1000-token doc has J ≈ 0.01 but containment 1.0).

    Candidates come from an inverted shingle index with a
    document-frequency cap: shingles appearing in > ``max_df`` docs
    (template/boilerplate shingles) are dropped from candidate
    generation — the standard bound that keeps the posting-list
    self-join from exploding on common phrases at corpus scale. The
    containment denominator still uses the FULL shingle-set size, so
    the cap can only lose candidates (documented recall dial), never
    corrupt a reported score.

    (A PPJoin-style prefix filter — generate candidates only from each
    contained doc's ``floor(ra − threshold·sz) + 1`` rarest capped
    shingles, then verify exact intersections per candidate pair —
    was built and measured-REJECTED at the round-8 sf1 sweep: on a
    high-collision corpus the candidate set is ~unique pairs (56M at
    sf1, barely deduplicated), so the per-pair verify RE-EXPANDS to
    candidates × |shingles(A)| ≈ 2.8B rows and runs 440+ s where the
    direct co-occurrence count below streams its Σ df² ≈ 309M rows
    through one partially-aggregating groupBy in 77 s. Prefix+verify
    only wins when candidates are scarce; co-occurrence density is
    this operator's true output-shaped cost.)
    """
    df = spread(df)
    membership = shingle_sets(df, id_col, text_col, k).persist()
    sizes = membership.groupBy(id_col).agg(F.count("*").alias("_sz"))
    rare = (membership.groupBy("shingle")
            .agg(F.count("*").alias("_df"))
            .filter(F.col("_df") <= max_df)
            .select("shingle"))
    m = membership.join(rare, "shingle", "left_semi")
    a = m.select(F.col(id_col).alias("contained_id"), "shingle")
    b = m.select(F.col(id_col).alias("container_id"), "shingle")
    inter = (a.join(b, "shingle")
             .filter(F.col("contained_id") != F.col("container_id"))
             .groupBy("contained_id", "container_id")
             .agg(F.count("*").alias("_inter")))
    # threshold on the RAW int/int ratio (identical in any engine);
    # rounding is presentation-only — filtering on the rounded value
    # would admit ratios that round up across the threshold
    return (inter
            .join(sizes.select(F.col(id_col).alias("contained_id"),
                               F.col("_sz").alias("_sa")), "contained_id")
            .filter(F.col("_inter") / F.col("_sa") >= threshold)
            .select("contained_id", "container_id",
                    F.round(F.col("_inter") / F.col("_sa"), 6)
                    .alias("containment")))


def remove_contained(df: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text", k: int = 3,
                     threshold: float = 0.8,
                     max_df: int = 1000) -> DataFrame:
    """Corpus after dropping every document that is ≥ ``threshold``
    contained in some OTHER document (the excerpt-removal pass on top
    of :func:`containment_pairs`). Mutual containment (near-identical
    docs) keeps the smaller id: a pair where each contains the other
    would otherwise delete both."""
    # pairs feeds the mutual self-join AND two drop-set branches:
    # persist the (bounded) pair table so the shingle/inverted-index
    # subtree underneath runs once, not four times.
    pairs = containment_pairs(df, id_col, text_col, k, threshold,
                              max_df).persist()
    mutual = (pairs.alias("p")
              .join(pairs.alias("q"),
                    (F.col("p.contained_id") == F.col("q.container_id"))
                    & (F.col("p.container_id") == F.col("q.contained_id")),
                    "left_semi"))
    drop = (pairs.join(mutual.select("contained_id", "container_id"),
                       ["contained_id", "container_id"], "left_anti")
            .select("contained_id")
            .unionByName(
                mutual.filter(F.col("contained_id") > F.col("container_id"))
                .select("contained_id"))
            .distinct())
    return df.join(drop, df[id_col] == drop["contained_id"], "left_anti")


def soft_dedup_weights(df: DataFrame, id_col: str = "doc_id",
                      text_col: str = "text") -> DataFrame:
    """Soft deduplication: instead of dropping exact duplicates, emit a
    per-document sampling weight 1/|cluster| (so each distinct content
    contributes one unit of expected training mass regardless of how
    many copies crawled in). Returns ``(id, cluster_size, weight)``.

    One content-hash groupBy plus a hash-keyed join back — the shuffle
    carries (hash, size) rows. The down-weighting alternative modern
    curation pipelines use when hard dedup would discard too much of
    the head distribution."""
    h = F.md5(F.col(text_col).cast("binary"))
    keyed = df.select(F.col(id_col), h.alias("_h"))
    sizes = keyed.groupBy("_h").agg(F.count("*").cast("long")
                                    .alias("cluster_size"))
    return (keyed.join(sizes, "_h")
            .select(id_col, "cluster_size",
                    F.round(F.lit(1.0) / F.col("cluster_size"), 9)
                    .alias("weight")))


def ngram_novelty(df: DataFrame, id_col: str = "doc_id",
                  text_col: str = "text", k: int = 3) -> DataFrame:
    """Per-document content novelty in corpus (id) order: the fraction
    of a doc's distinct word k-shingles whose FIRST appearance (lowest
    id over all docs containing them) is this doc. Returns
    ``(id, n_shingles, n_novel, novelty)``.

    The curation metric between exact and near dedup: a rehash of
    earlier content scores near 0 without being any single document's
    duplicate. Two shuffles — first-seen per shingle, then the
    per-doc reduce — both keyed on high-cardinality columns."""
    m = shingle_sets(df, id_col, text_col, k)
    first = m.groupBy("shingle").agg(F.min(id_col).alias("_first"))
    return (m.join(first, "shingle")
            .groupBy(id_col)
            .agg(F.count("*").cast("long").alias("n_shingles"),
                 F.sum((F.col("_first") == F.col(id_col)).cast("long"))
                 .cast("long").alias("n_novel"))
            .withColumn("novelty",
                        F.round(F.col("n_novel") / F.col("n_shingles"), 9)))


def paragraph_dedup(df: DataFrame, id_col: str = "doc_id",
                    text_col: str = "text",
                    sep_regex: str = r"\. ",
                    join_sep: str = ". ") -> DataFrame:
    """Corpus-global EXACT paragraph dedup with first-occurrence
    survivorship (the CCNet paragraph pass): every paragraph that
    appears anywhere else in the corpus keeps only its FIRST
    occurrence — ordered by (doc id, position) — and is dropped from
    every later document. Complements :func:`line_boilerplate_removal`
    (which drops by document-frequency threshold with NO survivor) —
    here shared content survives exactly once, the contract for "keep
    the canonical copy, strip the mirrors".

    Returns ``(id, clean_text, n_dropped)``: kept paragraphs rejoined
    with ``join_sep`` in original order; a fully-deduplicated document
    yields ''.

    Scale shape: paragraphs explode scan-side; ONE shuffle keyed by
    the paragraph hash ranks occurrences (skew bounded by the dup
    count of the hottest paragraph — AQE splits it); reassembly is one
    groupBy(doc). Never joins the corpus to itself."""
    paras = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), sep_regex))
        .alias("_pos", "_para"))
    w = W.partitionBy("_ph").orderBy(id_col, "_pos")
    kept = (paras
            .withColumn("_ph", F.md5(F.col("_para").cast("binary")))
            .withColumn("_rk", F.row_number().over(w))
            .filter(F.col("_rk") == 1))
    total = df.select(
        id_col, F.size(F.split(F.col(text_col), sep_regex)).alias("_tot"))
    agg = (kept.groupBy(id_col)
           .agg(F.array_join(
                    F.transform(
                        F.array_sort(F.collect_list(
                            F.struct("_pos", "_para"))),
                        lambda s: s["_para"]), join_sep).alias("clean_text"),
                F.count("*").alias("_kept")))
    return (total.join(agg, id_col, "left")
            .select(id_col,
                    F.coalesce("clean_text", F.lit("")).alias("clean_text"),
                    (F.col("_tot") - F.coalesce("_kept", F.lit(0)))
                    .cast("long").alias("n_dropped")))


def resolve_entities(df: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text", k: int = 3,
                     threshold: float = 0.6,
                     max_block: int = 50) -> DataFrame:
    """End-to-end entity resolution: blocking → exact pairwise
    similarity → connected components → canonical entity labels. The
    pipeline every multi-source ingest needs to answer "which of these
    records are the same thing" before dedup/merge decisions.

    Stages (all existing primitives, composed):
    1. Block on the lower-cased first two tokens; blocks larger than
       ``max_block`` are skipped entirely (the standard superblock
       guard — a hot key like an empty title would otherwise go
       quadratic; skipped mass is recoverable via a second pass with a
       finer key).
    2. Candidate pairs = within-block id-ordered self-join; scored
       with exact word-``k``-shingle Jaccard via the membership-row
       join (:func:`jaccard_of_pairs` — work ∝ candidate shingle
       lists, never corpus²).
    3. Matches (jaccard ≥ ``threshold``) feed :func:`dup_clusters`
       (min-label propagation to convergence), so transitive matches
       (A≈B≈C with A,C never compared) still land in one entity.
    4. Every input row gets ``entity_id`` = its component's min id
       (itself if unmatched) and the entity's member count.

    Returns ``(id, entity_id, n_members)``.
    """
    from data_ingest_spark.extensions.text import tokens_col

    toks = tokens_col(text_col)
    keyed = df.select(id_col, text_col).withColumn(
        "_blk", F.concat_ws(" ", F.get(toks, 0), F.get(toks, 1)))
    ok = (keyed.groupBy("_blk").agg(F.count("*").alias("_bn"))
          .filter(F.col("_bn") <= max_block).select("_blk"))
    kb = keyed.join(ok, "_blk").localCheckpoint(eager=False)
    cand = (kb.select("_blk", F.col(id_col).alias("id_a"))
            .join(kb.select("_blk", F.col(id_col).alias("id_b")), "_blk")
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b"))
    membership = shingle_sets(kb, id_col, text_col, k).localCheckpoint(
        eager=False)
    edges = (jaccard_of_pairs(cand, membership, id_col)
             .filter(F.col("jaccard") >= threshold)
             .select("id_a", "id_b"))
    clusters = (dup_clusters(edges, check_every=1)
                .withColumnRenamed("doc_id", "_cid"))
    ent = (df.select(id_col)
           .join(clusters, F.col(id_col) == F.col("_cid"), "left")
           .select(F.col(id_col),
                   F.coalesce("cluster", F.col(id_col))
                   .alias("entity_id")))
    sizes = (ent.groupBy("entity_id")
             .agg(F.count("*").cast("long").alias("n_members")))
    return ent.join(sizes, "entity_id").select(
        id_col, "entity_id", "n_members")


def ppjoin(df: DataFrame, id_col: str = "doc_id",
           text_col: str = "text", k: int = 3,
           threshold_num: int = 3, threshold_den: int = 5) -> DataFrame:
    """Exact set-similarity self-join via prefix filtering (the
    PPJoin/AllPairs family, Bayardo 2007 / Xiao 2008): every document
    is reduced to its distinct word-``k``-shingle set, shingles get a
    GLOBAL rarity order (df asc, shingle asc), and only each set's
    first n − ceil(t·n) + 1 shingles in that order (its "prefix") are
    indexed. Two sets with Jaccard ≥ t MUST share a prefix token
    (pigeonhole on the shared total order), so joining on prefix
    shingles has perfect recall while indexing only the rarest sliver
    of each document — the candidate count follows the df of RARE
    shingles, which is what makes this the exact-join workhorse where
    LSH's probabilistic recall isn't acceptable.

    The threshold is the rational ``threshold_num/threshold_den`` so
    the prefix length n − ⌈t·n⌉ + 1 is exact integer arithmetic
    (⌈t·n⌉ = (num·n + den − 1) div den). The global order is the
    TUPLE (df, shingle) used directly — prefix filtering only needs a
    consistent total order, so no dense id is materialized (a dense
    rank would funnel the whole df=1 band, the vast majority of any
    real corpus's shingles, through one partition). Candidates join
    on the prefix shingle itself and are verified with the exact
    membership-row Jaccard (:func:`jaccard_of_pairs`).
    Returns ``(id_a, id_b, jaccard)`` (rounded 6dp) for all pairs
    with Jaccard ≥ t.
    """
    # One materialization feeds df-counts, sizes, the prefix window,
    # and both verify sides — without it the shingle kernel and the
    # corpus scan replay once per consumer (the static plan shows 20
    # scans; checkpointed it is one).
    mem = shingle_sets(df, id_col, text_col, k).localCheckpoint(
        eager=False)
    dfreq = mem.groupBy("shingle").agg(F.count("*").alias("_df"))
    sizes = mem.groupBy(id_col).agg(F.count("*").alias("_n"))
    pref_len = (F.col("_n")
                - F.floor((F.lit(threshold_num) * F.col("_n")
                           + F.lit(threshold_den) - 1)
                          / F.lit(threshold_den)) + 1)
    wdoc = W.partitionBy(id_col).orderBy("_df", "shingle")
    # NO checkpoint on the prefix table: pa and pb are canonically
    # identical subtrees, so AQE's stage/exchange reuse already
    # materializes the df-join + rarity window ONCE and replays the
    # shuffle files for the second side. A localCheckpoint here was
    # measured (r10, 6 reps per variant, isolated session) at
    # 5.7–8.7 s vs 2.9–3.7 s without — the checkpoint serializes the
    # full prefix table through block-manager storage and, worse,
    # severs the subtree from AQE so each side loses the coalesced
    # runtime statistics. Exchange reuse is the cheaper dedup.
    pref = (mem.join(dfreq, "shingle").join(sizes, id_col)
            .withColumn("_pos", F.row_number().over(wdoc))
            .filter(F.col("_pos") <= pref_len)
            .select(id_col, "shingle", "_pos", "_n"))
    # Length + positional filters (the PP in PPJoin — both are EXACT
    # upper-bound prunes, so recall stays perfect and the verified
    # result is unchanged): Jaccard ≥ t ⟺ overlap ≥ ⌈t/(1+t)·(na+nb)⌉
    # =: α (integer arithmetic on the rational t), and a candidate
    # seen at prefix positions (pa, pb) can overlap at most
    # 1 + min(na−pa, nb−pb). Without these, a corpus with NO rare
    # shingles (the synthetic fixed-vocab fixture at sf1) candidate-
    # explodes quadratically: measured 454 s → the filters prune
    # before the distinct and the membership verify join.
    num, den = threshold_num, threshold_den
    pa = pref.select(F.col(id_col).alias("id_a"), "shingle",
                     F.col("_pos").alias("_pa"), F.col("_n").alias("_na"))
    pb = pref.select(F.col(id_col).alias("id_b"), "shingle",
                     F.col("_pos").alias("_pb"), F.col("_n").alias("_nb"))
    alpha = F.ceil((F.lit(num) * (F.col("_na") + F.col("_nb")))
                   / F.lit(num + den))
    ubound = 1 + F.least(F.col("_na") - F.col("_pa"),
                         F.col("_nb") - F.col("_pb"))
    # Explicit-count repartition on the pair key before the distinct
    # (the x90 lesson, guide §2.5): the surviving candidate pairs are
    # kilobytes-to-megabytes, so an optimizer-placed exchange here
    # gets AQE-coalesced to 1-2 tasks and SERIALIZES the whole
    # downstream verify (per-pair array_intersect over full shingle
    # sets — the expansion work); the bench measured a 15x rep spread
    # from exactly this. A user repartition on the distinct's own key
    # set satisfies its distribution requirement (partition-local
    # dedup stays exact), carries the same partitioning into the
    # verify join's stream side, and AQE never coalesces it.
    n_part = df.sparkSession.sparkContext.defaultParallelism
    cand = (pa.join(pb, "shingle")
            .filter((F.col("id_a") < F.col("id_b"))
                    & (F.lit(den) * F.col("_nb")
                       >= F.lit(num) * F.col("_na"))
                    & (F.lit(den) * F.col("_na")
                       >= F.lit(num) * F.col("_nb"))
                    & (ubound >= alpha))
            .select("id_a", "id_b")
            .repartition(n_part, F.col("id_a"), F.col("id_b"))
            .distinct())
    # Verify with ONE row per candidate: per-doc sorted shingle
    # arrays + array_intersect, instead of exploding every candidate
    # by its membership rows (the jaccard_of_pairs shape — candidates
    # × ~|set| intermediate rows, the dominant cost once the corpus
    # has no rare shingles). Sets are distinct by construction, so
    # |A∩B| from array_intersect is exact.
    # (No checkpoint here: the id_a/id_b consumers' subtrees are
    # canonically identical, so AQE's stage cache already reuses one
    # materialized aggregate — measured r10: a checkpoint added a
    # barrier and zero speedup.)
    sets_arr = (mem.groupBy(id_col)
                .agg(F.array_sort(F.collect_list("shingle"))
                     .alias("_set"), F.count("*").alias("_n")))
    t = threshold_num / threshold_den
    inter = F.size(F.array_intersect("_sa", "_sb"))
    return (cand
            .join(sets_arr.select(F.col(id_col).alias("id_a"),
                                  F.col("_set").alias("_sa"),
                                  F.col("_n").alias("_na")), "id_a")
            .join(sets_arr.select(F.col(id_col).alias("id_b"),
                                  F.col("_set").alias("_sb"),
                                  F.col("_n").alias("_nb")), "id_b")
            .withColumn("_i", inter)
            .withColumn("jaccard",
                        F.col("_i") / (F.col("_na") + F.col("_nb")
                                       - F.col("_i")))
            .filter(F.col("jaccard") >= t)
            .select("id_a", "id_b",
                    F.round("jaccard", 6).alias("jaccard")))


def blocked_pairs(df: DataFrame, block_cols: list[str],
                  id_col: str = "doc_id") -> DataFrame:
    """Generic blocking-key pair generator: all within-block ordered
    pairs (``<col>_a``, ``<col>_b`` for every non-block column, block
    columns kept once). The record-linkage front half — comparison
    features and scoring compose on top (:func:`fellegi_sunter_score`).

    100 TB posture: the self-join keys on the block columns, so the
    shuffle is partitioned by block and pair count is Σ|block|² — never
    all-pairs. Oversized blocks (degenerate keys) are the skew risk;
    AQE skew-split handles moderate cases, and a production run caps
    block size the same way fingerprint_pairs caps posting lists."""
    rest = [c for c in df.columns if c not in block_cols]
    a = df.select(*block_cols,
                  *[F.col(c).alias(f"{c}_a") for c in rest])
    b = df.select(*block_cols,
                  *[F.col(c).alias(f"{c}_b") for c in rest])
    return a.join(b, block_cols).filter(
        F.col(f"{id_col}_a") < F.col(f"{id_col}_b"))


def fellegi_sunter_score(pairs: DataFrame, feature_cols: list[str],
                         m: list[float], u: list[float],
                         upper: float = 3.0,
                         lower: float = 0.0) -> DataFrame:
    """Fellegi–Sunter probabilistic record linkage over candidate
    pairs with boolean comparison-feature columns: per-feature
    agreement weight ln(m/u) and disagreement weight ln((1−m)/(1−u)),
    summed to a total match weight, thresholded into
    match / possible / nonmatch.

    Determinism: the weights are computed DRIVER-side from the m/u
    literals and embedded as double constants (rounded to 9dp), so
    both engines sum identical numbers — no runtime libm in the
    checked expression. m/u here are fixed inputs (the classical EM
    estimation step is out of scope; at scale it is two aggregation
    passes over the same feature columns)."""
    import math
    total = F.lit(0.0)
    for feat, mi, ui in zip(feature_cols, m, u):
        wa = round(math.log(mi / ui), 9)
        wd = round(math.log((1 - mi) / (1 - ui)), 9)
        total = total + F.when(F.col(feat), F.lit(wa)).otherwise(F.lit(wd))
    return pairs.withColumn("weight", F.round(total, 6)).withColumn(
        "decision",
        F.when(F.col("weight") >= upper, F.lit("match"))
        .when(F.col("weight") >= lower, F.lit("possible"))
        .otherwise(F.lit("nonmatch")))


def sorted_neighborhood_pairs(df: DataFrame, key: "F.Column",
                              window: int = 3,
                              id_col: str = "doc_id") -> DataFrame:
    """Sorted-neighborhood method (Hernández & Stolfo): sort the
    corpus by a cheap blocking key, compare only records within a
    sliding window of ``window`` positions. Returns candidate pairs
    with both payloads (``<col>_a`` / ``<col>_b``), id-normalized so
    ``id_col + '_a' < id_col + '_b'``.

    The global order comes from the W5 two-pass dense-rank scheme
    (rank within the key's first character, offset by the collected
    per-prefix counts — windows.dense_ids_scalable), so there is no
    single-task global sort and no unpartitioned WindowExec; the
    neighbor join is an equi-join on the dense rank, shuffled by rank.
    Pair count is exactly window·n — linear in the corpus."""
    from data_ingest_spark.operators.windows import dense_ids_scalable
    # A NULL key would sort first in Spark but last in DuckDB (and
    # make the window nondeterministic) — pin it to the empty string.
    keyed = df.withColumn("_key", F.coalesce(key, F.lit(""))).withColumn(
        "_pk", F.substring(F.col("_key"), 1, 1))
    # lazy checkpoint: the rank frame feeds BOTH pair sides; without
    # it the 3-shuffle dense-id subtree duplicates in the static plan
    ranked = (dense_ids_scalable(keyed, order=["_pk", "_key", id_col],
                                 id_col="_rn").drop("_pk", "_key")
              .localCheckpoint(eager=False))
    rest = [c for c in df.columns]
    a = ranked.select(F.col("_rn"),
                      *[F.col(c).alias(f"{c}_a") for c in rest])
    b = (ranked.select(F.col("_rn").alias("_rnb"),
                       *[F.col(c).alias(f"{c}_b") for c in rest])
         .withColumn("_off", F.explode(F.array(
             *[F.lit(i) for i in range(1, window + 1)])))
         .withColumn("_rn", F.col("_rnb") - F.col("_off"))
         .drop("_rnb", "_off"))
    swap = F.col(f"{id_col}_a") > F.col(f"{id_col}_b")
    paired = a.join(b, "_rn").drop("_rn")
    out = [F.when(swap, F.col(f"{c}_b")).otherwise(F.col(f"{c}_a"))
           .alias(f"{c}_a") for c in rest]
    out += [F.when(swap, F.col(f"{c}_a")).otherwise(F.col(f"{c}_b"))
            .alias(f"{c}_b") for c in rest]
    return paired.select(*out)


def fingerprint_pairs(fps: DataFrame, fp_col: str = "fp",
                      id_col: str = "doc_id", min_shared: int = 10,
                      max_df: int = 50) -> DataFrame:
    """Near-dup pairs from any (id, fingerprint) table — documents
    sharing ≥ ``min_shared`` fingerprints (winnowing, phash bands,
    CDC chunk hashes all produce this shape). Fingerprints appearing
    in more than ``max_df`` documents are dropped as template/
    boilerplate fingerprints BEFORE pair expansion — the df-cap that
    bounds every posting list, so bucket fan-out is ≤ max_df² and the
    plan never approaches all-pairs regardless of corpus size."""
    return (fps.groupBy(fp_col)
            .agg(F.sort_array(F.collect_set(F.col(id_col))).alias("_ids"))
            .filter((F.size("_ids") > 1) & (F.size("_ids") <= max_df))
            .select(F.explode(F.expr(
                "flatten(transform(_ids, (x, i) -> "
                "transform(slice(_ids, i + 2, size(_ids)), "
                "y -> struct(x AS id_a, y AS id_b))))")).alias("_p"))
            .groupBy(F.col("_p.id_a").alias("id_a"),
                     F.col("_p.id_b").alias("id_b"))
            .agg(F.count("*").alias("n_shared"))
            .filter(F.col("n_shared") >= min_shared))


def bloom_contaminate(corpus: DataFrame, benchmark: DataFrame,
                      k: int = 3, m_bits: int = 1 << 20,
                      n_hashes: int = 3, id_col: str = "doc_id",
                      text_col: str = "text") -> DataFrame:
    """Bloom-filter benchmark decontamination — the APPROXIMATE
    sibling of :func:`decontaminate` for when the test-suite shingle
    set is too big to broadcast verbatim: every benchmark shingle sets
    ``n_hashes`` positions in an ``m_bits`` filter; a corpus shingle
    is flagged iff ALL its positions are set. Returns the full census
    ``(doc_id, n_shingles, n_flagged, contaminated)`` (0-flag rows
    included, so the caller can audit the false-positive rate against
    x34's exact join).

    The filter is represented as the distinct POSITION SET rather
    than a packed bitmap — membership of "all k positions present in
    the set" is bit-identical to testing a bitmap built from the same
    hash family, the set build is one distinct aggregate (at most
    n_hashes·|bench shingles| ints, ≤ m_bits after dedup), and the
    semantics stay fully SQL-expressible for the oracle. Positions
    come from the repo's md5-prefix hash convention (seed i prefixed
    as 'i|'), zero engine-specific hashing.

    Plan: benchmark side collapses to the distinct position set and
    BROADCASTS (≤ m_bits ints); the corpus explodes scan-side to
    (doc, shingle) × n_hashes position rows, one broadcast left join
    marks hits, and two grouped aggregates roll up to shingle flags
    then per-doc counts. No all-pairs path; the only corpus-sized
    shuffle is the per-doc rollup."""
    from pyspark.sql import functions as F

    from data_ingest_spark.extensions.text import shingle_rows

    def pos(col, i):
        return (F.conv(F.substring(
            F.md5(F.concat(F.lit(f"{i}|"), col)), 1, 8), 16, 10)
            .cast("long") % m_bits)

    seeds = list(range(n_hashes))
    bench_pos = (shingle_rows(benchmark, id_col=id_col,
                              text_col=text_col, k=k)
                 .select(F.explode(F.array(
                     *[pos(F.col("shingle"), i) for i in seeds]))
                     .alias("p"))
                 .distinct())
    csh = shingle_rows(corpus, id_col=id_col, text_col=text_col, k=k)
    cpos = csh.select(
        id_col, "shingle",
        F.explode(F.array(*[pos(F.col("shingle"), i) for i in seeds]))
        .alias("p"))
    hits = (cpos.join(F.broadcast(bench_pos.withColumn(
                "_hit", F.lit(1))), "p", "left")
            .groupBy(id_col, "shingle")
            .agg((F.sum(F.coalesce(F.col("_hit"), F.lit(0)))
                  == n_hashes).cast("int").alias("_flag")))
    return (hits.groupBy(id_col)
            .agg(F.count("*").cast("long").alias("n_shingles"),
                 F.sum("_flag").cast("long").alias("n_flagged"))
            .withColumn("contaminated", F.col("n_flagged") > 0))
