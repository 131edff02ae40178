"""Tests for the LLM-pipeline extension operators."""

import pyspark.sql.functions as F
import pytest

from data_ingest_spark.extensions import (dedup as dd, multimodal as mm,
                                          similarity as sim, text as tx)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy dog"),          # exact dup of 1
        (3, "quick brown fox jumps over the lazy dog today"),        # near dup of 1
        (4, "completely different content about spark engines here"),
        (5, "der hund ist nicht der beste und das ist gut"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup(docs):
    groups = dd.exact_dedup(docs).collect()
    assert len(groups) == 1
    assert groups[0]["keep_id"] == 1 and groups[0]["n_copies"] == 2
    kept = dd.dedup_keep_first(docs)
    assert kept.count() == 4
    assert 2 not in {r["doc_id"] for r in kept.collect()}


def test_near_dup_pairs_finds_planted_pair(docs):
    # bands = num_hashes (1 row per band) makes candidate recall
    # 1-(1-J)^12 ≈ 1-4e-8 at the planted pair's J=0.75 — banding is
    # probabilistic by design, the default (12,4) leaves ~11% misses.
    pairs = {(r["id_a"], r["id_b"]): r["jaccard"]
             for r in dd.near_dup_pairs(docs, threshold=0.4,
                                        num_hashes=12, bands=12).collect()}
    assert (1, 2) in pairs and pairs[(1, 2)] == 1.0
    assert (1, 3) in pairs and 0.4 <= pairs[(1, 3)] < 1.0
    assert all(a < b for a, b in pairs)
    assert not any({4, 5} & {a, b} for a, b in pairs)


def test_simhash_near_dups_close(docs):
    h = {r["doc_id"]: r["simhash"] for r in tx.simhash(docs).collect()}
    assert all(len(v) == 16 and set(v) <= {"0", "1"} for v in h.values())
    ham = lambda a, b: sum(x != y for x, y in zip(a, b))
    assert ham(h[1], h[2]) == 0                 # identical text
    assert ham(h[1], h[3]) <= ham(h[1], h[4])   # near-dup at most as far


def test_jaccard_blocked(spark):
    df = spark.createDataFrame(
        [(1, "a b c d", "s1"), (2, "a b c e", "s1"), (3, "a b c d", "s2")],
        "doc_id long, text string, source string")
    pairs = dd.jaccard_pairs_blocked(df, ["source"], k=1, threshold=0.5).collect()
    assert {(r["id_a"], r["id_b"]) for r in pairs} == {(1, 2)}  # 3 blocked away


@pytest.fixture(scope="module")
def emb(spark):
    import math
    rows = []
    for i in range(40):
        theta = (i % 8) * math.pi / 16
        rows.append((i, [math.cos(theta), math.sin(theta), 0.0, 0.0], i % 2))
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")


def test_cosine_topk_exact(emb):
    q = emb.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec"))
    out = sim.cosine_topk(emb, q, k=3).collect()
    assert [r["neighbor_id"] for r in out] == [8, 16, 24]  # same angle, id asc
    assert all(abs(r["cosine"] - 1.0) < 1e-6 for r in out)
    assert all(r["neighbor_id"] != 0 for r in out)


def test_cosine_topk_ivf_restricts_to_cell(emb):
    q = emb.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), "label",
        F.col("embedding").alias("query_vec"))
    out = sim.cosine_topk_ivf(emb, q, k=5).collect()
    assert all(r["neighbor_id"] % 2 == 0 for r in out)  # label 0 cell only


def test_lsh_bucket_recall_on_identical_vectors(emb):
    q = emb.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec"))
    out = sim.cosine_topk_lsh(emb, q, k=3, n_planes=4, dim=4).collect()
    # identical vectors land in the same bucket by construction
    assert 8 in {r["neighbor_id"] for r in out}


def test_text_quality_ranges(docs):
    for r in tx.text_quality(docs).collect():
        assert 0.0 <= r["punct_ratio"] <= 1.0
        assert 0.0 <= r["stopword_ratio"] <= 1.0
        assert 0.0 <= r["quality_score"] <= 1.0
        assert r["n_tokens"] > 0


def test_lang_id_markers(docs):
    preds = {r["doc_id"]: r["pred_lang"] for r in tx.lang_id(docs).collect()}
    assert preds[1] == "en"
    assert preds[5] == "de"


def test_token_count_bpe_ish(spark):
    df = spark.createDataFrame([(1, "Hello, world! 42")], "doc_id long, text string")
    # tokens: hello , world ! 42 -> 5
    assert tx.token_count(df).collect()[0]["n_tokens"] == 5


def test_fingerprint_stability(docs):
    fp = {r["doc_id"]: r["fingerprint"] for r in tx.fingerprint(docs).collect()}
    assert fp[1] == fp[2]          # identical docs, identical fingerprint
    assert fp[1] != fp[4]
    assert all(len(v) == 32 for v in fp.values())


def test_multimodal_meta_and_fake_decode(spark):
    payloads = [(1, b"\x89PNG\r\n\x1a\nrest"), (2, b"\xff\xd8\xffjpegdata"),
                (3, b"plain bytes")]
    df = spark.createDataFrame(payloads, "doc_id long, payload binary")
    meta = {r["doc_id"]: (r["format"], r["n_bytes"])
            for r in mm.extract_binary_meta(df).collect()}
    assert meta[1][0] == "png" and meta[2][0] == "jpeg" and meta[3][0] == "bin"
    assert meta[3][1] == len(b"plain bytes")

    dec = mm.decode_image_fake(df)
    rows = dec.collect()
    assert dec.schema == mm.DECODED_IMAGE_SCHEMA
    assert all(16 <= r["width"] < 80 and 1 <= r["n_channels"] <= 4 for r in rows)

    # compressed formats still need a codec: the error now surfaces
    # from the executors at action time (decode itself is lazy)
    with pytest.raises(Exception, match="codec"):
        mm.decode_image(df).collect()


def test_decode_image_real_formats(spark):
    """decode_payload is a REAL decoder for the codec-free formats:
    PPM (P6) with comments, PGM (P5), and bottom-up padded 24-bit BMP
    round-trip to known pixels."""
    import struct

    # P6 2x2 RGB with a header comment; raster = 12 known bytes
    ppm_px = bytes(range(12))
    ppm = b"P6\n# synthetic\n2 2\n255\n" + ppm_px
    # P5 3x1 gray
    pgm = b"P5 3 1 255 " + bytes([9, 8, 7])
    # BMP 2x2 24-bit, bottom-up, stride 8 (2*3 rounded up to 4 bytes):
    # disk rows bottom-first and BGR; logical top row = (r,g,b) pairs
    top = [(1, 2, 3), (4, 5, 6)]
    bot = [(7, 8, 9), (10, 11, 12)]
    def row(px):
        return b"".join(bytes([b, g, r]) for r, g, b in px) + b"\x00\x00"
    raster = row(bot) + row(top)
    bmp = (b"BM" + struct.pack("<IHHI", 54 + len(raster), 0, 0, 54)
           + struct.pack("<IiiHHIIiiII", 40, 2, 2, 1, 24, 0,
                         len(raster), 0, 0, 0, 0)
           + raster)

    w, h, ch, px = mm.decode_payload(ppm)
    assert (w, h, ch, px) == (2, 2, 3, ppm_px)
    w, h, ch, px = mm.decode_payload(pgm)
    assert (w, h, ch, px) == (3, 1, 1, bytes([9, 8, 7]))
    w, h, ch, px = mm.decode_payload(bmp)
    assert (w, h, ch) == (2, 2, 3)
    assert px == bytes([1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12])

    # and through the Spark stage contract
    df = spark.createDataFrame([(1, ppm), (2, pgm), (3, bmp)],
                               "doc_id long, payload binary")
    rows = {r["doc_id"]: r for r in mm.decode_image(df).collect()}
    assert rows[1]["n_channels"] == 3 and rows[1]["width"] == 2
    assert rows[2]["n_channels"] == 1 and rows[2]["width"] == 3
    assert bytes(rows[3]["pixels"])[:3] == bytes([1, 2, 3])


def test_dup_clusters_multi_hop_chain(spark):
    # a-b-c-d chain plus isolated pair (10,11): components must close
    # transitively, labels = component minimum
    pairs = spark.createDataFrame(
        [(2, 3), (1, 2), (3, 4), (10, 11)], "id_a long, id_b long")
    got = {r["doc_id"]: r["cluster"]
           for r in dd.dup_clusters(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


def test_tf_idf_values(spark):
    df = spark.createDataFrame(
        [(1, "a a b"), (2, "a c"), (3, "b b d")], "doc_id long, text string")
    import math
    rows = {(r["doc_id"], r["token"]): (r["tf"], r["df_count"], r["tfidf"])
            for r in tx.tf_idf(df).collect()}
    # token 'a': df=2; doc1 tf=2
    idf_a = math.log((1 + 3) / (1 + 2)) + 1.0
    assert rows[(1, "a")][0] == 2
    assert abs(rows[(1, "a")][2] - 2 * idf_a) < 1e-12
    # singleton token 'd' survives min_df=1
    assert rows[(3, "d")][1] == 1


def test_embedding_near_dups_finds_identical_vectors(emb):
    # ids 0 and 8 share an angle (theta repeats mod 8): cosine 1.0
    pairs = {(r["id_a"], r["id_b"]): r["cosine"]
             for r in sim.embedding_near_dups(
                 emb, threshold=0.99, n_planes=4, dim=4).collect()}
    assert (0, 8) in pairs and abs(pairs[(0, 8)] - 1.0) < 1e-6
    assert all(a < b for a, b in pairs)


def test_fuzzy_join_distance_one_semantics(spark):
    from data_ingest_spark.extensions.fuzzy import fuzzy_join
    left = spark.createDataFrame(
        [(1, "spark"), (2, "spa"), (3, "zzz")], "id long, name string")
    right = spark.createDataFrame(
        [(10, "spark"),   # exact
         (11, "spark!"),  # one insert
         (12, "spork"),   # one substitution
         (13, "spar"),    # one deletion
         (14, "sprk"),    # one deletion elsewhere
         (15, "park"),    # distance 2 from spark? s->p... no: delete 's' = distance 1
         (16, "scala")],  # far
        "rid long, name string")
    got = {(r["id"], r["rid_r"]) for r in
           fuzzy_join(left, right, "name").collect()}
    import itertools
    def lev(a, b):
        d = {(i, 0): i for i in range(len(a) + 1)}
        d.update({(0, j): j for j in range(len(b) + 1)})
        for i, j in itertools.product(range(1, len(a) + 1),
                                      range(1, len(b) + 1)):
            d[i, j] = min(d[i - 1, j] + 1, d[i, j - 1] + 1,
                          d[i - 1, j - 1] + (a[i - 1] != b[j - 1]))
        return d[len(a), len(b)]
    want = {(l, r) for l, ln in [(1, "spark"), (2, "spa"), (3, "zzz")]
            for r, rn in [(10, "spark"), (11, "spark!"), (12, "spork"),
                          (13, "spar"), (14, "sprk"), (15, "park"),
                          (16, "scala")]
            if lev(ln, rn) <= 1}
    assert got == want


def test_fuzzy_join_distance_two_semantics(spark):
    """Depth-2 deletion blocking finds exactly the lev≤2 pairs — the
    brute-force DP is the oracle (insert+substitute, double deletes,
    short/empty strings included)."""
    import itertools
    from data_ingest_spark.extensions.fuzzy import fuzzy_join

    lvals = [(1, "spark"), (2, "spa"), (3, "zzz"), (4, "a"), (5, "")]
    rvals = [(10, "spark"), (11, "spark!?"), (12, "spork"), (13, "sar"),
             (14, "prk"), (15, "park"), (16, "scala"), (17, "sp"),
             (18, "b"), (19, "zz"), (20, "spanker")]
    left = spark.createDataFrame(lvals, "id long, name string")
    right = spark.createDataFrame(rvals, "rid long, name string")

    def lev(a, b):
        d = {(i, 0): i for i in range(len(a) + 1)}
        d.update({(0, j): j for j in range(len(b) + 1)})
        for i, j in itertools.product(range(1, len(a) + 1),
                                      range(1, len(b) + 1)):
            d[i, j] = min(d[i - 1, j] + 1, d[i, j - 1] + 1,
                          d[i - 1, j - 1] + (a[i - 1] != b[j - 1]))
        return d[len(a), len(b)]

    got = {(r["id"], r["rid_r"]) for r in
           fuzzy_join(left, right, "name", max_dist=2).collect()}
    want = {(l, r) for l, ln in lvals for r, rn in rvals
            if lev(ln, rn) <= 2}
    assert got == want


def test_deletion_rows_dedup_and_parallelism(spark):
    """The r9 rewrite moved the value-distinct INTO the map task (a
    per-task seen-set over hash-partitioned input) so the expansion
    parallelizes: duplicated input values must still yield exactly one
    (value, _kv) row set, and the map stage must run on the explicit
    defaultParallelism partition count (not an AQE-coalesced 1)."""
    from data_ingest_spark.extensions.fuzzy import _deletion_rows

    df = spark.createDataFrame(
        [("abc",)] * 5 + [("xy",)] * 3 + [("q",)], "name string")
    out = _deletion_rows(df, "name", 2)
    rows = out.collect()
    assert len(rows) == len(set((r["name"], r["_kv"]) for r in rows))
    got = {r["_kv"] for r in rows if r["name"] == "abc"}
    assert got == {"abc", "ab", "ac", "bc", "a", "b", "c"}
    assert (out.rdd.getNumPartitions()
            == spark.sparkContext.defaultParallelism)


def test_audio_features_known_values(spark):
    from data_ingest_spark.extensions import multimodal as mm
    # bytes [100, 156, 100]: centered [-28, 28, -28] -> 2 crossings,
    # rms = 28, mean = 118.666667
    df = spark.createDataFrame(
        [(1, bytes([100, 156, 100])), (2, b""), (3, bytes([7]))],
        "doc_id long, payload binary")
    rows = {r["doc_id"]: r for r in mm.audio_features(df).collect()}
    assert rows[1]["n_samples"] == 3
    assert rows[1]["mean_level"] == round((100 + 156 + 100) / 3, 6)
    assert rows[1]["rms"] == 28.0
    assert rows[1]["zcr"] == 1.0          # 2 crossings / 2 gaps
    assert rows[2]["rms"] is None         # empty clip -> nulls
    assert rows[3]["zcr"] == 0.0          # single sample, no gaps


def test_decontaminate_flags_shared_ngrams(docs):
    bench = docs.filter(F.col("doc_id") == 1)
    corpus = docs.filter(F.col("doc_id") > 1)
    hits = {r["doc_id"]: r for r in dd.decontaminate(corpus, bench).collect()}
    assert 2 in hits                       # exact copy: all shingles hit
    assert hits[2]["n_hit_shingles"] == hits[2]["n_shingles"]
    assert 3 in hits                       # near-dup shares most 3-grams
    assert 0 < hits[3]["n_hit_shingles"] < hits[3]["n_shingles"]
    assert 4 not in hits and 5 not in hits  # unrelated docs clean


def test_pii_redact_counts_and_text(spark):
    rows = [(1, "mail a@b.co and c.d@e.org ip 10.0.0.1 call +1 555 123 4567"),
            (2, "no pii here at all")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in tx.pii_redact(df).collect()}
    assert out[1]["n_email"] == 2 and out[1]["n_ipv4"] == 1
    assert out[1]["n_phone"] == 1
    assert out[1]["clean_text"] == \
        "mail [EMAIL] and [EMAIL] ip [IPV4] call [PHONE]"
    assert out[2]["clean_text"] == "no pii here at all"
    assert (out[2]["n_email"], out[2]["n_ipv4"], out[2]["n_phone"]) == (0, 0, 0)


def test_bpe_pair_counts_weighted_by_word_freq(spark):
    rows = [(1, "aa aa ab"), (2, "aa ba")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = {r["pair"]: r["pair_count"]
             for r in tx.bpe_pair_counts(df).collect()}
    assert pairs == {"aa": 3, "ab": 1, "ba": 1}


def test_token_drift_exact_scores(spark):
    from data_ingest_spark.extensions.profile import token_drift
    rows = [(1, "x x y", "s1"), (2, "y y y", "s2")]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = {(r["source"], r["token"]): r["drift_score"]
           for r in token_drift(df, top_k=2).collect()}
    # s1: x appears 2/3 locally vs 2/6 globally -> 2*6 - 2*3 = 6
    assert out[("s1", "x")] == 6
    # s2: y appears 3/3 locally vs 4/6 globally -> 3*6 - 4*3 = 6
    assert out[("s2", "y")] == 6
    # under-represented tokens score negative
    assert out[("s1", "y")] == 1 * 6 - 4 * 3


def test_curate_corpus_stage_semantics(spark):
    from data_ingest_spark.extensions.curate import curate_corpus
    long_a = " ".join(f"w{i}" for i in range(40))
    long_b = " ".join(f"v{i}" for i in range(40))
    rows = [
        (1, long_a + " unique tail one"),
        (2, long_a + " unique tail one"),        # exact dup of 1 -> dropped
        (3, "too short to pass the gate"),       # quality-gated
        (4, long_b + " contaminated by bench"),  # shares bench shingles
        (5, "leak marker contaminated by bench "
            + " ".join(f"b{i}" for i in range(30))),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    bench = docs.filter(F.col("doc_id") == 5)
    corpus = docs.filter(F.col("doc_id") < 5)
    out = {r["doc_id"]: r for r in
           curate_corpus(corpus, bench, min_tokens=30).collect()}
    assert set(out) == {1}                      # 2 dup, 3 short, 4 dirty
    assert out[1]["split"] in {"train", "valid", "test"}
    assert out[1]["n_tokens"] == 43


def test_training_prep_gates_dedups_and_packs(spark):
    from data_ingest_spark.extensions.curate import training_prep
    typical = "the cat sat on the mat"             # 6 tokens
    rows = [(i, typical, "en") for i in range(1, 5)]
    rows += [(5, typical, "en"),                   # still typical
             (6, "qq zz xx vv kk jj", "en")]       # tail -> gated out
    docs = spark.createDataFrame(rows,
                                 "doc_id long, text string, lang string")
    out = {r["seq_id"]: r for r in training_prep(docs, budget=10).collect()}
    # 6 docs -> tail tertile (2 docs: the rare-token doc + the worst
    # typical tie, highest doc_id) gated; dup keep-first leaves ONE
    # typical doc (doc 1) of 6 tokens -> a single 1-doc sequence.
    assert list(out) == [0]
    assert out[0]["n_docs"] == 1
    assert out[0]["total_tokens"] == 6
    assert out[0]["first_doc"] == 1 and out[0]["last_doc"] == 1
    # distinct texts pack contiguously across the budget boundary
    rows2 = [(i, " ".join(f"w{i}_{j}" for j in range(4)), "en")
             for i in range(1, 10)]                # 9 docs x 4 tokens
    docs2 = spark.createDataFrame(rows2,
                                  "doc_id long, text string, lang string")
    packed = {r["seq_id"]: r
              for r in training_prep(docs2, budget=8).collect()}
    # tail tertile (3 of 9) gated -> 6 docs x 4 tokens at budget 8
    assert sum(r["n_docs"] for r in packed.values()) == 6
    assert all(r["total_tokens"] <= 8 for r in packed.values())


def test_tokenize_with_vocab_ids_and_oov(spark):
    rows = [(1, "b a b c"), (2, "a a b zz")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in
           tx.tokenize_with_vocab(df, vocab_size=3).collect()}
    # counts: a=3, b=3, c=1, zz=1 -> vocab a=0, b=1, c=2 (ties by token)
    assert out[1]["ids_csv"] == "1,0,1,2"
    assert out[2]["ids_csv"] == "0,0,1,-1" and out[2]["n_oov"] == 1
    assert out[2]["n_tokens"] == 4


def test_unigram_logprob_ranks_typical_above_rare(spark):
    rows = [(1, "a a a a"), (2, "a a q z")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in tx.unigram_logprob(df).collect()}
    # 'a' has count 6 of 8; rare 'q'/'z' drag doc 2 down
    assert out[1]["avg_logprob"] > out[2]["avg_logprob"]
    assert out[1]["n_tokens"] == 4
    import math
    exp_a = round(round(math.log(7 / 11) * 1e6) / 1e6, 6)
    assert abs(out[1]["avg_logprob"] - exp_a) < 1e-9


def test_perplexity_buckets_head_middle_tail(spark):
    # Six docs in one language: typical text ranks head, rare-token
    # soup ranks tail; buckets are equal-count tertiles per language.
    rows = [(i, "the cat sat on the mat", "en") for i in range(1, 5)]
    rows += [(5, "qq zz xx vv kk jj", "en"),
             (6, "the cat zz qq on vv", "en"),
             (7, "der hund und die katze", "de")]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = {r["doc_id"]: r for r in tx.perplexity_buckets(df).collect()}
    assert out[1]["bucket"] == "head"          # most typical
    assert out[5]["bucket"] == "tail"          # rare-token soup
    assert out[5]["avg_logprob"] < out[1]["avg_logprob"]
    # a single-doc language fills bucket 1 only
    assert out[7]["bucket"] == "head"
    # per-language tertiles: en has 6 docs -> 2 per bucket
    from collections import Counter
    en = Counter(r["bucket"] for r in out.values() if r["lang"] == "en")
    assert en == {"head": 2, "middle": 2, "tail": 2}


def test_token_entropy_flags_degenerate_text(spark):
    import math
    rows = [(1, "a a a a"),            # one token -> H = 0
            (2, "a b c d"),            # uniform -> H = ln 4
            (3, "a a b b")]            # two tokens -> H = ln 2
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in tx.token_entropy(df).collect()}
    assert out[1]["entropy"] == 0.0
    assert abs(out[2]["entropy"] - math.log(4)) < 1e-5
    assert abs(out[3]["entropy"] - math.log(2)) < 1e-5
    assert out[1]["n_tokens"] == 4


def test_boilerplate_score_flags_template_docs(spark):
    template = "this page is generated by wiki engine"
    rows = ([(i, template) for i in range(6)]
            + [(10, "completely original prose with unusual phrasing here")])
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r["common_ratio"]
           for r in tx.boilerplate_score(df, min_df=5).collect()}
    assert out[0] == 1.0          # template shingles shared by 6 docs
    assert out[10] == 0.0         # unique doc shares nothing


def test_near_dups_against_crosses_sides_only(spark):
    existing = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog"),
         (2, "completely different archival content right here")],
        "doc_id long, text string")
    incoming = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog"),  # dup of 1
         (101, "entirely novel text with no earlier counterpart at all"),
         (102, "another novel document unrelated to archive contents")],
        "doc_id long, text string")
    pairs = dd.near_dups_against(incoming, existing, threshold=0.5).collect()
    assert {(r["id_new"], r["id_old"]) for r in pairs} == {(100, 1)}
    assert pairs[0]["jaccard"] == 1.0


def test_dedup_keep_best_prefers_score_then_min_id(spark):
    rows = [
        (1, "same text", 0.2), (2, "same text", 0.9),  # 2 wins on score
        (3, "other text", 0.5), (4, "other text", 0.5),  # tie -> min id 3
        (5, "unique", 0.0),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, score double")
    kept = {r["doc_id"] for r in dd.dedup_keep_best(df, "score").collect()}
    assert kept == {2, 3, 5}


def test_intra_doc_repetition_scores_degenerate_text(spark):
    rows = [
        (1, "spam spam spam spam spam"),        # every bigram identical
        (2, "each word appears exactly once"),  # no repeated bigram
        (3, "one"),                             # shorter than k -> ratio 0
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in tx.intra_doc_repetition(df, k=2).collect()}
    assert out[1]["n_ngrams"] == 4 and out[1]["n_distinct"] == 1
    assert out[1]["dup_ngram_ratio"] == 0.75
    assert out[2]["dup_ngram_ratio"] == 0.0
    assert out[3]["n_ngrams"] == 1 and out[3]["dup_ngram_ratio"] == 0.0


def test_shingle_rows_matches_column_path_on_edge_cases(spark):
    rows = [
        (1, "a b c d e"),
        (2, " leading space"),
        (3, "trailing space "),
        (4, "tab\tand\nnewline separated"),
        (5, "one"),
        (6, "two words"),
        (7, "MIXED Case TOKENS here"),
        (8, "a  double  space  run"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    fast = {(r["doc_id"], r["shingle"])
            for r in tx.shingle_rows(df, k=3).collect()}
    slow = {(r["doc_id"], r["shingle"])
            for r in df.select(
                "doc_id",
                F.explode(F.array_distinct(tx.shingles_col("text", 3)))
                .alias("shingle")).collect()}
    assert fast == slow


def test_shingle_rows_matches_column_path_fuzz(spark):
    import random
    rng = random.Random(13)
    alphabet = list("ab XY\t\n  ")
    rows = [(i, "".join(rng.choice(alphabet)
                        for _ in range(rng.randrange(0, 40))) or "x")
            for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    for k in (1, 2, 3):
        fast = {(r["doc_id"], r["shingle"])
                for r in tx.shingle_rows(df, k=k).collect()}
        slow = {(r["doc_id"], r["shingle"])
                for r in df.select(
                    "doc_id",
                    F.explode(F.array_distinct(tx.shingles_col("text", k)))
                    .alias("shingle")).collect()}
        assert fast == slow, f"k={k}"


def test_bigram_lm_conditional_probabilities(spark):
    rows = [(1, "a b a b"), (2, "a c")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {(r["w1"], r["w2"]): (r["pair_count"], r["cond_prob"])
           for r in tx.bigram_lm(df).collect()}
    # bigrams: (a,b)x2, (b,a)x1, (a,c)x1 -> c(a·)=3, c(b·)=1
    assert got[("a", "b")] == (2, round(2 / 3, 6))
    assert got[("a", "c")] == (1, round(1 / 3, 6))
    assert got[("b", "a")] == (1, 1.0)


def test_operators_survive_empty_input(spark):
    """Empty-corpus robustness: every text/dedup operator must return
    an empty (not crashed) result — the state of affairs at a fresh
    partition or a fully-filtered upstream."""
    empty = spark.createDataFrame([], "doc_id long, text string")
    assert dd.exact_dedup(empty).count() == 0
    assert dd.dedup_keep_first(empty).count() == 0
    assert dd.near_dup_pairs(empty).count() == 0
    assert tx.shingle_rows(empty).count() == 0
    assert tx.simhash(empty).count() == 0
    assert tx.text_quality(empty).count() == 0
    assert tx.bpe_pair_counts(empty).count() == 0
    assert tx.bigram_lm(empty).count() == 0
    assert tx.tokenize_with_vocab(empty).count() == 0
    assert tx.unigram_logprob(empty).count() == 0
    assert tx.boilerplate_score(empty).count() == 0

    assert tx.intra_doc_repetition(empty).count() == 0
    assert tx.reassemble_chunks(
        tx.chunk_documents(empty), overlap=64).count() == 0
    some = spark.createDataFrame([(1, "present text")],
                                 "doc_id long, text string")
    scored = empty.withColumn("score", F.lit(0.0))
    assert dd.dedup_keep_best(scored, "score").count() == 0
    assert dd.near_dups_against(empty, some).count() == 0
    assert dd.near_dups_against(some, empty).count() == 0

    assert dd.substring_dedup(empty, n=4).count() == 0
    assert dd.line_boilerplate_removal(empty).count() == 0
    assert dd.containment_pairs(empty).count() == 0

    from data_ingest_spark.extensions.curate import (curate_corpus,
                                                     training_prep)
    bench = spark.createDataFrame([(99, "x y z")],
                                  "doc_id long, text string")
    assert curate_corpus(empty, bench).count() == 0

    empty_lang = spark.createDataFrame(
        [], "doc_id long, text string, lang string")
    assert tx.perplexity_buckets(empty_lang).count() == 0
    assert training_prep(empty_lang).count() == 0

    # string doc ids must not break the keep-best tiebreak (a negated
    # string id would cast to NULL and silently drop everything)
    sdocs = spark.createDataFrame(
        [("idA", "same text", 1.0), ("idB", "same text", 2.0),
         ("idC", "other", 0.5)],
        "doc_id string, text string, score double")
    best = {r["doc_id"] for r in
            dd.dedup_keep_best(sdocs, "score").collect()}
    assert best == {"idB", "idC"}

    # overlapping id values across the two near_dups_against corpora
    # must not corrupt the Jaccard (two-sided membership resolution)
    inc = spark.createDataFrame([(1, "alpha beta gamma delta")],
                                "doc_id long, text string")
    ex = spark.createDataFrame([(1, "alpha beta gamma delta")],
                               "doc_id long, text string")
    hits = dd.near_dups_against(inc, ex, k=2, threshold=0.9).collect()
    assert len(hits) == 1 and abs(hits[0]["jaccard"] - 1.0) < 1e-9

    from data_ingest_spark.operators import normalize as nz
    eexpr = spark.createDataFrame(
        [], "sample string, barcode long, gene long, count double")
    assert nz.vst_standardized_variance(eexpr).count() == 0
    # all-zero-variance genes: loess has nothing to fit; empty result
    const = spark.createDataFrame(
        [("s", 1, 10, 2.0), ("s", 2, 10, 2.0)],
        "sample string, barcode long, gene long, count double")
    assert nz.vst_standardized_variance(const).count() == 0
    # the quadratic-smoother variant must survive the same edge cases
    assert nz.vst_quadfit_variance(eexpr).count() == 0
    assert nz.vst_quadfit_variance(const).count() == 0

    # round-3 additions: distributed Louvain on an empty edge list,
    # the foreachPartition upload writer on an empty frame
    from data_ingest_spark.operators import clustering as cl
    eedges = spark.createDataFrame(
        [], "src string, dst string, snn_weight double")
    assert cl.louvain_distributed(eedges).count() == 0
    from data_ingest_spark.sinks import exports as sk
    sk.upload_records(empty, "t", lambda: sk.UploadSink())  # no-op, no crash


def test_image_features_known_buffer(spark):
    df = spark.createDataFrame([(1, bytes([0, 64, 128, 192] * 16))],
                               "doc_id long, payload binary")
    resized = mm.resize_image(mm.decode_image_fake(df), width=8, height=8)
    r = mm.image_features(resized).collect()[0]
    # 64-byte pattern tiled to 64 px: 16 bytes per bin
    assert (r["hist_0"], r["hist_1"], r["hist_2"], r["hist_3"]) == (
        16, 16, 16, 16)
    assert r["min_px"] == 0 and r["max_px"] == 192
    assert r["mean_px"] == (0 + 64 + 128 + 192) / 4


def test_kmeans_ivf_recall_against_exact(spark):
    import math
    rows = []
    for i in range(200):
        theta = (i % 16) * math.pi / 32
        rows.append((i, [math.cos(theta), math.sin(theta),
                         float(i % 3) / 10, 0.0]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    qids = [0, 5, 10]
    approx = sim.cosine_topk_kmeans_ivf(emb, qids, k=5, n_cells=4,
                                        nprobe=2)
    q = emb.filter(F.col("vec_id").isin(qids)).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"))
    exact = sim.cosine_topk(emb, q, k=5)
    a = {(r["query_id"], r["neighbor_id"]) for r in approx.collect()}
    e = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}
    recall = len(a & e) / len(e)
    assert recall >= 0.6          # nprobe=2 of 4 cells on clustered data
    assert all(qid in {x for x, _ in a} for qid in qids)


def test_pq_encode_deterministic_and_reconstructive(spark):
    import numpy as np
    books = sim.pq_codebooks(64, 8, 16)
    # a vector equal to codeword 5 in every subspace must encode to 5s
    v = [float(x) for j in range(8) for x in books[j][5]]
    df = spark.createDataFrame([(1, v), (2, [0.0] * 64)],
                               "vec_id long, embedding array<double>")
    got = {r["vec_id"]: r["pq_code"] for r in sim.pq_encode(df).collect()}
    assert got[1] == ",".join(["5"] * 8)
    # zero vector: score = -norm2, argmax = smallest-norm codeword
    expect = [int(np.argmin([sum(x * x for x in books[j][c])
                             for c in range(16)])) for j in range(8)]
    assert got[2] == ",".join(str(c) for c in expect)
    again = {r["vec_id"]: r["pq_code"] for r in sim.pq_encode(df).collect()}
    assert got == again


def test_quantize_int8_roundtrip_error_bound(spark):
    df = spark.createDataFrame(
        [(1, [1.0, -0.5, 0.25, 0.0]), (2, [127.0, -127.0, 63.5, 1.0])],
        "vec_id long, embedding array<double>")
    out = {r["vec_id"]: r for r in sim.quantize_int8(df).collect()}
    for vid, vec in [(1, [1.0, -0.5, 0.25, 0.0]),
                     (2, [127.0, -127.0, 63.5, 1.0])]:
        r = out[vid]
        qs = [int(x) for x in r["q_csv"].split(",")]
        assert all(-127 <= q <= 127 for q in qs)
        # reconstruction error bounded by half a quantization step
        assert r["max_err"] <= r["scale"] / 2 + 1e-9
        recon = [q * r["scale"] for q in qs]
        assert max(abs(a - b) for a, b in zip(vec, recon)) <= \
            r["max_err"] + 1e-9


def test_substring_dedup_removes_repeated_window_keeps_first(spark):
    """Two docs share an exact 8-token run: the first (doc 1) keeps
    it, the second (doc 2) loses exactly that span; a doc shorter than
    n passes through untouched; a third doc repeating the run twice
    internally keeps neither copy (both sites are non-keepers)."""
    shared = "a b c d e f g h"           # the 8-token window
    d1 = f"x1 {shared} y1"
    d2 = f"x2 {shared} y2"
    d3 = f"{shared} mid {shared}"
    d4 = "too short"
    df = spark.createDataFrame(
        [(1, d1), (2, d2), (3, d3), (4, d4)], "doc_id long, text string")
    out = {r["doc_id"]: r for r in dd.substring_dedup(df, n=8).collect()}
    assert out[1]["clean_text"] == d1 and out[1]["n_removed"] == 0
    assert out[2]["clean_text"] == "x2 y2" and out[2]["n_removed"] == 8
    # doc 3: windows starting at the two shared runs are duplicates of
    # doc 1's site (1,1); both its sites are non-keepers -> both spans
    # removed; "mid" survives only if no duplicated window covers it —
    # the run "b..h mid" windows are unique so mid is covered ONLY by
    # windows that exist elsewhere... compute: spans at pos 0 and 9
    # cover tokens 0-7 and 9-16; token 8 ("mid") survives.
    assert out[3]["clean_text"] == "mid" and out[3]["n_removed"] == 16
    assert out[4]["clean_text"] == d4 and out[4]["n_removed"] == 0


def test_line_boilerplate_removed_everywhere(spark):
    """A line shared by >= min_docs distinct docs disappears from ALL
    of them (no keeper — boilerplate semantics); unique lines and
    intra-doc repeats survive; order is preserved."""
    df = spark.createDataFrame(
        [(1, "COOKIE BANNER\nreal content one\nCOOKIE BANNER"),
         (2, "COOKIE BANNER\nreal content two"),
         (3, "only unique text here")],
        "doc_id long, text string")
    out = {r["doc_id"]: r
           for r in dd.line_boilerplate_removal(df, min_docs=2).collect()}
    assert out[1]["clean_text"] == "real content one"
    assert out[1]["n_removed_lines"] == 2   # both copies dropped
    assert out[2]["clean_text"] == "real content two"
    assert out[2]["n_removed_lines"] == 1
    assert out[3]["clean_text"] == "only unique text here"
    assert out[3]["n_removed_lines"] == 0
    # intra-doc repetition alone (1 distinct doc) is NOT boilerplate
    solo = spark.createDataFrame([(9, "x\nx\ny")], "doc_id long, text string")
    got = dd.line_boilerplate_removal(solo, min_docs=2).collect()[0]
    assert got["clean_text"] == "x\nx\ny" and got["n_removed_lines"] == 0


def test_substring_dedup_matches_bruteforce_hypothesis(spark):
    """Property: substring_dedup equals a brute-force Python mirror of
    its contract on random small-vocabulary corpora (small vocab makes
    duplicated windows likely)."""
    from hypothesis import given, settings, strategies as st

    N = 3  # window size

    def brute(docs):
        toks = {d: t.split() if t else [""] for d, t in docs}
        # NOTE: python str.split() != split-on-\s+ for empty strings;
        # generator below never yields empty/whitespace-only text.
        sites = {}
        for d in sorted(toks):
            tk = toks[d]
            for pos in range(len(tk) - N + 1):
                sites.setdefault(" ".join(tk[pos:pos + N]), []).append((d, pos))
        removed = {d: set() for d in toks}
        for w, occ in sites.items():
            if len(occ) > 1:
                for d, pos in sorted(occ)[1:]:
                    removed[d].update(range(pos, pos + N))
        out = {}
        for d, tk in toks.items():
            kept = [t for i, t in enumerate(tk) if i not in removed[d]]
            out[d] = (" ".join(kept), len(tk) - len(kept))
        return out

    word = st.sampled_from(["a", "b", "c", "d"])
    doc = st.lists(word, min_size=1, max_size=12).map(" ".join)

    @settings(max_examples=10, deadline=None)
    @given(st.lists(doc, min_size=1, max_size=6))
    def run(texts):
        docs = list(enumerate(texts))
        df = spark.createDataFrame(docs, "doc_id long, text string")
        got = {r["doc_id"]: (r["clean_text"], r["n_removed"])
               for r in dd.substring_dedup(df, n=N).collect()}
        assert got == brute(docs), texts

    run()


def test_token_entropy_matches_python_mirror_hypothesis(spark):
    """Property: the fixed-point entropy reduction equals the direct
    Python computation (same fixed-pointing) on random corpora."""
    import math

    from hypothesis import given, settings, strategies as st

    word = st.sampled_from(["a", "b", "c", "dd"])
    doc = st.lists(word, min_size=1, max_size=15).map(" ".join)

    def mirror(text):
        toks = text.split(" ")
        n = len(toks)
        from collections import Counter
        s = sum(c * round(math.log(c) * 1e6)
                for c in Counter(toks).values())
        return round(math.log(n) - s / n / 1e6, 6)

    @settings(max_examples=8, deadline=None)
    @given(st.lists(doc, min_size=1, max_size=5))
    def run(texts):
        docs = list(enumerate(texts))
        df = spark.createDataFrame(docs, "doc_id long, text string")
        got = {r["doc_id"]: r["entropy"]
               for r in tx.token_entropy(df).collect()}
        for d, t in docs:
            assert abs(got[d] - mirror(t)) < 1e-9, t

    run()


def test_containment_catches_excerpt_jaccard_misses(spark):
    """A short excerpt of a long doc has near-zero Jaccard but full
    containment; containment_pairs flags (excerpt -> source) and not
    the reverse direction at a high threshold."""
    long_text = " ".join(f"w{i}" for i in range(60))
    excerpt = " ".join(f"w{i}" for i in range(8))
    other = " ".join(f"z{i}" for i in range(30))
    df = spark.createDataFrame(
        [(1, long_text), (2, excerpt), (3, other)],
        "doc_id long, text string")
    got = {(r["contained_id"], r["container_id"]): r["containment"]
           for r in dd.containment_pairs(df, threshold=0.9).collect()}
    assert got == {(2, 1): 1.0}
    # Jaccard-based near-dup does NOT pair them at any useful threshold
    jac = {(r["id_a"], r["id_b"])
           for r in dd.near_dup_pairs(df, threshold=0.3).collect()}
    assert (1, 2) not in jac and (2, 1) not in jac


def test_remove_contained_keeps_mutual_smaller_id(spark):
    """Excerpts vanish; mutual containment (near-identical docs) keeps
    exactly the smaller id; unrelated docs survive."""
    long_text = " ".join(f"w{i}" for i in range(40))
    rows = [(1, long_text),
            (2, " ".join(f"w{i}" for i in range(6))),   # excerpt of 1
            (10, "p q r s t u v"), (11, "p q r s t u v"),  # mutual pair
            (3, " ".join(f"z{i}" for i in range(20)))]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    kept = {r["doc_id"] for r in
            dd.remove_contained(df, threshold=0.8).collect()}
    assert kept == {1, 10, 3}


def test_remove_contained_mutual_member_still_drops_into_container(spark):
    """A doc that is non-mutually contained in a long container AND
    mutually contained with a twin must still drop — the drop decision
    is per PAIR, not per projected id (the sf0.1 gate caught an oracle
    writing it as a projected EXCEPT, which wrongly exempts the doc).
    Here 20 and 21 are twins (mutual) and both are excerpts of 1:
    every copy of the excerpt text must vanish."""
    long_text = " ".join(f"w{i}" for i in range(40))
    excerpt = " ".join(f"w{i}" for i in range(6))
    rows = [(1, long_text), (20, excerpt), (21, excerpt),
            (3, " ".join(f"z{i}" for i in range(20)))]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    kept = {r["doc_id"] for r in
            dd.remove_contained(df, threshold=0.8).collect()}
    assert kept == {1, 3}


def test_dedup_index_incremental_lifecycle(spark, tmp_path):
    """Persistent LSH index: day-0 build, day-1 batch finds its
    near-dup of the ARCHIVE from stored tables, day-2 batch finds its
    near-dup of DAY-1 (proving the append really extended the index) —
    the archive is never re-shingled."""
    from data_ingest_spark.extensions.dedup_index import (
        build_dedup_index, update_dedup_index)

    path = str(tmp_path / "idx")
    base_text = " ".join(f"tok{i}" for i in range(30))
    day1_text = " ".join(f"tok{i}" for i in range(2, 30))   # near-dup of base
    day2_text = " ".join(f"tok{i}" for i in range(2, 28))   # near-dup of day1
    other = " ".join(f"z{i}" for i in range(25))

    build_dedup_index(spark.createDataFrame(
        [(1, base_text), (2, other)], "doc_id long, text string"), path)

    d1 = update_dedup_index(spark, path, spark.createDataFrame(
        [(100, day1_text), (101, "totally different words here now")],
        "doc_id long, text string"), threshold=0.5)
    got1 = {(r["id_new"], r["id_old"]) for r in d1.collect()}
    assert got1 == {(100, 1)}

    d2 = update_dedup_index(spark, path, spark.createDataFrame(
        [(200, day2_text)], "doc_id long, text string"), threshold=0.5)
    got2 = {(r["id_new"], r["id_old"]) for r in d2.collect()}
    assert (200, 100) in got2          # found via the APPENDED state
    assert all(n == 200 for n, _ in got2)

    # nightly compaction: row counts preserved, file count bounded,
    # and the compacted index still answers the next batch correctly.
    # The commit is a CURRENT-pointer flip into a gen-<n> dir; the
    # superseded generation is retained for in-flight readers and
    # reclaimed by the NEXT compaction.
    from data_ingest_spark.extensions.dedup_index import (
        _live_root, compact_dedup_index)
    import glob
    import os
    before_bands = spark.read.parquet(f"{path}/bands").count()
    counts = compact_dedup_index(spark, path, n_files=2)
    live = _live_root(path)
    assert live == os.path.join(path, "gen-1")
    assert counts["bands"] == before_bands
    assert spark.read.parquet(f"{live}/bands").count() == before_bands
    assert len(glob.glob(f"{live}/bands/part-*.parquet")) <= 2
    # previous generation (the legacy root tables) retained post-commit
    assert os.path.exists(f"{path}/bands")
    d3 = update_dedup_index(spark, path, spark.createDataFrame(
        [(300, day1_text)], "doc_id long, text string"), threshold=0.5)
    got3 = {(r["id_new"], r["id_old"]) for r in d3.collect()}
    assert {(300, 1), (300, 100), (300, 200)} <= got3
    # second compaction advances the pointer and reclaims the legacy gen
    counts2 = compact_dedup_index(spark, path, n_files=2)
    assert _live_root(path) == os.path.join(path, "gen-2")
    assert counts2["bands"] == spark.read.parquet(
        f"{_live_root(path)}/bands").count()
    assert not os.path.exists(f"{path}/bands")
    # a half-written gen dir (crashed compaction) is invisible to
    # readers: the pointer still names gen-2
    os.makedirs(f"{path}/gen-7", exist_ok=True)
    open(f"{path}/gen-7/garbage", "w").close()
    assert _live_root(path) == os.path.join(path, "gen-2")
    d4 = update_dedup_index(spark, path, spark.createDataFrame(
        [(400, day2_text)], "doc_id long, text string"), threshold=0.5)
    assert (400, 200) in {(r["id_new"], r["id_old"]) for r in d4.collect()}


def test_dq_check_rule_semantics(spark):
    """Each rule kind counts exactly its violations; row-local rules
    share one aggregation; nulls violate range/set/match rules."""
    from data_ingest_spark.functions.quality import check
    df = spark.createDataFrame(
        [(1, 5.0, "a", "x1"), (2, -1.0, "b", "x2"),
         (2, 50.0, None, "zz"), (None, None, "c", "x3")],
        "id long, v double, cat string, code string")
    out = {(r["rule"], r["column"]): (r["n_violations"], r["pass"])
           for r in check(df, [
               {"rule": "not_null", "column": "id"},
               {"rule": "in_range", "column": "v", "lo": 0.0, "hi": 10.0},
               {"rule": "in_set", "column": "cat", "allowed": ["a", "b"]},
               {"rule": "matches", "column": "code", "pattern": "^x[0-9]$"},
               {"rule": "unique", "column": "id"},
           ]).collect()}
    assert out[("not_null", "id")] == (1, False)
    # violations: -1 out of range, 50 out of range, null -> 3
    assert out[("in_range", "v")] == (3, False)
    assert out[("in_set", "cat")] == (2, False)   # None + 'c'
    assert out[("matches", "code")] == (1, False)  # 'zz'
    assert out[("unique", "id")] == (2, False)     # two rows share id 2
    clean = check(df.limit(0), [{"rule": "not_null", "column": "id"}])
    assert clean.collect()[0]["pass"] is True


def test_lloyd_step_assigns_to_nearest_and_averages(spark):
    """k=2 planted clusters: ids 0,1 seed the centroids; every vector
    joins its nearest seed and the new centroid is the exact
    per-dimension mean of its members (fixed-point ints)."""
    rows = [(0, [0.0, 0.0]), (1, [1.0, 1.0]),
            (2, [0.1, 0.0]), (3, [0.9, 1.0]), (4, [0.0, 0.2])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = sim.lloyd_step(df, k=2)
    got = {(r["cid"], r["dim"]): (r["n"], r["mean_q"])
           for r in out.collect()}
    # cluster 0: ids 0,2,4 -> mean dim1 = (0+100000+0)/3
    assert got[(0, 1)] == (3, round(100000 / 3, 6))
    assert got[(0, 2)] == (3, round(200000 / 3, 6))
    # cluster 1: ids 1,3 -> dim1 mean (1000000+900000)/2
    assert got[(1, 1)] == (2, 950000.0)
    assert got[(1, 2)] == (2, 1000000.0)
