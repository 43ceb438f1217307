"""Training-data pipeline extras: dedup, simsearch, text, multimodal."""

import pytest
from pyspark.sql import functions as F

from datamatch_spark.corpus import CorpusConfig, generate_documents
from datamatch_spark.extras import dedup as D
from datamatch_spark.extras import multimodal as M
from datamatch_spark.extras import simsearch as S
from datamatch_spark.extras import text as T


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy cat"),
        (3, "the quick brown fox jumps over the lazy dog"),  # exact dup of 1
        (4, "el rapido zorro marron salta sobre el perro"),
        (5, "completely different words entirely here now okay"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_duplicates(docs):
    got = [(r["canonical_id"], r["doc_id"]) for r in D.exact_duplicates(docs, "doc_id").collect()]
    assert got == [(1, 3)]


def test_ngram_jaccard_pairs(docs):
    got = {
        (r["idx_a"], r["idx_b"]): r["jaccard"]
        for r in D.ngram_jaccard_pairs(docs, "doc_id", n=2, threshold=0.5).collect()
    }
    assert (1, 3) in got and got[(1, 3)] == 1.0
    assert (1, 2) in got  # one word differs -> high bigram overlap
    assert (1, 4) not in got


def test_minhash_lsh_finds_near_dups(spark):
    cfg = CorpusConfig(n_docs=0)  # unused; build text corpus manually
    base = "w%d " * 30
    rows = []
    for i in range(40):
        words = " ".join(f"w{(i // 2) * 50 + j}" for j in range(30))
        if i % 2 == 1:
            words = words.replace(f"w{(i // 2) * 50 + 3}", "zz", 1)  # near-dup of i-1
        rows.append((i, words))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["idx_a"], r["idx_b"])
        for r in D.minhash_lsh_pairs(
            df, "doc_id", n=2, n_perm=64, bands=16, threshold=0.5
        ).collect()
    }
    want = {(2 * k, 2 * k + 1) for k in range(20)}
    # banding with 16 bands at jaccard ~0.8 -> recall ~1
    assert len(got & want) >= 18
    assert not (got - want)  # precision exact (verified stage)


def test_minhash_match_cross_corpus_parity(spark):
    """minhash_lsh_match(A, B) over an even/odd split of one corpus
    must equal minhash_lsh_pairs on the union restricted to cross-side
    pairs (signatures/banding are per-doc and side-independent), with
    idx_a always the A-side id — including pairs where idx_a > idx_b,
    which pairs mode would have flipped."""
    rows = []
    for i in range(40):
        words = " ".join(f"w{(i // 2) * 50 + j}" for j in range(30))
        if i % 2 == 1:
            words = words.replace(f"w{(i // 2) * 50 + 3}", "zz", 1)
        rows.append((i, words))
    # near-dup oriented the other way: odd id BELOW its even twin
    rows.append((100, rows[39][1]))  # dup of odd doc 39 with even id 100
    df = spark.createDataFrame(rows, "doc_id long, text string")
    kw = dict(n=2, n_perm=64, bands=16, threshold=0.5)
    a = df.where("doc_id % 2 = 0")
    b = df.where("doc_id % 2 = 1")
    got = {
        (r["idx_a"], r["idx_b"], r["jaccard"])
        for r in D.minhash_lsh_match(a, b, "doc_id", **kw).collect()
    }
    full = {
        (r["idx_a"], r["idx_b"], r["jaccard"])
        for r in D.minhash_lsh_pairs(df, "doc_id", **kw).collect()
    }
    cross = {
        (x, y, j) if x % 2 == 0 else (y, x, j)
        for (x, y, j) in full
        if (x % 2) != (y % 2)
    }
    assert got == cross
    assert all(x % 2 == 0 and y % 2 == 1 for (x, y, _) in got)
    assert (100, 39) in {(x, y) for (x, y, _) in got}  # a-id > b-id kept


def test_minhash_match_id_collision(spark):
    """ids name rows of DIFFERENT corpora in match mode — the same id
    on both sides must still pair (no accidental self-exclusion)."""
    txt = " ".join(f"w{j}" for j in range(30))
    a = spark.createDataFrame([(1, txt)], "doc_id long, text string")
    b = spark.createDataFrame(
        [(1, txt.replace("w3", "zz", 1)), (2, " ".join(f"q{j}" for j in range(30)))],
        "doc_id long, text string",
    )
    got = {
        (r["idx_a"], r["idx_b"])
        for r in D.minhash_lsh_match(
            a, b, "doc_id", n=2, n_perm=64, bands=16, threshold=0.5
        ).collect()
    }
    assert got == {(1, 1)}


def test_ngram_jaccard_match_cross_corpus_parity(spark):
    """ngram_jaccard_match(A, B) over an even/odd split must equal
    ngram_jaccard_pairs on the union restricted to cross-side pairs
    (at max_df=None both modes are exhaustive), idx_a always the
    A-side id — including pairs where idx_a > idx_b."""
    rows = []
    for i in range(30):
        words = " ".join(f"w{(i // 2) * 50 + j}" for j in range(20))
        if i % 2 == 1:
            words = words.replace(f"w{(i // 2) * 50 + 3}", "zz", 1)
        rows.append((i, words))
    rows.append((100, rows[29][1]))  # dup of odd doc 29 with even id 100
    df = spark.createDataFrame(rows, "doc_id long, text string")
    a = df.where("doc_id % 2 = 0")
    b = df.where("doc_id % 2 = 1")
    kw = dict(n=2, threshold=0.5, max_df=None)
    got = {
        (r["idx_a"], r["idx_b"], r["jaccard"])
        for r in D.ngram_jaccard_match(a, b, "doc_id", **kw).collect()
    }
    full = {
        (r["idx_a"], r["idx_b"], r["jaccard"])
        for r in D.ngram_jaccard_pairs(df, "doc_id", **kw).collect()
    }
    cross = {
        (x, y, j) if x % 2 == 0 else (y, x, j)
        for (x, y, j) in full
        if (x % 2) != (y % 2)
    }
    assert got == cross and got
    assert all(x % 2 == 0 and y % 2 == 1 for (x, y, _) in got)
    assert (100, 29, 1.0) in got  # a-id > b-id kept, exact dup at 1.0


def test_ngram_jaccard_match_union_stop_shingles(spark):
    """max_df counts document frequency over the UNION of both sides:
    a gram hot across the two corpora together is pruned even if each
    side alone stays under the cap — and since sizes come from the
    unpruned sets, affected pairs only lose score (lower bound)."""
    # 4 A-docs and 4 B-docs all share gram "h h"; distinct tails
    a_rows = [(i, "h h a%d b%d c%d" % (i, i, i)) for i in range(4)]
    b_rows = [(10 + i, "h h a%d b%d c%d" % (i, i, i)) for i in range(4)]
    a = spark.createDataFrame(a_rows, "doc_id long, text string")
    b = spark.createDataFrame(b_rows, "doc_id long, text string")
    # union df of "h h" = 8 > 6 -> pruned; per-side df is only 4
    pruned = {
        (r["idx_a"], r["idx_b"]): r["jaccard"]
        for r in D.ngram_jaccard_match(
            a, b, "doc_id", n=2, threshold=0.0, max_df=6
        ).collect()
    }
    full = {
        (r["idx_a"], r["idx_b"]): r["jaccard"]
        for r in D.ngram_jaccard_match(
            a, b, "doc_id", n=2, threshold=0.0, max_df=None
        ).collect()
    }
    # twin docs (i, 10+i) share everything; cross twins share only "h h"
    assert full[(0, 10)] == 1.0
    assert pruned[(0, 10)] < 1.0  # lost the pruned gram's mass, lower bound
    assert (0, 11) in full and (0, 11) not in pruned  # only-hot-gram pair gone
    assert all(pruned[k] <= full[k] for k in pruned)


def test_simhash_match_cross_corpus_parity(spark):
    """simhash_near_match(A, B) over an even/odd split must equal
    simhash_near_pairs on the union restricted to cross-side pairs
    (fingerprints are per-doc and side-independent; both modes are
    recall-lossless at the default chunking), with idx_a always the
    A-side id — including pairs where idx_a > idx_b."""
    rows = []
    for i in range(40):
        words = " ".join(f"w{(i // 2) * 50 + j}" for j in range(30))
        if i % 2 == 1:
            words = words.replace(f"w{(i // 2) * 50 + 3}", "zz", 1)
        rows.append((i, words))
    rows.append((100, rows[39][1]))  # dup of odd doc 39 with even id 100
    df = spark.createDataFrame(rows, "doc_id long, text string")
    a = df.where("doc_id % 2 = 0")
    b = df.where("doc_id % 2 = 1")
    got = {
        (r["idx_a"], r["idx_b"], r["hamming"])
        for r in D.simhash_near_match(a, b, "doc_id", n=2, max_hamming=16).collect()
    }
    full = {
        (r["idx_a"], r["idx_b"], r["hamming"])
        for r in D.simhash_near_pairs(df, "doc_id", n=2, max_hamming=16).collect()
    }
    cross = {
        (x, y, h) if x % 2 == 0 else (y, x, h)
        for (x, y, h) in full
        if (x % 2) != (y % 2)
    }
    assert got == cross
    assert all(x % 2 == 0 and y % 2 == 1 for (x, y, _) in got)
    assert (100, 39, 0) in got  # a-id > b-id kept, exact dup at hamming 0


def test_simhash_match_same_id_both_sides(spark):
    """ids name rows of DIFFERENT corpora in match mode — the same id
    on both sides must still pair (no accidental self-exclusion)."""
    txt = " ".join(f"w{j}" for j in range(30))
    a = spark.createDataFrame([(1, txt)], "doc_id long, text string")
    b = spark.createDataFrame(
        [(1, txt), (2, " ".join(f"q{j}" for j in range(30)))],
        "doc_id long, text string",
    )
    got = {
        (r["idx_a"], r["idx_b"], r["hamming"])
        for r in D.simhash_near_match(a, b, "doc_id", n=2, max_hamming=3).collect()
    }
    assert got == {(1, 1, 0)}


def test_simhash_match_param_validation(spark):
    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    with pytest.raises(ValueError, match="max_hamming"):
        D.simhash_near_match(df, df, "doc_id", max_hamming=64)
    with pytest.raises(ValueError, match="n_chunks"):
        D.simhash_near_match(df, df, "doc_id", max_hamming=3, n_chunks=65)


def test_minhash_verification_matches_bruteforce(docs):
    lsh = {
        (r["idx_a"], r["idx_b"], r["jaccard"])
        for r in D.minhash_lsh_pairs(docs, "doc_id", n=2, threshold=0.5).collect()
    }
    brute = {
        (r["idx_a"], r["idx_b"], r["jaccard"])
        for r in D.ngram_jaccard_pairs(docs, "doc_id", n=2, threshold=0.5).collect()
    }
    assert lsh <= brute


def test_simhash_near_pairs(docs):
    sh = {r["doc_id"]: r["simhash"] for r in D.simhash(docs, "doc_id", n=2).collect()}
    assert sh[1] == sh[3]  # identical text -> identical simhash
    pairs = {
        (r["idx_a"], r["idx_b"]): r["hamming"]
        for r in D.simhash_near_pairs(docs, "doc_id", n=2, max_hamming=16).collect()
    }
    assert pairs[(1, 3)] == 0
    assert (1, 5) not in pairs


def test_text_ops(docs):
    out = T.with_quality(T.with_fingerprint(T.with_token_count(docs))).collect()
    r1 = next(r for r in out if r["doc_id"] == 1)
    assert r1["n_tokens"] == 9
    assert r1["n_distinct_tokens"] == 8  # 'the' twice
    assert len(r1["fingerprint"]) == 32
    assert 0.0 <= r1["quality_score"] <= 1.0
    langs = {r["doc_id"]: r["lang_pred"] for r in T.with_lang_id(docs).collect()}
    assert langs[1] == "en"
    assert langs[4] == "es"
    assert langs[5] == "und"


def test_cosine_topk_exact(spark):
    rows = [
        (0, [1.0, 0.0, 0.0]),
        (1, [0.9, 0.1, 0.0]),
        (2, [0.0, 1.0, 0.0]),
        (3, [0.0, 0.9, 0.1]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {
        (r["query_id"], r["rank"]): r["neighbor_id"]
        for r in S.cosine_topk(df, df.where("vec_id = 0"), k=2).collect()
    }
    assert got[(0, 1)] == 1
    assert got[(0, 2)] in (2, 3)


def test_lsh_topk_recall(spark):
    import numpy as np

    rng = np.random.RandomState(0)
    # clustered embeddings (realistic structure): 20 centers + noise
    centers = rng.standard_normal((20, 16))
    vecs = (centers[rng.randint(0, 20, 200)] + 0.25 * rng.standard_normal((200, 16))).astype(
        "float32"
    )
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(200)],
        "vec_id long, embedding array<float>",
    )
    queries = df.where("vec_id < 10")
    brute = {
        (r["query_id"], r["neighbor_id"])
        for r in S.cosine_topk(df, queries, k=3).collect()
    }
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in S.lsh_topk(df, queries, k=3, n_planes=6).collect()
    }
    recall = len(brute & approx) / len(brute)
    assert recall >= 0.6, recall  # 6-bit multiprobe on clustered data


def test_lsh_topk_rademacher_recall_and_validation(spark):
    """plane_kind='rademacher' (the SQL-reproducible ±1 bank) keeps the
    multiprobe recall contract; unknown kinds raise."""
    import numpy as np

    rng = np.random.RandomState(0)
    centers = rng.standard_normal((20, 16))
    vecs = (
        centers[rng.randint(0, 20, 200)]
        + 0.25 * rng.standard_normal((200, 16))
    ).astype("float32")
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(200)],
        "vec_id long, embedding array<float>",
    )
    queries = df.where("vec_id < 10")
    brute = {
        (r["query_id"], r["neighbor_id"])
        for r in S.cosine_topk(df, queries, k=3).collect()
    }
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in S.lsh_topk(
            df, queries, k=3, n_planes=6, plane_kind="rademacher"
        ).collect()
    }
    recall = len(brute & approx) / len(brute)
    assert recall >= 0.6, recall
    with pytest.raises(ValueError, match="plane kind"):
        S._hyperplanes(4, 2, 42, "uniform")
    # the ±1 bank is deterministic and seed-sensitive
    a = S._hyperplanes(8, 4, 42, "rademacher")
    assert set(np.unique(a)) == {-1.0, 1.0}
    assert (a == S._hyperplanes(8, 4, 42, "rademacher")).all()
    assert (a != S._hyperplanes(8, 4, 43, "rademacher")).any()


def test_embedding_near_dup(spark):
    rows = [
        (0, [1.0, 0.0], "a"),
        (1, [0.999, 0.04], "a"),
        (2, [0.0, 1.0], "a"),
        (3, [1.0, 0.0], "b"),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label string")
    got = {
        (r["idx_a"], r["idx_b"])
        for r in S.embedding_near_dup_pairs(df, 0.99, block_col="label").collect()
    }
    assert got == {(0, 1)}


def test_multimodal_plumbing(spark):
    docs = generate_documents(spark, CorpusConfig(n_docs=60, seed=5))
    media = M.media_table_from_docs(docs)
    m = media.collect()
    assert all(len(bytes(r["data"])) == 256 for r in m)
    assert {r["kind"] for r in m} <= {"image", "audio", "video"}
    feats = M.media_features(docs, dim=8)
    rows = feats.collect()
    assert rows and all(len(r["features"]) == 8 for r in rows)
    # determinism
    again = {(r["media_ref"], tuple(r["features"])) for r in M.media_features(docs, dim=8).collect()}
    assert {(r["media_ref"], tuple(r["features"])) for r in rows} == again


def test_decode_real_is_stubbed(spark):
    docs = generate_documents(spark, CorpusConfig(n_docs=10, seed=5))
    media = M.media_table_from_docs(docs)
    with pytest.raises(NotImplementedError):
        M.decode_media(media, codec="real")


def test_simhash_pigeonhole_recall_lossless(spark):
    """With the default n_chunks = max_hamming + 1, chunk banding must
    find EVERY pair within the distance bound — compare against the
    brute-force cross join on bit_count(xor)."""
    from itertools import combinations

    rows = [
        (i, " ".join(f"t{(i * 7 + j) % 23}" for j in range(12)) + (" zz" if i % 3 else ""))
        for i in range(30)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    max_h = 8
    sh = {r["doc_id"]: r["simhash"] for r in D.simhash(df, "doc_id", n=2).collect()}
    brute = {
        (a, b)
        for a, b in combinations(sorted(sh), 2)
        if bin((sh[a] ^ sh[b]) & (2**64 - 1)).count("1") <= max_h
    }
    got = {
        (r["idx_a"], r["idx_b"])
        for r in D.simhash_near_pairs(df, "doc_id", n=2, max_hamming=max_h).collect()
    }
    assert got == brute
    # and a lossy narrow banding stays a subset (precision exact)
    lossy = {
        (r["idx_a"], r["idx_b"])
        for r in D.simhash_near_pairs(
            df, "doc_id", n=2, max_hamming=max_h, n_chunks=2
        ).collect()
    }
    assert lossy <= brute


def test_ivf_topk_recall(spark):
    import numpy as np

    rng = np.random.RandomState(0)
    centers = rng.standard_normal((20, 16))
    vecs = (centers[rng.randint(0, 20, 200)] + 0.25 * rng.standard_normal((200, 16))).astype(
        "float32"
    )
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(200)],
        "vec_id long, embedding array<float>",
    )
    queries = df.where("vec_id < 10")
    brute = {
        (r["query_id"], r["neighbor_id"])
        for r in S.cosine_topk(df, queries, k=3).collect()
    }
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in S.ivf_topk(df, queries, k=3, n_cells=16, nprobe=4).collect()
    }
    recall = len(brute & approx) / len(brute)
    assert recall >= 0.8, recall  # 4-of-16 cells on clustered data
    # probing every cell must reproduce brute force exactly
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in S.ivf_topk(df, queries, k=3, n_cells=16, nprobe=16).collect()
    }
    assert exact == brute


def test_real_ppm_and_wav_codecs(spark):
    """codec='ppm'/'wav' REALLY decode: round-trip synthesized media
    bytes through the Spark pipeline and check recovered dimensions
    and physically meaningful features."""
    import numpy as np

    red = np.zeros((8, 6, 3), dtype=np.uint8)
    red[:, :, 0] = 255
    half = np.zeros((4, 4, 3), dtype=np.uint8)
    half[:2, :, :] = 255  # top half white
    tone = (np.sin(2 * np.pi * 440 * np.arange(1600) / 16000) * 20000).astype(np.int16)
    silence = np.zeros(800, dtype=np.int16)
    imgs = spark.createDataFrame(
        [
            ("img_red", "image", bytearray(M.encode_ppm(red)), (6, 8, 1, 0)),
            ("img_half", "image", bytearray(M.encode_ppm(half)), (4, 4, 1, 0)),
        ],
        M.MEDIA_SCHEMA,
    )
    out = {r["media_ref"]: r for r in M.decode_media(imgs, codec="ppm").collect()}
    assert (out["img_red"]["width"], out["img_red"]["height"]) == (6, 8)
    r_mean, g_mean = out["img_red"]["features"][0], out["img_red"]["features"][1]
    assert abs(r_mean - 1.0) < 1e-6 and abs(g_mean) < 1e-6
    assert abs(out["img_half"]["features"][0] - 0.5) < 1e-6  # half white
    auds = spark.createDataFrame(
        [
            ("aud_tone", "audio", bytearray(M.encode_wav(tone)), (0, 0, 0, 16000)),
            ("aud_sil", "audio", bytearray(M.encode_wav(silence)), (0, 0, 0, 16000)),
        ],
        M.MEDIA_SCHEMA,
    )
    got = {r["media_ref"]: r for r in M.decode_media(auds, codec="wav").collect()}
    assert got["aud_tone"]["n_frames"] == 1600
    rms_tone = got["aud_tone"]["features"][0]
    rms_sil = got["aud_sil"]["features"][0]
    assert rms_tone > 0.3 and rms_sil == 0.0


def test_band_count_must_divide_n_perm():
    from datamatch_spark.extras.dedup import _sig_bands_udf

    with pytest.raises(ValueError, match="must divide"):
        _sig_bands_udf(64, 5)


def test_ppm_maxval_rejected():
    from datamatch_spark.extras.multimodal import _decode_ppm

    bad = b"P6\n2 2\n65535\n" + bytes(24)
    with pytest.raises(ValueError, match="maxval"):
        _decode_ppm(bad, 10)


def test_embedding_near_dup_lsh_blocked_recall(spark):
    """LSH-bucketed near-dup: exact precision (every returned pair is a
    verified brute-force pair, identical cos) and high recall on
    planted near-duplicates."""
    import numpy as np

    rng = np.random.RandomState(5)
    rows = []
    vid = 0
    for i in range(40):
        base = rng.standard_normal(32)
        rows.append((vid, [float(x) for x in base])); vid += 1
        # planted near-dup: tiny perturbation => cosine ~0.999
        rows.append((vid, [float(x) for x in base + 0.02 * rng.standard_normal(32)])); vid += 1
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    truth = {
        (r["idx_a"], r["idx_b"]): r["cos"]
        for r in S.embedding_near_dup_pairs(df, threshold=0.98).collect()
    }
    got = {
        (r["idx_a"], r["idx_b"]): r["cos"]
        for r in S.embedding_near_dup_pairs(
            df, threshold=0.98, lsh_planes=8
        ).collect()
    }
    assert set(got) <= set(truth)  # exact precision
    for k, v in got.items():
        assert v == truth[k]
    assert len(truth) >= 40  # the 40 planted pairs are real near-dups
    recall = len(got) / len(truth)
    assert recall >= 0.9, f"recall {recall} ({len(got)}/{len(truth)})"


def test_pair_cosine_matches_column_cosine(spark):
    import numpy as np

    rng = np.random.RandomState(11)
    rows = [
        (i, [float(x) for x in rng.standard_normal(16)],
            [float(x) for x in rng.standard_normal(16)])
        for i in range(50)
    ]
    df = spark.createDataFrame(rows, "i long, a array<float>, b array<float>")
    got = {
        r["i"]: r["c"]
        for r in df.select(
            "i", F.round(S.pair_cosine(F.col("a"), F.col("b")), 9).alias("c")
        ).collect()
    }
    want = {
        r["i"]: r["c"]
        for r in df.select(
            "i", F.round(S.cosine(F.col("a"), F.col("b")), 9).alias("c")
        ).collect()
    }
    assert got == want


def test_semantic_dedup_planted_groups(spark):
    """Planted triplets of near-identical vectors collapse to one kept
    representative (min id); noise vectors stay singletons. Multi-cell
    path (n_cells=8)."""
    import numpy as np

    rng = np.random.RandomState(9)
    rows = []
    vid = 0
    truth_groups = []
    for _ in range(15):
        base = rng.standard_normal(32)
        ids = []
        for _ in range(3):
            rows.append((vid, [float(x) for x in base + 0.01 * rng.standard_normal(32)]))
            ids.append(vid); vid += 1
        truth_groups.append(ids)
    singles = []
    for _ in range(30):
        rows.append((vid, [float(x) for x in rng.standard_normal(32)]))
        singles.append(vid); vid += 1
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {r["vec_id"]: (r["group_id"], r["keep"])
           for r in S.semantic_dedup(df, threshold=0.95, n_cells=8,
                                     sample_size=1000).collect()}
    assert len(out) == vid
    kept = {i for i, (_, k) in out.items() if k}
    # every planted triplet whose members share a cell collapses; with
    # 8 cells over well-separated bases, splits are rare — require most
    collapsed = sum(
        1 for ids in truth_groups
        if len({out[i][0] for i in ids}) == 1 and out[ids[0]][0] == min(ids)
    )
    assert collapsed >= 12, collapsed
    for s in singles:
        assert out[s] == (s, True)
    # representatives are exactly the group minima
    for i, (g, k) in out.items():
        assert k == (g == i)


def test_minhash_dedup_groups_planted(spark):
    """Planted exact-duplicate pairs collapse into groups with the
    min-id representative kept; distinct docs stay singletons."""
    texts = [
        "the quick brown fox jumps over the lazy dog and runs far away today",
        "completely different content about spark shuffle partitions and joins",
        "a third unrelated document mentioning minhash signatures and banding",
    ]
    rows = []
    vid = 0
    groups = []
    for t in texts:
        ids = []
        for _ in range(2):  # exact dup of each text
            rows.append((vid, t)); ids.append(vid); vid += 1
        groups.append(ids)
    rows.append((vid, "lone single document with entirely distinct words here")); 
    lone = vid
    df = spark.createDataFrame(rows, "doc_id long, text string")
    from datamatch_spark.extras.dedup import minhash_dedup_groups

    out = {r["doc_id"]: (r["group_id"], r["keep"])
           for r in minhash_dedup_groups(df, "doc_id", threshold=0.9).collect()}
    assert len(out) == vid + 1
    for a, b in groups:
        assert out[a] == (a, True)
        assert out[b] == (a, False)
    assert out[lone] == (lone, True)


def test_auto_bands_selection():
    """auto_bands minimizes the weighted S-curve FP/FN error over the
    divisors of n_perm (MMDS §3.4), and raises — never silently
    degrades to one band — when n_perm has no usable divisor."""
    assert D.auto_bands(64, 0.5) == 16
    assert D.auto_bands(64, 0.7) == 8
    assert D.auto_bands(64, 0.9) == 4   # NOT 8: over-banding floods verify
    assert D.auto_bands(63, 0.7) == 9   # odd n_perm: divisors 3,7,9,21
    with pytest.raises(ValueError, match="no usable band count"):
        D.auto_bands(61, 0.7)  # prime n_perm


def test_auto_bands_is_error_optimal():
    """The chosen band count has minimal weighted error among ALL
    usable divisors (independent re-integration on a different grid),
    and raising fn_weight never decreases the band count (more bands =
    more recall)."""
    import numpy as np

    def err(n_perm, b, t, wfp, wfn):
        r = n_perm // b
        s = np.linspace(0.0, 1.0, 2001)
        p = 1.0 - (1.0 - s**r) ** b
        trapezoid = getattr(np, "trapezoid", None) or np.trapz
        fp = trapezoid(p[s < t], s[s < t])
        fn = trapezoid(1.0 - p[s >= t], s[s >= t])
        return wfp * fp + wfn * fn

    for n_perm, t in [(64, 0.5), (64, 0.8), (64, 0.9), (128, 0.8), (63, 0.7)]:
        b = D.auto_bands(n_perm, t)
        divisors = [x for x in range(2, n_perm // 2 + 1) if n_perm % x == 0]
        best = min(divisors, key=lambda x: err(n_perm, x, t, 0.5, 0.5))
        assert b == best, (n_perm, t, b, best)
    for t in (0.5, 0.7, 0.9):
        balanced = D.auto_bands(64, t)
        recallish = D.auto_bands(64, t, fp_weight=0.1, fn_weight=0.9)
        assert recallish >= balanced


def test_semantic_dedup_fixed_centroids(spark):
    """centroids= bypasses quantizer training and reproduces the
    brute-force blocked computation: near-dups in the same cell group
    together; near-dups straddling cells are missed (the documented
    SemDeDup trade-off)."""
    import numpy as np

    rng = np.random.RandomState(3)
    c0 = np.array([1.0, 0.0, 0.0, 0.0])
    c1 = np.array([0.0, 1.0, 0.0, 0.0])
    rows = []
    # pairs 0/1 and 2/3 near-dup inside cells 0 and 1 respectively;
    # 4 sits alone in cell 0
    for i, (base, eps) in enumerate(
        [(c0, 0.0), (c0, 0.01), (c1, 0.0), (c1, 0.01), (c0, 0.4)]
    ):
        v = base + eps * rng.rand(4)
        if i == 4:
            v = base + np.array([0.0, 0.9, 0.0, 0.0])  # between cells
        rows.append((i, [float(x) for x in (v / np.linalg.norm(v))]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {
        r["vec_id"]: (r["group_id"], r["keep"])
        for r in S.semantic_dedup(
            df, threshold=0.99, centroids=[list(c0), list(c1)]
        ).collect()
    }
    assert got[0] == (0, True) and got[1] == (0, False)
    assert got[2] == (2, True) and got[3] == (2, False)
    assert got[4] == (4, True)

    with pytest.raises(ValueError, match="centroids"):
        S.semantic_dedup(df, centroids=[]).collect()


def test_band_weight_validation(docs):
    with pytest.raises(ValueError, match="band_fn_weight"):
        D.minhash_lsh_pairs(docs, "doc_id", band_fn_weight=2.0)
    with pytest.raises(ValueError, match="non-negative"):
        D.auto_bands(64, 0.7, fp_weight=-1.0, fn_weight=2.0)


def test_wav_8bit_unsigned_and_edge_cases():
    """8-bit PCM WAV is unsigned (midpoint 0x80): silence must decode
    to ~zero features, not full-scale garbage; 1-frame audio must not
    produce NaN zero-crossing."""
    import io
    import wave

    import numpy as np

    def wav8(samples_u8, rate=8000):
        buf = io.BytesIO()
        with wave.open(buf, "wb") as wv:
            wv.setnchannels(1)
            wv.setsampwidth(1)
            wv.setframerate(rate)
            wv.writeframes(bytes(samples_u8))
        return buf.getvalue()

    n, rate, feats = M._decode_wav(wav8([0x80] * 1000), 4)
    assert n == 1000 and abs(feats[0]) < 1e-6 and abs(feats[2]) < 1e-6
    # 1-frame: finite features, zero crossings
    n1, _, f1 = M._decode_wav(wav8([0xFF]), 4)
    assert n1 == 1 and all(np.isfinite(f1)) and f1[3] == 0.0


def test_ppm_one_pixel_dim_no_nan():
    import numpy as np

    img = np.full((1, 4, 3), 100, dtype=np.uint8)
    w, h, feats = M._decode_ppm(M.encode_ppm(img), 10)
    assert (w, h) == (4, 1) and all(np.isfinite(feats))
    tall = np.full((4, 1, 3), 100, dtype=np.uint8)
    w2, h2, f2 = M._decode_ppm(M.encode_ppm(tall), 10)
    assert (w2, h2) == (1, 4) and all(np.isfinite(f2))


def test_decode_media_dim_validated(spark):
    docs = generate_documents(spark, CorpusConfig(n_docs=5, seed=5))
    media = M.media_table_from_docs(docs)
    with pytest.raises(ValueError, match="dim"):
        M.decode_media(media, dim=17)


def test_simhash_max_hamming_zero_runs(docs):
    """n_chunks=1 (the lossless default for max_hamming=0) builds a
    64-bit chunk whose mask must be -1, not (1<<64)-1 (JVM long
    overflow at plan-build time)."""
    pairs = {
        (r["idx_a"], r["idx_b"]): r["hamming"]
        for r in D.simhash_near_pairs(docs, "doc_id", n=2, max_hamming=0).collect()
    }
    assert pairs == {(1, 3): 0}  # only the identical-text pair


def test_cosine_topk_tied_duplicates_deterministic(spark):
    """Exact-duplicate corpora produce score ties far wider than
    k+margin inside ONE Arrow batch; the per-batch cut must keep the
    ids the global (cos DESC, neighbor_id ASC) order wants — the
    smallest neighbor_ids — not an argpartition-arbitrary subset."""
    rows = [(i, [1.0, 0.0]) for i in range(40)]  # 40 identical vectors
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>"
    ).coalesce(1)
    got = [
        r["neighbor_id"]
        for r in S.cosine_topk(df, df.where("vec_id = 39"), k=5, margin=3)
        .orderBy("rank")
        .collect()
    ]
    assert got == [0, 1, 2, 3, 4]


def test_lsh_plane_cap_and_integer_packing(spark):
    """n_planes > 62 must raise (int64 codes); at 62 planes the
    integer packing is exact where the old float64 matmul lost bits
    past the 53-bit mantissa."""
    import numpy as np

    import pytest as _pytest

    df = spark.createDataFrame(
        [(0, [1.0, 0.5]), (1, [1.0, 0.5]), (2, [-1.0, 0.5])],
        "vec_id long, embedding array<float>",
    )
    with _pytest.raises(ValueError, match="62"):
        S.lsh_topk(df, df, n_planes=63)
    planes = S._hyperplanes(2, 62, seed=1)
    coded = S._attach_codes(df, planes, "vec_id", "embedding", "id", "v")
    got = {r["id"]: r["__code"] for r in coded.collect()}
    # independent per-bit reference
    V = np.array([[1.0, 0.5], [1.0, 0.5], [-1.0, 0.5]])
    bits = (V @ planes.T) > 0
    want = {
        i: int(sum(1 << j for j in range(62) if bits[i, j])) for i in range(3)
    }
    assert got == want
    assert got[0] == got[1]  # identical vectors share a bucket


def test_lsh_empty_corpus_returns_typed_empty(spark):
    empty = spark.createDataFrame([], "vec_id long, embedding array<float>")
    out = S.lsh_topk(empty, empty, k=3)
    assert out.count() == 0
    assert out.columns == ["query_id", "neighbor_id", "cos", "rank"]
    nd = S.embedding_near_dup_pairs(empty, lsh_planes=8)
    assert nd.count() == 0
    assert nd.columns == ["idx_a", "idx_b", "cos"]


def test_minhash_checkpoint_keyed_by_text_col(spark, tmp_path):
    """A signature cache built over one text column must MISS for a
    different column (stale-cache contract, review r5)."""
    rows = [
        (1, "alpha beta gamma delta epsilon zeta", "one two three four five six"),
        (2, "alpha beta gamma delta epsilon zeta", "seven eight nine ten eleven twelve"),
    ]
    df = spark.createDataFrame(rows, "id long, title string, body string")
    d = str(tmp_path / "ck")
    p1 = D.minhash_lsh_pairs(
        df, "id", text_col="title", n=2, n_perm=32, threshold=0.5,
        checkpoint_dir=d,
    ).count()
    p2 = D.minhash_lsh_pairs(
        df, "id", text_col="body", n=2, n_perm=32, threshold=0.5,
        checkpoint_dir=d,
    ).count()
    assert p1 == 1 and p2 == 0  # titles identical, bodies disjoint


def test_minhash_match_side_tags(spark, tmp_path):
    """Match-mode checkpoint identity is (params, columns, side tag),
    not data content: re-running with a FRESH tag for the changed side
    recomputes; equal/empty tags are rejected loudly."""
    import pytest

    txt = " ".join(f"w{j}" for j in range(30))
    corpus = spark.createDataFrame([(10, txt)], "doc_id long, text string")
    crawl1 = spark.createDataFrame(
        [(1, txt.replace("w3", "zz", 1))], "doc_id long, text string"
    )
    crawl2 = spark.createDataFrame(
        [(2, " ".join(f"q{j}" for j in range(30)))], "doc_id long, text string"
    )
    kw = dict(n=2, n_perm=32, bands=8, threshold=0.5)
    d = str(tmp_path / "ck")
    n1 = D.minhash_lsh_match(
        crawl1, corpus, "doc_id", checkpoint_dir=d,
        side_tags=("crawl1", "corpus_v1"), **kw,
    ).count()
    # next increment: new tag for the changed side, corpus side reuses
    n2 = D.minhash_lsh_match(
        crawl2, corpus, "doc_id", checkpoint_dir=d,
        side_tags=("crawl2", "corpus_v1"), **kw,
    ).count()
    assert n1 == 1 and n2 == 0  # crawl2 shares nothing with the corpus
    for bad in [("same", "same"), ("", "ok"), ("a b", "a_b")]:
        with pytest.raises(ValueError, match="side_tags"):
            D.minhash_lsh_match(crawl1, corpus, "doc_id", side_tags=bad, **kw)


def test_md5_gram_hash_matches_hashlib(spark):
    """hash_fn='md5' gram hashes equal the int64 view of the big-endian
    first 8 md5 bytes of each distinct bigram (the cross-engine
    contract the DuckDB oracle relies on)."""
    import hashlib

    import numpy as np

    texts = [
        "the quick brown fox",
        "ünïcode tökens here too",
        "a b",
        "repeat repeat repeat repeat",
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               "doc_id long, text string")
    got = {
        r["doc_id"]: set(r["h"])
        for r in D.with_shingle_hashes(df, "text", 2, "h", "md5").collect()
    }
    for i, t in enumerate(texts):
        toks = t.split(" ")
        grams = {f"{a} {b}" for a, b in zip(toks, toks[1:])}
        want = {
            int(np.uint64(int(hashlib.md5(g.encode()).hexdigest()[:16], 16))
                .astype(np.int64))
            for g in grams
        }
        assert got[i] == want, f"doc {i}"


def test_md5_mode_minhash_planted_near_dups(spark):
    """The deterministic-hash variant keeps the LSH contract: planted
    near-dups recalled, precision exact (same corpus as the xxhash64
    test above)."""
    rows = []
    for i in range(40):
        words = " ".join(f"w{(i // 2) * 50 + j}" for j in range(30))
        if i % 2 == 1:
            words = words.replace(f"w{(i // 2) * 50 + 3}", "zz", 1)
        rows.append((i, words))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["idx_a"], r["idx_b"])
        for r in D.minhash_lsh_pairs(
            df, "doc_id", n=2, n_perm=64, bands=16, threshold=0.5,
            hash_fn="md5",
        ).collect()
    }
    want = {(2 * k, 2 * k + 1) for k in range(20)}
    assert len(got & want) >= 18
    assert not (got - want)


def test_simhash_md5_mode_exact_dup_is_hamming_zero(docs):
    got = {
        (r["idx_a"], r["idx_b"]): r["hamming"]
        for r in D.simhash_near_pairs(
            docs, "doc_id", n=2, max_hamming=8, hash_fn="md5"
        ).collect()
    }
    assert got[(1, 3)] == 0  # exact dup
    assert (1, 2) in got  # one-word near dup


def test_hash_fn_validated():
    import pandas as pd  # noqa: F401 — pyspark import guard parity

    with pytest.raises(ValueError, match="hash_fn"):
        D._check_hash_fn("sha1")


def test_minhash_checkpoint_keyed_by_hash_fn(spark, tmp_path):
    """An xxhash64 signature cache must MISS for an md5 rerun (the two
    paths' signatures are incompatible bit streams)."""
    rows = [
        (1, "alpha beta gamma delta epsilon zeta"),
        (2, "alpha beta gamma delta epsilon zeta"),
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    d = str(tmp_path / "ck")
    k = dict(n=2, n_perm=32, threshold=0.5, checkpoint_dir=d)
    assert D.minhash_lsh_pairs(df, "id", **k).count() == 1
    assert D.minhash_lsh_pairs(df, "id", hash_fn="md5", **k).count() == 1
    stages = {p.name for p in (tmp_path / "ck").iterdir()}
    assert any("_hmd5" in s for s in stages), stages
    assert any("_hmd5" not in s for s in stages), stages


def test_decode_wav_24bit_pcm(spark):
    """24-bit PCM is legal and stdlib-readable; it must decode (sign
    preserved via the pad-and-shift widening), not KeyError."""
    import io
    import struct
    import wave

    import numpy as np

    from datamatch_spark.extras import multimodal as M

    samples = [0, 2**22, -(2**22), 2**23 - 1, -(2**23)]
    raw = b"".join(struct.pack("<i", s)[:3] for s in samples)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wv:
        wv.setnchannels(1)
        wv.setsampwidth(3)
        wv.setframerate(8000)
        wv.writeframes(raw)
    n, rate, feats = M._decode_wav(buf.getvalue(), 4)
    assert n == len(samples) and rate == 8000
    assert all(np.isfinite(feats))
    assert abs(feats[1] - 1.0) < 1e-6  # |x|max = full scale


def test_decode_ppm_malformed_headers_raise_cleanly():
    import pytest as _pytest

    from datamatch_spark.extras import multimodal as M

    with _pytest.raises(ValueError, match="truncated header"):
        M._decode_ppm(b"P6\n640 ", 16)
    with _pytest.raises(ValueError, match="unterminated header comment"):
        M._decode_ppm(b"P6\n# comment", 16)


# ---------- decontamination / duplicated-n-gram stats ----------


def _hygiene_docs(spark):
    rows = [
        (0, "a b c d e f g h"),          # 8 tokens
        (1, "a b c d e f g h"),          # exact dup of 0
        (2, "x y z a b c d e f w"),      # shares 5-grams with 0/1
        (3, "p q r s"),                  # shorter than n=5: no grams
        (4, "unique tokens only here never repeated anywhere at all"),
        (5, ""),                         # empty text
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_decontaminate_flags_and_counts(spark):
    from datamatch_spark.extras.decontam import decontaminate

    docs = _hygiene_docs(spark)
    out = decontaminate(
        docs.where("doc_id > 0"),
        docs.where("doc_id = 0"),
        n=5,
    )
    got = {r["doc_id"]: (r["n_contaminated_ngrams"], r["contaminated"]) for r in out.collect()}
    # doc 1 is an exact dup: all 4 of its distinct 5-grams hit
    # doc 2 shares exactly 'a b c d e' ... grams of 0: grams of 2 are
    # [x y z a b, y z a b c, z a b c d, a b c d e, b c d e f, c d e f w];
    # eval grams of 0 are [a b c d e, b c d e f, c d e f g, d e f g h]
    assert got[1] == (4, True)
    assert got[2] == (2, True)
    assert got[3] == (0, False)   # too short for any gram
    assert got[4] == (0, False)
    assert got[5] == (0, False)
    assert set(got) == {1, 2, 3, 4, 5}  # every train row preserved


def test_decontaminate_hash_vs_string_grams_identical(spark):
    from datamatch_spark.extras.decontam import decontaminate

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    train = docs.where("doc_id % 20 != 0")
    ev = docs.where("doc_id % 20 = 0")
    a = sorted(decontaminate(train, ev, n=5, hash_grams=True).collect())
    b = sorted(decontaminate(train, ev, n=5, hash_grams=False).collect())
    assert a == b and len(a) > 0


def test_dup_ngram_stats_corpus_wide(spark):
    from datamatch_spark.extras.decontam import dup_ngram_stats

    docs = _hygiene_docs(spark)
    out = dup_ngram_stats(docs, n=5)
    got = {
        r["doc_id"]: (r["n_grams"], r["n_dup_grams"], round(r["dup_fraction"], 6))
        for r in out.collect()
    }
    # docs 0 and 1 are identical: all 4 grams duplicated
    assert got[0] == (4, 4, 1.0)
    assert got[1] == (4, 4, 1.0)
    # doc 2: 6 grams, 2 shared with docs 0/1
    assert got[2] == (6, 2, round(2 / 6, 6))
    assert got[3] == (0, 0, 0.0)
    assert got[5] == (0, 0, 0.0)
    assert set(got) == {0, 1, 2, 3, 4, 5}


def test_dup_ngram_stats_hash_vs_string_identical(spark):
    from datamatch_spark.extras.decontam import dup_ngram_stats

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    a = sorted(dup_ngram_stats(docs, n=8, hash_grams=True).collect())
    b = sorted(dup_ngram_stats(docs, n=8, hash_grams=False).collect())
    assert a == b and len(a) > 0


def test_decontaminate_broadcasts_eval_side(spark):
    from datamatch_spark.extras.decontam import decontaminate

    docs = _hygiene_docs(spark)
    plan = decontaminate(
        docs.where("doc_id > 0"), docs.where("doc_id = 0"), n=5
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def test_deterministic_sample_stable_under_repartition(spark):
    from datamatch_spark.extras.sampling import deterministic_sample

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    a = sorted(r["doc_id"] for r in deterministic_sample(docs, 0.3, "doc_id").collect())
    b = sorted(
        r["doc_id"]
        for r in deterministic_sample(docs.repartition(17), 0.3, "doc_id").collect()
    )
    assert a == b and 0 < len(a) < docs.count()
    # a different salt draws a genuinely different sample
    c = sorted(
        r["doc_id"] for r in deterministic_sample(docs, 0.3, "doc_id", salt="x").collect()
    )
    assert c != a


def test_stratified_sample_rates_and_validation(spark):
    import pytest as _pytest

    from datamatch_spark.extras.sampling import (
        deterministic_sample,
        stratified_deterministic_sample,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = stratified_deterministic_sample(
        docs, "doc_id", "lang", {"en": 1.0}, default_fraction=0.0
    )
    got = {(r["doc_id"], r["lang"]) for r in out.select("doc_id", "lang").collect()}
    want = {(r["doc_id"], r["lang"]) for r in docs.where("lang = 'en'").select("doc_id", "lang").collect()}
    assert got == want  # fraction 1.0 keeps every row of the stratum, 0.0 none
    with _pytest.raises(ValueError):
        deterministic_sample(docs, 1.5, "doc_id")
    with _pytest.raises(ValueError):
        stratified_deterministic_sample(docs, "doc_id", "lang", {"en": -0.1})


def test_sampling_threshold_rounds_not_truncates():
    from datamatch_spark.extras.sampling import _threshold

    assert _threshold(0.57) == 5700  # int(0.57*10000) would give 5699
    assert _threshold(0.0) == 0 and _threshold(1.0) == 10000


def test_repetition_signals_goldens(spark):
    """Hand-computed Gopher repetition signals. Doc 0: 'a b a b a b'
    (11 chars; bigrams 'a b'x3 + 'b a'x2 -> top2 mass 9; 5-grams
    'a b a b a'x1 + 'b a b a b'x1 -> dup5 0). Doc 1: no repetition.
    Doc 2: '' and doc 3: NULL -> all signals 0.0."""
    df = spark.createDataFrame(
        [
            (0, "a b a b a b"),
            (1, "one two three four five six"),
            (2, ""),
            (3, None),
            (4, "x y z x y z x y z x y z"),
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r.asDict()
        for r in T.repetition_signals(
            df, top_ns=(2,), dup_ns=(2, 5)
        ).collect()
    }
    assert got[0]["n_chars"] == 11
    assert got[0]["top_2gram_char_frac"] == pytest.approx(9 / 11, abs=1e-6)
    # dup2: 'a b'x3 (9 chars) + 'b a'x2 (6) = 15/11 capped at 1.0
    assert got[0]["dup_2gram_char_frac"] == 1.0
    assert got[0]["dup_5gram_char_frac"] == 0.0
    # no repeats: the heaviest bigram is 'three four' (10 chars x 1)
    assert got[1]["top_2gram_char_frac"] == pytest.approx(10 / 27, abs=1e-6)
    assert got[1]["dup_2gram_char_frac"] == 0.0
    for d in (2, 3):
        assert got[d]["n_chars"] == 0
        assert got[d]["top_2gram_char_frac"] == 0.0
        assert got[d]["dup_2gram_char_frac"] == 0.0
    # doc 4: 23 chars; 5-grams: 'x y z x y'x2, 'y z x y z'x2,
    # 'z x y z x'x2, then x2, then the remaining 5-grams unique?
    # tokens = 12 -> eight 5-grams, pattern period 3: starts 1..8,
    # grams at starts 1,4 / 2,5 / 3,6 equal (x2 each), starts 7,8
    # equal to 1,2's grams -> counts: g1 x3, g2 x3, g3 x2.
    # dup mass = (3+3+2)*9 = 72 -> capped 1.0; top2: 'x y'x4? bigrams:
    # x y (4), y z (4), z x (3) -> top mass 4*3=12 -> 12/23.
    assert got[4]["top_2gram_char_frac"] == pytest.approx(12 / 23, abs=1e-6)
    assert got[4]["dup_5gram_char_frac"] == 1.0
    with pytest.raises(ValueError, match="top_ns/dup_ns"):
        T.repetition_signals(df, top_ns=(), dup_ns=())


def test_bpe_token_estimate_goldens(spark):
    """Pre-tokenizer piece counts on hand-tokenized strings; the regex
    must agree between Java (Spark) and RE2 (DuckDB oracle) — both
    leftmost-first alternation, no lookaround used."""
    df = spark.createDataFrame(
        [
            (0, "hello world"),        # 'hello', ' world'
            (1, "it's 42 tokens!"),    # 'it', \"'\", 's', ' 42, ' tokens', '!'
            (2, ""),                   # no pieces
            (3, None),                 # NULL -> 0 by contract
            (4, "a  b"),               # 'a', ' b' -- wait: 'a', ' ', ' b'? see below
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["n_bpe_pieces"], r["est_tokens_chars"])
        for r in T.with_bpe_token_estimate(df).collect()
    }
    assert got[0] == (2, 3)   # 11 chars -> ceil(11/4) = 3
    assert got[1] == (6, 4)   # 15 chars -> 4
    assert got[2] == (0, 0)
    assert got[3] == (0, 0)
    # 'a  b': 'a' then ' ' matches '[a-zA-Z]+' with optional space?
    # leftmost at pos 1: ' ?[a-zA-Z]+' consumes ' ' then needs letter,
    # sees ' ' -> fails; digit/punct same; ' +' matches one ' ' (next
    # char starts ' b' letter piece). Pieces: 'a', ' ', ' b' -> 3.
    assert got[4] == (3, 1)


def test_canonicalize_url_cases(spark):
    from datamatch_spark.extras.urls import canonicalize_url

    cases = [
        # (raw, expected canonical)
        ("HTTP://WWW.Ex.COM:80/A/b?utm_source=x&q=1&gclid=z#f",
         "http://www.ex.com/A/b?q=1"),
        ("https://a.b.com:443/", "https://a.b.com/"),
        ("https://a.b.com:8443/x", "https://a.b.com:8443/x"),
        ("http://h.com/p?utm_a=1", "http://h.com/p"),
        ("http://h.com/p?fbclid", "http://h.com/p"),          # bare name
        ("http://h.com/p?xutm_b=1", "http://h.com/p?xutm_b=1"),  # not prefix
        ("ftp://Host.Com:80/x", "ftp://host.com:80/x"),  # :80 only http
        ("not a url", "not a url"),                      # refusal
        ("HTTPS://H.com", "https://h.com"),              # empty path
    ]
    df = spark.createDataFrame([(i, r) for i, (r, _) in enumerate(cases)],
                               ["i", "u"])
    got = {
        r["i"]: r["c"]
        for r in df.select("i", canonicalize_url(F.col("u")).alias("c"))
        .collect()
    }
    for i, (_, want) in enumerate(cases):
        assert got[i] == want, (i, cases[i][0], got[i])


def test_registered_domain_cases(spark):
    from datamatch_spark.extras.urls import registered_domain

    cases = [
        ("https://news.site.co.uk/x", "site.co.uk"),
        ("http://www.example.com", "example.com"),
        ("https://192.168.0.1:8080/", "192.168.0.1"),
        ("deep.sub.shop.com.au", "shop.com.au"),  # bare host input
        ("localhost", "localhost"),
        ("https://example.com/a", "example.com"),
        # NULL stays NULL — without the guard concat_ws() folds NULL
        # labels to "" and every NULL URL pools into one "" domain
        (None, None),
    ]
    df = spark.createDataFrame([(i, r) for i, (r, _) in enumerate(cases)],
                               schema="i long, u string")
    got = {
        r["i"]: r["d"]
        for r in df.select("i", registered_domain(F.col("u")).alias("d"))
        .collect()
    }
    for i, (_, want) in enumerate(cases):
        assert got[i] == want, (i, cases[i][0], got[i])


def test_filter_blocked_domains(spark):
    from datamatch_spark.extras.urls import filter_blocked_domains

    df = spark.createDataFrame(
        [(1, "https://ads.bad.com/x"), (2, "https://ok.org/y"),
         (3, "http://sub.bad.com/z")],
        ["id", "url"],
    )
    kept = filter_blocked_domains(df, "url", ["bad.com"])
    assert sorted(r["id"] for r in kept.collect()) == [2]
    flagged = filter_blocked_domains(df, "url", ["bad.com"],
                                     flag_col="blocked")
    got = {r["id"]: r["blocked"] for r in flagged.collect()}
    assert got == {1: True, 2: False, 3: True}
    # DataFrame blocklist: broadcast anti-join path
    bl = spark.createDataFrame([("BAD.com",)], ["domain"])
    kept2 = filter_blocked_domains(df, "url", bl)
    assert sorted(r["id"] for r in kept2.collect()) == [2]
    with pytest.raises(ValueError):
        filter_blocked_domains(df, "url", bl, flag_col="nope")
    # empty collection blocks nothing
    assert filter_blocked_domains(df, "url", []).count() == 3


def test_keep_best_in_groups(spark):
    groups = spark.createDataFrame(
        [(10, 1), (10, 2), (10, 3), (20, 4), (20, 5), (30, 6)],
        ["group_id", "doc_id"],
    )
    scores = spark.createDataFrame(
        # group 10: doc 2 wins on score; doc 1 is NaN (sorts above +inf
        # in Spark's total order — must NOT win); group 20: tie ->
        # lowest id (4); group 30: singleton keeps; doc 3 has no score
        # row (never wins)
        [(1, float("nan")), (2, 0.9), (4, 0.7), (5, 0.7), (6, 0.1)],
        ["doc_id", "quality_score"],
    )
    got = {
        r["doc_id"]: (r["group_id"], r["keep"])
        for r in D.keep_best_in_groups(groups, scores).collect()
    }
    assert got == {
        1: (10, False), 2: (10, True), 3: (10, False),
        4: (20, True), 5: (20, False), 6: (30, True),
    }


def test_domain_stats(spark):
    from datamatch_spark.extras.urls import domain_stats

    df = spark.createDataFrame(
        [
            # ex.com: 3 docs, 2 canonical urls (tracking param collapses)
            (1, "http://www.ex.com/a?utm_x=1", 0.2),
            (2, "http://www.ex.com/a", 0.4),
            (3, "http://www.ex.com/b", 0.6),
            # site.co.uk: 1 doc
            (4, "https://n.site.co.uk/p", 1.0),
        ],
        ["doc_id", "url", "q"],
    )
    got = {
        r["domain"]: (r["n_docs"], r["n_urls"], r["avg_q"])
        for r in domain_stats(
            df, "url", aggs={"avg_q": F.round(F.avg("q"), 6)}
        ).collect()
    }
    assert got == {
        "ex.com": (3, 2, 0.4),
        "site.co.uk": (1, 1, 1.0),
    }
    # approx path: same grouping, HLL count within its error bound on
    # tiny cardinalities (exact here), schema unchanged
    approx = {
        r["domain"]: (r["n_docs"], r["n_urls"])
        for r in domain_stats(df, "url", exact_distinct=False).collect()
    }
    assert approx == {"ex.com": (3, 2), "site.co.uk": (1, 1)}


def test_cap_per_domain_basic_and_deterministic(spark):
    from datamatch_spark.extras.urls import cap_per_domain

    rows = [(i, f"https://hot.example.com/p/{i}") for i in range(40)]
    rows += [(100 + i, f"https://cold{i}.org/x") for i in range(5)]
    rows += [(200, None)]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    kept = cap_per_domain(df, "url", 3, salt="t").collect()
    by_dom = {}
    for r in kept:
        by_dom.setdefault(r["domain"], []).append(r["doc_id"])
    assert len(by_dom["example.com"]) == 3
    for i in range(5):
        assert by_dom[f"cold{i}.org"] == [100 + i]  # under-cap domains intact
    assert by_dom[None] == [200]  # NULL url rows form their own group
    # deterministic: repartitioned input keeps the SAME rows
    again = {
        r["doc_id"]
        for r in cap_per_domain(df.repartition(7), "url", 3, salt="t").collect()
    }
    assert again == {r["doc_id"] for r in kept}
    # matches the hashlib-replayed rank
    import hashlib

    want = sorted(
        range(40),
        key=lambda i: (hashlib.md5(f"t\x1f{i}".encode()).hexdigest(), i),
    )[:3]
    assert sorted(by_dom["example.com"]) == sorted(want)


def test_cap_per_domain_presharded_parity(spark):
    from datamatch_spark.extras.urls import cap_per_domain

    rows = [(i, f"https://a.net/{i}") for i in range(60)]
    rows += [(1000 + i, f"https://b{i % 4}.io/{i}") for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    one = {
        r["doc_id"]
        for r in cap_per_domain(df, "url", 5, salt="s", pre_shards=None).collect()
    }
    two = {
        r["doc_id"]
        for r in cap_per_domain(df, "url", 5, salt="s", pre_shards=3).collect()
    }
    assert one == two  # the shard pre-cut is lossless

    import pytest as _pytest

    with _pytest.raises(ValueError, match="max_docs"):
        cap_per_domain(df, "url", 0)
    with _pytest.raises(ValueError, match="pre_shards"):
        cap_per_domain(df, "url", 2, pre_shards=0)


def test_cap_per_domain_rejects_existing_domain_col(spark):
    from datamatch_spark.extras.urls import cap_per_domain

    df = spark.createDataFrame(
        [(1, "https://a.com/x", "pre")], "doc_id long, url string, domain string"
    )
    with pytest.raises(ValueError, match="'domain' column"):
        cap_per_domain(df, "url", 2)
