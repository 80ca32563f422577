"""Behavior tests for the LLM-pipeline operators (dedup, text, multimodal)."""

from __future__ import annotations

from pyspark.sql import functions as F

from nornicdb_spark.operators import dedup, multimodal, textops


def test_exact_dedup_finds_seeded_copies(spark, catalog):
    docs = catalog.documents.select("doc_id", "text")
    seeded = docs.unionByName(
        docs.filter(F.col("doc_id") < 5).select(
            (F.col("doc_id") + 10000).alias("doc_id"), "text"
        )
    )
    dups = dedup.exact_duplicates(seeded).collect()
    assert len(dups) == 5
    assert all(r.n_copies == 2 and r.keep_id < 5 for r in dups)


def test_minhash_catches_prefix_near_dup(spark, catalog):
    # a doc vs its 80%-prefix must be caught by the LSH bands at high
    # similarity (prefix shingles ⊂ full shingles)
    base = catalog.documents.filter(F.col("doc_id") == 0).select("doc_id", "text")
    pref = base.select(
        F.lit(1).alias("doc_id"),
        F.col("text").substr(
            F.lit(1), F.floor(F.length("text") * 0.8).cast("int")
        ).alias("text"),
    )
    pairs = dedup.minhash_near_duplicates(
        base.unionByName(pref), threshold=0.3
    ).collect()
    assert len(pairs) == 1 and pairs[0].jaccard > 0.5


def test_simhash_similar_docs_close(spark, catalog):
    base = catalog.documents.filter(F.col("doc_id") == 0).select("doc_id", "text")
    pref = base.select(
        F.lit(1).alias("doc_id"),
        F.col("text").substr(
            F.lit(1), F.floor(F.length("text") * 0.9).cast("int")
        ).alias("text"),
    )
    fp = dedup.simhash_fingerprints(base.unionByName(pref))
    pairs = dedup.simhash_near_duplicates(fp, max_hamming=20).collect()
    assert len(pairs) == 1 and pairs[0].hamming <= 20


def test_embedding_near_dup_symmetric_bound(catalog):
    pairs = dedup.embedding_near_duplicates(
        catalog.embeddings.limit(100), threshold=-1.0
    )
    r = pairs.agg(F.count(F.lit(1)), F.max("cosine")).collect()[0]
    assert r[0] == 100 * 99 / 2  # all pairs once, a < b
    assert r[1] <= 1.0 + 1e-9


def test_embedding_near_dup_no_cartesian_product(catalog):
    # exact mode must plan as the balanced block-grid equi-join —
    # a CartesianProduct node here is the round-1 scale regression.
    pairs = dedup.embedding_near_duplicates(catalog.embeddings, threshold=0.45)
    plan = pairs._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_embedding_lsh_matches_exact_on_fixture(catalog):
    # LSH candidates + exact verify: with 16×2-bit bands the miss
    # probability at cosine 0.45 is ~1e-4 per pair; seeded planes make
    # the result deterministic, so equality with exact is a stable test.
    exact = {
        (r.a, r.b)
        for r in dedup.embedding_near_duplicates(
            catalog.embeddings, threshold=0.45, exact=True
        ).collect()
    }
    approx = {
        (r.a, r.b)
        for r in dedup.embedding_near_duplicates(
            catalog.embeddings, threshold=0.45, exact=False,
            n_bits=32, n_bands=16,
        ).collect()
    }
    assert approx <= exact  # verify step admits no false positives
    assert len(exact) > 0 and len(approx) >= 0.9 * len(exact)


def test_token_stats_nonnegative(catalog):
    stats = textops.token_stats(catalog.documents).collect()
    assert all(r.n_ws_tokens > 0 and r.n_bpe_ish >= r.n_ws_tokens for r in stats)


def test_language_id_deterministic_tiebreak(spark):
    df = spark.createDataFrame([(1, "xyzzy plugh")], "doc_id long, text string")
    r = textops.language_id(df).collect()[0]
    assert r.lang_pred == "de" and r.lang_score == 0.0  # all-zero tie → first lang


def test_multimodal_features_shape(catalog):
    media = multimodal.synthesize_media(catalog.documents.limit(30))
    feats = multimodal.extract_features(media, use_real_decoders=False).collect()
    assert len(feats) == 30
    assert all(len(r.features) == multimodal.FEATURE_DIM for r in feats)
    assert all(r.n_bytes > 0 for r in feats)


def test_multimodal_real_decoder_gate(catalog):
    media = multimodal.synthesize_media(catalog.documents.limit(1))
    try:
        multimodal.extract_features(media, use_real_decoders=True)
        assert multimodal._HAVE_REAL_DECODERS
    except NotImplementedError:
        assert not multimodal._HAVE_REAL_DECODERS


def test_multimodal_wav_ppm_roundtrip(catalog):
    # real encode→decode loop: header fields come back exactly as encoded.
    docs = catalog.documents.limit(20)
    out = {
        r.doc_id: r
        for r in multimodal.decode_media(
            multimodal.synthesize_encoded_media(docs)
        ).collect()
    }
    assert len(out) == 20
    for d, r in out.items():
        if d % 2 == 0:
            assert r.media_type == "audio"
            assert r.sample_rate == 8000 + (d % 3) * 4000
            assert r.channels == 1 + (d % 2)
            assert r.n_samples == (50 + d % 100) * r.channels
            assert r.n_bytes == 44 + r.n_samples * 2
            assert r.width is None and r.height is None
        else:
            assert r.media_type == "image"
            assert (r.width, r.height, r.maxval) == (4 + d % 13, 3 + d % 11, 255)
            assert 0 <= r.val_peak <= 255
            assert r.sample_rate is None


def test_multimodal_ppm_comments_and_odd_chunk_padding(spark):
    # decoder tolerance: PPM header comments, and WAV chunk walk over an
    # odd-sized (word-padded) leading chunk before data.
    import struct

    raster = bytes(range(12))  # 2x2 RGB
    ppm = b"P6\n# a comment\n2 2\n# another\n255\n" + raster
    data = struct.pack("<4h", 3, -4, 5, -6)
    wav = (
        b"RIFF" + struct.pack("<I", 4 + 8 + 16 + 8 + 5 + 1 + 8 + len(data)) + b"WAVE"
        + struct.pack("<4sIHHIIHH", b"fmt ", 16, 1, 1, 8000, 16000, 2, 16)
        + b"LIST" + struct.pack("<I", 5) + b"abcde\x00"  # odd chunk + pad byte
        + b"data" + struct.pack("<I", len(data)) + data
    )
    media = spark.createDataFrame(
        [(1, "image", bytearray(ppm)), (2, "audio", bytearray(wav))],
        "doc_id long, media_type string, content binary",
    )
    got = {r.doc_id: r for r in multimodal.decode_media(media).collect()}
    assert (got[1].width, got[1].height) == (2, 2)
    assert got[1].val_sum == sum(range(12)) and got[1].val_peak == 11
    assert got[2].sample_rate == 8000 and got[2].n_samples == 4
    assert got[2].val_sum == 3 + 4 + 5 + 6 and got[2].val_peak == 6


def test_multimodal_decode_rejects_corrupt_payloads(spark):
    import pytest as _pytest

    media = spark.createDataFrame(
        [(1, "audio", bytearray(b"NOTRIFFxxxxxxxxx"))],
        "doc_id long, media_type string, content binary",
    )
    with _pytest.raises(Exception, match="RIFF"):
        multimodal.decode_media(media).collect()


def test_frame_plan_counts(catalog):
    media = multimodal.synthesize_media(catalog.documents)
    plan = multimodal.frame_sample_plan(media, every_ms=500)
    joined = plan.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_frames")).join(
        media.select("doc_id", F.col("meta.duration_ms").alias("dur")), "doc_id"
    )
    bad = joined.filter(
        F.col("n_frames") != (F.floor(F.col("dur") / 500) + 1)
    ).count()
    assert bad == 0


def test_ngram_jaccard_df_cap_keeps_high_similarity_pairs(catalog):
    # hub-shingle cap: candidate join excludes stopword-like trigrams but
    # the verify numerator stays exact, so above-threshold pairs survive
    exact = {
        (r.a, r.b): r.jaccard
        for r in dedup.ngram_jaccard_pairs(
            catalog.documents, threshold=0.4
        ).collect()
    }
    capped = {
        (r.a, r.b): r.jaccard
        for r in dedup.ngram_jaccard_pairs(
            catalog.documents, threshold=0.4, max_shingle_df=100
        ).collect()
    }
    assert set(capped) <= set(exact)
    assert len(capped) >= 0.9 * len(exact)
    for k, v in capped.items():
        assert abs(v - exact[k]) < 1e-12  # scores exact, not approximated


def test_bpe_pair_counts_hand_case(spark):
    # 'aba ab' → word 'aba' pairs: 'a b','b a'; word 'ab': 'a b' →
    # counts: 'a b'=2, 'b a'=1; single-char words contribute nothing
    from nornicdb_spark.operators import textops

    docs = spark.createDataFrame(
        [(0, "Aba ab x"), (1, "ab")], "doc_id long, text string"
    )
    got = [(r.pair, r.freq) for r in textops.bpe_pair_counts(docs).collect()]
    assert got == [("a b", 3), ("b a", 1)]


def test_bpe_merges_hand_case(spark):
    # corpus: 'abab'×3, 'cd'×3 — pins frequency weighting, greedy
    # non-overlapping apply, the (freq desc, lhs, rhs) tie-break, and
    # early stop when the vocabulary exhausts before n_merges:
    #   round 1: (a,b)=6 beats (b,a)=3,(c,d)=3 → abab=[ab,ab]
    #   round 2: (ab,ab)=3 ties (c,d)=3, lhs 'ab'<'c' → abab=[abab]
    #   round 3: (c,d)=3 → cd=[cd]; round 4: nothing left → 3 rows
    from nornicdb_spark.operators import textops

    docs = spark.createDataFrame(
        [(0, "abab abab cd"), (1, "abab cd cd")], "doc_id long, text string"
    )
    got = [
        (r.merge_round, r.lhs, r.rhs, r.freq)
        for r in textops.bpe_merges(docs, n_merges=4)
        .orderBy("merge_round")
        .collect()
    ]
    assert got == [(1, "a", "b", 6), (2, "ab", "ab", 3), (3, "c", "d", 3)]

    # overlap counting vs non-overlapping apply: 'aaa' counts (a,a)
    # twice but merges to [aa, a] (canonical get_stats / greedy apply)
    docs2 = spark.createDataFrame([(0, "aaa")], "doc_id long, text string")
    got2 = [
        (r.merge_round, r.lhs, r.rhs, r.freq)
        for r in textops.bpe_merges(docs2, n_merges=2)
        .orderBy("merge_round")
        .collect()
    ]
    assert got2 == [(1, "a", "a", 2), (2, "aa", "a", 1)]


def test_bpe_encode_hand_case(spark):
    # encode applies the trained merges in order per word and preserves
    # the document's token stream order (posexplode + sorted reassembly)
    from nornicdb_spark.operators import textops

    docs = spark.createDataFrame(
        [(0, "abab abab cd"), (1, "abab cd cd")], "doc_id long, text string"
    )
    merges = [("a", "b"), ("ab", "ab"), ("c", "d")]
    got = {
        r.doc_id: list(r.tokens)
        for r in textops.bpe_encode(docs, merges).collect()
    }
    assert got == {0: ["abab", "abab", "cd"], 1: ["abab", "cd", "cd"]}

    # partial merges: only (a,b) trained → abab = [ab, ab]
    got1 = {
        r.doc_id: list(r.tokens)
        for r in textops.bpe_encode(docs, [("a", "b")]).collect()
    }
    assert got1[0] == ["ab", "ab", "ab", "ab", "c", "d"]


def test_bpe_ignores_separator_char_words(spark):
    # a word containing the \x01 encoding separator would corrupt the
    # wrapped representation — both train and encode exclude it (the
    # DuckDB oracles carry the same strpos filter)
    from nornicdb_spark.operators import textops

    docs = spark.createDataFrame(
        [(0, "ab ab a\x01b")], "doc_id long, text string"
    )
    got = [
        (r.lhs, r.rhs, r.freq)
        for r in textops.bpe_merges(docs, n_merges=1).collect()
    ]
    assert got == [("a", "b", 2)]  # the control-char word contributed 0
    toks = {
        r.doc_id: list(r.tokens)
        for r in textops.bpe_encode(docs, [("a", "b")]).collect()
    }
    assert toks == {0: ["ab", "ab"]}
