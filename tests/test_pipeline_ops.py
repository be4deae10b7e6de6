"""Training-data pipeline ops: LSH recall vs brute force, kNN exactness vs
brute force, dedup sanity, multimodal stubs."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from openeo_geotrellis_extensions_spark.operators.knn import knn_join
from openeo_geotrellis_extensions_spark.pipeline.dedup import (
    dedup_exact,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
)
from openeo_geotrellis_extensions_spark.pipeline.multimodal import (
    decode_image,
    fetch_media,
    media_features,
    sample_frames,
)
from openeo_geotrellis_extensions_spark.pipeline.similarity import (
    cosine_topk_bruteforce,
    lsh_topk,
)
from openeo_geotrellis_extensions_spark.sources.interleaved import synth_docs

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").cache()


def test_lsh_recall_vs_bruteforce(spark, emb):
    """ANN quality gate. These embeddings are RANDOM vectors — the hardest
    case for hyperplane LSH (true top-3 sit at cosine ~0.35, where
    P(bit match) ~ 0.6). At 4 bits x 8 tables measured recall is ~0.5;
    assert >= 0.4 as the regression floor. Real (clustered) embeddings
    recall far higher at the same settings."""
    exact = {
        (r.query_id, r.neighbor_id)
        for r in cosine_topk_bruteforce(emb, k=3).collect()
    }
    approx = {
        (r.query_id, r.neighbor_id)
        for r in lsh_topk(emb, k=3, bits=4, tables=8, dim=64).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.4, f"LSH recall {recall:.2f}"


def test_knn_join_matches_bruteforce(spark):
    docs = synth_docs(spark, 400)
    from openeo_geotrellis_extensions_spark.sources.interleaved import (
        extract_geometries,
    )

    pts = (
        extract_geometries(docs)
        .groupBy("doc_id")
        .agg(
            ((F.min("xmin") + F.max("xmax")) / 2).alias("x"),
            ((F.min("ymin") + F.max("ymax")) / 2).alias("y"),
        )
        .cache()
    )
    qs = spark.createDataFrame(
        [("q0", 4.3, 51.0), ("q1", -120.0, 10.0), ("q2", 179.0, -85.0)],
        ["query_id", "qx", "qy"],
    )
    got = {
        (r.query_id, r["rank"]): r.neighbor_id
        for r in knn_join(pts, qs, k=4, res=5).collect()
    }
    p = pts.collect()
    for qid, qx, qy in [("q0", 4.3, 51.0), ("q1", -120.0, 10.0), ("q2", 179.0, -85.0)]:
        dists = sorted(
            (np.hypot(r.x - qx, r.y - qy), r.doc_id) for r in p
        )
        for rank in range(1, 5):
            assert got[(qid, rank)] == dists[rank - 1][1], (qid, rank)


def test_dedup_exact_groups(spark):
    ev = spark.read.parquet(f"{SF}/events.parquet")
    out = dedup_exact(ev, text_col="props", id_col="event_id")
    assert out.count() == ev.count()
    # props like {"k": 12} repeat -> real dup groups exist
    assert out.where("group_size > 1").count() > 0
    # canonical is the min id of its group
    bad = out.where("canonical_id > id").count()
    assert bad == 0


def test_minhash_candidates_superset_of_high_jaccard(spark):
    """LSH banding must catch (nearly) all very-similar pairs: every pair with
    jaccard >= 0.5 appears among MinHash candidates (16 hashes / 4 bands
    -> s-curve threshold ~ (1/4)^(1/4) = 0.707; >=0.5 pairs are caught with
    high probability; the fixture's near-dup pairs sit at ~0.9)."""
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    high = {
        (r.id_a, r.id_b)
        for r in ngram_jaccard_pairs(docs, threshold=0.5).collect()
    }
    assert high, "fixture should contain near-duplicate docs"
    cand = {
        (r.id_a, r.id_b)
        for r in minhash_lsh_pairs(docs, num_hashes=16, bands=4).collect()
    }
    missed = high - cand
    assert len(missed) <= max(1, len(high) // 10), f"missed {missed}"


def test_media_pipeline_batch_shape(spark):
    docs = synth_docs(spark, 100)
    media = fetch_media(docs)
    rows = media.limit(5).collect()
    assert all(len(r.content) == 256 and r.dtype == "uint8" for r in rows)
    feats = media_features(media)
    f = feats.limit(5).collect()
    assert all(0 <= r.mean_px < 100 for r in f)
    assert media.count() == feats.count()


def test_multimodal_codec_seams():
    # PNG decode is REAL now (sinks/png.py stdlib decoder) — garbage input
    # fails with a format error, not a missing-codec stub
    with pytest.raises(ValueError, match="not a PNG"):
        decode_image(b"...", "png")
    # JPEG is REAL now (sinks/jpeg.py) — garbage input is a format error
    with pytest.raises(ValueError, match="not a JPEG"):
        decode_image(b"...", "jpeg")
    # video stays an honest stub (no codec libs in this environment)
    with pytest.raises(NotImplementedError):
        sample_frames(b"...")


def test_media_refs_data_uri_and_file(spark, tmp_path):
    """Media refs beyond tile://: data:image/{png,jpeg};base64 and file://
    resolve through the repo's own codecs; unsupported schemes still raise."""
    import base64

    import numpy as np

    from openeo_geotrellis_extensions_spark.pipeline.multimodal import (
        _resolve_media_ref,
        fetch_media,
        media_features,
    )
    from openeo_geotrellis_extensions_spark.sinks.jpeg import encode_jpeg
    from openeo_geotrellis_extensions_spark.sinks.png import encode_png_bytes

    img = (np.arange(96).reshape(8, 12) * 2 % 251).astype(np.uint8)
    png_b64 = base64.b64encode(encode_png_bytes(img)).decode()
    p = tmp_path / "x.png"
    p.write_bytes(encode_png_bytes(img))
    jpg = encode_jpeg(img, quality=95)

    # direct resolution round-trips PNG bit-exact; JPEG within lossy bounds
    np.testing.assert_array_equal(
        _resolve_media_ref(f"data:image/png;base64,{png_b64}", 16), img
    )
    np.testing.assert_array_equal(_resolve_media_ref(f"file://{p}", 16), img)
    jarr = _resolve_media_ref(
        "data:image/jpeg;base64," + base64.b64encode(jpg).decode(), 16
    )
    assert jarr.shape == img.shape
    assert float(np.abs(jarr.astype(float) - img).mean()) < 12.0

    # an RGB ref must resolve to the single-channel (h, w) layout every
    # consumer assumes — deterministic integer BT.601 luma, not a crash
    rgb = np.stack([img, (img * 2) % 251, (img * 3) % 251], axis=-1)
    rgb_b64 = base64.b64encode(encode_png_bytes(rgb)).decode()
    got = _resolve_media_ref(f"data:image/png;base64,{rgb_b64}", 16)
    r3 = rgb.astype(np.int64)
    want = (299 * r3[..., 0] + 587 * r3[..., 1] + 114 * r3[..., 2] + 500) // 1000
    np.testing.assert_array_equal(got, want.astype(np.uint8))
    assert got.shape == img.shape and got.dtype == np.uint8

    # through the Spark pipeline: spans with mixed schemes
    docs = spark.createDataFrame(
        [
            (
                "d0",
                [
                    ("media", None, f"data:image/png;base64,{png_b64}", 0),
                    ("media", None, f"file://{p}", 20),
                ],
            )
        ],
        "doc_id string, spans array<struct<kind:string,text:string,"
        "media_ref:string,offset:int>>",
    )
    media = fetch_media(docs)
    rows = media.collect()
    assert len(rows) == 2
    assert all(r.width == 12 and r.height == 8 and r.dtype == "uint8" for r in rows)
    stats = {r.span_idx: r for r in media_features(media, nodata=255).collect()}
    want_mean = round(float(img[img != 255].mean()), 6)
    assert abs(stats[0].mean_px - want_mean) < 1e-9

    with pytest.raises(NotImplementedError, match="no codec/fetcher"):
        _resolve_media_ref("http://example.invalid/x.png", 16)


def test_embedding_near_dups_lsh_subset_and_recall(spark, emb):
    """LSH-bucketed near-dups: every returned pair must appear in the
    brute-force result with an identical cosine (precision 1.0), and recall
    of truly-near pairs (cosine >= 0.5, ~29 deg) must clear the floor.
    Random vectors are LSH's worst case — clustered real embeddings do
    far better at the same settings."""
    from openeo_geotrellis_extensions_spark.pipeline.dedup import (
        embedding_near_dups,
        embedding_near_dups_lsh,
    )

    exact = {
        (r.id_a, r.id_b): r.cosine
        for r in embedding_near_dups(emb, threshold=0.4).collect()
    }
    approx = {
        (r.id_a, r.id_b): r.cosine
        for r in embedding_near_dups_lsh(
            emb, threshold=0.4, bits=4, tables=8, dim=64
        ).collect()
    }
    assert approx, "LSH near-dups found nothing"
    for pair, cos in approx.items():
        assert pair in exact and exact[pair] == cos  # precision 1.0
    hi = {p for p, c in exact.items() if c >= 0.5}
    if hi:
        got = len(hi & set(approx)) / len(hi)
        assert got >= 0.5, f"high-cosine recall {got:.2f}"


def test_jaccard_verify_matches_exact_on_candidates(spark):
    """jaccard_verify(df, cand) == full exact join restricted to cand."""
    from openeo_geotrellis_extensions_spark.pipeline.dedup import (
        jaccard_verify,
        minhash_lsh_pairs,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    cand = minhash_lsh_pairs(docs, num_hashes=16, bands=4)
    exact = {
        (r.id_a, r.id_b): r.jaccard
        for r in ngram_jaccard_pairs(docs, threshold=0.0).collect()
    }
    verified = jaccard_verify(docs, cand).collect()
    assert verified
    for r in verified:
        assert exact[(r.id_a, r.id_b)] == r.jaccard


def test_ngram_jaccard_max_df_drops_only_hot_gram_pairs(spark):
    """With the df cap: every returned pair is in the uncapped result with
    identical jaccard; pairs missed share only hot grams."""
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    full = {
        (r.id_a, r.id_b): r.jaccard
        for r in ngram_jaccard_pairs(docs, threshold=0.05).collect()
    }
    capped = {
        (r.id_a, r.id_b): r.jaccard
        for r in ngram_jaccard_pairs(docs, threshold=0.05, max_df=4).collect()
    }
    assert capped
    for pair, j in capped.items():
        assert full[pair] == j


def test_ngram_jaccard_uncapped_guard_raises_on_large_corpus(spark):
    """Uncapped (max_df=None) path carries the same corpus-size contract as
    cosine_topk_bruteforce: above max_docs it raises instead of launching the
    quadratic hot-shingle self-join; max_df or max_docs=None opt out."""
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    with pytest.raises(ValueError, match="quadratic on hot n-grams"):
        ngram_jaccard_pairs(docs, threshold=0.05, max_docs=10)
    # capped path unaffected by the guard (its hot buckets are pre-pruned)
    assert ngram_jaccard_pairs(docs, threshold=0.05, max_df=4, max_docs=10).count()
    # explicit opt-out still runs
    assert ngram_jaccard_pairs(docs, threshold=0.05, max_docs=None).count()


def test_chunk_documents_windows(spark):
    """Window math: 64-token chunks stepping 48, ragged tail, short doc ->
    one chunk, overlap region shared verbatim between neighbors."""
    from openeo_geotrellis_extensions_spark.pipeline.text import chunk_documents

    n = 113
    text = " ".join(f"w{i}" for i in range(n))
    docs = spark.createDataFrame(
        [(0, text), (1, "only three words"), (2, "x")], ["doc_id", "text"]
    )
    out = chunk_documents(docs, chunk_tokens=64, overlap=16)
    rows = {(r.id, r.chunk_idx): (r.n_tokens, r.chunk_text) for r in out.collect()}
    assert [k for k in rows if k[0] == 0] == [(0, 0), (0, 1), (0, 2)]
    assert rows[(0, 0)][0] == 64 and rows[(0, 1)][0] == 64
    assert rows[(0, 2)][0] == n - 2 * 48  # ragged tail: 17 tokens
    # overlap: last 16 tokens of chunk 0 == first 16 of chunk 1
    c0 = rows[(0, 0)][1].split(" ")
    c1 = rows[(0, 1)][1].split(" ")
    assert c0[48:] == c1[:16]
    assert c1 == [f"w{i}" for i in range(48, 112)]
    assert rows[(1, 0)] == (3, "only three words")
    assert rows[(2, 0)] == (1, "x")
    import pytest as _pytest

    with _pytest.raises(ValueError, match="overlap"):
        chunk_documents(docs, chunk_tokens=16, overlap=16)


def test_simhash_near_pairs_guaranteed_recall(spark):
    """Pigeonhole hamming-band join: the result EQUALS the all-pairs
    hamming<=3 filter (recall 1.0 by construction, precision 1.0 by the
    verify) — checked against a numpy brute force over every pair."""
    from openeo_geotrellis_extensions_spark.pipeline.dedup import (
        simhash_near_pairs,
        simhash_signatures,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    for bits in (32, 64):  # legacy narrow and default wide signatures
        sigs = {
            r.id: r.simhash for r in simhash_signatures(docs, bits=bits).collect()
        }
        ids = sorted(sigs)
        want = set()
        mask = (1 << 64) - 1  # two's-complement view for the sign-bit sig
        for i, a in enumerate(ids):
            for b in ids[i + 1 :]:
                h = bin((sigs[a] ^ sigs[b]) & mask).count("1")
                if h <= 3:
                    want.add((a, b, h))
        got = {
            (r.id_a, r.id_b, r.hamming)
            for r in simhash_near_pairs(docs, max_hamming=3, bits=bits).collect()
        }
        assert got == want
    assert want  # the fixture's near-dup docs produce real pairs


def test_simhash_band_width_controls_candidate_volume(spark):
    """The r4 perf-weak item made concrete: on a corpus of bounded near-dup
    clusters plus random docs, widening 32-bit signatures (8-bit band keys)
    to 64-bit (16-bit keys) collapses the spurious-candidate volume, and
    64-bit candidate growth under a 10x corpus is far below quadratic
    (quadratic = 100x)."""
    import random

    from openeo_geotrellis_extensions_spark.pipeline.dedup import (
        simhash_band_candidates,
    )

    rng = random.Random(7)
    vocab = [f"w{i:04d}" for i in range(4000)]

    def corpus(n, tag):
        rows = []
        for c in range(n // 5):  # clusters of 5 mutated copies of a template
            base = rng.sample(vocab, 30)
            for j in range(5):
                words = list(base)
                words[rng.randrange(30)] = rng.choice(vocab)
                rows.append((c * 5 + j, f"{tag} " + " ".join(words)))
        return spark.createDataFrame(rows, ["doc_id", "text"])

    small, big = corpus(200, "s"), corpus(2000, "b")
    c64_small = simhash_band_candidates(small, 3, 64).count()
    c64_big = simhash_band_candidates(big, 3, 64).count()
    c32_big = simhash_band_candidates(big, 3, 32).count()
    # 8-bit keys: ~4*C(2000,2)/256 ≈ 31k spurious candidates; 16-bit keys
    # keep candidates near the true near-pair count
    assert c32_big > 10 * c64_big
    # sub-quadratic growth: 10x docs must cost far less than 100x candidates
    assert c64_big < 25 * c64_small


def test_simhash_near_pairs_rejects_zero_width_bands(spark):
    import pytest as _pytest

    from openeo_geotrellis_extensions_spark.pipeline.dedup import (
        simhash_near_pairs,
    )

    docs = spark.createDataFrame([(1, "a b c"), (2, "a b d")], ["doc_id", "text"])
    with _pytest.raises(ValueError, match="zero-width band"):
        simhash_near_pairs(docs, max_hamming=16, bits=16).count()


def test_bigram_lm_sees_word_order(spark):
    """The design motivation: a doc made of the corpus's own words in
    SHUFFLED order has near-identical unigram NLL but clearly worse bigram
    NLL than the repeated fluent pattern it was shuffled from."""
    from openeo_geotrellis_extensions_spark.pipeline.text import (
        bigram_logprob_scores,
        unigram_logprob_scores,
    )

    fluent = "the cat sat on the mat and the dog ran to the door"
    words = fluent.split()
    shuffled = " ".join(
        [words[i] for i in (7, 2, 11, 0, 9, 4, 6, 1, 10, 3, 12, 5, 8)]
    )
    rows = [(i, fluent) for i in range(20)] + [(100, shuffled)]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    uni = {r.doc_id: r.nll for r in unigram_logprob_scores(docs).collect()}
    bi = {r.doc_id: r.nll for r in bigram_logprob_scores(docs).collect()}
    assert abs(uni[100] - uni[0]) < 0.05  # unigram: shuffle is invisible
    assert bi[100] > bi[0] + 0.5  # bigram: order violation costs real nats
    assert all(r.n_bigrams == len(words) - 1 for r in
               bigram_logprob_scores(docs).collect() if r.doc_id == 0)
    # docs with < 2 tokens produce no bigram row
    tiny = spark.createDataFrame([(1, "word")], ["doc_id", "text"])
    assert bigram_logprob_scores(tiny).count() == 0


def test_gopher_rules_each_rule_fires(spark):
    """One doc per rule violation; the good doc passes all five."""
    from openeo_geotrellis_extensions_spark.pipeline.text import gopher_rules

    good = "the quick brown fox and a lazy dog walk to the old mill of town"
    docs = spark.createDataFrame(
        [
            (0, good),
            (1, "too few words here"),  # word count
            (2, "a " * 14 + "the of"),  # mean word len < 2
            (3, "the # of # a # to # and # is # it # in # or # an # word"),
            (4, "the 1 2 3 4 5 6 7 8 9 10 11 12 13 of"),  # alpha frac
            (5, "zebra quokka wombat numbat dingo koala emu bilby yabby dugong"),
        ],
        ["doc_id", "text"],
    )
    rows = {r.doc_id: r for r in gopher_rules(docs).collect()}
    assert rows[0].keep
    assert not rows[1].r_word_count and not rows[1].keep
    assert not rows[2].r_mean_word_len and not rows[2].keep
    assert not rows[3].r_symbol_ratio and not rows[3].keep
    assert not rows[4].r_alpha_words and not rows[4].keep
    assert not rows[5].r_stopwords and not rows[5].keep


def test_canonical_docs_keep_one_per_group(spark):
    """A near-dup cluster keeps exactly its longest member (tie -> smallest
    id); singletons keep themselves; every doc appears exactly once."""
    from openeo_geotrellis_extensions_spark.pipeline.dedup import canonical_docs

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    docs = spark.createDataFrame(
        [
            (1, base),
            (2, base + " extra"),         # same cluster, longest -> canonical
            (3, base + " extri"),         # same cluster, same len as 2 -> id 2 wins
            (7, "totally different words about nothing in particular here"),
        ],
        ["doc_id", "text"],
    )
    rows = {r.doc_id: r for r in canonical_docs(docs).collect()}
    assert set(rows) == {1, 2, 3, 7}
    assert rows[1].component == rows[2].component == rows[3].component
    assert all(rows[i].canonical_id == 2 for i in (1, 2, 3))
    assert rows[2].keep and not rows[1].keep and not rows[3].keep
    assert rows[7].keep and rows[7].canonical_id == 7  # singleton
    assert sum(r.keep for r in rows.values()) == 2


def test_dataset_split_stable_and_complete(spark):
    """Every row gets exactly one split; assignments are content-keyed
    (identical under repartitioning AND under corpus growth — old docs
    never move when new docs arrive); fractions land near targets."""
    import pytest as _pytest

    from openeo_geotrellis_extensions_spark.pipeline.sample import dataset_split

    df = spark.range(4000).withColumnRenamed("id", "doc_id")
    got = dataset_split(df, "doc_id")
    counts = {r["split"]: r["count"] for r in got.groupBy("split").count().collect()}
    assert set(counts) == {"train", "val", "test"}
    assert counts["train"] + counts["val"] + counts["test"] == 4000
    assert abs(counts["train"] / 4000 - 0.9) < 0.03
    a = {r.doc_id: r["split"] for r in got.collect()}
    b = {
        r.doc_id: r["split"]
        for r in dataset_split(df.repartition(13), "doc_id").collect()
    }
    assert a == b  # repartition-stable
    grown = {
        r.doc_id: r["split"]
        for r in dataset_split(
            spark.range(8000).withColumnRenamed("id", "doc_id"), "doc_id"
        ).collect()
    }
    assert all(grown[k] == v for k, v in a.items())  # growth never moves docs

    with _pytest.raises(ValueError, match="sum to 1"):
        dataset_split(df, "doc_id", {"train": 0.5, "test": 0.4})
    with _pytest.raises(ValueError, match="two splits"):
        dataset_split(df, "doc_id", {"train": 1.0})


def test_ngram_contamination_planted(spark):
    """Decontamination: a training doc embedding a benchmark 8-gram is
    flagged with the right window counts; clean docs are not; short docs
    (<n words) are excluded like every n-gram consumer."""
    from openeo_geotrellis_extensions_spark.pipeline.dedup import (
        ngram_contamination,
    )

    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog tonight")],
        ["doc_id", "text"],
    )
    train = spark.createDataFrame(
        [
            (0, "intro words then the quick brown fox jumps over the lazy dog tonight and more"),
            (1, "totally unrelated text with nine or ten words here today"),
            (2, "short doc"),
        ],
        ["doc_id", "text"],
    )
    out = {r.id: r for r in ngram_contamination(train, bench, n=8).collect()}
    assert out[0].contaminated and out[0].n_contaminated == 3  # 3 shared windows
    assert out[0].n_windows == 15 - 8 + 1
    assert not out[1].contaminated and out[1].n_contaminated == 0
    assert 2 not in out  # <8 words: no windows, excluded


def test_pack_sequences_invariants(spark):
    """Next-fit packing: no sequence over capacity (unless a single doc
    exceeds it), ids within a bucket pack in order (seq_idx nondecreasing),
    greedy property (a new sequence opens ONLY on overflow), and the result
    is repartition-stable."""
    from openeo_geotrellis_extensions_spark.pipeline.text import pack_sequences

    docs = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .withColumn("bucket", (F.col("doc_id") % 8).cast("int"))
    )
    out = pack_sequences(docs, capacity=128).collect()
    assert len(out) == docs.count()
    by_bucket = {}
    for r in out:
        by_bucket.setdefault(r.bucket, []).append(r)
    for rows in by_bucket.values():
        rows.sort(key=lambda r: r.id)
        seqs = {}
        prev_seq = 0
        for r in rows:
            assert r.seq_idx >= prev_seq  # nondecreasing in id order
            prev_seq = r.seq_idx
            seqs.setdefault(r.seq_idx, []).append(r.n_tokens)
        for idx in sorted(seqs):
            total = sum(seqs[idx])
            assert total <= 128 or len(seqs[idx]) == 1  # capacity respected
            if idx + 1 in seqs:  # greedy: the next seq's head did not fit
                assert total + seqs[idx + 1][0] > 128
    again = pack_sequences(docs.repartition(17), capacity=128).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))


def test_semdedup_cluster_scoped_pruning(spark):
    """SemDeDup: within each quantizer cluster, every vector cosine-similar
    to a lower-id vector is dropped (keep-lowest-id per epsilon-ball);
    cross-checked against a direct pairwise sweep on the same clustering."""
    import numpy as np

    from openeo_geotrellis_extensions_spark.pipeline.dedup import semdedup

    emb = spark.read.parquet(f"{SF}/embeddings.parquet").cache()
    out = semdedup(emb, threshold=0.18, n_lists=8, iters=2).collect()
    assert len(out) == emb.count()
    kept = {r.id for r in out if r.kept}
    lists = {r.id: r.list_id for r in out}
    assert 0 < len(kept) < len(out)  # something pruned, something kept

    # direct reference: pairwise cosine within each cluster
    rows = emb.collect()
    V = {r.vec_id: np.array(r.embedding, dtype=np.float64) for r in rows}
    dropped_ref = set()
    ids = sorted(V)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            if lists[a] != lists[b]:
                continue
            cos = round(
                float(
                    V[a] @ V[b]
                    / (np.sqrt(V[a] @ V[a]) * np.sqrt(V[b] @ V[b]))
                ),
                6,
            )
            if cos >= 0.18:
                dropped_ref.add(b)
    assert kept == set(ids) - dropped_ref

    # quadratic-cluster guard
    import pytest as _pytest

    with _pytest.raises(ValueError, match="max_list_rows"):
        semdedup(emb, n_lists=2, max_list_rows=50)


def test_unigram_logprob_scores_hand_checked(spark):
    """Unigram LM scoring on a 3-doc corpus vs a by-hand computation."""
    import math

    from openeo_geotrellis_extensions_spark.pipeline.text import (
        unigram_logprob_scores,
    )

    docs = spark.createDataFrame(
        [(0, "a a b"), (1, "b c"), (2, "a c c")], ["doc_id", "text"]
    )
    # counts: a=3 b=2 c=3, N=8, V=3, alpha=0.5 -> denom 9.5
    u = {
        w: round(-math.log((c + 0.5) / 9.5) * 1e6)
        for w, c in {"a": 3, "b": 2, "c": 3}.items()
    }
    want = {
        0: (3, round((2 * u["a"] + u["b"]) / 3e6, 6)),
        1: (2, round((u["b"] + u["c"]) / 2e6, 6)),
        2: (3, round((u["a"] + 2 * u["c"]) / 3e6, 6)),
    }
    got = {
        r.doc_id: (r.n_tokens, r.nll)
        for r in unigram_logprob_scores(docs).collect()
    }
    assert got == want
    # rare-token docs score higher than common-token docs
    docs2 = spark.createDataFrame(
        [(0, "the the the the"), (1, "zyxgly qwfpkt vbnmlr uiopjh")]
        + [(i, "the the the the") for i in range(2, 12)],
        ["doc_id", "text"],
    )
    s = {r.doc_id: r.nll for r in unigram_logprob_scores(docs2).collect()}
    assert s[1] > s[0]


def test_importance_sample_properties(spark):
    """Temperature-weighted sampling: deterministic, repartition-stable,
    keep-rate increases with weight, corpus-mean path lands near the target
    fraction."""
    from openeo_geotrellis_extensions_spark.pipeline.sample import (
        importance_sample,
    )

    df = spark.range(4000).select(
        F.col("id").alias("doc_id"),
        (F.when(F.col("id") % 4 == 0, 100.0).otherwise(1.0)).alias("w"),
    )
    kept = importance_sample(df, "doc_id", "w", target_fraction=0.4)
    ids = {r.doc_id for r in kept.collect()}
    again = {
        r.doc_id
        for r in importance_sample(
            df.repartition(13), "doc_id", "w", target_fraction=0.4
        ).collect()
    }
    assert ids == again  # content-keyed: partitioning-independent
    n_heavy = len([i for i in ids if i % 4 == 0])
    n_light = len(ids) - n_heavy
    # heavy docs (w=100, sqrt->10x weight) keep ~10x more often than light
    assert n_heavy / 1000 > 3 * (n_light / 3000)
    assert 0.25 < len(ids) / 4000 < 0.55  # near the target fraction
    # fixed normalizer path: closed-form, matches a manual filter
    fixed = importance_sample(
        df, "doc_id", "w", target_fraction=0.4, mean_weight=4.0
    )
    assert fixed.count() > 0
    """TF-IDF: hand-checked on a 3-doc corpus + JVM-only plan."""
    from openeo_geotrellis_extensions_spark.pipeline.text import tfidf_top_terms

    docs = spark.createDataFrame(
        [(0, "apple banana apple"), (1, "banana cherry"), (2, "cherry cherry dates")],
        ["doc_id", "text"],
    )
    out = tfidf_top_terms(docs, top_k=2)
    rows = {(r.id, r.rank): (r.term, r.score) for r in out.collect()}
    import math

    def idf(df):
        return math.log((3 + 1) / (df + 1)) + 1.0

    # doc 0: apple tf=2 df=1 -> top; banana tf=1 df=2
    assert rows[(0, 1)][0] == "apple"
    assert abs(rows[(0, 1)][1] - round(2 * idf(1), 6)) < 1e-9
    assert rows[(0, 2)][0] == "banana"
    # doc 2: cherry tf=2 df=2 beats dates tf=1 df=1
    assert rows[(2, 1)][0] == "cherry"
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_deterministic_sample_properties(spark):
    """Content-keyed sampling: repartition-stable, fraction within binomial
    bounds, strata fractions honored, fraction=1 keeps all, 0 keeps none."""
    from openeo_geotrellis_extensions_spark.pipeline.sample import (
        deterministic_sample,
        stratified_sample,
    )

    df = spark.range(4000).withColumnRenamed("id", "k")
    kept = deterministic_sample(df, "k", 0.5, salt="t")
    ids1 = {r.k for r in kept.collect()}
    ids2 = {r.k for r in deterministic_sample(df.repartition(7), "k", 0.5, salt="t").collect()}
    assert ids1 == ids2  # partitioning-independent
    assert abs(len(ids1) / 4000 - 0.5) < 0.05  # ~binomial(4000, .5)
    assert deterministic_sample(df, "k", 1.0).count() == 4000
    assert deterministic_sample(df, "k", 0.0).count() == 0

    strat = df.withColumn(
        "s", F.when(F.col("k") % 2 == 0, "even").otherwise("odd")
    )
    out = stratified_sample(strat, "s", {"even": 1.0, "odd": 0.25}, key_col="k")
    by = {r["s"]: r["count"] for r in out.groupBy("s").count().collect()}
    assert by["even"] == 2000
    assert abs(by.get("odd", 0) / 2000 - 0.25) < 0.06


def test_stratified_sample_null_stratum_takes_default(spark):
    """NULL strata must take default_fraction, not silently drop
    (round-2 review finding: ~isin(...) is NULL for NULL input)."""
    from openeo_geotrellis_extensions_spark.pipeline.sample import (
        stratified_sample,
    )

    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "b"), (4, None)], ["k", "s"]
    )
    kept = stratified_sample(
        df, "s", {"a": 1.0}, key_col="k", default_fraction=1.0
    )
    assert {r.k for r in kept.collect()} == {1, 2, 3, 4}  # null + unknown strata keep default 1.0
    none_kept = stratified_sample(df, "s", {"a": 1.0}, key_col="k", default_fraction=0.0)
    assert {r.k for r in none_kept.collect()} == {1}


def test_repetition_scores_hand_checked(spark):
    """Gopher repetition rules on a crafted corpus: duplicate lines and
    dominant bigrams detected; short docs get top_ngram_frac 0."""
    from openeo_geotrellis_extensions_spark.pipeline.text import repetition_scores

    docs = spark.createDataFrame(
        [
            (0, "a b\na b\nc d"),          # 3 lines, 1 dup; bigrams of 'a b a b c d'
            (1, "x y x y x y"),            # top bigram 'y x'/'x y' dominance
            (2, "single"),                 # 1 word -> no bigrams
        ],
        ["doc_id", "text"],
    )
    out = {r.id: r for r in repetition_scores(docs).collect()}
    assert out[0].n_lines == 3
    assert abs(out[0].dup_line_frac - round(1 - 2 / 3, 6)) < 1e-9
    # doc1: words x y x y x y -> bigrams: 'x y' x3, 'y x' x2 -> top 3/5
    assert abs(out[1].top_ngram_frac - 0.6) < 1e-9
    assert out[2].top_ngram_frac == 0.0
    # doc0 normalized words: 'a b a b c d' -> bigrams a b, b a, a b, b c, c d -> top 2/5
    assert abs(out[0].top_ngram_frac - 0.4) < 1e-9


def test_lsh_params_scale_with_corpus():
    from openeo_geotrellis_extensions_spark.pipeline.similarity import (
        lsh_params_for,
    )

    small = lsh_params_for(5_000)
    big = lsh_params_for(10**12)
    assert small["bits"] < big["bits"]
    assert big["bits"] >= 30  # 10^12 / 1k target -> bounded buckets
    # expected bucket size stays near target at any scale
    for n in (10**4, 10**8, 10**12):
        p = lsh_params_for(n)
        assert n / (2 ** p["bits"]) <= 2 * 1000


def test_substring_duplicate_spans_semantics(spark):
    """ExactSubstr span dedup: a 10-word block shared by two docs yields one
    maximal span in each (3 consecutive 8-word windows merged); a block
    repeated only WITHIN one doc is not flagged; short docs are ignored."""
    from openeo_geotrellis_extensions_spark.pipeline.dedup import (
        substring_duplicate_spans,
    )

    shared = "w0 w1 w2 w3 w4 w5 w6 w7 w8 w9"  # 10 words
    rows = [
        (1, f"alpha beta {shared} gamma"),            # span at words 2..11
        (2, f"{shared} tail1 tail2 tail3"),           # span at words 0..9
        (3, "self self self self self self self self self self self self"),
        (4, "too short"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = substring_duplicate_spans(df, n=8, min_docs=2)
    got = {
        (r.id, r.start_word, r.end_word, r.n_windows, r.max_doc_freq)
        for r in out.collect()
    }
    # doc 3's self-repeating windows ARE identical across positions but only
    # 1 distinct doc -> not flagged (within-doc repetition is text.py's job)
    assert got == {(1, 2, 11, 3, 2), (2, 0, 9, 3, 2)}

    # plan: no cartesian anywhere; dfreq join is an equi-join on the hash
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_pii_redact_counts_and_text(spark):
    """Each PII class is counted and replaced; the md5 output matches the
    expected scrubbed string; clean text passes through untouched."""
    import hashlib

    from openeo_geotrellis_extensions_spark.pipeline.text import pii_redact

    rows = [
        (1, "mail me at jo.doe+x@test.org or ping 10.20.30.40 and call +12-345-678-9012 ok"),
        (2, "no pii here at all"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in pii_redact(df).collect()}
    assert (got[1].n_email, got[1].n_phone, got[1].n_ipv4) == (1, 1, 1)
    assert (got[2].n_email, got[2].n_phone, got[2].n_ipv4) == (0, 0, 0)
    expected = ("mail me at [REDACTED_EMAIL] or ping [REDACTED_IPV4] "
                "and call [REDACTED_PHONE] ok")
    assert got[1].redacted_md5 == hashlib.md5(expected.encode()).hexdigest()
    assert got[2].redacted_md5 == hashlib.md5(rows[1][1].encode()).hexdigest()


def test_quality_classifier_monotone_and_exact_threshold(spark):
    """Stopword-rich text scores higher than digit-heavy text; keep is
    thresholded on the logit (deterministic at the boundary); no shuffle in
    the plan (map-only inference)."""
    from openeo_geotrellis_extensions_spark.pipeline.text import (
        quality_classifier,
    )

    rows = [
        (1, "the cat and the dog sat in a warm corner of the old house"),
        (2, "98432 13 77 012345 555 90210 31337 2718281828 4590 452"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = quality_classifier(df)
    got = {r.doc_id: r for r in out.collect()}
    assert got[1].q_score > got[2].q_score
    assert got[1].keep and not got[2].keep
    assert (got[1].q_logit >= 0) == got[1].keep
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # pure map-side inference


def test_media_features_heterogeneous_sizes(spark):
    """The media schema carries per-row width/height, so one Arrow batch may
    mix image sizes — stats must not ragged-stack (regression: np.stack
    ValueError on mixed 16x16 + 8x8 rows)."""
    import numpy as np_

    rows = []
    for i, size in enumerate([16, 8, 16, 4]):
        arr = (np_.arange(size * size) % 97).astype(np_.uint8)
        rows.append((f"doc_{i}", 0, "tile://x", bytes(arr.tobytes()),
                     size, size, "uint8", size * size))
    media = spark.createDataFrame(
        rows,
        "doc_id string, span_idx int, media_ref string, content binary, "
        "width int, height int, dtype string, n_bytes long",
    ).coalesce(1)
    got = {r.doc_id: r for r in media_features(media).collect()}
    assert len(got) == 4
    assert got["doc_1"].n_valid == 64 and got["doc_3"].n_valid == 16

    from openeo_geotrellis_extensions_spark.pipeline.multimodal import (
        media_resize,
    )
    rz = media_resize(media, factor=2).groupBy("doc_id").count().collect()
    by_doc = {r.doc_id: r["count"] for r in rz}
    assert by_doc == {"doc_0": 64, "doc_1": 16, "doc_2": 64, "doc_3": 4}
