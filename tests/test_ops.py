"""Unit tests for the training-data operators: dedup families, similarity,
text stats, windows."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd

from document_processor_ray.functions import dedup as dd
from document_processor_ray.functions import similarity as sim
from document_processor_ray.functions import textstats as ts
from document_processor_ray.stages import window as win

BASE = ("the quick brown fox jumps over the lazy dog and runs far away into the "
        "green forest near the old river bank every single morning").split() * 3
# ×3 keeps pairwise shingle-Jaccard of the tweak-docs ≈0.9, far from the LSH
# threshold, so banding recall is deterministic-in-practice for the test


def _near_dup_docs():
    docs = []
    for i in range(8):
        words = list(BASE)
        words[i] = f"tweak{i}"  # near-duplicates of each other
        docs.append({"doc_id": i, "text": " ".join(words)})
    rng = np.random.RandomState(0)
    vocab = [f"w{j}" for j in range(500)]
    for i in range(8, 40):
        docs.append({"doc_id": i,
                     "text": " ".join(rng.choice(vocab, size=40))})
    docs.append({"doc_id": 40, "text": docs[10]["text"]})  # exact dup of doc 10
    return docs


@pytest.mark.usefixtures("ray_session")
def test_exact_dedup():
    ds = rd.from_items(_near_dup_docs())
    out = dd.exact_dedup(ds).to_pandas()
    assert len(out) == 40  # 41 docs, one exact dup collapsed
    row = out[out.n_dupes > 1]
    assert len(row) == 1 and row.iloc[0]["doc_id"] == 10 and row.iloc[0]["n_dupes"] == 2


@pytest.mark.usefixtures("ray_session")
def test_minhash_lsh_finds_near_dups():
    ds = rd.from_items(_near_dup_docs())
    pairs = dd.minhash_lsh_pairs(ds, threshold=0.5).to_pandas()
    got = {(a, b) for a, b in zip(pairs.a, pairs.b)}
    # all near-dup pairs among docs 0..7 should surface
    want = {(i, j) for i in range(8) for j in range(i + 1, 8)}
    assert want <= got
    # no random doc should pair with the near-dup cluster
    assert not any((a < 8) != (b < 8) for a, b in got if (a, b) != (10, 40))
    # estimated jaccard is high for the clones
    assert (pairs[pairs.a < 8].est_jaccard > 0.5).all()


@pytest.mark.usefixtures("ray_session")
def test_minhash_deterministic_across_runs():
    ds = rd.from_items(_near_dup_docs())
    p1 = dd.minhash_lsh_pairs(ds, threshold=0.5).to_pandas().sort_values(["a", "b"])
    p2 = dd.minhash_lsh_pairs(ds, threshold=0.5).to_pandas().sort_values(["a", "b"])
    pd.testing.assert_frame_equal(p1.reset_index(drop=True), p2.reset_index(drop=True))


@pytest.mark.usefixtures("ray_session")
def test_simhash_pairs():
    ds = rd.from_items(_near_dup_docs())
    pairs = dd.simhash_pairs(ds, max_hamming=6).to_pandas()
    got = {(a, b) for a, b in zip(pairs.a, pairs.b)}
    assert (10, 40) in got  # exact dup → hamming 0
    assert all(h <= 6 for h in pairs.hamming)
    # hamming symmetric sanity: recompute one pair directly
    sh = dd.SimHasher()
    docs = {d["doc_id"]: d["text"] for d in _near_dup_docs()}
    for a, b, h in zip(pairs.a, pairs.b, pairs.hamming):
        assert bin(sh.simhash(docs[a]) ^ sh.simhash(docs[b])).count("1") == h


def test_ngram_jaccard_scalar():
    assert dd.ngram_jaccard("a b c d", "a b c d") == 1.0
    assert dd.ngram_jaccard("a b c d", "x y z w") == 0.0
    j = dd.ngram_jaccard(" ".join(BASE), " ".join(BASE[:-1] + ["changed"]))
    assert 0.5 < j < 1.0


@pytest.mark.usefixtures("ray_session")
def test_verify_pairs_exact():
    docs = _near_dup_docs()
    ds = rd.from_items(docs)
    pairs = dd.minhash_lsh_pairs(ds, threshold=0.5)
    verified = dd.verify_pairs_exact(pairs, ds, threshold=0.6).to_pandas()
    assert len(verified) > 0
    assert (verified.jaccard >= 0.6).all()


@pytest.mark.usefixtures("ray_session")
def test_verify_pairs_bucketed_matches_broadcast():
    """The no-broadcast scale path (gram-set co-partitioned joins) returns the
    same verified pair set as the broadcast path."""
    docs = _near_dup_docs()
    pairs1 = dd.minhash_lsh_pairs(rd.from_items(docs), threshold=0.5)
    pairs2 = dd.minhash_lsh_pairs(rd.from_items(docs), threshold=0.5)
    broad = dd.verify_pairs_exact(pairs1, rd.from_items(docs), threshold=0.6).to_pandas()
    buck = dd.verify_pairs_exact_bucketed(pairs2, rd.from_items(docs),
                                          threshold=0.6).to_pandas()
    assert {(a, b) for a, b in zip(broad.a, broad.b)} == \
        {(a, b) for a, b in zip(buck.a, buck.b)}
    assert len(buck) > 0 and (buck.jaccard >= 0.6).all()


@pytest.mark.usefixtures("ray_session")
def test_verify_pairs_bucketed_emit_counts():
    """emit_counts adds integer |∩|/|∪| consistent with the scalar Jaccard
    on the raw texts (the hash-set counts equal gram-set counts)."""
    docs = _near_dup_docs()
    texts = {d["doc_id"]: d["text"] for d in docs}
    pairs = dd.minhash_lsh_pairs(rd.from_items(docs), threshold=0.5)
    out = dd.verify_pairs_exact_bucketed(
        pairs, rd.from_items(docs), threshold=0.0, emit_counts=True).to_pandas()
    assert len(out) > 0
    for r in out.itertuples(index=False):
        assert r.n_union >= r.n_inter >= 0
        assert r.jaccard == (round(r.n_inter / r.n_union, 6) if r.n_union else 1.0)
        assert abs(r.jaccard - dd.ngram_jaccard(texts[r.a], texts[r.b])) < 1e-6


@pytest.mark.usefixtures("ray_session")
def test_lsh_hot_bucket_cap():
    """~10k identical docs put every member in ONE bucket per band. The
    MAX_BUCKET cap degrades those buckets to adjacent-chain linking: bounded
    pairs (O(n), not O(n^2)), bounded time, overflow metric visible, and the
    whole set still collapses to a single cluster."""
    docs = [{"doc_id": i, "text": "identical content repeated " * 8}
            for i in range(10_000)]
    ds = rd.from_items(docs)
    dd.bucket_overflow_stats(reset=True)
    pairs = dd.minhash_lsh_pairs(ds, threshold=0.5).to_pandas()
    # chain linking: each band emits the same 9999 sorted-adjacent pairs
    assert len(pairs) == 9_999
    assert (pairs.est_jaccard == 1.0).all()
    stats = dd.bucket_overflow_stats()
    assert stats["buckets"] > 0 and stats["by_kind"].get("minhash", 0) > 0
    clusters = dd.dedup_clusters(rd.from_pandas(pairs[["a", "b"]])).to_pandas()
    assert len(clusters) == 10_000
    assert clusters["cluster"].nunique() == 1 and clusters["cluster"].iloc[0] == 0


@pytest.mark.usefixtures("ray_session")
def test_simhash_hot_bucket_cap():
    """Same guard on the SimHash family: identical docs overflow, chain-link,
    and report on the shared metric."""
    docs = [{"doc_id": i, "text": "same words everywhere " * 6}
            for i in range(2_000)]
    dd.bucket_overflow_stats(reset=True)
    pairs = dd.simhash_pairs(rd.from_items(docs), max_hamming=3).to_pandas()
    assert len(pairs) == 1_999
    assert (pairs.hamming == 0).all()
    assert dd.bucket_overflow_stats()["by_kind"].get("simhash", 0) > 0


@pytest.mark.usefixtures("ray_session")
def test_knn_matches_numpy_bruteforce():
    rng = np.random.RandomState(3)
    mat = rng.randn(200, 16).astype(np.float32)
    items = [{"vec_id": i, "embedding": mat[i].tolist()} for i in range(200)]
    ds = rd.from_items(items)
    q = mat[:5].astype(np.float64)
    out = sim.knn_cosine(ds, q, [0, 1, 2, 3, 4], k=7).to_pandas()
    m = mat.astype(np.float64)
    m /= np.linalg.norm(m, axis=1, keepdims=True)
    for qi in range(5):
        sims = m @ m[qi]
        sims[qi] = -np.inf
        order = np.lexsort((np.arange(200), -sims))[:7]
        got = out[out.query_id == qi].sort_values("rank").neighbor_id.tolist()
        assert got == order.tolist(), qi


@pytest.mark.usefixtures("ray_session")
def test_knn_ivf_recall():
    rng = np.random.RandomState(4)
    # clustered data so IVF recall is meaningful
    centers = rng.randn(8, 16) * 4
    mat = np.concatenate([centers[i % 8] + rng.randn(1, 16) for i in range(400)])
    items = [{"vec_id": i, "embedding": mat[i].tolist()} for i in range(400)]
    ds = rd.from_items(items)
    q = mat[:3]
    exact = sim.knn_cosine(ds, q, [0, 1, 2], k=10).to_pandas()
    approx = sim.knn_cosine_ivf(ds, q, [0, 1, 2], k=10, n_centroids=8, nprobe=3).to_pandas()
    recalls = []
    for qi in range(3):
        e = set(exact[exact.query_id == qi].neighbor_id)
        a = set(approx[approx.query_id == qi].neighbor_id)
        recalls.append(len(e & a) / len(e))
    assert np.mean(recalls) >= 0.7, recalls


def test_text_stats_batch():
    b = pa.table({"doc_id": [1, 2], "text": ["Hello, World 42!", ""]})
    out = ts.text_stats_batch(b)
    r = out.to_pylist()[0]
    assert r["n_tokens"] == 3 and r["n_punct"] == 2 and r["n_digit"] == 2
    assert r["n_upper"] == 2 and r["n_chars_seen"] == 16
    z = out.to_pylist()[1]
    assert z["n_tokens"] == 0 and z["n_chars_seen"] == 0


def test_langid_heuristic():
    samples = {
        "en": "the cat and the dog are in the house with a ball for the kids",
        "fr": "le chat et le chien sont dans la maison avec une balle pour les enfants",
        "de": "die katze und der hund sind in dem haus mit einem ball für die kinder",
        "es": "el gato y el perro están en la casa con una pelota para los niños",
    }
    lid = ts.LangId()
    b = pa.table({"doc_id": list(range(4)), "text": list(samples.values())})
    out = lid(b).to_pylist()
    for row, want in zip(out, samples.keys()):
        assert row["pred_lang"] == want, (want, row)
    und = lid(pa.table({"doc_id": [9], "text": ["zzz qqq xxx"]})).to_pylist()[0]
    assert und["pred_lang"] == "und"


def test_fingerprint_properties():
    b = pa.table({"doc_id": [1, 2, 3],
                  "text": ["abcdefghij" * 5, "abcdefghij" * 5, "totally different"]})
    out = ts.fingerprint_batch(b).to_pylist()
    assert out[0]["fingerprint"] == out[1]["fingerprint"]
    assert out[0]["fingerprint"] != out[2]["fingerprint"]
    assert len(out[0]["fingerprint"]) == 16


def test_fingerprint_grams_matches_naive():
    """Witness winnowing selection vs a direct reimplementation, across the
    length regimes: empty, < k, == k, k..k+window-1 grams, and long."""
    import hashlib

    texts = ["", "abc", "abcdefgh", "abcdefghij", "abcdefghij" * 5,
             "abcdefghij" * 5]
    b = pa.table({"doc_id": list(range(len(texts))), "text": texts})
    out = ts.fingerprint_grams_batch(b)
    got: dict = {}
    for d, g in zip(out["doc_id"].to_pylist(), out["gram"].to_pylist()):
        got.setdefault(d, set()).add(g)

    def md5l(s):
        v = int.from_bytes(hashlib.md5(s.encode()).digest()[8:], "little")
        return v - (1 << 64) if v >= (1 << 63) else v

    for i, t in enumerate(texts):
        n = len(t) - 7
        if n <= 0:
            want = {md5l(t)}
        else:
            # compare as unsigned, like the u64 engine path
            u = [md5l(t[j:j + 8]) % (1 << 64) for j in range(n)]
            if n >= 4:
                mins = {min(u[j:j + 4]) for j in range(n - 3)}
            else:
                mins = set(u)
            want = {v - (1 << 64) if v >= (1 << 63) else v for v in mins}
        assert got[i] == want, (i, t)
    assert got[4] == got[5]  # identical docs select identical grams


def test_fingerprint_digest_matches_naive():
    """md5 digest over the ordered unsigned selected-gram set == digesting
    fingerprint_grams_batch's output directly; keeps equal/distinct docs
    equal/distinct like the production sha256 digest."""
    import hashlib

    texts = ["", "abc", "abcdefghij" * 5, "abcdefghij" * 5,
             "totally different text"]
    b = pa.table({"doc_id": list(range(len(texts))), "text": texts})
    grams = ts.fingerprint_grams_batch(b)
    per_doc: dict = {}
    for d, g in zip(grams["doc_id"].to_pylist(), grams["gram"].to_pylist()):
        per_doc.setdefault(d, []).append(g % (1 << 64))
    out = ts.fingerprint_digest_batch(b).to_pylist()
    assert [r["doc_id"] for r in out] == list(range(len(texts)))
    for r in out:
        want = hashlib.md5(",".join(
            str(v) for v in sorted(per_doc[r["doc_id"]])).encode()).hexdigest()
        assert r["fingerprint"] == want
    assert out[2]["fingerprint"] == out[3]["fingerprint"]
    assert out[2]["fingerprint"] != out[4]["fingerprint"]
    assert "text" not in out[0]


@pytest.mark.usefixtures("ray_session")
def test_tumbling_window_matches_pandas():
    ts_vals = pd.to_datetime(
        ["2024-01-01 00:10", "2024-01-01 00:50", "2024-01-01 01:10",
         "2024-01-01 01:59", "2024-01-01 02:00"])
    df = pd.DataFrame({"ts": ts_vals, "event_type": ["a", "a", "a", "b", "b"],
                       "value": [1.0, 2.0, 3.0, 4.0, 5.0]})
    ds = rd.from_pandas(df)
    out = win.tumbling_counts(ds, size_s=3600).to_pandas().sort_values(
        ["event_type", "window_start"]).reset_index(drop=True)
    assert out.n_events.tolist() == [2, 1, 1, 1]
    assert out.window_start.tolist() == [
        1704067200, 1704070800, 1704070800, 1704074400]
    assert out.min_value.tolist() == [1.0, 3.0, 4.0, 5.0]


@pytest.mark.usefixtures("ray_session")
def test_session_counts():
    base = pd.Timestamp("2024-01-01")
    rows = []
    for m in [0, 5, 10, 120, 125, 500]:  # 3 sessions with gap 30min
        rows.append({"user_id": 1, "ts": base + pd.Timedelta(minutes=m)})
    rows.append({"user_id": 2, "ts": base})
    ds = rd.from_pandas(pd.DataFrame(rows))
    out = win.session_counts(ds, gap_s=1800).to_pandas().sort_values("user_id")
    assert out.n_sessions.tolist() == [3, 1]
    assert out.n_events.tolist() == [6, 1]


@pytest.mark.usefixtures("ray_session")
def test_minhash_batch_path_equals_scalar_reference():
    # the vectorized batch signer must stay bit-identical to the scalar
    # reference path (signature()) — including empty/short/whitespace docs
    import numpy as np
    import pyarrow as pa

    from document_processor_ray.functions.dedup import MinHashSigner

    texts = ["", "   ", "one", "one two", "a\tb\nc d e f", None,
             "the quick brown fox " * 50, "x " * 3]
    batch = pa.table({"doc_id": pa.array([str(i) for i in range(len(texts))]),
                      "text": pa.array(texts)})
    out = MinHashSigner()(batch)
    ref = MinHashSigner()
    for t, blob in zip(texts, out["sig"].to_pylist()):
        assert np.array_equal(ref.signature(t), np.frombuffer(blob, np.uint64))


@pytest.mark.usefixtures("ray_session")
def test_simhash_batch_path_equals_scalar_reference():
    import pyarrow as pa

    from document_processor_ray.functions.dedup import SimHasher

    texts = ["", "   ", "one", "one one two", "a b a b a c", None,
             "the quick brown fox " * 30, "x\ty\nz"]
    batch = pa.table({"doc_id": pa.array([str(i) for i in range(len(texts))]),
                      "text": pa.array(texts)})
    out = SimHasher()(batch)
    ref = SimHasher()
    assert out["simhash"].to_pylist() == [ref.simhash(t) for t in texts]


@pytest.mark.usefixtures("ray_session")
def test_repetition_stats_matches_naive(tmp_path):
    # vectorized Gopher-repetition kernel vs a naive per-doc Python oracle,
    # including empty / single-token / whitespace-run / heavy-repeat docs
    import re
    from collections import Counter

    import pyarrow.parquet as pq

    from document_processor_ray.pipelines.queries import q_repetition_stats

    texts = ["", "one", "a b", "a a a a a", "x y x y x y z",
             "  spaced\t\tout   tokens  ", "u v w " * 10 + "end",
             "b a b a c c c", "solo pair solo pair other solo pair"]
    tbl = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                    "text": pa.array(texts)})
    pq.write_table(tbl, tmp_path / "documents.parquet")

    got = (q_repetition_stats(str(tmp_path)).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    for i, txt in enumerate(texts):
        toks = [t for t in re.split(r"[ \t\n\r\f]+", txt) if t]
        bigs = Counter(" ".join(p) for p in zip(toks, toks[1:]))
        tris = Counter(" ".join(p) for p in zip(toks, toks[1:], toks[2:]))
        top = min(bigs.items(), key=lambda kv: (-kv[1], kv[0])) if bigs else ("", 0)
        row = got.iloc[i]
        assert row["n_tokens"] == len(toks)
        assert row["n_trigrams"] == sum(tris.values())
        assert row["n_distinct_trigrams"] == len(tris)
        assert (row["top_bigram"], row["top_bigram_n"]) == top


@pytest.mark.usefixtures("ray_session")
def test_kmeans_recovers_separated_clusters():
    # 3 well-separated blobs; ids 0,1,2 seed one blob each (init = lowest-id
    # vectors), 5 Lloyd iterations must recover the exact ground-truth partition
    from document_processor_ray.functions import cluster as cl

    rng = np.random.RandomState(7)
    centers = np.eye(3, 8)
    ids, vecs, truth = [], [], []
    for i in range(90):
        c = i % 3  # ids 0,1,2 land in distinct blobs
        v = centers[c] + 0.05 * rng.randn(8)
        ids.append(i)
        vecs.append((v / np.linalg.norm(v)).astype(np.float32).tolist())
        truth.append(c)
    ds = rd.from_arrow(pa.table({"vec_id": pa.array(ids, pa.int64()),
                                 "embedding": pa.array(vecs, pa.list_(pa.float32()))}))
    got = {r["vec_id"]: r["cluster"] for r in cl.kmeans(ds, k=3, n_iter=5).take_all()}
    by_cluster = {}
    for i, c in got.items():
        by_cluster.setdefault(c, set()).add(i)
    want = {c: {i for i in range(90) if i % 3 == c} for c in range(3)}
    assert sorted(map(frozenset, by_cluster.values())) == \
        sorted(map(frozenset, want.values()))


@pytest.mark.usefixtures("ray_session")
def test_kmeans_int_matches_numpy_and_recovers_blobs():
    """Integer-exact Lloyd (kmeans_int_assign) == a direct numpy/int
    reimplementation on the same data, recovers separated blobs, and is
    repartition-invariant."""
    from document_processor_ray.functions import cluster as cl

    rng = np.random.RandomState(11)
    centers = np.eye(3, 8)
    ids, vecs = [], []
    for i in range(90):
        v = centers[i % 3] + 0.05 * rng.randn(8)
        ids.append(i)
        vecs.append((v / np.linalg.norm(v)).astype(np.float32).tolist())
    tbl = pa.table({"vec_id": pa.array(ids, pa.int64()),
                    "embedding": pa.array(vecs, pa.list_(pa.float32()))})
    k, n_iter = 3, 4
    # numpy/int reference (the SQL mirror's semantics)
    X = np.array(vecs, dtype=np.float64)
    Q = np.floor(X * 1000 + 0.5).astype(np.int64)
    cent = Q[:k].copy()
    for it in range(n_iter):
        d2 = ((Q[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
        a = d2.argmin(axis=1)
        if it < n_iter - 1:
            for j in range(k):
                m = a == j
                if m.any():
                    cent[j] = np.floor_divide(Q[m].sum(axis=0), m.sum())
    want = dict(zip(ids, a.tolist()))
    for nparts in (1, 5):
        ds = rd.from_arrow(tbl).repartition(nparts)
        got = {r["vec_id"]: r["cluster"]
               for r in cl.kmeans_int_assign(ds, k=k, n_iter=n_iter).take_all()}
        assert got == want
    by_cluster = {}
    for i, c in want.items():
        by_cluster.setdefault(c, set()).add(i)
    assert sorted(map(frozenset, by_cluster.values())) == \
        sorted(frozenset(i for i in range(90) if i % 3 == c) for c in range(3))


@pytest.mark.usefixtures("ray_session")
def test_kmeans_assign_tie_and_labels():
    # exact-tie vector equidistant from two centroids -> lowest centroid index;
    # labels= renames clusters in the output
    from document_processor_ray.functions import cluster as cl

    cents = np.eye(2, 4)
    tie = np.array([2 ** -0.5, 2 ** -0.5, 0, 0])
    ds = rd.from_arrow(pa.table({
        "vec_id": pa.array([0, 1, 2], pa.int64()),
        "embedding": pa.array([cents[1].tolist(), tie.tolist(),
                               cents[0].tolist()], pa.list_(pa.float32()))}))
    got = {r["vec_id"]: r["cluster"]
           for r in cl.assign(ds, cents, labels=np.array([10, 20])).take_all()}
    assert got == {0: 20, 1: 10, 2: 10}


@pytest.mark.usefixtures("ray_session")
def test_price_qty_corr_matches_numpy(tmp_path):
    # integer-sufficient-statistics corr vs np.corrcoef on the same quantized
    # values (different algorithm, so tolerance instead of bit equality)
    import pyarrow.parquet as pq

    from document_processor_ray.pipelines.queries import q_price_qty_corr

    rng = np.random.RandomState(3)
    n = 4000
    flag = rng.choice(["A", "N", "R"], size=n)
    qty = rng.randint(1, 51, size=n).astype(np.float64)
    price = qty * 1000 + rng.uniform(0, 20000, size=n)  # correlated + noise
    pq.write_table(pa.table({"l_returnflag": flag, "l_quantity": qty,
                             "l_extendedprice": price}),
                   tmp_path / "lineitem.parquet")
    got = q_price_qty_corr(str(tmp_path)).to_pandas().set_index("l_returnflag")
    for f in "ANR":
        m = flag == f
        want = np.corrcoef(qty[m], np.floor(price[m]))[0, 1]
        assert got.loc[f, "n_rows"] == m.sum()
        assert abs(got.loc[f, "corr_qp"] - want) < 1e-9
