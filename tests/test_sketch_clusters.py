"""Tests for the HLL sketch and connected-components dedup resolution."""

from __future__ import annotations

import numpy as np
import pytest

import ray.data as rd

from document_processor_ray.functions.dedup import dedup_clusters, dedup_resolve
from document_processor_ray.functions.sketch import HLL, approx_distinct


def test_hll_accuracy_driver_side():
    import hashlib

    for true_n in (100, 5000, 50000):
        h = HLL(p=12)
        vals = np.array(
            [int.from_bytes(hashlib.blake2b(str(i).encode(), digest_size=8).digest(),
                            "little") for i in range(true_n)],
            dtype=np.uint64)
        h.add_hashes(vals)
        est = h.estimate()
        assert abs(est - true_n) / true_n < 0.05, (true_n, est)


def test_hll_merge_equals_union():
    import hashlib

    def hashes(lo, hi):
        return np.array(
            [int.from_bytes(hashlib.blake2b(str(i).encode(), digest_size=8).digest(),
                            "little") for i in range(lo, hi)], dtype=np.uint64)

    a, b = HLL(), HLL()
    a.add_hashes(hashes(0, 3000))
    b.add_hashes(hashes(2000, 6000))  # overlap 1000
    u = HLL()
    u.add_hashes(hashes(0, 6000))
    assert a.merge(b).estimate() == u.estimate()


@pytest.mark.usefixtures("ray_session")
def test_approx_distinct_matches_exact():
    items = [{"user_id": i % 700} for i in range(5000)]
    est = approx_distinct(rd.from_items(items), "user_id")
    assert abs(est - 700) / 700 < 0.05


def test_estimate_ppm_integer_exact():
    """estimate_ppm mirrors the float estimate's regime logic with pure-int
    arithmetic: naive big-int recomputation agrees register-for-register, and
    the p=6 linear-counting regime reads the pinned literal table."""
    import hashlib

    import numpy as np

    from document_processor_ray.functions.sketch import (
        _ALPHA_PPM_P6, _LINEAR_PPM_P6)

    h = HLL(p=6)
    hs = np.array([int.from_bytes(hashlib.md5(str(v).encode()).digest()[8:],
                                  "little") for v in range(150)], np.uint64)
    h.add_hashes(hs)
    got = h.estimate_ppm()
    # naive reference: same registers, arbitrary-precision ints end-to-end
    s = sum(1 << (64 - int(r)) for r in h.registers)
    raw = (_ALPHA_PPM_P6 * 64 * 64 * (1 << 64)) // s
    zeros = int((h.registers == 0).sum())
    want = _LINEAR_PPM_P6[zeros - 1] if (raw <= 160_000_000 and zeros) else raw
    assert got == want
    # ppm estimate tracks the float estimate's regime decisions (<1% apart)
    assert abs(got / 1e6 - h.estimate()) / max(h.estimate(), 1) < 0.01
    # small-cardinality case exercises the pinned linear table
    h2 = HLL(p=6)
    h2.add_hashes(hs[:20])
    z2 = int((h2.registers == 0).sum())
    assert h2.estimate_ppm() == _LINEAR_PPM_P6[z2 - 1]


@pytest.mark.usefixtures("ray_session")
def test_dedup_clusters_components():
    # two components: {1,2,3,4} (chain) and {10,11}; singleton 99 not in pairs
    pairs = rd.from_items([
        {"a": 1, "b": 2}, {"a": 2, "b": 3}, {"a": 3, "b": 4}, {"a": 10, "b": 11},
    ])
    out = {r["node"]: r["cluster"] for r in dedup_clusters(pairs, n_iters=4).take_all()}
    assert out == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


@pytest.mark.usefixtures("ray_session")
def test_dedup_clusters_distributed_path_matches_driver_path():
    pairs_rows = [{"a": 1, "b": 2}, {"a": 2, "b": 3}, {"a": 3, "b": 4},
                  {"a": 10, "b": 11}, {"a": 5, "b": 4}]
    p1 = rd.from_items(pairs_rows)
    p2 = rd.from_items(pairs_rows)
    drv = {r["node"]: r["cluster"] for r in dedup_clusters(p1).take_all()}
    dist = {r["node"]: r["cluster"]
            for r in dedup_clusters(p2, n_iters=5, driver_threshold=0).take_all()}
    assert drv == dist == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1, 10: 10, 11: 10}


@pytest.mark.usefixtures("ray_session")
def test_dedup_clusters_string_ids():
    pairs = rd.from_items([{"a": "doc-b", "b": "doc-a"}, {"a": "doc-b", "b": "doc-c"}])
    out = {r["node"]: r["cluster"] for r in dedup_clusters(pairs).take_all()}
    assert out == {"doc-a": "doc-a", "doc-b": "doc-a", "doc-c": "doc-a"}


@pytest.mark.usefixtures("ray_session")
def test_embedding_lsh_recall_vs_bruteforce():
    from document_processor_ray.functions.dedup import (
        embedding_dup_pairs, embedding_dup_pairs_lsh)

    rng = np.random.RandomState(11)
    base = rng.randn(60, 32)
    vecs = [v for v in base]
    # 20 near-duplicates: tiny perturbations of the first 20
    for i in range(20):
        vecs.append(base[i] + rng.randn(32) * 0.02)
    ds1 = rd.from_items([{"vec_id": i, "embedding": v.tolist()}
                         for i, v in enumerate(vecs)])
    ds2 = rd.from_items([{"vec_id": i, "embedding": v.tolist()}
                         for i, v in enumerate(vecs)])
    exact = {(r["a"], r["b"]) for r in
             embedding_dup_pairs(ds1, threshold=0.95).take_all()}
    approx = {(r["a"], r["b"]) for r in
              embedding_dup_pairs_lsh(ds2, threshold=0.95).take_all()}
    assert approx <= exact  # LSH never invents pairs (exact verify inside bucket)
    assert len(exact) >= 20
    assert len(approx & exact) / len(exact) >= 0.9  # recall


@pytest.mark.usefixtures("ray_session")
def test_dedup_resolve_keeps_representatives():
    docs = rd.from_items([{"doc_id": i, "text": f"t{i}"} for i in range(12)])
    pairs = rd.from_items([{"a": 1, "b": 2}, {"a": 2, "b": 5}, {"a": 7, "b": 8}])
    kept = sorted(r["doc_id"] for r in dedup_resolve(docs, pairs).take_all())
    # drop 2,5 (cluster of 1) and 8 (cluster of 7)
    assert kept == [0, 1, 3, 4, 6, 7, 9, 10, 11]


@pytest.mark.usefixtures("ray_session")
def test_dedup_resolve_bucketed_matches_broadcast():
    """The co-partitioned anti-join scale path returns exactly the broadcast
    variant's rows — including non-scalar payload columns surviving the
    shuffle untouched."""
    from document_processor_ray.functions.dedup import dedup_resolve_bucketed

    docs = rd.from_items([
        {"doc_id": i, "text": f"t{i}", "tags": [f"x{i}", "y"],
         "blob": bytes([i % 251]) * 3}
        for i in range(40)
    ])
    pairs = rd.from_items([{"a": 1, "b": 2}, {"a": 2, "b": 5}, {"a": 7, "b": 8},
                           {"a": 30, "b": 31}, {"a": 31, "b": 39}])
    want = {r["doc_id"]: (r["text"], tuple(r["tags"]), bytes(r["blob"]))
            for r in dedup_resolve(docs, pairs).take_all()}
    got = {r["doc_id"]: (r["text"], tuple(r["tags"]), bytes(r["blob"]))
           for r in dedup_resolve_bucketed(docs, pairs).take_all()}
    assert got == want
    assert 2 not in got and 39 not in got and 1 in got and 30 in got


@pytest.mark.usefixtures("ray_session")
def test_dedup_clusters_converges_at_exact_iteration_cap():
    # a single pair converges in one propagation round; n_iters=1 must succeed
    # (the cap bounds label-CHANGING rounds — the final quiescent observation
    # round is free; regression for the off-by-one that raised here)
    pairs = rd.from_items([{"a": 1, "b": 2}])
    out = {r["node"]: r["cluster"]
           for r in dedup_clusters(pairs, n_iters=1, driver_threshold=0).take_all()}
    assert out == {1: 1, 2: 1}


def test_kll_rank_error_bound():
    """KLL quantiles land within 2.5% rank error of exact order statistics on
    a skewed 50k-value stream (k=200 → theoretical O(1/k) rank error)."""
    import numpy as np

    from document_processor_ray.functions.sketch import KLL

    rng = np.random.RandomState(11)
    data = rng.lognormal(mean=4.0, sigma=1.5, size=50_000)
    s = KLL(k=200)
    for chunk in np.array_split(data, 23):  # streaming adds
        s.add(chunk)
    assert s.n == len(data)
    srt = np.sort(data)
    for q in (0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99):
        v = s.quantile(q)
        rank = np.searchsorted(srt, v, side="right") / len(srt)
        assert abs(rank - q) < 0.025, (q, rank)
    # bounded summary: ~k/(1-2/3) = 3k retained items regardless of n
    assert s.n_retained() < 4 * 200


def test_kll_merge_and_serde():
    """merge(a, b) behaves like a sketch of the concatenation (same bound),
    weights are conserved exactly, and serialization round-trips bit-exact."""
    import numpy as np

    from document_processor_ray.functions.sketch import KLL

    rng = np.random.RandomState(5)
    a, b = rng.exponential(10, 30_000), rng.exponential(40, 20_000)
    s1, s2 = KLL(k=200), KLL(k=200, seed=13)
    s1.add(a)
    s2.add(b)
    merged = KLL.from_bytes(s1.to_bytes()).merge(KLL.from_bytes(s2.to_bytes()))
    assert merged.n == 50_000
    srt = np.sort(np.concatenate([a, b]))
    for q in (0.1, 0.5, 0.9):
        rank = np.searchsorted(srt, merged.quantile(q), side="right") / len(srt)
        assert abs(rank - q) < 0.03, (q, rank)
    # serde round-trip preserves the summary exactly
    rt = KLL.from_bytes(merged.to_bytes())
    assert rt.n == merged.n
    assert all(np.array_equal(x, y) for x, y in zip(rt.levels, merged.levels))
    assert [rt.quantile(q) for q in (0.2, 0.6)] == \
        [merged.quantile(q) for q in (0.2, 0.6)]


@pytest.mark.usefixtures("ray_session")
def test_approx_quantiles_distributed():
    import numpy as np
    import pyarrow as pa

    import ray.data as rd

    from document_processor_ray.functions.sketch import approx_quantiles

    rng = np.random.RandomState(3)
    data = rng.gamma(2.0, 300.0, size=40_000)
    ds = rd.from_arrow(pa.table({"price": pa.array(data)})).repartition(16)
    got = approx_quantiles(ds, "price", [0.25, 0.5, 0.9])
    srt = np.sort(data)
    for q, v in zip([0.25, 0.5, 0.9], got):
        rank = np.searchsorted(srt, v, side="right") / len(srt)
        assert abs(rank - q) < 0.03, (q, rank)


@pytest.mark.usefixtures("ray_session")
def test_dup_clusters_query_matches_python_cc():
    """q_dup_clusters (deterministic unigram-Jaccard edges → distributed CC)
    vs an independent pure-Python union-find over the same parquet — the
    pytest twin of the DuckDB recursive-CTE mirror (SQL_DUP_CLUSTERS)."""
    import os

    sf_dir = "/root/testdata/sf0.001"
    if not os.path.exists(os.path.join(sf_dir, "documents.parquet")):
        pytest.skip("driver testdata sf0.001 not present")
    import pyarrow.parquet as pq

    from document_processor_ray.pipelines.queries import q_dup_clusters

    got = {(r["doc_id"], r["cluster_id"])
           for r in q_dup_clusters(sf_dir).take_all()}

    t = pq.read_table(os.path.join(sf_dir, "documents.parquet"),
                      columns=["doc_id", "text"])
    toks = {i: set((s or "").split())
            for i, s in zip(t["doc_id"].to_pylist(), t["text"].to_pylist())}
    parent = {}

    def find(x):
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    nodes = set()
    for a in sorted(toks):
        if a % 5 == 4 or (a + 1) not in toks:
            continue
        ga, gb = toks[a], toks[a + 1]
        union = len(ga | gb)
        if union > 0 and 5 * len(ga & gb) >= 3 * union:
            nodes |= {a, a + 1}
            ra, rb = find(a), find(a + 1)
            if ra != rb:
                lo, hi = min(ra, rb), max(ra, rb)
                parent[hi] = lo
    want = {(n, find(n)) for n in nodes}
    assert got == want


@pytest.mark.usefixtures("ray_session")
def test_misra_gries_bounds_and_merge():
    # lower bound <= true <= lower + err for every key, on adversarial merges
    import numpy as np

    from document_processor_ray.functions.sketch import MisraGries

    rng = np.random.RandomState(0)
    vals = rng.zipf(1.5, size=20000) % 200
    true = {int(v): int(c) for v, c in
            zip(*np.unique(vals, return_counts=True))}
    parts = np.array_split(vals, 7)
    merged = MisraGries(32)
    for p in parts:
        mg = MisraGries(32)
        u, c = np.unique(p, return_counts=True)
        mg.add_counts([int(x) for x in u], c)
        merged.merge(mg)
    for k, lb in merged.counts.items():
        assert lb <= true[k] <= lb + merged.err
    # every key whose true count exceeds err must still be present
    for k, t in true.items():
        if t > merged.err:
            assert k in merged.counts


@pytest.mark.usefixtures("ray_session")
def test_approx_topk_matches_exact_on_documents():
    # with m >> k on this corpus the sketch top-10 equals the exact top-10
    import pyarrow.compute as pc

    from document_processor_ray.pipelines.queries import (q_approx_token_topk,
                                                          q_token_freq)

    sf = "/root/testdata/sf0.001"
    exact = q_token_freq(sf).to_pandas().sort_values(
        ["n", "tok"], ascending=[False, True]).head(10)
    got = q_approx_token_topk(sf).to_pandas()
    assert list(got["key"]) == list(exact["tok"])
    for _, r in got.iterrows():
        true_n = int(exact.loc[exact["tok"] == r["key"], "n"].iloc[0])
        assert r["n_min"] <= true_n <= r["n_min"] + r["err"]
