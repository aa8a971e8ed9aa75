"""Round-4 operator tests: rank-family window kernels, SemDeDup, mixture
rebalancing, bigram-LM scoring, grouped HLL."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd


# ---------------------------------------------------------------------------
# RANK / PERCENT_RANK / CUME_DIST kernels
# ---------------------------------------------------------------------------


def test_rank_family_kernels_match_naive():
    from document_processor_ray.functions import analytic as an

    # partitions of sizes 6, 1, 3 with ties inside
    first = np.zeros(10, bool)
    first[[0, 6, 7]] = True
    idx = np.arange(10)
    seg_start = np.maximum.accumulate(np.where(first, idx, 0))
    vals = np.array([3, 3, 5, 5, 5, 9, 1, 2, 2, 4])
    fp = an.peer_first_mask_arrays([vals], first)

    assert an.rank(fp, seg_start).tolist() == [1, 1, 3, 3, 3, 6, 1, 1, 1, 3]
    pr = an.percent_rank(fp, first, seg_start)
    exp_pr = [0, 0, 2 / 5, 2 / 5, 2 / 5, 1.0, 0.0, 0, 0, 2 / 2]
    assert np.allclose(pr, exp_pr)
    cd = an.cume_dist(fp, first, seg_start)
    exp_cd = [2 / 6, 2 / 6, 5 / 6, 5 / 6, 5 / 6, 1.0, 1.0, 2 / 3, 2 / 3, 1.0]
    assert np.allclose(cd, exp_cd)


def test_rank_family_empty():
    from document_processor_ray.functions import analytic as an

    z = np.zeros(0, bool)
    assert len(an.rank(z, np.zeros(0, np.int64))) == 0
    assert len(an.percent_rank(z, z, np.zeros(0, np.int64))) == 0
    assert len(an.cume_dist(z, z, np.zeros(0, np.int64))) == 0


# ---------------------------------------------------------------------------
# SemDeDup
# ---------------------------------------------------------------------------


def _rand_vecs(n, d, seed=3):
    rng = np.random.default_rng(seed)
    return rng.normal(size=(n, d))


@pytest.mark.usefixtures("ray_session")
def test_semdedup_pairs_match_naive():
    from document_processor_ray.functions.cluster import (lowest_id_vectors,
                                                          semdedup_pairs)

    n, d, k, thr = 120, 16, 5, 0.5
    mat = _rand_vecs(n, d)
    # plant near-dups
    mat[50] = mat[10] + 0.01
    mat[90] = mat[10] - 0.01
    items = [{"vec_id": i, "embedding": mat[i].tolist()} for i in range(n)]
    ds = rd.from_items(items)
    got = {(r["a"], r["b"]) for r in
           semdedup_pairs(ds, k=k, threshold=thr, block=32).take_all()}

    # naive: same centroids, same assignment, within-cluster pairs
    cent = mat[:k] / np.linalg.norm(mat[:k], axis=1, keepdims=True)
    normed = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    asg = np.argmax(normed @ cent.T, axis=1)
    exp = set()
    for a in range(n):
        for b in range(a + 1, n):
            if asg[a] == asg[b] and normed[a] @ normed[b] >= thr:
                exp.add((a, b))
    assert got == exp
    assert (10, 50) in got or (10, 90) in got  # planted dups found


@pytest.mark.usefixtures("ray_session")
def test_semdedup_pairs_subset_of_all_pairs():
    from document_processor_ray.functions.cluster import semdedup_pairs
    from document_processor_ray.functions.dedup import embedding_dup_pairs

    n, d = 80, 8
    mat = _rand_vecs(n, d, seed=9)
    items = [{"vec_id": i, "embedding": mat[i].tolist()} for i in range(n)]
    sem = {(r["a"], r["b"]) for r in
           semdedup_pairs(rd.from_items(items), k=4, threshold=0.4).take_all()}
    allp = {(r["a"], r["b"]) for r in
            embedding_dup_pairs(rd.from_items(items), threshold=0.4).take_all()}
    assert sem <= allp


# ---------------------------------------------------------------------------
# Mixture rebalancing
# ---------------------------------------------------------------------------


@pytest.mark.usefixtures("ray_session")
def test_rebalance_rates_formula_and_uniformity():
    from document_processor_ray.functions.sampling import (rebalance_rates,
                                                           rebalance_to_uniform)

    items = ([{"k": i, "s": "big"} for i in range(4000)]
             + [{"k": 10_000 + i, "s": "small"} for i in range(400)])
    ds = rd.from_items(items)
    rates = rebalance_rates(ds, "s")
    assert rates == {"big": (256 * 400) // 4000, "small": 255}

    kept = rebalance_to_uniform(ds, "k", "s").take_all()
    by = {}
    for r in kept:
        by[r["s"]] = by.get(r["s"], 0) + 1
    # each stratum lands near 400 (rate k/256 of its size; md5 noise ~ ±20%)
    assert 280 < by["big"] < 520
    assert 300 < by["small"] <= 400


@pytest.mark.usefixtures("ray_session")
def test_rebalance_membership_invariant_under_repartition():
    from document_processor_ray.functions.sampling import rebalance_to_uniform

    items = ([{"k": i, "s": "a"} for i in range(900)]
             + [{"k": 5000 + i, "s": "b"} for i in range(300)])
    one = {r["k"] for r in
           rebalance_to_uniform(rd.from_items(items), "k", "s").take_all()}
    two = {r["k"] for r in
           rebalance_to_uniform(rd.from_items(items).repartition(7), "k",
                                "s").take_all()}
    assert one == two


# ---------------------------------------------------------------------------
# Weighted sampling (Efraimidis–Spirakis)
# ---------------------------------------------------------------------------


@pytest.mark.usefixtures("ray_session")
def test_weighted_sample_matches_naive_and_is_partition_invariant():
    import hashlib

    from document_processor_ray.functions.sampling import weighted_sample_topk

    n, k = 600, 40
    rng = np.random.default_rng(11)
    w = rng.integers(1, 1000, size=n).astype(float)
    items = [{"k": i, "w": float(w[i])} for i in range(n)]

    def naive_topk():
        scores = {}
        for i in range(n):
            x = int.from_bytes(hashlib.md5(str(i).encode()).digest()[:8], "big")
            u = (x + 0.5) / 2**64
            scores[i] = int(np.floor(np.log(u) / w[i] * 1e12 + 0.5))
        return set(sorted(scores, key=lambda i: (-scores[i], i))[:k])

    got1 = {r["k"] for r in weighted_sample_topk(
        rd.from_items(items), "k", "w", k).take_all()}
    got2 = {r["k"] for r in weighted_sample_topk(
        rd.from_items(items).repartition(9), "k", "w", k).take_all()}
    assert got1 == naive_topk()
    assert got1 == got2


@pytest.mark.usefixtures("ray_session")
def test_weighted_sample_prefers_heavy_rows():
    from document_processor_ray.functions.sampling import weighted_sample_topk

    # 50 heavy rows (w=1000) among 500 light (w=1): heavy dominate the top-k
    items = ([{"k": i, "w": 1000.0} for i in range(50)]
             + [{"k": 100 + i, "w": 1.0} for i in range(500)])
    got = [r["k"] for r in weighted_sample_topk(
        rd.from_items(items), "k", "w", 30).take_all()]
    heavy = sum(1 for x in got if x < 50)
    assert heavy >= 25, heavy


# ---------------------------------------------------------------------------
# Bigram LM scoring
# ---------------------------------------------------------------------------


@pytest.mark.usefixtures("ray_session")
def test_lm_bigram_score_matches_naive():
    import math
    from collections import Counter

    from document_processor_ray.functions.lm import lm_bigram_score

    docs = {
        1: "the cat sat on the mat",
        2: "the dog sat on the log",
        3: "cat and dog and cat",
        4: "solo",             # 1 token -> no bigrams -> absent from output
        5: "",                 # empty -> absent
        6: "the the the",
    }
    ds = rd.from_items([{"doc_id": i, "text": t} for i, t in docs.items()])
    got = {r["doc_id"]: (r["n_bigrams"], r["ll_e9"])
           for r in lm_bigram_score(ds).take_all()}

    toks = {i: t.split() for i, t in docs.items()}
    uni = Counter(w for ws in toks.values() for w in ws)
    big = Counter((ws[j], ws[j + 1]) for ws in toks.values()
                  for j in range(len(ws) - 1))
    exp = {}
    for i, ws in toks.items():
        if len(ws) < 2:
            continue
        q = [math.floor(math.log(big[(ws[j], ws[j + 1])] / uni[ws[j]])
                        * 1e9 + 0.5) for j in range(len(ws) - 1)]
        exp[i] = (len(ws) - 1, sum(q))
    assert got == exp


# ---------------------------------------------------------------------------
# Feature hashing
# ---------------------------------------------------------------------------


@pytest.mark.usefixtures("ray_session")
def test_hash_features_match_naive():
    import hashlib

    from document_processor_ray.functions.features import hash_features

    docs = {1: "a b a c", 2: "", 3: "zzz zzz"}
    dim = 8
    got = {r["doc_id"]: np.array(r["vec"]) for r in hash_features(
        rd.from_items([{"doc_id": i, "text": t} for i, t in docs.items()]),
        dim=dim).take_all()}

    def h(tok):
        return int.from_bytes(
            hashlib.blake2b(tok.encode(), digest_size=8).digest(), "little")

    for i, t in docs.items():
        exp = np.zeros(dim)
        for tok in t.split():
            hv = h(tok)
            exp[hv % dim] += -1.0 if (hv >> 63) & 1 else 1.0
        assert np.allclose(got[i], exp), (i, got[i], exp)


def test_md5_token_hash_matches_duckdb_md5_number_lower():
    # the featurizer's hasher="md5" path must stay bit-identical to DuckDB's
    # md5_number_lower (digest bytes 8..16, little-endian) — it's what makes
    # doc_features_knn SQL-mirrorable
    import hashlib

    import duckdb

    from document_processor_ray.functions.dedup import _flat_token_hashes

    toks = ["hello", "wörld", "a", "", "link", "42", "naïve"]
    text = " ".join(t for t in toks if t)
    th, counts = _flat_token_hashes(pa.array([text]), {}, hasher="md5")
    con = duckdb.connect()
    for tok, got in zip([t for t in toks if t], th.tolist()):
        want, = con.execute("SELECT md5_number_lower(?)", [tok]).fetchone()
        assert got == want, (tok, got, want)
        assert got == int.from_bytes(hashlib.md5(tok.encode()).digest()[8:],
                                     "little")


# ---------------------------------------------------------------------------
# Funnel
# ---------------------------------------------------------------------------


@pytest.mark.usefixtures("ray_session")
def test_funnel_stages_match_naive():
    from document_processor_ray.functions.funnel import funnel_stages

    # user 1: full funnel; user 2: view+click only; user 3: click before view
    # (click must NOT count — strictly after the first view); user 4: purchase
    # only (stage 0); user 5: view at same ts as click (strict > -> stage 1)
    ev = [
        (1, 10, "view"), (1, 20, "click"), (1, 30, "purchase"),
        (2, 10, "view"), (2, 5, "click"), (2, 50, "click"),
        (3, 40, "click"), (3, 50, "view"),
        (4, 10, "purchase"),
        (5, 10, "view"), (5, 10, "click"),
    ]
    ds = rd.from_items([{"user_id": u, "ts": t, "event_type": e}
                        for u, t, e in ev]).repartition(3)
    got = {r["user_id"]: r["stage"] for r in funnel_stages(
        ds, ["view", "click", "purchase"], n_parts=4).take_all()}
    assert got == {1: 3, 2: 2, 3: 1, 4: 0, 5: 1}


@pytest.mark.usefixtures("ray_session")
def test_lm_broadcast_and_join_paths_identical():
    from document_processor_ray.functions.lm import lm_bigram_score

    items = [{"doc_id": i, "text": f"alpha beta {i % 5} gamma beta alpha"}
             for i in range(60)]
    fast = {r["doc_id"]: (r["n_bigrams"], r["ll_e9"]) for r in
            lm_bigram_score(rd.from_items(items)).take_all()}
    slow = {r["doc_id"]: (r["n_bigrams"], r["ll_e9"]) for r in
            lm_bigram_score(rd.from_items(items),
                            broadcast_limit=0).take_all()}
    assert fast == slow and len(fast) == 60


@pytest.mark.usefixtures("ray_session")
def test_lm_join_path_string_doc_ids():
    # the open-vocabulary join path must derive the id dtype from the input
    # (it used to hard-code int64, breaking string-keyed corpora)
    from document_processor_ray.functions.lm import lm_bigram_score

    items = [{"doc_id": f"d{i:03d}", "text": f"alpha beta {i % 5} gamma beta"}
             for i in range(40)]
    fast = {r["doc_id"]: (r["n_bigrams"], r["ll_e9"]) for r in
            lm_bigram_score(rd.from_items(items)).take_all()}
    slow = {r["doc_id"]: (r["n_bigrams"], r["ll_e9"]) for r in
            lm_bigram_score(rd.from_items(items),
                            broadcast_limit=0).take_all()}
    assert fast == slow and len(fast) == 40
    assert all(isinstance(k, str) for k in slow)


# ---------------------------------------------------------------------------
# Compression-ratio quality signal
# ---------------------------------------------------------------------------


def test_compression_ratio_matches_zlib():
    import zlib

    from document_processor_ray.functions.textstats import (
        compression_ratio_batch)

    docs = {1: "abc " * 500, 2: "", 3: "xq9! zr7# kd2%", 4: None}
    b = pa.table({"doc_id": list(docs), "text": list(docs.values())})
    got = {r["doc_id"]: r["compress_ppm"]
           for r in compression_ratio_batch(b).to_pylist()}
    for i, t in docs.items():
        data = (t or "").encode()
        exp = 0 if not data else len(zlib.compress(data, 6)) * 10**6 // len(data)
        assert got[i] == exp
    # repetitive text compresses far better than the random-ish one
    assert got[1] < got[3] / 5


# ---------------------------------------------------------------------------
# Incremental dedup against a persisted fingerprint index
# ---------------------------------------------------------------------------


@pytest.mark.usefixtures("ray_session")
def test_incremental_novel_filters_known_texts(tmp_path):
    from document_processor_ray.functions.incremental import (
        build_fingerprint_index, novel_against_index)

    corpus = rd.from_items([{"doc_id": i, "text": f"doc body {i % 7}"}
                            for i in range(100)])  # 7 distinct texts
    idx = build_fingerprint_index(corpus, str(tmp_path / "fp"), n_parts=8)

    inc = rd.from_items(
        [{"doc_id": 1000, "text": "doc body 3"},       # known -> dropped
         {"doc_id": 1001, "text": "doc body 6"},       # known -> dropped
         {"doc_id": 1002, "text": "completely new"},   # novel
         {"doc_id": 1003, "text": ""}])                # novel (no empty in corpus)
    got = sorted(r["doc_id"] for r in
                 novel_against_index(inc, idx).take_all())
    assert got == [1002, 1003]

    # appending the surviving increment's fingerprints makes a re-probe drop it
    survivors = rd.from_items([{"doc_id": 1002, "text": "completely new"},
                               {"doc_id": 1003, "text": ""}])
    build_fingerprint_index(survivors, str(tmp_path / "fp"), n_parts=8)
    again = novel_against_index(inc, idx).take_all()
    assert again == []


# ---------------------------------------------------------------------------
# LEFT lookup join
# ---------------------------------------------------------------------------


@pytest.mark.usefixtures("ray_session")
def test_lookup_join_left_keeps_unmatched():
    from document_processor_ray.core.groupops import lookup_join

    ds = rd.from_items([{"k": i, "x": i * 10} for i in range(6)])
    kv = rd.from_items([{"kk": 1, "v": "one"}, {"kk": 4, "v": "four"}])
    sch = pa.schema([("k", pa.int64()), ("x", pa.int64())])
    kvs = pa.schema([("kk", pa.int64()), ("v", pa.string())])

    inner = {r["k"]: r["v"] for r in lookup_join(
        ds, kv, "k", "kk", "v", n_parts=4, schema=sch,
        kv_schema=kvs).take_all()}
    assert inner == {1: "one", 4: "four"}

    left = {r["k"]: r["v"] for r in lookup_join(
        ds, kv, "k", "kk", "v", n_parts=4, schema=sch, kv_schema=kvs,
        how="left").take_all()}
    assert left == {0: None, 1: "one", 2: None, 3: None, 4: "four", 5: None}


# ---------------------------------------------------------------------------
# Grouped HLL
# ---------------------------------------------------------------------------


@pytest.mark.usefixtures("ray_session")
def test_approx_quantiles_by_group_tolerance():
    from document_processor_ray.functions.sketch import approx_quantiles_by

    rng = np.random.default_rng(7)
    rows, truth = [], {}
    for g, (mu, n) in {"a": (100.0, 4000), "b": (500.0, 2500)}.items():
        vals = rng.normal(mu, mu / 5, size=n)
        truth[g] = {0.5: np.quantile(vals, 0.5), 0.9: np.quantile(vals, 0.9)}
        rows += [{"g": g, "v": float(v)} for v in vals]
    ds = rd.from_items(rows).repartition(5)
    got = {(r["g"], r["q"]): r["value"] for r in
           approx_quantiles_by(ds, "g", "v", qs=[0.5, 0.9]).take_all()}
    for g, tq in truth.items():
        for q, exact in tq.items():
            # KLL rank error ~O(1/k); translate to value via a loose band
            assert abs(got[(g, q)] - exact) / abs(exact) < 0.05, (g, q)


@pytest.mark.usefixtures("ray_session")
def test_approx_distinct_by_group_tolerance():
    from document_processor_ray.functions.sketch import approx_distinct_by

    rng = np.random.default_rng(5)
    rows = []
    true = {"a": 900, "b": 150, "c": 3000}
    for g, n in true.items():
        for _ in range(n * 3):  # repeats: distinct stays n
            rows.append({"g": g, "u": int(rng.integers(0, n))})
    ds = rd.from_items(rows).repartition(6)
    got = {r["g"]: r["approx_distinct"]
           for r in approx_distinct_by(ds, "g", "u", p=10).take_all()}
    assert set(got) == set(true)
    for g, n in true.items():
        assert abs(got[g] - n) / n < 0.12, (g, n, got[g])


# ---------------------------------------------------------------------------
# latest-record-per-key compaction + grouped mode
# ---------------------------------------------------------------------------


@pytest.mark.usefixtures("ray_session")
def test_latest_order_per_customer_matches_naive(tmp_path):
    import pandas as pd

    rng = np.random.default_rng(13)
    n = 4000
    df = pd.DataFrame({
        "o_custkey": rng.integers(0, 300, n),
        "o_orderkey": rng.permutation(n),
        "o_orderdate": pd.to_datetime("1995-01-01")
        + pd.to_timedelta(rng.integers(0, 400, n), unit="D"),
    })
    # force date ties inside some keys so the o_orderkey tie-break matters
    df.loc[: n // 4, "o_orderdate"] = pd.Timestamp("1996-06-01")
    df.to_parquet(tmp_path / "orders.parquet")

    from document_processor_ray.pipelines.queries import q_latest_order_per_customer

    got = (q_latest_order_per_customer(str(tmp_path)).to_pandas()
           .sort_values("o_custkey").reset_index(drop=True))
    want = (df.sort_values(["o_custkey", "o_orderdate", "o_orderkey"])
            .groupby("o_custkey", as_index=False).last()
            [["o_custkey", "o_orderkey", "o_orderdate"]]
            .sort_values("o_custkey").reset_index(drop=True))
    pd.testing.assert_frame_equal(got[want.columns], want, check_dtype=False)


@pytest.mark.usefixtures("ray_session")
def test_user_top_event_matches_naive(tmp_path):
    import pandas as pd

    rng = np.random.default_rng(29)
    n = 6000
    df = pd.DataFrame({
        "user_id": rng.integers(0, 200, n),
        "event_type": rng.choice(["click", "view", "buy", "add"], n),
    })
    df.to_parquet(tmp_path / "events.parquet")

    from document_processor_ray.pipelines.queries import q_user_top_event

    got = (q_user_top_event(str(tmp_path)).to_pandas()
           .sort_values("user_id").reset_index(drop=True))
    counts = (df.groupby(["user_id", "event_type"]).size()
              .rename("n").reset_index())
    counts = counts.sort_values(["user_id", "n", "event_type"],
                                ascending=[True, False, True])
    want = (counts.groupby("user_id", as_index=False).first()
            .sort_values("user_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(got[want.columns], want, check_dtype=False)


@pytest.mark.usefixtures("ray_session")
def test_source_token_topk_matches_naive(tmp_path):
    import pandas as pd

    rng = np.random.default_rng(41)
    vocab = [f"w{i}" for i in range(40)]
    docs = []
    for i in range(300):
        src = f"s{int(rng.integers(0, 4))}"
        # zipf-ish skew so per-source top-5 differs between sources
        probs = rng.dirichlet(np.ones(40) * (0.3 + int(src[1:])))
        words = rng.choice(vocab, size=int(rng.integers(5, 60)), p=probs)
        docs.append({"doc_id": i, "source": src, "text": " ".join(words)})
    df = pd.DataFrame(docs)
    df.to_parquet(tmp_path / "documents.parquet")

    from document_processor_ray.pipelines.queries import q_source_token_topk

    got = (q_source_token_topk(str(tmp_path)).to_pandas()
           .sort_values(["source", "n", "tok"], ascending=[True, False, True])
           .reset_index(drop=True))
    rows = []
    for _, r in df.iterrows():
        rows += [{"source": r["source"], "tok": w} for w in r["text"].split()]
    counts = (pd.DataFrame(rows).groupby(["source", "tok"]).size()
              .rename("n").reset_index())
    counts = counts.sort_values(["source", "n", "tok"],
                                ascending=[True, False, True])
    want = (counts.groupby("source", as_index=False).head(5)
            .reset_index(drop=True))
    pd.testing.assert_frame_equal(got[want.columns], want, check_dtype=False)


@pytest.mark.usefixtures("ray_session")
def test_weighted_median_matches_naive(tmp_path):
    import pandas as pd

    rng = np.random.default_rng(59)
    n = 5000
    df = pd.DataFrame({
        "l_returnflag": rng.choice(["A", "N", "R"], n),
        "l_quantity": rng.integers(1, 51, n).astype(float),
        "l_extendedprice": np.round(rng.uniform(1.0, 9000.0, n), 2),
    })
    df.to_parquet(tmp_path / "lineitem.parquet")

    from document_processor_ray.pipelines.queries import q_weighted_median_qty

    got = {r["flag"]: r["wmedian_qty"]
           for r in q_weighted_median_qty(str(tmp_path)).take_all()}
    for flag, grp in df.groupby("l_returnflag"):
        w = np.round(grp["l_extendedprice"].to_numpy() * 100).astype(np.int64)
        q = grp["l_quantity"].to_numpy().astype(np.int64)
        order = np.argsort(q, kind="stable")
        q, w = q[order], w[order]
        cw = np.cumsum(w)
        naive = q[np.flatnonzero(2 * cw >= cw[-1])[0]]
        assert got[flag] == naive, flag


def test_linear_classify_matches_naive():
    import hashlib

    from document_processor_ray.functions.classify import (linear_classify,
                                                           synth_weights)

    dim = 16
    w = synth_weights(dim)
    # weight vector itself matches the documented md5 expression
    for j in (0, 1, 7, 15):
        h = int.from_bytes(hashlib.md5(str(j).encode()).digest()[8:], "little")
        assert w[j] == h % 1001 - 500

    docs = {1: "a b a c", 2: "", 3: "zzz zzz yy", 4: None}
    got = {r["doc_id"]: (r["clf_score"], r["clf_label"])
           for r in linear_classify(
               rd.from_arrow(pa.table({
                   "doc_id": pa.array(list(docs), pa.int64()),
                   "text": pa.array(list(docs.values()), pa.string())})),
               weights=w, dim=dim).take_all()}

    def mh(tok):
        return int.from_bytes(hashlib.md5(tok.encode()).digest()[8:], "little")

    for i, t in docs.items():
        exp = sum(int(w[mh(tok) % dim]) for tok in (t or "").split())
        assert got[i] == (exp, "keep" if exp >= 0 else "drop"), (i, got[i], exp)


def test_extract_int_field_edges():
    from document_processor_ray.functions.semistruct import extract_int_field

    col = pa.array(['{"k": 87}', '{"k": -3, "j": 9}', '{"j": 5}',
                    '{"k": 1.5}', None, '{"k":42}'])
    got = extract_int_field(col, "k").to_pylist()
    # 1.5 matches its integer prefix "1" (flat-int kernel, documented);
    # missing key / null row -> null
    assert got == [87, -3, None, 1, None, 42]
    assert extract_int_field(col, "j").to_pylist() == [None, 9, 5, None, None, None]


@pytest.mark.usefixtures("ray_session")
def test_bpe_merges_match_naive():
    from collections import Counter

    from document_processor_ray.functions.bpe import bpe_merges

    types = {"lower": 5, "lowest": 3, "newer": 6, "wider": 2, "new": 7, "a": 9}
    ds = rd.from_items([{"tok": t, "n": n} for t, n in types.items()])
    got = bpe_merges(ds, 4).to_pylist()

    # naive greedy BPE over word types
    words = {t: list(t) for t in types}
    exp = []
    for it in range(1, 5):
        cnt = Counter()
        for t, syms in words.items():
            for x, y in zip(syms, syms[1:]):
                cnt[(x, y)] += types[t]
        (a, b), c = min(cnt.items(), key=lambda kv: (-kv[1], kv[0]))
        exp.append({"it": it, "a": a, "b": b, "merged": a + b, "cnt": c})
        for t, syms in words.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b); i += 2
                else:
                    out.append(syms[i]); i += 1
            words[t] = out
    assert got == exp, (got, exp)


@pytest.mark.usefixtures("ray_session")
def test_bpe_symbol_counts_match_naive():
    from document_processor_ray.functions.bpe import bpe_merges, bpe_symbol_counts

    types = {"lower": 5, "lowest": 3, "newer": 6, "wider": 2, "new": 7, "a": 9}
    ds = rd.from_items([{"tok": t, "n": n} for t, n in types.items()])
    merges = bpe_merges(ds, 3)
    got = {r["tok"]: r["k"] for r in bpe_symbol_counts(ds, merges).take_all()}

    pairs = list(zip(merges["a"].to_pylist(), merges["b"].to_pylist()))
    for t in types:
        syms = list(t)
        for a, b in pairs:
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b); i += 2
                else:
                    out.append(syms[i]); i += 1
            syms = out
        assert got[t] == len(syms), (t, got[t], syms)
