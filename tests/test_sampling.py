"""Deterministic hash sampling / split operators."""

from __future__ import annotations

import pytest

import ray.data as rd

from document_processor_ray.functions.sampling import (deterministic_sample,
                                                       deterministic_split,
                                                       stratified_sample)


@pytest.mark.usefixtures("ray_session")
def test_sample_deterministic_and_subset_monotone():
    ds1 = rd.from_items([{"k": i} for i in range(2000)])
    ds2 = rd.from_items([{"k": i} for i in range(2000)])
    s10 = {r["k"] for r in deterministic_sample(ds1, "k", keep_bytes=26).take_all()}
    s10b = {r["k"] for r in deterministic_sample(ds2, "k", keep_bytes=26).take_all()}
    assert s10 == s10b  # run-independent
    assert 0.06 < len(s10) / 2000 < 0.15
    # larger rate strictly contains the smaller (nested samples)
    s20 = {r["k"] for r in deterministic_sample(ds1, "k", keep_bytes=52).take_all()}
    assert s10 <= s20


@pytest.mark.usefixtures("ray_session")
def test_split_partitions_every_row_once():
    ds = rd.from_items([{"k": f"doc{i}"} for i in range(3000)])
    rows = deterministic_split(ds, "k").take_all()
    assert len(rows) == 3000
    by = {}
    for r in rows:
        by.setdefault(r["split"], set()).add(r["k"])
    assert set(by) == {"train", "valid", "test"}
    assert sum(len(v) for v in by.values()) == 3000
    assert len(by["train"]) > 0.9 * 3000
    # re-partitioned input assigns identical labels (leak-proof)
    rows2 = deterministic_split(ds.repartition(7), "k").take_all()
    assert {r["k"]: r["split"] for r in rows2} == {r["k"]: r["split"] for r in rows}

    with pytest.raises(ValueError):
        deterministic_split(ds, "k", splits={"a": 200, "b": 100})


@pytest.mark.usefixtures("ray_session")
def test_stratified_equals_per_stratum_flat_sample():
    """Per-stratum membership must equal running deterministic_sample at that
    stratum's rate over the stratum alone — and be repartition-invariant."""
    items = [{"k": i, "s": ["a", "b", "c"][i % 3]} for i in range(3000)]
    ds = rd.from_items(items)
    rates = {"a": 64, "b": 13}
    got = {(r["k"], r["s"])
           for r in stratified_sample(ds, "k", "s", rates,
                                      default_bytes=3).take_all()}
    for s, width in [("a", 64), ("b", 13), ("c", 3)]:
        sub = rd.from_items([r for r in items if r["s"] == s])
        want = {(r["k"], s) for r in
                deterministic_sample(sub, "k", keep_bytes=width).take_all()}
        assert {g for g in got if g[1] == s} == want
    got2 = {(r["k"], r["s"])
            for r in stratified_sample(ds.repartition(11), "k", "s", rates,
                                       default_bytes=3).take_all()}
    assert got2 == got


@pytest.mark.usefixtures("ray_session")
def test_unsupported_key_dtype_raises():
    # float keys stringify differently in Python vs SQL CAST — must raise, not
    # silently break the cross-engine hash guarantee
    ds = rd.from_items([{"k": 0.5 * i} for i in range(10)])
    with pytest.raises(Exception) as ei:
        deterministic_sample(ds, "k").take_all()
    assert "integer or string" in str(ei.value)


@pytest.mark.usefixtures("ray_session")
def test_upsample_mixture_matches_naive():
    import hashlib

    import numpy as np
    import pyarrow as pa

    import ray.data as rd

    from document_processor_ray.functions.sampling import upsample_mixture

    ids = list(range(300))
    ds = rd.from_arrow(pa.table({"doc_id": pa.array(ids, pa.int64())}))
    got = upsample_mixture(ds, "doc_id", n_full=2, frac_bytes=77).to_pandas()
    want = [(i, e) for i in ids for e in range(3)
            if e < 2 or hashlib.md5(f"{i}:2".encode()).digest()[0] < 77]
    assert sorted(zip(got["doc_id"], got["epoch"])) == sorted(want)
    # fractional rate lands near 77/256
    frac = (got["epoch"] == 2).sum() / len(ids)
    assert abs(frac - 77 / 256) < 0.1
    # repartition-invariant: same multiset under a different block layout
    got2 = upsample_mixture(ds.repartition(7), "doc_id",
                            n_full=2, frac_bytes=77).to_pandas()
    assert sorted(zip(got2["doc_id"], got2["epoch"])) == sorted(want)
    # epoch salt: the fractional subset is NOT the plain md5(key) subset
    plain = {i for i in ids if hashlib.md5(str(i).encode()).digest()[0] < 77}
    salted = {i for i, e in want if e == 2}
    assert plain != salted


@pytest.mark.usefixtures("ray_session")
def test_sampling_boundary_validation():
    """Rates past 255 (inexpressible in the 2-hex-char SQL mirror) and empty
    strata dicts are handled explicitly rather than silently diverging."""
    import pyarrow as pa
    import pytest as pt

    import ray.data as rd

    from document_processor_ray.functions.sampling import (
        deterministic_sample, stratified_sample, upsample_mixture)

    ds = rd.from_arrow(pa.table({"k": pa.array(range(200), pa.int64()),
                                 "s": pa.array(["x", "y"] * 100)}))
    with pt.raises(ValueError):
        upsample_mixture(ds, "k", n_full=1, frac_bytes=256).to_pandas()
    with pt.raises(ValueError):
        stratified_sample(ds, "k", "s", rates={"x": 300}).to_pandas()
    with pt.raises(ValueError):
        stratified_sample(ds, "k", "s", rates={}, default_bytes=999).to_pandas()
    # empty rates dict == flat sample at the default rate (used to IndexError)
    got = stratified_sample(ds, "k", "s", rates={}, default_bytes=26).to_pandas()
    want = deterministic_sample(ds, "k", keep_bytes=26).to_pandas()
    assert sorted(got["k"]) == sorted(want["k"])


@pytest.mark.usefixtures("ray_session")
def test_global_positions_is_permutation_and_epoch_sensitive():
    """functions/shuffle.py: pos is exactly 0..N-1 (a permutation), orders
    differ between epochs, shards are round-robin of pos, and the result is
    invariant to input partitioning (the determinism contract)."""
    import numpy as np
    import ray.data as rd

    from document_processor_ray.functions.shuffle import global_positions

    rows = [{"doc_id": i} for i in range(977)]
    out1 = {r["doc_id"]: (r["pos"], r["shard"])
            for r in global_positions(rd.from_items(rows), epoch=1,
                                      n_shards=4).take_all()}
    assert sorted(p for p, _ in out1.values()) == list(range(977))
    assert all(s == p % 4 for p, s in out1.values())

    out2 = {r["doc_id"]: r["pos"]
            for r in global_positions(rd.from_items(rows), epoch=2).take_all()}
    assert sorted(out2.values()) == list(range(977))
    assert any(out1[d][0] != out2[d] for d in out2)  # epochs reorder

    repart = rd.from_items(rows).repartition(13)
    out1b = {r["doc_id"]: r["pos"]
             for r in global_positions(repart, epoch=1).take_all()}
    assert out1b == {d: p for d, (p, _) in out1.items()}


@pytest.mark.usefixtures("ray_session")
def test_global_prefix_sum_matches_naive_and_partitioning():
    # weighted zipWithIndex: exclusive prefix sum in id order must equal the
    # naive cumsum and be invariant to input partitioning; ids deliberately
    # sparse/skewed so range buckets are uneven
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from document_processor_ray.functions.pack import global_prefix_sum

    rng = np.random.RandomState(5)
    ids = np.concatenate([np.arange(100), 10_000 + np.arange(50) * 97])
    rng.shuffle(ids)
    w = rng.randint(0, 40, size=len(ids)).astype(np.int64)
    tbl = pa.table({"id": pa.array(ids, pa.int64()), "w": pa.array(w)})
    order = np.argsort(ids)
    want_start = dict(zip(ids[order],
                          np.concatenate([[0], np.cumsum(w[order])[:-1]])))
    for n_blocks in (1, 7):
        ds = rd.from_arrow(tbl).repartition(n_blocks)
        got = {r["id"]: r["start"]
               for r in global_prefix_sum(ds, "id", "w", n_parts=5).take_all()}
        assert got == want_start


@pytest.mark.usefixtures("ray_session")
def test_pack_assign_boundaries():
    import pyarrow as pa
    import ray.data as rd

    from document_processor_ray.functions.pack import pack_assign

    # weights: 300, 0 (empty doc), 300, 1000 with budget 512
    tbl = pa.table({"id": pa.array([0, 1, 2, 3], pa.int64()),
                    "w": pa.array([300, 0, 300, 1000], pa.int64())})
    got = {r["id"]: r for r in
           pack_assign(rd.from_arrow(tbl), "id", "w", budget=512).take_all()}
    assert (got[0]["start_tok"], got[0]["end_tok"]) == (0, 300)
    assert (got[0]["first_pack"], got[0]["last_pack"]) == (0, 0)
    assert (got[1]["start_tok"], got[1]["end_tok"]) == (300, 300)
    assert (got[1]["first_pack"], got[1]["last_pack"]) == (0, 0)
    assert (got[2]["first_pack"], got[2]["last_pack"]) == (0, 1)  # 300..600
    assert (got[3]["start_tok"], got[3]["end_tok"]) == (600, 1600)
    assert (got[3]["first_pack"], got[3]["last_pack"]) == (1, 3)


@pytest.mark.usefixtures("ray_session")
def test_token_budget_select_matches_naive_and_is_partition_invariant():
    import numpy as np
    import pyarrow as pa

    from document_processor_ray.functions.sampling import token_budget_select

    rng = np.random.default_rng(7)
    n = 400
    w = rng.integers(1, 50, size=n).astype(np.int64)
    q = rng.integers(0, 1_000_000, size=n).astype(np.int64)
    q[10] = q[11] = 777  # tied scores: id ascending breaks the tie
    budget = int(w.sum() * 2 // 5)
    tbl = pa.table({"doc_id": pa.array(np.arange(n), pa.int64()),
                    "n_tokens": pa.array(w), "quality_ppm": pa.array(q)})

    order = sorted(range(n), key=lambda i: (-q[i], i))
    want, acc = {}, 0
    for i in order:
        if acc + w[i] <= budget:
            want[i] = acc
        acc += int(w[i])

    for nparts in (1, 5):
        ds = rd.from_arrow(tbl).repartition(nparts)
        rows = token_budget_select(ds, "doc_id", "n_tokens", "quality_ppm",
                                   budget).take_all()
        got = {r["doc_id"]: r["start_tok"] for r in rows}
        assert got == want
        assert all(r["n_tokens"] == w[r["doc_id"]] for r in rows)


@pytest.mark.usefixtures("ray_session")
def test_token_budget_select_out_of_range_raises():
    import pyarrow as pa

    from document_processor_ray.functions.sampling import token_budget_select

    bad_q = pa.table({"doc_id": pa.array([0], pa.int64()),
                      "n_tokens": pa.array([5], pa.int64()),
                      "quality_ppm": pa.array([2_000_000], pa.int64())})
    with pytest.raises(Exception, match="outside"):
        token_budget_select(rd.from_arrow(bad_q), "doc_id", "n_tokens",
                            "quality_ppm", 100).take_all()
    bad_id = pa.table({"doc_id": pa.array([-3], pa.int64()),
                       "n_tokens": pa.array([5], pa.int64()),
                       "quality_ppm": pa.array([10], pa.int64())})
    with pytest.raises(Exception, match="outside"):
        token_budget_select(rd.from_arrow(bad_id), "doc_id", "n_tokens",
                            "quality_ppm", 100).take_all()
