"""Bloom-filter semi-join: no false negatives, bounded false-positive rate,
and exactness of the prefilter + verify composition."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from document_processor_ray.functions import bloom


def _keys_ds(vals):
    return rd.from_arrow(pa.table({"k": pa.array(vals, pa.int64())}))


@pytest.mark.usefixtures("ray_session")
def test_bloom_no_false_negatives():
    keys = list(range(0, 5000, 5))
    words = bloom.build_bloom(_keys_ds(keys), "k", n_bits=1 << 16)
    mask = bloom.bloom_probe_mask(words, pa.array(keys, pa.int64()))
    assert mask.all()


@pytest.mark.usefixtures("ray_session")
def test_bloom_fpr_bounded():
    present = list(range(1000))
    absent = list(range(100000, 110000))
    # deliberately small bitmap so the fp rate is measurable:
    # m=4096 bits, n=1000, k=4 -> theoretical fpr ~= 15%
    words = bloom.build_bloom(_keys_ds(present), "k", n_bits=4096)
    mask = bloom.bloom_probe_mask(words, pa.array(absent, pa.int64()))
    fpr = mask.mean()
    assert 0 < fpr < 0.3, fpr
    # and a production-sized bitmap makes it vanish
    words_big = bloom.build_bloom(_keys_ds(present), "k", n_bits=1 << 20)
    assert bloom.bloom_probe_mask(
        words_big, pa.array(absent, pa.int64())).mean() < 0.001


@pytest.mark.usefixtures("ray_session")
def test_bloom_build_merges_across_blocks():
    # keys spread over many blocks: partial bitmaps must OR-merge losslessly
    ds = rd.from_arrow(
        pa.table({"k": pa.array(range(2000), pa.int64())})).repartition(8)
    words = bloom.build_bloom(ds, "k", n_bits=1 << 16)
    assert bloom.bloom_probe_mask(
        words, pa.array(range(2000), pa.int64())).all()


@pytest.mark.usefixtures("ray_session")
def test_bloom_semi_join_exact():
    rng = np.random.RandomState(7)
    fact_keys = rng.randint(0, 500, size=3000)
    fact = rd.from_arrow(pa.table({
        "fk": pa.array(fact_keys, pa.int64()),
        "val": pa.array(rng.randint(0, 10**6, size=3000), pa.int64()),
    }))
    # duplicate keys on the dim side must not duplicate fact rows
    dim = _keys_ds([3, 3, 7, 11, 200, 201, 202, 499, 499])
    out = bloom.bloom_semi_join(fact, "fk", dim, "k",
                                n_bits=4096).to_pandas()
    want = {3, 7, 11, 200, 201, 202, 499}
    assert sorted(out.fk.unique()) == sorted(want & set(fact_keys))
    assert len(out) == int(np.isin(fact_keys, list(want)).sum())
    # row payloads survive untouched
    got = set(zip(out.fk, out.val))
    mask = np.isin(fact_keys, list(want))
    fact_df = fact.to_pandas()
    assert got == set(zip(fact_df.fk[mask], fact_df.val[mask]))


@pytest.mark.usefixtures("ray_session")
def test_bloom_semi_join_string_keys():
    fact = rd.from_arrow(pa.table({
        "fk": pa.array(["a", "b", "c", "a", "d"], pa.string()),
        "i": pa.array(range(5), pa.int64())}))
    dim = rd.from_arrow(pa.table({"k": pa.array(["a", "d", "zz"])}))
    out = bloom.bloom_semi_join(fact, "fk", dim, "k",
                                n_bits=4096).to_pandas()
    assert sorted(zip(out.fk, out.i)) == [("a", 0), ("a", 3), ("d", 4)]
