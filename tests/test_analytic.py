"""Unit tests for the window-function kernels (functions/analytic.py) and the
decontamination gram machinery (functions/decontam.py), each against a naive
per-row Python oracle written inline (no library code in the oracle path)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from document_processor_ray.functions import analytic as an
from document_processor_ray.functions import decontam as dc


def _toy():
    rng = np.random.RandomState(7)
    n = 500
    return pa.table({
        "k": pa.array(rng.randint(0, 23, n)),
        "o": pa.array(rng.randint(0, 9, n)),   # deliberately ties within k
        "v": pa.array(rng.randint(1, 50, n).astype(np.int64)),
        "rid": pa.array(np.arange(n)),
    })


def _naive_windows(t):
    """Per-row Python oracle: rn over (k; o, rid), lag of v, RANGE cumsum."""
    rows = sorted(t.to_pylist(), key=lambda r: (r["k"], r["o"], r["rid"]))
    rn, lagv, cum = {}, {}, {}
    for key in {r["k"] for r in rows}:
        grp = [r for r in rows if r["k"] == key]
        for i, r in enumerate(grp):
            rn[r["rid"]] = i + 1
            lagv[r["rid"]] = grp[i - 1]["v"] if i else None
            cum[r["rid"]] = sum(g["v"] for g in grp
                                if (g["o"],) < (r["o"],)
                                or g["o"] == r["o"])  # RANGE: all peers
    return rn, lagv, cum


def test_window_kernels_match_naive_oracle():
    t = _toy()
    st, first, seg = an._sort_segments(t, "k", ["o", "rid"])
    rn = an.row_number(first, seg)
    v = st["v"].to_numpy()
    lag = an.lag(v, first, -1)
    fp = an.peer_first_mask(st, first, ["o"])
    cum = an.running_sum_range(v, seg, fp)
    o_rn, o_lag, o_cum = _naive_windows(t)
    rid = st["rid"].to_numpy()
    for i in range(len(rid)):
        assert rn[i] == o_rn[rid[i]]
        assert lag[i] == (o_lag[rid[i]] if o_lag[rid[i]] is not None else -1)
        assert cum[i] == o_cum[rid[i]]


def test_row_number_restarts_and_lag_fill():
    t = pa.table({"k": [1, 1, 2], "o": [5, 3, 9], "v": [10, 20, 30],
                  "rid": [0, 1, 2]})
    st, first, seg = an._sort_segments(t, "k", ["o", "rid"])
    assert list(an.row_number(first, seg)) == [1, 2, 1]
    assert list(an.lag(st["v"].to_numpy(), first, -1)) == [-1, 20, -1]


def test_running_sum_range_ties_are_peers():
    # one partition, order col all-tied: every row gets the full sum
    t = pa.table({"k": [0, 0, 0], "o": [1, 1, 1], "v": [1, 2, 3],
                  "rid": [0, 1, 2]})
    st, first, seg = an._sort_segments(t, "k", ["o"])
    fp = an.peer_first_mask(st, first, ["o"])
    assert list(an.running_sum_range(st["v"].to_numpy(), seg, fp)) == [6, 6, 6]


@pytest.mark.usefixtures("ray_session")
def test_windowed_distributed_equals_local():
    """The coarse-shuffled distributed path returns the same rows as the
    single-bucket local computation, regardless of input block layout."""
    t = _toy()

    def mk(st, first, seg):
        fp = an.peer_first_mask(st, first, ["o"])
        return {"rn": pa.array(an.row_number(first, seg)),
                "cum": pa.array(an.running_sum_range(
                    st["v"].to_numpy(), seg, fp))}

    ds = rd.from_arrow(t).repartition(7)
    got = (an.windowed(ds, "k", ["o", "rid"], mk, n_parts=5)
           .to_pandas().sort_values("rid").reset_index(drop=True))
    st, first, seg = an._sort_segments(t, "k", ["o", "rid"])
    for name, arr in mk(st, first, seg).items():
        st = st.append_column(name, arr)
    want = st.to_pandas().sort_values("rid").reset_index(drop=True)
    assert got[["rid", "rn", "cum"]].equals(want[["rid", "rn", "cum"]])


# ---------------------------------------------------------------------------
# decontam
# ---------------------------------------------------------------------------


def _naive_grams(text, n):
    toks = [w for w in text.replace("\t", " ").split(" ") if w]
    return [" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)]


def test_doc_grams_match_naive():
    texts = pa.array(["a b c d e f", "  x  y z q  ", "one", "", "p q r"])
    grams, parent = dc.doc_grams(texts, n=3)
    want = []
    for i, s in enumerate(["a b c d e f", "  x  y z q  ", "one", "", "p q r"]):
        want += [(g, i) for g in _naive_grams(s, 3)]
    assert list(zip(grams.to_pylist(), parent.tolist())) == want


def test_doc_grams_never_cross_docs():
    texts = pa.array(["a b", "c d", "e f"])  # 2 tokens each, n=3: no grams
    grams, parent = dc.doc_grams(texts, n=3)
    assert len(grams) == 0 and len(parent) == 0


def test_overlap_batch_counts():
    bench = dc.build_benchmark_grams(pa.array(["w1 w2 w3 w4"]), n=3)
    assert sorted(bench.to_pylist()) == ["w1 w2 w3", "w2 w3 w4"]
    batch = pa.table({"doc_id": [10, 11, 12],
                      "text": ["z w1 w2 w3 q",      # one overlapping gram
                               "a b c d",            # none
                               "w1 w2"]})            # too short: no row
    out = dc.overlap_batch(batch, bench, n=3)
    assert out["doc_id"].to_pylist() == [10, 11]
    assert out["n_grams"].to_pylist() == [3, 2]
    assert out["n_overlap"].to_pylist() == [1, 0]
    assert out["contaminated"].to_pylist() == [1, 0]


def test_ntile_and_dense_rank_kernels():
    # NTILE: 10 rows in 4 tiles -> sizes 3,3,2,2; tiny partitions (cnt < n);
    # DENSE_RANK over tied bands
    import numpy as np

    from document_processor_ray.functions import analytic as an

    # one partition of 10 rows, one of 2, one of 1
    first = np.zeros(13, bool)
    first[[0, 10, 12]] = True
    idx = np.arange(13)
    seg_start = np.maximum.accumulate(np.where(first, idx, 0))
    tiles = an.ntile(4, first, seg_start)
    assert tiles[:10].tolist() == [1, 1, 1, 2, 2, 2, 3, 3, 4, 4]
    assert tiles[10:12].tolist() == [1, 2]
    assert tiles[12:].tolist() == [1]
    bands = np.array([5, 5, 6, 6, 6, 7, 8, 8, 9, 9, 1, 1, 3])
    fp = an.peer_first_mask_arrays([bands], first)
    dr = an.dense_rank(fp, seg_start)
    assert dr[:10].tolist() == [1, 1, 2, 2, 2, 3, 4, 4, 5, 5]
    assert dr[10:12].tolist() == [1, 1]
    assert dr[12:].tolist() == [1]
