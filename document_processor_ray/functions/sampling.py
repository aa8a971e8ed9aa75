"""Deterministic sampling / split operators for training-data pipelines.

Membership is a pure function of a key's md5 — stable across runs, machines,
and engines, so samples are reproducible and train/valid/test splits never
leak rows between sets even when the corpus is re-partitioned or re-read.
md5 (not blake2b) is deliberate: DuckDB's ``md5()`` produces the identical
lowercase hex, which makes every operator here SQL-hash-checkable. Comparing
the first two hex chars lexicographically equals comparing the first digest
byte numerically, so a threshold of k keeps k/256 of the keys.

At 100 TB these run as stateless ``map_batches`` filters — no shuffle, no
coordination; the only per-row cost is one md5 of the key (the price of
cross-engine determinism; swap in a vectorized hash if oracle parity is not
required).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

import ray.data as rd


def _key_bytes(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """First md5 digest byte per key (key stringified like SQL's CAST).

    Only integer and string keys are supported: Python ``str()`` matches
    DuckDB ``CAST(... AS VARCHAR)`` for exactly those types — float, date,
    decimal or binary keys would silently produce different md5 inputs than
    the SQL mirror and break the documented cross-engine hash guarantee, so
    they raise instead."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    t = col.type
    if not (pa.types.is_integer(t) or pa.types.is_string(t)
            or pa.types.is_large_string(t)):
        raise TypeError(
            f"deterministic sampling/split key must be an integer or string "
            f"column (got {t}): str() of other types diverges from SQL "
            f"CAST(... AS VARCHAR)")
    return np.array([hashlib.md5(str(v).encode()).digest()[0]
                     for v in col.to_pylist()], dtype=np.uint16)


def deterministic_sample(ds: rd.Dataset, key_col: str,
                         keep_bytes: int = 26) -> rd.Dataset:
    """Keep rows whose key hashes into the first ``keep_bytes`` of 256 buckets
    (keep_bytes=26 ≈ a 10.16% sample). SQL mirror:
    ``WHERE substr(md5(CAST(key AS VARCHAR)), 1, 2) < '<hex(keep_bytes)>'``."""

    def f(b: pa.Table) -> pa.Table:
        return b.filter(pa.array(_key_bytes(b[key_col]) < keep_bytes))

    return ds.map_batches(f, batch_format="pyarrow")


def stratified_sample(ds: rd.Dataset, key_col: str, strata_col: str,
                      rates: dict[str, int],
                      default_bytes: int = 0) -> rd.Dataset:
    """Per-stratum deterministic sample: stratum s keeps ``rates[s]``/256 of
    its rows (rows of strata not in ``rates`` keep ``default_bytes``/256).
    Same md5-of-key membership as ``deterministic_sample``, so the sample is
    reproducible under repartitioning AND a row's membership never depends on
    which stratum batch it arrives in. Stateless map_batches filter, no
    shuffle. SQL mirror: ``substr(md5(CAST(key AS VARCHAR)),1,2) <
    CASE strata WHEN ... THEN '<hex>' ... ELSE '<hex>' END``."""
    for s, r in rates.items():
        if not (0 <= r <= 255):
            raise ValueError(
                f"stratified_sample rate for {s!r} must be 0..255 (got {r}): "
                f"the 2-hex-char SQL mirror cannot express values past 255")
    if not (0 <= default_bytes <= 255):
        raise ValueError(f"default_bytes must be 0..255 (got {default_bytes})")
    if not rates:
        # no per-stratum overrides: plain deterministic sample at default rate
        return deterministic_sample(ds, key_col, keep_bytes=default_bytes)
    names = pa.array(list(rates.keys()), pa.string())
    widths = np.array(list(rates.values()), dtype=np.uint16)

    def f(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        # index_in yields NULL (not -1) for strata outside `rates`
        idx = pc.fill_null(pc.index_in(b[strata_col], value_set=names),
                           -1).to_numpy(zero_copy_only=False).astype(np.int64)
        thr = np.where(idx >= 0, widths[np.maximum(idx, 0)],
                       default_bytes).astype(np.uint16)
        return b.filter(pa.array(_key_bytes(b[key_col]) < thr))

    return ds.map_batches(f, batch_format="pyarrow")


def deterministic_split(ds: rd.Dataset, key_col: str,
                        splits: dict[str, int] | None = None,
                        out_col: str = "split") -> rd.Dataset:
    """Append a split label from cumulative byte ranges (values sum to ≤ 256;
    any remainder falls into the last split). Default 95/2.5/2.5-ish:
    train=243, valid=6, test=7."""
    splits = splits or {"train": 243, "valid": 6, "test": 7}
    names = list(splits.keys())
    bounds = np.cumsum([splits[n] for n in names])
    if bounds[-1] > 256:
        raise ValueError("split byte widths sum past 256")
    bounds[-1] = 256  # remainder → last split

    def f(b: pa.Table) -> pa.Table:
        idx = np.searchsorted(bounds, _key_bytes(b[key_col]), side="right")
        lab = np.array(names, dtype=object)[np.minimum(idx, len(names) - 1)]
        return b.append_column(out_col, pa.array(lab.tolist(), pa.string()))

    return ds.map_batches(f, batch_format="pyarrow")


def _key_uniform(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """Deterministic uniform in (0, 1) per key: first 8 md5 digest bytes →
    (x + 0.5) / 2^64 (never 0 or 1, so log is finite)."""
    import hashlib

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    x = np.array([int.from_bytes(hashlib.md5(str(v).encode()).digest()[:8],
                                 "big") for v in col.to_pylist()],
                 dtype=np.float64)
    return (x + 0.5) / float(2**64)


def weighted_sample_topk(ds: rd.Dataset, key_col: str, weight_col: str,
                         k: int) -> rd.Dataset:
    """Deterministic weighted sample WITHOUT replacement (Efraimidis &
    Spirakis 2006): each row gets score ``ln(u) / w`` (u = md5-uniform of the
    key, w > 0 its weight) and the k LARGEST scores win — inclusion
    probability proportional to weight, reproducible across runs and
    repartitioning because u is a pure function of the key.

    Cross-engine determinism (the lm/bm25 pattern): the score is quantized
    to pico-units from one fixed IEEE expression —
    ``floor(ln((float(x) + 0.5) / 2^64) / w * 1e12 + 0.5)`` with x the first
    8 md5 digest bytes big-endian — which DuckDB reproduces bit-for-bit
    (``ln(...)/w*1e12``, hex-substr cast for x), and rank ties on the
    quantized score break on the key ascending, so the selected SET is
    engine-independent and the query is SQL-hash-checkable. Near a .5
    pico-boundary a sub-ulp ln() divergence could still flip one rank (the
    semdedup caveat); none exists in the gate data and the 1e12 grain makes
    the window ~1e-4 ulp wide.

    Scale: per-batch partial top-k first, so the global sort sees at most
    k rows per batch, never the corpus."""

    def partial(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        w = b[weight_col].to_numpy(zero_copy_only=False).astype(np.float64)
        if np.any(w <= 0):
            raise ValueError("weighted_sample_topk needs strictly positive "
                             "weights")
        s = np.floor(np.log(_key_uniform(b[key_col])) / w * 1e12
                     + 0.5).astype(np.int64)
        b = b.append_column("__es_score", pa.array(s, pa.int64()))
        top = pc.sort_indices(
            b, sort_keys=[("__es_score", "descending"),
                          (key_col, "ascending")])[:k]
        return b.take(top)

    out = (ds.map_batches(partial, batch_format="pyarrow")
           .sort(["__es_score", key_col], descending=[True, False]).limit(k))
    return out.drop_columns(["__es_score"])


def rebalance_rates(ds: rd.Dataset, strata_col: str) -> dict[str, int]:
    """Data-derived stratified-sample rates that DOWNSAMPLE every stratum to
    ≈ the smallest stratum's row count (uniform mixture balancing):
    ``rate[s] = min(255, (256 * min_count) // count[s])`` — pure integer math
    so an SQL mirror recomputes the identical rates from the same counts.

    One bounded ``groupby(strata).count()`` (cardinality = #sources, tiny);
    the driver sees only (stratum, count) pairs. The smallest stratum itself
    keeps 255/256 of its rows (the 2-hex-char md5 mirror cannot express
    keep-everything; documented price of cross-engine parity)."""
    from ray.data.aggregate import Count

    rows = ds.groupby(strata_col).aggregate(Count(alias_name="n")).take_all()
    if not rows:
        return {}
    mn = min(r["n"] for r in rows)
    return {r[strata_col]: min(255, (256 * mn) // r["n"]) for r in rows}


def rebalance_to_uniform(ds: rd.Dataset, key_col: str,
                         strata_col: str) -> rd.Dataset:
    """Mixture balancing: deterministic per-stratum downsample to ≈ the
    smallest stratum (``rebalance_rates`` + ``stratified_sample``). Counts
    pass is bounded by stratum cardinality; the sample pass is a stateless
    shuffle-free filter, so at 100 TB this is one cheap aggregate plus one
    streamed map."""
    rates = rebalance_rates(ds, strata_col)
    return stratified_sample(ds, key_col, strata_col, rates=rates,
                             default_bytes=0)


def upsample_mixture(ds: rd.Dataset, key_col: str, n_full: int,
                     frac_bytes: int, epoch_col: str = "epoch") -> rd.Dataset:
    """Deterministic fractional upsampling — the data-recipe weighting op
    (LLaMA/C4-style mixture weights): replicate every row
    ``weight = n_full + frac_bytes/256`` times. Epochs ``0..n_full-1`` are
    always emitted; the fractional epoch ``n_full`` keeps a row iff
    ``md5(key || ':' || n_full)`` falls under the threshold, so the fractional
    subset is reproducible, repartition-invariant, and DIFFERENT per epoch
    (salting the epoch into the key avoids always re-sampling the same docs).
    Stateless map_batches — replication happens inside the batch via one
    vectorized ``take``, no shuffle; at 100 TB the output streams at
    weight × input volume without any driver coordination. SQL mirror:
    ``FROM t, (SELECT unnest(range(0, n_full+1)) AS epoch)
    WHERE epoch < n_full OR substr(md5(CAST(key AS VARCHAR) || ':<n_full>'),
    1, 2) < '<hex(frac_bytes)>'``."""
    if n_full < 0 or not (0 <= frac_bytes <= 255):
        # 255 is the ceiling, not 256: _salted_key_bytes yields 0..255, so 256
        # would keep every row — inexpressible in the 2-hex-char SQL mirror
        # (substr(md5(...),1,2) < '<hex>'). Want a whole extra epoch? Use
        # n_full + 1 with frac_bytes=0 on both engines.
        raise ValueError("need n_full >= 0 and 0 <= frac_bytes <= 255 "
                         "(for a full extra epoch, increment n_full instead)")

    def f(b: pa.Table) -> pa.Table:
        n = b.num_rows
        parts = []
        if n_full > 0:
            idx = np.repeat(np.arange(n), n_full)
            t = b.take(pa.array(idx))
            ep = np.tile(np.arange(n_full), n)
            parts.append(t.append_column(epoch_col,
                                         pa.array(ep.astype(np.int64))))
        if frac_bytes > 0:
            kb = _salted_key_bytes(b[key_col], f":{n_full}")
            t = b.filter(pa.array(kb < frac_bytes))
            parts.append(t.append_column(
                epoch_col, pa.array(np.full(t.num_rows, n_full, np.int64))))
        if not parts:
            return b.slice(0, 0).append_column(epoch_col,
                                               pa.array([], pa.int64()))
        return pa.concat_tables(parts)

    return ds.map_batches(f, batch_format="pyarrow")


def _salted_key_bytes(col: pa.ChunkedArray | pa.Array, salt: str) -> np.ndarray:
    """First md5 byte of ``str(key) + salt`` (same dtype contract as
    ``_key_bytes``)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    t = col.type
    if not (pa.types.is_integer(t) or pa.types.is_string(t)
            or pa.types.is_large_string(t)):
        raise TypeError(
            f"upsample key must be an integer or string column (got {t})")
    return np.array([hashlib.md5((str(v) + salt).encode()).digest()[0]
                     for v in col.to_pylist()], dtype=np.uint16)


def token_budget_select(ds: rd.Dataset, id_col: str, weight_col: str,
                        score_col: str, budget: int,
                        score_max: int = 1_000_000,
                        id_bits: int = 31) -> rd.Dataset:
    """DataComp-style token-budget subset selection: rank documents by
    (``score_col`` DESC, ``id_col`` ASC) and keep the prefix whose documents
    fit ENTIRELY within ``budget`` total tokens — the "take the best T
    tokens" curation cut.

    Distributed shape: a composite integer key ``(score_max - score) <<
    id_bits | id`` turns the two-column rank into ascending-id order, so the
    whole operation IS ``pack.global_prefix_sum`` — bounds pass + bucket
    histogram + one coarse co-partition, with only (key, weight) ever
    moving; the text column never shuffles and the driver sees O(buckets)
    rows. Scores/ids outside [0, score_max] / [0, 2^id_bits) raise loudly
    (a silent mask would alias ranks — the ADVICE.md lesson).

    SQL mirror (integer-exact): ``sum(w) OVER (ORDER BY score DESC, id ROWS
    BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) + w <= budget``.
    """
    from .pack import global_prefix_sum

    if (score_max << id_bits) >= (1 << 62):
        raise ValueError("score_max << id_bits must stay inside int64")
    mask = (1 << id_bits) - 1
    smax = np.int64(score_max)

    def keyed(b: pa.Table) -> pa.Table:
        ids = b[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        sc = b[score_col].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(sc) and (sc.min() < 0 or sc.max() > score_max):
            raise ValueError(
                f"token_budget_select: {score_col} outside [0, {score_max}]")
        if len(ids) and (ids.min() < 0 or ids.max() > mask):
            raise ValueError(
                f"token_budget_select: {id_col} outside [0, 2^{id_bits})")
        key = ((smax - sc) << np.int64(id_bits)) | ids
        return pa.table({"__key": pa.array(key),
                         weight_col: b[weight_col]})

    ranked = global_prefix_sum(
        ds.map_batches(keyed, batch_format="pyarrow"), "__key", weight_col)

    def unkey(b: pa.Table) -> pa.Table:
        key = b["__key"].to_numpy(zero_copy_only=False)
        w = b[weight_col].to_numpy(zero_copy_only=False).astype(np.int64)
        start = b["start"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = start + w <= budget
        return pa.table({id_col: pa.array((key & mask)[keep]),
                         weight_col: pa.array(w[keep]),
                         "start_tok": pa.array(start[keep])})

    return ranked.map_batches(unkey, batch_format="pyarrow")
