"""Bigram language-model scoring — the CCNet-style LM-quality signal
(Wenzek et al. 2019, arXiv 1911.00359 score documents with a KenLM 5-gram;
this is the same signal from a corpus-trained bigram MLE, engine-native).

Per document: ``ll = Σ_positions ln( c(w_{i-1} w_i) / c(w_{i-1}) )`` where the
counts come from the corpus itself (self-scoring ⇒ every bigram is attested,
no smoothing needed; ``c(a)`` is the corpus unigram count — the standard
approximation that keeps one count table). Lower (more negative) per-token
log-likelihood ≈ weirder text: the ranking used to bucket CommonCrawl into
head/middle/tail quality tiers.

Scale shape (100 TB):
- Pass 1 builds the LM: ONE tokenize pass emits prefix-tagged unigram+bigram
  count partials (``u:tok`` / ``b:a b``) so a single vocabulary-scale shuffle
  aggregates both layers (the ``pmi_bigrams`` pattern).
- Pass 2 re-tokenizes emitting per-doc (first-token, bigram, multiplicity)
  partials — value_counts inside the batch, so the exchange carries one row
  per DISTINCT (doc, bigram), not per token position.
- Counts attach via two co-partitioned ``lookup_join``s on the gram key (the
  vocabulary is never broadcast or collected), then one groupby(doc) sums.
- Cross-engine determinism: each position's contribution is quantized to
  nano-units from a fixed IEEE expression BEFORE the sum (the bm25 pattern),
  so the per-doc int64 sum is order-free and the DuckDB mirror reproduces it
  bit-for-bit.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd
from ray.data.aggregate import Sum

from ..core.groupops import lookup_join

_WS = r"[ \t\n\r\f]+"


def _arr(a):
    return a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a


def _tokens(b: pa.Table, text_col: str):
    """(flat tokens, parent row index) with empty tokens dropped — identical
    convention to token_freq/pmi_bigrams (and their DuckDB mirrors)."""
    t = _arr(b[text_col])
    toks = pc.split_pattern_regex(pc.fill_null(t, ""), pattern=_WS)
    flat = _arr(pc.list_flatten(toks))
    par = _arr(pc.list_parent_indices(toks))
    keep = pc.not_equal(flat, "")
    return flat.filter(keep), par.filter(keep)


def _count_partial(b: pa.Table, text_col: str) -> pa.Table:
    """Prefix-tagged unigram/bigram count partials for one batch."""
    flat, par = _tokens(b, text_col)
    keys, ns = [], []
    if len(flat):
        vc = pc.value_counts(pc.binary_join_element_wise(
            pa.array(["u:"] * len(flat)), flat, ""))
        keys.append(_arr(vc.field("values")))
        ns.append(_arr(pc.cast(vc.field("counts"), pa.int64())))
    if len(flat) >= 2:
        p = par.to_numpy(zero_copy_only=False)
        same = pa.array(p[:-1] == p[1:])
        left = flat.slice(0, len(flat) - 1).filter(same)
        right = flat.slice(1).filter(same)
        if len(left):
            body = pc.binary_join_element_wise(left, right, " ")
            vcb = pc.value_counts(pc.binary_join_element_wise(
                pa.array(["b:"] * len(left)), body, ""))
            keys.append(_arr(vcb.field("values")))
            ns.append(_arr(pc.cast(vcb.field("counts"), pa.int64())))
    if not keys:
        return pa.table({"key": pa.array([], pa.string()),
                         "n": pa.array([], pa.int64())})
    return pa.table({"key": pa.concat_arrays(keys), "n": pa.concat_arrays(ns)})


def _score_broadcast(ds: rd.Dataset, counts: rd.Dataset, id_col: str,
                     text_col: str) -> rd.Dataset:
    """Bounded-vocabulary fast path: the (gram, layer, c) table is shipped to
    workers once via ``ray.put`` and every batch scores itself — per-doc sums
    are computed INSIDE the batch (a doc's tokens live in one input row), so
    scoring is a single shuffle-free pass with no joins and no final
    groupby."""
    import ray

    tbl = pa.concat_tables(list(counts.iter_batches(batch_format="pyarrow")))
    lm_ref = ray.put((tbl["gram"].combine_chunks(),
                      tbl["layer"].combine_chunks(),
                      tbl["c"].to_numpy(zero_copy_only=False)))

    def score(b: pa.Table) -> pa.Table:
        grams, layers, cvals = ray.get(lm_ref)
        flat, par = _tokens(b, text_col)
        ids = _arr(b[id_col])
        n_rows = b.num_rows
        empty = pa.table({id_col: pa.array([], ids.type),
                          "n_bigrams": pa.array([], pa.int64()),
                          "ll_e9": pa.array([], pa.int64())})
        if len(flat) < 2:
            return empty
        p = par.to_numpy(zero_copy_only=False)
        same = np.flatnonzero(p[:-1] == p[1:])
        if not len(same):
            return empty
        left = flat.take(pa.array(same))
        right = flat.take(pa.array(same + 1))
        body = pc.binary_join_element_wise(left, right, " ")
        akey = pc.binary_join_element_wise(
            pa.array(["u:"] * len(same)), left, "")
        bkey = pc.binary_join_element_wise(
            pa.array(["b:"] * len(same)), body, "")
        # dictionary probe: index_in against the broadcast gram+layer key
        # (prefix-tagged exactly like the count table rows). The LM is
        # self-trained on this corpus, so every probe MUST hit — a null
        # index is an internal invariant violation, not data.
        tagged = pc.binary_join_element_wise(layers, grams, ":")
        ia = pc.index_in(akey, value_set=tagged)
        ib = pc.index_in(bkey, value_set=tagged)
        if ia.null_count or ib.null_count:
            raise AssertionError("lm broadcast probe missed a self-trained gram")
        ca = cvals[ia.to_numpy(zero_copy_only=False)]
        cab = cvals[ib.to_numpy(zero_copy_only=False)]
        # fixed IEEE op order — identical to the join path and the SQL mirror
        q = np.floor(np.log(cab.astype(np.float64) / ca.astype(np.float64))
                     * 1e9 + 0.5).astype(np.int64)
        rows = p[same]
        n_big = np.bincount(rows, minlength=n_rows)
        ll = np.zeros(n_rows, dtype=np.int64)
        np.add.at(ll, rows, q)
        keep = np.flatnonzero(n_big > 0)
        return pa.table({
            id_col: ids.take(pa.array(keep)),
            "n_bigrams": pa.array(n_big[keep].astype(np.int64)),
            "ll_e9": pa.array(ll[keep])})

    return ds.map_batches(score, batch_format="pyarrow")


def lm_bigram_score(ds: rd.Dataset, id_col: str = "doc_id",
                    text_col: str = "text", n_parts: int = 64,
                    broadcast_limit: int = 2_000_000) -> rd.Dataset:
    """Per-document corpus-bigram-LM log-likelihood:
    ``(id_col, n_bigrams, ll_e9)`` where ``ll_e9`` is the int64 sum of
    nano-quantized per-position ``ln(c_ab / c_a)`` contributions (≤ 0; lower
    per-bigram means less corpus-typical text). Docs with < 2 tokens are
    absent (no bigram positions), mirroring SQL GROUP BY over the pair rows.

    Guarded hybrid (the ``embedding_dup_pairs`` pattern): when the count
    table holds ≤ ``broadcast_limit`` keys, the LM is broadcast once via
    ``ray.put`` and scoring is ONE stateless shuffle-free pass (per-doc sums
    computed inside the batch — a doc's tokens live in one row). Above the
    bound — open web vocabulary — the co-partitioned ``lookup_join`` path
    runs instead: the vocabulary never lands on the driver or any single
    node. Both paths produce identical rows (pytest-pinned)."""
    counts = (ds.map_batches(lambda b: _count_partial(b, text_col),
                             batch_format="pyarrow")
              .groupby("key").aggregate(Sum("n", alias_name="c")))

    def split_counts(b: pa.Table) -> pa.Table:
        return pa.table({"gram": pc.utf8_slice_codeunits(b["key"], 2),
                         "layer": pc.utf8_slice_codeunits(b["key"], 0, 1),
                         "c": pc.cast(pc.round(b["c"]), pa.int64())})

    counts = counts.map_batches(split_counts, batch_format="pyarrow") \
                   .materialize()

    if counts.count() <= broadcast_limit:
        return _score_broadcast(ds, counts, id_col, text_col)

    def layer(tag: str):
        def f(b: pa.Table) -> pa.Table:
            return b.filter(pc.equal(b["layer"], tag)).drop_columns(["layer"])
        return f

    uni = counts.map_batches(layer("u"), batch_format="pyarrow")
    big = counts.map_batches(layer("b"), batch_format="pyarrow")

    def doc_partial(b: pa.Table) -> pa.Table:
        """(doc id, first token, bigram, multiplicity) per distinct doc-bigram."""
        flat, par = _tokens(b, text_col)
        ids = _arr(b[id_col])
        if len(flat) < 2:
            return pa.table({id_col: pa.array([], ids.type),
                             "a": pa.array([], pa.string()),
                             "bigram": pa.array([], pa.string()),
                             "m": pa.array([], pa.int64())})
        p = par.to_numpy(zero_copy_only=False)
        same = np.flatnonzero(p[:-1] == p[1:])
        left = flat.take(pa.array(same))
        right = flat.take(pa.array(same + 1))
        rows = ids.take(pa.array(p[same]))
        body = pc.binary_join_element_wise(left, right, " ")
        # C-level hash groupby inside the batch: one output row per distinct
        # (doc, bigram) — the exchange never carries per-position rows
        g = (pa.table({id_col: rows, "a": left, "bigram": body})
             .group_by([id_col, "a", "bigram"])
             .aggregate([([], "count_all")]))
        return pa.table({id_col: g[id_col], "a": g["a"],
                         "bigram": g["bigram"],
                         "m": pc.cast(g["count_all"], pa.int64())})

    pairs = ds.map_batches(doc_partial, batch_format="pyarrow")
    # derive the id column's type from the input (string doc ids are legal);
    # hard-coding int64 here broke the join path the moment the count table
    # exceeded broadcast_limit on a string-keyed corpus
    id_type = ds.schema().base_schema.field(id_col).type
    pair_schema = pa.schema([(id_col, id_type), ("a", pa.string()),
                             ("bigram", pa.string()), ("m", pa.int64())])
    kv_schema = pa.schema([("gram", pa.string()), ("c", pa.int64())])
    pairs = lookup_join(pairs, big, "bigram", "gram", "c", out_col="c_ab",
                        n_parts=n_parts, schema=pair_schema,
                        kv_schema=kv_schema)
    pairs = lookup_join(pairs, uni, "a", "gram", "c", out_col="c_a",
                        n_parts=n_parts,
                        schema=pair_schema.append(pa.field("c_ab", pa.int64())),
                        kv_schema=kv_schema)

    def contrib(b: pa.Table) -> pa.Table:
        cab = b["c_ab"].to_numpy(zero_copy_only=False).astype(np.float64)
        ca = b["c_a"].to_numpy(zero_copy_only=False).astype(np.float64)
        m = b["m"].to_numpy(zero_copy_only=False)
        # fixed IEEE op order, mirrored token-for-token in SQL_LM_DOC_SCORE
        q = np.floor(np.log(cab / ca) * 1e9 + 0.5).astype(np.int64)
        return pa.table({id_col: b[id_col], "m": b["m"],
                         "mq": pa.array(m * q, pa.int64())})

    out = (pairs.map_batches(contrib, batch_format="pyarrow")
           .groupby(id_col).aggregate(Sum("m", alias_name="n_bigrams"),
                                      Sum("mq", alias_name="ll_e9")))

    def fin(b: pa.Table) -> pa.Table:
        return pa.table({
            id_col: b[id_col],
            "n_bigrams": pc.cast(pc.round(b["n_bigrams"]), pa.int64()),
            "ll_e9": pc.cast(pc.round(b["ll_e9"]), pa.int64())})

    return out.map_batches(fin, batch_format="pyarrow")
