"""Persisted inverted index: token → sorted posting list, hash-partitioned so a
term lookup reads 1/n_parts of the index.

The reference engine has no search component; this is part of the
training-data-pipeline mandate (corpus indexing / conjunctive retrieval at
scale). Design:

- **Build** (one corpus pass + one coarse shuffle): tokenize each doc
  vectorized (Arrow split + dictionary-encode + np.unique — the same kernel as
  the TF pairs), co-partition (token → ``hash(token) % n_parts``) via
  ``grouped_reduce``, and inside each partition collapse to one row per token:
  ``(tok, df, postings: list<int64> sorted)``. Written as partitioned parquet
  (``part=N/``) — resumable, and the partition a token lives in is
  recomputable at query time.
- **Search** (partition-pruned): a conjunctive query for k terms recomputes
  each term's partition id with the SAME stable hash (pandas siphash, fixed
  key — process-independent, the property ``core.groupops`` already relies
  on), reads ONLY those ``part=N`` directories (k/n_parts of the index),
  filters to the query terms, then intersects by exploding the k posting
  lists and keeping doc_ids seen ``k`` times — a groupby-count, never a
  driver-side set intersection over full postings.

At 100 TB the index build shuffles (token, doc_id) pairs once — the same
volume a `groupby(token)` pays — and a query touches k partition directories
regardless of corpus size.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

from ..core.groupops import _stable_part

TOKEN_PAT = r"[ \t\n\r\f]+"


def _doc_token_pairs(b: pa.Table, id_col: str, text_col: str) -> pa.Table:
    """Unique (doc_id, tok, tf, dl) rows per batch, fully vectorized: Arrow
    tokenize, dictionary-encode the flat token stream, np.unique over
    (row, code) composite keys (counts = term frequency), bincount over the
    parent indices (= document length). Each doc lives wholly in one batch
    row, so batch-local uniqueness is global uniqueness."""
    t = b[text_col]
    if isinstance(t, pa.ChunkedArray):
        t = t.combine_chunks()
    toks = pc.split_pattern_regex(pc.fill_null(t, ""), pattern=TOKEN_PAT)
    flat = pc.list_flatten(toks)
    par = pc.list_parent_indices(toks)
    if isinstance(flat, pa.ChunkedArray):
        flat, par = flat.combine_chunks(), par.combine_chunks()
    keep = pc.not_equal(flat, "")
    flat, par = flat.filter(keep), par.filter(keep)
    if len(flat) == 0:
        return pa.table({"doc_id": pa.array([], pa.int64()),
                         "tok": pa.array([], pa.string()),
                         "tf": pa.array([], pa.int64()),
                         "dl": pa.array([], pa.int64()),
                         "is_first": pa.array([], pa.int64())})
    d = flat.dictionary_encode()
    codes = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    vocab = d.dictionary
    rows_np = par.to_numpy(zero_copy_only=False).astype(np.int64)
    comp = rows_np * len(vocab) + codes
    uniq, tf = np.unique(comp, return_counts=True)
    dl = np.bincount(rows_np, minlength=b.num_rows)
    rows = uniq // len(vocab)
    # flag each doc's first pair row WHILE the batch is intact — downstream
    # block slicing can split a doc's rows across blocks, so per-block
    # distinct-doc counting would overcount; Sum(is_first) stays exact.
    is_first = np.zeros(len(rows), dtype=np.int64)
    is_first[np.flatnonzero(np.diff(rows, prepend=-1))] = 1
    return pa.table({
        "doc_id": pc.cast(b[id_col].take(pa.array(rows)), pa.int64()),
        "tok": vocab.take(pa.array(uniq % len(vocab))),
        "tf": pa.array(tf.astype(np.int64)),
        "dl": pa.array(dl[rows].astype(np.int64)),
        "is_first": pa.array(is_first)})


def build_inverted_index(ds: rd.Dataset, out_dir: str, n_parts: int = 64,
                         id_col: str = "doc_id", text_col: str = "text") -> str:
    """Build the index under ``out_dir`` (parquet partitioned by ``part``).
    One tokenize pass + one coarse shuffle on the token hash. Postings carry
    per-doc term frequency and document length denormalized alongside the doc
    id (Lucene stores per-doc norms the same way), so ranked retrieval needs
    no join against a doc table at query time. A tiny ``meta.json`` records
    corpus stats (n_docs, avgdl) for the BM25 idf/normalization — computed
    from per-batch partials of the SAME tokenize pass output, one extra small
    aggregate over (doc count, token count) pairs."""

    # materialized ONCE: both the postings shuffle and the tiny stats
    # aggregate below consume these blocks — without this the stats pass
    # would re-execute the whole tokenize (the double-execution pattern the
    # round-2 advice flagged). The pairs table is index-sized, not
    # corpus-sized, and the object store spills it rather than the heap.
    pairs = ds.map_batches(
        lambda b: _doc_token_pairs(b, id_col, text_col),
        batch_format="pyarrow").materialize()

    def postings(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["tok", "doc_id"], kind="mergesort")
        gb = g.groupby("tok", sort=False)
        agg = gb.agg(postings=("doc_id", list), tfs=("tf", list),
                     dls=("dl", list)).reset_index()
        agg["df"] = agg["postings"].map(len).astype("int64")
        return agg

    def stats_partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"n_docs": pa.array([], pa.int64()),
                             "n_tokens": pa.array([], pa.int64())})
        n_docs = int(pc.sum(b["is_first"]).as_py() or 0)
        n_tok = int(pc.sum(b["tf"]).as_py() or 0)
        return pa.table({"n_docs": pa.array([n_docs], pa.int64()),
                         "n_tokens": pa.array([n_tok], pa.int64())})

    # keep the partition id as a column so write_parquet lays out part=N/ dirs
    def add_part(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return b.append_column("part", pa.array([], pa.int32()))
        return b.append_column(
            "part", pa.array(_stable_part(b, ["tok"], n_parts)))

    def run(g: pd.DataFrame) -> pd.DataFrame:
        out = postings(g.drop(columns=["part", "is_first"]))
        out["part"] = g["part"].iloc[0]
        return out

    (pairs.map_batches(add_part, batch_format="pyarrow")
     .groupby("part").map_groups(run, batch_format="pandas")
     .write_parquet(out_dir, partition_cols=["part"]))

    # corpus stats for BM25 (shuffle-free): Sum(is_first) = exact distinct doc
    # count, Sum(tf) = total tokens — both over the already-materialized pairs.
    from ray.data.aggregate import Sum

    stats = (pairs.map_batches(stats_partial, batch_format="pyarrow")
             .aggregate(Sum("n_docs", alias_name="n_docs"),
                        Sum("n_tokens", alias_name="n_tokens")))
    n_docs = int(stats["n_docs"] or 0)
    n_tokens = int(stats["n_tokens"] or 0)
    meta = {"n_docs": n_docs, "n_tokens": n_tokens,
            "avgdl": (n_tokens / n_docs) if n_docs else 0.0,
            "n_parts": n_parts}
    import json

    with open(os.path.join(out_dir, "meta.json"), "w") as f:
        json.dump(meta, f)
    return out_dir


def term_partitions(terms: list[str], n_parts: int = 64) -> dict[str, int]:
    """Recompute each term's partition id with the same stable hash the build
    used — the pruning key for the read."""
    t = pa.table({"tok": pa.array(list(terms), pa.string())})
    parts = _stable_part(t, ["tok"], n_parts)
    return dict(zip(terms, (int(p) for p in parts)))


def search_index(index_dir: str, terms: list[str],
                 n_parts: int = 64) -> rd.Dataset:
    """Conjunctive (AND) search: doc_ids containing ALL ``terms``. Reads only
    the ≤k ``part=N`` directories the query terms hash into, filters to the
    terms, explodes their posting lists, and keeps doc_ids whose term count
    equals k (a tiny groupby over the union of the k postings)."""
    if not terms:
        raise ValueError("search_index needs at least one term")
    terms = list(dict.fromkeys(terms))  # dedupe, preserve order
    k = len(terms)
    import glob as _glob

    parts = sorted(set(term_partitions(terms, n_parts).values()))
    paths = [f for p in parts
             for f in sorted(_glob.glob(
                 os.path.join(index_dir, f"part={p}", "*.parquet")))]
    if not paths:
        return rd.from_arrow(pa.table({"doc_id": pa.array([], pa.int64())}))
    term_set = pa.array(terms, pa.string())

    def explode(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_in(b["tok"], value_set=term_set))
        flat = pc.list_flatten(b["postings"])
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        return pa.table({"doc_id": pc.cast(flat, pa.int64())})

    # count per doc: postings are per-term unique, so a doc appears once per
    # matching term — Count() after the explode gives the containment count.
    from ray.data.aggregate import Count

    counted = (rd.read_parquet(paths, columns=["tok", "postings"])
               .map_batches(explode, batch_format="pyarrow")
               .groupby("doc_id").aggregate(Count(alias_name="n_terms")))

    def keep_all(b: pa.Table) -> pa.Table:
        return b.filter(pc.equal(b["n_terms"], k)).select(["doc_id"])

    # NOTE: a query where no term exists in the index returns an EMPTY dataset
    # with no schema — Ray 2.49's Aggregate drops the schema of an empty
    # result and not even a typed union restores it; callers must treat a
    # zero-row frame as the empty hit set rather than indexing `doc_id`.
    return counted.map_batches(keep_all, batch_format="pyarrow")


def bm25_search(index_dir: str, terms: list[str], n_parts: int = 64,
                top_k: int = 10, k1: float = 1.2, b: float = 0.75,
                integer_scores: bool = False) -> pa.Table:
    """Disjunctive BM25 ranked retrieval over the same partition-pruned index
    (Robertson/Spärck Jones BM25, the Lucene `k1`/`b` parameterization).

    Reads ONLY the ≤k ``part=N`` directories the query terms hash into. The
    per-doc length is denormalized into the postings at build time, so scoring
    is one vectorized flatten per pruned block — no join against a doc table;
    idf and avgdl come from the build-time ``meta.json``. The per-doc
    contributions (≤ one per query term) combine under a tiny
    ``groupby(doc_id)`` over the union of the query terms' postings only, and
    the final top-k is a sort-limit over that bounded candidate set. Scores
    are rounded to 9 dp after summation so ranking is stable across summation
    orders (≤k doubles per doc differ by ≤1 ulp between runs).

    ``integer_scores=True`` quantizes each per-(term, doc) contribution to
    nano-units (``floor(s * 1e9 + 0.5)`` as int64) BEFORE the distributed sum,
    so the per-doc score is an order-free integer sum — bit-stable across
    runs, partitionings, and engines. Output columns become
    ``(doc_id, score_e9: int64, rank)``; this is the cross-engine-checkable
    surface (the SQL oracle mirrors the same quantization)."""
    import glob as _glob
    import json as _json

    if not terms:
        raise ValueError("bm25_search needs at least one term")
    terms = list(dict.fromkeys(terms))
    with open(os.path.join(index_dir, "meta.json")) as f:
        meta = _json.load(f)
    n_docs, avgdl = meta["n_docs"], meta["avgdl"] or 1.0
    score_col = "score_e9" if integer_scores else "score"
    score_type = pa.int64() if integer_scores else pa.float64()
    parts = sorted(set(term_partitions(terms, n_parts).values()))
    paths = [f for p in parts
             for f in sorted(_glob.glob(
                 os.path.join(index_dir, f"part={p}", "*.parquet")))]
    empty = pa.table({"doc_id": pa.array([], pa.int64()),
                      score_col: pa.array([], score_type),
                      "rank": pa.array([], pa.int64())})
    if not paths:
        return empty
    term_set = pa.array(terms, pa.string())

    def score(bt: pa.Table) -> pa.Table:
        bt = bt.filter(pc.is_in(bt["tok"], value_set=term_set))
        if bt.num_rows == 0:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             score_col: pa.array([], score_type)})

        def _flat(col):
            v = pc.list_flatten(bt[col])
            return (v.combine_chunks() if isinstance(v, pa.ChunkedArray)
                    else v).to_numpy(zero_copy_only=False)

        doc = _flat("postings").astype(np.int64)
        tf = _flat("tfs").astype(np.float64)
        dl = _flat("dls").astype(np.float64)
        lens = pc.list_value_length(bt["postings"]).to_numpy(
            zero_copy_only=False).astype(np.int64)
        dfv = np.repeat(
            bt["df"].to_numpy(zero_copy_only=False).astype(np.float64), lens)
        idf = np.log((n_docs - dfv + 0.5) / (dfv + 0.5) + 1.0)
        s = idf * tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dl / avgdl))
        if integer_scores:
            # quantize the per-(term, doc) contribution, NOT the sum: integer
            # addition is order-free, so the per-doc total is identical under
            # any partitioning / summation order and any engine that mirrors
            # this quantization (floor(x*1e9 + 0.5) — half-away, matching SQL
            # round semantics for the positive scores BM25 produces)
            s = np.floor(s * 1e9 + 0.5).astype(np.int64)
        return pa.table({"doc_id": pa.array(doc), score_col: pa.array(s)})

    from ray.data.aggregate import Sum

    def round_scores(bt: pa.Table) -> pa.Table:
        # round BEFORE the distributed sort+limit: the top-k cut itself must
        # run on the tie-stabilized key, or a 1-ulp cross-run difference at
        # the boundary could admit a different doc into the top-k (integer
        # mode needs no stabilization — the sum is exact)
        if integer_scores or score_col not in bt.column_names:
            return bt  # Ray empty-aggregate schema drop (see search_index NOTE)
        return bt.set_column(bt.schema.get_field_index(score_col), score_col,
                             pc.round(bt[score_col], ndigits=9))

    ranked = (rd.read_parquet(paths, columns=["tok", "df", "postings",
                                              "tfs", "dls"])
              .map_batches(score, batch_format="pyarrow")
              .groupby("doc_id").aggregate(Sum(score_col, alias_name=score_col))
              .map_batches(round_scores, batch_format="pyarrow")
              .sort([score_col, "doc_id"], descending=[True, False])
              .limit(top_k))
    t = pa.Table.from_pandas(ranked.to_pandas(), preserve_index=False)
    if t.num_rows == 0:
        return empty  # Ray empty-aggregate schema drop (see search_index NOTE)
    order = pc.sort_indices(pa.table({"s": t[score_col], "d": t["doc_id"]}),
                            sort_keys=[("s", "descending"), ("d", "ascending")])
    return pa.table({
        "doc_id": pc.cast(t["doc_id"].take(order), pa.int64()),
        score_col: pc.cast(t[score_col].take(order), score_type),
        "rank": pa.array(np.arange(1, t.num_rows + 1, dtype=np.int64))})
