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
    """Unique (doc_id, tok) pairs per batch, fully vectorized: Arrow tokenize,
    dictionary-encode the flat token stream, np.unique over (row, code)
    composite keys. Each doc lives wholly in one batch row, so batch-local
    uniqueness is global uniqueness."""
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
                         "tok": pa.array([], pa.string())})
    d = flat.dictionary_encode()
    codes = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    vocab = d.dictionary
    comp = par.to_numpy(zero_copy_only=False).astype(np.int64) * len(vocab) + codes
    uniq = np.unique(comp)
    return pa.table({
        "doc_id": pc.cast(b[id_col].take(pa.array(uniq // len(vocab))), pa.int64()),
        "tok": vocab.take(pa.array(uniq % len(vocab)))})


def build_inverted_index(ds: rd.Dataset, out_dir: str, n_parts: int = 64,
                         id_col: str = "doc_id", text_col: str = "text") -> str:
    """Build the index under ``out_dir`` (parquet partitioned by ``part``).
    One tokenize pass + one coarse shuffle on the token hash."""

    pairs = ds.map_batches(
        lambda b: _doc_token_pairs(b, id_col, text_col), batch_format="pyarrow")

    def postings(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["tok", "doc_id"], kind="mergesort")
        agg = g.groupby("tok", sort=False)["doc_id"].agg(list).reset_index()
        agg.columns = ["tok", "postings"]
        agg["df"] = agg["postings"].map(len).astype("int64")
        return agg

    # keep the partition id as a column so write_parquet lays out part=N/ dirs
    def add_part(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return b.append_column("part", pa.array([], pa.int32()))
        return b.append_column(
            "part", pa.array(_stable_part(b, ["tok"], n_parts)))

    def run(g: pd.DataFrame) -> pd.DataFrame:
        out = postings(g.drop(columns=["part"]))
        out["part"] = g["part"].iloc[0]
        return out

    (pairs.map_batches(add_part, batch_format="pyarrow")
     .groupby("part").map_groups(run, batch_format="pandas")
     .write_parquet(out_dir, partition_cols=["part"]))
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
