"""Query registry: every operator exposed as a named pipeline over the driver's
parquet tables, each paired (where ANSI-SQL-expressible) with the DuckDB oracle
SQL the correctness driver runs side-by-side.

Column-name parity rule: every computed column is named identically in the Ray
code and the SQL (the driver hashes values after sorting columns by name).
Float-summation caveat: aggregates over doubles restrict to order-insensitive
exact ops (count / min / max / sums of integer-valued doubles) so value hashes
are bit-stable between Ray and DuckDB.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray
import ray.data as rd
from ray.data.aggregate import Count, Max, Min, Sum

from ..functions import dedup as dd
from ..functions import similarity as sim
from ..functions import text_clean as tc_mod
from ..functions import textstats as ts
from ..functions.text_clean import GLYPH_PAT, WS_RUN_PAT, clean_text_arr
from ..stages import window as win

# ASCII-only trim set for the SQL mirrors; the Ray/oracle clean() trims Unicode
# whitespace — equivalent on these corpora (SPEC §2: generators never emit
# non-ASCII whitespace at string edges).
_TRIM_WS_SQL = "' ' || chr(9) || chr(10) || chr(13) || chr(11) || chr(12)"


def _cast_int64(ds, cols):
    """Normalize integer-valued aggregate outputs to int64 (Ray's Sum over int
    emits float64; the DuckDB oracle emits BIGINT — value hashes must agree)."""

    def f(t: pa.Table) -> pa.Table:
        for c in cols:
            i = t.schema.get_field_index(c)
            t = t.set_column(i, c, pc.cast(pc.round(t[c]), pa.int64()))
        return t

    return ds.map_batches(f, batch_format="pyarrow")


def _docs(sf_dir, columns=None):
    return rd.read_parquet(os.path.join(sf_dir, "documents.parquet"), columns=columns)


def _t(sf_dir, name, columns=None):
    return rd.read_parquet(os.path.join(sf_dir, f"{name}.parquet"), columns=columns)


def _docs_wide(sf_dir, columns=None, n_blocks=32):
    """``documents`` re-blocked for token-heavy passes: the sf tables are
    single-row-group parquet files, so the read yields ONE block and a heavy
    tokenize map_batches runs as ONE task (measured: the lm_doc_score counts
    pass serialized at 7.8 s; 32 cores idle). At real corpus scale the read
    is naturally thousands of blocks and this repartition would be an
    unnecessary exchange — it exists for the benchmark data shape (a ~15 MB
    shuffle, trivial). Results are partitioning-invariant by construction."""
    return _docs(sf_dir, columns).repartition(n_blocks)


# ---------------------------------------------------------------------------
# Text analysis (SQL-checked)
# ---------------------------------------------------------------------------


def q_doc_stats(sf_dir):
    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        ts.text_stats_batch, batch_format="pyarrow"
    ).drop_columns(["text"])


SQL_DOC_STATS = f"""
SELECT doc_id,
       array_length(regexp_extract_all(text, '{ts.TOKEN_PAT}'))  AS n_tokens,
       length(text)                                              AS n_chars_seen,
       array_length(regexp_extract_all(text, '{ts.PUNCT_PAT}'))  AS n_punct,
       array_length(regexp_extract_all(text, '{ts.DIGIT_PAT}'))  AS n_digit,
       array_length(regexp_extract_all(text, '{ts.UPPER_PAT}'))  AS n_upper
FROM documents
"""


def q_glyph_clean(sf_dir):
    """N1 cleaner (reference slice_extractor.py:212-225) as a standalone query."""

    def fn(b: pa.Table) -> pa.Table:
        return pa.table({"doc_id": b["doc_id"], "clean_text": clean_text_arr(b["text"])})

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(fn, batch_format="pyarrow")


SQL_GLYPH_CLEAN = f"""
SELECT doc_id,
       trim(regexp_replace(regexp_replace(text, '{GLYPH_PAT}', ' ', 'g'),
                           '{WS_RUN_PAT}', ' ', 'g'), {_TRIM_WS_SQL}) AS clean_text
FROM documents
"""


def q_lang_distribution(sf_dir):
    return _cast_int64(
        _docs(sf_dir, ["lang", "n_chars"])
        .groupby("lang")
        .aggregate(Count(alias_name="n_docs"), Sum("n_chars", alias_name="total_chars")),
        ["total_chars"],
    )


SQL_LANG_DISTRIBUTION = """
SELECT lang, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS total_chars
FROM documents GROUP BY lang
"""


def q_source_stats(sf_dir):
    return _cast_int64(
        _docs(sf_dir, ["source", "n_chars"])
        .groupby("source")
        .aggregate(Count(alias_name="n_docs"), Sum("n_chars", alias_name="total_chars"),
                   Min("n_chars", alias_name="min_chars"),
                   Max("n_chars", alias_name="max_chars")),
        ["total_chars", "min_chars", "max_chars"],
    )


SQL_SOURCE_STATS = """
SELECT source, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS total_chars,
       min(n_chars) AS min_chars, max(n_chars) AS max_chars
FROM documents GROUP BY source
"""


# ---------------------------------------------------------------------------
# Dedup (exact: SQL-checked; near-dup families: rows-only)
# ---------------------------------------------------------------------------


def q_token_freq(sf_dir):
    """Corpus-wide heavy hitters: top-50 tokens by frequency. Pre-aggregation
    pattern — each batch emits its own (token, count) partials (one Arrow
    tokenize + value_counts, no Python loop), so the shuffle carries counts,
    never token streams; a tiny groupby-sum + sort/limit finishes. Ties break
    by token ascending (deterministic)."""

    def partial(b: pa.Table) -> pa.Table:
        t = b["text"]
        if isinstance(t, pa.ChunkedArray):
            t = t.combine_chunks()
        toks = pc.split_pattern_regex(pc.fill_null(t, ""),
                                      pattern=r"[ \t\n\r\f]+")
        flat = pc.list_flatten(toks)
        flat = flat.filter(pc.not_equal(flat, ""))
        vc = pc.value_counts(flat)
        return pa.table({"tok": vc.field("values"),
                         "n": pc.cast(vc.field("counts"), pa.int64())})

    counted = (_docs(sf_dir, ["text"])
               .map_batches(partial, batch_format="pyarrow")
               .groupby("tok").aggregate(Sum("n", alias_name="n")))
    return (_cast_int64(counted, ["n"])
            .sort(["n", "tok"], descending=[True, False]).limit(50))


SQL_TOKEN_FREQ = """
WITH t AS (
  SELECT unnest(list_filter(regexp_split_to_array(text, '[ \t\n\r\f]+'),
                            x -> x <> '')) AS tok
  FROM documents)
SELECT tok, count(*) AS n FROM t GROUP BY tok ORDER BY n DESC, tok LIMIT 50
"""


def _arr(x) -> pa.Array:
    """Normalize a column that may arrive as Array or ChunkedArray (Ray blocks
    differ) to a single contiguous Array."""
    return x.combine_chunks() if isinstance(x, pa.ChunkedArray) else x


def _tf_pairs(sf_dir):
    """(doc_id, tok, tf) term-frequency pairs, one vectorized pass: Arrow
    tokenize per doc, dictionary-encode the flat token stream, and np.unique
    over (row, token-code) composite keys — each doc lives wholly in one batch
    row, so the batch-local count IS the final tf (no shuffle needed)."""

    def pairs(b: pa.Table) -> pa.Table:
        t = b["text"]
        if isinstance(t, pa.ChunkedArray):
            t = t.combine_chunks()
        toks = pc.split_pattern_regex(pc.fill_null(t, ""),
                                      pattern=r"[ \t\n\r\f]+")
        flat = _arr(pc.list_flatten(toks))
        par = _arr(pc.list_parent_indices(toks))
        keep = pc.not_equal(flat, "")
        flat, par = flat.filter(keep), par.filter(keep)
        if len(flat) == 0:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "tok": pa.array([], pa.string()),
                             "tf": pa.array([], pa.int64())})
        d = flat.dictionary_encode()
        codes = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        vocab = d.dictionary
        comp = par.to_numpy(zero_copy_only=False).astype(np.int64) * len(vocab) + codes
        uniq, tf = np.unique(comp, return_counts=True)
        return pa.table({
            "doc_id": b["doc_id"].take(pa.array(uniq // len(vocab))),
            "tok": vocab.take(pa.array(uniq % len(vocab))),
            "tf": pa.array(tf.astype(np.int64))})

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        pairs, batch_format="pyarrow")


def q_tfidf_top_term(sf_dir):
    """TF-IDF-style scoring at corpus scale WITHOUT broadcasting the
    vocabulary (at 100 TB the token→document-frequency map is itself huge):
    two co-partitioned exchanges. Exchange 1 shuffles the (doc, tok, tf)
    pairs by token; since every row of a token lands in one partition, the
    document frequency is just the partition-local row count per token, and
    it is appended in the same pass (pandas groupby-transform). Exchange 2
    shuffles by doc and keeps each doc's top term by (tf desc, df asc — the
    rarer term wins, the idf ordering — tok asc), a vectorized
    sort + drop_duplicates per partition. Integer-ranked on purpose: float
    tf*idf scores would break the cross-engine value hash."""
    import pandas as pd

    from ..core.groupops import grouped_reduce

    def with_df(g: pd.DataFrame) -> pd.DataFrame:
        g = g.copy()
        g["df"] = g.groupby("tok")["doc_id"].transform("size").astype("int64")
        return g

    scored = grouped_reduce(_tf_pairs(sf_dir), ["tok"], with_df)

    def top1(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["doc_id", "tf", "df", "tok"],
                          ascending=[True, False, True, True], kind="mergesort")
        g = g.drop_duplicates("doc_id", keep="first")
        return g.rename(columns={"tok": "top_term"})[
            ["doc_id", "top_term", "tf", "df"]]

    return grouped_reduce(scored, ["doc_id"], top1)


SQL_TFIDF_TOP_TERM = """
WITH toks AS (
  SELECT doc_id, unnest(list_filter(regexp_split_to_array(text, '[ \t\n\r\f]+'),
                                    x -> x <> '')) AS tok
  FROM documents
), tf AS (
  SELECT doc_id, tok, count(*) AS tf FROM toks GROUP BY doc_id, tok
), df AS (
  SELECT tok, count(DISTINCT doc_id) AS df FROM toks GROUP BY tok
)
SELECT doc_id, tok AS top_term, tf, df FROM (
  SELECT t.doc_id, t.tok, t.tf, d.df,
         row_number() OVER (PARTITION BY t.doc_id
                            ORDER BY t.tf DESC, d.df ASC, t.tok ASC) AS rn
  FROM tf t JOIN df d USING (tok)
) WHERE rn = 1
"""


def q_bigram_freq(sf_dir):
    """Top-20 bigrams: the n-gram extension of token_freq. Bigram extraction
    is pure Arrow/numpy — adjacent flat-token pairs masked to same-document
    adjacency (parent_indices equality), joined with
    binary_join_element_wise — then the same partial value_counts →
    groupby-sum → tiny sort/limit as token_freq: the shuffle carries
    (bigram, count) partials, never token streams."""

    def partial(b: pa.Table) -> pa.Table:
        t = b["text"]
        if isinstance(t, pa.ChunkedArray):
            t = t.combine_chunks()
        toks = pc.split_pattern_regex(pc.fill_null(t, ""),
                                      pattern=r"[ \t\n\r\f]+")
        flat = _arr(pc.list_flatten(toks))
        par = _arr(pc.list_parent_indices(toks))
        keep = pc.not_equal(flat, "")
        flat, par = flat.filter(keep), par.filter(keep)
        if len(flat) < 2:
            return pa.table({"bigram": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        p = par.to_numpy(zero_copy_only=False)
        same = pa.array(p[:-1] == p[1:])
        left = flat.slice(0, len(flat) - 1).filter(same)
        right = flat.slice(1).filter(same)
        big = pc.binary_join_element_wise(left, right, " ")
        vc = pc.value_counts(big)
        return pa.table({"bigram": vc.field("values"),
                         "n": pc.cast(vc.field("counts"), pa.int64())})

    counted = (_docs(sf_dir, ["text"])
               .map_batches(partial, batch_format="pyarrow")
               .groupby("bigram").aggregate(Sum("n", alias_name="n")))
    return (_cast_int64(counted, ["n"])
            .sort(["n", "bigram"], descending=[True, False]).limit(20))


SQL_BIGRAM_FREQ = """
WITH tl AS (
  SELECT doc_id, list_filter(regexp_split_to_array(text, '[ \t\n\r\f]+'),
                             x -> x <> '') AS tokens
  FROM documents
), toks AS (
  SELECT doc_id, unnest(tokens) AS tok, unnest(range(len(tokens))) AS pos FROM tl
), big AS (
  SELECT tok, lead(tok) OVER (PARTITION BY doc_id ORDER BY pos) AS nxt FROM toks
)
SELECT tok || ' ' || nxt AS bigram, count(*) AS n
FROM big WHERE nxt IS NOT NULL
GROUP BY bigram ORDER BY n DESC, bigram ASC LIMIT 20
"""


def q_pmi_bigrams(sf_dir):
    """Top-20 collocations by pointwise mutual information: pmi(a,b) =
    ln( p(ab) / (p(a)·p(b)) ) over the corpus uni/bigram distributions, with
    a min-count-5 support floor. ONE tokenize pass emits both unigram and
    bigram count partials as prefix-tagged keys (``u:tok`` / ``b:a b``), so a
    single vocabulary-scale shuffle aggregates both layers; the bigram side
    then picks up c(a) and c(b) via two co-partitioned ``lookup_join``s (the
    vocabulary is never broadcast or collected). PMI is quantized to
    nano-units from a fixed IEEE expression (the bm25 pattern), so the DuckDB
    mirror reproduces it bit-for-bit."""
    from ..core.groupops import lookup_join

    def partial(b: pa.Table) -> pa.Table:
        t = b["text"]
        if isinstance(t, pa.ChunkedArray):
            t = t.combine_chunks()
        toks = pc.split_pattern_regex(pc.fill_null(t, ""),
                                      pattern=r"[ \t\n\r\f]+")
        flat = _arr(pc.list_flatten(toks))
        par = _arr(pc.list_parent_indices(toks))
        keep = pc.not_equal(flat, "")
        flat, par = flat.filter(keep), par.filter(keep)
        out_keys, out_n = [], []
        if len(flat):
            vc = pc.value_counts(pc.binary_join_element_wise(
                pa.array(["u:"] * len(flat)), flat, ""))
            out_keys.append(vc.field("values"))
            out_n.append(pc.cast(vc.field("counts"), pa.int64()))
        if len(flat) >= 2:
            p = par.to_numpy(zero_copy_only=False)
            same = pa.array(p[:-1] == p[1:])
            left = flat.slice(0, len(flat) - 1).filter(same)
            right = flat.slice(1).filter(same)
            if len(left):
                # NB: binary_join_element_wise treats its LAST arg as the
                # separator for ALL parts — join the body first, then glue
                # the prefix with an empty separator
                body = pc.binary_join_element_wise(left, right, " ")
                big = pc.binary_join_element_wise(
                    pa.array(["b:"] * len(left)), body, "")
                vcb = pc.value_counts(big)
                out_keys.append(vcb.field("values"))
                out_n.append(pc.cast(vcb.field("counts"), pa.int64()))
        if not out_keys:
            return pa.table({"key": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        return pa.table({"key": pa.concat_arrays(
            [a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a
             for a in out_keys]), "n": pa.concat_arrays(
            [a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a
             for a in out_n])})

    counted = _cast_int64(
        (_docs_wide(sf_dir, ["text"])
         .map_batches(partial, batch_format="pyarrow")
         .groupby("key").aggregate(Sum("n", alias_name="n"))),
        ["n"]).materialize()

    def totals(b: pa.Table) -> pa.Table:
        is_u = pc.starts_with(b["key"], "u:")
        nu = pc.sum(pc.if_else(is_u, b["n"], pa.scalar(0, pa.int64()))).as_py() or 0
        nb = pc.sum(pc.if_else(is_u, pa.scalar(0, pa.int64()), b["n"])).as_py() or 0
        return pa.table({"nu": pa.array([nu], pa.int64()),
                         "nb": pa.array([nb], pa.int64())})

    tot = counted.map_batches(totals, batch_format="pyarrow").take_all()
    n_uni = sum(r["nu"] for r in tot)
    n_bi = sum(r["nb"] for r in tot)

    def unigrams(b: pa.Table) -> pa.Table:
        b = b.filter(pc.starts_with(b["key"], "u:"))
        return pa.table({"gram": pc.utf8_slice_codeunits(b["key"], 2),
                         "c": b["n"]})

    def bigrams(b: pa.Table) -> pa.Table:
        b = b.filter(pc.and_(pc.starts_with(b["key"], "b:"),
                             pc.greater_equal(b["n"], 5)))
        if b.num_rows == 0:
            return pa.table({"bigram": pa.array([], pa.string()),
                             "a": pa.array([], pa.string()),
                             "b": pa.array([], pa.string()),
                             "c_ab": pa.array([], pa.int64())})
        body = pc.utf8_slice_codeunits(b["key"], 2)
        parts = pc.split_pattern(body, pattern=" ")
        flat = _arr(pc.list_flatten(parts))
        ev = pa.array(np.arange(0, 2 * b.num_rows, 2, dtype=np.int64))
        od = pa.array(np.arange(1, 2 * b.num_rows, 2, dtype=np.int64))
        return pa.table({"bigram": body, "a": flat.take(ev),
                         "b": flat.take(od), "c_ab": b["n"]})

    uni = counted.map_batches(unigrams, batch_format="pyarrow")
    big = counted.map_batches(bigrams, batch_format="pyarrow")

    def pmi(b: pa.Table) -> pa.Table:
        cab = b["c_ab"].to_numpy(zero_copy_only=False).astype(np.float64)
        ca = b["c_a"].to_numpy(zero_copy_only=False).astype(np.float64)
        cb = b["c_b"].to_numpy(zero_copy_only=False).astype(np.float64)
        # fixed IEEE op order, mirrored token-for-token in SQL_PMI_BIGRAMS
        val = np.log((cab / n_bi) / ((ca / n_uni) * (cb / n_uni)))
        e9 = np.floor(val * 1e9 + 0.5).astype(np.int64)
        return pa.table({"bigram": b["bigram"], "c_ab": b["c_ab"],
                         "pmi_e9": pa.array(e9)})

    # bounded-vocab guard (the lm_doc_score broadcast pattern): two extra
    # co-partition exchanges cost ~2-3 s each in fixed all-to-all latency —
    # when the unigram table is small, ship it once via ray.put and attach
    # c(a)/c(b) with an in-batch index_in probe (identical counts, identical
    # floats; the join path below remains the open-vocabulary scale path)
    if counted.count() <= 2_000_000:
        utbl = pa.concat_tables(list(uni.iter_batches(batch_format="pyarrow")))
        uref = ray.put((utbl["gram"].combine_chunks(),
                        utbl["c"].to_numpy(zero_copy_only=False)))

        def attach(b: pa.Table) -> pa.Table:
            grams, cvals = ray.get(uref)
            ia = pc.index_in(b["a"], value_set=grams)
            ib = pc.index_in(b["b"], value_set=grams)
            if ia.null_count or ib.null_count:
                raise AssertionError("pmi broadcast probe missed a gram")
            b = b.append_column("c_a", pa.array(
                cvals[ia.to_numpy(zero_copy_only=False)], pa.int64()))
            return b.append_column("c_b", pa.array(
                cvals[ib.to_numpy(zero_copy_only=False)], pa.int64()))

        scored = big.map_batches(attach, batch_format="pyarrow")
    else:
        # explicit schemas: letting lookup_join probe them would re-execute
        # the first join's whole shuffle just to see one block of the
        # second's input
        big_schema = pa.schema([("bigram", pa.string()), ("a", pa.string()),
                                ("b", pa.string()), ("c_ab", pa.int64())])
        uni_schema = pa.schema([("gram", pa.string()), ("c", pa.int64())])
        scored = lookup_join(big, uni, "a", "gram", "c", out_col="c_a",
                             schema=big_schema, kv_schema=uni_schema)
        scored = lookup_join(scored, uni, "b", "gram", "c", out_col="c_b",
                             schema=big_schema.append(
                                 pa.field("c_a", pa.int64())),
                             kv_schema=uni_schema)

    return (scored.map_batches(pmi, batch_format="pyarrow")
            .sort(["pmi_e9", "bigram"], descending=[True, False]).limit(20))


SQL_PMI_BIGRAMS = """
WITH tl AS (
  SELECT doc_id, list_filter(regexp_split_to_array(text, '[ \t\n\r\f]+'),
                             x -> x <> '') AS tokens
  FROM documents
), toks AS (
  SELECT doc_id, unnest(tokens) AS tok, unnest(range(len(tokens))) AS pos FROM tl
), uni AS (
  SELECT tok, count(*) AS c FROM toks GROUP BY tok
), nuni AS (SELECT count(*) AS n FROM toks
), pairs AS (
  SELECT tok, lead(tok) OVER (PARTITION BY doc_id ORDER BY pos) AS nxt FROM toks
), bigc AS (
  SELECT tok AS a, nxt AS b, count(*) AS c_ab FROM pairs
  WHERE nxt IS NOT NULL GROUP BY tok, nxt
), nbig AS (SELECT count(*) AS n FROM pairs WHERE nxt IS NOT NULL)
SELECT g.a || ' ' || g.b AS bigram, g.c_ab,
       CAST(floor(
         ln((CAST(g.c_ab AS DOUBLE) / nb.n)
            / ((CAST(ua.c AS DOUBLE) / nu.n) * (CAST(ub.c AS DOUBLE) / nu.n)))
         * 1.0e9 + 0.5e0) AS BIGINT) AS pmi_e9
FROM bigc g
JOIN uni ua ON g.a = ua.tok
JOIN uni ub ON g.b = ub.tok
CROSS JOIN nuni nu CROSS JOIN nbig nb
WHERE g.c_ab >= 5
ORDER BY pmi_e9 DESC, bigram ASC LIMIT 20
"""


def q_lm_doc_score(sf_dir):
    """Corpus-bigram-LM log-likelihood per document — the CCNet quality signal
    (Wenzek et al. 2019, arXiv 1911.00359) engine-native: LM built in one
    vocabulary-scale shuffle, docs scored via two co-partitioned lookup_joins
    (vocabulary never broadcast), per-position contributions nano-quantized
    before the order-free int64 sum (``functions/lm.py``)."""
    from ..functions.lm import lm_bigram_score

    return lm_bigram_score(_docs_wide(sf_dir, ["doc_id", "text"]))


SQL_LM_DOC_SCORE = """
WITH tl AS (
  SELECT doc_id, list_filter(regexp_split_to_array(text, '[ \t\n\r\f]+'),
                             x -> x <> '') AS tokens
  FROM documents
), toks AS (
  SELECT doc_id, unnest(tokens) AS tok, unnest(range(len(tokens))) AS pos FROM tl
), uni AS (
  SELECT tok, count(*) AS c FROM toks GROUP BY tok
), pairs AS (
  SELECT doc_id, tok AS a, lead(tok) OVER (PARTITION BY doc_id ORDER BY pos) AS b
  FROM toks
), bg AS (
  SELECT doc_id, a, b FROM pairs WHERE b IS NOT NULL
), bigc AS (
  SELECT a, b, count(*) AS c_ab FROM bg GROUP BY a, b
)
SELECT bg.doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
       CAST(sum(CAST(floor(ln(CAST(c.c_ab AS DOUBLE) / CAST(u.c AS DOUBLE))
                           * 1.0e9 + 0.5e0) AS BIGINT)) AS BIGINT) AS ll_e9
FROM bg JOIN bigc c ON bg.a = c.a AND bg.b = c.b
JOIN uni u ON bg.a = u.tok
GROUP BY bg.doc_id
"""


def q_ccnet_tiers(sf_dir):
    """CCNet-style quality tiering (Wenzek et al. 2019 §4.4: bucket the corpus
    into head/middle/tail by LM score): per-doc average bigram-LM
    log-likelihood (floor of an IEEE division of the two int64s from
    ``lm_doc_score`` — bit-identical across engines), quartile cuts from the
    exact distributed quantile pass, then a stateless tier label. The tier
    CUTS are data-derived by the engine, mirroring how CCNet derives them
    from the corpus percentiles."""
    from ..functions.lm import lm_bigram_score

    scored = lm_bigram_score(_docs_wide(sf_dir, ["doc_id", "text"])).materialize()

    def avg(b: pa.Table) -> pa.Table:
        ll = b["ll_e9"].to_numpy(zero_copy_only=False).astype(np.float64)
        n = b["n_bigrams"].to_numpy(zero_copy_only=False).astype(np.float64)
        a = np.floor(ll / n).astype(np.int64)
        return pa.table({"doc_id": b["doc_id"],
                         "avg_ll_e9": pa.array(a, pa.int64())})

    av = scored.map_batches(avg, batch_format="pyarrow").materialize()
    lo, hi = _exact_disc_quantiles(av, "avg_ll_e9", [0.25, 0.75])

    def tier(b: pa.Table) -> pa.Table:
        a = b["avg_ll_e9"].to_numpy(zero_copy_only=False)
        t = np.where(a >= hi, "head", np.where(a <= lo, "tail", "middle"))
        return b.append_column("tier", pa.array(t.tolist(), pa.string()))

    return av.map_batches(tier, batch_format="pyarrow")


SQL_CCNET_TIERS = f"""
WITH lmres AS ({SQL_LM_DOC_SCORE}),
score AS (
  SELECT doc_id, CAST(floor(CAST(ll_e9 AS DOUBLE) / CAST(n_bigrams AS DOUBLE))
                      AS BIGINT) AS avg_ll_e9
  FROM lmres),
cuts AS (SELECT quantile_disc(avg_ll_e9, 0.25) AS lo,
                quantile_disc(avg_ll_e9, 0.75) AS hi FROM score)
SELECT doc_id, avg_ll_e9,
       CASE WHEN avg_ll_e9 >= hi THEN 'head'
            WHEN avg_ll_e9 <= lo THEN 'tail'
            ELSE 'middle' END AS tier
FROM score CROSS JOIN cuts
"""


def q_approx_token_topk(sf_dir):
    """Approximate heavy hitters via a mergeable Misra-Gries summary — the
    sketch-path companion to the exact `token_freq` (whose (token, count)
    partials are fine for a bounded vocabulary but degenerate on open
    vocabularies / n-gram spaces at 100 TB): each batch ships <= m counter
    pairs regardless of cardinality. SQL-hash-checked: a Misra-Gries summary
    is provably EXACT (every lower bound equals the true count, err = 0)
    whenever the stream's distinct-key count never exceeds m — no counter is
    ever decremented — and this corpus has a bounded vocabulary (31 distinct
    tokens at every sf) far under m=512, so the mirror is the exact top-10 by
    (count desc, token asc) with n_min = count and err = 0. At open-vocabulary
    scale the operator degrades gracefully to its approximation bounds
    (`tests/test_sketch_clusters` pins bound/merge behavior)."""
    from ..functions.sketch import approx_topk

    def explode(b: pa.Table) -> pa.Table:
        t = b["text"]
        if isinstance(t, pa.ChunkedArray):
            t = t.combine_chunks()
        toks = pc.split_pattern_regex(pc.fill_null(t, ""),
                                      pattern=r"[ \t\n\r\f]+")
        flat = _arr(pc.list_flatten(toks))
        return pa.table({"tok": flat.filter(pc.not_equal(flat, ""))})

    toks = _docs(sf_dir, ["text"]).map_batches(explode, batch_format="pyarrow")
    return approx_topk(toks, "tok", k=10, m=512)


# Valid while distinct tokens <= m (Misra-Gries exactness; see docstring).
SQL_APPROX_TOKEN_TOPK = """
WITH toks AS (
  SELECT unnest(list_filter(regexp_split_to_array(text, '[ \t\n\r\f]+'),
                            x -> x <> '')) AS tok
  FROM documents),
cnt AS (SELECT tok, count(*) AS n FROM toks GROUP BY tok)
SELECT tok AS key, CAST(n AS BIGINT) AS n_min, CAST(0 AS BIGINT) AS err
FROM cnt ORDER BY n DESC, tok LIMIT 10
"""


def q_repetition_stats(sf_dir):
    """Gopher-style repetition quality signals (Rae et al. 2021,
    arXiv 2112.11446 §A.1.1): per-document duplicated-trigram counts and the
    most-frequent word bigram — the raw inputs of the "fraction of characters
    in duplicate n-grams / in the most common n-gram" filters used to drop
    templated or boilerplate text from web-scale training corpora. The filter
    itself is then a trivial predicate over this table.

    Shuffle-free by construction: every statistic depends only on the
    document's own token stream, so the whole operator is ONE vectorized
    map_batches pass — RE2 tokenize, same-document adjacency masks over the
    flat token stream (the bigram_freq kernel), per-doc total/distinct
    trigram counts via Arrow group_by count/count_distinct, and the per-doc
    argmax bigram via a C-level multi-key sort + first-occurrence mask.
    Integer/string outputs keep the DuckDB mirror hash-exact."""

    def stats(b: pa.Table) -> pa.Table:
        n = b.num_rows
        t = b["text"]
        if isinstance(t, pa.ChunkedArray):
            t = t.combine_chunks()
        toks = pc.split_pattern_regex(pc.fill_null(t, ""),
                                      pattern=r"[ \t\n\r\f]+")
        flat = _arr(pc.list_flatten(toks))
        par = _arr(pc.list_parent_indices(toks))
        keep = pc.not_equal(flat, "")
        flat, par = flat.filter(keep), par.filter(keep)
        p = par.to_numpy(zero_copy_only=False)
        n_tokens = np.bincount(p, minlength=n).astype(np.int64)
        n_tri = np.zeros(n, np.int64)
        n_tri_d = np.zeros(n, np.int64)
        top_g = np.full(n, "", dtype=object)
        top_n = np.zeros(n, np.int64)
        if len(flat) >= 2:
            same2 = p[:-1] == p[1:]
            m2 = pa.array(same2)
            big = pc.binary_join_element_wise(
                flat.slice(0, len(flat) - 1).filter(m2),
                flat.slice(1).filter(m2), " ")
            counted = (pa.table({"d": pa.array(p[:-1][same2]), "g": big})
                       .group_by(["d", "g"]).aggregate([("g", "count")])
                       .sort_by([("d", "ascending"), ("g_count", "descending"),
                                 ("g", "ascending")]))
            dv = counted["d"].to_numpy(zero_copy_only=False)
            first = np.ones(len(dv), bool)
            first[1:] = dv[1:] != dv[:-1]
            sel = counted.take(pa.array(np.flatnonzero(first)))
            sd = sel["d"].to_numpy(zero_copy_only=False)
            top_g[sd] = np.asarray(sel["g"].to_pylist(), dtype=object)
            top_n[sd] = sel["g_count"].to_numpy(zero_copy_only=False)
        if len(flat) >= 3:
            same3 = (p[:-2] == p[1:-1]) & (p[1:-1] == p[2:])
            m3 = pa.array(same3)
            tri = pc.binary_join_element_wise(
                flat.slice(0, len(flat) - 2).filter(m3),
                flat.slice(1, len(flat) - 2).filter(m3),
                flat.slice(2).filter(m3), " ")
            tt = (pa.table({"d": pa.array(p[:-2][same3]), "g": tri})
                  .group_by(["d"])
                  .aggregate([("g", "count"), ("g", "count_distinct")]))
            td = tt["d"].to_numpy(zero_copy_only=False)
            n_tri[td] = tt["g_count"].to_numpy(zero_copy_only=False)
            n_tri_d[td] = tt["g_count_distinct"].to_numpy(zero_copy_only=False)
        return pa.table({
            "doc_id": pc.cast(b["doc_id"], pa.int64()),
            "n_tokens": pa.array(n_tokens),
            "n_trigrams": pa.array(n_tri),
            "n_distinct_trigrams": pa.array(n_tri_d),
            "top_bigram": pa.array(top_g.tolist(), pa.string()),
            "top_bigram_n": pa.array(top_n),
        })

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        stats, batch_format="pyarrow")


SQL_REPETITION_STATS = """
WITH tl AS (
  SELECT doc_id, list_filter(regexp_split_to_array(text, '[ \t\n\r\f]+'),
                             x -> x <> '') AS t
  FROM documents
), toks AS (
  SELECT doc_id, unnest(t) AS tok, unnest(range(len(t))) AS pos FROM tl
), big AS (
  SELECT doc_id,
         tok || ' ' || lead(tok) OVER (PARTITION BY doc_id ORDER BY pos) AS g
  FROM toks QUALIFY g IS NOT NULL
), bigc AS (
  SELECT doc_id, g, count(*) AS ng FROM big GROUP BY doc_id, g
), topb AS (
  SELECT doc_id, g, ng FROM bigc
  QUALIFY row_number() OVER (PARTITION BY doc_id ORDER BY ng DESC, g ASC) = 1
), tri AS (
  SELECT doc_id,
         tok || ' ' || lead(tok, 1) OVER w || ' ' || lead(tok, 2) OVER w AS g
  FROM toks WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
  QUALIFY g IS NOT NULL
), tric AS (
  SELECT doc_id, count(*) AS n_tri, count(DISTINCT g) AS n_tri_d
  FROM tri GROUP BY doc_id
)
SELECT tl.doc_id,
       CAST(len(tl.t) AS BIGINT) AS n_tokens,
       CAST(COALESCE(tric.n_tri, 0) AS BIGINT) AS n_trigrams,
       CAST(COALESCE(tric.n_tri_d, 0) AS BIGINT) AS n_distinct_trigrams,
       COALESCE(topb.g, '') AS top_bigram,
       CAST(COALESCE(topb.ng, 0) AS BIGINT) AS top_bigram_n
FROM tl
LEFT JOIN topb ON tl.doc_id = topb.doc_id
LEFT JOIN tric ON tl.doc_id = tric.doc_id
"""


def q_sequence_pack(sf_dir):
    """GPT-style sequence packing: assign every document a token-position
    range in the concatenated corpus stream (ascending doc_id) and the
    fixed-size training windows (budget=512) it lands in. The global token
    offset is a distributed weighted prefix sum — functions/pack.py
    (histogram pass + broadcast bucket offsets + one co-partition); only
    (doc_id, n_toks) ever moves."""
    from ..functions.pack import pack_assign
    from ..functions.textstats import TOKEN_PAT

    def toks(b: pa.Table) -> pa.Table:
        n = pc.cast(pc.count_substring_regex(
            pc.fill_null(b["text"], ""), pattern=TOKEN_PAT), pa.int64())
        return pa.table({"doc_id": pc.cast(b["doc_id"], pa.int64()),
                         "w": n})

    ds = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        toks, batch_format="pyarrow")
    return pack_assign(ds, "doc_id", "w", budget=512)


SQL_SEQUENCE_PACK = """
WITH d AS (
  SELECT doc_id,
         CAST(len(list_filter(regexp_split_to_array(text, '[ \t\n\r\f]+'),
                              x -> x <> '')) AS BIGINT) AS n_toks
  FROM documents
), c AS (
  SELECT doc_id, n_toks,
         CAST(COALESCE(sum(n_toks) OVER (ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
           AS start_tok
  FROM d
)
SELECT doc_id, n_toks, start_tok, start_tok + n_toks AS end_tok,
       start_tok // 512 AS first_pack,
       CASE WHEN n_toks > 0 THEN (start_tok + n_toks - 1) // 512
            ELSE start_tok // 512 END AS last_pack
FROM c
"""


def q_quantity_quantiles(sf_dir):
    """Exact distributed discrete quantiles over a low-cardinality integer
    domain: per-batch value_counts partials collapse the fact table to
    (value, count) — the shuffle moves one row per distinct value per batch —
    then a single-partition final pass walks the cumulative histogram.
    DuckDB ``quantile_disc`` semantics pinned empirically: the value at
    0-based index ceil(n*q)-1 of the sorted multiset, i.e. the smallest v
    with cum_count >= ceil(n*q). (For high-cardinality/float domains the
    scale path is a sketch, e.g. KLL — this operator is the exact companion
    for bounded domains like quantities, ratings, status codes.)"""
    QS = [("p25", 0.25), ("p50", 0.50), ("p75", 0.75), ("p90", 0.90)]

    def partial(b: pa.Table) -> pa.Table:
        v = pc.cast(pc.round(b["l_quantity"]), pa.int64())
        vc = pc.value_counts(v.combine_chunks() if isinstance(v, pa.ChunkedArray) else v)
        return pa.table({"v": vc.field("values"),
                         "n": pc.cast(vc.field("counts"), pa.int64())})

    hist = (_t(sf_dir, "lineitem", ["l_quantity"])
            .map_batches(partial, batch_format="pyarrow")
            .groupby("v").aggregate(Sum("n", alias_name="n")))

    def pick(b: pa.Table) -> pa.Table:
        order = pc.sort_indices(b["v"])
        v = pc.take(b["v"], order).to_numpy(zero_copy_only=False)
        n = pc.take(pc.cast(pc.round(b["n"]), pa.int64()), order).to_numpy(
            zero_copy_only=False)
        cum = np.cumsum(n)
        total = int(cum[-1]) if len(cum) else 0
        qs, vals = [], []
        for name, q in QS:
            rank = int(np.ceil(total * q))
            qs.append(name)
            vals.append(int(v[np.searchsorted(cum, rank)]))
        return pa.table({"q": pa.array(qs), "value": pa.array(vals, pa.int64())})

    return hist.repartition(1).map_batches(pick, batch_format="pyarrow",
                                           batch_size=None)


def _exact_disc_quantiles(ds, col: str, qs: list[float]) -> list[int]:
    """Exact ``quantile_disc`` cut values of an integer column, distributed:
    per-batch value_counts partials → bounded (value, count) groupby → one
    tiny driver-side cumulative walk (the `quantity_quantiles` machinery as a
    reusable helper). Driver sees one row per DISTINCT value — fine for
    bounded domains (lengths, ratings, codes); use the KLL sketch for
    unbounded/float columns."""

    def partial(b: pa.Table) -> pa.Table:
        v = b[col].combine_chunks()
        vc = pc.value_counts(v)
        return pa.table({"v": vc.field("values"),
                         "n": pc.cast(vc.field("counts"), pa.int64())})

    rows = (ds.map_batches(partial, batch_format="pyarrow")
            .groupby("v").aggregate(Sum("n", alias_name="n")).take_all())
    rows.sort(key=lambda r: r["v"])
    v = np.array([r["v"] for r in rows], dtype=np.int64)
    cum = np.cumsum([r["n"] for r in rows], dtype=np.int64)
    total = int(cum[-1]) if len(cum) else 0
    return [int(v[np.searchsorted(cum, int(np.ceil(total * q)))]) for q in qs]


def q_length_outliers(sf_dir):
    """Length-outlier filter with DATA-DERIVED cuts: documents whose n_chars
    falls outside the corpus's exact [p05, p95] — the standard pre-training
    length filter, with the cut values computed by the engine itself (exact
    distributed quantile pass) rather than hard-coded. Two streamed passes:
    a bounded (value, count) histogram, then a stateless filter."""
    ds = _t(sf_dir, "documents", ["doc_id", "n_chars"])
    lo, hi = _exact_disc_quantiles(ds, "n_chars", [0.05, 0.95])

    def f(b: pa.Table) -> pa.Table:
        keep = pc.or_(pc.less(b["n_chars"], lo), pc.greater(b["n_chars"], hi))
        return b.filter(keep)

    return ds.map_batches(f, batch_format="pyarrow")


SQL_LENGTH_OUTLIERS = """
WITH b AS (SELECT quantile_disc(n_chars, 0.05) AS lo,
                  quantile_disc(n_chars, 0.95) AS hi FROM documents)
SELECT doc_id, n_chars FROM documents CROSS JOIN b
WHERE n_chars < lo OR n_chars > hi
"""


SQL_QUANTITY_QUANTILES = """
SELECT 'p25' AS q, quantile_disc(CAST(l_quantity AS BIGINT), 0.25) AS value FROM lineitem
UNION ALL SELECT 'p50', quantile_disc(CAST(l_quantity AS BIGINT), 0.50) FROM lineitem
UNION ALL SELECT 'p75', quantile_disc(CAST(l_quantity AS BIGINT), 0.75) FROM lineitem
UNION ALL SELECT 'p90', quantile_disc(CAST(l_quantity AS BIGINT), 0.90) FROM lineitem
"""


def q_chunk_windows(sf_dir):
    """Sliding-window token chunking (window=32, stride=24) — the LLM
    context-packing shaping op. Shuffle-free single pass; the overlapping
    windows are gathered with one vectorized take over the flat token stream
    (``functions/chunk.py``). The DuckDB mirror reproduces the convention with
    regexp_split + range(0, n, stride) + 1-based inclusive list slices, so the
    hash check pins chunk boundaries AND the joined chunk text itself."""
    from ..functions.chunk import chunk_batch

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        lambda b: chunk_batch(b, window=32, stride=24), batch_format="pyarrow")


SQL_CHUNK_WINDOWS = """
WITH tl AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(text, '[ \t\n\r\f]+'),
                     x -> x <> '') AS toks
  FROM documents),
st AS (
  SELECT doc_id, toks, unnest(range(0, len(toks), 24)) AS s
  FROM tl WHERE len(toks) > 0)
SELECT doc_id, CAST(s // 24 AS BIGINT) AS chunk_id,
       CAST(least(32, len(toks) - s) AS BIGINT) AS n_tokens,
       array_to_string(toks[s + 1 : least(s + 32, len(toks))], ' ') AS chunk
FROM st
"""


def _ensure_index(sf_dir) -> str:
    """Build-once cache of the persisted inverted index for a corpus, keyed by
    corpus path + a content fingerprint (row count + source file mtime/size —
    a regenerated corpus with the same row count must NOT reuse a stale index)
    + schema version (v2 = tf/dl-carrying postings + meta.json; a stale v1
    cache lacks the BM25 columns)."""
    import pyarrow.parquet as _pq

    from ..functions.index import build_inverted_index

    src = os.path.join(sf_dir, "documents.parquet")
    n_docs = _pq.read_metadata(src).num_rows
    st = os.stat(src)
    fp = f"{n_docs}-{st.st_mtime_ns}-{st.st_size}"
    tag = os.path.normpath(sf_dir).replace(os.sep, "_")
    idx_dir = f"/tmp/graft_index/{tag}-{fp}-v2"
    if not os.path.exists(os.path.join(idx_dir, "_DONE")):
        import shutil

        shutil.rmtree(idx_dir, ignore_errors=True)
        build_inverted_index(_docs(sf_dir, ["doc_id", "text"]), idx_dir)
        with open(os.path.join(idx_dir, "_DONE"), "w") as f:
            f.write("ok")
    return idx_dir


def _ensure_fp_index(sf_dir) -> str:
    """Build-once cache of the persisted exact-dedup fingerprint index
    (``functions/incremental.py``), keyed like ``_ensure_index``."""
    import pyarrow.parquet as _pq

    from ..functions.incremental import build_fingerprint_index

    src = os.path.join(sf_dir, "documents.parquet")
    st = os.stat(src)
    fp = f"{_pq.read_metadata(src).num_rows}-{st.st_mtime_ns}-{st.st_size}"
    tag = os.path.normpath(sf_dir).replace(os.sep, "_")
    idx_dir = f"/tmp/graft_fpindex/{tag}-{fp}-v2"
    if not os.path.exists(os.path.join(idx_dir, "_DONE")):
        import shutil

        shutil.rmtree(idx_dir, ignore_errors=True)
        build_fingerprint_index(_docs(sf_dir, ["text"]), idx_dir)
        with open(os.path.join(idx_dir, "_DONE"), "w") as f:
            f.write("ok")
    return idx_dir


def q_incremental_novel(sf_dir):
    """Streaming-ingest dedup: a synthetic increment (even doc_ids keep their
    corpus text = known dups; odd doc_ids get a deterministic novel suffix) is
    filtered against the PERSISTED corpus fingerprint index — each reducer
    reads only its own part=N fingerprint files; the corpus itself is never
    re-shuffled or re-read per increment (``functions/incremental.py``)."""
    from ..functions.incremental import novel_against_index

    idx = _ensure_fp_index(sf_dir)

    def increment(b: pa.Table) -> pa.Table:
        did = b["doc_id"]
        odd = pc.equal(pc.bit_wise_and(did, pa.scalar(1, pa.int64())),
                       pa.scalar(1, pa.int64()))
        suffix = pc.binary_join_element_wise(
            pa.array(["-novel-"] * b.num_rows),
            pc.cast(did, pa.string()), "")
        t = pc.if_else(odd,
                       pc.binary_join_element_wise(
                           pc.fill_null(b["text"], ""), suffix, ""),
                       b["text"])
        return pa.table({"doc_id": did, "text": t})

    inc = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        increment, batch_format="pyarrow")
    return novel_against_index(inc, idx).select_columns(["doc_id"])


def _ensure_band_index(sf_dir) -> str:
    """Build-once cache of the persisted banded-MinHash near-dup index over
    the EVEN-doc_id half of the corpus (keyed like ``_ensure_fp_index``)."""
    import pyarrow.parquet as _pq

    from ..functions.incremental import build_band_index

    src = os.path.join(sf_dir, "documents.parquet")
    st = os.stat(src)
    fp = f"{_pq.read_metadata(src).num_rows}-{st.st_mtime_ns}-{st.st_size}"
    tag = os.path.normpath(sf_dir).replace(os.sep, "_")
    idx_dir = f"/tmp/graft_bandindex/{tag}-{fp}-v1"
    if not os.path.exists(os.path.join(idx_dir, "_DONE")):
        import shutil

        shutil.rmtree(idx_dir, ignore_errors=True)

        def even(b: pa.Table) -> pa.Table:
            return b.filter(pc.equal(
                pc.bit_wise_and(b["doc_id"], pa.scalar(1, pa.int64())),
                pa.scalar(0, pa.int64())))

        build_band_index(_docs(sf_dir, ["doc_id", "text"]).map_batches(
            even, batch_format="pyarrow"), idx_dir)
        with open(os.path.join(idx_dir, "_DONE"), "w") as f:
            f.write("ok")
    return idx_dir


def q_incremental_near_dup(sf_dir):
    """Streaming-ingest NEAR-dup: odd-doc_id docs (the increment) probed
    against the PERSISTED banded-MinHash witness index of the even-doc_id
    corpus — each reducer reads only its own part=N band rows; corpus
    signatures never re-shuffle per increment
    (``functions/incremental.py::near_dup_against_index``). Pairs keep the
    `minhash_band_pairs` rule (band-tuple equality, >= 8/16 positions agree),
    so the mirror recomputes both sides' signatures in pure SQL."""
    from ..functions.incremental import near_dup_against_index

    idx = _ensure_band_index(sf_dir)

    def odd(b: pa.Table) -> pa.Table:
        return b.filter(pc.equal(
            pc.bit_wise_and(b["doc_id"], pa.scalar(1, pa.int64())),
            pa.scalar(1, pa.int64())))

    inc = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        odd, batch_format="pyarrow")
    return near_dup_against_index(inc, idx, min_agree=8)


SQL_INCREMENTAL_NOVEL = """
WITH inc AS (
  SELECT doc_id, CASE WHEN doc_id % 2 = 1
                      THEN COALESCE(text, '') || '-novel-'
                           || CAST(doc_id AS VARCHAR)
                      ELSE COALESCE(text, '') END AS t
  FROM documents)
SELECT doc_id FROM inc
WHERE t NOT IN (SELECT COALESCE(text, '') FROM documents)
"""


def q_bm25_topk(sf_dir):
    """BM25 ranked retrieval (top-10) over the persisted index: pruned
    partition read, join-free scoring off the denormalized per-posting
    (tf, dl), tiny candidate-set groupby + sort-limit. SQL-hash-checked via
    ``integer_scores``: each per-(term, doc) contribution is quantized to
    nano-units before the distributed sum, so the per-doc score is an exact
    order-free int64 that the DuckDB full-scan BM25 mirror reproduces
    bit-for-bit (float semantics stay pinned by
    ``tests/test_index.py::test_bm25_matches_oracle``)."""
    from ..functions.index import bm25_search

    return bm25_search(_ensure_index(sf_dir), ["spark", "window", "stream"],
                       top_k=10, integer_scores=True)


# Mirrors bm25_search's arithmetic ORDER exactly (all constants e-notation so
# DuckDB parses them as DOUBLE, not DECIMAL): idf = ln(((N - df) + 0.5)/(df +
# 0.5) + 1.0); s = ((idf*tf)*(1.2+1.0)) / (tf + 1.2*((1.0-0.75) +
# ((0.75*dl)/avgdl))); avgdl = n_tokens/n_docs as one double division. The
# quantization floor(s*1e9 + 0.5) matches np.floor half-away on the positive
# scores, making sum(c) an exact integer on both engines.
SQL_BM25_TOPK = """
WITH tl AS (
  SELECT doc_id, list_filter(regexp_split_to_array(text, '[ \t\n\r\f]+'),
                             x -> x <> '') AS toks
  FROM documents),
tok AS (
  SELECT doc_id, unnest(toks) AS tok, len(toks) AS dl
  FROM tl WHERE len(toks) > 0),
stats AS (
  SELECT count(DISTINCT doc_id) AS n_docs, count(*) AS n_tokens FROM tok),
tf AS (
  SELECT doc_id, tok, count(*) AS tf, any_value(dl) AS dl FROM tok
  WHERE tok IN ('spark', 'window', 'stream') GROUP BY doc_id, tok),
df AS (
  SELECT tok, count(*) AS df FROM tf GROUP BY tok),
contrib AS (
  SELECT f.doc_id,
         CAST(floor(
           ((ln((((s.n_docs - d.df) + 0.5e0) / (d.df + 0.5e0)) + 1.0e0)
             * f.tf) * (1.2e0 + 1.0e0))
           / (f.tf + (1.2e0 * ((1.0e0 - 0.75e0)
              + ((0.75e0 * f.dl) / (CAST(s.n_tokens AS DOUBLE) / s.n_docs)))))
           * 1.0e9 + 0.5e0) AS BIGINT) AS c
  FROM tf f JOIN df d ON f.tok = d.tok CROSS JOIN stats s),
scored AS (
  SELECT doc_id, CAST(sum(c) AS BIGINT) AS score_e9 FROM contrib GROUP BY doc_id)
SELECT doc_id, score_e9,
       CAST(row_number() OVER (ORDER BY score_e9 DESC, doc_id) AS BIGINT) AS rank
FROM scored ORDER BY score_e9 DESC, doc_id LIMIT 10
"""


def q_term_search(sf_dir):
    """Conjunctive retrieval over the persisted inverted index
    (``functions/index.py``): build once per corpus (cached under /tmp keyed
    by corpus path + row count), then answer ``spark AND window`` by reading
    ONLY the ≤2 hash partitions the terms live in and intersecting posting
    lists via a groupby-count — never a full-corpus scan per query, and never
    a driver-side set intersection. The DuckDB mirror is the direct
    full-scan predicate, so the hash check proves index build + pruned
    lookup ≡ scan."""
    from ..functions.index import search_index

    return search_index(_ensure_index(sf_dir), ["spark", "window"])


SQL_TERM_SEARCH = """
WITH tl AS (
  SELECT doc_id, list_filter(regexp_split_to_array(text, '[ \t\n\r\f]+'),
                             x -> x <> '') AS toks
  FROM documents)
SELECT doc_id FROM tl
WHERE list_contains(toks, 'spark') AND list_contains(toks, 'window')
"""


def q_exact_dedup(sf_dir):
    return dd.exact_dedup(_docs(sf_dir, ["doc_id", "text"]))


SQL_EXACT_DEDUP = """
SELECT sha256(text) AS text_sha, min(doc_id) AS doc_id, count(*) AS n_dupes
FROM documents GROUP BY text
"""


def q_minhash_pairs(sf_dir):
    """MinHash+LSH near-dup candidate pairs. Rows-only: the production
    signatures hash grams with blake2b and mix mod 2^64 (process-stable,
    DuckDB-inexpressible — u64 products overflow HUGEINT); recall/determinism
    is pytest-pinned (tests/test_dedup.py), resolved clusters are
    SQL-hash-checked downstream via `dup_clusters`/`near_dedup_resolve`, and
    the signature math itself is SQL-hash-checked via the mod-M witness
    `minhash_sigs`."""
    return dd.minhash_lsh_pairs(_docs(sf_dir, ["doc_id", "text"]), threshold=0.5)


def q_minhash_sigs(sf_dir):
    """SQL-hash-checked witness for the MinHash family: k=16 signatures in
    long (doc_id, perm, sig) form, computed entirely mod M = 2^61-1 over
    md5-low-64 token hashes (= DuckDB ``md5_number_lower``) so DuckDB
    reproduces every signature bit-for-bit in HUGEINT (operands < 2^61 keep
    products < 2^122). One shuffle-free actor-pool pass
    (``functions/dedup_witness.py``); constants are pinned literals on both
    engines; exactness vs an arbitrary-precision reference is also
    pytest-pinned (tests/test_dedup_witness.py)."""
    from ..functions.dedup_witness import minhash_sigs_m61

    return minhash_sigs_m61(_docs(sf_dir, ["doc_id", "text"]))


SQL_MINHASH_SIGS = """
WITH docs AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(text, '[ \t\n\r\f]+'),
                     x -> x <> '') AS toks
  FROM documents),
tok AS (
  SELECT doc_id, unnest(toks) AS tok, generate_subscripts(toks, 1) AS pos,
         len(toks) AS n
  FROM docs),
th AS (
  SELECT doc_id, pos, n,
         CAST(md5_number_lower(tok) AS HUGEINT) % 2305843009213693951 AS t
  FROM tok),
sh AS (
  SELECT a.doc_id,
         (a.t * 2177342782468422681
          + COALESCE(b.t * 2258633747088074174, 0)
          + COALESCE(c.t * 1499779743744070127, 0))
           % 2305843009213693951 AS h
  FROM th a
  LEFT JOIN th b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
  LEFT JOIN th c ON c.doc_id = a.doc_id AND c.pos = a.pos + 2
  WHERE a.pos <= greatest(a.n - 2, 1)
  UNION ALL
  SELECT doc_id, CAST(0 AS HUGEINT) FROM docs WHERE len(toks) = 0),
params(perm, a, b) AS (VALUES
  (0, 161783044969865361, 616059259915317539),
  (1, 1253037630038414346, 294708338141792757),
  (2, 1211691016609570074, 963279562875064661),
  (3, 112487526851420348, 416790898057187056),
  (4, 1147494184003706799, 1885484957211360197),
  (5, 341655084064371734, 2068438985766178347),
  (6, 1682263752012145498, 112368096118177428),
  (7, 582533385370489606, 1662039512607195119),
  (8, 1918770616093810682, 97970066371827807),
  (9, 919077091889351839, 176139585570932298),
  (10, 2011408697998162808, 1578416310055072854),
  (11, 1079365583683518842, 2166721399582613053),
  (12, 320630544007800531, 45263012668960698),
  (13, 993455726057165935, 2304943031768533190),
  (14, 1053813949153199038, 1314145847639288079),
  (15, 29507949709329712, 156299750599766892))
SELECT s.doc_id, CAST(p.perm AS BIGINT) AS perm,
       CAST(min((CAST(p.a AS HUGEINT) * s.h + p.b)
                % 2305843009213693951) AS BIGINT) AS sig
FROM sh s CROSS JOIN params p
GROUP BY s.doc_id, p.perm
"""


def q_minhash_band_pairs(sf_dir):
    """FULLY SQL-hash-checked LSH pair pipeline (the banded-candidate →
    signature-agreement shape of Broder'97 MinHash-LSH) over the mod-M
    witness signatures: candidate pairs share an EXACT 4-sig band tuple in
    one of 4 bands; kept when >= 8/16 signature positions agree (integer
    est-Jaccard 0.5). One sig pass + one (band, key) co-partition
    (``functions/dedup_witness.py::minhash_band_pairs``); the mirror
    recomputes signatures, band joins, and the agreement count in pure SQL.
    Production-scale pairs stay `minhash_pairs` (hot-bucket caps there are
    deliberately absent here — SQL parity requires the full pair set, so
    oversized buckets raise loudly)."""
    from ..functions.dedup_witness import minhash_band_pairs

    return minhash_band_pairs(_docs(sf_dir, ["doc_id", "text"]), min_agree=8)


SQL_MINHASH_BAND_PAIRS = """
WITH sigs AS ({MINHASH_SIGS}),
wide AS (
  SELECT doc_id, list(sig ORDER BY perm) AS s FROM sigs GROUP BY doc_id),
cand AS (
  SELECT a.doc_id AS a, b.doc_id AS b,
         CAST(len(list_filter(range(1, 17), i -> a.s[i] = b.s[i]))
              AS BIGINT) AS n_agree
  FROM wide a JOIN wide b
    ON a.doc_id < b.doc_id
   AND (a.s[1:4] = b.s[1:4] OR a.s[5:8] = b.s[5:8]
        OR a.s[9:12] = b.s[9:12] OR a.s[13:16] = b.s[13:16]))
SELECT a, b, n_agree FROM cand WHERE n_agree >= 8
""".format(MINHASH_SIGS=SQL_MINHASH_SIGS)


# mirror for q_incremental_near_dup (defined above, near the exact-index
# sibling): both sides' witness signatures recomputed in SQL; increment = odd
# doc ids, corpus = even; same band-tuple + >= 8/16 agreement rule
SQL_INCREMENTAL_NEAR_DUP = """
WITH sigs AS ({MINHASH_SIGS}),
wide AS (
  SELECT doc_id, list(sig ORDER BY perm) AS s FROM sigs GROUP BY doc_id)
SELECT * FROM (
  SELECT i.doc_id, c.doc_id AS corpus_id,
         CAST(len(list_filter(range(1, 17), j -> i.s[j] = c.s[j]))
              AS BIGINT) AS n_agree
  FROM wide i JOIN wide c
    ON i.doc_id % 2 = 1 AND c.doc_id % 2 = 0
   AND (i.s[1:4] = c.s[1:4] OR i.s[5:8] = c.s[5:8]
        OR i.s[9:12] = c.s[9:12] OR i.s[13:16] = c.s[13:16]))
WHERE n_agree >= 8
""".format(MINHASH_SIGS=SQL_MINHASH_SIGS)


def q_simhash_pairs(sf_dir):
    """SimHash hamming<=3 near-dup pairs. Rows-only: the production 64-bit
    blake2b token hashes have no DuckDB mirror; the hamming re-verify
    invariant is pytest-pinned, and the signature math is SQL-hash-checked
    via the md5 witness `simhash_sigs`."""
    return dd.simhash_pairs(_docs(sf_dir, ["doc_id", "text"]), max_hamming=3)


def q_simhash_sigs(sf_dir):
    """SQL-hash-checked witness for the SimHash family: per-doc 64-bit
    signatures over md5-low-64 token hashes — bit j set iff the
    multiplicity-weighted sum of +-1 contributions is > 0 (integer-exact on
    both engines; empty docs hash to 0). One shuffle-free actor-pool pass
    (``functions/dedup_witness.py``)."""
    from ..functions.dedup_witness import simhash_md5

    return simhash_md5(_docs(sf_dir, ["doc_id", "text"]))


SQL_SIMHASH_SIGS = """
WITH tok AS (
  SELECT doc_id,
         unnest(list_filter(regexp_split_to_array(text, '[ \t\n\r\f]+'),
                            x -> x <> '')) AS tok
  FROM documents),
th AS (
  SELECT doc_id, md5_number_lower(tok) AS h, count(*) AS cnt
  FROM tok GROUP BY doc_id, tok),
bits AS (
  SELECT doc_id, g.j,
         sum(CASE WHEN (h >> CAST(g.j AS UBIGINT)) & 1 = 1
                  THEN cnt ELSE -cnt END) AS s
  FROM th CROSS JOIN generate_series(0, 63) g(j)
  GROUP BY doc_id, g.j),
acc AS (
  SELECT doc_id,
         sum(CASE WHEN s > 0 THEN CAST(1 AS HUGEINT) << j
             ELSE CAST(0 AS HUGEINT) END) AS v
  FROM bits GROUP BY doc_id)
SELECT d.doc_id,
       CAST(COALESCE(
           CASE WHEN a.v >= CAST(1 AS HUGEINT) << 63
                THEN a.v - (CAST(1 AS HUGEINT) << 64) ELSE a.v END,
           0) AS BIGINT) AS simhash
FROM documents d LEFT JOIN acc a ON a.doc_id = d.doc_id
"""


def q_simhash_band_pairs(sf_dir):
    """FULLY SQL-hash-checked SimHash pair pipeline (Charikar'02 rounding +
    the 4 x 16-bit pigeonhole banding of the production `simhash_pairs`) over
    the md5 witness signatures: candidates share an exact 16-bit band,
    verified with an exact 64-bit popcount, kept at hamming <= 3. One sig
    pass + one (band, key) co-partition
    (``functions/dedup_witness.py::simhash_band_pairs``); the mirror
    recomputes signatures, band joins, and the hamming verify as
    ``bit_count(xor(a, b))`` in pure SQL."""
    from ..functions.dedup_witness import simhash_band_pairs

    return simhash_band_pairs(_docs(sf_dir, ["doc_id", "text"]),
                              max_hamming=3)


SQL_SIMHASH_BAND_PAIRS = """
WITH sims AS ({SIMHASH_SIGS}),
u AS (
  SELECT doc_id, simhash,
         CAST(simhash AS HUGEINT) + CASE WHEN simhash < 0
             THEN CAST(1 AS HUGEINT) << 64 ELSE CAST(0 AS HUGEINT) END AS uv
  FROM sims),
cand AS (
  SELECT a.doc_id AS a, b.doc_id AS b,
         CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
  FROM u a JOIN u b
    ON a.doc_id < b.doc_id
   AND ((a.uv & 65535) = (b.uv & 65535)
     OR ((a.uv >> 16) & 65535) = ((b.uv >> 16) & 65535)
     OR ((a.uv >> 32) & 65535) = ((b.uv >> 32) & 65535)
     OR ((a.uv >> 48) & 65535) = ((b.uv >> 48) & 65535)))
SELECT a, b, hamming FROM cand WHERE hamming <= 3
""".format(SIMHASH_SIGS=SQL_SIMHASH_SIGS)


def q_embedding_dup_pairs(sf_dir):
    pairs = dd.embedding_dup_pairs(_t(sf_dir, "embeddings"), threshold=0.4)
    # ids only: the cosine value itself differs from DuckDB's in final float bits
    return pairs.select_columns(["a", "b"])


SQL_EMBEDDING_DUP_PAIRS = """
SELECT x.vec_id AS a, y.vec_id AS b
FROM embeddings x JOIN embeddings y ON x.vec_id < y.vec_id
WHERE list_cosine_similarity(x.embedding, y.embedding) >= 0.4
"""


def q_embedding_dup_lsh(sf_dir):
    """Hyperplane-LSH approximate variant of embedding_dup_pairs (scale
    path). Rows-only: bucket membership depends on float dot-product signs
    against seeded hyperplanes (no SQL mirror); the exact-path twin
    `embedding_dup_pairs` is SQL-hash-checked and recall vs it is
    pytest-pinned."""
    pairs = dd.embedding_dup_pairs_lsh(_t(sf_dir, "embeddings"), threshold=0.4,
                                       n_planes=10, n_tables=12)
    return pairs.select_columns(["a", "b"])


def q_langid_pred(sf_dir):
    """SQL-hash-checkable language-ID surface: integer token counts + the
    argmax-stopword prediction (lang_score is dropped — its rounding is not
    bit-stable across engines, while pred/n_toks are exact)."""
    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        ts.LangId, fn_constructor_kwargs={"emit_n_toks": True},
        batch_format="pyarrow", concurrency=(1, 8)
    ).select_columns(["doc_id", "pred_lang", "n_toks"])


def _sql_in_list(words):
    return ",".join("'" + w.replace("'", "''") + "'" for w in sorted(words))


# DuckDB mirror of textstats.LangId: same RE2 tokenizer, same stopword sets,
# ratios as exact int/int -> double divisions, first-max tie order (de,en,es,fr)
SQL_LANGID_PRED = f"""
WITH t AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '[^a-zà-ÿäöüßñ'']+'),
                     x -> x <> '') AS toks
  FROM documents),
r AS (
  SELECT doc_id, len(toks) AS n_toks,
    len(list_filter(toks, x -> x IN ({_sql_in_list(ts._PROFILES['de'])}))) / greatest(len(toks), 1) AS r_de,
    len(list_filter(toks, x -> x IN ({_sql_in_list(ts._PROFILES['en'])}))) / greatest(len(toks), 1) AS r_en,
    len(list_filter(toks, x -> x IN ({_sql_in_list(ts._PROFILES['es'])}))) / greatest(len(toks), 1) AS r_es,
    len(list_filter(toks, x -> x IN ({_sql_in_list(ts._PROFILES['fr'])}))) / greatest(len(toks), 1) AS r_fr
  FROM t)
SELECT doc_id, n_toks,
  CASE WHEN r_de >= r_en AND r_de >= r_es AND r_de >= r_fr
         THEN (CASE WHEN r_de >= 0.03 THEN 'de' ELSE 'und' END)
       WHEN r_en >= r_es AND r_en >= r_fr
         THEN (CASE WHEN r_en >= 0.03 THEN 'en' ELSE 'und' END)
       WHEN r_es >= r_fr
         THEN (CASE WHEN r_es >= 0.03 THEN 'es' ELSE 'und' END)
       ELSE (CASE WHEN r_fr >= 0.03 THEN 'fr' ELSE 'und' END) END AS pred_lang
FROM r
"""


def q_quality_score(sf_dir):
    """SQL-hash-checked variant of `quality`: the un-rounded score is a fixed
    sequence of IEEE double ops mirrored term-by-term in DuckDB (identical
    operand order ⇒ identical bits), emitted as integer ppm
    (floor(score·1e6)) so the value hash needs no float-repr agreement."""

    def f(b: pa.Table) -> pa.Table:
        ppm = np.floor(ts.quality_raw(b) * 1000000.0).astype(np.int64)
        return pa.table({"doc_id": b["doc_id"], "quality_ppm": pa.array(ppm)})

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(f, batch_format="pyarrow")


SQL_QUALITY_SCORE = f"""
WITH s AS (
  SELECT doc_id,
    CAST(array_length(regexp_extract_all(text, '{ts.TOKEN_PAT}')) AS DOUBLE) AS n_tok,
    CAST(length(text) AS DOUBLE) AS n_chr,
    CAST(array_length(regexp_extract_all(text, '{ts.PUNCT_PAT}')) AS DOUBLE) AS n_pun,
    CAST(array_length(regexp_extract_all(text, '{ts.DIGIT_PAT}')) AS DOUBLE) AS n_dig
  FROM documents),
c AS (
  SELECT doc_id, n_tok, n_chr, n_pun, n_dig,
    CASE WHEN n_tok > 0
         THEN (n_chr - greatest(n_tok - 1.0, 0.0)) / greatest(n_tok, 1.0)
         ELSE 0.0 END AS mean_wl
  FROM s),
sc AS (
  SELECT doc_id,
    least(greatest(n_tok / 50.0, 0.0), 1.0)
      * least(greatest((5000.0 - n_tok) / 5000.0, 0.0), 1.0) AS len_score,
    least(greatest(1.0 - abs(mean_wl - 5.0) / 5.0, 0.0), 1.0) AS wl_score,
    CASE WHEN n_chr > 0 THEN (n_pun + n_dig) / greatest(n_chr, 1.0)
         ELSE 1.0 END AS noise
  FROM c)
SELECT doc_id,
       CAST(FLOOR((0.4 * len_score + 0.3 * wl_score
                   + 0.3 * least(greatest(1.0 - 4.0 * noise, 0.0), 1.0))
                  * 1000000.0) AS BIGINT) AS quality_ppm
FROM sc
"""


def q_curation_pipeline(sf_dir):
    """END-TO-END curation composition — the pipeline a 100 TB pretraining
    run actually executes, hash-checked as ONE query: one enrichment pass
    (sha256 fingerprint + language-ID + quality ppm, all per-batch
    vectorized), exact-dedup keep-first under ONE text_sha co-partition,
    stateless language+quality filter, bounded per-source aggregate. Shuffle
    budget: one co-partition over (sha, small ints) + one ≤|sources|-row
    groupby — document text never moves after the enrichment pass. The mirror
    composes the SAME building-block SQL (exact_dedup row_number rule,
    SQL_LANGID_PRED, SQL_QUALITY_SCORE) as CTEs, so every stage's semantics
    stay pinned inside the composition."""
    from ray.data.aggregate import Count

    from ..core.groupops import grouped_reduce
    from ..functions.dedup import add_text_sha

    lid = ts.LangId(emit_n_toks=True)

    def enrich(b: pa.Table) -> pa.Table:
        e = add_text_sha(lid(b))
        q = np.floor(ts.quality_raw(b) * 1000000.0).astype(np.int64)
        return pa.table({
            "text_sha": e["text_sha"], "doc_id": e["doc_id"],
            "source": e["source"], "pred_lang": e["pred_lang"],
            "n_toks": e["n_toks"], "quality_ppm": pa.array(q)})

    import pandas as pd

    def keep_min(g: pd.DataFrame) -> pd.DataFrame:
        keep = g["doc_id"] == g.groupby("text_sha")["doc_id"].transform("min")
        return g[keep]

    def filt(b: pa.Table) -> pa.Table:
        return b.filter(pc.and_(
            pc.equal(b["pred_lang"], "en"),
            pc.greater_equal(b["quality_ppm"], 900000)))

    enriched = _docs(sf_dir, ["doc_id", "text", "source"]).map_batches(
        enrich, batch_format="pyarrow")
    kept = grouped_reduce(enriched, ["text_sha"], keep_min)
    out = (kept.map_batches(filt, batch_format="pyarrow")
           .groupby("source").aggregate(
               Count(alias_name="n_docs"),
               Sum("n_toks", alias_name="n_toks"),
               Sum("quality_ppm", alias_name="sum_quality_ppm")))
    return _cast_int64(out, ["n_docs", "n_toks", "sum_quality_ppm"])


SQL_CURATION_PIPELINE = """
WITH lang AS ({LANGID}),
q AS ({QUALITY}),
d AS (
  SELECT doc_id, source,
         row_number() OVER (PARTITION BY text ORDER BY doc_id) AS rn
  FROM documents),
kept AS (
  SELECT d.source, l.n_toks, qq.quality_ppm
  FROM d JOIN lang l USING (doc_id) JOIN q qq USING (doc_id)
  WHERE d.rn = 1 AND l.pred_lang = 'en' AND qq.quality_ppm >= 900000)
SELECT source, count(*) AS n_docs,
       CAST(sum(n_toks) AS BIGINT) AS n_toks,
       CAST(sum(quality_ppm) AS BIGINT) AS sum_quality_ppm
FROM kept GROUP BY source
""".format(LANGID=SQL_LANGID_PRED, QUALITY=SQL_QUALITY_SCORE)


def q_compression_ratio(sf_dir):
    """Deflate-compressibility per doc (int ppm) — the cheap repetition/junk
    signal (low ratio = machine boilerplate). Rows-only: zlib output bytes
    have no SQL counterpart; pytest pins the exact values against direct
    zlib."""
    from ..functions import textstats as ts

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        ts.compression_ratio_batch, batch_format="pyarrow")


def q_fingerprint(sf_dir):
    """Winnowing document fingerprints (Schleimer et al. SIGMOD'03),
    SQL-hash-checked: one digest string per doc — md5 over the ordered
    unsigned decimal gram set that `fingerprint_grams` pins (selection rule
    identical; only the digest hash differs from the production sha256
    `fingerprint_batch`, which stays pytest-pinned against a naive
    reimplementation). Shuffle-free single pass."""
    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        ts.fingerprint_digest_batch, batch_format="pyarrow")


SQL_FINGERPRINT_DIGEST = """
WITH g AS ({FPG}),
u AS (
  SELECT doc_id,
         CAST(gram AS HUGEINT) + CASE WHEN gram < 0
             THEN CAST(1 AS HUGEINT) << 64 ELSE CAST(0 AS HUGEINT) END AS uv
  FROM g)
SELECT doc_id,
       md5(string_agg(CAST(uv AS VARCHAR), ',' ORDER BY uv)) AS fingerprint
FROM u GROUP BY doc_id
"""


def q_fingerprint_grams(sf_dir):
    """SQL-hash-checked witness for the winnowing family: the selected k-gram
    hashes as (doc_id, gram) rows — md5 character grams + per-window minima,
    both DuckDB-reproducible (``functions/textstats.py::
    fingerprint_grams_batch``). One shuffle-free pass."""
    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        ts.fingerprint_grams_batch, batch_format="pyarrow")


SQL_FINGERPRINT_GRAMS = """
WITH pos AS (
  SELECT doc_id, text,
         greatest(length(text) - 7, 0) AS n_grams,
         unnest(range(1, greatest(length(text) - 7, 0) + 1)) AS p
  FROM documents),
h AS (
  SELECT doc_id, n_grams, p,
         md5_number_lower(substr(text, CAST(p AS INTEGER), 8)) AS gh
  FROM pos),
sel AS (
  -- full-window minima (winnowing) for docs with n_grams >= window
  SELECT doc_id,
         min(gh) OVER (PARTITION BY doc_id ORDER BY p
                       ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS g
  FROM h WHERE n_grams >= 4
  QUALIFY p <= n_grams - 3
  UNION ALL
  -- short docs (0 < n_grams < window): keep every gram hash
  SELECT doc_id, gh FROM h WHERE n_grams < 4
  UNION ALL
  -- docs shorter than k: hash the whole text
  SELECT doc_id, md5_number_lower(text) FROM documents
  WHERE greatest(length(text) - 7, 0) = 0)
SELECT DISTINCT doc_id,
       CAST(CAST(g AS HUGEINT)
            - CASE WHEN g >= CAST(1 AS HUGEINT) << 63
                   THEN CAST(1 AS HUGEINT) << 64 ELSE 0 END
            AS BIGINT) AS gram
FROM sel
"""

SQL_FINGERPRINT_DIGEST = SQL_FINGERPRINT_DIGEST.format(
    FPG=SQL_FINGERPRINT_GRAMS)


# ---------------------------------------------------------------------------
# Similarity search
# ---------------------------------------------------------------------------


def _first_queries(sf_dir, n=10):
    """The n lowest-id query vectors, selected scale-safe: every batch keeps
    only its own n lowest-id rows (partial bottom-k inside map_batches), then a
    sort+limit over the tiny partial set — the embeddings table is never read
    onto the driver (the previous version materialized both full columns
    driver-side, the OOM pattern at 100x)."""
    ds = _t(sf_dir, "embeddings", ["vec_id", "embedding"])

    def bottom(b: pa.Table) -> pa.Table:
        return b.take(pc.sort_indices(b["vec_id"])[:n])

    rows = (ds.map_batches(bottom, batch_format="pyarrow")
            .sort("vec_id").limit(n).take_all())
    qids = [r["vec_id"] for r in rows]
    qvecs = np.array([r["embedding"] for r in rows], dtype=np.float64)
    return qvecs, qids


def q_knn_cosine(sf_dir):
    qvecs, qids = _first_queries(sf_dir)
    return sim.knn_cosine(_t(sf_dir, "embeddings", ["vec_id", "embedding"]),
                          qvecs, qids, k=10)


SQL_KNN_COSINE = """
WITH q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings
           ORDER BY vec_id LIMIT 10),
scored AS (
  SELECT q.query_id, e.vec_id AS neighbor_id,
         list_cosine_similarity(q.qe, e.embedding) AS s
  FROM q CROSS JOIN embeddings e WHERE e.vec_id <> q.query_id),
ranked AS (
  SELECT query_id, neighbor_id,
         row_number() OVER (PARTITION BY query_id ORDER BY s DESC, neighbor_id) AS rank
  FROM scored)
SELECT query_id, neighbor_id, rank FROM ranked WHERE rank <= 10
"""


def q_knn_ivf(sf_dir):
    """IVF approximate kNN (scale path of `knn_cosine`): assign every vector
    to its nearest codebook centroid, probe each query's ``nprobe`` closest
    lists, brute-force only inside them. With a DETERMINISTIC codebook (the
    16 lowest-id vectors — the `kmeans_assign`/`semdedup` seed recipe) the
    whole algorithm is SQL-mirrorable: the mirror replicates the probe-then-
    rank semantics itself (NOT true kNN — nprobe-bounded probing may miss
    true neighbors; recall vs exact `knn_cosine` stays pytest-pinned in
    tests/test_similarity.py). All ties break to the lower centroid /
    neighbor id on both engines."""
    from ..functions import cluster as cl

    ds = _t(sf_dir, "embeddings", ["vec_id", "embedding"])
    qvecs, qids = _first_queries(sf_dir)
    return sim.knn_cosine_ivf(ds, qvecs, qids, k=10, nprobe=4,
                              centroids=cl.lowest_id_vectors(ds, 16))


SQL_KNN_IVF = """
WITH c AS (SELECT vec_id AS cid, embedding AS ce FROM embeddings
           ORDER BY vec_id LIMIT 16),
q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings
      ORDER BY vec_id LIMIT 10),
avec AS (
  SELECT e.vec_id, c.cid, e.embedding
  FROM embeddings e CROSS JOIN c
  QUALIFY row_number() OVER (
      PARTITION BY e.vec_id
      ORDER BY list_cosine_similarity(e.embedding, c.ce) DESC, c.cid) = 1),
probes AS (
  SELECT q.query_id, c.cid
  FROM q CROSS JOIN c
  QUALIFY row_number() OVER (
      PARTITION BY q.query_id
      ORDER BY list_cosine_similarity(q.qe, c.ce) DESC, c.cid) <= 4),
cand AS (
  SELECT p.query_id, a.vec_id AS neighbor_id,
         list_cosine_similarity(q.qe, a.embedding) AS s
  FROM probes p JOIN avec a ON a.cid = p.cid
       JOIN q ON q.query_id = p.query_id
  WHERE a.vec_id <> p.query_id)
SELECT query_id, neighbor_id,
       row_number() OVER (PARTITION BY query_id
                          ORDER BY s DESC, neighbor_id) AS rank
FROM cand QUALIFY rank <= 10
"""


def q_kmeans_assign(sf_dir):
    """One spherical k-means ASSIGNMENT step against deterministic seed
    centroids (the k lowest-id vectors): nearest centroid by cosine, ties to
    the lowest centroid id. This is the SQL-checkable core of Lloyd's loop —
    one shuffle-free pass, centroids broadcast once (functions/cluster.py);
    the full iterated fit is `kmeans_clusters` (rows-only: a recursive float
    fixpoint has no faithful SQL mirror)."""
    from ..functions import cluster as cl

    ds = _t(sf_dir, "embeddings", ["vec_id", "embedding"])
    cent = cl.lowest_id_vectors(ds, k=10)
    return cl.assign(ds, cent)


SQL_KMEANS_ASSIGN = """
WITH c AS (SELECT vec_id AS cid, embedding AS ce FROM embeddings
           ORDER BY vec_id LIMIT 10),
scored AS (
  SELECT e.vec_id, c.cid,
         list_cosine_similarity(e.embedding, c.ce) AS s
  FROM embeddings e CROSS JOIN c)
SELECT vec_id, cid AS cluster FROM scored
QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, cid ASC) = 1
"""


def q_semdedup_pairs(sf_dir):
    """SemDeDup (arXiv 2303.09540): near-dup pairs by cosine, computed only
    WITHIN k-means clusters — O(n²/k) vs embedding_dup_pairs' all-pairs. Seed
    codebook = the 10 lowest-id vectors (deterministic, so the assignment AND
    the in-cluster pair set are SQL-mirrorable; ids only in the output — the
    cosine value itself differs from DuckDB's in final float bits)."""
    from ..functions import cluster as cl

    return cl.semdedup_pairs(_t(sf_dir, "embeddings", ["vec_id", "embedding"]),
                             k=10, threshold=0.4)


SQL_SEMDEDUP_PAIRS = """
WITH c AS (SELECT vec_id AS cid, embedding AS ce FROM embeddings
           ORDER BY vec_id LIMIT 10),
scored AS (
  SELECT e.vec_id, e.embedding, c.cid,
         list_cosine_similarity(e.embedding, c.ce) AS s
  FROM embeddings e CROSS JOIN c),
asg AS (
  SELECT vec_id, embedding, cid AS cluster FROM scored
  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, cid ASC) = 1)
SELECT x.vec_id AS a, y.vec_id AS b, x.cluster
FROM asg x JOIN asg y ON x.cluster = y.cluster AND x.vec_id < y.vec_id
WHERE list_cosine_similarity(x.embedding, y.embedding) >= 0.4
"""


def q_doc_features_knn(sf_dir):
    """Featurize raw text with the hashing trick (no vocabulary, stateless
    actor-pool pass — ``functions/features.py``) and run exact cosine kNN for
    the 3 lowest-id docs over the hashed vectors: the embedding-free
    similarity-search composition (featurize → knn) for corpora with no
    learned embeddings.

    SQL-hash-checked end to end: the featurizer's md5 token hash is
    bit-identical to DuckDB's ``md5_number_lower`` (bucket = h % dim, sign =
    bit 63), the feature values are signed integer counts, and the knn runs
    ``int_exact`` cosine (exact-integer dot / product of exact norms), so
    every similarity is bit-identical across engines and the (query_id,
    neighbor_id, rank) output needs no float in the hash."""
    from ..functions import similarity as sim
    from ..functions.features import hash_features

    feats = hash_features(_docs(sf_dir, ["doc_id", "text"]), dim=64,
                          hasher="md5").materialize()

    def bottom(b: pa.Table) -> pa.Table:
        return b.take(pc.sort_indices(b["doc_id"])[:3])

    rows = (feats.map_batches(bottom, batch_format="pyarrow")
            .sort("doc_id").limit(3).take_all())
    qvecs = np.array([r["vec"] for r in rows], dtype=np.float64)
    qids = [r["doc_id"] for r in rows]
    return sim.knn_cosine(feats, qvecs, qids, k=5, id_col="doc_id",
                          vec_col="vec", int_exact=True)


SQL_DOC_FEATURES_KNN = """
WITH toks AS (
  SELECT doc_id, unnest(list_filter(regexp_split_to_array(text, '[ \t\n\r\f]+'),
                                    x -> x <> '')) AS tok
  FROM documents),
hv AS (SELECT doc_id, md5_number_lower(tok) AS h FROM toks),
feat AS (
  SELECT doc_id, h % 64 AS bucket,
         CAST(SUM(CASE WHEN h >= 9223372036854775808 THEN -1 ELSE 1 END)
              AS DOUBLE) AS v
  FROM hv GROUP BY doc_id, bucket),
nrm AS (SELECT doc_id, greatest(sqrt(SUM(v*v)), 1e-12) AS nv
        FROM feat GROUP BY doc_id),
q AS (SELECT doc_id FROM documents ORDER BY doc_id LIMIT 3),
qf AS (SELECT f.* FROM feat f JOIN q USING (doc_id)),
ipt AS (
  SELECT qf.doc_id AS query_id, f.doc_id AS neighbor_id, SUM(qf.v * f.v) AS ip
  FROM qf JOIN feat f ON qf.bucket = f.bucket
  GROUP BY qf.doc_id, f.doc_id),
scored AS (
  SELECT q.doc_id AS query_id, d.doc_id AS neighbor_id,
         COALESCE(i.ip, 0.0) / (nq.nv * nn.nv) AS s
  FROM q CROSS JOIN documents d
  LEFT JOIN ipt i ON i.query_id = q.doc_id AND i.neighbor_id = d.doc_id
  JOIN nrm nq ON nq.doc_id = q.doc_id
  JOIN nrm nn ON nn.doc_id = d.doc_id
  WHERE d.doc_id <> q.doc_id),
ranked AS (
  SELECT query_id, neighbor_id,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY s DESC, neighbor_id) AS rank
  FROM scored)
SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank
FROM ranked WHERE rank <= 5
"""


def q_kmeans_clusters(sf_dir):
    """Full distributed spherical k-means (k=10, 5 Lloyd iterations): corpus
    bucketing by embedding similarity for mixture balancing / cluster-sharded
    dedup / IVF codebooks. Rows-only: a recursive float fixpoint has no
    faithful SQL mirror — the single assignment step IS SQL-hash-checked as
    `kmeans_assign`, the full ITERATED fit is SQL-hash-checked in its
    integer-exact variant `kmeans_iter_assign`, and fit
    convergence/determinism is pytest-pinned. Dataset materialized once,
    per-iteration update reduced via long-form (cluster, dim, sum) partials —
    the driver only sees k x (d+1) numbers per iteration
    (functions/cluster.py)."""
    from ..functions import cluster as cl

    return cl.kmeans(_t(sf_dir, "embeddings", ["vec_id", "embedding"]),
                     k=10, n_iter=5)


def q_kmeans_iter_assign(sf_dir):
    """ITERATED k-means fit, SQL-hash-checked: the integer-exact euclidean
    Lloyd variant (``cluster.kmeans_int_assign`` — embeddings quantized
    half-up to 1e-3 units, integer distances/argmin, floor-div centroid
    updates, empty clusters keep their centroid), k=8, 4 assignment passes
    with 3 updates between them. The DuckDB mirror unrolls the same
    iterations as CTE layers and matches bit-for-bit — closing the gap
    `kmeans_clusters` documents (a FLOAT fixpoint has no faithful mirror;
    the integer one does)."""
    from ..functions import cluster as cl

    return cl.kmeans_int_assign(
        _t(sf_dir, "embeddings", ["vec_id", "embedding"]), k=8, n_iter=4)


def _kmeans_int_sql(k: int = 8, iters: int = 4) -> str:
    """Unrolled integer-exact Lloyd mirror: layer i = assignment under the
    (i-1)-times-updated centroids; centroid update = floor-div of member sums
    (the % dance makes DuckDB's truncating // a floor, matching numpy);
    COALESCE keeps empty clusters' previous centroids."""
    s = """WITH x AS (
  SELECT vec_id, generate_subscripts(embedding, 1) AS dim,
         CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000 + 0.5)
              AS BIGINT) AS v
  FROM embeddings),
c0 AS (
  SELECT r.cid, x.dim, x.v
  FROM (SELECT vec_id, row_number() OVER (ORDER BY vec_id) - 1 AS cid
        FROM embeddings ORDER BY vec_id LIMIT {k}) r
  JOIN x ON x.vec_id = r.vec_id)""".format(k=k)
    for i in range(1, iters + 1):
        s += """,
a{i} AS (
  SELECT x.vec_id, c.cid, sum((x.v - c.v) * (x.v - c.v)) AS d2
  FROM x JOIN c{p} c ON c.dim = x.dim GROUP BY x.vec_id, c.cid),
b{i} AS (
  SELECT vec_id, cid FROM a{i}
  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) = 1)""" \
            .format(i=i, p=i - 1)
        if i < iters:
            s += """,
c{i} AS (
  SELECT c.cid, c.dim, COALESCE(n.v, c.v) AS v
  FROM c{p} c LEFT JOIN (
    SELECT b.cid, x.dim,
           (sum(x.v) - ((sum(x.v) % count(*) + count(*)) % count(*)))
             // count(*) AS v
    FROM b{i} b JOIN x ON x.vec_id = b.vec_id
    GROUP BY b.cid, x.dim) n ON n.cid = c.cid AND n.dim = c.dim)""" \
                .format(i=i, p=i - 1)
    return s + "\nSELECT vec_id, CAST(cid AS BIGINT) AS cluster FROM b{0}" \
        .format(iters)


SQL_KMEANS_ITER_ASSIGN = _kmeans_int_sql(8, 4)


def q_embedding_label_dist(sf_dir):
    return _t(sf_dir, "embeddings", ["label"]).groupby("label").aggregate(
        Count(alias_name="n_vecs"))


SQL_EMBEDDING_LABEL_DIST = "SELECT label, count(*) AS n_vecs FROM embeddings GROUP BY label"


def q_embedding_centroids(sf_dir):
    """Grouped vector aggregate — the centroid building block for IVF/k-means
    seeding: per label, vector count and EXACT per-dimension quantized sums
    (first 4 dims). Per-batch vectorized partials (one np.add.at over the
    zero-copy flat matrix) then a tiny label-keyed final sum — the shuffle
    carries n_labels × 6 ints, never vectors. Quantization floor(double·1000)
    is bit-identical in numpy and DuckDB (both promote the float32 element to
    double first), making a float-vector aggregate value-hash-checkable;
    centroid means are qK / 1000 / n_vecs downstream."""
    from ..core.vecops import ids_and_matrix

    ds = _t(sf_dir, "embeddings", ["vec_id", "label", "embedding"])

    def partial(b: pa.Table) -> pa.Table:
        _, mat = ids_and_matrix(b, "vec_id", "embedding", normalize=False,
                                dtype=np.float64)
        lab = b["label"].to_numpy(zero_copy_only=False)
        if len(lab) == 0:
            return pa.table({"label": pa.array([], pa.int32()),
                             "n_vecs": pa.array([], pa.int64()),
                             **{f"q{i+1}": pa.array([], pa.int64())
                                for i in range(4)}})
        q = np.floor(mat[:, :4] * 1000.0).astype(np.int64)
        uniq, inv = np.unique(lab, return_inverse=True)
        sums = np.zeros((len(uniq), 4), dtype=np.int64)
        np.add.at(sums, inv, q)
        counts = np.bincount(inv, minlength=len(uniq)).astype(np.int64)
        return pa.table({"label": pa.array(uniq.astype(np.int32)),
                         "n_vecs": pa.array(counts),
                         **{f"q{i+1}": pa.array(sums[:, i])
                            for i in range(4)}})

    partials = ds.map_batches(partial, batch_format="pyarrow")
    return partials.groupby("label").aggregate(
        Sum(on="n_vecs", alias_name="n_vecs"),
        *[Sum(on=f"q{i+1}", alias_name=f"q{i+1}") for i in range(4)])


SQL_EMBEDDING_CENTROIDS = """
SELECT label,
       CAST(count(*) AS BIGINT) AS n_vecs,
       CAST(SUM(CAST(floor(CAST(embedding[1] AS DOUBLE) * 1000) AS BIGINT)) AS BIGINT) AS q1,
       CAST(SUM(CAST(floor(CAST(embedding[2] AS DOUBLE) * 1000) AS BIGINT)) AS BIGINT) AS q2,
       CAST(SUM(CAST(floor(CAST(embedding[3] AS DOUBLE) * 1000) AS BIGINT)) AS BIGINT) AS q3,
       CAST(SUM(CAST(floor(CAST(embedding[4] AS DOUBLE) * 1000) AS BIGINT)) AS BIGINT) AS q4
FROM embeddings GROUP BY label
"""


# ---------------------------------------------------------------------------
# Windows over the event stream (SQL-checked)
# ---------------------------------------------------------------------------


def q_events_tumbling(sf_dir):
    return win.tumbling_counts(_t(sf_dir, "events", ["event_type", "ts", "value"]),
                               size_s=3600)


SQL_EVENTS_TUMBLING = """
SELECT event_type,
       (epoch_us(ts) // 3600000000) * 3600 AS window_start,
       count(*) AS n_events, min(value) AS min_value, max(value) AS max_value
FROM events GROUP BY event_type, window_start
"""


def q_sessions(sf_dir):
    return win.session_counts(_t(sf_dir, "events", ["user_id", "ts"]), gap_s=1800)


SQL_SESSIONS = """
WITH o AS (
  SELECT user_id, ts, lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS p
  FROM events)
SELECT user_id,
       CAST(1 + sum(CASE WHEN p IS NOT NULL
                          AND date_diff('microsecond', p, ts) > 1800000000
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions,
       count(*) AS n_events
FROM o GROUP BY user_id
"""


def q_events_sliding(sf_dir):
    """Sliding windows size=2h step=1h: each event explodes into exactly 2
    windows; SQL mirror unnests the same two window starts."""
    return win.sliding_counts(_t(sf_dir, "events", ["event_type", "ts"]),
                              size_s=7200, step_s=3600)


SQL_EVENTS_SLIDING = """
SELECT event_type, window_start, count(*) AS n_events FROM (
  SELECT event_type,
         (epoch_us(ts) // 3600000000) * 3600 - 3600 * g.i AS window_start
  FROM events, (SELECT unnest([0, 1]) AS i) g)
GROUP BY event_type, window_start
"""


def q_user_cohorts(sf_dir):
    """Cohort / retention matrix: distinct active users per (first-seen week,
    active week). ONE co-partition on the user key does all the per-user
    work vectorized (single lexsort per bucket: distinct weeks by
    first-occurrence mask, cohort = week at the user's first sorted row),
    emitting one (cohort, week, 1) row per user-week — so the final exchange
    is a bounded groupby-SUM over weeks² cells, never user-sized. Week math
    is integer microseconds // 604800e6 on both engines."""
    from ..core.groupops import grouped_reduce

    WEEK_US = 604_800_000_000

    def to_weeks(b: pa.Table) -> pa.Table:
        us = pc.cast(b["ts"], pa.int64())
        return pa.table({"user_id": b["user_id"],
                         "week": pc.divide(us, pa.scalar(WEEK_US, pa.int64()))})

    def per_user(t: pa.Table) -> pa.Table:
        u = t["user_id"].to_numpy(zero_copy_only=False)
        w = t["week"].to_numpy(zero_copy_only=False)
        order = np.lexsort((w, u))
        su, sw = u[order], w[order]
        n = len(su)
        if n == 0:
            return pa.table({"cohort": pa.array([], pa.int64()),
                             "week": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        first_u = np.empty(n, dtype=bool)
        first_u[0] = True
        first_u[1:] = su[1:] != su[:-1]
        # distinct (user, week): first occurrence in the sorted stream
        first_pair = first_u.copy()
        first_pair[1:] |= sw[1:] != sw[:-1]
        idx = np.arange(n, dtype=np.int64)
        seg_start = np.maximum.accumulate(np.where(first_u, idx, 0))
        cohort = sw[seg_start]  # weeks ascend within a user ⇒ first = min
        keep = np.flatnonzero(first_pair)
        return pa.table({"cohort": pa.array(cohort[keep]),
                         "week": pa.array(sw[keep]),
                         "n": pa.array(np.ones(len(keep), np.int64))})

    cells = grouped_reduce(
        _t(sf_dir, "events", ["user_id", "ts"])
        .map_batches(to_weeks, batch_format="pyarrow"),
        ["user_id"], per_user, n_parts=32, batch_format="pyarrow")
    return _cast_int64(
        cells.groupby(["cohort", "week"]).aggregate(Sum("n",
                                                        alias_name="n_users")),
        ["n_users"])


SQL_USER_COHORTS = """
WITH w AS (SELECT user_id,
                  CAST(epoch_us(ts) AS BIGINT) // 604800000000 AS week
           FROM events),
f AS (SELECT user_id, min(week) AS cohort FROM w GROUP BY user_id)
SELECT f.cohort, w.week, CAST(count(DISTINCT w.user_id) AS BIGINT) AS n_users
FROM w JOIN f USING (user_id) GROUP BY f.cohort, w.week
"""


def q_user_window_counts(sf_dir):
    """Stream enrichment: every event annotated with the number of events its
    user produced in the same 1-hour bucket — the windowed-aggregate JOIN
    shape (aggregate + attach) executed as ONE window pass instead of a
    groupby + join: composite (user, bucket) key, one coarse shuffle, segment
    length per row (``functions/analytic.py``). Bucket math is integer
    microseconds // 3.6e9 on both engines."""
    from ..functions import analytic as an

    def add_key(b: pa.Table) -> pa.Table:
        us = pc.cast(b["ts"], pa.int64())
        wb = pc.divide(us, pa.scalar(3_600_000_000, pa.int64()))
        # composite window key: user in the high bits, hour bucket below.
        # Fail LOUDLY outside the packable range (bucket >= 2^20 ≈ year 2089,
        # user_id >= 2^43) instead of masking — silent aliasing would merge
        # distinct windows and diverge from the SQL mirror.
        if len(wb) and (pc.max(wb).as_py() >= 1 << 20
                        or pc.min(wb).as_py() < 0
                        or pc.max(b["user_id"]).as_py() >= 1 << 43
                        or pc.min(b["user_id"]).as_py() < 0):
            raise ValueError(
                "user_window_counts: hour bucket or user_id outside the "
                "int64-composite range (wb < 2^20, user_id < 2^43); use a "
                "two-column window key for this data")
        key = pc.add(pc.multiply(b["user_id"],
                                 pa.scalar(1 << 20, pa.int64())), wb)
        return (b.append_column("wbucket", wb)
                .append_column("__wk", key))

    def mk(st, first, seg_start):
        return {"n_in_window": pa.array(an.seg_length(first))}

    ds = (_t(sf_dir, "events", ["event_id", "user_id", "ts"])
          .map_batches(add_key, batch_format="pyarrow"))
    return (an.windowed(ds, "__wk", ["event_id"], mk, n_parts=32)
            .drop_columns(["__wk", "ts"]))


SQL_USER_WINDOW_COUNTS = """
SELECT event_id, user_id,
       CAST(epoch_us(ts) AS BIGINT) // 3600000000 AS wbucket,
       CAST(count(*) OVER (
           PARTITION BY user_id,
                        CAST(epoch_us(ts) AS BIGINT) // 3600000000)
            AS BIGINT) AS n_in_window
FROM events
"""


def q_funnel_stages(sf_dir):
    """Ordered-funnel analysis (view → click → purchase) per user: greedy-
    minimal matching (step k+1 strictly after the earliest completion of step
    k) — ONE co-partition on user_id, all users in a bucket processed at once
    via per-step masked np.minimum.at (``functions/funnel.py``)."""
    from ..functions.funnel import funnel_stages

    return funnel_stages(
        _t(sf_dir, "events", ["user_id", "ts", "event_type"]),
        steps=["view", "click", "purchase"], n_parts=32)


SQL_FUNNEL_STAGES = """
WITH u AS (SELECT DISTINCT user_id FROM events),
s1 AS (SELECT user_id, min(ts) AS t1 FROM events
       WHERE event_type = 'view' GROUP BY user_id),
s2 AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e
       JOIN s1 ON e.user_id = s1.user_id
       WHERE e.event_type = 'click' AND e.ts > s1.t1 GROUP BY e.user_id),
s3 AS (SELECT e.user_id, min(e.ts) AS t3 FROM events e
       JOIN s2 ON e.user_id = s2.user_id
       WHERE e.event_type = 'purchase' AND e.ts > s2.t2 GROUP BY e.user_id)
SELECT u.user_id,
       CAST(CASE WHEN s3.user_id IS NOT NULL THEN 3
                 WHEN s2.user_id IS NOT NULL THEN 2
                 WHEN s1.user_id IS NOT NULL THEN 1 ELSE 0 END AS BIGINT)
           AS stage
FROM u LEFT JOIN s1 USING (user_id) LEFT JOIN s2 USING (user_id)
       LEFT JOIN s3 USING (user_id)
"""


def q_distinct_users(sf_dir):
    """Exact count-distinct via coarse-partitioned dedupe (groupops) — the
    shuffle carries (event_type, user_id) pairs once, not per-event rows."""
    import pandas as pd

    from ..core.groupops import grouped_reduce

    pairs = _t(sf_dir, "events", ["event_type", "user_id"]).map_batches(
        lambda b: b.group_by(["event_type", "user_id"]).aggregate([]),
        batch_format="pyarrow",
    )

    def reduce_part(g: pd.DataFrame) -> pd.DataFrame:
        out = (g.drop_duplicates(["event_type", "user_id"])
               .groupby("event_type").size().reset_index(name="n_partial"))
        return out

    partial = grouped_reduce(pairs, ["event_type"], reduce_part)
    return _cast_int64(
        partial.groupby("event_type").aggregate(Sum("n_partial", alias_name="n_users")),
        ["n_users"],
    )


SQL_DISTINCT_USERS = """
SELECT event_type, count(DISTINCT user_id) AS n_users FROM events GROUP BY event_type
"""


def q_priority_revenue_share(sf_dir):
    """Ratio-to-report: each order-priority class's share of total revenue in
    ppm. Money is quantized to int64 cents per batch BEFORE any sum (floats
    sum order-sensitively; ints don't), so the per-class partials, the grand
    total, and the final integer-division share are all bit-exact across
    engines and schedules. One bounded groupby; the total is derived from the
    ≤5-row aggregate, never a second scan."""

    def partial(b: pa.Table) -> pa.Table:
        cents = pc.cast(pc.round(pc.multiply(b["o_totalprice"],
                                             pa.scalar(100.0))), pa.int64())
        t = pa.table({"o_orderpriority": b["o_orderpriority"],
                      "cents": cents})
        g = t.group_by(["o_orderpriority"]).aggregate([("cents", "sum")])
        return pa.table({"o_orderpriority": g["o_orderpriority"],
                         "cents": g["cents_sum"]})

    agg = _cast_int64(
        (_t(sf_dir, "orders", ["o_orderpriority", "o_totalprice"])
         .map_batches(partial, batch_format="pyarrow")
         .groupby("o_orderpriority").aggregate(Sum("cents",
                                                   alias_name="cents"))),
        ["cents"])

    def share(b: pa.Table) -> pa.Table:
        # arbitrary-precision Python ints on the <=5-row aggregate: numpy
        # int64 `c * 1_000_000` silently wraps once a class's cents exceed
        # ~9.2e12 (~TPC-H sf2) while the SQL mirror raises on BIGINT overflow
        c = [int(v) for v in b["cents"].to_pylist()]
        total = sum(c)
        return pa.table({
            "o_orderpriority": b["o_orderpriority"],
            "revenue_cents": b["cents"],
            "share_ppm": pa.array([v * 1_000_000 // total for v in c],
                                  pa.int64())})

    return agg.repartition(1).map_batches(share, batch_format="pyarrow",
                                          batch_size=None)


SQL_PRIORITY_REVENUE_SHARE = """
WITH a AS (
  SELECT o_orderpriority,
         CAST(sum(CAST(round(o_totalprice * 100.0) AS BIGINT)) AS BIGINT)
             AS revenue_cents
  FROM orders GROUP BY o_orderpriority)
SELECT o_orderpriority, revenue_cents,
       CAST(revenue_cents * 1000000
            // CAST((SELECT sum(revenue_cents) FROM a) AS BIGINT) AS BIGINT)
           AS share_ppm
FROM a
"""


def q_price_zscore(sf_dir):
    """Feature normalization: per-row z-score of the order price (ppm-
    quantized int64). Global mean/std come from EXACT integer sufficient
    statistics (count + cent sums + squared-cent sums — the price_qty_corr
    pattern), so the per-row value is one fixed IEEE expression over three
    ints and a cents value: bit-identical across engines and schedules. Two
    streamed passes; the stats aggregate is 3 numbers."""

    def stats_partial(b: pa.Table) -> pa.Table:
        # whole DOLLARS, not cents: z-scores are scale-invariant and the
        # squared-cents sum overflows int64 at sf0.01 already (measured
        # 1.25e19); dollar squares keep ~600x headroom at sf1
        # round_mode matches SQL round(): half AWAY from zero (Arrow's
        # default is banker's rounding — measured 68 half-dollar divergences)
        c = pc.cast(pc.round(b["o_totalprice"],
                             round_mode="half_towards_infinity"),
                    pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table({"n": pa.array([len(c)], pa.int64()),
                         "s": pa.array([int(c.sum())], pa.int64()),
                         "s2": pa.array([int((c * c).sum())], pa.int64())})

    ds = _t(sf_dir, "orders", ["o_orderkey", "o_totalprice"])
    st = (ds.map_batches(stats_partial, batch_format="pyarrow")
          .aggregate(Sum("n", alias_name="n"), Sum("s", alias_name="s"),
                     Sum("s2", alias_name="s2")))
    n, s, s2 = int(st["n"]), int(st["s"]), int(st["s2"])

    def z(b: pa.Table) -> pa.Table:
        c = pc.cast(pc.round(b["o_totalprice"],
                             round_mode="half_towards_infinity"),
                    pa.int64()).to_numpy(zero_copy_only=False)
        # fixed IEEE op order, mirrored token-for-token in SQL_PRICE_ZSCORE
        mean = float(s) / float(n)
        std = np.sqrt((float(s2) - float(s) * float(s) / float(n)) / float(n))
        zv = np.floor((c.astype(np.float64) - mean) / std * 1e6 + 0.5)
        return pa.table({"o_orderkey": b["o_orderkey"],
                         "z_ppm": pa.array(zv.astype(np.int64))})

    return ds.map_batches(z, batch_format="pyarrow")


SQL_PRICE_ZSCORE = """
WITH c AS (SELECT o_orderkey,
                  CAST(round(o_totalprice) AS BIGINT) AS cents
           FROM orders),
st AS (SELECT CAST(count(*) AS BIGINT) AS n,
              CAST(sum(cents) AS BIGINT) AS s,
              CAST(sum(cents * cents) AS BIGINT) AS s2 FROM c)
SELECT o_orderkey,
       CAST(floor((CAST(cents AS DOUBLE)
                   - CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
                  / sqrt((CAST(s2 AS DOUBLE)
                          - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
                            / CAST(n AS DOUBLE)) / CAST(n AS DOUBLE))
                  * 1.0e6 + 0.5e0) AS BIGINT) AS z_ppm
FROM c CROSS JOIN st
"""


def q_distinct_users_salted(sf_dir):
    """The SKEW-SAFE variant of `distinct_users`: a salted two-stage exact
    COUNT(DISTINCT). Stage 1 reduces at (event_type, salt) granularity with
    salt = user_id % 16 — ONE pathological event_type spreads over 16
    reducers instead of landing on one; because the salt is a function of the
    counted key, per-salt user sets are disjoint and per-salt distinct counts
    SUM exactly. Stage 2 is a bounded groupby over n_types × 16 count rows.
    Same oracle as `distinct_users` — identical result, different (hot-key
    -proof) physical plan."""
    from ..core.groupops import grouped_reduce

    def partial(b: pa.Table) -> pa.Table:
        g = b.group_by(["event_type", "user_id"]).aggregate([])
        salt = pc.cast(
            pc.bit_wise_and(g["user_id"], pa.scalar(15, pa.int64())),
            pa.int32())
        return g.append_column("salt", salt)

    pairs = _t(sf_dir, "events", ["event_type", "user_id"]).map_batches(
        partial, batch_format="pyarrow")

    def count_part(g: pd.DataFrame) -> pd.DataFrame:
        agg = (g.groupby(["event_type", "salt"])["user_id"].nunique()
               .reset_index(name="n"))
        return agg[["event_type", "n"]]

    counts = grouped_reduce(pairs, ["event_type", "salt"], count_part,
                            n_parts=32)
    return _cast_int64(
        counts.groupby("event_type").aggregate(Sum("n", alias_name="n_users")),
        ["n_users"])


def q_top_orders(sf_dir):
    return (_t(sf_dir, "orders", ["o_orderkey", "o_totalprice"])
            .sort(["o_totalprice", "o_orderkey"], descending=[True, False])
            .limit(10))


SQL_TOP_ORDERS = """
SELECT o_orderkey, o_totalprice FROM orders
ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
"""


def q_active_users(sf_dir):
    counted = _t(sf_dir, "events", ["user_id"]).groupby("user_id").aggregate(
        Count(alias_name="n_events"))
    return counted.filter(expr="n_events >= 10")


SQL_ACTIVE_USERS = """
SELECT user_id, count(*) AS n_events FROM events
GROUP BY user_id HAVING count(*) >= 10
"""


# ---------------------------------------------------------------------------
# Relational breadth over the TPC-H-ish tables (SQL-checked)
# ---------------------------------------------------------------------------


def q_lineitem_agg(sf_dir):
    """TPC-H Q1-shaped aggregate restricted to order-insensitive exact measures."""
    return (
        _t(sf_dir, "lineitem", ["l_returnflag", "l_linestatus", "l_quantity"])
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(Sum("l_quantity", alias_name="sum_qty"),
                   Count(alias_name="n_rows"),
                   Min("l_quantity", alias_name="min_qty"),
                   Max("l_quantity", alias_name="max_qty"))
    )


SQL_LINEITEM_AGG = """
SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sum_qty, count(*) AS n_rows,
       min(l_quantity) AS min_qty, max(l_quantity) AS max_qty
FROM lineitem GROUP BY l_returnflag, l_linestatus
"""


def q_price_qty_corr(sf_dir):
    """Grouped Pearson correlation as a distributed statistical aggregate.

    The scale trick is EXACT integer sufficient statistics: quantize both
    variables to integers (quantity is integral already; price floored to
    whole units so sum(y*y) stays within int64 at any realistic SF), then the
    five sums (sx, sy, sxy, sx2, sy2) + count are order-insensitive int64
    partials — per-batch Arrow group_by shrinks every batch to <=3 rows, one
    bounded groupby-sum combines them, and the final correlation is ONE fixed
    IEEE-double expression over six integers, so the DuckDB mirror (same
    casts, same op order) is bit-identical — the `quality_score` pattern
    applied to a multi-variable moment aggregate."""
    ds = _t(sf_dir, "lineitem", ["l_returnflag", "l_quantity", "l_extendedprice"])

    def partial(b: pa.Table) -> pa.Table:
        x = pc.cast(pc.round(b["l_quantity"]), pa.int64())
        y = pc.cast(pc.floor(b["l_extendedprice"]), pa.int64())
        t = pa.table({"l_returnflag": b["l_returnflag"], "x": x, "y": y,
                      "xy": pc.multiply(x, y), "x2": pc.multiply(x, x),
                      "y2": pc.multiply(y, y)})
        g = t.group_by(["l_returnflag"]).aggregate(
            [("x", "sum"), ("y", "sum"), ("xy", "sum"), ("x2", "sum"),
             ("y2", "sum"), ("x", "count")])
        return g.rename_columns(["l_returnflag", "sx", "sy", "sxy", "sx2",
                                 "sy2", "n"])

    combined = (ds.map_batches(partial, batch_format="pyarrow")
                .groupby("l_returnflag")
                .aggregate(Sum("sx", alias_name="sx"), Sum("sy", alias_name="sy"),
                           Sum("sxy", alias_name="sxy"), Sum("sx2", alias_name="sx2"),
                           Sum("sy2", alias_name="sy2"), Sum("n", alias_name="n_rows")))

    def final(b: pa.Table) -> pa.Table:
        n = b["n_rows"].to_numpy(zero_copy_only=False).astype(np.float64)
        sx = b["sx"].to_numpy(zero_copy_only=False).astype(np.float64)
        sy = b["sy"].to_numpy(zero_copy_only=False).astype(np.float64)
        sxy = b["sxy"].to_numpy(zero_copy_only=False).astype(np.float64)
        sx2 = b["sx2"].to_numpy(zero_copy_only=False).astype(np.float64)
        sy2 = b["sy2"].to_numpy(zero_copy_only=False).astype(np.float64)
        corr = (n * sxy - sx * sy) / (np.sqrt(n * sx2 - sx * sx)
                                      * np.sqrt(n * sy2 - sy * sy))
        return pa.table({"l_returnflag": b["l_returnflag"],
                         "n_rows": pc.cast(pc.round(b["n_rows"]), pa.int64()),
                         "corr_qp": pa.array(corr)})

    return combined.map_batches(final, batch_format="pyarrow")


SQL_PRICE_QTY_CORR = """
WITH b AS (
  SELECT l_returnflag,
         CAST(round(l_quantity) AS BIGINT) AS x,
         CAST(floor(l_extendedprice) AS BIGINT) AS y
  FROM lineitem
), s AS (
  SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n_rows,
         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(x * y) AS BIGINT) AS sxy,
         CAST(sum(x * x) AS BIGINT) AS sx2, CAST(sum(y * y) AS BIGINT) AS sy2
  FROM b GROUP BY l_returnflag
)
SELECT l_returnflag, n_rows,
       (CAST(n_rows AS DOUBLE) * CAST(sxy AS DOUBLE)
        - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
       / (sqrt(CAST(n_rows AS DOUBLE) * CAST(sx2 AS DOUBLE)
               - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
          * sqrt(CAST(n_rows AS DOUBLE) * CAST(sy2 AS DOUBLE)
                 - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))) AS corr_qp
FROM s
"""


def q_orders_profile(sf_dir):
    """Data-quality table profiler — the validation stage every large-scale
    ingest runs before training-data jobs: row/null counts per column, exact
    numeric/date ranges, and the exact distinct count of a low-cardinality
    column, all in ONE streamed pass of order-insensitive partials (per-batch
    Arrow kernels -> a single global combine; the distinct set shuffles only
    the <=5-value priority domain)."""
    ds = _t(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_totalprice",
                               "o_orderdate", "o_orderpriority"])

    def partial(b: pa.Table) -> pa.Table:
        def nnull(c):
            return b[c].null_count
        tp = b["o_totalprice"]
        od = b["o_orderdate"]
        return pa.table({
            "n_rows": pa.array([b.num_rows], pa.int64()),
            "null_custkey": pa.array([nnull("o_custkey")], pa.int64()),
            "null_totalprice": pa.array([nnull("o_totalprice")], pa.int64()),
            "null_priority": pa.array([nnull("o_orderpriority")], pa.int64()),
            "min_price": pa.array([pc.min(tp).as_py()], pa.float64()),
            "max_price": pa.array([pc.max(tp).as_py()], pa.float64()),
            "min_date": pa.array([pc.min(od).as_py()], pa.timestamp("us")),
            "max_date": pa.array([pc.max(od).as_py()], pa.timestamp("us")),
        })

    prof = (ds.map_batches(partial, batch_format="pyarrow")
            .aggregate(Sum("n_rows", alias_name="n_rows"),
                       Sum("null_custkey", alias_name="null_custkey"),
                       Sum("null_totalprice", alias_name="null_totalprice"),
                       Sum("null_priority", alias_name="null_priority"),
                       Min("min_price", alias_name="min_price"),
                       Max("max_price", alias_name="max_price"),
                       Min("min_date", alias_name="min_date"),
                       Max("max_date", alias_name="max_date")))
    n_prio = (ds.select_columns(["o_orderpriority"])
              .groupby("o_orderpriority").aggregate(Count()).count())
    out = {k: [v] for k, v in prof.items()}
    out["distinct_priority"] = [int(n_prio)]
    t = pa.table(out)
    ints = [c for c in t.column_names if c.startswith(("n_", "null_", "distinct"))]
    for c in ints:
        t = t.set_column(t.column_names.index(c), c,
                         pc.cast(pc.round(t[c]), pa.int64()))
    return t


SQL_ORDERS_PROFILE = """
SELECT CAST(count(*) AS BIGINT) AS n_rows,
       CAST(count(*) - count(o_custkey) AS BIGINT) AS null_custkey,
       CAST(count(*) - count(o_totalprice) AS BIGINT) AS null_totalprice,
       CAST(count(*) - count(o_orderpriority) AS BIGINT) AS null_priority,
       min(o_totalprice) AS min_price, max(o_totalprice) AS max_price,
       min(o_orderdate) AS min_date, max(o_orderdate) AS max_date,
       CAST(count(DISTINCT o_orderpriority) AS BIGINT) AS distinct_priority
FROM orders
"""


def q_ship_window_agg(sf_dir):
    ds = _t(sf_dir, "lineitem", ["l_returnflag", "l_quantity", "l_shipdate"])

    def f(b: pa.Table) -> pa.Table:
        lo = pa.scalar(np.datetime64("1995-01-01", "us"), pa.timestamp("us"))
        hi = pa.scalar(np.datetime64("1996-01-01", "us"), pa.timestamp("us"))
        mask = pc.and_(pc.greater_equal(b["l_shipdate"], lo), pc.less(b["l_shipdate"], hi))
        return b.filter(mask)

    return (ds.map_batches(f, batch_format="pyarrow")
            .groupby("l_returnflag")
            .aggregate(Sum("l_quantity", alias_name="sum_qty"),
                       Count(alias_name="n_rows")))


SQL_SHIP_WINDOW_AGG = """
SELECT l_returnflag, sum(l_quantity) AS sum_qty, count(*) AS n_rows
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1995-01-01' AND l_shipdate < TIMESTAMP '1996-01-01'
GROUP BY l_returnflag
"""


def _broadcast_cols(sf_dir, table, key, val):
    """ray.put a (keys, values) Arrow pair for a small dimension table — read
    once, shipped once to the object store, probed zero-copy in every task."""
    t = pq.read_table(os.path.join(sf_dir, f"{table}.parquet"), columns=[key, val])
    return ray.put((t[key].combine_chunks(), t[val].combine_chunks()))


def _probe_cols(ref, col) -> pa.Array:
    """Vectorized broadcast-join projection: pc.index_in + take (no Python
    per-row dict lookups; missing keys surface as nulls)."""
    keys, vals = ray.get(ref)
    return pc.take(vals, pc.index_in(col, value_set=keys))


def q_orders_by_segment(sf_dir):
    """Broadcast hash join (small dimension side via ray.put — no shuffle;
    ray_guide 'Joins and lookups') then groupby; the projection is a vectorized
    index_in/take, not a per-row dict probe."""
    ref = _broadcast_cols(sf_dir, "customer", "c_custkey", "c_mktsegment")

    def join(b: pa.Table) -> pa.Table:
        return pa.table({"c_mktsegment": _probe_cols(ref, b["o_custkey"]),
                         "o_totalprice": b["o_totalprice"]})

    return (_t(sf_dir, "orders", ["o_custkey", "o_totalprice"])
            .map_batches(join, batch_format="pyarrow")
            .groupby("c_mktsegment")
            .aggregate(Count(alias_name="n_orders"),
                       Min("o_totalprice", alias_name="min_price"),
                       Max("o_totalprice", alias_name="max_price")))


SQL_ORDERS_BY_SEGMENT = """
SELECT c_mktsegment, count(*) AS n_orders,
       min(o_totalprice) AS min_price, max(o_totalprice) AS max_price
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
"""


def q_nation_region_counts(sf_dir):
    """Dimension join done right: nation has 25 rows, so it is a broadcast
    lookup (ray.put once, vectorized index_in probe per batch), NOT a shuffle
    join — an all-to-all exchange for a 25-row side is pure overhead at scale
    (and ray 2.49's Dataset.join additionally chokes on empty hash
    partitions). See q_customer_order_nations for the genuine two-big-sides
    shuffle-join demo."""
    ref = _broadcast_cols(sf_dir, "nation", "n_nationkey", "n_name")

    def join(b: pa.Table) -> pa.Table:
        return pa.table({"n_name": _probe_cols(ref, b["c_nationkey"])})

    return (_t(sf_dir, "customer", ["c_nationkey"])
            .map_batches(join, batch_format="pyarrow")
            .groupby("n_name").aggregate(Count(alias_name="n_customers")))


SQL_NATION_REGION_COUNTS = """
SELECT n_name, count(*) AS n_customers
FROM customer JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
"""


def q_customer_order_nations(sf_dir):
    """Two-big-sides join (orders ⋈ customer) + per-nation aggregate on the
    fused grouped_reduce co-partition shape (the q_regional_volume stage-B
    pattern): per-batch order partials pre-aggregate by custkey BEFORE the
    exchange, both sides co-partition via one tagged-union shuffle, and the
    partition fn finishes the per-custkey reduction, probes c_nationkey, and
    pre-collapses to ≤25 per-nation partial rows — so the final groupby
    touches ~n_parts×25 rows. One coarse all-to-all instead of Dataset.join's
    operator machinery. Settled at sf0.1 the two are at parity (~4 s each,
    measured round 4; the round-3 19.7 s Dataset.join artifact was
    session-state accumulation, fixed by bench session recycling) — the fused
    shape's win is scale: the orders side collapses to per-custkey partials
    BEFORE the exchange, so the shuffle carries ≤n_customers rows instead of
    every order. The raw Dataset.join path lives on as
    q_customer_order_nations_join (same SQL oracle) for engine-parity
    coverage."""

    def order_partial(b: pa.Table) -> pa.Table:
        g = (pa.table({"k": pc.cast(b["o_custkey"], pa.int64()),
                       "p": b["o_totalprice"]})
             .group_by("k")
             .aggregate([("p", "count"), ("p", "max"), ("p", "min")]))
        n = len(g)
        return pa.table({"k": g["k"],
                         "n": pc.cast(g["p_count"], pa.int64()),
                         "maxp": g["p_max"], "minp": g["p_min"],
                         "nat": pa.nulls(n, pa.int64()),
                         "src": pa.array(["l"] * n)})

    def tag_cust(b: pa.Table) -> pa.Table:
        n = b.num_rows
        return pa.table({"k": pc.cast(b["c_custkey"], pa.int64()),
                         "n": pa.nulls(n, pa.int64()),
                         "maxp": pa.nulls(n, pa.float64()),
                         "minp": pa.nulls(n, pa.float64()),
                         "nat": pc.cast(b["c_nationkey"], pa.int64()),
                         "src": pa.array(["r"] * n)})

    from ..core.groupops import grouped_reduce

    tagged = (_t(sf_dir, "orders", ["o_custkey", "o_totalprice"])
              .map_batches(order_partial, batch_format="pyarrow")
              .union(_t(sf_dir, "customer", ["c_custkey", "c_nationkey"])
                     .map_batches(tag_cust, batch_format="pyarrow")))

    def reduce_probe_nation(t: pa.Table) -> pa.Table:
        left = t.filter(pc.equal(t["src"], "l"))
        right = t.filter(pc.equal(t["src"], "r"))
        g = (left.select(["k", "n", "maxp", "minp"]).group_by("k")
             .aggregate([("n", "sum"), ("maxp", "max"), ("minp", "min")]))
        idx = pc.index_in(g["k"], value_set=right["k"].combine_chunks())
        nat = right["nat"].combine_chunks().take(idx)
        keep = pa.table({"nat": nat, "n": g["n_sum"], "maxp": g["maxp_max"],
                         "minp": g["minp_min"]}).filter(pc.is_valid(nat))
        pg = keep.group_by("nat").aggregate(
            [("n", "sum"), ("maxp", "max"), ("minp", "min")])
        return pa.table({"c_nationkey": pg["nat"], "n": pg["n_sum"],
                         "maxp": pg["maxp_max"], "minp": pg["minp_min"]})

    return _cast_int64(
        grouped_reduce(tagged, ["k"], reduce_probe_nation,
                       batch_format="pyarrow")
        .groupby("c_nationkey")
        .aggregate(Sum("n", alias_name="n_orders"),
                   Max("maxp", alias_name="max_price"),
                   Min("minp", alias_name="min_price")),
        ["n_orders"])


def q_customer_order_nations_join(sf_dir):
    """Distributed hash join with two genuinely large sides (orders ⋈ customer,
    both scale with the corpus) via Dataset.join — the engine's raw
    shuffle-join path (kept hash-checked alongside the fused co-partition
    re-expression above). The partition count scales with the cluster instead
    of being hardcoded; both sides are dense in the key domain, so no hash
    partition is empty."""
    try:
        ncpu = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    except Exception:
        ncpu = 8
    orders = _t(sf_dir, "orders", ["o_custkey", "o_totalprice"])
    cust = _t(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    joined = orders.join(cust, join_type="inner",
                         num_partitions=max(2, ncpu // 2),
                         on=("o_custkey",), right_on=("c_custkey",))
    return _cast_int64(
        joined.groupby("c_nationkey").aggregate(
            Count(alias_name="n_orders"),
            Max("o_totalprice", alias_name="max_price"),
            Min("o_totalprice", alias_name="min_price")),
        [],
    )


SQL_CUSTOMER_ORDER_NATIONS = """
SELECT c_nationkey, count(*) AS n_orders,
       max(o_totalprice) AS max_price, min(o_totalprice) AS min_price
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_nationkey
"""


def q_regional_volume(sf_dir, broadcast_orders_max: int = 2_000_000):
    """TPC-H Q5-shaped multi-join chain (lineitem ⋈ orders ⋈ customer ⋈ nation
    ⋈ region) as a guarded hybrid (the repo's standard shape — lm/pmi/dedup):

    FAST PATH (date-filtered orders ≤ ``broadcast_orders_max``): the selective
    1996 predicate makes the (orderkey → custkey) map a bounded side, so it is
    probed once with ``limit(n+1)`` and broadcast via ``ray.put`` — lineitem
    then streams through ONE map_batches that probes the map and
    pre-aggregates per custkey, leaving a single co-partitioned exchange
    (stage B below). Removes the full-fact all-to-all (the 604k-row stage-A
    shuffle that made this the slowest settled line, ~11.5 s → ~2 s/exchange
    floor).

    SCALE PATH (filter not selective enough to broadcast): stage A
    co-partitions per-batch lineitem partials with the filtered orders on
    orderkey via a tagged union; the partition fn finishes the per-order
    reduction AND probes o_custkey — aggregation and join fused into one
    pass, one row per 1996 order out.

    Either way, stage B (one coarse shuffle on custkey): per-custkey rows
    co-partition with customer (big at scale, so co-partitioned, NOT
    broadcast); the partition fn probes c_nationkey and pre-collapses to
    per-nation partials (≤25 rows/partition). Nation/region stay broadcast
    probes; the final groupby touches ~n_parts×25 rows. Both paths emit
    identical integer sums (order-free), so the SQL hash is path-invariant."""
    from ..core.groupops import grouped_reduce

    def in_1996(b: pa.Table) -> pa.Table:
        lo = pa.scalar(np.datetime64("1996-01-01", "us"), pa.timestamp("us"))
        hi = pa.scalar(np.datetime64("1997-01-01", "us"), pa.timestamp("us"))
        keep = pc.and_(pc.greater_equal(b["o_orderdate"], lo),
                       pc.less(b["o_orderdate"], hi))
        b = b.filter(keep)
        return pa.table({"k": pc.cast(b["o_orderkey"], pa.int64()),
                         "cust": pc.cast(b["o_custkey"], pa.int64())})

    orders_f = _t(sf_dir, "orders",
                  ["o_orderkey", "o_custkey", "o_orderdate"]) \
        .map_batches(in_1996, batch_format="pyarrow")
    probe = orders_f.limit(broadcast_orders_max + 1).take_all()

    if len(probe) <= broadcast_orders_max:
        # FAST PATH: broadcast the (orderkey → custkey) map once.
        ok = np.fromiter((r["k"] for r in probe), dtype=np.int64, count=len(probe))
        oc = np.fromiter((r["cust"] for r in probe), dtype=np.int64,
                         count=len(probe))
        ref = ray.put((pa.array(ok), oc))

        def li_probe_partial(b: pa.Table) -> pa.Table:
            keys, cust_np = ray.get(ref)
            idx = pc.index_in(pc.cast(b["l_orderkey"], pa.int64()),
                              value_set=keys)
            m = pc.is_valid(idx)
            qty = pc.cast(pc.round(b["l_quantity"]), pa.int64()).filter(m)
            cust = pa.array(cust_np[idx.filter(m).to_numpy(zero_copy_only=False)])
            g = pa.table({"k": cust, "qty": qty}).group_by("k").aggregate(
                [("qty", "sum"), ("qty", "count")])
            n = len(g)
            return pa.table({"k": g["k"], "qty": g["qty_sum"],
                             "n": pc.cast(g["qty_count"], pa.int64()),
                             "cust": pa.nulls(n, pa.int64()),
                             "src": pa.array(["l"] * n)})

        per_order = _t(sf_dir, "lineitem", ["l_orderkey", "l_quantity"]) \
            .map_batches(li_probe_partial, batch_format="pyarrow")
    else:
        # SCALE PATH: co-partition lineitem partials with filtered orders.
        def li_partial(b: pa.Table) -> pa.Table:
            qty = pc.cast(pc.round(b["l_quantity"]), pa.int64())
            g = pa.table({"k": b["l_orderkey"], "qty": qty}).group_by("k") \
                .aggregate([("qty", "sum"), ("qty", "count")])
            n = len(g)
            return pa.table({"k": pc.cast(g["k"], pa.int64()),
                             "qty": g["qty_sum"],
                             "n": pc.cast(g["qty_count"], pa.int64()),
                             "cust": pa.nulls(n, pa.int64()),
                             "src": pa.array(["l"] * n)})

        def tag_orders(b: pa.Table) -> pa.Table:
            n = b.num_rows
            return pa.table({"k": b["k"],
                             "qty": pa.nulls(n, pa.int64()),
                             "n": pa.nulls(n, pa.int64()),
                             "cust": b["cust"],
                             "src": pa.array(["r"] * n)})

        tagged_a = (_t(sf_dir, "lineitem", ["l_orderkey", "l_quantity"])
                    .map_batches(li_partial, batch_format="pyarrow")
                    .union(orders_f.map_batches(tag_orders,
                                                batch_format="pyarrow")))

        def reduce_probe_order(t: pa.Table) -> pa.Table:
            left = t.filter(pc.equal(t["src"], "l"))
            right = t.filter(pc.equal(t["src"], "r"))
            g = left.select(["k", "qty", "n"]).group_by("k").aggregate(
                [("qty", "sum"), ("n", "sum")])
            idx = pc.index_in(g["k"], value_set=right["k"].combine_chunks())
            cust = right["cust"].combine_chunks().take(idx)
            out = pa.table({"k": cust, "qty": g["qty_sum"], "n": g["n_sum"],
                            "cust": pa.nulls(len(g), pa.int64()),
                            "src": pa.array(["l"] * len(g))})
            return out.filter(pc.is_valid(cust))

        per_order = grouped_reduce(tagged_a, ["k"], reduce_probe_order,
                                   batch_format="pyarrow")

    def tag_cust(b: pa.Table) -> pa.Table:
        n = b.num_rows
        return pa.table({"k": pc.cast(b["c_custkey"], pa.int64()),
                         "qty": pa.nulls(n, pa.int64()),
                         "n": pa.nulls(n, pa.int64()),
                         "cust": pc.cast(b["c_nationkey"], pa.int64()),
                         "src": pa.array(["r"] * n)})

    tagged_b = per_order.union(
        _t(sf_dir, "customer", ["c_custkey", "c_nationkey"])
        .map_batches(tag_cust, batch_format="pyarrow"))

    def probe_nation_partial(t: pa.Table) -> pa.Table:
        left = t.filter(pc.equal(t["src"], "l"))
        right = t.filter(pc.equal(t["src"], "r"))
        idx = pc.index_in(left["k"], value_set=right["k"].combine_chunks())
        nat = right["cust"].combine_chunks().take(idx)
        keep = pa.table({"nat": nat, "qty": left["qty"], "n": left["n"]}
                        ).filter(pc.is_valid(nat))
        g = keep.group_by("nat").aggregate([("qty", "sum"), ("n", "sum")])
        return pa.table({"c_nationkey": g["nat"], "qty": g["qty_sum"],
                         "n": g["n_sum"]})

    with_nat = grouped_reduce(tagged_b, ["k"], probe_nation_partial,
                              batch_format="pyarrow")

    nname = _broadcast_cols(sf_dir, "nation", "n_nationkey", "n_name")
    nreg = _broadcast_cols(sf_dir, "nation", "n_nationkey", "n_regionkey")
    rname = _broadcast_cols(sf_dir, "region", "r_regionkey", "r_name")

    def dims(b: pa.Table) -> pa.Table:
        return pa.table({
            "r_name": _probe_cols(rname, _probe_cols(nreg, b["c_nationkey"])),
            "n_name": _probe_cols(nname, b["c_nationkey"]),
            "qty": b["qty"], "n": b["n"]})

    return _cast_int64(
        with_nat.map_batches(dims, batch_format="pyarrow")
        .groupby(["r_name", "n_name"])
        .aggregate(Sum("qty", alias_name="sum_qty"),
                   Sum("n", alias_name="n_items")),
        ["sum_qty", "n_items"])


SQL_REGIONAL_VOLUME = """
SELECT r_name, n_name,
       CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
       count(*) AS n_items
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1997-01-01'
GROUP BY r_name, n_name
"""


def q_events_before_order(sf_dir):
    """Range join with NO driver materialization of the fact side: for each
    order, count events with ts <= o_orderdate. Plumbing (exact):

    1. distinct order dates (bounded cardinality: one per calendar day) form
       the sorted cut-point array — the only thing broadcast;
    2. events stream once through a map_batches histogram — each event maps via
       searchsorted to its first cut >= ts, emitting per-batch (cut_idx, n)
       partials (pre-aggregation inside the map, ray_guide 'Aggregation');
    3. a tiny groupby(cut_idx) reduce + driver prefix-sum over <= #dates rows;
    4. orders stream and probe the broadcast prefix table.

    Only per-date partial counts cross the wire; the events column is never
    collected (the previous version ray.put the whole fact column — a
    driver-side big-side materialization that dies at 100x)."""
    orders = _t(sf_dir, "orders", ["o_orderkey", "o_orderdate"])
    cuts = np.sort(np.array(
        [np.datetime64(d, "us") for d in orders.unique("o_orderdate")],
        dtype="datetime64[us]").astype(np.int64))
    cuts_ref = ray.put(cuts)

    def hist(b: pa.Table) -> pa.Table:
        c = ray.get(cuts_ref)
        ts = pc.cast(b["ts"], pa.timestamp("us")).to_numpy(
            zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
        idx = np.searchsorted(c, ts, side="left")  # first cut >= ts
        idx = idx[idx < len(c)]  # events after the last order date count nowhere
        counts = np.bincount(idx, minlength=len(c))
        nz = np.flatnonzero(counts)
        return pa.table({"cut_idx": pa.array(nz, pa.int64()),
                         "n": pa.array(counts[nz], pa.int64())})

    partial = (_t(sf_dir, "events", ["ts"])
               .map_batches(hist, batch_format="pyarrow")
               .groupby("cut_idx").aggregate(Sum("n", alias_name="n")))
    h = np.zeros(len(cuts), dtype=np.int64)
    for r in partial.take_all():  # <= one row per distinct order date — tiny
        h[int(r["cut_idx"])] = int(r["n"])
    prefix_ref = ray.put(np.cumsum(h))

    def probe(b: pa.Table) -> pa.Table:
        c, p = ray.get(cuts_ref), ray.get(prefix_ref)
        od = pc.cast(b["o_orderdate"], pa.timestamp("us")).to_numpy(
            zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
        pos = np.searchsorted(c, od, side="left")  # an orderdate IS a cut: exact
        return pa.table({"o_orderkey": b["o_orderkey"],
                         "n_events_before": pa.array(p[pos], pa.int64())})

    return orders.map_batches(probe, batch_format="pyarrow")


SQL_EVENTS_BEFORE_ORDER = """
SELECT o_orderkey,
       (SELECT count(*) FROM events e WHERE e.ts <= o.o_orderdate) AS n_events_before
FROM orders o
"""


def q_event_last_order(sf_dir):
    """As-of join: for every event, the most recent order AS OF its timestamp
    (latest o_orderdate <= ts; deterministic tie-break = max o_orderkey per
    date). Plumbing mirrors q_events_before_order's scale shape: order dates
    are bounded (one per calendar day), so the (date, key) table reduces via a
    tiny groupby and broadcasts; the event side streams through one vectorized
    searchsorted probe — the fact table never leaves the cluster and there is
    no all-to-all shuffle. Events before the first order date drop (inner
    as-of)."""
    per_date = (_t(sf_dir, "orders", ["o_orderdate", "o_orderkey"])
                .groupby("o_orderdate")
                .aggregate(Max("o_orderkey", alias_name="o_orderkey"))
                .take_all())  # <= one row per distinct order date — tiny
    per_date.sort(key=lambda r: r["o_orderdate"])
    cuts = np.array([np.datetime64(r["o_orderdate"], "us") for r in per_date],
                    dtype="datetime64[us]").astype(np.int64)
    keys = np.array([r["o_orderkey"] for r in per_date], dtype=np.int64)
    ref = ray.put((cuts, keys))

    def probe(b: pa.Table) -> pa.Table:
        c, k = ray.get(ref)
        ts_us = pc.cast(b["ts"], pa.timestamp("us")).to_numpy(
            zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
        pos = np.searchsorted(c, ts_us, side="right") - 1  # latest date <= ts
        keep = pos >= 0
        eid = b["event_id"]
        if isinstance(eid, pa.ChunkedArray):
            eid = eid.combine_chunks()
        return pa.table({
            "event_id": eid.take(pa.array(np.flatnonzero(keep))),
            "o_orderkey": pa.array(k[pos[keep]], pa.int64()),
        })

    return _t(sf_dir, "events", ["event_id", "ts"]).map_batches(
        probe, batch_format="pyarrow")


SQL_EVENT_LAST_ORDER = """
WITH d AS (SELECT o_orderdate, max(o_orderkey) AS o_orderkey
           FROM orders GROUP BY 1)
SELECT e.event_id, d.o_orderkey
FROM events e ASOF JOIN d ON e.ts >= d.o_orderdate
"""


def q_top_orders_per_segment(sf_dir):
    """Grouped top-k (windowed rank analog): top-3 orders by price per market
    segment. Pre-aggregation pattern: each batch keeps only its own per-segment
    top-3 (vectorized pandas sort+head), so the final tiny 5-group reduce sees
    at most 3×batches rows — never a global sort."""
    import pandas as pd

    ref = _broadcast_cols(sf_dir, "customer", "c_custkey", "c_mktsegment")
    k = 3

    def partial(b: pa.Table) -> pa.Table:
        df = pa.table({"c_mktsegment": _probe_cols(ref, b["o_custkey"]),
                       "o_orderkey": b["o_orderkey"],
                       "o_totalprice": b["o_totalprice"]}).to_pandas()
        df = df.sort_values(["o_totalprice", "o_orderkey"],
                            ascending=[False, True], kind="mergesort")
        return pa.Table.from_pandas(df.groupby("c_mktsegment", sort=False).head(k),
                                    preserve_index=False)

    def final(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["o_totalprice", "o_orderkey"],
                          ascending=[False, True], kind="mergesort").head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g

    return (_t(sf_dir, "orders", ["o_custkey", "o_orderkey", "o_totalprice"])
            .map_batches(partial, batch_format="pyarrow")
            .groupby("c_mktsegment")
            .map_groups(final, batch_format="pandas"))


SQL_TOP_ORDERS_PER_SEGMENT = """
WITH j AS (
  SELECT c_mktsegment, o_orderkey, o_totalprice
  FROM orders JOIN customer ON o_custkey = c_custkey),
r AS (
  SELECT *, row_number() OVER (PARTITION BY c_mktsegment
                               ORDER BY o_totalprice DESC, o_orderkey) AS rank
  FROM j)
SELECT c_mktsegment, o_orderkey, o_totalprice, rank FROM r WHERE rank <= 3
"""


def q_sample_orders(sf_dir):
    """Deterministic ~10% hash sample (training-data reproducible-sample op):
    stateless filter, no shuffle; membership = first md5 byte of the key."""
    from ..functions.sampling import deterministic_sample

    return deterministic_sample(
        _t(sf_dir, "orders", ["o_orderkey", "o_totalprice"]),
        "o_orderkey", keep_bytes=26)


SQL_SAMPLE_ORDERS = """
SELECT o_orderkey, o_totalprice FROM orders
WHERE substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 2) < '1a'
"""


def q_upsample_docs(sf_dir):
    """Deterministic fractional upsampling (mixture weight 2 + 77/256 ≈ 2.3):
    every doc appears in epochs 0 and 1, and in epoch 2 iff its salted md5
    falls under 77/256 — the LLM data-recipe weighting op
    (``functions/sampling.py::upsample_mixture``). The epoch salt means the
    fractional subset differs from what a plain 77/256 sample would pick."""
    from ..functions.sampling import upsample_mixture

    return upsample_mixture(_docs(sf_dir, ["doc_id"]), "doc_id",
                            n_full=2, frac_bytes=77)


SQL_UPSAMPLE_DOCS = """
SELECT doc_id, epoch
FROM documents, (SELECT unnest(range(0, 3)) AS epoch)
WHERE epoch < 2
   OR substr(md5(CAST(doc_id AS VARCHAR) || ':2'), 1, 2) < '4d'
"""


def q_stratified_customers(sf_dir):
    """Stratified deterministic sample (class-rebalancing op for training
    data): BUILDING keeps ~20% (51/256), MACHINERY ~5% (13/256), every other
    segment ~1.2% (3/256). Hash-checked on the sampled MEMBERSHIP itself —
    the returned (key, stratum) rows — not just counts. Stateless filter,
    no shuffle."""
    from ..functions.sampling import stratified_sample

    return stratified_sample(
        _t(sf_dir, "customer", ["c_custkey", "c_mktsegment"]),
        "c_custkey", "c_mktsegment",
        rates={"BUILDING": 51, "MACHINERY": 13}, default_bytes=3)


SQL_STRATIFIED_CUSTOMERS = """
SELECT c_custkey, c_mktsegment FROM customer
WHERE substr(md5(CAST(c_custkey AS VARCHAR)), 1, 2) <
      CASE c_mktsegment WHEN 'BUILDING' THEN '33'
                        WHEN 'MACHINERY' THEN '0d'
                        ELSE '03' END
"""


def q_source_top_docs(sf_dir):
    """Per-group ordered collect: the 3 longest docs per source, materialized
    as an ordered comma-joined id string (the grouped string_agg / collect_list
    family). Scale shape = grouped top-k: every batch keeps only its own top-3
    per source (one lexsort + segment mask, vectorized), so the exchange
    carries ≤ 3·sources rows per batch; the final per-group join runs on ≤ 3
    rows per group."""
    from ..core.groupops import grouped_reduce
    from ..functions.analytic import _sort_segments

    def top3(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t
        t = t.append_column("__neg", pc.multiply(t["n_chars"], pa.scalar(-1)))
        st, _first, seg_start = _sort_segments(t, "source", ["__neg", "doc_id"])
        rn0 = np.arange(st.num_rows, dtype=np.int64) - seg_start
        return st.filter(pa.array(rn0 < 3)).drop_columns(["__neg"])

    ds = (_t(sf_dir, "documents", ["doc_id", "source", "n_chars"])
          .map_batches(top3, batch_format="pyarrow"))

    def fin(t: pa.Table) -> pa.Table:
        t2 = top3(t)
        src = t2["source"].to_numpy(zero_copy_only=False)
        ids = t2["doc_id"].to_numpy(zero_copy_only=False)
        out_s, out_ids = [], []
        i = 0
        while i < len(src):
            j = i
            while j < len(src) and src[j] == src[i]:
                j += 1
            out_s.append(src[i])
            out_ids.append(",".join(str(x) for x in ids[i:j]))
            i = j
        return pa.table({"source": pa.array(out_s, pa.string()),
                         "top_docs": pa.array(out_ids, pa.string())})

    return grouped_reduce(ds, ["source"], fin, n_parts=8,
                          batch_format="pyarrow")


SQL_SOURCE_TOP_DOCS = """
WITH t AS (
  SELECT source, doc_id,
         row_number() OVER (PARTITION BY source
                            ORDER BY n_chars DESC, doc_id) AS rn
  FROM documents)
SELECT source, string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY rn) AS top_docs
FROM t WHERE rn <= 3 GROUP BY source
"""


def q_rebalance_sources(sf_dir):
    """Uniform mixture balancing: every source downsampled to ≈ the smallest
    source's count with DATA-DERIVED integer rates (``rebalance_rates``:
    bounded counts pass → rate = min(255, (256·min)//n) → stateless md5
    filter). Hash-checked on the sampled membership itself; the SQL mirror
    recomputes the identical rates from the same GROUP BY counts."""
    from ..functions.sampling import rebalance_to_uniform

    return rebalance_to_uniform(_t(sf_dir, "documents", ["doc_id", "source"]),
                                "doc_id", "source")


SQL_REBALANCE_SOURCES = """
WITH cnt AS (SELECT source, count(*) AS n FROM documents GROUP BY source),
mn AS (SELECT min(n) AS m FROM cnt),
rate AS (SELECT source, LEAST(255, (256 * m) // n) AS r FROM cnt CROSS JOIN mn)
SELECT d.doc_id, d.source
FROM documents d JOIN rate USING (source)
WHERE substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 2) < printf('%02x', r)
"""


def q_weighted_sample_orders(sf_dir):
    """Deterministic weighted sample without replacement (Efraimidis–Spirakis
    ln(u)/w top-k; inclusion ∝ o_totalprice), SQL-hash-checked: the score is
    pico-quantized from one fixed IEEE expression both engines share
    (md5-uniform of the key via hex-substr cast, ``ln(u)/w*1e12`` floored)
    and quantized ties break on the key, so the selected row set is
    engine-independent (see ``functions/sampling.py::weighted_sample_topk``
    for the boundary caveat)."""
    from ..functions.sampling import weighted_sample_topk

    return weighted_sample_topk(
        _t(sf_dir, "orders", ["o_orderkey", "o_totalprice"]),
        "o_orderkey", "o_totalprice", k=100)


SQL_WEIGHTED_SAMPLE_ORDERS = """
WITH scored AS (
  SELECT o_orderkey, o_totalprice,
         CAST(floor(
             ln((CAST(CAST(concat('0x',
                      substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 16))
                  AS UBIGINT) AS DOUBLE) + 0.5) / 18446744073709551616.0)
             / CAST(o_totalprice AS DOUBLE) * 1e12 + 0.5) AS BIGINT) AS q
  FROM orders)
SELECT o_orderkey, o_totalprice
FROM scored ORDER BY q DESC, o_orderkey LIMIT 100
"""


def q_dsir_sample(sf_dir):
    """DSIR-shaped importance RESAMPLING (Xie et al. 2023, arXiv 2302.03169):
    re-weight every document by an LM-derived importance weight, then draw a
    deterministic weighted sample without replacement. Here the weight is the
    corpus bigram-LM average log-likelihood shifted positive
    (``avg_ll_e9 - min + 1`` — higher-likelihood docs oversampled); with a
    second (target-domain) LM the weight becomes the two scores' difference
    and NOTHING else in the pipeline changes — the composition (score pass →
    bounded min → stateless weight column → Efraimidis–Spirakis top-k with
    per-batch partial pruning) is the production shape.

    SQL-hash-checked end to end: integer LM scores (`lm_doc_score` mirror),
    integer weights, and the pico-quantized single-IEEE-expression ES score
    with key tie-break (`weighted_sample_orders` pattern)."""
    from ..functions.lm import lm_bigram_score
    from ..functions.sampling import weighted_sample_topk

    scored = lm_bigram_score(_docs_wide(sf_dir, ["doc_id", "text"]))

    def avg(b: pa.Table) -> pa.Table:
        ll = b["ll_e9"].to_numpy(zero_copy_only=False).astype(np.float64)
        n = b["n_bigrams"].to_numpy(zero_copy_only=False).astype(np.float64)
        a = np.floor(ll / n).astype(np.int64)
        return pa.table({"doc_id": b["doc_id"],
                         "avg_ll_e9": pa.array(a, pa.int64())})

    av = scored.map_batches(avg, batch_format="pyarrow").materialize()
    lo = int(av.min("avg_ll_e9"))

    def wcol(b: pa.Table) -> pa.Table:
        w = b["avg_ll_e9"].to_numpy(zero_copy_only=False) - lo + 1
        return b.append_column("imp_w", pa.array(w, pa.int64()))

    return weighted_sample_topk(av.map_batches(wcol, batch_format="pyarrow"),
                                "doc_id", "imp_w", k=50)


SQL_DSIR_SAMPLE = f"""
WITH lmres AS ({SQL_LM_DOC_SCORE}),
score AS (
  SELECT doc_id, CAST(floor(CAST(ll_e9 AS DOUBLE) / CAST(n_bigrams AS DOUBLE))
                      AS BIGINT) AS avg_ll_e9
  FROM lmres),
mn AS (SELECT min(avg_ll_e9) AS lo FROM score),
w AS (SELECT doc_id, avg_ll_e9, avg_ll_e9 - lo + 1 AS imp_w
      FROM score CROSS JOIN mn),
sc AS (
  SELECT doc_id, avg_ll_e9, imp_w,
         CAST(floor(
             ln((CAST(CAST(concat('0x',
                      substr(md5(CAST(doc_id AS VARCHAR)), 1, 16))
                  AS UBIGINT) AS DOUBLE) + 0.5) / 18446744073709551616.0)
             / CAST(imp_w AS DOUBLE) * 1e12 + 0.5) AS BIGINT) AS q
  FROM w)
SELECT doc_id, avg_ll_e9, CAST(imp_w AS BIGINT) AS imp_w
FROM sc ORDER BY q DESC, doc_id LIMIT 50
"""


def q_bpe_merges(sf_dir):
    """BPE tokenizer TRAINING — learn the first 5 merge rules from corpus
    word-type frequencies (``functions/bpe.py``; Sennrich et al. 2016). The
    corpus is touched ONCE (vectorized tokenize + value_counts partials →
    vocabulary-scale groupby); every merge iteration runs over the TYPE table
    only (pair-count partials → tiny groupby → bounded top-1 → one Arrow
    ``replace_substring`` pass). SQL-hash-checked: the mirror unrolls the 5
    iterations as CTE stages over the identical doubled-separator symbol
    encoding, whose left-to-right non-overlapping `replace` reproduces greedy
    BPE merging bit-identically in Arrow, Python, and DuckDB."""
    from ..functions.bpe import bpe_merges

    def partial(b: pa.Table) -> pa.Table:
        t = b["text"]
        if isinstance(t, pa.ChunkedArray):
            t = t.combine_chunks()
        toks = pc.split_pattern_regex(pc.fill_null(t, ""),
                                      pattern=r"[ \t\n\r\f]+")
        flat = pc.list_flatten(toks)
        flat = flat.filter(pc.not_equal(flat, ""))
        vc = pc.value_counts(flat)
        return pa.table({"tok": vc.field("values"),
                         "n": pc.cast(vc.field("counts"), pa.int64())})

    types = (_docs(sf_dir, ["text"])
             .map_batches(partial, batch_format="pyarrow")
             .groupby("tok").aggregate(Sum("n", alias_name="n")))
    return bpe_merges(types, 5)


def _bpe_ctes(n_merges: int) -> list[str]:
    """Shared CTE chain for the unrolled DuckDB BPE mirrors (one stage per
    merge; `tok` rides along so the encode mirror can map types back)."""
    s2 = "chr(31)||chr(31)"
    ctes = [
        """toks AS (
  SELECT unnest(list_filter(regexp_split_to_array(text, '[ \t\n\r\f]+'),
                            x -> x <> '')) AS tok
  FROM documents)""",
        "types AS (SELECT tok, count(*) AS n FROM toks GROUP BY tok)",
        f"w0 AS (SELECT tok, {s2}||array_to_string("
        f"regexp_extract_all(tok, '.'), {s2})||{s2} AS sym, n FROM types)",
    ]
    for i in range(1, n_merges + 1):
        ctes += [
            f"""p{i} AS (
  SELECT unnest(list_zip(ls, ls[2:])) AS z, n
  FROM (SELECT list_filter(string_split(sym, {s2}), x -> x <> '') AS ls, n
        FROM w{i - 1}))""",
            f"c{i} AS (SELECT z[1] AS a, z[2] AS b, CAST(sum(n) AS BIGINT)"
            f" AS c FROM p{i} WHERE z[2] IS NOT NULL GROUP BY 1, 2)",
            f"t{i} AS (SELECT a, b, c FROM c{i} ORDER BY c DESC, a, b"
            f" LIMIT 1)",
            f"w{i} AS (SELECT tok, replace(sym, chr(31)||a||{s2}||b||chr(31),"
            f" chr(31)||a||b||chr(31)) AS sym, n FROM w{i - 1} CROSS JOIN"
            f" t{i})",
        ]
    return ctes


def _bpe_sql(n_merges: int) -> str:
    sel = "\nUNION ALL\n".join(
        f"SELECT {i} AS it, a, b, a||b AS merged, c AS cnt FROM t{i}"
        for i in range(1, n_merges + 1))
    return "WITH " + ",\n".join(_bpe_ctes(n_merges)) + "\n" + sel


SQL_BPE_MERGES = _bpe_sql(5)


def q_bpe_token_counts(sf_dir):
    """BPE ENCODE at corpus scale: per-document BPE token count under the 5
    learned merges. The merge table (bounded) is applied to the TYPE table
    (k vectorized replace passes, `functions/bpe.py::bpe_symbol_counts`),
    then the tok→symbol-count map broadcasts into one shuffle-free corpus
    pass (dictionary-encoded lookup + segmented int sum per batch) — the
    production tokenizer-apply shape: merges ship to workers, the corpus
    never shuffles. Integer-exact ⇒ SQL-hash-checked against the unrolled
    merge-chain mirror."""
    from ..functions.bpe import bpe_merges, bpe_symbol_counts

    def partial(b: pa.Table) -> pa.Table:
        t = b["text"]
        if isinstance(t, pa.ChunkedArray):
            t = t.combine_chunks()
        toks = pc.split_pattern_regex(pc.fill_null(t, ""),
                                      pattern=r"[ \t\n\r\f]+")
        flat = pc.list_flatten(toks)
        flat = flat.filter(pc.not_equal(flat, ""))
        vc = pc.value_counts(flat)
        return pa.table({"tok": vc.field("values"),
                         "n": pc.cast(vc.field("counts"), pa.int64())})

    types = (_docs(sf_dir, ["text"])
             .map_batches(partial, batch_format="pyarrow")
             .groupby("tok").aggregate(Sum("n", alias_name="n"))
             .materialize())
    merges = bpe_merges(types, 5)
    kmap = {r["tok"]: r["k"]
            for r in bpe_symbol_counts(types, merges).take_all()}

    def count(b: pa.Table) -> pa.Table:
        t = b["text"]
        if isinstance(t, pa.ChunkedArray):
            t = t.combine_chunks()
        toks = pc.split_pattern_regex(pc.fill_null(t, ""),
                                      pattern=r"[ \t\n\r\f]+")
        flat = pc.list_flatten(toks)
        parent = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
        valid = pc.not_equal(flat, "").to_numpy(
            zero_copy_only=False).astype(bool)
        denc = flat.dictionary_encode()
        ku = np.array([kmap.get(t, 0) for t in denc.dictionary.to_pylist()],
                      np.int64) if len(denc.dictionary) else np.zeros(0,
                                                                      np.int64)
        idx = denc.indices.to_numpy(zero_copy_only=False)
        w = np.where(valid, ku[idx] if len(ku) else 0, 0)
        tot = np.bincount(parent, weights=w.astype(np.float64),
                          minlength=len(b)).astype(np.int64)
        return pa.table({"doc_id": b["doc_id"],
                         "n_bpe_tokens": pa.array(tot, pa.int64())})

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        count, batch_format="pyarrow")


def _bpe_counts_sql(n_merges: int) -> str:
    s2 = "chr(31)||chr(31)"
    tail = f"""nm AS (
  SELECT tok, CAST(len(list_filter(string_split(sym, {s2}), x -> x <> ''))
              AS BIGINT) AS k
  FROM w{n_merges}),
dt AS (
  SELECT doc_id,
         unnest(list_filter(regexp_split_to_array(text, '[ \t\n\r\f]+'),
                            x -> x <> '')) AS tok
  FROM documents),
per AS (SELECT dt.doc_id, sum(nm.k) AS s FROM dt JOIN nm USING (tok)
        GROUP BY dt.doc_id)
SELECT d.doc_id, CAST(COALESCE(per.s, 0) AS BIGINT) AS n_bpe_tokens
FROM documents d LEFT JOIN per ON per.doc_id = d.doc_id"""
    return "WITH " + ",\n".join(_bpe_ctes(n_merges)) + ",\n" + tail


SQL_BPE_TOKEN_COUNTS = _bpe_counts_sql(5)


def q_token_budget_select(sf_dir):
    """DataComp-style token-budget curation cut, SQL-hash-checked: rank docs
    by (quality_ppm DESC, doc_id), keep the prefix fitting entirely within a
    40%-of-corpus token budget. One enrichment pass (token count + the
    bit-exact quality ppm), one bounded sum for the budget, then the
    composite-key ``global_prefix_sum`` shape — only (key, n_tokens) moves
    (``functions/sampling.py::token_budget_select``). Mirror: window
    ``sum(w) OVER (ORDER BY q DESC, doc_id)`` + the same integer budget."""
    from ..functions.sampling import token_budget_select

    def enrich(b: pa.Table) -> pa.Table:
        ppm = np.floor(ts.quality_raw(b) * 1000000.0).astype(np.int64)
        return pa.table({
            "doc_id": b["doc_id"],
            "n_tokens": pc.cast(pc.count_substring_regex(
                b["text"], pattern=ts.TOKEN_PAT), pa.int64()),
            "quality_ppm": pa.array(ppm)})

    # materialize the 24 B/row projection ONCE: the budget sum and the
    # prefix-sum passes must not re-run the tokenize/quality regexes
    enriched = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        enrich, batch_format="pyarrow").materialize()
    total = enriched.sum("n_tokens")
    budget = (int(total) * 2) // 5
    return token_budget_select(enriched, "doc_id", "n_tokens",
                               "quality_ppm", budget)


SQL_TOKEN_BUDGET_SELECT = f"""
WITH q AS ({SQL_QUALITY_SCORE}),
s AS (
  SELECT d.doc_id,
         CAST(array_length(regexp_extract_all(d.text, '{ts.TOKEN_PAT}'))
              AS BIGINT) AS n_tokens,
         q.quality_ppm
  FROM documents d JOIN q ON q.doc_id = d.doc_id),
tot AS (SELECT sum(n_tokens) AS tw FROM s),
r AS (
  SELECT doc_id, n_tokens,
         CAST(COALESCE(sum(n_tokens) OVER (
             ORDER BY quality_ppm DESC, doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS BIGINT) AS start_tok
  FROM s)
SELECT doc_id, n_tokens, start_tok
FROM r, tot WHERE start_tok + n_tokens <= (tw * 2) // 5
"""


def q_classifier_scores(sf_dir):
    """fastText-shape linear classifier INFERENCE over the corpus
    (``functions/classify.py``): the weight vector is put in the object store
    once (``ray.put``) and read zero-copy in each scoring actor's
    ``__init__``; scoring is a stateless shuffle-free ``map_batches`` pass
    (one md5 token-hash gather + one segmented integer sum per batch).

    SQL-hash-checked end to end: weights are the deterministic
    ``synth_weights`` vector ``md5_number_lower(bucket) % 1001 - 500`` and the
    score is an exact int64 bag-of-words sum, so DuckDB reproduces every bit
    (same ``md5_number_lower`` tokens-hash mirror as `doc_features_knn`)."""
    from ..functions.classify import linear_classify

    return linear_classify(_docs(sf_dir, ["doc_id", "text"]), dim=256)


SQL_CLASSIFIER_SCORES = """
WITH toks AS (
  SELECT doc_id, unnest(list_filter(regexp_split_to_array(text, '[ \t\n\r\f]+'),
                                    x -> x <> '')) AS tok
  FROM documents),
sc AS (
  SELECT doc_id,
         SUM(CAST(md5_number_lower(CAST(md5_number_lower(tok) % 256 AS VARCHAR))
                  % 1001 AS BIGINT) - 500) AS clf_score
  FROM toks GROUP BY doc_id)
SELECT d.doc_id,
       CAST(COALESCE(sc.clf_score, 0) AS BIGINT) AS clf_score,
       CASE WHEN COALESCE(sc.clf_score, 0) >= 0
            THEN 'keep' ELSE 'drop' END AS clf_label
FROM documents d LEFT JOIN sc USING (doc_id)
"""


def q_props_extract(sf_dir):
    """Semi-structured sidecar-metadata extraction at corpus scale
    (``functions/semistruct.py``): pull the int field ``k`` out of the flat
    JSON ``props`` column with ONE vectorized ``pc.extract_regex`` kernel per
    batch (no per-row Python, no JSON parser in the hot path — the
    WARC-header / provenance-blob access shape), then a low-cardinality
    grouped aggregate. SQL-hash-checked: the mirror is the identical
    ``regexp_extract`` + BIGINT cast, and every output is an exact integer."""
    from ..functions.semistruct import extract_int_field

    def ex(b: pa.Table) -> pa.Table:
        return pa.table({"event_type": b["event_type"],
                         "k": extract_int_field(b["props"], "k")})

    return (_t(sf_dir, "events", ["event_type", "props"])
            .map_batches(ex, batch_format="pyarrow")
            .groupby("event_type")
            .aggregate(Count(alias_name="n_events"),
                       Sum("k", alias_name="sum_k"),
                       Min("k", alias_name="min_k"),
                       Max("k", alias_name="max_k")))


SQL_PROPS_EXTRACT = """
WITH ex AS (
  SELECT event_type,
         TRY_CAST(NULLIF(regexp_extract(props, '"k"\\s*:\\s*(-?\\d+)', 1), '')
                  AS BIGINT) AS k
  FROM events)
SELECT event_type, count(*) AS n_events, CAST(sum(k) AS BIGINT) AS sum_k,
       min(k) AS min_k, max(k) AS max_k
FROM ex GROUP BY event_type
"""


def q_classifier_calibrated(sf_dir):
    """Classifier-threshold CALIBRATION: instead of a fixed cutoff, derive the
    keep/drop threshold from the corpus itself — the exact 30th-percentile
    classifier score via the distributed discrete-quantile pass (the DataComp
    keep-rate-targeting move: "keep the top 70%"), then a stateless label
    pass. Composition of `classifier_scores` + `_exact_disc_quantiles`, both
    integer-exact ⇒ SQL-hash-checked."""
    from ..functions.classify import linear_classify

    scored = linear_classify(_docs(sf_dir, ["doc_id", "text"]),
                             dim=256).materialize()
    (cut,) = _exact_disc_quantiles(scored, "clf_score", [0.30])

    def lab(b: pa.Table) -> pa.Table:
        s = b["clf_score"].to_numpy(zero_copy_only=False)
        lb = np.where(s > cut, "keep", "drop")
        return pa.table({"doc_id": b["doc_id"], "clf_score": b["clf_score"],
                         "cal_label": pa.array(lb.tolist(), pa.string())})

    return scored.map_batches(lab, batch_format="pyarrow")


SQL_CLASSIFIER_CALIBRATED = f"""
WITH sc AS ({SQL_CLASSIFIER_SCORES}),
cut AS (SELECT quantile_disc(clf_score, 0.30) AS c FROM sc)
SELECT doc_id, clf_score,
       CASE WHEN clf_score > c THEN 'keep' ELSE 'drop' END AS cal_label
FROM sc CROSS JOIN cut
"""


def q_split_counts(sf_dir):
    """Deterministic train/valid/test split assignment (leak-proof under any
    repartitioning), aggregated to per-split counts."""
    from ..functions.sampling import deterministic_split

    ds = deterministic_split(_t(sf_dir, "orders", ["o_orderkey"]), "o_orderkey")
    return ds.groupby("split").aggregate(Count(alias_name="n_rows"))


SQL_SPLIT_COUNTS = """
SELECT CASE WHEN substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 2) < 'f3' THEN 'train'
            WHEN substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 2) < 'f9' THEN 'valid'
            ELSE 'test' END AS split,
       count(*) AS n_rows
FROM orders GROUP BY 1
"""


def q_median_price_by_segment(sf_dir):
    """Grouped median via per-group pandas (exact order statistic; the (a+b)/2
    interpolation for even counts is bit-identical in pandas and DuckDB)."""
    import pandas as pd

    ref = _broadcast_cols(sf_dir, "customer", "c_custkey", "c_mktsegment")

    def join(b: pa.Table) -> pa.Table:
        return pa.table({"c_mktsegment": _probe_cols(ref, b["o_custkey"]),
                         "o_totalprice": b["o_totalprice"]})

    def med(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"c_mktsegment": [g["c_mktsegment"].iloc[0]],
                             "median_price": [float(g["o_totalprice"].median())]})

    return (_t(sf_dir, "orders", ["o_custkey", "o_totalprice"])
            .map_batches(join, batch_format="pyarrow")
            .groupby("c_mktsegment").map_groups(med, batch_format="pandas"))


SQL_MEDIAN_PRICE_BY_SEGMENT = """
SELECT c_mktsegment, median(o_totalprice) AS median_price
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
"""


def q_p90_price_by_segment(sf_dir):
    """Grouped quantile (p90): exact order statistic at pos q*(n-1) with
    DuckDB quantile_cont's interpolation form lo*(1-f) + hi*f (numpy's
    lo+(hi-lo)*f differs by 1 ulp on some groups — measured). Same 5-group
    map_groups shape as the median (low-cardinality key)."""
    import pandas as pd

    ref = _broadcast_cols(sf_dir, "customer", "c_custkey", "c_mktsegment")

    def join(b: pa.Table) -> pa.Table:
        return pa.table({"c_mktsegment": _probe_cols(ref, b["o_custkey"]),
                         "o_totalprice": b["o_totalprice"]})

    def p90(g: pd.DataFrame) -> pd.DataFrame:
        s = np.sort(g["o_totalprice"].to_numpy())
        pos = 0.9 * (len(s) - 1)
        lo = int(np.floor(pos))
        f = pos - lo
        hi = min(lo + 1, len(s) - 1)
        val = s[lo] * (1 - f) + s[hi] * f
        return pd.DataFrame({"c_mktsegment": [g["c_mktsegment"].iloc[0]],
                             "p90_price": [float(val)]})

    return (_t(sf_dir, "orders", ["o_custkey", "o_totalprice"])
            .map_batches(join, batch_format="pyarrow")
            .groupby("c_mktsegment").map_groups(p90, batch_format="pandas"))


SQL_P90_PRICE_BY_SEGMENT = """
SELECT c_mktsegment, quantile_cont(o_totalprice, 0.9) AS p90_price
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
"""


# ---------------------------------------------------------------------------
# Rollup / pivot / histogram / set ops (SQL-checked)
# ---------------------------------------------------------------------------


def q_lineitem_rollup(sf_dir):
    """ROLLUP over (returnflag, linestatus): fine groups, per-flag subtotals
    and a grand total, NULL markers spelled 'ALL' on both sides. One pass over
    the fact table produces the fine aggregate; its cardinality is bounded
    (|flags|×|status| ≤ 9), so the subtotal levels are derived from that tiny
    result driver-side — never a second scan of lineitem."""
    fine = (_t(sf_dir, "lineitem", ["l_returnflag", "l_linestatus", "l_quantity"])
            .groupby(["l_returnflag", "l_linestatus"])
            .aggregate(Sum("l_quantity", alias_name="sum_qty"),
                       Count(alias_name="n_rows")))
    df = fine.to_pandas()  # bounded: one row per (flag, status) combination
    sub = df.groupby("l_returnflag", as_index=False)[["sum_qty", "n_rows"]].sum()
    sub["l_linestatus"] = "ALL"
    tot = pd.DataFrame({"l_returnflag": ["ALL"], "l_linestatus": ["ALL"],
                        "sum_qty": [df["sum_qty"].sum()],
                        "n_rows": [df["n_rows"].sum()]})
    out = pd.concat([df, sub, tot], ignore_index=True)
    out["sum_qty"] = out["sum_qty"].round().astype("int64")
    out["n_rows"] = out["n_rows"].astype("int64")
    cols = ["l_returnflag", "l_linestatus", "sum_qty", "n_rows"]
    return pa.Table.from_pandas(out[cols], preserve_index=False)


SQL_LINEITEM_ROLLUP = """
SELECT COALESCE(l_returnflag, 'ALL') AS l_returnflag,
       COALESCE(l_linestatus, 'ALL') AS l_linestatus,
       CAST(sum(l_quantity) AS BIGINT) AS sum_qty,
       count(*) AS n_rows
FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
"""


_PRIORITIES = ("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")
_PRIO_COLS = ("n_urgent", "n_high", "n_medium", "n_notspec", "n_low")


def q_orders_pivot(sf_dir):
    """Pivot (order-priority counts per order-year) as a single pre-aggregated
    pass: each batch collapses to one row per year with one count column per
    priority (vectorized year-code bincount per mask), then the groupby sums
    ~n_years × concurrency partial rows — the fact table itself never
    shuffles and no driver-side pivot of a tall table is needed."""

    def partial(b: pa.Table) -> pa.Table:
        yr = pc.year(b["o_orderdate"]).to_numpy(zero_copy_only=False)
        uy, inv = np.unique(yr, return_inverse=True)
        cols = {"o_year": pa.array(uy.astype("int64"))}
        for p, cname in zip(_PRIORITIES, _PRIO_COLS):
            m = pc.equal(b["o_orderpriority"], p).to_numpy(zero_copy_only=False)
            cols[cname] = pa.array(
                np.bincount(inv, weights=m, minlength=len(uy)).astype("int64"))
        return pa.table(cols)

    agg = (_t(sf_dir, "orders", ["o_orderdate", "o_orderpriority"])
           .map_batches(partial, batch_format="pyarrow")
           .groupby("o_year")
           .aggregate(*[Sum(c, alias_name=c) for c in _PRIO_COLS]))
    return _cast_int64(agg, list(_PRIO_COLS))


SQL_ORDERS_PIVOT = """
SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
       count(*) FILTER (WHERE o_orderpriority = '1-URGENT') AS n_urgent,
       count(*) FILTER (WHERE o_orderpriority = '2-HIGH') AS n_high,
       count(*) FILTER (WHERE o_orderpriority = '3-MEDIUM') AS n_medium,
       count(*) FILTER (WHERE o_orderpriority = '4-NOT SPECIFIED') AS n_notspec,
       count(*) FILTER (WHERE o_orderpriority = '5-LOW') AS n_low
FROM orders GROUP BY 1
"""


def q_price_histogram(sf_dir):
    """Fixed-width histogram of order totals: the bucket id is computed
    vectorized per batch, then a bounded-cardinality groupby (≤ ~25 buckets)
    carries only (bucket, price) pairs through the exchange."""

    def bucketize(b: pa.Table) -> pa.Table:
        bk = pc.cast(pc.floor(pc.divide(b["o_totalprice"], 20000.0)), pa.int64())
        return pa.table({"bucket": bk, "o_totalprice": b["o_totalprice"]})

    return (_t(sf_dir, "orders", ["o_totalprice"])
            .map_batches(bucketize, batch_format="pyarrow")
            .groupby("bucket")
            .aggregate(Count(alias_name="n_orders"),
                       Min("o_totalprice", alias_name="min_price"),
                       Max("o_totalprice", alias_name="max_price")))


SQL_PRICE_HISTOGRAM = """
SELECT CAST(FLOOR(o_totalprice / 20000.0) AS BIGINT) AS bucket,
       count(*) AS n_orders,
       min(o_totalprice) AS min_price, max(o_totalprice) AS max_price
FROM orders GROUP BY 1
"""


def q_repeat_customers(sf_dir):
    """Set intersection (customers ordering in BOTH 1995 and 1996) as ONE
    pre-aggregated exchange: per-batch indicator partials max-combine under a
    single groupby(custkey), then a vectorized filter — instead of two
    DISTINCT subqueries plus a shuffle INTERSECT (three exchanges)."""

    def flags(b: pa.Table) -> pa.Table:
        yr = pc.year(b["o_orderdate"])
        t = pa.table({"o_custkey": b["o_custkey"],
                      "in95": pc.cast(pc.equal(yr, 1995), pa.int64()),
                      "in96": pc.cast(pc.equal(yr, 1996), pa.int64())})
        g = t.group_by("o_custkey").aggregate([("in95", "max"), ("in96", "max")])
        return pa.table({"o_custkey": g["o_custkey"],
                         "in95": g["in95_max"], "in96": g["in96_max"]})

    agg = (_t(sf_dir, "orders", ["o_custkey", "o_orderdate"])
           .map_batches(flags, batch_format="pyarrow")
           .groupby("o_custkey")
           .aggregate(Max("in95", alias_name="in95"),
                      Max("in96", alias_name="in96")))

    def keep(b: pa.Table) -> pa.Table:
        m = pc.and_(pc.greater_equal(b["in95"], 1), pc.greater_equal(b["in96"], 1))
        return b.filter(m).select(["o_custkey"])

    return agg.map_batches(keep, batch_format="pyarrow")


SQL_REPEAT_CUSTOMERS = """
SELECT o_custkey FROM orders WHERE EXTRACT(year FROM o_orderdate) = 1995
INTERSECT
SELECT o_custkey FROM orders WHERE EXTRACT(year FROM o_orderdate) = 1996
"""


def q_churned_customers(sf_dir):
    """Set difference (EXCEPT: ordered in 1995 but NOT in 1996) via the same
    single-exchange indicator pattern as repeat_customers — one pre-aggregated
    groupby(custkey) instead of two DISTINCTs plus a shuffle anti-set-op."""

    def flags(b: pa.Table) -> pa.Table:
        yr = pc.year(b["o_orderdate"])
        t = pa.table({"o_custkey": b["o_custkey"],
                      "in95": pc.cast(pc.equal(yr, 1995), pa.int64()),
                      "in96": pc.cast(pc.equal(yr, 1996), pa.int64())})
        g = t.group_by("o_custkey").aggregate([("in95", "max"), ("in96", "max")])
        return pa.table({"o_custkey": g["o_custkey"],
                         "in95": g["in95_max"], "in96": g["in96_max"]})

    agg = (_t(sf_dir, "orders", ["o_custkey", "o_orderdate"])
           .map_batches(flags, batch_format="pyarrow")
           .groupby("o_custkey")
           .aggregate(Max("in95", alias_name="in95"),
                      Max("in96", alias_name="in96")))

    def keep(b: pa.Table) -> pa.Table:
        m = pc.and_(pc.greater_equal(b["in95"], 1), pc.equal(b["in96"], 0))
        return b.filter(m).select(["o_custkey"])

    return agg.map_batches(keep, batch_format="pyarrow")


SQL_CHURNED_CUSTOMERS = """
SELECT o_custkey FROM orders WHERE EXTRACT(year FROM o_orderdate) = 1995
EXCEPT
SELECT o_custkey FROM orders WHERE EXTRACT(year FROM o_orderdate) = 1996
"""


# ---------------------------------------------------------------------------
# Window functions (ANSI analytic semantics, SQL-checked)
# ---------------------------------------------------------------------------


def q_order_rank_delta(sf_dir):
    """ROW_NUMBER + LAG date delta per customer order history: one coarse
    shuffle on the hashed partition key, then segment-vectorized window
    kernels (functions/analytic.py) over all customers of a bucket at once.
    gap_days = days since the customer's previous order (-1 for the first)."""
    from ..functions import analytic as an

    def mk(st, first, seg_start):
        days = (st["o_orderdate"].combine_chunks().cast(pa.int64())
                .to_numpy() // 86_400_000_000)
        gap = np.where(first, -1, days - an.lag(days, first, 0))
        return {"rn": pa.array(an.row_number(first, seg_start)),
                "gap_days": pa.array(gap)}

    ds = _t(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"])
    return an.windowed(ds, "o_custkey", ["o_orderdate", "o_orderkey"], mk
                       ).drop_columns(["o_orderdate"])


SQL_ORDER_RANK_DELTA = """
SELECT o_orderkey, o_custkey, ROW_NUMBER() OVER w AS rn,
       coalesce(date_diff('day', lag(o_orderdate) OVER w, o_orderdate), -1)
           AS gap_days
FROM orders WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
"""


def q_order_ntile(sf_dir):
    """NTILE(4) price quartiles + DENSE_RANK over 1000-unit price bands,
    per order-priority class — the remaining ANSI window functions on the
    segment-vectorized analytic kernels. Skew note: PARTITION BY a
    5-value key means at most 5-way parallelism for the window itself in ANY
    engine; the coarse-bucket shuffle stays one exchange regardless."""
    from ..functions import analytic as an

    def mk(st, first, seg_start):
        band = (st["o_totalprice"].combine_chunks().to_numpy()
                / 1000.0).astype(np.int64)
        fp = an.peer_first_mask_arrays([band], first)
        return {"tile": pa.array(an.ntile(4, first, seg_start)),
                "price_band_rank": pa.array(an.dense_rank(fp, seg_start))}

    ds = _t(sf_dir, "orders", ["o_orderkey", "o_orderpriority", "o_totalprice"])
    return an.windowed(ds, "o_orderpriority", ["o_totalprice", "o_orderkey"],
                       mk, n_parts=8).drop_columns(["o_totalprice"])


SQL_ORDER_NTILE = """
SELECT o_orderkey, o_orderpriority,
       NTILE(4) OVER (PARTITION BY o_orderpriority
                      ORDER BY o_totalprice, o_orderkey) AS tile,
       DENSE_RANK() OVER (PARTITION BY o_orderpriority
                          ORDER BY CAST(floor(o_totalprice / 1000) AS BIGINT))
           AS price_band_rank
FROM orders
"""


def q_order_percent_rank(sf_dir):
    """RANK / PERCENT_RANK / CUME_DIST per order-priority class, ordered by a
    1000-unit price band so ORDER BY ties (peers) actually occur and the
    rank-vs-row_number distinction is exercised. The two ratio outputs are
    single IEEE divisions of identical int64s on both engines, so the driver's
    value hash is exact without quantization. Same one-coarse-shuffle window
    machinery as ``order_rank_delta`` (`functions/analytic.py`)."""
    from ..functions import analytic as an

    def mk(st, first, seg_start):
        band = (st["o_totalprice"].combine_chunks().to_numpy()
                / 1000.0).astype(np.int64)
        fp = an.peer_first_mask_arrays([band], first)
        return {"price_rank": pa.array(an.rank(fp, seg_start)),
                "pct_rank": pa.array(an.percent_rank(fp, first, seg_start)),
                "cume_dist": pa.array(an.cume_dist(fp, first, seg_start))}

    ds = _t(sf_dir, "orders", ["o_orderkey", "o_orderpriority", "o_totalprice"])
    return an.windowed(ds, "o_orderpriority", ["o_totalprice", "o_orderkey"],
                       mk, n_parts=8).drop_columns(["o_totalprice"])


SQL_ORDER_PERCENT_RANK = """
SELECT o_orderkey, o_orderpriority,
       RANK() OVER w AS price_rank,
       PERCENT_RANK() OVER w AS pct_rank,
       CUME_DIST() OVER w AS cume_dist
FROM orders
WINDOW w AS (PARTITION BY o_orderpriority
             ORDER BY CAST(floor(o_totalprice / 1000) AS BIGINT))
"""


def q_lineitem_running_qty(sf_dir):
    """Running SUM with the ANSI-default RANGE frame: (l_orderkey,
    l_linenumber) is NOT unique in this data, so ORDER BY ties are peers and
    every peer row carries the sum through its peer group's end — matching
    DuckDB's default window frame exactly (ROWS semantics would be
    nondeterministic here)."""
    from ..functions import analytic as an

    def mk(st, first, seg_start):
        qty = st["l_quantity"].combine_chunks().to_numpy().astype(np.int64)
        fp = an.peer_first_mask(st, first, ["l_linenumber"])
        return {"cum_qty": pa.array(an.running_sum_range(qty, seg_start, fp))}

    ds = _t(sf_dir, "lineitem", ["l_orderkey", "l_linenumber", "l_quantity"])
    return an.windowed(ds, "l_orderkey", ["l_linenumber"], mk
                       ).drop_columns(["l_quantity"])


SQL_LINEITEM_RUNNING_QTY = """
SELECT l_orderkey, l_linenumber,
       CAST(SUM(CAST(l_quantity AS BIGINT)) OVER
            (PARTITION BY l_orderkey ORDER BY l_linenumber) AS BIGINT) AS cum_qty
FROM lineitem
"""


def q_customer_order_counts(sf_dir):
    """LEFT OUTER join: every customer with their order count, zero for
    customers with no orders. The fact side collapses to (custkey, count)
    partials inside map_batches BEFORE any exchange (shuffle carries counts,
    never order rows); the dimension side attaches via ONE co-partitioned
    ``lookup_join(how="left")`` — unmatched customers survive with NULL →
    filled 0 (`core/groupops.py`)."""
    from ..core.groupops import lookup_join

    def partial(b: pa.Table) -> pa.Table:
        vc = pc.value_counts(b["o_custkey"].combine_chunks())
        return pa.table({"o_custkey": vc.field("values"),
                         "n": pc.cast(vc.field("counts"), pa.int64())})

    counts = _cast_int64(
        (_t(sf_dir, "orders", ["o_custkey"])
         .map_batches(partial, batch_format="pyarrow")
         .groupby("o_custkey").aggregate(Sum("n", alias_name="n"))), ["n"])
    cust = _t(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
    out = lookup_join(
        cust, counts, "c_custkey", "o_custkey", "n", out_col="n_orders",
        how="left", n_parts=32,
        schema=pa.schema([("c_custkey", pa.int64()),
                          ("c_mktsegment", pa.string())]),
        kv_schema=pa.schema([("o_custkey", pa.int64()), ("n", pa.int64())]))

    def fill(b: pa.Table) -> pa.Table:
        return b.set_column(b.column_names.index("n_orders"), "n_orders",
                            pc.fill_null(b["n_orders"], 0))

    return out.map_batches(fill, batch_format="pyarrow")


SQL_CUSTOMER_ORDER_COUNTS = """
SELECT c.c_custkey, c.c_mktsegment, CAST(COALESCE(o.n, 0) AS BIGINT) AS n_orders
FROM customer c LEFT JOIN (SELECT o_custkey, count(*) AS n FROM orders
                           GROUP BY o_custkey) o
ON c.c_custkey = o.o_custkey
"""


def q_customers_no_orders(sf_dir):
    """Distributed anti-join (NOT EXISTS): customers with no order in 1995,
    counted per nation. The exclusion set (1995 buyers) co-partitions with the
    customer side via groupops.anti_join_ids — the scale path when the id set
    is too large to broadcast; the 25-row nation name is a broadcast probe."""
    from ..core.groupops import anti_join_ids

    def in_1995(b: pa.Table) -> pa.Table:
        lo = pa.scalar(np.datetime64("1995-01-01", "us"), pa.timestamp("us"))
        hi = pa.scalar(np.datetime64("1996-01-01", "us"), pa.timestamp("us"))
        keep = pc.and_(pc.greater_equal(b["o_orderdate"], lo),
                       pc.less(b["o_orderdate"], hi))
        return b.filter(keep).select(["o_custkey"])

    buyers = _t(sf_dir, "orders", ["o_custkey", "o_orderdate"]).map_batches(
        in_1995, batch_format="pyarrow")
    cust = _t(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    no_orders = anti_join_ids(cust, buyers, "c_custkey", ids_col="o_custkey")

    ref = _broadcast_cols(sf_dir, "nation", "n_nationkey", "n_name")

    def name(b: pa.Table) -> pa.Table:
        return pa.table({"n_name": _probe_cols(ref, b["c_nationkey"])})

    return (no_orders.map_batches(name, batch_format="pyarrow")
            .groupby("n_name").aggregate(Count(alias_name="n_customers")))


SQL_CUSTOMERS_NO_ORDERS = """
SELECT n_name, count(*) AS n_customers
FROM customer JOIN nation ON c_nationkey = n_nationkey
WHERE NOT EXISTS (
  SELECT 1 FROM orders WHERE o_custkey = c_custkey
    AND o_orderdate >= TIMESTAMP '1995-01-01'
    AND o_orderdate <  TIMESTAMP '1996-01-01')
GROUP BY n_name
"""


def q_bloom_semi_orders(sf_dir):
    """Exact semi-join via broadcast Bloom prefilter + co-partitioned verify
    (``functions/bloom.py``): orders placed by BUILDING-segment customers,
    aggregated per order priority. The Bloom bitmap (128 KB for 1M bits) is
    built in one pass over the filtered customer keys and broadcast via
    ray.put; the fact-side probe drops ~all non-matching orders BEFORE the
    one co-partitioned exchange, so the shuffle carries matches + ~fp_rate of
    the rest instead of the whole orders table. Result is exact (the verify
    phase removes Bloom false positives) — the DuckDB mirror is the plain
    IN-subquery semi-join."""
    from ..functions.bloom import bloom_semi_join

    def building(b: pa.Table) -> pa.Table:
        return b.filter(pc.equal(b["c_mktsegment"], "BUILDING")).select(
            ["c_custkey"])

    keys = _t(sf_dir, "customer", ["c_custkey", "c_mktsegment"]).map_batches(
        building, batch_format="pyarrow")
    fact = _t(sf_dir, "orders", ["o_custkey", "o_orderkey", "o_orderpriority"])
    hits = bloom_semi_join(fact, "o_custkey", keys, "c_custkey")
    return _cast_int64(
        hits.groupby("o_orderpriority").aggregate(
            Count(alias_name="n_orders"),
            Min("o_orderkey", alias_name="min_orderkey"),
            Max("o_orderkey", alias_name="max_orderkey")),
        ["min_orderkey", "max_orderkey"])


SQL_BLOOM_SEMI_ORDERS = """
SELECT o_orderpriority, count(*) AS n_orders,
       min(o_orderkey) AS min_orderkey, max(o_orderkey) AS max_orderkey
FROM orders
WHERE o_custkey IN (SELECT c_custkey FROM customer
                    WHERE c_mktsegment = 'BUILDING')
GROUP BY o_orderpriority
"""


# ---------------------------------------------------------------------------
# Decontamination + normalization (LLM-pipeline ops, SQL-checked)
# ---------------------------------------------------------------------------

_BENCH_MAX_DOC_ID = 20  # docs below this id form the "benchmark" eval set
_DECONTAM_N = 8


def q_benchmark_overlap(sf_dir):
    """Training-data decontamination: 8-token-gram overlap of every corpus doc
    (doc_id >= 20) against the benchmark docs (doc_id < 20). Benchmark gram
    set is tiny by nature -> built from a bounded predicate-pushdown read and
    broadcast via ray.put; the corpus side is ONE shuffle-free map_batches
    pass with C-level tokenize/join/hash-probe (functions/decontam.py)."""
    from ..functions import decontam as dc

    bench = pq.read_table(os.path.join(sf_dir, "documents.parquet"),
                          columns=["text"],
                          filters=[("doc_id", "<", _BENCH_MAX_DOC_ID)])
    ref = ray.put(dc.build_benchmark_grams(bench["text"], n=_DECONTAM_N))

    def f(b: pa.Table) -> pa.Table:
        b = b.filter(pc.greater_equal(b["doc_id"], _BENCH_MAX_DOC_ID))
        return dc.overlap_batch(b, ray.get(ref), n=_DECONTAM_N)

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        f, batch_format="pyarrow")


SQL_BENCHMARK_OVERLAP = """
WITH toks AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(text, '[ \t\n\r\f]+'),
                     x -> x <> '') AS t
  FROM documents),
g AS (
  SELECT doc_id,
         unnest([array_to_string(t[i:i+7], ' ')
                 for i in generate_series(1, greatest(len(t)-7, 0))]) AS gram
  FROM toks),
bench AS (SELECT DISTINCT gram FROM g WHERE doc_id < 20)
SELECT g.doc_id, count(*) AS n_grams, count(b.gram) AS n_overlap,
       CAST(count(b.gram) > 0 AS BIGINT) AS contaminated
FROM g LEFT JOIN bench b ON g.gram = b.gram
WHERE g.doc_id >= 20
GROUP BY g.doc_id
"""


def q_cross_doc_grams(sf_dir):
    """Cross-document duplicated-substring scoring — the per-doc signal of
    substring-level dedup (Lee et al. 2021, arXiv 2107.06499: repeated long
    n-grams across documents mark boilerplate/templated spans worth cutting):
    for every doc, its count of DISTINCT 8-grams and how many of those also
    occur in at least one OTHER doc.

    Scale shape: per-batch vectorized gram expansion (decontam's C-level
    kernel) -> distinct (gram, doc) pairs; document frequency is computed
    WITHOUT broadcasting the gram vocabulary — one co-partition on gram makes
    partition-local pair counts the global df (the tfidf_top_term trick), a
    df>=2 flag rides back on each pair, and a bounded groupby(doc) sums flags.
    Two exchanges total, both carrying (gram, doc_id) pairs, never text. At
    100 TB the gram strings would ride as u64 hashes (functions/dedup.py's
    gram kernel) at a negligible collision risk; strings are kept here for
    exact cross-engine parity."""
    from ..core.groupops import grouped_reduce
    from ..functions.decontam import doc_grams

    def pairs(b: pa.Table) -> pa.Table:
        grams, parent = doc_grams(b["text"], n=8)
        ids = b["doc_id"].to_numpy(zero_copy_only=False)
        t = pa.table({"gram": grams,
                      "doc_id": pa.array(ids[parent], pa.int64())})
        # distinct within doc (and batch) before the exchange
        return t.group_by(["doc_id", "gram"]).aggregate([])

    def df_flag(df: pd.DataFrame) -> pd.DataFrame:
        n = df.groupby("gram")["doc_id"].transform("size")
        return pd.DataFrame({"doc_id": df["doc_id"],
                             "shared": (n >= 2).astype("int64")})

    pair_ds = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        pairs, batch_format="pyarrow")
    flagged = grouped_reduce(pair_ds, ["gram"], df_flag)
    return _cast_int64(
        flagged.groupby("doc_id").aggregate(
            Count(alias_name="n_distinct_grams"),
            Sum("shared", alias_name="n_shared_grams")),
        ["n_distinct_grams", "n_shared_grams"])


def q_chunk_dedup(sf_dir):
    """C4-style duplicate-chunk removal (Raffel et al. 2020 §2.2: drop every
    repeated occurrence of a repeated span corpus-wide, keep exactly one):
    per-doc chunk counts before/after the keep-first rule over non-overlapping
    8-word chunks. See ``functions/dedup.py::chunk_dedup_stats`` for the
    one-exchange scale shape; keeper = lexicographic min (doc_id, chunk_no),
    so the result is partitioning-invariant and SQL-mirrorable (row_number
    over chunk)."""
    from ..functions.dedup import chunk_dedup_stats

    return _cast_int64(
        chunk_dedup_stats(_docs(sf_dir, ["doc_id", "text"]), width=8),
        ["n_chunks", "n_kept", "kept_words"])


SQL_CHUNK_DEDUP = """
WITH toks AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(text, '[ \t\n\r\f]+'),
                     x -> x <> '') AS t
  FROM documents),
c AS (
  SELECT doc_id,
         unnest(generate_series(0, CAST(ceil(len(t) / 8.0) AS BIGINT) - 1))
             AS chunk_no,
         unnest([array_to_string(t[i*8+1:i*8+8], ' ')
                 for i in generate_series(0, CAST(ceil(len(t) / 8.0) AS BIGINT) - 1)])
             AS chunk,
         unnest([len(t[i*8+1:i*8+8])
                 for i in generate_series(0, CAST(ceil(len(t) / 8.0) AS BIGINT) - 1)])
             AS n_words
  FROM toks),
k AS (
  SELECT doc_id, n_words,
         CASE WHEN row_number()
                   OVER (PARTITION BY chunk ORDER BY doc_id, chunk_no) = 1
              THEN 1 ELSE 0 END AS kept
  FROM c)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_chunks,
       CAST(sum(kept) AS BIGINT) AS n_kept,
       CAST(sum(kept * n_words) AS BIGINT) AS kept_words
FROM k GROUP BY doc_id
"""


SQL_CROSS_DOC_GRAMS = """
WITH toks AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(text, '[ \t\n\r\f]+'),
                     x -> x <> '') AS t
  FROM documents),
g AS (
  SELECT DISTINCT doc_id,
         unnest([array_to_string(t[i:i+7], ' ')
                 for i in generate_series(1, greatest(len(t)-7, 0))]) AS gram
  FROM toks),
df AS (
  SELECT gram, count(*) AS df FROM g GROUP BY gram)
SELECT g.doc_id,
       CAST(count(*) AS BIGINT) AS n_distinct_grams,
       CAST(sum(CASE WHEN df.df >= 2 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_shared_grams
FROM g JOIN df USING (gram)
GROUP BY g.doc_id
"""


def q_norm_text(sf_dir):
    """Text normalization (lowercase -> NFC -> whitespace-run collapse ->
    space trim), hash-checked on the normalized STRINGS themselves. All Arrow
    C kernels; no shuffle."""

    def f(b: pa.Table) -> pa.Table:
        t = b["text"]
        if isinstance(t, pa.ChunkedArray):
            t = t.combine_chunks()
        t = pc.utf8_normalize(pc.utf8_lower(t), form="NFC")
        t = pc.replace_substring_regex(t, pattern=r"[ \t\n\r\f]+",
                                       replacement=" ")
        t = pc.utf8_trim(t, characters=" ")
        return pa.table({"doc_id": b["doc_id"], "norm_text": t,
                         "n_chars_norm": pc.cast(pc.utf8_length(t), pa.int64())})

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        f, batch_format="pyarrow")


SQL_NORM_TEXT = """
SELECT doc_id,
       trim(regexp_replace(nfc_normalize(lower(text)), '[ \t\n\r\f]+', ' ', 'g'),
            ' ') AS norm_text,
       length(trim(regexp_replace(nfc_normalize(lower(text)), '[ \t\n\r\f]+',
                                  ' ', 'g'), ' ')) AS n_chars_norm
FROM documents
"""


def q_pii_scrub(sf_dir):
    """PII-style redaction pass (functions/scrub.py): deterministic contact
    augmentation (the synthetic corpus has no digits, so the rules would never
    fire on raw text), then the sequential RE2 count-and-replace kernel.
    Hash-checked on the per-rule counts AND the fully redacted strings.
    Per-row independent — shuffle-free, C-level kernels only."""
    from ..functions.scrub import augment_contact, scrub_batch

    def f(b: pa.Table) -> pa.Table:
        out = scrub_batch(augment_contact(b), text_col="aug_text")
        return out.select(["doc_id", "n_email", "n_ip", "n_num", "scrubbed"])

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        f, batch_format="pyarrow")


def _sql_pii_scrub() -> str:
    from ..functions.scrub import EMAIL_PAT, IPV4_PAT, LONGNUM_PAT

    # Single source of truth for the patterns: the scrub module. DuckDB is
    # also RE2, so count/replace semantics match pyarrow.compute exactly.
    return """
WITH aug AS (
  SELECT doc_id,
         text || ' contact user' || CAST(doc_id AS VARCHAR)
              || '@example.com from 10.' || CAST(doc_id % 256 AS VARCHAR)
              || '.0.' || CAST(doc_id % 100 AS VARCHAR)
              || ' acct ' || CAST(100000000 + doc_id AS VARCHAR) AS t0
  FROM documents
), s1 AS (
  SELECT doc_id,
         CAST(len(regexp_extract_all(t0, '@EMAIL@')) AS BIGINT) AS n_email,
         regexp_replace(t0, '@EMAIL@', '<EMAIL>', 'g') AS t1
  FROM aug
), s2 AS (
  SELECT doc_id, n_email,
         CAST(len(regexp_extract_all(t1, '@IP@')) AS BIGINT) AS n_ip,
         regexp_replace(t1, '@IP@', '<IP>', 'g') AS t2
  FROM s1
)
SELECT doc_id, n_email, n_ip,
       CAST(len(regexp_extract_all(t2, '@NUM@')) AS BIGINT) AS n_num,
       regexp_replace(t2, '@NUM@', '<NUM>', 'g') AS scrubbed
FROM s2
""".replace("@EMAIL@", EMAIL_PAT).replace("@IP@", IPV4_PAT) \
   .replace("@NUM@", LONGNUM_PAT)


SQL_PII_SCRUB = _sql_pii_scrub()


# ---------------------------------------------------------------------------
# Flagship extraction (non-SQL-expressible → rows-only driver check)
# ---------------------------------------------------------------------------


def _interleaved_corpus(sf_dir):
    """Interleaved corpus derived deterministically from the flat documents
    table — INSIDE map_batches over a streamed read (each doc's derivation
    depends only on its own row, so batch boundaries don't matter). The
    previous version built the whole corpus as one driver-side pa.Table."""
    from ..data.synth import corpus_from_flat

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        lambda b: corpus_from_flat(b, seed=42), batch_format="pyarrow")


def q_extract_flagship(sf_dir):
    """Full extraction pipeline over the interleaved corpus derived
    deterministically from the flat documents table; output = flattened
    spans. Rows-only: the span stream is produced by the layout/codec engine
    (SPEC §6), whose independent oracle is the row-at-a-time Python
    implementation in tests/oracle.py — span equality there is the
    correctness gate; no SQL reimplementation of the engine exists."""
    from .extract import ExtractConfig, build_extraction

    out = build_extraction(_interleaved_corpus(sf_dir),
                           ExtractConfig(split_threshold=500, chunk_size=200))

    def flatten(b: pa.Table) -> pa.Table:
        # vectorized explode: list_parent_indices + the list's flat struct child
        spans = b["spans"]
        if isinstance(spans, pa.ChunkedArray):
            spans = spans.combine_chunks()
        parent = pc.list_parent_indices(spans)
        vals = spans.flatten()
        doc_id = b["doc_id"]
        if isinstance(doc_id, pa.ChunkedArray):
            doc_id = doc_id.combine_chunks()
        return pa.table({"doc_id": doc_id.take(parent),
                         "offset": vals.field("offset"),
                         "kind": vals.field("kind"),
                         "text": vals.field("text"),
                         "media_ref": vals.field("media_ref")})

    return out.map_batches(flatten, batch_format="pyarrow")


def q_span_positions(sf_dir):
    """Layout fidelity surface (SPEC §6b): flagship extraction with the
    spans_meta column, flattened to one row per (output span, POSITION) — the
    reference's one-Position-per-provenance-item shape, page-wrapping spans
    contributing one row per page fragment — with hierarchy fields and
    coord_origin. Rows-only (extraction-engine output; oracle-parity pytest is
    the gate); the closed-form fragment-rule SUBSET is SQL-hash-checked as
    `span_fragments`/`page_layout`."""
    from .extract import ExtractConfig, build_extraction

    out = build_extraction(_interleaved_corpus(sf_dir),
                           ExtractConfig(split_threshold=500, chunk_size=200))

    def flatten(b: pa.Table) -> pa.Table:
        spans = b["spans"]
        meta = b["spans_meta"]
        if isinstance(spans, pa.ChunkedArray):
            spans = spans.combine_chunks()
        if isinstance(meta, pa.ChunkedArray):
            meta = meta.combine_chunks()
        parent = pc.list_parent_indices(spans)
        sv, mv = spans.flatten(), meta.flatten()
        doc_id = b["doc_id"]
        if isinstance(doc_id, pa.ChunkedArray):
            doc_id = doc_id.combine_chunks()
        span_doc = doc_id.take(parent)
        pos = mv.field("positions")
        pos_parent_np = pc.list_parent_indices(pos).to_numpy(zero_copy_only=False)
        pos_offs = pos.offsets.to_numpy(zero_copy_only=False)
        pos_idx = np.arange(len(pos_parent_np)) - pos_offs[pos_parent_np]
        pv = pos.flatten()
        take = pa.array(pos_parent_np)
        return pa.table({"doc_id": span_doc.take(take),
                         "offset": sv.field("offset").take(take),
                         "kind": sv.field("kind").take(take),
                         "ref": mv.field("ref").take(take),
                         "parent_ref": mv.field("parent_ref").take(take),
                         "level": mv.field("level").take(take),
                         "pos_idx": pa.array(pos_idx, pa.int32()),
                         "page_no": pv.field("page_no"),
                         "l": pv.field("l"), "t": pv.field("t"),
                         "r": pv.field("r"), "b": pv.field("b"),
                         "coord_origin": pv.field("coord_origin")})

    return out.map_batches(flatten, batch_format="pyarrow")


def q_span_fragments(sf_dir):
    """SQL-checkable drive of the §6b layout ENGINE itself (not just its
    arithmetic): each document's cleaned text runs through stages.layout as a
    single paragraph span; output = per-doc position count and the last
    fragment's page/bottom. The SQL mirror reproduces the 46-line page-fragment
    rule in closed form."""
    from ..core.schema import SPAN_TYPE
    from ..stages.layout import add_layout_batch

    def to_spans(b: pa.Table) -> pa.Table:
        t = b["text"]
        if isinstance(t, pa.ChunkedArray):
            t = t.combine_chunks()
        clean = clean_text_arr(t)
        if isinstance(clean, pa.ChunkedArray):
            clean = clean.combine_chunks()
        n = len(clean)
        struct = pa.StructArray.from_arrays(
            [pa.array(["paragraph"] * n, pa.string()), clean,
             pa.array([""] * n, pa.string()),
             pa.array(np.zeros(n, dtype=np.int32))],
            fields=list(SPAN_TYPE))
        offs = pa.array(np.arange(n + 1, dtype=np.int32))
        return pa.table({"doc_id": b["doc_id"],
                         "spans": pa.ListArray.from_arrays(offs, struct)})

    def summarize(b: pa.Table) -> pa.Table:
        meta = b["spans_meta"]
        if isinstance(meta, pa.ChunkedArray):
            meta = meta.combine_chunks()
        mv = meta.flatten()  # exactly one span per doc by construction
        pos = mv.field("positions")
        lens = pc.list_value_length(pos).to_numpy(zero_copy_only=False).astype(np.int64)
        pos_offs = pos.offsets.to_numpy(zero_copy_only=False)
        pv = pos.flatten()
        last = pa.array(pos_offs[1:] - 1)
        return pa.table({"doc_id": b["doc_id"],
                         "n_positions": pa.array(lens, pa.int64()),
                         "last_page": pc.cast(pv.field("page_no").take(last), pa.int64()),
                         "last_b": pv.field("b").take(last)})

    return (_docs(sf_dir, ["doc_id", "text"])
            .map_batches(to_spans, batch_format="pyarrow")
            .map_batches(add_layout_batch, batch_format="pyarrow")
            .map_batches(summarize, batch_format="pyarrow"))


SQL_SPAN_FRAGMENTS = f"""
WITH c AS (
  SELECT doc_id,
         trim(regexp_replace(regexp_replace(text, '{GLYPH_PAT}', ' ', 'g'),
                             '{WS_RUN_PAT}', ' ', 'g'), {_TRIM_WS_SQL}) AS ct
  FROM documents),
n AS (SELECT doc_id,
             greatest(1, CAST(ceil(length(ct) / 80.0) AS BIGINT)) AS nlines
      FROM c)
SELECT doc_id,
       CAST(ceil(nlines / 46.0) AS BIGINT) AS n_positions,
       CAST(ceil(nlines / 46.0) AS BIGINT) AS last_page,
       72.0 + 14 * (nlines - 46 * (CAST(ceil(nlines / 46.0) AS BIGINT) - 1))
         AS last_b
FROM n
"""


def q_page_layout(sf_dir):
    """SQL-checkable projection of the §6b layout arithmetic over the flat
    documents table: lines at 80 chars/line, 46 lines per 648pt page."""

    def f(b: pa.Table) -> pa.Table:
        n_chars = b["n_chars"].to_numpy(zero_copy_only=False).astype(np.int64)
        n_lines = np.maximum(1, -(-n_chars // 80))
        n_pages = -(-n_lines // 46)
        return pa.table({"doc_id": b["doc_id"],
                         "n_lines": pa.array(n_lines, pa.int64()),
                         "n_pages": pa.array(n_pages, pa.int64())})

    return _docs(sf_dir, ["doc_id", "n_chars"]).map_batches(f, batch_format="pyarrow")


SQL_PAGE_LAYOUT = """
SELECT doc_id,
       greatest(1, CAST(ceil(n_chars / 80.0) AS BIGINT)) AS n_lines,
       CAST(ceil(greatest(1, CAST(ceil(n_chars / 80.0) AS BIGINT)) / 46.0) AS BIGINT)
         AS n_pages
FROM documents
"""


def q_price_quantiles_kll(sf_dir):
    """KLL-sketch approximate quantiles over l_extendedprice — the
    high-cardinality companion to the exact bounded-domain histogram path
    (``quantity_quantiles``): prices are near-distinct per row, so the exact
    (value, count) shuffle would carry one row per value; the KLL summary is
    a fixed-size float payload per batch regardless of scale. SQL-hash
    oracle via the Misra-Gries precedent (``approx_token_topk``): with
    k >= n the sketch never compacts, its ceil(q*n) extraction rule IS
    ``quantile_disc`` (tested rule-for-rule), and the returned value is the
    bit-identical stored double — exact at gate scale (60k rows < k=131072),
    O(1/k)-approximate beyond (rank-error bound pinned by
    tests/test_sketch_clusters.py)."""
    from ..functions.sketch import approx_quantiles

    qs = [0.25, 0.5, 0.75, 0.9, 0.99]
    vals = approx_quantiles(_t(sf_dir, "lineitem", ["l_extendedprice"]),
                            "l_extendedprice", qs, k=1 << 17)
    return pa.table({"q": pa.array(qs, pa.float64()),
                     "value": pa.array(vals, pa.float64())})


SQL_PRICE_QUANTILES_KLL = """
SELECT 0.25 AS q, quantile_disc(l_extendedprice, 0.25) AS value FROM lineitem
UNION ALL
SELECT 0.5, quantile_disc(l_extendedprice, 0.5) FROM lineitem
UNION ALL
SELECT 0.75, quantile_disc(l_extendedprice, 0.75) FROM lineitem
UNION ALL
SELECT 0.9, quantile_disc(l_extendedprice, 0.9) FROM lineitem
UNION ALL
SELECT 0.99, quantile_disc(l_extendedprice, 0.99) FROM lineitem
"""


def q_page_select(sf_dir):
    """SQL-checked drive of the §6d page-range SELECTOR itself: each doc's
    cleaned text, repeated 32× so documents genuinely wrap pages at every sf,
    runs through the §6b layout engine as ONE paragraph span, then pages
    [2, 3] are selected via ``stages.layout.make_page_range_batch``. Output =
    the docs whose span touches the range, with the count of selected pages it
    touches; the DuckDB mirror reproduces the 46-line fragment rule + range
    intersection in closed form (a single fresh-page span occupies one
    fragment per page 1..ceil(nlines/46))."""
    from ..core.schema import SPAN_TYPE
    from ..stages.layout import add_layout_batch, make_page_range_batch

    def to_spans(b: pa.Table) -> pa.Table:
        t = b["text"]
        if isinstance(t, pa.ChunkedArray):
            t = t.combine_chunks()
        clean = pc.binary_repeat(clean_text_arr(t), 32)
        if isinstance(clean, pa.ChunkedArray):
            clean = clean.combine_chunks()
        n = len(clean)
        struct = pa.StructArray.from_arrays(
            [pa.array(["paragraph"] * n, pa.string()), clean,
             pa.array([""] * n, pa.string()),
             pa.array(np.zeros(n, dtype=np.int32))],
            fields=list(SPAN_TYPE))
        offs = pa.array(np.arange(n + 1, dtype=np.int32))
        return pa.table({"doc_id": b["doc_id"],
                         "spans": pa.ListArray.from_arrays(offs, struct)})

    def summarize(b: pa.Table) -> pa.Table:
        meta = b["spans_meta"]
        if isinstance(meta, pa.ChunkedArray):
            meta = meta.combine_chunks()
        doc_id = b["doc_id"]
        if isinstance(doc_id, pa.ChunkedArray):
            doc_id = doc_id.combine_chunks()
        lens = pc.list_value_length(meta).to_numpy(zero_copy_only=False)
        keep = pa.array(lens > 0)
        mv = meta.flatten()  # rows align with kept docs (empty lists drop out)
        pos = mv.field("positions")
        pages = pos.flatten().field("page_no").to_numpy(zero_copy_only=False)
        par = pc.list_parent_indices(pos).to_numpy(zero_copy_only=False)
        nsel = np.bincount(par[(pages >= 2) & (pages <= 3)],
                           minlength=len(mv)).astype(np.int64)
        return pa.table({"doc_id": doc_id.filter(keep),
                         "n_sel_pages": pa.array(nsel, pa.int64())})

    return (_docs(sf_dir, ["doc_id", "text"])
            .map_batches(to_spans, batch_format="pyarrow")
            .map_batches(add_layout_batch, batch_format="pyarrow")
            .map_batches(make_page_range_batch(2, 3), batch_format="pyarrow")
            .map_batches(summarize, batch_format="pyarrow"))


SQL_PAGE_SELECT = f"""
WITH c AS (
  SELECT doc_id,
         trim(regexp_replace(regexp_replace(text, '{GLYPH_PAT}', ' ', 'g'),
                             '{WS_RUN_PAT}', ' ', 'g'), {_TRIM_WS_SQL}) AS ct
  FROM documents),
n AS (SELECT doc_id,
             greatest(1, CAST(ceil(32 * length(ct) / 80.0) AS BIGINT)) AS nlines
      FROM c),
p AS (SELECT doc_id, CAST(ceil(nlines / 46.0) AS BIGINT) AS np FROM n)
SELECT doc_id, least(np, 3) - 1 AS n_sel_pages
FROM p WHERE np >= 2
"""


def q_table_cells(sf_dir):
    """T6 surface: per-table shape stats over the flagship corpus's media
    table. The shape columns are materialized at media-table build time
    (``extract.build_media_table`` has the decoded matrix in hand), so this
    query is a pure filter + projection — no per-row json.loads. Rows-only
    (engine-internal codec output; cell-matrix equality vs the Python oracle
    is pytest-pinned in test_media_table_cells_match_oracle)."""
    from .extract import ExtractConfig, build_media_table

    media = build_media_table(_interleaved_corpus(sf_dir), ExtractConfig())

    def shape(b: pa.Table) -> pa.Table:
        t = b.filter(pc.equal(b["content_type"], "table/x-synth"))
        return t.select(["media_ref", "n_rows", "n_cols", "n_null_cells"])

    return media.map_batches(shape, batch_format="pyarrow")


def q_page_screenshots(sf_dir):
    """I1 surface: per-page synthetic screenshot records over the flagship
    corpus (rows-only; blob/ref/page-count semantics are pinned by the
    oracle-parity pytest)."""
    from .extract import (ExtractConfig, build_extraction,
                          build_page_screenshots)

    out = build_extraction(_interleaved_corpus(sf_dir),
                           ExtractConfig(split_threshold=500, chunk_size=200))
    return build_page_screenshots(out).drop_columns(["data"])


def q_near_dedup_resolve(sf_dir):
    """End-to-end near-dedup RESOLVE over documents: candidate pairs → exact
    Jaccard edge filter → connected components → keep the min-id
    representative per cluster (``dedup_resolve``: broadcast drop-set under
    the bounded probe, ``dedup_resolve_bucketed`` anti-join at scale).

    SQL-hash-checked by running the resolver over the same DETERMINISTIC edge
    set as `dup_clusters` (adjacent-id candidates, integer-exact Jaccard cut
    5·|∩| ≥ 3·|∪|) so the kept-set mirror is the recursive-CTE components
    composed with a NOT-IN drop-set. The hash-dependent LSH candidate
    generator this feeds from in production stays covered by `minhash_pairs`
    / `jaccard_verify` (rows-only by nature)."""
    docs = _docs(sf_dir, ["doc_id", "text"])

    def mk(b: pa.Table) -> pa.Table:
        ids = b["doc_id"]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        idn = ids.to_numpy()
        sel = idn[idn % 5 != 4]
        return pa.table({"a": pa.array(sel, pa.int64()),
                         "b": pa.array(sel + 1, pa.int64())})

    cand = _docs(sf_dir, ["doc_id"]).map_batches(mk, batch_format="pyarrow")
    scored = dd.verify_pairs_exact_bucketed(cand, docs, n=1, threshold=0.0,
                                            emit_counts=True)

    def edge_filter(b: pa.Table) -> pa.Table:
        keep = pc.and_(
            pc.greater(b["n_union"], 0),
            pc.greater_equal(pc.multiply(b["n_inter"], pa.scalar(5, pa.int64())),
                             pc.multiply(b["n_union"], pa.scalar(3, pa.int64()))))
        return b.filter(keep).select(["a", "b"])

    edges = scored.map_batches(edge_filter, batch_format="pyarrow")
    kept = dd.dedup_resolve(docs, edges)
    return kept.select_columns(["doc_id"])


def q_html_strip_stats(sf_dir):
    """The HTML boilerplate-strip kernels (SPEC §2: tag strip → ordered entity
    decode → anchor-density drop rule), SQL-hash-checked by driving the REAL
    vectorized RE2 kernels (`functions/text_clean.py`, the same code the parse
    stage runs on html spans) over HTML built deterministically from the flat
    documents table: each doc's text wrapped in a page skeleton plus an anchor
    whose word count varies with doc_id, so the 2·(anchor words) ≥ total-words
    drop rule fires both ways across the corpus. DuckDB mirrors the build
    (string concat + repeat) and every rule term with the identical RE2
    pattern strings; all outputs are integers."""
    from ..functions import text_clean as tc

    def stats(b: pa.Table) -> pa.Table:
        ids = b["doc_id"]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        t = b["text"]
        if isinstance(t, pa.ChunkedArray):
            t = t.combine_chunks()
        n = len(ids)
        reps = (1 + ids.to_numpy() % 120).astype(np.int32)
        anchors = pc.binary_repeat(pa.array(["link "] * n), pa.array(reps))
        html = pc.binary_join_element_wise(
            pa.array(["<html><body><p>"] * n), t,
            pa.array([" A&amp;B</p><a href=\"/x\">"] * n), anchors,
            pa.array(["</a></body></html>"] * n), pa.scalar(""))
        is_html = tc.looks_like_html_arr(html).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        vis = tc.visible_text_arr(html)
        tw = tc.word_count_arr(vis).to_numpy(zero_copy_only=False).astype(np.int64)
        na = tc.word_count_arr(tc.visible_text_arr(tc.strip_anchors_arr(html))) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        clean_len = pc.utf8_length(tc.clean_text_arr(vis)).to_numpy(
            zero_copy_only=False).astype(np.int64)
        raw_len = pc.utf8_length(html).to_numpy(zero_copy_only=False).astype(np.int64)
        dropped = ((tw == 0) | (2 * (tw - na) >= tw)
                   | ((tw <= 2) & (5 * clean_len < raw_len))).astype(np.int64)
        return pa.table({"doc_id": ids,
                         "is_html": pa.array(is_html),
                         "n_words": pa.array(tw),
                         "n_link_words": pa.array(tw - na),
                         "clean_len": pa.array(clean_len),
                         "dropped": pa.array(dropped)})

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        stats, batch_format="pyarrow")


def _sql_entity_decode(expr: str) -> str:
    """DuckDB mirror of text_clean._ENTITIES decode (order matters, &amp; last)."""
    out = expr
    for ent, ch in [("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
                    ("&#39;", "'"), ("&nbsp;", " "), ("&amp;", "&")]:
        out = f"replace({out}, '{ent}', '{ch.replace(chr(39), chr(39)*2)}')"
    return out


SQL_HTML_STRIP_STATS = f"""
WITH h AS (
  SELECT doc_id,
         '<html><body><p>' || text || ' A&amp;B</p><a href="/x">' ||
         repeat('link ', CAST(1 + doc_id % 120 AS INT)) ||
         '</a></body></html>' AS html
  FROM documents),
v AS (
  SELECT doc_id, html,
         {_sql_entity_decode(f"regexp_replace(html, '{tc_mod.TAG_PAT}', ' ', 'g')")} AS vis,
         {_sql_entity_decode(
             f"regexp_replace(regexp_replace(html, '{tc_mod.ANCHOR_PAT}', ' ', 'g'),"
             f" '{tc_mod.TAG_PAT}', ' ', 'g')")} AS vis_na
  FROM h),
m AS (
  SELECT doc_id,
         CAST(regexp_matches(html, '{tc_mod.HTML_DETECT_PAT}') AS BIGINT) AS is_html,
         CAST(array_length(regexp_extract_all(vis, '{tc_mod.WORD_PAT}')) AS BIGINT) AS t,
         CAST(array_length(regexp_extract_all(vis_na, '{tc_mod.WORD_PAT}')) AS BIGINT) AS na,
         CAST(length(trim(regexp_replace(regexp_replace(vis, '{GLYPH_PAT}', ' ', 'g'),
                                         '{WS_RUN_PAT}', ' ', 'g'), {_TRIM_WS_SQL}))
              AS BIGINT) AS clean_len,
         CAST(length(html) AS BIGINT) AS raw_len
  FROM v)
SELECT doc_id, is_html, t AS n_words, t - na AS n_link_words, clean_len,
       CAST((t = 0 OR 2*(t-na) >= t OR (t <= 2 AND 5*clean_len < raw_len))
            AS BIGINT) AS dropped
FROM m
"""


def q_jaccard_band_verify(sf_dir):
    """The FULL candidate→verify near-dup chain, SQL-hash-checked end to end:
    candidates from the mod-M banded-LSH witness (`minhash_band_pairs`, exact
    band-tuple equality — itself SQL-mirrored), verified by the bucketed
    exact n-gram Jaccard scale path with integer |∩|/|∪| output (the
    `jaccard_adjacent` kernel). Composes the two established mirrors; same
    corpus validity note as `jaccard_adjacent` (every doc has ≥ n tokens, so
    the short-doc branch the mirror does not model never fires)."""
    from ..functions.dedup_witness import minhash_band_pairs

    docs = _docs(sf_dir, ["doc_id", "text"])
    pairs = minhash_band_pairs(docs, min_agree=8).select_columns(["a", "b"])
    out = dd.verify_pairs_exact_bucketed(pairs, docs, threshold=0.0,
                                         emit_counts=True)
    return out.select_columns(["a", "b", "n_inter", "n_union"])


SQL_JACCARD_BAND_VERIFY = """
WITH bp AS ({BAND_PAIRS}),
toks2 AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(text, '[ \t\n\r\f]+'),
                     x -> x <> '') AS t
  FROM documents),
grams2 AS (
  SELECT doc_id,
         list_distinct([array_to_string(t[i:i+2], ' ')
                        for i in generate_series(1, greatest(len(t)-2, 0))]) AS gs
  FROM toks2)
SELECT bp.a, bp.b,
       CAST(len(list_intersect(ga.gs, gb.gs)) AS BIGINT) AS n_inter,
       CAST(len(list_distinct(list_concat(ga.gs, gb.gs))) AS BIGINT) AS n_union
FROM bp JOIN grams2 ga ON ga.doc_id = bp.a
        JOIN grams2 gb ON gb.doc_id = bp.b
""".format(BAND_PAIRS=SQL_MINHASH_BAND_PAIRS)


def q_jaccard_adjacent(sf_dir):
    """Deterministic candidate pairs (doc_id, doc_id+1) for doc_id % 5 == 0,
    scored by the bucketed exact n-gram Jaccard scale path (gram-set
    co-partitioned joins, no text broadcast) — hash-checked on the integer
    |intersection| / |union| so the Jaccard operator itself is SQL-verified.
    Valid because doc_ids are contiguous 0..N-1 with N % 5 == 0 at every sf
    and every doc has ≥ n tokens (the short-doc whole-text gram branch, which
    the SQL mirror does not model, never fires on this corpus)."""
    docs = _docs(sf_dir, ["doc_id", "text"])

    def mk(b: pa.Table) -> pa.Table:
        ids = b["doc_id"]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        idn = ids.to_numpy()
        sel = idn[idn % 5 == 0]
        return pa.table({"a": pa.array(sel, pa.int64()),
                         "b": pa.array(sel + 1, pa.int64())})

    pairs = _docs(sf_dir, ["doc_id"]).map_batches(mk, batch_format="pyarrow")
    out = dd.verify_pairs_exact_bucketed(pairs, docs, threshold=0.0,
                                         emit_counts=True)
    return out.select_columns(["a", "b", "n_inter", "n_union"])


SQL_JACCARD_ADJACENT = """
WITH toks AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(text, '[ \t\n\r\f]+'),
                     x -> x <> '') AS t
  FROM documents),
grams AS (
  SELECT doc_id,
         list_distinct([array_to_string(t[i:i+2], ' ')
                        for i in generate_series(1, greatest(len(t)-2, 0))]) AS gs
  FROM toks)
SELECT ga.doc_id AS a, gb.doc_id AS b,
       CAST(len(list_intersect(ga.gs, gb.gs)) AS BIGINT) AS n_inter,
       CAST(len(list_distinct(list_concat(ga.gs, gb.gs))) AS BIGINT) AS n_union
FROM grams ga JOIN grams gb ON gb.doc_id = ga.doc_id + 1
WHERE ga.doc_id % 5 = 0
"""


def q_dup_clusters(sf_dir):
    """Distributed connected components over a DETERMINISTIC near-dup edge
    set, hash-checked against a DuckDB recursive-CTE mirror — the cluster
    resolution operator (``dedup_clusters``: driver union-find under the
    bounded probe, min-label propagation at scale) is otherwise only
    rows-only-checkable because LSH candidate generation is hash-dependent.

    Edges: (doc_id, doc_id+1) for doc_id % 5 != 4 (chains of ≤5 nodes that
    never wrap, since doc_ids are contiguous 0..N-1 with N % 5 == 0 at every
    sf), kept iff distinct-unigram Jaccard ≥ 0.6 — integer-exact as
    5·|∩| ≥ 3·|∪| so both engines cut on the same rule. Output: one row per
    node appearing in ≥1 edge, cluster_id = min doc_id of its component."""
    docs = _docs(sf_dir, ["doc_id", "text"])

    def mk(b: pa.Table) -> pa.Table:
        ids = b["doc_id"]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        idn = ids.to_numpy()
        sel = idn[idn % 5 != 4]
        return pa.table({"a": pa.array(sel, pa.int64()),
                         "b": pa.array(sel + 1, pa.int64())})

    cand = _docs(sf_dir, ["doc_id"]).map_batches(mk, batch_format="pyarrow")
    scored = dd.verify_pairs_exact_bucketed(cand, docs, n=1, threshold=0.0,
                                            emit_counts=True)

    def edge_filter(b: pa.Table) -> pa.Table:
        keep = pc.and_(
            pc.greater(b["n_union"], 0),
            pc.greater_equal(pc.multiply(b["n_inter"], pa.scalar(5, pa.int64())),
                             pc.multiply(b["n_union"], pa.scalar(3, pa.int64()))))
        return b.filter(keep).select(["a", "b"])

    edges = scored.map_batches(edge_filter, batch_format="pyarrow")
    clusters = dd.dedup_clusters(edges)

    def rename(b: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": pc.cast(b["node"], pa.int64()),
            "cluster_id": pc.cast(b["cluster"], pa.int64()),
        })

    return clusters.map_batches(rename, batch_format="pyarrow")


# Shared recursive-CTE prefix: deterministic adjacent-id edges + connected
# components (min-label reachability) — composed by both the dup_clusters and
# near_dedup_resolve mirrors.
_SQL_DUP_CC_CTES = """
WITH RECURSIVE toks AS (
  SELECT doc_id,
         list_distinct(list_filter(regexp_split_to_array(text, '[ \t\n\r\f]+'),
                                   x -> x <> '')) AS gs
  FROM documents),
cand AS (
  SELECT ga.doc_id AS a, gb.doc_id AS b,
         len(list_intersect(ga.gs, gb.gs)) AS n_inter,
         len(list_distinct(list_concat(ga.gs, gb.gs))) AS n_union
  FROM toks ga JOIN toks gb ON gb.doc_id = ga.doc_id + 1
  WHERE ga.doc_id % 5 <> 4),
edges AS (
  SELECT a, b FROM cand WHERE n_union > 0 AND 5*n_inter >= 3*n_union),
sym AS (
  SELECT a AS u, b AS v FROM edges UNION ALL SELECT b AS u, a AS v FROM edges),
reach(n, lbl) AS (
  SELECT u, u FROM sym
  UNION
  SELECT s.v, r.lbl FROM reach r JOIN sym s ON s.u = r.n)
"""

SQL_DUP_CLUSTERS = _SQL_DUP_CC_CTES + """
SELECT CAST(n AS BIGINT) AS doc_id, CAST(MIN(lbl) AS BIGINT) AS cluster_id
FROM reach GROUP BY n
"""

# Kept set = documents minus nodes whose component min-label is not themselves.
SQL_NEAR_DEDUP_RESOLVE = _SQL_DUP_CC_CTES + """
SELECT CAST(d.doc_id AS BIGINT) AS doc_id
FROM documents d
WHERE d.doc_id NOT IN (SELECT n FROM reach GROUP BY n HAVING MIN(lbl) <> n)
"""


def q_epoch_shuffle(sf_dir):
    """Deterministic epoch-1 training shuffle over documents: global 0-based
    position of every doc in the md5-of-(id|epoch) order plus its round-robin
    shard — the zipWithIndex pattern (analytic bucket offsets + one coarse
    co-partition; functions/shuffle.py). SQL mirror: ROW_NUMBER over the same
    md5 ordering."""
    from ..functions.shuffle import global_positions

    docs = _docs(sf_dir, ["doc_id"])
    return global_positions(docs, "doc_id", epoch=1, n_shards=8)


SQL_EPOCH_SHUFFLE = """
WITH ranked AS (
  SELECT doc_id,
         ROW_NUMBER() OVER (ORDER BY md5(CAST(doc_id AS VARCHAR) || '|1'),
                            doc_id) - 1 AS p
  FROM documents)
SELECT doc_id, CAST(p AS BIGINT) AS pos, CAST(p % 8 AS BIGINT) AS shard
FROM ranked
"""


def q_media_decode_stats(sf_dir):
    """Multimodal decode stage over the flagship corpus payload column:
    per-(content_type, ok) counts and size envelope. Rows-only: payloads are
    engine-internal synth-codec bytes DuckDB cannot decode; decode semantics
    are pytest-pinned (tests/test_multimodal.py)."""
    from ..stages.multimodal import media_table_from_corpus

    meta = media_table_from_corpus(_interleaved_corpus(sf_dir))
    return _cast_int64(
        meta.groupby(["content_type", "ok"]).aggregate(
            Count(alias_name="n_media"),
            Min("n_bytes", alias_name="min_bytes"),
            Max("n_bytes", alias_name="max_bytes")),
        ["min_bytes", "max_bytes"],
    )


def q_frame_sample(sf_dir):
    """Frame-sampling stage: every 2nd 'frame' of table payloads (the synth
    video analog), content-addressed frame refs. Rows-only: refs are sha256
    content hashes of engine-internal payload bytes DuckDB cannot recompute;
    determinism + stride semantics are pytest-pinned
    (tests/test_multimodal.py)."""
    from ..stages.multimodal import FrameSample, explode_payloads

    flat = _interleaved_corpus(sf_dir).map_batches(
        explode_payloads, batch_format="pyarrow", batch_size=64)
    return flat.map_batches(FrameSample, batch_format="pyarrow", batch_size=64,
                            concurrency=(1, 4))


def q_approx_distinct_users(sf_dir):
    """HLL sketch count-distinct (mergeable-sketch pattern); single-row
    result. SQL-hash-checked despite being a sketch: in the mirrorable mode
    (md5-low-64 hashing = DuckDB ``md5_number_lower``; p=6) every step is
    integer-exact — registers are max-of-bit-lengths, the harmonic sum runs
    in arbitrary-precision ints, and the linear-counting regime reads a
    pinned literal table — so DuckDB reproduces the estimate bit-for-bit
    (``HLL.estimate_ppm``). Accuracy vs exact COUNT(DISTINCT) stays
    tolerance-pytest-pinned; the exact paths (`distinct_users`,
    `distinct_users_salted`) are separately SQL-hash-checked."""
    from ..functions.sketch import approx_distinct

    est = approx_distinct(_t(sf_dir, "events", ["user_id"]), "user_id",
                          p=6, hasher="md5", ppm=True)
    return pa.table({"metric": ["approx_distinct_users"],
                     "est_ppm": pa.array([est], pa.int64())})


# Pure-SQL HyperLogLog (p=6, md5_number_lower hashing), mirroring
# HLL.add_hashes/estimate_ppm integer-for-integer: bucket = h >> 58, rank =
# 59 - bit_length(h mod 2^58) (59 when the low bits are all zero), harmonic
# sum in HUGEINT, raw = alpha_ppm*m^2*2^64 // S, linear-counting regime from
# the same pinned literal table as functions/sketch.py::_LINEAR_PPM_P6.
_HLL_P6_EST = """
  SELECT {group_cols_sel}
         CAST(CASE WHEN raw <= 160000000 AND zeros > 0
              THEN list_extract([266168517, 221807097, 195857330, 177445678,
  163164490, 151495911, 141630267, 133084258, 125546144, 118803071,
  112703219, 107134491, 102011758, 97268848, 92853304, 88722839, 84842863,
  81184724, 77724422, 74441651, 71319081, 68341800, 65496887, 62773072,
  60160464, 57650338, 55234957, 52907428, 50661584, 48491884, 46393336,
  44361419, 42392033, 40481443, 38626241, 36823305, 35069770, 33363003,
  31700571, 30080232, 28499905, 26957661, 25451709, 23980380, 22542117,
  21135467, 19759070, 18411652, 17092018, 15799044, 14531676, 13288919,
  12069834, 10873538, 9699193, 8546009, 7413236, 6300164, 5206120, 4130465,
  3072590, 2031916, 1007894, 0], zeros)
              ELSE raw END AS BIGINT) AS est_ppm
  FROM (
    SELECT {group_cols_sel}
           64 - count(*) AS zeros,
           (CAST(709341 AS HUGEINT) * 64 * 64 * (CAST(1 AS HUGEINT) << 64))
             // (sum(CAST(1 AS HUGEINT) << (64 - r))
                 + (64 - count(*)) * (CAST(1 AS HUGEINT) << 64)) AS raw
    FROM (
      SELECT {group_cols_sel} h >> 58 AS bucket,
             max(CASE WHEN h % 288230376151711744 = 0 THEN 59
                 ELSE 59 - length(bin(h % 288230376151711744)) END) AS r
      FROM (SELECT {group_cols_sel}
                   md5_number_lower(CAST(user_id AS VARCHAR)) AS h
            FROM events)
      GROUP BY {group_by} bucket)
    GROUP BY {group_by_alone})
"""

SQL_APPROX_DISTINCT_USERS = (
    "SELECT 'approx_distinct_users' AS metric, est_ppm FROM ("
    + _HLL_P6_EST.format(group_cols_sel="", group_by="",
                         group_by_alone="ALL") + ")"
)


def q_price_p90_by_priority_kll(sf_dir):
    """GROUPED KLL quantile sketch: p50/p90 order price per priority class —
    the sketch path for percentile-per-group on unbounded/float domains
    (one fixed-size summary per (batch, group) instead of sorting each
    group). SQL-hash oracle via the Misra-Gries precedent: with k >= the
    per-group row count the sketch never compacts, so its ceil(q*n)
    extraction rule IS ``quantile_disc`` per group — exact at gate scale
    (~3k rows/priority < k=8192), O(1/k)-approximate beyond (rank-error
    tolerance pytest-pinned vs exact np.quantile)."""
    from ..functions.sketch import approx_quantiles_by

    return approx_quantiles_by(
        _t(sf_dir, "orders", ["o_orderpriority", "o_totalprice"]),
        "o_orderpriority", "o_totalprice", qs=[0.5, 0.9], k=8192)


SQL_PRICE_P90_BY_PRIORITY_KLL = """
SELECT o_orderpriority, 0.5 AS q,
       quantile_disc(o_totalprice, 0.5) AS value
FROM orders GROUP BY o_orderpriority
UNION ALL
SELECT o_orderpriority, 0.9,
       quantile_disc(o_totalprice, 0.9)
FROM orders GROUP BY o_orderpriority
"""


def q_approx_users_by_type(sf_dir):
    """GROUPED HLL count-distinct: approx distinct users per event type — the
    sketch path for COUNT(DISTINCT) GROUP BY at 100 TB (ships one register
    array per (batch, group) instead of every (group, user) pair;
    ``functions/sketch.py::approx_distinct_by``). SQL-hash-checked in the
    md5/p=6 integer-exact mode (see `approx_distinct_users`); accuracy vs the
    exact counts stays tolerance-tested in pytest."""
    from ..functions.sketch import approx_distinct_by

    return approx_distinct_by(_t(sf_dir, "events", ["event_type", "user_id"]),
                              "event_type", "user_id",
                              p=6, hasher="md5", ppm=True)


SQL_APPROX_USERS_BY_TYPE = _HLL_P6_EST.format(
    group_cols_sel="event_type,", group_by="event_type,",
    group_by_alone="event_type")


def q_extract_metrics(sf_dir):
    """Per-doc extraction metrics (doc_class/ocr_path/span+error counts)
    flattened from the flagship run. Rows-only: the metrics derive from the
    extraction engine's cascade decisions (SPEC §6a) whose independent gate is
    the Python oracle parity suite, not SQL."""
    from .extract import ExtractConfig, build_extraction

    out = build_extraction(_interleaved_corpus(sf_dir),
                           ExtractConfig(split_threshold=500, chunk_size=200))

    def flatten(b: pa.Table) -> pa.Table:
        m = b["metrics"]
        if isinstance(m, pa.ChunkedArray):
            m = m.combine_chunks()
        return pa.table({
            "doc_id": b["doc_id"],
            "doc_class": m.field("doc_class"),
            "ocr_path": m.field("ocr_path"),
            "n_spans_in": m.field("n_spans_in"),
            "n_spans_out": m.field("n_spans_out"),
            "n_errors": m.field("n_errors"),
        })

    return out.map_batches(flatten, batch_format="pyarrow")


def _keep_latest_order(t: pa.Table) -> pa.Table:
    """Per o_custkey keep the row with max (o_orderdate, o_orderkey):
    one lexsort + last-of-run mask, no per-key Python."""
    if t.num_rows == 0:
        return t
    ck = t["o_custkey"].combine_chunks().to_numpy()
    od = t["o_orderdate"].combine_chunks().cast(pa.int64()).to_numpy()
    ok = t["o_orderkey"].combine_chunks().to_numpy()
    order = np.lexsort((ok, od, ck))
    cks = ck[order]
    last = np.empty(len(cks), dtype=bool)
    last[:-1] = cks[1:] != cks[:-1]
    last[-1] = True
    return t.take(pa.array(order[last], pa.int64()))


def q_latest_order_per_customer(sf_dir):
    """Latest-record-per-key compaction (CDC / changelog keep-newest dedup;
    SQL ``QUALIFY ROW_NUMBER() OVER (PARTITION BY key ORDER BY ts DESC) = 1``).
    Scale shape: the argmax is ASSOCIATIVE, so every batch first collapses to
    at most one row per key inside ``map_batches`` — the single coarse
    exchange (``core/groupops.grouped_reduce``) then carries <= one row per
    (key, upstream batch), never the fact table. Deterministic tie-break =
    max o_orderkey among equal dates."""
    from ..core.groupops import grouped_reduce

    ds = _t(sf_dir, "orders", ["o_custkey", "o_orderkey", "o_orderdate"])
    partial = ds.map_batches(_keep_latest_order, batch_format="pyarrow")
    return grouped_reduce(partial, ["o_custkey"], _keep_latest_order,
                          n_parts=32, batch_format="pyarrow")


SQL_LATEST_ORDER_PER_CUSTOMER = """
SELECT o_custkey, o_orderkey, o_orderdate
FROM orders
QUALIFY ROW_NUMBER() OVER (PARTITION BY o_custkey
                           ORDER BY o_orderdate DESC, o_orderkey DESC) = 1
"""


def _mode_reduce(t: pa.Table) -> pa.Table:
    """Per user_id: event_type with the highest summed count (ties -> smallest
    event_type). Codes via sorted-unique + searchsorted so the tie-break is
    lexicographic; single lexsort + last-of-run mask."""
    g = t.group_by(["user_id", "event_type"]).aggregate([("n", "sum")])
    u = g["user_id"].combine_chunks().to_numpy()
    n = g["n_sum"].combine_chunks().to_numpy()
    et = g["event_type"].combine_chunks().to_numpy(zero_copy_only=False)
    vals = np.unique(et)
    codes = np.searchsorted(vals, et)
    order = np.lexsort((-codes, n, u))
    us = u[order]
    last = np.empty(len(us), dtype=bool)
    last[:-1] = us[1:] != us[:-1]
    last[-1] = True
    idx = order[last]
    return pa.table({"user_id": pa.array(u[idx], pa.int64()),
                     "event_type": pa.array(et[idx], pa.string()),
                     "n": pa.array(n[idx], pa.int64())})


def q_user_top_event(sf_dir):
    """Grouped MODE: each user's most frequent event type (count, with the
    deterministic tie-break count DESC, event_type ASC). Scale shape: per-batch
    Arrow ``group_by`` collapses rows to (user, type, count) partials BEFORE
    the exchange, so the single coarse co-partition on user_id ships counts,
    never events; the per-partition argmax is one vectorized lexsort over all
    keys of the partition (``core/groupops.grouped_reduce``, no per-user
    groups)."""
    from ..core.groupops import grouped_reduce

    def partial(b: pa.Table) -> pa.Table:
        g = b.group_by(["user_id", "event_type"]).aggregate(
            [("event_type", "count")])
        return g.rename_columns(["user_id", "event_type", "n"])

    ds = _t(sf_dir, "events", ["user_id", "event_type"])
    counts = ds.map_batches(partial, batch_format="pyarrow")
    return grouped_reduce(counts, ["user_id"], _mode_reduce,
                          n_parts=32, batch_format="pyarrow")


SQL_USER_TOP_EVENT = """
SELECT user_id, event_type, n FROM (
  SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS n,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY count(*) DESC, event_type ASC) AS rn
  FROM events GROUP BY user_id, event_type)
WHERE rn = 1
"""


def _topk_per_source(t: pa.Table, k: int = 5) -> pa.Table:
    """Keep the k largest-(n desc, tok asc) rows per source: one lexsort +
    segment-rank mask over ALL sources in the partition (no per-group
    Python). Sorted-unique token codes give the lexicographic tie-break."""
    if t.num_rows == 0:
        return t
    src = t["source"].combine_chunks().to_numpy(zero_copy_only=False)
    n = t["n"].combine_chunks().to_numpy()
    tok = t["tok"].combine_chunks().to_numpy(zero_copy_only=False)
    vals = np.unique(tok)
    codes = np.searchsorted(vals, tok)
    order = np.lexsort((codes, -n, src))
    ss = src[order]
    idx = np.arange(len(ss))
    first = np.empty(len(ss), dtype=bool)
    first[0] = True
    first[1:] = ss[1:] != ss[:-1]
    seg = np.maximum.accumulate(np.where(first, idx, 0))
    return t.take(pa.array(order[idx - seg < k], pa.int64()))


def q_source_token_topk(sf_dir):
    """GROUPED heavy hitters: the 5 most frequent tokens per source
    (count desc, token asc tie-break). Scale shape: (1) per-batch Arrow
    tokenize + group_by emits (source, tok, count) partials, so the first
    exchange ships counts, never token streams; (2) the exact sum
    co-partitions on (source, tok) — the VOCABULARY hash, no hot source key —
    and each partition prunes to its local per-source top-k (any global top-k
    item survives partial pruning); (3) the final exchange sees <= k rows per
    (source, partition)."""
    from ..core.groupops import grouped_reduce

    def partial(b: pa.Table) -> pa.Table:
        t = _arr(b["text"])
        toks = pc.split_pattern_regex(pc.fill_null(t, ""),
                                      pattern=r"[ \t\n\r\f]+")
        flat = _arr(pc.list_flatten(toks))
        par = _arr(pc.list_parent_indices(toks))
        keep = pc.not_equal(flat, "")
        flat, par = flat.filter(keep), par.filter(keep)
        src = _arr(b["source"]).take(par)
        g = (pa.table({"source": src, "tok": flat})
             .group_by(["source", "tok"]).aggregate([("tok", "count")]))
        g = g.rename_columns(["source", "tok", "n"])
        return g.set_column(2, "n", pc.cast(g["n"], pa.int64()))

    def sum_and_prune(t: pa.Table) -> pa.Table:
        g = t.group_by(["source", "tok"]).aggregate([("n", "sum")])
        return _topk_per_source(g.rename_columns(["source", "tok", "n"]))

    counts = (_docs_wide(sf_dir, ["source", "text"])
              .map_batches(partial, batch_format="pyarrow"))
    summed = grouped_reduce(counts, ["source", "tok"], sum_and_prune,
                            n_parts=64, batch_format="pyarrow")
    return grouped_reduce(summed, ["source"], _topk_per_source,
                          n_parts=4, batch_format="pyarrow")


SQL_SOURCE_TOKEN_TOPK = """
WITH t AS (
  SELECT source,
         unnest(list_filter(regexp_split_to_array(text, '[ \t\n\r\f]+'),
                            x -> x <> '')) AS tok
  FROM documents),
c AS (SELECT source, tok, CAST(count(*) AS BIGINT) AS n
      FROM t GROUP BY source, tok)
SELECT source, tok, n FROM c
QUALIFY ROW_NUMBER() OVER (PARTITION BY source
                           ORDER BY n DESC, tok ASC) <= 5
"""


def q_weighted_median_qty(sf_dir):
    """GROUPED WEIGHTED MEDIAN (weighted order statistic): per return flag,
    the smallest quantity whose cumulative extended-price weight reaches half
    the group's total. Exact at any scale for bounded domains: money quantizes
    to int64 cents per batch BEFORE summing (order-free), per-batch Arrow
    group_by collapses to (flag, qty, cents) partials, the single exchange is
    the <= |flags|x|qty-domain| histogram, and the cumulative walk touches
    <=150 rows. The integer comparison 2*cumsum >= total avoids any float
    halving."""

    def partial(b: pa.Table) -> pa.Table:
        cents = pc.cast(pc.round(pc.multiply(b["l_extendedprice"],
                                             pa.scalar(100.0))), pa.int64())
        t = pa.table({"flag": b["l_returnflag"],
                      "qty": pc.cast(b["l_quantity"], pa.int64()),
                      "cents": cents})
        g = t.group_by(["flag", "qty"]).aggregate([("cents", "sum")])
        return g.rename_columns(["flag", "qty", "cents"])

    hist = _cast_int64(
        (_t(sf_dir, "lineitem", ["l_returnflag", "l_quantity",
                                 "l_extendedprice"])
         .map_batches(partial, batch_format="pyarrow")
         .groupby(["flag", "qty"]).aggregate(Sum("cents", alias_name="cents"))),
        ["cents"])

    def walk(b: pa.Table) -> pa.Table:
        f = b["flag"].combine_chunks().to_numpy(zero_copy_only=False)
        q = b["qty"].combine_chunks().to_numpy()
        w = b["cents"].combine_chunks().to_numpy()
        order = np.lexsort((q, f))
        f, q, w = f[order], q[order], w[order]
        first = np.empty(len(f), dtype=bool)
        first[0] = True
        first[1:] = f[1:] != f[:-1]
        starts = np.flatnonzero(first)
        seg = np.maximum.accumulate(np.where(first, np.arange(len(f)), 0))
        csum = np.cumsum(w)
        cw = csum - np.concatenate(([0], csum))[seg]  # within-flag cumulative
        tot = np.add.reduceat(w, starts)
        tot_per_row = np.repeat(tot, np.diff(np.append(starts, len(f))))
        ok = 2 * cw >= tot_per_row  # monotone within a segment (cw rises)
        prev_ok = np.concatenate(([False], ok[:-1]))
        sel = np.flatnonzero(ok & (first | ~prev_ok))
        return pa.table({"flag": pa.array(f[sel], pa.string()),
                         "wmedian_qty": pa.array(q[sel], pa.int64())})

    return hist.repartition(1).map_batches(walk, batch_format="pyarrow",
                                           batch_size=None)


SQL_WEIGHTED_MEDIAN_QTY = """
WITH w AS (
  SELECT l_returnflag AS flag, CAST(l_quantity AS BIGINT) AS qty,
         SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS cents
  FROM lineitem GROUP BY 1, 2),
c AS (
  SELECT flag, qty,
         SUM(cents) OVER (PARTITION BY flag ORDER BY qty) AS cw,
         SUM(cents) OVER (PARTITION BY flag) AS tot
  FROM w)
SELECT flag, min(qty) AS wmedian_qty FROM c WHERE 2 * cw >= tot GROUP BY flag
"""


# ---------------------------------------------------------------------------
# Registry
# ---------------------------------------------------------------------------

QUERIES = {
    "doc_stats": (q_doc_stats, SQL_DOC_STATS),
    "glyph_clean": (q_glyph_clean, SQL_GLYPH_CLEAN),
    "lang_distribution": (q_lang_distribution, SQL_LANG_DISTRIBUTION),
    "source_stats": (q_source_stats, SQL_SOURCE_STATS),
    "exact_dedup": (q_exact_dedup, SQL_EXACT_DEDUP),
    "incremental_novel": (q_incremental_novel, SQL_INCREMENTAL_NOVEL),
    "incremental_near_dup": (q_incremental_near_dup, SQL_INCREMENTAL_NEAR_DUP),
    "token_freq": (q_token_freq, SQL_TOKEN_FREQ),
    "tfidf_top_term": (q_tfidf_top_term, SQL_TFIDF_TOP_TERM),
    "bigram_freq": (q_bigram_freq, SQL_BIGRAM_FREQ),
    "pmi_bigrams": (q_pmi_bigrams, SQL_PMI_BIGRAMS),
    "lm_doc_score": (q_lm_doc_score, SQL_LM_DOC_SCORE),
    "ccnet_tiers": (q_ccnet_tiers, SQL_CCNET_TIERS),
    "repetition_stats": (q_repetition_stats, SQL_REPETITION_STATS),
    "sequence_pack": (q_sequence_pack, SQL_SEQUENCE_PACK),
    "approx_token_topk": (q_approx_token_topk, SQL_APPROX_TOKEN_TOPK),
    "quantity_quantiles": (q_quantity_quantiles, SQL_QUANTITY_QUANTILES),
    "length_outliers": (q_length_outliers, SQL_LENGTH_OUTLIERS),
    "term_search": (q_term_search, SQL_TERM_SEARCH),
    "bm25_topk": (q_bm25_topk, SQL_BM25_TOPK),
    "chunk_windows": (q_chunk_windows, SQL_CHUNK_WINDOWS),
    "minhash_pairs": (q_minhash_pairs, None),
    "minhash_sigs": (q_minhash_sigs, SQL_MINHASH_SIGS),
    "minhash_band_pairs": (q_minhash_band_pairs, SQL_MINHASH_BAND_PAIRS),
    "simhash_pairs": (q_simhash_pairs, None),
    "simhash_sigs": (q_simhash_sigs, SQL_SIMHASH_SIGS),
    "simhash_band_pairs": (q_simhash_band_pairs, SQL_SIMHASH_BAND_PAIRS),
    "embedding_dup_pairs": (q_embedding_dup_pairs, SQL_EMBEDDING_DUP_PAIRS),
    "embedding_dup_lsh": (q_embedding_dup_lsh, None),
    "langid_pred": (q_langid_pred, SQL_LANGID_PRED),
    "quality_score": (q_quality_score, SQL_QUALITY_SCORE),
    "fingerprint": (q_fingerprint, SQL_FINGERPRINT_DIGEST),
    "fingerprint_grams": (q_fingerprint_grams, SQL_FINGERPRINT_GRAMS),
    "compression_ratio": (q_compression_ratio, None),
    "curation_pipeline": (q_curation_pipeline, SQL_CURATION_PIPELINE),
    "knn_cosine": (q_knn_cosine, SQL_KNN_COSINE),
    "knn_ivf": (q_knn_ivf, SQL_KNN_IVF),
    "kmeans_assign": (q_kmeans_assign, SQL_KMEANS_ASSIGN),
    "kmeans_clusters": (q_kmeans_clusters, None),
    "kmeans_iter_assign": (q_kmeans_iter_assign, SQL_KMEANS_ITER_ASSIGN),
    "semdedup_pairs": (q_semdedup_pairs, SQL_SEMDEDUP_PAIRS),
    "doc_features_knn": (q_doc_features_knn, SQL_DOC_FEATURES_KNN),
    "embedding_label_dist": (q_embedding_label_dist, SQL_EMBEDDING_LABEL_DIST),
    "events_tumbling": (q_events_tumbling, SQL_EVENTS_TUMBLING),
    "events_sliding": (q_events_sliding, SQL_EVENTS_SLIDING),
    "distinct_users": (q_distinct_users, SQL_DISTINCT_USERS),
    "distinct_users_salted": (q_distinct_users_salted, SQL_DISTINCT_USERS),
    "priority_revenue_share": (q_priority_revenue_share,
                               SQL_PRIORITY_REVENUE_SHARE),
    "price_zscore": (q_price_zscore, SQL_PRICE_ZSCORE),
    "funnel_stages": (q_funnel_stages, SQL_FUNNEL_STAGES),
    "user_window_counts": (q_user_window_counts, SQL_USER_WINDOW_COUNTS),
    "user_cohorts": (q_user_cohorts, SQL_USER_COHORTS),
    "top_orders": (q_top_orders, SQL_TOP_ORDERS),
    "sessions": (q_sessions, SQL_SESSIONS),
    "active_users": (q_active_users, SQL_ACTIVE_USERS),
    "near_dedup_resolve": (q_near_dedup_resolve, SQL_NEAR_DEDUP_RESOLVE),
    "html_strip_stats": (q_html_strip_stats, SQL_HTML_STRIP_STATS),
    "approx_distinct_users": (q_approx_distinct_users,
                              SQL_APPROX_DISTINCT_USERS),
    "approx_users_by_type": (q_approx_users_by_type,
                             SQL_APPROX_USERS_BY_TYPE),
    "price_p90_by_priority_kll": (q_price_p90_by_priority_kll,
                                  SQL_PRICE_P90_BY_PRIORITY_KLL),
    "lineitem_agg": (q_lineitem_agg, SQL_LINEITEM_AGG),
    "price_qty_corr": (q_price_qty_corr, SQL_PRICE_QTY_CORR),
    "orders_profile": (q_orders_profile, SQL_ORDERS_PROFILE),
    "ship_window_agg": (q_ship_window_agg, SQL_SHIP_WINDOW_AGG),
    "orders_by_segment": (q_orders_by_segment, SQL_ORDERS_BY_SEGMENT),
    "nation_region_counts": (q_nation_region_counts, SQL_NATION_REGION_COUNTS),
    "customer_order_nations": (q_customer_order_nations, SQL_CUSTOMER_ORDER_NATIONS),
    "customer_order_nations_join": (q_customer_order_nations_join,
                                    SQL_CUSTOMER_ORDER_NATIONS),
    "events_before_order": (q_events_before_order, SQL_EVENTS_BEFORE_ORDER),
    "event_last_order": (q_event_last_order, SQL_EVENT_LAST_ORDER),
    "median_price_by_segment": (q_median_price_by_segment, SQL_MEDIAN_PRICE_BY_SEGMENT),
    "p90_price_by_segment": (q_p90_price_by_segment, SQL_P90_PRICE_BY_SEGMENT),
    "order_rank_delta": (q_order_rank_delta, SQL_ORDER_RANK_DELTA),
    "order_ntile": (q_order_ntile, SQL_ORDER_NTILE),
    "order_percent_rank": (q_order_percent_rank, SQL_ORDER_PERCENT_RANK),
    "lineitem_running_qty": (q_lineitem_running_qty, SQL_LINEITEM_RUNNING_QTY),
    "customers_no_orders": (q_customers_no_orders, SQL_CUSTOMERS_NO_ORDERS),
    "customer_order_counts": (q_customer_order_counts, SQL_CUSTOMER_ORDER_COUNTS),
    "bloom_semi_orders": (q_bloom_semi_orders, SQL_BLOOM_SEMI_ORDERS),
    "lineitem_rollup": (q_lineitem_rollup, SQL_LINEITEM_ROLLUP),
    "orders_pivot": (q_orders_pivot, SQL_ORDERS_PIVOT),
    "price_histogram": (q_price_histogram, SQL_PRICE_HISTOGRAM),
    "repeat_customers": (q_repeat_customers, SQL_REPEAT_CUSTOMERS),
    "churned_customers": (q_churned_customers, SQL_CHURNED_CUSTOMERS),
    "regional_volume": (q_regional_volume, SQL_REGIONAL_VOLUME),
    "benchmark_overlap": (q_benchmark_overlap, SQL_BENCHMARK_OVERLAP),
    "norm_text": (q_norm_text, SQL_NORM_TEXT),
    "cross_doc_grams": (q_cross_doc_grams, SQL_CROSS_DOC_GRAMS),
    "chunk_dedup": (q_chunk_dedup, SQL_CHUNK_DEDUP),
    "pii_scrub": (q_pii_scrub, SQL_PII_SCRUB),
    "sample_orders": (q_sample_orders, SQL_SAMPLE_ORDERS),
    "top_orders_per_segment": (q_top_orders_per_segment, SQL_TOP_ORDERS_PER_SEGMENT),
    "split_counts": (q_split_counts, SQL_SPLIT_COUNTS),
    "token_budget_select": (q_token_budget_select, SQL_TOKEN_BUDGET_SELECT),
    "classifier_scores": (q_classifier_scores, SQL_CLASSIFIER_SCORES),
    "classifier_calibrated": (q_classifier_calibrated, SQL_CLASSIFIER_CALIBRATED),
    "props_extract": (q_props_extract, SQL_PROPS_EXTRACT),
    "dsir_sample": (q_dsir_sample, SQL_DSIR_SAMPLE),
    "bpe_merges": (q_bpe_merges, SQL_BPE_MERGES),
    "bpe_token_counts": (q_bpe_token_counts, SQL_BPE_TOKEN_COUNTS),
    "stratified_customers": (q_stratified_customers, SQL_STRATIFIED_CUSTOMERS),
    "rebalance_sources": (q_rebalance_sources, SQL_REBALANCE_SOURCES),
    "source_top_docs": (q_source_top_docs, SQL_SOURCE_TOP_DOCS),
    "weighted_sample_orders": (q_weighted_sample_orders,
                               SQL_WEIGHTED_SAMPLE_ORDERS),
    "upsample_docs": (q_upsample_docs, SQL_UPSAMPLE_DOCS),
    "extract_flagship": (q_extract_flagship, None),
    "extract_metrics": (q_extract_metrics, None),
    "span_positions": (q_span_positions, None),
    "span_fragments": (q_span_fragments, SQL_SPAN_FRAGMENTS),
    "page_layout": (q_page_layout, SQL_PAGE_LAYOUT),
    "page_select": (q_page_select, SQL_PAGE_SELECT),
    "price_quantiles_kll": (q_price_quantiles_kll, SQL_PRICE_QUANTILES_KLL),
    "page_screenshots": (q_page_screenshots, None),
    "table_cells": (q_table_cells, None),
    "jaccard_band_verify": (q_jaccard_band_verify, SQL_JACCARD_BAND_VERIFY),
    "jaccard_adjacent": (q_jaccard_adjacent, SQL_JACCARD_ADJACENT),
    "dup_clusters": (q_dup_clusters, SQL_DUP_CLUSTERS),
    "epoch_shuffle": (q_epoch_shuffle, SQL_EPOCH_SHUFFLE),
    "embedding_centroids": (q_embedding_centroids, SQL_EMBEDDING_CENTROIDS),
    "media_decode_stats": (q_media_decode_stats, None),
    "frame_sample": (q_frame_sample, None),
    "latest_order_per_customer": (q_latest_order_per_customer,
                                  SQL_LATEST_ORDER_PER_CUSTOMER),
    "user_top_event": (q_user_top_event, SQL_USER_TOP_EVENT),
    "source_token_topk": (q_source_token_topk, SQL_SOURCE_TOKEN_TOPK),
    "weighted_median_qty": (q_weighted_median_qty, SQL_WEIGHTED_MEDIAN_QTY),
}
