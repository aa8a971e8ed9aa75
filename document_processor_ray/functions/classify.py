"""Linear text-classifier INFERENCE at corpus scale (the fastText /
DSIR-filter shape, Joulin et al. 2016, arXiv 1607.01759): a trained weight
vector over hashed bag-of-words features is broadcast once (``ray.put``),
then every document is scored with one vectorized gather + segmented sum per
batch — the standard "apply a quality/domain classifier to 100 TB" stage that
gates pretraining corpora (CCNet / DataComp / Dolma all end with one).

Scale shape: the model is megabytes while the corpus is terabytes, so the
ONLY sane layout is weights in the object store (``ray.put`` once, zero-copy
view in every actor's ``__init__``) and a stateless shuffle-free
``map_batches`` pass over the text — no join, no exchange, no per-batch
re-ship. Scoring is exact integer arithmetic (int64 weights, int64 sums), so
the output is reproducible across engines and batch boundaries.

Tokenize + hash reuses ``dedup._flat_token_hashes`` (md5 mode is bit-identical
to DuckDB ``md5_number_lower``), which makes the whole inference pass
SQL-hash-mirrorable when the weights themselves derive from a deterministic
md5 expression (``synth_weights``) — real trained weights drop in as any
int64/float array without touching the pipeline.

Reference seam: the reference repo has no classifier (it is an extraction
HTTP service); this operator comes from the LLM-data-pipeline brief, same
family as ``functions/lm.py`` (bigram-LM scorer) and ``functions/textstats.py``
(heuristic quality), completing the score-then-filter triad.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

import ray
import ray.data as rd

from .dedup import _flat_token_hashes


def synth_weights(dim: int) -> np.ndarray:
    """Deterministic pseudo-trained int64 weight vector: weight(j) =
    md5-low-64(str(j)) % 1001 - 500, i.e. uniform integers in [-500, 500].
    Bit-identical to DuckDB ``md5_number_lower(CAST(j AS VARCHAR)) % 1001 -
    500``, so a pipeline scored with these weights hash-checks cross-engine."""
    w = np.empty(dim, dtype=np.int64)
    for j in range(dim):
        h = int.from_bytes(hashlib.md5(str(j).encode()).digest()[8:], "little")
        w[j] = h % 1001 - 500
    return w


class LinearScorer:
    """Actor-pool stage: ``(id passthrough, clf_score:int64, clf_label:str)``.

    ``weights``: an ``ObjectRef`` to (or plain array of) the int64 weight
    vector — resolved ONCE per actor here, a zero-copy object-store view
    shared by every batch the actor scores. Bag-of-words with counts:
    score(doc) = sum over token occurrences of w[token_hash % dim].
    """

    def __init__(self, weights, id_col: str = "doc_id",
                 text_col: str = "text", threshold: int = 0,
                 labels: tuple[str, str] = ("keep", "drop")):
        if isinstance(weights, ray.ObjectRef):
            weights = ray.get(weights)
        self.w = np.ascontiguousarray(weights, dtype=np.int64)
        self.dim = np.uint64(len(self.w))
        self.id_col, self.text_col = id_col, text_col
        self.threshold = int(threshold)
        self.labels = labels
        self._cache: dict[str, int] = {}

    def __call__(self, b: pa.Table) -> pa.Table:
        th, counts = _flat_token_hashes(b[self.text_col], self._cache,
                                        hasher="md5")
        n = len(counts)
        rows = np.repeat(np.arange(n, dtype=np.int64), counts)
        tw = self.w[(th % self.dim).astype(np.int64)]
        # integer-valued float64 accumulation is exact while |partial sums|
        # < 2^53; per-doc token mass ≪ 2^43 keeps that with margin
        scores = np.bincount(rows, weights=tw.astype(np.float64),
                             minlength=n).astype(np.int64)
        lab = np.where(scores >= self.threshold, self.labels[0],
                       self.labels[1])
        return pa.table({self.id_col: b[self.id_col],
                         "clf_score": pa.array(scores, pa.int64()),
                         "clf_label": pa.array(lab.tolist(), pa.string())})


def linear_classify(ds: rd.Dataset, weights: np.ndarray | None = None,
                    dim: int = 256, id_col: str = "doc_id",
                    text_col: str = "text", threshold: int = 0,
                    concurrency: int | tuple[int, int] = (1, 4)) -> rd.Dataset:
    """Score every row of ``ds`` with a linear bag-of-hashed-words classifier.
    ``weights=None`` synthesizes the deterministic ``synth_weights(dim)``
    vector. The weight vector is put in the object store once and read
    zero-copy by each scoring actor."""
    if weights is None:
        weights = synth_weights(dim)
    w = np.ascontiguousarray(weights, dtype=np.int64)
    # real models are MBs: ship by ObjectRef (one store copy, zero-copy view
    # per actor). Tiny vectors ride the task spec directly — an ObjectRef in
    # constructor args also trips Ray's actor-restart warning (issue #53727).
    payload = ray.put(w) if w.nbytes > 1 << 20 else w
    return ds.map_batches(
        LinearScorer, batch_format="pyarrow", concurrency=concurrency,
        fn_constructor_kwargs={"weights": payload, "id_col": id_col,
                               "text_col": text_col, "threshold": threshold})
