"""Arrow-batched twins of the interpreted higher-order vector expressions.

``zip_with``/``aggregate`` lambdas evaluate INTERPRETED, per element (no
whole-stage codegen for higher-order functions), so every dot product /
L2 / normalization in the ANN/PQ/k-means family pays an expression-tree
walk per vector element.  These kernels move exactly that arithmetic into
one vectorized numpy pass per Arrow batch (guide §4.2 — the lang_id
``scorer="kernel"`` pattern) while producing BIT-IDENTICAL doubles:

- the fold order is preserved: ``F.aggregate(xs, 0.0, acc + f(x))`` is the
  left fold ``((0.0 + f(x0)) + f(x1)) + ...``; the kernels accumulate
  column by column over the stacked batch matrix, which performs the same
  IEEE-754 double additions in the same order for every row;
- every elementwise op (cast float32->float64, multiply, subtract,
  divide, ``sqrt``) is a single correctly-rounded IEEE-754 operation in
  both engines, so per-element results are bit-equal;
- all ROUNDING stays in Spark: callers keep applying ``F.round`` (HALF_UP
  through Java BigDecimal) to the kernel's raw double exactly as they did
  to the expression's raw double — the kernel never reproduces Java
  rounding, which is the JDK-dependent landmine that blocked this rewrite
  in r11 ("Not yet optimized" #2).

NULL semantics mirror the expressions: a NULL array on either side, or a
length mismatch (``zip_with`` pads with NULLs, poisoning the fold), yields
NULL.  NaN elements propagate to a NaN result in both engines.  One
deliberate narrowing, documented: the expressions return NULL for an
array containing a NULL ELEMENT, while Arrow's pandas conversion surfaces
null elements as NaN (kernel result NaN, not NULL) — no caller produces
null elements (vectors come from parquet float arrays or prior
kernel/expression output).

Set ``EMM_VEC_KERNEL=0`` to fall back to the expression twins everywhere
(the lang_id ``scorer`` switch posture); parity between the two shapes is
pinned in tests/test_veckernel.py and by the family's exact oracles.

Every kernel is marked ``asNondeterministic()`` — guide §4.4: the
``isNotNull`` filters the callers apply to kernel-derived columns
otherwise get pushed BELOW the projection and the optimizer re-evaluates
the whole Python chain once under the filter and once above it (observed:
every ArrowEvalPython doubled in the ivf_pq_topk plan, 3x wall).  The
functions are pure; the flag is purely an optimizer fence against
duplication.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType


def kernel_enabled() -> bool:
    """Default OFF (r12, measured): at bench scale (sf0.1, 2k x 64
    vectors) the family is job-latency bound, not arithmetic bound — the
    kernels' extra Python-worker hops across many short stages cost more
    than the interpreted-HOF arithmetic they remove (ivf_pq_topk A/B:
    ~4.1-5.2s expression vs ~7.4-9.7s kernel, three adjacent probe
    rounds; primitive-level the kernels DO win: normalize 0.33s vs 0.97s
    standalone).  At production scale the kernel shape is the right one
    (map-only assignment, no nlist-way fan-out, no window Exchange of
    vector payloads, O(d) instead of O(d^2) normalize) — enable with
    EMM_VEC_KERNEL=1; parity is pinned in tests/test_veckernel.py."""
    return os.environ.get("EMM_VEC_KERNEL", "0") == "1"


def _lengths(series: pd.Series):
    vals = series.to_numpy()
    lens = np.full(len(vals), -1, dtype=np.int64)
    for i, v in enumerate(vals):
        if v is not None:
            lens[i] = len(v)
    return vals, lens


def _arrow_series(out: np.ndarray, null: np.ndarray) -> pd.Series:
    """Return through an Arrow-backed series: Spark's serializer runs
    pa.Array.from_pandas on the result, whose numpy path treats NaN as
    the NULL sentinel — an expression-NaN (e.g. a NaN input element)
    would silently become NULL.  Building the arrow array ourselves
    (mask for real NULLs) keeps NaN as NaN, exactly like the expression."""
    arr = pa.array(out, mask=null if null.any() else None)
    return pd.Series(pd.arrays.ArrowExtensionArray(arr))


def _fold_pair_raw(a: pd.Series, b: pd.Series, l2: bool):
    """Shared implementation of the dot / L2^2 left folds:
    (values ndarray, null mask)."""
    av, la = _lengths(a)
    bv, lb = _lengths(b)
    n = len(av)
    out = np.zeros(n, dtype=np.float64)
    # a NULL side or a zip_with length mismatch folds to NULL
    null = (la < 0) | (lb < 0) | (la != lb)
    ok = ~null
    d = 0
    if ok.any():
        d = int(np.bincount(la[ok]).argmax())  # the uniform dimension
    fast = ok & (la == d)
    if d > 0 and fast.any():
        idx = np.nonzero(fast)[0]
        ma = np.vstack([np.asarray(av[i], dtype=np.float64) for i in idx])
        mb = np.vstack([np.asarray(bv[i], dtype=np.float64) for i in idx])
        if l2:
            p = ma - mb
            p *= p
        else:
            p = ma * mb
        acc = np.zeros(len(idx), dtype=np.float64)
        for j in range(d):  # left fold, column by column
            acc += p[:, j]
        out[idx] = acc
    # off-modal lengths (mixed-dimension batches): exact scalar fold;
    # zero-length rows fold to the 0.0 initial value via `out`'s zeros
    for i in np.nonzero(ok & ~fast)[0]:
        x = np.asarray(av[i], dtype=np.float64)
        y = np.asarray(bv[i], dtype=np.float64)
        s = 0.0
        if l2:
            for xi, yi in zip(x, y):
                dxy = xi - yi
                s += dxy * dxy
        else:
            for xi, yi in zip(x, y):
                s += xi * yi
        out[i] = s
    return out, null


@F.pandas_udf(DoubleType())
def dot_kernel(a: pd.Series, b: pd.Series) -> pd.Series:
    """Bit-exact twin of ``ann._dot`` (see module docstring)."""
    return _arrow_series(*_fold_pair_raw(a, b, l2=False))


dot_kernel = dot_kernel.asNondeterministic()


@F.pandas_udf(DoubleType())
def l2sq_kernel(a: pd.Series, b: pd.Series) -> pd.Series:
    """Bit-exact twin of ``pq._l2sq``."""
    return _arrow_series(*_fold_pair_raw(a, b, l2=True))


l2sq_kernel = l2sq_kernel.asNondeterministic()


def make_cents_dots(cents: list):
    """Build a pandas UDF scoring every input vector against EVERY
    centroid of a bounded, driver-collected centroid list (``nlist`` <=
    64 rows — the same bounded materialization as the streaming
    literal-centroid router): returns ``array<double>`` of raw dot
    products, index-aligned with ``cents``.

    Per (vector, centroid) pair the value is the bit-exact ``_dot`` left
    fold (column-sequential accumulation).  A NULL centroid, a NULL input
    vector or a length mismatch yields a NULL element at that index —
    exactly the expression's ``dot(v, c)`` NULL semantics.  Documented
    narrowing (module docstring): a NaN dot comes back as a NULL element
    (Spark's nested Arrow conversion nans-as-nulls); real vectors are
    NaN-free and the legacy shape remains under ``EMM_VEC_KERNEL=0``.
    """
    n_c = len(cents)
    c_lens = np.array(
        [len(c) if c is not None else -1 for c in cents], dtype=np.int64
    )
    valid_lens = c_lens[c_lens >= 0]
    # modal centroid length = the uniform dimension; off-modal or NULL
    # centroids (e.g. a dead NULL centroid from a zero-norm seed) score
    # NULL per element without forcing whole batches onto the scalar path
    d = int(np.bincount(valid_lens).argmax()) if valid_lens.size else -1
    good = np.nonzero(c_lens == d)[0] if d > 0 else np.array([], dtype=np.int64)
    cmat = (
        np.array([np.asarray(cents[j], dtype=np.float64) for j in good])
        if good.size
        else None
    )
    all_good = good.size == n_c

    @F.pandas_udf("array<double>")
    def cents_dots(v: pd.Series) -> pd.Series:
        vals, vl = _lengths(v)
        m = len(vals)
        out: list = [None] * m
        fast = (vl == d) if d > 0 else np.zeros(m, bool)
        if cmat is not None and fast.any():
            idx = np.nonzero(fast)[0]
            rows = np.vstack([np.asarray(vals[i], dtype=np.float64) for i in idx])
            s = np.empty((len(idx), good.size), dtype=np.float64)
            for j in range(good.size):
                p = rows * cmat[j]
                acc = np.zeros(len(idx), dtype=np.float64)
                for col in range(d):  # left fold, column by column
                    acc += p[:, col]
                s[:, j] = acc
            if all_good:
                for k, i in enumerate(idx):
                    out[i] = s[k]
            else:
                for k, i in enumerate(idx):
                    row_out = [None] * n_c
                    for gj, j in enumerate(good):
                        row_out[j] = float(s[k, gj])
                    out[i] = row_out
        for i in np.nonzero(~fast)[0]:
            if vl[i] < 0:
                out[i] = [None] * n_c  # NULL vector: every pair dot is NULL
                continue
            x = np.asarray(vals[i], dtype=np.float64)
            scores = []
            for c in cents:
                if c is None or len(c) != len(x):
                    scores.append(None)
                    continue
                acc = 0.0
                for xi, ci in zip(x, c):
                    acc += xi * float(ci)
                scores.append(acc)
            out[i] = scores
        return pd.Series(out, dtype=object)

    return cents_dots.asNondeterministic()


def make_sub_l2sq(by_sub: dict):
    """Build a pandas UDF scoring each ``(sub_id, subvector)`` row against
    every codebook centroid of its subspace: returns ``array<double>`` of
    raw squared L2 distances, aligned with ``by_sub[sub_id]``'s code order
    (the caller zips it with the matching code-id array Spark-side).

    ``by_sub`` maps ``sub_id -> list[(code, centroid)]``, the bounded
    driver-collected codebook (``m * k`` rows — the same model-artifact
    materialization as ``PQModel.save``'s ``coalesce(1)``).  Per pair the
    value is the bit-exact ``_l2sq`` left fold.  A length mismatch yields
    a NULL element (the expression's NULL distance); an unknown sub_id
    yields NULL (the caller filters it — the legacy inner join's drop).
    """
    mats = {
        int(s): np.array(
            [np.asarray(c, dtype=np.float64) for _, c in pairs]
        )
        for s, pairs in by_sub.items()
    }
    dims = {s: (m.shape[1] if m.size else 0) for s, m in mats.items()}

    @F.pandas_udf("array<double>")
    def sub_l2sq(sub: pd.Series, v: pd.Series) -> pd.Series:
        subs = sub.to_numpy()
        vals, vl = _lengths(v)
        m = len(vals)
        out: list = [None] * m
        for s in np.unique(subs):
            key = int(s)
            cm = mats.get(key)
            if cm is None:
                continue  # unknown subspace: NULL, caller drops the row
            n_codes, d = cm.shape[0], dims[key]
            sel = np.nonzero((subs == s) & (vl == d))[0]
            if d > 0 and sel.size and n_codes:
                rows = np.vstack(
                    [np.asarray(vals[i], dtype=np.float64) for i in sel]
                )
                sc = np.empty((sel.size, n_codes), dtype=np.float64)
                for j in range(n_codes):
                    p = rows - cm[j]
                    p *= p
                    acc = np.zeros(sel.size, dtype=np.float64)
                    for col in range(d):  # left fold, column by column
                        acc += p[:, col]
                    sc[:, j] = acc
                for k_i, i in enumerate(sel):
                    out[i] = sc[k_i]
            # off-dimension rows of this subspace: exact scalar path
            for i in np.nonzero((subs == s) & (vl >= 0) & (vl != d))[0]:
                x = np.asarray(vals[i], dtype=np.float64)
                scores = []
                for _, c in by_sub[key]:
                    if len(c) != len(x):
                        scores.append(None)
                        continue
                    acc = 0.0
                    for xi, ci in zip(x, c):
                        dd = xi - float(ci)
                        acc += dd * dd
                    scores.append(acc)
                out[i] = scores
            if d == 0 and n_codes:
                for i in np.nonzero((subs == s) & (vl == 0))[0]:
                    out[i] = [0.0] * n_codes  # empty fold = 0.0 per code
        return pd.Series(out, dtype=object)

    return sub_l2sq.asNondeterministic()


@F.pandas_udf(DoubleType())
def norm_kernel(a: pd.Series) -> pd.Series:
    """Bit-exact twin of ``ann._norm``: ``sqrt`` of the self-dot left fold
    (``x*x`` per element, both engines' ``sqrt`` is the correctly-rounded
    IEEE operation).  The caller (``_l2_normalize``) keeps the division
    and the ``when(norm > 0)`` gate in Spark, so every edge case (NULL,
    zero-norm, NaN elements) follows the expression exactly."""
    out, null = _fold_pair_raw(a, a, l2=False)
    return _arrow_series(np.sqrt(out), null)


norm_kernel = norm_kernel.asNondeterministic()
