"""In-engine deterministic linear-classifier training (hard-sigmoid
logistic regression) over integer feature columns.

The model-based quality-filtering step of a modern LLM data pipeline
(CCNet / LLaMA-style: train a small classifier on weak labels, then gate
the corpus with its scores) — expressed so the training itself runs as a
fixed number of exact integer-arithmetic gradient steps INSIDE the engine:

- Features are integer micro-units (caller-scaled into ``[0, P]`` with
  ``P = 1_000_000``); weights are integers at the same scale, so every
  dot product, clamp, and gradient sum is exact 64/128-bit integer math —
  no ``exp``/``ln`` whose last-ULP rounding differs across engines (the
  reason the sigmoid is the HARD sigmoid ``clamp(1/2 + z/4, 0, 1)``: it
  keeps the logistic-regression gradient shape while staying inside
  integer arithmetic, the same determinism trade made by quantized-NN
  training).
- One gradient step = ONE map-side partial aggregate over the corpus
  (``d + 1`` integer sums) + a d-sized driver collect + a pure-Python
  exact weight update — the BPE-train cost shape: corpus-sized scans,
  vocabulary(here: d)-sized driver state. At 100 TB each step is a
  single AQE-sized shuffle of per-partition partials; nothing quadratic,
  nothing per-row in Python.
- The weight update uses FLOOR division (Python ``//``) and a box clamp
  at ``±100·W``; the DuckDB oracle replays the identical schedule with a
  portable floor-division expression, so the trained weights are
  bit-identical across engines at any scale.

Scale derivation (why the magnitudes are safe in signed 64-bit): features
``f <= P = 1e6``; weights clamped to ``|w| <= 100·W = 1e8`` so
``|z| <= d·1e14``; the hard-sigmoid output is pre-scaled to
``q = 4·W·P·sigma(z) in [0, 4e12]``, so the per-row gradient term
``|err·f| <= 4e18 < 2^63 - 1``. Row sums go through DECIMAL(38,0)
(HUGEINT in DuckDB).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: feature / weight micro-scale: f_real = f / P, w_real = w / W
P = 1_000_000
W = 1_000_000
#: box constraint |w_real| <= 100 — keeps every z / gradient term inside
#: exact signed-64-bit range (see module docstring)
W_CAP = 100 * W
#: hard-sigmoid fixed-point form: q = clamp(2WP + z, 0, 4WP) = 4WP * p
Q_MID = 2 * W * P
Q_MAX = 4 * W * P


def z_expr(weights: Sequence[int], feature_cols: Sequence[str]) -> Column:
    """Exact integer logit ``z = sum_i w_i * f_i`` (LongType-safe under the
    W_CAP box: |z| <= d * 1e14)."""
    z = F.lit(int(weights[0])) * F.col(feature_cols[0])
    for w, c in zip(weights[1:], feature_cols[1:]):
        z = z + F.lit(int(w)) * F.col(c)
    return z


def train_hardsig_logreg(
    feats: DataFrame,
    feature_cols: Sequence[str],
    label_col: str,
    steps: int = 3,
) -> list[int]:
    """Run ``steps`` exact full-batch gradient steps of hard-sigmoid
    logistic regression and return the integer weight vector.

    ``feats`` must carry integer feature columns in ``[0, P]`` and a 0/1
    integer ``label_col``. Learning rate is fixed at 4 — folded into the
    exact divisor ``D = 1_000_000_000_000 * n_rows`` (= 4·P²·N / eta). Each
    step is one aggregate job; the caller should persist ``feats``.
    Deterministic: integer sums are order-independent, so partitioning
    and AQE cannot change the result."""
    n = feats.count()
    if n == 0:
        return [0] * len(feature_cols)
    divisor = 1_000_000_000_000 * n
    weights = [0] * len(feature_cols)
    for _ in range(steps):
        z = z_expr(weights, feature_cols)
        q = F.least(F.greatest(z + F.lit(Q_MID), F.lit(0)), F.lit(Q_MAX))
        err = q - F.lit(Q_MAX) * F.col(label_col)
        row = feats.agg(
            *[
                F.sum((err * F.col(c)).cast("decimal(38,0)")).alias(f"g{i}")
                for i, c in enumerate(feature_cols)
            ]
        ).collect()[0]  # driver-bounded: d integers per step
        weights = [
            max(-W_CAP, min(W_CAP, w - int(row[f"g{i}"]) // divisor))
            for i, w in enumerate(weights)
        ]
    return weights


def train_hardsig_logreg_python(
    rows: Sequence[Sequence[int]], labels: Sequence[int], steps: int = 3
) -> list[int]:
    """Pure-Python replay of :func:`train_hardsig_logreg` on in-memory
    rows — the exact-model reference the tests compare the engine
    against (and the spec of what the SQL oracle's unrolled CTEs must
    compute)."""
    n = len(rows)
    if n == 0:
        return [0] * (len(rows[0]) if rows else 0)
    d = len(rows[0])
    divisor = 1_000_000_000_000 * n
    weights = [0] * d
    for _ in range(steps):
        grads = [0] * d
        for f, y in zip(rows, labels):
            z = sum(w * x for w, x in zip(weights, f))
            q = max(0, min(Q_MAX, Q_MID + z))
            err = q - Q_MAX * y
            for i, x in enumerate(f):
                grads[i] += err * x
        weights = [
            max(-W_CAP, min(W_CAP, w - g // divisor))
            for w, g in zip(weights, grads)
        ]
    return weights
