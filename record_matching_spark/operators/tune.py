"""Data-driven match-threshold discovery from the candidate-score histogram.

Reference analog: /root/reference/record_matching/main.py:194-260 (the
non-LLM half of training-set discovery) — sort a sample of candidate kNN
distances, first-difference them, find the FIRST PEAK of that derivative
(scipy.signal.find_peaks) and use the distance there as the threshold. A
derivative peak of the sorted-value curve is exactly a DENSITY VALLEY of
the value distribution: the gap between the near-duplicate mode and the
non-match bulk.

Spark restatement (B20's data-driven half; the LLM labeling oracle stays
out of scope):
- ONE aggregate pass bins candidate scores into a fixed-width histogram
  (groupBy bin with map-side partial aggregation — the shuffle carries at
  most `bins` rows per task, nothing scales with pair count);
- the driver (histogram is a few hundred ints) smooths the counts and
  places τ at the center of the deepest gap between the match mode (high
  scores) and the non-match mode (low scores) — the same gap the
  reference's first-derivative peak marks, found from density instead of
  a sorted driver-side sample so no data-sized collect is needed.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def score_histogram(
    scored: DataFrame,
    score_col: str = "score",
    bins: int = 256,
    lo: float = 0.0,
    hi: float = 1.0,
) -> np.ndarray:
    """Fixed-width histogram of a score column as a numpy array of counts.
    One distributed aggregate; out-of-range values clamp to the edge bins;
    null/NaN scores are dropped (a null would otherwise floor() to a null
    bin and crash the fill loop — ADVICE r3)."""
    scored = scored.filter(
        F.col(score_col).isNotNull() & ~F.isnan(F.col(score_col))
    )
    b = F.floor((F.col(score_col) - F.lit(lo)) / F.lit(hi - lo) * bins).cast("int")
    b = F.greatest(F.lit(0), F.least(F.lit(bins - 1), b))
    rows = scored.select(b.alias("b")).groupBy("b").count().collect()
    h = np.zeros(bins, dtype=np.int64)
    for r in rows:
        h[r["b"]] = r["count"]
    return h


def discover_threshold(
    scored: DataFrame,
    score_col: str = "score",
    bins: int = 256,
    smooth_w: int = 5,
    min_mode_frac: float = 0.001,
) -> float:
    """Suggest a match threshold τ from the score distribution alone (no
    labels): the center of the deepest density valley between the highest
    score mode (matches) and the dominant low mode (non-matches).

    min_mode_frac guards the match-mode detection against isolated noise
    bins: a local maximum only counts as a mode if it carries at least
    max(3, min_mode_frac·total) rows. Falls back to 0.5 when the
    distribution has no two modes (all-match or all-non-match candidate
    sets have no gap to find — callers should treat 0.5 as 'undecidable').
    """
    h = score_histogram(scored, score_col=score_col, bins=bins).astype(np.float64)
    total = h.sum()
    if total == 0:
        return 0.5
    if smooth_w > 1:
        k = np.ones(smooth_w) / smooth_w
        hs = np.convolve(h, k, mode="same")
    else:
        hs = h
    floor_mass = max(3.0, min_mode_frac * total)
    # local maxima, boundary bins included (sigmoid scores pile up at the
    # 0 and 1 edges, which are genuine modes)
    left = np.r_[-np.inf, hs[:-1]]
    right = np.r_[hs[1:], -np.inf]
    is_max = (hs >= left) & (hs >= right) & (hs >= floor_mass)
    maxima = np.where(is_max)[0]
    if len(maxima) < 2:
        return 0.5
    # candidate match modes, highest score first; a candidate only counts
    # when the valley between it and the dominant lower mode is a REAL gap
    # (depth ≤ 10% of the smaller peak, separation ≥ bins/16) — otherwise a
    # unimodal distribution's tail bumps would masquerade as a match mode
    for mode_hi in maxima[::-1]:
        if mode_hi == 0:
            break
        mode_lo = int(np.argmax(hs[:mode_hi]))    # dominant lower mode
        if mode_hi - mode_lo < max(2, bins // 16):
            continue
        seg = hs[mode_lo : mode_hi + 1]
        m = seg.min()
        if m > 0.1 * min(hs[mode_lo], hs[mode_hi]):
            continue
        idxs = np.where(seg == m)[0] + mode_lo
        mid = (idxs[0] + idxs[-1]) / 2.0          # center of a flat-bottom gap
        return float((mid + 0.5) / bins)
    return 0.5
