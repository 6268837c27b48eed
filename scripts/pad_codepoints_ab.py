"""Micro A/B: vectorized _pad_codepoints (one batch-wide encode + scatter)
vs the r4 per-string loop (VERDICT r4 item 7). Pure numpy — no Spark.
Usage: python scripts/pad_codepoints_ab.py  → one line per length regime.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from record_matching_spark.operators.scoring import _pad_codepoints  # noqa: E402


def pad_loop(strs):
    """The pre-r5 implementation, kept verbatim as the baseline arm."""
    n = len(strs)
    lens = np.fromiter((len(s) for s in strs), dtype=np.int64, count=n)
    L = int(lens.max()) if n and lens.size else 0
    M = np.zeros((n, max(L, 1)), dtype=np.uint32)
    for i, s in enumerate(strs):
        if s:
            M[i, : len(s)] = np.frombuffer(s.encode("utf-32-le"), dtype=np.uint32)
    return M, lens


def best_of(fn, strs, reps=5):
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn(strs)
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    rng = np.random.RandomState(3)
    n = 20_000
    # 300 sits past _PAD_MASK_MAX_L=192, so _pad_codepoints dispatches to
    # the loop there and the A/B reads ~1.0x — the masked arm measured
    # 0.74-0.77x at 300-400 before the dispatch was added.
    for L in (30, 120, 150, 300):
        strs = [
            "".join(chr(97 + c) for c in rng.randint(0, 26, size=L))
            for _ in range(n)
        ]
        Mv, lv = _pad_codepoints(strs)
        Ml, ll = pad_loop(strs)
        assert (Mv == Ml).all() and (lv == ll).all(), "outputs diverge"
        tv = best_of(_pad_codepoints, strs)
        tl = best_of(pad_loop, strs)
        print(
            f"len~{L}: loop {tl*1e3:7.1f} ms  vectorized {tv*1e3:7.1f} ms  "
            f"speedup {tl/tv:4.2f}x  (n={n}, outputs identical)"
        )


if __name__ == "__main__":
    main()
