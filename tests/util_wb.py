"""Numpy reference for the xphoto WB semantics (oracle-verified; see
tests/test_wb_oracle.py and ops/white_balance.py docstring)."""

import numpy as np


def xphoto_grey_world(img: np.ndarray, thr: float) -> np.ndarray:
    b, g, r = [img[..., c].astype(np.int64) for c in range(3)]
    mx = np.maximum(np.maximum(b, g), r)
    mn = np.minimum(np.minimum(b, g), r)
    t255 = int(np.rint(np.float32(thr) * 255))
    if t255 <= 257:
        m = (mx - mn) * 255 <= t255 * mx
    else:
        # thr > ~1.008: 16-px SIMD body wraps t255*mx in u16, scalar
        # tail doesn't (oracle-probed; see ops/white_balance.py)
        n = mx.size
        flat_rhs = np.where(np.arange(n) < (n // 16) * 16,
                            (t255 * mx.ravel()) % 65536, t255 * mx.ravel())
        m = ((mx - mn).ravel() * 255 <= flat_rhs).reshape(mx.shape)
    sb, sg, sr = int(b[m].sum()), int(g[m].sum()), int(r[m].sum())
    # smin over POSITIVE sums only; zero-sum channels get gain 0 (the
    # library blacks them out — oracle-probed round 5, e.g. an empty
    # saturation mask blacks the whole frame)
    pos = [s for s in (sb, sg, sr) if s > 0]
    smin = min(pos) if pos else 0
    gi = [
        int(np.rint(np.float32(smin) / np.float32(s) * np.float32(256)))
        if s > 0 else 0
        for s in (sb, sg, sr)
    ]
    out = np.stack(
        [(img[..., c].astype(np.int64) * gi[c]) >> 8 for c in range(3)], -1
    )
    return np.clip(out, 0, 255).astype(np.uint8)


def xphoto_simple(img: np.ndarray, p: float) -> np.ndarray:
    """Bit-exact: convertTo coefficients computed in double, cast to f32,
    applied as a single-rounded fma + cvRound (see ops/white_balance.py)."""
    out = np.empty_like(img)
    total = img.shape[0] * img.shape[1]
    target = np.float32(p) * np.float32(total) / np.float32(100)
    for c in range(3):
        v = img[..., c]
        hist = np.bincount(v.ravel(), minlength=256)
        p1 = int((np.cumsum(hist).astype(np.float32) < target).sum())
        p2 = 255 - int((np.cumsum(hist[::-1]).astype(np.float32) < target).sum())
        span = max(p2 + 1 - p1, 1)
        alpha64 = 255.0 / span
        alpha32 = np.float32(alpha64)
        beta32 = np.float32(-p1 * alpha64)
        # single-rounded fma via float64 then f32 cast
        x = (v.astype(np.float64) * np.float64(alpha32)
             + np.float64(beta32)).astype(np.float32)
        out[..., c] = np.clip(np.rint(x), 0, 255).astype(np.uint8)
    return out
