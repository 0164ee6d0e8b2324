"""cv::resize INTER_LINEAR (8u) bit-exactness at ARBITRARY ratios.

The CCC working resize (convolutional_color_constancy.cpp:95) downsamples
any camera size to 360x270; non-Alphasense cameras produce non-integer
ratios. ops/resize.py replicates the classic fixed-point path exactly:
float-narrowed coordinates, independently cvRound-quantized 11-bit
coefficient pairs, the truncating 8u vertical combine, the x-axis border
coefficient override, and the y-axis's clamp-pointers-keep-weights
asymmetry (see _tables_y). This sweep pins all of it against cv2.
"""

import numpy as np
import cv2
import pytest

from raw_image_pipeline_tpu.ops.resize import resize_linear_u8

CASES = [
    # (src_h, src_w, dst_h, dst_w)
    (540, 720, 270, 360),     # Alphasense 0.4MP: exact 2x (cv switches to
                              # INTER_AREA for 2x — formulas coincide)
    (1080, 1440, 270, 360),   # Alphasense 1.6MP: exact 4x
    (1080, 1920, 270, 360),   # 1080p: 4x / 16:3
    (480, 640, 270, 360),     # VGA: non-integer both axes
    (537, 719, 270, 360),     # odd non-integer
    (269, 359, 270, 360),     # near-1 upsample (negative-fy border rows)
    (271, 361, 270, 360),     # near-1 downsample
    (100, 200, 270, 360),     # strong upsample
    (3, 5, 270, 360),         # degenerate tiny source
    (540, 1440, 270, 360),    # 2x one axis, 4x the other (no AREA switch)
    (97, 131, 53, 71),        # odd everything
    (270, 360, 270, 360),     # identity
]


@pytest.mark.parametrize("sh,sw,dh,dw", CASES)
def test_resize_bit_exact_vs_cv2(sh, sw, dh, dw):
    rng = np.random.default_rng(sh * 1000 + sw)
    img = rng.integers(0, 256, (sh, sw, 3), np.uint8)
    ours = np.asarray(resize_linear_u8(img, dh, dw))
    ref = cv2.resize(img, (dw, dh), interpolation=cv2.INTER_LINEAR)
    np.testing.assert_array_equal(ours, ref)


def test_resize_batched_consistency():
    rng = np.random.default_rng(1)
    imgs = rng.integers(0, 256, (3, 123, 217, 3), np.uint8)
    batch = np.asarray(resize_linear_u8(imgs, 270, 360))
    for i in range(3):
        solo = np.asarray(resize_linear_u8(imgs[i], 270, 360))
        np.testing.assert_array_equal(batch[i], solo)


def test_periodic_structure_detection():
    """The reshape/static-slice fast path must engage at the production
    sizes (zero gathers in the CCC working resize) and decline shapes whose
    tap tables break the pattern (upsamples with clamped borders)."""
    from raw_image_pipeline_tpu.ops.resize import (
        _periodic_structure, _tables_x, _tables_y,
    )

    for src, dst, p, q in [(1920, 360, 16, 3), (1080, 270, 4, 1),
                           (1440, 360, 4, 1), (720, 360, 2, 1),
                           (540, 270, 2, 1)]:
        got = _periodic_structure(src, dst, *_tables_x(src, dst)[:2])
        assert got is not None and (got[0], got[1]) == (p, q), (src, dst, got)
        sy, sy2, _, _ = _tables_y(src, dst)
        assert _periodic_structure(src, dst, sy, sy2) is not None

    # upsample: clamped borders break the pattern -> fallback path
    sy, sy2, _, _ = _tables_y(100, 270)
    assert _periodic_structure(100, 270, sy, sy2) is None


def test_plane_form_matches_packed():
    """resize_linear_u8_plane must equal the packed form bit-for-bit on
    periodic downscales (incl. qy>1 classes), upsamples and non-periodic
    fallback shapes, with and without leading batch dims."""
    import jax.numpy as jnp

    from raw_image_pipeline_tpu.ops.resize import (
        resize_linear_u8,
        resize_linear_u8_plane,
    )

    rng = np.random.default_rng(23)
    cases = [
        ((1080, 1920), (270, 360)),   # the CCC working resize (qx=3, qy=1)
        ((100, 160), (40, 64)),       # qy=2, qx=2
        ((540, 720), (270, 360)),     # p=2 halving
        ((90, 120), (270, 360)),      # upsample -> fallback
        ((271, 363), (70, 60)),       # non-periodic borders -> fallback
    ]
    for (sh, sw), (dh, dw) in cases:
        img = rng.integers(0, 256, (2, sh, sw), np.uint8)
        ref = np.asarray(resize_linear_u8(img[..., None], dh, dw))[..., 0]
        got = np.asarray(resize_linear_u8_plane(jnp.asarray(img), dh, dw))
        np.testing.assert_array_equal(got, ref, err_msg=f"{(sh,sw)}->{(dh,dw)}")
        # no batch dim
        got1 = np.asarray(resize_linear_u8_plane(jnp.asarray(img[0]), dh, dw))
        np.testing.assert_array_equal(got1, ref[0])
