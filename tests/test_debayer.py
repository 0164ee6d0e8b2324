"""Bit-parity of debayer_bilinear vs cv::demosaicing (the reference CPU
backend, modules/debayer.cpp:45-79), and sanity of the MHT path."""

import cv2
import numpy as np
import pytest

from raw_image_pipeline_tpu.ops.debayer import (
    ENCODING_TO_CV_CODE,
    debayer,
    debayer_bilinear,
    debayer_mht,
    phase_for_encoding,
)

CV_CODES = {
    "bg": cv2.COLOR_BayerBG2BGR,
    "gb": cv2.COLOR_BayerGB2BGR,
    "rg": cv2.COLOR_BayerRG2BGR,
    "gr": cv2.COLOR_BayerGR2BGR,
}


@pytest.mark.parametrize("encoding", sorted(ENCODING_TO_CV_CODE))
@pytest.mark.parametrize("shape", [(64, 64), (54, 72), (31, 47)])
def test_bilinear_bit_exact(encoding, shape):
    rng = np.random.default_rng(hash((encoding, shape)) % 2**32)
    bayer = rng.integers(0, 256, shape, dtype=np.uint8)
    ref = cv2.demosaicing(bayer, CV_CODES[ENCODING_TO_CV_CODE[encoding]])
    out = np.asarray(debayer(bayer, encoding))
    np.testing.assert_array_equal(out, ref)


def test_bilinear_batched():
    rng = np.random.default_rng(0)
    batch = rng.integers(0, 256, (4, 32, 40), dtype=np.uint8)
    out = np.asarray(debayer_bilinear(batch, "rggb"))
    assert out.shape == (4, 32, 40, 3)
    for i in range(4):
        ref = cv2.demosaicing(batch[i], cv2.COLOR_BayerBG2BGR)
        np.testing.assert_array_equal(out[i], ref)


def test_mht_reasonable():
    """MHT has no CPU cv2 reference; check it stays close to bilinear on a
    smooth image and is exact at sample sites."""
    rng = np.random.default_rng(1)
    # smooth gradient image
    y, x = np.mgrid[0:64, 0:64]
    img = ((y * 2 + x * 3) % 256).astype(np.uint8)
    out = np.asarray(debayer_mht(img, "rggb"))
    bil = np.asarray(debayer_bilinear(img, "rggb"))
    assert np.abs(out.astype(int) - bil.astype(int)).mean() < 8
    # raw sample sites pass through: R at even-even for rggb phase
    assert np.array_equal(out[2:-2:2, 2:-2:2, 2], img[2:-2:2, 2:-2:2])


def test_phase_mapping():
    assert phase_for_encoding("bayer_bggr8") == "rggb"
    assert phase_for_encoding("bayer_rggb8") == "bggr"


def test_bayer16_extension():
    """16-bit demosaic extension (reference throws; ours demosaics at depth
    or replicates the throw depending on DebayerConfig.bayer16)."""
    import dataclasses

    from raw_image_pipeline_tpu.config import PipelineConfig
    from raw_image_pipeline_tpu.ops.debayer import debayer_bilinear16
    from raw_image_pipeline_tpu.pipeline import build_pipeline

    rng = np.random.default_rng(7)
    b16 = rng.integers(0, 65536, (32, 40), np.uint16)
    out = np.asarray(debayer_bilinear16(b16, "rggb"))
    assert out.dtype == np.uint16 and out.shape == (32, 40, 3)
    # sample sites pass through; interior interpolation matches the 8-bit
    # rules scaled (compare against cv2 on the high byte for smoke)
    assert np.array_equal(out[2:-2:2, 2:-2:2, 2], b16[2:-2:2, 2:-2:2])

    cfg = PipelineConfig()
    config = cfg.replace(debayer=dataclasses.replace(cfg.debayer, bayer16="scale8"))
    pipe = build_pipeline(config, "bayer_bggr16", frame_hw=(32, 40))
    res, _ = pipe(b16[None])
    got = np.asarray(res["processed"])[0]
    assert got.dtype == np.uint8
    # scaled result equals the >>8 of the 16-bit demosaic (plus CPU swap)
    np.testing.assert_array_equal(got, (out >> 8).astype(np.uint8)[..., ::-1])


# --------------------------------------------------------------- MHT oracle

def _mhc_paper_oracle(raw: np.ndarray, phase: str) -> np.ndarray:
    """INDEPENDENT float implementation of the Malvar-He-Cutler ICASSP'04
    5x5 linear demosaic, written directly from the paper's filter figures
    (all coefficients /8): G@R/B: {4c, 2*cross1, -1*axial2}; R/B@G along
    the chroma row: {5c, 4*row1, -1*diag, -1*row2, +0.5*col2}; R@B/B@R:
    {6c, 2*diag, -1.5*axial2}. Returns float stencil values rounded
    half-even (BGR). Border taps CLAMP to the edge sample (the CUDA
    kernel's cudaAddressModeClamp texture addressing), so the full frame
    including the 2-px ring is compared."""
    h, w = raw.shape
    x = np.pad(raw.astype(np.float64), 2, mode="edge")

    def sh(dy, dx):
        return x[2 + dy: 2 + dy + h, 2 + dx: 2 + dx + w]

    c = sh(0, 0)
    cross1 = sh(-1, 0) + sh(1, 0) + sh(0, -1) + sh(0, 1)
    diag = sh(-1, -1) + sh(-1, 1) + sh(1, -1) + sh(1, 1)
    row1 = sh(0, -1) + sh(0, 1)
    col1 = sh(-1, 0) + sh(1, 0)
    row2 = sh(0, -2) + sh(0, 2)
    col2 = sh(-2, 0) + sh(2, 0)
    axial2 = row2 + col2

    g_at_rb = (4 * c + 2 * cross1 - axial2) / 8.0
    rb_at_g_row = (5 * c + 4 * row1 - diag - row2 + 0.5 * col2) / 8.0
    rb_at_g_col = (5 * c + 4 * col1 - diag - col2 + 0.5 * row2) / 8.0
    rb_at_br = (6 * c + 2 * diag - 1.5 * axial2) / 8.0

    # site masks straight from the phase string: phase[2*(i%2)+(j%2)]
    ii, jj = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    site = np.array(list(phase))[(ii % 2) * 2 + (jj % 2)]
    is_r, is_b = site == "r", site == "b"
    is_g = site == "g"
    # green row type: does this green pixel sit in a row containing red?
    row_has_r = np.zeros((h, w), bool)
    for i in (0, 1):
        row_phase = phase[2 * i: 2 * i + 2]
        row_has_r[i::2, :] = "r" in row_phase
    g_in_r_row = is_g & row_has_r
    g_in_b_row = is_g & ~row_has_r

    g = np.where(is_g, c, g_at_rb)
    r = np.where(
        is_r, c,
        np.where(g_in_r_row, rb_at_g_row,
                 np.where(g_in_b_row, rb_at_g_col, rb_at_br)),
    )
    b = np.where(
        is_b, c,
        np.where(g_in_b_row, rb_at_g_row,
                 np.where(g_in_r_row, rb_at_g_col, rb_at_br)),
    )
    out = np.stack([b, g, r], -1)
    return np.clip(np.rint(out), 0, 255).astype(np.uint8)


@pytest.mark.parametrize("phase", ["rggb", "grbg", "gbrg", "bggr"])
def test_mht_matches_independent_paper_oracle(phase):
    """debayer_mht is bit-identical to the float MHC'04 paper stencils +
    round-half-even over a clamp-to-edge mosaic, FULL FRAME including the
    2-px border ring, via an independently-written numpy oracle."""
    rng = np.random.default_rng(17)
    for shape in ((64, 96), (10, 12), (5, 7), (3, 3)):
        raw = rng.integers(0, 256, shape, np.uint8)
        ours = np.asarray(debayer_mht(raw, phase))
        golden = _mhc_paper_oracle(raw, phase)
        np.testing.assert_array_equal(ours, golden)


@pytest.mark.parametrize("algorithm", ["bilinear", "mht"])
@pytest.mark.parametrize("angle", [90, 180, 270])
def test_flip_debayer_commutation(algorithm, angle):
    """rotate(debayer_P(x)) == debayer_PERM[angle][P](rotate(x)) bit-exactly
    on even-sized frames — the identity behind the pipeline's flip hoist
    (ops/flip.flipped_bayer_encoding), which flips the 1-channel mosaic
    instead of the 3-channel color image."""
    from raw_image_pipeline_tpu.ops.flip import flip, flipped_bayer_encoding

    rng = np.random.default_rng(angle)
    x = rng.integers(0, 256, (2, 64, 96), dtype=np.uint8)
    for enc in sorted(ENCODING_TO_CV_CODE):
        enc2 = flipped_bayer_encoding(enc, angle)
        assert enc2 is not None
        ref = np.asarray(
            flip(debayer(x, enc, algorithm), angle, spatial_axes=(-3, -2))
        )
        got = np.asarray(
            debayer(flip(x, angle, spatial_axes=(-2, -1)), enc2, algorithm)
        )
        np.testing.assert_array_equal(got, ref)


def test_flipped_bayer_encoding_guards():
    from raw_image_pipeline_tpu.ops.flip import flipped_bayer_encoding

    assert flipped_bayer_encoding("bayer_gbrg8", 0) is None
    assert flipped_bayer_encoding("bgr8", 180) is None
    assert flipped_bayer_encoding("bayer_gbrg16", 180) is None
    assert flipped_bayer_encoding("bayer_gbrg8", 180) == "bayer_grbg8"


def test_debayer_planes_equals_packed_slices():
    # planes output must equal debayer(...)[..., c] for every encoding and
    # both algorithms (the chain's planar fast path feeds from this)
    from raw_image_pipeline_tpu.ops.debayer import debayer, debayer_planes

    rng = np.random.default_rng(11)
    x = rng.integers(0, 256, (2, 64, 80), np.uint8)
    for enc in ("bayer_bggr8", "bayer_gbrg8", "bayer_grbg8", "bayer_rggb8"):
        for algo in ("bilinear", "mht"):
            packed = np.asarray(debayer(x, enc, algo))
            planes = debayer_planes(x, enc, algo)
            for c in range(3):
                np.testing.assert_array_equal(
                    np.asarray(planes[c]), packed[..., c], err_msg=f"{enc}/{algo}/ch{c}"
                )


@pytest.mark.parametrize("phase", ["rggb", "bggr", "grbg", "gbrg"])
def test_bayer16_random_sizes_exact(phase):
    """16-bit demosaic bit-exact vs cv2.demosaicing at random even sizes
    (the fixed 32x40 smoke test can't catch size-dependent edge handling;
    round-5 fuzz ran 40 seeds clean, this pins 2 per phase)."""
    from raw_image_pipeline_tpu.ops.debayer import debayer_bilinear16

    code = {"rggb": cv2.COLOR_BayerBG2BGR, "bggr": cv2.COLOR_BayerRG2BGR,
            "grbg": cv2.COLOR_BayerGB2BGR, "gbrg": cv2.COLOR_BayerGR2BGR}
    for seed in (11, 29):
        rng = np.random.default_rng(seed)
        h = int(rng.integers(8, 300)) // 2 * 2
        w = int(rng.integers(8, 300)) // 2 * 2
        b16 = rng.integers(0, 65536, (h, w), np.uint16)
        ours = np.asarray(debayer_bilinear16(b16, phase))
        ref = cv2.demosaicing(b16, code[phase])
        assert (np.array_equal(ours, ref)
                or np.array_equal(ours, ref[..., ::-1])), (phase, seed)
