"""Pallas debayer kernel parity (interpret mode on CPU; the compiled
kernel runs on TPU and is covered by the bench/verify drives there)."""

import numpy as np
import pytest
from jax.experimental import pallas as pl

from raw_image_pipeline_tpu.ops.debayer import debayer_bilinear


@pytest.fixture()
def interpret_pallas(monkeypatch):
    orig = pl.pallas_call
    monkeypatch.setattr(
        pl, "pallas_call", lambda *a, **k: orig(*a, **{**k, "interpret": True})
    )


@pytest.mark.parametrize("phase", ["rggb", "grbg", "gbrg", "bggr"])
def test_pallas_matches_xla_path(interpret_pallas, phase):
    # import after the monkeypatch so the kernel builds in interpret mode
    from raw_image_pipeline_tpu.ops.debayer_pallas import (
        debayer_bilinear_pallas_nhwc,
    )

    rng = np.random.default_rng(hash(phase) % 2**32)
    bay = rng.integers(0, 256, (2, 256, 40), np.uint8)
    ref = np.asarray(debayer_bilinear(bay, phase))
    got = np.asarray(debayer_bilinear_pallas_nhwc(bay, phase))
    np.testing.assert_array_equal(got, ref)


@pytest.mark.parametrize("h", [120, 72, 240])
def test_pallas_non_pow2_heights(interpret_pallas, h):
    """Heights whose row tile is not 128 (1080-family sizes)."""
    from raw_image_pipeline_tpu.ops.debayer_pallas import (
        debayer_bilinear_pallas_nhwc,
    )

    rng = np.random.default_rng(h)
    bay = rng.integers(0, 256, (1, h, 36), np.uint8)
    ref = np.asarray(debayer_bilinear(bay, "gbrg"))
    got = np.asarray(debayer_bilinear_pallas_nhwc(bay, "gbrg"))
    np.testing.assert_array_equal(got, ref)


def test_tile_rows_for():
    from raw_image_pipeline_tpu.ops.debayer_pallas import tile_rows_for

    assert tile_rows_for(1080) == 120
    assert tile_rows_for(1024) == 128
    assert tile_rows_for(270) is None  # no multiple-of-8 divisor
    assert tile_rows_for(1079) is None
    assert tile_rows_for(72) == 72


@pytest.mark.parametrize("phase", ["rggb", "grbg", "gbrg", "bggr"])
def test_mht_pallas_matches_xla_path(phase):
    """The banded-DMA MHT kernel must equal debayer_mht bit-for-bit,
    borders (clamp-stencil ring) included."""
    from raw_image_pipeline_tpu.ops.debayer import debayer_mht
    from raw_image_pipeline_tpu.ops.debayer_pallas import (
        debayer_mht_pallas_nhwc,
    )

    rng = np.random.default_rng(hash(phase) % 2**31)
    bay = rng.integers(0, 256, (2, 128, 44), np.uint8)
    ref = np.asarray(debayer_mht(bay, phase))
    got = np.asarray(debayer_mht_pallas_nhwc(bay, phase, interpret=True))
    np.testing.assert_array_equal(got, ref)


def test_mht_pallas_planes_and_routing(interpret_pallas):
    """debayer/debayer_planes route algorithm='mht_pallas' through the
    kernel, identical to the plain 'mht' XLA result."""
    from raw_image_pipeline_tpu.ops import debayer as D
    from raw_image_pipeline_tpu.ops import debayer_pallas as dp

    rng = np.random.default_rng(3)
    bay = rng.integers(0, 256, (2, 64, 44), np.uint8)
    ref = np.asarray(D.debayer(bay, "bayer_gbrg8", "mht"))
    got_packed = np.asarray(D.debayer(bay, "bayer_gbrg8", "mht_pallas"))
    np.testing.assert_array_equal(got_packed, ref)
    planes = D.debayer_planes(bay, "bayer_gbrg8", "mht_pallas")
    got = np.stack([np.asarray(p) for p in planes], axis=-1)
    np.testing.assert_array_equal(got, ref)
    # the direct interpret plumbing agrees too
    planes2 = dp.debayer_mht_pallas_planes(bay, "grbg", interpret=True)
    got2 = np.stack([np.asarray(p) for p in planes2], axis=-1)
    np.testing.assert_array_equal(got2, ref)


def test_mht_tile_rows_for():
    from raw_image_pipeline_tpu.ops.debayer_pallas import mht_tile_rows_for

    assert mht_tile_rows_for(1080) == 40
    assert mht_tile_rows_for(1024) == 64
    assert mht_tile_rows_for(270) is None


def test_pallas_vmap_folds_into_grid(interpret_pallas):
    """The custom_vmap rule (multicamera path) must match per-camera calls
    bit-for-bit."""
    import jax

    from raw_image_pipeline_tpu.ops.debayer_pallas import (
        debayer_bilinear_pallas_nhwc,
    )

    rng = np.random.default_rng(7)
    cams = rng.integers(0, 256, (3, 2, 64, 40), np.uint8)
    ref = np.stack(
        [np.asarray(debayer_bilinear_pallas_nhwc(c, "bggr")) for c in cams]
    )
    got = np.asarray(
        jax.vmap(lambda x: debayer_bilinear_pallas_nhwc(x, "bggr"))(cams)
    )
    np.testing.assert_array_equal(got, ref)
