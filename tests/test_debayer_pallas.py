"""Pallas debayer kernel parity (interpret mode on CPU; the compiled
kernel runs on TPU and is covered by the bench/verify drives there)."""

import numpy as np
import pytest
from jax.experimental import pallas as pl

from raw_image_pipeline_tpu.ops.debayer import debayer_bilinear


@pytest.fixture()
def interpret_pallas(monkeypatch):
    orig = pl.pallas_call
    monkeypatch.setattr(pl, "pallas_call", lambda *a, **k: orig(*a, interpret=True, **k))


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
