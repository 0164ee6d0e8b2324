"""End-to-end parity for the BASELINE.json benchmark configs (2) and (4),
batched, against cv2-composed goldens. Config (1) is covered in
test_pipeline.py, (3) in test_ccc.py/test_pipeline.py, (5) in
test_multicamera.py + __graft_entry__.dryrun_multichip."""

import dataclasses

import cv2
import numpy as np
import pytest

from raw_image_pipeline_tpu.config import PipelineConfig
from raw_image_pipeline_tpu.pipeline import build_pipeline


@pytest.fixture(scope="module")
def bayer_batch():
    """Batch of distinct Bayer frames derived from the fixture."""
    img = cv2.imread("tests/fixtures/alphasense.png")
    variants = [img, img[::-1].copy(), img[:, ::-1].copy(), (img // 2 + 40).astype(np.uint8)]
    ch = {"g": 1, "b": 0, "r": 2}
    phase = "grbg"  # = encoding bayer_gbrg8
    out = []
    for v in variants:
        b = np.zeros(v.shape[:2], np.uint8)
        for k, (di, dj) in enumerate([(0, 0), (0, 1), (1, 0), (1, 1)]):
            b[di::2, dj::2] = v[di::2, dj::2, ch[phase[k]]]
        out.append(b)
    return np.stack(out)


def test_config2_debayer_flip_wb_batch(bayer_batch):
    """Config 2: debayer + flip + grey-world WB over a batch."""
    cfg = PipelineConfig()
    config = PipelineConfig(
        flip=dataclasses.replace(cfg.flip, enabled=True, angle=90),
        white_balance=dataclasses.replace(cfg.white_balance, enabled=True,
                                          method="grey_world",
                                          saturation_bright_thr=0.8),
    )
    pipe = build_pipeline(config, "bayer_gbrg8", frame_hw=bayer_batch.shape[1:])
    out, _ = pipe(bayer_batch)
    got = np.asarray(out["processed"])

    for i, bayer in enumerate(bayer_batch):
        img = cv2.demosaicing(bayer, cv2.COLOR_BayerGB2BGR)
        img = cv2.cvtColor(img, cv2.COLOR_RGB2BGR)
        img = cv2.flip(cv2.transpose(img), 1)
        # grey-world golden: exact xphoto semantics (oracle-verified;
        # tests/test_wb_oracle.py)
        from util_wb import xphoto_grey_world

        golden = xphoto_grey_world(img, 0.8)
        d = np.abs(got[i].astype(int) - golden.astype(int))
        assert d.max() == 0, d.max()


def test_config4_colorcal_vignetting_hsv_batch(bayer_batch):
    """Config 4: color calibration + vignetting + HSV enhancement, batched
    BGR input (bgr8 passthrough)."""
    imgs = np.stack([
        cv2.demosaicing(b, cv2.COLOR_BayerGB2BGR) for b in bayer_batch
    ])
    M = np.array([[1.3, 0.1, -0.1], [0.05, 1.1, -0.05], [-0.1, -0.1, 1.4]])
    bias = np.array([2.0, 0.0, -1.0])
    cfg = PipelineConfig()
    config = PipelineConfig(
        color_calibration=dataclasses.replace(
            cfg.color_calibration, enabled=True,
            matrix=tuple(M.ravel()), bias=tuple(bias),
        ),
        vignetting_correction=dataclasses.replace(
            cfg.vignetting_correction, enabled=True, scale=1.5, a2=1e-3, a4=1e-6
        ),
        color_enhancer=dataclasses.replace(
            cfg.color_enhancer, enabled=True, saturation_gain=1.2
        ),
    )
    pipe = build_pipeline(config, "bgr8", frame_hw=imgs.shape[1:3])
    out, _ = pipe(imgs)
    got = np.asarray(out["processed"])

    from raw_image_pipeline_tpu.ops.vignetting import build_vignetting_mask

    mask = build_vignetting_mask(imgs.shape[1], imgs.shape[2], 1.5, 1e-3, 1e-6)
    for i, img in enumerate(imgs):
        # bgr8 input passes through debayer untouched (debayer.cpp:75)
        flat = img.reshape(-1, 3).astype(np.float32)
        # cv2.gemm, not numpy matmul — numpy's fma-based sgemm differs from
        # cv::gemm's plain chain at ~1% of final u8 pixels (see
        # test_pointwise_ops.test_color_calibration_matches_reference_math)
        mixed = cv2.gemm(flat, M.T.astype(np.float32), 1.0, None, 0.0)
        img = np.clip(np.rint(mixed + bias.astype(np.float32)),
                      0, 255).astype(np.uint8).reshape(img.shape)
        lab = cv2.cvtColor(img, cv2.COLOR_BGR2Lab)
        L = lab[..., 0].astype(np.float32) * mask
        lab[..., 0] = np.clip(np.rint(L), 0, 255).astype(np.uint8)
        img = cv2.cvtColor(lab, cv2.COLOR_Lab2BGR)
        hsv = cv2.cvtColor(img, cv2.COLOR_BGR2HSV)
        hsv = cv2.multiply(hsv, (1.0, 1.2, 1.0, 0))
        golden = cv2.cvtColor(hsv, cv2.COLOR_HSV2BGR)
        # bit-exact since the round-5 SIMD/scalar HSV2BGR kernel mix
        np.testing.assert_array_equal(got[i], golden, err_msg=f"frame {i}")
