"""Offline color-calibration tool: synthetic ArUco color-checker round trip."""

import os

import cv2
import numpy as np
import pytest

from raw_image_pipeline_tpu.tools.color_calibration import (
    CANVAS_H,
    CANVAS_W,
    find_color_calibration,
    get_color_centroids,
    main,
    patch_centers,
)


def synth_board(colors=None, seed=0):
    """Canvas-frame chart: 4 ArUco markers (ids 0-3) at the corners and a
    6x4 color patch grid."""
    rng = np.random.default_rng(seed)
    if colors is None:
        colors = rng.integers(40, 220, (24, 3))
    img = np.full((CANVAS_H + 120, CANVAS_W + 120, 3), 255, np.uint8)
    d = cv2.aruco.getPredefinedDictionary(cv2.aruco.DICT_4X4_50)
    msz = 50
    # marker centers must land on the canvas corners (0,0),(W,0),(W,H),(0,H)
    # after the 60px margin shift
    corners = [(60, 60), (60 + CANVAS_W, 60), (60 + CANVAS_W, 60 + CANVAS_H), (60, 60 + CANVAS_H)]
    for mid, (cx, cy) in enumerate(corners):
        m = cv2.aruco.generateImageMarker(d, mid, msz)
        img[cy - msz // 2: cy + msz // 2, cx - msz // 2: cx + msz // 2] = m[..., None]
    for (x, y), c in zip(patch_centers(), colors):
        x, y = int(x) + 60, int(y) + 60
        img[y - 15: y + 15, x - 15: x + 15] = c
    return img, colors


def test_centroid_extraction():
    img, colors = synth_board()
    cents = get_color_centroids(img)
    assert cents is not None and cents.shape == (24, 3)
    np.testing.assert_allclose(cents, colors, atol=2)


def test_solver_recovers_matrix():
    img, colors = synth_board()
    M_true = np.array([[1.2, 0.1, -0.05], [0.05, 0.9, 0.02], [-0.1, 0.05, 1.1]])
    distorted = np.clip(colors @ np.linalg.inv(M_true).T, 0, 255)
    M, bias = find_color_calibration(distorted, colors.astype(float), "linear")
    corrected = distorted @ M.T
    np.testing.assert_allclose(corrected, colors, atol=1.0)


def test_tool_cli_end_to_end(tmp_path):
    ref_img, colors = synth_board()
    # distorted capture of the same chart
    M_true = np.array([[0.8, 0.1, 0.0], [0.0, 1.1, 0.05], [0.05, 0.0, 1.2]])
    dist_colors = np.clip(colors @ M_true.T, 0, 255).astype(int)
    dist_img, _ = synth_board(colors=dist_colors)
    cv2.imwrite(str(tmp_path / "ref.png"), ref_img)
    cv2.imwrite(str(tmp_path / "shot.png"), dist_img)

    main(["-i", str(tmp_path / "shot.png"), "-r", str(tmp_path / "ref.png"),
          "-o", str(tmp_path), "-l", "soft_l1"])
    out_yaml = tmp_path / "color_calibration.yaml"
    assert out_yaml.exists()
    assert (tmp_path / "color_calibration_check.png").exists()

    from raw_image_pipeline_tpu.config import load_color_calibration

    cc = load_color_calibration(str(out_yaml))
    # applying the solved matrix to the distorted colors recovers the chart
    rec = dist_colors @ cc.matrix_np().T + cc.bias_np()
    err = np.abs(rec - colors)
    assert err.mean() < 4, err.mean()
