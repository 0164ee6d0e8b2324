"""Smoke/demo driver (role of reference scripts/apply_pipeline.py:14-57).

Loads an image + the three config YAMLs, prints the dist/rect calibrations,
runs both `process` and `apply`, and writes the outputs as PNGs.
"""

from __future__ import annotations

import argparse
import os

import cv2

from raw_image_pipeline_tpu import RawImagePipeline
from raw_image_pipeline_tpu.config import (
    DEFAULT_CALIBRATION_PATH,
    DEFAULT_COLOR_CALIBRATION_PATH,
    DEFAULT_PARAMS_PATH,
)


def main(argv=None):
    from raw_image_pipeline_tpu.utils.compile_cache import (
        enable_compilation_cache,
    )

    enable_compilation_cache()
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("-i", "--image", default="tests/fixtures/alphasense.png")
    ap.add_argument("-e", "--encoding", default="bgr8")
    ap.add_argument("-p", "--params", default=DEFAULT_PARAMS_PATH)
    ap.add_argument("-c", "--calibration", default=DEFAULT_CALIBRATION_PATH)
    ap.add_argument("-cc", "--color-calibration", default=DEFAULT_COLOR_CALIBRATION_PATH)
    ap.add_argument("-o", "--output-dir", default=".")
    args = ap.parse_args(argv)

    img = cv2.imread(args.image, cv2.IMREAD_UNCHANGED)
    if img is None:
        raise SystemExit(f"could not read {args.image}")

    pipe = RawImagePipeline(False, args.params, args.calibration, args.color_calibration)

    print("Dist camera matrix:\n", pipe.get_dist_camera_matrix())
    print("Dist distortion:", pipe.get_dist_distortion_coefficients().ravel(),
          pipe.get_dist_distortion_model())
    print("Rect camera matrix:\n", pipe.get_rect_camera_matrix())
    print("Rect distortion:", pipe.get_rect_distortion_coefficients().ravel(),
          pipe.get_rect_distortion_model())

    out_process = pipe.process(img.copy(), args.encoding)
    img_apply = img.copy()
    pipe.apply(img_apply, args.encoding)

    os.makedirs(args.output_dir, exist_ok=True)
    p1 = os.path.join(args.output_dir, "output_process.png")
    p2 = os.path.join(args.output_dir, "output_apply.png")
    cv2.imwrite(p1, out_process)
    cv2.imwrite(p2, img_apply if img_apply.shape == out_process.shape else out_process)
    print("wrote", p1, "and", p2)


if __name__ == "__main__":
    main()
