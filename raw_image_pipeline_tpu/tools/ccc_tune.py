"""Interactive-style CCC white-balance tuning tool.

Role of the reference's standalone debug node
(raw_image_pipeline_white_balance_node.cpp:23-118 with
cfg/RawImagePipelineWhiteBalance.cfg): load an image and an FFCC model, run
the white balance with adjustable `bright_thr`, `dark_thr`, `uv0`, and —
like the node's dynamic_reconfigure `Lu_offset`/`Lv_offset` debug mode
(setDebugUVOffset, ccc.cpp:454-459) — optionally bypass the argmax and
drive the gains from explicit offsets. Writes the original and balanced
images side by side and prints the illuminant estimate.

Example:
    python -m raw_image_pipeline_tpu.tools.ccc_tune \
        -i tests/fixtures/alphasense.png --bright-thr 0.9 --dark-thr 0.1
"""

from __future__ import annotations

import argparse

import cv2
import numpy as np

from raw_image_pipeline_tpu.config import DEFAULT_CCC_MODEL_PATH
from raw_image_pipeline_tpu.models.ccc_model import load_ccc_model
from raw_image_pipeline_tpu.ops import ccc


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("-i", "--image", required=True)
    ap.add_argument("-m", "--model", default=DEFAULT_CCC_MODEL_PATH)
    ap.add_argument("-o", "--output", default="ccc_tune_output.png")
    ap.add_argument("--bright-thr", type=float, default=0.9)
    ap.add_argument("--dark-thr", type=float, default=0.1)
    ap.add_argument("--uv0", type=float, default=ccc.UV0)
    ap.add_argument("--lu-offset", type=float, default=None,
                    help="debug mode: drive gains from this Lu offset (with --lv-offset)")
    ap.add_argument("--lv-offset", type=float, default=None)
    args = ap.parse_args(argv)

    img = cv2.imread(args.image)
    if img is None:
        raise SystemExit(f"could not read {args.image}")
    model = load_ccc_model(args.model)

    if args.lu_offset is not None and args.lv_offset is not None:
        gains = np.asarray(ccc.gains_from_offsets(args.lu_offset, args.lv_offset, args.uv0))
        out = np.asarray(ccc.apply_gains(img[None], gains[None]))[0]
        print(f"debug offsets Lu={args.lu_offset} Lv={args.lv_offset} uv0={args.uv0}")
    else:
        import jax.numpy as jnp

        small = ccc.resize_linear_u8(img[None], ccc.SMALL_H, ccc.SMALL_W)
        hist = ccc.log_chroma_histogram(small, args.bright_thr, args.dark_thr, args.uv0)
        resp = ccc.ccc_response(
            hist, jnp.asarray(model.filt_dft_re), jnp.asarray(model.filt_dft_im),
            jnp.asarray(model.bias),
        )
        uv = ccc.response_argmax(resp)
        gains = ccc.gains_from_uv(uv, args.uv0)
        out = np.asarray(ccc.apply_gains(img[None], gains))[0]
        x, y = np.asarray(uv)[0]
        print(f"uv_pos=({x}, {y})  Lu={x/64 + args.uv0:.4f}  Lv={y/64 + args.uv0:.4f}")
        gains = np.asarray(gains)[0]

    print(f"gains (B,G,R) = {np.asarray(gains).round(4)}")
    cv2.imwrite(args.output, np.concatenate([img, out], axis=1))
    print("wrote", args.output)


if __name__ == "__main__":
    main()
