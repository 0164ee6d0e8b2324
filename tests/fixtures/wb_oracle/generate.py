"""Regenerate xphoto golden fixtures with the native oracle
(native/oracle/xphoto_oracle.cpp — build with `make -C native/oracle`).
Synthetic inputs are committed too so goldens are reproducible anywhere."""
import subprocess, sys, os
import numpy as np
import cv2

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.join(HERE, "..", "..", "..")
ORACLE = os.path.join(ROOT, "native", "oracle", "xphoto_oracle")
PCA_ORACLE = os.path.join(ROOT, "native", "oracle", "pca_oracle")

def run(src, dst, method, arg):
    subprocess.run([ORACLE, src, dst, method, str(arg)], check=True)

def main():
    rng = np.random.default_rng(7)
    noise = rng.integers(0, 256, (120, 160, 3), np.uint8)
    cv2.imwrite(os.path.join(HERE, "noise.png"), noise)
    gauss = rng.normal(120, 50, (96, 144, 3)).clip(0, 255).astype(np.uint8)
    cv2.imwrite(os.path.join(HERE, "gauss.png"), gauss)
    inputs = {
        "alphasense": os.path.join(ROOT, "tests", "fixtures", "alphasense.png"),
        "gehler": os.path.join(ROOT, "tests", "fixtures", "gehler_shi.png"),
        "noise": os.path.join(HERE, "noise.png"),
        "gauss": os.path.join(HERE, "gauss.png"),
    }
    for name, path in inputs.items():
        for thr in (0.5, 0.8, 0.95):
            run(path, os.path.join(HERE, f"{name}_grey_{thr}.png"), "grey", thr)
        for p in (2.0, 10.0, 20.0, 35.0):
            run(path, os.path.join(HERE, f"{name}_simple_{p}.png"), "simple", p)
        run(path, os.path.join(HERE, f"{name}_learned_0.8.png"), "learned", 0.8)
        # reference's custom PCA method (native/oracle/pca_oracle.cpp)
        subprocess.run(
            [PCA_ORACLE, path, os.path.join(HERE, f"{name}_pca.png")],
            check=True,
        )
    # extra PCA stress inputs: skewed distributions exercise the solve's
    # coefficient dynamic range
    lo = rng.integers(0, 30, (64, 96, 3)).astype(np.uint8)
    cv2.imwrite(os.path.join(HERE, "pca_lo.png"), lo)
    hi = rng.integers(200, 256, (57, 83, 3)).astype(np.uint8)
    cv2.imwrite(os.path.join(HERE, "pca_hi.png"), hi)
    for name in ("pca_lo", "pca_hi"):
        subprocess.run(
            [PCA_ORACLE, os.path.join(HERE, f"{name}.png"),
             os.path.join(HERE, f"{name}_pca.png")],
            check=True,
        )
    print("done")

if __name__ == "__main__":
    main()
