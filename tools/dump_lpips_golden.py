"""Produce LPIPS golden data in a weights-enabled environment.

Run WHERE the torch `lpips` package (and torchvision AlexNet weights) are
installed — this repo's environment has neither, so goldens are produced
elsewhere and checked in:

    python tools/dump_lpips_golden.py --out tests/golden

Writes:
  - lpips_alex_goldens.json: distances of the lpips package
    (lpips.LPIPS(net='alex')) on deterministic synthetic image pairs
  - lpips_alex_state.npz: full state dict (backbone + lin layers, ~9 MB)
    so convert_lpips_state_dict can load real weights

tests/test_lpips_golden.py then asserts our JAX LPIPS reproduces the
distances through the converted weights (skips when files are absent).
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def synthetic_pairs(n_pairs: int = 6, hw: int = 64):
    """Deterministic uint8 RGB image pairs (seeded, no data files)."""
    rng = np.random.default_rng(1234)
    pairs = []
    for i in range(n_pairs):
        a = rng.integers(0, 256, (hw, hw, 3), dtype=np.uint8)
        if i % 3 == 0:
            b = a.copy()  # identical → distance 0
        elif i % 3 == 1:
            b = np.clip(a.astype(np.int16) + rng.integers(-20, 20, a.shape), 0, 255).astype(np.uint8)
        else:
            b = rng.integers(0, 256, (hw, hw, 3), dtype=np.uint8)
        pairs.append((a, b))
    return pairs


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="tests/golden")
    args = p.parse_args()
    import lpips  # requires the torch lpips package
    import torch

    os.makedirs(args.out, exist_ok=True)
    model = lpips.LPIPS(net="alex")
    model.eval()

    goldens = []
    for a, b in synthetic_pairs():
        ta = torch.from_numpy(a.transpose(2, 0, 1)[None]).float() / 255.0 * 2 - 1
        tb = torch.from_numpy(b.transpose(2, 0, 1)[None]).float() / 255.0 * 2 - 1
        with torch.no_grad():
            d = float(model(ta, tb).item())
        goldens.append(d)

    with open(os.path.join(args.out, "lpips_alex_goldens.json"), "w") as f:
        json.dump({"pairs": "synthetic_pairs(6, 64) seed 1234", "distances": goldens}, f, indent=2)
    np.savez(
        os.path.join(args.out, "lpips_alex_state.npz"),
        **{k: v.numpy() for k, v in model.state_dict().items()},
    )
    print("wrote goldens:", goldens)


if __name__ == "__main__":
    main()
