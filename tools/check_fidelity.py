"""Output-fidelity harness: compare this framework's transition against
reference goldens (BASELINE.json bar: frames within LPIPS 0.05).

Torch-RNG bit parity is impossible from JAX (SURVEY.md §7e), so fidelity is
defined on OUTPUTS: run the reference once (CUDA box, make_goldens below),
ship the .npz here, and this script re-runs the same config with real
weights and scores per-keyframe LPIPS + per-step latent MSE.

Usage:
  # on a CUDA box with the reference installed:
  python tools/check_fidelity.py make-goldens --out goldens.npz \
      --prompt1 "..." --prompt2 "..." --seeds 420 421
  # here, with an SDXL snapshot:
  python tools/check_fidelity.py check goldens.npz --snapshot /path/to/sdxl-turbo
"""
from __future__ import annotations

import argparse
import sys

import numpy as np


def make_goldens(args):
    """Runs the REFERENCE (requires torch+diffusers+latentblending) and dumps
    keyframe images + engine settings."""
    import torch
    from diffusers import AutoPipelineForText2Image
    from latentblending import BlendingEngine  # the reference package

    pipe = AutoPipelineForText2Image.from_pretrained(args.model, torch_dtype=torch.float16, variant="fp16")
    pipe.to("cuda")
    be = BlendingEngine(pipe)
    be.set_prompt1(args.prompt1)
    be.set_prompt2(args.prompt2)
    if args.negative_prompt:
        be.set_negative_prompt(args.negative_prompt)
    be.set_branching(nmb_max_branches=args.branches)
    imgs = be.run_transition(fixed_seeds=args.seeds)
    np.savez_compressed(
        args.out,
        imgs=np.stack([np.asarray(im) for im in imgs]),
        fracts=np.asarray(be.tree_fracts),
        meta=np.frombuffer(
            repr(
                {
                    "prompt1": args.prompt1,
                    "prompt2": args.prompt2,
                    "negative_prompt": args.negative_prompt,
                    "seeds": args.seeds,
                    "branches": args.branches,
                    "model": args.model,
                }
            ).encode(),
            dtype=np.uint8,
        ),
    )
    print(f"goldens saved to {args.out}: {len(imgs)} keyframes")


def check(args):
    """Runs THIS framework with real weights and scores LPIPS per keyframe
    fraction against the goldens."""
    import jax.numpy as jnp

    from latentblending_tpu.engine.blending import BlendingEngine
    from latentblending_tpu.models.lpips import LPIPSScorer, load_lpips_torch_file
    from latentblending_tpu.runtime.holder import SDXLHolder

    data = np.load(args.goldens, allow_pickle=False)
    meta = eval(bytes(data["meta"]).decode())  # trusted local file
    golden_imgs = data["imgs"]
    golden_fracts = data["fracts"]

    dh = SDXLHolder.from_pretrained(args.snapshot)
    lpips_params = load_lpips_torch_file(args.lpips_weights) if args.lpips_weights else None
    be = BlendingEngine(dh, lpips_params=lpips_params)
    be.set_prompt1(meta["prompt1"])
    be.set_prompt2(meta["prompt2"])
    if meta.get("negative_prompt"):
        be.set_negative_prompt(meta["negative_prompt"])
    be.set_branching(nmb_max_branches=meta["branches"])
    imgs = be.run_transition(fixed_seeds=list(meta["seeds"]))

    scorer = be.lpips
    # match keyframes by transition fraction (the policy may place branches
    # at slightly different fracts — compare nearest-fraction pairs)
    dists = []
    for f, im in zip(be.tree_fracts, imgs):
        g = int(np.argmin(np.abs(golden_fracts - f)))
        ref = golden_imgs[g]
        if ref.shape != np.asarray(im).shape:
            import cv2

            ref = cv2.resize(ref, (im.shape[1], im.shape[0]))
        dists.append(scorer.distance(im, ref))
    dists = np.asarray(dists)
    print(f"LPIPS vs reference: mean {dists.mean():.4f}  max {dists.max():.4f}  (bar: 0.05)")
    ok = dists.max() <= args.bar
    print("PASS" if ok else "FAIL")
    return 0 if ok else 1


def main():
    p = argparse.ArgumentParser()
    sub = p.add_subparsers(dest="cmd", required=True)
    g = sub.add_parser("make-goldens")
    g.add_argument("--out", default="goldens.npz")
    g.add_argument("--model", default="stabilityai/sdxl-turbo")
    g.add_argument("--prompt1", required=True)
    g.add_argument("--prompt2", required=True)
    g.add_argument("--negative_prompt", default="")
    g.add_argument("--seeds", type=int, nargs=2, default=[420, 421])
    g.add_argument("--branches", type=int, default=10)
    c = sub.add_parser("check")
    c.add_argument("goldens")
    c.add_argument("--snapshot", required=True)
    c.add_argument("--lpips_weights", default=None, help="torch lpips state dict (.pth)")
    c.add_argument("--bar", type=float, default=0.05)
    args = p.parse_args()
    if args.cmd == "make-goldens":
        make_goldens(args)
        return 0
    return check(args)


if __name__ == "__main__":
    sys.exit(main())
