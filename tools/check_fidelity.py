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
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

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


def self_check(args):
    """Batched-policy drift check, runnable WITHOUT goldens or weights.

    The engine's one documented policy deviation (SURVEY §7.5) is level-wise
    batched placement vs the reference's one-at-a-time argmax. This runs the
    SAME engine twice — stem_batch=0 (batched rounds) vs stem_batch=1
    (exactly the reference's greedy policy) — and scores nearest-fraction
    keyframe pairs with the NLPD perceptual metric. Weight values don't
    change the *architecture* of the comparison, so this is meaningful
    evidence with random weights too (and exact with real ones)."""
    import jax.numpy as jnp

    from latentblending_tpu.engine.blending import BlendingEngine
    from latentblending_tpu.models.perceptual import NLPDScorer
    from latentblending_tpu.runtime.holder import SDXLHolder

    if args.snapshot:
        dh = SDXLHolder.from_pretrained(args.snapshot)
    else:
        dh = SDXLHolder.from_random(args.spec, dtype=jnp.bfloat16 if args.spec.startswith("sdxl") else jnp.float32)
    # this measures PLACEMENT-POLICY drift; under euler_ancestral the two
    # runs would also differ by per-call solver noise (batched = 1 call,
    # sequential = k calls) — default to the deterministic euler solver for
    # an apples-to-apples comparison. --scheduler dpmpp_2m (deterministic
    # too) bounds the COMPOSED fast config: both runs use the same solver,
    # isolating placement drift given it.
    scheduler = getattr(args, "scheduler", "euler")
    assert scheduler != "euler_ancestral", "ancestral noise confounds the policy comparison"
    dh.set_scheduler_type(scheduler)
    steps = getattr(args, "steps", None)

    def run(stem_batch, placement_policy="measured"):
        be = BlendingEngine(dh, stem_batch=stem_batch, similarity_metric="nlpd")
        be.placement_policy = placement_policy
        if steps:
            be.set_num_inference_steps(int(steps))
        be.set_prompt1(args.prompt1)
        be.set_prompt2(args.prompt2)
        if not dh.is_sdxl_turbo:
            be.set_branching(nmb_max_branches=args.branches)
        imgs = be.run_transition(fixed_seeds=[420, 421])
        return [np.asarray(im) for im in imgs], list(be.tree_fracts)

    policy = getattr(args, "policy", "batched")
    if policy == "predictive":
        imgs_b, fr_b = run(0, "predictive")
        label = "predictive-vs-reference-policy"
    else:
        imgs_b, fr_b = run(0)
        label = "batched-vs-reference-policy"
    imgs_s, fr_s = run(1)
    scorer = NLPDScorer()
    dists = []
    for f, im in zip(fr_b, imgs_b):
        g = int(np.argmin(np.abs(np.asarray(fr_s) - f)))
        dists.append(scorer.distance(im, imgs_s[g]))
    dists = np.asarray(dists)
    print(
        f"{label} NLPD over {len(dists)} keyframes: "
        f"mean {dists.mean():.4f}  max {dists.max():.4f}  "
        f"(fracts candidate={np.round(fr_b,3).tolist()} sequential={np.round(fr_s,3).tolist()})"
    )
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
    s = sub.add_parser("self-check")
    s.add_argument("--spec", default="sdxl-turbo")
    s.add_argument("--snapshot", default=None)
    s.add_argument("--prompt1", default="photo of underwater landscape, fish, und the sea, incredible detail")
    s.add_argument("--prompt2", default="rendering of an alien planet, strange plants, strange creatures")
    s.add_argument("--branches", type=int, default=10)
    s.add_argument("--bar", type=float, default=0.05)
    s.add_argument(
        "--policy", default="batched", choices=["batched", "predictive"],
        help="candidate policy to score against the reference argmax policy",
    )
    s.add_argument(
        "--scheduler", default="euler", choices=["euler", "dpmpp_2m"],
        help="solver BOTH runs use (deterministic only) — dpmpp_2m bounds the composed fast config",
    )
    s.add_argument("--steps", type=int, default=None, help="override num_inference_steps for both runs")
    args = p.parse_args()
    if args.cmd == "make-goldens":
        make_goldens(args)
        return 0
    if args.cmd == "self-check":
        return self_check(args)
    return check(args)


if __name__ == "__main__":
    sys.exit(main())
