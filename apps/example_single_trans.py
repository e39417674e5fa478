"""Canonical single-transition example (reference example_single_trans.py).

With real SDXL-Turbo weights:
    python apps/example_single_trans.py --snapshot /path/to/sdxl-turbo
Weightless dev/demo run (tiny random model, CPU-friendly):
    python apps/example_single_trans.py --tiny
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import jax.numpy as jnp
import numpy as np

from latentblending_tpu.engine.blending import BlendingEngine
from latentblending_tpu.runtime.holder import SDXLHolder


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--snapshot", type=str, default=None, help="HF snapshot dir (sdxl-turbo)")
    p.add_argument("--tiny", action="store_true", help="tiny random model (no weights needed)")
    p.add_argument("--out", type=str, default="movie_example1.mp4")
    p.add_argument("--duration", type=float, default=12.0)
    p.add_argument(
        "--scheduler", default=None, choices=["euler", "euler_ancestral", "dpmpp_2m"],
        help="override the checkpoint's solver (dpmpp_2m: ~same quality at half the steps)",
    )
    p.add_argument("--steps", type=int, default=None, help="num_inference_steps override")
    p.add_argument(
        "--similarity_metric", default=None, choices=["lpips", "nlpd"],
        help="branch-placement metric (default: nlpd unless LPIPS weights are supplied)",
    )
    p.add_argument(
        "--placement_policy", default="measured", choices=["measured", "predictive"],
        help="measured: reference-exact argmax placement; predictive: zero-sync "
             "predicted gap halving (faster, drift bounded in BENCH.md)",
    )
    # real-image keyframes (beyond-reference capability: the reference
    # stores these images but never uses them, blending_engine.py:231-245;
    # here they are VAE-encoded into a forward-noised trajectory and pinned
    # as tree edges — see BlendingEngine.set_keyframe1_image)
    p.add_argument("--image1", type=str, default=None,
                   help="PNG/JPG to pin as the FIRST keyframe (photo → prompt2 transition)")
    p.add_argument("--image2", type=str, default=None,
                   help="PNG/JPG to pin as the SECOND keyframe (prompt1 → photo transition)")
    # incremental deepening (resume surface): after the first movie, add
    # stem levels to the SAME tree without recomputing any trajectory and
    # write a smoother second movie (engine/tree_cache.py + README)
    p.add_argument("--deepen", type=int, default=0, metavar="K",
                   help="after the movie, extend_transition with K extra keyframes "
                        "at a deeper injection index and write <out>.deepened.mp4")
    args = p.parse_args()

    if args.tiny or args.snapshot is None:
        # tiny mode is a CPU-friendly smoke path; force CPU so it never
        # competes with a real-chip session (the JAX_PLATFORMS env var is
        # pre-empted by sitecustomize in some environments — use the config
        # API, which works as long as no backend is initialized yet)
        import jax

        try:
            jax.config.update("jax_platforms", "cpu")
        except Exception:
            pass
        dh = SDXLHolder.from_random("tiny-turbo", dtype=jnp.float32)
    else:
        dh = SDXLHolder.from_pretrained(args.snapshot)

    if args.scheduler:
        dh.set_scheduler_type(args.scheduler)
    be = BlendingEngine(dh, similarity_metric=args.similarity_metric)
    be.placement_policy = args.placement_policy
    if args.steps:
        be.set_num_inference_steps(args.steps)
    be.set_prompt1("underwater landscape, fish, und the sea, incredible detail, high resolution")
    be.set_prompt2("rendering of an alien planet, strange plants, strange creatures, surreal")
    be.set_negative_prompt("blurry, ugly, pale")

    recycle1 = recycle2 = False
    if args.image1:
        from PIL import Image

        be.set_keyframe1_image(np.asarray(Image.open(args.image1).convert("RGB")))
        recycle1 = True
        print(f"keyframe 1 pinned to {args.image1}")
    if args.image2:
        from PIL import Image

        be.set_keyframe2_image(np.asarray(Image.open(args.image2).convert("RGB")))
        recycle2 = True
        print(f"keyframe 2 pinned to {args.image2}")

    t0 = time.time()
    be.run_transition(recycle_img1=recycle1, recycle_img2=recycle2, fixed_seeds=[420, 421])
    print(f"transition computed in {time.time() - t0:.2f}s "
          f"({len(be.tree_final_imgs)} keyframes)")
    be.write_movie_transition(args.out, duration_transition=args.duration)
    print(f"movie written to {args.out}")

    if args.deepen > 0:
        # deepen near the end of the schedule: cheap stems (few steps each),
        # placed by the live gap similarities — nothing already computed
        # is re-run (tests/test_extend_transition.py asserts call counts)
        idx_deep = max(1, int(round(be.num_inference_steps * 0.75)))
        t0 = time.time()
        be.extend_transition([idx_deep], [args.deepen])
        fp2 = os.path.splitext(args.out)[0] + ".deepened.mp4"
        print(f"tree deepened by {args.deepen} stems at idx {idx_deep} in "
              f"{time.time() - t0:.2f}s ({len(be.tree_final_imgs)} keyframes)")
        be.write_movie_transition(fp2, duration_transition=args.duration)
        print(f"deepened movie written to {fp2}")


if __name__ == "__main__":
    main()
