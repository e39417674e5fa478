"""Bench the remaining BASELINE.json configs (VERDICT #8):

  config 1: turbo, nmb_max_branches=5
  config 3: crossfeed-heavy (branch1+parental 0.5/0.7/0.2), depth sweep 0.3–0.7

Each row: transition wall (warm), keyframes. Run on the real chip:
    python tools/bench_configs.py [--spec sdxl-turbo] [--out -]
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/lb_jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from latentblending_tpu.engine.blending import BlendingEngine
from latentblending_tpu.runtime.holder import SDXLHolder


def timed_transition(be, seeds=(420, 421)):
    be.run_transition(fixed_seeds=list(seeds))  # warm (compiles)
    t0 = time.time()
    be.run_transition(fixed_seeds=list(seeds))
    return time.time() - t0, len(be.tree_final_imgs)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--spec", default="sdxl-turbo")
    p.add_argument("--depths", default="0.3,0.4,0.5,0.6,0.7")
    args = p.parse_args()

    dh = SDXLHolder.from_random(args.spec, dtype=jnp.bfloat16 if args.spec.startswith("sdxl") else jnp.float32)
    be = BlendingEngine(dh)
    be.set_prompt1("photo of underwater landscape, fish, und the sea, incredible detail")
    be.set_prompt2("rendering of an alien planet, strange plants, strange creatures")
    be.set_negative_prompt("blurry, ugly, pale")

    rows = []

    # --- config 1: turbo default but nmb_max_branches=5
    be.set_branch1_crossfeed(0, 0, 0)
    be.set_parental_crossfeed()
    be.set_branching(nmb_max_branches=5)
    wall, kf = timed_transition(be)
    rows.append({"config": "nmb_max_branches=5", "wall_s": round(wall, 3), "keyframes": kf})
    print(json.dumps(rows[-1]), flush=True)

    # --- config 3: crossfeed-heavy, depth sweep
    be.set_branch1_crossfeed(0.5, 0.7, 0.2)
    be.set_parental_crossfeed(0.5, 0.7, 0.2)
    for d in [float(x) for x in args.depths.split(",")]:
        be.set_branching(depth_strength=d, nmb_max_branches=6)
        wall, kf = timed_transition(be)
        rows.append({
            "config": f"crossfeed 0.5/0.7/0.2 depth={d}", "wall_s": round(wall, 3),
            "keyframes": kf, "idx_injection": be.list_idx_injection,
        })
        print(json.dumps(rows[-1]), flush=True)

    # --- config 4: 4-prompt chained movie (3 transitions, latent recycling)
    # with the overlapped part-write pipeline (part i encodes while part
    # i+1 computes). Warm pass first: the recycled-edge plan variants
    # compile on the first chained run.
    from latentblending_tpu.engine.session import Keyframe, MovieProject, run_multi_transition

    be.set_branch1_crossfeed(0, 0, 0)
    be.set_parental_crossfeed()
    be.set_branching(nmb_max_branches=10)
    project = MovieProject(
        keyframes=[
            Keyframe("photo of underwater landscape, fish, und the sea, incredible detail", 420),
            Keyframe("rendering of an alien planet, strange plants, strange creatures", 421),
            Keyframe("oil painting of a medieval city at sunset", 422),
            Keyframe("macro photo of a snowflake, crystal detail", 423),
        ],
        width=be.dh.width_img, height=be.dh.height_img,
        num_inference_steps=be.num_inference_steps,
    )
    for tag in ("warm", "timed"):
        t0 = time.time()
        run_multi_transition(be, project, "/tmp/lb_bench_chained.mp4", duration_single_trans=4.0, fps=30, apply_settings=False)
        wall = time.time() - t0
    rows.append({
        "config": "4-prompt chained movie (12s, overlapped part writes)",
        "wall_s": round(wall, 3), "vs_realtime": round(12.0 / wall, 2),
    })
    print(json.dumps(rows[-1]), flush=True)

    print(json.dumps({"all": rows}))


if __name__ == "__main__":
    main()
