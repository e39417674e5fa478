"""One-process denoise sweep over (batch, flash tiles): amortizes the
process setup that tools/ab_denoise.py pays per variant.

Each variant gets a FRESH SDXLHolder (so identical DenoisePlans recompile
instead of reusing a stale executable when only the flash tile env vars
changed — tile sizes are read at trace time, models/layers.py:152).

    LB_SWEEP='[{"B":2},{"B":4},{"B":8}]' python tools/sweep_denoise.py
    LB_SWEEP='[{"B":2,"bq":512,"bk":512},{"B":2,"bq":1024,"bk":1024}]' ...

Other env: LB_AB_STEPS (30), LB_AB_RES (1024), LB_AB_SPEC (sdxl-base),
LB_AB_IDX (0 — idx_start of the scan window; stems run narrower windows).
Prints one JSON line per variant (same schema as ab_denoise.py).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/lb_jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from latentblending_tpu.ops.flops import unet_forward_flops
from latentblending_tpu.runtime.holder import SDXLHolder


def run_variant(spec, res, steps, idx_start, B, bq=None, bk=None):
    if bq is not None:
        os.environ["LB_FLASH_BQ"] = str(bq)
    else:
        os.environ.pop("LB_FLASH_BQ", None)
    if bk is not None:
        os.environ["LB_FLASH_BK"] = str(bk)
    else:
        os.environ.pop("LB_FLASH_BK", None)

    dh = SDXLHolder.from_random(spec, dtype=jnp.bfloat16)
    dh.set_dimensions((res, res))
    dh.set_num_inference_steps(steps)
    te = dh.get_text_embedding("test prompt")
    lat0 = jnp.concatenate([dh.get_noise(s) for s in range(B)], axis=0)
    cond = dh._conditioning(te, B)
    g = jnp.full((B,), dh.guidance_scale, jnp.float32)

    def run():
        traj = dh.run_diffusion_batched(cond, lat0, idx_start=idx_start, guidance_scale=g)
        np.asarray(traj[-1, -1, -1, -1, -1])  # real host-copy sync
        return traj

    t0 = time.time()
    run()
    compile_s = time.time() - t0
    t0 = time.time()
    run()
    wall = time.time() - t0

    exec_steps = steps - idx_start
    n_img = B * (2 if dh.do_classifier_free_guidance else 1)
    flops = exec_steps * unet_forward_flops(dh.spec.unet, res // 8, res // 8, n_img)
    peak = 197e12  # v5e bf16
    rec = {
        "spec": spec, "res": res, "B": B, "steps": steps, "idx_start": idx_start,
        "cfg": dh.do_classifier_free_guidance,
        "wall_s": round(wall, 3),
        "s_per_stem_step": round(wall / exec_steps / B, 4),
        "mfu": round(flops / wall / peak, 3),
        "compile_s": round(compile_s, 1),
        "bq": bq or "default", "bk": bk or "default",
    }
    print(json.dumps(rec), flush=True)
    del dh
    return rec


def main():
    variants = json.loads(os.environ.get("LB_SWEEP", '[{"B":2},{"B":4},{"B":8}]'))
    spec = os.environ.get("LB_AB_SPEC", "sdxl-base")
    steps = int(os.environ.get("LB_AB_STEPS", "30"))
    res = int(os.environ.get("LB_AB_RES", "1024"))
    idx_start = int(os.environ.get("LB_AB_IDX", "0"))
    for v in variants:
        run_variant(spec, res, steps, v.get("idx", idx_start), int(v["B"]), v.get("bq"), v.get("bk"))


if __name__ == "__main__":
    main()
