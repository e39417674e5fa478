"""A/B harness for the denoise hot path at production shapes.

Times SDXLHolder.run_diffusion_batched exactly as the engine drives it (one
compiled scan over all steps — per-call relay overhead amortized like the
real workload), with analytic-FLOPs MFU. Variants are selected by env:

    LB_FLASH=0                XLA attention everywhere
    LB_FLASH_BQ / LB_FLASH_BK flash tile sizes
    LB_AB_BATCH (default 2), LB_AB_STEPS (default 30), LB_AB_RES (1024)

    python tools/ab_denoise.py
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


def main():
    B = int(os.environ.get("LB_AB_BATCH", "2"))
    steps = int(os.environ.get("LB_AB_STEPS", "30"))
    res = int(os.environ.get("LB_AB_RES", "1024"))
    spec = os.environ.get("LB_AB_SPEC", "sdxl-base")

    dh = SDXLHolder.from_random(spec, dtype=jnp.bfloat16)
    dh.set_dimensions((res, res))
    dh.set_num_inference_steps(steps)
    te = dh.get_text_embedding("test prompt")
    lat0 = jnp.concatenate([dh.get_noise(s) for s in range(B)], axis=0)
    cond = dh._conditioning(te, B)
    g = jnp.full((B,), dh.guidance_scale, jnp.float32)

    def run():
        traj = dh.run_diffusion_batched(cond, lat0, idx_start=0, guidance_scale=g)
        np.asarray(traj[-1, -1, -1, -1, -1])  # real host-copy sync
        return traj

    t0 = time.time()
    run()
    compile_s = time.time() - t0
    t0 = time.time()
    run()
    wall = time.time() - t0

    n_img = B * (2 if dh.do_classifier_free_guidance else 1)
    flops = steps * unet_forward_flops(dh.spec.unet, res // 8, res // 8, n_img)
    peak = 197e12  # v5e bf16
    print(json.dumps({
        "spec": spec, "res": res, "B": B, "steps": steps, "cfg": dh.do_classifier_free_guidance,
        "wall_s": round(wall, 3), "s_per_step": round(wall / steps, 4),
        "tflops": round(flops / 1e12, 1), "mfu": round(flops / wall / peak, 3),
        "compile_s": round(compile_s, 1),
        "flash": os.environ.get("LB_FLASH", "1"),
        "bq": os.environ.get("LB_FLASH_BQ", "default"), "bk": os.environ.get("LB_FLASH_BK", "default"),
    }))


if __name__ == "__main__":
    main()
