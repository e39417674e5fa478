"""Benchmark: SDXL-Turbo 512² latent-blending transition → 12 s movie.

Prints ONE JSON line:
  {"metric": ..., "value": frames/sec end-to-end, "unit": "frames/sec",
   "vs_baseline": x-realtime}

Baseline anchor (BASELINE.md): the reference claims transitions render
"faster than they are typically played back" — i.e. real time is the bar.
vs_baseline = (movie seconds) / (wall seconds): 1.0 == real time.

Weights: random-initialized full SDXL-Turbo architecture (2.6B-param UNet,
real VAE/CLIP towers). Throughput is weight-value independent, so the perf
numbers are faithful; set LB_SNAPSHOT=/path/to/sdxl-turbo to bench with
real weights. LB_BENCH_SPEC=tiny-turbo gives a fast smoke run.
"""
import json
import os
import time

import jax
import jax.numpy as jnp

# sitecustomize pre-imports jax, so env-var config is too late — set the
# persistent compilation cache through the config API.
jax.config.update("jax_compilation_cache_dir", os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/lb_jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from latentblending_tpu.engine.blending import BlendingEngine
from latentblending_tpu.runtime.holder import SDXLHolder

DURATION_S = 12.0
FPS = 30


def main():
    spec = os.environ.get("LB_BENCH_SPEC", "sdxl-turbo")
    snapshot = os.environ.get("LB_SNAPSHOT")
    t_setup = time.time()
    if snapshot:
        dh = SDXLHolder.from_pretrained(snapshot)
    else:
        dh = SDXLHolder.from_random(spec, dtype=jnp.bfloat16 if spec.startswith("sdxl") else jnp.float32)
    be = BlendingEngine(dh)
    be.set_prompt1("photo of underwater landscape, fish, und the sea, incredible detail")
    be.set_prompt2("rendering of an alien planet, strange plants, strange creatures")
    be.set_negative_prompt("blurry, ugly, pale")
    setup_s = time.time() - t_setup

    # warm-up: compile every denoise/decode/fill-up variant the run uses
    be.run_transition(fixed_seeds=[420, 421])
    be.write_movie_transition("/tmp/lb_bench_warmup.mp4", duration_transition=DURATION_S, fps=FPS)

    fp_movie = "/tmp/lb_bench_movie.mp4"
    t0 = time.time()
    be.run_transition(fixed_seeds=[420, 421])
    t_transition = time.time() - t0
    be.write_movie_transition(fp_movie, duration_transition=DURATION_S, fps=FPS)
    wall = time.time() - t0

    n_frames = DURATION_S * FPS
    fps_e2e = n_frames / wall
    result = {
        "metric": "SDXL-Turbo 512x512 transition→12s movie, end-to-end frames/sec/chip",
        "value": round(fps_e2e, 3),
        "unit": "frames/sec",
        "vs_baseline": round(DURATION_S / wall, 3),
        "detail": {
            "spec": dh.spec.name,
            "wall_s": round(wall, 3),
            "transition_s": round(t_transition, 3),
            "keyframes": len(be.tree_final_imgs),
            "dt_unet_step_s": round(be.dt_unet_step, 4),
            "phases": be.last_report.phases,
            "setup_s": round(setup_s, 1),
            "device": str(jax.devices()[0]),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
