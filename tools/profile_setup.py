"""Process-lifecycle profiler: where do cold-start seconds go, and does the
persistent compilation cache actually hit across processes? (VERDICT r2
task 5 — BENCH_r02 recorded setup_s=366 every process despite the cache.)

Times each setup stage, then a cold (compile) and a warm fused
transition→movie run with the engine's per-phase breakdown.

    python tools/profile_setup.py                 # turbo headline config
    LB_PS_SPEC=sdxl-base python tools/profile_setup.py

Run it twice back-to-back: the second process's `first_run_s` shows whether
/tmp/lb_jax_cache converted compiles into cache loads.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

T0 = time.time()
import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/lb_jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402

t_import = time.time() - T0


def main():
    out = {"import_s": round(t_import, 2)}
    spec = os.environ.get("LB_PS_SPEC", "sdxl-turbo")

    t = time.time()
    jax.devices()
    out["backend_init_s"] = round(time.time() - t, 2)

    from latentblending_tpu.engine.blending import BlendingEngine
    from latentblending_tpu.runtime.holder import SDXLHolder

    t = time.time()
    dh = SDXLHolder.from_random(spec, dtype=jnp.bfloat16 if spec.startswith("sdxl") else jnp.float32)
    out["holder_init_s"] = round(time.time() - t, 2)

    t = time.time()
    be = BlendingEngine(dh)
    out["engine_ctor_s"] = round(time.time() - t, 2)

    t = time.time()
    be.set_prompt1("photo of underwater landscape, fish, und the sea, incredible detail")
    be.set_prompt2("rendering of an alien planet, strange plants, strange creatures")
    be.set_negative_prompt("blurry, ugly, pale")
    out["prompts_s"] = round(time.time() - t, 2)
    if not dh.is_sdxl_turbo:
        be.set_branching(nmb_max_branches=int(os.environ.get("LB_BENCH_BRANCHES", "10")))

    t = time.time()
    be.run_movie_transition("/tmp/lb_ps_warmup.mp4", duration_transition=12.0, fixed_seeds=[420, 421])
    out["first_run_s"] = round(time.time() - t, 2)
    out["first_run_phases"] = be.last_report.phases

    t = time.time()
    be.run_movie_transition("/tmp/lb_ps_movie.mp4", duration_transition=12.0, fixed_seeds=[420, 421])
    out["warm_run_s"] = round(time.time() - t, 2)
    out["warm_run_phases"] = be.last_report.phases
    out["keyframes"] = len(be.tree_final_imgs)

    cache_dir = "/tmp/lb_jax_cache"
    try:
        entries = os.listdir(cache_dir)
        out["cache_entries"] = len(entries)
        out["cache_mb"] = round(sum(os.path.getsize(os.path.join(cache_dir, e)) for e in entries) / 1e6, 1)
    except OSError:
        out["cache_entries"] = 0
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
