"""On-chip VAE decode profiling: s/image, TFLOPs, MFU by batch, + xplane trace.

The decoder is ~10% of a composed-fast 1024² transition's device time
(10 keyframes x 0.26 s), so its MFU matters for the realtime bar
(VERDICT r4 #2). Timing uses a tiny host copy to force sync (relay's
block_until_ready lies — see .claude/skills/verify).

    python tools/profile_vae.py --res 1024 --batches 1,2,4
    python tools/profile_vae.py --res 1024 --batches 4 --trace /tmp/lb_vae_trace
    python tools/xplane.py /tmp/lb_vae_trace --top 25
"""
import argparse
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

from latentblending_tpu.runtime.holder import SDXLHolder

PEAK = {"TPU v5 lite": 197e12, "TPU v5e": 197e12, "TPU v4": 275e12}


def peak_flops():
    kind = getattr(jax.devices()[0], "device_kind", "")
    for k, v in PEAK.items():
        if k in kind:
            return v
    return None


def _sync(x):
    np.asarray(x[:1, :1, :1, :1])


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--spec", default="sdxl-base")
    p.add_argument("--res", type=int, default=1024)
    p.add_argument("--batches", default="1,2,4")
    p.add_argument("--reps", type=int, default=3)
    p.add_argument("--trace", default=None, help="capture a jax.profiler trace of one warm decode")
    args = p.parse_args()

    dh = SDXLHolder.from_random(args.spec, dtype=jnp.bfloat16)
    dh.set_dimensions((args.res, args.res))
    peak = peak_flops()
    h = args.res // 8
    for b in [int(x) for x in args.batches.split(",")]:
        lat = jax.random.normal(jax.random.PRNGKey(0), (b, h, h, 4), jnp.float32)
        img = dh.decode_to_pm1_batched(lat)  # compile
        _sync(img)
        # FLOPs from XLA cost analysis on the compiled decode executable
        flops = None
        try:
            lowered = dh._decode_jit.lower(dh.params["vae"], lat)
            flops = lowered.compile().cost_analysis()
            flops = float(flops.get("flops", 0.0)) if isinstance(flops, dict) else float(flops[0].get("flops", 0.0))
        except Exception:
            pass
        ts = []
        for _ in range(args.reps):
            t0 = time.time()
            img = dh.decode_to_pm1_batched(lat)
            _sync(img)
            ts.append(time.time() - t0)
        dt = min(ts)
        line = {
            "batch": b, "res": args.res, "s_per_image": round(dt / b, 4),
            "s_total": round(dt, 4),
        }
        if flops:
            line["tflops_exe"] = round(flops / 1e12, 2)
            line["tflops_per_s"] = round(flops / dt / 1e12, 1)
            if peak:
                line["mfu"] = round(flops / dt / peak, 4)
        print(json.dumps(line), flush=True)
        if args.trace and b == max(int(x) for x in args.batches.split(",")):
            with jax.profiler.trace(args.trace):
                img = dh.decode_to_pm1_batched(lat)
                _sync(img)
            print(f"trace written to {args.trace}", flush=True)


if __name__ == "__main__":
    main()
