"""On-chip UNet step profiling: s/step, TFLOPs, MFU by batch size.

Feeds the SDXL-base 30-step optimization (VERDICT #2). Uses a dependency
chain of K chained steps + a tiny host copy so the relay's async dispatch
cannot fake the timing (see memory: block_until_ready lies here).

    python tools/profile_unet.py --spec sdxl-base --res 1024 --batches 2,4,8
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/lb_jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from latentblending_tpu.models import configs as C
from latentblending_tpu.models.unet import UNet2DCondition

PEAK = {"TPU v5 lite": 197e12, "TPU v5e": 197e12, "TPU v4": 275e12}


def peak_flops():
    kind = getattr(jax.devices()[0], "device_kind", "")
    for k, v in PEAK.items():
        if k in kind:
            return v
    return None


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--spec", default="sdxl-base")
    p.add_argument("--res", type=int, default=1024)
    p.add_argument("--batches", default="2,4,8")
    p.add_argument("--steps", type=int, default=8, help="chained steps per timing")
    p.add_argument("--dtype", default="bf16")
    p.add_argument(
        "--ablate",
        default="",
        help="comma list: conv_only (no transformers), depth1 (1 tx layer "
        "per block), noflash (LB_FLASH=0) — each timed vs the full model",
    )
    args = p.parse_args()

    cfg = {"sdxl-base": C.SDXL_BASE_UNET, "sdxl-turbo": C.SDXL_TURBO_UNET}[args.spec]
    import dataclasses

    ablations = [a for a in args.ablate.split(",") if a]
    if "conv_only" in ablations:
        cfg = dataclasses.replace(cfg, down_block_has_attn=(False, False, False),
                                  transformer_layers_per_block=(0, 0, 0))
    if "depth1" in ablations:
        cfg = dataclasses.replace(cfg, transformer_layers_per_block=(1, 1, 1))
    if "noflash" in ablations:
        os.environ["LB_FLASH"] = "0"
    dtype = {"bf16": jnp.bfloat16, "f32": jnp.float32}[args.dtype]
    H = args.res // 8
    unet = UNet2DCondition(cfg, dtype=dtype, param_dtype=dtype)

    def make_params(B):
        a = (
            jnp.zeros((B, H, H, 4), dtype), jnp.float32(500.0),
            jnp.zeros((B, 77, 2048), dtype), jnp.zeros((B, 1280), dtype), jnp.zeros((B, 6), dtype),
        )
        shapes = jax.eval_shape(unet.init, jax.random.PRNGKey(0), *a)
        params = jax.tree_util.tree_map(lambda s: jnp.zeros(s.shape, s.dtype), shapes["params"])
        return params, a

    results = []
    for B in [int(x) for x in args.batches.split(",")]:
        params, a = make_params(B)
        K = args.steps

        def chain(params, x, t, ctx, pool, tids):
            def body(x, _):
                eps = unet.apply({"params": params}, x, t, ctx, pool, tids)
                return (x * 0.9 + eps * 0.1).astype(x.dtype), ()

            x, _ = jax.lax.scan(body, x, None, length=K)
            return x

        t0 = time.time()
        compiled = jax.jit(chain).lower(params, *a).compile()
        t_compile = time.time() - t0
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0] if ca else {}
        flops = float(ca.get("flops", 0) or 0)

        x = a[0]
        out = compiled(params, x, *a[1:])
        _ = jax.numpy.asarray(out[0, 0, 0, 0])  # sync warmup
        t0 = time.time()
        out = compiled(params, x, *a[1:])
        import numpy as np

        np.asarray(out[0, 0, 0, 0])  # real sync
        wall = time.time() - t0
        peak = peak_flops()
        r = {
            "batch": B,
            "res": args.res,
            "s_per_step": round(wall / K, 4),
            "s_per_step_per_item": round(wall / K / B, 4),
            "tflops_per_step": round(flops / K / 1e12, 2),
            "mfu": round(flops / wall / peak, 3) if peak else None,
            "compile_s": round(t_compile, 1),
        }
        results.append(r)
        print(json.dumps(r), flush=True)


if __name__ == "__main__":
    main()
