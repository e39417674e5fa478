"""Probe: does the v5e int8 MXU path beat bf16 for our matmul shapes?

Decides whether an int8-quantized UNet path is worth building. Times a
chain of K dependent matmuls at SDXL-representative shapes in bf16 vs
int8×int8→int32 (lax.dot_general with preferred_element_type), including
the per-use activation quantization cost (abs-max scale + cast) that a
real w8a8 path would pay.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/lb_jax_cache")

SHAPES = [
    # (L, in, out)  — attention/ff shapes at 1024² latents
    (4096, 640, 640),
    (4096, 640, 5120),
    (1024, 1280, 1280),
    (1024, 1280, 10240),
]
K = 32  # chained matmuls per timing
B = 4


def time_fn(fn, *args):
    out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]  # sync compile+warm
    t0 = time.time()
    out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
    return time.time() - t0


def main():
    results = []
    for L, cin, cout in SHAPES:
        x = jnp.ones((B, L, cin), jnp.bfloat16)
        w_bf = jnp.ones((cin, cout), jnp.bfloat16) * 0.01
        w_i8 = jnp.ones((cin, cout), jnp.int8)
        w_scale = jnp.float32(0.01)

        # the matmul output must genuinely feed the next iteration or XLA
        # dead-code-eliminates the dot (first probe version measured scan
        # overhead only)
        @jax.jit
        def chain_bf16(x, w):
            def body(h, _):
                y = jnp.dot(h, w)  # [B,L,cout]
                return (h + y[..., : h.shape[-1]] * jnp.bfloat16(1e-3)).astype(h.dtype), ()

            h, _ = jax.lax.scan(body, x, None, length=K)
            return h

        @jax.jit
        def chain_int8(x, w, s):
            def body(h, _):
                amax = jnp.max(jnp.abs(h), axis=-1, keepdims=True).astype(jnp.float32) + 1e-6
                q = jnp.clip(h.astype(jnp.float32) / amax * 127.0, -127, 127).astype(jnp.int8)
                y = jax.lax.dot_general(
                    q, w, (((2,), (0,)), ((), ())), preferred_element_type=jnp.int32
                )
                yf = (y.astype(jnp.float32) * (amax / 127.0) * s).astype(jnp.bfloat16)
                return (h + yf[..., : h.shape[-1]] * jnp.bfloat16(1e-3)).astype(h.dtype), ()

            h, _ = jax.lax.scan(body, x, None, length=K)
            return h

        t_bf = time_fn(chain_bf16, x, w_bf)
        t_i8 = time_fn(chain_int8, x, w_i8, w_scale)
        flops = 2.0 * B * L * cin * cout * K
        results.append({
            "shape": f"{L}x{cin}x{cout}",
            "bf16_s": round(t_bf, 4), "int8_s": round(t_i8, 4),
            "speedup": round(t_bf / t_i8, 2),
            "bf16_tfs": round(flops / t_bf / 1e12, 1), "int8_tfs": round(flops / t_i8 / 1e12, 1),
        })
        print(json.dumps(results[-1]), flush=True)


if __name__ == "__main__":
    main()
