"""TP proven at PRODUCTION shapes (VERDICT r3 task 4).

Round-3 sharding tests exercised TINY_UNET only; a real-shape TP hole could
hide behind tp.py's divisibility fallback. These tests lower + compile the
real SDXL-base UNet denoise plan (heads 10/20, kernels 640/1280/2048/10240)
on the 8-virtual-CPU mesh — abstract params via jax.eval_shape, so no 2.5B
array is ever materialized — and assert the compiled executable's input
shardings, per-device shard shapes, and the no-full-param-all-gather
property. Reference counterpart: none (SURVEY §2.3) — TP is this build's
own claimed capability.
"""
import functools
import re

import jax
import jax.numpy as jnp
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from latentblending_tpu.models.configs import SDXL_BASE_UNET, SDXL_CLIP_BIGG
from latentblending_tpu.models.unet import UNet2DCondition
from latentblending_tpu.parallel.mesh import make_mesh
from latentblending_tpu.parallel.tp import unet_tp_specs
from latentblending_tpu.runtime.denoise import Conditioning, DenoisePlan, denoise_scan

DT = jnp.bfloat16
CTX = SDXL_BASE_UNET.cross_attention_dim
POOLED = SDXL_CLIP_BIGG.projection_dim


@functools.lru_cache(maxsize=1)
def _abstract_unet():
    """(module, abstract param tree) for the REAL SDXL-base UNet."""
    cfg = SDXL_BASE_UNET
    unet = UNet2DCondition(cfg, dtype=DT, param_dtype=DT)
    h = cfg.sample_size
    abs_params = jax.eval_shape(
        unet.init, jax.random.PRNGKey(0),
        jnp.zeros((1, h, h, 4), DT), jnp.float32(0.0),
        jnp.zeros((1, 77, CTX), DT), jnp.zeros((1, POOLED), DT),
        jnp.zeros((1, 6), DT),
    )["params"]
    return unet, abs_params


def _abstract_denoise_args(mesh, B, h, M, N):
    """ShapeDtypeStructs with production shardings for one denoise call."""
    S = jax.ShapeDtypeStruct
    dsh = NamedSharding(mesh, P("data"))
    rep = NamedSharding(mesh, P())
    return dict(
        latents_start=S((B, h, h, 4), DT, sharding=dsh),
        cond=Conditioning(
            prompt_embeds=S((B, 77, CTX), DT, sharding=dsh),
            pooled_embeds=S((B, POOLED), DT, sharding=dsh),
            time_ids=S((B, 6), DT, sharding=dsh),
            neg_prompt_embeds=S((B, 77, CTX), DT, sharding=dsh),
            neg_pooled_embeds=S((B, POOLED), DT, sharding=dsh),
            neg_time_ids=S((B, 6), DT, sharding=dsh),
        ),
        mix_window=S((M, B, h, h, 4), DT, sharding=NamedSharding(mesh, P(None, "data"))),
        mix_coeffs=S((M, B), jnp.float32, sharding=rep),
        sigmas=S((N + 1,), jnp.float32, sharding=rep),
        timesteps=S((N,), jnp.float32, sharding=rep),
        guidance_scale=S((B,), jnp.float32, sharding=dsh),
        step_keys=S((M, 2), jnp.uint32, sharding=rep),
    )


def _compile_real_plan(mesh, B, use_cfg):
    """AOT-compile the real SDXL-base denoise scan (no execution)."""
    unet, abs_params = _abstract_unet()
    specs = unet_tp_specs(abs_params, mesh, strict=(mesh.shape["model"] > 1))
    pshard = jax.tree_util.tree_map(
        lambda s: NamedSharding(mesh, s), specs, is_leaf=lambda x: isinstance(x, P)
    )
    abs_sharded = jax.tree_util.tree_map(
        lambda a, sh: jax.ShapeDtypeStruct(a.shape, a.dtype, sharding=sh), abs_params, pshard
    )
    N = 30
    plan = DenoisePlan(num_steps=N, idx_start=15, batch=B, use_cfg=use_cfg, sched="euler")
    unet_apply = lambda p, lat, t, pe, pool, tids: unet.apply({"params": p}, lat, t, pe, pool, tids)
    fn = functools.partial(denoise_scan, unet_apply, plan=plan)
    args = _abstract_denoise_args(mesh, B, SDXL_BASE_UNET.sample_size, plan.exec_steps, N)
    return jax.jit(fn).lower(abs_sharded, **args).compile(), specs, abs_params


def _allgather_sizes_bytes(hlo: str) -> list[int]:
    sizes = []
    for m in re.finditer(r"(\w+)\[([\d,]*)\][^=]*\ball-gather\(", hlo):
        dt, dims = m.group(1), m.group(2)
        if dt not in ("f32", "bf16", "f16", "s32", "u32", "f64"):
            continue
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        sizes.append(n * {"f32": 4, "s32": 4, "u32": 4, "f64": 8}.get(dt, 2))
    return sizes


def test_tp_specs_real_sdxl_strict_no_fallback():
    """Every TP rule shards cleanly at the real 640/1280/2048/10240 dims:
    strict mode (which raises on any replicated fallback) passes, and a
    substantial fraction of the tree is actually model-sharded."""
    from flax.traverse_util import flatten_dict

    _, abs_params = _abstract_unet()
    mesh = make_mesh(n_data=4, n_model=2)
    specs = unet_tp_specs(abs_params, mesh, strict=True)  # raises on fallback
    flat = flatten_dict(specs)
    n_sharded = sum(1 for s in flat.values() if "model" in str(s))
    assert n_sharded >= 700, f"only {n_sharded} TP-sharded params at real shapes"
    # sharded fraction of PARAM BYTES must be meaningful (attn+ff dominate)
    fb = flatten_dict(abs_params)
    tp_bytes = sum(v.size for (k, v), s in zip(fb.items(), flat.values()) if "model" in str(s))
    all_bytes = sum(v.size for v in fb.values())
    assert tp_bytes / all_bytes > 0.4, f"TP covers only {tp_bytes / all_bytes:.0%} of param bytes"


@pytest.mark.slow
def test_tp_real_shape_compile_dp4_tp2():
    """dp×tp 4×2 at REAL SDXL-base shapes: the compiled 30-step CFG denoise
    executable (a) takes TP-sharded params (b) splits the stem batch over
    'data' and (c) contains NO all-gather that materializes a full copy of
    any TP-sharded param — the property that distinguishes true Megatron TP
    from silently-replicated compute."""
    from flax.traverse_util import flatten_dict

    mesh = make_mesh(n_data=4, n_model=2)
    B = 4
    compiled, specs, abs_params = _compile_real_plan(mesh, B=B, use_cfg=True)

    # (a)+(b): executable input shardings
    in_sh = jax.tree_util.tree_leaves(
        compiled.input_shardings, is_leaf=lambda x: hasattr(x, "shard_shape")
    )
    n_model_sharded = sum(1 for sh in in_sh if "model" in str(getattr(sh, "spec", "")))
    assert n_model_sharded >= 700, f"only {n_model_sharded} executable inputs sharded over 'model'"
    lat_shards = [
        sh.shard_shape((B, 128, 128, 4))
        for sh in in_sh
        if str(getattr(sh, "spec", "")).startswith("PartitionSpec('data'")
    ]
    assert lat_shards and all(s[0] == 1 for s in lat_shards), lat_shards

    # (c): no full-param all-gather anywhere in the compiled module
    sizes = _allgather_sizes_bytes(compiled.as_text())
    fb = flatten_dict(abs_params)
    tp_param_bytes = [
        v.size * 2 for (k, v), s in zip(fb.items(), flatten_dict(specs).values())
        if "model" in str(s)
    ]
    smallest_tp = min(tp_param_bytes)
    biggest_ag = max(sizes) if sizes else 0
    assert biggest_ag < smallest_tp, (
        f"all-gather materializes {biggest_ag}B ≥ smallest TP param {smallest_tp}B"
    )


@pytest.mark.slow
def test_tp_real_shape_compile_dp8():
    """dp 8×1 at REAL SDXL-base shapes: batch inputs split 8 → 1 per device
    and the trajectory output keeps the 'data' partitioning."""
    mesh = make_mesh(n_data=8, n_model=1)
    B = 8
    compiled, _, _ = _compile_real_plan(mesh, B=B, use_cfg=True)
    in_sh = jax.tree_util.tree_leaves(
        compiled.input_shardings, is_leaf=lambda x: hasattr(x, "shard_shape")
    )
    lat_shards = [
        sh.shard_shape((B, 128, 128, 4))
        for sh in in_sh
        if str(getattr(sh, "spec", "")).startswith("PartitionSpec('data'")
    ]
    assert lat_shards and all(s[0] == 1 for s in lat_shards), lat_shards
    out_sh = jax.tree_util.tree_leaves(
        compiled.output_shardings, is_leaf=lambda x: hasattr(x, "shard_shape")
    )
    assert any("data" in str(getattr(sh, "spec", "")) for sh in out_sh), (
        "trajectory output not partitioned over 'data'"
    )


def test_tp_fallback_warns_and_strict_raises(caplog):
    """A rule-matching param whose dim does NOT divide the model axis falls
    back to replicated with a WARNING (VERDICT r3 weak #5), and raises under
    strict=True / LB_TP_STRICT=1."""
    mesh = make_mesh(n_data=2, n_model=4)
    # 6 % 4 != 0 → fallback; shapes only, no real arrays needed
    params = {"blk": {"attn": {"to_q": {"kernel": jax.ShapeDtypeStruct((6, 6), DT)}}}}
    import logging

    with caplog.at_level(logging.WARNING, logger="latentblending_tpu.parallel.tp"):
        specs = unet_tp_specs(params, mesh, strict=False)
    assert specs["blk"]["attn"]["to_q"]["kernel"] == P()
    assert any("REPLICATED" in r.message for r in caplog.records), "no fallback warning logged"
    with pytest.raises(ValueError, match="does not divide"):
        unet_tp_specs(params, mesh, strict=True)
    # env-var path
    import os

    os.environ["LB_TP_STRICT"] = "1"
    try:
        with pytest.raises(ValueError, match="does not divide"):
            unet_tp_specs(params, mesh)
    finally:
        del os.environ["LB_TP_STRICT"]
