"""Checkpoint conversion: HF torch state dicts / safetensors → flax pytrees.

The reference consumes HF weights through diffusers' loaders; we own the
conversion. Torch stores Linear as [out,in] and Conv as [O,I,kH,kW]; our
TPU layout is Dense [in,out] and Conv HWIO. Module names were chosen to
mirror HF key segments, so conversion is:

  1. split the torch key on '.', fold numeric segments into their parent
     ("down_blocks.0" → "down_blocks_0"),
  2. apply a per-model path fixup (VAE flattens its block nesting,
     CLIP strips the "text_model.*" prefixes),
  3. rename/transpose the leaf (weight→kernel/scale/embedding).

Production entry points:
  load_sdxl_unet(dir), load_sdxl_vae(dir), load_clip(dir) — read
  *.safetensors shards from a HF snapshot directory.
"""
from __future__ import annotations

import os
import re
from typing import Callable, Mapping

import jax.numpy as jnp
import numpy as np
from flax.traverse_util import unflatten_dict

_NUM = re.compile(r"^\d+$")


def _merge_numeric(segments: list[str]) -> list[str]:
    out: list[str] = []
    for s in segments:
        if _NUM.match(s) and out:
            out[-1] = f"{out[-1]}_{s}"
        else:
            out.append(s)
    return out


def _leaf(path: list[str], value: np.ndarray) -> tuple[list[str], np.ndarray]:
    """Rename/transpose the final (param) segment."""
    *mods, param = path
    if param == "bias":
        return path, value
    if param != "weight":
        return path, value  # e.g. raw params
    if mods and mods[-1] in ("token_embedding", "shared", "position_embedding"):
        return mods + ["embedding"], value
    if value.ndim == 1:
        return mods + ["scale"], value
    if value.ndim == 2:
        return mods + ["kernel"], value.T
    if value.ndim == 4:
        return mods + ["kernel"], value.transpose(2, 3, 1, 0)
    raise ValueError(f"unhandled weight shape {value.shape} at {'.'.join(path)}")


def _identity_fixup(path: list[str]) -> list[str] | None:
    return path


def _vae_fixup(path: list[str]) -> list[str] | None:
    """Flatten decoder/encoder block nesting to match models/vae.py naming:
    decoder.mid_block_resnets_0.conv1, decoder.up_blocks_0_resnets_1.conv1 ...
    """
    if path[0] in ("decoder", "encoder") and len(path) > 3:
        top, *mid, leaf_mod, param = path
        return [top, "_".join(mid), leaf_mod, param]
    return path


def _clip_fixup(path: list[str]) -> list[str] | None:
    # text_model.embeddings.token_embedding.weight → token_embedding.weight
    # text_model.embeddings.position_embedding.weight → position_embedding (raw)
    # text_model.encoder.layers_0.* → layers_0.*
    # text_model.final_layer_norm.* → final_layer_norm.*
    # text_projection.weight stays
    if path[:2] == ["text_model", "embeddings"]:
        if path[2] == "position_embedding":
            return ["position_embedding"]  # raw param, no leaf rename
        return path[2:]
    if path[:2] == ["text_model", "encoder"]:
        rest = path[2:]
        # mlp.fc1 → mlp_fc1 (flattened in models/clip.py)
        if len(rest) >= 3 and rest[1] == "mlp":
            rest = [rest[0], f"mlp_{rest[2]}"] + rest[3:]
        return rest
    if path[0] == "text_model":
        return path[1:]
    if path[0] == "text_projection":
        return path
    if path[0] in ("logit_scale",):
        return None  # not used by the text tower
    return path


def convert_state_dict(
    state: Mapping[str, np.ndarray], fixup: Callable[[list[str]], list[str] | None] = _identity_fixup,
    dtype=None,
) -> dict:
    """Torch-layout state dict → nested flax params dict."""
    flat: dict[tuple[str, ...], jnp.ndarray] = {}
    for key, value in state.items():
        value = np.asarray(value)
        path = _merge_numeric(key.split("."))
        path = fixup(path)
        if path is None:
            continue
        if path[-1] not in ("weight", "bias") or (len(path) == 1):
            # raw param (e.g. position_embedding)
            out_path, out_val = path, value
        else:
            out_path, out_val = _leaf(path, value)
        if dtype is not None:
            out_val = out_val.astype(dtype)
        flat[tuple(out_path)] = jnp.asarray(out_val)
    return unflatten_dict(flat)


def convert_unet_state_dict(state, dtype=None) -> dict:
    return convert_state_dict(state, _identity_fixup, dtype)


def convert_vae_state_dict(state, dtype=None) -> dict:
    return convert_state_dict(state, _vae_fixup, dtype)


def convert_clip_state_dict(state, dtype=None) -> dict:
    return convert_state_dict(state, _clip_fixup, dtype)


def _load_safetensors_dir(path: str) -> dict[str, np.ndarray]:
    from safetensors.numpy import load_file

    files = sorted(
        os.path.join(path, f) for f in os.listdir(path) if f.endswith(".safetensors")
    )
    if not files:
        raise FileNotFoundError(f"no .safetensors files under {path}")
    state: dict[str, np.ndarray] = {}
    for f in files:
        state.update(load_file(f))
    return state


def load_sdxl_unet(snapshot_dir: str, dtype=jnp.bfloat16) -> dict:
    """snapshot_dir: HF model dir containing unet/*.safetensors."""
    return convert_unet_state_dict(_load_safetensors_dir(os.path.join(snapshot_dir, "unet")), dtype)


def load_sdxl_vae(snapshot_dir: str, dtype=jnp.float32) -> dict:
    return convert_vae_state_dict(_load_safetensors_dir(os.path.join(snapshot_dir, "vae")), dtype)


def load_clip(snapshot_dir: str, subdir: str, dtype=jnp.float32) -> dict:
    return convert_clip_state_dict(_load_safetensors_dir(os.path.join(snapshot_dir, subdir)), dtype)


def torch_state_dict_to_numpy(module) -> dict[str, np.ndarray]:
    """Helper for tests: torch nn.Module → {name: np.ndarray}."""
    return {k: v.detach().cpu().numpy() for k, v in module.state_dict().items()}
