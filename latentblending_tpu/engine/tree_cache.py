"""On-disk cache of a transition's diffusion tree.

The reference's resume story is in-memory only (recycle_img1/2 and
swap_forward, blending_engine.py:333-342,:731-742); SURVEY.md §5 calls for
an optional on-disk latent-trajectory cache. This serializes the whole
tree (trajectories + fracts + injection depths + similarities + keyframe
images) to one .npz, so a transition can be re-loaded, re-rendered at a
different duration/fps, or extended with deeper levels without recompute.

Every branch is a pure function of (seeds, prompts, tree state), so this
is also the deterministic failure-recovery story: reload and re-run only
what's missing.
"""
from __future__ import annotations

import json

import jax.numpy as jnp
import numpy as np


def save_tree(be, fp_npz: str) -> None:
    """Serialize engine.tree_* to fp_npz (portable numpy archive)."""
    N = be.num_inference_steps
    arrays: dict[str, np.ndarray] = {}
    valid = np.zeros((len(be.tree_latents), N), bool)
    for b, branch in enumerate(be.tree_latents):
        for i, lat in enumerate(branch):
            if lat is not None:
                arrays[f"lat_{b}_{i}"] = np.asarray(lat, np.float32)
                valid[b, i] = True
    arrays["valid"] = valid
    arrays["fracts"] = np.asarray(be.tree_fracts, np.float64)
    arrays["idx_injection"] = np.asarray(be.tree_idx_injection, np.int32)
    arrays["similarities"] = np.asarray(be.tree_similarities, np.float64)
    arrays["imgs"] = np.stack([np.asarray(im) for im in be.tree_final_imgs])
    arrays["meta"] = np.frombuffer(
        json.dumps(
            {
                "num_inference_steps": N,
                "prompt1": be.prompt1,
                "prompt2": be.prompt2,
                "negative_prompt": be.negative_prompt,
                "seed1": be.seed1,
                "seed2": be.seed2,
            }
        ).encode(),
        dtype=np.uint8,
    )
    np.savez_compressed(fp_npz, **arrays)


def load_tree(be, fp_npz: str) -> dict:
    """Restore engine.tree_* from fp_npz; returns the saved metadata."""
    data = np.load(fp_npz, allow_pickle=False)
    meta = json.loads(bytes(data["meta"]).decode())
    valid = data["valid"]
    nb, N = valid.shape
    assert meta["num_inference_steps"] == N
    be.num_inference_steps = N
    be.dh.set_num_inference_steps(N)
    be.tree_latents = [
        [jnp.asarray(data[f"lat_{b}_{i}"], be.dh.dtype) if valid[b, i] else None for i in range(N)]
        for b in range(nb)
    ]
    be.tree_fracts = [float(f) for f in data["fracts"]]
    be.tree_idx_injection = [int(i) for i in data["idx_injection"]]
    be.tree_similarities = [float(s) for s in data["similarities"]]
    be.tree_final_imgs = [data["imgs"][i] for i in range(data["imgs"].shape[0])]
    # rebuild the device-resident LPIPS images so the batched policy path
    # stays index-aligned with the restored tree
    be._imgs_dev = [be.lpips._prep(im)[0] for im in be.tree_final_imgs]
    be.seed1, be.seed2 = meta["seed1"], meta["seed2"]
    return meta
