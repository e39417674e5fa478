import jax.numpy as jnp
import numpy as np
import pytest

from latentblending_tpu.engine.blending import BlendingEngine
from latentblending_tpu.engine.tree_cache import TreeCacheMismatch, load_tree, save_tree
from latentblending_tpu.runtime.holder import SDXLHolder


@pytest.mark.slow
def test_tree_roundtrip(tmp_path):
    dh = SDXLHolder.from_random("tiny-turbo", dtype=jnp.float32)
    be = BlendingEngine(dh, run_benchmark=False)
    be.set_prompt1("a")
    be.set_prompt2("b")
    be.set_branching(nmb_max_branches=2)
    imgs = be.run_transition(fixed_seeds=[1, 2])
    fp = str(tmp_path / "tree.npz")
    save_tree(be, fp)

    be2 = BlendingEngine(dh, run_benchmark=False)
    meta = load_tree(be2, fp)
    assert meta["seed1"] == 1 and meta["seed2"] == 2
    assert be2.tree_fracts == be.tree_fracts
    assert be2.tree_idx_injection == be.tree_idx_injection
    assert len(be2.tree_final_imgs) == len(imgs)
    np.testing.assert_array_equal(be2.tree_final_imgs[0], imgs[0])
    # trajectories restored (incl. None mask)
    for b in range(len(be.tree_latents)):
        for i in range(be.num_inference_steps):
            a, c = be.tree_latents[b][i], be2.tree_latents[b][i]
            assert (a is None) == (c is None)
            if a is not None:
                np.testing.assert_allclose(np.asarray(a, np.float32), np.asarray(c, np.float32), atol=1e-6)
    # a rerender from the restored tree works
    be2.write_movie_transition(str(tmp_path / "m.mp4"), duration_transition=1.0, fps=8)


@pytest.mark.slow
def test_tree_cache_rejects_mismatches(tmp_path):
    """v2 format: spec/scheduler/dims mismatches fail loudly at load time
    with actionable messages, not later and obscurely (VERDICT r4 task 6)."""
    dh = SDXLHolder.from_random("tiny-turbo", dtype=jnp.float32)
    be = BlendingEngine(dh, run_benchmark=False)
    be.set_prompt1("a")
    be.set_prompt2("b")
    be.set_branching(nmb_max_branches=2)
    be.run_transition(fixed_seeds=[1, 2])
    fp = str(tmp_path / "tree.npz")
    save_tree(be, fp)

    # wrong model spec
    dh_base = SDXLHolder.from_random("tiny-base", dtype=jnp.float32)
    be_base = BlendingEngine(dh_base, run_benchmark=False)
    be_base.set_num_inference_steps(be.num_inference_steps)
    with pytest.raises(TreeCacheMismatch, match="model_spec"):
        load_tree(be_base, fp)

    # wrong scheduler type
    dh2 = SDXLHolder.from_random("tiny-turbo", dtype=jnp.float32)
    dh2.set_scheduler_type("dpmpp_2m")
    be2 = BlendingEngine(dh2, run_benchmark=False)
    with pytest.raises(TreeCacheMismatch, match="scheduler_type"):
        load_tree(be2, fp)

    # wrong dimensions
    dh3 = SDXLHolder.from_random("tiny-turbo", dtype=jnp.float32)
    be3 = BlendingEngine(dh3, run_benchmark=False)
    be3.set_dimensions((256, 256))
    with pytest.raises(TreeCacheMismatch, match="dimensions"):
        load_tree(be3, fp)

    # matching engine still loads
    dh4 = SDXLHolder.from_random("tiny-turbo", dtype=jnp.float32)
    be4 = BlendingEngine(dh4, run_benchmark=False)
    meta = load_tree(be4, fp)
    assert meta["format_version"] == 2
    assert meta["model_spec"] == "tiny-turbo"


@pytest.mark.slow
def test_tree_cache_bf16_storage(tmp_path):
    """bf16 engines store bf16 bit patterns (half the fp32 bytes) and the
    roundtrip is exact."""
    dh = SDXLHolder.from_random("tiny-turbo", dtype=jnp.bfloat16)
    be = BlendingEngine(dh, run_benchmark=False)
    be.set_prompt1("a")
    be.set_prompt2("b")
    be.set_branching(nmb_max_branches=2)
    be.run_transition(fixed_seeds=[1, 2])
    fp = str(tmp_path / "tree_bf16.npz")
    save_tree(be, fp)
    data = np.load(fp, allow_pickle=False)
    lat_keys = [k for k in data.files if k.startswith("lat_")]
    assert lat_keys and all(data[k].dtype == np.uint16 for k in lat_keys)

    be2 = BlendingEngine(dh, run_benchmark=False)
    meta = load_tree(be2, fp)
    assert meta["latent_dtype"] == "bfloat16"
    for b in range(len(be.tree_latents)):
        for i in range(be.num_inference_steps):
            a, c = be.tree_latents[b][i], be2.tree_latents[b][i]
            assert (a is None) == (c is None)
            if a is not None:
                np.testing.assert_array_equal(
                    np.asarray(a, np.float32), np.asarray(c, np.float32)
                )
