import jax.numpy as jnp
import numpy as np
import pytest

from latentblending_tpu.engine.blending import BlendingEngine
from latentblending_tpu.engine.tree_cache import load_tree, save_tree
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
