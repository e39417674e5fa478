"""LPIPS: metric properties + torch-lpips state-dict conversion structure."""
import numpy as np
import pytest

from latentblending_tpu.models.lpips import LPIPSScorer, convert_lpips_state_dict


@pytest.fixture(scope="module")
def scorer():
    return LPIPSScorer(image_hw=(64, 64))


def test_identity_is_zero(scorer):
    img = np.random.default_rng(0).integers(0, 255, (64, 64, 3)).astype(np.uint8)
    assert scorer.distance(img, img) == 0.0


def test_symmetric_and_positive(scorer):
    rng = np.random.default_rng(1)
    a = rng.integers(0, 255, (64, 64, 3)).astype(np.uint8)
    b = rng.integers(0, 255, (64, 64, 3)).astype(np.uint8)
    dab, dba = scorer.distance(a, b), scorer.distance(b, a)
    assert dab > 0
    assert abs(dab - dba) < 1e-6


def test_monotone_in_perturbation(scorer):
    """Bigger perturbations → larger distance (the property the insertion
    policy relies on)."""
    rng = np.random.default_rng(2)
    base = rng.integers(60, 190, (64, 64, 3)).astype(np.uint8)
    d_small = scorer.distance(base, np.clip(base.astype(int) + 8, 0, 255).astype(np.uint8))
    d_large = scorer.distance(base, np.clip(base.astype(int) + 64, 0, 255).astype(np.uint8))
    assert d_large > d_small


def test_batch_matches_single(scorer):
    rng = np.random.default_rng(3)
    a = rng.integers(0, 255, (3, 64, 64, 3)).astype(np.uint8)
    b = rng.integers(0, 255, (3, 64, 64, 3)).astype(np.uint8)
    import jax.numpy as jnp

    fa = jnp.asarray(a, jnp.float32) / 255 * 2 - 1
    fb = jnp.asarray(b, jnp.float32) / 255 * 2 - 1
    batch = np.asarray(scorer.distance_batch(fa, fb))
    for i in range(3):
        assert abs(batch[i] - scorer.distance(a[i], b[i])) < 1e-5


def test_torch_state_dict_conversion_structure():
    # synthesize a torch-lpips-style state dict and check the param tree
    state = {
        "net.slice1.0.weight": np.zeros((64, 3, 11, 11), np.float32),
        "net.slice1.0.bias": np.zeros((64,), np.float32),
        "net.slice2.3.weight": np.zeros((192, 64, 5, 5), np.float32),
        "net.slice2.3.bias": np.zeros((192,), np.float32),
        "net.slice3.6.weight": np.zeros((384, 192, 3, 3), np.float32),
        "net.slice3.6.bias": np.zeros((384,), np.float32),
        "net.slice4.8.weight": np.zeros((256, 384, 3, 3), np.float32),
        "net.slice4.8.bias": np.zeros((256,), np.float32),
        "net.slice5.10.weight": np.zeros((256, 256, 3, 3), np.float32),
        "net.slice5.10.bias": np.zeros((256,), np.float32),
        "lin0.model.1.weight": np.zeros((1, 64, 1, 1), np.float32),
        "lin1.model.1.weight": np.zeros((1, 192, 1, 1), np.float32),
        "lin2.model.1.weight": np.zeros((1, 384, 1, 1), np.float32),
        "lin3.model.1.weight": np.zeros((1, 256, 1, 1), np.float32),
        "lin4.model.1.weight": np.zeros((1, 256, 1, 1), np.float32),
    }
    params = convert_lpips_state_dict(state)
    import jax

    from latentblending_tpu.models.lpips import LPIPS

    ref_shapes = jax.eval_shape(
        LPIPS().init, jax.random.PRNGKey(0), np.zeros((1, 64, 64, 3), np.float32), np.zeros((1, 64, 64, 3), np.float32)
    )["params"]
    from flax.traverse_util import flatten_dict

    got = {k: v.shape for k, v in flatten_dict(params).items()}
    want = {k: v.shape for k, v in flatten_dict(ref_shapes).items()}
    assert got == want


def test_bucketed_pair_call_chunks_large_frames():
    """Above 512² the pair batch processes in chunks of 4 (HBM guard) —
    values must equal the unchunked computation."""
    import jax.numpy as jnp

    from latentblending_tpu.models.lpips import _pair_chunk_limit, bucketed_pair_call

    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.normal(size=(6, 544, 544, 3)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(6, 544, 544, 3)).astype(np.float32))
    assert _pair_chunk_limit(a) == 4
    fn = lambda x, y: jnp.sqrt(jnp.mean((x - y) ** 2, axis=(1, 2, 3)))
    out = bucketed_pair_call(fn, a, b)
    np.testing.assert_allclose(np.asarray(out), np.asarray(fn(a, b)), rtol=1e-6)
    # small frames stay unchunked
    assert _pair_chunk_limit(jnp.zeros((3, 512, 512, 3))) is None
