"""NLPD weight-free perceptual metric (models/perceptual.py) + engine wiring."""
import numpy as np
import jax.numpy as jnp
import pytest

from latentblending_tpu.models.perceptual import NLPDScorer, nlpd_distance


def _img(seed, h=64, w=64):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, (h, w, 3), dtype=np.uint8)


def test_identity_distance_zero():
    s = NLPDScorer()
    a = _img(0)
    assert s.distance(a, a) == pytest.approx(0.0, abs=1e-6)


def test_monotone_in_distortion():
    """More noise → strictly larger distance (sanity of the ranking signal,
    which is all the branch-insertion policy consumes)."""
    s = NLPDScorer()
    rng = np.random.default_rng(1)
    base = rng.uniform(0, 255, (64, 64, 3))
    noise = rng.normal(0, 1, base.shape)
    dists = []
    for amp in (5, 20, 60):
        pert = np.clip(base + amp * noise, 0, 255).astype(np.uint8)
        dists.append(s.distance(base.astype(np.uint8), pert))
    assert dists[0] < dists[1] < dists[2]


def test_blur_registers_as_distortion():
    import cv2

    s = NLPDScorer()
    a = _img(2, 128, 128)
    blurred = cv2.GaussianBlur(a, (11, 11), 5.0)
    assert s.distance(a, blurred) > 10 * s.distance(a, a) + 1e-4


def test_batch_matches_single():
    s = NLPDScorer()
    a = np.stack([s._prep(_img(i))[0] for i in range(3)])
    b = np.stack([s._prep(_img(i + 10))[0] for i in range(3)])
    batch = np.asarray(s.distance_batch(jnp.asarray(a), jnp.asarray(b)))
    for i in range(3):
        single = float(nlpd_distance(jnp.asarray(a[i : i + 1]), jnp.asarray(b[i : i + 1]))[0])
        assert batch[i] == pytest.approx(single, rel=1e-5)


def test_deterministic():
    s1, s2 = NLPDScorer(), NLPDScorer()
    a, b = _img(3), _img(4)
    assert s1.distance(a, b) == pytest.approx(s2.distance(a, b), rel=0, abs=0)


def test_engine_accepts_nlpd_metric():
    from latentblending_tpu.engine.blending import BlendingEngine
    from latentblending_tpu.runtime.holder import SDXLHolder

    dh = SDXLHolder.from_random("tiny-turbo", dtype=jnp.float32)
    be = BlendingEngine(dh, similarity_metric="nlpd")
    be.set_prompt1("a")
    be.set_prompt2("b")
    imgs = be.run_transition(fixed_seeds=[1, 2])
    assert len(imgs) >= 3
    assert all(isinstance(np.asarray(im), np.ndarray) for im in imgs)
    # gap list is index-aligned and strictly positive (random-weight decode
    # still yields distinct images)
    assert len(be.tree_similarities) == len(imgs) - 1
