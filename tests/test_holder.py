"""End-to-end holder tests on the tiny spec (CPU): text → noise → denoise →
decode, plus the reference API contracts."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from latentblending_tpu.runtime.holder import SDXLHolder


@pytest.fixture(scope="module")
def holder():
    return SDXLHolder.from_random("tiny-turbo", seed=0, dtype=jnp.float32)


def test_text_embedding_contract(holder):
    pe, ne, pool, npool = holder.get_text_embedding("a photo of a cat")
    assert pe.shape == (1, 77, 64)  # concat of 32+32 tiny towers
    assert ne.shape == (1, 77, 64)
    assert pool.shape == (1, 48)
    assert npool.shape == (1, 48)
    # different prompts → different embeddings
    pe2, *_ = holder.get_text_embedding("a dog in the rain")
    assert not np.allclose(np.asarray(pe), np.asarray(pe2))


def test_noise_seeded(holder):
    n1 = holder.get_noise(42)
    n2 = holder.get_noise(42)
    n3 = holder.get_noise(43)
    assert n1.shape == (1, 16, 16, 4)
    np.testing.assert_array_equal(np.asarray(n1), np.asarray(n2))
    assert not np.allclose(np.asarray(n1), np.asarray(n3))
    # scaled by init_noise_sigma
    std = float(jnp.std(n1))
    assert abs(std - holder.schedule.init_noise_sigma) / holder.schedule.init_noise_sigma < 0.1


def test_run_diffusion_full_and_injected(holder):
    te = holder.get_text_embedding("test prompt")
    lat0 = holder.get_noise(7)
    out = holder.run_diffusion(te, lat0)
    assert len(out) == holder.num_inference_steps
    assert all(o is not None for o in out)
    # injected run starting from step 2 reproduces the tail of the full run
    out2 = holder.run_diffusion(te, out[1], idx_start=2)
    assert out2[0] is None and out2[1] is None
    np.testing.assert_allclose(
        np.asarray(out2[-1]), np.asarray(out[-1]), rtol=1e-4, atol=1e-4
    )


def test_latent2image(holder):
    te = holder.get_text_embedding("test")
    lat0 = holder.get_noise(0)
    img = holder.run_diffusion(te, lat0, return_image=True)
    assert img.shape == (128, 128, 3)
    assert img.dtype == np.uint8


def test_set_dimensions_rounding(holder):
    holder.set_dimensions((130, 126))
    assert holder.width_img % 8 == 0 and holder.height_img % 8 == 0
    assert holder.width_latent == holder.width_img // 8
    holder.set_dimensions((128, 128))


def test_batched_matches_single(holder):
    te = holder.get_text_embedding("test")
    lat0 = jnp.concatenate([holder.get_noise(1), holder.get_noise(2)], axis=0)
    cond = holder._conditioning(te, 2)
    traj = holder.run_diffusion_batched(cond, lat0)
    single0 = holder.run_diffusion(te, lat0[0:1])
    np.testing.assert_allclose(
        np.asarray(traj[-1, 0]), np.asarray(single0[-1][0]), rtol=1e-4, atol=1e-4
    )


def test_benchmark_speed(holder):
    dt_unet, dt_vae = holder.benchmark_speed()
    assert dt_unet > 0 and dt_vae > 0


def test_prepare_mixing_compat(holder):
    # float → per-step list (reference dh:146-156)
    out = holder.prepare_mixing(0.5, [None] * holder.num_inference_steps)
    assert out == [0.5] * holder.num_inference_steps
    # list validated for length
    with pytest.raises(AssertionError):
        holder.prepare_mixing([0.5, 0.5], None)
    with pytest.raises(ValueError):
        holder.prepare_mixing("bogus", None)


def test_init_types_compat(holder):
    info = holder.init_types()
    assert info["is_sdxl_turbo"] is True
