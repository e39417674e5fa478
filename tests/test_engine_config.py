"""EngineConfig: the unified config dataclass (SURVEY §5 / VERDICT #31)."""
import jax.numpy as jnp
import numpy as np

from latentblending_tpu.engine.blending import BlendingEngine
from latentblending_tpu.engine.config import EngineConfig
from latentblending_tpu.runtime.holder import SDXLHolder


def _engine(**kw):
    dh = SDXLHolder.from_random("tiny-turbo", dtype=jnp.float32)
    return BlendingEngine(dh, run_benchmark=False, **kw)


def test_default_tables_match_reference():
    t = EngineConfig.defaults(is_sdxl_turbo=True)
    assert (t.num_inference_steps, t.guidance_scale, t.width) == (4, 0.0, 512)
    assert (t.parental_crossfeed_power, t.parental_crossfeed_range, t.parental_crossfeed_decay) == (1.0, 1.0, 1.0)
    b = EngineConfig.defaults(is_sdxl_turbo=False)
    assert (b.num_inference_steps, b.guidance_scale, b.width) == (30, 4.0, 1024)
    assert (b.parental_crossfeed_power, b.parental_crossfeed_range, b.parental_crossfeed_decay) == (0.3, 0.6, 0.9)
    assert b.t_compute_max_allowed == 20.0  # reference blending_engine.py:289


def test_config_roundtrip_through_engine():
    be = _engine()
    cfg = EngineConfig(
        num_inference_steps=6, guidance_scale=2.0, guidance_rescale=0.3,
        branch1_crossfeed_power=0.4, branch1_crossfeed_range=0.5, branch1_crossfeed_decay=0.6,
        parental_crossfeed_power=0.7, parental_crossfeed_range=0.8, parental_crossfeed_decay=0.9,
        negative_prompt="ugly", seed1=7, seed2=8, nmb_max_branches=4, stem_batch=2,
    )
    be.apply_config(cfg)
    assert be.num_inference_steps == 6
    assert be.guidance_scale_base == 2.0
    assert be.dh.guidance_rescale == 0.3
    assert be.branch1_crossfeed_power == 0.4
    assert be.parental_crossfeed_decay == 0.9
    assert be.negative_prompt == "ugly"
    assert (be.seed1, be.seed2) == (7, 8)
    assert be.stem_batch == 2
    got = be.get_config()
    for f in (
        "num_inference_steps", "guidance_scale", "guidance_rescale",
        "branch1_crossfeed_power", "branch1_crossfeed_range", "branch1_crossfeed_decay",
        "parental_crossfeed_power", "parental_crossfeed_range", "parental_crossfeed_decay",
        "negative_prompt", "seed1", "seed2", "nmb_max_branches", "stem_batch",
    ):
        assert getattr(got, f) == getattr(cfg, f), f


def test_constructor_accepts_config():
    be = _engine(config=EngineConfig(num_inference_steps=5, nmb_max_branches=3))
    assert be.num_inference_steps == 5
    assert sum(be.list_nmb_stems) == 3
    # and the plan was re-derived for N=5
    assert all(i < 5 for i in be.list_idx_injection)


def test_config_similarity_metric_roundtrip():
    import jax.numpy as jnp

    from latentblending_tpu.engine.blending import BlendingEngine
    from latentblending_tpu.engine.config import EngineConfig
    from latentblending_tpu.models.perceptual import NLPDScorer
    from latentblending_tpu.runtime.holder import SDXLHolder

    from latentblending_tpu.models.lpips import LPIPSScorer

    dh = SDXLHolder.from_random("tiny-turbo", dtype=jnp.float32)
    be = BlendingEngine(dh, run_benchmark=False)
    cfg = be.get_config()
    # weight-free default is the principled metric, not the LPIPS stand-in
    assert cfg.similarity_metric == "nlpd"
    assert isinstance(be.lpips, NLPDScorer)
    cfg.similarity_metric = "lpips"
    be.apply_config(cfg)
    assert isinstance(be.lpips, LPIPSScorer)
    assert be.get_config().similarity_metric == "lpips"
    # None in a config keeps the current metric
    cfg.similarity_metric = None
    be.apply_config(cfg)
    assert be.get_config().similarity_metric == "lpips"
