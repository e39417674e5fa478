"""latentblending_tpu — TPU-native latent blending framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
lunarring/latentblending: perceptually smooth video transitions between
text prompts via a diffusion tree of spherically-interpolated SDXL latent
trajectories, batched and sharded over TPU meshes.
"""

__version__ = "0.1.0"

from latentblending_tpu.ops import (
    interpolate_linear,
    interpolate_spherical,
    interpolate_spherical_batched,
)


def __getattr__(name):
    # Lazy heavyweight imports so `import latentblending_tpu` stays cheap.
    if name == "BlendingEngine":
        from latentblending_tpu.engine.blending import BlendingEngine

        return BlendingEngine
    if name in ("SDXLHolder", "DiffusersHolder"):
        # DiffusersHolder: drop-in alias easing migration from the reference
        # package (its L1 class of the same name)
        from latentblending_tpu.runtime.holder import SDXLHolder

        return SDXLHolder
    if name == "add_frames_linear_interp":
        from latentblending_tpu.video.frames import add_frames_linear_interp

        return add_frames_linear_interp
    if name == "EngineConfig":
        from latentblending_tpu.engine.config import EngineConfig

        return EngineConfig
    if name in ("Keyframe", "MovieProject", "run_multi_transition"):
        # chained/looping movie sessions (JSON movie projects)
        import latentblending_tpu.engine.session as _s

        return getattr(_s, name)
    if name in ("MovieSaver", "concatenate_movies", "read_movie_frames"):
        # the reference user gets these from lunar_tools; exported here so
        # switching needs one import line (reference blending_engine.py:13)
        import latentblending_tpu.video.writer as _w

        return getattr(_w, name)
    if name in ("get_spacing", "get_time", "yml_load", "yml_save"):
        # reference package __init__ exports these utils — drop-in parity
        import latentblending_tpu.utils as _u

        return getattr(_u, name)
    raise AttributeError(name)


__all__ = [
    "BlendingEngine",
    "EngineConfig",
    "SDXLHolder",
    "DiffusersHolder",
    "interpolate_spherical",
    "interpolate_spherical_batched",
    "interpolate_linear",
    "add_frames_linear_interp",
    "Keyframe",
    "MovieProject",
    "run_multi_transition",
    "MovieSaver",
    "concatenate_movies",
    "read_movie_frames",
    "get_spacing",
    "get_time",
    "yml_load",
    "yml_save",
]
