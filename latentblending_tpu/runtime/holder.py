"""SDXLHolder — the diffusion runtime (reference L1: DiffusersHolder,
latentblending/diffusers_holder.py:20-366), rebuilt TPU-native.

Where the reference wraps a diffusers pipeline object, this holder OWNS the
whole stack: flax UNet/VAE/CLIP modules + converted params, our scheduler
tables, our tokenizer, and a cache of jitted denoise variants. All compute
entry points are jit-compiled pure functions; the holder itself is a thin
stateful shell (dims, steps, negative prompt) exactly like the reference's
setter surface (set_num_inference_steps dh:51, set_dimensions dh:55,
set_negative_prompt dh:68, get_text_embedding dh:79, get_noise dh:98,
latent2image dh:114, run_diffusion dh:158/172).

Fidelity decisions vs the reference (SURVEY.md §3.6):
- add_time_ids encode the REAL output size, fixing the reference's
  default_sample_size bug (dh:216-217) while keeping output size behavior.
- get_noise uses jax.random (seeded PRNGKey); per-seed bit parity with
  torch RNG is impossible — fidelity is defined on outputs (LPIPS).
- the VAE honors force_upcast by running in float32 (dh:129-139).
"""
from __future__ import annotations

import dataclasses
import functools
import os
import time
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from latentblending_tpu.models import configs as C
from latentblending_tpu.models.clip import CLIPTextEncoder
from latentblending_tpu.models.tokenizer import CLIPTokenizer, HashTokenizer
from latentblending_tpu.models.unet import UNet2DCondition
from latentblending_tpu.models.vae import VAE
from latentblending_tpu.ops.scheduler import (
    SDXL_BASE_SCHEDULER,
    SDXL_TURBO_EULER_SCHEDULER,
    SDXL_TURBO_SCHEDULER,
    SchedulerState,
    make_schedule,
    scheduler_config_from_hf,
)
from latentblending_tpu.runtime.denoise import (
    Conditioning,
    DenoisePlan,
    DenoiseRunner,
    build_mix_inputs,
)

VAE_SCALE_FACTOR = 8


@dataclasses.dataclass(frozen=True)
class ModelSpec:
    """Architecture bundle for one SDXL variant."""

    name: str
    unet: C.UNetConfig
    vae: C.VAEConfig
    clip1: C.CLIPTextConfig
    clip2: C.CLIPTextConfig
    scheduler: Any
    is_sdxl_turbo: bool
    default_size: tuple[int, int]


SDXL_TURBO = ModelSpec(
    "sdxl-turbo", C.SDXL_TURBO_UNET, C.SDXL_VAE, C.SDXL_CLIP_L, C.SDXL_CLIP_BIGG,
    SDXL_TURBO_SCHEDULER, True, (512, 512),
)
SDXL_BASE = ModelSpec(
    "sdxl-base", C.SDXL_BASE_UNET, C.SDXL_VAE, C.SDXL_CLIP_L, C.SDXL_CLIP_BIGG,
    SDXL_BASE_SCHEDULER, False, (1024, 1024),
)
# tiny test specs stay on the deterministic Euler variant so semantics
# tests have a closed-form reference; tiny-ancestral exercises the
# sdxl-turbo-shipped EulerAncestral path
TINY_TURBO = ModelSpec(
    "tiny-turbo", C.TINY_UNET, C.TINY_VAE, C.TINY_CLIP, C.TINY_CLIP_PROJ,
    SDXL_TURBO_EULER_SCHEDULER, True, (128, 128),
)
TINY_ANCESTRAL = ModelSpec(
    "tiny-ancestral", C.TINY_UNET, C.TINY_VAE, C.TINY_CLIP, C.TINY_CLIP_PROJ,
    SDXL_TURBO_SCHEDULER, True, (128, 128),
)
TINY_BASE = ModelSpec(
    "tiny-base", C.TINY_UNET, C.TINY_VAE, C.TINY_CLIP, C.TINY_CLIP_PROJ,
    SDXL_BASE_SCHEDULER, False, (128, 128),
)

SPECS = {s.name: s for s in (SDXL_TURBO, SDXL_BASE, TINY_TURBO, TINY_ANCESTRAL, TINY_BASE)}


class SDXLHolder:
    def __init__(
        self,
        spec: ModelSpec | str,
        params: dict,
        tokenizer1=None,
        tokenizer2=None,
        dtype=jnp.bfloat16,
        vae_dtype=None,
        mesh=None,
    ):
        """params: {'unet':…, 'vae':…, 'clip1':…, 'clip2':…} flax param trees.

        vae_dtype: the reference force-upcasts the VAE to f32 because fp16
        OVERFLOWS there (dh:129-139). bfloat16 shares float32's exponent
        range, so the overflow rationale doesn't apply on TPU — default is
        bf16 compute on TPU (HBM-bandwidth-bound decode runs ~2× faster),
        f32 elsewhere. Pass jnp.float32 to force the reference behavior."""
        if vae_dtype is None:
            vae_dtype = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
        self.spec = spec if isinstance(spec, ModelSpec) else SPECS[spec]
        self.dtype = dtype
        self.is_sdxl_turbo = self.spec.is_sdxl_turbo
        self.mesh = mesh

        self.unet = UNet2DCondition(self.spec.unet, dtype=dtype, param_dtype=dtype)
        self.vae = VAE(self.spec.vae, dtype=vae_dtype, param_dtype=vae_dtype)
        self.clip1 = CLIPTextEncoder(self.spec.clip1)
        self.clip2 = CLIPTextEncoder(self.spec.clip2)
        self.params = params
        self._decode_chunk_override: int | None = None
        self._vae_dtype = vae_dtype
        self.last_run_was_warm = False

        v = self.spec.clip1.vocab_size
        self.tokenizer1 = tokenizer1 or HashTokenizer(
            v, bos_token_id=0, eos_token_id=self.spec.clip1.eos_token_id, pad_token_id=self.spec.clip1.eos_token_id
        )
        self.tokenizer2 = tokenizer2 or HashTokenizer(
            self.spec.clip2.vocab_size, bos_token_id=0, eos_token_id=self.spec.clip2.eos_token_id, pad_token_id=0
        )

        self.negative_prompt = ""
        self.guidance_scale = 0.0 if self.is_sdxl_turbo else 4.0
        # CFG rescale factor (reference dh:172,:351-353) — 0.0 disables
        self.guidance_rescale = 0.0
        # seed base for ancestral per-step noise (euler_ancestral scheduler).
        # The reference draws this from torch's GLOBAL RNG — irreproducible
        # (dh:356 passes no generator); here it is deterministic: the engine
        # folds the transition seeds in (reset_noise_stream) so re-running a
        # transition reproduces it, while successive denoise calls at the
        # same injection level still draw DISTINCT noise (call counter).
        self.noise_seed_base = 0
        self._noise_call = 0
        self.num_inference_steps = 4 if self.is_sdxl_turbo else 30
        self.schedule: SchedulerState = make_schedule(self.spec.scheduler, self.num_inference_steps)
        self.set_dimensions(self.spec.default_size)

        unet_apply = lambda p, lat, t, pe, pool, tids: self.unet.apply(
            {"params": p}, lat, t, pe, pool, tids
        )
        self.runner = DenoiseRunner(unet_apply)

        self._encode_jit = jax.jit(self._encode_prompt_fn)
        self._decode_jit = jax.jit(
            lambda p, lat: self.vae.apply(
                {"params": p}, lat.astype(jnp.float32) / self.spec.vae.scaling_factor, method=VAE.decode
            )
        )

    # ------------------------------------------------------------- factories

    @classmethod
    def from_random(cls, spec: ModelSpec | str = "tiny-turbo", seed: int = 0, dtype=jnp.bfloat16, **kw):
        """Random-weight holder (structure-true): dev/bench without checkpoints.

        The four tower inits run as ONE jitted program each: eager flax init
        dispatches every param tensor separately — ~1,700 round-trips on a
        relay transport ≈ 0.2 s each = 5-6 min of process setup (measured,
        BENCH.md round 3). Jitted, init is one dispatch and the compiled
        program lands in the persistent compilation cache."""
        spec = spec if isinstance(spec, ModelSpec) else SPECS[spec]
        keys = jax.random.split(jax.random.PRNGKey(seed), 4)
        unet = UNet2DCondition(spec.unet, dtype=dtype, param_dtype=dtype)
        h = spec.unet.sample_size
        ctx_dim = spec.unet.cross_attention_dim
        pooled_dim = spec.clip2.projection_dim or spec.clip2.hidden_size
        # local_devices, NOT devices: in a multi-process run devices()[0] is
        # process 0's device — non-addressable elsewhere (computations pinned
        # to it crash the backend; found by the 2-process CPU smoke test)
        with jax.default_device(jax.local_devices()[0]):
            unet_params = jax.jit(unet.init)(
                keys[0], jnp.zeros((1, h, h, 4), dtype), jnp.float32(0.0),
                jnp.zeros((1, 77, ctx_dim), dtype), jnp.zeros((1, pooled_dim), dtype), jnp.zeros((1, 6), dtype),
            )["params"]
            vae = VAE(spec.vae, dtype=jnp.float32, param_dtype=jnp.float32)
            vae_params = jax.jit(functools.partial(vae.init, method=VAE.full))(
                keys[1], jnp.zeros((1, 8, 8, 4)), jnp.zeros((1, 64, 64, 3))
            )["params"]
            # CLIP params stored bf16 (halves the ~3.3GB f32 tower footprint;
            # compute stays f32 via module dtype — promotion at use)
            clip1 = CLIPTextEncoder(spec.clip1, param_dtype=dtype)
            clip1_params = jax.jit(clip1.init)(keys[2], jnp.zeros((1, 77), jnp.int32))["params"]
            clip2 = CLIPTextEncoder(spec.clip2, param_dtype=dtype)
            clip2_params = jax.jit(clip2.init)(keys[3], jnp.zeros((1, 77), jnp.int32))["params"]
        params = {"unet": unet_params, "vae": vae_params, "clip1": clip1_params, "clip2": clip2_params}
        return cls(spec, params, dtype=dtype, **kw)

    @classmethod
    def from_pretrained(cls, snapshot_dir: str, spec: ModelSpec | str | None = None, dtype=jnp.bfloat16, **kw):
        """Load a HF snapshot directory (unet/, vae/, text_encoder/,
        text_encoder_2/, tokenizer/, tokenizer_2/ with safetensors)."""
        from latentblending_tpu.models.weights import load_clip, load_sdxl_unet, load_sdxl_vae

        if spec is None:
            spec = SDXL_TURBO if "turbo" in snapshot_dir.lower() else SDXL_BASE
        spec = spec if isinstance(spec, ModelSpec) else SPECS[spec]
        # the reference's scheduler behavior is defined by the checkpoint's
        # scheduler_config.json, not by code (dh:330,:356 drive pipe.scheduler)
        # — honor it
        import json

        sched_fp = os.path.join(snapshot_dir, "scheduler", "scheduler_config.json")
        if os.path.isfile(sched_fp):
            with open(sched_fp) as f:
                spec = dataclasses.replace(
                    spec, scheduler=scheduler_config_from_hf(json.load(f), spec.scheduler)
                )
        params = {
            "unet": load_sdxl_unet(snapshot_dir, dtype),
            "vae": load_sdxl_vae(snapshot_dir, jnp.float32),
            # bf16 storage, f32 compute (promotion) — fidelity loss is far
            # below the bf16 UNet's own noise floor
            "clip1": load_clip(snapshot_dir, "text_encoder", dtype),
            "clip2": load_clip(snapshot_dir, "text_encoder_2", dtype),
        }
        tok1 = tok2 = None
        if os.path.isdir(os.path.join(snapshot_dir, "tokenizer")):
            tok1 = CLIPTokenizer.from_dir(os.path.join(snapshot_dir, "tokenizer"))
        if os.path.isdir(os.path.join(snapshot_dir, "tokenizer_2")):
            tok2 = CLIPTokenizer.from_dir(os.path.join(snapshot_dir, "tokenizer_2"))
        return cls(spec, params, tokenizer1=tok1, tokenizer2=tok2, dtype=dtype, **kw)

    # --------------------------------------------------------- param caching

    def save_params(self, ckpt_dir: str):
        """Persist converted params with orbax so HF→flax conversion is paid
        once (no reference counterpart — weights there reload via diffusers
        every process start)."""
        import orbax.checkpoint as ocp

        ckpt = ocp.StandardCheckpointer()
        ckpt.save(os.path.abspath(ckpt_dir), self.params, force=True)
        ckpt.wait_until_finished()

    @classmethod
    def from_checkpoint(cls, ckpt_dir: str, spec: ModelSpec | str, dtype=jnp.bfloat16, **kw):
        import orbax.checkpoint as ocp

        ckpt = ocp.StandardCheckpointer()
        params = ckpt.restore(os.path.abspath(ckpt_dir))
        return cls(spec, params, dtype=dtype, **kw)

    # ----------------------------------------------------------------- state

    def init_types(self):
        """Reference-compat (dh:38-48): the dtype probe and turbo detection
        the reference performs at runtime are static properties of the
        ModelSpec here — this just mirrors the attributes."""
        return {"dtype": self.dtype, "is_sdxl_turbo": self.is_sdxl_turbo}

    def prepare_mixing(self, mixing_coeffs, list_latents_mixing):
        """Reference-compat (dh:146-156): normalize mixing_coeffs to a
        per-step list and validate the mixing trajectory's length."""
        if isinstance(mixing_coeffs, float):
            list_mixing_coeffs = self.num_inference_steps * [mixing_coeffs]
        elif isinstance(mixing_coeffs, (list, tuple, np.ndarray)):
            assert len(mixing_coeffs) == self.num_inference_steps, (
                f"len(mixing_coeffs) {len(mixing_coeffs)} != num_inference_steps {self.num_inference_steps}"
            )
            list_mixing_coeffs = list(mixing_coeffs)
        else:
            raise ValueError("mixing_coeffs should be float or list with len=num_inference_steps")
        if np.sum(list_mixing_coeffs) > 0:
            assert len(list_latents_mixing) == self.num_inference_steps
        return list_mixing_coeffs

    def set_num_inference_steps(self, num_inference_steps: int):
        self.num_inference_steps = int(num_inference_steps)
        self.schedule = make_schedule(self.schedule.config, self.num_inference_steps)

    def reset_noise_stream(self, seed_base: int):
        """Restart the deterministic ancestral-noise stream (call at the top
        of each transition so re-runs reproduce exactly)."""
        self.noise_seed_base = int(seed_base)
        self._noise_call = 0

    def set_scheduler_type(self, scheduler_type: str):
        """Switch the solver: 'euler' | 'euler_ancestral' | 'dpmpp_2m'.

        The checkpoint default (from_pretrained reads its
        scheduler_config.json) matches the reference; dpmpp_2m is the
        beyond-reference option — comparable quality at roughly half the
        steps (pair with set_num_inference_steps)."""
        assert scheduler_type in ("euler", "euler_ancestral", "dpmpp_2m"), scheduler_type
        import dataclasses as _dc

        cfg = _dc.replace(self.schedule.config, scheduler_type=scheduler_type)
        self.schedule = make_schedule(cfg, self.num_inference_steps)

    def set_dimensions(self, size_output: Optional[tuple[int, int]] = None):
        s = VAE_SCALE_FACTOR
        if size_output is None:
            size_output = self.spec.default_size
        width, height = size_output
        self.width_img = int(round(width / s) * s)
        self.height_img = int(round(height / s) * s)
        self.width_latent = self.width_img // s
        self.height_latent = self.height_img // s

    @property
    def decode_chunk(self) -> int:
        """VAE decode batch per device call, set from on-chip measurement
        (tools/profile_vae.py, v5e): at ≤512² batching wins — B=8 runs at
        0.032 s/img (40% MFU) vs 0.067 at B=1 — but at 1024² it LOSES:
        B=1 is 0.200 s/img (27% MFU) vs 0.248 at B=4, because the decoder's
        full-res activations (H·W·128ch·B bf16 through two 2× upsample
        stages ≈ 256 MB/img at 1024²) blow past what v5e HBM can hold
        alongside the 5.1 GB UNet + text towers, and XLA trades MXU
        utilization for spills. Chunk=1 at 1024² also lets the per-chunk
        decode→convert→fetch pipeline ship the first keyframes earlier."""
        if self._decode_chunk_override is not None:
            return self._decode_chunk_override
        env = os.environ.get("LB_DECODE_CHUNK")
        if env:
            return max(1, int(env))
        base = 8 if self._vae_dtype == jnp.bfloat16 else 4
        area = self.height_img * self.width_img
        if area >= 1024 * 1024:
            return 1
        if area <= 512 * 512:
            return base
        return max(1, base // 4)

    @decode_chunk.setter
    def decode_chunk(self, value: int):
        self._decode_chunk_override = int(value)

    def set_negative_prompt(self, negative_prompt):
        if isinstance(negative_prompt, (list, tuple)):
            negative_prompt = negative_prompt[0] if negative_prompt else ""
        self.negative_prompt = negative_prompt

    # ------------------------------------------------------------ text path

    def _encode_prompt_fn(self, clip1_params, clip2_params, ids1, ids2):
        pen1, _, _ = self.clip1.apply({"params": clip1_params}, ids1)
        pen2, _, pooled2 = self.clip2.apply({"params": clip2_params}, ids2)
        embeds = jnp.concatenate([pen1, pen2], axis=-1)
        return embeds, pooled2

    def get_text_embedding(self, prompt: str):
        """Returns (prompt_embeds, negative_prompt_embeds, pooled,
        negative_pooled) — the 4-tuple contract of reference dh:239-244."""
        ids1 = jnp.asarray(self.tokenizer1([prompt, self.negative_prompt]))
        ids2 = jnp.asarray(self.tokenizer2([prompt, self.negative_prompt]))
        embeds, pooled = self._encode_jit(self.params["clip1"], self.params["clip2"], ids1, ids2)
        return (
            embeds[0:1].astype(self.dtype),
            embeds[1:2].astype(self.dtype),
            pooled[0:1].astype(self.dtype),
            pooled[1:2].astype(self.dtype),
        )

    # ----------------------------------------------------------- noise path

    def get_noise(self, seed: int = 420) -> jax.Array:
        """[1, h_lat, w_lat, 4] seeded gaussian × init_noise_sigma (dh:98-110)."""
        key = jax.random.PRNGKey(int(seed))
        lat = jax.random.normal(key, (1, self.height_latent, self.width_latent, 4), jnp.float32)
        return (lat * self.schedule.init_noise_sigma).astype(self.dtype)

    def default_time_ids(self, batch: int) -> jax.Array:
        """SDXL micro-conditioning: (orig_h, orig_w, crop_top, crop_left,
        target_h, target_w) — real output size (fixes reference dh:216-217)."""
        tid = jnp.array(
            [[self.height_img, self.width_img, 0, 0, self.height_img, self.width_img]], jnp.float32
        )
        return jnp.tile(tid, (batch, 1)).astype(self.dtype)

    @property
    def do_classifier_free_guidance(self) -> bool:
        return self.guidance_scale > 1.0

    # --------------------------------------------------------- decode path

    def latent2image(self, latents: jax.Array, output_type: str = "np"):
        """Final latent → uint8 image (dh:114-143). latents [h,w,4] or [1,h,w,4]."""
        if latents.ndim == 3:
            latents = latents[None]
        img = self._decode_jit(self.params["vae"], latents)
        img = np.asarray(jnp.clip(img / 2 + 0.5, 0.0, 1.0) * 255.0).round().astype(np.uint8)[0]
        if output_type == "pil":
            from PIL import Image

            return Image.fromarray(img)
        return img

    def decode_to_pm1_batched(self, latents: jax.Array) -> jax.Array:
        """[B,h,w,4] → [B,H,W,3] float images in [-1,1], on device (feeds
        LPIPS without a host round-trip). Chunked so full-res decoder
        activations stay bounded; every chunk is padded up to a power-of-two
        bucket so the compiled-variant count is bounded (≤ log2(chunk)+1)
        instead of one per distinct batch size."""
        outs = []
        B = latents.shape[0]
        c = max(1, self.decode_chunk)
        for i in range(0, B, c):
            chunk = latents[i : i + c]
            n = chunk.shape[0]
            bucket = 1
            while bucket < n:
                bucket *= 2
            pad = bucket - n
            if pad:
                chunk = jnp.concatenate([chunk, jnp.repeat(chunk[-1:], pad, axis=0)], axis=0)
            img = self._decode_jit(self.params["vae"], chunk)
            if pad:
                img = img[:n]
            outs.append(jnp.clip(img, -1.0, 1.0))
        return outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=0)

    @staticmethod
    def to_uint8_device(imgs_pm1: jax.Array) -> jax.Array:
        """[-1,1] → uint8, still on device (lets callers overlap the host
        copy with other device work via copy_to_host_async)."""
        return (jnp.clip(imgs_pm1 / 2 + 0.5, 0.0, 1.0) * 255.0 + 0.5).astype(jnp.uint8)

    @staticmethod
    @jax.jit
    def to_i420_device(imgs_pm1: jax.Array) -> jax.Array:
        """[-1,1] [B,H,W,3] → packed I420 uint8 [B, H*3/2, W], on device.

        Keyframes leave the chip as 4:2:0 YCbCr planes: 1.5 B/px instead
        of 3 halves the device→host transfer, and the RGB→YCbCr convert +
        chroma subsample ride the accelerator instead of the host encoder
        (VERDICT r3 task 3). JFIF full-range BT.601 (ITU-T T.871 §7) —
        exactly what the JPEG/x264 encoders downstream use, so for movie
        output this is the subsampling they would have performed anyway.
        Layout matches video/i420.py (differential-tested against its
        host reference). Requires H % 4 == 0 and W % 2 == 0.
        """
        rgb = jnp.clip(imgs_pm1 * 0.5 + 0.5, 0.0, 1.0) * 255.0
        r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = 128.0 - 0.168735892 * r - 0.331264108 * g + 0.5 * b
        cr = 128.0 + 0.5 * r - 0.418687589 * g - 0.081312411 * b
        B, H, W = y.shape
        pool = lambda c: c.reshape(B, H // 2, 2, W // 2, 2).mean(axis=(2, 4))  # noqa: E731
        u8 = lambda x: jnp.clip(x + 0.5, 0.0, 255.0).astype(jnp.uint8)  # noqa: E731
        return jnp.concatenate(
            [u8(y), u8(pool(cb)).reshape(B, H // 4, W), u8(pool(cr)).reshape(B, H // 4, W)],
            axis=1,
        )

    @staticmethod
    def pm1_to_uint8(imgs_pm1: jax.Array) -> np.ndarray:
        """[-1,1] device images → host uint8 [B,H,W,3] (one transfer)."""
        return np.asarray(SDXLHolder.to_uint8_device(imgs_pm1))

    def latents2images_batched(self, latents: jax.Array) -> list[np.ndarray]:
        """[B,h,w,4] → list of uint8 images via chunked batched decodes."""
        arr = self.pm1_to_uint8(self.decode_to_pm1_batched(latents))
        return [arr[i] for i in range(arr.shape[0])]

    # --------------------------------------------------------- encode path

    def image2latent(self, image) -> jax.Array:
        """uint8/PIL image → scaled latent [1,h,w,4] (posterior mean).

        Extension beyond the reference (no encoder use there); enables real
        image keyframes (engine.set_keyframe1_image)."""
        img = np.asarray(image)
        if img.shape[:2] != (self.height_img, self.width_img):
            import cv2

            img = cv2.resize(img, (self.width_img, self.height_img), interpolation=cv2.INTER_AREA)
        x = jnp.asarray(img, jnp.float32)[None] / 255.0 * 2.0 - 1.0
        if not hasattr(self, "_encode_img_jit"):
            self._encode_img_jit = jax.jit(
                lambda p, im: self.vae.apply({"params": p}, im, method=VAE.encode)[0]
            )
        mean = self._encode_img_jit(self.params["vae"], x)
        return (mean * self.spec.vae.scaling_factor).astype(self.dtype)

    # -------------------------------------------------------- denoise paths

    def _conditioning(self, text_embeddings, batch: int) -> Conditioning:
        pe, ne, pool, npool = text_embeddings
        rep = lambda x: jnp.tile(jnp.asarray(x, self.dtype), (batch,) + (1,) * (jnp.ndim(x) - 1)) if x.shape[0] == 1 else jnp.asarray(x, self.dtype)
        tids = self.default_time_ids(batch)
        return Conditioning(
            prompt_embeds=rep(pe),
            pooled_embeds=rep(pool),
            time_ids=tids,
            neg_prompt_embeds=rep(ne),
            neg_pooled_embeds=rep(npool),
            neg_time_ids=tids,
        )

    def run_diffusion_batched(
        self,
        cond: Conditioning,
        latents_start: jax.Array,  # [B,h,w,4]
        idx_start: int = 0,
        mix_traj=None,  # [N,B,h,w,4]
        mixing_coeffs=None,  # [N] or [N,B]
        guidance_scale=None,  # [B] or None
        guidance_rescale=None,  # float or None (→ holder default)
    ) -> jax.Array:
        """One batched denoise over [idx_start, N); returns traj [M,B,h,w,4].

        With a mesh set, the stem batch is padded up to a multiple of the
        'data' axis (pad_to_multiple) so sharding NEVER silently degrades to
        one device (VERDICT weak #3), and UNet params are Megatron-sharded
        over the 'model' axis when it is >1 (parallel/tp.py)."""
        B = latents_start.shape[0]
        N = self.num_inference_steps
        use_cfg = self.do_classifier_free_guidance
        if guidance_scale is None:
            guidance_scale = jnp.full((B,), self.guidance_scale, jnp.float32)
        if guidance_rescale is None:
            guidance_rescale = self.guidance_rescale
        mw, mc = build_mix_inputs(N, idx_start, mix_traj, mixing_coeffs, latents_start)
        latents_start = latents_start.astype(self.dtype)
        B_run = B
        if self.mesh is not None:
            from latentblending_tpu.parallel.mesh import (
                pad_to_multiple,
                replicate_params,
                shard_stem_batch,
            )

            n_data = self.mesh.shape["data"]
            B_run = pad_to_multiple(B, n_data)
            if B_run != B:
                pad_rows = lambda x: jnp.concatenate(
                    [x] + [x[-1:]] * (B_run - B), axis=0
                )
                latents_start = pad_rows(latents_start)
                cond = jax.tree_util.tree_map(pad_rows, cond)
                guidance_scale = pad_rows(jnp.asarray(guidance_scale))
                mw = jnp.concatenate([mw] + [mw[:, -1:]] * (B_run - B), axis=1)
                mc = jnp.concatenate([mc] + [mc[:, -1:]] * (B_run - B), axis=1)
            if not getattr(self, "_params_placed", False):
                if self.mesh.shape.get("model", 1) > 1:
                    from latentblending_tpu.parallel.tp import shard_unet_params

                    self.params["unet"] = shard_unet_params(self.params["unet"], self.mesh)
                else:
                    self.params["unet"] = replicate_params(self.params["unet"], self.mesh)
                self._params_placed = True
            latents_start = shard_stem_batch(latents_start, self.mesh)
            cond = shard_stem_batch(cond, self.mesh)
            from latentblending_tpu.parallel.mesh import _put_global

            mw = _put_global(
                mw, jax.sharding.NamedSharding(self.mesh, jax.sharding.PartitionSpec(None, "data"))
            )
        plan = DenoisePlan(
            num_steps=N, idx_start=idx_start, batch=B_run, use_cfg=use_cfg,
            guidance_rescale=float(guidance_rescale) if use_cfg else 0.0,
            sched=self.schedule.config.scheduler_type,
        )
        # per-step ancestral noise keys: deterministic in (seed base, call
        # index) — a transition re-run with the same seeds reproduces every
        # trajectory, while sibling stems issued as separate calls at the
        # same injection level (stem_batch=1 / chunked rounds) each get
        # fresh noise
        step_keys = jax.random.split(
            jax.random.fold_in(jax.random.PRNGKey(int(self.noise_seed_base)), self._noise_call),
            plan.exec_steps,
        )
        self._noise_call += 1
        # warm-plan marker: timing callers must not fold compile time into
        # the per-step estimate that feeds the budget planner
        self.last_run_was_warm = self.runner.is_warm(plan)
        from latentblending_tpu.ops.flops import unet_forward_flops

        flops = plan.exec_steps * unet_forward_flops(
            self.spec.unet,
            latents_start.shape[1],
            latents_start.shape[2],
            B_run * (2 if use_cfg else 1),
        )
        traj = self.runner.run(
            plan, self.params["unet"], latents_start, cond, mw, mc, self.schedule, guidance_scale,
            flops=flops, step_keys=step_keys,
        )
        return traj[:, :B] if B_run != B else traj

    def run_tree_batched(
        self,
        cond: Conditioning,
        latents_start: jax.Array,  # [B,h,w,4] — edges then stems
        parent_idx,  # [B,2] int — in-batch parent rows (self for edges)
        parent_fract,  # [B] float — parental slerp fraction per row
        coeffs,  # [N,B] float — crossfeed coefficient per (step,row)
        guidance_scale=None,  # [B] or None
        win_steps=None,  # [N,h,w,4] recycled-edge entering-states, or None
        win_mask=None,  # [B] bool — rows whose parent-1 is the window
        pin_steps=None,  # [B] int — injection step per row (0 = edge)
    ) -> jax.Array:
        """ONE fused scan over [0,N) computing the edge trajectories AND all
        stems of a single-level plan (denoise_scan_tree). Crossfeed targets
        are live parental slerps of in-batch rows — no precomputed windows,
        no per-level dispatch chain (win_steps optionally substitutes a
        RECYCLED edge trajectory for parent-1 of masked rows, the chained-
        transition case). Single-device path: the in-batch row gather would
        all-gather a 'data'-sharded batch, so mesh holders use
        run_diffusion_batched per level instead."""
        assert self.mesh is None, "fused tree scan is a single-device path"
        B = latents_start.shape[0]
        N = self.num_inference_steps
        use_cfg = self.do_classifier_free_guidance
        if guidance_scale is None:
            guidance_scale = jnp.full((B,), self.guidance_scale, jnp.float32)
        plan = DenoisePlan(
            num_steps=N, idx_start=0, batch=B, use_cfg=use_cfg,
            guidance_rescale=float(self.guidance_rescale) if use_cfg else 0.0,
            sched=self.schedule.config.scheduler_type, tree=True,
            win=win_steps is not None,
        )
        step_keys = jax.random.split(
            jax.random.fold_in(jax.random.PRNGKey(int(self.noise_seed_base)), self._noise_call), N
        )
        self._noise_call += 1
        self.last_run_was_warm = self.runner.is_warm(plan)
        from latentblending_tpu.ops.flops import unet_forward_flops

        flops = N * unet_forward_flops(
            self.spec.unet, latents_start.shape[1], latents_start.shape[2],
            B * (2 if use_cfg else 1),
        )
        cw = np.asarray(coeffs, np.float32).copy()
        cw[0, :] = 0.0  # step 0 has no predecessor state to mix toward
        if pin_steps is None:
            pin_steps = np.zeros((B,), np.int32)
        return self.runner.run_tree(
            plan, self.params["unet"], latents_start.astype(self.dtype), cond,
            parent_idx, parent_fract, jnp.asarray(cw), self.schedule, guidance_scale,
            flops=flops, step_keys=step_keys,
            win_steps=None if win_steps is None else win_steps.astype(self.dtype),
            win_mask=win_mask, pin_steps=pin_steps,
        )

    def run_tree_seg_batched(
        self,
        cond: Conditioning,
        latents_start: jax.Array,  # [B0,h,w,4] — edge rows only
        parent_idx,  # [B,2] int — in-batch parent rows (self for edges)
        parent_fract,  # [B] float — parental slerp fraction per row
        coeffs,  # [N,B] float — crossfeed coefficient per (step,row)
        guidance_scale,  # [B]
        segs,  # ((start_step, batch), ...) — rows ordered by injection step
        win_steps=None,  # [N,h,w,4] recycled-edge entering-states, or None
        win_mask=None,  # [B] bool — rows whose parent-1 is the window
        pin_steps=None,  # [B] int — injection step per row (0 = edge)
    ) -> tuple:
        """ONE fused SEGMENTED scan computing a whole MULTI-level plan:
        sequential scan segments with a growing batch — each row executes
        only its useful steps, at the largest batch alive at its depth
        (denoise_scan_tree_seg). Replaces the per-level dispatch loop
        (reference blending_engine.py:354-362) at full depth. Single-device
        path, same reason as run_tree_batched."""
        assert self.mesh is None, "fused tree scan is a single-device path"
        B = int(parent_idx.shape[0])
        N = self.num_inference_steps
        use_cfg = self.do_classifier_free_guidance
        segs = tuple((int(i), int(b)) for i, b in segs)
        assert segs[0][0] == 0 and segs[-1][1] == B
        plan = DenoisePlan(
            num_steps=N, idx_start=0, batch=B, use_cfg=use_cfg,
            guidance_rescale=float(self.guidance_rescale) if use_cfg else 0.0,
            sched=self.schedule.config.scheduler_type, tree=True,
            win=win_steps is not None, segs=segs,
        )
        step_keys = jax.random.split(
            jax.random.fold_in(jax.random.PRNGKey(int(self.noise_seed_base)), self._noise_call), N
        )
        self._noise_call += 1
        self.last_run_was_warm = self.runner.is_warm(plan)
        from latentblending_tpu.ops.flops import unet_forward_flops

        h, w = latents_start.shape[1], latents_start.shape[2]
        flops = 0.0
        for s, (i0, Bs) in enumerate(segs):
            i1 = segs[s + 1][0] if s + 1 < len(segs) else N
            flops += (i1 - i0) * unet_forward_flops(
                self.spec.unet, h, w, Bs * (2 if use_cfg else 1)
            )
        cw = np.asarray(coeffs, np.float32).copy()
        cw[0, :] = 0.0  # step 0 has no predecessor state to mix toward
        if pin_steps is None:
            pin_steps = np.zeros((B,), np.int32)
        return self.runner.run_tree_seg(
            plan, self.params["unet"], latents_start.astype(self.dtype), cond,
            parent_idx, parent_fract, jnp.asarray(cw), self.schedule, guidance_scale,
            flops=flops, step_keys=step_keys,
            win_steps=None if win_steps is None else win_steps.astype(self.dtype),
            win_mask=win_mask, pin_steps=pin_steps,
        )

    def run_diffusion(
        self,
        text_embeddings,
        latents_start: jax.Array,
        idx_start: int = 0,
        list_latents_mixing=None,
        mixing_coeffs=0.0,
        return_image: bool = False,
        guidance_rescale: float | None = None,
    ):
        """Reference-compatible single-branch API (dh:158-366): returns the
        full-length latent list with None for skipped steps. guidance_rescale
        mirrors the reference's run_diffusion_sd_xl kwarg (dh:172,:351-353)."""
        N = self.num_inference_steps
        if isinstance(mixing_coeffs, float):
            coeffs = np.full(N, mixing_coeffs, np.float32)
        else:
            coeffs = np.asarray(mixing_coeffs, np.float32)
            assert len(coeffs) == N
        mix_traj = None
        if list_latents_mixing is not None and coeffs.sum() > 0:
            stacked = []
            for i in range(N):
                li = list_latents_mixing[i]
                stacked.append(jnp.zeros_like(latents_start) if li is None else jnp.asarray(li, self.dtype))
            mix_traj = jnp.stack(stacked, axis=0)
        cond = self._conditioning(text_embeddings, 1)
        traj = self.run_diffusion_batched(
            cond, latents_start, idx_start, mix_traj, coeffs if mix_traj is not None else None,
            guidance_rescale=guidance_rescale,
        )
        out: list = [None] * idx_start + [traj[j] for j in range(N - idx_start)]
        if return_image:
            return self.latent2image(out[-1])
        return out

    # API-parity alias (reference dh:172 names the SDXL loop explicitly)
    run_diffusion_sd_xl = run_diffusion

    # ------------------------------------------------------------- timing

    def benchmark_speed(self) -> tuple[float, float]:
        """Measure one compiled UNet step and one VAE decode — feeds the
        compute-budget planner (reference blending_engine.py:100-118)."""
        te = self.get_text_embedding("test")
        lat = self.get_noise(0)
        # warmup/compile: single step at the end of the schedule
        _ = self.run_diffusion(te, lat, idx_start=self.num_inference_steps - 1)
        t0 = time.time()
        out = self.run_diffusion(te, lat, idx_start=self.num_inference_steps - 1)
        jax.block_until_ready(out[-1])
        dt_unet_step = time.time() - t0
        img = self.latent2image(out[-1])  # compile
        t0 = time.time()
        img = self.latent2image(out[-1])
        dt_vae = time.time() - t0
        return dt_unet_step, dt_vae
