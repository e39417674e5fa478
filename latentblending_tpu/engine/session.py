"""Movie-project sessions: the JSON format the reference's Gradio UI saves
(reference gradio_ui.py:168-189) and example_multi_trans_json.py replays
(:24-45) — kept schema-compatible so existing project files work — plus the
chained multi-transition runner both the UI (:235-260) and
example_multi_trans.py (:39-62) share.
"""
from __future__ import annotations

import dataclasses
import json
import os

from latentblending_tpu.utils import get_logger

log = get_logger(__name__)


@dataclasses.dataclass
class Keyframe:
    prompt: str
    seed: int = 420
    negative_prompt: str = ""
    preview_image: str | None = None


@dataclasses.dataclass
class MovieProject:
    keyframes: list[Keyframe]
    width: int = 512
    height: int = 512
    num_inference_steps: int = 4

    def save(self, fp_json: str):
        data = [
            {
                "settings": "sdxl",
                "width": self.width,
                "height": self.height,
                "num_inference_steps": self.num_inference_steps,
            }
        ]
        for i, kf in enumerate(self.keyframes):
            entry = {
                "iteration": i,
                "seed": int(kf.seed),
                "prompt": kf.prompt,
                "negative_prompt": kf.negative_prompt,
            }
            if kf.preview_image:
                entry["preview_image"] = kf.preview_image
            data.append(entry)
        with open(fp_json, "w") as f:
            json.dump(data, f, indent=4)

    @classmethod
    def load(cls, fp_json: str) -> "MovieProject":
        with open(fp_json) as f:
            data = json.load(f)
        settings = data[0]
        keyframes = [
            Keyframe(
                prompt=e["prompt"],
                seed=int(e.get("seed", 420)),
                negative_prompt=e.get("negative_prompt", ""),
                preview_image=e.get("preview_image"),
            )
            for e in data[1:]
        ]
        return cls(
            keyframes=keyframes,
            width=int(settings.get("width", 512)),
            height=int(settings.get("height", 512)),
            num_inference_steps=int(settings.get("num_inference_steps", 4)),
        )


def run_multi_transition(
    be,
    project: MovieProject,
    fp_movie: str,
    duration_single_trans: float = 10.0,
    fps: int = 30,
    apply_settings: bool = True,
    workdir: str | None = None,
) -> str:
    """Chain K keyframes into K-1 transitions with latent recycling
    (reference example_multi_trans.py:39-62 / gradio_ui.py:235-260)."""
    from latentblending_tpu.video.writer import concatenate_movies

    assert len(project.keyframes) >= 2, "need at least two keyframes"
    if apply_settings:
        be.set_dimensions((project.width, project.height))
        be.set_num_inference_steps(project.num_inference_steps)

    workdir = workdir or os.path.dirname(os.path.abspath(fp_movie))
    os.makedirs(workdir, exist_ok=True)
    kfs = project.keyframes
    list_parts = []
    for i in range(len(kfs) - 1):
        if i == 0:
            # negative prompt FIRST: embeddings bake it in at encode time
            # (the reference UI gets this wrong, gradio_ui.py:238-239 —
            # its first keyframe silently ignores the negative prompt)
            be.set_negative_prompt(kfs[i].negative_prompt)
            be.set_prompt1(kfs[i].prompt)
            be.set_prompt2(kfs[i + 1].prompt)
            recycle_img1 = False
        else:
            be.swap_forward()
            be.set_negative_prompt(kfs[i + 1].negative_prompt)
            be.set_prompt2(kfs[i + 1].prompt)
            recycle_img1 = True

        fp_part = os.path.join(workdir, f"tmp_part_{str(i).zfill(3)}.mp4")
        # fused transition+write: encoding overlaps the keyframe transfers
        # and the final similarity pass (see run_movie_transition)
        be.run_movie_transition(
            fp_part, duration_single_trans, fps=fps,
            recycle_img1=recycle_img1, fixed_seeds=[kfs[i].seed, kfs[i + 1].seed],
        )
        list_parts.append(fp_part)
        log.info(f"transition {i + 1}/{len(kfs) - 1} done")

    concatenate_movies(fp_movie, list_parts, fps=fps)
    for fp in list_parts:
        try:
            os.remove(fp)
        except OSError:
            pass
    log.info(f"movie saved to {fp_movie}")
    return fp_movie
