"""Replay a saved movie-project JSON (reference example_multi_trans_json.py):
settings header at data[0], then per-keyframe prompt/negative/seed records —
the same files the Gradio UI writes."""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp

from latentblending_tpu.engine.blending import BlendingEngine
from latentblending_tpu.engine.session import MovieProject, run_multi_transition
from latentblending_tpu.runtime.holder import SDXLHolder


def main():
    p = argparse.ArgumentParser()
    p.add_argument("fp_json", type=str, help="movie project json")
    p.add_argument("--snapshot", type=str, default=None)
    p.add_argument("--tiny", action="store_true")
    p.add_argument("--out", type=str, default=None)
    p.add_argument("--duration_single_trans", type=float, default=10.0)
    args = p.parse_args()

    project = MovieProject.load(args.fp_json)
    if args.tiny or args.snapshot is None:
        dh = SDXLHolder.from_random("tiny-turbo", dtype=jnp.float32)
        project.width, project.height = dh.spec.default_size
    else:
        dh = SDXLHolder.from_pretrained(args.snapshot)

    be = BlendingEngine(dh)
    fp_out = args.out or args.fp_json.replace(".json", ".mp4")
    run_multi_transition(be, project, fp_out, duration_single_trans=args.duration_single_trans)


if __name__ == "__main__":
    main()
