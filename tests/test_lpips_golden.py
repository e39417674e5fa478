"""Golden parity vs the torch `lpips` package (VERDICT #5).

Activates when tests/golden/ holds the artifacts produced by
tools/dump_lpips_golden.py in a weights-enabled environment (this repo's
CI environment has no lpips/torchvision and no network, so the files are
produced out-of-band). Until then the structural anchor below still runs:
it pins our AlexNet tap layout to the published architecture.
"""
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from latentblending_tpu.models.lpips import LPIPS, LPIPSScorer, convert_lpips_state_dict

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")


def test_alexnet_backbone_param_count():
    """AlexNet `features` trunk (conv1..conv5) = 2,469,696 params — derived
    from the published architecture (Krizhevsky 2012 as shipped by
    torchvision): 64@11²s4, 192@5², 384@3², 256@3², 256@3²; plus five 1×1
    no-bias lin heads over (64,192,384,256,256) channels = 1,152."""
    model = LPIPS()
    shapes = jax.eval_shape(
        model.init, jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), jnp.zeros((1, 64, 64, 3))
    )["params"]
    convs = sum(
        int(np.prod(l.shape))
        for name, tree in shapes.items()
        if name.startswith("conv")
        for l in jax.tree_util.tree_leaves(tree)
    )
    lins = sum(
        int(np.prod(l.shape))
        for name, tree in shapes.items()
        if name.startswith("lin")
        for l in jax.tree_util.tree_leaves(tree)
    )
    assert convs == 2_469_696
    assert lins == 64 + 192 + 384 + 256 + 256


@pytest.mark.skipif(
    not os.path.exists(os.path.join(GOLDEN_DIR, "lpips_alex_goldens.json")),
    reason="LPIPS goldens not produced yet (needs a weights-enabled env; tools/dump_lpips_golden.py)",
)
def test_lpips_matches_package_goldens():
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from dump_lpips_golden import synthetic_pairs

    with open(os.path.join(GOLDEN_DIR, "lpips_alex_goldens.json")) as f:
        goldens = json.load(f)["distances"]
    state = dict(np.load(os.path.join(GOLDEN_DIR, "lpips_alex_state.npz")))
    params = convert_lpips_state_dict(state)
    scorer = LPIPSScorer(params=params)
    for (a, b), want in zip(synthetic_pairs(), goldens):
        got = scorer.distance(a, b)
        assert got == pytest.approx(want, abs=2e-4), (got, want)
