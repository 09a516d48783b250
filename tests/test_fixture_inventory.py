"""Fast-suite guard against committed-fixture rot (VERDICT r3 item 8).

The hermetic goldens in test_parity_fixture_golden.py are slow-marked,
so the fast suite would not notice if the committed trained fixture
``tests/fixtures/parity_mini_sd.npz`` drifted out of sync with the
converter inventory (a renamed module, a new parameter, a changed shape)
until the slow suite ran.  This test strict-loads the fixture through
the FULL bidirectional converter chain on every fast-suite run:

  npz (torch-format names) --import_torch_checkpoint--> flax params
  (no leftovers, every fixture key consumed) --export_torch_checkpoint-->
  torch state dict --strict load--> SiamMOTReplica (reference graph).

Any inventory break fails loudly here instead of silently rotting the
strongest proof in the repo.
"""

import os
import sys

import numpy as np
import pytest

import jax

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def test_committed_fixture_strict_loads_into_replica():
    from test_reference_model_parity import load_replica, make_cfg
    from train_parity_fixture import OUT as FIXTURE, mini_overrides

    from siammot_tpu.models.siammot import SiamMOT
    from siammot_tpu.utils.checkpoint import import_torch_checkpoint

    assert os.path.exists(FIXTURE), (
        f"committed fixture missing: {FIXTURE} — regenerate with "
        "python tools/train_parity_fixture.py")

    ov = mini_overrides()
    cfg = make_cfg(**{ov[i]: ov[i + 1] for i in range(0, len(ov), 2)})
    model = SiamMOT(cfg)
    template = model.init_params(jax.random.PRNGKey(0), (384, 640))

    sd = {k: np.asarray(v) for k, v in np.load(FIXTURE).items()}
    params, leftovers = import_torch_checkpoint(sd, template)
    assert not leftovers, (
        "fixture keys the converter no longer consumes (inventory rot): "
        f"{sorted(leftovers)[:8]}")

    # shapes must have round-tripped exactly (import fills the template)
    for a, b in zip(jax.tree.leaves(template), jax.tree.leaves(params)):
        assert a.shape == np.asarray(b).shape

    # export side + reference-graph inventory: strict load asserts inside
    pytest.importorskip("torch")
    load_replica(cfg, params)
