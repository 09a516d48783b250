"""Checkpointer + torch state-dict converter roundtrip."""

import pytest
import jax
import numpy as np

from siammot_tpu.configs.defaults import get_cfg
from siammot_tpu.models.siammot import SiamMOT
from siammot_tpu.utils.checkpoint import (Checkpointer,
                                          export_torch_checkpoint,
                                          import_torch_checkpoint)


def _small_model():
    cfg = get_cfg()
    cfg.TPU.MAX_TRACKS = 4
    cfg.freeze()
    model = SiamMOT(cfg)
    params = model.init_params(jax.random.PRNGKey(42), (64, 96))
    return model, params


@pytest.mark.slow
def test_torch_roundtrip():
    _, params = _small_model()
    # Projection: a fresh S2D stem kernel is MORE expressive than the
    # reference's 7x7/3x3 stem (extra phase taps), so a raw random init is
    # not reference-expressible.  One export+import projects onto the
    # reference-expressible set; the roundtrip must then be exact.
    sd = export_torch_checkpoint(params)
    assert len(sd) > 200          # DLA-34: ~80 conv/bn pairs + heads
    zero_template = jax.tree.map(np.zeros_like, params)
    projected, leftovers = import_torch_checkpoint(sd, zero_template)
    assert leftovers == []

    sd2 = export_torch_checkpoint(projected)
    restored, leftovers2 = import_torch_checkpoint(
        sd2, jax.tree.map(np.zeros_like, params))
    assert leftovers2 == []
    restored_map = {jax.tree_util.keystr(p): v for p, v
                    in jax.tree_util.tree_leaves_with_path(restored)}
    n_nonzero = 0
    for path, leaf in jax.tree_util.tree_leaves_with_path(projected):
        key = jax.tree_util.keystr(path)
        np.testing.assert_allclose(np.asarray(leaf),
                                   np.asarray(restored_map[key]),
                                   rtol=1e-6, atol=1e-6, err_msg=key)
        n_nonzero += int(np.any(np.asarray(leaf) != 0))
    assert n_nonzero >= 100       # the import actually filled the tree


@pytest.mark.slow
def test_orbax_save_load(tmp_path):
    _, params = _small_model()
    ckptr = Checkpointer(str(tmp_path))
    ckptr.save(7, params, opt_state=None)
    assert ckptr.latest().endswith("model_0000007")
    restored = ckptr.load(None, like={"params": params, "opt_state": None,
                                      "iteration": 0})
    assert restored["iteration"] == 7
    a = jax.tree.leaves(params)[0]
    b = jax.tree.leaves(restored["params"])[0]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # numbered checkpoints take precedence over model_final (a stale
    # final from an interrupted run must not shadow periodic saves)
    ckptr.save(9, params, opt_state=None, tag="model_final")
    assert ckptr.latest().endswith("model_0000007")
