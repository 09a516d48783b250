"""Multi-controller (2-process jax.distributed) training dryrun.

Covers the reference's DDP multi-process training mode
(``/root/reference/tools/train_net.py:50-54``) with real multi-process
coordination: two OS processes, 4 virtual CPU devices each, one global
8-device mesh, per-process batch shards globalized via
``parallel.mesh.host_batch_to_global``.  The two-controller run must
reproduce the single-controller (8-device, same mesh topology) losses.

Slow (two cold jit compiles in subprocesses) — excluded from the default
suite; run with ``-m slow`` or ``-m ""``.
"""

import pytest


@pytest.mark.slow
def test_two_process_run_matches_single_process():
    import os
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "tools"))
    from dryrun_multihost import spawn

    single = spawn(num_processes=1, n_local=8, timeout=1500)
    multi = spawn(num_processes=2, n_local=4, timeout=1500)
    assert len(single) == len(multi) == 2
    for a, b in zip(single, multi):
        assert abs(a - b) < 1e-4 * max(1.0, abs(a)), (single, multi)
