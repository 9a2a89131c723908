"""CI wrapper for the maintenance-plane probe's regression gates
(tools/maintenance_probe.py, round 9).

The probe's tiers at {20k, 100k} files are wall-clock evidence runs;
this test runs the SAME code at the 1k tier so the suite permanently
pins the three gates on a table with real (hard-linked) files, real
deletion-vector bundles, and an engine-layout checkpoint:

* snapshot resolve materializes ZERO manifest entries;
* columnar prune materializes survivors only;
* the DV-applying read returns the exact expected row count
  (n_files × rows − dv'd files × positions).
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))

from maintenance_probe import (  # noqa: E402
    build_synthetic_table,
    probe_tier,
)

N = 1000


def test_probe_gates_hold_at_1k_files(spark, tmp_path):
    root = str(tmp_path / "probe")
    build_synthetic_table(root, N)
    # probe_tier asserts the three gates internally; a violation is a
    # test failure with the gate named
    out = probe_tier(spark, root, N, runs=1)
    assert out["n_files"] == N
    assert out["prune_survivors"] == N // 100
    for k in ("resolve_s", "prune_s", "dv_read_construct_s",
              "dv_read_exec_s"):
        assert out[k] >= 0
