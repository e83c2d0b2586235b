"""local-cluster[2,4,4096] smoke (round 9, VERDICT r8 #7).

The whole suite runs under local[*], which hides executor-side
serialization: closures, broadcast rows, addPyFile package shipping and
Arrow worker traffic never cross a process boundary there. This test
spawns ``tools/local_cluster_smoke.py`` in a SUBPROCESS (a second
master cannot coexist with the suite's SparkContext) where two real
executor JVMs with their own Python workers run the 11 headline
builders plus a forced applyInPandas kernel and the d03 broadcast-knob
plan. Any pickling/broadcast/shipping defect fails the subprocess.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.localcluster
def test_local_cluster_smoke(sf_dir):
    env = dict(os.environ)
    # the executor JVMs spawn their own python workers: pin them to this
    # interpreter so the shipped package unpickles under the same ABI
    env.setdefault("PYSPARK_PYTHON", sys.executable)
    out = subprocess.run(
        [sys.executable, os.path.join(_REPO, "tools", "local_cluster_smoke.py"), sf_dir],
        capture_output=True,
        text=True,
        timeout=600,
        env=env,
        cwd=_REPO,
    )
    assert out.returncode == 0, out.stderr[-4000:]
    last = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    res = json.loads(last)
    assert res["ok"] and res["queries"] == 14
    assert all(n > 0 for n in res["rows"].values())
