"""Regression tests that literally run the driver's entry points.

VERDICT r3 item 5: round 3 shipped with BOTH driver artifacts red
(BENCH_r03 rc=124, MULTICHIP_r03 ok=false) because nothing in the suite
exercised them. These tests subprocess-invoke the same commands the driver
runs — ``__graft_entry__.dryrun_multichip`` (4-device mesh for speed; the
driver uses 8) and ``bench.py`` in its forced-CPU ``BENCH_SMOKE=1`` mode —
so the artifacts can't rot silently between rounds.

Subprocesses, not in-process calls: both entry points configure backends
and device counts at import/startup, which must not leak into (or inherit
from) the pytest process's 8-virtual-device CPU backend.
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(cmd, env_extra, timeout=1500):
    env = dict(os.environ)
    # the conftest exports JAX_PLATFORMS/XLA_FLAGS for THIS process; the
    # entry points must do their own forcing, so start them clean
    env.pop("JAX_PLATFORMS", None)
    env.pop("XLA_FLAGS", None)
    env.update(env_extra)
    return subprocess.run(
        cmd, cwd=REPO, env=env, capture_output=True, text=True,
        timeout=timeout,
    )


def test_dryrun_multichip_subprocess():
    r = _run([sys.executable, "__graft_entry__.py"], {"N_DEVICES": "4"})
    assert r.returncode == 0, f"stdout:\n{r.stdout}\nstderr:\n{r.stderr}"
    assert "dryrun_multichip OK: 4 devices" in r.stdout, r.stdout
    assert "dp x sp eval + grad_accum OK" in r.stdout, r.stdout


def test_bench_smoke_subprocess():
    r = _run([sys.executable, "bench.py"], {"BENCH_SMOKE": "1"})
    assert r.returncode == 0, f"stdout:\n{r.stdout}\nstderr:\n{r.stderr}"
    # the contract: exactly ONE JSON line on stdout with the driver schema
    lines = [l for l in r.stdout.splitlines() if l.strip()]
    payloads = [json.loads(l) for l in lines if l.lstrip().startswith("{")]
    assert len(payloads) == 1, r.stdout
    out = payloads[0]
    # distinct metric name in smoke mode (ADVICE r4): a consumer keying on
    # the production metric name must never ingest a tiny-CPU number
    assert out["metric"] == "frames_per_sec_smoke_tiny_cpu"
    assert out["unit"] == "frames/s"
    assert out["value"] > 0 and out["vs_baseline"] > 0
    assert out["smoke"] is True
