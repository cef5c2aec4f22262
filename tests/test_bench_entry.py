"""Smoke tests for the bench driver entry (bench.py) — the file the round
driver executes. A broken entry is an instant blank scoreboard, so the
cheap failure modes are pinned here without touching any device:

  * the headline-aot phase must exit 3 (AotMiss) in well under a minute
    when the AOT store is absent — the parent's fallback budget depends
    on misses being fast (the probe is file-existence-first, so no
    device dial happens);
  * the parent helpers used to compose the driver-parsed JSON.
"""

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BENCH = os.path.join(REPO, "bench.py")


def test_headline_aot_phase_misses_fast(tmp_path):
    env = dict(os.environ)
    env["MGT_BENCH_AOT_DIR"] = str(tmp_path)      # empty store
    env.pop("MGT_BENCH_ALLOW_COMPILE", None)
    t0 = time.time()
    p = subprocess.run([sys.executable, BENCH, "--phase", "headline-aot"],
                       capture_output=True, text=True, env=env, timeout=120)
    dt = time.time() - t0
    assert p.returncode == 3, (p.returncode, p.stderr[-500:])
    assert "AOT unavailable" in p.stderr
    assert not [l for l in p.stdout.splitlines() if l.startswith("{")]
    assert dt < 60, f"miss path took {dt:.1f}s — must stay fast"


def test_headline_obj_schema():
    import bench

    obj = bench._headline_obj(68.78, 67.9, 0.2695, provisional=False,
                              exec_source="aot")
    assert obj["metric"] == "projection_1024_steps_per_sec"
    assert obj["unit"] == "steps/s"
    assert abs(obj["vs_baseline"] - 68.78 / (1000 / 30)) < 1e-3
    assert obj["detail"]["exec_source"] == "aot"
    assert obj["detail"]["median_steps_per_sec"] == 67.9
    assert "provisional" not in obj["detail"]
    assert json.loads(json.dumps(obj)) == obj          # driver-parsable

    prov = bench._headline_obj(21.88, 21.88, 0.163, provisional=True,
                               exec_source="compiled")
    assert prov["detail"]["provisional"] is True


def test_aot_store_manifest_names_match_bench_executables():
    """Every executable name bench.py loads must be minted by the warm
    tool (a rename silently downgrades the driver run to provisional)."""
    sys.path.insert(0, os.path.join(REPO, "tools"))
    import round_end_check

    manifest_path = os.path.join(REPO, ".bench_aot", "MANIFEST.json")
    if not os.path.exists(manifest_path):
        import pytest
        pytest.skip("no AOT store in this checkout")
    with open(manifest_path) as f:
        manifest = json.load(f)
    missing = [n for n in round_end_check.WANTED if n not in manifest]
    assert not missing, f"blobs missing from the committed store: {missing}"
