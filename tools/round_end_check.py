#!/usr/bin/env python
"""Round-end scoreboard gate (VERDICT r3 #7): refuse green status unless
the committed bench artifacts will actually serve a cold driver run.

Checks, in order:
  1. py-compiles bench.py (a syntax error in the driver's entry file is an
     instant rc!=0).
  2. `.bench_aot/MANIFEST.json` exists, the headline blob is present, and
     every blob named in the manifest exists on disk and is committed to
     git (an untracked blob vanishes in the driver's checkout).
  3. `tools/headline_fingerprint.py --check` — the stored fingerprint
     matches HEAD's headline program (a drifted program means the AOT
     executables would silently run stale code).
  4. With --tpu: dials the live backend and probes every manifest blob's
     runtime-version gate (utils/aot_cache.probe) — the on-chip proof that
     a driver run will take the AOT path, without running the bench.

Usage:
  python tools/round_end_check.py          # CPU-only (safe anywhere)
  python tools/round_end_check.py --tpu    # + live-backend probe

Exit 0 = green. Anything else prints the failing check and the fix
(usually: `python tools/warm_bench_cache.py` then `--verify`).
"""

import argparse
import json
import os
import py_compile
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
AOT_DIR = os.path.join(REPO, ".bench_aot")
REQUIRED = ["headline_b1"]
WANTED = ["headline_b1", "headline_xla_b1", "headline_b2",
          "headline_b8", "gen_b8",
          "train_g_main", "train_g_reg", "train_d_main", "train_d_reg"]


def fail(msg, fix):
    print(f"FAIL: {msg}")
    print(f"  fix: {fix}")
    sys.exit(1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tpu", action="store_true",
                    help="also probe the live backend's runtime-version "
                         "gate for every manifest blob")
    args = ap.parse_args()

    # 1. bench.py compiles.
    try:
        py_compile.compile(os.path.join(REPO, "bench.py"), doraise=True)
    except py_compile.PyCompileError as e:
        fail(f"bench.py does not compile: {e}", "fix the syntax error")
    print("ok: bench.py compiles")

    # 2. AOT store present, complete, committed.
    manifest_path = os.path.join(AOT_DIR, "MANIFEST.json")
    if not os.path.exists(manifest_path):
        fail("no .bench_aot/MANIFEST.json",
             "python tools/warm_bench_cache.py (on the chip)")
    with open(manifest_path) as f:
        manifest = json.load(f)
    for name in REQUIRED:
        if name not in manifest:
            fail(f"headline blob '{name}' not in manifest",
                 "python tools/warm_bench_cache.py")
    missing_wanted = [n for n in WANTED if n not in manifest]
    if missing_wanted:
        print(f"warn: secondary blobs not minted: {missing_wanted} "
              "(their anchors will be skipped in driver runs)")
    tracked = subprocess.run(
        ["git", "-C", REPO, "ls-files", ".bench_aot"],
        capture_output=True, text=True).stdout.splitlines()
    for name in manifest:
        blob_rel = f".bench_aot/{name}.aot.gz"
        if not os.path.exists(os.path.join(AOT_DIR, f"{name}.aot.gz")):
            fail(f"{blob_rel} in manifest but missing on disk",
                 "python tools/warm_bench_cache.py")
        if blob_rel not in tracked:
            fail(f"{blob_rel} exists but is NOT committed "
                 "(the driver's checkout will not have it)",
                 f"git add {blob_rel} .bench_aot/{name}.meta.json "
                 ".bench_aot/MANIFEST.json && git commit")
    dirty = subprocess.run(
        ["git", "-C", REPO, "status", "--porcelain", ".bench_aot"],
        capture_output=True, text=True).stdout.strip()
    if dirty:
        fail(f"uncommitted .bench_aot changes:\n{dirty}",
             "commit the AOT store")
    print(f"ok: AOT store committed ({len(manifest)} blobs)")

    # 2b. History-growth gate (ROADMAP round-5 policy): at most ONE blob
    # mint generation per round. A round starts at the driver's
    # "round N: VERDICT + ADVICE + BENCH" commit.
    boundary = subprocess.run(
        ["git", "-C", REPO, "log", "--grep", "^round .*: VERDICT",
         "-n", "1", "--format=%H"],
        capture_output=True, text=True).stdout.strip()
    if boundary:
        rng = f"{boundary}..HEAD"
        churn = subprocess.run(
            ["git", "-C", REPO, "log", "--format=%h %s", rng,
             "--", ".bench_aot/*.aot.gz"],
            capture_output=True, text=True).stdout.strip().splitlines()
        if len(churn) > 1:
            fail(f"{len(churn)} commits touched .bench_aot blobs this "
                 f"round (policy: one re-mint per round):\n"
                 + "\n".join(churn),
                 "squash the mint commits before round end "
                 "(git rebase -i / reset + re-commit once)")
        print(f"ok: blob churn this round = {len(churn)} commit(s) "
              f"(policy <= 1)")

    # 3. Program fingerprint matches HEAD.
    p = subprocess.run(
        [sys.executable,
         os.path.join(REPO, "tools", "headline_fingerprint.py"), "--check"],
        capture_output=True, text=True)
    tail = (p.stdout or p.stderr).strip().splitlines()[-1:]
    if p.returncode != 0:
        fail(f"headline fingerprint drift: {tail}",
             "re-mint: python tools/warm_bench_cache.py --fresh && "
             "python tools/warm_bench_cache.py --verify")
    print(f"ok: fingerprint matches HEAD {tail}")

    # 4. Optional live probe.
    if args.tpu:
        sys.path.insert(0, REPO)
        from morphganformer_tpu.utils import aot_cache

        bad = {}
        for name in manifest:
            why = aot_cache.probe(AOT_DIR, name)
            if why != "ok":
                bad[name] = why
        if bad:
            fail(f"live backend rejects blobs: {bad}",
                 "runtime drifted since minting — re-mint on this backend: "
                 "python tools/warm_bench_cache.py")
        print(f"ok: live backend accepts all {len(manifest)} blobs")
    else:
        print("note: run with --tpu for the live runtime-version probe")

    print("GREEN: a cold driver run will take the AOT headline path"
          if not args.tpu else
          "GREEN (verified on live backend): a cold driver run will take "
          "the AOT headline path")


if __name__ == "__main__":
    main()
