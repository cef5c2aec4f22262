"""Mint the committed test-suite seed cache (VERDICT r4 #5).

Copies this host's populated XLA:CPU compilation-cache entries
(.jax_cache/<host_fp>/, written during a full suite run) into
tests/_cache_seed/<host_fp>/ as gzip'd blobs. tests/conftest.py seeds
the active cache from that dir on the SAME host fingerprint, making a
fully-cold suite run (empty .jax_cache) warm; on any other host the
fingerprint misses and the suite compiles as before (cross-host XLA:CPU
entries segfault — utils/compile_cache.py).

Usage:
    python tools/seed_test_cache.py            # mint/update
    python tools/seed_test_cache.py --min-kb 64   # skip tiny entries

Policy: like .bench_aot, mint at most once per round (each generation is
permanent git history).
"""

import argparse
import gzip
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from morphganformer_tpu.utils.compile_cache import host_fingerprint


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--min-kb", type=int, default=0,
                    help="skip entries smaller than this")
    ap.add_argument("--cache-dir", default=os.path.join(REPO, ".jax_cache"))
    ap.add_argument("--force", action="store_true",
                    help="rewrite entries that already exist in the seed "
                         "(default: append-only, so committed blobs stay "
                         "byte-identical and git stores no delta for them)")
    args = ap.parse_args()

    fp = host_fingerprint()
    src = os.path.join(args.cache_dir, fp)
    dst = os.path.join(REPO, "tests", "_cache_seed", fp)
    if not os.path.isdir(src):
        sys.exit(f"no populated cache at {src} — run the suite first")
    os.makedirs(dst, exist_ok=True)

    import io

    total_raw = total_gz = n = skipped = existing = 0
    for name in sorted(os.listdir(src)):
        path = os.path.join(src, name)
        if not os.path.isfile(path):
            continue
        raw = os.path.getsize(path)
        if raw < args.min_kb * 1024:
            skipped += 1
            continue
        out = os.path.join(dst, name + ".gz")
        if os.path.exists(out) and not args.force:
            existing += 1
            continue
        with open(path, "rb") as f:
            data = f.read()
        # Deterministic gzip (mtime=0): re-minting an unchanged entry
        # reproduces identical bytes, so git stores no new delta.
        buf = io.BytesIO()
        with gzip.GzipFile(fileobj=buf, mode="wb", compresslevel=6,
                           mtime=0) as gz:
            gz.write(data)
        blob = buf.getvalue()
        tmp = out + ".tmp"
        with open(tmp, "wb") as f:
            f.write(blob)
        os.replace(tmp, out)
        total_raw += raw
        total_gz += len(blob)
        n += 1
    print(f"seeded {n} new entries ({existing} already present, {skipped} "
          f"below size floor) for host {fp}: {total_raw/1e6:.0f} MB raw -> "
          f"{total_gz/1e6:.0f} MB gzip'd at {dst}")


if __name__ == "__main__":
    main()
