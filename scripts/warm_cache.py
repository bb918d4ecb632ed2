"""Pre-populate the persistent XLA compilation cache for the bench lanes.

Runs the PF08184 + test2 smoke engines and the kinase engine once on
whatever backend is live (TPU if attached).  After this, every bench/smoke
retry pays cache hits (seconds) instead of cold Mosaic/XLA compiles
(minutes) — the round-2 bench lost its headline number to exactly that
cold-compile-inside-a-timeout failure mode.
"""
import subprocess
import sys
import time

REPO = __file__.rsplit("/", 2)[0]


def main() -> None:
    t0 = time.perf_counter()
    print("warmcache: smoke lane (PF08184 + test2 + sharded)", flush=True)
    rc = subprocess.run([sys.executable, REPO + "/scripts/tpu_smoke.py"]).returncode
    print(f"warmcache: smoke rc={rc} wall={time.perf_counter() - t0:.0f}s",
          flush=True)
    t0 = time.perf_counter()
    print("warmcache: kinase lane", flush=True)
    rc = subprocess.run(
        [sys.executable, REPO + "/scripts/bench_kinase_tpu.py"]).returncode
    print(f"warmcache: kinase rc={rc} wall={time.perf_counter() - t0:.0f}s",
          flush=True)


if __name__ == "__main__":
    main()
