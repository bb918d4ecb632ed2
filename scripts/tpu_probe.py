"""Cheap TPU backend health probe: one trivial jitted op.

The tunneled backend here has minutes-long availability blackouts in which
device discovery works but any dispatch hangs.  This probe distinguishes the
three states in seconds: prints TPU_ABSENT (no TPU platform), TPU_PROBE_OK
with the dispatch wall, or simply hangs (the caller's timeout marks the
blackout).  Used by bench.py to decide when to (re)try the real lanes.
"""
import sys
import time


def main() -> None:
    import jax

    try:
        devs = [d for d in jax.devices() if d.platform != "cpu"]
    except Exception:  # noqa: BLE001
        devs = []
    if not devs:
        print("TPU_ABSENT", flush=True)
        return
    import jax.numpy as jnp

    t0 = time.perf_counter()
    with jax.default_device(devs[0]):
        val = int(jax.jit(lambda x: x.sum())(jnp.arange(1024)).block_until_ready())
    assert val == 1024 * 1023 // 2
    print(f"TPU_PROBE_OK wall={time.perf_counter() - t0:.2f}", flush=True)


if __name__ == "__main__":
    main()
