"""Benchmark: wall-clock to provably-optimal WSP alignment.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Headline: kinase.fasta (the only bundled input with a non-trivial search:
4.5M+ node expansions) — wall-clock for the TPU frontier engine to the
provably optimal cost, vs the native C serial engine on the host CPU (this
repo's reference-semantics baseline; the reference binary itself is not
buildable here — MPI/Boost/LZ4 absent, see BASELINE.md).  vs_baseline > 1
means the TPU engine is faster.

PF08184 numbers ride along in "extra" (that search is 59 expansions — pure
dispatch latency on a remote TPU, meaningless as a chip benchmark).

Robustness: remote-TPU tunnel failures degrade to smaller scopes so the
driver always gets its JSON line.
"""
import json
import os
import subprocess
import sys
import time

PF = "/root/reference/PF08184.fasta"
PF_G = 24450
KINASE = "/root/reference/kinase.fasta"
KINASE_G = 421546
REPO = os.path.dirname(os.path.abspath(__file__))


def _tpu_smoke(extra: dict) -> bool:
    """Run the hardware sanity lane first (tests/test_tpu_hardware.py uses
    the same driver): catches Mosaic/layout regressions in seconds instead
    of mid-way through a multi-minute kinase search."""
    t0 = time.perf_counter()
    try:
        out = subprocess.run(
            [sys.executable, os.path.join(REPO, "scripts", "tpu_smoke.py")],
            capture_output=True, text=True, timeout=900,
        )
    except Exception as e:  # noqa: BLE001
        extra["tpu_smoke"] = f"error: {e}"
        return False
    extra["tpu_smoke_wall_s"] = round(time.perf_counter() - t0, 1)
    if "TPU_ABSENT" in out.stdout:
        extra["tpu_smoke"] = "absent"
        return False
    ok = out.returncode == 0 and "TPU_SMOKE_PASS" in out.stdout
    extra["tpu_smoke"] = "pass" if ok else (
        "FAIL: " + (out.stdout + out.stderr)[-500:])
    return ok


def _cold_kinase(extra: dict) -> None:
    """One-shot cold run: fresh process + empty compilation cache — the
    honest analogue of the reference's single-shot TimeCounter phases
    (ref: pastar/HeuristicHPair.cpp:49, pastar/PAStar.cpp:640)."""
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        env = dict(os.environ, MSA_PASTAR_JAX_CACHE=td)
        code = (
            "import sys, time; sys.path.insert(0, %r);"
            "from mpi_pastar_msa_tpu.core.problem import problem_from_fasta;"
            "from mpi_pastar_msa_tpu.search.engine import TpuFrontierSearch;"
            "p = problem_from_fasta(%r); t0 = time.perf_counter();"
            "r = TpuFrontierSearch(p).run();"
            "assert r.g == %d, r.g;"
            "print('COLD_WALL', time.perf_counter() - t0)"
        ) % (REPO, KINASE, KINASE_G)
        t0 = time.perf_counter()
        try:
            out = subprocess.run([sys.executable, "-c", code],
                                 capture_output=True, text=True, timeout=900,
                                 env=env)
            for line in out.stdout.splitlines():
                if line.startswith("COLD_WALL"):
                    extra["kinase_tpu_cold_wall_s"] = round(float(line.split()[1]), 1)
                    return
            extra["kinase_tpu_cold"] = "FAIL: " + (out.stdout + out.stderr)[-300:]
        except subprocess.TimeoutExpired:
            extra["kinase_tpu_cold"] = f"timeout {round(time.perf_counter() - t0)}s"


def main() -> None:
    from mpi_pastar_msa_tpu.core.problem import problem_from_fasta
    from mpi_pastar_msa_tpu.heuristic.hpair import HPairHeuristic
    from mpi_pastar_msa_tpu.search.native import NativeAStar

    extra = {}
    tpu_ok = _tpu_smoke(extra)

    # --- PF08184: correctness + small-input numbers -----------------------
    pf = problem_from_fasta(PF)
    pf_h = HPairHeuristic.build(pf)
    nat = NativeAStar(pf, pf_h)
    nat.run()
    t0 = time.perf_counter()
    assert nat.run().g == PF_G
    extra["pf_native_wall_s"] = round(time.perf_counter() - t0, 4)

    pf_tpu_wall = None
    try:
        if not tpu_ok:
            raise RuntimeError(f"tpu smoke gate: {extra.get('tpu_smoke')}")
        from mpi_pastar_msa_tpu.search.engine import TpuFrontierSearch

        eng = TpuFrontierSearch(pf, pf_h)
        assert eng.run().g == PF_G
        t0 = time.perf_counter()
        r = eng.run()
        pf_tpu_wall = time.perf_counter() - t0
        extra["pf_tpu_wall_s"] = round(pf_tpu_wall, 4)
    except Exception as e:  # noqa: BLE001
        print(f"pf tpu bench failed ({e})", file=sys.stderr)

    # --- kinase: the real search ------------------------------------------
    kin = problem_from_fasta(KINASE)
    kin_h = HPairHeuristic.build(kin)
    knat = NativeAStar(kin, kin_h, init_capacity=1 << 22)
    t0 = time.perf_counter()
    knr = knat.run()
    k_native_wall = time.perf_counter() - t0
    assert knr.g == KINASE_G
    extra["kinase_native_wall_s"] = round(k_native_wall, 2)
    extra["kinase_native_nodes_per_sec"] = round(knr.nodes_expanded / k_native_wall)

    # honest apples-to-apples: the reference is multithreaded
    # (hardware_concurrency() workers, ref: pastar/PAStar.cpp:643-654) —
    # run the shared-memory HDA* engine with this host's core count and
    # baseline against the BEST native configuration.
    k_best_native = k_native_wall
    try:
        mt_threads = min(os.cpu_count() or 1, 16)
        if mt_threads > 1:
            kmt = NativeAStar(kin, kin_h, init_capacity=1 << 22,
                              threads=mt_threads)
            t0 = time.perf_counter()
            kmr = kmt.run()
            k_mt_wall = time.perf_counter() - t0
            assert kmr.g == KINASE_G
            extra["kinase_native_mt_wall_s"] = round(k_mt_wall, 2)
            extra["kinase_native_mt_threads"] = mt_threads
            extra["kinase_native_mt_nodes_per_sec"] = round(
                kmr.nodes_expanded / k_mt_wall)
            k_best_native = min(k_best_native, k_mt_wall)
    except Exception as e:  # noqa: BLE001
        print(f"kinase mt bench failed ({e})", file=sys.stderr)

    k_tpu_wall = None
    try:
        if not tpu_ok:
            raise RuntimeError(f"tpu smoke gate: {extra.get('tpu_smoke')}")
        from mpi_pastar_msa_tpu.search.engine import TpuFrontierSearch

        keng = TpuFrontierSearch(kin, kin_h, capacity=1 << 24, batch=16384,
                                 chunk_steps=64)
        kr = keng.run()  # includes compile (persistent-cached across runs)
        assert kr.g == KINASE_G
        t0 = time.perf_counter()
        kr = keng.run()
        k_tpu_wall = time.perf_counter() - t0
        extra["kinase_tpu_nodes_per_sec"] = round(kr.nodes_expanded / k_tpu_wall)
        extra["kinase_tpu_nodes_expanded"] = kr.nodes_expanded
        extra["kinase_triple_cubes"] = len(
            getattr(keng.heuristic, "triangles", []) or [])
    except Exception as e:  # noqa: BLE001
        print(f"kinase tpu bench failed ({e})", file=sys.stderr)

    if tpu_ok:
        _cold_kinase(extra)

    if k_tpu_wall is not None:
        print(json.dumps({
            "metric": "kinase_wallclock_to_optimal_tpu",
            "value": round(k_tpu_wall, 2),
            "unit": "s",
            # vs the BEST native config (serial or hardware_concurrency
            # multithreaded HDA*) — the honest reference analogue
            "vs_baseline": round(k_best_native / k_tpu_wall, 3),
            "extra": extra,
        }))
    elif pf_tpu_wall is not None:
        print(json.dumps({
            "metric": "pf08184_wallclock_to_optimal_tpu",
            "value": round(pf_tpu_wall, 4),
            "unit": "s",
            "vs_baseline": round(extra["pf_native_wall_s"] / pf_tpu_wall, 4),
            "extra": extra,
        }))
    else:
        print(json.dumps({
            "metric": "kinase_wallclock_to_optimal_native_cpu",
            "value": round(k_native_wall, 2),
            "unit": "s",
            "vs_baseline": 1.0,
            "extra": extra,
        }))


if __name__ == "__main__":
    main()
