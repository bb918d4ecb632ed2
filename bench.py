"""Benchmark: wall-clock to provably-optimal WSP alignment.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Headline: kinase.fasta (the only bundled input with a non-trivial search:
4.5M+ node expansions) — wall-clock for the TPU frontier engine to the
provably optimal cost, vs the BEST native-C configuration on the host CPU
(serial or hardware_concurrency-threaded HDA*; the reference binary itself
is not buildable here — MPI/Boost/LZ4 absent, see BASELINE.md).
vs_baseline > 1 means the TPU engine is faster.

Robustness (the round-2 lesson): the tunneled TPU backend has minutes-long
availability blackouts in which device discovery works but any dispatch
hangs.  Every TPU interaction therefore runs in a subprocess with its own
deadline, cheap trivial-op probes decide when to (re)try, attempts are
spread across the bench so a blackout window can pass, and every attempt's
outcome + last-reached stage lands in "extra" so a missing number is
attributable from the artifact alone.
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

T_START = time.perf_counter()
BUDGET_S = float(os.environ.get("MSA_BENCH_BUDGET_S", "3600"))


def _elapsed() -> float:
    return time.perf_counter() - T_START


def _remaining() -> float:
    return BUDGET_S - _elapsed()


def _run_script(script: str, timeout: float, env=None):
    """Run scripts/<script> in a subprocess; returns (status, output, wall).
    status: 'ok' (rc 0), 'fail', or 'timeout'.  On timeout the partial
    stdout/stderr captured so far is returned for stage attribution."""
    t0 = time.perf_counter()
    try:
        out = subprocess.run(
            [sys.executable, os.path.join(REPO, "scripts", script)],
            capture_output=True, text=True, timeout=timeout, env=env)
        status = "ok" if out.returncode == 0 else "fail"
        text = (out.stdout or "") + (out.stderr or "")
    except subprocess.TimeoutExpired as e:
        status = "timeout"
        text = ""
        for part in (e.stdout, e.stderr):
            if part:
                text += part.decode() if isinstance(part, bytes) else part
    except Exception as e:  # noqa: BLE001
        status = "error"
        text = str(e)
    return status, text, time.perf_counter() - t0


def _last_stage(text: str) -> str:
    stage = ""
    for line in text.splitlines():
        if line.startswith("STAGE "):
            stage = line[6:]
    return stage


def _probe(extra: dict, timeout: float = 90) -> str:
    """Trivial-op health probe.  Returns 'ok' | 'absent' | 'blackout'."""
    status, text, wall = _run_script("tpu_probe.py", timeout)
    rec = {"t": round(_elapsed()), "wall_s": round(wall, 1), "status": status}
    if "TPU_ABSENT" in text:
        rec["status"] = "absent"
    elif status == "ok" and "TPU_PROBE_OK" in text:
        for tok in text.split():
            if tok.startswith("wall="):
                rec["op_wall_s"] = float(tok[5:])
    elif status == "timeout":
        rec["status"] = "blackout"
    extra.setdefault("probes", []).append(rec)
    return rec["status"]


def _smoke(extra: dict, timeout: float) -> bool:
    status, text, wall = _run_script("tpu_smoke.py", timeout)
    ok = status == "ok" and "TPU_SMOKE_PASS" in text
    rec = {"t": round(_elapsed()), "wall_s": round(wall, 1),
           "status": "pass" if ok else status,
           "last_stage": _last_stage(text)}
    if not ok:
        rec["tail"] = text[-400:]
    for line in text.splitlines():  # pf walls ride along for the fallback row
        if line.startswith("OK pf_sig_search"):
            for tok in line.split():
                if tok.startswith("wall="):
                    # search-only (second, warm run) — apples-to-apples with
                    # pf_native_wall_s, which also times only the search
                    extra["pf_tpu_search_wall_s"] = float(tok[5:].rstrip("s"))
        elif line.startswith("OK pf_sig"):
            for tok in line.split():
                if tok.startswith("wall="):
                    extra["pf_tpu_smoke_wall_s"] = float(tok[5:].rstrip("s"))
    extra.setdefault("smoke_attempts", []).append(rec)
    return ok


def _kinase_tpu(extra: dict, timeout: float):
    """Returns (wall_s, nodes) or None.

    The lane runs in a FRESH subprocess against the persistent compile
    cache, so its build+warmup stages ARE the single-shot cold number: the
    honest analogue of timing the reference's prebuilt binary once
    (TimeCounter semantics, ref: pastar/HeuristicHPair.cpp:49,
    PAStar.cpp:640 — the reference's compilation happened at make-time,
    ours at `make warmcache`).  An empty-cache run would instead measure
    XLA compile times (~5-15 min, and 90 s vs 313 s run-to-run under this
    backend's availability flaps), which the reference never pays either.
    """
    status, text, wall = _run_script("bench_kinase_tpu.py", timeout)
    rec = {"t": round(_elapsed()), "wall_s": round(wall, 1), "status": status,
           "last_stage": _last_stage(text)}
    result = None
    walls = {}
    maxchunk = {}
    for line in text.splitlines():
        if line.startswith("KINASE_TPU"):
            kv = dict(tok.split("=") for tok in line.split()[1:])
            result = (float(kv["wall"]), int(kv["nodes"]))
            extra["kinase_triple_cubes"] = int(kv.get("cubes", 0))
            if "maxchunk" in kv:
                maxchunk["timed"] = float(kv["maxchunk"].rstrip("s"))
        else:
            for key in ("build", "warmup"):
                if line.startswith(f"OK {key}"):
                    for tok in line.split():
                        if tok.startswith("wall="):
                            walls[key] = float(tok[5:].rstrip("s"))
                        elif tok.startswith("maxchunk="):
                            maxchunk[key] = float(tok[9:].rstrip("s"))
    # poisoning detection (per-chunk telemetry from the engine): a backend
    # blackout shows as ONE chunk of 30+ s; a cold number carrying such a
    # stall is the backend's weather, not the engine — callers retry it
    poisoned = any(v > 30.0 for v in maxchunk.values())
    if "warmup" in walls:
        cold = round(walls.get("build", 0.0) + walls["warmup"], 1)
        rec["cold_wall_s"] = cold
        rec["maxchunk_s"] = {k: round(v, 1) for k, v in maxchunk.items()}
        if poisoned:
            rec["poisoned"] = True
        prev = extra.get("kinase_tpu_cold_wall_s")
        prev_p = extra.get("kinase_tpu_cold_poisoned", True)
        # keep the best non-poisoned cold shot (each attempt is a fresh
        # process against the same persistent cache, so min is honest)
        if prev is None or (prev_p and not poisoned) or (
                prev_p == poisoned and cold < prev):
            extra["kinase_tpu_warmup_wall_s"] = walls["warmup"]
            extra["kinase_tpu_cold_wall_s"] = cold
            extra["kinase_tpu_cold_poisoned"] = poisoned
    if result is None and status != "timeout":
        rec["tail"] = text[-400:]
    extra.setdefault("kinase_tpu_attempts", []).append(rec)
    if result is not None and maxchunk.get("timed", 0.0) > 30.0:
        rec["timed_poisoned"] = True
        result = ("poisoned", result)
    return result


def main() -> None:
    from mpi_pastar_msa_tpu.core.problem import problem_from_fasta
    from mpi_pastar_msa_tpu.heuristic.hpair import HPairHeuristic
    from mpi_pastar_msa_tpu.search.native import NativeAStar

    extra = {"budget_s": BUDGET_S}

    # --- attempt 1: probe, then smoke (compile-cached: minutes only if the
    # .jax_cache was wiped) -------------------------------------------------
    tpu_state = _probe(extra)
    smoke_ok = False
    if tpu_state == "ok":
        smoke_ok = _smoke(extra, timeout=min(600, max(_remaining() - 1500, 120)))

    # --- native baselines (always succeed; also let a blackout pass) ------
    pf = problem_from_fasta(PF)
    pf_h = HPairHeuristic.build(pf)
    nat = NativeAStar(pf, pf_h)
    nat.run()
    t0 = time.perf_counter()
    assert nat.run().g == PF_G
    extra["pf_native_wall_s"] = round(time.perf_counter() - t0, 4)

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

    # --- attempt 2 (post-baselines; a blackout window has had 2-3 min) ----
    if tpu_state != "absent" and not smoke_ok and _remaining() > 700:
        if _probe(extra) == "ok":
            smoke_ok = _smoke(extra, timeout=min(600, _remaining() - 600))

    # --- kinase TPU lane: try whenever the backend answers the probe.
    # A smoke pass is the preferred gate, but a smoke lost to a blackout
    # (timeout) must not forfeit the headline number if the backend has
    # since recovered. ------------------------------------------------------
    k_tpu = None
    if tpu_state != "absent":
        attempts = 0
        while attempts < 4 and _remaining() > 400:
            # keep attempting while the timed number is missing OR either
            # number (timed/cold) was blackout-poisoned — a retry is a fresh
            # subprocess against the warm cache, so it costs ~1 min
            have_clean_timed = (
                k_tpu is not None
                and not extra.get("kinase_tpu_timed_poisoned", False))
            have_clean_cold = (
                extra.get("kinase_tpu_cold_wall_s") is not None
                and not extra.get("kinase_tpu_cold_poisoned", False))
            if have_clean_timed and have_clean_cold:
                break
            attempts += 1
            probe = _probe(extra)
            if probe == "absent":
                break
            if probe != "ok":
                time.sleep(min(60, max(0, _remaining() - 400)))
                continue
            res = _kinase_tpu(extra, timeout=min(900, _remaining() - 120))
            if isinstance(res, tuple) and res and res[0] == "poisoned":
                # timed run carried a blackout stall; keep it only as a
                # fallback if no clean attempt lands
                if k_tpu is None:
                    k_tpu = res[1]
                    extra["kinase_tpu_timed_poisoned"] = True
            elif res is not None:
                k_tpu = res
                extra.pop("kinase_tpu_timed_poisoned", None)

    # --- beyond-reference TPU lanes (optional: never jeopardize the kinase
    # headline — they run only after it landed and only within budget).
    # synth4_long = the pairwise-only long-L class (L>1000 is outside the
    # reference's correct range); globin6 = the real-biology N=6 family
    # the reference's compile-time N dispatch cannot reach unbuilt. ------
    if tpu_state != "absent" and k_tpu is not None:
        for script, tag, key in (
                ("bench_synth4_long.py", "SYNTH4_LONG ", "synth4_long"),
                ("bench_globin6.py", "GLOBIN6 ", "globin6")):
            if _remaining() < 420:
                extra[key] = {"skipped": f"budget ({round(_remaining())}s left)"}
                continue
            status, text, wall = _run_script(
                script, timeout=min(900, _remaining() - 180))
            row = None
            for line in text.splitlines():
                if line.startswith(tag):
                    row = json.loads(line[len(tag):])
            if row is not None:
                extra[key] = row
            else:
                extra[key] = {"failed": status,
                              "last_stage": _last_stage(text)}

    extra["bench_wall_s"] = round(_elapsed(), 1)
    if k_tpu is not None:
        k_tpu_wall, k_tpu_nodes = k_tpu
        extra["kinase_tpu_nodes_per_sec"] = round(k_tpu_nodes / k_tpu_wall)
        extra["kinase_tpu_nodes_expanded"] = k_tpu_nodes
        # name the baseline so the vs_baseline time series is interpretable
        # across rounds (r01 used native serial; r03+ uses the best config)
        extra["baseline"] = (
            f"native_mt_{extra['kinase_native_mt_threads']}threads"
            if extra.get("kinase_native_mt_wall_s") is not None
            and extra["kinase_native_mt_wall_s"] <= k_native_wall
            else "native_serial")
        extra["baseline_wall_s"] = round(k_best_native, 2)
        # both ratios every round so the cross-round time series is
        # comparable regardless of which baseline is the round's headline
        extra["vs_native_serial"] = round(k_native_wall / k_tpu_wall, 3)
        extra["vs_native_best"] = round(k_best_native / k_tpu_wall, 3)
        print(json.dumps({
            "metric": "kinase_wallclock_to_optimal_tpu",
            "value": round(k_tpu_wall, 2),
            "unit": "s",
            # vs the BEST native config (serial or hardware_concurrency
            # multithreaded HDA*) — the honest reference analogue
            "vs_baseline": round(k_best_native / k_tpu_wall, 3),
            "extra": extra,
        }))
    elif extra.get("pf_tpu_search_wall_s") or extra.get("pf_tpu_smoke_wall_s"):
        # prefer the search-only wall (same semantics as pf_native_wall_s);
        # the build-inclusive smoke wall is a last resort and says so
        pf_wall = extra.get("pf_tpu_search_wall_s")
        if pf_wall:
            extra["baseline"] = "native_serial_search_only"
        else:
            pf_wall = extra["pf_tpu_smoke_wall_s"]
            extra["baseline"] = "native_serial_search_only_VS_build+search"
        print(json.dumps({
            "metric": "pf08184_wallclock_to_optimal_tpu",
            "value": round(pf_wall, 4),
            "unit": "s",
            "vs_baseline": round(extra["pf_native_wall_s"] / pf_wall, 4),
            "extra": extra,
        }))
    else:
        extra["baseline"] = "self"
        print(json.dumps({
            "metric": "kinase_wallclock_to_optimal_native_cpu",
            "value": round(k_native_wall, 2),
            "unit": "s",
            "vs_baseline": 1.0,
            "extra": extra,
        }))


if __name__ == "__main__":
    main()
