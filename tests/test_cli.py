"""CLI surface tests (driving mpi_pastar_msa_tpu.cli.run in-process)."""
import io
import sys


from mpi_pastar_msa_tpu.cli import run
from mpi_pastar_msa_tpu.core.problem import Problem
from mpi_pastar_msa_tpu.parallel.multihost import broadcast_problem, init_distributed

REF = "/root/reference"


def _capture(argv):
    buf = io.StringIO()
    old = sys.stdout
    sys.stdout = buf
    try:
        rc = run(argv)
    finally:
        sys.stdout = old
    return rc, buf.getvalue()


class TestCli:
    def test_serial_engine_pf(self):
        rc, out = _capture(["--engine", "serial", f"{REF}/PF08184.fasta"])
        assert rc == 0
        assert "Final Score:" in out and "g - 24450" in out
        assert "Similarity: 95.48%" in out
        assert "Phase 1" in out and "Phase 2" in out and "Phase 3" in out
        assert "nodes expanded/s" in out

    def test_native_engine(self):
        rc, out = _capture(["--engine", "native", f"{REF}/test2.fasta"])
        assert rc == 0
        assert "g - 45037" in out

    def test_tpu_engine_cpu_platform(self):
        rc, out = _capture(["--engine", "tpu", "--platform", "cpu",
                            f"{REF}/PF08184.fasta"])
        assert rc == 0
        assert "g - 24450" in out

    def test_sharded_cli(self):
        rc, out = _capture(["--engine", "tpu", "--devices", "2", "--platform", "cpu",
                            f"{REF}/PF08184.fasta"])
        assert rc == 0
        assert "g - 24450" in out
        assert "tid 1" in out  # per-shard stats table

    def test_missing_file(self):
        rc = run(["/nonexistent.fasta"])
        assert rc == 1

    def test_hash_flags_accepted(self):
        rc, out = _capture(["--engine", "serial", "-y", "FSUM", "-s", "3",
                            f"{REF}/test.fasta"])
        assert rc == 0
        assert "hash=FSUM shift=3" in out


class TestMultihostPassthrough:
    def test_single_process_broadcast(self):
        assert init_distributed() == 0
        p = Problem(("ACD", "ACE"))
        assert broadcast_problem(p) is p
