"""Checkpoint/resume tests: interrupted search resumes to the same optimum."""
import os

import pytest

from mpi_pastar_msa_tpu.core.problem import Problem, problem_from_fasta
from mpi_pastar_msa_tpu.heuristic.hpair import HPairHeuristic
from mpi_pastar_msa_tpu.search.engine import TpuFrontierSearch

REF = "/root/reference"


class TestCheckpointResume:
    def test_interrupt_then_resume(self, tmp_path):
        ckpt = str(tmp_path / "search.ckpt.npz")
        p = problem_from_fasta(f"{REF}/PF08184.fasta")
        h = HPairHeuristic.build(p)

        # interrupt: cap steps below what the search needs
        eng1 = TpuFrontierSearch(p, h, max_steps=10, chunk_steps=4,
                                 checkpoint_path=ckpt, checkpoint_every=1)
        with pytest.raises(RuntimeError, match="max_steps"):
            eng1.run()
        assert os.path.exists(ckpt)

        # resume from the checkpoint and finish
        eng2 = TpuFrontierSearch(p, h, chunk_steps=4,
                                 checkpoint_path=ckpt, checkpoint_every=1)
        res = eng2.run()
        assert res.g == 24450
        # the resumed run continued rather than restarting
        assert res.steps > 10

    def test_mismatched_checkpoint_ignored(self, tmp_path):
        ckpt = str(tmp_path / "search.ckpt.npz")
        p1 = Problem(("ACDEFG", "ACDFG", "ACEFG"))
        h1 = HPairHeuristic.build(p1)
        e1 = TpuFrontierSearch(p1, h1, batch=16, capacity=1 << 12,
                               checkpoint_path=ckpt, checkpoint_every=1,
                               max_steps=1, chunk_steps=1)
        try:
            e1.run()
        except RuntimeError:
            pass
        if not os.path.exists(ckpt):
            pytest.skip("search finished before a checkpoint was written")

        # a different problem must ignore the stale checkpoint and still solve
        p2 = Problem(("ACDEF", "ACDF", "ACEF"))
        h2 = HPairHeuristic.build(p2)
        e2 = TpuFrontierSearch(p2, h2, batch=16, capacity=1 << 12,
                               checkpoint_path=ckpt)
        from mpi_pastar_msa_tpu.search.serial import SerialAStar

        assert e2.run().g == SerialAStar(p2, h2).run().g
