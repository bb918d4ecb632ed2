"""Parity against output captured from the ACTUAL reference binary.

``tests/ref_captured/*.txt`` is the stdout of the reference's serial A*
(``/root/reference/pastar/msa_astar_main.cpp`` path) built from the unmodified
reference sources by ``tools/refbuild/capture.sh`` (boost replaced by a minimal
shim; the serial path never serializes).  ``*_weights.txt`` dumps the
reference's ``HeuristicHPair::weightMatrix`` floats
(ref: pastar/WeightedSP.cpp:497-509).

These tests hold the repo to the reference's printed oracle surface
(ref: pastar/backtrace.cpp:53,162-191 — Final Score / Similarity / alignment).
"""
from __future__ import annotations

import json
import os
import re

import numpy as np
import pytest

from mpi_pastar_msa_tpu.core.problem import problem_from_fasta
from mpi_pastar_msa_tpu.heuristic.hpair import HPairHeuristic
from mpi_pastar_msa_tpu.heuristic.weights import altschul_rationale2
from mpi_pastar_msa_tpu.io.fasta import read_fasta_file
from mpi_pastar_msa_tpu.search.backtrace import build_alignment, similarity
from mpi_pastar_msa_tpu.search.serial import SerialAStar

HERE = os.path.dirname(os.path.abspath(__file__))
CAPTURED = os.path.join(HERE, "ref_captured")
REF = "/root/reference"
INPUTS = ["test", "test2", "PF08184", "kinase"]


def parse_captured(name: str):
    lines = open(os.path.join(CAPTURED, f"{name}.txt")).read().splitlines()
    score = next(l for l in lines if l.startswith("Final Score:"))
    m = re.match(r"Final Score: \(([\d ]+)\)\tg - (\d+) \(h - (\d+) f - (\d+)\)", score)
    assert m, score
    coord = tuple(int(v) for v in m.group(1).split())
    g, h, f = int(m.group(2)), int(m.group(3)), int(m.group(4))
    sim = float(next(l for l in lines if l.startswith("Similarity:"))
                .split()[1].rstrip("%"))
    si = next(i for i, l in enumerate(lines) if l.startswith("Similarity:"))
    pi = next(i for i, l in enumerate(lines) if l.startswith("Phase 3"))
    alignment = [l for l in lines[si + 1:pi] if l.strip()]
    return dict(coord=coord, g=g, h=h, f=f, sim=sim, alignment=alignment)


def parse_weights(name: str) -> dict:
    out = {}
    for line in open(os.path.join(CAPTURED, f"{name}_weights.txt")):
        m = re.match(r"w\[(\d+)\]\[(\d+)\] = (\S+) \(int (-?\d+)\)", line)
        out[(int(m.group(1)), int(m.group(2)))] = (np.float32(m.group(3)),
                                                   int(m.group(4)))
    return out


@pytest.mark.parametrize("name", INPUTS)
def test_goldens_match_reference_capture(name):
    """tests/goldens.json holds exactly what the reference binary printed:
    same optimal g, same similarity, same alignment text."""
    ref = parse_captured(name)
    gold = json.load(open(os.path.join(HERE, "goldens.json")))[f"{name}.fasta"]
    assert gold["optimal_g"] == ref["g"]
    assert ref["h"] == 0 and ref["f"] == ref["g"]
    assert gold["similarity_pct"] == pytest.approx(ref["sim"], abs=0.005)
    assert gold["alignment"] == ref["alignment"]


@pytest.mark.parametrize("name", INPUTS)
def test_weights_bit_identical_to_reference(name):
    """Our float32 Altschul rationale-2 pipeline reproduces the reference's
    weightMatrix floats bit-for-bit (and hence the truncated int weights)."""
    seqs = tuple(read_fasta_file(f"{REF}/{name}.fasta"))
    W, Wi = altschul_rationale2(seqs)
    ref = parse_weights(name)
    for (i, j), (wf, wi) in ref.items():
        if i == j:
            continue
        assert W[i, j] == wf, (name, i, j, float(W[i, j]), float(wf))
        assert int(Wi[i, j]) == wi


@pytest.mark.parametrize("name", ["test", "test2", "PF08184"])
def test_serial_oracle_reproduces_reference(name):
    """The Python serial A* oracle ends at the reference's printed optimum and
    reconstructs the identical alignment text (kinase covered by goldens +
    engine tests; too slow for the default lane here)."""
    ref = parse_captured(name)
    p = problem_from_fasta(f"{REF}/{name}.fasta")
    assert tuple(int(v) for v in p.final_coord) == ref["coord"]
    h = HPairHeuristic.build(p)
    res = SerialAStar(p, h).run()
    assert res.g == ref["g"]
    al = build_alignment(p, res.closed)
    assert al == ref["alignment"]
    assert similarity(al) == pytest.approx(ref["sim"], abs=0.005)
