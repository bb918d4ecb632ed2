"""Capture golden optimal-alignment records for the bundled inputs.

Runs the native reference-semantics engine on every bundled FASTA and writes
``tests/goldens.json`` with the optimal WSP cost, similarity, weights and
alignment — the committed parity fixture future engines are held to
(the printed-output oracle surface of SURVEY.md §4).
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mpi_pastar_msa_tpu.core.problem import problem_from_fasta
from mpi_pastar_msa_tpu.heuristic.hpair import HPairHeuristic
from mpi_pastar_msa_tpu.search.backtrace import build_alignment, similarity
from mpi_pastar_msa_tpu.search.native import NativeAStar

INPUTS = ["test.fasta", "test2.fasta", "PF08184.fasta", "kinase.fasta"]
REF = "/root/reference"


def main() -> None:
    out = {}
    for name in INPUTS:
        p = problem_from_fasta(f"{REF}/{name}")
        h = HPairHeuristic.build(p)
        cap = 1 << 22 if p.max_length > 100 else 1 << 16
        r = NativeAStar(p, h, init_capacity=cap).run()
        al = build_alignment(p, r.closed)
        out[name] = {
            "optimal_g": r.g,
            "similarity_pct": round(similarity(al), 2),
            "nodes_expanded": r.nodes_expanded,
            "weights_int": [[int(v) for v in row] for row in h.weight_i],
            "alignment": al,
        }
        print(f"{name}: g={r.g} sim={out[name]['similarity_pct']}%")
    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "tests", "goldens.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
