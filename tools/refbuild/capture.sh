#!/usr/bin/env bash
# Build the REFERENCE's serial A* (msa_astar path) against /root/reference and
# capture its printed oracle surface for all four bundled FASTA inputs into
# tests/ref_captured/.  Boost is replaced by the minimal shim in ./shim (this
# container has no boost dev headers); see shim/boost/multi_index_container.hpp
# for the semantics notes.  MPI is not needed on the serial path.
set -euo pipefail
cd "$(dirname "$0")"
REF=/root/reference/pastar
SRCS="$REF/AStar.cpp $REF/backtrace.cpp $REF/Coord.cpp $REF/CoordHash.cpp \
      $REF/Cost.cpp $REF/HeuristicHPair.cpp $REF/Node.cpp $REF/PairAlign.cpp \
      $REF/read_fasta.cpp $REF/Sequences.cpp $REF/TimeCounter.cpp $REF/WeightedSP.cpp"
# -fpermissive: the reference's own backtrace.cpp:129 returns a value from a
# void function (never instantiated); gcc-12 rejects it otherwise.
g++ -O2 -std=c++11 -fpermissive -I shim -I "$(dirname $REF)/pastar" $SRCS ref_serial_main.cpp -o ref_serial
g++ -O2 -std=c++11 -fpermissive -I shim -I "$(dirname $REF)/pastar" $SRCS ref_weights_main.cpp -o ref_weights

OUT=../../tests/ref_captured
mkdir -p "$OUT"
for f in test test2 PF08184 kinase; do
    echo "capturing $f.fasta ..."
    ./ref_serial "/root/reference/$f.fasta" > "$OUT/$f.txt" 2>&1
    ./ref_weights "/root/reference/$f.fasta" 2>/dev/null | grep '^w' > "$OUT/${f}_weights.txt"
done
echo done
