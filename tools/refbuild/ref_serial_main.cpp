// Driver that builds the REFERENCE's serial A* (msa_astar) against the
// reference sources in /root/reference/pastar, with boost replaced by the
// minimal shim in ./shim (no boost dev headers in this container).  Used only
// to capture golden outputs (optimal score / alignment / similarity / node
// counts) from the real reference code.  Mirrors what
// /root/reference/pastar/msa_astar_main.cpp does, minus boost::program_options
// (we only need the positional fasta argument; the serial path ignores every
// other flag).
#include <cstring>
#include <iostream>
#include <string>

#include "include/AStar.h"
#include "include/HeuristicHPair.h"
#include "include/Sequences.h"
#include "include/max_seq_helper.h"
#include "include/read_fasta.h"

int main(int argc, char* argv[]) {
    AStarOpt opt;
    std::string fasta;
    for (int i = 1; i < argc; ++i) {
        if (std::strcmp(argv[i], "--no-force-quit") == 0)
            opt.force_quit = false;  // reference --memory_debug semantics
        else
            fasta = argv[i];
    }
    if (fasta.empty()) {
        std::cerr << "usage: ref_serial [--no-force-quit] file.fasta\n";
        return 1;
    }
    if (read_fasta_file(fasta) != 0) return 1;

    HeuristicHPair::getInstance()->init();

#define REFBUILD_RUN_ASTAR(X)                                             \
    case X:                                                               \
        return a_star<X>(Sequences::get_initial_node<X>(),               \
                         Sequences::get_final_coord<X>(), opt);

    std::cout << "Performing search with Serial A-Star.\n";
    switch (Sequences::get_seq_num()) {
        MAX_NUM_SEQ_HELPER(REFBUILD_RUN_ASTAR);
        default:
            std::cerr << "Fatal error: Invalid number of sequences: "
                      << Sequences::get_seq_num() << std::endl;
    }
    return -1;
}
