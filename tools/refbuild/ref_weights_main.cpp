// Dump the reference's Altschul rationale-2 weight matrix for parity checks.
#include <cstdio>
#include "include/HeuristicHPair.h"
#include "include/Sequences.h"
#include "include/read_fasta.h"
int main(int argc, char* argv[]) {
    if (argc < 2) return 1;
    if (read_fasta_file(argv[1]) != 0) return 1;
    HeuristicHPair* h = HeuristicHPair::getInstance();
    h->init();
    int n = Sequences::get_seq_num();
    for (int i = 0; i < n; i++)
        for (int j = 0; j < n; j++)
            printf("w[%d][%d] = %.9g (int %d)\n", i, j, h->weightMatrix[i][j], (int)h->weightMatrix[i][j]);
    return 0;
}
