// Dump the reference's primer distance matrix (Dij) for parity checks.
#include <cstdio>
#include <unistd.h>
#include <string>
#include <vector>
#include "include/Sequences.h"
#include "include/read_fasta.h"
// The definition in WeightedSP.cpp takes pointers (the .hpp declaration is a
// stale non-pointer overload that nothing defines).
void primer(std::vector<std::string>* seq, float*** Dij, float*** scale);
int main(int argc, char* argv[]) {
    if (argc < 2) return 1;
    if (read_fasta_file(argv[1]) != 0) return 1;
    int n = Sequences::get_seq_num();
    Sequences* seqs = Sequences::getInstance();
    std::vector<std::string> sequences;
    float** dij = new float*[n]();
    float** scale = new float*[n]();
    for (int i = 0; i < n; i++) {
        sequences.push_back(seqs->get_seq(i));
        sequences[i].insert(0, "-");
        dij[i] = new float[n]();
        scale[i] = new float[n]();
    }
    fprintf(stderr, "calling primer n=%d len0=%zu\n", n, sequences[0].size());
    primer(&sequences, &dij, &scale);
    fprintf(stderr, "primer done\n");
    for (int i = 0; i < n; i++)
        for (int j = i + 1; j < n; j++) printf("D[%d][%d] = %.9g\n", i, j, dij[i][j]);
    fflush(stdout); _exit(0);
}
