// End-to-end golden for reference-RNG replay: mirrors the CUDA reference's
// host-RNG consumption order on a toy corpus using the real libstdc++
// primitives, exactly as the reference consumes them:
//   1. per-epoch instance generation (cpp/data_indri.cpp:328-397): for each
//      eligible document in ascending-id order (std::map iteration),
//      num_samples = max(ceil(avg_len - w + 1), 1) position draws of
//      uniform_int_distribution<int>(0, max_position - 1);
//   2. std::shuffle of the instance-pointer list (data_indri.cpp:397);
//   3. per-batch negative labels (cpp/labels.cu:3-22): k draws of
//      uniform_int_distribution<int>(0, num_entities - 1) per instance in
//      consumption order; partial trailing batches are skipped before the
//      model sees them (main.cu:392-398) and consume no draws.
// All from ONE std::minstd_rand0 stream (base.h:36, main.cu:729-756).
//
// Build + run: g++ -O2 -std=c++14 -o /tmp/refrng tools/reference_rng_golden.cpp
// The output is pinned in tests/test_reference_rng.py and compared against
// TextEntitySource(reference_rng=True) batch-for-batch.
#include <algorithm>
#include <cmath>
#include <cstdio>
#include <random>
#include <tuple>
#include <vector>

int main() {
    const int kWindow = 4;
    const int kBatch = 8;
    const int kNeg = 3;
    const std::vector<int> doc_lengths = {6, 7, 8, 9, 10};
    const int num_docs = (int)doc_lengths.size();

    std::minstd_rand0 rng(1);

    double avg = 0;
    for (int l : doc_lengths) avg += l;
    avg /= num_docs;
    const int num_samples =
        std::max((int)std::ceil(avg - kWindow + 1), 1);

    std::vector<std::tuple<int, int>> order;  // (doc, position)
    for (int d = 0; d < num_docs; ++d) {
        const int max_position = doc_lengths[d] - kWindow + 1;
        std::uniform_int_distribution<int> pos_dist(0, max_position - 1);
        for (int i = 0; i < num_samples; ++i)
            order.emplace_back(d, pos_dist(rng));
    }
    std::shuffle(order.begin(), order.end(), rng);

    const int full = ((int)order.size() / kBatch) * kBatch;
    std::printf("num_samples = %d\n", num_samples);
    std::printf("labels = [");
    for (int i = 0; i < full; ++i)
        std::printf("%s%d", i ? ", " : "", std::get<0>(order[i]));
    std::printf("]\npositions = [");
    for (int i = 0; i < full; ++i)
        std::printf("%s%d", i ? ", " : "", std::get<1>(order[i]));
    std::printf("]\nnegatives = [");
    for (int i = 0; i < full; ++i) {
        for (int k = 0; k < kNeg; ++k) {
            std::uniform_int_distribution<int> neg_dist(0, num_docs - 1);
            std::printf("%s%d", (i || k) ? ", " : "", neg_dist(rng));
        }
    }
    std::printf("]\n");
    return 0;
}
