// End-to-end golden for the FULL reference-RNG replay protocol including
// Glorot init, mirroring the CUDA reference's host-RNG consumption order
// on the toy corpus of tests/test_reference_rng.py:
//   1. epoch-1 instance generation + shuffle inside the generator ctor
//      (cpp/data_indri.cpp:279,328-398) — BEFORE model init;
//   2. ModelBase::initialize (cpp/model.cu:37-43): init_matrix_glorot for
//      words (d_w x V device shape), entities (d_e x D), transform
//      (d_e x d_w) in that order, each element
//      2 * max * (std::generate_canonical<float,1>(rng) - 0.5) with
//      const float max = sqrt(6.0 / (rows + cols))
//      (include/cuNVSM/cuda_utils.h:35-56; bias zero-filled, no draws,
//      cpp/params.cu:361-372);
//   3. per-batch negative labels (cpp/labels.cu:3-22).
// All from ONE std::minstd_rand0 seed-1 stream (main.cu:729-756).
//
// Build + run: g++ -O2 -std=c++14 -o /tmp/refinit tools/reference_init_golden.cpp
// Output pinned in tests/test_reference_rng.py and compared against
// TextEntitySource.draw_next_epoch + models.params.reference_init_params.
#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <random>
#include <tuple>
#include <vector>

static void print_glorot(const char* name, std::minstd_rand0* rng,
                         int rows, int cols) {
    const float max = sqrt(6.0 / (rows + cols));
    std::printf("%s = [", name);
    for (int i = 0; i < rows * cols; ++i) {
        float v = 2 * max * (std::generate_canonical<float, 1>(*rng) - 0.5);
        uint32_t bits;
        std::memcpy(&bits, &v, 4);
        std::printf("%s%u", i ? ", " : "", bits);
    }
    std::printf("]\n");
}

int main() {
    const int kWindow = 4;
    const int kBatch = 8;
    const int kNeg = 3;
    const int kVocab = 40;  // toy corpus: 40 distinct terms, no OOV
    const int kDw = 3;
    const int kDe = 2;
    const std::vector<int> doc_lengths = {6, 7, 8, 9, 10};
    const int num_docs = (int)doc_lengths.size();

    std::minstd_rand0 rng(1);

    // 1. epoch-1 reset (generator ctor).
    double avg = 0;
    for (int l : doc_lengths) avg += l;
    avg /= num_docs;
    const int num_samples = std::max((int)std::ceil(avg - kWindow + 1), 1);
    std::vector<std::tuple<int, int>> order;
    for (int d = 0; d < num_docs; ++d) {
        const int max_position = doc_lengths[d] - kWindow + 1;
        std::uniform_int_distribution<int> pos_dist(0, max_position - 1);
        for (int i = 0; i < num_samples; ++i)
            order.emplace_back(d, pos_dist(rng));
    }
    std::shuffle(order.begin(), order.end(), rng);

    // 2. Glorot init: words, entities, transform (model.cu:37-43), each in
    //    device_matrix column-major linear order.
    print_glorot("word_bits", &rng, kDw, kVocab);
    print_glorot("entity_bits", &rng, kDe, num_docs);
    print_glorot("transform_bits", &rng, kDe, kDw);

    // 3. first-epoch negative labels, batch by batch.
    const int full = ((int)order.size() / kBatch) * kBatch;
    std::printf("negatives = [");
    for (int i = 0; i < full; ++i) {
        for (int k = 0; k < kNeg; ++k) {
            std::uniform_int_distribution<int> neg_dist(0, num_docs - 1);
            std::printf("%s%d", (i || k) ? ", " : "", neg_dist(rng));
        }
    }
    std::printf("]\n");
    return 0;
}
