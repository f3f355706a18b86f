// baseline_match — reference-equivalent CPU brute-force descriptor matcher
// (the hot loop of valette/FROG match/match.cpp:255-336, written fresh),
// used by bench.py to measure a per-pair matching baseline on this
// machine's CPUs.
//
// Input: raw float32 file [N, P, 6 + D] (x,y,z,scale,laplacian,response,
// desc...), header of 3 int32 (N, P, D) first.
// Usage: baseline_match file.bin maxPairs [maxDistance] [secondRatio]
// Prints one JSON line with pair count and seconds.

#include <algorithm>
#include <chrono>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <utility>
#include <vector>
#ifdef _OPENMP
#include <omp.h>
#endif

using std::vector;

static double now() {
    using namespace std::chrono;
    return duration<double>(steady_clock::now().time_since_epoch()).count();
}

int main(int argc, char** argv) {
    if (argc < 3) {
        fprintf(stderr, "usage: %s file.bin maxPairs [dist] [ratio]\n", argv[0]);
        return 1;
    }
    int maxPairs = atoi(argv[2]);
    float maxDist = argc > 3 ? atof(argv[3]) : 1e10f;
    float ratio = argc > 4 ? atof(argv[4]) : 1.0f;

    FILE* f = fopen(argv[1], "rb");
    if (!f) { perror("open"); return 1; }
    int32_t hdr[3];
    if (fread(hdr, 4, 3, f) != 3) return 1;
    int n = hdr[0], p = hdr[1], d = hdr[2];
    int row = 6 + d;
    vector<float> data((size_t)n * p * row);
    if (fread(data.data(), 4, data.size(), f) != data.size()) return 1;
    fclose(f);

    vector<std::pair<int, int>> pairs;
    for (int i = 0; i < n && (int)pairs.size() < maxPairs; i++)
        for (int j = i + 1; j < n && (int)pairs.size() < maxPairs; j++)
            pairs.push_back({i, j});

    size_t totalMatches = 0;
    double t0 = now();
#pragma omp parallel for schedule(dynamic) reduction(+ : totalMatches)
    for (size_t k = 0; k < pairs.size(); k++) {
        const float* A = &data[(size_t)pairs[k].first * p * row];
        const float* B = &data[(size_t)pairs[k].second * p * row];
        size_t matches = 0;
        for (int i = 0; i < p; i++) {
            const float* bi = &B[(size_t)i * row];
            float d1 = 1e30f, d2 = 1e30f;
            for (int j = 0; j < p; j++) {
                const float* aj = &A[(size_t)j * row];
                if (bi[4] != aj[4]) continue;  // laplacian sign
                float sr = bi[3] / aj[3];
                if (sr > 1.3f || sr < 1.0f / 1.3f) continue;
                float dist = 0;
                for (int c = 0; c < d; c++) {
                    float diff = bi[6 + c] - aj[6 + c];
                    dist += diff * diff;
                }
                if (dist < d1) { d2 = d1; d1 = dist; }
                else if (dist < d2) d2 = dist;
            }
            if ((sqrtf(d1 / d2) < ratio || d2 >= 1e30f) && sqrtf(d1) < maxDist)
                matches++;
        }
        totalMatches += matches;
    }
    double secs = now() - t0;
    printf("{\"pairs\": %zu, \"matches\": %zu, \"seconds\": %.4f, "
           "\"secsPerPair\": %.4f, \"threads\": %d}\n",
           pairs.size(), totalMatches, secs, secs / pairs.size(),
#ifdef _OPENMP
           omp_get_max_threads()
#else
           1
#endif
    );
    return 0;
}
