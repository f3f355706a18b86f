// baseline_frog — reference-equivalent CPU implementation of the FROG
// groupwise optimizer hot loops (EM weighting, linear similarity update,
// one deformable B-spline level), used by bench.py to produce an honest
// measured baseline on this machine's CPUs.
//
// Algorithms follow valette/FROG (registration/imageGroup.cxx,
// registration/stats.cxx) — same math, same OpenMP parallelization
// structure — implemented fresh for this benchmark harness.
//
// Usage: baseline_frog pairs.bin <linearIters> <deformIters> <gridSize>
//                      [maxEMSamples] [dumpPath] [nLevels] [guarantee]
//                      [maxRatio] [nFixed] [alpha] [probesPath]
//
// probesPath: optional binary file (int32 nImages, int32 M, then
// nImages*M*3 float32 world positions) of ground-truth probe points per
// image.  Probes ride every transform exactly like keypoints (linear,
// bakes, every B-spline grid) but contribute to nothing — the automated
// analog of the reference's landmark evaluation (imageGroup.cxx:
// 1229-1282).  Writes probesPath+".out": nImages*M*3 float32 after the
// linear stage, then nImages*M*3 float32 after the full schedule.
// Prints one JSON line with per-phase seconds.  With dumpPath, also writes
// a JSON file with the per-iteration energy trajectory, final per-image
// scale/translation, final B-spline coefficients (last grid) and the
// final transformed positions — consumed by tests/test_parity_native.py
// to assert the JAX optimizer reproduces this reference-equivalent
// implementation numerically.
//
// nLevels > 1 runs the reference's multi-level schedule (grid size halves
// per level, imageGroup.cxx:73-142); guarantee=1 enables the
// diffeomorphism guard (reject iteration when any |coeff| exceeds
// maxRatio * spacing after mean subtraction), with the stacked-fresh-grid
// retry and first-time alpha halving of imageGroup.cxx:88-121.
// nFixed > 0 freezes the first images (no RANSAC here: pair it with
// use_ransac=False on the JAX side), disables mean subtraction, and sums
// E over movable images only (imageGroup.cxx:398-409).
//
// argv[17]/argv[18] (emTableP / emTableK): TABLE-STRIDE EM sampling
// parity mode.  The TPU implementation stores half-links as a padded
// per-point table of P rows x K slots (surplus links of high-degree
// points spill into virtual rows; frog_tpu/registration/state.py) and,
// with an EM sample cap, subsamples the FLATTENED table at a static
// stride ceil(P*K / cap) (group.py::_em_stride).  Passing the TPU run's
// (P, K) here makes this oracle draw the EXACT same subsample (same
// per-point link ordering — pairs.bin order — same virtual-row layout,
// same stride over the same padded positions), so the EM parameter
// trajectories and hence the diffeomorphism-guard decisions of the two
// implementations are comparable decision-for-decision instead of only
// statistically.  0/absent keeps the compact-list stride (an
// approximation of the reference's 10k reservoir, stats.h:36-76).

#include <algorithm>
#include <chrono>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <random>
#include <string>
#include <vector>
#ifdef _OPENMP
#include <omp.h>
#endif

using std::vector;

struct HalfLink {
    uint32_t src;     // point in owning image
    uint16_t dstImg;
    uint32_t dstPt;
};

struct ImageData {
    vector<float> xyz;    // 3*P current (baked) coords
    vector<float> xyz2;   // 3*P transformed coords
    vector<float> probe;   // 3*M ground-truth probe coords (baked)
    vector<float> probe2;  // 3*M transformed probe coords
    vector<HalfLink> links;
    // EM mixture params
    float c1 = 10.f, c2 = 300.f, ratio = 0.5f;
    // linear transform: diagonal scale + translation
    float scale[3] = {1, 1, 1};
    float trans[3] = {0, 0, 0};
};

static double now() {
    using namespace std::chrono;
    return duration<double>(steady_clock::now().time_since_epoch()).count();
}

static inline float chipdf(float x) {
    float x2 = x * x;
    return 0.797884560802865f * x2 * expf(-0.5f * x2);
}

static inline float inlierProb(const ImageData& im, float d) {
    const float eps = 1e-10f;
    if (d < 0.1f) return 1.f;
    float c1 = im.c1 + eps, c2 = im.c2 + eps;
    float x1 = im.ratio * chipdf(d / c1) / c1;
    float x2 = (1.f - im.ratio) * chipdf(d / c2) / c2;
    return x1 / (x1 + x2 + eps);
}

// After the reference's 0.1%-relative-change stop (stats.cxx:49-51)
// fires, run kSettleSteps EXTRA iterations: the stop is a knife edge —
// a ~1-ulp transcendental difference between libms/backends flips it by
// one iteration, perturbing the returned parameters by up to the full
// 0.1% tolerance, which compounds through warm starts across hundreds
// of optimizer iterations and can fork the diffeomorphism-guard
// schedule.  Settling is contractive, so implementations that disagree
// only in ulps land on the same parameters.  Shared definition with the
// TPU side (frog_tpu/registration/stats.py::estimate_mixture): a
// strictly deeper stop inside the reference's own tolerance band.
static const int kSettleSteps = 3;

static void estimateEM(ImageData& im, const vector<float>& samples) {
    const float esp = 1.59576912160573f;
    const float eps = 1e-6f;
    int remaining = -1;  // -1 iterating, k > 0 settle steps left
    for (int it = 0; it < 10000 && remaining != 0; it++) {
        double s1 = 0, s2 = 0, s3 = 0, s4 = 0, s5 = 0;
        for (float d : samples) {
            float f1 = im.ratio * chipdf(d / im.c1) / im.c1;
            float f2 = (1.f - im.ratio) * chipdf(d / im.c2) / im.c2;
            float t = f1 / (f1 + f2 + 1e-16f);
            s1 += t * d; s2 += t; s3 += (1.f - t) * d; s4 += 1.f - t; s5 += 1.f;
        }
        s2 = std::max(s2, (double)eps); s3 = std::max(s3, (double)eps);
        s4 = std::max(s4, (double)eps); s5 = std::max(s5, (double)eps);
        float nc1 = std::max(eps, (float)(s1 / s2 / esp));
        float nc2 = std::max(eps, (float)(s3 / s4 / esp));
        float nr = std::max(eps, (float)(s2 / s5));
        bool done = fabsf((im.c1 - nc1) / nc1) < 0.001f &&
                    fabsf((im.c2 - nc2) / nc2) < 0.001f &&
                    fabsf((nr - im.ratio) / nr) < 0.001f;
        im.c1 = nc1; im.c2 = nc2; im.ratio = nr;
        if (remaining > 0) remaining--;
        else if (remaining < 0 && done) remaining = kSettleSteps;
    }
}

static void bsplineWeights(double F[4], double f) {
    const double sixth = 1.0 / 6.0;
    double f2 = f * f;
    F[3] = f2 * f * sixth;
    F[0] = (f2 - f) * 0.5 - F[3] + sixth;
    F[2] = f + F[0] - 2 * F[3];
    F[1] = 1 - F[0] - F[2] - F[3];
}

// ---- Horn's closed-form similarity fit (the quaternion method behind
// vtkLandmarkTransform's similarity mode): dst ~ s R src + t.
// Jacobi eigensolver on the symmetric 4x4 quaternion matrix.
static void jacobiEig4(double a[4][4], double v[4][4]) {
    for (int i = 0; i < 4; i++)
        for (int j = 0; j < 4; j++) v[i][j] = i == j ? 1.0 : 0.0;
    for (int sweep = 0; sweep < 50; sweep++) {
        double off = 0;
        for (int p = 0; p < 4; p++)
            for (int q = p + 1; q < 4; q++) off += a[p][q] * a[p][q];
        if (off < 1e-24) break;
        for (int p = 0; p < 4; p++) for (int q = p + 1; q < 4; q++) {
            if (fabs(a[p][q]) < 1e-30) continue;
            double theta = (a[q][q] - a[p][p]) / (2 * a[p][q]);
            double t = (theta >= 0 ? 1.0 : -1.0) /
                       (fabs(theta) + sqrt(theta * theta + 1));
            double c = 1 / sqrt(t * t + 1), s = t * c;
            for (int k = 0; k < 4; k++) {
                double akp = a[k][p], akq = a[k][q];
                a[k][p] = c * akp - s * akq;
                a[k][q] = s * akp + c * akq;
            }
            for (int k = 0; k < 4; k++) {
                double apk = a[p][k], aqk = a[q][k];
                a[p][k] = c * apk - s * aqk;
                a[q][k] = s * apk + c * aqk;
            }
            for (int k = 0; k < 4; k++) {
                double vkp = v[k][p], vkq = v[k][q];
                v[k][p] = c * vkp - s * vkq;
                v[k][q] = s * vkp + c * vkq;
            }
        }
    }
}

// mat: row-major 4x4 output, identity bottom row
static void hornSimilarity(const vector<float>& src, const vector<float>& dst,
                           double mat[16]) {
    size_t k = src.size() / 3;
    double ca[3] = {0, 0, 0}, cb[3] = {0, 0, 0};
    for (size_t p = 0; p < k; p++)
        for (int j = 0; j < 3; j++) {
            ca[j] += src[3 * p + j] / k;
            cb[j] += dst[3 * p + j] / k;
        }
    double m[3][3] = {{0}}, varA = 0, varB = 0;
    for (size_t p = 0; p < k; p++) {
        double a[3], b[3];
        for (int j = 0; j < 3; j++) {
            a[j] = src[3 * p + j] - ca[j];
            b[j] = dst[3 * p + j] - cb[j];
        }
        for (int i = 0; i < 3; i++) for (int j = 0; j < 3; j++)
            m[i][j] += a[i] * b[j] / k;
        for (int j = 0; j < 3; j++) { varA += a[j] * a[j] / k; varB += b[j] * b[j] / k; }
    }
    double nm[4][4] = {
        {m[0][0] + m[1][1] + m[2][2], m[1][2] - m[2][1], m[2][0] - m[0][2], m[0][1] - m[1][0]},
        {m[1][2] - m[2][1], m[0][0] - m[1][1] - m[2][2], m[0][1] + m[1][0], m[2][0] + m[0][2]},
        {m[2][0] - m[0][2], m[0][1] + m[1][0], -m[0][0] + m[1][1] - m[2][2], m[1][2] + m[2][1]},
        {m[0][1] - m[1][0], m[2][0] + m[0][2], m[1][2] + m[2][1], -m[0][0] - m[1][1] + m[2][2]},
    };
    double vv[4][4];
    jacobiEig4(nm, vv);
    int best = 0;
    for (int j = 1; j < 4; j++) if (nm[j][j] > nm[best][best]) best = j;
    double q0 = vv[0][best], qx = vv[1][best], qy = vv[2][best], qz = vv[3][best];
    double r[3][3] = {
        {1 - 2 * (qy * qy + qz * qz), 2 * (qx * qy - q0 * qz), 2 * (qx * qz + q0 * qy)},
        {2 * (qx * qy + q0 * qz), 1 - 2 * (qx * qx + qz * qz), 2 * (qy * qz - q0 * qx)},
        {2 * (qx * qz - q0 * qy), 2 * (qy * qz + q0 * qx), 1 - 2 * (qx * qx + qy * qy)},
    };
    double s = sqrt(varB / std::max(varA, 1e-30));
    for (int i = 0; i < 3; i++) {
        for (int j = 0; j < 3; j++) mat[4 * i + j] = s * r[i][j];
        mat[4 * i + 3] = cb[i] - s * (r[i][0] * ca[0] + r[i][1] * ca[1] + r[i][2] * ca[2]);
    }
    mat[12] = mat[13] = mat[14] = 0; mat[15] = 1;
}

int main(int argc, char** argv) {
    if (argc < 5) {
        fprintf(stderr, "usage: %s pairs.bin nLinear nDeform gridSize [maxEMSamples]\n", argv[0]);
        return 1;
    }
    int nLinear = atoi(argv[2]);
    int nDeform = atoi(argv[3]);
    double gridSize = atof(argv[4]);
    size_t maxEM = argc > 5 ? (size_t)atol(argv[5]) : 10000;
    const char* dumpPath = argc > 6 && argv[6][0] ? argv[6] : nullptr;
    int nLevels = argc > 7 ? atoi(argv[7]) : 1;
    bool guarantee = argc > 8 ? atoi(argv[8]) != 0 : false;
    double maxRatio = argc > 9 ? atof(argv[9]) : 0.4;
    int nFixed = argc > 10 ? atoi(argv[10]) : 0;
    float alpha0 = argc > 11 ? (float)atof(argv[11]) : 0.02f;
    const char* probesPath = argc > 12 && argv[12][0] ? argv[12] : nullptr;
    vector<double> esLinear, esDeform;
    vector<int> gridsPerLevel;

    // ---- read pairs.bin (format: match.cpp:675-744)
    FILE* f = fopen(argv[1], "rb");
    if (!f) { perror("open"); return 1; }
    uint16_t nImages = 0;
    if (fread(&nImages, 2, 1, f) != 1) return 1;
    vector<ImageData> images(nImages);
    for (int i = 0; i < nImages; i++) {
        uint16_t nameLen; fread(&nameLen, 2, 1, f);
        fseek(f, nameLen, SEEK_CUR);
        double ref[3]; fread(ref, 8, 3, f);
        uint32_t nPts; fread(&nPts, 4, 1, f);
        images[i].xyz.resize(3 * (size_t)nPts);
        for (uint32_t p = 0; p < nPts; p++) {
            float row[6]; fread(row, 4, 6, f);
            memcpy(&images[i].xyz[3 * p], row, 12);
        }
        images[i].xyz2 = images[i].xyz;
    }
    size_t nPairs = 0;
    while (true) {
        uint16_t a, b; uint32_t size;
        if (fread(&a, 2, 1, f) != 1) break;
        fread(&b, 2, 1, f); fread(&size, 4, 1, f);
        for (uint32_t k = 0; k < size; k++) {
            uint32_t p1, p2; fread(&p1, 4, 1, f); fread(&p2, 4, 1, f);
            images[a].links.push_back({p1, b, p2});
            images[b].links.push_back({p2, a, p1});
        }
        nPairs += size;
    }
    fclose(f);
    int n = nImages;

    int nProbes = 0;
    if (probesPath) {
        FILE* pf = fopen(probesPath, "rb");
        if (!pf) { perror("probes"); return 1; }
        int32_t pn, pm; fread(&pn, 4, 1, pf); fread(&pm, 4, 1, pf);
        if (pn != n) { fprintf(stderr, "probes: %d images != %d\n", pn, n); return 1; }
        nProbes = pm;
        for (int i = 0; i < n; i++) {
            images[i].probe.resize(3 * (size_t)pm);
            fread(images[i].probe.data(), 4, 3 * (size_t)pm, pf);
            images[i].probe2 = images[i].probe;
        }
        fclose(pf);
    }

    // ---- anchor-centering init (imageGroup.cxx:806-848): average the
    // anchors of the first (N - nFixed) images; only movable images get a
    // translation
    vector<double> anchor(3 * n, 0), avg(3, 0);
    int nRef = n - nFixed;
    for (int i = 0; i < n; i++) {
        double lo[3] = {1e30, 1e30, 1e30}, hi[3] = {-1e30, -1e30, -1e30};
        for (size_t p = 0; p < images[i].xyz.size() / 3; p++)
            for (int k = 0; k < 3; k++) {
                double v = images[i].xyz[3 * p + k];
                lo[k] = std::min(lo[k], v); hi[k] = std::max(hi[k], v);
            }
        for (int k = 0; k < 3; k++) {
            anchor[3 * i + k] = 0.5 * (lo[k] + hi[k]);
            if (i < nRef) avg[k] += anchor[3 * i + k] / nRef;
        }
    }
    for (int i = nFixed; i < n; i++)
        for (int k = 0; k < 3; k++)
            images[i].trans[k] = (float)(avg[k] - anchor[3 * i + k]);

    auto transformLinear = [&]() {
#pragma omp parallel for
        for (int i = 0; i < n; i++) {
            ImageData& im = images[i];
            size_t P = im.xyz.size() / 3;
            for (size_t p = 0; p < P; p++)
                for (int k = 0; k < 3; k++)
                    im.xyz2[3 * p + k] = im.xyz[3 * p + k] * im.scale[k] + im.trans[k];
            for (size_t p = 0; p < im.probe.size() / 3; p++)
                for (int k = 0; k < 3; k++)
                    im.probe2[3 * p + k] = im.probe[3 * p + k] * im.scale[k] + im.trans[k];
        }
    };

    auto bakeAll = [&]() {
        for (int i = 0; i < n; i++) {
            images[i].xyz = images[i].xyz2;
            images[i].probe = images[i].probe2;
        }
    };

    // ---- TPU table-layout mirror for EM sampling parity (see header).
    int emTableP = argc > 17 ? atoi(argv[17]) : 0;
    int emTableK = argc > 18 ? atoi(argv[18]) : 0;
    struct EmTable {
        vector<uint32_t> count;   // links per source point
        vector<size_t> ptStart;   // exclusive cumsum into `order`
        vector<uint32_t> order;   // link indices grouped by src, stable
        vector<int32_t> rowSrc;   // per padded row: src point, -1 = padding
        vector<int32_t> rowBlock; // per padded row: K-slot block index
    };
    vector<EmTable> emTables;
    if (emTableP > 0 && emTableK > 0) {
        emTables.resize(n);
        for (int i = 0; i < n; i++) {
            EmTable& tb = emTables[i];
            size_t P0 = images[i].xyz.size() / 3;
            tb.count.assign(P0, 0);
            for (const HalfLink& lk : images[i].links) tb.count[lk.src]++;
            tb.ptStart.assign(P0 + 1, 0);
            for (size_t p = 0; p < P0; p++)
                tb.ptStart[p + 1] = tb.ptStart[p] + tb.count[p];
            tb.order.resize(images[i].links.size());
            vector<size_t> fill(tb.ptStart.begin(), tb.ptStart.end() - 1);
            for (uint32_t l = 0; l < (uint32_t)images[i].links.size(); l++)
                tb.order[fill[images[i].links[l].src]++] = l;
            // virtual rows follow the true points, grouped per src in src
            // order (state.py: starts = n_points + exclusive cumsum(extra))
            tb.rowSrc.assign((size_t)emTableP, -1);
            tb.rowBlock.assign((size_t)emTableP, 0);
            size_t next = P0;
            for (size_t p = 0; p < P0 && p < (size_t)emTableP; p++) {
                tb.rowSrc[p] = (int32_t)p;
                size_t blocks = (tb.count[p] + emTableK - 1) / emTableK;
                for (size_t b = 1; b < blocks && next < (size_t)emTableP;
                     b++, next++) {
                    tb.rowSrc[next] = (int32_t)p;
                    tb.rowBlock[next] = (int32_t)b;
                }
            }
        }
    }

    auto updateStats = [&]() {
#pragma omp parallel for
        for (int i = 0; i < n; i++) {
            ImageData& im = images[i];
            vector<float> samples;
            auto push = [&](const HalfLink& lk) {
                const float* pA = &im.xyz2[3 * lk.src];
                const float* pB = &images[lk.dstImg].xyz2[3 * lk.dstPt];
                float d2 = 0;
                for (int k = 0; k < 3; k++) {
                    float dd = pA[k] - pB[k]; d2 += dd * dd;
                }
                samples.push_back(sqrtf(d2));
            };
            if (!emTables.empty()) {
                // TPU-identical subsample: static stride over the padded
                // (P, K) table positions (group.py::_em_stride)
                const EmTable& tb = emTables[i];
                size_t total = (size_t)emTableP * emTableK;
                size_t stride =
                    (maxEM && total > maxEM) ? (total + maxEM - 1) / maxEM : 1;
                samples.reserve(total / stride + 1);
                for (size_t t = 0; t < total; t += stride) {
                    size_t row = t / emTableK, col = t % emTableK;
                    int32_t src = tb.rowSrc[row];
                    if (src < 0) continue;
                    size_t rank = (size_t)tb.rowBlock[row] * emTableK + col;
                    if (rank >= tb.count[src]) continue;
                    push(im.links[tb.order[tb.ptStart[src] + rank]]);
                }
            } else {
                size_t stride = std::max<size_t>(1, im.links.size() / maxEM);
                samples.reserve(im.links.size() / stride + 1);
                for (size_t l = 0; l < im.links.size(); l += stride)
                    push(im.links[l]);
            }
            estimateEM(im, samples);
        }
    };

    double tStats = 0, tLinear = 0, tDeform = 0;

    // ---- fixed-image RANSAC path (imageGroup.cxx:40-49, 629-804): with
    // useRansac, every moving image is aligned to the (baked) fixed group
    // by 4-point similarity hypotheses + an inlier refit, REPLACING the
    // linear loop; the similarity fit is Horn's quaternion method (what
    // vtkLandmarkTransform's similarity mode computes).
    int useRansac = argc > 13 ? atoi(argv[13]) : 0;
    int ransacIters = argc > 14 ? atoi(argv[14]) : 5000;
    double ransacDist = argc > 15 ? atof(argv[15]) : 50.0;
    double ransacMaxScale = argc > 16 ? atof(argv[16]) : 10.0;
    vector<long> ransacInliers;
    if (useRansac && nFixed > 0) {
        double tR0 = now();
        double dist2 = ransacDist * ransacDist;
        for (int i = nFixed; i < n; i++) {
            ImageData& im = images[i];
            for (int k = 0; k < 3; k++) { im.trans[k] = 0; im.scale[k] = 1; }
            size_t P = im.xyz.size() / 3;
            vector<vector<uint32_t>> ptLinks(P);
            for (uint32_t l = 0; l < im.links.size(); l++)
                ptLinks[im.links[l].src].push_back(l);
            int nBatches = 1;
#ifdef _OPENMP
            nBatches = omp_get_max_threads();
#endif
            int batchIters = std::max(1, ransacIters / nBatches);
            long bestInl = -1; double bestMat[16] = {1,0,0,0, 0,1,0,0, 0,0,1,0, 0,0,0,1};
#pragma omp parallel for
            for (int b = 0; b < nBatches; b++) {
                std::mt19937 rng(b * 1000);
                long localBest = -1; double localMat[16];
                vector<float> src(12), dst(12);
                for (int it = 0; it < batchIters; it++) {
                    for (int j = 0; j < 4; j++) {
                        while (true) {
                            uint32_t pt = rng() % P;
                            if (ptLinks[pt].empty()) continue;
                            const HalfLink& lk =
                                im.links[ptLinks[pt][rng() % ptLinks[pt].size()]];
                            const float* pB =
                                &images[lk.dstImg].xyz2[3 * lk.dstPt];
                            for (int k = 0; k < 3; k++) {
                                src[3 * j + k] = im.xyz[3 * pt + k];
                                dst[3 * j + k] = pB[k];
                            }
                            break;
                        }
                    }
                    double mat[16];
                    hornSimilarity(src, dst, mat);
                    // det of the 4x4 similarity = s^3 (imageGroup.cxx:789)
                    double s3 =
                        mat[0] * (mat[5] * mat[10] - mat[6] * mat[9]) -
                        mat[1] * (mat[4] * mat[10] - mat[6] * mat[8]) +
                        mat[2] * (mat[4] * mat[9] - mat[5] * mat[8]);
                    double det = fabs(s3);
                    if (det > ransacMaxScale || det < 1.0 / ransacMaxScale)
                        continue;
                    long nInl = 0;
                    for (const HalfLink& lk : im.links) {
                        const float* pA = &im.xyz[3 * lk.src];
                        const float* pB = &images[lk.dstImg].xyz2[3 * lk.dstPt];
                        double d2 = 0;
                        for (int k = 0; k < 3; k++) {
                            double t = mat[4 * k] * pA[0] + mat[4 * k + 1] * pA[1]
                                     + mat[4 * k + 2] * pA[2] + mat[4 * k + 3] - pB[k];
                            d2 += t * t;
                        }
                        if (d2 < dist2) nInl++;
                    }
                    if (nInl > localBest) {
                        localBest = nInl;
                        memcpy(localMat, mat, sizeof mat);
                    }
                }
#pragma omp critical
                if (localBest > bestInl) {
                    bestInl = localBest;
                    memcpy(bestMat, localMat, sizeof localMat);
                }
            }
            // refit on the best hypothesis's inliers (imageGroup.cxx:667-700)
            vector<float> src, dst;
            for (const HalfLink& lk : im.links) {
                const float* pA = &im.xyz[3 * lk.src];
                const float* pB = &images[lk.dstImg].xyz2[3 * lk.dstPt];
                double d2 = 0;
                for (int k = 0; k < 3; k++) {
                    double t = bestMat[4 * k] * pA[0] + bestMat[4 * k + 1] * pA[1]
                             + bestMat[4 * k + 2] * pA[2] + bestMat[4 * k + 3] - pB[k];
                    d2 += t * t;
                }
                if (d2 < dist2) {
                    for (int k = 0; k < 3; k++) {
                        src.push_back(pA[k]); dst.push_back(pB[k]);
                    }
                }
            }
            double finalMat[16];
            if (src.size() >= 12) hornSimilarity(src, dst, finalMat);
            else memcpy(finalMat, bestMat, sizeof bestMat);
            ransacInliers.push_back(bestInl);
            // bake the similarity into the image's coords (+ probes)
            auto applyMat = [&](vector<float>& pts) {
                for (size_t p = 0; p < pts.size() / 3; p++) {
                    float in[3] = {pts[3 * p], pts[3 * p + 1], pts[3 * p + 2]};
                    for (int k = 0; k < 3; k++)
                        pts[3 * p + k] = (float)(finalMat[4 * k] * in[0]
                            + finalMat[4 * k + 1] * in[1]
                            + finalMat[4 * k + 2] * in[2] + finalMat[4 * k + 3]);
                }
            };
            applyMat(im.xyz);
            applyMat(im.probe);
            im.xyz2 = im.xyz;
            im.probe2 = im.probe;
        }
        nLinear = 0;  // RANSAC replaces the linear loop (imageGroup.cxx:40-66)
        tLinear += now() - tR0;
    }

    // ---- linear loop (imageGroup.cxx:54-66, 1063-1149)
    transformLinear();
    for (int it = 0; it < nLinear; it++) {
        double t0 = now();
        if (it % 10 == 0) updateStats();
        double t1 = now(); tStats += t1 - t0;
        double sE = 0, sEW = 0;  // E = sqrt(sum w^2 d^2 / sum w^2)
#pragma omp parallel for reduction(+:sE,sEW)
        for (int i = nFixed; i < n; i++) {
            ImageData& im = images[i];
            double sDisp[3] = {0}, sA[3] = {0}, sB[3] = {0}, sA2[3] = {0}, sB2[3] = {0};
            double sW = 0;
            for (const HalfLink& lk : im.links) {
                const float* pA = &im.xyz2[3 * lk.src];
                const float* pB = &images[lk.dstImg].xyz2[3 * lk.dstPt];
                float diff[3], d2 = 0;
                for (int k = 0; k < 3; k++) { diff[k] = pB[k] - pA[k]; d2 += diff[k] * diff[k]; }
                float d = sqrtf(d2);
                float w = std::min(inlierProb(im, d), inlierProb(images[lk.dstImg], d));
                sE += (double)w * w * d2; sEW += (double)w * w;
                for (int k = 0; k < 3; k++) {
                    sDisp[k] += w * diff[k];
                    sA[k] += w * pA[k]; sB[k] += w * pB[k];
                    sA2[k] += w * pA[k] * pA[k]; sB2[k] += w * pB[k] * pB[k];
                }
                sW += w;
            }
            for (int k = 0; k < 3; k++) {
                float ns = powf((float)((sW * sB2[k] - sB[k] * sB[k]) /
                                        (sW * sA2[k] - sA[k] * sA[k])), 0.25f);
                if (std::isnan(ns)) continue;
                im.scale[k] *= ns;
                im.trans[k] += (float)(0.5 * sDisp[k] / sW + sA[k] * (1 - ns) / sW);
            }
        }
        transformLinear();
        tLinear += now() - t1;
        esLinear.push_back(sqrt(sE / std::max(sEW, 1e-30)));
    }
    // bake
    bakeAll();
    vector<float> probesLinear;
    if (probesPath)
        for (int i = 0; i < n; i++)
            probesLinear.insert(probesLinear.end(), images[i].probe.begin(),
                                images[i].probe.end());

    // ---- deformable levels (imageGroup.cxx:73-142, 159-232, 234-472)
    float alpha = alpha0;
    bool subtractMean = nFixed == 0;
    int dims[3] = {0, 0, 0}; double origin[3], spacing[3];
    size_t G = 0;
    vector<vector<float>> coeffs, grad;

    auto setupGrid = [&](double size) {
        // bbox over MOVABLE images' baked coords (imageGroup.cxx:1513-1527)
        double lo[3] = {1e30, 1e30, 1e30}, hi[3] = {-1e30, -1e30, -1e30};
        for (int i = nFixed; i < n; i++)
            for (size_t p = 0; p < images[i].xyz.size() / 3; p++)
                for (int k = 0; k < 3; k++) {
                    double v = images[i].xyz[3 * p + k];
                    lo[k] = std::min(lo[k], v); hi[k] = std::max(hi[k], v);
                }
        for (int k = 0; k < 3; k++) {
            double c = 0.5 * (lo[k] + hi[k]), half = 0.6 * (hi[k] - lo[k]);
            double len = 2 * half;
            int cells = std::max(1, (int)lround(len / size));
            spacing[k] = len / cells;
            origin[k] = (c - half) - spacing[k];
            dims[k] = cells + 3;
        }
        G = (size_t)dims[0] * dims[1] * dims[2];
        coeffs.assign(n, vector<float>(3 * G, 0.f));
        grad.assign(n, vector<float>(4 * G, 0.f));
    };

    auto bsplineApply = [&](const vector<float>& cf, const float* in, float* out) {
        double F[3][4]; int base[3];
        for (int k = 0; k < 3; k++) {
            double u = (in[k] - origin[k]) / spacing[k];
            int iu = (int)floor(u);
            bsplineWeights(F[k], u - iu);
            base[k] = iu - 1;
        }
        double disp[3] = {0, 0, 0};
        for (int c = 0; c < 4; c++) for (int b = 0; b < 4; b++) for (int a = 0; a < 4; a++) {
            int x = base[0] + a, y = base[1] + b, z = base[2] + c;
            if (x < 0 || y < 0 || z < 0 || x >= dims[0] || y >= dims[1] || z >= dims[2]) continue;
            size_t id = 3 * ((size_t)(z * dims[1] + y) * dims[0] + x);
            double w = F[0][a] * F[1][b] * F[2][c];
            for (int k = 0; k < 3; k++) disp[k] += w * cf[id + k];
        }
        for (int k = 0; k < 3; k++) out[k] = in[k] + (float)disp[k];
    };

    auto transformBspline = [&]() {
#pragma omp parallel for
        for (int i = 0; i < n; i++) {
            ImageData& im = images[i];
            size_t P = im.xyz.size() / 3;
            for (size_t p = 0; p < P; p++)
                bsplineApply(coeffs[i], &im.xyz[3 * p], &im.xyz2[3 * p]);
            for (size_t p = 0; p < im.probe.size() / 3; p++)
                bsplineApply(coeffs[i], &im.probe[3 * p], &im.probe2[3 * p]);
        }
    };

    for (int level = 0; level < nLevels; level++) {
        setupGrid(gridSize / pow(2.0, level));
        transformBspline();  // fresh zero grid: xyz2 = xyz
        int nGrids = 1, itersOnGrid = 0;
        for (int it = 0; it < nDeform; ) {
            double t0 = now();
            if (it % 10 == 0) updateStats();
            double t1 = now(); tStats += t1 - t0;
            double sE = 0, sEW = 0;  // inlier-gated: w2 = 0 below 0.5
#pragma omp parallel for reduction(+:sE,sEW)
            for (int i = nFixed; i < n; i++) {
                ImageData& im = images[i];
                std::fill(grad[i].begin(), grad[i].end(), 0.f);
                size_t P = im.xyz.size() / 3;
                vector<float> sDisp(3 * P, 0.f), sWeight(P, 0.f);
                for (const HalfLink& lk : im.links) {
                    const float* pA = &im.xyz2[3 * lk.src];
                    const float* pB = &images[lk.dstImg].xyz2[3 * lk.dstPt];
                    float diff[3], d2 = 0;
                    for (int k = 0; k < 3; k++) { diff[k] = pB[k] - pA[k]; d2 += diff[k] * diff[k]; }
                    float d = sqrtf(d2);
                    float w = std::min(inlierProb(im, d), inlierProb(images[lk.dstImg], d));
                    if (w < 0.5f) continue;
                    float w2 = w * w;
                    sE += (double)w2 * d2; sEW += (double)w2;
                    for (int k = 0; k < 3; k++) sDisp[3 * lk.src + k] += w2 * diff[k];
                    sWeight[lk.src] += w2;
                }
                for (size_t p = 0; p < P; p++) {
                    if (sWeight[p] == 0) continue;
                    double F[3][4]; int base[3];
                    for (int k = 0; k < 3; k++) {
                        double u = (im.xyz[3 * p + k] - origin[k]) / spacing[k];
                        int iu = (int)floor(u);
                        bsplineWeights(F[k], u - iu);
                        base[k] = iu - 1;
                    }
                    for (int c = 0; c < 4; c++) for (int b = 0; b < 4; b++) for (int a = 0; a < 4; a++) {
                        int x = base[0] + a, y = base[1] + b, z = base[2] + c;
                        if (x < 0 || y < 0 || z < 0 || x >= dims[0] || y >= dims[1] || z >= dims[2]) continue;
                        size_t id = 4 * ((size_t)(z * dims[1] + y) * dims[0] + x);
                        double w = F[0][a] * F[1][b] * F[2][c];
                        for (int k = 0; k < 3; k++) grad[i][id + k] += (float)(w * sDisp[3 * p + k]);
                        grad[i][id + 3] += (float)(w * sWeight[p]);
                    }
                }
                // candidate = old coeff + alpha * grad / weight (pre-mean)
                for (size_t g = 0; g < G; g++) {
                    float cw = grad[i][4 * g + 3];
                    for (int k = 0; k < 3; k++) {
                        float nv = coeffs[i][3 * g + k];
                        if (cw > 0) nv += alpha * grad[i][4 * g + k] / cw;
                        grad[i][4 * g + k] = nv;
                    }
                }
            }
            // mean subtraction barrier + diffeomorphism guard
            // (imageGroup.cxx:379-439): candidate stays in grad[] until it
            // passes; a reject discards it (the reference's "return -1")
            long nBig = 0;
#pragma omp parallel for reduction(+:nBig)
            for (long g = 0; g < (long)G; g++) {
                for (int k = 0; k < 3; k++) {
                    if (subtractMean) {
                        double sum = 0;
                        for (int i = nFixed; i < n; i++) sum += grad[i][4 * g + k];
                        sum /= n;  // divisor: total image count (:417)
                        for (int i = nFixed; i < n; i++)
                            grad[i][4 * g + k] -= (float)sum;
                    }
                    for (int i = nFixed; i < n; i++)
                        if (fabsf(grad[i][4 * g + k]) > maxRatio * spacing[k])
                            nBig++;
                }
            }
            if (guarantee && nBig > 0) {
                // reject: bake accepted grid, stack a fresh one, halve
                // alpha if this grid never succeeded (imageGroup.cxx:97-115)
                tDeform += now() - t1;
                if (itersOnGrid == 0) alpha *= 0.5f;
                bakeAll();
                coeffs.assign(n, vector<float>(3 * G, 0.f));
                transformBspline();
                nGrids++;
                itersOnGrid = 0;
                continue;
            }
#pragma omp parallel for
            for (int i = nFixed; i < n; i++)
                for (size_t g = 0; g < G; g++)
                    for (int k = 0; k < 3; k++)
                        coeffs[i][3 * g + k] = grad[i][4 * g + k];
            transformBspline();
            tDeform += now() - t1;
            esDeform.push_back(sqrt(sE / std::max(sEW, 1e-30)));
            it++; itersOnGrid++;
        }
        gridsPerLevel.push_back(nGrids);
        // bake the level (imageGroup.cxx:123-126)
        bakeAll();
    }

    if (probesPath) {
        std::string outPath = std::string(probesPath) + ".out";
        FILE* pf = fopen(outPath.c_str(), "wb");
        if (!pf) { perror("probes out"); return 1; }
        fwrite(probesLinear.data(), 4, probesLinear.size(), pf);
        for (int i = 0; i < n; i++)
            fwrite(images[i].probe.data(), 4, images[i].probe.size(), pf);
        fclose(pf);
    }

    if (dumpPath) {
        FILE* d = fopen(dumpPath, "w");
        if (!d) { perror("dump"); return 1; }
        fprintf(d, "{\"grid\": {\"dims\": [%d,%d,%d], \"origin\": [%.17g,%.17g,%.17g], "
                   "\"spacing\": [%.17g,%.17g,%.17g]},\n", dims[0], dims[1], dims[2],
                origin[0], origin[1], origin[2], spacing[0], spacing[1], spacing[2]);
        auto dumpVec = [&](const char* name, const vector<double>& v) {
            fprintf(d, "\"%s\": [", name);
            for (size_t k = 0; k < v.size(); k++)
                fprintf(d, "%s%.10g", k ? "," : "", v[k]);
            fprintf(d, "],\n");
        };
        dumpVec("es_linear", esLinear);
        dumpVec("es_deform", esDeform);
        fprintf(d, "\"ransac_inliers\": [");
        for (size_t k = 0; k < ransacInliers.size(); k++)
            fprintf(d, "%s%ld", k ? "," : "", ransacInliers[k]);
        fprintf(d, "],\n");
        fprintf(d, "\"alpha_final\": %.9g, \"grids_per_level\": [", alpha);
        for (size_t k = 0; k < gridsPerLevel.size(); k++)
            fprintf(d, "%s%d", k ? "," : "", gridsPerLevel[k]);
        fprintf(d, "],\n");
        fprintf(d, "\"images\": [");
        for (int i = 0; i < n; i++) {
            fprintf(d, "%s{\"scale\": [%.9g,%.9g,%.9g], \"trans\": [%.9g,%.9g,%.9g], "
                       "\"em\": [%.9g,%.9g,%.9g], \"coeffs\": [",
                    i ? ",\n" : "", images[i].scale[0], images[i].scale[1],
                    images[i].scale[2], images[i].trans[0], images[i].trans[1],
                    images[i].trans[2], images[i].c1, images[i].c2, images[i].ratio);
            for (size_t g = 0; g < 3 * G; g++)
                fprintf(d, "%s%.9g", g ? "," : "", coeffs[i][g]);
            fprintf(d, "], \"xyz2\": [");
            for (size_t v = 0; v < images[i].xyz2.size(); v++)
                fprintf(d, "%s%.9g", v ? "," : "", images[i].xyz2[v]);
            fprintf(d, "]}");
        }
        fprintf(d, "]}\n");
        fclose(d);
    }

    printf("{\"images\": %d, \"halfLinks\": %zu, \"stats_s\": %.4f, "
           "\"linear_s\": %.4f, \"linear_iters\": %d, \"deform_s\": %.4f, "
           "\"deform_iters\": %d, \"levels\": %d, \"grid\": [%d,%d,%d], "
           "\"threads\": %d}\n",
           n, 2 * nPairs, tStats, tLinear, nLinear, tDeform,
           nDeform * nLevels, nLevels, dims[0], dims[1], dims[2],
#ifdef _OPENMP
           omp_get_max_threads()
#else
           1
#endif
    );
    return 0;
}
