// Reference-equivalent CPU 3D-SURF keypoint extractor (honest baseline
// for bench.py / docs/BENCHMARKS.md, like baseline_frog/baseline_match).
//
// Same algorithm as frog_tpu/ops/surf3d (which itself re-implements the
// reference's vtkOpenSURF3D component C1): isotropic trilinear resample,
// integral volume, Hessian-determinant box-filter responses over a SURF
// scale stack (lobes 3,5,7,9,13,17,25,33), Sylvester-minor blobness gate,
// 26-neighborhood + scale non-max suppression, top-n by response,
// per-axis sub-voxel refinement, and a 48-float M-SURF-3D descriptor
// (2x2x2 subregions x 5^3 Haar samples, Gaussian weighted, normalized).
// Classic CPU formulation: per-voxel integral-volume corner reads with
// OpenMP over voxels (the reference's OpenMP style).
//
// Input: raw file [int32 dims[3]] [float spacing[3]] [float data (x-major)]
// Args:  file target_spacing n_points [out.bin]
// Output: one JSON line with phase timings.  With out.bin given, also
// dumps the keypoints for numeric parity testing against
// frog_tpu/ops/surf3d (tests/test_parity_extract.py): int32 n, then n
// rows of f32 [x, y, z (iso-voxel coords), sigma (voxels), laplacian,
// response, desc[48]].
#include <algorithm>
#include <chrono>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>
#ifdef _OPENMP
#include <omp.h>
#endif

using std::vector;
typedef std::chrono::high_resolution_clock Clock;

static double secs(Clock::time_point a, Clock::time_point b) {
  return std::chrono::duration<double>(b - a).count();
}

struct Vol {
  int nx, ny, nz;
  vector<float> d;
  float &at(int x, int y, int z) { return d[(size_t)(x * ny + y) * nz + z]; }
  float get(int x, int y, int z) const {
    return d[(size_t)(x * ny + y) * nz + z];
  }
};

// integral volume with zero pad: I[x][y][z] = sum over [0,x)x[0,y)x[0,z)
struct Integral {
  int nx, ny, nz;  // = dims + 1
  vector<double> d;
  double at(int x, int y, int z) const {
    return d[(size_t)(x * ny + y) * nz + z];
  }
  double box(int x0, int y0, int z0, int x1, int y1, int z1) const {
    // sum over voxel range [x0, x1] inclusive, clamped
    x0 = std::max(x0, 0); y0 = std::max(y0, 0); z0 = std::max(z0, 0);
    x1 = std::min(x1 + 1, nx - 1); y1 = std::min(y1 + 1, ny - 1);
    z1 = std::min(z1 + 1, nz - 1);
    if (x0 >= x1 || y0 >= y1 || z0 >= z1) return 0.0;
    return at(x1, y1, z1) - at(x0, y1, z1) - at(x1, y0, z1) - at(x1, y1, z0)
         + at(x0, y0, z1) + at(x0, y1, z0) + at(x1, y0, z0) - at(x0, y0, z0);
  }
};

static void buildIntegral(const Vol &v, Integral &I) {
  I.nx = v.nx + 1; I.ny = v.ny + 1; I.nz = v.nz + 1;
  I.d.assign((size_t)I.nx * I.ny * I.nz, 0.0);
  for (int x = 1; x < I.nx; x++)
    for (int y = 1; y < I.ny; y++) {
      double run = 0.0;
      for (int z = 1; z < I.nz; z++) {
        run += v.get(x - 1, y - 1, z - 1);
        I.d[(size_t)(x * I.ny + y) * I.nz + z] =
            run + I.at(x - 1, y, z) + I.at(x, y - 1, z) - I.at(x - 1, y - 1, z);
      }
    }
}

int main(int argc, char **argv) {
  if (argc < 4) {
    fprintf(stderr, "usage: %s volume.raw spacing n_points\n", argv[0]);
    return 1;
  }
  FILE *f = fopen(argv[1], "rb");
  if (!f) { perror("open"); return 1; }
  int dims[3]; float sp[3];
  if (fread(dims, 4, 3, f) != 3 || fread(sp, 4, 3, f) != 3) return 1;
  Vol in{dims[0], dims[1], dims[2]};
  in.d.resize((size_t)dims[0] * dims[1] * dims[2]);
  if (fread(in.d.data(), 4, in.d.size(), f) != in.d.size()) return 1;
  fclose(f);
  double target = atof(argv[2]);
  int nPoints = atoi(argv[3]);
  int threads = 1;
#ifdef _OPENMP
  threads = omp_get_max_threads();
#endif

  auto t0 = Clock::now();
  // --- isotropic trilinear resample
  Vol v;
  v.nx = std::max((int)std::floor((in.nx - 1) * sp[0] / target) + 1, 1);
  v.ny = std::max((int)std::floor((in.ny - 1) * sp[1] / target) + 1, 1);
  v.nz = std::max((int)std::floor((in.nz - 1) * sp[2] / target) + 1, 1);
  v.d.resize((size_t)v.nx * v.ny * v.nz);
#pragma omp parallel for schedule(static)
  for (int x = 0; x < v.nx; x++)
    for (int y = 0; y < v.ny; y++)
      for (int z = 0; z < v.nz; z++) {
        double u[3] = {x * target / sp[0], y * target / sp[1],
                       z * target / sp[2]};
        int i0[3]; double fr[3];
        int nin[3] = {in.nx, in.ny, in.nz};
        for (int a = 0; a < 3; a++) {
          i0[a] = std::min((int)std::floor(u[a]), nin[a] - 2);
          i0[a] = std::max(i0[a], 0);
          fr[a] = std::min(std::max(u[a] - i0[a], 0.0), 1.0);
        }
        double c = 0;
        for (int dx = 0; dx < 2; dx++)
          for (int dy = 0; dy < 2; dy++)
            for (int dz = 0; dz < 2; dz++)
              c += in.get(i0[0] + dx, i0[1] + dy, i0[2] + dz) *
                   (dx ? fr[0] : 1 - fr[0]) * (dy ? fr[1] : 1 - fr[1]) *
                   (dz ? fr[2] : 1 - fr[2]);
        v.at(x, y, z) = (float)c;
      }
  auto t1 = Clock::now();

  // --- integral volume + Hessian responses over the scale stack
  Integral I;
  buildIntegral(v, I);
  const int lobes[] = {3, 5, 7, 9, 13, 17, 25, 33};
  const int S = 8;
  size_t nvox = (size_t)v.nx * v.ny * v.nz;
  vector<vector<float>> resp(S), laps(S);
  for (int s = 0; s < S; s++) { resp[s].assign(nvox, 0.f); laps[s].assign(nvox, 0.f); }

  for (int s = 0; s < S; s++) {
    int m = lobes[s];
    int w = 2 * m - 1, hw = w / 2, hm = m / 2, h = (m + 1) / 2;
    double norm = 1.0 / ((double)(3 * m) * (3 * m) * (3 * m));
    int b = (3 * m) / 2 + 1;  // border band
#pragma omp parallel for schedule(dynamic, 4)
    for (int x = b; x < v.nx - b; x++)
      for (int y = b; y < v.ny - b; y++)
        for (int z = b; z < v.nz - b; z++) {
          // lobe boxes (m, w, w) along each probed axis
          auto B = [&](int cx, int cy, int cz, int ex, int ey, int ez) {
            return I.box(cx - ex, cy - ey, cz - ez, cx + ex, cy + ey, cz + ez);
          };
          double dxx = B(x - m, y, z, hm, hw, hw) - 2 * B(x, y, z, hm, hw, hw)
                     + B(x + m, y, z, hm, hw, hw);
          double dyy = B(x, y - m, z, hw, hm, hw) - 2 * B(x, y, z, hw, hm, hw)
                     + B(x, y + m, z, hw, hm, hw);
          double dzz = B(x, y, z - m, hw, hw, hm) - 2 * B(x, y, z, hw, hw, hm)
                     + B(x, y, z + m, hw, hw, hm);
          double dxy = B(x - h, y - h, z, hm, hm, hw) + B(x + h, y + h, z, hm, hm, hw)
                     - B(x - h, y + h, z, hm, hm, hw) - B(x + h, y - h, z, hm, hm, hw);
          double dxz = B(x - h, y, z - h, hm, hw, hm) + B(x + h, y, z + h, hm, hw, hm)
                     - B(x - h, y, z + h, hm, hw, hm) - B(x + h, y, z - h, hm, hw, hm);
          double dyz = B(x, y - h, z - h, hw, hm, hm) + B(x, y + h, z + h, hw, hm, hm)
                     - B(x, y - h, z + h, hw, hm, hm) - B(x, y + h, z - h, hw, hm, hm);
          dxx *= norm; dyy *= norm; dzz *= norm;
          dxy *= norm * 0.9; dxz *= norm * 0.9; dyz *= norm * 0.9;
          double det = dxx * dyy * dzz + 2 * dxy * dxz * dyz - dxx * dyz * dyz
                     - dyy * dxz * dxz - dzz * dxy * dxy;
          double minor2 = dxx * dyy - dxy * dxy;
          size_t idx = (size_t)(x * v.ny + y) * v.nz + z;
          if (minor2 > 0 && det * dxx > 0) resp[s][idx] = (float)std::fabs(det);
          laps[s][idx] = dxx + dyy + dzz > 0 ? 1.f : -1.f;
        }
  }
  auto t2 = Clock::now();

  // --- 26-neighborhood + scale-neighbor NMS, threshold 0
  struct Peak { float r; int s, x, y, z; };
  vector<Peak> peaks;
#pragma omp parallel
  {
    vector<Peak> local;
#pragma omp for schedule(dynamic, 4)
    for (int x = 1; x < v.nx - 1; x++)
      for (int y = 1; y < v.ny - 1; y++)
        for (int z = 1; z < v.nz - 1; z++)
          for (int s = 0; s < S; s++) {
            size_t idx = (size_t)(x * v.ny + y) * v.nz + z;
            float r = resp[s][idx];
            if (r <= 0) continue;
            bool peak = true;
            for (int ds = -1; ds <= 1 && peak; ds++) {
              if (s + ds < 0 || s + ds >= S) continue;
              for (int dx = -1; dx <= 1 && peak; dx++)
                for (int dy = -1; dy <= 1 && peak; dy++)
                  for (int dz = -1; dz <= 1 && peak; dz++) {
                    if (ds == 0 && dx == 0 && dy == 0 && dz == 0) continue;
                    float o = resp[s + ds][(size_t)((x + dx) * v.ny + y + dy) *
                                               v.nz + z + dz];
                    // same scale: survive ties (r >= neighborhood max);
                    // scale neighbors: strictly greater
                    if (ds == 0 ? (o > r) : (o >= r)) peak = false;
                  }
            }
            if (peak) local.push_back({r, s, x, y, z});
          }
#pragma omp critical
    peaks.insert(peaks.end(), local.begin(), local.end());
  }
  int keep = std::min((size_t)nPoints, peaks.size());
  std::partial_sort(peaks.begin(), peaks.begin() + keep, peaks.end(),
                    [](const Peak &a, const Peak &b) { return a.r > b.r; });
  peaks.resize(keep);
  auto t3 = Clock::now();

  // --- sub-voxel refinement + descriptors
  const int SAMPLES = 5;
  const double SUBREGION_SIGMA = 2.5, WEIGHT_SIGMA = 3.3;
  vector<float> desc((size_t)keep * 48, 0.f);
#pragma omp parallel for schedule(dynamic, 16)
  for (int k = 0; k < keep; k++) {
    Peak &p = peaks[k];
    double pos[3] = {(double)p.x, (double)p.y, (double)p.z};
    // per-axis parabola
    int c[3] = {p.x, p.y, p.z};
    for (int a = 0; a < 3; a++) {
      int lo[3] = {p.x, p.y, p.z}, hi[3] = {p.x, p.y, p.z};
      lo[a]--; hi[a]++;
      int na[3] = {v.nx, v.ny, v.nz};
      if (c[a] <= 0 || c[a] >= na[a] - 1) continue;
      float fl = resp[p.s][(size_t)(lo[0] * v.ny + lo[1]) * v.nz + lo[2]];
      float fh = resp[p.s][(size_t)(hi[0] * v.ny + hi[1]) * v.nz + hi[2]];
      float fc = p.r;
      double den = fl - 2.0 * fc + fh;
      if (std::fabs(den) > 1e-12)
        pos[a] += std::min(std::max(0.5 * (fl - fh) / den, -0.5), 0.5);
    }
    double sigma = 1.2 * (3.0 * lobes[p.s]) / 9.0;
    int hsize = std::max((int)std::lround(sigma), 1);
    double off0 = -SUBREGION_SIGMA, step = 2 * SUBREGION_SIGMA / SAMPLES;
    float feats[8][6];
    memset(feats, 0, sizeof feats);
    for (int sub = 0; sub < 8; sub++) {
      double sc[3] = {(sub & 4) ? SUBREGION_SIGMA : -SUBREGION_SIGMA,
                      (sub & 2) ? SUBREGION_SIGMA : -SUBREGION_SIGMA,
                      (sub & 1) ? SUBREGION_SIGMA : -SUBREGION_SIGMA};
      (void)sc; (void)off0; (void)step;
      for (int ix = 0; ix < SAMPLES; ix++)
        for (int iy = 0; iy < SAMPLES; iy++)
          for (int iz = 0; iz < SAMPLES; iz++) {
            double within[3] = {
                (ix - (SAMPLES - 1) / 2.0) * (2 * SUBREGION_SIGMA / SAMPLES),
                (iy - (SAMPLES - 1) / 2.0) * (2 * SUBREGION_SIGMA / SAMPLES),
                (iz - (SAMPLES - 1) / 2.0) * (2 * SUBREGION_SIGMA / SAMPLES)};
            double offs[3] = {sc[0] + within[0], sc[1] + within[1],
                              sc[2] + within[2]};
            double r2 = offs[0]*offs[0] + offs[1]*offs[1] + offs[2]*offs[2];
            double gw = std::exp(-r2 / (2 * WEIGHT_SIGMA * WEIGHT_SIGMA));
            int sx = (int)std::lround(pos[0] + sigma * offs[0]);
            int sy = (int)std::lround(pos[1] + sigma * offs[1]);
            int sz = (int)std::lround(pos[2] + sigma * offs[2]);
            // Haar halves are the canonical SURF non-overlapping boxes:
            // positive half voxels [c, c+s-1], negative [c-s, c-1], free
            // axes [c-s, c+s-1] (matches ops/surf3d/descriptor.py _haar)
            int s = hsize;
            double dx = I.box(sx, sy - s, sz - s, sx + s - 1, sy + s - 1, sz + s - 1)
                      - I.box(sx - s, sy - s, sz - s, sx - 1, sy + s - 1, sz + s - 1);
            double dy = I.box(sx - s, sy, sz - s, sx + s - 1, sy + s - 1, sz + s - 1)
                      - I.box(sx - s, sy - s, sz - s, sx + s - 1, sy - 1, sz + s - 1);
            double dz = I.box(sx - s, sy - s, sz, sx + s - 1, sy + s - 1, sz + s - 1)
                      - I.box(sx - s, sy - s, sz - s, sx + s - 1, sy + s - 1, sz - 1);
            feats[sub][0] += gw * dx; feats[sub][1] += gw * std::fabs(dx);
            feats[sub][2] += gw * dy; feats[sub][3] += gw * std::fabs(dy);
            feats[sub][4] += gw * dz; feats[sub][5] += gw * std::fabs(dz);
          }
    }
    double nrm = 0;
    for (int i = 0; i < 48; i++) nrm += feats[i / 6][i % 6] * feats[i / 6][i % 6];
    nrm = std::sqrt(std::max(nrm, 1e-24));
    for (int i = 0; i < 48; i++)
      desc[(size_t)k * 48 + i] = (float)(feats[i / 6][i % 6] / nrm);
  }
  auto t4 = Clock::now();

  if (argc > 4) {
    FILE *out = fopen(argv[4], "wb");
    if (!out) { perror("open out"); return 1; }
    int32_t n = keep;
    fwrite(&n, 4, 1, out);
    for (int k = 0; k < keep; k++) {
      Peak &p = peaks[k];
      double pos[3] = {(double)p.x, (double)p.y, (double)p.z};
      int c[3] = {p.x, p.y, p.z};
      for (int a = 0; a < 3; a++) {
        int lo[3] = {p.x, p.y, p.z}, hi[3] = {p.x, p.y, p.z};
        lo[a]--; hi[a]++;
        int na[3] = {v.nx, v.ny, v.nz};
        if (c[a] <= 0 || c[a] >= na[a] - 1) continue;
        float fl = resp[p.s][(size_t)(lo[0] * v.ny + lo[1]) * v.nz + lo[2]];
        float fh = resp[p.s][(size_t)(hi[0] * v.ny + hi[1]) * v.nz + hi[2]];
        float fc = p.r;
        double den = fl - 2.0 * fc + fh;
        if (std::fabs(den) > 1e-12)
          pos[a] += std::min(std::max(0.5 * (fl - fh) / den, -0.5), 0.5);
      }
      float row[6] = {(float)pos[0], (float)pos[1], (float)pos[2],
                      (float)(1.2 * (3.0 * lobes[p.s]) / 9.0),
                      laps[p.s][(size_t)(p.x * v.ny + p.y) * v.nz + p.z],
                      p.r};
      fwrite(row, 4, 6, out);
      fwrite(&desc[(size_t)k * 48], 4, 48, out);
    }
    fclose(out);
  }

  printf(
      "{\"resample_s\": %.3f, \"detect_s\": %.3f, \"nms_s\": %.3f, "
      "\"descriptor_s\": %.3f, \"total_s\": %.3f, \"n_points\": %d, "
      "\"iso_dims\": [%d, %d, %d], \"threads\": %d}\n",
      secs(t0, t1), secs(t1, t2), secs(t2, t3), secs(t3, t4), secs(t0, t4),
      keep, v.nx, v.ny, v.nz, threads);
  return 0;
}
