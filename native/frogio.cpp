// frogio — native IO codecs for the frog_tpu runtime.
//
// The reference framework's IO (keypoint csv.gz parsing/writing,
// match/match.cpp:51-208, boost gzip streams) is C++; this library is its
// counterpart here: fast float-CSV parsing and formatting with zlib gzip,
// exposed as a small C ABI consumed through ctypes
// (frog_tpu/io/native.py).  Python falls back to pandas/numpy when the
// shared object is unavailable.
//
// Build: g++ -O3 -shared -fPIC -o libfrogio.so frogio.cpp -lz

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>
#include <zlib.h>

extern "C" {

// Read a whole file, gunzipping if it ends in .gz.  Returns a malloc'd
// buffer (caller frees via frogio_free) and sets *size.
static char* read_all(const char* path, size_t* size) {
    size_t len = strlen(path);
    bool gz = len > 3 && strcmp(path + len - 3, ".gz") == 0;
    if (gz) {
        gzFile f = gzopen(path, "rb");
        if (!f) return nullptr;
        size_t cap = 1 << 20, used = 0;
        char* buf = (char*)malloc(cap);
        int n;
        while ((n = gzread(f, buf + used, cap - used)) > 0) {
            used += n;
            if (used == cap) {
                cap *= 2;
                buf = (char*)realloc(buf, cap);
            }
        }
        gzclose(f);
        *size = used;
        return buf;
    }
    FILE* f = fopen(path, "rb");
    if (!f) return nullptr;
    fseek(f, 0, SEEK_END);
    long n = ftell(f);
    fseek(f, 0, SEEK_SET);
    char* buf = (char*)malloc(n);
    if (fread(buf, 1, n, f) != (size_t)n) { fclose(f); free(buf); return nullptr; }
    fclose(f);
    *size = n;
    return buf;
}

void frogio_free(void* p) { free(p); }

// Parse comma/newline separated floats into out (row-major, `cols` per
// row).  Returns number of complete rows parsed, or -1 on IO error.
// Rows with fewer than `cols` values are skipped (matches the reference's
// "count > 6" guard, match.cpp:87).
int frogio_read_csv(const char* path, float* out, int max_rows, int cols) {
    size_t size = 0;
    char* buf = read_all(path, &size);
    if (!buf) return -1;
    int rows = 0;
    const char* p = buf;
    const char* end = buf + size;
    std::vector<float> row(cols);
    while (p < end && rows < max_rows) {
        int c = 0;
        while (p < end && *p != '\n') {
            char* next;
            float v = strtof(p, &next);
            if (next == p) { p++; continue; }
            if (c < cols) row[c] = v;
            c++;
            p = next;
            while (p < end && (*p == ',' || *p == '\r' || *p == ' ')) p++;
        }
        if (p < end) p++;  // skip newline
        if (c >= cols) {
            memcpy(out + (size_t)rows * cols, row.data(), cols * sizeof(float));
            rows++;
        }
    }
    free(buf);
    return rows;
}

// Format rows of floats as CSV ("%.9g"), gzip-compressing when the path
// ends in .gz.  Returns 0 on success.
int frogio_write_csv(const char* path, const float* data, int rows, int cols) {
    std::string out;
    out.reserve((size_t)rows * cols * 12);
    char tmp[40];
    for (int r = 0; r < rows; r++) {
        const float* rowp = data + (size_t)r * cols;
        for (int c = 0; c < cols; c++) {
            int n = snprintf(tmp, sizeof(tmp), "%.9g", rowp[c]);
            out.append(tmp, n);
            out.push_back(c + 1 < cols ? ',' : '\n');
        }
    }
    size_t len = strlen(path);
    bool gz = len > 3 && strcmp(path + len - 3, ".gz") == 0;
    if (gz) {
        gzFile f = gzopen(path, "wb1");  // level 1: IO is latency-, not size-bound
        if (!f) return -1;
        if ((size_t)gzwrite(f, out.data(), out.size()) != out.size()) {
            gzclose(f);
            return -1;
        }
        gzclose(f);
        return 0;
    }
    FILE* f = fopen(path, "wb");
    if (!f) return -1;
    bool ok = fwrite(out.data(), 1, out.size(), f) == out.size();
    fclose(f);
    return ok ? 0 : -1;
}

}  // extern "C"
