// frogio — native IO codecs for the frog_tpu runtime.
//
// The reference framework's IO (keypoint csv.gz parsing/writing,
// match/match.cpp:51-208, boost gzip streams) is C++; this library is its
// counterpart here: fast float-CSV parsing and formatting with gzip,
// exposed as a small C ABI consumed through ctypes
// (frog_tpu/io/native.py).  Python falls back to pandas/numpy when the
// shared object is unavailable.
//
// Build: g++ -O3 -shared -fPIC -o libfrogio.so frogio.cpp -ldeflate -lz
//        (or without -ldeflate/-DHAVE_LIBDEFLATE: zlib-only fallback)

#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>
#include <zlib.h>
#ifdef HAVE_LIBDEFLATE
#include <libdeflate.h>
#endif

extern "C" {

// Returns a malloc'd buffer with ONE extra NUL byte past *size (the
// strtof fallback in parse_float scans from a raw pointer and needs a
// terminator).
static char* read_raw(const char* path, size_t* size) {
    FILE* f = fopen(path, "rb");
    if (!f) return nullptr;
    long n = -1;
    if (fseek(f, 0, SEEK_END) == 0) n = ftell(f);
    if (n < 0 || fseek(f, 0, SEEK_SET) != 0) { fclose(f); return nullptr; }
    char* buf = (char*)malloc((size_t)n + 1);
    if (!buf) { fclose(f); return nullptr; }
    if (fread(buf, 1, n, f) != (size_t)n) { fclose(f); free(buf); return nullptr; }
    fclose(f);
    buf[n] = '\0';
    *size = (size_t)n;
    return buf;
}

// Read a whole file, gunzipping if it ends in .gz.  Returns a malloc'd
// buffer (caller frees via frogio_free) and sets *size.  The gunzip path
// prefers libdeflate (~3x zlib's inflate on these payloads) and falls
// back to zlib's streaming gzread on any failure (multi-member archives,
// truncation, allocation pressure).
static char* read_all(const char* path, size_t* size) {
    size_t len = strlen(path);
    bool gz = len > 3 && strcmp(path + len - 3, ".gz") == 0;
    if (!gz) return read_raw(path, size);
#ifdef HAVE_LIBDEFLATE
    {
        size_t in_size = 0;
        char* in = read_raw(path, &in_size);
        if (in && in_size >= 18) {
            struct libdeflate_decompressor* d = libdeflate_alloc_decompressor();
            size_t cap = in_size * 6 + (1 << 20);
            char* out = (char*)malloc(cap);
            size_t used = 0, consumed_total = 0;
            bool ok = d && out;
            while (ok && consumed_total < in_size) {
                size_t actual_out = 0, actual_in = 0;
                enum libdeflate_result r = libdeflate_gzip_decompress_ex(
                    d, in + consumed_total, in_size - consumed_total,
                    out + used, cap - used, &actual_in, &actual_out);
                if (r == LIBDEFLATE_INSUFFICIENT_SPACE) {
                    cap *= 2;
                    char* grown = (char*)realloc(out, cap);
                    if (!grown) { ok = false; break; }
                    out = grown;
                    continue;
                }
                if (r != LIBDEFLATE_SUCCESS) { ok = false; break; }
                used += actual_out;
                consumed_total += actual_in;
                if (actual_in == 0) break;  // safety: no progress
            }
            if (d) libdeflate_free_decompressor(d);
            if (ok) {
                char* fin = (char*)realloc(out, used + 1);
                if (fin) {
                    free(in);
                    fin[used] = '\0';
                    *size = used;
                    return fin;
                }
                ok = false;
            }
            free(out);
        }
        free(in);
        // fall through to zlib
    }
#endif
    gzFile f = gzopen(path, "rb");
    if (!f) return nullptr;
    size_t cap = 1 << 20, used = 0;
    char* buf = (char*)malloc(cap + 1);
    if (!buf) { gzclose(f); return nullptr; }
    int n;
    while ((n = gzread(f, buf + used, cap - used)) > 0) {
        used += n;
        if (used == cap) {
            cap *= 2;
            char* grown = (char*)realloc(buf, cap + 1);
            if (!grown) { gzclose(f); free(buf); return nullptr; }
            buf = grown;
        }
    }
    gzclose(f);
    buf[used] = '\0';
    *size = used;
    return buf;
}

void frogio_free(void* p) { free(p); }

// Whole-file read with transparent gunzip for .gz paths (libdeflate when
// built with it).  Returns a malloc'd buffer (free via frogio_free) and
// sets *size; NULL on failure.  Used for volume IO (.nii.gz payloads run
// ~15-30 MB; libdeflate decompresses ~3x faster than zlib/python gzip).
char* frogio_read_file(const char* path, size_t* size) {
    return read_all(path, size);
}

// Whole-file write; .gz paths gzip-compress (level 1: volume/CSV IO here
// is latency-, not size-bound — and ~20x faster than python gzip's
// default level 9 on volume payloads).  Returns 0 on success.
int frogio_write_file(const char* path, const char* data, size_t n) {
    size_t len = strlen(path);
    bool gz = len > 3 && strcmp(path + len - 3, ".gz") == 0;
    if (!gz) {
        FILE* f = fopen(path, "wb");
        if (!f) return -1;
        bool ok = fwrite(data, 1, n, f) == n;
        fclose(f);
        return ok ? 0 : -1;
    }
#ifdef HAVE_LIBDEFLATE
    {
        struct libdeflate_compressor* comp = libdeflate_alloc_compressor(1);
        if (comp) {
            size_t cap = libdeflate_gzip_compress_bound(comp, n);
            char* buf = (char*)malloc(cap);
            size_t m = buf ? libdeflate_gzip_compress(comp, data, n, buf, cap)
                           : 0;
            libdeflate_free_compressor(comp);
            if (m) {
                FILE* f = fopen(path, "wb");
                bool ok = f && fwrite(buf, 1, m, f) == m;
                if (f) fclose(f);
                free(buf);
                return ok ? 0 : -1;
            }
            free(buf);
        }
        // fall through to zlib
    }
#endif
    gzFile f = gzopen(path, "wb1");
    if (!f) return -1;
    size_t done = 0;
    while (done < n) {
        unsigned chunk = (unsigned)((n - done) > (1u << 30) ? (1u << 30)
                                                            : (n - done));
        if ((size_t)gzwrite(f, data + done, chunk) != chunk) {
            gzclose(f);
            return -1;
        }
        done += chunk;
    }
    gzclose(f);
    return 0;
}

static const double kPow10[23] = {
    1e0,  1e1,  1e2,  1e3,  1e4,  1e5,  1e6,  1e7,  1e8,  1e9,  1e10,
    1e11, 1e12, 1e13, 1e14, 1e15, 1e16, 1e17, 1e18, 1e19, 1e20, 1e21, 1e22,
};

// Fast decimal float parse.  The fast path accumulates up to 9
// SIGNIFICANT digits (leading zeros skipped) into a uint64 (exact) and
// applies one double multiply/divide by an exactly-representable power
// of ten.  fmt_g9 below never emits more than 9 significant digits, and
// the parse(fmt_g9(f)) == f bitwise round-trip across magnitude extremes
// and subnormals is verified by tests/test_pairs_io.py — so every file
// this codec writes takes the fast path and round-trips exactly.
// Anything outside that envelope (10+ significant digits, |decimal
// exponent| > 22, inf/nan spellings) falls back to strtof, which is
// correctly rounding by definition (foreign higher-precision files pay
// the slow path instead of risking a double-rounding ulp).
// Returns the end pointer, or nullptr when nothing numeric starts at p.
static inline const char* parse_float(const char* p, const char* end,
                                      float* outv) {
    const char* s = p;
    bool neg = false;
    if (p < end && (*p == '-' || *p == '+')) { neg = (*p == '-'); p++; }
    uint64_t mant = 0;
    int digits = 0, dexp = 0;
    bool any = false;
    while (p < end && *p >= '0' && *p <= '9') {
        if (mant == 0 && *p == '0') { /* leading zero: not significant */ }
        else if (digits < 19) { mant = mant * 10 + (uint64_t)(*p - '0'); digits++; }
        else dexp++;
        any = true;
        p++;
    }
    if (p < end && *p == '.') {
        p++;
        while (p < end && *p >= '0' && *p <= '9') {
            if (mant == 0 && *p == '0') {
                dexp--;  // leading fractional zero: scale only
            } else if (digits < 19) {
                mant = mant * 10 + (uint64_t)(*p - '0');
                digits++;
                dexp--;
            } else {
                digits = 19;  // excess precision: force the strtof path
            }
            any = true;
            p++;
        }
    }
    if (any && p < end && (*p == 'e' || *p == 'E')) {
        const char* ep = p + 1;
        bool eneg = false;
        if (ep < end && (*ep == '-' || *ep == '+')) { eneg = (*ep == '-'); ep++; }
        int ev = 0;
        bool ed = false;
        while (ep < end && *ep >= '0' && *ep <= '9' && ev < 10000) {
            ev = ev * 10 + (*ep - '0');
            ed = true;
            ep++;
        }
        if (ed) {
            dexp += eneg ? -ev : ev;
            p = ep;
        }
    }
    if (any && digits <= 9 && dexp >= -22 && dexp <= 22) {
        double d = (double)mant;
        d = dexp >= 0 ? d * kPow10[dexp] : d / kPow10[-dexp];
        *outv = (float)(neg ? -d : d);
        return p;
    }
    char* next;
    float v = strtof(s, &next);
    if (next == s) return nullptr;
    *outv = v;
    return next;
}

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
    while (p < end && rows < max_rows) {
        float* row = out + (size_t)rows * cols;
        int c = 0;
        while (p < end && *p != '\n') {
            float v;
            const char* next = parse_float(p, end, &v);
            if (!next) { p++; continue; }
            if (c < cols) row[c] = v;
            c++;
            p = next;
            while (p < end && (*p == ',' || *p == '\r' || *p == ' ')) p++;
        }
        if (p < end) p++;  // skip newline
        if (c >= cols) rows++;  // else: next row overwrites the partial
    }
    free(buf);
    return rows;
}

static const char kDigits2[201] =
    "00010203040506070809101112131415161718192021222324"
    "25262728293031323334353637383940414243444546474849"
    "50515253545556575859606162636465666768697071727374"
    "75767778798081828384858687888990919293949596979899";

// Fast %.9g-style float formatter: 9 significant digits, %g fixed vs
// exponential selection, trailing-zero trimming.  The 9-digit decimal
// mantissa comes from one double scaling + llround; double noise can
// shift the LAST digit by one near ties, which is harmless — any
// 9-significant-digit decimal within one unit-in-the-9th-digit of the
// value still round-trips to the identical float (a float needs at most
// 9 digits, and 1e-9 relative perturbation is far inside the half-ulp
// radius ~6e-8) — verified against a bitwise parse round-trip in
// tests/test_pairs_io.py.  Zeros/inf/nan/subnormals fall back to
// snprintf.  Returns the character count.
static inline int fmt_g9(float f, char* out) {
    if (!(f == f) || f * 0.0f != 0.0f || f == 0.0f ||
        (f > -1.1754944e-38f && f < 1.1754944e-38f)) {
        return snprintf(out, 40, "%.9g", (double)f);
    }
    char* p = out;
    double d = (double)f;
    if (d < 0) { *p++ = '-'; d = -d; }
    int e10 = (int)floor(log10(d));
    // scale to a 9-digit integer mantissa in [1e8, 1e9)
    double scale = pow(10.0, 8 - e10);
    long long m = llround(d * scale);
    if (m >= 1000000000LL) { m /= 10; e10++; }
    else if (m < 100000000LL) { m *= 10; e10--; }
    char digs[10];
    for (int i = 8; i >= 1; i -= 2) {
        int two = (int)(m % 100);
        m /= 100;
        digs[i] = (char)kDigits2[two * 2 + 1];
        digs[i - 1] = (char)kDigits2[two * 2];
    }
    digs[0] = (char)('0' + (int)m);
    int last = 8;            // index of last significant (non-zero) digit
    while (last > 0 && digs[last] == '0') last--;
    if (e10 >= -4 && e10 <= 8) {
        // %g: fixed notation iff -4 <= decimal exponent < precision (9)
        if (e10 >= 0) {
            for (int i = 0; i <= e10; i++) *p++ = i <= 8 ? digs[i] : '0';
            if (last > e10) {
                *p++ = '.';
                for (int i = e10 + 1; i <= last; i++) *p++ = digs[i];
            }
        } else {
            *p++ = '0';
            *p++ = '.';
            for (int i = 0; i < -e10 - 1; i++) *p++ = '0';
            for (int i = 0; i <= last; i++) *p++ = digs[i];
        }
    } else {
        *p++ = digs[0];
        if (last > 0) {
            *p++ = '.';
            for (int i = 1; i <= last; i++) *p++ = digs[i];
        }
        *p++ = 'e';
        int ae = e10;
        if (ae < 0) { *p++ = '-'; ae = -ae; }
        else *p++ = '+';
        if (ae >= 100) { *p++ = (char)('0' + ae / 100); ae %= 100; }
        *p++ = (char)kDigits2[ae * 2];
        *p++ = (char)kDigits2[ae * 2 + 1];
    }
    return (int)(p - out);
}

// Format rows of floats as CSV (9 significant digits, round-trip exact),
// gzip-compressing when the path ends in .gz (libdeflate when built with
// it, zlib otherwise).  Returns 0 on success.
int frogio_write_csv(const char* path, const float* data, int rows, int cols) {
    std::string out;
    out.reserve((size_t)rows * cols * 12);
    char tmp[48];
    for (int r = 0; r < rows; r++) {
        const float* rowp = data + (size_t)r * cols;
        for (int c = 0; c < cols; c++) {
            int n = fmt_g9(rowp[c], tmp);
            out.append(tmp, n);
            out.push_back(c + 1 < cols ? ',' : '\n');
        }
    }
    size_t len = strlen(path);
    bool gz = len > 3 && strcmp(path + len - 3, ".gz") == 0;
    if (!gz) {
        FILE* f = fopen(path, "wb");
        if (!f) return -1;
        bool ok = fwrite(out.data(), 1, out.size(), f) == out.size();
        fclose(f);
        return ok ? 0 : -1;
    }
#ifdef HAVE_LIBDEFLATE
    {
        struct libdeflate_compressor* comp = libdeflate_alloc_compressor(1);
        if (comp) {
            size_t cap = libdeflate_gzip_compress_bound(comp, out.size());
            char* buf = (char*)malloc(cap);
            size_t n = buf ? libdeflate_gzip_compress(
                comp, out.data(), out.size(), buf, cap) : 0;
            libdeflate_free_compressor(comp);
            if (n) {
                FILE* f = fopen(path, "wb");
                bool ok = f && fwrite(buf, 1, n, f) == n;
                if (f) fclose(f);
                free(buf);
                return ok ? 0 : -1;
            }
            free(buf);
        }
        // fall through to zlib
    }
#endif
    gzFile f = gzopen(path, "wb1");  // level 1: IO is latency-, not size-bound
    if (!f) return -1;
    if ((size_t)gzwrite(f, out.data(), out.size()) != out.size()) {
        gzclose(f);
        return -1;
    }
    gzclose(f);
    return 0;
}

}  // extern "C"
