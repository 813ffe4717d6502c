// Native Matrix Market coordinate-body parser.
//
// The role of the reference's C entry-read loop (mmio.h:932,
// mmio_highlevel.h:648-682) for this framework: Python handles the
// banner/size lines and symmetry expansion; this parses the (row, col
// [, value [, imag]]) body at C speed with strtol/strtod. Returns the
// number of entries parsed — the Python wrapper falls back to the NumPy
// tokenizer on any shortfall (malformed files, exotic fields).

#include <cstdint>
#include <cstdlib>
#include <cctype>

extern "C" {

// field: 0 = pattern (no value), 1 = real/integer (1 value),
//        2 = complex (2 values; real part kept)
int64_t mm_parse_coord(const char* buf, int64_t len, int64_t nnz,
                       int32_t field, int64_t* rows, int64_t* cols,
                       double* vals) {
    const char* p = buf;
    const char* end = buf + len;
    int64_t k = 0;
    while (k < nnz) {
        char* q;
        // row
        while (p < end && std::isspace((unsigned char)*p)) ++p;
        if (p >= end) break;
        if (*p == '%') {           // stray comment line: skip it
            while (p < end && *p != '\n') ++p;
            continue;
        }
        long long r = std::strtoll(p, &q, 10);
        if (q == p) break;
        p = q;
        // col
        long long c = std::strtoll(p, &q, 10);
        if (q == p) break;
        p = q;
        double v = 1.0;
        if (field >= 1) {
            v = std::strtod(p, &q);
            if (q == p) break;
            p = q;
        }
        if (field == 2) {          // skip imaginary part
            std::strtod(p, &q);
            if (q == p) break;
            p = q;
        }
        rows[k] = (int64_t)r - 1;
        cols[k] = (int64_t)c - 1;
        vals[k] = v;
        ++k;
    }
    return k;
}

}  // extern "C"
