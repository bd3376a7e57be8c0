/* fastcsv — minimal, fast numeric-CSV reader for the hippie_tpu data layer.
 *
 * Parses a rectangular numeric CSV (optionally skipping a header line) into a
 * contiguous float32 buffer. Matches the semantics the pipelines rely on from
 * `pd.read_csv(path).to_numpy(dtype=np.float32)` for purely-numeric files:
 * every field after the header is parsed (including the pandas index column,
 * quirk Q4 in SURVEY.md), empty/unparsable fields become NaN.
 *
 * Exposed via ctypes (no CPython API) so the shared object builds with a bare
 * `cc -O3 -shared -fPIC` and loads from any Python.
 */

#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <math.h>

typedef struct {
    float *data;   /* rows*cols float32, row-major */
    long rows;
    long cols;
    int err;       /* 0 ok; 1 io error; 2 short rows (NaN-padded, matches
                      pandas); 3 alloc failure; 4 long rows (extra fields —
                      pandas raises ParserError; caller must not accept) */
} CsvResult;

static char *read_whole_file(const char *path, long *size_out) {
    FILE *f = fopen(path, "rb");
    if (!f) return NULL;
    fseek(f, 0, SEEK_END);
    long size = ftell(f);
    fseek(f, 0, SEEK_SET);
    char *buf = (char *)malloc((size_t)size + 1);
    if (!buf) { fclose(f); return NULL; }
    if (size > 0 && fread(buf, 1, (size_t)size, f) != (size_t)size) {
        free(buf); fclose(f); return NULL;
    }
    buf[size] = '\0';
    fclose(f);
    *size_out = size;
    return buf;
}

/* count fields in one line (separator ','); line may end with \r */
static long count_fields(const char *p, const char *end) {
    long n = 1;
    for (; p < end; ++p) if (*p == ',') ++n;
    return n;
}

/* Exact powers of ten representable as doubles (1e0..1e22). */
static const double POW10[] = {
    1e0, 1e1, 1e2, 1e3, 1e4, 1e5, 1e6, 1e7, 1e8, 1e9, 1e10, 1e11,
    1e12, 1e13, 1e14, 1e15, 1e16, 1e17, 1e18, 1e19, 1e20, 1e21, 1e22,
};

/* Fast float parse for plain decimal notation with <= 19 significant digits
 * (covers pandas-written CSVs: up to 17 sig digits, no exponent). The uint64
 * mantissa is exact; one conversion + one division give <= 2 double roundings
 * (~4e-16 relative), far below float32 resolution, so the float32 result is
 * identical to strtod's in practice (verified against pandas on every shipped
 * file). Returns 1 on success, 0 -> caller falls back to strtod. */
static int fast_parse(const char *p, const char *end, double *out) {
    int neg = 0;
    if (p < end && (*p == '-' || *p == '+')) { neg = (*p == '-'); ++p; }
    unsigned long long mant = 0;
    int digits = 0, frac = 0, seen_point = 0, any = 0;
    for (; p < end; ++p) {
        char c = *p;
        if (c >= '0' && c <= '9') {
            if (digits >= 19) return 0;
            mant = mant * 10ULL + (unsigned long long)(c - '0');
            ++digits;
            if (seen_point) ++frac;
            any = 1;
        } else if (c == '.' && !seen_point) {
            seen_point = 1;
        } else {
            return 0; /* exponent or junk -> strtod */
        }
    }
    if (!any || frac > 22) return 0;
    double v = (double)mant / POW10[frac];
    *out = neg ? -v : v;
    return 1;
}

CsvResult *fastcsv_read(const char *path, int skip_header) {
    CsvResult *res = (CsvResult *)calloc(1, sizeof(CsvResult));
    if (!res) return NULL;

    long size = 0;
    char *buf = read_whole_file(path, &size);
    if (!buf) { res->err = 1; return res; }

    /* split into lines, skipping blank trailing lines */
    char *p = buf;
    char *end = buf + size;

    if (skip_header) {
        while (p < end && *p != '\n') ++p;
        if (p < end) ++p; /* past the newline */
    }

    /* first data line determines the column count */
    char *q = p;
    while (q < end && *q != '\n') ++q;
    const char *line_end = (q > p && q[-1] == '\r') ? q - 1 : q;
    if (p >= end || line_end <= p) { res->rows = 0; res->cols = 0; free(buf); return res; }
    long cols = count_fields(p, line_end);

    /* count rows (non-empty lines) */
    long rows = 0;
    for (char *r = p; r < end;) {
        char *e = r;
        while (e < end && *e != '\n') ++e;
        const char *le = (e > r && e[-1] == '\r') ? e - 1 : e;
        if (le > r) ++rows;
        r = (e < end) ? e + 1 : end;
    }

    float *data = (float *)malloc((size_t)rows * (size_t)cols * sizeof(float));
    if (!data) { res->err = 3; free(buf); return res; }

    long row = 0;
    for (char *r = p; r < end && row < rows;) {
        char *e = r;
        while (e < end && *e != '\n') ++e;
        char *le = (e > r && e[-1] == '\r') ? e - 1 : e;
        if (le > r) {
            /* A row with MORE fields than the first data line must not be
             * silently truncated: flag it so the wrapper rejects the parse
             * (pandas raises "Expected N fields, saw M" for these). */
            if (count_fields(r, le) > cols) res->err = 4;
            long col = 0;
            char *fptr = r;
            while (col < cols) {
                char *fend = fptr;
                while (fend < le && *fend != ',') ++fend;
                if (fend == fptr) {
                    data[row * cols + col] = NAN;
                } else {
                    double v;
                    if (fast_parse(fptr, fend, &v)) {
                        data[row * cols + col] = (float)v;
                    } else {
                        char saved = *fend;
                        *fend = '\0';
                        char *parse_end = NULL;
                        v = strtod(fptr, &parse_end);
                        data[row * cols + col] = (parse_end == fptr) ? NAN : (float)v;
                        *fend = saved;
                    }
                }
                ++col;
                fptr = (fend < le) ? fend + 1 : le;
                if (fptr >= le && col < cols) {
                    /* short row: pad with NaN but flag raggedness (never
                     * downgrade a fatal long-row flag from another row) */
                    while (col < cols) data[row * cols + col++] = NAN;
                    if (res->err != 4) res->err = 2;
                }
            }
            ++row;
        }
        r = (e < end) ? e + 1 : end;
    }

    free(buf);
    res->data = data;
    res->rows = rows;
    res->cols = cols;
    return res;
}

void fastcsv_free(CsvResult *res) {
    if (!res) return;
    free(res->data);
    free(res);
}
