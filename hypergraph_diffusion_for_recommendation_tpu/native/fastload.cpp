// Native data-plane: fast interaction-file parsing and id mapping.
//
// The reference's loader walks files line-by-line in Python
// (data/loader.py:24-38) and its id maps are built by per-row dict
// inserts (data/ui_graph.py:43-68). This C++ component provides the
// production-scale path: mmap'd single-pass TSV/CSV parse and an
// open-addressing first-appearance factorizer, exposed through a plain
// C ABI consumed via ctypes (no pybind11 dependency).
//
// Build: g++ -O3 -march=native -shared -fPIC fastload.cpp -o libfastload.so

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

extern "C" {

// Parse a header-skipped interaction file of "user<sep>item[...]" lines
// (sep = tab or comma). Returns the edge count; fills *users/*items with
// malloc'd int64 arrays the caller releases via hd_free.
int64_t hd_load_interactions(const char* path, int64_t** users, int64_t** items) {
    int fd = open(path, O_RDONLY);
    if (fd < 0) return -1;
    struct stat st;
    if (fstat(fd, &st) != 0) { close(fd); return -1; }
    size_t len = (size_t)st.st_size;
    if (len == 0) { close(fd); *users = nullptr; *items = nullptr; return 0; }
    const char* data = (const char*)mmap(nullptr, len, PROT_READ, MAP_PRIVATE, fd, 0);
    close(fd);
    if (data == MAP_FAILED) return -1;

    // upper bound on rows = newline count
    size_t cap = 0;
    for (size_t i = 0; i < len; ++i) cap += (data[i] == '\n');
    cap += 2;
    int64_t* u = (int64_t*)malloc(cap * sizeof(int64_t));
    int64_t* v = (int64_t*)malloc(cap * sizeof(int64_t));
    if (!u || !v) { munmap((void*)data, len); free(u); free(v); return -1; }

    size_t pos = 0;
    // skip header line (loader.py:27 `next(f)`)
    while (pos < len && data[pos] != '\n') ++pos;
    if (pos < len) ++pos;

    int64_t n = 0;
    while (pos < len) {
        // parse first integer
        while (pos < len && (data[pos] == ' ')) ++pos;
        if (pos >= len) break;
        bool neg = data[pos] == '-';
        if (neg) ++pos;
        int64_t a = 0; bool got_a = false;
        while (pos < len && data[pos] >= '0' && data[pos] <= '9') {
            a = a * 10 + (data[pos] - '0'); ++pos; got_a = true;
        }
        // separator: tab or comma (loader.py:29-32)
        while (pos < len && (data[pos] == '\t' || data[pos] == ',' || data[pos] == ' ')) ++pos;
        bool neg_b = pos < len && data[pos] == '-';
        if (neg_b) ++pos;
        int64_t b = 0; bool got_b = false;
        while (pos < len && data[pos] >= '0' && data[pos] <= '9') {
            b = b * 10 + (data[pos] - '0'); ++pos; got_b = true;
        }
        // skip rest of line (weight forced to 1.0, loader.py:36)
        while (pos < len && data[pos] != '\n') ++pos;
        if (pos < len) ++pos;
        if (got_a && got_b) {
            u[n] = neg ? -a : a;
            v[n] = neg_b ? -b : b;
            ++n;
        }
    }
    munmap((void*)data, len);
    *users = u;
    *items = v;
    return n;
}

// First-appearance factorize (pandas.factorize semantics, the id-map
// order the reference's dict inserts produce, ui_graph.py:43-52).
// codes: out int32[n]; uniques: out int64[n] (first n_unique filled).
// Returns n_unique.
int64_t hd_factorize(const int64_t* vals, int64_t n, int32_t* codes, int64_t* uniques) {
    if (n <= 0) return 0;
    // open addressing, power-of-two capacity >= 2n
    size_t cap = 16;
    while (cap < (size_t)(2 * n)) cap <<= 1;
    int64_t* keys = (int64_t*)malloc(cap * sizeof(int64_t));
    int32_t* slot_code = (int32_t*)malloc(cap * sizeof(int32_t));
    if (!keys || !slot_code) { free(keys); free(slot_code); return -1; }
    memset(slot_code, 0xFF, cap * sizeof(int32_t));  // -1 = empty

    int64_t n_unique = 0;
    const uint64_t mask = cap - 1;
    for (int64_t i = 0; i < n; ++i) {
        int64_t k = vals[i];
        uint64_t hsh = (uint64_t)k * 0x9E3779B97F4A7C15ull;
        uint64_t s = hsh & mask;
        while (true) {
            if (slot_code[s] == -1) {
                keys[s] = k;
                slot_code[s] = (int32_t)n_unique;
                uniques[n_unique] = k;
                codes[i] = (int32_t)n_unique;
                ++n_unique;
                break;
            }
            if (keys[s] == k) { codes[i] = slot_code[s]; break; }
            s = (s + 1) & mask;
        }
    }
    free(keys);
    free(slot_code);
    return n_unique;
}

// Stable argsort of (major, minor) int64 key pairs — the np.lexsort
// replacement for adjacency construction (make_adj_pair sorts every
// edge list twice per pair; np.lexsort is the host-build hot spot at
// >1M nnz). LSD radix over 16-bit digits: 2 passes on minor, then 2
// stable passes on major. Keys must be non-negative (graph ids).
// perm: out int64[n].
int64_t hd_sort_pairs(const int64_t* major, const int64_t* minor, int64_t n,
                      int64_t* perm) {
    if (n <= 0) return 0;
    int64_t* cur = perm;
    int64_t* alt = (int64_t*)malloc(n * sizeof(int64_t));
    int64_t* counts = (int64_t*)malloc(65536 * sizeof(int64_t));
    if (!alt || !counts) { free(alt); free(counts); return -1; }
    for (int64_t i = 0; i < n; ++i) cur[i] = i;

    // find max to skip dead passes
    int64_t max_major = 0, max_minor = 0;
    for (int64_t i = 0; i < n; ++i) {
        if (major[i] > max_major) max_major = major[i];
        if (minor[i] > max_minor) max_minor = minor[i];
    }

    const int64_t* keysets[2] = {minor, major};
    const int64_t maxes[2] = {max_minor, max_major};
    for (int k = 0; k < 2; ++k) {
        const int64_t* key = keysets[k];
        for (int shift = 0; shift < 64; shift += 16) {
            if ((maxes[k] >> shift) == 0 && shift > 0) break;
            memset(counts, 0, 65536 * sizeof(int64_t));
            for (int64_t i = 0; i < n; ++i)
                ++counts[(key[cur[i]] >> shift) & 0xFFFF];
            int64_t run = 0;
            for (int d = 0; d < 65536; ++d) {
                int64_t c = counts[d];
                counts[d] = run;
                run += c;
            }
            for (int64_t i = 0; i < n; ++i)
                alt[counts[(key[cur[i]] >> shift) & 0xFFFF]++] = cur[i];
            int64_t* tmp = cur; cur = alt; alt = tmp;
        }
    }
    if (cur != perm) memcpy(perm, cur, n * sizeof(int64_t));
    free(cur == perm ? alt : cur);
    free(counts);
    return 0;
}

// Single-pass blocked-COO packer (the pallas row-window layout,
// ops/pallas/segment_spmm.py:pack_blocked). Inputs are the LIVE edges
// sorted by row (pads stripped by the caller; src ids are then the
// plain positions 0..n-1). Phase 1 (out_cols == null): return the
// block count. Phase 2: fill the [n_blocks, eb] slot arrays
// (cols/vals/local_rows/src) and [n_blocks] wmap. Empty windows get
// one all-pad block so every output tile is written.
int64_t hd_pack_blocked(const int32_t* rows, const int32_t* cols,
                        const float* vals, int64_t n_live, int64_t nrows,
                        int64_t eb, int64_t rb,
                        int32_t* out_cols, float* out_vals,
                        int32_t* out_lrows, int32_t* out_src,
                        int32_t* out_wmap) {
    int64_t n_windows = (nrows + rb - 1) / rb;
    if (n_windows < 1) n_windows = 1;

    // window start offsets over the row-sorted edge array
    int64_t n_blocks = 0;
    {
        int64_t i = 0;
        for (int64_t w = 0; w < n_windows; ++w) {
            int64_t hi = (w + 1) * rb;
            int64_t start = i;
            while (i < n_live && rows[i] < hi) ++i;
            int64_t cnt = i - start;
            int64_t b = (cnt + eb - 1) / eb;
            n_blocks += b > 0 ? b : 1;
        }
    }
    if (out_cols == nullptr) return n_blocks;

    // fill: pad defaults first (cols 0, vals 0, lrows = rb, src 0)
    memset(out_cols, 0, n_blocks * eb * sizeof(int32_t));
    memset(out_vals, 0, n_blocks * eb * sizeof(float));
    memset(out_src, 0, n_blocks * eb * sizeof(int32_t));
    for (int64_t s = 0; s < n_blocks * eb; ++s) out_lrows[s] = (int32_t)rb;

    int64_t i = 0, blk = 0;
    for (int64_t w = 0; w < n_windows; ++w) {
        int64_t hi = (w + 1) * rb;
        int64_t start = i;
        while (i < n_live && rows[i] < hi) ++i;
        int64_t cnt = i - start;
        int64_t nb = cnt > 0 ? (cnt + eb - 1) / eb : 1;
        for (int64_t b = 0; b < nb; ++b) out_wmap[blk + b] = (int32_t)w;
        for (int64_t e = 0; e < cnt; ++e) {
            int64_t p = start + e;
            int64_t slot = (blk + e / eb) * eb + e % eb;
            out_cols[slot] = cols[p];
            out_vals[slot] = vals[p];
            out_lrows[slot] = (int32_t)(rows[p] - w * rb);
            out_src[slot] = (int32_t)p;
        }
        blk += nb;
    }
    return n_blocks;
}

void hd_free(void* p) { free(p); }

}  // extern "C"
