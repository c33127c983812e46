// Native stRPHmm engine: tiling-path merge, forward-backward, pruning.
//
// Parity: impl/hmm.c, impl/coordination.c, impl/column.c, impl/mergeColumn.c,
// impl/partitions.c, impl/emissions.c of the reference — by way of the
// Python oracle in margin_tpu/phase/rphmm.py, which this engine mirrors
// operation-for-operation (same construction order, same stable sorts, same
// float64 +/max arithmetic). The merge tree is thousands of tiny
// column/merge-cell operations per chunk: pointer-heavy work that belongs on
// the host CPU at C speed (the chip handles the dense batched scoring), so
// the Python loop overhead — ~15 s per 1 Mb chunk set — collapses to
// milliseconds here while the outputs stay identical.
//
// Numerics notes:
//  * maxNotSumTransitions=true keeps FB to float64 + and max only: exact.
//  * pruning avoids exp() entirely: posteriors are sorted by the monotone
//    key min(fwd+bwd-total, 0) whose ties reproduce numpy's clip-at-1.0
//    ties; only the keep-threshold compare evaluates exp (std::exp vs
//    numpy's SIMD exp can differ ~1 ulp — a knife-edge only at the exact
//    threshold boundary).
//  * the sum-transition path implements numpy's npy_logaddexp formula
//    verbatim (libm log1p/exp), matching the oracle bit-for-bit on glibc.

#include <algorithm>
#include <atomic>
#include <cassert>
#include <cmath>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <deque>
#include <memory>
#include <mutex>
#include <stdexcept>
#include <thread>
#include <unordered_map>
#include <unordered_set>
#include <vector>

#if defined(__AVX512VPOPCNTDQ__)
#include <immintrin.h>
#endif

namespace {

typedef uint64_t u64;
typedef int64_t i64;
typedef int32_t i32;

const double NEG_INF = -INFINITY;

inline u64 accept_mask(int depth) {
    return depth < 64 ? ((u64(1) << depth) - 1) : ~u64(0);
}

// Weighted popcount of 8 bit-planes against one mask:
//   sum_k popcount(planes[k] & m) << k
// — the emissions inner step (emissions.c:125-138). With AVX-512
// VPOPCNTDQ the whole 8-plane sweep is one vector popcount.
inline i64 wpopcnt8(const u64* planes, u64 m) {
#if defined(__AVX512VPOPCNTDQ__)
    __m512i p = _mm512_loadu_si512((const void*)planes);
    __m512i mm = _mm512_set1_epi64((long long)m);
    __m512i c = _mm512_popcnt_epi64(_mm512_and_si512(p, mm));
    const __m512i sh = _mm512_set_epi64(7, 6, 5, 4, 3, 2, 1, 0);
    return (i64)_mm512_reduce_add_epi64(_mm512_sllv_epi64(c, sh));
#else
    i64 v = 0;
    for (int k = 0; k < 8; k++)
        v += (i64)__builtin_popcountll(planes[k] & m) << k;
    return v;
#endif
}

// Extra worker threads the RP engines of this process may hold at once
// (the reference parallelizes its merge recursion with omp sections,
// coordination.c:380-396). A process-global budget: concurrent chunk
// threads naturally exhaust it and run sequentially, while a single-chunk
// run fans its merge tree over the idle cores. MARGIN_TPU_RP_THREADS
// overrides the total thread count (1 = fully sequential).
std::atomic<int> g_thread_budget{0};
std::once_flag g_budget_once;

void init_thread_budget() {
    std::call_once(g_budget_once, [] {
        const char* e = getenv("MARGIN_TPU_RP_THREADS");
        int n = e ? atoi(e) : (int)std::thread::hardware_concurrency();
        g_thread_budget.store(n > 1 ? n - 1 : 0);
    });
}

bool try_acquire_thread() {
    int v = g_thread_budget.load(std::memory_order_relaxed);
    while (v > 0) {
        if (g_thread_budget.compare_exchange_weak(v, v - 1)) return true;
    }
    return false;
}

void release_thread() { g_thread_budget.fetch_add(1); }

struct Params {
    i64 max_partitions;
    i64 min_partitions;
    double min_posterior;
    bool include_inverted;
    bool max_not_sum;
};

struct Ref {
    i64 n_sites;
    const i32* allele_number;
    const i64* allele_offset;  // n_sites + 1
    const uint16_t* priors;    // flat, indexed by allele_offset
    const uint16_t* subs;      // flat per-site A*A
    const i64* sub_offset;     // n_sites + 1
};

struct PSeqs {
    i64 n;
    const i32* ref_start;
    const i32* length;
    const i64* allele_offset;
    const uint8_t* probs;
    const i64* probs_offset;
    const i32* rank;  // dense read_id rank (string order stand-in)
};

// numpy's npy_logaddexp, verbatim semantics
inline double np_logaddexp(double x, double y) {
    if (x == y) return x + 0.693147180559945286226764;  // NPY_LOGE2
    double tmp = x - y;
    if (tmp > 0) return x + log1p(exp(-tmp));
    if (tmp <= 0) return y + log1p(exp(tmp));
    return tmp;  // NaN
}

// Open-addressing u64 -> i32 map (linear probing, splitmix64 hash).
// The merge tree performs millions of tiny lookups/dedups per chunk;
// std::unordered_map's node allocations dominated the engine profile.
struct U64Map {
    std::vector<u64> keys;
    std::vector<i32> vals;
    std::vector<uint8_t> used;
    u64 mask = 0;

    static inline u64 mix(u64 x) {  // splitmix64 finalizer
        x += 0x9E3779B97F4A7C15ULL;
        x = (x ^ (x >> 30)) * 0xBF58476D1CE4E5B9ULL;
        x = (x ^ (x >> 27)) * 0x94D049BB133111EBULL;
        return x ^ (x >> 31);
    }
    void reset(size_t n) {
        size_t cap = 16;
        while (cap < n * 2) cap <<= 1;
        if (cap > keys.size()) {
            keys.resize(cap);
            vals.resize(cap);
            used.assign(cap, 0);
        } else {
            std::fill(used.begin(), used.begin() + cap, 0);
        }
        mask = cap - 1;
    }
    // insert if absent; returns true if inserted
    inline bool insert(u64 k, i32 v) {
        u64 i = mix(k) & mask;
        while (used[i]) {
            if (keys[i] == k) return false;
            i = (i + 1) & mask;
        }
        used[i] = 1;
        keys[i] = k;
        vals[i] = v;
        return true;
    }
    inline i32 get(u64 k) const {
        u64 i = mix(k) & mask;
        while (used[i]) {
            if (keys[i] == k) return vals[i];
            i = (i + 1) & mask;
        }
        return -1;
    }
};

struct Merge {
    u64 mask_from = 0, mask_to = 0;
    std::vector<u64> from_parts, to_parts;
    U64Map from_index, to_index;
    std::vector<double> fwd, bwd;

    void build_index() {
        from_index.reset(from_parts.size());
        to_index.reset(to_parts.size());
        for (size_t i = 0; i < from_parts.size(); i++)
            from_index.insert(from_parts[i], (i32)i);
        for (size_t i = 0; i < to_parts.size(); i++)
            to_index.insert(to_parts[i], (i32)i);
    }
    i32 next_idx(u64 part) const {  // mergeColumn.c:63-70; -1 if absent
        return from_index.get(part & mask_from);
    }
    i32 prev_idx(u64 part) const {  // mergeColumn.c:72-79
        return to_index.get(part & mask_to);
    }
};

struct Column {
    i32 ref_start = 0, length = 0;
    std::vector<i32> seqs;  // indices into PSeqs; bit i of a partition
    std::vector<u64> parts;
    std::vector<double> fwd, bwd, emis;
    double total = NEG_INF;
    int depth() const { return (int)seqs.size(); }
};

struct Hmm {
    i32 ref_start = 0;
    i64 ref_length = 0;
    std::vector<i32> seqs;
    std::deque<Column> cols;    // deque: stable refs under push/insert
    std::deque<Merge> merges;
    i64 uid;
    double fwd_lp = NEG_INF, bwd_lp = NEG_INF;
};

struct Engine {
    Ref ref;
    PSeqs ps;
    Params prm;
    i64 uid_counter = 0;
    std::deque<Hmm> arena;     // deque: pointer-stable under emplace_back
    std::mutex arena_mu;       // merge-tree tasks allocate concurrently
    std::atomic<bool> failed{false};

    Hmm* new_hmm() {
        std::lock_guard<std::mutex> lk(arena_mu);
        arena.emplace_back();
        arena.back().uid = uid_counter++;
        return &arena.back();
    }

    // -- sort key (hmm.c:67-95 via rphmm.py sort_key) -----------------------
    // (ref_start asc, length desc, first read rank, uid)
    bool key_less(const Hmm* a, const Hmm* b) const {
        if (a->ref_start != b->ref_start) return a->ref_start < b->ref_start;
        if (a->ref_length != b->ref_length) return a->ref_length > b->ref_length;
        i32 ra = a->seqs.empty() ? -1 : ps.rank[a->seqs[0]];
        i32 rb = b->seqs.empty() ? -1 : ps.rank[b->seqs[0]];
        if (ra != rb) return ra < rb;
        return a->uid < b->uid;
    }

    static bool overlaps(const Hmm* a, const Hmm* b) {
        if (a->ref_start > b->ref_start) return overlaps(b, a);
        return a->ref_start + a->ref_length > b->ref_start;
    }

    // -- constructors --------------------------------------------------------

    Hmm* from_profile_seq(i32 idx) {  // hmm.c:97-133
        Hmm* h = new_hmm();
        h->ref_start = ps.ref_start[idx];
        h->ref_length = ps.length[idx];
        h->seqs = {idx};
        h->cols.emplace_back();
        Column& c = h->cols.back();
        c.ref_start = ps.ref_start[idx];
        c.length = ps.length[idx];
        c.seqs = {idx};
        c.parts = {1, 0};
        return h;
    }

    // -- fuse / align / cross product ---------------------------------------

    Hmm* fuse(Hmm* left, Hmm* right) {  // hmm.c:283-372
        Hmm* h = new_hmm();
        h->ref_start = left->ref_start;
        h->ref_length =
            right->ref_start + right->ref_length - left->ref_start;
        h->seqs = left->seqs;
        h->seqs.insert(h->seqs.end(), right->seqs.begin(), right->seqs.end());
        h->cols = left->cols;
        h->merges = left->merges;
        h->merges.emplace_back();
        h->merges.back().from_parts = {0};
        h->merges.back().to_parts = {0};
        h->merges.back().build_index();
        i64 gap = right->ref_start - (left->ref_start + left->ref_length);
        if (gap > 0) {
            h->cols.emplace_back();
            Column& c = h->cols.back();
            c.ref_start = (i32)(left->ref_start + left->ref_length);
            c.length = (i32)gap;
            c.parts = {0};
            h->merges.emplace_back();
            h->merges.back().from_parts = {0};
            h->merges.back().to_parts = {0};
            h->merges.back().build_index();
        }
        h->cols.insert(h->cols.end(), right->cols.begin(), right->cols.end());
        h->merges.insert(h->merges.end(), right->merges.begin(),
                         right->merges.end());
        return h;
    }

    static void pad_prefix(Hmm* h, i32 new_start) {  // hmm.c:396-424
        Column c;
        c.ref_start = new_start;
        c.length = h->ref_start - new_start;
        c.parts = {0};
        Merge m;
        m.from_parts = {0};
        m.to_parts = {0};
        m.build_index();
        h->cols.push_front(c);
        h->merges.push_front(m);
        h->ref_length += h->ref_start - new_start;
        h->ref_start = new_start;
    }

    static void pad_suffix(Hmm* h, i64 new_length) {  // hmm.c:435-462
        const Column& last = h->cols.back();
        i64 start = last.ref_start + last.length;
        Column c;
        c.ref_start = (i32)start;
        c.length = (i32)(h->ref_start + new_length - start);
        c.parts = {0};
        Merge m;
        m.from_parts = {0};
        m.to_parts = {0};
        m.build_index();
        h->cols.push_back(c);
        h->merges.push_back(m);
        h->ref_length = new_length;
    }

    static void split_column(Hmm* h, size_t idx, i32 first_len) {
        // column.c:70-124: identity merge column between the halves
        Column& col = h->cols[idx];
        Column rcol;
        rcol.ref_start = col.ref_start + first_len;
        rcol.length = col.length - first_len;
        rcol.seqs = col.seqs;
        rcol.parts = col.parts;
        u64 mask = accept_mask(col.depth());
        Merge m;
        m.mask_from = m.mask_to = mask;
        m.from_parts = col.parts;
        m.to_parts = col.parts;
        m.build_index();
        col.length = first_len;
        h->cols.insert(h->cols.begin() + idx + 1, rcol);
        h->merges.insert(h->merges.begin() + idx, m);
    }

    static void align_columns(Hmm* h1, Hmm* h2) {  // hmm.c:374-507
        if (h1->ref_start != h2->ref_start) {
            if (h1->ref_start < h2->ref_start)
                pad_prefix(h2, h1->ref_start);
            else
                pad_prefix(h1, h2->ref_start);
        }
        if (h1->ref_length != h2->ref_length) {
            if (h1->ref_length > h2->ref_length)
                pad_suffix(h2, h1->ref_length);
            else
                pad_suffix(h1, h2->ref_length);
        }
        for (size_t i = 0; i < h1->cols.size() || i < h2->cols.size(); i++) {
            Column& c1 = h1->cols[i];
            Column& c2 = h2->cols[i];
            if (c1.length > c2.length)
                split_column(h1, i, c2.length);
            else if (c2.length > c1.length)
                split_column(h2, i, c1.length);
        }
    }

    // reused scratch; thread_local so concurrent merge-tree tasks (and
    // concurrent chunk-level engine calls) never share it
    static U64Map& dedup_scratch() {
        static thread_local U64Map s;
        return s;
    }

    // order-preserving dedup of an interleaved {p, ~p} stream
    // (reproduces rphmm.py's np.unique(return_index) + sort(first))
    void dedup_keep_first(const std::vector<u64>& vals,
                          std::vector<i64>& keep) {
        U64Map& dedup_set = dedup_scratch();
        dedup_set.reset(vals.size());
        keep.clear();
        for (size_t i = 0; i < vals.size(); i++)
            if (dedup_set.insert(vals[i], 0)) keep.push_back((i64)i);
    }

    Hmm* cross_product(Hmm* h1, Hmm* h2) {  // hmm.c:534-750
        Hmm* h = new_hmm();
        h->ref_start = h1->ref_start;
        h->ref_length = h1->ref_length;
        h->seqs = h1->seqs;
        h->seqs.insert(h->seqs.end(), h2->seqs.begin(), h2->seqs.end());
        size_t nc = h1->cols.size();
        std::vector<u64> mm, inter, fps, tps, inter_f, inter_t;
        std::vector<i64> keep;
        for (size_t ci = 0; ci < nc; ci++) {
            const Column& c1 = h1->cols[ci];
            const Column& c2 = h2->cols[ci];
            int d1 = c1.depth(), d2 = c2.depth();
            int depth = d1 + d2;
            mm.clear();
            mm.reserve(c1.parts.size() * c2.parts.size());
            for (u64 p1 : c1.parts)  // p1-major (reference nested order)
                for (u64 p2 : c2.parts) mm.push_back((p2 << d1) | p1);
            h->cols.emplace_back();
            Column& c = h->cols.back();
            c.ref_start = c1.ref_start;
            c.length = c1.length;
            c.seqs = c1.seqs;
            c.seqs.insert(c.seqs.end(), c2.seqs.begin(), c2.seqs.end());
            if (prm.include_inverted && depth > 0) {
                u64 full = accept_mask(depth);
                inter.clear();
                inter.reserve(mm.size() * 2);
                for (u64 p : mm) {
                    inter.push_back(p);
                    inter.push_back(full & ~p);
                }
                dedup_keep_first(inter, keep);
                c.parts.reserve(keep.size());
                for (i64 k : keep) c.parts.push_back(inter[k]);
            } else {
                c.parts = mm;
            }
            if (ci + 1 < nc) {
                const Merge& m1 = h1->merges[ci];
                const Merge& m2 = h2->merges[ci];
                int d1n = h1->cols[ci + 1].depth();
                int d2n = h2->cols[ci + 1].depth();
                h->merges.emplace_back();
                Merge& m = h->merges.back();
                m.mask_from = ((m2.mask_from << d1) | m1.mask_from);
                m.mask_to = ((m2.mask_to << d1n) | m1.mask_to);
                fps.clear();
                tps.clear();
                for (size_t i1 = 0; i1 < m1.from_parts.size(); i1++)
                    for (size_t i2 = 0; i2 < m2.from_parts.size(); i2++) {
                        fps.push_back((m2.from_parts[i2] << d1)
                                      | m1.from_parts[i1]);
                        tps.push_back((m2.to_parts[i2] << d1n)
                                      | m1.to_parts[i1]);
                    }
                if (prm.include_inverted && m.mask_from != 0) {
                    u64 ffm = m.mask_from & accept_mask(d1 + d2);
                    u64 ttm = m.mask_to & accept_mask(d1n + d2n);
                    inter_f.clear();
                    inter_t.clear();
                    inter_f.reserve(fps.size() * 2);
                    inter_t.reserve(tps.size() * 2);
                    for (size_t i = 0; i < fps.size(); i++) {
                        inter_f.push_back(fps[i]);
                        inter_f.push_back(ffm & ~fps[i]);
                        inter_t.push_back(tps[i]);
                        inter_t.push_back(ttm & ~tps[i]);
                    }
                    dedup_keep_first(inter_f, keep);
                    m.from_parts.reserve(keep.size());
                    m.to_parts.reserve(keep.size());
                    for (i64 k : keep) {
                        m.from_parts.push_back(inter_f[k]);
                        m.to_parts.push_back(inter_t[k]);
                    }
                } else {
                    // mask_from == 0 (no shared reads): nothing to invert,
                    // the cross-product pairs pass through unchanged
                    m.from_parts = fps;
                    m.to_parts = tps;
                }
                m.build_index();
            }
        }
        return h;
    }

    // -- emissions (emissions.c:125-240 via rphmm.py) ------------------------

    void column_emissions(const Column& col, bool include_ancestor,
                          std::vector<double>& out) const {
        size_t n_cells = col.parts.size();
        out.assign(n_cells, 0.0);
        int d = col.depth();
        if (d == 0 || col.length == 0) return;
        i64 a0 = ref.allele_offset[col.ref_start];
        i64 a1 = ref.allele_offset[col.ref_start + col.length];
        i64 width = a1 - a0;
        // Bit-plane popcounts (the reference's own trick, emissions.c:77-138):
        // pack bit k of every member read's uint8 prob into a u64 whose
        // lanes are reads; a partition's prob-sum for an allele is then
        // wpopcnt8(planes, mask). Planes for the whole column span are
        // packed once; the complement sum needs NO second popcount sweep:
        // planes only carry member-read bits and every partition is a
        // subset of the accept mask, so sum(~m) = sum(all) - sum(m) exactly.
        static thread_local std::vector<u64> planes;
        static thread_local std::vector<i64> tot;
        planes.assign((size_t)width * 8, 0);
        tot.resize(width);
        for (i64 a = 0; a < width; a++) {
            u64* pl = &planes[(size_t)a * 8];
            for (int i = 0; i < d; i++) {
                i32 sidx = col.seqs[i];
                uint8_t v = ps.probs[ps.probs_offset[sidx]
                                     + (a0 - ps.allele_offset[sidx]) + a];
                for (int k = 0; k < 8; k++)
                    pl[k] |= (u64)((v >> k) & 1) << i;
            }
            tot[a] = wpopcnt8(pl, ~u64(0));
        }
        static thread_local std::vector<i64> h1v, h2v;
        for (size_t c = 0; c < n_cells; c++) {
            u64 m = col.parts[c];
            i64 total_c = 0;
            for (i64 s = col.ref_start; s < col.ref_start + col.length;
                 s++) {
                i64 off = ref.allele_offset[s] - a0;
                i64 A = ref.allele_number[s];
                if (!include_ancestor) {
                    i64 m1 = INT64_MAX, m2 = INT64_MAX;
                    for (i64 a = 0; a < A; a++) {
                        i64 v1 = wpopcnt8(&planes[(size_t)(off + a) * 8], m);
                        i64 v2 = tot[off + a] - v1;
                        if (v1 < m1) m1 = v1;
                        if (v2 < m2) m2 = v2;
                    }
                    total_c += m1 + m2;
                } else {
                    if ((i64)h1v.size() < A) {
                        h1v.resize(A);
                        h2v.resize(A);
                    }
                    i64* h1buf = h1v.data();
                    i64* h2buf = h2v.data();
                    for (i64 a = 0; a < A; a++) {
                        i64 v1 = wpopcnt8(&planes[(size_t)(off + a) * 8], m);
                        h1buf[a] = v1;
                        h2buf[a] = tot[off + a] - v1;
                    }
                    const uint16_t* sub = ref.subs + ref.sub_offset[s];
                    const uint16_t* prior = ref.priors + ref.allele_offset[s];
                    // min over ancestor a' of min_a(h1+sub) + min_a(h2+sub)
                    // + prior[a'] (emissions.c:187-219)
                    i64 best = INT64_MAX;
                    for (i64 ap = 0; ap < A; ap++) {
                        i64 b1 = INT64_MAX, b2 = INT64_MAX;
                        const uint16_t* srow = sub + ap * A;
                        for (i64 a = 0; a < A; a++) {
                            i64 v1 = h1buf[a] + srow[a];
                            i64 v2 = h2buf[a] + srow[a];
                            if (v1 < b1) b1 = v1;
                            if (v2 < b2) b2 = v2;
                        }
                        i64 v = b1 + b2 + prior[ap];
                        if (v < best) best = v;
                    }
                    total_c += best;
                }
            }
            out[c] = -(double)total_c;
        }
    }

    // -- forward-backward (hmm.c:931-942) ------------------------------------

    void reduce_into(std::vector<double>& dst, const std::vector<i32>& idx,
                     const std::vector<double>& vals) const {
        if (prm.max_not_sum) {
            for (size_t i = 0; i < idx.size(); i++)
                if (vals[i] > dst[idx[i]]) dst[idx[i]] = vals[i];
        } else {
            for (size_t i = 0; i < idx.size(); i++)
                dst[idx[i]] = np_logaddexp(dst[idx[i]], vals[i]);
        }
    }

    void forward_backward(Hmm* h, bool include_ancestor) {
        size_t nc = h->cols.size();
        std::vector<std::vector<i32>> idx_prev(nc), idx_next(nc);
        for (size_t ci = 0; ci < nc; ci++) {
            Column& col = h->cols[ci];
            if (ci > 0) {
                idx_prev[ci].resize(col.parts.size());
                const Merge& m = h->merges[ci - 1];
                for (size_t k = 0; k < col.parts.size(); k++)
                    idx_prev[ci][k] = m.prev_idx(col.parts[k]);
            }
            if (ci < h->merges.size()) {
                idx_next[ci].resize(col.parts.size());
                const Merge& m = h->merges[ci];
                for (size_t k = 0; k < col.parts.size(); k++)
                    idx_next[ci][k] = m.next_idx(col.parts[k]);
            }
        }
        // forward (hmm.c:827-879)
        for (size_t ci = 0; ci < nc; ci++) {
            Column& col = h->cols[ci];
            column_emissions(col, include_ancestor, col.emis);
            col.fwd.resize(col.parts.size());
            if (ci == 0) {
                col.fwd = col.emis;
            } else {
                const Merge& m = h->merges[ci - 1];
                for (size_t k = 0; k < col.parts.size(); k++)
                    col.fwd[k] = m.fwd[idx_prev[ci][k]] + col.emis[k];
            }
            if (ci < h->merges.size()) {
                Merge& m = h->merges[ci];
                m.fwd.assign(m.from_parts.size(), NEG_INF);
                reduce_into(m.fwd, idx_next[ci], col.fwd);
            } else {
                double best = NEG_INF;
                if (prm.max_not_sum) {
                    for (double v : col.fwd)
                        if (v > best) best = v;
                } else {
                    best = lse(col.fwd);
                }
                h->fwd_lp = best;
            }
        }
        // backward (hmm.c:881-929)
        std::vector<double> propagate;
        for (i64 ci = (i64)nc - 1; ci >= 0; ci--) {
            Column& col = h->cols[ci];
            col.bwd.resize(col.parts.size());
            if ((size_t)ci < h->merges.size()) {
                const Merge& m = h->merges[ci];
                for (size_t k = 0; k < col.parts.size(); k++)
                    col.bwd[k] = m.bwd[idx_next[ci][k]];
            } else {
                std::fill(col.bwd.begin(), col.bwd.end(), 0.0);
            }
            propagate.resize(col.parts.size());
            for (size_t k = 0; k < col.parts.size(); k++)
                propagate[k] = col.emis[k] + col.bwd[k];
            if (ci > 0) {
                Merge& m = h->merges[ci - 1];
                m.bwd.assign(m.from_parts.size(), NEG_INF);
                reduce_into(m.bwd, idx_prev[ci], propagate);
            } else {
                double best = NEG_INF;
                if (prm.max_not_sum) {
                    for (double v : propagate)
                        if (v > best) best = v;
                } else {
                    best = lse(propagate);
                }
                h->bwd_lp = best;
            }
            double best = NEG_INF;
            if (prm.max_not_sum) {
                for (size_t k = 0; k < col.parts.size(); k++) {
                    double v = col.fwd[k] + col.bwd[k];
                    if (v > best) best = v;
                }
            } else {
                std::vector<double> tot(col.parts.size());
                for (size_t k = 0; k < col.parts.size(); k++)
                    tot[k] = col.fwd[k] + col.bwd[k];
                best = lse(tot);
            }
            col.total = best;
        }
    }

    static double lse(const std::vector<double>& a) {
        double m = NEG_INF;
        for (double v : a)
            if (v > m) m = v;
        if (std::isinf(m) && m < 0) return NEG_INF;
        double s = 0;
        for (double v : a) s += exp(v - m);
        return m + log(s);
    }

    // -- pruning (hmm.c:1049-1163) -------------------------------------------

    // posterior sort key: min(fwd+bwd-total, 0) — exp is monotone and the
    // numpy oracle clips at 1.0, which this key's clamp-to-0 ties reproduce
    static double post_key(double fwd, double bwd, double total) {
        double x = (fwd + bwd) - total;
        if (std::isnan(x)) return x;  // numpy's posterior propagates NaN
        return x < 0.0 ? x : 0.0;
    }

    i64 keep_count(const std::vector<double>& sorted_keys) const {
        // hmm.c:1065-1068 via rphmm.py _keep_count (keys are log posteriors;
        // NaN < p is false in both numpy and C, stopping the trim)
        i64 n = (i64)sorted_keys.size();
        while (n > prm.min_partitions
               && (n > prm.max_partitions
                   || exp(sorted_keys[n - 1]) < prm.min_posterior))
            n -= 1;
        return n;
    }

    // stable descending sort of indices by key; NaN keys last (numpy argsort)
    static void stable_desc(const std::vector<double>& keys,
                            std::vector<i64>& order) {
        order.resize(keys.size());
        for (size_t i = 0; i < keys.size(); i++) order[i] = (i64)i;
        std::stable_sort(order.begin(), order.end(), [&](i64 a, i64 b) {
            double ka = keys[a], kb = keys[b];
            bool na = std::isnan(ka), nb = std::isnan(kb);
            if (na || nb) return !na && nb;  // non-nan before nan
            return ka > kb;
        });
    }

    void prune_pass(Hmm* h, bool forwards) {
        i64 nc = (i64)h->cols.size();
        Merge* prev_merge = nullptr;
        std::vector<i64> sel, order, keep;
        std::vector<double> keys;
        for (i64 t = 0; t < nc; t++) {
            i64 ci = forwards ? t : nc - 1 - t;
            Column& col = h->cols[ci];
            // keep cells that still link (getLinkedCells, hmm.c:1021-1047)
            sel.clear();
            if (prev_merge != nullptr) {
                for (size_t k = 0; k < col.parts.size(); k++) {
                    i32 link = forwards ? prev_merge->prev_idx(col.parts[k])
                                        : prev_merge->next_idx(col.parts[k]);
                    if (link >= 0) sel.push_back((i64)k);
                }
            } else {
                for (size_t k = 0; k < col.parts.size(); k++)
                    sel.push_back((i64)k);
            }
            keys.resize(sel.size());
            for (size_t k = 0; k < sel.size(); k++)
                keys[k] = post_key(col.fwd[sel[k]], col.bwd[sel[k]],
                                   col.total);
            stable_desc(keys, order);
            std::vector<i64> sel2(sel.size());
            std::vector<double> keys2(sel.size());
            for (size_t k = 0; k < order.size(); k++) {
                sel2[k] = sel[order[k]];
                keys2[k] = keys[order[k]];
            }
            if (forwards) {
                i64 n = keep_count(keys2);
                sel2.resize(n);
            }
            // relink in sorted order, keep fb arrays consistent
            apply_sel(col, sel2);

            Merge* m = nullptr;
            if (forwards && ci < (i64)h->merges.size())
                m = &h->merges[ci];
            else if (!forwards && ci > 0)
                m = &h->merges[ci - 1];
            if (m == nullptr) {
                prev_merge = nullptr;
                continue;
            }
            // prune the merge column to linked cells (hmm.c:1084-1101)
            std::vector<i64> links(col.parts.size());
            for (size_t k = 0; k < col.parts.size(); k++)
                links[k] = forwards ? m->next_idx(col.parts[k])
                                    : m->prev_idx(col.parts[k]);
            // dedup preserving first-occurrence order
            U64Map& dedup_set = dedup_scratch();
            dedup_set.reset(links.size());
            std::vector<i64> chosen;
            for (i64 l : links)
                if (dedup_set.insert((u64)l, 0)) chosen.push_back(l);
            if (forwards) {
                double next_total = h->cols[ci + 1].total;
                keys.resize(chosen.size());
                for (size_t k = 0; k < chosen.size(); k++)
                    keys[k] = post_key(m->fwd[chosen[k]], m->bwd[chosen[k]],
                                       next_total);
                stable_desc(keys, order);
                std::vector<i64> ch2(chosen.size());
                std::vector<double> keys2b(chosen.size());
                for (size_t k = 0; k < order.size(); k++) {
                    ch2[k] = chosen[order[k]];
                    keys2b[k] = keys[order[k]];
                }
                i64 n = keep_count(keys2b);
                ch2.resize(n);
                chosen.swap(ch2);
            }
            std::sort(chosen.begin(), chosen.end());
            apply_merge_sel(*m, chosen);
            prev_merge = m;
        }
    }

    static void apply_sel(Column& col, const std::vector<i64>& sel) {
        std::vector<u64> parts(sel.size());
        std::vector<double> fwd(sel.size()), bwd(sel.size()), emis(sel.size());
        for (size_t k = 0; k < sel.size(); k++) {
            parts[k] = col.parts[sel[k]];
            fwd[k] = col.fwd[sel[k]];
            bwd[k] = col.bwd[sel[k]];
            emis[k] = col.emis[sel[k]];
        }
        col.parts.swap(parts);
        col.fwd.swap(fwd);
        col.bwd.swap(bwd);
        col.emis.swap(emis);
    }

    static void apply_merge_sel(Merge& m, const std::vector<i64>& sel) {
        std::vector<u64> fp(sel.size()), tp(sel.size());
        std::vector<double> fwd(sel.size()), bwd(sel.size());
        for (size_t k = 0; k < sel.size(); k++) {
            fp[k] = m.from_parts[sel[k]];
            tp[k] = m.to_parts[sel[k]];
            fwd[k] = m.fwd[sel[k]];
            bwd[k] = m.bwd[sel[k]];
        }
        m.from_parts.swap(fp);
        m.to_parts.swap(tp);
        m.fwd.swap(fwd);
        m.bwd.swap(bwd);
        m.build_index();
    }

    void prune(Hmm* h) {  // hmm.c:1160-1163
        prune_pass(h, true);
        prune_pass(h, false);
    }

    // -- coordination (coordination.c) ---------------------------------------

    void sort_by_key(std::vector<Hmm*>& v) const {
        std::stable_sort(v.begin(), v.end(),
                         [&](Hmm* a, Hmm* b) { return key_less(a, b); });
    }

    std::vector<std::vector<Hmm*>> get_tiling_paths(std::vector<Hmm*> hmms) {
        // coordination.c:186-222
        sort_by_key(hmms);
        std::vector<std::vector<Hmm*>> paths;
        std::vector<Hmm*> remaining = hmms;
        while (!remaining.empty()) {
            std::vector<Hmm*> path = {remaining[0]};
            std::vector<bool> used(remaining.size(), false);
            used[0] = true;
            Hmm* cur = remaining[0];
            for (size_t i = 1; i < remaining.size(); i++) {
                Hmm* h = remaining[i];
                if (cur->ref_start + cur->ref_length <= h->ref_start) {
                    path.push_back(h);
                    used[i] = true;
                    cur = h;
                }
            }
            std::vector<Hmm*> rest;
            for (size_t i = 0; i < remaining.size(); i++)
                if (!used[i]) rest.push_back(remaining[i]);
            remaining.swap(rest);
            paths.push_back(path);
        }
        return paths;
    }

    Hmm* fuse_tiling_path(const std::vector<Hmm*>& path) {
        // coordination.c:244-261
        Hmm* h = path.back();
        for (i64 i = (i64)path.size() - 2; i >= 0; i--) h = fuse(path[i], h);
        return h;
    }

    std::vector<std::vector<Hmm*>> overlapping_components(
        const std::vector<Hmm*>& tp1, const std::vector<Hmm*>& tp2) {
        // coordination.c:69-184 via rphmm.py get_overlapping_components
        std::unordered_map<Hmm*, i64> comp_of;
        std::vector<std::vector<Hmm*>> components;
        auto make_component = [&](Hmm* h) -> i64 {
            components.push_back({h});
            comp_of[h] = (i64)components.size() - 1;
            return (i64)components.size() - 1;
        };
        size_t j = 0;
        for (Hmm* h1 : tp1) {
            i64 component = -1;
            size_t k = 0;
            while (j + k < tp2.size()) {
                Hmm* h2 = tp2[j + k];
                if (overlaps(h1, h2)) {
                    k += 1;
                    if (component < 0) {
                        auto it = comp_of.find(h2);
                        if (it == comp_of.end())
                            component = make_component(h2);
                        else
                            component = it->second;
                        components[component].push_back(h1);
                        comp_of[h1] = component;
                    } else {
                        components[component].push_back(h2);
                        comp_of[h2] = component;
                    }
                } else {
                    if (key_less(h1, h2)) {
                        if (component < 0) component = make_component(h1);
                        break;
                    } else {
                        if (comp_of.find(h2) == comp_of.end())
                            make_component(h2);
                        j += 1;
                    }
                }
            }
            if (component < 0 && comp_of.find(h1) == comp_of.end())
                make_component(h1);
        }
        while (j < tp2.size()) {
            Hmm* h2 = tp2[j];
            j += 1;
            if (comp_of.find(h2) == comp_of.end()) make_component(h2);
        }
        return components;
    }

    Hmm* merge_component(std::vector<Hmm*>& comp, bool include_ancestor) {
        auto sub_paths = get_tiling_paths(comp);
        if (sub_paths.size() != 2) return sub_paths[0][0];
        Hmm* h1 = fuse_tiling_path(sub_paths[0]);
        Hmm* h2 = fuse_tiling_path(sub_paths[1]);
        align_columns(h1, h2);
        Hmm* hmm = cross_product(h1, h2);
        forward_backward(hmm, include_ancestor);
        prune(hmm);
        return hmm;
    }

    std::vector<Hmm*> merge_two_tiling_paths(const std::vector<Hmm*>& tp1,
                                             const std::vector<Hmm*>& tp2,
                                             bool include_ancestor) {
        // coordination.c:263-339; components are independent, so they fan
        // out over the process-global thread budget (the reference's
        // parallelism lives one level up, in its omp-sections recursion)
        auto components = overlapping_components(tp1, tp2);
        std::vector<Hmm*> out(components.size(), nullptr);
        std::vector<std::thread> workers;
        std::atomic<size_t> next{0};
        auto work = [&]() {
            size_t i;
            while ((i = next.fetch_add(1)) < components.size()) {
                try {
                    out[i] = merge_component(components[i], include_ancestor);
                } catch (...) {
                    failed.store(true);
                }
            }
        };
        size_t spawnable = components.size() > 1 ? components.size() - 1 : 0;
        for (size_t t = 0; t < spawnable && try_acquire_thread(); t++)
            workers.emplace_back(work);
        work();
        for (auto& w : workers) {
            w.join();
            release_thread();
        }
        if (failed.load()) throw std::runtime_error("merge task failed");
        sort_by_key(out);
        return out;
    }

    std::vector<Hmm*> merge_tiling_paths(
        std::vector<std::vector<Hmm*>> paths, bool include_ancestor) {
        // coordination.c:341-409 (recursive binary merge; the two halves
        // are independent — run the left on a budget thread when one is
        // free, mirroring the reference's omp sections :380-396)
        if (paths.empty()) return {};
        if (paths.size() == 1) return paths[0];
        std::vector<Hmm*> tp1, tp2;
        if (paths.size() > 2) {
            size_t half = paths.size() / 2;
            std::vector<std::vector<Hmm*>> left(paths.begin(),
                                                paths.begin() + half);
            std::vector<std::vector<Hmm*>> right(paths.begin() + half,
                                                 paths.end());
            if (try_acquire_thread()) {
                std::thread th([&]() {
                    try {
                        tp1 = merge_tiling_paths(std::move(left),
                                                 include_ancestor);
                    } catch (...) {
                        failed.store(true);
                    }
                });
                try {
                    tp2 = merge_tiling_paths(std::move(right),
                                             include_ancestor);
                } catch (...) {
                    failed.store(true);
                }
                th.join();
                release_thread();
                if (failed.load())
                    throw std::runtime_error("merge task failed");
            } else {
                tp1 = merge_tiling_paths(std::move(left), include_ancestor);
                tp2 = merge_tiling_paths(std::move(right), include_ancestor);
            }
        } else {
            tp1 = paths[0];
            tp2 = paths[1];
        }
        return merge_two_tiling_paths(tp1, tp2, include_ancestor);
    }

    std::vector<Hmm*> get_rp_hmms(i64 lo, i64 hi) {
        // coordination.c:490-516 (depth check done by the caller in Python)
        std::vector<Hmm*> hmms;
        for (i64 i = lo; i < hi; i++)
            hmms.push_back(from_profile_seq((i32)i));
        return merge_tiling_paths(get_tiling_paths(hmms), false);
    }
};

// align a byte size up to 8
inline size_t al8(size_t n) { return (n + 7) & ~size_t(7); }

}  // namespace

extern "C" {

// Runs the full per-chunk stRPHmm pipeline: single-read HMMs for the fwd
// range [0, n_fwd) and rev range [n_fwd, n_total), tiling-path merges per
// strand, cross-strand merge, fuse, final forward-backward. Returns a
// malloc'd serialized buffer (see margin_tpu/phase/native_rp.py for the
// layout) via *out; return value is the byte size, or -1 on error.
int64_t mrp_phase(
    // reference
    int64_t n_sites, const int32_t* allele_number, const int64_t* allele_offset,
    const uint16_t* priors, const uint16_t* subs, const int64_t* sub_offset,
    // profile seqs
    int64_t n_fwd, int64_t n_total, const int32_t* ps_ref_start,
    const int32_t* ps_length, const int64_t* ps_allele_offset,
    const uint8_t* ps_probs, const int64_t* ps_probs_offset,
    const int32_t* ps_rank,
    // params
    int64_t max_partitions, int64_t min_partitions, double min_posterior,
    int32_t include_inverted, int32_t max_not_sum,
    int32_t final_include_ancestor,
    uint8_t** out) {
    try {
        Engine eng;
        eng.ref = Ref{n_sites, allele_number, allele_offset, priors, subs,
                      sub_offset};
        eng.ps = PSeqs{n_total,       ps_ref_start, ps_length,
                       ps_allele_offset, ps_probs,  ps_probs_offset,
                       ps_rank};
        eng.prm = Params{max_partitions, min_partitions, min_posterior,
                         include_inverted != 0, max_not_sum != 0};

        init_thread_budget();
        std::vector<Hmm*> tp_f, tp_r;
        // the two strands' merge trees are independent (bubbleGraph.c:2745)
        if (n_fwd > 0 && n_total > n_fwd && try_acquire_thread()) {
            std::thread th([&]() {
                try {
                    tp_f = eng.get_rp_hmms(0, n_fwd);
                } catch (...) {
                    eng.failed.store(true);
                }
            });
            tp_r = eng.get_rp_hmms(n_fwd, n_total);
            th.join();
            release_thread();
            if (eng.failed.load()) return -1;
        } else {
            tp_f = eng.get_rp_hmms(0, n_fwd);
            tp_r = eng.get_rp_hmms(n_fwd, n_total);
        }
        std::vector<Hmm*> merged =
            eng.merge_two_tiling_paths(tp_f, tp_r, false);
        if (merged.empty()) return -1;
        Hmm* h = eng.fuse_tiling_path(merged);
        eng.forward_backward(h, final_include_ancestor != 0);

        // serialize
        size_t nc = h->cols.size();
        size_t bytes = 8 * 5;                      // header
        bytes += 8 + al8(h->seqs.size() * 4);      // hmm seqs
        for (const Column& c : h->cols) {
            bytes += 8 * 3 + al8(c.seqs.size() * 4);
            bytes += 8 + c.parts.size() * 8 * 4 + 8;  // n + parts/fwd/bwd/emis + total
        }
        for (const Merge& m : h->merges)
            bytes += 8 * 3 + m.from_parts.size() * 16;
        uint8_t* buf = (uint8_t*)malloc(bytes);
        if (!buf) return -1;
        uint8_t* p = buf;
        auto put_i64 = [&](i64 v) { memcpy(p, &v, 8); p += 8; };
        auto put_f64 = [&](double v) { memcpy(p, &v, 8); p += 8; };
        auto put_i32s = [&](const std::vector<i32>& v) {
            put_i64((i64)v.size());
            memcpy(p, v.data(), v.size() * 4);
            p += al8(v.size() * 4);
        };
        put_i64((i64)nc);
        put_i64(h->ref_start);
        put_i64(h->ref_length);
        put_f64(h->fwd_lp);
        put_f64(h->bwd_lp);
        put_i32s(h->seqs);
        for (const Column& c : h->cols) {
            put_i64(c.ref_start);
            put_i64(c.length);
            put_i32s(c.seqs);
            put_i64((i64)c.parts.size());
            memcpy(p, c.parts.data(), c.parts.size() * 8);
            p += c.parts.size() * 8;
            memcpy(p, c.fwd.data(), c.fwd.size() * 8);
            p += c.fwd.size() * 8;
            memcpy(p, c.bwd.data(), c.bwd.size() * 8);
            p += c.bwd.size() * 8;
            memcpy(p, c.emis.data(), c.emis.size() * 8);
            p += c.emis.size() * 8;
            put_f64(c.total);
        }
        for (const Merge& m : h->merges) {
            put_i64((i64)m.mask_from);
            put_i64((i64)m.mask_to);
            put_i64((i64)m.from_parts.size());
            memcpy(p, m.from_parts.data(), m.from_parts.size() * 8);
            p += m.from_parts.size() * 8;
            memcpy(p, m.to_parts.data(), m.to_parts.size() * 8);
            p += m.to_parts.size() * 8;
        }
        if ((size_t)(p - buf) != bytes) {
            free(buf);
            return -1;
        }
        *out = buf;
        return (int64_t)bytes;
    } catch (...) {
        return -1;
    }
}

void mrp_free(uint8_t* p) { free(p); }

}  // extern "C"
