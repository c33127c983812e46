// Native POA augmentation engine.
//
// Parity: poa_augment and helpers (poa.c:269-543) by way of the Python
// implementation in margin_tpu/polish/poa.py, which this mirrors
// operation-for-operation (same run grouping, left-shift/common-suffix
// rotation, observation order, float64 accumulation order). The graph
// bookkeeping is pointer-heavy host work — ~40% of a polish chunk's wall
// in Python — while the DP posteriors it consumes stay on the device.
//
// Handle API: mpoa_create -> mpoa_augment per read (strict read order) ->
// mpoa_export (serialized graph; margin_tpu/polish/native_poa.py rebuilds
// the ordinary Python Poa) -> mpoa_free.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <string>
#include <unordered_set>
#include <vector>

namespace {

typedef int64_t i64;
typedef int32_t i32;
typedef uint8_t u8;

struct Rle {
    std::vector<u8> bases;   // ASCII
    std::vector<i64> counts;
    i64 len() const { return (i64)bases.size(); }
    bool operator==(const Rle& o) const {
        return bases == o.bases && counts == o.counts;
    }
};

struct Obs {  // (readNo, offset, weight)
    i32 read_no;
    i64 offset;
    double weight;
};

struct Insert {
    Rle s;
    double wf = 0.0, wr = 0.0;
    std::vector<Obs> obs;
};

struct Delete {
    i64 length;
    double wf = 0.0, wr = 0.0;
    std::vector<Obs> obs;
};

struct Node {
    std::vector<Insert> inserts;
    std::vector<Delete> deletes;
    std::vector<Obs> obs;
};

// symbol codes matching margin_tpu.alphabet.seq_to_symbols
inline int sym_of(u8 b) {
    switch (b) {
        case 'A': case 'a': return 0;
        case 'C': case 'c': return 1;
        case 'G': case 'g': return 2;
        case 'T': case 't': return 3;
        default: return 4;
    }
}

struct Poa {
    Rle ref;
    i64 max_rc;
    bool compare_rc;   // poaConstructCompareRepeatCounts
    bool merge_ends;   // useRunLengthEncoding (rotate merge semantics)
    i64 n_nodes;       // ref.len() + 1
    std::vector<double> bw;  // (n_nodes, 5)
    std::vector<double> rw;  // (n_nodes, max_rc)
    std::vector<Node> nodes;
};

// getShift helpers (poa.c:269-315 via polish/poa.py)
bool has_internal_repeat(const Rle& s, i64 rep_len, bool rc) {
    if (s.len() % rep_len != 0) return false;
    for (i64 i = rep_len; i < s.len(); i += rep_len)
        for (i64 j = 0; j < rep_len; j++) {
            if (s.bases[j] != s.bases[j + i]) return false;
            if (rc && s.counts[j] != s.counts[j + i]) return false;
        }
    return true;
}

bool matches_ref_substring(const Rle& ref, i64 ref_start, const Rle& s,
                           i64 length, bool rc) {
    for (i64 l = 0; l < length; l++) {
        if (ref.bases[ref_start + l] != s.bases[l]) return false;
        if (rc && ref.counts[ref_start + l] != s.counts[l]) return false;
    }
    return true;
}

i64 get_shift(const Rle& ref, i64 ref_start, const Rle& s, bool rc) {
    i64 min_rep = 1;
    while (min_rep < s.len()) {
        if (has_internal_repeat(s, min_rep, rc)) break;
        min_rep += 1;
    }
    i64 k = ref_start - min_rep;
    while (k >= 0) {
        if (!matches_ref_substring(ref, k, s, min_rep, rc)) break;
        ref_start = k;
        k -= min_rep;
    }
    if (s.len() == 1 && rc && ref_start > 0
        && ref.bases[ref_start - 1] == s.bases[0])
        ref_start -= 1;
    return ref_start;
}

i64 max_common_suffix(const Rle& ref, i64 length1, const Rle& s, bool rc) {
    i64 i = 0;
    while (length1 - i - 1 >= 0 && s.len() - i - 1 >= 0) {
        if (ref.bases[length1 - 1 - i] != s.bases[s.len() - 1 - i]) break;
        if (rc && ref.counts[length1 - 1 - i] != s.counts[s.len() - 1 - i])
            break;
        i += 1;
    }
    return i;
}

Rle substring(const Rle& s, i64 start, i64 length) {
    Rle out;
    out.bases.assign(s.bases.begin() + start, s.bases.begin() + start + length);
    out.counts.assign(s.counts.begin() + start,
                      s.counts.begin() + start + length);
    return out;
}

void rotate(Rle& s, i64 rot, bool merge) {  // rle.c:157-176
    i64 n = s.len();
    if (n == 0) return;
    std::vector<u8> rb(n);
    std::vector<i64> rc(n);
    for (i64 i = 0; i < n; i++) {
        i64 j = ((i - rot) % n + n) % n;
        rb[i] = s.bases[j];
        rc[i] = s.counts[j];
    }
    if (!merge) {
        s.bases.swap(rb);
        s.counts.swap(rc);
        return;
    }
    Rle out;
    for (i64 i = 0; i < n; i++) {
        if (i > 0 && rb[i] == out.bases.back())
            out.counts.back() += rc[i];
        else {
            out.bases.push_back(rb[i]);
            out.counts.push_back(rc[i]);
        }
    }
    s = out;
}

void add_insert(Poa* p, i64 pos, Rle&& insert, double weight, bool strand,
                const Obs& obs) {
    Node& node = p->nodes[pos];
    Insert* pi = nullptr;
    for (Insert& cand : node.inserts)
        if (cand.s == insert) {
            pi = &cand;
            break;
        }
    if (!pi) {
        node.inserts.emplace_back();
        pi = &node.inserts.back();
        pi->s = std::move(insert);
    }
    if (strand)
        pi->wf += weight;
    else
        pi->wr += weight;
    pi->obs.push_back(obs);
}

void add_delete(Poa* p, i64 pos, i64 length, double weight, bool strand,
                const Obs& obs) {
    Node& node = p->nodes[pos];
    Delete* pd = nullptr;
    for (Delete& cand : node.deletes)
        if (cand.length == length) {
            pd = &cand;
            break;
        }
    if (!pd) {
        node.deletes.emplace_back();
        pd = &node.deletes.back();
        pd->length = length;
    }
    if (strand)
        pd->wf += weight;
    else
        pd->wr += weight;
    pd->obs.push_back(obs);
}

struct PairHash {
    size_t operator()(const std::pair<i64, i64>& p) const {
        uint64_t x = (uint64_t)p.first * 0x9E3779B97F4A7C15ULL
                     ^ (uint64_t)p.second;
        x = (x ^ (x >> 30)) * 0xBF58476D1CE4E5B9ULL;
        return (size_t)(x ^ (x >> 27));
    }
};

}  // namespace

extern "C" {

void* mpoa_create(const u8* ref_bases, const i64* ref_counts, i64 ref_len,
                  i64 max_rc, i32 compare_rc, i32 merge_ends) {
    Poa* p = new Poa();
    p->ref.bases.assign(ref_bases, ref_bases + ref_len);
    p->ref.counts.assign(ref_counts, ref_counts + ref_len);
    p->max_rc = max_rc;
    p->compare_rc = compare_rc != 0;
    p->merge_ends = merge_ends != 0;
    p->n_nodes = ref_len + 1;
    p->bw.assign(p->n_nodes * 5, 0.0);
    p->rw.assign(p->n_nodes * max_rc, 0.0);
    p->nodes.resize(p->n_nodes);
    return p;
}

void mpoa_free(void* h) { delete (Poa*)h; }

// matches/inserts/deletes: (n, 3) int64 rows of (weight, x, y), in the same
// order the Python augment receives them.
void mpoa_augment(void* h, const u8* read_bases, const i64* read_counts,
                  i64 read_len, i32 strand, i32 read_no,
                  const i64* matches, i64 n_m,
                  const i64* inserts, i64 n_i,
                  const i64* deletes, i64 n_d) {
    Poa* p = (Poa*)h;
    Rle read;
    read.bases.assign(read_bases, read_bases + read_len);
    read.counts.assign(read_counts, read_counts + read_len);
    const bool rc = p->compare_rc;

    // match accumulation (input order == (x, y)-sorted, like the batched
    // extraction produces)
    for (i64 m = 0; m < n_m; m++) {
        double w = (double)matches[3 * m];
        i64 x = matches[3 * m + 1];
        i64 y = matches[3 * m + 2];
        int sym = sym_of(read.bases[y]);
        i64 rcnt = std::min(read.counts[y], p->max_rc - 1);
        p->bw[(x + 1) * 5 + sym] += w;
        p->rw[(x + 1) * p->max_rc + rcnt] += w;
        p->nodes[x + 1].obs.push_back(Obs{read_no, y, w});
    }

    std::unordered_set<std::pair<i64, i64>, PairHash> match_set;
    match_set.reserve((size_t)n_m * 2);
    for (i64 m = 0; m < n_m; m++)
        match_set.insert({matches[3 * m + 1], matches[3 * m + 2]});
    auto is_match = [&](i64 x, i64 y) {
        return match_set.count({x, y}) != 0;
    };

    // complete inserts (poa.c:352-449): runs with equal ref coord and
    // consecutive read coords; stable sort by (x, y)
    std::vector<i64> order(n_i);
    for (i64 k = 0; k < n_i; k++) order[k] = k;
    std::stable_sort(order.begin(), order.end(), [&](i64 a, i64 b) {
        if (inserts[3 * a + 1] != inserts[3 * b + 1])
            return inserts[3 * a + 1] < inserts[3 * b + 1];
        return inserts[3 * a + 2] < inserts[3 * b + 2];
    });
    auto iw = [&](i64 k) { return inserts[3 * order[k]]; };
    auto ix = [&](i64 k) { return inserts[3 * order[k] + 1]; };
    auto iy = [&](i64 k) { return inserts[3 * order[k] + 2]; };
    i64 i = 0;
    while (i < n_i) {
        i64 j = i + 1;
        while (j < n_i && ix(j) == ix(i) && iy(i) + j - i == iy(j)) j++;
        for (i64 k = i; k < j; k++) {
            if (!is_match(ix(i), iy(i) + k - i - 1)
                && iy(i) + k - i - 1 > -1)
                continue;
            for (i64 l = k; l < j; l++) {
                if (!is_match(ix(i) + 1, iy(i) + l - i + 1)
                    && iy(i) + l - i + 1 < read.len())
                    continue;
                Rle ins_s = substring(read, iy(k), l + 1 - k);
                i64 weight = iw(k);
                for (i64 m = k + 1; m <= l; m++)
                    weight = std::min(weight, iw(m));
                i64 pos = ix(i) + 1;
                pos = get_shift(p->ref, pos, ins_s, rc);
                i64 suffix = max_common_suffix(p->ref, pos, ins_s, rc);
                if (suffix > 0) {
                    rotate(ins_s, suffix, p->merge_ends);
                    pos -= suffix;
                }
                Obs o{read_no, iy(k), (double)weight};
                add_insert(p, pos, std::move(ins_s), (double)weight,
                           strand != 0, o);
            }
        }
        i = j;
    }

    // complete deletes (poa.c:451-539): runs with equal read coord and
    // consecutive ref coords; stable sort by (y, x)
    order.resize(n_d);
    for (i64 k = 0; k < n_d; k++) order[k] = k;
    std::stable_sort(order.begin(), order.end(), [&](i64 a, i64 b) {
        if (deletes[3 * a + 2] != deletes[3 * b + 2])
            return deletes[3 * a + 2] < deletes[3 * b + 2];
        return deletes[3 * a + 1] < deletes[3 * b + 1];
    });
    auto dw = [&](i64 k) { return deletes[3 * order[k]]; };
    auto dx = [&](i64 k) { return deletes[3 * order[k] + 1]; };
    auto dy = [&](i64 k) { return deletes[3 * order[k] + 2]; };
    i = 0;
    while (i < n_d) {
        i64 j = i + 1;
        while (j < n_d && dy(j) == dy(i) && dx(i) + j - i == dx(j)) j++;
        for (i64 k = i; k < j; k++) {
            if (!is_match(dx(i) + k - i - 1, dy(i))
                && dx(i) + k - i - 1 > -1)
                continue;
            for (i64 l = k; l < j; l++) {
                if (!is_match(dx(i) + l - i + 1, dy(i) + 1)
                    && dx(i) + l - i + 1 < p->ref.len())
                    continue;
                i64 delete_length = l - k + 1;
                i64 weight = dw(k);
                for (i64 m = k + 1; m <= l; m++)
                    weight = std::min(weight, dw(m));
                i64 pos = dx(i) + k - i;
                Rle dstr = substring(p->ref, pos, delete_length);
                pos = get_shift(p->ref, pos, dstr, rc);
                pos -= max_common_suffix(p->ref, pos, dstr, rc);
                Obs o{read_no, dy(i), (double)weight};
                add_delete(p, pos, delete_length, (double)weight,
                           strand != 0, o);
            }
        }
        i = j;
    }
}

// Columnar serialized export (margin_tpu/polish/native_poa.py parses with
// numpy views — the round-2 per-node stream made the Python rebuild the
// hot path at ~25us/node). All sections are 8-byte aligned:
//   header (10 i64): n_nodes max_rc n_obs n_ins ins_bases_pad8
//                    n_ins_counts n_ins_obs n_del n_del_obs reserved
//   bw (n_nodes*5 f64), rw (n_nodes*max_rc f64)
//   node_obs_counts (n_nodes i64)
//   obs columns: read_no (n_obs i64), offset (n_obs i64), weight (n_obs f64)
//   node_ins_counts (n_nodes i64), ins_len (n_ins i64),
//   ins_bases (concat u8 pad8), ins_counts (n_ins_counts i64),
//   ins_wf (n_ins f64), ins_wr (n_ins f64), ins_obs_counts (n_ins i64),
//   ins obs columns (n_ins_obs: i64, i64, f64)
//   node_del_counts (n_nodes i64), del_len (n_del i64),
//   del_wf (n_del f64), del_wr (n_del f64), del_obs_counts (n_del i64),
//   del obs columns (n_del_obs: i64, i64, f64)
int64_t mpoa_export(void* h, u8** out) {
    Poa* p = (Poa*)h;
    auto al8 = [](size_t n) { return (n + 7) & ~size_t(7); };
    i64 n_obs = 0, n_ins = 0, ins_bases = 0, n_ins_counts = 0;
    i64 n_ins_obs = 0, n_del = 0, n_del_obs = 0;
    for (const Node& n : p->nodes) {
        n_obs += (i64)n.obs.size();
        n_ins += (i64)n.inserts.size();
        for (const Insert& pi : n.inserts) {
            ins_bases += pi.s.len();
            n_ins_counts += (i64)pi.s.counts.size();
            n_ins_obs += (i64)pi.obs.size();
        }
        n_del += (i64)n.deletes.size();
        for (const Delete& pd : n.deletes) n_del_obs += (i64)pd.obs.size();
    }
    size_t bytes = 10 * 8 + (p->bw.size() + p->rw.size()) * 8
        + (size_t)p->n_nodes * 8 + (size_t)n_obs * 24
        + (size_t)p->n_nodes * 8 + (size_t)n_ins * 8 + al8(ins_bases)
        + (size_t)n_ins_counts * 8 + (size_t)n_ins * 24
        + (size_t)n_ins_obs * 24
        + (size_t)p->n_nodes * 8 + (size_t)n_del * 32
        + (size_t)n_del_obs * 24;
    u8* buf = (u8*)malloc(bytes);
    if (!buf) return -1;
    u8* q = buf;
    auto put_i64 = [&](i64 v) { memcpy(q, &v, 8); q += 8; };
    i64 header[10] = {p->n_nodes, p->max_rc, n_obs, n_ins, (i64)al8(ins_bases),
                      n_ins_counts, n_ins_obs, n_del, n_del_obs, 0};
    memcpy(q, header, sizeof header); q += sizeof header;
    memcpy(q, p->bw.data(), p->bw.size() * 8); q += p->bw.size() * 8;
    memcpy(q, p->rw.data(), p->rw.size() * 8); q += p->rw.size() * 8;
    // three passes over obs vectors write the columnar blocks in place
    auto put_obs_cols = [&](auto&& for_each, i64 count) {
        u8* rn = q; u8* off = q + count * 8; u8* wt = q + count * 16;
        for_each([&](const std::vector<Obs>& obs) {
            for (const Obs& o : obs) {
                i64 r = o.read_no;
                memcpy(rn, &r, 8); rn += 8;
                memcpy(off, &o.offset, 8); off += 8;
                memcpy(wt, &o.weight, 8); wt += 8;
            }
        });
        q += count * 24;
    };
    for (const Node& n : p->nodes) put_i64((i64)n.obs.size());
    put_obs_cols([&](auto emit) {
        for (const Node& n : p->nodes) emit(n.obs);
    }, n_obs);
    for (const Node& n : p->nodes) put_i64((i64)n.inserts.size());
    for (const Node& n : p->nodes)
        for (const Insert& pi : n.inserts) put_i64(pi.s.len());
    for (const Node& n : p->nodes)
        for (const Insert& pi : n.inserts) {
            memcpy(q, pi.s.bases.data(), pi.s.bases.size());
            q += pi.s.bases.size();
        }
    memset(q, 0, al8(ins_bases) - ins_bases);
    q += al8(ins_bases) - ins_bases;
    for (const Node& n : p->nodes)
        for (const Insert& pi : n.inserts) {
            memcpy(q, pi.s.counts.data(), pi.s.counts.size() * 8);
            q += pi.s.counts.size() * 8;
        }
    for (const Node& n : p->nodes)
        for (const Insert& pi : n.inserts) { memcpy(q, &pi.wf, 8); q += 8; }
    for (const Node& n : p->nodes)
        for (const Insert& pi : n.inserts) { memcpy(q, &pi.wr, 8); q += 8; }
    for (const Node& n : p->nodes)
        for (const Insert& pi : n.inserts) put_i64((i64)pi.obs.size());
    put_obs_cols([&](auto emit) {
        for (const Node& n : p->nodes)
            for (const Insert& pi : n.inserts) emit(pi.obs);
    }, n_ins_obs);
    for (const Node& n : p->nodes) put_i64((i64)n.deletes.size());
    for (const Node& n : p->nodes)
        for (const Delete& pd : n.deletes) put_i64(pd.length);
    for (const Node& n : p->nodes)
        for (const Delete& pd : n.deletes) { memcpy(q, &pd.wf, 8); q += 8; }
    for (const Node& n : p->nodes)
        for (const Delete& pd : n.deletes) { memcpy(q, &pd.wr, 8); q += 8; }
    for (const Node& n : p->nodes)
        for (const Delete& pd : n.deletes) put_i64((i64)pd.obs.size());
    put_obs_cols([&](auto emit) {
        for (const Node& n : p->nodes)
            for (const Delete& pd : n.deletes) emit(pd.obs);
    }, n_del_obs);
    if ((size_t)(q - buf) != bytes) {
        free(buf);
        return -1;
    }
    *out = buf;
    return (i64)bytes;
}

void mpoa_buf_free(u8* p) { free(p); }

// ---------------------------------------------------------------------------
// Consensus: poa_getConsensus (poa.c:1350-1588) by way of
// margin_tpu/polish/poa.py get_consensus — the same 'cheesy profile HMM'
// forward + greedy traceback with the reference's piecewise-cubic LUT
// logAdd (pairwiseAligner.c:279-299), in float64, operation-for-operation
// so outputs are bit-identical to the Python path.
// ---------------------------------------------------------------------------

static const double LUT_CUBIC[4][4] = {
    {-0.009350833524763, 0.130659527668286, 0.498799810682272,
     0.693203116424741},
    {-0.014532321752540, 0.139942324101744, 0.495635523139337,
     0.692140569840976},
    {-0.004605031767994, 0.063427417320019, 0.695956496475118,
     0.514272634594009},
    {-0.000458661602210, 0.009695946122598, 0.930734667215156,
     0.168037164329057},
};

static inline double lut_lookup(double x) {
    const double* c = LUT_CUBIC[x <= 1.0 ? 0 : (x <= 2.5 ? 1
                                                : (x <= 4.5 ? 2 : 3))];
    return ((c[0] * x + c[1]) * x + c[2]) * x + c[3];
}

// np_log_add_lut (margin_tpu/ops/logmath.py:97-108) semantics
static inline double log_add_lut64(double x, double y) {
    double hi = x > y ? x : y;
    double lo = x > y ? y : x;
    double d = hi - lo;
    if (std::isinf(lo) || std::isnan(d) || d >= 7.5) return hi;
    return lut_lookup(d) + lo;
}

// getMaxWeight (poa.c:1334-1348 via poa.py _get_max_weight): last max wins
// on ties; the reference index wins when its penalty-discounted weight
// still beats the best non-reference weight.
static inline i64 get_max_weight(const double* w, i64 n, i64 ref_idx,
                                 double penalty) {
    double max_w = 0.0;
    i64 max_idx = -1;
    for (i64 j = 0; j < n; j++)
        if (j != ref_idx && w[j] >= max_w) {
            max_w = w[j];
            max_idx = j;
        }
    double ref_w = (ref_idx >= 0 && ref_idx < n) ? w[ref_idx] : 0.0;
    return ref_w * penalty >= max_w ? ref_idx : max_idx;
}

// Inputs are columnar snapshots of the Python Poa (weights may have been
// updated by repeat-count estimation between realign and consensus, so
// they are passed fresh rather than read from an augment handle):
//   bw (n_nodes, 5) f64; rw (n_nodes, max_rc) f64
//   node_syms: n_nodes int8 symbol codes (node 0 == 4/'N')
//   node_rcs: n_nodes i64 current repeat counts
//   ins_node_counts: n_nodes i64; per insert (concatenated in node order):
//     ins_off (n_ins+1 i64 offsets into ins_bases/ins_counts),
//     ins_bases u8, ins_counts i64, ins_w f64 (weight_fwd+weight_rev)
//   del_node_counts: n_nodes i64; del_len i64, del_w f64 per delete
// Output (*out, malloc'd): i64 cons_len, u8 cons_bases (pad8),
//   i64 cons_counts[cons_len], i64 map[n_nodes-1]. Returns byte size.
int64_t mpoa_consensus(
    i64 n_nodes, const double* bw, const double* rw, i64 max_rc,
    const signed char* node_syms, const i64* node_rcs,
    const i64* ins_node_counts, const i64* ins_off, const u8* ins_bases,
    const i64* ins_counts, const double* ins_w,
    const i64* del_node_counts, const i64* del_len, const double* del_w,
    double ref_penalty, i32 use_rle, u8** out) {
    const double NEG_INF = -INFINITY;
    // per-node first-insert / first-delete offsets
    std::vector<i64> ins_at(n_nodes + 1, 0), del_at(n_nodes + 1, 0);
    for (i64 i = 0; i < n_nodes; i++) {
        ins_at[i + 1] = ins_at[i] + ins_node_counts[i];
        del_at[i + 1] = del_at[i] + del_node_counts[i];
    }
    // incoming deletes per target node (poa.py:251-254: node order, then
    // per-node delete order)
    std::vector<std::vector<std::pair<i64, i64>>> incoming(n_nodes + 1);
    for (i64 i = 0; i < n_nodes; i++)
        for (i64 k = del_at[i]; k < del_at[i + 1]; k++) {
            i64 t = i + del_len[k] + 1;
            if (t <= n_nodes) incoming[t].push_back({i, k});
        }

    std::vector<double> total_out(n_nodes, 0.0);
    std::vector<double> fwd(n_nodes + 1, NEG_INF);
    std::vector<double> match_fwd(n_nodes, 0.0);
    fwd[0] = 0.0;
    for (i64 i = 0; i < n_nodes; i++) {
        double total_indel = 0.0;
        for (i64 k = ins_at[i]; k < ins_at[i + 1]; k++)
            total_indel += ins_w[k];
        for (i64 k = del_at[i]; k < del_at[i + 1]; k++)
            total_indel += del_w[k];
        double match_w;
        if (i == 0) {
            if (n_nodes == 1) {
                match_w = 1.0;
            } else {
                match_w = 0.0;
                for (i64 n = 1; n < n_nodes; n++) {
                    double s = 0.0;  // numpy .sum() over the 5 entries
                    for (int b = 0; b < 5; b++) s += bw[n * 5 + b];
                    match_w += s;
                }
                match_w /= (double)(n_nodes - 1);
                match_w -= total_indel;
            }
        } else {
            double s = 0.0;
            for (int b = 0; b < 5; b++) s += bw[i * 5 + b];
            match_w = s - total_indel;
        }
        if (match_w <= 0.0) match_w = 0.0001;
        total_out[i] = match_w + total_indel;
        for (i64 k = ins_at[i]; k < ins_at[i + 1]; k++)
            fwd[i + 1] = log_add_lut64(fwd[i + 1],
                                       fwd[i] + log(ins_w[k] / total_out[i]));
        for (i64 k = del_at[i]; k < del_at[i + 1]; k++) {
            i64 t = i + del_len[k] + 1;
            fwd[t] = log_add_lut64(fwd[t],
                                   fwd[i] + log(del_w[k] / total_out[i]));
        }
        match_fwd[i] = fwd[i] + log(match_w / total_out[i]);
        fwd[i + 1] = log_add_lut64(fwd[i + 1], match_fwd[i]);
    }

    // greedy traceback (poa.c:1460-1563 via poa.py:281-342)
    std::vector<i64> map(n_nodes > 1 ? n_nodes - 1 : 0, -1);
    std::vector<std::string> pieces;
    i64 running_len = 0;
    char prev_base = '-';
    i64 i = n_nodes;
    while (i > 0) {
        if (i < n_nodes) {
            const double* w5 = &bw[i * 5];
            i64 base_idx = get_max_weight(w5, 5, node_syms[i], ref_penalty);
            char base = "ACGTN"[base_idx < 0 ? 4 : base_idx];
            if (use_rle) {
                i64 rc = get_max_weight(&rw[i * max_rc], max_rc,
                                        node_rcs[i], ref_penalty);
                if (rc == 0) rc = 1;
                // rc < 0 is unreachable (some non-ref weight >= 0 always
                // wins the max scan), but mirror Python's `base * rc`
                // (empty string) rather than crash if it ever happens
                pieces.emplace_back(rc > 0 ? (size_t)rc : 0, base);
                if (prev_base != base) {
                    map[i - 1] = running_len;
                    running_len += 1;
                }
                prev_base = base;
            } else {
                pieces.emplace_back(1, base);
                map[i - 1] = running_len;
                running_len += 1;
            }
        }
        i64 p = i - 1;  // predecessor node
        double max_ins_p = NEG_INF, tot_ins_p = NEG_INF;
        i64 max_ins = -1;
        for (i64 k = ins_at[p]; k < ins_at[p + 1]; k++) {
            double pr = log(ins_w[k] / total_out[p]) + fwd[p];
            if (pr > max_ins_p) {
                max_ins_p = pr;
                max_ins = k;
            }
            tot_ins_p = log_add_lut64(tot_ins_p, pr);
        }
        double max_del_p = NEG_INF, tot_del_p = NEG_INF;
        i64 max_del = -1;
        for (const auto& sd : incoming[i]) {
            double pr = log(del_w[sd.second] / total_out[sd.first])
                        + fwd[sd.first];
            if (pr > max_del_p) {
                max_del_p = pr;
                max_del = sd.second;
            }
            tot_del_p = log_add_lut64(tot_del_p, pr);
        }
        if (match_fwd[p] >= tot_del_p && match_fwd[p] >= tot_ins_p) {
            i -= 1;
        } else if (tot_ins_p >= tot_del_p) {
            // expand the chosen insert's RLE string
            std::string ex;
            i64 b0 = ins_off[max_ins], b1 = ins_off[max_ins + 1];
            i64 rle_len = b1 - b0;
            i64 raw_len = 0;
            for (i64 k = b0; k < b1; k++) {
                ex.append((size_t)ins_counts[k], (char)ins_bases[k]);
                raw_len += ins_counts[k];
            }
            pieces.push_back(std::move(ex));
            if (use_rle) {
                char last = (char)ins_bases[b1 - 1];
                running_len += rle_len + (last != prev_base ? 0 : -1);
                prev_base = (char)ins_bases[b0];
            } else {
                running_len += raw_len;
            }
            i -= 1;
        } else {
            i -= del_len[max_del] + 1;
        }
    }

    // assemble reversed pieces, then RLE-encode (rle.c:7-38) or identity
    size_t total_raw = 0;
    for (const std::string& s : pieces) total_raw += s.size();
    std::string expanded;
    expanded.reserve(total_raw);
    for (size_t k = pieces.size(); k-- > 0;) expanded += pieces[k];
    std::vector<u8> cb;
    std::vector<i64> cc;
    if (use_rle) {
        for (size_t k = 0; k < expanded.size(); k++) {
            if (k > 0 && (u8)expanded[k] == cb.back())
                cc.back() += 1;
            else {
                cb.push_back((u8)expanded[k]);
                cc.push_back(1);
            }
        }
    } else {
        cb.assign(expanded.begin(), expanded.end());
        cc.assign(expanded.size(), 1);
    }
    i64 cons_len = (i64)cb.size();
    // reverse map offsets (poa.c:1573-1578)
    for (i64& v : map)
        if (v != -1) v = cons_len - 1 - v;

    auto al8 = [](size_t n) { return (n + 7) & ~size_t(7); };
    size_t bytes = 8 + al8(cb.size()) + cc.size() * 8 + map.size() * 8;
    u8* buf = (u8*)malloc(bytes);
    if (!buf) return -1;
    u8* q = buf;
    memcpy(q, &cons_len, 8);
    q += 8;
    memcpy(q, cb.data(), cb.size());
    memset(q + cb.size(), 0, al8(cb.size()) - cb.size());
    q += al8(cb.size());
    memcpy(q, cc.data(), cc.size() * 8);
    q += cc.size() * 8;
    memcpy(q, map.data(), map.size() * 8);
    q += map.size() * 8;
    if ((size_t)(q - buf) != bytes) {
        free(buf);
        return -1;
    }
    *out = buf;
    return (i64)bytes;
}

}  // extern "C"
