// Native host runtime for umgap_tpu.
//
// The reference's host-side work is Rust (FASTA/FASTQ streaming,
// /root/reference/src/io/); here the Python runner's hot host loops are
// C++: FASTQ/FASTA parsing straight into padded DNA-code batches ready
// for device transfer, and TSV protein -> packed-k-mer splitting for
// index builds. Exposed as a plain C ABI consumed via ctypes.
//
// Build: see native/Makefile (g++ -O3 -shared -fPIC).

#include <cstdint>
#include <cstring>

namespace {

// DNA codes: A=0 C=1 G=2 T=3, everything else N=4
// (reference src/dna/mod.rs:34-44).
struct DnaTable {
    unsigned char t[256];
    DnaTable() {
        memset(t, 4, sizeof(t));
        t[(unsigned char)'A'] = 0;
        t[(unsigned char)'C'] = 1;
        t[(unsigned char)'G'] = 2;
        t[(unsigned char)'T'] = 3;
    }
};
const DnaTable kDna;

// AA codes: 'A'..'Z' -> 0..25, '*' -> 26, other -> 27
// (matches umgap_tpu.ops.encoding).
struct AaTable {
    unsigned char t[256];
    AaTable() {
        memset(t, 27, sizeof(t));
        for (int i = 0; i < 26; i++) t['A' + i] = (unsigned char)i;
        t[(unsigned char)'*'] = 26;
    }
};
const AaTable kAa;

inline const char* find_eol(const char* p, const char* end) {
    const char* nl = (const char*)memchr(p, '\n', (size_t)(end - p));
    return nl ? nl : end;
}

}  // namespace

extern "C" {

// Parse a FASTQ buffer and encode reads as padded DNA codes.
//
//   buf, n       : whole-file buffer
//   out_codes    : cap_reads * max_len bytes, prefilled by caller (N=4)
//   out_lens     : cap_reads int32 (TRUE sequence length, NOT clipped;
//                  only the code rows are clipped at max_len)
//   hdr_starts/hdr_ends : byte spans of each header (without '@')
//   returns      : number of reads parsed, or -1 on malformed input
long umgap_parse_fastq(const char* buf, long n,
                       unsigned char* out_codes, int* out_lens, long max_len,
                       long* hdr_starts, long* hdr_ends, long cap_reads) {
    const char* p = buf;
    const char* end = buf + n;
    long count = 0;
    while (p < end) {
        if (*p != '@') return -1;
        const char* hstart = p + 1;
        const char* eol = find_eol(p, end);
        const char* hend = eol;
        if (hend > hstart && hend[-1] == '\r') hend--;
        p = eol < end ? eol + 1 : end;
        if (count >= cap_reads) return count;  // caller re-invokes
        hdr_starts[count] = hstart - buf;
        hdr_ends[count] = hend - buf;
        // sequence lines until '+'
        unsigned char* row = out_codes + count * max_len;
        long len = 0;
        while (p < end && *p != '+') {
            eol = find_eol(p, end);
            const char* sline_end = eol;
            if (sline_end > p && sline_end[-1] == '\r') sline_end--;
            for (const char* q = p; q < sline_end; q++) {
                if (len < max_len) row[len] = kDna.t[(unsigned char)*q];
                len++;
            }
            p = eol < end ? eol + 1 : end;
        }
        long nseq_chars = len;
        out_lens[count] = (int)len;  // TRUE length; codes clipped at max_len
                                     // (host clamps and can re-bucket)
        // '+' separator line
        if (p < end && *p == '+') {
            eol = find_eol(p, end);
            p = eol < end ? eol + 1 : end;
        }
        // quality: same number of characters as the sequence (line
        // structure may differ; consume lines until enough chars)
        long qchars = 0;
        while (p < end && qchars < nseq_chars) {
            eol = find_eol(p, end);
            const char* qline_end = eol;
            if (qline_end > p && qline_end[-1] == '\r') qline_end--;
            qchars += qline_end - p;
            p = eol < end ? eol + 1 : end;
        }
        count++;
    }
    return count;
}

// Parse a FASTA buffer: records with concatenated sequence lines
// (unwrap=true semantics, reference src/io/fasta.rs:62-64).
long umgap_parse_fasta(const char* buf, long n,
                       unsigned char* out_codes, int* out_lens, long max_len,
                       long* hdr_starts, long* hdr_ends, long cap_reads) {
    const char* p = buf;
    const char* end = buf + n;
    long count = -1;
    while (p < end) {
        const char* eol = find_eol(p, end);
        const char* line_end = eol;
        if (line_end > p && line_end[-1] == '\r') line_end--;
        if (*p == '>') {
            count++;
            if (count >= cap_reads) return count;
            hdr_starts[count] = (p + 1) - buf;
            hdr_ends[count] = line_end - buf;
            out_lens[count] = 0;
        } else if (count >= 0) {
            unsigned char* row = out_codes + count * max_len;
            long len = out_lens[count];
            for (const char* q = p; q < line_end; q++) {
                if (len < max_len) row[len] = kDna.t[(unsigned char)*q];
                len++;
            }
            out_lens[count] = (int)len;  // TRUE length (see fastq above)
        } else {
            return -1;  // content before first header
        }
        p = eol < end ? eol + 1 : end;
    }
    return count + 1;
}

// Split a (taxid TAB protein) TSV buffer into packed 9-mer rows
// (splitkmers equivalent for index builds; 5 bits per AA, first residue
// most significant — matches umgap_tpu.ops.kmers.pack_kmers_host).
//
//   out_packed / out_taxids : capacity cap_rows
//   returns number of rows emitted (call again with bigger cap if == cap)
long umgap_split_kmers(const char* buf, long n, int k,
                       uint64_t* out_packed, int32_t* out_taxids,
                       long cap_rows) {
    const char* p = buf;
    const char* end = buf + n;
    long rows = 0;
    const uint64_t mask = (k >= 13) ? ~0ull : ((1ull << (5 * k)) - 1);
    while (p < end) {
        const char* eol = find_eol(p, end);
        const char* line_end = eol;
        if (line_end > p && line_end[-1] == '\r') line_end--;
        // taxid
        long tid = 0;
        const char* q = p;
        while (q < line_end && *q >= '0' && *q <= '9') tid = tid * 10 + (*q++ - '0');
        if (q < line_end && *q == '\t') q++;
        // rolling pack over the protein
        uint64_t acc = 0;
        int have = 0;
        for (; q < line_end; q++) {
            acc = ((acc << 5) | kAa.t[(unsigned char)*q]) & mask;
            if (++have >= k) {
                if (rows < cap_rows) {
                    out_packed[rows] = acc;
                    out_taxids[rows] = (int32_t)tid;
                }
                rows++;
            }
        }
        p = eol < end ? eol + 1 : end;
    }
    return rows;
}

}  // extern "C"

// ---------------------------------------------------------------------
// joinkmers core: group sorted (key, snapped-tid) rows and aggregate
// each group with tree-hybrid f=factor (the reference's joinkmers
// semantics, src/commands/joinkmers.rs:62-104: inputs are already
// snapped to valid ancestors; the result is rank-snapped by the
// caller-provided ranksnap vector). Multithreaded over group-aligned
// ranges. Pinned tie-break: heaviest child, ties -> smallest child id
// (matches umgap_tpu/agg and the parity oracle).
// ---------------------------------------------------------------------

#include <algorithm>
#include <thread>
#include <utility>
#include <vector>

namespace {

// tree-hybrid descent over one group's (tid, count) pairs using the
// parent vector; counts in float (f32) like the reference.
int32_t tree_mix_group(const std::pair<int64_t, float>* items, int n,
                       const int32_t* parent, float factor,
                       std::vector<std::vector<int32_t>>* lineages) {
    lineages->clear();
    int maxd = 0;
    float total = 0.0f;
    for (int i = 0; i < n; i++) {
        std::vector<int32_t> lin;
        int32_t cur = (int32_t)items[i].first;
        while (true) {
            lin.push_back(cur);
            if (parent[cur] == cur) break;
            cur = parent[cur];
        }
        std::reverse(lin.begin(), lin.end());
        maxd = std::max(maxd, (int)lin.size());
        lineages->push_back(std::move(lin));
        total += items[i].second;
    }
    int32_t x = (*lineages)[0][0];  // root
    float base = total;
    for (int d = 0; d + 1 < maxd; d++) {
        int32_t best_child = -1;
        float best_sum = 0.0f;
        int n_branches = 0;
        // branches at depth d+1 under x (n is tiny; quadratic scan)
        for (int i = 0; i < n; i++) {
            const auto& lin = (*lineages)[i];
            if ((int)lin.size() <= d + 1 || lin[d] != x) continue;
            int32_t b = lin[d + 1];
            // sum counts sharing this branch; count distinct branches
            bool seen_before = false;
            for (int j = 0; j < i; j++) {
                const auto& lj = (*lineages)[j];
                if ((int)lj.size() > d + 1 && lj[d] == x && lj[d + 1] == b) {
                    seen_before = true;
                    break;
                }
            }
            if (seen_before) continue;
            n_branches++;
            float s = 0.0f;
            for (int j = 0; j < n; j++) {
                const auto& lj = (*lineages)[j];
                if ((int)lj.size() > d + 1 && lj[d] == x && lj[d + 1] == b)
                    s += items[j].second;
            }
            if (best_child < 0 || s > best_sum ||
                (s == best_sum && b < best_child)) {
                best_child = b;
                best_sum = s;
            }
        }
        if (n_branches == 0) break;
        if (n_branches > 1) {
            if (best_sum / base < factor) break;
            base = best_sum;
        }
        x = best_child;
    }
    return x;
}

}  // namespace

extern "C" {

// Sorted (keys, snapped) rows -> one (key, rank-snapped aggregate) per
// group. snapped[i] < 0 marks a dropped row (unknown taxon). Returns
// the number of output groups. out_keys/out_vals must have room for one
// entry per distinct key.
long long umgap_join_kmers(const unsigned long long* keys,
                           const long long* snapped, long long n,
                           const int* parent, const int* ranksnap,
                           long long n_tax, float factor, int n_threads,
                           unsigned long long* out_keys, int* out_vals) {
    if (n <= 0) return 0;
    if (n_threads <= 0) n_threads = (int)std::thread::hardware_concurrency();
    if (n_threads <= 0) n_threads = 2;

    // group-aligned range starts
    std::vector<long long> starts;
    for (int t = 0; t <= n_threads; t++) {
        long long pos = n * t / n_threads;
        while (pos > 0 && pos < n && keys[pos] == keys[pos - 1]) pos++;
        starts.push_back(std::min(pos, n));
    }

    std::vector<std::vector<unsigned long long>> tkeys(n_threads);
    std::vector<std::vector<int>> tvals(n_threads);

    auto work = [&](int t) {
        long long lo = starts[t], hi = starts[t + 1];
        std::vector<std::pair<int64_t, float>> items;
        std::vector<std::vector<int32_t>> lineages;
        long long i = lo;
        while (i < hi) {
            unsigned long long key = keys[i];
            items.clear();
            for (; i < hi && keys[i] == key; i++) {
                long long tid = snapped[i];
                if (tid < 0 || tid >= n_tax) continue;
                bool found = false;
                for (auto& it : items)
                    if (it.first == tid) { it.second += 1.0f; found = true; break; }
                if (!found) items.emplace_back(tid, 1.0f);
            }
            if (items.empty()) continue;
            // pinned ascending-id order (matches the numpy path's
            // lexsort; affects only >group_cap truncation, none here)
            std::sort(items.begin(), items.end());
            int32_t agg;
            if (items.size() == 1) {
                agg = (int32_t)items[0].first;
            } else {
                agg = tree_mix_group(items.data(), (int)items.size(), parent,
                                     factor, &lineages);
            }
            tkeys[t].push_back(key);
            tvals[t].push_back(ranksnap[agg]);
        }
    };

    std::vector<std::thread> threads;
    for (int t = 0; t < n_threads; t++) threads.emplace_back(work, t);
    for (auto& th : threads) th.join();

    long long out = 0;
    for (int t = 0; t < n_threads; t++) {
        const auto& ks = tkeys[t];
        const auto& vs = tvals[t];
        for (size_t j = 0; j < ks.size(); j++) {
            out_keys[out] = ks[j];
            out_vals[out] = vs[j];
            out++;
        }
    }
    return out;
}

}  // extern "C"

// ------------------------------------------------------------------- //
// Bucketized table placement (the build-time hot loop)
// ------------------------------------------------------------------- //

extern "C" {

// Place keys into BUCKET-wide rows with bucket-level linear probing,
// reproducing umgap_tpu.index.table._insert_bucketized EXACTLY (same
// slot for every key, so artifacts stay byte-identical to the numpy
// path): per round, pending keys are stably ordered by target bucket,
// the first (bucket - occupancy) of each group fill consecutive slots,
// the rest carry to the next round in that sorted order.
//
//   bucket0      : n int64 home buckets (0 <= b < cap/bucket)
//   p0,p1,p2     : n int32 payload columns (p1/p2 may be NULL)
//   out0..out2   : cap int32 outputs, prefilled by the caller
//                  (out0 = EMPTY, others = 0)
//   tag_distance : OR p0 with min(r,1)<<30 at placement round r
//   max_round    : stop probing after this round (-1 = unlimited)
//   leftover     : n int64 buffer for unplaced ORIGINAL indices
//   max_probes   : out, deepest round that placed a key
//   returns      : leftover count, or -1 (capacity exhausted)
long long umgap_insert_bucketized(
        const long long* bucket0, long long n,
        const int32_t* p0, const int32_t* p1, const int32_t* p2,
        long long cap, int bucket, int max_round, int tag_distance,
        int32_t* out0, int32_t* out1, int32_t* out2,
        long long* leftover, int* max_probes) {
    const long long n_buckets = cap / bucket > 0 ? cap / bucket : 1;
    std::vector<int32_t> occupancy((size_t)n_buckets, 0);
    std::vector<long long> pending((size_t)n);
    for (long long i = 0; i < n; i++) pending[(size_t)i] = i;
    std::vector<long long> counts((size_t)n_buckets + 1, 0);
    std::vector<long long> sorted(pending.size());
    std::vector<long long> next;
    *max_probes = 0;
    long long r = 0;
    while (!pending.empty()) {
        if (max_round >= 0 && r > max_round) break;
        if (r > n_buckets) return -1;
        // stable counting sort of pending by target bucket
        std::fill(counts.begin(), counts.end(), 0);
        for (long long idx : pending) {
            long long b = (bucket0[idx] + r) % n_buckets;
            counts[(size_t)b + 1]++;
        }
        for (size_t b = 1; b < counts.size(); b++) counts[b] += counts[b - 1];
        sorted.resize(pending.size());
        {
            std::vector<long long> cursor(counts.begin(), counts.end() - 1);
            for (long long idx : pending) {
                long long b = (bucket0[idx] + r) % n_buckets;
                sorted[(size_t)cursor[(size_t)b]++] = idx;
            }
        }
        // place the first free-slot-count keys of each bucket group
        next.clear();
        bool placed_any = false;
        size_t pos = 0;
        while (pos < sorted.size()) {
            long long b = (bucket0[sorted[pos]] + r) % n_buckets;
            size_t end = (size_t)counts[(size_t)b + 1];
            int32_t occ = occupancy[(size_t)b];
            int32_t free_slots = bucket - occ;
            int32_t rank = 0;
            for (size_t j = pos; j < end; j++, rank++) {
                long long idx = sorted[j];
                if (rank < free_slots) {
                    long long slot = b * bucket + occ + rank;
                    int32_t v0 = p0[idx];
                    if (tag_distance && r > 0) v0 |= (int32_t)(1 << 30);
                    out0[slot] = v0;
                    if (p1) out1[slot] = p1[idx];
                    if (p2) out2[slot] = p2[idx];
                    placed_any = true;
                } else {
                    next.push_back(idx);
                }
            }
            if (free_slots > 0) {
                int32_t put = rank < free_slots ? rank : free_slots;
                occupancy[(size_t)b] = occ + put;
            }
            pos = end;
        }
        if (placed_any && r > *max_probes) *max_probes = (int)r;
        pending.swap(next);
        r++;
    }
    for (size_t i = 0; i < pending.size(); i++) leftover[i] = pending[i];
    return (long long)pending.size();
}

// Conveyor placement for the dense 2-round (distance <= 1) geometry:
// carried keys take priority in their overflow bucket, home arrivals
// displaced become the next bucket's carry — the optimal left-to-right
// flow for at-most-one-bucket displacement (near-zero stash up to ~0.9
// load, vs ~0.45 for the round-based insertion above).  Tag semantics
// and probe behavior are identical (distance tag 1 on displaced keys;
// a bucket with an empty slot never has displaced/stashed keys).
// Returns the stash count (indices in leftover).
long long umgap_insert_conveyor(
        const long long* bucket0, long long n,
        const int32_t* p0, const int32_t* p1, const int32_t* p2,
        long long cap, int bucket,
        int32_t* out0, int32_t* out1, int32_t* out2,
        long long* leftover, int* max_probes) {
    const long long n_buckets = cap / bucket > 0 ? cap / bucket : 1;
    // stable counting sort by home bucket
    std::vector<long long> counts((size_t)n_buckets + 1, 0);
    for (long long i = 0; i < n; i++) counts[(size_t)bucket0[i] + 1]++;
    for (size_t b = 1; b < counts.size(); b++) counts[b] += counts[b - 1];
    std::vector<long long> sorted((size_t)n);
    {
        std::vector<long long> cursor(counts.begin(), counts.end() - 1);
        for (long long i = 0; i < n; i++)
            sorted[(size_t)cursor[(size_t)bucket0[i]]++] = i;
    }
    *max_probes = 0;
    long long n_stash = 0;
    std::vector<long long> carry;
    std::vector<long long> carry_next;
    std::vector<int32_t> occ0_track(1, 0);  // bucket 0 occupancy (wrap)
    int32_t occ_b0 = 0;

    auto place = [&](long long idx, long long slot, int tag) {
        int32_t v0 = p0[idx];
        if (tag) v0 |= (int32_t)(1 << 30);
        out0[slot] = v0;
        if (p1) out1[slot] = p1[idx];
        if (p2) out2[slot] = p2[idx];
    };

    for (long long b = 0; b < n_buckets; b++) {
        int32_t occ = 0;
        // carried keys (home b-1) first
        size_t take = carry.size();
        if ((long long)take > bucket) take = (size_t)bucket;
        for (size_t j = 0; j < take; j++) {
            place(carry[j], b * bucket + occ, 1);
            occ++;
        }
        if (take) *max_probes = 1;
        for (size_t j = take; j < carry.size(); j++)
            leftover[n_stash++] = carry[j];
        carry.clear();
        // home arrivals
        long long lo = counts[(size_t)b], hi = counts[(size_t)b + 1];
        for (long long j = lo; j < hi; j++) {
            if (occ < bucket) {
                place(sorted[(size_t)j], b * bucket + occ, 0);
                occ++;
            } else {
                carry.push_back(sorted[(size_t)j]);
            }
        }
        if (b == 0) occ_b0 = occ;
    }
    // wrap: carry of the last bucket takes bucket 0's leftover room
    {
        int32_t occ = occ_b0;
        for (size_t j = 0; j < carry.size(); j++) {
            if (occ < bucket) {
                place(carry[j], 0 * bucket + occ, 1);
                occ++;
                *max_probes = 1;
            } else {
                leftover[n_stash++] = carry[j];
            }
        }
    }
    (void)carry_next;
    (void)occ0_track;
    return n_stash;
}

}  // extern "C"

// ------------------------------------------------------------------- //
// In-place (key, tid) row sort for the join stage (ordering within a
// key group is irrelevant to the aggregation, so an unstable sort is
// fine — numpy's stable u64 argsort + double take costs ~2x).
// ------------------------------------------------------------------- //

extern "C" {

void umgap_sort_rows(uint64_t* keys, int64_t* tids, long long n) {
    std::vector<std::pair<uint64_t, int64_t>> rows((size_t)n);
    for (long long i = 0; i < n; i++)
        rows[(size_t)i] = {keys[i], tids[i]};
    std::sort(rows.begin(), rows.end());
    for (long long i = 0; i < n; i++) {
        keys[i] = rows[(size_t)i].first;
        tids[i] = rows[(size_t)i].second;
    }
}

}  // extern "C"
