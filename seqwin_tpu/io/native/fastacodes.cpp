// Native FASTA/gzip ingest: file -> base codes + record table.
//
// Host-side analog of the reference's native reader
// (/root/reference/cpp/src/seqwin/fasta_reader.cpp:44-206), re-designed as a
// single-pass byte scanner feeding the TPU engine's base-code contract
// (A=0, C=1, G=2, T/U=3 case-insensitive, 255 otherwise; see
// seqwin_tpu/ops/hashing.py CODE_TAB). Parsing semantics:
//   - plain or gzip input (gzip iff path ends with ".gz")
//   - trailing '\r' stripped per line; blank / whitespace-only lines skipped
//   - record id = first whitespace-delimited token after '>'
//   - intra-line ASCII whitespace removed from sequences
//   - sequence before any header -> error
//
// Exposed as a C ABI for ctypes. One handle per parsed file; the Python side
// copies the code buffer into numpy and frees the handle.

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <vector>

#include <zlib.h>

namespace {

struct Parsed {
    std::vector<uint8_t> codes;          // concatenated base codes
    std::vector<uint64_t> offsets;       // per-record start offsets, n+1
    std::vector<std::string> ids;        // record ids
    std::string error;                   // non-empty on failure
};

constexpr uint8_t kInvalid = 255;

struct Tables {
    uint8_t code[256];
    bool ws[256];
    Tables() {
        std::memset(code, kInvalid, sizeof(code));
        code[uint8_t('A')] = 0; code[uint8_t('a')] = 0;
        code[uint8_t('C')] = 1; code[uint8_t('c')] = 1;
        code[uint8_t('G')] = 2; code[uint8_t('g')] = 2;
        code[uint8_t('T')] = 3; code[uint8_t('t')] = 3;
        code[uint8_t('U')] = 3; code[uint8_t('u')] = 3;
        // SEED_TAB's low-ASCII aliases (hashing_internals.hpp:136-169)
        code[1] = 3; code[3] = 2; code[4] = 0; code[5] = 0; code[7] = 1;
        std::memset(ws, 0, sizeof(ws));
        for (unsigned char c : {' ', '\t', '\n', '\r', '\f', '\v'}) ws[c] = true;
    }
};

const Tables kTab;

bool ends_with(const char* s, const char* suffix) {
    size_t n = std::strlen(s), m = std::strlen(suffix);
    return n >= m && std::strcmp(s + n - m, suffix) == 0;
}

// Parse one line [begin, end) (no terminator). Returns false on error.
bool handle_line(Parsed& p, const char* begin, const char* end, bool& have_record) {
    if (end > begin && end[-1] == '\r') --end;
    // skip blank / whitespace-only lines
    const char* q = begin;
    while (q < end && kTab.ws[(unsigned char)*q]) ++q;
    if (q == end) return true;

    if (*begin == '>') {
        p.offsets.push_back(p.codes.size());
        const char* id_end = begin + 1;
        while (id_end < end && !kTab.ws[(unsigned char)*id_end]) ++id_end;
        p.ids.emplace_back(begin + 1, id_end);
        have_record = true;
        return true;
    }
    if (!have_record) {
        p.error = "Invalid FASTA: sequence encountered before header";
        return false;
    }
    for (const char* c = begin; c < end; ++c) {
        unsigned char u = (unsigned char)*c;
        if (!kTab.ws[u]) p.codes.push_back(kTab.code[u]);
    }
    return true;
}

bool parse_buffer(Parsed& p, const char* data, size_t n) {
    bool have_record = false;
    const char* line = data;
    const char* end = data + n;
    while (line < end) {
        const char* nl = (const char*)std::memchr(line, '\n', (size_t)(end - line));
        const char* stop = nl ? nl : end;
        if (!handle_line(p, line, stop, have_record)) return false;
        line = nl ? nl + 1 : end;
    }
    p.offsets.push_back(p.codes.size());
    return true;
}

bool read_file(const char* path, std::string& out, std::string& err) {
    if (ends_with(path, ".gz")) {
        gzFile gz = gzopen(path, "rb");
        if (!gz) { err = "Unable to open gzip FASTA"; return false; }
        char buf[1 << 16];
        int n;
        while ((n = gzread(gz, buf, sizeof(buf))) > 0) out.append(buf, (size_t)n);
        bool ok = n == 0;
        if (!ok) {
            int errnum = 0;
            const char* msg = gzerror(gz, &errnum);
            err = std::string("gzip read error: ") + (msg ? msg : "unknown");
        }
        gzclose(gz);
        return ok;
    }
    FILE* f = std::fopen(path, "rb");
    if (!f) { err = "Unable to open FASTA"; return false; }
    std::fseek(f, 0, SEEK_END);
    long sz = std::ftell(f);
    std::fseek(f, 0, SEEK_SET);
    out.resize((size_t)sz);
    size_t got = sz ? std::fread(out.data(), 1, (size_t)sz, f) : 0;
    std::fclose(f);
    if ((long)got != sz) { err = "Short read"; return false; }
    return true;
}

}  // namespace

extern "C" {

// Bumped on ANY change to a transfer-buffer layout or function contract
// that keeps the symbol name/arity loadable (e.g. the stop-column removal
// in sq_expand_kmers_nodes): the Python loader rejects a cached .so whose
// version differs and rebuilds, closing the mtime-preserving-copy hole.
uint64_t sq_abi_version() { return 2; }

void* sq_parse(const char* path) {
    auto* p = new Parsed();
    std::string data;
    if (!read_file(path, data, p->error)) return p;  // error recorded
    if (data.empty()) { p->offsets.push_back(0); return p; }
    p->codes.reserve(data.size());
    parse_buffer(*p, data.data(), data.size());
    return p;
}

const char* sq_error(void* h) {
    auto* p = (Parsed*)h;
    return p->error.empty() ? nullptr : p->error.c_str();
}

uint64_t sq_n_records(void* h) { return ((Parsed*)h)->ids.size(); }
uint64_t sq_total_bases(void* h) { return ((Parsed*)h)->codes.size(); }
const uint8_t* sq_codes(void* h) { return ((Parsed*)h)->codes.data(); }
const uint64_t* sq_offsets(void* h) { return ((Parsed*)h)->offsets.data(); }
const char* sq_record_id(void* h, uint64_t i) { return ((Parsed*)h)->ids[i].c_str(); }
void sq_free(void* h) { delete (Parsed*)h; }

// Lay out a scan chunk: copy record code arrays into a padded buffer at
// `offset`, set the record-start flag (bit 6) on each first base, pad with
// 255, and collect the positions of invalid bases (> 3) inside records.
// Returns the total number of invalid in-record bases; at most inv_cap are
// written to inv_out (callers size inv_cap and retry on overflow).
uint64_t sq_layout_chunk(
    const uint8_t** recs,
    const uint64_t* lens,
    uint64_t n_recs,
    uint8_t* buf,
    uint64_t n,
    uint64_t offset,
    int64_t* starts_out,
    int64_t* inv_out,
    uint64_t inv_cap) {
    std::memset(buf, 0xFF, offset);
    uint64_t off = offset;
    uint64_t n_inv = 0;
    for (uint64_t r = 0; r < n_recs; ++r) {
        starts_out[r] = (int64_t)off;
        const uint8_t* src = recs[r];
        uint64_t len = lens[r];
        std::memcpy(buf + off, src, len);
        // invalid scan in u64 blocks: valid codes are 0-3, so any bit in
        // 0xFC flags an invalid byte; blocks without one skip byte checks
        uint64_t i = 0;
        for (; i + 8 <= len; i += 8) {
            uint64_t v;
            std::memcpy(&v, src + i, 8);
            if (!(v & 0xFCFCFCFCFCFCFCFCull)) continue;
            for (int j = 0; j < 8; ++j) {
                if (src[i + j] > 3) {
                    if (n_inv < inv_cap) inv_out[n_inv] = (int64_t)(off + i + j);
                    ++n_inv;
                }
            }
        }
        for (; i < len; ++i) {
            if (src[i] > 3) {
                if (n_inv < inv_cap) inv_out[n_inv] = (int64_t)(off + i);
                ++n_inv;
            }
        }
        if (len > 0) buf[off] |= 0x40;
        off += len;
    }
    if (off < n) std::memset(buf + off, 0xFF, n - off);
    return n_inv;
}

// Packed variant: 2-bit base codes, 4 bases per byte (little-endian within
// the byte). Invalid bases are stored as code 0 and reported via inv_out;
// record-start flags are NOT encoded (the caller applies them on device).
// The caller masks [0, offset) and [offset+total, n) itself.
uint64_t sq_layout_chunk_packed(
    const uint8_t** recs,
    const uint64_t* lens,
    uint64_t n_recs,
    uint8_t* packed,
    uint64_t n,  // total positions; must be a multiple of 4
    uint64_t offset,
    int64_t* starts_out,
    int64_t* inv_out,
    uint64_t inv_cap) {
    std::memset(packed, 0, n / 4);
    uint64_t off = offset;
    uint64_t n_inv = 0;
    // per-base reference step (RMW |= so bytes shared across record
    // boundaries compose; also the invalid-base slow path)
    auto put1 = [&](uint8_t c, uint64_t p) {
        if (c > 3) {
            if (n_inv < inv_cap) inv_out[n_inv] = (int64_t)p;
            ++n_inv;
            c = 0;
        }
        packed[p >> 2] |= (uint8_t)(c << ((p & 3) * 2));
    };
    for (uint64_t r = 0; r < n_recs; ++r) {
        starts_out[r] = (int64_t)off;
        const uint8_t* src = recs[r];
        uint64_t len = lens[r];
        uint64_t i = 0, p = off;
        // head: per-base until the write position is byte-aligned
        for (; i < len && (p & 3); ++i, ++p) put1(src[i], p);
        // body: 8 source bytes -> 2 packed bytes. Valid codes are 0-3, so
        // any bit in 0xFC flags an invalid byte (255) -> slow path for
        // that block. 2-bit gather per u32 half: t | t>>6 | t>>12 | t>>18
        // moves byte-lane code c_j (bits 8j..8j+1) to bits 2j..2j+1.
        for (; i + 8 <= len; i += 8, p += 8) {
            uint64_t v;
            std::memcpy(&v, src + i, 8);
            if (v & 0xFCFCFCFCFCFCFCFCull) {
                for (int j = 0; j < 8; ++j) put1(src[i + j], p + j);
                continue;
            }
            uint32_t lo = (uint32_t)v & 0x03030303u;
            uint32_t hi = (uint32_t)(v >> 32) & 0x03030303u;
            packed[p >> 2] = (uint8_t)((lo | (lo >> 6) | (lo >> 12) | (lo >> 18)) & 0xFFu);
            packed[(p >> 2) + 1] = (uint8_t)((hi | (hi >> 6) | (hi >> 12) | (hi >> 18)) & 0xFFu);
        }
        for (; i < len; ++i, ++p) put1(src[i], p);
        off += len;
    }
    return n_inv;
}


// ---------------------------------------------------------------------------
// Expand compact graph-output column blocks into the structured array
// layouts (KMER_DTYPE / NODE_DTYPE / EDGE_DTYPE, `graph/dtypes.py`). The
// device ships narrow columns (rec/counts/weights as u16, start/stop as u32,
// no penalty slot) to cut d2h wire bytes ~30%; this host-side expansion runs
// at memcpy speed where the equivalent NumPy strided writes measured
// ~100 MB/s (PERF.md).
//
// kn buffer layout (byte offsets in u32 words, block sizes = quantized
// mq/nq):  pos u32[mq] | rec u16[mq] | hash u64[nq] | start u32[nq] |
//          stop u32[nq] | n_tar u16[nq] | n_neg u16[nq]
// edge buffer: first u64[eq] | second u64[eq] | weight u16[eq]

struct SqKmer { uint32_t pos; uint32_t rec; };
struct SqNode { uint64_t hash, start, stop; uint32_t n_tar, n_neg; double penalty; };
struct SqEdge { uint64_t first, second, weight; };

// The compact buffer carries NO stop column: k-mer segments are contiguous
// in the sorted stream, so stop[i] == start[i+1] and the last real node
// stops at stream_m (the total k-mer count) -- 4 fewer wire bytes per node
// (the d2h wire is the measured bottleneck, PERF.md round 5).
void sq_expand_kmers_nodes(
    const uint8_t* buf, uint64_t m, uint64_t n_nodes, uint64_t mq,
    uint64_t nq, uint8_t* kmers_out, uint8_t* nodes_out, uint64_t stream_m) {
    static_assert(sizeof(SqKmer) == 8 && sizeof(SqNode) == 40, "layout");
    const uint32_t* pos = (const uint32_t*)buf;
    const uint16_t* rec = (const uint16_t*)(pos + mq);
    const uint64_t* hash = (const uint64_t*)(rec + mq);
    const uint32_t* start = (const uint32_t*)(hash + nq);
    const uint16_t* n_tar = (const uint16_t*)(start + nq);
    const uint16_t* n_neg = n_tar + nq;
    SqKmer* ko = (SqKmer*)kmers_out;
    for (uint64_t i = 0; i < m; ++i) { ko[i].pos = pos[i]; ko[i].rec = rec[i]; }
    SqNode* no = (SqNode*)nodes_out;
    for (uint64_t i = 0; i < n_nodes; ++i) {
        no[i].hash = hash[i];
        no[i].start = start[i];
        no[i].stop = (i + 1 < n_nodes) ? (uint64_t)start[i + 1] : stream_m;
        no[i].n_tar = n_tar[i];
        no[i].n_neg = n_neg[i];
        no[i].penalty = 0.0;
    }
}

void sq_expand_edges(
    const uint8_t* buf, uint64_t n_edges, uint64_t eq, uint8_t* edges_out) {
    static_assert(sizeof(SqEdge) == 24, "layout");
    const uint64_t* first = (const uint64_t*)buf;
    const uint64_t* second = first + eq;
    const uint16_t* weight = (const uint16_t*)(second + eq);
    SqEdge* eo = (SqEdge*)edges_out;
    for (uint64_t i = 0; i < n_edges; ++i) {
        eo[i].first = first[i];
        eo[i].second = second[i];
        eo[i].weight = weight[i];
    }
}

// Canonical ntHash at sparse positions (host hot path for irregular-window
// patches and the vectorized NumPy builder). The caller supplies the
// per-offset rotated seed tables fwd/rev[k][5] (`ops/host_hash.py::_tables`;
// column 4 = invalid -> 0), so this stays a pure table-XOR loop: the tables
// live in L1 and each position costs 2k XORs. The NumPy equivalent makes
// ~6 full passes over [n, k] gather temporaries, which on this host's
// 60-100 MB/s effective bandwidth measured ~19 us/position.
void sq_canon_at(
    const uint8_t* codes, const int64_t* pos, uint64_t n, uint64_t k,
    const uint64_t* fwd_tab, const uint64_t* rev_tab, uint64_t* out) {
    for (uint64_t i = 0; i < n; ++i) {
        const uint8_t* c = codes + pos[i];
        uint64_t f = 0, r = 0;
        for (uint64_t j = 0; j < k; ++j) {
            unsigned cc = c[j] & 63u;       // strip the record-start flag
            if (cc > 4u) cc = 4u;           // non-ACGT -> zero column
            f ^= fwd_tab[j * 5 + cc];
            r ^= rev_tab[j * 5 + cc];
        }
        out[i] = f + r;                     // u64 wrap == canonical add
    }
}

// Same over a 2-bit packed stream (4 bases/byte; positions must be valid
// ACGT, as in the NumPy version's contract).
void sq_canon_at_packed(
    const uint8_t* packed, const int64_t* pos, uint64_t n, uint64_t k,
    const uint64_t* fwd_tab, const uint64_t* rev_tab, uint64_t* out) {
    for (uint64_t i = 0; i < n; ++i) {
        uint64_t p = (uint64_t)pos[i];
        uint64_t f = 0, r = 0;
        for (uint64_t j = 0; j < k; ++j) {
            uint64_t q = p + j;
            unsigned cc = (packed[q >> 2] >> ((q & 3u) * 2u)) & 3u;
            f ^= fwd_tab[j * 5 + cc];
            r ^= rev_tab[j * 5 + cc];
        }
        out[i] = f + r;
    }
}

}  // extern "C"

