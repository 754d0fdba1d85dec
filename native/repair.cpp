// Native sparse-repair engine: C++ implementation of the exact engine spec
// (ntedit_tpu/engine/oracle.py — the executable specification of the
// reference algorithm, /root/reference/ntedit.cpp kmerizeAndCorrect
// 1747-2151 / tryIndels 1548-1744 / tryDeletion 1451-1545 / makeEdit
// 1250-1448, with the clean-spec deviations listed in FIDELITY.md).
//
// Division of labour (the TPU-first design): the dense per-base flag pass —
// the throughput-dominant work — runs on the TPU
// (ntedit_tpu.engine.flag / ops.flag_kernel); this library performs the
// sparse, branchy trial-and-verify repair at the flagged sites, fast-
// forwarding over stretches the device proved clean.  It replaces the
// reference's OpenMP C++ hot loop with a gate-hint-driven native scan, and
// is property-tested for bit-identical output against the Python oracle
// (tests/test_native_repair.py).
//
// C ABI (ctypes consumer: ntedit_tpu/engine/native_repair.py):
//   ntr_polish_contig(...) — polish/SNV one contig, emit substitution
//   records + the final rope node stream (insertions/deletions) and write
//   substitutions/masks into the caller's contig buffer in place.
//
// Build: make -C native libntedit_repair.so

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <string>
#include <vector>

// ---------------------------------------------------------------------------
// ntHash2 (spec: ntedit_tpu/core/nthash_ref.py; reference ntedit.cpp:403-452)
// ---------------------------------------------------------------------------

namespace nth {

static const uint64_t SEED_A = 0x3C8BFBB395C60474ULL;
static const uint64_t SEED_C = 0x3193C18562A02B4CULL;
static const uint64_t SEED_G = 0x20323ED082572324ULL;
static const uint64_t SEED_T = 0x295549F54BE24456ULL;
static const uint64_t MULTISEED = 0x90B45D39FB6DA1FAULL;
static const int MULTISHIFT = 27;
static const int CP_OFF = 0x07;
static const uint64_t LOW33 = 0x1FFFFFFFFULL;

static uint64_t SEED_TAB[256];
static uint64_t SROL_K_TAB[256];    // srol(seed, k) per char — rolling out
static uint64_t SROL_K1_CP[256];    // srol(cseed, k-1) per char — changelast
static int g_seed_k = -1;

static inline uint64_t srol1(uint64_t x) {
  uint64_t m = ((x & 0x8000000000000000ULL) >> 30) | ((x & 0x100000000ULL) >> 32);
  return ((x << 1) & 0xFFFFFFFDFFFFFFFFULL) | m;
}

static inline uint64_t srol(uint64_t x, int d) {
  int dl = d % 33, dh = d % 31;
  uint64_t lo = x & LOW33;
  uint64_t hi = x >> 33;
  if (dl) lo = ((lo << dl) | (lo >> (33 - dl))) & LOW33;
  if (dh) hi = ((hi << dh) | (hi >> (31 - dh))) & 0x7FFFFFFFULL;
  return (hi << 33) | lo;
}

static inline uint64_t sror1(uint64_t x) {
  uint64_t lo = x & LOW33;
  uint64_t hi = x >> 33;
  lo = ((lo >> 1) | (lo << 32)) & LOW33;
  hi = ((hi >> 1) | (hi << 30)) & 0x7FFFFFFFULL;
  return (hi << 33) | lo;
}

static void init_tables(int k) {
  if (g_seed_k == k) return;
  memset(SEED_TAB, 0, sizeof(SEED_TAB));
  const char* chars[4] = {"Aa", "Cc", "Gg", "Tt"};
  const uint64_t seeds[4] = {SEED_A, SEED_C, SEED_G, SEED_T};
  for (int i = 0; i < 4; ++i)
    for (const char* p = chars[i]; *p; ++p)
      SEED_TAB[(unsigned char)*p] = seeds[i];
  // complement slots reachable through (c & CP_OFF)
  SEED_TAB['A' & CP_OFF] = SEED_T;
  SEED_TAB['C' & CP_OFF] = SEED_G;
  SEED_TAB['T' & CP_OFF] = SEED_A;
  SEED_TAB['G' & CP_OFF] = SEED_C;
  for (int c = 0; c < 256; ++c) {
    SROL_K_TAB[c] = srol(SEED_TAB[c], k);
    SROL_K1_CP[c] = srol(SEED_TAB[c & CP_OFF], k - 1);
  }
  g_seed_k = k;
}

static inline uint64_t fwd_hash(const uint8_t* s, int k) {
  uint64_t h = 0;
  for (int i = 0; i < k; ++i) h = srol1(h) ^ SEED_TAB[s[i]];
  return h;
}

static inline uint64_t rev_hash(const uint8_t* s, int k) {
  uint64_t h = 0;
  for (int i = k - 1; i >= 0; --i) h = srol1(h) ^ SEED_TAB[s[i] & CP_OFF];
  return h;
}

static inline uint64_t next_fwd(uint64_t fh, unsigned char out, unsigned char in) {
  return srol1(fh) ^ SROL_K_TAB[out] ^ SEED_TAB[in];
}
static inline uint64_t next_rev(uint64_t rh, unsigned char out, unsigned char in) {
  return sror1(rh ^ SEED_TAB[out & CP_OFF] ^ srol1(SROL_K1_CP[in]));
}
static inline uint64_t chlast_fwd(uint64_t fh, unsigned char out, unsigned char in) {
  return fh ^ SEED_TAB[out] ^ SEED_TAB[in];
}
static inline uint64_t chlast_rev(uint64_t rh, unsigned char out, unsigned char in) {
  return rh ^ SROL_K1_CP[out] ^ SROL_K1_CP[in];
}
static inline uint64_t canonical(uint64_t fh, uint64_t rh) {
  return fh < rh ? fh : rh;
}

}  // namespace nth

// ---------------------------------------------------------------------------
// Filters (spec: ntedit_tpu/core/bloom.py)
// ---------------------------------------------------------------------------

extern "C" {

// kind: 0 = plain bit-array BF (btllib layout), 1 = blocked32,
//       2 = counting uint8 (count-min)
struct NtrFilter {
  int32_t kind;
  int32_t hash_num;
  const uint8_t* data;
  uint64_t nbytes;
};

struct NtrParams {
  int32_t k;
  int32_t jump;
  int32_t mode;            // 0/1/2
  int32_t max_insertions;  // 0..5
  int32_t max_deletions;   // 0..10
  int32_t min_threshold;   // -p
  int32_t max_threshold;   // -q
  int32_t insertion_cap;   // k*1.5
  int32_t snv;
  int32_t mask;
  double missing_needed;
  double present_needed;
  double present_needed_deletion;
  int32_t rope_compat;  // reference rope deletion off-by-one (FIDELITY #1)
};

}  // extern "C"

namespace eng {

struct Filter {
  int kind = 0;
  int hash_num = 3;
  const uint8_t* data = nullptr;
  uint64_t nbytes = 0;
  uint64_t bits = 0;
  bool pow2 = false;
  uint64_t mask = 0;
  // blocked32 fields
  const uint32_t* words = nullptr;
  uint64_t nwords = 0;
  int wbits = 0;
  int k = 25;

  void init(const NtrFilter& f, int k_) {
    kind = f.kind;
    hash_num = f.hash_num;
    data = f.data;
    nbytes = f.nbytes;
    bits = nbytes * 8;
    pow2 = bits && (bits & (bits - 1)) == 0;
    mask = bits - 1;
    k = k_;
    if (kind == 1) {
      words = reinterpret_cast<const uint32_t*>(f.data);
      nwords = nbytes / 4;
      wbits = 0;
      uint64_t w = nwords;
      while (w > 1) { w >>= 1; ++wbits; }
    }
  }

  bool counting() const { return kind == 2; }

  // spec: bloom.KmerBloomFilter.contains_hashes over extend_hashes — h[0] is
  // the canonical hash, h[i>=1] the NTM64 mix (nthash_ref.extend_hashes).
  inline bool contains_plain(uint64_t canon) const {
    uint64_t h = canon;
    for (int i = 0; i < hash_num; ++i) {
      if (i) {
        uint64_t mult = (uint64_t)i ^ ((uint64_t)k * nth::MULTISEED);
        h = canon * mult;
        h ^= h >> nth::MULTISHIFT;
      }
      uint64_t idx = pow2 ? (h & mask) : (h % bits);
      if (!((data[idx >> 3] >> (idx & 7)) & 1)) return false;
    }
    return true;
  }

  // spec: bloom.BlockedKmerBloomFilter._word_mask / contains_base
  inline bool contains_blocked(uint64_t canon) const {
    uint64_t widx = canon & (nwords - 1);
    uint32_t m = 0;
    for (int j = 0; j < hash_num; ++j)
      m |= 1u << ((canon >> (wbits + 5 * j)) & 31);
    return (words[widx] & m) == m;
  }

  // spec: bloom.KmerCountingBloomFilter8.count_hashes (min over m slots)
  inline uint8_t count_of(uint64_t canon) const {
    uint64_t h = canon;
    uint8_t c = 255;
    for (int i = 0; i < hash_num; ++i) {
      if (i) {
        uint64_t mult = (uint64_t)i ^ ((uint64_t)k * nth::MULTISEED);
        h = canon * mult;
        h ^= h >> nth::MULTISHIFT;
      }
      uint8_t v = data[h % nbytes];
      if (v < c) c = v;
    }
    return c;
  }

  // BFLike.contains: counting -> count > 0
  inline bool contains(uint64_t canon) const {
    if (kind == 1) return contains_blocked(canon);
    if (kind == 2) return count_of(canon) > 0;
    return contains_plain(canon);
  }

  // Issue cache prefetches for every line contains()/count_of() will
  // touch for this hash.  Read-only hint: never changes results, only
  // overlaps the DRAM misses of upcoming probes (the filter is 100s of
  // MiB at scale — each probe is a guaranteed cache miss otherwise).
  inline void prefetch(uint64_t canon) const {
    if (kind == 1) {
      __builtin_prefetch(&words[canon & (nwords - 1)], 0, 1);
      return;
    }
    uint64_t h = canon;
    for (int i = 0; i < hash_num; ++i) {
      if (i) {
        uint64_t mult = (uint64_t)i ^ ((uint64_t)k * nth::MULTISEED);
        h = canon * mult;
        h ^= h >> nth::MULTISHIFT;
      }
      if (kind == 2) {
        __builtin_prefetch(&data[h % nbytes], 0, 1);
      } else {
        uint64_t idx = pow2 ? (h & mask) : (h % bits);
        __builtin_prefetch(&data[idx >> 3], 0, 1);
      }
    }
  }
  // BFLike.get_count: 1 for non-counting
  inline uint8_t get_count(uint64_t canon) const {
    if (kind == 2) return count_of(canon);
    return 1;
  }
};

// ---------------------------------------------------------------------------
// Base tables (spec: ntedit_tpu/engine/config.py; reference ntedit.cpp:172-348)
// ---------------------------------------------------------------------------

static const int NUM_TRIES[6] = {0, 1, 5, 21, 85, 341};

static bool ACCEPTED[256];
static bool IS_ATGC[256];
static std::string BASES_POLISH[256];
static std::string BASES_SNV[256];
static std::vector<std::string> MULTI[4];  // insertion strings per first base
static bool g_tables_built = false;

static inline int base_index(unsigned char c) {
  switch (c) { case 'A': return 0; case 'C': return 1; case 'G': return 2; default: return 3; }
}

static inline unsigned char rc_char(unsigned char c) {
  // config.rc_char: complement of ACGT (case-folded to upper), else 'N'
  switch (c) {
    case 'A': case 'a': return 'T';
    case 'T': case 't': return 'A';
    case 'G': case 'g': return 'C';
    case 'C': case 'c': return 'G';
    default: return 'N';
  }
}

static inline unsigned char upper(unsigned char c) {
  return (c >= 'a' && c <= 'z') ? c - 32 : c;
}

static void build_tables() {
  if (g_tables_built) return;
  memset(ACCEPTED, 0, sizeof(ACCEPTED));
  memset(IS_ATGC, 0, sizeof(IS_ATGC));
  for (const char* p = "ATGCRYSWKMBDHV"; *p; ++p) ACCEPTED[(unsigned char)*p] = true;
  for (const char* p = "ACGT"; *p; ++p) IS_ATGC[(unsigned char)*p] = true;
  // POLISH_BASES / SNV_BASES keyed on the (already uppercased) draft char
  const struct { char c; const char* alts; } pol[] = {
      {'A', "TCG"}, {'T', "ACG"}, {'C', "ATG"}, {'G', "ATC"},
      {'R', "TC"}, {'Y', "AG"}, {'S', "AT"}, {'W', "CG"}, {'K', "AC"},
      {'M', "TG"}, {'B', "A"}, {'D', "C"}, {'H', "G"}, {'V', "T"},
      {'N', "ATCG"},
  };
  for (auto& e : pol) BASES_POLISH[(unsigned char)e.c] = e.alts;
  for (const char* p = "RYSWKMBDHVN"; *p; ++p) BASES_SNV[(unsigned char)*p] = "ATCG";
  BASES_SNV['A'] = "TCG"; BASES_SNV['T'] = "ACG";
  BASES_SNV['C'] = "ATG"; BASES_SNV['G'] = "ATC";
  // MULTI_POSSIBLE_BASES: length 1..5 then lexicographic over ACGT
  const char* bases = "ACGT";
  for (int fi = 0; fi < 4; ++fi) {
    MULTI[fi].clear();
    for (int len = 1; len <= 5; ++len) {
      int reps = 1;
      for (int t = 1; t < len; ++t) reps *= 4;
      for (int r = 0; r < reps; ++r) {
        std::string s(1, bases[fi]);
        for (int t = len - 2; t >= 0; --t) s += bases[(r >> (2 * t)) & 3];
        MULTI[fi].push_back(s);
      }
    }
  }
  g_tables_built = true;
}

// is_repeat_insertion: KMP failure-function periodicity (oracle.py:424-443)
static bool is_repeat_insertion(const std::string& s) {
  size_t n = s.size();
  if (n == 0) return false;
  std::vector<int> lps(n, 0);
  int ln = 0;
  size_t i = 1;
  while (i < n) {
    if (s[i] == s[ln]) { lps[i++] = ++ln; }
    else if (ln != 0) { ln = lps[ln - 1]; }
    else { lps[i++] = 0; }
  }
  ln = lps[n - 1];
  return ln > 0 && n % (n - (size_t)ln) == 0;
}

// median_u8: sorted()[len/2], 0 for empty (oracle.py:347-352)
static int median_u8(std::vector<uint8_t>& v) {
  if (v.empty()) return 0;
  std::sort(v.begin(), v.end());
  return v[v.size() / 2];
}

// ---------------------------------------------------------------------------
// Rope (spec: oracle.RopeCells — seqNode rope behind a cell-list facade)
// ---------------------------------------------------------------------------

struct Node {
  int8_t kind;       // 0 span, 1 ins
  int64_t s, e;      // span coords (kind 0)
  uint8_t ch;        // ins char (kind 1)
  int32_t ins_sup;   // cell[INS_SUP]
  int32_t span_sup;  // cell[SPAN_SUP] (span: node sup; ins: per-cell field)
};

struct Cursor {
  int64_t idx = 0;   // flat cell index
  int32_t node = 0;  // node index
  int64_t off = 0;   // offset within node (0 for ins nodes)
};

struct Rope {
  std::vector<Node> nodes;
  std::vector<int64_t> cum;  // prefix cell counts, nodes.size()+1 entries
  bool cum_dirty = true;
  int64_t length = 0;
  uint8_t* contig = nullptr;  // original-coordinate byte buffer (mutable)

  void init(uint8_t* buf, int64_t n) {
    contig = buf;
    length = n;
    nodes.clear();
    if (n) nodes.push_back({0, 0, n - 1, 0, 0, 0});
    cum_dirty = true;
  }

  inline int64_t node_len(const Node& nd) const {
    return nd.kind == 0 ? nd.e - nd.s + 1 : 1;
  }

  void rebuild_cum() {
    cum.resize(nodes.size() + 1);
    cum[0] = 0;
    for (size_t i = 0; i < nodes.size(); ++i) cum[i + 1] = cum[i] + node_len(nodes[i]);
    cum_dirty = false;
  }

  Cursor locate(int64_t i) {
    if (cum_dirty) rebuild_cum();
    // upper_bound(cum, i) - 1
    int64_t lo = 0, hi = (int64_t)nodes.size();
    while (lo < hi) {
      int64_t mid = (lo + hi) / 2;
      if (cum[mid + 1] <= i) lo = mid + 1; else hi = mid;
    }
    Cursor c;
    c.idx = i;
    c.node = (int32_t)lo;
    c.off = (lo < (int64_t)nodes.size()) ? i - cum[lo] : 0;
    return c;
  }

  inline bool at_end(const Cursor& c) const { return c.idx >= length; }

  inline uint8_t char_at(const Cursor& c) const {
    const Node& nd = nodes[c.node];
    return nd.kind == 0 ? contig[nd.s + c.off] : nd.ch;
  }
  inline int64_t orig_at(const Cursor& c) const {
    const Node& nd = nodes[c.node];
    return nd.kind == 0 ? nd.s + c.off : -1;
  }
  inline bool is_span(const Cursor& c) const { return nodes[c.node].kind == 0; }

  // advance the cursor one cell (idx+1); caller must not call at idx==length
  inline void advance(Cursor& c) const {
    ++c.idx;
    const Node& nd = nodes[c.node];
    if (c.off + 1 < node_len(nd)) { ++c.off; return; }
    ++c.node;
    c.off = 0;
  }

  // _seq_of(idx): own coordinate for span cells; else prev span coord + 1;
  // 0 when no original cell precedes (oracle.py:538-548)
  int64_t seq_of(int64_t idx) {
    if (idx >= 0 && idx < length) {
      Cursor c = locate(idx);
      const Node& nd = nodes[c.node];
      if (nd.kind == 0) return nd.s + c.off;
      // walk back from this node
      for (int32_t ni = c.node - 1; ni >= 0; --ni)
        if (nodes[ni].kind == 0) return nodes[ni].e + 1;
      return 0;
    }
    // out of range: scan back from the last node
    for (int32_t ni = (int32_t)nodes.size() - 1; ni >= 0; --ni)
      if (nodes[ni].kind == 0) return nodes[ni].e + 1;
    return 0;
  }

  // split so that a node boundary exists at cell index i; returns the index
  // of the node starting at i (== nodes.size() when i == length)
  int32_t split_at(int64_t i) {
    if (i == length) return (int32_t)nodes.size();
    Cursor c = locate(i);
    if (c.off == 0) return c.node;
    Node nd = nodes[c.node];  // mid-span (ins nodes have length 1)
    nodes[c.node] = {0, nd.s, nd.s + c.off - 1, 0, 0, nd.span_sup};
    Node right = {0, nd.s + c.off, nd.e, 0, 0, nd.span_sup};
    nodes.insert(nodes.begin() + c.node + 1, right);
    cum_dirty = true;
    return c.node + 1;
  }

  // insert `m` ins cells before cell index i
  void insert_cells(int64_t i, const std::string& chars, int32_t sup) {
    int32_t ni = split_at(i);
    std::vector<Node> ins;
    ins.reserve(chars.size());
    for (char ch : chars) ins.push_back({1, 0, 0, (uint8_t)ch, sup, 0});
    nodes.insert(nodes.begin() + ni, ins.begin(), ins.end());
    length += (int64_t)chars.size();
    cum_dirty = true;
  }

  // delete cells [a, b)
  void erase_cells(int64_t a, int64_t b) {
    if (a >= b) return;
    int32_t na = split_at(a);
    int32_t nb = split_at(b);
    nodes.erase(nodes.begin() + na, nodes.begin() + nb);
    length -= b - a;
    cum_dirty = true;
  }

  // Effective deletion length under reference rope semantics (rope_compat):
  // makeDeletion's leftover = pos + num_del - e_pos when consuming a span
  // node past its end (ntedit.cpp:739,767) — one more than the clean
  // remainder, cascading per node exit; a leftover with no following node
  // is dropped (ntedit.cpp:773-780).  Char nodes consume exactly
  // (ntedit.cpp:782-808).  Mirrors oracle.py RopeCells.compat_deletion_len.
  int64_t compat_deletion_len(int64_t idx, int64_t n_del) {
    if (idx >= length) return 0;
    Cursor c = locate(idx);
    int64_t remaining = n_del, total = 0;
    int32_t ni = c.node;
    int64_t off = c.off;
    while (remaining > 0 && ni < (int32_t)nodes.size()) {
      const Node& nd = nodes[ni];
      if (nd.kind == 0) {
        int64_t avail = (nd.e - nd.s + 1) - off;
        if (remaining < avail) {
          total += remaining;
          remaining = 0;
        } else {
          total += avail;
          remaining = remaining - avail + 1;  // the off-by-one
        }
      } else {
        total += 1;
        remaining -= 1;
      }
      ++ni;
      off = 0;
    }
    int64_t cap = length - idx;
    return total < cap ? total : cap;
  }

  // set_span_sup: split at i, set sup on the node starting there
  void set_span_sup(int64_t i, int32_t sup) {
    int32_t ni = split_at(i);
    Node& nd = nodes[ni];
    if (nd.kind == 0) nd.span_sup = sup;
    else nd.span_sup = sup;  // ins cell's SPAN_SUP field
  }
};

// ---------------------------------------------------------------------------
// Engine state
// ---------------------------------------------------------------------------

struct SubRecC {
  int64_t pos;
  uint8_t draft_char, sub_base;
  int32_t num_support;
  uint8_t altbase1, altbase2, altbase3;
  int32_t altsupp1, altsupp2, altsupp3;
};

struct Best {
  int type = 0;
  uint8_t sub_base = 0;
  std::string indel, alt_indel;
  int support = 0;
  uint8_t altbase1 = 0, altbase2 = 0, altbase3 = 0;
  int altsupp1 = 0, altsupp2 = 0, altsupp3 = 0;
};

// shuffle_best (oracle.py:388-421)
static void shuffle_best(Best& b, uint8_t sub_base, int check_present) {
  if (check_present >= b.support) {
    if (b.altsupp2) { b.altbase3 = b.altbase2; b.altsupp3 = b.altsupp2; }
    if (b.altsupp1) { b.altbase2 = b.altbase1; b.altsupp2 = b.altsupp1; }
    if (b.support) { b.altbase1 = b.sub_base; b.altsupp1 = b.support; }
    b.type = 1;
    b.sub_base = sub_base;
    b.support = check_present;
  } else {
    if (!b.altsupp1) {
      b.altbase1 = sub_base; b.altsupp1 = check_present;
    } else if (!b.altsupp2) {
      if (check_present < b.altsupp1) {
        b.altbase2 = sub_base; b.altsupp2 = check_present;
      } else {
        b.altbase2 = b.altbase1; b.altsupp2 = b.altsupp1;
        b.altbase1 = sub_base; b.altsupp1 = check_present;
      }
    } else if (!b.altsupp3) {
      if (check_present < b.altsupp2) {
        b.altbase3 = sub_base; b.altsupp3 = check_present;
      } else if (check_present < b.altsupp1) {
        b.altbase3 = b.altbase2; b.altsupp3 = b.altsupp2;
        b.altbase2 = sub_base; b.altsupp2 = check_present;
      } else {
        b.altbase3 = b.altbase2; b.altsupp3 = b.altsupp2;
        b.altbase2 = b.altbase1; b.altsupp2 = b.altsupp1;
        b.altbase1 = sub_base; b.altsupp1 = check_present;
      }
    }
  }
}

// make_sub_rec ranked-alternate de-duplication (oracle.py:281-294)
static SubRecC make_sub_rec(uint8_t draft_char, const Best& b, int64_t pos) {
  SubRecC r{};
  r.pos = pos;
  r.draft_char = draft_char;
  r.sub_base = b.sub_base;
  r.num_support = b.support;
  if (b.altsupp1 && b.altbase1 != b.sub_base) { r.altbase1 = b.altbase1; r.altsupp1 = b.altsupp1; }
  if (b.altsupp2 && b.altbase2 != b.altbase1) { r.altbase2 = b.altbase2; r.altsupp2 = b.altsupp2; }
  if (b.altsupp3 && b.altbase3 != b.altbase2) { r.altbase3 = b.altbase3; r.altsupp3 = b.altsupp3; }
  return r;
}

struct State {  // st = [h_idx, h_seq, t_idx, t_seq] with O(1) cursors
  Cursor h, t;
  int64_t h_seq = 0, t_seq = 0;
};

struct Engine {
  Filter bf, bfrep;
  bool has_rep = false;
  NtrParams p;
  Rope rope;
  int64_t L = 0;  // original contig length
  std::vector<SubRecC> subs;
  int64_t dirty_hint = 0;
  const std::string* bases_tab;  // BASES_POLISH or BASES_SNV
  // Device-precomputed substitution candidates (VERDICT r2 #7): for gate
  // head g, cand_masks[i] bit c == bf.contains(changelast(draft window at
  // gates[i] -> base "ACGT"[c])) evaluated on the PRISTINE draft; 0xFF =
  // no information (exception window), probe live.  Only consulted when
  // the current window provably equals the draft (see fix_site).
  const int64_t* cand_gates = nullptr;
  const uint8_t* cand_masks = nullptr;
  int64_t n_cand = 0;
  // Device-precomputed SNV site decisions (flag.snv_site_data): parallel
  // to cand_gates, 6 uint8 per entry [flags, check_there, verA, verC,
  // verG, verT]; flags bit0 = row valid, bits 1-4 = alternate pre-check
  // bits.  Consumed in fix_site at provably-pristine SNV windows — zero
  // probes; arbitration still runs below, so output is bit-identical
  // with or without rows.
  const uint8_t* site_rows = nullptr;
  int64_t max_edit_orig = -1;  // max original coord written in place

  inline bool counting() const { return bf.counting(); }

  // BFLike.contains / get_count over the canonical hash
  inline bool contains(uint64_t fh, uint64_t rh) const {
    return bf.contains(nth::canonical(fh, rh));
  }
  inline uint8_t get_count(uint64_t fh, uint64_t rh) const {
    return bf.get_count(nth::canonical(fh, rh));
  }
  // is_kmer_solid (oracle._solid; ntedit.cpp:465-473)
  inline bool solid_canon(uint64_t canon) const {
    if (has_rep && bfrep.contains(canon)) return false;
    if (bf.counting()) {
      uint8_t c = bf.count_of(canon);
      return p.min_threshold <= c && c <= p.max_threshold;
    }
    return true;
  }
  inline bool solid(uint64_t fh, uint64_t rh) const {
    return solid_canon(nth::canonical(fh, rh));
  }

  // _inc (oracle.py:479-488): span cells advance seq; landing on a span
  // cell adopts its coordinate
  inline void inc(Cursor& c, int64_t& seq) {
    if (!rope.at_end(c) && rope.is_span(c)) seq += 1;
    rope.advance(c);
    if (!rope.at_end(c) && rope.is_span(c)) seq = rope.orig_at(c);
  }

  // _roll (oracle.py:490-503)
  inline bool roll(State& st, uint8_t& char_out, uint8_t& char_in) {
    if (st.h.idx >= rope.length) { char_out = 0; char_in = 0; return false; }
    char_out = rope.char_at(st.h);
    inc(st.h, st.h_seq);
    if (st.t.idx >= rope.length) { char_in = 0; return false; }
    inc(st.t, st.t_seq);
    if (st.t.idx >= rope.length) { char_in = 0; return false; }
    char_in = rope.char_at(st.t);
    return true;
  }

  // _prev_insertion (oracle.py:550-558): RC of the run of inserted cells
  // immediately before the cursor.  Cursor-local node walk.
  std::string prev_insertion(const State& st) {
    std::string out;
    int32_t ni = st.t.node;
    int64_t off = st.t.off;
    // step to the previous cell repeatedly while it is an ins cell
    while (true) {
      int32_t pn = ni;
      int64_t po = off;
      if (po > 0) { --po; }
      else {
        --pn;
        if (pn < 0) break;
        po = rope.node_len(rope.nodes[pn]) - 1;
      }
      const Node& nd = rope.nodes[pn];
      if (nd.kind != 1) break;
      out.push_back((char)rc_char(nd.ch));
      ni = pn; off = po;
    }
    return out;
  }

  // _find_accepted_kmer (oracle.py:505-536): scan from the tail cursor for
  // k consecutive accepted cells; updates st, returns false at contig end
  bool find_accepted_kmer(State& st, uint8_t* kmer_out) {
    int k = p.k;
    int64_t n = rope.length;
    int64_t i = st.t.idx;
    Cursor ci = (i < n) ? rope.locate(i) : Cursor{i, 0, 0};
    while (i < n) {
      if (ACCEPTED[upper(rope.char_at(ci))]) {
        kmer_out[0] = rope.char_at(ci);
        int got = 1;
        Cursor cj = ci;
        int64_t j = i;
        int64_t bad_at = -1;
        while (got < k && j + 1 < n) {
          ++j;
          rope.advance(cj);
          uint8_t c = rope.char_at(cj);
          if (!ACCEPTED[upper(c)]) { bad_at = j; break; }
          kmer_out[got++] = c;
        }
        if (got == k) {
          st.h = ci;
          st.t = cj;
          st.h_seq = rope.seq_of(i);
          st.t_seq = rope.seq_of(j);
          return true;
        }
        int64_t next_i = (bad_at >= 0) ? bad_at + 1 : i + 1;
        while (i < next_i && i < n) { ++i; if (i < n) rope.advance(ci); }
        continue;
      }
      ++i;
      if (i < n) rope.advance(ci);
    }
    st.h.idx = st.t.idx = n;
    st.h_seq = st.t_seq = L;
    return false;
  }

  // _try_deletion (oracle.py:561-595)
  int try_deletion(uint8_t draft_char, int num_deletions, const State& st,
                   uint64_t fh, uint64_t rh, std::string& deleted_out) {
    State tmp = st;
    std::string deleted;
    for (int i = 0; i < num_deletions; ++i) {
      if (tmp.t.idx >= rope.length) return 0;  // runs past end (clean spec)
      deleted.push_back((char)rope.char_at(tmp.t));
      inc(tmp.t, tmp.t_seq);
    }
    if (tmp.t.idx >= rope.length) return 0;
    uint8_t new_last = rope.char_at(tmp.t);
    uint64_t tfh = nth::chlast_fwd(fh, draft_char, new_last);
    uint64_t trh = nth::chlast_rev(rh, draft_char, new_last);
    int check_present = 0;
    // two-phase stride verify (hash+prefetch, then probe)
    uint64_t dcanon[256];
    int nd = 0;
    dcanon[nd] = nth::canonical(tfh, trh);
    bf.prefetch(dcanon[nd]);
    ++nd;
    for (int kk = 1; kk < p.k - 1; ++kk) {
      if (tmp.h.idx >= rope.length) break;
      uint8_t co, ci;
      if (roll(tmp, co, ci)) {
        tfh = nth::next_fwd(tfh, co, ci);
        trh = nth::next_rev(trh, co, ci);
        if (kk % p.jump == 0) {
          uint64_t c2 = nth::canonical(tfh, trh);
          bf.prefetch(c2);
          dcanon[nd++] = c2;
        }
      }
    }
    for (int i2 = 0; i2 < nd; ++i2)
      if (bf.contains(dcanon[i2]) && solid_canon(dcanon[i2])) ++check_present;
    if ((double)check_present >= p.present_needed_deletion) {
      deleted_out = deleted;
      return check_present;
    }
    return 0;
  }

  // _try_indels (oracle.py:597-672)
  bool try_indels(uint8_t draft_char, uint8_t index_char, int& del_state,
                  const State& st, uint64_t fh, uint64_t rh, Best& best) {
    int t_best_sup = 0, t_alt_sup = 0, t_best_type = 0;
    std::string t_best_indel, t_alt_indel;
    int tries = NUM_TRIES[p.max_insertions];
    const std::vector<std::string>& tab = MULTI[base_index(index_char)];
    for (int i = 0; i < tries; ++i) {
      std::string ins = tab[i] + (char)draft_char;
      State tmp = st;
      uint64_t tfh = nth::chlast_fwd(fh, draft_char, index_char);
      uint64_t trh = nth::chlast_rev(rh, draft_char, index_char);
      int check_present = 0;
      int kk = 0;
      // two-phase stride verify (hash+prefetch, then probe) across both
      // roll phases — same probe set/results as the interleaved loops
      uint64_t icanon[256];
      int ni = 0;
      // phase 1: roll the remaining insertion chars in while the head
      // consumes buffer chars (oracle.py:616-629)
      while (kk < (int)ins.size() - 1 && tmp.h.idx < rope.length) {
        uint8_t co = rope.char_at(tmp.h);
        uint8_t cin = (uint8_t)ins[kk + 1];
        tfh = nth::next_fwd(tfh, co, cin);
        trh = nth::next_rev(trh, co, cin);
        inc(tmp.h, tmp.h_seq);
        if (kk % p.jump == 0) {
          uint64_t c2 = nth::canonical(tfh, trh);
          bf.prefetch(c2);
          icanon[ni++] = c2;
        }
        ++kk;
      }
      // phase 2: continue through the draft (oracle.py:630-641)
      while (kk < p.k - 1 && tmp.h.idx < rope.length) {
        uint8_t co, ci;
        if (roll(tmp, co, ci)) {
          tfh = nth::next_fwd(tfh, co, ci);
          trh = nth::next_rev(trh, co, ci);
          if (kk % p.jump == 0) {
            uint64_t c2 = nth::canonical(tfh, trh);
            bf.prefetch(c2);
            icanon[ni++] = c2;
          }
        }
        ++kk;
      }
      for (int i2 = 0; i2 < ni; ++i2)
        if (bf.contains(icanon[i2]) && solid_canon(icanon[i2])) ++check_present;
      std::string ins_str = ins.substr(0, ins.size() - 1);
      if ((double)check_present >= p.present_needed) {
        if (p.mode == 0) {
          best.type = 2; best.indel = ins_str; best.support = check_present;
          return true;
        }
        if (check_present >= t_best_sup) {
          if (t_best_sup) { t_alt_indel = t_best_indel; t_alt_sup = t_best_sup; }
          t_best_type = 2; t_best_indel = ins_str; t_best_sup = check_present;
        }
      }
      if (del_state <= p.max_deletions) {
        std::string deleted;
        int sup = try_deletion(draft_char, del_state, st, fh, rh, deleted);
        if (sup > 0) {
          if (p.mode == 0) {
            best.type = 3; best.indel = deleted; best.support = sup;
            return true;
          }
          if (sup >= t_best_sup) {
            if (t_best_sup) { t_alt_indel = t_best_indel; t_alt_sup = t_best_sup; }
            t_best_type = 3; t_best_indel = deleted; t_best_sup = sup;
          }
        }
        ++del_state;
      }
    }
    if (t_best_sup > 0) {
      // mode 2 only overrides a substitution when strictly better; mode 1
      // overwrites unconditionally (oracle.py:662-671)
      if ((p.mode == 2 && t_best_sup > best.support) || p.mode == 1) {
        best.type = t_best_type;
        best.indel = t_best_indel;
        best.support = t_best_sup;
        best.alt_indel = t_alt_indel;
        best.altsupp1 = t_alt_sup;
      }
      return true;
    }
    return false;
  }

  // _make_edit (oracle.py:682-787).  Returns edited?; patches fh/rh.
  bool make_edit(uint8_t draft_char, Best& best, State& st,
                 uint64_t& fh, uint64_t& rh) {
    if (best.type == 1) {  // substitution
      if (rope.is_span(st.t)) {
        subs.push_back(make_sub_rec(draft_char, best, st.t_seq));
        int64_t o = rope.orig_at(st.t);
        rope.contig[o] = best.sub_base;
        if (o > max_edit_orig) max_edit_orig = o;
      } else {
        rope.nodes[st.t.node].ch = best.sub_base;
      }
      fh = nth::chlast_fwd(fh, draft_char, best.sub_base);
      rh = nth::chlast_rev(rh, draft_char, best.sub_base);
      dirty_hint = st.t_seq + 1;
      return true;
    }
    if (best.type == 2) {  // insertion
      std::string prev = prev_insertion(st);
      const std::string& indel = best.indel;
      if ((int)(prev.size() + indel.size()) >= p.k) {
        bool rollback = is_repeat_insertion(prev) ||
                        (int)(prev.size() + indel.size()) >= p.insertion_cap;
        if (!rollback) {
          std::string grown = prev;
          for (size_t w = 0; w < indel.size(); ++w) {
            grown.insert(grown.begin(), (char)rc_char((uint8_t)indel[w]));
            if (is_repeat_insertion(grown)) { rollback = true; break; }
          }
        }
        if (rollback) {
          int64_t run_start = st.t.idx - (int64_t)prev.size();
          rope.erase_cells(run_start, st.t.idx);
          st.t = (run_start < rope.length) ? rope.locate(run_start)
                                           : Cursor{run_start, 0, 0};
          st.t_seq = rope.seq_of(run_start);
          std::vector<uint8_t> kmer(p.k);
          if (find_accepted_kmer(st, kmer.data())) {
            fh = nth::fwd_hash(kmer.data(), p.k);
            rh = nth::rev_hash(kmer.data(), p.k);
          }
          dirty_hint = st.t_seq + 2 * p.k;
          return true;
        }
      }
      rope.insert_cells(st.t.idx, indel, best.support);
      // cursor now sits on the first inserted char
      st.t = rope.locate(st.t.idx);
      fh = nth::chlast_fwd(fh, draft_char, (uint8_t)indel[0]);
      rh = nth::chlast_rev(rh, draft_char, (uint8_t)indel[0]);
      dirty_hint = st.t_seq;
      return true;
    }
    if (best.type == 3) {  // deletion
      int64_t n_del = (int64_t)best.indel.size();
      if (p.rope_compat) n_del = rope.compat_deletion_len(st.t.idx, n_del);
      rope.erase_cells(st.t.idx, st.t.idx + n_del);
      st.t_seq = rope.seq_of(st.t.idx);
      uint8_t new_last = 0;
      if (st.t.idx < rope.length) {
        rope.set_span_sup(st.t.idx, best.support);
        st.t = rope.locate(st.t.idx);
        new_last = rope.char_at(st.t);
      } else {
        st.t = Cursor{st.t.idx, 0, 0};
      }
      fh = nth::chlast_fwd(fh, draft_char, new_last);
      rh = nth::chlast_rev(rh, draft_char, new_last);
      dirty_hint = st.t_seq;
      return true;
    }
    // type 0: no fix (mask / SNV record)
    bool edited = false;
    if (p.mask) {
      uint8_t low = (draft_char >= 'A' && draft_char <= 'Z') ? draft_char + 32
                                                             : draft_char;
      if (rope.is_span(st.t)) {
        int64_t o = rope.orig_at(st.t);
        rope.contig[o] = low;
        if (o > max_edit_orig) max_edit_orig = o;
      } else {
        rope.nodes[st.t.node].ch = low;
      }
      fh = nth::chlast_fwd(fh, draft_char, low);
      rh = nth::chlast_rev(rh, draft_char, low);
      dirty_hint = st.t_seq + 1;
      edited = true;
    }
    if (p.snv && best.altsupp1) {
      SubRecC r{};
      r.pos = st.t_seq;
      r.draft_char = draft_char;
      r.sub_base = draft_char;
      r.num_support = best.support;
      r.altbase1 = best.altbase1; r.altsupp1 = best.altsupp1;
      r.altbase2 = best.altbase2; r.altsupp2 = best.altsupp2;
      r.altbase3 = best.altbase3; r.altsupp3 = best.altsupp3;
      subs.push_back(r);
    }
    return edited;
  }

  // _fix_site (oracle.py:881-983)
  bool fix_site(uint8_t draft_char, State& st, uint64_t& fh, uint64_t& rh) {
    int k = p.k;
    // Device-precomputed SNV fast path (VERDICT r4 #3): consume the
    // per-site row instead of probing when (a) SNV with no indels/mask
    // and a plain filter with no reject BF (the row's implicit solid()
    // equals contains), (b) the window is provably the pristine draft —
    // head and tail inside the SAME span node at coordinate span k-1,
    // wholly past the last in-place write; in SNV mode the rope never
    // changes structurally (i = d = 0, ntedit.cpp:2411-2413), so this is
    // exactly "no earlier substitution within reach" and the forward
    // 2k lookahead is untouched because writes only ever land at or
    // before the current tail — and (c) the row is valid (full 2k scan
    // inside the contig, no exception bytes; flag.snv_site_data).  The
    // arbitration below (SNV baseline, pre-check gatekeeping,
    // shuffle_best, make_edit) is this engine's own code — only probe
    // RESULTS are precomputed, and device probes are bit-identical to
    // host probes, so output matches the live path bit for bit
    // (tests/test_native_repair.py, tests/test_snv_device.py).
    if (site_rows && cand_gates && !counting() && !has_rep &&
        p.mode != 2 &&
        (!p.snv || (p.max_insertions == 0 && p.max_deletions == 0 &&
                    !p.mask)) &&
        st.h.idx < rope.length && st.t.idx < rope.length &&
        st.h.node == st.t.node && rope.is_span(st.h)) {
      int64_t oh = rope.orig_at(st.h), ot = rope.orig_at(st.t);
      // pristine condition: window coordinates span exactly k-1 inside
      // one span node, wholly past the last in-place write, AND (polish
      // mode, where earlier indels split nodes) the node covers the full
      // 2k lookahead — the scan is monotone, so content right of the
      // tail inside the same span node is untouched original draft
      bool reach_ok = p.snv || rope.nodes[st.h.node].e >= oh + 2 * k - 1;
      if (ot - oh == (int64_t)k - 1 && oh > max_edit_orig && reach_ok) {
        const int64_t* lo =
            std::lower_bound(cand_gates, cand_gates + n_cand, oh);
        if (lo != cand_gates + n_cand && *lo == oh) {
          const uint8_t* row = site_rows + 6 * (lo - cand_gates);
          if (row[0] & 1) {
            // row[1] = check_there (SNV: baseline support) or
            //          check_missing (polish: attempt gate)
            if (!p.snv && (double)row[1] < p.missing_needed)
              return false;  // no attempt (oracle.py attempt gate)
            Best best;
            if (p.snv && (double)row[1] >= p.present_needed) {
              best.sub_base = draft_char;
              best.support = row[1];
            }
            bool consumable = true;
            const std::string& alts = bases_tab[draft_char];
            for (char alt_ch : alts) {
              uint8_t sub_base = (uint8_t)alt_ch;
              int ci = sub_base == 'A' ? 0 : sub_base == 'C' ? 1
                       : sub_base == 'G' ? 2 : sub_base == 'T' ? 3 : -1;
              if (ci < 0) { consumable = false; break; }  // defensive
              if (((row[0] >> (1 + ci)) & 1) == 0) continue;  // pre-check
              int check_present = row[2 + ci];
              if ((double)check_present >= p.present_needed) {
                shuffle_best(best, sub_base, check_present);
                continue;  // modes 0/1 skip indels after a qualifier
              }
              // pre-check passed, verify failed: tryIndels triggers
              // (ntedit.cpp:2065-2090).  SNV: i = d = 0 makes it an
              // exact no-op.  Polish: bail to the live path (no state
              // was committed — `best` is local)
              if (!p.snv && best.type != 1) { consumable = false; break; }
            }
            if (consumable)
              return make_edit(draft_char, best, st, fh, rh);
          }
        }
      }
    }
    State tmp = st;
    uint64_t tfh = fh, trh = rh;
    int check_missing = 0, check_there = 0;
    std::vector<uint8_t> there_med;
    bool do_not_fix = false;
    // two-phase stride scan: roll all k windows first (hash-only, with
    // probe-line prefetches), then probe.  Only kk % jump == 0 results
    // are consumed (oracle.py:893-906), so non-stride probes are skipped
    // entirely; prefetching overlaps the remaining DRAM misses.  Bitwise
    // identical to the interleaved scan: probes are pure reads.
    uint64_t stride_canon[256];
    int n_stride = 0;
    for (int kk = 0; kk < k; ++kk) {
      if (tmp.h.idx >= rope.length) break;
      uint8_t co, ci;
      if (!roll(tmp, co, ci)) { do_not_fix = true; break; }
      tfh = nth::next_fwd(tfh, co, ci);
      trh = nth::next_rev(trh, co, ci);
      if (!ACCEPTED[upper(ci)]) { do_not_fix = true; break; }
      if (kk % p.jump == 0) {
        uint64_t canon = nth::canonical(tfh, trh);
        bf.prefetch(canon);
        stride_canon[n_stride++] = canon;
      }
    }
    for (int i = 0; i < n_stride; ++i) {
      uint64_t canon = stride_canon[i];
      bool cont = bf.contains(canon);
      if (!cont) {
        ++check_missing;
      } else if (IS_ATGC[draft_char] &&
                 (!counting() || bf.count_of(canon) >= p.min_threshold)) {
        ++check_there;
        if (counting()) there_med.push_back(bf.count_of(canon));
      }
    }
    int check_there_median = counting() ? median_u8(there_med) : 0;
    bool attempt =
        p.snv ||
        (!do_not_fix &&
         ((double)check_missing >= p.missing_needed ||
          (counting() && check_there_median < p.min_threshold)));
    if (!attempt) return false;

    Best best;
    int del_state = 1;  // num_deletions, shared across alternates
    if (p.snv && (double)check_there >= p.present_needed) {
      best.sub_base = draft_char;
      best.support = counting() ? check_there_median : check_there;
    }

    // Device pre-verification: when the current window is PROVABLY the
    // pristine draft window (head and tail inside the SAME span node — a
    // span node is one contiguous run of original bytes, so same-node
    // rules out any inserted/deleted cell in between; coordinate-only
    // checks are defeated by balanced indel pairs that keep the original
    // span at k-1 while the content differs — and wholly past the last
    // in-place write), the device-precomputed contains(changelast) mask
    // for this gate head is exact and replaces the per-alternate
    // first-level probe.  Any doubt -> cmask stays -1 and the engine
    // probes live (bit-identical either way).
    int cmask = -1;
    // !counting(): masks encode plain contains; a CBF gate also needs
    // count >= min_threshold semantics (engine-side defense in depth —
    // Python callers already refuse to pass gate_cand for CBFs)
    if (cand_masks && !p.snv && p.mode != 2 && !counting() &&
        st.h.idx < rope.length &&
        st.t.idx < rope.length && st.h.node == st.t.node &&
        rope.is_span(st.h)) {
      int64_t oh = rope.orig_at(st.h), ot = rope.orig_at(st.t);
      if (ot - oh == (int64_t)k - 1 && oh > max_edit_orig) {
        const int64_t* lo = std::lower_bound(cand_gates, cand_gates + n_cand, oh);
        if (lo != cand_gates + n_cand && *lo == oh) {
          uint8_t m = cand_masks[lo - cand_gates];
          if (m != 0xFF) cmask = m;
        }
      }
    }

    const std::string& alts = bases_tab[draft_char];
    for (char alt_ch : alts) {
      uint8_t sub_base = (uint8_t)alt_ch;
      uint64_t sfh = nth::chlast_fwd(fh, draft_char, sub_base);
      uint64_t srh = nth::chlast_rev(rh, draft_char, sub_base);
      bool cont;
      if (cmask >= 0) {
        int ci = sub_base == 'A' ? 0 : sub_base == 'C' ? 1
                 : sub_base == 'G' ? 2 : sub_base == 'T' ? 3 : -1;
        cont = ci >= 0 ? ((cmask >> ci) & 1) != 0 : contains(sfh, srh);
#ifdef NTR_CAND_CHECK
        if (ci >= 0 && cont != contains(sfh, srh)) {
          char win[300];
          Cursor cw = st.h;
          for (int i2 = 0; i2 < k; ++i2) { win[i2] = rope.char_at(cw); rope.advance(cw); }
          win[k] = 0;
          uint64_t cfh = nth::fwd_hash((const uint8_t*)win, k);
          uint64_t crh = nth::rev_hash((const uint8_t*)win, k);
          fprintf(stderr,
                  "CAND MISMATCH head_orig=%lld tail_orig=%lld alt=%c "
                  "mask=%d live=%d max_edit=%lld h_seq=%lld win=%s "
                  "fh_ok=%d rh_ok=%d\n",
                  (long long)rope.orig_at(st.h), (long long)rope.orig_at(st.t),
                  (char)sub_base, (int)cont, (int)contains(sfh, srh),
                  (long long)max_edit_orig, (long long)st.h_seq, win,
                  (int)(cfh == fh), (int)(crh == rh));
        }
#endif
      } else {
        cont = contains(sfh, srh);
      }
      if ((cont && solid(sfh, srh)) || p.mode == 2) {
        // temporarily write the substitution (ntedit.cpp:1936-1940)
        uint8_t saved;
        bool on_span = rope.is_span(st.t);
        int64_t orig = on_span ? rope.orig_at(st.t) : -1;
        if (on_span) { saved = rope.contig[orig]; rope.contig[orig] = sub_base; }
        else { saved = rope.nodes[st.t.node].ch; rope.nodes[st.t.node].ch = sub_base; }
        State vtmp = st;
        uint64_t vfh = sfh, vrh = srh;
        int check_present = 0;
        // two-phase stride verify (hash+prefetch, then probe) — same
        // probe set and results as the interleaved loop
        uint64_t vcanon[256];
        int nv = 0;
        for (int kk = 0; kk < k; ++kk) {
          if (vtmp.h.idx >= rope.length || vtmp.t.idx >= rope.length) break;
          uint8_t co, ci;
          if (!roll(vtmp, co, ci)) break;
          vfh = nth::next_fwd(vfh, co, ci);
          vrh = nth::next_rev(vrh, co, ci);
          if (kk % p.jump == 0) {
            uint64_t c2 = nth::canonical(vfh, vrh);
            bf.prefetch(c2);
            vcanon[nv++] = c2;
          }
        }
        for (int i2 = 0; i2 < nv; ++i2) {
          uint64_t c2 = vcanon[i2];
          if (bf.contains(c2) && solid_canon(c2)) ++check_present;
        }
        // revert
        if (on_span) rope.contig[orig] = saved;
        else rope.nodes[st.t.node].ch = saved;

        if ((double)check_present >= p.present_needed) {
          shuffle_best(best, sub_base, check_present);
          if (p.mode == 0 || p.mode == 1) continue;
        }
        if (p.mode == 2 || best.type != 1) {
          if (try_indels(draft_char, sub_base, del_state, st, fh, rh, best)) {
            if (p.mode == 0 || p.mode == 1) break;
          }
        }
      }
    }
    return make_edit(draft_char, best, st, fh, rh);
  }

  // polish_contig main scan (oracle.py:790-879)
  void polish(const int64_t* gates, int64_t n_gates) {
    int k = p.k;
    // find_first_accepted_kmer (oracle.py:363-381), including its quirk of
    // only considering windows with i + k < L
    int64_t h0 = L - 1;
    {
      int64_t i = 0;
      while (i + k < L) {
        if (ACCEPTED[upper(rope.contig[i])]) {
          bool good = true;
          for (int64_t j = i + 1; j < i + k; ++j) {
            if (!ACCEPTED[upper(rope.contig[j])]) { good = false; i = j + 1; break; }
          }
          if (good) { h0 = i; break; }
        } else {
          ++i;
        }
      }
    }
    State st;
    st.h = rope.locate(h0);
    st.h_seq = h0;
    if (h0 + k - 1 < rope.length) st.t = rope.locate(h0 + k - 1);
    else st.t = Cursor{h0 + k - 1, 0, 0};
    st.t_seq = h0 + k - 1;
    uint64_t fh = 0, rh = 0;
    if (h0 + k - 1 < L) {
      fh = nth::fwd_hash(rope.contig + h0, k);
      rh = nth::rev_hash(rope.contig + h0, k);
    }

    int64_t hint_i = 0;
    int64_t dirty_until = 0;
    dirty_hint = 0;
    bool continue_edit = true;
    // Speculative look-ahead cursor: rolls PF_DIST heads ahead of the
    // main scan issuing prefetches for the probe lines the main loop is
    // about to need (each is a guaranteed DRAM miss on a 100s-of-MiB
    // filter).  Prefetches never change results; the cursor resyncs
    // whenever the scan jumps (hint fast-forward) or a site is gated
    // (fix_site may edit the rope, staling look-ahead bytes).
    const int PF_DIST = 24;
    State sp = st;
    uint64_t spfh = fh, sprh = rh;
    int ahead = 0;
    bool sp_live = true;
    while (continue_edit) {
      if (st.h_seq + k - 1 >= L) break;
      if (gates && st.h_seq >= dirty_until && st.h.idx < rope.length &&
          rope.is_span(st.h) && rope.orig_at(st.h) == st.h_seq) {
        while (hint_i < n_gates && gates[hint_i] < st.h_seq) ++hint_i;
        if (hint_i >= n_gates) break;  // rest of the contig is clean
        int64_t g = gates[hint_i];
        if (g > st.h_seq) {
          int64_t delta = g - st.h_seq;
          st.h = rope.locate(st.h.idx + delta);
          st.t = rope.locate(st.t.idx + delta);
          st.h_seq = g;
          st.t_seq = g + k - 1;
          // recompute the window hash from live cells
          uint8_t window[256];  // k <= 255 (btllib k is uint8-bounded too)
          Cursor cw = st.h;
          for (int i = 0; i < k; ++i) { window[i] = rope.char_at(cw); rope.advance(cw); }
          fh = nth::fwd_hash(window, k);
          rh = nth::rev_hash(window, k);
          sp = st; spfh = fh; sprh = rh; ahead = 0; sp_live = true;
          // prefetch the upcoming hint heads too: in clean regions their
          // windows are pure draft bytes, so their hashes are exact
          for (int64_t d = 1; d <= 4 && hint_i + d < n_gates; ++d) {
            int64_t g2 = gates[hint_i + d];
            if (g2 + k <= L)
              bf.prefetch(nth::canonical(nth::fwd_hash(rope.contig + g2, k),
                                         nth::rev_hash(rope.contig + g2, k)));
          }
        }
      }
      if (ahead < 0) {  // main scan overtook the cursor: jump it forward
        sp = st; spfh = fh; sprh = rh; ahead = 0; sp_live = true;
      }
      while (sp_live && ahead < PF_DIST) {
        uint8_t co, ci;
        if (!roll(sp, co, ci)) { sp_live = false; break; }
        spfh = nth::next_fwd(spfh, co, ci);
        sprh = nth::next_rev(sprh, co, ci);
        bf.prefetch(nth::canonical(spfh, sprh));
        ++ahead;
      }
      // Hint trust: at a hinted head whose window is provably the
      // pristine draft (same-span k-1 coordinate run past the last
      // in-place write) and whose row carries the "device-exact gate"
      // bit (flags bit 5 — set for device-derived gates, NOT for the
      // exception-patched superset heads), the device probe already
      // proved the gate fires; re-probing is a guaranteed DRAM miss
      // for the same bit.  Device probes are bit-identical to host
      // probes, so the skip cannot change output.
      bool gate;
      bool trusted = false;
      if (site_rows && !p.snv && !counting() && hint_i < n_gates &&
          gates[hint_i] == st.h_seq && (site_rows[6 * hint_i] & 32) &&
          st.h.idx < rope.length && st.t.idx < rope.length &&
          st.h.node == st.t.node && rope.is_span(st.h)) {
        int64_t oh2 = rope.orig_at(st.h);
        if (rope.orig_at(st.t) - oh2 == (int64_t)k - 1 &&
            oh2 > max_edit_orig) {
          gate = true;
          trusted = true;
        }
      }
      if (!trusted) {
        uint64_t canon = nth::canonical(fh, rh);
        gate = p.snv || !bf.contains(canon) ||
               (counting() && bf.count_of(canon) < p.min_threshold);
      }
      if (gate) {
        uint8_t draft_char = upper(rope.char_at(st.t));
        if (fix_site(draft_char, st, fh, rh)) {
          if (dirty_hint > dirty_until) dirty_until = dirty_hint;
        }
        sp = st; spfh = fh; sprh = rh; ahead = 0; sp_live = true;
      }
      // bottom roll with non-ACGT skip (oracle.py:866-878)
      int64_t target = -1;
      while (true) {
        uint8_t co, ci;
        if (!roll(st, co, ci)) { continue_edit = false; break; }
        if (!ACCEPTED[upper(ci)]) target = st.t_seq + k;
        fh = nth::next_fwd(fh, co, ci);
        rh = nth::next_rev(rh, co, ci);
        --ahead;
        if (!(target >= 0 && st.t_seq != target)) break;
      }
    }
  }
};

}  // namespace eng

// ---------------------------------------------------------------------------
// C ABI
// ---------------------------------------------------------------------------

extern "C" {

// Returns 0 on success; -1 bad args; -2 subs capacity exceeded; -3 nodes
// capacity exceeded.  contig is modified in place (substitutions + masks at
// original coordinates).  subs_out: 10 int64 per record (pos, draft, sub,
// support, ab1, as1, ab2, as2, ab3, as3).  nodes_out: 4 int64 per node —
// span: (0, s, e, span_sup); ins: (1, char, span_sup, ins_sup).
// gate_cand (may be null): uint8 per gate entry — bit c set iff the
// device evaluated bf.contains(changelast(draft window at gates[i] ->
// "ACGT"[c])) true on the pristine draft; 0xFF = no information.  A
// pure first-probe replacement: output is bit-identical with or
// without it (tests/test_native_repair.py::test_candidate_masks).
// site_rows (may be null): uint8[6] per gate entry — the device-
// precomputed SNV decision row (flag.snv_site_data): [flags,
// check_there, verA, verC, verG, verT]; flags bit0 = valid, bits 1-4 =
// alternate pre-check bits.  Consumed only at provably-pristine SNV
// windows; output is bit-identical with or without rows.
int64_t ntr_polish_contig_v2(
    uint8_t* contig, int64_t L,
    const int64_t* gates, int64_t n_gates,
    const NtrFilter* bf, const NtrFilter* bfrep,
    const NtrParams* params,
    int64_t* subs_out, int64_t subs_cap, int64_t* n_subs,
    int64_t* nodes_out, int64_t nodes_cap, int64_t* n_nodes,
    const uint8_t* gate_cand, const uint8_t* site_rows) {
  if (!contig || !bf || !params || !n_subs || !n_nodes) return -1;
  // the engine trusts these bounds internally (fixed window[256] buffers,
  // NUM_TRIES[max_insertions] indexing) — reject out-of-range params here
  // rather than overflow for non-Python callers
  if (params->k <= 0 || params->k > 255) return -1;
  if (params->max_insertions < 0 || params->max_insertions > 5) return -1;
  if (params->max_deletions < 0 || params->max_deletions > 10) return -1;
  // blocked filters (kind 1) also loop hash_num probe bits per word
  if (bf->hash_num <= 0) return -1;
  if (bfrep && bfrep->data && bfrep->hash_num <= 0) return -1;
  eng::build_tables();
  nth::init_tables(params->k);

  eng::Engine e;
  e.p = *params;
  e.bf.init(*bf, params->k);
  if (bfrep && bfrep->data) {
    e.bfrep.init(*bfrep, params->k);
    e.has_rep = true;
  }
  e.bases_tab = params->snv ? eng::BASES_SNV : eng::BASES_POLISH;
  e.L = L;
  e.rope.init(contig, L);
  if ((gate_cand || site_rows) && gates) {
    e.cand_gates = gates;
    e.cand_masks = gate_cand;
    e.site_rows = site_rows;
    e.n_cand = n_gates;
  }
  e.polish(gates, gates ? n_gates : 0);

  if ((int64_t)e.subs.size() > subs_cap) return -2;
  if ((int64_t)e.rope.nodes.size() > nodes_cap) return -3;
  int64_t* s = subs_out;
  for (const auto& r : e.subs) {
    s[0] = r.pos; s[1] = r.draft_char; s[2] = r.sub_base; s[3] = r.num_support;
    s[4] = r.altbase1; s[5] = r.altsupp1; s[6] = r.altbase2; s[7] = r.altsupp2;
    s[8] = r.altbase3; s[9] = r.altsupp3;
    s += 10;
  }
  *n_subs = (int64_t)e.subs.size();
  int64_t* nd = nodes_out;
  for (const auto& n : e.rope.nodes) {
    if (n.kind == 0) { nd[0] = 0; nd[1] = n.s; nd[2] = n.e; nd[3] = n.span_sup; }
    else { nd[0] = 1; nd[1] = n.ch; nd[2] = n.span_sup; nd[3] = n.ins_sup; }
    nd += 4;
  }
  *n_nodes = (int64_t)e.rope.nodes.size();
  return 0;
}

int64_t ntr_polish_contig_cand(
    uint8_t* contig, int64_t L,
    const int64_t* gates, int64_t n_gates,
    const NtrFilter* bf, const NtrFilter* bfrep,
    const NtrParams* params,
    int64_t* subs_out, int64_t subs_cap, int64_t* n_subs,
    int64_t* nodes_out, int64_t nodes_cap, int64_t* n_nodes,
    const uint8_t* gate_cand) {
  return ntr_polish_contig_v2(contig, L, gates, n_gates, bf, bfrep, params,
                              subs_out, subs_cap, n_subs,
                              nodes_out, nodes_cap, n_nodes, gate_cand,
                              nullptr);
}

int64_t ntr_polish_contig(
    uint8_t* contig, int64_t L,
    const int64_t* gates, int64_t n_gates,
    const NtrFilter* bf, const NtrFilter* bfrep,
    const NtrParams* params,
    int64_t* subs_out, int64_t subs_cap, int64_t* n_subs,
    int64_t* nodes_out, int64_t nodes_cap, int64_t* n_nodes) {
  return ntr_polish_contig_v2(contig, L, gates, n_gates, bf, bfrep, params,
                              subs_out, subs_cap, n_subs,
                              nodes_out, nodes_cap, n_nodes, nullptr,
                              nullptr);
}

const char* ntr_version(void) { return "ntedit-repair/2"; }

}  // extern "C"
