// From-spec scalar polish engine: the native baseline bench.py compares
// against (native/baseline.json).
//
// This re-implements the reference algorithm contract (SURVEY.md §2.4;
// /root/reference/ntedit.cpp kmerizeAndCorrect 1747-2151) the way the
// reference's C++ engine works — sequential rolling scan, one BF probe per
// clean base, trial-and-verify repair at flagged sites — WITHOUT copying
// reference code.  It exists so vs_baseline is a number measured on this
// machine rather than a literature estimate (btllib is not installable
// here, so the reference binary itself cannot run).
//
// Scope: polish mode 0 (the default and the benchmarked path), plain BF,
// substitutions + insertions (<=5) + deletions (<=10), thresholds
// x=5 / y=9 / j=3.  The insertion low-complexity guard is EXACT (the
// reference's accumulated-run KMP-repeat / cap rollback + re-seed,
// ntedit.cpp:1312-1380): the flat string tracks the contiguous
// inserted-char run with sub/deletion bookkeeping, mirroring the rope
// engines' semantics (fuzzed against the oracle in
// tests/test_bench_helpers.py).
//
// Build: make -C native   Run: ntedit_baseline <draft.fa> <filter.bf>

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <chrono>
#include <fstream>
#include <iostream>
#include <sstream>
#include <string>
#include <vector>

// ---------------------------------------------------------------------------
// ntHash2 (from the documented math: published base seeds; 33/31-bit split
// rotation; NTM64 multi-hash mixing)
// ---------------------------------------------------------------------------

static const uint64_t SEED_A = 0x3C8BFBB395C60474ULL;
static const uint64_t SEED_C = 0x3193C18562A02B4CULL;
static const uint64_t SEED_G = 0x20323ED082572324ULL;
static const uint64_t SEED_T = 0x295549F54BE24456ULL;
static const uint64_t MULTISEED = 0x90B45D39FB6DA1FAULL;
static const int MULTISHIFT = 27;
static const int CP_OFF = 0x07;
static const uint64_t LOW33 = 0x1FFFFFFFFULL;

static uint64_t SEED_TAB[256];

static void build_seed_tab() {
  memset(SEED_TAB, 0, sizeof(SEED_TAB));
  const char* chars[4] = {"Aa", "Cc", "Gg", "Tt"};
  const uint64_t seeds[4] = {SEED_A, SEED_C, SEED_G, SEED_T};
  for (int i = 0; i < 4; ++i)
    for (const char* p = chars[i]; *p; ++p) SEED_TAB[(unsigned char)*p] = seeds[i];
  SEED_TAB['A' & CP_OFF] = SEED_T;
  SEED_TAB['C' & CP_OFF] = SEED_G;
  SEED_TAB['T' & CP_OFF] = SEED_A;
  SEED_TAB['G' & CP_OFF] = SEED_C;
}

static inline uint64_t srol1(uint64_t x) {
  uint64_t m = ((x & 0x8000000000000000ULL) >> 30) | ((x & 0x100000000ULL) >> 32);
  return ((x << 1) & 0xFFFFFFFDFFFFFFFFULL) | m;
}

static inline uint64_t srol(uint64_t x, int d) {
  int dl = d % 33, dh = d % 31;
  uint64_t lo = x & LOW33;
  uint64_t hi = x >> 33;
  lo = ((lo << dl) | (lo >> (33 - dl))) & LOW33;
  hi = ((hi << dh) | (hi >> (31 - dh))) & 0x7FFFFFFFULL;
  return (hi << 33) | lo;
}

static inline uint64_t sror1(uint64_t x) {
  uint64_t lo = x & LOW33;
  uint64_t hi = x >> 33;
  lo = ((lo >> 1) | (lo << 32)) & LOW33;
  hi = ((hi >> 1) | (hi << 30)) & 0x7FFFFFFFULL;
  return (hi << 33) | lo;
}

static inline uint64_t fwd_hash(const char* s, int k) {
  uint64_t h = 0;
  for (int i = 0; i < k; ++i) h = srol1(h) ^ SEED_TAB[(unsigned char)s[i]];
  return h;
}

static inline uint64_t rev_hash(const char* s, int k) {
  uint64_t h = 0;
  for (int i = k - 1; i >= 0; --i)
    h = srol1(h) ^ SEED_TAB[(unsigned char)s[i] & CP_OFF];
  return h;
}

static inline uint64_t next_fwd(uint64_t fh, int k, unsigned char out, unsigned char in) {
  return srol1(fh) ^ srol(SEED_TAB[out], k) ^ SEED_TAB[in];
}
static inline uint64_t next_rev(uint64_t rh, int k, unsigned char out, unsigned char in) {
  return sror1(rh ^ SEED_TAB[out & CP_OFF] ^ srol(SEED_TAB[in & CP_OFF], k));
}
static inline uint64_t chlast_fwd(uint64_t fh, unsigned char out, unsigned char in) {
  return fh ^ SEED_TAB[out] ^ SEED_TAB[in];
}
static inline uint64_t chlast_rev(uint64_t rh, int k, unsigned char out, unsigned char in) {
  return rh ^ srol(SEED_TAB[out & CP_OFF], k - 1) ^ srol(SEED_TAB[in & CP_OFF], k - 1);
}

// ---------------------------------------------------------------------------
// Bloom filter (ntedit_tpu file format; same header/payload as btllib-style)
// ---------------------------------------------------------------------------

struct Bloom {
  std::vector<uint8_t> data;
  uint64_t bits = 0;
  int hash_num = 3;
  int k = 25;
  bool pow2 = false;
  uint64_t mask = 0;

  bool load(const std::string& path) {
    std::ifstream f(path, std::ios::binary);
    if (!f) return false;
    std::string line;
    std::getline(f, line);  // signature
    uint64_t nbytes = 0;
    while (std::getline(f, line)) {
      if (line == "[HEADER_END]") break;
      std::istringstream ss(line);
      std::string key, eq, val;
      ss >> key >> eq >> val;
      if (key == "bytes") nbytes = std::stoull(val);
      else if (key == "hash_num") hash_num = std::stoi(val);
      else if (key == "k") k = std::stoi(val);
    }
    data.resize(nbytes);
    f.read(reinterpret_cast<char*>(data.data()), nbytes);
    bits = nbytes * 8;
    pow2 = (bits & (bits - 1)) == 0;
    mask = bits - 1;
    return (uint64_t)f.gcount() == nbytes;
  }

  inline bool contains(uint64_t canon) const {
    uint64_t h = canon;
    for (int i = 0; i < hash_num; ++i) {
      if (i) {
        uint64_t mult = (uint64_t)i ^ ((uint64_t)k * MULTISEED);
        h = canon * mult;
        h ^= h >> MULTISHIFT;
      }
      uint64_t idx = pow2 ? (h & mask) : (h % bits);
      if (!((data[idx >> 3] >> (idx & 7)) & 1)) return false;
    }
    return true;
  }
};

// ---------------------------------------------------------------------------
// Engine (mode 0)
// ---------------------------------------------------------------------------

static inline uint64_t canon(uint64_t fh, uint64_t rh) { return fh < rh ? fh : rh; }

static bool ACC[256];
static void build_acc() {
  for (const char* p = "ATGCRYSWKMBDHV"; *p; ++p) {
    ACC[(unsigned char)*p] = true;
    ACC[(unsigned char)(*p + 32)] = true;
  }
}
static inline bool is_atgc(unsigned char c) {
  c &= ~0x20;  // fold case
  return c == 'A' || c == 'T' || c == 'G' || c == 'C';
}

static const char* POLISH_BASES(unsigned char c) {
  switch (c & ~0x20) {
    case 'A': return "TCG"; case 'T': return "ACG";
    case 'C': return "ATG"; case 'G': return "ATC";
    case 'R': return "TC"; case 'Y': return "AG"; case 'S': return "AT";
    case 'W': return "CG"; case 'K': return "AC"; case 'M': return "TG";
    case 'B': return "A"; case 'D': return "C"; case 'H': return "G";
    case 'V': return "T"; case 'N': return "ATCG";
    default: return "";
  }
}

// KMP failure-function periodicity test: s is a whole-number repeat of a
// shorter word (the reference's low-complexity criterion)
static bool is_repeat(const std::string& s) {
  int n = (int)s.size();
  if (n == 0) return false;
  std::vector<int> lps(n, 0);
  int ln = 0, i = 1;
  while (i < n) {
    if (s[i] == s[ln]) lps[i++] = ++ln;
    else if (ln != 0) ln = lps[ln - 1];
    else lps[i++] = 0;
  }
  ln = lps[n - 1];
  return ln > 0 && n % (n - ln) == 0;
}

static inline char comp_base(char c) {
  switch (c) { case 'A': return 'T'; case 'T': return 'A';
               case 'C': return 'G'; case 'G': return 'C'; default: return c; }
}

struct Engine {
  const Bloom& bf;
  int k, max_i = 5, max_d = 5, jump = 3;
  double x = 5.0, y = 9.0;
  int insertion_cap;  // k*1.5, the engine-forced value (ntedit.cpp:2450-2451)
  long n_sub = 0, n_ins = 0, n_del = 0, n_rollback = 0;
  std::vector<std::string> multi[4];  // insertion strings per first base
  int num_tries;

  Engine(const Bloom& b) : bf(b), k(b.k) {
    insertion_cap = (int)(k * 1.5);
    static const int NUM_TRIES[6] = {0, 1, 5, 21, 85, 341};
    num_tries = NUM_TRIES[max_i];
    const char* bases = "ACGT";
    for (int fi = 0; fi < 4; ++fi)
      for (int len = 1; len <= 5; ++len) {
        int reps = 1;
        for (int t = 1; t < len; ++t) reps *= 4;
        for (int r = 0; r < reps; ++r) {
          std::string s(1, bases[fi]);
          int v = r;
          for (int t = len - 2; t >= 0; --t) {
            s += bases[(v >> (2 * t)) & 3];
          }
          multi[fi].push_back(s);
        }
      }
  }

  static int base_index(char c) {
    switch (c) { case 'A': return 0; case 'C': return 1; case 'G': return 2; default: return 3; }
  }

  // stride-j presence count rolling from (fh, rh) over seq[pos..], k-1 rolls
  int verify_scan(const std::string& seq, size_t pos, uint64_t fh, uint64_t rh) {
    int present = 0;
    size_t t = pos + k - 1;
    for (int kk = 0; kk < k; ++kk) {
      if (t + 1 >= seq.size()) break;
      unsigned char out = seq[pos], in = seq[t + 1];
      fh = next_fwd(fh, k, out, in);
      rh = next_rev(rh, k, out, in);
      ++pos; ++t;
      if (kk % jump == 0 && bf.contains(canon(fh, rh))) ++present;
    }
    return present;
  }

  void polish(std::string& seq) {
    size_t L = seq.size();
    if (L < (size_t)k) return;
    size_t pos = 0;
    // seed at first accepted k-mer
    while (pos + k <= L) {
      bool ok = true;
      for (int i = 0; i < k; ++i)
        if (!ACC[(unsigned char)seq[pos + i]]) { pos += i + 1; ok = false; break; }
      if (ok) break;
    }
    if (pos + k > L) return;
    uint64_t fh = fwd_hash(seq.data() + pos, k);
    uint64_t rh = rev_hash(seq.data() + pos, k);
    long bad_until = -1;  // suppress checks while a non-accepted base is inside

    // contiguous inserted-char run bookkeeping for the low-complexity
    // guard: `run` holds the inserted chars in string order, occupying
    // [run_end - run.size(), run_end) of the current string — the flat
    // mirror of the rope engines' ins-cell walk (repair.cpp
    // prev_insertion)
    std::string run;
    size_t run_end = (size_t)-1;

    const double missing_needed = k / x;
    const double present_needed = k / y;

    while (true) {
      size_t t = pos + k - 1;
      bool clean = (long)pos > bad_until;
      if (clean && !bf.contains(canon(fh, rh))) {
        // confirmation scan (stride-j subset missing)
        int check_missing = 0;
        bool do_not_fix = false;
        {
          uint64_t tfh = fh, trh = rh;
          size_t p2 = pos, t2 = t;
          for (int kk = 0; kk < k; ++kk) {
            if (t2 + 1 >= L) { do_not_fix = true; break; }
            unsigned char out = seq[p2], in = seq[t2 + 1];
            if (!ACC[in]) { do_not_fix = true; break; }
            tfh = next_fwd(tfh, k, out, in);
            trh = next_rev(trh, k, out, in);
            ++p2; ++t2;
            if (kk % jump == 0 && !bf.contains(canon(tfh, trh))) ++check_missing;
          }
        }
        if (!do_not_fix && check_missing >= missing_needed) {
          unsigned char draft = seq[t] & ~0x20;
          int best_type = 0, best_support = 0;
          unsigned char best_sub = 0;
          std::string best_indel;
          int num_deletions = 1;
          bool indel_done = false;
          for (const char* ap = POLISH_BASES(draft); *ap && !indel_done; ++ap) {
            unsigned char alt = *ap;
            uint64_t sfh = chlast_fwd(fh, draft, alt);
            uint64_t srh = chlast_rev(rh, k, draft, alt);
            if (bf.contains(canon(sfh, srh))) {
              char saved = seq[t];
              seq[t] = alt;
              int present = verify_scan(seq, pos, sfh, srh);
              seq[t] = saved;
              if (present >= present_needed) {
                // mode 0 keeps the best substitution across alternates and
                // skips indel trials for a qualifying alternate
                if (best_type != 1 || present > best_support) {
                  best_type = 1; best_sub = alt; best_support = present;
                }
                continue;
              }
              if (best_type != 1) {
                // indel trials, interleaved insertion/deletion, first win
                for (int i = 0; i < num_tries && !indel_done; ++i) {
                  const std::string& ins = multi[base_index(alt)][i];
                  // insertion trial: replace last with ins[0], roll through
                  // the remaining inserted bases then the draft, k-1 rolls
                  uint64_t ifh = chlast_fwd(fh, draft, ins[0]);
                  uint64_t irh = chlast_rev(rh, k, draft, ins[0]);
                  int present2 = 0;
                  {
                    std::string local;
                    local.reserve(2 * k + 8);
                    local.append(seq, pos, k - 1);       // window minus last
                    local += ins;                         // inserted bases
                    size_t tail_take = std::min<size_t>(k + 1, L - t);
                    local.append(seq, t, tail_take);      // draft from anchor on
                    uint64_t vfh = ifh, vrh = irh;
                    size_t vp = 0;
                    for (int kk = 0; kk < k - 1; ++kk) {
                      size_t tin = vp + k;
                      if (tin >= local.size()) break;
                      unsigned char out = local[vp], in = local[tin];
                      vfh = next_fwd(vfh, k, out, in);
                      vrh = next_rev(vrh, k, out, in);
                      ++vp;
                      if (kk % jump == 0 && bf.contains(canon(vfh, vrh))) ++present2;
                    }
                  }
                  if (present2 >= present_needed) {
                    best_type = 2; best_sub = alt; best_indel = ins;
                    best_support = present2;
                    indel_done = true;
                    break;
                  }
                  // interleaved deletion trial
                  if (num_deletions <= max_d) {
                    int d = num_deletions++;
                    if (t + d < L) {
                      unsigned char nl = seq[t + d];
                      uint64_t dfh = chlast_fwd(fh, draft, nl);
                      uint64_t drh = chlast_rev(rh, k, draft, nl);
                      int present3 = bf.contains(canon(dfh, drh)) ? 1 : 0;
                      // roll k-2 further windows over the deleted sequence
                      std::string local;
                      local.reserve(2 * k + 2);
                      local.append(seq, pos, k - 1);
                      size_t from = t + d;
                      size_t tail_take = std::min<size_t>(k + 1, L - from);
                      local.append(seq, from, tail_take);
                      uint64_t vfh = dfh, vrh = drh;
                      size_t vp = 0;
                      for (int kk = 1; kk < k - 1; ++kk) {
                        size_t tin = vp + k;
                        if (tin >= local.size()) break;
                        unsigned char out = local[vp], in = local[tin];
                        vfh = next_fwd(vfh, k, out, in);
                        vrh = next_rev(vrh, k, out, in);
                        ++vp;
                        if (kk % jump == 0 && bf.contains(canon(vfh, vrh))) ++present3;
                      }
                      if (present3 >= present_needed) {
                        best_type = 3; best_sub = alt;
                        best_indel = seq.substr(t, d);
                        best_support = present3;
                        indel_done = true;
                        break;
                      }
                    }
                  }
                }
              }
            }
          }
          // apply (mode 0: first qualifying indel, best substitution)
          if (best_type == 1) {
            seq[t] = best_sub;
            if (run_end != (size_t)-1 && t < run_end &&
                t >= run_end - run.size())
              run[t - (run_end - run.size())] = (char)best_sub;
            fh = chlast_fwd(fh, draft, best_sub);
            rh = chlast_rev(rh, k, draft, best_sub);
            ++n_sub;
          } else if (best_type == 2) {
            // low-complexity guard (ntedit.cpp:1312-1380; exact): the RC
            // of the accumulated inserted run just before t, grown by the
            // new insertion, triggers rollback when it reaches k and is a
            // whole-word repeat (KMP) or hits the k*1.5 cap; rollback
            // tombstones the WHOLE previous run (the new insertion is not
            // made) and re-seeds at the next clean k-mer
            std::string prev;
            size_t upto = 0;  // run chars strictly before the cursor
            if (run_end != (size_t)-1) {
              size_t rs = run_end - run.size();
              if (t >= rs && t <= run_end) {
                upto = (t < run_end ? t : run_end) - rs;
                for (size_t ri = upto; ri > 0; --ri)
                  prev += comp_base(run[ri - 1]);
              }
            }
            bool rolled_back = false;
            if (prev.size() + best_indel.size() >= (size_t)k) {
              bool rb = is_repeat(prev) ||
                        prev.size() + best_indel.size() >= (size_t)insertion_cap;
              if (!rb) {
                std::string grown = prev;
                for (char c : best_indel) {
                  grown.insert(grown.begin(), comp_base(c));
                  if (is_repeat(grown)) { rb = true; break; }
                }
              }
              if (rb) {
                size_t run_start = t - prev.size();
                seq.erase(run_start, prev.size());
                L = seq.size();
                // inserted cells at/after the cursor survive the rollback
                // (the rope only erases the run BEFORE the cursor)
                run.erase(0, upto);
                run_end = run.empty() ? (size_t)-1 : run_end - upto;
                ++n_rollback;
                rolled_back = true;
                // re-seed at the next accepted k-mer from run_start
                pos = run_start;
                bool seeded = false;
                while (pos + k <= L) {
                  bool okk = true;
                  for (int ii = 0; ii < k; ++ii)
                    if (!ACC[(unsigned char)seq[pos + ii]]) {
                      pos += ii + 1; okk = false; break;
                    }
                  if (okk) { seeded = true; break; }
                }
                if (!seeded) return;
                fh = fwd_hash(seq.data() + pos, k);
                rh = rev_hash(seq.data() + pos, k);
                t = pos + k - 1;
              }
            }
            if (!rolled_back) {
              seq.insert(t, best_indel);
              L = seq.size();
              if (run_end != (size_t)-1 && t >= run_end - run.size() &&
                  t <= run_end) {
                // splice into / append to the existing contiguous run
                run.insert(t - (run_end - run.size()), best_indel);
                run_end += best_indel.size();
              } else {
                run = best_indel;
                run_end = t + best_indel.size();
              }
              fh = chlast_fwd(fh, draft, best_indel[0]);
              rh = chlast_rev(rh, k, draft, best_indel[0]);
              ++n_ins;
            }
          } else if (best_type == 3) {
            size_t d = best_indel.size();
            if (run_end != (size_t)-1 && t < run_end) {
              // deletion overlapping the inserted run: drop the erased
              // part; the remainder stays contiguous after the erase
              size_t rs = run_end - run.size();
              size_t a = t - rs;
              size_t b = (t + d < run_end ? t + d : run_end) - rs;
              run.erase(a, b - a);
              run_end = rs + run.size();
              if (run.empty()) run_end = (size_t)-1;
            }
            seq.erase(t, d);
            L = seq.size();
            unsigned char nl = (t < L) ? (unsigned char)seq[t] : 0;
            fh = chlast_fwd(fh, draft, nl);
            rh = chlast_rev(rh, k, draft, nl);
            ++n_del;
          }
        }
      }
      // roll one base
      if (t + 1 >= L) break;
      unsigned char out = seq[pos], in = seq[t + 1];
      if (!ACC[in]) bad_until = (long)(t + 1);
      fh = next_fwd(fh, k, out, in);
      rh = next_rev(rh, k, out, in);
      ++pos;
    }
  }
};

// ---------------------------------------------------------------------------

int main(int argc, char** argv) {
  if (argc < 3) {
    std::cerr << "usage: ntedit_baseline <draft.fa> <filter.bf>\n";
    return 1;
  }
  build_seed_tab();
  build_acc();
  Bloom bf;
  if (!bf.load(argv[2])) {
    std::cerr << "cannot load " << argv[2] << "\n";
    return 1;
  }
  // read FASTA (plain text)
  std::ifstream f(argv[1]);
  std::string line, seq;
  std::vector<std::string> contigs;
  while (std::getline(f, line)) {
    if (!line.empty() && line[0] == '>') {
      if (!seq.empty()) contigs.push_back(std::move(seq));
      seq.clear();
    } else {
      seq += line;
    }
  }
  if (!seq.empty()) contigs.push_back(std::move(seq));

  size_t total = 0;
  for (auto& c : contigs) total += c.size();
  Engine eng(bf);
  auto t0 = std::chrono::steady_clock::now();
  for (auto& c : contigs) eng.polish(c);
  auto t1 = std::chrono::steady_clock::now();
  double dt = std::chrono::duration<double>(t1 - t0).count();
  if (argc > 3) {
    // dump the edited sequences for the three-way output-identity harness
    // (bench.py / native/run_baseline.py)
    std::ofstream out(argv[3], std::ios::binary);
    for (auto& c : contigs) out << c << '\n';
  }
  printf("{\"bases_per_sec\": %.1f, \"seconds\": %.3f, \"bases\": %zu, "
         "\"n_sub\": %ld, \"n_ins\": %ld, \"n_del\": %ld, "
         "\"n_rollback\": %ld}\n",
         total / dt, dt, total, eng.n_sub, eng.n_ins, eng.n_del,
         eng.n_rollback);
  return 0;
}
