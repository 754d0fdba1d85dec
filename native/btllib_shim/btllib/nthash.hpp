// btllib-compat shim: ntHash2 hashing internals.
//
// Provides exactly the call surface /root/reference/ntedit.cpp uses
// (ntedit.cpp:412-451): base_forward_hash / base_reverse_hash / canonical /
// extend_hashes / next_forward_hash / next_reverse_hash / SEED_TAB / CP_OFF /
// srol_table, so the UNMODIFIED reference translation unit compiles against
// this header and probes the same hash space as ntedit_tpu
// (ntedit_tpu/core/nthash_ref.py is the executable spec; the constants are
// the published ntHash2 per-base seeds and NTM64 mixing constants).
//
// Purpose: build the reference engine binary in this environment (btllib is
// not installable here) and byte-diff its outputs against the framework's —
// an INDEPENDENT execution of the reference's 2,600-line control flow over a
// shared hash/filter contract.
#ifndef BTLLIB_NTHASH_HPP
#define BTLLIB_NTHASH_HPP

#include <cstdint>

namespace btllib {
namespace hashing_internals {

static const uint64_t MULTISEED = 0x90B45D39FB6DA1FAULL;
static const unsigned MULTISHIFT = 27;
static const unsigned char CP_OFF = 0x07;
static const uint64_t LOW33 = 0x1FFFFFFFFULL;

// Per-character seed table: published ntHash2 seeds at 'A','C','G','T'
// (upper+lower case), complement seeds at the (c & CP_OFF) alias slots
// ('A'&7==1 -> SEED_T, 'C'&7==3 -> SEED_G, 'T'&7==4 -> SEED_A,
// 'G'&7==7 -> SEED_C), zero elsewhere (non-ACGT hash as 0-seeds, matching
// btllib; see nthash_ref.py SEED_TAB construction).
inline const uint64_t* seed_tab_init()
{
	static uint64_t tab[256];
	static bool done = false;
	if (!done) {
		const uint64_t sa = 0x3C8BFBB395C60474ULL, sc = 0x3193C18562A02B4CULL,
		               sg = 0x20323ED082572324ULL, st = 0x295549F54BE24456ULL;
		for (int i = 0; i < 256; ++i)
			tab[i] = 0;
		tab[(unsigned char)'A'] = tab[(unsigned char)'a'] = sa;
		tab[(unsigned char)'C'] = tab[(unsigned char)'c'] = sc;
		tab[(unsigned char)'G'] = tab[(unsigned char)'g'] = sg;
		tab[(unsigned char)'T'] = tab[(unsigned char)'t'] = st;
		tab['A' & CP_OFF] = st; // complement alias slots
		tab['C' & CP_OFF] = sg;
		tab['T' & CP_OFF] = sa;
		tab['G' & CP_OFF] = sc;
		done = true;
	}
	return tab;
}

// NOLINTNEXTLINE(cppcoreguidelines-interfaces-global-init)
static const uint64_t* const SEED_TAB = seed_tab_init();

// Split rotation (ntHash2's 33/31-bit split fix for rotational collisions).
inline uint64_t
srol(uint64_t x)
{
	uint64_t m = ((x & 0x8000000000000000ULL) >> 30) | ((x & 0x100000000ULL) >> 32);
	return ((x << 1) & 0xFFFFFFFDFFFFFFFFULL) | m;
}

inline uint64_t
srol(uint64_t x, unsigned d)
{
	unsigned dl = d % 33, dh = d % 31;
	uint64_t lo = x & LOW33;
	uint64_t hi = x >> 33;
	if (dl)
		lo = ((lo << dl) | (lo >> (33 - dl))) & LOW33;
	if (dh)
		hi = ((hi << dh) | (hi >> (31 - dh))) & 0x7FFFFFFFULL;
	return (hi << 33) | lo;
}

inline uint64_t
sror(uint64_t x)
{
	uint64_t lo = x & LOW33;
	uint64_t hi = x >> 33;
	lo = ((lo >> 1) | (lo << 32)) & LOW33;
	hi = ((hi >> 1) | (hi << 30)) & 0x7FFFFFFFULL;
	return (hi << 33) | lo;
}

// srol_table(c, d) == srol(SEED_TAB[c], d); the reference calls it with the
// complement-masked char and d = k-1 (ntedit.cpp:448-449).
inline uint64_t
srol_table(unsigned char c, unsigned d)
{
	return srol(SEED_TAB[c], d);
}

inline uint64_t
base_forward_hash(const char* seq, unsigned k)
{
	uint64_t h = 0;
	for (unsigned i = 0; i < k; ++i)
		h = srol(h) ^ SEED_TAB[(unsigned char)seq[i]];
	return h;
}

inline uint64_t
base_reverse_hash(const char* seq, unsigned k)
{
	uint64_t h = 0;
	for (unsigned i = k; i-- > 0;)
		h = srol(h) ^ SEED_TAB[(unsigned char)seq[i] & CP_OFF];
	return h;
}

inline uint64_t
canonical(uint64_t fh, uint64_t rh)
{
	return fh < rh ? fh : rh;
}

inline uint64_t
next_forward_hash(uint64_t fh, unsigned k, unsigned char char_out, unsigned char char_in)
{
	return srol(fh) ^ srol(SEED_TAB[char_out], k) ^ SEED_TAB[char_in];
}

inline uint64_t
next_reverse_hash(uint64_t rh, unsigned k, unsigned char char_out, unsigned char char_in)
{
	return sror(rh ^ SEED_TAB[char_out & CP_OFF] ^ srol(SEED_TAB[char_in & CP_OFF], k));
}

// NTM64 multi-hash extension: h[0] = canonical hash, h[i>=1] =
// mix(base * (i ^ k*MULTISEED)) (nthash_ref.py extend_hashes).
inline void
extend_hashes(uint64_t bh, unsigned k, unsigned m, uint64_t* hashes)
{
	hashes[0] = bh;
	for (unsigned i = 1; i < m; ++i) {
		uint64_t mult = (uint64_t)i ^ ((uint64_t)k * MULTISEED);
		uint64_t t = bh * mult;
		t ^= t >> MULTISHIFT;
		hashes[i] = t;
	}
}

} // namespace hashing_internals
} // namespace btllib

#endif
