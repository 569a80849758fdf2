// API-compatible ntHash2 shim for building the REFERENCE C++ sources.
//
// Purpose (docs/PARITY.md "hash provenance"): the reference links the
// external ntHash library, which cannot be fetched in this offline
// environment.  This header implements the exact API surface the
// reference uses (reference src/sketch.cpp:31-37, src/kmer.cpp:26-31):
//
//   nthash::NtHash nth(sequence, /*hash_num=*/1, k);
//   while (nth.roll()) { uint64_t h = nth.get_forward_hash(); ... }
//
// with the ntHash2 forward rolling recurrence independently re-derived
// from the publication (same algorithm as native/nthash_witness.cpp,
// which tests/test_nthash.py pins bit-equal to the two Python
// derivations).  Compiling /root/reference/src/*.cpp against this shim
// yields a runnable binary of the reference's OWN pipeline code
// (sketching loop, sparse chaining, EM, CSV writer all verbatim from
// the reference), which tests/test_reference_binary.py runs end-to-end
// against this framework's CLI.
//
// This file is original code — nothing here is copied from the ntHash
// library; only its published algorithm and seed constants are used.

#ifndef NTHASH_SHIM_HPP
#define NTHASH_SHIM_HPP

#include <cstdint>
#include <string>

namespace nthash {

namespace shim_detail {

// Published ntHash per-base seeds (seed_a, seed_c, seed_g, seed_t).
constexpr uint64_t kSeed[4] = {
    0x3c8bfbb395c60474ULL,  // A
    0x3193c18562a02b4cULL,  // C
    0x20323ed082572324ULL,  // G
    0x295549f54be24456ULL,  // T
};

// ntHash2 split-rotate-left by 1: bit 63 wraps to bit 33 (31-bit high
// field) and bit 32 wraps to bit 0 (33-bit low field).
inline uint64_t srol1(uint64_t x) {
  uint64_t m = ((x & 0x8000000000000000ULL) >> 30) |
               ((x & 0x0000000100000000ULL) >> 32);
  return ((x << 1) & 0xfffffffdffffffffULL) | m;
}

inline uint64_t srol_n(uint64_t x, unsigned n) {
  for (unsigned i = 0; i < n; ++i) x = srol1(x);
  return x;
}

inline int base_code(char c) {
  switch (c) {
    case 'A': case 'a': return 0;
    case 'C': case 'c': return 1;
    case 'G': case 'g': return 2;
    case 'T': case 't': return 3;
    default: return -1;
  }
}

}  // namespace shim_detail

// Forward-strand-only rolling hasher over one sequence.  Like the real
// ntHash, roll() skips ahead past any non-ACGT character (the reference
// pre-validates sequences to ACGT, so that path never triggers there).
class NtHash {
 public:
  NtHash(const std::string& seq, unsigned hash_num, unsigned k,
         size_t pos = 0)
      : seq_(seq), k_(k), pos_(pos), fh_(0), primed_(false) {
    (void)hash_num;  // reference always passes 1; only fh is tracked
    // Precompute srol^k(seed) per base once, like the real library's
    // rotated-seed tables — the roll stays O(1) per base.
    for (int b = 0; b < 4; ++b)
      seed_k_[b] = shim_detail::srol_n(shim_detail::kSeed[b], k_);
  }

  bool roll() {
    using namespace shim_detail;
    if (k_ == 0 || seq_.size() < k_) return false;
    if (!primed_) {
      return prime_from(pos_);
    }
    size_t next_start = pos_ + 1;
    if (next_start + k_ > seq_.size()) return false;
    int incoming = base_code(seq_[next_start + k_ - 1]);
    if (incoming < 0) {
      // Non-ACGT entering the window: restart after it, like ntHash.
      return prime_from(next_start + k_);
    }
    int outgoing = base_code(seq_[pos_]);
    fh_ = srol1(fh_) ^ seed_k_[outgoing] ^ kSeed[incoming];
    pos_ = next_start;
    return true;
  }

  uint64_t get_forward_hash() const { return fh_; }
  size_t get_pos() const { return pos_; }

 private:
  // Fold the first valid k-mer at or after `start`; false when none.
  bool prime_from(size_t start) {
    using namespace shim_detail;
    while (start + k_ <= seq_.size()) {
      uint64_t fh = 0;
      bool ok = true;
      for (unsigned j = 0; j < k_; ++j) {
        int c = base_code(seq_[start + j]);
        if (c < 0) {
          start = start + j + 1;  // skip past the offending base
          ok = false;
          break;
        }
        fh = srol1(fh) ^ kSeed[c];
      }
      if (ok) {
        fh_ = fh;
        pos_ = start;
        primed_ = true;
        return true;
      }
    }
    return false;
  }

  const std::string& seq_;
  unsigned k_;
  size_t pos_;
  uint64_t fh_;
  bool primed_;
  uint64_t seed_k_[4];
};

}  // namespace nthash

#endif  // NTHASH_SHIM_HPP
