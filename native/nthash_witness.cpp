// Independent C++ witness of the ntHash2 forward rolling hash.
//
// Purpose (docs/PARITY.md "hash provenance"): the reference binary links
// the external ntHash library (reference src/sketch.cpp:31-37), which is
// not obtainable in this offline environment.  To avoid the Python
// implementation certifying itself, this file re-derives the algorithm a
// THIRD way, in C++, using the ntHash2 publication's canonical
// formulation:
//
//   - srol expressed as the bit-twiddle form (mask + single shift), NOT
//     the field-split form used by sketch_rna_tpu/hash/nthash.py;
//   - the k-mer hash maintained ONLY by the rolling recurrence
//       fh(i+1) = srol(fh(i)) ^ srol^k(seed[s[i]]) ^ seed[s[i+k]]
//     exactly like nthash::NtHash::roll(); no windowed-XOR shortcut.
//
// tests/test_nthash.py builds this with g++ at test time and requires
// bit-equality with both Python scalar forms and the device batch path
// across randomized sequences and k values.  Agreement of three
// independently-expressed derivations (plus the published seed
// constants) is the strongest hash-provenance evidence available
// without network access to the real library.
//
// Protocol: each stdin line is "<k> <ACGT sequence>"; stdout echoes one
// line of space-separated 16-digit hex forward hashes (n-k+1 of them),
// or an empty line when the sequence is shorter than k.

#include <cstdint>
#include <iostream>
#include <sstream>
#include <string>
#include <vector>

namespace {

// Published ntHash per-base seeds (ntHash kmer.hpp seed_a..seed_t).
constexpr uint64_t kSeed[4] = {
    0x3c8bfbb395c60474ULL,  // A
    0x3193c18562a02b4cULL,  // C
    0x20323ed082572324ULL,  // G
    0x295549f54be24456ULL,  // T
};

// ntHash2 split-rotate-left by 1, canonical bit-twiddle form: bit 63
// wraps to bit 33 (the 31-bit high field) and bit 32 wraps to bit 0
// (the 33-bit low field); bit 33 is cleared from the plain shift.
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

}  // namespace

int main() {
  std::ios::sync_with_stdio(false);
  std::string line;
  while (std::getline(std::cin, line)) {
    if (line.empty()) continue;
    std::istringstream ss(line);
    unsigned k = 0;
    std::string seq;
    ss >> k >> seq;
    std::ostringstream out;
    if (k >= 1 && seq.size() >= k) {
      std::vector<int> codes(seq.size());
      bool ok = true;
      for (size_t i = 0; i < seq.size(); ++i) {
        codes[i] = base_code(seq[i]);
        if (codes[i] < 0) ok = false;
      }
      if (!ok) {
        std::cout << "ERR non-ACGT\n";
        continue;
      }
      // First k-mer: fold bases through the rolling init, exactly the
      // loop nthash's constructor performs for the base forward hash.
      uint64_t fh = 0;
      for (unsigned j = 0; j < k; ++j)
        fh = srol1(fh) ^ kSeed[codes[j]];
      out << std::hex;
      out.width(16);
      out.fill('0');
      out << fh;
      for (size_t i = 1; i + k <= seq.size(); ++i) {
        fh = srol1(fh) ^ srol_n(kSeed[codes[i - 1]], k) ^
             kSeed[codes[i + k - 1]];
        out << ' ';
        out.width(16);
        out << fh;
      }
    }
    std::cout << out.str() << '\n';
  }
  return 0;
}
