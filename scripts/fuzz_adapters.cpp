// Differential fuzz: the production serial adapters (KTrack boundary
// walker, adapt_stateful, adapt_stateless_inc) vs division-based spec
// twins (reference semantics: rice.hpp:45-114, rounded mean
// (sum+count/2)/count -> bit_width bucketing). Build + run:
//   g++ -O2 -march=native -std=c++17 -o /tmp/fuzz_adapters \
//       scripts/fuzz_adapters.cpp -lpthread && /tmp/fuzz_adapters
// (or `python scripts/fuzz_native.py`). Exits 0 iff every trial is
// bit-exact: 400 KTrack walks with bulk-count and huge-value jumps,
// 300 stateful streams with spikes/zeros, 300 stateless streams with
// zero-run bulk skips.
#define main lac_unused_main
#include "../lac_tpu/runtime/src/lac_runtime.cpp"
#undef main
#include <random>
#include <cstdio>

// spec twin of adapt_stateful with a real division (the pre-KTrack body)
struct SpecState {
  uint64_t prev_sum = 0;
  uint32_t widx = 0, midx = 0, filled = 0;
  uint64_t wsum = 0;
  int32_t large = 0, zero = 0;
  uint32_t recent[256] = {};
  uint8_t lflags[96] = {}, zflags[96] = {};
};
static uint32_t spec_stateful(SpecState& st, uint64_t sum, uint32_t count) {
  if (count == 0) return 0;
  const uint64_t cur = sum - st.prev_sum;
  st.prev_sum = sum;
  st.large -= st.lflags[st.midx];
  st.zero -= st.zflags[st.midx];
  if (st.filled < 256) ++st.filled; else st.wsum -= st.recent[st.widx];
  st.recent[st.widx] = (uint32_t)cur;
  st.wsum += cur;
  const uint64_t num = sum + (count >> 1);
  const uint64_t mean = num / count;
  const uint32_t k = (mean <= 1) ? 0u : (bitwidth64(mean - 1) > 31u ? 31u : bitwidth64(mean - 1));
  const uint32_t qb = (k >= 31u) ? 0u : (uint32_t)(cur >> k);
  const uint8_t il = qb > 3u, iz = qb == 0u;
  st.large += il; st.zero += iz;
  st.lflags[st.midx] = il; st.zflags[st.midx] = iz;
  int32_t bias = 0;
  if (st.filled > 0 && mean > 0) {
    const uint64_t lnum = st.wsum + (st.filled >> 1);
    const uint64_t lm = (st.filled == 256) ? ((st.wsum + 128) >> 8) : (lnum / st.filled);
    if (lm * 3 > mean * 4) bias = 1;
    else if (lm * 4 + 3 < mean * 3) bias = -1;
  }
  if (st.widx + 1 >= 96 || st.filled >= 96) {
    const uint32_t ws = st.filled >= 96 ? 96 : st.filled;
    if ((uint32_t)st.large * 4 >= ws * 3) bias = bias + 1 > 1 ? 1 : bias + 1;
    else if ((uint32_t)st.zero * 5 >= ws * 4) bias = bias - 1 < -1 ? -1 : bias - 1;
  }
  int32_t bk = (int32_t)k + bias;
  if (bk < 0) bk = 0;
  if (bk > 31) bk = 31;
  st.midx = (st.midx + 1 == 96) ? 0 : st.midx + 1;
  st.widx = (st.widx + 1) & 255;
  return (uint32_t)bk;
}

int main() {
  std::mt19937_64 rng(99);
  // 1) KTrack vs k_from_mean over adversarial (num, count) walks
  for (int trial = 0; trial < 400; ++trial) {
    KTrack kt;
    uint64_t sum = 0; uint64_t count = 0;
    for (int i = 0; i < 20000; ++i) {
      // mix tiny steps, count jumps (zero runs), and huge value jumps
      const int mode = (int)(rng() % 100);
      if (mode < 80) { sum += rng() % 64; count += 1; }
      else if (mode < 90) { count += 1 + rng() % 1000; }      // bulk skip
      else if (mode < 97) { sum += rng() % 0xFFFFFFFFull; count += 1; }
      else { sum += (rng() % 0xFFFFFFFFull) << 12; count += 1; }
      const uint64_t num = sum + (count >> 1);
      const uint32_t got = kt.update(num, count);
      const uint32_t want = k_from_mean(num / count);
      if (got != want) { printf("KTRACK MISMATCH t=%d i=%d got=%u want=%u\n", trial, i, got, want); return 1; }
    }
  }
  // 2) new adapt_stateful vs division spec over random residual streams
  for (int trial = 0; trial < 300; ++trial) {
    AdaptK st; SpecState sp;
    uint64_t sum = 0;
    std::geometric_distribution<uint32_t> gd(1.0 / (1 + (double)(rng() % 5000)));
    for (uint32_t i = 1; i <= 16384; ++i) {
      uint32_t u = gd(rng);
      if (rng() % 512 == 0) u = (uint32_t)(rng() % 0xFFFFFFFFull);  // spikes
      if (rng() % 7 == 0) u = 0;                                    // zeros
      sum += u;
      const uint32_t a = adapt_stateful(st, sum, i);
      const uint32_t b = spec_stateful(sp, sum, i);
      if (a != b) { printf("STATEFUL MISMATCH t=%d i=%u got=%u want=%u\n", trial, i, a, b); return 1; }
    }
  }
  // 3) adapt_stateless_inc vs adapt_stateless spec, with bulk skips
  for (int trial = 0; trial < 300; ++trial) {
    KTrack kt;
    uint64_t sum = 0; uint32_t count = 0;
    std::geometric_distribution<uint32_t> gd(1.0 / (1 + (double)(rng() % 3000)));
    for (int i = 0; i < 16384; ++i) {
      if (rng() % 50 == 0) { count += 1 + rng() % 300; }
      else { sum += gd(rng); count += 1; }
      const uint32_t a = adapt_stateless_inc(kt, sum, count);
      const uint32_t b = adapt_stateless(sum, count);
      if (a != b) { printf("STATELESS MISMATCH t=%d i=%d got=%u want=%u\n", trial, i, a, b); return 1; }
    }
  }
  printf("all equivalence checks passed\n");
  return 0;
}
