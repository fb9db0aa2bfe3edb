// textops: Levenshtein kernels for fuzzy category matching and AUED metrics.
//
// Native replacement for the `Levenshtein` / `editdistance` C extensions the
// reference depends on (data/coin/benchmarks.py:1, data/ego4d/lta.py:1).
// Exposed via ctypes (videollm_online_tpu/utils/text_metrics.py).

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <string>
#include <vector>

namespace {

template <typename T>
int lev(const T* a, int na, const T* b, int nb) {
  if (na < nb) {
    std::swap(a, b);
    std::swap(na, nb);
  }
  std::vector<int> prev(nb + 1), cur(nb + 1);
  for (int j = 0; j <= nb; ++j) prev[j] = j;
  for (int i = 1; i <= na; ++i) {
    cur[0] = i;
    const T ca = a[i - 1];
    for (int j = 1; j <= nb; ++j) {
      const int sub = prev[j - 1] + (ca != b[j - 1]);
      cur[j] = std::min({prev[j] + 1, cur[j - 1] + 1, sub});
    }
    std::swap(prev, cur);
  }
  return prev[nb];
}

// Lower bound used to skip candidates early in best-match scans.
inline int length_bound(int na, int nb) { return na > nb ? na - nb : nb - na; }

}  // namespace

extern "C" {

int levenshtein_bytes(const char* a, int na, const char* b, int nb) {
  return lev(a, na, b, nb);
}

int levenshtein_u32(const uint32_t* a, int na, const uint32_t* b, int nb) {
  return lev(a, na, b, nb);
}

// argmin over candidates by (distance, lexicographic candidate) — the same
// tie-break as Python's min over (dist, choice) tuples.
int levenshtein_best_match(const char* text, int nt, const char** choices,
                           const int* lens, int n_choices) {
  int best_idx = -1;
  int best_dist = 1 << 30;
  for (int i = 0; i < n_choices; ++i) {
    if (length_bound(nt, lens[i]) > best_dist) continue;
    const int d = lev(text, nt, choices[i], lens[i]);
    if (d < best_dist) {
      best_dist = d;
      best_idx = i;
    } else if (d == best_dist && best_idx >= 0) {
      // lexicographic tie-break
      const int cmp = std::strcmp(choices[i], choices[best_idx]);
      if (cmp < 0) best_idx = i;
    }
  }
  return best_idx;
}

}  // extern "C"
