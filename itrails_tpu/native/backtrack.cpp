// Viterbi backpointer walk (host side).
//
// The segmented long-block Viterbi (hmm/longseq.py) recomputes one
// segment's (n, M) int32 backpointer table on device, then must walk it
// serially: state_t = ptrs[t][state_{t+1}].  In Python that is ~1e8 loop
// iterations for a chromosome-scale block (minutes); here it runs at
// memory speed (one dependent load per column).  Parity: identical walk,
// same int32 table (reference semantics: optimizer.py:336-354).
#include <cstdint>

extern "C" {

// ptrs: (n, m) row-major int32 backpointer table for stream positions
// [0, n).  Walks t = n-1 .. 0 from `state` (the state at position n),
// writing the state at each position t into path[t].
void viterbi_backtrack(const int32_t* ptrs, int64_t n, int64_t m,
                       int32_t state, int32_t* path) {
  for (int64_t t = n - 1; t >= 0; --t) {
    state = ptrs[t * m + state];
    path[t] = state;
  }
}

}  // extern "C"
