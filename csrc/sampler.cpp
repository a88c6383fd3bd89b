// gcc_tpu native host sampler.
//
// TPU-native equivalent of the DGL 0.4 C++ sampling kernels the reference
// depends on (SURVEY.md §2b N1-N4):
//   N1 random-walk-with-restart (reference call sites
//      gcc/datasets/graph_dataset.py:125-130,255-260)
//   N2 k-hop neighbor sampling  (graph_dataset.py:131-162, aug="ns")
//   N3 simple random walk       (graph_dataset.py:104-110)
//   N4 induced subgraph extraction + compact relabel, seed at index 0
//      (gcc/datasets/data_util.py:218-231)
//
// The fused entry point `gcc_sample_subgraphs` runs, per seed: the RWR (or
// neighbor-sampling) trace accumulation, unique-visited-set construction with
// the seed forced to local id 0, and induced-edge extraction — emitting
// relabeled edge lists ready for the padded-batch packer. Everything is
// deterministic given (rng_seed, seed index): each seed gets an independent
// splitmix64-seeded xoshiro256** stream, so multi-process samplers partition
// work without RNG coupling and every sample is reproducible.
//
// Behavior contract mirrored from the reference (not translated code):
//  * A "trace" starts at the seed and repeatedly hops to a uniformly random
//    out-neighbor; after every hop the walk restarts (trace ends) with
//    probability `restart_prob`. Traces are generated until the total number
//    of visited nodes (counted with multiplicity, seed excluded) reaches the
//    per-seed budget — DGL's `max_nodes_per_seed` visit threshold.
//  * The subgraph node set is the unique visited nodes with the seed first.
//  * Induced edges keep multi-edges (multiplicity matters for GIN sums).

#include <algorithm>
#include <atomic>
#include <chrono>
#include <memory>
#include <mutex>
#if defined(__x86_64__)
#include <immintrin.h>
#endif
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <thread>
#include <vector>

namespace {

// --- RNG: splitmix64 (seeding) + xoshiro256** (stream) -----------------------

static inline uint64_t splitmix64(uint64_t& x) {
  uint64_t z = (x += 0x9E3779B97F4A7C15ULL);
  z = (z ^ (z >> 30)) * 0xBF58476D1CE4E5B9ULL;
  z = (z ^ (z >> 27)) * 0x94D049BB133111EBULL;
  return z ^ (z >> 31);
}

struct Rng {
  uint64_t s[4];
  explicit Rng(uint64_t seed) {
    for (int i = 0; i < 4; ++i) s[i] = splitmix64(seed);
  }
  static inline uint64_t rotl(uint64_t x, int k) {
    return (x << k) | (x >> (64 - k));
  }
  inline uint64_t next() {
    const uint64_t result = rotl(s[1] * 5, 7) * 9;
    const uint64_t t = s[1] << 17;
    s[2] ^= s[0];
    s[3] ^= s[1];
    s[1] ^= s[2];
    s[0] ^= s[3];
    s[2] ^= t;
    s[3] = rotl(s[3], 45);
    return result;
  }
  // Uniform in [0, n) — Lemire's multiply-shift (unbiased enough here).
  inline uint64_t bounded(uint64_t n) {
    return (uint64_t)(((__uint128_t)next() * (__uint128_t)n) >> 64);
  }
  inline double uniform() {
    return (next() >> 11) * 0x1.0p-53;
  }
};

struct Csr {
  const int64_t* indptr;
  const int32_t* indices;
  int64_t num_nodes;
  // Hub-row extraction (see induced_edges): enabled only when the caller
  // guarantees every CSR row's neighbor ids are ascending (corpus manifest
  // flag `rows_sorted`, threaded through the entry points' `flags` bit 0)
  // AND GCC_TPU_HUB_MULT > 0 (read once per entry call; 0 disables).
  bool rows_sorted = false;
  int64_t hub_mult = 0;
  // Extraction word-prefetch distance in 16-neighbor chunks, from
  // GCC_TPU_EXTRACT_PF (default 0 = off — measured neutral even at
  // miss-bound corpus scale; see extract_pf_env).
  int64_t pf_chunks = 0;
  inline int64_t degree(int64_t u) const { return indptr[u + 1] - indptr[u]; }
  inline int32_t random_neighbor(int64_t u, Rng& rng) const {
    const int64_t d = degree(u);
    return indices[indptr[u] + (int64_t)rng.bounded((uint64_t)d)];
  }
};

// Visited-set accumulator with O(1) dedup via a per-thread epoch-stamped map.
// (An L1-resident open-addressing hash was tried and measured SLOWER for
// extraction — 0.74 vs 0.60 ms/batch-pair: the stamp probes of one subgraph
// concentrate on ~2k distinct nodes and stay cache-resident, while the hash
// pays its compute on every probe. docs/PERF.md host section.)
// Layout: one uint32 word per graph node, (epoch16 << 16) | local_id16 —
// a membership probe AND the local-id read are a single 4-byte load
// (the previous int64 stamp + separate int32 local_id array paid a
// second random access per matched edge and twice the probe footprint;
// the probes are the extraction's cache hot spot). The 16-bit epoch
// wraps every 65536 resets, at which point the word array is cleared —
// ~400 KB per 65k subgraphs, amortized noise. Requires local ids (and
// thus node_cap) < 65536, far above any supported bucket.
struct VisitSet {
  std::vector<uint32_t> word;   // (epoch << 16) | local_id
  std::vector<int32_t> nodes;   // insertion order (global ids)
  uint32_t epoch = 0;

  void ensure(int64_t n) {
    if ((int64_t)word.size() < n) word.assign(n, 0);
  }
  void reset() {
    ++epoch;
    nodes.clear();
    if (epoch == 0x10000u) {  // 16-bit wrap: clear and restart at 1
      epoch = 1;
      std::fill(word.begin(), word.end(), 0u);
    }
  }
  // Returns local id, inserting if new.
  inline int32_t insert(int32_t u) {
    const uint32_t w = word[u];
    if ((w >> 16) != epoch) {
      const int32_t lid = (int32_t)nodes.size();
      word[u] = (epoch << 16) | (uint32_t)lid;
      nodes.push_back(u);
      return lid;
    }
    return (int32_t)(w & 0xFFFFu);
  }
  inline bool contains(int32_t u) const { return (word[u] >> 16) == epoch; }
  inline int32_t id(int32_t u) const { return (int32_t)(word[u] & 0xFFFFu); }
};

// Process-lifetime pool of VisitSets. The word array is O(num_nodes)
// (19 MB at the reference corpus scale); allocating it per native call
// pays page-fault + zeroing costs that measured ~0.2 ms per batch-pair
// at reference scale (docs/PERF.md round-5 refscale table — the
// unaccounted gap between the phase counters and wall). Pooled sets
// keep their pages mapped and their epoch counters across calls, so
// reuse is free; the epoch invariant survives pooling (stale stamps
// always carry epochs below the set's own post-reset epoch).
struct SetPool {
  std::mutex mu;
  std::vector<std::unique_ptr<VisitSet>> free_sets;
  std::unique_ptr<VisitSet> get(int64_t n) {
    std::unique_ptr<VisitSet> s;
    {
      std::lock_guard<std::mutex> lk(mu);
      if (!free_sets.empty()) {
        s = std::move(free_sets.back());
        free_sets.pop_back();
      }
    }
    if (!s) s.reset(new VisitSet());
    s->ensure(n);
    return s;
  }
  void put(std::unique_ptr<VisitSet> s) {
    std::lock_guard<std::mutex> lk(mu);
    free_sets.push_back(std::move(s));
  }
};
SetPool g_set_pool;

// Accumulate an RWR trace's visited set (budget = visit threshold).
void rwr_visit(const Csr& g, int64_t seed, double restart_prob, int64_t budget,
               int64_t node_cap, Rng& rng, VisitSet& set) {
  set.insert((int32_t)seed);
  if (g.degree(seed) == 0) return;  // isolated seed: singleton subgraph
  int64_t visits = 0;
  // One 64-bit draw per hop: high 32 bits pick the neighbor (32-bit
  // multiply-shift, bias < d/2^32), low 32 bits decide restart — halves
  // the RNG calls on the walk hot loop. xoshiro256** halves are
  // independent enough for a sampler.
  const uint32_t restart_u32 =
      restart_prob >= 1.0 ? 0xFFFFFFFFu
                          : (uint32_t)(restart_prob * 4294967296.0);
  while (visits < budget && (int64_t)set.nodes.size() < node_cap) {
    int64_t cur = seed;
    // One trace: hop until restart fires.
    while (true) {
      const int64_t d = g.degree(cur);
      if (d == 0) break;
      const uint64_t r = rng.next();
      cur = g.indices[g.indptr[cur] +
                      (int64_t)(((r >> 32) * (uint64_t)d) >> 32)];
      set.insert((int32_t)cur);
      ++visits;
      if (visits >= budget || (int64_t)set.nodes.size() >= node_cap) break;
      if ((uint32_t)r < restart_u32) break;
    }
  }
}

// Layered neighbor-sampling visit (aug="ns"): `hops` layers, each node in the
// frontier contributes up to `expand` sampled neighbors (all, if degree <=
// expand; distinct picks otherwise).
void ns_visit(const Csr& g, int64_t seed, int64_t expand, int64_t hops,
              int64_t node_cap, Rng& rng, VisitSet& set) {
  set.insert((int32_t)seed);
  std::vector<int32_t> frontier{(int32_t)seed}, next;
  for (int64_t h = 0; h < hops && !frontier.empty(); ++h) {
    next.clear();
    for (int32_t u : frontier) {
      const int64_t d = g.degree(u);
      if (d == 0) continue;
      if (d <= expand) {
        for (int64_t j = g.indptr[u]; j < g.indptr[u + 1]; ++j) {
          int32_t v = g.indices[j];
          if ((int64_t)set.nodes.size() >= node_cap && !set.contains(v)) continue;
          set.insert(v);
          next.push_back(v);
        }
      } else {
        for (int64_t k = 0; k < expand; ++k) {
          int32_t v = g.random_neighbor(u, rng);
          if ((int64_t)set.nodes.size() >= node_cap && !set.contains(v)) continue;
          set.insert(v);
          next.push_back(v);
        }
      }
    }
    frontier.swap(next);
  }
}

// --- Hub-row extraction ------------------------------------------------------
//
// The induced-edge scan costs deg(u) sequential id loads PLUS deg(u)
// scattered visit-word probes per visited node u. At the reference corpus
// scale the word array is ~19 MB so every probe is a likely DRAM miss, and
// deg^0.75-biased seeds put real hubs (deg 10k+) into most visit sets —
// those rows dominate extraction (docs/PERF.md round-5 refscale table:
// extract degrades 4.3x, ~5.8k probes/subgraph vs ~1.3k LLC-resident).
// For a SORTED row the intersection can run the other way: walk the visit
// set (n <= node_cap, a few hundred) in ascending global-id order and
// binary-search each id in the remaining row suffix — O(n log d) row
// probes, ZERO visit-word gathers. The emitted sequence is identical to
// the scan's by construction (both walk the row left-to-right, i.e. in
// ascending neighbor-id order on a sorted row, with multi-edge runs kept
// adjacent) — pinned by the bit-identity test. Per-row decision:
// deg > hub_mult * n, hub_mult from GCC_TPU_HUB_MULT (0 disables), only
// when the caller flagged the CSR rows as sorted.

struct HubScratch {
  std::vector<uint64_t> sorted;  // (global_id << 32) | local_id, ascending
  bool built = false;
};

void build_hub_scratch(const VisitSet& set, HubScratch& hs) {
  const int64_t n = (int64_t)set.nodes.size();
  hs.sorted.resize((size_t)n);
  for (int64_t l = 0; l < n; ++l) {
    hs.sorted[(size_t)l] =
        ((uint64_t)(uint32_t)set.nodes[(size_t)l] << 32) | (uint64_t)l;
  }
  std::sort(hs.sorted.begin(), hs.sorted.end());
  hs.built = true;
}

int64_t extract_row_hub(const Csr& g, int32_t lu, const HubScratch& hs,
                        int64_t row_begin, int64_t row_end, int32_t* out_src,
                        int32_t* out_dst, int64_t e_cap, int64_t count) {
  const int32_t* row = g.indices;
  int64_t pos = row_begin;
  for (const uint64_t packed : hs.sorted) {
    if (pos >= row_end) break;
    const int32_t gid = (int32_t)(packed >> 32);
    const int32_t lid = (int32_t)(packed & 0xFFFFFFFFull);
    pos = std::lower_bound(row + pos, row + row_end, gid) - row;
    while (pos < row_end && row[pos] == gid) {
      if (count < e_cap) {
        out_src[count] = lu;
        out_dst[count] = lid;
      }
      ++count;
      ++pos;
    }
  }
  return count;
}

// Per-call hub-extraction gate shared by the scalar and AVX paths:
// owns the row-degree threshold and the lazily-built sorted visit-set
// scratch (thread-local storage, reset per extraction call) so the two
// dispatch paths — pinned bit-identical by tests — cannot diverge on
// the threshold rule or scratch lifecycle.
struct HubGate {
  int64_t hub_deg;
  HubScratch& hs;
  HubGate(const Csr& g, int64_t n)
      : hub_deg((g.rows_sorted && g.hub_mult > 0 && n > 0)
                    ? g.hub_mult * n
                    : INT64_MAX),
        hs(scratch()) {
    hs.built = false;
  }
  static HubScratch& scratch() {
    static thread_local HubScratch s;
    return s;
  }
  // Takes the row through the hub path when it clears the threshold;
  // returns false to fall through to the caller's scan.
  inline bool take(const Csr& g, const VisitSet& set, int32_t lu,
                   int64_t row_begin, int64_t row_end, int32_t* out_src,
                   int32_t* out_dst, int64_t e_cap, int64_t& count) {
    if (row_end - row_begin <= hub_deg) return false;
    if (!hs.built) build_hub_scratch(set, hs);
    count = extract_row_hub(g, lu, hs, row_begin, row_end, out_src, out_dst,
                            e_cap, count);
    return true;
  }
};

// Extract induced edges among the visit set, relabeled to local ids.
// Returns total edge count (may exceed cap; only cap edges are written).
int64_t induced_edges_scalar(const Csr& g, const VisitSet& set,
                             int32_t* out_src, int32_t* out_dst,
                             int64_t e_cap) {
  int64_t count = 0;
  const int32_t n = (int32_t)set.nodes.size();
  HubGate hub(g, n);
  for (int32_t lu = 0; lu < n; ++lu) {
    const int32_t u = set.nodes[lu];
    if (lu + 1 < n) {  // overlap the next node's CSR row fetch
      const int32_t nxt = set.nodes[lu + 1];
      __builtin_prefetch(&g.indptr[nxt], 0, 1);
    }
    const int64_t row_begin = g.indptr[u], row_end = g.indptr[u + 1];
    if (hub.take(g, set, lu, row_begin, row_end, out_src, out_dst, e_cap,
                 count)) {
      continue;
    }
    // Two passes per row: prefetch the random word[] probes, then test —
    // the membership lookups are the extraction's cache-miss hot spot.
    // Membership + local id ride in ONE uint32 load (VisitSet layout).
    for (int64_t j = row_begin; j < row_end; ++j) {
      __builtin_prefetch(&set.word[g.indices[j]], 0, 1);
    }
    const uint32_t epoch = set.epoch;
    for (int64_t j = row_begin; j < row_end; ++j) {
      const uint32_t w = set.word[g.indices[j]];
      if ((w >> 16) != epoch) continue;
      if (count < e_cap) {
        out_src[count] = lu;
        out_dst[count] = (int32_t)(w & 0xFFFFu);
      }
      ++count;
    }
  }
  return count;
}

#if defined(__x86_64__)
// AVX-512 extraction: per 16-neighbor chunk, one masked load of the ids,
// one gathered load of the visit words, one compare against the epoch,
// and mask compress-stores of the hits (vpcompressd) — the exact shape
// of this loop (gather → filter → compact) with no shuffle tables or
// branches. Target-attributed so the rest of the file stays baseline
// ISA; dispatched at runtime via __builtin_cpu_supports.
__attribute__((target("avx512f")))
int64_t induced_edges_avx512(const Csr& g, const VisitSet& set,
                             int32_t* out_src, int32_t* out_dst,
                             int64_t e_cap) {
  int64_t count = 0;
  const int32_t n = (int32_t)set.nodes.size();
  HubGate hub(g, n);
  const uint32_t* words = set.word.data();
  const __m512i epoch_v = _mm512_set1_epi32((int32_t)set.epoch);
  const __m512i low16 = _mm512_set1_epi32(0xFFFF);
  for (int32_t lu = 0; lu < n; ++lu) {
    const int32_t u = set.nodes[lu];
    if (lu + 1 < n) {
      __builtin_prefetch(&g.indptr[set.nodes[lu + 1]], 0, 1);
    }
    const int64_t row_begin = g.indptr[u], row_end = g.indptr[u + 1];
    if (hub.take(g, set, lu, row_begin, row_end, out_src, out_dst, e_cap,
                 count)) {
      continue;
    }
    const __m512i lu_v = _mm512_set1_epi32(lu);
    const int64_t pf = g.pf_chunks * 16;
    for (int64_t j = row_begin; j < row_end; j += 16) {
      const int64_t c = row_end - j;
      const __mmask16 lane =
          c >= 16 ? (__mmask16)0xFFFF : (__mmask16)((1u << c) - 1u);
      const __m512i vidx = _mm512_maskz_loadu_epi32(lane, &g.indices[j]);
      if (pf > 0 && j + pf < row_end) {
        // Prefetch the words this loop will gather pf/16 chunks from
        // now — at miss-bound corpus scale each gathered word is a
        // DRAM miss the hardware prefetcher can't predict (scattered
        // over the word array). ~20 cheap instructions per chunk.
        const int64_t cp = row_end - (j + pf);
        const __mmask16 lanep =
            cp >= 16 ? (__mmask16)0xFFFF : (__mmask16)((1u << cp) - 1u);
        const __m512i vidxp =
            _mm512_maskz_loadu_epi32(lanep, &g.indices[j + pf]);
        alignas(64) int32_t pids[16];
        _mm512_store_si512((__m512i*)pids, vidxp);
        unsigned mm = (unsigned)lanep;
        for (int t = 0; t < 16; ++t) {
          if (mm & (1u << t)) __builtin_prefetch(&words[pids[t]], 0, 1);
        }
      }
      const __m512i w = _mm512_mask_i32gather_epi32(
          _mm512_setzero_si512(), lane, vidx, (const int*)words, 4);
      const __mmask16 hit = _mm512_mask_cmpeq_epi32_mask(
          lane, _mm512_srli_epi32(w, 16), epoch_v);
      const int hits = __builtin_popcount((unsigned)hit);
      if (count + hits <= e_cap) {
        _mm512_mask_compressstoreu_epi32(&out_src[count], hit, lu_v);
        _mm512_mask_compressstoreu_epi32(&out_dst[count], hit,
                                         _mm512_and_si512(w, low16));
      } else {
        // Cap boundary (rare): finish this chunk scalar.
        for (int64_t k = j; k < row_end && k < j + 16; ++k) {
          const uint32_t wk = words[g.indices[k]];
          if ((wk >> 16) != set.epoch) continue;
          if (count < e_cap) {
            out_src[count] = lu;
            out_dst[count] = (int32_t)(wk & 0xFFFFu);
          }
          ++count;
        }
        goto next_chunk_done;
      }
      count += hits;
      continue;
    next_chunk_done:;
    }
  }
  return count;
}
#endif  // __x86_64__

int64_t induced_edges(const Csr& g, const VisitSet& set, int32_t* out_src,
                      int32_t* out_dst, int64_t e_cap) {
#if defined(__x86_64__)
  // GCC_SAMPLER_NO_AVX512=1 forces the scalar path (tests pin the two
  // implementations bit-identical on AVX-512 hosts). NOTE: the env var
  // is latched into this function-local static on the FIRST call of the
  // process — toggling it later in-process has no effect (tests set it
  // via subprocess environments for exactly this reason). Re-reading per
  // call would work but is deliberately avoided: callers may invoke this
  // per-seed, and getenv takes a libc lock.
  static const bool has_avx512 = __builtin_cpu_supports("avx512f") &&
      !(std::getenv("GCC_SAMPLER_NO_AVX512") &&
        std::getenv("GCC_SAMPLER_NO_AVX512")[0] == '1');
  if (has_avx512) {
    return induced_edges_avx512(g, set, out_src, out_dst, e_cap);
  }
#endif
  return induced_edges_scalar(g, set, out_src, out_dst, e_cap);
}

// Cumulative phase times for gcc_sample_wire_pairs (ns) — cheap always-on
// instrumentation (two steady_clock reads per phase per subgraph, ~40 ns
// against phases of tens of microseconds). Read via gcc_sampler_stats.
std::atomic<int64_t> g_walk_ns{0}, g_extract_ns{0}, g_pack_ns{0},
    g_subgraphs{0};

inline int64_t now_ns() {
  return std::chrono::duration_cast<std::chrono::nanoseconds>(
             std::chrono::steady_clock::now().time_since_epoch())
      .count();
}

// Hub-extraction threshold multiplier (rows with deg > mult * |visit set|
// take the binary-search path). Read once per ENTRY call, not latched:
// one getenv per super-batch is free, and tests toggle it in-process.
// Default 64 — the measured crossover on the reference-scale corpus
// (paired A/B, docs/PERF.md round-5): the 16-lane AVX scan keeps
// winning on medium-degree rows, so only true mega-hub rows
// (deg > 64 * |set| ~ 16k) pay for the scalar binary search. 0 disables.
inline int64_t hub_mult_env() {
  const char* e = std::getenv("GCC_TPU_HUB_MULT");
  return e ? std::atoll(e) : 64;
}

// Extraction prefetch distance (chunks): see Csr::pf_chunks. Default
// OFF — measured NEUTRAL at reference corpus scale (paired A/B,
// docs/PERF.md round-5: extract/walk 1.78 → 1.74, inside noise; the
// vpgatherdd already keeps 16 loads in flight, so a software-prefetch
// window hides nothing the hardware isn't overlapping). Kept as a knob
// for wider-memory hosts.
inline int64_t extract_pf_env(int64_t num_nodes) {
  (void)num_nodes;
  const char* e = std::getenv("GCC_TPU_EXTRACT_PF");
  const int64_t v = e ? std::atoll(e) : 0;
  return v > 0 ? v : 0;
}

}  // namespace

extern "C" {

// Fills out[4] = {walk_ns, extract_ns, pack_ns, subgraphs} accumulated
// since load (or the last reset). reset != 0 zeroes the counters.
void gcc_sampler_stats(int64_t* out, int32_t reset) {
  out[0] = g_walk_ns.load();
  out[1] = g_extract_ns.load();
  out[2] = g_pack_ns.load();
  out[3] = g_subgraphs.load();
  if (reset) {
    g_walk_ns = 0;
    g_extract_ns = 0;
    g_pack_ns = 0;
    g_subgraphs = 0;
  }
}

// Fused per-seed pipeline: trace -> unique nodes (seed first) -> induced
// relabeled edges. All outputs are padded to (num_seeds, cap) row-major.
//
//   aug: 0 = random walk with restart, 1 = layered neighbor sampling
//   budgets: per-seed visit threshold (aug=0) — callers compute the
//            reference's max(rw_hops, deg^0.75 * e/(e-1)/p) formula host-side
//   expand/hops: aug=1 parameters
//   out_nodes: global node ids per subgraph (row b, first out_n[b] valid)
//   out_src/out_dst: local-id edge list (first out_e[b] valid)
//   out_e[b] is clamped to e_cap; out_e_full[b] carries the true count so the
//   caller can detect truncation and retry with a bigger bucket.
void gcc_sample_subgraphs(
    const int64_t* indptr, const int32_t* indices, int64_t num_nodes,
    const int64_t* seeds, int64_t num_seeds, const int64_t* budgets,
    double restart_prob, int32_t aug, int64_t expand, int64_t hops,
    uint64_t rng_seed, const int64_t* sample_ids,  // per-seed stream ids
    int64_t node_cap, int64_t e_cap, int32_t n_threads,
    int32_t* out_nodes, int32_t* out_n, int32_t* out_src, int32_t* out_dst,
    int32_t* out_e, int64_t* out_e_full,
    int32_t flags) {  // bit 0: CSR rows sorted (enables hub extraction)
  const Csr g{indptr, indices, num_nodes, (flags & 1) != 0,
              (flags & 1) ? hub_mult_env() : 0, extract_pf_env(num_nodes)};
  if (n_threads < 1) n_threads = 1;
  if (node_cap > 65535) node_cap = 65535;  // local ids live in 16 bits

  std::atomic<int64_t> next_seed{0};
  auto worker = [&]() {
    auto set_p = g_set_pool.get(num_nodes);
    VisitSet& set = *set_p;
    while (true) {
      const int64_t i = next_seed.fetch_add(1);
      if (i >= num_seeds) break;
      uint64_t stream = rng_seed ^ (0xD1B54A32D192ED03ULL * (uint64_t)(sample_ids ? sample_ids[i] : i));
      Rng rng(stream);
      set.reset();
      const int64_t seed = seeds[i];
      if (aug == 0) {
        rwr_visit(g, seed, restart_prob, budgets[i], node_cap, rng, set);
      } else {
        ns_visit(g, seed, expand, hops, node_cap, rng, set);
      }
      const int64_t n = (int64_t)set.nodes.size();
      out_n[i] = (int32_t)n;
      std::memcpy(out_nodes + i * node_cap, set.nodes.data(),
                  n * sizeof(int32_t));
      const int64_t e_full =
          induced_edges(g, set, out_src + i * e_cap, out_dst + i * e_cap, e_cap);
      out_e[i] = (int32_t)(e_full < e_cap ? e_full : e_cap);
      out_e_full[i] = e_full;
    }
    g_set_pool.put(std::move(set_p));
  };

  if (n_threads == 1) {
    worker();
  } else {
    std::vector<std::thread> threads;
    threads.reserve(n_threads);
    for (int t = 0; t < n_threads; ++t) threads.emplace_back(worker);
    for (auto& th : threads) th.join();
  }
}

// Simple random walk: final node after `num_hops` uniform hops (the
// reference's step_dist key-seed selection, graph_dataset.py:104-110).
void gcc_random_walk(const int64_t* indptr, const int32_t* indices,
                     int64_t num_nodes, const int64_t* seeds, int64_t num_seeds,
                     int64_t num_hops, uint64_t rng_seed,
                     const int64_t* sample_ids, int64_t* out_final) {
  const Csr g{indptr, indices, num_nodes};
  for (int64_t i = 0; i < num_seeds; ++i) {
    uint64_t stream = rng_seed ^ (0xA24BAED4963EE407ULL * (uint64_t)(sample_ids ? sample_ids[i] : i));
    Rng rng(stream);
    int64_t cur = seeds[i];
    for (int64_t h = 0; h < num_hops; ++h) {
      if (g.degree(cur) == 0) break;
      cur = g.random_neighbor(cur, rng);
    }
    out_final[i] = cur;
  }
}

// Fused wire-format sampler: contrastive (query, key) pair sampling with
// outputs written directly as int16 local-id edge arrays — the exact
// host->device wire layout (gcc_tpu/graph/batch.py WireBatch). One call
// per super-batch keeps the GIL released for the whole sampling+packing
// stage, so Python-side training dispatch overlaps fully.
//
//   budgets_q/budgets_k: per-seed visit thresholds for the two views
//   q/k use independent RNG streams (2*sample_id, 2*sample_id+1),
//   matching the Python-level pair sampler.
void gcc_sample_wire_pairs(
    const int64_t* indptr, const int32_t* indices, int64_t num_nodes,
    const int64_t* seeds_q, const int64_t* seeds_k, int64_t num_seeds,
    const int64_t* budgets_q, const int64_t* budgets_k,
    double restart_prob, int32_t aug, int64_t expand, int64_t hops,
    uint64_t rng_seed, const int64_t* sample_ids,
    int64_t node_cap, int64_t e_cap, int32_t n_threads,
    int16_t* q_src, int16_t* q_dst, int32_t* q_n, int32_t* q_e,
    int16_t* k_src, int16_t* k_dst, int32_t* k_n, int32_t* k_e,
    int32_t flags) {  // bit 0: CSR rows sorted (enables hub extraction)
  const Csr g{indptr, indices, num_nodes, (flags & 1) != 0,
              (flags & 1) ? hub_mult_env() : 0, extract_pf_env(num_nodes)};
  if (n_threads < 1) n_threads = 1;
  if (node_cap > 65535) node_cap = 65535;  // local ids live in 16 bits

  std::atomic<int64_t> next{0};

  // W-way interleaved walking (GCC_TPU_WALK_ILV=W, off by default).
  // Each hop is TWO dependent loads (indptr row, then the indices
  // element) plus a visit-word probe; a single walk is a serial miss
  // chain. At the LLC-resident bench-corpus scale interleaving LOSES
  // (measured r2/r3: W visit-word arrays multiply the random-probe
  // working set past the LLC — docs/PERF.md negatives), which is why
  // the default stays scalar. At the reference corpus scale
  // (LiveJournal-class, CSR and visit words are hundreds of MB, every
  // probe a DRAM miss regardless) round-robin stepping of W
  // INDEPENDENT walks overlaps W miss chains — classic memory-level
  // parallelism — and working-set growth costs nothing because
  // nothing was cache-resident to begin with. Outputs are
  // bit-identical to the scalar path: every (sample, view) owns its
  // RNG stream and visit set, so only completion ORDER changes.
  // (aug="ns" keeps the scalar path.)
  struct IlvWalk {
    std::unique_ptr<VisitSet> set_p;  // pooled (see SetPool)
    Rng rng{0};
    int64_t task = -1;
    int64_t seed = 0, budget = 0, visits = 0, cur = 0;
    bool in_trace = false;
  };
  const uint32_t restart_u32_c =
      restart_prob >= 1.0 ? 0xFFFFFFFFu
                          : (uint32_t)(restart_prob * 4294967296.0);
  auto worker_ilv = [&](int W) {
    std::vector<IlvWalk> slots((size_t)W);
    for (auto& s : slots) s.set_p = g_set_pool.get(num_nodes);
    std::vector<int32_t> es(e_cap), ed(e_cap);
    int live = 0;
    auto assign = [&](IlvWalk& s) -> bool {
      const int64_t t = next.fetch_add(1);
      if (t >= 2 * num_seeds) {
        s.task = -1;
        return false;
      }
      const int64_t i = t >> 1;
      const bool is_k = t & 1;
      const int64_t sid = sample_ids ? sample_ids[i] : i;
      s.rng = Rng(rng_seed ^ (0xD1B54A32D192ED03ULL *
                              (uint64_t)(2 * sid + (is_k ? 1 : 0))));
      s.set_p->reset();
      s.task = t;
      s.seed = is_k ? seeds_k[i] : seeds_q[i];
      s.budget = is_k ? budgets_k[i] : budgets_q[i];
      s.visits = 0;
      s.in_trace = false;
      s.set_p->insert((int32_t)s.seed);
      __builtin_prefetch(&g.indptr[s.seed], 0, 1);
      return true;
    };
    auto finish = [&](IlvWalk& s) {
      const int64_t t1 = now_ns();
      const int64_t i = s.task >> 1;
      const bool is_k = s.task & 1;
      const int64_t n = (int64_t)s.set_p->nodes.size();
      const int64_t e_full =
          induced_edges(g, *s.set_p, es.data(), ed.data(), e_cap);
      const int64_t t2 = now_ns();
      const int64_t e = e_full < e_cap ? e_full : e_cap;
      int16_t* osrc = (is_k ? k_src : q_src) + i * e_cap;
      int16_t* odst = (is_k ? k_dst : q_dst) + i * e_cap;
      for (int64_t j = 0; j < e; ++j) {
        osrc[j] = (int16_t)es[j];
        odst[j] = (int16_t)ed[j];
      }
      (is_k ? k_n : q_n)[i] = (int32_t)n;
      (is_k ? k_e : q_e)[i] = (int32_t)e;
      const int64_t t3 = now_ns();
      g_extract_ns.fetch_add(t2 - t1, std::memory_order_relaxed);
      g_pack_ns.fetch_add(t3 - t2, std::memory_order_relaxed);
      g_subgraphs.fetch_add(1, std::memory_order_relaxed);
    };
    for (auto& s : slots) {
      if (assign(s)) ++live;
    }
    int64_t t_mark = now_ns();
    while (live > 0) {
      for (auto& s : slots) {
        if (s.task < 0) continue;
        // One hop, exact rwr_visit semantics (same RNG draw order).
        bool done = false;
        if (s.visits >= s.budget ||
            (int64_t)s.set_p->nodes.size() >= node_cap) {
          done = true;
        } else if (!s.in_trace) {
          if (g.degree(s.seed) == 0) {
            done = true;  // isolated seed: singleton subgraph
          } else {
            s.cur = s.seed;
            s.in_trace = true;
          }
        }
        if (!done && s.in_trace) {
          const int64_t d = g.degree(s.cur);
          if (d == 0) {
            s.in_trace = false;  // dead-end trace; restart next step
          } else {
            const uint64_t r = s.rng.next();
            s.cur = g.indices[g.indptr[s.cur] +
                              (int64_t)(((r >> 32) * (uint64_t)d) >> 32)];
            s.set_p->insert((int32_t)s.cur);
            ++s.visits;
            // Next step's first dependent load for this walk.
            __builtin_prefetch(&g.indptr[s.cur], 0, 1);
            if (s.visits >= s.budget ||
                (int64_t)s.set_p->nodes.size() >= node_cap) {
              done = true;
            } else if ((uint32_t)r < restart_u32_c) {
              s.in_trace = false;
            }
          }
        }
        if (done) {
          g_walk_ns.fetch_add(now_ns() - t_mark,
                              std::memory_order_relaxed);
          finish(s);
          if (!assign(s)) --live;
          t_mark = now_ns();
        }
      }
    }
    for (auto& s : slots) g_set_pool.put(std::move(s.set_p));
  };

  auto worker = [&]() {
    auto set_p = g_set_pool.get(num_nodes);
    VisitSet& set = *set_p;
    std::vector<int32_t> es(e_cap), ed(e_cap);
    while (true) {
      const int64_t t = next.fetch_add(1);
      if (t >= 2 * num_seeds) break;
      const int64_t i = t >> 1;
      const bool is_k = t & 1;
      const int64_t sid = sample_ids ? sample_ids[i] : i;
      uint64_t stream = rng_seed ^
          (0xD1B54A32D192ED03ULL * (uint64_t)(2 * sid + (is_k ? 1 : 0)));
      Rng rng(stream);
      set.reset();
      const int64_t seed = is_k ? seeds_k[i] : seeds_q[i];
      const int64_t budget = is_k ? budgets_k[i] : budgets_q[i];
      const int64_t t0 = now_ns();
      if (aug == 0) {
        rwr_visit(g, seed, restart_prob, budget, node_cap, rng, set);
      } else {
        ns_visit(g, seed, expand, hops, node_cap, rng, set);
      }
      const int64_t n = (int64_t)set.nodes.size();
      const int64_t t1 = now_ns();
      const int64_t e_full = induced_edges(g, set, es.data(), ed.data(), e_cap);
      const int64_t t2 = now_ns();
      const int64_t e = e_full < e_cap ? e_full : e_cap;
      int16_t* osrc = (is_k ? k_src : q_src) + i * e_cap;
      int16_t* odst = (is_k ? k_dst : q_dst) + i * e_cap;
      for (int64_t j = 0; j < e; ++j) {
        osrc[j] = (int16_t)es[j];
        odst[j] = (int16_t)ed[j];
      }
      (is_k ? k_n : q_n)[i] = (int32_t)n;
      (is_k ? k_e : q_e)[i] = (int32_t)e;
      const int64_t t3 = now_ns();
      g_walk_ns.fetch_add(t1 - t0, std::memory_order_relaxed);
      g_extract_ns.fetch_add(t2 - t1, std::memory_order_relaxed);
      g_pack_ns.fetch_add(t3 - t2, std::memory_order_relaxed);
      g_subgraphs.fetch_add(1, std::memory_order_relaxed);
    }
    g_set_pool.put(std::move(set_p));
  };

  int ilv = 1;
  if (const char* env_ilv = std::getenv("GCC_TPU_WALK_ILV"))
    ilv = std::atoi(env_ilv);
  if (ilv > 1 && aug == 0) {
    if (n_threads == 1) {
      worker_ilv(ilv);
    } else {
      std::vector<std::thread> threads;
      threads.reserve(n_threads);
      for (int t = 0; t < n_threads; ++t)
        threads.emplace_back([&, ilv]() { worker_ilv(ilv); });
      for (auto& th : threads) th.join();
    }
    return;
  }
  if (n_threads == 1) {
    worker();
  } else {
    std::vector<std::thread> threads;
    threads.reserve(n_threads);
    for (int t = 0; t < n_threads; ++t) threads.emplace_back(worker);
    for (auto& th : threads) th.join();
  }
}

// Compact a block of padded per-graph wire rows into one flat edge buffer:
// out[j] = concatenation of row i's first e[i] entries. Bounds each graph's
// contribution so the total fits cap_total: if the running total would
// overflow, the current row is truncated (and every later row gets 0 slots).
// Returns per-row emitted counts in e_out and the grand total via *total.
// This is the host side of the compact wire format — 4-8x fewer bytes over
// the transfer-latency-bound remote relay than the padded (S, e_cap) layout.
void gcc_compact_rows(const int16_t* src, const int16_t* dst,
                      const int32_t* e, int64_t rows, int64_t e_cap,
                      int64_t cap_total, int16_t* out_src, int16_t* out_dst,
                      int32_t* e_out, int64_t* total) {
  int64_t off = 0;
  for (int64_t i = 0; i < rows; ++i) {
    int64_t take = (int64_t)e[i];
    if (take > cap_total - off) take = cap_total - off;
    if (take > 0) {
      memcpy(out_src + off, src + i * e_cap, take * sizeof(int16_t));
      memcpy(out_dst + off, dst + i * e_cap, take * sizeof(int16_t));
    }
    e_out[i] = (int32_t)take;
    off += take;
  }
  *total = off;
}

// Degree-biased seed sampling over a node range: draw `count` node ids with
// probability proportional to degree^power (the reference's deg^0.75 node
// sampling, graph_dataset.py:86-92). Uses the alias-free inverse-CDF on a
// host-precomputed cumulative array for O(log n) draws.
void gcc_weighted_sample(const double* cdf, int64_t n, int64_t count,
                         uint64_t rng_seed, int64_t* out) {
  Rng rng(rng_seed);
  const double total = cdf[n - 1];
  for (int64_t i = 0; i < count; ++i) {
    const double r = rng.uniform() * total;
    // Binary search for first cdf[j] > r.
    int64_t lo = 0, hi = n - 1;
    while (lo < hi) {
      const int64_t mid = (lo + hi) >> 1;
      if (cdf[mid] > r) hi = mid; else lo = mid + 1;
    }
    out[i] = lo;
  }
}

}  // extern "C"

extern "C" {

// Fused compaction + wire packing for a whole super-batch (the host side
// of CompactWireBatch, gcc_tpu/graph/batch.py): for each of `n_batches`
// consecutive groups of `step` rows, concatenate each row's first e[i]
// edges into a flat e_tot-slot buffer with BOTH endpoints packed into one
// uint16 (src | dst << 8 — requires local ids < 256, i.e. n_max <= 256),
// and fill the (3, step) meta block [n_nodes, kept_e, seed_pos=0].
// Overflowing batches truncate trailing rows; dropped edge totals are
// accumulated into out_dropped[batch] so the caller can warn. Replaces a
// python loop of gcc_compact_rows + numpy shift/or per batch (~0.2 ms per
// batch-pair of pure python/numpy dispatch).
void gcc_compact_pack16(
    const int16_t* src, const int16_t* dst, const int32_t* n,
    const int32_t* e, int64_t n_batches, int64_t step, int64_t e_cap,
    int64_t e_tot, uint16_t* out_edges, int32_t* out_meta,
    int64_t* out_dropped) {
  for (int64_t b = 0; b < n_batches; ++b) {
    uint16_t* oe = out_edges + b * e_tot;
    int32_t* meta_n = out_meta + b * 3 * step;
    int32_t* meta_e = meta_n + step;
    int32_t* meta_s = meta_e + step;
    int64_t off = 0, dropped = 0;
    for (int64_t r = 0; r < step; ++r) {
      const int64_t row = b * step + r;
      int64_t take = (int64_t)e[row];
      const int64_t want = take;
      if (take > e_tot - off) take = e_tot - off;
      const int16_t* rs = src + row * e_cap;
      const int16_t* rd = dst + row * e_cap;
      for (int64_t j = 0; j < take; ++j) {
        oe[off + j] =
            (uint16_t)((uint16_t)(rs[j] & 0xFF) | ((uint16_t)(rd[j] & 0xFF) << 8));
      }
      off += take;
      dropped += want - take;
      meta_n[r] = n[row];
      meta_e[r] = (int32_t)take;
      meta_s[r] = 0;
    }
    // zero the unused tail so reused device buffers never see stale edges
    // (the device expansion masks by counts, but keep the wire clean)
    std::memset(oe + off, 0, (size_t)(e_tot - off) * sizeof(uint16_t));
    out_dropped[b] = dropped;
  }
}

// Append selected wire rows into a class pool (the size-bucket router,
// gcc_tpu/sampling/pipeline.py emit="routed"): for each index in
// rows[0..n_rows), pack that row's first e[row] edges as uint16
// (src | dst << 8, local ids < 256) onto the pool's flat edge buffer and
// record (n, e, seed=0) in the per-row meta arrays. st = {row_off,
// edge_off}; both advance. The caller guarantees capacity (flat_cap is
// sized for full 2048-edge rows), so nothing is ever truncated here —
// truncation accounting happens once at item assembly against e_tot.
void gcc_pack_rows16(
    const int16_t* src, const int16_t* dst, const int32_t* n,
    const int32_t* e, const int32_t* rows, int64_t n_rows, int64_t e_cap,
    uint16_t* flat, int64_t flat_cap, int32_t* pool_n, int32_t* pool_e,
    int64_t* st) {
  int64_t row_off = st[0], edge_off = st[1];
  for (int64_t i = 0; i < n_rows; ++i) {
    const int64_t row = (int64_t)rows[i];
    int64_t take = (int64_t)e[row];
    if (take > flat_cap - edge_off) take = flat_cap - edge_off;  // guarded
    const int16_t* rs = src + row * e_cap;
    const int16_t* rd = dst + row * e_cap;
    uint16_t* oe = flat + edge_off;
    for (int64_t j = 0; j < take; ++j) {
      oe[j] =
          (uint16_t)((uint16_t)(rs[j] & 0xFF) | ((uint16_t)(rd[j] & 0xFF) << 8));
    }
    pool_n[row_off] = n[row];
    pool_e[row_off] = (int32_t)take;
    ++row_off;
    edge_off += take;
  }
  st[0] = row_off;
  st[1] = edge_off;
}

}  // extern "C"
