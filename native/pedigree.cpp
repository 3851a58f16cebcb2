// Pedigree inbreeding — native host-side kernel for the pedigree engine.
//
// Meuwissen & Luo (1992) inbreeding for a topologically coded pedigree
// (parents precede offspring). Equivalent math to the Python implementation
// in jwas_tpu/io/pedigree.py (_inbreeding_meuwissen_luo_py) and to the
// reference's memoised recursion (reference:
// src/2.PedModule/src/PedModule.jl:117-165) — rewritten in C++ because the
// per-animal ancestor walk is a scalar pointer chase (dict + heap in
// Python), ~30x slower than the array version below; at the 500k-animal
// single-step flagship the Python pass alone costs ~10 minutes.
//
// Parallelism: animal i's walk READS only F of animals with codes < i, so
// animals whose parents all precede the current block are independent. The
// pedigree is split greedily into maximal blocks [begin, i) with every
// in-block parent < begin (= generations, for generational pedigrees);
// unique (sire, dam) families within a block are walked in parallel
// (OpenMP) with thread-local scratch, then sibling F values are filled.
//
// Build: g++ -O3 -fopenmp -shared -fPIC pedigree.cpp -o libjwasped.so
//        (without -fopenmp it runs single-threaded, identical results)

#include <cstddef>
#include <cstdint>
#include <queue>
#include <unordered_map>
#include <vector>

#ifdef _OPENMP
#include <omp.h>
#endif

namespace {

// One Meuwissen-Luo ancestor walk for animal i (known parents). L: caller
// scratch of size n, zeroed on entry and left zeroed on exit. eps > 0
// truncates traversal below path coefficient eps (the truncated node's own
// contribution is still added).
double walk_f(const int64_t* sire, const int64_t* dam, const double* F,
              int64_t i, double eps, std::vector<double>& L,
              std::priority_queue<int64_t>& heap) {
    L[i] = 1.0;
    heap.push(i);
    double f = -1.0;
    while (!heap.empty()) {
        int64_t j = heap.top();
        heap.pop();
        double Lj = L[j];
        if (Lj == 0.0) continue;  // duplicate heap entry already drained
        L[j] = 0.0;
        int64_t sj = sire[j], dj = dam[j];
        double fs = sj >= 0 ? F[sj] : -1.0;
        double fd = dj >= 0 ? F[dj] : -1.0;
        f += Lj * Lj * (0.5 - 0.25 * (fs + fd));
        if (Lj < eps) continue;   // truncate: contribution kept,
                                  // parents not traversed
        // parents have smaller codes, so they are popped after j;
        // accumulate contributions before their single pop
        if (sj >= 0) {
            if (L[sj] == 0.0) heap.push(sj);
            L[sj] += 0.5 * Lj;
        }
        if (dj >= 0) {
            if (L[dj] == 0.0) heap.push(dj);
            L[dj] += 0.5 * Lj;
        }
    }
    return f;
}

}  // namespace

extern "C" {

// sire/dam: 0-based parent codes, -1 = unknown; topological order
// (parent code < child code). F: output inbreeding coefficients.
// eps: ancestor-walk truncation (0 = exact; ~1e-8 bounds the per-animal
// error far below practical significance while capping walk depth).
void jwas_inbreeding_ml_eps(const int64_t* sire, const int64_t* dam,
                            int64_t n, double eps, double* F) {
    // --- block decomposition: [begin, i) with all in-block parents < begin
    std::vector<int64_t> starts;
    starts.push_back(0);
    for (int64_t i = 0; i < n; ++i) {
        int64_t begin = starts.back();
        if ((sire[i] >= begin && sire[i] < i)
            || (dam[i] >= begin && dam[i] < i)) {
            starts.push_back(i);
        }
    }
    starts.push_back(n);

    // full siblings share F: memoize by (sire, dam) across the pedigree
    std::unordered_map<uint64_t, double> fam;
    std::vector<uint64_t> keys;
    std::vector<int64_t> reps;                 // representative animal
    for (size_t b = 0; b + 1 < starts.size(); ++b) {
        int64_t lo = starts[b], hi = starts[b + 1];
        keys.clear();
        reps.clear();
        for (int64_t i = lo; i < hi; ++i) {
            int64_t s = sire[i], d = dam[i];
            if (s < 0 || d < 0) {
                F[i] = 0.0;
                continue;
            }
            uint64_t key = (static_cast<uint64_t>(s + 1) << 32)
                           | static_cast<uint64_t>(d + 1);
            if (fam.find(key) != fam.end()) continue;  // already scheduled
            fam.emplace(key, -2.0);            // placeholder slot
            keys.push_back(key);
            reps.push_back(i);
        }
        const int64_t nu = static_cast<int64_t>(reps.size());
        // persistent per-thread scratch: walk_f leaves L zeroed, so reuse
        // across blocks is safe; reallocating (and re-zeroing) an O(n)
        // buffer per block is quadratic when blocks degenerate to O(1)
        // animals (overlapping-generation pedigrees)
        static thread_local std::vector<double> tl_L;
        static thread_local std::priority_queue<int64_t> tl_heap;
        if (nu <= 64) {
            if (tl_L.size() < static_cast<size_t>(n))
                tl_L.assign(static_cast<size_t>(n), 0.0);
            for (int64_t k = 0; k < nu; ++k) {
                fam.find(keys[k])->second =
                    walk_f(sire, dam, F, reps[k], eps, tl_L, tl_heap);
            }
        } else {
#ifdef _OPENMP
#pragma omp parallel
#endif
            {
                if (tl_L.size() < static_cast<size_t>(n))
                    tl_L.assign(static_cast<size_t>(n), 0.0);
#ifdef _OPENMP
#pragma omp for schedule(dynamic, 16)
#endif
                for (int64_t k = 0; k < nu; ++k) {
                    double f = walk_f(sire, dam, F, reps[k], eps, tl_L,
                                      tl_heap);
                    // distinct pre-inserted keys: value writes do not
                    // touch the map structure, safe concurrently
                    fam.find(keys[k])->second = f;
                }
            }
        }
        for (int64_t i = lo; i < hi; ++i) {
            int64_t s = sire[i], d = dam[i];
            if (s < 0 || d < 0) continue;
            uint64_t key = (static_cast<uint64_t>(s + 1) << 32)
                           | static_cast<uint64_t>(d + 1);
            F[i] = fam.find(key)->second;
        }
    }
}

void jwas_inbreeding_ml(const int64_t* sire, const int64_t* dam, int64_t n,
                        double* F) {
    jwas_inbreeding_ml_eps(sire, dam, n, 0.0, F);
}

}  // extern "C"
