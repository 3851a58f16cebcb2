// Pedigree inbreeding — native host-side kernel for the pedigree engine.
//
// Meuwissen & Luo (1992) inbreeding for a topologically coded pedigree
// (parents precede offspring). Equivalent math to the Python implementation
// in jwas_tpu/io/pedigree.py (_inbreeding_meuwissen_luo) and to the
// reference's memoised recursion (reference:
// src/2.PedModule/src/PedModule.jl:117-165) — rewritten in C++ because the
// per-animal ancestor walk is a scalar pointer chase (dict + heap in
// Python), ~30x slower than the array version below; at the 500k-animal
// single-step flagship the Python pass alone costs ~10 minutes.
//
// Build: g++ -O3 -shared -fPIC pedigree.cpp -o libjwasped.so

#include <cstdint>
#include <queue>
#include <unordered_map>
#include <vector>

extern "C" {

// sire/dam: 0-based parent codes, -1 = unknown; topological order
// (parent code < child code). F: output inbreeding coefficients.
void jwas_inbreeding_ml(const int64_t* sire, const int64_t* dam, int64_t n,
                        double* F) {
    std::vector<double> L(n, 0.0);
    std::priority_queue<int64_t> heap;
    // full siblings share F regardless of ordering: memoize by (sire, dam)
    std::unordered_map<uint64_t, double> fam;
    for (int64_t i = 0; i < n; ++i) {
        int64_t s = sire[i], d = dam[i];
        if (s < 0 || d < 0) {
            F[i] = 0.0;
            continue;
        }
        uint64_t key = (static_cast<uint64_t>(s + 1) << 32)
                       | static_cast<uint64_t>(d + 1);
        auto it = fam.find(key);
        if (it != fam.end()) {
            F[i] = it->second;
            continue;
        }
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
        F[i] = f;
        fam.emplace(key, f);
    }
}

}  // extern "C"
