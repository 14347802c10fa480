// Native layer-pair edge enumeration for geometric graph building.
//
// Replaces the hot O(n1*n2) pandas cross-join + cuts of the reference's
// GraphBuilder.select_edges (reference graph_construction/graph_builder.py:162-227,
// ~25% of preprocessing time per its own profile comments). OpenMP-parallel
// with static scheduling (contiguous per-thread ranges), so the output order
// is deterministic: sorted by position in idx1, then idx2.
//
// Build: g++ -O3 -fopenmp -shared -fPIC edge_join.cpp -o libedgejoin.so
//
// API (ctypes-friendly, handle-based to avoid recomputation):
//   h = select_edges_run(...)        -> opaque handle
//   n = select_edges_count(h)
//   select_edges_copy(h, out...)     -> copies results, frees handle

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <vector>

#ifdef _OPENMP
#include <omp.h>
#endif

namespace {

constexpr double kPi = 3.14159265358979323846;

inline double calc_dphi(double phi1, double phi2) {
  double dphi = phi2 - phi1;
  if (dphi > kPi) dphi -= 2 * kPi;
  if (dphi < -kPi) dphi += 2 * kPi;
  return dphi;
}

inline double calc_eta(double r, double z) {
  double theta = std::atan2(r, z);
  return -std::log(std::tan(theta / 2.0));
}

struct EdgeResult {
  std::vector<int64_t> i1, i2;
  std::vector<double> dr, dphi, dz, dR;
};

}  // namespace

extern "C" {

void* select_edges_run(
    const int64_t* idx1, int64_t n1, const int64_t* idx2, int64_t n2,
    const double* r, const double* phi, const double* z,
    double phi_slope_max, double z0_max, double dR_max,
    int apply_intersect, double intersect_layer_r, double intersect_z_bound) {
  int n_threads = 1;
#ifdef _OPENMP
  n_threads = omp_get_max_threads();
#endif
  std::vector<EdgeResult> bufs(n_threads);

#pragma omp parallel num_threads(n_threads)
  {
    int tid = 0;
#ifdef _OPENMP
    tid = omp_get_thread_num();
#endif
    EdgeResult& buf = bufs[tid];
    // contiguous static partition keeps global output order deterministic
    const int64_t chunk = (n1 + n_threads - 1) / n_threads;
    const int64_t lo = tid * chunk;
    const int64_t hi = std::min(n1, lo + chunk);
    for (int64_t a = lo; a < hi; ++a) {
      const int64_t i = idx1[a];
      const double r1 = r[i], phi1 = phi[i], z1 = z[i];
      const double eta1 = calc_eta(r1, z1);
      for (int64_t b = 0; b < n2; ++b) {
        const int64_t j = idx2[b];
        const double dr_ = r[j] - r1;
        const double dphi_ = calc_dphi(phi1, phi[j]);
        const double dz_ = z[j] - z1;
        const double deta = calc_eta(r[j], z[j]) - eta1;
        const double dR_ = std::sqrt(deta * deta + dphi_ * dphi_);
        const double phi_slope = dphi_ / dr_;
        const double z0 = z1 - r1 * dz_ / dr_;
        bool good = std::abs(phi_slope) < phi_slope_max &&
                    std::abs(z0) < z0_max && dR_ < dR_max;
        if (good && apply_intersect) {
          const double z_coord = intersect_layer_r * dz_ / dr_ + z0;
          if (z_coord > -intersect_z_bound && z_coord < intersect_z_bound)
            good = false;
        }
        if (good) {
          buf.i1.push_back(i);
          buf.i2.push_back(j);
          buf.dr.push_back(dr_);
          buf.dphi.push_back(dphi_);
          buf.dz.push_back(dz_);
          buf.dR.push_back(dR_);
        }
      }
    }
  }

  auto* result = new EdgeResult();
  size_t total = 0;
  for (auto& buf : bufs) total += buf.i1.size();
  result->i1.reserve(total);
  for (auto& buf : bufs) {
    result->i1.insert(result->i1.end(), buf.i1.begin(), buf.i1.end());
    result->i2.insert(result->i2.end(), buf.i2.begin(), buf.i2.end());
    result->dr.insert(result->dr.end(), buf.dr.begin(), buf.dr.end());
    result->dphi.insert(result->dphi.end(), buf.dphi.begin(), buf.dphi.end());
    result->dz.insert(result->dz.end(), buf.dz.begin(), buf.dz.end());
    result->dR.insert(result->dR.end(), buf.dR.begin(), buf.dR.end());
  }
  return result;
}

int64_t select_edges_count(void* handle) {
  return static_cast<int64_t>(static_cast<EdgeResult*>(handle)->i1.size());
}

void select_edges_copy(
    void* handle, int64_t* out_i1, int64_t* out_i2, double* out_dr,
    double* out_dphi, double* out_dz, double* out_dR) {
  auto* res = static_cast<EdgeResult*>(handle);
  const int64_t n = static_cast<int64_t>(res->i1.size());
  for (int64_t t = 0; t < n; ++t) {
    out_i1[t] = res->i1[t];
    out_i2[t] = res->i2[t];
    out_dr[t] = res->dr[t];
    out_dphi[t] = res->dphi[t];
    out_dz[t] = res->dz[t];
    out_dR[t] = res->dR[t];
  }
  delete res;
}

}  // extern "C"
