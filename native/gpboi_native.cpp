// gpboi_native: C++ numerical core used as (a) an independent parity
// oracle for the JAX implementation and (b) a fast host-side fallback.
//
// The reference delegates its heavy numerics to native libraries (LAPACK
// via scipy, sklearn's compiled solvers — SURVEY.md section 2); this
// library is the framework's own native analog, implemented from the
// formulas with no BLAS/LAPACK dependency:
//
//   * fused RBF/derivative-kernel Gram assembly
//   * Cholesky factorization / solves
//   * cyclic-Jacobi symmetric eigendecomposition (for the sqrtW root)
//   * GP state/derivative estimation + weight root, end to end
//   * RK4 integration of the SEIRD2 system and of quadratic "cAH" ROMs
//
// Exposed with C linkage for ctypes; all matrices are row-major double.

#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

// ---- dense helpers (row-major) ---------------------------------------------

// In-place Cholesky A = L L^T (lower). Returns 0 on success.
int cholesky(double* A, int64_t n) {
    for (int64_t j = 0; j < n; ++j) {
        double d = A[j * n + j];
        for (int64_t k = 0; k < j; ++k) d -= A[j * n + k] * A[j * n + k];
        if (d <= 0.0 || !std::isfinite(d)) return 1;
        const double ljj = std::sqrt(d);
        A[j * n + j] = ljj;
        for (int64_t i = j + 1; i < n; ++i) {
            double s = A[i * n + j];
            for (int64_t k = 0; k < j; ++k) s -= A[i * n + k] * A[j * n + k];
            A[i * n + j] = s / ljj;
        }
        for (int64_t i = 0; i < j; ++i) A[i * n + j] = 0.0;  // zero upper
    }
    return 0;
}

// Solve L L^T x = b for one right-hand side (b overwritten with x).
void cho_solve_vec(const double* L, int64_t n, double* b) {
    for (int64_t i = 0; i < n; ++i) {
        double s = b[i];
        for (int64_t k = 0; k < i; ++k) s -= L[i * n + k] * b[k];
        b[i] = s / L[i * n + i];
    }
    for (int64_t i = n - 1; i >= 0; --i) {
        double s = b[i];
        for (int64_t k = i + 1; k < n; ++k) s -= L[k * n + i] * b[k];
        b[i] = s / L[i * n + i];
    }
}

// Cyclic Jacobi eigendecomposition of symmetric A (n x n).
// On return: evals[i] ascending, V columns are eigenvectors (row-major).
void jacobi_eigh(const double* A_in, int64_t n, double* evals, double* V) {
    std::vector<double> A(A_in, A_in + n * n);
    for (int64_t i = 0; i < n; ++i)
        for (int64_t j = 0; j < n; ++j) V[i * n + j] = (i == j) ? 1.0 : 0.0;

    const int max_sweeps = 60;
    for (int sweep = 0; sweep < max_sweeps; ++sweep) {
        double off = 0.0;
        for (int64_t p = 0; p < n; ++p)
            for (int64_t q = p + 1; q < n; ++q) off += A[p * n + q] * A[p * n + q];
        if (off < 1e-26 * n * n) break;

        for (int64_t p = 0; p < n - 1; ++p) {
            for (int64_t q = p + 1; q < n; ++q) {
                const double apq = A[p * n + q];
                if (std::fabs(apq) < 1e-300) continue;
                const double app = A[p * n + p], aqq = A[q * n + q];
                const double tau = (aqq - app) / (2.0 * apq);
                const double t = (tau >= 0 ? 1.0 : -1.0) /
                                 (std::fabs(tau) + std::sqrt(1.0 + tau * tau));
                const double c = 1.0 / std::sqrt(1.0 + t * t);
                const double s = t * c;
                for (int64_t k = 0; k < n; ++k) {
                    const double akp = A[k * n + p], akq = A[k * n + q];
                    A[k * n + p] = c * akp - s * akq;
                    A[k * n + q] = s * akp + c * akq;
                }
                for (int64_t k = 0; k < n; ++k) {
                    const double apk = A[p * n + k], aqk = A[q * n + k];
                    A[p * n + k] = c * apk - s * aqk;
                    A[q * n + k] = s * apk + c * aqk;
                }
                for (int64_t k = 0; k < n; ++k) {
                    const double vkp = V[k * n + p], vkq = V[k * n + q];
                    V[k * n + p] = c * vkp - s * vkq;
                    V[k * n + q] = s * vkp + c * vkq;
                }
            }
        }
    }
    for (int64_t i = 0; i < n; ++i) evals[i] = A[i * n + i];

    // Sort ascending (insertion sort on (eval, eigvec-column) pairs).
    for (int64_t i = 1; i < n; ++i) {
        const double ev = evals[i];
        std::vector<double> col(n);
        for (int64_t k = 0; k < n; ++k) col[k] = V[k * n + i];
        int64_t j = i - 1;
        while (j >= 0 && evals[j] > ev) {
            evals[j + 1] = evals[j];
            for (int64_t k = 0; k < n; ++k) V[k * n + j + 1] = V[k * n + j];
            --j;
        }
        evals[j + 1] = ev;
        for (int64_t k = 0; k < n; ++k) V[k * n + j + 1] = col[k];
    }
}

// xorshift64* PRNG — deterministic restart sampling without libc rand.
struct XorShift64 {
    uint64_t s;
    explicit XorShift64(uint64_t seed) : s(seed ? seed : 0x9E3779B97F4A7C15ull) {}
    double uniform() {  // in [0, 1)
        s ^= s >> 12;
        s ^= s << 25;
        s ^= s >> 27;
        return double((s * 0x2545F4914F6CDD1Dull) >> 11) * 0x1.0p-53;
    }
};

// NLML and its analytic gradient in log-hyperparameter space.
// z = (log sigma2, log ell, log chi). O(m^3) via Cholesky + full inverse.
// Returns +1e30 (gradient zeroed) when K is not positive definite.
double nlml_grad_impl(const double* t, int64_t m, const double* y,
                      const double* z, double* grad) {
    const double sigma2 = std::exp(z[0]);
    const double ell = std::exp(z[1]);
    const double chi = std::exp(z[2]);
    const double inv2l2 = 1.0 / (2.0 * ell * ell);
    const double invl2 = 1.0 / (ell * ell);

    std::vector<double> Krbf(m * m), K(m * m), d2(m * m);
    for (int64_t i = 0; i < m; ++i)
        for (int64_t j = 0; j < m; ++j) {
            const double d = t[i] - t[j];
            d2[i * m + j] = d * d;
            const double k = sigma2 * std::exp(-d * d * inv2l2);
            Krbf[i * m + j] = k;
            K[i * m + j] = k + (i == j ? chi : 0.0);
        }
    if (cholesky(K.data(), m)) {
        grad[0] = grad[1] = grad[2] = 0.0;
        return 1e30;
    }
    // alpha = K^{-1} y.
    std::vector<double> alpha(y, y + m);
    cho_solve_vec(K.data(), m, alpha.data());
    // Kinv column by column (K holds L).
    std::vector<double> Kinv(m * m), col(m);
    for (int64_t c = 0; c < m; ++c) {
        for (int64_t j = 0; j < m; ++j) col[j] = (j == c) ? 1.0 : 0.0;
        cho_solve_vec(K.data(), m, col.data());
        for (int64_t j = 0; j < m; ++j) Kinv[j * m + c] = col[j];
    }
    double logdet = 0.0, quad = 0.0;
    for (int64_t i = 0; i < m; ++i) {
        logdet += 2.0 * std::log(K[i * m + i]);
        quad += y[i] * alpha[i];
    }
    const double val =
        0.5 * quad + 0.5 * logdet + 0.5 * double(m) * std::log(2.0 * M_PI);

    // P = Kinv - alpha alpha^T;  dNLML/dz_k = 0.5 sum(P .* dK/dz_k).
    double gs = 0.0, gl = 0.0, gc = 0.0;
    for (int64_t i = 0; i < m; ++i)
        for (int64_t j = 0; j < m; ++j) {
            const double P = Kinv[i * m + j] - alpha[i] * alpha[j];
            gs += P * Krbf[i * m + j];
            gl += P * Krbf[i * m + j] * d2[i * m + j] * invl2;
            if (i == j) gc += P;
        }
    grad[0] = 0.5 * gs;
    grad[1] = 0.5 * gl;
    grad[2] = 0.5 * chi * gc;
    return val;
}

// Projected L-BFGS (two-loop recursion, history 8, Armijo backtracking,
// box projection) minimizing the NLML over log-hyperparameters in
// [lo, hi]. Returns the final NLML; z holds the minimizer.
double lbfgs_box_min(const double* t, int64_t m, const double* y,
                     const double* lo, const double* hi, double* z) {
    constexpr int N = 3, HIST = 8, MAXIT = 200;
    auto project = [&](double* v) {
        for (int i = 0; i < N; ++i) {
            if (v[i] < lo[i]) v[i] = lo[i];
            if (v[i] > hi[i]) v[i] = hi[i];
        }
    };
    project(z);
    double g[N];
    double f = nlml_grad_impl(t, m, y, z, g);

    double S[HIST][N], Yv[HIST][N], rho[HIST];
    int nh = 0, head = 0;

    for (int it = 0; it < MAXIT; ++it) {
        // Projected-gradient convergence test.
        double pg = 0.0;
        for (int i = 0; i < N; ++i) {
            double zi = z[i] - g[i];
            if (zi < lo[i]) zi = lo[i];
            if (zi > hi[i]) zi = hi[i];
            pg = std::max(pg, std::fabs(zi - z[i]));
        }
        if (pg < 1e-9 * std::max(1.0, std::fabs(f))) break;

        // Two-loop recursion for the quasi-Newton direction.
        double q[N] = {g[0], g[1], g[2]}, a[HIST];
        for (int k = nh - 1; k >= 0; --k) {
            const int idx = (head - nh + k + 2 * HIST) % HIST;
            double sq = 0.0;
            for (int i = 0; i < N; ++i) sq += S[idx][i] * q[i];
            a[k] = rho[idx] * sq;
            for (int i = 0; i < N; ++i) q[i] -= a[k] * Yv[idx][i];
        }
        if (nh > 0) {
            const int last = (head - 1 + HIST) % HIST;
            double yy = 0.0, sy = 0.0;
            for (int i = 0; i < N; ++i) {
                yy += Yv[last][i] * Yv[last][i];
                sy += S[last][i] * Yv[last][i];
            }
            const double gamma = (yy > 0.0) ? sy / yy : 1.0;
            for (int i = 0; i < N; ++i) q[i] *= gamma;
        }
        for (int k = 0; k < nh; ++k) {
            const int idx = (head - nh + k + 2 * HIST) % HIST;
            double yq = 0.0;
            for (int i = 0; i < N; ++i) yq += Yv[idx][i] * q[i];
            const double b = rho[idx] * yq;
            for (int i = 0; i < N; ++i) q[i] += S[idx][i] * (a[k] - b);
        }
        double dir[N];
        double gd = 0.0;
        for (int i = 0; i < N; ++i) {
            dir[i] = -q[i];
            gd += g[i] * dir[i];
        }
        if (!(gd < 0.0)) {  // not a descent direction — steepest descent
            gd = 0.0;
            for (int i = 0; i < N; ++i) {
                dir[i] = -g[i];
                gd -= g[i] * g[i];
            }
            if (gd == 0.0) break;
        }

        // Armijo backtracking with projection.
        double step = 1.0, z_new[N], g_new[N], f_new = f;
        bool ok = false;
        for (int ls = 0; ls < 30; ++ls) {
            for (int i = 0; i < N; ++i) z_new[i] = z[i] + step * dir[i];
            project(z_new);
            f_new = nlml_grad_impl(t, m, y, z_new, g_new);
            double desc = 0.0;
            for (int i = 0; i < N; ++i) desc += g[i] * (z_new[i] - z[i]);
            if (f_new <= f + 1e-4 * desc && std::isfinite(f_new)) {
                ok = true;
                break;
            }
            step *= 0.5;
        }
        if (!ok) break;

        // Curvature update.
        double s_vec[N], y_vec[N], sy = 0.0;
        for (int i = 0; i < N; ++i) {
            s_vec[i] = z_new[i] - z[i];
            y_vec[i] = g_new[i] - g[i];
            sy += s_vec[i] * y_vec[i];
        }
        if (sy > 1e-12) {
            for (int i = 0; i < N; ++i) {
                S[head][i] = s_vec[i];
                Yv[head][i] = y_vec[i];
            }
            rho[head] = 1.0 / sy;
            head = (head + 1) % HIST;
            if (nh < HIST) ++nh;
        }
        for (int i = 0; i < N; ++i) {
            z[i] = z_new[i];
            g[i] = g_new[i];
        }
        f = f_new;
    }
    return f;
}

}  // namespace

extern "C" {

// Exact NLML + analytic gradient in log-hyperparameter space.
double gpboi_nlml_grad(const double* t, int64_t m, const double* y,
                       const double* logparams, double* grad_out) {
    return nlml_grad_impl(t, m, y, logparams, grad_out);
}

// Independent GP hyperparameter fit: 1 + n_restarts projected-L-BFGS runs
// on the exact NLML (restart 0 from the kernel default (1,1,1) projected
// into bounds, the rest log-uniform — the sklearn schedule the reference
// uses, codebase/gpkernels.py:302-308). Bounds are in natural units;
// returns the best NLML; best_params holds (sigma2, ell, chi).
double gpboi_fit_gp(const double* t, int64_t m, const double* y,
                    const double* lo_nat, const double* hi_nat,
                    int64_t n_restarts, uint64_t seed, double* best_params) {
    double lo[3], hi[3];
    for (int i = 0; i < 3; ++i) {
        lo[i] = std::log(lo_nat[i]);
        hi[i] = std::log(hi_nat[i]);
    }
    XorShift64 rng(seed);
    double best_f = 1e300, best_z[3] = {0, 0, 0};
    for (int64_t rst = 0; rst <= n_restarts; ++rst) {
        double z[3];
        if (rst == 0) {
            for (int i = 0; i < 3; ++i)
                z[i] = std::min(std::max(0.0, lo[i]), hi[i]);
        } else {
            for (int i = 0; i < 3; ++i)
                z[i] = lo[i] + (hi[i] - lo[i]) * rng.uniform();
        }
        const double f = lbfgs_box_min(t, m, y, lo, hi, z);
        if (f < best_f) {
            best_f = f;
            for (int i = 0; i < 3; ++i) best_z[i] = z[i];
        }
    }
    for (int i = 0; i < 3; ++i) best_params[i] = std::exp(best_z[i]);
    return best_f;
}

// Fused assembly of K_yy (m x m), kappa_zy (mp x m), K_zy (mp x m),
// K_zz (mp x mp) for the RBF+white kernel.
void gpboi_kernel_matrices(const double* t, int64_t m, const double* te,
                           int64_t mp, double sigma2, double ell, double chi,
                           double* Kyy, double* kzy, double* Kzy, double* Kzz) {
    const double inv2l2 = 1.0 / (2.0 * ell * ell);
    const double invl2 = 1.0 / (ell * ell);
    for (int64_t i = 0; i < m; ++i)
        for (int64_t j = 0; j < m; ++j) {
            const double d = t[i] - t[j];
            Kyy[i * m + j] = sigma2 * std::exp(-d * d * inv2l2) +
                             (i == j ? chi : 0.0);
        }
    for (int64_t i = 0; i < mp; ++i)
        for (int64_t j = 0; j < m; ++j) {
            const double d = te[i] - t[j];
            const double k = sigma2 * std::exp(-d * d * inv2l2);
            kzy[i * m + j] = k;
            Kzy[i * m + j] = -d * k * invl2;
        }
    for (int64_t i = 0; i < mp; ++i)
        for (int64_t j = 0; j < mp; ++j) {
            const double d = te[i] - te[j];
            const double k = sigma2 * std::exp(-d * d * inv2l2);
            Kzz[i * mp + j] = (1.0 - d * d * invl2) * k * invl2;
        }
}

// Full GP estimation: state/ddt estimates, ddt covariance, sqrtW.
// Returns 0 on success, 1 on Cholesky failure, 2 when (C + eta I) is not
// positive definite (the reference's "increase eta" condition).
int gpboi_gp_estimates(const double* t, int64_t m, const double* y,
                       const double* te, int64_t mp, double sigma2, double ell,
                       double chi, double eta, double* state, double* ddt,
                       double* C_out, double* sqrtW) {
    std::vector<double> Kyy(m * m), kzy(mp * m), Kzy(mp * m), Kzz(mp * mp);
    gpboi_kernel_matrices(t, m, te, mp, sigma2, ell, chi, Kyy.data(),
                          kzy.data(), Kzy.data(), Kzz.data());
    if (cholesky(Kyy.data(), m)) return 1;

    std::vector<double> alpha(y, y + m);
    cho_solve_vec(Kyy.data(), m, alpha.data());
    for (int64_t i = 0; i < mp; ++i) {
        double s1 = 0.0, s2 = 0.0;
        for (int64_t j = 0; j < m; ++j) {
            s1 += kzy[i * m + j] * alpha[j];
            s2 += Kzy[i * m + j] * alpha[j];
        }
        state[i] = s1;
        ddt[i] = s2;
    }

    // W = Kyy^{-1} Kzy^T column by column; cross = Kzy * W.
    std::vector<double> Wcol(m), cross(mp * mp);
    std::vector<double> Kinv_KzyT(m * mp);
    for (int64_t c = 0; c < mp; ++c) {
        for (int64_t j = 0; j < m; ++j) Wcol[j] = Kzy[c * m + j];
        cho_solve_vec(Kyy.data(), m, Wcol.data());
        for (int64_t j = 0; j < m; ++j) Kinv_KzyT[j * mp + c] = Wcol[j];
    }
    for (int64_t i = 0; i < mp; ++i)
        for (int64_t j = 0; j < mp; ++j) {
            double s = 0.0;
            for (int64_t k = 0; k < m; ++k)
                s += Kzy[i * m + k] * Kinv_KzyT[k * mp + j];
            cross[i * mp + j] = s;
        }
    for (int64_t i = 0; i < mp; ++i)
        for (int64_t j = 0; j < mp; ++j)
            C_out[i * mp + j] =
                Kzz[i * mp + j] - 0.5 * (cross[i * mp + j] + cross[j * mp + i]);

    std::vector<double> Creg(C_out, C_out + mp * mp);
    for (int64_t i = 0; i < mp; ++i) Creg[i * mp + i] += eta;
    std::vector<double> evals(mp), V(mp * mp);
    jacobi_eigh(Creg.data(), mp, evals.data(), V.data());
    for (int64_t i = 0; i < mp; ++i)
        if (evals[i] <= 0.0) return 2;
    for (int64_t i = 0; i < mp; ++i)
        for (int64_t j = 0; j < mp; ++j) {
            double s = 0.0;
            for (int64_t k = 0; k < mp; ++k)
                s += V[i * mp + k] * V[j * mp + k] / std::sqrt(evals[k]);
            sqrtW[i * mp + j] = s;
        }
    return 0;
}

// RK4 integration of the SEIRD2 system (5 states, 4 parameters).
void gpboi_seird2_solve(const double* p, const double* q0, const double* t,
                        int64_t k, int64_t substeps, double* out) {
    double q[5];
    std::memcpy(q, q0, 5 * sizeof(double));
    for (int64_t j = 0; j < 5; ++j) out[j * k] = q[j];

    auto rhs = [&](const double* s, double* d) {
        const double SI = s[0] * s[2];
        d[0] = -p[0] * SI;
        d[1] = p[0] * SI - p[1] * s[1];
        d[3] = p[2] * s[2];
        d[4] = p[3] * s[2];
        d[2] = p[1] * s[1] - d[3] - d[4];
    };

    double k1[5], k2[5], k3[5], k4[5], tmp[5];
    for (int64_t i = 1; i < k; ++i) {
        const double h = (t[i] - t[i - 1]) / substeps;
        for (int64_t s = 0; s < substeps; ++s) {
            rhs(q, k1);
            for (int j = 0; j < 5; ++j) tmp[j] = q[j] + 0.5 * h * k1[j];
            rhs(tmp, k2);
            for (int j = 0; j < 5; ++j) tmp[j] = q[j] + 0.5 * h * k2[j];
            rhs(tmp, k3);
            for (int j = 0; j < 5; ++j) tmp[j] = q[j] + h * k3[j];
            rhs(tmp, k4);
            for (int j = 0; j < 5; ++j)
                q[j] += (h / 6.0) * (k1[j] + 2 * k2[j] + 2 * k3[j] + k4[j]);
        }
        for (int64_t j = 0; j < 5; ++j) out[j * k + i] = q[j];
    }
}

// RK4 integration of a quadratic "cAH" ROM: dq/dt = c + A q + H ckron(q).
// Ohat is (r, d) row-major with d = 1 + r + r(r+1)/2; ckron ordering is
// (i, j<=i) grouped by i (matching the Python feature map).
void gpboi_rom_cah_solve(const double* Ohat, int64_t r, const double* q0,
                         const double* t, int64_t k, int64_t substeps,
                         double* out) {
    const int64_t d = 1 + r + r * (r + 1) / 2;
    std::vector<double> q(q0, q0 + r), k1(r), k2(r), k3(r), k4(r), tmp(r);
    std::vector<double> feats(d);
    for (int64_t j = 0; j < r; ++j) out[j * k] = q[j];

    auto rhs = [&](const double* s, double* dq) {
        feats[0] = 1.0;
        for (int64_t i = 0; i < r; ++i) feats[1 + i] = s[i];
        int64_t pos = 1 + r;
        for (int64_t i = 0; i < r; ++i)
            for (int64_t j = 0; j <= i; ++j) feats[pos++] = s[i] * s[j];
        for (int64_t row = 0; row < r; ++row) {
            double acc = 0.0;
            for (int64_t c = 0; c < d; ++c) acc += Ohat[row * d + c] * feats[c];
            dq[row] = acc;
        }
    };

    for (int64_t i = 1; i < k; ++i) {
        const double h = (t[i] - t[i - 1]) / substeps;
        for (int64_t s = 0; s < substeps; ++s) {
            rhs(q.data(), k1.data());
            for (int64_t j = 0; j < r; ++j) tmp[j] = q[j] + 0.5 * h * k1[j];
            rhs(tmp.data(), k2.data());
            for (int64_t j = 0; j < r; ++j) tmp[j] = q[j] + 0.5 * h * k2[j];
            rhs(tmp.data(), k3.data());
            for (int64_t j = 0; j < r; ++j) tmp[j] = q[j] + h * k3[j];
            rhs(tmp.data(), k4.data());
            for (int64_t j = 0; j < r; ++j) {
                q[j] += (h / 6.0) * (k1[j] + 2 * k2[j] + 2 * k3[j] + k4[j]);
                if (q[j] > 1e18) q[j] = 1e18;
                if (q[j] < -1e18) q[j] = -1e18;
            }
        }
        for (int64_t j = 0; j < r; ++j) out[j * k + i] = q[j];
    }
}

int gpboi_version() { return 1; }

}  // extern "C"
