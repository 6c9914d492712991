// Driver that regenerates every reference-binary oracle this repo pins:
// the iteration counts in tests/test_reference_parity.py and the CPU
// timings in bench_baseline.json.  Build + run via
// profiling/make_reference_counts.sh.
//
// This is USER-side code in the style of the reference's own sample
// programs (sample1.cpp:40-60 callback style, sample4.cpp:31-61 binary
// reader layout, sample6.cpp:194-195 complex parameters): it links the
// reference library built unmodified from /root/reference/src/lib (native
// backend) and drives its own lcg_solver / clcg_solver on the shipped
// data/case_* systems.
//
// Workloads (matching the pinned oracles):
//   1. data/case_10K_A, epsilon=1e-12 relative (squared-norm-ratio rule,
//      lcg.cpp:208-209): CG / CGS / BICGSTAB / BICGSTAB2 counts + CG wall.
//   2. data/case_1K_cA, epsilon=1e-6 abs_diff (sample4.cpp:166-168):
//      BICG / BICG_SYM / CGS / BICGSTAB / TFQMR counts.
//   3. data/case_10K_cA, epsilon=1e-6 abs_diff (sample6.cpp:194-195):
//      same five native methods + walls.  (The reference's sample6 also
//      runs Jacobi-PCG/PBICG, but those live only in the Eigen backend,
//      clcg_eigen.cpp:577-801; Eigen3 is not installed on this host.)
//   4. BASELINE.md scaling config: 3-D 7-point Laplacian 128^3, matrix-free
//      OpenMP stencil callback, CG fixed at 100 iterations (wall only).
//
// Iteration counts are measured with OMP_NUM_THREADS=1 (deterministic
// reduction order); walls use the best thread count per workload, as
// recorded in bench_baseline.json.

#include <algorithm>
#include <chrono>
#include <complex>
#include <cstdio>
#include <cstring>
#include <fstream>
#include <string>
#include <vector>

#include "lcg.h"
#include "clcg.h"

#ifdef _OPENMP
#include "omp.h"
#endif

// ---------------------------------------------------------------------------
// Shipped binary format (data/README:1-11): [int32 N][int32 nz]
// ([int32 row][int32 col][value])*nz ([value])*N ; value = double (real
// cases) or interleaved double re,im (complex cases).
// ---------------------------------------------------------------------------

struct RealSys {
    int n = 0, nz = 0;
    std::vector<int> row, col;
    std::vector<double> val, b;
};

struct CplxSys {
    int n = 0, nz = 0;
    std::vector<int> row, col;
    std::vector<std::complex<double>> val, b;
};

static RealSys read_real(const std::string &path) {
    std::ifstream in(path, std::ios::binary);
    if (!in) { std::fprintf(stderr, "cannot open %s\n", path.c_str()); std::exit(2); }
    RealSys s;
    in.read((char *)&s.n, sizeof(int));
    in.read((char *)&s.nz, sizeof(int));
    s.row.resize(s.nz); s.col.resize(s.nz); s.val.resize(s.nz); s.b.resize(s.n);
    for (int i = 0; i < s.nz; ++i) {
        in.read((char *)&s.row[i], sizeof(int));
        in.read((char *)&s.col[i], sizeof(int));
        in.read((char *)&s.val[i], sizeof(double));
    }
    in.read((char *)s.b.data(), sizeof(double) * s.n);
    return s;
}

static CplxSys read_cplx(const std::string &path) {
    std::ifstream in(path, std::ios::binary);
    if (!in) { std::fprintf(stderr, "cannot open %s\n", path.c_str()); std::exit(2); }
    CplxSys s;
    in.read((char *)&s.n, sizeof(int));
    in.read((char *)&s.nz, sizeof(int));
    s.row.resize(s.nz); s.col.resize(s.nz); s.val.resize(s.nz); s.b.resize(s.n);
    std::complex<double> c;
    for (int i = 0; i < s.nz; ++i) {
        in.read((char *)&s.row[i], sizeof(int));
        in.read((char *)&s.col[i], sizeof(int));
        in.read((char *)&c, sizeof(c));
        s.val[i] = c;
    }
    for (int i = 0; i < s.n; ++i) { in.read((char *)&c, sizeof(c)); s.b[i] = c; }
    return s;
}

// ---------------------------------------------------------------------------
// Callbacks (the reference's lcg_axfunc_ptr / clcg_axfunc_ptr contracts,
// lcg.h:37-38 and clcg.h:40-41).
// ---------------------------------------------------------------------------

struct Ctx {
    const RealSys *rs = nullptr;
    const CplxSys *cs = nullptr;
    int grid = 0;        // Laplacian stencil size (grid^3 unknowns)
    int last_t = 0;      // final progress-callback iteration count
};

static void real_coo_ax(void *inst, const lcg_float *x, lcg_float *ax,
                        const int n) {
    Ctx *c = (Ctx *)inst;
    // The library's own COO SpMV (algebra.cpp:195-222), as a sample would.
    lcg_matvec_coo(c->rs->row.data(), c->rs->col.data(), c->rs->val.data(),
                   x, ax, n, n, c->rs->nz);
}

// Complex COO SpMV honoring the (layout, conjugate) operator modes
// (lcg_complex.h:310-327); the native backend ships only a dense complex
// matvec, so the sparse product is user code here, exactly as the CUDA
// samples supply cusparseSpMV.
static void cplx_coo_ax(void *inst, const lcg_complex *x, lcg_complex *ax,
                        const int n, lcg_matrix_e layout,
                        clcg_complex_e conjugate) {
    Ctx *c = (Ctx *)inst;
    for (int i = 0; i < n; ++i) ax[i] = lcg_complex(0.0, 0.0);
    const int nz = c->cs->nz;
    const int *row = c->cs->row.data();
    const int *col = c->cs->col.data();
    const std::complex<double> *val = c->cs->val.data();
    for (int k = 0; k < nz; ++k) {
        std::complex<double> v = val[k];
        if (conjugate == Conjugate) v = std::conj(v);
        int r = row[k], cc = col[k];
        if (layout == MatTranspose) std::swap(r, cc);
        ax[r] += v * x[cc];
    }
}

// Matrix-free 7-point Laplacian on a grid^3 lattice (diag 6, -1 to each
// in-bounds neighbor; nnz = 7n - 6*grid^2 = 14,581,760 at 128^3) — the
// BASELINE.md scaling workload.
static void laplacian_ax(void *inst, const lcg_float *x, lcg_float *ax,
                         const int n) {
    Ctx *c = (Ctx *)inst;
    const int g = c->grid, g2 = g * g;
#ifdef _OPENMP
#pragma omp parallel for schedule(static)
#endif
    for (int i = 0; i < n; ++i) {
        const int iz = i / g2, iy = (i / g) % g, ix = i % g;
        double v = 6.0 * x[i];
        if (ix > 0) v -= x[i - 1];
        if (ix < g - 1) v -= x[i + 1];
        if (iy > 0) v -= x[i - g];
        if (iy < g - 1) v -= x[i + g];
        if (iz > 0) v -= x[i - g2];
        if (iz < g - 1) v -= x[i + g2];
        ax[i] = v;
    }
}

static int real_progress(void *inst, const lcg_float *, const lcg_float,
                         const lcg_para *, const int, const int k) {
    ((Ctx *)inst)->last_t = k;
    return 0;
}

static int cplx_progress(void *inst, const lcg_complex *, const lcg_float,
                         const clcg_para *, const int, const int k) {
    ((Ctx *)inst)->last_t = k;
    return 0;
}

// ---------------------------------------------------------------------------

static double now_ms() {
    using clk = std::chrono::steady_clock;
    return std::chrono::duration<double, std::milli>(
               clk::now().time_since_epoch())
        .count();
}

struct RunOut { int iterations; double best_ms; int ret; };

static RunOut run_real(const RealSys &sys, lcg_solver_enum id, double eps,
                       int abs_diff, int reps, lcg_axfunc_ptr ax, int grid) {
    Ctx ctx; ctx.rs = &sys; ctx.grid = grid;
    lcg_para p = lcg_default_parameters();
    p.epsilon = eps;
    p.abs_diff = abs_diff;
    p.max_iterations = grid ? 100 : 50000;  // Laplacian: fixed 100 iters
    std::vector<double> m(sys.n);
    RunOut out{0, 1e30, 0};
    for (int r = 0; r < reps; ++r) {
        std::fill(m.begin(), m.end(), 0.0);
        ctx.last_t = 0;
        const double t0 = now_ms();
        out.ret = lcg_solver(ax, real_progress, m.data(), sys.b.data(),
                             sys.n, &p, &ctx, id);
        out.best_ms = std::min(out.best_ms, now_ms() - t0);
        out.iterations = ctx.last_t;
    }
    return out;
}

static RunOut run_cplx(const CplxSys &sys, clcg_solver_enum id, double eps,
                       int abs_diff, int reps) {
    Ctx ctx; ctx.cs = &sys;
    clcg_para p = clcg_default_parameters();
    p.epsilon = eps;
    p.abs_diff = abs_diff;
    p.max_iterations = 50000;
    std::vector<lcg_complex> m(sys.n);
    RunOut out{0, 1e30, 0};
    for (int r = 0; r < reps; ++r) {
        std::fill(m.begin(), m.end(), lcg_complex(0.0, 0.0));
        ctx.last_t = 0;
        const double t0 = now_ms();
        out.ret = clcg_solver(cplx_coo_ax, cplx_progress, m.data(),
                              sys.b.data(), sys.n, &p, &ctx, id);
        out.best_ms = std::min(out.best_ms, now_ms() - t0);
        out.iterations = ctx.last_t;
    }
    return out;
}

static void set_threads(int nt) {
#ifdef _OPENMP
    omp_set_num_threads(nt);
#else
    (void)nt;
#endif
}

int main(int argc, char **argv) {
    const std::string data = argc > 1 ? argv[1] : "/root/reference/data";
    const bool quick = argc > 2 && std::string(argv[2]) == "--quick";
    const int reps = quick ? 1 : 3;

    const RealSys r10k = read_real(data + "/case_10K_A");
    const CplxSys c1k = read_cplx(data + "/case_1K_cA");
    const CplxSys c10k = read_cplx(data + "/case_10K_cA");

    std::printf("{\n");

    // --- real case_10K, eps=1e-12 relative ------------------------------
    // Counts single-threaded (deterministic reduction order); the CG wall
    // is also fastest at 1 thread (bench_baseline.json note: the COO SpMV
    // loop is serial; OpenMP covers only the axpy updates).
    set_threads(1);
    struct { const char *name; lcg_solver_enum id; } rmethods[] = {
        {"cg", LCG_CG}, {"cgs", LCG_CGS},
        {"bicgstab", LCG_BICGSTAB}, {"bicgstab2", LCG_BICGSTAB2},
    };
    std::printf("  \"real_case10k_eps1e-12\": {\n");
    for (size_t i = 0; i < 4; ++i) {
        RunOut o = run_real(r10k, rmethods[i].id, 1e-12, 0, reps,
                            real_coo_ax, 0);
        std::printf("    \"%s\": {\"iterations\": %d, \"best_ms\": %.3f, "
                    "\"ret\": %d}%s\n",
                    rmethods[i].name, o.iterations, o.best_ms, o.ret,
                    i + 1 < 4 ? "," : "");
    }
    std::printf("  },\n");

    // --- complex cases, eps=1e-6 abs_diff -------------------------------
    struct { const char *name; clcg_solver_enum id; } cmethods[] = {
        {"bicg", CLCG_BICG}, {"bicg_sym", CLCG_BICG_SYM},
        {"cgs", CLCG_CGS}, {"bicgstab", CLCG_BICGSTAB},
        {"tfqmr", CLCG_TFQMR},
    };
    const struct { const char *key; const CplxSys *sys; } ccases[] = {
        {"complex_case1k_eps1e-6_absdiff", &c1k},
        {"complex_case10k_eps1e-6_absdiff", &c10k},
    };
    for (int cc = 0; cc < 2; ++cc) {
        std::printf("  \"%s\": {\n", ccases[cc].key);
        for (size_t i = 0; i < 5; ++i) {
            RunOut o = run_cplx(*ccases[cc].sys, cmethods[i].id, 1e-6, 1,
                                reps);
            std::printf("    \"%s\": {\"iterations\": %d, \"best_ms\": %.3f, "
                        "\"ret\": %d}%s\n",
                        cmethods[i].name, o.iterations, o.best_ms, o.ret,
                        i + 1 < 5 ? "," : "");
        }
        std::printf("  },\n");
    }

    // --- Laplacian 128^3 CG x100 (BASELINE.md scaling config) -----------
    if (!quick) {
        set_threads(4);
        RealSys lap;
        const int g = 128;
        lap.n = g * g * g;
        lap.b.assign(lap.n, 1.0);
        RunOut o = run_real(lap, LCG_CG, 1e-30, 0, 3, laplacian_ax, g);
        std::printf("  \"laplacian128_cg100\": {\"grid\": %d, \"n\": %d, "
                    "\"nnz\": %lld, \"iterations\": %d, \"best_ms\": %.1f, "
                    "\"threads\": 4},\n",
                    g, lap.n,
                    7LL * lap.n - 6LL * g * g, o.iterations, o.best_ms);
    }

    std::printf("  \"count_threads\": 1,\n");
    std::printf("  \"quick\": %s\n", quick ? "true" : "false");
    std::printf("}\n");
    return 0;
}
