/* Distributed C-ABI demo: block-cyclic Hermitian + distributed pseudo
 * (BSE) solves through the reference-compatible p*chase_* entry points
 * (reference analogue: examples/4_interface 4_c_dist_chase.c).
 *
 * Build:  cc c_dist_interface_demo.c -L<libdir> -lchase_tpu -lm
 * Run with CHASE_TPU_PLATFORM=cpu and
 *          XLA_FLAGS=--xla_force_host_platform_device_count=8
 * so the embedded runtime exposes a 2x2 device mesh.
 */
#include <complex.h>
#include <math.h>
#include <stdio.h>
#include <stdlib.h>

void pdchase_init_blockcyclic_(int* N, int* nev, int* nex, int* mbsize,
                               int* nbsize, double* H, int* ldh, double* V,
                               double* ritzv, int* dim0, int* dim1,
                               char* grid_major, int* irsrc, int* icsrc,
                               void* comm, int* init);
void pdchase_(int* deg, double* tol, char* mode, char* opt, char* qr);
void pdchase_get_eigenpairs_(double* V, int* ld, double* ritzv);
void pdchase_finalize_(int* flag);

void pzchase_init_pseudo_(int* N, int* nev, int* nex, int* m, int* n,
                          double _Complex* H, int* ldh, double _Complex* V,
                          double* ritzv, int* dim0, int* dim1,
                          char* grid_major, void* comm, int* init);
void pzchase_(int* deg, double* tol, char* mode, char* opt, char* qr);
void pzchase_get_eigenpairs_(double _Complex* V, int* ld, double* ritzv);
void pzchase_finalize_(int* flag);

static int test_blockcyclic(void) {
    int N = 64, nev = 6, nex = 6, mb = 8, dim0 = 2, dim1 = 2;
    int ldh = N, irsrc = 0, icsrc = 0, init = 0, deg = 10, flag = 0;
    char major = 'R';
    double tol = 1e-10;
    char mode = 'R', opt = 'S', qr = 'C';
    double* H = calloc((size_t)N * N, sizeof(double));
    double* V = calloc((size_t)N * (nev + nex), sizeof(double));
    double* ritzv = calloc(nev + nex, sizeof(double));
    /* Clement matrix: exact spectrum -(N-1), -(N-3), ... (column-major) */
    for (int i = 0; i < N - 1; ++i) {
        double v = sqrt((double)(i + 1) * (N - 1 - i));
        H[(i + 1) + i * ldh] = v;
        H[i + (i + 1) * ldh] = v;
    }
    pdchase_init_blockcyclic_(&N, &nev, &nex, &mb, &mb, H, &ldh, V, ritzv,
                              &dim0, &dim1, &major, &irsrc, &icsrc, NULL,
                              &init);
    pdchase_(&deg, &tol, &mode, &opt, &qr);
    pdchase_get_eigenpairs_(V, &N, ritzv);
    pdchase_finalize_(&flag);
    for (int j = 0; j < nev; ++j) {
        double exact = -(double)(N - 1) + 2.0 * j;
        if (fabs(ritzv[j] - exact) > 1e-8) {
            fprintf(stderr, "blockcyclic: ritzv[%d]=%.12f != %.1f\n", j,
                    ritzv[j], exact);
            return 1;
        }
    }
    /* true residual of the first eigenpair IN THE CALLER'S ROW ORDER —
     * catches a missing layout un-permutation */
    double rmax = 0.0;
    for (int i = 0; i < N; ++i) {
        double hv = 0.0;
        for (int k = 0; k < N; ++k) hv += H[i + k * ldh] * V[k];
        double r = hv - ritzv[0] * V[i];
        if (fabs(r) > rmax) rmax = fabs(r);
    }
    if (rmax > 1e-7) {
        fprintf(stderr, "blockcyclic: residual %.3e\n", rmax);
        return 1;
    }
    free(H); free(V); free(ritzv);
    printf("blockcyclic OK (resid %.2e)\n", rmax);
    return 0;
}

static int test_dist_pseudo(void) {
    /* decoupled BSE 2x2 blocks: H = [[diag a, diag b], [-diag b, -diag a]]
     * with exact positive spectrum sqrt(a_i^2 - b_i^2) */
    int N = 32, half = 16, nev = 4, nex = 4, dim0 = 2, dim1 = 2;
    int ldh = N, init = 0, deg = 10, flag = 0;
    char major = 'R';
    double tol = 1e-9;
    char mode = 'R', opt = 'S', qr = 'C';
    double _Complex* H = calloc((size_t)N * N, sizeof(double _Complex));
    double _Complex* V =
        calloc((size_t)N * 2 * (nev + nex), sizeof(double _Complex));
    double* ritzv = calloc(2 * (nev + nex), sizeof(double));
    double exact[16];
    for (int i = 0; i < half; ++i) {
        double a = 1.0 + i, b = 0.3;
        H[i + i * ldh] = a;
        H[i + (i + half) * ldh] = b;
        H[(i + half) + i * ldh] = -b;
        H[(i + half) + (i + half) * ldh] = -a;
        exact[i] = sqrt(a * a - b * b);
    }
    pzchase_init_pseudo_(&N, &nev, &nex, &N, &N, H, &ldh, V, ritzv, &dim0,
                         &dim1, &major, NULL, &init);
    pzchase_(&deg, &tol, &mode, &opt, &qr);
    pzchase_get_eigenpairs_(V, &N, ritzv);
    pzchase_finalize_(&flag);
    for (int j = 0; j < nev; ++j) {
        if (fabs(ritzv[j] - exact[j]) > 1e-7) {
            fprintf(stderr, "pseudo: ritzv[%d]=%.12f != %.12f\n", j,
                    ritzv[j], exact[j]);
            return 1;
        }
    }
    free(H); free(V); free(ritzv);
    printf("distributed pseudo OK\n");
    return 0;
}

int main(void) {
    if (test_blockcyclic()) return 1;
    if (test_dist_pseudo()) return 1;
    printf("C-dist-interface demo: PASS\n");
    return 0;
}
