/* C driver against libchase_tpu's reference-compatible ABI — equivalent of
 * the reference's examples/4_interface/4_c_serial_chase.c.
 *
 * Build:
 *   g++ -O3 -shared -fPIC chase_tpu/_native/chase_capi.cpp \
 *       $(python3-config --includes) $(python3-config --ldflags --embed) \
 *       -o libchase_tpu.so
 *   cc examples/c_interface_demo.c -L. -lchase_tpu -o c_demo
 *   PYTHONPATH=$PWD LD_LIBRARY_PATH=. ./c_demo
 */
#include <math.h>
#include <stdio.h>
#include <stdlib.h>

void dchase_init_(int*, int*, int*, double*, int*, double*, double*, int*);
void dchase_init_internal_(int*, int*, int*, double*, int*, int*);
void dchase_(int*, double*, char*, char*, char*);
void dchase_get_eigenpairs_(double*, int*, double*);
void dchase_finalize_(int*);
void chase_set_tol_(double*);

int main(void) {
    int N = 301, nev = 12, nex = 8, init = 1, flag = 0;
    int ldh = N, deg = 20;
    double tol = 1e-10;
    char mode = 'R', opt = 'S', qr = 'C';

    /* Clement matrix, column-major */
    double* H = (double*)calloc((size_t)N * N, sizeof(double));
    for (int i = 0; i < N - 1; ++i) {
        double v = sqrt((double)(i + 1) * (N - i - 1));
        H[i + (i + 1) * N] = v;   /* (i, i+1) */
        H[(i + 1) + i * N] = v;   /* (i+1, i) */
    }
    double* V = (double*)calloc((size_t)N * (nev + nex), sizeof(double));
    double* ritzv = (double*)calloc((size_t)(nev + nex), sizeof(double));

    dchase_init_(&N, &nev, &nex, H, &ldh, V, ritzv, &init);
    chase_set_tol_(&tol);
    dchase_(&deg, &tol, &mode, &opt, &qr);
    dchase_get_eigenpairs_(V, &ldh, ritzv);
    dchase_finalize_(&flag);

    int ok = 1;
    for (int i = 0; i < nev; ++i) {
        double want = -(double)(N - 1) + 2.0 * i;  /* exact Clement */
        printf("lambda[%d] = %.12f (exact %.1f)\n", i, ritzv[i], want);
        if (fabs(ritzv[i] - want) > 1e-6) ok = 0;
    }
    /* residual of the first eigenpair through the returned V */
    double r2 = 0, n2 = 0;
    for (int i = 0; i < N; ++i) {
        double hv = 0;
        for (int j = 0; j < N; ++j) hv += H[i + j * N] * V[j];
        double d = hv - ritzv[0] * V[i];
        r2 += d * d;
        n2 += V[i] * V[i];
    }
    printf("||Hv - lambda v|| = %.3e  ||v|| = %.3f\n", sqrt(r2), sqrt(n2));
    if (sqrt(r2) > 1e-7) ok = 0;

    /* second solve through the internal-init variant: the library
     * allocates the search space; eigenpairs return via our buffers
     * (reference chase_c_interface.h:25-26) */
    dchase_init_internal_(&N, &nev, &nex, H, &ldh, &init);
    dchase_(&deg, &tol, &mode, &opt, &qr);
    for (int i = 0; i < nev; ++i) ritzv[i] = 0;
    dchase_get_eigenpairs_(V, &ldh, ritzv);
    dchase_finalize_(&flag);
    for (int i = 0; i < nev; ++i) {
        double want = -(double)(N - 1) + 2.0 * i;
        if (fabs(ritzv[i] - want) > 1e-6) {
            printf("internal-init lambda[%d] = %.12f != %.1f\n", i,
                   ritzv[i], want);
            ok = 0;
        }
    }

    printf(ok ? "C-interface demo: PASS\n" : "C-interface demo: FAIL\n");
    free(H); free(V); free(ritzv);
    return ok ? 0 : 1;
}
