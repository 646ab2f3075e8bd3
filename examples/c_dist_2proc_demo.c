/* Per-rank distributed C-ABI demo: TWO processes, each passing its LOCAL
 * (N/2, N) block of the Clement matrix to pdchase_init_ — the reference's
 * genuine per-rank MPI semantics (chase_c_interface.h:126-157), realized
 * as one jax.distributed process per rank.  Launchers export
 * JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID (an MPI
 * wrapper would derive them from the communicator).
 *
 * Each process gets the replicated eigenvalues and ITS OWN eigenvector
 * row block back (p*chase_get_eigenpairs_ rank-local LEigsV semantics).
 *
 * Build: cc c_dist_2proc_demo.c -L<dir> -lchase_tpu -lm
 */
#include <math.h>
#include <stdio.h>
#include <stdlib.h>

void pdchase_init_(int *N, int *nev, int *nex, int *m, int *n, double *H,
                   int *ldh, double *V, double *ritzv, int *dim0, int *dim1,
                   char *grid_major, void *comm, int *init);
void pdchase_(int *deg, double *tol, char *mode, char *opt, char *qr);
void pdchase_get_eigenpairs_(double *LEigsV, int *ld, double *ritzv);
void pdchase_finalize_(int *flag);

int main(void) {
    int N = 128, nev = 8, nex = 8;
    const char *pid_env = getenv("JAX_PROCESS_ID");
    int rank = pid_env ? atoi(pid_env) : 0;
    int dim0 = 2, dim1 = 1;
    int m = N / dim0, n = N;
    int ldh = m, init = 0, flag = 0;
    char major = 'R', mode = 'R', opt = 'S', qr = 'C';
    int deg = 0;
    double tol = 1e-9;
    size_t i, j;

    /* local rows [rank*m, rank*m + m) of the Clement matrix:
     * H[k][k+1] = H[k+1][k] = sqrt((k+1)*(N-1-k)); column-major, ld = m */
    double *H = calloc((size_t)m * n, sizeof(double));
    double *V = calloc((size_t)m * (nev + nex), sizeof(double));
    double *ritzv = calloc(nev + nex, sizeof(double));
    for (j = 0; j < (size_t)n; ++j) {
        for (i = 0; i < (size_t)m; ++i) {
            size_t gi = (size_t)rank * m + i;
            double v = 0.0;
            if (gi == j + 1)
                v = sqrt((double)(j + 1) * (N - 1 - (double)j));
            else if (gi + 1 == j)
                v = sqrt((double)(gi + 1) * (N - 1 - (double)gi));
            H[j * m + i] = v;
        }
    }

    pdchase_init_(&N, &nev, &nex, &m, &n, H, &ldh, V, ritzv, &dim0, &dim1,
                  &major, NULL, &init);
    pdchase_(&deg, &tol, &mode, &opt, &qr);
    pdchase_get_eigenpairs_(V, &m, ritzv);

    /* Clement spectrum is exactly -(N-1), -(N-3), ... */
    double max_err = 0.0;
    for (i = 0; i < (size_t)nev; ++i) {
        double exact = -(double)(N - 1) + 2.0 * (double)i;
        double e = fabs(ritzv[i] - exact);
        if (e > max_err) max_err = e;
    }
    /* rank-local eigenvector block sanity: finite, nonzero */
    double blk = 0.0;
    for (j = 0; j < (size_t)nev; ++j)
        for (i = 0; i < (size_t)m; ++i)
            blk += V[j * m + i] * V[j * m + i];
    pdchase_finalize_(&flag);

    if (max_err > 1e-7 || !(blk > 0.0) || !isfinite(blk)) {
        printf("rank %d FAIL: eig err %.3e local-block norm2 %.3e\n",
               rank, max_err, blk);
        return 1;
    }
    printf("rank %d C-dist-2proc demo: PASS (eig err %.3e, local rows %d, "
           "block norm2 %.3f)\n", rank, max_err, m, blk);
    return 0;
}
