// fedm_tpu native runtime components (C ABI, loaded via ctypes).
//
// The reference delegates its native layer to DOLFIN/PETSc (SURVEY.md
// section 2.3). Here the TPU compute path is XLA, and the host-side
// runtime pieces that benefit from native code live in this module:
//
//  - reverse Cuthill-McKee ordering: node renumbering for gather/scatter
//    locality on TPU (bandwidth reduction of the dof adjacency);
//  - ILU(0) factorisation + triangular solves on CSR matrices (host-side
//    preconditioning utilities);
//  - base64 encoding for binary VTU output.
//
// Build: fedm_tpu/native/build.py (g++ -O3 -shared -fPIC).

#include <cstdint>
#include <cstring>
#include <queue>
#include <vector>
#include <algorithm>

extern "C" {

// Reverse Cuthill-McKee on a CSR adjacency (symmetric pattern assumed).
// perm[i] = old index of the node placed at new position i.
void rcm_order(int n, const int* rowptr, const int* colidx, int* perm) {
    std::vector<int> degree(n);
    for (int i = 0; i < n; ++i) degree[i] = rowptr[i + 1] - rowptr[i];
    std::vector<char> visited(n, 0);
    std::vector<int> order;
    order.reserve(n);
    std::vector<int> neighbors;

    for (;;) {
        // next start: unvisited node of minimum degree
        int start = -1;
        for (int i = 0; i < n; ++i) {
            if (!visited[i] && (start < 0 || degree[i] < degree[start]))
                start = i;
        }
        if (start < 0) break;
        std::queue<int> q;
        q.push(start);
        visited[start] = 1;
        while (!q.empty()) {
            int u = q.front();
            q.pop();
            order.push_back(u);
            neighbors.clear();
            for (int k = rowptr[u]; k < rowptr[u + 1]; ++k) {
                int v = colidx[k];
                if (v >= 0 && v < n && !visited[v]) {
                    visited[v] = 1;
                    neighbors.push_back(v);
                }
            }
            std::sort(neighbors.begin(), neighbors.end(),
                      [&](int a, int b) { return degree[a] < degree[b]; });
            for (int v : neighbors) q.push(v);
        }
    }
    // reverse
    for (int i = 0; i < n; ++i) perm[i] = order[n - 1 - i];
}

// In-place ILU(0) on CSR (vals modified; pattern unchanged). Requires
// sorted column indices per row and present diagonal. Returns 0 on
// success, row+1 of a zero pivot otherwise.
int ilu0(int n, const int* rowptr, const int* colidx, double* vals) {
    std::vector<int> diag(n, -1);
    for (int i = 0; i < n; ++i)
        for (int k = rowptr[i]; k < rowptr[i + 1]; ++k)
            if (colidx[k] == i) diag[i] = k;
    for (int i = 0; i < n; ++i)
        if (diag[i] < 0) return i + 1;

    // work array: column -> position in current row
    std::vector<int> pos(n, -1);
    for (int i = 0; i < n; ++i) {
        for (int k = rowptr[i]; k < rowptr[i + 1]; ++k) pos[colidx[k]] = k;
        for (int k = rowptr[i]; k < rowptr[i + 1]; ++k) {
            int j = colidx[k];
            if (j >= i) break;
            double piv = vals[diag[j]];
            if (piv == 0.0) return j + 1;
            double lij = vals[k] / piv;
            vals[k] = lij;
            for (int kk = diag[j] + 1; kk < rowptr[j + 1]; ++kk) {
                int p = pos[colidx[kk]];
                if (p >= 0) vals[p] -= lij * vals[kk];
            }
        }
        for (int k = rowptr[i]; k < rowptr[i + 1]; ++k) pos[colidx[k]] = -1;
    }
    return 0;
}

// Solve (L+I) y = b then (U) x = y for an ILU(0)-factored CSR matrix.
void ilu0_solve(int n, const int* rowptr, const int* colidx,
                const double* vals, const double* b, double* x) {
    std::vector<int> diag(n);
    for (int i = 0; i < n; ++i)
        for (int k = rowptr[i]; k < rowptr[i + 1]; ++k)
            if (colidx[k] == i) diag[i] = k;
    // forward: unit lower
    for (int i = 0; i < n; ++i) {
        double s = b[i];
        for (int k = rowptr[i]; k < diag[i]; ++k)
            s -= vals[k] * x[colidx[k]];
        x[i] = s;
    }
    // backward: upper
    for (int i = n - 1; i >= 0; --i) {
        double s = x[i];
        for (int k = diag[i] + 1; k < rowptr[i + 1]; ++k)
            s -= vals[k] * x[colidx[k]];
        x[i] = s / vals[diag[i]];
    }
}

// Standard base64; out must hold 4*ceil(n/3)+1 bytes. Returns length.
long b64_encode(const uint8_t* in, long n, char* out) {
    static const char tbl[] =
        "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789+/";
    long o = 0;
    long i = 0;
    for (; i + 2 < n; i += 3) {
        uint32_t v = (in[i] << 16) | (in[i + 1] << 8) | in[i + 2];
        out[o++] = tbl[(v >> 18) & 63];
        out[o++] = tbl[(v >> 12) & 63];
        out[o++] = tbl[(v >> 6) & 63];
        out[o++] = tbl[v & 63];
    }
    if (i < n) {
        uint32_t v = in[i] << 16;
        if (i + 1 < n) v |= in[i + 1] << 8;
        out[o++] = tbl[(v >> 18) & 63];
        out[o++] = tbl[(v >> 12) & 63];
        out[o++] = (i + 1 < n) ? tbl[(v >> 6) & 63] : '=';
        out[o++] = '=';
    }
    out[o] = '\0';
    return o;
}

}  // extern "C"
