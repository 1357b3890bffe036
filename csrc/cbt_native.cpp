// Native host-side accelerators for confidence_bootstrapping_tpu.
//
// The reference gets its host-side performance from external native libs
// (RDKit, torch_cluster's kNN, spyrmsd's graph-tool backend). This library
// provides the equivalents we use in the hot host paths, exposed through a
// plain C ABI consumed via ctypes (no pybind11 in this image):
//
//   * parse_pdb_ca: one-pass PDB ATOM-record scan -> C-alpha table
//     (residue featurization for dataset preprocessing at MOAD scale);
//   * knn_graph: exact k-nearest-neighbor lists over 3D points
//     (receptor/atom graph construction, replaces scipy cKDTree in the
//     preprocessing loop);
//   * min_perm_rmsd: min RMSD over graph automorphism permutations x poses
//     (the inner loop of symmetry-corrected RMSD; permutations are
//     enumerated in Python via networkx, the O(P*N*M) scan runs here).
//
// Build: make -C csrc   (produces libcbt_native.so)

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <vector>

extern "C" {

// ---------------------------------------------------------------- kNN

// pos: [n,3] float32; returns idx [n,k] int32 and dist [n,k] float32 of the
// k nearest OTHER points (sorted ascending). Exact, cell-list accelerated.
int knn_graph(const float* pos, int n, int k, int32_t* out_idx, float* out_dist) {
    if (n <= 1 || k <= 0) return 0;
    k = std::min(k, n - 1);
    // build a uniform grid with cell size ~ expected spacing
    float lo[3] = {1e30f, 1e30f, 1e30f}, hi[3] = {-1e30f, -1e30f, -1e30f};
    for (int i = 0; i < n; i++)
        for (int d = 0; d < 3; d++) {
            lo[d] = std::min(lo[d], pos[3 * i + d]);
            hi[d] = std::max(hi[d], pos[3 * i + d]);
        }
    float vol = std::max(1e-6f, (hi[0] - lo[0]) * (hi[1] - lo[1]) * (hi[2] - lo[2]));
    float cell = std::cbrt(vol / n) + 1e-6f;
    int dims[3];
    for (int d = 0; d < 3; d++) dims[d] = std::max(1, (int)((hi[d] - lo[d]) / cell) + 1);
    auto cell_of = [&](const float* p) {
        int c[3];
        for (int d = 0; d < 3; d++) {
            c[d] = (int)((p[d] - lo[d]) / cell);
            c[d] = std::max(0, std::min(dims[d] - 1, c[d]));
        }
        return (c[2] * dims[1] + c[1]) * dims[0] + c[0];
    };
    int ncell = dims[0] * dims[1] * dims[2];
    std::vector<std::vector<int>> cells(ncell);
    for (int i = 0; i < n; i++) cells[cell_of(pos + 3 * i)].push_back(i);

    std::vector<std::pair<float, int>> cand;
    for (int i = 0; i < n; i++) {
        const float* p = pos + 3 * i;
        int ci[3];
        for (int d = 0; d < 3; d++) {
            ci[d] = (int)((p[d] - lo[d]) / cell);
            ci[d] = std::max(0, std::min(dims[d] - 1, ci[d]));
        }
        cand.clear();
        for (int ring = 0;; ring++) {
            // gather candidates from the cube shell at Chebyshev distance `ring`
            for (int dz = -ring; dz <= ring; dz++)
                for (int dy = -ring; dy <= ring; dy++)
                    for (int dx = -ring; dx <= ring; dx++) {
                        if (std::max({abs(dx), abs(dy), abs(dz)}) != ring) continue;
                        int x = ci[0] + dx, y = ci[1] + dy, z = ci[2] + dz;
                        if (x < 0 || y < 0 || z < 0 || x >= dims[0] || y >= dims[1] || z >= dims[2]) continue;
                        for (int j : cells[(z * dims[1] + y) * dims[0] + x]) {
                            if (j == i) continue;
                            float dx2 = p[0] - pos[3 * j], dy2 = p[1] - pos[3 * j + 1], dz2 = p[2] - pos[3 * j + 2];
                            cand.emplace_back(dx2 * dx2 + dy2 * dy2 + dz2 * dz2, j);
                        }
                    }
            // enough candidates and the next shell cannot contain closer points
            if ((int)cand.size() >= k) {
                std::nth_element(cand.begin(), cand.begin() + (k - 1), cand.end());
                float kth = cand[k - 1].first;
                float safe = ring * cell;  // min distance to the next shell
                if (kth <= safe * safe || ring >= std::max({dims[0], dims[1], dims[2]})) break;
            } else if (ring >= std::max({dims[0], dims[1], dims[2]})) {
                break;
            }
        }
        int kk = std::min(k, (int)cand.size());
        std::partial_sort(cand.begin(), cand.begin() + kk, cand.end());
        for (int j = 0; j < kk; j++) {
            out_idx[i * k + j] = cand[j].second;
            out_dist[i * k + j] = std::sqrt(cand[j].first);
        }
        for (int j = kk; j < k; j++) {
            out_idx[i * k + j] = 0;
            out_dist[i * k + j] = 1e30f;
        }
    }
    return k;
}

// ------------------------------------------------------ permutation RMSD

// ref: [n,3]; poses: [m,n,3]; perms: [p,n] int32. out: [m] min RMSD over
// the identity and all permutations (no superposition - docking RMSD).
void min_perm_rmsd(const float* ref, const float* poses, int m, int n,
                   const int32_t* perms, int p, float* out) {
    for (int i = 0; i < m; i++) {
        const float* pose = poses + (size_t)i * n * 3;
        double best = 0;
        for (int a = 0; a < n; a++)
            for (int d = 0; d < 3; d++) {
                double diff = ref[3 * a + d] - pose[3 * a + d];
                best += diff * diff;
            }
        for (int q = 0; q < p; q++) {
            const int32_t* perm = perms + (size_t)q * n;
            double acc = 0;
            for (int a = 0; a < n; a++) {
                const float* r = ref + 3 * perm[a];
                const float* x = pose + 3 * a;
                double d0 = r[0] - x[0], d1 = r[1] - x[1], d2 = r[2] - x[2];
                acc += d0 * d0 + d1 * d1 + d2 * d2;
                if (acc >= best) break;
            }
            if (acc < best) best = acc;
        }
        out[i] = (float)std::sqrt(best / n);
    }
}

// ---------------------------------------------------------------- PDB

// One-pass ATOM-record scan. Writes up to max_res C-alpha entries:
//   ca_pos [max_res,3], resname [max_res*4] (null-padded 3-char), chain
//   [max_res], and per-atom tables for the all-atom graph: atom_pos
//   [max_atoms,3], atom_elem [max_atoms], atom_res [max_atoms],
//   atom_name [max_atoms*5]. Returns number of residues (or -1 on error);
//   *n_atoms_out receives the atom count.
int parse_pdb_ca(const char* path, int max_res, int max_atoms,
                 float* ca_pos, char* resname, char* chain,
                 float* atom_pos, int32_t* atom_elem, int32_t* atom_res,
                 char* atom_name, int32_t* n_atoms_out) {
    FILE* f = fopen(path, "r");
    if (!f) return -1;
    char line[128];
    int nres = -1, natoms = 0;
    char cur_chain = 0;
    int cur_seq = -1000000;
    char cur_icode = 0;
    while (fgets(line, sizeof line, f)) {
        if (strncmp(line, "ENDMDL", 6) == 0) break;
        if (strncmp(line, "ATOM  ", 6) != 0) continue;
        size_t len = strlen(line);
        if (len < 54) continue;
        char altloc = line[16];
        if (altloc != ' ' && altloc != 'A') continue;
        char ch = line[21];
        int seq = atoi(std::string(line + 22, 4).c_str());
        char icode = line[26];
        if (ch != cur_chain || seq != cur_seq || icode != cur_icode) {
            nres++;
            if (nres >= max_res) { nres--; break; }
            cur_chain = ch;
            cur_seq = seq;
            cur_icode = icode;
            memcpy(resname + nres * 4, line + 17, 3);
            resname[nres * 4 + 3] = 0;
            chain[nres] = ch;
            ca_pos[nres * 3] = ca_pos[nres * 3 + 1] = ca_pos[nres * 3 + 2] = 1e30f;
        }
        float x = atof(std::string(line + 30, 8).c_str());
        float y = atof(std::string(line + 38, 8).c_str());
        float z = atof(std::string(line + 46, 8).c_str());
        char name[5] = {0};
        memcpy(name, line + 12, 4);
        // trim spaces
        std::string nm(name);
        nm.erase(0, nm.find_first_not_of(' '));
        nm.erase(nm.find_last_not_of(' ') + 1);
        if (nm == "CA" && ca_pos[nres * 3] > 1e29f) {
            ca_pos[nres * 3] = x;
            ca_pos[nres * 3 + 1] = y;
            ca_pos[nres * 3 + 2] = z;
        }
        if (natoms < max_atoms) {
            atom_pos[natoms * 3] = x;
            atom_pos[natoms * 3 + 1] = y;
            atom_pos[natoms * 3 + 2] = z;
            int elem = 6;
            if (len >= 78) {
                char e0 = line[76], e1 = line[77];
                std::string es;
                if (e0 != ' ') es += e0;
                if (e1 != ' ') es += e1;
                if (es == "N") elem = 7;
                else if (es == "O") elem = 8;
                else if (es == "S") elem = 16;
                else if (es == "C") elem = 6;
                else if (es == "H") elem = 1;
                else if (es == "P") elem = 15;
                else elem = 0;
            } else if (!nm.empty()) {
                switch (nm[0]) {
                    case 'N': elem = 7; break;
                    case 'O': elem = 8; break;
                    case 'S': elem = 16; break;
                    case 'H': elem = 1; break;
                    default: elem = 6;
                }
            }
            atom_elem[natoms] = elem;
            atom_res[natoms] = nres;
            memset(atom_name + natoms * 5, 0, 5);
            memcpy(atom_name + natoms * 5, nm.c_str(), std::min<size_t>(4, nm.size()));
            natoms++;
        }
    }
    fclose(f);
    *n_atoms_out = natoms;
    return nres + 1;
}

}  // extern "C"
