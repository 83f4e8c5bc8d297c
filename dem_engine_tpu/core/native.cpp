// Native host-runtime components for dem_engine_tpu.
//
// The reference implements its host runtime in C++ (fast CSV parser
// core/utils/csv.hpp, Wavefront loader core/utils/WavefrontMeshLoader.hpp,
// samplers utils/Samplers.hpp). The TPU build keeps the compute path in
// XLA but implements the IO/generation hot paths natively too: at 1e6+
// particles, Python CSV/OBJ handling dominates checkpoint time.
//
// Plain C ABI, consumed via ctypes (core/__init__.py). Build:
//   g++ -O3 -march=native -shared -fPIC native.cpp -o libdemnative.so

#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <random>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// fast CSV writer: rows of float64, fixed column count, %.9g formatting
// returns 0 on success
// ---------------------------------------------------------------------------
int demn_write_csv(const char* path, const char* header, const double* data,
                   int64_t n_rows, int64_t n_cols) {
    FILE* f = fopen(path, "w");
    if (!f) return 1;
    if (header && header[0]) {
        fputs(header, f);
        fputc('\n', f);
    }
    std::vector<char> buf(n_cols * 32 + 8);
    for (int64_t i = 0; i < n_rows; i++) {
        char* p = buf.data();
        for (int64_t j = 0; j < n_cols; j++) {
            if (j) *p++ = ',';
            p += snprintf(p, 32, "%.9g", data[i * n_cols + j]);
        }
        *p++ = '\n';
        fwrite(buf.data(), 1, p - buf.data(), f);
    }
    fclose(f);
    return 0;
}

// ---------------------------------------------------------------------------
// fast numeric CSV reader: counts rows/cols on first pass, fills caller
// buffer on second. Header line is skipped. Non-numeric cells parse as NaN.
// ---------------------------------------------------------------------------
int demn_csv_shape(const char* path, int64_t* n_rows, int64_t* n_cols) {
    FILE* f = fopen(path, "r");
    if (!f) return 1;
    char line[1 << 16];
    int64_t rows = 0, cols = 0;
    bool first = true;
    while (fgets(line, sizeof line, f)) {
        if (first) {
            cols = 1;
            for (char* p = line; *p; p++)
                if (*p == ',') cols++;
            first = false;
            continue;  // header
        }
        if (line[0] == '\n' || line[0] == 0) continue;
        rows++;
    }
    fclose(f);
    *n_rows = rows;
    *n_cols = cols;
    return 0;
}

int demn_read_csv(const char* path, double* out, int64_t n_rows,
                  int64_t n_cols) {
    FILE* f = fopen(path, "r");
    if (!f) return 1;
    char line[1 << 16];
    if (!fgets(line, sizeof line, f)) {  // header
        fclose(f);
        return 2;
    }
    int64_t r = 0;
    while (r < n_rows && fgets(line, sizeof line, f)) {
        if (line[0] == '\n' || line[0] == 0) continue;
        char* p = line;
        for (int64_t c = 0; c < n_cols; c++) {
            char* end = p;
            double v = strtod(p, &end);
            out[r * n_cols + c] = (end == p) ? NAN : v;
            p = end;
            while (*p && *p != ',') p++;
            if (*p == ',') p++;
        }
        r++;
    }
    fclose(f);
    return 0;
}

// ---------------------------------------------------------------------------
// Bridson Poisson-disk sampling in a box (parity: reference PDSampler,
// Samplers.hpp:271). Returns the number of points written (<= max_n).
// ---------------------------------------------------------------------------
int64_t demn_pd_sample(const double* lo, const double* hi, double r,
                       uint64_t seed, int k_tries, double* out,
                       int64_t max_n) {
    std::mt19937_64 rng(seed);
    std::uniform_real_distribution<double> uni(0.0, 1.0);
    std::normal_distribution<double> gauss(0.0, 1.0);

    const double cell = r / std::sqrt(3.0);
    int64_t g[3];
    double dims[3];
    for (int d = 0; d < 3; d++) {
        dims[d] = hi[d] - lo[d];
        g[d] = std::max<int64_t>((int64_t)std::ceil(dims[d] / cell), 1);
    }
    std::vector<int64_t> grid((size_t)g[0] * g[1] * g[2], -1);
    std::vector<double> pts;
    pts.reserve(3 * 4096);
    std::vector<int64_t> active;

    auto gidx = [&](const double* p) {
        int64_t ix[3];
        for (int d = 0; d < 3; d++) {
            ix[d] = std::min<int64_t>((int64_t)((p[d] - lo[d]) / cell),
                                      g[d] - 1);
            if (ix[d] < 0) ix[d] = 0;
        }
        return (ix[2] * g[1] + ix[1]) * g[0] + ix[0];
    };
    auto fits = [&](const double* p) {
        int64_t ix[3];
        for (int d = 0; d < 3; d++) {
            ix[d] = std::min<int64_t>((int64_t)((p[d] - lo[d]) / cell),
                                      g[d] - 1);
            if (ix[d] < 0) ix[d] = 0;
        }
        for (int64_t dz = -2; dz <= 2; dz++)
            for (int64_t dy = -2; dy <= 2; dy++)
                for (int64_t dx = -2; dx <= 2; dx++) {
                    int64_t x = ix[0] + dx, y = ix[1] + dy, z = ix[2] + dz;
                    if (x < 0 || y < 0 || z < 0 || x >= g[0] || y >= g[1] ||
                        z >= g[2])
                        continue;
                    int64_t q = grid[(z * g[1] + y) * g[0] + x];
                    if (q < 0) continue;
                    double dd = 0;
                    for (int d = 0; d < 3; d++) {
                        double t = pts[3 * q + d] - p[d];
                        dd += t * t;
                    }
                    if (dd < r * r) return false;
                }
        return true;
    };

    double p0[3];
    for (int d = 0; d < 3; d++) p0[d] = lo[d] + uni(rng) * dims[d];
    pts.insert(pts.end(), p0, p0 + 3);
    grid[gidx(p0)] = 0;
    active.push_back(0);

    while (!active.empty() && (int64_t)pts.size() / 3 < max_n) {
        size_t ai = (size_t)(uni(rng) * active.size());
        if (ai >= active.size()) ai = active.size() - 1;
        const double* base = &pts[3 * active[ai]];
        bool placed = false;
        for (int t = 0; t < k_tries; t++) {
            double v[3] = {gauss(rng), gauss(rng), gauss(rng)};
            double norm = std::sqrt(v[0] * v[0] + v[1] * v[1] + v[2] * v[2]);
            double rad = r * (1.0 + uni(rng));
            double p[3];
            bool in = true;
            for (int d = 0; d < 3; d++) {
                p[d] = base[d] + v[d] / norm * rad;
                if (p[d] < lo[d] || p[d] > hi[d]) in = false;
            }
            if (!in || !fits(p)) continue;
            int64_t id = (int64_t)pts.size() / 3;
            pts.insert(pts.end(), p, p + 3);
            grid[gidx(p)] = id;
            active.push_back(id);
            placed = true;
            break;
        }
        if (!placed) {
            active[ai] = active.back();
            active.pop_back();
        }
    }
    int64_t n = std::min<int64_t>((int64_t)pts.size() / 3, max_n);
    memcpy(out, pts.data(), (size_t)n * 3 * sizeof(double));
    return n;
}

// ---------------------------------------------------------------------------
// Wavefront OBJ loader (parity: WavefrontMeshLoader.hpp). Two-call API:
// first pass returns counts, second fills buffers. Fan-triangulates faces,
// supports v/vt/vn and negative indices.
// ---------------------------------------------------------------------------
int demn_obj_shape(const char* path, int64_t* n_verts, int64_t* n_tris) {
    FILE* f = fopen(path, "r");
    if (!f) return 1;
    char line[1 << 14];
    int64_t nv = 0, nt = 0;
    while (fgets(line, sizeof line, f)) {
        if (line[0] == 'v' && line[1] == ' ') nv++;
        else if (line[0] == 'f' && line[1] == ' ') {
            int cnt = 0;
            char* p = line + 1;
            while (*p) {
                while (*p == ' ') p++;
                if (*p && *p != '\n' && *p != '\r') {
                    cnt++;
                    while (*p && *p != ' ' && *p != '\n' && *p != '\r') p++;
                }
                else break;
            }
            if (cnt >= 3) nt += cnt - 2;
        }
    }
    fclose(f);
    *n_verts = nv;
    *n_tris = nt;
    return 0;
}

int demn_obj_read(const char* path, double* verts, int32_t* tris,
                  int64_t n_verts, int64_t n_tris) {
    FILE* f = fopen(path, "r");
    if (!f) return 1;
    char line[1 << 14];
    int64_t vi = 0, ti = 0;
    while (fgets(line, sizeof line, f)) {
        if (line[0] == 'v' && line[1] == ' ') {
            if (vi >= n_verts) continue;
            sscanf(line + 2, "%lf %lf %lf", &verts[3 * vi],
                   &verts[3 * vi + 1], &verts[3 * vi + 2]);
            vi++;
        } else if (line[0] == 'f' && line[1] == ' ') {
            int64_t idx[64];
            int cnt = 0;
            char* p = line + 1;
            while (*p && cnt < 64) {
                while (*p == ' ') p++;
                if (!*p || *p == '\n' || *p == '\r') break;
                long v = strtol(p, &p, 10);
                idx[cnt++] = v > 0 ? v - 1 : vi + v;
                while (*p && *p != ' ' && *p != '\n' && *p != '\r') p++;
            }
            for (int k = 1; k + 1 < cnt && ti < n_tris; k++) {
                tris[3 * ti] = (int32_t)idx[0];
                tris[3 * ti + 1] = (int32_t)idx[k];
                tris[3 * ti + 2] = (int32_t)idx[k + 1];
                ti++;
            }
        }
    }
    fclose(f);
    return 0;
}

// Facet normals from the source's `vn` records (parity:
// WavefrontMeshLoader.hpp normal handling). Fills nrm (n_tris, 3) with the
// normalized mean of each triangle's corner vn entries. Returns 0 when
// every face corner carried a vn index, 2 when the file declares no (or
// incomplete) normals (nrm is untouched), 1 on IO error.
int demn_obj_read_normals(const char* path, double* nrm, int64_t n_tris) {
    FILE* f = fopen(path, "r");
    if (!f) return 1;
    char line[1 << 14];
    std::vector<double> vns;
    std::vector<int64_t> face_vn;  // 3 per emitted triangle
    int missing = 0;
    while (fgets(line, sizeof line, f)) {
        if (line[0] == 'v' && line[1] == 'n' && line[2] == ' ') {
            double x = 0, y = 0, z = 0;
            sscanf(line + 3, "%lf %lf %lf", &x, &y, &z);
            vns.push_back(x);
            vns.push_back(y);
            vns.push_back(z);
        } else if (line[0] == 'f' && line[1] == ' ') {
            int64_t nid[64];
            int cnt = 0;
            char* p = line + 1;
            while (*p && cnt < 64) {
                while (*p == ' ') p++;
                if (!*p || *p == '\n' || *p == '\r') break;
                strtol(p, &p, 10);          // vertex index (unused here)
                int64_t n = INT64_MIN;
                if (*p == '/') {
                    p++;                     // vt or empty
                    if (*p != '/') strtol(p, &p, 10);
                    if (*p == '/') {
                        p++;
                        long v = strtol(p, &p, 10);
                        n = v > 0 ? v - 1
                                  : (int64_t)(vns.size() / 3) + v;
                    }
                }
                nid[cnt++] = n;
                while (*p && *p != ' ' && *p != '\n' && *p != '\r') p++;
            }
            for (int k = 1; k + 1 < cnt; k++) {
                if (nid[0] == INT64_MIN || nid[k] == INT64_MIN ||
                    nid[k + 1] == INT64_MIN) missing = 1;
                face_vn.push_back(nid[0]);
                face_vn.push_back(nid[k]);
                face_vn.push_back(nid[k + 1]);
            }
        }
    }
    fclose(f);
    if (vns.empty() || missing ||
        (int64_t)(face_vn.size() / 3) != n_tris) return 2;
    int64_t nn = (int64_t)(vns.size() / 3);
    for (int64_t t = 0; t < n_tris; t++) {
        double m[3] = {0, 0, 0};
        for (int c = 0; c < 3; c++) {
            int64_t j = face_vn[3 * t + c];
            if (j < 0 || j >= nn) return 2;
            m[0] += vns[3 * j];
            m[1] += vns[3 * j + 1];
            m[2] += vns[3 * j + 2];
        }
        double len = sqrt(m[0] * m[0] + m[1] * m[1] + m[2] * m[2]);
        if (len < 1e-30) len = 1.0;
        nrm[3 * t] = m[0] / len;
        nrm[3 * t + 1] = m[1] / len;
        nrm[3 * t + 2] = m[2] / len;
    }
    return 0;
}

}  // extern "C"
