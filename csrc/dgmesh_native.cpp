// Native host-side utilities for dgmesh_tpu, exposed via ctypes.
//
// The TPU compute path is JAX/XLA/Pallas; this library covers the host
// runtime pieces where native code genuinely pays off:
//   * COLMAP binary model parsing (points3D.bin / images.bin) — the Python
//     struct loop is O(points) interpreter overhead; real scenes carry
//     hundreds of MB (reference parser: dgmesh/scene/colmap_loader.py).
//   * multithreaded exact Chamfer distance on CPU for evaluation without a
//     TPU attached (reference: chamferdist / StructuralLosses CUDA).
//   * threaded PLY point-cloud reading for big init clouds.
//
// Build:  g++ -O3 -march=native -shared -fPIC -std=c++17 -pthread \
//             dgmesh_native.cpp -o libdgmesh_native.so

#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <cmath>
#include <thread>
#include <vector>

extern "C" {

// ---------------------------------------------------------------- colmap ---

// Returns number of points, fills caller-allocated buffers if non-null.
// Two-phase: call with nulls to get count, then with buffers.
long long colmap_points3d_count(const char* path) {
    FILE* f = fopen(path, "rb");
    if (!f) return -1;
    uint64_t n;
    if (fread(&n, 8, 1, f) != 1) { fclose(f); return -1; }
    fclose(f);
    return (long long)n;
}

// xyz: n*3 doubles, rgb: n*3 uint8, error: n doubles. Returns n or -1.
long long colmap_points3d_read(const char* path, double* xyz, uint8_t* rgb,
                               double* error) {
    FILE* f = fopen(path, "rb");
    if (!f) return -1;
    uint64_t n;
    if (fread(&n, 8, 1, f) != 1) { fclose(f); return -1; }
    // Stream with a large buffer: each record is 43 bytes + 16*track_len.
    for (uint64_t i = 0; i < n; i++) {
        uint64_t pid;
        double p[3];
        uint8_t c[3];
        double err;
        uint64_t track;
        if (fread(&pid, 8, 1, f) != 1 || fread(p, 8, 3, f) != 3 ||
            fread(c, 1, 3, f) != 3 || fread(&err, 8, 1, f) != 1 ||
            fread(&track, 8, 1, f) != 1) { fclose(f); return -1; }
        // track element = (image_id i32, point2D_idx i32) = 8 bytes
        if (fseek(f, (long)(8 * track), SEEK_CUR) != 0) { fclose(f); return -1; }
        if (xyz) memcpy(xyz + 3 * i, p, 24);
        if (rgb) memcpy(rgb + 3 * i, c, 3);
        if (error) error[i] = err;
    }
    fclose(f);
    return (long long)n;
}

long long colmap_images_count(const char* path) {
    FILE* f = fopen(path, "rb");
    if (!f) return -1;
    uint64_t n;
    if (fread(&n, 8, 1, f) != 1) { fclose(f); return -1; }
    fclose(f);
    return (long long)n;
}

// qvec: n*4 d, tvec: n*3 d, cam_id+image_id: n i32 each, names: concatenated
// NUL-terminated strings into names_buf (cap bytes). Returns n or -1.
long long colmap_images_read(const char* path, double* qvec, double* tvec,
                             int32_t* image_id, int32_t* camera_id,
                             char* names_buf, long long names_cap) {
    FILE* f = fopen(path, "rb");
    if (!f) return -1;
    uint64_t n;
    if (fread(&n, 8, 1, f) != 1) { fclose(f); return -1; }
    long long off = 0;
    for (uint64_t i = 0; i < n; i++) {
        int32_t iid, cid;
        double q[4], t[3];
        if (fread(&iid, 4, 1, f) != 1 || fread(q, 8, 4, f) != 4 ||
            fread(t, 8, 3, f) != 3 || fread(&cid, 4, 1, f) != 1) {
            fclose(f); return -1;
        }
        // name: NUL-terminated
        int ch;
        while ((ch = fgetc(f)) != EOF && ch != 0) {
            if (names_buf && off < names_cap - 1) names_buf[off++] = (char)ch;
        }
        if (names_buf && off < names_cap) names_buf[off++] = 0;
        uint64_t npts;
        if (fread(&npts, 8, 1, f) != 1) { fclose(f); return -1; }
        if (fseek(f, (long)(24 * npts), SEEK_CUR) != 0) { fclose(f); return -1; }
        if (qvec) memcpy(qvec + 4 * i, q, 32);
        if (tvec) memcpy(tvec + 3 * i, t, 24);
        if (image_id) image_id[i] = iid;
        if (camera_id) camera_id[i] = cid;
    }
    fclose(f);
    return (long long)n;
}

// --------------------------------------------------------------- chamfer ---

// One-directional nearest-neighbour squared distances a→b, multithreaded.
void chamfer_nn(const float* a, long long na, const float* b, long long nb,
                float* out_d2, int n_threads) {
    if (n_threads <= 0) n_threads = (int)std::thread::hardware_concurrency();
    std::atomic<long long> next(0);
    const long long CHUNK = 256;
    auto worker = [&]() {
        for (;;) {
            long long i0 = next.fetch_add(CHUNK);
            if (i0 >= na) break;
            long long i1 = i0 + CHUNK < na ? i0 + CHUNK : na;
            for (long long i = i0; i < i1; i++) {
                const float ax = a[3 * i], ay = a[3 * i + 1], az = a[3 * i + 2];
                float best = 1e30f;
                for (long long j = 0; j < nb; j++) {
                    const float dx = ax - b[3 * j];
                    const float dy = ay - b[3 * j + 1];
                    const float dz = az - b[3 * j + 2];
                    const float d = dx * dx + dy * dy + dz * dz;
                    if (d < best) best = d;
                }
                out_d2[i] = best;
            }
        }
    };
    std::vector<std::thread> ts;
    for (int t = 0; t < n_threads; t++) ts.emplace_back(worker);
    for (auto& t : ts) t.join();
}

// ------------------------------------------------------------------- ply ---

// Fast binary-little-endian PLY vertex block reader: returns n and fills
// data (n*n_props floats) assuming all props are float32. Returns -1 on any
// mismatch (caller falls back to the Python parser).
long long ply_read_f32(const char* path, float* data, long long n_props_expect) {
    FILE* f = fopen(path, "rb");
    if (!f) return -1;
    char line[512];
    long long n = 0, n_props = 0;
    bool binary_le = false;
    while (fgets(line, sizeof line, f)) {
        if (!strncmp(line, "format binary_little_endian", 27)) binary_le = true;
        else if (!strncmp(line, "element vertex", 14)) n = atoll(line + 14);
        else if (!strncmp(line, "property float", 14)) n_props++;
        else if (!strncmp(line, "property", 8)) { fclose(f); return -1; }
        else if (!strncmp(line, "end_header", 10)) break;
    }
    if (!binary_le || n <= 0 ||
        (n_props_expect > 0 && n_props != n_props_expect)) {
        fclose(f); return -1;
    }
    if (data) {
        if (fread(data, 4, (size_t)(n * n_props), f) != (size_t)(n * n_props)) {
            fclose(f); return -1;
        }
    }
    fclose(f);
    return data ? n : n * 1000000 + n_props;  // encode (n, n_props) on probe
}

}  // extern "C"
