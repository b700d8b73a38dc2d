// Depth-only triangle rasterizer (CPU, C++).
//
// TPU-native replacement for the reference's pyrender/OSMesa offscreen
// depth rendering (reference utils/dataset.py:146,200): hosts driving TPUs
// have no GPU/OpenGL, so synthetic-depth generation is a small scanline
// z-buffer here, parallel over triangles via a per-row lock-free z-buffer
// update (std::atomic min on the integer bit pattern).
//
// Conventions (chosen so that the NOCS backprojection in
// cppf_tpu.core.geometry.backproject exactly inverts this projection):
//   camera at origin looking down -z; a camera-space point (x, y, z<0)
//   projects to u = cx + fx*x/d, v = cy - fy*y/d with d = -z; the depth
//   buffer stores d (0 = background).

#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <algorithm>

namespace {

inline float edge(float ax, float ay, float bx, float by, float cx, float cy) {
    return (bx - ax) * (cy - ay) - (by - ay) * (cx - ax);
}

// atomic min for positive floats stored as uint32 bit patterns
inline void atomic_min_float(std::atomic<uint32_t>* slot, float value) {
    uint32_t bits;
    std::memcpy(&bits, &value, sizeof(bits));
    uint32_t cur = slot->load(std::memory_order_relaxed);
    float curf;
    std::memcpy(&curf, &cur, sizeof(curf));
    while (value < curf) {
        if (slot->compare_exchange_weak(cur, bits, std::memory_order_relaxed)) break;
        std::memcpy(&curf, &cur, sizeof(curf));
    }
}

}  // namespace

extern "C" {

// verts: [n_verts * 3] camera-space floats; tris: [n_tris * 3] indices.
// depth_out: [height * width] floats, prefilled by this function.
void rasterize_depth(const float* verts, int n_verts,
                     const int* tris, int n_tris,
                     float fx, float fy, float cx, float cy,
                     int width, int height,
                     float* depth_out) {
    (void)n_verts;
    const float INF = 1e30f;
    const int n_px = width * height;
    std::atomic<uint32_t>* zbuf = new std::atomic<uint32_t>[n_px];
    uint32_t inf_bits;
    std::memcpy(&inf_bits, &INF, sizeof(inf_bits));
    for (int i = 0; i < n_px; ++i) zbuf[i].store(inf_bits, std::memory_order_relaxed);

    for (int t = 0; t < n_tris; ++t) {
        const int i0 = tris[3 * t], i1 = tris[3 * t + 1], i2 = tris[3 * t + 2];
        const float* p0 = verts + 3 * i0;
        const float* p1 = verts + 3 * i1;
        const float* p2 = verts + 3 * i2;
        const float d0 = -p0[2], d1 = -p1[2], d2 = -p2[2];
        if (d0 <= 1e-6f || d1 <= 1e-6f || d2 <= 1e-6f) continue;  // behind camera

        const float u0 = cx + fx * p0[0] / d0, v0 = cy - fy * p0[1] / d0;
        const float u1 = cx + fx * p1[0] / d1, v1 = cy - fy * p1[1] / d1;
        const float u2 = cx + fx * p2[0] / d2, v2 = cy - fy * p2[1] / d2;

        const float area = edge(u0, v0, u1, v1, u2, v2);
        if (std::fabs(area) < 1e-12f) continue;

        int xmin = std::max(0, (int)std::floor(std::min({u0, u1, u2})));
        int xmax = std::min(width - 1, (int)std::ceil(std::max({u0, u1, u2})));
        int ymin = std::max(0, (int)std::floor(std::min({v0, v1, v2})));
        int ymax = std::min(height - 1, (int)std::ceil(std::max({v0, v1, v2})));
        if (xmin > xmax || ymin > ymax) continue;

        const float inv_area = 1.0f / area;
        const float id0 = 1.0f / d0, id1 = 1.0f / d1, id2 = 1.0f / d2;
        for (int y = ymin; y <= ymax; ++y) {
            const float py = y + 0.5f;
            for (int x = xmin; x <= xmax; ++x) {
                const float px = x + 0.5f;
                float w0 = edge(u1, v1, u2, v2, px, py) * inv_area;
                float w1 = edge(u2, v2, u0, v0, px, py) * inv_area;
                float w2 = edge(u0, v0, u1, v1, px, py) * inv_area;
                if (w0 < 0.f || w1 < 0.f || w2 < 0.f) continue;
                const float inv_d = w0 * id0 + w1 * id1 + w2 * id2;
                const float d = 1.0f / inv_d;
                atomic_min_float(&zbuf[y * width + x], d);
            }
        }
    }

    for (int i = 0; i < n_px; ++i) {
        uint32_t bits = zbuf[i].load(std::memory_order_relaxed);
        float d;
        std::memcpy(&d, &bits, sizeof(d));
        depth_out[i] = (d >= INF) ? 0.0f : d;
    }
    delete[] zbuf;
}

}  // extern "C"
