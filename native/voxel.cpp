// Host-side voxel-grid sparse quantisation (C++).
//
// Native replacement for the MinkowskiEngine sparse_quantize dependency on
// the *host* data path (reference utils/dataset.py:218); the on-device
// equivalent lives in cppf_tpu/ops/quantize.py.  Keeps one representative
// point (smallest original index) per occupied voxel.

#include <cmath>
#include <cstdint>
#include <unordered_map>

extern "C" {

// points: [n * 3] floats; out_indices: caller-allocated [n] ints.
// Returns the number of unique voxels written to out_indices (ascending).
int voxel_downsample(const float* points, int n, float res, int* out_indices) {
    std::unordered_map<uint64_t, int> seen;
    seen.reserve(n * 2);
    int count = 0;
    for (int i = 0; i < n; ++i) {
        int64_t vx = (int64_t)std::floor(points[3 * i] / res);
        int64_t vy = (int64_t)std::floor(points[3 * i + 1] / res);
        int64_t vz = (int64_t)std::floor(points[3 * i + 2] / res);
        // 21 bits per axis with offset: exact for |v| < 2^20
        uint64_t key = (((uint64_t)(vx + (1 << 20)) & 0x1FFFFF) << 42) |
                       (((uint64_t)(vy + (1 << 20)) & 0x1FFFFF) << 21) |
                       ((uint64_t)(vz + (1 << 20)) & 0x1FFFFF);
        auto it = seen.find(key);
        if (it == seen.end()) {
            seen.emplace(key, i);
            out_indices[count++] = i;
        }
    }
    return count;
}

}  // extern "C"
