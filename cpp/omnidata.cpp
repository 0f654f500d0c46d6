// omnidata — native data-plane kernels for the OmniHuman dataset pipeline.
//
// The reference repo's data plane is pure Python (SURVEY §2 — zero
// first-party native code; its speed came from external CUDA wheels).
// Here the host-side hot loops get a real native implementation, loaded
// via ctypes (omnihuman_tpu/native.py), with NumPy fallbacks when the
// shared library is absent:
//
//   - gaussian_heatmaps: K keypoints → K×H×W Gaussian maps per frame
//     (the reference loops 308 keypoints × frames in Python,
//     omnihuman_dataset.py:838-881)
//   - frames_to_float: uint8 HWC frames → float32 CHW in [-1, 1]
//     (per-sample conversion in __getitem__)
//   - batch_normalize_audio: int16 PCM → float32 mono
//
// Threading: std::thread pool over frames/keypoints. No external deps.

#include <cmath>
#include <cstdint>
#include <cstring>
#include <algorithm>
#include <thread>
#include <vector>

namespace {

int hardware_threads() {
    unsigned n = std::thread::hardware_concurrency();
    return n == 0 ? 4 : static_cast<int>(n);
}

template <typename F>
void parallel_for(int n, F&& fn) {
    int nt = std::min(hardware_threads(), n);
    if (nt <= 1) {
        for (int i = 0; i < n; ++i) fn(i);
        return;
    }
    std::vector<std::thread> threads;
    threads.reserve(nt);
    for (int t = 0; t < nt; ++t) {
        threads.emplace_back([=]() {
            for (int i = t; i < n; i += nt) fn(i);
        });
    }
    for (auto& th : threads) th.join();
}

}  // namespace

extern "C" {

// keypoints: [T, K, 3] (x, y, conf) normalized; out: [T, K, H, W] float32.
// Matches the Python generate_heatmaps semantics: peak at (int(x*W),
// int(y*H)), Gaussian sigma, zero when conf <= conf_thr or peak outside.
void gaussian_heatmaps(const float* keypoints, int T, int K, int H, int W,
                       float sigma, float conf_thr, float* out) {
    const float inv2s2 = 1.0f / (2.0f * sigma * sigma);
    // cutoff beyond which exp() is negligible (< 1e-6)
    const int radius = static_cast<int>(std::ceil(sigma * 5.26f));

    parallel_for(T * K, [&](int tk) {
        const int t = tk / K, k = tk % K;
        float* map = out + ((size_t)t * K + k) * H * W;
        // zero inside the task: parallel first-touch beats one serial
        // memset of the whole T*K*H*W buffer
        std::memset(map, 0, sizeof(float) * (size_t)H * W);
        const float* kp = keypoints + ((size_t)t * K + k) * 3;
        const float conf = kp[2];
        if (conf <= conf_thr) return;
        const int xs = static_cast<int>(kp[0] * W);
        const int ys = static_cast<int>(kp[1] * H);
        if (xs < 0 || xs >= W || ys < 0 || ys >= H) return;
        const int y0 = std::max(0, ys - radius);
        const int y1 = std::min(H - 1, ys + radius);
        const int x0 = std::max(0, xs - radius);
        const int x1 = std::min(W - 1, xs + radius);
        for (int y = y0; y <= y1; ++y) {
            const float dy = static_cast<float>(y - ys);
            float* row = map + (size_t)y * W;
            for (int x = x0; x <= x1; ++x) {
                const float dx = static_cast<float>(x - xs);
                row[x] = std::exp(-(dx * dx + dy * dy) * inv2s2);
            }
        }
    });
}

// frames: [T, H, W, C] uint8 → out: [C, T, H, W] float32 in [-1, 1].
void frames_to_float(const uint8_t* frames, int T, int H, int W, int C,
                     float* out) {
    const float scale = 1.0f / 127.5f;
    parallel_for(T, [&](int t) {
        const uint8_t* src = frames + (size_t)t * H * W * C;
        for (int y = 0; y < H; ++y) {
            for (int x = 0; x < W; ++x) {
                const uint8_t* px = src + ((size_t)y * W + x) * C;
                for (int c = 0; c < C; ++c) {
                    out[(((size_t)c * T + t) * H + y) * W + x] =
                        px[c] * scale - 1.0f;
                }
            }
        }
    });
}

// pcm: [N] int16 interleaved `channels` → out: [N/channels] float32 mono.
void pcm16_to_float_mono(const int16_t* pcm, long long n, int channels,
                         float* out) {
    const long long frames = n / channels;
    const float scale = 1.0f / 32768.0f;
    parallel_for(static_cast<int>(std::min<long long>(frames, 1 << 30)),
                 [&](int i) {
        float acc = 0.0f;
        const int16_t* f = pcm + (size_t)i * channels;
        for (int c = 0; c < channels; ++c) acc += f[c];
        out[i] = acc * scale / channels;
    });
}

int omnidata_version() { return 1; }

}  // extern "C"
