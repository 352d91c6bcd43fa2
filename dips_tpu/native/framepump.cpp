// framepump: native host runtime for dips_tpu.
//
// The reference's host engine is native (Rust) end to end; here the JAX/XLA
// device path is driven by a thin Python layer, and the per-frame hot host
// work lives in this C++ module:
//
//   * fp_planarize  — fused BGR(A)->RGB swap + HWC->planar transpose + tile
//     padding in ONE pass (replaces cv2.cvtColor + np.moveaxis + pad copy,
//     three passes over the frame).
//   * fp_interleave — fused planar->HWC + RGB->BGR for the encode path.
//   * fp_ring_*     — a bounded single-producer single-consumer frame ring
//     with preallocated slots (the native analogue of the reference's
//     VecDeque frame ring + GStreamer streaming-thread handoff,
//     dips/src/gpu/mod.rs:53, frame_extractor.rs:206-276): the decode
//     thread stages planarized frames without per-frame allocation.
//
// Build: make -C dips_tpu/native   (g++ -O3 -shared -fPIC)
// Python binding: ctypes (dips_tpu/native/__init__.py), numpy fallback when
// the .so is absent.

#include <atomic>
#include <chrono>
#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <mutex>
#include <new>

extern "C" {

// HWC uint8 (h, w, c_in) -> planar uint8 (3, hp, wp), zero-padded.
// swap_rb: treat input as BGR(A) and emit RGB planes (cv2 decode path).
// c_in: 3 or 4 (RGBA dumps have a stride of 4).
void fp_planarize(const uint8_t* src, int64_t h, int64_t w, int64_t c_in,
                  int64_t row_stride, uint8_t* dst, int64_t hp, int64_t wp,
                  int swap_rb) {
    const int64_t plane = hp * wp;
    // zero ONLY the padding (right dead zone per row + bottom rows): a
    // whole-destination memset rewrote ~6 MB/frame at 1080p to clear
    // ~46 KB of actual pad in the decode hot path
    if (wp > w || hp > h) {
        for (int64_t ch = 0; ch < 3; ++ch) {
            uint8_t* pl = dst + ch * plane;
            if (wp > w) {
                for (int64_t y = 0; y < h; ++y) {
                    std::memset(pl + y * wp + w, 0, wp - w);
                }
            }
            if (hp > h) {
                std::memset(pl + h * wp, 0, (hp - h) * wp);
            }
        }
    }
    const int r_off = swap_rb ? 2 : 0;
    const int b_off = swap_rb ? 0 : 2;
    for (int64_t y = 0; y < h; ++y) {
        const uint8_t* row = src + y * row_stride;
        uint8_t* pr = dst + y * wp;
        uint8_t* pg = dst + plane + y * wp;
        uint8_t* pb = dst + 2 * plane + y * wp;
        for (int64_t x = 0; x < w; ++x) {
            const uint8_t* px = row + x * c_in;
            pr[x] = px[r_off];
            pg[x] = px[1];
            pb[x] = px[b_off];
        }
    }
}

// planar uint8 (c, hp, wp) -> HWC uint8 (h, w, 3), cropping padding.
// swap_rb: emit BGR (for cv2 encode). c == 1 broadcasts gray to 3 channels.
void fp_interleave(const uint8_t* src, int64_t c, int64_t hp, int64_t wp,
                   int64_t h, int64_t w, uint8_t* dst, int swap_rb) {
    const int64_t plane = hp * wp;
    const uint8_t* sr = src;
    const uint8_t* sg = (c >= 2) ? src + plane : src;
    const uint8_t* sb = (c >= 3) ? src + 2 * plane : src;
    const int o0 = swap_rb ? 2 : 0;
    const int o2 = swap_rb ? 0 : 2;
    for (int64_t y = 0; y < h; ++y) {
        const uint8_t* r = sr + y * wp;
        const uint8_t* g = sg + y * wp;
        const uint8_t* b = sb + y * wp;
        uint8_t* row = dst + y * w * 3;
        for (int64_t x = 0; x < w; ++x) {
            row[x * 3 + o0] = r[x];
            row[x * 3 + 1] = g[x];
            row[x * 3 + o2] = b[x];
        }
    }
}

// ---------------------------------------------------------------------------
// SPSC bounded frame ring with preallocated fixed-size slots.
// ---------------------------------------------------------------------------

struct FpRing {
    uint8_t* buf = nullptr;
    int64_t slot_bytes = 0;
    int64_t slots = 0;
    std::atomic<int64_t> head{0};  // next slot to pop
    std::atomic<int64_t> tail{0};  // next slot to push
    std::atomic<bool> closed{false};
    std::mutex mu;
    std::condition_variable cv_push, cv_pop;
};

void* fp_ring_create(int64_t slots, int64_t slot_bytes) {
    auto* r = new (std::nothrow) FpRing();
    if (!r) return nullptr;
    r->buf = new (std::nothrow) uint8_t[slots * slot_bytes];
    if (!r->buf) { delete r; return nullptr; }
    r->slots = slots;
    r->slot_bytes = slot_bytes;
    return r;
}

void fp_ring_destroy(void* ring) {
    auto* r = static_cast<FpRing*>(ring);
    delete[] r->buf;
    delete r;
}

// Blocking push; returns 0 on success, -1 if the ring was closed.
int fp_ring_push(void* ring, const uint8_t* data, int64_t n) {
    auto* r = static_cast<FpRing*>(ring);
    std::unique_lock<std::mutex> lk(r->mu);
    r->cv_push.wait(lk, [&] {
        return r->closed.load() ||
               (r->tail.load() - r->head.load()) < r->slots;
    });
    if (r->closed.load()) return -1;
    const int64_t slot = r->tail.load() % r->slots;
    const int64_t m = n < r->slot_bytes ? n : r->slot_bytes;
    std::memcpy(r->buf + slot * r->slot_bytes, data, m);
    r->tail.fetch_add(1);
    r->cv_pop.notify_one();
    return 0;
}

// Blocking pop with timeout; returns 0 on success, -1 closed+empty,
// -2 timeout.
int fp_ring_pop(void* ring, uint8_t* out, int64_t n, int64_t timeout_ms) {
    auto* r = static_cast<FpRing*>(ring);
    std::unique_lock<std::mutex> lk(r->mu);
    const bool ok = r->cv_pop.wait_for(
        lk, std::chrono::milliseconds(timeout_ms), [&] {
            return r->closed.load() || r->tail.load() > r->head.load();
        });
    if (!ok) return -2;
    if (r->tail.load() == r->head.load()) return -1;  // closed and drained
    const int64_t slot = r->head.load() % r->slots;
    const int64_t m = n < r->slot_bytes ? n : r->slot_bytes;
    std::memcpy(out, r->buf + slot * r->slot_bytes, m);
    r->head.fetch_add(1);
    r->cv_push.notify_one();
    return 0;
}

// Close the ring: producers stop, consumers drain then get -1.
void fp_ring_close(void* ring) {
    auto* r = static_cast<FpRing*>(ring);
    std::lock_guard<std::mutex> lk(r->mu);
    r->closed.store(true);
    r->cv_push.notify_all();
    r->cv_pop.notify_all();
}

int64_t fp_ring_size(void* ring) {
    auto* r = static_cast<FpRing*>(ring);
    return r->tail.load() - r->head.load();
}

}  // extern "C"
