// Native host-boundary runtime: SPSC byte ring + IQ format converters.
//
// Parity: the reference's hot host-side plumbing is native (the
// double-mapped ring of the `vmcircbuffer` crate behind
// src/runtime/buffer/circular.rs, and futuredsp's typed converters).
// Here the device does all DSP; the host-side hot path that remains is
// ingest/egress — raw SDR capture formats (interleaved i8/i16/f32 IQ)
// converted into the planar float32 (re, im) pairs the device wants, and
// a lock-free single-producer/single-consumer ring that lets a reader
// thread stay ahead of the executor without the GIL.
//
// Built as a plain C ABI shared object, loaded via ctypes
// (futuresdr_tpu/native.py). No pybind11 dependency by design.

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <cstdlib>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// format converters: interleaved IQ -> planar float re/im
// ---------------------------------------------------------------------------

// int8 interleaved (e.g. HackRF) -> planar f32, scaled 1/128
void cs8_to_planar_f32(const int8_t* in, float* re, float* im, int64_t n) {
    constexpr float k = 1.0f / 128.0f;
    for (int64_t i = 0; i < n; ++i) {
        re[i] = k * static_cast<float>(in[2 * i]);
        im[i] = k * static_cast<float>(in[2 * i + 1]);
    }
}

// offset-uint8 interleaved (rtl_tcp wire format) -> planar f32 in [-1, 1]
void cu8_to_planar_f32(const uint8_t* in, float* re, float* im, int64_t n) {
    constexpr float k = 1.0f / 127.5f;
    for (int64_t i = 0; i < n; ++i) {
        re[i] = k * (static_cast<float>(in[2 * i]) - 127.5f);
        im[i] = k * (static_cast<float>(in[2 * i + 1]) - 127.5f);
    }
}

// int16 interleaved (sc16, USRP/RTL float path) -> planar f32, 1/32768
void cs16_to_planar_f32(const int16_t* in, float* re, float* im, int64_t n) {
    constexpr float k = 1.0f / 32768.0f;
    for (int64_t i = 0; i < n; ++i) {
        re[i] = k * static_cast<float>(in[2 * i]);
        im[i] = k * static_cast<float>(in[2 * i + 1]);
    }
}

// float32 interleaved (cf32) -> planar f32
void cf32_to_planar_f32(const float* in, float* re, float* im, int64_t n) {
    for (int64_t i = 0; i < n; ++i) {
        re[i] = in[2 * i];
        im[i] = in[2 * i + 1];
    }
}

// planar f32 -> interleaved cf32 (egress)
void planar_f32_to_cf32(const float* re, const float* im, float* out,
                        int64_t n) {
    for (int64_t i = 0; i < n; ++i) {
        out[2 * i] = re[i];
        out[2 * i + 1] = im[i];
    }
}

// planar f32 -> interleaved sc16 with clipping (egress to SDR formats)
void planar_f32_to_cs16(const float* re, const float* im, int16_t* out,
                        int64_t n) {
    for (int64_t i = 0; i < n; ++i) {
        float r = re[i] * 32767.0f;
        float q = im[i] * 32767.0f;
        if (r > 32767.0f) r = 32767.0f;
        if (r < -32768.0f) r = -32768.0f;
        if (q > 32767.0f) q = 32767.0f;
        if (q < -32768.0f) q = -32768.0f;
        out[2 * i] = static_cast<int16_t>(r);
        out[2 * i + 1] = static_cast<int16_t>(q);
    }
}

// ---------------------------------------------------------------------------
// SPSC byte ring (power-of-two capacity)
// ---------------------------------------------------------------------------

struct Ring {
    uint8_t* buf;
    uint64_t capacity;  // power of two
    std::atomic<uint64_t> head;  // write position (bytes, monotonically ++)
    std::atomic<uint64_t> tail;  // read position
};

void* ring_create(uint64_t capacity) {
    // round up to power of two
    uint64_t cap = 1;
    while (cap < capacity) cap <<= 1;
    Ring* r = new Ring();
    r->buf = static_cast<uint8_t*>(std::malloc(cap));
    if (!r->buf) {
        delete r;
        return nullptr;
    }
    r->capacity = cap;
    r->head.store(0);
    r->tail.store(0);
    return r;
}

void ring_destroy(void* rp) {
    Ring* r = static_cast<Ring*>(rp);
    if (!r) return;
    std::free(r->buf);
    delete r;
}

uint64_t ring_capacity(void* rp) {
    return static_cast<Ring*>(rp)->capacity;
}

uint64_t ring_readable(void* rp) {
    Ring* r = static_cast<Ring*>(rp);
    return r->head.load(std::memory_order_acquire) -
           r->tail.load(std::memory_order_relaxed);
}

uint64_t ring_writable(void* rp) {
    Ring* r = static_cast<Ring*>(rp);
    return r->capacity - (r->head.load(std::memory_order_relaxed) -
                          r->tail.load(std::memory_order_acquire));
}

// producer: copy up to n bytes in; returns bytes accepted
uint64_t ring_write(void* rp, const uint8_t* src, uint64_t n) {
    Ring* r = static_cast<Ring*>(rp);
    uint64_t head = r->head.load(std::memory_order_relaxed);
    uint64_t tail = r->tail.load(std::memory_order_acquire);
    uint64_t space = r->capacity - (head - tail);
    if (n > space) n = space;
    uint64_t pos = head & (r->capacity - 1);
    uint64_t first = n < (r->capacity - pos) ? n : (r->capacity - pos);
    std::memcpy(r->buf + pos, src, first);
    if (n > first) std::memcpy(r->buf, src + first, n - first);
    r->head.store(head + n, std::memory_order_release);
    return n;
}

// consumer: copy up to n bytes out; returns bytes read
uint64_t ring_read(void* rp, uint8_t* dst, uint64_t n) {
    Ring* r = static_cast<Ring*>(rp);
    uint64_t head = r->head.load(std::memory_order_acquire);
    uint64_t tail = r->tail.load(std::memory_order_relaxed);
    uint64_t avail = head - tail;
    if (n > avail) n = avail;
    uint64_t pos = tail & (r->capacity - 1);
    uint64_t first = n < (r->capacity - pos) ? n : (r->capacity - pos);
    std::memcpy(dst, r->buf + pos, first);
    if (n > first) std::memcpy(dst + first, r->buf, n - first);
    r->tail.store(tail + n, std::memory_order_release);
    return n;
}

}  // extern "C"

// ---------------------------------------------------------------------------
// hard-decision Viterbi with erasures (rate 1/2), templated on constraint
// length. Replaces the Python ACS loop for the WLAN (K=7, 133/171) and M17
// (K=5, 31/27) decoders — the host-side hot path of frame decoding.
// ---------------------------------------------------------------------------

namespace {

template <int K>
struct Trellis {
    static constexpr int NS = 1 << (K - 1);
    uint8_t e0[NS][2];  // expected bits for pred0 -> n
    uint8_t e1[NS][2];
    int pred0[NS];
    int pred1[NS];
    uint8_t bit_of[NS];

    Trellis(uint32_t g0, uint32_t g1) {
        auto parity = [](uint32_t v) {
            return static_cast<uint8_t>(__builtin_popcount(v) & 1);
        };
        uint8_t out[2][NS][2];
        for (int s = 0; s < NS; ++s) {
            for (int b = 0; b < 2; ++b) {
                uint32_t reg = (static_cast<uint32_t>(b) << (K - 1)) | s;
                out[b][s][0] = parity(reg & g0);
                out[b][s][1] = parity(reg & g1);
            }
        }
        for (int n = 0; n < NS; ++n) {
            bit_of[n] = n >> (K - 2);
            pred0[n] = (n & ((NS >> 1) - 1)) << 1;
            pred1[n] = pred0[n] | 1;
            e0[n][0] = out[bit_of[n]][pred0[n]][0];
            e0[n][1] = out[bit_of[n]][pred0[n]][1];
            e1[n][0] = out[bit_of[n]][pred1[n]][0];
            e1[n][1] = out[bit_of[n]][pred1[n]][1];
        }
    }
};

template <int K>
void viterbi_decode_impl(uint32_t g0, uint32_t g1, const uint8_t* coded,
                         const uint8_t* erasures, int64_t n_bits,
                         uint8_t* out) {
    static thread_local Trellis<K>* tr = nullptr;
    static thread_local uint32_t tg0 = 0, tg1 = 0;
    if (!tr || tg0 != g0 || tg1 != g1) {
        delete tr;
        tr = new Trellis<K>(g0, g1);
        tg0 = g0;
        tg1 = g1;
    }
    constexpr int NS = Trellis<K>::NS;
    float metric[NS], next[NS];
    for (int s = 0; s < NS; ++s) metric[s] = 1e6f;
    metric[0] = 0.0f;
    uint8_t* dec = static_cast<uint8_t*>(std::malloc(n_bits * NS));
    for (int64_t t = 0; t < n_bits; ++t) {
        uint8_t r0 = coded[2 * t], r1 = coded[2 * t + 1];
        float v0 = erasures && erasures[2 * t] ? 0.0f : 1.0f;
        float v1 = erasures && erasures[2 * t + 1] ? 0.0f : 1.0f;
        uint8_t* drow = dec + t * NS;
        for (int n = 0; n < NS; ++n) {
            float bm0 = (tr->e0[n][0] != r0) * v0 + (tr->e0[n][1] != r1) * v1;
            float bm1 = (tr->e1[n][0] != r0) * v0 + (tr->e1[n][1] != r1) * v1;
            float m0 = metric[tr->pred0[n]] + bm0;
            float m1 = metric[tr->pred1[n]] + bm1;
            bool take1 = m1 < m0;
            next[n] = take1 ? m1 : m0;
            drow[n] = take1;
        }
        float mn = next[0];
        for (int n = 1; n < NS; ++n) mn = next[n] < mn ? next[n] : mn;
        for (int n = 0; n < NS; ++n) metric[n] = next[n] - mn;
    }
    int s = 0;
    float best = metric[0];
    for (int n = 1; n < NS; ++n)
        if (metric[n] < best) { best = metric[n]; s = n; }
    for (int64_t t = n_bits - 1; t >= 0; --t) {
        out[t] = tr->bit_of[s];
        s = dec[t * NS + s] ? tr->pred1[s] : tr->pred0[s];
    }
    std::free(dec);
}

template <int K>
void viterbi_soft_impl(uint32_t g0, uint32_t g1, const float* llrs,
                       int64_t n_bits, uint8_t* out) {
    // soft-decision variant: llrs[2t] per channel bit, positive = bit 1
    // (zero = erasure). Branch cost for expected bit e is e ? -l : +l.
    static thread_local Trellis<K>* tr = nullptr;
    static thread_local uint32_t tg0 = 0, tg1 = 0;
    if (!tr || tg0 != g0 || tg1 != g1) {
        delete tr;
        tr = new Trellis<K>(g0, g1);
        tg0 = g0;
        tg1 = g1;
    }
    constexpr int NS = Trellis<K>::NS;
    float metric[NS], next[NS];
    for (int s = 0; s < NS; ++s) metric[s] = 1e6f;
    metric[0] = 0.0f;
    uint8_t* dec = static_cast<uint8_t*>(std::malloc(n_bits * NS));
    for (int64_t t = 0; t < n_bits; ++t) {
        float l0 = llrs[2 * t], l1 = llrs[2 * t + 1];
        uint8_t* drow = dec + t * NS;
        for (int n = 0; n < NS; ++n) {
            float bm0 = (tr->e0[n][0] ? -l0 : l0) + (tr->e0[n][1] ? -l1 : l1);
            float bm1 = (tr->e1[n][0] ? -l0 : l0) + (tr->e1[n][1] ? -l1 : l1);
            float m0 = metric[tr->pred0[n]] + bm0;
            float m1 = metric[tr->pred1[n]] + bm1;
            bool take1 = m1 < m0;
            next[n] = take1 ? m1 : m0;
            drow[n] = take1;
        }
        float mn = next[0];
        for (int n = 1; n < NS; ++n) mn = next[n] < mn ? next[n] : mn;
        for (int n = 0; n < NS; ++n) metric[n] = next[n] - mn;
    }
    int s = 0;
    float best = metric[0];
    for (int n = 1; n < NS; ++n)
        if (metric[n] < best) { best = metric[n]; s = n; }
    for (int64_t t = n_bits - 1; t >= 0; --t) {
        out[t] = tr->bit_of[s];
        s = dec[t * NS + s] ? tr->pred1[s] : tr->pred0[s];
    }
    std::free(dec);
}

}  // namespace

extern "C" {

void viterbi_r12_soft(int k, uint32_t g0, uint32_t g1, const float* llrs,
                      int64_t n_bits, uint8_t* out) {
    if (k == 7) {
        viterbi_soft_impl<7>(g0, g1, llrs, n_bits, out);
    } else if (k == 5) {
        viterbi_soft_impl<5>(g0, g1, llrs, n_bits, out);
    }
}

void viterbi_r12(int k, uint32_t g0, uint32_t g1, const uint8_t* coded,
                 const uint8_t* erasures, int64_t n_bits, uint8_t* out) {
    if (k == 7) {
        viterbi_decode_impl<7>(g0, g1, coded, erasures, n_bits, out);
    } else if (k == 5) {
        viterbi_decode_impl<5>(g0, g1, coded, erasures, n_bits, out);
    }
}

}  // extern "C"

// ---------------------------------------------------------------------------
// UDP ingest: a native reader thread drains a socket straight into the
// SPSC ring without touching the GIL — the TPU-native form of the
// reference's #[blocking] hardware-driver threads (seify/source.rs:53)
// for network-attached radios (rtl_tcp-style streamers, UDP IQ taps).
// Whole datagrams only: a packet that doesn't fit is counted as dropped
// (UDP loss semantics) so sample framing never tears mid-item.
// ---------------------------------------------------------------------------

#include <arpa/inet.h>
#include <netinet/in.h>
#include <poll.h>
#include <sys/socket.h>
#include <unistd.h>

#include <thread>
#include <vector>

namespace {

struct UdpReader {
    int fd = -1;
    int item_bytes = 1;
    Ring* ring = nullptr;
    std::thread th;
    std::atomic<bool> stop{false};
    std::atomic<uint64_t> packets{0};
    std::atomic<uint64_t> bytes{0};
    std::atomic<uint64_t> dropped{0};
};

}  // namespace

extern "C" {

void* udp_reader_start(const char* bind_ip, int port, void* ring,
                       int rcvbuf_bytes, int item_bytes) {
    int fd = ::socket(AF_INET, SOCK_DGRAM, 0);
    if (fd < 0) return nullptr;
    int one = 1;
    ::setsockopt(fd, SOL_SOCKET, SO_REUSEADDR, &one, sizeof(one));
    if (rcvbuf_bytes > 0) {
        ::setsockopt(fd, SOL_SOCKET, SO_RCVBUF, &rcvbuf_bytes,
                     sizeof(rcvbuf_bytes));
    }
    sockaddr_in addr{};
    addr.sin_family = AF_INET;
    addr.sin_port = htons(static_cast<uint16_t>(port));
    addr.sin_addr.s_addr =
        (bind_ip && *bind_ip) ? ::inet_addr(bind_ip) : INADDR_ANY;
    if (::bind(fd, reinterpret_cast<sockaddr*>(&addr), sizeof(addr)) < 0) {
        ::close(fd);
        return nullptr;
    }
    UdpReader* u = new UdpReader();
    u->fd = fd;
    u->item_bytes = item_bytes > 0 ? item_bytes : 1;
    u->ring = static_cast<Ring*>(ring);
    u->th = std::thread([u] {
        std::vector<uint8_t> buf(1 << 16);
        pollfd p{u->fd, POLLIN, 0};
        while (!u->stop.load(std::memory_order_relaxed)) {
            int pr = ::poll(&p, 1, 100);  // 100 ms: cheap stop latency
            if (pr <= 0) continue;
            ssize_t n = ::recv(u->fd, buf.data(), buf.size(), 0);
            if (n <= 0) continue;
            u->packets.fetch_add(1, std::memory_order_relaxed);
            uint64_t need = static_cast<uint64_t>(n);
            // item-misaligned datagrams are malformed for this wire
            // format: admitting one would shift every later sample's
            // I/Q planes (drops are whole datagrams, so ring content
            // must stay item-aligned at all times)
            if (need % static_cast<uint64_t>(u->item_bytes) != 0 ||
                ring_writable(u->ring) < need) {
                u->dropped.fetch_add(1, std::memory_order_relaxed);
                continue;  // drop the whole datagram, keep framing
            }
            ring_write(u->ring, buf.data(), need);
            u->bytes.fetch_add(need, std::memory_order_relaxed);
        }
    });
    return u;
}

int udp_reader_port(void* up) {
    UdpReader* u = static_cast<UdpReader*>(up);
    sockaddr_in addr{};
    socklen_t len = sizeof(addr);
    if (::getsockname(u->fd, reinterpret_cast<sockaddr*>(&addr), &len) < 0)
        return -1;
    return static_cast<int>(ntohs(addr.sin_port));
}

// which: 0 = packets received, 1 = bytes ringed, 2 = datagrams dropped
uint64_t udp_reader_stat(void* up, int which) {
    UdpReader* u = static_cast<UdpReader*>(up);
    switch (which) {
        case 0: return u->packets.load();
        case 1: return u->bytes.load();
        case 2: return u->dropped.load();
    }
    return 0;
}

void udp_reader_stop(void* up) {
    UdpReader* u = static_cast<UdpReader*>(up);
    if (!u) return;
    u->stop.store(true);
    if (u->th.joinable()) u->th.join();
    ::close(u->fd);
    delete u;
}

}  // extern "C"

// ---------------------------------------------------------------------------
// Polar CRC-aided successive-cancellation LIST decoder (LLR-based SCL,
// Stimming et al.) with Tal–Vardy copy-on-write memory banks. The
// rattlegram OFDM modem's decode floor was the pure-Python SCL walk
// (~151 ms per N=2048/L=8 frame — 97% of the receiver's wall time); the
// reference decodes its polar code natively too (examples/rattlegram/
// src/polar.rs). Bit/layer semantics match futuresdr_tpu/models/
// rattlegram/polar.py exactly (min-sum f, exact g, stable 2L->L
// survivor sort); outputs are the L codeword estimates x = u*G in
// metric order so the host only re-reads systematic bits + CRC-selects.
// ---------------------------------------------------------------------------

namespace polar_scl {

struct Layer {
    // banks: L usable + L spare so a copy target always exists
    std::vector<std::vector<float>> P;      // [2L][sz]
    std::vector<std::vector<uint8_t>> C;    // [2L][2*sz]
    std::vector<int> prefP, prefC;          // bank id per path
    std::vector<int> refP, refC;            // refcount per bank
    int sz = 0;

    void init(int L, int s) {
        sz = s;
        P.assign(2 * L, std::vector<float>(s, 0.f));
        C.assign(2 * L, std::vector<uint8_t>(2 * s, 0));
        prefP.resize(L);
        prefC.resize(L);
        refP.assign(2 * L, 0);
        refC.assign(2 * L, 0);
        for (int l = 0; l < L; ++l) {
            prefP[l] = l;
            prefC[l] = l;
            refP[l] = 1;
            refC[l] = 1;
        }
    }
    int freshP() {
        for (size_t i = 0; i < refP.size(); ++i)
            if (refP[i] == 0) return (int)i;
        return -1;  // unreachable: 2L banks, <=L live refs
    }
    int freshC() {
        for (size_t i = 0; i < refC.size(); ++i)
            if (refC[i] == 0) return (int)i;
        return -1;
    }
    float* readP(int l) { return P[prefP[l]].data(); }
    uint8_t* readC(int l) { return C[prefC[l]].data(); }
    float* writeP(int l) {
        int b = prefP[l];
        if (refP[b] > 1) {
            int nb = freshP();
            std::copy(P[b].begin(), P[b].end(), P[nb].begin());
            refP[b]--;
            refP[nb] = 1;
            prefP[l] = nb;
            b = nb;
        }
        return P[b].data();
    }
    uint8_t* writeC(int l) {
        int b = prefC[l];
        if (refC[b] > 1) {
            int nb = freshC();
            std::copy(C[b].begin(), C[b].end(), C[nb].begin());
            refC[b]--;
            refC[nb] = 1;
            prefC[l] = nb;
            b = nb;
        }
        return C[b].data();
    }
    void clone(int dst, int src) {  // dst takes src's banks (shared)
        refP[prefP[dst]]--;
        refC[prefC[dst]]--;
        prefP[dst] = prefP[src];
        prefC[dst] = prefC[src];
        refP[prefP[dst]]++;
        refC[prefC[dst]]++;
    }
};

struct Scl {
    int m, n, L;
    std::vector<Layer> lay;  // lay[d]: sz = n >> d
    std::vector<double> pm;
    // decision history tree instead of per-path u_leaf arrays: copying
    // each survivor's full n-byte leaf vector per info bit would be
    // O(n^2 L) memcpy — the exact cost the CoW banks exist to avoid.
    // hist_src[phi*L + l] = the path at phi-1 this slot continued;
    // hist_bit = the bit it chose. Final paths reconstruct by walking
    // the tree backwards once, O(n) per path.
    std::vector<int> hist_src;      // [n*L]
    std::vector<uint8_t> hist_bit;  // [n*L]

    void calc_P(int lam, int phi) {
        if (lam == 0) return;
        if (phi % 2 == 0) calc_P(lam - 1, phi >> 1);
        int half = n >> lam;
        for (int l = 0; l < L; ++l) {
            const float* par = lay[lam - 1].readP(l);
            float* out = lay[lam].writeP(l);
            if (phi % 2 == 0) {
                for (int i = 0; i < half; ++i) {
                    float a = par[i], b = par[half + i];
                    float s = ((a < 0) != (b < 0)) ? -1.f : 1.f;
                    out[i] = s * std::min(std::fabs(a), std::fabs(b));
                }
            } else {
                const uint8_t* c = lay[lam].readC(l);  // row 0 = u1
                for (int i = 0; i < half; ++i) {
                    float a = par[i], b = par[half + i];
                    out[i] = b + (1.f - 2.f * (float)c[i]) * a;
                }
            }
        }
    }

    void update_C(int lam, int phi) {
        int psi = phi >> 1;
        int half = n >> lam;
        for (int l = 0; l < L; ++l) {
            const uint8_t* child = lay[lam].readC(l);
            uint8_t* par = lay[lam - 1].writeC(l);
            uint8_t* dst = par + (psi % 2) * (n >> (lam - 1));
            for (int i = 0; i < half; ++i) {
                dst[i] = child[i] ^ child[half + i];
                dst[half + i] = child[half + i];
            }
        }
        if (psi % 2 == 1) update_C(lam - 1, psi);
    }

    void run(const float* llr, const uint8_t* frozen) {
        lay.resize(m + 1);
        for (int d = 0; d <= m; ++d) lay[d].init(L, n >> d);
        pm.assign(L, 1e30);
        pm[0] = 0.0;
        for (int l = 0; l < L; ++l) {
            float* p0 = lay[0].writeP(l);
            std::copy(llr, llr + n, p0);
        }
        hist_src.assign((size_t)n * L, 0);
        hist_bit.assign((size_t)n * L, 0);

        std::vector<double> both(2 * L);
        std::vector<int> order(2 * L);
        for (int phi = 0; phi < n; ++phi) {
            calc_P(m, phi);
            if (frozen[phi]) {
                for (int l = 0; l < L; ++l) {
                    float leaf = lay[m].readP(l)[0];
                    if (leaf < 0) pm[l] += std::fabs(leaf);
                    hist_src[(size_t)phi * L + l] = l;
                    hist_bit[(size_t)phi * L + l] = 0;
                    lay[m].writeC(l)[phi % 2] = 0;
                }
            } else {
                for (int l = 0; l < L; ++l) {
                    float leaf = lay[m].readP(l)[0];
                    double pen = std::fabs(leaf);
                    both[l] = pm[l] + (leaf < 0 ? pen : 0.0);      // bit 0
                    both[L + l] = pm[l] + (leaf >= 0 ? pen : 0.0); // bit 1
                }
                for (int i = 0; i < 2 * L; ++i) order[i] = i;
                std::stable_sort(order.begin(), order.end(),
                                 [&](int a, int b) { return both[a] < both[b]; });
                // survivors: paths keep[i] -> slot i. Work on copies of
                // the path-indexed state (bank indirection makes clone
                // O(m), not O(n)).
                std::vector<double> npm(L);
                std::vector<int> srcs(L);
                std::vector<uint8_t> bits(L);
                for (int i = 0; i < L; ++i) {
                    srcs[i] = order[i] % L;
                    bits[i] = (uint8_t)(order[i] / L);
                    npm[i] = both[order[i]];
                    hist_src[(size_t)phi * L + i] = srcs[i];
                    hist_bit[(size_t)phi * L + i] = bits[i];
                }
                // re-point banks: snapshot only the per-path BANK IDS
                // (O(m·L) ints — the whole point of the CoW banks),
                // then share src's banks under the new path slots
                for (int d = 0; d <= m; ++d) {
                    Layer& ld = lay[d];
                    std::vector<int> sp = ld.prefP, sc = ld.prefC;
                    std::fill(ld.refP.begin(), ld.refP.end(), 0);
                    std::fill(ld.refC.begin(), ld.refC.end(), 0);
                    for (int i = 0; i < L; ++i) {
                        ld.prefP[i] = sp[srcs[i]];
                        ld.prefC[i] = sc[srcs[i]];
                        ld.refP[ld.prefP[i]]++;
                        ld.refC[ld.prefC[i]]++;
                    }
                }
                pm = npm;
                for (int i = 0; i < L; ++i) {
                    lay[m].writeC(i)[phi % 2] = bits[i];
                }
            }
            if (phi % 2 == 1) update_C(m, phi);
        }
    }
};

void transform_inplace(uint8_t* x, int n) {
    for (int h = 1; h < n; h *= 2)
        for (int i = 0; i < n; i += 2 * h)
            for (int j = 0; j < h; ++j) x[i + j] ^= x[i + h + j];
}

}  // namespace polar_scl

extern "C" {

// llr[n], frozen[n] -> x_out[L*n] codeword estimates (metric-ascending
// order), pm_out[L] path metrics. n = 1<<m.
void polar_scl_decode(int m, int L, const float* llr, const uint8_t* frozen,
                      uint8_t* x_out, double* pm_out) {
    polar_scl::Scl s;
    s.m = m;
    s.n = 1 << m;
    s.L = L;
    s.run(llr, frozen);
    std::vector<int> order(L);
    for (int i = 0; i < L; ++i) order[i] = i;
    std::stable_sort(order.begin(), order.end(),
                     [&](int a, int b) { return s.pm[a] < s.pm[b]; });
    for (int i = 0; i < L; ++i) {
        uint8_t* dst = x_out + (size_t)i * s.n;
        int cur = order[i];
        for (int phi = s.n - 1; phi >= 0; --phi) {
            dst[phi] = s.hist_bit[(size_t)phi * L + cur];
            cur = s.hist_src[(size_t)phi * L + cur];
        }
        polar_scl::transform_inplace(dst, s.n);
        pm_out[i] = s.pm[order[i]];
    }
}

}  // extern "C"
