// Native host-side I/O runtime for sonar_3d_reconstruction_tpu.
//
// The TPU owns all mapping compute; the host-side hot loops of bag replay —
// CDR deserialization of thousands of sensor_msgs/Image and
// nav_msgs/Odometry blobs, approximate time pairing, and PointCloud2 XYZI
// byte packing (the reference node's per-point struct.pack loop,
// scripts/3d_mapper_node.py:437-442) — run here, GIL-free, exposed to
// Python via ctypes (sonar_3d_reconstruction_tpu/io/native.py, which keeps
// a pure-Python fallback with identical semantics).
//
// CDR notes: XCDR1, alignment relative to byte 4 (after the encapsulation
// header); little- and big-endian representations supported (the reference
// sensors emit little-endian).

#include <cstdint>
#include <cstring>
#include <cmath>

namespace {

struct CdrReader {
    const uint8_t* buf;   // payload (after 4-byte encapsulation header)
    size_t len;
    size_t pos = 0;
    bool little = true;
    bool ok = true;

    CdrReader(const uint8_t* blob, size_t blob_len) {
        if (blob_len < 4) { buf = nullptr; len = 0; ok = false; return; }
        little = blob[1] == 0x01;
        buf = blob + 4;
        len = blob_len - 4;
    }

    void align(size_t size) {
        size_t rem = pos % size;
        if (rem) pos += size - rem;
    }

    bool have(size_t n) {
        if (pos + n > len) { ok = false; return false; }
        return true;
    }

    uint8_t u8() {
        if (!have(1)) return 0;
        return buf[pos++];
    }

    uint32_t u32() {
        align(4);
        if (!have(4)) return 0;
        uint32_t v;
        std::memcpy(&v, buf + pos, 4);
        pos += 4;
        if (!little) v = __builtin_bswap32(v);
        return v;
    }

    int32_t i32() { return static_cast<int32_t>(u32()); }

    double f64() {
        align(8);
        if (!have(8)) return 0.0;
        uint64_t v;
        std::memcpy(&v, buf + pos, 8);
        pos += 8;
        if (!little) v = __builtin_bswap64(v);
        double d;
        std::memcpy(&d, &v, 8);
        return d;
    }

    // CDR string: u32 length INCLUDING the null terminator, then bytes.
    // Copies up to cap-1 chars into out (null-terminated); returns length.
    uint32_t str(char* out, uint32_t cap) {
        uint32_t n = u32();
        if (!have(n)) return 0;
        uint32_t copy = n > 0 ? n - 1 : 0;
        if (out && cap) {
            uint32_t c = copy < cap - 1 ? copy : cap - 1;
            std::memcpy(out, buf + pos, c);
            out[c] = 0;
        }
        pos += n;
        return copy;
    }

    void skip_str() { str(nullptr, 0); }
};

}  // namespace

extern "C" {

// ---------------------------------------------------------------------------
// Batch nav_msgs/Odometry decode.
//   blobs: concatenated CDR blobs; offsets: (n+1) byte offsets into blobs.
//   out_stamps (n,), out_positions (n,3), out_quaternions (n,4) xyzw.
// Returns number decoded, or -(1+index) of the first malformed blob.
// ---------------------------------------------------------------------------
int odometry_decode_batch(
    const uint8_t* blobs,
    const int64_t* offsets,
    int64_t n,
    double* out_stamps,
    double* out_positions,
    double* out_quaternions)
{
    for (int64_t i = 0; i < n; ++i) {
        CdrReader r(blobs + offsets[i],
                    static_cast<size_t>(offsets[i + 1] - offsets[i]));
        int32_t sec = r.i32();
        uint32_t nsec = r.u32();
        r.skip_str();  // header.frame_id
        r.skip_str();  // child_frame_id
        for (int k = 0; k < 3; ++k) out_positions[i * 3 + k] = r.f64();
        for (int k = 0; k < 4; ++k) out_quaternions[i * 4 + k] = r.f64();
        if (!r.ok) return -static_cast<int>(i) - 1;
        out_stamps[i] = static_cast<double>(sec) + 1e-9 * nsec;
    }
    return static_cast<int>(n);
}

// ---------------------------------------------------------------------------
// Batch sensor_msgs/Image decode into a dense (n, height, width) uint8 block.
//   Every image must match the given height/width and be mono8 or mono16
//   (mono16 is scaled /256 to uint8 exactly like the reference,
//   scripts/3d_mapper_node.py:308-310).
//   out_stamps (n,), out_images (n*height*width,).
// Returns number decoded, or -(1+index) of the first mismatched/malformed blob.
// ---------------------------------------------------------------------------
int image_decode_batch(
    const uint8_t* blobs,
    const int64_t* offsets,
    int64_t n,
    int32_t height,
    int32_t width,
    double* out_stamps,
    uint8_t* out_images)
{
    const size_t hw = static_cast<size_t>(height) * width;
    for (int64_t i = 0; i < n; ++i) {
        CdrReader r(blobs + offsets[i],
                    static_cast<size_t>(offsets[i + 1] - offsets[i]));
        int32_t sec = r.i32();
        uint32_t nsec = r.u32();
        r.skip_str();  // frame_id
        uint32_t h = r.u32();
        uint32_t w = r.u32();
        char enc[32];
        r.str(enc, sizeof enc);
        uint8_t bigendian = r.u8();
        uint32_t step = r.u32();
        uint32_t data_len = r.u32();
        if (!r.ok || h != static_cast<uint32_t>(height) ||
            w != static_cast<uint32_t>(width) || !r.have(data_len))
            return -static_cast<int>(i) - 1;

        const uint8_t* data = r.buf + r.pos;
        uint8_t* dst = out_images + i * hw;
        bool mono8 = !std::strcmp(enc, "mono8") || !std::strcmp(enc, "8UC1");
        bool mono16 = !std::strcmp(enc, "mono16") || !std::strcmp(enc, "16UC1");
        if (!mono8 && !mono16) return -static_cast<int>(i) - 1;
        uint32_t pix = mono16 ? 2 : 1;
        if (step < w * pix) step = w * pix;  // tolerate under-reported step
        if (static_cast<uint64_t>(step) * h > data_len &&
            static_cast<uint64_t>(w) * pix * h <= data_len)
            step = w * pix;  // padded-step blobs that report row bytes
        if (static_cast<uint64_t>(step) * (h - 1) + w * pix > data_len)
            return -static_cast<int>(i) - 1;

        if (mono8) {
            for (uint32_t row = 0; row < h; ++row)
                std::memcpy(dst + row * w, data + row * step, w);
        } else {
            for (uint32_t row = 0; row < h; ++row) {
                const uint8_t* src = data + row * step;
                for (uint32_t col = 0; col < w; ++col) {
                    uint16_t v;
                    std::memcpy(&v, src + col * 2, 2);
                    if (bigendian) v = static_cast<uint16_t>((v >> 8) | (v << 8));
                    dst[row * w + col] = static_cast<uint8_t>(v / 256);
                }
            }
        }
        out_stamps[i] = static_cast<double>(sec) + 1e-9 * nsec;
    }
    return static_cast<int>(n);
}

// ---------------------------------------------------------------------------
// Offline approximate time pairing (same policy as io/timesync.pair_streams):
// for each ping in stamp order, the nearest not-yet-used pose within slop,
// poses consumed in order.  out_pairs is (n_ping * 2) int64 (ping, pose);
// returns the number of pairs.
// ---------------------------------------------------------------------------
int64_t pair_streams(
    const double* ping_stamps, int64_t n_ping,
    const double* pose_stamps, int64_t n_pose,
    double slop,
    int64_t* out_pairs)
{
    int64_t n_pairs = 0;
    int64_t last_pose = -1;
    int64_t j = 0;  // searchsorted cursor (both streams sorted)
    for (int64_t i = 0; i < n_ping; ++i) {
        double t = ping_stamps[i];
        while (j < n_pose && pose_stamps[j] < t) ++j;
        int64_t best = -1;
        double best_d = slop;
        for (int64_t cand = j - 1; cand <= j; ++cand) {
            if (cand > last_pose && cand < n_pose) {
                double d = std::fabs(pose_stamps[cand] - t);
                if (d <= best_d) { best = cand; best_d = d; }
            }
        }
        if (best >= 0) {
            out_pairs[n_pairs * 2] = i;
            out_pairs[n_pairs * 2 + 1] = best;
            ++n_pairs;
            last_pose = best;
        }
    }
    return n_pairs;
}

// ---------------------------------------------------------------------------
// PointCloud2 XYZI float32 packing (reference node:437-442 layout).
// ---------------------------------------------------------------------------
void pack_xyzi(
    const double* points,        // (n, 3)
    const double* intensities,   // (n,)
    int64_t n,
    float* out)                  // (n, 4)
{
    for (int64_t i = 0; i < n; ++i) {
        out[i * 4 + 0] = static_cast<float>(points[i * 3 + 0]);
        out[i * 4 + 1] = static_cast<float>(points[i * 3 + 1]);
        out[i * 4 + 2] = static_cast<float>(points[i * 3 + 2]);
        out[i * 4 + 3] = static_cast<float>(intensities[i]);
    }
}

int sonar3d_native_abi_version() { return 1; }

}  // extern "C"
