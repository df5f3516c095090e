// headct_native — native preprocessing pipeline for head-CT NIfTI volumes.
//
// C++ counterpart of headct_foundation_tpu/data/transforms.load_and_preprocess
// (which itself replaces the reference's MONAI loading_transforms chain,
// reference: src/data/transforms.py:108-178):
//
//   read (.nii / .nii.gz via zlib) -> NIfTI-1 header parse (+scl slope/inter)
//   -> RAS reorientation -> cubic B-spline resample to 1 mm isotropic
//   (scipy.ndimage.zoom order-3 semantics incl. the causal/anticausal
//   prefilter, mode 'nearest') -> crop-foreground (x > 0 bounding box)
//   -> HU window stack ((40,80), (80,200), (600,2800) or single (40,+-150))
//   -> 'area' resize (adaptive averaging) to the ROI -> float16.
//
// Exposed as a C ABI for ctypes (data/native_loader.py). All entry points
// release no Python state (no Python here at all), so Python thread pools get
// true parallelism across scans.
//
// Build: g++ -O3 -shared -fPIC -std=c++17 headct_native.cpp -o libheadct_native.so -lz

#include <cstdint>
#include <cstring>
#include <cstdio>
#include <cmath>
#include <algorithm>
#include <memory>
#include <string>
#include <vector>

#include <zlib.h>

namespace {

// ---------------------------------------------------------------------------
// IO
// ---------------------------------------------------------------------------

bool read_file_raw(const char* path, std::vector<uint8_t>& out, std::string& err) {
    FILE* f = std::fopen(path, "rb");
    if (!f) { err = "cannot open file"; return false; }
    std::fseek(f, 0, SEEK_END);
    long n = std::ftell(f);
    std::fseek(f, 0, SEEK_SET);
    out.resize(static_cast<size_t>(n));
    size_t got = std::fread(out.data(), 1, out.size(), f);
    std::fclose(f);
    if (got != out.size()) { err = "short read"; return false; }
    return true;
}

#if !defined(HEADCT_NO_LIBDEFLATE) && defined(__has_include)
#  if __has_include(<libdeflate.h>)
#    include <libdeflate.h>
#    define HEADCT_HAVE_LIBDEFLATE 1
#  endif
#endif

#ifdef HEADCT_HAVE_LIBDEFLATE
// Fast DEFLATE path: libdeflate's whole-buffer inflate is ~2-3x zlib's
// streaming loop (the gzip inflate dominates .nii.gz decode cost). The gzip
// trailer's ISIZE gives the output size up front; multi-member streams loop
// via the _ex API. Any failure falls back to the zlib path below.
static bool gunzip_libdeflate(const std::vector<uint8_t>& in,
                              std::vector<uint8_t>& out) {
    if (in.size() < 18) return false;
    const uint8_t* tr = in.data() + in.size() - 4;
    size_t isize = (size_t)tr[0] | ((size_t)tr[1] << 8) |
                   ((size_t)tr[2] << 16) | ((size_t)tr[3] << 24);
    size_t cap = isize;
    if (cap < in.size()) cap = in.size() * 4 + (1u << 20);  // wrap / odd trailer
    // ISIZE comes from the (untrusted) file: a corrupt trailer must not force
    // a multi-GB up-front allocation. Start bounded (DEFLATE is <=1032:1, and
    // CT volumes inflate ~2-4x); the INSUFFICIENT_SPACE loop below grows.
    size_t bound = in.size() * 64 + (1u << 24);
    if (cap > bound) cap = bound;
    libdeflate_decompressor* d = libdeflate_alloc_decompressor();
    if (!d) return false;
    out.resize(cap);
    size_t pos = 0, total = 0;
    while (pos < in.size()) {
        size_t actual_in = 0, actual_out = 0;
        libdeflate_result r = libdeflate_gzip_decompress_ex(
            d, in.data() + pos, in.size() - pos, out.data() + total,
            out.size() - total, &actual_in, &actual_out);
        if (r == LIBDEFLATE_INSUFFICIENT_SPACE) {
            if (out.size() > (size_t)4 << 30) { libdeflate_free_decompressor(d); return false; }
            out.resize(out.size() * 2 + (1u << 20));
            continue;
        }
        if (r != LIBDEFLATE_SUCCESS || actual_in == 0) {
            libdeflate_free_decompressor(d);
            return false;
        }
        pos += actual_in;
        total += actual_out;
        if (in.size() - pos < 18) break;  // trailing padding, not a member
    }
    libdeflate_free_decompressor(d);
    out.resize(total);
    return true;
}
#endif

bool gunzip(const std::vector<uint8_t>& in, std::vector<uint8_t>& out, std::string& err) {
#ifdef HEADCT_HAVE_LIBDEFLATE
    if (gunzip_libdeflate(in, out)) return true;
    std::vector<uint8_t>().swap(out);  // release the failed path's capacity
#endif
    z_stream zs{};
    if (inflateInit2(&zs, 15 + 32) != Z_OK) { err = "inflateInit failed"; return false; }
    out.clear();
    out.reserve(in.size() * 4);
    std::vector<uint8_t> buf(1 << 20);
    zs.next_in = const_cast<uint8_t*>(in.data());
    zs.avail_in = static_cast<uInt>(in.size());
    int ret = Z_OK;
    while (ret != Z_STREAM_END) {
        zs.next_out = buf.data();
        zs.avail_out = static_cast<uInt>(buf.size());
        ret = inflate(&zs, Z_NO_FLUSH);
        if (ret != Z_OK && ret != Z_STREAM_END) {
            inflateEnd(&zs);
            err = "inflate failed";
            return false;
        }
        out.insert(out.end(), buf.data(), buf.data() + (buf.size() - zs.avail_out));
        if (ret != Z_STREAM_END && zs.avail_in == 0 && zs.avail_out != 0) {
            inflateEnd(&zs);
            err = "truncated gzip stream";
            return false;
        }
    }
    inflateEnd(&zs);
    return true;
}

// ---------------------------------------------------------------------------
// NIfTI-1 parsing
// ---------------------------------------------------------------------------

// Header-only parse: voxels stay in the inflated buffer and are converted /
// reordered in ONE fused pass by fused_ras_extract below. (The previous
// design ran four full-volume passes — dtype convert, Fortran->C transpose,
// RAS permute, output memcpy — each allocating a volume-sized temporary;
// on a 512x512x160 scan that was ~4x168 MB of traffic and dominated decode.)
struct NiftiHeader {
    int shape[3];            // disk dims, Fortran order (x fastest)
    double affine[3][4];
    int16_t datatype = 0;
    float scl_slope = 1.0f, scl_inter = 0.0f;
    size_t vox_offset = 0;
};

template <typename T>
T load_le(const uint8_t* p) {
    T v;
    std::memcpy(&v, p, sizeof(T));
    return v;
}

bool parse_nifti_header(const std::vector<uint8_t>& raw, NiftiHeader& img,
                        std::string& err) {
    if (raw.size() < 352) { err = "file too small for NIfTI-1 header"; return false; }
    const uint8_t* h = raw.data();
    int32_t sizeof_hdr = load_le<int32_t>(h + 0);
    if (sizeof_hdr != 348) { err = "not little-endian NIfTI-1"; return false; }
    if (std::memcmp(h + 344, "n+1", 3) != 0 && std::memcmp(h + 344, "ni1", 3) != 0) {
        err = "bad NIfTI magic";
        return false;
    }

    int16_t dim[8];
    for (int i = 0; i < 8; ++i) dim[i] = load_le<int16_t>(h + 40 + 2 * i);
    int ndim = dim[0];
    if (ndim < 3) { err = "expected >=3D volume"; return false; }
    size_t extra = 1;
    for (int i = 4; i <= ndim; ++i) extra *= std::max<int>(dim[i], 1);
    // accept trailing singleton dims only (matches python reader's [..., 0])
    int16_t datatype = load_le<int16_t>(h + 70);
    float pixdim[8];
    for (int i = 0; i < 8; ++i) pixdim[i] = load_le<float>(h + 76 + 4 * i);
    int vox_offset = static_cast<int>(load_le<float>(h + 108));
    float scl_slope = load_le<float>(h + 112);
    float scl_inter = load_le<float>(h + 116);
    int16_t qform_code = load_le<int16_t>(h + 252);
    int16_t sform_code = load_le<int16_t>(h + 254);

    img.shape[0] = dim[1];
    img.shape[1] = dim[2];
    img.shape[2] = dim[3];
    size_t n = static_cast<size_t>(dim[1]) * dim[2] * dim[3];

    // affine
    if (sform_code > 0) {
        for (int r = 0; r < 3; ++r)
            for (int c = 0; c < 4; ++c)
                img.affine[r][c] = load_le<float>(h + 280 + 16 * r + 4 * c);
    } else if (qform_code > 0) {
        double b = load_le<float>(h + 256), c = load_le<float>(h + 260),
               d = load_le<float>(h + 264);
        double a2 = 1.0 - (b * b + c * c + d * d);
        double a = std::sqrt(std::max(a2, 0.0));
        double qfac = pixdim[0] < 0 ? -1.0 : 1.0;
        double R[3][3] = {
            {a * a + b * b - c * c - d * d, 2 * b * c - 2 * a * d, 2 * b * d + 2 * a * c},
            {2 * b * c + 2 * a * d, a * a + c * c - b * b - d * d, 2 * c * d - 2 * a * b},
            {2 * b * d - 2 * a * c, 2 * c * d + 2 * a * b, a * a + d * d - b * b - c * c},
        };
        double s[3] = {pixdim[1], pixdim[2], pixdim[3] * qfac};
        for (int r = 0; r < 3; ++r) {
            for (int cc = 0; cc < 3; ++cc) img.affine[r][cc] = R[r][cc] * s[cc];
            img.affine[r][3] = load_le<float>(h + 268 + 4 * r);
        }
    } else {
        for (int r = 0; r < 3; ++r)
            for (int cc = 0; cc < 4; ++cc) img.affine[r][cc] = 0.0;
        img.affine[0][0] = pixdim[1];
        img.affine[1][1] = pixdim[2];
        img.affine[2][2] = pixdim[3];
    }

    // storage info for the fused extraction pass (first 3D volume only —
    // Fortran order puts it contiguously at vox_offset)
    img.datatype = datatype;
    img.scl_slope = scl_slope;
    img.scl_inter = scl_inter;
    img.vox_offset = static_cast<size_t>(vox_offset);
    size_t esize;
    switch (datatype) {
        case 2: case 256: esize = 1; break;             // uint8 / int8
        case 4: case 512: esize = 2; break;             // int16 / uint16
        case 8: case 16:  esize = 4; break;             // int32 / float32
        case 64:          esize = 8; break;             // float64
        default:
            err = "unsupported NIfTI datatype " + std::to_string(datatype);
            return false;
    }
    if (vox_offset < 0 || raw.size() < img.vox_offset + esize * n) {
        err = "truncated voxel data";
        return false;
    }
    return true;
}

// ---------------------------------------------------------------------------
// Volume (C-contiguous [X, Y, Z] with x the slowest — numpy layout)
// ---------------------------------------------------------------------------

struct Vol {
    int nx = 0, ny = 0, nz = 0;
    std::vector<float> v;
    float& at(int x, int y, int z) { return v[(static_cast<size_t>(x) * ny + y) * nz + z]; }
    float at(int x, int y, int z) const {
        return v[(static_cast<size_t>(x) * ny + y) * nz + z];
    }
};

// Composed Fortran->C + RAS geometry: the disk layout (x fastest) and the
// RAS axis permutation/flips collapse into ONE linear index map — output
// voxel (o0,o1,o2) reads input element off + o0*stride[0] + o1*stride[1] +
// o2*stride[2]. Axis-dominance algorithm identical to the python
// orientation_ras (and the previous two-pass orient_ras).
struct RasMap {
    int dims[3];            // output dims, C order (dims[2] fastest)
    long long stride[3];    // input ELEMENT stride per output axis
    long long off;          // input element offset
    double out_affine[3][4];
};

RasMap compute_ras_map(const NiftiHeader& img) {
    const double (*affine)[4] = img.affine;
    int n[3] = {img.shape[0], img.shape[1], img.shape[2]};
    long long fstride[3] = {
        1, static_cast<long long>(n[0]),
        static_cast<long long>(n[0]) * n[1],
    };
    // dominant world axis per input axis
    int best[3];
    for (int j = 0; j < 3; ++j) {
        double m = -1;
        for (int w = 0; w < 3; ++w) {
            double a = std::fabs(affine[w][j]);
            if (a > m) { m = a; best[j] = w; }
        }
    }
    bool flip[3];
    for (int j = 0; j < 3; ++j) flip[j] = affine[best[j]][j] < 0;
    int perm[3];  // perm[world] = input axis
    for (int w = 0; w < 3; ++w)
        for (int j = 0; j < 3; ++j)
            if (best[j] == w) perm[w] = j;

    RasMap m{};
    m.off = 0;
    for (int w = 0; w < 3; ++w) {
        int j = perm[w];
        m.dims[w] = n[j];
        if (flip[j]) {
            m.stride[w] = -fstride[j];
            m.off += static_cast<long long>(n[j] - 1) * fstride[j];
        } else {
            m.stride[w] = fstride[j];
        }
    }
    // new spacing follows the permutation (voxel sizes along world axes)
    double sp[3];
    for (int j = 0; j < 3; ++j) {
        double s = 0;
        for (int w = 0; w < 3; ++w) s += affine[w][j] * affine[w][j];
        sp[j] = std::sqrt(s);
    }
    for (int r = 0; r < 3; ++r)
        for (int c = 0; c < 4; ++c) m.out_affine[r][c] = 0;
    for (int w = 0; w < 3; ++w) m.out_affine[w][w] = sp[perm[w]];
    return m;
}

// One fused pass: dtype convert + scl scale + composed permutation, written
// directly into the caller's buffer. Cache-blocked: the inner loop runs
// along the axis whose INPUT stride is +-1 (sequential reads); writes are
// tiled so each 64-wide tile's output cache lines stay resident across the
// tile's fastest-output-axis sweep.
template <typename T>
void extract_typed(const uint8_t* p, const RasMap& m, float slope,
                   float inter, float* out) {
    const int d0 = m.dims[0], d1 = m.dims[1], d2 = m.dims[2];
    const long long s0 = m.stride[0], s1 = m.stride[1], s2 = m.stride[2];
    const bool scaled = (slope != 1.0f) || (inter != 0.0f);
    auto load = [&](long long idx) {
        T v;
        std::memcpy(&v, p + idx * static_cast<long long>(sizeof(T)), sizeof(T));
        float f = static_cast<float>(v);
        return scaled ? f * slope + inter : f;
    };
    if (s2 == 1 || s2 == -1) {
        // output-fastest axis is also input-fastest: plain sweep
        for (int x = 0; x < d0; ++x) {
            const long long bx = m.off + static_cast<long long>(x) * s0;
            float* orow = out + static_cast<size_t>(x) * d1 * d2;
            for (int y = 0; y < d1; ++y) {
                const long long b = bx + static_cast<long long>(y) * s1;
                float* o = orow + static_cast<size_t>(y) * d2;
                for (int z = 0; z < d2; ++z)
                    o[z] = load(b + static_cast<long long>(z) * s2);
            }
        }
        return;
    }
    // exactly one axis has |stride| == 1 (the input is contiguous)
    const int win = (s0 == 1 || s0 == -1) ? 0 : 1;
    const int oth = (win == 0) ? 1 : 0;
    const long long odim[3] = {static_cast<long long>(d1) * d2, d2, 1};
    const int B = 64;
    for (int a = 0; a < m.dims[oth]; ++a) {
        const long long in_a = m.off + static_cast<long long>(a) * m.stride[oth];
        float* out_a = out + static_cast<size_t>(a) * odim[oth];
        for (int wb = 0; wb < m.dims[win]; wb += B) {
            const int we = std::min(wb + B, m.dims[win]);
            for (int zb = 0; zb < d2; zb += B) {
                const int ze = std::min(zb + B, d2);
                for (int z = zb; z < ze; ++z) {
                    const long long in_z = in_a + static_cast<long long>(z) * s2;
                    float* out_z = out_a + z;
                    for (int w = wb; w < we; ++w)
                        out_z[static_cast<size_t>(w) * odim[win]] =
                            load(in_z + static_cast<long long>(w) * m.stride[win]);
                }
            }
        }
    }
}

// dtype dispatch; `raw` is the whole (inflated) file buffer.
void fused_ras_extract(const std::vector<uint8_t>& raw, const NiftiHeader& img,
                       const RasMap& m, float* out) {
    const uint8_t* p = raw.data() + img.vox_offset;
    float slope = img.scl_slope != 0.0f ? img.scl_slope : 1.0f;
    float inter = img.scl_inter;
    switch (img.datatype) {
        case 2:   extract_typed<uint8_t >(p, m, slope, inter, out); break;
        case 4:   extract_typed<int16_t >(p, m, slope, inter, out); break;
        case 8:   extract_typed<int32_t >(p, m, slope, inter, out); break;
        case 16:  extract_typed<float   >(p, m, slope, inter, out); break;
        case 64:  extract_typed<double  >(p, m, slope, inter, out); break;
        case 256: extract_typed<int8_t  >(p, m, slope, inter, out); break;
        case 512: extract_typed<uint16_t>(p, m, slope, inter, out); break;
        default: break;  // parse_nifti_header already rejected it
    }
}

// ---------------------------------------------------------------------------
// Cubic B-spline resample (scipy.ndimage.zoom order=3, mode='nearest')
// ---------------------------------------------------------------------------

// Plane/row-sweep spline prefilter: runs `width` interleaved lines at once.
// Line i's elements live at base + i*stride + [0, width). Per-element
// arithmetic matches the scalar recurrence exactly (double carry across the
// recurrence, float storage after every step).
void spline_filter_lines(float* base, int n, size_t stride, size_t width,
                         std::vector<double>& carry) {
    const double pole = std::sqrt(3.0) - 2.0;
    if (n < 2) return;
    const double lambda = (1.0 - pole) * (1.0 - 1.0 / pole);
    for (int i = 0; i < n; ++i) {
        float* row = base + static_cast<size_t>(i) * stride;
        for (size_t e = 0; e < width; ++e)
            row[e] = static_cast<float>(row[e] * lambda);
    }
    int horizon = std::min(
        n, static_cast<int>(std::ceil(-30.0 / std::log(std::fabs(pole)))));
    carry.resize(width);
    for (size_t e = 0; e < width; ++e) carry[e] = base[e];
    double zn = pole;
    for (int i = 1; i < horizon; ++i) {
        const float* row = base + static_cast<size_t>(i) * stride;
        for (size_t e = 0; e < width; ++e) carry[e] += zn * row[e];
        zn *= pole;
    }
    for (size_t e = 0; e < width; ++e)
        base[e] = static_cast<float>(carry[e]);
    for (int i = 1; i < n; ++i) {
        float* row = base + static_cast<size_t>(i) * stride;
        for (size_t e = 0; e < width; ++e) {
            carry[e] = row[e] + pole * carry[e];
            row[e] = static_cast<float>(carry[e]);
        }
    }
    {
        const float* r2 = base + static_cast<size_t>(n - 2) * stride;
        float* r1 = base + static_cast<size_t>(n - 1) * stride;
        const double k = pole / (pole * pole - 1.0);
        for (size_t e = 0; e < width; ++e) {
            carry[e] = k * (pole * r2[e] + r1[e]);
            r1[e] = static_cast<float>(carry[e]);
        }
    }
    for (int i = n - 2; i >= 0; --i) {
        float* row = base + static_cast<size_t>(i) * stride;
        for (size_t e = 0; e < width; ++e) {
            carry[e] = pole * (carry[e] - row[e]);
            row[e] = static_cast<float>(carry[e]);
        }
    }
}

// Contiguous-line prefilter (z axis), in place — same arithmetic.
void spline_filter_contig(float* line, int n) {
    const double pole = std::sqrt(3.0) - 2.0;
    if (n < 2) return;
    const double lambda = (1.0 - pole) * (1.0 - 1.0 / pole);
    for (int i = 0; i < n; ++i)
        line[i] = static_cast<float>(line[i] * lambda);
    int horizon = std::min(
        n, static_cast<int>(std::ceil(-30.0 / std::log(std::fabs(pole)))));
    double zn = pole;
    double sum = line[0];
    for (int i = 1; i < horizon; ++i) {
        sum += zn * line[i];
        zn *= pole;
    }
    double prev = sum;
    line[0] = static_cast<float>(prev);
    for (int i = 1; i < n; ++i) {
        prev = line[i] + pole * prev;
        line[i] = static_cast<float>(prev);
    }
    prev = (pole / (pole * pole - 1.0)) * (pole * line[n - 2] + line[n - 1]);
    line[n - 1] = static_cast<float>(prev);
    for (int i = n - 2; i >= 0; --i) {
        prev = pole * (prev - line[i]);
        line[i] = static_cast<float>(prev);
    }
}

inline void cubic_weights(double t, double w[4]) {
    // cubic B-spline kernel weights for fractional offset t in [0,1)
    double t2 = t * t, t3 = t2 * t;
    w[0] = (1.0 - 3.0 * t + 3.0 * t2 - t3) / 6.0;
    w[1] = (4.0 - 6.0 * t2 + 3.0 * t3) / 6.0;
    w[2] = (1.0 + 3.0 * t + 3.0 * t2 - 3.0 * t3) / 6.0;
    w[3] = t3 / 6.0;
}

// Resample one axis by factor (out size = round(in * zoom) scipy-style).
// scipy.zoom output coordinate mapping: in = out * (in_size - 1)/(out_size - 1)
// ... actually scipy uses in = out / zoom_actual where zoom_actual =
// (out_size - 1)/(in_size - 1) for grid-aligned endpoints ("grid" mode False).
Vol zoom_cubic(const Vol& in, double zf[3]) {
    int on[3] = {
        static_cast<int>(std::lround(in.nx * zf[0])),
        static_cast<int>(std::lround(in.ny * zf[1])),
        static_cast<int>(std::lround(in.nz * zf[2])),
    };
    for (int i = 0; i < 3; ++i) on[i] = std::max(on[i], 1);

    // Prefilter along each axis. The recurrences are independent across
    // lines, so instead of gathering strided lines one by one (a full cache
    // miss per element for the x/y axes) we sweep PLANES (x axis) / ROWS
    // (y axis) with a double carry buffer — every access is sequential, the
    // per-element arithmetic (and therefore the result, bit for bit) is
    // identical to filtering one line at a time.
    Vol f = in;
    {
        std::vector<double> carry;
        // x axis: lines stride ny*nz; process whole [ny*nz] planes
        spline_filter_lines(f.v.data(), in.nx,
                            static_cast<size_t>(in.ny) * in.nz,
                            static_cast<size_t>(in.ny) * in.nz, carry);
        // y axis: within each x slab, lines stride nz; process [nz] rows
        for (int x = 0; x < in.nx; ++x)
            spline_filter_lines(
                f.v.data() + static_cast<size_t>(x) * in.ny * in.nz,
                in.ny, static_cast<size_t>(in.nz),
                static_cast<size_t>(in.nz), carry);
        // z axis: lines are contiguous — filter in place
        for (size_t l = 0; l < f.v.size(); l += in.nz)
            spline_filter_contig(f.v.data() + l, in.nz);
    }

    // The cubic B-spline kernel is separable: resample one axis at a time
    // (4 taps per output voxel per axis instead of 64 for the 3D product).
    auto clampi = [](int v, int lo, int hi) { return std::min(std::max(v, lo), hi); };

    auto interp_axis = [&](const Vol& v, int axis, int osize) {
        int dims[3] = {v.nx, v.ny, v.nz};
        int isize = dims[axis];
        Vol out;
        dims[axis] = osize;
        out.nx = dims[0]; out.ny = dims[1]; out.nz = dims[2];
        out.v.resize(static_cast<size_t>(dims[0]) * dims[1] * dims[2]);

        // precompute per-output-index taps
        std::vector<int> base(osize);
        std::vector<double> w(static_cast<size_t>(osize) * 4);
        for (int o = 0; o < osize; ++o) {
            double c = osize == 1 ? 0.0
                                  : static_cast<double>(o) * (isize - 1) / (osize - 1);
            int i0 = static_cast<int>(std::floor(c));
            base[o] = i0;
            cubic_weights(c - i0, &w[static_cast<size_t>(o) * 4]);
        }

        // Axis-specialized sweeps: each output plane/row is a 4-tap weighted
        // sum of source planes/rows — sequential reads and writes instead of
        // per-voxel index arithmetic. Accumulation order matches the generic
        // t=-1..2 loop (left-to-right in double), so results are bit-equal.
        if (axis == 0) {
            const size_t P = static_cast<size_t>(v.ny) * v.nz;
            for (int o = 0; o < osize; ++o) {
                const double* wo = &w[static_cast<size_t>(o) * 4];
                const float* s[4];
                for (int t = 0; t < 4; ++t)
                    s[t] = v.v.data()
                         + static_cast<size_t>(
                               clampi(base[o] - 1 + t, 0, isize - 1)) * P;
                float* dst = out.v.data() + static_cast<size_t>(o) * P;
                for (size_t e = 0; e < P; ++e)
                    dst[e] = static_cast<float>(
                        wo[0] * s[0][e] + wo[1] * s[1][e] +
                        wo[2] * s[2][e] + wo[3] * s[3][e]);
            }
        } else if (axis == 1) {
            const size_t R = static_cast<size_t>(v.nz);
            for (int a = 0; a < v.nx; ++a) {
                const float* slab =
                    v.v.data() + static_cast<size_t>(a) * v.ny * R;
                float* oslab =
                    out.v.data() + static_cast<size_t>(a) * osize * R;
                for (int o = 0; o < osize; ++o) {
                    const double* wo = &w[static_cast<size_t>(o) * 4];
                    const float* s[4];
                    for (int t = 0; t < 4; ++t)
                        s[t] = slab + static_cast<size_t>(
                                   clampi(base[o] - 1 + t, 0, isize - 1)) * R;
                    float* dst = oslab + static_cast<size_t>(o) * R;
                    for (size_t e = 0; e < R; ++e)
                        dst[e] = static_cast<float>(
                            wo[0] * s[0][e] + wo[1] * s[1][e] +
                            wo[2] * s[2][e] + wo[3] * s[3][e]);
                }
            }
        } else {
            const size_t lines = static_cast<size_t>(v.nx) * v.ny;
            for (size_t l = 0; l < lines; ++l) {
                const float* src = v.v.data() + l * isize;
                float* dst = out.v.data() + l * osize;
                for (int o = 0; o < osize; ++o) {
                    const double* wo = &w[static_cast<size_t>(o) * 4];
                    double acc = 0.0;
                    for (int t = -1; t <= 2; ++t)
                        acc += wo[t + 1] * src[clampi(base[o] + t, 0, isize - 1)];
                    dst[o] = static_cast<float>(acc);
                }
            }
        }
        return out;
    };

    Vol out = std::move(f);
    if (out.nx != on[0]) out = interp_axis(out, 0, on[0]);
    if (out.ny != on[1]) out = interp_axis(out, 1, on[1]);
    if (out.nz != on[2]) out = interp_axis(out, 2, on[2]);
    return out;
}

// ---------------------------------------------------------------------------
// Crop foreground, window, area resize
// ---------------------------------------------------------------------------

void crop_foreground(Vol& vol) {
    int lo[3] = {vol.nx, vol.ny, vol.nz};
    int hi[3] = {0, 0, 0};
    for (int x = 0; x < vol.nx; ++x)
        for (int y = 0; y < vol.ny; ++y)
            for (int z = 0; z < vol.nz; ++z)
                if (vol.at(x, y, z) > 0.0f) {
                    lo[0] = std::min(lo[0], x); hi[0] = std::max(hi[0], x);
                    lo[1] = std::min(lo[1], y); hi[1] = std::max(hi[1], y);
                    lo[2] = std::min(lo[2], z); hi[2] = std::max(hi[2], z);
                }
    if (lo[0] > hi[0]) return;  // all background: keep full volume
    Vol out;
    out.nx = hi[0] - lo[0] + 1;
    out.ny = hi[1] - lo[1] + 1;
    out.nz = hi[2] - lo[2] + 1;
    out.v.resize(static_cast<size_t>(out.nx) * out.ny * out.nz);
    for (int x = 0; x < out.nx; ++x)
        for (int y = 0; y < out.ny; ++y)
            for (int z = 0; z < out.nz; ++z)
                out.at(x, y, z) = vol.at(x + lo[0], y + lo[1], z + lo[2]);
    vol = std::move(out);
}

// adaptive average pooling along one axis ('area' resize)
Vol area_resize(const Vol& in, int ox, int oy, int oz) {
    auto pool_axis = [](const Vol& v, int axis, int osize) {
        int dims[3] = {v.nx, v.ny, v.nz};
        int isize = dims[axis];
        Vol out;
        dims[axis] = osize;
        out.nx = dims[0]; out.ny = dims[1]; out.nz = dims[2];
        out.v.assign(static_cast<size_t>(dims[0]) * dims[1] * dims[2], 0.0f);
        // plane/row sweeps (see the prefilter): per-element accumulation
        // order is unchanged (i ascending, double), so results are bit-equal
        // to pooling one voxel at a time.
        std::vector<double> acc;
        if (axis == 0) {
            const size_t P = static_cast<size_t>(v.ny) * v.nz;
            acc.resize(P);
            for (int o = 0; o < osize; ++o) {
                int s = (o * isize) / osize;
                int e = ((o + 1) * isize + osize - 1) / osize;
                std::fill(acc.begin(), acc.end(), 0.0);
                for (int i = s; i < e; ++i) {
                    const float* src = v.v.data() + static_cast<size_t>(i) * P;
                    for (size_t k = 0; k < P; ++k) acc[k] += src[k];
                }
                float* dst = out.v.data() + static_cast<size_t>(o) * P;
                const double d = e - s;
                for (size_t k = 0; k < P; ++k)
                    dst[k] = static_cast<float>(acc[k] / d);
            }
        } else if (axis == 1) {
            const size_t R = static_cast<size_t>(v.nz);
            acc.resize(R);
            for (int a = 0; a < v.nx; ++a) {
                const float* slab = v.v.data() + static_cast<size_t>(a) * v.ny * R;
                float* oslab = out.v.data() + static_cast<size_t>(a) * osize * R;
                for (int o = 0; o < osize; ++o) {
                    int s = (o * isize) / osize;
                    int e = ((o + 1) * isize + osize - 1) / osize;
                    std::fill(acc.begin(), acc.end(), 0.0);
                    for (int i = s; i < e; ++i) {
                        const float* src = slab + static_cast<size_t>(i) * R;
                        for (size_t k = 0; k < R; ++k) acc[k] += src[k];
                    }
                    float* dst = oslab + static_cast<size_t>(o) * R;
                    const double d = e - s;
                    for (size_t k = 0; k < R; ++k)
                        dst[k] = static_cast<float>(acc[k] / d);
                }
            }
        } else {
            const size_t lines = static_cast<size_t>(v.nx) * v.ny;
            for (size_t l = 0; l < lines; ++l) {
                const float* src = v.v.data() + l * isize;
                float* dst = out.v.data() + l * osize;
                for (int o = 0; o < osize; ++o) {
                    int s = (o * isize) / osize;
                    int e = ((o + 1) * isize + osize - 1) / osize;
                    double a2 = 0;
                    for (int i = s; i < e; ++i) a2 += src[i];
                    dst[o] = static_cast<float>(a2 / (e - s));
                }
            }
        }
        return out;
    };
    Vol out = in;
    if (in.nx != ox) out = pool_axis(out, 0, ox);
    if (out.ny != oy) out = pool_axis(out, 1, oy);
    if (out.nz != oz) out = pool_axis(out, 2, oz);
    return out;
}

inline uint16_t f32_to_f16_bits(float f) {
    // round-to-nearest-even float32 -> float16 (no NaN/inf care needed:
    // windowed outputs are in [0, 1])
    uint32_t x;
    std::memcpy(&x, &f, 4);
    uint32_t sign = (x >> 16) & 0x8000u;
    int32_t exp = static_cast<int32_t>((x >> 23) & 0xFF) - 127 + 15;
    uint32_t mant = x & 0x7FFFFFu;
    if (exp <= 0) {
        if (exp < -10) return static_cast<uint16_t>(sign);
        mant |= 0x800000u;
        uint32_t shift = static_cast<uint32_t>(14 - exp);
        uint32_t half = mant >> shift;
        uint32_t rem = mant & ((1u << shift) - 1);
        uint32_t halfway = 1u << (shift - 1);
        if (rem > halfway || (rem == halfway && (half & 1))) half++;
        return static_cast<uint16_t>(sign | half);
    }
    if (exp >= 31) return static_cast<uint16_t>(sign | 0x7C00u);
    uint32_t half = (static_cast<uint32_t>(exp) << 10) | (mant >> 13);
    uint32_t rem = mant & 0x1FFFu;
    if (rem > 0x1000u || (rem == 0x1000u && (half & 1))) half++;
    return static_cast<uint16_t>(sign | half);
}

}  // namespace

// ---------------------------------------------------------------------------
// C API
// ---------------------------------------------------------------------------

extern "C" {

// Preprocess one scan into out[in_channels * roi^3] float16 bits.
// order 0: training pipeline (window BEFORE resize — loading_transforms);
// order 1: notebook feature-extraction pipeline (resize BEFORE window —
// extract_feature_sample.ipynb cell 7; SURVEY.md §3.4).
// Returns 0 on success; on failure writes a message into err.
int headct_preprocess_ex(const char* path, int roi, int in_channels,
                         int order, uint16_t* out, char* err, int errlen) {
    std::string e;
    auto fail = [&](const std::string& msg) {
        std::snprintf(err, errlen, "%s", msg.c_str());
        return 1;
    };
    // No exception may cross the C ABI: a corrupt file driving a huge
    // allocation (std::bad_alloc) must surface as a per-file error the
    // python loaders' shielding can catch, not std::terminate.
    try {
    std::vector<uint8_t> raw;
    if (!read_file_raw(path, raw, e)) return fail(e);
    if (raw.size() >= 2 && raw[0] == 0x1f && raw[1] == 0x8b) {
        std::vector<uint8_t> inflated;
        if (!gunzip(raw, inflated, e)) return fail(e);
        raw = std::move(inflated);
    }
    NiftiHeader img;
    if (!parse_nifti_header(raw, img, e)) return fail(e);
    RasMap map = compute_ras_map(img);
    Vol vol;
    vol.nx = map.dims[0];
    vol.ny = map.dims[1];
    vol.nz = map.dims[2];
    vol.v.resize(static_cast<size_t>(vol.nx) * vol.ny * vol.nz);
    fused_ras_extract(raw, img, map, vol.v.data());
    raw.clear();
    raw.shrink_to_fit();

    double zf[3] = {map.out_affine[0][0], map.out_affine[1][1],
                    map.out_affine[2][2]};
    bool need_zoom = false;
    for (int i = 0; i < 3; ++i) {
        if (std::fabs(zf[i] - 1.0) > 1e-3) need_zoom = true;
    }
    if (need_zoom) vol = zoom_cubic(vol, zf);

    crop_foreground(vol);

    if (order == 2) {
        // hu16 wire format: raw-HU 'area' resize, clamp to the union of the
        // window ranges, fixed-point round(HU * 10) into int16 (must match
        // python transforms.hu16_encode exactly; np.round is half-to-even,
        // so rely on lrintf under the default FE_TONEAREST mode).
        Vol r = area_resize(vol, roi, roi, roi);
        size_t n = static_cast<size_t>(roi) * roi * roi;
        int16_t* q = reinterpret_cast<int16_t*>(out);
        for (size_t i = 0; i < n; ++i) {
            float v = std::min(std::max(r.v[i], -800.0f), 2000.0f);
            q[i] = static_cast<int16_t>(std::lrintf(v * 10.0f));
        }
        return 0;
    }

    // windows (reference: src/data/transforms.py:120-134)
    struct Win { float lo, hi; };
    std::vector<Win> wins;
    if (in_channels == 1) {
        wins = {{40.f - 150.f, 40.f + 150.f}};
    } else if (in_channels == 3) {
        wins = {{0.f, 80.f}, {-20.f, 180.f}, {-800.f, 2000.f}};
    } else {
        return fail("unsupported in_channels");
    }

    size_t roi3 = static_cast<size_t>(roi) * roi * roi;
    if (order == 1) {
        // notebook order: resize the raw HU volume first, then window
        Vol r = area_resize(vol, roi, roi, roi);
        for (size_t ci = 0; ci < wins.size(); ++ci) {
            float lo = wins[ci].lo, hi = wins[ci].hi, inv = 1.0f / (hi - lo);
            for (size_t i = 0; i < roi3; ++i) {
                float v = std::min(std::max((r.v[i] - lo) * inv, 0.0f), 1.0f);
                out[ci * roi3 + i] = f32_to_f16_bits(v);
            }
        }
        return 0;
    }
    for (size_t ci = 0; ci < wins.size(); ++ci) {
        Vol w = vol;
        float lo = wins[ci].lo, hi = wins[ci].hi, inv = 1.0f / (hi - lo);
        for (auto& v : w.v) v = std::min(std::max((v - lo) * inv, 0.0f), 1.0f);
        Vol r = area_resize(w, roi, roi, roi);
        for (size_t i = 0; i < roi3; ++i)
            out[ci * roi3 + i] = f32_to_f16_bits(r.v[i]);
    }
    return 0;
    } catch (const std::exception& ex) {
        return fail(std::string("native preprocess failed: ") + ex.what());
    }
}

int headct_preprocess(const char* path, int roi, int in_channels,
                      uint16_t* out, char* err, int errlen) {
    return headct_preprocess_ex(path, roi, in_channels, 0, out, err, errlen);
}

// Capability probe for the python bindings: bumped when new preprocess
// orders/outputs are added so an older prebuilt .so degrades gracefully.
// 4 = hu16 wire format (order 2, int16 output).
int headct_abi_version(void) { return 4; }

// ---------------------------------------------------------------------------
// Decode-only API: gunzip + NIfTI parse + RAS orient, no resampling.
// Feeds the ON-DEVICE preprocessing path (data/device_preprocess.py), where
// the resample/window/resize run as TPU matmuls — the host's only remaining
// job is getting oriented HU voxels out of the file fast.
//
// Two-call pattern (the volume shape is unknown before parsing):
//   h = headct_decode_open(path, shape[3], affine[12], err, errlen)  // 0 = fail
//   headct_decode_read(h, out_f32)   // C-order [X, Y, Z] voxels
//   headct_decode_close(h)
// ---------------------------------------------------------------------------

struct DecodeHandle {
    NiftiHeader hdr;
    RasMap map;
    std::vector<uint8_t> raw;  // inflated file bytes; voxels extracted lazily
};

void* headct_decode_open(const char* path, int* shape, double* affine,
                         char* err, int errlen) {
    std::string e;
    auto fail = [&](const std::string& msg) -> void* {
        std::snprintf(err, errlen, "%s", msg.c_str());
        return nullptr;
    };
    try {
        std::vector<uint8_t> raw;
        if (!read_file_raw(path, raw, e)) return fail(e);
        if (raw.size() >= 2 && raw[0] == 0x1f && raw[1] == 0x8b) {
            std::vector<uint8_t> inflated;
            if (!gunzip(raw, inflated, e)) return fail(e);
            raw = std::move(inflated);
        }
        auto h = std::make_unique<DecodeHandle>();
        if (!parse_nifti_header(raw, h->hdr, e)) return fail(e);
        h->map = compute_ras_map(h->hdr);
        h->raw = std::move(raw);
        shape[0] = h->map.dims[0];
        shape[1] = h->map.dims[1];
        shape[2] = h->map.dims[2];
        for (int r = 0; r < 3; ++r)
            for (int c = 0; c < 4; ++c)
                affine[r * 4 + c] = h->map.out_affine[r][c];
        return h.release();
    } catch (const std::exception& ex) {
        return fail(std::string("native decode failed: ") + ex.what());
    }
}

// The heavy work happens HERE, in one fused pass straight into the caller's
// numpy buffer — no volume-sized temporaries anywhere in the decode path.
int headct_decode_read(void* handle, float* out) {
    auto* h = static_cast<DecodeHandle*>(handle);
    if (!h) return 1;
    fused_ras_extract(h->raw, h->hdr, h->map, out);
    return 0;
}

void headct_decode_close(void* handle) { delete static_cast<DecodeHandle*>(handle); }

int headct_native_version() { return 4; }

}  // extern "C"
