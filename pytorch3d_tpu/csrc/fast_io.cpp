// Fast mesh-file parsing for pytorch3d_tpu.
//
// The reference library parses OBJ/PLY in pure Python (io/obj_io.py,
// io/ply_io.py) on top of torch; its native csrc/ is GPU kernels only.  On
// TPU the compute kernels are Pallas, and the host-side bottleneck moves to
// data loading — so the native C++ goes where it pays: a zero-dependency
// single-pass OBJ vertex/face parser exposed via the C ABI (ctypes), with
// the Python parser as the fallback and as the test oracle.
//
// Build: g++ -O3 -march=native -shared -fPIC fast_io.cpp -o libfast_io.so
// (done lazily by pytorch3d_tpu/io/fast_io.py, cached next to this file).

#include <cctype>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <vector>

namespace {

struct ObjData {
  std::vector<float> verts;      // V * 3
  std::vector<int32_t> faces;    // F * 3 (fan-triangulated)
  std::vector<float> normals;    // VN * 3
  std::vector<float> uvs;        // VT * 2
  std::vector<int32_t> faces_uv; // F * 3 (or empty)
  std::vector<int32_t> faces_n;  // F * 3 (or empty)
};

inline const char* skip_ws(const char* p, const char* end) {
  while (p < end && (*p == ' ' || *p == '\t' || *p == '\r')) ++p;
  return p;
}

inline const char* next_line(const char* p, const char* end) {
  while (p < end && *p != '\n') ++p;
  return p < end ? p + 1 : end;
}

// strtof-like without locale overhead for the common case.
inline const char* parse_float(const char* p, const char* end, float* out) {
  char* q;
  *out = strtof(p, &q);
  return q;
}

inline const char* parse_int(const char* p, const char* end, long* out) {
  char* q;
  *out = strtol(p, &q, 10);
  return q;
}

ObjData* parse_obj_impl(const char* text, size_t len) {
  auto* data = new ObjData();
  const char* p = text;
  const char* end = text + len;
  std::vector<long> vi, ti, ni;  // per-face scratch
  while (p < end) {
    p = skip_ws(p, end);
    if (p + 1 < end && p[0] == 'v' &&
        (p[1] == ' ' || p[1] == '\t')) {
      p += 2;
      for (int k = 0; k < 3; ++k) {
        float f;
        p = parse_float(p, end, &f);
        data->verts.push_back(f);
      }
    } else if (p + 2 < end && p[0] == 'v' && p[1] == 't' &&
               (p[2] == ' ' || p[2] == '\t')) {
      p += 3;
      for (int k = 0; k < 2; ++k) {
        float f;
        p = parse_float(p, end, &f);
        data->uvs.push_back(f);
      }
    } else if (p + 2 < end && p[0] == 'v' && p[1] == 'n' &&
               (p[2] == ' ' || p[2] == '\t')) {
      p += 3;
      for (int k = 0; k < 3; ++k) {
        float f;
        p = parse_float(p, end, &f);
        data->normals.push_back(f);
      }
    } else if (p + 1 < end && p[0] == 'f' &&
               (p[1] == ' ' || p[1] == '\t')) {
      p += 2;
      vi.clear();
      ti.clear();
      ni.clear();
      while (p < end && *p != '\n') {
        p = skip_ws(p, end);
        if (p >= end || *p == '\n' || *p == '#') break;
        long v = 0, t = 0, n = 0;
        bool has_t = false, has_n = false;
        p = parse_int(p, end, &v);
        if (p < end && *p == '/') {
          ++p;
          if (p < end && *p != '/') {
            p = parse_int(p, end, &t);
            has_t = true;
          }
          if (p < end && *p == '/') {
            ++p;
            p = parse_int(p, end, &n);
            has_n = true;
          }
        }
        long V = (long)(data->verts.size() / 3);
        vi.push_back(v > 0 ? v - 1 : v + V);
        if (has_t) {
          long T = (long)(data->uvs.size() / 2);
          ti.push_back(t > 0 ? t - 1 : t + T);
        }
        if (has_n) {
          long N = (long)(data->normals.size() / 3);
          ni.push_back(n > 0 ? n - 1 : n + N);
        }
      }
      // fan triangulation
      for (size_t k = 2; k < vi.size(); ++k) {
        data->faces.push_back((int32_t)vi[0]);
        data->faces.push_back((int32_t)vi[k - 1]);
        data->faces.push_back((int32_t)vi[k]);
        if (ti.size() == vi.size()) {
          data->faces_uv.push_back((int32_t)ti[0]);
          data->faces_uv.push_back((int32_t)ti[k - 1]);
          data->faces_uv.push_back((int32_t)ti[k]);
        }
        if (ni.size() == vi.size()) {
          data->faces_n.push_back((int32_t)ni[0]);
          data->faces_n.push_back((int32_t)ni[k - 1]);
          data->faces_n.push_back((int32_t)ni[k]);
        }
      }
    }
    p = next_line(p, end);
  }
  return data;
}

}  // namespace

extern "C" {

// Parse; returns an opaque handle. Query sizes, copy out, then free.
void* obj_parse(const char* text, size_t len) {
  return parse_obj_impl(text, len);
}

size_t obj_num_verts(void* h) { return ((ObjData*)h)->verts.size() / 3; }
size_t obj_num_faces(void* h) { return ((ObjData*)h)->faces.size() / 3; }
size_t obj_num_uvs(void* h) { return ((ObjData*)h)->uvs.size() / 2; }
size_t obj_num_normals(void* h) { return ((ObjData*)h)->normals.size() / 3; }
int obj_has_face_uvs(void* h) { return !((ObjData*)h)->faces_uv.empty(); }
int obj_has_face_normals(void* h) { return !((ObjData*)h)->faces_n.empty(); }

void obj_copy_verts(void* h, float* out) {
  auto& v = ((ObjData*)h)->verts;
  memcpy(out, v.data(), v.size() * sizeof(float));
}
void obj_copy_faces(void* h, int32_t* out) {
  auto& f = ((ObjData*)h)->faces;
  memcpy(out, f.data(), f.size() * sizeof(int32_t));
}
void obj_copy_uvs(void* h, float* out) {
  auto& v = ((ObjData*)h)->uvs;
  memcpy(out, v.data(), v.size() * sizeof(float));
}
void obj_copy_normals(void* h, float* out) {
  auto& v = ((ObjData*)h)->normals;
  memcpy(out, v.data(), v.size() * sizeof(float));
}
void obj_copy_face_uvs(void* h, int32_t* out) {
  auto& f = ((ObjData*)h)->faces_uv;
  memcpy(out, f.data(), f.size() * sizeof(int32_t));
}
void obj_copy_face_normals(void* h, int32_t* out) {
  auto& f = ((ObjData*)h)->faces_n;
  memcpy(out, f.data(), f.size() * sizeof(int32_t));
}
void obj_free(void* h) { delete (ObjData*)h; }
}
