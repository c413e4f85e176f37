// Native OBJ triangle-mesh loader: the tinyObj analog for the native
// runtime tier (the reference links tinyObj in C++,
// /root/reference/INSTRUCTION.md:123-127). Mirrors the Python parser in
// models/mesh.py exactly — v/vt/vn records, v, v//vn, v/vt, v/vt/vn
// face syntax, negative (relative) indices, fan triangulation, face-
// normal fallback, per-face UVs kept only when every corner carries vt.
// The Python loader costs ~4.5 s for a 51k-tri mesh (per-face Python
// loop); this one is ~100x faster and is selected transparently by
// models/mesh.py with the numpy path as fallback.
//
// C ABI (ctypes):
//   int32 obj_count_tris(const char* path)
//     -> number of triangles after fan triangulation, or -1 on error.
//   int32 obj_load(const char* path, int32 capacity,
//                  float* v0, float* v1, float* v2,    // each T x 3
//                  float* n0, float* n1, float* n2,    // each T x 3
//                  float* uv0, float* uv1, float* uv2, // each T x 2
//                  int32* has_uv)                      // scalar out
//     -> triangle count, or -1 on error / insufficient capacity.

#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

namespace {

struct V3 {
  float x, y, z;
};
struct V2 {
  float u, v;
};

struct Corner {
  int32_t vi, ti, ni;
};

// Parse one face corner spec "v", "v/t", "v//n", "v/t/n".
bool parse_corner(const char *s, Corner &c) {
  char *end;
  long vi = std::strtol(s, &end, 10);
  if (end == s) return false;
  c.vi = (int32_t)vi;
  c.ti = 0;
  c.ni = 0;
  if (*end == '/') {
    const char *p = end + 1;
    if (*p != '/') {
      long ti = std::strtol(p, &end, 10);
      if (end != p) c.ti = (int32_t)ti;
      p = end;
    }
    if (*p == '/') {
      ++p;
      long ni = std::strtol(p, &end, 10);
      if (end != p) c.ni = (int32_t)ni;
    }
  }
  return true;
}

struct Parsed {
  std::vector<V3> verts, normals;
  std::vector<V2> texcoords;
  std::vector<Corner> face_corners;  // flattened triangles, 3 per tri
};

bool parse_file(const char *path, Parsed &out) {
  FILE *f = std::fopen(path, "r");
  if (!f) return false;
  char line[2048];
  std::vector<Corner> corners;
  while (std::fgets(line, sizeof line, f)) {
    const char *s = line;
    while (*s == ' ' || *s == '\t') ++s;
    if (s[0] == 'v' && s[1] == ' ') {
      V3 v{};
      if (std::sscanf(s + 2, "%f %f %f", &v.x, &v.y, &v.z) == 3)
        out.verts.push_back(v);
    } else if (s[0] == 'v' && s[1] == 'n' && s[2] == ' ') {
      V3 v{};
      if (std::sscanf(s + 3, "%f %f %f", &v.x, &v.y, &v.z) == 3)
        out.normals.push_back(v);
    } else if (s[0] == 'v' && s[1] == 't' && s[2] == ' ') {
      V2 t{};
      int n = std::sscanf(s + 3, "%f %f", &t.u, &t.v);
      if (n >= 1) {
        if (n < 2) t.v = 0.f;
        out.texcoords.push_back(t);
      }
    } else if (s[0] == 'f' && (s[1] == ' ' || s[1] == '\t')) {
      corners.clear();
      const char *p = s + 1;
      while (*p) {
        while (*p == ' ' || *p == '\t') ++p;
        if (*p == '\0' || *p == '\n' || *p == '\r' || *p == '#') break;
        Corner c;
        if (!parse_corner(p, c)) break;
        corners.push_back(c);
        while (*p && *p != ' ' && *p != '\t' && *p != '\n' && *p != '\r')
          ++p;
      }
      // fan triangulation (models/mesh.py semantics)
      for (size_t k = 1; k + 1 < corners.size(); ++k) {
        out.face_corners.push_back(corners[0]);
        out.face_corners.push_back(corners[k]);
        out.face_corners.push_back(corners[k + 1]);
      }
    }
  }
  std::fclose(f);
  return true;
}

inline int32_t resolve(int32_t i, int32_t n) {
  return i > 0 ? i - 1 : n + i;  // OBJ relative indices
}

}  // namespace

extern "C" {

int32_t obj_count_tris(const char *path) {
  FILE *f = std::fopen(path, "r");
  if (!f) return -1;
  char line[2048];
  int64_t tris = 0;
  while (std::fgets(line, sizeof line, f)) {
    const char *s = line;
    while (*s == ' ' || *s == '\t') ++s;
    if (s[0] == 'f' && (s[1] == ' ' || s[1] == '\t')) {
      int corners = 0;
      const char *p = s + 1;
      while (*p) {
        while (*p == ' ' || *p == '\t') ++p;
        if (*p == '\0' || *p == '\n' || *p == '\r' || *p == '#') break;
        char *end;
        std::strtol(p, &end, 10);
        if (end == p) break;
        ++corners;
        while (*p && *p != ' ' && *p != '\t' && *p != '\n' && *p != '\r')
          ++p;
      }
      if (corners >= 3) tris += corners - 2;
    }
  }
  std::fclose(f);
  return (int32_t)tris;
}

int32_t obj_load(const char *path, int32_t capacity, float *v0, float *v1,
                 float *v2, float *n0, float *n1, float *n2, float *uv0,
                 float *uv1, float *uv2, int32_t *has_uv) {
  Parsed data;
  if (!parse_file(path, data)) return -1;
  const int32_t T = (int32_t)(data.face_corners.size() / 3);
  if (T > capacity) return -1;
  const int32_t nv = (int32_t)data.verts.size();
  const int32_t nn = (int32_t)data.normals.size();
  const int32_t nt = (int32_t)data.texcoords.size();
  *has_uv = nt > 0 ? 1 : 0;  // demoted below if any face lacks vt

  for (int32_t t = 0; t < T; ++t) {
    const Corner *c = &data.face_corners[size_t(t) * 3];
    V3 pos[3];
    for (int k = 0; k < 3; ++k) {
      int32_t vi = resolve(c[k].vi, nv);
      if (vi < 0 || vi >= nv) return -1;
      pos[k] = data.verts[vi];
    }
    float *vs[3] = {v0 + size_t(t) * 3, v1 + size_t(t) * 3,
                    v2 + size_t(t) * 3};
    for (int k = 0; k < 3; ++k) {
      vs[k][0] = pos[k].x;
      vs[k][1] = pos[k].y;
      vs[k][2] = pos[k].z;
    }

    const bool has_n =
        nn > 0 && c[0].ni != 0 && c[1].ni != 0 && c[2].ni != 0;
    float *ns[3] = {n0 + size_t(t) * 3, n1 + size_t(t) * 3,
                    n2 + size_t(t) * 3};
    if (has_n) {
      for (int k = 0; k < 3; ++k) {
        int32_t ni = resolve(c[k].ni, nn);
        if (ni < 0 || ni >= nn) return -1;
        ns[k][0] = data.normals[ni].x;
        ns[k][1] = data.normals[ni].y;
        ns[k][2] = data.normals[ni].z;
      }
    } else {
      // face normal fallback (models/mesh.py)
      V3 e1{pos[1].x - pos[0].x, pos[1].y - pos[0].y, pos[1].z - pos[0].z};
      V3 e2{pos[2].x - pos[0].x, pos[2].y - pos[0].y, pos[2].z - pos[0].z};
      V3 fn{e1.y * e2.z - e1.z * e2.y, e1.z * e2.x - e1.x * e2.z,
            e1.x * e2.y - e1.y * e2.x};
      float len = std::sqrt(fn.x * fn.x + fn.y * fn.y + fn.z * fn.z);
      if (len > 0.f) {
        fn.x /= len;
        fn.y /= len;
        fn.z /= len;
      } else {
        fn = {0.f, 1.f, 0.f};
      }
      for (int k = 0; k < 3; ++k) {
        ns[k][0] = fn.x;
        ns[k][1] = fn.y;
        ns[k][2] = fn.z;
      }
    }

    float *uvs[3] = {uv0 + size_t(t) * 2, uv1 + size_t(t) * 2,
                     uv2 + size_t(t) * 2};
    const bool face_uv =
        nt > 0 && c[0].ti != 0 && c[1].ti != 0 && c[2].ti != 0;
    if (face_uv) {
      for (int k = 0; k < 3; ++k) {
        int32_t ti = resolve(c[k].ti, nt);
        if (ti < 0 || ti >= nt) return -1;
        uvs[k][0] = data.texcoords[ti].u;
        uvs[k][1] = data.texcoords[ti].v;
      }
    } else {
      for (int k = 0; k < 3; ++k) {
        uvs[k][0] = 0.f;
        uvs[k][1] = 0.f;
      }
      // has_uv is per-geom: one vt-less face demotes the whole mesh to
      // the box-projection fallback (matches models/mesh.py).
      *has_uv = 0;
    }
  }
  if (T == 0) *has_uv = 0;
  return T;
}

}  // extern "C"
