// Native host-side kernels for pin-slam-tpu.
//
// The TPU (XLA) owns the compute path; this C++ extension owns the host
// runtime's hot loops, mirroring where the reference leaned on native wheels
// (skimage marching cubes, Open3D KD-tree; SURVEY.md section 2.3):
//
//   * marching tetrahedra over a masked SDF grid (mesh extraction inner loop)
//   * 3-D k-d tree nearest-neighbor distances (mesh evaluation)
//
// Built with setuptools (see native/setup.py) through the CPython C API —
// no pybind11 dependency.  pin_slam_tpu falls back to the vectorized numpy
// implementations when the extension is not built.

#define PY_SSIZE_T_CLEAN
#include <Python.h>

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <unordered_map>
#include <vector>

namespace {

// ----------------------------------------------------------------------------
// minimal ndarray accessors via the buffer protocol (avoids a numpy C-API dep)
// ----------------------------------------------------------------------------

struct BufView {
  Py_buffer view{};
  bool ok = false;
  BufView(PyObject* obj, const char* fmt, int ndim_expected) {
    if (PyObject_GetBuffer(obj, &view, PyBUF_C_CONTIGUOUS | PyBUF_FORMAT) != 0) {
      return;
    }
    if (view.ndim != ndim_expected ||
        (fmt != nullptr && view.format != nullptr &&
         std::strcmp(view.format, fmt) != 0)) {
      PyErr_Format(PyExc_ValueError,
                   "expected %d-d contiguous array of format '%s' (got ndim=%d "
                   "format='%s')",
                   ndim_expected, fmt ? fmt : "?", view.ndim,
                   view.format ? view.format : "?");
      PyBuffer_Release(&view);
      return;
    }
    ok = true;
  }
  ~BufView() {
    if (ok) PyBuffer_Release(&view);
  }
  Py_ssize_t dim(int i) const { return view.shape[i]; }
  template <typename T>
  const T* data() const {
    return static_cast<const T*>(view.buf);
  }
};

// ----------------------------------------------------------------------------
// marching tetrahedra
// ----------------------------------------------------------------------------

// 6-tet cube decomposition, identical to the Python reference
// (pin_slam_tpu/ops/marching_cubes.py) so outputs agree.
static const int kCubeCorners[8][3] = {{0, 0, 0}, {1, 0, 0}, {1, 1, 0}, {0, 1, 0},
                                       {0, 0, 1}, {1, 0, 1}, {1, 1, 1}, {0, 1, 1}};
static const int kTets[6][4] = {{0, 5, 1, 6}, {0, 1, 2, 6}, {0, 2, 3, 6},
                                {0, 3, 7, 6}, {0, 7, 4, 6}, {0, 4, 5, 6}};

// per-inside-code triangle recipes: local tet-vertex index pairs (a, b)
struct TriRecipe {
  int n_tris;
  int edges[2][3][2];
};
static TriRecipe kTriTable[16];
static bool kTriTableInit = false;

static void init_tri_table() {
  if (kTriTableInit) return;
  auto set1 = [](TriRecipe& r, int a0, int b0, int a1, int b1, int a2, int b2) {
    r.n_tris = 1;
    int e[3][2] = {{a0, b0}, {a1, b1}, {a2, b2}};
    std::memcpy(r.edges[0], e, sizeof(e));
  };
  auto set2 = [](TriRecipe& r, int t, int a0, int b0, int a1, int b1, int a2,
                 int b2) {
    r.n_tris = 2;
    int e[3][2] = {{a0, b0}, {a1, b1}, {a2, b2}};
    std::memcpy(r.edges[t], e, sizeof(e));
  };
  std::memset(kTriTable, 0, sizeof(kTriTable));
  set1(kTriTable[1], 0, 1, 0, 2, 0, 3);
  set1(kTriTable[2], 1, 0, 1, 3, 1, 2);
  set1(kTriTable[4], 2, 0, 2, 1, 2, 3);
  set1(kTriTable[8], 3, 0, 3, 2, 3, 1);
  kTriTable[3].n_tris = 0;
  set2(kTriTable[3], 0, 0, 2, 0, 3, 1, 3);
  set2(kTriTable[3], 1, 0, 2, 1, 3, 1, 2);
  set2(kTriTable[5], 0, 0, 1, 2, 3, 0, 3);
  set2(kTriTable[5], 1, 0, 1, 2, 1, 2, 3);
  set2(kTriTable[9], 0, 0, 1, 0, 2, 3, 2);
  set2(kTriTable[9], 1, 0, 1, 3, 2, 3, 1);
  set2(kTriTable[6], 0, 1, 0, 2, 0, 2, 3);
  set2(kTriTable[6], 1, 1, 0, 2, 3, 1, 3);
  set2(kTriTable[10], 0, 1, 0, 1, 2, 3, 2);
  set2(kTriTable[10], 1, 3, 0, 1, 0, 3, 2);
  set2(kTriTable[12], 0, 2, 0, 3, 0, 3, 1);
  set2(kTriTable[12], 1, 2, 1, 2, 0, 3, 1);
  set1(kTriTable[14], 1, 0, 2, 0, 3, 0);
  set1(kTriTable[13], 0, 1, 3, 1, 2, 1);
  set1(kTriTable[11], 0, 2, 1, 2, 3, 2);
  set1(kTriTable[7], 0, 3, 2, 3, 1, 3);
  kTriTableInit = true;
}

static PyObject* marching_tetrahedra(PyObject*, PyObject* args) {
  PyObject *sdf_obj, *mask_obj;
  double ox, oy, oz, spacing, iso;
  Py_ssize_t nx, ny, nz;
  // sdf: float64 C-contig flat buffer + dims; mask: uint8 flat or None
  if (!PyArg_ParseTuple(args, "OnnnOdddd" "d", &sdf_obj, &nx, &ny, &nz,
                        &mask_obj, &ox, &oy, &oz, &spacing, &iso)) {
    return nullptr;
  }
  init_tri_table();

  BufView sdf(sdf_obj, "d", 1);
  if (!sdf.ok) return nullptr;
  if (sdf.dim(0) != nx * ny * nz) {
    PyErr_SetString(PyExc_ValueError, "sdf size mismatch");
    return nullptr;
  }
  const double* s = sdf.data<double>();
  const uint8_t* m = nullptr;
  BufView* maskview = nullptr;
  if (mask_obj != Py_None) {
    maskview = new BufView(mask_obj, "B", 1);
    if (!maskview->ok) {
      delete maskview;
      return nullptr;
    }
    m = maskview->data<uint8_t>();
  }

  auto node = [ny, nz](Py_ssize_t i, Py_ssize_t j, Py_ssize_t k) {
    return (i * ny + j) * nz + k;
  };

  // edge (lo<<32|hi sorted pair) -> vertex index
  std::unordered_map<uint64_t, int64_t> edge_map;
  std::vector<double> verts;   // xyz triplets
  std::vector<int64_t> faces;  // index triplets
  edge_map.reserve(1 << 16);

  auto emit_vertex = [&](int64_t a, int64_t b) -> int64_t {
    int64_t lo = std::min(a, b), hi = std::max(a, b);
    uint64_t key = (static_cast<uint64_t>(lo) << 32) | static_cast<uint64_t>(hi);
    auto it = edge_map.find(key);
    if (it != edge_map.end()) return it->second;
    double va = s[lo] - iso, vb = s[hi] - iso;
    double t = va / (va - vb);
    if (!std::isfinite(t)) t = 0.5;
    t = std::min(1.0, std::max(0.0, t));
    auto xyz = [&](int64_t idx, double out[3]) {
      out[0] = static_cast<double>(idx / (ny * nz));
      out[1] = static_cast<double>((idx / nz) % ny);
      out[2] = static_cast<double>(idx % nz);
    };
    double pa[3], pb[3];
    xyz(lo, pa);
    xyz(hi, pb);
    int64_t vid = static_cast<int64_t>(verts.size() / 3);
    verts.push_back((pa[0] + t * (pb[0] - pa[0])) * spacing + ox);
    verts.push_back((pa[1] + t * (pb[1] - pa[1])) * spacing + oy);
    verts.push_back((pa[2] + t * (pb[2] - pa[2])) * spacing + oz);
    edge_map.emplace(key, vid);
    return vid;
  };

  for (Py_ssize_t i = 0; i + 1 < nx; ++i) {
    for (Py_ssize_t j = 0; j + 1 < ny; ++j) {
      for (Py_ssize_t k = 0; k + 1 < nz; ++k) {
        int64_t corner[8];
        bool all_ok = true;
        double lo = 1e300, hi = -1e300;
        for (int c = 0; c < 8; ++c) {
          corner[c] = node(i + kCubeCorners[c][0], j + kCubeCorners[c][1],
                           k + kCubeCorners[c][2]);
          if (m != nullptr && !m[corner[c]]) {
            all_ok = false;
            break;
          }
          double v = s[corner[c]] - iso;
          lo = std::min(lo, v);
          hi = std::max(hi, v);
        }
        if (!all_ok || lo >= 0 || hi < 0) continue;
        for (int t = 0; t < 6; ++t) {
          int64_t tv[4];
          int code = 0;
          for (int v = 0; v < 4; ++v) {
            tv[v] = corner[kTets[t][v]];
            if (s[tv[v]] - iso < 0) code |= (1 << v);
          }
          const TriRecipe& r = kTriTable[code];
          for (int tri = 0; tri < r.n_tris; ++tri) {
            int64_t f[3];
            bool degenerate = false;
            for (int e = 0; e < 3; ++e) {
              f[e] = emit_vertex(tv[r.edges[tri][e][0]], tv[r.edges[tri][e][1]]);
            }
            if (f[0] == f[1] || f[1] == f[2] || f[0] == f[2]) degenerate = true;
            if (!degenerate) {
              faces.push_back(f[0]);
              faces.push_back(f[1]);
              faces.push_back(f[2]);
            }
          }
        }
      }
    }
  }
  delete maskview;

  PyObject* verts_bytes =
      PyBytes_FromStringAndSize(reinterpret_cast<const char*>(verts.data()),
                                static_cast<Py_ssize_t>(verts.size() * sizeof(double)));
  PyObject* faces_bytes =
      PyBytes_FromStringAndSize(reinterpret_cast<const char*>(faces.data()),
                                static_cast<Py_ssize_t>(faces.size() * sizeof(int64_t)));
  PyObject* out = Py_BuildValue("(NN)", verts_bytes, faces_bytes);
  return out;
}

// ----------------------------------------------------------------------------
// k-d tree nearest neighbor distances (mesh eval)
// ----------------------------------------------------------------------------

struct KDNode {
  float pt[3];
  int axis;
  int left = -1, right = -1;
};

static int build_kd(std::vector<KDNode>& nodes, std::vector<int>& idx,
                    const float* pts, int lo, int hi, int depth) {
  if (lo >= hi) return -1;
  int axis = depth % 3;
  int mid = (lo + hi) / 2;
  std::nth_element(idx.begin() + lo, idx.begin() + mid, idx.begin() + hi,
                   [&](int a, int b) { return pts[a * 3 + axis] < pts[b * 3 + axis]; });
  int me = static_cast<int>(nodes.size());
  nodes.push_back(KDNode{});
  KDNode& n = nodes.back();
  std::memcpy(nodes[me].pt, pts + idx[mid] * 3, 3 * sizeof(float));
  nodes[me].axis = axis;
  int l = build_kd(nodes, idx, pts, lo, mid, depth + 1);
  int r = build_kd(nodes, idx, pts, mid + 1, hi, depth + 1);
  nodes[me].left = l;
  nodes[me].right = r;
  return me;
}

static void query_kd(const std::vector<KDNode>& nodes, int root, const float* q,
                     float& best) {
  if (root < 0) return;
  const KDNode& n = nodes[root];
  float dx = q[0] - n.pt[0], dy = q[1] - n.pt[1], dz = q[2] - n.pt[2];
  float d2 = dx * dx + dy * dy + dz * dz;
  if (d2 < best) best = d2;
  float delta = q[n.axis] - n.pt[n.axis];
  int near = delta < 0 ? n.left : n.right;
  int far = delta < 0 ? n.right : n.left;
  query_kd(nodes, near, q, best);
  if (delta * delta < best) query_kd(nodes, far, q, best);
}

static PyObject* nn_distances(PyObject*, PyObject* args) {
  PyObject *src_obj, *dst_obj;
  if (!PyArg_ParseTuple(args, "OO", &src_obj, &dst_obj)) return nullptr;
  BufView src(src_obj, "f", 1), dst(dst_obj, "f", 1);
  if (!src.ok || !dst.ok) return nullptr;
  Py_ssize_t ns = src.dim(0) / 3, nd = dst.dim(0) / 3;
  if (nd == 0) {
    PyErr_SetString(PyExc_ValueError, "empty destination cloud");
    return nullptr;
  }
  std::vector<KDNode> nodes;
  nodes.reserve(nd);
  std::vector<int> idx(nd);
  for (Py_ssize_t i = 0; i < nd; ++i) idx[i] = static_cast<int>(i);
  int root;
  const float* dstp = dst.data<float>();
  const float* srcp = src.data<float>();
  std::vector<float> out(ns);
  Py_BEGIN_ALLOW_THREADS
  root = build_kd(nodes, idx, dstp, 0, static_cast<int>(nd), 0);
  for (Py_ssize_t i = 0; i < ns; ++i) {
    float best = 1e30f;
    query_kd(nodes, root, srcp + i * 3, best);
    out[i] = std::sqrt(best);
  }
  Py_END_ALLOW_THREADS
  return PyBytes_FromStringAndSize(reinterpret_cast<const char*>(out.data()),
                                   static_cast<Py_ssize_t>(ns * sizeof(float)));
}

static PyMethodDef kMethods[] = {
    {"marching_tetrahedra", marching_tetrahedra, METH_VARARGS,
     "marching_tetrahedra(sdf_flat_f64, nx, ny, nz, mask_flat_u8_or_None, "
     "ox, oy, oz, spacing, iso) -> (verts_f64_bytes, faces_i64_bytes)"},
    {"nn_distances", nn_distances, METH_VARARGS,
     "nn_distances(src_flat_f32, dst_flat_f32) -> dist_f32_bytes"},
    {nullptr, nullptr, 0, nullptr}};

static struct PyModuleDef kModule = {PyModuleDef_HEAD_INIT, "pin_native",
                                     "native host kernels for pin-slam-tpu", -1,
                                     kMethods};

}  // namespace

PyMODINIT_FUNC PyInit_pin_native() { return PyModule_Create(&kModule); }
