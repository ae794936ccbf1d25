// woft_native: host-side data pipeline for the WOFT-TPU framework.
//
// Native equivalent of the runtime work the reference does in Python per
// frame (cv2.imread + BGR->RGB + float conversion,
// ref:pytracking/optical_flow/raft.py:113-120, utils/io.py:145-177):
//
//  - decode_jpeg(bytes)            libjpeg decode -> HxWx3 uint8 (BGR,
//                                  cv2-compatible channel order)
//  - bgr_to_rgb_f32(img[, pad_h, pad_w])
//                                  fused channel swap + float32 convert
//                                  (+ zero pad to /8) in one pass
//  - FrameLoader(paths, n_threads, prefetch)
//                                  background decode+convert pipeline with
//                                  a bounded in-order queue: the double-
//                                  buffered host feed for the device loop
//
// CPython C API + numpy array API; no pybind11 (not in the image).

#define PY_SSIZE_T_CLEAN
#include <Python.h>
#define NPY_NO_DEPRECATED_API NPY_1_7_API_VERSION
#include <numpy/arrayobject.h>

#include <jpeglib.h>

#include <atomic>
#include <condition_variable>
#include <csetjmp>
#include <cstdio>
#include <cstring>
#include <deque>
#include <memory>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

namespace {

// ---------------------------------------------------------------------------
// JPEG decode (libjpeg, error-resumable)
// ---------------------------------------------------------------------------

struct JpegErrorMgr {
  jpeg_error_mgr pub;
  jmp_buf setjmp_buffer;
  char message[JMSG_LENGTH_MAX];
};

void jpeg_error_exit(j_common_ptr cinfo) {
  auto* err = reinterpret_cast<JpegErrorMgr*>(cinfo->err);
  (*cinfo->err->format_message)(cinfo, err->message);
  longjmp(err->setjmp_buffer, 1);
}

struct DecodedImage {
  std::vector<unsigned char> data;  // HxWx3 BGR
  int height = 0;
  int width = 0;
  std::string error;
  bool ok() const { return error.empty(); }
};

DecodedImage decode_jpeg_bytes(const unsigned char* buf, size_t len,
                               bool keep_rgb = false) {
  DecodedImage out;
  jpeg_decompress_struct cinfo;
  JpegErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = jpeg_error_exit;
  if (setjmp(jerr.setjmp_buffer)) {
    out.error = jerr.message;
    jpeg_destroy_decompress(&cinfo);
    return out;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, const_cast<unsigned char*>(buf),
               static_cast<unsigned long>(len));
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);

  out.height = static_cast<int>(cinfo.output_height);
  out.width = static_cast<int>(cinfo.output_width);
  const int stride = out.width * 3;
  out.data.resize(static_cast<size_t>(out.height) * stride);

  std::vector<unsigned char> row(stride);
  unsigned char* rowp = row.data();
  while (cinfo.output_scanline < cinfo.output_height) {
    const int y = static_cast<int>(cinfo.output_scanline);
    jpeg_read_scanlines(&cinfo, &rowp, 1);
    unsigned char* dst = out.data.data() + static_cast<size_t>(y) * stride;
    if (keep_rgb) {
      std::memcpy(dst, row.data(), static_cast<size_t>(stride));
    } else {
      // store BGR for cv2 compatibility
      for (int x = 0; x < out.width; ++x) {
        dst[3 * x + 0] = row[3 * x + 2];
        dst[3 * x + 1] = row[3 * x + 1];
        dst[3 * x + 2] = row[3 * x + 0];
      }
    }
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return out;
}

DecodedImage decode_jpeg_file(const std::string& path,
                              bool keep_rgb = false) {
  DecodedImage out;
  FILE* f = std::fopen(path.c_str(), "rb");
  if (!f) {
    out.error = "cannot open " + path;
    return out;
  }
  std::fseek(f, 0, SEEK_END);
  const long size = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  std::vector<unsigned char> buf(static_cast<size_t>(size));
  if (std::fread(buf.data(), 1, buf.size(), f) != buf.size()) {
    std::fclose(f);
    out.error = "short read: " + path;
    return out;
  }
  std::fclose(f);
  return decode_jpeg_bytes(buf.data(), buf.size(), keep_rgb);
}

// ---------------------------------------------------------------------------
// fused channel-swap/copy -> float32 (+ zero pad) conversion
// ---------------------------------------------------------------------------

void bgr_to_rgb_f32_kernel(const unsigned char* src, float* dst, int h,
                           int w, int out_h, int out_w, bool swap = true) {
  // dst is (out_h, out_w, 3) float32, zero-initialised by caller when padded
  for (int y = 0; y < h; ++y) {
    const unsigned char* s = src + static_cast<size_t>(y) * w * 3;
    float* d = dst + static_cast<size_t>(y) * out_w * 3;
    if (swap) {
      for (int x = 0; x < w; ++x) {
        d[3 * x + 0] = static_cast<float>(s[3 * x + 2]);
        d[3 * x + 1] = static_cast<float>(s[3 * x + 1]);
        d[3 * x + 2] = static_cast<float>(s[3 * x + 0]);
      }
    } else {
      const int n = w * 3;
      for (int x = 0; x < n; ++x) d[x] = static_cast<float>(s[x]);
    }
  }
}

// ---------------------------------------------------------------------------
// Python bindings
// ---------------------------------------------------------------------------

PyObject* py_decode_jpeg(PyObject*, PyObject* args) {
  Py_buffer view;
  if (!PyArg_ParseTuple(args, "y*", &view)) return nullptr;
  DecodedImage img;
  Py_BEGIN_ALLOW_THREADS
  img = decode_jpeg_bytes(static_cast<const unsigned char*>(view.buf),
                          static_cast<size_t>(view.len));
  Py_END_ALLOW_THREADS
  PyBuffer_Release(&view);
  if (!img.ok()) {
    PyErr_SetString(PyExc_ValueError, img.error.c_str());
    return nullptr;
  }
  npy_intp dims[3] = {img.height, img.width, 3};
  PyObject* arr = PyArray_SimpleNew(3, dims, NPY_UINT8);
  if (!arr) return nullptr;
  std::memcpy(PyArray_DATA(reinterpret_cast<PyArrayObject*>(arr)),
              img.data.data(), img.data.size());
  return arr;
}

PyObject* py_bgr_to_rgb_f32(PyObject*, PyObject* args) {
  PyObject* obj;
  int out_h = -1, out_w = -1;
  if (!PyArg_ParseTuple(args, "O|ii", &obj, &out_h, &out_w)) return nullptr;
  PyArrayObject* in = reinterpret_cast<PyArrayObject*>(
      PyArray_FROM_OTF(obj, NPY_UINT8, NPY_ARRAY_C_CONTIGUOUS));
  if (!in) return nullptr;
  if (PyArray_NDIM(in) != 3 || PyArray_DIM(in, 2) != 3) {
    Py_DECREF(in);
    PyErr_SetString(PyExc_ValueError, "expected (H, W, 3) uint8");
    return nullptr;
  }
  const int h = static_cast<int>(PyArray_DIM(in, 0));
  const int w = static_cast<int>(PyArray_DIM(in, 1));
  if (out_h < 0) out_h = h;
  if (out_w < 0) out_w = w;
  if (out_h < h || out_w < w) {
    Py_DECREF(in);
    PyErr_SetString(PyExc_ValueError, "pad size smaller than image");
    return nullptr;
  }
  npy_intp dims[3] = {out_h, out_w, 3};
  PyObject* arr = (out_h == h && out_w == w)
                      ? PyArray_SimpleNew(3, dims, NPY_FLOAT32)
                      : PyArray_ZEROS(3, dims, NPY_FLOAT32, 0);
  if (!arr) {
    Py_DECREF(in);
    return nullptr;
  }
  const unsigned char* src =
      static_cast<const unsigned char*>(PyArray_DATA(in));
  float* dst = static_cast<float*>(
      PyArray_DATA(reinterpret_cast<PyArrayObject*>(arr)));
  Py_BEGIN_ALLOW_THREADS
  bgr_to_rgb_f32_kernel(src, dst, h, w, out_h, out_w);
  Py_END_ALLOW_THREADS
  Py_DECREF(in);
  return arr;
}

// ---------------------------------------------------------------------------
// FrameLoader: threaded decode+convert pipeline with bounded ordered queue
// ---------------------------------------------------------------------------

struct Frame {
  std::vector<float> rgb;          // (h, w, 3) float32 RGB
  std::vector<unsigned char> rgb8; // (h, w, 3) uint8 RGB (as_uint8 mode)
  int height = 0;
  int width = 0;
  std::string error;
};

struct LoaderState {
  std::vector<std::string> paths;
  int pad_h = -1, pad_w = -1;
  bool as_u8 = false;  // skip the f32 convert; consumer casts on-device
  size_t prefetch = 4;
  std::deque<std::pair<size_t, std::shared_ptr<Frame>>> ready;
  size_t next_submit = 0;   // next index a worker may take
  size_t next_emit = 0;     // next index the consumer wants
  std::mutex mu;
  std::condition_variable cv_ready;
  std::condition_variable cv_space;
  std::atomic<bool> stop{false};
  std::vector<std::thread> workers;

  void worker() {
    for (;;) {
      size_t idx;
      {
        std::unique_lock<std::mutex> lock(mu);
        cv_space.wait(lock, [&] {
          return stop || (next_submit < paths.size() &&
                          ready.size() < prefetch + workers.size());
        });
        if (stop || next_submit >= paths.size()) return;
        idx = next_submit++;
      }
      auto frame = std::make_shared<Frame>();
      // decode straight to RGB: the loader path never needs the BGR view
      DecodedImage img = decode_jpeg_file(paths[idx], /*keep_rgb=*/true);
      if (!img.ok()) {
        frame->error = img.error;
      } else {
        const int oh = pad_h > 0 ? pad_h : img.height;
        const int ow = pad_w > 0 ? pad_w : img.width;
        frame->height = oh;
        frame->width = ow;
        if (as_u8) {
          // keep uint8 end-to-end: 4x fewer bytes for the host->device
          // upload; the jitted step casts to f32 in-graph
          frame->rgb8.assign(static_cast<size_t>(oh) * ow * 3, 0);
          const int copy_w = img.width < ow ? img.width : ow;
          const int copy_h = img.height < oh ? img.height : oh;
          for (int y = 0; y < copy_h; ++y)
            std::memcpy(frame->rgb8.data() + static_cast<size_t>(y) * ow * 3,
                        img.data.data() + static_cast<size_t>(y) * img.width * 3,
                        static_cast<size_t>(copy_w) * 3);
        } else {
          frame->rgb.assign(static_cast<size_t>(oh) * ow * 3, 0.0f);
          bgr_to_rgb_f32_kernel(img.data.data(), frame->rgb.data(),
                                img.height, img.width, oh, ow, /*swap=*/false);
        }
      }
      {
        std::lock_guard<std::mutex> lock(mu);
        ready.emplace_back(idx, std::move(frame));
      }
      cv_ready.notify_all();
    }
  }

  std::shared_ptr<Frame> next() {
    std::unique_lock<std::mutex> lock(mu);
    if (next_emit >= paths.size()) return nullptr;
    const size_t want = next_emit;
    cv_ready.wait(lock, [&] {
      if (stop) return true;
      for (auto& kv : ready)
        if (kv.first == want) return true;
      return false;
    });
    if (stop) return nullptr;
    std::shared_ptr<Frame> out;
    for (auto it = ready.begin(); it != ready.end(); ++it) {
      if (it->first == want) {
        out = it->second;
        ready.erase(it);
        break;
      }
    }
    ++next_emit;
    cv_space.notify_all();
    return out;
  }

  void shutdown() {
    stop = true;
    cv_space.notify_all();
    cv_ready.notify_all();
    for (auto& t : workers)
      if (t.joinable()) t.join();
    workers.clear();
  }
};

struct PyFrameLoader {
  PyObject_HEAD
  LoaderState* state;
};

int loader_init(PyObject* self_obj, PyObject* args, PyObject* kwargs) {
  static const char* kwlist[] = {"paths", "n_threads", "prefetch",
                                 "pad_h", "pad_w",     "as_uint8", nullptr};
  PyObject* paths_obj;
  int n_threads = 2, prefetch = 4, pad_h = -1, pad_w = -1, as_uint8 = 0;
  if (!PyArg_ParseTupleAndKeywords(
          args, kwargs, "O|iiiii", const_cast<char**>(kwlist), &paths_obj,
          &n_threads, &prefetch, &pad_h, &pad_w, &as_uint8))
    return -1;

  auto* self = reinterpret_cast<PyFrameLoader*>(self_obj);
  self->state = new LoaderState();
  self->state->prefetch = static_cast<size_t>(prefetch);
  self->state->pad_h = pad_h;
  self->state->pad_w = pad_w;
  self->state->as_u8 = as_uint8 != 0;

  PyObject* seq = PySequence_Fast(paths_obj, "paths must be a sequence");
  if (!seq) return -1;
  const Py_ssize_t n = PySequence_Fast_GET_SIZE(seq);
  for (Py_ssize_t i = 0; i < n; ++i) {
    PyObject* item = PySequence_Fast_GET_ITEM(seq, i);
    PyObject* str = PyObject_Str(item);
    if (!str) {
      Py_DECREF(seq);
      return -1;
    }
    const char* utf8 = PyUnicode_AsUTF8(str);
    if (!utf8) {  // non-UTF-8-encodable path: propagate the pending error
      Py_DECREF(str);
      Py_DECREF(seq);
      return -1;
    }
    self->state->paths.emplace_back(utf8);
    Py_DECREF(str);
  }
  Py_DECREF(seq);

  for (int i = 0; i < n_threads; ++i)
    self->state->workers.emplace_back(&LoaderState::worker, self->state);
  return 0;
}

void loader_dealloc(PyObject* self_obj) {
  auto* self = reinterpret_cast<PyFrameLoader*>(self_obj);
  if (self->state) {
    self->state->shutdown();
    delete self->state;
  }
  Py_TYPE(self_obj)->tp_free(self_obj);
}

PyObject* loader_next_frame(PyObject* self_obj, PyObject*) {
  auto* self = reinterpret_cast<PyFrameLoader*>(self_obj);
  std::shared_ptr<Frame> frame;
  Py_BEGIN_ALLOW_THREADS
  frame = self->state->next();
  Py_END_ALLOW_THREADS
  if (!frame) Py_RETURN_NONE;
  if (!frame->error.empty()) {
    PyErr_SetString(PyExc_IOError, frame->error.c_str());
    return nullptr;
  }
  npy_intp dims[3] = {frame->height, frame->width, 3};
  if (!frame->rgb8.empty()) {
    PyObject* arr = PyArray_SimpleNew(3, dims, NPY_UINT8);
    if (!arr) return nullptr;
    std::memcpy(PyArray_DATA(reinterpret_cast<PyArrayObject*>(arr)),
                frame->rgb8.data(), frame->rgb8.size());
    return arr;
  }
  PyObject* arr = PyArray_SimpleNew(3, dims, NPY_FLOAT32);
  if (!arr) return nullptr;
  std::memcpy(PyArray_DATA(reinterpret_cast<PyArrayObject*>(arr)),
              frame->rgb.data(), frame->rgb.size() * sizeof(float));
  return arr;
}

PyObject* loader_len(PyObject* self_obj, PyObject*) {
  auto* self = reinterpret_cast<PyFrameLoader*>(self_obj);
  return PyLong_FromSize_t(self->state->paths.size());
}

PyMethodDef loader_methods[] = {
    {"next_frame", loader_next_frame, METH_NOARGS,
     "Next decoded (H, W, 3) RGB frame (float32, or uint8 with "
     "as_uint8=True), or None at end."},
    {"num_frames", loader_len, METH_NOARGS, "Total frame count."},
    {nullptr, nullptr, 0, nullptr}};

PyTypeObject PyFrameLoaderType = {PyVarObject_HEAD_INIT(nullptr, 0)};

PyMethodDef module_methods[] = {
    {"decode_jpeg", py_decode_jpeg, METH_VARARGS,
     "Decode JPEG bytes -> (H, W, 3) uint8 BGR array."},
    {"bgr_to_rgb_f32", py_bgr_to_rgb_f32, METH_VARARGS,
     "(H, W, 3) uint8 BGR -> (out_h, out_w, 3) float32 RGB, zero-padded."},
    {nullptr, nullptr, 0, nullptr}};

PyModuleDef module_def = {PyModuleDef_HEAD_INIT, "woft_native",
                          "Native host data pipeline for WOFT-TPU.", -1,
                          module_methods};

}  // namespace

PyMODINIT_FUNC PyInit_woft_native(void) {
  import_array();
  PyFrameLoaderType.tp_name = "woft_native.FrameLoader";
  PyFrameLoaderType.tp_basicsize = sizeof(PyFrameLoader);
  PyFrameLoaderType.tp_flags = Py_TPFLAGS_DEFAULT;
  PyFrameLoaderType.tp_doc = "Threaded JPEG decode + convert prefetcher.";
  PyFrameLoaderType.tp_new = PyType_GenericNew;
  PyFrameLoaderType.tp_init = loader_init;
  PyFrameLoaderType.tp_dealloc = loader_dealloc;
  PyFrameLoaderType.tp_methods = loader_methods;
  if (PyType_Ready(&PyFrameLoaderType) < 0) return nullptr;

  PyObject* mod = PyModule_Create(&module_def);
  if (!mod) return nullptr;
  Py_INCREF(&PyFrameLoaderType);
  PyModule_AddObject(mod, "FrameLoader",
                     reinterpret_cast<PyObject*>(&PyFrameLoaderType));
  return mod;
}