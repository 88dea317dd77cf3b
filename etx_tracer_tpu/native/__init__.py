"""Native (C++) host components, loaded via ctypes with build-on-demand.

The reference's host-side native layer (Embree BVH builds, tinyobj parsing)
maps here: a binned-SAH BVH builder and a fast OBJ parser compiled from the
bundled C++ sources with g++ on first use. Every entry point has a pure
Python/numpy fallback, so the framework works without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_DIR, "libetx_native.so")
_SOURCES = ["bvh_builder.cpp", "obj_parser.cpp", "blosc_decoder.cpp",
            "alias_builder.cpp", "exr_decoder.cpp"]

_lock = threading.Lock()
_lib = None
_build_failed = False


def _build() -> bool:
  cmd = ["g++", "-O2", "-shared", "-fPIC", "-std=c++17",
         "-o", _LIB_PATH] + [os.path.join(_DIR, s) for s in _SOURCES] + ["-lz"]
  try:
    subprocess.run(cmd, check=True, capture_output=True, timeout=240)
    return True
  except Exception:
    return False


def load():
  """Returns the ctypes library or None when unavailable."""
  global _lib, _build_failed
  with _lock:
    if _lib is not None:
      return _lib
    if _build_failed:
      return None
    newest_src = max(os.path.getmtime(os.path.join(_DIR, s)) for s in _SOURCES)
    if not os.path.exists(_LIB_PATH) or os.path.getmtime(_LIB_PATH) < newest_src:
      if not _build():
        _build_failed = True
        return None
    try:
      lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
      _build_failed = True
      return None

    lib.etx_bvh_build.restype = ctypes.c_int32
    lib.etx_obj_parse.restype = ctypes.c_int32
    lib.etx_obj_counts.restype = ctypes.c_int32
    lib.etx_obj_data.restype = ctypes.c_int32
    lib.etx_obj_material_name.restype = ctypes.c_int32
    lib.etx_obj_mtllib.restype = ctypes.c_int32
    lib.etx_blosc_decompress.restype = ctypes.c_int64
    lib.etx_alias_build.restype = ctypes.c_int32
    lib.etx_piz_decode.restype = ctypes.c_int64
    lib.etx_piz_encode.restype = ctypes.c_int64
    _lib = lib
    return _lib


def build_alias_tables(p: "np.ndarray"):
  """Batched Vose alias construction: p (rows, n) -> (prob, alias) or None
  when the native library is unavailable."""
  lib = load()
  if lib is None:
    return None
  p = np.ascontiguousarray(p, np.float32)
  rows, n = p.shape
  prob = np.zeros((rows, n), np.float32)
  alias = np.zeros((rows, n), np.int32)
  rc = lib.etx_alias_build(
      p.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
      ctypes.c_int32(rows), ctypes.c_int32(n),
      prob.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
      alias.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
  if rc != 0:
    return None
  return prob, alias


def blosc_decompress(data: bytes, nbytes: int) -> bytes | None:
  """Decompress one blosc1 frame (LZ4/zlib inner codecs) to `nbytes` bytes.

  Returns None when the native library is unavailable; raises ValueError on
  malformed/unsupported frames (so callers can distinguish 'no toolchain'
  from 'bad file').
  """
  lib = load()
  if lib is None:
    return None
  src = np.frombuffer(data, np.uint8)
  dst = np.zeros(max(nbytes, 1), np.uint8)
  n = lib.etx_blosc_decompress(
      src.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
      ctypes.c_int64(src.size),
      dst.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
      ctypes.c_int64(dst.size))
  if n < 0:
    codes = {-1: "malformed blosc frame", -2: "output too small",
             -3: "unsupported inner codec (only LZ4/zlib)",
             -4: "bitshuffle filter unsupported", -5: "inner codec error"}
    raise ValueError(codes.get(int(n), f"blosc decode error {n}"))
  return dst[:n].tobytes()


def piz_decode(data: bytes, ch_words: "np.ndarray", width: int,
               n_lines: int) -> bytes | None:
  """Decode one PIZ scanline block to the uncompressed block layout
  (per line, per channel, width*2*words bytes). ch_words: u16 words per
  pixel per channel in file order (1=HALF, 2=FLOAT/UINT). Returns None when
  the native library is unavailable; raises ValueError on malformed data."""
  lib = load()
  if lib is None:
    return None
  src = np.frombuffer(data, np.uint8)
  cw = np.ascontiguousarray(ch_words, np.int32)
  out_bytes = int(2 * width * int(cw.sum()) * n_lines)
  dst = np.zeros(max(out_bytes, 1), np.uint8)
  n = lib.etx_piz_decode(
      src.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
      ctypes.c_int64(src.size),
      ctypes.c_int32(len(cw)),
      cw.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
      ctypes.c_int32(width), ctypes.c_int32(n_lines),
      dst.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
      ctypes.c_int64(dst.size))
  if n < 0:
    codes = {-1: "malformed PIZ block", -2: "output too small",
             -3: "PIZ huffman error"}
    raise ValueError(codes.get(int(n), f"PIZ decode error {n}"))
  return dst[:n].tobytes()


def piz_encode(data: bytes, ch_words: "np.ndarray", width: int,
               n_lines: int) -> bytes | None:
  """PIZ-compress one scanline block (inverse of piz_decode). Returns None
  when the native library is unavailable or the data is uncompressible."""
  lib = load()
  if lib is None:
    return None
  src = np.frombuffer(data, np.uint8)
  cw = np.ascontiguousarray(ch_words, np.int32)
  dst = np.zeros(len(data) * 2 + 65536 + 64, np.uint8)
  n = lib.etx_piz_encode(
      src.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
      ctypes.c_int64(src.size),
      ctypes.c_int32(len(cw)),
      cw.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
      ctypes.c_int32(width), ctypes.c_int32(n_lines),
      dst.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
      ctypes.c_int64(dst.size))
  if n < 0:
    return None
  return dst[:n].tobytes()


def _ptr_f32(a):
  return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _ptr_i32(a):
  return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def build_bvh_native(v0: np.ndarray, e1: np.ndarray, e2: np.ndarray):
  """Binned-SAH build; returns the flattened array dict or None."""
  lib = load()
  if lib is None:
    return None
  t = int(v0.shape[0])
  cap = max(2 * t, 1)
  node_min = np.zeros((cap, 3), np.float32)
  node_max = np.zeros((cap, 3), np.float32)
  node_left = np.zeros(cap, np.int32)
  node_count = np.zeros(cap, np.int32)
  prim_index = np.zeros(max(t, 1), np.int32)
  v0 = np.ascontiguousarray(v0, np.float32)
  e1 = np.ascontiguousarray(e1, np.float32)
  e2 = np.ascontiguousarray(e2, np.float32)
  n = lib.etx_bvh_build(_ptr_f32(v0), _ptr_f32(e1), _ptr_f32(e2),
                        ctypes.c_int32(t),
                        _ptr_f32(node_min), _ptr_f32(node_max),
                        _ptr_i32(node_left), _ptr_i32(node_count),
                        _ptr_i32(prim_index))
  if n <= 0:
    return None
  return {
      "node_min": node_min[:n].copy(),
      "node_max": node_max[:n].copy(),
      "node_left": node_left[:n].copy(),
      "node_count": node_count[:n].copy(),
      "prim_index": prim_index,
  }


def parse_obj_native(path: str):
  """Parse OBJ geometry; returns dict or None on any failure."""
  lib = load()
  if lib is None:
    return None
  rc = lib.etx_obj_parse(path.encode())
  if rc != 0:
    return None
  np_, nn, nt, ntri, nm = (ctypes.c_int32(), ctypes.c_int32(), ctypes.c_int32(),
                           ctypes.c_int32(), ctypes.c_int32())
  lib.etx_obj_counts(ctypes.byref(np_), ctypes.byref(nn), ctypes.byref(nt),
                     ctypes.byref(ntri), ctypes.byref(nm))
  positions = np.zeros((max(np_.value, 1), 3), np.float32)
  normals = np.zeros((max(nn.value, 1), 3), np.float32)
  uvs = np.zeros((max(nt.value, 1), 2), np.float32)
  pos_idx = np.zeros(3 * max(ntri.value, 1), np.int32)
  nrm_idx = np.zeros(3 * max(ntri.value, 1), np.int32)
  uv_idx = np.zeros(3 * max(ntri.value, 1), np.int32)
  tri_mtl = np.zeros(max(ntri.value, 1), np.int32)
  lib.etx_obj_data(_ptr_f32(positions), _ptr_f32(normals), _ptr_f32(uvs),
                   _ptr_i32(pos_idx), _ptr_i32(nrm_idx), _ptr_i32(uv_idx),
                   _ptr_i32(tri_mtl))
  names = []
  buf = ctypes.create_string_buffer(1024)
  for i in range(nm.value):
    lib.etx_obj_material_name(ctypes.c_int32(i), buf, ctypes.c_int32(1024))
    names.append(buf.value.decode())
  lib.etx_obj_mtllib(buf, ctypes.c_int32(1024))
  mtllib = buf.value.decode()
  lib.etx_obj_free()
  return {
      "positions": positions[:np_.value],
      "normals": normals[:nn.value],
      "uvs": uvs[:nt.value],
      "pos_idx": pos_idx[:3 * ntri.value].reshape(-1, 3),
      "nrm_idx": nrm_idx[:3 * ntri.value].reshape(-1, 3),
      "uv_idx": uv_idx[:3 * ntri.value].reshape(-1, 3),
      "tri_mtl": tri_mtl[:ntri.value],
      "mtl_names": names,
      "mtllib": mtllib,
  }
