"""Image output: EXR (self-contained writer/reader) and PNG.

Replaces the reference's tinyexr/stb usage (render/host/image_pool.cxx,
app save paths) without external deps: a minimal scanline float EXR codec
and a minimal PNG encoder.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np


def _flip(img: np.ndarray) -> np.ndarray:
  """Film arrays are bottom-up (NDC v); images are stored top-down."""
  return img[::-1]


# ---------------------------------------------------------------------------
# EXR (uncompressed scanline, float32, RGB)
# ---------------------------------------------------------------------------


def save_exr(path: str, image: np.ndarray, flip: bool = True):
  """Write (H,W,3) float32 as an uncompressed scanline EXR."""
  img = np.asarray(image, np.float32)
  if flip:
    img = _flip(img)
  h, w, _ = img.shape

  def attr(name, typ, data):
    return name.encode() + b"\x00" + typ.encode() + b"\x00" + struct.pack("<i", len(data)) + data

  channels = b""
  for ch in (b"B", b"G", b"R"):
    channels += ch + b"\x00" + struct.pack("<i", 2) + b"\x00\x00\x00" + struct.pack("<ii", 1, 1)
  channels += b"\x00"

  header = b""
  header += attr("channels", "chlist", channels)
  header += attr("compression", "compression", b"\x00")  # none
  header += attr("dataWindow", "box2i", struct.pack("<iiii", 0, 0, w - 1, h - 1))
  header += attr("displayWindow", "box2i", struct.pack("<iiii", 0, 0, w - 1, h - 1))
  header += attr("lineOrder", "lineOrder", b"\x00")
  header += attr("pixelAspectRatio", "float", struct.pack("<f", 1.0))
  header += attr("screenWindowCenter", "v2f", struct.pack("<ff", 0.0, 0.0))
  header += attr("screenWindowWidth", "float", struct.pack("<f", 1.0))
  header += b"\x00"

  magic = struct.pack("<i", 20000630) + struct.pack("<i", 2)
  offset_table_pos = len(magic) + len(header)
  table_size = h * 8
  data_start = offset_table_pos + table_size
  line_size = 8 + w * 4 * 3

  offsets = b"".join(struct.pack("<Q", data_start + y * line_size) for y in range(h))

  body = bytearray()
  for y in range(h):
    body += struct.pack("<ii", y, w * 4 * 3)
    row = img[y]
    body += row[:, 2].astype("<f4").tobytes()  # B
    body += row[:, 1].astype("<f4").tobytes()  # G
    body += row[:, 0].astype("<f4").tobytes()  # R

  with open(path, "wb") as f:
    f.write(magic + header + offsets + bytes(body))


def load_exr(path: str) -> np.ndarray:
  """Read EXRs written by save_exr (uncompressed float RGB scanlines)."""
  with open(path, "rb") as f:
    data = f.read()
  assert struct.unpack("<i", data[:4])[0] == 20000630, "not an EXR"
  pos = 8
  attrs = {}
  while data[pos] != 0:
    e = data.index(b"\x00", pos)
    name = data[pos:e].decode()
    pos = e + 1
    e = data.index(b"\x00", pos)
    typ = data[pos:e].decode()
    pos = e + 1
    size = struct.unpack("<i", data[pos:pos + 4])[0]
    pos += 4
    attrs[name] = (typ, data[pos:pos + size])
    pos += size
  pos += 1
  x0, y0, x1, y1 = struct.unpack("<iiii", attrs["dataWindow"][1])
  w, h = x1 - x0 + 1, y1 - y0 + 1
  pos += h * 8  # offset table
  out = np.zeros((h, w, 3), np.float32)
  for y in range(h):
    yy, size = struct.unpack("<ii", data[pos:pos + 8])
    pos += 8
    n = w * 4
    b = np.frombuffer(data[pos:pos + n], "<f4"); pos += n
    g = np.frombuffer(data[pos:pos + n], "<f4"); pos += n
    r = np.frombuffer(data[pos:pos + n], "<f4"); pos += n
    out[yy] = np.stack([r, g, b], -1)
  return out


# ---------------------------------------------------------------------------
# PNG (8-bit sRGB)
# ---------------------------------------------------------------------------


def save_png(path: str, image: np.ndarray, flip: bool = True, tonemap: bool = True):
  """Write (H,W,3) linear float as 8-bit sRGB PNG."""
  img = np.asarray(image, np.float32)
  if flip:
    img = _flip(img)
  if tonemap:
    img = np.where(img <= 0.0031308, 12.92 * img,
                   1.055 * np.power(np.maximum(img, 0.0031308), 1 / 2.4) - 0.055)
  u8 = (np.clip(img, 0.0, 1.0) * 255.0 + 0.5).astype(np.uint8)
  h, w, _ = u8.shape

  raw = b"".join(b"\x00" + u8[y].tobytes() for y in range(h))

  def chunk(tag, payload):
    c = tag + payload
    return struct.pack(">I", len(payload)) + c + struct.pack(">I", zlib.crc32(c))

  ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
  png = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
         + chunk(b"IDAT", zlib.compress(raw, 6)) + chunk(b"IEND", b""))
  with open(path, "wb") as f:
    f.write(png)


def rmse(a: np.ndarray, b: np.ndarray) -> float:
  """Reference-image comparison metric (the de-facto regression test in the
  reference viewer's diff modes, raytracer/options.hxx:9-18)."""
  a = np.asarray(a, np.float64)
  b = np.asarray(b, np.float64)
  return float(np.sqrt(np.mean((a - b) ** 2)))
