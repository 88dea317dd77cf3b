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


def encode_png(image: np.ndarray, flip: bool = True, tonemap: bool = True,
               exposure: float = 1.0) -> bytes:
  """Encode (H,W,3) linear float as 8-bit sRGB PNG bytes."""
  img = np.asarray(image, np.float32) * exposure
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
  return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
          + chunk(b"IDAT", zlib.compress(raw, 6)) + chunk(b"IEND", b""))


def save_png(path: str, image: np.ndarray, flip: bool = True, tonemap: bool = True):
  """Write (H,W,3) linear float as 8-bit sRGB PNG."""
  with open(path, "wb") as f:
    f.write(encode_png(image, flip=flip, tonemap=tonemap))


def rmse(a: np.ndarray, b: np.ndarray) -> float:
  """Reference-image comparison metric (the de-facto regression test in the
  reference viewer's diff modes, raytracer/options.hxx:9-18)."""
  a = np.asarray(a, np.float64)
  b = np.asarray(b, np.float64)
  return float(np.sqrt(np.mean((a - b) ** 2)))


# ---------------------------------------------------------------------------
# PNG decode (8/16-bit RGB(A)/gray, non-interlaced)
# ---------------------------------------------------------------------------


def load_png(path: str) -> np.ndarray:
  """Decode PNG -> (H,W,4) float32 linear-ish [0,1] (no sRGB conversion)."""
  with open(path, "rb") as f:
    data = f.read()
  return decode_png(data)


def decode_png(data: bytes) -> np.ndarray:
  """Decode PNG bytes -> (H,W,4) float32 [0,1] (no sRGB conversion).

  Split out from load_png so in-memory sources (glTF bufferView images,
  data: URIs) share the codec."""
  assert data[:8] == b"\x89PNG\r\n\x1a\n", "not a PNG"
  pos = 8
  idat = b""
  w = h = bit_depth = color_type = None
  palette = None
  while pos < len(data):
    (length,) = struct.unpack(">I", data[pos:pos + 4])
    tag = data[pos + 4:pos + 8]
    payload = data[pos + 8:pos + 8 + length]
    pos += 12 + length
    if tag == b"IHDR":
      w, h, bit_depth, color_type, _, _, interlace = struct.unpack(">IIBBBBB", payload)
      assert interlace == 0, "interlaced PNG unsupported"
    elif tag == b"PLTE":
      palette = np.frombuffer(payload, np.uint8).reshape(-1, 3)
    elif tag == b"IDAT":
      idat += payload
    elif tag == b"IEND":
      break
  raw = zlib.decompress(idat)

  channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[color_type]
  bpp_bits = channels * bit_depth
  stride_bits = w * bpp_bits
  stride = (stride_bits + 7) // 8
  fbpp = max(1, bpp_bits // 8)

  out = np.zeros((h, stride), np.uint8)
  prev = np.zeros(stride, np.int32)
  pos = 0
  for y in range(h):
    ftype = raw[pos]
    line = np.frombuffer(raw[pos + 1:pos + 1 + stride], np.uint8).astype(np.int32).copy()
    pos += 1 + stride
    if ftype == 0:
      cur = line
    elif ftype == 1:
      cur = line
      for x in range(fbpp, stride):
        cur[x] = (cur[x] + cur[x - fbpp]) & 0xFF
    elif ftype == 2:
      cur = (line + prev) & 0xFF
    elif ftype == 3:
      cur = line
      for x in range(stride):
        left = cur[x - fbpp] if x >= fbpp else 0
        cur[x] = (cur[x] + ((left + prev[x]) >> 1)) & 0xFF
    elif ftype == 4:
      cur = line
      for x in range(stride):
        a = cur[x - fbpp] if x >= fbpp else 0
        b = prev[x]
        c = prev[x - fbpp] if x >= fbpp else 0
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
        cur[x] = (cur[x] + pr) & 0xFF
    else:
      raise ValueError(f"bad PNG filter {ftype}")
    out[y] = cur.astype(np.uint8)
    prev = cur

  if bit_depth == 8:
    img = out[:, :w * channels].reshape(h, w, channels).astype(np.float32) / 255.0
  elif bit_depth == 16:
    b16 = out.view(">u2" if False else np.uint8)
    arr = (out[:, 0:2 * w * channels:2].astype(np.uint16) << 8) | out[:, 1:2 * w * channels:2]
    img = arr.reshape(h, w, channels).astype(np.float32) / 65535.0
  else:
    raise ValueError(f"bit depth {bit_depth} unsupported")

  if color_type == 3:  # palette
    assert palette is not None
    ids = (img[..., 0] * 255.0 + 0.5).astype(np.int32)
    img = palette[ids].astype(np.float32) / 255.0

  if img.shape[-1] == 1:
    img = np.repeat(img, 3, axis=-1)
  if img.shape[-1] == 2:  # gray+alpha
    a = img[..., 1:2]
    img = np.concatenate([np.repeat(img[..., :1], 3, -1), a], -1)
  if img.shape[-1] == 3:
    img = np.concatenate([img, np.ones_like(img[..., :1])], -1)
  return img.astype(np.float32)


# ---------------------------------------------------------------------------
# Radiance HDR (.hdr / .pic) decode — RGBE with optional scanline RLE
# ---------------------------------------------------------------------------


def load_hdr(path: str) -> np.ndarray:
  with open(path, "rb") as f:
    data = f.read()
  pos = data.index(b"\n\n") + 2 if b"\n\n" in data[:2000] else 0
  if pos == 0:
    # header lines end at an empty line
    lines_end = data.index(b"\n\n") + 2
    pos = lines_end
  # resolution line
  eol = data.index(b"\n", pos)
  res = data[pos:eol].decode().split()
  pos = eol + 1
  assert res[0] == "-Y" and res[2] == "+X", f"unsupported orientation {res}"
  h, w = int(res[1]), int(res[3])
  img = np.zeros((h, w, 4), np.uint8)
  for y in range(h):
    if data[pos] == 2 and data[pos + 1] == 2 and ((data[pos + 2] << 8) | data[pos + 3]) == w:
      pos += 4
      row = np.zeros((4, w), np.uint8)
      for ch in range(4):
        x = 0
        while x < w:
          count = data[pos]; pos += 1
          if count > 128:
            row[ch, x:x + count - 128] = data[pos]; pos += 1
            x += count - 128
          else:
            row[ch, x:x + count] = np.frombuffer(data[pos:pos + count], np.uint8)
            pos += count
            x += count
      img[y] = row.T
    else:  # flat RGBE
      row = np.frombuffer(data[pos:pos + 4 * w], np.uint8).reshape(w, 4)
      img[y] = row
      pos += 4 * w
  rgbe = img.astype(np.float32)
  e = np.ldexp(1.0, img[..., 3].astype(np.int32) - 136)  # 128 + 8 mantissa bits
  rgb = rgbe[..., :3] * e[..., None]
  rgb[img[..., 3] == 0] = 0.0
  return np.concatenate([rgb, np.ones_like(rgb[..., :1])], -1).astype(np.float32)


def srgb_image_to_linear(img: np.ndarray) -> np.ndarray:
  """(H,W,4) sRGB-encoded RGB + linear alpha -> all-linear float32."""
  rgb = img[..., :3]
  return np.concatenate([
      np.where(rgb <= 0.04045, rgb / 12.92, ((rgb + 0.055) / 1.055) ** 2.4),
      img[..., 3:4]], -1).astype(np.float32)


def load_image(path: str, srgb_to_linear: bool = True) -> np.ndarray:
  """Load PNG/HDR/EXR into (H,W,4) float32 linear, top-down rows."""
  low = path.lower()
  if low.endswith(".png"):
    img = load_png(path)
    if srgb_to_linear:
      img = srgb_image_to_linear(img)
    return img
  if low.endswith((".hdr", ".pic")):
    return load_hdr(path)
  if low.endswith(".exr"):
    rgb = load_exr(path)
    return np.concatenate([rgb, np.ones_like(rgb[..., :1])], -1)
  raise ValueError(f"unsupported image format: {path}")
