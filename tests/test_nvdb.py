"""NanoVDB (.nvdb) reader tests.

Builds minimal but layout-exact NanoVDB 32.x files with a synthetic writer
(same ABI the parser targets: GridData 672B, TreeData 64B, RootData 64B +
32B tiles, InternalData upper/lower, LeafData 2144B) and checks the dense
reconstruction against the voxels we wrote — sparse leaves, constant active
tiles, ZIP compression, and the reference's degenerate-grid clearing rules
(medium_pool.cxx:131-158).
"""

import struct
import zlib

import numpy as np
import pytest

from etx_tracer_tpu.scene import nvdb

_MAGIC = 0x304244566F6E614E
UP_T, LO_T, LF_T = 12, 7, 3  # node TOTAL log2 extents


def _mask_bytes(bits: np.ndarray) -> bytes:
  return np.packbits(bits.astype(np.uint8), bitorder="little").tobytes()


def _leaf(origin, values, active):
  """LeafData: bboxmin 12 + dif/flags 4 + mask 64 + stats 16 + 512 floats."""
  buf = struct.pack("<3i", *origin)
  buf += b"\x00" * 4
  buf += _mask_bytes(active.reshape(-1))
  buf += struct.pack("<4f", 0, 0, 0, 0)
  assert len(buf) == 96
  buf += values.astype("<f4").tobytes()
  return buf


def _internal(log2dim, table_off, entries, origin):
  """InternalData: bbox 24 + flags 8 + vmask + cmask + stats + 8B table.

  entries: dict idx -> ("child", byte_offset) | ("tile", value, active)
  """
  n = 1 << (3 * log2dim)
  vmask = np.zeros(n, bool)
  cmask = np.zeros(n, bool)
  table = np.zeros((n, 8), np.uint8)
  for idx, e in entries.items():
    if e[0] == "child":
      cmask[idx] = True
      table[idx] = np.frombuffer(struct.pack("<q", e[1]), np.uint8)
    else:
      vmask[idx] = e[2]
      table[idx, 0:4] = np.frombuffer(struct.pack("<f", e[1]), np.uint8)
  buf = struct.pack("<6i", *origin, *(o + (1 << (log2dim + 2)) for o in origin))
  buf += struct.pack("<Q", 0)
  buf += _mask_bytes(vmask) + _mask_bytes(cmask)
  buf += struct.pack("<4f", 0, 0, 0, 0)
  buf += b"\x00" * (table_off - len(buf))
  buf += table.tobytes()
  return buf


def _coord_key(x, y, z):
  return ((x >> UP_T) << 42) | ((y >> UP_T) << 21) | (z >> UP_T)


def _table_idx(log2dim, child_total, x, y, z):
  d = log2dim
  lx = (x >> child_total) & ((1 << d) - 1)
  ly = (y >> child_total) & ((1 << d) - 1)
  lz = (z >> child_total) & ((1 << d) - 1)
  return (lx << (2 * d)) | (ly << d) | lz


def _write_nvdb(path, root_bbox, root_tiles, nodes, codec=0):
  """Assemble grid buffer: GridData|TreeData|Root|tiles|nodes (by offset)."""
  root_size = 64 + 32 * len(root_tiles)
  tree_off = 672
  root_rel = 64  # root immediately after TreeData
  node_blob = b"".join(nodes)
  grid_size = tree_off + 64 + root_size + len(node_blob)

  grid = struct.pack("<QQIIIIQ", _MAGIC, 0, (32 << 21) | (4 << 10) | 2, 0, 0, 1,
                     grid_size)
  grid += b"\x00" * 256                      # name
  grid += b"\x00" * 264                      # map
  grid += struct.pack("<6d", 0, 0, 0, 1, 1, 1)  # world bbox
  grid += struct.pack("<3d", 1, 1, 1)        # voxel size
  grid += struct.pack("<II", 1, 1)           # class=FogVolume, type=Float
  grid += struct.pack("<qIIQQ", 0, 0, 0, 0, 0)
  assert len(grid) == 672

  tree = struct.pack("<4Q", 0, 0, 0, root_rel)
  tree += struct.pack("<3I", 1, 1, 1) + struct.pack("<3I", 0, 0, 0)
  tree += struct.pack("<Q", 1)
  assert len(tree) == 64

  root = struct.pack("<6i", *root_bbox)
  root += struct.pack("<I", len(root_tiles))
  root += struct.pack("<5f", 0, 0, 0, 0, 0)
  root += b"\x00" * (64 - len(root))
  for key, child, state, value in root_tiles:
    root += struct.pack("<QqIf", key, child, state, value) + b"\x00" * 8

  buf = grid + tree + root + node_blob
  assert len(buf) == grid_size

  meta = struct.pack("<4Q", grid_size, grid_size, 0, 1)
  meta += struct.pack("<II", 1, 1)
  meta += struct.pack("<6d", 0, 0, 0, 1, 1, 1)
  meta += struct.pack("<6i", *root_bbox)
  meta += struct.pack("<3d", 1, 1, 1)
  meta += struct.pack("<I", 0)
  meta += struct.pack("<4I", 1, 1, 1, 1) + struct.pack("<3I", 0, 0, 0)
  meta += struct.pack("<HHI", codec, 0, 0)
  assert len(meta) == 176

  with open(path, "wb") as f:
    f.write(struct.pack("<QIHH", _MAGIC, (32 << 21) | (4 << 10) | 2, 1, codec))
    f.write(meta)
    if codec == 1:
      z = zlib.compress(buf)
      f.write(struct.pack("<Q", len(z)))
      f.write(z)
    elif codec == 2:  # BLOSC: u64 frame size + blosc1 frame (IO.h:279-295)
      frame = _blosc_frame(buf)
      f.write(struct.pack("<Q", len(frame)))
      f.write(frame)
    else:
      f.write(buf)


# --- minimal blosc1 writer (NanoVDB settings: LZ4, byte shuffle, ts=4) ---


def _lz4_block(data: bytes) -> bytes:
  """Legal LZ4 block: RLE match when possible, else literal-only."""
  n = len(data)
  if n >= 16 and data == data[:1] * n:
    # 1 literal + overlapping match of n-6, then a 5-literal tail
    mlen = n - 6
    out = bytearray()
    ml = mlen - 4
    out.append((1 << 4) | (15 if ml >= 15 else ml))
    out += data[:1]
    out += struct.pack("<H", 1)
    if ml >= 15:
      rem = ml - 15
      while rem >= 255:
        out.append(255)
        rem -= 255
      out.append(rem)
    out.append(5 << 4)  # final literal-only sequence
    out += data[1 + mlen:]
    return bytes(out)
  out = bytearray()
  out.append((15 if n >= 15 else n) << 4)
  if n >= 15:
    rem = n - 15
    while rem >= 255:
      out.append(255)
      rem -= 255
    out.append(rem)
  out += data
  return bytes(out)


def _shuffle_bytes(data: bytes, typesize: int) -> bytes:
  n = len(data) - len(data) % typesize
  planes = np.frombuffer(data[:n], np.uint8).reshape(-1, typesize)
  return planes.T.tobytes() + data[n:]


def _blosc_frame(data: bytes, typesize=4, blocksize=1 << 18, codec=1,
                 shuffle=True, memcpy=False) -> bytes:
  n = len(data)
  flags = (codec << 5) | (0x2 if memcpy else 0)
  if shuffle and typesize > 1 and not memcpy:
    flags |= 0x1
  if memcpy:
    head = struct.pack("<BBBBiii", 2, 1, flags, typesize, n, blocksize, 16 + n)
    return head + data
  nblocks = (n + blocksize - 1) // blocksize
  leftover = n % blocksize
  chunks = []
  starts = []
  pos = 16 + 4 * nblocks
  for j in range(nblocks):
    leftoverblock = (j == nblocks - 1) and leftover > 0
    bsize = leftover if leftoverblock else blocksize
    block = data[j * blocksize:j * blocksize + bsize]
    if flags & 0x1:
      block = _shuffle_bytes(block, typesize)
    nsplits = typesize if (typesize <= 16 and blocksize // typesize >= 128
                           and not leftoverblock) else 1
    neblock = bsize // nsplits
    starts.append(pos)
    enc = b""
    for s in range(nsplits):
      part = block[s * neblock:(s + 1) * neblock]
      comp = zlib.compress(part) if codec == 3 else _lz4_block(part)
      if len(comp) >= neblock:  # incompressible part: stored raw
        comp = part
      enc += struct.pack("<i", len(comp)) + comp
    chunks.append(enc)
    pos += len(enc)
  head = struct.pack("<BBBBiii", 2, 1, flags, typesize, n, blocksize, pos)
  return head + b"".join(struct.pack("<i", s) for s in starts) + b"".join(chunks)


def _single_leaf_file(path, codec=0):
  """One leaf at origin 0 with a checkable sparse pattern."""
  rs = np.random.RandomState(7)
  values = rs.rand(512).astype(np.float32) + 0.25
  active = rs.rand(512) < 0.5
  leaf = _leaf((0, 0, 0), values, active)
  # layout: [upper][lower][leaf]; child offsets are relative to each node
  up_size = 8256 + 32768 * 8
  lo_size = 1088 + 4096 * 8
  upper = _internal(5, 8256, {_table_idx(5, LO_T, 0, 0, 0): ("child", up_size)}, (0, 0, 0))
  lower = _internal(4, 1088, {_table_idx(4, LF_T, 0, 0, 0): ("child", lo_size)}, (0, 0, 0))
  root_size = 64 + 32
  # child offsets in root tiles are relative to the root node
  tiles = [(_coord_key(0, 0, 0), root_size, 1, 0.0)]
  _write_nvdb(path, (0, 0, 0, 8, 8, 8), tiles, [upper, lower, leaf], codec)
  dense_ref = np.where(active, values, 0.0).reshape(8, 8, 8).transpose(2, 1, 0)
  return dense_ref


def test_single_leaf_roundtrip(tmp_path):
  p = str(tmp_path / "a.nvdb")
  ref = _single_leaf_file(p)
  got = nvdb.read_nvdb_density(p)
  assert got is not None and got.shape == (8, 8, 8)
  np.testing.assert_allclose(got, ref, rtol=1e-6)


def test_zip_codec(tmp_path):
  p = str(tmp_path / "z.nvdb")
  ref = _single_leaf_file(p, codec=1)
  got = nvdb.read_nvdb_density(p)
  np.testing.assert_allclose(got, ref, rtol=1e-6)


def test_constant_tile_and_leaf(tmp_path):
  """A lower node holding one leaf + one constant active 8^3 tile."""
  rs = np.random.RandomState(3)
  values = rs.rand(512).astype(np.float32) + 0.5
  active = np.ones(512, bool)
  leaf = _leaf((0, 0, 0), values, active)
  lo_size = 1088 + 4096 * 8
  up_size = 8256 + 32768 * 8
  lower = _internal(4, 1088, {
      _table_idx(4, LF_T, 0, 0, 0): ("child", lo_size),
      _table_idx(4, LF_T, 8, 0, 0): ("tile", 2.5, True),
      _table_idx(4, LF_T, 0, 8, 0): ("tile", 9.0, False),  # inactive: skipped
  }, (0, 0, 0))
  upper = _internal(5, 8256, {_table_idx(5, LO_T, 0, 0, 0): ("child", up_size)}, (0, 0, 0))
  tiles = [(_coord_key(0, 0, 0), 64 + 32, 1, 0.0)]
  p = str(tmp_path / "t.nvdb")
  _write_nvdb(p, (0, 0, 0, 16, 16, 16), tiles, [upper, lower, leaf])
  got = nvdb.read_nvdb_density(p)
  assert got.shape == (16, 16, 16)
  ref = np.zeros((16, 16, 16), np.float32)
  ref[0:8, 0:8, 0:8] = values.reshape(8, 8, 8).transpose(2, 1, 0)
  ref[0:8, 0:8, 8:16] = 2.5  # (z,y,x): tile at x=8
  np.testing.assert_allclose(got, ref, rtol=1e-6)


def test_degenerate_cleared(tmp_path):
  """Constant-everywhere grids are cleared like the reference."""
  leaf = _leaf((0, 0, 0), np.full(512, 0.75, np.float32), np.ones(512, bool))
  lo_size = 1088 + 4096 * 8
  up_size = 8256 + 32768 * 8
  lower = _internal(4, 1088, {_table_idx(4, LF_T, 0, 0, 0): ("child", lo_size)}, (0, 0, 0))
  upper = _internal(5, 8256, {_table_idx(5, LO_T, 0, 0, 0): ("child", up_size)}, (0, 0, 0))
  tiles = [(_coord_key(0, 0, 0), 64 + 32, 1, 0.0)]
  p = str(tmp_path / "d.nvdb")
  _write_nvdb(p, (0, 0, 0, 8, 8, 8), tiles, [upper, lower, leaf])
  assert nvdb.read_nvdb_density(p) is None


def test_blosc_codec(tmp_path):
  """BLOSC .nvdb segment (NanoVDB's LZ4 + shuffle + typesize-4 settings)."""
  p = str(tmp_path / "b.nvdb")
  ref = _single_leaf_file(p, codec=2)
  got = nvdb.read_nvdb_density(p)
  np.testing.assert_allclose(got, ref, rtol=1e-6)


def test_blosc_decoder_unit():
  """Direct native-decoder checks: memcpy, RLE-match LZ4, shuffle, splits."""
  from etx_tracer_tpu import native
  if native.load() is None:
    pytest.skip("no native toolchain")
  rs = np.random.RandomState(11)
  # incompressible random payload, shuffled + split (raw parts)
  data = rs.bytes(4096)
  out = native.blosc_decompress(_blosc_frame(data, blocksize=1024), len(data))
  assert out == data
  # constant payload: every shuffled split part is an RLE LZ4 block, which
  # exercises the match/extended-length/overlap-copy decode path
  const = b"\x07" * 4096
  out = native.blosc_decompress(_blosc_frame(const, blocksize=1024), len(const))
  assert out == const
  # multi-block with a leftover block (single split, shuffled)
  runs = b"".join(bytes([b]) * 997 for b in b"\x01\x02\x03\x00\xfe")
  out = native.blosc_decompress(_blosc_frame(runs, blocksize=2048), len(runs))
  assert out == runs
  # memcpy mode
  out = native.blosc_decompress(_blosc_frame(data, memcpy=True), len(data))
  assert out == data
  # no shuffle, single split
  out = native.blosc_decompress(
      _blosc_frame(data, typesize=1, shuffle=False), len(data))
  assert out == data
  # zlib inner codec (compcode 3)
  out = native.blosc_decompress(
      _blosc_frame(const, blocksize=1024, codec=3), len(const))
  assert out == const
  # unsupported inner codec reports clearly (const payload so parts are
  # actually compressed and the codec is consulted)
  bad = bytearray(_blosc_frame(const, blocksize=1024))
  bad[2] = (bad[2] & 0x1F) | (4 << 5)  # zstd
  with pytest.raises(ValueError):
    native.blosc_decompress(bytes(bad), len(const))


def test_loader_dispatch(tmp_path):
  from etx_tracer_tpu.scene.obj_loader import _load_density_grid
  p = str(tmp_path / "m.nvdb")
  ref = _single_leaf_file(p)
  got = _load_density_grid(p)
  np.testing.assert_allclose(got, ref, rtol=1e-6)
