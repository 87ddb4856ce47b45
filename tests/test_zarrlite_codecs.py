"""Blosc chunk decoding + zip stores (zarrlite/codecs.py).

No blosc/zarr C libraries exist in this environment, so the tests build
c-blosc 1.x frames by hand (header + block offsets + length-prefixed
streams, per the format notes in codecs.py) around real inner codecs:
zlib/zstd payloads from the respective libraries, lz4 payloads from a
small test-local greedy encoder whose output exercises literals, matches
and overlapping copies."""

import json
import struct
import zipfile
import zlib

import numpy as np
import pytest

from xcube_resampling_tpu import zarrlite
from xcube_resampling_tpu.zarrlite.codecs import (
    blosc_decompress,
    lz4_block_decompress,
)

_BLOSCLZ, _LZ4, _SNAPPY, _ZLIB, _ZSTD = 0, 1, 2, 3, 4


def lz4_block_compress(data: bytes) -> bytes:
    """Minimal greedy LZ4 block encoder (test-local): 4-byte hash chains,
    min match 4, honors the spec's end-of-block rules (last 5 bytes are
    literals, last match starts >= 12 bytes from the end)."""
    n = len(data)
    out = bytearray()
    table: dict[bytes, int] = {}
    anchor = 0
    i = 0
    limit = n - 12

    def emit(lit: bytes, mlen: int, offset: int):
        lit_len = len(lit)
        token = min(lit_len, 15) << 4
        if mlen:
            token |= min(mlen - 4, 15)
        out.append(token)
        if lit_len >= 15:
            rest = lit_len - 15
            while rest >= 255:
                out.append(255)
                rest -= 255
            out.append(rest)
        out.extend(lit)
        if mlen:
            out.extend(struct.pack("<H", offset))
            if mlen - 4 >= 15:
                rest = mlen - 4 - 15
                while rest >= 255:
                    out.append(255)
                    rest -= 255
                out.append(rest)

    while i <= limit:
        key = data[i : i + 4]
        j = table.get(key)
        table[key] = i
        if j is not None and i - j <= 0xFFFF and data[j : j + 4] == key:
            mlen = 4
            while i + mlen < n - 5 and data[j + mlen] == data[i + mlen]:
                mlen += 1
            emit(data[anchor:i], mlen, i - j)
            i += mlen
            anchor = i
        else:
            i += 1
    emit(data[anchor:], 0, 0)
    return bytes(out)


@pytest.mark.parametrize("seed", [0, 1])
def test_lz4_roundtrip(seed):
    rng = np.random.default_rng(seed)
    # mix of repetitive (matches, overlapping copies) and random data
    data = (
        b"abcdabcdabcdabcdXYZ" * 50
        + rng.integers(0, 255, 500, dtype=np.uint8).tobytes()
        + b"\x00" * 300
        + b"tail-literals"
    )
    comp = lz4_block_compress(data)
    assert len(comp) < len(data)
    assert bytes(lz4_block_decompress(comp, len(data))) == data


def _shuffle(data: bytes, typesize: int) -> bytes:
    arr = np.frombuffer(data, dtype=np.uint8)
    n = arr.size // typesize
    tail = arr[n * typesize :]
    body = arr[: n * typesize].reshape(n, typesize).T.reshape(-1)
    return body.tobytes() + tail.tobytes()


def make_blosc_frame(
    data: bytes,
    codec: int,
    typesize: int = 4,
    blocksize: int | None = None,
    shuffle: bool = False,
    split: bool = False,
    memcpy: bool = False,
) -> bytes:
    """Assemble a c-blosc 1.x frame around *data*."""
    nbytes = len(data)
    if memcpy:
        header = struct.pack(
            "<BBBBIII", 2, 1, 0x2, typesize, nbytes, nbytes, nbytes + 16
        )
        return header + data
    blocksize = blocksize or nbytes
    flags = codec << 5
    if shuffle:
        flags |= 0x1
    nblocks = -(-nbytes // blocksize)
    blocks = []
    for bi in range(nblocks):
        raw_block = data[bi * blocksize : (bi + 1) * blocksize]
        if shuffle:
            raw_block = _shuffle(raw_block, typesize)
        nstreams = typesize if split and len(raw_block) == blocksize else 1
        per = len(raw_block) // nstreams
        enc = b""
        for si in range(nstreams):
            s0 = si * per
            s1 = s0 + per if si < nstreams - 1 else len(raw_block)
            stream = raw_block[s0:s1]
            if codec == _ZLIB:
                payload = zlib.compress(stream, 5)
            elif codec == _ZSTD:
                import zstandard

                payload = zstandard.ZstdCompressor(level=3).compress(stream)
            elif codec == _LZ4:
                payload = lz4_block_compress(stream)
            else:
                raise AssertionError
            if len(payload) >= len(stream):
                payload = stream  # stored
            enc += struct.pack("<i", len(payload)) + payload
        blocks.append(enc)
    off = 16 + 4 * nblocks
    bstarts = []
    for b in blocks:
        bstarts.append(off)
        off += len(b)
    frame_body = b"".join(blocks)
    cbytes = 16 + 4 * nblocks + len(frame_body)
    header = struct.pack(
        "<BBBBIII", 2, 1, flags, typesize, nbytes, blocksize, cbytes
    )
    return header + struct.pack(f"<{nblocks}i", *bstarts) + frame_body


def _payload(n=4096, dtype=np.float32, seed=0):
    rng = np.random.default_rng(seed)
    return (rng.random(n).astype(dtype) * 100).tobytes()


def test_blosc_memcpy():
    data = _payload(100)
    assert blosc_decompress(make_blosc_frame(data, 0, memcpy=True)) == data


@pytest.mark.parametrize("codec", [_ZLIB, _ZSTD, _LZ4])
@pytest.mark.parametrize("shuffle", [False, True])
def test_blosc_single_block(codec, shuffle):
    data = _payload()
    frame = make_blosc_frame(data, codec, typesize=4, shuffle=shuffle)
    assert blosc_decompress(frame) == data


@pytest.mark.parametrize("codec", [_ZLIB, _LZ4])
def test_blosc_multi_block_with_leftover(codec):
    data = _payload(n=5000)  # 20000 bytes, blocksize 8192 -> leftover 3616
    frame = make_blosc_frame(
        data, codec, typesize=4, blocksize=8192, shuffle=True
    )
    assert blosc_decompress(frame) == data


@pytest.mark.parametrize("codec", [_ZLIB, _LZ4])
def test_blosc_split_streams(codec):
    data = _payload()
    frame = make_blosc_frame(
        data, codec, typesize=4, shuffle=True, split=True
    )
    assert blosc_decompress(frame) == data


def test_blosc_blosclz_raises():
    # compressible data so the stream is NOT stored uncompressed (stored
    # streams decode without ever dispatching to the inner codec)
    data = b"\x01\x02\x03\x04" * 256
    frame = make_blosc_frame(data, _ZLIB, typesize=4)
    # rewrite codec id to blosclz
    bad = bytearray(frame)
    bad[2] = (bad[2] & 0x1F) | (_BLOSCLZ << 5)
    with pytest.raises(ValueError, match="blosclz"):
        blosc_decompress(bytes(bad))


def _write_blosc_store(store, codec=_LZ4):
    """A zarr v2 store with blosc-compressed chunks, as zarr-python's
    default Blosc(cname='lz4', shuffle=SHUFFLE) writer lays it out."""
    arr = np.arange(200, dtype="<f4").reshape(10, 20) / 3.0
    store[".zgroup"] = json.dumps({"zarr_format": 2}).encode()
    store[".zattrs"] = json.dumps({"title": "blosc test"}).encode()
    store["v/.zarray"] = json.dumps(
        {
            "zarr_format": 2,
            "shape": [10, 20],
            "chunks": [5, 20],
            "dtype": "<f4",
            "compressor": {
                "id": "blosc", "cname": "lz4", "clevel": 5, "shuffle": 1,
            },
            "fill_value": "NaN",
            "filters": None,
            "order": "C",
        }
    ).encode()
    store["v/.zattrs"] = json.dumps(
        {"_ARRAY_DIMENSIONS": ["y", "x"]}
    ).encode()
    for ci, chunk in enumerate((arr[:5], arr[5:])):
        store[f"v/{ci}.0"] = make_blosc_frame(
            chunk.tobytes(), codec, typesize=4, shuffle=True, split=True
        )
    return arr


def test_open_dataset_with_blosc_chunks():
    store = zarrlite.MemoryStore()
    arr = _write_blosc_store(store)
    ds = zarrlite.open_dataset(store)
    np.testing.assert_array_equal(np.asarray(ds.v.values), arr)


def test_zip_store_with_wrapping_dir(tmp_path):
    store = zarrlite.MemoryStore()
    arr = _write_blosc_store(store)
    zpath = tmp_path / "olci.zarr.zip"
    with zipfile.ZipFile(zpath, "w") as zf:
        for key, value in store.items():
            zf.writestr(f"olci.zarr/{key}", value)  # wrapped layout
    ds = zarrlite.open_dataset(str(zpath))
    np.testing.assert_array_equal(np.asarray(ds.v.values), arr)


def test_zip_store_flat_layout_and_readonly(tmp_path):
    store = zarrlite.MemoryStore()
    arr = _write_blosc_store(store)
    zpath = tmp_path / "flat.zarr.zip"
    with zipfile.ZipFile(zpath, "w") as zf:
        for key, value in store.items():
            zf.writestr(key, value)
    zs = zarrlite.ZipStore(zpath)
    g = zarrlite.open(zs)
    np.testing.assert_array_equal(g["v"].read(), arr)
    with pytest.raises(OSError):
        zs["x"] = b"y"


def test_lazy_open_from_zip(tmp_path):
    store = zarrlite.MemoryStore()
    arr = _write_blosc_store(store)
    zpath = tmp_path / "lazy.zarr.zip"
    with zipfile.ZipFile(zpath, "w") as zf:
        for key, value in store.items():
            zf.writestr(key, value)
    ds = zarrlite.open_dataset(str(zpath), lazy=True)
    window = np.asarray(ds.v[6:9, 3:7].values)
    np.testing.assert_array_equal(window, arr[6:9, 3:7])
