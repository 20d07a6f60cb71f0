"""Zigzag, bit I/O, packer, header, WAV primitives."""

import numpy as np

from lac_tpu.bitio import BitReader, BitWriter
from lac_tpu.bitio.pack import pack_stream
from lac_tpu.format import FrameHeader, constants as C
from lac_tpu.format.zigzag import zigzag_decode, zigzag_encode
from lac_tpu.io import read_wav, write_wav
from . import oracle


def test_zigzag_scalar_and_array_roundtrip():
    vals = [0, -1, 1, -2, 2, 123456, -123456, C.INT32_MAX, C.INT32_MIN]
    for v in vals:
        u = zigzag_encode(v)
        assert u == oracle.zigzag(v)
        assert zigzag_decode(u) == v
    arr = np.array(vals, dtype=np.int32)
    u = zigzag_encode(arr)
    np.testing.assert_array_equal(zigzag_decode(u), arr)
    assert u.dtype == np.uint32


def test_bitwriter_reader_roundtrip():
    w = BitWriter()
    fields = [(0x4C41, 16), (3, 8), (1, 1), (0, 1), (0b101, 3), (0xDEADBEEF, 32), (7, 5)]
    for v, n in fields:
        w.write_bits(v, n)
    w.write_unary_ones(13)
    w.write_bit(0)
    w.flush_to_byte()
    r = BitReader(w.getvalue())
    for v, n in fields:
        assert r.read_bits(n) == v & ((1 << n) - 1)
    assert r.read_unary_ones(100) == 13
    assert not r.has_error()


def test_bitreader_unary_guard_and_padding():
    w = BitWriter()
    w.write_unary_ones(40)
    w.write_bit(0)
    w.flush_to_byte()
    r = BitReader(w.getvalue())
    assert r.read_unary_ones(39) is None and r.has_error()
    r2 = BitReader(w.getvalue())
    assert r2.read_unary_ones(40) == 40
    assert r2.consume_zero_padding_to_byte()
    # non-zero padding rejected
    r3 = BitReader(b"\x01")
    r3.read_bits(4)
    assert not r3.consume_zero_padding_to_byte()


def test_pack_stream_matches_bitwriter():
    rng = np.random.RandomState(7)
    n = 500
    unary = rng.randint(0, 40, n)
    field_len = rng.randint(0, 33, n)
    field_val = rng.randint(0, 2**31, n).astype(np.uint64)
    field_val &= (np.uint64(1) << field_len.astype(np.uint64)) - np.uint64(1)
    w = BitWriter()
    for i in range(n):
        w.write_unary_ones(int(unary[i]))
        w.write_bits(int(field_val[i]), int(field_len[i]))
    w.flush_to_byte()
    assert pack_stream(unary, field_val, field_len) == w.getvalue()


def test_frame_header_roundtrip_and_validate():
    hdr = FrameHeader(channels=2, stereo_mode=2, sample_rate=192000, bit_depth=24)
    data = hdr.pack()
    assert len(data) == 10
    assert data[:2] == b"LA"
    parsed = FrameHeader.parse(data)
    assert parsed is not None
    h2, nbytes = parsed
    assert nbytes == 10 and h2 == hdr
    # invalid cases
    assert FrameHeader.parse(b"XX" + data[2:]) is None
    bad_sr = FrameHeader(sample_rate=44101)
    assert not bad_sr.validate()
    assert not FrameHeader(channels=1, stereo_mode=1).validate()
    assert not FrameHeader(reserved=1).validate()


def test_wav_roundtrip(tmp_path):
    rng = np.random.RandomState(3)
    left = rng.randint(-32768, 32768, 1000).astype(np.int32)
    right = rng.randint(-32768, 32768, 1000).astype(np.int32)
    p = str(tmp_path / "t.wav")
    assert write_wav(p, left, right, 2, 44100, 16)
    got = read_wav(p)
    assert got is not None
    l2, r2, ch, sr, depth = got
    assert (ch, sr, depth) == (2, 44100, 16)
    np.testing.assert_array_equal(l2, left)
    np.testing.assert_array_equal(r2, right)


def test_wav_24bit_mono_odd_padding(tmp_path):
    left = np.array([-0x800000, 0x7FFFFF, 0, -1, 5], dtype=np.int32)
    p = str(tmp_path / "t24.wav")
    assert write_wav(p, left, np.empty(0, np.int32), 1, 48000, 24)
    raw = open(p, "rb").read()
    assert len(raw) % 2 == 0  # odd data payload padded
    got = read_wav(p)
    l2, r2, ch, sr, depth = got
    np.testing.assert_array_equal(l2, left)
    assert len(r2) == 0 and depth == 24


def test_wav_rejects_malformed(tmp_path):
    p = str(tmp_path / "bad.wav")
    left = np.zeros(10, dtype=np.int32)
    assert write_wav(p, left, np.empty(0, np.int32), 1, 44100, 16)
    raw = bytearray(open(p, "rb").read())
    # corrupt RIFF size
    bad = raw.copy()
    bad[4] ^= 1
    open(p, "wb").write(bad)
    assert read_wav(p) is None
    # out-of-range samples rejected on write
    assert not write_wav(str(tmp_path / "x.wav"), np.array([40000], np.int32), np.empty(0, np.int32), 1, 44100, 16)
