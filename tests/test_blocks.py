"""Block-level wire tests: hand-built bitstreams, canonical rejection,
planner byte-pins (mirrors reference tests/test_partitioning.cpp,
test_zerorun.cpp, test_predictors.cpp, test_e2e.cpp planner suites)."""

import numpy as np
import pytest

from lac_tpu.bitio import BitReader, BitWriter
from lac_tpu.decoder import FrameDecoder, DecodeError, decode_channel_block
from lac_tpu.encoder import FrameEncoder, ChannelBlockEncoder
from lac_tpu.format import constants as C

from .signals import lcg_noise


def write_rice(w, value, k):
    u = ((value << 1) ^ (0xFFFFFFFF if value < 0 else 0)) & 0xFFFFFFFF
    q = u >> k
    w.write_unary_ones(q)
    w.write_bit(0)
    if k:
        w.write_bits(u & ((1 << k) - 1), k)


def build_block(samples, partition_order=0, mode=0, k=4, predictor=0, order=0):
    """Hand-build a canonical fixed-predictor channel block."""
    w = BitWriter()
    w.write_bits(predictor, 8)
    w.write_bits(order, 8)
    control = (mode & 3) << 5
    if partition_order:
        control |= C.PARTITION_FLAG | partition_order
    w.write_bits(control, 8)
    nparts = 1 << partition_order if partition_order else 1
    for _ in range(nparts):
        w.write_bits(mode, 2)
        w.write_bits(k, 5)
    n = len(samples)
    base = n >> partition_order if partition_order else n
    # adaptive rice emission mirroring the adaptation rules
    from .oracle import StatefulAdapt, adapt_stateless, zigzag

    offset = 0
    sizes = [base] * (nparts - 1) + [n - base * (nparts - 1)] if partition_order else [n]
    stateless = partition_order > 0
    for psz in sizes:
        cur_k = k
        total = 0
        st = StatefulAdapt()
        for i in range(psz):
            v = samples[offset + i]
            if mode == 3:
                write_rice(w, v, k)
                continue
            write_rice(w, v, cur_k)
            total += zigzag(v)
            cur_k = adapt_stateless(total, i + 1) if stateless else st.adapt(total, i + 1)
        offset += psz
    w.flush_to_byte()
    return w.getvalue()


class TestHandBuiltBlocks:
    @pytest.mark.parametrize("p", range(0, 9))
    def test_partition_orders_decode(self, p):
        n = 16384 if p > 5 else max(C.MIN_PARTITION_SIZE << p, 256)
        samples = [int(x) for x in lcg_noise(n, 100, p + 1)]
        data = build_block(samples, partition_order=p, mode=0, k=4)
        out = decode_channel_block(BitReader(data), n)
        assert out is not None
        np.testing.assert_array_equal(out, samples)

    def test_static_rice_block(self):
        samples = [int(x) for x in lcg_noise(500, 2000, 3)]
        data = build_block(samples, mode=3, k=11)
        out = decode_channel_block(BitReader(data), 500)
        np.testing.assert_array_equal(out, samples)

    def test_order1_fixed_restore(self):
        # residuals for fixed order-1 over a ramp
        w = BitWriter()
        w.write_bits(0, 8)  # fixed
        w.write_bits(1, 8)  # order 1
        w.write_bits(0, 8)  # control: mode 0, no partitions
        w.write_bits(0, 2)
        w.write_bits(2, 5)  # k=2
        from .oracle import StatefulAdapt, zigzag

        vals = [10] + [3] * 99  # warmup 10, then +3 steps
        st, total, k = StatefulAdapt(), 0, 2
        for i, v in enumerate(vals):
            write_rice(w, v, k)
            total += zigzag(v)
            k = st.adapt(total, i + 1)
        w.flush_to_byte()
        out = decode_channel_block(BitReader(w.getvalue()), 100)
        np.testing.assert_array_equal(out, 10 + 3 * np.arange(100))


class TestCanonicalRejection:
    def _base(self, **kw):
        samples = [0] * 64
        return bytearray(build_block(samples, **kw))

    def test_reserved_control_bit(self):
        data = self._base()
        data[2] |= C.RESIDUAL_RESERVED_MASK
        assert decode_channel_block(BitReader(bytes(data)), 64) is None

    def test_partition_flag_order_mismatch(self):
        data = self._base()
        data[2] |= C.PARTITION_FLAG  # flag set but order 0
        assert decode_channel_block(BitReader(bytes(data)), 64) is None
        data = self._base()
        data[2] |= 1  # order 1 but flag clear
        assert decode_channel_block(BitReader(bytes(data)), 64) is None

    def test_metadata_control_mode_mismatch(self):
        data = self._base(mode=0)
        # flip first metadata mode bits (first 2 bits after control byte)
        data[3] ^= 0b01000000
        assert decode_channel_block(BitReader(bytes(data)), 64) is None

    def test_bad_predictor_type(self):
        data = self._base()
        data[0] = 3
        assert decode_channel_block(BitReader(bytes(data)), 64) is None

    def test_bad_fir_order(self):
        data = self._base()
        data[0] = C.PREDICTOR_FIR
        data[1] = 3  # FIR order must be exactly 2
        assert decode_channel_block(BitReader(bytes(data)), 64) is None

    def test_bad_fixed_order(self):
        data = self._base()
        data[1] = 5
        assert decode_channel_block(BitReader(bytes(data)), 64) is None

    def test_lpc_order_vs_block_size(self):
        w = BitWriter()
        w.write_bits(C.PREDICTOR_LPC, 8)
        w.write_bits(64, 8)  # order >= block_size (64) -> reject
        w.flush_to_byte()
        assert decode_channel_block(BitReader(w.getvalue()), 64) is None

    def test_nonzero_padding(self):
        data = self._base()
        # the final byte carries zero padding for 64 zero samples at k=4;
        # set the last bit
        data[-1] |= 1
        assert decode_channel_block(BitReader(bytes(data)), 64) is None

    def test_partition_too_small(self):
        samples = [0] * 64
        data = bytearray(build_block(samples, partition_order=2, mode=0))
        # block 64 >> 2 = 16 < MIN_PARTITION_SIZE -> reject
        assert decode_channel_block(BitReader(bytes(data)), 64) is None

    def test_zero_run_overflow(self):
        w = BitWriter()
        w.write_bits(0, 8)
        w.write_bits(0, 8)
        w.write_bits(C.MODE_ZERO_RUN << 5, 8)
        w.write_bits(C.MODE_ZERO_RUN, 2)
        w.write_bits(0, 5)
        w.write_bits(C.ZR_TAG_RUN, 2)
        # encoded run length 60+4=64 > 32 samples -> overflow
        u = 60
        w.write_unary_ones(u >> 2)
        w.write_bit(0)
        w.write_bits(u & 3, 2)
        w.flush_to_byte()
        assert decode_channel_block(BitReader(w.getvalue()), 32) is None

    def test_zero_run_reserved_tag(self):
        w = BitWriter()
        w.write_bits(0, 8)
        w.write_bits(0, 8)
        w.write_bits(C.MODE_ZERO_RUN << 5, 8)
        w.write_bits(C.MODE_ZERO_RUN, 2)
        w.write_bits(0, 5)
        w.write_bits(0b11, 2)  # reserved tag
        w.flush_to_byte()
        assert decode_channel_block(BitReader(w.getvalue()), 8) is None

    def test_fixed_restore_overflow(self):
        # order-1 warmup INT32_MAX then residual 1 -> overflow
        w = BitWriter()
        w.write_bits(0, 8)
        w.write_bits(1, 8)
        w.write_bits(C.MODE_STATIC << 5, 8)
        w.write_bits(C.MODE_STATIC, 2)
        w.write_bits(31, 5)
        write_rice(w, C.INT32_MAX, 31)
        write_rice(w, 1, 31)
        w.flush_to_byte()
        assert decode_channel_block(BitReader(w.getvalue()), 2) is None


class TestEncoderBehaviors:
    def _encode_one(self, samples, **kw):
        enc = ChannelBlockEncoder(**kw)
        return enc.encode_group(np.asarray(samples, np.int32)[None, :])[0]

    def test_predictor_selection_ramp_is_fixed(self):
        ramp = np.arange(2000, dtype=np.int32) * 3 + 7
        data = self._encode_one(ramp)
        assert data[0] == C.PREDICTOR_FIXED

    def test_predictor_selection_fir_signal(self):
        # sequence generated by the FIR predictor with small residuals
        rng = np.random.RandomState(5)
        x = np.zeros(2000, dtype=np.int64)
        x[0], x[1] = 100, 120
        for i in range(2, 2000):
            x[i] = ((3 * x[i - 1] - x[i - 2]) >> 2) + rng.randint(-2, 3)
        data = self._encode_one(x.astype(np.int32))
        assert data[0] == C.PREDICTOR_FIR

    def test_predictor_selection_noise_uses_lpc_or_fixed0(self):
        noise = lcg_noise(2000, 12000, 3)
        data = self._encode_one(noise)
        assert data[0] in (C.PREDICTOR_FIXED, C.PREDICTOR_LPC)

    def test_zero_run_beats_plain_on_silence(self):
        sig = np.zeros(4000, np.int32)
        sig[::500] = 100
        with_zr = self._encode_one(sig, zero_run_enabled=True)
        without = self._encode_one(sig, zero_run_enabled=False)
        assert len(with_zr) < len(without)

    def test_partitioned_not_larger(self):
        # composite: quiet half + loud half benefits from partitioning
        sig = np.concatenate([lcg_noise(8192, 10, 1), lcg_noise(8192, 20000, 2)])
        part = self._encode_one(sig, partitioning_enabled=True)
        nopart = self._encode_one(sig, partitioning_enabled=False)
        assert len(part) <= len(nopart)


class TestFramePlanner:
    def test_block_planning_sizes(self):
        from lac_tpu.decoder import FrameDecoder

        for n, want in [(16383, [16383]), (16384, [16384]), (16385, [16384, 1]), (40000, [16384, 16384, 7232])]:
            sig = lcg_noise(n, 1000, n)
            bs = FrameEncoder(12, 0, 44100, 16).encode(sig)
            # parse the block table
            bc = int.from_bytes(bs[10:14], "big")
            sizes = [int.from_bytes(bs[14 + 8 * i : 18 + 8 * i], "big") for i in range(bc)]
            assert sizes == want

    def test_frame_is_header_table_plus_blocks(self):
        sig = lcg_noise(1000, 1000, 1)
        bs = FrameEncoder(12, 0, 44100, 16).encode(sig)
        bc = int.from_bytes(bs[10:14], "big")
        assert bc == 1
        csize = int.from_bytes(bs[18:22], "big")
        assert len(bs) == 22 + csize

    def test_identical_channels_all_ms(self):
        sig = lcg_noise(40000, 20000, 2)
        bs = FrameEncoder(12, 2, 44100, 16).encode(sig, sig.copy())
        bc = int.from_bytes(bs[10:14], "big")
        table_end = 14 + 8 * bc
        off = table_end
        for i in range(bc):
            csize = int.from_bytes(bs[table_end - 8 * (bc - i) + 4 : table_end - 8 * (bc - i) + 8], "big")
            assert bs[off] == 1  # MS flag
            off += csize

    def test_silent_right_all_lr(self):
        sig = lcg_noise(40000, 20000, 3)
        silent = np.zeros(40000, np.int32)
        bs = FrameEncoder(12, 2, 44100, 16).encode(sig, silent)
        bc = int.from_bytes(bs[10:14], "big")
        sizes = [int.from_bytes(bs[14 + 8 * i + 4 : 14 + 8 * i + 8], "big") for i in range(bc)]
        off = 14 + 8 * bc
        for cs in sizes:
            assert bs[off] == 0  # LR flag
            off += cs

    def test_auto_equals_forced_plus_flags(self):
        # anticorrelated channels: auto chooses MS for every block and the
        # auto stream is the forced-MS stream plus one flag byte per block
        t = np.arange(40000)
        sig = (np.sin(t * 0.03) * 15000).astype(np.int32)
        bs_auto = FrameEncoder(12, 2, 44100, 16).encode(sig, -sig)
        bs_ms = FrameEncoder(12, 1, 44100, 16).encode(sig, -sig)
        bc = int.from_bytes(bs_auto[10:14], "big")
        assert len(bs_auto) == len(bs_ms) + bc
        # per-block payloads match modulo the flag byte
        sizes_a = [int.from_bytes(bs_auto[14 + 8 * i + 4 : 14 + 8 * i + 8], "big") for i in range(bc)]
        sizes_m = [int.from_bytes(bs_ms[14 + 8 * i + 4 : 14 + 8 * i + 8], "big") for i in range(bc)]
        assert [a - 1 for a in sizes_a] == sizes_m
        off_a = 14 + 8 * bc
        off_m = 14 + 8 * bc
        for sa, sm in zip(sizes_a, sizes_m):
            assert bs_auto[off_a] == 1
            assert bs_auto[off_a + 1 : off_a + sa] == bs_ms[off_m : off_m + sm]
            off_a += sa
            off_m += sm


class TestFrameRejection:
    def _valid(self):
        sig = lcg_noise(600, 3000, 7)
        return FrameEncoder(12, 0, 44100, 16).encode(sig), sig

    def _expect_reject(self, data):
        with pytest.raises(DecodeError):
            FrameDecoder().decode(bytes(data))

    def test_truncated_table(self):
        bs, _ = self._valid()
        self._expect_reject(bs[:16])

    def test_zero_block_count(self):
        bs = bytearray(self._valid()[0])
        bs[10:14] = (0).to_bytes(4, "big")
        self._expect_reject(bs)

    def test_oversize_block_count(self):
        bs = bytearray(self._valid()[0])
        bs[10:14] = (C.MAX_BLOCK_COUNT + 1).to_bytes(4, "big")
        self._expect_reject(bs)

    def test_trailing_bytes(self):
        bs, _ = self._valid()
        self._expect_reject(bs + b"\x00")

    def test_payload_sum_mismatch(self):
        bs = bytearray(self._valid()[0])
        csize = int.from_bytes(bs[18:22], "big")
        bs[18:22] = (csize + 1).to_bytes(4, "big")
        self._expect_reject(bs)

    def test_unknown_version(self):
        bs = bytearray(self._valid()[0])
        bs[2] = 4
        self._expect_reject(bs)

    def test_bad_stereo_flag(self):
        sig = lcg_noise(600, 3000, 8)
        bs = bytearray(FrameEncoder(12, 2, 44100, 16).encode(sig, sig.copy()))
        bc = int.from_bytes(bs[10:14], "big")
        off = 14 + 8 * bc
        bs[off] = 2  # invalid per-block stereo flag
        self._expect_reject(bs)

    def test_short_non_final_block_rejected(self):
        # hand-assemble a v3 frame whose first (non-final) block is <256
        sig = lcg_noise(600, 3000, 9)
        bs = FrameEncoder(12, 0, 44100, 16).encode(sig)
        payload = bs[22:]
        w = bytearray(bs[:10])
        w += (2).to_bytes(4, "big")
        w += (100).to_bytes(4, "big") + len(payload).to_bytes(4, "big")
        w += (500).to_bytes(4, "big") + len(payload).to_bytes(4, "big")
        w += payload + payload
        self._expect_reject(w)

    def test_v2_roundtrip_and_trailing_rejection(self):
        # hand-assemble a v2 frame from v3 parts: header v2 + count +
        # sizes + concatenated payloads
        sig = lcg_noise(600, 3000, 10)
        bs = FrameEncoder(12, 0, 44100, 16).encode(sig)
        payload = bs[22:]
        v2 = bytearray(bs[:10])
        v2[2] = 2
        v2 += (1).to_bytes(4, "big") + (600).to_bytes(4, "big") + payload
        left, right, hdr = FrameDecoder().decode(bytes(v2))
        np.testing.assert_array_equal(left, sig)
        assert hdr.version == 2
        self._expect_reject(bytes(v2) + b"\x00")

    def test_v2_multiblock_stereo_native_matches_python(self):
        # multi-block stereo with per-block flags exercises the native
        # serial v2 path's sample offsets (lac_decode_v2_stream)
        n = 16384 * 2 + 600
        l = lcg_noise(n, 3000, 11)
        r = np.roll(l, 3)
        bs = FrameEncoder(12, 2, 44100, 16).encode(l, r)
        bc = int.from_bytes(bs[10:14], "big")
        assert bc == 3
        sizes = [int.from_bytes(bs[14 + 8 * i : 18 + 8 * i], "big") for i in range(bc)]
        payload = bs[14 + 8 * bc :]
        v2 = bytearray(bs[:10])
        v2[2] = 2
        v2 += bc.to_bytes(4, "big")
        for sz in sizes:
            v2 += sz.to_bytes(4, "big")
        v2 += payload
        dl, dr, hdr = FrameDecoder().decode(bytes(v2))
        pl, pr, _ = FrameDecoder(backend="python").decode(bytes(v2))
        np.testing.assert_array_equal(dl, l)
        np.testing.assert_array_equal(dr, r)
        np.testing.assert_array_equal(pl, l)
        np.testing.assert_array_equal(pr, r)
        assert hdr.version == 2
