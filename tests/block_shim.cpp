// Test-only oracle shim: drives the *reference* Block::Encoder /
// Block::Decoder directly on raw int32 blocks, so differentials can
// cover inputs the reference CLI's PCM-range validation would reject
// (e.g. the LPC residual-overflow fallback ladder, lpc.cpp:188-229).
//
// Built on demand by tests/test_ladder.py against .refbuild/liblac.a.
//
// usage: block_shim encode <zero_run 0|1> <partitioning 0|1> < raw-int32-LE
//        block_shim decode <block_size> < block-bytes
// encode prints the encoded block bytes on stdout;
// decode prints the restored int32 LE samples on stdout (exit 1 on reject).

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <string>
#include <vector>

#include "codec/block/encoder.hpp"
#include "codec/block/decoder.hpp"
#include "codec/bitstream/bit_reader.hpp"

static std::vector<uint8_t> read_all_stdin() {
    std::vector<uint8_t> data;
    uint8_t buf[65536];
    size_t got;
    while ((got = std::fread(buf, 1, sizeof buf, stdin)) > 0) {
        data.insert(data.end(), buf, buf + got);
    }
    return data;
}

int main(int argc, char** argv) {
    if (argc < 2) return 2;
    const std::string cmd = argv[1];
    const std::vector<uint8_t> raw = read_all_stdin();
    if (cmd == "encode") {
        if (argc != 4) return 2;
        std::vector<int32_t> pcm(raw.size() / 4);
        for (size_t i = 0; i < pcm.size(); ++i) {
            uint32_t v = static_cast<uint32_t>(raw[4 * i]) |
                         (static_cast<uint32_t>(raw[4 * i + 1]) << 8) |
                         (static_cast<uint32_t>(raw[4 * i + 2]) << 16) |
                         (static_cast<uint32_t>(raw[4 * i + 3]) << 24);
            pcm[i] = static_cast<int32_t>(v);
        }
        Block::Encoder enc(12);
        enc.set_zero_run_enabled(argv[2][0] == '1');
        enc.set_partitioning_enabled(argv[3][0] == '1');
        const std::vector<uint8_t> out = enc.encode(pcm);
        std::fwrite(out.data(), 1, out.size(), stdout);
        return 0;
    }
    if (cmd == "decode") {
        if (argc != 3) return 2;
        const uint32_t block_size = static_cast<uint32_t>(std::strtoull(argv[2], nullptr, 10));
        BitReader reader(raw.data(), raw.size());
        std::vector<int32_t> out(block_size);
        Block::Decoder dec;
        if (!dec.decode_into(reader, block_size, out.data())) return 1;
        for (int32_t s : out) {
            uint32_t v = static_cast<uint32_t>(s);
            uint8_t b[4] = {static_cast<uint8_t>(v), static_cast<uint8_t>(v >> 8),
                            static_cast<uint8_t>(v >> 16), static_cast<uint8_t>(v >> 24)};
            std::fwrite(b, 1, 4, stdout);
        }
        return 0;
    }
    return 2;
}
