"""MSB-first bit writer (scalar, host-side).

Used for frame headers, block tables, and as the test oracle for the
vectorized packer. Semantics match the reference BitWriter
(bit_writer.cpp:15-111): values are emitted most-significant-bit first;
``flush_to_byte`` zero-pads the trailing partial byte.
"""


class BitWriter:
    __slots__ = ("_buf", "_acc", "_nbits")

    def __init__(self):
        self._buf = bytearray()
        self._acc = 0  # pending bits, MSB-aligned conceptually: low _nbits bits
        self._nbits = 0

    def write_bit(self, bit: int) -> None:
        self._acc = (self._acc << 1) | (1 if bit else 0)
        self._nbits += 1
        if self._nbits == 8:
            self._buf.append(self._acc)
            self._acc = 0
            self._nbits = 0

    def write_bits(self, value: int, nbits: int) -> None:
        """Write the low ``nbits`` bits of ``value``, MSB first.

        Widths above 32 zero-extend the value on the left, matching the
        reference's legacy >32-bit path (bit_writer.cpp:35-42).
        """
        if nbits <= 0:
            return
        if nbits > 32:
            value &= 0xFFFFFFFF
        else:
            value &= (1 << nbits) - 1
        self._acc = (self._acc << nbits) | value
        self._nbits += nbits
        while self._nbits >= 8:
            self._nbits -= 8
            self._buf.append((self._acc >> self._nbits) & 0xFF)
        self._acc &= (1 << self._nbits) - 1

    def write_unary_ones(self, ones: int) -> None:
        """Write ``ones`` one-bits (the Rice quotient prefix)."""
        while ones >= 32:
            self.write_bits(0xFFFFFFFF, 32)
            ones -= 32
        if ones:
            self.write_bits((1 << ones) - 1, ones)

    def write_bytes(self, data: bytes) -> None:
        if self._nbits == 0:
            self._buf.extend(data)
        else:
            for b in data:
                self.write_bits(b, 8)

    def flush_to_byte(self) -> None:
        if self._nbits:
            self._buf.append((self._acc << (8 - self._nbits)) & 0xFF)
            self._acc = 0
            self._nbits = 0

    @property
    def bit_length(self) -> int:
        return len(self._buf) * 8 + self._nbits

    def getvalue(self) -> bytes:
        if self._nbits:
            raise ValueError("unflushed bits pending")
        return bytes(self._buf)
