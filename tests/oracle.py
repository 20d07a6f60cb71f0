"""Scalar spec oracles, transcribed from the public format specification
(reference docs/format.md) — deliberately naive per-sample implementations
used only to validate the vectorized closed forms in lac_tpu.ops."""


def bit_width(m: int) -> int:
    return m.bit_length()


class StatefulAdapt:
    """format.md:274-342 (== rice.hpp:45-114)."""

    DRIFT = 256
    MICRO = 96

    def __init__(self):
        self.previous_sum = 0
        self.window_index = 0
        self.micro_index = 0
        self.window_filled = 0
        self.window_sum = 0
        self.large_q = 0
        self.zero_q = 0
        self.recent_u = [0] * self.DRIFT
        self.large_flags = [0] * self.MICRO
        self.zero_flags = [0] * self.MICRO

    def adapt(self, total: int, count: int) -> int:
        if count == 0:
            return 0
        current_u = (total - self.previous_sum) & 0xFFFFFFFFFFFFFFFF
        self.previous_sum = total

        mi = self.micro_index
        self.large_q -= self.large_flags[mi]
        self.zero_q -= self.zero_flags[mi]

        if self.window_filled < self.DRIFT:
            self.window_filled += 1
        else:
            self.window_sum -= self.recent_u[self.window_index]
        self.recent_u[self.window_index] = current_u & 0xFFFFFFFF
        self.window_sum += current_u

        mean = (total + (count >> 1)) // count
        k = 0 if mean <= 1 else min(31, bit_width(mean - 1))

        q_base = 0 if k >= 31 else (current_u >> k)
        is_large = 1 if q_base > 3 else 0
        is_zero = 1 if q_base == 0 else 0
        self.large_q += is_large
        self.zero_q += is_zero
        self.large_flags[mi] = is_large
        self.zero_flags[mi] = is_zero

        bias = 0
        if self.window_filled > 0 and mean > 0:
            if self.window_filled == self.DRIFT:
                local_mean = (self.window_sum + (self.DRIFT >> 1)) >> 8
            else:
                local_mean = (self.window_sum + (self.window_filled >> 1)) // self.window_filled
            if local_mean * 3 > mean * 4:
                bias = 1
            elif local_mean * 4 + 3 < mean * 3:
                bias = -1

        if self.window_index + 1 >= self.MICRO or self.window_filled >= self.MICRO:
            wsize = self.MICRO if self.window_filled >= self.MICRO else self.window_filled
            if self.large_q * 4 >= wsize * 3:
                bias = min(bias + 1, 1)
            elif self.zero_q * 5 >= wsize * 4:
                bias = max(bias - 1, -1)

        out = max(0, min(31, k + bias))
        self.micro_index = 0 if self.micro_index + 1 == self.MICRO else self.micro_index + 1
        self.window_index = (self.window_index + 1) & (self.DRIFT - 1)
        return out


def adapt_stateless(total: int, count: int) -> int:
    """format.md:252-272 (== block/encoder.cpp:72-77)."""
    if count == 0:
        return 0
    mean = (total + (count >> 1)) // count
    if mean <= 1:
        return 0
    return min(31, bit_width(mean - 1))


def zigzag(v: int) -> int:
    return ((v & 0xFFFFFFFF) << 1 ^ (0xFFFFFFFF if v < 0 else 0)) & 0xFFFFFFFF


def k_used_sequence_stateful(us, initial_k):
    """Per-sample encoding k for a whole-block residual stream."""
    st = StatefulAdapt()
    k = initial_k
    out = []
    total = 0
    for i, u in enumerate(us):
        out.append(k)
        total += u
        k = st.adapt(total, i + 1)
    return out


def k_used_sequence_stateless(us, initial_k):
    out = []
    k = initial_k
    total = 0
    for i, u in enumerate(us):
        out.append(k)
        total += u
        k = adapt_stateless(total, i + 1)
    return out


def rice_bits(u: int, k: int) -> int:
    q = 0 if k >= 31 else (u >> k)
    return q + 1 + k
