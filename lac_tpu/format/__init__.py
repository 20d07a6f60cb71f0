from . import constants
from .header import FrameHeader
from .partitions import (
    control_byte,
    max_partition_order_for_block,
    parse_control_byte,
    partition_sizes,
)
from .zigzag import zigzag_decode, zigzag_encode

__all__ = [
    "constants",
    "FrameHeader",
    "control_byte",
    "parse_control_byte",
    "partition_sizes",
    "max_partition_order_for_block",
    "zigzag_encode",
    "zigzag_decode",
]
