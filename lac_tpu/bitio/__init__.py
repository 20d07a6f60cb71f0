from .reader import BitReader
from .writer import BitWriter
from .pack import pack_tokens

__all__ = ["BitReader", "BitWriter", "pack_tokens"]
