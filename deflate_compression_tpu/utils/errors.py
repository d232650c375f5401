"""Namespaced error system.

Reference analogue: the bit-24 namespaced error codes + setjmp/longjmp
checkpoint unwind (src/include/global_errors.h:20,60-81; deflate codes
src/include/deflate_errors.h:7-50; PNG codes src/png/include/png_errors.h:8-55).
Python exceptions replace longjmp; the domain masks and symbolic names are
kept so error codes remain reportable/communicable across the distributed
runtime exactly like the reference's single-word codes.
"""
from __future__ import annotations

# Domain masks in bits 24+ (mirrors ERROR_CLEAR_MASK scheme,
# src/include/global_errors.h:20)
DOMAIN_GLOBAL = 0x0000000
DOMAIN_DEFLATE = 0x1000000
DOMAIN_PNG = 0x2000000
DOMAIN_DIST = 0x3000000


class CodecError(Exception):
    """Base error; carries a namespaced numeric code like the reference's
    fail_out(e) codes."""

    domain = DOMAIN_GLOBAL
    _names: dict[str, int] = {}

    def __init__(self, name: str, message: str = ""):
        self.name = name
        self.code = self.domain | self._names.get(name, 0xFFFF)
        super().__init__(f"{name} ({self.code:#09x}): {message}")


class DeflateError(CodecError):
    domain = DOMAIN_DEFLATE
    _names = {n: i for i, n in enumerate([
        "E_HDR", "E_FDICT", "E_BTYPE", "E_STORED", "E_TREE", "E_BADCODE",
        "E_SYM", "E_DIST", "E_SIZE", "E_ADLER", "E_TRUNC", "E_INDEX",
        "E_SELFCHECK",
    ])}


class PngError(CodecError):
    domain = DOMAIN_PNG
    _names = {n: i for i, n in enumerate([
        "E_SIG", "E_CHLEN", "E_CHNAME", "E_CRC", "E_ORDER", "E_MULT",
        "E_IHDR", "E_PLTE", "E_IDAT", "E_DEPTH", "E_FILTER", "E_INTERLACE",
        "E_TEXT", "E_EOF",
    ])}


class DistError(CodecError):
    domain = DOMAIN_DIST
    _names = {n: i for i, n in enumerate([
        "E_MESH", "E_SHARD", "E_GATHER", "E_RESUME",
    ])}
