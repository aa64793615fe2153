"""Quantization format descriptors.

TPU-native re-design of the reference's format vocabulary
(`modelopt/torch/quantization/config.py:329` QuantizerAttributeConfig and
`modelopt/torch/quantization/qtensor/*`): a format is either an integer width
(`num_bits: int`) or a float (E, M) exponent/mantissa pair (`num_bits: (E, M)`),
optionally block-scaled with its own scale format.

Nothing here touches jax; these are static (hashable) descriptors usable as
jit-static arguments.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Union

NumBits = Union[int, tuple[int, int]]


def fp_max_representable(ebits: int, mbits: int) -> float:
    """Largest finite magnitude of an (E, M) mini-float.

    Conventions (matching the reference's format constants):
     - E5M2 is IEEE-like: top exponent reserved for inf/nan -> max 57344.
     - E4M3 is the OFP8 "fn" variant: only mantissa=all-ones at the top
       exponent encodes NaN -> max 448 (= 1.75 * 2^8, not 480).
     - The MX element formats E2M1/E3M2/E2M3 have no inf/nan at all: full
       mantissa range at the top exponent (E2M1 -> 6, E3M2 -> 28, E2M3 -> 7.5).
    """
    bias = 2 ** (ebits - 1) - 1
    if (ebits, mbits) == (5, 2):  # IEEE-style: top exponent reserved for inf/nan
        return float((2 - 2.0 ** (-mbits)) * 2 ** (2**ebits - 2 - bias))
    if (ebits, mbits) == (4, 3):  # OFP8 e4m3fn: skip all-ones mantissa only
        return float((2 - 2.0 ** (1 - mbits)) * 2 ** (2**ebits - 1 - bias))
    if ebits == 8 and mbits == 0:  # E8M0: pure power-of-two scale type
        return float(2.0 ** (255 - 127))
    # No-special-values formats: full mantissa at top exponent
    emax = 2**ebits - 1 - bias
    return float((2 - 2.0 ** (-mbits) if mbits > 0 else 1.0) * 2**emax)


def fp_emax(ebits: int, mbits: int) -> int:
    """Exponent of the largest representable power of two (OCP MX `emax`)."""
    import math

    return int(math.floor(math.log2(fp_max_representable(ebits, mbits))))


def int_max_bound(num_bits: int, unsigned: bool = False, narrow_range: bool = False) -> int:
    if unsigned:
        return 2**num_bits - 1
    return 2 ** (num_bits - 1) - 1


def int_min_bound(num_bits: int, unsigned: bool = False, narrow_range: bool = False) -> int:
    if unsigned:
        return 0
    b = 2 ** (num_bits - 1) - 1
    return -b if narrow_range else -(b + 1)


@dataclasses.dataclass(frozen=True)
class BlockSpec:
    """Block-quantization layout: block sizes per axis plus scale format.

    Mirrors the reference's `block_sizes` dict semantics
    (`config.py:400-470`): e.g. ``{-1: 16}`` with E4M3 scales and a second
    per-tensor fp32 level is NVFP4; ``{-1: 32}`` with E8M0 scales is MXFP.
    ``dynamic`` means scales are recomputed from each tensor on the fly
    (activation quant) rather than calibrated.
    """

    sizes: tuple[tuple[int, int], ...]  # ((axis, block_size), ...)
    scale_bits: Optional[NumBits] = None  # format of the per-block scale
    scale_block_sizes: Optional[tuple[tuple[int, int], ...]] = None  # double quant
    dynamic: bool = False

    @staticmethod
    def from_dict(d: dict) -> "BlockSpec":
        sizes = tuple(sorted((int(k), int(v)) for k, v in d.items() if isinstance(k, int)))
        sb = d.get("scale_bits")
        if isinstance(sb, list):
            sb = tuple(sb)
        sbs = d.get("scale_block_sizes")
        if sbs is not None:
            sbs = tuple(sorted((int(k), int(v)) for k, v in sbs.items()))
        return BlockSpec(
            sizes=sizes,
            scale_bits=sb,
            scale_block_sizes=sbs,
            dynamic=bool(d.get("type") == "dynamic" or d.get("dynamic", False)),
        )

    def to_dict(self) -> dict:
        d: dict = {k: v for k, v in self.sizes}
        if self.scale_bits is not None:
            d["scale_bits"] = list(self.scale_bits) if isinstance(self.scale_bits, tuple) else self.scale_bits
        if self.scale_block_sizes is not None:
            d["scale_block_sizes"] = {k: v for k, v in self.scale_block_sizes}
        if self.dynamic:
            d["type"] = "dynamic"
        return d


# Named (E, M) formats
E4M3 = (4, 3)
E5M2 = (5, 2)
E2M1 = (2, 1)
E3M2 = (3, 2)
E2M3 = (2, 3)
E8M0 = (8, 0)
E1M2 = (1, 2)

FP_FORMAT_NAMES = {
    E4M3: "E4M3",
    E5M2: "E5M2",
    E2M1: "E2M1",
    E3M2: "E3M2",
    E2M3: "E2M3",
    E8M0: "E8M0",
}
