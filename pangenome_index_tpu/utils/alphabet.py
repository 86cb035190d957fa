"""Alphabet for the pangenome index.

The reference fixes the alphabet order to ``{'\n','A','C','G','N','T'}``
(reference: include/pangenome_index/utils.hpp:9-11). That byte ordering is
load-bearing: the dense symbol codes follow byte order, and FMD symmetry
(backward/forward extension) silently depends on ``code(complement(a))``
ordering being consistent with it (reference: src/r-index.cpp:727-746).

Unlike the reference (which assigns dense codes only to symbols *present* in a
given text, `calculate_C`, r-index.hpp:440-482), we always use the full 6-code
space. This is behavior-identical whenever all six symbols occur in the text
(any realistic pangenome), and fixes a reference quirk where, for texts with
no 'N', the cached rank vector aliases the 'T' slot to '\n'
(reference: src/r-index.cpp:619-641).

Code space: 0='\n' (endmarker), 1='A', 2='C', 3='G', 4='N', 5='T'.
Bytes outside the alphabet map to code 0, which makes LF/extension with them
return the empty interval - same net effect as the reference's
``sym_map[unknown]==0`` convention (src/r-index.cpp:653).
"""

from __future__ import annotations

import numpy as np

NENDMARKER = ord("\n")

#: Alphabet in code order (byte values).
NUC = np.array([NENDMARKER, ord("A"), ord("C"), ord("G"), ord("N"), ord("T")], dtype=np.uint8)

SIGMA = 6

#: byte value -> dense code (0..5); unknown bytes -> 0.
BYTE_TO_CODE = np.zeros(256, dtype=np.int8)
for _code, _b in enumerate(NUC):
    BYTE_TO_CODE[_b] = _code
# lower-case bases map like upper-case (reference complement table handles
# lower-case, src/r-index.cpp:1521-1525; counting treats them as distinct
# bytes, but no fixture or pipeline ever feeds lower-case into the index).

#: dense code -> byte value.
CODE_TO_BYTE = NUC.copy()

#: complement in code space: '\n'<->'\n', A<->T, C<->G, N<->N
#: (reference: initialize_complement_table, src/r-index.cpp:1512-1529).
COMP_CODE = np.array([0, 5, 3, 2, 4, 1], dtype=np.int8)

#: KP_WEIGHT[c, d] = 1 iff comp(d) < comp(c) in code order. Used by the
#: FMD backward extension to advance the reverse-interval start:
#: k' += sum_d KP_WEIGHT[c, d] * (occ(d, k+s) - occ(d, k))
#: (re-derivation of the loop at src/r-index.cpp:1404-1412: the reference sums
#: delta-occ of comp(b) over symbols b with code(b) < code(comp(c)); with
#: d = comp(b) and comp an involution this is exactly comp(d) < comp(c)).
KP_WEIGHT = (COMP_CODE[None, :] < COMP_CODE[:, None]).astype(np.int32)


def encode_bytes(data) -> np.ndarray:
    """Map bytes / uint8 array to dense codes (int8)."""
    arr = np.frombuffer(data, dtype=np.uint8) if isinstance(data, (bytes, bytearray)) else np.asarray(data, dtype=np.uint8)
    return BYTE_TO_CODE[arr]


def decode_codes(codes) -> bytes:
    """Map dense codes back to bytes."""
    return CODE_TO_BYTE[np.asarray(codes)].tobytes()
