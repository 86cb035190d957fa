from .alphabet import (
    NENDMARKER,
    NUC,
    SIGMA,
    BYTE_TO_CODE,
    CODE_TO_BYTE,
    COMP_CODE,
    encode_bytes,
    decode_codes,
)
