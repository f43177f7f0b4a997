"""Codec kernels: pure-numpy encode/decode, no Spark imports here.

Importing this package registers all codecs with the block registry in
``core`` (raw, dict, rle, for, fsst, gdelta).
"""

from gdelta_spark.codecs import core
from gdelta_spark.codecs import light  # noqa: F401  (registers raw/for/dict/rle)
from gdelta_spark.codecs import fsst  # noqa: F401  (registers fsst)
from gdelta_spark.codecs import delta  # noqa: F401  (registers gdelta)
from gdelta_spark.codecs.core import (  # noqa: F401
    CODEC_IDS,
    CODEC_NAMES,
    DICT,
    FOR,
    FSST,
    GDELTA,
    RAW,
    RLE,
    decode_block,
    encode_block,
)
