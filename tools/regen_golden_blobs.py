"""Regenerate tests/test_golden_blobs.py.

Run ONLY when introducing a deliberate, versioned block-format change: the
golden blobs pin decoder compatibility with already-written warehouses, so
regenerating them without bumping the block version silently abandons every
blob the previous format wrote.
"""

from __future__ import annotations

import base64
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from gdelta_spark import codecs, fixtures  # noqa: E402
from gdelta_spark.codecs import core  # noqa: E402
from gdelta_spark.codecs.delta import tokens_to_bytes  # noqa: E402

OUT = Path(__file__).resolve().parent.parent / "tests" / "test_golden_blobs.py"

HEADER = '''"""On-disk format stability: blobs written by THIS commit's encoder must
stay decodable by every future commit, or previously-written warehouses
silently break. Each case below is a literal blob captured at the time its
codec's format was frozen, paired with the exact values it must decode to.

A failure here means the DECODER no longer understands an old blob — that
is a format break, not a test to update. (Changing the ENCODER's choices
is fine: these blobs never get re-encoded.)

Regenerate (only when introducing a deliberate, versioned format change):
tools/regen_golden_blobs.py
"""

from __future__ import annotations

import base64

import numpy as np
import pytest

from gdelta_spark import codecs
from gdelta_spark import fixtures
from gdelta_spark.codecs.delta import tokens_to_bytes

'''

BODY = '''}


@pytest.mark.parametrize("name", list(GOLDEN), ids=list(GOLDEN))
def test_golden_blob_decodes(name):
    blob_b64, expect_b64, needs_base = GOLDEN[name]
    blob = base64.b64decode(blob_b64)
    expect = np.frombuffer(base64.b64decode(expect_b64), dtype="<i4")
    base = base64.b64decode(_B64_BASE) if needs_base else None
    out = codecs.decode_block(blob, base=base)
    assert out.dtype == np.int32
    assert np.array_equal(out, expect), f"format break: {name} blob no longer decodes"


def test_fixture_generators_are_frozen():
    """The golden fsst/dbp/gdelta cases reference fixture rows by seed; if
    the generators drift, the golden entries silently stop covering the
    regimes they were cut from. Pin the first values."""
    assert fixtures.make_tokens(42, "texty", 0)[:4].tolist() == TEXTY_HEAD
    assert fixtures.make_tokens(42, "monotonic", 0)[:4].tolist() == MONO_HEAD
    assert fixtures.make_tokens(42, "near-dup", 0)[:4].tolist() == NEARDUP_HEAD
    assert tokens_to_bytes(fixtures.base_sequence(42, "near-dup"))[:8] == BASE_HEAD


'''


def main() -> None:
    rng = np.random.default_rng(123)
    cases = {
        "raw": rng.integers(-(1 << 31), (1 << 31) - 1, 97, dtype=np.int64).astype(np.int32),
        "dict": np.array([5, -9, 5, 5, 7, -9, 7, 5] * 40, dtype=np.int32),
        "rle": np.repeat(np.array([3, -3, 1 << 20], dtype=np.int32), [50, 70, 30]),
        "for": (1000000 + rng.integers(0, 63, 150)).astype(np.int32),
        "fsst": fixtures.make_tokens(42, "texty", 0)[:300],
        "dbp": fixtures.make_tokens(42, "monotonic", 0)[:300],
    }
    base = tokens_to_bytes(fixtures.base_sequence(42, "near-dup"))[:2048]
    gd = fixtures.make_tokens(42, "near-dup", 0)[:400]

    entries = []
    for name, arr in cases.items():
        blob = codecs.encode_block(arr, core.CODEC_IDS[name])
        assert np.array_equal(codecs.decode_block(blob), arr)
        entries.append((name, blob, arr, False))
    blob = codecs.encode_block(gd, core.GDELTA, base=base)
    assert np.array_equal(codecs.decode_block(blob, base=base), gd)
    entries.append(("gdelta", blob, gd, True))

    with open(OUT, "w") as f:
        f.write(HEADER)
        f.write(f'_B64_BASE = "{base64.b64encode(base).decode()}"\n\nGOLDEN = {{\n')
        for name, b, arr, needs_base in entries:
            f.write(f'    "{name}": (\n')
            f.write(f'        "{base64.b64encode(b).decode()}",\n')
            f.write(f'        "{base64.b64encode(arr.astype("<i4").tobytes()).decode()}",\n')
            f.write(f"        {needs_base},\n")
            f.write("    ),\n")
        f.write(BODY)
        f.write(f"TEXTY_HEAD = {fixtures.make_tokens(42, 'texty', 0)[:4].tolist()}\n")
        f.write(f"MONO_HEAD = {fixtures.make_tokens(42, 'monotonic', 0)[:4].tolist()}\n")
        f.write(f"NEARDUP_HEAD = {fixtures.make_tokens(42, 'near-dup', 0)[:4].tolist()}\n")
        f.write(
            f"BASE_HEAD = {tokens_to_bytes(fixtures.base_sequence(42, 'near-dup'))[:8]!r}\n"
        )
    print(f"wrote {OUT}")


if __name__ == "__main__":
    main()
