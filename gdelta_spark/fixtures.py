"""Deterministic token-table fixtures (FIXTURES.md regimes).

Generates the north-rule input shape — (doc_id: string, tokens: array<int32>,
n_tok: int32, source: string) — with one ``source`` group per codec-win
regime. Generation is seed- and order-deterministic: row i of a regime is a
pure function of (seed, regime, i), so distributed generation partitions
freely without changing content.
"""

from __future__ import annotations

import numpy as np

REGIMES = (
    "near-dup",
    "runs",
    "lowcard",
    "narrow",
    "texty",
    "random",
    "mixed-dup",
    "monotonic",  # appended: REGIMES.index() keys the seeds of earlier regimes
)

_EXPECTED_WINNER = {
    "near-dup": "gdelta",
    "runs": "rle",
    "lowcard": "dict",
    "narrow": "for",
    "texty": "fsst",
    "random": "raw",
    "mixed-dup": "gdelta",  # requires per-cluster base election
    "monotonic": "dbp",  # tiny deltas, huge absolute range
}


def _row_rng(seed: int, regime: str, i: int) -> np.random.Generator:
    return np.random.default_rng(
        np.random.SeedSequence([seed, REGIMES.index(regime), i])
    )


def _n_tok(rng: np.random.Generator, heavy_tail: bool = True) -> int:
    """Skewed length: ~99% in 128..4096, ~1% heavy tail (up to ~64K here;
    scale the tail cap via fixtures at bench tiers)."""
    if heavy_tail and rng.random() < 0.01:
        return int(rng.integers(16_384, 65_536))
    return int(np.clip(rng.lognormal(6.5, 0.8), 128, 4096))


def base_sequence(seed: int, regime: str) -> np.ndarray:
    """Per-regime seeded base sequence (the near-dup delta base)."""
    rng = np.random.default_rng(np.random.SeedSequence([seed, REGIMES.index(regime), 1 << 30]))
    return rng.integers(0, 50_000, 8192, dtype=np.int32)


def _mutate(tokens: np.ndarray, rng: np.random.Generator) -> np.ndarray:
    """A few random substitute/insert/delete edits — the near-dup generator."""
    k = int(rng.integers(1, 12))
    for _ in range(k):
        op = int(rng.integers(0, 3))
        pos = int(rng.integers(0, max(1, tokens.size)))
        if op == 0 and tokens.size:
            span = int(rng.integers(1, 8))
            tokens[pos : pos + span] = rng.integers(0, 50_000, size=tokens[pos : pos + span].size, dtype=np.int32)
        elif op == 1:
            ins = rng.integers(0, 50_000, int(rng.integers(1, 16)), dtype=np.int32)
            tokens = np.concatenate((tokens[:pos], ins, tokens[pos:]))
        else:
            tokens = np.concatenate((tokens[:pos], tokens[pos + int(rng.integers(1, 16)) :]))
    return tokens.astype(np.int32)


MIXED_DUP_TEMPLATES = 8


def make_tokens(seed: int, regime: str, i: int) -> np.ndarray:
    """Row i of a regime — deterministic, order-independent."""
    rng = _row_rng(seed, regime, i)
    if regime == "near-dup":
        return _mutate(base_sequence(seed, regime).copy(), rng)
    if regime == "mixed-dup":
        # rows from 8 distinct templates interleave in one source: a single
        # elected base can delta only 1/8 of rows, so this regime compresses
        # only with per-cluster base election (SURVEY §8 / round-1 verdict)
        t = i % MIXED_DUP_TEMPLATES
        trng = np.random.default_rng(
            np.random.SeedSequence([seed, REGIMES.index(regime), (1 << 28) + t])
        )
        template = trng.integers(0, 50_000, 6144, dtype=np.int32)
        return _mutate(template, rng)
    n = _n_tok(rng)
    if regime == "runs":
        vals = []
        total = 0
        while total < n:
            run = int(np.clip(rng.geometric(0.02), 1, n - total))
            vals.append(np.full(run, int(rng.integers(0, 1000)), dtype=np.int32))
            total += run
        return np.concatenate(vals)[:n]
    if regime == "lowcard":
        # vocab shared across the regime (per-row vocabs would make the
        # concatenated block high-cardinality, defeating dictionary encoding)
        vrng = np.random.default_rng(
            np.random.SeedSequence([seed, REGIMES.index(regime), 1 << 29])
        )
        vocab = vrng.integers(0, 1 << 30, 64, dtype=np.int32)
        return vocab[rng.integers(0, 64, n)]
    if regime == "narrow":
        # shared large base per regime (so partition blocks stay narrow),
        # small width => frame-of-reference + bit-pack wins
        base_val = 1 << 28
        return (base_val + rng.integers(0, 64, n)).astype(np.int32)
    if regime == "texty":
        # character-level tokenization of Zipfian words: per-token dictionary
        # can't go below log2(alphabet) bits, while repeated multi-character
        # byte sequences are exactly what an FSST symbol table captures.
        prng = np.random.default_rng(
            np.random.SeedSequence([seed, REGIMES.index(regime), 1 << 29])
        )
        lexicon = [
            prng.integers(97, 123, int(prng.integers(4, 10))).astype(np.int32)
            for _ in range(28)
        ]
        space = np.array([32], dtype=np.int32)
        ranks = rng.zipf(1.2, size=n) % 28
        out = []
        total = 0
        for r in ranks:
            w = lexicon[int(r)]
            out.append(w)
            out.append(space)
            total += w.size + 1
            if total >= n:
                break
        return np.concatenate(out)[:n].astype(np.int32)
    if regime == "random":
        return rng.integers(-(1 << 31), (1 << 31) - 1, n, dtype=np.int64).astype(np.int32)
    if regime == "monotonic":
        # ascending ids/offsets/timestamps: absolute range is huge (FOR pays
        # ~bit_width(start+n*step) per value) but consecutive deltas are a
        # few bits, with rare spikes that widen only their own miniblock —
        # the delta-bitpack (dbp) design point.
        start = int(rng.integers(0, 1 << 29))
        steps = rng.geometric(0.25, n).astype(np.int64)  # mostly 1..8
        spikes = rng.random(n) < 0.002
        steps[spikes] += rng.integers(1 << 12, 1 << 16, int(spikes.sum()))
        return (start + np.cumsum(steps)).astype(np.int32)
    raise ValueError(f"unknown regime {regime!r}")


def expected_winner(regime: str) -> str:
    return _EXPECTED_WINNER[regime]


def rows(seed: int, regime: str, n_rows: int, start: int = 0):
    """Yield (doc_id, tokens, n_tok, source) tuples."""
    for i in range(start, start + n_rows):
        tokens = make_tokens(seed, regime, i)
        yield (f"{regime}-{i:08d}", tokens, tokens.size, regime)


def tokens_table_pandas(seed: int = 42, rows_per_regime: int = 32):
    """Small in-memory table for unit tests."""
    import pandas as pd

    recs = []
    for regime in REGIMES:
        for doc_id, tokens, n_tok, source in rows(seed, regime, rows_per_regime):
            recs.append((doc_id, tokens.tolist(), n_tok, source))
    return pd.DataFrame(recs, columns=["doc_id", "tokens", "n_tok", "source"])
