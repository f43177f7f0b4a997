"""Kernel-level scaling bench: the encode kernel driven by a process pool at
two parallelism levels over identical pre-built groups.

This isolates the ENGINE's compute scaling from Spark's fixed stage costs and
from this sandbox's noisy-neighbor variance (single-run Spark walls vary up
to 5x here — see BENCH notes). Separate processes mirror real executors
(independent memory arenas, no shared-JVM contention).

Prints one JSON line: per-level GB/s + efficiency.
"""

from __future__ import annotations

import argparse
import json
import multiprocessing as mp
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def _build_groups(
    input_path: str, group_mb: int, max_bytes: int | None = None
) -> list[list[bytes]]:
    import numpy as np
    import pyarrow.parquet as pq

    tbl = pq.read_table(input_path, columns=["doc_id", "tokens", "n_tok", "source"])
    # same grouping rule as the pipeline: (source, log2-bucket), then greedy
    # byte-budget splits standing in for salts
    src = tbl.column("source").to_pylist()
    n_tok = tbl.column("n_tok").to_numpy()
    order = np.lexsort((tbl.column("doc_id").to_pylist(), np.floor(np.log2(n_tok + 1)), src))
    toks = tbl.column("tokens")
    budget = group_mb << 20
    # stratified byte cap: every source keeps its share, so a capped sample
    # has the corpus's regime mix (a prefix cap would sample one source)
    per_src_cap = None
    if max_bytes is not None:
        per_src_cap = max_bytes // max(len(set(src)), 1)
    taken: dict[str, int] = {}
    groups: list[list[bytes]] = []
    cur: list[bytes] = []
    cur_bytes = 0
    prev_key = None
    for i in order.tolist():
        if per_src_cap is not None:
            t = taken.get(src[i], 0)
            if t >= per_src_cap:
                continue
            taken[src[i]] = t + int(n_tok[i]) * 4
        key = (src[i], int(np.log2(n_tok[i] + 1)))
        row = toks[i].values.to_numpy().astype("<i4").tobytes()
        if key != prev_key or cur_bytes + len(row) > budget:
            if cur:
                groups.append(cur)
            cur, cur_bytes, prev_key = [], 0, key
        cur.append(row)
        cur_bytes += len(row)
    if cur:
        groups.append(cur)
    return groups


_GROUPS: list[list[bytes]] = []


def _init(groups):
    global _GROUPS
    _GROUPS = groups


def _encode_one(gi: int) -> tuple[int, int]:
    from gdelta_spark import blocks
    import numpy as np

    rows = _GROUPS[gi]
    arrays = [np.frombuffer(r, "<i4") for r in rows]
    blob, _ = blocks.encode_block_rows(arrays, base=rows[0], rows_bytes=rows)
    return sum(len(r) for r in rows), len(blob)


def _roundtrip_one(gi: int) -> tuple[int, int]:
    """encode + decode + verify: measures the full kernel round trip."""
    from gdelta_spark import blocks
    import numpy as np

    rows = _GROUPS[gi]
    arrays = [np.frombuffer(r, "<i4") for r in rows]
    blob, _ = blocks.encode_block_rows(arrays, base=rows[0], rows_bytes=rows)
    out = blocks.decode_block_rows(blob, base=rows[0])
    for a, b in zip(arrays, out):
        if not np.array_equal(a, b):
            raise AssertionError(f"group {gi}: roundtrip mismatch")
    return sum(len(r) for r in rows), len(blob)


def _warm(_: int) -> int:
    from gdelta_spark import blocks  # noqa: F401

    return 0


def _cpu_control(_: int) -> float:
    """Cache-resident compute: measures how well this box scales work that
    does NOT touch main memory."""
    import numpy as np

    x = np.arange(200_000, dtype=np.float64)
    for _ in range(60):
        x = np.sqrt(x * 1.0001 + 1.0)
    return float(x[0])


def _mem_control(_: int) -> int:
    """Streaming-bandwidth probe: 384MB of main-memory traffic."""
    import numpy as np

    a = np.empty(16_000_000, dtype=np.uint64)
    a[:] = 1
    s = 0
    for _ in range(3):
        s += int((a >> np.uint64(1)).sum())
    return s


def box_calibration(n: int) -> dict:
    """Same 1-vs-4N protocol on two synthetic workloads, bracketing what the
    box ITSELF can scale: anything the encode kernel loses beyond the cpu
    control is this machine's shared memory-bandwidth ceiling (a VM
    property), not the engine's plan. Measured here so every recorded
    artifact carries its own calibration."""
    out = {}
    for name, fn, tasks in (("cpu", _cpu_control, 4 * n * 4), ("mem", _mem_control, 4 * n * 2)):
        res: dict[int, float] = {}
        for procs in (n, 4 * n, n, 4 * n):
            with mp.Pool(procs) as p:
                p.map(_warm, range(procs))
                t0 = time.time()
                p.map(fn, range(tasks), chunksize=1)
                w = time.time() - t0
            res[procs] = min(res.get(procs, 9e9), w)
        out[f"{name}_control_eff"] = round(res[n] / (4 * res[4 * n]), 3)
    return out


def run_level(groups, procs: int, roundtrip: bool = False) -> dict:
    fn = _roundtrip_one if roundtrip else _encode_one
    # fork + module global: children inherit the groups copy-on-write;
    # initargs would PICKLE the whole corpus to every worker (measured:
    # that IPC dominated small runs and corrupted the efficiency number)
    _init(groups)
    with mp.Pool(procs) as pool:
        # absorb per-worker import cost before the clock (steady-state
        # throughput is what the N-vs-4N criterion compares)
        pool.map(_warm, range(procs * 2))
        t0 = time.time()
        # chunksize=1 = dynamic scheduling: per-group cost varies ~20x by
        # regime, and a pre-chunked tail straggler at the higher level
        # reads as (fake) lost scaling efficiency
        res = pool.map(fn, range(len(groups)), chunksize=1)
        wall = time.time() - t0
    raw = sum(r for r, _ in res)
    enc = sum(e for _, e in res)
    return {"procs": procs, "wall_sec": wall, "gbps": raw / wall / 1e9,
            "raw_bytes": raw, "enc_bytes": enc}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--n", type=int, default=8)
    ap.add_argument("--group-mb", type=int, default=8)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--max-gb", type=float, default=None,
                    help="cap sampled input so kernel reps fit a time budget")
    args = ap.parse_args()

    max_bytes = int(args.max_gb * 1e9) if args.max_gb else None
    groups = _build_groups(args.input, args.group_mb, max_bytes=max_bytes)
    levels: dict[int, dict] = {}
    # interleave the two levels and keep minima: the sandbox's background
    # load varies minute-to-minute, so A,B,A,B sampling beats A,A,B,B
    for _ in range(args.reps):
        for procs in (args.n, args.n * 4):
            r = run_level(groups, procs)
            if procs not in levels or r["wall_sec"] < levels[procs]["wall_sec"]:
                levels[procs] = r
    small, big = levels[args.n], levels[args.n * 4]
    rt = run_level(groups, args.n * 4, roundtrip=True)
    print(json.dumps({
        "groups": len(groups),
        "n": args.n,
        "small": small,
        "big": big,
        "efficiency": big["gbps"] / (4 * small["gbps"]),
        "roundtrip_big": rt,  # encode+decode+verify at the big level
        # what THIS box can scale, same protocol: cpu ~0.9 = scheduling is
        # fine; mem ~0.1 = a hard shared-bandwidth wall (firecracker VM).
        # The kernel sits between the two brackets by its compute:traffic mix.
        "box": box_calibration(args.n),
    }))


if __name__ == "__main__":
    main()
