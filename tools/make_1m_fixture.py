"""Materialize the cached 1M/960-dim matched-scale fixture
(`matched_base_1000000_v4.parquet`) without running the full 1M bench —
the same v4 local-covariance densification + streaming parquet write as
bench.py:_matched_bench, so tools/bench_1m_ivf_ab.py (and any future
quiet-host repro) can start from a cold /tmp.

Usage: BENCH_MATCHED_N=1000000 python tools/make_1m_fixture.py
"""
from __future__ import annotations

import os
import sys
import time

os.environ.setdefault("BENCH_MATCHED_N", "1000000")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq_

    from bench import GT_DIR, MATCHED_N, _gist_matched

    n = MATCHED_N
    ppath = os.path.join(GT_DIR, f"matched_base_{n}_v4.parquet")
    if os.path.exists(ppath):
        print("already present:", ppath)
        return
    t0 = time.time()
    base, _queries = _gist_matched(n)
    print(f"densified {base.shape} in {time.time() - t0:.1f}s", flush=True)
    os.makedirs(GT_DIR, exist_ok=True)
    tmp = ppath + ".tmp"
    writer = None
    step = 50_000
    for s in range(0, n, step):
        blk = base[s:s + step]
        tbl = pa.table({
            "vec_id": pa.array(np.arange(s, s + blk.shape[0]), type=pa.int64()),
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(blk.reshape(-1)), blk.shape[1]
            ).cast(pa.list_(pa.float64())),
        })
        if writer is None:
            writer = pq_.ParquetWriter(tmp, tbl.schema)
        writer.write_table(tbl)
    writer.close()
    os.replace(tmp, ppath)
    print(f"wrote {ppath} in {time.time() - t0:.1f}s total")


if __name__ == "__main__":
    main()
