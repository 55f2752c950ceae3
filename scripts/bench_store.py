#!/usr/bin/env python
"""YDB store read-path benchmark: python vs native vs native-batched.

Reproduces the DESIGN.md store measurement (2000 records of ~196KB) and adds
the batched C API numbers. No TPU involved.

  python scripts/bench_store.py [--records 2000] [--size 196608]
"""

import argparse
import os
import shutil
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from yolov3_tpu.data import store, store_native  # noqa: E402
from yolov3_tpu.data import records  # noqa: E402


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--records", type=int, default=2000)
    p.add_argument("--size", type=int, default=196608)
    p.add_argument("--lookups", type=int, default=200_000)
    p.add_argument("--decodes", type=int, default=2000)
    args = p.parse_args(argv)

    tmp = tempfile.mkdtemp(prefix="ydb_bench_")
    db = os.path.join(tmp, "bench.ydb")
    rng = np.random.RandomState(0)

    # records: realistic protobuf-encoded image/boxes pairs
    side = int(np.sqrt(args.size // 3))
    img = rng.randint(0, 255, (side, side, 3), dtype=np.uint8)
    boxes = np.array([[4, 4, 16, 16, 0]], dtype=np.int32)
    blob = records.encode_record(img, boxes)
    print(f"{args.records} records x {len(blob)} bytes")

    with store.RecordWriter(db) as w:
        for i in range(args.records):
            w.put(f"{i:08d}_img.tif:0".encode(), blob)

    keys = store.RecordReader(db).keys()
    order = rng.randint(0, len(keys), size=args.lookups)
    lookup_keys = [keys[i] for i in order]

    def bench(name, fn, n):
        t0 = time.perf_counter()
        fn()
        dt = time.perf_counter() - t0
        print(f"{name:38s} {n / dt / 1e3:10.1f} k-ops/s  ({dt:.3f} s)")

    rp = store.RecordReader(db)
    bench("python get", lambda: [rp.get(k) for k in lookup_keys],
          args.lookups)

    if not store_native.available():
        print("native library not built (native/build.sh); stopping")
        return
    rn = store_native.NativeRecordReader(db)
    bench("native get", lambda: [rn.get(k) for k in lookup_keys],
          args.lookups)
    for bs in (8, 64):
        batches = [lookup_keys[i:i + bs]
                   for i in range(0, args.lookups, bs)]
        bench(f"native get_batch({bs})",
              lambda b=batches: [rn.get_batch(ks) for ks in b],
              args.lookups)

    # the loader's real workload: get + protobuf decode
    dkeys = [keys[i] for i in rng.randint(0, len(keys), size=args.decodes)]
    bench("python get+decode",
          lambda: [records.decode_record(rp.get(k)) for k in dkeys],
          args.decodes)
    bench("native get+decode",
          lambda: [records.decode_record(rn.get(k)) for k in dkeys],
          args.decodes)
    dbatches = [dkeys[i:i + 8] for i in range(0, args.decodes, 8)]
    bench("native get_batch(8)+decode",
          lambda: [records.decode_record(r) for ks in dbatches
                   for r in rn.get_batch(ks)],
          args.decodes)

    rp.close()
    rn.close()
    shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
