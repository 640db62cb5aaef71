"""Host input-pipeline throughput: packed reader vs image-folder decode.

The FFCV replacement must not bottleneck the TPU step (BASELINE.md: the
A100 reference leaned on FFCV). Prints img/s for both loader paths at the
given resolution — compare against the train step's img/s/chip times the
local device count.

Usage: python tools/bench_input.py [--image_size 256] [--n 2048] [--workers 8]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--image_size", type=int, default=256)
    ap.add_argument("--n", type=int, default=2048)
    ap.add_argument("--batch_size", type=int, default=32)
    ap.add_argument("--workers", type=int, default=8)
    ap.add_argument("--tmp", default="/tmp/bench_input")
    args = ap.parse_args()

    import numpy as np
    from PIL import Image

    from vqvae_tpu.data.dataset import ImageFolderDataset, Loader
    from vqvae_tpu.data.packed import PackedDataset, write_packed

    size = args.image_size
    folder = os.path.join(args.tmp, f"imgs{size}")
    os.makedirs(folder, exist_ok=True)
    rs = np.random.RandomState(0)
    n_src = min(args.n, 512)  # reuse images; decode cost is per-read anyway
    for i in range(n_src):
        p = os.path.join(folder, f"i{i:04d}.jpg")
        if not os.path.exists(p):
            Image.fromarray(rs.randint(0, 255, (size, size, 3), np.uint8)
                            ).save(p, quality=90)

    pack = os.path.join(args.tmp, f"data{size}.pack")
    ds_folder = ImageFolderDataset(folder, size)
    if not os.path.exists(pack):
        write_packed(pack, (ds_folder[i % n_src] for i in range(args.n)),
                     image_size=size)

    def timed(loader, n_epochs=1):
        count = 0
        t0 = time.perf_counter()
        for _ in range(n_epochs):
            for batch in loader:
                count += int(batch["mask"].sum())
        return count / (time.perf_counter() - t0)

    packed = PackedDataset(pack, size)
    lp = Loader(packed, args.batch_size, shuffle=True, drop_last=True,
                num_workers=args.workers)
    lf = Loader(ds_folder, args.batch_size, shuffle=True, drop_last=True,
                num_workers=args.workers)

    r_packed = timed(lp)
    r_folder = timed(lf)
    print(f"packed reader  (native={packed.is_native}): {r_packed:9.0f} img/s")
    print(f"image folder (PIL jpeg decode + resize):    {r_folder:9.0f} img/s")


if __name__ == "__main__":
    main()
