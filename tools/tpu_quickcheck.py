#!/usr/bin/env python
"""Fast on-device parity gate for kernel changes (not part of the CPU-mesh
pytest suite, which cannot see real-TPU codegen): round-trips the band codec
on the real chip and byte-compares depths + payload against the numpy oracle
(layout dbde_util.cpp:137-180 — i32 h*w, depths, i32 h*w, mins, i32 n64,
payload).  Run after every kernel edit, before bench.py."""
import sys

import numpy as np

sys.path.insert(0, ".")

from dbde_tpu.bench_core import make_content
from dbde_tpu.codec import DbdeCodec
from dbde_tpu import ref_numpy as ref

GEOMETRIES = [
    (2048, 2048, "camera"),
    (2048, 2048, "random"),
    (3072, 64, "camera"),   # wide grid: groups > GROUPS_PER_STAGE chunking
    (2536, 2048, "camera"), # reference bench geometry (column-padded)
    (1024, 64, "flat"),
]


def main() -> None:
    for W, H, content in GEOMETRIES:
        img = make_content(W, H, 2, content)
        codec = DbdeCodec(height=H, width=W, backend="band")
        enc = codec.encode(img)
        out = codec.decode(enc.depths, enc.mins, enc.payload)
        np.testing.assert_array_equal(out, img)
        d = np.asarray(enc.depths)
        p = np.asarray(enc.payload)
        n64 = np.asarray(enc.n64)
        T = codec.tiles
        for b in range(img.shape[0]):
            blob = ref.pack_image(img[b])
            depths_o = np.frombuffer(blob, np.uint8)[4 : 4 + T]
            np.testing.assert_array_equal(d[b].reshape(-1)[:T], depths_o)
            payload_bytes = blob[12 + 2 * T :]
            got = p[b].reshape(-1)[: 2 * int(n64[b])].view(np.uint32).tobytes()
            assert got == payload_bytes, (W, H, content, b)
        print(f"ok {W}x{H} {content}")
    print("TPU PARITY OK")


if __name__ == "__main__":
    main()
