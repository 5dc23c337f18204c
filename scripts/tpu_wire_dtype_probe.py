"""Probe: device-transfer bandwidth by host dtype/layout on the axon tunnel.

The seal profile (round 5) measured store transfers at 19 MB/s while a raw
np.float16 probe hit 65-73 MB/s on the same process. Hypothesis: jnp.asarray
of an ml_dtypes bfloat16 numpy array takes a slow conversion path; a uint16
view (bit-identical wire) should ride the fast one.
"""

import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import numpy as np  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp
    import ml_dtypes

    mb = 512
    n = mb * 1024 * 1024 // 256
    f32 = np.random.default_rng(0).standard_normal((n, 128)).astype(np.float32)

    from visual_rag_tpu import native
    bf = native.f32_to_bf16(f32)  # what the store transfers today
    print(f"# store bf16 dtype={bf.dtype} contig={bf.flags['C_CONTIGUOUS']}",
          file=sys.stderr, flush=True)

    def timed(name, arr, view_dtype=None):
        a = arr.view(view_dtype) if view_dtype else arr
        t0 = time.time()
        dev = jnp.asarray(a)
        float(np.asarray(dev.ravel()[:1])[0] * 0 + 1)
        dt = time.time() - t0
        mbs = a.size * a.dtype.itemsize / 1e6
        print(f"{name:28s} {dt:6.2f}s  {mbs/dt:6.1f} MB/s", flush=True)
        del dev

    # claim + warm
    float(np.asarray(jnp.zeros((8, 128)))[0, 0])

    timed("f16 (raw probe ctrl)", f32[: n // 2].astype(np.float16))
    timed("bf16 (ml_dtypes, as store)", bf)
    timed("bf16 viewed as uint16", bf, np.uint16)
    timed("bf16 viewed as int16", bf, np.int16)
    timed("f32 full", f32[: n // 2])
    timed("int8", (f32[:n] * 10).astype(np.int8))


if __name__ == "__main__":
    main()
