"""A/B: where does the streaming-seal drain time go on the axon tunnel?

Same process, same 512 MB of random bf16, three strategies:
  a) one big jnp.asarray                     (legacy wire)
  b) 8x64MB chunked asarray, sync at end     (probe2: 124 MB/s)
  c) 8x64MB asarray + donated dynamic_update_slice chain into a device
     buffer, sync at end                     (the streaming seal's path)
  d) like (c) but updates into a SMALL device buffer per chunk (update cost
     isolated from the big-buffer dependency chain)
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

    from visual_rag_tpu import native

    rng = np.random.default_rng(0)
    n = 512 * 1024 * 1024 // 256  # rows of [*, 128] f32 = 512 MB -> bf16 256MB
    bf = native.f32_to_bf16(rng.standard_normal((n, 128)).astype(np.float32))
    nc = 8
    cr = n // nc

    def sync(x):
        return float(np.asarray(x.ravel()[:1])[0] * 0 + 1)

    t0 = time.time()
    sync(jax.jit(lambda x: x + 1.0)(jnp.zeros((8, 128))))
    print(f"claim {time.time()-t0:.1f}s", flush=True)

    mb = bf.nbytes / 1e6

    # (a) one big asarray
    t0 = time.time()
    dev = jnp.asarray(bf)
    sync(dev)
    print(f"a) single asarray       {time.time()-t0:6.2f}s "
          f"{mb/(time.time()-t0):6.1f} MB/s", flush=True)
    del dev

    # (b) chunked, no updates
    t0 = time.time()
    devs = [jnp.asarray(bf[i * cr:(i + 1) * cr]) for i in range(nc)]
    for d in devs:
        sync(d)
    print(f"b) chunked asarray      {time.time()-t0:6.2f}s "
          f"{mb/(time.time()-t0):6.1f} MB/s", flush=True)
    del devs

    # (c) streaming-seal pattern: donated update chain into big buffer
    upd = jax.jit(
        lambda d, c, i: jax.lax.dynamic_update_slice(d, c, (i, jnp.int32(0))),
        donate_argnums=(0,))
    t0 = time.time()
    big = jnp.zeros((n, 128), dtype=bf.dtype)
    for i in range(nc):
        cdev = jnp.asarray(bf[i * cr:(i + 1) * cr])
        big = upd(big, cdev, np.int32(i * cr))
    sync(big)
    print(f"c) chunked + upd chain  {time.time()-t0:6.2f}s "
          f"{mb/(time.time()-t0):6.1f} MB/s", flush=True)
    del big

    # (d) updates without the big-buffer chain (fresh small target each time)
    upd2 = jax.jit(
        lambda d, c, i: jax.lax.dynamic_update_slice(d, c, (i, jnp.int32(0))),
        donate_argnums=(0,))
    t0 = time.time()
    outs = []
    for i in range(nc):
        small = jnp.zeros((cr, 128), dtype=bf.dtype)
        cdev = jnp.asarray(bf[i * cr:(i + 1) * cr])
        outs.append(upd2(small, cdev, np.int32(0)))
    for o in outs:
        sync(o)
    print(f"d) chunked + small upd  {time.time()-t0:6.2f}s "
          f"{mb/(time.time()-t0):6.1f} MB/s", flush=True)

    # (a2) repeat single asarray to bracket drift
    t0 = time.time()
    dev = jnp.asarray(bf)
    sync(dev)
    print(f"a2) single asarray      {time.time()-t0:6.2f}s "
          f"{mb/(time.time()-t0):6.1f} MB/s", flush=True)


if __name__ == "__main__":
    main()
