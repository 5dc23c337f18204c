"""Probe 2: is the tunnel transfer host-CPU-bound (compression?) and does
chunking / zero-content change bandwidth? Informs seal overlap design."""

import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import numpy as np  # noqa: E402

_CLK = float(os.sysconf("SC_CLK_TCK"))


def cpu_s():
    with open("/proc/self/stat") as f:
        st = f.read()
    fields = st[st.rindex(")") + 2:].split()
    return (int(fields[11]) + int(fields[12])) / _CLK


def main():
    import jax.numpy as jnp

    from visual_rag_tpu import native

    rng = np.random.default_rng(0)
    n = 512 * 1024 * 1024 // 256  # 512 MB of f32 rows
    f32 = rng.standard_normal((n, 128)).astype(np.float32)
    bf = native.f32_to_bf16(f32)

    float(np.asarray(jnp.zeros((8, 128)))[0, 0])  # claim

    def timed(name, a):
        c0, t0 = cpu_s(), time.time()
        dev = jnp.asarray(a)
        float(np.asarray(dev.ravel()[:1])[0] * 0 + 1)
        dt, dc = time.time() - t0, cpu_s() - c0
        mbs = a.size * a.dtype.itemsize / 1e6
        print(f"{name:30s} {dt:6.2f}s  {mbs/dt:6.1f} MB/s  cpu {dc:5.2f}s "
              f"({dc/dt*100:4.0f}%)", flush=True)
        del dev

    timed("bf16 random 512MB", bf)
    timed("bf16 zeros 512MB", np.zeros_like(bf))
    timed("f32 zeros 512MB", np.zeros((n // 2, 128), np.float32))

    # chunked: 8 x 64MB sequential asarray of the same random bf16
    c0, t0 = cpu_s(), time.time()
    devs = [jnp.asarray(bf[i * n // 8: (i + 1) * n // 8]) for i in range(8)]
    for d in devs:
        float(np.asarray(d.ravel()[:1])[0] * 0 + 1)
    dt, dc = time.time() - t0, cpu_s() - c0
    print(f"{'bf16 random 8x64MB chunks':30s} {dt:6.2f}s  {1024/dt:6.1f} MB/s"
          f"  cpu {dc:5.2f}s ({dc/dt*100:4.0f}%)", flush=True)
    del devs

    # device-side concat of chunks (what a chunked seal needs)
    t0 = time.time()
    devs = [jnp.asarray(bf[i * n // 8: (i + 1) * n // 8]) for i in range(8)]
    cat = jnp.concatenate(devs, axis=0)
    float(np.asarray(cat.ravel()[:1])[0] * 0 + 1)
    dt = time.time() - t0
    print(f"{'.. + device concat':30s} {dt:6.2f}s  {1024/dt:6.1f} MB/s",
          flush=True)


if __name__ == "__main__":
    main()
