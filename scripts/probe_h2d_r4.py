#!/usr/bin/env python
"""H2D/D2H cost model through the axon tunnel (round 4).

Fits time vs {bytes, elements} for a few shapes/dtypes to decide what the
per-frame device-pool upload should carry (gray u8? depth f32? normals f16?).
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax
    import jax.numpy as jnp

    print(f"devices: {jax.devices()}", flush=True)

    def fence(x):
        return float(jnp.sum(x.astype(jnp.float32)))

    cases = [
        ("u8_480x640", np.zeros((480, 640), np.uint8)),
        ("u8_3x480x640", np.zeros((3, 480, 640), np.uint8)),
        ("f16_480x640x3", np.zeros((480, 640, 3), np.float16)),
        ("f32_480x640", np.zeros((480, 640), np.float32)),
        ("f32_480x640x3", np.zeros((480, 640, 3), np.float32)),
        ("f32_16x400x400", np.zeros((16, 400, 400), np.float32)),
        ("f32_64", np.zeros((64,), np.float32)),
        ("f32_16k", np.zeros((16384,), np.float32)),
    ]
    out = {}
    for name, arr in cases:
        arr = arr + 1  # non-trivial content
        x = jnp.asarray(arr)
        fence(x.reshape(-1)[:8])  # warm compile of the fence program per shape
        reps = 5
        t0 = time.perf_counter()
        for r in range(reps):
            arr = arr + 1
            x = jnp.asarray(arr)
            fence(x.reshape(-1)[:8])
        dt = (time.perf_counter() - t0) / reps
        out[name] = {"ms": round(dt * 1e3, 1),
                     "MB": round(arr.nbytes / 1e6, 2),
                     "Melem": round(arr.size / 1e6, 2)}
        print(name, out[name], flush=True)

    # d2h for a typical fused-corres readback (16x512x8 f32 ~ 256 KB)
    y = jnp.zeros((16, 512, 8), jnp.float32) + 1.0
    fence(y)
    np.asarray(y)
    t0 = time.perf_counter()
    for r in range(5):
        np.asarray(y + float(r))
    out["d2h_16x512x8_f32_ms"] = round((time.perf_counter() - t0) / 5 * 1e3, 1)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
