#!/usr/bin/env python
"""Isolated screen for the ConvBlock_3 downsample pathology.

The round-4 champion profile (DESIGN.md) shows the [64,128,128,128] s8
-> [64,64,64,256] stride-2 3x3 conv at 1.277 ms while its twin
ConvBlock_4 ([64,64,64,256] -> [B,32,32,512]) runs 0.447 ms at
IDENTICAL MACs — XLA's strided-s8 emitter at ~31% MXU on this one
shape. Variants (all int8 accum s32, same closing chain so the delta
is attributable to the conv form):

  strided   — today's form: lax.conv stride-2 SAME
  phase4    — stride-2 3x3 == sum of 4 DENSE convs on parity subgrids
              (K_00 2x2 + K_01 2x1 + K_10 1x2 + K_11 1x1; exactly 1.0x
              MACs, no strided emitter anywhere)
  s2d2x2    — space-to-depth to [B,64,64,4C] + one dense 2x2 conv with
              the 9 taps scattered into 16 slots (1.78x MACs, dense)
  cb4_ref   — the twin shape ([B,64,64,256]->512) for the rate anchor

Chained inside one program via fori_loop (see bench_blocks.py: repeated
identical dispatches through the tunnel report above-peak rates).

  python scripts/bench_down_conv.py [--inner 20] [--outer 5]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--inner", type=int, default=20)
    p.add_argument("--outer", type=int, default=5)
    p.add_argument("--only", type=str, default=None)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    cache = os.path.expanduser("~/.cache/yolov3_tpu_xla_cache")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    dn = jax.lax.conv_dimension_numbers((1, 1, 1, 1), (1, 1, 1, 1),
                                        ("NHWC", "HWIO", "NHWC"))
    rng = np.random.RandomState(0)
    B, H, C, CO = 64, 128, 128, 256
    w = jnp.asarray(rng.randint(-20, 20, (3, 3, C, CO)).astype(np.int8))
    x0 = rng.randint(-4, 4, (B, H, H, C)).astype(np.int8)

    def close(y):
        """[B,64,64,256] s32 -> next [B,128,128,128] s8 input (shared by
        every variant: d2s back up + channel duplicate, cheap VPU)."""
        n, h, wd, co = y.shape
        y8 = (y // 512).astype(jnp.int8)
        y8 = y8.reshape(n, h, wd, 2, 2, co // 4).transpose(0, 1, 3, 2, 4, 5)
        y8 = y8.reshape(n, 2 * h, 2 * wd, co // 4)
        return jnp.concatenate([y8, y8], axis=-1)

    def conv(x, k, stride=1, padding="SAME"):
        return jax.lax.conv_general_dilated(
            x, k, (stride, stride) if isinstance(stride, int) else stride,
            padding, dimension_numbers=dn,
            preferred_element_type=jnp.int32)

    def strided(x):
        return close(conv(x, w, stride=2))

    def phase4(x):
        xp = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
        # parity sub-kernels: K_pq[a,b] = w[2a+p, 2b+q]
        acc = None
        for pi in (0, 1):
            for qi in (0, 1):
                k = w[pi::2, qi::2]            # [2 or 1, 2 or 1, C, CO]
                v = xp[:, pi::2, qi::2, :]     # parity view
                y = conv(v, k, stride=1, padding="VALID")
                acc = y if acc is None else acc + y
        return close(acc)

    def s2d2x2(x):
        n, h, wd, c = x.shape
        xs = x.reshape(n, h // 2, 2, wd // 2, 2, c).transpose(0, 1, 3, 2, 4, 5)
        xs = xs.reshape(n, h // 2, wd // 2, 4 * c)
        # W2[a, b, (p, q, c), co] = w[2a+p, 2b+q, c, co]; (a=1,p=1) zero
        k2 = np.zeros((2, 2, 4 * C, CO), np.int8)
        wn = np.asarray(w)
        for di in range(3):
            for dj in range(3):
                a, pi = divmod(di, 2)
                b, qi = divmod(dj, 2)
                k2[a, b, (pi * 2 + qi) * C:(pi * 2 + qi + 1) * C] = wn[di, dj]
        y = conv(xs, jnp.asarray(k2), stride=1, padding=((0, 1), (0, 1)))
        return close(y)

    # twin-shape rate anchor: [B,64,64,256] -> [B,32,32,512], then undo
    w4 = jnp.asarray(rng.randint(-20, 20, (3, 3, 256, 512)).astype(np.int8))
    x4 = rng.randint(-4, 4, (B, 64, 64, 256)).astype(np.int8)

    def cb4_ref(x):
        y = conv(x, w4, stride=2)
        n, h, wd, co = y.shape
        y8 = (y // 512).astype(jnp.int8)
        y8 = y8.reshape(n, h, wd, 2, 2, co // 4).transpose(0, 1, 3, 2, 4, 5)
        y8 = y8.reshape(n, 2 * h, 2 * wd, co // 4)
        return jnp.concatenate([y8, y8], axis=-1)

    # correctness: all downsample forms equal on the raw s32 conv
    xs = jnp.asarray(x0[:2])
    ref = conv(xs, w, stride=2)
    for name, fn in (("phase4", phase4), ("s2d2x2", s2d2x2)):
        got = {"phase4": lambda: _phase4_raw(jnp, jax, dn, xs, w),
               "s2d2x2": lambda: _s2d_raw(jnp, np, jax, dn, xs, w, C, CO)}[
                   name]()
        err = int(jnp.abs(got - ref).max())
        print(f"{name} raw-conv max|d| = {err}")
        assert err == 0, name

    results = {}

    def bench(name, step, x_in):
        if args.only and name not in args.only.split(","):
            return

        @jax.jit
        def run(x):
            y = jax.lax.fori_loop(0, args.inner, lambda i, a: step(a), x)
            return jnp.ravel(y)[:4].astype(jnp.float32)

        x = jnp.asarray(x_in)
        jax.device_get(run(x))
        best = float("inf")
        for _ in range(args.outer):
            t0 = time.perf_counter()
            jax.device_get(run(x))
            best = min(best, time.perf_counter() - t0)
        ms = best / args.inner * 1e3
        results[name] = ms
        print(f"{name:24s} {ms:8.3f} ms", flush=True)

    bench("strided", strided, x0)
    bench("phase4", phase4, x0)
    bench("s2d2x2", s2d2x2, x0)
    bench("cb4_ref", cb4_ref, x4)

    print("\nsummary (ms, sorted):")
    for k, v in sorted(results.items(), key=lambda kv: kv[1]):
        print(f"  {k:20s} {v:8.3f}")


def _phase4_raw(jnp, jax, dn, x, w):
    xp = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
    acc = None
    for pi in (0, 1):
        for qi in (0, 1):
            y = jax.lax.conv_general_dilated(
                xp[:, pi::2, qi::2, :], w[pi::2, qi::2], (1, 1), "VALID",
                dimension_numbers=dn, preferred_element_type=jnp.int32)
            acc = y if acc is None else acc + y
    return acc


def _s2d_raw(jnp, np, jax, dn, x, w, C, CO):
    n, h, wd, c = x.shape
    xs = x.reshape(n, h // 2, 2, wd // 2, 2, c).transpose(0, 1, 3, 2, 4, 5)
    xs = xs.reshape(n, h // 2, wd // 2, 4 * c)
    k2 = np.zeros((2, 2, 4 * C, CO), np.int8)
    wn = np.asarray(w)
    for di in range(3):
        for dj in range(3):
            a, pi = divmod(di, 2)
            b, qi = divmod(dj, 2)
            k2[a, b, (pi * 2 + qi) * C:(pi * 2 + qi + 1) * C] = wn[di, dj]
    return jax.lax.conv_general_dilated(
        xs, jnp.asarray(k2), (1, 1), ((0, 1), (0, 1)),
        dimension_numbers=dn, preferred_element_type=jnp.int32)


if __name__ == "__main__":
    main()
